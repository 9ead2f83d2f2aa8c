"""Fixture payloads mirroring the reference's test fixtures
(/root/reference/tests/conftest.py:55-114): realistic FRED/BLS responses
including the source-specific missing-value markers and metadata fields."""

RAW_FRED_JSON = {
    "realtime_start": "2024-01-15",
    "realtime_end": "2024-01-15",
    "observation_start": "2023-01-01",
    "observation_end": "9999-12-31",
    "units": "lin",
    "count": 4,
    "observations": [
        {
            "realtime_start": "2024-01-15",
            "realtime_end": "2024-01-15",
            "date": "2023-01-01",
            "value": "3.4",
        },
        {
            "realtime_start": "2024-01-15",
            "realtime_end": "2024-01-15",
            "date": "2023-02-01",
            "value": "3.6",
        },
        {
            "realtime_start": "2024-01-15",
            "realtime_end": "2024-01-15",
            "date": "2023-03-01",
            "value": ".",  # FRED encodes missing as "."
        },
        {
            "realtime_start": "2024-01-15",
            "realtime_end": "2024-01-15",
            "date": "2023-04-01",
            "value": "3.5",
        },
    ],
}

# Most-recent-first, as the real BLS API returns; includes "-" missing
# value and an M13 annual-average row (a real-API hazard the reference
# would crash on, SURVEY.md §2.8 F3).
RAW_BLS_JSON = {
    "status": "REQUEST_SUCCEEDED",
    "responseTime": 123,
    "Results": {
        "series": [
            {
                "seriesID": "CES0000000001",
                "data": [
                    {"year": "2023", "period": "M13", "periodName": "Annual", "value": "155000"},
                    {"year": "2023", "period": "M03", "periodName": "March", "value": "155700"},
                    {"year": "2023", "period": "M02", "periodName": "February", "value": "155300"},
                    {"year": "2023", "period": "M01", "periodName": "January", "value": "155000"},
                ],
            },
            {
                "seriesID": "UNMAPPED_SERIES",
                "data": [
                    {"year": "2023", "period": "M02", "periodName": "February", "value": "-"},
                    {"year": "2023", "period": "M01", "periodName": "January", "value": "62.5"},
                ],
            },
        ]
    },
}

BLS_SERIES_MAP = {"nonfarm_payrolls": "CES0000000001"}
