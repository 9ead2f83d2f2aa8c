"""Series registries and engine configuration.

Parity with the reference's single point of configuration
(`/root/reference/src/config.py:28-52`): two plain-data registries mapping
human-readable series names to technical IDs. These are driver-side config,
not distributed data (SURVEY.md §2.7 U2, §2.8 F7).
"""

from __future__ import annotations

import os
from pathlib import Path

# 9 FRED series (reference src/config.py:28-41).
FRED_SERIES: dict[str, str] = {
    "real_gdp": "GDPC1",
    "unemployment_rate": "UNRATE",
    "cpi_all_items": "CPIAUCSL",
    "federal_funds_rate": "FEDFUNDS",
    "treasury_10y": "DGS10",
    "treasury_2y": "DGS2",
    "industrial_production": "INDPRO",
    "housing_starts": "HOUST",
    "consumer_sentiment": "UMCSENT",
}

# 5 BLS series (reference src/config.py:43-52).
BLS_SERIES: dict[str, str] = {
    "nonfarm_payrolls": "CES0000000001",
    "avg_hourly_earnings": "CES0500000003",
    "labor_force_participation": "LNS11300000",
    "employment_population_ratio": "LNS12300000",
    "job_openings_rate": "JTS000000000000000JOR",
}

DATA_DIR = Path(os.environ.get("ENGINE_DATA_DIR", "data"))
RAW_DIR = DATA_DIR / "raw"
METADATA_DIR = DATA_DIR / "metadata"
WAREHOUSE_DIR = DATA_DIR / "warehouse"

FRED_API_URL = "https://api.stlouisfed.org/fred/series/observations"
BLS_API_URL = "https://api.bls.gov/publicAPI/v2/timeseries/data/"

FRED_TIMEOUT_S = 10  # reference src/extract.py:89
BLS_TIMEOUT_S = 15  # reference src/extract.py:150
RETRY_ATTEMPTS = 3  # reference src/extract.py:49-62
