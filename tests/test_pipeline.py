"""Pipeline orchestration parity tests (reference tests/test_main.py:60-173):
phase failure swallowing, null-skip, stats propagation, rerun idempotency."""

from __future__ import annotations

from economic_data_etl_spark.pipeline import parquet_stores, run_pipeline
from tests.fixtures_ref import RAW_BLS_JSON, RAW_FRED_JSON

FRED_SERIES = {"unemployment_rate": "UNRATE"}
BLS_SERIES = {"nonfarm_payrolls": "CES0000000001"}


def _ok_fred(series_id):
    return RAW_FRED_JSON


def _ok_bls(series_map, start, end):
    return RAW_BLS_JSON


def _run(spark, tmp_path, fetch_fred=_ok_fred, fetch_bls=_ok_bls):
    fact_store, dim_store = parquet_stores(spark, str(tmp_path / "wh"))
    return run_pipeline(
        spark,
        fetch_fred,
        fetch_bls,
        fact_store,
        dim_store,
        fred_series=FRED_SERIES,
        bls_series=BLS_SERIES,
    )


class TestPipeline:
    def test_full_run_stats(self, spark, tmp_path):
        res = _run(spark, tmp_path)
        assert res is not None
        # 4 FRED rows + 5 BLS monthly rows
        assert res.fact_stats == {"inserted": 9, "updated": 0, "unchanged": 0}
        assert res.dim_stats == {"inserted": 2, "unchanged": 0}

    def test_rerun_idempotent(self, spark, tmp_path):
        _run(spark, tmp_path)
        res2 = _run(spark, tmp_path)
        assert res2.fact_stats == {"inserted": 0, "updated": 0, "unchanged": 9}
        assert res2.dim_stats == {"inserted": 0, "unchanged": 2}

    def test_extract_failure_returns_none(self, spark, tmp_path):
        def boom(series_id):
            raise ConnectionError("network down")

        assert _run(spark, tmp_path, fetch_fred=boom) is None

    def test_transform_failure_returns_none(self, spark, tmp_path):
        # malformed FRED payload raises ValueError during transform
        assert _run(spark, tmp_path, fetch_fred=lambda sid: {"bad": 1}) is None

    def test_none_fetch_is_skipped(self, spark, tmp_path):
        # a None extract is filtered, pipeline continues with BLS only
        res = _run(spark, tmp_path, fetch_fred=lambda sid: None)
        assert res is not None
        assert res.fact_stats["inserted"] == 5  # BLS rows only

    def test_renamed_series_with_same_values_counts_unchanged(
        self, spark, tmp_path
    ):
        """Reference parity: upsert_observations classifies change on
        VALUE only (src/load.py:69-77) — rerunning with a different
        human-readable series name but identical values reports all
        unchanged and does not rewrite the stored names."""
        fact_store, dim_store = parquet_stores(spark, str(tmp_path / "wh"))
        run_pipeline(
            spark, _ok_fred, _ok_bls, fact_store, dim_store,
            fred_series=FRED_SERIES, bls_series=BLS_SERIES,
        )
        renamed = {"unemployment_rate_v2": "UNRATE"}
        res = run_pipeline(
            spark, _ok_fred, _ok_bls, fact_store, dim_store,
            fred_series=renamed, bls_series=BLS_SERIES,
        )
        assert res.fact_stats == {"inserted": 0, "updated": 0, "unchanged": 9}
        # stored fact rows keep the ORIGINAL name (no UPDATE was issued)
        names = {
            r["series_name"]
            for r in spark.read.parquet(
                str(tmp_path / "wh/fact_economic_observations")
            ).filter("series_id = 'UNRATE'").collect()
        }
        assert names == {"unemployment_rate"}
