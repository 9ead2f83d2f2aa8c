"""Upsert operator parity tests (reference tests/test_load.py:12-161):
insert/update/unchanged stats triple, NaN-safe epsilon equality, rerun
idempotency, insert-only dim semantics, staged parquet rewrite."""

from __future__ import annotations

import datetime

from economic_data_etl_spark.operators import upsert as U
from economic_data_etl_spark.schemas import FACT_SCHEMA

KEYS = ["series_id", "date"]
COMPARE = ["value", "series_name", "source"]


def _fact(spark, rows):
    return spark.createDataFrame(
        [
            (sid, "unemployment_rate", datetime.date.fromisoformat(d), v, "FRED")
            for sid, d, v in rows
        ],
        schema="series_id string, series_name string, date date, value double, source string",
    )


def _empty(spark):
    return spark.createDataFrame([], FACT_SCHEMA)


class TestUpsertStats:
    def test_fresh_insert(self, spark):
        incoming = _fact(spark, [("U", "2023-01-01", 3.4), ("U", "2023-02-01", None)])
        res = U.upsert(_empty(spark), incoming, KEYS, COMPARE)
        assert res.stats == {"inserted": 2, "updated": 0, "unchanged": 0}
        assert res.merged.count() == 2

    def test_rerun_is_unchanged(self, spark):
        batch = _fact(
            spark,
            [("U", "2023-01-01", 3.4), ("U", "2023-02-01", None), ("U", "2023-03-01", 3.6)],
        )
        first = U.upsert(_empty(spark), batch, KEYS, COMPARE)
        second = U.upsert(first.merged, batch, KEYS, COMPARE)
        assert second.stats == {"inserted": 0, "updated": 0, "unchanged": 3}
        assert second.merged.count() == 3  # no duplicate rows

    def test_revision_updates_in_place(self, spark):
        v1 = _fact(spark, [("U", "2023-01-01", 3.4), ("U", "2023-02-01", 3.5)])
        state = U.upsert(_empty(spark), v1, KEYS, COMPARE).merged
        v2 = _fact(spark, [("U", "2023-01-01", 9.9), ("U", "2023-02-01", 3.5)])
        res = U.upsert(state, v2, KEYS, COMPARE)
        assert res.stats == {"inserted": 0, "updated": 1, "unchanged": 1}
        merged = {r["date"]: r["value"] for r in res.merged.collect()}
        assert merged[datetime.date(2023, 1, 1)] == 9.9

    def test_partial_stats_triple(self, spark):
        # 1 inserted, 2 updated, 0 unchanged (reference tests/test_load.py:98-123)
        v1 = _fact(spark, [("U", "2023-01-01", 1.0), ("U", "2023-02-01", 2.0)])
        state = U.upsert(_empty(spark), v1, KEYS, COMPARE).merged
        v2 = _fact(
            spark,
            [("U", "2023-01-01", 1.5), ("U", "2023-02-01", 2.5), ("U", "2023-03-01", 3.0)],
        )
        res = U.upsert(state, v2, KEYS, COMPARE)
        assert res.stats == {"inserted": 1, "updated": 2, "unchanged": 0}


class TestNanSafeEquality:
    def test_null_vs_null_unchanged(self, spark):
        batch = _fact(spark, [("U", "2023-01-01", None)])
        state = U.upsert(_empty(spark), batch, KEYS, COMPARE).merged
        res = U.upsert(state, batch, KEYS, COMPARE)
        assert res.stats["unchanged"] == 1

    def test_null_to_value_is_update(self, spark):
        state = U.upsert(
            _empty(spark), _fact(spark, [("U", "2023-01-01", None)]), KEYS, COMPARE
        ).merged
        res = U.upsert(state, _fact(spark, [("U", "2023-01-01", 3.4)]), KEYS, COMPARE)
        assert res.stats["updated"] == 1

    def test_epsilon_tolerance(self, spark):
        state = U.upsert(
            _empty(spark), _fact(spark, [("U", "2023-01-01", 3.4)]), KEYS, COMPARE
        ).merged
        res = U.upsert(
            state, _fact(spark, [("U", "2023-01-01", 3.4 + 1e-12)]), KEYS, COMPARE
        )
        assert res.stats["unchanged"] == 1  # |Δ| < 1e-9 counts as equal


class TestDimInsertOnly:
    def test_insert_missing(self, spark):
        existing = spark.createDataFrame(
            [("A1", "a", "FRED")], "series_id string, series_name string, source string"
        )
        incoming = spark.createDataFrame(
            [("A1", "a", "FRED"), ("B1", "b", "BLS")],
            "series_id string, series_name string, source string",
        )
        new_rows, stats = U.insert_missing(existing, incoming, ["series_id"])
        assert stats == {"inserted": 1, "unchanged": 1}
        assert [r["series_id"] for r in new_rows.collect()] == ["B1"]


class TestParquetUpsert:
    def test_staged_rewrite_roundtrip(self, spark, tmp_path):
        target = str(tmp_path / "fact")
        b1 = _fact(spark, [("U", "2023-01-01", 3.4)])
        s1 = U.upsert_parquet(spark, b1, target, KEYS, COMPARE)
        assert s1 == {"inserted": 1, "updated": 0, "unchanged": 0}
        b2 = _fact(spark, [("U", "2023-01-01", 9.9), ("U", "2023-02-01", 1.0)])
        s2 = U.upsert_parquet(spark, b2, target, KEYS, COMPARE)
        assert s2 == {"inserted": 1, "updated": 1, "unchanged": 0}
        final = {r["date"]: r["value"] for r in spark.read.parquet(target).collect()}
        assert final == {
            datetime.date(2023, 1, 1): 9.9,
            datetime.date(2023, 2, 1): 1.0,
        }


class TestReferenceUpdateSemantics:
    """Two corners of the reference's UPDATE path (src/load.py:78-103)
    that a per-column coalesce silently diverges on."""

    def test_revision_to_null_is_stored(self, spark, tmp_path):
        """An updated row takes the incoming row WHOLESALE: a value
        revised to NULL (FRED '.' marker on re-release) must land as
        NULL, not resurrect the old number via coalesce."""
        import datetime

        from economic_data_etl_spark.operators.upsert import upsert_parquet

        target = str(tmp_path / "t")
        schema = "series_id string, date date, value double, series_name string, source string"
        d = datetime.date(2023, 1, 1)
        first = spark.createDataFrame(
            [("U", d, 5.0, "UNRATE", "FRED")], schema
        )
        upsert_parquet(spark, first, target, ["series_id", "date"], ["value"])
        revised = spark.createDataFrame(
            [("U", d, None, "UNRATE", "FRED")], schema
        )
        stats = upsert_parquet(
            spark, revised, target, ["series_id", "date"], ["value"]
        )
        assert stats == {"inserted": 0, "updated": 1, "unchanged": 0}
        (row,) = spark.read.parquet(target).collect()
        assert row["value"] is None

    def test_unchanged_row_keeps_existing_noncompare_columns(
        self, spark, tmp_path
    ):
        """The reference issues NO UPDATE for unchanged rows, so an
        incoming row with an equal value but a different series_name
        must leave the stored row untouched."""
        import datetime

        from economic_data_etl_spark.operators.upsert import upsert_parquet

        target = str(tmp_path / "t")
        schema = "series_id string, date date, value double, series_name string, source string"
        d = datetime.date(2023, 1, 1)
        first = spark.createDataFrame(
            [("U", d, 5.0, "OLD_NAME", "FRED")], schema
        )
        upsert_parquet(spark, first, target, ["series_id", "date"], ["value"])
        same_value = spark.createDataFrame(
            [("U", d, 5.0, "NEW_NAME", "FRED")], schema
        )
        stats = upsert_parquet(
            spark, same_value, target, ["series_id", "date"], ["value"]
        )
        assert stats == {"inserted": 0, "updated": 0, "unchanged": 1}
        (row,) = spark.read.parquet(target).collect()
        assert row["series_name"] == "OLD_NAME"

    def test_updated_row_refreshes_noncompare_columns(self, spark, tmp_path):
        """When the value DID change, the reference's UPDATE also sets
        series_name/source from the incoming row."""
        import datetime

        from economic_data_etl_spark.operators.upsert import upsert_parquet

        target = str(tmp_path / "t")
        schema = "series_id string, date date, value double, series_name string, source string"
        d = datetime.date(2023, 1, 1)
        first = spark.createDataFrame(
            [("U", d, 5.0, "OLD_NAME", "FRED")], schema
        )
        upsert_parquet(spark, first, target, ["series_id", "date"], ["value"])
        revised = spark.createDataFrame(
            [("U", d, 6.0, "NEW_NAME", "FRED")], schema
        )
        stats = upsert_parquet(
            spark, revised, target, ["series_id", "date"], ["value"]
        )
        assert stats == {"inserted": 0, "updated": 1, "unchanged": 0}
        (row,) = spark.read.parquet(target).collect()
        assert row["series_name"] == "NEW_NAME"
        assert row["value"] == 6.0
