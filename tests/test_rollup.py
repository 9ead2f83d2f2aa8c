"""Continuous aggregate: incremental refreshes must equal a full
recompute, and each refresh must only touch the tail."""

from __future__ import annotations

from pyspark.sql import functions as F

from economic_data_etl_spark.operators.rollup import (
    hourly_rollup,
    refresh_continuous_aggregate,
)
from economic_data_etl_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


class TestContinuousAggregate:
    def test_incremental_equals_full_recompute(self, spark, tmp_path):
        ev = load_table(spark, SF_DIR, "events")
        cut = ev.agg(
            F.expr("percentile(" + "unix_micros(cast(ts as timestamp)) / 1e6" + ", 0.6)").alias("c")
        ).collect()[0]["c"]
        cutoff = F.timestamp_seconds(F.lit(cut))
        first = ev.filter(F.col("ts") < cutoff)
        rest = ev.filter(F.col("ts") >= cutoff)

        rollup_path = str(tmp_path / "rollup")
        state = tmp_path / "state"

        s1 = refresh_continuous_aggregate(spark, first, rollup_path, state)
        assert s1["inserted"] > 0 and s1["updated"] == 0

        # second refresh sees the full table but should only re-aggregate
        # the tail (watermark - lateness onward)
        s2 = refresh_continuous_aggregate(spark, ev, rollup_path, state)
        total_buckets = hourly_rollup(ev).count()
        touched = s2["inserted"] + s2["updated"] + s2["unchanged"]
        assert touched < total_buckets  # incremental, not full recompute

        got = {
            (r["bucket"], r["event_type"]): (r["n_events"], round(r["total_value"], 6))
            for r in spark.read.parquet(rollup_path).collect()
        }
        want = {
            (r["bucket"], r["event_type"]): (r["n_events"], round(r["total_value"], 6))
            for r in hourly_rollup(ev).collect()
        }
        assert got == want

    def test_idempotent_refresh(self, spark, tmp_path):
        ev = load_table(spark, SF_DIR, "events")
        rollup_path = str(tmp_path / "rollup")
        state = tmp_path / "state"
        refresh_continuous_aggregate(spark, ev, rollup_path, state)
        s2 = refresh_continuous_aggregate(spark, ev, rollup_path, state)
        assert s2["inserted"] == 0 and s2["updated"] == 0  # nothing new
