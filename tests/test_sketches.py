"""HLL sketch rollup: mergeability is exact, estimates are bounded."""

from __future__ import annotations

from pyspark.sql import functions as F

from economic_data_etl_spark.plans.sketches import per_type_user_sketches
from economic_data_etl_spark.sources.tables import load_table


class TestHllRollup:
    def test_union_of_sketches_equals_sketch_of_union(self, spark, sf_dir):
        """The property that makes sketch rollups sound: merging the
        per-group sketches must give the SAME estimate as sketching all
        rows directly (HLL union is lossless at equal lgK)."""
        merged = (
            per_type_user_sketches(spark, sf_dir)
            .agg(F.hll_union_agg("sk").alias("sk"))
            .select(F.hll_sketch_estimate("sk").alias("est"))
            .collect()[0]["est"]
        )
        direct = (
            load_table(spark, sf_dir, "events")
            .agg(F.hll_sketch_agg("user_id").alias("sk"))
            .select(F.hll_sketch_estimate("sk").alias("est"))
            .collect()[0]["est"]
        )
        assert merged == direct

    def test_estimates_within_5pct_of_exact(self, spark, sf_dir):
        ev = load_table(spark, sf_dir, "events")
        exact = {
            r["event_type"]: r["exact"]
            for r in ev.groupBy("event_type")
            .agg(F.count_distinct("user_id").alias("exact"))
            .collect()
        }
        approx = {
            r["event_type"]: r["approx_users"]
            for r in per_type_user_sketches(spark, sf_dir)
            .select(
                "event_type", F.hll_sketch_estimate("sk").alias("approx_users")
            )
            .collect()
        }
        assert set(exact) == set(approx)
        for etype, ex in exact.items():
            rel_err = abs(approx[etype] - ex) / max(1, ex)
            assert rel_err < 0.05, f"{etype}: {approx[etype]} vs {ex}"
