"""Mergeable-sketch aggregates (Apache DataSketches HLL, Spark 3.5+).

The 100 TB pattern: COUNT(DISTINCT) re-shuffles raw keys for every
grouping level — the single most expensive aggregate in a rollup
hierarchy. A mergeable sketch is aggregated ONCE at the finest grain;
every coarser level is a cheap union of tiny binary sketches (bytes, not
keys), which is also what makes incremental/continuous rollups possible:
yesterday's sketches merge with today's without touching yesterday's
rows. sketch-of-union == union-of-sketches is proven exactly in
tests/test_sketches.py, alongside a <5% relative-error bound against the
exact distinct count.

Rows-only driver check: DuckDB's approx_distinct uses a different sketch
implementation, so estimates are engine-specific by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from economic_data_etl_spark.plans.catalog import register
from economic_data_etl_spark.sources.tables import load_table


def per_type_user_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Finest-grain sketch table: one HLL of user_id per event_type."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )


@register(
    "sketch_hll_distinct_rollup",
    oracle=None,
    doc="Distinct users per event_type AND overall from ONE pass of "
    "sketching: per-type HLL sketches (hll_sketch_agg), overall = "
    "hll_union_agg over the per-type sketches — the raw user_id keys "
    "are never re-shuffled for the coarser level. Rows-only check "
    "(estimates are sketch-implementation-specific); merge-exactness "
    "and <5% error vs exact are pinned in tests/test_sketches.py.",
)
def sketch_hll_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    sketches = per_type_user_sketches(spark, sf_dir)
    per_type = sketches.select(
        "event_type",
        F.hll_sketch_estimate("sk").alias("approx_users"),
    )
    overall = sketches.agg(F.hll_union_agg("sk").alias("sk")).select(
        F.lit("ALL").alias("event_type"),
        F.hll_sketch_estimate("sk").alias("approx_users"),
    )
    return per_type.unionByName(overall).orderBy("event_type")
