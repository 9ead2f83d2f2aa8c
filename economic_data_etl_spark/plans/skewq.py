"""Catalog entry for skew-resistant aggregation: the salted two-phase
sum, oracle-checked against the plain (unsalted) GROUP BY.

The oracle deliberately does NOT model the salt: equivalence to the
direct aggregation IS the correctness property of salting (the salt
only reroutes partial groups across reducers; decomposable aggregates
recombine exactly). Float sums are rounded at the shared 4dp contract
because the salt changes summation order, which moves the low bits —
the same reason every cross-engine float aggregate in this catalog
rounds.

Scale story: `event_type` has single-digit cardinality, so an unsalted
groupBy at 100 TB funnels the whole table into a handful of reducers —
exactly the hot-key shape salting exists for. Phase 1 spreads each key
over 16 salt buckets (map-side combine still applies), phase 2 merges
16 partials per key — constant-size final stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from economic_data_etl_spark.plans.catalog import biased_round, register
from economic_data_etl_spark.sources.tables import load_table


@register(
    "agg_salted_hotkey_sum",
    oracle="""
    SELECT event_type,
           ROUND(5e-10 + SUM(value), 4) AS total_value,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="Skew-resistant two-phase aggregation over the hot-key-shaped "
    "events table (single-digit event_type cardinality): phase 1 "
    "groups by (event_type, salt16) spreading each hot key over 16 "
    "reducers, phase 2 merges the 16 partials per key. Oracle is the "
    "UNSALTED direct GROUP BY — equivalence to it is the operator's "
    "correctness property.",
)
def agg_salted_hotkey_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from economic_data_etl_spark.operators.skew import salted_sum

    events = load_table(spark, sf_dir, "events").select(
        "event_type", "value"
    )
    out = salted_sum(
        events,
        keys=["event_type"],
        agg_cols={"value": "total_value"},
        salt_buckets=16,
    )
    return out.select(
        "event_type",
        biased_round(F.col("total_value")).alias("total_value"),
        F.col("n_rows").cast("bigint").alias("n_rows"),
    ).orderBy("event_type")
