"""Robust order-statistics analytics: MAD-based outlier screening.

Uses Spark's EXACT `percentile` aggregate (not `percentile_approx`) so
a DuckDB `quantile_cont` oracle can check it value-for-value — both
engines define the continuous quantile as linear interpolation at rank
p*(n-1). At 100 TB the exact aggregate is still viable per-group (it
sorts within the aggregation buffer of each group, not globally);
`percentile_approx`/`approx_quantile` is the sketch-backed drop-in once
group cardinality makes exact sort-per-group the bottleneck.

Reference parity: the reference has no statistical aggregates; its only
numeric guard is the NaN-epsilon comparator (src/load.py:27-35), which
`functions/casts.py` already mirrors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from economic_data_etl_spark.plans.catalog import biased_round, register
from economic_data_etl_spark.sources.tables import load_table


@register(
    "ts_outlier_mad",
    oracle="""
    WITH med AS (
        SELECT event_type, quantile_cont(value, 0.5) AS m
        FROM events GROUP BY 1
    ), mad AS (
        SELECT e.event_type, quantile_cont(ABS(e.value - m.m), 0.5) AS mad
        FROM events e JOIN med m USING (event_type)
        GROUP BY 1
    )
    SELECT e.event_type,
           ROUND(5e-10 + ANY_VALUE(m.m), 4) AS median_value,
           ROUND(5e-10 + ANY_VALUE(a.mad), 4) AS mad_value,
           CAST(SUM(CASE WHEN ABS(e.value - m.m) > 3 * a.mad
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           COUNT(*) AS n_events
    FROM events e
    JOIN med m USING (event_type)
    JOIN mad a USING (event_type)
    GROUP BY e.event_type
    ORDER BY e.event_type
    """,
    doc="Robust outlier screen per event type: median + median absolute "
    "deviation (both exact percentiles), then count of events beyond "
    "3*MAD. Two grouped aggregations; the tiny per-type stats are "
    "broadcast back onto the fact scan, so the events table shuffles "
    "once (for the first groupBy) and is rescanned, never reshuffled, "
    "for the deviation passes.",
)
def ts_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").select(
        "event_type", "value"
    )
    med = events.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("m")
    )
    dev = events.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("m"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            biased_round(F.any_value("m")).alias("median_value"),
            biased_round(F.any_value("mad")).alias("mad_value"),
            F.sum(
                F.when(F.col("adev") > 3 * F.col("mad"), 1).otherwise(0)
            ).alias("n_outliers"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type")
    )
