"""SCD2 dimension-history catalog query (operators/scd2.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from economic_data_etl_spark.operators.scd2 import scd2_from_events
from economic_data_etl_spark.plans.catalog import register
from economic_data_etl_spark.sources.tables import load_table


@register(
    "scd2_customer_priority_history",
    oracle="""
        WITH ev AS (
            SELECT o_custkey, o_orderdate AS ts,
                   arg_max(o_orderpriority, o_orderkey) AS priority
            FROM orders
            GROUP BY o_custkey, o_orderdate
        ), flagged AS (
            SELECT o_custkey, ts, priority,
                   (LAG(ts) OVER w IS NULL
                    OR priority IS DISTINCT FROM LAG(priority) OVER w)
                       AS keep
            FROM ev WINDOW w AS (PARTITION BY o_custkey ORDER BY ts)
        ), kept AS (
            SELECT o_custkey, ts, priority FROM flagged WHERE keep
        )
        SELECT o_custkey, priority,
               ts AS effective_from,
               LEAD(ts) OVER w2 AS effective_to,
               LEAD(ts) OVER w2 IS NULL AS is_current
        FROM kept WINDOW w2 AS (PARTITION BY o_custkey ORDER BY ts)
        ORDER BY o_custkey, effective_from
    """,
    doc="SCD Type-2 version history of each customer's order priority: "
    "same-day ties resolved with max_by(priority, orderkey), no-op "
    "changes collapsed, validity ranges from lead(), exactly one open "
    "row per customer. The oracle replays the identical gaps-and-"
    "islands window logic.",
)
def scd2_customer_priority_history(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    events = orders.groupBy("o_custkey", "o_orderdate").agg(
        F.max_by("o_orderpriority", "o_orderkey").alias("priority")
    )
    return scd2_from_events(
        events, "o_custkey", ["priority"], "o_orderdate"
    ).orderBy("o_custkey", "effective_from")


_HISTORY_SQL = """
        WITH ev AS (
            SELECT o_custkey, o_orderdate AS ts,
                   arg_max(o_orderpriority, o_orderkey) AS priority
            FROM orders
            GROUP BY o_custkey, o_orderdate
        ), flagged AS (
            SELECT o_custkey, ts, priority,
                   (LAG(ts) OVER w IS NULL
                    OR priority IS DISTINCT FROM LAG(priority) OVER w)
                       AS keep
            FROM ev WINDOW w AS (PARTITION BY o_custkey ORDER BY ts)
        ), kept AS (
            SELECT o_custkey, ts, priority FROM flagged WHERE keep
        ), dim AS (
            SELECT o_custkey, priority,
                   ts AS effective_from,
                   LEAD(ts) OVER w2 AS effective_to
            FROM kept
            WINDOW w2 AS (PARTITION BY o_custkey ORDER BY ts)
        )
"""


@register(
    "scd2_point_in_time_lookup",
    oracle=_HISTORY_SQL
    + """
        SELECT d.priority AS priority_then, COUNT(*) AS n_orders,
               CAST(SUM(CASE WHEN d.priority = o.o_orderpriority
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_matching
        FROM orders o
        JOIN dim d
          ON d.o_custkey = o.o_custkey
         AND o.o_orderdate >= d.effective_from
         AND (d.effective_to IS NULL OR o.o_orderdate < d.effective_to)
        GROUP BY 1
        ORDER BY priority_then
    """,
    doc="Point-in-time join: each order matched to the SCD2 dimension "
    "version valid AT its order date (range predicate on the validity "
    "interval, at most one version matches per fact). Counts how often "
    "the as-of attribute equals the fact's own — the reproducibility "
    "property training pipelines need (features as they were, not as "
    "they are). Equi-key + range predicate → hash join on the customer "
    "key with the interval filter applied post-match; no interval "
    "explosion.",
)
def scd2_point_in_time_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    events = orders.groupBy("o_custkey", "o_orderdate").agg(
        F.max_by("o_orderpriority", "o_orderkey").alias("priority")
    )
    dim = scd2_from_events(events, "o_custkey", ["priority"], "o_orderdate")
    o = orders.select("o_custkey", "o_orderdate", "o_orderpriority")
    d = dim.select(
        F.col("o_custkey").alias("d_custkey"),
        "priority",
        "effective_from",
        "effective_to",
    )
    joined = o.join(
        d,
        (F.col("o_custkey") == F.col("d_custkey"))
        & (F.col("o_orderdate") >= F.col("effective_from"))
        & (
            F.col("effective_to").isNull()
            | (F.col("o_orderdate") < F.col("effective_to"))
        ),
    )
    return (
        joined.groupBy(F.col("priority").alias("priority_then"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.when(
                    F.col("priority") == F.col("o_orderpriority"), 1
                ).otherwise(0)
            ).alias("n_matching"),
        )
        .orderBy("priority_then")
    )
