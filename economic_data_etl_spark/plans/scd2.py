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
