"""Event-time queries over the `events` table: tumbling / sliding /
session windows (batch semantics, SURVEY.md §2.10), as-of join, range join.

The streaming twins of the window queries live in
`economic_data_etl_spark/streaming/windows.py`; these batch forms share the
same window math so results are oracle-checkable in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from economic_data_etl_spark.operators.asof import asof_join
from economic_data_etl_spark.operators.sessionize import sessionize
from economic_data_etl_spark.plans.catalog import biased_round, register
from economic_data_etl_spark.sources.tables import load_table


def _r(col):
    return biased_round(col)


# --------------------------------------------------------------------------
# Tumbling window aggregation.
# --------------------------------------------------------------------------
@register(
    "events_tumbling_window",
    oracle="""
        SELECT
            DATE_TRUNC('hour', ts) AS window_start,
            event_type,
            COUNT(*) AS n_events,
            ROUND(5e-10 + SUM(value), 4) AS total_value
        FROM events
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
    doc="1-hour tumbling window via F.window — partial agg then shuffle on (window, type).",
)
def events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _r(F.sum("value")).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


# --------------------------------------------------------------------------
# Sliding window aggregation (1h window, 30min slide → 2 windows/event).
# --------------------------------------------------------------------------
@register(
    "events_sliding_window",
    oracle="""
        SELECT ws AS window_start, COUNT(*) AS n_events,
               ROUND(5e-10 + AVG(value), 4) AS avg_value
        FROM (
            SELECT u.ws, e.value
            FROM (
                SELECT value,
                       time_bucket(INTERVAL '30 minutes', ts) AS tb
                FROM events
            ) e,
            UNNEST([e.tb, e.tb - INTERVAL '30 minutes']) AS u(ws)
        ) t
        GROUP BY ws
        ORDER BY ws
    """,
    doc="Sliding window: each event contributes to window_length/slide buckets.",
)
def events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _r(F.avg("value")).alias("avg_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "avg_value")
        .orderBy("window_start")
    )


# --------------------------------------------------------------------------
# Session windows (batch gap-based sessionization).
# --------------------------------------------------------------------------
@register(
    "events_session_windows",
    oracle="""
        WITH flagged AS (
            SELECT user_id, ts, value,
                   CASE WHEN LAG(ts) OVER w IS NULL
                             OR ts > LAG(ts) OVER w + INTERVAL '30 minutes'
                        THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ), numbered AS (
            SELECT user_id, ts, value,
                   SUM(is_new) OVER (
                       PARTITION BY user_id ORDER BY ts
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) - 1 AS session_id
            FROM flagged
        )
        SELECT user_id,
               CAST(session_id AS BIGINT) AS session_id,
               MIN(ts) AS session_start,
               MAX(ts) AS session_end,
               COUNT(*) AS n_events,
               ROUND(5e-10 + SUM(value), 4) AS session_value
        FROM numbered
        GROUP BY user_id, session_id
        ORDER BY user_id, session_id
    """,
    doc="30-min-gap sessionization: lag + running sum, then per-session agg.",
)
def events_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    sess = sessionize(ev, key="user_id", ts="ts", gap="30 minutes")
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            _r(F.sum("value")).alias("session_value"),
        )
        .withColumn("session_id", F.col("session_id").cast("long"))
        .select(
            "user_id",
            "session_id",
            "session_start",
            "session_end",
            "n_events",
            "session_value",
        )
        .orderBy("user_id", "session_id")
    )


# --------------------------------------------------------------------------
# As-of join: each purchase ← most recent prior view by the same user.
# --------------------------------------------------------------------------
@register(
    "events_asof_purchase_view",
    oracle="""
        SELECT p.event_id, p.user_id, p.ts, v.ts AS view_ts_asof
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
            ON p.user_id = v.user_id AND p.ts >= v.ts
        ORDER BY p.event_id
    """,
    doc="Point-in-time join via union+window (one shuffle), oracle = DuckDB ASOF JOIN.",
)
def events_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("view_ts")
    )
    return (
        asof_join(
            purchases,
            views,
            on="user_id",
            left_ts="ts",
            right_ts="view_ts",
            right_payload=["view_ts"],
            suffix="_asof",
        )
        .select("event_id", "user_id", "ts", "view_ts_asof")
        .orderBy("event_id")
    )


# --------------------------------------------------------------------------
# Range (interval) join against a small tier table.
# --------------------------------------------------------------------------
@register(
    "events_range_join_tiers",
    oracle="""
        WITH tiers(tier, lo, hi) AS (
            VALUES ('t0_small', 0.0, 5.0),
                   ('t1_mid',   5.0, 10.0),
                   ('t2_big',  10.0, 20.0),
                   ('t3_huge', 20.0, 1e9)
        )
        SELECT tier, COUNT(*) AS n, ROUND(5e-10 + SUM(value), 4) AS total_value
        FROM events JOIN tiers ON value >= lo AND value < hi
        GROUP BY tier
        ORDER BY tier
    """,
    doc="Theta/range join: broadcast the tiny interval table (nested-loop on 4 rows).",
)
def events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    tiers = spark.createDataFrame(
        [
            ("t0_small", 0.0, 5.0),
            ("t1_mid", 5.0, 10.0),
            ("t2_big", 10.0, 20.0),
            ("t3_huge", 20.0, 1e9),
        ],
        "tier string, lo double, hi double",
    )
    return (
        ev.join(
            F.broadcast(tiers),
            (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")),
        )
        .groupBy("tier")
        .agg(F.count(F.lit(1)).alias("n"), _r(F.sum("value")).alias("total_value"))
        .orderBy("tier")
    )
