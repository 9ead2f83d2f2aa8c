"""Time-series operators over the events stream — the reference's domain
(economic time series) generalized: gap-aware forward fill, OHLC
resampling, day-over-day change. All window/aggregate compositions, no
UDFs; each shuffles once on the entity key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from economic_data_etl_spark.functions.casts import ts_diff_seconds
from economic_data_etl_spark.plans.catalog import biased_round, register
from economic_data_etl_spark.sources.tables import load_table


def _r(col):
    return biased_round(col)


@register(
    "ts_forward_fill",
    oracle="""
        SELECT user_id, event_id,
               ROUND(5e-10 + masked, 4) AS masked,
               ROUND(5e-10 + last_value(masked IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ), 4) AS filled
        FROM (
            SELECT user_id, event_id, ts,
                   CASE WHEN value < 5.0 THEN NULL ELSE value END AS masked
            FROM events
            WHERE user_id <= 10
        ) t
        ORDER BY user_id, event_id
    """,
    doc="Forward fill (last observation carried forward) per entity: "
    "last(IGNORE NULLS) over an ordered running frame — the missing-value "
    "treatment the reference's NaN handling implies for time series.",
)
def ts_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") <= 10)
    masked = F.when(F.col("value") < 5.0, None).otherwise(F.col("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ev.select("user_id", "event_id", "ts", masked.alias("masked"))
        .select(
            "user_id",
            "event_id",
            _r(F.col("masked")).alias("masked"),
            _r(F.last("masked", ignorenulls=True).over(w)).alias("filled"),
        )
        .orderBy("user_id", "event_id")
    )


@register(
    "ts_ohlc_daily",
    oracle="""
        SELECT user_id,
               CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
               ROUND(5e-10 + arg_min(value, ts), 4)  AS open,
               ROUND(5e-10 + MAX(value), 4)          AS high,
               ROUND(5e-10 + MIN(value), 4)          AS low,
               ROUND(5e-10 + arg_max(value, ts), 4)  AS close,
               COUNT(*) AS n_ticks
        FROM events
        WHERE user_id <= 10
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
    doc="Downsample/resample to daily OHLC candles: min_by/max_by on the "
    "timestamp give open/close without a sort (timestamps are unique "
    "within user at microsecond grain).",
)
def ts_ohlc_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") <= 10)
    return (
        ev.groupBy(
            "user_id", F.date_trunc("day", "ts").alias("day")
        )
        .agg(
            _r(F.min_by("value", "ts")).alias("open"),
            _r(F.max("value")).alias("high"),
            _r(F.min("value")).alias("low"),
            _r(F.max_by("value", "ts")).alias("close"),
            F.count(F.lit(1)).alias("n_ticks"),
        )
        .orderBy("user_id", "day")
    )


@register(
    "ts_day_over_day_change",
    oracle="""
        WITH daily AS (
            SELECT user_id, CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
                   SUM(value) AS day_total
            FROM events WHERE user_id <= 10
            GROUP BY 1, 2
        )
        SELECT user_id, day,
               ROUND(5e-10 + day_total, 4) AS day_total,
               ROUND(5e-10 + day_total - LAG(day_total) OVER w, 4) AS abs_change,
               ROUND(5e-10 + 100.0 * (day_total - LAG(day_total) OVER w)
                     / NULLIF(LAG(day_total) OVER w, 0), 4) AS pct_change
        FROM daily
        WINDOW w AS (PARTITION BY user_id ORDER BY day)
        ORDER BY user_id, day
    """,
    doc="Aggregate-then-window: daily totals, then day-over-day absolute "
    "and percent change per entity (the reference's revision-delta shape).",
)
def ts_day_over_day_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") <= 10)
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(F.sum("value").alias("day_total"))
    w = Window.partitionBy("user_id").orderBy("day")
    prev = F.lag("day_total").over(w)
    return (
        daily.select(
            "user_id",
            "day",
            _r(F.col("day_total")).alias("day_total"),
            _r(F.col("day_total") - prev).alias("abs_change"),
            _r(F.lit(100.0) * (F.col("day_total") - prev) / F.nullif(prev, F.lit(0.0))).alias(
                "pct_change"
            ),
        )
        .orderBy("user_id", "day")
    )


@register(
    "agg_grouping_id",
    oracle="""
        SELECT o_orderpriority, o_orderstatus,
               CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
               CAST(GROUPING(o_orderstatus) AS INT)   AS g_status,
               COUNT(*) AS n
        FROM orders
        GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
        ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST
    """,
    doc="GROUPING() indicator columns distinguish rollup subtotal levels "
    "from genuine NULL group keys.",
)
def agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.grouping("o_orderpriority").cast("int").alias("g_priority"),
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy(
            F.col("o_orderpriority").asc_nulls_first(),
            F.col("o_orderstatus").asc_nulls_first(),
        )
    )


# --------------------------------------------------------------------------
# Gap-aware linear interpolation (resample + interpolate).
# --------------------------------------------------------------------------
@register(
    "ts_linear_interpolate",
    oracle=r"""
        WITH hourly AS (
            SELECT event_type, date_trunc('hour', ts) AS hr, AVG(value) AS v
            FROM events GROUP BY 1, 2
        ), bounds AS (
            SELECT event_type, MIN(hr) AS lo, MAX(hr) AS hi
            FROM hourly GROUP BY 1
        ), spine AS (
            SELECT event_type,
                   unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr
            FROM bounds
        ), j AS (
            SELECT s.event_type, s.hr, h.v
            FROM spine s LEFT JOIN hourly h USING (event_type, hr)
        ), w AS (
            SELECT event_type, hr, v,
                   LAST_VALUE(v IGNORE NULLS) OVER (
                       PARTITION BY event_type ORDER BY hr
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_v,
                   LAST_VALUE(CASE WHEN v IS NOT NULL THEN hr END IGNORE NULLS) OVER (
                       PARTITION BY event_type ORDER BY hr
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_h,
                   FIRST_VALUE(v IGNORE NULLS) OVER (
                       PARTITION BY event_type ORDER BY hr
                       ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_v,
                   FIRST_VALUE(CASE WHEN v IS NOT NULL THEN hr END IGNORE NULLS) OVER (
                       PARTITION BY event_type ORDER BY hr
                       ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_h
            FROM j
        )
        SELECT event_type, hr,
               CAST(v IS NOT NULL AS INT) AS observed,
               ROUND(5e-10 + CASE
                   WHEN v IS NOT NULL THEN v
                   WHEN prev_v IS NOT NULL AND next_v IS NOT NULL
                       THEN prev_v + (next_v - prev_v)
                            * (epoch(hr) - epoch(prev_h))
                            / (epoch(next_h) - epoch(prev_h))
                   ELSE COALESCE(prev_v, next_v) END, 4) AS value
        FROM w
        ORDER BY event_type, hr
    """,
    doc="Resample to an hourly grid and LINEARLY INTERPOLATE interior "
    "gaps (edges forward/back-fill): per-type spine via "
    "sequence()+explode (distributed, no driver-side date math), then "
    "ONE window pass computing last/first non-null value AND its "
    "timestamp; the interpolation weight is exact integer epoch "
    "arithmetic. The time-series upgrade of ts_forward_fill for "
    "economic series where holding the last value misstates trends.",
)
def ts_linear_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hr")
    ).agg(F.avg("value").alias("v"))
    spine = (
        hourly.groupBy("event_type")
        .agg(F.min("hr").alias("lo"), F.max("hr").alias("hi"))
        .select(
            "event_type",
            F.explode(
                F.sequence("lo", "hi", F.expr("interval 1 hour"))
            ).alias("hr"),
        )
    )
    j = spine.join(hourly, ["event_type", "hr"], "left")
    w_prev = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_next = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    hr_obs = F.when(F.col("v").isNotNull(), F.col("hr"))
    prev_v = F.last("v", ignorenulls=True).over(w_prev)
    prev_h = F.last(hr_obs, ignorenulls=True).over(w_prev)
    next_v = F.first("v", ignorenulls=True).over(w_next)
    next_h = F.first(hr_obs, ignorenulls=True).over(w_next)
    frac = ts_diff_seconds(prev_h, F.col("hr")) / ts_diff_seconds(
        prev_h, next_h
    )
    filled = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(
            prev_v.isNotNull() & next_v.isNotNull(),
            prev_v + (next_v - prev_v) * frac,
        )
        .otherwise(F.coalesce(prev_v, next_v))
    )
    return (
        j.select(
            "event_type",
            "hr",
            F.col("v").isNotNull().cast("int").alias("observed"),
            biased_round(filled).alias("value"),
        )
        .orderBy("event_type", "hr")
    )
