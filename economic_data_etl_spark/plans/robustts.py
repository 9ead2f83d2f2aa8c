"""Robust trend statistics: the Theil-Sen slope estimator and the
Mann-Kendall trend test over the per-type daily event series.

OLS trend (ts_trend_regression, plans/statistics2.py) is the fast
moment-based answer, but a single corrupted day drags the fitted slope
arbitrarily far — the classic robustness failure a data-quality lane
cannot afford. The two standard non-parametric companions:

- **Theil-Sen** (Theil 1950; Sen, JASA 1968): slope = median of all
  pairwise slopes (v_j - v_i)/(x_j - x_i), i < j. 29.3% breakdown
  point — up to a third of the days can be arbitrarily wrong before
  the estimate moves unboundedly.
- **Mann-Kendall** (Mann 1945; Kendall 1975): S = Σ_{i<j}
  sign(v_j - v_i); with the tie-corrected variance
  Var(S) = [n(n-1)(2n+5) - Σ_t t(t-1)(2t+5)] / 18 and the
  continuity-corrected z = (S∓1)/√Var(S), the distribution-free test
  for monotone trend (no normality or linearity assumption).

Scale design: both statistics are O(d²) in the number of DAYS — and
days are calendar-bounded regardless of corpus size, exactly the
argument the seasonal/Granger/Holt-Winters lanes already carry
(plans/econometrics.py). The fact table shuffles ONCE into the daily
pre-aggregate (map-side combinable groupBy); the pairwise self-join
runs over the days-sized frame only, so at 100 TB the pair stage
still moves a few-thousand-row table. Day totals are biased-rounded
to 4 dp BEFORE any pairwise comparison on BOTH engines, so sign() and
the tie groups bind on identical doubles — cross-engine summation
noise can neither flip a sign nor create a one-sided tie.

Reference parity: the reference has no statistics beyond per-run row
counts; this extends the econometric lane the reference's users (macro
time-series analysts) reach for first when a series has outliers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from economic_data_etl_spark.plans.catalog import biased_round, register
from economic_data_etl_spark.sources.tables import load_table


def _r(col):
    return biased_round(col)


# Shared daily frame: one row per (event_type, day) with the 4dp
# biased-rounded day total and the 1-based day index. The rounding is
# the cross-engine determinism anchor (see module docstring).
_DAILY_SQL = """
    WITH daily AS (
        SELECT event_type,
               CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
               ROUND(5e-10 + SUM(value), 4) AS v
        FROM events
        WHERE value IS NOT NULL
        GROUP BY 1, 2
    ), indexed AS (
        SELECT event_type, v,
               ROW_NUMBER() OVER (
                   PARTITION BY event_type ORDER BY day
               ) * 1.0 AS x
        FROM daily
    ), pairs AS (
        SELECT a.event_type,
               a.v AS v_i, b.v AS v_j,
               a.x AS x_i, b.x AS x_j
        FROM indexed a JOIN indexed b
          ON a.event_type = b.event_type AND a.x < b.x
    )
"""


def _indexed_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(_r(F.sum("value")).alias("v"))
    )
    w = Window.partitionBy("event_type").orderBy("day")
    return daily.select(
        "event_type",
        "v",
        F.row_number().over(w).cast("double").alias("x"),
    )


def _pairs(indexed: DataFrame) -> DataFrame:
    a = indexed.alias("a")
    b = indexed.alias("b")
    return a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.x") < F.col("b.x")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        F.col("a.v").alias("v_i"),
        F.col("b.v").alias("v_j"),
        F.col("a.x").alias("x_i"),
        F.col("b.x").alias("x_j"),
    )


@register(
    "ts_theil_sen_trend",
    oracle=_DAILY_SQL
    + """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           ROUND(5e-10 + quantile_cont((v_j - v_i) / (x_j - x_i), 0.5),
                 4) AS ts_slope,
           ROUND(5e-10 + MIN((v_j - v_i) / (x_j - x_i)), 4)
               AS min_pair_slope,
           ROUND(5e-10 + MAX((v_j - v_i) / (x_j - x_i)), 4)
               AS max_pair_slope
    FROM pairs
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="Theil-Sen robust trend per event type: the exact median of "
    "all pairwise slopes over the daily series (29.3% breakdown "
    "point vs OLS's zero). The fact table collapses to the "
    "calendar-bounded daily frame in one map-side-combinable "
    "groupBy; the O(days²) pair join and the exact median run over "
    "that few-KB frame only, so the pair stage is SF-independent. "
    "Day totals are biased-rounded to 4 dp on both engines before "
    "differencing, so every pair slope is computed from identical "
    "doubles; Spark's exact percentile(0.5) and DuckDB's "
    "quantile_cont(0.5) then interpolate the same two middle "
    "elements bit-identically.",
)
def ts_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The days x types frame is tiny and consumed by both pair-join
    # sides: checkpoint it so the fact-table pre-aggregation runs once
    # (the econometrics-lane pattern).
    return theil_sen(_indexed_daily(spark, sf_dir).localCheckpoint())


def theil_sen(indexed: DataFrame) -> DataFrame:
    """Theil-Sen over an (event_type, v, x) indexed series frame."""
    pairs = _pairs(indexed)
    slope = (F.col("v_j") - F.col("v_i")) / (F.col("x_j") - F.col("x_i"))
    return (
        pairs.select("event_type", slope.alias("slope"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            _r(F.expr("percentile(slope, 0.5)")).alias("ts_slope"),
            _r(F.min("slope")).alias("min_pair_slope"),
            _r(F.max("slope")).alias("max_pair_slope"),
        )
        .orderBy("event_type")
    )


@register(
    "ts_mann_kendall_trend",
    oracle=_DAILY_SQL
    + """
    , s AS (
        SELECT event_type,
               CAST(SUM(SIGN(v_j - v_i)) AS BIGINT) AS s_stat
        FROM pairs
        GROUP BY event_type
    ), nd AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days
        FROM indexed
        GROUP BY event_type
    ), ties AS (
        SELECT event_type,
               COALESCE(SUM(t * (t - 1.0) * (2.0 * t + 5.0)), 0.0)
                   AS tie_term
        FROM (
            SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS t
            FROM indexed
            GROUP BY event_type, v
            HAVING COUNT(*) > 1
        )
        GROUP BY event_type
    ), var_s AS (
        SELECT nd.event_type, nd.n_days, s.s_stat,
               (nd.n_days * (nd.n_days - 1.0) * (2.0 * nd.n_days + 5.0)
                - COALESCE(ties.tie_term, 0.0)) / 18.0 AS vs
        FROM nd JOIN s USING (event_type)
        LEFT JOIN ties USING (event_type)
    )
    SELECT event_type, n_days, s_stat,
           ROUND(5e-10 + vs, 4) AS var_s,
           ROUND(5e-10 + CASE
               WHEN s_stat > 0 THEN (s_stat - 1.0) / SQRT(vs)
               WHEN s_stat < 0 THEN (s_stat + 1.0) / SQRT(vs)
               ELSE 0.0 END, 4) AS z_stat,
           CASE
               WHEN (CASE
                   WHEN s_stat > 0 THEN (s_stat - 1.0) / SQRT(vs)
                   WHEN s_stat < 0 THEN (s_stat + 1.0) / SQRT(vs)
                   ELSE 0.0 END) > 1.959964 THEN 'increasing'
               WHEN (CASE
                   WHEN s_stat > 0 THEN (s_stat - 1.0) / SQRT(vs)
                   WHEN s_stat < 0 THEN (s_stat + 1.0) / SQRT(vs)
                   ELSE 0.0 END) < -1.959964 THEN 'decreasing'
               ELSE 'no_trend' END AS trend
    FROM var_s
    ORDER BY event_type
    """,
    doc="Mann-Kendall trend test per event type: S = sum of pairwise "
    "sign(v_j - v_i) over the daily series, tie-corrected variance "
    "[n(n-1)(2n+5) - sum_t t(t-1)(2t+5)]/18, continuity-corrected "
    "z, and the 5%-level monotone-trend call. Distribution-free — "
    "the robust companion to ts_trend_regression's OLS fit. Same "
    "scale shape as Theil-Sen: one corpus shuffle into the "
    "calendar-bounded daily frame, O(days²) pairs over that frame "
    "only. sign() and the tie groups bind on the 4dp biased-rounded "
    "totals, so both engines see identical comparisons.",
)
def ts_mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Four consumers (pairs x2, n_days, ties) of the tiny daily frame:
    # checkpoint so the fact-table pre-aggregation runs once.
    return mann_kendall(_indexed_daily(spark, sf_dir).localCheckpoint())


def mann_kendall(indexed: DataFrame) -> DataFrame:
    """Mann-Kendall over an (event_type, v, x) indexed series frame."""
    pairs = _pairs(indexed)
    s = pairs.groupBy("event_type").agg(
        F.sum(F.signum(F.col("v_j") - F.col("v_i")))
        .cast("long")
        .alias("s_stat")
    )
    nd = indexed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days")
    )
    ties = (
        indexed.groupBy("event_type", "v")
        .agg(F.count(F.lit(1)).cast("double").alias("t"))
        .filter(F.col("t") > 1)
        .groupBy("event_type")
        .agg(
            F.sum(
                F.col("t")
                * (F.col("t") - F.lit(1.0))
                * (F.lit(2.0) * F.col("t") + F.lit(5.0))
            ).alias("tie_term")
        )
    )
    nd_d = F.col("n_days").cast("double")
    vs = (
        nd_d * (nd_d - F.lit(1.0)) * (F.lit(2.0) * nd_d + F.lit(5.0))
        - F.coalesce(F.col("tie_term"), F.lit(0.0))
    ) / F.lit(18.0)
    z = (
        F.when(
            F.col("s_stat") > 0,
            (F.col("s_stat").cast("double") - F.lit(1.0)) / F.sqrt(vs),
        )
        .when(
            F.col("s_stat") < 0,
            (F.col("s_stat").cast("double") + F.lit(1.0)) / F.sqrt(vs),
        )
        .otherwise(F.lit(0.0))
    )
    return (
        nd.join(s, "event_type")
        .join(ties, "event_type", "left")
        .select(
            "event_type",
            "n_days",
            "s_stat",
            _r(vs).alias("var_s"),
            _r(z).alias("z_stat"),
            F.when(z > F.lit(1.959964), F.lit("increasing"))
            .when(z < F.lit(-1.959964), F.lit("decreasing"))
            .otherwise(F.lit("no_trend"))
            .alias("trend"),
        )
        .orderBy("event_type")
    )
