"""AR(2) autoregressive forecasting by Yule-Walker, per event series.

The classical-econometrics counterpart of the Holt-Winters lane
(operators/holtwinters.py): fit x_t = phi1 x_{t-1} + phi2 x_{t-2} + e_t
on the demeaned per-key daily totals by solving the Yule-Walker
equations in closed form, then forecast 7 steps ahead by unrolling the
recurrence.

Execution shape (the house pattern for per-key series math): ONE
shuffle builds the (key, day) daily table with map-side combine, a
second collapses each key to its day-sorted value array, and every
statistic is a Catalyst in-row fold over that days-sized array — the
documented bounded exception (days x keys, like Holt-Winters/CUSUM),
never a corpus-sized window.

Numerics, cross-engine: the lag-k moment sums S_k = sum x_t x_{t-k}
are accumulated in day order on both engines (Spark: left-assoc
aggregate() fold from 0.0; oracle: SUM(expr ORDER BY day), which
DuckDB folds over the sorted input). The 1/n autocovariance
normalization CANCELS in the Yule-Walker ratios, so both engines
compute phi from the raw sums directly — two fewer divisions to
diverge:

    phi1 = S1 (S0 - S2) / (S0^2 - S1^2)
    phi2 = (S0 S2 - S1^2) / (S0^2 - S1^2)

The mean enters through ONE let-binding (functions/text.py:let) so the
fold that computes it runs once per key, not once per element of every
moment fold (the lambda-CSE rule). Forecasts unroll the recurrence
f_h = phi1 f_{h-1} + phi2 f_{h-2} with identical expression shape on
both sides; the only float outputs are biased-rounded, and the only
row-membership gate (n >= 10) is an integer count.

Reference parity: the reference has no forecasting; this completes the
econometrics lane next to ts_holt_winters_forecast (exponential
smoothing), ts_forecast_model_select (ETS-lite), and
ts_granger_lead_test (lagged regression).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from economic_data_etl_spark.functions.text import let
from economic_data_etl_spark.plans.catalog import biased_round, register
from economic_data_etl_spark.sources.tables import load_table

_MIN_DAYS = 10
_HORIZON = 7

_AR_ORACLE = f"""
    WITH daily AS (
        SELECT event_type,
               CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
               SUM(value) AS total
        FROM events GROUP BY 1, 2
    ), ser AS (
        SELECT event_type, COUNT(*) AS n,
               SUM(total ORDER BY day) / COUNT(*) AS mean
        FROM daily GROUP BY event_type
        HAVING COUNT(*) >= {_MIN_DAYS}
    ), lagd AS (
        SELECT d.event_type, d.day, s.n, s.mean,
               d.total - s.mean AS x,
               LAG(d.total - s.mean, 1) OVER w AS x1,
               LAG(d.total - s.mean, 2) OVER w AS x2,
               ROW_NUMBER() OVER w AS rn
        FROM daily d JOIN ser s USING (event_type)
        WINDOW w AS (PARTITION BY d.event_type ORDER BY d.day)
    ), sums AS (
        SELECT event_type, MAX(n) AS n, MAX(mean) AS mean,
               SUM(x * x ORDER BY day) AS s0,
               SUM(x * x1 ORDER BY day) AS s1,
               SUM(x * x2 ORDER BY day) AS s2,
               MAX(CASE WHEN rn = n THEN x END) AS xl,
               MAX(CASE WHEN rn = n - 1 THEN x END) AS xp
        FROM lagd GROUP BY event_type
    ), phis AS (
        SELECT event_type, mean, xl, xp,
               s1 * (s0 - s2) / (s0 * s0 - s1 * s1) AS p1,
               (s0 * s2 - s1 * s1) / (s0 * s0 - s1 * s1) AS p2
        FROM sums
    ), f1 AS (SELECT *, p1 * xl + p2 * xp AS f1 FROM phis
    ), f2 AS (SELECT *, p1 * f1 + p2 * xl AS f2 FROM f1
    ), f3 AS (SELECT *, p1 * f2 + p2 * f1 AS f3 FROM f2
    ), f4 AS (SELECT *, p1 * f3 + p2 * f2 AS f4 FROM f3
    ), f5 AS (SELECT *, p1 * f4 + p2 * f3 AS f5 FROM f4
    ), f6 AS (SELECT *, p1 * f5 + p2 * f4 AS f6 FROM f5
    ), f7 AS (SELECT *, p1 * f6 + p2 * f5 AS f7 FROM f6
    )
    SELECT event_type, h,
           ROUND(5e-10 + mean + CASE h WHEN 1 THEN f1 WHEN 2 THEN f2
                 WHEN 3 THEN f3 WHEN 4 THEN f4 WHEN 5 THEN f5
                 WHEN 6 THEN f6 WHEN 7 THEN f7 END, 4) AS yhat,
           ROUND(5e-10 + p1, 4) AS phi1,
           ROUND(5e-10 + p2, 4) AS phi2
    FROM f7,
         UNNEST(range(1, {_HORIZON} + 1)) AS t(hh),
         LATERAL (SELECT CAST(hh AS INTEGER) AS h)
    ORDER BY event_type, h
"""


def yule_walker_ar2(daily: DataFrame) -> DataFrame:
    """(event_type, mean, phi1, phi2, xl, xp) from a (event_type, day,
    total) daily table — one days-sized collect_list per key, every
    moment a left-assoc in-row fold in day order."""
    ser = (
        daily.groupBy("event_type")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("day", "total"))
            ).alias("pts")
        )
        .select(
            "event_type",
            F.transform(
                F.col("pts"), lambda p: p["total"].cast("double")
            ).alias("y"),
            F.size("pts").alias("n"),
        )
        .filter(F.col("n") >= _MIN_DAYS)
    )
    y, n = F.col("y"), F.col("n")
    mean = (
        F.aggregate(y, F.lit(0.0), lambda a, v: a + v) / n
    )

    def stats(m):
        def x(i):
            return F.element_at(y, i.cast("int")) - m

        def moment(k):
            return F.aggregate(
                F.sequence(F.lit(1 + k), n),
                F.lit(0.0),
                lambda a, i: a + x(i) * x(i - k),
            )

        return F.struct(
            m.alias("mean"),
            moment(0).alias("s0"),
            moment(1).alias("s1"),
            moment(2).alias("s2"),
            x(n.cast("bigint")).alias("xl"),
            x((n - 1).cast("bigint")).alias("xp"),
        )

    st = ser.select("event_type", let(mean, stats).alias("st")).select(
        "event_type", "st.*"
    )
    s0, s1, s2 = F.col("s0"), F.col("s1"), F.col("s2")
    den = s0 * s0 - s1 * s1
    return st.select(
        "event_type",
        "mean",
        "xl",
        "xp",
        (s1 * (s0 - s2) / den).alias("p1"),
        ((s0 * s2 - s1 * s1) / den).alias("p2"),
    )


def ar2_forecast(phis: DataFrame, horizon: int = _HORIZON) -> DataFrame:
    """Unroll f_h = phi1 f_{h-1} + phi2 f_{h-2} from the last two
    demeaned observations; one output row per (key, h)."""
    p1, p2 = F.col("p1"), F.col("p2")
    fs = []
    fm1, fm2 = F.col("xl"), F.col("xp")
    for _ in range(horizon):
        fh = p1 * fm1 + p2 * fm2
        fs.append(fh)
        fm2, fm1 = fm1, fh
    steps = F.array(
        *[
            F.struct(
                F.lit(h + 1).cast("int").alias("h"),
                (F.col("mean") + fs[h]).alias("f"),
            )
            for h in range(horizon)
        ]
    )
    return (
        phis.select("event_type", "p1", "p2", F.explode(steps).alias("e"))
        .select(
            "event_type",
            F.col("e.h").alias("h"),
            biased_round(F.col("e.f")).alias("yhat"),
            biased_round(F.col("p1")).alias("phi1"),
            biased_round(F.col("p2")).alias("phi2"),
        )
        .orderBy("event_type", "h")
    )


@register(
    "ts_yule_walker_ar2",
    oracle=_AR_ORACLE,
    doc="AR(2) fit by closed-form Yule-Walker on the demeaned per-key "
    "daily totals, forecast 7 steps by unrolling the recurrence: one "
    "(key, day) pre-aggregation shuffle, one per-key day-sorted array, "
    "all moments as left-assoc in-row folds in day order (the oracle's "
    "ordered aggregates fold identically); the 1/n autocovariance "
    "normalization cancels in the phi ratios so both engines work from "
    "raw sums. Days x keys bounded — the documented series exception. "
    "The only row gate (n >= 10) is an integer count.",
)
def ts_yule_walker_ar2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from economic_data_etl_spark.operators.cusum import daily_totals

    daily = daily_totals(load_table(spark, sf_dir, "events")).select(
        "event_type", "day", "total"
    )
    return ar2_forecast(yule_walker_ar2(daily))


# ---------------------------------------------------------------------------
# Kalman local-level filter

_KQ = 100.0  # process (level random-walk) variance — config literal
_KR = 400.0  # measurement variance — config literal

# One filter step inlined for the recursive CTE (the HW-oracle
# technique: repeated subexpressions instead of aliases, so the
# association is pinned): pp = p + Q; k = pp / (pp + R).
_K_LNEW = (
    f"s.l + ((s.p + {_KQ}) / ((s.p + {_KQ}) + {_KR}))"
    " * (r.total - s.l)"
)
_K_PNEW = (
    f"(1.0 - ((s.p + {_KQ}) / ((s.p + {_KQ}) + {_KR})))"
    f" * (s.p + {_KQ})"
)

_KALMAN_ORACLE = f"""
    WITH RECURSIVE daily AS (
        SELECT event_type,
               CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
               SUM(value) AS total
        FROM events GROUP BY 1, 2
    ), rn AS (
        SELECT event_type, day, total,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY day) AS p
        FROM daily
    ), state AS (
        SELECT event_type, 1 AS t, total AS l,
               CAST({_KR} AS DOUBLE) AS p
        FROM rn WHERE p = 1
        UNION ALL
        SELECT s.event_type, s.t + 1,
               {_K_LNEW} AS l,
               {_K_PNEW} AS p
        FROM state s JOIN rn r
          ON r.event_type = s.event_type AND r.p = s.t + 1
    )
    SELECT s.event_type, r.day, r.total AS y,
           ROUND(5e-10 + s.l, 4) AS level,
           ROUND(5e-10 + s.p, 4) AS variance
    FROM state s JOIN rn r
      ON r.event_type = s.event_type AND r.p = s.t
    ORDER BY s.event_type, r.day
"""


@register(
    "ts_kalman_filter",
    oracle=_KALMAN_ORACLE,
    doc="Kalman local-level filter (random-walk state + observation "
    f"noise; process var {_KQ}, measurement var {_KR}, init l=y1 "
    f"p={_KR}) over the per-key daily totals: predict pp = p + q, "
    "gain k = pp/(pp+r), update l += k(y-l), p = (1-k)pp. The whole "
    "filtered path is ONE Catalyst aggregate-fold per key over the "
    "day-sorted array (the Holt-Winters fold pattern — zero Python, "
    "zero per-step shuffles), with the level/variance paths carried "
    "in the fold state; the oracle replays the recurrence as a "
    "recursive CTE with the gain expression INLINED (no aliases) so "
    "every IEEE double reproduces bit-for-bit. Output: the per-day "
    "filtered level and variance — the adaptive smoother whose gain "
    "falls as evidence accumulates, unlike fixed-alpha EWMA.",
)
def ts_kalman_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from economic_data_etl_spark.operators.cusum import daily_totals

    daily = daily_totals(load_table(spark, sf_dir, "events")).select(
        "event_type", "day", "total"
    )
    ser = (
        daily.groupBy("event_type")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("day", "total"))
            ).alias("pts")
        )
        .select(
            "event_type",
            F.transform(
                F.col("pts"), lambda p: p["day"]
            ).alias("days"),
            F.transform(
                F.col("pts"), lambda p: p["total"].cast("double")
            ).alias("y"),
            F.size("pts").alias("n"),
        )
    )
    y, n = F.col("y"), F.col("n")
    y1 = F.element_at(y, 1)

    def step(acc, yv):
        pp = acc["p"] + F.lit(_KQ)
        k = pp / (pp + F.lit(_KR))
        l_new = acc["l"] + k * (yv - acc["l"])
        p_new = (F.lit(1.0) - k) * pp
        return F.struct(
            l_new.alias("l"),
            p_new.alias("p"),
            F.concat(acc["lv"], F.array(l_new)).alias("lv"),
            F.concat(acc["pv"], F.array(p_new)).alias("pv"),
        )

    init = F.struct(
        y1.alias("l"),
        F.lit(_KR).alias("p"),
        F.array(y1).alias("lv"),
        F.array(F.lit(_KR)).alias("pv"),
    )
    state = F.aggregate(F.slice(y, 2, n - 1), init, step)
    rows = ser.select(
        "event_type",
        F.explode(
            F.arrays_zip(
                F.col("days").alias("day"),
                F.col("y").alias("yv"),
                state["lv"].alias("lv"),
                state["pv"].alias("pv"),
            )
        ).alias("e"),
    )
    return rows.select(
        "event_type",
        F.col("e.day").alias("day"),
        F.col("e.yv").alias("y"),
        biased_round(F.col("e.lv")).alias("level"),
        biased_round(F.col("e.pv")).alias("variance"),
    ).orderBy("event_type", "day")
