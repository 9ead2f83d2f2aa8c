"""Granger-style lead testing over an aligned two-series daily table.

Restricted model y_t ~ y_{t-1} vs full model y_t ~ y_{t-1} + x_{t-1},
both solved in CLOSED FORM from sample moments: the 2x2 normal
equations invert symbolically, so the regression is one lag window plus
one moment reduce — it never sees a row twice and nothing iterative
runs. The F statistic tests whether the leading indicator adds
predictive power beyond the series' own history.

Consumes a (day, x, y) daily table (one row per day), NOT raw events:
like operators/cusum.py and operators/seasonal.py, the stream-scale
volume is collapsed by one pre-aggregation first.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def granger_lead_fit(
    daily: DataFrame,
    round_fn: Callable[[Column], Column] | None = None,
) -> DataFrame:
    """One row: n, b_ylag, b_xlag, r2_ar, r2_full, f_stat.

    Rows where y, lag(y), or lag(x) is NULL are dropped (a regression
    needs all three). Sample-vs-population moment variants cancel in
    every ratio, so the result is estimator-convention-free.

    Scale contract: the lag window below is ORDER BY day with no
    partitionBy — Spark executes it on a single task, which is the
    intended shape ONLY because the input is the days-sized
    pre-aggregated table this module documents (thousands of rows for
    years of data), never raw events. Callers must aggregate first;
    like the chained-index operator, the single-partition window is
    the deliberate, bounded exception, not an oversight."""
    rnd = round_fn if round_fn is not None else (lambda c: c)
    w = Window.orderBy("day")
    lagged = daily.select(
        "y",
        F.lag("y").over(w).alias("ylag"),
        F.lag("x").over(w).alias("xlag"),
    )
    kept = lagged.filter(
        F.col("y").isNotNull()
        & F.col("ylag").isNotNull()
        & F.col("xlag").isNotNull()
    )
    mo = kept.agg(
        F.count(F.lit(1)).alias("n"),
        F.var_samp("y").alias("syy"),
        F.var_samp("ylag").alias("s11"),
        F.var_samp("xlag").alias("s22"),
        F.covar_samp("ylag", "xlag").alias("s12"),
        F.covar_samp("ylag", "y").alias("s1y"),
        F.covar_samp("xlag", "y").alias("s2y"),
    )
    det = F.col("s11") * F.col("s22") - F.col("s12") * F.col("s12")
    b1 = (F.col("s22") * F.col("s1y") - F.col("s12") * F.col("s2y")) / det
    b2 = (F.col("s11") * F.col("s2y") - F.col("s12") * F.col("s1y")) / det
    r2_ar = (F.col("s1y") * F.col("s1y")) / (F.col("s11") * F.col("syy"))
    r2_full = (b1 * F.col("s1y") + b2 * F.col("s2y")) / F.col("syy")
    return mo.select(
        "n",
        rnd(b1).alias("b_ylag"),
        rnd(b2).alias("b_xlag"),
        rnd(r2_ar).alias("r2_ar"),
        rnd(r2_full).alias("r2_full"),
        rnd(
            (r2_full - r2_ar)
            / ((F.lit(1.0) - r2_full) / (F.col("n") - F.lit(3)))
        ).alias("f_stat"),
    )
