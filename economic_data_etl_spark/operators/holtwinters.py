"""Additive Holt-Winters (triple exponential smoothing) forecasting.

The engine's first true forecaster (next to the descriptive
seasonal/CUSUM/trend lanes): level + trend + weekly additive
seasonality over the per-key daily series, with an h-step-ahead
forecast. Textbook form (Holt 1957 / Winters 1960), fixed smoothing
constants so the whole computation is deterministic:

    l_t = a*(y_t - s_{t-m}) + (1-a)*(l_{t-1} + b_{t-1})
    b_t = B*(l_t - l_{t-1}) + (1-B)*b_{t-1}
    s_t = g*(y_t - l_t)     + (1-g)*s_{t-m}
    yhat_{n+h} = l_n + h*b_n + s_{n+h-m*ceil(h/m)}

Initialization (classical): l_0 = mean of week 1, b_0 = (mean of
week 2 - mean of week 1)/m, s_j = y_j - l_0 over week 1 — all written
as EXPLICIT left-associated sums so the DuckDB oracle can reproduce
every IEEE double bit-for-bit.

Execution shape: ONE groupBy collapses the daily table to a per-key
ordered array (days-sized — years of data is thousands of elements),
then the entire recurrence runs as a Catalyst `aggregate` (fold)
expression over that array: state = (level, trend, 7 seasonals, t),
zero Python, zero extra shuffles, embarrassingly parallel across keys.
The oracle replays the same recurrence as a recursive CTE. The 1-x
complements are passed as separate literals so both engines compute
e.g. 0.7, never 1 - 0.3.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

M = 7  # weekly seasonality

ALPHA, BETA, GAMMA = 0.3, 0.1, 0.2
ONE_M_ALPHA, ONE_M_BETA, ONE_M_GAMMA = 0.7, 0.9, 0.8


def _seq_sum(arr: Column, start: int, n: int) -> Column:
    """Explicit left-associated sum of arr[start .. start+n-1]
    (1-based): ((a+b)+c)+... — the association the oracle mirrors."""
    out = F.element_at(arr, start)
    for i in range(1, n):
        out = out + F.element_at(arr, start + i)
    return out


def holt_winters_state(
    daily: DataFrame,
    key_col: str = "event_type",
    day_col: str = "day",
    value_col: str = "total",
) -> DataFrame:
    """Per key: the fitted end state (n, last_day, level, trend,
    s array of M seasonals indexed by (position-1) mod M). Keys with
    fewer than 2*M days are dropped (not enough for the classical
    init)."""
    arr = (
        daily.groupBy(key_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(day_col, value_col))
            ).alias("pts")
        )
        .select(
            key_col,
            F.transform(
                F.col("pts"), lambda p: p[value_col].cast("double")
            ).alias("y"),
            F.element_at(F.col("pts"), -1)[day_col].alias("last_day"),
            F.size("pts").alias("n"),
        )
        .filter(F.col("n") >= 2 * M)
    )
    y = F.col("y")
    l0 = _seq_sum(y, 1, M) / F.lit(float(M))
    b0 = (_seq_sum(y, M + 1, M) / F.lit(float(M)) - l0) / F.lit(
        float(M)
    )
    s0 = F.transform(
        F.sequence(F.lit(1), F.lit(M)),
        lambda j: F.element_at(y, j) - l0,
    )
    init = F.struct(
        l0.alias("l"),
        b0.alias("b"),
        s0.alias("s"),
        F.lit(M).alias("t"),
    )

    def step(acc: Column, yv: Column) -> Column:
        j = acc["t"] % M  # 0-based seasonal slot of this position
        s_j = F.element_at(acc["s"], j + 1)
        l_new = F.lit(ALPHA) * (yv - s_j) + F.lit(ONE_M_ALPHA) * (
            acc["l"] + acc["b"]
        )
        b_new = F.lit(BETA) * (l_new - acc["l"]) + F.lit(
            ONE_M_BETA
        ) * acc["b"]
        s_new_j = F.lit(GAMMA) * (yv - l_new) + F.lit(
            ONE_M_GAMMA
        ) * s_j
        s_new = F.transform(
            F.sequence(F.lit(0), F.lit(M - 1)),
            lambda i: F.when(i == j, s_new_j).otherwise(
                F.element_at(acc["s"], i + 1)
            ),
        )
        return F.struct(
            l_new.alias("l"),
            b_new.alias("b"),
            s_new.alias("s"),
            (acc["t"] + 1).alias("t"),
        )

    state = F.aggregate(
        F.slice(y, M + 1, F.size(y) - M), init, step
    )
    return arr.select(
        key_col,
        "n",
        "last_day",
        state["l"].alias("level"),
        state["b"].alias("trend"),
        state["s"].alias("s"),
    )


def holt_winters_forecast(
    daily: DataFrame,
    horizon: int = M,
    key_col: str = "event_type",
    day_col: str = "day",
    value_col: str = "total",
) -> DataFrame:
    """Per key and step h in 1..horizon: (key, h, forecast_day, yhat)
    — yhat = level + h*trend + seasonal[(n + h - 1) mod M]."""
    st = holt_winters_state(daily, key_col, day_col, value_col)
    hs = F.explode(F.sequence(F.lit(1), F.lit(horizon))).alias("h")
    ex = st.select(key_col, "n", "last_day", "level", "trend", "s", hs)
    yhat = (
        F.col("level")
        + F.col("h") * F.col("trend")
        + F.element_at(
            F.col("s"), ((F.col("n") + F.col("h") - 1) % M) + 1
        )
    )
    return ex.select(
        key_col,
        F.col("h").cast("int"),
        F.date_add(F.col("last_day").cast("date"), F.col("h")).alias(
            "forecast_day"
        ),
        yhat.alias("yhat"),
    )
