"""Planted-ground-truth tests for the robust trend lane: Theil-Sen must
shrug off outliers that wreck OLS, and Mann-Kendall must call a planted
monotone trend while staying silent on noise — the semantic layer the
cross-engine oracle hash cannot express."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from economic_data_etl_spark.plans.robustts import mann_kendall, theil_sen


def _indexed(spark, series: dict[str, list[float]]):
    rows = [
        (k, float(v), float(i + 1))
        for k, vs in series.items()
        for i, v in enumerate(vs)
    ]
    return spark.createDataFrame(
        rows, "event_type string, v double, x double"
    )


def test_theil_sen_exact_on_clean_line(spark):
    vs = [3.0 + 0.5 * i for i in range(30)]
    (got,) = theil_sen(_indexed(spark, {"a": vs})).collect()
    assert got.n_pairs == 30 * 29 // 2
    assert abs(got.ts_slope - 0.5) < 1e-9
    assert abs(got.min_pair_slope - 0.5) < 1e-9
    assert abs(got.max_pair_slope - 0.5) < 1e-9


def test_theil_sen_ignores_outliers_that_wreck_ols(spark):
    """Slope-1 line with 3 of 40 points blasted to +1e6: the pairwise
    median must stay within 2% of 1.0 while the OLS slope on the same
    data is off by orders of magnitude."""
    vs = [float(i) for i in range(40)]
    for j in (7, 19, 31):
        vs[j] = 1e6
    df = _indexed(spark, {"a": vs})
    (ts,) = theil_sen(df).collect()
    assert abs(ts.ts_slope - 1.0) < 0.02
    (ols,) = (
        df.groupBy("event_type")
        .agg(F.regr_slope("v", "x").alias("b"))
        .collect()
    )
    assert abs(ols.b - 1.0) > 100.0  # OLS is destroyed by the outliers


def test_mann_kendall_calls_planted_monotone_trend(spark):
    """Strictly increasing series: S must equal the pair count exactly,
    z far above 1.96, and the verdict 'increasing'; the mirrored series
    must be exactly symmetric."""
    n = 25
    up = [float(i) + 0.1 * math.sin(i) for i in range(n)]  # monotone
    down = [-v for v in up]
    rows = mann_kendall(_indexed(spark, {"up": up, "down": down}))
    by = {r.event_type: r for r in rows.collect()}
    n_pairs = n * (n - 1) // 2
    assert by["up"].s_stat == n_pairs
    assert by["down"].s_stat == -n_pairs
    assert by["up"].z_stat > 1.96
    assert by["up"].trend == "increasing"
    assert by["down"].trend == "decreasing"
    assert abs(by["up"].z_stat + by["down"].z_stat) < 1e-9
    # textbook no-ties variance: n(n-1)(2n+5)/18 (output is 4dp-rounded)
    assert abs(by["up"].var_s - n * (n - 1) * (2 * n + 5) / 18.0) < 1e-4


def test_mann_kendall_no_trend_on_alternating_noise(spark):
    vs = [1.0 if i % 2 else -1.0 for i in range(30)]
    (got,) = mann_kendall(_indexed(spark, {"a": vs})).collect()
    assert got.trend == "no_trend"
    assert abs(got.z_stat) < 1.96


def test_mann_kendall_tie_correction_matches_closed_form(spark):
    """Series with a planted tie group (five equal values): the variance
    must be the tie-corrected closed form, strictly below the no-ties
    value."""
    vs = [float(i) for i in range(20)]
    for j in (3, 8, 12, 15, 18):
        vs[j] = 50.0  # one tie group of t=5
    (got,) = mann_kendall(_indexed(spark, {"a": vs})).collect()
    n, t = 20, 5
    expect = (n * (n - 1) * (2 * n + 5) - t * (t - 1) * (2 * t + 5)) / 18.0
    assert abs(got.var_s - expect) < 1e-4  # output is 4dp-rounded
    assert got.var_s < n * (n - 1) * (2 * n + 5) / 18.0
