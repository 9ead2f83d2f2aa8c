"""Planted tests for the Yule-Walker AR(2) lane."""

from __future__ import annotations

import datetime as dt

import pytest

from economic_data_etl_spark.plans.arforecast import (
    ar2_forecast,
    yule_walker_ar2,
)


def _daily(spark, values, key="k"):
    base = dt.datetime(2024, 1, 1)
    rows = [
        (key, base + dt.timedelta(days=i), float(v))
        for i, v in enumerate(values)
    ]
    return spark.createDataFrame(
        rows, "event_type string, day timestamp, total double"
    )


def _yw_ref(values):
    """The same closed form in plain python (raw sums, division-free
    normalization)."""
    n = len(values)
    mean = sum(values) / n
    x = [v - mean for v in values]
    s0 = sum(xi * xi for xi in x)
    s1 = sum(x[i] * x[i - 1] for i in range(1, n))
    s2 = sum(x[i] * x[i - 2] for i in range(2, n))
    den = s0 * s0 - s1 * s1
    return (
        mean,
        s1 * (s0 - s2) / den,
        (s0 * s2 - s1 * s1) / den,
        x[-1],
        x[-2],
    )


def test_yw_matches_reference_arithmetic(spark):
    vals = [10, 12, 9, 14, 11, 13, 8, 15, 10, 12, 11, 14]
    mean, p1, p2, xl, xp = _yw_ref(vals)
    row = yule_walker_ar2(_daily(spark, vals)).collect()[0]
    assert row["mean"] == pytest.approx(mean, rel=1e-12)
    assert row["p1"] == pytest.approx(p1, rel=1e-12)
    assert row["p2"] == pytest.approx(p2, rel=1e-12)
    assert row["xl"] == pytest.approx(xl, rel=1e-12)
    assert row["xp"] == pytest.approx(xp, rel=1e-12)


def test_forecast_unrolls_recurrence(spark):
    vals = [10, 12, 9, 14, 11, 13, 8, 15, 10, 12, 11, 14]
    mean, p1, p2, xl, xp = _yw_ref(vals)
    fm2, fm1 = xp, xl
    expect = []
    for _ in range(7):
        fh = p1 * fm1 + p2 * fm2
        expect.append(round(mean + fh + 5e-10, 4))
        fm2, fm1 = fm1, fh
    got = [
        r["yhat"]
        for r in ar2_forecast(
            yule_walker_ar2(_daily(spark, vals))
        ).collect()
    ]
    assert got == pytest.approx(expect, abs=1e-9)


def test_recovers_strong_ar_signal(spark):
    """A near-deterministic AR(1)-ish alternating series: phi1 should
    come out strongly negative."""
    vals = [100 + (20 if i % 2 == 0 else -20) for i in range(30)]
    row = yule_walker_ar2(_daily(spark, vals)).collect()[0]
    assert row["p1"] < -0.9


def test_short_series_gated(spark):
    assert yule_walker_ar2(_daily(spark, [1, 2, 3, 4, 5])).count() == 0
