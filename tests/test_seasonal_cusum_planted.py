"""Planted-ground-truth tests for the daily-index analyses: a CUSUM
scan must locate a KNOWN level shift, and the seasonal decomposition
must recover KNOWN day-of-week effects exactly — semantic checks the
SQL-oracle hash can't express (the oracle proves cross-engine equality,
not that the statistic finds what it claims to find)."""

from __future__ import annotations

import datetime

from economic_data_etl_spark.operators.cusum import cusum_from_daily
from economic_data_etl_spark.operators.seasonal import (
    seasonal_from_daily,
)

_EPOCH = datetime.datetime(2024, 3, 4)  # a Monday


def _daily(spark, rows):
    return spark.createDataFrame(
        [
            (et, _EPOCH + datetime.timedelta(days=d), float(v))
            for et, d, v in rows
        ],
        "event_type string, day timestamp, total double",
    )


def _noise(d: int) -> float:
    # deterministic, zero-mean-ish, bounded +-0.1
    return 0.1 if d % 2 == 0 else -0.1


def test_cusum_locates_a_planted_level_shift(spark):
    """Level 10 for days 0..39, level 15 from day 40: |S_t| peaks at
    the last pre-shift day, and the normalized statistic is far above
    any plausible threshold."""
    shift_at = 40
    rows = [
        ("a", d, 10.0 + (5.0 if d >= shift_at else 0.0) + _noise(d))
        for d in range(60)
    ]
    (got,) = cusum_from_daily(_daily(spark, rows)).collect()
    assert got.cp_day == _EPOCH + datetime.timedelta(days=shift_at - 1)
    assert got.n_days == 60
    assert got.cusum_stat > 3.0


def test_cusum_stat_small_without_a_shift(spark):
    """Negative control: a flat series with bounded alternating noise
    must score far below the planted-shift statistic."""
    rows = [("a", d, 10.0 + _noise(d)) for d in range(60)]
    (got,) = cusum_from_daily(_daily(spark, rows)).collect()
    assert got.cusum_stat < 1.0


def test_seasonal_recovers_planted_dow_effects(spark):
    """Constant level 100 plus zero-sum day-of-week effects over four
    full weeks: the centered 7-day MA sees each dow exactly once, so
    the trend is exactly 100, the seasonal indices are exactly the
    planted effects, and interior residuals are exactly zero."""
    effects = [6.0, -2.0, 4.0, 0.0, -8.0, 3.0, -3.0]  # sums to 0
    epoch_day = (_EPOCH - datetime.datetime(1970, 1, 1)).days

    def effect(d: int) -> float:
        return effects[(epoch_day + d) % 7]

    rows = [("a", d, 100.0 + effect(d)) for d in range(28)]
    out = seasonal_from_daily(_daily(spark, rows)).collect()
    assert len(out) == 28
    for r in out:
        d = (r.day - _EPOCH).days
        if r.trend is not None:  # interior days (full MA window)
            assert abs(r.trend - 100.0) < 1e-9, r
            assert abs(r.residual) < 1e-9, r
        assert abs(r.seasonal - effect(d)) < 1e-9, r
        assert r.dow == (epoch_day + d) % 7


def test_seasonal_cold_start_keeps_rows(spark):
    """A series younger than one full MA window has no seasonal index
    yet: its days must still appear (NULL trend/seasonal/residual),
    not vanish — the streaming seasonal_now cold-start contract."""
    rows = [("a", d, 100.0 + d) for d in range(4)]  # < 7 days
    out = seasonal_from_daily(_daily(spark, rows)).collect()
    assert len(out) == 4
    for r in out:
        assert r.trend is None and r.seasonal is None
        assert r.residual is None and r.total is not None


def test_seasonal_rejects_even_periods(spark):
    """An even centered MA needs the classical 2x-MA; the naive
    half-window would silently gate the trend to two edge days."""
    import pytest

    with pytest.raises(ValueError, match="odd"):
        seasonal_from_daily(
            _daily(spark, [("a", 0, 1.0)]), period=12
        ).collect()
