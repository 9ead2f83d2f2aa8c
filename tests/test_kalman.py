"""Planted Kalman local-level filter test vs a pure-python reference."""

from __future__ import annotations

import datetime as dt

import pytest

from economic_data_etl_spark.plans.arforecast import _KQ, _KR


def _ref(values, q=_KQ, r=_KR):
    l, p = values[0], r
    out = [(l, p)]
    for y in values[1:]:
        pp = p + q
        k = pp / (pp + r)
        l = l + k * (y - l)
        p = (1.0 - k) * pp
        out.append((l, p))
    return out


def test_kalman_matches_reference_and_converges(spark, tmp_path):
    from economic_data_etl_spark.plans import REGISTRY

    vals = [100.0, 140.0, 90.0, 130.0, 80.0, 120.0, 110.0, 95.0,
            105.0, 115.0]
    base = dt.datetime(2024, 3, 1)
    rows = [
        (i, base + dt.timedelta(days=i), 1, "k", float(v), "{}")
        for i, v in enumerate(vals)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = REGISTRY["ts_kalman_filter"].spark(
        spark, str(tmp_path)
    ).collect()
    ref = _ref(vals)
    assert len(out) == len(ref)
    for row, (l, p) in zip(out, ref):
        assert row["level"] == pytest.approx(l, abs=1e-3)
        assert row["variance"] == pytest.approx(p, abs=1e-3)
    # the filtered variance converges to the steady-state Riccati
    # fixed point p* solving p = (1-k)(p+q): monotone decreasing here
    vs = [r["variance"] for r in out]
    assert all(a >= b for a, b in zip(vs, vs[1:]))
    # gain falls below the first-step gain (adaptivity, unlike EWMA)
    k1 = (vs[0] + _KQ) / (vs[0] + _KQ + _KR)
    kend = (vs[-2] + _KQ) / (vs[-2] + _KQ + _KR)
    assert kend < k1
