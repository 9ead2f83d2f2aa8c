"""Planted log-rank test vs a python reference on controlled gaps."""

from __future__ import annotations

import datetime as dt
import hashlib

import pytest

from economic_data_etl_spark.plans import REGISTRY


def _arm(uid):
    b = int(hashlib.md5(f"ab-v1{uid}".encode()).hexdigest()[:4], 16)
    return "A" if b < 32768 else "B"


def _logrank_ref(gaps):
    """gaps: list of (arm, t, cens). Returns (o_a, e_a, chi2)."""
    from collections import defaultdict

    hist = defaultdict(lambda: [0, 0, 0, 0])  # da, db, xa, xb
    for arm, t, cens in gaps:
        h = hist[t]
        if arm == "A":
            h[2] += 1
            if not cens:
                h[0] += 1
        else:
            h[3] += 1
            if not cens:
                h[1] += 1
    ta = sum(h[2] for h in hist.values())
    tb = sum(h[3] for h in hist.values())
    na, nb = ta, tb
    o_a = e_a = diff = var = 0.0
    for t in sorted(hist):
        da, db, xa, xb = hist[t]
        d, n = da + db, na + nb
        if d > 0:
            share = na * 1.0 / n
            ea = d * share
            o_a += da
            e_a += ea
            diff += da - ea
            if n > 1:
                var += d * share * (1 - share) * (n - d) * 1.0 / (n - 1)
        na -= xa
        nb -= xb
    return o_a, e_a, diff * diff / var


def test_logrank_planted_matches_reference(spark, tmp_path):
    """Arm A users return quickly (short gaps), arm B slowly — the
    statistic must match the reference and flag the separation."""
    base = dt.datetime(2024, 6, 1)
    rows, eid = [], 0
    users_a = [u for u in range(60) if _arm(u) == "A"][:12]
    users_b = [u for u in range(60) if _arm(u) == "B"][:12]
    for uid in users_a:  # 5 events, 1h apart -> four 1h gaps
        for i in range(5):
            rows.append((eid, base + dt.timedelta(hours=i), uid,
                         "view", 1.0, "{}"))
            eid += 1
    for uid in users_b:  # 5 events, 10h apart -> four 10h gaps
        for i in range(5):
            rows.append((eid, base + dt.timedelta(hours=10 * i), uid,
                         "view", 1.0, "{}"))
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = REGISTRY["ts_logrank_test"].spark(
        spark, str(tmp_path)
    ).collect()[0]
    # replay the exact gap set: censored final gap to global max
    gaps = []
    for uid in users_a:
        gaps += [("A", 1, 0)] * 4 + [("A", 40 - 4, 1)]
    for uid in users_b:
        gaps += [("B", 10, 0)] * 4 + [("B", 0, 1)]
    o_a, e_a, chi2 = _logrank_ref(gaps)
    assert out["o_a"] == o_a
    assert out["e_a"] == pytest.approx(e_a, abs=1e-3)
    assert out["chi2"] == pytest.approx(chi2, abs=1e-3)
    assert out["significant"]  # strong separation must be flagged
