"""Planted A/B readout test: hand-computed z and Wilson interval."""

from __future__ import annotations

import datetime as dt
import hashlib
import math

import pytest

from economic_data_etl_spark.plans import REGISTRY


def _arm(uid):
    b = int(
        hashlib.md5(f"ab-v1{uid}".encode()).hexdigest()[:4], 16
    )
    return "A" if b < 32768 else "B"


def test_ab_planted_counts_and_stats(spark, tmp_path):
    base = dt.datetime(2024, 5, 1)
    rows = []
    eid = 0
    # 40 users; users 0..9 convert (purchase value 200), rest don't
    for uid in range(40):
        val = 200.0 if uid < 10 else 50.0
        rows.append(
            (eid, base + dt.timedelta(hours=uid), uid, "purchase",
             val, "{}")
        )
        eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {
        r["arm"]: r
        for r in REGISTRY["events_ab_test"]
        .spark(spark, str(tmp_path))
        .collect()
    }
    # reference: reproduce the md5 arms and the closed forms
    arms = {"A": [0, 0], "B": [0, 0]}  # [n, conv]
    for uid in range(40):
        a = _arm(uid)
        arms[a][0] += 1
        arms[a][1] += 1 if uid < 10 else 0
    for a in ("A", "B"):
        n, c = arms[a]
        assert out[a]["n_users"] == n
        assert out[a]["conv"] == c
        p = c / n
        assert out[a]["rate"] == pytest.approx(p, abs=1e-4)
        z = 1.96
        center = p + z * z / (2 * n)
        half = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n))
        den = 1 + z * z / n
        assert out[a]["wilson_lo"] == pytest.approx(
            (center - half) / den, abs=1e-4
        )
        assert out[a]["wilson_hi"] == pytest.approx(
            (center + half) / den, abs=1e-4
        )
    (na, ca), (nb, cb) = arms["A"], arms["B"]
    pool = (ca + cb) / (na + nb)
    z_ref = (ca / na - cb / nb) / math.sqrt(
        pool * (1 - pool) * (1 / na + 1 / nb)
    )
    assert out["A"]["z_stat"] == pytest.approx(z_ref, abs=1e-4)
    assert out["A"]["significant"] == (abs(out["A"]["z_stat"]) > 1.96)
