"""Planted tests: CUPED variance reduction and touch attribution."""

from __future__ import annotations

import datetime as dt
import hashlib

import pytest

from economic_data_etl_spark.plans import REGISTRY

_SCHEMA = (
    "event_id long, ts timestamp, user_id long, "
    "event_type string, value double, props string"
)


def _write_events(spark, tmp_path, rows):
    spark.createDataFrame(rows, _SCHEMA).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "events.parquet"))


def test_cuped_reduces_variance_on_predictive_covariate(
    spark, tmp_path
):
    """post = pre + small noise -> theta near 1 and a large variance
    reduction; the raw and adjusted diffs match a python replay."""
    pre_day = dt.datetime(2024, 1, 5)
    post_day = dt.datetime(2024, 1, 20)
    rows, eid = [], 0
    for uid in range(30):
        base = 100.0 + 10.0 * uid  # strong user-level heterogeneity
        rows.append((eid, pre_day, uid, "view", base, "{}"))
        eid += 1
        rows.append(
            (eid, post_day, uid, "view", base + (uid % 3), "{}")
        )
        eid += 1
    _write_events(spark, tmp_path, rows)
    out = REGISTRY["events_cuped_adjusted"].spark(
        spark, str(tmp_path)
    ).collect()[0]
    assert out["theta"] == pytest.approx(1.0, abs=0.01)
    assert out["var_reduction"] > 0.99
    # python replay of both diffs
    pre = {u: 100.0 + 10.0 * u for u in range(30)}
    post = {u: pre[u] + (u % 3) for u in range(30)}
    arm = {
        u: "A"
        if int(
            hashlib.md5(f"ab-v1{u}".encode()).hexdigest()[:4], 16
        )
        < 32768
        else "B"
        for u in range(30)
    }
    n = len(pre)
    mp = sum(pre.values()) / n
    sp, sq = sum(pre.values()), sum(post.values())
    spp = sum(v * v for v in pre.values())
    spq = sum(pre[u] * post[u] for u in pre)
    theta = (spq / n - (sp / n) * (sq / n)) / (
        spp / n - (sp / n) * (sp / n)
    )
    adj = {u: post[u] - theta * (pre[u] - mp) for u in pre}
    for col, d in (("diff_raw", post), ("diff_cuped", adj)):
        a = [d[u] for u in d if arm[u] == "A"]
        b = [d[u] for u in d if arm[u] == "B"]
        assert out[col] == pytest.approx(
            sum(a) / len(a) - sum(b) / len(b), abs=1e-3
        )


def test_attribution_first_and_last_touch(spark, tmp_path):
    """user 1: view -> click -> purchase  => first=view, last=click;
    user 2: purchase with no prior       => none;
    user 3: signup -> purchase -> error -> purchase
             => both purchases first=signup; last = signup then error."""
    t0 = dt.datetime(2024, 1, 10)

    def ts(m):
        return t0 + dt.timedelta(minutes=m)

    rows = [
        (1, ts(0), 1, "view", 1.0, "{}"),
        (2, ts(1), 1, "click", 1.0, "{}"),
        (3, ts(2), 1, "purchase", 10.0, "{}"),
        (4, ts(0), 2, "purchase", 20.0, "{}"),
        (5, ts(0), 3, "signup", 1.0, "{}"),
        (6, ts(1), 3, "purchase", 30.0, "{}"),
        (7, ts(2), 3, "error", 1.0, "{}"),
        (8, ts(3), 3, "purchase", 40.0, "{}"),
    ]
    _write_events(spark, tmp_path, rows)
    out = {
        (r["model"], r["channel"]): r
        for r in REGISTRY["events_attribution_touch"]
        .spark(spark, str(tmp_path))
        .collect()
    }
    assert out[("first_touch", "view")]["conversions"] == 1
    assert out[("first_touch", "signup")]["conversions"] == 2
    assert out[("first_touch", "none")]["conversions"] == 1
    assert out[("last_touch", "click")]["conversions"] == 1
    assert out[("last_touch", "signup")]["conversions"] == 1
    assert out[("last_touch", "error")]["conversions"] == 1
    assert out[("last_touch", "none")]["conversions"] == 1
    assert out[("last_touch", "error")]["revenue"] == 40.0
    # shares over 4 conversions
    assert out[("first_touch", "signup")]["share"] == 0.5
