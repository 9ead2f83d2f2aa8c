"""Planted Kaplan-Meier test: textbook example with censoring and an
extinction tail."""

from __future__ import annotations

import pytest

from economic_data_etl_spark.plans.survival import km_curve


def test_km_textbook_curve(spark):
    # (t, cens): deaths at 1, 3, 3, 5; censored at 2 and 4
    rows = [(1, 0), (2, 1), (3, 0), (3, 0), (4, 1), (5, 0)]
    df = spark.createDataFrame(rows, "t long, cens int")
    out = {r["t"]: r for r in km_curve(df).collect()}
    assert [out[t]["n_risk"] for t in (1, 2, 3, 4, 5)] == [6, 5, 4, 2, 1]
    assert out[1]["survival"] == pytest.approx(5 / 6, abs=1e-4)
    assert out[2]["survival"] == pytest.approx(5 / 6, abs=1e-4)
    # S(3) = 5/6 * 2/4
    assert out[3]["survival"] == pytest.approx(5 / 12, abs=1e-4)
    assert out[4]["survival"] == pytest.approx(5 / 12, abs=1e-4)
    # last remaining subject dies at 5 -> extinction, exact zero
    assert out[5]["survival"] == 0.0
    assert out[5]["d_events"] == 1


def test_km_all_censored_flat(spark):
    df = spark.createDataFrame([(3, 1), (7, 1)], "t long, cens int")
    out = km_curve(df).collect()
    assert all(r["survival"] == 1.0 for r in out)
