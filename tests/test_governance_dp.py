"""Planted tests: CMS subtraction erasure, k-anonymity, DP noise."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from economic_data_etl_spark.operators.cms import (
    cms_build,
    cms_estimate,
    cms_subtract,
)


def _items(spark, words):
    return spark.createDataFrame([(w,) for w in words], "g string")


def test_cms_subtract_equals_rebuild(spark):
    """Linearity: full - revoked == from-scratch build on the
    survivors, cell for cell (incl. zero cells leaving)."""
    keep = ["a", "b", "a", "c", "b", "a"]
    gone = ["zz", "zz", "a", "yy"]
    full = cms_build(_items(spark, keep + gone), "g", 3, 16)
    rev = cms_build(_items(spark, gone), "g", 3, 16)
    erased = cms_subtract(full, rev)
    rebuilt = cms_build(_items(spark, keep), "g", 3, 16)
    a = {(r["row"], r["bucket"]): r["cnt"] for r in erased.collect()}
    b = {(r["row"], r["bucket"]): r["cnt"] for r in rebuilt.collect()}
    assert a == b


def test_cms_subtract_exclusive_item_vanishes(spark):
    """The sharp case: an item occurring ONLY in the revoked stream
    estimates 0 from the erased sketch (no lingering cells) unless a
    surviving item collides in every row."""
    keep = ["a"] * 5
    gone = ["solo"] * 7
    full = cms_build(_items(spark, keep + gone), "g", 3, 4096)
    rev = cms_build(_items(spark, gone), "g", 3, 4096)
    erased = cms_subtract(full, rev)
    est = cms_estimate(
        erased, _items(spark, ["solo"]), "g", 3, 4096
    ).collect()[0]["est"]
    assert est == 0


def test_k_anonymity_planted(spark, tmp_path):
    """Hand-counted ladder: 5 customers -> level-2 classes by segment."""
    from economic_data_etl_spark.plans import REGISTRY

    rows = [
        (1, "n1", 0, 500.0, "AUTO"),
        (2, "n2", 0, 700.0, "AUTO"),
        (3, "n3", 0, 1500.0, "AUTO"),
        (4, "n4", 1, 500.0, "AUTO"),
        (5, "n5", 1, 500.0, "BIKE"),
    ]
    df = spark.createDataFrame(
        rows,
        "c_custkey long, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    out = {
        r["level"]: r
        for r in REGISTRY["governance_k_anonymity"]
        .spark(spark, str(tmp_path))
        .collect()
    }
    # level 0 classes: (0,AUTO,0)x2 (0,AUTO,1)x1 (1,AUTO,0)x1 (1,BIKE,0)x1
    assert out[0]["n_classes"] == 4
    assert out[0]["rows_suppressed"] == 5  # all classes below k=4
    # level 2: AUTO x4 (meets k), BIKE x1 (suppressed)
    assert out[2]["n_classes"] == 2
    assert out[2]["n_below_k"] == 1
    assert out[2]["rows_suppressed"] == 1
    assert out[2]["suppression_rate"] == pytest.approx(0.2)


def test_dp_noise_inverse_cdf_formula():
    """The hash-seeded noise is the exact Laplace inverse CDF: for a
    known bucket, noise = -b * sign(v) * ln(1 - 2|v|)."""
    import hashlib

    salt, key, b = "dp-cnt-v1", "7", 2.0
    bkt = int(hashlib.md5((salt + key).encode()).hexdigest()[:4], 16)
    v = (bkt + 0.5) / 65536.0 - 0.5
    expected = -b * math.copysign(1.0, v) * math.log(1.0 - 2.0 * abs(v))
    # the magnitude grows without bound as |v| -> 0.5 and is 0 at v=0
    assert math.isfinite(expected)
    # median |noise| of Laplace(b) is b*ln(2); check the formula at the
    # exact median quantile u = 0.75 -> v = 0.25
    assert -b * 1.0 * math.log(1.0 - 0.5) == pytest.approx(
        b * math.log(2)
    )
