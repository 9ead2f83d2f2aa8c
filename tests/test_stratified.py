"""Planted Neyman stratified-sampling test."""

from __future__ import annotations

import hashlib
import math

from economic_data_etl_spark.plans import REGISTRY


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, "
        "source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))


def test_neyman_favors_high_variance_stratum(spark, tmp_path):
    """Stratum 'flat' has zero variance -> its Neyman weight is zero,
    so (almost) the whole budget goes to 'vary'; Hamilton keeps the
    total exactly at the budget; id_sum matches the md5-rank prefix
    computed independently in python."""
    rows = []
    did = 0
    for i in range(200):
        rows.append((did, "x", "en", "flat", 100))
        did += 1
    vary_ids = []
    for i in range(200):
        rows.append((did, "x", "en", "vary", 10 + 990 * (i % 2)))
        vary_ids.append(did)
        did += 1
    _write_docs(spark, tmp_path, rows)
    out = {
        r["source"]: r
        for r in REGISTRY["curation_stratified_sample"]
        .spark(spark, str(tmp_path))
        .collect()
    }
    assert out["flat"]["sigma"] == 0.0
    assert out["flat"]["alloc"] + out["vary"]["alloc"] == 100
    assert out["vary"]["alloc"] >= 99  # zero-weight stratum starved
    assert out["vary"]["sampled"] == out["vary"]["alloc"]
    # independent python replay of the md5-ranked prefix
    k = out["vary"]["alloc"]
    ranked = sorted(
        vary_ids,
        key=lambda d: (
            hashlib.md5(f"strat-v1{d}".encode()).hexdigest(),
            d,
        ),
    )
    assert out["vary"]["id_sum"] == sum(ranked[:k])
    # sigma of the alternating 10/1000 stratum: half-spread 495
    assert math.isclose(out["vary"]["sigma"], 495.0, abs_tol=0.01)
