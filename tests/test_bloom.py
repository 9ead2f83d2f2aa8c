"""Bloom filter build/test + decontamination (operators/bloom.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from economic_data_etl_spark.operators import bloom


def _keys(spark, lo, hi, prefix="k"):
    return spark.range(lo, hi).select(
        F.concat(F.lit(prefix), F.col("id").cast("string")).alias("key")
    )


def test_no_false_negatives(spark):
    """Structural guarantee: every inserted key tests positive."""
    keys = _keys(spark, 0, 300)
    bitmap = bloom.bloom_build(keys, "key", m_bits=1024, k_hashes=4)
    missed = keys.filter(
        ~bloom.bloom_might_contain(F.col("key"), bitmap, 4)
    ).count()
    assert missed == 0


def test_fpr_within_sized_bound(spark):
    """Measured FPR over disjoint non-members stays near theory, and the
    filter actually prunes (the test is not vacuously TRUE-for-all)."""
    m, k = 2048, 3
    members = _keys(spark, 0, 200)
    non_members = _keys(spark, 0, 2000, prefix="x")
    bitmap = bloom.bloom_build(members, "key", m_bits=m, k_hashes=k)
    fp = non_members.filter(
        bloom.bloom_might_contain(F.col("key"), bitmap, k)
    ).count()
    fpr = fp / 2000
    theory = bloom.theoretical_fpr(m, 200, k)
    assert fpr <= 3 * theory + 0.02
    # prunes nearly everything: non-members overwhelmingly rejected
    assert fpr < 0.1


def test_decontaminate_is_exact_semi_join(spark, sf_dir):
    """Bloom prefilter + verify == plain semi-join, column for column."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id",
        F.substring("text", 1, 20).alias("key"),
    )
    bench = docs.filter(F.col("doc_id") < 100).select("key")
    corpus = docs.filter(F.col("doc_id") >= 100)
    got = sorted(
        r["doc_id"]
        for r in bloom.bloom_decontaminate(
            corpus, bench, "key", m_bits=256, k_hashes=2
        ).collect()
    )
    want = sorted(
        r["doc_id"]
        for r in corpus.join(
            bench.distinct(), "key", "left_semi"
        ).collect()
    )
    assert got == want and len(want) > 0


def test_null_keys_excluded(spark):
    """NULL is not a key: excluded from build and never a member."""
    keys = _keys(spark, 0, 10).union(
        spark.range(1).select(F.lit(None).cast("string").alias("key"))
    )
    bitmap = bloom.bloom_build(keys, "key", m_bits=256, k_hashes=2)
    probe = spark.range(1).select(F.lit(None).cast("string").alias("key"))
    hit = probe.filter(
        bloom.bloom_might_contain(F.col("key"), bitmap, 2)
    ).count()
    assert hit == 0  # NULL hash -> NULL test -> filtered


def test_bitmap_is_signed_long_safe(spark):
    """Keys landing on bit 63 must round-trip through the array<long>
    literal (negative Java longs)."""
    # enough keys that some word has bit 63 set w.h.p. in 128 bits
    keys = _keys(spark, 0, 500)
    bitmap = bloom.bloom_build(keys, "key", m_bits=128, k_hashes=2)
    assert any(w < 0 for w in bitmap)  # bit 63 set somewhere
    missed = keys.filter(
        ~bloom.bloom_might_contain(F.col("key"), bitmap, 2)
    ).count()
    assert missed == 0


def test_m_bits_validated():
    with pytest.raises(ValueError, match="multiple of 64"):
        bloom.bloom_build(None, "key", m_bits=100, k_hashes=2)


def test_optimal_k_and_theory():
    assert bloom.optimal_k(9600, 1000) == 7  # (m/n) ln2 ~= 6.65
    assert 0.0 < bloom.theoretical_fpr(1024, 100, 3) < 1.0
    assert bloom.optimal_k(64, 0) == 1
