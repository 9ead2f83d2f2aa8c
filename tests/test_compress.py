"""Unit tests for operators/compress.py (deflate quality signals)."""

from __future__ import annotations

import zlib

from economic_data_etl_spark.operators import compress


def test_stats_values_match_local_zlib(spark):
    rows = [
        (1, "hello world " * 40),
        (2, "abc"),
        (3, ""),
        (4, None),
        (5, "ünïcode — ” 你好 " * 10),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r
        for r in compress.compression_stats(df, "doc_id", "text").collect()
    }
    for did, t in rows:
        raw = (t or "").encode("utf-8")
        assert got[did].raw_len == len(raw)
        assert got[did].comp_len == len(zlib.compress(raw, 6))
        if raw:
            assert abs(got[did].ratio - len(zlib.compress(raw, 6)) / len(raw)) < 1e-12
        else:
            assert got[did].ratio is None


def test_ratio_ordering_repetitive_prose_noise(spark):
    import hashlib

    rep = "spam " * 400
    prose = " ".join(f"w{i * 37 % 101}x{i}" for i in range(300))
    noise = b"".join(
        hashlib.md5(f"n:{i}".encode()).digest() for i in range(125)
    ).hex()  # hex of md5 chain: still high-entropy for zlib
    df = spark.createDataFrame(
        [(1, rep), (2, prose), (3, noise)], "doc_id long, text string"
    )
    r = {
        row.doc_id: row.ratio
        for row in compress.compression_stats(df, "doc_id", "text").collect()
    }
    assert r[1] < r[2] < r[3]


def test_certificate_all_true_and_empty_doc(spark):
    df = spark.createDataFrame(
        [(1, "some words repeated a bit some words"), (2, "")],
        "doc_id long, text string",
    )
    rows = {
        r.doc_id: r
        for r in compress.compression_certificate(
            df, "doc_id", "text"
        ).collect()
    }
    r1 = rows[1]
    assert r1.rep_compresses and r1.noise_incompressible
    assert r1.rep_beats_noise and r1.roundtrip_ok
    assert r1.raw_len_rep == 16 * len("some words repeated a bit some words")
    # empty doc: rep is empty; the degenerate-doc guard forces the
    # ratio verdicts TRUE (zlib's fixed header would otherwise make
    # them data-dependent), matching the oracle's constant-TRUE
    # contract, while roundtrip stays genuinely checked.
    assert rows[2].raw_len_rep == 0 and rows[2].roundtrip_ok
    assert rows[2].rep_compresses and rows[2].rep_beats_noise


def test_certificate_tiny_docs_forced_true(spark):
    # 1–3 byte docs: 16x rep is 16–48 bytes, below the 64-byte floor
    # where 0.35 * len could beat zlib's ~11-byte constant overhead.
    # Every verdict must be TRUE so the constant-TRUE oracle contract
    # holds on ANY sample, not just prose-sized docs.
    df = spark.createDataFrame(
        [(1, "a"), (2, "xy"), (3, ".?!")], "doc_id long, text string"
    )
    for r in compress.compression_certificate(df, "doc_id", "text").collect():
        assert r.rep_compresses and r.noise_incompressible
        assert r.rep_beats_noise and r.roundtrip_ok
