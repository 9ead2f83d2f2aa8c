"""Unit tests for operators/training.py:chunk_documents."""

from __future__ import annotations

import pytest

from economic_data_etl_spark.operators.training import chunk_documents


def _chunks(spark, text, chunk_tokens=6, overlap=2):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return sorted(
        (
            (r.chunk_id, r.chunk_start, r.n_chunk_tokens, r.chunk_text)
            for r in chunk_documents(
                df, "doc_id", "text", chunk_tokens, overlap
            ).collect()
        )
    )


def test_coverage_and_overlap(spark):
    toks = [f"w{i}" for i in range(13)]
    got = _chunks(spark, " ".join(toks), chunk_tokens=6, overlap=2)
    # stride 4: starts 0, 4, 8 -> [0:6), [4:10), [8:13)
    assert got == [
        (0, 0, 6, " ".join(toks[0:6])),
        (1, 4, 6, " ".join(toks[4:10])),
        (2, 8, 5, " ".join(toks[8:13])),
    ]
    # consecutive chunks share exactly `overlap` tokens
    assert toks[4:6] == toks[4:10][:2]
    # every token covered
    covered = set()
    for _, start, n, _ in got:
        covered.update(range(start, start + n))
    assert covered == set(range(13))


def test_short_and_exact_docs(spark):
    assert _chunks(spark, "a b c", 6, 2) == [(0, 0, 3, "a b c")]
    toks = [f"t{i}" for i in range(6)]
    assert _chunks(spark, " ".join(toks), 6, 2) == [
        (0, 0, 6, " ".join(toks))
    ]
    # n = chunk + 1 -> second (mostly-overlap) chunk
    toks7 = [f"t{i}" for i in range(7)]
    assert _chunks(spark, " ".join(toks7), 6, 2) == [
        (0, 0, 6, " ".join(toks7[:6])),
        (1, 4, 3, " ".join(toks7[4:])),
    ]


def test_empty_doc_total(spark):
    assert _chunks(spark, "", 6, 2) == [(0, 0, 0, "")]


def test_validation(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", 4, 4)
    with pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", 4, -1)
