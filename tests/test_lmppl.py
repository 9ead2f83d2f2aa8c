"""Planted-ground-truth tests for the Stupid Backoff LM: hit counters
and log-scores computed by hand on a controlled corpus must match the
distributed pipeline exactly — the semantic layer the cross-engine
oracle hash cannot express."""

from __future__ import annotations

import math

from economic_data_etl_spark.plans.lmppl import _BACKOFF2, backoff_score


def _toks(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, source string, w array<string>"
    )


def test_backoff_chain_on_hand_corpus(spark):
    """Corpus = one doc 'a b c a b c a b d'. Every gram is in the
    (unpruned at this size) model, so the orders served are fully
    determined by the i>=3 / i>=2 position boundary:
    position 1 -> unigram, position 2 -> bigram, the rest trigram."""
    w = ["a", "b", "c", "a", "b", "c", "a", "b", "d"]
    (got,) = backoff_score(_toks(spark, [(1, "s", w)])).collect()
    assert got.n_docs == 1
    assert got.n_positions == 9
    assert got.tri_hits == 7
    assert got.big_hits == 1
    assert got.uni_hits == 1
    assert got.oov_hits == 0

    # hand-computed Stupid Backoff log-score, mirroring the plan's
    # exact double expressions (0.4 * c / cctx forms)
    n = 9.0
    c1 = {"a": 3, "b": 3, "c": 2, "d": 1}
    c2 = {"a b": 3, "b c": 2, "c a": 2, "b d": 1}
    c3 = {"a b c": 2, "b c a": 2, "c a b": 2, "a b d": 1}
    lps = [
        math.log(_BACKOFF2 * c1["a"] / n),          # i=1: unigram
        math.log(0.4 * c2["a b"] / c1["a"]),        # i=2: bigram
        math.log(c3["a b c"] / c2["a b"]),          # i=3..9: trigrams
        math.log(c3["b c a"] / c2["b c"]),
        math.log(c3["c a b"] / c2["c a"]),
        math.log(c3["a b c"] / c2["a b"]),
        math.log(c3["b c a"] / c2["b c"]),
        math.log(c3["c a b"] / c2["c a"]),
        math.log(c3["a b d"] / c2["a b"]),
    ]
    assert abs(got.avg_doc_lp - sum(lps) / 9.0) < 1e-4


def test_oov_floor_and_cross_doc_model(spark):
    """The model trains on the WHOLE corpus: doc 2's token 'x' appears
    nowhere else and scores as a unigram hit (it IS in the model);
    truly-unseen tokens cannot exist at train==score time, so the OOV
    path is pinned via the pruning cut in the test below instead. Here:
    doc 2 = 'a x' -> position 1 unigram('a'), position 2 bigram('a x')
    (count 1, in model)."""
    rows = [
        (1, "s", ["a", "b", "a", "b"]),
        (2, "s", ["a", "x"]),
    ]
    (got,) = backoff_score(_toks(spark, rows)).collect()
    assert got.n_docs == 2
    assert got.n_positions == 6
    assert got.oov_hits == 0
    # doc1: uni, big, tri, tri; doc2: uni, big
    assert got.uni_hits == 2
    assert got.big_hits == 2
    assert got.tri_hits == 2


def test_per_source_split_is_exact(spark):
    rows = [
        (1, "alpha", ["a", "b", "c"]),
        (2, "alpha", ["a", "b"]),
        (3, "beta", ["c"]),
    ]
    by = {
        r.source: r
        for r in backoff_score(_toks(spark, rows)).collect()
    }
    assert by["alpha"].n_docs == 2
    assert by["alpha"].n_positions == 5
    assert by["beta"].n_docs == 1
    assert by["beta"].n_positions == 1
    assert by["beta"].uni_hits == 1
