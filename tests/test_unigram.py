"""Planted tests for the unigram-LM tokenizer: Viterbi optimality,
the longest-piece tie-break, coverage, and the hard-EM monotonicity
guarantee — the semantics the cross-engine hash cannot express."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from economic_data_etl_spark.operators.unigram import (
    candidate_pieces,
    hard_em,
    select_vocab,
    viterbi_pieces_expr,
    viterbi_segment,
    vocab_logprobs,
    word_frequencies,
)


def _words(spark, rows):
    return spark.createDataFrame(rows, "word string, wc long")


def _segs(spark, rows, lp):
    df = _words(spark, rows)
    fin = viterbi_pieces_expr(F.col("word"), lp)
    return {
        r.word: (r.seg, r.dp)
        for r in df.select(
            "word", fin["seg"].alias("seg"), fin["dp"].alias("dp")
        ).collect()
    }


def test_viterbi_picks_max_likelihood_path(spark):
    lp = {
        "a": math.log(0.2),
        "b": math.log(0.2),
        "c": math.log(0.1),
        "ab": math.log(0.4),
        "abc": math.log(0.1),
    }
    got = _segs(spark, [("abcab", 1), ("ccc", 1)], lp)
    # abc+ab = ln.1+ln.4 = -3.22 beats ab+c+ab = -4.14 and singles
    assert got["abcab"][0] == ["abc", "ab"]
    assert abs(got["abcab"][1] - (math.log(0.1) + math.log(0.4))) < 1e-12
    assert got["ccc"][0] == ["c", "c", "c"]


def test_exact_tie_breaks_to_longest_piece(spark):
    """Engineered EXACT tie: lp(a) = lp(b) = -1.0, lp(ab) = -2.0 —
    both segmentations of 'ab' score exactly -2.0; the longest-first
    rule must pick the single piece."""
    lp = {"a": -1.0, "b": -1.0, "ab": -2.0}
    got = _segs(spark, [("ab", 1)], lp)
    assert got["ab"][0] == ["ab"]
    assert got["ab"][1] == -2.0
    # counts lane agrees with the pieces lane
    (row,) = viterbi_segment(_words(spark, [("ab", 1)]), lp).collect()
    assert row.n_pieces == 1


def test_single_char_coverage_floor(spark):
    """A word of model-rare chars segments into singles, never fails."""
    lp = {"x": math.log(0.01), "y": math.log(0.01)}
    got = _segs(spark, [("xyxyx", 1)], lp)
    assert got["xyxyx"][0] == ["x", "y", "x", "y", "x"]
    assert got["xyxyx"][1] > -1e17  # no sentinel leak


def test_hard_em_is_monotone_and_learns_whole_words(spark):
    """Corpus of two repeated words: EM must be monotone and converge
    to whole-word pieces (fertility 1) once 'the'/'cat' enter the
    vocabulary."""
    docs = spark.createDataFrame(
        [(1, "the cat the cat the cat sat")], "doc_id long, text string"
    )
    wf = word_frequencies(docs)
    lp0 = vocab_logprobs(select_vocab(candidate_pieces(wf), k=10))
    model, hist = hard_em(wf, lp0, iterations=3)
    assert all(
        hist[i + 1] >= hist[i] - abs(hist[i]) * 1e-9
        for i in range(len(hist) - 1)
    )
    assert hist[-1] > hist[0]  # strictly improved on this corpus
    seg = viterbi_segment(wf, model)
    fert = {r.word: r.n_pieces for r in seg.collect()}
    assert fert["the"] == 1
    assert fert["cat"] == 1


def test_word_frequencies_filters_and_lowercases(spark):
    docs = spark.createDataFrame(
        [(1, "The THE the " + "x" * 25)], "doc_id long, text string"
    )
    rows = {r.word: r.wc for r in word_frequencies(docs).collect()}
    assert rows == {"the": 3}  # 25-char token excluded, case folded
