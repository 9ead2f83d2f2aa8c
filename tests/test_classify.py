"""Planted-data tests for the NB classifier and the ROC-AUC operator."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from economic_data_etl_spark.plans.classify import (
    nb_score_predict,
    train_nb_model,
)


def _toks(spark, rows):
    """rows: (doc_id, lang, text) -> (doc_id, lang, w) with w split."""
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, text string"
    )
    return df.select(
        "doc_id",
        "lang",
        F.split(F.col("text"), " ").alias("w"),
    )


def test_nb_learns_separable_planted_corpus(spark):
    """Fully separable vocabulary -> every held-out doc classified
    correctly, regardless of the priors."""
    train = _toks(
        spark,
        [(i, "aa", "apple apple pie") for i in range(6)]
        + [(10 + i, "bb", "boat boat sail") for i in range(3)],
    )
    test = _toks(
        spark,
        [(100, "aa", "pie apple"), (101, "bb", "sail boat boat")],
    )
    langs, priors, floors, lp = train_nb_model(train)
    assert langs == ["aa", "bb"]
    # priors from doc counts: ln(6/9), ln(3/9)
    assert priors[0] == pytest.approx(math.log(6 / 9), abs=0)
    assert priors[1] == pytest.approx(math.log(3 / 9), abs=0)
    got = {
        r["true_lang"]: r["pred_lang"]
        for r in nb_score_predict(
            test, langs, priors, floors, lp
        ).collect()
    }
    assert got == {"aa": "aa", "bb": "bb"}


def test_nb_oov_floor_and_prune(spark):
    """With k_vocab=1 only the top word stays in vocab; every other
    token scores through the OOV bucket, which absorbs the pruned mass
    exactly (denominators use n_l + V + 1 with V=1)."""
    train = _toks(
        spark,
        [(1, "aa", "apple apple apple boat"), (2, "bb", "boat boat")],
    )
    langs, priors, floors, lp = train_nb_model(train, k_vocab=1)
    assert list(lp) == ["apple"]  # top word overall (3 > 0 tie rule)
    # class aa: n=4, V=1 -> lp(apple|aa)=ln(4/6); oov c=1 -> ln(2/6)
    assert lp["apple"][0] == math.log(4 / 6)
    assert floors[0] == math.log(2 / 6)
    # class bb: n=2, apple unseen -> ln(1/4); oov (boat) c=2 -> ln(3/4)
    assert lp["apple"][1] == math.log(1 / 4)
    assert floors[1] == math.log(3 / 4)


def test_nb_tie_breaks_to_first_lang(spark):
    """Symmetric corpus -> identical rounded scores; the argmax must
    break to the lexicographically first language on both engines."""
    train = _toks(
        spark,
        [(1, "aa", "x y"), (2, "bb", "x y")],
    )
    test = _toks(spark, [(3, "bb", "x y")])
    langs, priors, floors, lp = train_nb_model(train)
    pred = nb_score_predict(test, langs, priors, floors, lp).collect()
    assert pred[0]["pred_lang"] == "aa"


def test_auc_closed_form(spark):
    """AUC of a hand scoreable set incl. a tie group: scores/labels
    pos: .9 .7 .7; neg: .7 .1 -> U = 2 + 2*0.5 + ... check 0.75."""
    from economic_data_etl_spark.operators.rank import with_global_cumsum

    rows = [(0.9, 1), (0.7, 1), (0.7, 1), (0.7, 0), (0.1, 0)]
    df = spark.createDataFrame(rows, "s double, y int")
    grp = df.groupBy("s").agg(
        F.sum("y").cast("long").alias("pos"),
        (F.count(F.lit(1)) - F.sum("y")).cast("long").alias("neg"),
    )
    cum = with_global_cumsum(grp, ["s"], ["neg"])
    r = cum.agg(
        F.sum(
            F.col("pos")
            * (2 * (F.col("cum_neg") - F.col("neg")) + F.col("neg"))
        ).alias("twice_u")
    ).collect()[0]
    # pairs: pos .9 beats both negs (2), two pos .7 each beat .1 (2)
    # and tie with neg .7 (2 * 0.5) -> U = 5, AUC = 5 / (3*2)
    assert r["twice_u"] == 10
