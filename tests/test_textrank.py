"""Planted tests for TextRank keyword extraction."""

from __future__ import annotations

from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from economic_data_etl_spark.plans.textrank import (
    cooccurrence_edges,
    textrank_scores,
)


def _docs(spark, texts):
    return spark.createDataFrame([(t,) for t in texts], "text string")


def _ref_edges(texts):
    und = defaultdict(int)
    for t in texts:
        w = t.lower().split()
        for i in range(len(w)):
            for j in (i + 1, i + 2):
                if j < len(w) and w[i] != w[j]:
                    a, b = sorted((w[i], w[j]))
                    und[(a, b)] += 1
    return dict(und)


def _ref_scores(und, iters=4, d=0.85):
    adj = defaultdict(list)
    for (a, b), wt in und.items():
        adj[a].append((b, wt))
        adj[b].append((a, wt))
    strength = {n: sum(wt for _, wt in nbrs) for n, nbrs in adj.items()}
    sc = {n: 1.0 for n in adj}
    for _ in range(iters):
        nxt = {}
        for n in adj:
            s = sum((wt / strength[j]) * sc[j] for j, wt in adj[n])
            nxt[n] = (1 - d) + d * s
        sc = nxt
    return sc


def test_edges_window2_canonical(spark):
    texts = ["a b a c"]
    got = {
        (r["a"], r["b"]): r["wt"]
        for r in cooccurrence_edges(_docs(spark, texts)).collect()
    }
    # pairs: (a,b),(a,a excluded),(b,a)->(a,b),(b,c),(a,c)
    assert got == {("a", "b"): 2, ("b", "c"): 1, ("a", "c"): 1}


def test_scores_match_reference(spark):
    texts = [
        "spark shuffles data fast",
        "data moves when spark shuffles",
        "the hub word appears with hub everywhere hub again",
    ]
    ref = _ref_scores(_ref_edges(texts))
    got = {
        r["node"]: r["sc"]
        for r in textrank_scores(
            cooccurrence_edges(_docs(spark, texts))
        ).collect()
    }
    assert set(got) == set(ref)
    for n in ref:
        assert got[n] == pytest.approx(ref[n], rel=1e-12), n


def test_hub_word_ranks_first(spark):
    texts = ["hub alpha", "hub beta", "hub gamma", "hub delta",
             "hub epsilon", "alpha beta"]
    got = textrank_scores(cooccurrence_edges(_docs(spark, texts)))
    top = got.orderBy(F.desc("sc")).first()["node"]
    assert top == "hub"
