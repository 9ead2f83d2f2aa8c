"""PageRank operator invariants, checked against a driver-side numpy
power iteration on the same small graph (an independent implementation,
not an oracle replay)."""

from __future__ import annotations

import numpy as np
import pytest

from economic_data_etl_spark.operators.pagerank import pagerank


def _numpy_pagerank(edges, iterations=3, damping=0.85):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    deg = np.zeros(n)
    for u, _ in edges:
        deg[idx[u]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iterations):
        nxt = np.full(n, (1.0 - damping) / n)
        for u, v in edges:
            nxt[idx[v]] += damping * r[idx[u]] / deg[idx[u]]
        r = nxt
    return dict(zip(nodes, r))


@pytest.fixture()
def star_edges():
    # hub 0 connected to 1..5, undirected, plus a 6-7 pendant pair.
    pairs = [(0, i) for i in range(1, 6)] + [(6, 7)]
    return [(u, v) for u, v in pairs] + [(v, u) for u, v in pairs]


def test_matches_numpy_power_iteration(spark, star_edges):
    df = spark.createDataFrame(star_edges, ["src", "dst"])
    got = {r["node"]: r["rank"] for r in pagerank(df, iterations=3).collect()}
    want = _numpy_pagerank(star_edges)
    assert set(got) == set(want)
    for node, rank in want.items():
        assert got[node] == pytest.approx(rank, abs=1e-12)


def test_mass_conserved_on_undirected_graph(spark, star_edges):
    # No dangling nodes (symmetrized graph) -> total rank mass stays 1.
    df = spark.createDataFrame(star_edges, ["src", "dst"])
    total = sum(r["rank"] for r in pagerank(df, iterations=4).collect())
    assert total == pytest.approx(1.0, abs=1e-9)


def test_hub_outranks_leaves(spark, star_edges):
    df = spark.createDataFrame(star_edges, ["src", "dst"])
    got = {r["node"]: r["rank"] for r in pagerank(df, iterations=3).collect()}
    assert got[0] > max(got[i] for i in range(1, 6))
    # symmetric leaves tie exactly
    leaf_ranks = {round(got[i], 15) for i in range(1, 6)}
    assert len(leaf_ranks) == 1


def test_dangling_mass_leaks(spark):
    # Directed chain 1->2->3: node 3 has no out-edges, so mass leaks and
    # the total drops below 1 — the documented simplified formulation.
    df = spark.createDataFrame([(1, 2), (2, 3)], ["src", "dst"])
    ranks = {r["node"]: r["rank"] for r in pagerank(df, iterations=2).collect()}
    assert sum(ranks.values()) < 1.0
    assert ranks[3] > ranks[2] > 0
