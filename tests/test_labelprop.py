"""Planted-graph tests for label propagation + modularity: the detector
must FIND planted communities and the modularity arithmetic must match
the closed form — the semantic layer the oracle hash cannot express."""

from __future__ import annotations

from economic_data_etl_spark.operators.labelprop import (
    community_summary,
    label_propagation,
    symmetrize,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def _clique(names):
    return [
        (a, b) for i, a in enumerate(names) for b in names[i + 1 :]
    ]


def test_two_cliques_with_bridge_are_separated(spark):
    """Two 4-cliques joined by one bridge edge: LPA must assign each
    clique one label and keep them distinct; min-label dynamics make
    the winning label each clique's lexicographic minimum."""
    left = ["a1", "a2", "a3", "a4"]
    right = ["b1", "b2", "b3", "b4"]
    edges = _edges(
        spark, _clique(left) + _clique(right) + [("a1", "b1")]
    )
    labels = {
        r.node: r.lab
        for r in label_propagation(edges, iterations=4).collect()
    }
    assert len({labels[n] for n in left}) == 1
    assert len({labels[n] for n in right}) == 1
    assert labels["a2"] != labels["b2"]


def test_modularity_closed_form_on_two_cliques(spark):
    """4-clique + 4-clique + bridge: m = 13 edges; each community has
    L_c = 6 intra edges; degree sums are 13 (bridge side gains 1 each).
    Q_c = 6/13 - (13/26)^2 = 0.211538..."""
    left = ["a1", "a2", "a3", "a4"]
    right = ["b1", "b2", "b3", "b4"]
    edges = _edges(
        spark, _clique(left) + _clique(right) + [("a1", "b1")]
    )
    labels = label_propagation(edges, iterations=4)
    rows = community_summary(edges, labels).collect()
    assert len(rows) == 2
    for r in rows:
        assert r.n_nodes == 4
        assert r.intra_edges == 6
        assert r.degree_sum == 13
        assert abs(r.q_contrib - (6 / 13 - (13 / 26) ** 2)) < 1e-4
    # total modularity of the planted partition is strongly positive
    assert sum(r.q_contrib for r in rows) > 0.4


def test_symmetrize_drops_self_loops_and_dups(spark):
    edges = _edges(
        spark,
        [("x", "y"), ("y", "x"), ("x", "x"), ("x", "y")],
    )
    rows = {(r.src, r.dst) for r in symmetrize(edges).collect()}
    assert rows == {("x", "y"), ("y", "x")}


def test_singleton_pair_graph(spark):
    """A single edge: both nodes vote for each other's label; after one
    round both carry the other's name, after two both are back — the
    classic bipartite oscillation. The deterministic min-label
    tie-break cannot fire (each node has exactly one neighbor), so we
    only require a stable 2-node community summary."""
    edges = _edges(spark, [("p", "q")])
    labels = label_propagation(edges, iterations=4)
    got = {r.node: r.lab for r in labels.collect()}
    assert set(got) == {"p", "q"}
    rows = community_summary(edges, labels).collect()
    assert sum(r.n_nodes for r in rows) == 2
