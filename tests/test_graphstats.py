"""Known-graph checks for the adjacency-intersection triangle counter —
independent of the DuckDB oracle (which shares no code but does share
the input derivation; these pin the operator against graphs with
hand-countable answers)."""

from __future__ import annotations

import pytest

from economic_data_etl_spark.operators.graphstats import (
    degrees,
    triangle_census,
    triangle_count,
)


def _edges(spark, pairs):
    # orient a < b as the operator contract requires
    rows = [(min(a, b), max(a, b)) for a, b in pairs]
    assert len(set(rows)) == len(rows), "test graph has duplicate edges"
    return spark.createDataFrame(rows, "a long, b long")


def _census(spark, pairs):
    return triangle_census(_edges(spark, pairs)).collect()[0]


def test_k4_has_four_triangles(spark):
    k4 = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    row = _census(spark, k4)
    assert row.n_triangles == 4
    assert row.n_edges == 6
    assert row.n_nodes == 4
    # every vertex has degree 3 -> 4 * C(3,2) = 12 wedges; cc = 3*4/12
    assert row.n_wedges == 12
    assert row.clustering_coeff == pytest.approx(1.0)


def test_path_graph_has_none(spark):
    row = _census(spark, [(0, 1), (1, 2), (2, 3)])
    assert row.n_triangles == 0
    assert row.n_wedges == 2
    assert row.clustering_coeff == pytest.approx(0.0)


def test_triangle_with_pendant(spark):
    # one triangle {0,1,2} plus pendant edge 2-3
    row = _census(spark, [(0, 1), (0, 2), (1, 2), (2, 3)])
    assert row.n_triangles == 1
    assert row.n_edges == 4
    assert row.n_wedges == 1 + 1 + 3  # deg 2,2,3,1
    assert row.clustering_coeff == pytest.approx(3 * 1 / 5)


def test_two_disjoint_triangles(spark):
    row = _census(
        spark, [(0, 1), (0, 2), (1, 2), (10, 11), (10, 12), (11, 12)]
    )
    assert row.n_triangles == 2
    assert row.n_nodes == 6


def test_orientation_makes_count_exact_once(spark):
    # K5: C(5,3) = 10 triangles, each counted exactly once despite every
    # vertex pair being connected (max overlap of neighbor lists).
    k5 = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    assert triangle_count(_edges(spark, k5)).collect()[0].n_triangles == 10


def test_degrees_match_handshake(spark):
    pairs = [(0, 1), (0, 2), (1, 2), (2, 3), (3, 4)]
    deg = {r.node: r.d for r in degrees(_edges(spark, pairs)).collect()}
    assert deg == {0: 2, 1: 2, 2: 3, 3: 2, 4: 1}
    assert sum(deg.values()) == 2 * len(pairs)


def test_empty_graph(spark):
    row = _census(spark, [])
    assert row.n_triangles == 0
    assert row.n_edges == 0


class TestHits:
    def _reference(self, edge_list, iterations=3):
        """Unnormalized half-step reference with one final L1 —
        mirrors operators/pagerank.py:hits exactly."""
        nodes = sorted({u for u, _ in edge_list} | {v for _, v in edge_list})
        auth = {n: 1.0 for n in nodes}
        hub = {}
        for _ in range(iterations):
            hub = {}
            for u, v in edge_list:
                hub[u] = hub.get(u, 0.0) + auth.get(v, 0.0)
            auth = {}
            for u, v in edge_list:
                auth[v] = auth.get(v, 0.0) + hub.get(u, 0.0)
        hs = sum(hub.values())
        as_ = sum(auth.values())
        return (
            {n: hub.get(n, 0.0) / hs for n in nodes},
            {n: auth.get(n, 0.0) / as_ for n in nodes},
        )

    def test_hub_authority_separation(self, spark):
        from economic_data_etl_spark.operators.pagerank import hits

        # A,B are pure hubs; C,D pure authorities; C is linked twice.
        edge_list = [("A", "C"), ("A", "D"), ("B", "C")]
        edges = spark.createDataFrame(edge_list, "src string, dst string")
        got = {
            r.node: (r.hub, r.auth) for r in hits(edges).collect()
        }
        want_h, want_a = self._reference(edge_list)
        assert set(got) == set(want_h)
        for n in want_h:
            assert got[n][0] == pytest.approx(want_h[n], abs=1e-12), n
            assert got[n][1] == pytest.approx(want_a[n], abs=1e-12), n
        # structure: C out-ranks D in authority; A out-ranks B in hub;
        # pure hubs have zero authority and vice versa
        assert got["C"][1] > got["D"][1] > 0
        assert got["A"][0] > got["B"][0] > 0
        assert got["A"][1] == 0.0 and got["C"][0] == 0.0

    def test_cycle_is_uniform(self, spark):
        from economic_data_etl_spark.operators.pagerank import hits

        edge_list = [("A", "B"), ("B", "C"), ("C", "A")]
        edges = spark.createDataFrame(edge_list, "src string, dst string")
        for r in hits(edges).collect():
            assert r.hub == pytest.approx(1 / 3, abs=1e-12)
            assert r.auth == pytest.approx(1 / 3, abs=1e-12)


class TestPersonalizedPagerank:
    def test_trust_stays_in_reachable_component(self, spark):
        from economic_data_etl_spark.operators.pagerank import pagerank

        # two components; only A is trusted -> C/D get exactly zero
        edges = spark.createDataFrame(
            [("A", "B"), ("C", "D")], "src string, dst string"
        )
        seeds = spark.createDataFrame([("A",)], "node string")
        got = {
            r.node: r.rank
            for r in pagerank(edges, seeds=seeds).collect()
        }
        assert got["C"] == 0.0 and got["D"] == 0.0
        # A holds the full teleport mass (0.15); B receives only via
        # the link: d * rank(A)/deg(A) = 0.85 * 0.15 at convergence
        assert got["A"] == pytest.approx(0.15, abs=1e-12)
        assert got["B"] == pytest.approx(0.85 * 0.15, abs=1e-12)

    def test_seeds_with_symmetric_rejected(self, spark):
        from economic_data_etl_spark.operators.pagerank import pagerank

        edges = spark.createDataFrame(
            [("A", "B")], "src string, dst string"
        )
        seeds = spark.createDataFrame([("A",)], "node string")
        with pytest.raises(ValueError):
            pagerank(edges, symmetric=True, seeds=seeds)
