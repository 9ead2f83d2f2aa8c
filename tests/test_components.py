"""Connected components: exact closure on known graphs, convergence
guard, and the oracle-checked catalog query is exercised via
tests/test_catalog_oracle.py."""

from __future__ import annotations

import pytest

from economic_data_etl_spark.operators.components import (
    connected_components,
    connected_components_star,
)


def _components(spark, edges, fn=connected_components, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r["node"]: r["component"] for r in fn(df, **kw).collect()}


class TestConnectedComponents:
    def test_two_clusters_and_a_chain(self, spark):
        # cluster {1,2,3}, long chain {10..15} (forces multi-round
        # propagation), pair {99,100}
        edges = [(1, 2), (2, 3), (1, 3)]
        edges += [(i, i + 1) for i in range(10, 15)]
        edges += [(99, 100)]
        got = _components(spark, edges)
        assert {n for n, c in got.items() if c == 1} == {1, 2, 3}
        assert {n for n, c in got.items() if c == 10} == set(range(10, 16))
        assert {n for n, c in got.items() if c == 99} == {99, 100}

    def test_direction_does_not_matter(self, spark):
        a = _components(spark, [(5, 1), (2, 5), (9, 2)])
        assert a == {1: 1, 2: 1, 5: 1, 9: 1}

    def test_non_convergence_raises_instead_of_truncating(self, spark):
        chain = [(i, i + 1) for i in range(0, 8)]
        with pytest.raises(RuntimeError, match="did not converge"):
            connected_components(
                spark.createDataFrame(chain, "src long, dst long"),
                max_iter=2,
            ).collect()


class TestAlternatingStar:
    def test_long_chain_within_log_bound(self, spark):
        # 256-node path: diameter 255 would need 255 label-propagation
        # rounds; alternating star must finish within ~2·log2(n) = 16
        n = 256
        chain = [(i, i + 1) for i in range(n - 1)]
        got = _components(
            spark, chain, fn=connected_components_star, max_iter=16
        )
        assert got == {i: 0 for i in range(n)}

    def test_matches_label_propagation_on_mixed_graph(self, spark):
        import random

        rng = random.Random(7)
        nodes = list(range(60))
        edges = [
            (rng.choice(nodes), rng.choice(nodes)) for _ in range(80)
        ]
        a = _components(spark, edges)
        b = _components(spark, edges, fn=connected_components_star)
        assert a == b

    def test_self_loop_only_node_maps_to_itself(self, spark):
        got = _components(
            spark, [(7, 7), (1, 2)], fn=connected_components_star
        )
        assert got == {7: 7, 1: 1, 2: 1}
