"""Connected components: exact closure on known graphs, convergence
guard, and the oracle-checked catalog query is exercised via
tests/test_catalog_oracle.py."""

from __future__ import annotations

import pytest

from economic_data_etl_spark.operators.components import connected_components


def _components(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r["node"]: r["component"]
        for r in connected_components(df, **kw).collect()
    }


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
