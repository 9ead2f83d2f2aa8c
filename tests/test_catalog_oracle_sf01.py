"""Scale-sensitivity checks at sf0.01 (the driver's correctness SF).

Round 2 lesson: `sql_recursive_bfs` passed the sf0.001 sweep but
path-exploded past Spark's 1M-row recursion limit at sf0.01 — a whole
class of escape the tiny-SF sweep cannot catch. Two layers close it:

- `test_scale_sensitive_sf01` (always on): the handful of queries whose
  cost is graph- or combinatorics-shaped, where 10× data can change the
  answer class (explosion, limit overflow), not just the wall time.
- `test_oracle_match_sf01` (@slow): the full oracle sweep at sf0.01 —
  exactly what the driver runs — for nightly/manual use via `-m slow`.
"""

from __future__ import annotations

import pytest

from economic_data_etl_spark.plans import REGISTRY
from tests.oracle_util import compare_query

SF01_DIR = "/root/testdata/sf0.01"

SQL_QUERIES = sorted(name for name, q in REGISTRY.items() if q.oracle)

# Queries whose row-count growth is super-linear in SF (graph recursion,
# self-joins, pair generation) — the ones a small-SF pass can falsely bless.
SCALE_SENSITIVE = [
    "sql_recursive_bfs",
    "dedup_cluster_components",
    "dedup_ngram_jaccard",
    "join_market_basket_pairs",
    "graph_triangle_census",
    # round-3 pair-generators (doc-frequency joins / n-gram self-joins):
    # linear output but quadratic-capable intermediates at 10× data.
    "dedup_duplicated_ngram_fraction",
    "dedup_longest_duplicated_span",
    "text_bigram_collocations",
    # round-5 pair-generators over the cluster-bucketed layout / the
    # exact-baseline recall certificate (O(n²) certification side).
    "dedup_semantic_bucketed",
    "inv_semantic_recall",
]


@pytest.mark.parametrize(
    "name", [n for n in SCALE_SENSITIVE if n in REGISTRY]
)
def test_scale_sensitive_sf01(spark, name):
    q = REGISTRY[name]
    if q.oracle:
        compare_query(spark, q.spark, q.oracle, SF01_DIR)
    else:
        assert q.spark(spark, SF01_DIR).count() >= 0


@pytest.mark.slow
@pytest.mark.parametrize("name", SQL_QUERIES)
def test_oracle_match_sf01(spark, name):
    q = REGISTRY[name]
    compare_query(spark, q.spark, q.oracle, SF01_DIR)
