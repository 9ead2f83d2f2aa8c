"""Graph analytics beyond PageRank: triangle census and degree
distribution over the part co-purchase graph.

Graph: undirected edges between parts that appear in the same order
(the classic market-basket projection). Pair generation goes through
`groupBy(orderkey) -> sorted distinct part array -> in-stage pair
explode` rather than a lineitem self-join: one shuffle keyed by order,
per-order work bounded by the (small, bounded) order size, and the
a < b orientation falls out of the sorted array for free. At 100 TB the
same plan holds — order groups stay small, and the distinct edge set is
the only global shuffle. For triangle counting, the a < b < c
orientation counts each triangle exactly once (the "compact-forward"
scheme); production skew hardening would orient edges by degree instead
of key, which this module notes but does not need at catalog scale.

Reference parity: the reference (Caseykelly87/economic-data-etl) has no
graph operators; this extends the engine's analytics surface in the
same spirit as operators/pagerank.py (see src/transform.py:97-115 for
the reference's closest set-combination logic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from economic_data_etl_spark.plans.catalog import biased_round, register
from economic_data_etl_spark.sources.tables import load_table

# Shared CTE prefix: distinct a<b co-purchase edges from lineitem.
_EDGES_CTE = """
    WITH pairs AS (
        SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
        FROM lineitem l1
        JOIN lineitem l2
          ON l1.l_orderkey = l2.l_orderkey
         AND l1.l_partkey < l2.l_partkey
    )
"""


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct undirected co-purchase edges, oriented a < b."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    parts = lineitem.groupBy("l_orderkey").agg(
        F.array_sort(F.array_distinct(F.collect_list("l_partkey"))).alias(
            "ps"
        )
    )
    # Sorted-distinct array -> all i<j pairs inside one stage; ps[i] <
    # ps[j] holds by construction so no least/greatest pass is needed.
    # Guard size>=2 BEFORE sequence(): Spark's sequence(0, -1) counts
    # DOWN (implicit step -1), so a 1-part order would explode garbage.
    return (
        parts.filter(F.size("ps") >= 2)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(sequence(0, size(ps) - 2),"
                    " i -> transform(sequence(i + 1, size(ps) - 1),"
                    " j -> struct(ps[i] AS a, ps[j] AS b))))"
                )
            ).alias("e")
        )
        .select("e.a", "e.b")
        .distinct()
    )


@register(
    "graph_triangle_census",
    oracle=_EDGES_CTE
    + """
    , deg AS (
        SELECT node, COUNT(*) AS d FROM (
            SELECT a AS node FROM pairs
            UNION ALL
            SELECT b FROM pairs
        ) GROUP BY 1
    ), tri AS (
        SELECT COUNT(*) AS n_triangles
        FROM pairs e1
        JOIN pairs e2 ON e2.a = e1.b
        JOIN pairs e3 ON e3.a = e1.a AND e3.b = e2.b
    )
    SELECT (SELECT COUNT(*) FROM pairs) AS n_edges,
           (SELECT COUNT(*) FROM deg) AS n_nodes,
           (SELECT SUM(d * (d - 1) / 2) FROM deg) AS n_wedges,
           tri.n_triangles,
           ROUND(5e-10 + CASE WHEN (SELECT SUM(d * (d - 1) / 2) FROM deg) = 0
                 THEN 0.0
                 ELSE 3.0 * tri.n_triangles
                      / (SELECT SUM(d * (d - 1) / 2) FROM deg) END,
                 4) AS clustering_coeff
    FROM tri
    """,
    doc="Global triangle census of the part co-purchase graph: edge/"
    "node/wedge counts, triangles counted by intersecting forward-"
    "neighbor adjacency lists per base edge (a<b<c orientation, no "
    "wedge-path materialization), and the global clustering coefficient "
    "3*triangles/wedges. Edges are generated per-order in-stage (no "
    "lineitem self-join shuffle); the oracle cross-checks with an "
    "independent join-based triangle enumeration.",
)
def graph_triangle_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    from economic_data_etl_spark.operators.graphstats import (
        triangle_census,
    )

    # Adjacency-intersection counting instead of wedge enumeration: the
    # e1⋈e2-on-b wedge join materializes and shuffles every a<b<c path
    # (~35M rows at sf0.1 — 12 s; the classic triangle scale-killer).
    # Intersecting forward-neighbor lists per edge counts the same
    # triangles with two edge-keyed joins and zero wedge rows (measured
    # 12.2 s → ~5 s at sf0.1). The checkpoint stops the groupBy+explode+
    # distinct edge derivation re-executing for each census consumer.
    edges = _copurchase_edges(spark, sf_dir).localCheckpoint(eager=False)
    census = triangle_census(edges)
    return census.select(
        "n_edges",
        "n_nodes",
        "n_wedges",
        "n_triangles",
        biased_round(F.col("clustering_coeff")).alias("clustering_coeff"),
    )


@register(
    "graph_degree_distribution",
    oracle=_EDGES_CTE
    + """
    , deg AS (
        SELECT node, COUNT(*) AS d FROM (
            SELECT a AS node FROM pairs
            UNION ALL
            SELECT b FROM pairs
        ) GROUP BY 1
    )
    SELECT CAST(POWER(2, FLOOR(LOG2(d) + 1e-9)) AS BIGINT) AS degree_bucket,
           COUNT(*) AS n_nodes,
           MIN(d) AS min_degree,
           MAX(d) AS max_degree
    FROM deg
    GROUP BY 1
    ORDER BY 1
    """,
    doc="Power-of-two-bucketed degree histogram of the part co-purchase "
    "graph — the standard skew diagnostic one runs BEFORE a triangle/"
    "join-heavy workload to decide whether degree-ordering or salting "
    "is needed. Entirely shuffle-minimal: one per-order pair stage, one "
    "distinct, one degree agg, one tiny histogram agg.",
)
def graph_degree_distribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    edges = _copurchase_edges(spark, sf_dir)
    deg = edges.select(F.col("a").alias("node")).unionAll(
        edges.select("b")
    ).groupBy("node").agg(F.count(F.lit(1)).alias("d"))
    return (
        # +1e-9 before floor: libm log2 of an exact power of two may land
        # an ulp BELOW the integer in either engine; the nudge makes both
        # floor identically.
        deg.groupBy(
            F.pow(F.lit(2.0), F.floor(F.log2("d") + F.lit(1e-9)))
            .cast("bigint")
            .alias("degree_bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.min("d").alias("min_degree"),
            F.max("d").alias("max_degree"),
        )
        .orderBy("degree_bucket")
    )
