"""Graph queries: PageRank over the customer↔supplier trade graph.

Cross-checks the iterative operator (operators/pagerank.py) against a
DuckDB oracle that unrolls the same three iterations as chained CTEs —
an exact cross-engine check of an iterative algorithm, like the
WITH RECURSIVE oracle for connected components.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from economic_data_etl_spark.plans.catalog import biased_round, register
from economic_data_etl_spark.sources.tables import load_table

_PAGERANK_ORACLE = """
    WITH base AS (
        SELECT DISTINCT 'c:' || CAST(o_custkey AS VARCHAR) AS c,
                        's:' || CAST(l_suppkey AS VARCHAR) AS s
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ), edges AS (
        SELECT c AS src, s AS dst FROM base
        UNION ALL
        SELECT s, c FROM base
    ), deg AS (
        SELECT src, COUNT(*) AS deg FROM edges GROUP BY 1
    ), nodes AS (
        SELECT DISTINCT src AS node FROM edges
    ), nn AS (
        SELECT COUNT(*) AS n FROM nodes
    ), r0 AS (
        SELECT node, CAST(1.0 AS DOUBLE) / nn.n AS rank
        FROM nodes CROSS JOIN nn
    ), c1 AS (
        SELECT e.dst AS node, SUM(r.rank / d.deg) AS contrib
        FROM edges e
        JOIN deg d ON d.src = e.src
        JOIN r0 r ON r.node = e.src
        GROUP BY 1
    ), r1 AS (
        SELECT nd.node,
               CAST(0.15 AS DOUBLE) / nn.n
                   + CAST(0.85 AS DOUBLE) * COALESCE(c1.contrib, 0.0) AS rank
        FROM nodes nd CROSS JOIN nn LEFT JOIN c1 ON c1.node = nd.node
    ), c2 AS (
        SELECT e.dst AS node, SUM(r.rank / d.deg) AS contrib
        FROM edges e
        JOIN deg d ON d.src = e.src
        JOIN r1 r ON r.node = e.src
        GROUP BY 1
    ), r2 AS (
        SELECT nd.node,
               CAST(0.15 AS DOUBLE) / nn.n
                   + CAST(0.85 AS DOUBLE) * COALESCE(c2.contrib, 0.0) AS rank
        FROM nodes nd CROSS JOIN nn LEFT JOIN c2 ON c2.node = nd.node
    ), c3 AS (
        SELECT e.dst AS node, SUM(r.rank / d.deg) AS contrib
        FROM edges e
        JOIN deg d ON d.src = e.src
        JOIN r2 r ON r.node = e.src
        GROUP BY 1
    ), r3 AS (
        SELECT nd.node,
               CAST(0.15 AS DOUBLE) / nn.n
                   + CAST(0.85 AS DOUBLE) * COALESCE(c3.contrib, 0.0) AS rank
        FROM nodes nd CROSS JOIN nn LEFT JOIN c3 ON c3.node = nd.node
    )
    SELECT node, ROUND(5e-10 + r3.rank * nn.n, 4) AS rank_scaled
    FROM r3 CROSS JOIN nn
    ORDER BY rank_scaled DESC, node
    LIMIT 20
"""


@register(
    "graph_pagerank_trade",
    oracle=_PAGERANK_ORACLE,
    doc="3-iteration PageRank (damping 0.85) over the undirected "
    "customer↔supplier graph induced by orders⋈lineitem "
    "(operators/pagerank.py: edges partitioned once and persisted, "
    "per-round shuffles move only the rank vector, lineage truncated "
    "per round). Top-20 hubs by rank scaled to mean 1; ordering breaks "
    "ties on the ROUNDED rank then node id, so cross-engine float-sum "
    "noise below the display precision can't reorder the answer. "
    "Oracle = the identical three iterations unrolled as CTEs.",
)
def graph_pagerank_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    from economic_data_etl_spark.operators.pagerank import pagerank

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    # Distinct on the INTEGER key pair first (cheaper hashing than the
    # display strings), with the slim orders projection broadcast so the
    # fact side never shuffles for the join; node labels are attached
    # after dedup, on 2x fewer rows.
    base = (
        lineitem.select("l_orderkey", "l_suppkey")
        .join(
            F.broadcast(orders.select("o_orderkey", "o_custkey")),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .select("o_custkey", "l_suppkey")
        .distinct()
        .select(
            F.concat(F.lit("c:"), F.col("o_custkey")).alias("c"),
            F.concat(F.lit("s:"), F.col("l_suppkey")).alias("s"),
        )
    )
    # Symmetrize in-stage with explode: a union of two selects over the
    # (uncached) pair derivation would execute the join+distinct TWICE —
    # explode doubles rows inside the same stage, one execution, no
    # extra shuffle.
    edges = base.select(
        F.explode(
            F.array(
                F.struct(F.col("c").alias("src"), F.col("s").alias("dst")),
                F.struct(F.col("s").alias("src"), F.col("c").alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    ranks = pagerank(edges, iterations=3, damping=0.85, symmetric=True)
    n_nodes = ranks.agg(F.count(F.lit(1)).alias("n"))
    return (
        ranks.crossJoin(F.broadcast(n_nodes))
        .select(
            "node",
            biased_round(F.col("rank") * F.col("n")).alias("rank_scaled"),
        )
        .orderBy(F.col("rank_scaled").desc(), "node")
        .limit(20)
    )
