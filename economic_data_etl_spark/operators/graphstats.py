"""Distributed triangle counting and degree statistics over an
oriented edge list.

Input contract: `edges` has two columns `a`, `b` with `a < b` (one row
per undirected edge, no duplicates, no self-loops). The a<b orientation
is what makes counting exact-once: a triangle {x<y<z} is seen only when
its base edge (x, y) intersects forward-neighbor lists containing z.

Algorithm: adjacency-list intersection (aka edge-iterator with forward
neighborhoods) — per base edge (a, b), |N+(a) ∩ N+(b)| triangles. Two
edge-keyed hash joins and an in-stage array intersection; no wedge
(length-2 path) rows are ever materialized or shuffled, which is what
kills the naive e⋈e⋈e plan on skewed graphs. At 100 TB the remaining
skew concern is a hub node whose forward adjacency list is huge;
orienting edges by (degree, id) instead of raw id bounds every forward
list by O(sqrt(m)) (Chiba-Nishizeki), which callers can do by remapping
node ids to degree-rank before calling in here — the math is unchanged.

Reference parity: the reference has no graph operators (SURVEY.md §2);
this backs the `graph_triangle_census` catalog query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def degrees(edges: DataFrame) -> DataFrame:
    """Undirected degree per node: (node, d)."""
    return (
        edges.select(F.col("a").alias("node"))
        .unionAll(edges.select("b"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )


def triangle_count(edges: DataFrame) -> DataFrame:
    """1-row DataFrame (n_triangles) — exact global triangle count."""
    adj = edges.groupBy(F.col("a").alias("node")).agg(
        F.collect_list("b").alias("nbrs")
    )
    return (
        edges.join(
            adj.select(F.col("node").alias("a"), F.col("nbrs").alias("na")),
            "a",
        )
        .join(
            adj.select(F.col("node").alias("b"), F.col("nbrs").alias("nb")),
            "b",
        )
        .select(F.size(F.array_intersect("na", "nb")).alias("t"))
        .agg(
            F.coalesce(F.sum("t"), F.lit(0))
            .cast("bigint")
            .alias("n_triangles")
        )
    )


def triangle_census(edges: DataFrame) -> DataFrame:
    """1-row census: n_edges, n_nodes, n_wedges, n_triangles,
    clustering_coeff (UNROUNDED — callers round for display).

    `edges` feeds four consumers (degree agg, adjacency build, triangle
    join probe, edge count); callers materialize it once
    (`localCheckpoint`) so the upstream derivation is not re-executed
    per consumer.
    """
    deg = degrees(edges)
    totals = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum(F.expr("d * (d - 1) / 2")).alias("n_wedges"),
    )
    n_edges = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        n_edges.crossJoin(F.broadcast(totals))
        .crossJoin(F.broadcast(triangle_count(edges)))
        .select(
            "n_edges",
            "n_nodes",
            "n_wedges",
            "n_triangles",
            F.when(F.col("n_wedges") == 0, F.lit(0.0))
            .otherwise(3.0 * F.col("n_triangles") / F.col("n_wedges"))
            .alias("clustering_coeff"),
        )
    )
