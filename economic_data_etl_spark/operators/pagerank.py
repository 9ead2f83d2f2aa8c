"""Distributed PageRank over an edge DataFrame.

The second iterative graph operator next to connected components
(operators/components.py) — same execution discipline:

- Edges (+ out-degrees) are computed ONCE, repartitioned on the join key,
  and persisted: every iteration joins ranks back to the same partitioned
  edge table, so the per-round shuffle moves only the rank vector (one
  double per node), never the edge list.
- Ranks are localCheckpoint'ed each round to truncate lineage — an
  unbounded iteration count must not grow a plan tree (Catalyst analysis
  is quadratic-ish in depth).
- The only driver-side values are the node count (one long, the same
  class of scalar as the rollup watermark) and the loop counter. No
  collect() that grows with the graph.

At 100 TB the cost model is: one edge shuffle at setup, then per round
one shuffle of the rank vector to edge partitions and one groupBy(dst)
shuffle of contributions. Rank state is O(nodes), edges stay put.

No reference counterpart (the reference has no graph operators); this
extends the engine surface the same way components/dedup do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """Fixed-iteration PageRank. Returns (node, rank) with sum(rank) ~= 1.

    `edges` is directed; symmetrize before calling for undirected graphs.
    Dangling nodes (no out-edges) receive rank but leak their mass — the
    classic simplified formulation; callers needing mass conservation
    should add self-loops.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # Pre-partition on src: the per-round ranks join then lines up with
    # zero movement of the edge side.
    linked = (
        e.join(deg, "src")
        .repartition("src")
        .persist()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()  # one scalar to the driver; sizes the teleport term
    base = (1.0 - damping) / n

    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iterations):
        contribs = (
            linked.join(ranks, linked["src"] == ranks["node"])
            .select("dst", (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        ranks = (
            nodes.join(contribs, nodes["node"] == contribs["dst"], "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce(F.col("contrib"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks
