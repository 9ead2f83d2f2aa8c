"""Distributed connected components — the dedup-clustering step.

Near-dup detection yields PAIRS; choosing one canonical document per
duplicate group needs the transitive closure of those pairs (a pair
(A,B) and (B,C) must collapse to one group even though (A,C) was never
emitted). Spark has no built-in component operator, so this implements
iterative min-label propagation as pure DataFrame ops:

    label(v) ← min(label(v), min over neighbors u of label(u))

repeated to fixpoint. Each round is one shuffle join + one aggregation;
`localCheckpoint` truncates the lineage per round so the plan doesn't
grow with iterations (the classic iterative-algorithm failure mode).
Rounds needed = graph diameter; near-dup graphs are unions of small
dense clusters (diameter a handful), so convergence is 2-4 rounds. For
adversarial long-chain graphs at scale, the same loop structure hosts
the large-star/small-star optimization (Kiveris et al., "Connected
Components in MapReduce and Beyond"), which bounds rounds at O(log² n);
the fixpoint detection below is algorithm-agnostic.

The result is exact, and oracle-checkable: DuckDB's WITH RECURSIVE
computes the same closure on the same edges (see plans/text.py
dedup_cluster_components).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every node in `edges`; component = the
    minimum node id reachable from the node. Exact fixpoint, at most
    `max_iter` rounds (raises if not converged — silent truncation would
    return WRONG clusters)."""
    sym = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    # No distinct(): min-propagation is idempotent over duplicate edges,
    # and deduplicating would shuffle the full edge list once for
    # nothing. Symmetrized edges drive every round — materialize them
    # once, in partition counts proportional to the GRAPH (near-dup
    # edges ≪ documents), so each round pays task overhead for the edge
    # list, not the session's default shuffle width.
    sym = sym.union(sym.select(F.col("v").alias("u"), F.col("u").alias("v")))
    n_part = max(4, sym.sparkSession.sparkContext.defaultParallelism // 8)
    sym = sym.repartition(n_part, "v").localCheckpoint()

    # Seed each node with min(itself, min neighbor) — exactly what the
    # first propagation round would compute, one round for free.
    labels = (
        sym.groupBy(F.col("u").alias("node"))
        .agg(F.least(F.first("u"), F.min("v")).alias("label"))
        .repartition(n_part, "node")
        .localCheckpoint()
    )
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym.v == labels.node)
            .groupBy("u")
            .agg(F.min("label").alias("nbr"))
        )
        new_labels = (
            labels.join(nbr_min, labels.node == nbr_min.u, "left")
            .select(
                labels.node.alias("node"),
                F.least(
                    labels.label, F.coalesce(nbr_min.nbr, labels.label)
                ).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.withColumnRenamed("label", "new_label")
            .join(labels, "node")
            .filter(F.col("new_label") != F.col("label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels.select(
                "node", F.col("label").alias("component")
            )
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )
