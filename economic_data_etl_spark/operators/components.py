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
        # The convergence flag rides the round's own projection (labels
        # only ever DECREASE, so changed ≡ new < old): the fixpoint
        # check is then a filter-count over the round's checkpointed
        # blocks instead of a second node-table join per round.
        new_labels = (
            labels.join(nbr_min, labels.node == nbr_min.u, "left")
            .select(
                labels.node.alias("node"),
                F.least(
                    labels.label, F.coalesce(nbr_min.nbr, labels.label)
                ).alias("label"),
                (
                    F.coalesce(nbr_min.nbr, labels.label) < labels.label
                ).alias("chg"),
            )
            .localCheckpoint()
        )
        changed = new_labels.filter(F.col("chg")).count()
        labels = new_labels.select("node", "label")
        if changed == 0:
            return labels.select(
                "node", F.col("label").alias("component")
            )
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """Alternating large-star / small-star contraction (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14): same
    (node, component=min reachable id) contract as
    `connected_components`, but rounds are bounded O(log² n) on ANY
    graph — including an adversarial n-node chain, where label
    propagation needs n-1 rounds (one hop per round).

    Use this when cluster diameter is unknown or unbounded; plain label
    propagation stays the default for near-dup graphs (small dense
    clusters, diameter ≤ ~4) because its per-round cost is lower (it
    never rewrites the edge list).

    Each round: large-star hangs every neighbor v > u off m(u) =
    min(N(u) ∪ {u}); small-star (on the now big→small oriented edges)
    re-points each node's smaller neighbors at its minimum. The edge set
    contracts toward stars rooted at component minima; fixpoint =
    edge set unchanged (checked exactly — count + except — because a
    truncated result would be WRONG clusters, same policy as above).
    """
    raw = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    # every node mentioned by edges gets a row, even self-loop-only nodes
    all_nodes = (
        raw.select(F.col("u").alias("node"))
        .union(raw.select(F.col("v").alias("node")))
        .distinct()
    )
    e0 = raw.filter(F.col("u") != F.col("v"))
    n_part = max(4, e0.sparkSession.sparkContext.defaultParallelism // 8)
    # orient big→small so round outputs are comparable across iterations
    e = (
        e0.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .distinct()
        .repartition(n_part, "u")
        .localCheckpoint()
    )
    n_edges = e.count()
    for _ in range(max_iter):
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        m = sym.groupBy("u").agg(
            F.least(F.first("u"), F.min("v")).alias("m")
        )
        # large-star: (v, m(u)) for v > u; v > u ≥ m keeps big→small
        large = (
            sym.join(m, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )
        # small-star on big→small edges: point u and its smaller
        # neighbors at mn(u) = min of those neighbors
        mn = large.groupBy("u").agg(F.min("v").alias("mn"))
        j = large.join(mn, "u")
        new_e = (
            j.select(F.col("u").alias("u"), F.col("mn").alias("v"))
            .union(
                j.filter(F.col("v") != F.col("mn")).select(
                    F.col("v").alias("u"), F.col("mn").alias("v")
                )
            )
            .distinct()
            .repartition(n_part, "u")
            .localCheckpoint()
        )
        n_new = new_e.count()
        if n_new == n_edges and new_e.exceptAll(e).limit(1).count() == 0:
            stars = new_e
            labels = stars.select(
                F.col("u").alias("node"), F.col("v").alias("component")
            ).union(
                stars.select(F.col("v").alias("node"), F.col("v").alias("component")).distinct()
            )
            # nodes isolated by contraction (singleton components) map to
            # themselves
            return (
                all_nodes.join(labels, "node", "left")
                .select(
                    "node",
                    F.coalesce("component", F.col("node")).alias("component"),
                )
            )
        e, n_edges = new_e, n_new
    raise RuntimeError(
        f"connected_components_star did not converge in {max_iter} rounds"
    )
