"""Synchronous label-propagation community detection (LPA) with
deterministic tie-breaks, plus Newman modularity for the partition.

LPA (Raghavan et al., Phys. Rev. E 2007) is the near-linear community
detector: every node adopts the label most frequent among its
neighbors, iterated. The textbook algorithm is randomized (random
visit order, random tie-breaks); this implementation derandomizes it
the way the engine's other iterative operators do (components.py,
pagerank.py) so the result is a pure function of the graph:

- **synchronous** updates (all nodes vote on the PREVIOUS round's
  labels — no visit order exists at all), and
- ties broken by (vote count desc, label asc).

Fixed iteration count, one vote shuffle per round over the edge list —
the same per-round cost profile as PageRank, and the classic LPA
scale argument: no objective is materialized, so a round is ONE
edges-sized groupBy plus a WindowGroupLimit argmax (map-side trimmed
to one row per node before the exchange).

Modularity (Newman & Girvan 2004) certifies the partition:
Q = Σ_c [ L_c/m − (d_c/(2m))² ] over communities c, where L_c =
intra-community edges, d_c = degree sum, m = undirected edge count.
All three are integers here, so the per-community contribution is
bit-portable across engines.

Reference parity: the reference has no graph surface; this sits next
to PageRank/TrustRank/HITS (operators/pagerank.py) on the harvested
link graph (plans/linkgraph.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def symmetrize(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Undirected simple graph from a directed edge list: self-loops
    dropped, both directions present, duplicates collapsed."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).filter(
        F.col("src") != F.col("dst")
    )
    return e.union(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 4,
) -> DataFrame:
    """Deterministic synchronous LPA over the symmetrized graph.

    Returns (node, lab). Every node has >= 1 neighbor after
    symmetrization (isolated nodes have no edges and thus no row), so
    each round's argmax covers the full node set.
    """
    und = symmetrize(edges, src, dst)
    # One repartition gives every round's vote join the same
    # co-partitioning (the pagerank.py substrate argument); persist +
    # count materializes once before the iteration branches off it.
    n_part = max(
        4, edges.sparkSession.sparkContext.defaultParallelism // 2
    )
    und = und.repartition(n_part, "dst").persist()
    und.count()

    labels = und.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("lab")
    )
    w = Window.partitionBy("node").orderBy(F.desc("c"), "lab")
    for _ in range(iterations):
        votes = (
            und.join(
                labels.withColumnRenamed("node", "dst"), "dst"
            )
            .select(F.col("src").alias("node"), "lab")
            .groupBy("node", "lab")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        # Checkpoint each round: the label table is node-sized, and
        # without the cut every later round (and every downstream
        # consumer — the modularity pass reads labels three times)
        # re-executes the full vote history per consumer.
        labels = (
            votes.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("node", "lab")
            .localCheckpoint()
        )
    return labels


def community_summary(
    edges: DataFrame,
    labels: DataFrame,
    round_fn=None,
) -> DataFrame:
    """Per-community size, intra-edge count, degree sum, and Newman
    modularity contribution, from a final (node, lab) assignment.

    L_c, d_c, and m are exact integers (each undirected edge appears
    twice in the symmetrized list, so the halves are exact); only the
    final Q contribution is floating point.
    """
    if round_fn is None:
        round_fn = lambda c: F.round(c, 4)  # noqa: E731
    und = symmetrize(edges).localCheckpoint()
    m = und.count() // 2  # exact: symmetric list has even cardinality

    deg = und.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("d")
    )
    sized = (
        labels.join(deg, "node")
        .groupBy(F.col("lab").alias("community"))
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.sum("d").alias("degree_sum"),
        )
    )
    a = labels.select(F.col("node").alias("src"), F.col("lab").alias("la"))
    b = labels.select(F.col("node").alias("dst"), F.col("lab").alias("lb"))
    intra = (
        und.join(a, "src")
        .join(b, "dst")
        .filter(F.col("la") == F.col("lb"))
        .groupBy(F.col("la").alias("community"))
        .agg(F.expr("count(1) div 2").alias("intra_edges"))
    )
    md = float(m)
    frac = F.col("degree_sum").cast("double") / F.lit(2.0 * md)
    q = (
        F.coalesce(F.col("intra_edges"), F.lit(0)).cast("double")
        / F.lit(md)
        - frac * frac
    )
    return (
        sized.join(intra, "community", "left")
        .select(
            "community",
            "n_nodes",
            F.coalesce(F.col("intra_edges"), F.lit(0))
            .cast("long")
            .alias("intra_edges"),
            F.col("degree_sum").cast("long").alias("degree_sum"),
            round_fn(q).alias("q_contrib"),
        )
    )
