"""Distributed PageRank over an edge DataFrame.

The second iterative graph operator next to connected components
(operators/components.py) — same execution discipline:

- Edges are computed ONCE and persisted: every iteration joins ranks
  back to the same cached edge table, so the per-round shuffle moves
  only the rank vector (one double per node), never the edge list.
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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping: float = 0.85,
    symmetric: bool = False,
    seeds: DataFrame | None = None,
) -> DataFrame:
    """Fixed-iteration PageRank. Returns (node, rank) with sum(rank) ~= 1.

    `edges` is directed; symmetrize before calling for undirected graphs
    and pass ``symmetric=True``: on a symmetrized graph every node has
    both out- and in-edges, so the node set IS the degree table's key
    set (no union-distinct over both endpoints) and every node receives
    contributions (no per-round left join against the node set) — two
    fewer shuffles per run and one fewer per round, same answer.

    `seeds` (single node-id column, incompatible with ``symmetric``)
    switches to PERSONALIZED PageRank — TrustRank (Gyongyi et al.,
    VLDB 2004) when the seeds are a trusted set: the teleport mass
    (1-d) lands uniformly on the SEEDS only, so rank can only flow out
    of the trusted neighborhood along real links and spam farms with
    no trusted in-path score ~0. Init mass starts on the seeds too
    (the s-vector start). Seeds are joined once into the persisted
    node table (one extra setup shuffle, broadcast when small); the
    per-round cost is identical to the uniform case.

    Dangling nodes (no out-edges, impossible when symmetric) receive
    rank but leak their mass — the classic simplified formulation;
    callers needing mass conservation should add self-loops.
    """
    if seeds is not None and symmetric:
        raise ValueError("seeds requires the directed (non-symmetric) path")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    # ONE shuffle builds the whole iteration substrate: repartition on
    # src gives the co-partitioning every round's rank join reuses, and
    # a window count over that same partitioning attaches the
    # out-degree in place. (The naive shape — groupBy deg, join it
    # back, repartition — pays three shuffles of the edge list and
    # re-executes an uncached upstream edge derivation once per
    # consumer; measured 13.3 s → 6 s setup at sf0.1.) Partition count
    # is graph-proportional like components.py:50: a rank vector is
    # tiny next to the session default width, and per-round task
    # overhead scales with width × iterations.
    n_part = max(4, e.sparkSession.sparkContext.defaultParallelism // 2)
    linked = (
        e.repartition(n_part, "src")
        .withColumn(
            "deg", F.count(F.lit(1)).over(Window.partitionBy("src"))
        )
        .persist()
    )
    # Materialize the cache with ONE pass before anything branches off
    # it: partitions not yet cached when the first multi-branch job runs
    # would re-execute the upstream derivation once per branch.
    linked.count()
    if symmetric:
        nodes = (
            linked.select(F.col("src").alias("node")).distinct().persist()
        )
    else:
        nodes = (
            linked.select(F.col("src").alias("node"))
            .union(linked.select(F.col("dst").alias("node")))
            .distinct()
            .persist()
        )
    n = nodes.count()  # one scalar to the driver; sizes the teleport term
    if n == 0:
        # empty graph: empty (node, rank) result, not a ZeroDivisionError
        # — empty partitions/slices are routine upstream at scale.
        return nodes.select("node", F.lit(0.0).alias("rank"))

    if seeds is not None:
        # Per-node teleport joined ONCE into the persisted node table:
        # (1-d)/|S| on seeds, 0 elsewhere. |S| is one scalar like n.
        seed_ids = seeds.select(
            F.col(seeds.columns[0]).alias("node")
        ).distinct()
        n_seeds = seed_ids.count()
        if n_seeds == 0:
            raise ValueError("seeds must contain at least one node")
        nodes = nodes.join(
            seed_ids.withColumn("__s", F.lit(1)), "node", "left"
        ).select(
            "node",
            F.when(
                F.col("__s").isNotNull(),
                F.lit((1.0 - damping) / n_seeds),
            )
            .otherwise(F.lit(0.0))
            .alias("tele"),
        ).persist()
        init = F.when(F.col("tele") > 0, F.lit(1.0 / n_seeds)).otherwise(
            F.lit(0.0)
        )
    else:
        nodes = nodes.withColumn(
            "tele", F.lit((1.0 - damping) / n)
        ).persist()
        init = F.lit(1.0 / n)

    ranks = nodes.select("node", init.alias("rank"))
    for _ in range(iterations):
        contribs = (
            linked.join(ranks, linked["src"] == ranks["node"])
            .select("dst", (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        if symmetric:
            # every node has in-edges and teleport is uniform: contribs
            # already covers the full node set, no re-join needed.
            ranks = contribs.select(
                F.col("dst").alias("node"),
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping) * F.col("contrib")
                ).alias("rank"),
            ).localCheckpoint(eager=False)
        else:
            ranks = (
                nodes.join(
                    contribs, nodes["node"] == contribs["dst"], "left"
                )
                .select(
                    "node",
                    (
                        F.col("tele")
                        + F.lit(damping)
                        * F.coalesce(F.col("contrib"), F.lit(0.0))
                    ).alias("rank"),
                )
                .localCheckpoint(eager=False)
            )
    return ranks


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
) -> DataFrame:
    """Fixed-iteration HITS (Kleinberg hubs & authorities) over a
    directed edge DataFrame. Returns (node, hub, auth), each vector
    L1-normalized (the classic formulation with the L2 norm swapped
    for L1 — scale-free for ranking, and exactly SQL-replayable
    without sqrt).

    HITS is LINEAR, so per-half-step normalization only rescales the
    iterates: the loop runs UNNORMALIZED (hub_i = Σ auth over
    out-edges, auth_i = Σ hub over in-edges) and both vectors are
    L1-normalized exactly once at the end — the same final vectors,
    half the per-round shuffles. Magnitudes grow like
    (max degree)^(2·iterations): for 3 iterations even degree-10^6
    hubs stay below 1e36, far inside double range; callers running
    many more iterations should renormalize periodically.

    Same execution discipline as pagerank(): edges repartitioned on
    src ONCE and persisted, per-round shuffles move only the score
    vector (one double per node), lineage truncated per round, no
    data-sized driver collects. Mid-loop score tables cover exactly
    the nodes that can be nonzero (hubs live on sources, authorities
    on targets — absent rows ARE the zeros, so no per-round left join
    against the node set); nodes without out-edges surface with hub 0
    and without in-edges with auth 0 in the final result.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    n_part = max(4, e.sparkSession.sparkContext.defaultParallelism // 2)
    linked = e.repartition(n_part, "src").persist()
    linked.count()  # materialize before multi-branch consumers
    nodes = (
        linked.select(F.col("src").alias("node"))
        .union(linked.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )

    # auth_0 = 1 on every node; from round 1 on, the auth table covers
    # all DST nodes (every e.dst finds its row), so dropping src-only
    # nodes from it is exact — they contribute nothing anywhere.
    auth = nodes.withColumn("auth", F.lit(1.0))
    hub = None
    for _ in range(iterations):
        hub = (
            linked.join(auth, linked["dst"] == auth["node"])
            .groupBy("src")
            .agg(F.sum("auth").alias("hub"))
            .withColumnRenamed("src", "node")
            .localCheckpoint(eager=False)
        )
        auth = (
            linked.join(hub, linked["src"] == hub["node"])
            .groupBy("dst")
            .agg(F.sum("hub").alias("auth"))
            .withColumnRenamed("dst", "node")
            .localCheckpoint(eager=False)
        )

    def _l1_over_nodes(scores: DataFrame, col: str) -> DataFrame:
        full = nodes.join(scores, "node", "left").select(
            "node", F.coalesce(F.col(col), F.lit(0.0)).alias(col)
        )
        total = full.agg(F.sum(col).alias("__t"))
        return full.crossJoin(F.broadcast(total)).select(
            "node", (F.col(col) / F.col("__t")).alias(col)
        )

    return _l1_over_nodes(hub, "hub").join(
        _l1_over_nodes(auth, "auth"), "node"
    )
