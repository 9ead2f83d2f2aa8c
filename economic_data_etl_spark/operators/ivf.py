"""IVF (inverted-file) approximate nearest-neighbor index.

The trained-index scale path for similarity search (the stateless
companion is SRP-LSH in operators/similarity.py):

1. **Train**: k centroids refined by Lloyd iterations. Assignment runs
   distributed (argmax over centroid dot products, pure expressions);
   the centroid update collects only k×dim floats to the driver —
   constant-size regardless of corpus size.
2. **Index**: each corpus vector gets its nearest-centroid id — at scale
   this is the partition/cluster key the corpus is written by, so a probe
   reads only the probed clusters' files (partition pruning).
3. **Search**: each query scores only vectors in its `n_probe` nearest
   clusters — corpus-scan cost drops by ~k/n_probe.

Deterministic: initial centroids are the first k vectors by id, and all
reductions are fixed-order per partition count; suitable for rows-only
correctness checks (float means make bit-exact SQL oracles impractical).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from economic_data_etl_spark.functions.vectors import cosine_similarity
from economic_data_etl_spark.operators.topk import grouped_top_k


def _dot_with_literal(vec: Column, plane: list[float]) -> Column:
    return F.aggregate(
        F.zip_with(
            vec.cast("array<double>"),
            F.array(*[F.lit(float(x)) for x in plane]),
            lambda a, b: a * b,
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def assign_clusters(
    df: DataFrame, centroids: list[list[float]], vec_col: str = "embedding"
) -> DataFrame:
    """Add `cluster` = argmax cosine(vec, centroid). Centroids are
    L2-normalized driver constants, so cosine argmax == dot argmax."""
    dots = F.array(
        *[_dot_with_literal(F.col(vec_col), c) for c in centroids]
    )
    # array_position is 1-based; ties resolve to the first (lowest id).
    cluster = (F.array_position(dots, F.array_max(dots)) - 1).cast("int")
    return df.withColumn("cluster", cluster)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def train_ivf(
    corpus: DataFrame,
    k: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Lloyd-refined centroids. Only k×dim floats ever reach the driver."""
    seed_rows = (
        corpus.orderBy(id_col).limit(k).select(vec_col).collect()
    )
    if not seed_rows:
        # empty corpus: nothing to train — callers short-circuit to an
        # empty result instead of feeding numpy a 0-d array.
        return []
    centroids = _normalize(np.array([r[0] for r in seed_rows], dtype=np.float64))

    for _ in range(iters):
        assigned = assign_clusters(corpus, centroids.tolist(), vec_col)
        # mean per (cluster, dim): posexplode keeps the reduction distributed
        sums = (
            assigned.select(
                "cluster", F.posexplode(F.col(vec_col).cast("array<double>"))
            )
            .groupBy("cluster", "pos")
            .agg(F.avg("col").alias("mean"))
            .collect()
        )
        dim = centroids.shape[1]
        new_c = centroids.copy()
        by_cluster: dict[int, dict[int, float]] = {}
        for r in sums:
            by_cluster.setdefault(r["cluster"], {})[r["pos"]] = r["mean"]
        for c, dims in by_cluster.items():
            new_c[c] = [dims.get(i, centroids[c][i]) for i in range(dim)]
        centroids = _normalize(new_c)
    return centroids.tolist()


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 10,
    n_probe: int = 3,
    corpus_id: str = "vec_id",
    query_id: str = "q_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k: score only the n_probe nearest clusters
    per query. Probe assignment stays distributed: each query scores the
    k driver-constant centroids as a pure expression, sorts (−dot, id)
    structs, and explodes the first n_probe — no shuffle, no query-side
    collect, so a 10M-query offline batch runs without touching the
    driver. Centroids are L2-normalized, so dot order == cosine order
    regardless of query norm.

    The broadcast hint fits interactive/moderate query batches; for an
    offline batch too big to broadcast, drop the hint and salt the
    cluster key (only k distinct values) before the shuffle join —
    at warehouse scale the corpus is written partitioned by `cluster`,
    so each probe reads only its clusters' files either way."""
    indexed = assign_clusters(corpus, centroids, vec_col)

    dots = [_dot_with_literal(F.col(vec_col), c) for c in centroids]
    ranked = F.array_sort(
        F.array(
            *[
                F.struct(
                    (-d).alias("neg_dot"), F.lit(i).cast("int").alias("cluster")
                )
                for i, d in enumerate(dots)
            ]
        )
    )
    probes = queries.select(
        query_id,
        F.col(vec_col).alias("__qvec"),
        F.explode(F.slice(ranked, 1, n_probe)["cluster"]).alias("cluster"),
    )

    joined = indexed.join(F.broadcast(probes), "cluster").filter(
        F.col(corpus_id) != F.col(query_id)
    )
    scored = joined.select(
        query_id,
        corpus_id,
        (
            F.round(
                cosine_similarity(F.col(vec_col), F.col("__qvec")) + F.lit(5e-10), 4
            )
            + F.lit(0.0)  # collapse -0.0 (see catalog.biased_round)
        ).alias("score"),
    )
    return grouped_top_k(
        scored, [query_id], [F.desc("score"), F.asc(corpus_id)], k, rank_col="rank"
    ).select(query_id, corpus_id, "score", "rank")
