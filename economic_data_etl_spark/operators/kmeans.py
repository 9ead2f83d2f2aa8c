"""Distributed Lloyd k-means over an embedding column.

The scale split mirrors PageRank/components (iterative, bounded driver
state): per round, assignments and the per-cluster moment aggregation
run as ONE distributed job (a single shuffle of k rows per partition —
count, per-dimension sums, and the round's inertia, all map-side
combined), and only the k x dim centroid matrix ever reaches the
driver. Nothing driver-side grows with the corpus.

Determinism: seeding is the first k vectors by id (the repo's
SQL-reproducible centroid choice, same as operators/semantic.py), the
assignment argmin breaks ties toward the lowest cluster id
(array_position finds the FIRST minimum), and empty clusters keep
their previous centroid. Distances are evaluated JVM-side as
interpreted higher-order functions over ONE constant-folded literal
centroid matrix (the PQ lesson: never inline k expression subtrees).

No reference counterpart; extends the ML surface next to the
normal-equations OLS and the IVF/PQ ANN stack (whose training runs on
a driver SAMPLE by design — this operator is the full-corpus
counterpart for when the clustering itself is the product).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cents_lit(cents: list[list[float]]) -> Column:
    return F.array(
        *[F.array(*[F.lit(float(x)) for x in c]) for c in cents]
    )


def _dist2_all(vec: Column, cents: list[list[float]]) -> Column:
    """array of squared euclidean distances to every centroid.

    Stays the interpreted fold over ONE constant-folded literal matrix
    on purpose: an r13 experiment replaced it with per-centroid scalar
    multiply-add chains (k x dim explicit terms) and the query
    REGRESSED 3.2 s -> 19 s — Lloyd re-plans with fresh literals every
    round, and CollapseProject inlines the giant d2 array into its
    three consumers (array_min twice + array_position), so each round
    paid Janino compilation of ~3x k x dim x 4 expression nodes. The
    PQ lesson (never inline k expression subtrees) applies even at
    k=8 when the expression is rebuilt per iteration."""
    return F.transform(
        _cents_lit(cents),
        lambda c: F.aggregate(
            F.zip_with(vec, c, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )


def assign_min_dist(
    df: DataFrame, vec_col: str, cents: list[list[float]]
) -> DataFrame:
    """Add `cluster` (argmin distance, ties to lowest id) and `dist2`.

    The output columns are fixed names; an input that already carries
    any of them would produce ambiguous references downstream (the
    groupBy("cluster") in lloyd_kmeans), so collisions fail loudly
    here instead.
    """
    clash = {"cluster", "dist2", "__d2"} & set(df.columns)
    if clash:
        raise ValueError(
            f"input already has reserved column(s) {sorted(clash)}; "
            "rename or drop them before assign_min_dist"
        )
    vec = F.col(vec_col).cast("array<double>")
    d2 = _dist2_all(vec, cents)
    return df.withColumn("__d2", d2).select(
        *df.columns,
        (F.array_position("__d2", F.array_min("__d2")) - 1)
        .cast("int")
        .alias("cluster"),
        F.array_min("__d2").alias("dist2"),
    )


def seed_first_k(
    df: DataFrame, k: int, id_col: str, vec_col: str
) -> list[list[float]]:
    rows = (
        df.orderBy(id_col).limit(k).select(vec_col).collect()
    )
    return [[float(x) for x in r[0]] for r in rows]


def seed_maxmin(
    df: DataFrame, k: int, id_col: str, vec_col: str
) -> list[list[float]]:
    """Deterministic k-means++-style D² seeding: the first seed is the
    lowest-id vector; each next seed is the vector MAXIMIZING the min
    squared distance to the seeds chosen so far (the Gonzalez maxmin
    traversal — k-means++ with the D² sampling derandomized to its
    mode, which keeps it SQL-reproducible: no RNG anywhere).

    Cross-engine determinism contract: the argmax binds on the
    4dp-biased-rounded distance (same rounding as
    plans/catalog.biased_round) with ties broken toward the lowest id,
    so Spark and the DuckDB oracle select identical seeds despite
    last-ulp float differences; the certified inertia then sums RAW
    distances, rounded once at the end like every other float output.

    Scale shape: k driver-bounded rounds, each ONE distributed job
    (distances to <= k literal centroids, a top-1 sort); only k x dim
    doubles accumulate on the driver. At large k a production variant
    carries the running min-distance as a persisted column instead of
    recomputing k distances per round (O(nk) total instead of O(nk²));
    at certification k the recompute keeps the operator stateless.

    seed_first_k remains the certified default (inv_kmeans_monotone);
    this lane fixes its adversarial weakness — first-k seeds can all
    land in one true cluster, maxmin seeds provably spread (every new
    seed is the farthest point from the chosen set).
    """
    from economic_data_etl_spark.plans.catalog import biased_round

    first = df.orderBy(id_col).limit(1).select(vec_col).collect()
    if not first or k < 1:
        return []
    cents = [[float(x) for x in first[0][0]]]
    vec = F.col(vec_col).cast("array<double>")
    for _ in range(1, k):
        d2 = F.array_min(_dist2_all(vec, cents))
        row = (
            df.select(F.col(id_col), F.col(vec_col), d2.alias("__d2"))
            .orderBy(
                F.desc(biased_round(F.col("__d2"))), F.asc(id_col)
            )
            .limit(1)
            .collect()
        )
        if not row:
            break
        cents.append([float(x) for x in row[0][1]])
    return cents


def lloyd_kmeans(
    df: DataFrame,
    k: int,
    iters: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seeding: str = "first_k",
) -> tuple[DataFrame, list[list[float]], list[float]]:
    """Full-corpus Lloyd: returns (assignments DataFrame with
    `cluster`/`dist2` against the FINAL centroids, the final centroid
    matrix, and the inertia measured before each update round —
    inertia[0] is the seeded-centroid SSE).

    One distributed job per round; driver state is k x (dim + 2)
    doubles. With exact-real arithmetic Lloyd's inertia is
    non-increasing; float64 reproduces that here to ~1e-9 relative
    (certified by inv_kmeans_monotone).
    """
    if seeding == "first_k":
        cents = seed_first_k(df, k, id_col, vec_col)
    elif seeding == "maxmin":
        cents = seed_maxmin(df, k, id_col, vec_col)
    else:
        raise ValueError(f"unknown seeding {seeding!r}")
    if not cents:
        empty = df.sparkSession.createDataFrame(
            [], f"{id_col} long, cluster int, dist2 double"
        )
        return empty, [], []
    dim = len(cents[0])
    vec = F.col(vec_col).cast("array<double>")
    inertia: list[float] = []
    for _ in range(iters):
        assigned = assign_min_dist(df, vec_col, cents)
        stats = (
            assigned.groupBy("cluster")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("dist2").alias("sse"),
                *[
                    F.sum(vec[i]).alias(f"s{i}")
                    for i in range(dim)
                ],
            )
            .collect()
        )
        inertia.append(float(sum(r["sse"] for r in stats)))
        new_cents = [list(c) for c in cents]  # empty clusters keep
        for r in stats:
            n = r["n"]
            new_cents[r["cluster"]] = [r[f"s{i}"] / n for i in range(dim)]
        cents = new_cents
    final = assign_min_dist(df, vec_col, cents).select(
        id_col, "cluster", "dist2"
    )
    return final, cents, inertia
