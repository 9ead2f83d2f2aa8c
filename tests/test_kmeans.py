"""Distributed Lloyd k-means: recovery of planted clusters, monotone
inertia, deterministic tie-breaks, and the bounded-driver contract."""

from __future__ import annotations

import numpy as np

from economic_data_etl_spark.operators.kmeans import (
    assign_min_dist,
    lloyd_kmeans,
)


def _planted(spark, n_per=40, dim=8, spread=0.05):
    """Three well-separated planted clusters; first 3 ids (the seeds)
    land in distinct clusters so Lloyd must recover the planting."""
    rng = np.random.RandomState(7)
    centers = np.array(
        [[5.0] * dim, [-5.0] * dim, [5.0] * 4 + [-5.0] * 4]
    )
    rows = []
    vid = 0
    for rep in range(n_per):
        for c in range(3):
            v = centers[c] + rng.randn(dim) * spread
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
        centers,
    )


def test_recovers_planted_clusters(spark):
    df, centers = _planted(spark)
    assigned, cents, hist = lloyd_kmeans(df, k=3, iters=5)
    # inertia non-increasing and sharply improved over the seeds
    assert all(hist[i + 1] <= hist[i] * (1 + 1e-9) for i in range(4))
    assert hist[-1] < hist[0]
    # final centroids sit on the planted centers
    got = sorted(tuple(round(x) for x in c) for c in cents)
    want = sorted(tuple(int(x) for x in c) for c in centers)
    assert got == want
    # every planted group is pure: 3 clusters x 40 members
    sizes = sorted(
        r["count"] for r in assigned.groupBy("cluster").count().collect()
    )
    assert sizes == [40, 40, 40]


def test_assignment_tie_breaks_to_lowest_cluster(spark):
    df = spark.createDataFrame(
        [(0, [0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    # two identical centroids -> argmin must pick cluster 0
    out = assign_min_dist(df, "embedding", [[1.0, 0.0], [1.0, 0.0]]).collect()
    assert out[0].cluster == 0 and abs(out[0].dist2 - 1.0) < 1e-12


def test_empty_corpus_and_empty_cluster(spark):
    empty = spark.createDataFrame(
        [], "vec_id long, embedding array<double>"
    )
    assigned, cents, hist = lloyd_kmeans(empty, k=3, iters=2)
    assert assigned.count() == 0 and cents == [] and hist == []
    # k=3 over 2 distinct points: one cluster necessarily empties and
    # must keep its previous centroid instead of crashing
    two = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [0.0, 0.0]), (2, [9.0, 9.0])],
        "vec_id long, embedding array<double>",
    )
    assigned, cents, hist = lloyd_kmeans(two, k=3, iters=3)
    assert assigned.count() == 3 and len(cents) == 3
    assert all(hist[i + 1] <= hist[i] * (1 + 1e-9) for i in range(2))
