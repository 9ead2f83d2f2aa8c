"""Distributed Lloyd k-means: recovery of planted clusters, monotone
inertia, deterministic tie-breaks, the bounded-driver contract, and
the maxmin (derandomized k-means++) seeding lane."""

from __future__ import annotations

import numpy as np
import pytest

from economic_data_etl_spark.operators.kmeans import (
    assign_min_dist,
    lloyd_kmeans,
    seed_first_k,
    seed_maxmin,
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


def test_assign_rejects_reserved_columns(spark):
    df = spark.createDataFrame(
        [(0, [0.0], 1)], "vec_id long, embedding array<double>, cluster int"
    )
    with pytest.raises(ValueError, match="cluster"):
        assign_min_dist(df, "embedding", [[1.0]])


def _adversarial(spark, n_per=30, dim=4):
    """Three planted clusters where the FIRST k ids all land in the
    same cluster — the exact case first-k seeding handles worst and
    maxmin exists to fix."""
    rng = np.random.RandomState(11)
    centers = np.array([[6.0] * dim, [-6.0] * dim, [6.0] * 2 + [-6.0] * 2])
    rows = []
    vid = 0
    for c in (0, 0, 0):  # first three vectors: all cluster 0
        rows.append(
            (vid, [float(x) for x in centers[c] + rng.randn(dim) * 0.05])
        )
        vid += 1
    for rep in range(n_per):
        for c in range(3):
            rows.append(
                (
                    vid,
                    [float(x) for x in centers[c] + rng.randn(dim) * 0.05],
                )
            )
            vid += 1
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
        centers,
    )


def test_maxmin_seeds_spread_where_first_k_collapse(spark):
    df, centers = _adversarial(spark)
    first = np.array(seed_first_k(df, 3, "vec_id", "embedding"))
    mm = np.array(seed_maxmin(df, 3, "vec_id", "embedding"))
    # first-k: all three seeds in planted cluster 0 (pairwise close)
    assert np.linalg.norm(first - first[0], axis=1).max() < 1.0
    # maxmin: one seed per planted cluster (each seed near a distinct
    # center)
    nearest = {
        int(np.argmin(np.linalg.norm(centers - s, axis=1))) for s in mm
    }
    assert nearest == {0, 1, 2}
    # the maxmin SEEDED SSE is strictly better (one seed per planted
    # cluster vs three in one); after Lloyd refinement it stays at
    # least as good (here first-k happens to escape via the
    # empty-cluster rule and both converge to the planting)
    _, _, hist_mm = lloyd_kmeans(df, 3, 4, seeding="maxmin")
    _, _, hist_fk = lloyd_kmeans(df, 3, 4, seeding="first_k")
    assert all(
        hist_mm[i + 1] <= hist_mm[i] * (1 + 1e-9) for i in range(3)
    )
    assert hist_mm[0] < hist_fk[0]
    assert hist_mm[-1] <= hist_fk[-1] * (1 + 1e-9)


def test_maxmin_determinism_and_distinct_seeds(spark):
    df, _ = _planted(spark)
    a = seed_maxmin(df, 3, "vec_id", "embedding")
    b = seed_maxmin(df, 3, "vec_id", "embedding")
    assert a == b  # no RNG anywhere
    assert len({tuple(s) for s in a}) == 3  # pairwise distinct


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
