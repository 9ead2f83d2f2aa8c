"""SemDeDup semantic dedup: the approximation is measured, not assumed.

The operator only generates pairs WITHIN a cluster; the quality claim is
that near-dup pairs (high cosine) rarely straddle cluster boundaries.
Pin recall against the exact O(n²) pairwise baseline, and check the
keep-set algebra (kept + dropped = corpus; no kept vector is the higher
twin of another kept vector in-cluster)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from economic_data_etl_spark.operators.semantic import (
    assign_clusters_cosine,
    seed_centroids,
    semantic_dedup_keep,
    semantic_dedup_summary,
    semantic_near_dup_pairs,
)
from economic_data_etl_spark.operators.similarity import (
    cosine_near_dup_pairs,
)
from economic_data_etl_spark.sources.tables import load_table

TAU = 0.4


def test_threshold_margin(spark, sf_dir):
    """Every pairwise cosine must sit >= 1e-6 away from the 0.4
    threshold: the Spark plan scores dot(normalize(a), normalize(b))
    while the DuckDB oracle scores dot(a,b)/(|a||b|) — equal in exact
    arithmetic, last-ulp different in float64 — so a score within ulps
    of the threshold could make pair MEMBERSHIP diverge cross-engine.
    This pins that no data score is anywhere near the cliff (ulps are
    ~1e-16; the margin is 10 orders of magnitude wider)."""
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings")
    vecs = np.array(
        [r[0] for r in emb.select("embedding").collect()], dtype=np.float64
    )
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    cos = vecs @ vecs.T
    iu = np.triu_indices(len(vecs), k=1)
    assert np.min(np.abs(cos[iu] - TAU)) >= 1e-6


class TestSemanticDedup:
    def test_recall_vs_exact_pairs(self, spark, sf_dir):
        emb = load_table(spark, sf_dir, "embeddings")
        cents = seed_centroids(emb, 8)
        approx = {
            (r["id_a"], r["id_b"])
            for r in semantic_near_dup_pairs(
                emb, cents, TAU, probes=3
            ).collect()
        }
        exact = {
            (r["id_a"], r["id_b"])
            for r in cosine_near_dup_pairs(emb, threshold=TAU).collect()
        }
        assert approx <= exact  # never invents pairs
        recall = len(approx) / len(exact) if exact else 1.0
        # k=8 probes=3: measured 0.92 at sf0.001 on the WEAK-pair case
        # (τ=0.4; true dups would cluster together far more reliably).
        # Pin a floor so a regression fails loudly.
        assert recall >= 0.8, f"recall {recall} ({len(approx)}/{len(exact)})"

    def test_lloyd_refinement_does_not_lose_pairs_wholesale(
        self, spark, sf_dir
    ):
        from economic_data_etl_spark.operators.ivf import train_ivf

        emb = load_table(spark, sf_dir, "embeddings")
        refined = train_ivf(emb, k=8, iters=2)
        pairs = semantic_near_dup_pairs(
            emb, refined, TAU, probes=3
        ).count()
        exact = cosine_near_dup_pairs(emb, threshold=TAU).count()
        assert pairs / exact >= 0.8 if exact else True

    def test_keep_set_algebra(self, spark, sf_dir):
        emb = load_table(spark, sf_dir, "embeddings")
        kept = semantic_dedup_keep(emb, k=8, iters=0, threshold=TAU)
        summary = semantic_dedup_summary(
            emb, k=8, iters=0, threshold=TAU
        )
        tot = summary.agg(
            F.sum("n_vectors").alias("n"), F.sum("n_dropped").alias("d")
        ).collect()[0]
        assert tot["n"] == emb.count()
        assert kept.count() == tot["n"] - tot["d"]
        # no kept vector is the higher twin of another kept vector
        cents = seed_centroids(emb, 8)
        kept_ids = {r["vec_id"] for r in kept.select("vec_id").collect()}
        for r in semantic_near_dup_pairs(
            emb, cents, TAU, probes=3
        ).collect():
            assert not (
                r["id_a"] in kept_ids and r["id_b"] in kept_ids
            ), f"pair {r} fully kept"

    def test_assignment_is_total_and_stable(self, spark, sf_dir):
        emb = load_table(spark, sf_dir, "embeddings")
        cents = seed_centroids(emb, 8)
        a1 = assign_clusters_cosine(emb, cents)
        assert a1.filter(F.col("cluster").isNull()).count() == 0
        assert a1.filter(
            (F.col("cluster") < 0) | (F.col("cluster") >= 8)
        ).count() == 0

    @pytest.mark.slow
    def test_vectorized_assignment_matches_expression_k256(
        self, spark, sf_dir
    ):
        """The broadcast-centroid numpy path (auto-selected above
        VECTORIZED_K_THRESHOLD) must produce the SAME top-p assignment
        as the expression path — same argmax, same tie-break to lowest
        cluster id — so near-dup pair sets are identical at k ~ sqrt(n)
        scale."""
        emb = load_table(spark, sf_dir, "embeddings")
        k = min(256, emb.count())
        cents = seed_centroids(emb, k)
        assert len(cents) > 64  # must actually cross the threshold
        for probes in (1, 3):
            expr = assign_clusters_cosine(
                emb, cents, probes=probes, vectorized=False
            ).select("vec_id", "cluster")
            vec = assign_clusters_cosine(
                emb, cents, probes=probes, vectorized=True
            ).select("vec_id", "cluster")
            e = {(r[0], r[1]) for r in expr.collect()}
            v = {(r[0], r[1]) for r in vec.collect()}
            assert e == v, (
                f"probes={probes}: {len(e ^ v)} assignment diffs"
            )

    @pytest.mark.slow
    def test_vectorized_pairs_match_expression_k256(self, spark, sf_dir):
        emb = load_table(spark, sf_dir, "embeddings")
        k = min(256, emb.count())
        cents = seed_centroids(emb, k)
        # auto-selection: k=256 > threshold → vectorized under the hood
        auto = {
            (r["id_a"], r["id_b"])
            for r in semantic_near_dup_pairs(
                emb, cents, TAU, probes=3
            ).collect()
        }
        # force the expression path for the same centroids
        from economic_data_etl_spark.operators import semantic as sem

        orig = sem.VECTORIZED_K_THRESHOLD
        sem.VECTORIZED_K_THRESHOLD = 10**9
        try:
            expr = {
                (r["id_a"], r["id_b"])
                for r in semantic_near_dup_pairs(
                    emb, cents, TAU, probes=3
                ).collect()
            }
        finally:
            sem.VECTORIZED_K_THRESHOLD = orig
        assert auto == expr

    @pytest.mark.slow
    def test_vectorized_assignment_matches_expression_k1024_dim128(
        self, spark
    ):
        """The regime VECTORIZED_K_THRESHOLD exists for: k=1024,
        dim=128 (the SemDeDup k ~ √n shape for a ~1M-doc shard). The
        expression lane needs ~131 s just to plan+codegen the
        1024-struct ranking tree (row count irrelevant — a 50-row
        corpus suffices to prove identity), the numpy lane ~3 s; the
        assignments must still be IDENTICAL, which is the license for
        the automatic lane switch. Slow-marked: the expression side's
        planning cost IS the measurement."""
        import numpy as np

        rng = np.random.default_rng(7)
        n, dim, k = 50, 128, 1024
        M = rng.normal(size=(n, dim))
        C = rng.normal(size=(k, dim))
        emb = spark.createDataFrame(
            [(i, M[i].tolist()) for i in range(n)],
            "vec_id long, embedding array<double>",
        )
        cents = [C[i].tolist() for i in range(k)]
        vec = {
            (r["vec_id"], r["cluster"])
            for r in assign_clusters_cosine(
                emb, cents, probes=3, vectorized=True
            ).collect()
        }
        expr = {
            (r["vec_id"], r["cluster"])
            for r in assign_clusters_cosine(
                emb, cents, probes=3, vectorized=False
            ).collect()
        }
        assert vec == expr

    def test_vectorized_lanes_tolerate_null_and_ragged_vectors(
        self, spark
    ):
        """Round-4 advice: a single NULL or wrong-dimension embedding
        must not crash the numpy lanes (np.stack ValueError) — the
        vectorized path is AUTO-selected at k>64, so NULL tolerance is
        a correctness property, not a nicety. NULL/ragged vectors get
        the same verdicts the expression path gives them: ascending
        cluster ids for the assignment (all cosines undefined), and
        NULL dot → pair dropped for scoring."""
        rows = [
            (0, [1.0, 0.0]),
            (1, None),             # NULL vector
            (2, [1.0]),            # wrong dimension (short)
            (3, [0.0, 0.0]),       # zero norm
            (4, [1.0, 0.05]),      # near-dup of 0
            (5, [1.0, 0.0, 0.0]),  # wrong dimension (LONG — a scalar
            # component lane that truncated instead of nulling would
            # wrongly score this against 0/4)
        ]
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        cents = [[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]]
        expr = assign_clusters_cosine(
            emb, cents, probes=2, vectorized=False
        ).select("vec_id", "cluster")
        vec = assign_clusters_cosine(
            emb, cents, probes=2, vectorized=True
        ).select("vec_id", "cluster")
        assert {tuple(r) for r in expr.collect()} == {
            tuple(r) for r in vec.collect()
        }
        # pair scoring: NULL/ragged sides must be silently dropped in
        # BOTH lanes (NaN→NULL through Arrow; NULL >= τ is false).
        for vs in (False, True):
            pairs = {
                (r["id_a"], r["id_b"])
                for r in semantic_near_dup_pairs(
                    emb, cents, TAU, probes=2, vectorized_scoring=vs
                ).collect()
            }
            assert (0, 4) in pairs
            assert not any(
                1 in p or 2 in p or 5 in p for p in pairs
            ), pairs
        # the bucketed scalar-component lane enforces the same
        # dimension contract (component 0 nulls on size mismatch)
        from economic_data_etl_spark.operators.semantic import (
            semantic_near_dup_pairs_from_bucketed,
            write_assignment_bucketed,
        )

        write_assignment_bucketed(
            emb, cents, "t_sem_ragged_bucketed", probes=2, num_buckets=2
        )
        bucketed = {
            (r["id_a"], r["id_b"])
            for r in semantic_near_dup_pairs_from_bucketed(
                spark, "t_sem_ragged_bucketed", threshold=TAU
            ).collect()
        }
        assert (0, 4) in bucketed
        assert not any(
            1 in p or 2 in p or 5 in p for p in bucketed
        ), bucketed

    def test_vectorized_assignment_broadcast_is_released(self, spark):
        """The centroid broadcast created by the vectorized lane must be
        handed to the caller-owned resource list so long-lived sessions
        can release it (round-4 advice: broadcast-block leak)."""
        from economic_data_etl_spark.operators.semantic import (
            assign_topp_clusters,
        )
        from pyspark.broadcast import Broadcast

        emb = spark.createDataFrame(
            [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
            "vec_id long, embedding array<double>",
        )
        resources: list = []
        out = assign_topp_clusters(
            emb,
            [[1.0, 0.0], [0.0, 1.0]],
            probes=1,
            vectorized=True,
            _resources=resources,
        )
        assert out.count() == 2
        bcs = [r for r in resources if isinstance(r, Broadcast)]
        assert len(bcs) == 1
        bcs[0].unpersist()  # the cleanup call every cache-owner makes

    def test_incremental_equals_full_minus_index_only(self, spark, sf_dir):
        from economic_data_etl_spark.operators.semantic import (
            semantic_incremental_pairs,
        )

        emb = load_table(spark, sf_dir, "embeddings")
        index = emb.filter(F.col("vec_id") < 400)
        batch = emb.filter(F.col("vec_id") >= 400)
        cents = seed_centroids(index, 8)  # == first 8 of the full corpus

        inc = {
            (r["id_a"], r["id_b"])
            for r in semantic_incremental_pairs(
                index, batch, cents, TAU, probes=3
            ).collect()
        }
        full = {
            (r["id_a"], r["id_b"])
            for r in semantic_near_dup_pairs(
                emb, cents, TAU, probes=3
            ).collect()
        }
        index_only = {
            (a, b) for a, b in full if a < 400 and b < 400
        }
        assert inc == full - index_only
        assert inc, "fixture must produce at least one incremental pair"

    def test_bucketed_layout_pairs_identical_to_in_memory(
        self, spark, sf_dir
    ):
        """The cluster-bucketed storage path (write once bucketed by
        cluster, self-join the buckets) must produce EXACTLY the pair
        set of the in-memory operator — the layout changes where the
        shuffle happens (write time vs query time), never the answer."""
        from economic_data_etl_spark.operators.semantic import (
            semantic_near_dup_pairs_from_bucketed,
            write_assignment_bucketed,
        )

        emb = load_table(spark, sf_dir, "embeddings")
        cents = seed_centroids(emb, 8)
        write_assignment_bucketed(
            emb, cents, "t_sem_bucketed_pairs", probes=3, num_buckets=8
        )
        bucketed = {
            (r["id_a"], r["id_b"])
            for r in semantic_near_dup_pairs_from_bucketed(
                spark, "t_sem_bucketed_pairs", threshold=TAU
            ).collect()
        }
        memory = {
            (r["id_a"], r["id_b"])
            for r in semantic_near_dup_pairs(
                emb, cents, TAU, probes=3
            ).collect()
        }
        assert bucketed == memory
        assert bucketed, "fixture must produce pairs"

    def test_bucketed_layout_incremental_append(self, spark, sf_dir):
        """The maintenance path: append an ingest batch's assignment to
        the EXISTING bucketed layout (same bucket spec, frozen
        centroids) — pairs over the appended table must equal the
        in-memory operator over the full corpus, and the self-join must
        STAY Exchange-free (the appended files are bucketed too, so the
        scan keeps its HashPartitioning guarantee)."""
        import contextlib
        import io

        from economic_data_etl_spark.operators.semantic import (
            append_assignment_bucketed,
            semantic_near_dup_pairs_from_bucketed,
            write_assignment_bucketed,
        )

        emb = load_table(spark, sf_dir, "embeddings")
        base = emb.filter(F.col("vec_id") < 300)
        batch = emb.filter(F.col("vec_id") >= 300)
        cents = seed_centroids(emb, 8)  # frozen, shared by both writes
        tbl = "t_sem_bucketed_append"
        write_assignment_bucketed(
            base, cents, tbl, probes=3, num_buckets=8
        )
        append_assignment_bucketed(
            batch, cents, tbl, probes=3, num_buckets=8
        )
        got = {
            (r["id_a"], r["id_b"])
            for r in semantic_near_dup_pairs_from_bucketed(
                spark, tbl, threshold=TAU
            ).collect()
        }
        want = {
            (r["id_a"], r["id_b"])
            for r in semantic_near_dup_pairs(
                emb, cents, TAU, probes=3
            ).collect()
        }
        assert got == want
        assert any(a < 300 <= b for a, b in got), (
            "fixture must produce at least one cross-increment pair"
        )
        saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            t = spark.table(tbl)
            j = t.select("cluster", F.col("__id").alias("id_a")).join(
                t.select("cluster", F.col("__id").alias("id_b")),
                "cluster",
            )
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                j.explain("formatted")
            plan = buf.getvalue()
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan, plan
        finally:
            spark.conf.set(
                "spark.sql.autoBroadcastJoinThreshold", saved
            )

    def test_bucketed_layout_array_fallback_above_dim_threshold(
        self, spark
    ):
        """dim > SCALAR_DOT_MAX_DIM must fall back to the `__nv` array
        layout (a thousand-term codegen chain would blow the JVM method
        budget) and the fold-scored pair pass must still match the
        in-memory operator — both layouts, one contract."""
        import numpy as np

        from economic_data_etl_spark.operators.semantic import (
            SCALAR_DOT_MAX_DIM,
            semantic_near_dup_pairs_from_bucketed,
            write_assignment_bucketed,
        )

        dim = SCALAR_DOT_MAX_DIM + 2
        rng = np.random.default_rng(5)
        base = rng.normal(size=(4, dim))
        rows = []
        for i in range(40):
            v = base[i % 4] + rng.normal(scale=0.05, size=dim)
            rows.append((i, [float(x) for x in v]))
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        cents = seed_centroids(emb, 4)
        tbl = "t_sem_bucketed_highdim"
        write_assignment_bucketed(emb, cents, tbl, probes=2, num_buckets=4)
        t = spark.table(tbl)
        assert "__nv" in t.columns, "high-dim layout must store the array"
        assert not any(c.startswith("__nv") and c != "__nv" for c in t.columns)
        got = {
            (r["id_a"], r["id_b"])
            for r in semantic_near_dup_pairs_from_bucketed(
                spark, tbl, threshold=TAU
            ).collect()
        }
        want = {
            (r["id_a"], r["id_b"])
            for r in semantic_near_dup_pairs(
                emb, cents, TAU, probes=2
            ).collect()
        }
        assert got == want
        assert got, "fixture must produce pairs"

    def test_bucketed_layout_append_compact_cycle(self, spark, sf_dir):
        """The FULL maintenance cycle the layout's economics rely on:
        build → append ×3 (small files accrete, num_buckets per append)
        → compact back to ONE file per bucket. The pair set must equal
        the full in-memory recompute at every step, and the self-join
        must stay Exchange-free both while fragmented and after the
        compaction rewrite — compaction bounds small-file overhead
        without ever touching the answer or the plan shape."""
        import contextlib
        import io

        from economic_data_etl_spark.operators.semantic import (
            append_assignment_bucketed,
            compact_assignment_bucketed,
            semantic_near_dup_pairs_from_bucketed,
            write_assignment_bucketed,
        )

        emb = load_table(spark, sf_dir, "embeddings")
        cents = seed_centroids(emb, 8)  # frozen across the whole cycle
        tbl = "t_sem_bucketed_cycle"
        nb = 8
        cuts = [150, 250, 350]
        write_assignment_bucketed(
            emb.filter(F.col("vec_id") < cuts[0]),
            cents, tbl, probes=3, num_buckets=nb,
        )
        for lo, hi in zip(cuts, cuts[1:] + [None]):
            cond = F.col("vec_id") >= lo
            if hi is not None:
                cond = cond & (F.col("vec_id") < hi)
            append_assignment_bucketed(
                emb.filter(cond), cents, tbl, probes=3, num_buckets=nb
            )

        want = {
            (r["id_a"], r["id_b"])
            for r in semantic_near_dup_pairs(
                emb, cents, TAU, probes=3
            ).collect()
        }

        def pairs():
            return {
                (r["id_a"], r["id_b"])
                for r in semantic_near_dup_pairs_from_bucketed(
                    spark, tbl, threshold=TAU
                ).collect()
            }

        def plan_no_exchange():
            saved = spark.conf.get(
                "spark.sql.autoBroadcastJoinThreshold"
            )
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            try:
                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    semantic_near_dup_pairs_from_bucketed(
                        spark, tbl, threshold=TAU
                    ).explain("formatted")
                plan = buf.getvalue()
                assert "Exchange" not in plan, plan
            finally:
                spark.conf.set(
                    "spark.sql.autoBroadcastJoinThreshold", saved
                )

        # fragmented: base + 3 appends → up to 4×nb files, still
        # correct and still Exchange-free
        n_files_fragmented = len(spark.table(tbl).inputFiles())
        assert n_files_fragmented > nb, "appends must accrete files"
        assert pairs() == want
        plan_no_exchange()

        compact_assignment_bucketed(spark, tbl, num_buckets=nb)
        n_after = len(spark.table(tbl).inputFiles())
        assert n_after <= nb < n_files_fragmented, (
            f"compaction must restore at most one file per bucket "
            f"(got {n_after} files for {nb} buckets, "
            f"was {n_files_fragmented} fragmented)"
        )
        assert pairs() == want
        plan_no_exchange()
        assert any(a < cuts[0] <= b for a, b in want), (
            "fixture must produce at least one cross-increment pair"
        )

    def test_vectorized_scoring_matches_expression(self, spark, sf_dir):
        """The einsum pair-scoring lane must produce the SAME pair set
        as the expression dot-product fold (same candidates, same
        threshold verdicts) on the test corpus."""
        emb = load_table(spark, sf_dir, "embeddings")
        cents = seed_centroids(emb, 16)
        expr = {
            (r["id_a"], r["id_b"])
            for r in semantic_near_dup_pairs(
                emb, cents, TAU, probes=3
            ).collect()
        }
        vec = {
            (r["id_a"], r["id_b"])
            for r in semantic_near_dup_pairs(
                emb, cents, TAU, probes=3, vectorized_scoring=True
            ).collect()
        }
        assert expr == vec
        assert expr, "fixture must produce pairs"

    def test_compaction_interrupted_swap_recovers(self, spark, sf_dir):
        """ADVICE r6 (semantic.py:855): compaction's target rewrite
        drops `table_name` before re-creating it from the stage — a
        crash in that window used to leave the ONLY copy in
        `<table>_compacting` with no recovery path. Simulate the
        crash state exactly (stage fully written, target dropped) and
        assert the next compact_assignment_bucketed call restores the
        target with the identical pair set and a compacted layout —
        mirroring the trending sink's interrupted-swap recovery."""
        from economic_data_etl_spark.operators.semantic import (
            compact_assignment_bucketed,
            semantic_near_dup_pairs_from_bucketed,
            write_assignment_bucketed,
        )
        from economic_data_etl_spark.operators.skew import write_bucketed

        emb = load_table(spark, sf_dir, "embeddings")
        cents = seed_centroids(emb, 8)
        tbl = "t_sem_bucketed_crash"
        nb = 8
        write_assignment_bucketed(emb, cents, tbl, probes=2, num_buckets=nb)
        want = {
            (r["id_a"], r["id_b"])
            for r in semantic_near_dup_pairs_from_bucketed(
                spark, tbl, threshold=TAU
            ).collect()
        }
        assert want, "fixture must produce pairs"

        # reproduce the crash window: stage written, target dropped
        # (write_bucketed's own first step), process "dies" before the
        # target is re-created
        conf_key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
        saved = spark.conf.get(conf_key)
        spark.conf.set(conf_key, "false")
        try:
            write_bucketed(
                spark.table(tbl), f"{tbl}_compacting", "cluster", nb
            )
        finally:
            spark.conf.set(conf_key, saved)
        spark.sql(f"DROP TABLE `{tbl}`")
        assert not spark.catalog.tableExists(tbl)

        compact_assignment_bucketed(spark, tbl, num_buckets=nb)
        assert spark.catalog.tableExists(tbl)
        assert not spark.catalog.tableExists(f"{tbl}_compacting")
        assert len(spark.table(tbl).inputFiles()) <= nb
        got = {
            (r["id_a"], r["id_b"])
            for r in semantic_near_dup_pairs_from_bucketed(
                spark, tbl, threshold=TAU
            ).collect()
        }
        assert got == want


def test_compaction_crash_at_any_offset_recovers(spark, sf_dir):
    """Property over the WHOLE compaction crash window (round-7 advice:
    mirror the trending sink's test_crash_at_any_offset_recovers). The
    compaction sequence is write(table->stage) -> write(stage->target,
    which internally DROPS the target first) -> DROP stage. A crash
    after ANY of those steps — including mid-rewrite of the target,
    which leaves the table dropped and an orphaned partial directory —
    followed by a retry of compact_assignment_bucketed, must converge
    to the compacted layout with the identical pair set. The single
    offset pinned by test_compaction_interrupted_swap_recovers is
    'mid_write2' here; this covers every other offset, with appends
    interleaved between cycles so recovery is tested against a
    GROWING table, not just the build."""
    import itertools
    import os
    import shutil
    from urllib.parse import urlparse

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from economic_data_etl_spark.operators import skew
    from economic_data_etl_spark.operators.semantic import (
        append_assignment_bucketed,
        compact_assignment_bucketed,
        semantic_near_dup_pairs_from_bucketed,
        write_assignment_bucketed,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cents = seed_centroids(emb, 8)
    nb = 8
    counter = itertools.count()

    class Killed(RuntimeError):
        pass

    def table_dir(tbl: str) -> str:
        db = spark.catalog.currentDatabase()
        for r in spark.sql(f"DESCRIBE DATABASE `{db}`").collect():
            if r[0].strip().lower().startswith("location"):
                loc = r[1]
                return os.path.join(
                    urlparse(loc).path or loc, tbl.lower()
                )
        raise AssertionError("no database location")

    real_write = skew.write_bucketed

    @settings(
        max_examples=3,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(data=st.data())
    def run(data):
        tbl = f"t_sem_crash_fuzz_{next(counter)}"
        cuts = [0, 150, 300, 500]
        write_assignment_bucketed(
            emb.filter(F.col("vec_id") < cuts[1]),
            cents, tbl, probes=3, num_buckets=nb,
        )
        n_rounds = data.draw(st.integers(1, 2))
        hi = cuts[1]
        for rnd in range(n_rounds):
            lo, hi = cuts[rnd + 1], cuts[rnd + 2]
            append_assignment_bucketed(
                emb.filter(
                    (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
                ),
                cents, tbl, probes=3, num_buckets=nb,
            )
            crash = data.draw(
                st.sampled_from(
                    [
                        "none",
                        "before_write1",
                        "before_write2",
                        "mid_write2",
                        "before_stage_drop",
                    ]
                )
            )
            calls = {"n": 0}

            def hooked_write(df, table_name, bucket_col, num_buckets=16,
                             sort_col=None, _crash=crash, _calls=calls):
                if _crash == "before_write1" and _calls["n"] == 0:
                    raise Killed()
                if _crash in ("before_write2", "mid_write2") and (
                    _calls["n"] == 1
                ):
                    if _crash == "mid_write2":
                        # reproduce a die mid-saveAsTable: target
                        # dropped, partial orphan directory on disk
                        parts = [
                            p.strip("`")
                            for p in table_name.split(".")
                        ]
                        spark.sql(
                            f"DROP TABLE IF EXISTS `{parts[-1]}`"
                        )
                        d = table_dir(parts[-1])
                        os.makedirs(d, exist_ok=True)
                        with open(
                            os.path.join(d, "part-junk.parquet"), "wb"
                        ) as f:
                            f.write(b"not parquet")
                    raise Killed()
                real_write(
                    df, table_name, bucket_col, num_buckets, sort_col
                )
                _calls["n"] += 1

            real_sql = spark.sql

            def hooked_sql(q, *a, _crash=crash, _calls=calls, **kw):
                if (
                    _crash == "before_stage_drop"
                    and _calls["n"] >= 2
                    and q.lstrip().upper().startswith("DROP TABLE")
                    and "compacting" in q
                ):
                    raise Killed()
                return real_sql(q, *a, **kw)

            skew.write_bucketed = hooked_write
            spark.sql = hooked_sql
            try:
                compact_assignment_bucketed(spark, tbl, num_buckets=nb)
                assert crash == "none"
            except Killed:
                assert crash != "none"
            finally:
                skew.write_bucketed = real_write
                del spark.sql  # restore the class-bound method

            # the conf toggled inside compact must be restored even on
            # a crash (finally-block contract)
            assert (
                spark.conf.get(
                    "spark.sql.sources.bucketing."
                    "autoBucketedScan.enabled"
                )
                == "true"
            )
            # retry (the recovery path the next maintenance run takes)
            compact_assignment_bucketed(spark, tbl, num_buckets=nb)
            assert spark.catalog.tableExists(tbl)
            assert not spark.catalog.tableExists(f"{tbl}_compacting")
            assert len(spark.table(tbl).inputFiles()) <= nb
            want = {
                (r["id_a"], r["id_b"])
                for r in semantic_near_dup_pairs(
                    emb.filter(F.col("vec_id") < hi),
                    cents, TAU, probes=3,
                ).collect()
            }
            got = {
                (r["id_a"], r["id_b"])
                for r in semantic_near_dup_pairs_from_bucketed(
                    spark, tbl, threshold=TAU
                ).collect()
            }
            assert got == want
        spark.sql(f"DROP TABLE IF EXISTS `{tbl}`")
        loc = table_dir(tbl)
        if os.path.isdir(loc):
            shutil.rmtree(loc, ignore_errors=True)

    run()
