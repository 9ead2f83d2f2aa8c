"""Plan-shape regression tests: the scale properties this engine promises
(pushdown, pruning, broadcast joins, window group limits) must survive
refactors. A query can be value-correct and still regress to a plan that
dies at 100x the data — these tests pin the plan."""

from __future__ import annotations

import contextlib
import io

import pytest

from economic_data_etl_spark.plans import REGISTRY


def _plan(spark, sf_dir, name: str) -> str:
    df = REGISTRY[name].spark(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _explain(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@contextlib.contextmanager
def _conf(spark, key: str, value: str):
    saved = spark.conf.get(key, None)
    spark.conf.set(key, value)
    try:
        yield
    finally:
        if saved is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, saved)


class TestPlanShapes:
    def test_q1_filter_pushed_to_scan(self, spark, sf_dir):
        plan = _plan(spark, sf_dir, "q1_pricing_summary")
        assert "LessThanOrEqual(l_shipdate" in plan  # PushedFilters

    def test_q1_column_pruning(self, spark, sf_dir):
        plan = _plan(spark, sf_dir, "q1_pricing_summary")
        read = next(l for l in plan.splitlines() if "ReadSchema" in l)
        assert "l_orderkey" not in read  # unused columns pruned from the scan

    def test_q6_all_predicates_pushed(self, spark, sf_dir):
        plan = _plan(spark, sf_dir, "q6_forecast_revenue")
        pushed = next(l for l in plan.splitlines() if "PushedFilters" in l)
        for frag in ("l_shipdate", "l_discount", "l_quantity"):
            assert frag in pushed

    def test_q5_dimension_joins_broadcast(self, spark, sf_dir):
        plan = _plan(spark, sf_dir, "q5_region_revenue")
        assert plan.count("BroadcastHashJoin") >= 3  # supplier/nation/region

    def test_semi_and_anti_join_operators(self, spark, sf_dir):
        assert "LeftSemi" in _plan(spark, sf_dir, "join_semi_customers_with_urgent_orders")
        assert "LeftAnti" in _plan(spark, sf_dir, "join_anti_customers_without_orders")

    def test_topk_uses_window_group_limit(self, spark, sf_dir):
        assert "WindowGroupLimit" in _plan(spark, sf_dir, "window_rank_parts_per_brand")

    def test_global_topk_avoids_full_sort(self, spark, sf_dir):
        assert "TakeOrderedAndProject" in _plan(spark, sf_dir, "topk_orders_by_price")

    def test_source_quota_uses_window_group_limit(self, spark, sf_dir):
        """The quota's rank<=k filter must compile to WindowGroupLimit:
        each map task pre-trims to its local top-k per source BEFORE the
        shuffle — the property that keeps a million-doc domain from
        moving wholesale at 100 TB."""
        assert "WindowGroupLimit" in _plan(spark, sf_dir, "curation_source_quota")

    def test_semantic_dedup_assignment_has_no_shuffle_before_pairs(
        self, spark, sf_dir
    ):
        """Cluster assignment is argmax over centroid literals — a pure
        projection. The ONLY shuffles in the pair path key on the
        cluster id (plus the final summary aggs); a cartesian or
        nested-loop join here would be the O(n²) plan the operator
        exists to avoid."""
        plan = _plan(spark, sf_dir, "dedup_semantic_embedding")
        assert "Cartesian" not in plan and "NestedLoop" not in plan

    def test_bucketed_semantic_self_join_has_no_exchange(
        self, spark, sf_dir
    ):
        """The 100 TB claim behind dedup_semantic_bucketed, proven on
        the plan: once the assignment is WRITTEN bucketed by `cluster`,
        the within-cluster self-join consumes the buckets'
        HashPartitioning directly and the canonical-cluster filter
        dedupes pairs without a distinct — the ENTIRE pair pass has NO
        Exchange. (Broadcast is disabled so the small test table takes
        the same SortMergeJoin path a 100 TB table would.)"""
        from pyspark.sql import functions as F

        from economic_data_etl_spark.operators.semantic import (
            seed_centroids,
            semantic_near_dup_pairs_from_bucketed,
            write_assignment_bucketed,
        )
        from economic_data_etl_spark.sources.tables import load_table

        emb = load_table(spark, sf_dir, "embeddings")
        cents = seed_centroids(emb, 8)
        write_assignment_bucketed(
            emb, cents, "t_sem_bucketed_plan", probes=3, num_buckets=8
        )
        with _conf(spark, "spark.sql.autoBroadcastJoinThreshold", "-1"):
            t = spark.table("t_sem_bucketed_plan")
            a = t.select("cluster", F.col("__id").alias("id_a"))
            b = t.select("cluster", F.col("__id").alias("id_b"))
            joined = a.join(b, "cluster").filter(
                F.col("id_a") < F.col("id_b")
            )
            plan = _explain(joined)
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan, plan
            # the FULL operator — join, canonical-cluster pair dedup,
            # scoring — is shuffle-free end to end.
            full = _explain(
                semantic_near_dup_pairs_from_bucketed(
                    spark, "t_sem_bucketed_plan", threshold=0.4
                )
            )
            assert "SortMergeJoin" in full
            assert "Exchange" not in full, full

    def test_asof_join_is_not_a_range_join(self, spark, sf_dir):
        # union+window shape: no BroadcastNestedLoopJoin / CartesianProduct
        plan = _plan(spark, sf_dir, "events_asof_purchase_view")
        assert "NestedLoop" not in plan and "Cartesian" not in plan

    def test_runtime_bloom_filter_prunes_shuffle_join_probe_side(
        self, spark, sf_dir
    ):
        """At cluster scale a fact-fact shuffle join moves the ENTIRE
        probe side even when the build side is selective. Spark's runtime
        bloom filter (injected from the filtered build side into the
        probe scan) is the defense — pin that the optimizer actually
        injects it when a selective filter feeds a shuffle join."""
        from pyspark.sql import functions as F

        from economic_data_etl_spark.sources.tables import load_table

        saved = {
            k: spark.conf.get(k, None)
            for k in (
                "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
                "spark.sql.autoBroadcastJoinThreshold",
            )
        }
        try:
            # thresholds sized for test data; at real scale the defaults
            # (10MB application side) fire on their own
            spark.conf.set(
                "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
                "0",
            )
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            li = load_table(spark, sf_dir, "lineitem")
            orders = load_table(spark, sf_dir, "orders").filter(
                F.col("o_orderpriority") == "1-URGENT"
            )
            j = (
                li.join(orders, li.l_orderkey == orders.o_orderkey)
                .groupBy("o_orderpriority")
                .count()
            )
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                j.explain(True)
            assert "bloom_filter_agg" in buf.getvalue()
        finally:
            for k, v in saved.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)


class TestRound3PlanShapes:
    def test_lateral_topn_decorrelates_to_window_group_limit(
        self, spark, sf_dir
    ):
        """The correlated LATERAL ORDER BY/LIMIT subquery must decorrelate
        to a ranked join with WindowGroupLimit — per-partition top-k
        trimming before any shuffle — not re-execute per outer row."""
        plan = _plan(spark, sf_dir, "sql_lateral_topn_per_nation")
        assert "WindowGroupLimit" in plan
        assert "CartesianProduct" not in plan

    def test_market_basket_self_join_is_keyed(self, spark, sf_dir):
        """Pair generation must join on l_orderkey (hash/broadcast at this
        scale, sort-merge co-partitioned at cluster scale) — never a
        cartesian with the partkey inequality as a post-filter."""
        plan = _plan(spark, sf_dir, "join_market_basket_pairs")
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoop" not in plan

    def test_forward_asof_is_union_window_not_range_join(self, spark, sf_dir):
        plan = _plan(spark, sf_dir, "events_asof_next_view")
        assert "NestedLoop" not in plan and "Cartesian" not in plan

    def test_lm_score_scoring_pass_never_shuffles_corpus(self, spark, sf_dir):
        """Scoring is row-local once the vocab-bounded model is
        broadcast: the returned plan is scan → mapInPandas → one
        per-source aggregation. Exactly one Exchange (the tiny
        source-keyed summary) may appear — a join or doc-keyed
        re-shuffle here is the corpus-scale exchange the operator
        exists to avoid."""
        plan = _plan(spark, sf_dir, "text_lm_quality_score")
        assert "Join" not in plan
        # tree nodes render as "Exchange (n)": summary agg + output sort.
        assert plan.count("Exchange (") <= 2

    def test_keep_latest_compaction_uses_window_group_limit(
        self, spark, sf_dir
    ):
        """rn=1 over (ts desc) must compile to WindowGroupLimit so each
        map task pre-trims to one row per key before the shuffle —
        the property that makes changelog compaction move survivors,
        not the log."""
        plan = _plan(spark, sf_dir, "dedup_keep_latest_per_user")
        assert "WindowGroupLimit" in plan

    def test_novelty_join_is_keyed_not_cartesian(self, spark, sf_dir):
        """The source-count join runs on the shingle key over the
        distinct (source, shingle) set — a cartesian or nested-loop
        here would be corpus², not vocab-bounded."""
        plan = _plan(spark, sf_dir, "text_ngram_novelty_by_source")
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoop" not in plan

    def test_entropy_scan_prunes_to_needed_columns(self, spark, sf_dir):
        plan = _plan(spark, sf_dir, "docs_char_trigram_entropy_by_source")
        read = next(l for l in plan.splitlines() if "ReadSchema" in l)
        assert "text" in read and "source" in read
        assert "doc_id" not in read and "lang" not in read

    def test_quantile_filter_cutoff_join_broadcasts(self, spark, sf_dir):
        """The per-source cutoff table is |sources| rows — it must hash
        to the build side, never re-shuffle the doc-quality side."""
        plan = _plan(spark, sf_dir, "curation_quality_quantile_filter")
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan

    def test_hybrid_rrf_lanes_are_take_ordered_not_global_window(
        self, spark, sf_dir
    ):
        """Every RRF lane cuts to top-K before fusion; the rank<=K
        filter must push a limit BELOW each lane's unpartitioned rank
        window (LimitPushDownThroughWindow -> TakeOrderedAndProject),
        so each map partition ships K rows — never the corpus into one
        task. 3 lanes + the final top-N = at least 4 TakeOrdereds."""
        plan = _plan(spark, sf_dir, "retrieval_hybrid_rrf")
        assert plan.count("TakeOrderedAndProject") >= 4, plan

    def test_hard_negatives_has_no_global_rank_over_corpus(
        self, spark, sf_dir
    ):
        """'Outside the semantic top-k' must be decided by a
        rank-recount (1 + count-ranked-above via broadcast-nested-loop
        with the <=k candidate rows as build), never the r>k complement
        of a corpus row_number (which no group-limit rewrite can
        bound). In the final plan the embeddings corpus feeds ONLY the
        BNLJ scan — zero Window nodes touch it; the BM25 lane's bounded
        rank (limit-pushed TakeOrdered) lives behind the k-row
        candidate checkpoint (Scan ExistingRDD)."""
        import re

        plan = _plan(spark, sf_dir, "retrieval_hard_negatives")
        wins = len(re.findall(r"\bWindow \(\d+\)", plan))
        assert wins == 0, plan
        assert "BroadcastNestedLoopJoin" in plan
        assert "ExistingRDD" in plan  # the checkpointed <=k candidates

    @pytest.mark.parametrize(
        "name", ["features_decile_bins", "agg_gini_revenue_concentration"]
    )
    def test_two_phase_rank_has_no_unpartitioned_window(
        self, spark, sf_dir, name
    ):
        """The two-phase global rank (operators/rank.py) must rank
        through a window PARTITIONED by the literal-driven range bucket
        — exactly one such window, zero windows ordered directly on the
        data columns with no partition (the single-task global sort the
        operator exists to avoid). Bucket assignment compares against
        COLLECTED boundary literals, so no branch depends on exchange
        reuse for consistency."""
        import re

        df = REGISTRY[name].spark(spark, sf_dir)
        df.collect()
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain()
        final = buf.getvalue().split("Initial Plan")[0]
        assert final.count("windowspecdefinition(__b") == 1, final
        assert not re.findall(
            r"windowspecdefinition\((?:o_totalprice|rev)", final
        ), final

    def test_pareto_rank_runs_on_user_table_not_events(self, spark, sf_dir):
        """The global rank must sit ABOVE the per-user aggregation:
        |users| rows sort, not |events|. The aggregation below the
        window also proves map-side partial aggregation applies to the
        event scan."""
        plan = _plan(spark, sf_dir, "events_pareto_concentration")
        assert "Join" not in plan
        # HashAggregate (per-user count) must appear before Window in
        # the formatted tree's execution order (deeper node = earlier).
        agg_pos = plan.find("HashAggregate")
        win_pos = plan.find("Window")
        assert agg_pos != -1 and win_pos != -1


class TestLinkGraphPlans:
    def test_bm25f_topk_is_take_ordered_not_corpus_window(
        self, spark, sf_dir
    ):
        """The fused top-20 must push a limit BELOW the unpartitioned
        rank window (LimitPushDownThroughWindow) so the window sorts
        20 rows, never the corpus-sized match set into one task; the
        two single-row BM25 stats aggregates are the only other
        SinglePartition exchanges."""
        plan = _plan(spark, sf_dir, "retrieval_bm25f_anchor")
        assert "TakeOrderedAndProject" in plan, plan
        assert "Arguments: 20, [score" in plan, plan

    def test_zvalue_reaches_scan_as_projection(self, spark, sf_dir):
        """The interleave is part of the scan-side projection: only
        the two key columns are read, and no Python node appears
        anywhere in the plan."""
        plan = _plan(spark, sf_dir, "layout_zorder_clustering")
        read = next(l for l in plan.splitlines() if "ReadSchema" in l)
        assert "l_orderkey" in read and "l_linenumber" in read
        assert "l_partkey" not in read
        assert "Python" not in plan and "Arrow" not in plan


class TestRound12ThirdWaveShapes:
    def test_nb_scoring_stage_has_no_window_or_python(
        self, spark, sf_dir
    ):
        """NB scoring is a pure in-row fold: no Window nodes, no
        Python-eval nodes anywhere in the classify plan; shuffles only
        for the (class, word) model build (behind collects) and the
        5-row final aggregate."""
        plan = _plan(spark, sf_dir, "ml_naive_bayes_langid")
        assert "Window" not in plan
        for node in ("BatchEvalPython", "ArrowEvalPython", "MapInArrow"):
            assert node not in plan

    def test_auc_window_is_bucket_partitioned(self, spark, sf_dir):
        """The AUC prefix sum must ride the two-phase cumsum: the only
        window is partitioned by the literal bucket column, never an
        unpartitioned window ordered on the raw score column."""
        import re

        df = REGISTRY["ml_auc_roc"].spark(spark, sf_dir)
        df.collect()
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain()
        final = buf.getvalue().split("Initial Plan")[0]
        assert final.count("windowspecdefinition(__b") == 1, final
        assert not re.findall(
            r"windowspecdefinition\(s#", final
        ), final

    def test_mahalanobis_rank_is_take_ordered(self, spark, sf_dir):
        """The top-10 outlier cut must compile to TakeOrderedAndProject
        below the window (LimitPushDownThroughWindow), never a global
        sort of the corpus."""
        plan = _plan(spark, sf_dir, "ml_mahalanobis_outliers")
        assert "TakeOrderedAndProject" in plan
        assert "GlobalLimit" not in plan or "Sort" not in plan.split(
            "TakeOrderedAndProject"
        )[0]

    def test_mmr_served_plan_is_bounded_literals(self, spark, sf_dir):
        """The candidate cut and K x K sim pass run during query
        construction behind the lazy localCheckpoint (the documented
        explain boundary), so the SERVED plan must be exactly: a
        checkpoint scan filtered by a <=K literal IN-list with
        literal-map projections — bounded at any corpus size, no join,
        no window, no Python."""
        plan = _plan(spark, sf_dir, "retrieval_mmr_diversified")
        assert "Scan ExistingRDD" in plan  # the checkpointed pool
        for node in ("Join", "Window", "BatchEvalPython"):
            assert node not in plan

    def test_kaplan_meier_gap_window_is_user_partitioned(
        self, spark, sf_dir
    ):
        """The corpus-sized window must be PARTITIONED by user (the
        sessionize shape); the unpartitioned KM windows run only over
        the hours-bounded histogram (post-aggregation)."""
        plan = _plan(spark, sf_dir, "ts_kaplan_meier")
        assert "user_id" in plan  # partition key present in the plan
        # the gap window's spec mentions user_id as partition column
        assert "Window" in plan
