"""Measured scale exponents for the two heaviest catalog paths.

The always-on sf0.01 scale-sensitivity tests prove CORRECTNESS at two
scales; this module bounds the COST growth: wall time at sf0.1 must be
< 15× wall time at sf0.01 (10× data), so a superlinear blowup — a pair
join losing its pruning, an iterative operator whose rounds stop
converging — is caught by CI instead of by eyeballing BENCH deltas.
The bound is deliberately generous: 10× data through a near-linear
path lands well under 15× even with fixed-overhead noise; a quadratic
escape lands near 100× and fails loudly. Measured ratios are recorded
in COVERAGE.md.

Timing discipline mirrors bench.py: warm-up run untimed, then
min-of-two timed runs per scale, both scales inside one session so JVM
state is comparable.
"""

from __future__ import annotations

import time

import pytest

SF001_DIR = "/root/testdata/sf0.01"
SF01_DIR = "/root/testdata/sf0.1"

MAX_RATIO = 15.0


def _min_of_two(fn) -> float:
    fn()  # warm-up: JIT, parquet footers, broadcast state
    best = float("inf")
    for _ in range(2):
        start = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - start)
    return best


@pytest.mark.slow
def test_semantic_bucketed_pair_pass_scale_exponent(spark):
    """The Exchange-free pair pass against a prebuilt layout — the cost
    paid per dedup run. Layout builds are untimed (one-time cost by
    design); only the per-pass join is bounded."""
    from economic_data_etl_spark.plans.curation import (
        build_semantic_bucketed_layout,
        semantic_bucketed_pairs_only,
    )

    tables = {
        sf: build_semantic_bucketed_layout(spark, sf)
        for sf in (SF001_DIR, SF01_DIR)
    }
    times = {
        sf: _min_of_two(
            lambda t=t: semantic_bucketed_pairs_only(spark, t).collect()
        )
        for sf, t in tables.items()
    }
    ratio = times[SF01_DIR] / max(times[SF001_DIR], 1e-9)
    assert ratio < MAX_RATIO, (
        f"pair pass grew {ratio:.1f}x for 10x data "
        f"({times[SF001_DIR]:.2f}s -> {times[SF01_DIR]:.2f}s)"
    )


@pytest.mark.slow
def test_cluster_components_scale_exponent(spark):
    """Min-label-propagation connected components — iterative, so a
    convergence regression shows up as extra rounds, i.e. superlinear
    wall growth."""
    from economic_data_etl_spark.plans import REGISTRY

    q = REGISTRY["dedup_cluster_components"]
    times = {
        sf: _min_of_two(lambda sf=sf: q.spark(spark, sf).collect())
        for sf in (SF001_DIR, SF01_DIR)
    }
    ratio = times[SF01_DIR] / max(times[SF001_DIR], 1e-9)
    assert ratio < MAX_RATIO, (
        f"components grew {ratio:.1f}x for 10x data "
        f"({times[SF001_DIR]:.2f}s -> {times[SF01_DIR]:.2f}s)"
    )


@pytest.mark.slow
def test_media_near_dup_scale_exponents(spark):
    """The round-8 media near-dup compositions: fixture synthesis +
    decode is per-row (linear), the banded keyframe join and the
    shared-token join generate candidates only where bands/tokens
    collide — planted separation means candidate count grows linearly
    with the corpus, so the whole query must stay near-linear. A
    superlinear escape here would mean the banding degenerated into an
    all-pairs comparison."""
    from economic_data_etl_spark.plans import REGISTRY

    for name in (
        "multimodal_video_near_dup",
        "multimodal_audio_near_dup",
    ):
        q = REGISTRY[name]
        times = {
            sf: _min_of_two(lambda sf=sf: q.spark(spark, sf).collect())
            for sf in (SF001_DIR, SF01_DIR)
        }
        ratio = times[SF01_DIR] / max(times[SF001_DIR], 1e-9)
        assert ratio < MAX_RATIO, (
            f"{name} grew {ratio:.1f}x for 10x data "
            f"({times[SF001_DIR]:.2f}s -> {times[SF01_DIR]:.2f}s)"
        )
        print(
            f"{name}: {times[SF001_DIR]:.2f}s -> "
            f"{times[SF01_DIR]:.2f}s = {ratio:.1f}x"
        )


@pytest.mark.slow
def test_substring_dedup_scale_exponent(spark):
    """The round-9 exact-substring pass: gram build is narrow (linear
    in tokens), the single gram-keyed window shuffle is linear, and
    the span merge touches only duplicated occurrences. A superlinear
    escape would mean the gram stream stopped being linear in corpus
    tokens (e.g. the CSE materialization regressed to per-gram
    re-splitting)."""
    from economic_data_etl_spark.plans import REGISTRY

    for name in ("dedup_duplicate_spans", "dedup_substring_removal"):
        q = REGISTRY[name]
        times = {
            sf: _min_of_two(lambda sf=sf: q.spark(spark, sf).collect())
            for sf in (SF001_DIR, SF01_DIR)
        }
        ratio = times[SF01_DIR] / max(times[SF001_DIR], 1e-9)
        assert ratio < MAX_RATIO, (
            f"{name} grew {ratio:.1f}x for 10x data "
            f"({times[SF001_DIR]:.2f}s -> {times[SF01_DIR]:.2f}s)"
        )
        print(
            f"{name}: {times[SF001_DIR]:.2f}s -> "
            f"{times[SF01_DIR]:.2f}s = {ratio:.1f}x"
        )


@pytest.mark.slow
def test_round9_composition_scale_exponents(spark):
    """The round-9 composition paths: BM25 (postings-filtered explode),
    heavy hitters (bounded MG summaries + candidate recount),
    end-to-end corpus prep (quality -> substring dedup -> chunk
    arithmetic), and incremental substring dedup (batch vs gram
    index). All are shuffle-linear in corpus tokens; a superlinear
    escape means a filter stopped pushing or a candidate set stopped
    being bounded."""
    from economic_data_etl_spark.plans import REGISTRY

    for name in (
        "text_bm25_retrieval",
        "sketch_heavy_hitters_bigrams",
        "training_corpus_prep",
        "dedup_incremental_substring",
        "ml_kmeans_clusters",
    ):
        q = REGISTRY[name]
        times = {
            sf: _min_of_two(lambda sf=sf: q.spark(spark, sf).collect())
            for sf in (SF001_DIR, SF01_DIR)
        }
        ratio = times[SF01_DIR] / max(times[SF001_DIR], 1e-9)
        assert ratio < MAX_RATIO, (
            f"{name} grew {ratio:.1f}x for 10x data "
            f"({times[SF001_DIR]:.2f}s -> {times[SF01_DIR]:.2f}s)"
        )
        print(
            f"{name}: {times[SF001_DIR]:.2f}s -> "
            f"{times[SF01_DIR]:.2f}s = {ratio:.1f}x"
        )


@pytest.mark.slow
def test_round10_scale_exponents(spark):
    """The round-10 additions: incremental BM25 (index build + append
    + postings-filtered scoring), CMS (depth x width sketch,
    map-side-collapsed), phrase search (posexplode pre-filtered to
    phrase terms), hybrid RRF (three lanes + a rank-table fusion
    join), and logistic GD (fixed step count, d+2 doubles per
    partition per step). All shuffle-linear in corpus tokens or
    constant-bounded; a superlinear escape means a filter stopped
    pushing or a sketch stopped collapsing map-side."""
    from economic_data_etl_spark.plans import REGISTRY

    for name in (
        "text_bm25_incremental",
        "sketch_cms_frequency",
        "text_phrase_search",
        "retrieval_hybrid_rrf",
        "ml_logreg_gd",
    ):
        q = REGISTRY[name]
        times = {
            sf: _min_of_two(lambda sf=sf: q.spark(spark, sf).collect())
            for sf in (SF001_DIR, SF01_DIR)
        }
        ratio = times[SF01_DIR] / max(times[SF001_DIR], 1e-9)
        assert ratio < MAX_RATIO, (
            f"{name} grew {ratio:.1f}x for 10x data "
            f"({times[SF001_DIR]:.2f}s -> {times[SF01_DIR]:.2f}s)"
        )
        print(
            f"{name}: {times[SF001_DIR]:.2f}s -> "
            f"{times[SF01_DIR]:.2f}s = {ratio:.1f}x"
        )


@pytest.mark.slow
def test_crawl_and_bloom_scale_exponents(spark):
    """The crawl-curation lane: URL canonicalization + alias-group
    dedup (one hash aggregate over a scan-side projection), the
    incremental frontier (batch groupBy + one anti-join on the
    canonical key), and Bloom decontamination (constant-folded bitmap
    scan + candidates-only semi-join). All scan-linear; a superlinear
    escape means the canonicalizer fell out of codegen or the bitmap
    stopped pruning."""
    from economic_data_etl_spark.plans import REGISTRY

    for name in (
        "crawl_url_dedup",
        "crawl_incremental_frontier",
        "curation_bloom_decontaminate",
    ):
        q = REGISTRY[name]
        times = {
            sf: _min_of_two(lambda sf=sf: q.spark(spark, sf).collect())
            for sf in (SF001_DIR, SF01_DIR)
        }
        ratio = times[SF01_DIR] / max(times[SF001_DIR], 1e-9)
        assert ratio < MAX_RATIO, (
            f"{name} grew {ratio:.1f}x for 10x data "
            f"({times[SF001_DIR]:.2f}s -> {times[SF01_DIR]:.2f}s)"
        )
        print(
            f"{name}: {times[SF001_DIR]:.2f}s -> "
            f"{times[SF01_DIR]:.2f}s = {ratio:.1f}x"
        )


@pytest.mark.slow
def test_econometrics_and_curation_scale_exponents(spark):
    """The round-10 econometrics/curation lanes: seasonal decomposition
    and incremental CUSUM (one daily pre-aggregation, then window
    passes over days x types), the Fisher price index (one (partkey,
    yr) aggregation + a partkey-keyed basket join), corpus KL drift
    (postings-sized join, closed-form absent mass — the naive grid is
    oracle-only), and hard-negative mining (postings-filtered BM25 +
    broadcast-query cosine). A superlinear escape means a
    pre-aggregation stopped collapsing or the KL join lost its
    postings pruning."""
    from economic_data_etl_spark.plans import REGISTRY

    for name in (
        "ts_seasonal_decompose",
        "ts_incremental_cusum",
        "agg_price_index_fisher",
        "text_corpus_divergence_kl",
        "retrieval_hard_negatives",
    ):
        q = REGISTRY[name]
        times = {
            sf: _min_of_two(lambda sf=sf: q.spark(spark, sf).collect())
            for sf in (SF001_DIR, SF01_DIR)
        }
        ratio = times[SF01_DIR] / max(times[SF001_DIR], 1e-9)
        assert ratio < MAX_RATIO, (
            f"{name} grew {ratio:.1f}x for 10x data "
            f"({times[SF001_DIR]:.2f}s -> {times[SF01_DIR]:.2f}s)"
        )
        print(
            f"{name}: {times[SF001_DIR]:.2f}s -> "
            f"{times[SF01_DIR]:.2f}s = {ratio:.1f}x"
        )


@pytest.mark.slow
def test_round11_scale_exponents(spark):
    """Round-11 additions: the web-corpus composition (WARC + main
    content + canonicalize + robots + frontier + quality + substring +
    chunks — the heaviest composed plan in the catalog),
    contamination excision (broadcast bench grams + hit-only span
    merge), span corruption (pure per-row projection — should be
    ~linear in corpus bytes), the two-phase global rank queries, the
    KMV rollup, and Holt-Winters (days-sized fold after one daily
    shuffle). A superlinear escape means a broadcast grew into a
    shuffle or a span merge lost its hit-only pruning."""
    from economic_data_etl_spark.plans import REGISTRY

    for name in (
        "training_web_corpus_prep",
        "curation_decontam_excision",
        "training_span_corruption",
        "features_decile_bins",
        "agg_gini_revenue_concentration",
        "sketch_kmv_distinct_rollup",
        "ts_holt_winters_forecast",
        "governance_erasure_bm25",
        "multimodal_html_main_content",
        "curation_blocklist_filter",
        "curation_incremental_sample",
    ):
        q = REGISTRY[name]
        times = {
            sf: _min_of_two(lambda sf=sf: q.spark(spark, sf).collect())
            for sf in (SF001_DIR, SF01_DIR)
        }
        ratio = times[SF01_DIR] / max(times[SF001_DIR], 1e-9)
        assert ratio < MAX_RATIO, (
            f"{name} grew {ratio:.1f}x for 10x data "
            f"({times[SF001_DIR]:.2f}s -> {times[SF01_DIR]:.2f}s)"
        )
        print(
            f"{name}: {times[SF001_DIR]:.2f}s -> "
            f"{times[SF01_DIR]:.2f}s = {ratio:.1f}x"
        )


@pytest.mark.slow
def test_r12_lanes_scale_exponent(spark):
    """Round-12 headliners: the four standing-index erasure queries
    (anti-join lanes should be ~linear; the substring/frontier
    reassignment lanes add one surviving-corpus pass semi-joined to the
    affected key set — still linear), the streaming Holt-Winters fold
    replay (three folds over the same days-sized arrays), and the
    three-model selection (three folds + holdout joins). A superlinear
    escape means an anti-join grew into something corpus², or a
    reassignment pass lost its semi-join pruning."""
    from economic_data_etl_spark.plans import REGISTRY

    for name in (
        "governance_erasure_semantic",
        "governance_erasure_phash",
        "governance_erasure_substring",
        "governance_erasure_frontier",
        "ts_streaming_holt_winters",
        "ts_forecast_model_select",
    ):
        q = REGISTRY[name]
        times = {
            sf: _min_of_two(lambda sf=sf: q.spark(spark, sf).collect())
            for sf in (SF001_DIR, SF01_DIR)
        }
        ratio = times[SF01_DIR] / max(times[SF001_DIR], 1e-9)
        assert ratio < MAX_RATIO, (
            f"{name} grew {ratio:.1f}x for 10x data "
            f"({times[SF001_DIR]:.2f}s -> {times[SF01_DIR]:.2f}s)"
        )
        print(
            f"{name}: {times[SF001_DIR]:.2f}s -> "
            f"{times[SF01_DIR]:.2f}s = {ratio:.1f}x"
        )


@pytest.mark.slow
def test_zorder_scale_exponent(spark):
    """Z-order clustering stats scale with lineitem (the interleave is
    a pure projection; the only shuffle is the bucket aggregation) —
    the one r12 lane whose input grows with SF. The link-graph lanes
    are certified on a BOUNDED 64-doc universe by design (constant
    work at every SF), so there is nothing to measure there."""
    from economic_data_etl_spark.plans import REGISTRY

    for name in ("layout_zorder_clustering", "inv_zorder_locality"):
        q = REGISTRY[name]
        times = {
            sf: _min_of_two(lambda sf=sf: q.spark(spark, sf).collect())
            for sf in (SF001_DIR, SF01_DIR)
        }
        ratio = times[SF01_DIR] / max(times[SF001_DIR], 1e-9)
        assert ratio < MAX_RATIO, (
            f"{name} grew {ratio:.1f}x for 10x data "
            f"({times[SF001_DIR]:.2f}s -> {times[SF01_DIR]:.2f}s)"
        )
        print(
            f"{name}: {times[SF001_DIR]:.2f}s -> "
            f"{times[SF01_DIR]:.2f}s = {ratio:.1f}x"
        )


@pytest.mark.slow
def test_r12_second_wave_scale_exponents(spark):
    """Round-12 second wave: the robust trend pair (one corpus shuffle
    into the calendar-bounded daily frame; the O(days²) pair join runs
    over that bounded frame, so 10× data should move only the
    pre-aggregation) and the Stupid Backoff LM (two corpus passes —
    unified count shuffle + broadcast-join scoring; the model is
    top-K-pruned so the broadcast never grows with SF). A superlinear
    escape means the pair join leaked onto the fact table or a model
    join lost its broadcast."""
    from economic_data_etl_spark.plans import REGISTRY

    for name in (
        "ts_theil_sen_trend",
        "ts_mann_kendall_trend",
        "text_perplexity_backoff",
    ):
        q = REGISTRY[name]
        times = {
            sf: _min_of_two(lambda sf=sf: q.spark(spark, sf).collect())
            for sf in (SF001_DIR, SF01_DIR)
        }
        ratio = times[SF01_DIR] / max(times[SF001_DIR], 1e-9)
        assert ratio < MAX_RATIO, (
            f"{name} grew {ratio:.1f}x for 10x data "
            f"({times[SF001_DIR]:.2f}s -> {times[SF01_DIR]:.2f}s)"
        )
        print(
            f"{name}: {times[SF001_DIR]:.2f}s -> "
            f"{times[SF01_DIR]:.2f}s = {ratio:.1f}x"
        )


@pytest.mark.slow
def test_unigram_tokenizer_scale_exponent(spark):
    """The unigram tokenizer's every pass runs over the Zipf-bounded
    word-frequency table (one corpus shuffle builds it); candidate
    generation, the prune, and the Viterbi fold all scale with
    DISTINCT words, which grow far slower than tokens. A superlinear
    escape means a pass leaked onto the corpus."""
    from economic_data_etl_spark.plans import REGISTRY

    for name in ("text_unigram_tokenize", "inv_unigram_em_monotone"):
        q = REGISTRY[name]
        times = {
            sf: _min_of_two(lambda sf=sf: q.spark(spark, sf).collect())
            for sf in (SF001_DIR, SF01_DIR)
        }
        ratio = times[SF01_DIR] / max(times[SF001_DIR], 1e-9)
        assert ratio < MAX_RATIO, (
            f"{name} grew {ratio:.1f}x for 10x data "
            f"({times[SF001_DIR]:.2f}s -> {times[SF01_DIR]:.2f}s)"
        )
        print(
            f"{name}: {times[SF001_DIR]:.2f}s -> "
            f"{times[SF01_DIR]:.2f}s = {ratio:.1f}x"
        )


@pytest.mark.slow
def test_r12_third_wave_scale_exponents(spark):
    """Round-12 third wave: the NB classifier (one (class, word) count
    shuffle + in-row fold scoring under a constant-folded model), AUC
    (score-grouped prefix sum), AR(2)/KM (per-key or per-user series
    math over bounded frames), TextRank (one corpus pair pass into a
    vocab^2-bounded graph), Mahalanobis (two corpus scans, 6 doubles
    move), and the governance trio (ladder over bounded classes; CMS
    subtraction over depth x width cells; nations-sized DP release).
    A superlinear escape means a model join lost its broadcast or a
    bounded table leaked onto the corpus."""
    from economic_data_etl_spark.plans import REGISTRY

    for name in (
        "ml_naive_bayes_langid",
        "ml_auc_roc",
        "ts_yule_walker_ar2",
        "text_textrank_keywords",
        "ts_kaplan_meier",
        "ml_mahalanobis_outliers",
        "governance_k_anonymity",
        "governance_dp_release",
        "governance_erasure_cms",
        "governance_erasure_lm",
    ):
        q = REGISTRY[name]
        times = {
            sf: _min_of_two(lambda sf=sf: q.spark(spark, sf).collect())
            for sf in (SF001_DIR, SF01_DIR)
        }
        ratio = times[SF01_DIR] / max(times[SF001_DIR], 1e-9)
        assert ratio < MAX_RATIO, (
            f"{name} grew {ratio:.1f}x for 10x data "
            f"({times[SF001_DIR]:.2f}s -> {times[SF01_DIR]:.2f}s)"
        )
        print(
            f"{name}: {times[SF001_DIR]:.2f}s -> "
            f"{times[SF01_DIR]:.2f}s = {ratio:.1f}x"
        )


@pytest.mark.slow
def test_r12_fourth_wave_scale_exponents(spark):
    """Round-12 fourth wave: Kalman (per-key fold), A/B + log-rank
    (one groupBy/window then bounded arithmetic), incremental NB
    (additive fold + in-row scoring), MMR + QLD (postings-filtered
    pools), stratified sampling (moment pass + partitioned rank), PMI
    + Zipf (vocab-bounded), trimmed mean (partitioned rank), Markov
    stationary (lag window + driver iteration on the types^2 matrix),
    RFM (three two-phase ranks)."""
    from economic_data_etl_spark.plans import REGISTRY

    for name in (
        "ts_kalman_filter",
        "events_ab_test",
        "ts_logrank_test",
        "ml_incremental_naive_bayes",
        "retrieval_mmr_diversified",
        "retrieval_query_likelihood",
        "curation_stratified_sample",
        "text_pmi_collocations",
        "text_zipf_fit",
        "agg_trimmed_mean",
        "events_markov_stationary",
        "agg_rfm_segments",
        "events_cuped_adjusted",
        "events_attribution_touch",
    ):
        q = REGISTRY[name]
        times = {
            sf: _min_of_two(lambda sf=sf: q.spark(spark, sf).collect())
            for sf in (SF001_DIR, SF01_DIR)
        }
        ratio = times[SF01_DIR] / max(times[SF001_DIR], 1e-9)
        assert ratio < MAX_RATIO, (
            f"{name} grew {ratio:.1f}x for 10x data "
            f"({times[SF001_DIR]:.2f}s -> {times[SF01_DIR]:.2f}s)"
        )
        print(
            f"{name}: {times[SF001_DIR]:.2f}s -> "
            f"{times[SF01_DIR]:.2f}s = {ratio:.1f}x"
        )
