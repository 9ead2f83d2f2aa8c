"""Benchmark harness: runs the headline catalog queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Headline set = the scan/join/agg/window/event queries that dominate a
production workload, plus the scale-path dedup/ANN operators (ngram
jaccard, MinHash-LSH, SimHash, SRP-LSH). The quadratic-by-construction
pairwise baselines (embedding_near_dup_pairs) are correctness features,
not throughput paths, and stay out of the headline wall clock (they'd
measure the test-data generator, not the engine).

Isolation: EACH query runs in its own subprocess with a fresh
SparkSession/JVM. Round 2 showed shared-session timings are untrustworthy:
the iterative operators (components, pagerank) pin localCheckpoint RDDs
that `clearCache()` + `gc.collect()` do not free promptly, and every later
query was timed under that storage/GC pressure (`dedup_cluster_components`
159 s shared vs 7.6 s clean). Per-query processes make each number the
clean standalone time; JVM startup and a warm-up query run before the
timer starts, so neither is measured.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q6_forecast_revenue",
    "join_broadcast_dims",
    "join_outer_order_counts",
    "window_rank_parts_per_brand",
    "window_moving_avg_order_price",
    "agg_rollup_orders",
    "events_tumbling_window",
    "events_session_windows",
    "events_asof_purchase_view",
    "ts_ohlc_daily",
    "q10_returned_item_revenue",
    "q14_promo_revenue_share",
    "q19_disjunctive_predicates",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_cluster_components",
    "text_quality_metrics",
    "text_repetition_metrics",
    "decontam_overlap_report",
    "curation_funnel_summary",
    "graph_pagerank_trade",
    "ts_linear_interpolate",
    "ann_cosine_topk_bruteforce",
    "ann_cosine_topk_lsh",
    "multimodal_decode_metadata",
    "multimodal_real_pixel_decode",
    "multimodal_jpeg_decode",
    "multimodal_color_jpeg_decode",
    "multimodal_progressive_jpeg",
    "multimodal_arithmetic_jpeg",
    "multimodal_lossless_jpeg",
    "inv_bpe_conservation",
    "curation_pii_redaction",
    "multimodal_phash_near_dup",
    "dedup_incremental_phash",
    "multimodal_video_near_dup",
    "multimodal_audio_near_dup",
    "multimodal_audio_spectral",
    "multimodal_video_scene_cuts",
    "multimodal_image_resize",
    "multimodal_video_frames",
    "multimodal_video_motion_decode",
    "multimodal_gif_animation",
    "multimodal_g711_audio_decode",
    "train_val_test_split",
    "variant_typed_extraction",
    "sketch_hll_distinct_rollup",
    "histogram_order_totalprice",
    "dedup_semantic_embedding",
    "dedup_semantic_bucketed",
    "dedup_semantic_bucketed_pairs_only",
    "dedup_duplicated_ngram_fraction",
    "dedup_duplicate_spans",
    "dedup_substring_removal",
    "dedup_incremental_substring",
    "dedup_chunk_exact",
    "training_chunk_documents",
    "training_corpus_prep",
    "training_span_corruption",
    "dedup_cluster_representatives",
    "sketch_heavy_hitters_bigrams",
    "sketch_cms_frequency",
    "sketch_cms_join_size",
    "multimodal_payload_compressibility",
    "multimodal_pdf_text_extract",
    "multimodal_html_text_extract",
    "multimodal_html_main_content",
    "training_crawl_ingest",
    "training_web_corpus_prep",
    "crawl_url_dedup",
    "crawl_incremental_frontier",
    "curation_bloom_decontaminate",
    "curation_decontam_excision",
    "curation_incremental_sample",
    "curation_blocklist_filter",
    "text_compression_ratio",
    "text_importance_weights",
    "text_bm25_retrieval",
    "text_bm25_incremental",
    "text_phrase_search",
    "text_phrase_incremental",
    "governance_erasure_bm25",
    "governance_erasure_phrase",
    "governance_erasure_semantic",
    "governance_erasure_substring",
    "governance_erasure_frontier",
    "governance_erasure_phash",
    "retrieval_hybrid_rrf",
    "curation_source_quota",
    "graph_triangle_census",
    "events_transition_matrix",
    "ts_outlier_mad",
    "text_bigram_collocations",
    "embedding_random_projection",
    "join_market_basket_pairs",
    "ts_ewma_smoothed",
    "events_funnel_three_step",
    "text_lm_quality_score",
    "dataset_dedup_rate_by_source",
    "ts_rolling_correlation",
    "text_ngram_novelty_by_source",
    "docs_char_trigram_entropy_by_source",
    "events_pareto_concentration",
    "ml_ols_normal_equations",
    "ml_kmeans_clusters",
    "ml_logreg_gd",
    "profile_correlation_matrix",
    "features_decile_bins",
    "ml_population_stability_index",
    "ml_ks_two_sample",
    "ml_incremental_psi",
    "agg_gini_revenue_concentration",
    "ts_seasonal_decompose",
    "ts_incremental_cusum",
    "ts_holt_winters_forecast",
    "ts_streaming_holt_winters",
    "ts_incremental_holt_winters",
    "ts_forecast_backtest",
    "ts_forecast_model_select",
    "agg_price_index_fisher",
    "agg_herfindahl_concentration",
    "text_corpus_divergence_kl",
    "retrieval_hard_negatives",
    "text_tokenizer_fertility",
    "ml_ipf_raking",
    "ts_granger_lead_test",
    "training_dataset_card",
    "sketch_kll_quantiles",
    "sketch_kmv_distinct_rollup",
    "sketch_kmv_set_overlap",
    "sketch_kmv_incremental",
    "agg_price_index_chained",
    "agg_quantity_index_fisher",
    "crawl_link_extract",
    "crawl_anchor_text_index",
    "crawl_pagerank_links",
    "crawl_incremental_links",
    "governance_erasure_linkgraph",
    "retrieval_bm25f_anchor",
    "layout_zorder_clustering",
    "inv_zorder_locality",
    "training_curriculum_order",
    "crawl_hits_links",
    "training_split_leakage",
    "layout_hilbert_clustering",
    "inv_hilbert_continuity",
    "crawl_trustrank_links",
    "governance_erasure_audit",
    "ts_theil_sen_trend",
    "ts_mann_kendall_trend",
    "text_perplexity_backoff",
    "crawl_labelprop_communities",
    "text_unigram_tokenize",
    "text_incremental_perplexity",
    "governance_erasure_lm",
    "ml_naive_bayes_langid",
    "ml_auc_roc",
    "ts_yule_walker_ar2",
    "text_textrank_keywords",
    "governance_k_anonymity",
    "governance_dp_release",
    "governance_erasure_cms",
    "ts_kaplan_meier",
    "ml_mahalanobis_outliers",
    "ts_kalman_filter",
    "events_ab_test",
    "ml_incremental_naive_bayes",
    "retrieval_mmr_diversified",
    "curation_stratified_sample",
    "text_pmi_collocations",
    "retrieval_query_likelihood",
    "ts_logrank_test",
    "agg_trimmed_mean",
    "text_zipf_fit",
    "events_markov_stationary",
    "agg_rfm_segments",
    "events_cuped_adjusted",
    "events_attribution_touch",
]

# Several light queries share one subprocess to amortize JVM startup; each
# heavy/iterative query gets a process to itself so nothing it pins can
# leak into another query's timer. A query is "heavy" if it persists,
# localCheckpoints, or loops (dedup clustering, pagerank, LSH families).
ISOLATED = {
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_cluster_components",
    "decontam_overlap_report",
    "curation_funnel_summary",
    "graph_pagerank_trade",
    "ann_cosine_topk_bruteforce",
    "ann_cosine_topk_lsh",
    "dedup_semantic_embedding",
    "dedup_semantic_bucketed",
    "dedup_semantic_bucketed_pairs_only",
    "dedup_duplicated_ngram_fraction",
    "dedup_duplicate_spans",
    "dedup_substring_removal",
    "dedup_cluster_representatives",
    "graph_triangle_census",
    "join_market_basket_pairs",
    "text_lm_quality_score",
    "multimodal_video_near_dup",
    "ml_kmeans_clusters",
    "ml_logreg_gd",
    "training_web_corpus_prep",
    "curation_decontam_excision",
}


# min-of-N repeats for the heavy ISOLATED queries (see comment at the
# timing loop); light batched queries keep 2
REPEATS_ISOLATED = 3


def _is_codec(name: str) -> bool:
    """Split the headline into the two workload families for the
    summary line: the from-scratch codec decode lanes (multimodal_*)
    now account for ~10 of the 12 slowest entries, and a regression in
    a TPC-H-shape query was getting visually buried under them. One
    total is still reported; the per-group subtotals make a relational
    regression visible at a glance."""
    return name.startswith("multimodal_")


def run_batch(names: list[str], sf_dir: str) -> None:
    """Child entry: time each query in a fresh session, one JSON line per
    query on stdout (Spark logs go to stderr)."""
    from economic_data_etl_spark.plans import REGISTRY
    from economic_data_etl_spark.session import get_spark

    spark = get_spark(app_name="engine-bench-worker")
    spark.sparkContext.setLogLevel("ERROR")
    # Warm the JVM + parquet footers so the timer sees queries, not startup.
    REGISTRY["q1_pricing_summary"].spark(spark, sf_dir).collect()
    for name in names:
        if name == "dedup_semantic_bucketed_pairs_only":
            # Amortization probe: `dedup_semantic_bucketed` times layout
            # build + pair pass together; this entry builds the layout
            # UNTIMED, then times only the Exchange-free pair pass — the
            # cost every dedup run after the first actually pays.
            from economic_data_etl_spark.plans.curation import (
                build_semantic_bucketed_layout,
                semantic_bucketed_pairs_only,
            )

            table = build_semantic_bucketed_layout(spark, sf_dir)
            if table is None:  # empty corpus: nothing to time
                print(
                    json.dumps({"name": name, "sec": 0.0}), flush=True
                )
                continue
            best = float("inf")
            for _ in range(REPEATS_ISOLATED):
                start = time.perf_counter()
                semantic_bucketed_pairs_only(spark, table).collect()
                best = min(best, time.perf_counter() - start)
                spark.catalog.clearCache()
            print(
                json.dumps({"name": name, "sec": round(best, 3)}),
                flush=True,
            )
            continue
        # Repeated timed executions, report the min: single-shot numbers
        # swing ±2× on sub-5 s queries from JIT/IO warmup noise, which
        # would read as phantom regressions round-over-round. Min-of-N is
        # the steady-state engine throughput. ISOLATED queries get an
        # extra repeat — round 6 showed best-of-2 leaves ±30% jitter on
        # them (dedup_simhash +31% with untouched code), drowning real
        # regressions.
        best = float("inf")
        for _ in range(REPEATS_ISOLATED if name in ISOLATED else 2):
            start = time.perf_counter()
            REGISTRY[name].spark(spark, sf_dir).collect()
            best = min(best, time.perf_counter() - start)
            spark.catalog.clearCache()
        print(json.dumps({"name": name, "sec": round(best, 3)}), flush=True)
    spark.stop()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    # Partition the headline list into subprocess batches, preserving
    # order: contiguous runs of light queries share a process; each
    # ISOLATED query is its own batch.
    batches: list[list[str]] = []
    for name in HEADLINE:
        if name in ISOLATED or not batches or batches[-1][-1] in ISOLATED:
            batches.append([name])
        else:
            batches[-1].append(name)

    timings: dict[str, float] = {}
    for batch in batches:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--batch", *batch],
            capture_output=True,
            text=True,
            timeout=1800,
            env=os.environ,
        )
        if proc.returncode != 0:
            for name in batch:
                timings.setdefault(name, -1.0)
            print(
                f"bench batch {batch} failed:\n{proc.stderr[-2000:]}",
                file=sys.stderr,
            )
        for line in proc.stdout.splitlines():
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            timings[rec["name"]] = rec["sec"]
            # stream per-query results as they land, so a truncated
            # capture still shows progress
            print(line, flush=True)

    total = round(sum(t for t in timings.values() if t > 0), 3)
    _update_best_ever(timings, sf)
    # Output order matters for the driver's bounded TAIL capture
    # (round 6: the single summary line outgrew it and the artifact
    # lost the total, "parsed": null; rounds 11-12: the full-map line
    # carried the persisted best-ever floor book AFTER the current-run
    # map, so front-truncation of that line kept stale floors and
    # discarded the current run — per_query came back empty two rounds
    # running). Fix: the floor book lives only in BENCH_BEST.json; the
    # full-map line carries ONLY the current run's "queries" map, with
    # the map as the LAST key so front-truncation eats metadata before
    # it eats measurements. The LAST line stays short and total-only,
    # so truncation can never eat the headline number.
    print(
        json.dumps(
            {
                "metric": "headline_queries_full_map",
                "unit": "sec",
                "sf": float(sf),
                "queries": timings,
            }
        )
    )
    codec = round(
        sum(t for n, t in timings.items() if t > 0 and _is_codec(n)), 3
    )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "n_queries": len(timings),
                "n_failed": sum(1 for t in timings.values() if t < 0),
                "relational": round(total - codec, 3),
                "codec": codec,
                "total": total,
                "sf": float(sf),
            }
        )
    )


def _update_best_ever(timings: dict[str, float], sf: str) -> dict[str, float]:
    """Track the best-ever per-query time (per SF) in BENCH_BEST.json so
    round-over-round drift on untouched queries is visible against a
    stable floor instead of last round's (noisy) sample. Returns the
    updated map for this SF; logs >30% drift to stderr."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH_BEST.json")
    try:
        with open(path) as f:
            book = json.load(f)
    except (OSError, json.JSONDecodeError):
        book = {}
    best = book.setdefault(str(sf), {})
    for name, sec in timings.items():
        if sec <= 0:
            continue
        prev = best.get(name)
        if prev is not None and sec > prev * 1.3:
            print(
                f"bench drift: {name} {sec:.2f}s vs best-ever "
                f"{prev:.2f}s (+{(sec / prev - 1) * 100:.0f}%)",
                file=sys.stderr,
            )
        if prev is None or sec < prev:
            best[name] = sec
    try:
        with open(path, "w") as f:
            json.dump(book, f, indent=1, sort_keys=True)
    except OSError:
        pass
    return best


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--batch":
        run_batch(
            sys.argv[2:],
            os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
        )
    else:
        main()
