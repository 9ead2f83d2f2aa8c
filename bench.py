"""Benchmark harness: runs the headline catalog queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Headline set = the scan/join/agg/window/event queries that dominate a
production workload, plus the scale-path dedup/ANN operators (ngram
jaccard, MinHash-LSH, SimHash, SRP-LSH). The quadratic-by-construction
pairwise baselines (embedding_near_dup_pairs) are correctness features,
not throughput paths, and stay out of the headline wall clock (they'd
measure the test-data generator, not the engine).
"""

from __future__ import annotations

import gc
import json
import os
import time

from economic_data_etl_spark.plans import REGISTRY
from economic_data_etl_spark.session import get_spark

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
    "train_val_test_split",
    "variant_typed_extraction",
    "sketch_hll_distinct_rollup",
    "histogram_order_totalprice",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark(app_name="engine-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM + parquet footers once so we measure queries, not startup.
    REGISTRY["q1_pricing_summary"].spark(spark, sf_dir).collect()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        q = REGISTRY[name]
        start = time.perf_counter()
        q.spark(spark, sf_dir).collect()
        timings[name] = round(time.perf_counter() - start, 3)
        # Dedup operators persist() shared scans; drop them so later
        # queries aren't timed under earlier queries' storage pressure.
        # localCheckpoint RDDs (components/pagerank rounds) are pinned
        # until their Python DataFrames are collected — gc.collect()
        # lets the ContextCleaner unpersist them between queries.
        spark.catalog.clearCache()
        gc.collect()

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
