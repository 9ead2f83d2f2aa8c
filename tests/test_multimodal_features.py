"""Multimodal feature-extraction plumbing: payload → deterministic feature
vector → ANN search over the extracted features (the full decode→embed→
search composition a real multimodal pipeline runs)."""

from __future__ import annotations

from pyspark.sql import functions as F

from economic_data_etl_spark.operators import similarity
from economic_data_etl_spark.operators.multimodal import (
    attach_binary_payload,
    extract_features,
)
from economic_data_etl_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


class TestFeatureExtraction:
    def test_deterministic_fixed_dim(self, spark):
        docs = load_table(spark, SF_DIR, "documents").limit(50)
        feats1 = extract_features(attach_binary_payload(docs), dim=16)
        feats2 = extract_features(attach_binary_payload(docs), dim=16)
        assert feats1.schema["features"].dataType.simpleString() == "array<float>"
        r1 = {r["doc_id"]: r["features"] for r in feats1.collect()}
        r2 = {r["doc_id"]: r["features"] for r in feats2.collect()}
        assert r1 == r2
        assert all(len(v) == 16 for v in r1.values())

    def test_resize_shrinks_by_factor(self, spark):
        from economic_data_etl_spark.operators.multimodal import resize_media

        docs = load_table(spark, SF_DIR, "documents").limit(30)
        resized = resize_media(attach_binary_payload(docs), factor=4)
        rows = resized.collect()
        assert rows
        for r in rows:
            assert r["resized_bytes"] == -(-r["orig_bytes"] // 4)  # ceil div
            assert len(r["resized"]) == r["resized_bytes"]

    def test_features_feed_ann_search(self, spark):
        docs = load_table(spark, SF_DIR, "documents").limit(100)
        feats = extract_features(attach_binary_payload(docs), dim=16)
        corpus = feats.withColumnRenamed("doc_id", "vec_id").withColumnRenamed(
            "features", "embedding"
        )
        queries = corpus.filter(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("q_id"), "embedding"
        )
        topk = similarity.brute_force_topk(corpus, queries, k=5).collect()
        assert len(topk) == 15  # 3 queries x top-5
        assert all(1 <= r["rank"] <= 5 for r in topk)
