"""Hashed TF: conservation laws and bucket-range bounds."""

from __future__ import annotations

from pyspark.sql import functions as F

from economic_data_etl_spark.functions.text import token_count
from economic_data_etl_spark.operators.features import hashed_tf
from economic_data_etl_spark.sources.tables import load_table


class TestHashedTf:
    def test_counts_conserved_and_buckets_bounded(self, spark, sf_dir):
        dim = 1 << 12
        docs = load_table(spark, sf_dir, "documents").filter(
            F.col("text").isNotNull()
        )
        feats = hashed_tf(docs, "doc_id", "text", dim=dim).persist()

        # conservation: map values sum to the exact token count per doc
        joined = feats.join(
            docs.select(
                "doc_id", token_count(F.col("text")).alias("want_tokens")
            ),
            "doc_id",
        )
        mismatches = joined.filter(
            F.col("n_tokens") != F.col("want_tokens")
        ).count()
        assert mismatches == 0
        per_map = joined.withColumn(
            "map_sum",
            F.aggregate(
                F.map_values("features"), F.lit(0).cast("long"), lambda a, x: a + x
            ),
        )
        assert per_map.filter(F.col("map_sum") != F.col("n_tokens")).count() == 0

        # bucket ids within [0, dim)
        bad = feats.select(
            F.explode(F.map_keys("features")).alias("b")
        ).filter((F.col("b") < 0) | (F.col("b") >= dim))
        assert bad.count() == 0
        feats.unpersist()

    def test_deterministic_across_layouts(self, spark, sf_dir):
        docs = load_table(spark, sf_dir, "documents")
        a = hashed_tf(docs, "doc_id", "text", dim=256).collect()
        b = hashed_tf(docs.repartition(7), "doc_id", "text", dim=256).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
