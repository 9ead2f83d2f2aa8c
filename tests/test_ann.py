"""ANN quality tests: the approximate tiers (SRP-LSH, IVF) must recover a
healthy fraction of the exact brute-force top-10."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from economic_data_etl_spark.operators import ivf, similarity
from economic_data_etl_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus(spark):
    return load_table(spark, SF_DIR, "embeddings")


@pytest.fixture(scope="module")
def queries(spark, corpus):
    return corpus.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )


@pytest.fixture(scope="module")
def exact_topk(spark, corpus, queries):
    rows = similarity.brute_force_topk(corpus, queries, k=10).collect()
    out: dict[int, set[int]] = {}
    for r in rows:
        out.setdefault(r["q_id"], set()).add(r["vec_id"])
    return out


def _recall(approx_rows, exact: dict[int, set[int]]) -> float:
    got: dict[int, set[int]] = {}
    for r in approx_rows:
        got.setdefault(r["q_id"], set()).add(r["vec_id"])
    recalls = [
        len(got.get(q, set()) & hits) / len(hits) for q, hits in exact.items()
    ]
    return sum(recalls) / len(recalls)


class TestAnnRecall:
    def test_lsh_recall(self, spark, corpus, queries, exact_topk):
        rows = similarity.lsh_topk(corpus, queries, k=10, bits=8, dim=64).collect()
        assert _recall(rows, exact_topk) >= 0.5  # multi-probe 8-bit SRP

    def test_ivf_recall(self, spark, corpus, queries, exact_topk):
        centroids = ivf.train_ivf(corpus, k=8, iters=2)
        rows = ivf.ivf_topk(corpus, queries, centroids, k=10, n_probe=3).collect()
        assert _recall(rows, exact_topk) >= 0.5

    def test_int8_quantized_recall(self, spark, corpus, queries, exact_topk):
        """int8 codes are 4x smaller; cosine ranking must survive the
        +-0.5 rounding noise nearly intact."""
        qcorpus = corpus.select(
            "vec_id",
            similarity.quantize_int8(F.col("embedding")).alias("embedding"),
        )
        qqueries = queries.select(
            "q_id",
            similarity.quantize_int8(F.col("embedding")).alias("embedding"),
        )
        rows = similarity.brute_force_topk(qcorpus, qqueries, k=10).collect()
        assert _recall(rows, exact_topk) >= 0.9

    def test_int8_codes_fit_in_a_byte(self, spark, corpus):
        codes = corpus.select(
            similarity.quantize_int8(
                F.col("embedding"), as_storage=True
            ).alias("q")
        )
        assert codes.schema["q"].dataType.simpleString() == "array<tinyint>"
        bad = codes.select(F.explode("q").alias("c")).filter(
            (F.col("c") > 127) | (F.col("c") < -127)
        )
        assert bad.count() == 0

    def test_ivf_deterministic(self, spark, corpus):
        c1 = ivf.train_ivf(corpus, k=4, iters=1)
        c2 = ivf.train_ivf(corpus, k=4, iters=1)
        assert c1 == c2


class TestPQ:
    def test_pq_rerank_recall(self, spark, corpus, queries, exact_topk):
        from economic_data_etl_spark.operators import pq

        books = pq.train_pq(corpus, m=8, k=32, iters=5)
        rows = pq.pq_topk_rerank(
            corpus, queries, books, k=10, shortlist=100
        ).collect()
        assert _recall(rows, exact_topk) >= 0.9

    def test_pq_codes_shape_and_determinism(self, spark, corpus):
        from economic_data_etl_spark.operators import pq

        b1 = pq.train_pq(corpus, m=8, k=16, iters=2)
        b2 = pq.train_pq(corpus, m=8, k=16, iters=2)
        assert b1 == b2  # deterministic sample + init + reductions
        enc = pq.pq_encode(corpus, b1).select("vec_id", "codes", "recon_norm")
        rows = enc.collect()
        assert all(len(r["codes"]) == 8 for r in rows)
        assert all(0 <= c < 16 for r in rows for c in r["codes"])
        assert all(r["recon_norm"] > 0 for r in rows)


class TestIvfPartitionPruning:
    def test_cluster_partitioned_layout_prunes_probe_reads(
        self, spark, sf_dir, tmp_path
    ):
        """The IVF scale story: the corpus written `partitionBy(cluster)`
        means a probe touches only its clusters' files. Pin that the
        scan actually prunes (PartitionFilters on cluster, and the
        pruned plan reads fewer files than the full layout)."""
        import contextlib
        import io as _io

        from pyspark.sql import functions as F

        from economic_data_etl_spark.operators.ivf import (
            assign_clusters,
            train_ivf,
        )
        from economic_data_etl_spark.sources.tables import load_table

        emb = load_table(spark, sf_dir, "embeddings")
        cents = train_ivf(emb, k=8, iters=1)
        path = str(tmp_path / "ivf_layout")
        assign_clusters(emb, cents).write.partitionBy("cluster").parquet(
            path
        )

        probed = spark.read.parquet(path).filter(
            F.col("cluster").isin([1, 3])
        )
        buf = _io.StringIO()
        with contextlib.redirect_stdout(buf):
            probed.explain("formatted")
        plan = buf.getvalue()
        assert "PartitionFilters" in plan
        assert "cluster" in plan.split("PartitionFilters", 1)[1][:200]
        # the pruned read must deliver exactly the probed clusters
        got = {
            r["cluster"]
            for r in probed.select("cluster").distinct().collect()
        }
        assert got <= {1, 3}
