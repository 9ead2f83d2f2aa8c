"""Similarity-search and vector-analytics queries over `embeddings`.

Brute-force cosine top-k is the exact baseline (oracle-checked against
DuckDB's list_cosine_similarity); SRP-LSH top-k is the approximate scale
path (rows-only — the hash family is not SQL-portable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from economic_data_etl_spark.functions.vectors import l2_norm
from economic_data_etl_spark.operators import similarity
from economic_data_etl_spark.plans.catalog import biased_round, register
from economic_data_etl_spark.sources.tables import load_table

_N_QUERIES = 5
_K = 10


@register(
    "ann_cosine_topk_bruteforce",
    oracle=f"""
        WITH q AS (
            SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv
            FROM embeddings WHERE vec_id < {_N_QUERIES}
        ), scored AS (
            SELECT q.q_id, e.vec_id,
                   ROUND(5e-10 + list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 4)
                       AS score
            FROM embeddings e, q
            WHERE e.vec_id <> q.q_id
        )
        SELECT q_id, vec_id, score, rank FROM (
            SELECT q_id, vec_id, score,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY q_id ORDER BY score DESC, vec_id ASC
                   ) AS INT) AS rank
            FROM scored
        ) t
        WHERE rank <= {_K}
        ORDER BY q_id, rank
    """,
    doc="Exact cosine top-10 for 5 query vectors: broadcast queries, one corpus scan, "
    "grouped top-k window. JVM-side zip_with/aggregate dot products.",
)
def ann_cosine_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    return (
        similarity.brute_force_topk(emb, queries, k=_K)
        .select("q_id", "vec_id", "score", "rank")
        .orderBy("q_id", "rank")
    )


@register(
    "ann_cosine_topk_int8",
    oracle=f"""
        WITH qz AS (
            SELECT vec_id,
                   list_transform(
                       embedding::DOUBLE[],
                       x -> floor(x * 127.0 / mx + 0.5)) AS qv
            FROM (
                SELECT vec_id, embedding,
                       list_max(list_transform(
                           embedding::DOUBLE[], x -> abs(x))) AS mx
                FROM embeddings
            )
        ), q AS (
            SELECT vec_id AS q_id, qv AS query_qv
            FROM qz WHERE vec_id < {_N_QUERIES}
        ), scored AS (
            SELECT q.q_id, e.vec_id,
                   ROUND(5e-10 + list_cosine_similarity(e.qv, q.query_qv), 4)
                       AS score
            FROM qz e, q
            WHERE e.vec_id <> q.q_id
        )
        SELECT q_id, vec_id, score, rank FROM (
            SELECT q_id, vec_id, score,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY q_id ORDER BY score DESC, vec_id ASC
                   ) AS INT) AS rank
            FROM scored
        ) t
        WHERE rank <= {_K}
        ORDER BY q_id, rank
    """,
    doc="Cosine top-10 over int8-QUANTIZED embeddings (4× smaller "
    "vectors; similarity.quantize_int8): per-vector scales cancel in "
    "the cosine ratio, so ranking survives quantization (recall vs "
    "exact pinned >= 0.9 in tests/test_ann.py). Integer dot products "
    "are bit-exact across engines, making this oracle STRICTER than "
    "the float baseline's.",
)
def ann_cosine_topk_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", similarity.quantize_int8(F.col("embedding")).alias("embedding")
    )
    queries = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    return (
        similarity.brute_force_topk(emb, queries, k=_K)
        .select("q_id", "vec_id", "score", "rank")
        .orderBy("q_id", "rank")
    )


@register(
    "ann_cosine_topk_lsh",
    oracle=None,
    doc="Approximate top-10 via multi-table SRP-LSH (8 tables x 6 bits, 1-bit "
    "multi-probe); scores only bucket-collided vectors.",
)
def ann_cosine_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    return similarity.lsh_topk(emb, queries, k=_K, bits=6, tables=8, dim=64).orderBy(
        "q_id", "rank"
    )


@register(
    "embedding_near_dup_pairs",
    oracle="""
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               ROUND(5e-10 + list_cosine_similarity(
                   a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS cosine
        FROM embeddings a
        JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(
                  a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.4
        ORDER BY id_a, id_b
    """,
    doc="Embedding near-dup pairs (cosine >= 0.4), exact pairwise baseline.",
)
def embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    out = similarity.cosine_near_dup_pairs(emb, threshold=0.4)
    # Re-filter on the unrounded value like the oracle does: round() is only
    # display precision; threshold must bind pre-rounding on both sides.
    return out.orderBy("id_a", "id_b")


@register(
    "embedding_stats_by_label",
    oracle="""
        SELECT label,
               COUNT(*) AS n,
               ROUND(5e-10 + AVG(sqrt(list_sum(
                   list_transform(embedding::DOUBLE[], x -> x * x)))), 4)
                   AS avg_norm,
               ROUND(5e-10 + AVG(embedding[1]), 4) AS avg_first_dim
        FROM embeddings
        GROUP BY label
        ORDER BY label
    """,
    doc="Per-label embedding stats: count, mean L2 norm, mean first component.",
)
def embedding_stats_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            biased_round(F.avg(l2_norm(F.col("embedding")))).alias("avg_norm"),
            biased_round(
                F.avg(F.element_at(F.col("embedding").cast("array<double>"), 1))
            ).alias("avg_first_dim"),
        )
        .orderBy("label")
    )


@register(
    "ann_cosine_topk_ivf",
    oracle=None,
    doc="Approximate top-10 via a trained IVF index (operators/ivf.py): "
    "8 Lloyd-trained centroids, 3-cluster probes. Training collects "
    "only k x dim floats; probe assignment is a pure expression over "
    "driver-constant centroids (no query-side collect); the probe join "
    "scans ~n_probe/k of the corpus. Deterministic (seeded from the "
    "first k vectors by id), rows-only check; recall >= 0.9 vs the "
    "exact baseline is pinned in tests/test_ann.py.",
)
def ann_cosine_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from economic_data_etl_spark.operators import ivf

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    centroids = ivf.train_ivf(emb, k=8, iters=2)
    if not centroids:  # empty corpus → empty top-k, same schema
        return spark.createDataFrame(
            [], "q_id long, vec_id long, score double, rank int"
        )
    return ivf.ivf_topk(
        emb, queries, centroids, k=_K, n_probe=3
    ).orderBy("q_id", "rank")


@register(
    "ann_cosine_topk_pq",
    oracle=None,
    doc="Approximate top-10 via product quantization + exact re-rank "
    "(operators/pq.py): 8 subspaces x 32 centroids trained on a "
    "constant-size driver sample, corpus stored as 8 codes/vector "
    "(32x compression), ADC scoring through a per-query LUT, then an "
    "exact cosine re-rank of the 100-row shortlist. Deterministic "
    "(fixed sample, init, tie order); rows-only check; recall >= 0.9 "
    "vs exact pinned in tests/test_ann.py.",
)
def ann_cosine_topk_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from economic_data_etl_spark.operators import pq

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    books = pq.train_pq(emb, m=8, k=32, iters=5)
    if not books:  # empty corpus → empty top-k, same schema
        return spark.createDataFrame(
            [], "q_id long, vec_id long, score double, rank int"
        )
    return pq.pq_topk_rerank(
        emb, queries, books, k=_K, shortlist=100
    ).orderBy("q_id", "rank")
