"""Johnson-Lindenstrauss random projection over the embeddings table.

Dimensionality reduction is the standard pre-pass for ANN at scale:
project 64-dim vectors onto a k-dim subspace with a random ±1 sign
matrix (Achlioptas 2003 — database-friendly random projections), scaled
by 1/sqrt(k), and distances are preserved within (1±eps). The sign
matrix is NOT stored anywhere: entry (k, j) is derived from a shared
LCG formula `((1103515245 * (k*d + j) + 12345) mod 2^31 div 2^16) mod 2`
computed with exact integer arithmetic in BOTH engines, so the oracle
needs no side-channel data and the projection is reproducible on any
executor without broadcasting a matrix — at 100 TB the projection is a
pure map stage (zero shuffle, zero driver state).

Spark side stays JVM-native: the per-component sign array is built once
as a literal column (driver-side Python LCG over d probed from the
schema's first row), then `zip_with` multiply + left-to-right
`aggregate` fold — the same deterministic-order dot product the
brute-force ANN baseline uses (functions/vectors.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from economic_data_etl_spark.functions.vectors import dot_product
from economic_data_etl_spark.plans.catalog import biased_round, register
from economic_data_etl_spark.sources.tables import load_table

_K_OUT = 4  # projected components exposed as columns p0..p3


def _lcg_sign(i: int) -> float:
    """±1.0 from the shared integer LCG; must match the SQL formula."""
    return 1.0 if ((1103515245 * i + 12345) % 2**31) // 2**16 % 2 == 1 else -1.0


def _oracle_component(k: int) -> str:
    """DuckDB expression for projected component k (same LCG, in SQL)."""
    return (
        "ROUND(5e-10 + list_dot_product(embedding::DOUBLE[], "
        f"[CASE WHEN ((1103515245 * ({k} * len(embedding) + j) + 12345) "
        "% 2147483648) // 65536 % 2 = 1 THEN 1.0 ELSE -1.0 END "
        "FOR j IN range(0, len(embedding))]) / 2.0, 4)"
        f" AS p{k}"
    )


@register(
    "embedding_random_projection",
    oracle="SELECT vec_id, "
    + ", ".join(_oracle_component(k) for k in range(_K_OUT))
    + " FROM embeddings ORDER BY vec_id",
    doc="JL random projection of every embedding onto 4 components via "
    "a derive-on-the-fly ±1 LCG sign matrix (scale 1/sqrt(4)): the "
    "projection itself is a pure map stage (no shuffle, no broadcast "
    "state; only the presentation orderBy exchanges), deterministic "
    "fold order on both engines. The oracle regenerates the identical "
    "signs from the same integer LCG inside SQL.",
)
def embedding_random_projection(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    # Dimension probe: schema-level metadata is not enough (array<float>
    # carries no length), so read ONE row — constant driver work.
    first = emb.select(F.size("embedding").alias("d")).first()
    d = int(first["d"]) if first is not None else 0
    cols = [F.col("vec_id")]
    for k in range(_K_OUT):
        signs = F.array(
            *[F.lit(_lcg_sign(k * d + j)) for j in range(d)]
        )
        cols.append(
            biased_round(
                dot_product(F.col("embedding"), signs) / F.lit(2.0)
            ).alias(f"p{k}")
        )
    return emb.select(*cols).orderBy("vec_id")


@register(
    "embedding_dim_stats",
    oracle="""
        SELECT CAST(i - 1 AS INT) AS dim,
               CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(5e-10 + AVG(embedding[i]::DOUBLE), 4) AS mean_val,
               ROUND(5e-10 + STDDEV_SAMP(embedding[i]::DOUBLE), 4)
                   AS std_val,
               ROUND(5e-10 + MIN(embedding[i]::DOUBLE), 4) AS min_val,
               ROUND(5e-10 + MAX(embedding[i]::DOUBLE), 4) AS max_val
        FROM embeddings,
             UNNEST(generate_series(1, len(embedding))) AS t(i)
        GROUP BY i
        ORDER BY dim
    """,
    doc="Per-dimension profile of the embedding column (mean/std/min/"
    "max) — the fit step of a feature standardizer and the first "
    "diagnostic for a degenerate encoder (dead or exploding dims). "
    "posexplode keys the aggregation on the dimension index: partial "
    "(map-side) aggregation collapses every task to at most `dim` "
    "rows before the shuffle, so the exchange moves dim x n_tasks "
    "rows regardless of corpus size.",
)
def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    exploded = emb.select(
        F.posexplode("embedding").alias("dim", "x")
    ).withColumn("x", F.col("x").cast("double"))
    return (
        exploded.groupBy("dim")
        .agg(
            F.count(F.lit(1)).alias("n"),
            biased_round(F.avg("x")).alias("mean_val"),
            biased_round(F.stddev_samp("x")).alias("std_val"),
            biased_round(F.min("x")).alias("min_val"),
            biased_round(F.max("x")).alias("max_val"),
        )
        .orderBy("dim")
    )
