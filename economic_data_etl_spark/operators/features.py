"""Feature engineering for training pipelines: hashed term-frequency
(the "hashing trick") as a set-oriented Spark job.

Why hashing TF: a vocabulary-based vectorizer needs a fitted,
broadcast-everywhere vocabulary — a mutable global at 100 TB. Hashing
token → bucket = xxhash64(token) mod dim needs NO fitted state, is
embarrassingly parallel, and gives a fixed-width feature space any
downstream trainer can consume.

Shape: explode tokens → one groupBy (doc, bucket) count → one groupBy
doc re-assembling a sparse map. Two shuffles total, both on keys that
shrink with dim; no per-row O(dim) work (a fold-into-dense-array HOF
would cost O(tokens × dim) interpreted evaluations per row).

Not SQL-oracle-able (xxhash64 is Spark-specific); conservation laws are
tested instead: bucket counts sum to the exact token count per doc, and
bucket ids stay within [0, dim).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from economic_data_etl_spark.functions.text import tokens


def hashed_tf(
    df: DataFrame,
    id_col: str,
    text_col: str,
    dim: int = 1 << 18,
) -> DataFrame:
    """(id, features map<int,bigint>, n_tokens) — sparse hashed TF."""
    tok = df.select(
        F.col(id_col),
        F.explode(tokens(F.col(text_col))).alias("__tok"),
    )
    bucketed = tok.select(
        id_col,
        F.pmod(F.xxhash64("__tok"), F.lit(dim)).cast("int").alias("__bucket"),
    )
    return (
        bucketed.groupBy(id_col, "__bucket")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .groupBy(id_col)
        .agg(
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct("__bucket", "__cnt")))
            ).alias("features"),
            F.sum("__cnt").alias("n_tokens"),
        )
    )
