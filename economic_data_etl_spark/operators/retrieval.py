"""BM25 ranked retrieval over the document corpus.

The classic lexical search primitive (Robertson/Lucene BM25 with the
non-negative idf variant ln(1 + (N - df + 0.5)/(df + 0.5))): one token
explode feeds both the per-(doc, term) term frequencies and the
per-term document frequencies, corpus stats (N, avgdl) are a two-double
broadcast, and scoring is a pure JVM expression — no UDFs, one shuffle
for tf, one tiny one for df.

Scale shape: the tf aggregation is the only corpus-sized shuffle and it
is pre-filtered to the QUERY'S terms at the scan (predicate pushed into
the explode stream), so shuffle volume is O(matching postings), not
O(corpus tokens) — the inverted-index access pattern expressed
relationally.

No reference counterpart; extends the text surface next to TF hashing
and the trained-LM quality score.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# The shared explicit whitespace class (functions/text.py) — one
# definition so the Spark, DuckDB, and Python tokenizers cannot desync.
from economic_data_etl_spark.functions.text import WORD_SPLIT_RE as WORD_SPLIT


def bm25_scores(
    docs: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(id, score): BM25 of each document containing >= 1 query term.

    score = sum over query terms t of
        ln(1 + (N - df_t + 0.5)/(df_t + 0.5))
        * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl))
    """
    if not terms:
        raise ValueError("terms must be non-empty")
    toks = docs.select(
        F.col(id_col),
        F.filter(
            F.split(F.col(text_col), WORD_SPLIT), lambda t: t != ""
        ).alias("w"),
    )
    dl = toks.select(id_col, F.size("w").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    ex = toks.select(
        id_col, F.explode("w").alias("token")
    ).filter(F.col("token").isin(terms))
    tf = ex.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    df = ex.groupBy("token").agg(
        F.countDistinct(id_col).alias("df")
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tf_term = (
        F.col("tf")
        * (k1 + 1.0)
        / (
            F.col("tf")
            + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
        )
    )
    return (
        tf.join(df, "token")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(F.sum(idf * tf_term).alias("score"))
    )
