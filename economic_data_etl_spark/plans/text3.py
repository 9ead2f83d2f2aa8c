"""Collocation mining over the documents corpus: bigram lift (the
exponential of PMI) computed with exact integer counts.

The score is `lift = P(w1,w2) / (P(w1) * P(w2)) = c12 * N_uni^2 /
(N_bi * c1 * c2)` — a ratio of exact integer products, so both engines
compute bit-identical doubles (no transcendental functions whose last
ulp could differ across libm implementations; PMI itself is just
ln(lift) and is left to the caller). All counts stay well inside the
2^53 exact-integer range of a double at any catalog scale factor.

Plan shape at 100 TB: one explode+groupBy per n-gram order (the
classic word-count shuffle, map-side combined), the tiny total counts
broadcast, and the bigram->unigram joins keyed on the word — the same
pattern as TF-IDF (plans/text2.py). No self-joins, no driver state.

Reference parity: the reference has no text analytics; this extends
the documents-table surface (SURVEY.md §2.11 north star).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from economic_data_etl_spark.plans.catalog import biased_round, register
from economic_data_etl_spark.sources.tables import load_table


@register(
    "text_bigram_collocations",
    oracle="""
    WITH toks AS (
        SELECT string_split(text, ' ') AS t FROM documents
    ), uni AS (
        SELECT u.w AS w, COUNT(*) AS c
        FROM toks, UNNEST(t) AS u(w)
        GROUP BY 1
    ), bi AS (
        SELECT t[i] AS w1, t[i + 1] AS w2, COUNT(*) AS c12
        FROM toks, UNNEST(range(1, len(t))) AS r(i)
        GROUP BY 1, 2
    ), totals AS (
        SELECT (SELECT SUM(c) FROM uni) AS n_uni,
               (SELECT SUM(c12) FROM bi) AS n_bi
    )
    SELECT b.w1, b.w2, b.c12,
           ROUND(5e-10 + (b.c12 * CAST(t.n_uni AS DOUBLE) * t.n_uni)
                 / (t.n_bi * CAST(u1.c AS DOUBLE) * u2.c),
                 4) AS lift
    FROM bi b
    JOIN uni u1 ON u1.w = b.w1
    JOIN uni u2 ON u2.w = b.w2
    CROSS JOIN totals t
    WHERE b.c12 >= 5
    ORDER BY lift DESC, b.w1, b.w2
    LIMIT 20
    """,
    doc="Top-20 bigram collocations by lift (exp(PMI)) with a min-count "
    "of 5: adjacent-pair explode via an in-stage index transform (one "
    "shuffle per n-gram order), unigram counts joined back on the word "
    "key, scalar totals broadcast. Deterministic total order "
    "(lift desc, w1, w2) so LIMIT picks the same set in both engines.",
)
def text_bigram_collocations(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.split("text", " ").alias("t"))
    uni = (
        toks.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # Adjacent pairs in-stage; guard size>=2 before sequence() because
    # sequence(2, 1) would count DOWN (implicit -1 step).
    bi = (
        toks.filter(F.size("t") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(2, size(t)),"
                    " i -> struct(t[i - 2] AS w1, t[i - 1] AS w2))"
                )
            ).alias("b")
        )
        .groupBy("b.w1", "b.w2")
        .agg(F.count(F.lit(1)).alias("c12"))
    )
    totals = uni.agg(F.sum("c").alias("n_uni")).crossJoin(
        bi.agg(F.sum("c12").alias("n_bi"))
    )
    return (
        bi.filter(F.col("c12") >= 5)
        .join(uni.withColumnRenamed("w", "w1").withColumnRenamed("c", "c1"), "w1")
        .join(uni.withColumnRenamed("w", "w2").withColumnRenamed("c", "c2"), "w2")
        .crossJoin(F.broadcast(totals))
        .select(
            "w1",
            "w2",
            "c12",
            biased_round(
                (
                    F.col("c12")
                    * F.col("n_uni").cast("double")
                    * F.col("n_uni")
                )
                / (
                    F.col("n_bi")
                    * F.col("c1").cast("double")
                    * F.col("c2")
                )
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "w1", "w2")
        .limit(20)
    )
