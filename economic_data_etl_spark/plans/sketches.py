"""Mergeable-sketch aggregates (Apache DataSketches HLL, Spark 3.5+).

The 100 TB pattern: COUNT(DISTINCT) re-shuffles raw keys for every
grouping level — the single most expensive aggregate in a rollup
hierarchy. A mergeable sketch is aggregated ONCE at the finest grain;
every coarser level is a cheap union of tiny binary sketches (bytes, not
keys), which is also what makes incremental/continuous rollups possible:
yesterday's sketches merge with today's without touching yesterday's
rows. sketch-of-union == union-of-sketches is proven exactly in
tests/test_sketches.py, alongside a <5% relative-error bound against the
exact distinct count.

Rows-only driver check: DuckDB's approx_distinct uses a different sketch
implementation, so estimates are engine-specific by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from economic_data_etl_spark.plans.catalog import register
from economic_data_etl_spark.sources.tables import load_table


def per_type_user_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Finest-grain sketch table: one HLL of user_id per event_type."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )


@register(
    "sketch_hll_distinct_rollup",
    oracle=None,
    doc="Distinct users per event_type AND overall from ONE pass of "
    "sketching: per-type HLL sketches (hll_sketch_agg), overall = "
    "hll_union_agg over the per-type sketches — the raw user_id keys "
    "are never re-shuffled for the coarser level. Rows-only check "
    "(estimates are sketch-implementation-specific); merge-exactness "
    "and <5% error vs exact are pinned in tests/test_sketches.py.",
)
def sketch_hll_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    sketches = per_type_user_sketches(spark, sf_dir)
    per_type = sketches.select(
        "event_type",
        F.hll_sketch_estimate("sk").alias("approx_users"),
    )
    overall = sketches.agg(F.hll_union_agg("sk").alias("sk")).select(
        F.lit("ALL").alias("event_type"),
        F.hll_sketch_estimate("sk").alias("approx_users"),
    )
    return per_type.unionByName(overall).orderBy("event_type")


# --------------------------------------------------------------------------
# Exact heavy hitters via Misra-Gries candidate pruning.
# --------------------------------------------------------------------------
_HH_K = 1000  # threshold n/k: above-average bigrams over the ~930-bigram vocab


@register(
    "sketch_heavy_hitters_bigrams",
    oracle=f"""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(string_split_regex(text, '[ \\t\\n\\r]+'),
                             x -> x <> '') AS w
          FROM documents
        ), g0 AS (
          SELECT doc_id, w,
                 unnest(CASE WHEN len(w) >= 2
                             THEN generate_series(1, len(w) - 1)
                             ELSE [] END) AS i
          FROM toks
        ), bg AS (
          SELECT array_to_string(w[i:i+1], ' ') AS bigram FROM g0
        ), tot AS (SELECT COUNT(*) AS n FROM bg),
        cnt AS (SELECT bigram, COUNT(*) AS c FROM bg GROUP BY bigram)
        SELECT bigram, CAST(c AS BIGINT) AS freq
        FROM cnt, tot
        WHERE c * {_HH_K} > n
        ORDER BY freq DESC, bigram
    """,
    doc=f"EXACT heavy hitters (bigram freq > n/{_HH_K}) by Misra-Gries "
    "candidate pruning + exact recount (operators/heavyhitters.py): one "
    "scan emits a bounded (<= k rows/partition) MG summary whose "
    "pigeonhole guarantee provably contains every true heavy hitter, a "
    "broadcast semi-join recounts only candidates — so the output is "
    "exact and SQL-checkable, while the shuffle never carries the full "
    "frequency table. Completes the sketch family next to the HLL "
    "rollup.",
)
def sketch_heavy_hitters_bigrams(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from economic_data_etl_spark.operators.heavyhitters import (
        heavy_hitters_exact,
    )
    from economic_data_etl_spark.operators.substring import (
        kgram_occurrences,
    )

    docs = load_table(spark, sf_dir, "documents")
    bigrams = kgram_occurrences(docs, "doc_id", "text", 2).select(
        F.col("gram").alias("bigram")
    )
    return heavy_hitters_exact(bigrams, "bigram", _HH_K).orderBy(
        F.desc("freq"), "bigram"
    )
