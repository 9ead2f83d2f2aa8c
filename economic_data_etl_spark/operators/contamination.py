"""Benchmark decontamination: n-gram overlap between a training corpus
and a benchmark/eval set.

The standard LLM-training hygiene step: any training document sharing
enough word n-grams with an eval document is flagged (and usually
dropped) so benchmark numbers aren't inflated by memorization.

Design for 100 TB:

- The benchmark side is SMALL relative to the corpus (eval sets are
  thousands of docs, the corpus is billions), so its exploded shingle
  index is broadcast — the corpus-side scan streams through a broadcast
  hash join with NO shuffle of the training corpus at all.
- Shingling is the same pure-expression `word_shingles` the dedup stack
  uses (distinct n-grams per doc, no explode until the index build).
- Overlap counting groups by (train doc, bench doc) — cardinality is
  bounded by actual collisions, not the cross product.

No reference-repo counterpart (the reference has no text operators);
this extends SURVEY.md §2.11's training-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from economic_data_etl_spark.functions.text import word_shingles


def contamination_report(
    train: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    min_overlap: int = 3,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Per training doc: worst-offender benchmark doc and overlap stats.

    Returns (train_id, n_bench_hits, max_overlap, worst_bench_id) for
    every training doc sharing >= min_overlap distinct word n-grams with
    at least one benchmark doc. `worst_bench_id` ties break to the
    smallest benchmark id so the result is deterministic.
    """
    t_inv = train.select(
        F.col(id_col).alias("train_id"),
        F.explode(word_shingles(F.col(text_col), n)).alias("shingle"),
    )
    b_inv = bench.select(
        F.col(id_col).alias("bench_id"),
        F.explode(word_shingles(F.col(text_col), n)).alias("shingle"),
    )
    if broadcast_bench:
        b_inv = F.broadcast(b_inv)
    overlaps = (
        t_inv.join(b_inv, "shingle")
        .groupBy("train_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("overlap"))
        .filter(F.col("overlap") >= min_overlap)
    )
    # argmax with deterministic ties: max_by on (overlap, -bench_id).
    return (
        overlaps.groupBy("train_id")
        .agg(
            F.count(F.lit(1)).alias("n_bench_hits"),
            F.max("overlap").alias("max_overlap"),
            F.max_by(
                "bench_id", F.struct(F.col("overlap"), -F.col("bench_id"))
            ).alias("worst_bench_id"),
        )
    )


def contaminated_spans(
    train: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
) -> DataFrame:
    """(id, span_start, span_end): maximal token spans of training
    docs covered by k-grams that occur ANYWHERE in the benchmark set —
    the span set GPT-3-style decontamination excises (remove the
    overlap, keep the document).

    Shape at 100 TB: the bench k-gram set is built with the SAME
    positioned-gram builder the substring-dedup stack uses (format
    consistency by construction) and broadcast, so the corpus streams
    through a broadcast hash join with no corpus shuffle; the only
    per-doc wide op (span merge) carries HIT occurrences only.
    """
    from economic_data_etl_spark.operators.substring import (
        kgram_occurrences,
        merge_spans,
    )

    occ = kgram_occurrences(train, id_col, text_col, k)
    bgrams = (
        kgram_occurrences(bench, id_col, text_col, k)
        .select("gram")
        .distinct()
    )
    hits = occ.join(F.broadcast(bgrams), "gram").select(id_col, "pos")
    return merge_spans(hits, id_col, k)


def remove_contaminated_spans(
    train: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
) -> DataFrame:
    """Training docs with benchmark-overlapping spans excised: adds
    ``clean_text`` and ``n_clean_tokens`` (same reassembly as
    substring dedup's span removal). Dropping whole contaminated docs
    wastes data; excising just the overlapping windows is the standard
    middle ground."""
    from economic_data_etl_spark.operators.substring import excise_spans

    spans = contaminated_spans(train, bench, id_col, text_col, k)
    return excise_spans(train, spans, id_col, text_col)
