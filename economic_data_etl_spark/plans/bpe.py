"""BPE merge-training + tokenization catalog queries.

`bpe_train_merges` is rows-only by design (30 iterations of
argmax-over-pair-counts with re-merged histograms is not
SQL-expressible), so per the repo's invariant-certification doctrine
it is paired with `inv_bpe_conservation`, whose value hash anchors the
training cross-engine: DuckDB independently recomputes the corpus word
histogram, the total/distinct word counts, the initial symbol count,
and — the training anchor — the RANK-1 MERGE (the most frequent
adjacent symbol pair including the </w> sentinel, with the exact
(count desc, pair) tie-break the trainer uses), while the Spark side
additionally proves the tokenizer's conservation laws over every
document (reconstruction, symbol-count accounting, monotonicity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from economic_data_etl_spark.plans.catalog import register
from economic_data_etl_spark.sources.tables import load_table

_NUM_MERGES = 30
_MAX_WORDS = 65536


@register(
    "bpe_train_merges",
    oracle=None,  # iterative merge learning is not SQL-expressible;
    # certified by inv_bpe_conservation (rank-1 merge recomputed by
    # DuckDB exactly + conservation laws over every document)
    doc="Learn a 30-merge BPE vocabulary from the documents corpus "
    "(operators/bpe.py): one distributed shuffle builds the word "
    "histogram, merge learning runs on the (vocab-bounded) histogram "
    "with deterministic (count desc, pair) tie-breaks, so the merge "
    "table is exactly reproducible — the rows-only hash is stable. "
    "Returns (rank, left, right, merged, pair_count) in merge order.",
)
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from economic_data_etl_spark.operators.bpe import train_bpe_merges

    docs = load_table(spark, sf_dir, "documents")
    merges = train_bpe_merges(
        docs, num_merges=_NUM_MERGES, max_words=_MAX_WORDS
    )
    rows = [
        (i + 1, a, b, a + b, int(c))
        for i, (a, b, c) in enumerate(merges)
    ]
    return spark.createDataFrame(
        rows, "rank int, left string, right string, merged string, "
        "pair_count long"
    ).orderBy("rank")


@register(
    "inv_bpe_conservation",
    oracle="""
        WITH words AS (
            -- the explicit class mirrors operators/bpe.py's
            -- WORD_SPLIT_RE: Java/RE2/Python \\s dialects disagree on
            -- \\x0B and Unicode whitespace, [ \\t\\n\\r]+ does not
            SELECT unnest(list_filter(
                       string_split_regex(text, '[ \\t\\n\\r]+'),
                       x -> x <> ''
                   )) AS w
            FROM documents
        ),
        hist AS (SELECT w, COUNT(*) AS c FROM words GROUP BY w),
        syms AS (
            SELECT c,
                   list_append(
                       list_filter(string_split(w, ''), ch -> ch <> ''),
                       '</w>'
                   ) AS s
            FROM hist
        ),
        pairs AS (
            -- weighted adjacent-symbol pairs, </w> sentinel included:
            -- the trainer's rank-1 merge is the argmax of exactly this
            SELECT s[i] AS a, s[i + 1] AS b, SUM(c) AS cnt
            FROM syms, UNNEST(range(1, len(s))) AS t(i)
            GROUP BY 1, 2
        ),
        first_merge AS (
            SELECT a, b, cnt FROM pairs ORDER BY cnt DESC, a, b LIMIT 1
        ),
        totals AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS total_words,
                   CAST(SUM(len(w)) AS BIGINT) AS total_word_chars,
                   CAST(COUNT(DISTINCT w) AS BIGINT) AS distinct_words
            FROM words
        ),
        d AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents)
        SELECT d.n_docs,
               t.total_words,
               t.total_word_chars,
               t.distinct_words,
               CAST(t.total_words + t.total_word_chars AS BIGINT)
                   AS initial_symbols,
               f.a AS first_merge_left,
               f.b AS first_merge_right,
               CAST(f.cnt AS BIGINT) AS first_merge_count,
               true AS histogram_untruncated,
               true AS reconstruction_ok,
               true AS conservation_ok,
               true AS monotone_ok
        FROM d, totals t, first_merge f
    """,
    doc="Certifies BPE training + tokenization (operators/bpe.py) "
    "cross-engine: DuckDB independently rebuilds the word histogram "
    "and recomputes total/distinct words, total word chars, the "
    "initial symbol count (chars + one </w> per word), and the RANK-1 "
    "MERGE — the most frequent adjacent symbol pair with the "
    "trainer's exact tie-break — so a tokenization drift, a "
    "miscounted histogram, or a wrong first argmax flips the value "
    "hash. The Spark side additionally proves, over EVERY document, "
    "that the greedy encoder reconstructs each word exactly "
    "(reconstruction_ok), that tokens_after == initial_symbols − "
    "merge applications (each application removes exactly one "
    "symbol: conservation_ok), that tokenization never expands "
    "(monotone_ok), and that the vocab-bounded histogram collect was "
    "NOT truncated on this corpus (histogram_untruncated — "
    "distinct_words < max_words), so the driver row certifies the "
    "untruncated training path.",
)
def inv_bpe_conservation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from economic_data_etl_spark.operators.bpe import (
        tokenize_stats,
        train_bpe_merges,
        word_histogram,
    )

    docs = load_table(spark, sf_dir, "documents")
    merges = train_bpe_merges(
        docs, num_merges=_NUM_MERGES, max_words=_MAX_WORDS
    )
    if merges:
        first_left, first_right, first_count = merges[0]
    else:
        # empty corpus: no pairs exist — emit a sentinel all-zero
        # aggregate row instead of crashing (the empty-slice contract)
        first_left, first_right, first_count = "", "", 0
    word_stats = word_histogram(docs).agg(
        F.sum("cnt").cast("long").alias("total_words"),
        F.sum(F.length("word") * F.col("cnt"))
        .cast("long")
        .alias("total_word_chars"),
        F.count(F.lit(1)).cast("long").alias("distinct_words"),
    )
    doc_count = docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    tok = tokenize_stats(docs, merges).agg(
        F.sum("initial_symbols").cast("long").alias("sym_total"),
        F.sum("tokens_after").cast("long").alias("tok_total"),
        F.sum("applications").cast("long").alias("app_total"),
        F.min("reconstruction_ok").alias("reconstruction_ok"),
    )
    return (
        doc_count.crossJoin(word_stats)
        .crossJoin(tok)
        .select(
            "n_docs",
            "total_words",
            "total_word_chars",
            "distinct_words",
            (F.col("total_words") + F.col("total_word_chars"))
            .cast("long")
            .alias("initial_symbols"),
            F.lit(first_left).alias("first_merge_left"),
            F.lit(first_right).alias("first_merge_right"),
            F.lit(int(first_count)).cast("long").alias(
                "first_merge_count"
            ),
            (F.col("distinct_words") < F.lit(_MAX_WORDS)).alias(
                "histogram_untruncated"
            ),
            "reconstruction_ok",
            (
                (
                    F.col("tok_total")
                    == F.col("sym_total") - F.col("app_total")
                )
                # the per-doc initial symbol count must ALSO agree with
                # the histogram-derived corpus total — two independent
                # tokenization passes landing on one number
                & (
                    F.col("sym_total")
                    == F.col("total_words") + F.col("total_word_chars")
                )
            ).alias("conservation_ok"),
            (F.col("tok_total") <= F.col("sym_total")).alias(
                "monotone_ok"
            ),
        )
    )
