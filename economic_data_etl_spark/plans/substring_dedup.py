"""Exact substring (duplicate k-gram span) deduplication queries.

The Lee et al. (ACL 2022, "Deduplicating Training Data Makes Language
Models Better") exact-substring pass, re-expressed for Spark by
operators/substring.py: every k-token gram occurring more than once in
the corpus marks its non-first occurrences as duplicated; duplicated
gram intervals merge into maximal per-doc spans which are counted
(`dedup_duplicate_spans`) and excised (`dedup_substring_removal`).

Both queries are fully SQL-expressible, so the DuckDB oracles replay the
IDENTICAL semantics — same explicit whitespace class, same (doc_id, pos)
corpus order for "first occurrence", same overlap-or-adjacent interval
merge — and the removal query pins the reconstructed text itself via
md5 (Spark's array_join('') vs DuckDB's array_to_string(NULL) divergence
on fully-deduplicated docs is normalized with COALESCE on the oracle
side).

Sibling query: `dedup_longest_duplicated_span` (plans/curation.py)
reports duplication STATISTICS (longest duplicated run per doc); the two
queries here implement the dedup DECISION (corpus-order first-occurrence
retention) and its APPLICATION (span excision) — the parts a pipeline
actually executes.

Reference scope: the pandas reference (src/transform.py) has no dedup
surface; this module is part of the training-data extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from economic_data_etl_spark.operators import substring
from economic_data_etl_spark.plans.catalog import register
from economic_data_etl_spark.sources.tables import load_table

# Minimum duplicate-match length in tokens. Lee et al. use 50 BPE
# tokens on web-scale corpora; the synthetic docs average ~50 words, so
# 20 keeps the same "long verbatim passage" character at test scale.
K = 20

_SPAN_CTES = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '[ \\t\\n\\r]+'),
                     x -> x <> '') AS w
  FROM documents
), g0 AS (
  SELECT doc_id, w,
         unnest(CASE WHEN len(w) >= {K}
                     THEN generate_series(1, len(w) - {K} + 1)
                     ELSE [] END) AS i
  FROM toks
), grams AS (
  SELECT doc_id, i - 1 AS pos,
         array_to_string(w[i:i+{K}-1], ' ') AS gram
  FROM g0
), ranked AS (
  SELECT doc_id, pos,
         ROW_NUMBER() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn
  FROM grams
), dup AS (
  SELECT doc_id, pos, pos + {K} AS e FROM ranked WHERE rn > 1
), marked AS (
  SELECT doc_id, pos, e,
         CASE WHEN pos <= MAX(e) OVER (
                  PARTITION BY doc_id ORDER BY pos
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 0 ELSE 1 END AS new_span
  FROM dup
), spans AS (
  SELECT doc_id,
         SUM(new_span) OVER (PARTITION BY doc_id ORDER BY pos) AS span_id,
         pos, e
  FROM marked
), agg AS (
  SELECT doc_id, span_id, MIN(pos) AS s, MAX(e) AS e
  FROM spans GROUP BY 1, 2
)
"""


@register(
    "dedup_duplicate_spans",
    oracle=_SPAN_CTES
    + """
, per_doc AS (
  SELECT doc_id, COUNT(*) AS n_dup_spans, SUM(e - s) AS dup_tokens
  FROM agg GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(len(t.w) AS BIGINT) AS n_tokens,
       CAST(COALESCE(p.n_dup_spans, 0) AS BIGINT) AS n_dup_spans,
       CAST(COALESCE(p.dup_tokens, 0) AS BIGINT) AS dup_tokens
FROM documents d
JOIN toks t USING (doc_id)
LEFT JOIN per_doc p USING (doc_id)
ORDER BY d.doc_id
""",
    doc=f"Exact substring-dedup accounting (Lee et al. style, k={K} "
    "tokens): per doc, the number of maximal duplicated spans and the "
    "token count dedup would delete. Narrow gram build (token array "
    "materialized behind a projection boundary — HOF lambdas get no "
    "CSE), ONE gram-keyed window shuffle carrying count+rank together, "
    "one window per doc for the interval merge.",
)
def dedup_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return substring.duplicate_span_stats(docs, "doc_id", "text", K).orderBy(
        "doc_id"
    )



# Docs below the split are the already-ingested corpus (the standing
# gram index); docs at/above it are the newly arriving batch — same
# convention as the incremental semantic/pHash queries.
INC_SPLIT = 400


_INC_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '[ \\t\\n\\r]+'),
                     x -> x <> '') AS w
  FROM documents
), g0 AS (
  SELECT doc_id, w,
         unnest(CASE WHEN len(w) >= {K}
                     THEN generate_series(1, len(w) - {K} + 1)
                     ELSE [] END) AS i
  FROM toks
), grams AS (
  SELECT doc_id, i - 1 AS pos,
         array_to_string(w[i:i+{K}-1], ' ') AS gram
  FROM g0
), idx AS (
  SELECT DISTINCT gram FROM grams WHERE doc_id < {INC_SPLIT}
), batch AS (
  SELECT doc_id, pos, gram FROM grams WHERE doc_id >= {INC_SPLIT}
), hits AS (
  SELECT b.doc_id, b.pos FROM batch b
  WHERE EXISTS (SELECT 1 FROM idx i WHERE i.gram = b.gram)
), miss AS (
  SELECT b.doc_id, b.pos, b.gram FROM batch b
  WHERE NOT EXISTS (SELECT 1 FROM idx i WHERE i.gram = b.gram)
), ranked AS (
  SELECT doc_id, pos,
         ROW_NUMBER() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn,
         COUNT(*) OVER (PARTITION BY gram) AS cnt
  FROM miss
), alldup AS (
  SELECT doc_id, pos FROM hits
  UNION ALL
  SELECT doc_id, pos FROM ranked WHERE cnt > 1 AND rn > 1
), dup AS (
  SELECT doc_id, pos, pos + {K} AS e FROM alldup
), marked AS (
  SELECT doc_id, pos, e,
         CASE WHEN pos <= MAX(e) OVER (
                  PARTITION BY doc_id ORDER BY pos
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 0 ELSE 1 END AS new_span
  FROM dup
), spans AS (
  SELECT doc_id,
         SUM(new_span) OVER (PARTITION BY doc_id ORDER BY pos) AS span_id,
         pos, e
  FROM marked
), agg AS (
  SELECT doc_id, span_id, MIN(pos) AS s, MAX(e) AS e
  FROM spans GROUP BY 1, 2
)"""


@register(
    "dedup_incremental_substring",
    oracle=_INC_ORACLE
    + f"""
, per_doc AS (
  SELECT doc_id, COUNT(*) AS n_dup_spans, SUM(e - s) AS dup_tokens
  FROM agg GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(len(t.w) AS BIGINT) AS n_tokens,
       CAST(COALESCE(p.n_dup_spans, 0) AS BIGINT) AS n_dup_spans,
       CAST(COALESCE(p.dup_tokens, 0) AS BIGINT) AS dup_tokens
FROM documents d
JOIN toks t USING (doc_id)
LEFT JOIN per_doc p USING (doc_id)
WHERE d.doc_id >= {INC_SPLIT}
ORDER BY d.doc_id
""",
    doc=f"INCREMENTAL substring dedup (k={K}): the batch (doc_id >= "
    f"{INC_SPLIT}) is marked against the standing gram index (docs "
    "below the split) — grams already indexed are duplicates at any "
    "position, index-new grams follow the batch-local first-occurrence "
    "rule. Per-batch cost is O(batch tokens) + one index join; the "
    "index never self-joins. Equals the global batch pass restricted "
    "to batch docs (pinned in tests/test_substring.py).",
)
def dedup_incremental_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    index_docs = docs.filter(F.col("doc_id") < INC_SPLIT)
    batch_docs = docs.filter(F.col("doc_id") >= INC_SPLIT)
    index_grams = substring.kgram_occurrences(
        index_docs, "doc_id", "text", K
    ).select("gram").distinct()
    dups, _new = substring.substring_incremental_dups(
        index_grams, batch_docs, "doc_id", "text", K
    )
    spans = substring.merge_spans(dups, "doc_id", K)
    per_doc = spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_dup_spans"),
        F.sum(F.col("span_end") - F.col("span_start")).alias("dup_tokens"),
    )
    base = batch_docs.select(
        "doc_id",
        F.size(substring.word_array(F.col("text")))
        .cast("long")
        .alias("n_tokens"),
    )
    return (
        base.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("n_dup_spans", F.lit(0)).cast("long").alias(
                "n_dup_spans"
            ),
            F.coalesce("dup_tokens", F.lit(0)).cast("long").alias(
                "dup_tokens"
            ),
        )
        .orderBy("doc_id")
    )


@register(
    "dedup_substring_removal",
    oracle=_SPAN_CTES
    + """
, sp AS (
  SELECT doc_id, list([s, e]) AS spans FROM agg GROUP BY doc_id
), clean AS (
  SELECT t.doc_id,
         list_filter(t.w, (x, i) ->
             len(list_filter(COALESCE(sp.spans, CAST([] AS BIGINT[][])),
                             s -> i - 1 >= s[1] AND i - 1 < s[2])) = 0) AS cw
  FROM toks t LEFT JOIN sp USING (doc_id)
)
SELECT doc_id,
       CAST(len(cw) AS BIGINT) AS n_clean_tokens,
       md5(COALESCE(array_to_string(cw, ' '), '')) AS clean_md5
FROM clean
ORDER BY doc_id
""",
    doc=f"Substring dedup APPLIED (k={K}): duplicated spans excised by an "
    "index-aware narrow filter over the token array (no re-explode, no "
    "order-fragile collect_list); the reconstructed text itself is "
    "value-pinned via md5 on both engines.",
)
def dedup_substring_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    cleaned = substring.remove_duplicate_spans(docs, "doc_id", "text", K)
    return cleaned.select(
        "doc_id",
        "n_clean_tokens",
        F.md5("clean_text").alias("clean_md5"),
    ).orderBy("doc_id")
