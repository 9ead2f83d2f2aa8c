"""Data-governance queries: erasure propagation ("right to be
forgotten" / license revocation) through the standing indexes.

When a source revokes its license, deleting its rows from the corpus
is the easy half — every STANDING index (inverted postings, positional
postings, doc-length tables) still carries the revoked documents and
keeps serving them. These queries certify the erasure path: anti-join
the revoked doc set out of each index layout and prove the served
results equal a FROM-SCRATCH rebuild on the reduced corpus (the
oracle). BM25 is the sharp case: its corpus statistics (n_docs, avgdl,
per-term df) shift when documents leave, so a lazy erasure that only
hides rows at serve time would score every survivor wrong — the green
row proves the index layout is erasure-exact, not just
membership-exact.

Scale shape: the revoked set is doc-keyed; erasure is one anti-join
per index table (postings shuffle on doc_id — the one pass erasure
inherently costs; an index bucketed by doc_id makes it co-located).
Nothing rebuilds, nothing re-tokenizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from economic_data_etl_spark.plans.catalog import biased_round, register
from economic_data_etl_spark.sources.tables import load_table

_REVOKED_SOURCE = "src2"
_ERA_TERMS = ("stream", "batch", "window")
_ERA_TAU = 0.8
_ERA_PHRASE = ("stream", "table", "hash")


@register(
    "governance_erasure_bm25",
    oracle=f"""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(string_split_regex(text, '[ \\t\\n\\r]+'),
                             x -> x <> '') AS w
          FROM documents WHERE source <> '{_REVOKED_SOURCE}'
        ), ex AS (
          SELECT doc_id, unnest(w) AS token FROM toks
        ), dl AS (
          SELECT doc_id, len(w) AS dl FROM toks
        ), stats AS (
          SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl
        ), tf AS (
          SELECT doc_id, token, COUNT(*) AS tf FROM ex
          WHERE token IN {_ERA_TERMS!r}
          GROUP BY 1, 2
        ), df AS (
          SELECT token, COUNT(DISTINCT doc_id) AS df FROM ex
          WHERE token IN {_ERA_TERMS!r}
          GROUP BY token
        ), sc AS (
          SELECT t.doc_id,
                 ROUND(5e-10 + SUM(
                     ln(1.0 + ((SELECT n_docs FROM stats) - d.df + 0.5)
                              / (d.df + 0.5))
                     * t.tf * {1.2 + 1.0}
                     / (t.tf + 1.2 * (1 - 0.75
                          + 0.75 * l.dl / (SELECT avgdl FROM stats)))
                 ), 4) AS score
          FROM tf t JOIN df d USING (token) JOIN dl l USING (doc_id)
          GROUP BY t.doc_id
        )
        SELECT doc_id, score,
               CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id)
                    AS INT) AS rank
        FROM sc
        WHERE score >= {_ERA_TAU}
        ORDER BY rank
    """,
    doc="Erasure propagation through the standing BM25 index "
    f"(license revocation of source {_REVOKED_SOURCE!r}): the inverted "
    "index is built from the FULL corpus, the revoked doc set is "
    "anti-joined out of BOTH index tables (postings and doc lengths), "
    "and the query is served from the erased index. The oracle is the "
    "from-scratch BM25 over the reduced corpus — green proves the "
    "erasure is EXACT, including the corpus statistics (n_docs, "
    "avgdl, df) that shift when documents leave; a serve-time "
    "hide-the-rows shortcut would score every survivor wrong. One "
    "doc-keyed anti-join per index table, no re-tokenization.",
)
def governance_erasure_bm25(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from economic_data_etl_spark.operators.retrieval import (
        bm25_from_index,
        build_postings,
    )

    docs = load_table(spark, sf_dir, "documents")
    postings, doclens = build_postings(docs)
    revoked = docs.filter(
        F.col("source") == _REVOKED_SOURCE
    ).select("doc_id")
    postings_e = postings.join(revoked, "doc_id", "left_anti")
    doclens_e = doclens.join(revoked, "doc_id", "left_anti")
    scored = bm25_from_index(
        postings_e, doclens_e, list(_ERA_TERMS)
    ).select("doc_id", biased_round(F.col("score")).alias("score"))
    kept = scored.filter(F.col("score") >= _ERA_TAU)
    rank = F.row_number().over(
        Window.orderBy(F.desc("score"), F.asc("doc_id"))
    )
    return kept.select(
        "doc_id", "score", rank.cast("int").alias("rank")
    ).orderBy("rank")


@register(
    "governance_erasure_phrase",
    oracle=f"""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(string_split_regex(text, '[ \\t\\n\\r]+'),
                             x -> x <> '') AS w
          FROM documents WHERE source <> '{_REVOKED_SOURCE}'
        ), g0 AS (
          SELECT doc_id, w,
                 unnest(CASE WHEN len(w) >= 1
                             THEN generate_series(1, len(w))
                             ELSE [] END) AS i
          FROM toks
        ), ex AS (
          SELECT doc_id, i - 1 AS pos, w[i] AS token FROM g0
        ), ph AS (
          SELECT * FROM (VALUES {", ".join(f"({i}, '{t}')" for i, t in enumerate(_ERA_PHRASE))})
                 AS p(off, term)
        ), cand AS (
          SELECT e.doc_id, e.pos - p.off AS start, p.off
          FROM ex e JOIN ph p ON e.token = p.term
        ), occ AS (
          SELECT doc_id, start FROM cand
          WHERE start >= 0
          GROUP BY doc_id, start
          HAVING COUNT(DISTINCT off) = {len(_ERA_PHRASE)}
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_matches,
               CAST(MIN(start) AS BIGINT) AS first_pos
        FROM occ
        GROUP BY doc_id
        ORDER BY doc_id
    """,
    doc="Erasure propagation through the standing POSITIONAL index: "
    f"the (doc, token, pos) layout is built from the full corpus, "
    f"source {_REVOKED_SOURCE!r}'s docs are anti-joined out, and the "
    f"phrase query {' '.join(_ERA_PHRASE)!r} is served from the "
    "erased postings. Oracle = from-scratch positional replay on the "
    "reduced corpus. Positional postings carry no corpus statistics, "
    "so this lane pins the MEMBERSHIP half of erasure while the BM25 "
    "lane pins the statistics half.",
)
def governance_erasure_phrase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from economic_data_etl_spark.operators.retrieval import (
        build_positional_postings,
        phrase_from_index,
    )

    docs = load_table(spark, sf_dir, "documents")
    postings = build_positional_postings(docs)
    revoked = docs.filter(
        F.col("source") == _REVOKED_SOURCE
    ).select("doc_id")
    postings_e = postings.join(revoked, "doc_id", "left_anti")
    return phrase_from_index(postings_e, list(_ERA_PHRASE)).orderBy(
        "doc_id"
    )
