"""Unicode normalization queries — a REAL cross-engine check of the
normalizer: Spark folds via Python unicodedata (operators/textnorm.py),
the oracle recomputes with DuckDB's native nfc_normalize/strip_accents,
and the value hash only matches if the two independent Unicode
implementations agree character for character.

The fixture plants composed (U+00E9), decomposed (e + U+0301) and plain
spellings of the same words — the mixed-normalization reality of web
text — so `changed` is non-trivially split and the fingerprint groups
genuinely collapse variant spellings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from economic_data_etl_spark.operators import textnorm
from economic_data_etl_spark.plans.catalog import register
from economic_data_etl_spark.sources.tables import load_table

# Variant alphabet: composed / decomposed / case-mixed spellings. The
# combining marks are embedded as real codepoints on BOTH sides (the
# oracle SQL carries the identical UTF-8 literals).
_VARIANTS = [
    "Caf\u00e9",  # composed e-acute
    "Cafe\u0301",  # decomposed: e + combining acute
    "CAFE\u0301",  # uppercase decomposed
    "S\u00e3o Paulo",  # composed a-tilde
    "Sa\u0303o Paulo",  # decomposed: a + combining tilde
    "resume",  # plain ascii
]

_VARIANT_SQL_CASE = "CASE doc_id % 6 " + " ".join(
    f"WHEN {i} THEN '{v}'" for i, v in enumerate(_VARIANTS)
) + " END"


def _planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    variant = F.element_at(
        F.lit(_VARIANTS), (F.col("doc_id") % 6).cast("int") + 1
    )
    return docs.select(
        "doc_id",
        F.concat(
            variant, F.lit(" "), F.coalesce(F.col("text"), F.lit(""))
        ).alias("raw"),
        F.concat(
            variant, F.lit(" "), (F.col("doc_id") % 10).cast("string")
        ).alias("raw_small"),
    )


_RAW_CTE = f"""
WITH planted AS (
  SELECT doc_id,
         {_VARIANT_SQL_CASE} || ' ' || COALESCE(text, '') AS raw,
         {_VARIANT_SQL_CASE} || ' '
             || CAST(doc_id % 10 AS VARCHAR) AS raw_small
  FROM documents
)"""


@register(
    "text_unicode_normalize",
    oracle=_RAW_CTE
    + """
SELECT doc_id,
       nfc_normalize(raw) AS nfc,
       lower(strip_accents(nfc_normalize(raw))) AS folded,
       raw <> nfc_normalize(raw) AS changed
FROM planted
ORDER BY doc_id
""",
    doc="Unicode normalization lanes (operators/textnorm.py): NFC "
    "composition + accent-folded lowercase over planted "
    "composed/decomposed/case-mixed spellings appended to every doc. "
    "Spark folds via Arrow-batched unicodedata (Spark has no built-in "
    "normalization expression — the legitimate Python-lane case), the "
    "oracle recomputes with DuckDB's native nfc_normalize/"
    "strip_accents: a green value hash means two independent Unicode "
    "implementations agreed on every character. `changed` marks the "
    "decomposed third of the fixture.",
)
def text_unicode_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    planted = _planted(spark, sf_dir)
    lanes = textnorm.normalize_text_lanes(planted, "doc_id", "raw")
    return lanes.select("doc_id", "nfc", "folded", "changed").orderBy(
        "doc_id"
    )


@register(
    "dedup_unicode_variants",
    oracle=_RAW_CTE
    + """
SELECT fp,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(doc_id) AS BIGINT) AS rep_doc
FROM (SELECT doc_id,
             md5(lower(strip_accents(nfc_normalize(raw_small)))) AS fp
      FROM planted)
GROUP BY fp
HAVING COUNT(*) > 1
ORDER BY fp
""",
    doc="Normalization-aware exact dedup: md5 over the folded lane makes "
    "composed, decomposed and case/accent variants of the same text "
    "hash identically (the key exact dedup must group by on web text "
    "— without it 'Caf\\u00e9' and 'Cafe\\u0301' count as distinct "
    "documents). Fingerprint groups with >1 member, smallest doc_id "
    "kept. The md5 runs JVM-side; Python only folds.",
)
def dedup_unicode_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    planted = _planted(spark, sf_dir)
    fps = textnorm.normalized_fingerprint(planted, "doc_id", "raw_small")
    return (
        fps.groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("rep_doc"),
        )
        .filter(F.col("n_docs") > 1)
        .orderBy("fp")
    )
