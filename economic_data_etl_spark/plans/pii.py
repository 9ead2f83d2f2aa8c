"""PII-redaction catalog query (operators/pii.py).

The documents corpus is clean synthetic text, so the query SYNTHESIZES
deterministic PII from doc_id — a per-doc cascade of emails (1-3),
a phone for even ids, an SSN-shaped id for ids divisible by 5 — then
detects and redacts it. Both the construction and the redaction are
single expressions in the Java/RE2-common regex subset, so the DuckDB
oracle rebuilds the exact input AND the exact redacted output: the
value hash covers match counting, GLOBAL replacement (DuckDB needs the
'g' flag — its regexp_replace is first-match by default, Spark's is
global), marker insertion order (emails → SSNs → phones; the SSN rule
must precede the phone rule or a phone-shaped SSN tail would be
half-eaten), length accounting, and the redacted text's tail bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from economic_data_etl_spark.operators.pii import (
    pii_counts,
    redact_pii,
)
from economic_data_etl_spark.plans.catalog import register
from economic_data_etl_spark.sources.tables import load_table


@register(
    "curation_pii_redaction",
    oracle="""
        WITH aug AS (
            SELECT doc_id,
                   text
                   || repeat(' user' || CAST(doc_id AS VARCHAR)
                             || '@data.example.org',
                             CAST(1 + doc_id % 3 AS INTEGER))
                   || CASE WHEN doc_id % 2 = 0
                           THEN ' call 555-'
                                || lpad(CAST(doc_id % 10000 AS VARCHAR),
                                        4, '0')
                           ELSE '' END
                   || CASE WHEN doc_id % 5 = 0
                           THEN ' ssn 123-45-'
                                || lpad(CAST(doc_id % 10000 AS VARCHAR),
                                        4, '0')
                           ELSE '' END AS t
            FROM documents
        ),
        red AS (
            SELECT doc_id, t,
                   regexp_replace(
                       regexp_replace(
                           regexp_replace(
                               t,
                               '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}',
                               '<EMAIL>', 'g'),
                           '\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b',
                           '<SSN>', 'g'),
                       '\\b[0-9]{3}-[0-9]{4}\\b',
                       '<PHONE>', 'g') AS r
            FROM aug
        )
        SELECT doc_id,
               CAST(len(regexp_extract_all(
                   t, '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}'))
                   AS BIGINT) AS n_emails,
               CAST(len(regexp_extract_all(
                   t, '\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b'))
                   AS BIGINT) AS n_ssns,
               CAST(len(regexp_extract_all(
                   regexp_replace(t, '\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b',
                                  '<SSN>', 'g'),
                   '\\b[0-9]{3}-[0-9]{4}\\b')) AS BIGINT) AS n_phones,
               CAST(len(t) AS BIGINT) AS len_before,
               CAST(len(r) AS BIGINT) AS len_after,
               substr(r, greatest(1, len(r) - 59)) AS redacted_tail
        FROM red
        ORDER BY doc_id
    """,
    doc="PII detection + redaction for pre-training curation "
    "(operators/pii.py): deterministic emails/phones/SSN-shaped ids "
    "are synthesized from doc_id, then detected (regexp_count) and "
    "globally masked (regexp_replace cascade: emails, SSNs, THEN "
    "phones — order-sensitive) with patterns in the Java/RE2-common "
    "subset. Everything is a built-in JVM expression — zero Python, "
    "whole-stage codegen, per-row independent at corpus scale. The "
    "oracle rebuilds input and redacted output exactly, so the hash "
    "certifies counts, global-replacement semantics, cascade order, "
    "lengths, and the redacted tail bytes.",
)
def curation_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pad = F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0")
    aug = F.concat(
        F.col("text"),
        F.expr(
            "repeat(concat(' user', cast(doc_id as string),"
            " '@data.example.org'), cast(1 + doc_id % 3 as int))"
        ),
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(F.lit(" call 555-"), pad),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.lit(" ssn 123-45-"), pad),
        ).otherwise(F.lit("")),
    )
    emails, ssns, phones = pii_counts(aug)
    staged = docs.select(
        "doc_id",
        emails.cast("long").alias("n_emails"),
        ssns.cast("long").alias("n_ssns"),
        phones.cast("long").alias("n_phones"),
        F.length(aug).cast("long").alias("len_before"),
        redact_pii(aug).alias("__redacted"),
    )
    return staged.select(
        "doc_id",
        "n_emails",
        "n_ssns",
        "n_phones",
        "len_before",
        F.length("__redacted").cast("long").alias("len_after"),
        F.expr(
            "substr(__redacted,"
            " greatest(1, length(__redacted) - 59))"
        ).alias("redacted_tail"),
    ).orderBy("doc_id")
