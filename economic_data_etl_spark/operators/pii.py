"""PII detection / redaction for corpus curation.

A standard pre-training curation pass: find and mask personally
identifiable information before text enters a training mix. Reference
scope note: the reference repo (pandas/requests ETL) has no text
curation — this extends the LLM-pipeline surface alongside the
quality/dedup/decontamination operators.

Design constraints that make this exactly certifiable cross-engine:

- **Patterns live in the regex subset Java (Spark) and RE2 (DuckDB)
  evaluate identically**: literal classes, bounded quantifiers, \\b
  word boundaries — no lookarounds, no backreferences, no
  dialect-specific escapes. The DuckDB oracle runs the SAME pattern
  strings with the 'g' flag (DuckDB's regexp_replace is first-match
  by default, Spark's is global — the one dialect asymmetry, handled
  in the oracle).
- **Everything is a built-in JVM expression** (regexp_replace /
  regexp_count) — no Python in the hot path, fully
  whole-stage-codegen'd and embarrassingly parallel at corpus scale.

The catalog query synthesizes deterministic PII (emails, phone
numbers, SSN-shaped ids) from doc_id — the corpus itself is clean
synthetic text — so the oracle can rebuild the exact input AND the
exact redacted output arithmetically, and the driver's value hash
covers match counting, global replacement, marker insertion, and
length accounting.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Java/RE2-common patterns (see module docstring).
EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PHONE_RE = r"\b[0-9]{3}-[0-9]{4}\b"
SSN_RE = r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"

EMAIL_MARK = "<EMAIL>"
PHONE_MARK = "<PHONE>"
SSN_MARK = "<SSN>"


def redact_pii(col: Column) -> Column:
    """Mask emails, SSN-shaped ids, then phone-shaped numbers.
    Order matters: the SSN pattern must run before the phone pattern
    (an SSN's tail 'ddd-dddd' would otherwise be half-eaten by the
    phone rule) — the same cascade the oracle mirrors."""
    out = F.regexp_replace(col, EMAIL_RE, EMAIL_MARK)
    out = F.regexp_replace(out, SSN_RE, SSN_MARK)
    return F.regexp_replace(out, PHONE_RE, PHONE_MARK)


def pii_counts(col: Column) -> tuple[Column, Column, Column]:
    """(emails, ssns, phones) matched in `col` — counted on the RAW
    text with the same cascade semantics as redact_pii: SSNs are
    counted by their own pattern, phones only outside SSNs (the
    redaction replaces SSNs first, so a phone match inside an SSN
    never fires)."""
    emails = F.regexp_count(col, F.lit(EMAIL_RE))
    ssns = F.regexp_count(col, F.lit(SSN_RE))
    phones_after_ssn = F.regexp_count(
        F.regexp_replace(col, SSN_RE, SSN_MARK), F.lit(PHONE_RE)
    )
    return emails, ssns, phones_after_ssn
