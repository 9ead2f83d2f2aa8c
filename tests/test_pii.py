"""PII redaction unit tests (operators/pii.py). The cross-engine
proof is the curation_pii_redaction catalog query; these pin the
operator semantics directly on handcrafted strings."""

from __future__ import annotations

import pytest

from economic_data_etl_spark.operators.pii import (
    pii_counts,
    redact_pii,
)


@pytest.fixture(scope="module")
def redact(spark):
    from pyspark.sql import functions as F

    def run(text: str) -> tuple[str, int, int, int]:
        e, s, p = pii_counts(F.col("t"))
        row = (
            spark.createDataFrame([(text,)], "t string")
            .select(
                redact_pii(F.col("t")).alias("r"),
                e.alias("e"), s.alias("s"), p.alias("p"),
            )
            .first()
        )
        return row["r"], row["e"], row["s"], row["p"]

    return run


class TestRedaction:
    def test_email_phone_ssn(self, redact):
        r, e, s, p = redact(
            "mail bob.smith+x@corp.example.com or 555-0199 id 123-45-6789"
        )
        assert r == "mail <EMAIL> or <PHONE> id <SSN>"
        assert (e, s, p) == (1, 1, 1)

    def test_cascade_order_protects_ssn_tail(self, redact):
        # the SSN tail 'dd-dddd' must not be half-eaten by the phone
        # rule: SSN redaction runs first
        r, e, s, p = redact("ssn 987-65-4321 only")
        assert r == "ssn <SSN> only"
        assert (e, s, p) == (0, 1, 0)

    def test_global_replacement(self, redact):
        r, e, _s, p = redact(
            "a@b.co c@d.org call 555-1111 and 555-2222"
        )
        assert r == "<EMAIL> <EMAIL> call <PHONE> and <PHONE>"
        assert (e, p) == (2, 2)

    def test_word_boundaries_guard_long_numbers(self, redact):
        # 10 digits around the dash: no \b match, nothing redacted
        r, _e, s, p = redact("part 1555-12345 stays")
        assert r == "part 1555-12345 stays"
        assert (s, p) == (0, 0)

    def test_idempotent(self, redact):
        text = "x a@b.co 555-0000 123-45-6789"
        once, *_ = redact(text)
        twice, *_ = redact(once)
        assert once == twice  # markers contain nothing matchable

    def test_clean_text_untouched(self, redact):
        r, e, s, p = redact("the quick brown fox 42 times")
        assert r == "the quick brown fox 42 times"
        assert (e, s, p) == (0, 0, 0)
