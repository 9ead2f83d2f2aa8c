"""Unit tests for catalog._zero_sign_safe — the register()-time rewrite
that wraps every biased ROUND in oracle SQL with (+ 0.0). It touches all
171 oracle strings, so its behavior is pinned here: balanced-paren
matching, quote awareness, nested ROUNDs, and leaving unbiased (possibly
DECIMAL-typed) ROUNDs alone."""

from __future__ import annotations

import duckdb

from economic_data_etl_spark.plans.catalog import _zero_sign_safe


class TestZeroSignSafe:
    def test_simple_wrap(self):
        assert (
            _zero_sign_safe("SELECT ROUND(5e-10 + x, 4) AS v FROM t")
            == "SELECT (ROUND(5e-10 + x, 4) + 0.0) AS v FROM t"
        )

    def test_bias_after_expr(self):
        assert (
            _zero_sign_safe("SELECT ROUND(x + 5e-10, 4) FROM t")
            == "SELECT (ROUND(x + 5e-10, 4) + 0.0) FROM t"
        )

    def test_nested_parens_in_argument(self):
        sql = "SELECT ROUND(5e-10 + SUM(a * (b - c)), 4) FROM t"
        assert (
            _zero_sign_safe(sql)
            == "SELECT (ROUND(5e-10 + SUM(a * (b - c)), 4) + 0.0) FROM t"
        )

    def test_unbiased_round_untouched(self):
        # no 5e-10 anywhere: string returned verbatim (DECIMAL-typed
        # ROUNDs must not get a type-changing + 0.0)
        sql = "SELECT ROUND(x, 2) FROM t"
        assert _zero_sign_safe(sql) == sql

    def test_mixed_biased_and_unbiased(self):
        sql = "SELECT ROUND(x, 2) AS a, ROUND(5e-10 + y, 4) AS b FROM t"
        out = _zero_sign_safe(sql)
        assert "ROUND(x, 2) AS a" in out
        assert "(ROUND(5e-10 + y, 4) + 0.0) AS b" in out

    def test_string_literal_with_parens_skipped(self):
        sql = "SELECT ROUND(5e-10 + len(replace(s, '(', ')')), 4) FROM t"
        out = _zero_sign_safe(sql)
        # the literal parens must not derail the balance scan
        assert out == (
            "SELECT (ROUND(5e-10 + len(replace(s, '(', ')')), 4) + 0.0)"
            " FROM t"
        )

    def test_round_token_in_string_literal_untouched(self):
        sql = "SELECT 'use ROUND(5e-10 + x, 4) here' AS doc, 5e-10 AS b"
        assert _zero_sign_safe(sql) == sql

    def test_nested_round_both_wrapped(self):
        sql = "SELECT ROUND(5e-10 + SUM(ROUND(5e-10 + x, 4)), 4) FROM t"
        out = _zero_sign_safe(sql)
        assert out == (
            "SELECT (ROUND(5e-10 + SUM((ROUND(5e-10 + x, 4) + 0.0)), 4)"
            " + 0.0) FROM t"
        )

    def test_identifier_ending_in_round_untouched(self):
        # my_round( is an identifier, not a ROUND call — the leading
        # (?<![A-Za-z0-9_]) lookbehind must leave it alone even though
        # its argument mentions the 5e-10 bias (round-4 advice).
        sql = "SELECT my_round(5e-10 + x) AS a, ROUND(5e-10 + y, 4) AS b"
        out = _zero_sign_safe(sql)
        assert "my_round(5e-10 + x) AS a" in out
        assert "(ROUND(5e-10 + y, 4) + 0.0) AS b" in out

    def test_none_passthrough(self):
        assert _zero_sign_safe(None) is None

    def test_semantics_preserved_in_duckdb(self):
        con = duckdb.connect()
        sql = "SELECT ROUND(5e-10 + -1e-6, 4) AS v"
        (raw,) = con.execute(sql).fetchone()
        (fixed,) = con.execute(_zero_sign_safe(sql)).fetchone()
        import struct

        assert struct.pack("<d", raw) == struct.pack("<d", -0.0)
        assert struct.pack("<d", fixed) == struct.pack("<d", 0.0)

    def test_all_registered_oracles_still_parse(self):
        """Every transformed oracle in the registry must still be valid
        DuckDB SQL (the sf0.001 sweep proves values; this pins parse
        validity fast, without Spark)."""
        from economic_data_etl_spark.plans import REGISTRY
        from economic_data_etl_spark.sources.tables import TABLES

        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"'/root/testdata/sf0.001/{t}.parquet'"
            )
        for name, q in REGISTRY.items():
            if q.oracle is None:
                continue
            # EXPLAIN parses + binds without executing
            con.execute(f"EXPLAIN {q.oracle}")
