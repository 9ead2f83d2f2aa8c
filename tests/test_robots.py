"""Robots Exclusion Protocol parser + rule evaluation
(operators/robots.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from economic_data_etl_spark.operators import robots

BODY = """\
# policy
User-agent: badbot
Disallow: /

User-agent: spark-graft
User-agent: otherbot
Disallow: /private
Allow: /private/ok
Crawl-delay: 5

User-agent: *
Disallow: /star-only
"""


class TestParser:
    def test_agent_group_selection(self):
        rules = robots.parse_robots(BODY, agent="spark-graft")
        assert ("disallow", "/private") in rules
        assert ("allow", "/private/ok") in rules
        # foreign and fallback groups excluded
        assert ("disallow", "/") not in rules
        assert ("disallow", "/star-only") not in rules

    def test_star_fallback(self):
        rules = robots.parse_robots(BODY, agent="unknown-bot")
        assert rules == [("disallow", "/star-only")]

    def test_multi_agent_run_shares_rules(self):
        assert robots.parse_robots(BODY, agent="otherbot") == \
            robots.parse_robots(BODY, agent="spark-graft")

    def test_longest_agent_token_wins(self):
        body = (
            "User-agent: bot\nDisallow: /a\n\n"
            "User-agent: bigbot\nDisallow: /b\n"
        )
        assert robots.parse_robots(body, agent="bigbot") == [
            ("disallow", "/b")
        ]

    def test_empty_disallow_is_allow_all(self):
        body = "User-agent: *\nDisallow:\n"
        assert robots.parse_robots(body, agent="anybot") == []

    def test_same_token_groups_merge(self):
        body = (
            "User-agent: *\nDisallow: /a\n\n"
            "User-agent: *\nDisallow: /b\n"
        )
        assert robots.parse_robots(body, agent="x") == [
            ("disallow", "/a"),
            ("disallow", "/b"),
        ]

    def test_comments_and_blank_lines_ignored(self):
        body = "User-agent: * # all\n# note\n\nDisallow: /x # tail\n"
        assert robots.parse_robots(body, agent="x") == [
            ("disallow", "/x")
        ]

    def test_no_matching_group(self):
        assert robots.parse_robots("User-agent: bot\nDisallow: /\n",
                                   agent="other") == []


class TestRegex:
    def test_plain_prefix(self):
        assert robots.rule_to_regex("/docs/1") == "^/docs/1"

    def test_wildcard_and_anchor(self):
        assert robots.rule_to_regex("/*/3$") == "^/.*/3$"

    def test_specials_escaped(self):
        assert robots.rule_to_regex("/a+b.c") == "^/a\\+b\\.c"

    def test_inner_dollar_escaped(self):
        # only a TRAILING $ is an anchor
        assert robots.rule_to_regex("/a$b") == "^/a\\$b"


class TestFilter:
    def _verdicts(self, spark, rules_rows, urls_rows):
        rules = spark.createDataFrame(
            [
                (h, t, p, robots.rule_to_regex(p), len(p))
                for h, t, p in rules_rows
            ],
            "host string, rule_type string, pattern string, "
            "regex string, rule_len int",
        )
        urls = spark.createDataFrame(
            urls_rows, "host string, path string"
        )
        return {
            (r.host, r.path): (r.allowed, r.rule)
            for r in robots.robots_filter(urls, rules).collect()
        }

    def test_precedence_ladder(self, spark):
        got = self._verdicts(
            spark,
            [
                ("h", "disallow", "/docs/1"),
                ("h", "allow", "/docs/10"),
                ("h", "disallow", "/*/3$"),
                ("h", "allow", "/docs/7"),
                ("h", "disallow", "/docs/7"),
            ],
            [
                ("h", "/docs/1"),
                ("h", "/docs/10"),  # prefix-shadowed, longer allow wins
                ("h", "/docs/3"),  # wildcard + anchor
                ("h", "/docs/30"),  # $ anchor must NOT match
                ("h", "/docs/7"),  # exact-length tie -> allow
                ("h", "/other"),  # no rule -> default allow
                ("x", "/docs/1"),  # host without rules -> default
            ],
        )
        assert got[("h", "/docs/1")] == (False, "/docs/1")
        assert got[("h", "/docs/10")] == (True, "/docs/10")
        assert got[("h", "/docs/3")] == (False, "/*/3$")
        assert got[("h", "/docs/30")] == (True, "default")
        assert got[("h", "/docs/7")] == (True, "/docs/7")
        assert got[("h", "/other")] == (True, "default")
        assert got[("x", "/docs/1")] == (True, "default")

    def test_plan_pure_projection_zero_shuffle(self, spark):
        """The REP gate is an in-row fold over the literal rule table:
        NO join, NO Exchange — the verdict runs inside whatever stage
        feeds it (the old join+groupBy shape re-shuffled every caller
        payload column as part of the GROUP BY key)."""
        rules = spark.createDataFrame(
            [("h0", "disallow", "/a", "^/a", 2),
             ("h1", "allow", "/a/b", "^/a/b", 4)],
            "host string, rule_type string, pattern string, "
            "regex string, rule_len int",
        )
        urls = spark.range(100).select(
            F.concat(F.lit("h"), F.col("id") % 2).alias("host"),
            F.concat(F.lit("/p/"), F.col("id")).alias("path"),
        )
        plan = (
            robots.robots_filter(urls, rules)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan
        assert "Join" not in plan


class TestFilterContracts:
    """r13 ADVICE pins: the inline-expression rule cap fails loudly,
    and the pure-projection shape preserves exact-duplicate input rows
    (the retired join+groupBy collapsed them; per-row verdicts are the
    contract)."""

    def test_oversized_rule_table_raises(self, spark):
        import pytest

        rows = [
            (f"h{i}.example", "disallow", "/x", "^/x", 2)
            for i in range(robots.MAX_INLINE_RULES + 1)
        ]
        rules = spark.createDataFrame(
            rows,
            "host string, rule_type string, pattern string, "
            "regex string, rule_len int",
        )
        urls = spark.createDataFrame(
            [("h0.example", "/x")], "host string, path string"
        )
        with pytest.raises(ValueError, match="rules"):
            robots.robots_filter(urls, rules)

    def test_duplicate_input_rows_preserved(self, spark):
        rules = spark.createDataFrame(
            [("a.example", "disallow", "/private", "^/private", 8)],
            "host string, rule_type string, pattern string, "
            "regex string, rule_len int",
        )
        urls = spark.createDataFrame(
            [("a.example", "/private")] * 3 + [("a.example", "/ok")],
            "host string, path string",
        )
        out = robots.robots_filter(urls, rules).collect()
        assert len(out) == 4  # pure projection: duplicates stay
        assert sum(1 for r in out if not r["allowed"]) == 3
