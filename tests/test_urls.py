"""URL canonicalization rules (operators/urls.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from economic_data_etl_spark.operators import urls


def _canon(spark, *raw: str) -> list[str]:
    df = spark.createDataFrame([(u,) for u in raw], "url string")
    return [
        r["c"]
        for r in df.select(
            urls.canonical_url(F.col("url")).alias("c")
        ).collect()
    ]


CASES = [
    # scheme + host case folding
    ("HTTP://Example.COM/a", "http://example.com/a"),
    ("HtTpS://EXAMPLE.com/a", "https://example.com/a"),
    # www stripping
    ("http://www.example.com/a", "http://example.com/a"),
    ("http://WWW.example.com/a", "http://example.com/a"),
    # default ports stripped, non-default kept
    ("http://example.com:80/a", "http://example.com/a"),
    ("https://example.com:443/a", "https://example.com/a"),
    ("http://example.com:8080/a", "http://example.com:8080/a"),
    ("https://example.com:80/a", "https://example.com:80/a"),
    # path normalization
    ("http://example.com", "http://example.com/"),
    ("http://example.com/", "http://example.com/"),
    ("http://example.com//a///b", "http://example.com/a/b"),
    ("http://example.com/a/", "http://example.com/a"),
    # fragment dropped
    ("http://example.com/a#frag", "http://example.com/a"),
    ("http://example.com/a?x=1#frag", "http://example.com/a?x=1"),
    # tracking params dropped, rest sorted
    (
        "http://example.com/a?utm_source=x&b=2&a=1",
        "http://example.com/a?a=1&b=2",
    ),
    ("http://example.com/a?fbclid=Z&gclid=Y&ref=r", "http://example.com/a"),
    ("http://example.com/a?b=2&a=1", "http://example.com/a?a=1&b=2"),
    # query on root path
    ("http://example.com?b=2&a=1", "http://example.com/?a=1&b=2"),
    # empty query
    ("http://example.com/a?", "http://example.com/a"),
]


@pytest.mark.parametrize("raw,want", CASES)
def test_canonical_url_rules(spark, raw, want):
    assert _canon(spark, raw) == [want]


def test_aliases_collapse_to_one(spark):
    """Every alias spelling of one page canonicalizes identically."""
    aliases = [
        "HTTP://WWW.Example.COM:80//a//b/?utm_source=s&y=2&x=1#top",
        "http://example.com/a/b?x=1&y=2",
        "http://www.example.com/a/b/?y=2&x=1",
        "HTTP://example.com:80/a/b?x=1&utm_medium=m&y=2#frag",
    ]
    got = set(_canon(spark, *aliases))
    assert got == {"http://example.com/a/b?x=1&y=2"}


def test_host_extraction(spark):
    df = spark.createDataFrame(
        [("https://WWW.News.Site.ORG:8443/x?q=1",)], "url string"
    )
    row = df.select(urls.url_host(F.col("url")).alias("h")).collect()[0]
    assert row["h"] == "news.site.org"


def test_plan_is_udf_free(spark):
    """The canonicalizer must stay inside whole-stage codegen: no
    BatchEvalPython / ArrowEvalPython nodes in the physical plan."""
    df = spark.range(10).select(
        F.concat(F.lit("http://h/"), F.col("id").cast("string")).alias(
            "url"
        )
    )
    plan = (
        df.select(urls.canonical_url(F.col("url")))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan
