"""Crawl-frontier URL curation queries.

The frontier-side half of the crawl ingestion stack (WARC container +
HTML extraction live in plans/compressq.py): canonicalize URL aliases,
collapse the frontier by canonical form, and enforce per-domain quotas —
the three passes between "list of discovered links" and "list of pages
worth fetching/keeping".

URLs are synthesized deterministically from doc_id with every alias
class the canonicalizer handles (scheme/host case, www, default ports,
duplicate + trailing slashes, tracking params, shuffled-order queries,
fragments); the SAME synthesis expression is written on both engines, so
the oracle checks the full regex chain of operators/urls.py value by
value rather than trusting it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from economic_data_etl_spark.operators import urls
from economic_data_etl_spark.plans.catalog import register
from economic_data_etl_spark.sources.tables import load_table

_DOMAIN_QUOTA = 3

# ---- shared deterministic URL fixture (both engines) ------------------


def _raw_url(d):
    """Messy-but-deterministic URL from a doc_id column (Spark side).
    The DuckDB twin is _RAW_URL_SQL — keep the two in lockstep."""
    scheme = (
        F.when(d % 4 == 0, "HTTP")
        .when(d % 4 == 1, "https")
        .when(d % 4 == 2, "HtTpS")
        .otherwise("http")
    )
    www = (
        F.when(d % 3 == 0, "WWW.").when(d % 3 == 1, "www.").otherwise("")
    )
    host = F.concat(
        F.lit("Site"), (d % 7).cast("string"), F.lit(".Example.COM")
    )
    port = (
        F.when((d % 5 == 0) & ((d % 4 == 0) | (d % 4 == 3)), ":80")
        .when(d % 5 == 0, ":443")
        .when(d % 5 == 1, ":8080")
        .otherwise("")
    )
    path = F.concat(
        F.lit("//docs//"),
        (d % 11).cast("string"),
        F.when(d % 2 == 0, "/").otherwise(""),
    )
    query = (
        F.when(d % 3 == 0, "?utm_source=feed&b=2&a=1")
        .when(
            d % 3 == 1,
            F.concat(F.lit("?a=1&b=2&fbclid=X"), d.cast("string")),
        )
        .otherwise("")
    )
    frag = F.when(
        d % 2 == 0, F.concat(F.lit("#sec"), (d % 4).cast("string"))
    ).otherwise("")
    return F.concat(
        scheme, F.lit("://"), www, host, port, path, query, frag
    )


_RAW_URL_SQL = """
    CASE doc_id % 4 WHEN 0 THEN 'HTTP' WHEN 1 THEN 'https'
                    WHEN 2 THEN 'HtTpS' ELSE 'http' END
    || '://'
    || CASE doc_id % 3 WHEN 0 THEN 'WWW.' WHEN 1 THEN 'www.' ELSE '' END
    || 'Site' || CAST(doc_id % 7 AS VARCHAR) || '.Example.COM'
    || CASE WHEN doc_id % 5 = 0 THEN
                CASE WHEN doc_id % 4 IN (0, 3) THEN ':80' ELSE ':443' END
            WHEN doc_id % 5 = 1 THEN ':8080' ELSE '' END
    || '//docs//' || CAST(doc_id % 11 AS VARCHAR)
    || CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END
    || CASE WHEN doc_id % 3 = 0 THEN '?utm_source=feed&b=2&a=1'
            WHEN doc_id % 3 = 1 THEN '?a=1&b=2&fbclid=X'
                                     || CAST(doc_id AS VARCHAR)
            ELSE '' END
    || CASE WHEN doc_id % 2 = 0 THEN '#sec' || CAST(doc_id % 4 AS VARCHAR)
            ELSE '' END
"""

# DuckDB twin of operators/urls.py:canonical_url, step for step. DuckDB
# regexp_replace is first-match-only without the 'g' flag; the anchored
# replacements don't care, the slash-collapse does.
_CANON_CTES = f"""
WITH raw AS (
  SELECT doc_id, {_RAW_URL_SQL} AS url FROM documents
), base AS (
  SELECT doc_id, url,
         lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
             AS scheme,
         regexp_replace(regexp_replace(url, '#.*$', ''),
                        '^[A-Za-z][A-Za-z0-9+.-]*://', '') AS rest
  FROM raw
), hp AS (
  SELECT *, lower(regexp_extract(rest, '^[^/?#]*', 0)) AS hostport,
         regexp_replace(rest, '^[^/?#]*', '') AS pathq
  FROM base
), parts AS (
  SELECT *,
         regexp_replace(regexp_replace(hostport, ':[0-9]+$', ''),
                        '^www\\.', '') AS host,
         regexp_extract(hostport, ':([0-9]+)$', 1) AS port,
         regexp_replace(regexp_extract(pathq, '^[^?]*', 0),
                        '/+', '/', 'g') AS path0,
         CASE WHEN pathq LIKE '%?%'
              THEN regexp_extract(pathq, '\\?(.*)$', 1) ELSE '' END AS q
  FROM hp
), canon AS (
  SELECT doc_id, url, host,
         CASE WHEN p1 <> '/' AND p1 LIKE '%/'
              THEN left(p1, length(p1) - 1) ELSE p1 END AS path,
         scheme || '://' || host
         || CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
                      OR (scheme = 'https' AND port = '443')
                 THEN '' ELSE ':' || port END
         || CASE WHEN p1 <> '/' AND p1 LIKE '%/'
                 THEN left(p1, length(p1) - 1) ELSE p1 END
         || CASE WHEN qs = '' THEN '' ELSE '?' || qs END AS canonical
  FROM (SELECT *,
               CASE WHEN path0 = '' THEN '/' ELSE path0 END AS p1,
               -- COALESCE: DuckDB's array_to_string([]) is NULL where
               -- Spark's array_join([]) is '' (same divergence the
               -- substring-removal oracle normalizes).
               COALESCE(array_to_string(list_sort(list_filter(
                   string_split(q, '&'),
                   p -> p <> '' AND NOT regexp_matches(p,
                        '^(utm_[a-z0-9]+|fbclid|gclid|ref)='))), '&'),
                   '') AS qs
        FROM parts)
)"""


def _canonicalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    url = _raw_url(F.col("doc_id"))
    return docs.select(
        "doc_id",
        "n_chars",
        url.alias("url"),
        urls.url_host(url).alias("host"),
        urls.url_path(url).alias("path"),
        urls.canonical_url(url).alias("canonical"),
    )


@register(
    "crawl_url_canonicalize",
    oracle=_CANON_CTES
    + """
SELECT doc_id, url, canonical FROM canon ORDER BY doc_id
""",
    doc="URL canonicalization (operators/urls.py): scheme/host "
    "lower-casing, www and default-port stripping, slash collapsing, "
    "tracking-param removal, query-param sorting, fragment dropping — "
    "each step a built-in regexp/array expression (whole-stage codegen, "
    "no UDF, runs inside the scan projection) with the identical regex "
    "chain replayed by the DuckDB oracle value for value.",
)
def crawl_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _canonicalized(spark, sf_dir)
        .select("doc_id", "url", "canonical")
        .orderBy("doc_id")
    )


@register(
    "crawl_url_dedup",
    oracle=_CANON_CTES
    + """
SELECT canonical,
       CAST(COUNT(*) AS BIGINT) AS n_aliases,
       CAST(MIN(doc_id) AS BIGINT) AS rep_doc
FROM canon
GROUP BY canonical
HAVING COUNT(*) > 1
ORDER BY canonical
""",
    doc="Frontier dedup by canonical URL: alias groups (>1 spelling of "
    "the same page) with the smallest doc_id as the kept "
    "representative. One hash-aggregate on the canonical form; at "
    "frontier scale this is the groupBy the canonicalizer exists to "
    "make correct.",
)
def crawl_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _canonicalized(spark, sf_dir)
        .groupBy("canonical")
        .agg(
            F.count(F.lit(1)).alias("n_aliases"),
            F.min("doc_id").alias("rep_doc"),
        )
        .filter(F.col("n_aliases") > 1)
        .orderBy("canonical")
    )


@register(
    "crawl_domain_quota",
    oracle=_CANON_CTES
    + f"""
SELECT doc_id, host, CAST(rk AS BIGINT) AS rk
FROM (
  SELECT c.doc_id, c.host,
         ROW_NUMBER() OVER (PARTITION BY c.host
                            ORDER BY COALESCE(d.n_chars, 0) DESC,
                                     c.doc_id) AS rk
  FROM canon c JOIN documents d USING (doc_id)
)
WHERE rk <= {_DOMAIN_QUOTA}
ORDER BY host, rk
""",
    doc=f"Per-domain quota (top {_DOMAIN_QUOTA} docs per canonical host "
    "by size, deterministic doc_id tie-break): the crawl-politeness / "
    "source-diversity cap a corpus applies before fetching or keeping. "
    "One window shuffle partitioned by host; at 100 TB hosts are the "
    "natural partition key and heavy hosts are exactly what the quota "
    "truncates.",
)
def crawl_domain_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    ranked = _canonicalized(spark, sf_dir).withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("host").orderBy(
                F.coalesce(F.col("n_chars"), F.lit(0)).desc(),
                F.col("doc_id"),
            )
        ),
    )
    return (
        ranked.filter(F.col("rk") <= _DOMAIN_QUOTA)
        .select("doc_id", "host", F.col("rk").cast("long").alias("rk"))
        .orderBy("host", "rk")
    )


_FRONTIER_SPLIT = 250


@register(
    "crawl_incremental_frontier",
    oracle=_CANON_CTES
    + f"""
SELECT canonical, CAST(MIN(doc_id) AS BIGINT) AS first_doc
FROM canon
WHERE doc_id >= {_FRONTIER_SPLIT}
  AND canonical NOT IN (SELECT canonical FROM canon
                        WHERE doc_id < {_FRONTIER_SPLIT})
GROUP BY canonical
ORDER BY canonical
""",
    doc="INCREMENTAL crawl frontier: the batch (doc_id >= "
    f"{_FRONTIER_SPLIT}) is canonicalized and deduped against the "
    "standing seen-set (canonicals below the split) — only never-seen "
    "canonicals are emitted, batch-local aliases collapse to their "
    "first occurrence. Per-batch cost O(batch): one groupBy + one "
    "anti-join on the canonical key; the index never self-joins. The "
    "streaming twin (streaming/crawl_frontier.py) is proven "
    "stream == batch with crash-window convergence in "
    "tests/test_crawl_frontier_stream.py.",
)
def crawl_incremental_frontier(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    keyed = _canonicalized(spark, sf_dir).select("doc_id", "canonical")
    index = (
        keyed.filter(F.col("doc_id") < _FRONTIER_SPLIT)
        .select("canonical")
        .distinct()
    )
    batch = keyed.filter(F.col("doc_id") >= _FRONTIER_SPLIT)
    firsts = batch.groupBy("canonical").agg(
        F.min("doc_id").alias("first_doc")
    )
    return (
        firsts.join(index, "canonical", "left_anti")
        .select("canonical", "first_doc")
        .orderBy("canonical")
    )


# ---- robots.txt (REP) politeness gate ---------------------------------

# One robots.txt body per host; the shared body exercises the parser
# (foreign-agent group skipped, multi-agent group run, comments, unknown
# directives, empty Disallow = allow-all fallback group) and the REP
# precedence ladder over the fixture's /docs/N paths:
#   /docs/1  -> blocked  (Disallow /docs/1 — and it PREFIX-matches
#   /docs/10 as well, which the longer Allow /docs/10 then overrides)
#   /docs/3  -> blocked  (wildcard Disallow /*/3$)
#   /docs/7  -> allowed  (Allow/Disallow tie at length 7: allow wins)
#   site0 additionally blocks /docs/5 via a second merged group.
_ROBOTS_SHARED = """\
# corpus crawler policy
User-agent: badbot
Disallow: /

User-agent: spark-graft
User-agent: otherbot
Disallow: /docs/1
Allow: /docs/10
Disallow: /*/3$
Allow: /docs/7
Disallow: /docs/7
Crawl-delay: 5
Sitemap: http://example.com/sitemap.xml

User-agent: *
Disallow:
"""

_ROBOTS_BODIES = {
    f"site{k}.example.com": _ROBOTS_SHARED
    + ("\nUser-agent: spark-graft\nDisallow: /docs/5\n" if k == 0 else "")
    for k in range(7)
}

# Parse ONCE at import; the same compiled rows feed the Spark rule
# table and the oracle's inline VALUES, so both engines evaluate the
# identical (pattern, regex, length) set — the parser itself is
# unit-covered in tests/test_robots.py.
from economic_data_etl_spark.operators.robots import (  # noqa: E402
    parse_robots,
    rule_to_regex,
)

_RULE_ROWS = [
    (host, rule_type, pattern, rule_to_regex(pattern), len(pattern))
    for host, body in sorted(_ROBOTS_BODIES.items())
    for rule_type, pattern in parse_robots(body)
]
assert all(
    "'" not in p and "\\" not in rx for _, _, p, rx, _ in _RULE_ROWS
), "fixture rules must inline into SQL literals unescaped"

_RULES_VALUES = ",\n    ".join(
    f"('{h}', '{t}', '{p}', '{rx}', {ln})"
    for h, t, p, rx, ln in _RULE_ROWS
)


@register(
    "crawl_robots_filter",
    oracle=_CANON_CTES
    + f"""
, rules(host, rule_type, pattern, regex, rule_len) AS (
  VALUES {_RULES_VALUES}
), m AS (
  SELECT c.doc_id, r.rule_type, r.pattern, r.rule_len
  FROM canon c JOIN rules r ON r.host = c.host
  WHERE regexp_matches(c.path, r.regex)
), w AS (
  SELECT doc_id, rule_type, pattern,
         ROW_NUMBER() OVER (
             PARTITION BY doc_id
             ORDER BY rule_len DESC,
                      (rule_type = 'allow') DESC,
                      pattern DESC) AS rn
  FROM m
)
SELECT c.doc_id, c.host, c.path,
       COALESCE(w.rule_type = 'allow', TRUE) AS allowed,
       COALESCE(w.pattern, 'default') AS rule
FROM canon c
LEFT JOIN (SELECT * FROM w WHERE rn = 1) w USING (doc_id)
ORDER BY c.doc_id
""",
    doc="Robots Exclusion Protocol politeness gate (operators/"
    "robots.py, RFC 9309): per-host robots.txt bodies are parsed "
    "driver-side (crawl config, not corpus data — agent-group "
    "selection, comments, empty-Disallow handled), the compiled rule "
    "table broadcasts, and every frontier URL gets the REP verdict via "
    "anchored-regex prefix match + ONE max_by over (pattern length, "
    "allow-wins-ties). The oracle replays matching and the full "
    "precedence ladder on the identical inlined rules; the fixture "
    "exercises prefix shadowing (/docs/1 vs /docs/10), wildcard+anchor "
    "(/*/3$) and the exact-length tie (allow wins).",
)
def crawl_robots_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from economic_data_etl_spark.operators import robots

    rules = spark.createDataFrame(
        _RULE_ROWS,
        "host string, rule_type string, pattern string, "
        "regex string, rule_len int",
    )
    pages = _canonicalized(spark, sf_dir).select("doc_id", "host", "path")
    out = robots.robots_filter(pages, rules)
    return out.orderBy("doc_id")
