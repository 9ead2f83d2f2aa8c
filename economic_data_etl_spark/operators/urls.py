"""URL canonicalization for crawl-corpus curation — pure JVM expressions.

A crawl frontier at 100 TB sees the same page under many spellings:
scheme/host case, `www.` prefixes, default ports, duplicate and trailing
slashes, tracking parameters (`utm_*`, `fbclid`, ...), shuffled query
order, fragments. Canonicalizing BEFORE the URL-dedup pass is what makes
the frontier's exact-dedup groupBy collapse true aliases, so it belongs
in the ingestion lane next to the WARC reader (operators/warc.py) and
the visible-text extractor (operators/html.py).

Everything here is a composition of built-in string/regexp/array
expressions — whole-stage codegen, no UDFs, no shuffle — so the
canonicalizer runs inside the scan projection at full JVM speed, and
every step has an exact DuckDB twin (plans/crawlq.py oracles replay the
identical regex chain).

Scope (documented, not hidden): absolute http(s) URLs without userinfo;
percent-encoding normalization and IDN/punycode are out of scope — both
need a character-level decoder that regexp replacement can't express,
and crawl frontiers treat differently-encoded URLs as distinct anyway.

No reference-repo counterpart (the pandas reference ingests REST APIs,
src/extract.py:20-175, and has no URL surface); training-pipeline
extension for the crawl ingestion stack.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Query parameters that never identify content: analytics trackers.
TRACKING_PARAM_RE = "^(utm_[a-z0-9]+|fbclid|gclid|ref)="

_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"


def url_scheme(url: Column) -> Column:
    """Lower-cased scheme ('' when the URL is not absolute)."""
    return F.lower(F.regexp_extract(url, _SCHEME_RE, 1))


def _rest(url: Column) -> Column:
    """Everything after scheme:// with the fragment stripped."""
    return F.regexp_replace(
        F.regexp_replace(url, "#.*$", ""), _SCHEME_RE, ""
    )


def _hostport(url: Column) -> Column:
    return F.lower(F.regexp_extract(_rest(url), "^[^/?#]*", 0))


def url_host(url: Column) -> Column:
    """Canonical host: lower-cased, port and leading `www.` stripped."""
    return F.regexp_replace(
        F.regexp_replace(_hostport(url), ":[0-9]+$", ""), "^www\\.", ""
    )


def _port_part(url: Column) -> Column:
    """':port' unless absent or the scheme default (http:80/https:443)."""
    port = F.regexp_extract(_hostport(url), ":([0-9]+)$", 1)
    scheme = url_scheme(url)
    is_default = (
        (port == "")
        | ((scheme == F.lit("http")) & (port == "80"))
        | ((scheme == F.lit("https")) & (port == "443"))
    )
    return F.when(is_default, F.lit("")).otherwise(F.concat(F.lit(":"), port))


def url_path(url: Column) -> Column:
    """Canonical path: duplicate slashes collapsed, trailing slash
    stripped (except root), empty path -> '/'."""
    pathq = F.regexp_replace(_rest(url), "^[^/?#]*", "")
    path = F.regexp_replace(
        F.regexp_extract(pathq, "^[^?]*", 0), "/+", "/"
    )
    path = F.when(path == "", F.lit("/")).otherwise(path)
    return F.when(
        (path != "/") & path.endswith("/"),
        F.substring(path, 1, F.length(path) - 1),
    ).otherwise(path)


def url_query(url: Column) -> Column:
    """Canonical query string: tracking params dropped, remaining
    key=value parts sorted lexicographically ('' when none survive)."""
    pathq = F.regexp_replace(_rest(url), "^[^/?#]*", "")
    q = F.when(
        pathq.contains("?"), F.regexp_extract(pathq, "\\?(.*)$", 1)
    ).otherwise(F.lit(""))
    kept = F.array_sort(
        F.filter(
            F.split(q, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    return F.array_join(kept, "&")


def canonical_url(url: Column) -> Column:
    """scheme://host[:port]path[?query] with every alias collapsed."""
    qs = url_query(url)
    return F.concat(
        url_scheme(url),
        F.lit("://"),
        url_host(url),
        _port_part(url),
        url_path(url),
        F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs)),
    )
