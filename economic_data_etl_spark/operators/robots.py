"""Robots Exclusion Protocol (REP) for crawl-frontier filtering —
from-scratch parser + distributed longest-match rule evaluation.

The politeness gate of a crawler: before a frontier URL is fetched, the
host's robots.txt decides. RFC 9309 / the Google REP spec define the
semantics this module implements:

- records are user-agent groups; the group with the LONGEST user-agent
  match wins (exact product token, else ``*``), and only that group's
  rules apply;
- Allow/Disallow values are path patterns: prefix match, with ``*``
  matching any character run and a trailing ``$`` anchoring the end;
- among matching rules the MOST SPECIFIC (longest pattern) wins; on an
  exact length tie the least restrictive (Allow) wins;
- no matching rule -> allowed; an empty Disallow value -> allow all
  (it matches nothing).

Design for scale: robots rules are crawl CONFIG — thousands of rows
(hosts x rules), not corpus-sized — so parsing runs driver-side on the
fetched robots bodies and the compiled rule table collapses to one
guarded literal expression per rule. Each frontier URL evaluates its
verdict IN-ROW (host equality + anchored ``regexp_like`` with a
LITERAL pattern — compiled once, codegen; both engines treat
``^``-anchored patterns identically — then ``greatest`` over (pattern
length, allow-wins-ties)). Zero corpus shuffle: the gate is a pure
projection that runs inside whatever scan/stage feeds it.

No reference-repo counterpart; crawl-ingestion extension alongside
operators/urls.py (canonicalization) and streaming/crawl_frontier.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Characters with meaning in BOTH Java regex and RE2; everything else in
# a robots path pattern is literal. '*' and a trailing '$' carry REP
# meaning and are translated, not escaped.
_REGEX_SPECIALS = set(".^$+?()[]{}|\\")


def rule_to_regex(pattern: str) -> str:
    """REP path pattern -> anchored regex valid in Java regex AND RE2.

    '*' -> '.*'; a trailing '$' -> end anchor; all other characters are
    matched literally. The result is '^'-anchored so partial-match
    engines (Spark rlike, DuckDB regexp_matches) implement REP's
    starts-with semantics exactly.
    """
    end_anchor = pattern.endswith("$")
    body = pattern[:-1] if end_anchor else pattern
    out = ["^"]
    for ch in body:
        if ch == "*":
            out.append(".*")
        elif ch in _REGEX_SPECIALS:
            out.append("\\" + ch)
        else:
            out.append(ch)
    if end_anchor:
        out.append("$")
    return "".join(out)


def parse_robots(text: str, agent: str = "spark-graft") -> list[tuple[str, str]]:
    """robots.txt body -> [(rule_type, path_pattern)] for `agent`.

    Implements the grouping rules of RFC 9309 §2.2: consecutive
    User-agent lines open a group; the group whose agent token is the
    longest match for `agent` applies (falling back to '*'); groups
    with the same winning token merge. Comments (#) and unknown
    directives are ignored; an empty Disallow value matches nothing
    and is dropped. Matching is case-insensitive on directive names
    and agent tokens.
    """
    agent_l = agent.lower()
    groups: dict[str, list[tuple[str, str]]] = {}
    current: list[str] = []
    in_agent_run = False
    for raw_line in text.splitlines():
        line = raw_line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if not in_agent_run:
                current = []
            in_agent_run = True
            current.append(value.lower())
            groups.setdefault(value.lower(), [])
        elif key in ("allow", "disallow"):
            in_agent_run = False
            if key == "disallow" and value == "":
                continue  # empty Disallow: allow all (matches nothing)
            if key == "allow" and value == "":
                continue
            for a in current:
                groups.setdefault(a, []).append((key, value))
        else:
            in_agent_run = False  # crawl-delay, sitemap, ...: ignored
    # longest agent-token match wins; '*' is the fallback
    best: str | None = None
    for token in groups:
        if token != "*" and token in agent_l:
            if best is None or len(token) > len(best):
                best = token
    if best is None and "*" in groups:
        best = "*"
    return groups.get(best, []) if best is not None else []


def compile_rules(
    spark, per_host_robots: dict[str, str], agent: str = "spark-graft"
) -> DataFrame:
    """{host: robots.txt body} -> broadcastable rule table
    (host, rule_type, pattern, regex, rule_len). Driver-side parse —
    robots bodies are crawl config, not corpus data."""
    rows = []
    for host, body in per_host_robots.items():
        for rule_type, pattern in parse_robots(body, agent):
            rows.append(
                (
                    host,
                    rule_type,
                    pattern,
                    rule_to_regex(pattern),
                    len(pattern),
                )
            )
    return spark.createDataFrame(
        rows,
        "host string, rule_type string, pattern string, "
        "regex string, rule_len int",
    )


# robots_filter unrolls one guarded literal expression per rule;
# Catalyst analysis/codegen degrade past a few thousand subtrees, so an
# oversized rule table must fail loudly rather than build that plan.
MAX_INLINE_RULES = 4000


def robots_filter(
    urls: DataFrame,
    rules: DataFrame,
    host_col: str = "host",
    path_col: str = "path",
) -> DataFrame:
    """Per URL: REP verdict (allowed, winning pattern or 'default').

    Pure per-row projection, ZERO shuffle: the rule table is crawl
    CONFIG (driver-parsed — see module docstring), so it collapses to
    one guarded literal expression per rule and the verdict is an
    in-row F.greatest over the matching rules' (rule_len, allow,
    pattern) structs. The previous join + groupBy shape re-shuffled
    every URL row — with the caller's payload columns (document text)
    as part of the GROUP BY key, the whole corpus crossed the exchange
    to decide a per-row predicate (guide §2.3: shuffle keys/metadata,
    never payloads; §2.4: remove the shuffle outright). Winner
    selection is unchanged: longest pattern wins, exact length tie ->
    allow, pattern string as the final determinism tiebreak; no
    matching rule -> the REP default (allowed, 'default'). Expression
    width is O(rules), fine for per-crawl rule sets; a deployment with
    a very large multi-host rule table should shard calls by host
    group before this gate (each host's own rules are always few) —
    the MAX_INLINE_RULES cap below makes an oversized table fail
    loudly instead of building a pathological plan.

    Cardinality contract: this is a pure projection — exact-duplicate
    input rows stay duplicated in the output (the retired join+groupBy
    shape collapsed them; current callers are unique by doc_id, and
    the per-row verdict semantics are the correct ones). Pinned by
    tests/test_robots.py.
    """
    rule_rows = rules.collect()  # config-sized by contract
    if len(rule_rows) > MAX_INLINE_RULES:
        raise ValueError(
            f"robots_filter inlines one expression per rule; got "
            f"{len(rule_rows)} rules (> {MAX_INLINE_RULES}). Shard "
            "calls by host group so each call sees a config-sized "
            "rule set."
        )
    out_cols = [F.col(c) for c in urls.columns]
    if not rule_rows:
        return urls.select(
            *out_cols,
            F.lit(True).alias("allowed"),
            F.lit("default").alias("rule"),
        )
    # One guarded struct per rule, LITERAL regex (so RLike compiles the
    # pattern once, inside whole-stage codegen, and the host/path
    # subexpressions get CSE) — a HOF fold over a rule array would
    # evaluate regexp_like with a NON-foldable pattern (Pattern.compile
    # per row x rule, interpreted, and CollapseProject inlines the
    # caller's url-derivation chain into every lambda invocation:
    # measured 5.6 s on crawl_robots_filter vs ~1 s for this shape).
    # Struct field order IS the winner ordering (rule_len, allow,
    # pattern); F.greatest skips NULLs (non-matching rules).
    host_c, path_c = F.col(host_col), F.col(path_col)
    cands = [
        F.when(
            (host_c == F.lit(r["host"]))
            & F.regexp_like(path_c, F.lit(r["regex"])),
            F.struct(
                F.lit(r["rule_len"]).alias("rule_len"),
                F.lit(r["rule_type"] == "allow").alias("a"),
                F.lit(r["pattern"]).alias("pattern"),
            ),
        )
        for r in rule_rows
    ]
    winner = cands[0] if len(cands) == 1 else F.greatest(*cands)
    return urls.select(
        *out_cols,
        F.coalesce(winner["a"], F.lit(True)).alias("allowed"),
        F.coalesce(winner["pattern"], F.lit("default")).alias("rule"),
    )
