"""Registry for the engine's query catalog.

Each query is registered once with its Spark builder and (when
SQL-expressible) a DuckDB-compatible oracle SQL string. The driver runs
both sides at sf0.01 and compares row count + schema + order-insensitive
value hash, so every computed column must carry the SAME alias on both
sides, and floating-point aggregates are rounded to a fixed precision on
both sides (different summation orders make the low bits diverge).
"""

from __future__ import annotations

import re
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]

# Decimal places applied to floating-point outputs on BOTH sides.
FLOAT_DP = 4

# Tie-breaking bias added before rounding on BOTH sides. Spark rounds
# doubles HALF_UP over the exact binary expansion; DuckDB rounds via
# x*10^4 → nearest-int → /10^4. Averages over power-of-two counts land
# exactly on .xxxx5 boundaries and the two disagree; a +5e-10 nudge makes
# both engines round such ties upward identically.
ROUND_BIAS = 5e-10


def biased_round(col, dp: int = FLOAT_DP):
    from pyspark.sql import functions as F

    # Trailing +0.0 collapses IEEE -0.0 to +0.0: tiny negatives round to
    # -0.0 in DuckDB but +0.0 via Spark's BigDecimal round, and the
    # driver's value hash is bitwise, so the sign of zero must be
    # normalized on BOTH sides (the oracle twin is applied centrally by
    # _zero_sign_safe below).
    return F.round(col + F.lit(ROUND_BIAS), dp) + F.lit(0.0)


# Leading lookbehind: only a bare ROUND call — an identifier merely
# ENDING in "round(" (my_round(...)) must not be treated as a biased
# ROUND and wrapped/mangled at register() time.
_ROUND_TOKEN_RE = re.compile(r"(?<![A-Za-z0-9_])ROUND\s*\(", re.IGNORECASE)


def _zero_sign_safe(sql: str | None) -> str | None:
    """Wrap every biased ``ROUND(... 5e-10 ...)`` in an oracle string with
    ``(+ 0.0)`` so DuckDB's -0.0 results collapse to +0.0, matching the
    Spark side (see biased_round). Applied once at register() time so the
    141 hand-written oracle ROUNDs share one fix instead of 141 edits.
    Quote-aware; only ROUND calls whose balanced argument mentions the
    5e-10 bias are touched (unbiased ROUND may be DECIMAL-typed, where
    +0.0 would change the result type)."""
    if sql is None or "5e-10" not in sql:
        return sql
    out: list[str] = []
    i, n = 0, len(sql)
    while i < n:
        ch = sql[i]
        if ch == "'":  # skip string literals verbatim
            j = i + 1
            while j < n and sql[j] != "'":
                j += 1
            out.append(sql[i : j + 1])
            i = j + 1
            continue
        m = _ROUND_TOKEN_RE.match(sql, i)
        if not m:
            out.append(ch)
            i += 1
            continue
        # find the matching close paren of this ROUND(
        k, depth = m.end(), 1
        while k < n and depth:
            c = sql[k]
            if c == "'":
                k += 1
                while k < n and sql[k] != "'":
                    k += 1
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            k += 1
        span = sql[i:k]
        inner = _zero_sign_safe(span[m.end() - i : -1])
        span = span[: m.end() - i] + inner + ")"
        if "5e-10" in span:
            out.append("(" + span + " + 0.0)")
        else:
            out.append(span)
        i = k
    return "".join(out)


@dataclass(frozen=True)
class Query:
    name: str
    spark: SparkQuery
    oracle: str | None  # None → non-SQL-expressible, rows-only check
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(
    name: str, oracle: str | None = None, doc: str = ""
) -> Callable[[SparkQuery], SparkQuery]:
    """Decorator: add a (spark builder, oracle SQL) pair to the catalog."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(
            name=name,
            spark=fn,
            oracle=_zero_sign_safe(oracle),
            doc=doc or fn.__doc__ or "",
        )
        return fn

    return deco
