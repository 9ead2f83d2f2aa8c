"""Registry for the engine's query catalog.

Each query is registered once with its Spark builder and (when
SQL-expressible) a DuckDB-compatible oracle SQL string. The driver runs
both sides at sf0.01 and compares row count + schema + order-insensitive
value hash, so every computed column must carry the SAME alias on both
sides, and floating-point aggregates are rounded to a fixed precision on
both sides (different summation orders make the low bits diverge).
"""

from __future__ import annotations

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

    return F.round(col + F.lit(ROUND_BIAS), dp)


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
        REGISTRY[name] = Query(name=name, spark=fn, oracle=oracle, doc=doc or fn.__doc__ or "")
        return fn

    return deco
