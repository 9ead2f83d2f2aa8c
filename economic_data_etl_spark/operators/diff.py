"""Snapshot diff: classify rows as inserted / deleted / updated /
unchanged between two versions of a table.

The data-ops companion to the upsert operator (upsert.py APPLIES
changes; this DETECTS them): validating a migrated table against its
source, auditing what a pipeline run actually changed, or generating a
change feed from two snapshot exports when no CDC stream exists.

Shape: ONE full-outer join on the key, with change classification as a
when/otherwise expression over null-safe column comparisons — no
collect, no per-column passes. At scale both sides shuffle once on the
key; if either side is bucketed on the key (operators/skew.py), the
exchange on that side disappears entirely.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """(key cols…, change) where change ∈ inserted|deleted|updated|unchanged.

    `compare_cols` defaults to all shared non-key columns. Comparison is
    null-safe (<=>): NULL == NULL counts as unchanged, NULL vs value as
    updated — snapshot semantics, not SQL ternary logic.
    """
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in set(keys)]

    o = old.select(
        *[F.col(k).alias(f"__ok_{k}") for k in keys],
        *[F.col(c).alias(f"__o_{c}") for c in compare_cols],
    )
    n = new.select(
        *[F.col(k).alias(f"__nk_{k}") for k in keys],
        *[F.col(c).alias(f"__n_{c}") for c in compare_cols],
    )
    cond = None
    for k in keys:
        eq = F.col(f"__ok_{k}") == F.col(f"__nk_{k}")
        cond = eq if cond is None else cond & eq
    joined = o.join(n, cond, "full_outer")

    in_old = F.col(f"__ok_{keys[0]}").isNotNull()
    in_new = F.col(f"__nk_{keys[0]}").isNotNull()
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
    change = (
        F.when(~in_old, F.lit("inserted"))
        .when(~in_new, F.lit("deleted"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("updated"))
    )
    return joined.select(
        *[
            F.coalesce(F.col(f"__nk_{k}"), F.col(f"__ok_{k}")).alias(k)
            for k in keys
        ],
        change.alias("change"),
    )


def diff_summary(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Change counts by category — the audit line a pipeline run logs."""
    return (
        table_diff(old, new, keys, compare_cols)
        .groupBy("change")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("change")
    )
