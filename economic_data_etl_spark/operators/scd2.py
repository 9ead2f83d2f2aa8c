"""SCD Type-2 (slowly-changing dimension) versioning.

The warehouse-standard way to keep attribute HISTORY: instead of
overwriting a dimension row, each attribute change closes the current
version (effective_to = change time) and opens a new one. The engine's
upsert (operators/upsert.py) is SCD1 — latest value wins; this module is
the SCD2 twin.

Set-oriented construction (no per-key loops, no MERGE round-trips):

1. `scd2_from_events` — given an event stream (key, attrs…, ts), build
   the full version table in TWO windows over one shuffle on the key:
   drop no-op events (attrs null-safe-equal to the immediate
   predecessor — equivalent to comparing against the last KEPT version,
   because dropped rows equal their predecessor transitively), then
   effective_to = lead(ts) and is_current = lead IS NULL.
2. `scd2_merge` — incremental maintenance: only keys PRESENT in the
   update batch are rebuilt (their closed history re-derived from the
   existing dim's version boundaries + the new events); untouched keys
   pass through unchanged. At 100 TB the update batch touches a tiny
   key fraction, so the rebuild join is semi-join-pruned to that
   fraction rather than rewriting the dimension.

Deterministic by construction (timestamps order the chain; callers must
pre-resolve same-timestamp conflicts, e.g. with max_by) — the catalog
query `scd2_customer_priority_history` is value-checked against a DuckDB
oracle replaying the identical window logic.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def scd2_from_events(
    events: DataFrame,
    key: str,
    attrs: Sequence[str],
    ts: str,
) -> DataFrame:
    """(key, attrs…, effective_from, effective_to, is_current) from an
    event log. Exactly one open (is_current) row per key; consecutive
    events with unchanged attrs collapse into one version."""
    w = Window.partitionBy(key).orderBy(ts)
    changed = F.lit(False)
    for a in attrs:
        changed = changed | ~F.col(a).eqNullSafe(F.lag(a).over(w))
    first = F.lag(ts).over(w).isNull()
    kept = events.withColumn("__keep", first | changed).filter("__keep")

    wk = Window.partitionBy(key).orderBy(ts)
    return (
        kept.withColumn("effective_to", F.lead(ts).over(wk))
        .select(
            key,
            *attrs,
            F.col(ts).alias("effective_from"),
            "effective_to",
            F.col("effective_to").isNull().alias("is_current"),
        )
    )


def scd2_merge(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    attrs: Sequence[str],
    ts: str,
) -> DataFrame:
    """Apply an update batch to an existing SCD2 dimension.

    Keys absent from the batch pass through untouched; keys present are
    rebuilt from (their existing version-start events) ∪ (the new
    events) — version starts ARE the original events for those keys, so
    the rebuild is lossless. Same column contract as scd2_from_events.
    """
    touched_keys = updates.select(key).distinct()
    untouched = dim.join(touched_keys, key, "left_anti")
    old_events = dim.join(touched_keys, key, "left_semi").select(
        key, *attrs, F.col("effective_from").alias(ts)
    )
    new_events = updates.select(key, *attrs, ts)
    rebuilt = scd2_from_events(
        old_events.unionByName(new_events), key, attrs, ts
    )
    return untouched.select(rebuilt.columns).unionByName(rebuilt)
