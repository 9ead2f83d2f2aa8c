"""Set-oriented upsert with per-row outcome classification.

Reference parity: `upsert_observations` / `upsert_dim_series`
(reference src/load.py:42-134) classify each incoming row as
inserted / updated / unchanged against the existing table, apply the
changes, and report a stats dict. The reference loads the whole table
into a Python dict and loops (src/load.py:55-77) — explicitly flagged
there as non-scalable (src/load.py:121-122).

Spark-first design: ONE full-outer join on the key, `when/otherwise`
classification with NaN-safe epsilon equality, and a staged atomic
rewrite of the target. The join shuffles both sides on the key once;
with the target bucketed by key (or Delta + MERGE where available) even
that shuffle disappears on the existing side. Stats come from a
`groupBy(status).count()` — no driver-side row loop at any size.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from economic_data_etl_spark.functions.casts import nan_safe_eq

STATUS_COL = "__change_status"
INSERTED, UPDATED, UNCHANGED = "inserted", "updated", "unchanged"


@dataclass(frozen=True)
class UpsertResult:
    merged: DataFrame  # post-merge content of the target
    stats: dict[str, int]  # {"inserted": n, "updated": n, "unchanged": n}


def classify_upsert(
    existing: DataFrame,
    incoming: DataFrame,
    keys: list[str],
    compare_cols: list[str],
    eps: float = 1e-9,
) -> DataFrame:
    """Incoming rows + STATUS_COL ∈ {inserted, updated, unchanged}.

    A row is `unchanged` when every compare column is NaN-safe-epsilon
    equal (reference src/load.py:27-35,64-77); `inserted` when the key is
    absent from `existing`.
    """
    ex = existing.select(
        *[F.col(k).alias(f"__ex_{k}") for k in keys],
        *[F.col(c).alias(f"__ex_{c}") for c in compare_cols],
        F.lit(1).alias("__ex_present"),
    )
    cond = functools.reduce(
        Column.__and__, [incoming[k] == ex[f"__ex_{k}"] for k in keys]
    )
    joined = incoming.join(ex, cond, "left")

    numeric = {
        f.name
        for f in incoming.schema.fields
        if f.dataType.typeName()
        in ("double", "float", "decimal", "integer", "long", "short", "byte")
    }

    def col_equal(c: str) -> Column:
        if c in numeric:  # epsilon tolerance only makes sense for numbers
            return nan_safe_eq(F.col(c), F.col(f"__ex_{c}"), eps)
        return F.col(c).eqNullSafe(F.col(f"__ex_{c}"))

    all_equal = functools.reduce(Column.__and__, [col_equal(c) for c in compare_cols])
    status = (
        F.when(F.col("__ex_present").isNull(), INSERTED)
        .when(all_equal, UNCHANGED)
        .otherwise(UPDATED)
    )
    return joined.withColumn(STATUS_COL, status).select(*incoming.columns, STATUS_COL)


def upsert_stats(classified: DataFrame) -> dict[str, int]:
    counts = {
        r[STATUS_COL]: r["n"]
        for r in classified.groupBy(STATUS_COL).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    return {s: int(counts.get(s, 0)) for s in (INSERTED, UPDATED, UNCHANGED)}


def merge_tables(
    existing: DataFrame, incoming: DataFrame, keys: list[str]
) -> DataFrame:
    """Post-merge target: incoming wins on key collision, existing rows
    without a matching incoming key are retained (anti-join + union —
    exactly MERGE WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT)."""
    retained = existing.join(incoming.select(*keys), keys, "left_anti")
    return retained.unionByName(incoming.select(*existing.columns))


RETAINED = "retained"  # existing-only rows; kept, never counted in stats


def merge_with_status(
    existing: DataFrame,
    incoming: DataFrame,
    keys: list[str],
    compare_cols: list[str],
    eps: float = 1e-9,
) -> DataFrame:
    """ONE full-outer join producing the merged target content plus
    STATUS_COL ∈ {inserted, updated, unchanged, retained}.

    This is the single-pass MERGE shape: each side is scanned once,
    shuffled on the key once; the merged row takes incoming values when
    present, existing otherwise. Stats can ride along with the write via
    observe() — no second job (see upsert_parquet).
    """
    all_cols = existing.columns
    inc = incoming.select(
        *[F.col(c).alias(f"__in_{c}") for c in all_cols],
        F.lit(1).alias("__in_present"),
    )
    ex = existing.select(
        *[F.col(c).alias(f"__ex_{c}") for c in all_cols],
        F.lit(1).alias("__ex_present"),
    )
    cond = functools.reduce(
        Column.__and__, [inc[f"__in_{k}"] == ex[f"__ex_{k}"] for k in keys]
    )
    joined = inc.join(ex, cond, "full_outer")

    numeric = {
        f.name
        for f in existing.schema.fields
        if f.dataType.typeName()
        in ("double", "float", "decimal", "integer", "long", "short", "byte")
    }

    def col_equal(c: str) -> Column:
        if c in numeric:
            return nan_safe_eq(F.col(f"__in_{c}"), F.col(f"__ex_{c}"), eps)
        return F.col(f"__in_{c}").eqNullSafe(F.col(f"__ex_{c}"))

    all_equal = functools.reduce(Column.__and__, [col_equal(c) for c in compare_cols])
    status = (
        F.when(F.col("__ex_present").isNull(), INSERTED)
        .when(F.col("__in_present").isNull(), RETAINED)
        .when(all_equal, UNCHANGED)
        .otherwise(UPDATED)
    )
    # Row selection is STATUS-driven, not per-column coalesce, to match
    # the reference's UPDATE semantics (src/load.py:78-103) exactly:
    # - updated rows take the incoming row WHOLESALE, including NULL
    #   values — coalesce would resurrect the existing value and lose a
    #   revision-to-NULL ("." marker) entirely;
    # - unchanged rows keep the EXISTING row untouched — the reference
    #   issues no UPDATE for them, so an incoming row with an equal
    #   value but different non-compare columns (series_name) must not
    #   silently rewrite them.
    take_incoming = status.isin(INSERTED, UPDATED)
    merged_cols = [
        F.when(take_incoming, F.col(f"__in_{c}"))
        .otherwise(F.col(f"__ex_{c}"))
        .alias(c)
        for c in all_cols
    ]
    return joined.select(*merged_cols, status.alias(STATUS_COL))


def upsert(
    existing: DataFrame,
    incoming: DataFrame,
    keys: list[str],
    compare_cols: list[str],
    eps: float = 1e-9,
) -> UpsertResult:
    """Two-job convenience form (stats action + merged lineage). For the
    one-job write path use upsert_parquet, which rides the stats on the
    write via observe()."""
    classified = classify_upsert(existing, incoming, keys, compare_cols, eps)
    return UpsertResult(
        merged=merge_tables(existing, incoming, keys),
        stats=upsert_stats(classified),
    )


def upsert_parquet(
    spark,
    incoming: DataFrame,
    target_path: str,
    keys: list[str],
    compare_cols: list[str],
    eps: float = 1e-9,
) -> dict[str, int]:
    """Plain-parquet upsert with staged atomic rewrite (no Delta needed):
    write merged output to `<target>.staging`, then swap directories.
    On object stores the swap becomes a metadata-catalog pointer flip.

    Single-pass: the full-outer merge and the outcome stats share one
    job — stats are collected by observe() metrics during the staging
    write, so neither table is scanned twice.
    """
    import os
    import shutil

    from pyspark.sql import Observation

    if os.path.exists(target_path):
        existing = spark.read.parquet(target_path)
    else:
        existing = spark.createDataFrame([], incoming.schema)

    # A batch with duplicate keys would fan out against the existing row
    # and write duplicate target rows (the reference's SQL PK would reject
    # the batch outright). Keep one arbitrary survivor per key — callers
    # needing last-write-wins should pre-aggregate with an ordering column.
    incoming = incoming.dropDuplicates(keys)

    merged = merge_with_status(existing, incoming, keys, compare_cols, eps)
    obs = Observation()
    observed = merged.observe(
        obs,
        *[
            F.count(F.when(F.col(STATUS_COL) == s, 1)).alias(s)
            for s in (INSERTED, UPDATED, UNCHANGED)
        ],
    ).drop(STATUS_COL)

    staging = f"{target_path}.staging"
    observed.write.mode("overwrite").parquet(staging)
    if os.path.exists(target_path):
        shutil.rmtree(target_path)
    os.rename(staging, target_path)
    got = obs.get
    return {s: int(got[s]) for s in (INSERTED, UPDATED, UNCHANGED)}


def insert_missing(
    existing: DataFrame, incoming: DataFrame, keys: list[str]
) -> tuple[DataFrame, dict[str, int]]:
    """Dim-table insert-only upsert (reference src/load.py:108-134):
    anti-join picks rows whose key is new; stats = {inserted, unchanged}."""
    new_rows = incoming.join(existing.select(*keys), keys, "left_anti")
    n_new = new_rows.count()
    n_total = incoming.count()
    return new_rows, {"inserted": int(n_new), "unchanged": int(n_total - n_new)}
