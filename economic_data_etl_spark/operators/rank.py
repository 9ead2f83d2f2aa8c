"""Distributed global row numbering — the two-phase rank.

`row_number() OVER (ORDER BY ...)` with no partitionBy moves every row
to ONE task; fine for dimension-sized inputs, fatal on a fact table at
cluster scale. This module's two-phase rank:

1. ONE pass computes ~balanced range boundaries on the leading sort
   key (approx_percentile) and collects them — a config-bounded list
   (one value per target partition), embedded as LITERALS;
2. every row's range bucket is then a PURE PROJECTION against those
   literals, so any re-evaluation of any branch assigns identical
   buckets — correctness does NOT depend on exchange/stage reuse
   (repartitionByRange was rejected here: its boundary sampling is
   seeded per RDD, so two evaluations of the same exchange can
   disagree, and AQE stage reuse is best-effort);
3. per-bucket counts (partial-aggregated map-side, a buckets-sized
   shuffle) are collected and turned into literal cumulative offsets;
4. the final rank = offset[bucket] + row_number over a window
   PARTITIONED by bucket — the single full-data exchange in the whole
   plan, the same shuffle a distributed sort would pay.

Skew note: boundaries equalize bucket sizes up to approx_percentile
accuracy; a single massively-repeated leading-key value concentrates
in one bucket (inherent to any order-preserving partitioning — the
same rows would tie in a global sort).

Used by `features_decile_bins` (exact distributed NTILE) and
`agg_gini_revenue_concentration` (rank-identity Gini); reusable for
any exact global rank over an unbounded input.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def with_global_row_number(
    df: DataFrame,
    order_cols: list[str],
    out: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append a 1-based global row number in (order_cols) ascending
    order without any single-partition window and without relying on
    exchange reuse.

    order_cols must form a total order (include a unique tiebreak
    column), and the LEADING column must be numeric (boundaries come
    from approx_percentile). NULLs in the leading key sort first
    (bucket 0 + the window's NULLS FIRST default), matching
    ROW_NUMBER() OVER (ORDER BY ...) ascending defaults.
    """
    spark = df.sparkSession
    parts = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    key = order_cols[0]
    cols = [F.col(c) for c in order_cols]
    # driver-bounded collects: `parts - 1` boundary values, then at
    # most `parts` bucket counts — both config-sized, never data-sized.
    fracs = [i / parts for i in range(1, parts)]
    brow = df.agg(
        F.percentile_approx(
            key, F.array(*[F.lit(f) for f in fracs]), 10_000
        ).alias("bs")
    ).collect()[0]["bs"]
    bounds = sorted(set(brow)) if brow else []
    if bounds:
        # count of boundary literals strictly below the key = bucket
        # id. ONE folded array literal (constant-folding collapses it),
        # per the repo's codegen-size rule; NULL key compares NULL ->
        # filtered out -> bucket 0 (NULLS FIRST).
        barr = F.array(*[F.lit(float(b)) for b in bounds])
        bucket = F.size(
            F.filter(barr, lambda b: F.col(key) > b)
        ).alias("__b")
    else:
        bucket = F.lit(0).alias("__b")
    withb = df.select("*", bucket)
    cnt_rows = withb.groupBy("__b").agg(
        F.count(F.lit(1)).alias("c")
    ).collect()
    counts = {r["__b"]: r["c"] for r in cnt_rows}
    offs, acc = [], 0
    for b in range(len(bounds) + 1):
        offs.append(acc)
        acc += counts.get(b, 0)
    offs_arr = F.array(*[F.lit(int(o)) for o in offs])
    w = Window.partitionBy("__b").orderBy(*cols)
    return (
        withb.withColumn(
            out,
            (
                F.element_at(offs_arr, F.col("__b") + 1)
                + F.row_number().over(w)
            ).cast("long"),
        )
        .drop("__b")
    )


def ntile_from_row_number(
    rn: Column, n: Column, buckets: int
) -> Column:
    """SQL NTILE(buckets) from a global row number and the total row
    count: base = n div k rows per bucket, the first n mod k buckets
    take one extra. Pure integer arithmetic — bit-identical to the
    window function on both engines."""
    k = F.lit(buckets)
    base = (n / k).cast("long")
    rem = n % k
    head = rem * (base + F.lit(1))
    return (
        F.when(
            rn <= head,
            ((rn - F.lit(1)) / (base + F.lit(1))).cast("long")
            + F.lit(1),
        )
        .otherwise(
            rem + ((rn - head - F.lit(1)) / base).cast("long") + F.lit(1)
        )
        .cast("int")
    )


def with_global_cumsum(
    df: DataFrame,
    order_cols: list[str],
    sum_cols: list[str],
    num_partitions: int | None = None,
) -> DataFrame:
    """Append running totals of sum_cols in (order_cols) ascending
    order — the distributed prefix-sum, built like the two-phase rank:
    collected approx-quantile boundary literals bucket every row by
    pure projection (reuse-independent), per-bucket totals are
    collected (a config-bounded table) and turned into literal offset
    arrays, and the final value = offset[bucket] + a bucket-PARTITIONED
    window cumsum. Output columns are named cum_<col>.

    order_cols must form a total order with a numeric leading column;
    NULL leading keys land in bucket 0 (NULLS FIRST)."""
    spark = df.sparkSession
    parts = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    key = order_cols[0]
    fracs = [i / parts for i in range(1, parts)]
    brow = df.agg(
        F.percentile_approx(
            key, F.array(*[F.lit(f) for f in fracs]), 10_000
        ).alias("bs")
    ).collect()[0]["bs"]
    bounds = sorted(set(brow)) if brow else []
    if bounds:
        barr = F.array(*[F.lit(float(b)) for b in bounds])
        bucket = F.size(
            F.filter(barr, lambda b: F.col(key) > b)
        ).alias("__b")
    else:
        bucket = F.lit(0).alias("__b")
    withb = df.select("*", bucket)
    # bounded collect: one row per non-empty bucket
    tot_rows = (
        withb.groupBy("__b")
        .agg(*[F.sum(c).alias(c) for c in sum_cols])
        .collect()
    )
    n_buckets = len(bounds) + 1
    offs = {c: [0] * n_buckets for c in sum_cols}
    acc = {c: 0 for c in sum_cols}
    totals = {r["__b"]: r for r in tot_rows}
    for b in range(n_buckets):
        for c in sum_cols:
            offs[c][b] = acc[c]
            if b in totals and totals[b][c] is not None:
                acc[c] += totals[b][c]
    w = (
        Window.partitionBy("__b")
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = withb
    for c in sum_cols:
        oarr = F.array(*[F.lit(int(v)) for v in offs[c]])
        out = out.withColumn(
            f"cum_{c}",
            (
                F.element_at(oarr, F.col("__b") + 1)
                + F.sum(c).over(w)
            ).cast("long"),
        )
    return out.drop("__b")
