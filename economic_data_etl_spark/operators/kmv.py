"""KMV (k-minimum-values) distinct-count sketch, from scratch.

Beyer et al., "On Synopses for Distinct-Value Estimation Under Multiset
Operations" (SIGMOD 2007): hash every value to a uniform in (0, 1],
keep the k SMALLEST distinct hashes; with U_k the k-th smallest,
D-hat = (k-1) / U_k is an unbiased distinct-count estimator with
relative error ~ 1/sqrt(k-2). Below k distinct values the sketch IS
the distinct set and the count is exact.

Why next to the HLL rollup: Spark's hll_sketch_agg estimates are
implementation-specific (rows-only checkable), while KMV built on the
repo's portable md5 hash is DETERMINISTIC cross-engine — DuckDB
replays sketch contents and estimates value-for-value. And unlike HLL,
a KMV sketch supports MULTISET OPERATIONS: the k smallest of a union
of sketches is the union sketch; Jaccard = |combined ∩ A ∩ B| / k
estimates intersection sizes — the set-overlap primitive HLL cannot
provide without inclusion-exclusion error blowup.

Scale shape: per-group sketches are "k smallest distinct hashes per
group" — a groupBy of distinct (group, hash) rows trimmed by a
WindowGroupLimit rank, so each map partition pre-trims to k rows per
group; merges read only sketch rows (k-bounded). The hash uses 15 hex
chars (60 bits) of md5: the long -> double normalization rounds
IEEE-identically on both engines, so every estimate is bit-portable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# 2^60: the hash range. 60 bits so the integer fits a BIGINT on both
# engines; (h + 1) / 2^60 lands in (0, 1].
HASH_RANGE = float(1 << 60)

# DuckDB twin of kmv_hash, for oracle SQL (format with key=<expr>).
KMV_HASH_SQL = (
    "(('0x' || substring(md5(CAST({key} AS VARCHAR)), 1, 15))::BIGINT)"
)


def kmv_hash(key: Column) -> Column:
    """60-bit md5 hash as BIGINT (the portable uniform source)."""
    return F.conv(
        F.substring(F.md5(key.cast("string")), 1, 15), 16, 10
    ).cast("long")


def kmv_sketch_by(
    df: DataFrame, key_col: str, group_col: str, k: int
) -> DataFrame:
    """(group, h, rn): the k smallest distinct key hashes per group.
    rn is the 1-based rank (rn = k row carries U_k). The distinct
    collapses map-side; the rank <= k filter compiles to
    WindowGroupLimit so partitions pre-trim to k rows per group."""
    hashed = (
        df.filter(F.col(key_col).isNotNull())  # like COUNT(DISTINCT)
        .select(
            F.col(group_col).alias("grp"),
            kmv_hash(F.col(key_col)).alias("h"),
        )
        .distinct()
    )
    rn = F.row_number().over(Window.partitionBy("grp").orderBy("h"))
    return hashed.select("grp", "h", rn.alias("rn")).filter(
        F.col("rn") <= k
    )


def kmv_estimate(sketch: DataFrame, k: int) -> DataFrame:
    """(grp, n_sketch, est): distinct-count estimate per group —
    exact n_sketch when the sketch holds fewer than k hashes, else
    (k-1) / U_k."""
    u_k = F.max(
        F.when(F.col("rn") == k, (F.col("h") + 1) / F.lit(HASH_RANGE))
    )
    return sketch.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n_sketch"),
        F.when(
            F.count(F.lit(1)) < k,
            F.count(F.lit(1)).cast("double"),
        )
        .otherwise(F.lit(float(k - 1)) / u_k)
        .alias("est"),
    )


def kmv_merge(sketches: DataFrame, k: int) -> DataFrame:
    """Union-merge per-group sketches into ONE combined sketch
    (grp = 'ALL'): the k smallest distinct hashes across groups —
    reads only sketch rows, never the raw keys."""
    merged = sketches.select("h").distinct()
    rn = F.row_number().over(Window.orderBy("h"))
    return merged.select(
        F.lit("ALL").alias("grp"), "h", rn.alias("rn")
    ).filter(F.col("rn") <= k)
