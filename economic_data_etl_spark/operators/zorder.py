"""Z-order (Morton-curve) clustering for multi-column data skipping.

The 100 TB problem this solves: parquet/Delta data skipping works off
per-file min/max statistics. Sorting a table by ONE column makes its
per-file ranges tight for that column but leaves every other column's
ranges spanning the whole domain — a filter on the second column still
opens every file. Interleaving the bits of several columns' bucket ranks
(the Morton / Z-curve) and range-partitioning + sorting by that key keeps
per-file ranges tight on ALL interleaved columns simultaneously, so
point/range filters on any of them skip most files.

Spark-first construction — everything stays JVM-side:

1. Equi-depth bucket boundaries per column via `approxQuantile`
   (Greenwald-Khanna sketch, one pass, driver receives ≤ 2^bits doubles
   per column — no collect of data rows). Equi-depth, not equi-width:
   min/max scaling would let one outlier crush the resolution of a
   skewed column.
2. Bucket assignment via `pyspark.ml.feature.Bucketizer` (JVM binary
   search per row; no interpreted HOF loop, no Python).
3. Bit interleave as a fixed expression tree built by a Python loop over
   (bit, column) — `bits × ncols` shift/and/or terms inside whole-stage
   codegen.
4. `repartitionByRange(zkey)` + `sortWithinPartitions(zkey)` → each
   output file covers a compact Z-curve segment.

`file_scan_fraction` reads parquet footers (pyarrow) and reports the
fraction of files a point filter must open — the skipping win is
asserted, not assumed, in tests/test_zorder.py.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from economic_data_etl_spark.functions.casts import ts_epoch_seconds


def _bucketize(df: DataFrame, cols: Sequence[str], bits: int) -> DataFrame:
    """Add __bkt_<col> (long in [0, 2^bits)) per clustered column."""
    from pyspark.ml.feature import Bucketizer

    n_buckets = 1 << bits
    probs = [i / n_buckets for i in range(1, n_buckets)]
    for c in cols:
        dcol = f"__dbl_{c}"
        # Timestamps/dates → epoch seconds; everything else → double.
        # timestamp_ntz must route through ts_epoch_seconds: Spark 4.1
        # forbids casting NTZ to double, and unix_timestamp doesn't
        # accept NTZ either.
        field = dict(df.dtypes)[c]
        if field in ("timestamp", "timestamp_ntz"):
            src = ts_epoch_seconds(F.col(c))
        elif field == "date":
            src = F.unix_timestamp(F.col(c)).cast("double")
        else:
            src = F.col(c).cast("double")
        df = df.withColumn(dcol, src)
        bounds = df.stat.approxQuantile(dcol, probs, 0.001)
        # Dedup (constant-ish columns repeat boundaries) and wrap ±inf.
        splits = [float("-inf")]
        for b in bounds:
            if b > splits[-1]:
                splits.append(b)
        splits.append(float("inf"))
        df = Bucketizer(
            splits=splits,
            inputCol=dcol,
            outputCol=f"__bktd_{c}",
            handleInvalid="keep",  # nulls → extra last bucket
        ).transform(df)
        df = df.withColumn(f"__bkt_{c}", F.col(f"__bktd_{c}").cast("long")).drop(
            dcol, f"__bktd_{c}"
        )
    return df


def _interleave(cols: Sequence[str], bits: int) -> Column:
    """Morton key: bit i of column c lands at position i*ncols + c."""
    ncols = len(cols)
    terms = []
    for i in range(bits):
        for c_idx, c in enumerate(cols):
            bit = F.shiftrightunsigned(F.col(f"__bkt_{c}"), i).bitwiseAND(
                F.lit(1)
            )
            terms.append(F.shiftleft(bit, i * ncols + c_idx))
    key = terms[0]
    for t in terms[1:]:
        key = key.bitwiseOR(t)
    return key.cast("long")


def with_zorder_key(
    df: DataFrame, cols: Sequence[str], bits: int = 8
) -> DataFrame:
    """Append a `__zkey` Morton key over `cols` (each equi-depth-bucketed
    to 2^bits ranks). Null values sort into the top bucket."""
    bucketed = _bucketize(df, cols, bits)
    return bucketed.withColumn("__zkey", _interleave(cols, bits)).drop(
        *[f"__bkt_{c}" for c in cols]
    )


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    bits: int = 8,
    num_files: int = 16,
    mode: str = "overwrite",
) -> None:
    """Rewrite `df` clustered on the Z-curve of `cols`.

    repartitionByRange gives disjoint __zkey ranges per output file (one
    shuffle — same cost class as any sort-based rewrite); the within-file
    sort keeps row groups locally clustered too, so even row-group-level
    stats stay tight.
    """
    (
        with_zorder_key(df, cols, bits)
        .repartitionByRange(num_files, F.col("__zkey"))
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode(mode)
        .parquet(path)
    )


def file_scan_fraction(path: str, col: str, value) -> float:
    """Fraction of parquet files whose footer [min, max] for `col`
    admits `value` — i.e. the files a point filter must actually open.
    Driver-side footer reads only (this is a test/diagnostic helper; at
    scale the same skipping happens inside the parquet reader)."""
    from pathlib import Path

    import pyarrow.parquet as pq

    files = sorted(Path(path).glob("*.parquet"))
    hits = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            stats = md.row_group(rg).column(idx).statistics
            if stats is None or not stats.has_min_max:
                lo, hi = None, None
                break
            lo = stats.min if lo is None else min(lo, stats.min)
            hi = stats.max if hi is None else max(hi, stats.max)
        if lo is None or (lo <= value <= hi):
            hits += 1  # no stats → must read
    return hits / max(1, len(files))


# ---------------------------------------------------------------------------
# Exact fixed-grid interleave with a DuckDB twin (the certification
# layer under plans/layout.py).
# ---------------------------------------------------------------------------
# The production path above equi-depth-buckets arbitrary columns and
# range-partitions the write; the layer below is the EXACT arithmetic
# core (inputs already in [0, 2^bits)) kept in lockstep with a DuckDB
# SQL twin so the catalog queries can value-check the interleave and
# the locality guarantees cross-engine.


def zvalue(x: Column, y: Column, bits: int = 10) -> Column:
    """Morton-interleave the low `bits` bits of two non-negative
    integer columns: result bit 2i is x's bit i, bit 2i+1 is y's bit i.
    Pure bitwise projection (codegen-friendly); callers mask/scale
    inputs into [0, 2^bits) first."""
    terms = []
    for i in range(bits):
        xb = F.shiftright(x.cast("long"), i).bitwiseAND(F.lit(1))
        yb = F.shiftright(y.cast("long"), i).bitwiseAND(F.lit(1))
        terms.append(F.shiftleft(xb, 2 * i))
        terms.append(F.shiftleft(yb, 2 * i + 1))
    return reduce(lambda a, b: a.bitwiseOR(b), terms).alias("zvalue")


def zvalue_sql(x_expr: str, y_expr: str, bits: int = 10) -> str:
    """DuckDB twin of zvalue(): the identical shift/and/or arithmetic,
    kept in lockstep so oracles replay the interleave exactly. Every
    term is FULLY parenthesized — DuckDB/PostgreSQL give all bitwise
    operators ONE flat left-associative precedence level, so a bare
    `a << 2 | b << 3` parses as `((a << 2) | b) << 3`."""
    terms = []
    for i in range(bits):
        terms.append(f"(((({x_expr}) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((({y_expr}) >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"


def zvalue_py(x: int, y: int, bits: int = 10) -> int:
    """Python reference for tests."""
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


# ---------------------------------------------------------------------------
# Hilbert curve — the locality upgrade over Morton order.
# ---------------------------------------------------------------------------
# Z-order's aligned buckets bound both dimensions, but the curve JUMPS
# at high-bit carries (consecutive z cells can be half the grid apart),
# so unaligned range reads straddle distant regions. The Hilbert curve
# is CONTINUOUS: consecutive d cells are Manhattan-distance-1 neighbors
# — every contiguous d-range is one connected blob, the property
# range-partitioned layout files actually exploit.


def hilbert_py(x: int, y: int, bits: int = 10) -> int:
    """Python reference: the standard xy->d iteration (rotate/flip per
    level, top level first)."""
    d = 0
    s = 1 << (bits - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


# Finite-state-transducer tables for hilbert_d. The per-level rotate/
# flip of the classic loop is one of only FOUR transforms of the
# remaining low bits — {identity, swap, complement-both, swap+comp} =
# (Z/2)^2, encoded tau = swap | comp<<1 — so instead of rewriting
# (x, y) per level (whose branches re-inline through CollapseProject
# into a 3^bits-node tree) or folding with the interpreted F.aggregate
# HOF, we thread the 2-bit STATE through the levels and look digit and
# next-state up by key = tau*4 + x_bit*2 + y_bit:
#   bits after tau: (bx', by') = comp ^ (swap ? (by, bx) : (bx, by))
#   digit = (3*bx') ^ by'
#   sigma = I if by'==1 else (S if bx'==0 else swap+comp)
#   tau_next = tau ^ sigma            (the group is (Z/2)^2)
# Verified bit-exact against hilbert_py over the full 1024x1024 10-bit
# grid (and pinned for every grid point tests/test_zorder.py covers).
_HILBERT_DIGIT = (0, 1, 3, 2, 0, 3, 1, 2, 2, 3, 1, 0, 2, 1, 3, 0)
_HILBERT_NEXT = (1, 0, 3, 0, 0, 2, 1, 1, 2, 1, 2, 3, 3, 3, 0, 2)


def hilbert_d(x: Column, y: Column, bits: int = 10) -> Column:
    """Hilbert index as a LINEAR chain of codegen-able expressions: a
    4-state finite-state transducer over the per-level (x_bit, y_bit)
    pairs — state = the accumulated rotate/flip as 2 bits (swap, comp),
    digit and next-state read via element_at on 16-entry literal arrays
    (constant-folded to one Literal each; ElementAt is codegen). Same
    values as the classic rotate/flip loop (hilbert_py), but whole-stage
    codegen instead of an interpreted F.aggregate fold (measured 4.99 s
    -> z-order-class time on layout_hilbert_clustering at sf0.1):
    neither x nor y is ever rewritten, so there is no CollapseProject
    3^bits blowup, and expression size is O(bits^2) — tau_i feeds
    tau_{i+1} once (linear chain) plus one digit term per level."""
    dig_t = F.array(*[F.lit(v) for v in _HILBERT_DIGIT])
    nxt_t = F.array(*[F.lit(v) for v in _HILBERT_NEXT])
    xl = x.cast("long")
    yl = y.cast("long")
    tau: Column = F.lit(0)
    d: Column | None = None
    for i in range(bits - 1, -1, -1):
        bx = F.shiftright(xl, i).bitwiseAND(F.lit(1))
        by = F.shiftright(yl, i).bitwiseAND(F.lit(1))
        key1 = (tau * 4 + bx * 2 + by + F.lit(1)).cast("int")  # 1-based
        term = F.shiftleft(
            F.element_at(dig_t, key1).cast("long"), 2 * i
        )
        d = term if d is None else d.bitwiseOR(term)
        tau = F.element_at(nxt_t, key1)
    assert d is not None
    return d.cast("long")


def hilbert_sql_ctes(
    src: str, out: str, x_col: str = "x", y_col: str = "y",
    bits: int = 10,
) -> str:
    """DuckDB twin of hilbert_d as a generated chain of per-level CTEs
    (state columns hx, hy, hd; original columns pass through) — the
    same rotate/flip sequence, so the two engines cannot drift. The
    final CTE `out` exposes `hd`."""
    sql = (
        f", {out}_l{bits} AS (SELECT *, CAST({x_col} AS BIGINT) AS hx,"
        f" CAST({y_col} AS BIGINT) AS hy, CAST(0 AS BIGINT) AS hd"
        f" FROM {src})"
    )
    prev = f"{out}_l{bits}"
    for k in range(bits - 1, -1, -1):
        s = 1 << k
        rx = f"(CASE WHEN (hx & {s}) > 0 THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN (hy & {s}) > 0 THEN 1 ELSE 0 END)"
        name = f"{out}_l{k}" if k > 0 else out
        sql += f"""
    , {name} AS (
        SELECT * REPLACE (
            CASE WHEN {ry} = 0 THEN
                CASE WHEN {rx} = 1 THEN {s - 1} - hy ELSE hy END
            ELSE hx END AS hx,
            CASE WHEN {ry} = 0 THEN
                CASE WHEN {rx} = 1 THEN {s - 1} - hx ELSE hx END
            ELSE hy END AS hy,
            hd + {s * s} * xor(3 * {rx}, {ry}) AS hd
        ) FROM {prev}
    )"""
        prev = name
    return sql
