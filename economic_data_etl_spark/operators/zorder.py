"""Z-order (Morton) interleaving for multi-dimensional data layout.

The data-layout primitive behind multi-column file skipping on a large
lake: sorting by ONE column gives perfect min/max pruning on that
column and none on any other; sorting by the bit-interleaved Z-value
of two columns bounds BOTH coordinates inside every contiguous range —
a file holding z-values in [b*2^(2k), (b+1)*2^(2k)) provably confines
each dimension to a 2^k-wide band, so parquet min/max stats prune scans
on either column. (Same idea as Delta Lake / Iceberg Z-ORDER BY; this
is a from-scratch expression-level implementation.)

Spark-side the interleave is a PURE PROJECTION over built-in bitwise
ops — constant-folded shift/and/or tree, whole-stage codegen, zero
Python, zero shuffle. Layout jobs then range-partition + sort on the
z-value once at write time; the cost is the one sort every layout
strategy pays, and the win is multiplied across every later scan.

No reference counterpart (the reference has no layout operators); this
extends the engine surface the way bucketing/skew operators do.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F


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


def hilbert_d(x: Column, y: Column, bits: int = 10) -> Column:
    """Hilbert index as ONE Catalyst in-row fold (F.aggregate over the
    per-level scale literals, state = (x, y, d) struct) — the same
    interpreted-fold pattern as the Holt-Winters lane: no codegen
    blowup (a naive per-level expression chain re-inlines through
    CollapseProject into a 3^bits-node tree), no Python, no shuffle."""
    levels = F.array(
        *[F.lit(1 << k) for k in range(bits - 1, -1, -1)]
    )
    init = F.struct(
        x.cast("long").alias("x"),
        y.cast("long").alias("y"),
        F.lit(0).cast("long").alias("d"),
    )

    def step(acc: Column, s: Column) -> Column:
        rx = F.when(acc["x"].bitwiseAND(s) > 0, F.lit(1)).otherwise(
            F.lit(0)
        )
        ry = F.when(acc["y"].bitwiseAND(s) > 0, F.lit(1)).otherwise(
            F.lit(0)
        )
        d2 = acc["d"] + s * s * (rx * 3).bitwiseXOR(ry)
        fx = F.when(rx == 1, s - 1 - acc["x"]).otherwise(acc["x"])
        fy = F.when(rx == 1, s - 1 - acc["y"]).otherwise(acc["y"])
        return F.struct(
            F.when(ry == 0, fy).otherwise(acc["x"]).alias("x"),
            F.when(ry == 0, fx).otherwise(acc["y"]).alias("y"),
            d2.cast("long").alias("d"),
        )

    return F.aggregate(levels, init, step).getField("d")


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
