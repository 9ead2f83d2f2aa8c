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
