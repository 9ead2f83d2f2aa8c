"""Cast and comparison helpers (SURVEY.md §2.8 F2, F6).

All JVM-side column expressions — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def try_double(col: Column | str) -> Column:
    """Lenient string→double: non-numeric (e.g. FRED "." / BLS "-") → NULL.

    Parity with `pd.to_numeric(errors="coerce")` (reference
    src/transform.py:24,62). Uses try_cast so behavior is identical whether
    or not spark.sql.ansi.enabled is set.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast("double")


def nan_safe_eq(a: Column, b: Column, eps: float = 1e-9) -> Column:
    """Both-NULL → equal; one-NULL → unequal; else |a-b| < eps.

    Parity with the reference's `_nan_equal` (src/load.py:27-35): pandas NaN
    maps to SQL NULL in our engine. Plain eqNullSafe is exact equality; the
    epsilon tolerance is part of the reference's contract, so keep it.
    """
    return (a.isNull() & b.isNull()) | (
        a.isNotNull() & b.isNotNull() & (F.abs(a - b) < F.lit(eps))
    )
