"""Iterative proportional fitting (raking) over a weighted cell table.

The national-statistics calibration method: alternately scale rows and
columns of a contingency table until its margins match target margins.
Every sweep is a window pass over the cells table (|rows| x |cols|
rows), so iteration count never touches stream-scale data — the margin
and cell aggregations feeding this operator are the only passes over
the raw volume.

Convergence facts the property tests pin: after a COLUMN sweep the
column margins equal their targets exactly (the sweep scales each
column to its target, by construction), total mass equals the total
column-target mass, and weights stay positive when inputs are.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def ipf_rake(cells: DataFrame, iters: int) -> DataFrame:
    """Alternating row/column IPF sweeps, unrolled for determinism.

    `cells` columns: `pri` (row key), `st` (column key), `w` (initial
    cell mass), `rt` (target row margin), `ctg` (target column margin).
    Returns the same rows with `w` replaced by the raked mass. Row and
    column targets should each sum to the same total mass or the sweeps
    oscillate between the two totals (standard IPF behavior)."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1 (got {iters})")
    wp = Window.partitionBy("pri")
    ws = Window.partitionBy("st")
    t = cells
    for _ in range(iters):
        t = t.withColumn(
            "w", F.col("w") * F.col("rt") / F.sum("w").over(wp)
        )
        t = t.withColumn(
            "w", F.col("w") * F.col("ctg") / F.sum("w").over(ws)
        )
    return t
