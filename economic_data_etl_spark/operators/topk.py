"""Grouped top-k.

`row_number()` over (group, order) then `<= k`. At scale this is the right
plan: a single shuffle on the group key, no global sort; Spark applies the
rank filter during the window evaluation (WindowGroupLimit pushdown in
Spark 3.5+/4.x), so only k rows per group survive each partition.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def grouped_top_k(
    df: DataFrame,
    partition_by: Sequence[str | Column],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Keep the top k rows per group. `order_by` must be a total order
    (include a tiebreak key) for deterministic output."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )
