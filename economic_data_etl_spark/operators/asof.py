"""As-of join (point-in-time join) — an operator Spark lacks natively.

Semantics: for each left row, attach the most recent right row with
right.ts <= left.ts within the same key (ties: the right row wins, i.e.
inclusive, matching DuckDB/pandas `merge_asof` defaults).

Implementation is the union-then-window pattern, NOT a range join:

    union(left tagged 1, right tagged 0)
      → window partitionBy(key) orderBy(ts, tag) rowsBetween(unbounded, 0)
      → last(right payload, ignoreNulls=True)
      → filter tag = 1

One shuffle on the key, linear scan per partition — O(n log n) for the
sort vs. the O(n·m) worst case of the naive range-join + row_number plan.
This survives 100 TB: both inputs partition on the key; skewed keys are
split by AQE since the window sort spills.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Attach `right_payload` columns (suffixed) of the latest right row at
    or before each left row's timestamp, NULL when none exists."""
    tag = "__asof_is_left"
    ts = "__asof_ts"

    l_cols = [c for c in left.columns]
    lifted = [F.col(c).alias(f"{c}{suffix}") for c in right_payload]

    l_side = left.select(
        F.col(on).alias(on),
        F.col(left_ts).alias(ts),
        F.lit(1).alias(tag),
        F.struct(*l_cols).alias("__asof_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{c}{suffix}") for c in right_payload],
    )
    r_side = right.select(
        F.col(on).alias(on),
        F.col(right_ts).alias(ts),
        F.lit(0).alias(tag),
        F.lit(None).cast(l_side.schema["__asof_left"].dataType).alias("__asof_left"),
        *lifted,
    )

    # tag orders right (0) before left (1) at equal timestamps → inclusive.
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts), F.col(tag))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = l_side.unionByName(r_side)
    filled = unioned.select(
        "*",
        *[
            F.last(F.col(f"{c}{suffix}"), ignorenulls=True)
            .over(w)
            .alias(f"__filled_{c}")
            for c in right_payload
        ],
    )
    return (
        filled.filter(F.col(tag) == 1)
        .select(
            "__asof_left.*",
            *[F.col(f"__filled_{c}").alias(f"{c}{suffix}") for c in right_payload],
        )
    )
