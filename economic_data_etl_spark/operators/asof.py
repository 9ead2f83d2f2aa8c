"""As-of join (point-in-time join) — an operator Spark lacks natively.

Semantics (matching DuckDB ASOF JOIN / pandas `merge_asof`):

- `backward` (default): for each left row, the most recent right row
  with right.ts <= left.ts within the same key (ties: the right row
  wins, i.e. inclusive).
- `forward`: the earliest right row with right.ts >= left.ts.
- `nearest`: whichever of the two is closer in absolute time;
  equidistant ties prefer the backward match.

Implementation is the union-then-window pattern, NOT a range join:

    union(left tagged 1, right tagged 0)
      → window partitionBy(key) orderBy(ts, tag) rowsBetween(unbounded, 0)
      → last(right payload, ignoreNulls=True)        [backward]
        / first(...) over the mirrored following frame [forward]
      → filter tag = 1

One shuffle on the key, linear scan per partition — O(n log n) for the
sort vs. the O(n·m) worst case of the naive range-join + row_number plan.
`nearest` runs both window passes over the SAME sorted partition (no
extra shuffle) and arbitrates per row. This survives 100 TB: both
inputs partition on the key; skewed keys are split by AQE since the
window sort spills.
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
    direction: str = "backward",
) -> DataFrame:
    """Attach `right_payload` columns (suffixed) of the right row matched
    per `direction` relative to each left row's timestamp, NULL when no
    such row exists."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown asof direction {direction!r}")
    tag = "__asof_is_left"
    ts = "__asof_ts"
    rts = f"__asof_right_ts{suffix}"

    l_cols = [c for c in left.columns]
    lifted = [F.col(c).alias(f"{c}{suffix}") for c in right_payload]
    fill_cols = [f"{c}{suffix}" for c in right_payload] + [rts]

    l_side = left.select(
        F.col(on).alias(on),
        F.col(left_ts).alias(ts),
        F.lit(1).alias(tag),
        F.struct(*l_cols).alias("__asof_left"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"{c}{suffix}")
            for c in right_payload
        ],
        F.lit(None).cast(right.schema[right_ts].dataType).alias(rts),
    )
    r_side = right.select(
        F.col(on).alias(on),
        F.col(right_ts).alias(ts),
        F.lit(0).alias(tag),
        F.lit(None)
        .cast(l_side.schema["__asof_left"].dataType)
        .alias("__asof_left"),
        *lifted,
        F.col(right_ts).alias(rts),
    )
    unioned = l_side.unionByName(r_side)

    # Backward: right (0) sorts before left (1) at equal timestamps so an
    # equal-ts right row falls inside the preceding frame → inclusive.
    # Forward: mirrored — left first at equal ts, following frame.
    w_back = (
        Window.partitionBy(on)
        .orderBy(F.col(ts), F.col(tag))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(on)
        .orderBy(F.col(ts), F.col(tag).desc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )

    def filled(col: str, which: str) -> F.Column:
        if which == "backward":
            return F.last(F.col(col), ignorenulls=True).over(w_back)
        return F.first(F.col(col), ignorenulls=True).over(w_fwd)

    if direction in ("backward", "forward"):
        out = unioned.select(
            "*",
            *[
                filled(c, direction).alias(f"__filled_{c}")
                for c in fill_cols
            ],
        )
        return out.filter(F.col(tag) == 1).select(
            "__asof_left.*",
            *[
                F.col(f"__filled_{c}{suffix}").alias(f"{c}{suffix}")
                for c in right_payload
            ],
        )

    # nearest: both passes over the same sorted data, per-row arbitration.
    both = unioned.select(
        "*",
        *[filled(c, "backward").alias(f"__b_{c}") for c in fill_cols],
        *[filled(c, "forward").alias(f"__f_{c}") for c in fill_cols],
    )
    d_back = F.col(ts) - F.col(f"__b_{rts}")
    d_fwd = F.col(f"__f_{rts}") - F.col(ts)
    use_back = F.col(f"__f_{rts}").isNull() | (
        F.col(f"__b_{rts}").isNotNull() & (d_back <= d_fwd)
    )
    return both.filter(F.col(tag) == 1).select(
        "__asof_left.*",
        *[
            F.when(use_back, F.col(f"__b_{c}{suffix}"))
            .otherwise(F.col(f"__f_{c}{suffix}"))
            .alias(f"{c}{suffix}")
            for c in right_payload
        ],
    )
