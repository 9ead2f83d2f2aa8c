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
      → last(right ROW STRUCT, ignoreNulls=True)        [backward]
        / first(...) over the mirrored following frame   [forward]
      → filter tag = 1

The matched right row travels as ONE struct column (null only on
left-tagged rows), so a right row whose payload value is genuinely NULL
is still the row that wins — filling payload columns independently
would skip it and resurrect a stale earlier match, diverging from
merge_asof/ASOF JOIN semantics.

One shuffle on the key, linear scan per partition — O(n log n) for the
sort vs. the O(n·m) worst case of the naive range-join + row_number plan.
`nearest` runs both window passes over the SAME sorted partition (no
extra shuffle) and arbitrates per row on the struct's matched
timestamp. This survives 100 TB: both inputs partition on the key, and
a hot key costs one LINEAR sorted scan on its single task — the frames
are running frames (streaming accumulator in WindowExec, no per-row
frame re-scan) and the sort is UnsafeExternalSorter (disk spill, no
OOM). AQE's skew split applies to sort-merge joins, not windows; the
union-then-window shape IS the skew mitigation versus a range join's
O(hot²) explosion (hot-key behavior pinned in tests/test_skew_events.py).
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
    rrow = "__asof_right"
    rts = "__rts"

    l_cols = [c for c in left.columns]

    r_side = right.select(
        F.col(on).alias(on),
        F.col(right_ts).alias(ts),
        F.lit(0).alias(tag),
        F.struct(
            F.col(right_ts).alias(rts),
            *[F.col(c).alias(c) for c in right_payload],
        ).alias(rrow),
    )
    l_side = left.select(
        F.col(on).alias(on),
        F.col(left_ts).alias(ts),
        F.lit(1).alias(tag),
        F.lit(None).cast(r_side.schema[rrow].dataType).alias(rrow),
        F.struct(*[F.col(c) for c in l_cols]).alias("__asof_left"),
    )
    # unionByName(allowMissingColumns) nulls __asof_left on right rows.
    unioned = l_side.unionByName(r_side, allowMissingColumns=True)

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
    fill_back = F.last(F.col(rrow), ignorenulls=True).over(w_back)
    fill_fwd = F.first(F.col(rrow), ignorenulls=True).over(w_fwd)

    if direction == "backward":
        chosen = fill_back
        out = unioned.select("*", chosen.alias("__chosen"))
    elif direction == "forward":
        chosen = fill_fwd
        out = unioned.select("*", chosen.alias("__chosen"))
    else:
        # nearest: both passes over the same sorted data, per-row
        # arbitration on the matched timestamps inside the structs.
        out = unioned.select(
            "*", fill_back.alias("__b"), fill_fwd.alias("__f")
        )
        d_back = F.col(ts) - F.col(f"__b.{rts}")
        d_fwd = F.col(f"__f.{rts}") - F.col(ts)
        use_back = F.col(f"__f.{rts}").isNull() | (
            F.col(f"__b.{rts}").isNotNull() & (d_back <= d_fwd)
        )
        out = out.select(
            "*",
            F.when(use_back, F.col("__b"))
            .otherwise(F.col("__f"))
            .alias("__chosen"),
        )

    return out.filter(F.col(tag) == 1).select(
        "__asof_left.*",
        *[
            F.col(f"__chosen.{c}").alias(f"{c}{suffix}")
            for c in right_payload
        ],
    )
