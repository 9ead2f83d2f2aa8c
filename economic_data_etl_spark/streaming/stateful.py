"""Custom stateful streaming operator via applyInPandasWithState.

The engine's arbitrary-state surface (SURVEY.md §2.10/§2.11): a per-key
running aggregate that survives across micro-batches — the building block
for custom sessionization, dedup-within-stream, or incremental model
features that `groupBy().agg()` can't express.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

RUNNING_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("total_events", LongType(), False),
        StructField("total_value", DoubleType(), False),
    ]
)
RUNNING_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType(), False),
        StructField("total", DoubleType(), False),
    ]
)


def _update_running_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold each micro-batch's rows into (count, sum) state and emit the
    running totals for the key."""
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {
            "user_id": pd.Series([key[0]], dtype="int64"),
            "total_events": pd.Series([n], dtype="int64"),
            "total_value": pd.Series([total], dtype="float64"),
        }
    )


def running_totals_per_user(stream: DataFrame) -> DataFrame:
    """Per-user running (count, sum(value)) maintained in operator state.

    Output mode must be `update`; each micro-batch emits one row per key
    seen in that batch with its cumulative totals.
    """
    return (
        stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_running_totals,
            RUNNING_OUTPUT_SCHEMA,
            RUNNING_STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )
