"""Spark 4 `transformWithStateInPandas` surface (StatefulProcessor API).

This is the successor to `applyInPandasWithState` (see stateful.py for
that surface): typed state primitives (ValueState / ListState / MapState)
with optional TTL and timers, instead of one opaque state tuple. The
operator here maintains a per-user top-k of event values across
micro-batches in a ListState — a shape `groupBy().agg()` cannot express
incrementally (it would re-aggregate all history) and the building block
for streaming leaderboards / best-example mining over a training stream.

Batch/stream equivalence is proven in tests/test_transform_state.py: the
final emitted row per user equals a batch top-k over the same input.

Runtime dependency: PySpark's transformWithState driver worker speaks a
protobuf protocol to the JVM state server, so `google.protobuf` must be
installed (it is a standard PySpark extra, but absent from some minimal
images). `protobuf_available()` gates the tests; the operator raises a
clear error instead of a worker crash when the dependency is missing.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

OUTPUT_SCHEMA = "user_id long, n_seen long, top_values array<double>"


def protobuf_available() -> bool:
    """transformWithState needs google.protobuf in the Python workers."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


class TopKValuesProcessor(StatefulProcessor):
    """Keeps the k largest `value`s per key; emits (key, n_seen, top_k)
    after every batch that touches the key. State is exactly k doubles +
    a counter — bounded regardless of stream length."""

    def __init__(self, k: int = 3):
        self._k = k

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._top = handle.getListState("top_values", "value double")
        self._seen = handle.getValueState("n_seen", "n long")

    def handleInputRows(
        self, key, rows, timer_values
    ) -> Iterator[pd.DataFrame]:
        current = [t[0] for t in self._top.get()] if self._top.exists() else []
        n = self._seen.get()[0] if self._seen.exists() else 0
        for pdf in rows:
            vals = pdf["value"].tolist()
            n += len(vals)
            current.extend(float(v) for v in vals)
        best = sorted(current, reverse=True)[: self._k]
        self._top.put([(v,) for v in best])
        self._seen.update((n,))
        yield pd.DataFrame(
            {
                "user_id": pd.Series([key[0]], dtype="int64"),
                "n_seen": pd.Series([n], dtype="int64"),
                "top_values": [best],
            }
        )

    def close(self) -> None:
        pass


def running_topk_per_user(stream: DataFrame, k: int = 3) -> DataFrame:
    """Per-user streaming top-k of `value` via the StatefulProcessor API
    (update output mode; the latest row per user is the current top-k)."""
    if not protobuf_available():
        raise ImportError(
            "transformWithStateInPandas requires google.protobuf in the "
            "Python environment (pip install protobuf); without it the "
            "streaming Python worker crashes at state-schema validation. "
            "Use streaming/stateful.py:running_totals_per_user "
            "(applyInPandasWithState) as the protobuf-free alternative."
        )
    return (
        stream.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            TopKValuesProcessor(k),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
