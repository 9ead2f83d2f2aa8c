"""SCD2: dict-model equivalence, no-op collapsing, and the incremental
merge must equal a full rebuild."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from economic_data_etl_spark.operators.scd2 import (
    scd2_from_events,
    scd2_merge,
)

SCHEMA = "k long, attr string, ts timestamp"


def _ts(i: int) -> datetime.datetime:
    return datetime.datetime(2025, 1, 1) + datetime.timedelta(days=i)


def _model(events):
    """Sequential reference: keep an event iff its attr differs from the
    last kept version of its key; close versions with the next start."""
    by_key: dict[int, list[tuple]] = {}
    for k, attr, ts in sorted(events, key=lambda e: (e[0], e[2])):
        chain = by_key.setdefault(k, [])
        if not chain or chain[-1][0] != attr:
            chain.append((attr, ts))
    rows = set()
    for k, chain in by_key.items():
        for i, (attr, start) in enumerate(chain):
            end = chain[i + 1][1] if i + 1 < len(chain) else None
            rows.add((k, attr, start, end, end is None))
    return rows


class TestScd2:
    def test_matches_sequential_model(self, spark):
        events = [
            (1, "A", _ts(0)), (1, "A", _ts(1)), (1, "B", _ts(2)),
            (1, "B", _ts(3)), (1, "A", _ts(4)),
            (2, "X", _ts(0)),
            (3, None, _ts(0)), (3, None, _ts(1)), (3, "Y", _ts(2)),
        ]
        got = {
            tuple(r)
            for r in scd2_from_events(
                spark.createDataFrame(events, SCHEMA), "k", ["attr"], "ts"
            ).collect()
        }
        assert got == _model(events)

    def test_one_current_row_per_key(self, spark):
        events = [(k, f"v{i % 3}", _ts(i)) for k in (1, 2, 3) for i in range(6)]
        dim = scd2_from_events(
            spark.createDataFrame(events, SCHEMA), "k", ["attr"], "ts"
        )
        per_key = (
            dim.filter("is_current")
            .groupBy("k")
            .count()
            .filter(F.col("count") != 1)
            .count()
        )
        assert per_key == 0

    def test_matches_model_on_random_histories(self, spark):
        """Property check: arbitrary event interleavings (dup timestamps
        excluded — callers pre-resolve those) must match the sequential
        model."""
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        history = st.lists(
            st.tuples(
                st.integers(min_value=1, max_value=3),   # key
                st.sampled_from(["A", "B", None]),       # attr
                st.integers(min_value=0, max_value=9),   # day
            ),
            min_size=1,
            max_size=12,
            unique_by=lambda e: (e[0], e[2]),  # one event per (key, ts)
        )

        @settings(
            max_examples=10,
            deadline=None,
            suppress_health_check=[HealthCheck.function_scoped_fixture],
        )
        @given(history=history)
        def run(history):
            events = [(k, a, _ts(d)) for k, a, d in history]
            got = {
                tuple(r)
                for r in scd2_from_events(
                    spark.createDataFrame(events, SCHEMA), "k", ["attr"], "ts"
                ).collect()
            }
            assert got == _model(events)

        run()

    def test_incremental_merge_equals_full_rebuild(self, spark):
        all_events = [
            (1, "A", _ts(0)), (1, "B", _ts(2)), (1, "C", _ts(5)),
            (2, "X", _ts(1)), (2, "X", _ts(4)),
            (3, "M", _ts(3)),          # key only in batch 1
            (4, "N", _ts(6)),          # key only in batch 2
        ]
        batch1 = [e for e in all_events if e[2] <= _ts(3)]
        batch2 = [e for e in all_events if e[2] > _ts(3)]
        dim1 = scd2_from_events(
            spark.createDataFrame(batch1, SCHEMA), "k", ["attr"], "ts"
        )
        merged = scd2_merge(
            dim1, spark.createDataFrame(batch2, SCHEMA), "k", ["attr"], "ts"
        )
        full = scd2_from_events(
            spark.createDataFrame(all_events, SCHEMA), "k", ["attr"], "ts"
        )
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, full.collect())
        )
