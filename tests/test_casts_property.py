"""Property tests for the NTZ-safe timestamp helpers (functions/casts.py).

Spark 4.1 made `TIMESTAMP_NTZ → DOUBLE` casts illegal, so every
timestamp subtraction in the engine routes through ts_diff_seconds /
ts_epoch_seconds. These pin the helpers against Python datetime
arithmetic (the independent oracle) at microsecond precision, including
sub-second parts, negative deltas, and DST-irrelevant NTZ semantics.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql.types import (
    StructField,
    StructType,
    TimestampNTZType,
)

from economic_data_etl_spark.functions.casts import (
    ts_diff_seconds,
    ts_epoch_seconds,
)

_TS = st.datetimes(
    min_value=dt.datetime(1971, 1, 1),
    max_value=dt.datetime(2199, 12, 31),
)

_SCHEMA = StructType(
    [
        StructField("a", TimestampNTZType()),
        StructField("b", TimestampNTZType()),
    ]
)


class TestTsHelpers:
    @given(pairs=st.lists(st.tuples(_TS, _TS), min_size=1, max_size=8))
    @settings(max_examples=12, deadline=None)
    def test_diff_matches_python_datetime(self, spark, pairs):
        df = spark.createDataFrame(pairs, _SCHEMA)
        got = [
            r["d"]
            for r in df.select(
                ts_diff_seconds("a", "b").alias("d")
            ).collect()
        ]
        want = [(b - a).total_seconds() for a, b in pairs]
        for g, w in zip(got, want):
            assert abs(g - w) < 1e-6, (g, w)

    @given(stamps=st.lists(_TS, min_size=1, max_size=8))
    @settings(max_examples=12, deadline=None)
    def test_epoch_matches_python_utc(self, spark, stamps):
        df = spark.createDataFrame(
            [(s, s) for s in stamps], _SCHEMA
        )
        got = [
            r["e"]
            for r in df.select(
                ts_epoch_seconds("a").alias("e")
            ).collect()
        ]
        want = [
            s.replace(tzinfo=dt.timezone.utc).timestamp() for s in stamps
        ]
        for g, w in zip(got, want):
            assert abs(g - w) < 1e-6, (g, w)

    def test_microsecond_exactness(self, spark):
        a = dt.datetime(2024, 1, 1, 0, 0, 0, 1)
        b = dt.datetime(2024, 1, 1, 0, 0, 0, 999999)
        df = spark.createDataFrame([(a, b)], _SCHEMA)
        d = df.select(ts_diff_seconds("a", "b").alias("d")).collect()[0]["d"]
        assert d == 0.999998

    def test_ntz_column_accepted(self, spark, sf_dir):
        from economic_data_etl_spark.sources.tables import load_table

        ev = load_table(spark, sf_dir, "events").limit(10)
        assert dict(ev.dtypes)["ts"] == "timestamp_ntz"
        out = ev.select(
            ts_diff_seconds(F.col("ts"), F.col("ts")).alias("z"),
            ts_epoch_seconds("ts").alias("e"),
        ).collect()
        assert all(r["z"] == 0.0 for r in out)
        assert all(r["e"] > 1.7e9 for r in out)
