"""Structured Streaming tests: streaming window aggs must equal their
batch twins on the same input; foreachBatch-upsert must apply revisions."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from economic_data_etl_spark.operators.sessionize import sessionize
from economic_data_etl_spark.sources.tables import load_table
from economic_data_etl_spark.streaming.windows import (
    events_stream,
    foreach_batch_upsert,
    session_window_agg,
    tumbling_window_agg,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def stream_dir(spark, tmp_path_factory):
    """Two parquet file drops (= two micro-batches) of real event rows,
    written with µs timestamps (the raw testdata is TIMESTAMP(NANOS),
    which the streaming parquet source can't read either)."""
    d = tmp_path_factory.mktemp("events_stream")
    ev = load_table(spark, SF_DIR, "events").orderBy("event_id").limit(400)
    ev.filter(F.col("event_id") < 200).coalesce(1).write.parquet(str(d / "drop1"))
    ev.filter(F.col("event_id") >= 200).coalesce(1).write.parquet(str(d / "drop2"))
    # flatten: move part files into one source dir
    src = tmp_path_factory.mktemp("events_src")
    i = 0
    for sub in sorted(d.iterdir()):
        for f in sorted(sub.glob("*.parquet")):
            f.rename(src / f"drop{i}.parquet")
            i += 1
    return src


def _run_to_memory(stream_df, name: str, mode: str, spark):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


class TestStreamingWindows:
    def test_tumbling_matches_batch(self, spark, stream_dir):
        batch = spark.read.parquet(str(stream_dir))
        stream = events_stream(spark, str(stream_dir), batch.schema)
        result = _run_to_memory(
            tumbling_window_agg(stream, group_extra=["event_type"]),
            "t_tumbling",
            "complete",
            spark,
        )
        expected = (
            batch.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
            .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
        )
        got = {(r[0], r[1]): (r[2], round(r[3], 6)) for r in result.collect()}
        want = {(r[0], r[1]): (r[2], round(r[3], 6)) for r in expected.collect()}
        assert got == want

    def test_sliding_matches_batch(self, spark, stream_dir):
        from economic_data_etl_spark.streaming.windows import sliding_window_agg

        batch = spark.read.parquet(str(stream_dir))
        stream = events_stream(spark, str(stream_dir), batch.schema)
        result = _run_to_memory(
            sliding_window_agg(stream), "t_sliding", "complete", spark
        )
        expected = (
            batch.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
            .agg(F.count(F.lit(1)).alias("n_events"), F.avg("value").alias("avg_value"))
            .select(F.col("w.start").alias("window_start"), "n_events", "avg_value")
        )
        got = {r[0]: (r[1], round(r[2], 6)) for r in result.collect()}
        want = {r[0]: (r[1], round(r[2], 6)) for r in expected.collect()}
        assert got == want

    def test_session_window_matches_batch_sessionize(self, spark, stream_dir):
        batch = spark.read.parquet(str(stream_dir))
        stream = events_stream(spark, str(stream_dir), batch.schema)
        result = _run_to_memory(
            session_window_agg(stream), "t_session", "complete", spark
        )
        expected = (
            sessionize(batch, key="user_id", ts="ts", gap="30 minutes")
            .groupBy("user_id", "session_id")
            .agg(
                F.min("ts").alias("session_start"),
                F.count(F.lit(1)).alias("n_events"),
                F.sum("value").alias("session_value"),
            )
        )
        got = {
            (r["user_id"], r["session_start"]): (r["n_events"], round(r["session_value"], 6))
            for r in result.collect()
        }
        want = {
            (r["user_id"], r["session_start"]): (r["n_events"], round(r["session_value"], 6))
            for r in expected.collect()
        }
        assert got == want


class TestStreamingDedup:
    def test_cross_batch_duplicates_suppressed(self, spark, tmp_path):
        """An at-least-once upstream redelivers keys in later
        micro-batches; dropDuplicatesWithinWatermark must emit each key
        once while keeping only watermark-bounded state."""
        from economic_data_etl_spark.streaming.windows import streaming_dedup

        base = datetime.datetime(2025, 6, 1, 12, 0, 0)
        rows = [
            (i, base + datetime.timedelta(minutes=i % 50), float(i))
            for i in range(120)
        ]
        dup_rows = [rows[i] for i in range(40, 80)]  # redelivered keys
        src = tmp_path / "dedup_src"
        src.mkdir()
        schema = "event_id long, ts timestamp, value double"
        spark.createDataFrame(rows[:80], schema).coalesce(1).write.parquet(
            str(tmp_path / "d1")
        )
        spark.createDataFrame(
            rows[80:] + dup_rows, schema
        ).coalesce(1).write.parquet(str(tmp_path / "d2"))
        i = 0
        for sub in ("d1", "d2"):
            for f in sorted((tmp_path / sub).glob("*.parquet")):
                f.rename(src / f"drop{i}.parquet")
                i += 1

        stream = events_stream(spark, str(src), schema)
        result = _run_to_memory(
            streaming_dedup(stream, ["event_id"], watermark="2 hours"),
            "dedup_stream",
            "append",
            spark,
        )
        got = [r["event_id"] for r in result.collect()]
        assert len(got) == 120  # each key exactly once
        assert sorted(got) == list(range(120))


class TestForeachBatchUpsert:
    def test_late_revision_merges(self, spark, tmp_path):
        src = tmp_path / "src"
        src.mkdir()
        target = str(tmp_path / "target")

        schema = "series_id string, date date, value double"
        d = datetime.date(2023, 1, 1)
        spark.createDataFrame([("U", d, 1.0), ("U", datetime.date(2023, 2, 1), 2.0)], schema) \
            .coalesce(1).write.parquet(str(tmp_path / "b1"))
        # late revision of the first key + one new key
        spark.createDataFrame([("U", d, 9.9), ("U", datetime.date(2023, 3, 1), 3.0)], schema) \
            .coalesce(1).write.parquet(str(tmp_path / "b2"))
        i = 0
        for sub in ["b1", "b2"]:
            for f in sorted((tmp_path / sub).glob("*.parquet")):
                f.rename(src / f"drop{i}.parquet")
                i += 1

        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
        )
        q = (
            stream.writeStream.foreachBatch(
                foreach_batch_upsert(target, ["series_id", "date"], ["value"])
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

        final = {r["date"]: r["value"] for r in spark.read.parquet(target).collect()}
        assert final == {
            datetime.date(2023, 1, 1): 9.9,
            datetime.date(2023, 2, 1): 2.0,
            datetime.date(2023, 3, 1): 3.0,
        }

    def test_batch_replay_is_idempotent(self, spark, tmp_path):
        """foreachBatch is AT-LEAST-once: after a crash between sink
        write and checkpoint commit, Spark re-runs the same batch. The
        MERGE sink must absorb that replay — re-applying an already-
        applied batch reports everything unchanged and leaves the
        target byte-identical. This is the property that upgrades the
        pipeline to effectively-exactly-once without a transactional
        sink."""
        from economic_data_etl_spark.operators.upsert import upsert_parquet

        target = str(tmp_path / "target")
        schema = "series_id string, date date, value double"
        batch = spark.createDataFrame(
            [
                ("U", datetime.date(2023, 1, 1), 1.0),
                ("U", datetime.date(2023, 2, 1), 2.0),
            ],
            schema,
        )
        stats1 = upsert_parquet(
            spark, batch, target, ["series_id", "date"], ["value"]
        )
        assert stats1["inserted"] == 2
        before = sorted(map(tuple, spark.read.parquet(target).collect()))
        # simulated post-crash replay of the SAME batch
        stats2 = upsert_parquet(
            spark, batch, target, ["series_id", "date"], ["value"]
        )
        assert stats2 == {"inserted": 0, "updated": 0, "unchanged": 2}
        after = sorted(map(tuple, spark.read.parquet(target).collect()))
        assert before == after
