"""Streaming trending top-k must equal the batch top-k over the same
input after all micro-batches drain (stream ≡ batch)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from economic_data_etl_spark.operators.topk import grouped_top_k
from economic_data_etl_spark.sources.tables import load_table
from economic_data_etl_spark.streaming.trending import (
    foreach_batch_trending_topk,
    windowed_key_counts,
)
from economic_data_etl_spark.streaming.windows import events_stream

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def stream_dir(spark, tmp_path_factory):
    """Two parquet drops (= two micro-batches) of real event rows."""
    d = tmp_path_factory.mktemp("trend_drops")
    ev = load_table(spark, SF_DIR, "events").orderBy("event_id").limit(400)
    ev.filter(F.col("event_id") < 200).coalesce(1).write.parquet(
        str(d / "drop1")
    )
    ev.filter(F.col("event_id") >= 200).coalesce(1).write.parquet(
        str(d / "drop2")
    )
    src = tmp_path_factory.mktemp("trend_src")
    i = 0
    for sub in sorted(d.iterdir()):
        for f in sorted(sub.glob("*.parquet")):
            f.rename(src / f"drop{i}.parquet")
            i += 1
    return src


def test_trending_topk_matches_batch(spark, stream_dir, tmp_path):
    batch = spark.read.parquet(str(stream_dir))
    stream = events_stream(spark, str(stream_dir), batch.schema)
    counts_path = str(tmp_path / "counts")
    topk_path = str(tmp_path / "topk")
    q = (
        windowed_key_counts(stream)
        .writeStream.outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(
            foreach_batch_trending_topk(counts_path, topk_path, k=3)
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r.window_start, r.event_type, r.n_events, r.rank)
        for r in spark.read.parquet(topk_path).collect()
    }

    batch_counts = (
        batch.withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )
    want = {
        (r.window_start, r.event_type, r.n_events, r.rank)
        for r in grouped_top_k(
            batch_counts,
            partition_by=["window_start"],
            order_by=[F.col("n_events").desc(), F.col("event_type").asc()],
            k=3,
            rank_col="rank",
        ).collect()
    }
    assert got == want
    assert len(got) > 0


def test_incremental_merge_last_write_wins(spark, tmp_path):
    """Feeding the same window twice (count grows across batches) must
    leave the FINAL count, not a sum of emissions."""
    import datetime as dt

    sink = foreach_batch_trending_topk(
        str(tmp_path / "c"), str(tmp_path / "t"), k=2
    )
    w0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    b1 = spark.createDataFrame(
        [(w0, "click", 5), (w0, "view", 3)],
        "window_start timestamp, event_type string, n_events long",
    )
    b2 = spark.createDataFrame(
        [(w0, "view", 9)],
        "window_start timestamp, event_type string, n_events long",
    )
    sink(b1, 0)
    sink(b2, 1)
    rows = {
        (r.event_type, r.n_events, r.rank)
        for r in spark.read.parquet(str(tmp_path / "t")).collect()
    }
    assert rows == {("view", 9, 1), ("click", 5, 2)}


def test_crash_window_recovery_preserves_counts(spark, tmp_path):
    """A crash between rmtree(counts) and rename(staging) leaves the
    only copy of the accumulated counts in the staging dir; the next
    micro-batch must finish the swap instead of treating it as a first
    run and silently resetting every total."""
    import datetime as dt
    import os

    counts = str(tmp_path / "c")
    topk = str(tmp_path / "t")
    sink = foreach_batch_trending_topk(counts, topk, k=2)
    w0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    b1 = spark.createDataFrame(
        [(w0, "click", 5), (w0, "view", 3)],
        "window_start timestamp, event_type string, n_events long",
    )
    sink(b1, 0)
    # simulate the crash window: counts dir gone, data only in staging
    os.rename(counts, counts + ".staging")
    b2 = spark.createDataFrame(
        [(w0, "view", 9)],
        "window_start timestamp, event_type string, n_events long",
    )
    sink(b2, 1)
    rows = {
        (r.event_type, r.n_events, r.rank)
        for r in spark.read.parquet(topk).collect()
    }
    # click's total survived the interrupted swap
    assert rows == {("view", 9, 1), ("click", 5, 2)}
