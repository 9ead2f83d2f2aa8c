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


def test_crash_at_any_offset_recovers(spark, tmp_path_factory):
    """Property over the WHOLE crash window (round-6 advice): the sink's
    per-batch sequence is stage-write → rmtree(counts) → rename(staging)
    → top-k rewrite. A crash after ANY of those steps, followed by the
    streaming engine's retry of the same micro-batch, must converge to
    the same totals as an uninterrupted run — last-write-wins per
    (window, key) makes the retry idempotent at every offset. The single
    offset pinned by test_crash_window_recovery_preserves_counts is case
    'after_rmtree' here; this covers the other offsets and multi-batch
    sequences."""
    import datetime as dt
    import itertools
    import os
    import shutil

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    w0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    w1 = dt.datetime(2024, 1, 1, 1, 0, 0)
    counter = itertools.count()

    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(data=st.data())
    def run(data):
        base = tmp_path_factory.mktemp(f"trend_crash_{next(counter)}")
        counts, topk = str(base / "c"), str(base / "t")
        staging = counts + ".staging"
        sink = foreach_batch_trending_topk(counts, topk, k=2)
        totals: dict[tuple, int] = {}

        def snapshot(path):
            return path + ".snap" if os.path.exists(path) else None

        n_batches = data.draw(st.integers(2, 4))
        for i in range(n_batches):
            keys = data.draw(
                st.sets(st.sampled_from("abcd"), min_size=1, max_size=3)
            )
            rows = []
            for key in sorted(keys):
                w = data.draw(st.sampled_from([w0, w1]))
                n = data.draw(st.integers(1, 50))
                rows.append((w, key, n))
                totals[(w, key)] = n  # update-mode emissions are totals
            batch = spark.createDataFrame(
                rows,
                "window_start timestamp, event_type string, n_events long",
            )
            crash = data.draw(
                st.sampled_from(
                    ["none", "after_staging", "after_rmtree", "before_topk"]
                )
            )
            # snapshot pre-batch state so each crash offset can be
            # reconstructed exactly from a completed run
            pre_c = pre_t = None
            if crash != "none":
                if os.path.exists(counts):
                    pre_c = counts + ".snap"
                    shutil.copytree(counts, pre_c)
                if os.path.exists(topk):
                    pre_t = topk + ".snap"
                    shutil.copytree(topk, pre_t)
            sink(batch, i)
            if crash != "none":
                # rebuild the exact on-disk state at the crash offset,
                # then retry the batch as the streaming engine would
                if crash == "after_staging":
                    # staging = merged, counts = pre-batch, topk = pre
                    os.rename(counts, staging)
                    if pre_c:
                        shutil.copytree(pre_c, counts)
                elif crash == "after_rmtree":
                    # staging = merged, counts gone, topk = pre
                    os.rename(counts, staging)
                if crash in ("after_staging", "after_rmtree"):
                    shutil.rmtree(topk)
                    if pre_t:
                        shutil.copytree(pre_t, topk)
                elif crash == "before_topk":
                    # counts swapped, top-k rewrite never happened
                    shutil.rmtree(topk)
                    if pre_t:
                        shutil.copytree(pre_t, topk)
                sink(batch, i)  # retry
                for p in (pre_c, pre_t):
                    if p:
                        shutil.rmtree(p)

        got = {
            (r.window_start, r.event_type, r.n_events, r.rank)
            for r in spark.read.parquet(topk).collect()
        }
        want = set()
        for w in (w0, w1):
            ranked = sorted(
                ((k, n) for (ww, k), n in totals.items() if ww == w),
                key=lambda kn: (-kn[1], kn[0]),
            )[:2]
            want |= {
                (w, k, n, rank + 1) for rank, (k, n) in enumerate(ranked)
            }
        assert got == want

    run()
