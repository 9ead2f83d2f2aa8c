"""Streaming crawl frontier: stream == batch over any file-drop split,
redelivery appends nothing, and the frontier-written/index-missed crash
window converges (streaming/crawl_frontier.py)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from economic_data_etl_spark.operators.urls import canonical_url
from economic_data_etl_spark.streaming.crawl_frontier import (
    INDEX_SCHEMA,
    foreach_batch_crawl_frontier,
)

# Messy URLs: ids 0-5 and 100-105 alias each other pairwise (same page
# mod 3), later drops repeat earlier pages under new spellings.
ROWS = [
    (i, f"HTTP://WWW.Site{i % 3}.COM:80//p//{i % 4}/?utm_s=x&b=2&a=1#f")
    for i in range(12)
]


def _expected_frontier(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, url string")
    return {
        (r["canonical"], r["first_doc"])
        for r in df.select(
            canonical_url(F.col("url")).alias("canonical"), "doc_id"
        )
        .groupBy("canonical")
        .agg(F.min("doc_id").alias("first_doc"))
        .collect()
    }


@pytest.mark.parametrize("split", [1, 4, 6, 11])
def test_stream_equals_batch_any_split(spark, tmp_path, split):
    """Two micro-batches cut at any offset produce exactly the global
    first-occurrence frontier."""
    index_dir = str(tmp_path / "idx")
    frontier_dir = str(tmp_path / "frontier")
    handle = foreach_batch_crawl_frontier(index_dir, frontier_dir)
    b1 = spark.createDataFrame(ROWS[:split], "doc_id long, url string")
    b2 = spark.createDataFrame(ROWS[split:], "doc_id long, url string")
    handle(b1, 0)
    handle(b2, 1)
    got = {
        (r.canonical, r.first_doc)
        for r in spark.read.parquet(frontier_dir).collect()
    }
    assert got == _expected_frontier(spark) and got


def test_stream_via_structured_streaming(spark, tmp_path):
    """End-to-end through readStream/writeStream file drops."""
    src = tmp_path / "src"
    src.mkdir()
    df = spark.createDataFrame(ROWS, "doc_id long, url string")
    for i, (lo, hi) in enumerate(((0, 5), (5, 9), (9, 12))):
        d = tmp_path / f"b{i}"
        df.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        ).coalesce(1).write.parquet(str(d))
        for j, f in enumerate(sorted(d.glob("*.parquet"))):
            f.rename(src / f"drop{i}_{j}.parquet")
    index_dir = str(tmp_path / "idx")
    frontier_dir = str(tmp_path / "frontier")
    stream = (
        spark.readStream.schema("doc_id long, url string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    q = (
        stream.writeStream.foreachBatch(
            foreach_batch_crawl_frontier(index_dir, frontier_dir)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.canonical, r.first_doc)
        for r in spark.read.parquet(frontier_dir).collect()
    }
    assert got == _expected_frontier(spark)
    # seen-index holds each canonical exactly once
    idx = spark.read.schema(INDEX_SCHEMA).parquet(index_dir)
    assert idx.count() == idx.select("canonical").distinct().count() > 0


def test_redelivered_batch_appends_nothing(spark, tmp_path):
    index_dir = str(tmp_path / "idx")
    frontier_dir = str(tmp_path / "frontier")
    handle = foreach_batch_crawl_frontier(index_dir, frontier_dir)
    batch = spark.createDataFrame(ROWS[:6], "doc_id long, url string")
    handle(batch, 0)
    first = sorted(
        (r.canonical, r.first_doc)
        for r in spark.read.parquet(frontier_dir).collect()
    )
    assert first
    handle(batch, 0)  # redelivery: canonicals already indexed
    again = sorted(
        (r.canonical, r.first_doc)
        for r in spark.read.parquet(frontier_dir).collect()
    )
    assert again == first  # zero new frontier rows
    idx = spark.read.parquet(index_dir)
    assert idx.count() == idx.select("canonical").distinct().count()


def test_crash_between_appends_converges(spark, tmp_path):
    """Kill window: frontier rows appended, index append never ran. On
    replay the canonicals are still index-new, so the handler re-emits
    the IDENTICAL rows (exact duplicates — readers dedupe by canonical)
    and lands the index; state converges to the no-crash outcome."""
    index_dir = str(tmp_path / "idx")
    frontier_dir = str(tmp_path / "frontier")
    batch = spark.createDataFrame(ROWS[:6], "doc_id long, url string")

    # simulate the crash: ONLY the frontier append happens
    firsts = (
        batch.select(
            canonical_url(F.col("url")).alias("canonical"),
            F.col("doc_id").alias("first_doc"),
        )
        .groupBy("canonical")
        .agg(F.min("first_doc").alias("first_doc"))
    )
    firsts.select("canonical", "first_doc").write.mode("append").parquet(
        frontier_dir
    )
    partial = sorted(
        (r.canonical, r.first_doc)
        for r in spark.read.parquet(frontier_dir).collect()
    )
    assert partial and not os.path.isdir(index_dir)

    # recovery: the stream redelivers the batch through the real handler
    handle = foreach_batch_crawl_frontier(index_dir, frontier_dir)
    handle(batch, 0)
    got = sorted(
        (r.canonical, r.first_doc)
        for r in spark.read.parquet(frontier_dir).collect()
    )
    assert got == sorted(partial + partial)  # exact duplicates only
    idx = spark.read.parquet(index_dir)
    assert idx.count() == idx.select("canonical").distinct().count() > 0
    # deduped frontier == the no-crash answer
    assert set(got) == {
        (r.canonical, r.first_doc) for r in firsts.collect()
    }
