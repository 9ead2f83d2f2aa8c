"""Streaming crawl ingestion: stream-landed text must equal the batch
extraction of the same archives, redelivery must only add exact
duplicates (convergent under reader dedupe), and a corrupt archive
must fail the batch loudly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from economic_data_etl_spark.operators.html import html_to_text, write_page
from economic_data_etl_spark.operators.warc import write_warc
from economic_data_etl_spark.streaming.crawl_ingest import (
    foreach_batch_crawl_ingest,
    read_landed,
)

DOCS = {
    1: "alpha beta gamma",
    2: "x < y & z",
    3: "",
    4: "repeated words repeated words",
    5: "unicode — ümläut",
    6: "final doc here",
}


def _archive(ids):
    return write_warc(
        [
            (
                f"http://corpus/doc/{i}",
                write_page(f"Doc {i}", [DOCS[i]]).encode("utf-8"),
            )
            for i in ids
        ]
    )


def _want():
    out = {}
    for i, t in DOCS.items():
        page = write_page(f"Doc {i}", [t])
        out[i] = (f"http://corpus/doc/{i}", html_to_text(page))
    return out


def test_stream_equals_batch_and_feeds_downstream(spark, tmp_path, ):
    landed_dir = str(tmp_path / "landed")
    src = tmp_path / "warc_src"
    src.mkdir()
    batches = [_archive([1, 2]), _archive([3, 4]), _archive([5, 6])]
    for i, blob in enumerate(batches):
        spark.createDataFrame(
            [(bytearray(blob),)], "archive binary"
        ).coalesce(1).write.parquet(str(tmp_path / f"b{i}"))
        for f in sorted((tmp_path / f"b{i}").glob("*.parquet")):
            f.rename(src / f"drop{i}.parquet")

    stream = (
        spark.readStream.schema("archive binary")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    q = (
        stream.writeStream.foreachBatch(
            foreach_batch_crawl_ingest(landed_dir)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        r.doc_id: (r.uri, r.text)
        for r in read_landed(spark, landed_dir).collect()
    }
    assert got == _want()
    # the landing table is directly consumable by a downstream index
    # builder (the BM25 standing index here)
    from economic_data_etl_spark.operators.retrieval import build_postings

    postings, doclens = build_postings(read_landed(spark, landed_dir))
    assert doclens.count() == len(DOCS)
    assert postings.filter(F.col("token") == "alpha").count() == 1


def test_redelivery_convergent(spark, tmp_path):
    landed_dir = str(tmp_path / "landed")
    handle = foreach_batch_crawl_ingest(landed_dir)
    batch = spark.createDataFrame(
        [(bytearray(_archive([1, 2])),)], "archive binary"
    )
    handle(batch, 0)
    n1 = spark.read.parquet(landed_dir).count()
    handle(batch, 0)  # redelivery: exact duplicates only
    raw = spark.read.parquet(landed_dir)
    assert raw.count() == 2 * n1
    deduped = read_landed(spark, landed_dir)
    assert deduped.count() == n1
    assert {r.doc_id for r in deduped.collect()} == {1, 2}


def test_corrupt_archive_fails_loudly(spark, tmp_path):
    landed_dir = str(tmp_path / "landed")
    handle = foreach_batch_crawl_ingest(landed_dir)
    bad = spark.createDataFrame(
        [(bytearray(b"HTTP not a warc"),)], "archive binary"
    )
    with pytest.raises(Exception, match="WARC|version|unterminated"):
        handle(bad, 0)
