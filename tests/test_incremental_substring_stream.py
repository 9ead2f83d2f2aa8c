"""Streaming substring dedup must equal the global batch pass on the
same document drops (in corpus order), the gram index must accumulate
exactly once per gram, and a redelivered batch must be bit-for-bit
idempotent (the provenance-index contract)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from economic_data_etl_spark.operators import substring
from economic_data_etl_spark.sources.tables import load_table
from economic_data_etl_spark.streaming.incremental_substring import (
    INDEX_SCHEMA,
    foreach_batch_incremental_substring,
)

SF_DIR = "/root/testdata/sf0.001"
K = 8


@pytest.fixture()
def doc_drops(spark, tmp_path):
    """Three document file drops (= three micro-batches) in doc_id
    order — the corpus order the global pass ranks by."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    src = tmp_path / "docs_src"
    src.mkdir()
    i = 0
    for lo, hi in ((0, 150), (150, 300), (300, 10**9)):
        d = tmp_path / f"b{lo}"
        docs.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        ).coalesce(1).write.parquet(str(d))
        for f in sorted(d.glob("*.parquet")):
            f.rename(src / f"drop{i}.parquet")
            i += 1
    return src


def test_stream_equals_global_batch(spark, tmp_path, doc_drops):
    index_dir = str(tmp_path / "gram_index")
    spans_dir = str(tmp_path / "spans")

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(doc_drops))
    )
    q = (
        stream.writeStream.foreachBatch(
            foreach_batch_incremental_substring(
                index_dir, spans_dir, k=K
            )
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        (r.doc_id, r.span_start, r.span_end)
        for r in spark.read.parquet(spans_dir).collect()
    }
    docs = load_table(spark, SF_DIR, "documents")
    want = {
        (r.doc_id, r.span_start, r.span_end)
        for r in substring.duplicate_spans(
            docs, "doc_id", "text", K
        ).collect()
    }
    assert got == want and got  # non-trivial corpus

    # index holds every corpus gram exactly once, with the true
    # corpus-order first occurrence as provenance
    idx = spark.read.schema(INDEX_SCHEMA).parquet(index_dir)
    assert idx.count() == idx.select("gram").distinct().count()
    occ = substring.kgram_occurrences(docs, "doc_id", "text", K)
    firsts = (
        occ.groupBy("gram")
        .agg(
            F.min(
                F.struct(
                    F.col("doc_id").alias("i"), F.col("pos").alias("p")
                )
            ).alias("f")
        )
        .select(
            "gram",
            F.col("f.i").alias("first_id"),
            F.col("f.p").alias("first_pos"),
        )
    )
    assert idx.exceptAll(firsts).isEmpty()
    assert firsts.exceptAll(idx).isEmpty()


def test_redelivered_batch_is_idempotent(spark, tmp_path):
    """Calling the handler twice with the same batch (the foreachBatch
    redelivery case) must append only exact-duplicate span rows and NO
    index rows — the provenance index keeps the batch's own firsts
    first."""
    index_dir = str(tmp_path / "idx")
    spans_dir = str(tmp_path / "spans")
    rows = [
        (1, "p q r s t u p q r s t u"),  # within-doc repeat at k=3
        (2, "p q r s t u extra words here"),  # cross-doc repeat
    ]
    batch = spark.createDataFrame(rows, "doc_id long, text string")
    handle = foreach_batch_incremental_substring(index_dir, spans_dir, k=3)

    handle(batch, 0)
    spans1 = sorted(
        (r.doc_id, r.span_start, r.span_end)
        for r in spark.read.parquet(spans_dir).collect()
    )
    idx1 = sorted(
        (r.gram, r.first_id, r.first_pos)
        for r in spark.read.parquet(index_dir).collect()
    )
    assert spans1  # non-trivial

    handle(batch, 0)  # redelivery
    spans2 = sorted(
        (r.doc_id, r.span_start, r.span_end)
        for r in spark.read.parquet(spans_dir).collect()
    )
    idx2 = sorted(
        (r.gram, r.first_id, r.first_pos)
        for r in spark.read.parquet(index_dir).collect()
    )
    assert spans2 == sorted(spans1 + spans1)  # exact duplicates only
    assert idx2 == idx1  # no index growth on replay


def test_crash_between_appends_converges(spark, tmp_path):
    """Crash window: spans appended, index append never happened. On
    replay the batch's grams are still index-new, so the handler
    recomputes the IDENTICAL spans (appended as exact duplicates) and
    then lands the index rows — state converges to the no-crash
    outcome."""
    from economic_data_etl_spark.operators.substring import (
        merge_spans,
        substring_incremental_dups_prov,
    )

    index_dir = str(tmp_path / "idx")
    spans_dir = str(tmp_path / "spans")
    rows = [
        (1, "p q r s t u p q r s t u"),
        (2, "p q r s t u extra words here"),
    ]
    batch = spark.createDataFrame(rows, "doc_id long, text string")

    # simulate the crash: perform ONLY the spans append of the batch
    empty_index = spark.createDataFrame(
        [], "gram string, first_id long, first_pos long"
    )
    dups, _ = substring_incremental_dups_prov(
        empty_index, batch, "doc_id", "text", 3
    )
    merge_spans(dups, "doc_id", 3).write.mode("append").parquet(spans_dir)
    partial = sorted(
        (r.doc_id, r.span_start, r.span_end)
        for r in spark.read.parquet(spans_dir).collect()
    )
    assert partial and not __import__("os").path.isdir(index_dir)

    # recovery: the stream redelivers the batch through the real handler
    handle = foreach_batch_incremental_substring(index_dir, spans_dir, k=3)
    handle(batch, 0)

    got = sorted(
        (r.doc_id, r.span_start, r.span_end)
        for r in spark.read.parquet(spans_dir).collect()
    )
    assert got == sorted(partial + partial)  # exact duplicates only
    idx = spark.read.parquet(index_dir)
    assert idx.count() == idx.select("gram").distinct().count() > 0
