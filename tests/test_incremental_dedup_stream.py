"""Streaming incremental dedup must equal the batch incremental run on
the same document drops, and the signature index must accumulate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from economic_data_etl_spark.operators import dedup
from economic_data_etl_spark.sources.tables import load_table
from economic_data_etl_spark.streaming.incremental_dedup import (
    foreach_batch_incremental_dedup,
)

SF_DIR = "/root/testdata/sf0.001"
PARAMS = dict(num_perm=32, bands=8, threshold=0.5, shingle_n=3)


@pytest.fixture()
def doc_drops(spark, tmp_path):
    """Three document file drops (= three micro-batches)."""
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


def test_stream_equals_batch_incremental(spark, tmp_path, doc_drops):
    index_dir = str(tmp_path / "sig_index")
    pairs_dir = str(tmp_path / "pairs")

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(doc_drops))
    )
    q = (
        stream.writeStream.foreachBatch(
            foreach_batch_incremental_dedup(index_dir, pairs_dir, **PARAMS)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        (r["id_a"], r["id_b"], r["est_jaccard"])
        for r in spark.read.parquet(pairs_dir).collect()
    }

    # batch replay of the same three increments
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    want: set = set()
    index = None
    for lo, hi in ((0, 150), (150, 300), (300, 10**9)):
        batch = docs.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        )
        if index is None:
            index = spark.createDataFrame(
                [], "doc long, sig array<long>"
            )
        want |= {
            (r["id_a"], r["id_b"], r["est_jaccard"])
            for r in dedup.minhash_incremental_pairs(
                index, batch, "doc_id", "text", **PARAMS
            ).collect()
        }
        index = index.unionByName(
            dedup.minhash_signatures(batch, "doc_id", "text", 32, 3)
        )

    assert got == want
    assert want, "fixture must produce at least one near-dup pair"

    # every doc signed exactly once across the run
    sigs = spark.read.parquet(index_dir)
    assert sigs.count() == docs.count()
    assert sigs.select("doc").distinct().count() == docs.count()

    # and the cumulative pairs equal a full-corpus LSH rebuild
    full = {
        (r["id_a"], r["id_b"], r["est_jaccard"])
        for r in dedup.minhash_dedup_pairs(
            docs, "doc_id", "text", num_perm=32, bands=8, threshold=0.5
        ).collect()
    }
    assert got == full
