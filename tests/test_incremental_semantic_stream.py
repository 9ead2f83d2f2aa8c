"""Streaming semantic dedup must equal the batch operator on the full
corpus (same frozen centroids), and the assignment index must accumulate
exactly p rows per vector."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from economic_data_etl_spark.operators.semantic import (
    seed_centroids,
    semantic_near_dup_pairs,
)
from economic_data_etl_spark.sources.tables import load_table
from economic_data_etl_spark.streaming.incremental_semantic import (
    foreach_batch_incremental_semantic,
)

SF_DIR = "/root/testdata/sf0.001"
TAU = 0.4
PROBES = 3
K = 8


@pytest.fixture()
def vec_drops(spark, tmp_path):
    """Three embedding file drops (= three micro-batches)."""
    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding"
    )
    src = tmp_path / "vec_src"
    src.mkdir()
    i = 0
    for lo, hi in ((0, 150), (150, 300), (300, 10**9)):
        d = tmp_path / f"b{lo}"
        emb.filter(
            (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
        ).coalesce(1).write.parquet(str(d))
        for f in sorted(d.glob("*.parquet")):
            f.rename(src / f"drop{i}.parquet")
            i += 1
    return src


def test_stream_equals_batch_semantic(spark, tmp_path, vec_drops):
    emb = load_table(spark, SF_DIR, "embeddings")
    cents = seed_centroids(emb, K)

    index_dir = str(tmp_path / "assign_index")
    pairs_dir = str(tmp_path / "pairs")

    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(vec_drops))
    )
    q = (
        stream.writeStream.foreachBatch(
            foreach_batch_incremental_semantic(
                index_dir, pairs_dir, cents, TAU, PROBES
            )
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        (r["id_a"], r["id_b"])
        for r in spark.read.parquet(pairs_dir).collect()
    }
    want = {
        (r["id_a"], r["id_b"])
        for r in semantic_near_dup_pairs(
            emb, cents, TAU, probes=PROBES
        ).collect()
    }
    assert want, "fixture must produce at least one near-dup pair"
    assert got == want

    # index holds exactly `probes` assignment rows per vector, once each
    idx = spark.read.parquet(index_dir)
    n = emb.count()
    assert idx.count() == n * PROBES
    assert idx.select("vec_id").distinct().count() == n
    per_vec = idx.groupBy("vec_id").count().agg(
        F.min("count").alias("lo"), F.max("count").alias("hi")
    ).collect()[0]
    assert per_vec["lo"] == PROBES and per_vec["hi"] == PROBES
