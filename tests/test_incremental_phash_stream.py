"""Streaming image dedup must equal the batch banded self-join over
the full corpus regardless of drop order, and the fingerprint index
must accumulate exactly one row per decodable image."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from economic_data_etl_spark.operators.phash import (
    near_dup_pairs_by_phash,
    phash64,
)
from economic_data_etl_spark.streaming.incremental_phash import (
    foreach_batch_incremental_phash,
)

N_IMAGES = 40


def _payload(i: int) -> bytes:
    """PNG payloads from the provably-separated planted universe:
    every 4th image is a JPEG-recompressed copy of the previous one
    (a true near-dup pair that may straddle micro-batches)."""
    from economic_data_etl_spark.operators.codecs import encode_png
    from economic_data_etl_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_gray,
    )
    from economic_data_etl_spark.operators.planted import (
        planted_texture,
    )

    if i % 4 == 3:
        src = planted_texture(i - 1)
        return bytes(encode_png(decode_jpeg(encode_jpeg_gray(src))))
    return bytes(encode_png(planted_texture(i)))


@pytest.fixture()
def img_drops(spark, tmp_path):
    """Three payload file drops (= three micro-batches), with one
    corrupt payload mixed in (must be skipped, not crash)."""
    rows = [(i, bytearray(_payload(i))) for i in range(N_IMAGES)]
    rows.append((999, bytearray(b"\x89PNG\r\n\x1a\nGARBAGE")))
    df = spark.createDataFrame(
        rows, "doc_id long, payload binary"
    ).withColumn("payload", F.col("payload").cast("binary"))
    src = tmp_path / "img_src"
    src.mkdir()
    n = 0
    for lo, hi in ((0, 14), (14, 27), (27, 10**9)):
        d = tmp_path / f"b{lo}"
        df.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        ).coalesce(1).write.parquet(str(d))
        for f in sorted(d.glob("*.parquet")):
            f.rename(src / f"drop{n}.parquet")
            n += 1
    return src


def test_stream_equals_batch_phash(spark, tmp_path, img_drops):
    index_dir = str(tmp_path / "fp_index")
    pairs_dir = str(tmp_path / "pairs")

    stream = (
        spark.readStream.schema("doc_id long, payload binary")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(img_drops))
    )
    q = (
        stream.writeStream.foreachBatch(
            foreach_batch_incremental_phash(index_dir, pairs_dir)
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
    # batch reference: self-join over every decodable image's hash
    hashes = spark.createDataFrame(
        [
            (i, phash64(_decode(_payload(i))))
            for i in range(N_IMAGES)
        ],
        "id long, phash long",
    )
    want = {
        (r["id_a"], r["id_b"])
        for r in near_dup_pairs_by_phash(hashes).collect()
    }
    assert want, "fixture must produce near-dup pairs"
    # the planted copies sit at consecutive ids: at least one pair
    # must straddle a micro-batch boundary (27 % 4 == 3)
    assert (26, 27) in want
    assert got == want

    idx = spark.read.parquet(index_dir)
    assert idx.count() == N_IMAGES  # corrupt payload skipped
    assert idx.select("id").distinct().count() == N_IMAGES


def _decode(payload: bytes) -> "np.ndarray":
    from economic_data_etl_spark.operators.codecs import decode_png

    return decode_png(payload)
