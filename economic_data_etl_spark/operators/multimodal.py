"""Multimodal column operators: opaque binary payloads + typed metadata.

Design (the 100 TB story): image/audio/video payloads travel as `binary`
columns next to typed metadata, decoded/processed per partition with
Arrow-batched `mapInPandas` — the payload bytes never round-trip through
Python row-by-row, and partition sizing is controlled by
`spark.sql.files.maxPartitionBytes` exactly as for any other column.

The actual codec calls are STUBBED: the image/audio libraries are not in
this container. `decode_media_metadata` derives deterministic fake
dimensions from the payload bytes (so plumbing is testable end-to-end and
oracle-checkable); `decode_image_real` is the clearly-marked
NotImplementedError seam where PIL/ffmpeg would slot in. Everything
Spark-side — schema, batch iteration, UDF signatures, partitioning — is
real.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("byte_len", LongType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("n_frames", IntegerType(), False),
    ]
)


def decode_image_real(payload: bytes) -> dict:
    """The real-codec seam. Plug PIL/libav here when available."""
    raise NotImplementedError(
        "media codecs are not available in this environment; "
        "use decode_media_metadata (deterministic stub) instead"
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int, int]:
    """Deterministic stand-in for a codec: metadata derived purely from
    the byte length, so results are reproducible and SQL-checkable."""
    n = len(payload)
    return n, n % 64 + 16, (n // 64) % 64 + 16, n % 10


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Testdata adapter: materialize an opaque binary column (UTF-8 bytes
    of the text). With real media tables the payload arrives as binary
    from parquet and this step disappears."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def decode_media_metadata(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas decode: per Arrow batch, emit typed metadata per payload.

    This is the real plumbing a codec UDF needs: iterator-of-batches in,
    iterator-of-batches out, no driver involvement, output schema declared
    up front.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [_fake_decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "byte_len": pd.Series([m[0] for m in meta], dtype="int64"),
                    "width": pd.Series([m[1] for m in meta], dtype="int32"),
                    "height": pd.Series([m[2] for m in meta], dtype="int32"),
                    "n_frames": pd.Series([m[3] for m in meta], dtype="int32"),
                }
            )

    return df.select(id_col, "payload").mapInPandas(decode, MEDIA_META_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("resized", BinaryType(), False),
        StructField("orig_bytes", LongType(), False),
        StructField("resized_bytes", LongType(), False),
    ]
)


def resize_media(
    df: DataFrame, factor: int = 4, id_col: str = "doc_id"
) -> DataFrame:
    """Resize/downsample stub: average every `factor` payload bytes into
    one output byte (the real version calls the codec's scaler). Exercises
    the binary→binary mapInPandas shape: payload in, smaller payload out,
    sizes recorded for skew/size accounting downstream."""
    import numpy as np

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out, orig_n, new_n = [], [], []
            for payload in pdf["payload"]:
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                pad = (-len(arr)) % factor
                if pad:
                    arr = np.concatenate([arr, np.zeros(pad, dtype=np.uint8)])
                small = (
                    arr.reshape(-1, factor).mean(axis=1).astype(np.uint8).tobytes()
                )
                out.append(small)
                orig_n.append(len(payload))
                new_n.append(len(small))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "resized": out,
                    "orig_bytes": pd.Series(orig_n, dtype="int64"),
                    "resized_bytes": pd.Series(new_n, dtype="int64"),
                }
            )

    return df.select(id_col, "payload").mapInPandas(resize, RESIZED_SCHEMA)


def extract_features(
    df: DataFrame, dim: int = 16, id_col: str = "doc_id"
) -> DataFrame:
    """Feature-extraction stub: payload bytes → fixed-dim float vector.

    The real version would run an image/audio encoder per Arrow batch;
    the stub derives a deterministic unit-normalized vector from byte
    statistics so downstream ANN search (operators/similarity.py) can be
    exercised end-to-end: decode → embed → index → search.
    """
    import numpy as np
    from pyspark.sql.types import ArrayType, FloatType

    schema = StructType(
        [
            StructField("doc_id", LongType(), False),
            StructField("features", ArrayType(FloatType()), False),
        ]
    )

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                pad = (-len(arr)) % dim
                if pad:
                    arr = np.concatenate([arr, np.zeros(pad, dtype=np.uint8)])
                v = arr.reshape(-1, dim).mean(axis=0).astype(np.float64)
                n = np.linalg.norm(v)
                feats.append((v / n if n else v).astype(np.float32).tolist())
            yield pd.DataFrame(
                {"doc_id": pdf[id_col].astype("int64"), "features": feats}
            )

    return df.select(id_col, "payload").mapInPandas(featurize, schema)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame_bytes", BinaryType(), False),
    ]
)


def sample_frames(
    df: DataFrame, every_n_bytes: int = 64, max_frames: int = 8, id_col: str = "doc_id"
) -> DataFrame:
    """Video-style frame sampling stub: slice the payload into fixed-size
    chunks and keep every chunk up to max_frames — a 1-to-N mapInPandas
    (the decode-explode shape real frame extraction has)."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                chunks = [
                    payload[i : i + every_n_bytes]
                    for i in range(0, len(payload), every_n_bytes)
                ][:max_frames]
                for i, c in enumerate(chunks):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(bytes(c))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_bytes": frames,
                }
            )

    return df.select(id_col, "payload").mapInPandas(sample, FRAME_SCHEMA)


BYTE_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("byte_len", LongType(), False),
        StructField("n_distinct_bytes", IntegerType(), False),
        StructField("entropy", DoubleType(), False),
    ]
)


def byte_entropy_stats(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Per-payload byte histogram stats via mapInArrow — the zero-copy
    lane for binary columns.

    mapInPandas materializes each binary cell as a Python bytes object
    inside a pandas column; mapInArrow hands the raw Arrow buffers
    straight to numpy (`np.frombuffer` is a view, not a copy), which is
    the right default for payload-heavy media tables where the decode
    input dominates the batch. Emits (id, byte_len, n_distinct_bytes,
    shannon entropy in bits/byte) — the standard cheap screen for
    corrupt/compressed/encrypted payloads before real decode."""
    import numpy as np
    import pyarrow as pa

    def stats(batches):
        for batch in batches:
            ids = batch.column(batch.schema.get_field_index(id_col))
            payloads = batch.column(batch.schema.get_field_index(payload_col))
            lens: list[int] = []
            nds: list[int] = []
            ents: list[float] = []
            for buf in payloads:
                a = np.frombuffer(buf.as_py() or b"", dtype=np.uint8)
                if a.size == 0:
                    lens.append(0)
                    nds.append(0)
                    ents.append(0.0)
                    continue
                cnt = np.bincount(a, minlength=256)
                nz = cnt[cnt > 0]
                p = nz / a.size
                lens.append(int(a.size))
                nds.append(int(nz.size))
                ents.append(float(-(p * np.log2(p)).sum()))
            yield pa.RecordBatch.from_arrays(
                [
                    ids.cast(pa.int64()),
                    pa.array(lens, pa.int64()),
                    pa.array(nds, pa.int32()),
                    pa.array(ents, pa.float64()),
                ],
                names=["doc_id", "byte_len", "n_distinct_bytes", "entropy"],
            )

    return df.select(id_col, payload_col).mapInArrow(stats, BYTE_STATS_SCHEMA)
