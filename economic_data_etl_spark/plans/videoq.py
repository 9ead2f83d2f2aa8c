"""Video scene-cut detection catalog query (operators/videofeat.py).

Each doc builds a real MJPEG AVI of 2-4 static shots (2 frames per
shot; every frame inside a shot is the identical deterministic
pattern, shots switch patterns with a +101 intensity rotation whose
decoded mean-absolute difference is far above threshold), decodes it
through the from-scratch container+JPEG path, and segments it with
the frame-differencing detector. JPEG is lossy but deterministic, so
within-shot MAD is exactly zero and the detected cut indices are the
planted ones — DuckDB reconstructs the cut list's count and
position-weighted sum from the planting rule alone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from economic_data_etl_spark.plans.catalog import register
from economic_data_etl_spark.sources.tables import load_table

_FPS = 2  # frames per shot


@register(
    "multimodal_video_scene_cuts",
    oracle="""
        SELECT doc_id,
               CAST(2 * (2 + doc_id % 3) AS BIGINT) AS n_frames,
               CAST(1 + doc_id % 3 AS BIGINT) AS n_cuts,
               -- cuts sit at frame 2*s for s = 1..ns-1:
               -- sum = 2 * ns*(ns-1)/2 = ns*(ns-1)
               CAST((2 + doc_id % 3) * (1 + doc_id % 3) AS BIGINT)
                   AS cut_possum
        FROM documents
        ORDER BY doc_id
    """,
    doc="REAL video temporal analysis certified cross-engine "
    "(operators/videofeat.py): per-doc MJPEG AVI videos of 2-4 "
    "planted static shots decode through the from-scratch RIFF walk "
    "+ JPEG codec, then adjacent-frame mean-absolute-difference "
    "scene-cut detection. Within a shot MAD is exactly 0 (identical "
    "frames decode identically — JPEG is deterministic), across "
    "shots it is ~100 intensity levels, so the detected cut index "
    "list equals the planting rule and DuckDB reproduces its count "
    "and position-weighted sum from doc_id. A decoder frame slip, a "
    "differencing off-by-one, or a threshold regression flips the "
    "hash.",
)
def multimodal_video_scene_cuts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    schema = "doc_id long, n_frames long, n_cuts long, cut_possum long"

    def batch(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        from economic_data_etl_spark.operators.codecs import (
            decode_mjpeg_avi,
            encode_mjpeg_avi,
        )
        from economic_data_etl_spark.operators.jpeg import (
            block_constant_pattern,
        )
        from economic_data_etl_spark.operators.videofeat import (
            scene_cuts,
        )

        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = 16 + d % 32, 16 + (d // 32) % 32
                ns = 2 + d % 3
                frames = []
                for s in range(ns):
                    shot = block_constant_pattern(d + 101 * s, w, h)
                    frames.extend([shot] * _FPS)
                decoded = decode_mjpeg_avi(encode_mjpeg_avi(frames))
                cuts = scene_cuts(decoded, threshold=16.0)
                rows.append(
                    (
                        d,
                        len(decoded),
                        len(cuts),
                        int(np.sum(cuts, dtype=np.int64)),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_frames", "n_cuts", "cut_possum"],
            )

    return docs.mapInPandas(batch, schema).orderBy("doc_id")
