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


_MC_DOCS = 64
_MC_H = 48
_MC_N = 8


@register(
    "multimodal_video_motion_decode",
    oracle=f"""
        WITH d AS (
          SELECT doc_id FROM documents WHERE doc_id < {_MC_DOCS}
        ), g AS (
          SELECT d.doc_id, t.t, y.y, x.x,
                 ((x.x + y.y + 3 * t.t + d.doc_id) % 16) * 16 AS v
          FROM d
          CROSS JOIN (SELECT unnest(generate_series(0, {_MC_N - 1}))
                      AS t) t
          CROSS JOIN (SELECT unnest(generate_series(0, {_MC_H - 1}))
                      AS y) y
          CROSS JOIN (SELECT unnest(generate_series(0, {_MC_H - 1}))
                      AS x) x
        )
        SELECT doc_id,
               CAST({_MC_N} AS BIGINT) AS n_frames,
               CAST(SUM(v) AS BIGINT) AS pixel_sum,
               CAST(SUM((t + 1) * (y * {_MC_H} + x + 1) * v)
                    AS BIGINT) AS weighted_sum,
               TRUE AS decoded_exact,
               TRUE AS mc_beats_intra
        FROM g GROUP BY doc_id ORDER BY doc_id
    """,
    doc="MOTION-COMPENSATED video decode, certified cross-engine "
    "(operators/mcvideo.py — the engine's own lossless inter-frame "
    "format; the H.26x-bitstream seam in operators/codecs.py is "
    "unchanged and honest): each doc builds a translating diagonal-"
    f"gradient video ({_MC_N} frames, {_MC_H}x{_MC_H}, the pattern "
    "shifts 3 px per frame — NOT block-aligned, so real sub-block "
    "motion search must find the (0,3)-class vectors), encodes it "
    "with one I-frame + 7 P-frames (16x16 block SAD search over "
    "[-4,4]^2 against the reconstructed previous frame, mod-256 "
    "residuals), decodes it back, and verifies (a) bit-exact "
    "losslessness against the regenerated source, (b) the MC stream "
    "is strictly smaller than the same codec forced all-intra — the "
    "compression win motion compensation exists for. The oracle "
    "recomputes per-doc pixel and position-weighted sums from the "
    "planting rule over the full (t, y, x) grid and pins both "
    "verdicts constant TRUE. Arrow mapInPandas lanes, parallel "
    "across docs.",
)
def multimodal_video_motion_decode(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import functions as F

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _MC_DOCS)
        .select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    schema = (
        "doc_id long, n_frames long, pixel_sum long, "
        "weighted_sum long, decoded_exact boolean, "
        "mc_beats_intra boolean"
    )

    def batch(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        from economic_data_etl_spark.operators.mcvideo import (
            decode_mc_avi,
            encode_mc_avi,
        )

        h = _MC_H
        base = np.add.outer(np.arange(h), np.arange(h))
        wgt = (
            np.arange(h)[:, None] * h + np.arange(h)[None, :] + 1
        ).astype(np.int64)
        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                frames = [
                    ((base + 3 * t + d) % 16 * 16).astype(np.uint8)
                    for t in range(_MC_N)
                ]
                blob = encode_mc_avi(frames, gop=_MC_N)
                dec = decode_mc_avi(blob)
                exact = len(dec) == _MC_N and all(
                    np.array_equal(a, b)
                    for a, b in zip(frames, dec)
                )
                intra = encode_mc_avi(frames, gop=1)
                psum = int(
                    sum(f.astype(np.int64).sum() for f in dec)
                )
                wsum = int(
                    sum(
                        (t + 1)
                        * (f.astype(np.int64) * wgt).sum()
                        for t, f in enumerate(dec)
                    )
                )
                rows.append(
                    {
                        "doc_id": d,
                        "n_frames": len(dec),
                        "pixel_sum": psum,
                        "weighted_sum": wsum,
                        "decoded_exact": exact,
                        "mc_beats_intra": len(blob) < len(intra),
                    }
                )
            if rows:
                yield pd.DataFrame(rows)

    return docs.mapInPandas(batch, schema).orderBy("doc_id")
