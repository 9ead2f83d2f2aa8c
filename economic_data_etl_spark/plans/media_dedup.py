"""Video and audio near-duplicate catalog queries — compositions of
the driver-green media primitives into the corpus-dedup shapes a
100 TB multimodal pipeline needs.

Video: sampled keyframes (the selective AVI decode whose cost is
proportional to frames KEPT) -> pHash per keyframe -> banded
majority-of-aligned-keyframes join (operators/phash.py:
near_dup_videos_by_phash). Audio: framed rFFT dominant bins per
segment -> landmark (anchor, target) token pairs -> shared-token join
(operators/audiofp.py) — the Shazam-style constellation shape.

Both queries plant their ground truth with PROVABLE separation:
- video keyframes come from the BCH-coded texture universe
  (operators/planted.py): any two planted frame indices sit at pHash
  hamming >= 14, so cross-video keyframe matches are impossible by
  the code's minimum distance — at any corpus size up to the
  certified bound (frame indices = 10*doc_id + offset < 2^16, i.e.
  corpora up to 6553 docs; every driver SF fits).
- audio segment-bin sequences are CUBIC polynomials over GF(29): two
  distinct cubics agree on at most 3 of the 8 segment points, hence
  share at most 2 of the 7 adjacent landmark tokens — below the
  match threshold 4 by construction, while re-encoded twins share
  all 7 (G.711 companding preserves the dominant bin of a
  bin-centered tone; pinned in tests/test_media_dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from economic_data_etl_spark.plans.catalog import register
from economic_data_etl_spark.sources.tables import load_table

_TWIN_OFFSET = 1 << 40
_STRIDE = 10  # planted-texture indices per doc: 0-4 orig, 5-9 decoy


def _planted_partner_outcome(
    docs: DataFrame, pairs_touching: DataFrame, kind_expr
) -> DataFrame:
    """Shared outcome shape: per planted doc, how many near-dup
    partners its original and its twin found."""
    touch = pairs_touching.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_partners")
    )
    planted = docs.where(
        (F.col("doc_id") % 3 == 0) | (F.col("doc_id") % 7 == 0)
    ).select("doc_id", kind_expr.alias("planted_kind"))
    return (
        planted.join(
            touch.withColumnRenamed("id", "doc_id").withColumnRenamed(
                "n_partners", "po"
            ),
            "doc_id",
            "left",
        )
        .join(
            touch.select(
                (F.col("id") - F.lit(_TWIN_OFFSET)).alias("doc_id"),
                F.col("n_partners").alias("pt"),
            ),
            "doc_id",
            "left",
        )
        .select(
            "doc_id",
            "planted_kind",
            F.coalesce(F.col("po"), F.lit(0))
            .cast("long")
            .alias("partners_orig"),
            F.coalesce(F.col("pt"), F.lit(0))
            .cast("long")
            .alias("partners_twin"),
        )
        .orderBy("doc_id")
    )


_OUTCOME_ORACLE = """
    SELECT doc_id,
           CASE WHEN doc_id %% 3 = 0 THEN '%s' ELSE 'noise' END
               AS planted_kind,
           CAST(CASE WHEN doc_id %% 3 = 0 THEN 1 ELSE 0 END
                AS BIGINT) AS partners_orig,
           CAST(CASE WHEN doc_id %% 3 = 0 THEN 1 ELSE 0 END
                AS BIGINT) AS partners_twin
    FROM documents
    WHERE doc_id %% 3 = 0 OR doc_id %% 7 = 0
    ORDER BY doc_id
"""


@register(
    "multimodal_video_near_dup",
    oracle=_OUTCOME_ORACLE % "reenc",
    doc="Video near-duplicate detection by composing pHash over "
    "sampled keyframes (operators/phash.py:near_dup_videos_by_phash "
    "over codecs.decode_mjpeg_avi_sampled): per-doc MJPEG AVIs of "
    "3-5 BCH-coded planted frames; docs divisible by 3 get a fully "
    "RE-ENCODED twin video (decode every frame, re-encode the "
    "container through the from-scratch JPEG codec — the transcoded-"
    "copy case), other docs divisible by 7 get an unrelated decoy "
    "video. Keyframes (every 2nd frame, selective decode) are "
    "pHashed and videos match when a majority of aligned keyframes "
    "fall within hamming 7. Cross-video keyframe matches are "
    "IMPOSSIBLE by the planted code's minimum distance (>= 14), so "
    "the oracle outcome is exact at any corpus size up to the "
    "certified 6553-doc bound. A keyframe slip, a hash drift, or a "
    "majority-count bug flips the value hash.",
)
def multimodal_video_near_dup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from collections.abc import Iterator

    import pandas as pd

    from economic_data_etl_spark.operators.phash import (
        near_dup_videos_by_phash,
        phash64,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )

    def hash_batch(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        from economic_data_etl_spark.operators.codecs import (
            decode_mjpeg_avi,
            decode_mjpeg_avi_sampled,
            encode_mjpeg_avi,
        )
        from economic_data_etl_spark.operators.planted import (
            planted_texture,
        )

        def keyframe_rows(vid: int, payload: bytes) -> list[tuple]:
            return [
                (vid, idx, phash64(frame))
                for idx, frame in decode_mjpeg_avi_sampled(
                    payload, every_n=2
                )
            ]

        for pdf in batches:
            rows: list[tuple] = []
            for d in pdf["doc_id"]:
                d = int(d)
                n_frames = 3 + d % 3
                orig = encode_mjpeg_avi(
                    [
                        planted_texture(_STRIDE * d + i)
                        for i in range(n_frames)
                    ]
                )
                rows += keyframe_rows(d, orig)
                if d % 3 == 0:  # transcoded twin: full re-encode
                    twin = encode_mjpeg_avi(decode_mjpeg_avi(orig))
                    rows += keyframe_rows(d + _TWIN_OFFSET, twin)
                elif d % 7 == 0:  # decoy: unrelated planted video
                    decoy = encode_mjpeg_avi(
                        [
                            planted_texture(_STRIDE * d + 5 + i)
                            for i in range(n_frames)
                        ]
                    )
                    rows += keyframe_rows(d + _TWIN_OFFSET, decoy)
            yield pd.DataFrame(
                rows, columns=["video_id", "frame_idx", "phash"]
            )

    keyframes = docs.mapInPandas(
        hash_batch, "video_id long, frame_idx long, phash long"
    )
    # Materialize the fingerprint table ONCE: the banded self-join,
    # the per-video counts, and the outcome assembly all scan it, and
    # without a checkpoint each scan re-runs the full video decode
    # (measured 8 MapInPandas executions in the plan, ~21 s at sf0.1).
    # The hash table is tiny (3 longs per keyframe) next to the media
    # bytes — decode-once-then-join is THE scale shape for media dedup.
    keyframes = keyframes.localCheckpoint(eager=True)
    pairs = near_dup_videos_by_phash(keyframes)
    touching = pairs.select(
        F.explode(F.array("id_a", "id_b")).alias("id")
    )
    return _planted_partner_outcome(
        docs,
        touching,
        F.when(F.col("doc_id") % 3 == 0, F.lit("reenc")).otherwise(
            F.lit("noise")
        ),
    )


@register(
    "multimodal_audio_near_dup",
    oracle=_OUTCOME_ORACLE % "g711",
    doc="Audio near-duplicate fingerprinting (operators/audiofp.py): "
    "per-doc signals of 8 bin-centered tone segments whose bin "
    "sequence is a CUBIC polynomial over GF(29) — distinct docs "
    "share at most 2 of the 7 adjacent (anchor, target) landmark "
    "tokens, below the match threshold 4, so chance pairs are "
    "impossible by polynomial interpolation at any corpus size up "
    "to the certified 353640-doc bound. Docs divisible by 3 get a "
    "twin RE-ENCODED through the repo's own lossy audio codecs "
    "(cycling mu-law / A-law / IMA ADPCM — companding and adaptive "
    "prediction both preserve each segment's dominant bin, so twins "
    "share all 7 tokens); other docs divisible by 7 get an unrelated "
    "decoy signal. The shared-token join is candidates-only (token "
    "equality), never all-pairs.",
)
def multimodal_audio_near_dup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from collections.abc import Iterator

    import pandas as pd

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )

    def token_batch(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        from economic_data_etl_spark.operators.audiofp import (
            fingerprint_tokens,
            planted_tone_signal,
        )
        from economic_data_etl_spark.operators.codecs import (
            decode_wav,
            encode_wav_adpcm,
            encode_wav_g711,
        )

        def rows_for(aid: int, samples) -> list[tuple]:
            return [
                (aid, int(t)) for t in fingerprint_tokens(samples)
            ]

        for pdf in batches:
            rows: list[tuple] = []
            for d in pdf["doc_id"]:
                d = int(d)
                orig = planted_tone_signal(2 * d)
                rows += rows_for(d, orig)
                if d % 3 == 0:  # twin: lossy re-encode round-trip,
                    # cycling all three audio codecs so every
                    # companding/prediction path sits under the hash
                    v = (d // 3) % 3
                    if v == 2:
                        enc = encode_wav_adpcm(orig, 8000)
                    else:
                        enc = encode_wav_g711(
                            orig, 8000,
                            law="mulaw" if v == 0 else "alaw",
                        )
                    _, dec = decode_wav(enc)
                    rows += rows_for(d + _TWIN_OFFSET, dec[:, 0])
                elif d % 7 == 0:  # decoy: unrelated planted signal
                    rows += rows_for(
                        d + _TWIN_OFFSET,
                        planted_tone_signal(2 * d + 1),
                    )
            yield pd.DataFrame(rows, columns=["audio_id", "token"])

    tokens = docs.mapInPandas(token_batch, "audio_id long, token long")
    # decode/FFT once — same multi-scan materialization as the video
    # query (the token table is 2 longs per landmark)
    tokens = tokens.localCheckpoint(eager=True)
    from economic_data_etl_spark.operators.audiofp import (
        near_dup_audio_by_tokens,
    )

    pairs = near_dup_audio_by_tokens(tokens)
    touching = pairs.select(
        F.explode(F.array("id_a", "id_b")).alias("id")
    )
    return _planted_partner_outcome(
        docs,
        touching,
        F.when(F.col("doc_id") % 3 == 0, F.lit("g711")).otherwise(
            F.lit("noise")
        ),
    )
