"""Audio spectral-analysis catalog query (operators/audiofeat.py).

Each doc synthesizes a 4-segment tone sequence (3 frames of 64
samples per segment, frequency = bin 1 + (doc_id + seg) % 31 — always
an integer number of cycles per frame), encodes it through the repo's
own WAV codec, decodes it back, frames it, and detects the dominant
DFT bin per frame. Bin-centered tones concentrate exactly in their
bin (module docstring), so DuckDB reproduces every frame's detected
bin arithmetically from the synthesis rule — codec round-trip,
framing layout, FFT magnitude, and argmax all sit under the
position-weighted value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from economic_data_etl_spark.plans.catalog import register
from economic_data_etl_spark.sources.tables import load_table

_SEGS = 4
_FRAMES_PER_SEG = 3
_FRAME_LEN = 64
_NBINS = 31  # usable bins 1..31 (DC and Nyquist excluded)


@register(
    "multimodal_audio_spectral",
    oracle="""
        WITH seg AS (
            SELECT doc_id, s.s AS seg,
                   1 + (doc_id + s.s) % 31 AS bin
            FROM documents, UNNEST(range(0, 4)) AS s(s)
        ),
        frames AS (
            SELECT doc_id, seg * 3 + f.f AS frame_idx, bin
            FROM seg, UNNEST(range(0, 3)) AS f(f)
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_frames,
               CAST(SUM(bin) AS BIGINT) AS bin_sum,
               CAST(SUM((frame_idx + 1) * bin) AS BIGINT)
                   AS bin_possum
        FROM frames
        GROUP BY doc_id
        ORDER BY doc_id
    """,
    doc="REAL audio spectral analysis certified cross-engine "
    "(operators/audiofeat.py): per-doc 4-segment bin-centered tone "
    "sequences round-trip through the from-scratch WAV codec, then "
    "strided framing + batched rFFT + per-frame dominant-bin argmax. "
    "Bin-centered sinusoids concentrate exactly in one DFT bin "
    "(orthogonality; int16 quantization noise sits ~90 dB down), so "
    "the oracle computes every frame's detected bin from doc_id "
    "alone; the position-weighted checksum makes frame ORDER — hence "
    "the framing layout and segment boundaries — part of the hash.",
)
def multimodal_audio_spectral(
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
    schema = "doc_id long, n_frames long, bin_sum long, bin_possum long"

    def batch(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        from economic_data_etl_spark.operators.audiofeat import (
            bin_centered_tone,
            spectral_features,
        )
        from economic_data_etl_spark.operators.codecs import (
            decode_wav,
            encode_wav,
        )

        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                segs = [
                    bin_centered_tone(
                        1 + (d + s) % _NBINS,
                        _FRAME_LEN,
                        _FRAMES_PER_SEG,
                    )
                    for s in range(_SEGS)
                ]
                samples = np.concatenate(segs)
                _rate, decoded = decode_wav(encode_wav(samples, 8000))
                feats = spectral_features(
                    decoded.ravel(), _FRAME_LEN
                )
                bins = feats["dominant_bin"]
                idx = np.arange(1, len(bins) + 1, dtype=np.int64)
                rows.append(
                    (
                        d,
                        int(len(bins)),
                        int(bins.sum()),
                        int((idx * bins).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_frames", "bin_sum", "bin_possum"],
            )

    return docs.mapInPandas(batch, schema).orderBy("doc_id")
