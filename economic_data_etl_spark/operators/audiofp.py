"""Audio near-duplicate fingerprinting: landmark tokens + shared-token
join — the constellation shape (Wang 2003, the Shazam construction)
reduced to its deterministic core.

Pipeline: frame the PCM signal (operators/audiofeat.py machinery),
sum per-frame power spectra over fixed SEGMENTS, take each segment's
dominant bin (the landmark), and emit one token per ADJACENT landmark
pair — (segment_idx, anchor_bin, target_bin) packed into one long.
Two recordings are near-duplicates when they share at least
MIN_SHARED_TOKENS tokens; re-encoded copies (G.711 companding, which
preserves a strong tone's dominant bin) share every token, unrelated
signals share almost none. Reference scope note: the reference repo
has no media pipeline; this extends the multimodal dedup surface next
to the pHash video path.

Certification design (plans/media_dedup.py): planted signals take
their 8-segment bin sequence from a CUBIC polynomial over GF(29) —
two distinct cubics agree on at most 3 of the 8 evaluation points
(polynomial interpolation), hence share at most 2 adjacent-pair
tokens, strictly below the threshold 4. Chance matches are therefore
impossible by algebra, not merely improbable, for any corpus whose
planted indices stay inside the 29^4 coefficient space.

Scale design: tokenization is per-row independent (Arrow batches,
vectorized rFFT); the match join groups by token equality — the
audio analog of the banded pHash join — so candidate pairs are only
ever generated for recordings that actually share a landmark, never
all-pairs.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from economic_data_etl_spark.operators.audiofeat import (
    FRAME_LEN,
    bin_centered_tone,
    frame_signal,
)

FRAMES_PER_SEGMENT = 3
N_SEGMENTS = 8
_N_RBINS = FRAME_LEN // 2 + 1  # 33 rFFT bins for the 64-sample frame
MIN_SHARED_TOKENS = 4
_COEF_SPACE = 29**4  # cubic polynomials over GF(29)


def segment_bins(
    samples: np.ndarray,
    frame_len: int = FRAME_LEN,
    frames_per_segment: int = FRAMES_PER_SEGMENT,
) -> np.ndarray:
    """Dominant rFFT bin per segment: frames' power spectra are SUMMED
    over each segment before the argmax, so the landmark reflects the
    whole segment, not one frame. Trailing frames short of a full
    segment are dropped (mirrors frame_signal's tail rule)."""
    frames = frame_signal(
        np.ascontiguousarray(samples, dtype=np.float64),
        frame_len,
        frame_len,
    )
    n_seg = frames.shape[0] // frames_per_segment
    if n_seg == 0:
        return np.zeros(0, dtype=np.int64)
    spec = np.abs(
        np.fft.rfft(frames[: n_seg * frames_per_segment], axis=1)
    )
    power = (spec * spec).reshape(n_seg, frames_per_segment, -1).sum(
        axis=1
    )
    return power.argmax(axis=1).astype(np.int64)


def fingerprint_tokens(samples: np.ndarray) -> np.ndarray:
    """Landmark tokens: one per adjacent segment pair, packing
    (segment_idx, anchor_bin, target_bin) into a single int64 —
    token = j * NB^2 + bin_j * NB + bin_{j+1} with NB = 33. Sharing a
    token means agreeing on BOTH bins at the SAME position."""
    bins = segment_bins(samples)
    if bins.size < 2:
        return np.zeros(0, dtype=np.int64)
    j = np.arange(bins.size - 1, dtype=np.int64)
    return j * (_N_RBINS * _N_RBINS) + bins[:-1] * _N_RBINS + bins[1:]


def planted_tone_signal(index: int, amplitude: int = 20000) -> np.ndarray:
    """Deterministic int16 test signal for the near-dup oracle: 8
    segments of bin-centered tones whose bin sequence is the cubic
    polynomial with base-29 coefficient digits of `index`, offset to
    bins 2..30 (away from DC). Distinct indices give distinct cubics,
    which agree on <= 3 of the 8 segments — the provable-separation
    argument in the module docstring."""
    if not 0 <= index < _COEF_SPACE:
        raise ValueError(
            f"planted index {index} outside the certified cubic "
            f"coefficient space [0, {_COEF_SPACE})"
        )
    c = [(index // 29**p) % 29 for p in range(4)]
    segs = []
    for j in range(N_SEGMENTS):
        k = 2 + (c[0] + c[1] * j + c[2] * j * j + c[3] * j**3) % 29
        segs.append(
            bin_centered_tone(
                k, FRAME_LEN, FRAMES_PER_SEGMENT, amplitude
            )
        )
    return np.concatenate(segs)


def near_dup_audio_by_tokens(
    tokens: DataFrame,
    id_col: str = "audio_id",
    token_col: str = "token",
    min_shared: int = MIN_SHARED_TOKENS,
) -> DataFrame:
    """(audio_id, token) -> near-dup pairs (id_a < id_b, n_shared)
    sharing at least `min_shared` landmark tokens. Candidates come
    from token equality only (groupBy-style self-join on the token),
    so pair generation cost follows the true match structure — the
    constellation join, never an all-pairs comparison."""
    left = tokens.select(
        F.col(id_col).alias("id_a"), F.col(token_col).alias("t")
    )
    right = tokens.select(
        F.col(id_col).alias("id_b"), F.col(token_col).alias("t")
    )
    return (
        left.join(right, "t")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )
