"""Audio feature extraction: framing + spectral analysis.

The audio sibling of the image feature lanes: frame a PCM signal,
take per-frame magnitude spectra (numpy rFFT), and reduce to features
— dominant frequency bin, band energy, spectral centroid. Reference
scope note: the reference repo has no media handling; this extends
the multimodal surface next to the WAV/G.711/ADPCM codecs, which
produce exactly the int16 sample arrays this module consumes.

Certification design: a sinusoid whose frequency sits EXACTLY on a
DFT bin center (an integer number of cycles per frame) concentrates
its energy in that single bin — the off-bin magnitudes are zero in
exact arithmetic and ~1e-12 relative in floats, and int16
quantization noise sits ~90 dB below the tone — so the per-frame
dominant bin is an INTEGER the oracle can compute from the synthesis
rule alone. The catalog query routes the tone through the repo's own
WAV encode/decode first, putting codec + framing + FFT + argmax under
one value hash.

Scale: per-row independent (Arrow batches), no shuffle; frames are a
strided view (no copy) and the rFFT batches over all frames at once.
"""

from __future__ import annotations

import numpy as np

FRAME_LEN = 64


def frame_signal(x: np.ndarray, frame_len: int, hop: int) -> np.ndarray:
    """(n,) -> (n_frames, frame_len) strided view (rectangular
    window, no padding — the tail shorter than a frame is dropped)."""
    n = (len(x) - frame_len) // hop + 1 if len(x) >= frame_len else 0
    if n <= 0:
        return np.empty((0, frame_len), dtype=x.dtype)
    return np.lib.stride_tricks.as_strided(
        x,
        shape=(n, frame_len),
        strides=(x.strides[0] * hop, x.strides[0]),
        writeable=False,
    )


def spectral_features(
    samples: np.ndarray, frame_len: int = FRAME_LEN, hop: int | None = None
) -> dict[str, np.ndarray]:
    """Per-frame spectral features of a mono int16/float signal:
    dominant_bin (argmax of |rFFT|, DC included), total energy, and
    spectral centroid (energy-weighted mean bin, 0.0 for silent
    frames)."""
    hop = frame_len if hop is None else hop
    frames = frame_signal(
        np.ascontiguousarray(samples, dtype=np.float64), frame_len, hop
    )
    spec = np.abs(np.fft.rfft(frames, axis=1))
    power = spec * spec
    total = power.sum(axis=1)
    bins = np.arange(spec.shape[1], dtype=np.float64)
    centroid = np.where(
        total > 0, (power * bins).sum(axis=1) / np.maximum(total, 1e-30), 0.0
    )
    return {
        "dominant_bin": spec.argmax(axis=1).astype(np.int64),
        "energy": total,
        "centroid": centroid,
    }


def bin_centered_tone(
    k: int, frame_len: int, n_frames: int, amplitude: int = 20000
) -> np.ndarray:
    """int16 sinusoid with exactly k cycles per frame — the
    closed-form test signal whose dominant bin is k in every frame."""
    n = np.arange(n_frames * frame_len, dtype=np.float64)
    return np.round(
        amplitude * np.sin(2.0 * np.pi * k * n / frame_len)
    ).astype(np.int16)
