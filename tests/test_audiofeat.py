"""Audio feature extraction tests (operators/audiofeat.py)."""

from __future__ import annotations

import numpy as np
import pytest

from economic_data_etl_spark.operators.audiofeat import (
    bin_centered_tone,
    frame_signal,
    spectral_features,
)


class TestFraming:
    def test_shapes_and_tail_drop(self):
        x = np.arange(100, dtype=np.float64)
        f = frame_signal(x, 32, 32)
        assert f.shape == (3, 32)  # 100 // 32, tail of 4 dropped
        assert np.array_equal(f[1], x[32:64])
        overlapped = frame_signal(x, 32, 16)
        assert overlapped.shape == (5, 32)
        assert np.array_equal(overlapped[1], x[16:48])

    def test_short_signal_yields_zero_frames(self):
        assert frame_signal(np.zeros(10), 64, 64).shape == (0, 64)
        feats = spectral_features(np.zeros(3, dtype=np.int16))
        assert feats["dominant_bin"].shape == (0,)


class TestSpectra:
    @pytest.mark.parametrize("k", [1, 7, 16, 31])
    def test_bin_centered_tone_detected_exactly(self, k):
        tone = bin_centered_tone(k, 64, 5)
        feats = spectral_features(tone, 64)
        assert np.array_equal(
            feats["dominant_bin"], np.full(5, k, dtype=np.int64)
        )
        # centroid of a pure tone sits on its bin (quantization noise
        # perturbs at ~1e-4)
        assert np.allclose(feats["centroid"], k, atol=0.01)

    def test_all_catalog_bins_exact_through_wav_codec(self):
        from economic_data_etl_spark.operators.codecs import (
            decode_wav,
            encode_wav,
        )

        for k in range(1, 32):
            tone = bin_centered_tone(k, 64, 3)
            _r, decoded = decode_wav(encode_wav(tone, 8000))
            feats = spectral_features(decoded.ravel(), 64)
            assert list(feats["dominant_bin"]) == [k, k, k]

    def test_segment_sequence_order(self):
        segs = [bin_centered_tone(k, 64, 2) for k in (3, 9, 27)]
        feats = spectral_features(np.concatenate(segs), 64)
        assert list(feats["dominant_bin"]) == [3, 3, 9, 9, 27, 27]

    def test_parseval_energy(self):
        rng = np.random.default_rng(0)
        x = rng.normal(0, 1000, 64)
        feats = spectral_features(x, 64)
        # rfft Parseval: sum|X|^2 over the full (mirrored) spectrum
        # equals N * sum x^2; the one-sided power stored in `energy`
        # is bounded between half and the full two-sided sum
        full = 64 * (x * x).sum()
        assert 0.5 * full <= feats["energy"][0] <= full

    def test_silence_centroid_zero(self):
        feats = spectral_features(np.zeros(128, dtype=np.int16), 64)
        assert np.array_equal(feats["centroid"], np.zeros(2))
        assert np.array_equal(feats["dominant_bin"], np.zeros(2))
