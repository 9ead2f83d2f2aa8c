"""Progressive arithmetic JPEG (SOF10) certification tests.

Same strategy as the other JPEG modes: both encoders share the exact
quantization expression, so decode(encode_arith_progressive(img)) must
be BIT-IDENTICAL to the baseline round-trip for every scan script
(Al ladders, chroma layouts, restart intervals); coefficient-space
properties pin the band codecs per scan; corrupt bytes stay inside the
ValueError/NotImplementedError contract.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from economic_data_etl_spark.operators.jpeg import (
    decode_jpeg,
    encode_jpeg_color,
    encode_jpeg_gray,
)
from economic_data_etl_spark.operators.jpeg_arith_progressive import (
    _dec_ac_band_first,
    _dec_ac_band_refine,
    _enc_ac_band_first,
    _enc_ac_band_refine,
    _fixed,
    decode_arith_progressive,
    encode_jpeg_arith_progressive,
)
from economic_data_etl_spark.operators.jpeg_arithmetic import (
    _AC_STAT_BINS,
    _new_stats,
    _QMDecoder,
    _QMEncoder,
)


class TestBandCodecs:
    """Coefficient-space round-trips for the per-scan AC band codecs,
    independent of the image pipeline."""

    @given(
        st.lists(st.integers(-40, 40), min_size=63, max_size=63),
        st.integers(0, 2),
    )
    @settings(max_examples=50, deadline=None)
    def test_ac_first_band_round_trip(self, coeffs, al):
        zz = np.zeros(64, dtype=np.int32)
        zz[1:] = coeffs
        for ss, se in ((1, 5), (6, 63)):
            enc = _QMEncoder()
            stats, fixed = _new_stats(_AC_STAT_BINS), _fixed()
            _enc_ac_band_first(enc, stats, fixed, zz, ss, se, al)
            out = np.zeros(64, dtype=np.int32)
            dec = _QMDecoder(enc.flush())
            stats_d, fixed_d = _new_stats(_AC_STAT_BINS), _fixed()
            _dec_ac_band_first(dec, stats_d, fixed_d, out, ss, se, al)
            want = np.where(
                zz >= 0, (zz >> al) << al, -(((-zz) >> al) << al)
            )
            want[:ss] = 0
            want[se + 1 :] = 0
            assert np.array_equal(out[ss : se + 1], want[ss : se + 1])

    @given(
        st.lists(st.integers(-40, 40), min_size=63, max_size=63),
        st.integers(0, 2),
    )
    @settings(max_examples=50, deadline=None)
    def test_ac_refine_band_round_trip(self, coeffs, al):
        ah = al + 1
        zz = np.zeros(64, dtype=np.int32)
        zz[1:] = coeffs
        for ss, se in ((1, 5), (6, 63)):
            # decoder starts from the Ah-precision state and must land
            # on the Al-precision state after the refinement scan
            def pt(arr, bits):
                return np.where(
                    arr >= 0,
                    (arr >> bits) << bits,
                    -(((-arr) >> bits) << bits),
                )

            state = pt(zz, ah)
            enc = _QMEncoder()
            stats, fixed = _new_stats(_AC_STAT_BINS), _fixed()
            _enc_ac_band_refine(enc, stats, fixed, zz, ss, se, ah, al)
            out = state.copy()
            dec = _QMDecoder(enc.flush())
            stats_d, fixed_d = _new_stats(_AC_STAT_BINS), _fixed()
            _dec_ac_band_refine(
                dec, stats_d, fixed_d, out, ss, se, ah, al
            )
            want = pt(zz, al)
            assert np.array_equal(out[ss : se + 1], want[ss : se + 1])


class TestRoundTripVsBaseline:
    @pytest.mark.parametrize("al", [0, 1, 2, 3])
    def test_gray_matches_baseline(self, al):
        rng = np.random.default_rng(al)
        img = rng.integers(0, 256, (37, 29), np.uint8)
        base = decode_jpeg(encode_jpeg_gray(img))
        out = decode_jpeg(encode_jpeg_arith_progressive(img, al=al))
        assert np.array_equal(out, base)

    @pytest.mark.parametrize("mode", ["444", "420", "422", "440"])
    def test_color_matches_baseline(self, mode):
        rng = np.random.default_rng(ord(mode[1]))
        img = rng.integers(0, 256, (21, 26, 3), np.uint8)
        base = decode_jpeg(encode_jpeg_color(img, mode))
        for al in (0, 2):
            out = decode_jpeg(
                encode_jpeg_arith_progressive(img, mode, al=al)
            )
            assert np.array_equal(out, base)

    @pytest.mark.parametrize("ri", [1, 3, 7])
    def test_restart_intervals_preserve_pixels(self, ri):
        rng = np.random.default_rng(ri)
        img = rng.integers(0, 256, (24, 31), np.uint8)
        base = decode_jpeg(encode_jpeg_gray(img))
        out = decode_jpeg(
            encode_jpeg_arith_progressive(
                img, al=2, restart_interval=ri
            )
        )
        assert np.array_equal(out, base)

    def test_beats_huffman_progressive_on_random_content(self):
        from economic_data_etl_spark.operators.jpeg_progressive import (
            encode_jpeg_progressive,
        )

        rng = np.random.default_rng(13)
        img = rng.integers(0, 256, (48, 48), np.uint8)
        assert len(encode_jpeg_arith_progressive(img, al=1)) < len(
            encode_jpeg_progressive(img, al=1)
        )

    def test_extremes(self):
        for c in (0, 255):
            img = np.full((16, 16), c, np.uint8)
            assert np.array_equal(
                decode_jpeg(encode_jpeg_arith_progressive(img, al=3)),
                decode_jpeg(encode_jpeg_gray(img)),
            )


class TestRobustness:
    def test_truncation_raises_value_error(self):
        good = encode_jpeg_arith_progressive(
            np.arange(256, dtype=np.uint8).reshape(16, 16), al=1
        )
        with pytest.raises(ValueError):
            decode_arith_progressive(good[: len(good) // 2])

    def test_mutations_never_escape_try_decode(self):
        from economic_data_etl_spark.operators.codecs import (
            try_decode_media,
        )

        rng = np.random.default_rng(6)
        base = bytearray(
            encode_jpeg_arith_progressive(
                rng.integers(0, 256, (20, 20), np.uint8),
                al=1,
                restart_interval=2,
            )
        )
        for _ in range(400):
            mutated = bytearray(base)
            for _ in range(int(rng.integers(1, 4))):
                mutated[int(rng.integers(0, len(mutated)))] = int(
                    rng.integers(0, 256)
                )
            try_decode_media(bytes(mutated))  # must not raise
