"""Lossless JPEG (SOF3) certification tests.

SOF3 is exactly lossless, so the contract is the strongest of the
codec family: decode(encode(img)) must equal img BIT-FOR-BIT for
arbitrary inputs, across all seven T.81 Annex H predictors, restart
intervals, gray and 3-channel images. Hypothesis drives random images
through random (predictor, restart) pairings; corrupt bytes must stay
inside the ValueError/NotImplementedError contract.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from economic_data_etl_spark.operators.jpeg import decode_jpeg
from economic_data_etl_spark.operators.jpeg_lossless import (
    _LL_BITS,
    decode_lossless,
    encode_jpeg_lossless,
)


class TestTable:
    def test_kraft_complete_prefix_code(self):
        assert sum(_LL_BITS) == 17  # SSSS 0..16
        kraft = sum(
            n / (1 << (length + 1))
            for length, n in enumerate(_LL_BITS)
        )
        assert kraft <= 1


class TestRoundTrip:
    @pytest.mark.parametrize("predictor", range(1, 8))
    def test_every_predictor_is_exact(self, predictor):
        rng = np.random.default_rng(predictor)
        img = rng.integers(0, 256, (21, 34), np.uint8)
        out = decode_jpeg(encode_jpeg_lossless(img, predictor))
        assert np.array_equal(out, img)

    @pytest.mark.parametrize("ri", [1, 2, 5, 16])
    def test_restart_intervals_are_exact(self, ri):
        rng = np.random.default_rng(ri)
        img = rng.integers(0, 256, (19, 23), np.uint8)
        out = decode_jpeg(
            encode_jpeg_lossless(img, predictor=4, restart_interval=ri)
        )
        assert np.array_equal(out, img)

    def test_color_has_no_color_transform(self):
        rng = np.random.default_rng(9)
        img = rng.integers(0, 256, (14, 15, 3), np.uint8)
        out = decode_jpeg(encode_jpeg_lossless(img, predictor=7))
        assert np.array_equal(out, img)  # exact, unlike any DCT mode

    def test_extreme_values_and_single_pixel(self):
        for c in (0, 255):
            img = np.full((9, 9), c, np.uint8)
            assert np.array_equal(
                decode_jpeg(encode_jpeg_lossless(img, 4)), img
            )
        one = np.array([[173]], np.uint8)
        assert np.array_equal(
            decode_jpeg(encode_jpeg_lossless(one, 1)), one
        )

    def test_adversarial_alternating_extremes(self):
        # maximal |diff| stresses the top magnitude categories
        img = np.zeros((16, 16), np.uint8)
        img[::2, :] = 255
        img[:, ::2] ^= 255
        for p in (1, 2, 4, 6):
            assert np.array_equal(
                decode_jpeg(encode_jpeg_lossless(img, p)), img
            )

    @given(
        st.integers(1, 7),
        st.integers(0, 6),
        st.integers(1, 24),
        st.integers(1, 24),
        st.integers(0, 2**32 - 1),
    )
    @settings(max_examples=40, deadline=None)
    def test_random_images_round_trip(self, pred, ri, h, w, seed):
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, (h, w), np.uint8)
        out = decode_lossless(
            encode_jpeg_lossless(img, pred, restart_interval=ri)
        )
        assert np.array_equal(out, img)

    def test_smooth_content_compresses(self):
        x = np.arange(64)[None, :]
        y = np.arange(64)[:, None]
        smooth = ((x + y) // 2 % 256).astype(np.uint8)
        assert len(encode_jpeg_lossless(smooth, predictor=4)) < 64 * 64


class TestRobustness:
    def test_bad_predictor_rejected(self):
        img = np.zeros((8, 8), np.uint8)
        with pytest.raises(ValueError):
            encode_jpeg_lossless(img, predictor=0)
        with pytest.raises(ValueError):
            encode_jpeg_lossless(img, predictor=8)
        payload = bytearray(encode_jpeg_lossless(img, predictor=3))
        # SOS predictor byte = Ss field; zero it -> invalid selection
        sos = bytes(payload).find(b"\xff\xda")
        payload[sos + 7] = 0
        with pytest.raises(ValueError):
            decode_lossless(bytes(payload))

    def test_point_transform_is_gated(self):
        img = np.zeros((8, 8), np.uint8)
        payload = bytearray(encode_jpeg_lossless(img, predictor=1))
        sos = bytes(payload).find(b"\xff\xda")
        payload[sos + 9] = 2  # Al = 2
        with pytest.raises(NotImplementedError):
            decode_lossless(bytes(payload))

    def test_truncation_raises_value_error(self):
        good = encode_jpeg_lossless(
            np.arange(256, dtype=np.uint8).reshape(16, 16), 4
        )
        with pytest.raises(ValueError):
            decode_lossless(good[: len(good) - 8])

    def test_mutations_never_escape_try_decode(self):
        from economic_data_etl_spark.operators.codecs import (
            try_decode_media,
        )

        rng = np.random.default_rng(2)
        base = bytearray(
            encode_jpeg_lossless(
                rng.integers(0, 256, (20, 20), np.uint8),
                predictor=5,
                restart_interval=3,
            )
        )
        for _ in range(400):
            mutated = bytearray(base)
            for _ in range(int(rng.integers(1, 4))):
                mutated[int(rng.integers(0, len(mutated)))] = int(
                    rng.integers(0, 256)
                )
            try_decode_media(bytes(mutated))  # must not raise


class TestVectorizedEncoderEquivalence:
    """The vectorized encoder (array-shift predictions + frexp
    categories + bit-matrix packing) must be BITWISE identical to the
    sequential per-sample walk it replaced — kept here as the
    reference implementation, built from the module's own primitives
    (_predict / _encode_diff / _BitWriter), which the decoder still
    uses."""

    @staticmethod
    def _reference_encode_entropy(
        planes, predictor: int, restart_interval: int
    ) -> bytes:
        from economic_data_etl_spark.operators.jpeg import _BitWriter
        from economic_data_etl_spark.operators.jpeg_lossless import (
            _encode_diff,
            _predict,
            _wrap_diff,
        )

        h, w = planes[0].shape
        writer = _BitWriter()
        seg_start = (0, 0)
        mcu_index = 0
        for y in range(h):
            for x in range(w):
                if (
                    restart_interval
                    and mcu_index
                    and mcu_index % restart_interval == 0
                ):
                    writer.restart(
                        (mcu_index // restart_interval - 1) % 8
                    )
                    seg_start = (y, x)
                mcu_index += 1
                for plane in planes:
                    pred = _predict(
                        plane, y, x, predictor, seg_start
                    )
                    _encode_diff(
                        writer, _wrap_diff(int(plane[y, x]) - pred)
                    )
        return writer.flush()

    @settings(max_examples=40, deadline=None)
    @given(
        pred=st.integers(1, 7),
        ri=st.sampled_from([0, 1, 3, 7, 16, 64]),
        h=st.integers(1, 18),
        w=st.integers(1, 18),
        ncomp=st.sampled_from([1, 3]),
        seed=st.integers(0, 10**6),
    )
    def test_bitwise_equals_sequential_reference(
        self, pred, ri, h, w, ncomp, seed
    ):
        rng = np.random.default_rng(seed)
        shape = (h, w) if ncomp == 1 else (h, w, 3)
        img = rng.integers(0, 256, shape).astype(np.uint8)
        got = encode_jpeg_lossless(
            img, predictor=pred, restart_interval=ri
        )
        planes = (
            [img.astype(np.int64)]
            if ncomp == 1
            else [img[:, :, i].astype(np.int64) for i in range(3)]
        )
        want = self._reference_encode_entropy(planes, pred, ri)
        # compare the entropy-coded payload (headers are unchanged
        # code): slice between SOS body end and EOI
        assert got.endswith(b"\xff\xd9")
        assert got[-2 - len(want) : -2] == want

    def test_stuffed_and_padded_bytes_match(self):
        # extremes that exercise byte stuffing (0xFF bytes in the
        # stream) and the 1-padding path at every restart boundary
        img = np.tile(
            np.array([[0, 255], [255, 0]], np.uint8), (8, 8)
        )
        for ri in (0, 1, 5):
            got = encode_jpeg_lossless(img, 4, restart_interval=ri)
            want = self._reference_encode_entropy(
                [img.astype(np.int64)], 4, ri
            )
            assert got[-2 - len(want) : -2] == want


class TestUndiffPlaneEquivalence:
    """_undiff_plane (row-vectorized DPCM inversion) must reproduce the
    scalar _predict walk bit-for-bit on ARBITRARY diff planes — not
    just diffs produced by the encoder — across every predictor and
    restart geometry, including mid-row segment starts and the
    mod-2^16 wrap values."""

    def test_matches_scalar_walk_on_random_diffs(self):
        from economic_data_etl_spark.operators.jpeg_lossless import (
            _predict,
            _undiff_plane,
        )

        rng = np.random.default_rng(7)
        for pred in range(1, 8):
            for ri in (0, 1, 2, 3, 5, 9, 100):
                h, w = int(rng.integers(1, 15)), int(rng.integers(1, 15))
                n = h * w
                d2 = rng.integers(-32768, 32769, (h, w)).astype(np.int64)
                seg_ranges = (
                    [(s, min(s + ri, n)) for s in range(0, n, ri)]
                    if ri
                    else [(0, n)]
                )
                got = _undiff_plane(d2, pred, seg_ranges)
                want = np.zeros((h, w), np.int64)
                starts = {s0 for s0, _ in seg_ranges}
                seg_start = (0, 0)
                for y in range(h):
                    for x in range(w):
                        if y * w + x in starts:
                            seg_start = (y, x)
                        p = _predict(want, y, x, pred, seg_start)
                        want[y, x] = (p + int(d2[y, x])) & 0xFF
                assert np.array_equal(got, want), (pred, ri, h, w)
