"""Arithmetic-coded JPEG (SOF9) certification tests.

Strategy (mirrors test_jpeg.py / test_jpeg_progressive.py):
- the QM coder is pinned by exact round-trips over random
  decision/context sequences (hypothesis) and by a compression-ratio
  sanity bound on biased sources — a mis-wired estimator still
  round-trips (encoder and decoder share the state table) but cannot
  approach the source entropy, so the ratio bound catches
  transcription damage that self-consistency alone would hide;
- the full codec is pinned by BITWISE equality with the baseline
  decoder on random images: both encoders share the quantization/IDCT
  path, so any divergence is an entropy-layer bug;
- the closed-form block-constant subspace (the catalog query
  multimodal_arithmetic_jpeg's oracle) is checked directly;
- corrupt/truncated/mutated bytes must raise ValueError (or the
  documented NotImplementedError gates) and never escape
  try_decode_media.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from economic_data_etl_spark.operators.jpeg import (
    block_constant_pattern,
    decode_jpeg,
    decode_jpeg_gray,
    encode_jpeg_color,
    encode_jpeg_gray,
    expected_constant_decode,
)
from economic_data_etl_spark.operators.jpeg_arithmetic import (
    _ARITH_TAB,
    _new_stats,
    _QMDecoder,
    _QMEncoder,
    FIXED_BIN,
    decode_arithmetic,
    encode_jpeg_arith_color,
    encode_jpeg_arith_gray,
)


class TestStateTable:
    def test_shape_and_ranges(self):
        assert len(_ARITH_TAB) == 114  # 113 adaptive + 1 fixed
        for qe, nlps, nmps, sw in _ARITH_TAB:
            assert 0 < qe < 0x8000
            assert 0 <= nlps < len(_ARITH_TAB)
            assert 0 <= nmps < len(_ARITH_TAB)
            assert sw in (0, 1)

    def test_fixed_bin_self_loops(self):
        qe, nlps, nmps, sw = _ARITH_TAB[FIXED_BIN]
        assert (nlps, nmps, sw) == (FIXED_BIN, FIXED_BIN, 0)

    def test_switch_rows_are_near_equiprobable(self):
        # MPS/LPS exchange only makes sense when Qe ~ 0.5 (state 0 of
        # each fast-attack chain); every switch row must sit in the
        # top quarter of the Qe range
        for qe, nlps, nmps, sw in _ARITH_TAB[:113]:
            if sw:
                assert qe > 0x5000

    def test_mps_chains_descend_toward_certainty(self):
        # repeated MPS from state 0 must drive Qe monotonically
        # non-increasing down to the most-skewed state (0x0001)
        idx, seen = 0, set()
        while idx not in seen:
            seen.add(idx)
            nxt = _ARITH_TAB[idx][2]
            assert _ARITH_TAB[nxt][0] <= _ARITH_TAB[idx][0]
            idx = nxt
        assert _ARITH_TAB[idx][0] == 0x0001  # terminal self-loop


class TestQMCoder:
    @given(
        st.lists(
            st.tuples(st.integers(0, 1), st.integers(0, 7)),
            min_size=0,
            max_size=400,
        )
    )
    @settings(max_examples=60, deadline=None)
    def test_round_trip_random_decisions(self, seq):
        stats_e, stats_d = _new_stats(8), _new_stats(8)
        enc = _QMEncoder()
        for d, cx in seq:
            enc.encode(stats_e, cx, d)
        dec = _QMDecoder(enc.flush())
        assert [dec.decode(stats_d, cx) for _, cx in seq] == [
            d for d, _ in seq
        ]
        assert stats_e == stats_d  # adaptation walked the same path

    def test_long_stream_exercises_carry_banking(self):
        # > _BANK_SHIFTS renorm shifts forces the positional big-int
        # bank path at least once
        rng = np.random.default_rng(7)
        seq = rng.integers(0, 2, 20000).tolist()
        stats_e, stats_d = _new_stats(1), _new_stats(1)
        enc = _QMEncoder()
        for d in seq:
            enc.encode(stats_e, 0, d)
        data = enc.flush()
        assert len(data) > 512 // 8
        dec = _QMDecoder(data)
        assert [dec.decode(stats_d, 0) for _ in seq] == seq

    def test_biased_source_compresses_near_entropy(self):
        rng = np.random.default_rng(3)
        p = 0.05
        bits = (rng.random(20000) < p).astype(int).tolist()
        stats = _new_stats(1)
        enc = _QMEncoder()
        for d in bits:
            enc.encode(stats, 0, d)
        out_bits = len(enc.flush()) * 8
        entropy = -(p * np.log2(p) + (1 - p) * np.log2(1 - p))
        # the adaptive estimator must land within 25% of the source
        # entropy — a transcribed-table error that still round-trips
        # (wrong transitions) blows this bound
        assert out_bits < entropy * len(bits) * 1.25

    def test_fixed_bin_never_adapts(self):
        stats = _new_stats(1)
        stats[0] = FIXED_BIN
        enc = _QMEncoder()
        for d in (0, 1) * 50:
            enc.encode(stats, 0, d)
        assert stats[0] == FIXED_BIN

    def test_stuffing_invariant(self):
        # every 0xFF in the entropy output must be followed by 0x00
        rng = np.random.default_rng(11)
        stats = _new_stats(4)
        enc = _QMEncoder()
        for d, cx in zip(
            rng.integers(0, 2, 5000), rng.integers(0, 4, 5000)
        ):
            enc.encode(stats, int(cx), int(d))
        data = enc.flush()
        for i, b in enumerate(data[:-1]):
            if b == 0xFF:
                assert data[i + 1] == 0x00


class TestRoundTripVsBaseline:
    @pytest.mark.parametrize("shape", [(8, 8), (16, 24), (37, 53), (96, 96)])
    def test_gray_matches_baseline_decode(self, shape):
        rng = np.random.default_rng(sum(shape))
        img = rng.integers(0, 256, shape, np.uint8)
        base = decode_jpeg(encode_jpeg_gray(img))
        arith = decode_jpeg(encode_jpeg_arith_gray(img))
        assert np.array_equal(base, arith)

    @pytest.mark.parametrize("mode", ["444", "420", "422", "440"])
    def test_color_matches_baseline_decode(self, mode):
        rng = np.random.default_rng(ord(mode[2]))
        img = rng.integers(0, 256, (35, 41, 3), np.uint8)
        base = decode_jpeg(encode_jpeg_color(img, mode))
        arith = decode_jpeg(encode_jpeg_arith_color(img, mode))
        assert np.array_equal(base, arith)

    @pytest.mark.parametrize("ri", [1, 2, 5])
    def test_restart_intervals_preserve_pixels(self, ri):
        rng = np.random.default_rng(ri)
        img = rng.integers(0, 256, (40, 33), np.uint8)
        plain = decode_jpeg(encode_jpeg_arith_gray(img))
        restarted = decode_jpeg(
            encode_jpeg_arith_gray(img, restart_interval=ri)
        )
        assert np.array_equal(plain, restarted)
        imgc = rng.integers(0, 256, (17, 26, 3), np.uint8)
        assert np.array_equal(
            decode_jpeg(encode_jpeg_arith_color(imgc, "420")),
            decode_jpeg(
                encode_jpeg_arith_color(imgc, "420", restart_interval=ri)
            ),
        )

    def test_arithmetic_beats_huffman_on_natural_gradients(self):
        # the headline property of SOF9: ~5-15% smaller files on
        # smooth content; catches a degenerate (always-renormalizing)
        # coder that would still round-trip
        x = np.arange(96)[None, :]
        y = np.arange(96)[:, None]
        img = ((x + y) // 2 % 256).astype(np.uint8)
        assert len(encode_jpeg_arith_gray(img)) < len(
            encode_jpeg_gray(img)
        )

    def test_smooth_and_extreme_values(self):
        for c in (0, 255):
            img = np.full((24, 24), c, np.uint8)
            assert np.array_equal(
                decode_jpeg(encode_jpeg_arith_gray(img)),
                decode_jpeg(encode_jpeg_gray(img)),
            )


class TestClosedForm:
    def test_block_constant_matches_formula(self):
        for d in (0, 7, 130, 4095):
            w, h = 16 + d % 64, 16 + (d // 64) % 64
            img = block_constant_pattern(d, w, h)
            arr = decode_jpeg_gray(
                encode_jpeg_arith_gray(img, restart_interval=d % 4)
            )
            expected = np.vectorize(expected_constant_decode)(
                img.astype(int)
            )
            assert np.array_equal(arr, expected.astype(np.uint8))


class TestRobustness:
    def test_truncation_raises_value_error(self):
        good = encode_jpeg_arith_gray(np.zeros((16, 16), np.uint8))
        with pytest.raises(ValueError):
            decode_arithmetic(good[: len(good) // 2])

    def test_non_default_conditioning_is_gated(self):
        payload = bytearray(
            encode_jpeg_arith_gray(np.zeros((8, 8), np.uint8))
        )
        idx = bytes(payload).find(b"\xff\xcc")
        assert idx > 0
        payload[idx + 5] = 0x23  # DC conditioning L=3/U=2 (non-default)
        with pytest.raises(NotImplementedError):
            decode_jpeg(bytes(payload))

    def test_arithmetic_lossless_still_gated(self):
        payload = bytearray(
            encode_jpeg_arith_gray(np.zeros((8, 8), np.uint8))
        )
        idx = bytes(payload).find(b"\xff\xc9")
        payload[idx + 1] = 0xCB  # SOF11 (arithmetic lossless)
        with pytest.raises(NotImplementedError):
            decode_jpeg(bytes(payload))

    def test_mutations_never_escape_try_decode(self):
        from economic_data_etl_spark.operators.codecs import (
            try_decode_media,
        )

        rng = np.random.default_rng(5)
        base = bytearray(
            encode_jpeg_arith_gray(
                rng.integers(0, 256, (24, 24), np.uint8),
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
