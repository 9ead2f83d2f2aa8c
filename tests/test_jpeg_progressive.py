"""Progressive JPEG (operators/jpeg_progressive.py) certification.

Strategy mirrors tests/test_jpeg.py: the progressive encoder
entropy-codes the EXACT quantized coefficient set the baseline encoder
produces, so progressive decode must be bit-identical to the baseline
round-trip on every image; scan-level codecs are additionally pinned by
coefficient-space property tests (hypothesis) and a handcrafted stream
exercising EOB runs > 1 — which the encoder never emits — verified
against independent from-the-math reconstruction."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from economic_data_etl_spark.operators.jpeg import (
    QTAB,
    _BitReader,
    _BitWriter,
    _canonical_codes,
    _decode_table,
    _DC_BITS,
    _DC_ENC,
    _DC_VALS,
    _dqt_payload,
    _JFIF_APP0,
    _magnitude,
    _seg,
    _ZIGZAG,
    block_constant_pattern,
    decode_jpeg,
    decode_jpeg_gray,
    encode_jpeg_color,
    encode_jpeg_gray,
    expected_constant_decode,
)
from economic_data_etl_spark.operators.jpeg_progressive import (
    _dec_ac_first,
    _dec_ac_refine,
    _enc_ac_first,
    _enc_ac_refine,
    _pt_ac,
    encode_jpeg_progressive,
)


class TestRoundTripEqualsBaseline:
    @pytest.mark.parametrize("al", [0, 1, 2, 3])
    @pytest.mark.parametrize("shape", [(8, 8), (16, 24), (17, 23), (41, 29)])
    def test_gray(self, al, shape):
        rng = np.random.default_rng(al * 100 + shape[0])
        img = rng.integers(0, 256, size=shape).astype(np.uint8)
        base = decode_jpeg(encode_jpeg_gray(img))
        prog = decode_jpeg(encode_jpeg_progressive(img, al=al))
        assert base.dtype == prog.dtype and base.shape == prog.shape
        assert (base == prog).all()

    @pytest.mark.parametrize("al", [0, 1, 2])
    @pytest.mark.parametrize("subsample", [False, True, "422", "440"])
    def test_color(self, al, subsample):
        rng = np.random.default_rng(al * 10 + hash(str(subsample)) % 97)
        img = rng.integers(0, 256, size=(33, 41, 3)).astype(np.uint8)
        base = decode_jpeg(encode_jpeg_color(img, subsample=subsample))
        prog = decode_jpeg(
            encode_jpeg_progressive(img, subsample=subsample, al=al)
        )
        assert (base == prog).all()

    def test_smooth_gradient_sparse_acs(self):
        # gradients quantize to sparse coefficients → long zero runs
        # (ZRL / trailing-EOB paths in every scan type)
        x = np.arange(48).reshape(1, 48)
        y = np.arange(40).reshape(40, 1)
        img = ((x * 3 + y * 5) % 256).astype(np.uint8)
        for al in (0, 1, 2):
            assert (
                decode_jpeg(encode_jpeg_gray(img))
                == decode_jpeg(encode_jpeg_progressive(img, al=al))
            ).all()

    def test_block_constant_closed_form(self):
        # the certification subspace: every AC is exactly zero in every
        # scan, so the decode has the same closed form as baseline
        for doc_id in (0, 3, 7, 250):
            img = block_constant_pattern(doc_id, 24, 16)
            out = decode_jpeg_gray(encode_jpeg_progressive(img, al=1))
            c = int(img[0, 0])
            assert (out[:8, :8] == expected_constant_decode(c)).all()


@st.composite
def sparse_coefs(draw):
    """(nblocks, 64) int32 coefficient blocks with controllable
    sparsity — including ≥16-gap layouts that force ZRL inside
    refinement scans."""
    nblocks = draw(st.integers(1, 4))
    out = np.zeros((1, nblocks, 64), dtype=np.int32)
    for b in range(nblocks):
        n = draw(st.integers(0, 6))
        for _ in range(n):
            k = draw(st.integers(1, 63))
            v = draw(
                st.integers(-31, 31).filter(lambda x: x != 0)
            )
            out[0, b, k] = v
    return out


class TestScanCodecProperties:
    @settings(max_examples=60, deadline=None)
    @given(data=st.data())
    def test_ac_first_scan_roundtrip(self, data):
        from economic_data_etl_spark.operators.jpeg import _AC_ENC, _AC_DEC

        coef = data.draw(sparse_coefs())
        al = data.draw(st.integers(0, 2))
        ss = data.draw(st.integers(1, 10))
        se = data.draw(st.integers(ss, 63))
        nb = coef.shape[1]
        entropy = _enc_ac_first(coef, 1, nb, ss, se, al, _AC_ENC)
        got = np.zeros_like(coef)
        _dec_ac_first(_BitReader(entropy), got, 1, nb, ss, se, al, _AC_DEC, 0)
        for b in range(nb):
            for k in range(ss, se + 1):
                assert got[0, b, k] == _pt_ac(int(coef[0, b, k]), al) << al

    @settings(max_examples=60, deadline=None)
    @given(data=st.data())
    def test_ac_refine_scan_roundtrip(self, data):
        from economic_data_etl_spark.operators.jpeg import _AC_ENC, _AC_DEC

        coef = data.draw(sparse_coefs())
        al = data.draw(st.integers(0, 2))
        ah = al + 1
        ss = data.draw(st.integers(1, 10))
        se = data.draw(st.integers(ss, 63))
        nb = coef.shape[1]
        entropy = _enc_ac_refine(coef, 1, nb, ss, se, ah, al, _AC_ENC)
        # decoder starts from the previous approximation level
        state = np.zeros_like(coef)
        for b in range(nb):
            for k in range(ss, se + 1):
                state[0, b, k] = _pt_ac(int(coef[0, b, k]), ah) << ah
        _dec_ac_refine(
            _BitReader(entropy), state, 1, nb, ss, se, al, _AC_DEC, 0
        )
        for b in range(nb):
            for k in range(ss, se + 1):
                want = _pt_ac(int(coef[0, b, k]), al) << al
                assert state[0, b, k] == want, (b, k, al)


def _independent_block_decode(zz64: list[int]) -> np.ndarray:
    """Straight-from-the-math reconstruction (no shared IDCT code):
    dezigzag → dequantize → IDCT-II sum → round-half-up → clip."""
    levels = np.zeros((8, 8))
    for j, (r, c) in enumerate(_ZIGZAG):
        levels[r, c] = zz64[j] * QTAB[r, c]
    out = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8)
                    cv = np.sqrt(1 / 8) if v == 0 else np.sqrt(2 / 8)
                    s += (
                        cu * cv * levels[u, v]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            out[x, y] = s
    return np.clip(np.floor(out + 128.0 + 0.5 + 1e-6), 0, 255).astype(
        np.uint8
    )


class TestEobRuns:
    def test_handcrafted_eob_run_spans_blocks(self):
        """EOB runs with r > 0 (run length 2^r + bits, spanning blocks)
        never come out of our encoder (it closes each block with a
        plain EOB), but real progressive files use them everywhere —
        decode a handcrafted two-block stream whose AC first scan ends
        block 1 with an EOB2 covering block 2, and whose refinement
        scan introduces a new coefficient in block 2 after an EOB in
        block 1, against independent from-the-math pixels."""
        # custom AC table: EOB(0x00), EOB2(0x10), (0,1)=0x01, (2,1)=0x21
        ac_bits = [0, 0, 4, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
        ac_vals = [0x00, 0x10, 0x01, 0x21]
        ac_enc = _canonical_codes(ac_bits, ac_vals)

        w = _BitWriter()  # scan 1: DC first, both blocks (Al=0)
        for diff in (5, 2):  # DCs 5 and 7
            size, bits = _magnitude(diff)
            code, length = _DC_ENC[size]
            w.write(code, length)
            w.write(bits, size)
        scan1 = w.flush()

        w = _BitWriter()  # scan 2: AC first 1..63, Al=1
        code, length = ac_enc[0x01]  # block 1: k=1, value 1 (→ 2 full)
        w.write(code, length)
        w.write(1, 1)  # magnitude bits for +1
        code, length = ac_enc[0x10]  # EOB2: run = 2 + 1 extra bit
        w.write(code, length)
        w.write(0, 1)  # extra bit 0 → eobrun 2 (this block + next)
        scan2 = w.flush()

        w = _BitWriter()  # scan 3: AC refine Ah=1, Al=0
        # block 1: no new coefficients → EOB, then correction bit for
        # the k=1 history coefficient (full value 2 → bit 0)
        code, length = ac_enc[0x00]
        w.write(code, length)
        w.write(0, 1)
        # block 2: two zero-history positions then new -1 at k=3
        code, length = ac_enc[0x21]
        w.write(code, length)
        w.write(0, 1)  # sign bit: negative
        code, length = ac_enc[0x00]  # close the block
        w.write(code, length)
        scan3 = w.flush()

        dht = (
            bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS)
            + bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals)
        )
        sof = struct.pack(">BHHB", 8, 8, 16, 1) + bytes([1, 0x11, 0])
        payload = (
            b"\xff\xd8"
            + _seg(0xFFE0, _JFIF_APP0)
            + _seg(0xFFDB, _dqt_payload(0, QTAB))
            + _seg(0xFFC2, sof)
            + _seg(0xFFC4, dht)
            + _seg(0xFFDA, bytes([1, 1, 0x00, 0, 0, 0x00]))
            + scan1
            + _seg(0xFFDA, bytes([1, 1, 0x00, 1, 63, 0x01]))
            + scan2
            + _seg(0xFFDA, bytes([1, 1, 0x00, 1, 63, 0x10]))
            + scan3
            + b"\xff\xd9"
        )
        out = decode_jpeg(payload)
        assert out.shape == (8, 16)
        zz1 = [0] * 64
        zz1[0], zz1[1] = 5, 2
        zz2 = [0] * 64
        zz2[0], zz2[3] = 7, -1
        assert (out[:, :8] == _independent_block_decode(zz1)).all()
        assert (out[:, 8:] == _independent_block_decode(zz2)).all()


class TestGatesAndCorruption:
    def test_decode_jpeg_gray_accepts_progressive(self):
        img = np.arange(64, dtype=np.uint8).reshape(8, 8)
        assert decode_jpeg_gray(
            encode_jpeg_progressive(img, al=1)
        ).shape == (8, 8)

    def test_media_dispatch(self):
        from economic_data_etl_spark.operators.codecs import decode_media

        img = np.arange(64, dtype=np.uint8).reshape(8, 8)
        res = decode_media(encode_jpeg_progressive(img))
        assert res["format"] == "jpeg"

    def test_mixed_frames_rejected(self):
        img = np.arange(64, dtype=np.uint8).reshape(8, 8)
        payload = bytearray(encode_jpeg_progressive(img))
        i = bytes(payload).find(b"\xff\xc2")
        payload[i + 1] = 0xC0  # claim baseline; later scans stay
        # progressive-shaped — must fail as data, not crash
        from economic_data_etl_spark.operators.codecs import (
            try_decode_media,
        )

        try_decode_media(bytes(payload))  # must not raise

    def test_mutations_never_escape_try_decode(self):
        from economic_data_etl_spark.operators.codecs import (
            try_decode_media,
        )

        rng = np.random.default_rng(5)
        img = rng.integers(0, 256, size=(24, 16)).astype(np.uint8)
        payload = bytearray(encode_jpeg_progressive(img, al=1))
        for pos in range(0, len(payload), 3):
            mutated = bytearray(payload)
            mutated[pos] ^= 0x5A
            try_decode_media(bytes(mutated))  # None or data — no raise
        # truncations at every length
        for cut in range(2, len(payload), 5):
            try_decode_media(bytes(payload[:cut]))


class TestProgressiveRestartIntervals:
    @pytest.mark.parametrize("ri", [1, 3, 5])
    @pytest.mark.parametrize("al", [0, 1, 2])
    def test_gray_equals_no_restart(self, ri, al):
        rng = np.random.default_rng(ri * 10 + al)
        img = rng.integers(0, 256, size=(33, 41)).astype(np.uint8)
        a = decode_jpeg(encode_jpeg_progressive(img, al=al))
        b = decode_jpeg(
            encode_jpeg_progressive(img, al=al, restart_interval=ri)
        )
        assert (a == b).all()

    @pytest.mark.parametrize("subsample", [False, True, "422", "440"])
    def test_color_equals_baseline(self, subsample):
        rng = np.random.default_rng(hash(str(subsample)) % 97)
        img = rng.integers(0, 256, size=(25, 41, 3)).astype(np.uint8)
        base = decode_jpeg(encode_jpeg_color(img, subsample=subsample))
        prog = decode_jpeg(
            encode_jpeg_progressive(
                img, subsample=subsample, al=1, restart_interval=2
            )
        )
        assert (base == prog).all()

    def test_corrupt_rst_sequence_is_data_not_crash(self):
        from economic_data_etl_spark.operators.codecs import (
            try_decode_media,
        )

        rng = np.random.default_rng(23)
        img = rng.integers(0, 256, size=(24, 24)).astype(np.uint8)
        payload = bytearray(
            encode_jpeg_progressive(img, al=1, restart_interval=1)
        )
        i = bytes(payload).find(b"\xff\xd0")
        assert i >= 0
        payload[i + 1] = 0xD6  # out-of-sequence restart number
        with pytest.raises(ValueError):
            decode_jpeg(bytes(payload))
        assert try_decode_media(bytes(payload)) is None
        # and mutations anywhere never escape the per-row contract
        for pos in range(0, len(payload), 6):
            mutated = bytearray(payload)
            mutated[pos] ^= 0xA5
            try_decode_media(bytes(mutated))
