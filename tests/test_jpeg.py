"""Baseline JPEG codec (operators/jpeg.py): the encoder certifies the
decoder, and an INDEPENDENT straight-from-the-math reference certifies
the entropy layer — if the Huffman bits, DC prediction, zigzag, or
byte stuffing drop or shift a single coefficient, the decoded levels
stop matching the reference's direct DCT/quantization arithmetic.

The cross-engine closed-form certification (block-constant subspace,
DC-only path) lives in the catalog query multimodal_jpeg_decode; this
module covers the general path the oracle can't express."""

from __future__ import annotations

import numpy as np
import pytest

from economic_data_etl_spark.operators.jpeg import (
    QTAB,
    ROUND_BIAS,
    _M,
    _ZIGZAG,
    block_constant_pattern,
    decode_jpeg_gray,
    encode_jpeg_gray,
    expected_constant_decode,
)


def reference_decode_of_encode(img: np.ndarray) -> np.ndarray:
    """What decode(encode(img)) must equal, derived by direct matrix
    math (pad → DCT → biased-round quantize → dequantize → IDCT →
    biased-round pixels → crop) with NO shared code with the entropy
    coder — the Huffman/zigzag/stuffing layers must be exactly
    transparent for this to match."""
    h, w = img.shape
    bh, bw = (h + 7) // 8, (w + 7) // 8
    padded = np.empty((bh * 8, bw * 8))
    padded[:h, :w] = img
    padded[h:, :w] = img[h - 1 : h, :]
    padded[:, w:] = padded[:, w - 1 : w]
    out = np.zeros_like(padded)
    for by in range(bh):
        for bx in range(bw):
            blk = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
            levels = np.floor((_M @ blk @ _M.T) / QTAB + 0.5 + ROUND_BIAS)
            rec = _M.T @ (levels * QTAB) @ _M
            out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = np.clip(
                np.floor(rec + 128.5 + ROUND_BIAS), 0, 255
            )
    return out[:h, :w].astype(np.uint8)


class TestJpegRoundTrip:
    @pytest.mark.parametrize(
        "shape", [(8, 8), (16, 24), (17, 23), (1, 1), (79, 79)]
    )
    def test_random_images_match_independent_reference(self, shape):
        rng = np.random.default_rng(hash(shape) % 2**32)
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        dec = decode_jpeg_gray(encode_jpeg_gray(img))
        assert dec.shape == img.shape
        assert (dec == reference_decode_of_encode(img)).all()

    def test_adversarial_values(self):
        for img in (
            np.full((11, 13), 255, np.uint8),
            np.zeros((11, 13), np.uint8),
            (np.indices((16, 16)).sum(0) % 2 * 255).astype(np.uint8),
        ):
            dec = decode_jpeg_gray(encode_jpeg_gray(img))
            assert (dec == reference_decode_of_encode(img)).all()

    def test_zrl_long_zero_runs(self):
        # a block whose only nonzero AC sits deep in the zigzag order
        # forces ZRL (16-zero-run) symbols through the entropy coder
        for zz_idx in (20, 40, 63):
            r, c = _ZIGZAG[zz_idx]
            F = np.zeros((8, 8))
            F[r, c] = 3 * QTAB[r, c]
            blk = np.clip(
                np.floor(_M.T @ F @ _M + 128.5 + ROUND_BIAS), 0, 255
            ).astype(np.uint8)
            dec = decode_jpeg_gray(encode_jpeg_gray(blk))
            assert (dec == reference_decode_of_encode(blk)).all()

    def test_block_constant_closed_form(self):
        # the catalog query's contract, pinned locally: every decoded
        # pixel equals the closed-form constant-block formula
        for d in (0, 7, 123, 64 * 9 + 3, 4095):
            w, h = 16 + d % 64, 16 + (d // 64) % 64
            img = block_constant_pattern(d, w, h)
            dec = decode_jpeg_gray(encode_jpeg_gray(img))
            bx = np.arange(w) // 8
            by = np.arange(h) // 8
            cgrid = (bx[None, :] + 2 * by[:, None] + d) % 256
            want = np.vectorize(expected_constant_decode)(cgrid)
            assert (dec == want).all()

    def test_dc_prediction_spans_blocks(self):
        # strictly increasing block constants → every DC diff nonzero,
        # positive and negative magnitudes both exercised
        img = np.repeat(
            np.repeat(np.arange(16, dtype=np.uint8).reshape(4, 4) * 16, 8, 0),
            8,
            1,
        )
        dec = decode_jpeg_gray(encode_jpeg_gray(img))
        assert (dec == reference_decode_of_encode(img)).all()


class TestJpegColor:
    @staticmethod
    def _reference_color(img: np.ndarray, subsample) -> np.ndarray:
        """Independent math reference for the color pipeline: color
        transform → per-layout chroma reduction → per-plane
        DCT/quant/dequant/IDCT → replicate-upsample → inverse
        transform, sharing only the pinned constants and reduction
        helpers with the codec, never its entropy coder or MCU walk."""
        from economic_data_etl_spark.operators.jpeg import (
            QTAB_CHROMA,
            _SUBSAMPLE_MODES,
            _pad_to,
            chroma_planes,
            rgb_to_ycbcr,
            ycbcr_to_rgb,
        )

        yh, yv = _SUBSAMPLE_MODES[subsample]
        h, w, _ = img.shape
        ycc = rgb_to_ycbcr(img)
        yp = ycc[:, :, 0].astype(np.float64)
        cb, cr = chroma_planes(ycc, yh, yv)
        cb, cr = cb.astype(np.float64), cr.astype(np.float64)
        mcu_h, mcu_w = 8 * yv, 8 * yh
        mh, mw = (h + mcu_h - 1) // mcu_h, (w + mcu_w - 1) // mcu_w

        def codec_plane(plane, ph, pw, q):
            p = _pad_to(plane, ph, pw)
            out = np.zeros((ph, pw))
            for by in range(ph // 8):
                for bx in range(pw // 8):
                    blk = p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                    lv = np.floor(
                        (_M @ blk @ _M.T) / q + 0.5 + ROUND_BIAS
                    )
                    rec = _M.T @ (lv * q) @ _M
                    out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = np.clip(
                        np.floor(rec + 128.5 + ROUND_BIAS), 0, 255
                    )
            return out

        ydec = codec_plane(yp, mh * mcu_h, mw * mcu_w, QTAB)[:h, :w]
        cbd = codec_plane(cb, mh * 8, mw * 8, QTAB_CHROMA)
        crd = codec_plane(cr, mh * 8, mw * 8, QTAB_CHROMA)
        ch, cw = (h + yv - 1) // yv, (w + yh - 1) // yh
        cbd = np.repeat(np.repeat(cbd[:ch, :cw], yv, 0), yh, 1)[:h, :w]
        crd = np.repeat(np.repeat(crd[:ch, :cw], yv, 0), yh, 1)[:h, :w]
        return ycbcr_to_rgb(
            np.stack([ydec, cbd, crd], 2).astype(np.uint8)
        )

    @pytest.mark.parametrize("subsample", [False, True, "422", "440"])
    @pytest.mark.parametrize(
        "shape", [(8, 8), (16, 16), (17, 23), (33, 47), (1, 1)]
    )
    def test_color_matches_independent_reference(self, shape, subsample):
        from economic_data_etl_spark.operators.jpeg import (
            decode_jpeg,
            encode_jpeg_color,
        )

        rng = np.random.default_rng(sum(shape) * 2 + hash(str(subsample)) % 97)
        img = rng.integers(0, 256, size=(*shape, 3), dtype=np.uint8)
        dec = decode_jpeg(encode_jpeg_color(img, subsample=subsample))
        assert dec.shape == img.shape
        assert (dec == self._reference_color(img, subsample)).all()

    def test_smooth_gradient_reconstructs_closely(self):
        # behaves like a real image codec: low-frequency content
        # survives quantization nearly intact
        from economic_data_etl_spark.operators.jpeg import (
            decode_jpeg,
            encode_jpeg_color,
        )

        x, y = np.meshgrid(np.arange(32), np.arange(32))
        img = np.stack(
            [(x * 4) % 256, (y * 4) % 256, np.full_like(x, 128)], axis=2
        ).astype(np.uint8)
        for sub in (False, True):
            dec = decode_jpeg(encode_jpeg_color(img, subsample=sub))
            err = np.abs(dec.astype(int) - img.astype(int)).mean()
            assert err < 4.0, err

    def test_grayscale_entry_rejects_color(self):
        from economic_data_etl_spark.operators.jpeg import (
            encode_jpeg_color,
        )

        img = np.zeros((8, 8, 3), np.uint8)
        with pytest.raises(ValueError):
            decode_jpeg_gray(encode_jpeg_color(img))


class TestJpegRobustness:
    def test_profile_gates_raise_not_implemented(self):
        payload = bytearray(encode_jpeg_gray(np.zeros((8, 8), np.uint8)))
        # flip SOF0 (0xC0) to SOF5 (0xC5, hierarchical) — the
        # remaining capability gate now that SOF2 (progressive),
        # SOF9 (arithmetic sequential) and SOF3 (lossless) decode
        # for real
        idx = bytes(payload).find(b"\xff\xc0")
        payload[idx + 1] = 0xC5
        with pytest.raises(NotImplementedError):
            decode_jpeg_gray(bytes(payload))

    def test_sof1_extended_sequential_decodes_as_baseline(self):
        # SOF1 at 8-bit precision is structurally identical to SOF0;
        # real-world encoders emit it, so the decoder must accept it
        rng = np.random.default_rng(4)
        img = rng.integers(0, 256, (19, 27), np.uint8)
        payload = bytearray(encode_jpeg_gray(img))
        base = decode_jpeg_gray(bytes(payload))
        idx = bytes(payload).find(b"\xff\xc0")
        payload[idx + 1] = 0xC1
        assert np.array_equal(decode_jpeg_gray(bytes(payload)), base)

    def test_truncation_and_garbage_raise_value_error(self):
        good = encode_jpeg_gray(np.zeros((16, 16), np.uint8))
        with pytest.raises(ValueError):
            decode_jpeg_gray(good[: len(good) // 2])
        with pytest.raises(ValueError):
            decode_jpeg_gray(b"\x00" * 40)

    def test_corrupt_bytes_never_escape_try_decode(self):
        from economic_data_etl_spark.operators.codecs import (
            try_decode_media,
        )

        payload = bytearray(
            encode_jpeg_gray(block_constant_pattern(3, 24, 16))
        )
        assert try_decode_media(bytes(payload)) is not None
        for pos in range(0, len(payload), 5):
            mutated = bytearray(payload)
            mutated[pos] ^= 0xFF
            try_decode_media(bytes(mutated))  # must not raise

    def test_dispatch_through_decode_media(self):
        from economic_data_etl_spark.operators.codecs import decode_media

        img = block_constant_pattern(5, 32, 24)
        m = decode_media(encode_jpeg_gray(img))
        assert m["format"] == "jpeg"
        assert m["data"].shape == img.shape


class TestRestartIntervals:
    """DRI/RST (T.81 restart intervals): byte-aligned RSTn markers
    every Ri MCUs with DC prediction reset — present in most camera
    JPEGs, so the decoder must consume them for real."""

    @pytest.mark.parametrize("ri", [1, 2, 5, 7])
    def test_gray_decode_identical_to_no_restart(self, ri):
        rng = np.random.default_rng(ri)
        img = rng.integers(0, 256, size=(33, 41)).astype(np.uint8)
        a = decode_jpeg_gray(encode_jpeg_gray(img))
        b = decode_jpeg_gray(encode_jpeg_gray(img, restart_interval=ri))
        assert (a == b).all()

    @pytest.mark.parametrize("subsample", [False, True, "422", "440"])
    def test_color_decode_identical_to_no_restart(self, subsample):
        from economic_data_etl_spark.operators.jpeg import (
            decode_jpeg,
            encode_jpeg_color,
        )

        rng = np.random.default_rng(11)
        img = rng.integers(0, 256, size=(33, 41, 3)).astype(np.uint8)
        a = decode_jpeg(encode_jpeg_color(img, subsample=subsample))
        b = decode_jpeg(
            encode_jpeg_color(img, subsample=subsample, restart_interval=3)
        )
        assert (a == b).all()

    def test_out_of_sequence_restart_is_value_error(self):
        img = np.arange(25 * 24, dtype=np.uint8).reshape(25, 24) % 256
        payload = bytearray(encode_jpeg_gray(img, restart_interval=2))
        # corrupt the first RST marker's number (D0 -> D5)
        i = bytes(payload).find(b"\xff\xd0")
        assert i >= 0
        payload[i + 1] = 0xD5
        with pytest.raises(ValueError):
            decode_jpeg_gray(bytes(payload))
        from economic_data_etl_spark.operators.codecs import (
            try_decode_media,
        )

        assert try_decode_media(bytes(payload)) is None

    def test_restart_mutations_never_escape_try_decode(self):
        from economic_data_etl_spark.operators.codecs import (
            try_decode_media,
        )

        rng = np.random.default_rng(13)
        img = rng.integers(0, 256, size=(24, 24)).astype(np.uint8)
        payload = bytearray(encode_jpeg_gray(img, restart_interval=1))
        for pos in range(0, len(payload), 4):
            mutated = bytearray(payload)
            mutated[pos] ^= 0xFF
            try_decode_media(bytes(mutated))  # must not raise


class TestTokenWriterEquivalence:
    """_TokenWriter (deferred vectorized packing) must be BITWISE
    identical to _BitWriter on arbitrary token streams with restarts
    interleaved — byte stuffing, 1-padding alignment, RSTn placement
    and all."""

    def test_random_token_streams_match(self):
        import numpy as np

        from economic_data_etl_spark.operators.jpeg import (
            _BitWriter,
            _TokenWriter,
        )

        rng = np.random.default_rng(5)
        for trial in range(30):
            bw, tw = _BitWriter(), _TokenWriter()
            for _ in range(rng.integers(1, 400)):
                op = rng.integers(0, 12)
                if op == 0:
                    n = int(rng.integers(0, 8))
                    bw.restart(n)
                    tw.restart(n)
                else:
                    length = int(rng.integers(1, 17))
                    value = int(rng.integers(0, 1 << length))
                    bw.write(value, length)
                    tw.write(value, length)
            assert bw.flush() == tw.flush(), trial

    def test_all_ones_stuffing_storm(self):
        # maximal-0xFF stream: every byte needs stuffing, including
        # the 1-padded tail
        from economic_data_etl_spark.operators.jpeg import (
            _BitWriter,
            _TokenWriter,
        )

        bw, tw = _BitWriter(), _TokenWriter()
        for _ in range(10):
            bw.write(0xFFFF, 16)
            tw.write(0xFFFF, 16)
        bw.write(0x7F, 7)  # forces 1-padding into an 0xFF byte
        tw.write(0x7F, 7)
        assert bw.flush() == tw.flush()

    def test_full_encoders_unchanged(self):
        # the swap must not change a single byte of real encodes
        import numpy as np

        from economic_data_etl_spark.operators.jpeg import (
            _BitWriter,
            encode_jpeg_color,
            encode_jpeg_gray,
        )
        import economic_data_etl_spark.operators.jpeg as jm

        rng = np.random.default_rng(9)
        gray = rng.integers(0, 256, (24, 40)).astype(np.uint8)
        color = rng.integers(0, 256, (24, 40, 3)).astype(np.uint8)
        got = [
            encode_jpeg_gray(gray, restart_interval=3),
            encode_jpeg_color(color),
        ]
        saved = jm._TokenWriter
        jm._TokenWriter = _BitWriter  # force the sequential writer
        try:
            want = [
                encode_jpeg_gray(gray, restart_interval=3),
                encode_jpeg_color(color),
            ]
        finally:
            jm._TokenWriter = saved
        assert got == want


class TestBatchedTransformIdentity:
    """The batched DCT/IDCT (one broadcast matmul over every block)
    must be BITWISE identical to the scalar per-block path — numpy
    dispatches the same 8x8 dgemm per slice, and the quantize/round/
    clip steps are elementwise. A single ulp of drift could flip a
    _round_half_up boundary and change encoded bytes."""

    def test_quant_levels_batch_equals_scalar(self):
        import numpy as np

        from economic_data_etl_spark.operators.jpeg import (
            _M,
            _quant_levels_plane,
            _round_half_up,
            QTAB,
            QTAB_CHROMA,
        )

        rng = np.random.default_rng(11)
        for qtab in (QTAB, QTAB_CHROMA):
            plane = rng.uniform(0, 255, size=(40, 56))
            got = _quant_levels_plane(plane, qtab)
            for by in range(5):
                for bx in range(7):
                    block = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                    coeff = _M @ (block - 128.0) @ _M.T
                    want = _round_half_up(coeff / qtab).astype(np.int64)
                    assert np.array_equal(got[by, bx], want)

    def test_idct_pixels_batch_equals_scalar(self):
        import numpy as np

        from economic_data_etl_spark.operators.jpeg import (
            _M,
            _idct_pixels_batch,
            _round_half_up,
            QTAB,
        )

        rng = np.random.default_rng(12)
        levels = rng.integers(-80, 80, size=(64, 8, 8)).astype(np.int64)
        got = _idct_pixels_batch(levels, QTAB)
        for i, lv in enumerate(levels):
            block = _M.T @ (lv * QTAB).astype(np.float64) @ _M
            want = np.clip(_round_half_up(block + 128.0), 0, 255).astype(
                np.uint8
            )
            assert np.array_equal(got[i], want)


class TestTableDrivenReaderIdentity:
    """The round-13 table-driven bit reader (segment pre-unstuffing +
    16-bit canonical-code LUT, jpeg._split_entropy/_bit_windows/
    _decode_mcu_run) must decode bit-identically to the retired
    byte-at-a-time reader. The sha256 below fingerprints decoded
    pixels over a matrix spanning gray/color, every supported chroma
    layout, restart intervals, progressive scans at Al 0..2, all
    seven lossless predictors, and both arithmetic modes; it was
    computed on the pre-rewrite implementation and must never move."""

    FINGERPRINT = (
        "979d05eb79b5075d994a2e55fec2f06e"
        "4461ccb48350da22c527ddb403be2ff1"
    )

    def test_decode_fingerprint_pinned(self):
        import hashlib

        import economic_data_etl_spark.operators.jpeg as J
        import economic_data_etl_spark.operators.jpeg_arithmetic as A
        import economic_data_etl_spark.operators.jpeg_lossless as L
        import economic_data_etl_spark.operators.jpeg_progressive as P
        from economic_data_etl_spark.operators.codecs import gray_pattern

        h_ = hashlib.sha256()

        def add(arr):
            h_.update(np.ascontiguousarray(arr).tobytes())
            h_.update(str(arr.shape).encode())

        for seed in range(6):
            r = np.random.default_rng(seed)
            hh, ww = int(r.integers(8, 70)), int(r.integers(8, 70))
            g = r.integers(0, 256, (hh, ww), np.uint8)
            c = r.integers(0, 256, (hh, ww, 3), np.uint8)
            for ri in (0, 1, 3, 7):
                add(J.decode_jpeg(J.encode_jpeg_gray(g, restart_interval=ri)))
            for ss in (False, True, "422", "440"):
                add(
                    J.decode_jpeg(
                        J.encode_jpeg_color(
                            c, subsample=ss, restart_interval=seed % 4
                        )
                    )
                )
            for al in (0, 1, 2):
                add(
                    J.decode_jpeg(
                        P.encode_jpeg_progressive(
                            g, al=al, restart_interval=seed % 3
                        )
                    )
                )
                add(
                    J.decode_jpeg(
                        P.encode_jpeg_progressive(c, subsample=True, al=al)
                    )
                )
            for pred in range(1, 8):
                add(
                    J.decode_jpeg(
                        L.encode_jpeg_lossless(
                            g, pred, restart_interval=(seed * 3) % 9
                        )
                    )
                )
            add(
                J.decode_jpeg(
                    L.encode_jpeg_lossless(
                        c, 1 + seed % 7, restart_interval=2
                    )
                )
            )
            add(J.decode_jpeg(A.encode_jpeg_arith_gray(g, restart_interval=seed % 3)))
            add(J.decode_jpeg(A.encode_jpeg_arith_color(c, subsample=True)))
        for d in range(0, 4000, 333):
            w = 16 + d % 64
            add(
                J.decode_jpeg(
                    L.encode_jpeg_lossless(
                        gray_pattern(d),
                        predictor=1 + d % 7,
                        restart_interval=(d % 3) * w,
                    )
                )
            )
        assert h_.hexdigest() == self.FINGERPRINT
