"""Real-codec round-trips (operators/codecs.py): the encoder exists to
certify the decoder — every byte pattern it can emit must decode back
to the closed-form source arrays exactly. No Spark needed here; the
Spark-side plumbing is certified by the cross-engine catalog query
multimodal_real_pixel_decode."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from economic_data_etl_spark.operators.codecs import (
    audio_pattern,
    build_full_media,
    decode_bmp,
    decode_media,
    decode_png,
    decode_wav,
    encode_bmp,
    encode_png,
    encode_wav,
    image_pattern,
    png_palette,
    try_decode_media,
)


class TestPngRoundTrip:
    @pytest.mark.parametrize("doc_id", [0, 3, 63, 64 * 7 + 3, 4095])
    def test_truecolor_all_filters(self, doc_id):
        # every image is >= 16 rows tall, so rows cycle through ALL
        # five filter types (y % 5) — None/Sub/Up/Average/Paeth each
        # reconstruct exactly.
        img = image_pattern(doc_id)
        out = decode_png(encode_png(img))
        assert out.shape == img.shape
        assert (out == img).all()

    def test_grayscale(self):
        rng = np.random.default_rng(11)
        img = rng.integers(0, 256, size=(23, 31), dtype=np.uint8)
        out = decode_png(encode_png(img))
        assert out.shape == (23, 31)
        assert (out == img).all()

    def test_adversarial_values(self):
        # wraparound-heavy content: constant 255s, zeros, and a
        # checkerboard stress the mod-256 arithmetic in every filter.
        for img in (
            np.full((11, 7, 3), 255, np.uint8),
            np.zeros((11, 7, 3), np.uint8),
            (np.indices((11, 7)).sum(0) % 2 * 255)
            .astype(np.uint8)[:, :, None]
            .repeat(3, axis=2),
        ):
            assert (decode_png(encode_png(img)) == img).all()

    def test_illegal_depth_color_combo_raises_value_error(self):
        # depth-4 TRUECOLOR is not a legal PNG profile (sub-byte is
        # gray/palette only per the spec) — corrupt data, ValueError;
        # PNG has no NotImplementedError gates left
        img = image_pattern(1)
        payload = bytearray(encode_png(img))
        payload[8 + 8 + 8] = 4
        with pytest.raises(ValueError):
            decode_png(bytes(payload))

    @pytest.mark.parametrize("interlace", [False, True])
    @pytest.mark.parametrize("depth", [1, 2, 4])
    def test_subbyte_gray_and_palette(self, depth, interlace):
        rng = np.random.default_rng(depth * 10 + interlace)
        img = rng.integers(0, 1 << depth, size=(23, 31), dtype=np.uint8)
        out = decode_png(encode_png(img, interlace=interlace, depth=depth))
        assert out.shape == img.shape and (out == img).all()
        idx = rng.integers(0, 1 << depth, size=(13, 19), dtype=np.uint8)
        out = decode_png(
            encode_png(
                idx, palette=png_palette(), interlace=interlace,
                depth=depth,
            )
        )
        assert (out == png_palette()[idx]).all()

    @pytest.mark.parametrize("interlace", [False, True])
    @pytest.mark.parametrize("dtype", [np.uint8, np.uint16])
    @pytest.mark.parametrize(
        "shape", [(23, 31), (23, 31, 2), (23, 31, 3), (23, 31, 4), (1, 1)]
    )
    def test_full_profile_matrix(self, shape, dtype, interlace):
        # 8/16-bit × gray/gray+alpha/RGB/RGBA × plain/Adam7 — every
        # combination round-trips exactly (16-bit samples big-endian;
        # Adam7 passes carry their own filter sequences)
        rng = np.random.default_rng(sum(shape) + interlace)
        hi = 256 if dtype == np.uint8 else 65536
        img = rng.integers(0, hi, size=shape, dtype=dtype)
        out = decode_png(encode_png(img, interlace=interlace))
        want = img[:, :, 0] if img.ndim == 3 and shape[2] == 1 else img
        assert out.shape == want.shape and out.dtype == want.dtype
        assert (out == want).all()

    def test_interlaced_file_differs_from_sequential(self):
        img = image_pattern(7)
        assert encode_png(img, interlace=True) != encode_png(img)

    @pytest.mark.parametrize("doc_id", [4, 10, 64 * 9 + 4])
    def test_palette_roundtrip(self, doc_id):
        from economic_data_etl_spark.operators.codecs import (
            gray_pattern,
            png_palette,
        )

        idx = gray_pattern(doc_id)
        out = decode_png(encode_png(idx, palette=png_palette()))
        want = png_palette()[idx]
        assert out.shape == want.shape
        assert (out == want).all()
        # channels genuinely differ — the indirection is observable
        assert (want[:, :, 0] != want[:, :, 1]).any()

    def test_palette_png_without_plte_raises(self):
        from economic_data_etl_spark.operators.codecs import (
            gray_pattern,
            png_palette,
        )

        payload = bytearray(encode_png(gray_pattern(4), palette=png_palette()))
        # excise the PLTE chunk (starts right after IHDR's 25 bytes)
        plte_start = 8 + 25
        plte_len = 12 + 256 * 3
        del payload[plte_start : plte_start + plte_len]
        with pytest.raises(ValueError):
            decode_png(bytes(payload))


class TestBmpRoundTrip:
    def test_padded_stride(self):
        # w=17 → 51 data bytes per row, padded to 52: the padding and
        # BGR order must both be undone.
        rng = np.random.default_rng(7)
        img = rng.integers(0, 256, size=(9, 17, 3), dtype=np.uint8)
        out = decode_bmp(encode_bmp(img))
        assert (out == img).all()

    def test_top_down_rows(self):
        # negative height = top-down storage; decoder must not flip.
        img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
        payload = bytearray(encode_bmp(img[::-1]))  # rows pre-flipped
        struct.pack_into("<i", payload, 22, -2)  # height := -2
        out = decode_bmp(bytes(payload))
        assert (out == img).all()


class TestWavRoundTrip:
    @pytest.mark.parametrize("doc_id", [2, 5, 101])
    def test_pcm16(self, doc_id):
        samples = audio_pattern(doc_id)
        rate, out = decode_wav(encode_wav(samples, rate=16000))
        assert rate == 16000
        assert out.shape == (samples.size, 1)
        assert (out[:, 0] == samples).all()

    def test_float32_pcm(self):
        from economic_data_etl_spark.operators.codecs import decode_wav

        s = (np.sin(np.arange(300) / 9)).astype("<f4")
        fmt = struct.pack("<IHHIIHH", 16, 3, 1, 48000, 48000 * 4, 4, 32)
        wav = (
            b"RIFF"
            + struct.pack("<I", 36 + s.nbytes)
            + b"WAVE"
            + b"fmt "
            + fmt
            + b"data"
            + struct.pack("<I", s.nbytes)
            + s.tobytes()
        )
        rate, out = decode_wav(wav)
        assert rate == 48000 and out.dtype == np.float32
        assert (out[:, 0] == s).all()

    def test_extra_chunk_between_fmt_and_data(self):
        samples = audio_pattern(8)
        payload = encode_wav(samples, rate=8000)
        # splice a LIST chunk after fmt (ends at byte 36)
        extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
        spliced = payload[:36] + extra + payload[36:]
        rate, out = decode_wav(spliced)
        assert rate == 8000 and (out[:, 0] == samples).all()


class TestGifLzw:
    def test_lzw_roundtrip_with_dictionary_resets(self):
        from economic_data_etl_spark.operators.codecs import (
            _lzw_compress,
            _lzw_decompress,
        )

        rng = np.random.default_rng(3)
        # long enough that the 4096-entry dictionary resets mid-stream
        data = rng.integers(0, 256, size=20000, dtype=np.uint8).tobytes()
        assert _lzw_decompress(_lzw_compress(data, 8), 8) == data

    def test_lzw_kwkwk_corner(self):
        from economic_data_etl_spark.operators.codecs import (
            _lzw_compress,
            _lzw_decompress,
        )

        # runs of one symbol hit the code-one-past-table-end case
        data = b"\x01" * 500 + b"\x02\x01" * 200
        assert _lzw_decompress(_lzw_compress(data, 8), 8) == data

    def test_gif_roundtrip(self):
        from economic_data_etl_spark.operators.codecs import (
            decode_gif,
            encode_gif_gray,
            gray_pattern,
        )

        img = gray_pattern(302)
        out = decode_gif(encode_gif_gray(img))
        assert out.shape == (*img.shape, 3)
        assert (out == img[:, :, None]).all()  # gray palette: i -> (i,i,i)

    @pytest.mark.parametrize("doc_id", [5, 11, 64 * 5 + 5])
    def test_interlaced_gif_roundtrip(self, doc_id):
        from economic_data_etl_spark.operators.codecs import (
            decode_gif,
            encode_gif_gray,
            gray_pattern,
        )

        img = gray_pattern(doc_id)
        out = decode_gif(encode_gif_gray(img, interlace=True))
        assert (out == img[:, :, None]).all()
        # the interlaced FILE genuinely differs from the sequential one
        # (rows are transmitted in 4-pass order), so the equality above
        # proves the decoder un-permuted, not that interlace was a no-op
        assert encode_gif_gray(img, interlace=True) != encode_gif_gray(img)

    @pytest.mark.parametrize("h", [1, 2, 3, 7, 8, 9, 16, 79])
    def test_interlace_order_is_a_permutation(self, h):
        from economic_data_etl_spark.operators.codecs import (
            _gif_interlace_order,
        )

        order = _gif_interlace_order(h)
        assert sorted(order.tolist()) == list(range(h))


class TestUntrustedBytesBudget:
    """A corpus decoder runs on untrusted payloads: header-declared
    sizes must be capped BEFORE any allocation, and compressed streams
    must inflate under a hard output bound — a malicious/corrupt file
    fails fast with ValueError, never an executor OOM."""

    def test_png_huge_declared_dims_fail_fast(self):
        import struct as _s

        payload = bytearray(encode_png(image_pattern(1)))
        # IHDR w/h live at offset 16/20; declare 65535x65535
        _s.pack_into(">II", payload, 16, 65535, 65535)
        with pytest.raises(ValueError):
            decode_png(bytes(payload))

    def test_png_zip_bomb_idat_is_bounded(self):
        import struct as _s
        import zlib as _z

        # a 16x16 gray PNG whose IDAT inflates to ~50 MB of zeros:
        # must be rejected by the exact-size check without ever
        # materializing the bomb
        bomb = _z.compress(b"\x00" * (50 * 1024 * 1024), 9)

        def chunk(typ, data):
            return (
                _s.pack(">I", len(data)) + typ + data
                + _s.pack(">I", _z.crc32(typ + data))
            )

        payload = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", _s.pack(">IIBBBBB", 16, 16, 8, 0, 0, 0, 0))
            + chunk(b"IDAT", bomb)
            + chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError):
            decode_png(payload)

    def test_jpeg_huge_declared_dims_fail_fast(self):
        import struct as _s

        import numpy as np

        from economic_data_etl_spark.operators.jpeg import (
            decode_jpeg,
            encode_jpeg_gray,
        )

        payload = bytearray(encode_jpeg_gray(np.zeros((8, 8), np.uint8)))
        idx = bytes(payload).find(b"\xff\xc0")
        _s.pack_into(">HH", payload, idx + 5, 65535, 65535)
        with pytest.raises(ValueError):
            decode_jpeg(bytes(payload))

    def test_gif_huge_declared_dims_fail_fast(self):
        import struct as _s

        from economic_data_etl_spark.operators.codecs import (
            decode_gif,
            encode_gif_gray,
            gray_pattern,
        )

        payload = bytearray(encode_gif_gray(gray_pattern(2)))
        # image-descriptor w/h: after header(13) + palette(768) + 0x2c,
        # at offsets +5 and +7 of the descriptor
        base = 13 + 768
        assert payload[base] == 0x2C
        _s.pack_into("<HH", payload, base + 5, 60000, 60000)
        with pytest.raises(ValueError):
            decode_gif(bytes(payload))


class TestG711:
    def test_alaw_code_space_is_bijective(self):
        # the standard's own invariant: compress(expand(code)) == code
        # for the FULL 256-code space
        from economic_data_etl_spark.operators.codecs import (
            alaw_decode,
            alaw_encode,
        )

        codes = np.arange(256, dtype=np.uint8)
        assert (alaw_encode(alaw_decode(codes)) == codes).all()

    def test_mulaw_code_space_folds_only_negative_zero(self):
        from economic_data_etl_spark.operators.codecs import (
            mulaw_decode,
            mulaw_encode,
        )

        codes = np.arange(256, dtype=np.uint8)
        rt = mulaw_encode(mulaw_decode(codes))
        bad = codes[rt != codes]
        # 0x7F is mu-law's negative zero: it expands to 0, which
        # re-encodes as positive zero 0xFF — the standard's known fold
        assert bad.tolist() == [0x7F]

    def test_known_reference_values(self):
        from economic_data_etl_spark.operators.codecs import (
            alaw_decode,
            mulaw_decode,
        )

        assert mulaw_decode(np.array([0x00], np.uint8))[0] == -32124
        assert mulaw_decode(np.array([0xFF], np.uint8))[0] == 0
        assert alaw_decode(np.array([0x55], np.uint8))[0] == -8
        assert alaw_decode(np.array([0xD5], np.uint8))[0] == 8

    def test_quantization_error_bounded(self):
        from economic_data_etl_spark.operators.codecs import (
            alaw_decode,
            alaw_encode,
            mulaw_decode,
            mulaw_encode,
        )

        x = np.arange(-32000, 32000, 7).astype(np.int16)
        for enc, dec in (
            (mulaw_encode, mulaw_decode),
            (alaw_encode, alaw_decode),
        ):
            err = np.abs(dec(enc(x)).astype(int) - x.astype(int))
            rel = err / np.maximum(np.abs(x.astype(int)), 256)
            assert rel.max() < 0.07  # ~4-bit mantissa resolution

    def test_wav_container_roundtrip(self):
        from economic_data_etl_spark.operators.codecs import (
            alaw_decode,
            alaw_encode,
            decode_wav,
            encode_wav_g711,
            mulaw_decode,
            mulaw_encode,
        )

        s = ((np.arange(500) * 37) % 1024 - 512).astype(np.int16)
        for law, enc, dec in (
            ("mulaw", mulaw_encode, mulaw_decode),
            ("alaw", alaw_encode, alaw_decode),
        ):
            rate, out = decode_wav(encode_wav_g711(s, 8000, law))
            assert rate == 8000
            assert (out[:, 0] == dec(enc(s))).all()


class TestImaAdpcm:
    def test_wav_container_roundtrip(self):
        from economic_data_etl_spark.operators.codecs import (
            decode_wav,
            encode_wav_adpcm,
            ima_adpcm_decode,
            ima_adpcm_encode,
        )

        s = (6000 * np.sin(np.arange(2000) / 15)).astype(np.int16)
        rate, out = decode_wav(encode_wav_adpcm(s, 16000))
        want = ima_adpcm_decode(ima_adpcm_encode(s), len(s))
        assert rate == 16000 and out.shape == (2000, 1)
        assert (out[:, 0] == want).all()

    def test_tracks_audio_signal(self):
        # ADPCM is a delta coder: on band-limited content it must
        # reconstruct within a reasonable SNR, not just round-trip its
        # own state machine
        from economic_data_etl_spark.operators.codecs import (
            ima_adpcm_decode,
            ima_adpcm_encode,
        )

        t = np.arange(3000)
        sig = (
            8000 * np.sin(t / 20) + 3000 * np.sin(t / 7)
        ).astype(np.int16)
        dec = ima_adpcm_decode(ima_adpcm_encode(sig), len(sig))
        noise = (dec.astype(float) - sig.astype(float)) ** 2
        snr = 10 * np.log10((sig.astype(float) ** 2).mean() / noise.mean())
        assert snr > 20, snr

    @pytest.mark.parametrize("n", [1, 2, 504, 505, 506, 1011])
    def test_block_boundaries_and_odd_lengths(self, n):
        from economic_data_etl_spark.operators.codecs import (
            ima_adpcm_decode,
            ima_adpcm_encode,
        )

        s = (np.arange(n) * 211 % 4096 - 2048).astype(np.int16)
        assert len(ima_adpcm_decode(ima_adpcm_encode(s), n)) == n

    def test_truncated_data_raises(self):
        from economic_data_etl_spark.operators.codecs import (
            ima_adpcm_decode,
            ima_adpcm_encode,
        )

        s = np.zeros(600, np.int16)
        data = ima_adpcm_encode(s)
        with pytest.raises(ValueError):
            ima_adpcm_decode(data[: len(data) // 2], 600)

    def test_stereo_channels_are_independent_mono_streams(self):
        # the standard interleave (4-byte channel words) must decode
        # each channel EXACTLY as its own mono encode — channel state
        # never leaks across the interleave
        from economic_data_etl_spark.operators.codecs import (
            decode_wav,
            encode_wav_adpcm,
            ima_adpcm_decode,
            ima_adpcm_encode,
        )

        t = np.arange(1500)
        left = (8000 * np.sin(t / 20)).astype(np.int16)
        right = (6000 * np.sin(t / 13 + 1)).astype(np.int16)
        stereo = np.stack([left, right], axis=1)
        dec = ima_adpcm_decode(
            ima_adpcm_encode(stereo), len(t), channels=2
        )
        assert (
            dec[:, 0] == ima_adpcm_decode(ima_adpcm_encode(left), len(t))
        ).all()
        assert (
            dec[:, 1]
            == ima_adpcm_decode(ima_adpcm_encode(right), len(t))
        ).all()
        rate, out = decode_wav(encode_wav_adpcm(stereo, 44100))
        assert rate == 44100 and out.shape == (1500, 2)
        assert (out == dec).all()

    @pytest.mark.parametrize("n", [1, 9, 505, 513, 1011])
    def test_stereo_odd_lengths(self, n):
        from economic_data_etl_spark.operators.codecs import (
            ima_adpcm_decode,
            ima_adpcm_encode,
        )

        s = np.stack(
            [
                (np.arange(n) * 211 % 4096 - 2048).astype(np.int16),
                (np.arange(n) * 97 % 4096 - 2048).astype(np.int16),
            ],
            axis=1,
        )
        assert ima_adpcm_decode(
            ima_adpcm_encode(s), n, channels=2
        ).shape == (n, 2)


class TestMjpegAvi:
    def test_gray_frames_roundtrip(self):
        from economic_data_etl_spark.operators.codecs import (
            decode_mjpeg_avi,
            encode_mjpeg_avi,
        )
        from economic_data_etl_spark.operators.jpeg import (
            block_constant_pattern,
            decode_jpeg,
            encode_jpeg_gray,
        )

        frames = [block_constant_pattern(d, 24, 16) for d in (3, 4, 5)]
        dec = decode_mjpeg_avi(encode_mjpeg_avi(frames))
        assert len(dec) == 3
        for got, d in zip(dec, (3, 4, 5)):
            want = decode_jpeg(
                encode_jpeg_gray(block_constant_pattern(d, 24, 16))
            )
            assert (got == want).all()

    def test_color_frames_roundtrip(self):
        from economic_data_etl_spark.operators.codecs import (
            decode_mjpeg_avi,
            encode_mjpeg_avi,
        )

        rng = np.random.default_rng(4)
        frames = [
            rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
            for _ in range(2)
        ]
        dec = decode_mjpeg_avi(encode_mjpeg_avi(frames))
        assert len(dec) == 2 and dec[0].shape == (16, 16, 3)

    def test_non_mjpg_stream_is_a_seam(self):
        # a '00dc' chunk that isn't JPEG = an inter-frame codec: the
        # genuinely library-gated case must raise NotImplementedError,
        # not decode garbage
        from economic_data_etl_spark.operators.codecs import (
            decode_mjpeg_avi,
            encode_mjpeg_avi,
        )
        from economic_data_etl_spark.operators.jpeg import (
            block_constant_pattern,
        )

        payload = bytearray(
            encode_mjpeg_avi([block_constant_pattern(1, 16, 16)])
        )
        idx = bytes(payload).find(b"00dc") + 8
        payload[idx : idx + 2] = b"\x00\x00"  # destroy the SOI marker
        with pytest.raises(NotImplementedError):
            decode_mjpeg_avi(bytes(payload))

    def test_dispatch_and_corruption(self):
        from economic_data_etl_spark.operators.codecs import (
            encode_mjpeg_avi,
        )
        from economic_data_etl_spark.operators.jpeg import (
            block_constant_pattern,
        )

        payload = encode_mjpeg_avi(
            [block_constant_pattern(d, 16, 16) for d in (0, 1)]
        )
        m = decode_media(payload)
        assert m["format"] == "avi" and m["n_frames"] == 2
        assert m["data"].shape == (2, 16, 16)
        assert try_decode_media(payload[: len(payload) // 2]) is None
        for pos in range(0, len(payload), 11):
            mutated = bytearray(payload)
            mutated[pos] ^= 0xFF
            try_decode_media(bytes(mutated))  # must not raise


class TestDispatchAndCorruption:
    def test_build_full_media_cycles_formats(self):
        fmts = [
            decode_media(build_full_media(d))["format"] for d in range(12)
        ]
        assert fmts == ["png", "bmp", "gif", "wav", "png", "gif"] * 2

    def test_decoded_content_matches_closed_form(self):
        from economic_data_etl_spark.operators.codecs import (
            gray_pattern,
            png_palette,
        )

        for d in (0, 1, 2, 3, 4, 5, 300, 301, 302, 303, 304, 305):
            m = decode_media(build_full_media(d))
            k = d % 6
            if k == 3:
                assert (m["data"][:, 0] == audio_pattern(d)).all()
            elif k in (2, 5):
                assert (m["data"] == gray_pattern(d)[:, :, None]).all()
            elif k == 4:
                assert (m["data"] == png_palette()[gray_pattern(d)]).all()
            else:
                assert (m["data"] == image_pattern(d)).all()

    def test_jpeg_decodes_for_real(self):
        # JPEG left the seam in round 6 (operators/jpeg.py): the magic
        # routes to the real decoder, which rejects garbage as a
        # ValueError (corrupt data), not NotImplementedError (missing
        # capability). Non-baseline modes still gate — see
        # tests/test_jpeg.py.
        import numpy as np

        from economic_data_etl_spark.operators.jpeg import (
            encode_jpeg_gray,
        )

        img = np.arange(64, dtype=np.uint8).reshape(8, 8)
        assert decode_media(encode_jpeg_gray(img))["format"] == "jpeg"
        with pytest.raises(ValueError):
            decode_media(b"\xff\xd8\xff\xe0" + b"\x00" * 16)

    def test_corrupt_bytes_are_data_not_exceptions(self):
        good = build_full_media(0)
        assert try_decode_media(good) is not None
        assert try_decode_media(good[: len(good) // 2]) is None  # truncated
        assert try_decode_media(b"\x00" * 40) is None
        # deterministic single-byte corruptions across the payload:
        # try_decode_media must never raise (wrong result is fine for a
        # flipped pixel byte; an exception is not).
        for d in (0, 1, 2, 3, 4, 5):
            payload = bytearray(build_full_media(d))
            for pos in range(0, len(payload), 7):
                mutated = bytearray(payload)
                mutated[pos] ^= 0xFF
                try_decode_media(bytes(mutated))  # must not raise


class TestAdviceRegressionsR7:
    """Deterministic regressions for the round-6 ADVICE findings: each
    crafts the exact corrupt profile that previously escaped
    try_decode_media's never-raises contract."""

    def test_corrupt_dht_dc_category_never_escapes(self):
        # ADVICE r6 (jpeg.py:437): a corrupt DHT can declare a DC
        # magnitude-category symbol > 15; read_bits(size) then built an
        # arbitrarily large int and the int64 level store raised
        # OverflowError, escaping try_decode_media. Corrupt the first
        # DC symbol of a valid JPEG's DHT to 0xC8 (200): the decoder
        # must now fail with ValueError (caught), never OverflowError.
        from economic_data_etl_spark.operators.jpeg import (
            block_constant_pattern,
            encode_jpeg_gray,
        )

        payload = bytearray(
            encode_jpeg_gray(block_constant_pattern(3, 24, 16))
        )
        i = bytes(payload).find(b"\xff\xc4")
        assert i >= 0
        # DHT layout: marker(2) len(2) tc/th(1) counts(16) symbols...
        sym_pos = i + 2 + 2 + 1 + 16
        for bad in (0x10, 0x7F, 0xC8, 0xFF):
            mutated = bytearray(payload)
            mutated[sym_pos] = bad
            assert try_decode_media(bytes(mutated)) is None

    def test_wav_zero_channels_never_escapes(self):
        # ADVICE r6 (codecs.py:633): nChannels=0 in the fmt chunk hit
        # ZeroDivisionError in `arr.size // channels`. The nChannels
        # field is at byte 2 of the fmt body = absolute offset 22.
        payload = bytearray(encode_wav(audio_pattern(1), rate=8000))
        assert payload[12:16] == b"fmt "
        struct.pack_into("<H", payload, 22, 0)
        assert try_decode_media(bytes(payload)) is None
        with pytest.raises(ValueError, match="zero channels"):
            decode_wav(bytes(payload))

    def test_pixel_budget_bounds_decoded_bytes_not_pixels(self):
        # ADVICE r6 (codecs.py:107): the budget was a pixel count, so a
        # 16-bit RGBA PNG (8 B/px) within the pixel ceiling could
        # allocate ~536 MB. 6000x6000x16-bit RGBA = 36 MP (under the
        # old 2^26-pixel cap) but 288 MB decoded — must now fail fast.
        def chunk(typ: bytes, data: bytes) -> bytes:
            import zlib

            return (
                struct.pack(">I", len(data))
                + typ
                + data
                + struct.pack(">I", zlib.crc32(typ + data))
            )

        ihdr = struct.pack(">IIBBBBB", 6000, 6000, 16, 6, 0, 0, 0)
        payload = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", b"\x00" * 10)
            + chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError, match="implausible decode size"):
            decode_png(payload)
        assert try_decode_media(payload) is None
        # same dims at 8-bit gray (1 B/px, 36 MB) stay in budget: the
        # guard must reject on BYTES, not on the raw pixel count —
        # failure here means the ceiling was just lowered across the
        # board instead of scaled by profile.
        from economic_data_etl_spark.operators.codecs import (
            _check_pixel_budget,
        )

        _check_pixel_budget(6000, 6000, bytes_per_pixel=1)
        with pytest.raises(ValueError):
            _check_pixel_budget(6000, 6000, bytes_per_pixel=8)


class TestAnimatedGif:
    """Animated GIF: sub-rect delta frames + transparency + disposal,
    composited for real (decode_gif_frames)."""

    @staticmethod
    def _rgb(frame):
        return np.stack([frame, frame, frame], axis=2)

    def test_delta_roundtrip_reconstructs_full_frames(self):
        from economic_data_etl_spark.operators.codecs import (
            decode_gif_frames,
            encode_gif_animated,
        )

        rng = np.random.default_rng(7)
        h, w = 24, 31
        frames = [rng.integers(1, 256, size=(h, w)).astype(np.uint8)]
        for _ in range(3):
            nxt = frames[-1].copy()
            mask = rng.random((h, w)) < 0.25
            nxt[mask] = rng.integers(1, 256, size=int(mask.sum()))
            frames.append(nxt)
        frames.append(frames[-1].copy())  # identical frame corner
        dec = decode_gif_frames(encode_gif_animated(frames))
        assert len(dec) == len(frames)
        for f, d in zip(frames, dec):
            assert (d == self._rgb(f)).all()

    def test_static_region_never_retransmitted(self):
        # the encoder's bounding rect must exclude the static left half
        from economic_data_etl_spark.operators.codecs import (
            decode_gif_frames,
            encode_gif_animated,
        )

        h, w = 16, 32
        base = (np.arange(h * w).reshape(h, w) % 255 + 1).astype(np.uint8)
        f2 = base.copy()
        f2[:, w // 2 :] = ((base[:, w // 2 :].astype(int) % 255) + 1).astype(
            np.uint8
        )
        payload = encode_gif_animated([base, f2])
        dec = decode_gif_frames(payload)
        assert (dec[1] == self._rgb(f2)).all()
        # second image descriptor's rect must start at the right half;
        # locate it via the GCE that precedes it (raw 0x2c scans can
        # collide with pixel bytes)
        gces = [i for i in range(len(payload) - 1)
                if payload[i] == 0x21 and payload[i + 1] == 0xF9]
        assert len(gces) == 2
        desc = payload[gces[1] + 8 : gces[1] + 17]
        left, top, rw, rh = struct.unpack("<HHHH", desc[1:9])
        assert left == w // 2 and rw == w // 2

    def test_disposal_2_restores_background(self):
        # handcrafted: bg index 5, frame 1 = full canvas, frame 2 =
        # center 2x2 patch with disposal 2, frame 3 = another patch;
        # frame 3's composite must show BACKGROUND where frame 2 drew
        from economic_data_etl_spark.operators.codecs import (
            _gif_lzw_blocks,
            decode_gif_frames,
        )

        w = h = 6
        palette = bytes(v for i in range(256) for v in (i, i, i))
        out = bytearray(
            b"GIF89a" + struct.pack("<HHBBB", w, h, 0xF7, 5, 0) + palette
        )
        full = np.full((h, w), 9, np.uint8)
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out += _gif_lzw_blocks(full.tobytes())
        # GCE disposal=2 then a 2x2 patch of 77 at (2,2)
        out += bytes([0x21, 0xF9, 0x04, 2 << 2, 0, 0, 0, 0x00])
        out += b"\x2c" + struct.pack("<HHHHB", 2, 2, 2, 2, 0)
        out += _gif_lzw_blocks(bytes([77] * 4))
        # final 1x1 patch of 33 at (0,0), no disposal
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, 1, 1, 0)
        out += _gif_lzw_blocks(bytes([33]))
        out += b"\x3b"
        f1, f2, f3 = decode_gif_frames(bytes(out))
        assert (f2[2:4, 2:4] == 77).all()
        assert (f3[2:4, 2:4] == 5).all()  # restored to background
        assert (f3[0, 0] == 33).all()
        assert (f3[4:, 4:] == 9).all()  # untouched canvas survives

    def test_transparent_index_rejected_as_content(self):
        from economic_data_etl_spark.operators.codecs import (
            encode_gif_animated,
        )

        with pytest.raises(ValueError, match="transparent"):
            encode_gif_animated([np.zeros((4, 4), np.uint8)])

    def test_mutations_never_escape_try_decode(self):
        from economic_data_etl_spark.operators.codecs import (
            encode_gif_animated,
        )

        rng = np.random.default_rng(3)
        frames = [
            rng.integers(1, 256, size=(12, 15)).astype(np.uint8)
            for _ in range(3)
        ]
        payload = bytearray(encode_gif_animated(frames))
        for pos in range(0, len(payload), 9):
            mutated = bytearray(payload)
            mutated[pos] ^= 0x3C
            try_decode_media(bytes(mutated))  # must not raise


class TestExtensibleWav:
    def test_extensible_pcm_roundtrip(self):
        from economic_data_etl_spark.operators.codecs import (
            encode_wav_extensible,
        )

        sig = audio_pattern(11)
        rate, arr = decode_wav(encode_wav_extensible(sig, 16000))
        assert rate == 16000
        assert (arr[:, 0] == sig).all()

    def test_bad_subformat_guid_is_a_gate(self):
        from economic_data_etl_spark.operators.codecs import (
            encode_wav_extensible,
        )

        payload = bytearray(encode_wav_extensible(audio_pattern(2), 8000))
        # corrupt a GUID suffix byte (fmt body starts at offset 20;
        # suffix begins at fmt_body[26] -> absolute 46)
        payload[46 + 5] ^= 0xFF
        with pytest.raises(NotImplementedError):
            decode_wav(bytes(payload))
        assert try_decode_media(bytes(payload)) is None
