"""Property-based certification of the from-scratch codecs (hypothesis):
round-trip exactness over ARBITRARY inputs, not just the closed-form
patterns the cross-engine queries use. Complements test_codecs.py /
test_jpeg.py the way test_casts_property.py complements the cast units."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from economic_data_etl_spark.operators.codecs import (
    _lzw_compress,
    _lzw_decompress,
    alaw_decode,
    alaw_encode,
    decode_bmp,
    decode_gif,
    decode_png,
    decode_wav,
    encode_bmp,
    encode_gif_gray,
    encode_png,
    encode_wav,
    ima_adpcm_decode,
    ima_adpcm_encode,
    mulaw_decode,
    mulaw_encode,
)

DIMS = st.integers(min_value=1, max_value=21)


def _image(draw, h, w, ch, dtype):
    hi = 256 if dtype == np.uint8 else 65536
    rng = np.random.default_rng(draw(st.integers(0, 2**32 - 1)))
    shape = (h, w) if ch == 1 else (h, w, ch)
    return rng.integers(0, hi, size=shape, dtype=dtype)


class TestPngProperties:
    @settings(max_examples=40, deadline=None)
    @given(data=st.data())
    def test_roundtrip_any_profile(self, data):
        h, w = data.draw(DIMS), data.draw(DIMS)
        ch = data.draw(st.sampled_from([1, 2, 3, 4]))
        dtype = data.draw(st.sampled_from([np.uint8, np.uint16]))
        interlace = data.draw(st.booleans())
        img = _image(data.draw, h, w, ch, dtype)
        out = decode_png(encode_png(img, interlace=interlace))
        assert out.shape == img.shape and out.dtype == img.dtype
        assert (out == img).all()


class TestGifProperties:
    @settings(max_examples=40, deadline=None)
    @given(data=st.data())
    def test_roundtrip_gray_any_interlace(self, data):
        h, w = data.draw(DIMS), data.draw(DIMS)
        interlace = data.draw(st.booleans())
        img = _image(data.draw, h, w, 1, np.uint8)
        out = decode_gif(encode_gif_gray(img, interlace=interlace))
        assert (out == img[:, :, None]).all()

    @settings(max_examples=30, deadline=None)
    @given(payload=st.binary(min_size=0, max_size=4000))
    def test_lzw_roundtrip_arbitrary_bytes(self, payload):
        assert _lzw_decompress(_lzw_compress(payload, 8), 8) == payload


class TestBmpWavProperties:
    @settings(max_examples=40, deadline=None)
    @given(data=st.data())
    def test_bmp_roundtrip(self, data):
        h, w = data.draw(DIMS), data.draw(DIMS)
        img = _image(data.draw, h, w, 3, np.uint8)
        assert (decode_bmp(encode_bmp(img)) == img).all()

    @settings(max_examples=30, deadline=None)
    @given(
        seed=st.integers(0, 2**32 - 1),
        n=st.integers(1, 2000),
        rate=st.sampled_from([8000, 16000, 44100]),
    )
    def test_pcm16_roundtrip(self, seed, n, rate):
        rng = np.random.default_rng(seed)
        s = rng.integers(-32768, 32768, size=n).astype(np.int16)
        got_rate, out = decode_wav(encode_wav(s, rate=rate))
        assert got_rate == rate and (out[:, 0] == s).all()


class TestG711Properties:
    @settings(max_examples=40, deadline=None)
    @given(seed=st.integers(0, 2**32 - 1), n=st.integers(1, 1500))
    def test_quantizer_idempotence(self, seed, n):
        # encode∘decode∘encode == encode: the compressed code is a
        # fixed point — the defining property of a quantizer
        rng = np.random.default_rng(seed)
        x = rng.integers(-32768, 32768, size=n).astype(np.int16)
        # A-law: exact code-level fixed point
        c = alaw_encode(x)
        assert (alaw_encode(alaw_decode(c)) == c).all()
        # mu-law: x in {-1,-2,-3} encodes to negative zero 0x7F which
        # expands to 0 and re-encodes as positive zero 0xFF — the
        # standard's ±0 fold. Idempotence holds at the VALUE level:
        # both codes reconstruct identically.
        c = mulaw_encode(x)
        c2 = mulaw_encode(mulaw_decode(c))
        assert (mulaw_decode(c2) == mulaw_decode(c)).all()
        assert (c2[c != 0x7F] == c[c != 0x7F]).all()

    @settings(max_examples=40, deadline=None)
    @given(seed=st.integers(0, 2**32 - 1), n=st.integers(1, 1500))
    def test_error_within_segment_resolution(self, seed, n):
        rng = np.random.default_rng(seed)
        x = rng.integers(-32768, 32768, size=n).astype(np.int16)
        for enc, dec in (
            (mulaw_encode, mulaw_decode),
            (alaw_encode, alaw_decode),
        ):
            err = np.abs(dec(enc(x)).astype(int) - x.astype(int))
            rel = err / np.maximum(np.abs(x.astype(int)), 256)
            assert rel.max() < 0.07


class TestAdpcmProperties:
    @settings(max_examples=30, deadline=None)
    @given(seed=st.integers(0, 2**32 - 1), n=st.integers(1, 1600))
    def test_decode_total_and_bounded(self, seed, n):
        rng = np.random.default_rng(seed)
        # band-limited-ish: cumulative sum of small steps, wrapped
        steps = rng.integers(-300, 301, size=n)
        sig = np.clip(np.cumsum(steps), -30000, 30000).astype(np.int16)
        dec = ima_adpcm_decode(ima_adpcm_encode(sig), n)
        assert dec.shape == (n,) and dec.dtype == np.int16
        # the delta coder must track a slow signal within a few steps
        assert np.abs(dec.astype(int) - sig.astype(int)).max() < 4000


class TestUntrustedBytesProperties:
    @settings(max_examples=60, deadline=None)
    @given(data=st.data())
    def test_mutated_valid_files_never_raise_from_try_decode(self, data):
        from economic_data_etl_spark.operators.codecs import (
            build_full_media,
            encode_mjpeg_avi,
            try_decode_media,
        )
        from economic_data_etl_spark.operators.jpeg import (
            block_constant_pattern,
            encode_jpeg_gray,
        )

        kind = data.draw(st.integers(0, 7))
        if kind < 6:
            payload = bytearray(build_full_media(kind))
        elif kind == 6:
            payload = bytearray(
                encode_jpeg_gray(block_constant_pattern(3, 24, 16))
            )
        else:
            payload = bytearray(
                encode_mjpeg_avi(
                    [block_constant_pattern(f, 16, 16) for f in (0, 1)]
                )
            )
        # flip up to 4 bytes anywhere (headers, dims, entropy data)
        for _ in range(data.draw(st.integers(1, 4))):
            pos = data.draw(st.integers(0, len(payload) - 1))
            payload[pos] ^= data.draw(st.integers(1, 255))
        try_decode_media(bytes(payload))  # None or data — never raises

    @settings(max_examples=60, deadline=None)
    @given(junk=st.binary(min_size=0, max_size=200))
    def test_magic_prefixed_junk_never_raises(self, junk):
        from economic_data_etl_spark.operators.codecs import (
            try_decode_media,
        )

        for magic in (
            b"\x89PNG\r\n\x1a\n",
            b"BM",
            b"GIF89a",
            b"RIFF\x20\x00\x00\x00WAVE",
            b"RIFF\x20\x00\x00\x00AVI ",
            b"\xff\xd8\xff",
        ):
            try_decode_media(magic + junk)


class TestGifTruncation:
    def test_every_prefix_raises_valueerror_or_decodes(self):
        # ADVICE r7 (codecs.py:1243): the GIF block walks indexed
        # payload[pos] without bounds checks, so truncation leaked
        # IndexError (and short struct slices leaked struct.error)
        # through decode_media's documented ValueError contract.
        # Exhaustive: EVERY proper prefix of a valid animated GIF must
        # either raise ValueError or decode (a prefix that ends exactly
        # at a complete image block is a legal single-image stream).
        import numpy as np

        from economic_data_etl_spark.operators.codecs import (
            decode_gif,
            decode_gif_frames,
            encode_gif_animated,
        )

        rng = np.random.default_rng(7)
        frames = [
            (rng.integers(1, 256, (9, 11))).astype(np.uint8)
            for _ in range(3)
        ]
        payload = encode_gif_animated(frames)
        for cut in range(len(payload)):
            for fn in (decode_gif_frames, decode_gif):
                try:
                    fn(payload[:cut])
                except ValueError:
                    pass


class TestJpegProperties:
    @settings(max_examples=15, deadline=None)
    @given(data=st.data())
    def test_gray_matches_independent_reference(self, data):
        from economic_data_etl_spark.operators.jpeg import (
            decode_jpeg_gray,
            encode_jpeg_gray,
        )
        from tests.test_jpeg import reference_decode_of_encode

        h, w = data.draw(DIMS), data.draw(DIMS)
        img = _image(data.draw, h, w, 1, np.uint8)
        dec = decode_jpeg_gray(encode_jpeg_gray(img))
        assert (dec == reference_decode_of_encode(img)).all()
