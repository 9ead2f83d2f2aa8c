"""Baseline JPEG (ITU-T T.81) codec from scratch — stdlib + numpy only.

The round-5 verdict filed JPEG as "genuinely needs an entropy-coding
codec library". It does not: baseline JPEG's entropy coder is CANONICAL
HUFFMAN — a prefix code fully specified by the public tables in the
standard's Annex K — and the transform is an 8×8 DCT, one orthonormal
matrix multiply per block. Both are implementable exactly, the same way
round 5 implemented GIF's LZW. What a library buys is SPEED (SIMD
IDCT), not feasibility.

Profile: baseline sequential DCT, 8-bit, SINGLE grayscale component
(no chroma subsampling decisions to make), Annex-K-style Huffman
tables, one quantization table. Encoder and decoder both live here; the
encoder exists to certify the decoder (the codecs.py pattern).

Exact-certification design — JPEG is lossy but DETERMINISTIC, and this
codec pins every implementation-defined rounding to round-half-up
(floor(x + 0.5)), which double-precision IEEE arithmetic reproduces
bit-identically in DuckDB SQL:

- The quantization table is ALL-ODD. A quantized level is
  floor(F/q + 0.5); a tie (F/q exactly k+1/2) would make the rounding
  mode observable across engines, but for the DC of a constant block
  F = 8·d with q odd, 8d/q = k + 1/2 requires 16d ≡ q (mod 2q) — the
  left side is even, the right odd: NO TIES, so the SQL FLOOR of the
  same IEEE division matches numpy exactly.
- On BLOCK-CONSTANT images every AC coefficient is exactly 0 (the DCT
  basis rows for u>0 sum to zero), so the decoded block value has the
  closed form clip(floor(floor(8(c-128)/q + .5)·q/8 + .5) + 128) —
  computable in SQL from doc_id alone. The catalog query
  multimodal_jpeg_decode certifies the WHOLE pipeline (marker parse,
  canonical Huffman decode, DC prediction, zigzag, dequantize, IDCT,
  level shift, edge-block cropping) cross-engine on that subspace.
- The general path (AC runs, ZRL, EOB, magnitude categories, byte
  stuffing) is certified in tests/test_jpeg.py by round-tripping
  arbitrary images against an INDEPENDENT straight-from-the-math
  reference (direct matrix DCT/quantization, no shared code with the
  entropy layer), plus corner streams (≥16-zero runs forcing ZRL,
  -1/+1 magnitudes, dimension cropping).

What remains genuinely out of scope with no codec library: VIDEO
(inter-frame prediction + entropy arithmetic far beyond a prefix code)
and progressive/arithmetic JPEG modes.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# Constants: DCT matrix, zigzag, quantization, Annex-K Huffman tables
# --------------------------------------------------------------------------

# Orthonormal 8×8 DCT-II matrix M: F = M @ f @ M.T, f = M.T @ F @ M.
_M = np.array(
    [
        [
            (np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8))
            * np.cos((2 * x + 1) * u * np.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ],
    dtype=np.float64,
)

# Standard zigzag scan order: ZIGZAG[i] = (row, col) of the i-th coeff.
def _zigzag_order() -> list[tuple[int, int]]:
    order = sorted(
        ((r, c) for r in range(8) for c in range(8)),
        key=lambda rc: (
            rc[0] + rc[1],
            rc[0] if (rc[0] + rc[1]) % 2 else rc[1],
        ),
    )
    return order


_ZIGZAG = _zigzag_order()

# All-odd quantization table (standard luminance table rounded up to
# odd): oddness kills rounding ties in the DC path (module docstring).
_Q_BASE = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int64,
)
QTAB = _Q_BASE | 1  # force odd

# Annex K.3.3.1/K.3.3.2: typical Huffman tables for 8-bit luminance.
# BITS[i] = number of codes of length i+1; VALS = symbols in code order.
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the T.81 canonical construction:
    codes of each length are consecutive, lengths ascending."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


_DC_ENC = _canonical_codes(_DC_BITS, _DC_VALS)
_AC_ENC = _canonical_codes(_AC_BITS, _AC_VALS)


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, for the bit-at-a-time decoder."""
    return {
        (length, code): sym
        for sym, (code, length) in _canonical_codes(bits, vals).items()
    }


_DC_DEC = _decode_table(_DC_BITS, _DC_VALS)
_AC_DEC = _decode_table(_AC_BITS, _AC_VALS)


ROUND_BIAS = 1e-6


def _round_half_up(x: np.ndarray) -> np.ndarray:
    """floor(x + 0.5 + 1e-6) — the ONE rounding mode this codec uses
    anywhere (rounding is implementation-defined per T.81, so pinning
    it is legitimate). The 1e-6 bias is the repo's biased_round
    pattern: the float DCT/IDCT carries ~1e-13 noise, and on the
    closed-form subspace the true pixel value L·q/8 + 128.5 lands
    EXACTLY on an integer whenever L·q ≡ 4 (mod 8) — an unbiased floor
    would then flip on noise and diverge from the SQL oracle's exact
    arithmetic. The bias moves every tie 1e-6 past the boundary
    (≫ noise, ≪ the 1/8 grid spacing of non-ties), so numpy and
    DuckDB compute the identical integer."""
    return np.floor(x + 0.5 + ROUND_BIAS)


# --------------------------------------------------------------------------
# Bit I/O with JPEG byte stuffing
# --------------------------------------------------------------------------
class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:  # byte stuffing
                    self.out.append(0x00)
                self.acc = 0
                self.nbits = 0

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.acc = (self.acc << pad) | ((1 << pad) - 1)  # 1-padding
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated entropy data")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("truncated stuffing")
                marker = self.data[self.pos]
                self.pos += 1
                if marker != 0x00:
                    raise ValueError("unexpected marker in entropy data")
            self.acc = byte
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude coding: (size category, appended bits).
    Negative values are stored as value + 2^size - 1 (one's-complement
    style, T.81 F.1.2.1)."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    bits = v if v >= 0 else v + (1 << size) - 1
    return size, bits


def _extend(bits: int, size: int) -> int:
    """Inverse of _magnitude (T.81 F.2.2.1 EXTEND)."""
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


# --------------------------------------------------------------------------
# Encoder
# --------------------------------------------------------------------------
def encode_jpeg_gray(img: np.ndarray) -> bytes:
    """Encode (h, w) uint8 grayscale as a baseline JFIF JPEG: edge
    blocks padded by replication, DCT → all-odd quantization →
    zigzag → Annex-K Huffman, byte-stuffed entropy stream."""
    h, w = img.shape
    bh, bw = (h + 7) // 8, (w + 7) // 8
    padded = np.empty((bh * 8, bw * 8), dtype=np.float64)
    padded[:h, :w] = img
    padded[h:, :w] = img[h - 1 : h, :]  # replicate bottom edge
    padded[:, w:] = padded[:, w - 1 : w]  # replicate right edge

    writer = _BitWriter()
    prev_dc = 0
    for by in range(bh):
        for bx in range(bw):
            block = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
            coeff = _M @ block @ _M.T
            # JPEG's DCT scaling is 2× the orthonormal transform per
            # axis... no: F_jpeg = (1/4)C C Σ = orthonormal M f M.T
            # exactly (see _M construction), so no extra factor.
            levels = _round_half_up(coeff / QTAB).astype(np.int64)
            zz = [int(levels[r, c]) for r, c in _ZIGZAG]
            diff = zz[0] - prev_dc
            prev_dc = zz[0]
            size, bits = _magnitude(diff)
            code, length = _DC_ENC[size]
            writer.write(code, length)
            if size:
                writer.write(bits, size)
            run = 0
            last_nz = max(
                (i for i in range(1, 64) if zz[i]), default=0
            )
            for i in range(1, 64):
                if i > last_nz:
                    code, length = _AC_ENC[0x00]  # EOB
                    writer.write(code, length)
                    break
                v = zz[i]
                if v == 0:
                    run += 1
                    continue
                while run >= 16:
                    code, length = _AC_ENC[0xF0]  # ZRL
                    writer.write(code, length)
                    run -= 16
                size, bits = _magnitude(v)
                code, length = _AC_ENC[(run << 4) | size]
                writer.write(code, length)
                writer.write(bits, size)
                run = 0
    entropy = writer.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    qt_zz = bytes([0]) + bytes(
        int(QTAB[r, c]) for r, c in _ZIGZAG
    )
    dht = (
        bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS)
        + bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS)
    )
    sof = struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    return (
        b"\xff\xd8"  # SOI
        + seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        + seg(0xFFDB, qt_zz)
        + seg(0xFFC0, sof)
        + seg(0xFFC4, dht)
        + seg(0xFFDA, sos)
        + entropy
        + b"\xff\xd9"  # EOI
    )


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------
def decode_jpeg_gray(payload: bytes) -> np.ndarray:
    """Decode a baseline single-component JPEG produced by any encoder
    using this module's profile (8-bit, one scan, Huffman, no restart
    markers) to uint8 (h, w). Raises ValueError on malformed bytes and
    NotImplementedError on profile features outside baseline
    single-component (progressive, multi-component, arithmetic,
    restart intervals)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qtab = None
    dims = None
    dc_dec, ac_dec = None, None
    entropy = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (ln,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        body = payload[pos + 4 : pos + 2 + ln]
        if len(body) != ln - 2:
            raise ValueError("truncated segment")
        if marker == 0xDB:  # DQT
            if body[0] & 0xF0:
                raise NotImplementedError("16-bit quantization table")
            q = np.zeros((8, 8), dtype=np.int64)
            for i, (r, c) in enumerate(_ZIGZAG):
                q[r, c] = body[1 + i]
            qtab = q
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA):
            raise NotImplementedError("non-baseline JPEG mode")
        elif marker == 0xC0:  # SOF0
            precision, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if precision != 8:
                raise NotImplementedError("non-8-bit precision")
            if ncomp != 1:
                raise NotImplementedError("multi-component JPEG")
            dims = (h, w)
        elif marker == 0xC4:  # DHT (may hold several tables)
            p = 0
            while p < len(body):
                tc_th = body[p]
                bits = list(body[p + 1 : p + 17])
                n = sum(bits)
                vals = list(body[p + 17 : p + 17 + n])
                table = _decode_table(bits, vals)
                if tc_th & 0x10:
                    ac_dec = table
                else:
                    dc_dec = table
                p += 17 + n
        elif marker == 0xDD:
            raise NotImplementedError("restart intervals")
        elif marker == 0xDA:  # SOS: entropy data follows
            entropy_start = pos + 2 + ln
            end = payload.rfind(b"\xff\xd9")
            if end < 0:
                raise ValueError("missing EOI")
            entropy = payload[entropy_start:end]
            break
        pos += 2 + ln
    if qtab is None or dims is None or dc_dec is None or ac_dec is None:
        raise ValueError("missing DQT/SOF/DHT/SOS")
    if entropy is None:
        raise ValueError("missing entropy data")
    h, w = dims
    bh, bw = (h + 7) // 8, (w + 7) // 8
    reader = _BitReader(entropy)
    out = np.zeros((bh * 8, bw * 8), dtype=np.uint8)
    prev_dc = 0
    for by in range(bh):
        for bx in range(bw):
            zz = [0] * 64
            size = reader.read_symbol(dc_dec)
            diff = _extend(reader.read_bits(size), size)
            prev_dc += diff
            zz[0] = prev_dc
            i = 1
            while i < 64:
                sym = reader.read_symbol(ac_dec)
                if sym == 0x00:  # EOB
                    break
                if sym == 0xF0:  # ZRL
                    i += 16
                    continue
                run, size = sym >> 4, sym & 0x0F
                i += run
                if i >= 64:
                    raise ValueError("AC index overflow")
                zz[i] = _extend(reader.read_bits(size), size)
                i += 1
            levels = np.zeros((8, 8), dtype=np.int64)
            for i, (r, c) in enumerate(_ZIGZAG):
                levels[r, c] = zz[i]
            block = _M.T @ (levels * qtab).astype(np.float64) @ _M
            pixels = np.clip(_round_half_up(block + 128.0), 0, 255)
            out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = pixels.astype(
                np.uint8
            )
    return out[:h, :w]


# --------------------------------------------------------------------------
# Closed-form certification helpers (the catalog query's contract)
# --------------------------------------------------------------------------
def block_constant_pattern(doc_id: int, w: int, h: int) -> np.ndarray:
    """(h, w) uint8 where every 8×8 block cell is the constant
    (bx + 2·by + doc_id) % 256 — the subspace on which baseline JPEG
    decode has a closed form (all ACs exactly zero)."""
    bx = np.arange(w) // 8
    by = np.arange(h) // 8
    return ((bx[None, :] + 2 * by[:, None] + int(doc_id)) % 256).astype(
        np.uint8
    )


def expected_constant_decode(c: int) -> int:
    """The closed-form decoded value of a constant-`c` block:
    clip(floor(floor(8(c-128)/q + .5 + b)·q/8 + .5 + b) + 128) with
    b = ROUND_BIAS. Mirrored literally by the SQL oracle of
    multimodal_jpeg_decode; q = QTAB[0,0] (odd, so the inner division
    never ties — the bias there is inert; the outer one resolves the
    L·q ≡ 4 (mod 8) exact-boundary cases deterministically)."""
    q = int(QTAB[0, 0])
    level = np.floor(8.0 * (c - 128) / q + 0.5 + ROUND_BIAS)
    val = np.floor(level * q / 8.0 + 0.5 + ROUND_BIAS) + 128
    return int(np.clip(val, 0, 255))
