"""Baseline JPEG (ITU-T T.81) codec from scratch — stdlib + numpy only.

The round-5 verdict filed JPEG as "genuinely needs an entropy-coding
codec library". It does not: baseline JPEG's entropy coder is CANONICAL
HUFFMAN — a prefix code fully specified by the public tables in the
standard's Annex K — and the transform is an 8×8 DCT, one orthonormal
matrix multiply per block. Both are implementable exactly, the same way
round 5 implemented GIF's LZW. What a library buys is SPEED (SIMD
IDCT), not feasibility.

Profile: baseline sequential DCT, 8-bit — single-component grayscale
AND 3-component YCbCr color in 4:4:4, 4:2:0 (2×2-mean chroma
reduction, interleaved 16×16 MCUs, replicate upsampling), 4:2:2, and
4:4:0, with separate luma/chroma quantization and Huffman tables and
optional DRI/RSTn restart intervals (byte-aligned markers, DC
prediction reset) exactly like a camera JPEG; all tables travel in
DQT/DHT, so the decoder reads whatever tables the stream declares. Encoder and decoder both live
here; the encoder exists to certify the decoder (the codecs.py
pattern).

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

Progressive (SOF2, Huffman) streams decode too — the multi-scan
spectral-selection / successive-approximation path lives in
jpeg_progressive.py and shares this module's tables, bit I/O, and
per-block IDCT. Arithmetic-coded streams decode too — sequential
(SOF9) via jpeg_arithmetic.py (T.81 Annex D QM coder + Annex F
statistical models, also from scratch) and progressive (SOF10) via
jpeg_arith_progressive.py — as do lossless (SOF3) streams via
jpeg_lossless.py (Annex H DPCM prediction, exactly lossless). What
remains genuinely out of scope with no codec library:
inter-frame-predictive VIDEO (motion compensation, H.26x-class
entropy layers); the untaken JPEG frames (hierarchical,
arithmetic-lossless SOF11) stay documented gates.
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
# flat (row*8+col) indices in zigzag order — lets the per-block
# (de)zigzag be one vectorized gather/scatter instead of a 64-step
# Python loop (pure integer reindexing, no float-path change)
_ZIG_FLAT = np.array([r * 8 + c for r, c in _ZIGZAG])

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


class _HuffTable(dict):
    """(length, code) -> symbol decode table, plus a full 16-bit
    canonical-code lookup (`lut_sym[prefix16]` / `lut_len[prefix16]`,
    length 0 = invalid code) that resolves EVERY symbol — T.81 caps
    code lengths at 16 — with one list index instead of a
    bit-at-a-time walk. Still a plain dict to every existing caller."""

    __slots__ = ("lut_sym", "lut_len")


# Decode tables are built per DHT segment but the corpus reuses a
# handful of them (the Annex-K luma/chroma pairs); memoize so the
# 65536-entry LUT is built once per distinct table per worker, not per
# image (guide §4.5: heavyweight init once). Bounded so corrupt-stream
# fuzzing cannot grow it without limit.
_TABLE_CACHE: dict[bytes, _HuffTable] = {}
_TABLE_CACHE_MAX = 32


def _decode_table(bits: list[int], vals: list[int]) -> _HuffTable:
    """(length, code) -> symbol, for the decoder; carries the 16-bit
    table-driven lookup as `.lut_sym`/`.lut_len` (plain lists — list
    indexing beats numpy scalar indexing in the per-symbol loop)."""
    key = bytes(bits) + bytes(vals)
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    t = _HuffTable(
        ((length, code), sym)
        for sym, (code, length) in _canonical_codes(bits, vals).items()
    )
    sym_arr = np.zeros(1 << 16, dtype=np.int32)
    len_arr = np.zeros(1 << 16, dtype=np.int32)
    for (length, code), sym in t.items():
        base = code << (16 - length)
        if base >= (1 << 16):  # corrupt DHT: code overflows its length
            continue
        span = 1 << (16 - length)
        sym_arr[base : base + span] = sym
        len_arr[base : base + span] = length
    t.lut_sym = sym_arr.tolist()
    t.lut_len = len_arr.tolist()
    if len(_TABLE_CACHE) >= _TABLE_CACHE_MAX:
        _TABLE_CACHE.clear()
    _TABLE_CACHE[key] = t
    return t


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
        self._byte_align()
        return bytes(self.out)

    def _byte_align(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.acc = (self.acc << pad) | ((1 << pad) - 1)  # 1-padding
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.nbits = 0

    def restart(self, n: int) -> None:
        """Byte-align (1-padding) and emit RSTn (T.81 restart interval
        boundary). Callers reset their DC predictors."""
        self._byte_align()
        self.out.append(0xFF)
        self.out.append(0xD0 + (n & 7))


def _pack_tokens_small(values, lengths) -> bytes:
    """Scalar twin of _pack_tokens for SHORT token runs (tiny restart
    segments): accumulate the bits in one Python int, 1-pad, stuff.
    Bitwise-identical to _BitWriter.write + _byte_align — each write
    appends the low `length` bits of `value` MSB-first."""
    acc = 0
    nbits = 0
    for v, ln in zip(values, lengths):
        ln = int(ln)  # callers may pass numpy arrays
        acc = (acc << ln) | (int(v) & ((1 << ln) - 1))
        nbits += ln
    pad = (-nbits) % 8
    if pad:
        acc = (acc << pad) | ((1 << pad) - 1)
        nbits += pad
    return acc.to_bytes(nbits // 8, "big").replace(
        b"\xff", b"\xff\x00"
    )


def _pack_tokens(values: np.ndarray, lengths: np.ndarray) -> bytes:
    """MSB-first bit packing of (value, length<=16) tokens with JPEG
    byte stuffing and 1-padding to the byte boundary — one vectorized
    numpy pass, bitwise-identical to feeding the tokens through
    _BitWriter.write + _byte_align (pinned in tests/test_jpeg.py)."""
    k = np.arange(16)
    shifts = lengths[:, None] - 1 - k[None, :]
    bits_mat = (values[:, None] >> np.maximum(shifts, 0)) & 1
    bits = bits_mat[shifts >= 0]  # row-major: token order, MSB-first
    pad = (-bits.size) % 8
    if pad:
        bits = np.concatenate([bits, np.ones(pad, np.int64)])
    raw = np.packbits(bits.astype(np.uint8))
    stuffed = np.insert(
        raw.astype(np.uint8),
        np.flatnonzero(raw == 0xFF) + 1,
        0,
    )
    return stuffed.tobytes()


class _TokenWriter:
    """Drop-in replacement for _BitWriter on ENCODE paths: write()
    buffers (value, length) tokens, and each restart()/flush()
    boundary packs the buffered segment with one vectorized
    _pack_tokens pass instead of the per-bit accumulator loop (the
    encoder hot spot — ~70% of baseline-encode time). Byte
    alignment, 1-padding, stuffing, and RSTn placement are bitwise
    the same, which tests/test_jpeg.py pins on random token streams
    and the full encoders."""

    def __init__(self) -> None:
        self.out = bytearray()
        self._vals: list[int] = []
        self._lens: list[int] = []

    def write(self, value: int, length: int) -> None:
        self._vals.append(value)
        self._lens.append(length)

    def _pack_segment(self) -> None:
        if self._vals:
            if len(self._vals) < 48:
                # numpy setup dwarfs the work on tiny restart segments
                self.out += _pack_tokens_small(self._vals, self._lens)
            else:
                self.out += _pack_tokens(
                    np.array(self._vals, np.int64),
                    np.array(self._lens, np.int64),
                )
            self._vals.clear()
            self._lens.clear()

    def restart(self, n: int) -> None:
        self._pack_segment()
        self.out.append(0xFF)
        self.out.append(0xD0 + (n & 7))

    def flush(self) -> bytes:
        self._pack_segment()
        return bytes(self.out)


def _split_entropy(
    entropy: bytes,
) -> tuple[list[bytes], list[int]]:
    """Split a scan's entropy-coded bytes at RSTn markers and UNSTUFF
    each segment (drop the 0x00 after every 0xFF data byte). Returns
    (unstuffed segments, restart-marker numbers between them). A
    non-RST marker inside the data is malformed — the same condition
    the byte-at-a-time reader reported when it reached it."""
    segs: list[bytes] = []
    nums: list[int] = []
    start = i = 0
    n = len(entropy)
    while True:
        j = entropy.find(b"\xff", i)
        if j < 0 or j + 1 >= n:
            break  # a lone trailing 0xFF stays data (truncated stuffing)
        m = entropy[j + 1]
        if m == 0x00:
            i = j + 2
            continue
        if 0xD0 <= m <= 0xD7:
            segs.append(
                entropy[start:j].replace(b"\xff\x00", b"\xff")
            )
            nums.append(m - 0xD0)
            start = i = j + 2
            continue
        raise ValueError("unexpected marker in entropy data")
    segs.append(entropy[start:].replace(b"\xff\x00", b"\xff"))
    return segs, nums


def _bit_windows(seg: bytes) -> list[int]:
    """32-bit big-endian windows over an unstuffed segment:
    win[i] = seg[i:i+4] zero-padded, one per byte offset plus slack so
    a bounded overrun past the data end indexes zeros instead of
    raising. Any k <= 16 bits at bit position p are
    (win[p >> 3] >> (24 - (p & 7) - k)) & ((1 << k) - 1) — one list
    index, one shift, one mask. Built in one vectorized pass."""
    padded = seg + b"\x00" * 8
    if len(seg) < 64:
        # tiny restart segments (1-2 MCU intervals) are common in the
        # corpus; numpy call overhead dwarfs the work at this size
        return [
            (padded[i] << 24)
            | (padded[i + 1] << 16)
            | (padded[i + 2] << 8)
            | padded[i + 3]
            for i in range(len(seg) + 5)
        ]
    b = np.frombuffer(padded, dtype=np.uint8).astype(np.int64)
    return (
        (b[:-3] << 24) | (b[1:-2] << 16) | (b[2:-1] << 8) | b[3:]
    ).tolist()


class _BitReader:
    """MSB-first bit reader over a JPEG entropy-coded stream. The
    stream is split at RSTn markers and unstuffed ONCE up front
    (_split_entropy); reads then index precomputed 32-bit windows
    (_bit_windows) — no per-byte stuffing branch, and read_symbol is
    one 16-bit table lookup. Public behavior (APIs, ValueError
    conditions) matches the retired byte-at-a-time reader."""

    __slots__ = ("segs", "nums", "seg_i", "win", "total", "p")

    def __init__(self, data: bytes) -> None:
        self.segs, self.nums = _split_entropy(data)
        self._load(0)

    def _load(self, i: int) -> None:
        self.seg_i = i
        seg = self.segs[i]
        self.win = _bit_windows(seg)
        self.total = 8 * len(seg)
        self.p = 0

    def _starve(self) -> None:
        """Raise the error the byte-at-a-time reader raised when a
        read consumed past the segment: a following restart marker
        means the read ran into it, otherwise the data ended."""
        if self.seg_i + 1 < len(self.segs):
            raise ValueError("unexpected marker in entropy data")
        raise ValueError("truncated entropy data")

    def read_bit(self) -> int:
        p = self.p
        if p >= self.total:
            self._starve()
        self.p = p + 1
        return (self.win[p >> 3] >> (31 - (p & 7))) & 1

    def read_bits(self, n: int) -> int:
        p = self.p
        if p + n > self.total:
            self._starve()
        self.p = p + n
        return (self.win[p >> 3] >> (32 - (p & 7) - n)) & (
            (1 << n) - 1
        )

    def sync_restart(self, n: int) -> None:
        """Discard pad bits to the byte boundary and consume the
        expected RSTn marker. Whole unconsumed bytes before the marker
        are legal only if they are (unstuffed) 0xFF pad bytes — the
        stuffed-pair skip the old reader performed."""
        i = self.seg_i
        if i + 1 >= len(self.segs):
            raise ValueError("missing restart marker")
        tail = self.segs[i][(self.p + 7) >> 3 :]
        if tail.strip(b"\xff"):
            raise ValueError("missing restart marker")
        if self.nums[i] != (n & 7):
            raise ValueError("restart marker out of sequence")
        self._load(i + 1)

    def read_symbol(self, table: dict[tuple[int, int], int]) -> int:
        p = self.p
        idx = (self.win[p >> 3] >> (16 - (p & 7))) & 0xFFFF
        length = table.lut_len[idx]
        if length == 0:
            raise ValueError("invalid Huffman code")
        if p + length > self.total:
            self._starve()
        self.p = p + length
        return table.lut_sym[idx]


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
# Chroma tables (color JPEG) — Annex-K-style; like the luma tables these
# are TRANSMITTED in the file's DQT/DHT segments, so the codec is
# self-describing: any decoder reads the tables it needs from the
# stream, and round-trip correctness never depends on matching some
# external table byte-for-byte.
# --------------------------------------------------------------------------
_Q_CHROMA_BASE = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int64,
)
QTAB_CHROMA = _Q_CHROMA_BASE | 1  # odd, same tie-free rationale

_DC_BITS_C = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_VALS_C = list(range(12))
_AC_BITS_C = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_VALS_C = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
_DC_ENC_C = _canonical_codes(_DC_BITS_C, _DC_VALS_C)
_AC_ENC_C = _canonical_codes(_AC_BITS_C, _AC_VALS_C)


# --------------------------------------------------------------------------
# Color transform (JFIF / BT.601) — lossy but pinned: biased
# round-half-up both directions, clip to [0, 255]
# --------------------------------------------------------------------------
def rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    r = img[:, :, 0].astype(np.float64)
    g = img[:, :, 1].astype(np.float64)
    b = img[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return np.clip(
        _round_half_up(np.stack([y, cb, cr], axis=2)), 0, 255
    ).astype(np.uint8)


def ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y = ycc[:, :, 0].astype(np.float64)
    cb = ycc[:, :, 1].astype(np.float64) - 128.0
    cr = ycc[:, :, 2].astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(
        _round_half_up(np.stack([r, g, b], axis=2)), 0, 255
    ).astype(np.uint8)


def _downsample2(plane: np.ndarray) -> np.ndarray:
    """2x2 mean with the codec's biased rounding (edge-replicated to
    even dims first) — the 4:2:0 chroma reduction."""
    h, w = plane.shape
    p = np.empty(((h + 1) // 2 * 2, (w + 1) // 2 * 2), dtype=np.float64)
    p[:h, :w] = plane
    if h % 2:
        p[h, :w] = plane[h - 1]
    if w % 2:
        p[:, w:] = p[:, w - 1 : w]
    s = p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2]
    return np.clip(_round_half_up(s / 4.0), 0, 255).astype(np.uint8)


def _downsample_h(plane: np.ndarray) -> np.ndarray:
    """1x2 horizontal mean (edge-replicated to even width) — the 4:2:2
    chroma reduction."""
    h, w = plane.shape
    p = np.empty((h, (w + 1) // 2 * 2), dtype=np.float64)
    p[:, :w] = plane
    if w % 2:
        p[:, w:] = p[:, w - 1 : w]
    s = p[:, 0::2] + p[:, 1::2]
    return np.clip(_round_half_up(s / 2.0), 0, 255).astype(np.uint8)


def _downsample_v(plane: np.ndarray) -> np.ndarray:
    """2x1 vertical mean — the 4:4:0 chroma reduction."""
    return _downsample_h(plane.T).T


def _pad_to(plane: np.ndarray, ph: int, pw: int) -> np.ndarray:
    """Edge-replicate `plane` up to (ph, pw)."""
    h, w = plane.shape
    out = np.empty((ph, pw), dtype=np.float64)
    out[:h, :w] = plane
    out[h:, :w] = plane[h - 1 : h, :]
    out[:, w:] = out[:, w - 1 : w]
    return out


# --------------------------------------------------------------------------
# Shared block entropy coding
# --------------------------------------------------------------------------
def _quant_levels_plane(padded: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """Batched DCT + quantize of an (8·bh, 8·bw) float64 plane ->
    (bh, bw, 8, 8) int64 levels. ONE broadcast np.matmul over every
    block replaces the per-block Python loop's 2×(8×8) matmuls — the
    dominant encoder cost in the profile (the entropy loop is
    inherently sequential, the transform is not). Per-block results
    are BITWISE identical to the scalar path: batched matmul runs the
    same 8×8 dgemm per slice (pinned in tests/test_jpeg.py)."""
    bh, bw = padded.shape[0] // 8, padded.shape[1] // 8
    blocks = padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
    coeff = _M @ (blocks - 128.0) @ _M.T
    return _round_half_up(coeff / qtab).astype(np.int64)


def _encode_block(
    writer: _BitWriter,
    block: np.ndarray | None,
    qtab: np.ndarray,
    dc_enc: dict,
    ac_enc: dict,
    prev_dc: int,
    levels: np.ndarray | None = None,
) -> int:
    """DCT -> quantize -> zigzag -> Huffman one 8x8 spatial block
    (already level-shift-ready uint8 domain); returns the new DC
    predictor. Pass precomputed ``levels`` (see _quant_levels_plane)
    to skip the per-block transform."""
    if levels is None:
        coeff = _M @ (block - 128.0) @ _M.T
        levels = _round_half_up(coeff / qtab).astype(np.int64)
    zz = levels.ravel()[_ZIG_FLAT]
    zz0 = int(zz[0])
    size, bits = _magnitude(zz0 - prev_dc)
    code, length = dc_enc[size]
    writer.write(code, length)
    if size:
        writer.write(bits, size)
    # walk only the NONZERO AC positions (typical blocks are sparse);
    # runs fall out of the index gaps — token stream identical to the
    # retired full 1..63 scan
    nz = np.flatnonzero(zz[1:])
    if nz.size == 0:
        code, length = ac_enc[0x00]  # EOB
        writer.write(code, length)
        return zz0
    prev = 0
    for idx in nz.tolist():
        i = idx + 1
        run = i - prev - 1
        while run >= 16:
            code, length = ac_enc[0xF0]  # ZRL
            writer.write(code, length)
            run -= 16
        size, bits = _magnitude(int(zz[i]))
        code, length = ac_enc[(run << 4) | size]
        writer.write(code, length)
        writer.write(bits, size)
        prev = i
    if prev < 63:
        code, length = ac_enc[0x00]  # EOB after trailing zeros
        writer.write(code, length)
    return zz0


def _enc_table_arrays(
    enc: dict[int, tuple[int, int]], nsyms: int
) -> tuple[np.ndarray, np.ndarray]:
    """(code, length) dict -> dense numpy code/length arrays for the
    batched token synthesizer (missing symbols keep length 0 and are
    never emitted)."""
    codes = np.zeros(nsyms, dtype=np.int64)
    lens = np.zeros(nsyms, dtype=np.int64)
    for sym, (code, length) in enc.items():
        codes[sym] = code
        lens[sym] = length
    return codes, lens


_DC_CODE_ARRS = np.stack(
    [
        _enc_table_arrays(_DC_ENC, 16)[0],
        _enc_table_arrays(_DC_ENC_C, 16)[0],
    ]
)
_DC_LEN_ARRS = np.stack(
    [
        _enc_table_arrays(_DC_ENC, 16)[1],
        _enc_table_arrays(_DC_ENC_C, 16)[1],
    ]
)
_AC_CODE_ARRS = np.stack(
    [
        _enc_table_arrays(_AC_ENC, 256)[0],
        _enc_table_arrays(_AC_ENC_C, 256)[0],
    ]
)
_AC_LEN_ARRS = np.stack(
    [
        _enc_table_arrays(_AC_ENC, 256)[1],
        _enc_table_arrays(_AC_ENC_C, 256)[1],
    ]
)


def _entropy_encode_batch(
    zz_comps: list[np.ndarray],
    tsels: list[int],
    bpms: list[int],
    n_mcus: int,
    restart_interval: int,
) -> bytes:
    """Vectorized baseline-JPEG entropy coder: synthesize the ENTIRE
    token stream (DC diffs with restart resets, AC run/size symbols,
    ZRLs, EOBs) for every component in one set of numpy passes, merge
    into interleaved-MCU emission order with one lexsort, and pack one
    restart segment at a time. Token-for-token identical to walking
    _encode_block over the MCU order (pinned by the encoder-bytes and
    decode-fingerprint tests).

    zz_comps[c]: (N_c, 64) int64 zigzag-ordered levels in that
    component's block-arrival order; tsels[c] selects the table pair
    (0 luma, 1 chroma); bpms[c] = blocks per MCU (hi*vi)."""
    ri = restart_interval
    btot = sum(bpms)
    prefix = np.cumsum([0] + bpms[:-1])
    all_vals: list[np.ndarray] = []
    all_lens: list[np.ndarray] = []
    all_pos: list[np.ndarray] = []
    all_key: list[np.ndarray] = []

    for ci, zz in enumerate(zz_comps):
        n = zz.shape[0]
        if n == 0:
            continue
        bpm = bpms[ci]
        tsel = tsels[ci]
        k_arr = np.arange(n)
        # emission position of this component's k-th block in the
        # interleaved MCU walk
        epos = (k_arr // bpm) * btot + prefix[ci] + (k_arr % bpm)
        # --- DC: diff against the previous block, reset per segment
        dc = zz[:, 0]
        prev = np.empty(n, dtype=np.int64)
        prev[0] = 0
        prev[1:] = dc[:-1]
        if ri:
            resets = np.arange(0, n_mcus, ri) * bpm
            prev[resets[resets < n]] = 0
        diff = dc - prev
        dsize = np.frexp(np.abs(diff).astype(np.float64))[1].astype(
            np.int64
        )
        dbits = np.where(diff >= 0, diff, diff + (1 << dsize) - 1)
        all_vals.append(_DC_CODE_ARRS[tsel][dsize])
        all_lens.append(_DC_LEN_ARRS[tsel][dsize])
        all_pos.append(epos)
        all_key.append(np.zeros(n, dtype=np.int64))
        # appended magnitude bits (length 0 when diff == 0 — packs to
        # nothing, exactly like the skipped write in _encode_block)
        all_vals.append(np.where(dsize > 0, dbits, 0))
        all_lens.append(dsize)
        all_pos.append(epos)
        all_key.append(np.ones(n, dtype=np.int64))
        # --- AC: nonzero positions only (row-major => block, then k)
        rows, cols0 = np.nonzero(zz[:, 1:])
        kpos = cols0 + 1
        if rows.size:
            v = zz[rows, kpos]
            first = np.empty(rows.size, dtype=bool)
            first[0] = True
            first[1:] = rows[1:] != rows[:-1]
            prevk = np.empty(rows.size, dtype=np.int64)
            prevk[0] = 0
            prevk[1:] = kpos[:-1]
            prevk[first] = 0
            run = kpos - prevk - 1
            nzrl = run >> 4
            rem = run & 15
            asize = np.frexp(np.abs(v).astype(np.float64))[1].astype(
                np.int64
            )
            abits = np.where(v >= 0, v, v + (1 << asize) - 1)
            # ZRL tokens: the m-th ZRL of the nonzero at position k
            # carries key 8k+4+m, before that coefficient's code (8k+8)
            if nzrl.any():
                zr_rows = np.repeat(rows, nzrl)
                zr_k = np.repeat(kpos, nzrl)
                m = np.arange(int(nzrl.sum())) - np.repeat(
                    np.cumsum(nzrl) - nzrl, nzrl
                )
                zrl_code, zrl_len = (
                    _AC_ENC[0xF0] if tsel == 0 else _AC_ENC_C[0xF0]
                )
                all_vals.append(
                    np.full(zr_rows.size, zrl_code, dtype=np.int64)
                )
                all_lens.append(
                    np.full(zr_rows.size, zrl_len, dtype=np.int64)
                )
                all_pos.append(epos[zr_rows])
                all_key.append(8 * zr_k + 4 + m)
            sym = (rem << 4) | asize
            all_vals.append(_AC_CODE_ARRS[tsel][sym])
            all_lens.append(_AC_LEN_ARRS[tsel][sym])
            all_pos.append(epos[rows])
            all_key.append(8 * kpos + 8)
            all_vals.append(abits)
            all_lens.append(asize)
            all_pos.append(epos[rows])
            all_key.append(8 * kpos + 9)
        # --- EOB for every block whose last nonzero sits before 63
        lastnz = np.zeros(n, dtype=np.int64)
        if rows.size:
            lastnz[rows] = kpos  # ascending per row: last write wins
        eob_blocks = np.flatnonzero(lastnz < 63)
        if eob_blocks.size:
            eob_code, eob_len = (
                _AC_ENC[0x00] if tsel == 0 else _AC_ENC_C[0x00]
            )
            all_vals.append(
                np.full(eob_blocks.size, eob_code, dtype=np.int64)
            )
            all_lens.append(
                np.full(eob_blocks.size, eob_len, dtype=np.int64)
            )
            all_pos.append(epos[eob_blocks])
            all_key.append(
                np.full(eob_blocks.size, 8 * 64 + 10, dtype=np.int64)
            )

    vals = np.concatenate(all_vals)
    lens = np.concatenate(all_lens)
    pos = np.concatenate(all_pos)
    key = np.concatenate(all_key)
    order = np.lexsort((key, pos))
    vals, lens, pos = vals[order], lens[order], pos[order]
    if not ri:
        return _pack_tokens(vals, lens)
    # segment s covers MCUs [s*ri, (s+1)*ri) => emission positions
    # [s*ri*btot, ...); tokens are sorted by pos, so searchsorted
    # yields each segment's token range
    out = bytearray()
    bounds = np.searchsorted(
        pos, np.arange(ri * btot, n_mcus * btot, ri * btot)
    )
    start = 0
    for si, b in enumerate(list(bounds) + [vals.size]):
        if si:
            out += bytes([0xFF, 0xD0 + ((si - 1) % 8)])
        if b - start < 48:  # tiny segment: scalar big-int packing
            out += _pack_tokens_small(vals[start:b], lens[start:b])
        else:
            out += _pack_tokens(vals[start:b], lens[start:b])
        start = b
    return bytes(out)


def _idct_pixels_batch(
    levels: np.ndarray, qtab: np.ndarray
) -> np.ndarray:
    """Dequantize + IDCT + round/clip a stack of (n, 8, 8) level
    blocks in ONE broadcast matmul — bitwise identical per block to
    the scalar path (same 8×8 dgemm per slice; the elementwise
    dequantize/round/clip are shape-independent). The decoder's
    entropy walk is sequential; the transform is not (profile: the
    IDCT matmuls dominated _decode_block)."""
    block = _M.T @ (levels * qtab).astype(np.float64) @ _M
    return np.clip(_round_half_up(block + 128.0), 0, 255).astype(
        np.uint8
    )


def _decode_levels(
    reader: _BitReader,
    dc_dec: dict,
    ac_dec: dict,
    prev_dc: int,
) -> tuple[np.ndarray, int]:
    """Huffman -> dezigzag one block's quantized (8, 8) int64 levels
    (the sequential half of _decode_block; IDCT happens batched)."""
    zz = [0] * 64
    size = reader.read_symbol(dc_dec)
    if size > 15:
        # T.81 caps DC magnitude categories (11 for 8-bit precision,
        # 15 absolute); a corrupt/malicious DHT can declare any byte as
        # the symbol, and read_bits(size) would then build an
        # arbitrarily large int that overflows the int64 level matrix.
        raise ValueError("DC magnitude category out of range")
    prev_dc += _extend(reader.read_bits(size), size)
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
    levels = np.zeros(64, dtype=np.int64)
    levels[_ZIG_FLAT] = zz
    return levels.reshape(8, 8), prev_dc


def _decode_block(
    reader: _BitReader,
    qtab: np.ndarray,
    dc_dec: dict,
    ac_dec: dict,
    prev_dc: int,
) -> tuple[np.ndarray, int]:
    """Huffman -> dezigzag -> dequantize -> IDCT one block; returns the
    uint8 spatial block and the new DC predictor."""
    levels, prev_dc = _decode_levels(reader, dc_dec, ac_dec, prev_dc)
    return _idct_pixels_batch(levels[None], qtab)[0], prev_dc


def _decode_mcu_run(
    seg: bytes,
    n_mcus: int,
    unit_cis: list[int],
    luts: list[tuple[_HuffTable, _HuffTable]],
    zz_all: list[np.ndarray],
    bi: list[int],
    more_segments: bool,
) -> int:
    """Entropy-decode `n_mcus` interleaved MCUs from ONE unstuffed
    restart segment into per-component (n_blocks, 64) zigzag level
    arrays (written in block-arrival order at bi[ci]); returns the
    final bit position. decode_jpeg's hot loop: identical
    symbol/extend semantics to _decode_levels, with the bit cursor in
    a local and one 16-bit LUT hit per Huffman symbol (no per-byte
    stuffing branches — the segment is pre-unstuffed)."""
    win = _bit_windows(seg)
    total = 8 * len(seg)
    p = 0
    dc = [0] * len(zz_all)
    tabs = [
        (d.lut_sym, d.lut_len, a.lut_sym, a.lut_len) for d, a in luts
    ]
    starve_msg = (
        "unexpected marker in entropy data"
        if more_segments
        else "truncated entropy data"
    )
    for _ in range(n_mcus):
        for ci in unit_cis:
            dsym, dlen, asym, alen = tabs[ci]
            row = zz_all[ci][bi[ci]]
            bi[ci] += 1
            idx = (win[p >> 3] >> (16 - (p & 7))) & 0xFFFF
            length = dlen[idx]
            if length == 0:
                raise ValueError("invalid Huffman code")
            p += length
            size = dsym[idx]
            pred = dc[ci]
            if size:
                if size > 15:
                    raise ValueError(
                        "DC magnitude category out of range"
                    )
                v = (win[p >> 3] >> (32 - (p & 7) - size)) & (
                    (1 << size) - 1
                )
                p += size
                if v < (1 << (size - 1)):
                    v += 1 - (1 << size)
                pred += v
                dc[ci] = pred
            row[0] = pred
            k = 1
            while k < 64:
                # consuming past the segment is the old reader's
                # starvation error; checking at each symbol also keeps
                # the window index within its zero slack
                if p > total:
                    raise ValueError(starve_msg)
                idx = (win[p >> 3] >> (16 - (p & 7))) & 0xFFFF
                length = alen[idx]
                if length == 0:
                    raise ValueError("invalid Huffman code")
                p += length
                sym = asym[idx]
                if sym == 0x00:  # EOB
                    break
                if sym == 0xF0:  # ZRL
                    k += 16
                    continue
                k += sym >> 4
                if k >= 64:
                    raise ValueError("AC index overflow")
                size = sym & 0x0F
                if size:
                    v = (win[p >> 3] >> (32 - (p & 7) - size)) & (
                        (1 << size) - 1
                    )
                    p += size
                    if v < (1 << (size - 1)):
                        v += 1 - (1 << size)
                    row[k] = v
                k += 1
            if p > total:
                raise ValueError(starve_msg)
    return p


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def _dqt_payload(tid: int, qtab: np.ndarray) -> bytes:
    return bytes([tid]) + bytes(int(qtab[r, c]) for r, c in _ZIGZAG)


_JFIF_APP0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"


# --------------------------------------------------------------------------
# Encoders
# --------------------------------------------------------------------------
def encode_jpeg_gray(img: np.ndarray, restart_interval: int = 0) -> bytes:
    """Encode (h, w) uint8 grayscale as a baseline JFIF JPEG: edge
    blocks padded by replication, orthonormal-DCT (the 1/4·C·C scaling
    of T.81 equals the orthonormal transform exactly) -> all-odd
    quantization -> zigzag -> Annex-K Huffman, byte-stuffed entropy
    stream. `restart_interval` > 0 emits a DRI segment and RSTn
    markers every that many MCUs (DC prediction resets at each)."""
    h, w = img.shape
    bh, bw = (h + 7) // 8, (w + 7) // 8
    padded = _pad_to(img.astype(np.float64), bh * 8, bw * 8)
    levels_all = _quant_levels_plane(padded, QTAB)
    # fully batched entropy coding: raster block order IS the MCU
    # order for a single component (token-identical to the retired
    # _encode_block walk — see _entropy_encode_batch)
    zz = levels_all.reshape(bh * bw, 64)[:, _ZIG_FLAT]
    entropy = _entropy_encode_batch(
        [zz], [0], [1], bh * bw, restart_interval
    )
    dht = (
        bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS)
        + bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS)
    )
    sof = struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    dri = (
        _seg(0xFFDD, struct.pack(">H", restart_interval))
        if restart_interval
        else b""
    )
    return (
        b"\xff\xd8"
        + _seg(0xFFE0, _JFIF_APP0)
        + _seg(0xFFDB, _dqt_payload(0, QTAB))
        + _seg(0xFFC0, sof)
        + _seg(0xFFC4, dht)
        + dri
        + _seg(0xFFDA, sos)
        + entropy
        + b"\xff\xd9"
    )


# chroma sampling layouts: name -> (luma h-factor, luma v-factor)
_SUBSAMPLE_MODES = {
    False: (1, 1),  # 4:4:4
    True: (2, 2),  # 4:2:0 (bool kept for API compatibility)
    "444": (1, 1),
    "420": (2, 2),
    "422": (2, 1),
    "440": (1, 2),
}


def chroma_planes(
    ycc: np.ndarray, yh: int, yv: int
) -> tuple[np.ndarray, np.ndarray]:
    """Reduce the chroma planes for luma factors (yh, yv): 2x2 mean for
    4:2:0, horizontal for 4:2:2, vertical for 4:4:0, none for 4:4:4."""
    cb, cr = ycc[:, :, 1], ycc[:, :, 2]
    if (yh, yv) == (2, 2):
        return _downsample2(cb), _downsample2(cr)
    if (yh, yv) == (2, 1):
        return _downsample_h(cb), _downsample_h(cr)
    if (yh, yv) == (1, 2):
        return _downsample_v(cb), _downsample_v(cr)
    return cb, cr


def encode_jpeg_color(
    img: np.ndarray,
    subsample: bool | str = False,
    restart_interval: int = 0,
) -> bytes:
    """Encode (h, w, 3) uint8 RGB as a baseline JFIF YCbCr JPEG.
    `subsample` picks the chroma layout: False/"444" (default),
    True/"420" (2x2-mean reduction, 16x16 MCUs), "422" (horizontal
    pairs, 16x8 MCUs), "440" (vertical pairs, 8x16 MCUs). Luma uses
    the luma quantization/Huffman tables, chroma the chroma ones,
    exactly like a camera JPEG; all tables travel in DQT/DHT.
    `restart_interval` > 0 emits DRI + RSTn markers every that many
    MCUs with DC prediction reset."""
    if subsample not in _SUBSAMPLE_MODES:
        raise ValueError(f"unknown subsample mode {subsample!r}")
    yh, yv = _SUBSAMPLE_MODES[subsample]
    h, w, _ = img.shape
    ycc = rgb_to_ycbcr(img)
    y_plane = ycc[:, :, 0].astype(np.float64)
    cb, cr = chroma_planes(ycc, yh, yv)
    cb, cr = cb.astype(np.float64), cr.astype(np.float64)
    mcu_h, mcu_w = 8 * yv, 8 * yh
    mh, mw = (h + mcu_h - 1) // mcu_h, (w + mcu_w - 1) // mcu_w
    y_pad = _pad_to(y_plane, mh * mcu_h, mw * mcu_w)
    cb_pad = _pad_to(cb, mh * 8, mw * 8)
    cr_pad = _pad_to(cr, mh * 8, mw * 8)
    y_levels = _quant_levels_plane(y_pad, QTAB)
    cb_levels = _quant_levels_plane(cb_pad, QTAB_CHROMA)
    cr_levels = _quant_levels_plane(cr_pad, QTAB_CHROMA)

    # gather each component's blocks into MCU-arrival order and run
    # the batched entropy coder (token-identical to the retired
    # per-block walk — see _entropy_encode_batch)
    bpm_y = yh * yv
    bw_y = mw * yh
    karr = np.arange(mh * mw * bpm_y)
    mcu, r = karr // bpm_y, karr % bpm_y
    by = (mcu // mw) * yv + r // yh
    bx = (mcu % mw) * yh + r % yh
    zz_y = y_levels.reshape(-1, 64)[by * bw_y + bx][:, _ZIG_FLAT]
    zz_cb = cb_levels.reshape(-1, 64)[:, _ZIG_FLAT]
    zz_cr = cr_levels.reshape(-1, 64)[:, _ZIG_FLAT]
    entropy = _entropy_encode_batch(
        [zz_y, zz_cb, zz_cr],
        [0, 1, 1],
        [bpm_y, 1, 1],
        mh * mw,
        restart_interval,
    )

    dht = (
        bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS)
        + bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS)
        + bytes([0x01]) + bytes(_DC_BITS_C) + bytes(_DC_VALS_C)
        + bytes([0x11]) + bytes(_AC_BITS_C) + bytes(_AC_VALS_C)
    )
    samp = (yh << 4) | yv
    sof = struct.pack(">BHHB", 8, h, w, 3) + bytes(
        [1, samp, 0, 2, 0x11, 1, 3, 0x11, 1]
    )
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    dri = (
        _seg(0xFFDD, struct.pack(">H", restart_interval))
        if restart_interval
        else b""
    )
    return (
        b"\xff\xd8"
        + _seg(0xFFE0, _JFIF_APP0)
        + _seg(0xFFDB, _dqt_payload(0, QTAB))
        + _seg(0xFFDB, _dqt_payload(1, QTAB_CHROMA))
        + _seg(0xFFC0, sof)
        + _seg(0xFFC4, dht)
        + dri
        + _seg(0xFFDA, sos)
        + entropy
        + b"\xff\xd9"
    )


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------
def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a JPEG — baseline here, progressive (SOF2) via
    jpeg_progressive.decode_progressive, arithmetic sequential (SOF9)
    via jpeg_arithmetic.decode_arithmetic: single-component -> uint8
    (h, w); 3-component YCbCr (4:4:4, 4:2:0, 4:2:2, 4:4:0) -> uint8
    (h, w, 3) RGB; DRI/RSTn restart intervals consumed with DC reset.
    Raises ValueError on malformed bytes and NotImplementedError on
    the remaining capability gates (lossless/hierarchical/SOF10
    frames, 4:1:1-class sampling layouts)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> table
    comps = None  # list of (comp_id, h_i, v_i, qtab_id)
    scan_map = None  # comp_id -> (dc_table_id, ac_table_id)
    dims = None
    entropy = None
    restart_interval = 0
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = payload[pos + 1]
        if marker == 0xD9:
            break
        (ln,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        body = payload[pos + 4 : pos + 2 + ln]
        if len(body) != ln - 2:
            raise ValueError("truncated segment")
        if marker == 0xDB:
            p = 0
            while p < len(body):
                pq_tq = body[p]
                if pq_tq & 0xF0:
                    raise NotImplementedError("16-bit quantization table")
                q = np.zeros((8, 8), dtype=np.int64)
                for i, (r, c) in enumerate(_ZIGZAG):
                    q[r, c] = body[p + 1 + i]
                qtabs[pq_tq & 0x0F] = q
                p += 65
        elif marker == 0xC2:
            # progressive (SOF2, Huffman): multi-scan path with its own
            # parse loop — coefficients accumulate across scans
            from economic_data_etl_spark.operators.jpeg_progressive import (
                decode_progressive,
            )

            return decode_progressive(payload)
        elif marker == 0xC9:
            # sequential DCT, arithmetic coding (SOF9): QM-coder path
            # with its own parse loop
            from economic_data_etl_spark.operators.jpeg_arithmetic import (
                decode_arithmetic,
            )

            return decode_arithmetic(payload)
        elif marker == 0xC3:
            # lossless (SOF3): DPCM prediction + DC-style Huffman
            from economic_data_etl_spark.operators.jpeg_lossless import (
                decode_lossless,
            )

            return decode_lossless(payload)
        elif marker == 0xCA:
            # progressive DCT, arithmetic coding (SOF10)
            from economic_data_etl_spark.operators import (
                jpeg_arith_progressive as _jap,
            )

            return _jap.decode_arith_progressive(payload)
        elif marker in (
            0xC5, 0xC6, 0xC7,
            0xCB, 0xCD, 0xCE, 0xCF,
        ):
            # every remaining frame marker (hierarchical,
            # arithmetic-lossless) is a CAPABILITY gate, not corrupt
            # data — NotImplementedError by contract
            raise NotImplementedError("non-baseline JPEG mode")
        elif marker in (0xC0, 0xC1):
            # SOF1 (extended sequential, Huffman) at 8-bit precision is
            # structurally identical to baseline — same scan layout,
            # same entropy coding; its extensions (12-bit precision,
            # 3rd/4th table pairs) fall out through the existing
            # precision gate and table-id indirection
            precision, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if precision != 8:
                raise NotImplementedError("non-8-bit precision")
            comps = []
            for i in range(ncomp):
                cid, samp, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, samp >> 4, samp & 0x0F, tq))
            dims = (h, w)
        elif marker == 0xC4:
            p = 0
            while p < len(body):
                tc_th = body[p]
                bits = list(body[p + 1 : p + 17])
                n = sum(bits)
                vals = list(body[p + 17 : p + 17 + n])
                huff[(tc_th >> 4, tc_th & 0x0F)] = _decode_table(
                    bits, vals
                )
                p += 17 + n
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:
            ns = body[0]
            scan_map = {}
            for i in range(ns):
                cid, tables = body[1 + 2 * i], body[2 + 2 * i]
                scan_map[cid] = (tables >> 4, tables & 0x0F)
            entropy_start = pos + 2 + ln
            end = payload.rfind(b"\xff\xd9")
            if end < 0:
                raise ValueError("missing EOI")
            entropy = payload[entropy_start:end]
            break
        pos += 2 + ln
    if comps is None or dims is None or scan_map is None:
        raise ValueError("missing SOF/SOS")
    if entropy is None:
        raise ValueError("missing entropy data")
    h, w = dims
    # untrusted-bytes guard: SOF-declared dimensions drive the plane
    # allocations below — cap them before allocating (see
    # codecs.MAX_DECODE_PIXELS)
    from economic_data_etl_spark.operators.codecs import (
        _check_pixel_budget,
    )

    _check_pixel_budget(w, h, frames=len(comps))
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    factors = tuple((c[1], c[2]) for c in comps)
    chroma_111 = ((1, 1), (1, 1))
    if not (
        factors == ((1, 1),)
        or factors == ((1, 1), *chroma_111)
        or factors == ((2, 2), *chroma_111)
        or factors == ((2, 1), *chroma_111)  # 4:2:2
        or factors == ((1, 2), *chroma_111)  # 4:4:0
    ):
        raise NotImplementedError(f"sampling layout {factors}")
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mh, mw = (h + mcu_h - 1) // mcu_h, (w + mcu_w - 1) // mcu_w
    planes = []
    luts: list[tuple[_HuffTable, _HuffTable]] = []
    unit_cis: list[int] = []
    for ci, (cid, hi, vi, tq) in enumerate(comps):
        if tq not in qtabs:
            raise ValueError("missing quantization table")
        planes.append(
            np.zeros((mh * vi * 8, mw * hi * 8), dtype=np.uint8)
        )
        if cid not in scan_map:
            raise ValueError("SOS/SOF component id mismatch")
        dc_dec = huff.get((0, scan_map[cid][0]))
        ac_dec = huff.get((1, scan_map[cid][1]))
        if dc_dec is None or ac_dec is None:
            raise ValueError("missing Huffman table")
        luts.append((dc_dec, ac_dec))
        unit_cis.extend([ci] * (hi * vi))
    # entropy-decode every block's levels first (inherently sequential
    # bitstream walk, one restart segment at a time) into preallocated
    # (n_blocks, 64) arrays, then IDCT each component's stack in ONE
    # batched matmul — bitwise identical to block-at-a-time (see
    # _idct_pixels_batch / _decode_mcu_run).
    segs, rst_nums = _split_entropy(entropy)
    zz_all = [
        np.zeros((mh * mw * hi * vi, 64), dtype=np.int64)
        for _cid, hi, vi, _tq in comps
    ]
    bi = [0] * len(comps)
    total_mcus = mh * mw
    ri = restart_interval
    seg_i = 0
    done = 0
    while done < total_mcus:
        if seg_i > 0:
            # validate the restart boundary the way sync_restart did
            expected = (done // ri - 1) % 8
            if seg_i >= len(segs):
                raise ValueError("missing restart marker")
            if rst_nums[seg_i - 1] != expected:
                raise ValueError("restart marker out of sequence")
        run = min(ri, total_mcus - done) if ri else total_mcus
        p = _decode_mcu_run(
            segs[seg_i],
            run,
            unit_cis,
            luts,
            zz_all,
            bi,
            seg_i + 1 < len(segs),
        )
        done += run
        if done < total_mcus:
            # pad bits (and unstuffed 0xFF pad bytes) may remain; any
            # other unconsumed data means the marker was not where the
            # old reader required it
            if segs[seg_i][(p + 7) >> 3 :].strip(b"\xff"):
                raise ValueError("missing restart marker")
            if seg_i + 1 >= len(segs):
                raise ValueError("missing restart marker")
        seg_i += 1
    for ci, (cid, hi, vi, tq) in enumerate(comps):
        zz = zz_all[ci]
        if zz.shape[0] == 0:
            continue
        levels = np.zeros((zz.shape[0], 64), dtype=np.int64)
        levels[:, _ZIG_FLAT] = zz
        pix = _idct_pixels_batch(
            levels.reshape(-1, 8, 8), qtabs[tq]
        )
        # analytic block positions in arrival order (MCU-major)
        karr = np.arange(zz.shape[0])
        mcu_idx, r = karr // (hi * vi), karr % (hi * vi)
        by = (mcu_idx // mw) * vi + r // hi
        bx = (mcu_idx % mw) * hi + r % hi
        plane4 = planes[ci].reshape(mh * vi, 8, mw * hi, 8)
        plane4[by, :, bx, :] = pix
    if len(comps) == 1:
        return planes[0][:h, :w]
    out_planes = []
    for ci, (cid, hi, vi, tq) in enumerate(comps):
        ch = (h * vi + vmax - 1) // vmax
        cw = (w * hi + hmax - 1) // hmax
        plane = planes[ci][:ch, :cw]
        if (hi, vi) != (hmax, vmax):  # replicate-upsample chroma
            plane = np.repeat(
                np.repeat(plane, vmax // vi, axis=0), hmax // hi, axis=1
            )[:h, :w]
        out_planes.append(plane[:h, :w])
    ycc = np.stack(out_planes, axis=2)
    return ycbcr_to_rgb(ycc)


def decode_jpeg_gray(payload: bytes) -> np.ndarray:
    """Single-component entry: decode and require a grayscale result
    (the closed-form certification path)."""
    img = decode_jpeg(payload)
    if img.ndim != 2:
        raise ValueError("not a single-component JPEG")
    return img


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
