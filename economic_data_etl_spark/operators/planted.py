"""Provably-separated planted image universe for near-dup certification.

The pHash / video near-dup catalog queries plant a controlled image
corpus and certify the detector against the planting rule. With
rng-seeded textures the cross-doc hash separation is only
probabilistic (~2.4e-10 chance per pair of landing within hamming 8),
which makes the oracle scale-fragile: at a large enough corpus a
chance pair adds a partner and flips the value hash. This module
replaces chance with a THEOREM.

Construction — control the hash bits directly:
- phash64 (operators/phash.py) box-resamples to 32x32, takes the
  orthonormal 32x32 2D DCT, and thresholds the top-left 8x8 block
  against the median of its 63 AC coefficients. Both steps are exactly
  invertible from the coefficient side: a 64x64 texture built as the
  2x pixel-replication of a 32x32 image recovers that image EXACTLY
  under the box resample (means of constant 2x2 blocks), and the
  32x32 image is synthesized as the inverse DCT of a coefficient
  array we choose.
- The 63 AC slots get a BALANCED +/-c pattern: a 31-bit codeword u in
  slots 1..31, its complement ~u in slots 32..62, and a fixed -c in
  slot 63. Weight is exactly 31 for every index, so the AC median is
  always -c and the thresholded bits reproduce (u, ~u, 0) verbatim —
  the hash equals the construction, bit for bit (uint8 rounding
  perturbs each coefficient by ~0.3 against a +/-24 gap).
- u = BCH(31,16) codeword of the doc index (narrow-sense, designed
  distance 7; true minimum distance 7, verified EXHAUSTIVELY over all
  65535 nonzero codewords in tests/test_planted.py). Complement
  doubling gives pairwise hash distance >= 14 between ANY two planted
  indices — so with detector threshold 7 and re-encode drift <= 3 bits
  per image, a cross-index pair can NEVER match (14 - 3 - 3 > 7),
  at any corpus size up to the 2^16 index space.

Certified bound: indices must stay below 2**16 (the BCH message
space). The catalog queries use index = 2*doc_id (+1 for decoys),
so the planting is collision-free for corpora up to 32768 documents —
covering every driver SF; a larger fixture corpus needs a longer code,
not a different argument.
"""

from __future__ import annotations

import numpy as np

# GF(2^5) modulus x^5 + x^2 + 1 (a primitive polynomial over GF(2))
_GF32_POLY = 0b100101
_INDEX_SPACE = 1 << 16


def _gf32_minimal_poly(exp: int) -> int:
    """Minimal polynomial (bitmask, LSB = x^0) of alpha**exp over
    GF(2), alpha a root of x^5 + x^2 + 1: product of (x - alpha^e)
    over the cyclotomic coset {exp * 2^i mod 31}."""
    coset = set()
    e = exp % 31
    while e not in coset:
        coset.add(e)
        e = (e * 2) % 31
    # polynomial with coefficients in GF(32), coeffs[i] = coeff of x^i
    alpha = [1 << e for e in range(5)]  # alpha^e as field elements

    def gf_mul(a: int, b: int) -> int:
        r = 0
        while b:
            if b & 1:
                r ^= a
            b >>= 1
            a <<= 1
            if a & 0b100000:
                a ^= _GF32_POLY
        return r

    def alpha_pow(e: int) -> int:
        r = 1
        for _ in range(e % 31):
            r = gf_mul(r, 2)  # alpha == x == element 0b10
        return r

    poly = [1]  # start with constant 1 (the empty product)
    for e in sorted(coset):
        root = alpha_pow(e)
        # poly *= (x + root)
        nxt = [0] * (len(poly) + 1)
        for i, c in enumerate(poly):
            nxt[i + 1] ^= c  # * x
            nxt[i] ^= gf_mul(c, root)  # * root
        poly = nxt
    # all coefficients must collapse to GF(2)
    mask = 0
    for i, c in enumerate(poly):
        if c not in (0, 1):
            raise AssertionError("minimal polynomial not over GF(2)")
        mask |= c << i
    return mask


def _poly_mul_gf2(a: int, b: int) -> int:
    r = 0
    while b:
        if b & 1:
            r ^= a
        a <<= 1
        b >>= 1
    return r


def bch31_generator() -> int:
    """Generator polynomial of the narrow-sense BCH(31,16) code
    (designed distance 7): lcm of the minimal polynomials of alpha,
    alpha^3, alpha^5 — three distinct degree-5 polynomials, so
    deg g = 15 and k = 16."""
    g = 1
    for e in (1, 3, 5):
        g = _poly_mul_gf2(g, _gf32_minimal_poly(e))
    return g


_BCH_G = bch31_generator()


def bch31_codeword(msg: int) -> int:
    """31-bit BCH(31,16) codeword of a 16-bit message: c(x) =
    m(x) * g(x). Linear and injective; pairwise hamming distance
    >= 7 (exhaustively verified in tests/test_planted.py)."""
    if not 0 <= msg < _INDEX_SPACE:
        raise ValueError(
            f"planted index {msg} outside the certified BCH message "
            f"space [0, {_INDEX_SPACE})"
        )
    return _poly_mul_gf2(msg, _BCH_G)


def _dct_matrix(n: int) -> np.ndarray:
    return np.array(
        [
            [
                (np.sqrt(1 / n) if u == 0 else np.sqrt(2 / n))
                * np.cos((2 * x + 1) * u * np.pi / (2 * n))
                for x in range(n)
            ]
            for u in range(n)
        ],
        dtype=np.float64,
    )


_M32 = _dct_matrix(32)
_AC_MAG = 24.0  # +/- gap 48 vs ~0.3 uint8-rounding noise per coeff


def expected_phash(index: int) -> int:
    """The 64-bit pHash every planted texture provably produces:
    bit layout (MSB-first over the raveled 8x8 block) = DC 0, then
    codeword bits, then complement bits, then the fixed 0 slot."""
    cw = bch31_codeword(index)
    bits = [0]  # DC forced 0 by phash64
    bits += [(cw >> i) & 1 for i in range(31)]
    bits += [1 - ((cw >> i) & 1) for i in range(31)]
    bits += [0]  # fixed -c slot
    v = 0
    for b in bits:
        v = (v << 1) | b
    return v


def planted_texture(index: int) -> np.ndarray:
    """Deterministic 64x64 uint8 texture whose pHash EQUALS
    expected_phash(index) (pinned bit-for-bit in
    tests/test_planted.py). Synthesized in DCT space: the 8x8
    low-frequency block carries the balanced +/-24 codeword pattern,
    everything else is zero; pixel range stays inside [0, 255]
    (|AC sum| <= 63 * 24 / 16 < 95 around the 128 DC), so uint8
    quantization never clips and perturbs each coefficient by ~0.3 —
    five orders of magnitude inside the +/-24 decision margin."""
    cw = bch31_codeword(index)
    pattern = np.empty(63, dtype=np.float64)
    for i in range(31):
        bit = (cw >> i) & 1
        pattern[i] = _AC_MAG if bit else -_AC_MAG
        pattern[31 + i] = -pattern[i]
    pattern[62] = -_AC_MAG  # fixed slot: keeps AC weight at 31 exactly
    blk = np.empty(64, dtype=np.float64)
    blk[0] = 128.0 * 32.0  # DC: mean 128 under the orthonormal DCT
    blk[1:] = pattern
    coeffs = np.zeros((32, 32), dtype=np.float64)
    coeffs[:8, :8] = blk.reshape(8, 8)
    small = _M32.T @ coeffs @ _M32  # orthonormal: inverse == transpose
    img32 = np.clip(np.round(small), 0, 255).astype(np.uint8)
    # 2x pixel replication: the 32x32 box resample inside phash64
    # recovers img32 exactly (means of constant 2x2 blocks)
    return np.repeat(np.repeat(img32, 2, axis=0), 2, axis=1)
