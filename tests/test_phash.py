"""Perceptual-hash operator tests (operators/phash.py)."""

from __future__ import annotations

import numpy as np
import pytest

from economic_data_etl_spark.operators.phash import (
    N_BANDS,
    near_dup_pairs_by_phash,
    phash64,
)


def _texture(seed: int, n: int = 64) -> np.ndarray:
    rng = np.random.default_rng(seed)
    k = n // 8
    return np.repeat(
        np.repeat(rng.integers(0, 256, (8, 8)), k, axis=0), k, axis=1
    ).astype(np.uint8)


def _ham(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


class TestHash:
    def test_deterministic_and_64bit(self):
        img = _texture(1)
        h = phash64(img)
        assert h == phash64(img.copy())
        assert 0 <= h < (1 << 64)
        assert (h >> 63) == 0  # DC bit forced 0

    def test_jpeg_recompression_is_near(self):
        from economic_data_etl_spark.operators.jpeg import (
            decode_jpeg,
            encode_jpeg_gray,
        )

        for seed in range(10):
            img = _texture(seed)
            twin = decode_jpeg(encode_jpeg_gray(img))
            assert _ham(phash64(img), phash64(twin)) <= 3

    def test_distinct_textures_are_far(self):
        hashes = [phash64(_texture(s)) for s in range(15)]
        for i in range(len(hashes)):
            for j in range(i + 1, len(hashes)):
                assert _ham(hashes[i], hashes[j]) >= 12

    def test_intensity_offset_invariance(self):
        # a constant offset moves only the (excluded) DC coefficient
        rng = np.random.default_rng(3)
        img = rng.integers(0, 200, (48, 48)).astype(np.uint8)
        assert phash64(img) == phash64(img + 10)

    def test_color_input_and_odd_dims(self):
        rng = np.random.default_rng(4)
        img = rng.integers(0, 256, (41, 53, 3)).astype(np.uint8)
        h = phash64(img)
        assert 0 <= h < (1 << 64)
        with pytest.raises(ValueError):
            phash64(np.zeros((0, 5), np.uint8))


class TestBandedJoin:
    def test_matches_brute_force_within_pigeonhole_radius(self, spark):
        # pigeonhole: with 8 bands, every pair at hamming <= 7 shares
        # a band — the banded join must find EXACTLY the brute-force
        # pairs for any threshold <= 7
        rng = np.random.default_rng(7)
        base = [int(rng.integers(0, 1 << 63)) for _ in range(30)]
        rows = [(i, h) for i, h in enumerate(base)]
        nxt = len(rows)
        for i in range(0, 30, 5):  # plant near twins: flip <= 3 bits
            h = base[i]
            # bits 0..62 only: real hashes keep bit 63 clear (DC
            # excluded), and Spark longs are signed
            for b in rng.choice(63, size=int(rng.integers(1, 4)),
                                replace=False):
                h ^= 1 << int(b)
            rows.append((nxt, h))
            nxt += 1
        df = spark.createDataFrame(rows, "id long, phash long")
        got = {
            (r["id_a"], r["id_b"], r["hamming"])
            for r in near_dup_pairs_by_phash(
                df, max_hamming=7
            ).collect()
        }
        want = set()
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                d = _ham(rows[i][1] & ((1 << 64) - 1),
                         rows[j][1] & ((1 << 64) - 1))
                if d <= 7:
                    want.add((rows[i][0], rows[j][0], d))
        assert got == want
        assert N_BANDS == 8
