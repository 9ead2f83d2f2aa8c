"""Video/audio near-dup detectors (operators/phash.py video join +
operators/audiofp.py): the banded/token candidate generation must be
EXACTLY equivalent to brute-force all-pairs evaluation of the same
predicate — the candidates-only plans are a scale optimization, never
an approximation (within the pigeonhole guarantee) — plus the
provable-separation properties the catalog oracles rely on.
"""

from __future__ import annotations

import itertools

import numpy as np
import pytest
from pyspark.sql import functions as F


def _brute_force_video_pairs(
    rows: list[tuple[int, int, int]],
    max_hamming: int = 7,
    min_match_frac: float = 0.5,
) -> set[tuple[int, int, int]]:
    """All-pairs reference of the majority-of-aligned-keyframes rule."""
    by_vid: dict[int, dict[int, int]] = {}
    for vid, fidx, h in rows:
        by_vid.setdefault(vid, {})[fidx] = h
    out = set()
    for a, b in itertools.combinations(sorted(by_vid), 2):
        fa, fb = by_vid[a], by_vid[b]
        matched = sum(
            1
            for fidx in set(fa) & set(fb)
            if bin(fa[fidx] ^ fb[fidx]).count("1") <= max_hamming
        )
        if matched > min_match_frac * min(len(fa), len(fb)):
            out.add((a, b, matched))
    return out


class TestVideoNearDup:
    def test_banded_equals_brute_force(self, spark):
        # corpus exercising every regime: exact twins, twins with
        # per-frame drift up to the threshold, a pair exactly AT the
        # hamming boundary, sub-majority partial matches, and
        # unrelated videos
        from economic_data_etl_spark.operators.phash import (
            near_dup_videos_by_phash,
        )

        rng = np.random.default_rng(3)
        rows: list[tuple[int, int, int]] = []
        base_hashes: dict[int, list[int]] = {}
        for vid in range(12):
            n = 3 + vid % 3
            hs = [int(rng.integers(0, 1 << 63)) for _ in range(n)]
            base_hashes[vid] = hs
            rows += [(vid, 2 * i, h) for i, h in enumerate(hs)]
        # 100+vid = drifted twin: flip `vid % 8` bits on each keyframe
        # (vid=7 -> hamming 7, exactly at the threshold)
        for vid in range(8):
            for i, h in enumerate(base_hashes[vid]):
                flip = 0
                # bits 0..62 only: flipping bit 63 of an int64-ranged
                # hash would overflow Spark's LongType
                for bit in rng.choice(63, size=vid % 8, replace=False):
                    flip |= 1 << int(bit)
                rows.append((100 + vid, 2 * i, h ^ flip))
        # 200 = sub-majority partial: matches vid 8 on 1 of 4 frames
        rows += [(200, 0, base_hashes[8][0])]
        rows += [
            (200, 2 * i, int(rng.integers(0, 1 << 63)))
            for i in (1, 2, 3)
        ]
        df = spark.createDataFrame(
            rows, "video_id long, frame_idx long, phash long"
        )
        got = {
            (r["id_a"], r["id_b"], r["n_matched"])
            for r in near_dup_videos_by_phash(df).collect()
        }
        assert got == _brute_force_video_pairs(rows)
        # the drifted twins must all be found (recall at hamming <= 7)
        for vid in range(8):
            assert any(p[:2] == (vid, 100 + vid) for p in got), vid
        # the sub-majority partial must NOT match
        assert not any(200 in p[:2] for p in got)

    def test_threshold_beyond_band_guarantee_rejected(self, spark):
        from economic_data_etl_spark.operators.phash import (
            near_dup_videos_by_phash,
        )

        df = spark.createDataFrame(
            [(1, 0, 5)], "video_id long, frame_idx long, phash long"
        )
        with pytest.raises(ValueError):
            near_dup_videos_by_phash(df, max_hamming=8)

    def test_cross_position_frames_never_pair(self, spark):
        # identical hashes at DIFFERENT frame indices are not a match:
        # the join key includes the frame index (aligned-keyframe rule)
        from economic_data_etl_spark.operators.phash import (
            near_dup_videos_by_phash,
        )

        rows = [(1, 0, 42), (1, 2, 43), (2, 2, 42), (2, 4, 43)]
        df = spark.createDataFrame(
            rows, "video_id long, frame_idx long, phash long"
        )
        assert near_dup_videos_by_phash(df).count() == 0


class TestAudioFingerprint:
    def test_token_join_equals_brute_force(self, spark):
        from economic_data_etl_spark.operators.audiofp import (
            fingerprint_tokens,
            near_dup_audio_by_tokens,
            planted_tone_signal,
        )

        # signals: planted cubics + handcrafted overlaps built by
        # splicing segments so shared-token counts span 0..7
        sigs = {i: planted_tone_signal(i) for i in range(10)}
        sig0 = planted_tone_signal(0)
        for k, cut in ((20, 2), (21, 4), (22, 6)):
            # first `cut` segments from signal 0, rest from signal k-15
            other = planted_tone_signal(k - 15)
            seg = 64 * 3
            sigs[k] = np.concatenate(
                [sig0[: cut * seg], other[cut * seg :]]
            )
        toks = {
            i: set(fingerprint_tokens(s).tolist())
            for i, s in sigs.items()
        }
        rows = [
            (i, int(t)) for i, ts in toks.items() for t in sorted(ts)
        ]
        df = spark.createDataFrame(rows, "audio_id long, token long")
        got = {
            (r["id_a"], r["id_b"], r["n_shared"])
            for r in near_dup_audio_by_tokens(df).collect()
        }
        want = {
            (a, b, len(toks[a] & toks[b]))
            for a, b in itertools.combinations(sorted(toks), 2)
            if len(toks[a] & toks[b]) >= 4
        }
        assert got == want
        # the splice sharing 2/4/6 segments shares cut-1 tokens (the
        # pairs fully inside the copied prefix): only cut=6 (5 shared)
        # crosses the threshold... verify against the brute-force set
        assert (0, 22, 5) in got
        assert not any({a, b} == {0, 20} for a, b, _ in got)

    def test_recall_certificate_vs_exact_pairs(self):
        # RECALL: every re-encoded twin (both G.711 laws AND IMA
        # ADPCM framing survivors) must share >= the threshold with
        # its original; SEPARATION: distinct planted indices share
        # <= 2 tokens (cubic interpolation bound), checked exhaustively
        # over a 200-index sample
        from economic_data_etl_spark.operators.audiofp import (
            MIN_SHARED_TOKENS,
            fingerprint_tokens,
            planted_tone_signal,
        )
        from economic_data_etl_spark.operators.codecs import (
            decode_wav,
            encode_wav_adpcm,
            encode_wav_g711,
        )

        toks = [
            set(fingerprint_tokens(planted_tone_signal(i)).tolist())
            for i in range(200)
        ]
        worst = max(
            len(toks[i] & toks[j])
            for i in range(200)
            for j in range(i + 1, 200)
        )
        assert worst <= 2 < MIN_SHARED_TOKENS
        for i in range(0, 40):
            s = planted_tone_signal(i)
            encs = [
                encode_wav_g711(s, 8000, law="mulaw"),
                encode_wav_g711(s, 8000, law="alaw"),
                encode_wav_adpcm(s, 8000),
            ]
            for li, enc in enumerate(encs):
                _, dec = decode_wav(enc)
                shared = len(
                    toks[i]
                    & set(fingerprint_tokens(dec[:, 0]).tolist())
                )
                assert shared >= MIN_SHARED_TOKENS, (i, li, shared)

    def test_segment_bins_edge_cases(self):
        from economic_data_etl_spark.operators.audiofp import (
            fingerprint_tokens,
            segment_bins,
        )

        assert segment_bins(np.zeros(0, dtype=np.int16)).size == 0
        assert fingerprint_tokens(np.zeros(100, dtype=np.int16)).size == 0
        # one full segment -> one bin, still no pair token
        one = np.ones(64 * 3, dtype=np.int16)
        assert segment_bins(one).size == 1
        assert fingerprint_tokens(one).size == 0

    def test_planted_index_bound_enforced(self):
        from economic_data_etl_spark.operators.audiofp import (
            planted_tone_signal,
        )

        with pytest.raises(ValueError):
            planted_tone_signal(29**4)


class TestIncrementalPhash:
    def test_batch_vs_index_equals_brute_force(self, spark):
        # banded batch-vs-index join == all-pairs evaluation of the
        # same predicate, and NEVER emits batch-batch or index-index
        # pairs (the O(batch) incremental contract)
        import numpy as np

        from economic_data_etl_spark.operators.phash import (
            near_dup_pairs_by_phash_vs_index,
        )

        rng = np.random.default_rng(11)
        index = [(i, int(rng.integers(0, 1 << 62))) for i in range(30)]
        batch = []
        for b in range(12):
            if b % 3 == 0:  # drifted copy of index member b
                flip = 0
                for bit in rng.choice(63, size=b % 8, replace=False):
                    flip |= 1 << int(bit)
                batch.append((100 + b, index[b][1] ^ flip))
            else:
                batch.append((100 + b, int(rng.integers(0, 1 << 62))))
        # duplicate hash INSIDE the batch: must not produce a pair
        batch.append((200, batch[0][1]))
        bdf = spark.createDataFrame(batch, "id long, phash long")
        xdf = spark.createDataFrame(index, "id long, phash long")
        got = {
            (r["batch_id"], r["index_id"], r["hamming"])
            for r in near_dup_pairs_by_phash_vs_index(
                bdf, xdf
            ).collect()
        }
        want = {
            (bi, xi, bin(bh ^ xh).count("1"))
            for bi, bh in batch
            for xi, xh in index
            if bin(bh ^ xh).count("1") <= 7
        }
        assert got == want
        assert all(g[0] >= 100 and g[1] < 100 for g in got)
        assert got, "fixture must produce matches"

    def test_threshold_guard(self, spark):
        import pytest

        from economic_data_etl_spark.operators.phash import (
            near_dup_pairs_by_phash_vs_index,
        )

        df = spark.createDataFrame([(1, 5)], "id long, phash long")
        with pytest.raises(ValueError):
            near_dup_pairs_by_phash_vs_index(df, df, max_hamming=8)
