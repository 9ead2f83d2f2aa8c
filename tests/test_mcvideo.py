"""MCDV motion-compensated codec (operators/mcvideo.py): bit-exact
losslessness on arbitrary frames (any dims, any GOP), a strict
compression win from motion on translating scenes, and loud failures
on malformed streams."""

from __future__ import annotations

import numpy as np
import pytest

from economic_data_etl_spark.operators.mcvideo import (
    decode_mc_avi,
    encode_mc_avi,
)


def _translating(n=8, h=48, w=48, shift=3, doc=5):
    base = np.add.outer(np.arange(h), np.arange(w))
    return [
        ((base + shift * t + doc) % 16 * 16).astype(np.uint8)
        for t in range(n)
    ]


def test_lossless_on_random_frames_any_dims_and_gop():
    rng = np.random.default_rng(7)
    for h, w, gop in ((37, 53, 3), (16, 16, 1), (48, 20, 100)):
        frames = [
            rng.integers(0, 256, (h, w), dtype=np.uint8)
            for _ in range(6)
        ]
        dec = decode_mc_avi(encode_mc_avi(frames, gop=gop))
        assert len(dec) == 6
        assert all(
            np.array_equal(a, b) for a, b in zip(frames, dec)
        )


def test_motion_compensation_beats_all_intra():
    frames = _translating()
    mc = encode_mc_avi(frames, gop=len(frames))
    intra = encode_mc_avi(frames, gop=1)
    assert len(mc) < len(intra)


def test_static_scene_p_frames_are_tiny():
    f = _translating(n=1)[0]
    frames = [f] * 8
    mc = encode_mc_avi(frames, gop=8)
    intra = encode_mc_avi(frames, gop=1)
    # 7 all-zero-residual P-frames (~33 B each) vs 7 more I-frames
    # (~150 B each); container overhead (~190 B) is common to both.
    assert len(mc) < 0.65 * len(intra)


def test_non_aligned_motion_recovered_exactly():
    # 3 px/frame diagonal shift is not block-aligned: the search must
    # still reconstruct exactly (residuals absorb whatever the motion
    # model misses — losslessness never depends on the search quality)
    frames = _translating(shift=3)
    dec = decode_mc_avi(encode_mc_avi(frames, gop=len(frames)))
    assert all(np.array_equal(a, b) for a, b in zip(frames, dec))


def test_malformed_streams_fail_loudly():
    frames = _translating(n=3)
    blob = encode_mc_avi(frames, gop=3)
    with pytest.raises(ValueError):
        decode_mc_avi(blob[:40])  # truncated container
    with pytest.raises(ValueError):
        decode_mc_avi(b"RIFF\x04\x00\x00\x00AVI ")  # no frames
    corrupt = bytearray(blob)
    # flip the first frame-kind byte to an unknown magic
    idx = blob.find(b"00dc") + 8
    corrupt[idx] = 0x5A
    with pytest.raises(ValueError):
        decode_mc_avi(bytes(corrupt))


def test_sampled_equals_every_nth_of_full():
    rng = np.random.default_rng(11)
    frames = [
        rng.integers(0, 256, (32, 32), dtype=np.uint8)
        for _ in range(12)
    ]
    from economic_data_etl_spark.operators.mcvideo import (
        decode_mc_avi_sampled,
    )

    blob = encode_mc_avi(frames, gop=4)
    full = decode_mc_avi(blob)
    for n in (1, 2, 3, 5):
        got = decode_mc_avi_sampled(blob, every_n=n)
        want = [(i, f) for i, f in enumerate(full) if i % n == 0]
        assert [i for i, _ in got] == [i for i, _ in want]
        assert all(
            np.array_equal(a, b)
            for (_, a), (_, b) in zip(got, want)
        )
    assert [
        i for i, _ in decode_mc_avi_sampled(blob, 2, max_frames=3)
    ] == [0, 2, 4]


def test_unsampled_gops_are_truly_skipped():
    """Proof of the GOP-granular seek: corrupt a P-frame inside a GOP
    no sampled frame touches — the sampler must succeed (that GOP's
    entropy coder never runs); sampling INTO the corrupt GOP must
    raise."""
    import struct as _s

    frames = _translating(n=12)
    blob = bytearray(encode_mc_avi(frames, gop=4))
    # find the 6th video chunk (frame idx 5: a P-frame in GOP 2)
    pos = blob.find(b"movi") + 4
    idx = 0
    target = None
    while pos + 8 <= len(blob):
        fourcc = bytes(blob[pos : pos + 4])
        (ln,) = _s.unpack("<I", blob[pos + 4 : pos + 8])
        if fourcc[2:4] == b"dc":
            if idx == 5:
                target = pos + 8
                break
            idx += 1
        pos += 8 + ln + (ln & 1)
    assert target is not None
    blob[target + 1] ^= 0xFF  # corrupt the zlib stream, keep kind byte
    from economic_data_etl_spark.operators.mcvideo import (
        decode_mc_avi_sampled,
    )

    # sample only frames 0 and 8 (GOPs 1 and 3): corrupt GOP 2 skipped
    got = decode_mc_avi_sampled(bytes(blob), every_n=8)
    assert [i for i, _ in got] == [0, 8]
    with pytest.raises(Exception):
        decode_mc_avi_sampled(bytes(blob), every_n=5)  # hits frame 5
