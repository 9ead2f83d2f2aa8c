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
