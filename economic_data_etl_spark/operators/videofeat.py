"""Video temporal features: frame differencing + scene-cut detection.

The temporal sibling of the frame-sampling operator: decode a video's
frames (the from-scratch MJPEG AVI path), measure adjacent-frame
change (mean absolute pixel difference), and segment into shots where
the change spikes — the standard first pass of any video curation
pipeline (shot boundaries drive keyframe selection, dedup, and
caption alignment). Reference scope note: no media exists in the
reference repo; this extends the multimodal surface.

Certification: on videos built from STATIC SHOTS (every frame inside
a scene is the same deterministic pattern, scenes switch patterns at
known indices), adjacent-frame MAD is exactly 0 inside a scene —
JPEG is lossy but deterministic, so identical inputs decode
identically — and large at the planted cuts, so the detected cut
index list is an integer sequence the DuckDB oracle reconstructs from
the planting rule alone.

Scale: per-row independent (one video per row, Arrow batches);
differencing is vectorized numpy over the decoded frame stack.
"""

from __future__ import annotations

import numpy as np


def frame_mads(frames: list[np.ndarray]) -> np.ndarray:
    """Mean absolute difference between consecutive frames (float64,
    length = n_frames - 1; empty for <2 frames)."""
    if len(frames) < 2:
        return np.zeros(0, dtype=np.float64)
    stack = np.stack(
        [f.astype(np.int64) for f in frames], axis=0
    )
    diffs = np.abs(stack[1:] - stack[:-1])
    return diffs.reshape(diffs.shape[0], -1).mean(axis=1)


def scene_cuts(
    frames: list[np.ndarray], threshold: float = 16.0
) -> list[int]:
    """Indices f where frame f starts a new shot (MAD(f-1, f) >
    threshold). Frame 0 is never a cut."""
    mads = frame_mads(frames)
    return [int(i) + 1 for i in np.flatnonzero(mads > threshold)]


def shot_lengths(n_frames: int, cuts: list[int]) -> list[int]:
    """Shot lengths implied by cut indices over n_frames frames."""
    bounds = [0, *cuts, n_frames]
    return [b - a for a, b in zip(bounds, bounds[1:]) if b > a]
