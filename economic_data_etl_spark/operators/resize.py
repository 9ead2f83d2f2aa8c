"""Real image resizing: exact integer box-mean downsampling.

Upgrades the early-round byte-averaging resize stub
(operators/multimodal.py:resize_media) to a REAL pixel-space resize
now that the decode path exists: decode the payload, partition the
pixel grid into out_h x out_w boxes with the standard floor-edge rule
(edge_i = (i * dim) // out), and emit each box's FLOOR-OF-MEAN as the
output pixel — computed entirely in int64 (sum // area), so the
result is bit-exact, platform-independent, and reproducible by a SQL
engine from the raw pixel values. No interpolation kernel, no float.

Box means are the correct antialiasing filter for large downsampling
ratios (every source pixel contributes exactly once — the same exact
area-mean construction the pHash front-end uses); for upsampling the
same edge rule degenerates to replicate-sampling, matching the
chroma upsampling convention in the JPEG codec.

Scale: per-row independent (Arrow batches); the two reduceat passes
are O(pixels) with no Python-level loops.
"""

from __future__ import annotations

import numpy as np


def box_edges(dim: int, out: int) -> np.ndarray:
    """Standard floor partition edges: edge_i = (i * dim) // out for
    i in 0..out (monotone, covers [0, dim) exactly)."""
    return (np.arange(out + 1) * dim) // out


def box_resize_exact(
    img: np.ndarray, out_h: int, out_w: int
) -> np.ndarray:
    """(h, w) or (h, w, c) uint8 -> (out_h, out_w[, c]) uint8 where
    each output pixel is floor(sum(box) / area(box)) in exact integer
    arithmetic."""
    if out_h < 1 or out_w < 1:
        raise ValueError("output dims must be positive")
    a = img.astype(np.int64)
    color = a.ndim == 3
    if not color:
        a = a[:, :, None]
    h, w, c = a.shape
    if h < 1 or w < 1:
        raise ValueError("empty image")
    if out_h > h or out_w > w:
        # replicate-style upsample via index mapping (same edge rule
        # run inversely); keeps the operator total on any dims
        ys = (np.arange(out_h) * h) // out_h
        xs = (np.arange(out_w) * w) // out_w
        out = a[ys][:, xs]
        return out[:, :, 0].astype(np.uint8) if not color else out.astype(
            np.uint8
        )
    ys = box_edges(h, out_h)
    xs = box_edges(w, out_w)
    rows = np.add.reduceat(a, ys[:-1], axis=0)
    cells = np.add.reduceat(rows, xs[:-1], axis=1)
    areas = (
        (ys[1:] - ys[:-1])[:, None] * (xs[1:] - xs[:-1])[None, :]
    )[:, :, None]
    out = cells // areas  # exact floor-of-mean, int64 all the way
    return out[:, :, 0].astype(np.uint8) if not color else out.astype(
        np.uint8
    )
