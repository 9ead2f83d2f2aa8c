"""Motion-compensated video codec (MCDV), from scratch — the
inter-frame-predictive capability next to the MJPEG intra-only path.

The engine's OWN lossless format (honest scope: H.26x/VPx BITSTREAMS
still require a codec library — that documented seam in
operators/codecs.py is unchanged; what this closes is the
motion-compensation capability itself, end to end):

- container: the same RIFF/AVI layout the MJPEG path writes, stream
  fourcc 'MCDV', one '00dc' chunk per frame;
- I-frames (frame 0 and every `gop`-th): b'I' + zlib(raw gray bytes);
- P-frames: b'P' + zlib(per-block motion vectors + mod-256 residuals).
  Each 16x16 block (edge blocks clipped) carries the (dy, dx) in
  [-S, S]^2 minimizing SAD against the RECONSTRUCTED previous frame
  (candidates clamped to the frame; deterministic tie-break: smallest
  (SAD, dy, dx)); the residual byte is (cur - pred) mod 256, so
  reconstruction cur = (pred + r) mod 256 is EXACT — the codec is
  lossless, and compression comes from motion making residuals zero.

Decoding walks the RIFF tree exactly like the MJPEG decoder and folds
P-frames onto the running reconstruction. Everything is numpy + zlib
(stdlib); the Spark side rides the same Arrow per-row lanes as the
JPEG family.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

BLOCK = 16
SEARCH = 4
MAGIC_I = 0x49  # 'I'
MAGIC_P = 0x50  # 'P'


def _sad(a: np.ndarray, b: np.ndarray) -> int:
    return int(
        np.abs(a.astype(np.int32) - b.astype(np.int32)).sum()
    )


def _encode_p(cur: np.ndarray, prev: np.ndarray) -> bytes:
    """One P-frame: motion vectors + mod-256 residual plane."""
    h, w = cur.shape
    mvs = bytearray()
    resid = np.zeros((h, w), dtype=np.uint8)
    for by in range(0, h, BLOCK):
        for bx in range(0, w, BLOCK):
            bh = min(BLOCK, h - by)
            bw = min(BLOCK, w - bx)
            blk = cur[by : by + bh, bx : bx + bw]
            best = None  # (sad, dy, dx)
            for dy in range(-SEARCH, SEARCH + 1):
                sy = by + dy
                if sy < 0 or sy + bh > h:
                    continue
                for dx in range(-SEARCH, SEARCH + 1):
                    sx = bx + dx
                    if sx < 0 or sx + bw > w:
                        continue
                    cand = (
                        _sad(blk, prev[sy : sy + bh, sx : sx + bw]),
                        dy,
                        dx,
                    )
                    if best is None or cand < best:
                        best = cand
            _, dy, dx = best
            mvs.append(dy + SEARCH)
            mvs.append(dx + SEARCH)
            pred = prev[by + dy : by + dy + bh, bx + dx : bx + dx + bw]
            resid[by : by + bh, bx : bx + bw] = (
                blk.astype(np.int16) - pred.astype(np.int16)
            ).astype(np.uint8)  # mod-256 delta
    return bytes([MAGIC_P]) + zlib.compress(
        bytes(mvs) + resid.tobytes(), 6
    )


def _decode_p(
    payload: bytes, prev: np.ndarray
) -> np.ndarray:
    h, w = prev.shape
    raw = zlib.decompress(payload)
    nby = (h + BLOCK - 1) // BLOCK
    nbx = (w + BLOCK - 1) // BLOCK
    n_mv = nby * nbx * 2
    mvs, resid = raw[:n_mv], raw[n_mv:]
    if len(resid) != h * w:
        raise ValueError("P-frame residual size mismatch")
    res = np.frombuffer(resid, dtype=np.uint8).reshape(h, w)
    out = np.zeros((h, w), dtype=np.uint8)
    k = 0
    for by in range(0, h, BLOCK):
        for bx in range(0, w, BLOCK):
            bh = min(BLOCK, h - by)
            bw = min(BLOCK, w - bx)
            dy = mvs[k] - SEARCH
            dx = mvs[k + 1] - SEARCH
            k += 2
            sy, sx = by + dy, bx + dx
            if sy < 0 or sy + bh > h or sx < 0 or sx + bw > w:
                raise ValueError("motion vector out of bounds")
            pred = prev[sy : sy + bh, sx : sx + bw]
            out[by : by + bh, bx : bx + bw] = (
                pred.astype(np.int16)
                + res[by : by + bh, bx : bx + bw].astype(np.int16)
            ).astype(np.uint8)  # mod-256 reconstruction
    return out


def encode_mc_avi(
    frames: list[np.ndarray], fps: int = 10, gop: int = 8
) -> bytes:
    """Encode same-shape (h, w) uint8 gray frames as an MCDV AVI."""
    if not frames:
        raise ValueError("AVI needs at least one frame")
    h, w = frames[0].shape
    chunks: list[bytes] = []
    prev: np.ndarray | None = None
    for t, f in enumerate(frames):
        if f.shape != (h, w):
            raise ValueError("frame shape mismatch")
        if prev is None or t % gop == 0:
            chunks.append(
                bytes([MAGIC_I]) + zlib.compress(f.tobytes(), 6)
            )
            prev = f.copy()
        else:
            chunks.append(_encode_p(f, prev))
            prev = _decode_p(chunks[-1][1:], prev)  # closed loop

    def chunk(fourcc: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) % 2 else b""
        return fourcc + struct.pack("<I", len(data)) + data + pad

    def lst(fourcc: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", fourcc + data)

    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps, 0, 0, 0x10, len(frames), 0, 1, 0, w, h,
        0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MCDV"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0,
                      len(frames), 0, 0xFFFFFFFF, 0)
        + struct.pack("<4H", 0, 0, w, h)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 8, b"MCDV", w * h,
        0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(
        b"movi", b"".join(chunk(b"00dc", c) for c in chunks)
    )
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_mc_avi(payload: bytes) -> list[np.ndarray]:
    """Decode an MCDV AVI: I-frames inflate directly, P-frames fold
    motion + residual onto the running reconstruction. Raises
    ValueError on malformed containers or a P-frame with no preceding
    I-frame."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI")
    dims: list[tuple[int, int]] = []

    def walk_hdrl(data: bytes) -> None:
        pos = 0
        while pos + 8 <= len(data):
            fourcc = data[pos : pos + 4]
            (ln,) = struct.unpack("<I", data[pos + 4 : pos + 8])
            body = data[pos + 8 : pos + 8 + ln]
            if fourcc == b"LIST":
                walk_hdrl(body[4:])
            elif fourcc == b"strf" and len(body) >= 24:
                _, w, h = struct.unpack("<Iii", body[:12])
                dims.append((abs(h), w))
            pos += 8 + ln + (ln & 1)

    frames: list[np.ndarray] = []
    prev: np.ndarray | None = None

    def walk_movi(data: bytes) -> None:
        nonlocal prev
        pos = 0
        h, w = dims[0]
        while pos + 8 <= len(data):
            fourcc = data[pos : pos + 4]
            (ln,) = struct.unpack("<I", data[pos + 4 : pos + 8])
            body = data[pos + 8 : pos + 8 + ln]
            if len(body) != ln:
                raise ValueError("truncated movi chunk")
            if fourcc[2:4] in (b"dc", b"db") and ln:
                kind = body[0]
                if kind == MAGIC_I:
                    raw = zlib.decompress(body[1:])
                    if len(raw) != h * w:
                        raise ValueError("I-frame size mismatch")
                    prev = np.frombuffer(
                        raw, dtype=np.uint8
                    ).reshape(h, w)
                elif kind == MAGIC_P:
                    if prev is None:
                        raise ValueError(
                            "P-frame before any I-frame"
                        )
                    prev = _decode_p(body[1:], prev)
                else:
                    raise ValueError("unknown MCDV frame kind")
                frames.append(prev)
            pos += 8 + ln + (ln & 1)

    pos = 12
    while pos + 8 <= len(payload):
        fourcc = payload[pos : pos + 4]
        (ln,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + ln]
        if len(body) != ln:
            raise ValueError("truncated AVI chunk")
        if fourcc == b"LIST":
            if body[:4] == b"hdrl":
                walk_hdrl(body[4:])
            elif body[:4] == b"movi":
                if not dims:
                    raise ValueError("movi before stream header")
                walk_movi(body[4:])
        pos += 8 + ln + (ln & 1)
    if not frames:
        raise ValueError("AVI contains no video frames")
    return frames


def decode_mc_avi_sampled(
    payload: bytes, every_n: int = 1, max_frames: int | None = None
) -> list[tuple[int, np.ndarray]]:
    """Selective decode for the inter-frame codec: [(frame_idx,
    pixels)] for every `every_n`-th frame, up to `max_frames`.

    Inter-frame sampling cannot skip at single-frame granularity (a
    P-frame needs its predecessors), but it CAN skip at GOP
    granularity: the chunk walk collects byte references only, GOPs
    containing no sampled frame are never touched by the entropy
    coder, and a sampled GOP decodes just from its I-frame to its last
    sampled frame. Decode cost is proportional to frames kept x GOP
    depth — the inter-frame analogue of the MJPEG sampler's
    frames-kept bound."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI")
    dims: list[tuple[int, int]] = []
    chunks: list[bytes] = []

    def walk_hdrl(data: bytes) -> None:
        pos = 0
        while pos + 8 <= len(data):
            fourcc = data[pos : pos + 4]
            (ln,) = struct.unpack("<I", data[pos + 4 : pos + 8])
            body = data[pos + 8 : pos + 8 + ln]
            if fourcc == b"LIST":
                walk_hdrl(body[4:])
            elif fourcc == b"strf" and len(body) >= 24:
                _, w, h = struct.unpack("<Iii", body[:12])
                dims.append((abs(h), w))
            pos += 8 + ln + (ln & 1)

    def walk_movi(data: bytes) -> None:
        pos = 0
        while pos + 8 <= len(data):
            fourcc = data[pos : pos + 4]
            (ln,) = struct.unpack("<I", data[pos + 4 : pos + 8])
            body = data[pos + 8 : pos + 8 + ln]
            if len(body) != ln:
                raise ValueError("truncated movi chunk")
            if fourcc[2:4] in (b"dc", b"db") and ln:
                chunks.append(body)  # byte refs only — no decode yet
            pos += 8 + ln + (ln & 1)

    pos = 12
    while pos + 8 <= len(payload):
        fourcc = payload[pos : pos + 4]
        (ln,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + ln]
        if len(body) != ln:
            raise ValueError("truncated AVI chunk")
        if fourcc == b"LIST":
            if body[:4] == b"hdrl":
                walk_hdrl(body[4:])
            elif body[:4] == b"movi":
                if not dims:
                    raise ValueError("movi before stream header")
                walk_movi(body[4:])
        pos += 8 + ln + (ln & 1)
    if not chunks:
        raise ValueError("AVI contains no video frames")

    h, w = dims[0]
    sampled = [
        t for t in range(len(chunks)) if t % every_n == 0
    ]
    if max_frames is not None:
        sampled = sampled[:max_frames]
    want = set(sampled)
    # GOP boundaries: positions of I chunks
    gop_starts = [
        t for t, c in enumerate(chunks) if c[0] == MAGIC_I
    ]
    if not gop_starts or gop_starts[0] != 0:
        raise ValueError("stream does not start with an I-frame")
    out: list[tuple[int, np.ndarray]] = []
    for gi, start in enumerate(gop_starts):
        end = (
            gop_starts[gi + 1]
            if gi + 1 < len(gop_starts)
            else len(chunks)
        )
        in_gop = [t for t in range(start, end) if t in want]
        if not in_gop:
            continue  # entire GOP skipped: entropy coder never runs
        last = max(in_gop)
        raw = zlib.decompress(chunks[start][1:])
        if len(raw) != h * w:
            raise ValueError("I-frame size mismatch")
        prev = np.frombuffer(raw, dtype=np.uint8).reshape(h, w)
        if start in want:
            out.append((start, prev))
        for t in range(start + 1, last + 1):
            if chunks[t][0] != MAGIC_P:
                raise ValueError("unknown MCDV frame kind")
            prev = _decode_p(chunks[t][1:], prev)
            if t in want:
                out.append((t, prev))
    return out
