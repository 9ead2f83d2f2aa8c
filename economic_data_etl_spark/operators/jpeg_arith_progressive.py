"""Progressive arithmetic-coded JPEG (ITU-T T.81 SOF10) from scratch.

The last DCT-based JPEG process: progressive scan organization
(spectral selection + successive approximation, Annex G) with the QM
arithmetic entropy coder (Annex D) instead of Huffman. Composes the
two modules that already exist:

- scan orchestration (bands, Al/Ah ladders, interleaved DC MCU walk,
  per-scan restart intervals) reuses jpeg_progressive.py's helpers;
- the entropy layer reuses jpeg_arithmetic.py's QM coder and DC
  statistical model, plus band-parameterized AC models defined here.

Arithmetic progressive is SIMPLER than its Huffman sibling in two
ways that the spec exploits (T.81 G.2): there are NO EOB runs (the
per-block end-of-band decision is a single adaptive binary decision —
run aggregation is a prefix-code workaround), and NO ZRL (zero runs
are coded as repeated adaptive zero/nonzero decisions). Refinement
scans (G.2.2): DC appends one bit per block through the NON-adaptive
fixed bin; AC walks the band — already-nonzero coefficients take one
correction decision at the position's third bin, newly-significant
ones a zero/nonzero decision plus a fixed-bin sign — with the
end-of-band decision asked only past the last history coefficient
(kex), exactly the jdarith/spec walk. Statistics areas reset at every
scan start and at every restart marker.

Certification mirrors the other JPEG modes: identical quantization ⇒
decode must be BIT-IDENTICAL to the baseline round-trip on random
images (gray + color, every chroma layout, Al ladders 0..3, restart
intervals), and the block-constant closed form holds unchanged for
the catalog oracle (every scan's AC contribution is exactly zero on
that subspace). Corrupt bytes stay inside the ValueError /
NotImplementedError contract.
"""

from __future__ import annotations

import struct

import numpy as np

from economic_data_etl_spark.operators.jpeg import (
    _idct_pixels_batch,
    _JFIF_APP0,
    _M,
    _SUBSAMPLE_MODES,
    _ZIG_FLAT,
    _ZIGZAG,
    _dqt_payload,
    _pad_to,
    _round_half_up,
    _seg,
    QTAB,
    QTAB_CHROMA,
    chroma_planes,
    rgb_to_ycbcr,
    ycbcr_to_rgb,
)
from economic_data_etl_spark.operators.jpeg_arithmetic import (
    _AC_STAT_BINS,
    _DC_STAT_BINS,
    _dac_payload,
    _decode_dc,
    _encode_dc,
    _new_stats,
    _QMDecoder,
    _QMEncoder,
    _split_restart_segments,
    AC_KX,
    FIXED_BIN,
)
from economic_data_etl_spark.operators.jpeg_progressive import (
    _comp_grid,
    _mcu_units,
    _quantize_blocks,
    _restart_due,
    _sos,
)


def _fixed() -> bytearray:
    f = _new_stats(1)
    f[0] = FIXED_BIN
    return f


# --------------------------------------------------------------------------
# AC band models (G.2.3; the sequential model of jpeg_arithmetic.py
# parameterized over [ss, se] and the point transform)
# --------------------------------------------------------------------------
def _enc_ac_band_first(
    enc: _QMEncoder,
    stats: bytearray,
    fixed: bytearray,
    zz: np.ndarray,
    ss: int,
    se: int,
    al: int,
) -> None:
    """First AC scan of one block's band: point-transformed values
    (magnitude shift toward zero) under the sequential AC decision
    tree, band-limited. EOB is one adaptive decision per coding event.
    The band is point-transformed in ONE vectorized pass (the per-k
    dict build dominated the encoder profile on sparse blocks), and an
    all-zero band short-circuits to its lone EOB decision — the same
    decision sequence the scalar walk emitted."""
    vals = zz[ss : se + 1]
    mags = np.abs(vals) >> al
    if not mags.any():
        enc.encode(stats, 3 * (ss - 1), 1)  # all-zero band: lone EOB
        return
    band = np.where(vals < 0, -mags, mags).tolist()
    ke = ss + int(np.flatnonzero(mags)[-1])
    k = ss
    while k <= ke:
        st = 3 * (k - 1)
        enc.encode(stats, st, 0)  # not EOB
        while band[k - ss] == 0:
            enc.encode(stats, st + 1, 0)
            k += 1
            st += 3
        enc.encode(stats, st + 1, 1)
        v = band[k - ss]
        if v > 0:
            enc.encode(fixed, 0, 0)
        else:
            v = -v
            enc.encode(fixed, 0, 1)
        st += 2
        m = 0
        v -= 1
        if v:
            enc.encode(stats, st, 1)
            m = 1
            v2 = v
            if v2 >> 1:
                v2 >>= 1
                enc.encode(stats, st, 1)  # X2 shares the X1 bin
                m <<= 1
                st = 189 if k <= AC_KX else 217
                while v2 >> 1:
                    v2 >>= 1
                    enc.encode(stats, st, 1)
                    m <<= 1
                    st += 1
        enc.encode(stats, st, 0)
        st += 14
        mm = m
        while mm >> 1:
            mm >>= 1
            enc.encode(stats, st, 1 if (v & mm) else 0)
        k += 1
    if k <= se:
        enc.encode(stats, 3 * (k - 1), 1)  # EOB


def _dec_ac_band_first(
    dec: _QMDecoder,
    stats: bytearray,
    fixed: bytearray,
    zz: np.ndarray,
    ss: int,
    se: int,
    al: int,
) -> None:
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if dec.decode(stats, st):
            return  # EOB
        while dec.decode(stats, st + 1) == 0:
            k += 1
            st += 3
            if k > se:
                raise ValueError("AC index overflow")
        sign = dec.decode(fixed, 0)
        st += 2
        m = 0
        if dec.decode(stats, st):
            m = 1
            if dec.decode(stats, st):
                m = 2
                st = 189 if k <= AC_KX else 217
                while dec.decode(stats, st):
                    m <<= 1
                    if m == 0x8000:
                        raise ValueError("AC magnitude overflow")
                    st += 1
        v = m
        st += 14
        mm = m
        while mm >> 1:
            mm >>= 1
            if dec.decode(stats, st):
                v |= mm
        v += 1
        zz[k] = (-v if sign else v) << al
        k += 1


def _enc_ac_band_refine(
    enc: _QMEncoder,
    stats: bytearray,
    fixed: bytearray,
    zz: np.ndarray,
    ss: int,
    se: int,
    ah: int,
    al: int,
) -> None:
    """AC refinement scan for one block (G.2.3 / the jdarith walk):
    history coefficients (nonzero at Ah precision) take one correction
    decision at st+2; zero-history positions take a zero/newly-
    significant decision at st+1 (sign through the fixed bin); the
    end-of-band decision is asked only for k past the last history
    coefficient."""
    # history / newly-significant sets in one vectorized pass; the
    # walk itself is decision-sequential. `newly` is ascending and k
    # only grows, so the old per-iteration "any newly >= k" list scan
    # collapses to a pointer.
    vals = zz[ss : se + 1]
    az = np.abs(vals)
    if not az.any():
        # no history, nothing newly significant: the walk's first
        # decision is the EOB (same sequence as the general path)
        enc.encode(stats, 3 * (ss - 1), 1)
        return
    hist_nz = np.flatnonzero((az >> ah) != 0)
    kex = ss + int(hist_nz[-1]) if hist_nz.size else ss - 1
    newly = (
        ss + np.flatnonzero(((az >> ah) == 0) & ((az >> al) != 0))
    ).tolist()
    n_new = len(newly)
    ni = 0
    band = vals.tolist()
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if k > kex:
            while ni < n_new and newly[ni] < k:
                ni += 1
            if ni >= n_new:
                enc.encode(stats, st, 1)  # EOB
                return
            enc.encode(stats, st, 0)
        while True:
            v = band[k - ss]
            av = v if v >= 0 else -v
            if (av >> ah) != 0:  # history: correction bit
                enc.encode(stats, st + 2, (av >> al) & 1)
                break
            if (av >> al) != 0:  # newly significant (must be ±1)
                enc.encode(stats, st + 1, 1)
                enc.encode(fixed, 0, 0 if v > 0 else 1)
                break
            enc.encode(stats, st + 1, 0)
            st += 3
            k += 1
            if k > se:
                raise ValueError("refinement walk overran the band")
        k += 1


def _dec_ac_band_refine(
    dec: _QMDecoder,
    stats: bytearray,
    fixed: bytearray,
    zz: np.ndarray,
    ss: int,
    se: int,
    ah: int,
    al: int,
) -> None:
    p1, m1 = 1 << al, -(1 << al)
    hist_nz = np.flatnonzero((np.abs(zz[ss : se + 1]) >> ah) != 0)
    kex = ss + int(hist_nz[-1]) if hist_nz.size else ss - 1
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if k > kex:
            if dec.decode(stats, st):
                return  # EOB
        while True:
            v = int(zz[k])
            if (abs(v) >> ah) != 0:  # history: correction decision
                if dec.decode(stats, st + 2):
                    zz[k] = v + (p1 if v > 0 else m1)
                break
            if dec.decode(stats, st + 1):  # newly significant
                zz[k] = m1 if dec.decode(fixed, 0) else p1
                break
            st += 3
            k += 1
            if k > se:
                raise ValueError("AC index overflow")
        k += 1


# --------------------------------------------------------------------------
# Scan emitters / consumers (coefs: list of (bh, bw, 64) int32)
# --------------------------------------------------------------------------
def _scan_segments_dc_first(coefs, units, n_comps, al, ri):
    out = bytearray()
    enc = _QMEncoder()
    stats = [_new_stats(_DC_STAT_BINS) for _ in range(n_comps)]
    preds = [0] * n_comps
    ctxs = [0] * n_comps
    for i, unit in enumerate(units):
        n = _restart_due(i, ri)
        if n is not None:
            out += enc.flush()
            out += bytes([0xFF, 0xD0 + n])
            enc = _QMEncoder()
            stats = [_new_stats(_DC_STAT_BINS) for _ in range(n_comps)]
            preds = [0] * n_comps
            ctxs = [0] * n_comps
        for ci, by, bx in unit:
            v = int(coefs[ci][by, bx, 0]) >> al
            ctxs[ci] = _encode_dc(
                enc, stats[ci], v - preds[ci], ctxs[ci]
            )
            preds[ci] = v
    out += enc.flush()
    return bytes(out)


def _scan_segments_dc_refine(coefs, units, al, ri):
    out = bytearray()
    enc = _QMEncoder()
    fixed = _fixed()
    for i, unit in enumerate(units):
        n = _restart_due(i, ri)
        if n is not None:
            out += enc.flush()
            out += bytes([0xFF, 0xD0 + n])
            enc = _QMEncoder()
            fixed = _fixed()
        for ci, by, bx in unit:
            enc.encode(fixed, 0, (int(coefs[ci][by, bx, 0]) >> al) & 1)
    out += enc.flush()
    return bytes(out)


def _scan_segments_ac(coef, cbh, cbw, ss, se, ah, al, ri):
    out = bytearray()
    enc = _QMEncoder()
    stats = _new_stats(_AC_STAT_BINS)
    fixed = _fixed()
    blocks = [(by, bx) for by in range(cbh) for bx in range(cbw)]
    for i, (by, bx) in enumerate(blocks):
        n = _restart_due(i, ri)
        if n is not None:
            out += enc.flush()
            out += bytes([0xFF, 0xD0 + n])
            enc = _QMEncoder()
            stats = _new_stats(_AC_STAT_BINS)
            fixed = _fixed()
        if ah == 0:
            _enc_ac_band_first(
                enc, stats, fixed, coef[by, bx], ss, se, al
            )
        else:
            _enc_ac_band_refine(
                enc, stats, fixed, coef[by, bx], ss, se, ah, al
            )
    out += enc.flush()
    return bytes(out)


def encode_jpeg_arith_progressive(
    img: np.ndarray,
    subsample: bool | str = False,
    al: int = 1,
    restart_interval: int = 0,
) -> bytes:
    """Encode (h, w) gray or (h, w, 3) RGB as a PROGRESSIVE
    arithmetic-coded JPEG (SOF10), with the same scan script as
    encode_jpeg_progressive: interleaved DC first at Al=`al` plus
    refinements to bit 0, then per-component AC bands (1..5)/(6..63)
    first + refinement scans. Quantization is the exact baseline
    expression, so decode equals the baseline round-trip bitwise."""
    if not 0 <= al <= 3:
        raise ValueError("al must be in 0..3")
    ri = restart_interval
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if gray:
        comps = [(1, 1, 1, 0)]
        mh, mw = (h + 7) // 8, (w + 7) // 8
        planes = [_pad_to(img.astype(np.float64), mh * 8, mw * 8)]
        qtabs = [QTAB]
    else:
        if subsample not in _SUBSAMPLE_MODES:
            raise ValueError(f"unknown subsample mode {subsample!r}")
        yh, yv = _SUBSAMPLE_MODES[subsample]
        ycc = rgb_to_ycbcr(img)
        y = ycc[:, :, 0].astype(np.float64)
        cb, cr = chroma_planes(ycc, yh, yv)
        cb, cr = cb.astype(np.float64), cr.astype(np.float64)
        comps = [(1, yh, yv, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
        mcu_h, mcu_w = 8 * yv, 8 * yh
        mh = (h + mcu_h - 1) // mcu_h
        mw = (w + mcu_w - 1) // mcu_w
        planes = [
            _pad_to(y, mh * yv * 8, mw * yh * 8),
            _pad_to(cb, mh * 8, mw * 8),
            _pad_to(cr, mh * 8, mw * 8),
        ]
        qtabs = [QTAB, QTAB_CHROMA, QTAB_CHROMA]

    coefs = [_quantize_blocks(p, q) for p, q in zip(planes, qtabs)]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)

    out = bytearray(b"\xff\xd8" + _seg(0xFFE0, _JFIF_APP0))
    out += _seg(0xFFDB, _dqt_payload(0, QTAB))
    if not gray:
        out += _seg(0xFFDB, _dqt_payload(1, QTAB_CHROMA))
    sof = struct.pack(">BHHB", 8, h, w, len(comps)) + b"".join(
        bytes([cid, (hi << 4) | vi, tq]) for cid, hi, vi, tq in comps
    )
    out += _seg(0xFFCA, sof)
    out += _seg(0xFFCC, _dac_payload(len(comps)))
    if ri:
        out += _seg(0xFFDD, struct.pack(">H", ri))

    # conditioning-table ids: luma 0, chroma 1 (statistics areas are
    # per SCAN in this encoder, so the ids only label the SOS bytes)
    tids = [0 if ci == 0 else 1 for ci in range(len(comps))]
    scan_comps = [
        (comps[ci][0], tids[ci], tids[ci]) for ci in range(len(comps))
    ]
    units = _mcu_units(mh, mw, comps)
    out += _sos(scan_comps, 0, 0, 0, al)
    out += _scan_segments_dc_first(coefs, units, len(comps), al, ri)
    for a in range(al, 0, -1):
        out += _sos(scan_comps, 0, 0, a, a - 1)
        out += _scan_segments_dc_refine(coefs, units, a - 1, ri)
    bands = [(1, 5), (6, 63)]
    for ci, (cid, hi, vi, _tq) in enumerate(comps):
        cbh, cbw = _comp_grid(h, w, hi, vi, hmax, vmax)
        for ss, se in bands:
            out += _sos([(cid, tids[ci], tids[ci])], ss, se, 0, al)
            out += _scan_segments_ac(
                coefs[ci], cbh, cbw, ss, se, 0, al, ri
            )
    for a in range(al, 0, -1):
        for ci, (cid, hi, vi, _tq) in enumerate(comps):
            cbh, cbw = _comp_grid(h, w, hi, vi, hmax, vmax)
            for ss, se in bands:
                out += _sos([(cid, tids[ci], tids[ci])], ss, se, a, a - 1)
                out += _scan_segments_ac(
                    coefs[ci], cbh, cbw, ss, se, a, a - 1, ri
                )
    out += b"\xff\xd9"
    return bytes(out)


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------
def _entropy_segment(payload: bytes, start: int) -> tuple[bytes, int]:
    """Same contract as jpeg_progressive._entropy_segment (stuffed
    0x00 after data 0xFF, RSTn internal to the scan)."""
    from economic_data_etl_spark.operators.jpeg_progressive import (
        _entropy_segment as _hseg,
    )

    return _hseg(payload, start)


def decode_arith_progressive(payload: bytes) -> np.ndarray:
    """Decode a progressive arithmetic (SOF10) JPEG — gray → (h, w),
    YCbCr (4:4:4/4:2:0/4:2:2/4:4:0) → (h, w, 3) RGB. Accumulates
    coefficients across scans (statistics and the QM coder reset per
    scan and per restart segment), then runs the shared dequantize →
    IDCT → assemble tail once at EOI."""
    from economic_data_etl_spark.operators.jpeg_arithmetic import (
        AC_KX as _KX,
        DC_L,
        DC_U,
    )

    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    comps = None
    dims = None
    coefs = None
    mh = mw = hmax = vmax = 0
    saw_scan = False
    restart_interval = 0
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = payload[pos + 1]
        if marker == 0xD9:
            break
        if marker == 0xFF:
            pos += 1
            continue
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
                if p + 65 > len(body):
                    raise ValueError("truncated DQT")
                q = np.zeros((8, 8), dtype=np.int64)
                for i, (r, c) in enumerate(_ZIGZAG):
                    q[r, c] = body[p + 1 + i]
                qtabs[pq_tq & 0x0F] = q
                p += 65
        elif marker == 0xCC:
            p = 0
            while p + 1 < len(body):
                tc_tb, val = body[p], body[p + 1]
                if (tc_tb >> 4) == 0:
                    if val != (DC_U << 4) | DC_L:
                        raise NotImplementedError(
                            "non-default DC conditioning"
                        )
                else:
                    if val != _KX:
                        raise NotImplementedError(
                            "non-default AC conditioning"
                        )
                p += 2
        elif marker == 0xCA:
            if comps is not None:
                raise ValueError("multiple SOF segments")
            precision, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if precision != 8:
                raise NotImplementedError("non-8-bit precision")
            comps = []
            for i in range(ncomp):
                cid, samp, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, samp >> 4, samp & 0x0F, tq))
            dims = (h, w)
            from economic_data_etl_spark.operators.codecs import (
                _check_pixel_budget,
            )

            _check_pixel_budget(w, h, frames=len(comps))
            factors = tuple((c[1], c[2]) for c in comps)
            chroma_111 = ((1, 1), (1, 1))
            if not (
                factors == ((1, 1),)
                or factors == ((1, 1), *chroma_111)
                or factors == ((2, 2), *chroma_111)
                or factors == ((2, 1), *chroma_111)
                or factors == ((1, 2), *chroma_111)
            ):
                raise NotImplementedError(f"sampling layout {factors}")
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mh = (h + 8 * vmax - 1) // (8 * vmax)
            mw = (w + 8 * hmax - 1) // (8 * hmax)
            coefs = [
                np.zeros((mh * vi, mw * hi, 64), dtype=np.int32)
                for _cid, hi, vi, _tq in comps
            ]
        elif marker in (
            0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
            0xC9, 0xCB, 0xCD, 0xCE, 0xCF,
        ):
            raise ValueError("mixed/unsupported frame in SOF10 stream")
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:
            if comps is None or coefs is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = []
            for i in range(ns):
                cid = body[1 + 2 * i]
                ci = next(
                    (j for j, c in enumerate(comps) if c[0] == cid), None
                )
                if ci is None:
                    raise ValueError("SOS/SOF component id mismatch")
                scan.append(ci)
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ah_al = body[3 + 2 * ns]
            ah, al = ah_al >> 4, ah_al & 0x0F
            if not (ss <= se <= 63) or al > 13 or ah > 13:
                raise ValueError("bad spectral selection / approximation")
            entropy, pos = _entropy_segment(payload, pos + 2 + ln)
            segments = _split_restart_segments(entropy)
            ri = restart_interval
            if ss == 0:
                if se != 0:
                    raise ValueError("DC scan must have Se = 0")
                if len(scan) > 1:
                    units = _mcu_units(
                        mh, mw, [comps[ci] for ci in scan]
                    )
                    units = [
                        [(scan[ci], by, bx) for ci, by, bx in unit]
                        for unit in units
                    ]
                else:
                    ci = scan[0]
                    cbh, cbw = _comp_grid(
                        *dims, comps[ci][1], comps[ci][2], hmax, vmax
                    )
                    units = [
                        [(ci, by, bx)]
                        for by in range(cbh)
                        for bx in range(cbw)
                    ]
                n_units = len(units)
                expected = (
                    (n_units + ri - 1) // ri if ri else 1
                )
                if len(segments) != expected:
                    raise ValueError("restart segment count mismatch")
                seg_idx = 0
                dec = _QMDecoder(segments[0])
                if ah == 0:
                    stats = {
                        ci: _new_stats(_DC_STAT_BINS)
                        for ci in {u[0] for unit in units for u in unit}
                    }
                    preds = {ci: 0 for ci in stats}
                    ctxs = {ci: 0 for ci in stats}
                    for i, unit in enumerate(units):
                        if _restart_due(i, ri) is not None:
                            seg_idx += 1
                            dec = _QMDecoder(segments[seg_idx])
                            for ci2 in stats:
                                stats[ci2] = _new_stats(_DC_STAT_BINS)
                                preds[ci2] = 0
                                ctxs[ci2] = 0
                        for ci2, by, bx in unit:
                            diff, ctxs[ci2] = _decode_dc(
                                dec, stats[ci2], ctxs[ci2]
                            )
                            preds[ci2] += diff
                            coefs[ci2][by, bx, 0] = preds[ci2] << al
                else:
                    if ah != al + 1:
                        raise ValueError("bad successive approximation")
                    fixed = _fixed()
                    for i, unit in enumerate(units):
                        if _restart_due(i, ri) is not None:
                            seg_idx += 1
                            dec = _QMDecoder(segments[seg_idx])
                            fixed = _fixed()
                        for ci2, by, bx in unit:
                            if dec.decode(fixed, 0):
                                coefs[ci2][by, bx, 0] = int(
                                    coefs[ci2][by, bx, 0]
                                ) | (1 << al)
            else:
                if len(scan) != 1:
                    raise ValueError("AC scans must be non-interleaved")
                ci = scan[0]
                cbh, cbw = _comp_grid(
                    *dims, comps[ci][1], comps[ci][2], hmax, vmax
                )
                blocks = [
                    (by, bx) for by in range(cbh) for bx in range(cbw)
                ]
                expected = (
                    (len(blocks) + ri - 1) // ri if ri else 1
                )
                if len(segments) != expected:
                    raise ValueError("restart segment count mismatch")
                if ah and ah != al + 1:
                    raise ValueError("bad successive approximation")
                seg_idx = 0
                dec = _QMDecoder(segments[0])
                stats = _new_stats(_AC_STAT_BINS)
                fixed = _fixed()
                for i, (by, bx) in enumerate(blocks):
                    if _restart_due(i, ri) is not None:
                        seg_idx += 1
                        dec = _QMDecoder(segments[seg_idx])
                        stats = _new_stats(_AC_STAT_BINS)
                        fixed = _fixed()
                    if ah == 0:
                        _dec_ac_band_first(
                            dec, stats, fixed, coefs[ci][by, bx],
                            ss, se, al,
                        )
                    else:
                        _dec_ac_band_refine(
                            dec, stats, fixed, coefs[ci][by, bx],
                            ss, se, ah, al,
                        )
            saw_scan = True
            continue
        pos += 2 + ln
    if comps is None or dims is None or not saw_scan:
        raise ValueError("missing SOF/SOS")
    h, w = dims

    planes = []
    for ci, (cid, hi, vi, tq) in enumerate(comps):
        if tq not in qtabs:
            raise ValueError("missing quantization table")
        q = qtabs[tq]
        nbh, nbw = coefs[ci].shape[:2]
        # batched dezigzag + IDCT (bitwise identical to per-block —
        # see jpeg._idct_pixels_batch)
        levels = np.zeros((nbh * nbw, 64), dtype=np.int64)
        levels[:, _ZIG_FLAT] = coefs[ci].reshape(nbh * nbw, 64)
        pix = _idct_pixels_batch(levels.reshape(nbh * nbw, 8, 8), q)
        plane = np.ascontiguousarray(
            pix.reshape(nbh, nbw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(nbh * 8, nbw * 8)
        )
        planes.append(plane)
    if len(comps) == 1:
        return planes[0][:h, :w]
    out_planes = []
    for ci, (cid, hi, vi, tq) in enumerate(comps):
        ch = (h * vi + vmax - 1) // vmax
        cw = (w * hi + hmax - 1) // hmax
        plane = planes[ci][:ch, :cw]
        if (hi, vi) != (hmax, vmax):
            plane = np.repeat(
                np.repeat(plane, vmax // vi, axis=0), hmax // hi, axis=1
            )[:h, :w]
        out_planes.append(plane[:h, :w])
    ycc = np.stack(out_planes, axis=2)
    return ycbcr_to_rgb(ycc)
