"""Pure-Python VP8 key-frame (lossy WebP) decoder — RFC 6386.

Decodes the intra-only (key frame) subset of VP8, which is what every
lossy still-image WebP in a web crawl is: boolean arithmetic decoder
(§7), frame/segment/filter/quant headers (§9), key-frame intra mode
parsing (§11), token/residual decoding (§13), dequantization (§14.1),
inverse WHT + DCT (§14.3), intra prediction (§12), and the normal and
simple in-loop deblocking filters (§15).

Normative constant tables live in ``vp8_tables.py`` (recovered from the
system libwebp by ``tools/extract_vp8_tables.py``).  Correctness is
proven differentially: ``tests/test_vp8_codec.py`` encodes fixtures
with the system libwebp encoder and requires THIS decoder's Y/U/V
planes to match ``WebPDecodeYUV`` bit-exactly — a single wrong
probability, filter tap, or prediction pixel desynchronizes the
comparison, so a green fuzz run is end-to-end proof.

Scale note: runs executor-side inside Arrow-batched ``mapInPandas``
(operators/multimodal.py), one image per call — pure-python cost is
priced per payload, the Spark plumbing (binary columns, batch
iteration) is the 100 TB-relevant part.  Production volume would swap
``decode_real`` to a native codec behind the same seam.
"""

from __future__ import annotations

import numpy as np

from parquet_on_fhir_spark.operators.vp8_tables import (
    AC_QLOOKUP,
    CAT_PROBS,
    COEFF_BANDS,
    COEFF_PROBS,
    COEFF_UPDATE_PROBS,
    DC_QLOOKUP,
    KF_BMODE_PROBS,
    KF_UV_PROBS,
    KF_YMODE_PROBS,
    ZIGZAG,
)

# 16x16 / chroma modes (§11.2)
DC_PRED, V_PRED, H_PRED, TM_PRED, B_PRED = range(5)
# 4x4 modes (§11.5) — numeric order matters: the values index the
# [above][left] rows of KF_BMODE_PROBS (verified against libwebp: the
# LD/RD/VR ordering below, not the formula-listing order)
(B_DC, B_TM, B_VE, B_HE, B_RD, B_VR, B_LD, B_VL, B_HD, B_HU) = range(10)
# implied submodes of the 16x16 modes, used as bmode context (§11.5)
_IMPLIED_B = {DC_PRED: B_DC, V_PRED: B_VE, H_PRED: B_HE, TM_PRED: B_TM}

# dct extra-bit category base values (§13.2)
_CAT_BASE = [5, 7, 11, 19, 35, 67]


class BoolDecoder:
    """RFC 6386 §7.3 boolean arithmetic decoder (bit-exact transcription
    of the spec pseudo-code)."""

    __slots__ = ("data", "pos", "value", "range", "bit_count")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 2
        self.value = (data[0] << 8 | data[1]) if len(data) >= 2 else (
            (data[0] << 8) if data else 0
        )
        self.range = 255
        self.bit_count = 0

    def get(self, prob: int) -> int:
        split = 1 + (((self.range - 1) * prob) >> 8)
        big = split << 8
        if self.value >= big:
            bit = 1
            self.range -= split
            self.value -= big
        else:
            bit = 0
            self.range = split
        while self.range < 128:
            self.value <<= 1
            self.range <<= 1
            self.bit_count += 1
            if self.bit_count == 8:
                self.bit_count = 0
                if self.pos < len(self.data):
                    self.value |= self.data[self.pos]
                self.pos += 1
        return bit

    def literal(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.get(128)
        return v

    def signed_literal(self, n: int) -> int:
        v = self.literal(n)
        return -v if self.get(128) else v

    def flagged_signed(self, n: int) -> int:
        return self.signed_literal(n) if self.get(128) else 0


def _clamp_q(q: int) -> int:
    return 0 if q < 0 else (127 if q > 127 else q)


class _Header:
    pass


def parse_header(data: bytes):
    """Parse the uncompressed frame tag + key-frame header (§9.1) and
    the bool-coded first-partition header (§9.2-§9.11). Returns
    (header, first-partition BoolDecoder positioned at the per-MB mode
    data, residual partition BoolDecoders)."""
    h = _Header()
    if len(data) < 10:
        raise ValueError("vp8: truncated frame header")
    tag = data[0] | (data[1] << 8) | (data[2] << 16)
    h.key_frame = not (tag & 1)
    h.version = (tag >> 1) & 7
    h.show_frame = (tag >> 4) & 1
    part1_size = tag >> 5
    if not h.key_frame:
        raise ValueError("vp8: only key frames (still images) supported")
    if data[3:6] != b"\x9d\x01\x2a":
        raise ValueError("vp8: bad keyframe start code")
    wtag = data[6] | (data[7] << 8)
    htag = data[8] | (data[9] << 8)
    h.width, h.xscale = wtag & 0x3FFF, wtag >> 14
    h.height, h.yscale = htag & 0x3FFF, htag >> 14
    # libwebp's bounds check (r13 advice): a short first partition
    # would silently zero-pad the BoolDecoder and "decode" plausible
    # garbage instead of hitting the quarantine contract.
    if 10 + part1_size > len(data):
        raise ValueError("vp8: truncated first partition")
    bd = BoolDecoder(data[10 : 10 + part1_size])

    h.color_space = bd.get(128)
    h.clamping = bd.get(128)

    # segmentation (§9.3)
    h.seg_enabled = bd.get(128)
    h.seg_update_map = 0
    h.seg_abs = 0
    h.seg_quant = [0, 0, 0, 0]
    h.seg_filter = [0, 0, 0, 0]
    h.seg_tree_probs = [255, 255, 255]
    if h.seg_enabled:
        h.seg_update_map = bd.get(128)
        update_data = bd.get(128)
        if update_data:
            h.seg_abs = bd.get(128)
            for i in range(4):
                h.seg_quant[i] = bd.flagged_signed(7)
            for i in range(4):
                h.seg_filter[i] = bd.flagged_signed(6)
        if h.seg_update_map:
            for i in range(3):
                if bd.get(128):
                    h.seg_tree_probs[i] = bd.literal(8)

    # loop filter (§9.4)
    h.filter_type = bd.get(128)  # 1 = simple
    h.filter_level = bd.literal(6)
    h.sharpness = bd.literal(3)
    h.lf_delta_enabled = bd.get(128)
    h.ref_lf_delta = [0, 0, 0, 0]
    h.mode_lf_delta = [0, 0, 0, 0]
    if h.lf_delta_enabled:
        if bd.get(128):  # update
            for i in range(4):
                if bd.get(128):
                    h.ref_lf_delta[i] = bd.signed_literal(6)
            for i in range(4):
                if bd.get(128):
                    h.mode_lf_delta[i] = bd.signed_literal(6)

    n_parts_log2 = bd.literal(2)
    h.n_parts = 1 << n_parts_log2

    # quantizer indices (§9.6)
    h.y_ac_qi = bd.literal(7)
    h.y_dc_delta = bd.flagged_signed(4)
    h.y2_dc_delta = bd.flagged_signed(4)
    h.y2_ac_delta = bd.flagged_signed(4)
    h.uv_dc_delta = bd.flagged_signed(4)
    h.uv_ac_delta = bd.flagged_signed(4)

    h.refresh_entropy = bd.get(128)

    # token probability updates (§13.4)
    probs = list(COEFF_PROBS)
    for i in range(1056):
        if bd.get(COEFF_UPDATE_PROBS[i]):
            probs[i] = bd.literal(8)
    h.coeff_probs = probs

    h.mb_no_skip_coeff = bd.get(128)
    h.skip_prob = bd.literal(8) if h.mb_no_skip_coeff else 0

    # residual partitions (§9.5): sizes trail the first partition
    off = 10 + part1_size
    if off + 3 * (h.n_parts - 1) > len(data):
        raise ValueError("vp8: truncated partition table")
    sizes = []
    for i in range(h.n_parts - 1):
        p = off + 3 * i
        sizes.append(data[p] | (data[p + 1] << 8) | (data[p + 2] << 16))
    off += 3 * (h.n_parts - 1)
    parts = []
    for i in range(h.n_parts):
        end = off + sizes[i] if i < h.n_parts - 1 else len(data)
        parts.append(BoolDecoder(data[off:end]))
        off = end
    return h, bd, parts


def _dequant_factors(h):
    """Per-segment [y1dc, y1ac, y2dc, y2ac, uvdc, uvac] (§14.1)."""
    out = []
    for s in range(4):
        if h.seg_enabled:
            q = h.seg_quant[s] if h.seg_abs else h.y_ac_qi + h.seg_quant[s]
        else:
            q = h.y_ac_qi
        q = _clamp_q(q)
        y1dc = DC_QLOOKUP[_clamp_q(q + h.y_dc_delta)]
        y1ac = AC_QLOOKUP[q]
        y2dc = DC_QLOOKUP[_clamp_q(q + h.y2_dc_delta)] * 2
        y2ac = AC_QLOOKUP[_clamp_q(q + h.y2_ac_delta)] * 155 // 100
        if y2ac < 8:
            y2ac = 8
        uvdc = DC_QLOOKUP[_clamp_q(q + h.uv_dc_delta)]
        if uvdc > 132:
            uvdc = 132
        uvac = AC_QLOOKUP[_clamp_q(q + h.uv_ac_delta)]
        out.append((y1dc, y1ac, y2dc, y2ac, uvdc, uvac))
    return out


def _decode_mb_modes(bd, h, mb_w, mb_h):
    """Key-frame per-MB mode records (§11): segment id, skip flag,
    ymode, 16 submodes (i4x4), uv mode."""
    mbs = []
    # above submode context row: 4 entries per MB column
    above_sub = [[B_DC] * 4 for _ in range(mb_w)]
    for mby in range(mb_h):
        left_sub = [B_DC] * 4
        row = []
        for mbx in range(mb_w):
            seg = 0
            if h.seg_update_map:
                s = h.seg_tree_probs
                seg = (2 + bd.get(s[2])) if bd.get(s[0]) else bd.get(s[1])
            skip = bd.get(h.skip_prob) if h.mb_no_skip_coeff else 0
            p = KF_YMODE_PROBS
            if not bd.get(p[0]):
                ymode = B_PRED
            elif not bd.get(p[1]):
                ymode = DC_PRED if not bd.get(p[2]) else V_PRED
            else:
                ymode = H_PRED if not bd.get(p[3]) else TM_PRED
            if ymode == B_PRED:
                sub = [0] * 16
                for r in range(4):
                    for c in range(4):
                        a = above_sub[mbx][c] if r == 0 else sub[(r - 1) * 4 + c]
                        le = left_sub[r] if c == 0 else sub[r * 4 + c - 1]
                        bp = KF_BMODE_PROBS
                        base = (a * 10 + le) * 9
                        sub[r * 4 + c] = _read_bmode(bd, bp, base)
                for r in range(4):
                    left_sub[r] = sub[r * 4 + 3]
                above_sub[mbx] = sub[12:16]
            else:
                ib = _IMPLIED_B[ymode]
                sub = [ib] * 16
                left_sub = [ib] * 4
                above_sub[mbx] = [ib] * 4
            q = KF_UV_PROBS
            if not bd.get(q[0]):
                uv = DC_PRED
            elif not bd.get(q[1]):
                uv = V_PRED
            else:
                uv = H_PRED if not bd.get(q[2]) else TM_PRED
            row.append((seg, skip, ymode, sub, uv))
        mbs.append(row)
    return mbs


def _read_bmode(bd, bp, base):
    """4x4 mode tree (§11.5) with probability row bp[base:base+9]."""
    if not bd.get(bp[base + 0]):
        return B_DC
    if not bd.get(bp[base + 1]):
        return B_TM
    if not bd.get(bp[base + 2]):
        return B_VE
    if not bd.get(bp[base + 3]):
        if not bd.get(bp[base + 4]):
            return B_HE
        return B_RD if not bd.get(bp[base + 5]) else B_VR
    if not bd.get(bp[base + 6]):
        return B_LD
    if not bd.get(bp[base + 7]):
        return B_VL
    return B_HD if not bd.get(bp[base + 8]) else B_HU


def _decode_coeffs(bd, probs, blk_type, first, ctx, qdc, qac):
    """Token decode for one 4x4 block (§13.2-§13.3). Returns
    (coeffs[16] dequantized in raster order, has_nonzero)."""
    coeffs = [0] * 16
    n = first
    nonzero = False
    # probs is the flat 1056 list; row base for (type, band, ctx)
    base = ((blk_type * 8 + COEFF_BANDS[n]) * 3 + ctx) * 11
    skip_eob = False
    while n < 16:
        if not skip_eob:
            if not bd.get(probs[base + 0]):
                break
        if not bd.get(probs[base + 1]):
            # ZERO token: next token cannot be EOB
            n += 1
            if n >= 16:
                break
            base = ((blk_type * 8 + COEFF_BANDS[n]) * 3 + 0) * 11
            skip_eob = True
            continue
        if not bd.get(probs[base + 2]):
            level = 1
            nctx = 1
        else:
            nctx = 2
            if not bd.get(probs[base + 3]):
                if not bd.get(probs[base + 4]):
                    level = 2
                elif not bd.get(probs[base + 5]):
                    level = 3
                else:
                    level = 4
            else:
                if not bd.get(probs[base + 6]):
                    cat = 0 if not bd.get(probs[base + 7]) else 1
                elif not bd.get(probs[base + 8]):
                    cat = 2 if not bd.get(probs[base + 9]) else 3
                else:
                    cat = 4 if not bd.get(probs[base + 10]) else 5
                level = _CAT_BASE[cat]
                extra = 0
                for pr in CAT_PROBS[cat]:
                    extra = (extra << 1) | bd.get(pr)
                level += extra
        if bd.get(128):
            level = -level
        # dequantized coefficients live in int16 storage in the
        # reference decoder — large cat5/cat6 levels × big quantizers
        # WRAP, normatively (verified against libwebp)
        dq = level * (qdc if n == 0 else qac)
        coeffs[ZIGZAG[n]] = ((dq + 0x8000) & 0xFFFF) - 0x8000
        nonzero = True
        n += 1
        if n >= 16:
            break
        base = ((blk_type * 8 + COEFF_BANDS[n]) * 3 + nctx) * 11
        skip_eob = False
    return coeffs, nonzero


_C1 = 20091  # cospi8sqrt2 - 1, Q16 (§14.3)
_C2 = 35468  # sinpi8sqrt2, Q16


def _idct4x4(ip):
    """Inverse DCT (§14.3); input dequantized coefficients (raster),
    output 16 residuals (raster)."""
    tmp = [0] * 16
    for i in range(4):
        a1 = ip[i] + ip[8 + i]
        b1 = ip[i] - ip[8 + i]
        t1 = (ip[4 + i] * _C2) >> 16
        t2 = ip[12 + i] + ((ip[12 + i] * _C1) >> 16)
        c1 = t1 - t2
        t1 = ip[4 + i] + ((ip[4 + i] * _C1) >> 16)
        t2 = (ip[12 + i] * _C2) >> 16
        d1 = t1 + t2
        tmp[i] = a1 + d1
        tmp[12 + i] = a1 - d1
        tmp[4 + i] = b1 + c1
        tmp[8 + i] = b1 - c1
    out = [0] * 16
    for i in range(4):
        r = i * 4
        a1 = tmp[r] + tmp[r + 2]
        b1 = tmp[r] - tmp[r + 2]
        t1 = (tmp[r + 1] * _C2) >> 16
        t2 = tmp[r + 3] + ((tmp[r + 3] * _C1) >> 16)
        c1 = t1 - t2
        t1 = tmp[r + 1] + ((tmp[r + 1] * _C1) >> 16)
        t2 = (tmp[r + 3] * _C2) >> 16
        d1 = t1 + t2
        out[r] = (a1 + d1 + 4) >> 3
        out[r + 3] = (a1 - d1 + 4) >> 3
        out[r + 1] = (b1 + c1 + 4) >> 3
        out[r + 2] = (b1 - c1 + 4) >> 3
    return out


def _iwht4x4(ip):
    """Inverse Walsh-Hadamard for the Y2 block (§14.3); outputs become
    the DC coefficients of the 16 Y subblocks."""
    tmp = [0] * 16
    for i in range(4):
        a1 = ip[i] + ip[12 + i]
        b1 = ip[4 + i] + ip[8 + i]
        c1 = ip[4 + i] - ip[8 + i]
        d1 = ip[i] - ip[12 + i]
        tmp[i] = a1 + b1
        tmp[4 + i] = c1 + d1
        tmp[8 + i] = a1 - b1
        tmp[12 + i] = d1 - c1
    out = [0] * 16
    for i in range(4):
        r = i * 4
        a1 = tmp[r] + tmp[r + 3]
        b1 = tmp[r + 1] + tmp[r + 2]
        c1 = tmp[r + 1] - tmp[r + 2]
        d1 = tmp[r] - tmp[r + 3]
        # outputs land in the subblocks' int16 DC slots (wrap, as in
        # the reference decoder's short-typed coefficient storage)
        out[r] = (((a1 + b1 + 3) >> 3) + 0x8000) % 0x10000 - 0x8000
        out[r + 1] = (((c1 + d1 + 3) >> 3) + 0x8000) % 0x10000 - 0x8000
        out[r + 2] = (((a1 - b1 + 3) >> 3) + 0x8000) % 0x10000 - 0x8000
        out[r + 3] = (((d1 - c1 + 3) >> 3) + 0x8000) % 0x10000 - 0x8000
    return out


def _clip(v):
    return 0 if v < 0 else (255 if v > 255 else v)


def _avg3(a, b, c):
    return (a + 2 * b + c + 2) >> 2


def _avg2(a, b):
    return (a + b + 1) >> 1


def _pred16(plane, mbx, mby, mode, size, x0, y0):
    """Whole-block intra prediction (16x16 luma / 8x8 chroma, §12.2)
    into plane[y0:y0+size, x0:x0+size]. Off-frame above = 127, left =
    129, corner = 129 iff left edge with a row above (the convention
    that reproduces the spec's special cases)."""
    have_above = mby > 0
    have_left = mbx > 0
    if mode == DC_PRED:
        total = 0
        n = 0
        if have_above:
            total += int(plane[y0 - 1, x0 : x0 + size].sum())
            n += size
        if have_left:
            total += int(plane[y0 : y0 + size, x0 - 1].sum())
            n += size
        dc = 128 if n == 0 else (total + (n >> 1)) // n
        plane[y0 : y0 + size, x0 : x0 + size] = dc
    elif mode == V_PRED:
        row = plane[y0 - 1, x0 : x0 + size] if have_above else 127
        plane[y0 : y0 + size, x0 : x0 + size] = row
    elif mode == H_PRED:
        if have_left:
            col = plane[y0 : y0 + size, x0 - 1]
            plane[y0 : y0 + size, x0 : x0 + size] = col[:, None]
        else:
            plane[y0 : y0 + size, x0 : x0 + size] = 129
    else:  # TM_PRED
        above = (
            plane[y0 - 1, x0 : x0 + size].astype(np.int32)
            if have_above
            else np.full(size, 127, np.int32)
        )
        left = (
            plane[y0 : y0 + size, x0 - 1].astype(np.int32)
            if have_left
            else np.full(size, 129, np.int32)
        )
        # corner: real pixel when both edges exist; 127 when the above
        # row is off-frame (so TM degrades to pred=left); 129 when only
        # the left column is off-frame (pred=above) — matches libwebp's
        # explicit missing-edge specializations.
        corner = (
            int(plane[y0 - 1, x0 - 1])
            if (have_above and have_left)
            else (127 if not have_above else 129)
        )
        blk = left[:, None] + above[None, :] - corner
        plane[y0 : y0 + size, x0 : x0 + size] = np.clip(blk, 0, 255)


def _pred4(Y, bx, by, mode, top_right):
    """4x4 intra prediction (§12.3) at pixel origin (bx, by) in the
    padded luma plane; neighbors read from Y (reconstructed), with the
    caller-supplied 4-pixel ``top_right`` row (the VP8 oddity: rows
    1-3 of a MB reuse the MB-level above-right pixels)."""
    A = [0] * 8
    for c in range(4):
        A[c] = int(Y[by - 1, bx + c])
    A[4:8] = top_right
    L = [int(Y[by + r, bx - 1]) for r in range(4)]
    X = int(Y[by - 1, bx - 1])
    out = [[0] * 4 for _ in range(4)]
    if mode == B_DC:
        dc = (sum(A[:4]) + sum(L) + 4) >> 3
        for r in range(4):
            for c in range(4):
                out[r][c] = dc
    elif mode == B_TM:
        for r in range(4):
            for c in range(4):
                out[r][c] = _clip(L[r] + A[c] - X)
    elif mode == B_VE:
        e = [_avg3(X, A[0], A[1]), _avg3(A[0], A[1], A[2]),
             _avg3(A[1], A[2], A[3]), _avg3(A[2], A[3], A[4])]
        for r in range(4):
            out[r] = list(e)
    elif mode == B_HE:
        vals = [_avg3(X, L[0], L[1]), _avg3(L[0], L[1], L[2]),
                _avg3(L[1], L[2], L[3]), _avg3(L[2], L[3], L[3])]
        for r in range(4):
            out[r] = [vals[r]] * 4
    elif mode == B_LD:
        for r in range(4):
            for c in range(4):
                i = r + c
                out[r][c] = (
                    _avg3(A[6], A[7], A[7]) if i == 6
                    else _avg3(A[i], A[i + 1], A[i + 2])
                )
    elif mode == B_RD:
        E = [L[3], L[2], L[1], L[0], X, A[0], A[1], A[2], A[3]]
        for r in range(4):
            for c in range(4):
                i = c - r + 3
                out[r][c] = _avg3(E[i], E[i + 1], E[i + 2])
    elif mode == B_VR:
        I, J, K = L[0], L[1], L[2]
        a, b, c4, d = A[0], A[1], A[2], A[3]
        out[0][0] = out[2][1] = _avg2(X, a)
        out[0][1] = out[2][2] = _avg2(a, b)
        out[0][2] = out[2][3] = _avg2(b, c4)
        out[0][3] = _avg2(c4, d)
        out[1][0] = out[3][1] = _avg3(I, X, a)
        out[1][1] = out[3][2] = _avg3(X, a, b)
        out[1][2] = out[3][3] = _avg3(a, b, c4)
        out[1][3] = _avg3(b, c4, d)
        out[2][0] = _avg3(X, I, J)
        out[3][0] = _avg3(I, J, K)
    elif mode == B_VL:
        a, b, c4, d, e, f, g, hh = A
        out[0][0] = _avg2(a, b)
        out[0][1] = out[2][0] = _avg2(b, c4)
        out[0][2] = out[2][1] = _avg2(c4, d)
        out[0][3] = out[2][2] = _avg2(d, e)
        out[1][0] = _avg3(a, b, c4)
        out[1][1] = out[3][0] = _avg3(b, c4, d)
        out[1][2] = out[3][1] = _avg3(c4, d, e)
        out[1][3] = out[3][2] = _avg3(d, e, f)
        out[2][3] = _avg3(e, f, g)
        out[3][3] = _avg3(f, g, hh)
    elif mode == B_HD:
        I, J, K, Lp = L
        a, b, c4 = A[0], A[1], A[2]
        out[0][0] = out[1][2] = _avg2(I, X)
        out[0][1] = out[1][3] = _avg3(I, X, a)
        out[0][2] = _avg3(X, a, b)
        out[0][3] = _avg3(a, b, c4)
        out[1][0] = out[2][2] = _avg2(J, I)
        out[1][1] = out[2][3] = _avg3(J, I, X)
        out[2][0] = out[3][2] = _avg2(K, J)
        out[2][1] = out[3][3] = _avg3(K, J, I)
        out[3][0] = _avg2(Lp, K)
        out[3][1] = _avg3(Lp, K, J)
    else:  # B_HU
        I, J, K, Lp = L
        out[0][0] = _avg2(I, J)
        out[0][1] = _avg3(I, J, K)
        out[0][2] = out[1][0] = _avg2(J, K)
        out[0][3] = out[1][1] = _avg3(J, K, Lp)
        out[1][2] = out[2][0] = _avg2(K, Lp)
        out[1][3] = out[2][1] = _avg3(K, Lp, Lp)
        out[2][2] = out[2][3] = Lp
        out[3][0] = out[3][1] = out[3][2] = out[3][3] = Lp
    return out


def decode_vp8(data: bytes):
    """Decode a VP8 key frame; returns (width, height, Y, U, V) numpy
    uint8 planes cropped to the frame size (4:2:0)."""
    h, bd, parts = parse_header(data)
    mb_w = (h.width + 15) // 16
    mb_h = (h.height + 15) // 16
    dq = _dequant_factors(h)
    mbs = _decode_mb_modes(bd, h, mb_w, mb_h)

    # padded reconstruction planes (+1 border row/col handled virtually)
    Y = np.zeros((mb_h * 16, mb_w * 16), np.int32)
    U = np.zeros((mb_h * 8, mb_w * 8), np.int32)
    V = np.zeros((mb_h * 8, mb_w * 8), np.int32)

    # nonzero contexts: above per MB column, left per MB row
    # layout per MB: y2, 16 y (raster), 4 u, 4 v
    above_nz = [[0] * 9 for _ in range(mb_w)]  # [y2?] 4 y cols, 2 u, 2 v
    # we track: above: y[4 cols], u[2], v[2], y2 ; left likewise
    zero16 = [0] * 16
    mb_has = [[False] * mb_w for _ in range(mb_h)]

    for mby in range(mb_h):
        left_nz = [0] * 9  # 4 y rows, 2 u, 2 v, y2
        for mbx in range(mb_w):
            seg, skip, ymode, sub, uv = mbs[mby][mbx]
            y1dc, y1ac, y2dc, y2ac, uvdc, uvac = dq[seg]
            td = parts[mby % h.n_parts]
            a = above_nz[mbx]
            blocks = {}
            has_any = False
            if skip:
                # §13.1: skipped MBs zero their contexts, EXCEPT the Y2
                # context of a skipped i4x4 MB, which persists.
                for i in range(8):
                    a[i] = 0
                    left_nz[i] = 0
                if ymode != B_PRED:
                    a[8] = 0
                    left_nz[8] = 0
                blocks["y2"] = None
                blocks["y"] = [zero16] * 16
                blocks["u"] = [zero16] * 4
                blocks["v"] = [zero16] * 4
            else:
                if ymode != B_PRED:
                    ctx = a[8] + left_nz[8]
                    c2, nz = _decode_coeffs(
                        td, h.coeff_probs, 1, 0, ctx, y2dc, y2ac
                    )
                    a[8] = left_nz[8] = int(nz)
                    dcs = _iwht4x4(c2)
                    blocks["y2"] = dcs
                    ytype, first = 0, 1
                    has_any |= nz
                else:
                    blocks["y2"] = None
                    ytype, first = 3, 0
                ys = []
                for r in range(4):
                    for c in range(4):
                        ctx = a[c] + left_nz[r]
                        cf, nz = _decode_coeffs(
                            td, h.coeff_probs, ytype, first, ctx, y1dc, y1ac
                        )
                        # context bits track only the TOKEN-coded
                        # coefficients; the Y2-inherited DC rides along
                        # for reconstruction but not for ctx (§13.3)
                        a[c] = left_nz[r] = int(nz)
                        has_any |= nz
                        if blocks["y2"] is not None:
                            cf[0] = blocks["y2"][r * 4 + c]
                        ys.append(cf)
                blocks["y"] = ys
                for pi, key in ((4, "u"), (6, "v")):
                    cs = []
                    for r in range(2):
                        for c in range(2):
                            ctx = a[pi + c] + left_nz[pi + r]
                            cf, nz = _decode_coeffs(
                                td, h.coeff_probs, 2, 0, ctx, uvdc, uvac
                            )
                            a[pi + c] = left_nz[pi + r] = int(nz)
                            has_any |= nz
                            cs.append(cf)
                    blocks[key] = cs
            mb_has[mby][mbx] = has_any

            # ---- reconstruction ----
            x0, y0 = mbx * 16, mby * 16
            if ymode != B_PRED:
                _pred16(Y, mbx, mby, ymode, 16, x0, y0)
                for r in range(4):
                    for c in range(4):
                        cf = blocks["y"][r * 4 + c]
                        if any(cf):
                            res = _idct4x4(cf)
                            _add_residual(Y, x0 + c * 4, y0 + r * 4, res)
            else:
                # MB-level above-right pixels (§12.3 / libwebp oddity)
                if mby == 0:
                    tr = [127, 127, 127, 127]
                elif mbx == mb_w - 1:
                    tr = [int(Y[y0 - 1, x0 + 15])] * 4
                else:
                    tr = [int(Y[y0 - 1, x0 + 16 + i]) for i in range(4)]
                for r in range(4):
                    for c in range(4):
                        bx, by = x0 + c * 4, y0 + r * 4
                        if c == 3:
                            trr = tr
                        elif r == 0:
                            if mby == 0:
                                trr = [127] * 4
                            else:
                                trr = [int(Y[by - 1, bx + 4 + i])
                                       for i in range(4)]
                        else:
                            trr = [int(Y[by - 1, bx + 4 + i])
                                   for i in range(4)]
                        pred = _pred4_border(
                            Y, bx, by, sub[r * 4 + c], trr, mbx, mby, c, r
                        )
                        cf = blocks["y"][r * 4 + c]
                        res = _idct4x4(cf) if any(cf) else zero16
                        for rr in range(4):
                            for cc in range(4):
                                Y[by + rr, bx + cc] = _clip(
                                    pred[rr][cc] + res[rr * 4 + cc]
                                )
            cx0, cy0 = mbx * 8, mby * 8
            for plane, key in ((U, "u"), (V, "v")):
                _pred16(plane, mbx, mby, uv, 8, cx0, cy0)
                for r in range(2):
                    for c in range(2):
                        cf = blocks[key][r * 2 + c]
                        if any(cf):
                            res = _idct4x4(cf)
                            _add_residual(plane, cx0 + c * 4, cy0 + r * 4, res)

    if h.filter_level > 0:
        _loop_filter(h, mbs, mb_has, Y, U, V, mb_w, mb_h)

    cw, ch = h.width, h.height
    return (
        cw,
        ch,
        Y[:ch, :cw].astype(np.uint8),
        U[: (ch + 1) // 2, : (cw + 1) // 2].astype(np.uint8),
        V[: (ch + 1) // 2, : (cw + 1) // 2].astype(np.uint8),
    )


def _pred4_border(Y, bx, by, mode, top_right, mbx, mby, c, r):
    """4x4 prediction with frame-border substitution: above=127,
    left=129, corner mixing per §12.2."""
    if mby == 0 and r == 0:
        # synthesize the virtual above row
        A = [127] * 8
        if mbx == 0 and c == 0:
            L = [129] * 4
            X = 127
        else:
            L = [int(Y[by + i, bx - 1]) for i in range(4)]
            X = 127
        return _pred4_vals(A, L, X, mode)
    if mbx == 0 and c == 0:
        A = [int(Y[by - 1, bx + i]) for i in range(4)] + top_right
        L = [129] * 4
        X = 129
        return _pred4_vals(A, L, X, mode)
    return _pred4(Y, bx, by, mode, top_right)


def _pred4_vals(A, L, X, mode):
    """_pred4 on explicit neighbor values (border synthesis path):
    place them at the expected offsets of a tiny scratch plane."""
    plane = np.zeros((6, 10), np.int32)
    plane[0, 1:9] = A
    plane[1:5, 0] = L
    plane[0, 0] = X
    return _pred4(plane, 1, 1, mode, A[4:8])


def _add_residual(plane, x, y, res):
    for r in range(4):
        for c in range(4):
            plane[y + r, x + c] = _clip(int(plane[y + r, x + c]) + res[r * 4 + c])


# ---------------------------------------------------------------------------
# In-loop deblocking filter (§15)
# ---------------------------------------------------------------------------


def _c127(v):
    return -128 if v < -128 else (127 if v > 127 else v)


def _u2s(v):
    return v - 128


def _s2u(v):
    # §15.2: (Pixel)(c(v) + 128) — clamp to int8 range, then re-bias
    return _clip(v + 128)


def _common_adjust(use_outer, px, i_p1, i_p0, i_q0, i_q1):
    p1 = _u2s(px[i_p1])
    p0 = _u2s(px[i_p0])
    q0 = _u2s(px[i_q0])
    q1 = _u2s(px[i_q1])
    a = _c127((_c127(p1 - q1) if use_outer else 0) + 3 * (q0 - p0))
    f1 = _c127(a + 4) >> 3
    f2 = _c127(a + 3) >> 3
    px[i_q0] = _clip(q0 - f1 + 128)
    px[i_p0] = _clip(p0 + f2 + 128)
    return f1


def _filter_simple(px, i, step, limit):
    p1, p0, q0, q1 = px[i - 2 * step], px[i - step], px[i], px[i + step]
    if abs(p0 - q0) * 2 + (abs(p1 - q1) >> 1) <= limit:
        _common_adjust(1, px, i - 2 * step, i - step, i, i + step)


def _filter_yes(px, i, step, interior, edge):
    p3, p2, p1, p0 = (px[i - 4 * step], px[i - 3 * step],
                      px[i - 2 * step], px[i - step])
    q0, q1, q2, q3 = px[i], px[i + step], px[i + 2 * step], px[i + 3 * step]
    return (
        abs(p0 - q0) * 2 + (abs(p1 - q1) >> 1) <= edge
        and abs(p3 - p2) <= interior
        and abs(p2 - p1) <= interior
        and abs(p1 - p0) <= interior
        and abs(q3 - q2) <= interior
        and abs(q2 - q1) <= interior
        and abs(q1 - q0) <= interior
    )


def _hev(px, i, step, thresh):
    return (
        abs(px[i - 2 * step] - px[i - step]) > thresh
        or abs(px[i + step] - px[i]) > thresh
    )


def _subblock_filter(px, i, step, hev_t, interior, edge):
    if _filter_yes(px, i, step, interior, edge):
        hv = _hev(px, i, step, hev_t)
        a = _common_adjust(hv, px, i - 2 * step, i - step, i, i + step)
        if not hv:
            a = (a + 1) >> 1
            px[i + step] = _s2u(_u2s(px[i + step]) - a)
            px[i - 2 * step] = _s2u(_u2s(px[i - 2 * step]) + a)


def _mbblock_filter(px, i, step, hev_t, interior, edge):
    if _filter_yes(px, i, step, interior, edge):
        if not _hev(px, i, step, hev_t):
            p2 = _u2s(px[i - 3 * step])
            p1 = _u2s(px[i - 2 * step])
            p0 = _u2s(px[i - step])
            q0 = _u2s(px[i])
            q1 = _u2s(px[i + step])
            q2 = _u2s(px[i + 2 * step])
            w = _c127(_c127(p1 - q1) + 3 * (q0 - p0))
            a = _c127((27 * w + 63) >> 7)
            q0n, p0n = _s2u(q0 - a), _s2u(p0 + a)
            a = _c127((18 * w + 63) >> 7)
            q1n, p1n = _s2u(q1 - a), _s2u(p1 + a)
            a = _c127((9 * w + 63) >> 7)
            q2n, p2n = _s2u(q2 - a), _s2u(p2 + a)
            px[i - 3 * step] = p2n
            px[i - 2 * step] = p1n
            px[i - step] = p0n
            px[i] = q0n
            px[i + step] = q1n
            px[i + 2 * step] = q2n
        else:
            _common_adjust(1, px, i - 2 * step, i - step, i, i + step)


class _FlatPlane:
    """1-D view over a 2-D numpy plane so the edge filters can step
    horizontally (step=1) or vertically (step=width) uniformly."""

    __slots__ = ("buf", "w")

    def __init__(self, arr):
        self.w = arr.shape[1]
        self.buf = arr.reshape(-1)

    def __getitem__(self, i):
        return int(self.buf[i])

    def __setitem__(self, i, v):
        self.buf[i] = v


def _filter_level_for(h, seg, ymode):
    if h.seg_enabled:
        level = h.seg_filter[seg] if h.seg_abs else (
            h.filter_level + h.seg_filter[seg]
        )
    else:
        level = h.filter_level
    if h.lf_delta_enabled:
        level += h.ref_lf_delta[0]  # intra frame (all key-frame MBs)
        if ymode == B_PRED:
            level += h.mode_lf_delta[0]
    return 0 if level < 0 else (63 if level > 63 else level)


def _limits(h, level):
    interior = level
    if h.sharpness:
        interior >>= 2 if h.sharpness > 4 else 1
        if interior > 9 - h.sharpness:
            interior = 9 - h.sharpness
    if interior < 1:
        interior = 1
    hev_t = 2 if level >= 40 else (1 if level >= 15 else 0)
    return interior, hev_t


def _loop_filter(h, mbs, mb_has, Y, U, V, mb_w, mb_h):
    fy = _FlatPlane(Y)
    fu = _FlatPlane(U)
    fv = _FlatPlane(V)
    yw, uvw = fy.w, fu.w
    simple = h.filter_type == 1
    for mby in range(mb_h):
        for mbx in range(mb_w):
            seg, skip, ymode, sub, uvm = mbs[mby][mbx]
            level = _filter_level_for(h, seg, ymode)
            if level == 0:
                continue
            interior, hev_t = _limits(h, level)
            mb_edge = 2 * level + interior + 4
            sub_edge = 2 * level + interior
            inner = mb_has[mby][mbx] or ymode == B_PRED
            x0, y0 = mbx * 16, mby * 16
            cx0, cy0 = mbx * 8, mby * 8
            if simple:
                if mbx > 0:
                    for r in range(16):
                        _filter_simple(fy, (y0 + r) * yw + x0, 1, mb_edge)
                if inner:
                    for dx in (4, 8, 12):
                        for r in range(16):
                            _filter_simple(
                                fy, (y0 + r) * yw + x0 + dx, 1, sub_edge
                            )
                if mby > 0:
                    for c in range(16):
                        _filter_simple(fy, y0 * yw + x0 + c, yw, mb_edge)
                if inner:
                    for dy in (4, 8, 12):
                        for c in range(16):
                            _filter_simple(
                                fy, (y0 + dy) * yw + x0 + c, yw, sub_edge
                            )
                continue
            if mbx > 0:
                for r in range(16):
                    _mbblock_filter(
                        fy, (y0 + r) * yw + x0, 1, hev_t, interior, mb_edge
                    )
                for r in range(8):
                    _mbblock_filter(
                        fu, (cy0 + r) * uvw + cx0, 1, hev_t, interior, mb_edge
                    )
                    _mbblock_filter(
                        fv, (cy0 + r) * uvw + cx0, 1, hev_t, interior, mb_edge
                    )
            if inner:
                for dx in (4, 8, 12):
                    for r in range(16):
                        _subblock_filter(
                            fy, (y0 + r) * yw + x0 + dx, 1,
                            hev_t, interior, sub_edge,
                        )
                for r in range(8):
                    _subblock_filter(
                        fu, (cy0 + r) * uvw + cx0 + 4, 1,
                        hev_t, interior, sub_edge,
                    )
                    _subblock_filter(
                        fv, (cy0 + r) * uvw + cx0 + 4, 1,
                        hev_t, interior, sub_edge,
                    )
            if mby > 0:
                for c in range(16):
                    _mbblock_filter(
                        fy, y0 * yw + x0 + c, yw, hev_t, interior, mb_edge
                    )
                for c in range(8):
                    _mbblock_filter(
                        fu, cy0 * uvw + cx0 + c, uvw, hev_t, interior, mb_edge
                    )
                    _mbblock_filter(
                        fv, cy0 * uvw + cx0 + c, uvw, hev_t, interior, mb_edge
                    )
            if inner:
                for dy in (4, 8, 12):
                    for c in range(16):
                        _subblock_filter(
                            fy, (y0 + dy) * yw + x0 + c, yw,
                            hev_t, interior, sub_edge,
                        )
                for c in range(8):
                    _subblock_filter(
                        fu, (cy0 + 4) * uvw + cx0 + c, uvw,
                        hev_t, interior, sub_edge,
                    )
                    _subblock_filter(
                        fv, (cy0 + 4) * uvw + cx0 + c, uvw,
                        hev_t, interior, sub_edge,
                    )


def decode_webp_vp8(blob: bytes):
    """Decode a lossy (VP8) WebP container; returns (w, h, Y, U, V)."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"WEBP":
        raise ValueError("not a WebP container")
    pos = 12
    while pos + 8 <= len(blob):
        fourcc = blob[pos : pos + 4]
        size = int.from_bytes(blob[pos + 4 : pos + 8], "little")
        if fourcc == b"VP8 ":
            return decode_vp8(blob[pos + 8 : pos + 8 + size])
        pos += 8 + size + (size & 1)
    raise ValueError("no VP8 chunk found")
