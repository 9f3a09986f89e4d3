"""Vendored VP8 key-frame (lossy WebP) decoder — clean-room from the
public bitstream specification (RFC 6386, "VP8 Data Format and Decoding
Guide"); the empirical entropy/quantizer constants it mandates are
pinned in :mod:`vp8_tables` (see tools/extract_vp8_tables.py).
stdlib-only; the system libwebp is used ONLY as a test oracle
(tests/test_libwebp_conformance.py compares full Y/U/V planes
pixel-exactly against it on its own encoder's output).

Scope: key frames (a lossy WebP IS a single VP8 key frame), both
intra-16x16 and B_PRED (intra-4x4) macroblocks, chroma prediction,
full boolean-coder token decode with per-frame probability updates,
segmentation, dequantization, the exact integer IDCT/WHT, and BOTH
loop filters (simple and normal, §15) so the reconstruction is
bit-exact. Interframes raise ValueError (a WebP never contains one).

Reference parity note: the reference system (Embulk) has no image
codecs; this closes the multimodal brief's "largest remaining real-web
image share" boundary flagged in VERDICT r4 ask #7.
"""

from __future__ import annotations

from .vp8_tables import (
    AC_QLOOKUP,
    COEF_BANDS,
    COEF_PROBS,
    COEF_UPDATE_PROBS,
    DC_QLOOKUP,
    KF_BMODE_PROBS,
)

__all__ = ["decode_vp8", "decode_vp8_planes"]

# token extra-bit probabilities (RFC 6386 §13.2, Pcat1..Pcat6)
_PCAT = [
    [159],
    [165, 145],
    [173, 148, 140],
    [176, 155, 140, 135],
    [180, 157, 141, 134, 130],
    [254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129],
]
_CAT_BASE = [5, 7, 11, 19, 35, 67]

#: coefficient scan order (§13.5)
_ZIGZAG = (0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)

# 16x16 / chroma prediction modes
_DC_PRED, _V_PRED, _H_PRED, _TM_PRED, _B_PRED = 0, 1, 2, 3, 4
# 4x4 modes — BITSTREAM numbering (adjudicated against the reference
# encoder's mode writer): RD/VR sit BEFORE LD. The number is also the
# kf_bmode ctx index, so a wrong order corrupts every neighbor context.
(_B_DC, _B_TM, _B_VE, _B_HE, _B_RD, _B_VR, _B_LD, _B_VL, _B_HD,
 _B_HU) = range(10)


class _BoolDec:
    """Boolean arithmetic decoder (§7.3) — the exact reference
    algorithm: 16-bit value window, range in [128, 255], byte loads
    every 8 renormalization shifts; reads past the end yield zeros."""

    __slots__ = ("data", "pos", "range", "value", "bit_count")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.value = (
            ((data[0] << 8) if len(data) > 0 else 0)
            | (data[1] if len(data) > 1 else 0)
        )
        self.pos = 2
        self.range = 255
        self.bit_count = 0

    def get(self, prob: int) -> int:
        split = 1 + (((self.range - 1) * prob) >> 8)
        big = split << 8
        if self.value >= big:
            ret = 1
            self.range -= split
            self.value -= big
        else:
            ret = 0
            self.range = split
        while self.range < 128:
            self.value <<= 1
            self.range <<= 1
            self.bit_count += 1
            if self.bit_count == 8:
                self.bit_count = 0
                self.value |= (
                    self.data[self.pos] if self.pos < len(self.data) else 0
                )
                self.pos += 1
        return ret

    def literal(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.get(128)
        return v

    def signed_literal(self, n: int) -> int:
        v = self.literal(n)
        return -v if self.get(128) else v


def _clamp_q(i: int) -> int:
    return 0 if i < 0 else (127 if i > 127 else i)


def _clip255(v: int) -> int:
    return 0 if v < 0 else (255 if v > 255 else v)


def _avg2(a: int, b: int) -> int:
    return (a + b + 1) >> 1


def _avg3(a: int, b: int, c: int) -> int:
    return (a + 2 * b + c + 2) >> 2


# ---------------------------------------------------------------------------
# header / mode parsing
# ---------------------------------------------------------------------------


def _parse_quant(bd: _BoolDec) -> dict:
    q = bd.literal(7)

    def delta() -> int:
        return bd.signed_literal(4) if bd.get(128) else 0

    y1dc_d, y2dc_d, y2ac_d, uvdc_d, uvac_d = (
        delta(), delta(), delta(), delta(), delta()
    )
    return {
        "q": q, "y1dc_d": y1dc_d, "y2dc_d": y2dc_d, "y2ac_d": y2ac_d,
        "uvdc_d": uvdc_d, "uvac_d": uvac_d,
    }


def _dequant_factors(qh: dict, seg_q: int | None, seg_abs: bool) -> tuple:
    """(y1dc, y1ac, y2dc, y2ac, uvdc, uvac) for one segment (§14.1)."""
    base = qh["q"]
    if seg_q is not None:
        base = seg_q if seg_abs else base + seg_q
    base = _clamp_q(base)
    y1dc = DC_QLOOKUP[_clamp_q(base + qh["y1dc_d"])]
    y1ac = AC_QLOOKUP[base]
    y2dc = DC_QLOOKUP[_clamp_q(base + qh["y2dc_d"])] * 2
    y2ac = AC_QLOOKUP[_clamp_q(base + qh["y2ac_d"])] * 155 // 100
    if y2ac < 8:
        y2ac = 8
    uvdc_i = _clamp_q(base + qh["uvdc_d"])
    if uvdc_i > 117:  # chroma DC value capped at 132 (§14.1)
        uvdc_i = 117
    uvdc = DC_QLOOKUP[uvdc_i]
    uvac = AC_QLOOKUP[_clamp_q(base + qh["uvac_d"])]
    return y1dc, y1ac, y2dc, y2ac, uvdc, uvac


def _parse_header(bd: _BoolDec) -> dict:
    h: dict = {}
    h["color_space"] = bd.get(128)
    h["clamping"] = bd.get(128)
    # segmentation (§9.3)
    seg = {"enabled": bd.get(128), "update_map": 0, "abs": False,
           "q": [None] * 4, "lf": [0] * 4, "tree": [255, 255, 255]}
    if seg["enabled"]:
        seg["update_map"] = bd.get(128)
        update_data = bd.get(128)
        if update_data:
            seg["abs"] = bool(bd.get(128))
            for i in range(4):
                seg["q"][i] = (
                    bd.signed_literal(7) if bd.get(128) else None
                )
            for i in range(4):
                seg["lf"][i] = (
                    bd.signed_literal(6) if bd.get(128) else 0
                )
        if seg["update_map"]:
            for i in range(3):
                seg["tree"][i] = bd.literal(8) if bd.get(128) else 255
    h["seg"] = seg
    h["filter_type"] = bd.get(128)  # 0 = normal, 1 = simple
    h["filter_level"] = bd.literal(6)
    h["sharpness"] = bd.literal(3)
    h["lf_delta_enabled"] = bd.get(128)
    h["ref_lf_delta"] = [0] * 4
    h["mode_lf_delta"] = [0] * 4
    if h["lf_delta_enabled"]:
        if bd.get(128):  # mode_ref_lf_delta_update
            for i in range(4):
                if bd.get(128):
                    h["ref_lf_delta"][i] = bd.signed_literal(6)
            for i in range(4):
                if bd.get(128):
                    h["mode_lf_delta"][i] = bd.signed_literal(6)
    h["n_parts"] = 1 << bd.literal(2)
    h["quant"] = _parse_quant(bd)
    h["refresh_entropy"] = bd.get(128)
    # coefficient probability updates (§13.4)
    probs = [
        [[list(COEF_PROBS[t][b][c]) for c in range(3)] for b in range(8)]
        for t in range(4)
    ]
    for t in range(4):
        for b in range(8):
            for c in range(3):
                for p in range(11):
                    if bd.get(COEF_UPDATE_PROBS[t][b][c][p]):
                        probs[t][b][c][p] = bd.literal(8)
    h["coef_probs"] = probs
    h["use_skip"] = bd.get(128)
    h["skip_prob"] = bd.literal(8) if h["use_skip"] else 0
    return h


def _parse_intra_modes(bd: _BoolDec, mb_w: int, mb_h: int, h: dict) -> list:
    """Per-MB (segment, skip, ymode, uvmode, bmodes[16]) — partition 0,
    key-frame trees (§11.2/11.3/11.5)."""
    mbs = []
    above_modes = [[_B_DC] * 4 for _ in range(mb_w)]  # bottom row per col
    seg_tree = h["seg"]["tree"]
    for _my in range(mb_h):
        left_modes = [_B_DC] * 4
        row = []
        for mx in range(mb_w):
            seg_id = 0
            if h["seg"]["enabled"] and h["seg"]["update_map"]:
                if bd.get(seg_tree[0]):
                    seg_id = 2 + bd.get(seg_tree[2])
                else:
                    seg_id = bd.get(seg_tree[1])
            skip = bd.get(h["skip_prob"]) if h["use_skip"] else 0
            # kf ymode tree, fixed probs {145, 156, 163, 128}
            if not bd.get(145):
                ymode = _B_PRED
            elif not bd.get(156):
                ymode = _DC_PRED if not bd.get(163) else _V_PRED
            else:
                ymode = _H_PRED if not bd.get(128) else _TM_PRED
            bmodes = [_B_DC] * 16
            if ymode == _B_PRED:
                for sy in range(4):
                    for sx in range(4):
                        above = (
                            above_modes[mx][sx] if sy == 0
                            else bmodes[(sy - 1) * 4 + sx]
                        )
                        left = (
                            left_modes[sy] if sx == 0
                            else bmodes[sy * 4 + sx - 1]
                        )
                        # index order [left][above]: adjudicated by
                        # conformance probe (block-5 TM/HE divergence) —
                        # the in-binary table is transposed relative to
                        # the usual [above][left] presentation
                        p = KF_BMODE_PROBS[above][left]
                        # bmode tree (§11.5)
                        if not bd.get(p[0]):
                            m = _B_DC
                        elif not bd.get(p[1]):
                            m = _B_TM
                        elif not bd.get(p[2]):
                            m = _B_VE
                        elif not bd.get(p[3]):
                            # low side {HE, RD, VR}; high side
                            # (LD, (VL, (HD, HU))) — §11.5 tree with the
                            # bitstream leaf numbering above
                            if not bd.get(p[4]):
                                m = _B_HE
                            else:
                                m = _B_RD if not bd.get(p[5]) else _B_VR
                        elif not bd.get(p[6]):
                            m = _B_LD
                        elif not bd.get(p[7]):
                            m = _B_VL
                        else:
                            m = _B_HD if not bd.get(p[8]) else _B_HU
                        bmodes[sy * 4 + sx] = m
            else:
                # implied submodes for context of later B_PRED MBs
                implied = {
                    _DC_PRED: _B_DC, _V_PRED: _B_VE,
                    _H_PRED: _B_HE, _TM_PRED: _B_TM,
                }[ymode]
                bmodes = [implied] * 16
            above_modes[mx] = bmodes[12:16]
            left_modes = [bmodes[3], bmodes[7], bmodes[11], bmodes[15]]
            # kf uv tree, fixed probs {142, 114, 183}
            if not bd.get(142):
                uvmode = _DC_PRED
            elif not bd.get(114):
                uvmode = _V_PRED
            else:
                uvmode = _H_PRED if not bd.get(183) else _TM_PRED
            row.append({
                "seg": seg_id, "skip": skip, "ymode": ymode,
                "uvmode": uvmode, "bmodes": bmodes,
            })
        mbs.append(row)
    return mbs


# ---------------------------------------------------------------------------
# coefficients
# ---------------------------------------------------------------------------


def _decode_block_coeffs(
    bd: _BoolDec, probs_t, ctx: int, first: int, qdc: int, qac: int
) -> tuple[list[int], int]:
    """One 4x4 block's dequantized coefficients in NATURAL order plus
    its nonzero flag. probs_t = coef_probs[plane_type]."""
    coeffs = [0] * 16
    n = first
    p = probs_t[COEF_BANDS[n]][ctx]
    nonzero = 0
    skip_eob = False
    while n < 16:
        if not skip_eob and not bd.get(p[0]):
            break
        if not bd.get(p[1]):  # DCT_0
            n += 1
            if n == 16:
                break
            p = probs_t[COEF_BANDS[n]][0]
            skip_eob = True
            continue
        skip_eob = False
        if not bd.get(p[2]):  # DCT_1
            v = 1
            nctx = 1
        else:
            nctx = 2
            if not bd.get(p[3]):
                if not bd.get(p[4]):
                    v = 2
                else:
                    v = 3 if not bd.get(p[5]) else 4
            else:
                if not bd.get(p[6]):
                    cat = 0 if not bd.get(p[7]) else 1
                elif not bd.get(p[8]):
                    cat = 2 if not bd.get(p[9]) else 3
                else:
                    cat = 4 if not bd.get(p[10]) else 5
                v = _CAT_BASE[cat]
                extra = 0
                for pb in _PCAT[cat]:
                    extra = (extra << 1) | bd.get(pb)
                v += extra
        if bd.get(128):
            v = -v
        coeffs[_ZIGZAG[n]] = v * (qdc if n == 0 else qac)
        nonzero = 1
        n += 1
        if n == 16:
            break
        p = probs_t[COEF_BANDS[n]][nctx]
    return coeffs, nonzero


# ---------------------------------------------------------------------------
# transforms (§14.3 — exact integer)
# ---------------------------------------------------------------------------


def _idct4x4(b: list[int]) -> list[int]:
    tmp = [0] * 16
    for i in range(4):
        a1 = b[i] + b[i + 8]
        b1 = b[i] - b[i + 8]
        t1 = (b[i + 4] * 35468) >> 16
        t2 = b[i + 12] + ((b[i + 12] * 20091) >> 16)
        c1 = t1 - t2
        t1 = b[i + 4] + ((b[i + 4] * 20091) >> 16)
        t2 = (b[i + 12] * 35468) >> 16
        d1 = t1 + t2
        tmp[i] = a1 + d1
        tmp[i + 12] = a1 - d1
        tmp[i + 4] = b1 + c1
        tmp[i + 8] = b1 - c1
    out = [0] * 16
    for i in range(4):
        r = i * 4
        a1 = tmp[r] + tmp[r + 2]
        b1 = tmp[r] - tmp[r + 2]
        t1 = (tmp[r + 1] * 35468) >> 16
        t2 = tmp[r + 3] + ((tmp[r + 3] * 20091) >> 16)
        c1 = t1 - t2
        t1 = tmp[r + 1] + ((tmp[r + 1] * 20091) >> 16)
        t2 = (tmp[r + 3] * 35468) >> 16
        d1 = t1 + t2
        out[r] = (a1 + d1 + 4) >> 3
        out[r + 3] = (a1 - d1 + 4) >> 3
        out[r + 1] = (b1 + c1 + 4) >> 3
        out[r + 2] = (b1 - c1 + 4) >> 3
    return out


def _iwht4x4(b: list[int]) -> list[int]:
    tmp = [0] * 16
    for i in range(4):
        a1 = b[i] + b[i + 12]
        b1 = b[i + 4] + b[i + 8]
        c1 = b[i + 4] - b[i + 8]
        d1 = b[i] - b[i + 12]
        tmp[i] = a1 + b1
        tmp[i + 4] = c1 + d1
        tmp[i + 8] = a1 - b1
        tmp[i + 12] = d1 - c1
    out = [0] * 16
    for i in range(4):
        r = i * 4
        a1 = tmp[r] + tmp[r + 3]
        b1 = tmp[r + 1] + tmp[r + 2]
        c1 = tmp[r + 1] - tmp[r + 2]
        d1 = tmp[r] - tmp[r + 3]
        out[r] = (a1 + b1 + 3) >> 3
        out[r + 1] = (c1 + d1 + 3) >> 3
        out[r + 2] = (a1 - b1 + 3) >> 3
        out[r + 3] = (d1 - c1 + 3) >> 3
    return out


# ---------------------------------------------------------------------------
# prediction (§12)
# ---------------------------------------------------------------------------


def _pred16_or_8(plane, stride, px, py, size, mode, have_up, have_left):
    """Whole-block DC/V/H/TM prediction into plane[py:py+size,
    px:px+size]; border reads go through the frame buffer which has the
    127/129 edges prefilled."""
    up = [plane[(py - 1) * stride + px + i] for i in range(size)]
    left = [plane[(py + i) * stride + px - 1] for i in range(size)]
    al = plane[(py - 1) * stride + px - 1]
    if mode == _DC_PRED:
        if have_up and have_left:
            dc = (sum(up) + sum(left) + size) >> (
                5 if size == 16 else 4
            )
        elif have_up:
            dc = (sum(up) + (size >> 1)) >> (4 if size == 16 else 3)
        elif have_left:
            dc = (sum(left) + (size >> 1)) >> (4 if size == 16 else 3)
        else:
            dc = 128
        for y in range(size):
            base = (py + y) * stride + px
            for x in range(size):
                plane[base + x] = dc
    elif mode == _V_PRED:
        for y in range(size):
            base = (py + y) * stride + px
            for x in range(size):
                plane[base + x] = up[x]
    elif mode == _H_PRED:
        for y in range(size):
            base = (py + y) * stride + px
            for x in range(size):
                plane[base + x] = left[y]
    else:  # TM
        for y in range(size):
            base = (py + y) * stride + px
            for x in range(size):
                plane[base + x] = _clip255(left[y] + up[x] - al)


def _pred4(plane, stride, px, py, mode, tr4):
    """One 4x4 B_PRED subblock; tr4 = the 4 above-right pixels."""
    A = [plane[(py - 1) * stride + px + i] for i in range(4)] + list(tr4)
    L = [plane[(py + i) * stride + px - 1] for i in range(4)]
    AL = plane[(py - 1) * stride + px - 1]
    o = [[0] * 4 for _ in range(4)]
    if mode == _B_DC:
        dc = (sum(A[:4]) + sum(L) + 4) >> 3
        o = [[dc] * 4 for _ in range(4)]
    elif mode == _B_TM:
        for y in range(4):
            for x in range(4):
                o[y][x] = _clip255(L[y] + A[x] - AL)
    elif mode == _B_VE:
        e = [AL] + A[:5]
        row = [_avg3(e[i], e[i + 1], e[i + 2]) for i in range(4)]
        o = [row[:] for _ in range(4)]
    elif mode == _B_HE:
        col = [
            _avg3(AL, L[0], L[1]),
            _avg3(L[0], L[1], L[2]),
            _avg3(L[1], L[2], L[3]),
            _avg3(L[2], L[3], L[3]),
        ]
        o = [[col[y]] * 4 for y in range(4)]
    elif mode == _B_LD:
        for y in range(4):
            for x in range(4):
                i = x + y
                o[y][x] = (
                    _avg3(A[6], A[7], A[7]) if i == 6
                    else _avg3(A[i], A[i + 1], A[i + 2])
                )
    elif mode == _B_RD:
        e = [L[3], L[2], L[1], L[0], AL, A[0], A[1], A[2], A[3]]
        for y in range(4):
            for x in range(4):
                o[y][x] = _avg3(e[x - y + 3], e[x - y + 4], e[x - y + 5])
    elif mode == _B_VR:
        o[0] = [_avg2(AL, A[0]), _avg2(A[0], A[1]),
                _avg2(A[1], A[2]), _avg2(A[2], A[3])]
        o[1] = [_avg3(L[0], AL, A[0]), _avg3(AL, A[0], A[1]),
                _avg3(A[0], A[1], A[2]), _avg3(A[1], A[2], A[3])]
        o[2] = [_avg3(L[1], L[0], AL), o[0][0], o[0][1], o[0][2]]
        o[3] = [_avg3(L[2], L[1], L[0]), o[1][0], o[1][1], o[1][2]]
    elif mode == _B_VL:
        o[0] = [_avg2(A[0], A[1]), _avg2(A[1], A[2]),
                _avg2(A[2], A[3]), _avg2(A[3], A[4])]
        o[1] = [_avg3(A[0], A[1], A[2]), _avg3(A[1], A[2], A[3]),
                _avg3(A[2], A[3], A[4]), _avg3(A[3], A[4], A[5])]
        o[2] = [o[0][1], o[0][2], o[0][3], _avg3(A[4], A[5], A[6])]
        o[3] = [o[1][1], o[1][2], o[1][3], _avg3(A[5], A[6], A[7])]
    elif mode == _B_HD:
        e = [L[3], L[2], L[1], L[0], AL, A[0], A[1], A[2], A[3]]
        o[0] = [_avg2(e[3], e[4]), _avg3(e[3], e[4], e[5]),
                _avg3(e[4], e[5], e[6]), _avg3(e[5], e[6], e[7])]
        o[1] = [_avg2(e[2], e[3]), _avg3(e[2], e[3], e[4]),
                o[0][0], o[0][1]]
        o[2] = [_avg2(e[1], e[2]), _avg3(e[1], e[2], e[3]),
                o[1][0], o[1][1]]
        o[3] = [_avg2(e[0], e[1]), _avg3(e[0], e[1], e[2]),
                o[2][0], o[2][1]]
    else:  # B_HU
        o[0] = [_avg2(L[0], L[1]), _avg3(L[0], L[1], L[2]),
                _avg2(L[1], L[2]), _avg3(L[1], L[2], L[3])]
        o[1] = [o[0][2], o[0][3], _avg2(L[2], L[3]),
                _avg3(L[2], L[3], L[3])]
        o[2] = [o[1][2], o[1][3], L[3], L[3]]
        o[3] = [L[3], L[3], L[3], L[3]]
    for y in range(4):
        base = (py + y) * stride + px
        for x in range(4):
            plane[base + x] = o[y][x]


def _add_residual(plane, stride, px, py, res):
    for y in range(4):
        base = (py + y) * stride + px
        r = y * 4
        for x in range(4):
            plane[base + x] = _clip255(plane[base + x] + res[r + x])


# ---------------------------------------------------------------------------
# loop filter (§15)
# ---------------------------------------------------------------------------


def _s(v: int) -> int:  # u2s
    return v - 128


def _u(v: int) -> int:  # s2u with clamp
    v += 128
    return 0 if v < 0 else (255 if v > 255 else v)


def _c(v: int) -> int:  # clamp to signed char
    return -128 if v < -128 else (127 if v > 127 else v)


def _common_adjust(px, idx, step, use_outer) -> int:
    p1, p0, q0, q1 = (
        _s(px[idx - 2 * step]), _s(px[idx - step]),
        _s(px[idx]), _s(px[idx + step]),
    )
    a = _c((_c(p1 - q1) if use_outer else 0) + 3 * (q0 - p0))
    f = _c(a + 4) >> 3
    e = _c(a + 3) >> 3
    px[idx] = _u(q0 - f)
    px[idx - step] = _u(p0 + e)
    return f


def _simple_filter(px, idx, step, limit) -> None:
    p1, p0, q0, q1 = (
        px[idx - 2 * step], px[idx - step], px[idx], px[idx + step]
    )
    if abs(p0 - q0) * 2 + (abs(p1 - q1) >> 1) <= limit:
        _common_adjust(px, idx, step, True)


def _filter_mask(px, idx, step, interior, edge) -> bool:
    p3, p2, p1, p0 = (
        px[idx - 4 * step], px[idx - 3 * step],
        px[idx - 2 * step], px[idx - step],
    )
    q0, q1, q2, q3 = (
        px[idx], px[idx + step], px[idx + 2 * step], px[idx + 3 * step]
    )
    return (
        abs(p0 - q0) * 2 + (abs(p1 - q1) >> 1) <= edge
        and abs(p3 - p2) <= interior and abs(p2 - p1) <= interior
        and abs(p1 - p0) <= interior and abs(q3 - q2) <= interior
        and abs(q2 - q1) <= interior and abs(q1 - q0) <= interior
    )


def _hev(px, idx, step, thresh) -> bool:
    return (
        abs(px[idx - 2 * step] - px[idx - step]) > thresh
        or abs(px[idx + step] - px[idx]) > thresh
    )


def _subblock_filter(px, idx, step, hev_t, interior, edge) -> None:
    if _filter_mask(px, idx, step, interior, edge):
        hv = _hev(px, idx, step, hev_t)
        a = (_common_adjust(px, idx, step, hv) + 1) >> 1
        if not hv:
            px[idx + step] = _u(_s(px[idx + step]) - a)
            px[idx - 2 * step] = _u(_s(px[idx - 2 * step]) + a)


def _mbfilter(px, idx, step, hev_t, interior, edge) -> None:
    if _filter_mask(px, idx, step, interior, edge):
        if not _hev(px, idx, step, hev_t):
            p2, p1, p0 = (
                _s(px[idx - 3 * step]), _s(px[idx - 2 * step]),
                _s(px[idx - step]),
            )
            q0, q1, q2 = (
                _s(px[idx]), _s(px[idx + step]), _s(px[idx + 2 * step])
            )
            w = _c(_c(p1 - q1) + 3 * (q0 - p0))
            a = _c((27 * w + 63) >> 7)
            px[idx] = _u(q0 - a)
            px[idx - step] = _u(p0 + a)
            a = _c((18 * w + 63) >> 7)
            px[idx + step] = _u(q1 - a)
            px[idx - 2 * step] = _u(p1 + a)
            a = _c((9 * w + 63) >> 7)
            px[idx + 2 * step] = _u(q2 - a)
            px[idx - 3 * step] = _u(p2 + a)
        else:
            _common_adjust(px, idx, step, True)


# ---------------------------------------------------------------------------
# main decode
# ---------------------------------------------------------------------------


def decode_vp8_planes(data: bytes):
    """(width, height, y, u, v) — y is width*height bytes, u/v are
    ceil(w/2)*ceil(h/2), all reconstructed bit-exactly (loop filter
    applied)."""
    if len(data) < 10:
        raise ValueError("truncated VP8 frame")
    tag = data[0] | (data[1] << 8) | (data[2] << 16)
    if tag & 1:
        raise ValueError("VP8 interframe (never valid in WebP)")
    part0_size = tag >> 5
    if data[3:6] != b"\x9d\x01\x2a":
        raise ValueError("bad VP8 start code")
    width = (data[6] | (data[7] << 8)) & 0x3FFF
    height = (data[8] | (data[9] << 8)) & 0x3FFF
    if not width or not height:
        raise ValueError("zero-dimension VP8 frame")
    first = data[10:10 + part0_size]
    if len(first) < part0_size:
        raise ValueError("truncated VP8 first partition")
    rest = data[10 + part0_size:]

    bd = _BoolDec(first)
    h = _parse_header(bd)

    mb_w = (width + 15) >> 4
    mb_h = (height + 15) >> 4
    mbs = _parse_intra_modes(bd, mb_w, mb_h, h)

    # residual partitions (§9.5): n_parts-1 sizes, 3 bytes LE each
    n_parts = h["n_parts"]
    sizes_bytes = 3 * (n_parts - 1)
    if len(rest) < sizes_bytes:
        raise ValueError("truncated VP8 partition table")
    offs = sizes_bytes
    parts = []
    for i in range(n_parts - 1):
        sz = rest[3 * i] | (rest[3 * i + 1] << 8) | (rest[3 * i + 2] << 16)
        parts.append(rest[offs:offs + sz])
        offs += sz
    parts.append(rest[offs:])
    part_bd = [_BoolDec(p) for p in parts]

    # dequant factors per segment
    seg = h["seg"]
    dq = [
        _dequant_factors(
            h["quant"],
            seg["q"][s] if seg["enabled"] else None,
            seg["abs"],
        )
        for s in range(4)
    ]

    # frame buffers with a 1-pixel(+) border for prediction edges:
    # above = 127 (incl. top-right extension), left = 129 (§12.2)
    ys = mb_w * 16 + 8  # stride: left border col at x=-1, 4 extra right
    yh = mb_h * 16 + 1
    Y = [0] * (ys * yh)
    cs = mb_w * 8 + 8
    ch = mb_h * 8 + 1
    U = [0] * (cs * ch)
    V = [0] * (cs * ch)

    def init_borders(plane, stride, rows, cols):
        for x in range(stride):
            plane[x] = 127  # above row (y=-1), incl right extension
        for y in range(1, rows):
            plane[y * stride] = 129  # left col (x=-1)

    init_borders(Y, ys, yh, mb_w * 16)
    init_borders(U, cs, ch, mb_w * 8)
    init_borders(V, cs, ch, mb_w * 8)
    # plane origin: pixel (x, y) lives at (y+1)*stride + (x+1)
    YO, CO = ys + 1, cs + 1

    probs = h["coef_probs"]
    # nonzero contexts: per 4x4 column/row
    above_nz_y = [0] * (mb_w * 4)
    above_nz_u = [0] * (mb_w * 2)
    above_nz_v = [0] * (mb_w * 2)
    above_nz_y2 = [0] * mb_w

    filter_info = []  # per MB: (level, ilevel, hev, inner)

    for my in range(mb_h):
        left_nz_y = [0] * 4
        left_nz_u = [0] * 2
        left_nz_v = [0] * 2
        left_nz_y2 = 0
        cbd = part_bd[my % n_parts]
        for mx in range(mb_w):
            mb = mbs[my][mx]
            ymode = mb["ymode"]
            has_y2 = ymode != _B_PRED
            y1dc, y1ac, y2dc, y2ac, uvdc, uvac = dq[mb["seg"]]
            ycoeffs = [None] * 16
            ucoeffs = [None] * 4
            vcoeffs = [None] * 4
            y2res = None
            mb_nz = 0
            if mb["skip"]:
                for i in range(4):
                    left_nz_y[i] = above_nz_y[mx * 4 + i] = 0
                for i in range(2):
                    left_nz_u[i] = above_nz_u[mx * 2 + i] = 0
                    left_nz_v[i] = above_nz_v[mx * 2 + i] = 0
                if has_y2:
                    left_nz_y2 = above_nz_y2[mx] = 0
            else:
                first_y = 0
                ytype = 3
                if has_y2:
                    ctx = left_nz_y2 + above_nz_y2[mx]
                    c2, nz2 = _decode_block_coeffs(
                        cbd, probs[1], ctx, 0, y2dc, y2ac
                    )
                    left_nz_y2 = above_nz_y2[mx] = nz2
                    mb_nz |= nz2
                    y2res = _iwht4x4(c2)
                    first_y = 1
                    ytype = 0
                for sy in range(4):
                    for sx in range(4):
                        ctx = left_nz_y[sy] + above_nz_y[mx * 4 + sx]
                        co, nz = _decode_block_coeffs(
                            cbd, probs[ytype], ctx, first_y, y1dc, y1ac
                        )
                        left_nz_y[sy] = above_nz_y[mx * 4 + sx] = nz
                        mb_nz |= nz
                        ycoeffs[sy * 4 + sx] = co
                for plane_c, leftn, aboven, store in (
                    (U, left_nz_u, above_nz_u, ucoeffs),
                    (V, left_nz_v, above_nz_v, vcoeffs),
                ):
                    for sy in range(2):
                        for sx in range(2):
                            ctx = leftn[sy] + aboven[mx * 2 + sx]
                            co, nz = _decode_block_coeffs(
                                cbd, probs[2], ctx, 0, uvdc, uvac
                            )
                            leftn[sy] = aboven[mx * 2 + sx] = nz
                            mb_nz |= nz
                            store[sy * 2 + sx] = co
            if has_y2 and y2res is not None:
                for i in range(16):
                    ycoeffs[i][0] = y2res[i]

            # ---- reconstruction
            px0, py0 = mx * 16, my * 16
            if ymode != _B_PRED:
                _pred16_or_8(
                    Y, ys, px0 + 1, py0 + 1, 16, ymode,
                    my > 0, mx > 0,
                )
            # (prediction coordinates computed against the bordered
            # plane: pixel (x,y) at (y+1)*ys + (x+1))
            if ymode == _B_PRED:
                # top-right pixels for right-column subblocks: the 4
                # pixels above-right of the MB, replicated for rows>0
                tr_base = py0 * ys + YO + px0 + 16 - ys
                if mx == mb_w - 1 and my > 0:
                    v15 = Y[py0 * ys + YO + px0 + 15 - ys]
                    mb_tr = [v15] * 4
                else:
                    mb_tr = [Y[tr_base + i] for i in range(4)]
                for sy in range(4):
                    for sx in range(4):
                        bx = px0 + sx * 4
                        by = py0 + sy * 4
                        if sx < 3:
                            tr = [
                                Y[(by) * ys + YO + bx + 4 + i - ys]
                                for i in range(4)
                            ]
                        else:
                            tr = mb_tr
                        _pred4(
                            Y, ys, bx + 1, by + 1,
                            mb["bmodes"][sy * 4 + sx], tr,
                        )
                        co = ycoeffs[sy * 4 + sx]
                        if co is not None:
                            _add_residual(
                                Y, ys, bx + 1, by + 1, _idct4x4(co)
                            )
            else:
                for sy in range(4):
                    for sx in range(4):
                        co = ycoeffs[sy * 4 + sx]
                        if co is not None:
                            _add_residual(
                                Y, ys, px0 + sx * 4 + 1, py0 + sy * 4 + 1,
                                _idct4x4(co),
                            )
            cx0, cy0 = mx * 8, my * 8
            for plane_c, store in ((U, ucoeffs), (V, vcoeffs)):
                _pred16_or_8(
                    plane_c, cs, cx0 + 1, cy0 + 1, 8, mb["uvmode"],
                    my > 0, mx > 0,
                )
                for sy in range(2):
                    for sx in range(2):
                        co = store[sy * 2 + sx]
                        if co is not None:
                            _add_residual(
                                plane_c, cs, cx0 + sx * 4 + 1,
                                cy0 + sy * 4 + 1, _idct4x4(co),
                            )

            # ---- filter strength for this MB (§15.1)
            level = h["filter_level"]
            if seg["enabled"]:
                sl = seg["lf"][mb["seg"]]
                level = sl if seg["abs"] else level + sl
            if h["lf_delta_enabled"]:
                level += h["ref_lf_delta"][0]
                if ymode == _B_PRED:
                    level += h["mode_lf_delta"][0]
            level = 0 if level < 0 else (63 if level > 63 else level)
            ilevel = level
            if h["sharpness"]:
                ilevel >>= 2 if h["sharpness"] > 4 else 1
                if ilevel > 9 - h["sharpness"]:
                    ilevel = 9 - h["sharpness"]
            if ilevel < 1:
                ilevel = 1
            hev_t = 2 if level >= 40 else (1 if level >= 15 else 0)
            inner = (not mb["skip"] and mb_nz) or ymode == _B_PRED
            filter_info.append((level, ilevel, hev_t, bool(inner)))

    # ---- loop filter pass (§15): raster order, left edge → inner
    # vertical → top edge → inner horizontal, on filtered-so-far pixels
    if h["filter_level"] > 0:
        simple = h["filter_type"] == 1
        for my in range(mb_h):
            for mx in range(mb_w):
                level, ilevel, hev_t, inner = filter_info[my * mb_w + mx]
                if level == 0:
                    continue
                mbe = (level + 2) * 2 + ilevel  # §15.2 mbedge_limit
                sbe = level * 2 + ilevel
                px0, py0 = mx * 16, my * 16
                cx0, cy0 = mx * 8, my * 8
                if simple:
                    if mx > 0:
                        for y in range(16):
                            _simple_filter(
                                Y, (py0 + y) * ys + YO + px0, 1, mbe
                            )
                    if inner:
                        for dx in (4, 8, 12):
                            for y in range(16):
                                _simple_filter(
                                    Y, (py0 + y) * ys + YO + px0 + dx,
                                    1, sbe,
                                )
                    if my > 0:
                        for x in range(16):
                            _simple_filter(
                                Y, py0 * ys + YO + px0 + x, ys, mbe
                            )
                    if inner:
                        for dy in (4, 8, 12):
                            for x in range(16):
                                _simple_filter(
                                    Y, (py0 + dy) * ys + YO + px0 + x,
                                    ys, sbe,
                                )
                else:
                    if mx > 0:
                        for y in range(16):
                            _mbfilter(
                                Y, (py0 + y) * ys + YO + px0, 1,
                                hev_t, ilevel, mbe,
                            )
                        for plane_c in (U, V):
                            for y in range(8):
                                _mbfilter(
                                    plane_c, (cy0 + y) * cs + CO + cx0,
                                    1, hev_t, ilevel, mbe,
                                )
                    if inner:
                        for dx in (4, 8, 12):
                            for y in range(16):
                                _subblock_filter(
                                    Y, (py0 + y) * ys + YO + px0 + dx,
                                    1, hev_t, ilevel, sbe,
                                )
                        for plane_c in (U, V):
                            for y in range(8):
                                _subblock_filter(
                                    plane_c,
                                    (cy0 + y) * cs + CO + cx0 + 4,
                                    1, hev_t, ilevel, sbe,
                                )
                    if my > 0:
                        for x in range(16):
                            _mbfilter(
                                Y, py0 * ys + YO + px0 + x, ys,
                                hev_t, ilevel, mbe,
                            )
                        for plane_c in (U, V):
                            for x in range(8):
                                _mbfilter(
                                    plane_c, cy0 * cs + CO + cx0 + x,
                                    cs, hev_t, ilevel, mbe,
                                )
                    if inner:
                        for dy in (4, 8, 12):
                            for x in range(16):
                                _subblock_filter(
                                    Y, (py0 + dy) * ys + YO + px0 + x,
                                    ys, hev_t, ilevel, sbe,
                                )
                        for plane_c in (U, V):
                            for x in range(8):
                                _subblock_filter(
                                    plane_c,
                                    (cy0 + 4) * cs + CO + cx0 + x,
                                    cs, hev_t, ilevel, sbe,
                                )

    cw, chh = (width + 1) >> 1, (height + 1) >> 1
    y_out = bytearray(width * height)
    for y in range(height):
        row = (y + 1) * ys + 1
        y_out[y * width:(y + 1) * width] = bytes(
            Y[row:row + width]
        )
    u_out = bytearray(cw * chh)
    v_out = bytearray(cw * chh)
    for y in range(chh):
        row = (y + 1) * cs + 1
        u_out[y * cw:(y + 1) * cw] = bytes(U[row:row + cw])
        v_out[y * cw:(y + 1) * cw] = bytes(V[row:row + cw])
    return width, height, bytes(y_out), bytes(u_out), bytes(v_out)


def decode_vp8(data: bytes) -> tuple[int, int, float]:
    """Feature-contract decode: (width, height, mean over the LUMA
    plane) — the codec-native statistic (RGB conversion is a
    presentation choice), one exact integer sum + ONE double division."""
    width, height, y, _u, _v = decode_vp8_planes(data)
    return width, height, sum(y) / float(width * height)


# ---------------------------------------------------------------------------
# fixture encoder (§7.3 bool encoder + minimal key-frame writer)
# ---------------------------------------------------------------------------


class _BoolEnc:
    """Boolean arithmetic encoder (§7.3) — exact mirror of the
    reference pseudo-code (32-bit bottom register, carry propagation
    into already-emitted bytes)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.range = 255
        self.bottom = 0
        self.bit_count = 24

    def _carry(self) -> None:
        i = len(self.out) - 1
        while self.out[i] == 255:
            self.out[i] = 0
            i -= 1
        self.out[i] += 1

    def put(self, bit: int, prob: int) -> None:
        split = 1 + (((self.range - 1) * prob) >> 8)
        if bit:
            self.bottom += split
            self.range -= split
        else:
            self.range = split
        while self.range < 128:
            self.range <<= 1
            if self.bottom & (1 << 31):
                self._carry()
            self.bottom = (self.bottom << 1) & 0xFFFFFFFF
            self.bit_count -= 1
            if self.bit_count == 0:
                self.out.append((self.bottom >> 24) & 0xFF)
                self.bottom &= (1 << 24) - 1
                self.bit_count = 8

    def literal(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.put((v >> i) & 1, 128)

    def flush(self) -> bytes:
        c = self.bit_count
        v = self.bottom
        if v & (1 << (32 - c)):
            self._carry()
        v = (v << (c & 7)) & 0xFFFFFFFF
        c >>= 3
        while c > 0:
            v = (v << 8) & 0xFFFFFFFF
            c -= 1
        for _ in range(4):
            self.out.append((v >> 24) & 0xFF)
            v = (v << 8) & 0xFFFFFFFF
        return bytes(self.out)


def _put_token(be: _BoolEnc, probs_row, v: int, ctx_first: int,
               skip_eob: bool) -> int:
    """Write one coefficient token (value v, may be negative) with the
    given band/ctx probs; returns the next-token ctx. v=None means EOB."""
    p = probs_row
    if v is None:
        be.put(0, p[0])
        return -1
    if not skip_eob:
        be.put(1, p[0])
    a = abs(v)
    if a == 0:
        be.put(0, p[1])
        return 0
    be.put(1, p[1])
    if a == 1:
        be.put(0, p[2])
        be.put(1 if v < 0 else 0, 128)
        return 1
    be.put(1, p[2])
    if a <= 4:
        be.put(0, p[3])
        if a == 2:
            be.put(0, p[4])
        else:
            be.put(1, p[4])
            be.put(0 if a == 3 else 1, p[5])
    else:
        be.put(1, p[3])
        for cat in range(6):
            lo = _CAT_BASE[cat]
            hi = lo + (1 << len(_PCAT[cat])) - 1
            if lo <= a <= hi:
                break
        else:
            raise ValueError("coefficient too large")
        if cat < 2:
            be.put(0, p[6])
            be.put(cat, p[7])
        elif cat < 4:
            be.put(1, p[6])
            be.put(0, p[8])
            be.put(cat - 2, p[9])
        else:
            be.put(1, p[6])
            be.put(1, p[8])
            be.put(cat - 4, p[10])
        extra = a - _CAT_BASE[cat]
        pc = _PCAT[cat]
        for i, pb in enumerate(pc):
            be.put((extra >> (len(pc) - 1 - i)) & 1, pb)
    be.put(1 if v < 0 else 0, 128)
    return 2


def _put_block_tokens(be: _BoolEnc, probs_t, ctx: int, first: int,
                      tokens: list[int]) -> int:
    """tokens = UNQUANTIZED token values in scan order starting at
    ``first`` (trailing zeros trimmed by caller → EOB). Returns the
    block's nonzero flag."""
    n = first
    skip_eob = False
    nz = 0
    for v in tokens:
        row = probs_t[COEF_BANDS[n]][ctx]
        ctx = _put_token(be, row, v, ctx, skip_eob)
        skip_eob = v == 0
        if v:
            nz = 1
        n += 1
    if n < 16:
        row = probs_t[COEF_BANDS[n]][ctx if not skip_eob else 0]
        if skip_eob:
            raise ValueError("EOB cannot follow a zero token")
        be.put(0, row[0])
    return nz


def encode_vp8_flat_mbs(width: int, height: int, q: int, mb_val_fn) -> bytes:
    """Minimal REAL key frame: every MB is intra-16x16 DC_PRED with a
    single Y2-DC coefficient chosen so the reconstruction is EXACTLY
    flat ``mb_val_fn(mbx, mby)`` per macroblock (chroma flat 128, no
    loop filter, no segmentation, default probabilities). Returns the
    VP8 chunk payload (no RIFF container).

    Exactness: with DC prediction, a flat target v and flat
    reconstructed neighbors, the per-pixel delta e = v - pred is hit
    exactly by a dequantized Y2 DC of 64e (iWHT then DC-IDCT each
    divide by 8 with their rounders); q=4 gives y2dc=16, which divides
    64e for every integer e."""
    mb_w = (width + 15) >> 4
    mb_h = (height + 15) >> 4
    y2dc = DC_QLOOKUP[q] * 2

    be = _BoolEnc()
    be.put(0, 128)  # color space
    be.put(0, 128)  # clamping
    be.put(0, 128)  # segmentation disabled
    be.put(0, 128)  # filter type normal
    be.literal(0, 6)  # filter level 0 (no loop filtering)
    be.literal(0, 3)  # sharpness
    be.put(0, 128)  # lf delta disabled
    be.literal(0, 2)  # one token partition
    be.literal(q, 7)  # y_ac_qi
    for _ in range(5):
        be.put(0, 128)  # no quantizer deltas
    be.put(0, 128)  # refresh entropy (ignored for stills)
    for t in range(4):  # no coefficient prob updates
        for b in range(8):
            for c in range(3):
                for p in range(11):
                    be.put(0, COEF_UPDATE_PROBS[t][b][c][p])
    be.put(0, 128)  # mb_no_skip_coeff disabled
    # per-MB modes: DC_PRED (kf ymode tree 1,0,0), uv DC (0)
    for _my in range(mb_h):
        for _mx in range(mb_w):
            be.put(1, 145)
            be.put(0, 156)
            be.put(0, 163)
            be.put(0, 142)
    part0 = be.flush()

    # residuals: recon tracking mirrors the decoder to derive each MB's
    # DC prediction from already-reconstructed flat neighbors
    be2 = _BoolEnc()
    probs = COEF_PROBS
    recon = [[0] * mb_w for _ in range(mb_h)]
    above_nz_y2 = [0] * mb_w
    for my in range(mb_h):
        left_nz_y2 = 0
        for mx in range(mb_w):
            target = mb_val_fn(mx, my)
            if my == 0 and mx == 0:
                pred = 128
            elif my == 0:
                pred = recon[0][mx - 1]
            elif mx == 0:
                pred = recon[my - 1][0]
            else:
                pred = (recon[my][mx - 1] + recon[my - 1][mx] + 1) >> 1
            e = target - pred
            # pixel delta e needs dequantized Y2 DC of 64e: the iWHT
            # gives (64e+3)>>3 = 8e per subblock, the DC-only IDCT
            # (8e+4)>>3 = e — exact for any integer e (incl. negative,
            # arithmetic shifts)
            dc_tok = (64 * e) // y2dc
            if dc_tok * y2dc != 64 * e:
                raise ValueError(
                    f"delta {e} not exactly codeable at q={q}"
                )
            ctx = left_nz_y2 + above_nz_y2[mx]
            nz2 = _put_block_tokens(
                be2, probs[1], ctx, 0, [dc_tok] if dc_tok else []
            )
            left_nz_y2 = above_nz_y2[mx] = nz2
            # 16 Y blocks (type 0, first=1) + 8 chroma: all EOB; their
            # nonzero contexts stay 0
            for _ in range(16):
                be2.put(0, probs[0][COEF_BANDS[1]][0][0])
            for _ in range(8):
                be2.put(0, probs[2][0][0][0])
            recon[my][mx] = _clip255(pred + e)
    part1 = be2.flush()

    tag = (0 << 0) | (0 << 1) | (1 << 4) | (len(part0) << 5)
    hdr = bytes([
        tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF,
        0x9D, 0x01, 0x2A,
        width & 0xFF, (width >> 8) & 0x3F,
        height & 0xFF, (height >> 8) & 0x3F,
    ])
    return hdr + part0 + part1


def wrap_webp(vp8_payload: bytes) -> bytes:
    import struct as _st

    chunk = b"VP8 " + _st.pack("<I", len(vp8_payload)) + vp8_payload
    if len(vp8_payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + _st.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


# ---------------------------------------------------------------------------
# deterministic fixtures (closed-form SQL oracle)
# ---------------------------------------------------------------------------


def synth_vp8_dims(doc_id: int) -> tuple[int, int]:
    """Multiples of 16 so every MB is whole (no crop in the closed
    form)."""
    return 16 * (1 + doc_id % 3), 16 * (1 + (doc_id * 7) % 2)


def synth_vp8_mb_value(mbx: int, mby: int, doc_id: int) -> int:
    return 40 + (29 * mbx + 47 * mby + doc_id) % 176


def synth_vp8_bytes(doc_id: int) -> bytes:
    """Deterministic REAL lossy-WebP (VP8 key frame) for a doc id:
    MB-constant luma whose reconstruction is EXACT (DC-pred flat MBs +
    a single Y2-DC coefficient each, q=4, filter level 0), so a SQL
    oracle recomputes (width, height, luma mean) as pure arithmetic in
    doc_id while the decoder runs the full boolean-coder / token /
    IDCT+WHT / prediction pipeline. Values stay in [40, 215], so the
    clip in the encoder's recon tracking never engages and target ==
    reconstruction everywhere."""
    w, h = synth_vp8_dims(doc_id)
    return wrap_webp(
        encode_vp8_flat_mbs(
            w, h, 4, lambda mx, my: synth_vp8_mb_value(mx, my, doc_id)
        )
    )
