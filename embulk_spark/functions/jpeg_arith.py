"""Vendored JPEG arithmetic entropy codec (ITU-T T.81 Annex D + F.1.4/F.2.4).

Closes the last declared sequential-JPEG boundary: SOF9
(extended-sequential DCT, arithmetic coding) now decodes for REAL —
the QM binary arithmetic coder with the Table D.3 probability
estimation state machine, the DC difference model (F.1.4.4.1: zero /
sign / magnitude-category / magnitude-bit contexts conditioned on the
previous diff's classification) and the AC model (F.1.4.4.2: per-index
EOB + zero-run contexts, fixed ½-probability sign bin, Kx-split
magnitude areas). Same vendoring discipline as functions/jpeg.py:
clean-room from the public standard's flowcharts, conformance
adjudicated against the SYSTEM libjpeg (tests/test_libjpeg_conformance
probe) — reference parity target: the reference engine has no image
tier at all; multimodal is a brief-mandated extension.

The encoder half generates FIXTURES (same closed-form block-constant
discipline as the baseline encoder) and is itself the conformance
vehicle: our SOF9 streams must decode under libjpeg-turbo's
jinit_arith_decoder exactly as under our decoder.

Register/renorm conventions (T.81 §D.1, D.2):
  * interval register A normalized to [0x8000, 0x10000); MPS coded in
    the LOWER subinterval [0, A-Qe), LPS in the upper Qe-sized slice,
    with conditional exchange when A-Qe < Qe;
  * encoder C accumulates lower bounds; BYTEOUT window at C>>19 with
    CT=11 initial spacing, 0xFF bytes stacked until carry resolution
    (a ripple carry turns stacked 0xFFs into 0x00s), and JPEG marker
    stuffing (0x00 after any emitted 0xFF);
  * FLUSH per §D.1.8: clear trailing code bits inside the final
    interval, then drain two more bytes;
  * decoder feeds bits on renormalization from the destuffed entropy
    stream and supplies ZERO bytes once a marker is reached (F.2.2.5).
"""

from __future__ import annotations

import struct

import numpy as np

from embulk_spark.functions.jpeg import (
    STD_LUMA_QT,
    ZIGZAG,
    _A,
    _block_at,
    _quantize_block,
)

# ---------------------------------------------------------------------------
# T.81 Table D.3 — Qe value and probability estimation state machine.
# Rows: (Qe, Next_Index_MPS, Next_Index_LPS, Switch_MPS). Index 113 is
# the non-adapting ½-probability state used for AC sign decisions
# (F.1.4.4.1.2 note): its transitions point to itself with Switch=0, so
# routing it through the ordinary estimator leaves it fixed.
# ---------------------------------------------------------------------------

_ARITAB = (
    (0x5A1D, 1, 1, 1), (0x2586, 2, 14, 0), (0x1114, 3, 16, 0),
    (0x080B, 4, 18, 0), (0x03D8, 5, 20, 0), (0x01DA, 6, 23, 0),
    (0x00E5, 7, 25, 0), (0x006F, 8, 28, 0), (0x0036, 9, 30, 0),
    (0x001A, 10, 33, 0), (0x000D, 11, 35, 0), (0x0006, 12, 9, 0),
    (0x0003, 13, 10, 0), (0x0001, 13, 12, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 16, 36, 0), (0x2CF2, 17, 38, 0), (0x207C, 18, 39, 0),
    (0x17B9, 19, 40, 0), (0x1182, 20, 42, 0), (0x0CEF, 21, 43, 0),
    (0x09A1, 22, 45, 0), (0x072F, 23, 46, 0), (0x055C, 24, 48, 0),
    (0x0406, 25, 49, 0), (0x0303, 26, 51, 0), (0x0240, 27, 52, 0),
    (0x01B1, 28, 54, 0), (0x0144, 29, 56, 0), (0x00F5, 30, 57, 0),
    (0x00B7, 31, 59, 0), (0x008A, 32, 60, 0), (0x0068, 33, 62, 0),
    (0x004E, 34, 63, 0), (0x003B, 35, 32, 0), (0x002C, 9, 33, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 38, 64, 0), (0x3A0D, 39, 65, 0),
    (0x2EF1, 40, 67, 0), (0x261F, 41, 68, 0), (0x1F33, 42, 69, 0),
    (0x19A8, 43, 70, 0), (0x1518, 44, 72, 0), (0x1177, 45, 73, 0),
    (0x0E74, 46, 74, 0), (0x0BFB, 47, 75, 0), (0x09F8, 48, 77, 0),
    (0x0861, 49, 78, 0), (0x0706, 50, 79, 0), (0x05CD, 51, 48, 0),
    (0x04DE, 52, 50, 0), (0x040F, 53, 50, 0), (0x0363, 54, 51, 0),
    (0x02D4, 55, 52, 0), (0x025C, 56, 53, 0), (0x01F8, 57, 54, 0),
    (0x01A4, 58, 55, 0), (0x0160, 59, 56, 0), (0x0125, 60, 57, 0),
    (0x00F6, 61, 58, 0), (0x00CB, 62, 59, 0), (0x00AB, 63, 61, 0),
    (0x008F, 32, 61, 0), (0x5B12, 65, 65, 1), (0x4D04, 66, 80, 0),
    (0x412C, 67, 81, 0), (0x37D8, 68, 82, 0), (0x2FE8, 69, 83, 0),
    (0x293C, 70, 84, 0), (0x2379, 71, 86, 0), (0x1EDF, 72, 87, 0),
    (0x1AA9, 73, 87, 0), (0x174E, 74, 72, 0), (0x1424, 75, 72, 0),
    (0x119C, 76, 74, 0), (0x0F6B, 77, 74, 0), (0x0D51, 78, 75, 0),
    (0x0BB6, 79, 77, 0), (0x0A40, 48, 77, 0), (0x5832, 81, 80, 1),
    (0x4D1C, 82, 88, 0), (0x438E, 83, 89, 0), (0x3BDD, 84, 90, 0),
    (0x34EE, 85, 91, 0), (0x2EAE, 86, 92, 0), (0x299A, 87, 93, 0),
    (0x2516, 71, 86, 0), (0x5570, 89, 88, 1), (0x4CA9, 90, 95, 0),
    (0x44D9, 91, 96, 0), (0x3E22, 92, 97, 0), (0x3824, 93, 99, 0),
    (0x32B4, 94, 99, 0), (0x2E17, 86, 93, 0), (0x56A8, 96, 95, 1),
    (0x4F46, 97, 101, 0), (0x47E5, 98, 102, 0), (0x41CF, 99, 103, 0),
    (0x3C3D, 100, 104, 0), (0x375E, 93, 99, 0), (0x5231, 102, 105, 0),
    (0x4C0F, 103, 106, 0), (0x4639, 104, 107, 0), (0x415E, 99, 103, 0),
    (0x5627, 106, 105, 1), (0x50E7, 107, 108, 0), (0x4B85, 103, 109, 0),
    (0x5597, 109, 110, 0), (0x504F, 107, 111, 0), (0x5A10, 111, 110, 1),
    (0x5522, 109, 112, 0), (0x59EB, 111, 112, 1), (0x5A1D, 113, 113, 0),
)

#: default conditioning bounds when no DAC marker is present
#: (T.81 §F.1.4.4.1.2 / §F.1.4.4.2): DC L=0, U=1; AC Kx=5
_DEFAULT_DC_COND = (0, 1)
_DEFAULT_AC_KX = 5

_DC_STAT_BINS = 64
_AC_STAT_BINS = 256


# ---------------------------------------------------------------------------
# QM coder core
# ---------------------------------------------------------------------------


class _QMEncoder:
    """T.81 §D.1 encoder: INITENC / CODE / RENORME / BYTEOUT / FLUSH."""

    def __init__(self) -> None:
        self.a = 0x10000
        self.c = 0
        self.ct = 11
        self.buf: int | None = None  # byte awaiting carry resolution
        self.sc = 0  # stacked 0xFF bytes (carry may flip them to 0x00)
        self.out = bytearray()

    def _emit(self, b: int) -> None:
        self.out.append(b)
        if b == 0xFF:
            self.out.append(0x00)  # JPEG marker stuffing

    def _byteout(self) -> None:
        t = self.c >> 19
        self.c &= 0x7FFFF
        if t > 0xFF:
            # carry ripples into the buffered byte; stacked 0xFFs
            # become 0x00 (0xFF + 1 with carry-through)
            if self.buf is None:  # pragma: no cover — interval invariant
                raise AssertionError("carry with no buffered byte")
            self._emit(self.buf + 1)
            for _ in range(self.sc):
                self.out.append(0x00)
            self.sc = 0
            self.buf = t & 0xFF
        elif t == 0xFF:
            self.sc += 1  # defer: carry resolution pending
        else:
            if self.buf is not None:
                self._emit(self.buf)
            for _ in range(self.sc):
                self._emit(0xFF)
            self.sc = 0
            self.buf = t

    def _renorm(self) -> None:
        while self.a < 0x8000:
            self.a <<= 1
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
                self.ct = 8

    def encode(self, stats: bytearray, i: int, d: int) -> None:
        s = stats[i]
        idx, mps = s & 0x7F, s >> 7
        qe, nmps, nlps, sw = _ARITAB[idx]
        self.a -= qe
        if d == mps:
            if self.a & 0x8000:
                return  # short MPS path: no renorm, no estimation
            if self.a < qe:  # conditional exchange: MPS takes the top
                self.c += self.a
                self.a = qe
            stats[i] = (mps << 7) | nmps
        else:
            if self.a < qe:  # conditional exchange: LPS takes the bottom
                pass  # C unchanged, interval = A - Qe already in A
            else:
                self.c += self.a
                self.a = qe
            if sw:
                mps ^= 1
            stats[i] = (mps << 7) | nlps
        self._renorm()

    def flush(self) -> bytes:
        # §D.1.8: pick the code value inside [C, C+A) with the most
        # trailing zero bits, then drain the remaining two bytes.
        t = (self.c + self.a - 1) & 0xFFFF0000
        self.c = t + 0x8000 if t < self.c else t
        self.c <<= self.ct
        if self.c & 0xF8000000:  # final carry
            if self.buf is None:  # pragma: no cover — interval invariant
                raise AssertionError("carry with no buffered byte")
            self._emit(self.buf + 1)
            for _ in range(self.sc):
                self.out.append(0x00)
        else:
            if self.buf is not None:
                self._emit(self.buf)
            for _ in range(self.sc):
                self._emit(0xFF)
        self.buf, self.sc = None, 0
        self._emit((self.c >> 19) & 0xFF)
        self._emit((self.c >> 11) & 0xFF)
        return bytes(self.out)


class _QMDecoder:
    """T.81 §D.2 decoder, formulated as the encoder's exact inverse: V
    holds the next 16 stream bits as an offset inside interval A;
    renormalization shifts in one destuffed bit at a time; bytes after
    a marker (or EOF) read as zero (F.2.2.5)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.hit_marker = False
        self.byte = 0
        self.nbits = 0
        self.v = (self._next_byte() << 8) | self._next_byte()
        self.a = 0x10000

    def _next_byte(self) -> int:
        if self.hit_marker or self.pos >= len(self.data):
            self.hit_marker = True
            return 0
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = (
                self.data[self.pos + 1]
                if self.pos + 1 < len(self.data)
                else None
            )
            if nxt == 0x00:
                self.pos += 2  # stuffed data byte
                return 0xFF
            self.hit_marker = True  # marker stays unconsumed
            return 0
        self.pos += 1
        return b

    def _next_bit(self) -> int:
        if self.nbits == 0:
            self.byte = self._next_byte()
            self.nbits = 8
        self.nbits -= 1
        return (self.byte >> self.nbits) & 1

    def decode(self, stats: bytearray, i: int) -> int:
        s = stats[i]
        idx, mps = s & 0x7F, s >> 7
        qe, nmps, nlps, sw = _ARITAB[idx]
        self.a -= qe
        if self.v < self.a:
            if self.a & 0x8000:
                return mps  # short MPS path
            # renorm pending → conditional-exchange disambiguation
            if self.a < qe:
                d = mps ^ 1
                if sw:
                    mps ^= 1
                stats[i] = (mps << 7) | nlps
            else:
                d = mps
                stats[i] = (mps << 7) | nmps
        else:
            self.v -= self.a
            if self.a < qe:  # exchanged: top slice codes the MPS
                d = mps
                stats[i] = (mps << 7) | nmps
            else:
                d = mps ^ 1
                if sw:
                    mps ^= 1
                stats[i] = (mps << 7) | nlps
            self.a = qe
        while self.a < 0x8000:
            self.a <<= 1
            self.v = (self.v << 1) | self._next_bit()
        return d


#: the fixed ½-probability sign bin (state 113 is self-preserving)
def _fixed_bin() -> bytearray:
    return bytearray([113])


# ---------------------------------------------------------------------------
# statistical models — sequential DCT (F.1.4.4 encode / F.2.4 decode)
# ---------------------------------------------------------------------------


def _classify_dc(m: int, sign: int, lo: int, up: int) -> int:
    """§F.1.4.4.1.2: conditioning category of a nonzero diff with
    magnitude-category floor ``m`` for the NEXT block's DC contexts."""
    if m < ((1 << lo) >> 1):
        return 0  # counted as zero diff
    if m > ((1 << up) >> 1):
        return 12 + 4 * sign  # large diff
    return 4 + 4 * sign  # small diff


def _decode_dc(dec, st: bytearray, ctx: int, lo: int, up: int):
    """→ (diff, next_context). Contexts per Table F.4: S0=ctx, SS=+1,
    SP/SN=+2/+3, X-chain at bin 20, magnitude bits at (last X bin)+14."""
    if dec.decode(st, ctx) == 0:
        return 0, 0
    sign = dec.decode(st, ctx + 1)
    m = dec.decode(st, ctx + 2 + sign)
    xbin = 20
    if m:
        while dec.decode(st, xbin):
            m <<= 1
            if m == 0x8000:
                raise ValueError("DC magnitude overflow")
            xbin += 1
    nxt = _classify_dc(m, sign, lo, up)
    v = m
    mbin = xbin + 14
    m >>= 1
    while m:
        if dec.decode(st, mbin):
            v |= m
        m >>= 1
    v += 1
    return (-v if sign else v), nxt


def _encode_dc(enc, st: bytearray, ctx: int, diff: int, lo: int, up: int):
    """Mirror of _decode_dc; returns the next conditioning context."""
    if diff == 0:
        enc.encode(st, ctx, 0)
        return 0
    enc.encode(st, ctx, 1)
    sign = 1 if diff < 0 else 0
    enc.encode(st, ctx + 1, sign)
    sz = (-diff if sign else diff) - 1
    xbin = 20
    if sz == 0:
        enc.encode(st, ctx + 2 + sign, 0)
        m = 0
    else:
        enc.encode(st, ctx + 2 + sign, 1)
        m = 1
        while sz >= (m << 1):
            enc.encode(st, xbin, 1)
            m <<= 1
            if m == 0x8000:
                raise ValueError("DC magnitude overflow")
            xbin += 1
        enc.encode(st, xbin, 0)
    mbin = xbin + 14
    mask = m >> 1
    while mask:
        enc.encode(st, mbin, 1 if sz & mask else 0)
        mask >>= 1
    return _classify_dc(m, sign, lo, up)


def _pt(v: int, al: int) -> int:
    """AC point transform: magnitude shift toward zero (G.1.2.2)."""
    return v >> al if v >= 0 else -((-v) >> al)


def _decode_ac_block(dec, st: bytearray, fixed: bytearray, kx: int,
                     zz: np.ndarray, ss: int = 1, se: int = 63,
                     al: int = 0) -> None:
    """AC coefficients ``ss..se`` into zigzag-order ``zz`` (F.2.4.2,
    and with ``al`` the G.2.1 first-scan point transform): per-index
    EOB (bin 3(k-1)) and zero-run (+1) decisions, fixed sign bin,
    magnitude category at +2 twice then the Kx-split X areas
    (189 / 217) with magnitude bits at +14."""
    k = ss
    while k <= se:
        base = 3 * (k - 1)
        if dec.decode(st, base):
            return  # EOB
        while dec.decode(st, base + 1) == 0:
            k += 1
            if k > se:
                raise ValueError("AC index overflow")
            base = 3 * (k - 1)
        sign = dec.decode(fixed, 0)
        m = dec.decode(st, base + 2)
        mbin = base + 2  # unread when m ≤ 1 (no magnitude bits)
        if m:
            if dec.decode(st, base + 2):
                m = 2
                xbin = 189 if k <= kx else 217
                while dec.decode(st, xbin):
                    m <<= 1
                    if m == 0x8000:
                        raise ValueError("AC magnitude overflow")
                    xbin += 1
                mbin = xbin + 14
        v = m
        m >>= 1
        while m:
            if dec.decode(st, mbin):
                v |= m
            m >>= 1
        v += 1
        zz[k] = (-v if sign else v) << al
        k += 1


def _encode_ac_block(enc, st: bytearray, fixed: bytearray, kx: int,
                     zz, ss: int = 1, se: int = 63, al: int = 0) -> None:
    """Mirror of _decode_ac_block over zigzag coefficients ``ss..se``
    at point transform ``al``."""
    last_nz = ss - 1
    for i in range(se, ss - 1, -1):
        if _pt(int(zz[i]), al):
            last_nz = i
            break
    k = ss
    while k <= se:
        base = 3 * (k - 1)
        if k > last_nz:
            enc.encode(st, base, 1)  # EOB
            return
        enc.encode(st, base, 0)
        while _pt(int(zz[k]), al) == 0:
            enc.encode(st, base + 1, 0)
            k += 1
            base = 3 * (k - 1)
        enc.encode(st, base + 1, 1)
        v = _pt(int(zz[k]), al)
        sign = 1 if v < 0 else 0
        enc.encode(fixed, 0, sign)
        sz = (-v if sign else v) - 1
        if sz == 0:
            enc.encode(st, base + 2, 0)
            m = 0
            mbin = base + 2
        elif sz == 1:
            enc.encode(st, base + 2, 1)
            enc.encode(st, base + 2, 0)
            m = 1
            mbin = base + 2
        else:
            enc.encode(st, base + 2, 1)
            enc.encode(st, base + 2, 1)
            m = 2
            xbin = 189 if k <= kx else 217
            while sz >= (m << 1):
                enc.encode(st, xbin, 1)
                m <<= 1
                if m == 0x8000:
                    raise ValueError("AC magnitude overflow")
                xbin += 1
            enc.encode(st, xbin, 0)
            mbin = xbin + 14
        mask = m >> 1
        while mask:
            enc.encode(st, mbin, 1 if sz & mask else 0)
            mask >>= 1
        k += 1


def _decode_ac_refine(dec, st: bytearray, fixed: bytearray,
                      zz: np.ndarray, ss: int, se: int, al: int) -> None:
    """AC successive-approximation refinement (G.2.2 / Figure G.13):
    per-index contexts — EOB flag (read only beyond kex, the previous
    stage's last nonzero index), newly-nonzero at +1 with fixed-bin
    sign, correction bit at +2 for history coefficients."""
    p1 = 1 << al
    m1 = -1 << al
    kex = 0
    for i in range(se, 0, -1):
        if zz[i]:
            kex = i
            break
    k = ss
    while k <= se:
        base = 3 * (k - 1)
        if k > kex and dec.decode(st, base):
            return  # EOB: no newly-significant coefficients remain
        while True:
            c = int(zz[k])
            if c:
                if dec.decode(st, base + 2):
                    zz[k] = c + (p1 if c >= 0 else m1)
                break
            if dec.decode(st, base + 1):
                zz[k] = m1 if dec.decode(fixed, 0) else p1
                break
            k += 1
            if k > se:
                raise ValueError("AC refinement overflow")
            base = 3 * (k - 1)
        k += 1


def _encode_ac_refine(enc, st: bytearray, fixed: bytearray,
                      zz, ss: int, se: int, al: int) -> None:
    """Mirror of _decode_ac_refine (G.3.2 / Figure G.10): ke is this
    stage's last significant index, kex the previous stage's; EOB=0
    decisions for kex < k ≤ ke, a final EOB=1 when ke < se."""
    ke = ss - 1
    for i in range(se, ss - 1, -1):
        if abs(int(zz[i])) >> al:
            ke = i
            break
    kex = 0
    for i in range(ke, 0, -1):
        if abs(int(zz[i])) >> (al + 1):
            kex = i
            break
    k = ss
    while k <= ke:
        base = 3 * (k - 1)
        if k > kex:
            enc.encode(st, base, 0)
        while True:
            v = abs(int(zz[k])) >> al
            if v:
                if v >> 1:  # history coefficient: correction bit
                    enc.encode(st, base + 2, v & 1)
                else:  # newly significant: sign via fixed bin
                    enc.encode(st, base + 1, 1)
                    enc.encode(fixed, 0, 1 if int(zz[k]) < 0 else 0)
                break
            enc.encode(st, base + 1, 0)
            k += 1
            base = 3 * (k - 1)
        k += 1
    if ke < se:
        enc.encode(st, 3 * (max(ke + 1, ss) - 1), 1)  # EOB


# ---------------------------------------------------------------------------
# scan decode (wired from jpeg.decode_jpeg for SOF9 frames)
# ---------------------------------------------------------------------------


class _ArithScanState:
    """Per-entropy-segment state: stats areas keyed by conditioning
    table id (shared across components using the same table, per
    §F.1.4.4), per-component DC prediction + context."""

    def __init__(self, scan, cond) -> None:
        self.dc_stats = {td: bytearray(_DC_STAT_BINS)
                         for _, td, _ in scan}
        self.ac_stats = {ta: bytearray(_AC_STAT_BINS)
                         for _, _, ta in scan}
        self.fixed = _fixed_bin()
        self.cond = cond
        self.last_dc = {c["id"]: 0 for c, _, _ in scan}
        self.dc_ctx = {c["id"]: 0 for c, _, _ in scan}


def _consume_restart(data: bytes, pos: int) -> tuple[int, int]:
    """Scan forward over any undrained entropy bytes to the next
    marker; it must be RSTn. → (n, pos_after_marker)."""
    while pos + 1 < len(data):
        if data[pos] == 0xFF and data[pos + 1] != 0x00:
            m = data[pos + 1]
            if 0xD0 <= m <= 0xD7:
                return m - 0xD0, pos + 2
            raise ValueError("expected restart marker")
        pos += 1
    raise ValueError("expected restart marker")


def _decode_scan_arith(
    data, pos, frame, scan, qts, cond, restart_interval
) -> tuple[int, int, float]:
    """Sequential arithmetic scan → (width, height, luma mean); the
    MCU walk / IDCT / crop discipline mirrors jpeg._decode_scan
    (incl. 12-bit extended-sequential level shift / clamp / mean
    scale)."""
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    p = frame.get("prec", 8)
    level, vmaxv = 1 << (p - 1), (1 << p) - 1
    if not w or not h:
        raise ValueError("zero-dimension JPEG")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax < 1 or vmax < 1 or hmax > 4 or vmax > 4:
        raise ValueError("bad sampling factors")
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = {}
    for c in comps:
        c["bw"] = mcux * c["h"]
        c["bh"] = mcuy * c["v"]
        planes[c["id"]] = np.zeros((c["bh"] * 8, c["bw"] * 8), dtype=np.int64)

    dec = _QMDecoder(data, pos)
    state = _ArithScanState(scan, cond)
    zz = np.zeros(64, dtype=np.int64)
    mcu_count = 0
    next_rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if (restart_interval and mcu_count
                    and mcu_count % restart_interval == 0):
                got, npos = _consume_restart(data, dec.pos)
                if got != next_rst:
                    raise ValueError("restart marker out of sequence")
                next_rst = (next_rst + 1) & 7
                dec = _QMDecoder(data, npos)
                state = _ArithScanState(scan, cond)
            for comp, td, ta in scan:
                qt = qts.get(comp["tq"])
                if qt is None:
                    raise ValueError("missing quant table")
                lo, up = cond.get(("dc", td), _DEFAULT_DC_COND)
                kx = cond.get(("ac", ta), _DEFAULT_AC_KX)
                for byy in range(comp["v"]):
                    for bxx in range(comp["h"]):
                        zz[:] = 0
                        diff, nxt = _decode_dc(
                            dec, state.dc_stats[td],
                            state.dc_ctx[comp["id"]], lo, up,
                        )
                        state.dc_ctx[comp["id"]] = nxt
                        state.last_dc[comp["id"]] += diff
                        zz[0] = state.last_dc[comp["id"]]
                        _decode_ac_block(
                            dec, state.ac_stats[ta], state.fixed, kx, zz,
                        )
                        S = np.zeros((8, 8), dtype=np.float64)
                        for k in range(64):
                            if zz[k]:
                                r, cc = ZIGZAG[k]
                                S[r, cc] = zz[k] * qt[r, cc]
                        blk = _A.T @ S @ _A
                        px = np.clip(
                            np.floor(blk + level + 0.5), 0, vmaxv
                        ).astype(np.int64)
                        by0 = (my * comp["v"] + byy) * 8
                        bx0 = (mx * comp["h"] + bxx) * 8
                        planes[comp["id"]][by0:by0 + 8, bx0:bx0 + 8] = px
            mcu_count += 1
    c0 = scan[0][0]
    cw = (w * c0["h"] + hmax - 1) // hmax
    ch = (h * c0["v"] + vmax - 1) // vmax
    luma = planes[c0["id"]][:ch, :cw]
    total = int(luma.sum(dtype=np.int64))
    return int(w), int(h), total * 255 / float(vmaxv * cw * ch)


def _progressive_scan_arith(
    data, pos, frame, scan, cond, restart_interval, coefs, ss, se, ah, al,
) -> int:
    """Decode one PROGRESSIVE arithmetic scan (SOF10, G.2) into the
    coefficient store; returns the position of the next marker. Scan
    kinds: DC first (sequential DC model on point-transformed diffs),
    DC refinement (one fixed-bin decision per block), AC first
    (sequential AC model over the spectral band, values << Al), AC
    refinement (_decode_ac_refine). Statistics reset per scan and per
    restart segment, like the sequential path."""
    dec = _QMDecoder(data, pos)
    state = _ArithScanState(scan, cond)
    next_rst = 0

    def maybe_restart(unit: int) -> None:
        nonlocal dec, state, next_rst
        if restart_interval and unit and unit % restart_interval == 0:
            got, npos = _consume_restart(data, dec.pos)
            if got != next_rst:
                raise ValueError("restart marker out of sequence")
            next_rst = (next_rst + 1) & 7
            dec = _QMDecoder(data, npos)
            state = _ArithScanState(scan, cond)

    if ss == 0:
        if se != 0:
            raise ValueError("progressive DC scan with Se != 0")

        def dc_block(comp, td, blk) -> None:
            if ah == 0:
                lo, up = cond.get(("dc", td), _DEFAULT_DC_COND)
                diff, nxt = _decode_dc(
                    dec, state.dc_stats[td],
                    state.dc_ctx[comp["id"]], lo, up,
                )
                state.dc_ctx[comp["id"]] = nxt
                state.last_dc[comp["id"]] += diff
                blk[0] = state.last_dc[comp["id"]] << al
            elif dec.decode(state.fixed, 0):
                blk[0] = int(blk[0]) | (1 << al)

        if len(scan) == 1:  # non-interleaved: component's own grid
            from embulk_spark.functions.jpeg import _comp_block_dims

            comp, td, _ta = scan[0]
            bw_n, bh_n = _comp_block_dims(frame, comp)
            unit = 0
            for by in range(bh_n):
                for bx in range(bw_n):
                    maybe_restart(unit)
                    dc_block(comp, td, coefs[comp["id"]][by, bx])
                    unit += 1
        else:  # interleaved MCU walk (padded grid, like baseline)
            hmax = max(c["h"] for c in frame["comps"])
            vmax = max(c["v"] for c in frame["comps"])
            mcux = (frame["w"] + 8 * hmax - 1) // (8 * hmax)
            mcuy = (frame["h"] + 8 * vmax - 1) // (8 * vmax)
            unit = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    maybe_restart(unit)
                    for comp, td, _ta in scan:
                        for byy in range(comp["v"]):
                            for bxx in range(comp["h"]):
                                dc_block(
                                    comp, td,
                                    coefs[comp["id"]][
                                        my * comp["v"] + byy,
                                        mx * comp["h"] + bxx,
                                    ],
                                )
                    unit += 1
    else:
        if len(scan) != 1:
            raise ValueError("progressive AC scan must be non-interleaved")
        if ah == 0 and al > 13:
            raise ValueError("bad AC point transform")
        from embulk_spark.functions.jpeg import _comp_block_dims

        comp, _td, ta = scan[0]
        kx = cond.get(("ac", ta), _DEFAULT_AC_KX)
        bw_n, bh_n = _comp_block_dims(frame, comp)
        unit = 0
        for by in range(bh_n):
            for bx in range(bw_n):
                maybe_restart(unit)
                blk = coefs[comp["id"]][by, bx]
                if ah == 0:
                    _decode_ac_block(
                        dec, state.ac_stats[ta], state.fixed, kx, blk,
                        ss, se, al,
                    )
                else:
                    _decode_ac_refine(
                        dec, state.ac_stats[ta], state.fixed, blk,
                        ss, se, al,
                    )
                unit += 1

    # skip to the next marker (consume trailing RSTs / fill bytes)
    p = dec.pos
    while p + 1 < len(data):
        if data[p] == 0xFF and data[p + 1] != 0x00:
            if 0xD0 <= data[p + 1] <= 0xD7:
                p += 2
                continue
            return p
        p += 1
    raise ValueError("unterminated progressive scan")


# ---------------------------------------------------------------------------
# encoder (fixture generator + conformance vehicle)
# ---------------------------------------------------------------------------


def _arith_headers(width: int, height: int, comps,
                   restart_interval: int = 0,
                   dc_cond: tuple[int, int] = _DEFAULT_DC_COND,
                   kx: int = _DEFAULT_AC_KX,
                   precision: int = 8) -> bytes:
    """SOI..SOS for an SOF9 stream: like jpeg._headers but no DHT (no
    huffman tables in arithmetic streams); a DAC marker (B.2.4.3) is
    emitted only when the conditioning differs from the spec defaults
    (L=0, U=1, Kx=5)."""
    out = bytearray(b"\xFF\xD8")
    out += (
        b"\xFF\xE0" + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    )
    zzq = bytes(int(STD_LUMA_QT[r, c]) for (r, c) in ZIGZAG)
    out += b"\xFF\xDB" + struct.pack(">H", 67) + b"\x00" + zzq
    out += b"\xFF\xC9" + struct.pack(
        ">HBHHB", 8 + 3 * len(comps), precision, height, width, len(comps)
    )
    for cid, hf, vf in comps:
        out += bytes([cid, (hf << 4) | vf, 0])
    if dc_cond != _DEFAULT_DC_COND or kx != _DEFAULT_AC_KX:
        out += b"\xFF\xCC" + struct.pack(">H", 6)
        out += bytes([0x00, (dc_cond[1] << 4) | dc_cond[0], 0x10, kx])
    if restart_interval:
        out += b"\xFF\xDD" + struct.pack(">HH", 4, restart_interval)
    out += b"\xFF\xDA" + struct.pack(">HB", 6 + 2 * len(comps), len(comps))
    for cid, _, _ in comps:
        out += bytes([cid, 0x00])
    out += b"\x00\x3F\x00"
    return bytes(out)


class _ArithEncState:
    def __init__(self, ncomp: int,
                 dc_cond: tuple[int, int] = _DEFAULT_DC_COND,
                 kx: int = _DEFAULT_AC_KX) -> None:
        self.enc = _QMEncoder()
        self.dc_stats = bytearray(_DC_STAT_BINS)
        self.ac_stats = bytearray(_AC_STAT_BINS)
        self.fixed = _fixed_bin()
        self.preds = [0] * ncomp
        self.ctxs = [0] * ncomp
        self.dc_cond = dc_cond
        self.kx = kx


def _encode_block_arith(st: _ArithEncState, ci: int, blk,
                        level: float = 128.0) -> None:
    q = _quantize_block(blk, STD_LUMA_QT, level=level)
    zz = [int(q[r, c]) for (r, c) in ZIGZAG]
    diff = zz[0] - st.preds[ci]
    st.preds[ci] = zz[0]
    st.ctxs[ci] = _encode_dc(
        st.enc, st.dc_stats, st.ctxs[ci], diff,
        st.dc_cond[0], st.dc_cond[1],
    )
    _encode_ac_block(st.enc, st.ac_stats, st.fixed, st.kx, zz)


def encode_jpeg_gray_arith(
    width: int, height: int, pix_fn, restart_interval: int = 0,
    dc_cond: tuple[int, int] = _DEFAULT_DC_COND,
    kx: int = _DEFAULT_AC_KX, precision: int = 8,
) -> bytes:
    """SOF9 JFIF, one grayscale component at 8- or 12-bit
    ``precision``, Annex-K luminance quant table.
    ``pix_fn(x, y) -> 0..2^P-1``; ``restart_interval`` emits DRI +
    RSTn with a full coder/stats re-init per segment — the arithmetic
    analogue of jpeg.encode_jpeg_gray. Non-default ``dc_cond``/``kx``
    conditioning is declared via a DAC marker."""
    if precision not in (8, 12):
        raise ValueError("extended-sequential precision must be 8 or 12")
    level = float(1 << (precision - 1))
    img = np.fromfunction(
        np.vectorize(lambda y, x: pix_fn(int(x), int(y))), (height, width)
    ).astype(np.float64)
    out = bytearray(_arith_headers(
        width, height, [(1, 1, 1)], restart_interval, dc_cond, kx,
        precision,
    ))
    st = _ArithEncState(1, dc_cond, kx)
    mcu = 0
    rst = 0
    for by in range((height + 7) // 8):
        for bx in range((width + 7) // 8):
            if restart_interval and mcu and mcu % restart_interval == 0:
                out += st.enc.flush()
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                st = _ArithEncState(1, dc_cond, kx)
            _encode_block_arith(st, 0, _block_at(img, bx, by), level)
            mcu += 1
    out += st.enc.flush()
    out += b"\xFF\xD9"
    return bytes(out)


def encode_jpeg_gray_progressive_arith(
    width: int, height: int, pix_fn, *, dc_al: int = 1, split: int = 6,
    ac_al: int = 1,
) -> bytes:
    """PROGRESSIVE arithmetic JFIF fixture (SOF10, one grayscale
    component): the same scan script as jpeg.encode_jpeg_gray_progressive
    — DC first at ``Al=dc_al`` + DC refinements, AC spectral selection
    in two bands split at ``split``, each first at ``Al=ac_al`` then
    refined — every G.2 arithmetic scan kind. Coefficients come from
    the shared ``_quantize_block``, so a fully-refined SOF10 stream
    must decode bit-identically to both the SOF9 and the huffman
    streams of the same image."""
    img = np.fromfunction(
        np.vectorize(lambda y, x: pix_fn(int(x), int(y))), (height, width)
    ).astype(np.float64)
    zz_blocks = []
    for by in range((height + 7) // 8):
        for bx in range((width + 7) // 8):
            q = _quantize_block(_block_at(img, bx, by), STD_LUMA_QT)
            zz_blocks.append([int(q[r, c]) for (r, c) in ZIGZAG])

    out = bytearray(b"\xFF\xD8")
    out += (
        b"\xFF\xE0" + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    )
    zzq = bytes(int(STD_LUMA_QT[r, c]) for (r, c) in ZIGZAG)
    out += b"\xFF\xDB" + struct.pack(">H", 67) + b"\x00" + zzq
    out += b"\xFF\xCA" + struct.pack(">HBHHB", 11, 8, height, width, 1)
    out += bytes([1, 0x11, 0])

    def sos(ss, se, ah, al) -> bytes:
        return (
            b"\xFF\xDA" + struct.pack(">HB", 8, 1)
            + bytes([1, 0x00])
            + bytes([ss, se, (ah << 4) | al])
        )

    # DC first (sequential DC model on the point-transformed values)
    out += sos(0, 0, 0, dc_al)
    st = _ArithEncState(1)
    for zz in zz_blocks:
        v = zz[0] >> dc_al
        diff = v - st.preds[0]
        st.preds[0] = v
        st.ctxs[0] = _encode_dc(
            st.enc, st.dc_stats, st.ctxs[0], diff,
            _DEFAULT_DC_COND[0], _DEFAULT_DC_COND[1],
        )
    out += st.enc.flush()
    # DC refinements: one fixed-bin decision per block (G.3.1.2)
    for a in range(dc_al - 1, -1, -1):
        out += sos(0, 0, a + 1, a)
        st = _ArithEncState(1)
        for zz in zz_blocks:
            st.enc.encode(st.fixed, 0, (zz[0] >> a) & 1)
        out += st.enc.flush()
    # AC: two spectral bands, first pass at ac_al then refinements
    bands = [(1, split - 1), (split, 63)]
    for lo, hi in bands:
        out += sos(lo, hi, 0, ac_al)
        st = _ArithEncState(1)
        for zz in zz_blocks:
            _encode_ac_block(
                st.enc, st.ac_stats, st.fixed, _DEFAULT_AC_KX, zz,
                lo, hi, ac_al,
            )
        out += st.enc.flush()
    for a in range(ac_al - 1, -1, -1):
        for lo, hi in bands:
            out += sos(lo, hi, a + 1, a)
            st = _ArithEncState(1)
            for zz in zz_blocks:
                _encode_ac_refine(
                    st.enc, st.ac_stats, st.fixed, zz, lo, hi, a,
                )
            out += st.enc.flush()
    out += b"\xFF\xD9"
    return bytes(out)


def synth_jpeg_arith_bytes(doc_id: int) -> bytes:
    """Deterministic real SOF9 (arithmetic-coded) JPEG: the SAME
    block-constant closed form as jpeg.synth_jpeg_bytes, reached
    through the QM entropy coder — the DuckDB oracle recomputes the
    decoded mean arithmetically, so the whole arithmetic path (state
    machine, byteout, models) must agree with the encoder."""
    from embulk_spark.functions.jpeg import (
        synth_block_value,
        synth_jpeg_dims,
    )

    w, h = synth_jpeg_dims(doc_id)
    return encode_jpeg_gray_arith(
        w, h, lambda x, y: synth_block_value(x // 8, y // 8, doc_id)
    )


def synth_jpeg_prog_arith_bytes(doc_id: int) -> bytes:
    """Deterministic real SOF10 (progressive-arithmetic) JPEG: the SAME
    block-constant closed form, reached through the G.2 successive-
    approximation scan script over the QM coder."""
    from embulk_spark.functions.jpeg import (
        synth_block_value,
        synth_jpeg_dims,
    )

    w, h = synth_jpeg_dims(doc_id)
    return encode_jpeg_gray_progressive_arith(
        w, h, lambda x, y: synth_block_value(x // 8, y // 8, doc_id)
    )


def encode_jpeg_color420_arith(width: int, height: int, rgb_fn) -> bytes:
    """SOF9 JFIF, 3-component YCbCr 4:2:0 — the arithmetic analogue of
    jpeg.encode_jpeg_color420 (same BT.601 conversion and 2×2 chroma
    box average, all components on the luminance quant table)."""
    rgb = np.zeros((height, width, 3))
    for y in range(height):
        for x in range(width):
            rgb[y, x] = rgb_fn(x, y)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    Y = 0.299 * r + 0.587 * g + 0.114 * b
    Cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    Cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    cw, chh = (width + 1) // 2, (height + 1) // 2
    Yp = np.pad(Y, ((0, height % 2), (0, width % 2)), mode="edge")
    Cbp = np.pad(Cb, ((0, height % 2), (0, width % 2)), mode="edge")
    Crp = np.pad(Cr, ((0, height % 2), (0, width % 2)), mode="edge")
    cb = Cbp.reshape(chh, 2, cw, 2).mean(axis=(1, 3))
    cr = Crp.reshape(chh, 2, cw, 2).mean(axis=(1, 3))

    out = bytearray(
        _arith_headers(width, height, [(1, 2, 2), (2, 1, 1), (3, 1, 1)])
    )
    st = _ArithEncState(3)
    mcux = (width + 15) // 16
    mcuy = (height + 15) // 16
    for my in range(mcuy):
        for mx in range(mcux):
            for byy in range(2):
                for bxx in range(2):
                    _encode_block_arith(
                        st, 0, _block_at(Yp, mx * 2 + bxx, my * 2 + byy)
                    )
            _encode_block_arith(st, 1, _block_at(cb, mx, my))
            _encode_block_arith(st, 2, _block_at(cr, mx, my))
    out += st.enc.flush()
    out += b"\xFF\xD9"
    return bytes(out)
