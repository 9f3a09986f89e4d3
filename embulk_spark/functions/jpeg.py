"""Vendored baseline JPEG codec (ITU-T T.81 sequential DCT).

The dominant web image container gets a REAL decoder — same vendoring
discipline as the PNG/BMP/Avro codecs (spec re-implementation from the
public standard, no library): marker walk, DQT/DHT/SOF0/SOS/DRI
parsing, huffman entropy decode with byte-unstuffing and restart
markers, dequantize + inverse zigzag, IDCT via precomputed basis
matrices (numpy, vectorized per block batch), level shift + clamp.
Supports grayscale and 3-component YCbCr at any sampling factors up to
4 (4:4:4, 4:2:2, 4:2:0, …). Raises ValueError on anything outside
baseline (progressive SOF2, arithmetic coding, 12-bit) so the caller's
fake-tier fallback stays honest.

The encoder half is deliberately narrow — grayscale, no subsampling,
standard Annex-K tables — because its job is FIXTURES: synthesizing
deterministic real JPEGs whose decode features a SQL oracle can
recompute. JPEG is lossy, so the fixture images are BLOCK-CONSTANT
(every 8×8 block one value): a constant block survives the
DCT→quantize→dequantize→IDCT round trip in closed form —
only the DC coefficient is nonzero, and the reconstructed flat value is

    recon(v) = clamp(2 * round_half_away((v - 128) / 2) + 128)

with the standard luminance table's Q[0,0] = 16 (DC = 8·(v−128) for a
constant block under T.81's DCT scaling; quantized with round-half-away;
IDCT of a lone DC is flat DC·Q00/8). That closed form is what the
DuckDB oracle evaluates, so the decoder must agree with the encoder
through the real bitstream — huffman, stuffing, zigzag and all.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# spec constants (ITU-T T.81 Annex K — public standard tables)
# ---------------------------------------------------------------------------

#: K.1 luminance quantization table, natural (row-major) order
STD_LUMA_QT = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.int32)

#: K.3.1 / K.3.2 typical luminance huffman tables: (BITS counts, values)
STD_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
STD_DC_VALS = list(range(12))
STD_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
STD_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

#: zigzag scan order: ZIGZAG[k] = (row, col) of the k-th coefficient
_Z = []
for s in range(15):
    ks = range(s + 1)
    for i in (ks if s % 2 else reversed(ks)):
        r, c = i, s - i
        if r < 8 and c < 8:
            _Z.append((r, c))
ZIGZAG = _Z

#: orthonormal DCT-II basis A[u, x] = C(u)/2 · cos((2x+1)uπ/16);
#: forward block DCT = A @ f @ A.T, inverse = A.T @ S @ A
_A = np.zeros((8, 8))
for u in range(8):
    cu = (1.0 / np.sqrt(2.0)) if u == 0 else 1.0
    for x in range(8):
        _A[u, x] = 0.5 * cu * np.cos((2 * x + 1) * u * np.pi / 16.0)


def _round_half_away(x: float) -> int:
    return int(np.floor(abs(x) + 0.5)) * (1 if x >= 0 else -1)


# ---------------------------------------------------------------------------
# encoder (grayscale baseline — fixture generator)
# ---------------------------------------------------------------------------


def _build_huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) per T.81 C.2 canonical code assignment."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.n -= 8
            self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # 1-fill per spec


def _magnitude(v: int) -> tuple[int, int]:
    """(category, appended bits) for a DC diff / AC coefficient."""
    if v == 0:
        return 0, 0
    a = abs(v)
    cat = a.bit_length()
    bits = v if v > 0 else (v + (1 << cat) - 1)
    return cat, bits


def _block_at(img: np.ndarray, bx: int, by: int) -> np.ndarray:
    """8×8 block with edge replication for partial / out-of-plane blocks
    (common encoder choice; MCU grids can extend past the plane)."""
    h, w = img.shape
    ys = np.clip(np.arange(by * 8, by * 8 + 8), 0, h - 1)
    xs = np.clip(np.arange(bx * 8, bx * 8 + 8), 0, w - 1)
    return img[np.ix_(ys, xs)].astype(np.float64)


def _quantize_block(blk: np.ndarray, qt: np.ndarray,
                    level: float = 128.0) -> np.ndarray:
    """DCT → round-half-away quantize one 8×8 block (shared by the
    baseline and progressive encoders; ``level`` is the 2^(P-1) shift
    — 2048 for 12-bit extended-sequential frames)."""
    S = _A @ (blk - level) @ _A.T
    # snap float-DCT noise (±1e-12) so integer-valued coefficients
    # quantize deterministically at exact .5 boundaries — the
    # closed-form oracle depends on round-half-away of exact ratios
    S = np.round(S * 1048576.0) / 1048576.0
    return np.array(
        [
            [_round_half_away(S[r, c] / qt[r, c]) for c in range(8)]
            for r in range(8)
        ],
        dtype=np.int64,
    )


def _encode_block(bw, blk, pred, qt, dc_codes, ac_codes) -> int:
    """DCT → quantize → huffman one block; returns the new DC pred."""
    q = _quantize_block(blk, qt)
    diff = int(q[0, 0]) - pred
    cat, bits = _magnitude(diff)
    code, ln = dc_codes[cat]
    bw.put(code, ln)
    if cat:
        bw.put(bits, cat)
    zz = [int(q[r, c]) for (r, c) in ZIGZAG[1:]]
    last_nz = -1
    for i, v in enumerate(zz):
        if v:
            last_nz = i
    run = 0
    for i, v in enumerate(zz):
        if i > last_nz:
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            bw.put(code, ln)
            run -= 16
        cat, bits = _magnitude(v)
        code, ln = ac_codes[(run << 4) | cat]
        bw.put(code, ln)
        bw.put(bits, cat)
        run = 0
    if last_nz < 62:
        code, ln = ac_codes[0x00]  # EOB
        bw.put(code, ln)
    return int(q[0, 0])


def _headers(width: int, height: int, comps: list[tuple[int, int, int]],
             restart_interval: int = 0) -> bytes:
    """SOI..SOS headers; comps = [(id, h_factor, v_factor)], all on the
    Annex-K luminance tables (legal, fixture-grade)."""
    out = bytearray(b"\xFF\xD8")
    out += (
        b"\xFF\xE0" + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    )
    zzq = bytes(int(STD_LUMA_QT[r, c]) for (r, c) in ZIGZAG)
    out += b"\xFF\xDB" + struct.pack(">H", 67) + b"\x00" + zzq
    out += b"\xFF\xC0" + struct.pack(
        ">HBHHB", 8 + 3 * len(comps), 8, height, width, len(comps)
    )
    for cid, hf, vf in comps:
        out += bytes([cid, (hf << 4) | vf, 0])
    for cls, bits, vals in (
        (0x00, STD_DC_BITS, STD_DC_VALS),
        (0x10, STD_AC_BITS, STD_AC_VALS),
    ):
        out += b"\xFF\xC4" + struct.pack(">H", 3 + 16 + len(vals))
        out += bytes([cls]) + bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xFF\xDD" + struct.pack(">HH", 4, restart_interval)
    out += b"\xFF\xDA" + struct.pack(">HB", 6 + 2 * len(comps), len(comps))
    for cid, _, _ in comps:
        out += bytes([cid, 0x00])
    out += b"\x00\x3F\x00"
    return bytes(out)


def encode_jpeg_gray(
    width: int, height: int, pix_fn, restart_interval: int = 0
) -> bytes:
    """Baseline JFIF, one 8-bit grayscale component, no subsampling,
    Annex-K tables. ``pix_fn(x, y) -> 0..255``. ``restart_interval``
    emits DRI + RSTn markers every that many MCUs (decoder-path
    fixture)."""
    dc_codes = _build_huff_codes(STD_DC_BITS, STD_DC_VALS)
    ac_codes = _build_huff_codes(STD_AC_BITS, STD_AC_VALS)
    img = np.fromfunction(
        np.vectorize(lambda y, x: pix_fn(int(x), int(y))), (height, width)
    ).astype(np.float64)

    out = bytearray(_headers(width, height, [(1, 1, 1)], restart_interval))
    bw = _BitWriter()
    pred = 0
    mcu = 0
    rst = 0
    for by in range((height + 7) // 8):
        for bx in range((width + 7) // 8):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bw.flush()
                out += bw.buf
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                bw = _BitWriter()
                pred = 0
            pred = _encode_block(
                bw, _block_at(img, bx, by), pred, STD_LUMA_QT,
                dc_codes, ac_codes,
            )
            mcu += 1
    bw.flush()
    out += bw.buf
    out += b"\xFF\xD9"
    return bytes(out)


def encode_jpeg_color420(width: int, height: int, rgb_fn) -> bytes:
    """Baseline JFIF, 3-component YCbCr with 4:2:0 subsampling (Y 2×2,
    chroma 1×1) — the dominant web-photo layout; decoder-path fixture.
    ``rgb_fn(x, y) -> (r, g, b)``. JFIF BT.601 full-range conversion;
    chroma planes are 2×2 box-averaged."""
    dc_codes = _build_huff_codes(STD_DC_BITS, STD_DC_VALS)
    ac_codes = _build_huff_codes(STD_AC_BITS, STD_AC_VALS)
    rgb = np.zeros((height, width, 3))
    for y in range(height):
        for x in range(width):
            rgb[y, x] = rgb_fn(x, y)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    Y = 0.299 * r + 0.587 * g + 0.114 * b
    Cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    Cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    cw, chh = (width + 1) // 2, (height + 1) // 2
    # pad to even then 2x2 box average
    Yp = np.pad(Y, ((0, height % 2), (0, width % 2)), mode="edge")
    Cbp = np.pad(Cb, ((0, height % 2), (0, width % 2)), mode="edge")
    Crp = np.pad(Cr, ((0, height % 2), (0, width % 2)), mode="edge")
    cb = Cbp.reshape(chh, 2, cw, 2).mean(axis=(1, 3))
    cr = Crp.reshape(chh, 2, cw, 2).mean(axis=(1, 3))

    out = bytearray(
        _headers(width, height, [(1, 2, 2), (2, 1, 1), (3, 1, 1)])
    )
    bw = _BitWriter()
    preds = [0, 0, 0]
    mcux = (width + 15) // 16
    mcuy = (height + 15) // 16
    for my in range(mcuy):
        for mx in range(mcux):
            for byy in range(2):
                for bxx in range(2):
                    preds[0] = _encode_block(
                        bw, _block_at(Yp, mx * 2 + bxx, my * 2 + byy),
                        preds[0], STD_LUMA_QT, dc_codes, ac_codes,
                    )
            preds[1] = _encode_block(
                bw, _block_at(cb, mx, my), preds[1], STD_LUMA_QT,
                dc_codes, ac_codes,
            )
            preds[2] = _encode_block(
                bw, _block_at(cr, mx, my), preds[2], STD_LUMA_QT,
                dc_codes, ac_codes,
            )
    bw.flush()
    out += bw.buf
    out += b"\xFF\xD9"
    return bytes(out)


# ---------------------------------------------------------------------------
# progressive encoder (grayscale fixture generator, T.81 Annex G)
# ---------------------------------------------------------------------------

#: flat custom AC table for progressive scans: every run/size symbol,
#: ZRL, and the EOBn symbols (r ≤ 14) the Annex-K table lacks — all at
#: length 9 (176 ≤ 2^9 codes: a legal, if uncompressed, canonical DHT).
_PROG_AC_VALS = sorted(
    {(r << 4) | s for r in range(16) for s in range(1, 11)}
    | {0xF0}
    | {r << 4 for r in range(15)}
)
_PROG_AC_BITS = [0] * 8 + [len(_PROG_AC_VALS)] + [0] * 7


def _pt_ac(v: int, al: int) -> int:
    """AC point transform: magnitude shift, sign preserved (G.1.2.2)."""
    return v >> al if v >= 0 else -((-v) >> al)


def _flush_eobrun(bw, ac_codes, state) -> None:
    run = state["eobrun"]
    if run:
        r = run.bit_length() - 1
        code, ln = ac_codes[r << 4]
        bw.put(code, ln)
        if r:
            bw.put(run - (1 << r), r)
        state["eobrun"] = 0
    for b in state["eob_bits"]:
        bw.put(b, 1)
    state["eob_bits"] = []


def _emit_ac_first_block(bw, ac_codes, zz, ss, se, al, state) -> None:
    run = 0
    for k in range(ss, se + 1):
        v = _pt_ac(int(zz[k]), al)
        if v == 0:
            run += 1
            continue
        _flush_eobrun(bw, ac_codes, state)
        while run > 15:
            code, ln = ac_codes[0xF0]
            bw.put(code, ln)
            run -= 16
        cat, bits = _magnitude(v)
        code, ln = ac_codes[(run << 4) | cat]
        bw.put(code, ln)
        bw.put(bits, cat)
        run = 0
    if run:
        state["eobrun"] += 1
        if state["eobrun"] >= 0x3FFF:
            _flush_eobrun(bw, ac_codes, state)


def _emit_ac_refine_block(bw, ac_codes, zz, ss, se, al, state) -> None:
    """Mirror of the decoder's refinement walk (G.1.2.3): history
    coefficients' correction bits ride positionally after the code that
    spans them; fully-EOB tails buffer into the open EOB run."""

    def tmag(k: int) -> int:
        return abs(int(zz[k])) >> al

    k = ss
    while k <= se:
        # scan ahead for the next newly-significant coefficient
        j, r, probe = k, 0, []
        nxt = None
        while j <= se:
            t = tmag(j)
            if t == 1:
                nxt = j
                break
            if t == 0:
                r += 1
            else:
                probe.append(t & 1)
            j += 1
        if nxt is None:
            state["eob_bits"].extend(probe)
            state["eobrun"] += 1
            if state["eobrun"] >= 0x3FFF:
                _flush_eobrun(bw, ac_codes, state)
            return
        _flush_eobrun(bw, ac_codes, state)
        while r > 15:
            code, ln = ac_codes[0xF0]
            bw.put(code, ln)
            zeros = 0
            while zeros < 16:  # span consumes exactly 16 newly-zero slots
                t = tmag(k)
                if t == 0:
                    zeros += 1
                elif t > 1:
                    bw.put(t & 1, 1)
                k += 1
            r -= 16
        code, ln = ac_codes[(r << 4) | 1]
        bw.put(code, ln)
        bw.put(1 if int(zz[nxt]) > 0 else 0, 1)
        while k < nxt:  # correction bits for history coeffs in the run
            t = tmag(k)
            if t > 1:
                bw.put(t & 1, 1)
            k += 1
        k = nxt + 1
    # block ended exactly at a newly-significant coefficient: no EOB


def encode_jpeg_gray_progressive(
    width: int, height: int, pix_fn, *, dc_al: int = 1, split: int = 6,
    ac_al: int = 1,
) -> bytes:
    """Progressive JFIF fixture (SOF2, one grayscale component): DC
    first at ``Al=dc_al`` + DC refinement bits, AC spectral selection in
    two bands split at ``split``, each band first at ``Al=ac_al`` then
    refined to full precision — every Annex-G scan kind the decoder
    implements. Coefficients are identical to the baseline encoder's
    (shared ``_quantize_block``), so a fully-refined progressive stream
    must decode bit-identically to the sequential one."""
    zz_blocks = []
    img = np.fromfunction(
        np.vectorize(lambda y, x: pix_fn(int(x), int(y))), (height, width)
    ).astype(np.float64)
    for by in range((height + 7) // 8):
        for bx in range((width + 7) // 8):
            q = _quantize_block(_block_at(img, bx, by), STD_LUMA_QT)
            zz_blocks.append(
                np.array([int(q[r, c]) for (r, c) in ZIGZAG], dtype=np.int64)
            )
    dc_codes = _build_huff_codes(STD_DC_BITS, STD_DC_VALS)
    ac_codes = _build_huff_codes(_PROG_AC_BITS, _PROG_AC_VALS)

    out = bytearray(b"\xFF\xD8")
    out += (
        b"\xFF\xE0" + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    )
    zzq = bytes(int(STD_LUMA_QT[r, c]) for (r, c) in ZIGZAG)
    out += b"\xFF\xDB" + struct.pack(">H", 67) + b"\x00" + zzq
    out += b"\xFF\xC2" + struct.pack(">HBHHB", 11, 8, height, width, 1)
    out += bytes([1, 0x11, 0])
    out += b"\xFF\xC4" + struct.pack(">H", 3 + 16 + len(STD_DC_VALS))
    out += bytes([0x00]) + bytes(STD_DC_BITS) + bytes(STD_DC_VALS)
    out += b"\xFF\xC4" + struct.pack(">H", 3 + 16 + len(_PROG_AC_VALS))
    out += bytes([0x10]) + bytes(_PROG_AC_BITS) + bytes(_PROG_AC_VALS)

    def sos(ss, se, ah, al) -> bytes:
        # Td=0 (std DC table), Ta=0 (the custom flat AC table)
        return (
            b"\xFF\xDA" + struct.pack(">HB", 8, 1)
            + bytes([1, 0x00])
            + bytes([ss, se, (ah << 4) | al])
        )

    # DC first
    out += sos(0, 0, 0, dc_al)
    bw = _BitWriter()
    pred = 0
    for zz in zz_blocks:
        v = int(zz[0]) >> dc_al  # DC point transform: arithmetic shift
        cat, bits = _magnitude(v - pred)
        code, ln = dc_codes[cat]
        bw.put(code, ln)
        if cat:
            bw.put(bits, cat)
        pred = v
    bw.flush()
    out += bw.buf
    # DC refinements down to full precision
    for a in range(dc_al - 1, -1, -1):
        out += sos(0, 0, a + 1, a)
        bw = _BitWriter()
        for zz in zz_blocks:
            bw.put((int(zz[0]) >> a) & 1, 1)
        bw.flush()
        out += bw.buf
    # AC: two spectral bands, first pass at ac_al then refinements
    bands = [(1, split - 1), (split, 63)]
    for lo, hi in bands:
        out += sos(lo, hi, 0, ac_al)
        bw = _BitWriter()
        state = {"eobrun": 0, "eob_bits": []}
        for zz in zz_blocks:
            _emit_ac_first_block(bw, ac_codes, zz, lo, hi, ac_al, state)
        _flush_eobrun(bw, ac_codes, state)
        bw.flush()
        out += bw.buf
    for a in range(ac_al - 1, -1, -1):
        for lo, hi in bands:
            out += sos(lo, hi, a + 1, a)
            bw = _BitWriter()
            state = {"eobrun": 0, "eob_bits": []}
            for zz in zz_blocks:
                _emit_ac_refine_block(bw, ac_codes, zz, lo, hi, a, state)
            _flush_eobrun(bw, ac_codes, state)
            bw.flush()
            out += bw.buf
    out += b"\xFF\xD9"
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder (general baseline)
# ---------------------------------------------------------------------------


class _HuffTable:
    """Canonical huffman decode via (length-indexed min/max code) — the
    T.81 F.2.2.3 DECODE procedure."""

    def __init__(self, bits: list[int], vals: list[int]):
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code, k = 0, 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.valptr[length] = k
                self.mincode[length] = code
                code += bits[length - 1]
                k += bits[length - 1]
                self.maxcode[length] = code - 1
            code <<= 1
        self.vals = vals

    def decode(self, br: "_BitReader") -> int:
        code = br.bit()
        length = 1
        while length <= 16:
            if code <= self.maxcode[length]:
                return self.vals[self.valptr[length] + code - self.mincode[length]]
            code = (code << 1) | br.bit()
            length += 1
        raise ValueError("invalid huffman code")


class _BitReader:
    """Entropy-segment bit reader: 0xFF00 unstuffing; stops at markers."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated entropy data")
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = (
                    self.data[self.pos + 1]
                    if self.pos + 1 < len(self.data)
                    else None
                )
                if nxt == 0x00:
                    self.pos += 2  # stuffed 0xFF data byte
                    self.acc, self.n = 0xFF, 8
                else:
                    # marker reached: pad with 1-bits, don't consume
                    # (F.2.2.5 — the final partial MCU drains on padding)
                    self.acc, self.n = 0xFF, 8
            else:
                self.pos += 1
                self.acc, self.n = b, 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def receive_extend(self, cat: int) -> int:
        if cat == 0:
            return 0
        v = 0
        for _ in range(cat):
            v = (v << 1) | self.bit()
        if v < (1 << (cat - 1)):
            v -= (1 << cat) - 1
        return v

    def align_restart(self) -> int:
        """Byte-align and consume an RSTn marker; returns n."""
        self.n = 0
        while (
            self.pos + 1 < len(self.data)
            and self.data[self.pos] == 0xFF
            and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            n = self.data[self.pos + 1] - 0xD0
            self.pos += 2
            return n
        raise ValueError("expected restart marker")


def decode_jpeg(data: bytes) -> tuple[int, int, float]:
    """REAL JPEG decode → (width, height, mean over the luma component's
    reconstructed samples, cropped to the image size). Exact integer sum
    with ONE double division — the BMP/PNG discipline.

    Baseline/extended-sequential (SOF0/1) decodes in one streaming scan;
    PROGRESSIVE (SOF2, T.81 Annex G) accumulates coefficients across
    scans — spectral selection, successive approximation (DC and AC
    first + refinement passes, EOB runs, point transforms), restart
    markers — then dequantizes + IDCTs once at EOI. Raises ValueError
    for arithmetic coding, hierarchical/lossless frames, 12-bit, and
    malformed data."""
    if len(data) < 4 or data[0:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, _HuffTable] = {}
    ac_tabs: dict[int, _HuffTable] = {}
    frame = None
    restart_interval = 0
    coefs: dict | None = None  # progressive coefficient store
    arith_cond: dict = {}  # DAC conditioning, (kind, tbl) → bounds
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        body = data[pos + 4 : pos + 2 + seglen]
        if len(body) != seglen - 2:
            raise ValueError("truncated segment")
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                i += 1
                n = 64 * (2 if pq else 1)
                raw = body[i : i + n]
                if len(raw) != n:
                    raise ValueError("bad DQT")
                tbl = np.zeros((8, 8), dtype=np.int32)
                for k, (r, c) in enumerate(ZIGZAG):
                    tbl[r, c] = (
                        struct.unpack_from(">H", raw, 2 * k)[0] if pq else raw[k]
                    )
                qts[tq] = tbl
                i += n
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(body[i + 17 : i + 17 + nv])
                if len(vals) != nv:
                    raise ValueError("bad DHT")
                (ac_tabs if cls else dc_tabs)[tid] = _HuffTable(bits, vals)
                i += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC9, 0xCA):
            # SOF0/1 baseline, SOF2 progressive, SOF3 lossless,
            # SOF9/SOF10 arithmetic
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            ok_prec = (
                prec == 8
                or (marker == 0xC3 and 2 <= prec <= 16)
                or (marker in (0xC1, 0xC9) and prec == 12)
            )
            if not ok_prec:
                # B.2.2: baseline/progressive are 8-bit; EXTENDED
                # sequential (huffman SOF1 / arithmetic SOF9) adds
                # 12-bit; LOSSLESS takes the full 2..16-bit range
                raise ValueError("unsupported sample precision")
            comps = []
            for c in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", body, 6 + 3 * c)
                comps.append({
                    "id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq,
                })
            frame = {"w": w, "h": h, "comps": comps, "prec": prec,
                     "progressive": marker in (0xC2, 0xCA),
                     "arith": marker in (0xC9, 0xCA),
                     "lossless": marker == 0xC3}
        elif marker == 0xCC:  # DAC — arithmetic conditioning (B.2.4.3)
            i = 0
            while i + 1 < len(body):
                tc, tb = body[i] >> 4, body[i] & 0x0F
                val = body[i + 1]
                if tc == 0:
                    arith_cond[("dc", tb)] = (val & 0x0F, val >> 4)
                else:
                    arith_cond[("ac", tb)] = val
                i += 2
        elif marker in (0xC5, 0xC6, 0xC7, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError("non-DCT (hierarchical/differential/"
                             "lossless-arithmetic) JPEG unsupported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = []
            for s in range(ns):
                cs, tdta = body[1 + 2 * s], body[2 + 2 * s]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append((comp, tdta >> 4, tdta & 0x0F))
            if frame.get("lossless"):
                ss = body[1 + 2 * ns]  # predictor selector
                al = body[3 + 2 * ns] & 0x0F  # point transform
                comp, td, ta = scan[0]
                tab = dc_tabs.get(td)
                if tab is None:
                    raise ValueError("missing lossless DHT")
                return _decode_scan_lossless(
                    data, pos + 2 + seglen, frame,
                    [(comp, td, ta, tab)], ss, al, restart_interval,
                )
            if frame.get("arith") and not frame["progressive"]:
                from embulk_spark.functions.jpeg_arith import (
                    _decode_scan_arith,
                )
                return _decode_scan_arith(
                    data, pos + 2 + seglen, frame, scan, qts,
                    arith_cond, restart_interval,
                )
            if not frame["progressive"]:
                return _decode_scan(
                    data, pos + 2 + seglen, frame, scan, qts, dc_tabs,
                    ac_tabs, restart_interval,
                )
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            a = body[3 + 2 * ns]
            if coefs is None:
                coefs = _init_coef_store(frame)
            if frame.get("arith"):
                from embulk_spark.functions.jpeg_arith import (
                    _progressive_scan_arith,
                )
                pos = _progressive_scan_arith(
                    data, pos + 2 + seglen, frame, scan, arith_cond,
                    restart_interval, coefs, ss, se, a >> 4, a & 0x0F,
                )
            else:
                pos = _progressive_scan(
                    data, pos + 2 + seglen, frame, scan, dc_tabs,
                    ac_tabs, restart_interval, coefs, ss, se,
                    a >> 4, a & 0x0F,
                )
            continue
        pos += 2 + seglen
    if frame is not None and frame.get("progressive") and coefs is not None:
        return _finish_progressive(frame, coefs, qts)
    raise ValueError("no SOS in JPEG")


def _decode_scan(
    data, pos, frame, scan, qts, dc_tabs, ac_tabs, restart_interval
) -> tuple[int, int, float]:
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    p = frame.get("prec", 8)
    level, vmaxv = 1 << (p - 1), (1 << p) - 1
    dc_cat_max = 11 if p == 8 else 15  # F.1.2.1.2: 12-bit adds 4 cats
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
        c["bw"] = mcux * c["h"]  # blocks across, padded to MCU grid
        c["bh"] = mcuy * c["v"]
        planes[c["id"]] = np.zeros((c["bh"] * 8, c["bw"] * 8), dtype=np.int64)

    br = _BitReader(data, pos)
    preds = {c["id"]: 0 for c in comps}
    mcu_count = 0
    next_rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                got = br.align_restart()
                if got != next_rst:
                    raise ValueError("restart marker out of sequence")
                next_rst = (next_rst + 1) & 7
                preds = {c["id"]: 0 for c in comps}
            for comp, td, ta in scan:
                qt = qts.get(comp["tq"])
                dct = dc_tabs.get(td)
                act = ac_tabs.get(ta)
                if qt is None or dct is None or act is None:
                    raise ValueError("missing table")
                for byy in range(comp["v"]):
                    for bxx in range(comp["h"]):
                        S = np.zeros((8, 8), dtype=np.float64)
                        cat = dct.decode(br)
                        if cat > dc_cat_max:
                            raise ValueError("bad DC category")
                        diff = br.receive_extend(cat)
                        preds[comp["id"]] += diff
                        S[0, 0] = preds[comp["id"]] * qt[0, 0]
                        k = 1
                        while k < 64:
                            rs = act.decode(br)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index overflow")
                            rr, cc = ZIGZAG[k]
                            S[rr, cc] = br.receive_extend(s) * qt[rr, cc]
                            k += 1
                        blk = _A.T @ S @ _A
                        px = np.clip(
                            np.floor(blk + level + 0.5), 0, vmaxv
                        ).astype(np.int64)
                        by0 = (my * comp["v"] + byy) * 8
                        bx0 = (mx * comp["h"] + bxx) * 8
                        planes[comp["id"]][by0 : by0 + 8, bx0 : bx0 + 8] = px
            mcu_count += 1
    # luma = the first scan component, cropped to its nominal resolution
    c0 = scan[0][0]
    cw = (w * c0["h"] + hmax - 1) // hmax
    ch = (h * c0["v"] + vmax - 1) // vmax
    luma = planes[c0["id"]][:ch, :cw]
    total = int(luma.sum(dtype=np.int64))
    return int(w), int(h), total * 255 / float(vmaxv * cw * ch)


# ---------------------------------------------------------------------------
# progressive decode (T.81 Annex G — spectral selection + successive
# approximation over an accumulated coefficient store)
# ---------------------------------------------------------------------------


def _comp_block_dims(frame: dict, comp: dict) -> tuple[int, int]:
    """Non-interleaved block grid of one component: ceil over the
    component's NOMINAL resolution (not the MCU-padded grid)."""
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    cw = (frame["w"] * comp["h"] + hmax - 1) // hmax
    ch = (frame["h"] * comp["v"] + vmax - 1) // vmax
    return (cw + 7) // 8, (ch + 7) // 8


def _init_coef_store(frame: dict) -> dict:
    """cid → int32[(bh, bw, 64)] zigzag-order coefficients, MCU-padded
    dims (interleaved DC scans cover the padded grid)."""
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcux = (frame["w"] + 8 * hmax - 1) // (8 * hmax)
    mcuy = (frame["h"] + 8 * vmax - 1) // (8 * vmax)
    return {
        c["id"]: np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32)
        for c in frame["comps"]
    }


def _ac_first_block(br, tab, blk, ss, se, al, eobrun) -> int:
    """One block of a first AC scan (G.1.2.2): run/size codes, EOBn
    runs, coefficients entered at ``<< al``. Returns the new eobrun."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = tab.decode(br)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r < 15:
                eobrun = 1 << r
                if r:
                    eobrun += _receive(br, r)
                return eobrun - 1  # current block is part of the run
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("progressive AC index overflow")
        blk[k] = br.receive_extend(s) << al
        k += 1
    return 0


def _ac_refine_block(br, tab, blk, ss, se, al, eobrun) -> int:
    """One block of an AC refinement scan (G.1.2.3): correction bits for
    history coefficients, ±1<<al insertions for newly-significant ones,
    EOB spans with embedded correction bits."""
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = tab.decode(br)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s == 0:
                if r < 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += _receive(br, r)
                    break  # common EOB tail below handles this block
                # r == 15: ZRL — span 16 newly-zero coefficients
            else:
                if s != 1:
                    raise ValueError("bad refinement size")
                val = p1 if br.bit() else m1
            while k <= se:
                c = int(blk[k])
                if c != 0:
                    if br.bit() and (c & p1) == 0:
                        blk[k] = c + (p1 if c >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if s and k <= se:
                blk[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            c = int(blk[k])
            if c != 0:
                if br.bit() and (c & p1) == 0:
                    blk[k] = c + (p1 if c >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _receive(br, n: int) -> int:
    v = 0
    for _ in range(n):
        v = (v << 1) | br.bit()
    return v


def _progressive_scan(
    data, pos, frame, scan, dc_tabs, ac_tabs, restart_interval,
    coefs, ss, se, ah, al,
) -> int:
    """Decode one progressive scan into the coefficient store; returns
    the position of the next marker after the scan's entropy data."""
    br = _BitReader(data, pos)
    next_rst = 0
    state = {"eobrun": 0}
    preds = {c["id"]: 0 for c, _td, _ta in scan}

    def maybe_restart(unit: int) -> None:
        nonlocal next_rst
        if restart_interval and unit and unit % restart_interval == 0:
            got = br.align_restart()
            if got != next_rst:
                raise ValueError("restart marker out of sequence")
            next_rst = (next_rst + 1) & 7
            for cid in preds:
                preds[cid] = 0
            state["eobrun"] = 0

    if ss == 0:
        if se != 0:
            raise ValueError("progressive DC scan with Se != 0")

        def dc_block(comp, tab, blk) -> None:
            if ah == 0:
                cat = tab.decode(br)
                if cat > 11:
                    raise ValueError("bad DC category")
                preds[comp["id"]] += br.receive_extend(cat)
                blk[0] = preds[comp["id"]] << al
            elif br.bit():
                blk[0] = int(blk[0]) | (1 << al)

        if len(scan) == 1:  # non-interleaved: component's own grid
            comp, td, _ta = scan[0]
            tab = dc_tabs.get(td)
            if tab is None:
                raise ValueError("missing DC table")
            bw_n, bh_n = _comp_block_dims(frame, comp)
            unit = 0
            for by in range(bh_n):
                for bx in range(bw_n):
                    maybe_restart(unit)
                    dc_block(comp, tab, coefs[comp["id"]][by, bx])
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
                        tab = dc_tabs.get(td)
                        if tab is None:
                            raise ValueError("missing DC table")
                        for byy in range(comp["v"]):
                            for bxx in range(comp["h"]):
                                dc_block(
                                    comp, tab,
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
        comp, _td, ta = scan[0]
        tab = ac_tabs.get(ta)
        if tab is None:
            raise ValueError("missing AC table")
        bw_n, bh_n = _comp_block_dims(frame, comp)
        unit = 0
        for by in range(bh_n):
            for bx in range(bw_n):
                maybe_restart(unit)
                blk = coefs[comp["id"]][by, bx]
                if ah == 0:
                    state["eobrun"] = _ac_first_block(
                        br, tab, blk, ss, se, al, state["eobrun"]
                    )
                else:
                    state["eobrun"] = _ac_refine_block(
                        br, tab, blk, ss, se, al, state["eobrun"]
                    )
                unit += 1

    # skip to the next marker (consume trailing RSTs / fill bytes)
    p = br.pos
    while p + 1 < len(data):
        if data[p] == 0xFF and data[p + 1] != 0x00:
            if 0xD0 <= data[p + 1] <= 0xD7:
                p += 2
                continue
            break
        p += 1
    return p


def _finish_progressive(frame, coefs, qts) -> tuple[int, int, float]:
    """Dequantize + IDCT the accumulated coefficient store; same crop
    and exact-integer-mean contract as the baseline path."""
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    if not w or not h:
        raise ValueError("zero-dimension JPEG")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    c0 = comps[0]
    qt = qts.get(c0["tq"])
    if qt is None:
        raise ValueError("missing quantization table")
    qt_zz = np.array([qt[r, c] for (r, c) in ZIGZAG], dtype=np.float64)
    store = coefs[c0["id"]]
    bh, bw = store.shape[:2]
    plane = np.zeros((bh * 8, bw * 8), dtype=np.int64)
    natural = np.zeros(64, dtype=np.int64)
    for k, (r, c) in enumerate(ZIGZAG):
        natural[k] = r * 8 + c
    for by in range(bh):
        for bx in range(bw):
            S = np.zeros(64, dtype=np.float64)
            S[natural] = store[by, bx].astype(np.float64) * qt_zz
            blk = _A.T @ S.reshape(8, 8) @ _A
            plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = np.clip(
                np.floor(blk + 128.5), 0, 255
            ).astype(np.int64)
    cw = (w * c0["h"] + hmax - 1) // hmax
    ch = (h * c0["v"] + vmax - 1) // vmax
    luma = plane[:ch, :cw]
    return int(w), int(h), int(luma.sum(dtype=np.int64)) / float(cw * ch)


# ---------------------------------------------------------------------------
# SQL-recomputable synth fixture (block-constant images)
# ---------------------------------------------------------------------------


def synth_jpeg_dims(doc_id: int) -> tuple[int, int]:
    """Multiples of 8 so every block is full (no edge replication in the
    closed form)."""
    return 8 * (1 + doc_id % 3), 8 * (1 + (doc_id * 5) % 3)


def synth_block_value(bx: int, by: int, doc_id: int) -> int:
    return (17 * bx + 31 * by + doc_id) % 256


def synth_jpeg_bytes(doc_id: int) -> bytes:
    """Deterministic real baseline JPEG: block-constant grayscale whose
    decoded mean is closed-form (see module docstring), so a SQL oracle
    recomputes it without a decoder."""
    w, h = synth_jpeg_dims(doc_id)
    return encode_jpeg_gray(
        w, h, lambda x, y: synth_block_value(x // 8, y // 8, doc_id)
    )


def synth_jpeg_progressive_bytes(doc_id: int) -> bytes:
    """Deterministic real PROGRESSIVE JPEG (SOF2: DC successive
    approximation + two spectral AC bands + refinements): same
    block-constant pixels as :func:`synth_jpeg_bytes`, so the fully
    refined decode reconstructs the identical closed form — one oracle,
    two containers, and the Annex-G scan machinery must agree with the
    baseline path through a completely different bitstream."""
    w, h = synth_jpeg_dims(doc_id)
    return encode_jpeg_gray_progressive(
        w, h, lambda x, y: synth_block_value(x // 8, y // 8, doc_id)
    )


def reconstructed_flat_value(v: int) -> int:
    """Closed-form round trip of a constant block value under the
    standard luminance table (Q00 = 16): what the decoder must produce."""
    dc = _round_half_away((v - 128) / 2.0)
    return max(0, min(255, 2 * dc + 128))


# ---------------------------------------------------------------------------
# lossless JPEG (SOF3, T.81 Annex H — huffman predictive)
# ---------------------------------------------------------------------------

#: flat canonical DHT for the 17 lossless diff categories (0..16): all
#: codes length 5 (17 < 2^5, legal canonical table)
_LL_DC_BITS = [0, 0, 0, 0, 17, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_LL_DC_VALS = list(range(17))


def _ll_predict(plane, x, y, sel, p, pt):
    """T.81 H.1.2 sample prediction: spec-fixed edge rules (first
    sample 2^(P-Pt-1), first row uses a, first column uses b), else the
    selected predictor 1..7 over a=left, b=above, c=above-left."""
    if y == 0 and x == 0:
        return 1 << (p - pt - 1)
    if y == 0:
        return int(plane[0, x - 1])
    if x == 0:
        return int(plane[y - 1, 0])
    a = int(plane[y, x - 1])
    b = int(plane[y - 1, x])
    c = int(plane[y - 1, x - 1])
    if sel == 1:
        return a
    if sel == 2:
        return b
    if sel == 3:
        return c
    if sel == 4:
        return a + b - c
    if sel == 5:
        return a + ((b - c) >> 1)
    if sel == 6:
        return b + ((a - c) >> 1)
    if sel == 7:
        return (a + b) >> 1
    raise ValueError(f"bad lossless predictor {sel}")


def _decode_scan_lossless(
    data, pos, frame, scan, sel, pt, restart_interval
) -> tuple[int, int, float]:
    """SOF3 scan decode (single component, 2..16-bit precision —
    12/14/16-bit is the DNG/raw tier): huffman diff categories +
    extend bits, prediction per H.1.2, arithmetic modulo 65536,
    output samples left-shifted by the point transform; the mean
    scales to the 0..255 range by exactly 255/(2^P−1)."""
    import numpy as np

    p = frame.get("prec", 8)
    w, h = frame["w"], frame["h"]
    if not w or not h:
        raise ValueError("zero-dimension JPEG")
    if len(scan) != 1:
        raise ValueError("only single-component lossless supported")
    comp, td, _ta, tab = scan[0]
    plane = np.zeros((h, w), dtype=np.int64)
    br = _BitReader(data, pos)
    mcu = 0
    next_rst = 0
    restart_row = 0  # prediction restarts treat the next row as first
    for y in range(h):
        for x in range(w):
            if restart_interval and mcu and mcu % restart_interval == 0:
                got = br.align_restart()
                if got != next_rst:
                    raise ValueError("restart marker out of sequence")
                next_rst = (next_rst + 1) & 7
                if x != 0:
                    raise ValueError(
                        "mid-row lossless restart unsupported"
                    )
                restart_row = y
            cat = tab.decode(br)
            if cat > 16:
                raise ValueError("bad lossless category")
            diff = 32768 if cat == 16 else br.receive_extend(cat)
            view = plane[restart_row:, :]
            pred = _ll_predict(view, x, y - restart_row, sel, p, pt)
            plane[y, x] = (pred + diff) & 0xFFFF
            mcu += 1
    vals = plane << pt
    if int(vals.max()) > (1 << p) - 1:
        raise ValueError("lossless sample out of range")
    total = int(vals.sum(dtype=np.int64))
    return int(w), int(h), total * 255 / float(((1 << p) - 1) * w * h)


def encode_jpeg_gray_lossless(
    width: int, height: int, pix_fn, predictor: int = 4, pt: int = 0,
    restart_interval: int = 0, precision: int = 8,
) -> bytes:
    """SOF3 lossless JFIF fixture, one grayscale component at 2..16-bit
    ``precision``: prediction per H.1.2 with the chosen ``predictor``
    (1..7) and point transform ``pt``, diffs coded with a flat
    17-category DHT. ``restart_interval`` is in samples and must
    divide the row length (prediction restarts at a row boundary).
    The decode is EXACT (pixels >> pt << pt), so oracles need no
    codec arithmetic."""
    import numpy as np

    if not 1 <= predictor <= 7:
        raise ValueError("predictor must be 1..7")
    if not 2 <= precision <= 16:
        raise ValueError("precision must be 2..16")
    if restart_interval and restart_interval % width:
        raise ValueError("restart interval must be whole rows")
    mask = (1 << precision) - 1
    img = np.zeros((height, width), dtype=np.int64)
    for y in range(height):
        for x in range(width):
            img[y, x] = (int(pix_fn(x, y)) & mask) >> pt
    codes = _build_huff_codes(_LL_DC_BITS, _LL_DC_VALS)

    out = bytearray(b"\xFF\xD8")
    out += (
        b"\xFF\xE0" + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    )
    out += b"\xFF\xC3" + struct.pack(
        ">HBHHB", 11, precision, height, width, 1
    )
    out += bytes([1, 0x11, 0])
    out += b"\xFF\xC4" + struct.pack(">H", 3 + 16 + len(_LL_DC_VALS))
    out += bytes([0x00]) + bytes(_LL_DC_BITS) + bytes(_LL_DC_VALS)
    if restart_interval:
        out += b"\xFF\xDD" + struct.pack(">HH", 4, restart_interval)
    out += b"\xFF\xDA" + struct.pack(">HB", 8, 1)
    out += bytes([1, 0x00])
    out += bytes([predictor, 0, pt])  # Ss=selector, Se=0, Ah=0, Al=Pt

    bw = _BitWriter()
    mcu = 0
    rst = 0
    restart_row = 0
    for y in range(height):
        for x in range(width):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bw.flush()
                out += bw.buf
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                bw = _BitWriter()
                restart_row = y
            pred = _ll_predict(
                img[restart_row:, :], x, y - restart_row, predictor,
                precision, pt,
            )
            diff = (int(img[y, x]) - pred) & 0xFFFF
            if diff >= 32768:
                diff -= 65536  # signed representative for category coding
            if diff == -32768:  # category 16: no appended bits (H.1.2.3)
                code, ln = codes[16]
                bw.put(code, ln)
            else:
                cat, bits = _magnitude(diff)
                code, ln = codes[cat]
                bw.put(code, ln)
                if cat:
                    bw.put(bits, cat)
            mcu += 1
    bw.flush()
    out += bw.buf
    out += b"\xFF\xD9"
    return bytes(out)


def synth_jpeg_lossless_bytes(doc_id: int) -> bytes:
    """Deterministic real SOF3 (lossless) JPEG: decode reproduces the
    pixel function EXACTLY, so the oracle is the plain pixel mean —
    no codec arithmetic at all. Predictor varies with doc_id to cover
    all seven."""
    w, h = synth_jpeg_dims(doc_id)
    return encode_jpeg_gray_lossless(
        w, h,
        lambda x, y: (29 * x + 43 * y + doc_id) % 256,
        predictor=1 + doc_id % 7,
    )


# ---------------------------------------------------------------------------
# 12-bit extended sequential (SOF1, huffman) — fixture encoder
# ---------------------------------------------------------------------------

#: flat DHTs for 12-bit frames: DC categories 0..15 (length 5), AC
#: run/size symbols with sizes 1..14 + ZRL + EOB (length 9 — 226
#: codes, canonically legal)
_EXT_DC_BITS = [0, 0, 0, 0, 16, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_EXT_DC_VALS = list(range(16))
_EXT_AC_VALS = sorted(
    {(r << 4) | s for r in range(16) for s in range(1, 15)}
    | {0xF0, 0x00}
)
_EXT_AC_BITS = [0] * 8 + [len(_EXT_AC_VALS)] + [0] * 7


def encode_jpeg_gray12(width: int, height: int, pix_fn) -> bytes:
    """EXTENDED-sequential JFIF fixture (SOF1, 12-bit precision, one
    grayscale component, huffman): level shift 2048, Annex-K
    luminance quant table, flat 12-bit-range DHTs.
    ``pix_fn(x, y) -> 0..4095``."""
    dc_codes = _build_huff_codes(_EXT_DC_BITS, _EXT_DC_VALS)
    ac_codes = _build_huff_codes(_EXT_AC_BITS, _EXT_AC_VALS)
    img = np.fromfunction(
        np.vectorize(lambda y, x: pix_fn(int(x), int(y))), (height, width)
    ).astype(np.float64)

    out = bytearray(b"\xFF\xD8")
    out += (
        b"\xFF\xE0" + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    )
    zzq = bytes(int(STD_LUMA_QT[r, c]) for (r, c) in ZIGZAG)
    out += b"\xFF\xDB" + struct.pack(">H", 67) + b"\x00" + zzq
    out += b"\xFF\xC1" + struct.pack(">HBHHB", 11, 12, height, width, 1)
    out += bytes([1, 0x11, 0])
    out += b"\xFF\xC4" + struct.pack(">H", 3 + 16 + len(_EXT_DC_VALS))
    out += bytes([0x00]) + bytes(_EXT_DC_BITS) + bytes(_EXT_DC_VALS)
    out += b"\xFF\xC4" + struct.pack(">H", 3 + 16 + len(_EXT_AC_VALS))
    out += bytes([0x10]) + bytes(_EXT_AC_BITS) + bytes(_EXT_AC_VALS)
    out += b"\xFF\xDA" + struct.pack(">HB", 8, 1)
    out += bytes([1, 0x00])
    out += b"\x00\x3F\x00"

    bw = _BitWriter()
    pred = 0
    for by in range((height + 7) // 8):
        for bx in range((width + 7) // 8):
            q = _quantize_block(
                _block_at(img, bx, by), STD_LUMA_QT, level=2048.0
            )
            diff = int(q[0, 0]) - pred
            pred = int(q[0, 0])
            cat, bits = _magnitude(diff)
            code, ln = dc_codes[cat]
            bw.put(code, ln)
            if cat:
                bw.put(bits, cat)
            zz = [int(q[r, c]) for (r, c) in ZIGZAG[1:]]
            last_nz = -1
            for i, v in enumerate(zz):
                if v:
                    last_nz = i
            run = 0
            for i, v in enumerate(zz):
                if i > last_nz:
                    break
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = ac_codes[0xF0]
                    bw.put(code, ln)
                    run -= 16
                cat, bits = _magnitude(v)
                code, ln = ac_codes[(run << 4) | cat]
                bw.put(code, ln)
                bw.put(bits, cat)
                run = 0
            if last_nz < 62:
                code, ln = ac_codes[0x00]
                bw.put(code, ln)
    bw.flush()
    out += bw.buf
    out += b"\xFF\xD9"
    return bytes(out)


def reconstructed_flat_value12(v: int) -> int:
    """Closed-form round trip of a constant 12-bit block value under
    the standard luminance table (Q00 = 16)."""
    dc = _round_half_away((v - 2048) / 2.0)
    return max(0, min(4095, 2 * dc + 2048))


def synth_jpeg_12bit_bytes(doc_id: int) -> bytes:
    """Deterministic real 12-bit SOF1 JPEG: block-constant values in
    the full 12-bit range, closed-form decode (reconstructed_flat_
    value12, mean scaled by 255/4095)."""
    w, h = synth_jpeg_dims(doc_id)
    return encode_jpeg_gray12(
        w, h,
        lambda x, y: (661 * (x // 8) + 997 * (y // 8) + 37 * doc_id) % 4096,
    )
