"""Vendored WebP-lossless (VP8L) codec (decode + fixture encoder) —
clean-room from the public bitstream specification (RFC 9649, "WebP
Image Format", §3 lossless bitstream; originally the Google "WebP
Lossless Bitstream Specification"). No libwebp code consulted;
stdlib-only.

Profile (the honest-``ValueError``-outside-it discipline of
functions/jpeg.py and functions/gif.py):

- RIFF/WEBP container with a VP8L chunk; lossy ``VP8 `` chunks route
  to the vendored key-frame decoder (functions/vp8.py, round 5);
  extended ``VP8X`` containers decode their still frame (metadata
  chunks skipped), and ANIMATED WebPs decode their FIRST frame's
  still payload (ANMF sub-chunk walk) — the honest single-image
  feature summary;
- ALL FOUR transforms decode for real (round 5 closed the set):
  SUBTRACT-GREEN (zero-data inverse, RFC 9649 §3.5.3), COLOR-INDEXING
  (§3.5.5: delta-coded palette sub-image + sub-pixel bundling, 8/4/2
  per byte for ≤2/≤4/≤16 colors), the PREDICTOR transform (§3.5.1:
  per-tile mode sub-image, all 14 spatial predictors incl. Select and
  the ClampAddSubtract pair, the black/L/T edge rules and the
  rightmost-column TR wrap), and the CROSS-COLOR transform (§3.5.2:
  per-tile signed green→red / green→blue / red→blue multipliers,
  ``(t*c) >> 5`` fixed-point deltas). The ENTROPY IMAGE (meta prefix
  codes, §3.7.2.1) decodes too: per-tile prefix-code groups over a
  shared color cache. Conformance: every combination libwebp 1.2.4's
  lossless encoder emits decodes byte-exactly in
  tests/test_libwebp_conformance.py (the system library is the test
  oracle);
- everything else is REAL: LSB-first bit reader, simple and
  normal-form prefix codes (code-length codes, repeat codes 16/17/18,
  the max_symbol short-circuit), canonical prefix decode, optional
  color cache (0x1e35a7bd multiplicative hash), literals, and LZ77
  backward references with the full length/distance prefix coding and
  the 120-entry 2D distance map.

Feature contract matches the other vendored codecs:
``(width, height, mean over the R,G,B channel bytes)`` (alpha excluded
— it is storage, not luminance) with one exact integer sum and ONE
double division, so the SQL oracle over the synth fixtures recomputes
the decode arithmetically and the decoder must agree with the encoder
through the actual entropy-coded bitstream.

Prefix-code bit order: canonical codes (DEFLATE convention — codes
assigned in order of (length, symbol)) are written/read most
significant code bit first through the LSB-first byte stream, matching
the spec's tree-walk reading one bit at a time.
"""

from __future__ import annotations

import struct

__all__ = [
    "decode_webp",
    "encode_vp8l",
    "synth_webp_bytes",
    "synth_webp_dims",
]

#: kCodeLengthCodeOrder — the order code-length-code lengths appear in
#: the stream (RFC 9649 §3.7.1.2).
#: kCodeLengthCodeOrder (RFC 9649 §3.7.1.2 / libwebp vp8l_dec.c):
#: repeat symbol 16 sits at index 8, BETWEEN 5 and 6 — a round-5
#: libwebp-conformance find (the old in-repo order put 16 last; encoder
#: and decoder shared it, so round trips passed while every emitted
#: stream was unreadable by external decoders)
_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

#: 2D distance map for LZ77 distance codes 1..120 (RFC 9649 §3.6.2.3):
#: (dx, dy) neighborhood offsets; linear distance = dy*width + dx,
#: clamped to ≥1. Codes >120 are plain distances minus 120.
_DIST_MAP = (
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
)


# ---------------------------------------------------------------------------
# bit I/O (LSB-first stream; prefix codes MSB-of-code-first)
# ---------------------------------------------------------------------------


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.bitbuf = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        while self.nbits < n:
            if self.pos >= len(self.data):
                raise ValueError("truncated VP8L stream")
            self.bitbuf |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        v = self.bitbuf & ((1 << n) - 1)
        self.bitbuf >>= n
        self.nbits -= n
        return v


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.bitbuf = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        if n == 0:
            return
        self.bitbuf |= (value & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.out.append(self.bitbuf & 0xFF)
            self.bitbuf >>= 8
            self.nbits -= 8

    def bytes(self) -> bytes:
        out = bytearray(self.out)
        if self.nbits:
            out.append(self.bitbuf & 0xFF)
        return bytes(out)


# ---------------------------------------------------------------------------
# canonical prefix codes (shared by encoder and decoder)
# ---------------------------------------------------------------------------


def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length), DEFLATE-style canonical assignment:
    codes increase with (length, symbol)."""
    max_len = max(lengths, default=0)
    bl_count = [0] * (max_len + 1)
    for ln in lengths:
        if ln:
            bl_count[ln] += 1
    code = 0
    next_code = [0] * (max_len + 1)
    for ln in range(1, max_len + 1):
        code = (code + bl_count[ln - 1]) << 1
        next_code[ln] = code
    out: dict[int, tuple[int, int]] = {}
    for sym, ln in enumerate(lengths):
        if ln:
            out[sym] = (next_code[ln], ln)
            next_code[ln] += 1
    return out


class _PrefixCode:
    """Decode-side prefix code: either a 0-bit trivial code (single
    symbol) or a canonical tree walked one bit at a time."""

    def __init__(self, lengths: list[int]) -> None:
        nz = [s for s, ln in enumerate(lengths) if ln]
        if not nz:
            raise ValueError("empty prefix code")
        if len(nz) == 1:
            self.single: int | None = nz[0]
            self.table: dict[tuple[int, int], int] = {}
            return
        self.single = None
        kraft = sum(2.0 ** -ln for ln in lengths if ln)
        if abs(kraft - 1.0) > 1e-12:
            raise ValueError(f"incomplete prefix code (Kraft {kraft})")
        self.table = {
            (ln, code): sym
            for sym, (code, ln) in _canonical_codes(lengths).items()
        }
        self.max_len = max(ln for ln in lengths if ln)

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for ln in range(1, self.max_len + 1):
            code = (code << 1) | br.read(1)
            sym = self.table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid prefix code in VP8L stream")


class _TwoSymbolCode(_PrefixCode):
    """Simple-form 2-symbol code: stream order assigns code 0 to the
    first listed symbol, 1 to the second (not canonical symbol order)."""

    def __init__(self, sym0: int, sym1: int) -> None:
        self.single = None
        self.table = {(1, 0): sym0, (1, 1): sym1}
        self.max_len = 1


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _PrefixCode:
    if br.read(1):  # simple code
        num_symbols = br.read(1) + 1
        first_8bit = br.read(1)
        sym0 = br.read(8 if first_8bit else 1)
        if sym0 >= alphabet_size:
            raise ValueError("simple-code symbol out of range")
        if num_symbols == 2:
            sym1 = br.read(8)
            if sym1 >= alphabet_size:
                raise ValueError("simple-code symbol out of range")
            return _TwoSymbolCode(sym0, sym1)
        lengths = [0] * alphabet_size
        lengths[sym0] = 1
        return _PrefixCode(lengths)
    num_code_lengths = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(num_code_lengths):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl_code = _PrefixCode(cl_lengths)
    if br.read(1):  # use max_symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev_len = 8
    symbol = 0
    while symbol < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        code_len = cl_code.read(br)
        if code_len < 16:
            lengths[symbol] = code_len
            symbol += 1
            if code_len:
                prev_len = code_len
        else:
            if code_len == 16:
                repeat, fill = 3 + br.read(2), prev_len
            elif code_len == 17:
                repeat, fill = 3 + br.read(3), 0
            else:
                repeat, fill = 11 + br.read(7), 0
            if symbol + repeat > alphabet_size:
                raise ValueError("prefix-code repeat overflows alphabet")
            for _ in range(repeat):
                lengths[symbol] = fill
                symbol += 1
    return _PrefixCode(lengths)


def _prefix_decode_value(br: _BitReader, sym: int) -> int:
    """LZ77 length/distance prefix coding (RFC 9649 §3.6.2.2)."""
    if sym < 4:
        return sym + 1
    extra = (sym - 2) >> 1
    offset = (2 + (sym & 1)) << extra
    return offset + br.read(extra) + 1


def _prefix_encode_value(value: int) -> tuple[int, int, int]:
    """Inverse of _prefix_decode_value: value → (sym, extra_bits_value,
    extra_bits_count)."""
    if value <= 4:
        return value - 1, 0, 0
    sym = 4
    while True:
        extra = (sym - 2) >> 1
        offset = (2 + (sym & 1)) << extra
        if offset + 1 <= value <= offset + (1 << extra):
            return sym, value - offset - 1, extra
        sym += 1


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def _cache_index(argb: int, cache_bits: int) -> int:
    return ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - cache_bits)


def _pack_width_bits(palette_size: int) -> int:
    """Sub-pixel packing for small palettes (RFC 9649 §3.5.5): indices
    bundle into the green channel — 8/4/2 per byte for ≤2/≤4/≤16
    colors."""
    if palette_size <= 2:
        return 3
    if palette_size <= 4:
        return 2
    if palette_size <= 16:
        return 1
    return 0


def _decode_entropy_coded_image(
    br: _BitReader, width: int, height: int, *, top_level: bool = True
) -> list[tuple[int, int, int, int]]:
    """One entropy-coded ARGB image (the shared core of the main image
    and transform sub-images, which carry no transform list of their
    own): optional color cache, 5 prefix codes, literals + LZ77 +
    cache references. Returns row-major (a, r, g, b) pixels.

    Only the MAIN spatially-coded image carries the meta-prefix
    ("entropy image") bit — per the VP8L grammar (RFC 9649 §3.7.2.1 /
    libwebp ReadHuffmanCodes allow_recursion=is_level0), transform
    sub-images read color-cache-info and prefix codes only, so callers
    pass ``top_level=False`` for them and the bit is never consumed."""
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError(f"bad color-cache size {cache_bits}")
    # entropy image (meta prefix codes, §3.7.2.1): only the main image
    # carries it; the meta index of a tile is (red<<8)|green of the
    # entropy sub-image pixel, selecting one of several prefix-code
    # GROUPS (the color cache is shared across groups)
    meta = None
    ebits = ew = 0
    n_groups = 1
    if top_level and br.read(1):
        ebits = br.read(3) + 2
        ew = (width + (1 << ebits) - 1) >> ebits
        eh = (height + (1 << ebits) - 1) >> ebits
        epx = _decode_entropy_coded_image(br, ew, eh, top_level=False)
        meta = [(px[1] << 8) | px[2] for px in epx]  # (a,R,G,b)
        n_groups = max(meta) + 1
    cache_size = (1 << cache_bits) if cache_bits else 0
    groups = [
        (
            _read_prefix_code(br, 256 + 24 + cache_size),  # green
            _read_prefix_code(br, 256),  # red
            _read_prefix_code(br, 256),  # blue
            _read_prefix_code(br, 256),  # alpha
            _read_prefix_code(br, 40),  # distance
        )
        for _ in range(n_groups)
    ]

    n = width * height
    pixels: list[tuple[int, int, int, int]] = []  # (a, r, g, b)
    cache = [0] * cache_size

    def push(px: tuple[int, int, int, int]) -> None:
        pixels.append(px)
        if cache_size:
            a, r, g, b = px
            argb = (a << 24) | (r << 16) | (g << 8) | b
            cache[_cache_index(argb, cache_bits)] = argb

    while len(pixels) < n:
        if meta is None:
            green_code, red_code, blue_code, alpha_code, dist_code = groups[0]
        else:
            pos = len(pixels)
            gi = meta[(pos // width >> ebits) * ew + ((pos % width) >> ebits)]
            green_code, red_code, blue_code, alpha_code, dist_code = groups[gi]
        s = green_code.read(br)
        if s < 256:
            g = s
            r = red_code.read(br)
            b = blue_code.read(br)
            a = alpha_code.read(br)
            push((a, r, g, b))
        elif s < 256 + 24:
            length = _prefix_decode_value(br, s - 256)
            dsym = dist_code.read(br)
            dcode = _prefix_decode_value(br, dsym)
            if dcode > 120:
                dist = dcode - 120
            else:
                dx, dy = _DIST_MAP[dcode - 1]
                dist = max(dy * width + dx, 1)
            if dist > len(pixels):
                raise ValueError("LZ77 distance before image start")
            if len(pixels) + length > n:
                raise ValueError("LZ77 copy past image end")
            base = len(pixels) - dist
            for i in range(length):
                push(pixels[base + i])
        else:
            idx = s - 256 - 24
            argb = cache[idx]
            push(
                (
                    (argb >> 24) & 0xFF,
                    (argb >> 16) & 0xFF,
                    (argb >> 8) & 0xFF,
                    argb & 0xFF,
                )
            )
    return pixels


def _avg2(a: int, b: int) -> int:
    return (a + b) >> 1


def _clip255(v: int) -> int:
    return 0 if v < 0 else (255 if v > 255 else v)


def _select(L, T, TL):
    """Predictor 11 (RFC 9649 §3.5.1 Select, as amended): Manhattan
    distance of L and T to the L+T-TL estimate; strict < prefers L."""
    p = [L[i] + T[i] - TL[i] for i in range(4)]
    pl = sum(abs(p[i] - L[i]) for i in range(4))
    pt = sum(abs(p[i] - T[i]) for i in range(4))
    return L if pl < pt else T


def _cas_full(L, T, TL):
    return tuple(_clip255(L[i] + T[i] - TL[i]) for i in range(4))


def _cas_half(L, T, TL):
    # Clip255(a + (a - b) / 2) with C TRUNCATING division (toward zero)
    out = []
    for i in range(4):
        a = _avg2(L[i], T[i])
        d = a - TL[i]
        half = d // 2 if d >= 0 else -((-d) // 2)
        out.append(_clip255(a + half))
    return tuple(out)


_PREDICTORS = [
    lambda L, T, TL, TR: (255, 0, 0, 0),  # 0: black (0xff000000)
    lambda L, T, TL, TR: L,  # 1
    lambda L, T, TL, TR: T,  # 2
    lambda L, T, TL, TR: TR,  # 3
    lambda L, T, TL, TR: TL,  # 4
    lambda L, T, TL, TR: tuple(
        _avg2(_avg2(L[i], TR[i]), T[i]) for i in range(4)
    ),  # 5
    lambda L, T, TL, TR: tuple(_avg2(L[i], TL[i]) for i in range(4)),  # 6
    lambda L, T, TL, TR: tuple(_avg2(L[i], T[i]) for i in range(4)),  # 7
    lambda L, T, TL, TR: tuple(_avg2(TL[i], T[i]) for i in range(4)),  # 8
    lambda L, T, TL, TR: tuple(_avg2(T[i], TR[i]) for i in range(4)),  # 9
    lambda L, T, TL, TR: tuple(
        _avg2(_avg2(L[i], TL[i]), _avg2(T[i], TR[i])) for i in range(4)
    ),  # 10
    lambda L, T, TL, TR: _select(L, T, TL),  # 11
    lambda L, T, TL, TR: _cas_full(L, T, TL),  # 12
    lambda L, T, TL, TR: _cas_half(L, T, TL),  # 13
]


def _inverse_predictor(pixels, width, height, size_bits, sub, sub_w):
    """Inverse predictor transform (§3.5.1): scan-order reconstruction;
    residual + predictor mod 256 per channel. Edge rules: (0,0) uses
    BLACK, the rest of row 0 uses L, column 0 uses T; the TR pixel of
    the rightmost column wraps to the FIRST pixel of the current row
    (the linearized (x+1, y-1) address)."""
    out: list[tuple[int, int, int, int]] = []
    for i, res in enumerate(pixels):
        y, x = divmod(i, width)
        if i == 0:
            pred = (255, 0, 0, 0)
        elif y == 0:
            pred = out[i - 1]
        elif x == 0:
            pred = out[i - width]
        else:
            mode = sub[(y >> size_bits) * sub_w + (x >> size_bits)][2]
            if mode >= len(_PREDICTORS):
                raise ValueError(f"bad predictor mode {mode}")
            L = out[i - 1]
            T = out[i - width]
            TL = out[i - width - 1]
            TR = out[i - width + 1] if x + 1 < width else out[y * width]
            pred = _PREDICTORS[mode](L, T, TL, TR)
        out.append(tuple((res[c] + pred[c]) & 0xFF for c in range(4)))
    return out


def _s8(v: int) -> int:
    return v - 256 if v >= 128 else v


def _ct_delta(t: int, c: int) -> int:
    # (int8)t * (int8)c >> 5 — arithmetic shift (floor), §3.5.2
    return (_s8(t & 0xFF) * _s8(c & 0xFF)) >> 5


def _inverse_color_transform(pixels, width, height, size_bits, sub, sub_w):
    """Inverse cross-color transform (§3.5.2): per-tile multipliers
    green_to_red (blue byte), green_to_blue (green byte), red_to_blue
    (red byte); red recovers first, blue uses the RECOVERED red."""
    out = []
    for i, (a, r, g, b) in enumerate(pixels):
        y, x = divmod(i, width)
        _ta, m_r2b, m_g2b, m_g2r = sub[
            (y >> size_bits) * sub_w + (x >> size_bits)
        ]
        new_r = (r + _ct_delta(m_g2r, g)) & 0xFF
        new_b = (b + _ct_delta(m_g2b, g) + _ct_delta(m_r2b, new_r)) & 0xFF
        out.append((a, new_r, g, new_b))
    return out


def decode_vp8l_pixels(payload: bytes):
    """Full-fidelity decode: (width, height, [(a, r, g, b)] row-major).
    The conformance suite compares this pixel-exactly against the
    system libwebp's RGBA output."""
    if not payload or payload[0] != 0x2F:
        raise ValueError("bad VP8L signature")
    br = _BitReader(payload[1:])
    width = br.read(14) + 1
    height = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise ValueError("unknown VP8L version")
    transforms: list[tuple] = []  # stream order (encode-time order)
    eff_width = width  # color indexing may bundle sub-pixels
    while br.read(1):  # transform list
        ttype = br.read(2)
        if any(t[0] == ttype for t in transforms):
            raise ValueError("duplicate VP8L transform")
        if ttype == 2:  # subtract-green: no data, r/b stored minus g
            transforms.append((2,))
            continue
        if ttype == 3:  # color indexing: palette + optional packing
            n_colors = br.read(8) + 1
            # the palette rides as a 1-row entropy-coded sub-image,
            # DELTA-coded per channel (each entry adds the previous)
            raw = _decode_entropy_coded_image(br, n_colors, 1, top_level=False)
            palette = []
            prev = (0, 0, 0, 0)
            for px in raw:
                prev = tuple((prev[i] + px[i]) & 0xFF for i in range(4))
                palette.append(prev)
            wbits = _pack_width_bits(n_colors)
            transforms.append((3, palette, wbits))
            if wbits:
                eff_width = (width + (1 << wbits) - 1) >> wbits
            continue
        # ttype 0 = predictor, 1 = cross-color: per-tile sub-image of
        # modes/multipliers; the width the transform operates at is the
        # CURRENT eff_width (transforms after color-indexing see the
        # packed image), recorded for the inverse
        size_bits = br.read(3) + 2
        sub_w = (eff_width + (1 << size_bits) - 1) >> size_bits
        sub_h = (height + (1 << size_bits) - 1) >> size_bits
        sub = _decode_entropy_coded_image(br, sub_w, sub_h, top_level=False)
        transforms.append((ttype, size_bits, sub, sub_w, eff_width))
    pixels = _decode_entropy_coded_image(br, eff_width, height)

    # inverse transforms in REVERSE stream order
    for t in reversed(transforms):
        if t[0] == 2:
            # RFC 9649 §3.5.3: green was subtracted from red and blue
            # before entropy coding; add it back mod 256
            pixels = [
                (a, (r + g) & 0xFF, g, (b + g) & 0xFF)
                for a, r, g, b in pixels
            ]
        elif t[0] == 0:
            _tt, size_bits, sub, sub_w, t_width = t
            pixels = _inverse_predictor(
                pixels, t_width, height, size_bits, sub, sub_w
            )
        elif t[0] == 1:
            _tt, size_bits, sub, sub_w, t_width = t
            pixels = _inverse_color_transform(
                pixels, t_width, height, size_bits, sub, sub_w
            )
        else:
            _ttype, palette, wbits = t
            out: list[tuple[int, int, int, int]] = []
            if wbits:
                per = 1 << wbits
                ibits = 8 >> wbits
                mask = (1 << ibits) - 1
                for y in range(height):
                    row = pixels[y * eff_width : (y + 1) * eff_width]
                    for x in range(width):
                        g = row[x >> wbits][2]
                        idx = (g >> ((x % per) * ibits)) & mask
                        out.append(
                            palette[idx] if idx < len(palette)
                            else (0, 0, 0, 0)  # OOB index: spec'd zero
                        )
            else:
                for _a, _r, g, _b in pixels:
                    out.append(
                        palette[g] if g < len(palette) else (0, 0, 0, 0)
                    )
            pixels = out
            eff_width = width  # fully expanded now
    return width, height, pixels


def decode_vp8l(payload: bytes) -> tuple[int, int, float]:
    """Feature-contract decode: (width, height, mean over R,G,B bytes)
    — one exact integer sum, ONE double division (the SQL-oracle
    contract shared by the other vendored codecs)."""
    width, height, pixels = decode_vp8l_pixels(payload)
    total = sum(r + g + b for _a, r, g, b in pixels)
    return width, height, total / (3.0 * width * height)


def decode_webp(data: bytes) -> tuple[int, int, float]:
    """RIFF walk → VP8L (lossless, :func:`decode_vp8l`) or ``VP8 ``
    (lossy key frame, functions/vp8.py) chunk. ``VP8X`` extended
    containers decode their STILL frame (the inner VP8/VP8L chunk;
    the ALPH alpha plane is transparency metadata our RGB/luma feature
    stat excludes); animations (ANIM/ANMF) raise → fake tier."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP")
    pos = 12
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise ValueError("truncated WebP chunk")
        if tag == b"VP8L":
            return decode_vp8l(body)
        if tag == b"VP8 ":
            # lossy key frame — vendored VP8 decoder (functions/vp8.py);
            # its feature stat is the codec-native LUMA mean
            from .vp8 import decode_vp8

            return decode_vp8(body)
        if tag == b"ANMF":
            # animated WebP: decode the FIRST frame's still payload —
            # the ANMF body is a 16-byte frame header (x/y/w/h 24-bit,
            # duration, flags) followed by the frame's own chunk list
            # (ALPH + VP8/VP8L); the feature stat is the first frame's
            # (width, height, mean), the honest single-image summary
            fpos = 16
            while fpos + 8 <= len(body):
                ftag = body[fpos : fpos + 4]
                (fsize,) = struct.unpack_from("<I", body, fpos + 4)
                fbody = body[fpos + 8 : fpos + 8 + fsize]
                if len(fbody) != fsize:
                    raise ValueError("truncated ANMF sub-chunk")
                if ftag == b"VP8L":
                    return decode_vp8l(fbody)
                if ftag == b"VP8 ":
                    from .vp8 import decode_vp8

                    return decode_vp8(fbody)
                fpos += 8 + fsize + (fsize & 1)
            raise ValueError("ANMF frame with no still payload")
        # VP8X / ALPH / ICCP / EXIF / XMP: metadata chunks — keep
        # walking to the still frame's VP8/VP8L chunk
        pos += 8 + size + (size & 1)
    raise ValueError("WebP with no VP8L chunk")


# ---------------------------------------------------------------------------
# fixture encoder
# ---------------------------------------------------------------------------

#: green/literal code lengths: 232 symbols at 8 bits + 48 at 9 bits —
#: Kraft-complete over the 280-symbol (no color cache) alphabet, and the
#: length symbols 256..279 all land in the 9-bit band.
_GREEN_LENGTHS = [8] * 232 + [9] * 48
_GREEN_CODES = _canonical_codes(_GREEN_LENGTHS)
_BYTE_LENGTHS = [8] * 256
_BYTE_CODES = _canonical_codes(_BYTE_LENGTHS)


def _write_green_code(bw: _BitWriter) -> None:
    """Normal-form prefix code for the 280-symbol green alphabet: CL
    code over symbols {8→'0', 9→'1'}, lengths written literally."""
    bw.write(0, 1)  # not simple
    bw.write(13 - 4, 4)  # num_code_lengths = 13 (through symbol 9,
    #                      which sits at _CL_ORDER index 12)
    for sym in _CL_ORDER[:13]:
        bw.write(1 if sym in (8, 9) else 0, 3)
    bw.write(0, 1)  # no max_symbol short-circuit
    for ln in _GREEN_LENGTHS:
        bw.write(0 if ln == 8 else 1, 1)


def _write_byte_code(bw: _BitWriter) -> None:
    """Normal-form all-8-bit code for a 256-symbol alphabet: CL code
    over {8→'0', 16→'1'}, one literal '8' then 85 repeat-16s (3 copies
    each, extra bits 0) = 256 lengths."""
    bw.write(0, 1)  # not simple
    bw.write(19 - 4, 4)  # num_code_lengths = 19 (through symbol 16)
    for sym in _CL_ORDER:
        bw.write(1 if sym in (8, 16) else 0, 3)
    bw.write(0, 1)  # no max_symbol short-circuit
    bw.write(0, 1)  # literal length 8 (CL code '0')
    for _ in range(85):
        bw.write(1, 1)  # repeat-16 (CL code '1')
        bw.write(0, 2)  # 3 copies of previous length
    # 1 + 85*3 = 256 symbols


def _write_single_symbol_code(bw: _BitWriter, sym: int) -> None:
    bw.write(1, 1)  # simple
    bw.write(0, 1)  # one symbol
    if sym < 2:
        bw.write(0, 1)  # first symbol in 1 bit
        bw.write(sym, 1)
    else:
        bw.write(1, 1)  # first symbol in 8 bits
        bw.write(sym, 8)


def _emit(bw: _BitWriter, codes: dict[int, tuple[int, int]], sym: int) -> None:
    code, ln = codes[sym]
    for i in range(ln - 1, -1, -1):  # MSB of the code first
        bw.write((code >> i) & 1, 1)


def encode_vp8l(
    width: int, height: int, pixel, *, subtract_green: bool = False
) -> bytes:
    """Build a real VP8L WebP: ``pixel(x, y) -> (r, g, b)`` (alpha
    fixed 255). EVEN rows are entropy-coded literals; every ODD row must
    equal the row above it and is emitted as one LZ77 backward reference
    (length=width, distance code 1 = (0,1) — the row above), so the
    decoder's reference-copy path is exercised by construction.
    ``subtract_green`` emits the transform real encoders default to
    (r/b stored minus g; the decoder must invert it)."""
    if not (1 <= width <= 1 << 14 and 1 <= height <= 1 << 14):
        raise ValueError("bad dimensions")
    bw = _BitWriter()
    bw.write(width - 1, 14)
    bw.write(height - 1, 14)
    bw.write(0, 1)  # no alpha
    bw.write(0, 3)  # version 0
    if subtract_green:
        bw.write(1, 1)  # a transform follows
        bw.write(2, 2)  # type 2 = subtract-green (no data)
    bw.write(0, 1)  # end of transform list
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no entropy image
    _write_green_code(bw)
    _write_byte_code(bw)  # red
    _write_byte_code(bw)  # blue
    _write_single_symbol_code(bw, 255)  # alpha: constant 255, 0 bits/px
    _write_single_symbol_code(bw, 0)  # distance: always code 1 ((0,1))

    len_sym, len_extra, len_extra_bits = _prefix_encode_value(width)
    for y in range(height):
        if y % 2 == 1:
            # whole row = row above: one backref, 0 distance bits
            _emit(bw, _GREEN_CODES, 256 + len_sym)
            bw.write(len_extra, len_extra_bits)
            continue
        for x in range(width):
            r, g, b = pixel(x, y)
            if subtract_green:
                r, b = (r - g) & 0xFF, (b - g) & 0xFF
            _emit(bw, _GREEN_CODES, g & 0xFF)
            _emit(bw, _BYTE_CODES, r & 0xFF)
            _emit(bw, _BYTE_CODES, b & 0xFF)
            # alpha: single-symbol code, zero bits
    payload = b"\x2f" + bw.bytes()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def encode_vp8l_palette(
    width: int, height: int, palette: list, index_fn
) -> bytes:
    """Build a real color-indexed (palette) VP8L WebP: the transform
    header carries the DELTA-coded palette as a 1-row sub-image, the
    main image stores indices in the green channel with the spec's
    sub-pixel packing for ≤16 colors. ``palette`` is [(r, g, b)] (alpha
    255); ``index_fn(x, y) -> int``."""
    n_colors = len(palette)
    if not 1 <= n_colors <= 256:
        raise ValueError("palette must have 1..256 entries")
    bw = _BitWriter()
    bw.write(width - 1, 14)
    bw.write(height - 1, 14)
    bw.write(0, 1)  # no alpha
    bw.write(0, 3)  # version 0
    bw.write(1, 1)  # a transform follows
    bw.write(3, 2)  # type 3 = color indexing
    bw.write(n_colors - 1, 8)

    def emit_image(pixels, *, top_level: bool) -> None:
        """Literal-coded entropy image: flat green/byte codes, alpha as
        a 2-symbol simple code over the values present. Only the main
        image carries the meta-prefix bit (see
        _decode_entropy_coded_image) — transform sub-images must not."""
        bw.write(0, 1)  # no color cache
        if top_level:
            bw.write(0, 1)  # no entropy image
        _write_green_code(bw)
        _write_byte_code(bw)  # red
        _write_byte_code(bw)  # blue
        alphas = sorted({a for a, _r, _g, _b in pixels})
        if len(alphas) == 1:
            _write_single_symbol_code(bw, alphas[0])
        elif len(alphas) == 2:
            bw.write(1, 1)  # simple, two symbols (codes 0 and 1 in
            bw.write(1, 1)  # listed order)
            bw.write(1, 1)  # 8-bit first symbol
            bw.write(alphas[0], 8)
            bw.write(alphas[1], 8)
        else:
            raise ValueError("fixture alpha plane must have ≤2 values")
        _write_single_symbol_code(bw, 0)  # distance (unused)
        for a, r, g, b in pixels:
            _emit(bw, _GREEN_CODES, g & 0xFF)
            _emit(bw, _BYTE_CODES, r & 0xFF)
            _emit(bw, _BYTE_CODES, b & 0xFF)
            if len(alphas) == 2:
                bw.write(alphas.index(a), 1)

    # palette sub-image: per-channel DELTAS of (255, r, g, b) entries
    deltas = []
    prev = (0, 0, 0, 0)
    for r, g, b in palette:
        cur = (255, r & 0xFF, g & 0xFF, b & 0xFF)
        deltas.append(tuple((cur[i] - prev[i]) & 0xFF for i in range(4)))
        prev = cur
    emit_image(deltas, top_level=False)

    bw.write(0, 1)  # end of transform list
    # main image: indices in green, packed per the palette size
    wbits = _pack_width_bits(n_colors)
    eff_width = (width + (1 << wbits) - 1) >> wbits if wbits else width
    per = 1 << wbits
    ibits = 8 >> wbits if wbits else 8
    main = []
    for y in range(height):
        for px in range(eff_width):
            g = 0
            if wbits:
                for j in range(per):
                    x = px * per + j
                    if x < width:
                        g |= (index_fn(x, y) & ((1 << ibits) - 1)) << (
                            j * ibits
                        )
            else:
                g = index_fn(px, y) & 0xFF
            main.append((255, 0, g, 0))
    emit_image(main, top_level=True)
    payload = b"\x2f" + bw.bytes()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


# ---------------------------------------------------------------------------
# deterministic fixtures (closed-form SQL oracle)
# ---------------------------------------------------------------------------


def synth_webp_dims(doc_id: int) -> tuple[int, int]:
    return 3 + doc_id % 12, 3 + (doc_id * 3) % 10


def synth_webp_bytes(doc_id: int) -> bytes:
    """Deterministic real lossless WebP for a doc id: dims and pixels
    are pure arithmetic in doc_id (odd rows duplicate the row above —
    the encoder's LZ77 invariant), so a SQL oracle recomputes the
    decoded (width, height, mean) without touching the binary."""
    w, h = synth_webp_dims(doc_id)

    def px(x: int, y: int) -> tuple[int, int, int]:
        ye = y - (y % 2)
        return (
            (x + 2 * ye + doc_id) % 256,
            (2 * x + ye + 3 * doc_id) % 256,
            (x + ye + 5 * doc_id) % 256,
        )

    return encode_vp8l(w, h, px)


# ---------------------------------------------------------------------------
# animated WebP: full frame iteration (round 5)
# ---------------------------------------------------------------------------


def _u24(b: bytes, off: int) -> int:
    return b[off] | (b[off + 1] << 8) | (b[off + 2] << 16)


def _blend_px(dst, src):
    """Source-over alpha blend of two (a, r, g, b) pixels (container
    spec 'blending method: alpha blending'), float-exact then rounded
    half-up; binary alphas (0/255) compose exactly."""
    sa = src[0] / 255.0
    da = dst[0] / 255.0
    oa = sa + da * (1.0 - sa)
    if oa == 0.0:
        return (0, 0, 0, 0)
    out = [int(oa * 255.0 + 0.5)]
    for c in range(1, 4):
        v = (sa * src[c] + da * dst[c] * (1.0 - sa)) / oa
        out.append(int(v + 0.5))
    return tuple(out)


def _vp8_rgba(payload: bytes):
    """Lossy frame pixels: decode the VP8 key frame's Y/U/V planes
    (functions/vp8.py, bit-exact) and convert to opaque (a, r, g, b)
    via full-range BT.601 with NEAREST chroma upsampling (each 4:2:0
    sample covers its 2×2 block) — flat-chroma (U=V=128) frames
    convert to R=G=B=Y exactly, which is what keeps the lossy fixture
    oracle closed-form."""
    from .vp8 import decode_vp8_planes

    w, h, y, u, v = decode_vp8_planes(payload)
    cw = (w + 1) // 2
    pixels = []
    for yy in range(h):
        crow = (yy // 2) * cw
        yrow = yy * w
        for xx in range(w):
            Y = y[yrow + xx]
            U = u[crow + xx // 2] - 128
            V = v[crow + xx // 2] - 128
            r = int(Y + 1.402 * V + 0.5)
            g = int(Y - 0.344136 * U - 0.714136 * V + 0.5)
            b = int(Y + 1.772 * U + 0.5)
            pixels.append((
                255,
                0 if r < 0 else (255 if r > 255 else r),
                0 if g < 0 else (255 if g > 255 else g),
                0 if b < 0 else (255 if b > 255 else b),
            ))
    return w, h, pixels


def webp_frames(data: bytes) -> list[tuple[int, int, int, int, float]]:
    """REAL animated-WebP frame iteration: one entry per ANMF frame —
    ``(frame_idx, canvas_w, canvas_h, duration_ms, mean)`` with mean
    over the composed canvas's R,G,B. Implements the container spec's
    animation model: VP8X canvas, ANIM background color (the initial
    canvas, and the fill for dispose-to-background), ANMF rectangles
    at (2·x, 2·y), per-frame blending method (alpha-blend or replace)
    and disposal. Frames may be LOSSLESS (VP8L) or LOSSY (VP8 key
    frame, converted per _vp8_rgba) sub-bitstreams — both vendored
    pixel decoders; lossy frames with an ALPH chunk raise (no alpha
    plane decode)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP")
    pos = 12
    canvas_w = canvas_h = None
    bg = (255, 255, 255, 255)  # (a, r, g, b)
    canvas = None
    frames: list[tuple[int, int, int, int, float]] = []
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8:pos + 8 + size]
        if len(body) != size:
            raise ValueError("truncated WebP chunk")
        if tag == b"VP8X":
            if size < 10:
                raise ValueError("bad VP8X chunk")
            canvas_w = _u24(body, 4) + 1
            canvas_h = _u24(body, 7) + 1
        elif tag == b"ANIM":
            if size < 6:
                raise ValueError("bad ANIM chunk")
            # background color rides BGRA
            bg = (body[3], body[2], body[1], body[0])
        elif tag == b"ANMF":
            if canvas_w is None:
                raise ValueError("ANMF before VP8X")
            if size < 16:
                raise ValueError("bad ANMF header")
            fx = 2 * _u24(body, 0)
            fy = 2 * _u24(body, 3)
            fw = _u24(body, 6) + 1
            fh = _u24(body, 9) + 1
            dur = _u24(body, 12)
            flags = body[15]
            no_blend = bool(flags & 0x02)
            dispose_bg = bool(flags & 0x01)
            if fx + fw > canvas_w or fy + fh > canvas_h:
                raise ValueError("ANMF rect outside the canvas")
            payload = None
            lossy = False
            saw_alph = False
            fpos = 16
            while fpos + 8 <= size:
                ftag = body[fpos:fpos + 4]
                (fsize,) = struct.unpack_from("<I", body, fpos + 4)
                fbody = body[fpos + 8:fpos + 8 + fsize]
                if len(fbody) != fsize:
                    raise ValueError("truncated ANMF sub-chunk")
                if ftag == b"VP8L":
                    payload = fbody
                    break
                if ftag == b"VP8 ":
                    if saw_alph:
                        raise ValueError(
                            "lossy frame with ALPH chunk unsupported"
                        )
                    payload, lossy = fbody, True
                    break
                if ftag == b"ALPH":
                    saw_alph = True
                fpos += 8 + fsize + (fsize & 1)
            if payload is None:
                raise ValueError("ANMF frame with no VP8/VP8L payload")
            if lossy:
                w, h, pixels = _vp8_rgba(payload)
            else:
                w, h, pixels = decode_vp8l_pixels(payload)
            if (w, h) != (fw, fh):
                raise ValueError("ANMF rect disagrees with frame dims")
            if canvas is None:
                canvas = [bg] * (canvas_w * canvas_h)
            for yy in range(fh):
                row = (fy + yy) * canvas_w + fx
                src_row = yy * fw
                for xx in range(fw):
                    s = pixels[src_row + xx]
                    canvas[row + xx] = (
                        s if no_blend or s[0] == 255
                        else _blend_px(canvas[row + xx], s)
                    )
            total = sum(r + g + b for _a, r, g, b in canvas)
            frames.append((
                len(frames), canvas_w, canvas_h, dur,
                total / (3.0 * canvas_w * canvas_h),
            ))
            if dispose_bg:
                for yy in range(fh):
                    row = (fy + yy) * canvas_w + fx
                    for xx in range(fw):
                        canvas[row + xx] = bg
        pos += 8 + size + (size & 1)
    if not frames:
        raise ValueError("WebP with no ANMF frames")
    return frames


def encode_webp_animated(
    canvas_w: int, canvas_h: int, frames, bg=(255, 255, 255, 255),
) -> bytes:
    """Build a real animated WebP: VP8X (animation flag) + ANIM + one
    ANMF per frame wrapping a VP8L lossless sub-bitstream. ``frames``
    is a list of dicts: ``pixel(x, y) -> (r, g, b)`` (encode_vp8l's
    even-row contract applies), optional ``rect=(x, y, w, h)`` with x,
    y EVEN (the spec stores them halved), ``duration_ms``,
    ``no_blend``, ``dispose_bg``. ``bg`` is (a, r, g, b)."""
    chunks = bytearray()
    vp8x = bytes([0x02, 0, 0, 0]) + struct.pack(
        "<I", canvas_w - 1
    )[:3] + struct.pack("<I", canvas_h - 1)[:3]
    chunks += b"VP8X" + struct.pack("<I", len(vp8x)) + vp8x
    anim = bytes([bg[3], bg[2], bg[1], bg[0]]) + struct.pack("<H", 0)
    chunks += b"ANIM" + struct.pack("<I", len(anim)) + anim
    for f in frames:
        x, y, w, h = f.get("rect", (0, 0, canvas_w, canvas_h))
        if x % 2 or y % 2:
            raise ValueError("ANMF offsets must be even")
        if "vp8_payload" in f:  # lossy frame: raw VP8 key-frame bytes
            p = f["vp8_payload"]
            sub = b"VP8 " + struct.pack("<I", len(p)) + p
            if len(p) & 1:
                sub += b"\x00"
        else:
            sub = encode_vp8l(w, h, f["pixel"])[12:]  # strip RIFF header
        hdr = (
            struct.pack("<I", x // 2)[:3]
            + struct.pack("<I", y // 2)[:3]
            + struct.pack("<I", w - 1)[:3]
            + struct.pack("<I", h - 1)[:3]
            + struct.pack("<I", f.get("duration_ms", 0))[:3]
            + bytes([
                (0x02 if f.get("no_blend", True) else 0)
                | (0x01 if f.get("dispose_bg", False) else 0)
            ])
        )
        body = hdr + sub
        chunks += b"ANMF" + struct.pack("<I", len(body)) + body
        if len(body) & 1:
            chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WEBP" + bytes(chunks)


def synth_webp_lossy_animated_bytes(doc_id: int) -> bytes:
    """Deterministic real 3-frame LOSSY animated WebP: full-canvas VP8
    key frames (flat MB luma per synth_vp8_mb_value with a per-frame
    shift 17·k, flat chroma so RGB == Y exactly), duration 25+k ms —
    the SQL oracle recomputes every frame's (duration, mean) as MB
    arithmetic."""
    from .vp8 import encode_vp8_flat_mbs, synth_vp8_dims, synth_vp8_mb_value

    w, h = synth_vp8_dims(doc_id)
    frames = []
    for k in range(3):
        payload = encode_vp8_flat_mbs(
            w, h, 4,
            lambda mx, my, k=k: 40
            + (synth_vp8_mb_value(mx, my, doc_id) - 40 + 17 * k) % 176,
        )
        frames.append({
            "vp8_payload": payload, "duration_ms": 25 + k, "no_blend": True,
        })
    return encode_webp_animated(w, h, frames)


def synth_webp_animated_bytes(doc_id: int) -> bytes:
    """Deterministic real 3-frame animated WebP: full-canvas VP8L
    frames (no-blend, no disposal) whose pixels follow the
    synth_webp_bytes arithmetic with a per-frame shift 17·k; duration
    40+k ms — the SQL oracle recomputes every frame's (duration, mean)
    without touching the binary."""
    w, h = synth_webp_dims(doc_id)
    frames = []
    for k in range(3):
        def px(x: int, y: int, k=k) -> tuple[int, int, int]:
            ye = y - (y % 2)
            return (
                (x + 2 * ye + doc_id + 17 * k) % 256,
                (2 * x + ye + 3 * doc_id + 17 * k) % 256,
                (x + ye + 5 * doc_id + 17 * k) % 256,
            )
        frames.append({"pixel": px, "duration_ms": 40 + k, "no_blend": True})
    return encode_webp_animated(w, h, frames)
