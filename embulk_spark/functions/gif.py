"""Vendored GIF codec (decode + fixture encoder) — clean-room from the
public GIF89a specification (CompuServe, 1990; also W3C's reference
copy). No library code consulted; stdlib-only.

Profile (same vendoring discipline as functions/jpeg.py — real decode of
the dominant web profile, honest ``ValueError`` outside it so callers
fall to the declared fake tier):

- GIF87a / GIF89a, global and/or local color table, any palette size;
- first image frame only (features come from frame 0 — animation frames
  add nothing to (width, height, mean) extraction);
- full LZW decode: variable code width 3..12 bits, clear / EOI codes,
  the KwKwK self-referencing case, deferred-clear (dictionary parked at
  4096 until an explicit clear);
- extensions (graphic control, comment, application, plain text) are
  skipped per spec sub-block framing;
- interlaced frames decode (round 5): the four-pass row permutation
  only reorders scanlines, and every pixel rides the LZW stream exactly
  once, so the row-order-invariant (width, height, mean) contract needs
  no de-interlacing pass.

Feature contract matches decode_bmp24/decode_png/decode_jpeg:
``(width, height, mean over the R,G,B bytes of every pixel)`` with one
exact integer sum and ONE double division — bit-identical across
engines, so a SQL oracle over the synth fixtures recomputes it.

Reference analogue: Embulk's magic-byte compression guess + decoder
chain (embulk-guess-gzip/-bzip2, exec/GuessExecutor.java:265-278) —
binary sniff → real codec → typed columns.
"""

from __future__ import annotations

import struct

__all__ = [
    "decode_gif",
    "encode_gif",
    "synth_gif_bytes",
    "synth_gif_dims",
]


# ---------------------------------------------------------------------------
# LZW (GIF variant: LSB-first codes, variable width, clear/EOI)
# ---------------------------------------------------------------------------


class _BitReader:
    """LSB-first bit reader over the concatenated image sub-blocks."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.bitbuf = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= len(self.data):
                raise ValueError("truncated GIF LZW stream")
            self.bitbuf |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        v = self.bitbuf & ((1 << n) - 1)
        self.bitbuf >>= n
        self.nbits -= n
        return v


def _lzw_decode(data: bytes, min_code_size: int, expect: int) -> bytearray:
    """Standard GIF LZW: roots 0..2^N-1, clear=2^N, EOI=2^N+1, first code
    width N+1, width grows when the next free slot reaches 2^width (cap
    12 bits / 4096 entries — deferred clear past that)."""
    if not 2 <= min_code_size <= 8:
        raise ValueError(f"bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    br = _BitReader(data)
    out = bytearray()
    # dict as list of bytes; rebuilt on clear
    base = [bytes((i,)) for i in range(clear)] + [b"", b""]

    table = list(base)
    width = min_code_size + 1
    prev: bytes | None = None
    while len(out) < expect:
        code = br.read(width)
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= clear:
                raise ValueError("first LZW code after clear not a root")
            s = table[code]
        elif code < len(table):
            s = table[code]
        elif code == len(table):
            s = prev + prev[:1]  # KwKwK
        else:
            raise ValueError(f"LZW code {code} beyond dictionary")
        out += s
        if prev is not None and len(table) < 4096:
            table.append(prev + s[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = s
    if len(out) < expect:
        raise ValueError(
            f"LZW stream ended early ({len(out)} of {expect} pixels)"
        )
    return out[:expect]


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """Literal-code LZW encoder for the fixture writer: one clear, then
    every pixel as its root code, EOI last. Emits each code at the width
    the DECODER will read it at, tracking the decoder's dictionary
    growth exactly (an entry is added while processing every code after
    the first since clear; width bumps when the table fills 2^width;
    growth parks at 4096 — deferred clear). Spec-conforming output, just
    not compressed."""
    clear = 1 << min_code_size
    eoi = clear + 1
    bitbuf = 0
    nbits = 0
    out = bytearray()

    def emit(code: int, width: int) -> None:
        nonlocal bitbuf, nbits
        bitbuf |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            nbits -= 8

    width = min_code_size + 1
    table_len = clear + 2
    emit(clear, width)
    for k, idx in enumerate(indices):
        emit(idx, width)
        if k >= 1 and table_len < 4096:
            table_len += 1
            if table_len == (1 << width) and width < 12:
                width += 1
    emit(eoi, width)
    if nbits:
        out.append(bitbuf & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# container walk
# ---------------------------------------------------------------------------


def decode_gif(data: bytes) -> tuple[int, int, float]:
    """REAL decode of the first frame of a GIF87a/89a: header + logical
    screen descriptor, global/local color table, extension skip, full
    LZW decompress, palette map → (width, height, mean over R,G,B).
    Raises ValueError outside the vendored profile (see module doc)."""
    if len(data) < 13 or data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    _sw, _sh, packed, _bg, _aspect = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = data[pos : pos + 3 * n]
        if len(gct) != 3 * n:
            raise ValueError("truncated global color table")
        pos += 3 * n
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer before any image
            raise ValueError("GIF with no image data")
        if block == 0x21:  # extension: label + sub-blocks
            pos += 1
            while True:
                if pos >= len(data):
                    raise ValueError("truncated GIF extension")
                sz = data[pos]
                pos += 1 + sz
                if sz == 0:
                    break
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        # image descriptor
        if pos + 9 > len(data):
            raise ValueError("truncated GIF image descriptor")
        _left, _top, w, h, ipacked = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        if w == 0 or h == 0:
            raise ValueError("bad GIF frame dimensions")
        # interlace (0x40): the four-pass row permutation only reorders
        # scanlines — the LZW stream carries every pixel exactly once,
        # and the (width, height, mean) feature stat is row-order
        # invariant, so the full decode below IS the interlaced decode
        # (round 5; previously rejected out of caution)
        pal = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            pal = data[pos : pos + 3 * n]
            if len(pal) != 3 * n:
                raise ValueError("truncated local color table")
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF frame with no color table")
        if pos >= len(data):
            raise ValueError("truncated GIF (no LZW min code size)")
        min_code = data[pos]
        pos += 1
        sub = bytearray()
        while True:
            if pos >= len(data):
                raise ValueError("truncated GIF pixel sub-blocks")
            sz = data[pos]
            pos += 1
            if sz == 0:
                break
            sub += data[pos : pos + sz]
            if len(data) < pos + sz:
                raise ValueError("truncated GIF pixel sub-block")
            pos += sz
        indices = _lzw_decode(bytes(sub), min_code, w * h)
        npal = len(pal) // 3
        total = 0
        for idx in indices:
            if idx >= npal:
                raise ValueError(f"palette index {idx} out of range")
            off = 3 * idx
            total += pal[off] + pal[off + 1] + pal[off + 2]
        return w, h, total / (3.0 * w * h)
    raise ValueError("truncated GIF (no image block)")


def encode_gif(width: int, height: int, palette: bytes, index_fn) -> bytes:
    """Build a real single-frame GIF89a: 256-entry global color table,
    one non-interlaced image, literal-code LZW. ``palette`` is 768 bytes
    (256×RGB); ``index_fn(x, y) -> int`` gives the pixel's palette
    index."""
    if len(palette) != 768:
        raise ValueError("encode_gif wants a full 256-entry palette")
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0x80 | 0x07, 0, 0)
    out += palette
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, width, height, 0)
    indices = bytes(
        index_fn(x, y) & 0xFF for y in range(height) for x in range(width)
    )
    out.append(8)  # LZW min code size
    stream = _lzw_encode(indices, 8)
    for i in range(0, len(stream), 255):
        chunk = stream[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3B"
    return bytes(out)


# ---------------------------------------------------------------------------
# deterministic fixtures (closed-form SQL oracle)
# ---------------------------------------------------------------------------


def synth_gif_dims(doc_id: int) -> tuple[int, int]:
    return 3 + doc_id % 13, 3 + (doc_id * 7) % 11


def synth_gif_bytes(doc_id: int) -> bytes:
    """Deterministic real GIF for a doc id: dims, palette entries and
    pixel indices are all pure arithmetic in doc_id, so a SQL oracle
    recomputes the decoded (width, height, mean) without touching the
    binary — the decoder must agree with the encoder through the actual
    LZW bitstream (the BMP/PNG/JPEG fixture contract)."""
    w, h = synth_gif_dims(doc_id)
    palette = bytes(
        c
        for i in range(256)
        for c in (
            (3 * i + doc_id) % 256,
            (5 * i + 2 * doc_id) % 256,
            (7 * i + 11 * doc_id) % 256,
        )
    )
    return encode_gif(
        w, h, palette, lambda x, y: (2 * x + 3 * y + doc_id) % 256
    )


# ---------------------------------------------------------------------------
# animated GIF: full frame iteration (round 5)
# ---------------------------------------------------------------------------


def gif_frames(data: bytes) -> list[tuple[int, int, int, int, float]]:
    """REAL animated-GIF frame iteration: yields one entry per
    displayed frame — ``(frame_idx, width, height, delay_cs, mean)``
    with width/height the LOGICAL SCREEN (what a viewer shows) and
    ``mean`` over the composed canvas's R,G,B after drawing the frame.

    Implements the GIF89a animation model: Graphic Control Extension
    (delay, transparency index, disposal method) per frame, frame
    rectangles composed at (left, top), transparent pixels leaving the
    prior canvas visible, and disposals 1 (leave), 2 (restore to the
    logical-screen background color) and 3 (restore to previous).
    The initial canvas is the background color when a global color
    table exists, else black."""
    import numpy as np

    if len(data) < 13 or data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw, sh, packed, bg, _aspect = struct.unpack_from("<HHBBB", data, 6)
    if sw == 0 or sh == 0:
        raise ValueError("bad GIF screen dimensions")
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = data[pos:pos + 3 * n]
        if len(gct) != 3 * n:
            raise ValueError("truncated global color table")
        pos += 3 * n
    # canvas holds r+g+b per pixel (the mean feature needs the sum)
    if gct is not None and bg < len(gct) // 3:
        bg_sum = gct[3 * bg] + gct[3 * bg + 1] + gct[3 * bg + 2]
    else:
        bg_sum = 0
    canvas = np.full((sh, sw), bg_sum, dtype=np.int64)
    frames: list[tuple[int, int, int, int, float]] = []
    delay = 0
    disposal = 0
    transparent = -1
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= len(data):
                raise ValueError("truncated GIF extension")
            label = data[pos]
            pos += 1
            if label == 0xF9:  # Graphic Control Extension
                if pos + 6 > len(data) or data[pos] != 4:
                    raise ValueError("bad GIF graphic control block")
                gpacked = data[pos + 1]
                (delay,) = struct.unpack_from("<H", data, pos + 2)
                transparent = data[pos + 4] if gpacked & 0x01 else -1
                disposal = (gpacked >> 2) & 0x07
                pos += 5
            while True:  # drain sub-blocks (incl. the GCE terminator)
                if pos >= len(data):
                    raise ValueError("truncated GIF extension")
                sz = data[pos]
                pos += 1 + sz
                if sz == 0:
                    break
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        if pos + 9 > len(data):
            raise ValueError("truncated GIF image descriptor")
        left, top, w, h, ipacked = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        if w == 0 or h == 0 or left + w > sw or top + h > sh:
            raise ValueError("GIF frame rect outside the logical screen")
        pal = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            pal = data[pos:pos + 3 * n]
            if len(pal) != 3 * n:
                raise ValueError("truncated local color table")
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF frame with no color table")
        if pos >= len(data):
            raise ValueError("truncated GIF (no LZW min code size)")
        min_code = data[pos]
        pos += 1
        sub = bytearray()
        while True:
            if pos >= len(data):
                raise ValueError("truncated GIF pixel sub-blocks")
            sz = data[pos]
            pos += 1
            if sz == 0:
                break
            sub += data[pos:pos + sz]
            if len(data) < pos + sz:
                raise ValueError("truncated GIF pixel sub-block")
            pos += sz
        idx = np.frombuffer(
            _lzw_decode(bytes(sub), min_code, w * h), dtype=np.uint8
        ).reshape(h, w).astype(np.int64)
        if ipacked & 0x40:  # interlaced: undo the four-pass row order
            order = [r for (y0, dy) in ((0, 8), (4, 8), (2, 4), (1, 2))
                     for r in range(y0, h, dy)]
            deinter = np.empty_like(idx)
            deinter[order, :] = idx
            idx = deinter
        npal = len(pal) // 3
        if int(idx.max()) >= npal:
            raise ValueError("palette index out of range")
        psum = np.zeros(256, dtype=np.int64)
        arr = np.frombuffer(pal, dtype=np.uint8).astype(np.int64)
        psum[:npal] = arr[0::3] + arr[1::3] + arr[2::3]
        region = canvas[top:top + h, left:left + w]
        saved = region.copy() if disposal == 3 else None
        drawn = psum[idx]
        if transparent >= 0:
            mask = idx != transparent
            region[mask] = drawn[mask]
        else:
            region[:, :] = drawn
        mean = float(canvas.sum(dtype=np.int64)) / (3.0 * sw * sh)
        frames.append((len(frames), int(sw), int(sh), int(delay), mean))
        if disposal == 2:
            region[:, :] = bg_sum
        elif disposal == 3:
            region[:, :] = saved
        delay, disposal, transparent = 0, 0, -1
    if not frames:
        raise ValueError("GIF with no image data")
    return frames


def encode_gif_animated(
    width: int, height: int, palette: bytes, frames,
) -> bytes:
    """Build a real multi-frame GIF89a: global 256-entry palette,
    NETSCAPE2.0 loop extension, one GCE + image block per frame.
    ``frames`` is a list of dicts: ``index_fn(x, y)``, optional
    ``rect=(left, top, w, h)`` (defaults full screen), ``delay_cs``,
    ``disposal``, ``transparent`` (palette index or None)."""
    if len(palette) != 768:
        raise ValueError("encode_gif_animated wants a 256-entry palette")
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0x80 | 0x07, 0, 0)
    out += palette
    out += b"\x21\xFF\x0BNETSCAPE2.0\x03\x01\x00\x00\x00"  # loop forever
    for f in frames:
        left, top, w, h = f.get("rect", (0, 0, width, height))
        transparent = f.get("transparent")
        gpacked = ((f.get("disposal", 0) & 0x07) << 2) | (
            1 if transparent is not None else 0
        )
        out += b"\x21\xF9\x04" + bytes([gpacked])
        out += struct.pack("<H", f.get("delay_cs", 0))
        out += bytes([transparent or 0, 0])
        out += struct.pack("<BHHHHB", 0x2C, left, top, w, h, 0)
        index_fn = f["index_fn"]
        indices = bytes(
            index_fn(x, y) & 0xFF for y in range(h) for x in range(w)
        )
        out.append(8)
        stream = _lzw_encode(indices, 8)
        for i in range(0, len(stream), 255):
            chunk = stream[i:i + 255]
            out.append(len(chunk))
            out += chunk
        out += b"\x00"
    out += b"\x3B"
    return bytes(out)


def synth_gif_animated_bytes(doc_id: int) -> bytes:
    """Deterministic real 3-frame animated GIF: same arithmetic palette
    as synth_gif_bytes, full-screen frames with per-frame index shift
    17·k and delay 4+k centiseconds (disposal 1 — each frame's
    composed canvas IS the frame), so a SQL oracle recomputes every
    frame's (delay, mean) without touching the binary."""
    w, h = synth_gif_dims(doc_id)
    palette = bytes(
        c
        for i in range(256)
        for c in (
            (3 * i + doc_id) % 256,
            (5 * i + 2 * doc_id) % 256,
            (7 * i + 11 * doc_id) % 256,
        )
    )
    frames = [
        {
            "index_fn": (
                lambda k: lambda x, y: (2 * x + 3 * y + doc_id + 17 * k) % 256
            )(k),
            "delay_cs": 4 + k,
            "disposal": 1,
        }
        for k in range(3)
    ]
    return encode_gif_animated(w, h, palette, frames)
