"""Conformance of the vendored PNG codec (functions/multimodal.py)
against the SYSTEM libpng16 (reference implementation, simplified API,
test oracle only — same discipline as tests/test_libwebp_conformance.py).
Both directions: our fixture encoder's bytes must read back pixel-exact
under libpng, and libpng-WRITTEN files (whose filter heuristics choose
Sub/Up/Average/Paeth per row) must decode to the exact channel mean
under our full 5-filter unfilter."""

from __future__ import annotations

import ctypes
import ctypes.util

import pytest

_PATHS = [
    "/usr/lib/x86_64-linux-gnu/libpng16.so.16",
    "libpng16.so.16",
    ctypes.util.find_library("png16") or "",
]


class _PngImage(ctypes.Structure):
    _fields_ = [
        ("opaque", ctypes.c_void_p),
        ("version", ctypes.c_uint32),
        ("width", ctypes.c_uint32),
        ("height", ctypes.c_uint32),
        ("format", ctypes.c_uint32),
        ("flags", ctypes.c_uint32),
        ("colormap_entries", ctypes.c_uint32),
        ("warning_or_error", ctypes.c_uint32),
        ("message", ctypes.c_char * 64),
    ]


PNG_IMAGE_VERSION = 1
FMT_GRAY, FMT_GA, FMT_RGB, FMT_RGBA = 0, 1, 2, 3


def _load():
    for p in _PATHS:
        if not p:
            continue
        try:
            lib = ctypes.CDLL(p)
        except OSError:
            continue
        lib.png_image_begin_read_from_memory.restype = ctypes.c_int
        lib.png_image_begin_read_from_memory.argtypes = [
            ctypes.POINTER(_PngImage), ctypes.c_char_p, ctypes.c_size_t,
        ]
        lib.png_image_finish_read.restype = ctypes.c_int
        lib.png_image_finish_read.argtypes = [
            ctypes.POINTER(_PngImage), ctypes.c_void_p, ctypes.c_char_p,
            ctypes.c_int32, ctypes.c_void_p,
        ]
        lib.png_image_write_to_memory.restype = ctypes.c_int
        lib.png_image_write_to_memory.argtypes = [
            ctypes.POINTER(_PngImage), ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_size_t), ctypes.c_int,
            ctypes.c_char_p, ctypes.c_int32, ctypes.c_void_p,
        ]
        lib.png_image_free.restype = None
        lib.png_image_free.argtypes = [ctypes.POINTER(_PngImage)]
        return lib
    return None


LIB = _load()
pytestmark = pytest.mark.skipif(LIB is None, reason="system libpng absent")

_CH = {FMT_GRAY: 1, FMT_GA: 2, FMT_RGB: 3, FMT_RGBA: 4}


def png_read(data: bytes, fmt: int):
    img = _PngImage()
    img.version = PNG_IMAGE_VERSION
    if not LIB.png_image_begin_read_from_memory(
        ctypes.byref(img), data, len(data)
    ):
        raise ValueError(img.message.decode(errors="replace"))
    img.format = fmt
    n = img.width * img.height * _CH[fmt]
    buf = ctypes.create_string_buffer(n)
    ok = LIB.png_image_finish_read(
        ctypes.byref(img), None, buf, 0, None
    )
    w, h = img.width, img.height
    LIB.png_image_free(ctypes.byref(img))
    if not ok:
        raise ValueError("libpng finish_read failed")
    return w, h, buf.raw


def png_write(w: int, h: int, fmt: int, pixels: bytes) -> bytes:
    img = _PngImage()
    img.version = PNG_IMAGE_VERSION
    img.width, img.height, img.format = w, h, fmt
    size = ctypes.c_size_t(0)
    LIB.png_image_write_to_memory(
        ctypes.byref(img), None, ctypes.byref(size), 0, pixels, 0, None
    )
    buf = ctypes.create_string_buffer(size.value)
    ok = LIB.png_image_write_to_memory(
        ctypes.byref(img), buf, ctypes.byref(size), 0, pixels, 0, None
    )
    LIB.png_image_free(ctypes.byref(img))
    if not ok:
        raise ValueError("libpng write failed")
    return buf.raw[: size.value]


def test_encode_png_reads_back_pixel_exact_under_libpng():
    from embulk_spark.functions.multimodal import encode_png

    cases = [
        (0, FMT_GRAY, lambda x, y: ((x * 7 + y * 3) % 256,)),
        (2, FMT_RGB, lambda x, y: (x % 256, (y * 5) % 256, (x + y) % 256)),
        (4, FMT_GA, lambda x, y: ((x * y) % 256, (x + 2 * y) % 256)),
        (6, FMT_RGBA, lambda x, y: (x % 256, y % 256, (x ^ y) % 256,
                                    (x * 3 + y) % 256)),
    ]
    for ctype, fmt, px in cases:
        w, h = 13, 9
        data = encode_png(w, h, px, color_type=ctype)
        gw, gh, got = png_read(data, fmt)
        assert (gw, gh) == (w, h)
        want = bytes(
            v & 0xFF for y in range(h) for x in range(w) for v in px(x, y)
        )
        assert got == want, ctype


def test_libpng_written_files_through_vendored_decoder():
    """libpng's own writer (adaptive per-row filter heuristics → the
    Sub/Up/Average/Paeth unfilter paths) then our decode_png: the
    channel mean must be exact."""
    import hashlib

    from embulk_spark.functions.multimodal import decode_png

    def noise(x, y, c, seed):
        return hashlib.md5(f"{seed}:{x}:{y}:{c}".encode()).digest()[0]

    for w, h, fmt, f in [
        (40, 30, FMT_RGB, lambda x, y, c: (
            x * 255 // 39, y * 255 // 29, (x + y) % 256)[c]),
        (64, 48, FMT_RGB, lambda x, y, c: noise(x, y, c, 5)),
        (33, 21, FMT_GRAY, lambda x, y, c: (x * x + y * 3) % 256),
        (24, 17, FMT_RGBA, lambda x, y, c: noise(x, y, c, 9)),
        (16, 16, FMT_GA, lambda x, y, c: (x * 11 + y * 7 + c * 3) % 256),
    ]:
        ch = _CH[fmt]
        pixels = bytes(
            f(x, y, c) & 0xFF
            for y in range(h) for x in range(w) for c in range(ch)
        )
        data = png_write(w, h, fmt, pixels)
        gw, gh, mean = decode_png(data)
        assert (gw, gh) == (w, h)
        assert abs(mean - sum(pixels) / (ch * float(w * h))) < 1e-9, fmt


def _chunk(tag: bytes, body: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(body)) + tag + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def test_palette_png_oracle_chain():
    """Hand-built 8-bit palette PNG → libpng must read the expected
    RGB (proves the fixture conformant) → our decode_png's mean must
    equal the palette-expanded channel mean."""
    import struct
    import zlib

    from embulk_spark.functions.multimodal import decode_png

    w, h = 13, 9
    pal = [((7 * i) % 256, (11 * i) % 256, (13 * i) % 256) for i in range(40)]
    idx = [(x * 3 + y * 5) % 40 for y in range(h) for x in range(w)]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    raw = b"".join(
        b"\x00" + bytes(idx[y * w:(y + 1) * w]) for y in range(h)
    )
    data = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"PLTE", bytes(v for c in pal for v in c))
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    gw, gh, got = png_read(data, FMT_RGB)
    want_px = bytes(v for i in idx for v in pal[i])
    assert (gw, gh) == (w, h) and got == want_px
    dw, dh, mean = decode_png(data)
    assert (dw, dh) == (w, h)
    assert abs(mean - sum(want_px) / (3.0 * w * h)) < 1e-9


def test_adam7_interlaced_png_oracle_chain():
    """Hand-built Adam7-interlaced RGB PNG (7 passes, per-pass filter-0
    scanlines) → libpng must de-interlace to the expected pixels →
    our decode_png's pass-summed mean must match."""
    import struct
    import zlib

    from embulk_spark.functions.multimodal import decode_png

    ADAM7 = (
        (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
        (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
    )
    for w, h in [(13, 9), (8, 8), (3, 2), (1, 1), (17, 5)]:
        def px(x, y):
            return ((x * 9 + y) % 256, (y * 7 + x) % 256, (x ^ y) % 256)

        raw = bytearray()
        for x0, y0, dx, dy in ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            for ry in range(ph):
                raw.append(0)
                y = y0 + ry * dy
                for rx in range(pw):
                    raw += bytes(px(x0 + rx * dx, y))
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1)
        data = (
            b"\x89PNG\r\n\x1a\n"
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _chunk(b"IEND", b"")
        )
        gw, gh, got = png_read(data, FMT_RGB)
        want_px = bytes(
            v for y in range(h) for x in range(w) for v in px(x, y)
        )
        assert (gw, gh) == (w, h) and got == want_px, (w, h)
        dw, dh, mean = decode_png(data)
        assert (dw, dh) == (w, h)
        assert abs(mean - sum(want_px) / (3.0 * w * h)) < 1e-9, (w, h)


def test_sub8bit_png_oracle_chain():
    """1/2/4-bit palette and grayscale PNGs (MSB-first packed samples,
    byte-padded scanlines, filter byte-distance 1): hand-built fixtures
    proven conformant by libpng reading them to the expected pixels,
    then our decoder's mean must match. Gray samples left-bit-replicate
    to 0..255 (v*255/(2^d-1)) per the spec."""
    import struct
    import zlib

    from embulk_spark.functions.multimodal import decode_png

    def pack_rows(idx_rows, depth):
        out = bytearray()
        for row in idx_rows:
            out.append(0)  # filter None
            acc = 0
            nbits = 0
            for v in row:
                acc = (acc << depth) | v
                nbits += depth
                if nbits == 8:
                    out.append(acc)
                    acc = nbits = 0
            if nbits:
                out.append(acc << (8 - nbits))
        return bytes(out)

    for depth, ctype in [(1, 3), (2, 3), (4, 3), (1, 0), (2, 0), (4, 0)]:
        w, h = 11, 7
        nvals = 1 << depth
        idx_rows = [
            [(x * 3 + y) % nvals for x in range(w)] for y in range(h)
        ]
        ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, 0)
        chunks = _chunk(b"IHDR", ihdr)
        if ctype == 3:
            pal = [((5 * i) % 256, (9 * i) % 256, (11 * i) % 256)
                   for i in range(nvals)]
            chunks += _chunk(b"PLTE", bytes(v for c in pal for v in c))
            want_vals = [sum(pal[v]) for row in idx_rows for v in row]
            denom = 3.0
        else:
            scale = [v * 255 // (nvals - 1) for v in range(nvals)]
            want_vals = [scale[v] for row in idx_rows for v in row]
            denom = 1.0
        chunks += _chunk(b"IDAT", zlib.compress(pack_rows(idx_rows, depth)))
        chunks += _chunk(b"IEND", b"")
        data = b"\x89PNG\r\n\x1a\n" + chunks
        # libpng proves the fixture conformant
        fmt = FMT_RGB if ctype == 3 else FMT_GRAY
        gw, gh, got = png_read(data, fmt)
        assert (gw, gh) == (w, h), (depth, ctype)
        if ctype == 3:
            want_px = bytes(
                v for row in idx_rows for i in row for v in pal[i]
            )
        else:
            want_px = bytes(scale[v] for row in idx_rows for v in row)
        assert got == want_px, (depth, ctype)
        # then our decoder's mean
        dw, dh, mean = decode_png(data)
        assert (dw, dh) == (w, h), (depth, ctype)
        assert abs(mean - sum(want_vals) / (denom * w * h)) < 1e-9, (
            depth, ctype,
        )


FMT_LINEAR = 4  # PNG_FORMAT_FLAG_LINEAR: 16-bit components


def png_read_linear(data: bytes, fmt: int, ch: int):
    """Like png_read but for the 16-bit linear formats (2-byte
    components, native-endian)."""
    img = _PngImage()
    img.version = PNG_IMAGE_VERSION
    if not LIB.png_image_begin_read_from_memory(
        ctypes.byref(img), data, len(data)
    ):
        raise ValueError(img.message.decode(errors="replace"))
    img.format = fmt | FMT_LINEAR
    n = img.width * img.height * ch * 2
    buf = ctypes.create_string_buffer(n)
    ok = LIB.png_image_finish_read(ctypes.byref(img), None, buf, 0, None)
    w, h = img.width, img.height
    LIB.png_image_free(ctypes.byref(img))
    if not ok:
        raise ValueError("libpng finish_read failed")
    return w, h, buf.raw


def test_16bit_libpng_written_files_through_vendored_decoder():
    """libpng-WRITTEN 16-bit files (linear formats write the 16-bit
    samples unchanged; the row filter heuristics pick Sub/Up/Average/
    Paeth over 2-bytes-per-sample lanes) must decode under our
    bytewise unfilter to the exact sample mean scaled by 1/257.
    (No alpha case: libpng's linear-alpha buffer format is
    premultiplied, so random component data is not representable.)"""
    import random
    import struct

    from embulk_spark.functions.multimodal import decode_png

    rng = random.Random(1616)
    for fmt, ch in ((FMT_GRAY, 1), (FMT_RGB, 3), (FMT_RGB, 3)):
        w, h = rng.randrange(4, 40), rng.randrange(4, 32)
        vals = [rng.randrange(65536) for _ in range(w * h * ch)]
        buf = struct.pack("<%dH" % len(vals), *vals)  # native-endian u16
        data = png_write(w, h, fmt | FMT_LINEAR, buf)
        gw, gh, mean = decode_png(data)
        assert (gw, gh) == (w, h)
        exp = sum(vals) / (257.0 * ch * w * h)
        assert mean == pytest.approx(exp, abs=1e-9), (fmt, w, h)


def test_16bit_encode_png_reads_back_exact_under_libpng():
    """Our 16-bit fixture encoder's streams read back sample-exact
    under libpng (linear read of a linear-tagged file)."""
    import struct
    import zlib

    from embulk_spark.functions.multimodal import (
        _PNG_SIG,
        decode_png,
        encode_png,
    )

    f = lambda x, y: ((x * 2571 + y * 991) % 65536,)  # noqa: E731
    data = encode_png(13, 9, lambda x, y: f(x, y)[0], color_type=0, depth=16)
    # tag the file linear (gAMA 1.0) so the simplified API's linear
    # read performs no gamma conversion
    gama = struct.pack(">I", 100000)
    chunk = (
        struct.pack(">I", 4) + b"gAMA" + gama
        + struct.pack(">I", zlib.crc32(b"gAMA" + gama) & 0xFFFFFFFF)
    )
    ihdr_end = 8 + 8 + 13 + 4
    tagged = data[:ihdr_end] + chunk + data[ihdr_end:]
    w, h, raw = png_read_linear(tagged, FMT_GRAY, 1)
    got = struct.unpack("<%dH" % (w * h), raw)
    want = tuple(f(x, y)[0] for y in range(h) for x in range(w))
    assert got == want
    # and our own decoder agrees on the tagged bytes too (gAMA ignored)
    assert decode_png(tagged) == decode_png(data)


def test_16bit_adam7_oracle_chain():
    """Hand-built 16-bit Adam7 stream (per-pass scanlines, filter 0):
    the interlace walk must sum passes at the 2-byte sample width."""
    import struct
    import zlib

    from embulk_spark.functions.multimodal import (
        _ADAM7,
        _PNG_SIG,
        decode_png,
    )

    w, h, ch = 11, 7, 3
    def px(x, y):
        return ((x * 997 + y) % 65536, (y * 991) % 65536, (x ^ y) * 771 % 65536)

    raw = bytearray()
    for x0, y0, dx, dy in _ADAM7:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        for ry in range(ph):
            raw.append(0)
            for rx in range(pw):
                for v in px(x0 + rx * dx, y0 + ry * dy):
                    raw += struct.pack(">H", v)

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 16, 2, 0, 0, 1)
    data = (
        _PNG_SIG + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    gw, gh, mean = decode_png(data)
    assert (gw, gh) == (w, h)
    exp = sum(sum(px(x, y)) for y in range(h) for x in range(w)) / (
        257.0 * ch * w * h
    )
    assert mean == pytest.approx(exp, abs=1e-9)
    # cross-check against libpng's read of the same interlaced stream
    gama = struct.pack(">I", 100000)
    ihdr_end = 8 + 8 + 13 + 4
    tagged = data[:ihdr_end] + chunk(b"gAMA", gama) + data[ihdr_end:]
    rw, rh, rraw = png_read_linear(tagged, FMT_RGB, 3)
    vals = struct.unpack("<%dH" % (rw * rh * 3), rraw)
    assert sum(vals) / (257.0 * ch * w * h) == pytest.approx(exp, abs=1e-9)
