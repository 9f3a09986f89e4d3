"""Conformance of the vendored VP8L codecs against the SYSTEM libwebp
(reference implementation, used as a test oracle only — see
tests/libwebp_oracle.py). This is the external check the in-repo round
trips cannot provide: a shared encoder/decoder layout bug (like the
round-5 sub-image meta-prefix fix) cannot survive the reference
decoder reading our bytes.
"""

from __future__ import annotations

import pytest

from tests import libwebp_oracle as oracle

LIB = oracle.load()
pytestmark = pytest.mark.skipif(LIB is None, reason="system libwebp absent")


def test_encode_vp8l_streams_decode_exactly_under_libwebp():
    from embulk_spark.functions.vp8l import encode_vp8l

    for w, h, seed in ((1, 1, 0), (5, 4, 3), (12, 9, 7), (16, 10, 11)):
        def px(x, y, s=seed):
            ye = y - (y % 2)
            return ((x * 13 + ye * 7 + s) % 256,
                    (x * 5 + ye * 11 + s * 3) % 256,
                    (x + ye + s * 7) % 256)

        data = encode_vp8l(w, h, px)
        gw, gh, got = oracle.decode_rgba(LIB, data)
        assert (gw, gh) == (w, h)
        want = [(*px(x, y), 255) for y in range(h) for x in range(w)]
        assert got == want, (w, h, seed)


def test_encode_vp8l_subtract_green_decodes_exactly_under_libwebp():
    from embulk_spark.functions.vp8l import encode_vp8l

    def px(x, y):
        ye = y - (y % 2)
        return ((x * 3 + ye) % 256, (x + 2 * ye) % 256, (5 * x + ye) % 256)

    data = encode_vp8l(9, 6, px, subtract_green=True)
    gw, gh, got = oracle.decode_rgba(LIB, data)
    assert (gw, gh) == (9, 6)
    assert got == [(*px(x, y), 255) for y in range(6) for x in range(9)]


def test_encode_vp8l_palette_decodes_exactly_under_libwebp():
    """The round-5 grammar fix under the reference decoder: every
    packing width (1/2/4-bit and none), non-multiple widths, the
    single-color edge — libwebp must reproduce the indexed pixels."""
    from embulk_spark.functions.vp8l import encode_vp8l_palette

    for n_colors, w, h in (
        (2, 13, 5), (4, 9, 6), (5, 9, 6), (16, 10, 7),
        (17, 10, 7), (200, 12, 9), (1, 6, 4),
    ):
        pal = [
            ((3 * i + 7) % 256, (5 * i + 11) % 256, (7 * i + 13) % 256)
            for i in range(n_colors)
        ]

        def idx(x, y, n=n_colors):
            return (x * 3 + y * 5) % n

        data = encode_vp8l_palette(w, h, pal, idx)
        gw, gh, got = oracle.decode_rgba(LIB, data)
        assert (gw, gh) == (w, h), (n_colors,)
        want = [
            (*pal[idx(x, y)], 255) for y in range(h) for x in range(w)
        ]
        assert got == want, (n_colors, w, h)


def test_libwebp_lossless_streams_through_vendored_decoder():
    """The other direction: reference-ENCODED lossless streams through
    decode_webp. libwebp may emit transforms outside the vendored
    profile (predictor/color/entropy-image) — the contract is exact
    decode OR an honest ValueError, never a wrong answer."""
    from embulk_spark.functions.vp8l import decode_webp

    decoded = 0
    for w, h, seed in ((4, 3, 1), (8, 5, 2), (16, 16, 3), (7, 11, 4)):
        rgb = bytes(
            ((x * 7 + y * 3 + seed * 11 + c * 5) % 256)
            for y in range(h) for x in range(w) for c in range(3)
        )
        data = oracle.encode_lossless_rgb(LIB, w, h, rgb)
        try:
            gw, gh, mean = decode_webp(data)
        except ValueError:
            continue  # outside the vendored profile: honest rejection
        decoded += 1
        assert (gw, gh) == (w, h)
        want = sum(rgb) / (3.0 * w * h)
        assert abs(mean - want) < 1e-9, (w, h, seed)


def test_vendored_decoder_pixel_exact_on_libwebp_lossless_output():
    """Round 5 closed the VP8L transform set (predictor, cross-color,
    subtract-green, color-indexing, entropy image): every stream the
    reference lossless encoder emits for flat / gradient / blocky /
    noise / palette / photo-like content must decode PIXEL-EXACTLY
    (full RGBA compare, not just the mean)."""
    import hashlib
    import math
    import struct

    from embulk_spark.functions.vp8l import decode_vp8l_pixels

    def payload(data):
        pos = 12
        while pos + 8 <= len(data):
            tag = data[pos:pos + 4]
            (size,) = struct.unpack_from("<I", data, pos + 4)
            if tag == b"VP8L":
                return data[pos + 8:pos + 8 + size]
            pos += 8 + size + (size & 1)
        raise ValueError("no VP8L chunk")

    def patterns(w, h, seed):
        def noise(x, y, c):
            return hashlib.md5(f"{seed}:{x}:{y}:{c}".encode()).digest()[0]

        yield "gradient", lambda x, y, c: (
            x * 255 // max(1, w - 1) if c == 0
            else y * 255 // max(1, h - 1) if c == 1 else (x + y) % 256
        )
        yield "flat", lambda x, y, c: (37, 180, 91)[c]
        yield "blocks", lambda x, y, c: ((x // 8 + y // 8 + c) % 4) * 80
        yield "noise", noise
        yield "palette4", lambda x, y, c: [
            (255, 0, 0), (0, 255, 0), (0, 0, 255), (128, 128, 0)
        ][(x + 2 * y) % 4][c]
        yield "photoish", lambda x, y, c: int(
            127 + 100 * math.sin(x / 7.0 + c) * math.cos(y / 5.0)
        ) & 0xFF

    for w, h in [(40, 30), (97, 61), (160, 120), (13, 129)]:
        for name, f in patterns(w, h, w * h):
            rgb = bytes(
                f(x, y, c) & 0xFF
                for y in range(h) for x in range(w) for c in range(3)
            )
            data = oracle.encode_lossless_rgb(LIB, w, h, rgb)
            lw, lh, want = oracle.decode_rgba(LIB, data)
            gw, gh, got = decode_vp8l_pixels(payload(data))
            got_rgba = [(r, g, b, a) for (a, r, g, b) in got]
            assert (gw, gh) == (lw, lh) == (w, h), (name, w, h)
            assert got_rgba == want, (
                name, w, h,
                sum(1 for p, q in zip(got_rgba, want) if p != q),
            )


def test_vendored_vp8_decoder_plane_exact_on_libwebp_lossy_output():
    """The round-5 lossy-VP8 key-frame decoder (functions/vp8.py): every
    stream the reference LOSSY encoder emits — B_PRED and 16x16 MBs,
    skip flags, probability updates, loop filter at real strengths —
    must reconstruct the full Y, U and V planes PIXEL-EXACTLY."""
    import hashlib
    import math
    import struct

    from embulk_spark.functions.vp8 import decode_vp8_planes

    def vp8_payload(data):
        pos = 12
        while pos + 8 <= len(data):
            tag = data[pos:pos + 4]
            (size,) = struct.unpack_from("<I", data, pos + 4)
            if tag == b"VP8 ":
                return data[pos + 8:pos + 8 + size]
            pos += 8 + size + (size & 1)
        raise ValueError("no VP8 chunk")

    def patterns(w, h, seed):
        def noise(x, y, c):
            return hashlib.md5(f"{seed}:{x}:{y}:{c}".encode()).digest()[0]

        yield lambda x, y, c: (126, 128, 129)[c]
        yield lambda x, y, c: (
            x * 255 // max(1, w - 1), y * 255 // max(1, h - 1), (x + y) % 256
        )[c]
        yield lambda x, y, c: ((x // 8 + y // 8 + c) % 4) * 80
        yield lambda x, y, c: int(
            127 + 100 * math.sin(x / 7.0 + c) * math.cos(y / 5.0)
        ) & 0xFF
        yield noise

    for w, h in [(16, 16), (48, 32), (33, 17), (96, 80)]:
        for f in patterns(w, h, w + h):
            rgb = bytes(
                f(x, y, c) & 0xFF
                for y in range(h) for x in range(w) for c in range(3)
            )
            for q in (95.0, 60.0, 25.0):
                data = oracle.encode_lossy_rgb(LIB, w, h, rgb, q)
                lw, lh, y_ref = oracle.decode_luma(LIB, data)
                gw, gh, y, u, v = decode_vp8_planes(vp8_payload(data))
                assert (gw, gh) == (lw, lh) == (w, h)
                nd = sum(1 for a, b in zip(y, y_ref) if a != b)
                assert nd == 0, (w, h, q, nd)


def test_vendored_vp8_fixtures_decode_exactly_under_libwebp():
    """The other direction: our fixture encoder's streams through the
    REFERENCE decoder — byte-real conformance for the bool encoder,
    header/mode/token writing and the exact-reconstruction design."""
    from embulk_spark.functions.vp8 import (
        synth_vp8_bytes,
        synth_vp8_dims,
        synth_vp8_mb_value,
    )

    for doc_id in (0, 2, 7, 33, 100):
        data = synth_vp8_bytes(doc_id)
        w, h = synth_vp8_dims(doc_id)
        lw, lh, y_ref = oracle.decode_luma(LIB, data)
        assert (lw, lh) == (w, h)
        exp = bytes(
            synth_vp8_mb_value(x // 16, y // 16, doc_id)
            for y in range(h) for x in range(w)
        )
        assert y_ref == exp, doc_id


def test_vp8x_extended_container_stills_decode():
    """VP8X stills (alpha WebPs): the reference encoder's RGBA output
    wraps VP8X+ALPH+VP8 (or VP8L) — the walk must reach the still
    frame; animations still reject honestly."""
    import ctypes
    import struct

    from embulk_spark.functions.vp8l import decode_webp

    LIB.WebPEncodeRGBA.restype = ctypes.c_size_t
    LIB.WebPEncodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ]
    w = h = 32
    rgba = bytes(
        v for y in range(h) for x in range(w)
        for v in ((x * 8) % 256, (y * 8) % 256, (x + y) % 256,
                  128 if (x + y) % 3 else 255)
    )
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = LIB.WebPEncodeRGBA(rgba, w, h, 4 * w, 80.0, ctypes.byref(out))
    assert n
    try:
        data = ctypes.string_at(out, n)
    finally:
        LIB.WebPFree(ctypes.cast(out, ctypes.c_void_p))
    assert data[12:16] == b"VP8X", "expected an extended container"
    lw, lh, y_ref = oracle.decode_luma(LIB, data)
    gw, gh, mean = decode_webp(data)
    assert (gw, gh) == (lw, lh) == (w, h)
    assert abs(mean - sum(y_ref) / (w * h)) < 1e-9

    # an animation container with no frame still rejects honestly
    # (ANMF first-frame decode is real since round 5)
    anim = (
        b"RIFF" + struct.pack("<I", 4 + 8 + 10 + 8 + 6) + b"WEBP"
        + b"VP8X" + struct.pack("<I", 10) + bytes(10)
        + b"ANIM" + struct.pack("<I", 6) + bytes(6)
    )
    import pytest as _pt

    with _pt.raises(ValueError, match="no VP8L chunk"):
        decode_webp(anim)


def test_vendored_vp8_decoder_exact_on_segmented_streams():
    """Mixed-complexity content makes the reference encoder enable
    SEGMENTATION (4 segments, per-segment quantizer deltas, a coded
    segment map): verified present via our own header parse, and the
    decode must stay pixel-exact."""
    import hashlib
    import math
    import struct

    from embulk_spark.functions import vp8 as vp8mod

    def vp8_payload(data):
        pos = 12
        while pos + 8 <= len(data):
            tag = data[pos:pos + 4]
            (size,) = struct.unpack_from("<I", data, pos + 4)
            if tag == b"VP8 ":
                return data[pos + 8:pos + 8 + size]
            pos += 8 + size + (size & 1)
        raise ValueError("no VP8 chunk")

    def noise(x, y, c, s):
        return hashlib.md5(f"{s}:{x}:{y}:{c}".encode()).digest()[0]

    cases = [
        (160, 120, lambda x, y, c:
         noise(x, y, c, 1) if y < 60 else (x + y + c * 30) % 256, 60.0),
        (96, 96, lambda x, y, c:
         30 if (x // 16 + y // 16) % 2 else noise(x, y, c, 3), 75.0),
    ]
    seg_seen = 0
    for w, h, f, q in cases:
        rgb = bytes(
            f(x, y, c) & 0xFF
            for y in range(h) for x in range(w) for c in range(3)
        )
        data = oracle.encode_lossy_rgb(LIB, w, h, rgb, q)
        d = vp8_payload(data)
        p0 = (d[0] | (d[1] << 8) | (d[2] << 16)) >> 5
        bd = vp8mod._BoolDec(d[10:10 + p0])
        hh = vp8mod._parse_header(bd)
        seg_seen += hh["seg"]["enabled"]
        lw, lh, y_ref = oracle.decode_luma(LIB, data)
        gw, gh, y, u, v = vp8mod.decode_vp8_planes(d)
        assert (gw, gh) == (w, h)
        assert sum(1 for a, b in zip(y, y_ref) if a != b) == 0, (w, h, q)
    assert seg_seen >= 1, "no segmented stream produced — fixture drifted"


def test_animated_webp_first_frame_decodes():
    """A hand-built VP8X+ANIM+ANMF container wrapping one of our
    (libwebp-conformant) VP8L stills: the walk must decode the first
    frame's payload; an ANMF with no still payload still rejects."""
    import struct

    from embulk_spark.functions.vp8l import decode_webp, encode_vp8l

    def px(x, y):
        ye = y - y % 2
        return ((x * 5 + ye) % 256, (x + 3 * ye) % 256, (2 * x + ye) % 256)

    w, h = 10, 6
    still = encode_vp8l(w, h, px)  # full RIFF; extract the VP8L chunk
    assert still[12:16] == b"VP8L"
    (vsize,) = struct.unpack_from("<I", still, 16)
    vp8l_chunk = still[12:20 + vsize + (vsize & 1)]

    def chunk(tag, body):
        return tag + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b""
        )

    vp8x = chunk(b"VP8X", bytes([0x02] + [0] * 3) + bytes(6))  # anim flag
    anim = chunk(b"ANIM", bytes(6))
    anmf_body = bytes(16) + vp8l_chunk
    anmf = chunk(b"ANMF", anmf_body)
    payload = b"WEBP" + vp8x + anim + anmf
    data = b"RIFF" + struct.pack("<I", len(payload)) + payload

    want = sum(sum(px(x, y)) for y in range(h) for x in range(w))
    gw, gh, mean = decode_webp(data)
    assert (gw, gh) == (w, h)
    assert abs(mean - want / (3.0 * w * h)) < 1e-9

    empty_anmf = chunk(b"ANMF", bytes(16))
    payload2 = b"WEBP" + vp8x + anim + empty_anmf
    data2 = b"RIFF" + struct.pack("<I", len(payload2)) + payload2
    import pytest as _pt

    with _pt.raises(ValueError, match="no still payload"):
        decode_webp(data2)
