"""ctypes binding to the SYSTEM libwebp (conformance oracle only).

The container ships /usr/lib/x86_64-linux-gnu/libwebp.so.7 (1.2.4).
It is used exclusively as a TEST oracle: decode our fixture encoders'
streams with the reference implementation (closing REVIEW_r05 #1's
"checked against a known libwebp" ask for real), and encode real lossy
VP8 streams to conformance-test the vendored VP8 decoder. The engine
itself never links it — image decode in the data path stays the
pure-Python vendored profile (functions/vp8l.py, vp8.py), so the
operator works on any cluster node without native deps.

Import-guarded: tests skip when the library is absent.
"""

from __future__ import annotations

import ctypes
import ctypes.util

_PATHS = [
    "/usr/lib/x86_64-linux-gnu/libwebp.so.7",
    "libwebp.so.7",
    ctypes.util.find_library("webp") or "",
]


def load() -> ctypes.CDLL | None:
    for p in _PATHS:
        if not p:
            continue
        try:
            lib = ctypes.CDLL(p)
        except OSError:
            continue
        _sig(lib)
        return lib
    return None


def _sig(lib: ctypes.CDLL) -> None:
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.WebPGetInfo.restype = ctypes.c_int
    lib.WebPGetInfo.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.WebPDecodeRGBA.restype = u8p
    lib.WebPDecodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.WebPDecodeYUV.restype = u8p
    lib.WebPDecodeYUV.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(u8p), ctypes.POINTER(u8p),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.WebPEncodeRGB.restype = ctypes.c_size_t
    lib.WebPEncodeRGB.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ]
    lib.WebPEncodeLosslessRGB.restype = ctypes.c_size_t
    lib.WebPEncodeLosslessRGB.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ]
    lib.WebPFree.restype = None
    lib.WebPFree.argtypes = [ctypes.c_void_p]


def decode_rgba(lib, data: bytes):
    """(width, height, [(r,g,b,a)] row-major) via the reference decoder."""
    w, h = ctypes.c_int(), ctypes.c_int()
    p = lib.WebPDecodeRGBA(data, len(data), ctypes.byref(w), ctypes.byref(h))
    if not p:
        raise ValueError("libwebp failed to decode")
    try:
        n = w.value * h.value * 4
        buf = ctypes.string_at(p, n)
    finally:
        lib.WebPFree(ctypes.cast(p, ctypes.c_void_p))
    px = [
        (buf[i], buf[i + 1], buf[i + 2], buf[i + 3])
        for i in range(0, n, 4)
    ]
    return w.value, h.value, px


def decode_luma(lib, data: bytes):
    """(width, height, y_plane bytes row-major w×h) — the codec-native
    luma output, no RGB conversion in the comparison path."""
    w, h = ctypes.c_int(), ctypes.c_int()
    u8p = ctypes.POINTER(ctypes.c_uint8)
    up, vp = u8p(), u8p()
    stride, uv_stride = ctypes.c_int(), ctypes.c_int()
    y = lib.WebPDecodeYUV(
        data, len(data), ctypes.byref(w), ctypes.byref(h),
        ctypes.byref(up), ctypes.byref(vp),
        ctypes.byref(stride), ctypes.byref(uv_stride),
    )
    if not y:
        raise ValueError("libwebp failed to decode (YUV)")
    try:
        rows = []
        for r in range(h.value):
            rows.append(ctypes.string_at(
                ctypes.addressof(y.contents) + r * stride.value, w.value
            ))
    finally:
        lib.WebPFree(ctypes.cast(y, ctypes.c_void_p))
    return w.value, h.value, b"".join(rows)


def encode_lossy_rgb(lib, w: int, h: int, rgb: bytes, quality: float) -> bytes:
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = lib.WebPEncodeRGB(rgb, w, h, 3 * w, quality, ctypes.byref(out))
    if not n:
        raise ValueError("libwebp failed to encode")
    try:
        return ctypes.string_at(out, n)
    finally:
        lib.WebPFree(ctypes.cast(out, ctypes.c_void_p))


def encode_lossless_rgb(lib, w: int, h: int, rgb: bytes) -> bytes:
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = lib.WebPEncodeLosslessRGB(rgb, w, h, 3 * w, ctypes.byref(out))
    if not n:
        raise ValueError("libwebp failed to encode")
    try:
        return ctypes.string_at(out, n)
    finally:
        lib.WebPFree(ctypes.cast(out, ctypes.c_void_p))
