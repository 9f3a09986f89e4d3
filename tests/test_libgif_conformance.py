"""Conformance of the vendored GIF codec (functions/gif.py) against the
SYSTEM giflib (DGif* decode API via a read callback — test oracle
only). Our encoder's streams (variable-width LZW with deferred clear,
global palettes) must slurp byte-exact under the reference decoder."""

from __future__ import annotations

import ctypes
import ctypes.util

import pytest

_PATHS = [
    "/usr/lib/x86_64-linux-gnu/libgif.so.7",
    "libgif.so.7",
    ctypes.util.find_library("gif") or "",
]

GifWord = ctypes.c_int


class _GifColorType(ctypes.Structure):
    _fields_ = [("Red", ctypes.c_ubyte), ("Green", ctypes.c_ubyte),
                ("Blue", ctypes.c_ubyte)]


class _ColorMapObject(ctypes.Structure):
    _fields_ = [
        ("ColorCount", ctypes.c_int),
        ("BitsPerPixel", ctypes.c_int),
        ("SortFlag", ctypes.c_bool),
        ("Colors", ctypes.POINTER(_GifColorType)),
    ]


class _GifImageDesc(ctypes.Structure):
    _fields_ = [
        ("Left", GifWord), ("Top", GifWord),
        ("Width", GifWord), ("Height", GifWord),
        ("Interlace", ctypes.c_bool),
        ("ColorMap", ctypes.POINTER(_ColorMapObject)),
    ]


class _SavedImage(ctypes.Structure):
    _fields_ = [
        ("ImageDesc", _GifImageDesc),
        ("RasterBits", ctypes.POINTER(ctypes.c_ubyte)),
        ("ExtensionBlockCount", ctypes.c_int),
        ("ExtensionBlocks", ctypes.c_void_p),
    ]


class _GifFileType(ctypes.Structure):
    _fields_ = [
        ("SWidth", GifWord), ("SHeight", GifWord),
        ("SColorResolution", GifWord), ("SBackGroundColor", GifWord),
        ("AspectByte", ctypes.c_ubyte),
        ("SColorMap", ctypes.POINTER(_ColorMapObject)),
        ("ImageCount", ctypes.c_int),
        ("Image", _GifImageDesc),
        ("SavedImages", ctypes.POINTER(_SavedImage)),
        ("ExtensionBlockCount", ctypes.c_int),
        ("ExtensionBlocks", ctypes.c_void_p),
        ("Error", ctypes.c_int),
        ("UserData", ctypes.c_void_p),
        ("Private", ctypes.c_void_p),
    ]


_READ_FN = ctypes.CFUNCTYPE(
    ctypes.c_int, ctypes.POINTER(_GifFileType),
    ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int,
)


def _load():
    for p in _PATHS:
        if not p:
            continue
        try:
            lib = ctypes.CDLL(p)
        except OSError:
            continue
        lib.DGifOpen.restype = ctypes.POINTER(_GifFileType)
        lib.DGifOpen.argtypes = [
            ctypes.c_void_p, _READ_FN, ctypes.POINTER(ctypes.c_int)
        ]
        lib.DGifSlurp.restype = ctypes.c_int
        lib.DGifSlurp.argtypes = [ctypes.POINTER(_GifFileType)]
        lib.DGifCloseFile.restype = ctypes.c_int
        lib.DGifCloseFile.argtypes = [
            ctypes.POINTER(_GifFileType), ctypes.POINTER(ctypes.c_int)
        ]
        return lib
    return None


LIB = _load()
pytestmark = pytest.mark.skipif(LIB is None, reason="system giflib absent")


def gif_slurp(data: bytes):
    """(width, height, index_bytes, palette[(r,g,b)]) of frame 0 via
    the reference decoder."""
    state = {"pos": 0}

    @_READ_FN
    def read_fn(_gif, buf, count):
        n = min(count, len(data) - state["pos"])
        if n > 0:
            ctypes.memmove(buf, data[state["pos"]:state["pos"] + n], n)
            state["pos"] += n
        return n

    err = ctypes.c_int(0)
    gf = LIB.DGifOpen(None, read_fn, ctypes.byref(err))
    if not gf:
        raise ValueError(f"giflib open error {err.value}")
    try:
        if LIB.DGifSlurp(gf) != 1:
            raise ValueError(f"giflib slurp error {gf.contents.Error}")
        g = gf.contents
        assert g.ImageCount >= 1
        img = g.SavedImages[0]
        w, h = img.ImageDesc.Width, img.ImageDesc.Height
        idx = bytes(
            ctypes.cast(
                img.RasterBits, ctypes.POINTER(ctypes.c_ubyte * (w * h))
            ).contents
        )
        cm = (
            img.ImageDesc.ColorMap if img.ImageDesc.ColorMap
            else g.SColorMap
        )
        pal = [
            (cm.contents.Colors[i].Red, cm.contents.Colors[i].Green,
             cm.contents.Colors[i].Blue)
            for i in range(cm.contents.ColorCount)
        ]
        return w, h, idx, pal
    finally:
        LIB.DGifCloseFile(gf, ctypes.byref(err))


def test_encode_gif_slurps_exactly_under_giflib():
    """Index stream AND palette byte-exact under the reference decoder
    — including the >4096-entry dictionary growth / deferred-clear
    stream the 80x70 case produces."""
    from embulk_spark.functions.gif import encode_gif

    for w, h, idx_fn in [
        (13, 9, lambda x, y: (x * 31 + y * 17) % 256),
        (80, 70, lambda x, y: (x * x + 3 * y) % 256),
        (1, 1, lambda x, y: 5),
    ]:
        pal = bytes(
            (j * 7 + k * 3) % 256 for j in range(256) for k in (0, 1, 2)
        )
        data = encode_gif(w, h, pal, idx_fn)
        gw, gh, idx, gpal = gif_slurp(data)
        assert (gw, gh) == (w, h)
        want_idx = bytes(idx_fn(x, y) for y in range(h) for x in range(w))
        assert idx == want_idx, (w, h)
        assert gpal == [
            tuple(pal[3 * i:3 * i + 3]) for i in range(256)
        ]


def test_vendored_gif_decoder_matches_giflib_on_same_stream():
    """Both decoders read the same fixture stream: our (w, h, mean)
    must equal the mean giflib's slurped indices imply."""
    from embulk_spark.functions.gif import decode_gif, synth_gif_bytes

    for doc_id in (0, 3, 17, 255, 1023):
        data = synth_gif_bytes(doc_id)
        w, h, idx, pal = gif_slurp(data)
        want = sum(sum(pal[i]) for i in idx) / (3.0 * w * h)
        gw, gh, mean = decode_gif(data)
        assert (gw, gh) == (w, h)
        assert abs(mean - want) < 1e-9, doc_id


def test_interlaced_gif_mean_matches_giflib():
    """Interlace only permutes row order; the LZW stream carries every
    pixel once, so the (w, h, mean) decode is identical — validated by
    summing giflib's slurped indices of the same interlaced stream."""
    from embulk_spark.functions.gif import decode_gif, encode_gif

    w, h = 16, 12
    pal = bytes((i * 3) % 256 for i in range(256) for _ in range(3))
    data = bytearray(encode_gif(w, h, pal, lambda x, y: (x + 2 * y) % 256))
    # image descriptor: 13-byte header + 768 GCT; flag byte at +9
    data[13 + 768 + 9] |= 0x40  # set interlace flag
    data = bytes(data)
    gw, gh, idx, gpal = gif_slurp(data)
    assert (gw, gh) == (w, h)
    want = sum(sum(gpal[i]) for i in idx) / (3.0 * w * h)
    dw, dh, mean = decode_gif(data)
    assert (dw, dh) == (w, h)
    assert abs(mean - want) < 1e-9
