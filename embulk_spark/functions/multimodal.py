"""Multimodal (image/audio/video) columns for training-data pipelines.

Media payloads are opaque ``BinaryType`` columns plus a typed metadata
struct — the same modeling choice as the north-rule input's ``html:binary``
and Embulk's raw-bytes ``Buffer`` layer (reference
embulk-core/src/main/java/org/embulk/spi/BufferImpl.java): bytes stay
JVM-side, typed fields are first-class columns.

Two layers:

- **Container sniffing** (``modality_of``/``media_meta_cols``): pure
  JVM-side magic-byte dispatch over the binary column — no Python at all,
  codegen-friendly, and expressible 1:1 in ANSI SQL for the DuckDB oracle
  (``left(hex(b), n)`` prefix matching). The analogue of Embulk's
  compression-guess-by-magic (embulk-guess-gzip/-bzip2, reference
  build.gradle:20,23, decoder-diff merge exec/GuessExecutor.java:265-278).
- **Decode / feature-extract / resize / frame-sample**
  (``decode_image_features``, ``resize_images``, ``sample_frames``): real
  Spark plumbing — explicit output schemas, ``mapInPandas`` with
  Arrow-batched pandas iterators, one Python invocation per batch. The
  actual codec call is isolated in ``_decode_backend``: BMP, PNG,
  baseline AND progressive AND sequential-arithmetic (SOF9) JPEG, GIF,
  and BOTH WebP flavors (lossless VP8L + lossy VP8 key frames) decode
  for REAL via vendored spec re-implementations (``decode_bmp24`` /
  ``decode_png`` / ``functions/jpeg.py`` + ``jpeg_arith.py`` /
  ``functions/gif.py`` / ``functions/vp8l.py`` + ``vp8.py`` — the
  containers covering the overwhelming majority of web images); when a
  real decoder library (PIL) is importable it covers the rest; in this
  container it is not, so the remaining profiles (AVIF,
  hierarchical JPEG, VP8 interframes)
  take a clearly-marked DETERMINISTIC FAKE (pure function of the
  bytes: stable across partitioning/retries, so tests and exactly-once
  replay semantics hold). Swapping backends changes no schema, no
  partitioning, no batch shape.

At 100 TB scale the plumbing is the part that matters: media bytes never
hit the driver, flow Arrow-batched through Python only in the decode
stage, and metadata predicates (modality/n_bytes) are plain columns that
Catalyst pushes down to the parquet scan before any decode happens —
filter-then-decode, never decode-then-filter.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# container sniffing (JVM-side, oracle-expressible)
# ---------------------------------------------------------------------------

#: magic-byte prefixes (hex, uppercase) → (container, modality).
#: Ordered: longer / more specific prefixes first.
MAGIC_PREFIXES: list[tuple[str, str, str]] = [
    ("89504E470D0A1A0A", "png", "image"),
    ("FFD8FF", "jpeg", "image"),
    ("474946383761", "gif", "image"),
    ("474946383961", "gif", "image"),
    ("52494646", "riff", "audio"),  # WAV/AVI share RIFF; WAVE tag refines
    ("494433", "mp3", "audio"),
    ("664C6143", "flac", "audio"),
    ("1A45DFA3", "mkv", "video"),
    ("000001BA", "mpeg", "video"),
]

#: MP4: 'ftyp' at byte offset 5 (bytes 5-8), not a fixed prefix.
_FTYP_HEX = "66747970"

# 'BM' — uncompressed Windows bitmap; the one container with a REAL
# vendored decoder below (pure python/struct, no codec library needed)
MAGIC_PREFIXES.append(("424D", "bmp", "image"))


#: RIFF refinement: bytes 9-12 'WEBP' (hex chars 17-24) → image, not the
#: generic RIFF/audio bucket. Same trick as the 'ftyp' offset match.
_WEBP_HEX = "57454250"

#: ftyp-brand refinement: bytes 8-11 'avif'/'avis' → an AVIF image
#: sequence in an ISOBMFF wrapper, not generic mp4/video
_AVIF_BRAND_HEX = ("61766966", "61766973")


def modality_of(b: Column) -> Column:
    """Container + modality from magic bytes; NULL input → NULL,
    unrecognized → ('bin', 'unknown'). Returns a 2-field struct column."""
    h = F.hex(b)
    expr = F.when(b.isNull(), F.lit(None).cast("struct<container:string,modality:string>"))
    expr = expr.when(
        (F.substring(h, 1, 8) == "52494646")
        & (F.substring(h, 17, 8) == _WEBP_HEX),
        F.struct(
            F.lit("webp").alias("container"), F.lit("image").alias("modality")
        ),
    )
    for prefix, container, modality in MAGIC_PREFIXES:
        expr = expr.when(
            F.substring(h, 1, len(prefix)) == prefix,
            F.struct(F.lit(container).alias("container"), F.lit(modality).alias("modality")),
        )
    expr = expr.when(
        (F.substring(h, 9, 8) == _FTYP_HEX)
        & (F.substring(h, 17, 8).isin(*_AVIF_BRAND_HEX)),
        F.struct(
            F.lit("avif").alias("container"), F.lit("image").alias("modality")
        ),
    )
    expr = expr.when(
        F.substring(h, 9, 8) == _FTYP_HEX,
        F.struct(F.lit("mp4").alias("container"), F.lit("video").alias("modality")),
    )
    return expr.otherwise(
        F.struct(F.lit("bin").alias("container"), F.lit("unknown").alias("modality"))
    )


def media_meta_cols(b: Column) -> list[Column]:
    """Typed metadata columns for a binary media column: container,
    modality, byte length, magic prefix (hex). All JVM-side."""
    m = modality_of(b)
    return [
        m["container"].alias("container"),
        m["modality"].alias("modality"),
        F.octet_length(b).alias("n_bytes"),
        F.substring(F.hex(b), 1, 16).alias("magic_hex"),
    ]


# ---------------------------------------------------------------------------
# real codec: uncompressed 24-bpp BMP (vendored, stdlib-only)
# ---------------------------------------------------------------------------

def encode_bmp24(width: int, height: int, pixel) -> bytes:
    """Build an uncompressed 24-bpp BMP (BITMAPINFOHEADER, bottom-up BGR
    rows padded to 4 bytes). ``pixel(x, y) -> (r, g, b)``."""
    import struct

    row_stride = (3 * width + 3) // 4 * 4
    img_size = row_stride * height
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + img_size, 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    rows = bytearray()
    for y in range(height - 1, -1, -1):  # bottom-up
        for x in range(width):
            r, g, b = pixel(x, y)
            rows += bytes((b & 0xFF, g & 0xFF, r & 0xFF))
        rows += b"\x00" * (row_stride - 3 * width)
    return header + bytes(rows)


def decode_bmp24(data: bytes) -> tuple[int, int, float]:
    """REAL decode of an uncompressed 24-bpp BMP: parse the header, walk
    the padded pixel rows (bottom-up or top-down), return
    (width, height, mean over all channel bytes). Raises ValueError on
    anything that isn't a plain 24-bpp uncompressed bitmap."""
    import struct

    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP")
    pixel_off = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    if hdr_size < 40:
        raise ValueError("unsupported BMP header (core header)")
    width, height_raw = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    compression = struct.unpack_from("<I", data, 30)[0]
    if planes != 1 or bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (planes={planes} bpp={bpp} comp={compression})")
    height = abs(height_raw)
    if width <= 0 or height == 0:
        raise ValueError("bad BMP dimensions")
    row_stride = (3 * width + 3) // 4 * 4
    if pixel_off + row_stride * height > len(data):
        raise ValueError("truncated BMP pixel data")
    total = 0
    for y in range(height):
        row_start = pixel_off + y * row_stride
        row = data[row_start : row_start + 3 * width]
        total += sum(row)
    # channel order doesn't matter for the overall mean; exact integer sum
    # then ONE double division → bit-identical across engines
    return width, height, total / (3.0 * width * height)


def decode_bmp24_pixels(data: bytes):
    """Full-fidelity BMP decode: (width, height, top-down rows of
    (r, g, b)) — the pixel source for the REAL resize path."""
    import struct

    w, h, _mean = decode_bmp24(data)  # header validation
    pixel_off = struct.unpack_from("<I", data, 10)[0]
    height_raw = struct.unpack_from("<i", data, 22)[0]
    row_stride = (3 * w + 3) // 4 * 4
    rows = []
    for y in range(h):
        src_y = y if height_raw < 0 else h - 1 - y  # bottom-up default
        row_start = pixel_off + src_y * row_stride
        row = [
            (
                data[row_start + 3 * x + 2],
                data[row_start + 3 * x + 1],
                data[row_start + 3 * x],
            )
            for x in range(w)
        ]
        rows.append(row)
    return w, h, rows


def resize_bmp24_nearest(data: bytes, out_w: int, out_h: int) -> bytes:
    """REAL aspect-box resize of a 24-bpp BMP: nearest-neighbor with
    the INTEGER source map src = (dst * src_dim) // dst_dim — exact,
    engine-portable arithmetic (no float scale factors), re-encoded as
    a real BMP."""
    w, h, rows = decode_bmp24_pixels(data)
    return encode_bmp24(
        out_w, out_h,
        lambda x, y: rows[(y * h) // out_h][(x * w) // out_w],
    )


def synth_bmp_dims(doc_id: int) -> tuple[int, int]:
    return 4 + doc_id % 13, 4 + (doc_id * 7) % 11


def synth_bmp_bytes(doc_id: int) -> bytes:
    """Deterministic real BMP for a doc id: dims and a linear pixel ramp
    that are pure arithmetic in doc_id, so a SQL oracle recomputes the
    decoded features without re-encoding the binary."""
    w, h = synth_bmp_dims(doc_id)
    return encode_bmp24(
        w,
        h,
        lambda x, y: (
            (x + y + doc_id) % 256,
            (x + 2 * y + 2 * doc_id) % 256,
            (3 * x + y + 5 * doc_id) % 256,
        ),
    )


def synth_bmp_col(id_col: Column) -> Column:
    """Arrow-batched synth of real BMP bytes (fixture source for the real
    decode path)."""

    @F.pandas_udf(T.BinaryType())
    def _mk(ids: pd.Series) -> pd.Series:
        return ids.map(lambda i: synth_bmp_bytes(int(i)))

    return _mk(id_col)


# ---------------------------------------------------------------------------
# real codec: PNG (vendored, stdlib zlib only)
# ---------------------------------------------------------------------------

#: PNG color type → channels per pixel (bit depth 8 only; palette (3) is
#: out of scope for the vendored tier — it decodes via the fake backend
#: like every other unsupported container).
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int, pixel, color_type: int = 2,
               depth: int = 8) -> bytes:
    """Build a real PNG (8- or 16-bit, non-interlaced, all rows filter
    0, one zlib IDAT). ``pixel(x, y)`` returns a tuple with
    ``_PNG_CHANNELS[color_type]`` components (16-bit values when
    ``depth`` is 16, written big-endian per the spec)."""
    import struct
    import zlib

    ch = _PNG_CHANNELS[color_type]
    ihdr = struct.pack(">IIBBBBB", width, height, depth, color_type, 0, 0, 0)
    raw = bytearray()
    for y in range(height):
        raw.append(0)  # filter type None
        for x in range(width):
            px = pixel(x, y)
            vals = px if isinstance(px, tuple) else (px,)
            if depth == 16:
                for v in vals:
                    raw += struct.pack(">H", v & 0xFFFF)
            else:
                raw += bytes(v & 0xFF for v in vals)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _png_chunk(b"IEND", b"")
    )


#: Adam7 interlace pass geometry: (x0, y0, dx, dy)
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png_unfilter_sum(raw, off, w_px, n_rows, ch, pal_sums, depth=8):
    """Unfilter ``n_rows`` scanlines of ``w_px`` pixels starting at
    byte ``off`` of the inflated stream (full 5-filter set: None / Sub /
    Up / Average / Paeth); returns (next_offset, value_sum). With
    ``pal_sums`` the bytes are palette/gray sample values and each
    contributes its precomputed weight; else every channel byte
    contributes itself. ``depth`` < 8 (1/2/4-bit gray or palette,
    single channel): pixels pack MSB-first into bytes, scanlines
    byte-padded, and the filters' "corresponding byte" distance is ONE
    BYTE (bpp rounds up to 1 per the spec). ``depth`` == 16: samples
    are big-endian byte PAIRS, the filters still operate bytewise with
    a TWO-bytes-per-sample distance, and the sum is over the 16-bit
    sample VALUES (the caller scales by 1/257)."""
    import numpy as np

    if depth == 8:
        bpp = ch
        stride = w_px * ch
    elif depth == 16:
        bpp = ch * 2
        stride = w_px * bpp
    else:
        stride = (w_px * depth + 7) // 8
        bpp = 1  # filter byte-distance for sub-byte depths
    prev = np.zeros(stride, dtype=np.uint8)
    total = 0
    for _y in range(n_rows):
        if off + 1 + stride > len(raw):
            raise ValueError("PNG pixel data length mismatch")
        f = raw[off]
        cur = raw[off + 1:off + 1 + stride].copy()
        off += 1 + stride
        if f == 0:
            pass
        elif f == 1:  # Sub: per-lane cumulative sum, uint8 wrap
            for lane in range(bpp):
                np.add.accumulate(cur[lane::bpp], out=cur[lane::bpp])
        elif f == 2:  # Up
            cur += prev
        elif f == 3:  # Average (sequential left-dependency per lane)
            for i in range(stride):
                left = int(cur[i - bpp]) if i >= bpp else 0
                cur[i] = (int(cur[i]) + (left + int(prev[i])) // 2) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = int(cur[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (int(cur[i]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {f}")
        if depth == 16:
            total += int(
                (cur[0::2].astype(np.int64) * 256
                 + cur[1::2].astype(np.int64)).sum()
            )
        elif depth != 8:
            # unpack MSB-first sub-byte samples, dropping row padding
            bits = np.unpackbits(cur)
            n = w_px * depth
            vals = bits[:n].reshape(w_px, depth)
            weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.int64)
            samples = vals @ weights
            total += int(pal_sums[samples].sum(dtype=np.int64))
        elif pal_sums is not None:
            total += int(pal_sums[cur].sum(dtype=np.int64))
        else:
            total += int(cur.sum(dtype=np.int64))
        prev = cur
    return off, total


def decode_png(data: bytes) -> tuple[int, int, float]:
    """REAL decode of a PNG: gray / RGB / gray+alpha / RGBA at 8 AND
    16 bits (16-bit big-endian samples, filters bytewise at the
    2-bytes-per-sample distance, values scaled to the 0..255 range by
    exactly 1/257), PALETTE (PLTE lookup, indices expand to RGB) and
    1/2/4-bit gray/palette, non-interlaced AND Adam7-interlaced (each
    of the 7 passes unfiltered on its own geometry; the feature stat
    needs only the value SUM, and every pixel belongs to exactly one
    pass, so passes sum without spatial reassembly). Chunk walk, zlib
    inflate across split IDATs, full 5-filter unfilter, then (width,
    height, mean over all channel samples — palette means the expanded
    R,G,B). Exact integer sum with ONE double division. Raises
    ValueError outside the profile (16-bit palette is not a legal PNG;
    nothing real remains outside)."""
    import struct
    import zlib

    import numpy as np

    if len(data) < 8 or data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, width = 8, None
    idat = bytearray()
    plte = None
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated PNG chunk")
        if tag == b"IHDR":
            width, height, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            ok = (
                (depth == 8 and (ctype in _PNG_CHANNELS or ctype == 3))
                or (depth in (1, 2, 4) and ctype in (0, 3))
                or (depth == 16 and ctype in _PNG_CHANNELS)
            )
            if not ok:
                raise ValueError(f"unsupported PNG (depth={depth} color={ctype})")
            if comp != 0 or filt != 0 or interlace not in (0, 1):
                raise ValueError("unsupported PNG (compression/filter)")
        elif tag == b"PLTE":
            if length % 3:
                raise ValueError("bad PLTE length")
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    pal_sums = None
    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        # pad to 256 so any index is addressable (out-of-range indices
        # are invalid per spec; render as 0 rather than raising)
        pal_sums = np.zeros(256, dtype=np.int64)
        sums = plte.sum(axis=1, dtype=np.int64)
        pal_sums[: len(sums)] = sums
        ch = 1
        denom = 3.0
    elif depth == 16:  # 16-bit samples scale to 0..255 by exactly 1/257
        ch = _PNG_CHANNELS[ctype]
        denom = ch * 257.0
    elif depth != 8:  # sub-byte GRAYSCALE: samples scale to 0..255
        # (left-bit-replication per the spec: v * 255 / (2^d - 1))
        pal_sums = (
            np.arange(1 << depth, dtype=np.int64) * 255 // ((1 << depth) - 1)
        )
        ch = 1
        denom = 1.0
    else:
        ch = _PNG_CHANNELS[ctype]
        denom = float(ch)
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    total = 0
    off = 0
    if interlace == 0:
        off, total = _png_unfilter_sum(
            raw, 0, width, height, ch, pal_sums, depth
        )
    else:  # Adam7
        for x0, y0, dx, dy in _ADAM7:
            pw = (width - x0 + dx - 1) // dx
            ph = (height - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue  # empty pass: no scanlines at all
            off, t = _png_unfilter_sum(
                raw, off, pw, ph, ch, pal_sums, depth
            )
            total += t
    if off != len(raw):
        raise ValueError("PNG pixel data length mismatch")
    return int(width), int(height), total / (denom * width * height)


def synth_png_dims(doc_id: int) -> tuple[int, int]:
    return 3 + doc_id % 14, 3 + (doc_id * 5) % 12


def synth_png_bytes(doc_id: int) -> bytes:
    """Deterministic real PNG for a doc id: dims and a linear RGB ramp
    that are pure arithmetic in doc_id, so a SQL oracle recomputes the
    decoded features without re-encoding the binary (the PNG sibling of
    synth_bmp_bytes — same contract, different container)."""
    w, h = synth_png_dims(doc_id)
    return encode_png(
        w,
        h,
        lambda x, y: (
            (2 * x + y + doc_id) % 256,
            (x + 3 * y + 4 * doc_id) % 256,
            (x + y + 7 * doc_id) % 256,
        ),
    )


def synth_png_col(id_col: Column) -> Column:
    """Arrow-batched synth of real PNG bytes (fixture source for the real
    decode path)."""

    @F.pandas_udf(T.BinaryType())
    def _mk(ids: pd.Series) -> pd.Series:
        return ids.map(lambda i: synth_png_bytes(int(i)))

    return _mk(id_col)


def synth_gif_col(id_col: Column) -> Column:
    """Arrow-batched synth of real GIF bytes (fixture source for the
    vendored LZW decoder, functions/gif.py)."""
    from .gif import synth_gif_bytes

    @F.pandas_udf(T.BinaryType())
    def _mk(ids: pd.Series) -> pd.Series:
        return ids.map(lambda i: synth_gif_bytes(int(i)))

    return _mk(id_col)


def synth_webp_col(id_col: Column) -> Column:
    """Arrow-batched synth of real lossless-WebP bytes (fixture source
    for the vendored VP8L decoder, functions/vp8l.py)."""
    from .vp8l import synth_webp_bytes

    @F.pandas_udf(T.BinaryType())
    def _mk(ids: pd.Series) -> pd.Series:
        return ids.map(lambda i: synth_webp_bytes(int(i)))

    return _mk(id_col)


def synth_vp8_col(id_col: Column) -> Column:
    """Arrow-batched synth of real LOSSY-WebP (VP8 key frame) bytes
    (fixture source for the vendored VP8 decoder, functions/vp8.py)."""
    from .vp8 import synth_vp8_bytes

    @F.pandas_udf(T.BinaryType())
    def _mk(ids: pd.Series) -> pd.Series:
        return ids.map(lambda i: synth_vp8_bytes(int(i)))

    return _mk(id_col)


def synth_jpeg_col(id_col: Column) -> Column:
    """Arrow-batched synth of real baseline JPEG bytes (fixture source
    for the vendored JPEG decoder, functions/jpeg.py): block-constant
    grayscale images whose lossy round trip is closed-form, so the SQL
    oracle recomputes the decoded features arithmetically."""
    from .jpeg import synth_jpeg_bytes

    @F.pandas_udf(T.BinaryType())
    def _mk(ids: pd.Series) -> pd.Series:
        return ids.map(lambda i: synth_jpeg_bytes(int(i)))

    return _mk(id_col)


def synth_jpeg_progressive_col(id_col: Column) -> Column:
    """Arrow-batched synth of real PROGRESSIVE JPEG bytes (SOF2 —
    Annex-G scans; same closed-form pixels as synth_jpeg_col)."""
    from .jpeg import synth_jpeg_progressive_bytes

    @F.pandas_udf(T.BinaryType())
    def _mk(ids: pd.Series) -> pd.Series:
        return ids.map(lambda i: synth_jpeg_progressive_bytes(int(i)))

    return _mk(id_col)


def synth_jpeg_arith_col(id_col: Column) -> Column:
    """Arrow-batched synth of real ARITHMETIC-coded JPEG bytes (SOF9 —
    T.81 Annex D QM coder; same closed-form pixels as
    synth_jpeg_col)."""
    from .jpeg_arith import synth_jpeg_arith_bytes

    @F.pandas_udf(T.BinaryType())
    def _mk(ids: pd.Series) -> pd.Series:
        return ids.map(lambda i: synth_jpeg_arith_bytes(int(i)))

    return _mk(id_col)


def synth_jpeg_lossless_col(id_col: Column) -> Column:
    """Arrow-batched synth of real LOSSLESS JPEG bytes (SOF3 — T.81
    Annex H predictive coding; decode reproduces the pixel function
    EXACTLY, so the oracle is a plain pixel mean)."""
    from .jpeg import synth_jpeg_lossless_bytes

    @F.pandas_udf(T.BinaryType())
    def _mk(ids: pd.Series) -> pd.Series:
        return ids.map(lambda i: synth_jpeg_lossless_bytes(int(i)))

    return _mk(id_col)


def synth_avif_bytes(doc_id: int) -> bytes:
    """Deterministic minimal AVIF skeleton: ftyp(avif) + meta(hdlr
    'pict' + iprp/ipco/ispe with arithmetic dims) + a small mdat. The
    ispe extent is what parse_avif_dims must recover; dims are pure
    arithmetic in doc_id so the oracle needs no parser."""
    import struct

    w = 16 + (doc_id * 37) % 2048
    h = 16 + (doc_id * 53) % 1536

    def box(typ: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + typ + payload

    ftyp = box(b"ftyp", b"avif" + struct.pack(">I", 0) + b"avifmif1")
    hdlr = box(b"hdlr", b"\x00\x00\x00\x00" + b"\x00" * 4 + b"pict"
               + b"\x00" * 12 + b"\x00")
    ispe = box(b"ispe", b"\x00\x00\x00\x00" + struct.pack(">II", w, h))
    ipco = box(b"ipco", ispe)
    iprp = box(b"iprp", ipco)
    meta = box(b"meta", b"\x00\x00\x00\x00" + hdlr + iprp)
    mdat = box(b"mdat", bytes([doc_id % 256]) * 8)
    return ftyp + meta + mdat


def synth_avif_col(id_col: Column) -> Column:
    """Arrow-batched synth of minimal real AVIF containers (fixture
    source for the ISOBMFF metadata tier, parse_avif_dims)."""

    @F.pandas_udf(T.BinaryType())
    def _mk(ids: pd.Series) -> pd.Series:
        return ids.map(lambda i: synth_avif_bytes(int(i)))

    return _mk(id_col)


def synth_jpeg_12bit_col(id_col: Column) -> Column:
    """Arrow-batched synth of real 12-BIT extended-sequential JPEG
    bytes (SOF1 — level shift 2048, closed-form block-constant decode
    scaled by 255/4095)."""
    from .jpeg import synth_jpeg_12bit_bytes

    @F.pandas_udf(T.BinaryType())
    def _mk(ids: pd.Series) -> pd.Series:
        return ids.map(lambda i: synth_jpeg_12bit_bytes(int(i)))

    return _mk(id_col)


def synth_jpeg_prog_arith_col(id_col: Column) -> Column:
    """Arrow-batched synth of real PROGRESSIVE-arithmetic JPEG bytes
    (SOF10 — G.2 successive-approximation scans over the QM coder;
    same closed-form pixels as synth_jpeg_col)."""
    from .jpeg_arith import synth_jpeg_prog_arith_bytes

    @F.pandas_udf(T.BinaryType())
    def _mk(ids: pd.Series) -> pd.Series:
        return ids.map(lambda i: synth_jpeg_prog_arith_bytes(int(i)))

    return _mk(id_col)


# ---------------------------------------------------------------------------
# decode backend (stub boundary)
# ---------------------------------------------------------------------------

try:  # pragma: no cover - not installed in this container
    from PIL import Image as _PIL_Image  # type: ignore

    HAVE_PIL = True
except ImportError:
    _PIL_Image = None
    HAVE_PIL = False


def _fake_image_decode(b: bytes) -> tuple[int, int, float]:
    """DETERMINISTIC FAKE decode: (width, height, mean_luma) as a pure
    function of the bytes. Stands in for the real codec so the Spark-side
    plumbing (schema, batching, partitioning) is fully exercised; replace
    via ``_decode_backend`` when a codec library is present.

    Digest is over the UPPERCASE HEX of the bytes (ASCII-safe), so a SQL
    oracle can recompute it exactly as md5(hex(blob)) — DuckDB's md5 only
    accepts VARCHAR."""
    d = hashlib.md5(b.hex().upper().encode()).digest()
    width = 16 + int.from_bytes(d[0:2], "big") % 4080
    height = 16 + int.from_bytes(d[2:4], "big") % 4080
    mean_luma = int.from_bytes(d[4:6], "big") / 65535.0 * 255.0
    return width, height, round(mean_luma, 4)


def parse_avif_dims(b: bytes) -> tuple[int, int] | None:
    """REAL ISOBMFF box walk for an AVIF still: meta → iprp → ipco →
    ispe (ISO 14496-12 box grammar: 32-bit size + fourcc, size 1 =
    64-bit largesize, size 0 = to-end; 'meta' is a FullBox, so its
    children start after a 4-byte version/flags). Returns the image
    spatial extent, or None when the structure is absent/malformed —
    the metadata tier is real even though AV1 pixel decode is not."""

    def walk(start: int, end: int, path: list[bytes]):
        pos = start
        while pos + 8 <= end:
            size = int.from_bytes(b[pos:pos + 4], "big")
            typ = b[pos + 4:pos + 8]
            hdr = 8
            if size == 1:
                if pos + 16 > end:
                    return None
                size = int.from_bytes(b[pos + 8:pos + 16], "big")
                hdr = 16
            elif size == 0:
                size = end - pos
            if size < hdr or pos + size > end:
                return None
            if typ == path[0]:
                body = pos + hdr + (4 if typ == b"meta" else 0)
                if len(path) == 1:
                    return (body, pos + size)
                found = walk(body, pos + size, path[1:])
                if found:
                    return found
            pos += size
        return None

    span = walk(0, len(b), [b"meta", b"iprp", b"ipco", b"ispe"])
    if span is None:
        return None
    s, e = span
    if e - s < 12:  # version/flags + width + height
        return None
    w = int.from_bytes(b[s + 4:s + 8], "big")
    h = int.from_bytes(b[s + 8:s + 12], "big")
    return (w, h) if w and h else None


def _decode_backend(b: bytes) -> tuple[int, int, float | None]:
    if len(b) >= 12 and b[4:8] == b"ftyp" and b[8:12] in (b"avif", b"avis"):
        dims = parse_avif_dims(b)
        if dims is not None:
            # metadata tier REAL (ispe box), pixel tier undecoded:
            # mean_luma is NULL, never a fake number posing as real
            return dims[0], dims[1], None
        return _fake_image_decode(b)  # avif-magic synthetic bytes
    if b[:2] == b"BM":
        # vendored real codec — no library needed
        return decode_bmp24(b)
    if b[:8] == _PNG_SIG:
        try:
            return decode_png(b)
        except ValueError:
            # malformed streams or PNG-magic synthetic bytes: fall to
            # the deterministic fake tier (every legal PNG profile —
            # 1/2/4/8/16-bit, palette, Adam7 — decodes for real)
            pass
    if b[:2] == b"\xFF\xD8":
        try:
            # vendored real decoder (functions/jpeg.py + jpeg_arith.py):
            # the COMPLETE 8-bit DCT family — baseline (SOF0/1),
            # progressive (SOF2, Annex G), sequential- and progressive-
            # arithmetic (SOF9/SOF10, Annex-D QM coder) — plus LOSSLESS
            # (SOF3, Annex-H predictive): entropy decode + dequant +
            # IDCT (or exact prediction), grayscale/YCbCr, subsampling,
            # restarts
            from .jpeg import decode_jpeg

            return decode_jpeg(b)
        except ValueError:
            # hierarchical / JPEG-magic synthetic bytes: fake tier,
            # same policy as the PNG profile boundary
            pass
    if b[:6] in (b"GIF87a", b"GIF89a"):
        try:
            # vendored real decoder (functions/gif.py): full LZW,
            # global/local palettes, extension skip; first frame
            from .gif import decode_gif

            return decode_gif(b)
        except ValueError:
            # interlaced / GIF-magic synthetic bytes: fake tier
            pass
    if b[:4] == b"RIFF" and b[8:12] == b"WEBP":
        try:
            # vendored real VP8L decoder (functions/vp8l.py): prefix
            # codes, color cache, LZ77 — untransformed lossless profile
            from .vp8l import decode_webp

            return decode_webp(b)
        except ValueError:
            # VP8X / interframe / malformed streams: fake tier (lossy
            # VP8 key frames and all four VP8L transforms are REAL as
            # of round 5 — vp8.py / vp8l.py)
            pass
    if not HAVE_PIL:
        # AVIF / non-DCT JPEG: no vendored codec — fake tier
        return _fake_image_decode(b)
    raise NotImplementedError(  # pragma: no cover
        "real PIL decode path: Image.open(io.BytesIO(b)) → size + mean luma; "
        "enable once a codec library is vendored"
    )


# ---------------------------------------------------------------------------
# decode / feature-extract (mapInPandas — Arrow-batched)
# ---------------------------------------------------------------------------

IMAGE_FEATURES_DDL = (
    "id BIGINT, container STRING, width INT, height INT, "
    "mean_luma DOUBLE, n_bytes BIGINT"
)


def decode_image_features(
    df: DataFrame, id_col: str = "id", bin_col: str = "media"
) -> DataFrame:
    """Decode image binaries → feature rows. Pre-filters to image modality
    JVM-side (pushdown-friendly) so Python only ever sees decodable rows."""
    imgs = df.select(
        F.col(id_col).alias("id"),
        F.col(bin_col).alias("media"),
        *media_meta_cols(F.col(bin_col)),
    ).filter(F.col("modality") == "image")

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_decode_backend(b) for b in pdf["media"]]
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "container": pdf["container"],
                    "width": [f[0] for f in feats],
                    "height": [f[1] for f in feats],
                    "mean_luma": [f[2] for f in feats],
                    "n_bytes": pdf["n_bytes"],
                }
            )

    return imgs.mapInPandas(_decode, schema=IMAGE_FEATURES_DDL)


RESIZE_DDL = "id BIGINT, width INT, height INT, media BINARY"


def resize_images(
    df: DataFrame,
    max_side: int,
    id_col: str = "id",
    bin_col: str = "media",
) -> DataFrame:
    """Resize: computes the target box (aspect-preserving, longest
    side → ``max_side``) with INTEGER arithmetic — out = max(1,
    (dim · max_side) // longest) when downscaling, identity otherwise
    — so target dims are engine-portable (no float-scale truncation
    edges). BMP bytes get a REAL resize (nearest-neighbor re-encode,
    resize_bmp24_nearest); containers without a vendored re-encoder
    pass their bytes through (the declared fake tier for this op).
    Shapes, schema and batch flow are identical either way."""
    feats = decode_image_features(df, id_col, bin_col).select("id", "width", "height")
    src = df.select(F.col(id_col).alias("id"), F.col(bin_col).alias("media"))
    joined = src.join(feats, "id")

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            w = pdf["width"].to_numpy()
            h = pdf["height"].to_numpy()
            mx = np.maximum(w, h)
            down = mx > max_side
            out_w = np.where(down, np.maximum(1, w * max_side // np.maximum(mx, 1)), w)
            out_h = np.where(down, np.maximum(1, h * max_side // np.maximum(mx, 1)), h)
            media = []
            for b, ow, oh in zip(pdf["media"], out_w, out_h):
                raw = bytes(b)
                if raw[:2] == b"BM":
                    try:
                        media.append(resize_bmp24_nearest(raw, int(ow), int(oh)))
                        continue
                    except ValueError:
                        pass  # malformed BMP: passthrough like other tiers
                media.append(raw)
            yield pd.DataFrame(
                {"id": pdf["id"], "width": out_w, "height": out_h, "media": media}
            )

    return joined.mapInPandas(_resize, schema=RESIZE_DDL)


GIF_FRAMES_DDL = (
    "id BIGINT, frame_idx INT, width INT, height INT, "
    "delay_cs INT, mean_luma DOUBLE"
)


def gif_frame_features(
    df: DataFrame, id_col: str = "id", bin_col: str = "media"
) -> DataFrame:
    """REAL animated-GIF frame iteration as a flat-map (one input row →
    one row per displayed frame): functions/gif.py::gif_frames composes
    each frame onto the logical-screen canvas (GCE delays,
    transparency, disposal 1/2/3) and reports the composed mean.
    Arrow-batched mapInPandas, same plumbing contract as
    decode_image_features; undecodable bytes contribute no rows."""
    from .gif import gif_frames

    gifs = df.select(
        F.col(id_col).alias("id"),
        F.col(bin_col).alias("media"),
        *media_meta_cols(F.col(bin_col)),
    ).filter(F.col("container") == "gif")

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, ws, hs, delays, means = [], [], [], [], [], []
            for _id, b in zip(pdf["id"], pdf["media"]):
                try:
                    frames = gif_frames(bytes(b))
                except ValueError:
                    continue  # gif-magic synthetic / malformed bytes
                for fi, w, h, d, m in frames:
                    ids.append(_id)
                    idxs.append(fi)
                    ws.append(w)
                    hs.append(h)
                    delays.append(d)
                    means.append(m)
            yield pd.DataFrame(
                {
                    "id": ids, "frame_idx": idxs, "width": ws,
                    "height": hs, "delay_cs": delays, "mean_luma": means,
                }
            )

    return gifs.mapInPandas(_frames, schema=GIF_FRAMES_DDL)


def synth_gif_animated_col(id_col: Column) -> Column:
    """Arrow-batched synth of real 3-frame animated GIFs (fixture
    source for gif_frame_features)."""
    from .gif import synth_gif_animated_bytes

    @F.pandas_udf(T.BinaryType())
    def _mk(ids: pd.Series) -> pd.Series:
        return ids.map(lambda i: synth_gif_animated_bytes(int(i)))

    return _mk(id_col)


WEBP_FRAMES_DDL = (
    "id BIGINT, frame_idx INT, width INT, height INT, "
    "duration_ms INT, mean_luma DOUBLE"
)


def webp_frame_features(
    df: DataFrame, id_col: str = "id", bin_col: str = "media"
) -> DataFrame:
    """REAL animated-WebP frame iteration as a flat-map (one row per
    ANMF frame): functions/vp8l.py::webp_frames composes VP8L frames
    onto the VP8X canvas (ANIM background, per-frame blend/disposal).
    Arrow-batched mapInPandas; non-animated or undecodable bytes
    contribute no rows."""
    from .vp8l import webp_frames

    webps = df.select(
        F.col(id_col).alias("id"),
        F.col(bin_col).alias("media"),
        *media_meta_cols(F.col(bin_col)),
    ).filter(F.col("container") == "webp")

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, ws, hs, durs, means = [], [], [], [], [], []
            for _id, b in zip(pdf["id"], pdf["media"]):
                try:
                    frames = webp_frames(bytes(b))
                except ValueError:
                    continue
                for fi, w, h, d, m in frames:
                    ids.append(_id)
                    idxs.append(fi)
                    ws.append(w)
                    hs.append(h)
                    durs.append(d)
                    means.append(m)
            yield pd.DataFrame(
                {
                    "id": ids, "frame_idx": idxs, "width": ws,
                    "height": hs, "duration_ms": durs, "mean_luma": means,
                }
            )

    return webps.mapInPandas(_frames, schema=WEBP_FRAMES_DDL)


def synth_webp_animated_col(id_col: Column) -> Column:
    """Arrow-batched synth of real 3-frame animated WebPs (fixture
    source for webp_frame_features)."""
    from .vp8l import synth_webp_animated_bytes

    @F.pandas_udf(T.BinaryType())
    def _mk(ids: pd.Series) -> pd.Series:
        return ids.map(lambda i: synth_webp_animated_bytes(int(i)))

    return _mk(id_col)


def synth_webp_lossy_animated_col(id_col: Column) -> Column:
    """Arrow-batched synth of real 3-frame LOSSY (VP8 key-frame)
    animated WebPs (fixture source for webp_frame_features)."""
    from .vp8l import synth_webp_lossy_animated_bytes

    @F.pandas_udf(T.BinaryType())
    def _mk(ids: pd.Series) -> pd.Series:
        return ids.map(lambda i: synth_webp_lossy_animated_bytes(int(i)))

    return _mk(id_col)


FRAME_SAMPLE_DDL = "id BIGINT, frame_idx INT, frame_ts_ms BIGINT, frame BINARY"


def sample_frames(
    df: DataFrame,
    every_ms: int = 1000,
    max_frames: int = 8,
    id_col: str = "id",
    bin_col: str = "media",
) -> DataFrame:
    """Video frame sampling plumbing: one input row → N frame rows
    (flat-map shape via mapInPandas yielding more rows than consumed).
    Fake backend derives a deterministic frame count/bytes from the
    container bytes; a real one would demux with pyav/ffmpeg."""
    vids = df.select(
        F.col(id_col).alias("id"),
        F.col(bin_col).alias("media"),
        *media_meta_cols(F.col(bin_col)),
    ).filter(F.col("modality") == "video")

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, frames = [], [], [], []
            for _id, b in zip(pdf["id"], pdf["media"]):
                # hex-of-bytes digest: SQL-oracle-recomputable (see
                # _fake_image_decode)
                d = hashlib.md5(b.hex().upper().encode()).digest()
                n = min(max_frames, 1 + d[6] % max_frames)
                for i in range(n):
                    ids.append(_id)
                    idxs.append(i)
                    tss.append(i * every_ms)
                    # fake frame: tagged digest of (bytes, i); real backend
                    # emits the decoded frame re-encoded as PNG
                    frames.append(hashlib.md5(d + i.to_bytes(4, "big")).digest())
            yield pd.DataFrame(
                {"id": ids, "frame_idx": idxs, "frame_ts_ms": tss, "frame": frames}
            )

    return vids.mapInPandas(_sample, schema=FRAME_SAMPLE_DDL)


# ---------------------------------------------------------------------------
# deterministic synthetic media (test/bench fixture source)
# ---------------------------------------------------------------------------

#: cycle of magic prefixes used by ``synth_media_col`` — one per id % 5.
SYNTH_MAGICS = [
    "89504E470D0A1A0A",  # png
    "FFD8FFE0",          # jpeg
    "52494646",          # riff/wav
    "0000002066747970",  # mp4 (size + 'ftyp')
    "",                  # raw text → unknown
]


def synth_media_col(id_col: Column, text_col: Column) -> Column:
    """Deterministic fake media bytes: a real container magic chosen by
    ``id % 5`` prepended to the row's text bytes. JVM-side (unhex+concat),
    mirrored exactly by the DuckDB oracle — the BufferFileInputPlugin
    analogue (reference exec/BufferFileInputPlugin.java) for media."""
    payload = F.encode(text_col, "utf-8")
    expr = F.when(F.pmod(id_col, F.lit(5)) == 4, payload)
    for i, magic in enumerate(SYNTH_MAGICS[:-1]):
        expr = expr.when(
            F.pmod(id_col, F.lit(5)) == i, F.concat(F.unhex(F.lit(magic)), payload)
        )
    return expr


# ---------------------------------------------------------------------------
# real audio codec: canonical PCM WAV (vendored, stdlib/numpy-only)
# ---------------------------------------------------------------------------

def encode_wav_pcm16(sample_rate: int, channels: int, samples) -> bytes:
    """Build a canonical 44-byte-header PCM WAV (RIFF/WAVE, fmt chunk at
    offset 12, data chunk at 36) from int16 ``samples`` (interleaved when
    channels > 1)."""
    import struct

    data = b"".join(struct.pack("<h", int(s)) for s in samples)
    block_align = channels * 2
    byte_rate = sample_rate * block_align
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, channels, sample_rate, byte_rate,
                      block_align, 16)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def _le_uint(b: Column, offset: int, nbytes: int) -> Column:
    """Little-endian unsigned int from a binary column at a 0-based byte
    offset — pure JVM: slice, hex, byte-swap, base-16 conv."""
    h = F.hex(F.substring(b, offset + 1, nbytes))
    swapped = F.concat(
        *[F.substring(h, 2 * i + 1, 2) for i in range(nbytes - 1, -1, -1)]
    )
    return F.conv(swapped, 16, 10).cast("long")


def is_canonical_wav(b: Column) -> Column:
    """True for the canonical PCM layout encode_wav_pcm16 emits (RIFF +
    WAVE/fmt at fixed offsets, uncompressed PCM). Real-world WAVs with
    extension chunks before `data` are out of scope for the JVM fast
    path — they fall to the Python decoder tier, mirroring how
    multimodal_sniff gates decode_image_features."""
    return (
        (F.substring(b, 1, 4) == F.lit(b"RIFF"))
        & (F.substring(b, 9, 8) == F.lit(b"WAVEfmt "))
        & (F.substring(b, 37, 4) == F.lit(b"data"))
        & (_le_uint(b, 20, 2) == 1)  # audio_format = PCM
    )


def wav_meta_cols(b: Column) -> list[Column]:
    """Typed audio metadata from the canonical WAV header — ALL pure JVM
    Column arithmetic (no Python): channels, sample rate, bit depth,
    sample count, duration. NULL for non-canonical bytes. The audio
    analogue of media_meta_cols: cheap typed metadata FIRST, so filters
    on (sample_rate, duration) push down before any sample-level decode
    touches Python."""
    ok = is_canonical_wav(b)
    channels = _le_uint(b, 22, 2)
    rate = _le_uint(b, 24, 4)
    bits = _le_uint(b, 34, 2)
    data_size = _le_uint(b, 40, 4)
    frames = data_size / (channels * (bits / F.lit(8.0)))
    return [
        F.when(ok, channels).alias("channels"),
        F.when(ok, rate).alias("sample_rate"),
        F.when(ok, bits).alias("bits"),
        F.when(ok, frames.cast("long")).alias("n_frames"),
        F.when(ok, F.round(frames / rate, 6)).alias("duration_sec"),
    ]


AUDIO_FEATURES_DDL = (
    "id BIGINT, sample_rate BIGINT, n_frames BIGINT, "
    "rms DOUBLE, peak BIGINT"
)


def decode_audio_features(
    df: DataFrame, id_col: str = "id", bin_col: str = "media"
) -> DataFrame:
    """Sample-level audio features (RMS energy, absolute peak) for
    canonical PCM-16 WAVs. The JVM side pre-filters to canonical WAV
    bytes (pushdown-friendly) so Python only sees decodable rows; the
    decode itself is numpy-vectorized over Arrow batches (one frombuffer
    + two reductions per row — no per-sample Python). Integer
    sum-of-squares then ONE sqrt/division keeps RMS bit-stable across
    engines (same discipline as decode_bmp24's mean)."""
    import numpy as np

    # decode tier is PCM-16 only: other bit depths would mis-read as i2
    # (8-bit mono would even over-request the buffer and crash the job) —
    # they stop at the metadata tier, same as non-BMP images stop at sniff
    wavs = df.select(
        F.col(id_col).alias("id"),
        F.col(bin_col).alias("media"),
        *wav_meta_cols(F.col(bin_col)),
    ).filter(is_canonical_wav(F.col(bin_col)) & (_le_uint(F.col(bin_col), 34, 2) == 16))

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rms, peak, nf = [], [], []
            for b, frames, ch in zip(pdf["media"], pdf["n_frames"], pdf["channels"]):
                # interleaved samples across ALL channels: frames × channels
                x = np.frombuffer(
                    b, dtype="<i2", offset=44, count=int(frames) * int(ch)
                ).astype(np.int64)
                n = max(1, len(x))
                rms.append(float(np.sqrt(np.sum(x * x) / n)))
                peak.append(int(np.max(np.abs(x))) if len(x) else 0)
                nf.append(len(x) // int(ch))
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "sample_rate": pdf["sample_rate"],
                    "n_frames": nf,
                    "rms": rms,
                    "peak": peak,
                }
            )

    return wavs.mapInPandas(_decode, schema=AUDIO_FEATURES_DDL)


def synth_wav_params(doc_id: int) -> tuple[int, int]:
    """(sample_rate, n_samples) as pure arithmetic in doc_id — mirrored
    by the SQL oracle."""
    return 8000 * (1 + doc_id % 3), 64 + doc_id % 129


def synth_wav_sample(doc_id: int, i: int) -> int:
    """Deterministic int16 sample: pure arithmetic in (doc_id, i)."""
    return (doc_id * 31 + i * 17) % 4096 - 2048


def synth_wav_bytes(doc_id: int) -> bytes:
    rate, n = synth_wav_params(doc_id)
    return encode_wav_pcm16(
        rate, 1, (synth_wav_sample(doc_id, i) for i in range(n))
    )


def synth_wav_col(id_col: Column) -> Column:
    """Arrow-batched synth of real PCM WAV bytes (fixture source for the
    real audio decode path)."""

    @F.pandas_udf(T.BinaryType())
    def _mk(ids: pd.Series) -> pd.Series:
        return ids.map(lambda i: synth_wav_bytes(int(i)))

    return _mk(id_col)


RESAMPLE_DDL = "id BIGINT, sample_rate BIGINT, n_frames BIGINT, media BINARY"


def resample_wav(
    df: DataFrame,
    target_rate: int,
    id_col: str = "id",
    bin_col: str = "media",
) -> DataFrame:
    """Integer-factor PCM-16 downsample (keep every k-th frame, k =
    rate/target) re-emitting REAL canonical WAV bytes — the audio
    analogue of resize_images. Rows whose rate is not an integer
    multiple of ``target_rate`` (or already at/below it) pass through
    unchanged, like resize's scale-clip at 1.0. JVM pre-filters to
    canonical PCM-16; the decimation is one numpy slice per row
    (no per-sample Python), and the 44-byte header is rebuilt with
    struct — byte-exact for the metadata tier to re-parse."""
    import numpy as np

    wavs = df.select(
        F.col(id_col).alias("id"),
        F.col(bin_col).alias("media"),
        *wav_meta_cols(F.col(bin_col)),
    ).filter(is_canonical_wav(F.col(bin_col)) & (_le_uint(F.col(bin_col), 34, 2) == 16))

    def _resample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        for pdf in batches:
            out_rate, out_frames, out_bytes = [], [], []
            for b, rate, frames, ch in zip(
                pdf["media"], pdf["sample_rate"], pdf["n_frames"], pdf["channels"]
            ):
                rate, frames, ch = int(rate), int(frames), int(ch)
                if rate <= target_rate or rate % target_rate != 0:
                    out_rate.append(rate)
                    out_frames.append(frames)
                    out_bytes.append(b)
                    continue
                k = rate // target_rate
                x = np.frombuffer(b, dtype="<i2", offset=44, count=frames * ch)
                kept = x.reshape(frames, ch)[::k].reshape(-1)
                data = kept.astype("<i2").tobytes()
                block = ch * 2
                hdr = (
                    b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVEfmt "
                    + struct.pack("<IHHIIHH", 16, 1, ch, target_rate,
                                  target_rate * block, block, 16)
                    + b"data" + struct.pack("<I", len(data))
                )
                out_rate.append(target_rate)
                out_frames.append(len(kept) // ch)
                out_bytes.append(hdr + data)
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "sample_rate": out_rate,
                    "n_frames": out_frames,
                    "media": out_bytes,
                }
            )

    return wavs.mapInPandas(_resample, schema=RESAMPLE_DDL)
