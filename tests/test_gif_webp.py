"""Vendored GIF (functions/gif.py) and lossless-WebP/VP8L
(functions/vp8l.py) codecs: fixture round trips against independent
arithmetic, the LZW and prefix-code edge cases the fixtures don't
exercise (KwKwK, dictionary growth, color cache, 2D distance map, plain
distances, two-symbol simple codes), the honest ValueError profile
boundaries, and backend routing through decode_image_features."""

from __future__ import annotations

import struct

import pytest

from embulk_spark.functions.gif import (
    _lzw_decode,
    decode_gif,
    encode_gif,
    synth_gif_bytes,
    synth_gif_dims,
)
from embulk_spark.functions.vp8l import (
    _BitWriter,
    _BYTE_CODES,
    _GREEN_CODES,
    _emit,
    _prefix_decode_value,
    _prefix_encode_value,
    _write_byte_code,
    _write_green_code,
    _write_single_symbol_code,
    decode_vp8l,
    decode_webp,
    encode_vp8l,
    synth_webp_bytes,
    synth_webp_dims,
)


# ---------------------------------------------------------------------------
# GIF
# ---------------------------------------------------------------------------


def _gif_oracle(doc_id: int) -> tuple[int, int, float]:
    w, h = synth_gif_dims(doc_id)
    s = 0
    for y in range(h):
        for x in range(w):
            i = (2 * x + 3 * y + doc_id) % 256
            s += (
                (3 * i + doc_id) % 256
                + (5 * i + 2 * doc_id) % 256
                + (7 * i + 11 * doc_id) % 256
            )
    return w, h, s / (3.0 * w * h)


@pytest.mark.parametrize("doc_id", [0, 1, 7, 63, 255, 256, 1023])
def test_gif_fixture_roundtrip_matches_arithmetic(doc_id):
    assert decode_gif(synth_gif_bytes(doc_id)) == _gif_oracle(doc_id)


def test_gif_lzw_dictionary_growth_and_deferred_clear():
    """5600 px > 4096 dictionary entries: crosses every width bump
    (9→10→11→12 bits) and parks at the full table (deferred clear)."""
    pal = bytes(c for i in range(256) for c in (i, 255 - i, (2 * i) % 256))
    data = encode_gif(80, 70, pal, lambda x, y: (x * x + 3 * y) % 256)
    w, h, m = decode_gif(data)
    s = sum(
        v + (255 - v) + (2 * v) % 256
        for y in range(70)
        for x in range(80)
        for v in [(x * x + 3 * y) % 256]
    )
    assert (w, h, m) == (80, 70, s / (3.0 * 80 * 70))


def test_gif_lzw_kwkwk_case():
    """The self-referencing code (code == next free entry): stream
    [clear, A, 258] must decode to A,A,A (entry 258 = 'AA' built from
    its own first byte)."""
    bits = []
    for code in (256, 65, 258):  # clear, 'A', KwKwK
        for i in range(9):
            bits.append((code >> i) & 1)
    by = bytearray()
    for i in range(0, len(bits), 8):
        b = 0
        for j, bit in enumerate(bits[i : i + 8]):
            b |= bit << j
        by.append(b)
    out = _lzw_decode(bytes(by), 8, 3)
    assert bytes(out) == b"AAA"


def test_gif_skips_extensions_and_uses_local_palette():
    """A GIF89a with a graphic-control extension and a LOCAL color table
    decodes via the local palette."""
    pal_g = bytes(768)  # global: all black
    base = encode_gif(4, 3, pal_g, lambda x, y: (x + y) % 256)
    # splice: header+LSD+GCT | ext | image with local table
    hdr = base[: 13 + 768]
    ext = b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # GCE, 4-byte block, term
    img = bytearray(base[13 + 768 : -1])  # image descriptor..terminator
    img[9] = 0x87  # local color table flag + size 7 (256 entries)
    pal_l = bytes(c for i in range(256) for c in (i, i, i))
    img = bytes(img[:10]) + pal_l + bytes(img[10:])
    w, h, m = decode_gif(bytes(hdr) + ext + img + b"\x3b")
    want = sum(3 * ((x + y) % 256) for y in range(3) for x in range(4))
    assert (w, h, m) == (4, 3, want / (3.0 * 4 * 3))


def test_gif_rejects_interlace_and_garbage():
    pal = bytes(768)
    data = bytearray(encode_gif(4, 3, pal, lambda x, y: 0))
    data[13 + 768 + 9] |= 0x40  # interlace flag in image descriptor
    # interlace decodes for real since round 5 (row permutation is
    # invisible to the row-order-invariant mean contract)
    assert decode_gif(bytes(data)) == (4, 3, 0.0)
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"GIF00a" + bytes(20))
    with pytest.raises(ValueError):
        decode_gif(bytes(encode_gif(4, 3, pal, lambda x, y: 0))[:40])


# ---------------------------------------------------------------------------
# VP8L / WebP
# ---------------------------------------------------------------------------


def _webp_oracle(doc_id: int) -> tuple[int, int, float]:
    w, h = synth_webp_dims(doc_id)
    s = 0
    for y in range(h):
        ye = y - (y % 2)
        for x in range(w):
            s += (
                (x + 2 * ye + doc_id) % 256
                + (2 * x + ye + 3 * doc_id) % 256
                + (x + ye + 5 * doc_id) % 256
            )
    return w, h, s / (3.0 * w * h)


@pytest.mark.parametrize("doc_id", [0, 1, 5, 100, 255, 999])
def test_webp_fixture_roundtrip_matches_arithmetic(doc_id):
    assert decode_webp(synth_webp_bytes(doc_id)) == _webp_oracle(doc_id)


def test_vp8l_prefix_value_coding_inverts():
    from embulk_spark.functions.vp8l import _BitReader

    for v in list(range(1, 300)) + [1000, 4096]:
        sym, extra, nbits = _prefix_encode_value(v)
        bw = _BitWriter()
        bw.write(extra, nbits)
        br = _BitReader(bw.bytes() + b"\x00")
        assert _prefix_decode_value(br, sym) == v, (v, sym, extra, nbits)


def _hand_stream(width, height, body_bits) -> bytes:
    """Wrap hand-written post-header bits into a full WebP container."""
    bw = _BitWriter()
    bw.write(width - 1, 14)
    bw.write(height - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)
    body_bits(bw)
    payload = b"\x2f" + bw.bytes()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def test_vp8l_color_cache_hit():
    """Hand-written stream with the color cache enabled: a literal pixel
    (a=255, r=20, g=10, b=30), then a cache-symbol reference to it. The
    green code is a NORMAL code over the 284-symbol alphabet with two
    length-1 symbols — literal green 10 and the pixel's cache slot —
    terminated early via the max_symbol short-circuit, so the repeat-17/
    18 zero runs, the code-length code, and the cache lookup all run."""
    from embulk_spark.functions.vp8l import _cache_index

    argb = (0xFF << 24) | (20 << 16) | (10 << 8) | 30
    slot = _cache_index(argb, 2)
    cache_sym = 256 + 24 + slot

    def body(bw):
        bw.write(0, 1)  # no transform
        bw.write(1, 1)  # color cache present
        bw.write(2, 4)  # cache_bits = 2 (4 entries)
        bw.write(0, 1)  # no entropy image
        # green: normal code. CL lengths: sym1→1 ('0'), 17→2 ('10'),
        # 18→2 ('11') — Kraft-complete.
        bw.write(0, 1)  # not simple
        bw.write(0, 4)  # num_code_lengths = 4 (through order pos 3 = sym 1)
        bw.write(2, 3)  # order[0] = 17 → len 2
        bw.write(2, 3)  # order[1] = 18 → len 2
        bw.write(0, 3)  # order[2] = 0  → unused
        bw.write(1, 3)  # order[3] = 1  → len 1
        bw.write(1, 1)  # use max_symbol (counts CL-code READS, not
        # output symbols): 17,17,1,18,18,1 = 6 reads below
        bw.write(4, 3)  # length_nbits = 2 + 2*4 = 10
        bw.write(6 - 2, 10)
        # symbol lengths: 10 zeros, len1 at sym 10, zeros, len1 at cache_sym
        bw.write(1, 1); bw.write(0, 1)  # CL 17 (code '10', MSB first)
        bw.write(3, 3)  # 3+3 = 6 zeros
        bw.write(1, 1); bw.write(0, 1)  # CL 17
        bw.write(1, 3)  # 3+1 = 4 zeros (total 10)
        bw.write(0, 1)  # CL 1 → lengths[10] = 1
        zeros = cache_sym - 11
        while zeros:
            take = min(zeros, 138)
            bw.write(1, 1); bw.write(1, 1)  # CL 18 (code '11')
            bw.write(take - 11, 7)
            zeros -= take
        bw.write(0, 1)  # CL 1 → lengths[cache_sym] = 1
        for sym in (20, 30, 255):  # red, blue, alpha: single-symbol
            _write_single_symbol_code(bw, sym)
        _write_single_symbol_code(bw, 0)  # distance (unused)
        # pixels: canonical over {10, cache_sym} → sym10='0', cache='1'
        bw.write(0, 1)  # literal green 10 (r/b/a read 0 bits)
        bw.write(1, 1)  # cache hit

    w, h, m = decode_webp(_hand_stream(2, 1, body))
    assert (w, h) == (2, 1)
    assert m == (20 + 10 + 30) / 3.0


def test_vp8l_plain_distance_and_dist_map_row_above():
    """encode_vp8l's backrefs use distance code 1 ((0,1) = row above):
    decode a fixture whose odd rows duplicate even rows and check a
    manual pixel; then a hand-check that plain codes (>120) would map
    to linear distances."""
    data = encode_vp8l(5, 4, lambda x, y: ((x + y) % 256, x, y % 256))
    w, h, m = decode_webp(data)
    ps = 0
    for y in range(4):
        ye = y - y % 2
        for x in range(5):
            ps += ((x + ye) % 256) + x + (ye % 256)
    assert (w, h, m) == (5, 4, ps / (3.0 * 5 * 4))
    # plain distance: code 121+w-1 → linear distance w (dist_map bypass)
    from embulk_spark.functions.vp8l import _DIST_MAP

    assert _DIST_MAP[0] == (0, 1) and _DIST_MAP[1] == (1, 0)


def test_vp8l_two_symbol_simple_code():
    """Hand-written stream with a 2-symbol simple green code (stream
    order: first listed symbol gets code 0): 2×1 image, two literals.
    Red/blue/alpha are single-symbol codes (0 bits each)."""

    def body(bw):
        bw.write(0, 1)  # no transform
        bw.write(0, 1)  # no color cache
        bw.write(0, 1)  # no entropy image
        # green: simple, two symbols 7 and 3
        bw.write(1, 1)
        bw.write(1, 1)
        bw.write(1, 1)
        bw.write(7, 8)
        bw.write(3, 8)
        for sym in (50, 60, 255):  # red, blue, alpha single-symbol
            _write_single_symbol_code(bw, sym)
        _write_single_symbol_code(bw, 0)  # distance (unused)
        bw.write(0, 1)  # green sym0 = 7
        bw.write(1, 1)  # green sym1 = 3

    w, h, m = decode_webp(_hand_stream(2, 1, body))
    # pixels: (r=50,g=7,b=60) and (r=50,g=3,b=60)
    assert (w, h) == (2, 1)
    assert m == (50 + 7 + 60 + 50 + 3 + 60) / 6.0


def test_vp8l_rejects_out_of_profile():
    with pytest.raises(ValueError, match="not a WebP"):
        decode_webp(b"RIFFxxxxWAVE")
    # lossy VP8 chunk
    lossy = (
        b"RIFF" + struct.pack("<I", 12) + b"WEBP"
        + b"VP8 " + struct.pack("<I", 4) + b"\x00" * 4
    )
    with pytest.raises(ValueError, match="VP8"):
        decode_webp(lossy)

    # predictor transform and entropy image are REAL since round 5
    # (libwebp-conformance-validated) — a stream that declares one and
    # then ends must still fail honestly, now as a truncation
    def with_transform(bw):
        bw.write(1, 1)  # transform present
        bw.write(0, 2)  # predictor transform

    with pytest.raises(ValueError, match="truncated|prefix"):
        decode_webp(_hand_stream(2, 2, with_transform))

    def with_entropy_image(bw):
        bw.write(0, 1)
        bw.write(0, 1)
        bw.write(1, 1)  # entropy image

    with pytest.raises(ValueError, match="truncated|prefix"):
        decode_webp(_hand_stream(2, 2, with_entropy_image))

    with pytest.raises(ValueError, match="signature"):
        decode_vp8l(b"\x30\x00\x00")


def test_vp8l_normal_code_writers_are_kraft_complete():
    """The fixture encoder's normal-form code writers must round-trip
    through the decoder's code reader (Kraft equality enforced there)."""
    from embulk_spark.functions.vp8l import _BitReader, _read_prefix_code

    bw = _BitWriter()
    _write_green_code(bw)
    code = _read_prefix_code(_BitReader(bw.bytes() + b"\x00" * 8), 280)
    assert code.single is None
    bw2 = _BitWriter()
    _write_byte_code(bw2)
    code2 = _read_prefix_code(_BitReader(bw2.bytes() + b"\x00" * 8), 256)
    assert code2.single is None
    # spot: symbol 0 has an 8-bit canonical code in both
    assert _GREEN_CODES[0][1] == 8 and _BYTE_CODES[0][1] == 8
    assert _GREEN_CODES[279][1] == 9


# ---------------------------------------------------------------------------
# backend routing (Spark plumbing)
# ---------------------------------------------------------------------------


def test_backend_routes_gif_and_webp():
    from embulk_spark.functions.multimodal import (
        _decode_backend,
        _fake_image_decode,
    )

    g = synth_gif_bytes(42)
    assert _decode_backend(g) == decode_gif(g)
    wp = synth_webp_bytes(42)
    assert _decode_backend(wp) == decode_webp(wp)
    # GIF-magic garbage falls to the fake tier, not an exception
    junk = b"GIF89a" + b"\x00" * 16
    assert _decode_backend(junk) == _fake_image_decode(junk)
    # lossy WebP falls to the fake tier
    lossy = (
        b"RIFF" + struct.pack("<I", 12) + b"WEBP"
        + b"VP8 " + struct.pack("<I", 4) + b"\x00" * 4
    )
    assert _decode_backend(lossy) == _fake_image_decode(lossy)


def test_webp_sniffed_as_image(spark):
    """RIFF+WEBP refines to ('webp','image') JVM-side; RIFF+WAVE stays
    ('riff','audio')."""
    from embulk_spark.functions.multimodal import (
        encode_wav_pcm16,
        media_meta_cols,
    )
    from pyspark.sql import functions as F

    rows = [
        (1, synth_webp_bytes(3)),
        (2, encode_wav_pcm16(8000, 1, [0] * 16)),
    ]
    df = spark.createDataFrame(rows, "id long, media binary")
    got = {
        r.id: (r.container, r.modality)
        for r in df.select(
            "id", *media_meta_cols(F.col("media"))
        ).collect()
    }
    assert got[1] == ("webp", "image")
    assert got[2] == ("riff", "audio")


def test_decode_image_features_gif_webp_end_to_end(spark):
    from pyspark.sql import functions as F

    from embulk_spark.functions.multimodal import (
        decode_image_features,
        synth_gif_col,
        synth_webp_col,
    )

    ids = spark.range(0, 24).select(F.col("id"))
    for col_fn, oracle, container in (
        (synth_gif_col, _gif_oracle, "gif"),
        (synth_webp_col, _webp_oracle, "webp"),
    ):
        media = ids.select("id", col_fn(F.col("id")).alias("media"))
        got = {
            r.id: (r.container, r.width, r.height, r.mean_luma)
            for r in decode_image_features(media).collect()
        }
        assert len(got) == 24
        for i in range(24):
            w, h, m = oracle(i)
            assert got[i] == (container, w, h, m)


def test_vp8l_simple_code_symbol_out_of_range_rejects():
    """Review-sweep regression (r4): a simple-form prefix code naming a
    symbol outside the alphabet (e.g. symbol 200 on the 40-symbol
    distance alphabet) must reject as a malformed stream, not decode
    garbage."""
    def body(bw):
        bw.write(0, 1)  # no transform
        bw.write(0, 1)  # no color cache
        bw.write(0, 1)  # no entropy image
        for sym in (10, 20, 30, 255):  # green/red/blue/alpha: fine
            _write_single_symbol_code(bw, sym)
        # distance: simple code, symbol 200 > alphabet 40
        bw.write(1, 1)
        bw.write(0, 1)
        bw.write(1, 1)
        bw.write(200, 8)

    with pytest.raises(ValueError, match="out of range"):
        decode_webp(_hand_stream(2, 1, body))


def test_vp8l_subtract_green_transform():
    """The subtract-green transform (the one real encoders default to)
    decodes for real now: a stream carrying it must yield the same
    features as the untransformed encoding of the same pixels. (All
    four transforms are real since round 5 — a truncated predictor
    declaration must still fail honestly.)"""
    def px(x, y):
        ye = y - y % 2
        return ((x * 7 + ye * 3) % 256, (x + ye * 11) % 256,
                (x * 5 + ye) % 256)

    plain = decode_webp(encode_vp8l(9, 7, px))
    sg = decode_webp(encode_vp8l(9, 7, px, subtract_green=True))
    assert sg == plain

    def with_predictor(bw):
        bw.write(1, 1)  # transform present
        bw.write(0, 2)  # type 0 = predictor (real since round 5)

    with pytest.raises(ValueError, match="truncated|prefix"):
        decode_webp(_hand_stream(2, 2, with_predictor))


def test_vp8l_color_indexing_all_packing_modes():
    """The palette transform decodes for real: delta-coded palette
    sub-image, sub-pixel packing at every width (1-bit/2-bit/4-bit/
    none), non-multiple widths, and the single-color edge."""
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

        got = decode_webp(encode_vp8l_palette(w, h, pal, idx))
        s = sum(sum(pal[idx(x, y)]) for y in range(h) for x in range(w))
        assert got == (w, h, s / (3.0 * w * h)), (n_colors, w, h)


def test_vp8l_palette_oob_index_decodes_to_zero():
    """An index past the palette decodes as 0x00000000 (the spec's
    deterministic out-of-range rule), never an exception."""
    from embulk_spark.functions.vp8l import encode_vp8l_palette

    # 20-color palette (no packing) but indices reach 25
    pal = [(10, 20, 30)] * 20
    data = encode_vp8l_palette(4, 2, pal, lambda x, y: 25 if x == 0 else 1)
    w, h, m = decode_webp(data)
    # rows: [0, 60, 60, 60] summed per row (OOB→0; idx 1→10+20+30)
    assert (w, h) == (4, 2)
    assert m == (0 + 60 * 3) * 2 / (3.0 * 4 * 2)


def test_vp8l_palette_subimage_carries_no_meta_prefix_bit():
    """Grammar conformance regression (round-5 review fix): only the
    MAIN spatially-coded image carries the meta-prefix ("entropy
    image") bit — transform sub-images are color-cache-info + prefix
    codes only (RFC 9649 §3.7.2.1; libwebp ReadHuffmanCodes
    allow_recursion=is_level0). The stream here is hand-written from
    the grammar, field by field, independently of encode_vp8l_palette,
    so an encoder/decoder SHARED layout bug cannot make it pass."""

    def build(spurious_meta_bit_in_subimage: bool) -> bytes:
        bw = _BitWriter()
        bw.write(1, 14)  # width - 1 = 1
        bw.write(1, 14)  # height - 1 = 1
        bw.write(0, 1)   # no alpha hint
        bw.write(0, 3)   # version 0
        bw.write(1, 1)   # a transform follows
        bw.write(3, 2)   # type 3 = color indexing
        bw.write(1, 8)   # n_colors - 1 = 1 (palette: 2 entries)
        # ---- palette sub-image: 2 delta pixels (a,r,g,b) =
        # (255,10,20,30), (0,30,30,30) for entries (10,20,30),(40,50,60)
        bw.write(0, 1)   # no color cache
        if spurious_meta_bit_in_subimage:
            bw.write(0, 1)  # the pre-fix bug: sub-image meta bit
        # green code: two-symbol simple {20, 30}
        bw.write(1, 1); bw.write(1, 1); bw.write(1, 1)
        bw.write(20, 8); bw.write(30, 8)
        # red code: two-symbol simple {10, 30}
        bw.write(1, 1); bw.write(1, 1); bw.write(1, 1)
        bw.write(10, 8); bw.write(30, 8)
        # blue code: single symbol 30
        bw.write(1, 1); bw.write(0, 1); bw.write(1, 1); bw.write(30, 8)
        # alpha code: two-symbol simple listed as [255, 0]
        bw.write(1, 1); bw.write(1, 1); bw.write(1, 1)
        bw.write(255, 8); bw.write(0, 8)
        # distance code: single symbol 0
        bw.write(1, 1); bw.write(0, 1); bw.write(0, 1); bw.write(0, 1)
        # delta px0: g=20(bit 0), r=10(bit 0), b=(0 bits), a=255(bit 0)
        bw.write(0, 1); bw.write(0, 1); bw.write(0, 1)
        # delta px1: g=30(bit 1), r=30(bit 1), a=0(bit 1)
        bw.write(1, 1); bw.write(1, 1); bw.write(1, 1)
        # ---- end of transform list
        bw.write(0, 1)
        # ---- main image (top level): 2 colors -> 3 packing bits,
        # eff_width 1; packed greens row0 = 0|1<<1 = 2, row1 = 1|1<<1 = 3
        bw.write(0, 1)   # no color cache
        bw.write(0, 1)   # no entropy image (the bit ONLY here)
        # green code: two-symbol simple {2, 3}
        bw.write(1, 1); bw.write(1, 1); bw.write(1, 1)
        bw.write(2, 8); bw.write(3, 8)
        # red code: single symbol 0 (1-bit first-symbol form)
        bw.write(1, 1); bw.write(0, 1); bw.write(0, 1); bw.write(0, 1)
        # blue code: single symbol 0
        bw.write(1, 1); bw.write(0, 1); bw.write(0, 1); bw.write(0, 1)
        # alpha code: single symbol 255
        bw.write(1, 1); bw.write(0, 1); bw.write(1, 1); bw.write(255, 8)
        # distance code: single symbol 0
        bw.write(1, 1); bw.write(0, 1); bw.write(0, 1); bw.write(0, 1)
        # px(row0): g=2 (bit 0); px(row1): g=3 (bit 1)
        bw.write(0, 1); bw.write(1, 1)
        return b"\x2f" + bw.bytes()

    # conformant stream decodes: pixels (10,20,30),(40,50,60)x3
    assert decode_vp8l(build(False)) == (2, 2, (60 + 3 * 150) / 12.0)
    # the old shared-bug layout must NOT silently decode to the same
    # image anymore
    try:
        got = decode_vp8l(build(True))
    except ValueError:
        got = None
    assert got != (2, 2, (60 + 3 * 150) / 12.0)


def test_vp8l_palette_encoder_agrees_with_handwritten_stream():
    """encode_vp8l_palette (post-fix: no meta bit in the palette
    sub-image) decodes to the same image as the hand-written grammar
    stream above — the two constructions are independent, so agreement
    means the encoder's layout is the conformant one."""
    from embulk_spark.functions.vp8l import encode_vp8l_palette

    data = encode_vp8l_palette(
        2, 2, [(10, 20, 30), (40, 50, 60)],
        lambda x, y: 0 if (x, y) == (0, 0) else 1,
    )
    assert decode_webp(data) == (2, 2, (60 + 3 * 150) / 12.0)


# ---------------------------------------------------------------------------
# animated GIF frame iteration (round 5)
# ---------------------------------------------------------------------------


def _psum(pal, i):
    return pal[3 * i] + pal[3 * i + 1] + pal[3 * i + 2]


def _anim_pal():
    return bytes(c for i in range(256) for c in (i, (2 * i) % 256, (3 * i) % 256))


def test_gif_frames_full_screen_sequence():
    from embulk_spark.functions.gif import encode_gif_animated, gif_frames

    pal = _anim_pal()
    frames = [
        {"index_fn": (lambda k: (lambda x, y: (x + y + k) % 256))(k),
         "delay_cs": 10 * k, "disposal": 1}
        for k in range(3)
    ]
    out = gif_frames(encode_gif_animated(7, 5, pal, frames))
    assert len(out) == 3
    for k, (fi, w, h, d, mean) in enumerate(out):
        exp = sum(
            _psum(pal, (x + y + k) % 256) for y in range(5) for x in range(7)
        ) / (3.0 * 7 * 5)
        assert (fi, w, h, d) == (k, 7, 5, 10 * k)
        assert mean == pytest.approx(exp, abs=1e-12)


def test_gif_frames_partial_rect_and_transparency():
    from embulk_spark.functions.gif import encode_gif_animated, gif_frames

    pal = _anim_pal()
    out = gif_frames(encode_gif_animated(4, 4, pal, [
        {"index_fn": lambda x, y: 5, "disposal": 1},
        {"index_fn": lambda x, y: 9, "rect": (2, 1, 2, 2), "disposal": 1},
    ]))
    assert out[0][4] == pytest.approx(_psum(pal, 5) / 3.0, abs=1e-12)
    assert out[1][4] == pytest.approx(
        (_psum(pal, 5) * 12 + _psum(pal, 9) * 4) / (3.0 * 16), abs=1e-12
    )
    # transparent pixels leave the prior canvas visible
    out = gif_frames(encode_gif_animated(3, 3, pal, [
        {"index_fn": lambda x, y: 5, "disposal": 1},
        {"index_fn": lambda x, y: 9 if (x, y) == (0, 0) else 0,
         "transparent": 0},
    ]))
    assert out[1][4] == pytest.approx(
        (_psum(pal, 5) * 8 + _psum(pal, 9)) / (3.0 * 9), abs=1e-12
    )


def test_gif_frames_disposal_background_and_previous():
    from embulk_spark.functions.gif import encode_gif_animated, gif_frames

    pal = _anim_pal()
    out = gif_frames(encode_gif_animated(4, 4, pal, [
        {"index_fn": lambda x, y: 5, "disposal": 1},
        {"index_fn": lambda x, y: 9, "rect": (0, 0, 2, 2), "disposal": 3},
        {"index_fn": lambda x, y: 7, "rect": (3, 3, 1, 1), "disposal": 2},
        {"index_fn": lambda x, y: 1, "rect": (1, 1, 1, 1), "disposal": 1},
    ]))
    # disposal 3 restored frame 1's rect; disposal 2 reset (3,3) to the
    # background color (index 0 of the GCT)
    exp = (_psum(pal, 5) * 14 + _psum(pal, 0) + _psum(pal, 1)) / (3.0 * 16)
    assert out[3][4] == pytest.approx(exp, abs=1e-12)


def test_gif_frames_rejects_out_of_screen_rect():
    from embulk_spark.functions.gif import encode_gif_animated, gif_frames

    data = encode_gif_animated(4, 4, _anim_pal(), [
        {"index_fn": lambda x, y: 1, "rect": (3, 3, 2, 2)},
    ])
    with pytest.raises(ValueError, match="outside"):
        gif_frames(data)


def test_gif_frames_synth_fixture_contract():
    from embulk_spark.functions.gif import (
        gif_frames,
        synth_gif_animated_bytes,
        synth_gif_dims,
    )

    for doc_id in (0, 3, 42):
        out = gif_frames(synth_gif_animated_bytes(doc_id))
        w, h = synth_gif_dims(doc_id)
        assert [f[:4] for f in out] == [
            (k, w, h, 4 + k) for k in range(3)
        ]
        for k, (_, _, _, _, mean) in enumerate(out):
            exp = sum(
                ((3 * i + doc_id) % 256 + (5 * i + 2 * doc_id) % 256
                 + (7 * i + 11 * doc_id) % 256)
                for i in (
                    (2 * x + 3 * y + doc_id + 17 * k) % 256
                    for y in range(h) for x in range(w)
                )
            ) / (3.0 * w * h)
            assert mean == pytest.approx(exp, abs=1e-12)


def test_gif_frame_features_flatmap(spark):
    from pyspark.sql import functions as F

    from embulk_spark.functions.gif import gif_frames, synth_gif_animated_bytes
    from embulk_spark.functions.multimodal import (
        gif_frame_features,
        synth_gif_animated_col,
    )

    df = spark.range(0, 8).select(
        F.col("id"), synth_gif_animated_col(F.col("id")).alias("media")
    )
    rows = gif_frame_features(df).collect()
    assert len(rows) == 24  # 8 docs × 3 frames
    by_key = {(r["id"], r["frame_idx"]): r for r in rows}
    for i in range(8):
        for fi, w, h, d, m in gif_frames(synth_gif_animated_bytes(i)):
            r = by_key[(i, fi)]
            assert (r["width"], r["height"], r["delay_cs"]) == (w, h, d)
            assert r["mean_luma"] == pytest.approx(m, abs=1e-12)


# ---------------------------------------------------------------------------
# animated WebP frame iteration (round 5)
# ---------------------------------------------------------------------------


def test_webp_frames_full_canvas_sequence():
    from embulk_spark.functions.vp8l import (
        synth_webp_animated_bytes,
        synth_webp_dims,
        webp_frames,
    )

    for doc_id in (0, 5, 42):
        out = webp_frames(synth_webp_animated_bytes(doc_id))
        w, h = synth_webp_dims(doc_id)
        assert [f[:4] for f in out] == [(k, w, h, 40 + k) for k in range(3)]
        for k, (_, _, _, _, mean) in enumerate(out):
            t = 0
            for y in range(h):
                ye = y - (y % 2)
                for x in range(w):
                    t += (
                        (x + 2 * ye + doc_id + 17 * k) % 256
                        + (2 * x + ye + 3 * doc_id + 17 * k) % 256
                        + (x + ye + 5 * doc_id + 17 * k) % 256
                    )
            assert mean == pytest.approx(t / (3.0 * w * h), abs=1e-12)


def test_webp_frames_rect_dispose_and_background():
    from embulk_spark.functions.vp8l import encode_webp_animated, webp_frames

    frames = [
        {"pixel": lambda x, y: (10, 20, 30), "no_blend": True},
        {"pixel": lambda x, y: (200, 100, 50), "rect": (2, 2, 4, 2),
         "no_blend": True, "dispose_bg": True},
        {"pixel": lambda x, y: (10, 20, 30), "rect": (0, 0, 2, 2),
         "no_blend": True},
    ]
    out = webp_frames(encode_webp_animated(8, 6, frames, bg=(255, 1, 2, 3)))
    assert out[1][4] == pytest.approx(
        (60 * 40 + 350 * 8) / (3.0 * 48), abs=1e-12
    )
    # dispose-to-background restored the rect to (1,2,3) before frame 2
    assert out[2][4] == pytest.approx(
        (60 * 40 + 6 * 8) / (3.0 * 48), abs=1e-12
    )


def test_webp_blend_pixel_math():
    from embulk_spark.functions.vp8l import _blend_px

    # binary alphas compose exactly
    assert _blend_px((255, 9, 9, 9), (255, 1, 2, 3)) == (255, 1, 2, 3)
    assert _blend_px((255, 9, 9, 9), (0, 1, 2, 3)) == (255, 9, 9, 9)
    assert _blend_px((0, 0, 0, 0), (0, 0, 0, 0)) == (0, 0, 0, 0)
    # 50% over opaque: out alpha stays opaque, channels midpoint
    a, r, g, b = _blend_px((255, 100, 100, 100), (128, 0, 0, 0))
    assert a == 255 and abs(r - 50) <= 1 and abs(g - 50) <= 1


def test_webp_frames_boundaries():
    from embulk_spark.functions.vp8l import encode_webp_animated, webp_frames

    # rect outside the canvas
    data = encode_webp_animated(
        4, 4, [{"pixel": lambda x, y: (1, 2, 3), "rect": (2, 2, 4, 4)}]
    )
    with pytest.raises(ValueError, match="outside"):
        webp_frames(data)
    # a still (non-animated) webp has no ANMF frames
    from embulk_spark.functions.vp8l import synth_webp_bytes

    with pytest.raises(ValueError, match="no ANMF"):
        webp_frames(synth_webp_bytes(1))


def test_webp_frame_features_flatmap(spark):
    from pyspark.sql import functions as F

    from embulk_spark.functions.multimodal import (
        synth_webp_animated_col,
        webp_frame_features,
    )
    from embulk_spark.functions.vp8l import (
        synth_webp_animated_bytes,
        webp_frames,
    )

    df = spark.range(0, 6).select(
        F.col("id"), synth_webp_animated_col(F.col("id")).alias("media")
    )
    rows = webp_frame_features(df).collect()
    assert len(rows) == 18
    by_key = {(r["id"], r["frame_idx"]): r for r in rows}
    for i in range(6):
        for fi, w, h, d, m in webp_frames(synth_webp_animated_bytes(i)):
            r = by_key[(i, fi)]
            assert (r["width"], r["height"], r["duration_ms"]) == (w, h, d)
            assert r["mean_luma"] == pytest.approx(m, abs=1e-12)


def test_webp_lossy_frames_closed_form():
    """Lossy (VP8 key-frame) animated WebP: every frame runs the full
    vendored VP8 pipeline; flat-chroma MB-constant fixtures convert to
    RGB == Y exactly, so per-frame means are pure MB arithmetic."""
    from embulk_spark.functions.vp8 import synth_vp8_dims, synth_vp8_mb_value
    from embulk_spark.functions.vp8l import (
        synth_webp_lossy_animated_bytes,
        webp_frames,
    )

    for doc_id in (0, 3, 42):
        out = webp_frames(synth_webp_lossy_animated_bytes(doc_id))
        w, h = synth_vp8_dims(doc_id)
        assert [f[:4] for f in out] == [(k, w, h, 25 + k) for k in range(3)]
        mbw, mbh = w // 16, h // 16
        for k in range(3):
            exp = sum(
                40 + (synth_vp8_mb_value(mx, my, doc_id) - 40 + 17 * k) % 176
                for my in range(mbh) for mx in range(mbw)
            ) / (mbw * mbh)
            assert out[k][4] == pytest.approx(exp, abs=1e-12)


def test_webp_lossy_frame_with_alph_rejected():
    from embulk_spark.functions.vp8 import encode_vp8_flat_mbs
    from embulk_spark.functions.vp8l import encode_webp_animated, webp_frames
    import struct

    payload = encode_vp8_flat_mbs(16, 16, 4, lambda mx, my: 100)
    data = bytearray(encode_webp_animated(
        16, 16, [{"vp8_payload": payload, "no_blend": True}]
    ))
    # splice an ALPH chunk ahead of the VP8 chunk inside the ANMF body
    i = bytes(data).find(b"ANMF")
    body_start = i + 8 + 16  # past tag+size+frame header
    alph = b"ALPH" + struct.pack("<I", 2) + b"\x00\x00"
    data = data[:body_start] + alph + data[body_start:]
    # fix the ANMF and RIFF sizes
    (anmf_size,) = struct.unpack_from("<I", data, i + 4)
    struct.pack_into("<I", data, i + 4, anmf_size + len(alph))
    (riff_size,) = struct.unpack_from("<I", data, 4)
    struct.pack_into("<I", data, 4, riff_size + len(alph))
    with pytest.raises(ValueError, match="ALPH"):
        webp_frames(bytes(data))
