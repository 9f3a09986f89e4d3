"""Vendored baseline JPEG codec (functions/jpeg.py): decoder verified
against an INDEPENDENT numpy simulation of the DCT→quantize→dequantize→
IDCT round trip (so huffman/bitstream/zigzag/DC-prediction bugs can't
self-cancel), plus the closed-form block-constant fixture contract the
SQL oracle relies on, restart markers, 4:2:0 color, and the honest
ValueError boundary for non-baseline streams."""

from __future__ import annotations

import numpy as np
import pytest

from embulk_spark.functions.jpeg import (
    STD_LUMA_QT,
    encode_jpeg_gray_progressive,
    _A,
    _block_at,
    _round_half_away,
    decode_jpeg,
    encode_jpeg_color420,
    encode_jpeg_gray,
    reconstructed_flat_value,
    synth_block_value,
    synth_jpeg_bytes,
    synth_jpeg_dims,
)


def _sim_roundtrip_luma_mean(img: np.ndarray, w: int, h: int) -> float:
    """Independent reference: simulate the codec's lossy round trip on a
    luma plane in pure numpy (no bitstream) and return the decoded
    mean over the w×h crop."""
    bh, bw = (h + 7) // 8, (w + 7) // 8
    plane = np.zeros((bh * 8, bw * 8), dtype=np.int64)
    for by in range(bh):
        for bx in range(bw):
            blk = _block_at(img.astype(float), bx, by)
            S = _A @ (blk - 128.0) @ _A.T
            S = np.round(S * 1048576.0) / 1048576.0
            q = np.array(
                [
                    [_round_half_away(S[r, c] / STD_LUMA_QT[r, c]) for c in range(8)]
                    for r in range(8)
                ]
            )
            blk2 = _A.T @ (q * STD_LUMA_QT) @ _A
            px = np.clip(np.floor(blk2 + 128.5), 0, 255).astype(np.int64)
            plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = px
    crop = plane[:h, :w]
    return int(crop.sum()) / float(w * h)


@pytest.mark.parametrize("dims", [(8, 8), (16, 24), (13, 9), (50, 37)])
def test_gray_roundtrip_matches_independent_sim(dims):
    w, h = dims
    rng = np.random.RandomState(w * 100 + h)
    img = rng.randint(0, 256, size=(h, w))
    blob = encode_jpeg_gray(w, h, lambda x, y: int(img[y, x]))
    dw, dh, mean = decode_jpeg(blob)
    assert (dw, dh) == (w, h)
    assert mean == pytest.approx(_sim_roundtrip_luma_mean(img, w, h), abs=1e-9)


def test_restart_markers_reset_dc_prediction():
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, size=(24, 32))
    blob = encode_jpeg_gray(
        32, 24, lambda x, y: int(img[y, x]), restart_interval=3
    )
    assert b"\xFF\xDD" in blob  # DRI present
    dw, dh, mean = decode_jpeg(blob)
    assert (dw, dh) == (32, 24)
    assert mean == pytest.approx(_sim_roundtrip_luma_mean(img, 32, 24), abs=1e-9)


@pytest.mark.parametrize("dims", [(32, 16), (21, 13)])
def test_color_420_luma_matches_sim(dims):
    """3-component YCbCr 4:2:0: the decoder's MCU interleave, per-
    component DC prediction and subsampled plane assembly must yield a
    luma plane equal to the grayscale sim of the Y channel."""
    w, h = dims
    rng = np.random.RandomState(w + h)
    rgb = rng.randint(0, 256, size=(h, w, 3))
    blob = encode_jpeg_color420(
        w, h, lambda x, y: tuple(int(v) for v in rgb[y, x])
    )
    dw, dh, mean = decode_jpeg(blob)
    assert (dw, dh) == (w, h)
    y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    assert mean == pytest.approx(_sim_roundtrip_luma_mean(y, w, h), abs=1e-9)


def test_block_constant_closed_form():
    """The SQL-oracle contract: block-constant fixtures decode to the
    closed-form value clamp(2·round_half_away((v-128)/2) + 128),
    including the 255-clamp edge (v=255 → 256 → 255)."""
    assert reconstructed_flat_value(255) == 255  # clamp hit
    assert reconstructed_flat_value(0) == 0
    assert reconstructed_flat_value(128) == 128
    for doc_id in range(40):
        blob = synth_jpeg_bytes(doc_id)
        w, h, mean = decode_jpeg(blob)
        assert (w, h) == synth_jpeg_dims(doc_id)
        vals = [
            reconstructed_flat_value(synth_block_value(bx, by, doc_id))
            for by in range(h // 8)
            for bx in range(w // 8)
        ]
        assert mean == pytest.approx(sum(vals) / len(vals), abs=1e-12)


def test_non_baseline_and_garbage_raise():
    with pytest.raises(ValueError):
        decode_jpeg(b"\xFF\xD8\xFF\xE0not a real stream")
    with pytest.raises(ValueError):
        decode_jpeg(b"GIF89a")
    # HIERARCHICAL frames (SOF5) are detected and refused, not
    # mis-decoded (SOF0/1/2/3/9/10 are all REAL now)
    blob = bytearray(synth_jpeg_bytes(1))
    i = blob.find(b"\xFF\xC0")
    blob[i + 1] = 0xC5
    with pytest.raises(ValueError, match="non-DCT"):
        decode_jpeg(bytes(blob))
    # a BASELINE stream relabeled SOF3 is malformed lossless (its scan
    # header Ss=0 is not a predictor selector; its DHT has DCT-sized
    # codes) — rejected, never mis-decoded
    blob = bytearray(synth_jpeg_bytes(1))
    i = blob.find(b"\xFF\xC0")
    blob[i + 1] = 0xC3
    with pytest.raises(ValueError):
        decode_jpeg(bytes(blob))
    # a BASELINE stream merely relabeled SOF2 is malformed progressive
    # (its sequential scan header Ss=0,Se=63 is not a legal DC scan) —
    # rejected, never mis-decoded
    blob = bytearray(synth_jpeg_bytes(1))
    i = blob.find(b"\xFF\xC0")
    blob[i + 1] = 0xC2
    with pytest.raises(ValueError, match="DC scan"):
        decode_jpeg(bytes(blob))


def test_backend_routes_jpeg_and_preserves_fake_fallback():
    from embulk_spark.functions.multimodal import (
        _decode_backend,
        _fake_image_decode,
    )

    blob = synth_jpeg_bytes(3)
    assert _decode_backend(blob) == decode_jpeg(blob)
    # JPEG-magic synthetic bytes (multimodal_decode_fake fixture shape)
    # still take the deterministic fake tier
    junk = b"\xFF\xD8\xFF\xE0" + b"hello web"
    assert _decode_backend(junk) == _fake_image_decode(junk)


def test_decode_image_features_jpeg_end_to_end(spark):
    from pyspark.sql import functions as F

    from embulk_spark.functions.multimodal import (
        decode_image_features,
        synth_jpeg_col,
    )

    df = spark.range(0, 12).select(
        F.col("id"), synth_jpeg_col(F.col("id")).alias("media")
    )
    rows = {r["id"]: r for r in decode_image_features(df).collect()}
    assert len(rows) == 12
    for i in range(12):
        w, h = synth_jpeg_dims(i)
        assert rows[i]["container"] == "jpeg"
        assert (rows[i]["width"], rows[i]["height"]) == (w, h)
        _, _, mean = decode_jpeg(synth_jpeg_bytes(i))
        assert rows[i]["mean_luma"] == pytest.approx(mean, abs=1e-12)


# ---------------------------------------------------------------------------
# progressive (SOF2, Annex G) — round-4 extension
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("dims", [(8, 8), (24, 16), (19, 21), (96, 80)])
def test_progressive_parity_with_baseline(dims):
    """A fully-refined progressive stream carries the SAME quantized
    coefficients as the sequential one (shared _quantize_block), so the
    decodes must be bit-identical — through DC successive approximation,
    two spectral bands, EOB runs, and AC refinement."""
    w, h = dims

    def pix(x, y):
        return (x * x * 3 + y * 17 + (x * y) % 31) % 256

    base = decode_jpeg(encode_jpeg_gray(w, h, pix))
    prog = decode_jpeg(encode_jpeg_gray_progressive(w, h, pix))
    assert prog == base


@pytest.mark.parametrize(
    "dc_al,split,ac_al", [(0, 2, 0), (2, 10, 2), (1, 33, 3), (3, 6, 1)]
)
def test_progressive_scan_shapes(dc_al, split, ac_al):
    """Every successive-approximation depth and spectral split must
    compose to the exact coefficients (incl. the no-refinement Al=0
    edge and deep 3-bit approximation)."""

    def pix(x, y):
        return (x * 31 + y * 7) % 256

    base = decode_jpeg(encode_jpeg_gray(24, 16, pix))
    prog = decode_jpeg(
        encode_jpeg_gray_progressive(
            24, 16, pix, dc_al=dc_al, split=split, ac_al=ac_al
        )
    )
    assert prog == base


def test_progressive_block_constant_closed_form():
    """The progressive fixture's decode equals the SAME closed form as
    the baseline fixture (only DC survives a block-constant image) —
    the SQL-oracle contract."""
    from embulk_spark.functions.jpeg import synth_jpeg_progressive_bytes

    for doc_id in (0, 3, 7, 11):
        w, h = synth_jpeg_dims(doc_id)
        got = decode_jpeg(synth_jpeg_progressive_bytes(doc_id))
        total = 0
        for by in range(h // 8):
            for bx in range(w // 8):
                total += 64 * reconstructed_flat_value(
                    synth_block_value(bx, by, doc_id)
                )
        assert got == (w, h, total / float(w * h))


def test_progressive_backend_routes_real():
    """_decode_backend real-decodes SOF2 now (it was a declared fake
    tier through round 3)."""
    from embulk_spark.functions.jpeg import encode_jpeg_gray_progressive
    from embulk_spark.functions.multimodal import _decode_backend

    data = encode_jpeg_gray_progressive(
        24, 16, lambda x, y: (x * 5 + y * 3) % 256
    )
    assert _decode_backend(data) == decode_jpeg(data)


# ---------------------------------------------------------------------------
# lossless (SOF3, Annex H)
# ---------------------------------------------------------------------------


def test_lossless_all_predictors_roundtrip_exactly():
    import random

    from embulk_spark.functions.jpeg import encode_jpeg_gray_lossless

    f = lambda x, y: (29 * x + 43 * y + 7) % 256  # noqa: E731
    exp = sum(f(x, y) for y in range(11) for x in range(19)) / (19 * 11)
    for pred in range(1, 8):
        d = encode_jpeg_gray_lossless(19, 11, f, predictor=pred)
        assert decode_jpeg(d) == (19, 11, exp), pred
    # random content is reproduced exactly (it IS lossless)
    rng = random.Random(3)
    for _ in range(3):
        w, h = rng.randrange(1, 40), rng.randrange(1, 30)
        vals = [[rng.randrange(256) for _ in range(w)] for _ in range(h)]
        d = encode_jpeg_gray_lossless(
            w, h, lambda x, y: vals[y][x], predictor=rng.randrange(1, 8)
        )
        gw, gh, mean = decode_jpeg(d)
        assert (gw, gh) == (w, h)
        assert mean == pytest.approx(sum(map(sum, vals)) / (w * h), abs=1e-12)


def test_lossless_point_transform_and_restart():
    from embulk_spark.functions.jpeg import encode_jpeg_gray_lossless

    f = lambda x, y: (29 * x + 43 * y + 7) % 256  # noqa: E731
    for pt in (1, 3):
        d = encode_jpeg_gray_lossless(9, 7, f, predictor=4, pt=pt)
        exp = sum(
            (f(x, y) >> pt) << pt for y in range(7) for x in range(9)
        ) / (9 * 7)
        assert decode_jpeg(d) == (9, 7, exp)
    d = encode_jpeg_gray_lossless(16, 12, f, predictor=2, restart_interval=48)
    exp = sum(f(x, y) for y in range(12) for x in range(16)) / (16 * 12)
    assert decode_jpeg(d) == (16, 12, exp)


def test_lossless_bad_predictor_and_sequence_rejected():
    from embulk_spark.functions.jpeg import encode_jpeg_gray_lossless

    with pytest.raises(ValueError):
        encode_jpeg_gray_lossless(8, 8, lambda x, y: x, predictor=8)
    d = bytearray(encode_jpeg_gray_lossless(8, 8, lambda x, y: x * 9))
    i = bytes(d).find(b"\xFF\xDA")
    # SOS layout: FF DA len2 Ns cid tdta Ss Se A — Ss at i+7
    d[i + 7] = 0  # Ss=0: not a legal lossless predictor selector
    with pytest.raises(ValueError):
        decode_jpeg(bytes(d))


def test_lossless_high_precision_roundtrip():
    """2..16-bit lossless (the DNG/raw tier): exact reproduction at
    every precision, incl. the category-16 (diff ≡ ±32768) edge that
    only 16-bit streams can reach."""
    import random

    from embulk_spark.functions.jpeg import encode_jpeg_gray_lossless

    rng = random.Random(14)
    for p in (2, 4, 12, 14, 16):
        mx = (1 << p) - 1
        w, h = rng.randrange(2, 30), rng.randrange(2, 24)
        vals = [[rng.randrange(mx + 1) for _ in range(w)] for _ in range(h)]
        d = encode_jpeg_gray_lossless(
            w, h, lambda x, y: vals[y][x],
            predictor=rng.randrange(1, 8), precision=p,
        )
        gw, gh, mean = decode_jpeg(d)
        assert (gw, gh) == (w, h)
        assert mean == pytest.approx(
            sum(map(sum, vals)) * 255 / (mx * w * h), abs=1e-9
        ), p
    # category 16: first-sample pred is 2^15, sample 0 → diff -32768
    f = lambda x, y: [0, 32768][x % 2]  # noqa: E731
    d = encode_jpeg_gray_lossless(8, 3, f, predictor=1, precision=16)
    _, _, mean = decode_jpeg(d)
    exp = sum(f(x, y) for y in range(3) for x in range(8)) * 255 / (
        65535 * 8 * 3
    )
    assert mean == pytest.approx(exp, abs=1e-9)
    # 12-bit DCT frames stay rejected (only LOSSLESS is multi-precision)
    blob = bytearray(encode_jpeg_gray(16, 16, lambda x, y: x * 7))
    i = bytes(blob).find(b"\xFF\xC0")
    blob[i + 4] = 12  # SOF precision byte
    with pytest.raises(ValueError, match="precision"):
        decode_jpeg(bytes(blob))


# ---------------------------------------------------------------------------
# 12-bit extended sequential (SOF1 huffman / SOF9 arithmetic)
# ---------------------------------------------------------------------------


def test_12bit_block_constant_closed_form():
    from embulk_spark.functions.jpeg import (
        encode_jpeg_gray12,
        reconstructed_flat_value12,
    )

    f = lambda x, y: (661 * (x // 8) + 997 * (y // 8) + 37) % 4096  # noqa: E731
    d = encode_jpeg_gray12(24, 16, f)
    w, h, mean = decode_jpeg(d)
    tot = sum(
        64 * reconstructed_flat_value12(f(8 * bx, 8 * by))
        for by in range(2) for bx in range(3)
    )
    assert (w, h) == (24, 16)
    assert mean == pytest.approx(tot * 255 / (4095.0 * 24 * 16), abs=1e-12)
    # clamp edges of the closed form
    assert reconstructed_flat_value12(4095) == 4095
    assert reconstructed_flat_value12(0) == 0


def test_12bit_huffman_arith_parity():
    """The SAME 12-bit image through SOF1 (huffman) and SOF9
    (arithmetic) must decode identically — the 12-bit level shift,
    clamp and 255/4095 scale sit above both entropy coders."""
    import random

    from embulk_spark.functions.jpeg import encode_jpeg_gray12
    from embulk_spark.functions.jpeg_arith import encode_jpeg_gray_arith

    g = lambda x, y: (x * 131 + y * 257) % 4096  # noqa: E731
    assert decode_jpeg(
        encode_jpeg_gray_arith(33, 21, g, precision=12)
    ) == decode_jpeg(encode_jpeg_gray12(33, 21, g))
    rng = random.Random(1212)
    for _ in range(2):
        w, h = rng.randrange(8, 48), rng.randrange(8, 40)
        vals = [[rng.randrange(4096) for _ in range(w)] for _ in range(h)]
        f = lambda x, y: vals[y][x]  # noqa: E731
        assert decode_jpeg(
            encode_jpeg_gray_arith(w, h, f, precision=12)
        ) == decode_jpeg(encode_jpeg_gray12(w, h, f))


def test_12bit_baseline_sof0_still_rejected():
    from embulk_spark.functions.jpeg import encode_jpeg_gray12

    d = bytearray(encode_jpeg_gray12(16, 16, lambda x, y: x * 16))
    i = bytes(d).find(b"\xFF\xC1")
    d[i + 1] = 0xC0  # BASELINE is 8-bit-only per B.2.2
    with pytest.raises(ValueError, match="precision"):
        decode_jpeg(bytes(d))
