"""Multimodal binary-column operators: container sniffing (JVM-side),
decode/resize/frame-sample plumbing (mapInPandas, deterministic fake
backend — see functions/multimodal.py for the stub boundary)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from embulk_spark.functions.multimodal import (
    HAVE_PIL,
    decode_image_features,
    media_meta_cols,
    resize_images,
    sample_frames,
    synth_media_col,
)

PNG = bytes.fromhex("89504E470D0A1A0A") + b"payload"
JPG = bytes.fromhex("FFD8FFE000104A46") + b"payload"
WAV = b"RIFF1234WAVEfmt "
MP4 = bytes.fromhex("0000002066747970") + b"isom"
RAW = b"plain text bytes"


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [(1, PNG), (2, JPG), (3, WAV), (4, MP4), (5, RAW), (6, None)]
    return spark.createDataFrame(rows, "id LONG, media BINARY")


def test_sniff_modalities(media_df):
    got = {
        r["id"]: (r["container"], r["modality"])
        for r in media_df.select("id", *media_meta_cols(F.col("media"))).collect()
    }
    assert got[1] == ("png", "image")
    assert got[2] == ("jpeg", "image")
    assert got[3] == ("riff", "audio")
    assert got[4] == ("mp4", "video")
    assert got[5] == ("bin", "unknown")
    assert got[6] == (None, None)


def test_sniff_is_jvm_only(media_df):
    plan = media_df.select(*media_meta_cols(F.col("media")))._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_decode_image_features(media_df):
    out = decode_image_features(media_df).collect()
    assert {r["id"] for r in out} == {1, 2}  # only image modality decoded
    for r in out:
        assert 16 <= r["width"] <= 4096 and 16 <= r["height"] <= 4096
        assert 0.0 <= r["mean_luma"] <= 255.0
        assert r["n_bytes"] > 0


def test_decode_deterministic_across_runs(media_df):
    a = sorted(map(tuple, decode_image_features(media_df).collect()))
    b = sorted(map(tuple, decode_image_features(media_df.repartition(3)).collect()))
    assert a == b


def test_resize_targets_box(media_df):
    out = {r["id"]: r for r in resize_images(media_df, max_side=64).collect()}
    for r in out.values():
        assert max(r["width"], r["height"]) <= 64
        assert r["media"] is not None


def test_frame_sampling_flatmap(media_df):
    out = sample_frames(media_df, every_ms=500, max_frames=4).collect()
    ids = {r["id"] for r in out}
    assert ids == {4}  # only the video row
    frames = sorted((r["frame_idx"], r["frame_ts_ms"]) for r in out)
    assert frames[0] == (0, 0)
    assert all(ts == idx * 500 for idx, ts in frames)
    assert 1 <= len(frames) <= 4
    assert all(len(r["frame"]) == 16 for r in out)


def test_backend_is_stubbed():
    # this container has no codec libs; the deterministic fake must be on
    assert HAVE_PIL is False


def test_synth_media_matches_magics(spark):
    df = spark.createDataFrame(
        [(i, f"text{i}") for i in range(10)], "doc_id LONG, text STRING"
    )
    out = df.select(
        "doc_id",
        *media_meta_cols(synth_media_col(F.col("doc_id"), F.col("text"))),
    )
    got = {r["doc_id"]: r["container"] for r in out.collect()}
    assert got[0] == "png" and got[1] == "jpeg" and got[2] == "riff"
    assert got[3] == "mp4" and got[4] == "bin"
    assert got[5] == "png"  # cycle repeats


# ---------------------------------------------------------------------------
# real vendored BMP codec
# ---------------------------------------------------------------------------

def test_bmp_roundtrip_with_padding():
    from embulk_spark.functions.multimodal import decode_bmp24, encode_bmp24

    # width 5 → row stride 16 (15 data bytes + 1 pad): exercises padding
    b = encode_bmp24(5, 3, lambda x, y: (x * 10, y * 20, (x + y) % 256))
    w, h, mean = decode_bmp24(b)
    assert (w, h) == (5, 3)
    want = sum(
        (x * 10) + (y * 20) + ((x + y) % 256) for x in range(5) for y in range(3)
    ) / (3.0 * 5 * 3)
    assert mean == want
    assert len(b) == 54 + 3 * 16


def test_bmp_top_down_negative_height():
    import struct

    from embulk_spark.functions.multimodal import decode_bmp24, encode_bmp24

    b = bytearray(encode_bmp24(4, 2, lambda x, y: (x, y, 7)))
    # flip to top-down: height := -height (mean is row-order invariant)
    struct.pack_into("<i", b, 22, -2)
    w, h, mean = decode_bmp24(bytes(b))
    assert (w, h) == (4, 2)
    assert mean == sum(x + y + 7 for x in range(4) for y in range(2)) / (3.0 * 8)


def test_bmp_rejects_non_bmp_and_truncated():
    import pytest as _pytest

    from embulk_spark.functions.multimodal import decode_bmp24, encode_bmp24

    with _pytest.raises(ValueError):
        decode_bmp24(b"not a bitmap at all........................................")
    good = encode_bmp24(8, 8, lambda x, y: (1, 2, 3))
    with _pytest.raises(ValueError):
        decode_bmp24(good[:-10])  # truncated pixel data


def test_bmp_sniffed_as_image(spark):
    from embulk_spark.functions.multimodal import synth_bmp_col

    df = spark.createDataFrame([(i,) for i in range(6)], "doc_id LONG")
    out = df.select(
        "doc_id", *media_meta_cols(synth_bmp_col(F.col("doc_id")))
    ).collect()
    assert all(r["container"] == "bmp" and r["modality"] == "image" for r in out)


def test_decode_real_bmp_through_map_in_pandas(spark):
    from embulk_spark.functions.multimodal import (
        decode_bmp24,
        synth_bmp_bytes,
        synth_bmp_col,
    )

    df = spark.createDataFrame([(i,) for i in range(20)], "id LONG")
    media = df.select("id", synth_bmp_col(F.col("id")).alias("media"))
    got = {r["id"]: r for r in decode_image_features(media).collect()}
    assert len(got) == 20
    for i in range(20):
        w, h, mean = decode_bmp24(synth_bmp_bytes(i))
        r = got[i]
        assert (r["width"], r["height"]) == (w, h)
        assert r["mean_luma"] == mean
        assert r["container"] == "bmp"


def test_wav_header_parse_is_jvm_only(spark):
    """wav_meta_cols is pure Column arithmetic — the plan must contain no
    Python eval (the whole point: metadata filters push down before any
    sample decode)."""
    from embulk_spark.functions.multimodal import synth_wav_bytes, wav_meta_cols

    df = spark.createDataFrame(
        [(i, synth_wav_bytes(i)) for i in range(8)], "id LONG, media BINARY"
    )
    out = df.select("id", *wav_meta_cols(F.col("media")))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    rows = {r["id"]: r for r in out.collect()}
    for i in range(8):
        r = rows[i]
        assert r["channels"] == 1 and r["bits"] == 16
        assert r["sample_rate"] == 8000 * (1 + i % 3)
        assert r["n_frames"] == 64 + i % 129
        # tolerance, not ==: Spark/DuckDB round half-up, Python banker's —
        # i=7 lands exactly on 71/16000 = .0044375
        assert abs(r["duration_sec"] - (64 + i % 129) / (8000 * (1 + i % 3))) < 1e-6


def test_wav_meta_null_for_non_canonical(spark):
    """Garbage, truncated, and non-PCM bytes yield NULL metadata instead
    of nonsense numbers."""
    from embulk_spark.functions.multimodal import synth_wav_bytes

    wav = synth_wav_bytes(3)
    non_pcm = bytearray(wav)
    non_pcm[20] = 3  # audio_format = IEEE float, not PCM
    cases = [
        (0, b"not audio at all"),
        (1, wav[:30]),
        (2, bytes(non_pcm)),
        (3, wav),
    ]
    from embulk_spark.functions.multimodal import wav_meta_cols

    df = spark.createDataFrame(cases, "id LONG, media BINARY")
    rows = {r["id"]: r for r in df.select("id", *wav_meta_cols(F.col("media"))).collect()}
    for i in (0, 1, 2):
        assert rows[i]["sample_rate"] is None and rows[i]["duration_sec"] is None
    assert rows[3]["sample_rate"] == 8000


def test_audio_features_roundtrip_and_filter(spark):
    """RMS/peak computed through the real container match the sample
    arithmetic; non-WAV rows are filtered JVM-side before Python."""
    import math

    from embulk_spark.functions.multimodal import (
        decode_audio_features,
        synth_wav_bytes,
        synth_wav_params,
        synth_wav_sample,
    )

    rows = [(i, synth_wav_bytes(i)) for i in range(12)]
    rows.append((99, b"RIFFgarbage-not-a-wave-file"))
    df = spark.createDataFrame(rows, "id LONG, media BINARY")
    got = {r["id"]: r for r in decode_audio_features(df).collect()}
    assert 99 not in got and len(got) == 12
    for i in range(12):
        rate, n = synth_wav_params(i)
        xs = [synth_wav_sample(i, j) for j in range(n)]
        assert got[i]["n_frames"] == n and got[i]["sample_rate"] == rate
        assert got[i]["peak"] == max(abs(x) for x in xs)
        assert got[i]["rms"] == math.sqrt(sum(x * x for x in xs) / n)


def test_audio_features_multichannel_and_bitdepth_gating(spark):
    """Stereo PCM-16 reads ALL interleaved samples (frames × channels);
    non-16-bit canonical WAVs stop at the metadata tier instead of
    mis-decoding (or over-reading) as int16."""
    import struct

    from embulk_spark.functions.multimodal import (
        decode_audio_features,
        encode_wav_pcm16,
    )

    stereo = encode_wav_pcm16(8000, 2, [100, -100, 200, -200, 300, -300])
    # hand-build an 8-bit mono canonical WAV (bits=8, one byte per sample)
    data8 = bytes([128, 255, 0, 64])
    wav8 = (
        b"RIFF" + struct.pack("<I", 36 + len(data8)) + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 8000, 1, 8)
        + b"data" + struct.pack("<I", len(data8)) + data8
    )
    df = spark.createDataFrame(
        [(1, stereo), (2, wav8)], "id LONG, media BINARY"
    )
    got = {r["id"]: r for r in decode_audio_features(df).collect()}
    assert 2 not in got  # 8-bit: filtered JVM-side, no crash, no bad rms
    r = got[1]
    assert r["n_frames"] == 3  # frames, not samples
    assert r["peak"] == 300    # the max lives in the SECOND half (both ch read)
    import math
    want = math.sqrt((100**2 + 100**2 + 200**2 + 200**2 + 300**2 + 300**2) / 6)
    assert r["rms"] == want


def test_resample_wav_roundtrip(spark):
    """Downsampled output is REAL WAV: the JVM metadata tier re-parses the
    new rate/frames, kept frames equal every k-th original frame, and
    non-divisible or already-low rates pass through untouched."""
    from embulk_spark.functions.multimodal import (
        decode_audio_features,
        resample_wav,
        synth_wav_bytes,
        synth_wav_params,
        synth_wav_sample,
        wav_meta_cols,
    )

    # ids 0..5 cover rates 8000/16000/24000 (divisible by 8000)
    df = spark.createDataFrame(
        [(i, synth_wav_bytes(i)) for i in range(6)], "id LONG, media BINARY"
    )
    out = resample_wav(df, 8000)
    meta = {
        r["id"]: r
        for r in out.select("id", *wav_meta_cols(F.col("media"))).collect()
    }
    feats = {r["id"]: r for r in decode_audio_features(out).collect()}
    for i in range(6):
        rate, n = synth_wav_params(i)
        k = rate // 8000
        want_frames = len(range(0, n, k))
        assert meta[i]["sample_rate"] == 8000
        assert meta[i]["n_frames"] == want_frames
        xs = [synth_wav_sample(i, j) for j in range(0, n, k)]
        assert feats[i]["peak"] == max(abs(x) for x in xs)


# ---------------------------------------------------------------------------
# real PNG codec
# ---------------------------------------------------------------------------

def test_png_roundtrip_all_color_types():
    from embulk_spark.functions.multimodal import decode_png, encode_png

    # gray(0), rgb(2), gray+alpha(4), rgba(6): mean must be the exact
    # integer sum of every channel byte over one double division
    cases = {
        0: lambda x, y: (x + 2 * y,),
        2: lambda x, y: (x, y, x + y),
        4: lambda x, y: (x * 3, 255 - y),
        6: lambda x, y: (x, y, x ^ y, 128),
    }
    for ctype, px in cases.items():
        w, h = 7, 5
        data = encode_png(w, h, px, color_type=ctype)
        gw, gh, mean = decode_png(data)
        ch = len(px(0, 0))
        want = sum(
            v & 0xFF for y in range(h) for x in range(w) for v in px(x, y)
        ) / (ch * 1.0 * w * h)
        assert (gw, gh) == (w, h)
        assert mean == pytest.approx(want, abs=1e-12)


def test_png_unfilter_sub_up_avg_paeth():
    """Hand-filter rows with every filter type and check the decoder
    reconstructs the exact pixel bytes (via the mean)."""
    import struct
    import zlib

    from embulk_spark.functions.multimodal import (
        _png_chunk, _PNG_SIG, decode_png,
    )

    w, h, ch = 4, 5, 3
    pix = [
        [((x * 7 + y * 13 + c * 3) % 256) for x in range(w) for c in range(ch)]
        for y in range(h)
    ]
    raw = bytearray()
    prev = [0] * (w * ch)
    for y, filt in enumerate([0, 1, 2, 3, 4]):
        row = pix[y]
        raw.append(filt)
        for i in range(w * ch):
            a = row[i - ch] if i >= ch else 0
            b = prev[i]
            c = prev[i - ch] if i >= ch else 0
            if filt == 0:
                enc = row[i]
            elif filt == 1:
                enc = row[i] - a
            elif filt == 2:
                enc = row[i] - b
            elif filt == 3:
                enc = row[i] - (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc = row[i] - pred
            raw.append(enc & 0xFF)
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    data = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )
    gw, gh, mean = decode_png(data)
    want = sum(sum(r) for r in pix) / (ch * 1.0 * w * h)
    assert (gw, gh, mean) == (w, h, pytest.approx(want))


def test_png_rejects_out_of_profile():
    import struct
    import zlib

    from embulk_spark.functions.multimodal import (
        _png_chunk, _PNG_SIG, decode_png, encode_png,
    )

    with pytest.raises(ValueError):
        decode_png(b"\x89PNGnope")
    # 16-bit RGB decodes now (round 5) — an all-zero 2×2 is mean 0.0
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    deep = _PNG_SIG + _png_chunk(b"IHDR", ihdr) + _png_chunk(
        b"IDAT", zlib.compress(b"\x00" * 26)
    ) + _png_chunk(b"IEND", b"")
    assert decode_png(deep) == (2, 2, 0.0)
    # 16-bit PALETTE is not a legal PNG — rejected
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 3, 0, 0, 0)
    bad = _PNG_SIG + _png_chunk(b"IHDR", ihdr) + _png_chunk(
        b"IDAT", zlib.compress(b"\x00" * 26)
    ) + _png_chunk(b"IEND", b"")
    with pytest.raises(ValueError):
        decode_png(bad)
    # truncated pixel data
    good = encode_png(3, 3, lambda x, y: (x, y, 0))
    with pytest.raises(ValueError):
        decode_png(good[:40])


def test_png_synth_decodes_through_map_in_pandas(spark):
    from embulk_spark.functions.multimodal import (
        decode_image_features, synth_png_bytes, synth_png_col, synth_png_dims,
    )

    df = spark.range(0, 12).select(
        F.col("id"), synth_png_col(F.col("id")).alias("media")
    )
    got = {r["id"]: r for r in decode_image_features(df).collect()}
    assert len(got) == 12
    for i in range(12):
        w, h = synth_png_dims(i)
        want = sum(
            ((2 * x + y + i) % 256 + (x + 3 * y + 4 * i) % 256
             + (x + y + 7 * i) % 256)
            for x in range(w) for y in range(h)
        ) / (3.0 * w * h)
        r = got[i]
        assert (r["container"], r["width"], r["height"]) == ("png", w, h)
        assert r["mean_luma"] == pytest.approx(want, abs=1e-9)
        assert r["n_bytes"] == len(synth_png_bytes(i))


def test_png_magic_fake_bytes_fall_back_to_fake_tier():
    """synth_media_col's PNG-magic + text payload is NOT a valid PNG; the
    backend must keep routing it to the deterministic fake (the
    multimodal_decode_fake oracle depends on this)."""
    from embulk_spark.functions.multimodal import (
        _decode_backend, _fake_image_decode,
    )

    b = b"\x89PNG\r\n\x1a\x0a" + b"hello world, not chunks"
    assert _decode_backend(b) == _fake_image_decode(b)


def test_avif_metadata_tier():
    """Real ISOBMFF walk: ispe dims recovered from AVIF skeletons
    (incl. a 64-bit largesize meta box), mean honestly NULL; malformed
    avif-magic bytes fall to the fake tier; ftyp brand refines sniff
    to ('avif', 'image') while plain mp4 stays video."""
    import struct

    from embulk_spark.functions.multimodal import (
        _decode_backend,
        parse_avif_dims,
        synth_avif_bytes,
    )

    for i in (0, 3, 77, 499):
        b = synth_avif_bytes(i)
        w = 16 + (i * 37) % 2048
        h = 16 + (i * 53) % 1536
        assert parse_avif_dims(b) == (w, h)
        assert _decode_backend(b) == (w, h, None)

    # 64-bit largesize on the meta box: same walk, 16-byte header
    b = synth_avif_bytes(5)
    i = b.find(b"meta") - 4
    (size,) = struct.unpack_from(">I", b, i)
    big = (
        b[:i]
        + struct.pack(">I", 1) + b"meta" + struct.pack(">Q", size + 8)
        + b[i + 8:]
    )
    assert parse_avif_dims(big) == parse_avif_dims(b)

    # malformed avif-magic bytes: fake tier (mean is a number, not None)
    junk = b"\x00\x00\x00\x14ftypavif" + b"garbage!" * 3
    assert _decode_backend(junk)[2] is not None


def test_avif_sniff_refinement(spark):
    from pyspark.sql import functions as F

    from embulk_spark.functions.multimodal import (
        modality_of,
        synth_avif_bytes,
    )

    rows = spark.createDataFrame(
        [
            (1, synth_avif_bytes(1)),
            (2, b"\x00\x00\x00\x20ftypisom" + b"x" * 16),  # plain mp4
        ],
        "id long, media binary",
    ).select("id", modality_of(F.col("media")).alias("m")).collect()
    got = {r["id"]: (r["m"]["container"], r["m"]["modality"]) for r in rows}
    assert got[1] == ("avif", "image")
    assert got[2] == ("mp4", "video")


def test_resize_bmp_real_nearest():
    """The BMP resize path is REAL: nearest-neighbor with the integer
    source map, re-encoded as a real BMP whose decode matches the
    hand-computed resample; identity when already inside the box."""
    from embulk_spark.functions.multimodal import (
        decode_bmp24,
        resize_bmp24_nearest,
        synth_bmp_bytes,
        synth_bmp_dims,
    )

    for i in (0, 7, 30):
        w, h = synth_bmp_dims(i)
        mx = max(w, h)
        ow = max(1, w * 8 // mx) if mx > 8 else w
        oh = max(1, h * 8 // mx) if mx > 8 else h
        out = resize_bmp24_nearest(synth_bmp_bytes(i), ow, oh)
        gw, gh, mean = decode_bmp24(out)
        assert (gw, gh) == (ow, oh)
        exp = sum(
            (sx + sy + i) % 256
            + (sx + 2 * sy + 2 * i) % 256
            + (3 * sx + sy + 5 * i) % 256
            for y in range(oh) for x in range(ow)
            for sx, sy in [((x * w) // ow, (y * h) // oh)]
        ) / (3.0 * ow * oh)
        assert mean == pytest.approx(exp, abs=1e-12)


def test_resize_images_real_bmp_end_to_end(spark):
    from embulk_spark.functions.multimodal import (
        decode_bmp24,
        resize_bmp24_nearest,
        resize_images,
        synth_bmp_bytes,
        synth_bmp_col,
        synth_bmp_dims,
    )

    df = spark.range(0, 10).select(
        F.col("id"), synth_bmp_col(F.col("id")).alias("media")
    )
    rows = {r["id"]: r for r in resize_images(df, max_side=8).collect()}
    for i in range(10):
        w, h = synth_bmp_dims(i)
        mx = max(w, h)
        ow = max(1, w * 8 // mx) if mx > 8 else w
        oh = max(1, h * 8 // mx) if mx > 8 else h
        r = rows[i]
        assert (r["width"], r["height"]) == (ow, oh)
        # the emitted bytes ARE the resized real BMP
        assert decode_bmp24(bytes(r["media"])) == decode_bmp24(
            resize_bmp24_nearest(synth_bmp_bytes(i), ow, oh)
        )
