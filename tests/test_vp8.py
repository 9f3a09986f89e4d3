"""Vendored lossy-VP8 key-frame codec (functions/vp8.py): fixture round
trips against independent arithmetic, boolean-coder enc/dec mirror
fuzz, honest profile boundaries, and backend routing. The heavyweight
pixel-exact conformance against the system libwebp lives in
tests/test_libwebp_conformance.py."""

from __future__ import annotations

import random

import pytest

from embulk_spark.functions.vp8 import (
    _BoolDec,
    _BoolEnc,
    decode_vp8,
    decode_vp8_planes,
    encode_vp8_flat_mbs,
    synth_vp8_bytes,
    synth_vp8_dims,
    synth_vp8_mb_value,
    wrap_webp,
)
from embulk_spark.functions.vp8l import decode_webp


def _vp8_oracle(doc_id: int) -> tuple[int, int, float]:
    w, h = synth_vp8_dims(doc_id)
    s = sum(
        synth_vp8_mb_value(x // 16, y // 16, doc_id)
        for y in range(h)
        for x in range(w)
    )
    return w, h, s / float(w * h)


@pytest.mark.parametrize("doc_id", [0, 1, 5, 17, 100, 255, 999])
def test_vp8_fixture_roundtrip_matches_arithmetic(doc_id):
    data = synth_vp8_bytes(doc_id)
    assert decode_webp(data) == _vp8_oracle(doc_id)


def test_vp8_flat_mbs_reconstruct_exactly_any_q_divisible():
    """q=4 (y2dc=16 divides 64e for every integer e): arbitrary MB
    values reconstruct exactly, including values near the clip rails'
    safe zone and multi-row MB grids."""
    def val(mx, my):
        return 30 + (37 * mx + 11 * my) % 200

    pay = encode_vp8_flat_mbs(80, 48, 4, val)
    w, h, y, u, v = decode_vp8_planes(pay)
    assert (w, h) == (80, 48)
    exp = bytes(val(x // 16, yy // 16) for yy in range(48) for x in range(80))
    assert bytes(y) == exp
    assert set(u) == {128} and set(v) == {128}


def test_vp8_bool_coder_mirror_fuzz():
    """The §7.3 boolean encoder/decoder pair round-trips random bit
    sequences at random probabilities (the decoder side is separately
    hand-verified conformant against reference streams)."""
    rng = random.Random(11)
    for _ in range(60):
        seq = [
            (rng.randint(0, 1), rng.randint(1, 255))
            for _ in range(rng.randint(1, 300))
        ]
        be = _BoolEnc()
        for bit, p in seq:
            be.put(bit, p)
        bd = _BoolDec(be.flush())
        assert [bd.get(p) for _b, p in seq] == [b for b, _p in seq]


def test_vp8_rejects_out_of_profile():
    with pytest.raises(ValueError, match="interframe"):
        decode_vp8(bytes([0x01, 0, 0]) + b"\x9d\x01\x2a" + bytes(10))
    with pytest.raises(ValueError, match="start code"):
        decode_vp8(bytes([0x00, 0, 0]) + b"\xde\xad\xbe" + bytes(10))
    with pytest.raises(ValueError, match="truncated"):
        decode_vp8(b"\x00")
    # a VP8X extended container with NO still frame inside rejects
    # (the walk itself is real since round 5 — alpha stills decode)
    import struct as _st

    vp8x = (
        b"RIFF" + _st.pack("<I", 22) + b"WEBP"
        + b"VP8X" + _st.pack("<I", 10) + bytes(10)
    )
    with pytest.raises(ValueError, match="no VP8L chunk"):
        decode_webp(vp8x)


def test_vp8_routes_through_decode_webp_container():
    """The RIFF walk hands lossy VP8 chunks to the vendored decoder."""
    data = synth_vp8_bytes(3)
    assert data[:4] == b"RIFF" and data[12:16] == b"VP8 "
    assert decode_webp(data) == _vp8_oracle(3)


def test_vp8_backend_feature_shape(spark):
    from pyspark.sql import functions as F

    from embulk_spark.functions.multimodal import (
        decode_image_features,
        synth_vp8_col,
    )

    df = spark.range(6).select(
        F.col("id"), synth_vp8_col(F.col("id")).alias("media")
    )
    rows = {r.id: r for r in decode_image_features(df).collect()}
    assert len(rows) == 6
    for i in range(6):
        w, h, mean = _vp8_oracle(i)
        r = rows[i]
        assert (r.container, r.width, r.height) == ("webp", w, h)
        assert abs(r.mean_luma - mean) < 1e-9
