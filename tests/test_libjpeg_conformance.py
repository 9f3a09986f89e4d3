"""Conformance of the vendored JPEG encoders (functions/jpeg.py)
against the SYSTEM libjpeg-turbo (6.2 ABI), bound via a
subprocess-isolated ctypes probe (tests/_helpers/libjpeg_probe.py —
isolated because probing the version-sensitive struct size corrupts
memory by design on a miss).

JPEG's IDCT is not bit-mandated (T.81 allows implementation variance),
so unlike the WebP suite the general assertion is tolerance-bounded.
The BLOCK-CONSTANT fixtures are the exception: their blocks are
DC-only, and a DC-only block reconstructs identically under every
conformant IDCT — so our baseline AND progressive encoder streams must
decode EXACTLY to the closed form under the reference decoder."""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile

import pytest

_SO = "/usr/lib/x86_64-linux-gnu/libjpeg.so.62"
_PROBE = os.path.join(os.path.dirname(__file__), "_helpers", "libjpeg_probe.py")

pytestmark = pytest.mark.skipif(
    not os.path.exists(_SO), reason="system libjpeg absent"
)

_structsize_cache: list = []


def _structsize() -> int:
    if not _structsize_cache:
        from embulk_spark.functions.jpeg import encode_jpeg_gray

        data = encode_jpeg_gray(16, 16, lambda x, y: (x + y) % 256)
        f = tempfile.NamedTemporaryFile(suffix=".jpg", delete=False)
        f.write(data)
        f.close()
        try:
            for s in range(440, 1100, 8):
                r = subprocess.run(
                    [sys.executable, _PROBE, str(s), f.name, "16", "16", "1"],
                    capture_output=True, timeout=30,
                )
                if r.returncode == 0 and len(r.stdout) == 256:
                    _structsize_cache.append(s)
                    break
            else:
                pytest.skip("no working jpeg_decompress_struct size found")
        finally:
            os.unlink(f.name)
    return _structsize_cache[0]


def libjpeg_decode(data: bytes, w: int, h: int, comps: int) -> bytes:
    f = tempfile.NamedTemporaryFile(suffix=".jpg", delete=False)
    f.write(data)
    f.close()
    try:
        r = subprocess.run(
            [sys.executable, _PROBE, str(_structsize()), f.name,
             str(w), str(h), str(comps)],
            capture_output=True, timeout=60,
        )
    finally:
        os.unlink(f.name)
    if r.returncode != 0:
        raise ValueError(f"libjpeg probe rc={r.returncode}")
    if len(r.stdout) != w * h * comps:
        raise ValueError("short libjpeg read")
    return r.stdout


def test_baseline_fixtures_decode_exactly_under_libjpeg():
    """Block-constant baseline streams: DC-only blocks are IDCT-
    implementation-independent, so the reference decoder must produce
    the closed form byte-exactly."""
    from embulk_spark.functions.jpeg import (
        reconstructed_flat_value,
        synth_block_value,
        synth_jpeg_bytes,
        synth_jpeg_dims,
    )

    for doc_id in (0, 1, 5, 17, 100):
        data = synth_jpeg_bytes(doc_id)
        w, h = synth_jpeg_dims(doc_id)
        got = libjpeg_decode(data, w, h, 1)
        want = bytes(
            reconstructed_flat_value(synth_block_value(x // 8, y // 8, doc_id))
            for y in range(h) for x in range(w)
        )
        assert got == want, doc_id


def test_progressive_fixtures_decode_exactly_under_libjpeg():
    """The Annex-G progressive encoder (DC successive approximation,
    spectral bands, AC refinements, EOB runs) through the REFERENCE
    decoder — layout bugs shared with our own decoder cannot hide."""
    from embulk_spark.functions.jpeg import (
        reconstructed_flat_value,
        synth_block_value,
        synth_jpeg_dims,
        synth_jpeg_progressive_bytes,
    )

    for doc_id in (0, 2, 7, 33, 100):
        data = synth_jpeg_progressive_bytes(doc_id)
        w, h = synth_jpeg_dims(doc_id)
        got = libjpeg_decode(data, w, h, 1)
        want = bytes(
            reconstructed_flat_value(synth_block_value(x // 8, y // 8, doc_id))
            for y in range(h) for x in range(w)
        )
        assert got == want, doc_id


def test_varying_content_tracks_libjpeg_within_idct_tolerance():
    """Non-constant blocks: our decoder's mean vs the reference
    decoder's mean must agree within IDCT variance (a desync produces
    garbage, not a sub-luma-level delta)."""
    from embulk_spark.functions.jpeg import decode_jpeg, encode_jpeg_gray

    for w, h, fn in [
        (24, 16, lambda x, y: (x * 11 + y * 7) % 256),
        (40, 32, lambda x, y: (x * x + 3 * y) % 256),
    ]:
        data = encode_jpeg_gray(w, h, fn)
        ref = libjpeg_decode(data, w, h, 1)
        ref_mean = sum(ref) / (w * h)
        gw, gh, mean = decode_jpeg(data)
        assert (gw, gh) == (w, h)
        assert abs(mean - ref_mean) < 0.75, (w, h, mean, ref_mean)


def test_arith_fixtures_decode_exactly_under_libjpeg():
    """SOF9 arithmetic streams (QM coder, Annex D) through the
    REFERENCE decoder's jinit_arith_decoder: block-constant fixtures
    must reproduce the closed form byte-exactly — this adjudicates the
    Table D.3 state machine, byteout/carry/stuffing, FLUSH, and the
    F.1.4.4 DC/AC models against libjpeg-turbo."""
    from embulk_spark.functions.jpeg import (
        reconstructed_flat_value,
        synth_block_value,
        synth_jpeg_dims,
    )
    from embulk_spark.functions.jpeg_arith import synth_jpeg_arith_bytes

    for doc_id in (0, 1, 5, 17, 100):
        data = synth_jpeg_arith_bytes(doc_id)
        w, h = synth_jpeg_dims(doc_id)
        got = libjpeg_decode(data, w, h, 1)
        want = bytes(
            reconstructed_flat_value(synth_block_value(x // 8, y // 8, doc_id))
            for y in range(h) for x in range(w)
        )
        assert got == want, doc_id


def test_arith_varying_content_tracks_libjpeg():
    """Varying-content SOF9 streams — gray (with restarts and a DAC
    non-default-conditioning case) and 4:2:0 color — must decode under
    the reference decoder to the same mean our decoder computes, within
    IDCT tolerance."""
    import numpy as np

    from embulk_spark.functions.jpeg import decode_jpeg
    from embulk_spark.functions.jpeg_arith import (
        encode_jpeg_color420_arith,
        encode_jpeg_gray_arith,
    )

    cases = [
        encode_jpeg_gray_arith(40, 33, lambda x, y: (x * 7 + y * 13) % 256),
        encode_jpeg_gray_arith(
            64, 16, lambda x, y: (x * 3 + y * 11) % 256, restart_interval=3
        ),
        encode_jpeg_gray_arith(
            48, 40, lambda x, y: (x * 11 + y * 5 + (x ^ y)) % 256,
            dc_cond=(1, 2), kx=2,
        ),
    ]
    dims = [(40, 33), (64, 16), (48, 40)]
    for data, (w, h) in zip(cases, dims):
        ref = libjpeg_decode(data, w, h, 1)
        ref_mean = sum(ref) / (w * h)
        gw, gh, mean = decode_jpeg(data)
        assert (gw, gh) == (w, h)
        assert abs(mean - ref_mean) < 0.75, (w, h, mean, ref_mean)

    cdata = encode_jpeg_color420_arith(
        34, 18, lambda x, y: ((x * 5) % 256, (y * 9) % 256, (x + y) % 256)
    )
    px = np.frombuffer(libjpeg_decode(cdata, 34, 18, 3), dtype=np.uint8)
    # luma of libjpeg's RGB output vs our Y-plane mean (both BT.601)
    rgb = px.reshape(18, 34, 3).astype(np.float64)
    ref_y = (
        0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    ).mean()
    _, _, mean = decode_jpeg(cdata)
    assert abs(mean - ref_y) < 1.5


def test_arith_random_content_differential_fuzz_under_libjpeg():
    """Randomized images (high-entropy blocks stress the estimator's
    deep states, carry chains and stacked-0xFF resolution): reference
    and vendored decoders must agree on every stream."""
    import random

    from embulk_spark.functions.jpeg import decode_jpeg
    from embulk_spark.functions.jpeg_arith import encode_jpeg_gray_arith

    rng = random.Random(20260822)
    for _ in range(5):
        w, h = rng.randrange(8, 72), rng.randrange(8, 56)
        vals = [[rng.randrange(256) for _ in range(w)] for _ in range(h)]
        data = encode_jpeg_gray_arith(w, h, lambda x, y: vals[y][x])
        ref = libjpeg_decode(data, w, h, 1)
        ref_mean = sum(ref) / (w * h)
        _, _, mean = decode_jpeg(data)
        assert abs(mean - ref_mean) < 0.05, (w, h, mean, ref_mean)


def test_prog_arith_fixtures_decode_exactly_under_libjpeg():
    """SOF10 (progressive arithmetic) streams through the REFERENCE
    decoder: the G.2 scan script (DC first/refine, banded AC
    first/refine) must compose to the closed form byte-exactly."""
    from embulk_spark.functions.jpeg import (
        reconstructed_flat_value,
        synth_block_value,
        synth_jpeg_dims,
    )
    from embulk_spark.functions.jpeg_arith import synth_jpeg_prog_arith_bytes

    for doc_id in (0, 2, 7, 33, 100):
        data = synth_jpeg_prog_arith_bytes(doc_id)
        w, h = synth_jpeg_dims(doc_id)
        got = libjpeg_decode(data, w, h, 1)
        want = bytes(
            reconstructed_flat_value(synth_block_value(x // 8, y // 8, doc_id))
            for y in range(h) for x in range(w)
        )
        assert got == want, doc_id


def test_prog_arith_varying_content_tracks_libjpeg():
    import random

    from embulk_spark.functions.jpeg import decode_jpeg
    from embulk_spark.functions.jpeg_arith import (
        encode_jpeg_gray_progressive_arith,
    )

    g = lambda x, y: (x * 7 + y * 13 + (x * y) % 31) % 256  # noqa: E731
    cases = [
        (40, 33, {}),
        (57, 41, {"dc_al": 2, "ac_al": 2, "split": 10}),
        (24, 16, {"split": 2}),
    ]
    for w, h, kw in cases:
        data = encode_jpeg_gray_progressive_arith(w, h, g, **kw)
        ref = libjpeg_decode(data, w, h, 1)
        ref_mean = sum(ref) / (w * h)
        gw, gh, mean = decode_jpeg(data)
        assert (gw, gh) == (w, h)
        assert abs(mean - ref_mean) < 0.05, (w, h, kw)

    rng = random.Random(5)
    for _ in range(3):
        w, h = rng.randrange(8, 56), rng.randrange(8, 40)
        vals = [[rng.randrange(256) for _ in range(w)] for _ in range(h)]
        data = encode_jpeg_gray_progressive_arith(w, h, lambda x, y: vals[y][x])
        ref = libjpeg_decode(data, w, h, 1)
        _, _, mean = decode_jpeg(data)
        assert abs(mean - sum(ref) / (w * h)) < 0.05
