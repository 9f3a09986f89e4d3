"""Arithmetic-coded JPEG (SOF9) codec: functions/jpeg_arith.py.

Three layers of evidence, mirroring the baseline/progressive JPEG
suites:
  1. QM-coder bit-level fuzz — the Annex-D encoder and decoder must be
     exact inverses over random decision/context sequences (this is
     what exercises the carry / stacked-0xFF / flush byteout paths
     deterministically);
  2. closed-form block-constant fixtures — the lossy round trip is
     exact, so decode must equal the SQL-oracle arithmetic;
  3. cross-entropy-coder parity — the SAME image encoded baseline
     (huffman) and SOF9 (arithmetic) must decode identically: the
     models sit above the entropy layer.
Reference-decoder conformance lives in test_libjpeg_conformance.py.
"""

from __future__ import annotations

import random

import pytest

from embulk_spark.functions.jpeg import (
    decode_jpeg,
    encode_jpeg_color420,
    encode_jpeg_gray,
    reconstructed_flat_value,
)
from embulk_spark.functions.jpeg_arith import (
    _QMDecoder,
    _QMEncoder,
    encode_jpeg_color420_arith,
    encode_jpeg_gray_arith,
    encode_jpeg_gray_progressive_arith,
    synth_jpeg_arith_bytes,
    synth_jpeg_prog_arith_bytes,
)
from embulk_spark.functions.jpeg import synth_block_value, synth_jpeg_dims


# ---------------------------------------------------------------------------
# 1. QM coder inverse fuzz
# ---------------------------------------------------------------------------


def _roundtrip_decisions(decisions, nbins):
    enc = _QMEncoder()
    st = bytearray(nbins)
    for i, d in decisions:
        enc.encode(st, i, d)
    data = enc.flush() + b"\xFF\xD9"
    dec = _QMDecoder(data, 0)
    st2 = bytearray(nbins)
    got = [(i, dec.decode(st2, i)) for i, _ in decisions]
    return got


def test_qm_coder_random_sequences_roundtrip_exactly():
    rng = random.Random(1234)
    for trial in range(40):
        nbins = rng.choice([1, 3, 16])
        n = rng.randrange(1, 2000)
        # vary the symbol bias so the estimator walks deep into the
        # Table D.3 chain (tiny Qe → long MPS runs → carry pressure)
        bias = rng.choice([0.02, 0.2, 0.5, 0.8, 0.98])
        decisions = [
            (rng.randrange(nbins), 1 if rng.random() < bias else 0)
            for _ in range(n)
        ]
        assert _roundtrip_decisions(decisions, nbins) == decisions


def test_qm_coder_pathological_sequences_roundtrip():
    # all-MPS (short path only), all-LPS (constant exchange), strict
    # alternation (renorm every symbol near state 0)
    for pattern in ([0] * 3000, [1] * 3000, [0, 1] * 1500):
        decisions = [(0, d) for d in pattern]
        assert _roundtrip_decisions(decisions, 1) == decisions


def test_qm_stream_is_marker_clean():
    # every 0xFF in the entropy segment must be 0x00-stuffed
    rng = random.Random(7)
    decisions = [(0, rng.randrange(2)) for _ in range(5000)]
    enc = _QMEncoder()
    st = bytearray(1)
    for i, d in decisions:
        enc.encode(st, i, d)
    data = enc.flush()
    for k, b in enumerate(data):
        if b == 0xFF:
            assert k + 1 < len(data) and data[k + 1] == 0x00


# ---------------------------------------------------------------------------
# 2. closed-form fixtures
# ---------------------------------------------------------------------------


def test_block_constant_closed_form():
    for doc_id in range(12):
        w, h = synth_jpeg_dims(doc_id)
        data = synth_jpeg_arith_bytes(doc_id)
        gw, gh, mean = decode_jpeg(data)
        assert (gw, gh) == (w, h)
        total = 0
        for by in range(h // 8):
            for bx in range(w // 8):
                total += 64 * reconstructed_flat_value(
                    synth_block_value(bx, by, doc_id)
                )
        assert mean == pytest.approx(total / (w * h), abs=1e-12)


def test_arith_streams_are_smaller_than_huffman():
    # the point of arithmetic coding: adaptivity beats the fixed
    # Annex-K tables on these fixtures
    f = lambda x, y: ((x // 8) * 37 + (y // 8) * 59) % 256  # noqa: E731
    assert len(encode_jpeg_gray_arith(64, 64, f)) < len(
        encode_jpeg_gray(64, 64, f)
    )


# ---------------------------------------------------------------------------
# 3. cross-entropy-coder parity (same models above both coders)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "w,h,ri",
    [(40, 33, 0), (64, 16, 3), (57, 41, 7), (8, 8, 0), (17, 9, 1)],
)
def test_gray_parity_with_baseline(w, h, ri):
    f = lambda x, y: (x * 7 + y * 13 + (x * y) % 31) % 256  # noqa: E731
    a = decode_jpeg(encode_jpeg_gray_arith(w, h, f, restart_interval=ri))
    b = decode_jpeg(encode_jpeg_gray(w, h, f, restart_interval=ri))
    assert a == b


def test_color420_parity_with_baseline():
    f = lambda x, y: ((x * 5) % 256, (y * 9) % 256, (x + y) % 256)  # noqa: E731
    a = decode_jpeg(encode_jpeg_color420_arith(33, 17, f))
    b = decode_jpeg(encode_jpeg_color420(33, 17, f))
    assert a == b


def test_random_content_parity_with_baseline():
    rng = random.Random(42)
    for _ in range(4):
        w, h = rng.randrange(8, 64), rng.randrange(8, 48)
        vals = [[rng.randrange(256) for _ in range(w)] for _ in range(h)]
        f = lambda x, y: vals[y][x]  # noqa: E731
        assert decode_jpeg(encode_jpeg_gray_arith(w, h, f)) == decode_jpeg(
            encode_jpeg_gray(w, h, f)
        )


def test_dac_conditioning_roundtrip():
    # non-default (L=1, U=2, Kx=2) declared via DAC: different contexts
    # on both sides, same pixels
    f = lambda x, y: (x * 11 + y * 5 + (x ^ y)) % 256  # noqa: E731
    default = decode_jpeg(encode_jpeg_gray_arith(48, 40, f))
    tuned = decode_jpeg(encode_jpeg_gray_arith(48, 40, f, dc_cond=(1, 2), kx=2))
    assert tuned == default  # lossless-identical coefficients
    # and the DAC stream really differs from the default stream
    assert encode_jpeg_gray_arith(48, 40, f) != encode_jpeg_gray_arith(
        48, 40, f, dc_cond=(1, 2), kx=2
    )


# ---------------------------------------------------------------------------
# progressive arithmetic (SOF10)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "w,h,kw",
    [
        (40, 33, {}),
        (57, 41, {"dc_al": 2, "ac_al": 2, "split": 10}),
        (16, 16, {"dc_al": 0, "ac_al": 0}),  # first scans only
        (24, 16, {"split": 2}),  # near-degenerate low band
        (48, 40, {"split": 63}),  # near-degenerate high band
    ],
)
def test_progressive_arith_parity_with_baseline(w, h, kw):
    """A fully-refined SOF10 stream reaches the same coefficients as
    the sequential huffman stream of the same image — every G.2 scan
    kind (DC first/refine, AC first/refine over both bands) composes
    exactly."""
    f = lambda x, y: (x * 7 + y * 13 + (x * y) % 31) % 256  # noqa: E731
    a = decode_jpeg(encode_jpeg_gray_progressive_arith(w, h, f, **kw))
    b = decode_jpeg(encode_jpeg_gray(w, h, f))
    assert a == b


def test_progressive_arith_random_content_parity():
    rng = random.Random(77)
    for _ in range(3):
        w, h = rng.randrange(8, 56), rng.randrange(8, 48)
        vals = [[rng.randrange(256) for _ in range(w)] for _ in range(h)]
        f = lambda x, y: vals[y][x]  # noqa: E731
        assert decode_jpeg(
            encode_jpeg_gray_progressive_arith(w, h, f)
        ) == decode_jpeg(encode_jpeg_gray(w, h, f))


def test_prog_arith_fixture_closed_form():
    for doc_id in range(8):
        w, h = synth_jpeg_dims(doc_id)
        gw, gh, mean = decode_jpeg(synth_jpeg_prog_arith_bytes(doc_id))
        assert (gw, gh) == (w, h)
        total = 0
        for by in range(h // 8):
            for bx in range(w // 8):
                total += 64 * reconstructed_flat_value(
                    synth_block_value(bx, by, doc_id)
                )
        assert mean == pytest.approx(total / (w * h), abs=1e-12)


# ---------------------------------------------------------------------------
# boundaries
# ---------------------------------------------------------------------------


def test_sequential_stream_relabeled_sof10_rejected():
    # a SEQUENTIAL arithmetic stream relabeled SOF10 is malformed
    # progressive (its scan header Ss=0,Se=63 is not a legal DC scan)
    # — rejected, never mis-decoded
    data = bytearray(encode_jpeg_gray_arith(16, 16, lambda x, y: x * 8))
    i = bytes(data).find(b"\xFF\xC9")
    data[i + 1] = 0xCA
    with pytest.raises(ValueError, match="DC scan"):
        decode_jpeg(bytes(data))


def test_arith_stream_relabeled_lossless_rejected():
    data = bytearray(encode_jpeg_gray_arith(16, 16, lambda x, y: x * 8))
    i = bytes(data).find(b"\xFF\xC9")
    data[i + 1] = 0xCB  # SOF11: lossless arithmetic — out of scope
    with pytest.raises(ValueError, match="non-DCT"):
        decode_jpeg(bytes(data))


def test_out_of_sequence_restart_rejected():
    data = bytearray(
        encode_jpeg_gray_arith(64, 16, lambda x, y: (x * 3 + y) % 256,
                               restart_interval=3)
    )
    i = bytes(data).find(b"\xFF\xD0")
    assert i > 0
    data[i + 1] = 0xD5  # wrong RSTn ordinal
    with pytest.raises(ValueError):
        decode_jpeg(bytes(data))
