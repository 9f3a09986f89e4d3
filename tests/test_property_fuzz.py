"""Hypothesis property fuzz for the row-level parser/filter operators
and the vendored codecs (VERDICT r3 ask #9): the crash-fuzz sweep covers
the commit lattice; this covers VALUE space — random unicode, nulls,
quotes, duplicate labels, overflow numerics — against independent
pure-Python references of the contracted semantics (the same
reference-vs-engine discipline as the DuckDB oracle gate, runnable per
example).

Spark-backed properties batch each hypothesis example into ONE job over
a generated row list (max_examples kept small); codec/LZW properties are
pure Python and run hundreds of examples.
"""

from __future__ import annotations

import base64
import csv as _csv
import io
import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from embulk_spark.functions.coerce import TRUE_STRINGS

SPARK_SETTINGS = settings(
    deadline=None,
    max_examples=10,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# surrogate-free text (Spark/Arrow strings are UTF-8)
_txt = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=40
)


# ---------------------------------------------------------------------------
# pure-python: vendored codecs
# ---------------------------------------------------------------------------


@settings(deadline=None, max_examples=150)
@given(
    data=st.binary(min_size=0, max_size=600),
    mcs=st.integers(min_value=2, max_value=8),
)
def test_gif_lzw_roundtrip_any_bytes(data, mcs):
    """LZW encode→decode is identity for any index stream whose values
    fit the min code size (every code-width boundary crossable)."""
    from embulk_spark.functions.gif import _lzw_decode, _lzw_encode

    data = bytes(b % (1 << mcs) for b in data)
    if not data:
        return
    assert bytes(_lzw_decode(_lzw_encode(data, mcs), mcs, len(data))) == data


@settings(deadline=None, max_examples=60)
@given(
    w=st.integers(min_value=1, max_value=12),
    h=st.integers(min_value=1, max_value=10),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_gif_codec_roundtrip_random_images(w, h, seed):
    from embulk_spark.functions.gif import decode_gif, encode_gif

    pal = bytes(
        (j * 7 + seed + k) % 256 for j in range(256) for k in (0, 3, 5)
    )

    def idx(x, y):
        return (x * 31 + y * 17 + seed) % 256

    got = decode_gif(encode_gif(w, h, pal, idx))
    s = 0
    for y in range(h):
        for x in range(w):
            i = idx(x, y)
            s += sum(pal[3 * i : 3 * i + 3])
    assert got == (w, h, s / (3.0 * w * h))


@settings(deadline=None, max_examples=60)
@given(
    w=st.integers(min_value=1, max_value=12),
    h=st.integers(min_value=1, max_value=10),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_vp8l_codec_roundtrip_random_images(w, h, seed):
    """encode_vp8l's contract: odd rows repeat the row above (emitted as
    LZ77 refs); pixels otherwise arbitrary. Decode must invert exactly
    through the entropy-coded bitstream."""
    from embulk_spark.functions.vp8l import decode_webp, encode_vp8l

    def px(x, y):
        ye = y - (y % 2)
        return (
            (x * 13 + ye * 7 + seed) % 256,
            (x * 5 + ye * 11 + seed * 3) % 256,
            (x + ye + seed * 7) % 256,
        )

    got = decode_webp(encode_vp8l(w, h, px))
    s = sum(sum(px(x, y)) for y in range(h) for x in range(w))
    assert got == (w, h, s / (3.0 * w * h))


# ---------------------------------------------------------------------------
# Spark-backed: parsers / filters vs pure-python references
# ---------------------------------------------------------------------------

_label = st.sampled_from(["a", "b", "c", "host", "time", "路径"])
_ltsv_val = st.text(
    alphabet=st.characters(
        blacklist_categories=("Cs",), blacklist_characters="\t\r\n"
    ),
    max_size=20,
)


@SPARK_SETTINGS
@given(
    rows=st.lists(
        st.lists(st.tuples(_label, _ltsv_val), min_size=0, max_size=6),
        min_size=1,
        max_size=8,
    )
)
def test_ltsv_parser_matches_last_wins_reference(spark, rows):
    """parse_ltsv_column vs the plugin contract: per declared column the
    LAST field with that label wins; absent labels null; arbitrary
    unicode values (minus tab/newline, which LTSV cannot carry)."""
    from pyspark.sql import functions as F

    from embulk_spark.sources.files import parse_ltsv_column

    lines = ["\t".join(f"{k}:{v}" for k, v in fields) for fields in rows]
    cols = [{"name": n, "type": "string"} for n in ("a", "host", "路径")]
    df = spark.createDataFrame([(ln,) for ln in lines], "value string")
    got = [
        tuple(r)
        for r in parse_ltsv_column(df, F.col("value"), cols).collect()
    ]

    def ref(fields):
        out = []
        for c in ("a", "host", "路径"):
            v = None
            for k, val in fields:
                if k == c:
                    v = val
            out.append(v)
        return tuple(out)

    assert sorted(map(str, got)) == sorted(str(ref(f)) for f in rows)


_cell = st.one_of(
    st.none(),
    st.text(
        alphabet=st.characters(
            blacklist_categories=("Cs",), blacklist_characters="\r\n"
        ),
        max_size=20,
    ).filter(lambda s: s != "\\N"),  # the literal null marker is None's job
)


@SPARK_SETTINGS
@given(rows=st.lists(st.tuples(_cell, _cell), min_size=1, max_size=8))
def test_csv_roundtrip_python_writer(spark, rows, tmp_path_factory):
    """read_csv inverts python csv.writer for arbitrary unicode cells
    (quotes, commas, tabs inside values; embedded newlines excluded —
    multiline records are off by default in both engines). None rides as
    the null_string."""
    from embulk_spark.sources.files import read_csv

    null = "\\N"
    buf = io.StringIO()
    w = _csv.writer(buf, quoting=_csv.QUOTE_MINIMAL)
    for a, b in rows:
        w.writerow([null if a is None else a, null if b is None else b])
    d = tmp_path_factory.mktemp("csvfuzz")
    p = d / "f.csv"
    p.write_text(buf.getvalue(), newline="")
    cols = [{"name": "x", "type": "string"}, {"name": "y", "type": "string"}]
    got = [
        (r.x, r.y)
        for r in read_csv(
            spark, [str(p)], {"columns": cols, "null_string": null}
        ).collect()
    ]
    # empty unquoted cells are nulls in both engines; normalize '' → None
    want = [
        tuple(None if (v is None or v == "") else v for v in row)
        for row in rows
    ]
    got = [
        tuple(None if (v is None or v == "") else v for v in row)
        for row in got
    ]
    assert sorted(map(str, got)) == sorted(map(str, want))


_numish = st.one_of(
    st.integers(min_value=-(2**70), max_value=2**70).map(str),
    st.floats(allow_nan=False, allow_infinity=False).map(repr),
    st.text(alphabet="0123456789+-.eE ", max_size=12),
    _txt,
)


@SPARK_SETTINGS
@given(vals=st.lists(_numish, min_size=1, max_size=30))
def test_typecast_string_to_long_matches_setter_matrix(spark, vals):
    """string→long: strict Long.parseLong — optional sign, digits only,
    in int64 range; everything else nulls (LongColumnSetter.java:50-59)."""
    from embulk_spark.operators.rowops import typecast_columns

    df = spark.createDataFrame([(v,) for v in vals], "v string")
    got = [
        r.v
        for r in typecast_columns(df, [{"name": "v", "type": "long"}])
        .collect()
    ]

    def ref(s):
        if not re.fullmatch(r"[+-]?\d+", s):
            return None
        n = int(s)
        return n if -(2**63) <= n < 2**63 else None

    assert got == [ref(v) for v in vals]


@SPARK_SETTINGS
@given(vals=st.lists(_txt, min_size=1, max_size=30))
def test_typecast_string_to_boolean_true_set_only(spark, vals):
    """string→boolean: membership in the 14-string TRUE set → true,
    anything else (including 'false') → null
    (BooleanColumnSetter.java:56-62)."""
    from embulk_spark.operators.rowops import typecast_columns

    df = spark.createDataFrame([(v,) for v in vals], "v string")
    got = [
        r.v
        for r in typecast_columns(df, [{"name": "v", "type": "boolean"}])
        .collect()
    ]
    assert got == [(True if v in TRUE_STRINGS else None) for v in vals]


@SPARK_SETTINGS
@given(vals=st.lists(st.one_of(_txt, st.none()), min_size=1, max_size=20))
def test_base64_encode_decode_roundtrip(spark, vals):
    """filter-base64: encode then decode is identity for text payloads;
    nulls stay null; python's base64 is the reference encoding."""
    from pyspark.sql import functions as F

    from embulk_spark.operators.rowops import base64_columns

    df = spark.createDataFrame([(v,) for v in vals], "v string")
    enc = base64_columns(df, [{"name": "v", "encode": True}])
    got_enc = [r.v for r in enc.collect()]
    want_enc = [
        None if v is None else base64.b64encode(v.encode()).decode()
        for v in vals
    ]
    assert got_enc == want_enc
    dec = base64_columns(
        enc.select(F.col("v")), [{"name": "v", "decode": True}]
    )
    assert [r.v for r in dec.collect()] == vals


#: engine pattern → python-reference pattern. Java's \s (no
#: UNICODE_CHARACTER_CLASS) is exactly [ \t\n\x0B\f\r]; python's also
#: eats \x1c-\x1f/\x85/unicode spaces — found by this very fuzz, kept
#: as a documented reference-translation, not an engine change.
_GSUB_PATTERNS = [
    (r"[0-9]+", r"[0-9]+"),
    (r"\s+", r"[ \t\n\x0B\f\r]+"),
    ("a", "a"),
    (r"[^\x00-\x7F]", r"[^\x00-\x7F]"),
]


@SPARK_SETTINGS
@given(
    vals=st.lists(_txt, min_size=1, max_size=20),
    pat=st.sampled_from(_GSUB_PATTERNS),
    to=st.sampled_from(["", "_", "X"]),
)
def test_gsub_matches_python_re(spark, vals, pat, to):
    """filter-gsub: regexp_replace over random unicode == python re.sub
    with the Java-semantics pattern translation above."""
    from embulk_spark.operators.rowops import gsub_columns

    pattern, py_pattern = pat
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    got = [
        r.v
        for r in gsub_columns(
            df, [{"name": "v", "pattern": pattern, "to": to}]
        ).collect()
    ]
    assert got == [re.sub(py_pattern, to, v) for v in vals]


@SPARK_SETTINGS
@given(
    rows=st.lists(
        st.lists(
            st.text(
                alphabet=st.characters(
                    blacklist_categories=("Cs",),
                    blacklist_characters=",\r\n",
                ),
                max_size=10,
            ),
            min_size=0,
            max_size=5,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_split_rows_matches_python_split(spark, rows):
    """filter-split: one row per delimited element, trimmed; empty
    source strings still fan out to one empty element (split(',')
    semantics), null sources drop (explode)."""
    from embulk_spark.operators.rowops import split_rows

    df = spark.createDataFrame(
        [(i, ",".join(parts)) for i, parts in enumerate(rows)],
        "id long, v string",
    )
    got = sorted(
        (r.id, r.v) for r in split_rows(df, "v", ",").collect()
    )
    # Spark's trim removes ASCII space only (the engine's documented
    # trim tier), not python's full whitespace set — strip(' ') mirrors
    want = sorted(
        (i, p.strip(" "))
        for i, parts in enumerate(rows)
        for p in ",".join(parts).split(",")
    )
    assert got == want


_scalar = st.one_of(
    st.integers(min_value=-(2**40), max_value=2**40),
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)), max_size=12
    ),
    st.none(),
)


@SPARK_SETTINGS
@given(
    rows=st.lists(
        st.lists(
            st.fixed_dictionaries({"k": _scalar, "n": _scalar}),
            min_size=0,
            max_size=4,
        ),
        min_size=1,
        max_size=6,
    )
)
def test_flatten_json_matches_reference(spark, rows):
    """filter-flatten_json: one row per array element, fields coerced
    with setter semantics (string field: numbers render as text; long
    field: strict parse else null)."""
    import json as _json

    from embulk_spark.operators.rowops import flatten_json

    df = spark.createDataFrame(
        [(i, _json.dumps({"arr": arr})) for i, arr in enumerate(rows)],
        "id long, j string",
    )
    out = flatten_json(
        df, "j", "/arr",
        [{"name": "k", "type": "string"}, {"name": "n", "type": "long"}],
    )
    key = lambda t: (t[0], repr(t[1]), repr(t[2]))  # noqa: E731 — None-safe
    got = sorted(((r.id, r.k, r.n) for r in out.collect()), key=key)

    def ref_str(v):
        if v is None:
            return None
        return str(v) if not isinstance(v, str) else v

    def ref_long(v):
        if isinstance(v, bool) or v is None or isinstance(v, str):
            # from_json(long) on a JSON string value nulls out
            return v if isinstance(v, int) and not isinstance(v, bool) else None
        return v if isinstance(v, int) else None

    want = sorted(
        (
            (i, ref_str(el["k"]), ref_long(el["n"]))
            for i, arr in enumerate(rows)
            for el in arr
        ),
        key=key,
    )
    assert got == want


# ---------------------------------------------------------------------------
# cross-engine: global-determinism corpus operators vs their DuckDB
# oracles (VERDICT r4 ask #3) — the r04 driver failures were exactly
# this class (whole-corpus order/arithmetic invariants), so these drive
# random unicode (exotic whitespace incl. \x0B, controls, astral plane)
# through the REAL queries()/oracle_sql() pair over a generated
# documents table.
# ---------------------------------------------------------------------------

import importlib.util as _ilu
import os as _os
import tempfile as _tempfile

_spec = _ilu.spec_from_file_location("check_queries", "tools/check_queries.py")
_cq = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(_cq)

# token chars: any non-surrogate, non-Java-\s character (NBSP, NEL,
# astral, C0 controls all allowed — they ride INSIDE tokens in both
# engines). Chars with EXPANDING lowercase (İ -> i̇) are excluded:
# Spark lower() full-maps, DuckDB utf8proc simple-maps — a documented
# engine-vs-oracle translation gap (same discipline as _GSUB_PATTERNS).
_tok_char = st.characters(
    blacklist_categories=("Cs",),
    blacklist_characters=" \t\n\x0b\f\r",
).filter(lambda c: len(c.lower()) == 1)
_corpus_token = st.one_of(
    st.text(alphabet=_tok_char, min_size=1, max_size=6),
    st.sampled_from(["alpha", "beta", "gamma", "delta", "x😀y", "naïve"]),
)
# separators from the Java \s set both engines now agree on ([ \t\n
# \x0B\f\r] spelled out in the oracles; RE2's bare \s lacks \x0B —
# found by this very fuzz)
_ws_sep = st.sampled_from(
    [" ", "\t", "\n", "\x0b", "\f", "\r", "  ", "\t\n", " \x0b "]
)


@st.composite
def _doc_text(draw):
    toks = list(draw(st.lists(_corpus_token, max_size=16)))
    if draw(st.booleans()):
        # a constant 9-token run shared across docs forces real
        # duplicated 8-grams (the substring_dedup hot path)
        toks[len(toks) // 2 : len(toks) // 2] = [
            f"dup{i}" for i in range(9)
        ]
    parts = [draw(_ws_sep)] if draw(st.booleans()) else []
    for t in toks:
        parts += [t, draw(_ws_sep)]
    return "".join(parts)


_doc_lists = st.lists(_doc_text(), min_size=1, max_size=6)


def _cross_check(spark, docs, qkey):
    """Run the production queries()[qkey] and oracle_sql()[qkey] over a
    generated documents table; compare with the gate's own canon +
    numeric-kind rules."""
    import duckdb
    import pandas as pd

    import __spark_entry__ as entrymod

    d = _tempfile.mkdtemp(prefix="fuzz_docs_")
    try:
        pd.DataFrame(
            {
                "doc_id": pd.array(range(len(docs)), dtype="int64"),
                "text": pd.array(docs, dtype=object),
                "lang": pd.array(["en"] * len(docs), dtype=object),
            }
        ).to_parquet(_os.path.join(d, "documents.parquet"))
        got = entrymod.queries()[qkey](spark, d).toPandas()
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM read_parquet("
            f"'{_os.path.join(d, 'documents.parquet')}')"
        )
        want = con.execute(entrymod.oracle_sql()[qkey]).fetchdf()
        assert sorted(got.columns) == sorted(want.columns), qkey
        g, w = _cq.canon(got), _cq.canon(want)
        assert g == w, f"{qkey}: first diff {next((a, b) for a, b in zip(g, w) if a != b)}"
        assert not _cq.kind_mismatches(got, want), qkey
    finally:
        import shutil as _sh

        _sh.rmtree(d, ignore_errors=True)


@settings(
    deadline=None,
    max_examples=8,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=_doc_lists)
def test_substring_dedup_matches_oracle_on_random_unicode(spark, docs):
    """ExactSubstr dedup: gram keys (md5·lower), winner choice, island
    merge and text rebuild agree cross-engine for arbitrary unicode
    corpora with forced duplicate runs."""
    _cross_check(spark, docs, "substring_dedup")


@settings(
    deadline=None,
    max_examples=8,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=_doc_lists)
def test_token_packing_matches_oracle_on_random_unicode(spark, docs):
    """Concat-and-chunk packing: the two-level distributed prefix sum
    equals the oracle's ONE global window over the identical
    (bucket, md5-key, doc_id) total order, for any token counts."""
    _cross_check(spark, docs, "token_packing")


@settings(
    deadline=None,
    max_examples=8,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=_doc_lists)
def test_corpus_export_matches_oracle_on_random_unicode(spark, docs):
    """Sharded export disk round-trip: per-shard rows / token counts /
    content fingerprints survive parquet write+read byte-exactly for
    arbitrary unicode text."""
    _cross_check(spark, docs, "corpus_export")


@settings(
    deadline=None,
    max_examples=8,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=_doc_lists)
def test_bpe_encode_matches_oracle_on_random_unicode(spark, docs):
    """BPE application: the per-row leftmost-first merge fold equals the
    oracle's replace-until-fixpoint recursive CTE for arbitrary unicode
    (words = lower()ed [a-z] runs in both engines)."""
    _cross_check(spark, docs, "bpe_encode")


@settings(
    deadline=None,
    max_examples=8,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=_doc_lists)
def test_doc_chunks_matches_oracle_on_random_unicode(spark, docs):
    """Strided token-window chunking: start-index arithmetic and list
    slicing agree cross-engine for arbitrary token counts."""
    _cross_check(spark, docs, "doc_chunks")


@settings(
    deadline=None,
    max_examples=8,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=_doc_lists)
def test_vocab_topk_matches_oracle_on_random_unicode(spark, docs):
    """Corpus vocabulary induction: lowercased token counting and the
    (count desc, token) boundary agree cross-engine (the lower()
    translation gap is fenced by the generation strategy)."""
    _cross_check(spark, docs, "vocab_topk")


@settings(
    deadline=None,
    max_examples=8,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=_doc_lists)
def test_text_normalize_matches_oracle_on_random_unicode(spark, docs):
    """Normalization (whitespace folding etc.) and the changed-flag
    agree cross-engine on exotic unicode."""
    _cross_check(spark, docs, "text_normalize")


@settings(
    deadline=None,
    max_examples=8,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=_doc_lists)
def test_chunk_dedup_matches_oracle_on_random_unicode(spark, docs):
    """Content-defined chunking: the md5-window cut set, chunk substr
    slicing, and min-okey keeper accounting agree cross-engine for
    arbitrary unicode corpora (exotic whitespace, astral plane), incl.
    docs shorter than the hash window and forced duplicate runs."""
    _cross_check(spark, docs, "chunk_dedup")
