"""Training-sequence assembly (operators/pack.py): strided chunking and
concat-and-chunk token packing — exact windows on crafted docs, the
prefix-sum invariants, and partitioning-invariance of the global order."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from embulk_spark.operators.pack import (
    chunk_documents,
    pack_token_budget,
    token_count,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunking_exact_windows(spark):
    # 10 tokens, max 4, stride 3 -> n_chunks = 1 + ceil(6/3) = 3
    df = _docs(spark, [(1, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9")])
    out = chunk_documents(df, "text", "doc_id", max_tokens=4, stride=3)
    got = [tuple(r) for r in out.orderBy("chunk_idx").collect()]
    assert got == [
        (1, 0, 0, 4, "t0 t1 t2 t3"),
        (1, 1, 3, 4, "t3 t4 t5 t6"),
        (1, 2, 6, 4, "t6 t7 t8 t9"),
    ]


def test_chunking_short_empty_and_exact_fit(spark):
    df = _docs(spark, [(1, "a b"), (2, ""), (3, "  "), (4, "a b c d")])
    out = chunk_documents(df, "text", "doc_id", max_tokens=4, stride=4)
    got = {r.doc_id: (r.chunk_idx, r.n_chunk_tokens, r.chunk_text)
           for r in out.collect()}
    assert got == {1: (0, 2, "a b"), 4: (0, 4, "a b c d")}  # 2,3 drop


def test_chunking_stride_validation(spark):
    df = _docs(spark, [(1, "a")])
    with pytest.raises(ValueError):
        chunk_documents(df, "text", "doc_id", max_tokens=4, stride=0)
    with pytest.raises(ValueError):
        chunk_documents(df, "text", "doc_id", max_tokens=4, stride=5)


def test_packing_prefix_sum_invariants(spark):
    rows = [(i, "w " * (i % 17 + 1)) for i in range(200)]
    df = _docs(spark, rows)
    out = pack_token_budget(
        df, "doc_id", budget=50, text_col="text", n_buckets=16
    ).collect()
    assert len(out) == 200
    # offsets are exactly the prefix sums of n_tokens in offset order
    srt = sorted(out, key=lambda r: r.global_offset)
    acc = 0
    for r in srt:
        assert r.global_offset == acc
        assert r.seq_id == acc // 50
        assert r.offset_in_seq == acc % 50
        assert r.spans_boundary == (acc % 50 + r.n_tokens > 50)
        acc += r.n_tokens
    assert acc == sum(i % 17 + 1 for i in range(200))


def test_packing_partitioning_invariant(spark):
    rows = [(i, "x " * (i % 11 + 1)) for i in range(150)]
    a = pack_token_budget(
        _docs(spark, rows), "doc_id", budget=64, text_col="text"
    )
    b = pack_token_budget(
        _docs(spark, rows).repartition(7), "doc_id", budget=64,
        text_col="text",
    )
    ka = {(r.doc_id, r.global_offset, r.seq_id) for r in a.collect()}
    kb = {(r.doc_id, r.global_offset, r.seq_id) for r in b.collect()}
    assert ka == kb


def test_packing_precomputed_counts_and_validation(spark):
    df = _docs(spark, [(1, "a b"), (2, "c")]).withColumn(
        "ntok", token_count(F.col("text"))
    )
    out = pack_token_budget(
        df, "doc_id", budget=10, token_count_col="ntok"
    ).collect()
    assert sum(r.n_tokens for r in out) == 3
    with pytest.raises(ValueError):
        pack_token_budget(df, "doc_id", budget=0, text_col="text")
    with pytest.raises(ValueError):
        pack_token_budget(df, "doc_id", budget=10)
    with pytest.raises(ValueError):
        pack_token_budget(
            df, "doc_id", budget=10, text_col="text", token_count_col="ntok"
        )
    with pytest.raises(ValueError):
        pack_token_budget(
            df, "doc_id", budget=10, text_col="text", n_buckets=0
        )


def test_packing_zero_token_docs_keep_their_slot(spark):
    df = _docs(spark, [(1, "a b c"), (2, ""), (3, "d e")])
    out = {r.doc_id: (r.n_tokens, r.spans_boundary)
           for r in pack_token_budget(
               df, "doc_id", budget=4, text_col="text").collect()}
    assert set(out) == {1, 2, 3}
    assert out[2][0] == 0 and out[2][1] is False


def test_pipeline_chunk_pack_and_substring_filters(spark):
    from embulk_spark.pipeline import apply_filters

    df = _docs(spark, [
        (1, "one two three four five six seven eight nine ten"),
        (2, "one two three four five six seven eight nine ten"),
    ])
    chunked = apply_filters(df, [
        {"type": "chunk", "id": "doc_id", "max_tokens": 6, "stride": 6},
    ])
    assert chunked.count() == 4  # 10 tokens -> 2 chunks per doc
    packed = apply_filters(df, [
        {"type": "pack", "id": "doc_id", "budget": 12},
    ])
    rows = {r.doc_id: r for r in packed.collect()}
    assert {rows[1].seq_id, rows[2].seq_id} == {0}  # 20 tokens, budget 12
    assert sorted(r.global_offset for r in rows.values()) == [0, 10]
    sub = apply_filters(df, [
        {"type": "dedup", "method": "substrings", "id": "doc_id",
         "column": "text", "k": 4},
    ])
    got = {r.doc_id: r for r in sub.collect()}
    kept = min(got)  # doc 1 keeps the block, doc 2 loses all 10 tokens
    assert got[kept].n_tokens_dropped == 0
    assert got[3 - kept].n_tokens_dropped == 10 and got[3 - kept].text == ""


# ---------------------------------------------------------------------------
# property tests: chunk reconstruction and packing conservation
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_word = st.text(alphabet="abxyz", min_size=1, max_size=3)
_doc = st.lists(_word, min_size=0, max_size=30).map(" ".join)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(_doc, min_size=1, max_size=6),
       st.integers(min_value=1, max_value=7))
def test_chunks_reconstruct_document_at_full_stride(spark, texts, max_tok):
    """stride == max_tokens => concatenating a doc's chunks in order
    recovers its (whitespace-normalized) token stream exactly."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    chunks = chunk_documents(
        df, "text", "doc_id", max_tokens=max_tok, stride=max_tok
    ).collect()
    got = {}
    for r in sorted(chunks, key=lambda r: (r.doc_id, r.chunk_idx)):
        got.setdefault(r.doc_id, []).append(r.chunk_text)
    for i, t in enumerate(texts):
        toks = t.split()
        if not toks:
            assert i not in got
        else:
            assert " ".join(got[i]).split() == toks


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.integers(min_value=0, max_value=50),
                min_size=1, max_size=25),
       st.integers(min_value=1, max_value=64))
def test_packing_conserves_tokens_and_orders_totally(spark, counts, budget):
    rows = [(i, n) for i, n in enumerate(counts)]
    df = spark.createDataFrame(rows, "doc_id long, ntok int")
    out = pack_token_budget(
        df, "doc_id", budget=budget, token_count_col="ntok", n_buckets=8
    ).collect()
    srt = sorted(out, key=lambda r: r.global_offset)
    acc = 0
    seen = set()
    for r in srt:
        assert r.global_offset == acc and r.seq_id == acc // budget
        acc += r.n_tokens
        seen.add(r.doc_id)
    assert acc == sum(counts) and seen == set(range(len(counts)))
