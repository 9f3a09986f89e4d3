"""Training-sequence assembly: context-length chunking and token packing.

The last mile of an LLM data pipeline turns curated documents into
fixed-length training sequences. Two standard shapes:

- ``chunk_documents``: split each document into windows of at most
  ``max_tokens`` tokens with a fixed ``stride`` (overlap = max_tokens -
  stride), the HuggingFace ``return_overflowing_tokens`` convention. A
  per-row flat map — no shuffle at all.

- ``pack_token_budget``: GPT-style concat-and-chunk. Documents are laid
  end-to-end in a deterministic global order and the stream is cut every
  ``budget`` tokens; each document learns its global token offset, its
  sequence id, and whether it straddles a sequence boundary. The global
  order is a pure function of (salt, id) — reproducible across runs,
  partitionings, and engines — never an input-partition order.

No reference analogue (corpus-curation extension per SURVEY §2.10); the
deterministic-order discipline follows operators/sample.py (everything a
function of (salt, row key), oracle replays the identical md5 math).

Scale shape (pack): a global running sum is the textbook two-level
parallel prefix sum, NOT one global sort. Rows hash to ``n_buckets``
fixed md5 buckets (deterministic — never range-sampled boundaries); one
shuffle partitions by bucket; a window per bucket computes within-bucket
running sums; bucket totals (``n_buckets`` rows, constant size at ANY
corpus size) get their own cumulative offsets via a tiny single-partition
window and re-enter through a broadcast join. Nothing is collected; the
only per-row state that crosses the wire is (bucket, tokens).

Chunking is a pure Column flat map (transform over a start-index
sequence, slice + array_join) — zero shuffles, linear in total tokens.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _tokens(text: Column) -> Column:
    return F.filter(F.split(text, r"\s+"), lambda w: w != F.lit(""))


def token_count(text: Column) -> Column:
    """Whitespace token count (0 for empty/null-normalized text)."""
    return F.size(_tokens(text))


def chunk_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    max_tokens: int,
    stride: int | None = None,
) -> DataFrame:
    """Explode each document into ``ceil``-strided token windows.

    Window ``i`` covers tokens ``[i*stride, i*stride + max_tokens)``;
    windows are emitted while the previous one has not reached the end,
    i.e. ``n_chunks = 1 + ceil(max(n - max_tokens, 0) / stride)``. The
    last window may be shorter; a document with zero tokens yields zero
    chunks. Output: ``id_col, chunk_idx, chunk_start, n_chunk_tokens,
    chunk_text`` (tokens re-joined with single spaces).
    """
    if stride is None:
        stride = max_tokens
    if not (0 < stride <= max_tokens):
        raise ValueError(f"stride must be in (0, {max_tokens}]; got {stride}")
    toks = _tokens(F.col(text_col))
    n = F.size(toks)
    n_chunks = F.lit(1) + F.ceil(
        F.greatest(n - max_tokens, F.lit(0)) / F.lit(stride)
    ).cast("int")
    chunks = F.when(n > 0, F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.cast("int").alias("chunk_idx"),
            (i * stride).cast("int").alias("chunk_start"),
            F.least(n - i * stride, F.lit(max_tokens)).cast("int").alias(
                "n_chunk_tokens"
            ),
            F.array_join(F.slice(toks, i * stride + 1, max_tokens), " ").alias(
                "chunk_text"
            ),
        ),
    )).otherwise(F.array().cast(
        "array<struct<chunk_idx:int,chunk_start:int,"
        "n_chunk_tokens:int,chunk_text:string>>"
    ))
    return df.select(F.col(id_col), F.explode(chunks).alias("_c")).select(
        id_col,
        F.col("_c.chunk_idx").alias("chunk_idx"),
        F.col("_c.chunk_start").alias("chunk_start"),
        F.col("_c.n_chunk_tokens").alias("n_chunk_tokens"),
        F.col("_c.chunk_text").alias("chunk_text"),
    )


def pack_token_budget(
    df: DataFrame,
    id_col: str,
    *,
    budget: int,
    text_col: str | None = None,
    token_count_col: str | None = None,
    n_buckets: int = 256,
    salt: str = "pack1",
) -> DataFrame:
    """Concat-and-chunk packing: global token offsets in a deterministic
    order, cut into ``budget``-token sequences.

    The global order is ``(bucket, md5(salt || ':' || id), id)`` where
    ``bucket = int(md5[:4], 16) % n_buckets`` — a pure function of
    (salt, id), total (id breaks the astronomically-unlikely md5 tie),
    and independent of input partitioning. Provide token counts either
    precomputed (``token_count_col``) or derived from ``text_col``
    whitespace tokens. ``n_buckets`` ≤ 65536.

    Output adds: ``n_tokens`` (this doc), ``global_offset`` (tokens laid
    before it), ``seq_id = floor(global_offset / budget)``,
    ``offset_in_seq``, and ``spans_boundary`` (doc crosses into the next
    sequence). ``budget`` must be > 0.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive; got {budget}")
    if (text_col is None) == (token_count_col is None):
        raise ValueError("provide exactly one of text_col / token_count_col")
    ntok = (
        F.col(token_count_col) if token_count_col is not None
        else token_count(F.col(text_col))
    ).cast("long")
    if not (0 < n_buckets <= 65536):
        raise ValueError(f"n_buckets must be in (0, 65536]; got {n_buckets}")
    okey = F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    # fixed md5 buckets: substring arithmetic, never sampled range bounds
    bkt = F.conv(F.substring(okey, 1, 4), 16, 10).cast("int") % n_buckets
    rows = df.withColumn("_ntok", ntok).withColumn("_okey", okey).withColumn(
        "_bkt", bkt
    )

    in_bucket = Window.partitionBy("_bkt").orderBy("_okey", id_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    rows = rows.withColumn("_cum", F.sum("_ntok").over(in_bucket))

    # level 2: n_buckets totals -> cumulative offsets (constant-size relation)
    across = Window.orderBy("_bkt").rowsBetween(
        Window.unboundedPreceding, Window.currentRow - 1
    )
    offsets = (
        rows.groupBy("_bkt")
        .agg(F.sum("_ntok").alias("_btot"))
        .withColumn("_boff", F.coalesce(F.sum("_btot").over(across), F.lit(0)))
        .select("_bkt", "_boff")
    )

    goff = F.col("_boff") + F.col("_cum") - F.col("_ntok")
    out = (
        rows.join(F.broadcast(offsets), "_bkt")
        .withColumn("global_offset", goff)
        .withColumn("seq_id", F.floor(F.col("global_offset") / budget))
        .withColumn(
            "offset_in_seq", F.col("global_offset") % budget
        )
        .withColumn(
            "spans_boundary",
            (F.col("offset_in_seq") + F.col("_ntok")) > budget,
        )
        .withColumn("n_tokens", F.col("_ntok"))
    )
    return out.drop("_okey", "_bkt", "_cum", "_boff", "_ntok")
