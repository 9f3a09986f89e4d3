"""Bloom-filter membership probe: dedup a new batch against a corpus
fingerprint without shuffling (or even re-reading) the corpus.

At 100 TB the dominant cost of "is this document already in the lake?"
is moving corpus-side data. An m-bit Bloom filter compresses the corpus
membership set to ``m/63`` packed longs — a frame that is broadcastable
at ANY corpus size once ``m`` is fixed (m = 2^27 → 16 MiB) — so the
per-epoch probe touches only the new batch. False positives are the
price: a positive means "maybe present, run the exact check on this row
only", a negative is definitive. This is the standard pre-filter in
front of exact dedup (operators/dedup.py) and the incremental near-dup
index (operators/incremental.py).

No reference analogue (Embulk has no cross-run membership state beyond
the ``last_path`` cursor, reference exec/BulkLoader.java:299-306); this
is SURVEY §2.10 curation surface.

Determinism/oracle parity: position ``i`` of value ``v`` is
``int(md5("{salt}{i}:" || v)[:15 hex]) mod m`` — the same
first-hex-chars-of-md5 arithmetic the sampling and MinHash operators pin
(operators/sample.py::hash_uniform), replayable verbatim in DuckDB.

Scale shape: build = explode k positions → ONE hash agg with map-side
partial ``bit_or`` combine onto ≤ m/63 rows. Probe = explode k candidate
positions → broadcast join against the packed words → all-bits-set
check via ``min`` agg back to one row per candidate. The corpus never
appears in the probe plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _position(value: Column, i: int, m_bits: int, salt: str) -> Column:
    """Bit position of hash i: first 15 md5 hex chars (60 bits) mod m."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{salt}{i}:"), value)), 1, 15),
        16,
        10,
    ).cast("long")
    return h % m_bits


#: bits per packed word — 63, not 64, so the long's sign bit is never
#: set: identical shift/or/and behavior in every engine (a 1<<63 mask
#: overflows signed-64 arithmetic in SQL engines with checked shifts)
WORD_BITS = 63


def _packed(pos: Column) -> tuple[Column, Column]:
    word = F.floor(pos / WORD_BITS).cast("long").alias("word")
    # F.shiftleft only takes a literal shift; the SQL form shifts by a column
    mask = F.expr(
        f"shiftleft(CAST(1 AS BIGINT), CAST(pmod(pos, {WORD_BITS}) AS INT))"
    ).alias("mask")
    return word, mask


def bloom_build(
    df: DataFrame,
    value_col: str,
    *,
    m_bits: int = 1 << 20,
    k: int = 5,
    salt: str = "bf",
) -> DataFrame:
    """Pack the membership set of ``df[value_col]`` into (word, bits):
    word j holds bits ``[63j, 63j+63)`` of the m-bit filter. Words with
    no set bits are absent (the probe treats missing words as zero)."""
    pos = df.select(
        F.explode(
            F.array(
                *[_position(F.col(value_col), i, m_bits, salt) for i in range(k)]
            )
        ).alias("pos")
    )
    return pos.select(*_packed(F.col("pos"))).groupBy("word").agg(
        F.bit_or("mask").alias("bits")
    )


def bloom_probe(
    candidates: DataFrame,
    bloom: DataFrame,
    value_col: str,
    id_cols: list[str],
    *,
    m_bits: int = 1 << 20,
    k: int = 5,
    salt: str = "bf",
) -> DataFrame:
    """``id_cols + [maybe_present]`` per candidate row: true iff ALL k
    positions of ``value_col`` are set in ``bloom`` (definitely absent
    when false; verify-on-positive for exactness). ``bloom`` (≤ m/63
    rows) is broadcast — the probe never shuffles the candidates."""
    probes = candidates.select(
        *id_cols,
        F.explode(
            F.array(
                *[_position(F.col(value_col), i, m_bits, salt) for i in range(k)]
            )
        ).alias("pos"),
    ).select(*id_cols, *_packed(F.col("pos")))
    hit = (
        F.col("bits").isNotNull() & (F.col("bits").bitwiseAND(F.col("mask")) != 0)
    ).cast("int")
    return (
        probes.join(F.broadcast(bloom), "word", "left")
        .groupBy(*id_cols)
        .agg((F.min(hit) == 1).alias("maybe_present"))
    )
