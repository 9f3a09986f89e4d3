"""Deduplication operators for web-corpus pipelines: exact, MinHash+LSH,
SimHash, n-gram Jaccard.

Scale notes (the point of each design):
- exact: one hash-groupBy on md5(text) — map-side partial agg, no sort.
- MinHash+LSH: shingle→minhash→band→bucket-join. Candidate generation is an
  equi-join on (band_idx, band_hash) — a uniform-hash shuffle key, so no
  all-pairs blowup; verification is per-candidate-pair signature agreement.
- SimHash: 64-bit signature via an Arrow-batched pandas UDF (bit fiddling
  is the one thing Column exprs do badly); near-dup = small hamming
  distance within LSH-style bit-band buckets.
- n-gram Jaccard: exact set similarity on candidate pairs only.

All hashing is md5-based (identical bytes → identical hex in any engine),
which is what makes the DuckDB oracles exact.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def exact_dedup_groups(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Group identical texts: (md5, keeper_id, n_dups). Keeper = min id."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_md5"))
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep one row (min id) per distinct text."""
    keep = exact_dedup_groups(df, text_col, id_col).select(
        F.col("keeper_id").alias(id_col)
    )
    return df.join(keep, id_col, "left_semi")


_WS_ASCII = __import__("re").compile(r"\s+", __import__("re").ASCII)


def _shingles_py(text: str | None, n: int = 3) -> list[str] | None:
    """Distinct word n-gram shingles; ASCII \\s+ split to match Java/RE2
    regex semantics exactly (Python's \\s is unicode-aware by default)."""
    if text is None:
        return None
    ws = _WS_ASCII.split(text.strip().lower())
    if len(ws) < n:
        return []
    seen: dict[str, None] = {}
    for j in range(len(ws) - n + 1):
        seen[" ".join(ws[j : j + n])] = None
    return list(seen)


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of whitespace-tokenized lowercase text.

    Arrow-batched pandas UDF rather than transform()/element_at lambdas:
    Spark higher-order functions are interpreted (no codegen) and measured
    ~2 ms/row on 50-word docs — the Python batch path is >20× faster here,
    and everything downstream (md5, min-agg) stays JVM-side."""

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _sh(col: pd.Series) -> pd.Series:
        return col.map(lambda t: _shingles_py(t, n))

    return _sh(text)


def shingles_df(
    df: DataFrame, text_col: str, id_col: str, shingle_n: int = 3
) -> DataFrame:
    return df.select(
        F.col(id_col), word_shingles(F.col(text_col), shingle_n).alias("shingles")
    ).filter(F.size("shingles") > 0)


#: Modulus for the affine minhash permutations: the smallest prime ABOVE
#: the 32-bit shingle-hash universe. P must sit just above the universe so
#: (a·h+b) mod P wraps constantly and the k maps behave like independent
#: random permutations of the universe. (An earlier choice of 2^61-1 made
#: every map order-preserving on [0, 2^32) — all k "permutations" shared
#: one argmin shingle, collapsing the Jaccard estimate to 0-or-1.)
MINHASH_P = 4294967311


def minhash_params(k: int) -> tuple[list[int], list[int]]:
    """Deterministic affine-permutation constants — fixed so the DuckDB
    oracles can inline the exact same permutation family. a_i odd < 2^30
    keeps a·h + b < 2^62 + 2^33: inside signed-64 even with ANSI overflow
    checks, while still wrapping mod P for all but the tiniest h."""
    a = [((0x9E3779B1 * (i + 1)) & ((1 << 30) - 1)) | 1 for i in range(k)]
    b = [(0x85EBCA77 * (i + 1)) % MINHASH_P for i in range(k)]
    return a, b


def minhash_df(
    df: DataFrame, text_col: str, id_col: str, k: int = 16, shingle_n: int = 3
) -> DataFrame:
    """(id, sig) with sig[i] = min over shingles of the i-th affine
    permutation of a 32-bit shingle hash: (a_i·h + b_i) mod MINHASH_P
    (the smallest prime above 2^32), h = first 8 hex chars of
    md5(shingle).

    Two deliberate shape choices:
    - ONE md5 per shingle, then k codegen'd multiply-adds — not k md5s
      per shingle (k× less hashing; md5 is the only deterministic hash
      both Spark and the DuckDB oracle share, the permutations ride on
      top arithmetically).
    - explode→project→hash-agg instead of nested transform()/array_min()
      lambdas: Spark's higher-order functions are INTERPRETED (no
      whole-stage codegen) — the HOF formulation was ~20× slower.
      Exploded projections + min() aggregates get map-side partial
      aggregation and scale to billions of documents (one shuffle,
      keyed by doc id)."""
    a, b = minhash_params(k)
    ex = shingles_df(df, text_col, id_col, shingle_n).select(
        F.col(id_col), F.explode("shingles").alias("_s")
    )
    h = F.conv(F.substring(F.md5("_s"), 1, 8), 16, 10).cast("long")
    proj = ex.select(
        F.col(id_col),
        *[
            F.pmod(F.lit(a[i]) * h + F.lit(b[i]), F.lit(MINHASH_P)).alias(f"_h{i}")
            for i in range(k)
        ],
    )
    agg = proj.groupBy(id_col).agg(
        *[F.min(f"_h{i}").alias(f"_m{i}") for i in range(k)]
    )
    return agg.select(
        F.col(id_col), F.array(*[F.col(f"_m{i}") for i in range(k)]).alias("sig")
    )


def banded_signatures(
    sigs: DataFrame, id_col: str, k: int, bands: int, *, keep_sig: bool = False
) -> DataFrame:
    """(id[, sig], band_idx, band_hash): one row per signature band,
    band_hash = md5 of the '|'-joined band slice. The SINGLE definition of
    the banding hash — batch LSH (here) and the incremental index
    (operators/incremental.py) must bucket identically forever, or their
    candidate sets silently diverge."""
    rows_per_band = k // bands
    cols = [F.col(id_col)] + ([F.col("sig")] if keep_sig else [])
    return sigs.select(
        *cols,
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.md5(
                    F.concat_ws(
                        "|",
                        F.transform(
                            F.slice(
                                F.col("sig"), b * rows_per_band + 1, rows_per_band
                            ),
                            lambda v: v.cast("string"),
                        ),
                    )
                ),
            )
        ).alias("band_idx", "band_hash"),
    )


def lsh_candidate_pairs(
    sigs: DataFrame, id_col: str, k: int = 16, bands: int = 4
) -> DataFrame:
    """Band the signatures and equi-join on (band_idx, band_hash); docs
    agreeing on any full band become candidate pairs (id_a < id_b).

    ``sigs`` should be persisted by the caller — the self-join would
    otherwise recompute the full shingle→minhash expression tree for both
    sides AND for every band."""
    banded = banded_signatures(sigs, id_col, k, bands)
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def minhash_near_dups(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    k: int = 16,
    bands: int = 4,
    threshold: float = 0.7,
) -> DataFrame:
    """Near-duplicate pairs: LSH candidates whose signature-agreement
    fraction (MinHash Jaccard estimate) ≥ threshold.

    Signatures are computed ONCE (eager localCheckpoint) and joined back
    onto the (small) candidate-pair set — never recomputed inside the
    self-join. localCheckpoint rather than persist(): same one-shot
    materialization, but the storage is released by Spark's ContextCleaner
    when the frame is garbage-collected instead of leaking until an
    explicit unpersist a lazy caller can never make."""
    sigs = minhash_df(df, text_col, id_col, k).localCheckpoint(eager=True)
    pairs = lsh_candidate_pairs(sigs, id_col, k, bands)
    sig_only = sigs.select(F.col(id_col), F.col("sig"))
    joined = (
        pairs.join(
            sig_only.withColumnRenamed(id_col, "id_a").withColumnRenamed("sig", "sig_a"),
            "id_a",
        ).join(
            sig_only.withColumnRenamed(id_col, "id_b").withColumnRenamed("sig", "sig_b"),
            "id_b",
        )
    )
    est = (
        F.size(
            F.filter(
                F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
                lambda v: v,
            )
        )
        / F.lit(float(k))
    )
    return (
        joined.withColumn("jaccard_est", F.round(est, 6))
        .filter(F.col("jaccard_est") >= threshold)
        .select("id_a", "id_b", "jaccard_est")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    shingle_n: int = 3,
    k: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """EXACT n-gram Jaccard on LSH-generated candidates only (never
    all-pairs): |A∩B| / |A∪B| over distinct shingle sets."""
    # localCheckpoint not persist: see minhash_near_dups (no cache leak)
    sigs = minhash_df(df, text_col, id_col, k, shingle_n).localCheckpoint(eager=True)
    cands = lsh_candidate_pairs(sigs, id_col, k, bands)
    sh = shingles_df(df, text_col, id_col, shingle_n)
    j = (
        cands.join(sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("shingles", "sh_a"), "id_a")
        .join(sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("shingles", "sh_b"), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                6,
            ),
        )
    )
    return j.filter(F.col("jaccard") >= threshold).select("id_a", "id_b", "jaccard")


# ---------------------------------------------------------------------------
# SimHash (pandas-UDF path; bit fiddling)
# ---------------------------------------------------------------------------

def _simhash64_py(text: str | None) -> int | None:
    if text is None:
        return None
    acc = np.zeros(64, dtype=np.int64)
    # ASCII \s+ tokenization (same as _shingles_py) so the DuckDB oracle's
    # RE2 regexp_split_to_array('\s+') sees the identical token set
    toks = {t for t in _WS_ASCII.split(text.strip().lower()) if t}
    for tok in toks:
        h = np.uint64(int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big"))
        bits = ((h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
        acc += np.where(bits == 1, 1, -1)
    sig = int(((acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())
    return sig - (1 << 64) if sig >= (1 << 63) else sig  # store as signed


@F.pandas_udf(T.LongType())
def simhash64(text: pd.Series) -> pd.Series:
    return text.map(_simhash64_py)


def simhash_df(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return df.select(F.col(id_col), simhash64(F.col(text_col)).alias("simhash"))


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_dups(
    df: DataFrame, text_col: str, id_col: str, *, max_hamming: int = 3,
    n_bands: int = 4,
) -> DataFrame:
    """Near-dups by simhash: band the 64 bits into n_bands 16-bit keys; a
    pair within hamming ≤ n_bands-1 shares ≥1 exact band (pigeonhole), so
    the bucket-join finds all of them without an all-pairs scan."""
    sigs = simhash_df(df, text_col, id_col)
    width = 64 // n_bands
    # unrolled literal array (shift amounts are plan-time constants), not a
    # transform() lambda: higher-order functions are interpreted, and
    # shiftrightunsigned takes a Python int shift anyway
    banded = sigs.select(
        id_col,
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("simhash"), b * width)
                    .bitwiseAND(F.lit((1 << width) - 1))
                    for b in range(n_bands)
                ]
            )
        ).alias("band_idx", "band_key"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            hamming64(F.col("a.simhash"), F.col("b.simhash")).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def benchmark_overlap(
    docs: DataFrame,
    bench: DataFrame,
    text_col: str,
    id_col: str,
    shingle_n: int = 3,
    *,
    bench_text_col: str | None = None,
) -> DataFrame:
    """Training-data decontamination: per document, how many of its
    distinct word n-gram shingles appear ANYWHERE in the benchmark/eval
    corpus — (id, n_shingles, n_overlap, overlap_frac). Callers drop or
    flag docs above an overlap threshold before training.

    Scale shape: the corpus side is one shingling pass + explode + ONE
    hash agg (map-side combine); the benchmark side — eval sets are tiny
    next to a 100 TB corpus — collapses to distinct shingles and
    BROADCASTS, so the membership probe is map-side and the corpus never
    shuffles on the shingle key. Docs shorter than the shingle width have
    no shingles and are omitted (they cannot be contaminated).
    """
    d = shingles_df(docs, text_col, id_col, shingle_n).select(
        F.col(id_col), F.explode("shingles").alias("_g")
    )
    # the bench side needs no id column — eval sets are external corpora
    # with their own schemas; only their shingle set matters
    b = (
        bench.select(
            F.explode(
                word_shingles(F.col(bench_text_col or text_col), shingle_n)
            ).alias("_g")
        )
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    joined = d.join(F.broadcast(b), "_g", "left")
    return joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.coalesce(F.sum("_hit"), F.lit(0)).alias("n_overlap"),
        F.round(
            F.coalesce(F.sum("_hit"), F.lit(0)) / F.count(F.lit(1)), 6
        ).alias("overlap_frac"),
    )


def paragraph_stats(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    sep: str = "\n",
    min_docs: int = 2,
    normalize: bool = True,
) -> DataFrame:
    """Cross-document duplicated-paragraph report (the CCNet-style
    paragraph-dedup pass of a web-corpus pipeline): one row per paragraph
    key that appears in >= ``min_docs`` distinct documents —
    (para_key, n_docs, winner_id, winner_pos). The winner is the global
    first occurrence by (id, position): the single copy that
    :func:`dedup_paragraphs` keeps.

    ``normalize`` hashes lower(trim(whitespace-collapsed)) paragraph text
    (CCNet normalizes before hashing); blank paragraphs never count.

    Scale shape: posexplode -> per-(key, doc) partial agg (min pos) ->
    per-key agg (count + min struct). Both aggs are hash aggs with
    map-side combine; duplicated paragraphs by definition collapse hard
    in the combiner, so the shuffle volume is ~distinct (key, doc) pairs,
    never total paragraph occurrences. No Python anywhere."""
    import re as _re

    para = F.col("_para")
    norm = F.lower(F.trim(F.regexp_replace(para, r"\s+", " "))) \
        if normalize else para
    paras = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(F.col(text_col), _re.escape(sep)))
        .alias("_pos", "_para"),
    ).filter(F.trim(para) != "")
    per_doc = paras.select(
        F.md5(norm).alias("para_key"), "_id", "_pos"
    ).groupBy("para_key", "_id").agg(F.min("_pos").alias("_minpos"))
    return (
        per_doc.groupBy("para_key")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(F.struct("_id", "_minpos")).alias("_w"),
        )
        .filter(F.col("n_docs") >= min_docs)
        .select(
            "para_key",
            "n_docs",
            F.col("_w._id").alias("winner_id"),
            F.col("_w._minpos").alias("winner_pos"),
        )
    )


def dedup_paragraphs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    sep: str = "\n",
    min_docs: int = 2,
    normalize: bool = True,
) -> DataFrame:
    """CCNet-style paragraph-level exact dedup: paragraphs duplicated
    across >= ``min_docs`` documents are removed everywhere EXCEPT their
    global first occurrence (ordered by (id, position) — deterministic,
    run- and partitioning-invariant). Returns ``df`` with ``text_col``
    rewritten (kept paragraphs re-joined with ``sep`` in original order)
    plus ``n_paras_dropped`` for audit. Unlike :func:`exact_dedup` this
    removes sub-document duplication (headers, licence blocks, syndicated
    snippets) while keeping every document; unlike
    ``strip_boilerplate`` the duplicate set is unbounded and never
    driver-held.

    NULL text rows pass through unchanged (n_paras_dropped = 0); a doc
    whose every paragraph is dropped keeps an empty string.

    Scale shape: :func:`paragraph_stats` (two hash aggs) -> shuffle join
    of exploded paragraphs against the duplicated-key table on para_key
    (uniform md5 key — no skew) -> one hash agg per doc to re-assemble
    text (``min_by``-free: array_agg of (pos, para) structs sorted
    JVM-side). At 100 TB the join's right side is only the duplicated
    keys (filter >= min_docs applied before the join), a small fraction
    of distinct paragraphs."""
    import re as _re

    stats = paragraph_stats(
        df, text_col, id_col,
        sep=sep, min_docs=min_docs, normalize=normalize,
    )
    para = F.col("_para")
    norm = F.lower(F.trim(F.regexp_replace(para, r"\s+", " "))) \
        if normalize else para
    paras = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(F.col(text_col), _re.escape(sep)))
        .alias("_pos", "_para"),
    ).withColumn(
        "para_key",
        F.when(F.trim(para) != "", F.md5(norm)),  # blanks: NULL key
    )
    keep = (
        F.col("n_docs").isNull()  # unique (or blank) paragraph
        | ((F.col("_id") == F.col("winner_id"))
           & (F.col("_pos") == F.col("winner_pos")))
    )
    decided = paras.join(stats, "para_key", "left")
    rebuilt = (
        decided.groupBy("_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(keep, F.struct("_pos", "_para"))
                        )
                    ),
                    lambda s: s["_para"],
                ),
                sep,
            ).alias("_new_text"),
            F.sum((~keep).cast("long")).alias("n_paras_dropped"),
        )
    )
    out_cols = [
        F.coalesce(F.col("_new_text"), F.col(text_col)).alias(text_col)
        if c == text_col else F.col(c)
        for c in df.columns
    ]
    return (
        df.join(rebuilt, F.col(id_col) == F.col("_id"), "left")
        .select(
            *out_cols,
            F.coalesce(F.col("n_paras_dropped"), F.lit(0)).alias(
                "n_paras_dropped"
            ),
        )
    )
