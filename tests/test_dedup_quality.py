"""Statistical quality of the MinHash estimator — not just engine↔oracle
consistency (both sides share the permutation constants, so a degenerate
family would still hash-match; this suite pins the estimator itself)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from embulk_spark.operators.dedup import minhash_df, minhash_near_dups


WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliett kilo "
    "lima mike november oscar papa quebec romeo sierra tango uniform victor"
).split()


def _doc(words):
    return " ".join(words)


@pytest.fixture(scope="module")
def overlap_docs(spark):
    # doc 2 = doc 1 plus a 4-word suffix: shingle sets are 20 vs 24 with
    # 20 shared -> true Jaccard = 20/24 ~ 0.833. doc 3 is word-disjoint.
    base = WORDS
    longer = WORDS + ["whiskey", "xray", "yankee", "zulu"]
    other = [w.upper() + "x" for w in WORDS]
    return spark.createDataFrame(
        [(1, _doc(base)), (2, _doc(longer)), (3, _doc(other))],
        "doc_id long, text string",
    )


def test_signature_agreement_tracks_true_jaccard(spark, overlap_docs):
    k = 64
    sigs = {r.doc_id: r.sig for r in minhash_df(overlap_docs, "text", "doc_id", k=k).collect()}
    agree_12 = sum(a == b for a, b in zip(sigs[1], sigs[2])) / k
    agree_13 = sum(a == b for a, b in zip(sigs[1], sigs[3])) / k
    # binomial(64, 0.833): agreement within ±0.15 of truth w.h.p.;
    # a degenerate (order-preserving) family collapses to 0 or 1
    assert 0.68 <= agree_12 <= 0.98, agree_12
    assert agree_13 <= 0.1, agree_13


def test_near_dup_pair_found_and_disjoint_rejected(spark, overlap_docs):
    pairs = {
        (r.id_a, r.id_b): r.jaccard_est
        for r in minhash_near_dups(
            overlap_docs, "text", "doc_id", k=16, bands=8, threshold=0.5
        ).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] >= 0.5
    assert all(3 not in p for p in pairs)


def test_permutations_disagree_on_argmin(spark):
    # >=2 distinct values per signature: the permutation family must not
    # share one global argmin shingle (the 2^61-1 regression)
    docs = spark.createDataFrame([(1, _doc(WORDS))], "doc_id long, text string")
    sig = minhash_df(docs, "text", "doc_id", k=16).head().sig
    assert len(set(sig)) > 4, sig


def test_benchmark_overlap_decontamination(spark):
    """Decontamination: a doc copying a benchmark passage scores high
    overlap; clean docs score 0; the benchmark's own members score 1.0;
    plan uses a broadcast membership probe (no corpus shuffle on grams)."""
    from embulk_spark.operators.dedup import benchmark_overlap

    bench = spark.createDataFrame(
        [(100, "the secret eval question about spark shuffles and joins")],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            (1, "the secret eval question about spark shuffles and joins"),
            (2, "prefix words then the secret eval question about spark ends"),
            (3, "completely unrelated text with many different words inside"),
            (4, "too short"),
        ],
        "doc_id long, text string",
    )
    out = benchmark_overlap(docs, bench, "text", "doc_id", shingle_n=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    rows = {r["doc_id"]: r for r in out.collect()}
    assert 4 not in rows  # < 3 words: no shingles, cannot be contaminated
    assert rows[1]["overlap_frac"] == 1.0
    assert rows[3]["n_overlap"] == 0 and rows[3]["overlap_frac"] == 0.0
    assert 0.0 < rows[2]["overlap_frac"] < 1.0
    # shared span 'the secret eval question about spark' = 4 rolling 3-grams
    assert rows[2]["n_overlap"] == 4


def test_benchmark_overlap_bench_needs_no_id(spark):
    """Eval sets are external corpora: the bench side must work with a
    text-only schema (and its own column name)."""
    from embulk_spark.operators.dedup import benchmark_overlap

    bench = spark.createDataFrame(
        [("the secret eval question about spark",)], "prompt string"
    )
    docs = spark.createDataFrame(
        [(1, "the secret eval question about spark")], "doc_id long, text string"
    )
    out = benchmark_overlap(
        docs, bench, "text", "doc_id", shingle_n=3, bench_text_col="prompt"
    )
    assert out.collect()[0]["overlap_frac"] == 1.0


# ---------------------------------------------------------------------------
# CCNet-style paragraph-level dedup
# ---------------------------------------------------------------------------

@pytest.fixture()
def para_docs(spark):
    rows = [
        (1, "INTRO\nunique one\nFOOTER"),
        (2, "INTRO\nunique two\nFOOTER"),
        (3, "unique three\nintro\nFOOTER"),  # normalized match for INTRO
        (4, ""),
        (5, None),
        (6, "FOOTER\nFOOTER"),  # intra-doc copies of a global dup
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_paragraph_dedup_keeps_global_first_occurrence(spark, para_docs):
    from embulk_spark.operators.dedup import dedup_paragraphs

    out = {
        r.doc_id: (r.text, r.n_paras_dropped)
        for r in dedup_paragraphs(para_docs, "text", "doc_id").collect()
    }
    # doc 1 holds the first occurrence of both INTRO and FOOTER
    assert out[1] == ("INTRO\nunique one\nFOOTER", 0)
    assert out[2] == ("unique two", 2)
    # 'intro' normalizes to the INTRO key; doc keeps only its unique line
    assert out[3] == ("unique three", 2)
    # empty text survives unchanged; NULL text passes through
    assert out[4] == ("", 0)
    assert out[5] == (None, 0)
    # both intra-doc copies of the duplicated FOOTER drop
    assert out[6] == ("", 2)
    # every document is preserved (dedup is sub-document only)
    assert len(out) == 6


def test_paragraph_dedup_normalize_off_is_byte_exact(spark, para_docs):
    from embulk_spark.operators.dedup import dedup_paragraphs

    out = {
        r.doc_id: r.text
        for r in dedup_paragraphs(
            para_docs, "text", "doc_id", normalize=False
        ).collect()
    }
    # without normalization 'intro' != 'INTRO', so doc 3 keeps it
    assert out[3] == "unique three\nintro"


def test_paragraph_dedup_min_docs_threshold(spark, para_docs):
    from embulk_spark.operators.dedup import dedup_paragraphs

    out = {
        r.doc_id: r.n_paras_dropped
        for r in dedup_paragraphs(
            para_docs, "text", "doc_id", min_docs=4
        ).collect()
    }
    # FOOTER appears in 4 distinct docs (1,2,3,6) — still deduped;
    # INTRO appears in 3 — kept everywhere
    assert out[2] == 1 and out[3] == 1 and out[6] == 2
    assert out[1] == 0


def test_paragraph_dedup_custom_sep_roundtrip(spark):
    from embulk_spark.operators.dedup import dedup_paragraphs

    rows = [(1, "A\r\nkeep1\r\nA"), (2, "A\r\nkeep2")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r.text
        for r in dedup_paragraphs(
            df, "text", "doc_id", sep="\r\n"
        ).collect()
    }
    # the separator is literal (CRLF survives) and dedup still applies
    assert out[1] == "A\r\nkeep1"
    assert out[2] == "keep2"


def test_paragraph_stats_reports_winners(spark, para_docs):
    from embulk_spark.operators.dedup import paragraph_stats

    stats = {
        (r.winner_id, r.winner_pos): r.n_docs
        for r in paragraph_stats(para_docs, "text", "doc_id").collect()
    }
    # INTRO: first occurrence doc 1 pos 0, in 3 docs (1, 2, 3-normalized)
    assert stats[(1, 0)] == 3
    # FOOTER: first occurrence doc 1 pos 2, in 4 distinct docs
    assert stats[(1, 2)] == 4
    assert len(stats) == 2
