"""DSIR weighting, SemDeDup, and URL-rule filtering
(operators/weighting.py, semdedup.py, urlfilter.py): deterministic
scores/assignments invariant to partitioning, and rule semantics pinned
on hand-built fixtures."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from embulk_spark.operators.semdedup import (
    assign_clusters,
    kmeans_fit,
    semantic_dedup,
)
from embulk_spark.operators.urlfilter import apply_url_rules
from embulk_spark.operators.weighting import dsir_weights


# ---------- DSIR ----------


@pytest.fixture(scope="module")
def docs(spark):
    rows = []
    for i in range(200):
        if i % 2 == 0:
            text = "the model trains on clean english text " * 3
            lang = "en"
        else:
            text = "das modell lernt aus deutschem text " * 3
            lang = "de"
        rows.append((i, lang, text + f"doc{i}"))
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_dsir_targets_score_higher(spark, docs):
    w = dsir_weights(docs, F.col("lang") == "en").join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    rows = w.collect()
    en = [r["dsir_logweight"] for r in rows if r["lang"] == "en"]
    de = [r["dsir_logweight"] for r in rows if r["lang"] == "de"]
    assert min(en) > max(de)


def test_dsir_partitioning_invariant(spark, docs):
    a = {r["doc_id"]: r["dsir_logweight"] for r in dsir_weights(
        docs, F.col("lang") == "en").collect()}
    b = {r["doc_id"]: r["dsir_logweight"] for r in dsir_weights(
        docs.repartition(13), F.col("lang") == "en").collect()}
    assert a == b


def test_dsir_empty_doc_emits_no_row(spark):
    d = spark.createDataFrame(
        [(1, "en", "hello world"), (2, "en", "   "), (3, "de", "")],
        "doc_id long, lang string, text string",
    )
    got = {r["doc_id"] for r in dsir_weights(d, F.col("lang") == "en").collect()}
    assert got == {1}


def test_lm_perplexity_targets_score_lower(spark, docs):
    from embulk_spark.operators.weighting import lm_perplexity

    w = lm_perplexity(docs, F.col("lang") == "en").join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    rows = w.collect()
    en = [r["bits_per_bigram"] for r in rows if r["lang"] == "en"]
    de = [r["bits_per_bigram"] for r in rows if r["lang"] == "de"]
    assert max(en) < min(de)


def test_lm_perplexity_partitioning_invariant_and_short_docs(spark):
    from embulk_spark.operators.weighting import lm_perplexity

    d = spark.createDataFrame(
        [(1, "en", "a b c a b"), (2, "en", "single"), (3, "de", "a b d")],
        "doc_id long, lang string, text string",
    )
    a = {r["doc_id"]: r["bits_per_bigram"]
         for r in lm_perplexity(d, F.col("lang") == "en").collect()}
    b = {r["doc_id"]: r["bits_per_bigram"]
         for r in lm_perplexity(d.repartition(5), F.col("lang") == "en").collect()}
    assert a == b and set(a) == {1, 3}  # doc 2 has no bigram → no row


# ---------- SemDeDup ----------


def _vec(*xs):
    return [float(x) for x in xs]


@pytest.fixture(scope="module")
def emb(spark):
    # Two tight groups on orthogonal axes + one near-duplicate per group.
    rows = [
        (0, _vec(1.0, 0.0, 0.0)),
        (1, _vec(0.99, 0.01, 0.0)),   # near-dup of 0
        (2, _vec(0.0, 1.0, 0.0)),
        (3, _vec(0.0, 0.98, 0.02)),   # near-dup of 2
        (4, _vec(0.6, 0.0, 0.8)),     # same half-space as 0 but far in cosine
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_kmeans_deterministic_and_partitioning_invariant(spark, emb):
    c1 = kmeans_fit(emb, k=2, n_iter=2)
    c2 = kmeans_fit(emb.repartition(7), k=2, n_iter=2)
    assert c1 == c2 and len(c1) == 2


def test_semantic_dedup_drops_near_dup_keeps_canonical(spark, emb):
    cents = kmeans_fit(emb, k=2, n_iter=2)
    out = {r["vec_id"]: r for r in semantic_dedup(emb, cents, 0.95).collect()}
    assert len(out) == 5
    # canonical rows always keep
    for r in out.values():
        if r["vec_id"] == r["canon_id"]:
            assert r["keep"]
    # 1 is a near-dup of its cluster canonical (cosine ≈ 0.9999) → dropped
    assert out[1]["canon_id"] == 0 and not out[1]["keep"]
    assert out[3]["canon_id"] == 2 and not out[3]["keep"]
    # 4 shares 0's cluster but cosine(4, 0)=0.6 < 0.95 → kept
    assert out[4]["keep"] and math.isclose(out[4]["cos_canon"], 0.6, abs_tol=1e-6)


def test_assign_ties_break_to_lowest_cluster(spark):
    d = spark.createDataFrame(
        [(0, _vec(1.0, 1.0))], "vec_id long, embedding array<double>"
    )
    cents = [(0, _vec(1.0, 0.0)), (1, _vec(0.0, 1.0))]
    assert assign_clusters(d, cents).head()["cluster"] == 0


def test_kmeans_empty_cluster_dropped_ids_stable(spark):
    # 3 identical vectors + k=2: after one iteration every point lands in
    # cluster 0; cluster 1 empties and is dropped, 0 keeps its id.
    d = spark.createDataFrame(
        [(i, _vec(1.0, 0.0)) for i in range(3)],
        "vec_id long, embedding array<double>",
    )
    cents = kmeans_fit(d, k=2, n_iter=2)
    assert [cid for cid, _ in cents] == [0]


# ---------- URL rules ----------


@pytest.fixture(scope="module")
def rules(spark):
    return spark.createDataFrame(
        [
            ("domain", "blocked.com"),
            ("host", "bad.example.org"),
            ("prefix", "https://www.site.net/ads"),
        ],
        "kind string, pattern string",
    )


def _urls(spark, urls):
    return spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "doc_id long, url string"
    )


def test_domain_rule_blocks_all_hosts_case_insensitive(spark, rules):
    df = _urls(spark, [
        "https://Blocked.COM/x",
        "https://cdn.blocked.com/y",
        "https://notblocked.com/z",
    ])
    kept = {r["url"] for r in apply_url_rules(df, rules).collect()}
    assert kept == {"https://notblocked.com/z"}


def test_host_rule_blocks_subdomains_not_siblings(spark, rules):
    df = _urls(spark, [
        "https://bad.example.org/a",
        "https://cdn.bad.example.org/b",
        "https://good.example.org/c",
        "https://example.org/d",
    ])
    kept = {r["url"] for r in apply_url_rules(df, rules).collect()}
    assert kept == {"https://good.example.org/c", "https://example.org/d"}


def test_prefix_rule_blocks_subtree_only(spark, rules):
    df = _urls(spark, [
        "https://www.site.net/ads/banner",
        "https://www.site.net/articles/1",
        "https://site.net/ads/banner",  # different host → prefix misses
    ])
    kept = {r["url"] for r in apply_url_rules(df, rules).collect()}
    assert kept == {
        "https://www.site.net/articles/1",
        "https://site.net/ads/banner",
    }


def test_allow_mode_is_complement(spark, rules):
    df = _urls(spark, [
        "https://blocked.com/x",
        "https://ok.io/y",
    ])
    blocked = {r["doc_id"] for r in apply_url_rules(df, rules, mode="block").collect()}
    allowed = {r["doc_id"] for r in apply_url_rules(df, rules, mode="allow").collect()}
    assert blocked == {1} and allowed == {0}


def test_bad_mode_raises(spark, rules):
    with pytest.raises(ValueError):
        apply_url_rules(_urls(spark, ["https://x.io/"]), rules, mode="nope")


def test_ccnet_buckets_labels_and_order(spark):
    from embulk_spark.operators.weighting import ccnet_buckets

    # 9 en docs built from two token pools: docs repeating common bigrams
    # score low (head), rare-bigram docs score high (tail)
    common = "the cat sat on the mat and the dog ran"
    rows = [(i, "en", common) for i in range(6)]
    rows += [(10 + i, "en", f"zq{i} xv{i} wk{i} jj{i} qq{i}") for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = ccnet_buckets(df, F.col("lang") == "en")
    got = {r.doc_id: (r.bucket, r.label) for r in out.collect()}
    assert len(got) == 9
    # equal-frequency: 3 per bucket; the 3 rare-bigram docs are the tail
    from collections import Counter
    assert Counter(b for b, _ in got.values()) == {1: 3, 2: 3, 3: 3}
    assert all(got[10 + i] == (3, "tail") for i in range(3))
    assert all(got[i][1] in ("head", "middle") for i in range(6))


def test_ccnet_threshold_path_agrees_off_boundary(spark):
    from embulk_spark.operators.weighting import (
        bucket_by_thresholds,
        bucket_thresholds,
        ccnet_buckets,
        lm_perplexity,
    )

    rows = [
        (i, "en", " ".join(f"w{(i * j) % 7}" for j in range(12)))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    exact = {
        r.doc_id: r.bucket
        for r in ccnet_buckets(df, F.col("lang") == "en").collect()
    }
    scored = lm_perplexity(df, F.col("lang") == "en").join(
        df.select("doc_id", "lang"), "doc_id"
    )
    cuts = bucket_thresholds(scored)
    approx = {
        r.doc_id: r.bucket
        for r in bucket_by_thresholds(scored, cuts).collect()
    }
    # same docs bucketed; agreement within one bucket everywhere and
    # exact agreement for >= 80% (only quantile-boundary ties may move)
    assert set(approx) == set(exact)
    agree = sum(approx[d] == exact[d] for d in exact)
    assert agree >= 0.8 * len(exact)
    assert all(abs(approx[d] - exact[d]) <= 1 for d in exact)
