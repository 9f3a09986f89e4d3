"""Deterministic sampling + mixture planning (operators/sample.py):
sample membership is a pure function of (salt, id) — stable across
partitionings and runs — and the planner hits a token budget at the
target stratum mixture."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from embulk_spark.operators.sample import (
    deterministic_sample,
    hash_uniform,
    mixture_plan,
    stratified_sample,
)

N = 4000


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (i, ["en", "en", "de", "fr"][i % 4], 50 + i % 100)
            for i in range(N)
        ],
        "doc_id long, lang string, n_tokens long",
    )


def test_sample_is_partitioning_invariant(spark, docs):
    a = {r["doc_id"] for r in deterministic_sample(docs, 0.3, "doc_id").collect()}
    b = {
        r["doc_id"]
        for r in deterministic_sample(docs.repartition(17), 0.3, "doc_id").collect()
    }
    assert a == b and 0.25 * N < len(a) < 0.35 * N


def test_salt_changes_membership(spark, docs):
    a = {r["doc_id"] for r in deterministic_sample(docs, 0.3, "doc_id").collect()}
    c = {
        r["doc_id"]
        for r in deterministic_sample(docs, 0.3, "doc_id", salt="other").collect()
    }
    assert a != c


def test_rate_monotone_nesting(spark, docs):
    """A lower-rate sample is a SUBSET of a higher-rate one under the same
    salt (threshold semantics) — lets a pipeline downsample a cached
    sample without re-reading the corpus."""
    lo = {r["doc_id"] for r in deterministic_sample(docs, 0.1, "doc_id").collect()}
    hi = {r["doc_id"] for r in deterministic_sample(docs, 0.4, "doc_id").collect()}
    assert lo < hi


def test_stratified_rates_and_default(spark, docs):
    out = stratified_sample(
        docs, ["lang"], {"en": 0.5, "de": 0.2}, "doc_id", default_rate=0.0
    )
    got = out.groupBy("lang").count().collect()
    by_lang = {r["lang"]: r["count"] for r in got}
    assert "fr" not in by_lang  # default 0 drops unlisted strata
    assert abs(by_lang["en"] / (N / 2) - 0.5) < 0.05
    assert abs(by_lang["de"] / (N / 4) - 0.2) < 0.05
    # schema untouched (helper column dropped)
    assert out.columns == docs.columns


def test_stratified_multi_column_key(spark):
    df = spark.createDataFrame(
        [(i, "web", "en") if i % 2 else (i, "books", "en") for i in range(1000)],
        "doc_id long, source string, lang string",
    )
    out = stratified_sample(
        df, ["source", "lang"], {("web", "en"): 1.0}, "doc_id"
    )
    assert {r["source"] for r in out.collect()} == {"web"}


def test_mixture_plan_hits_budget_and_weights(spark, docs):
    avail = {
        r["lang"]: r["t"]
        for r in docs.groupBy("lang").agg(F.sum("n_tokens").alias("t")).collect()
    }
    plan = mixture_plan(avail, {"en": 0.7, "de": 0.2, "fr": 0.1}, 60_000)
    assert plan["achievable_budget"] == 60_000
    assert abs(plan["tokens"]["en"] - 42_000) <= 1
    # end-to-end: sampled token mass lands near the plan per stratum
    sampled = stratified_sample(docs, ["lang"], plan["rates"], "doc_id")
    got = {
        r["lang"]: r["t"]
        for r in sampled.groupBy("lang").agg(F.sum("n_tokens").alias("t")).collect()
    }
    for s, want in plan["tokens"].items():
        assert abs(got[s] - want) / want < 0.15, (s, got[s], want)


def test_mixture_plan_scales_down_infeasible(spark):
    # 'de' can only support 1000/0.5 = 2000 budget; whole mix scales down
    plan = mixture_plan({"en": 100_000, "de": 1_000}, {"en": 0.5, "de": 0.5}, 60_000)
    assert plan["achievable_budget"] == 2_000
    assert plan["rates"]["de"] == 1.0
    assert abs(plan["rates"]["en"] - 1_000 / 100_000) < 1e-12


def test_mixture_plan_rejects_empty_stratum(spark):
    with pytest.raises(ValueError, match="no tokens"):
        mixture_plan({"en": 10}, {"en": 0.5, "xx": 0.5}, 100)


def test_hash_uniform_range(spark, docs):
    mm = docs.select(
        F.min(hash_uniform(F.col("doc_id"))).alias("lo"),
        F.max(hash_uniform(F.col("doc_id"))).alias("hi"),
        F.avg(hash_uniform(F.col("doc_id"))).alias("mean"),
    ).collect()[0]
    assert 0.0 <= mm["lo"] and mm["hi"] < 1.0 and abs(mm["mean"] - 0.5) < 0.03


# ---------------------------------------------------------------------------
# group-aware split
# ---------------------------------------------------------------------------

def test_split_by_group_no_leakage_and_deterministic(spark):
    from embulk_spark.operators.sample import split_by_group

    df = spark.range(2000).select(
        F.col("id"), (F.col("id") % 97).cast("string").alias("grp")
    )
    out = split_by_group(df, "grp", {"train": 0.8, "val": 0.1, "test": 0.1})
    # every group entirely in one split
    assert out.groupBy("grp").agg(
        F.count_distinct("split").alias("k")
    ).filter("k > 1").count() == 0
    # deterministic across partitionings
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, split_by_group(
        df.repartition(7), "grp", {"train": 0.8, "val": 0.1, "test": 0.1}
    ).collect()))
    assert a == b
    # roughly proportional at the group level
    per = {r.split: r.n for r in out.select("grp", "split").distinct()
           .groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert per.get("train", 0) > per.get("val", 0)
    assert sum(per.values()) == 97
    # adding rows to a group never moves the group (cursor stability)
    more = spark.range(2000, 2100).select(
        F.col("id"), (F.col("id") % 97).cast("string").alias("grp")
    )
    again = split_by_group(df.unionByName(more), "grp",
                           {"train": 0.8, "val": 0.1, "test": 0.1})
    m1 = {r.grp: r.split for r in out.select("grp", "split").distinct().collect()}
    m2 = {r.grp: r.split for r in again.select("grp", "split").distinct().collect()}
    assert all(m2[g] == s for g, s in m1.items())


def test_split_by_group_remainder_and_validation(spark):
    from embulk_spark.operators.sample import split_by_group

    df = spark.range(500).select(
        F.col("id"), F.col("id").cast("string").alias("grp")
    )
    out = split_by_group(df, "grp", {"a": 0.3, "b": 0.2})
    per = {r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    # remainder (~0.5) joins the LAST split
    assert per["b"] > per["a"]
    import pytest as _pytest
    with _pytest.raises(ValueError):
        split_by_group(df, "grp", {"a": 0.9, "b": 0.2})


def test_sample_exact_k_count_determinism_and_stability(spark):
    from embulk_spark.operators.sample import sample_exact_k

    df = spark.createDataFrame(
        [(i, "a" if i % 3 else "b") for i in range(300)],
        "id long, grp string",
    )
    got = sample_exact_k(df, ["grp"], 7, "id")
    counts = {r.grp: r.cnt for r in got.groupBy("grp").agg(
        F.count(F.lit(1)).alias("cnt")).collect()}
    assert counts == {"a": 7, "b": 7}
    # deterministic under repartitioning
    again = sample_exact_k(df.repartition(13), ["grp"], 7, "id")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, again.collect()))
    # stable under growth: adding rows can only evict, never reshuffle —
    # the k=7 sample of a superset intersected with the old universe is a
    # subset of the old sample
    bigger = df.unionByName(spark.createDataFrame(
        [(i, "a" if i % 3 else "b") for i in range(300, 400)],
        "id long, grp string",
    ))
    new = sample_exact_k(bigger, ["grp"], 7, "id")
    old_ids = {r.id for r in got.collect()}
    new_old_ids = {r.id for r in new.collect() if r.id < 300}
    assert new_old_ids <= old_ids
    # a stratum smaller than k returns all of it
    tiny = spark.createDataFrame([(1, "x"), (2, "x")], "id long, grp string")
    assert sample_exact_k(tiny, ["grp"], 7, "id").count() == 2


def test_weighted_sample_ht_estimator_and_determinism(spark):
    from embulk_spark.operators.sample import hash_uniform, weighted_sample

    # weights 1..4: heavier rows must be included proportionally more
    rows = [(i, float(1 + i % 4)) for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, w double")
    got = weighted_sample(df, 0.1, "w", "id")
    pdf = got.toPandas()
    # inclusion probability column matches the rule exactly
    assert (pdf["incl_p"] == (0.1 * pdf["w"]).clip(upper=1.0)).all()
    assert (pdf["ht_factor"] == 1.0 / pdf["incl_p"]).all()
    # Horvitz–Thompson: sum of 1/p estimates the population size
    est = pdf["ht_factor"].sum()
    assert abs(est - 2000) / 2000 < 0.15
    # deterministic under repartitioning
    again = weighted_sample(df.repartition(17), 0.1, "w", "id")
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, again.collect())
    )
    # weight-monotone inclusion frequency: w=4 rows ~4x the w=1 rows
    by_w = pdf.groupby("w")["id"].count()
    assert by_w[4.0] > 2.5 * by_w[1.0]


def test_weighted_sample_p_capped_at_one(spark):
    from embulk_spark.operators.sample import weighted_sample

    df = spark.createDataFrame(
        [(i, 1000.0) for i in range(50)], "id long, w double"
    )
    got = weighted_sample(df, 0.1, "w", "id")
    assert got.count() == 50  # p = min(1, 100) = 1 → everything kept
    assert {r.ht_factor for r in got.collect()} == {1.0}
