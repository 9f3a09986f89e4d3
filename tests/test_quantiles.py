"""Histogram-sketch quantiles: merge exactness, interpolation, bounds."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from embulk_spark.operators.quantiles import (
    LENGTH_EDGES,
    hist_build,
    hist_merge,
    hist_quantiles,
    length_quantiles,
)


@pytest.fixture(scope="module")
def docs(spark):
    # deterministic lengths with a heavy tail, two groups
    rows = [(i, "en" if i % 3 else "de", (i * 37) % 2900 + 7) for i in range(600)]
    return spark.createDataFrame(rows, "doc_id long, lang string, n_chars long")


def test_merge_of_partial_histograms_is_batch(docs):
    full = hist_build(docs, "n_chars", ["lang"])
    h1 = hist_build(docs.filter(F.col("doc_id") < 300), "n_chars", ["lang"])
    h2 = hist_build(docs.filter(F.col("doc_id") >= 300), "n_chars", ["lang"])
    merged = hist_merge(h1, h2)
    a = {(r.lang, r.bin): r.cnt for r in full.collect()}
    b = {(r.lang, r.bin): r.cnt for r in merged.collect()}
    assert a == b


def test_quantile_estimate_within_bin_of_truth(docs):
    got = {
        (r.lang, r.q): r.est
        for r in length_quantiles(docs, "n_chars", ["lang"], [0.5, 0.9]).collect()
    }
    rows = docs.collect()
    for lang in ("en", "de"):
        vals = sorted(r.n_chars for r in rows if r.lang == lang)
        for q in (0.5, 0.9):
            true = vals[min(int(q * len(vals)), len(vals) - 1)]
            est = got[(lang, q)]
            # the estimate must land in the true value's bin (± one edge)
            import bisect
            b = min(max(bisect.bisect_right(LENGTH_EDGES, true), 1),
                    len(LENGTH_EDGES) - 1) - 1
            assert LENGTH_EDGES[b] <= est <= LENGTH_EDGES[b + 1], (lang, q, est, true)


def test_outliers_clamp_into_end_bins(spark):
    df = spark.createDataFrame(
        [(1, "x", -50), (2, "x", 10**9)], "id long, g string, v long"
    )
    bins = {r.bin for r in hist_build(df, "v", ["g"]).collect()}
    assert bins == {0, len(LENGTH_EDGES) - 2}


def test_exact_quantiles_on_uniform_single_bin(spark):
    # all values inside one bin: interpolation is exact for the uniform case
    df = spark.createDataFrame(
        [(i, "g", 400 + i) for i in range(400)], "id long, g string, v long"
    )
    out = {r.q: r.est for r in hist_quantiles(
        hist_build(df, "v", ["g"]), ["g"], [0.5, 1.0]).collect()}
    # bin [400, 800), 400 uniform values: q=1.0 → upper edge exactly
    assert out[1.0] == 800.0
    assert 595.0 <= out[0.5] <= 605.0


def test_partitioning_invariance(docs):
    a = sorted(
        (r.lang, r.q, r.n, r.est)
        for r in length_quantiles(docs, "n_chars", ["lang"], [0.25, 0.75]).collect()
    )
    b = sorted(
        (r.lang, r.q, r.n, r.est)
        for r in length_quantiles(
            docs.repartition(13), "n_chars", ["lang"], [0.25, 0.75]
        ).collect()
    )
    assert a == b
