"""SCD-2 history build, fixed-iteration PageRank, Bloom membership probe."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from embulk_spark.operators.bloom import bloom_build, bloom_probe
from embulk_spark.operators.graph import pagerank
from embulk_spark.operators.scd import scd2_history


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


# ---------------------------------------------------------------------------
# SCD-2
# ---------------------------------------------------------------------------

def _scd_fixture(spark):
    rows = [
        # url A: v1 -> no-op update (collapses) -> v2 -> v3
        Row(url="a", ts=_ts("2024-01-01T00:00:00"), seq=1, state="x"),
        Row(url="a", ts=_ts("2024-01-02T00:00:00"), seq=2, state="x"),
        Row(url="a", ts=_ts("2024-01-03T00:00:00"), seq=3, state="y"),
        Row(url="a", ts=_ts("2024-01-04T00:00:00"), seq=4, state="z"),
        # url B: single version
        Row(url="b", ts=_ts("2024-02-01T00:00:00"), seq=5, state="only"),
        # url C: same-timestamp tie broken by seq; then NULL transition
        Row(url="c", ts=_ts("2024-03-01T00:00:00"), seq=7, state="late"),
        Row(url="c", ts=_ts("2024-03-01T00:00:00"), seq=6, state="early"),
        Row(url="c", ts=_ts("2024-03-02T00:00:00"), seq=8, state=None),
        Row(url="c", ts=_ts("2024-03-03T00:00:00"), seq=9, state=None),
    ]
    return spark.createDataFrame(rows)


def test_scd2_versions_and_intervals(spark):
    hist = scd2_history(
        _scd_fixture(spark), ["url"], "ts", ["state"], tie_cols=["seq"]
    )
    got = {
        (r.url, r.version): r for r in hist.collect()
    }
    # url a: no-op update collapsed -> 3 versions
    assert {k for k in got if k[0] == "a"} == {("a", 1), ("a", 2), ("a", 3)}
    a1, a2, a3 = got[("a", 1)], got[("a", 2)], got[("a", 3)]
    assert (a1.state, a2.state, a3.state) == ("x", "y", "z")
    # interval chain: valid_to == next valid_from, half-open
    assert a1.valid_from == _ts("2024-01-01T00:00:00")
    assert a1.valid_to == a2.valid_from == _ts("2024-01-03T00:00:00")
    assert a2.valid_to == a3.valid_from == _ts("2024-01-04T00:00:00")
    assert a3.valid_to is None and a3.is_current
    assert not a1.is_current and not a2.is_current

    # url b: one open version
    b1 = got[("b", 1)]
    assert b1.state == "only" and b1.is_current and b1.valid_to is None

    # url c: same-ts tie broken by seq (early then late), then one NULL
    # version (NULL==NULL collapses null-safely)
    c = sorted((r for k, r in got.items() if k[0] == "c"), key=lambda r: r.version)
    assert [r.state for r in c] == ["early", "late", None]
    assert c[0].valid_to == c[1].valid_from  # zero-length first version
    assert c[2].is_current


def test_scd2_no_collapse_keeps_noop_updates(spark):
    hist = scd2_history(
        _scd_fixture(spark), ["url"], "ts", ["state"], tie_cols=["seq"],
        collapse=False,
    )
    assert hist.filter(F.col("url") == "a").count() == 4
    assert hist.filter(F.col("url") == "c").count() == 4


def test_scd2_current_rows_match_latest_per_key(spark):
    """The SCD-2 open version per key IS the newest-wins MERGE winner."""
    df = _scd_fixture(spark)
    hist = scd2_history(df, ["url"], "ts", ["state"], tie_cols=["seq"])
    current = {
        r.url: r.state for r in hist.filter("is_current").collect()
    }
    latest = {
        r.url: r.state
        for r in df.groupBy("url")
        .agg(F.max_by("state", F.struct("ts", "seq")).alias("state"))
        .collect()
    }
    assert current == latest


# ---------------------------------------------------------------------------
# PageRank
# ---------------------------------------------------------------------------

def _pagerank_numpy(edges: list[tuple[int, int]], iters: int, d: float):
    nodes = sorted({u for e in edges for u in e})
    n = len(nodes)
    out: dict[int, list[int]] = {}
    for s, t in set(edges):
        out.setdefault(s, []).append(t)
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        dangling = sum(rank[v] for v in nodes if v not in out)
        nxt = {}
        for v in nodes:
            inflow = sum(
                rank[u] / len(out[u]) for u in out if v in out[u]
            )
            nxt[v] = (1 - d) / n + d * (inflow + dangling / n)
        rank = nxt
    return rank


def test_pagerank_matches_reference_loop(spark):
    edges = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3)]  # every node has out-edges
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.rank for r in pagerank(df, iters=4).collect()}
    want = _pagerank_numpy(edges, iters=4, d=0.85)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-12, v
    # conservation: dangling redistribution keeps total rank at 1
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_dangling_nodes_redistribute(spark):
    # star into a sink: 2..5 -> 1; node 1 has no out-edges (pure dangling)
    edges = [(i, 1) for i in range(2, 6)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.rank for r in pagerank(df, iters=3).collect()}
    want = _pagerank_numpy(edges, iters=3, d=0.85)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-12
    assert got[1] > got[2]  # sink accumulates
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_duplicate_edges_are_distinct(spark):
    dup = [(1, 2), (1, 2), (2, 1)]
    df = spark.createDataFrame(dup, "src long, dst long")
    got = {r.node: r.rank for r in pagerank(df, iters=2).collect()}
    want = _pagerank_numpy([(1, 2), (2, 1)], iters=2, d=0.85)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-12


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------

def test_bloom_no_false_negatives(spark):
    vals = [f"doc-{i}" for i in range(500)]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    bloom = bloom_build(df, "v", m_bits=1 << 16, k=5)
    probed = bloom_probe(
        df.withColumn("id", F.col("v")), bloom, "v", ["id"],
        m_bits=1 << 16, k=5,
    )
    assert probed.filter(~F.col("maybe_present")).count() == 0


def test_bloom_false_positive_rate_reasonable(spark):
    members = spark.createDataFrame(
        [(f"in-{i}",) for i in range(1000)], "v string"
    )
    outsiders = spark.createDataFrame(
        [(f"out-{i}",) for i in range(1000)], "v string"
    ).withColumn("id", F.col("v"))
    # m/n = 65536/1000 ≈ 65 bits/element, k=5 → theoretical FP ≈ 2e-5
    bloom = bloom_build(members, "v", m_bits=1 << 16, k=5)
    fp = (
        bloom_probe(outsiders, bloom, "v", ["id"], m_bits=1 << 16, k=5)
        .filter("maybe_present")
        .count()
    )
    assert fp <= 5  # generous ceiling over the ~0.02 expected


def test_bloom_definite_negative_contract(spark):
    """bloom-negative rows are NEVER exact members (the safe-to-skip set)."""
    corpus = spark.createDataFrame(
        [(f"t{i % 50}",) for i in range(200)], "v string"
    )
    batch = spark.createDataFrame(
        [(i, f"t{i}") for i in range(100)], "id long, v string"
    )
    bloom = bloom_build(corpus, "v", m_bits=1 << 14, k=4)
    probed = bloom_probe(batch, bloom, "v", ["id"], m_bits=1 << 14, k=4)
    exact = {r.id for r in batch.join(
        corpus.select(F.col("v").alias("_c")).distinct(),
        batch["v"] == F.col("_c"),
    ).select("id").collect()}
    for r in probed.collect():
        if not r.maybe_present:
            assert r.id not in exact
    # and every true member is flagged
    flagged = {r.id for r in probed.filter("maybe_present").collect()}
    assert exact <= flagged


def test_scd2_join_picks_valid_version(spark):
    import datetime as dt

    from embulk_spark.operators.scd import scd2_history, scd2_join

    t = dt.datetime
    ev = spark.createDataFrame(
        [
            (1, "a", t(2026, 1, 1), 1),
            (1, "b", t(2026, 1, 10), 2),
            (2, "x", t(2026, 1, 5), 3),
        ],
        "uid LONG, attr STRING, ts TIMESTAMP, seq LONG",
    )
    dim = scd2_history(ev, ["uid"], "ts", ["attr"], tie_cols=["seq"])
    facts = spark.createDataFrame(
        [
            (100, 1, t(2026, 1, 2)),    # inside v1
            (101, 1, t(2026, 1, 10)),   # exactly at v2.valid_from → v2
            (102, 1, t(2026, 2, 1)),    # open current version → v2
            (103, 2, t(2026, 1, 1)),    # before any version → null (left)
            (104, 3, t(2026, 1, 1)),    # unknown key → null (left)
        ],
        "fid LONG, uid LONG, fts TIMESTAMP",
    )
    out = scd2_join(facts, dim, keys=["uid"], ts_col="fts", how="left")
    got = {r.fid: (r.attr, r.version) for r in out.collect()}
    assert got == {
        100: ("a", 1), 101: ("b", 2), 102: ("b", 2),
        103: (None, None), 104: (None, None),
    }
    inner = scd2_join(facts, dim, keys=["uid"], ts_col="fts", how="inner")
    assert {r.fid for r in inner.collect()} == {100, 101, 102}
    # collision guard
    import pytest as _pt

    facts2 = facts.withColumnRenamed("fts", "valid_from")
    with _pt.raises(ValueError, match="collide"):
        scd2_join(facts2, dim, keys=["uid"], ts_col="valid_from")


# ---------------------------------------------------------------------------
# reliable round checkpoints: restart-level durability for iterative loops
# ---------------------------------------------------------------------------

def test_pagerank_reliable_checkpoint_resumes_from_last_round(spark, tmp_path):
    """A killed iterative job restarted over the same edges resumes from
    the last fully-committed round's parquet checkpoint: earlier rounds
    are not recomputed, and the result is identical to an uninterrupted
    run (and to the localCheckpoint fast path)."""
    import os

    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (5, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    clean = {r.node: r.rank for r in pagerank(df, iters=4).collect()}

    ck = str(tmp_path / "pr")
    # "crash" after round 2: a partial run that completed 2 of 4 rounds
    partial = pagerank(df, iters=2, reliable_checkpoint_dir=ck)
    assert partial.count() == 5
    assert os.path.exists(os.path.join(ck, "round=2", "_SUCCESS"))
    stamp = {
        k: os.path.getmtime(os.path.join(ck, f"round={k}"))
        for k in (1, 2)
    }

    # restart with the full iteration budget: resumes at round 3
    got = {
        r.node: r.rank
        for r in pagerank(
            df, iters=4, reliable_checkpoint_dir=ck
        ).collect()
    }
    assert got.keys() == clean.keys()
    assert all(abs(got[k] - clean[k]) < 1e-12 for k in clean)
    # rounds 1-2 untouched (not recomputed), rounds 3-4 newly committed
    for k in (1, 2):
        assert os.path.getmtime(os.path.join(ck, f"round={k}")) == stamp[k]
    assert os.path.exists(os.path.join(ck, "round=4", "_SUCCESS"))

    # a third invocation with the same budget short-circuits to the
    # stored final round
    again = {
        r.node: r.rank
        for r in pagerank(
            df, iters=4, reliable_checkpoint_dir=ck
        ).collect()
    }
    assert again == got


def test_connected_components_reliable_checkpoint_resume(spark, tmp_path):
    """Min-label propagation resumed from an intermediate round's labels
    converges to the same components as an uninterrupted run."""
    from embulk_spark.operators.cluster import connected_components

    # chain 1-2-3-4-5 plus blob {10,11,12}: needs several rounds
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (10, 12)],
        "id_a long, id_b long",
    )
    clean = {
        r.id: r.component for r in connected_components(pairs).collect()
    }
    ck = str(tmp_path / "cc")
    # partial run: only 1 round allowed — converged? no (chain diameter)
    try:
        connected_components(pairs, max_iter=1, reliable_checkpoint_dir=ck)
    except RuntimeError:
        pass  # expected: round budget exhausted mid-propagation
    got = {
        r.id: r.component
        for r in connected_components(
            pairs, reliable_checkpoint_dir=ck
        ).collect()
    }
    assert got == clean
    assert clean[5] == 1 and clean[12] == 10


def test_connected_components_resume_after_exact_max_iter_convergence(
    spark, tmp_path
):
    """Regression (r3 ADVICE #2): a run that converges exactly at round
    max_iter leaves round=max_iter checkpointed; re-invoking used to set
    start=max_iter, skip the loop body, and raise 'did not converge' for
    a run that in fact converged. Resume now re-runs the (idempotent)
    converged round and returns via changed==0."""
    from embulk_spark.operators.cluster import connected_components

    # chain 1-2-3: changed rounds 1,2; round 3 detects convergence —
    # exactly max_iter=3
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    ck = str(tmp_path / "cc")
    first = {
        r.id: r.component
        for r in connected_components(
            pairs, max_iter=3, reliable_checkpoint_dir=ck
        ).collect()
    }
    assert first == {1: 1, 2: 1, 3: 1}
    import os

    assert os.path.exists(os.path.join(ck, "round=3", "_SUCCESS"))
    again = {
        r.id: r.component
        for r in connected_components(
            pairs, max_iter=3, reliable_checkpoint_dir=ck
        ).collect()
    }
    assert again == first


def test_checkpoint_manifest_refuses_stale_state(spark, tmp_path):
    """Regression (r3 ADVICE #3): reusing a reliable_checkpoint_dir
    across a DIFFERENT edge list (or different damping) used to silently
    resume from stale round state and return wrong ranks/components.
    The manifest gate now detects the mismatch, clears the stale rounds,
    and starts fresh."""
    import os

    from embulk_spark.operators.cluster import connected_components

    ck = str(tmp_path / "pr")
    edges_a = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], "src long, dst long"
    )
    pagerank(edges_a, iters=3, reliable_checkpoint_dir=ck)
    assert os.path.exists(os.path.join(ck, "round=3", "_SUCCESS"))

    # same dir, different graph: must NOT resume from graph A's rounds
    edges_b = spark.createDataFrame(
        [(10, 20), (20, 30), (30, 40), (40, 10), (10, 30)],
        "src long, dst long",
    )
    clean_b = {r.node: r.rank for r in pagerank(edges_b, iters=3).collect()}
    got_b = {
        r.node: r.rank
        for r in pagerank(
            edges_b, iters=3, reliable_checkpoint_dir=ck
        ).collect()
    }
    assert got_b.keys() == clean_b.keys()
    assert all(abs(got_b[k] - clean_b[k]) < 1e-12 for k in clean_b)

    # different damping over the SAME edges: also a different job
    clean_d = {
        r.node: r.rank
        for r in pagerank(edges_b, iters=3, damping=0.5).collect()
    }
    got_d = {
        r.node: r.rank
        for r in pagerank(
            edges_b, iters=3, damping=0.5, reliable_checkpoint_dir=ck
        ).collect()
    }
    assert all(abs(got_d[k] - clean_d[k]) < 1e-12 for k in clean_d)

    # connected_components shares the gate: stale pagerank-shaped state
    # in the same dir is refused, fresh labels computed
    pairs = spark.createDataFrame([(1, 2), (3, 4)], "id_a long, id_b long")
    comp = {
        r.id: r.component
        for r in connected_components(
            pairs, reliable_checkpoint_dir=ck
        ).collect()
    }
    assert comp == {1: 1, 2: 1, 3: 3, 4: 3}
