"""HITS hubs/authorities (operators/graph.py::hits).

Reference parity: the reference system has no graph operators (its
chain is strictly per-record, reference spi/FilterPlugin.java:15-35);
HITS joins pagerank/connected-components on the iterative surface as a
web-corpus quality prior. Semantics are pinned against a pure-Python
reference loop with the identical operation order (sum → L2 normalize
per half-step)."""

from __future__ import annotations

import math

import pytest

from embulk_spark.operators.graph import hits


def _hits_ref(edges: list[tuple[int, int]], iters: int):
    es = set(edges)
    nodes = sorted({u for e in es for u in e})
    hub = {v: 1.0 for v in nodes}
    auth = {v: 0.0 for v in nodes}
    for _ in range(iters):
        auth = {v: sum(hub[u] for (u, w) in es if w == v) for v in nodes}
        nrm = math.sqrt(sum(x * x for x in auth.values()))
        if nrm > 0:
            auth = {v: x / nrm for v, x in auth.items()}
        hub = {v: sum(auth[w] for (u, w) in es if u == v) for v in nodes}
        nrm = math.sqrt(sum(x * x for x in hub.values()))
        if nrm > 0:
            hub = {v: x / nrm for v, x in hub.items()}
    return hub, auth


def test_hits_matches_reference_loop(spark):
    edges = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (4, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: (r.hub, r.auth) for r in hits(df, iters=4).collect()}
    hub, auth = _hits_ref(edges, iters=4)
    assert set(got) == set(hub)
    for v in hub:
        assert abs(got[v][0] - hub[v]) < 1e-12, ("hub", v)
        assert abs(got[v][1] - auth[v]) < 1e-12, ("auth", v)
    # L2 norms are 1 after the final normalization
    assert abs(sum(h * h for h, _ in got.values()) - 1.0) < 1e-9
    assert abs(sum(a * a for _, a in got.values()) - 1.0) < 1e-9


def test_hits_hub_vs_authority_roles(spark):
    # 1 links to everything (pure hub); 5 is linked by everything else
    # (pure authority, no out-edges)
    edges = [(1, 2), (1, 3), (1, 5), (2, 5), (3, 5), (4, 5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: (r.hub, r.auth) for r in hits(df, iters=5).collect()}
    assert got[1][0] == max(h for h, _ in got.values())  # best hub
    assert got[5][1] == max(a for _, a in got.values())  # best authority
    assert got[5][0] == 0.0  # no out-edges → zero hub
    assert got[1][1] == 0.0  # nothing links to 1 → zero auth


def test_hits_duplicate_edges_are_distinct(spark):
    df = spark.createDataFrame(
        [(1, 2), (1, 2), (2, 1)], "src long, dst long"
    )
    got = {r.node: (r.hub, r.auth) for r in hits(df, iters=3).collect()}
    hub, auth = _hits_ref([(1, 2), (2, 1)], iters=3)
    for v in hub:
        assert abs(got[v][0] - hub[v]) < 1e-12
        assert abs(got[v][1] - auth[v]) < 1e-12


def test_hits_reliable_checkpoint_resumes_from_last_round(spark, tmp_path):
    edges = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    ck = str(tmp_path / "hits_ck")
    clean = {
        r.node: (r.hub, r.auth) for r in hits(df, iters=4).collect()
    }
    # run 2 rounds, then resume to 4 against the same checkpoint dir
    hits(df, iters=2, reliable_checkpoint_dir=ck).collect()
    resumed = {
        r.node: (r.hub, r.auth)
        for r in hits(df, iters=4, reliable_checkpoint_dir=ck).collect()
    }
    for v in clean:
        assert abs(resumed[v][0] - clean[v][0]) < 1e-12
        assert abs(resumed[v][1] - clean[v][1]) < 1e-12


def test_hits_checkpoint_gate_rejects_different_edges(spark, tmp_path):
    ck = str(tmp_path / "hits_ck")
    a = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    b = spark.createDataFrame([(7, 8), (8, 9)], "src long, dst long")
    hits(a, iters=3, reliable_checkpoint_dir=ck).collect()
    got = {
        r.node: (r.hub, r.auth)
        for r in hits(b, iters=3, reliable_checkpoint_dir=ck).collect()
    }
    hub, auth = _hits_ref([(7, 8), (8, 9)], iters=3)
    assert set(got) == set(hub)  # stale rounds were not reused
    for v in hub:
        assert abs(got[v][0] - hub[v]) < 1e-12
