"""ANN / embedding near-dup scale guidance: auto-sized hyperplane codes
keep Σ bucket² bounded (the self-join's pair-work), band-OR multi-probe
extends recall, and brute-force stays the exactness baseline."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from embulk_spark.operators.ann import (
    auto_plane_count,
    cosine_topk,
    deterministic_planes,
    embedding_near_dups,
    hyperplane_buckets,
)

DIM = 16
N = 600
THRESH = 0.80


def _vec(i: int) -> list[float]:
    """Deterministic clustered vectors: 40 cluster centroids + a small
    id-dependent perturbation, so near-dup ground truth is non-trivial."""
    import hashlib

    c = i % 40
    base = [
        int.from_bytes(hashlib.md5(f"c{c}:{j}".encode()).digest()[:4], "big")
        / float(1 << 31)
        - 1.0
        for j in range(DIM)
    ]
    eps = [
        0.12
        * (
            int.from_bytes(hashlib.md5(f"e{i}:{j}".encode()).digest()[:4], "big")
            / float(1 << 31)
            - 1.0
        )
        for j in range(DIM)
    ]
    return [a + b for a, b in zip(base, eps)]


@pytest.fixture(scope="module")
def emb(spark):
    rows = [(i, _vec(i)) for i in range(N)]
    return spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")


def _truth_pairs(spark, emb) -> set[tuple[int, int]]:
    """Exact all-pairs ground truth (test-only; N=600)."""
    a = emb.selectExpr("vec_id AS ia", "embedding AS va")
    b = emb.selectExpr("vec_id AS ib", "embedding AS vb")
    from embulk_spark.operators.ann import dot, norm

    pairs = (
        a.crossJoin(b)
        .filter(F.col("ia") < F.col("ib"))
        .select(
            "ia",
            "ib",
            (
                dot(F.col("va"), F.col("vb"))
                / (norm(F.col("va")) * norm(F.col("vb")))
            ).alias("cs"),
        )
        .filter(F.col("cs") >= THRESH)
    )
    return {(r["ia"], r["ib"]) for r in pairs.collect()}


def test_auto_plane_count_scaling_law():
    # expected bucket ≈ target ⇒ Σ bucket² ≈ N · target, not N²/2^const
    assert auto_plane_count(1_000, target_bucket_rows=1024) == 4  # floor
    assert auto_plane_count(1 << 20, target_bucket_rows=1024) == 10
    assert auto_plane_count(10**10, target_bucket_rows=1024) == 24  # cap
    # monotone in N
    prev = 0
    for n in (10**3, 10**5, 10**7, 10**9):
        cur = auto_plane_count(n)
        assert cur >= prev
        prev = cur


def test_auto_planes_bound_pair_work(spark, emb):
    """With auto-sized planes the bucketed self-join's Σ bucket² must be
    FAR below the N² all-pairs work — the quantitative bound that makes
    the operator survive 100×."""
    k = auto_plane_count(N, target_bucket_rows=64)
    planes = deterministic_planes(k, DIM)
    sizes = [
        r["c"]
        for r in hyperplane_buckets(emb, planes)
        .groupBy("bucket_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    ]
    assert sum(sizes) == N
    pair_work = sum(s * s for s in sizes)
    assert pair_work < 0.15 * N * N, f"Σbucket²={pair_work} vs N²={N*N}"


def test_recall_two_plane_counts(spark, emb):
    """Fewer planes ⇒ bigger buckets ⇒ recall no worse; band-OR with the
    same code length strictly extends candidate coverage."""
    truth = _truth_pairs(spark, emb)
    assert len(truth) >= 30  # the fixture must make this non-trivial

    def recall(n_planes: int, n_bands: int = 1) -> float:
        got = {
            (r["id_a"], r["id_b"])
            for r in embedding_near_dups(
                emb,
                deterministic_planes(n_planes, DIM),
                threshold=THRESH,
                n_bands=n_bands,
            ).collect()
        }
        assert got <= truth  # exact cosine filter ⇒ no false positives
        return len(got) / len(truth)

    r4, r8 = recall(4), recall(8)
    assert r4 >= r8  # shorter code = higher recall (more pair work)
    assert r4 >= 0.5
    # band-OR amplification: 8-bit code split into 2 bands beats the
    # monolithic 8-bit code and the 4-bit code alike on recall
    r8b2 = recall(8, n_bands=2)
    assert r8b2 >= r8
    assert r8b2 >= r4 - 1e-9


def test_cosine_topk_matches_bruteforce_ranking(spark, emb):
    q = _vec(9999)
    top = cosine_topk(emb, q, k=5).collect()
    assert len(top) == 5
    sims = [r["cos_sim"] for r in top]
    assert sims == sorted(sims, reverse=True)


def test_ivf_assign_partitions_corpus(spark, emb):
    """Every vector lands in exactly one cell; cells follow the data's own
    clustering (centroids sampled from the corpus => non-empty cells)."""
    from embulk_spark.operators.ann import ivf_assign

    cents = [_vec(i) for i in range(8)]
    assigned = ivf_assign(emb, cents)
    counts = {r["ivf_cell"]: r["n"] for r in
              assigned.groupBy("ivf_cell").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == N
    assert set(counts) <= set(range(8))
    # the 8 centroid rows themselves must map to their own cell
    own = {r["vec_id"]: r["ivf_cell"] for r in
           assigned.filter(F.col("vec_id") < 8).collect()}
    assert own == {i: i for i in range(8)}


def test_ivf_full_probe_equals_bruteforce(spark, emb):
    """nprobe = n_centroids degenerates to the exact answer — the IVF
    recall/cost knob's exactness endpoint."""
    from embulk_spark.operators.ann import ann_ivf_topk

    cents = [_vec(i) for i in range(8)]
    q = _vec(123)
    exact = [(r["vec_id"], r["cos_sim"]) for r in cosine_topk(emb, q, k=10).collect()]
    ivf = [
        (r["vec_id"], r["cos_sim"])
        for r in ann_ivf_topk(emb, q, cents, k=10, nprobe=8).collect()
    ]
    assert ivf == exact


def test_ivf_narrow_probe_recall(spark, emb):
    """nprobe=2 of 8 cells still recalls most of the true top-10 for an
    in-distribution query (clustered fixture => query's cluster is
    concentrated in few cells)."""
    from embulk_spark.operators.ann import ann_ivf_topk

    cents = [_vec(i) for i in range(8)]
    q = _vec(123)
    exact = {r["vec_id"] for r in cosine_topk(emb, q, k=10).collect()}
    got = {r["vec_id"] for r in ann_ivf_topk(emb, q, cents, k=10, nprobe=2).collect()}
    assert len(got & exact) >= 7


def test_ivf_cells_prune_as_lake_partitions(spark, emb, tmp_path):
    """The IVF scale path: persist assignments partitionBy(ivf_cell), and
    a 2-cell probe reads ONLY those partitions (partition pruning visible
    in the actual input files)."""
    from embulk_spark.operators.ann import ann_ivf_topk, cosine_topk, ivf_assign

    cents = [_vec(i) for i in range(8)]
    path = str(tmp_path / "ivf")
    ivf_assign(emb, cents).write.partitionBy("ivf_cell").parquet(path)
    persisted = spark.read.parquet(path)

    q = _vec(123)
    probed = persisted.filter(F.col("ivf_cell").isin([0, 3]))
    # pruning happens at physical planning: the scan must carry a
    # PartitionFilter on ivf_cell (inputFiles() reports pre-pruning files)
    plan = probed._sc._jvm.PythonSQLUtils.explainString(
        probed._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan and "ivf_cell" in plan.split(
        "PartitionFilters", 1
    )[1].splitlines()[0]

    # end-to-end: top-k over the persisted table == recomputed assignment
    want = [
        (r["vec_id"], r["cos_sim"])
        for r in ann_ivf_topk(emb, q, cents, k=5, nprobe=8).collect()
    ]
    got = [
        (r["vec_id"], r["cos_sim"])
        for r in cosine_topk(persisted, q, k=5).collect()
    ]
    assert got == want


def test_auto_planes_compose_with_bands(spark, emb):
    """planes=None + n_bands must never raise on awkward corpus sizes:
    the auto count rounds UP to a multiple of n_bands."""
    out = embedding_near_dups(
        emb, None, threshold=THRESH, n_bands=4, target_bucket_rows=37,
        n_rows=5000,  # ceil(log2(5000/37)) = 8... force an odd count too
    )
    assert out.columns == ["id_a", "id_b", "cos_sim"]
    out2 = embedding_near_dups(
        emb, None, threshold=THRESH, n_bands=3, target_bucket_rows=100,
        n_rows=100_000,  # ceil(log2(1000)) = 10 -> rounds up to 12
    )
    assert out2.count() >= 0  # plans and runs, no ValueError
