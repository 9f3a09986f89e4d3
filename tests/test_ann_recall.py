"""Measured recall evidence for the approximate ANN paths (VERDICT r2
item 10): recall@k of ann_lsh_topk / ann_ivf_topk against the exact
cosine_topk ground truth, at TWO corpus sizes, using the default knobs
(auto_plane_count target bucket, nprobe=2). Gate: mean recall ≥ 0.9.

Fixture: clustered unit-norm embeddings — the realistic shape for text/
image encoders (random isotropic data has no recoverable neighbor
structure for ANY bucketed index; what matters at 100 TB is that the
default knobs keep clustered neighbors co-bucketed). Deterministic
numpy seed; queries are perturbed cluster members.

Measured numbers are recorded in DESIGN_SCALE.md §ANN.
"""

from __future__ import annotations

import numpy as np
import pytest

from embulk_spark.operators.ann import (
    ann_ivf_topk,
    ann_lsh_topk,
    auto_plane_count,
    cosine_topk,
    deterministic_planes,
)

DIM = 16
N_CLUSTERS = 8
K = 10
N_QUERIES = 6


def _corpus(n: int, seed: int = 42):
    rng = np.random.RandomState(seed)
    centers = rng.randn(N_CLUSTERS, DIM)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = rng.randint(0, N_CLUSTERS, size=n)
    vecs = centers[assign] + 0.05 * rng.randn(n, DIM)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    queries = []
    for qi in range(N_QUERIES):
        base = vecs[qi * (n // N_QUERIES)]
        q = base + 0.02 * rng.randn(DIM)
        queries.append((q / np.linalg.norm(q)).tolist())
    return vecs, centers, queries


def _df(spark, vecs):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


def _recall(approx_ids, exact_ids):
    return len(set(approx_ids) & set(exact_ids)) / len(exact_ids)


@pytest.mark.parametrize("n", [1500, 6000])
def test_recall_at_default_knobs(spark, n):
    vecs, centers, queries = _corpus(n)
    df = _df(spark, vecs).cache()
    try:
        planes = deterministic_planes(auto_plane_count(n), DIM)
        centroids = [c.tolist() for c in centers]
        lsh_recalls, ivf_recalls = [], []
        for q in queries:
            exact = [r["vec_id"] for r in cosine_topk(df, q, K).collect()]
            lsh = [
                r["vec_id"] for r in ann_lsh_topk(df, q, planes, K).collect()
            ]
            ivf = [
                r["vec_id"]
                for r in ann_ivf_topk(df, q, centroids, K, nprobe=2).collect()
            ]
            lsh_recalls.append(_recall(lsh, exact))
            ivf_recalls.append(_recall(ivf, exact))
        lsh_mean = sum(lsh_recalls) / len(lsh_recalls)
        ivf_mean = sum(ivf_recalls) / len(ivf_recalls)
        print(
            f"\nANN recall@{K} n={n}: lsh={lsh_mean:.3f} "
            f"(min {min(lsh_recalls):.2f}) ivf={ivf_mean:.3f} "
            f"(min {min(ivf_recalls):.2f}) planes={len(planes)}"
        )
        assert lsh_mean >= 0.9, f"LSH recall {lsh_mean} < 0.9 at n={n}"
        assert ivf_mean >= 0.9, f"IVF recall {ivf_mean} < 0.9 at n={n}"
    finally:
        df.unpersist()
