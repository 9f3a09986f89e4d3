"""Semantic deduplication over embeddings (SemDeDup-style).

K-means the embedding space with a fixed, deterministic Lloyd recipe,
then inside each cluster drop members whose cosine to the cluster's
canonical document exceeds a threshold (Abbas et al. 2023, "SemDeDup:
Data-efficient learning at web-scale through semantic deduplication" —
the k-means-then-intra-cluster-cosine structure; canonical = lowest id
rather than "lowest similarity to centroid" to keep the keep-set
deterministic and oracle-checkable).

No reference analogue (corpus-curation extension per SURVEY §2.10); the
ANN toolbox this builds on is operators/ann.py.

Scale shape: every Lloyd iteration is one narrow argmax-assignment map
(pure Column structs — whole-stage codegen, no shuffle, identical to
ann.ivf_assign) plus ONE hash-aggregate of d running means per cluster
(partial map-side combine; k·d doubles cross the wire). The centroid
table (k·d) is driver-held between iterations exactly like ann_ivf's —
tiny by construction. The dedup pass broadcasts the k canonical vectors
and never self-joins: cost is one scan, not Σ cluster². Fixed iteration
count keeps the whole fit a bounded, resumable number of Spark jobs —
convergence-loop variants belong in the caller.

Determinism: init = the k lowest-id vectors; centroids rounded to 9
decimals each iteration so cross-engine float summation order (Spark
partial aggs vs the oracle's single-threaded avg) cannot flip an argmax;
ties break to the lowest cluster id. The DuckDB oracle unrolls the same
iterations symbolically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .ann import _as_double_array, dot, norm

#: (cluster_id, centroid_vector) — ids are stable across iterations even
#: if a cluster empties out (an empty cluster is dropped, never renumbered)
Centroids = list[tuple[int, list[float]]]


def assign_clusters(
    df: DataFrame, centroids: Centroids, *, vec_col: str = "embedding"
) -> DataFrame:
    """``cluster`` = argmax over centroids of the norm-scaled dot
    ``dot(v, c)/|c|`` (argmax-cosine for |v| > 0; ties → lowest cluster
    id). Same plan shape as ann.ivf_assign but with explicit, stable
    cluster ids: one array of (score, -id) structs, array_max picks the
    winner — a narrow codegen'd map, no shuffle."""
    import math

    emb = _as_double_array(F.col(vec_col))
    scored = F.array(
        *[
            F.struct(
                (
                    dot(emb, F.lit([float(x) for x in c]).cast("array<double>"))
                    / F.lit(math.sqrt(sum(x * x for x in c)) or 1.0)
                ).alias("s"),
                F.lit(-cid).alias("nid"),
            )
            for cid, c in centroids
        ]
    )
    return df.withColumn(
        "cluster", (-F.array_max(scored).getField("nid")).cast("int")
    )


def kmeans_fit(
    df: DataFrame,
    k: int,
    n_iter: int = 2,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> Centroids:
    """Deterministic fixed-iteration Lloyd fit; returns the centroid
    table (k·d doubles — driver-held by design, like ann_ivf's).

    Init: the ``k`` lowest-``id_col`` vectors (cluster i = i-th lowest).
    Each iteration: assign (narrow map), then per-cluster element-wise
    mean via ONE hash agg of d ``avg`` columns, rounded to 9 decimals
    (see module docstring). Clusters that receive no member are dropped,
    keeping their ids stable for the survivors."""
    head = df.select(vec_col).head()
    dim = len(head[0]) if head else 0
    init_rows = (
        df.select(id_col, _as_double_array(F.col(vec_col)).alias("v"))
        .orderBy(id_col)
        .limit(k)
        .collect()
    )
    centroids: Centroids = [(i, list(r["v"])) for i, r in enumerate(init_rows)]
    for _ in range(n_iter):
        assigned = assign_clusters(df, centroids, vec_col=vec_col)
        emb = _as_double_array(F.col(vec_col))
        rows = (
            assigned.groupBy("cluster")
            .agg(
                *[
                    F.round(F.avg(F.element_at(emb, i + 1)), 9).alias(f"c{i}")
                    for i in range(dim)
                ]
            )
            .collect()
        )
        centroids = sorted(
            (int(r["cluster"]), [r[f"c{i}"] for i in range(dim)]) for r in rows
        )
    return centroids


def semantic_dedup(
    df: DataFrame,
    centroids: Centroids,
    threshold: float = 0.95,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-row cluster assignment + keep/drop verdict.

    Canonical member of a cluster = its lowest ``id_col``. A row is kept
    iff it IS the canonical or its cosine to the canonical is below
    ``threshold``. Returns (id, cluster, canon_id, cos_canon, keep) so
    callers can either filter ``keep`` or audit the drop set.

    The canonical table is k rows — built with one min-agg + one
    broadcast semi-lookup, then broadcast into a map-side join; the
    corpus is scanned once and never shuffled."""
    assigned = assign_clusters(df, centroids, vec_col=vec_col).select(
        F.col(id_col).alias("id"),
        _as_double_array(F.col(vec_col)).alias("v"),
        "cluster",
    )
    # Rename the cluster key on every derived frame so joining them back
    # onto `assigned` is never an ambiguous self-join in Spark's analyzer
    # (canon_ids and canon both share `assigned`'s lineage).
    canon_ids = (
        assigned.groupBy("cluster")
        .agg(F.min("id").alias("canon_id"))
        .withColumnRenamed("cluster", "canon_cluster")
    )
    canon = (
        assigned.alias("m")
        .join(
            F.broadcast(canon_ids),
            F.col("m.id") == canon_ids["canon_id"],
        )
        .select(
            F.col("canon_id"),
            F.col("m.v").alias("canon_v"),
            F.col("canon_cluster"),
        )
    )
    joined = assigned.alias("a").join(
        F.broadcast(canon.alias("c")),
        F.col("a.cluster") == F.col("c.canon_cluster"),
    )
    cos = F.round(
        dot(F.col("a.v"), F.col("c.canon_v"))
        / (norm(F.col("a.v")) * norm(F.col("c.canon_v"))),
        6,
    )
    return joined.select(
        F.col("a.id").alias(id_col),
        F.col("a.cluster").alias("cluster"),
        F.col("c.canon_id").alias("canon_id"),
        cos.alias("cos_canon"),
        (
            (F.col("a.id") == F.col("c.canon_id"))
            | (cos < F.lit(float(threshold)))
        ).alias("keep"),
    )
