"""Similarity search over embedding columns: brute-force cosine top-k
(the exactness baseline) and a hyperplane-LSH bucketed variant (the scale
path).

Dot products are pure Column expressions (``zip_with`` + ``aggregate`` —
JVM-side, codegen'd); no UDF in the hot path. At 100 TB the LSH variant's
bucket equi-join turns an O(N) scan per query into an O(N/2^bits) probe,
and the bucket assignment is a narrow map — no shuffle until the
candidate join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _as_double_array(c: Column) -> Column:
    return c.cast("array<double>")


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Brute-force exact top-k by cosine similarity to a literal query
    vector. One narrow scan + a global top-k (TakeOrderedAndProject —
    per-partition heap then driver merge; no full sort)."""
    q = F.lit([float(x) for x in query_vec]).cast("array<double>")
    emb = _as_double_array(F.col(vec_col))
    return (
        df.select(
            F.col(id_col),
            F.round(cosine(emb, q), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def hyperplane_buckets(
    df: DataFrame,
    planes: list[list[float]],
    *,
    vec_col: str = "embedding",
) -> DataFrame:
    """Sign-bit bucket id from dots with fixed hyperplanes: bucket =
    Σ 2^i · [dot(v, plane_i) > 0]. Deterministic given the planes."""
    emb = _as_double_array(F.col(vec_col))
    bucket = F.lit(0)
    for i, p in enumerate(planes):
        pc = F.lit([float(x) for x in p]).cast("array<double>")
        bucket = bucket + F.when(dot(emb, pc) > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return df.withColumn("bucket_id", bucket.cast("int"))


def ann_lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    planes: list[list[float]],
    k: int = 10,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: probe only the query's hyperplane bucket, then
    exact cosine within it. Recall grows with fewer planes / multi-probe;
    this is the IVF-style scale path (bucket column is precomputable and
    partition-prunable when persisted)."""
    qb = 0
    for i, p in enumerate(planes):
        if sum(a * b for a, b in zip(query_vec, p)) > 0:
            qb |= 1 << i
    bucketed = hyperplane_buckets(df, planes, vec_col=vec_col)
    return cosine_topk(
        bucketed.filter(F.col("bucket_id") == qb),
        query_vec,
        k,
        vec_col=vec_col,
        id_col=id_col,
    )
