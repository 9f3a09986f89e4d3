"""Link-graph centrality: fixed-iteration PageRank as pure DataFrame ops.

Web-corpus curation ranks pages/hosts by link centrality (Common Crawl
publishes exactly this as its host-level ranking); a training-data
pipeline uses the rank as a quality prior when sampling. The reference
has no graph operators (Embulk's chain is strictly per-record,
reference spi/FilterPlugin.java:15-35); this joins connected-components
(operators/cluster.py) on the iterative-algorithm surface.

Semantics — standard damped PageRank with uniform dangling-mass
redistribution, a FIXED iteration count (deterministic, oracle-friendly;
convergence-threshold stopping would make the result depend on float
noise):

    rank₀(v)   = 1/N
    rankᵢ₊₁(v) = (1-d)/N + d·( Σ_{u→v} rankᵢ(u)/outdeg(u) + Dᵢ/N )

where ``Dᵢ`` is the total rank of dangling nodes (no out-edges).

Scale shape per iteration: one shuffle join (ranks ⋈ edges on src — the
edge list is the big side and is hash-partitioned once, ranks are the
small per-node frame) + one hash agg with map-side partial sum, exactly
the connected-components round shape. The dangling mass is a 1-row
aggregate that re-enters via broadcast — never a driver ``collect``.
``localCheckpoint`` per round truncates the iterative lineage so round k
does not replan rounds 1..k-1. Rounds are a constant (default 5), so the
whole job is O(iters) shuffles of the edge list regardless of N.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    iters: int = 5,
    damping: float = 0.85,
) -> DataFrame:
    """(node, rank) after ``iters`` damped PageRank rounds over the
    distinct directed edge list ``edges``.

    Nodes = every id appearing as src or dst. Dangling nodes (no
    out-edges) redistribute their rank uniformly each round, so total
    rank stays 1.
    """
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    deg = (
        e.groupBy("src").agg(F.count(F.lit(1)).cast("double").alias("od"))
        .localCheckpoint(eager=True)
    )

    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iters):
        with_deg = ranks.join(deg, ranks["node"] == deg["src"], "left")
        # contributions along edges from non-dangling nodes
        contrib = (
            with_deg.filter(F.col("od").isNotNull())
            .select("node", (F.col("rank") / F.col("od")).alias("share"))
            .join(e, F.col("node") == e["src"])
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("share").alias("inflow"))
        )
        # total dangling rank: 1-row frame, re-enters via broadcast
        dangling = (
            with_deg.filter(F.col("od").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dmass"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("inflow"), F.lit(0.0))
                        + F.col("dmass") / F.lit(float(n))
                    )
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks
