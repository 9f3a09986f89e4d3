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

import json
import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def edge_fingerprint(e: DataFrame, *cols: str) -> dict:
    """Order-independent content fingerprint of a distinct edge list:
    row count + bit-XOR of per-row xxhash64 (no overflow, no sort). One
    cheap agg over an already-checkpointed frame."""
    row = e.agg(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(F.xxhash64(*[F.col(c) for c in cols])).alias("h"),
    ).collect()[0]
    return {"n_edges": int(row["n"]), "edge_hash": int(row["h"] or 0)}


def checkpoint_manifest_gate(ckpt_dir: str | None, fingerprint: dict) -> bool:
    """Resume guard for reliable round checkpoints: ``round=K`` dirs are
    only trustworthy for the SAME job (same edge list, same per-round
    params). Without this, reusing a checkpoint dir across a different
    input silently resumes from stale label/rank state and returns wrong
    results with no error.

    Returns True when a ``_MANIFEST.json`` matching ``fingerprint``
    exists (resume allowed). Otherwise clears any stale ``round=`` dirs
    (they belong to a different job), pins the new fingerprint, and
    returns False (start fresh).

    Ownership contract: a checkpoint dir has a SINGLE WRITER — one
    iterative job at a time (the same rule as a Structured Streaming
    checkpointLocation). Two concurrent jobs with different
    fingerprints would race this gate (one rmtree-ing round= dirs the
    other is mid-writing); callers must give concurrent jobs distinct
    dirs. The gate guards against stale *sequential* reuse, not
    concurrent sharing."""
    if ckpt_dir is None:
        return False
    mp = os.path.join(ckpt_dir, "_MANIFEST.json")
    if os.path.exists(mp):
        with open(mp) as f:
            if json.load(f) == fingerprint:
                return True
    if os.path.isdir(ckpt_dir):
        for name in os.listdir(ckpt_dir):
            if name.startswith("round="):
                shutil.rmtree(
                    os.path.join(ckpt_dir, name), ignore_errors=True
                )
    os.makedirs(ckpt_dir, exist_ok=True)
    tmp = mp + ".tmp"
    with open(tmp, "w") as f:
        json.dump(fingerprint, f)
    os.replace(tmp, mp)
    return False


def checkpoint_round(
    df: DataFrame, ckpt_dir: str | None, k: int
) -> DataFrame:
    """Truncate iterative lineage after round ``k``: ``localCheckpoint``
    when no dir is given (fast, executor-memory blocks — fine on
    local[*]), else a RELIABLE parquet checkpoint under
    ``ckpt_dir/round=k``. At cluster scale localCheckpoint blocks die
    with their executor and kill the whole iterative job; the reliable
    variant survives executor loss AND lets a restarted driver resume
    from the last completed round (``last_completed_round``) instead of
    replaying rounds 1..k. Completeness = parquet ``_SUCCESS`` marker
    (mode("overwrite") clears a torn previous attempt first)."""
    if ckpt_dir is None:
        return df.localCheckpoint(eager=True)
    path = os.path.join(ckpt_dir, f"round={k}")
    df.write.mode("overwrite").parquet(path)
    return df.sparkSession.read.parquet(path)


def last_completed_round(ckpt_dir: str | None, upto: int) -> int | None:
    """Highest round ≤ ``upto`` with a fully-committed checkpoint in
    ``ckpt_dir`` (``_SUCCESS`` present), or None."""
    if ckpt_dir is None or not os.path.isdir(ckpt_dir):
        return None
    best = None
    for name in os.listdir(ckpt_dir):
        if not name.startswith("round="):
            continue
        try:
            k = int(name.split("=", 1)[1])
        except ValueError:
            continue
        if k <= upto and os.path.exists(
            os.path.join(ckpt_dir, name, "_SUCCESS")
        ):
            best = k if best is None else max(best, k)
    return best


def hits(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    iters: int = 5,
    reliable_checkpoint_dir: str | None = None,
) -> DataFrame:
    """(node, hub, auth) after ``iters`` rounds of Kleinberg's HITS
    over the distinct directed edge list — the complement to
    :func:`pagerank` for web-corpus curation (hubs = link pages /
    directories, authorities = canonical content; a quality prior that
    separates the two roles PageRank blends).

    Fixed iteration count (deterministic, oracle-friendly), L2
    normalization after each half-step — the textbook formulation:

        hub₀(v)  = 1
        authᵢ(v) = Σ_{u→v} hubᵢ₋₁(u)    then auth ← auth / ‖auth‖₂
        hubᵢ(v)  = Σ_{v→u} authᵢ(u)     then hub ← hub / ‖hub‖₂

    Nodes with no in-edges have auth 0; no out-edges → hub 0.

    Scale shape per round: exactly two shuffle joins of the per-node
    frame against the hash-partitioned edge list (one on src, one on
    dst) + two partial-sum hash aggs; each L2 norm is a 1-row aggregate
    that re-enters via broadcast (never a driver collect). Lineage is
    truncated per round like pagerank, and the same
    ``reliable_checkpoint_dir`` manifest gate + ``round=K`` layout give
    restart-level resume for long runs (the per-round state frame is
    (node, hub, auth))."""
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

    start = 0
    state = nodes.select(
        "node", F.lit(1.0).alias("hub"), F.lit(0.0).alias("auth")
    )
    resume_ok = reliable_checkpoint_dir is not None and checkpoint_manifest_gate(
        reliable_checkpoint_dir,
        {"kind": "hits", **edge_fingerprint(e, "src", "dst")},
    )
    done = (
        last_completed_round(reliable_checkpoint_dir, iters)
        if resume_ok
        else None
    )
    if done is not None:
        spark = edges.sparkSession
        state = spark.read.parquet(
            os.path.join(reliable_checkpoint_dir, f"round={done}")
        )
        if done == iters:
            return state
        start = done
    for _round in range(start, iters):
        auth_raw = (
            state.select("node", "hub")
            .join(e, state["node"] == e["src"])
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("hub").alias("x"))
        )
        anorm = auth_raw.agg(
            F.coalesce(F.sqrt(F.sum(F.col("x") * F.col("x"))), F.lit(0.0))
            .alias("nrm")
        )
        auth = (
            nodes.join(auth_raw, "node", "left")
            .crossJoin(F.broadcast(anorm))
            .select(
                "node",
                F.when(F.col("nrm") > 0.0, F.coalesce(F.col("x"), F.lit(0.0)) / F.col("nrm"))
                .otherwise(F.lit(0.0))
                .alias("auth"),
            )
            # auth feeds BOTH the hub update and the round's output
            # state — materialize the half-step once instead of
            # re-running its edge join per consumer
            .localCheckpoint(eager=True)
        )
        hub_raw = (
            auth.join(e, auth["node"] == e["dst"])
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("auth").alias("x"))
        )
        hnorm = hub_raw.agg(
            F.coalesce(F.sqrt(F.sum(F.col("x") * F.col("x"))), F.lit(0.0))
            .alias("nrm")
        )
        state = (
            nodes.join(hub_raw, "node", "left")
            .join(auth, "node")
            .crossJoin(F.broadcast(hnorm))
            .select(
                "node",
                F.when(F.col("nrm") > 0.0, F.coalesce(F.col("x"), F.lit(0.0)) / F.col("nrm"))
                .otherwise(F.lit(0.0))
                .alias("hub"),
                "auth",
            )
        )
        state = checkpoint_round(state, reliable_checkpoint_dir, _round + 1)
    return state


def pagerank(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    iters: int = 5,
    damping: float = 0.85,
    reliable_checkpoint_dir: str | None = None,
) -> DataFrame:
    """(node, rank) after ``iters`` damped PageRank rounds over the
    distinct directed edge list ``edges``.

    Nodes = every id appearing as src or dst. Dangling nodes (no
    out-edges) redistribute their rank uniformly each round, so total
    rank stays 1.

    ``reliable_checkpoint_dir``: persist each round's ranks as a
    reliable parquet checkpoint and RESUME from the last completed
    round on a re-invocation over the same edge list — restart-level
    durability for long iterative jobs where ``localCheckpoint``'s
    executor-memory blocks would restart the job from round 0 on any
    executor loss. The edge/degree frames are recomputed on resume
    (one cheap pass); round state is what's expensive to lose.
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

    start = 0
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    # iters is deliberately NOT in the fingerprint: each round's math is
    # independent of the total, so a prior run's rounds are a valid
    # prefix for any iters. Edge content + damping must match exactly.
    # fingerprint only when a checkpoint dir exists — it is a full
    # count+xxhash64 job over the edges, wasted when the gate would
    # return False unconditionally (round-5 review fix)
    resume_ok = reliable_checkpoint_dir is not None and checkpoint_manifest_gate(
        reliable_checkpoint_dir,
        {
            "kind": "pagerank",
            "n_nodes": n,
            "damping": damping,
            **edge_fingerprint(e, "src", "dst"),
        },
    )
    done = (
        last_completed_round(reliable_checkpoint_dir, iters)
        if resume_ok
        else None
    )
    if done is not None:
        spark = edges.sparkSession
        ranks = spark.read.parquet(
            os.path.join(reliable_checkpoint_dir, f"round={done}")
        )
        if done == iters:
            return ranks
        start = done
    for _round in range(start, iters):
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
        )
        ranks = checkpoint_round(
            ranks, reliable_checkpoint_dir, _round + 1
        )
    return ranks
