"""Duplicate-cluster resolution: connected components over near-dup pairs
and canonical-document selection (keep-one fuzzy dedup).

The reference has no graph or cross-record operators at all — Embulk's
filter chain is strictly per-record (reference spi/FilterPlugin.java:15-35,
pages stream through independently); clustering belongs to the
training-data curation surface this engine adds (SURVEY §2.10). The
pipeline is the standard web-scale dedup recipe: MinHash LSH candidate
pairs (operators/dedup.py) → connected components → keep exactly one
canonical document per cluster.

Scale design:

- ``connected_components`` is min-label propagation: every node repeatedly
  adopts the smallest component label among itself and its neighbors. One
  round = one shuffle join (labels ⋈ edges on the node id) + one hash agg
  with map-side partial ``min`` combine; rounds needed = graph diameter.
  Near-dup graphs are dense blobs of mutually-similar documents — their
  diameter is tiny (a full LSH clique converges in one round), so this
  beats alternating large-star/small-star (O(log n) rounds but ~2 shuffles
  per round over skewier intermediate edge sets) on the graphs this
  pipeline actually produces. ``max_iter`` bounds adversarial chain
  graphs; each round ``localCheckpoint``s so the iterative plan's lineage
  stays O(1) instead of growing per round.
- Convergence is detected by counting changed labels — one action per
  round over the (small) label frame, never over the edge set.
- ``keep_canonical`` picks the winner per component with a
  ``max_by(id, struct(prefer…, id))`` hash agg — no window sort, map-side
  combine, the same shape as merge.dedup_latest — then keeps corpus rows
  via one broadcast-able left-semi join on the winner ids. Documents
  outside any pair are their own singleton cluster and always survive.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def symmetrize(pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b") -> DataFrame:
    """(src, dst) edge list with both directions of every pair."""
    fwd = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    rev = pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
    return fwd.union(rev).distinct()


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
    reliable_checkpoint_dir: str | None = None,
) -> DataFrame:
    """(id, component) for every id appearing in ``pairs``; component is
    the smallest id in the connected component (deterministic labels).

    Raises after ``max_iter`` non-converged rounds rather than returning a
    partial clustering — a silent under-merge would let near-duplicates
    survive keep-one dedup.

    ``reliable_checkpoint_dir``: persist each round's labels as a
    reliable parquet checkpoint and resume label propagation from the
    last completed round on re-invocation over the same pairs (see
    graph.checkpoint_round — min-label propagation restarted from any
    intermediate label state converges to the same fixpoint, so resuming
    mid-propagation is sound; the converged-detection round re-runs
    once, costing one extra join over the small label frame)."""
    from .graph import (
        checkpoint_manifest_gate,
        checkpoint_round,
        edge_fingerprint,
        last_completed_round,
    )

    edges = symmetrize(pairs, id_a, id_b).localCheckpoint(eager=True)
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint(eager=True)
    )
    start = 0
    # max_iter deliberately NOT in the fingerprint: min-label propagation
    # from any intermediate state converges to the same fixpoint, so a
    # prior run's rounds are valid regardless of its cap. Edge content
    # must match exactly (stale-dir resume → wrong components, silently).
    # fingerprint only when a checkpoint dir exists — it is a full
    # count+xxhash64 job over the edges, wasted when the gate would
    # return False unconditionally (round-5 review fix)
    resume_ok = reliable_checkpoint_dir is not None and checkpoint_manifest_gate(
        reliable_checkpoint_dir,
        {
            "kind": "connected_components",
            **edge_fingerprint(edges, "src", "dst"),
        },
    )
    done = (
        last_completed_round(reliable_checkpoint_dir, max_iter)
        if resume_ok
        else None
    )
    if done is not None:
        labels = pairs.sparkSession.read.parquet(
            os.path.join(reliable_checkpoint_dir, f"round={done}")
        ).select("id", "comp")
        # cap at max_iter-1: a prior run that converged exactly at round
        # max_iter leaves round=max_iter checkpointed; resuming with
        # start=max_iter would skip the loop body and raise
        # "did not converge" for a run that in fact converged. Re-running
        # the converged round is idempotent (changed==0 → return).
        start = min(done, max_iter - 1)
    for _round in range(start, max_iter):
        nbr_min = (
            edges.join(labels.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("comp").alias("nbr_comp"))
        )
        stepped = labels.join(nbr_min, "id", "left").select(
            "id",
            F.col("comp").alias("old_comp"),
            F.least("comp", F.coalesce("nbr_comp", "comp")).alias("comp"),
        )
        stepped = checkpoint_round(
            stepped, reliable_checkpoint_dir, _round + 1
        )
        changed = stepped.filter(F.col("comp") < F.col("old_comp")).count()
        labels = stepped.select("id", "comp")
        if changed == 0:
            return labels.select("id", F.col("comp").alias("component"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds — "
        "pathological chain graph; raise max_iter"
    )


def dup_clusters(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    reliable_checkpoint_dir: str | None = None,
) -> DataFrame:
    """(id, component) for every document in a near-dup cluster of ≥2 docs:
    MinHash LSH pairs at ``threshold`` estimated Jaccard, then connected
    components. Docs with no near-dup partner are absent (they are
    singleton clusters by definition)."""
    from .dedup import minhash_near_dups

    pairs = minhash_near_dups(
        df, text_col, id_col, k=k, bands=bands, threshold=threshold
    )
    return connected_components(
        pairs,
        "id_a",
        "id_b",
        reliable_checkpoint_dir=reliable_checkpoint_dir,
    ).withColumnRenamed("id", id_col)


def keep_canonical(
    df: DataFrame,
    components: DataFrame,
    id_col: str,
    prefer: list[str | Column] | None = None,
) -> DataFrame:
    """Keep-one fuzzy dedup: drop every clustered document except the
    canonical winner per component. ``components`` is (id_col, component)
    from :func:`dup_clusters`; ``prefer`` columns (of ``df``) order the
    winner, larger wins, with ``id_col`` as the deterministic final
    tie-break. Rows outside any cluster always survive."""
    prefer_cols = [F.col(c) if isinstance(c, str) else c for c in (prefer or [])]
    clustered = df.join(components, id_col, "inner")
    winners = clustered.groupBy("component").agg(
        F.max_by(
            F.col(id_col), F.struct(*prefer_cols, F.col(id_col))
        ).alias("_keep")
    )
    # losers come from the (small) components frame, not a second pass
    # over the full-width corpus join
    losers = components.join(
        winners.select(F.col("_keep").alias(id_col)), id_col, "left_anti"
    ).select(id_col)
    return df.join(losers, id_col, "left_anti")
