"""Interval (range) join via bin bucketing — point-in-interval matching
without a cross join.

The missing relational shape between equi-join and as-of join
(operators/asof.py): attribute each point event to EVERY interval that
contains it — maintenance windows, crawl campaigns, outage spans, SCD
validity ranges with overlaps. Spark's optimizer turns a bare
``p.ts BETWEEN i.lo AND i.hi`` join into BroadcastNestedLoopJoin (fine
only while intervals broadcast) or, worse, a cartesian product; at
10^10 points neither survives.

Bin bucketing makes it an EQUI-join: quantize time into fixed-width
bins, explode each interval to the bins it overlaps (a JVM
``sequence``, fan-out = ceil(len/bin_width)+1 rows per interval), take
the point's single bin, and hash-join on (bin [, keys]) with the exact
``lo <= t < hi`` predicate as a post-filter. Each qualifying pair meets
in EXACTLY one bin — the point's — so no dedup pass is needed. Shuffle
is one exchange on the bin key; skew follows point density per bin,
which ``bin_width`` controls directly (pick ≈ the typical interval
length: fan-out stays O(1) while bins stay fine enough to prune).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: float,
    keys: list[str] | None = None,
    broadcast_intervals: bool = False,
) -> DataFrame:
    """Rows of ``points`` × matching ``intervals`` where
    ``lo <= point < hi`` (half-open, the convention that makes adjacent
    windows partition time without double-counting).

    ``point_col``/``lo_col``/``hi_col`` must be numeric (cast timestamps
    with ``unix_micros``/``unix_timestamp`` first — explicit at the call
    site so the bin width's unit is never ambiguous). ``keys``: optional
    extra equality columns (present in both sides). Column name
    collisions besides ``keys`` are the caller's to resolve.

    ``broadcast_intervals``: when the interval side is dimension-sized,
    broadcast the exploded bins and skip the shuffle entirely — the
    planner gets BroadcastHashJoin on the bin key instead of the
    BroadcastNestedLoopJoin a raw range predicate would force."""
    keys = keys or []
    pb = points.withColumn(
        "_bin", F.floor(F.col(point_col) / F.lit(float(bin_width))).cast("long")
    )
    ib = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(float(bin_width))).cast("long"),
                # hi is exclusive, but a point in hi's bin can still be
                # < hi; ceil-1 would drop zero-length tails — keep it
                F.floor(F.col(hi_col) / F.lit(float(bin_width))).cast("long"),
            )
        ),
    )
    if broadcast_intervals:
        ib = F.broadcast(ib)
    joined = pb.join(ib, ["_bin", *keys], "inner").filter(
        (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col))
    )
    return joined.drop("_bin")
