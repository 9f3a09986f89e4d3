"""Merkle range-digest anti-entropy — replica divergence detection.

A lake table replicated to another region/cluster (streaming/lake
replication, `cdc_replicate`) needs periodic verification that the
replicas still agree WITHOUT shipping rows: the Cassandra/DynamoDB
anti-entropy idea. Each replica computes a fixed-shape digest tree
over its key space (leaves = hash buckets of keys, parents = XOR of
children); trees compare top-down, descending only into mismatched
subtrees, so agreement costs O(fanout) digest rows per level and a
divergent replica is localized to leaf buckets holding ~N/fanout^levels
keys each — repair then re-ships only those ranges. The reference has
no replication verifier (its unit of trust is the per-task commit,
reference exec/BulkLoader.java:512-582); this extends the lake's
replication surface with the missing audit half.

Digest algebra: row digest = 60-bit md5 prefix of the salted
``key|values`` rendering; node digest = bit-XOR of row digests below
it. XOR is commutative/associative ⇒ digests are order- and
partitioning-independent, parents fold from children without touching
rows again, and the whole tree costs ONE corpus shuffle (the leaf
groupBy, map-side combinable) + rollups over ≤ fanout^levels rows.
A count rides along every node: XOR alone cannot see a row present
twice vs absent twice (x⊕x=0) — digest+count together can.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def row_digest(key: Column, vals: Column, salt: str = "mrk1") -> Column:
    """60-bit content digest of one row: md5 prefix of
    ``salt:key|vals``, hex-parsed (the engine-portable bigint form)."""
    return F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt + ":"), key, F.lit("|"), vals)), 1, 15
        ),
        16,
        10,
    ).cast("long")


def leaf_digests(
    df: DataFrame,
    key_col: str,
    value_cols: list[str],
    *,
    levels: int = 3,
    fanout: int = 16,
    salt: str = "mrk1",
) -> DataFrame:
    """(leaf, digest, n_rows) over ``fanout^levels`` key-hash buckets —
    the one corpus-wide pass; every tree level folds from this."""
    n_leaves = fanout**levels
    key = F.col(key_col).cast("string")
    vals = F.concat_ws("\x01", *[F.col(c).cast("string") for c in value_cols])
    leaf = (
        F.conv(F.substring(F.md5(F.concat(F.lit("mrkb:"), key)), 1, 15), 16, 10)
        .cast("long") % n_leaves
    )
    return (
        df.select(
            leaf.alias("leaf"), row_digest(key, vals, salt).alias("d")
        )
        .groupBy("leaf")
        .agg(
            F.bit_xor("d").alias("digest"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def replica_diff(
    a: DataFrame,
    b: DataFrame,
    key_col: str,
    value_cols: list[str],
    *,
    levels: int = 3,
    fanout: int = 16,
    salt: str = "mrk1",
) -> DataFrame:
    """Divergent LEAF buckets between two replicas: (leaf, n_a, n_b,
    digest_a, digest_b) — absent side reports 0 rows / digest 0 (the
    XOR identity). The comparison walks the trees top-down, semi-join
    pruning each level by its divergent parents, so matching subtrees
    are never expanded below the level that proved them equal."""
    la = leaf_digests(
        a, key_col, value_cols, levels=levels, fanout=fanout, salt=salt
    ).localCheckpoint(eager=True)
    lb = leaf_digests(
        b, key_col, value_cols, levels=levels, fanout=fanout, salt=salt
    ).localCheckpoint(eager=True)

    def at_level(leaves: DataFrame, level: int) -> DataFrame:
        span = fanout ** (levels - level)
        # floor-div, NOT a double cast: DuckDB's double→bigint cast
        # ROUNDS while Spark's truncates — floor() is exact in both
        return (
            leaves.groupBy(F.floor(F.col("leaf") / span).alias("node"))
            .agg(
                F.bit_xor("digest").alias("digest"),
                F.sum("n_rows").alias("n_rows"),
            )
        )

    bad_parents: DataFrame | None = None
    for level in range(1, levels + 1):
        fa, fb = at_level(la, level), at_level(lb, level)
        j = (
            fa.alias("a")
            .join(fb.alias("b"), "node", "full_outer")
            .select(
                "node",
                F.coalesce(F.col("a.n_rows"), F.lit(0)).alias("n_a"),
                F.coalesce(F.col("b.n_rows"), F.lit(0)).alias("n_b"),
                F.coalesce(F.col("a.digest"), F.lit(0)).alias("digest_a"),
                F.coalesce(F.col("b.digest"), F.lit(0)).alias("digest_b"),
            )
            .filter(
                (F.col("digest_a") != F.col("digest_b"))
                | (F.col("n_a") != F.col("n_b"))
            )
        )
        if bad_parents is not None:
            j = j.join(
                bad_parents.select(
                    F.col("node").alias("_p")
                ),
                F.floor(F.col("node") / fanout) == F.col("_p"),
                "left_semi",
            )
        if level == levels:
            return j.withColumnRenamed("node", "leaf")
        bad_parents = j.select("node").localCheckpoint(eager=True)
    # levels == 0: degenerate single-node tree — diff the whole table
    raise ValueError("levels must be >= 1")
