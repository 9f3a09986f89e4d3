"""Change-set deduplication and MERGE (upsert/delete) application.

Embulk has no joins or aggregations (its filters are per-page streaming
wrappers, reference spi/util/FiltersInternal.java:46-56); the north rule
adds exactly one join shape — MERGE INTO of a deduped change-set against
the target keyed by ``url`` — and one aggregation — latest-event-per-key.
Both are implemented scale-first:

- ``dedup_latest``: hash aggregation with ``max_by(struct(payload),
  struct(order))`` instead of a window sort. A hash agg gets map-side
  partial combine, so a hot key (one url updated millions of times in a
  batch) is reduced locally on every input partition before the shuffle —
  the Spark-native generalization of the reference's ScatterExecutor
  round-robin fan-out (exec/LocalExecutorPlugin.java:58-70,444-454), and
  the reason no per-key salting is required for the agg itself.
- ``merge_upsert``: full-outer join target-vs-changes on url; the winner is
  whichever side has the larger (warc_ts, seq) — so late-arriving older
  updates lose against an applied delete (tombstone), satisfying
  "a delete stays deleted". Exact duplicate deliveries carry identical
  (warc_ts, seq) and merge to a no-op.

Deletes are retained as tombstones (is_deleted=true) so ordering survives
across epochs; the published view filters them out.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Target-table column order (north-rule input_hint shape + CDC bookkeeping).
TARGET_COLUMNS = ["url", "warc_ts", "seq", "html", "text", "lang", "is_deleted"]

ORDER_COLS = ("warc_ts", "seq")


def bucket_of(url: Column, n_buckets: int) -> Column:
    """Stable key→bucket assignment (hash-bucketed table layout, the
    partition-pruning handle for MERGE at scale)."""
    return F.pmod(F.xxhash64(url), F.lit(n_buckets)).cast("int")


def salted_repartition(
    df: DataFrame, n_partitions: int, key: str = "bucket", spread: int = 8
) -> DataFrame:
    """Repartition by (key, salt) so a hot key's rows spread over ``spread``
    tasks — defuses hot-domain skew in write/shuffle stages. Analogue of the
    reference's scatter round-robin (exec/LocalExecutorPlugin.java:444-454),
    but key-affine instead of global round-robin."""
    salt = F.pmod(F.xxhash64(F.col("url"), F.lit(7)), F.lit(spread))
    return df.repartition(n_partitions, F.col(key), salt)


def dedup_latest(
    batch: DataFrame,
    key: str = "url",
    order=ORDER_COLS,
    extra_aggs: dict[str, Column] | None = None,
) -> DataFrame:
    """Latest event per key by (warc_ts, seq); exact duplicates collapse.

    An aggregate with MAP-SIDE PARTIAL COMBINE (partial_max_by) —
    deliberately NOT a window: Window.partitionBy(url) would shuffle every
    event and sort every partition, while the agg ships one winner per
    (url, map-partition) across the wire, which at 10^10 events is the
    difference between a reduce and a full re-shuffle of the stream.
    Physically Spark picks SortAggregate (max_by's struct buffer is not
    hash-agg eligible); that sort is per-map-partition, spillable, and on
    the dedup key only — see tools/explain_plans.py for the asserted plan.

    ``extra_aggs`` lets callers piggyback metrics (e.g. per-key event
    counts) on the same shuffle instead of paying a second pass."""
    payload = [c for c in batch.columns if c != key]
    aggs = [
        F.max_by(F.struct(*payload), F.struct(*[F.col(c) for c in order])).alias("_r")
    ] + [expr.alias(name) for name, expr in (extra_aggs or {}).items()]
    return batch.groupBy(key).agg(*aggs).select(
        key, "_r.*", *(extra_aggs or {})
    )


def patch_latest_per_key(
    batch: DataFrame,
    key: str = "url",
    order=ORDER_COLS,
    payload: list[str] | None = None,
    op_col: str = "op",
) -> DataFrame:
    """Column-level CDC patch merge for MINIMAL row images.

    Sources like MySQL binlog_row_image=minimal / Debezium's partial
    updates ship only the columns an UPDATE touched; untouched columns
    arrive NULL. ``dedup_latest``'s whole-row newer-wins would null them
    out, so this resolves each payload column INDEPENDENTLY: the final
    value of column c for a key is the value of the latest 'U' event
    that set c (non-null), unless a later 'D' wiped the row — a delete
    resets every column, and only patches after it rebuild the row.
    Keys whose last 'U' precedes the last 'D' come back with
    ``is_deleted=true`` and all payload NULL (the tombstone convention
    shared with merge_upsert).

    ONE hash aggregation with map-side partial combine — per key and
    column only the latest setter crosses the shuffle, never the event
    stream (the same scale argument as dedup_latest: no window, no
    per-key sort of history). Per column the agg is
    ``max(when(set, struct(order, value)))`` — the arg-max-via-struct
    idiom — plus two order-only maxes for the delete fence; the
    delete-fence comparison happens post-agg on the one reduced row.
    Exact duplicate deliveries carry identical (order, value) and
    collapse; ``order`` ties between distinct values resolve by value
    (document ties away by making ``order`` unique, as the lake's
    (warc_ts, seq) is).

    Limitations (inherent to minimal images, same as Debezium's): a
    true SET col = NULL is indistinguishable from "not updated" —
    upstreams that need it must send a sentinel or full row images.
    ``op_col`` values must be 'U' (upsert/patch) or 'D' (delete).
    """
    from pyspark.sql import types as T

    def _orderable(dt: T.DataType) -> bool:
        # mirrors Catalyst's RowOrdering.isOrderable: maps never are,
        # containers are orderable iff their elements are
        if isinstance(dt, T.MapType):
            return False
        if isinstance(dt, T.ArrayType):
            return _orderable(dt.elementType)
        if isinstance(dt, T.StructType):
            return all(_orderable(f.dataType) for f in dt.fields)
        return True

    ord_s = F.struct(*[F.col(c) for c in order])
    if payload is None:
        # auto-detect: only orderable columns (the arg-max is max(struct),
        # which Catalyst rejects for e.g. map columns)
        payload = [
            c
            for c in batch.columns
            if c not in {key, op_col, *order}
            and _orderable(batch.schema[c].dataType)
        ]
    else:
        bad = [
            c for c in payload if not _orderable(batch.schema[c].dataType)
        ]
        if bad:
            raise ValueError(
                f"patch_latest_per_key payload columns {bad} have"
                " non-orderable types (e.g. map) — max(struct(order,"
                " value)) can't aggregate them; serialize to_json first"
            )
    is_u = F.col(op_col) != "D"
    aggs = [
        F.max(F.when(~is_u, ord_s)).alias("_d"),
        F.max(F.when(is_u, ord_s)).alias("_u"),
        F.max(ord_s).alias("_last"),
    ] + [
        F.max(
            F.when(
                is_u & F.col(c).isNotNull(),
                F.struct(ord_s.alias("o"), F.col(c).alias("v")),
            )
        ).alias(f"_p_{c}")
        for c in payload
    ]
    g = batch.groupBy(key).agg(*aggs)

    def alive(o: Column) -> Column:
        return F.col("_d").isNull() | (o > F.col("_d"))

    return g.select(
        key,
        *[
            F.when(
                F.col(f"_p_{c}").isNotNull() & alive(F.col(f"_p_{c}.o")),
                F.col(f"_p_{c}.v"),
            ).alias(c)
            for c in payload
        ],
        (
            F.col("_d").isNotNull()
            & (F.col("_u").isNull() | (F.col("_u") < F.col("_d")))
        ).alias("is_deleted"),
        *[F.col(f"_last.{c}").alias(f"last_{c}") for c in order],
    )


def changes_to_target_rows(
    batch_latest: DataFrame, carry: list[str] | None = None
) -> DataFrame:
    """Shape a deduped change-set into target-table rows: deletes become
    tombstones (payload nulled, ordering columns kept). ``carry`` columns
    (e.g. piggybacked metric counts) pass through unchanged. Payload
    columns beyond the core set (schema-evolution adds) are nulled on
    delete like any other payload."""
    is_del = F.col("op") == "D"
    core = {"url", "warc_ts", "seq", "op", "html", "text", "lang", *(carry or [])}
    extra_payload = [c for c in batch_latest.columns if c not in core]
    return batch_latest.select(
        *(carry or []),
        "url",
        "warc_ts",
        "seq",
        F.when(is_del, F.lit(None).cast("binary")).otherwise(F.col("html")).alias("html"),
        F.when(is_del, F.lit(None).cast("string")).otherwise(F.col("text")).alias("text"),
        F.when(is_del, F.lit(None).cast("string")).otherwise(F.col("lang")).alias("lang"),
        *[
            F.when(is_del, F.lit(None)).otherwise(F.col(c)).alias(c)
            for c in extra_payload
        ],
        is_del.alias("is_deleted"),
    )


def merge_upsert(
    target: DataFrame, changes: DataFrame, cols: list[str] | None = None
) -> DataFrame:
    """MERGE INTO semantics: full-outer join on url, larger (warc_ts, seq)
    wins. Both sides must carry ``cols`` (defaults to TARGET_COLUMNS; may be
    an evolved superset — schema evolution normalizes both sides first)."""
    cols = cols or TARGET_COLUMNS
    t = target.select(*cols).alias("t")
    c = changes.select(*cols).alias("c")
    joined = t.join(c, F.col("t.url") == F.col("c.url"), "full_outer")
    take_change = F.col("t.url").isNull() | (
        F.col("c.url").isNotNull()
        & (
            F.struct(F.col("c.warc_ts"), F.col("c.seq"))
            > F.struct(F.col("t.warc_ts"), F.col("t.seq"))
        )
    )
    out_cols = [
        F.when(take_change, F.col(f"c.{col}")).otherwise(F.col(f"t.{col}")).alias(col)
        for col in cols
    ]
    return joined.select(*out_cols)


def published_view(target: DataFrame) -> DataFrame:
    """The user-facing final state: non-deleted rows only."""
    return target.filter(~F.col("is_deleted")).drop("is_deleted")


def snapshot_diff(
    current: DataFrame,
    snapshot: DataFrame,
    *,
    compare: tuple[str, ...] = ("html",),
    missing_as_delete: bool = True,
    delete_ts: str | None = None,
    seq: int = 0,
    current_digest_col: str | None = None,
    assume_unique: bool = False,
) -> DataFrame:
    """CDC from periodic FULL dumps (Debezium/DMS full-load-then-diff,
    Iceberg's changelog-from-snapshots): derive the change events that
    turn ``current`` (the live published state) into ``snapshot`` (a
    fresh full crawl/dump, one row per url after internal dedup by
    (warc_ts, seq)). The source has no binlog — the diff IS the binlog.

    Scale shape: ONE equi-join on url, and the table side ships only
    (url, 64-bit digest) across the shuffle — never its html/text bytes;
    the snapshot's payload crosses once because it is the new data.
    Unchanged urls (digest-equal on ``compare``) emit NOTHING, so an
    epoch over a mostly-unchanged 100 TB crawl costs its join plus an
    O(change-set) write, and re-crawls of unchanged pages don't churn
    row versions. A url live in ``current`` but absent from the
    snapshot becomes a delete event at ``delete_ts`` (must outrank
    every retained row's warc_ts; required when ``missing_as_delete``).
    A url tombstoned in the table but present in the snapshot is NOT in
    ``current`` (published view), so it re-enters as an update —
    resurrection works as long as the crawl ts outranks the tombstone.

    Digest note: xxhash64 over ``compare`` — a changed row silently
    skipped needs a same-key 2^-64 collision; at 10^10 urls per epoch
    that is ~1e-9 expected misses, re-corrected by the next crawl."""
    if missing_as_delete and delete_ts is None:
        raise ValueError(
            "missing_as_delete requires delete_ts (the crawl instant; "
            "must outrank retained rows' warc_ts)"
        )
    snap = snapshot
    if "seq" not in snap.columns:
        snap = snap.withColumn("seq", F.lit(seq).cast("long"))
    if not assume_unique:
        snap = dedup_latest(snap)
    # assume_unique: a full dump is typically already one row per url —
    # skipping the dedup removes the only full-payload shuffle agg on the
    # dump side (the join still shuffles it once; that's the floor). A
    # violated promise degrades safely: duplicate urls each emit an event
    # and merge_epoch's own dedup resolves them by (warc_ts, seq).
    payload = [c for c in snap.columns if c not in ("url",)]
    if any(c not in snap.columns for c in compare):
        raise ValueError(f"compare columns {compare} must exist on the dump")
    s = snap.withColumn(
        "_digest", F.xxhash64(*[F.col(c) for c in compare])
    ).alias("s")
    if current_digest_col is not None:
        # pre-digested live state (ParquetLakeTable.apply_snapshot's fast
        # path: the digest was computed per RAW row below the MOR dedup,
        # so the table's payload bytes never entered an agg buffer)
        t = current.select(
            "url", F.col(current_digest_col).alias("_digest")
        ).alias("t")
    else:
        if any(c not in current.columns for c in compare):
            raise ValueError(
                f"compare columns {compare} must exist on current (or pass "
                "current_digest_col)"
            )
        t = current.select(
            "url", F.xxhash64(*[F.col(c) for c in compare]).alias("_digest")
        ).alias("t")
    joined = s.join(t, F.col("s.url") == F.col("t.url"), "full_outer")
    upsert = F.col("s.url").isNotNull() & (
        F.col("t.url").isNull()
        | (F.col("s._digest") != F.col("t._digest"))
    )
    # the snapshot's own seq rides along (injected 0 when absent): a dump
    # row whose warc_ts TIES the table row's still outranks it when its
    # seq does — without this, ts-granularity collisions would let stale
    # table state survive a content change
    events = joined.filter(upsert).select(
        F.col("s.seq").alias("seq"),
        F.lit("U").alias("op"),
        F.col("s.url").alias("url"),
        *[F.col(f"s.{c}").alias(c) for c in payload if c != "seq"],
    )
    if missing_as_delete:
        deletes = joined.filter(F.col("s.url").isNull()).select(
            F.lit(seq).cast("long").alias("seq"),
            F.lit("D").alias("op"),
            F.col("t.url").alias("url"),
            *[
                (
                    F.to_timestamp(F.lit(delete_ts))
                    if c == "warc_ts"
                    else F.lit(None).cast(snap.schema[c].dataType)
                ).alias(c)
                for c in payload
                if c != "seq"
            ],
        )
        events = events.unionByName(deletes)
    return events
