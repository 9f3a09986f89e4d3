"""Manifest-resident per-file column statistics and the data-skipping
scan planner — Iceberg's ``lower_bounds``/``upper_bounds``/
``null_value_counts`` manifest fields re-expressed for the MOR lake
(the reference has no scan statistics at all; its nearest shape is the
``last_path`` incremental cursor, reference
embulk-core/src/main/java/org/embulk/exec/BulkLoader.java:584-659 —
"metadata recorded at write time decides what the next run reads").

Why bucket-granular pruning is the sound unit under merge-on-read:
newer-wins resolution means a NON-matching row can supersede a matching
one (and, with late data, vice versa), so filtering before the merge is
only correct when every version of every surviving key was read. All
versions of a key live in exactly one hash bucket, hence:

* a bucket can be SKIPPED iff no file covering it could contain a row
  matching the predicate (then no key in it can have a matching latest
  row — the actual predicate still runs post-merge on the kept rows);
* within a kept bucket that has NO pending delta coverage ("clean",
  i.e. fully compacted), base files prune individually: the base holds
  exactly one row per key, so a pruned file cannot hide another version
  of a kept key;
* delta files are never stat-pruned — one covering a kept bucket may
  hold the superseding version of a matching key — they only vote on
  which buckets stay kept.

At 100 TB the hot path is: compaction keeps most buckets clean and
(with ``sort_columns``) range-clusters each bucket's files by the
predicate columns, so a selective scan reads a handful of files; the
recent uncompacted tail contributes its buckets un-pruned, bounded by
the delta size, not the table.

Everything here is JSON-safe and engine-neutral: timestamps are stored
as integer epoch-micros, dates as ISO strings, numerics/strings as-is —
missing stats always degrade to "could match" (a full, correct scan).
"""

from __future__ import annotations

import os
from datetime import date, datetime, timezone

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: predicate operators the planner understands (conjunctions of these);
#: anything richer belongs in the post-merge filter, not the planner.
OPS = ("=", "<", "<=", ">", ">=")


def encode_value(dtype: T.DataType, v):
    """A stat/predicate value in its comparison domain: timestamps →
    epoch micros (naive values are session-UTC, pinned everywhere here),
    dates → ISO strings (lexical == chronological), numerics/strings
    as-is. The SAME encoder runs at collection and at planning time, so
    comparisons never cross domains."""
    if v is None:
        return None
    if isinstance(dtype, T.TimestampType) or isinstance(
        dtype, getattr(T, "TimestampNTZType", ())
    ):
        if isinstance(v, str):
            v = datetime.fromisoformat(v)
        if isinstance(v, datetime):
            if v.tzinfo is None:
                v = v.replace(tzinfo=timezone.utc)
            return int(round(v.timestamp() * 1_000_000))
        return int(v)
    if isinstance(dtype, T.DateType):
        if isinstance(v, (date, datetime)):
            return v.isoformat()[:10]
        return str(v)[:10]
    if isinstance(dtype, (T.StringType,)):
        return str(v)
    if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return int(v)
    if isinstance(dtype, (T.FloatType, T.DoubleType, T.DecimalType)):
        return float(v)
    raise TypeError(f"no stats domain for column type {dtype.simpleString()}")


def statable(dtype: T.DataType) -> bool:
    try:
        encode_value(dtype, None)
    except TypeError:
        return False
    return True


def collect_file_stats(
    spark: SparkSession,
    root: str,
    rel_files: list[str],
    cols: list[str],
    file_schema: T.StructType | None = None,
) -> dict[str, dict]:
    """ONE column-pruned scan of just-written parquet files grouped by
    ``_metadata.file_path`` → per-file row count, bkt range, and
    min/max/null-count per stat column. O(stat-column bytes of the
    files), never a per-file loop of jobs. Returns
    ``{rel_path: {"rows": n, "bkt": [lo, hi],
                  "cols": {name: [min, max, nulls]}}}``."""
    if not rel_files:
        return {}
    reader = spark.read
    if file_schema is not None:
        reader = reader.schema(file_schema)
    df = reader.parquet(*[os.path.join(root, p) for p in rel_files])
    fields = {f.name: f.dataType for f in df.schema.fields}
    want = [c for c in cols if c in fields and statable(fields[c])]
    aggs = [
        F.count(F.lit(1)).alias("_rows"),
        F.min("bkt").alias("_bkt_lo"),
        F.max("bkt").alias("_bkt_hi"),
    ]
    for c in want:
        aggs += [
            F.min(c).alias(f"_lo_{c}"),
            F.max(c).alias(f"_hi_{c}"),
            F.count(F.when(F.col(c).isNull(), F.lit(1))).alias(f"_nul_{c}"),
        ]
    rows = (
        df.select("bkt", *want, F.col("_metadata.file_path").alias("_fp"))
        .groupBy("_fp")
        .agg(*aggs)
        .collect()
    )
    out: dict[str, dict] = {}
    for r in rows:
        fp = r["_fp"]
        if fp.startswith("file:"):
            fp = fp[len("file:"):]
            while fp.startswith("//"):
                fp = fp[1:]
        rel = os.path.relpath(fp, root)
        entry = {
            "rows": int(r["_rows"]),
            "bkt": [int(r["_bkt_lo"]), int(r["_bkt_hi"])],
            "cols": {
                c: [
                    encode_value(fields[c], r[f"_lo_{c}"]),
                    encode_value(fields[c], r[f"_hi_{c}"]),
                    int(r[f"_nul_{c}"]),
                ]
                for c in want
            },
        }
        out[rel] = entry
    return out


def could_match(
    entry: dict | None, filters: list[tuple[str | None, str, object]]
) -> bool:
    """Can a file possibly hold a row satisfying ALL ``filters``?
    ``filters`` carry the file's WRITE-TIME column names and values in
    the encoded domain. Sound defaults: no stats entry / no stats for a
    column → True. ``name is None`` (the predicate column did not exist
    at — or was dropped after — this file's schema version, so its rows
    read NULL) → False, with or without stats. An all-null recorded
    column (min is None) → False: NULL never satisfies a comparison."""
    for name, op, val in filters:
        if name is None:
            return False
        st = (entry or {}).get("cols", {}).get(name)
        if st is None:
            continue
        lo, hi, _nulls = st
        if lo is None:
            return False
        if op == "=":
            ok = lo <= val <= hi
        elif op == "<":
            ok = lo < val
        elif op == "<=":
            ok = lo <= val
        elif op == ">":
            ok = hi > val
        elif op == ">=":
            ok = hi >= val
        else:
            raise ValueError(f"unsupported stats predicate op {op!r}")
        if not ok:
            return False
    return True


def file_bucket_cover(
    entry: dict | None, n_buckets: int
) -> tuple[int, int]:
    """Inclusive bucket range a file's rows may occupy: its recorded bkt
    bounds, else (no stats) the whole layout — sound over-approximation
    for hash-clustered delta files."""
    if entry and entry.get("bkt") and entry["bkt"][0] is not None:
        return int(entry["bkt"][0]), int(entry["bkt"][1])
    return 0, n_buckets - 1
