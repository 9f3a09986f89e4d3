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

import base64
import functools
import hashlib
import os
from datetime import date, datetime, timezone

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.bloom import WORD_BITS, _packed, _position

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


# ---------------------------------------------------------------------------
# per-file key bloom filters (Parquet's column-index bloom, manifest-resident
# so the DRIVER skips whole files for merge-key point lookups — a footer is
# never even opened for a file whose bloom says "definitely absent")
# ---------------------------------------------------------------------------

#: default bloom geometry: ~10 bits/key with 5 hashes → ~0.9% false
#: positives (a false positive only costs reading one extra file).
BLOOM_BITS_PER_KEY = 10
BLOOM_K = 5
#: hard cap on a single file's filter — bounds the JSON manifest to
#: ≲ 11 KiB base64 per file; files with more than
#: ``BLOOM_MAX_BITS / BLOOM_BITS_PER_KEY`` rows (post-compaction giants,
#: where min/max or bucket pruning is the right tool anyway) simply get
#: no bloom and degrade to "could match".
BLOOM_MAX_BITS = 1 << 19
BLOOM_SALT = "kb"


@functools.lru_cache(maxsize=65536)
def _host_positions(value: str, m_bits: int, k: int) -> tuple[int, ...]:
    """Driver-side replica of operators/bloom.py::_position — first 15
    md5 hex chars (60 bits) of ``"{salt}{i}:" + value``, mod m. Bit-for-
    bit parity with the Spark build side is pinned by tests.

    Memoized on (value, geometry): a multi-key scan (scan_semi's 10k-key
    default) probes every key against every candidate file's bloom, and
    files sharing a geometry — all of them, under one table config —
    reuse the k digests per key instead of recomputing them per (key,
    file): O(keys·k) hashing total, not O(keys·files·k)."""
    return tuple(
        int(
            hashlib.md5(
                f"{BLOOM_SALT}{i}:{value}".encode("utf-8")
            ).hexdigest()[:15],
            16,
        )
        % m_bits
        for i in range(k)
    )


def bloom_maybe_contains(kb: dict, value: str) -> bool:
    """Probe a manifest bloom entry ``{"m", "k", "b": base64}`` for a key.
    False is definitive (the file holds NO row with this key); True means
    "read the file". The decoded bit array is memoized on the entry (a
    plan probes many keys against the same file)."""
    raw = kb.get("_raw")
    if raw is None:
        raw = base64.b64decode(kb["b"])
        kb["_raw"] = raw
    for pos in _host_positions(value, int(kb["m"]), int(kb["k"])):
        w, bit = divmod(pos, WORD_BITS)
        word = int.from_bytes(raw[w * 8:(w + 1) * 8], "big")
        if not (word >> bit) & 1:
            return False
    return True


def collect_file_blooms(
    spark: SparkSession,
    root: str,
    rel_files: list[str],
    key_col: str,
    rows_by_file: dict[str, int],
    file_schema: T.StructType | None = None,
) -> dict[str, dict]:
    """ONE key-column-pruned scan of just-written files → a packed bloom
    per eligible file (rows × bits/key within BLOOM_MAX_BITS). All files
    in one call share a geometry sized to the largest eligible file (the
    positions are computed in a single Spark expression; smaller files
    just enjoy a lower false-positive rate). Build is explode-k-positions
    → one hash agg with map-side ``bit_or`` combine grouped by
    (file, word) — O(k · rows) rows into the agg, ≤ m/63 out per file."""
    bpk, cap, k = BLOOM_BITS_PER_KEY, BLOOM_MAX_BITS, BLOOM_K
    eligible = [
        f for f in rel_files
        if rows_by_file.get(f) is not None and rows_by_file[f] * bpk <= cap
    ]
    if not eligible:
        return {}
    n_words = max(8, -(-max(rows_by_file[f] for f in eligible) * bpk // WORD_BITS))
    m_bits = n_words * WORD_BITS
    reader = spark.read
    if file_schema is not None:
        reader = reader.schema(file_schema)
    df = reader.parquet(*[os.path.join(root, p) for p in eligible])
    pos = df.select(
        F.col("_metadata.file_path").alias("_fp"),
        F.explode(
            F.array(
                *[
                    _position(F.col(key_col).cast("string"), i, m_bits, BLOOM_SALT)
                    for i in range(k)
                ]
            )
        ).alias("pos"),
    )
    rows = (
        pos.select("_fp", *_packed(F.col("pos")))
        .groupBy("_fp", "word")
        .agg(F.bit_or("mask").alias("bits"))
        .collect()
    )
    packed: dict[str, bytearray] = {}
    for r in rows:
        fp = r["_fp"]
        if fp.startswith("file:"):
            fp = fp[len("file:"):]
            while fp.startswith("//"):
                fp = fp[1:]
        rel = os.path.relpath(fp, root)
        buf = packed.setdefault(rel, bytearray(n_words * 8))
        w = int(r["word"])
        buf[w * 8:(w + 1) * 8] = int(r["bits"]).to_bytes(8, "big")
    return {
        rel: {
            "m": m_bits,
            "k": k,
            "b": base64.b64encode(bytes(buf)).decode("ascii"),
        }
        for rel, buf in packed.items()
    }
