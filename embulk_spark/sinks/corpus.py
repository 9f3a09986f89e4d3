"""Sharded training-corpus export with an audit manifest.

The last artifact of a curation pipeline: the corpus written as N
deterministic shards plus a ``manifest.json`` recording, per shard, the
row count, token count, and an order-independent content fingerprint —
so a consumer (or a resumed export) can verify every shard without
re-reading the corpus, and two exports of the same corpus are
byte-comparable by manifest alone.

Shard assignment is ``md5(salt:id) % n_shards`` — a pure function of
(salt, id), like every partitioning decision in this engine
(operators/sample.py discipline): reruns, repartitions, and task
retries land each row in the same shard. Rows arrive at the writer
pre-clustered by ``repartition(n_shards, shard)`` so each shard is one
output task writing one file set (the FileOutputPlugin one-task-per-file
model, reference spi/FileOutputRunner.java:110-134, scaled out).

Commit protocol matches the lake's: data first, then the manifest via
create-exclusive — a manifest's existence marks a complete export, a
crashed export leaves no manifest and is re-run (exactly-once by
re-execution, the reference's BulkLoader commit-gate shape,
exec/BulkLoader.java:541-548).

Scale shape: one repartition shuffle on the uniform shard key, one
pass; the manifest aggregation piggybacks a groupBy(shard) over the
same columns (n_shards rows — constant, driver-safe). The content
fingerprint is ``xor``-free long addition of per-row md5 prefixes:
order-independent, mergeable, and SQL-replayable.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: underscore prefix => invisible to Spark's file listing, so the
#: manifest can live inside the export directory it describes
MANIFEST = "_manifest.json"


def shard_of(id_col: Column, n_shards: int, salt: str = "shard1") -> Column:
    """Deterministic shard id: first 8 md5 hex chars of ``salt:id``
    mod ``n_shards``."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt + ":"), id_col.cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % n_shards
    ).cast("int")


def row_fingerprint(id_col: Column, text_col: Column) -> Column:
    """Per-row fingerprint: first 15 md5 hex chars (60 bits) of
    ``id<US>text`` (0x1f unit separator — NUL is not a legal DuckDB
    string, and the oracle replays this hash), summed as decimal(38,0) —
    10^10 rows × 2^60 ≈ 10^28 stays far inside decimal range, where a
    long sum would overflow."""
    payload = F.concat_ws("\x1f", id_col.cast("string"), text_col)
    return (
        F.conv(F.substring(F.md5(payload), 1, 15), 16, 10)
        .cast("long")
        .cast("decimal(38,0)")
    )


def write_corpus_shards(
    df: DataFrame,
    path: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = 16,
    salt: str = "shard1",
    fmt: str = "parquet",
) -> dict:
    """Export ``df`` as ``n_shards`` deterministic shards under
    ``path/shard=NN/`` plus ``path/manifest.json``; returns the manifest.

    ``fmt``: ``parquet`` or ``json`` (jsonl). Raises FileExistsError if
    a manifest already exists at ``path`` (a completed export is never
    silently overwritten)."""
    if fmt not in ("parquet", "json"):
        raise ValueError(f"fmt must be parquet or json; got {fmt}")
    mpath = os.path.join(path, MANIFEST)
    if os.path.exists(mpath):
        raise FileExistsError(f"completed export already at {path}")
    sharded = df.withColumn(
        "shard", shard_of(F.col(id_col), n_shards, salt)
    ).repartition(n_shards, "shard")
    (
        sharded.write.partitionBy("shard")
        .format(fmt)
        .mode("overwrite")
        .save(path)
    )
    stats = (
        sharded.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum(
                F.size(
                    F.filter(
                        F.split(F.col(text_col), r"\s+"),
                        lambda w: w != F.lit(""),
                    )
                )
            ).alias("n_tokens"),
            F.sum(
                row_fingerprint(F.col(id_col), F.col(text_col))
            ).alias("content_sum"),
        )
        .orderBy("shard")
        .collect()
    )
    manifest = {
        "format": fmt,
        "n_shards": n_shards,
        "salt": salt,
        "id_col": id_col,
        "text_col": text_col,
        "total_rows": int(sum(r["rows"] for r in stats)),
        "total_tokens": int(sum(r["n_tokens"] or 0 for r in stats)),
        "shards": [
            {
                "shard": int(r["shard"]),
                "rows": int(r["rows"]),
                "n_tokens": int(r["n_tokens"] or 0),
                "content_sum": int(r["content_sum"]),
            }
            for r in stats
        ],
    }
    # create-exclusive commit mark: crashed exports leave no manifest
    fd = os.open(mpath, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    with os.fdopen(fd, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def verify_corpus_shards(spark, path: str) -> dict:
    """Re-read an export and check every shard against its manifest
    entry (rows + content_sum). Returns {"ok": bool, "mismatches": [...]}
    — the consumer-side audit that needs no access to the source."""
    with open(os.path.join(path, MANIFEST)) as f:
        manifest = json.load(f)
    df = spark.read.format(manifest["format"]).load(path)
    got = {
        int(r["shard"]): (int(r["rows"]), int(r["content_sum"]))
        for r in df.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum(
                row_fingerprint(
                    F.col(manifest["id_col"]), F.col(manifest["text_col"])
                )
            ).alias("content_sum"),
        )
        .collect()
    }
    mismatches = []
    for s in manifest["shards"]:
        if got.get(s["shard"]) != (s["rows"], s["content_sum"]):
            mismatches.append(s["shard"])
    extra = set(got) - {s["shard"] for s in manifest["shards"]}
    mismatches.extend(sorted(extra))
    return {"ok": not mismatches, "mismatches": mismatches}
