"""Sharded corpus export (sinks/corpus.py): deterministic shard layout,
manifest audit round-trip, tamper detection, and the no-silent-overwrite
commit contract."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from embulk_spark.sinks.corpus import (
    MANIFEST,
    verify_corpus_shards,
    write_corpus_shards,
)


def _docs(spark, n=40):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc text number "), F.col("id").cast("string")).alias(
            "text"
        ),
    )


def test_export_layout_and_manifest(spark, tmp_path):
    path = str(tmp_path / "corpus")
    m = write_corpus_shards(_docs(spark), path, n_shards=4)
    dirs = sorted(d for d in os.listdir(path) if d.startswith("shard="))
    assert dirs == [f"shard={s['shard']}" for s in m["shards"]]
    assert m["total_rows"] == 40
    assert m["total_tokens"] == 40 * 4
    on_disk = json.load(open(os.path.join(path, MANIFEST)))
    assert on_disk == m
    assert verify_corpus_shards(spark, path)["ok"]


def test_export_is_partitioning_invariant(spark, tmp_path):
    a = write_corpus_shards(_docs(spark), str(tmp_path / "a"), n_shards=4)
    b = write_corpus_shards(
        _docs(spark).repartition(7), str(tmp_path / "b"), n_shards=4
    )
    assert a["shards"] == b["shards"]


def test_export_never_overwrites_a_completed_export(spark, tmp_path):
    path = str(tmp_path / "corpus")
    write_corpus_shards(_docs(spark), path, n_shards=2)
    with pytest.raises(FileExistsError):
        write_corpus_shards(_docs(spark), path, n_shards=2)


def test_verify_detects_tamper(spark, tmp_path):
    path = str(tmp_path / "corpus")
    write_corpus_shards(_docs(spark), path, n_shards=2, fmt="parquet")
    # drop one shard's files entirely
    shard_dir = os.path.join(path, "shard=0")
    for f in os.listdir(shard_dir):
        os.remove(os.path.join(shard_dir, f))
    os.rmdir(shard_dir)
    out = verify_corpus_shards(spark, path)
    assert not out["ok"] and out["mismatches"] == [0]


def test_jsonl_format_round_trips(spark, tmp_path):
    path = str(tmp_path / "corpus")
    m = write_corpus_shards(_docs(spark, 10), path, n_shards=2, fmt="json")
    assert m["format"] == "json"
    assert verify_corpus_shards(spark, path)["ok"]
    back = spark.read.json(path)
    assert back.count() == 10 and set(back.columns) >= {"doc_id", "text"}


def test_pipeline_output_corpus_shards(spark, tmp_path):
    from embulk_spark.sinks.files import write_output

    path = str(tmp_path / "out")
    report = write_output(
        _docs(spark, 12),
        {"type": "corpus_shards", "path": path, "n_shards": 3},
    )
    assert report["rows"] == 12 and report["type"] == "corpus_shards"
    assert verify_corpus_shards(spark, path)["ok"]
