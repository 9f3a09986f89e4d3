"""Persisted table properties (Iceberg TBLPROPERTIES): physical-behavior
knobs recorded at creation, adopted by default-opened handles, changed
durably via set_properties, carried by commits/rollback/clone — a bare
re-open can no longer silently change the table's physical story.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from embulk_spark.sources.events import change_stream
from embulk_spark.streaming.lake import ParquetLakeTable


def _ingest(table, spark, n=400):
    ev = change_stream(spark, n, 60, 1, num_partitions=2)
    table.merge_epoch(ev.drop("epoch", "schema_change"), 0, extract=False)


def test_bare_reopen_adopts_creation_properties(spark, tmp_path):
    path = str(tmp_path / "t")
    ParquetLakeTable(
        spark, path, n_buckets=2, stats_columns=("warc_ts", "lang"),
        sort_columns=("lang",), key_bloom=True, url_hll=True,
        compact_min_deltas=10_000, target_file_bytes=1 << 30,
    )
    t2 = ParquetLakeTable(spark, path)  # bare open: adopts, not resets
    assert t2.stats_columns == ("warc_ts", "lang")
    assert t2.sort_columns == ("lang",)
    assert t2.key_bloom and t2.url_hll
    assert t2.compact_min_deltas == 10_000
    assert t2.target_file_bytes == 1 << 30
    # and the adopted handle actually BEHAVES with them: its write
    # collects stats + blooms, its commit updates the HLL
    _ingest(t2, spark)
    snap = t2.current_snapshot()
    st = t2.group_stats(snap["deltas"][0])
    assert st and all("warc_ts" in s["cols"] for s in st.values())
    assert t2.url_cardinality() is not None


def test_explicit_arg_overrides_locally_not_durably(spark, tmp_path):
    path = str(tmp_path / "t")
    ParquetLakeTable(spark, path, n_buckets=2, compact_min_deltas=10_000)
    local = ParquetLakeTable(spark, path, compact_min_deltas=3)
    assert local.compact_min_deltas == 3          # handle-local
    assert local.properties()["compact_min_deltas"] == 10_000  # stored
    assert ParquetLakeTable(spark, path).compact_min_deltas == 10_000


def test_set_properties_durable_validated_and_survives_commits(
    spark, tmp_path
):
    path = str(tmp_path / "t")
    t = ParquetLakeTable(spark, path, n_buckets=2,
                         compact_min_deltas=10_000)
    t.set_properties(stats_columns=("lang",), target_file_bytes=1 << 20)
    assert t.stats_columns == ("lang",)  # this handle adopts immediately
    assert ParquetLakeTable(spark, path).target_file_bytes == 1 << 20
    with pytest.raises(ValueError, match="unknown table properties"):
        t.set_properties(nope=1)
    with pytest.raises(ValueError, match="cluster_mode"):
        t.set_properties(cluster_mode="hilbert")
    # properties ride ordinary commits and compaction
    _ingest(t, spark)
    t.compact()
    assert ParquetLakeTable(spark, path).properties()["stats_columns"] == (
        "lang",
    )


def test_legacy_snapshot_without_properties_defaults(spark, tmp_path):
    import json
    import os

    path = str(tmp_path / "t")
    t = ParquetLakeTable(spark, path, n_buckets=2)
    # simulate a pre-properties snapshot on disk
    sp = os.path.join(path, "snapshots", "v00000000.json")
    with open(sp) as f:
        snap = json.load(f)
    snap.pop("properties", None)
    os.remove(sp)
    with open(sp, "w") as f:
        json.dump(snap, f)
    t2 = ParquetLakeTable(spark, path)
    assert t2.stats_columns == () and t2.cluster_mode == "range"
    t2.set_properties(stats_columns=("lang",))  # upgrade path
    assert ParquetLakeTable(spark, path).stats_columns == ("lang",)


def test_clone_inherits_properties(spark, tmp_path):
    src = ParquetLakeTable(
        spark, str(tmp_path / "src"), n_buckets=2,
        stats_columns=("lang",), key_bloom=True, compact_min_deltas=10_000,
    )
    _ingest(src, spark)
    src.clone_to(str(tmp_path / "dev"))
    dev = ParquetLakeTable(spark, str(tmp_path / "dev"))
    assert dev.stats_columns == ("lang",) and dev.key_bloom


def test_cli_properties_show_and_set(spark, tmp_path, capsys):
    import json

    from embulk_spark import cli

    path = str(tmp_path / "t")
    ParquetLakeTable(spark, path, n_buckets=2, compact_min_deltas=10_000)
    assert cli.main([
        "properties", path,
        "--set", 'stats_columns=["lang"]',
        "--set", "target_file_bytes=1048576",
    ]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["stats_columns"] == ["lang"]
    assert out["target_file_bytes"] == 1048576
    assert ParquetLakeTable(spark, path).stats_columns == ("lang",)
