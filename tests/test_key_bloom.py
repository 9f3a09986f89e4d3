"""Manifest-resident per-file merge-key bloom filters and the strong
key-equality pruning rule (streaming/filestats.py bloom half +
ParquetLakeTable.scan_plan/lookup_urls).

Iceberg/Parquet analogue: the column bloom index, hoisted into the
manifest so the DRIVER skips whole files for point lookups without even
opening a footer. Soundness is stronger than for min/max attribute
stats: url is the merge key, so EVERY version of a key lives only in
files that contain that key — a bloom-negative file can be skipped
per-file even in dirty buckets and among deltas (where attribute stats
may only vote on buckets). Reference analogue: write-time metadata
deciding what the next run reads (exec/BulkLoader.java:584-659).
"""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from embulk_spark.operators.bloom import _position
from embulk_spark.sources.events import change_stream
from embulk_spark.streaming import filestats
from embulk_spark.streaming.filestats import (
    BLOOM_SALT,
    _host_positions,
    bloom_maybe_contains,
)
from embulk_spark.streaming.lake import ParquetLakeTable
from embulk_spark.streaming.replay import apply_epoch, replay_batches


def _ev(seq, epoch, op, url, ts_off=0, html=b"<p>x</p>", lang="en"):
    return {
        "seq": seq, "epoch": epoch, "op": op, "url": url,
        "warc_ts": datetime(2024, 1, 1, 0, 0, ts_off, tzinfo=timezone.utc),
        "html": None if op == "D" else html,
        "lang": None if op == "D" else lang,
        "schema_change": None,
    }


def _schema() -> T.StructType:
    return T.StructType.fromDDL(
        "seq LONG, epoch LONG, op STRING, url STRING, warc_ts TIMESTAMP, "
        "html BINARY, lang STRING, schema_change STRING"
    )


def _bloom_table(spark, path, **kw):
    kw.setdefault("n_buckets", 4)
    kw.setdefault("compact_min_deltas", 10_000)
    return ParquetLakeTable(spark, path, key_bloom=True, **kw)


def _rows(df):
    return {(r.url, r.seq) for r in df.collect()}


# -------------------------------------------------------------- recording


def test_bloom_recorded_and_probes_truthfully(spark, tmp_path):
    table = _bloom_table(spark, str(tmp_path / "t"))
    events = change_stream(spark, 600, 80, 2, num_partitions=4)
    replay_batches(table, events, pipeline_depth=1)
    snap = table.current_snapshot()
    checked = 0
    for g in snap["deltas"]:
        for f in g["files"]:
            kb = table.group_stats(g)[f].get("kb")
            assert kb is not None and kb["m"] % 63 == 0 and kb["k"] >= 1
            present = {
                r.url
                for r in spark.read.parquet(f"{table.path}/{f}")
                .select("url").collect()
            }
            for u in present:
                assert bloom_maybe_contains(kb, u)
            misses = sum(
                0 if bloom_maybe_contains(kb, f"u://definitely-not-{i}")
                else 1
                for i in range(20)
            )
            assert misses >= 15  # FP rate ~1%/probe; ≥15/20 negatives
            checked += 1
    assert checked > 0


def test_host_positions_match_spark_build_side(spark):
    """The driver-side probe hash must be bit-identical to the Spark
    expression the build side used (operators/bloom.py::_position)."""
    m, k = 63 * 1024, 5
    vals = ["u://a", "u://b", "ünïcode-url/é", "x" * 500]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    got = df.select(
        "v",
        *[
            _position(F.col("v"), i, m, BLOOM_SALT).alias(f"p{i}")
            for i in range(k)
        ],
    ).collect()
    for r in got:
        assert tuple(r[f"p{i}"] for i in range(k)) == tuple(
            _host_positions(r["v"], m, k)
        )


def test_bloom_cap_omits_oversized_files(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(filestats, "BLOOM_MAX_BITS", 63 * 8)  # ~50 rows max
    table = _bloom_table(spark, str(tmp_path / "t"))
    events = change_stream(spark, 400, 60, 1, num_partitions=1)
    replay_batches(table, events, pipeline_depth=1)
    snap = table.current_snapshot()
    assert any(
        "kb" not in st
        for g in snap["deltas"]
        for st in table.group_stats(g).values()
    )
    # sound degrade: lookups still exact
    u = table.published().select("url").first()["url"]
    assert _rows(table.lookup_urls(u)) == _rows(
        table.published().filter(F.col("url") == u)
    )


# ------------------------------------------------------- pruning + lookup


def test_lookup_prunes_unrelated_delta_files(spark, tmp_path):
    """10 epochs touch 10 disjoint urls; a point lookup must read far
    fewer delta files than exist — bloom skips files even inside the
    key's own hash bucket."""
    table = _bloom_table(spark, str(tmp_path / "t"))
    urls = [f"u://site-{i}" for i in range(10)]
    for e, u in enumerate(urls):
        apply_epoch(
            table,
            spark.createDataFrame([_ev(e + 1, e, "I", u, e + 1)], _schema()),
            e,
        )
    plan = table.scan_plan([("url", "=", urls[3])])
    assert plan["probe_keys"] == [urls[3]]
    assert plan["delta_files_read"] <= 2  # the key's file + rare FPs
    assert plan["delta_files_total"] == 10
    assert _rows(table.lookup_urls(urls[3])) == {(urls[3], 4)}


def test_lookup_equivalence_random_stream(spark, tmp_path):
    table = _bloom_table(spark, str(tmp_path / "t"))
    events = change_stream(spark, 900, 120, 3, num_partitions=4)
    replay_batches(table, events, pipeline_depth=1)
    pub = table.published()
    keys = [r.url for r in pub.select("url").orderBy("url").limit(5).collect()]
    probe = keys + ["u://absent-1", "u://absent-2"]
    assert _rows(table.lookup_urls(probe)) == _rows(
        pub.filter(F.col("url").isin(probe))
    )
    assert table.lookup_urls([]).count() == 0
    assert table.scan_where([("url", "in", [])]).count() == 0


def test_dirty_bucket_base_files_prune_for_key_lookups(spark, tmp_path):
    """After compaction into several files per bucket PLUS a fresh delta
    (bucket dirty), a key lookup still prunes base files per-file — the
    strong rule ignores dirtiness because url is the merge key."""
    table = _bloom_table(spark, str(tmp_path / "t"), sort_columns=("url",))
    events = change_stream(spark, 900, 150, 3, num_partitions=4)
    replay_batches(table, events, pipeline_depth=1)
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    try:
        table.compact()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    extra = change_stream(spark, 150, 150, 1, num_partitions=4).withColumn(
        "seq", F.col("seq") + 50_000
    )
    apply_epoch(table, extra, 3)
    u = table.published().select("url").orderBy("url").first()["url"]
    plan = table.scan_plan([("url", "=", u)])
    assert set(plan["buckets_clean"]) != set(range(4))  # bucket is dirty
    assert plan["base_files_read"] < plan["base_files_total"]
    assert _rows(table.lookup_urls(u)) == _rows(
        table.published().filter(F.col("url") == u)
    )


def test_supersession_and_delete_visible_through_pruned_lookup(spark, tmp_path):
    table = _bloom_table(spark, str(tmp_path / "t"))
    apply_epoch(
        table,
        spark.createDataFrame(
            [_ev(1, 0, "I", "u://a", 1, lang="de"),
             _ev(2, 0, "I", "u://b", 2, lang="de")], _schema()
        ),
        0,
    )
    apply_epoch(
        table,
        spark.createDataFrame(
            [_ev(3, 1, "U", "u://a", 3, lang="en"),
             _ev(4, 1, "D", "u://b", 4)], _schema()
        ),
        1,
    )
    got = {(r.url, r.lang) for r in table.lookup_urls(["u://a", "u://b"]).collect()}
    assert got == {("u://a", "en")}  # newest version wins; delete stays dead


def test_mixed_key_and_attribute_filters(spark, tmp_path):
    table = _bloom_table(
        spark, str(tmp_path / "t"), stats_columns=("lang",)
    )
    events = change_stream(spark, 600, 100, 2, num_partitions=4)
    replay_batches(table, events, pipeline_depth=1)
    pub = table.published()
    u = pub.filter(F.col("lang") == "de").select("url").first()["url"]
    got = _rows(table.scan_where([("url", "=", u), ("lang", "=", "de")]))
    assert got == _rows(pub.filter((F.col("url") == u) & (F.col("lang") == "de")))
    # conjunction of key filters intersects the key sets
    plan = table.scan_plan([("url", "in", [u, "u://other"]), ("url", "=", u)])
    assert plan["probe_keys"] == [u]
    # contradictory key filters → empty
    assert table.scan_where(
        [("url", "=", u), ("url", "=", "u://other")]
    ).count() == 0


# --------------------------------------------------- semi-join file pruning


def test_scan_semi_small_probe_prunes_and_matches_join(spark, tmp_path):
    table = _bloom_table(spark, str(tmp_path / "t"))
    events = change_stream(spark, 900, 120, 3, num_partitions=4)
    replay_batches(table, events, pipeline_depth=1)
    pub = table.published()
    keys = [r.url for r in pub.select("url").orderBy("url").limit(4).collect()]
    probe = spark.createDataFrame(
        [(k,) for k in keys] + [("u://absent",), (None,)], "k string"
    )
    got = _rows(table.scan_semi(probe, "k"))
    want = _rows(pub.join(
        probe.withColumnRenamed("k", "url").dropna(), "url", "left_semi"
    ))
    assert got == want
    # bucket pruning engages on the pruned path (file-level skipping is
    # pinned by test_lookup_prunes_unrelated_delta_files — here the 3
    # epochs share one url space, so every file may legitimately match)
    plan = table.scan_plan([("url", "in", keys)])
    assert len(plan["buckets_kept"]) <= 4
    # attribute filters compose on the pruned path
    lang = pub.filter(F.col("url").isin(keys)).select("lang").first()["lang"]
    got2 = _rows(table.scan_semi(probe, "k", filters=[("lang", "=", lang)]))
    assert got2 == _rows(
        pub.filter(F.col("lang") == lang)
        .join(probe.withColumnRenamed("k", "url").dropna(), "url", "left_semi")
    )


def test_scan_semi_large_probe_falls_back_to_join(spark, tmp_path):
    table = _bloom_table(spark, str(tmp_path / "t"))
    events = change_stream(spark, 600, 80, 2, num_partitions=4)
    replay_batches(table, events, pipeline_depth=1)
    pub = table.published()
    probe = pub.select("url")  # every key: past any sensible cap
    got = _rows(table.scan_semi(probe, "url", max_probe_keys=3))
    assert got == _rows(pub)
    assert table.scan_semi(
        spark.createDataFrame([], "url string"), "url"
    ).count() == 0


# ------------------------------------------------------------ key history


def test_key_history_versions_with_epoch_provenance(spark, tmp_path):
    table = _bloom_table(spark, str(tmp_path / "t"))
    apply_epoch(
        table,
        spark.createDataFrame(
            [_ev(1, 0, "I", "u://a", 1, lang="de"),
             _ev(2, 0, "I", "u://b", 2)], _schema()
        ),
        0,
    )
    apply_epoch(
        table,
        spark.createDataFrame(
            [_ev(3, 1, "U", "u://a", 3, lang="en"),
             _ev(4, 1, "D", "u://b", 4)], _schema()
        ),
        1,
    )
    apply_epoch(
        table, spark.createDataFrame([_ev(5, 2, "I", "u://c", 5)], _schema()), 2
    )
    got = {
        (r.url, r.epoch, r.seq, r.lang, r.is_deleted)
        for r in table.key_history(["u://a", "u://b"]).collect()
    }
    assert got == {
        ("u://a", 0, 1, "de", False),
        ("u://a", 1, 3, "en", False),
        ("u://b", 0, 2, "en", False),
        ("u://b", 1, 4, None, True),  # tombstone is a visible version
    }
    # compaction folds the retained history into one NULL-epoch version
    table.compact()
    folded = table.key_history("u://a").collect()
    assert [(r.epoch, r.seq, r.lang) for r in folded] == [(None, 3, "en")]
    assert table.key_history([]).count() == 0


def test_key_history_matches_per_epoch_winners(spark, tmp_path):
    """Random stream: history of a key == the (warc_ts, seq)-winner of
    each epoch that touched it (merge_epoch dedups in-batch)."""
    table = _bloom_table(spark, str(tmp_path / "t"))
    events = change_stream(spark, 900, 100, 4, num_partitions=4)
    replay_batches(table, events, pipeline_depth=1)
    u = table.published().select("url").orderBy("url").first()["url"]
    expected = {
        (int(r.epoch), int(r.seq))
        for r in events.filter(F.col("url") == u)
        .groupBy("epoch")
        .agg(F.max_by("seq", F.struct("warc_ts", "seq")).alias("seq"))
        .collect()
    }
    got = {
        (r.epoch, r.seq) for r in table.key_history(u).collect()
    }
    assert got == expected


def test_compacted_base_blooms_serve_lookups(spark, tmp_path):
    table = _bloom_table(spark, str(tmp_path / "t"))
    events = change_stream(spark, 600, 100, 2, num_partitions=4)
    replay_batches(table, events, pipeline_depth=1)
    table.compact()
    snap = table.current_snapshot()
    assert all(
        "kb" in table.group_stats(e)[f]
        for e in snap["base"].values()
        for f in e["files"]
    )
    pub = table.published()
    u = pub.select("url").orderBy("url").first()["url"]
    assert _rows(table.lookup_urls(u)) == _rows(pub.filter(F.col("url") == u))
