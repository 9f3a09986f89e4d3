"""Manifest-resident per-file column statistics and data-skipping scans
(streaming/filestats.py + ParquetLakeTable.scan_plan/scan_where).

Iceberg analogue: manifest ``lower_bounds``/``upper_bounds``/
``null_value_counts`` + scan planning. The reference's nearest shape is
the ``last_path`` cursor — write-time metadata deciding what the next
run reads (exec/BulkLoader.java:584-659); the min/max pruning itself is
ours, constrained by merge-on-read soundness (a pruned file must not
hide a superseding version of a kept key — see filestats.py docstring).
"""

from __future__ import annotations

import json
from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from embulk_spark.sources.events import change_stream
from embulk_spark.streaming.filestats import could_match, encode_value
from embulk_spark.streaming.lake import ParquetLakeTable
from embulk_spark.streaming.replay import apply_epoch, replay_batches


def _ev(seq, epoch, op, url, ts_off=0, html=b"<p>x</p>", lang="en",
        schema_change=None, **extra):
    return {
        "seq": seq, "epoch": epoch, "op": op, "url": url,
        "warc_ts": datetime(2024, 1, 1, 0, 0, ts_off, tzinfo=timezone.utc),
        "html": None if op == "D" else html,
        "lang": None if op == "D" else lang,
        "schema_change": schema_change,
        **extra,
    }


def _schema(extra_ddl: str = "") -> T.StructType:
    base = (
        "seq LONG, epoch LONG, op STRING, url STRING, warc_ts TIMESTAMP, "
        "html BINARY, lang STRING, schema_change STRING"
    )
    return T.StructType.fromDDL(base + (", " + extra_ddl if extra_ddl else ""))


def _stats_table(spark, path, sort=("lang",), n_events=900, n_epochs=3):
    events = change_stream(spark, n_events, 120, n_epochs, num_partitions=4)
    table = ParquetLakeTable(
        spark, path, n_buckets=4, compact_min_deltas=10_000,
        stats_columns=("warc_ts", "lang"), sort_columns=sort,
    )
    replay_batches(table, events, pipeline_depth=1)
    return table


def _rows(df):
    return {(r.url, r.seq) for r in df.collect()}


def _compact_many_files(spark, table, n_parts=16):
    """Compact with enough output partitions that each bucket's base
    holds several sort-clustered files — the shape file-granular
    pruning needs (conftest pins shuffle.partitions=4 → 1 file/bucket)."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n_parts))
    try:
        table.compact()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


# ---------------------------------------------------------------- recording


def test_stats_recorded_on_every_write_path(spark, tmp_path):
    table = _stats_table(spark, str(tmp_path / "t"))
    snap = table.current_snapshot()
    for g in snap["deltas"]:
        gst = table.group_stats(g)
        assert set(gst) == set(g["files"])
        for st in gst.values():
            assert st["rows"] > 0 and "lang" in st["cols"]
            lo, hi, nulls = st["cols"]["lang"]
            assert lo <= hi and nulls >= 0
            # timestamps land as epoch-micros ints
            tlo, thi, _ = st["cols"]["warc_ts"]
            assert isinstance(tlo, int) and tlo <= thi
    # partial compact → residual group carries stats too
    table.compact(buckets=[0, 1])
    snap = table.current_snapshot()
    resid = [d for d in snap["deltas"] if d.get("epoch_id") is None]
    assert resid and set(table.group_stats(resid[0])) == set(resid[0]["files"])
    # full compact → per-bucket base entries carry per-file stats
    table.compact()
    snap = table.current_snapshot()
    for e in snap["base"].values():
        assert set(table.group_stats(e)) == set(e["files"])
    # and files() surfaces them
    assert all(f["stats"] is not None for f in table.files())


def test_stats_off_by_default_and_sound(spark, tmp_path):
    events = change_stream(spark, 400, 60, 2, num_partitions=4)
    table = ParquetLakeTable(spark, str(tmp_path / "t"), n_buckets=4)
    replay_batches(table, events, pipeline_depth=1)
    assert all(
        table.group_stats(g) is None
        for g in table.current_snapshot()["deltas"]
    )
    assert all(f["stats"] is None for f in table.files())
    # planner degrades to a full, correct scan — nothing skipped
    plan = table.scan_plan([("lang", "=", "de")])
    assert plan["files_skipped"] == 0
    assert plan["buckets_kept"] == list(range(4))
    got = _rows(table.scan_where([("lang", "=", "de")]))
    assert got == _rows(table.published().filter(F.col("lang") == "de"))


# ------------------------------------------------------------- equivalence


@pytest.mark.parametrize("compact", [False, True])
def test_scan_where_equals_published_filter(spark, tmp_path, compact):
    table = _stats_table(spark, str(tmp_path / "t"))
    if compact:
        table.compact()
    pub = table.published()
    cases = [
        ([("lang", "=", "de")], F.col("lang") == "de"),
        ([("seq", ">=", 600)], F.col("seq") >= 600),
        (
            [("lang", ">", "de"), ("seq", "<", 500)],
            (F.col("lang") > "de") & (F.col("seq") < 500),
        ),
    ]
    for filters, pred in cases:
        assert _rows(table.scan_where(filters)) == _rows(pub.filter(pred))


def test_scan_where_timestamp_range(spark, tmp_path):
    table = _stats_table(spark, str(tmp_path / "t"), sort=("warc_ts",))
    _compact_many_files(spark, table)
    mid = table.published().agg(
        F.expr("timestamp_micros(cast(percentile(unix_micros(warc_ts), 0.5) as long))")
    ).first()[0]
    got = _rows(table.scan_where([("warc_ts", ">=", mid)]))
    want = _rows(table.published().filter(F.col("warc_ts") >= F.lit(mid)))
    assert got == want and want
    # sort order clusters warc_ts per bucket → some file actually skipped
    plan = table.scan_plan([("warc_ts", ">=", mid)])
    assert plan["files_skipped"] > 0


def test_scan_where_unpublished_includes_tombstones(spark, tmp_path):
    table = ParquetLakeTable(
        spark, str(tmp_path / "t"), n_buckets=4, stats_columns=("lang",),
    )
    evs = [
        _ev(1, 0, "I", "u://a", 1, lang="de"),
        _ev(2, 0, "I", "u://b", 2, lang="de"),
        _ev(3, 1, "D", "u://a", 3),
    ]
    replay_batches(table, spark.createDataFrame(evs, schema=_schema()))
    pub = table.scan_where([("lang", "=", "de")])
    assert {r.url for r in pub.collect()} == {"u://b"}
    raw = table.scan_where([("lang", "=", "de")], published=False)
    # the tombstone row carries lang NULL, so only the live 'de' row
    # matches even unpublished — but is_deleted/bkt stay visible
    assert {"is_deleted", "bkt"} <= set(raw.columns)


def test_scan_where_version_travel(spark, tmp_path):
    table = _stats_table(spark, str(tmp_path / "t"), n_epochs=2)
    v0 = table.current_snapshot()["version"]
    want = _rows(
        table.read(version=v0).filter(
            (F.col("lang") == "de") & ~F.col("is_deleted")
        )
    )
    extra = change_stream(spark, 300, 60, 1, num_partitions=4).withColumn(
        "seq", F.col("seq") + 50_000
    )
    apply_epoch(table, extra, 2)
    table.compact()
    got = _rows(table.scan_where([("lang", "=", "de")], version=v0))
    assert got == want


def test_unknown_filter_column_raises(spark, tmp_path):
    table = _stats_table(spark, str(tmp_path / "t"), n_events=200, n_epochs=1)
    with pytest.raises(ValueError, match="unknown column"):
        table.scan_plan([("nope", "=", 1)])


# ---------------------------------------------------------- MOR soundness


def test_superseding_version_respected_under_pruning(spark, tmp_path):
    """url flips lang de→en in a later pending delta: a lang='de' scan
    must NOT return it (the old matching version is superseded), and a
    lang='en' scan MUST return it even if pruning dropped the old file."""
    table = ParquetLakeTable(
        spark, str(tmp_path / "t"), n_buckets=4,
        stats_columns=("lang",), compact_min_deltas=10_000,
    )
    e0 = [_ev(1, 0, "I", "u://flip", 1, lang="de"),
          _ev(2, 0, "I", "u://keep", 2, lang="de")]
    e1 = [_ev(3, 1, "U", "u://flip", 3, lang="en")]
    replay_batches(
        table, spark.createDataFrame(e0 + e1, schema=_schema()),
        pipeline_depth=1,
    )
    assert {r.url for r in table.scan_where([("lang", "=", "de")]).collect()} \
        == {"u://keep"}
    assert {r.url for r in table.scan_where([("lang", "=", "en")]).collect()} \
        == {"u://flip"}


def test_bucket_granular_pruning_skips_cold_deltas(spark, tmp_path):
    """Keys are crafted so the 'xx' language lives in exactly one bucket;
    delta files of non-kept buckets are skipped wholesale, matching rows
    still come back exactly."""
    table = ParquetLakeTable(
        spark, str(tmp_path / "t"), n_buckets=4,
        stats_columns=("lang",), compact_min_deltas=10_000,
    )
    # one epoch per url → one single-bucket delta file per epoch
    urls = [f"u://site-{i}" for i in range(8)]
    for e, u in enumerate(urls):
        lang = "xx" if e == 0 else "en"
        df = spark.createDataFrame(
            [_ev(e + 1, e, "I", u, e + 1, lang=lang)], schema=_schema()
        )
        apply_epoch(table, df, e)
    plan = table.scan_plan([("lang", "=", "xx")])
    assert plan["delta_files_read"] < plan["delta_files_total"]
    kept = set(plan["buckets_kept"])
    assert len(kept) < 4
    got = {r.url for r in table.scan_where([("lang", "=", "xx")]).collect()}
    assert got == {urls[0]}


def test_clean_bucket_file_pruning_with_sort_order(spark, tmp_path):
    table = _stats_table(spark, str(tmp_path / "t"), sort=("lang",))
    _compact_many_files(spark, table)
    plan = table.scan_plan([("lang", "=", "de")])
    assert set(plan["buckets_clean"]) == set(range(4))
    assert 0 < plan["base_files_read"] < plan["base_files_total"]
    got = _rows(table.scan_where([("lang", "=", "de")]))
    assert got == _rows(table.published().filter(F.col("lang") == "de"))


def test_dirty_bucket_reads_all_base_versions(spark, tmp_path):
    """With a pending delta covering a bucket, that bucket's base files
    are NOT individually pruned (an old version there may be the row a
    delta supersedes — correctness over IO)."""
    table = _stats_table(spark, str(tmp_path / "t"), sort=("lang",))
    table.compact()
    extra = change_stream(spark, 200, 120, 1, num_partitions=4).withColumn(
        "seq", F.col("seq") + 50_000
    )
    apply_epoch(table, extra, 3)
    plan = table.scan_plan([("lang", "=", "de")])
    dirty = set(range(4)) - set(plan["buckets_clean"])
    assert dirty  # the new delta made at least one bucket dirty
    got = _rows(table.scan_where([("lang", "=", "de")]))
    assert got == _rows(table.published().filter(F.col("lang") == "de"))


# ------------------------------------------------------- schema evolution


def test_scan_filters_resolve_write_time_names(spark, tmp_path):
    """Files written before a rename carry the OLD column name; a filter
    on the new name must consult the old name's stats in those files."""
    table = ParquetLakeTable(
        spark, str(tmp_path / "t"), n_buckets=4, stats_columns=("lang",),
    )
    ren = json.dumps({"action": "rename", "from": "lang", "to": "language"})
    e0 = [_ev(1, 0, "I", "u://a", 1, lang="de")]
    e1 = [_ev(2, 1, "S", "u://-", 2, schema_change=ren),
          _ev(3, 1, "I", "u://b", 3, lang="fr")]
    replay_batches(table, spark.createDataFrame(e0 + e1, schema=_schema()))
    got = {r.url: r.language
           for r in table.scan_where([("language", "=", "de")]).collect()}
    assert got == {"u://a": "de"}
    # the stats of the old file were recorded under 'lang' and still used
    v0_group = [g for g in table.current_snapshot()["deltas"]
                if g.get("epoch_id") == 0][0]
    assert all(
        "lang" in st["cols"]
        for st in table.group_stats(v0_group).values()
    )


def test_pre_add_files_pruned_for_new_column_filter(spark, tmp_path):
    """A filter on a column added later can never match rows from files
    written before the add (they read NULL) — those files are pruned
    without any stats."""
    table = ParquetLakeTable(
        spark, str(tmp_path / "t"), n_buckets=4, stats_columns=("lang",),
    )
    add = json.dumps({"action": "add", "column": "score", "type": "long"})
    # u://old hashes to bucket 3, u://new to bucket 2 (pmod(xxhash64, 4))
    # — bucket-disjoint, so the pre-add file covers no kept bucket.
    e0 = [_ev(1, 0, "I", "u://old", 1, score=None)]
    e1 = [_ev(9, 1, "S", "u://-", 9, schema_change=add, score=None),
          _ev(10, 1, "I", "u://new", 10, score=7)]
    replay_batches(
        table, spark.createDataFrame(e0 + e1, schema=_schema("score LONG")),
        pipeline_depth=1,
    )
    plan = table.scan_plan([("score", ">=", 1)])
    assert plan["delta_files_read"] < plan["delta_files_total"]
    got = {r.url for r in table.scan_where([("score", ">=", 1)]).collect()}
    assert got == {"u://new"}


# ------------------------------------------------------------- unit level


def test_could_match_semantics():
    entry = {"cols": {"x": [10, 20, 0], "y": [None, None, 5]}}
    assert could_match(entry, [("x", "=", 15)])
    assert not could_match(entry, [("x", "=", 25)])
    assert could_match(entry, [("x", ">", 19)])
    assert not could_match(entry, [("x", ">", 20)])
    assert could_match(entry, [("x", "<=", 10)])
    assert not could_match(entry, [("x", "<", 10)])
    # all-null column can never satisfy a comparison
    assert not could_match(entry, [("y", "=", 1)])
    # unknown column / missing entry degrade to could-match
    assert could_match(entry, [("z", "=", 1)])
    assert could_match(None, [("x", "=", 1)])
    # write-time name None ⇒ rows read NULL ⇒ never match
    assert not could_match(entry, [(None, "=", 1)])
    with pytest.raises(ValueError):
        could_match(entry, [("x", "!=", 1)])


def test_encode_value_domains():
    ts = datetime(2024, 1, 1, tzinfo=timezone.utc)
    assert encode_value(T.TimestampType(), ts) == 1_704_067_200_000_000
    naive = datetime(2024, 1, 1)  # session tz is UTC everywhere here
    assert encode_value(T.TimestampType(), naive) == 1_704_067_200_000_000
    assert encode_value(T.DateType(), ts) == "2024-01-01"
    assert encode_value(T.LongType(), 7) == 7
    assert encode_value(T.DoubleType(), 7) == 7.0
    assert encode_value(T.StringType(), "s") == "s"
    assert encode_value(T.LongType(), None) is None
    with pytest.raises(TypeError):
        encode_value(T.BinaryType(), b"x")
