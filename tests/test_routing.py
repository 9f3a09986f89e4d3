"""Multi-table binlog fan-out (streaming/replay.py::route_epoch).

A real binlog/WAL interleaves every table's commits in one ordered
stream (the shape the Debezium/Maxwell/Canal parsers emit, tagged by
``table``); the router applies each table's slice to its own lake with
per-(table, epoch) exactly-once — the reference's analogue is one
BulkLoader transaction per output (exec/BulkLoader.java:318-370), here
collapsed into one pass over the stream.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from embulk_spark.sources.events import change_stream
from embulk_spark.streaming.lake import ParquetLakeTable
from embulk_spark.streaming.replay import apply_epoch, route_epoch

N_EVENTS, N_URLS, N_EPOCHS = 1200, 150, 3


@pytest.fixture(scope="module")
def tagged_stream(spark):
    """One interleaved stream: each event deterministically tagged with a
    destination table by url hash (a url's whole history stays on one
    table, as a binlog's per-table rows do)."""
    ev = change_stream(spark, N_EVENTS, N_URLS, N_EPOCHS, num_partitions=4)
    return ev.withColumn(
        "table",
        F.when(F.crc32(F.col("url")) % 2 == 0, F.lit("pages_a")).otherwise(
            F.lit("pages_b")
        ),
    ).persist()


def _mk_tables(spark, tmp_path):
    return {
        "pages_a": ParquetLakeTable(spark, str(tmp_path / "a")),
        "pages_b": ParquetLakeTable(spark, str(tmp_path / "b")),
    }


def test_route_matches_per_table_replay(spark, tmp_path, tagged_stream):
    routed = _mk_tables(spark, tmp_path / "routed")
    control = _mk_tables(spark, tmp_path / "control")
    for e in range(N_EPOCHS):
        epoch = tagged_stream.filter(F.col("epoch") == e)
        rep = route_epoch(routed, epoch, e)
        assert rep["unrouted_rows"] == 0
        for name, tbl in control.items():
            apply_epoch(
                tbl, epoch.filter(F.col("table") == name).drop("table"), e
            )
    for name in routed:
        got = {
            (r.url, r.seq, r.text)
            for r in routed[name].published().select("url", "seq", "text").collect()
        }
        want = {
            (r.url, r.seq, r.text)
            for r in control[name].published().select("url", "seq", "text").collect()
        }
        assert got == want and len(got) > 0
    # no url leaked to both tables
    a = {r.url for r in routed["pages_a"].published().select("url").collect()}
    b = {r.url for r in routed["pages_b"].published().select("url").collect()}
    assert not (a & b)


def test_route_resumes_per_table_after_partial_crash(spark, tmp_path, tagged_stream):
    tables = _mk_tables(spark, tmp_path)
    epoch0 = tagged_stream.filter(F.col("epoch") == 0)
    # simulated crash: table A committed epoch 0, table B did not
    apply_epoch(
        tables["pages_a"],
        epoch0.filter(F.col("table") == "pages_a").drop("table"),
        0,
    )
    rep = route_epoch(tables, epoch0, 0)
    assert rep["tables"]["pages_a"].get("skipped_duplicate_epoch")
    assert not rep["tables"]["pages_b"].get("skipped_duplicate_epoch")
    # re-delivery of the whole epoch is a full no-op
    rep2 = route_epoch(tables, epoch0, 0)
    assert all(m.get("skipped_duplicate_epoch") for m in rep2["tables"].values())


def test_route_counts_and_strict_unrouted(spark, tmp_path, tagged_stream):
    tables = {"pages_a": ParquetLakeTable(spark, str(tmp_path / "only_a"))}
    epoch0 = tagged_stream.filter(F.col("epoch") == 0)
    n_b = epoch0.filter(F.col("table") == "pages_b").count()
    rep = route_epoch(tables, epoch0, 0)
    assert rep["unrouted_rows"] == n_b > 0
    with pytest.raises(ValueError, match="unrouted|name tables"):
        route_epoch(
            {"pages_a": ParquetLakeTable(spark, str(tmp_path / "strict_a"))},
            epoch0,
            0,
            strict=True,
        )


def test_cli_route_replay(spark, tmp_path, tagged_stream, capsys):
    import json

    from embulk_spark import cli
    from embulk_spark.streaming.lake import ParquetLakeTable

    events_dir = str(tmp_path / "ev")
    tagged_stream.write.parquet(events_dir)
    routes = {"pages_a": str(tmp_path / "ra"), "pages_b": str(tmp_path / "rb")}
    rc = cli.main([
        "replay", events_dir, "ignored",
        "--route", json.dumps(routes), "--master", "local[4]",
    ])
    assert rc == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    assert len(lines) == N_EPOCHS
    total = tagged_stream.count()
    a = ParquetLakeTable(spark, routes["pages_a"])
    b = ParquetLakeTable(spark, routes["pages_b"])
    assert a.published().count() > 0 and b.published().count() > 0
    assert set(a.committed_epochs()) == set(range(N_EPOCHS))
    assert total > 0


def test_route_counts_null_tags_as_unrouted(spark, tmp_path, tagged_stream):
    from pyspark.sql import functions as F

    epoch0 = tagged_stream.filter(F.col("epoch") == 0).withColumn(
        "table",
        F.when(F.col("seq") % 3 == 0, F.lit(None).cast("string")).otherwise(
            F.col("table")
        ),
    )
    n_null = epoch0.filter(F.col("table").isNull()).count()
    tables = {
        "pages_a": ParquetLakeTable(spark, str(tmp_path / "na")),
        "pages_b": ParquetLakeTable(spark, str(tmp_path / "nb")),
    }
    rep = route_epoch(tables, epoch0, 0)
    assert rep["unrouted_rows"] == n_null > 0
    with pytest.raises(ValueError):
        route_epoch(
            {"pages_a": ParquetLakeTable(spark, str(tmp_path / "sa"))},
            epoch0, 0, strict=True,
        )


# ---------------------------------------------------------------------------
# catalog-atomic routing (route_epoch_atomic): cross-table visibility
# flips in ONE catalog pointer move
# ---------------------------------------------------------------------------

def _mk_catalog(spark, tmp_path):
    from embulk_spark.streaming.catalog import LakeCatalog

    cat = LakeCatalog(spark, str(tmp_path / "cat"))
    cat.create_table("pages_a")
    cat.create_table("pages_b")
    return cat


def test_route_atomic_matches_plain_route(spark, tmp_path, tagged_stream):
    from embulk_spark.streaming.replay import route_epoch_atomic

    cat = _mk_catalog(spark, tmp_path)
    control = _mk_tables(spark, tmp_path / "control")
    for e in range(N_EPOCHS):
        epoch = tagged_stream.filter(F.col("epoch") == e)
        rep = route_epoch_atomic(cat, epoch, e)
        assert rep["unrouted_rows"] == 0
        assert set(rep["commit"]["pins"]) == {"pages_a", "pages_b"}
        route_epoch(control, epoch, e)
    for name in ("pages_a", "pages_b"):
        got = {
            (r.url, r.seq)
            for r in cat.read(name).select("url", "seq").collect()
        }
        want = {
            (r.url, r.seq)
            for r in control[name].published().select("url", "seq").collect()
        }
        assert got == want


def test_route_atomic_snapshot_isolation_and_redelivery(
    spark, tmp_path, tagged_stream
):
    from embulk_spark.streaming.replay import route_epoch_atomic

    cat = _mk_catalog(spark, tmp_path)
    e0 = tagged_stream.filter(F.col("epoch") == 0)
    before = cat.snapshot()
    v_before = cat.catalog_version()
    route_epoch_atomic(cat, e0, 0)
    # a snapshot captured BEFORE the flip still reads the empty tables —
    # no torn cross-table window ever existed
    assert before.read("pages_a").count() == 0
    assert before.read("pages_b").count() == 0
    assert cat.read("pages_a").count() > 0
    # re-delivery of the committed epoch: every table skips, data stable
    n_a = cat.read("pages_a").count()
    rep = route_epoch_atomic(cat, e0, 0)
    assert all(
        m.get("skipped_duplicate_epoch") for m in rep["tables"].values()
    )
    assert cat.read("pages_a").count() == n_a
    assert cat.catalog_version() >= v_before + 1


def test_route_atomic_audit_blocks_every_table(spark, tmp_path, tagged_stream):
    import pytest as _pytest

    from embulk_spark.streaming.replay import route_epoch_atomic

    cat = _mk_catalog(spark, tmp_path)
    e0 = tagged_stream.filter(F.col("epoch") == 0)
    with _pytest.raises(ValueError, match="audit"):
        route_epoch_atomic(
            cat, e0, 0,
            audit_rules={"pages_a": [
                # impossible rule: every row violates → audit fails
                {"check": "expr", "expr": "url IS NULL", "name": "no_rows"},
            ]},
        )
    # NOTHING became visible in either table
    assert cat.read("pages_a").count() == 0
    assert cat.read("pages_b").count() == 0
    # roll the intent forward after the bad rule is retired
    cat.recover()
    assert cat.read("pages_a").count() > 0
    assert cat.read("pages_b").count() > 0


def test_cli_route_catalog_atomic(spark, tmp_path, tagged_stream, capsys):
    import json as _json

    from embulk_spark import cli
    from embulk_spark.streaming.catalog import LakeCatalog

    events_dir = str(tmp_path / "ev")
    tagged_stream.write.parquet(events_dir)
    cat_dir = str(tmp_path / "cat")
    rc = cli.main([
        "replay", events_dir, "ignored",
        "--route", _json.dumps({"pages_a": "x", "pages_b": "y"}),
        "--route-catalog", cat_dir, "--master", "local[4]",
    ])
    assert rc == 0
    lines = [l for l in capsys.readouterr().out.splitlines()
             if l.startswith("{")]
    assert len(lines) == N_EPOCHS
    assert all("commit" in _json.loads(l) for l in lines)
    cat = LakeCatalog(spark, cat_dir)
    got = (
        cat.read("pages_a").count() + cat.read("pages_b").count()
    )
    control = _mk_tables(spark, tmp_path / "ctrl")
    for e in range(N_EPOCHS):
        route_epoch(
            control, tagged_stream.filter(F.col("epoch") == e).drop("epoch"), e
        )
    want = sum(t.published().count() for t in control.values())
    assert got == want


# ---------------------------------------------------------------------------
# routed CLI epoch discovery: partition listing, not a Spark job
# ---------------------------------------------------------------------------

def test_list_epoch_partitions_is_pure_fs(tmp_path):
    """Epoch list comes from ONE os.listdir of the epoch=-partitioned
    log — no Spark session, no job — and falls back to None for logs
    not laid out that way."""
    import os

    from embulk_spark.streaming.replay import list_epoch_partitions

    d = tmp_path / "ev"
    for e in (3, 0, 11):
        os.makedirs(d / f"epoch={e}")
    assert list_epoch_partitions(str(d)) == [0, 3, 11]
    # unpartitioned dir → None (caller falls back to a distinct scan)
    flat = tmp_path / "flat"
    os.makedirs(flat)
    (flat / "part-0.parquet").write_bytes(b"")
    assert list_epoch_partitions(str(flat)) is None
    assert list_epoch_partitions(str(tmp_path / "missing")) is None
    # a malformed epoch= dir disqualifies the fast path entirely
    os.makedirs(d / "epoch=__HIVE_DEFAULT_PARTITION__")
    assert list_epoch_partitions(str(d)) is None


def test_cli_route_replay_partitioned_log(spark, tmp_path, tagged_stream, capsys):
    """Routed replay over an epoch=-partitioned log: same final state as
    the flat-log path, with the epoch list derived from the partition
    layout."""
    import json

    from embulk_spark import cli
    from embulk_spark.streaming.lake import ParquetLakeTable

    events_dir = str(tmp_path / "evp")
    tagged_stream.write.partitionBy("epoch").parquet(events_dir)
    routes = {"pages_a": str(tmp_path / "pa"), "pages_b": str(tmp_path / "pb")}
    rc = cli.main([
        "replay", events_dir, "ignored",
        "--route", json.dumps(routes), "--master", "local[4]",
    ])
    assert rc == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    assert len(lines) == N_EPOCHS
    a = ParquetLakeTable(spark, routes["pages_a"])
    assert set(a.committed_epochs()) == set(range(N_EPOCHS))
