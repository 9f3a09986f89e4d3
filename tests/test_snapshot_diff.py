"""snapshot_diff / apply_snapshot: CDC from periodic full dumps — the
diff IS the binlog. Unchanged rows emit nothing, changed/new rows become
updates, missing rows become deletes, tombstoned rows resurrect when the
dump carries them again; all through the idempotent epoch path.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from embulk_spark.operators.merge import snapshot_diff
from embulk_spark.streaming.lake import ParquetLakeTable

TS = dt.datetime(2024, 1, 1)


def _ts(h):
    return TS + dt.timedelta(hours=h)


SNAP_DDL = ("url string, warc_ts timestamp, html binary, text string, "
            "lang string")


def _seed(spark, path):
    table = ParquetLakeTable(spark, path, n_buckets=2,
                             compact_min_deltas=10_000)
    base = spark.createDataFrame(
        [
            ("http://same", _ts(0), b"<p>same</p>", None, "en"),
            ("http://chg", _ts(0), b"<p>old</p>", None, "en"),
            ("http://gone", _ts(0), b"<p>bye</p>", None, "en"),
        ],
        SNAP_DDL,
    )
    table.bulk_import(base, epoch_id=0)
    return table


def _crawl(spark):
    return spark.createDataFrame(
        [
            # identical content, newer crawl ts → must emit nothing
            ("http://same", _ts(5), b"<p>same</p>", None, "en"),
            ("http://chg", _ts(5), b"<p>new</p>", None, "en"),
            ("http://born", _ts(5), b"<p>hi</p>", None, "de"),
            # dup within the crawl: (warc_ts, seq)-latest wins
            ("http://born", _ts(4), b"<p>stale dup</p>", None, "de"),
        ],
        SNAP_DDL,
    )


def test_diff_emits_only_real_changes(spark, tmp_path):
    table = _seed(spark, str(tmp_path / "t"))
    events = snapshot_diff(
        table.published(), _crawl(spark),
        compare=("html",), delete_ts="2024-01-02 00:00:00",
    ).collect()
    by_url = {r["url"]: r for r in events}
    assert set(by_url) == {"http://chg", "http://born", "http://gone"}
    assert by_url["http://chg"]["op"] == "U"
    assert bytes(by_url["http://born"]["html"]) == b"<p>hi</p>"
    assert by_url["http://gone"]["op"] == "D"
    assert by_url["http://gone"]["warc_ts"] == dt.datetime(2024, 1, 2)


def test_apply_snapshot_converges_to_dump_state(spark, tmp_path):
    table = _seed(spark, str(tmp_path / "t"))
    out = table.apply_snapshot(
        _crawl(spark), epoch_id=1, delete_ts="2024-01-02 00:00:00",
    )
    assert out["snapshot_diff"] and out["keys_in_batch"] == 3
    pub = {r["url"]: r for r in table.published().collect()}
    assert set(pub) == {"http://same", "http://chg", "http://born"}
    assert pub["http://chg"]["text"] == "new"
    assert pub["http://born"]["text"] == "hi"
    # the unchanged row kept its ORIGINAL version (no churn)
    assert pub["http://same"]["warc_ts"] == _ts(0)
    # idempotent: re-delivering the same dump epoch skips
    again = table.apply_snapshot(
        _crawl(spark), epoch_id=1, delete_ts="2024-01-02 00:00:00",
    )
    assert again["skipped_duplicate_epoch"]
    # a second identical crawl as a NEW epoch emits an empty batch
    out2 = table.apply_snapshot(
        _crawl(spark).withColumn(
            "warc_ts", F.col("warc_ts") + F.expr("INTERVAL 10 HOURS")
        ),
        epoch_id=2, delete_ts="2024-01-03 00:00:00",
    )
    assert out2.get("empty_batch") or out2.get("keys_in_batch") == 0


def test_apply_snapshot_resurrects_after_delete(spark, tmp_path):
    table = _seed(spark, str(tmp_path / "t"))
    table.apply_snapshot(
        _crawl(spark), epoch_id=1, delete_ts="2024-01-02 00:00:00",
    )
    # http://gone is tombstoned; the next crawl carries it again
    back = spark.createDataFrame(
        [("http://gone", _ts(40), b"<p>back</p>", None, "en")], SNAP_DDL
    )
    table.apply_snapshot(
        back, epoch_id=2, delete_ts="2024-01-05 00:00:00",
    )
    pub = {r["url"]: r for r in table.published().collect()}
    assert pub["http://gone"]["text"] == "back"
    # everything else vanished from the dump → deleted
    assert set(pub) == {"http://gone"}


def test_compare_on_text_without_html(spark, tmp_path):
    table = ParquetLakeTable(spark, str(tmp_path / "t"), n_buckets=2,
                             compact_min_deltas=10_000)
    ddl = "url string, warc_ts timestamp, text string"
    table.bulk_import(
        spark.createDataFrame([("u://1", _ts(0), "alpha")], ddl),
        epoch_id=0, extract=False,
    )
    dump = spark.createDataFrame(
        [("u://1", _ts(1), "alpha"), ("u://2", _ts(1), "beta")], ddl
    )
    out = table.apply_snapshot(
        dump, epoch_id=1, compare=("text",), extract=False,
        missing_as_delete=False,
    )
    assert out["keys_in_batch"] == 1  # only u://2 is new
    pub = {r["url"]: r["text"] for r in table.published().collect()}
    assert pub == {"u://1": "alpha", "u://2": "beta"}


def test_read_project_matches_post_hoc_digest(spark, tmp_path):
    """read(project=) computes expressions on raw rows BELOW the MOR
    dedup; the winner's projected value must equal computing the same
    expression on the fully-merged row (same winner, same bytes)."""
    table = _seed(spark, str(tmp_path / "t"))
    table.apply_snapshot(
        _crawl(spark), epoch_id=1, delete_ts="2024-01-02 00:00:00",
    )
    fast = {
        (r["url"], r["_digest"], r["is_deleted"])
        for r in table.read(
            project={"_digest": F.xxhash64(F.col("html"))}
        ).collect()
    }
    slow = {
        (r["url"], r["_digest"], r["is_deleted"])
        for r in table.read()
        .withColumn("_digest", F.xxhash64(F.col("html")))
        .collect()
    }
    assert fast == slow and len(fast) > 0


def test_missing_delete_ts_fails_fast(spark, tmp_path):
    table = _seed(spark, str(tmp_path / "t"))
    with pytest.raises(ValueError, match="delete_ts"):
        snapshot_diff(table.published(), _crawl(spark))


def test_cli_snapshot_apply(spark, tmp_path, capsys):
    import json

    from embulk_spark import cli

    path = str(tmp_path / "t")
    _seed(spark, path)
    dump_dir = str(tmp_path / "dump")
    _crawl(spark).write.parquet(dump_dir)
    rc = cli.main([
        "snapshot-apply", path, dump_dir, "--epoch", "1",
        "--delete-ts", "2024-01-02 00:00:00", "--assume-unique",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["snapshot_diff"] and out["keys_in_batch"] == 3
    table = ParquetLakeTable(spark, path)
    assert {r["url"] for r in table.published().collect()} == {
        "http://same", "http://chg", "http://born"
    }


# --- property: ANY dump sequence converges to the last dump ---------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@st.composite
def dump_sequences(draw):
    """2-3 successive full dumps over a tiny url universe: per dump each
    url is absent, or carries one of a few possible contents — covering
    change/no-change/delete/resurrect transitions."""
    n_urls = draw(st.integers(2, 5))
    n_dumps = draw(st.integers(2, 3))
    dumps = []
    for d in range(n_dumps):
        rows = []
        for u in range(n_urls):
            present = draw(st.booleans())
            if not present:
                continue
            content = draw(st.integers(0, 2))
            rows.append((
                f"u://{u}",
                _ts(10 * d + 1),
                f"<p>c{content}</p>".encode(),
                None,
                "en",
            ))
        dumps.append(rows)
    return dumps


@pytest.mark.filterwarnings("ignore")
@settings(max_examples=5, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(dump_sequences())
def test_any_dump_sequence_converges_to_last_dump(
    spark, tmp_path_factory, dumps
):
    tmp = tmp_path_factory.mktemp("snapprop")
    table = ParquetLakeTable(spark, str(tmp / "t"), n_buckets=2,
                             compact_min_deltas=2, compact_ratio=0.0)
    for i, rows in enumerate(dumps):
        dump = spark.createDataFrame(rows, SNAP_DDL)
        table.apply_snapshot(
            dump, epoch_id=i, assume_unique=True,
            delete_ts=str(_ts(10 * i + 2)),
        )
    want = sorted(
        (r[0], r[2]) for r in dumps[-1]
    )
    got = sorted(
        (r["url"], bytes(r["html"]))
        for r in table.published().collect()
    )
    assert got == want
