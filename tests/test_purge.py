"""Physical right-to-be-forgotten (lake.purge_keys): every stored
version of the purged keys must leave the DISK — base, deltas, history,
quarantine — while untouched buckets carry by reference and concurrent
correctness (time travel gone, feed invalidated) follows the documented
contract."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from embulk_spark.sources.events import change_stream
from embulk_spark.streaming.lake import ParquetLakeTable
from embulk_spark.streaming.replay import replay_batches


def _grep_parquet_for(table_path: str, needle: bytes) -> list[str]:
    """Raw byte scan of every parquet file under the table: a purged url
    must not appear in ANY file (uncompressed-page string columns keep
    plaintext; snappy keeps long literals verbatim — good enough to
    catch retained copies)."""
    hits = []
    for root, _dirs, files in os.walk(table_path):
        for fn in files:
            if not fn.endswith(".parquet"):
                continue
            p = os.path.join(root, fn)
            with open(p, "rb") as f:
                if needle in f.read():
                    hits.append(os.path.relpath(p, table_path))
    return hits


@pytest.fixture()
def loaded(spark, tmp_path):
    events = change_stream(spark, 1500, 200, 3, num_partitions=4)
    table = ParquetLakeTable(spark, str(tmp_path / "t"), n_buckets=8,
                             compact_min_deltas=10_000)
    replay_batches(table, events)
    table.compact()  # a bucketed base exists → cold buckets can carry
    return table


def test_purge_removes_bytes_and_keeps_rest(spark, loaded):
    table = loaded
    victims = [r["url"] for r in
               table.published().select("url").limit(3).collect()]
    before = {r["url"] for r in table.published().select("url").collect()}
    pre_files = {e["path"] for e in table.files()}

    rep = table.purge_keys(victims)
    assert rep["purged_keys"] == 3

    after = {r["url"] for r in table.published().select("url").collect()}
    assert after == before - set(victims)
    # the bytes are gone from every remaining parquet file
    for u in victims:
        assert _grep_parquet_for(table.path, u.encode()) == []
    # cold buckets carried by reference (not a full rewrite)
    post_files = {e["path"] for e in table.files()}
    assert pre_files & post_files, "purge must not rewrite cold buckets"
    # pre-purge snapshots are gone: no time travel back to the keys
    with pytest.raises(Exception):
        table.snapshot_at(1)


def test_purge_blocks_on_tags_then_drops(spark, loaded):
    table = loaded
    victims = [r["url"] for r in
               table.published().select("url").limit(1).collect()]
    table.tag("audit-2024")
    with pytest.raises(ValueError, match="tags"):
        table.purge_keys(victims)
    rep = table.purge_keys(victims, drop_tags=True)
    assert rep["tags_dropped"] == ["audit-2024"]
    assert table.tags() == {}
    assert _grep_parquet_for(table.path, victims[0].encode()) == []


def test_purge_rewrites_quarantine(spark, tmp_path):
    from embulk_spark.streaming.replay import apply_epoch

    events = change_stream(spark, 600, 80, 1, num_partitions=2)
    table = ParquetLakeTable(spark, str(tmp_path / "t"), n_buckets=4,
                             compact_min_deltas=10_000)
    # dead-letter every event whose html is NULL (deletes) so the
    # quarantine holds real urls
    apply_epoch(
        table, events.filter("epoch = 0"), 0,
        quarantine_rules=[{"column": "html", "check": "not_null"}],
    )
    qdir = os.path.join(table.path, "quarantine")
    assert os.path.isdir(qdir)
    qurls = {
        r["url"]
        for r in spark.read.parquet(os.path.join(qdir, "e00000000"))
        .select("url").collect()
    }
    assert qurls
    victim = sorted(qurls)[0]
    rep = table.purge_keys([victim])
    assert rep["quarantine_rewritten"] == ["e00000000"]
    left = {
        r["url"]
        for r in spark.read.parquet(os.path.join(qdir, "e00000000"))
        .select("url").collect()
    }
    assert victim not in left and left == qurls - {victim}
    assert _grep_parquet_for(table.path, victim.encode()) == []


def test_purge_with_pending_deltas_folds_them(spark, tmp_path):
    """Victim rows living only in un-compacted delta groups must go too,
    and the purge invalidates pre-purge feed cursors."""
    events = change_stream(spark, 1000, 120, 2, num_partitions=2)
    table = ParquetLakeTable(spark, str(tmp_path / "t"), n_buckets=4,
                             compact_min_deltas=10_000)
    replay_batches(table, events)
    assert table.current_snapshot()["deltas"], "fixture needs pending deltas"
    victims = [r["url"] for r in
               table.published().select("url").limit(2).collect()]
    table.purge_keys(victims)
    for u in victims:
        assert _grep_parquet_for(table.path, u.encode()) == []
    # the change feed can never replay the purged rows: the fold either
    # invalidates the cursor (raise) or serves a feed without them
    try:
        feed = table.changes_between(0, 1)
        assert feed.filter(F.col("url").isin(victims)).count() == 0
    except Exception:
        pass  # cursor-too-old is equally compliant


def test_side_index_purge_cascade(spark, tmp_path):
    """Signature and term indexes hold derived rows keyed by the doc id;
    the purge cascade removes every stored row of the ids from every
    epoch dir, keeps other docs intact, and preserves empty commit
    markers (committed_epochs unchanged)."""
    from embulk_spark.operators.incremental import SignatureIndex
    from embulk_spark.operators.termindex import TermIndex

    docs0 = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "the lazy dog")],
        "doc_id long, text string",
    )
    docs1 = spark.createDataFrame(
        [(3, "quick quick dog")], "doc_id long, text string"
    )
    empty = spark.createDataFrame([], "doc_id long, text string")

    sig = SignatureIndex(spark, str(tmp_path / "sig"), k=8, bands=2)
    term = TermIndex(spark, str(tmp_path / "ti"), id_col="doc_id",
                     id_type="bigint")
    for idx in (sig, term):
        idx.update_epoch(docs0, "text", 0)
        idx.update_epoch(docs1, "text", 1)
        idx.update_epoch(empty, "text", 2)

    rep = sig.purge_ids([1])
    assert rep["epochs_rewritten"] == [0]
    assert {r["doc_id"] for r in sig.signatures().collect()} == {2, 3}
    assert sig.committed_epochs() == {0, 1, 2}

    rep = term.purge_ids([1, 3])
    assert rep["epochs_rewritten"] == [0, 1]
    assert {r["id"] for r in term.live_docs().collect()} == {2}
    assert term.committed_epochs() == {0, 1, 2}
    # derived rows of the ids are gone from the delta files themselves
    for idx_path in ("sig", "ti"):
        root = str(tmp_path / idx_path / "deltas")
        df = spark.read.option("basePath", root).parquet(root)
        if idx_path == "sig":
            assert df.filter(F.col("doc_id") == 1).count() == 0
        else:
            assert df.filter(F.col("id").isin([1, 3])).count() == 0


def test_purge_refuses_staged_epochs(spark, tmp_path):
    """A staged WAP change-set could re-publish the purged keys after the
    purge reported success — the purge must refuse instead."""
    import datetime as dt

    table = ParquetLakeTable(spark, str(tmp_path / "t"), n_buckets=2,
                             compact_min_deltas=10_000)
    ev = spark.createDataFrame(
        [(1, "U", "http://a", dt.datetime(2024, 1, 1), b"<p>x</p>", "en",
          None)],
        "seq long, op string, url string, warc_ts timestamp, html binary, "
        "lang string, schema_change string",
    )
    table.merge_epoch(ev, 0)
    table.merge_epoch(
        ev.withColumn("seq", F.col("seq") + 1), 1, stage=True
    )
    with pytest.raises(ValueError, match="staged"):
        table.purge_keys(["http://a"])
    # abort the stage → purge proceeds
    table.abort_staged(1)
    rep = table.purge_keys(["http://a"])
    assert rep["purged_keys"] == 1
    assert _grep_parquet_for(table.path, b"http://a") == []


def test_quarantine_purge_keeps_null_url_rows(spark, tmp_path):
    """NULL-url dead-letter rows are unrelated telemetry; the purge
    rewrite must keep them (three-valued ~isin would drop them)."""
    import datetime as dt

    from embulk_spark.streaming.replay import apply_epoch

    table = ParquetLakeTable(spark, str(tmp_path / "t"), n_buckets=2,
                             compact_min_deltas=10_000)
    ts = dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [
            (1, "U", "http://victim", ts, None, "en", None),   # html null
            (2, "U", None, ts, b"<p>ok</p>", "en", None),      # url null
            (3, "U", "http://keep", ts, b"<p>ok</p>", "en", None),
        ],
        "seq long, op string, url string, warc_ts timestamp, html binary, "
        "lang string, schema_change string",
    )
    apply_epoch(
        table, ev, 0,
        quarantine_rules=[
            {"column": "url", "check": "not_null"},
            {"column": "html", "check": "not_null"},
        ],
    )
    qdir = os.path.join(table.path, "quarantine", "e00000000")
    assert spark.read.parquet(qdir).count() == 2  # victim + null-url row
    table.purge_keys(["http://victim"])
    left = spark.read.parquet(qdir).collect()
    assert len(left) == 1 and left[0]["url"] is None


# -- crashed dir-swap recovery (rewrite_dir_excluding) ---------------------


def _mkdir_rows(spark, d, rows):
    spark.createDataFrame(rows, "url string, v long").write.parquet(d)


def test_recover_dir_swap_rolls_forward_between_renames(spark, tmp_path):
    """Crash between rename-aside and rename-in: live dir missing, old
    data in .old<hex>, complete filtered copy in .purge<hex> → roll
    FORWARD to the filtered copy."""
    import os

    from embulk_spark.streaming.lake import recover_dir_swap

    d = str(tmp_path / "ep")
    _mkdir_rows(spark, d, [("a", 1), ("b", 2)])
    _mkdir_rows(spark, d + ".purge0badc0de", [("b", 2)])  # filtered copy
    os.rename(d, d + ".old0badc0de")  # crash after first rename

    recover_dir_swap(d)
    assert {r["url"] for r in spark.read.parquet(d).collect()} == {"b"}
    assert not os.path.exists(d + ".old0badc0de")
    assert not os.path.exists(d + ".purge0badc0de")


def test_recover_dir_swap_cleans_partial_writeaside(spark, tmp_path):
    """Crash during the write-aside (live dir intact, partial .purge):
    the partial copy is garbage and is removed; live data untouched."""
    import os

    from embulk_spark.streaming.lake import recover_dir_swap

    d = str(tmp_path / "ep")
    _mkdir_rows(spark, d, [("a", 1), ("b", 2)])
    os.makedirs(d + ".purgedeadbeef")
    with open(d + ".purgedeadbeef/part-partial.parquet", "wb") as f:
        f.write(b"torn")

    recover_dir_swap(d)
    assert {r["url"] for r in spark.read.parquet(d).collect()} == {"a", "b"}
    assert not os.path.exists(d + ".purgedeadbeef")


def test_recover_dir_swap_rolls_back_orphaned_old(spark, tmp_path):
    """Live dir missing with only an .old sibling (filtered copy lost):
    roll BACK to the original data."""
    import os

    from embulk_spark.streaming.lake import recover_dir_swap

    d = str(tmp_path / "ep")
    _mkdir_rows(spark, d, [("a", 1)])
    os.rename(d, d + ".oldfeedface")

    recover_dir_swap(d)
    assert {r["url"] for r in spark.read.parquet(d).collect()} == {"a"}


def test_purge_epoch_dirs_heals_missing_base_dir(spark, tmp_path):
    """Regression (r3 ADVICE #1): a crash between rename-aside and
    rename-in leaves the epoch dir MISSING with only .old/.purge
    leftovers in the listing. The enumerating caller used to skip
    leftover names without deriving the base path, so the missing dir
    was never rolled forward — its kept rows stayed invisible and later
    purges silently skipped the epoch."""
    import os

    from embulk_spark.operators.incremental import purge_epoch_dirs

    root = str(tmp_path / "deltas")
    os.makedirs(root)
    d = os.path.join(root, "epoch=0")
    _mkdir_rows(spark, d, [("a", 1), ("b", 2), ("c", 3)])
    # crashed swap: filtered copy complete, base dir renamed aside
    _mkdir_rows(spark, d + ".purge0badc0de", [("b", 2), ("c", 3)])
    os.rename(d, d + ".old0badc0de")
    assert not os.path.isdir(d)  # the state the old code never healed

    rewritten = purge_epoch_dirs(spark, root, ["c"], id_col="url")
    assert rewritten == [0]
    assert {r["url"] for r in spark.read.parquet(d).collect()} == {"b"}
    assert [p for p in os.listdir(root) if ".old" in p or ".purge" in p] == []


def test_heal_swap_leftovers_rolls_back_lost_copy(spark, tmp_path):
    """heal_swap_leftovers with only an .old sibling (filtered copy
    lost) rolls the base dir BACK so no rows are lost."""
    import os

    from embulk_spark.streaming.lake import heal_swap_leftovers

    root = str(tmp_path / "q")
    os.makedirs(root)
    d = os.path.join(root, "ep1")
    _mkdir_rows(spark, d, [("a", 1), ("b", 2)])
    os.rename(d, d + ".oldfeedface")

    heal_swap_leftovers(root)
    assert {r["url"] for r in spark.read.parquet(d).collect()} == {"a", "b"}
    assert os.listdir(root) == ["ep1"]


def test_rewrite_dir_excluding_heals_then_purges(spark, tmp_path):
    """A purge re-run over a previously crashed swap heals the dir and
    applies the purge instead of failing on the missing path."""
    import os

    from embulk_spark.streaming.lake import rewrite_dir_excluding

    d = str(tmp_path / "ep")
    _mkdir_rows(spark, d, [("a", 1), ("b", 2), ("c", 3)])
    _mkdir_rows(spark, d + ".purge0badc0de", [("b", 2), ("c", 3)])
    os.rename(d, d + ".old0badc0de")  # crashed mid-swap

    rewrite_dir_excluding(spark, d, "url", ["c"])
    assert {r["url"] for r in spark.read.parquet(d).collect()} == {"b"}
    leftovers = [
        p for p in os.listdir(tmp_path) if ".old" in p or ".purge" in p
    ]
    assert leftovers == []


def test_purge_txn_guard_makes_redelivery_safe(spark, tmp_path):
    """purge_keys(txn_id=...) records completion and skips a redelivery —
    so an at-least-once admin pipeline can never erase data written
    AFTER the purge by blindly re-running it (the crash-fuzz double-
    fault scenario)."""
    import datetime

    from embulk_spark.streaming.lake import ParquetLakeTable

    def ev(spark, e, urls):
        rows = [
            (e * 10 + i, "U", u, datetime.datetime(2026, 6, e, 12, i),
             f"<html>{u} v{e}</html>".encode(), "en")
            for i, u in enumerate(urls)
        ]
        return spark.createDataFrame(
            rows,
            "seq long, op string, url string, warc_ts timestamp, "
            "html binary, lang string",
        )

    t = ParquetLakeTable(spark, str(tmp_path / "t"), n_buckets=4)
    t.merge_epoch(ev(spark, 1, ["a", "b", "c"]), 1)
    r1 = t.purge_keys(["b"], txn_id="gdpr-42")
    assert r1.get("txn_id") == "gdpr-42"
    assert "gdpr-42" in t.purge_txns()
    # the purged key re-enters via a later epoch
    t.merge_epoch(ev(spark, 2, ["b"]), 2)
    # blind redelivery of the SAME purge request: must skip, not erase
    r2 = t.purge_keys(["b"], txn_id="gdpr-42")
    assert r2["skipped_duplicate_txn"]
    urls = {r["url"] for r in t.published().collect()}
    assert urls == {"a", "b", "c"}
    # a NEW txn id is a new request and purges again
    r3 = t.purge_keys(["b"], txn_id="gdpr-43")
    assert not r3.get("skipped_duplicate_txn")
    urls = {r["url"] for r in t.published().collect()}
    assert urls == {"a", "c"}
