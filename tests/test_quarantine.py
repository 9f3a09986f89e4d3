"""Quarantine (dead-letter) path: invalid events divert per epoch with
named violations; final state excludes them; idempotence holds across
duplicate delivery and resume."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from embulk_spark.streaming.lake import ParquetLakeTable
from embulk_spark.streaming.replay import (
    apply_epoch,
    quarantine_df,
    replay_batches,
)

RULES = [
    {"column": "url", "check": "not_null"},
    {"column": "url", "check": "regex", "pattern": "^https?://"},
    {"column": "op", "check": "in_set", "values": ["U", "D"]},
]


def _events(spark):
    def ev(seq, epoch, url, op="U", v=1):
        return Row(
            seq=seq, op=op, url=url,
            warc_ts=datetime(2024, 1, 1, 0, 0, seq % 60), html=None,
            lang="en", epoch=epoch,
        )

    rows = [
        ev(1, 0, "http://a.com/1"),
        ev(2, 0, None),                      # not_null violation
        ev(3, 0, "garbage-no-scheme"),       # regex violation
        ev(4, 0, "http://b.com/2"),
        ev(5, 1, "http://a.com/1"),
        ev(6, 1, "http://c.com/3", op="X"),  # in_set violation
        ev(7, 1, "http://c.com/3"),
    ]
    return spark.createDataFrame(
        rows,
        "seq BIGINT, op STRING, url STRING, warc_ts TIMESTAMP, "
        "html BINARY, lang STRING, epoch BIGINT",
    )


def test_quarantine_diverts_and_state_excludes(spark, tmp_path):
    ev = _events(spark)
    t = ParquetLakeTable(spark, str(tmp_path / "t"), n_buckets=4)
    out = replay_batches(t, ev, quarantine_rules=RULES)
    by_epoch = {m["epoch_id"]: m for m in out}
    assert by_epoch[0]["quarantined_rows"] == 2
    assert by_epoch[1]["quarantined_rows"] == 1
    # valid rows merged
    urls = {r.url for r in t.published().collect()}
    assert urls == {"http://a.com/1", "http://b.com/2", "http://c.com/3"}
    # offenders carry the failing rule names and their epoch
    q = quarantine_df(t)
    got = {(r.seq, tuple(r._violations), r._epoch) for r in q.collect()}
    assert got == {
        # NULL passes regex/in_set by design (not_null's job), so seq 2
        # carries exactly the not_null violation
        (2, ("url:not_null",), 0),
        (3, ("url:regex",), 0),
        (6, ("op:in_set",), 1),
    }


def test_quarantine_idempotent_on_duplicate_delivery(spark, tmp_path):
    ev = _events(spark)
    t = ParquetLakeTable(spark, str(tmp_path / "t"), n_buckets=4)
    replay_batches(t, ev, quarantine_rules=RULES)
    n_before = quarantine_df(t).count()
    # duplicate epoch delivery: skipped commit AND no quarantine growth
    m = apply_epoch(t, ev.filter(F.col("epoch") == 0), 0,
                    quarantine_rules=RULES)
    assert m.get("skipped_duplicate_epoch")
    assert quarantine_df(t).count() == n_before
    # resume with a fresh handle re-runs nothing
    t2 = ParquetLakeTable(spark, str(tmp_path / "t"), n_buckets=4)
    out = replay_batches(t2, ev, quarantine_rules=RULES)
    assert out == []
    assert quarantine_df(t2).count() == n_before


def test_quarantine_rejects_unique_rule_and_clean_epochs_sparse(spark, tmp_path):
    ev = _events(spark).filter(F.col("seq").isin(1, 4))  # all valid
    t = ParquetLakeTable(spark, str(tmp_path / "t"), n_buckets=4)
    out = replay_batches(t, ev, quarantine_rules=RULES)
    assert out[0]["quarantined_rows"] == 0
    assert quarantine_df(t) is None  # no offenders -> no directory
    with pytest.raises(ValueError, match="unique"):
        replay_batches(
            t, ev, quarantine_rules=[{"column": "url", "check": "unique"}]
        )


def test_cli_replay_with_quarantine_rules(spark, tmp_path, capsys):
    import json

    from embulk_spark import cli

    ev = _events(spark)
    events_dir = str(tmp_path / "events")
    ev.write.partitionBy("epoch").parquet(events_dir)
    table_dir = str(tmp_path / "t")
    rc = cli.main([
        "replay", events_dir, table_dir, "--buckets", "4",
        "--quarantine-rules", json.dumps(RULES),
    ])
    assert rc == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert {m["epoch_id"]: m["quarantined_rows"] for m in lines} == {0: 2, 1: 1}
    t = ParquetLakeTable(spark, table_dir, n_buckets=4)
    assert quarantine_df(t).count() == 3


def test_requeue_quarantined_with_fix(spark, tmp_path):
    """DLQ redrive: fix the offenders, re-apply as a new epoch, source
    quarantine dirs drain, state picks up only the repaired rows that
    pass the rules — and a repaired OLD event can't clobber newer state."""
    from embulk_spark.streaming.replay import requeue_quarantined

    ev = _events(spark)
    t = ParquetLakeTable(spark, str(tmp_path / "t"), n_buckets=4)
    replay_batches(t, ev, quarantine_rules=RULES)
    assert quarantine_df(t).count() == 3

    def fix(df):
        # producer-side repair: null urls get a synthetic url, scheme-less
        # urls get a scheme, bogus ops become updates
        return df.withColumn(
            "url",
            F.when(F.col("url").isNull(), F.lit("http://fixed.example/null"))
            .when(~F.col("url").rlike("^https?://"),
                  F.concat(F.lit("http://"), F.col("url")))
            .otherwise(F.col("url")),
        ).withColumn(
            "op", F.when(~F.col("op").isin("U", "D"), F.lit("U"))
            .otherwise(F.col("op")),
        )

    out = requeue_quarantined(t, 99, fix=fix, rules=RULES)
    assert out["requeued_from_epochs"] == [0, 1]
    assert out.get("quarantined_rows") == 0
    assert quarantine_df(t) is None  # drained
    urls = {r.url for r in t.published().collect()}
    assert "http://fixed.example/null" in urls
    assert "http://garbage-no-scheme" in urls
    # seq 6 (op X -> U at c.com/3) is OLDER than the applied seq 7 winner:
    # the redrive must not regress that key
    c3 = [r for r in t.published().collect() if r.url == "http://c.com/3"]
    assert c3[0]["seq"] == 7
    assert 99 in t.committed_epochs()

    # duplicate redrive: nothing left, no-op
    again = requeue_quarantined(t, 100, rules=RULES)
    assert again["requeued_from_epochs"] == []


def test_requeue_still_invalid_rows_requarantine(spark, tmp_path):
    from embulk_spark.streaming.replay import requeue_quarantined

    ev = _events(spark)
    t = ParquetLakeTable(spark, str(tmp_path / "t"), n_buckets=4)
    replay_batches(t, ev, quarantine_rules=RULES)
    # no fix: every offender fails the same rules again and moves to the
    # new epoch's quarantine (nothing merges, nothing is lost)
    out = requeue_quarantined(t, 99, rules=RULES)
    assert out["quarantined_rows"] == 3
    q = quarantine_df(t)
    assert q.count() == 3
    assert {int(r["_epoch"]) for r in q.collect()} == {99}
