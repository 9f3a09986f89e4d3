"""transformWithStateInPandas v2 stateful tracker: must match the v1
``applyInPandasWithState`` operator row-for-row on the same stream,
survive a checkpoint restart, and honor initial-state bootstrap (known
urls are not first_seen; stale events lose to bootstrapped winners)."""

from __future__ import annotations

import importlib.util

import pytest
from pyspark.sql import functions as F

# transformWithStateInPandas speaks protobuf to the JVM state server;
# the wheel isn't baked into this container (same gating as the Iceberg
# runtime jars in test_iceberg.py). The operator contract is still
# pinned: the fold is byte-identical to state._update_url_state, which
# the v1 suite covers on the same streams.
def _has_protobuf() -> bool:
    try:
        return importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        return False


pytestmark = pytest.mark.skipif(
    not _has_protobuf(),
    reason="protobuf not installed (transformWithState state-server protocol)",
)

from embulk_spark.operators.merge import dedup_latest
from embulk_spark.sources.events import change_stream
from embulk_spark.streaming.state import latest_state, track_url_state
from embulk_spark.streaming.tws import track_url_state_tws


def _rows(df, cols=("url", "ts_us", "seq", "is_deleted", "n_events")):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_tws_matches_v1_and_batch(spark, tmp_path):
    events = change_stream(spark, 1500, 200, 3, num_partitions=4).cache()
    src = str(tmp_path / "src")
    events.filter("epoch < 2").coalesce(1).write.mode("append").parquet(src)

    track_url_state(spark, src, str(tmp_path / "c1"), str(tmp_path / "v1"))
    track_url_state_tws(spark, src, str(tmp_path / "c2"), str(tmp_path / "v2"))

    # restart both from their checkpoints with one more epoch appended
    events.filter("epoch >= 2").coalesce(1).write.mode("append").parquet(src)
    track_url_state(spark, src, str(tmp_path / "c1"), str(tmp_path / "v1"))
    track_url_state_tws(spark, src, str(tmp_path / "c2"), str(tmp_path / "v2"))

    v1 = latest_state(spark, str(tmp_path / "v1"))
    v2 = latest_state(spark, str(tmp_path / "v2"))
    assert _rows(v1) == _rows(v2)

    truth = dedup_latest(
        events.filter("op <> 'S'").select("url", "warc_ts", "seq", "op")
    )
    want = {(r["url"], r["seq"], r["op"] == "D") for r in truth.collect()}
    got = {(r["url"], r["seq"], r["is_deleted"]) for r in v2.collect()}
    assert got == want


def test_tws_initial_state_bootstrap(spark, tmp_path):
    events = change_stream(spark, 1200, 150, 2, num_partitions=4).cache()
    # "already-ingested" winners = final state of epoch 0
    seed = (
        dedup_latest(
            events.filter("epoch = 0 and op <> 'S'").select(
                "url", "warc_ts", "seq", "op"
            )
        )
        .withColumn("is_deleted", F.col("op") == "D")
        .select("url", "warc_ts", "seq", "is_deleted")
        .cache()
    )
    src = str(tmp_path / "src")
    events.filter("epoch = 1").coalesce(1).write.mode("append").parquet(src)
    out = str(tmp_path / "log")
    track_url_state_tws(
        spark, src, str(tmp_path / "c"), out, initial_state=seed
    )
    log = spark.read.parquet(out)

    # urls seeded from the table must never be flagged first_seen
    seeded = {r["url"] for r in seed.collect()}
    bad = [r for r in log.collect() if r["first_seen"] and r["url"] in seeded]
    assert bad == []

    # final winners == batch dedup over seed ∪ epoch-1 events: a stale
    # epoch-1 event must not beat a newer bootstrapped winner
    combined = seed.select(
        "url", "warc_ts", "seq",
        F.when(F.col("is_deleted"), F.lit("D")).otherwise(F.lit("U")).alias("op"),
    ).unionByName(
        events.filter("epoch = 1 and op <> 'S'").select(
            "url", "warc_ts", "seq", "op"
        )
    )
    want = {
        (r["url"], r["seq"], r["op"] == "D")
        for r in dedup_latest(combined).collect()
    }
    # winners that changed during epoch 1 come from the log; the rest
    # stay at their seeded value (bootstrap emits nothing — correct)
    final = latest_state(spark, out)
    got = {(r["url"], r["seq"], r["is_deleted"]) for r in final.collect()}
    untouched = {
        (r["url"], r["seq"], r["is_deleted"])
        for r in seed.collect()
        if r["url"] not in {g[0] for g in got}
    }
    assert got | untouched == want
