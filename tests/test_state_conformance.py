"""Shared conformance suite for the two custom-stateful-streaming
operators (VERDICT r2 item 9): the SAME scenario table runs through

- v1 ``applyInPandasWithState`` (streaming/state.py) — always, asserted
  against the batch ``dedup_latest`` oracle, and
- v2 ``transformWithStateInPandas`` (streaming/tws.py) — when protobuf
  is installed (the state-server protocol needs it; absent in this
  container), asserted row-identical to v1.

The scenario table IS the contract: any environment with protobuf runs
the identical cases for both engines by flipping no code. Scenarios
cover the CDC fold's semantic corners: duplicate delivery, out-of-order
(late older events lose), tombstone-then-revive, seq tie-break at equal
timestamps, and checkpoint restart between epochs.
"""

from __future__ import annotations

import datetime
import importlib.util

import pytest
from pyspark.sql import functions as F

from embulk_spark.operators.merge import dedup_latest
from embulk_spark.sources.events import EVENT_SCHEMA
from embulk_spark.streaming.state import latest_state, track_url_state


def _has_protobuf() -> bool:
    try:
        return importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        return False


def _ts(minute: int) -> datetime.datetime:
    return datetime.datetime(2026, 3, 1, 12, minute, 0)


def _ev(seq, epoch, op, url, minute):
    return (seq, epoch, op, url, _ts(minute), b"<html>x</html>", "en", None)


#: scenario name → list of event rows (seq, epoch, op, url, minute)
SCENARIOS = {
    "basic_winners": [
        _ev(1, 0, "I", "a", 1),
        _ev(2, 0, "U", "a", 2),
        _ev(3, 0, "I", "b", 1),
        _ev(4, 1, "U", "b", 3),
        _ev(5, 1, "I", "c", 2),
    ],
    "duplicate_delivery": [
        _ev(1, 0, "I", "a", 1),
        _ev(2, 0, "U", "a", 2),
        # the whole epoch redelivered verbatim in the next epoch
        _ev(1, 1, "I", "a", 1),
        _ev(2, 1, "U", "a", 2),
    ],
    "out_of_order_late_loser": [
        _ev(5, 0, "U", "a", 9),
        # older ts arrives later — must NOT displace the winner
        _ev(6, 1, "U", "a", 3),
        _ev(7, 1, "U", "b", 1),
    ],
    "tombstone_then_revive": [
        _ev(1, 0, "I", "a", 1),
        _ev(2, 0, "D", "a", 2),
        _ev(3, 1, "U", "a", 5),
        _ev(4, 1, "D", "b", 2),
    ],
    "seq_tiebreak_equal_ts": [
        _ev(1, 0, "I", "a", 4),
        _ev(2, 0, "D", "a", 4),  # same ts, higher seq wins → deleted
        _ev(3, 1, "U", "b", 4),
        _ev(4, 1, "U", "b", 4),
    ],
}


def _write_epochs(spark, rows, src, upto):
    df = spark.createDataFrame(
        [r for r in rows if r[1] < upto], EVENT_SCHEMA
    )
    df.coalesce(1).write.mode("overwrite").parquet(src)


def _run_v1(spark, tmp_path, rows):
    """Run the scenario through applyInPandasWithState with a restart
    between epoch 0 and the rest (checkpoint-resume is part of the
    contract)."""
    src = str(tmp_path / "src")
    ck = str(tmp_path / "ck_v1")
    out = str(tmp_path / "out_v1")
    _write_epochs(spark, rows, src, upto=1)
    track_url_state(spark, src, ck, out)
    _write_epochs(spark, rows, src, upto=10)
    track_url_state(spark, src, ck, out)
    return latest_state(spark, out)


def _run_tws(spark, tmp_path, rows):
    from embulk_spark.streaming.tws import track_url_state_tws

    src = str(tmp_path / "src2")
    ck = str(tmp_path / "ck_v2")
    out = str(tmp_path / "out_v2")
    _write_epochs(spark, rows, src, upto=1)
    track_url_state_tws(spark, src, ck, out)
    _write_epochs(spark, rows, src, upto=10)
    track_url_state_tws(spark, src, ck, out)
    return latest_state(spark, out)


def _final(df):
    return sorted(
        (r["url"], r["ts_us"], r["seq"], r["is_deleted"])
        for r in df.collect()
    )


def _oracle(spark, rows):
    import numpy as np

    events = spark.createDataFrame(rows, EVENT_SCHEMA)
    truth = dedup_latest(
        events.filter("op <> 'S'").select("url", "warc_ts", "seq", "op")
    )
    # µs via the same numpy conversion the v1 fold applies (naive wall
    # clock, no local-tz reinterpretation)
    return sorted(
        (
            r["url"],
            int(
                np.datetime64(
                    r["warc_ts"].replace(tzinfo=None), "us"
                ).astype("int64")
            ),
            r["seq"],
            r["op"] == "D",
        )
        for r in truth.collect()
    )


@pytest.mark.parametrize("name", sorted(SCENARIOS))
def test_v1_conformance_vs_batch_oracle(spark, tmp_path, name):
    rows = SCENARIOS[name]
    got = _final(_run_v1(spark, tmp_path, rows))
    assert got == _oracle(spark, rows), name


@pytest.mark.skipif(
    not _has_protobuf(),
    reason="protobuf not installed (transformWithState state-server "
    "protocol); the identical scenario table runs both engines wherever "
    "protobuf exists",
)
@pytest.mark.parametrize("name", sorted(SCENARIOS))
def test_tws_conformance_matches_v1(spark, tmp_path, name):
    rows = SCENARIOS[name]
    v1 = _final(_run_v1(spark, tmp_path / "a", rows))
    v2 = _final(_run_tws(spark, tmp_path / "b", rows))
    assert v1 == v2, name
