"""output-lake: the pipeline's Embulk-style run() commits its rows as ONE
idempotent lake epoch (or bulk-imports an empty table), the returned
ConfigDiff advances the epoch for `run --config-diff` loops, and
run_resumable maps file-groups onto epochs so the lake's committed-epoch
set independently dedups crash re-runs.
"""

from __future__ import annotations

import embulk_spark.pipeline as P
from embulk_spark.streaming.lake import ParquetLakeTable


def _inline_cfg(lake_path, values, *, epoch=0, mode="merge"):
    return {
        "in": {
            "type": "config",
            "columns": [
                {"name": "link", "type": "string"},
                {"name": "fetched_at", "type": "timestamp"},
                {"name": "body", "type": "string"},
            ],
            "values": values,
        },
        "out": {
            "type": "lake",
            "path": lake_path,
            "n_buckets": 2,
            "epoch": epoch,
            "mode": mode,
            "columns": {"url": "link", "warc_ts": "fetched_at",
                        "text": "body"},
        },
    }


def test_run_commits_one_epoch_and_advances_config_diff(spark, tmp_path):
    lake = str(tmp_path / "lake")
    cfg = _inline_cfg(lake, [
        ["http://a", "2024-01-01 00:00:00", "first a"],
        ["http://b", "2024-01-01 00:00:00", "first b"],
    ])
    diff = P.run(spark, cfg)
    assert diff["out"] == {"epoch": 1}
    table = ParquetLakeTable(spark, lake)
    assert table.committed_epochs() == {0}
    pub = {r["url"]: r["text"] for r in table.published().collect()}
    # provided text survives the merge (no html, extract defaults off)
    assert pub == {"http://a": "first a", "http://b": "first b"}

    # re-running the SAME config (same epoch) is a no-op: exactly-once
    P.run(spark, cfg)
    assert ParquetLakeTable(spark, lake).committed_epochs() == {0}

    # the loop: next run takes the previous diff and lands as epoch 1
    cfg2 = _inline_cfg(lake, [
        ["http://a", "2024-01-02 00:00:00", "second a"],
    ])
    diff2 = P.run(spark, cfg2, config_diff=diff)
    assert diff2["out"] == {"epoch": 2}
    pub = {r["url"]: r["text"] for r in table.published().collect()}
    assert pub == {"http://a": "second a", "http://b": "first b"}


def test_run_lake_import_mode_bootstraps_empty_table(spark, tmp_path):
    lake = str(tmp_path / "lake")
    cfg = _inline_cfg(lake, [
        ["http://a", "2024-01-01 00:00:00", "a text"],
        ["http://a", "2024-01-02 00:00:00", "a newer"],
        ["http://b", "2024-01-01 00:00:00", "b text"],
    ], mode="import")
    P.run(spark, cfg)
    table = ParquetLakeTable(spark, lake)
    snap = table.current_snapshot()
    assert snap["deltas"] == [] and snap["base_rows"] == 2
    pub = {r["url"]: r["text"] for r in table.published().collect()}
    assert pub == {"http://a": "a newer", "http://b": "b text"}


def _many_csvs(tmp_path, n_files=6, rows_per=4):
    d = tmp_path / "many"
    d.mkdir()
    for i in range(n_files):
        lines = ["id,val"]
        for r in range(rows_per):
            lines.append(f"{i * rows_per + r},v{i}_{r}")
        (d / f"part_{i:02d}.csv").write_text("\n".join(lines) + "\n")
    return str(d)


def _resume_lake_cfg(in_dir, lake_path):
    return {
        "in": {
            "type": "file",
            "path_prefix": f"{in_dir}/part_",
            "parser": {
                "type": "csv",
                "header_line": True,
                "columns": [
                    {"name": "id", "type": "string"},
                    {"name": "val", "type": "string"},
                ],
            },
        },
        "out": {
            "type": "lake",
            "path": lake_path,
            "n_buckets": 2,
            "columns": {"url": "id", "text": "val"},
        },
    }


def _lake_state(spark, path):
    rows = ParquetLakeTable(spark, path).published().collect()
    return sorted((r["url"], r["text"]) for r in rows)


def test_run_resumable_lake_matches_clean_and_skips_committed(
    spark, tmp_path
):
    in_dir = _many_csvs(tmp_path)
    clean, resumed = str(tmp_path / "clean"), str(tmp_path / "resumed")
    resume = str(tmp_path / "resume.json")

    d = P.run_resumable(
        spark, _resume_lake_cfg(in_dir, clean), str(tmp_path / "r0.json"),
        files_per_commit=2,
    )
    assert d["done"] is True and d["groups_total"] == 3
    t_clean = ParquetLakeTable(spark, clean)
    assert t_clean.committed_epochs() == {0, 1, 2}

    # killed after 1 group; resume finishes; states identical
    d1 = P.run_resumable(
        spark, _resume_lake_cfg(in_dir, resumed), resume,
        files_per_commit=2, max_commits=1,
    )
    assert d1["groups_committed"] == 1
    d2 = P.run_resumable(
        spark, _resume_lake_cfg(in_dir, resumed), resume, files_per_commit=2,
    )
    assert d2["done"] is True
    assert _lake_state(spark, resumed) == _lake_state(spark, clean)
    assert len(_lake_state(spark, clean)) == 24


def test_run_resumable_lake_crash_between_commit_and_log(spark, tmp_path):
    """Crash AFTER the lake epoch commits but BEFORE the resume file
    records the group: the re-run replays the group and the lake's
    committed-epoch set absorbs it (skipped duplicate), so rows are
    never double-applied."""
    import os

    in_dir = _many_csvs(tmp_path, n_files=4)
    lake = str(tmp_path / "lake")
    resume = str(tmp_path / "resume.json")
    P.run_resumable(
        spark, _resume_lake_cfg(in_dir, lake), resume,
        files_per_commit=2, max_commits=1,
    )
    # simulate the torn state: lake has epoch 0, resume file doesn't
    os.remove(resume)
    d = P.run_resumable(
        spark, _resume_lake_cfg(in_dir, lake), resume, files_per_commit=2,
    )
    assert d["done"] is True
    table = ParquetLakeTable(spark, lake)
    assert table.committed_epochs() == {0, 1}
    assert len(_lake_state(spark, lake)) == 16
