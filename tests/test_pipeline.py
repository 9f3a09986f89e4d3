"""run/guess/preview lifecycle over file inputs — the pytest mirror of the
reference's end-to-end harness (embulk-junit4 TestingEmbulk: run a config
through real in→filters→out and compare bytes against golden output,
TestingEmbulk.java:317-363)."""

from __future__ import annotations

import glob
import gzip
import os

import pytest

from embulk_spark import pipeline as P

CSV = (
    "id,account,time,purchase,comment\r\n"
    "1,32864,2015-01-27 19:23:49,20150127,embulk\r\n"
    "2,14824,2015-01-27 19:01:23,20150127,embulk jruby\r\n"
    "3,27559,2015-01-28 02:20:02,20150128,\"Embulk \"\"csv\"\" parser plugin\"\r\n"
    "4,11270,2015-01-29 11:54:36,20150129,\r\n"
)


@pytest.fixture()
def csv_dir(tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    (d / "sample_01.csv").write_text(CSV)
    return str(d)


def _base_config(csv_dir, out_dir):
    return {
        "in": {"type": "file", "path_prefix": f"{csv_dir}/sample_"},
        "out": {
            "type": "file",
            "path_prefix": f"{out_dir}/result",
            "formatter": {"type": "csv", "header_line": False},
        },
    }


def test_guess_completes_config(spark, csv_dir, tmp_path):
    cfg = P.guess(spark, _base_config(csv_dir, tmp_path))
    parser = cfg["in"]["parser"]
    assert parser["type"] == "csv"
    assert parser["delimiter"] == ","
    assert parser["header_line"] is True
    cols = {c["name"]: c for c in parser["columns"]}
    assert cols["id"]["type"] == "long"
    assert cols["account"]["type"] == "long"
    assert cols["time"]["type"] == "timestamp"
    assert cols["time"]["format"] == "%Y-%m-%d %H:%M:%S"
    assert cols["purchase"]["type"] == "timestamp"
    assert cols["comment"]["type"] == "string"
    assert cfg["in"]["newline"] == "CRLF"


def test_run_guessed_csv_end_to_end(spark, csv_dir, tmp_path):
    """guess → run → output bytes match the golden rows (the reference's
    golden-resource comparison, TestingEmbulk.java:194-196)."""
    out_dir = str(tmp_path / "out")
    cfg = P.guess(spark, _base_config(csv_dir, out_dir))
    diff = P.run(spark, cfg)
    assert diff["in"]["last_path"].endswith("sample_01.csv")
    parts = sorted(glob.glob(f"{out_dir}/result/part-*.csv"))
    text = "".join(open(p).read() for p in parts)
    lines = sorted(line for line in text.split("\n") if line)
    assert lines[0] == "1,32864,2015-01-27 19:23:49 UTC,2015-01-27 00:00:00 UTC,embulk"
    assert len(lines) == 4
    # null comment renders as empty field
    assert lines[3].startswith("4,11270,") and lines[3].endswith(",")


def test_run_incremental_last_path_cursor(spark, csv_dir, tmp_path):
    """second run with the ConfigDiff only reads NEW files
    (embulk-input-file last_path contract, BulkLoader.java:299-306)."""
    out_dir = str(tmp_path / "out")
    cfg = P.guess(spark, _base_config(csv_dir, out_dir))
    diff1 = P.run(spark, cfg)
    # add one more file; rerun with the diff
    with open(os.path.join(csv_dir, "sample_02.csv"), "w") as f:
        f.write("id,account,time,purchase,comment\r\n"
                "9,999,2015-02-01 00:00:00,20150201,new\r\n")
    cfg2 = dict(cfg, out=dict(cfg["out"], path_prefix=f"{out_dir}/result2"))
    diff2 = P.run(spark, cfg2, diff1)
    assert diff2["in"]["last_path"].endswith("sample_02.csv")
    parts = sorted(glob.glob(f"{out_dir}/result2/part-*.csv"))
    text = "".join(open(p).read() for p in parts)
    rows = [l for l in text.split("\n") if l]
    assert len(rows) == 1 and rows[0].startswith("9,999,")
    # nothing new → empty input, cursor unchanged
    diff3 = P.run(spark, cfg2, diff2)
    assert diff3["in"]["last_path"] == diff2["in"]["last_path"]


def test_preview_limit(spark, csv_dir, tmp_path):
    cfg = P.guess(spark, _base_config(csv_dir, tmp_path))
    assert P.preview(spark, cfg).count() == 4  # fewer rows than the 15 cap
    assert P.preview(spark, cfg, n=2).count() == 2


def test_filters_remove_and_rename(spark, csv_dir, tmp_path):
    cfg = P.guess(spark, _base_config(csv_dir, tmp_path))
    cfg["filters"] = [
        {"type": "remove_columns", "remove": ["purchase", "comment"]},
        {"type": "rename", "columns": {"account": "account_id"}},
        {"type": "rename", "rules": [{"rule": "regex_replace",
                                      "match": "^id$", "replace": "record_id"}]},
    ]
    df = P.preview(spark, cfg)
    assert df.columns == ["record_id", "account_id", "time"]


def test_gzip_decoder_guess_and_run(spark, tmp_path):
    """compressed input: guess detects gzip from magic bytes
    (embulk-guess-gzip, GuessExecutor.java:265-278) and Spark decodes by
    extension on read."""
    d = tmp_path / "gzin"
    d.mkdir()
    with gzip.open(d / "data_01.csv.gz", "wt", newline="") as f:
        f.write("a,b\n1,x\n2,y\n")
    cfg = {
        "in": {"type": "file", "path_prefix": f"{d}/data_"},
        "out": {"type": "null"},
    }
    cfg = P.guess(spark, cfg)
    assert cfg["in"]["decoders"] == [{"type": "gzip"}]
    assert [c["name"] for c in cfg["in"]["parser"]["columns"]] == ["a", "b"]
    df = P.preview(spark, cfg)
    assert df.count() == 2
    assert [r["a"] for r in df.orderBy("a").collect()] == [1, 2]


def test_json_parser_roundtrip(spark, tmp_path):
    d = tmp_path / "jsin"
    d.mkdir()
    (d / "ev_01.jsonl").write_text(
        '{"k": 1, "s": "one"}\n{"k": 2, "s": "two"}\n'
    )
    cfg = P.guess(spark, {"in": {"type": "file", "path_prefix": f"{d}/ev_"}})
    assert cfg["in"]["parser"]["type"] == "json"
    cfg["in"]["parser"]["columns"] = [
        {"name": "k", "type": "long"},
        {"name": "s", "type": "string"},
    ]
    df = P.preview(spark, cfg)
    assert sorted((r["k"], r["s"]) for r in df.collect()) == [(1, "one"), (2, "two")]


def test_inline_config_input(spark):
    """embulk-input-config analogue: records inlined in config."""
    cfg = {
        "in": {
            "type": "config",
            "columns": [
                {"name": "id", "type": "long"},
                {"name": "name", "type": "string"},
            ],
            "values": [[1, "a"], [2, "b"]],
        },
    }
    df = P.preview(spark, cfg)
    assert df.count() == 2


def test_deep_merge_semantics():
    """DataSourceImpl.java:229-282: nested per-key merge, element-wise
    array merge, scalar overwrite."""
    base = {"a": {"x": 1, "y": 2}, "arr": [{"p": 1}, {"q": 2}], "s": "old"}
    other = {"a": {"y": 3, "z": 4}, "arr": [{"p2": 9}], "s": "new"}
    m = P.deep_merge(base, other)
    assert m["a"] == {"x": 1, "y": 3, "z": 4}
    assert m["arr"] == [{"p": 1, "p2": 9}, {"q": 2}]
    assert m["s"] == "new"


def test_cli_guess_and_preview(tmp_path, csv_dir, capsys, spark):
    from embulk_spark.cli import main

    cfgp = tmp_path / "cfg.yml"
    cfgp.write_text(P.dump_config({
        "in": {"type": "file", "path_prefix": f"{csv_dir}/sample_"},
        "out": {"type": "null"},
    }))
    guessed = tmp_path / "guessed.yml"
    assert main(["guess", str(cfgp), "-o", str(guessed)]) == 0
    assert "parser" in guessed.read_text()
    assert main(["preview", str(guessed)]) == 0
    out = capsys.readouterr().out
    assert "32864" in out


def test_cli_replay_and_cleanup(tmp_path, capsys, spark):
    """CLI replay subcommand applies a change-event log batch-wise and is
    idempotent on re-run; cleanup reports expiry/orphan stats."""
    import json as _json

    from embulk_spark.cli import main
    from embulk_spark.sources.events import change_stream

    events = change_stream(spark, 300, 40, 2, num_partitions=2)
    src = str(tmp_path / "events")
    events.coalesce(1).write.mode("overwrite").parquet(src)
    table = str(tmp_path / "table")

    assert main(["replay", src, table, "--buckets", "4"]) == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    metrics = [_json.loads(l) for l in lines]
    assert len(metrics) == 2 and all("rows_in" in m for m in metrics)

    # idempotent: second run skips both committed epochs
    assert main(["replay", src, table, "--buckets", "4"]) == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    assert all(_json.loads(l).get("skipped_duplicate_epoch") for l in lines)

    # replay with an attached near-dup signature index: one committed
    # index epoch per table epoch, signatures readable afterwards
    table2, sigidx = str(tmp_path / "table2"), str(tmp_path / "sigidx")
    assert main(
        ["replay", src, table2, "--buckets", "4", "--signature-index", sigidx]
    ) == 0
    capsys.readouterr()
    from embulk_spark.operators.incremental import SignatureIndex

    idx = SignatureIndex(
        spark, sigidx, id_col="url", id_type="string", order_cols=["warc_ts", "seq"]
    )
    assert idx.committed_epochs() == {0, 1}
    assert idx.signatures().count() > 0

    # replay with an attached Bloom membership index: lockstep epochs,
    # every live text probes positive
    table3, bfidx = str(tmp_path / "table3"), str(tmp_path / "bfidx")
    assert main(
        ["replay", src, table3, "--buckets", "4", "--bloom-index", bfidx]
    ) == 0
    capsys.readouterr()
    from pyspark.sql import functions as _F

    from embulk_spark.operators.bloom import BloomIndex
    from embulk_spark.streaming.lake import ParquetLakeTable

    bidx = BloomIndex(spark, bfidx)
    assert bidx.committed_epochs() == {0, 1}
    pub3 = ParquetLakeTable(spark, table3, n_buckets=4).published()
    probed = bidx.probe(
        pub3.select(_F.col("url").alias("id"), "text"), "text", ["id"]
    )
    assert probed.filter(~_F.col("maybe_present")).count() == 0

    # rollback subcommand: undo the last epoch, then replay re-applies it
    tbl = ParquetLakeTable(spark, table3, n_buckets=4)
    target = tbl.current_snapshot()["version"] - 1
    assert main(["rollback", table3, "--to-version", str(target)]) == 0
    out = _json.loads(capsys.readouterr().out.splitlines()[-1])
    assert out["rolled_back_to"] == target
    assert main(["replay", src, table3, "--buckets", "4"]) == 0
    capsys.readouterr()
    assert ParquetLakeTable(spark, table3, n_buckets=4).committed_epochs() == {0, 1}

    assert main(["cleanup", table, "--keep-snapshots", "1"]) == 0
    out = _json.loads(capsys.readouterr().out.splitlines()[-1])
    assert out["snapshots_retained"] == 1 and "orphans_removed" in out


# ---------------------------------------------------------------------------
# resumable batch run (reference ResumeState, exec/BulkLoader.java:584-659)
# ---------------------------------------------------------------------------

def _many_csvs(tmp_path, n_files=6, rows_per=4):
    d = tmp_path / "many"
    d.mkdir()
    for i in range(n_files):
        lines = ["id,val"]
        for r in range(rows_per):
            lines.append(f"{i * rows_per + r},v{i}_{r}")
        (d / f"part_{i:02d}.csv").write_text("\n".join(lines) + "\n")
    return str(d)


def _resume_cfg(in_dir, out_dir):
    return {
        "in": {
            "type": "file",
            "path_prefix": f"{in_dir}/part_",
            "parser": {
                "type": "csv",
                "header_line": True,
                "columns": [
                    {"name": "id", "type": "long"},
                    {"name": "val", "type": "string"},
                ],
            },
        },
        "out": {
            "type": "file",
            "path_prefix": str(out_dir),
            "formatter": {"type": "csv", "header_line": False},
        },
    }


def _read_all_out(out_dir):
    rows = []
    for fp in sorted(glob.glob(f"{out_dir}/**/*.csv", recursive=True)):
        with open(fp) as f:
            rows += [ln for ln in f.read().splitlines() if ln]
    return sorted(rows)


def test_run_resumable_kill_and_resume_matches_clean(spark, tmp_path):
    in_dir = _many_csvs(tmp_path)
    clean_out = tmp_path / "out_clean"
    res_out = tmp_path / "out_resumed"
    resume = str(tmp_path / "resume.json")

    # clean run in one shot (3 groups of 2 files)
    d = P.run_resumable(
        spark, _resume_cfg(in_dir, clean_out), str(tmp_path / "r0.json"),
        files_per_commit=2,
    )
    assert d["done"] is True and d["groups_total"] == 3

    # "killed" run: only 1 group commits, then resume finishes the rest
    d1 = P.run_resumable(
        spark, _resume_cfg(in_dir, res_out), resume,
        files_per_commit=2, max_commits=1,
    )
    assert d1["done"] is False and d1["groups_committed"] == 1
    d2 = P.run_resumable(
        spark, _resume_cfg(in_dir, res_out), resume, files_per_commit=2,
    )
    assert d2["done"] is True and d2["groups_committed"] == 3

    assert _read_all_out(res_out) == _read_all_out(clean_out)
    assert len(_read_all_out(clean_out)) == 24


def test_run_resumable_refuses_changed_input(spark, tmp_path):
    in_dir = _many_csvs(tmp_path, n_files=4)
    out = tmp_path / "out_chg"
    resume = str(tmp_path / "resume_chg.json")
    P.run_resumable(
        spark, _resume_cfg(in_dir, out), resume,
        files_per_commit=2, max_commits=1,
    )
    # mutate the committed group's input set (replace file 0 content set:
    # rename file 01 so group g00000's membership changes)
    os.rename(f"{in_dir}/part_01.csv", f"{in_dir}/part_00b.csv")
    with pytest.raises(RuntimeError, match="resume state mismatch"):
        P.run_resumable(spark, _resume_cfg(in_dir, out), resume, files_per_commit=2)


# ---------------------------------------------------------------------------
# JSON-pointer root parsing (spi/json/JsonParser.java:12-41)
# ---------------------------------------------------------------------------

def test_json_pointer_to_path():
    from embulk_spark.sources.files import json_pointer_to_path

    assert json_pointer_to_path("/store/book/0") == "$.store.book[0]"
    assert json_pointer_to_path("/store/book/0", digits_as_index=False) == (
        "$.store.book['0']"
    )
    # '/'-containing and non-identifier keys are bracket-quoted, never
    # misread as path structure
    assert json_pointer_to_path("/a~1b/c~0d") == "$['a/b']['c~d']"
    assert json_pointer_to_path("/a.b") == "$['a.b']"
    assert json_pointer_to_path("") == "$"


def test_json_root_pointer_array(spark, tmp_path):
    from embulk_spark.sources.files import read_json

    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"meta": 1, "items": [{"id": 1, "v": "a"}, {"id": 2, "v": "b"}]}\n'
        '{"meta": 2, "items": [{"id": 3, "v": "c"}]}\n'
        '{"meta": 3, "items": []}\n'
    )
    parser = {
        "type": "json",
        "root": "/items",
        "columns": [
            {"name": "id", "type": "long"},
            {"name": "v", "type": "string"},
        ],
    }
    rows = read_json(spark, [str(p)], parser).orderBy("id").collect()
    assert [tuple(r) for r in rows] == [(1, "a"), (2, "b"), (3, "c")]


def test_json_root_pointer_object_and_index(spark, tmp_path):
    from embulk_spark.sources.files import read_json

    p = tmp_path / "docs2.jsonl"
    p.write_text(
        '{"payload": {"user": {"id": 7, "name": "ann"}}}\n'
        '{"payload": {"user": {"id": 8, "name": "bo"}}}\n'
    )
    parser = {
        "type": "json",
        "root": "/payload/user",
        "columns": [
            {"name": "id", "type": "long"},
            {"name": "name", "type": "string"},
        ],
    }
    rows = read_json(spark, [str(p)], parser).orderBy("id").collect()
    assert [tuple(r) for r in rows] == [(7, "ann"), (8, "bo")]


# ---------------------------------------------------------------------------
# Liquid template preprocessing (EmbulkRunner.java:369-405: applies only to
# *.yml.liquid; data = {'env': ENV} + params; include -> _name.yml.liquid)
# ---------------------------------------------------------------------------

def test_liquid_env_and_default(tmp_path, monkeypatch):
    monkeypatch.setenv("EMBULK_SPARK_TEST_PREFIX", "/data/in_")
    cfg_path = tmp_path / "pipe.yml.liquid"
    cfg_path.write_text(
        "in:\n"
        "  type: file\n"
        "  path_prefix: {{ env.EMBULK_SPARK_TEST_PREFIX }}\n"
        "  charset: {{ env.MISSING_VAR | default: 'UTF-8' }}\n"
    )
    cfg = P.load_config(str(cfg_path))
    assert cfg["in"]["path_prefix"] == "/data/in_"
    assert cfg["in"]["charset"] == "UTF-8"


def test_liquid_include_and_plain_yml_untouched(tmp_path):
    (tmp_path / "_common.yml.liquid").write_text(
        "  formatter: {type: csv, header_line: false}\n"
    )
    cfg_path = tmp_path / "pipe.yml.liquid"
    cfg_path.write_text(
        "out:\n"
        "  type: file\n"
        "  path_prefix: /tmp/out\n"
        "{% include 'common' %}\n"
    )
    cfg = P.load_config(str(cfg_path))
    assert cfg["out"]["formatter"] == {"type": "csv", "header_line": False}

    # a plain .yml with {{ }} stays literal (extension gate)
    plain = tmp_path / "plain.yml"
    plain.write_text("a: '{{ env.HOME }}'\n")
    assert P.load_config(str(plain))["a"] == "{{ env.HOME }}"


def test_liquid_params_win_and_render_api():
    out = P.render_liquid("x={{ name }} y={{ env.PATH | default: 'p' }}",
                          params={"name": "n1", "env": {"PATH": "override"}})
    assert out == "x=n1 y=override"


def test_liquid_if_for_case_blocks(monkeypatch):
    """Full-Liquid block tags (EmbulkRunner.java:369-405 runs the real
    Liquid gem): if/elsif/else, unless, for with forloop, case/when,
    assign, comment, multi-clause conditions."""
    monkeypatch.setenv("STAGE", "prod")
    t = (
        "{% if env.STAGE == 'prod' %}P{% elsif env.STAGE == 'dev' %}D"
        "{% else %}N{% endif %}"
        "|{% unless env.NOPE %}U{% endunless %}"
        "|{% for c in cols %}{{ forloop.index }}{{ c }}"
        "{% unless forloop.last %},{% endunless %}{% endfor %}"
        "|{% case env.STAGE %}{% when 'dev', 'test' %}d"
        "{% when 'prod' %}p{% else %}x{% endcase %}"
        "|{% assign z = 'hi' | upcase %}{{ z }}"
        "|{% comment %}gone{% endcomment %}end"
        "|{% if env.STAGE == 'prod' and cols contains 'b' %}AND{% endif %}"
        "|{% if env.STAGE == 'zz' or 2 > 1 %}OR{% endif %}"
        "|{% for c in missing %}X{% else %}EMPTY{% endfor %}"
    )
    out = P.render_liquid(t, params={"cols": ["a", "b"]})
    assert out == "P|U|1a,2b|p|HI|end|AND|OR|EMPTY"


def test_liquid_conditional_config_runs_end_to_end(spark, tmp_path, monkeypatch):
    """A guessed-config round-trip under conditionals: a .yml.liquid
    config whose filter chain is stamped out by {% for %} and whose
    output path switches on {% if %} loads and RUNS."""
    src = tmp_path / "in_data.csv"
    src.write_text("id,name,score\n1,ann,2.5\n2,bo,1.0\n")
    monkeypatch.setenv("RUN_STAGE", "prod")
    cfg_path = tmp_path / "pipe.yml.liquid"
    cfg_path.write_text(
        "in:\n"
        "  type: file\n"
        f"  path_prefix: {tmp_path}/in_\n"
        "  parser:\n"
        "    type: csv\n"
        "    header_line: true\n"
        "    columns:\n"
        "{% for c in columns %}"
        "      - {name: {{ c.name }}, type: {{ c.type }}}\n"
        "{% endfor %}"
        "filters:\n"
        "{% if env.RUN_STAGE == 'prod' %}"
        "  - {type: rename, columns: {name: who}}\n"
        "{% else %}"
        "  - {type: remove_columns, remove: [score]}\n"
        "{% endif %}"
        "out:\n"
        "  type: file\n"
        "{% if env.RUN_STAGE == 'prod' %}"
        f"  path_prefix: {tmp_path}/out_prod\n"
        "{% else %}"
        f"  path_prefix: {tmp_path}/out_dev\n"
        "{% endif %}"
        "  formatter: {type: csv}\n"
    )
    cfg = P.load_config(
        str(cfg_path),
        template_params={
            "columns": [
                {"name": "id", "type": "long"},
                {"name": "name", "type": "string"},
                {"name": "score", "type": "double"},
            ]
        },
    )
    assert cfg["filters"] == [{"type": "rename", "columns": {"name": "who"}}]
    assert cfg["out"]["path_prefix"].endswith("out_prod")
    P.run(spark, cfg)
    import glob

    files = glob.glob(f"{tmp_path}/out_prod*")
    assert files, "prod output written"


def test_json_root_digit_key_fallback(spark, tmp_path):
    """All-digit pointer token resolving an OBJECT key (not array index)."""
    from embulk_spark.sources.files import read_json

    p = tmp_path / "digit_key.jsonl"
    p.write_text('{"data": {"0": {"id": 5, "v": "k"}}}\n')
    parser = {
        "type": "json",
        "root": "/data/0",
        "columns": [
            {"name": "id", "type": "long"},
            {"name": "v", "type": "string"},
        ],
    }
    rows = read_json(spark, [str(p)], parser).collect()
    assert [tuple(r) for r in rows] == [(5, "k")]


def test_run_resumable_partial_keeps_last_path(spark, tmp_path):
    """A partial run must NOT advance the last_path cursor — a ConfigDiff
    written mid-run would otherwise filter the pending files out forever."""
    in_dir = _many_csvs(tmp_path, n_files=4)
    out = tmp_path / "out_lp"
    resume = str(tmp_path / "resume_lp.json")
    d1 = P.run_resumable(
        spark, _resume_cfg(in_dir, out), resume, files_per_commit=2, max_commits=1,
    )
    assert d1["done"] is False and d1["in"]["last_path"] is None
    d2 = P.run_resumable(spark, _resume_cfg(in_dir, out), resume, files_per_commit=2)
    assert d2["done"] is True
    assert d2["in"]["last_path"] == f"{in_dir}/part_03.csv"


def test_run_resumable_detects_rewritten_file(spark, tmp_path):
    """Content fingerprint: a rewritten input file in a committed group
    fails loudly instead of silently keeping stale output."""
    import os as _os

    in_dir = _many_csvs(tmp_path, n_files=2)
    out = tmp_path / "out_rw"
    resume = str(tmp_path / "resume_rw.json")
    P.run_resumable(
        spark, _resume_cfg(in_dir, out), resume, files_per_commit=2, max_commits=1,
    )
    fp = f"{in_dir}/part_00.csv"
    with open(fp, "a") as f:
        f.write("999,changed\n")
    _os.utime(fp, ns=(_os.stat(fp).st_atime_ns, _os.stat(fp).st_mtime_ns + 10**9))
    with pytest.raises(RuntimeError, match="resume state mismatch"):
        P.run_resumable(spark, _resume_cfg(in_dir, out), resume, files_per_commit=2)


def test_csv_comments_before_header_roundtrip(spark, tmp_path):
    """Multi-char comment marker + header: the text path must strip the
    comments BEFORE counting header lines."""
    from embulk_spark.sources.files import read_csv

    p = tmp_path / "cmt.csv"
    p.write_text("// generated\nid,val\n1,x\n2,y\n")
    parser = {
        "type": "csv",
        "comment_line_marker": "//",
        "header_line": True,
        "columns": [
            {"name": "id", "type": "long"},
            {"name": "val", "type": "string"},
        ],
    }
    rows = read_csv(spark, [str(p)], parser).orderBy("id").collect()
    assert [tuple(r) for r in rows] == [(1, "x"), (2, "y")]


def test_filter_dedup_exact_and_fuzzy(spark):
    """curation filters in the Embulk chain: exact keeps min-id per
    identical text; fuzzy keeps the preferred doc per near-dup cluster."""
    base = "the quick brown fox jumps over the lazy dog again and again"
    cfg = {
        "in": {
            "type": "config",
            "columns": [
                {"name": "doc_id", "type": "long"},
                {"name": "text", "type": "string"},
                {"name": "n_chars", "type": "long"},
            ],
            "values": [
                [1, base, 10],
                [2, base, 20],           # exact dup of 1
                [3, base + " tail", 99], # near-dup of 1
                [4, "another unrelated doc about spark plans", 5],
            ],
        },
        "filters": [{"type": "dedup", "id": "doc_id"}],
    }
    exact = P.preview(spark, cfg)
    assert {r.doc_id for r in exact.collect()} == {1, 3, 4}
    cfg["filters"] = [{
        "type": "dedup", "method": "fuzzy", "id": "doc_id",
        "bands": 8, "threshold": 0.3, "prefer": ["n_chars"],
    }]
    fuzzy = P.preview(spark, cfg)
    assert {r.doc_id for r in fuzzy.collect()} == {3, 4}


def test_filter_sessionize_and_quality(spark):
    cfg = {
        "in": {
            "type": "config",
            "columns": [
                {"name": "event_id", "type": "long"},
                {"name": "user_id", "type": "string"},
                {"name": "ts", "type": "timestamp"},
                {"name": "text", "type": "string"},
            ],
            "values": [
                [1, "u", "2024-01-01 00:00:00", "hello world of spark"],
                [2, "u", "2024-01-01 00:10:00", "more text here now"],
                [3, "u", "2024-01-01 01:10:00", "a new session starts"],
            ],
        },
        "filters": [
            {"type": "sessionize", "key": "user_id", "gap_seconds": 1800,
             "tiebreak": "event_id"},
            {"type": "quality", "column": "text"},
        ],
    }
    out = P.preview(spark, cfg)
    rows = {r.event_id: r for r in out.collect()}
    assert [rows[i].session_idx for i in (1, 2, 3)] == [1, 1, 2]
    assert rows[1].session_id == "u#1"
    assert rows[1].n_tokens == 4 and rows[1].alpha_ratio > 0.7


def test_filter_sample_flat_and_stratified(spark):
    """The `sample` filter in the Embulk chain: deterministic membership
    (identical across re-runs) for flat rate; per-stratum rates with a
    multi-column 'a|b' key syntax."""
    cfg = {
        "in": {
            "type": "config",
            "columns": [
                {"name": "doc_id", "type": "long"},
                {"name": "source", "type": "string"},
                {"name": "lang", "type": "string"},
            ],
            "values": [
                [i, "web" if i % 2 else "books", "en" if i % 3 else "de"]
                for i in range(300)
            ],
        },
        "filters": [{"type": "sample", "id": "doc_id", "rate": 0.4}],
    }
    a = {r.doc_id for r in P.preview(spark, cfg, n=1000).collect()}
    b = {r.doc_id for r in P.preview(spark, cfg, n=1000).collect()}
    assert a == b and 0.25 * 300 < len(a) < 0.55 * 300
    cfg["filters"] = [{
        "type": "sample", "id": "doc_id",
        "strata": ["source", "lang"],
        "rates": {"web|en": 1.0},
        "default_rate": 0.0,
    }]
    got = P.preview(spark, cfg, n=1000).collect()
    assert got and all(r.source == "web" and r.lang == "en" for r in got)


def test_cli_changes_feed(tmp_path, capsys, spark):
    """CLI `changes` subcommand: incremental consumer read of an epoch
    range, optionally materialized to parquet."""
    import json as _json

    from embulk_spark.cli import main
    from embulk_spark.sources.events import change_stream

    events = change_stream(spark, 300, 40, 2, num_partitions=2)
    src = str(tmp_path / "events")
    events.coalesce(1).write.mode("overwrite").parquet(src)
    table = str(tmp_path / "table")
    assert main(["replay", src, table, "--buckets", "4"]) == 0
    capsys.readouterr()

    out = str(tmp_path / "feed")
    assert main(
        ["changes", table, "--since-epoch", "0", "--out", out]
    ) == 0
    rep = _json.loads(capsys.readouterr().out.splitlines()[-1])
    feed = spark.read.parquet(out)
    assert rep["rows"] == feed.count() > 0
    # feed carries only epoch-1 winners: every url in it was touched in e1
    e1_urls = {
        r["url"] for r in events.filter("epoch = 1 and op != 'S'").select("url").collect()
    }
    assert {r["url"] for r in feed.collect()} <= e1_urls


def test_filter_quality_thresholds(spark):
    """quality filter with thresholds drops low-quality rows (Gopher-style
    keep rules) and can strip the helper feature columns."""
    good = ("the quick brown fox jumps over the lazy dog and then the "
            "dog naps in the sun for a while longer") * 2
    cfg = {
        "in": {
            "type": "config",
            "columns": [
                {"name": "doc_id", "type": "long"},
                {"name": "text", "type": "string"},
            ],
            "values": [
                [1, good],
                [2, "x"],                        # too short
                [3, "aaaaaaaaaaaaaaaaaaaaaaaa"], # 1 huge token, no stopwords
            ],
        },
        "filters": [{
            "type": "quality", "column": "text",
            "min_tokens": 10, "max_mean_token_len": 10,
            "min_stopword_ratio": 0.01,
            "keep_features": False,
        }],
    }
    rows = P.preview(spark, cfg).collect()
    assert [r.doc_id for r in rows] == [1]
    assert rows[0].asDict().keys() == {"doc_id", "text"}


def test_csv_null_marker_rows_survive_comment_stripping(spark, tmp_path):
    """A data row whose first field IS the null string ('#N/A,...') must
    survive comment stripping under marker '#' — the dialect guess
    classifies such lines as data, so the reader must agree (Spark's
    single-char comment option can't, so these configs take the text
    path)."""
    from embulk_spark.sources.files import read_csv

    p = tmp_path / "nulls.csv"
    p.write_text("# a comment\nid,val\n1,x\n#N/A,y\n# another\n2,z\n")
    parser = {
        "type": "csv",
        "comment_line_marker": "#",
        "null_string": "#N/A",
        "header_line": True,
        "columns": [
            {"name": "id", "type": "string"},
            {"name": "val", "type": "string"},
        ],
    }
    rows = read_csv(spark, [str(p)], parser).orderBy("val").collect()
    assert [tuple(r) for r in rows] == [("1", "x"), (None, "y"), ("2", "z")]


def test_filter_decontaminate(spark, tmp_path):
    """decontaminate filter: docs overlapping the eval parquet above the
    threshold are dropped; short docs always survive."""
    bench_path = str(tmp_path / "bench")
    spark.createDataFrame(
        [("the secret eval question about spark shuffles",)], "prompt string"
    ).write.parquet(bench_path)
    cfg = {
        "in": {
            "type": "config",
            "columns": [
                {"name": "doc_id", "type": "long"},
                {"name": "text", "type": "string"},
            ],
            "values": [
                [1, "the secret eval question about spark shuffles verbatim"],
                [2, "entirely unrelated prose with plenty of fresh words here"],
                [3, "too short"],
            ],
        },
        "filters": [{
            "type": "decontaminate", "bench": bench_path,
            "bench_text": "prompt", "id": "doc_id",
            "shingle_n": 3, "max_overlap": 0.5,
        }],
    }
    got = {r.doc_id for r in P.preview(spark, cfg).collect()}
    assert got == {2, 3}


def test_filter_dedup_paragraphs(spark):
    """dedup method=paragraphs rewrites text sub-document (every row
    survives) and honors the literal sep + min_docs knobs."""
    cfg = {
        "in": {
            "type": "config",
            "columns": [
                {"name": "doc_id", "type": "long"},
                {"name": "text", "type": "string"},
            ],
            "values": [
                [1, "HEAD|own one|TAIL"],
                [2, "HEAD|own two|TAIL"],
                [3, "own three|TAIL"],
            ],
        },
        "filters": [{
            "type": "dedup", "method": "paragraphs", "id": "doc_id",
            "sep": "|", "min_docs": 2,
        }],
    }
    out = {r.doc_id: (r.text, r.n_paras_dropped)
           for r in P.preview(spark, cfg).collect()}
    assert out[1] == ("HEAD|own one|TAIL", 0)
    assert out[2] == ("own two", 2)
    assert out[3] == ("own three", 1)


def test_filter_pii_redact(spark):
    """pii_redact filter rewrites the text column in place; audit=True
    appends per-kind counts computed from the pre-redaction text."""
    cfg = {
        "in": {
            "type": "config",
            "columns": [
                {"name": "doc_id", "type": "long"},
                {"name": "text", "type": "string"},
            ],
            "values": [
                [1, "mail me at a.user@example.com from 10.0.0.1"],
                [2, "no pii in this row at all"],
            ],
        },
        "filters": [{"type": "pii_redact", "column": "text", "audit": True}],
    }
    out = {r.doc_id: r for r in P.preview(spark, cfg).collect()}
    assert "<EMAIL>" in out[1].text and "<IPV4>" in out[1].text
    assert "@" not in out[1].text
    assert (out[1].n_email, out[1].n_phone, out[1].n_ipv4) == (1, 0, 1)
    assert out[2].text == "no pii in this row at all"
    assert (out[2].n_email, out[2].n_phone, out[2].n_ipv4) == (0, 0, 0)


def test_orc_and_parquet_columnar_roundtrip(spark, tmp_path):
    """columnar inputs/outputs (the embulk-input-parquet / -output-orc
    ecosystem plugins re-expressed as native Spark formats): schema from
    the file footer; declared columns prune + coerce on top."""
    src = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5), (3, None, None)], "id long, s string, v double"
    )
    orc_in = str(tmp_path / "in_orc")
    src.write.orc(orc_in)
    out_dir = str(tmp_path / "out")
    cfg = {
        "in": {"type": "file", "path_prefix": orc_in + "/part-",
               "parser": {"type": "orc"}},
        "out": {"type": "file", "path_prefix": f"{out_dir}/res",
                "formatter": {"type": "orc"}},
    }
    P.run(spark, cfg)
    back = spark.read.orc(f"{out_dir}/res")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))
    # declared columns = projection + coercion (id long -> string here)
    cfg2 = {
        "in": {"type": "file", "path_prefix": orc_in + "/part-",
               "parser": {"type": "orc",
                          "columns": [{"name": "id", "type": "string"},
                                      {"name": "s", "type": "string"}]}},
        "out": {"type": "file", "path_prefix": f"{out_dir}/res2",
                "formatter": {"type": "parquet"}},
    }
    P.run(spark, cfg2)
    back2 = spark.read.parquet(f"{out_dir}/res2")
    assert back2.columns == ["id", "s"]
    assert dict(back2.dtypes)["id"] == "string"
    assert {tuple(r) for r in back2.collect()} == {("1", "a"), ("2", "b"), ("3", None)}


def test_binary_formatters_roundtrip(spark, tmp_path):
    """formatter-avro / formatter-msgpack: write with the sink, read back
    with the matching parser — field-exact round trip incl. nulls."""
    from pyspark.sql import Row

    from embulk_spark.sinks.files import write_output
    from embulk_spark.sources.files import read_input_files

    df = spark.createDataFrame(
        [
            Row(id=1, name="alpha", score=1.5, ok=True),
            Row(id=2, name=None, score=None, ok=False),
            Row(id=3, name="gamma", score=-0.25, ok=None),
        ]
    ).repartition(2)
    want = {(1, "alpha", 1.5, True), (2, None, None, False), (3, "gamma", -0.25, None)}
    cols = [
        {"name": "id", "type": "long"},
        {"name": "name", "type": "string"},
        {"name": "score", "type": "double"},
        {"name": "ok", "type": "boolean"},
    ]
    for fmt in ("avro", "msgpack"):
        out = str(tmp_path / fmt)
        write_output(
            df,
            {"type": "file", "path_prefix": out, "formatter": {"type": fmt}},
        )
        back, _ = read_input_files(
            spark,
            {"path_prefix": out + "/part-", "parser": {"type": fmt, "columns": cols}},
        )
        got = {(r.id, r.name, r.score, r.ok) for r in back.collect()}
        assert got == want, fmt


def test_list_input_files_uri_scheme(spark, tmp_path):
    """Object-store-style prefixes (here file://, same Hadoop FS API as
    s3a://) enumerate with the cursor contract instead of silently
    matching nothing."""
    from embulk_spark.sources.files import list_input_files, read_input_files

    for n in ("a.csv", "b.csv", "c.csv"):
        (tmp_path / n).write_text("x\n1\n")
    prefix = "file://" + str(tmp_path) + "/"
    paths = list_input_files(prefix, None, spark)
    assert [p.rsplit("/", 1)[1] for p in paths] == ["a.csv", "b.csv", "c.csv"]
    after = list_input_files(prefix, paths[0], spark)
    assert [p.rsplit("/", 1)[1] for p in after] == ["b.csv", "c.csv"]
    df, diff = read_input_files(
        spark,
        {"path_prefix": prefix,
         "parser": {"type": "csv", "header_line": True,
                    "columns": [{"name": "x", "type": "long"}]}},
    )
    assert df.count() == 3 and diff["last_path"].endswith("c.csv")


# ---------------------------------------------------------------------------
# embulk-parser-csv column-count policies (allow_extra_columns /
# allow_optional_columns; plugin contract declared build.gradle:30)
# ---------------------------------------------------------------------------

def _count_policy_file(tmp_path):
    p = tmp_path / "cp.csv"
    p.write_text(
        "id,name,score\n"
        "1,ann,2.5\n"
        "2,bo\n"                  # short (2 fields)
        "3,cy,1.0,EXTRA\n"        # extra (4 fields)
        "4,dee,\n"                # 3 fields, last empty: VALID
        '5,"e,e",3.5\n'           # quoted delimiter: 3 fields
        '6,"f""f",4.5,"x,y"\n'    # doubled quote + quoted extra
    )
    return str(p)


_CP_COLS = [
    {"name": "id", "type": "long"},
    {"name": "name", "type": "string"},
    {"name": "score", "type": "double"},
]


def test_csv_count_policy_strict_skips_both(spark, tmp_path):
    from embulk_spark.sources.files import read_csv

    p = _count_policy_file(tmp_path)
    cfg = {"columns": _CP_COLS, "header_line": True,
           "allow_extra_columns": False}
    got = sorted(tuple(r) for r in read_csv(spark, [p], cfg).collect())
    # trailing-empty row 4 has exactly 3 fields and MUST survive;
    # quoted delimiters don't inflate the count
    assert got == [(1, "ann", 2.5), (4, "dee", None), (5, "e,e", 3.5)]


def test_csv_count_policy_allow_extra(spark, tmp_path):
    from embulk_spark.sources.files import read_csv

    p = _count_policy_file(tmp_path)
    cfg = {"columns": _CP_COLS, "header_line": True,
           "allow_extra_columns": True}
    got = sorted(tuple(r) for r in read_csv(spark, [p], cfg).collect())
    assert got == [
        (1, "ann", 2.5), (3, "cy", 1.0), (4, "dee", None),
        (5, "e,e", 3.5), (6, 'f"f', 4.5),
    ]


def test_csv_count_policy_allow_optional(spark, tmp_path):
    from embulk_spark.sources.files import read_csv

    p = _count_policy_file(tmp_path)
    cfg = {"columns": _CP_COLS, "header_line": True,
           "allow_optional_columns": True}
    got = sorted(tuple(r) for r in read_csv(spark, [p], cfg).collect())
    assert got == [
        (1, "ann", 2.5), (2, "bo", None), (4, "dee", None), (5, "e,e", 3.5),
    ]


def test_csv_count_policy_stop_on_invalid(spark, tmp_path):
    import pytest as _pytest

    from embulk_spark.sources.files import read_csv

    p = _count_policy_file(tmp_path)
    cfg = {"columns": _CP_COLS, "header_line": True,
           "allow_extra_columns": False, "stop_on_invalid_record": True}
    with _pytest.raises(Exception, match="invalid record"):
        read_csv(spark, [p], cfg).collect()


def test_example_subcommand_guess_run_roundtrip(spark, tmp_path, capsys):
    """`example` generates a sample corpus + seed config that the
    guess → run loop completes on (reference cli/EmbulkExample.java:
    the first command a new user types)."""
    from embulk_spark import cli

    base = str(tmp_path / "ex")
    rc = cli.main(["example", base])
    assert rc == 0
    out = capsys.readouterr().out
    assert "seed.yml" in out and "sample_01.csv.gz" in out

    seed = P.load_config(str(tmp_path / "ex" / "seed.yml"))
    guessed = P.guess(spark, seed)
    cols = {c["name"]: c["type"] for c in guessed["in"]["parser"]["columns"]}
    assert cols["id"] == "long" and cols["time"] == "timestamp"
    assert cols["comment"] == "string"
    # run end-to-end into a file sink (stdout in the seed; override)
    guessed["out"] = {
        "type": "file",
        "path_prefix": str(tmp_path / "out_"),
        "formatter": {"type": "csv"},
    }
    P.run(spark, guessed)
    import glob

    files = glob.glob(str(tmp_path / "out_*"))
    assert files


# ---------------------------------------------------------------------------
# embulk-parser-csv micro-dialect: trim_if_not_quoted /
# quotes_in_quoted_fields (CsvTokenizer contract, build.gradle:30)
# ---------------------------------------------------------------------------

def test_csv_trim_if_not_quoted(spark, tmp_path):
    from embulk_spark.sources.files import read_csv

    p = tmp_path / "t.csv"
    p.write_text(
        "id,name\n"
        "1,  padded  \n"
        '2,"  kept  "\n'
    )
    cols = [{"name": "id", "type": "long"},
            {"name": "name", "type": "string"}]
    # default: whitespace survives
    got = {r.id: r.name for r in read_csv(
        spark, [str(p)], {"columns": cols, "header_line": True}
    ).collect()}
    assert got == {1: "  padded  ", 2: "  kept  "}
    # trim_if_not_quoted: unquoted trims, quoted keeps
    got = {r.id: r.name for r in read_csv(
        spark, [str(p)],
        {"columns": cols, "header_line": True, "trim_if_not_quoted": True},
    ).collect()}
    assert got == {1: "padded", 2: "  kept  "}


def test_csv_trim_if_not_quoted_text_path(spark, tmp_path):
    """The option must survive the from_csv text path too
    (skip_header_lines > 1)."""
    from embulk_spark.sources.files import read_csv

    p = tmp_path / "t2.csv"
    p.write_text(
        "garbage line\n"
        "id,name\n"
        "1,  padded  \n"
    )
    cols = [{"name": "id", "type": "long"},
            {"name": "name", "type": "string"}]
    got = {r.id: r.name for r in read_csv(
        spark, [str(p)],
        {"columns": cols, "skip_header_lines": 2,
         "trim_if_not_quoted": True},
    ).collect()}
    assert got == {1: "padded"}


def test_csv_stray_quotes_policy(spark, tmp_path):
    from embulk_spark.sources.files import read_csv

    p = tmp_path / "q.csv"
    # row 2's quoted field contains a stray (unescaped) quote
    p.write_text(
        "id,name\n"
        '1,"ok"\n'
        '2,"it"s bad"\n'
        '3,"esc""aped"\n'
    )
    cols = [{"name": "id", "type": "long"},
            {"name": "name", "type": "string"}]
    # lenient policy: stray quote becomes content
    got = {r.id: r.name for r in read_csv(
        spark, [str(p)],
        {"columns": cols, "header_line": True,
         "quotes_in_quoted_fields":
             "ACCEPT_STRAY_QUOTES_ASSUMING_NO_DELIMITERS_IN_FIELDS"},
    ).collect()}
    assert got[1] == "ok" and got[3] == 'esc"aped'
    assert "it" in got[2] and "bad" in got[2]
    # strict RFC 4180 without stop_on_invalid_record: bad record skipped
    got = {r.id: r.name for r in read_csv(
        spark, [str(p)],
        {"columns": cols, "header_line": True,
         "quotes_in_quoted_fields": "ACCEPT_ONLY_RFC4180_ESCAPED"},
    ).collect()}
    assert 1 in got and 3 in got and 2 not in got
    # strict + stop_on_invalid_record: abort
    import pytest as _pytest

    with _pytest.raises(Exception):
        read_csv(
            spark, [str(p)],
            {"columns": cols, "header_line": True,
             "stop_on_invalid_record": True,
             "quotes_in_quoted_fields": "ACCEPT_ONLY_RFC4180_ESCAPED"},
        ).collect()
    # unknown policy name rejects loudly
    with _pytest.raises(ValueError, match="quotes_in_quoted_fields"):
        read_csv(
            spark, [str(p)],
            {"columns": cols, "header_line": True,
             "quotes_in_quoted_fields": "WHATEVER"},
        )


def test_liquid_longtail_tags_and_date_filter():
    """Round-4 long-tail Liquid surface (EmbulkRunner.java:369-405 runs
    the full gem): date filter (date-stamped output paths), capture,
    cycle (anonymous + named group), raw, increment/decrement with their
    own counter namespace."""
    out = P.render_liquid(
        "out/{{ d | date: '%Y/%m/%d' }}/part", params={"d": "2026-12-31"}
    )
    assert out == "out/2026/12/31/part"
    assert P.render_liquid("{{ 0 | date: '%Y-%m-%d' }}", params={}) == \
        "1970-01-01"
    assert P.render_liquid("{{ 'junk' | date: '%Y' }}", params={}) == "junk"

    out = P.render_liquid(
        "{% capture p %}pre-{{ x }}{% endcapture %}[{{ p }}]/[{{ p }}]",
        params={"x": 3},
    )
    assert out == "[pre-3]/[pre-3]"

    out = P.render_liquid(
        "{% for i in xs %}{% cycle 'odd', 'even' %} {% endfor %}",
        params={"xs": [1, 2, 3]},
    )
    assert out == "odd even odd "
    out = P.render_liquid(
        "{% for i in xs %}{% cycle 'g': 'a', 'b' %}"
        "{% cycle 'g': 'a', 'b' %}{% endfor %}",
        params={"xs": [1, 2]},
    )
    assert out == "abab"  # named group shares one counter

    out = P.render_liquid(
        "{% raw %}{{ untouched }} {% if %}{% endraw %}ok", params={}
    )
    assert out == "{{ untouched }} {% if %}ok"

    out = P.render_liquid(
        "{% increment c %}{% increment c %}{% decrement d %}"
        "{% assign c = 9 %}{% increment c %}{{ c }}",
        params={},
    )
    assert out == "01-129"
