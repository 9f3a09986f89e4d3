"""Archive decoder chain: zip / tar(.gz/.xz) / single-stream xz → parser.

Reference analogue: embulk-decoder-commons-compress (ecosystem) composed
per spi/util/DecodersInternal.java:28-41; per-member header skip mirrors
Embulk's per-file-task parser behavior.
"""

from __future__ import annotations

import io
import lzma
import tarfile
import zipfile

import pytest

CSV_A = "id,name\n1,alpha\n2,beta\n"
CSV_B = "id,name\n3,gamma\n"

PARSER = {
    "type": "csv",
    "header_line": True,
    "columns": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": "string"},
    ],
}


def _read(spark, path, parser=PARSER):
    from embulk_spark.sources.archives import read_archive

    return read_archive(spark, [str(path)], parser)


def test_zip_members_with_header_skip(spark, tmp_path):
    p = tmp_path / "data.zip"
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("a.csv", CSV_A)
        zf.writestr("sub/b.csv", CSV_B)
        zf.writestr("dir/", "")  # directory entry must be skipped
    got = sorted((r.id, r.name) for r in _read(spark, p).collect())
    assert got == [(1, "alpha"), (2, "beta"), (3, "gamma")]


def test_tar_gz_and_tar_xz(spark, tmp_path):
    for ext, mode in (("tar.gz", "w:gz"), ("tar.xz", "w:xz")):
        p = tmp_path / f"data.{ext}"
        with tarfile.open(p, mode) as tf:
            for name, body in (("a.csv", CSV_A), ("b.csv", CSV_B)):
                info = tarfile.TarInfo(name)
                raw = body.encode()
                info.size = len(raw)
                tf.addfile(info, io.BytesIO(raw))
        got = sorted((r.id, r.name) for r in _read(spark, p).collect())
        assert got == [(1, "alpha"), (2, "beta"), (3, "gamma")]


def test_single_stream_xz_csv(spark, tmp_path):
    p = tmp_path / "data.csv.xz"
    p.write_bytes(lzma.compress(CSV_A.encode()))
    got = sorted((r.id, r.name) for r in _read(spark, p).collect())
    assert got == [(1, "alpha"), (2, "beta")]


def test_archive_lines_provenance(spark, tmp_path):
    from embulk_spark.sources.archives import read_archive_lines

    p = tmp_path / "data.zip"
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("x.txt", "l1\nl2\n")
    rows = read_archive_lines(spark, [str(p)]).collect()
    assert [(r.member, r.line_no, r.value) for r in rows] == [
        ("x.txt", 1, "l1"),
        ("x.txt", 2, "l2"),
    ]
    assert all(r.path.endswith("data.zip") for r in rows)


def test_archive_json_and_ltsv_parsers(spark, tmp_path):
    p = tmp_path / "logs.zip"
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("a.jsonl", '{"id": 1, "name": "x"}\n{"id": 2, "name": "y"}\n')
    parser = {
        "type": "json",
        "columns": [
            {"name": "id", "type": "long"},
            {"name": "name", "type": "string"},
        ],
    }
    got = sorted((r.id, r.name) for r in _read(spark, p, parser).collect())
    assert got == [(1, "x"), (2, "y")]

    p2 = tmp_path / "logs2.zip"
    with zipfile.ZipFile(p2, "w") as zf:
        zf.writestr("a.ltsv", "host:h1\tcode:200\nhost:h2\tcode:404\n")
    parser2 = {
        "type": "ltsv",
        "columns": [
            {"name": "host", "type": "string"},
            {"name": "code", "type": "long"},
        ],
    }
    got2 = sorted((r.host, r.code) for r in _read(spark, p2, parser2).collect())
    assert got2 == [("h1", 200), ("h2", 404)]


def test_pipeline_decoder_config_roundtrip(spark, tmp_path):
    """Full chain through read_input_files with a decoders: config."""
    from embulk_spark.sources.files import read_input_files

    p = tmp_path / "in.zip"
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("a.csv", CSV_A)
    df, diff = read_input_files(
        spark,
        {
            "path_prefix": str(tmp_path / "in"),
            "decoders": [{"type": "archive"}],
            "parser": PARSER,
        },
    )
    assert sorted((r.id, r.name) for r in df.collect()) == [
        (1, "alpha"), (2, "beta"),
    ]
    assert diff["last_path"] == str(p)
