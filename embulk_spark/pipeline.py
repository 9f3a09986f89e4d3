"""YAML pipeline config → Spark plan: the run/guess/preview lifecycle.

This is the Spark-native re-expression of Embulk's top-level entry points
(reference cli/EmbulkRun.java:23-120 → EmbulkRunner.runInternal at
EmbulkRunner.java:231-335 → BulkLoader.doRun at exec/BulkLoader.java:512-582):

- ``run``: in → filters → out, returning a **ConfigDiff** (the incremental
  cursor, exec/BulkLoader.java:299-317) that the caller merges into the next
  run's config (EmbulkRunner.java:252-258) — here via :func:`deep_merge`,
  which mirrors DataSourceImpl's recursive merge
  (embulk-deps/.../config/DataSourceImpl.java:229-282).
- ``guess``: sample head bytes of the first input file, run the
  compression→json→csv inference chain to a fixed point
  (exec/GuessExecutor.java:142-195, chain order build.gradle:197), and
  return the completed config.
- ``preview``: the first 15 rows after filters
  (exec/PreviewExecutor.java:45-47) — Catalyst's CollectLimit replaces the
  reference's error-driven early abort (PreviewedNoticeError).

There is no plugin classloader machinery (reference plugin/*): the type
registry is a plain dict, and "loading a plugin" is a function lookup.
Crucially the *plan* stays declarative — every stage only stacks DataFrame
transformations, so Catalyst still sees one tree per run (filters fuse into
the scan; a preview pushes its limit into the source).
"""

from __future__ import annotations

import io
import os
from typing import Any

import yaml
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.guess import guess_bytes
from .sinks.files import write_output
from .sources.files import inline_records, list_input_files, read_input_files

GUESS_SAMPLE_BYTES = 32 * 1024  # exec/GuessExecutor.java:308
GUESS_MIN_SAMPLE_BYTES = 40  # exec/SamplingParserPlugin.java:138
PREVIEW_ROWS = 15  # exec/PreviewExecutor.java:45-47


# ---------------------------------------------------------------------------
# config handling
# ---------------------------------------------------------------------------

def load_config(path_or_text: str) -> dict:
    """YAML config → dict (reference EmbulkRunner.java:342-362; the Liquid
    template pass is intentionally out of scope)."""
    if os.path.exists(path_or_text):
        with open(path_or_text) as f:
            return yaml.safe_load(f) or {}
    return yaml.safe_load(io.StringIO(path_or_text)) or {}


def dump_config(config: dict) -> str:
    return yaml.safe_dump(config, sort_keys=False, allow_unicode=True)


def deep_merge(base: Any, other: Any) -> Any:
    """Recursive merge, other wins: nested objects merge per-key, arrays
    merge element-wise (DataSourceImpl.java:229-282 semantics)."""
    if isinstance(base, dict) and isinstance(other, dict):
        out = dict(base)
        for k, v in other.items():
            out[k] = deep_merge(base[k], v) if k in base else v
        return out
    if isinstance(base, list) and isinstance(other, list):
        out = [
            deep_merge(b, o) for b, o in zip(base, other)
        ]
        longer = base if len(base) > len(other) else other
        return out + longer[len(out):]
    return other


# ---------------------------------------------------------------------------
# filters (the Embulk filter chain: data flows filter[0]→filter[1]→…,
# reference spi/util/FiltersInternal.java:46-56)
# ---------------------------------------------------------------------------

def apply_filter(df: DataFrame, fconf: dict) -> DataFrame:
    ftype = fconf["type"]
    if ftype == "remove_columns":
        # embulk-filter-remove_columns (build.gradle:17): drop OR keep
        if "remove" in fconf:
            return df.drop(*[c for c in fconf["remove"] if c in df.columns])
        if "keep" in fconf:
            return df.select(*[c for c in fconf["keep"] if c in df.columns])
        return df
    if ftype == "rename":
        # embulk-filter-rename (build.gradle:18): explicit map first, then
        # rule-based passes (lower/upper/regex) applied in order.
        for old, new in (fconf.get("columns") or {}).items():
            if old in df.columns:
                df = df.withColumnRenamed(old, new)
        for rule in fconf.get("rules") or []:
            df = _apply_rename_rule(df, rule)
        return df
    if ftype == "extract_text":
        # the engine's vectorized parser-chain analogue: html → text (+lang)
        from .functions.extract import extract_text, lang_id

        src = fconf.get("source", "html")
        df = df.withColumn(fconf.get("target", "text"), extract_text(F.col(src)))
        if fconf.get("lang_column"):
            df = df.withColumn(fconf["lang_column"], lang_id(F.col(fconf.get("target", "text"))))
        return df
    raise ValueError(f"unknown filter type: {ftype}")


def _apply_rename_rule(df: DataFrame, rule: dict) -> DataFrame:
    import re as _re

    kind = rule["rule"]
    mapping: dict[str, str] = {}
    for c in df.columns:
        if kind == "lower_to_upper":
            mapping[c] = c.upper()
        elif kind == "upper_to_lower":
            mapping[c] = c.lower()
        elif kind == "regex_replace":
            mapping[c] = _re.sub(rule["match"], rule["replace"], c)
        elif kind == "first_character_types":
            pass
        else:
            raise ValueError(f"unknown rename rule: {kind}")
    for old, new in mapping.items():
        if new != old:
            df = df.withColumnRenamed(old, new)
    return df


def apply_filters(df: DataFrame, filters: list[dict] | None) -> DataFrame:
    for fconf in filters or []:
        df = apply_filter(df, fconf)
    return df


# ---------------------------------------------------------------------------
# lifecycle: run / guess / preview
# ---------------------------------------------------------------------------

def _input_frame(
    spark: SparkSession, in_conf: dict, diff_in: dict | None
) -> tuple[DataFrame, dict]:
    itype = in_conf.get("type", "file")
    if itype == "file":
        last = (diff_in or {}).get("last_path") or in_conf.get("last_path")
        return read_input_files(spark, in_conf, last)
    if itype == "config":
        return inline_records(spark, in_conf), {}
    if itype == "parquet":
        return spark.read.parquet(in_conf["path"]), {}
    raise ValueError(f"unknown input type: {itype}")


def run(spark: SparkSession, config: dict, config_diff: dict | None = None) -> dict:
    """Execute the pipeline once; return the next run's ConfigDiff
    (nested under in:/out: like BulkLoader.java:299-317)."""
    df, diff_in = _input_frame(spark, config["in"], (config_diff or {}).get("in"))
    df = apply_filters(df, config.get("filters"))
    report = write_output(df, config.get("out", {"type": "stdout"}))
    return {"in": diff_in, "out": {}}


def preview(spark: SparkSession, config: dict, n: int = PREVIEW_ROWS) -> DataFrame:
    """First ``n`` rows after filters; side-effect free
    (exec/PreviewExecutor.java:66 forPreview session ≈ we never touch out:)."""
    df, _ = _input_frame(spark, config["in"], None)
    return apply_filters(df, config.get("filters")).limit(n)


def sample_bytes(in_conf: dict) -> bytes:
    """32 KiB head sample from the LARGEST candidate file (the reference
    samples the biggest file's head: exec/SamplingParserPlugin.java:35-98)."""
    paths = list_input_files(in_conf["path_prefix"])
    if not paths:
        raise FileNotFoundError(f"no input files for {in_conf['path_prefix']!r}")
    biggest = max(paths, key=os.path.getsize)
    with open(biggest, "rb") as f:
        sample = f.read(GUESS_SAMPLE_BYTES)
    if len(sample) < GUESS_MIN_SAMPLE_BYTES:
        raise ValueError(
            f"sample is too small ({len(sample)} bytes < {GUESS_MIN_SAMPLE_BYTES})"
        )
    return sample


def guess(spark: SparkSession, config: dict) -> dict:
    """Complete the config by inference: compression → json → csv chain to
    a fixed point (exec/GuessExecutor.java:142-195), merged over the user
    config so explicit settings win (ConfigDiff merge order)."""
    in_conf = config["in"]
    if in_conf.get("type", "file") != "file":
        return config
    sample = sample_bytes(in_conf)
    guessed = guess_bytes(sample, in_conf)
    out = dict(config)
    # user-declared fields win over guessed ones (ConfigDiff merge order):
    out["in"] = deep_merge(guessed, in_conf)
    return out
