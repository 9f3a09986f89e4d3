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
import re
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

def render_liquid(
    text: str,
    params: dict | None = None,
    include_dir: str | None = None,
) -> str:
    """Render the Liquid templating the reference applies to
    ``*.yml.liquid`` configs (EmbulkRunner.java:369-405): template data is
    ``{'env': ENV}`` merged with ``params``; ``include`` resolves
    ``_<name>.yml.liquid`` next to the config. Unknown variables render
    empty — Liquid's lax mode. The engine (functions/liquid.py) covers
    the block language real configs use: ``{% if/elsif/else %}``,
    ``{% unless %}``, ``{% for %}`` with ``forloop``, ``{% case/when %}``,
    ``{% assign %}``, ``{% comment %}``, filters (default/upcase/…)."""
    from .functions.liquid import render

    data: dict = {"env": dict(os.environ)}
    data.update(params or {})
    return render(text, data, include_dir)


def load_config(path_or_text: str, template_params: dict | None = None) -> dict:
    """YAML config → dict (reference EmbulkRunner.java:342-362). Files
    named ``*.yml.liquid`` are Liquid-rendered first — exactly the
    reference's rule: templating applies by extension, plain ``.yml``
    never goes through the template engine."""
    if os.path.exists(path_or_text):
        with open(path_or_text) as f:
            text = f.read()
        if path_or_text.endswith(".yml.liquid"):
            text = render_liquid(
                text, template_params, os.path.dirname(path_or_text) or "."
            )
        return yaml.safe_load(io.StringIO(text)) or {}
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
    if ftype == "dedup":
        # training-data curation in the Embulk filter chain (no reference
        # analogue — Embulk filters are per-record). method: exact keeps
        # one row (min id) per identical text; fuzzy runs MinHash-LSH →
        # connected components → keep-one canonical (operators/cluster.py).
        # NOTE fuzzy is the one filter that triggers Spark actions inside
        # the chain (the component loop iterates to convergence).
        from .operators.dedup import exact_dedup

        text, ident = fconf.get("column", "text"), fconf["id"]
        method = fconf.get("method", "exact")
        if method == "exact":
            return exact_dedup(df, text, ident)
        if method == "fuzzy":
            from .operators.cluster import dup_clusters, keep_canonical

            comps = dup_clusters(
                df, text, ident,
                k=int(fconf.get("k", 16)),
                bands=int(fconf.get("bands", 4)),
                threshold=float(fconf.get("threshold", 0.5)),
            )
            return keep_canonical(df, comps, ident, prefer=fconf.get("prefer"))
        if method == "paragraphs":
            # CCNet-style sub-document dedup: keeps every row, rewrites
            # `column` with cross-doc duplicated paragraphs removed
            # (global first occurrence survives); adds n_paras_dropped.
            from .operators.dedup import dedup_paragraphs

            return dedup_paragraphs(
                df, text, ident,
                sep=fconf.get("sep", "\n"),
                min_docs=int(fconf.get("min_docs", 2)),
                normalize=bool(fconf.get("normalize", True)),
            )
        if method == "substrings":
            # ExactSubstr-style sub-paragraph dedup: keeps every row,
            # rewrites `column` with duplicated k-token spans cut (global
            # first occurrence survives); adds n_dup_spans /
            # n_tokens_dropped audit columns.
            from .operators.substr import substring_dedup

            return substring_dedup(
                df, text, ident,
                k=int(fconf.get("k", 8)),
                min_count=int(fconf.get("min_count", 2)),
            )
        raise ValueError(f"unknown dedup method: {method}")
    if ftype == "sessionize":
        from .operators.sessions import sessionize

        return sessionize(
            df,
            fconf["key"],
            fconf.get("ts", "ts"),
            int(fconf.get("gap_seconds", 1800)),
            tiebreak=fconf.get("tiebreak"),
        )
    if ftype == "quality":
        # append quality-scoring feature columns (all JVM-side Columns);
        # optional thresholds turn it into a Gopher-style keep filter:
        # {"min_tokens": 50, "max_mean_token_len": 10, "min_alpha_ratio":
        #  0.6, "min_stopword_ratio": 0.01, "keep_features": false}
        from .functions.textops import quality_features

        feats = quality_features(F.col(fconf.get("column", "text")))
        out = df.select("*", *feats)
        bounds = [
            ("min_chars", "n_chars_m", ">="), ("max_chars", "n_chars_m", "<="),
            ("min_tokens", "n_tokens", ">="), ("max_tokens", "n_tokens", "<="),
            ("min_mean_token_len", "mean_token_len", ">="),
            ("max_mean_token_len", "mean_token_len", "<="),
            ("max_punct_ratio", "punct_ratio", "<="),
            ("min_alpha_ratio", "alpha_ratio", ">="),
            ("min_stopword_ratio", "stopword_ratio", ">="),
        ]
        had_threshold = False
        for key, col, op in bounds:
            if key in fconf:
                had_threshold = True
                c = F.col(col)
                out = out.filter(
                    c >= float(fconf[key]) if op == ">=" else c <= float(fconf[key])
                )
        if had_threshold and not fconf.get("keep_features", True):
            out = out.drop("n_chars_m", "n_tokens", "mean_token_len",
                           "punct_ratio", "alpha_ratio", "stopword_ratio")
        return out
    if ftype == "c4":
        # C4 page cleanup (Raffel et al. §2.2) as a config filter:
        # rewrites `column` to the kept lines; `keep_only: true` drops
        # pages failing the page-level verdict; features optional
        from .functions.textops import c4_cols

        feats = c4_cols(
            F.col(fconf.get("column", "text")),
            min_words=int(fconf.get("min_words_per_line", 5)),
            min_sentences=int(fconf.get("min_sentences", 3)),
        )
        out = df.select("*", *feats)
        if fconf.get("keep_only", True):
            out = out.filter(F.col("c4_keep"))
        out = out.withColumn(fconf.get("column", "text"), F.col("clean_text"))
        if not fconf.get("keep_features", False):
            out = out.drop("clean_text", "n_kept_lines", "n_sentences",
                           "page_flagged", "c4_keep")
        return out
    if ftype == "gopher":
        # Gopher quality rules (Rae et al. App. A) as a config filter:
        # drops documents failing the keep verdict; thresholds override
        # the published defaults (min_words/max_words/...)
        from .functions.textops import gopher_cols

        known = {
            "min_words", "max_words", "min_mean_word_len",
            "max_mean_word_len", "max_symbol_word_ratio",
            "max_bullet_line_frac", "max_ellipsis_line_frac",
            "min_alpha_word_frac", "min_stop_hits",
        }
        kw = {k: fconf[k] for k in known if k in fconf}
        feats = gopher_cols(F.col(fconf.get("column", "text")), **kw)
        out = df.select("*", *feats).filter(F.col("gopher_keep"))
        if not fconf.get("keep_features", False):
            out = out.drop(
                "n_words", "mean_word_len", "bullet_line_frac",
                "ellipsis_line_frac", "alpha_word_frac", "stop_hits",
                "ok_word_count", "ok_mean_word_len", "ok_symbol_ratio",
                "ok_line_shape", "ok_alpha_words", "ok_stop_words",
                "gopher_keep",
            )
        return out
    if ftype == "pii_redact":
        # PII scrubbing (functions/textops.py::redact_pii): rewrite
        # `column` with email/phone/ipv4 matches replaced by <TAG>;
        # `audit: true` appends per-kind match counts (n_email, ...)
        # computed from the PRE-redaction text. Chained JVM
        # regexp_replace — no shuffle, no Python.
        from .functions.textops import pii_counts, redact_pii

        col = fconf.get("column", "text")
        out = df
        if fconf.get("audit"):
            out = out.select("*", *pii_counts(F.col(col)))
        return out.withColumn(col, redact_pii(F.col(col)))
    if ftype == "decontaminate":
        # benchmark decontamination (operators/dedup.py::benchmark_overlap):
        # drop documents whose n-gram overlap with an eval corpus exceeds
        # `max_overlap`. `bench` is a parquet path (eval sets are external);
        # `bench_text` its text column. Docs shorter than the shingle
        # width cannot be contaminated and always survive.
        from .operators.dedup import benchmark_overlap

        bench = df.sparkSession.read.parquet(fconf["bench"])
        stats = benchmark_overlap(
            df, bench, fconf.get("column", "text"), fconf["id"],
            shingle_n=int(fconf.get("shingle_n", 8)),
            bench_text_col=fconf.get("bench_text"),
        )
        bad = stats.filter(
            F.col("overlap_frac") > float(fconf.get("max_overlap", 0.0))
        ).select(fconf["id"])
        return df.join(bad, fconf["id"], "left_anti")
    if ftype == "sample":
        # deterministic corpus sampling (operators/sample.py): flat `rate`
        # or per-stratum `rates` keyed by `strata` column values. Same
        # rows every run/partitioning — safe inside a resumable pipeline
        # (a retried task re-selects identical rows).
        from .operators.sample import deterministic_sample, stratified_sample

        ident = fconf["id"]
        salt = str(fconf.get("salt", "mix1"))
        if "rates" in fconf:
            strata = fconf["strata"]
            strata = [strata] if isinstance(strata, str) else list(strata)
            rates = {
                tuple(k.split("|")) if len(strata) > 1 else k: float(v)
                for k, v in fconf["rates"].items()
            }
            return stratified_sample(
                df, strata, rates, ident, salt=salt,
                default_rate=float(fconf.get("default_rate", 0.0)),
            )
        return deterministic_sample(df, float(fconf["rate"]), ident, salt=salt)
    if ftype == "normalize":
        # unicode text normalization (functions/textops.py): fold
        # zero-width/control chars, unicode spaces/quotes/dashes/
        # ellipsis, tidy whitespace — the pre-hash cleanup before any
        # dedup pass. Pure JVM regexp_replace chain.
        from .functions.textops import normalize_text

        col = fconf.get("column", "text")
        return df.withColumn(col, normalize_text(F.col(col)))
    if ftype == "chunk":
        # context-length chunking (operators/pack.py): one row per
        # strided token window; replaces `column` rows with chunk rows.
        from .operators.pack import chunk_documents

        return chunk_documents(
            df, fconf.get("column", "text"), fconf["id"],
            max_tokens=int(fconf["max_tokens"]),
            stride=int(fconf["stride"]) if "stride" in fconf else None,
        )
    if ftype == "pack":
        # concat-and-chunk token packing (operators/pack.py): append
        # global_offset / seq_id / offset_in_seq / spans_boundary in a
        # deterministic (salt, id) order; `budget` tokens per sequence.
        from .operators.pack import pack_token_budget

        return pack_token_budget(
            df, fconf["id"],
            budget=int(fconf["budget"]),
            text_col=fconf.get("column", "text")
            if "token_count_column" not in fconf else None,
            token_count_col=fconf.get("token_count_column"),
            n_buckets=int(fconf.get("n_buckets", 256)),
            salt=str(fconf.get("salt", "pack1")),
        )
    if ftype == "validate":
        # data-quality constraint gate (operators/validate.py):
        # Embulk's stop_on_invalid_record generalized to named rules.
        # policy fail = all-or-nothing transaction abort (the Embulk
        # default contract), drop = skip invalid records, tag = annotate.
        from .operators.validate import validate

        return validate(
            df, fconf["rules"], policy=fconf.get("policy", "fail")
        )
    if ftype == "row":
        # embulk-filter-row: per-row predicate chain (conditions AND/OR)
        from .operators.rowops import row_filter

        return row_filter(
            df, fconf.get("conditions", []), fconf.get("condition", "AND")
        )
    if ftype == "column":
        # embulk-filter-column: keep+reorder / add / drop with src+default
        from .operators.rowops import column_ops

        return column_ops(
            df,
            fconf.get("columns"),
            fconf.get("add_columns"),
            fconf.get("drop_columns"),
        )
    if ftype == "typecast":
        # embulk-filter-typecast: re-type with the coercion-setter matrix
        from .operators.rowops import typecast_columns

        return typecast_columns(df, fconf["columns"])
    if ftype == "add_time":
        # embulk-filter-add_time: materialize an event-time column
        from .operators.rowops import add_time

        return add_time(df, fconf)
    if ftype == "hash":
        # embulk-filter-hash: one-way digest for PII columns
        from .operators.rowops import hash_columns

        return hash_columns(df, fconf["columns"])
    if ftype == "gsub":
        # per-column global regexp replace
        from .operators.rowops import gsub_columns

        return gsub_columns(df, fconf["columns"])
    if ftype == "eval":
        # ecosystem filter-ruby/-eval family → Catalyst SQL expressions
        # (codegen'd, pushdown-able — never a per-row interpreter)
        from .operators.rowops import eval_columns

        return eval_columns(df, fconf)
    if ftype == "flatten_json":
        # embulk-filter-flatten_json: one row per element of a JSON array
        from .operators.rowops import flatten_json

        # RFC 6901: the ROOT pointer is the empty string (maps to '$');
        # '/' would address the empty-string key
        return flatten_json(
            df,
            fconf.get("json_column_name", "record"),
            fconf.get("array_root", ""),
            fconf.get("expanded_columns", []),
            fconf.get("keep_expanding_json_column", False),
        )
    if ftype == "base64":
        # embulk-filter-base64: per-column encode/decode
        from .operators.rowops import base64_columns

        return base64_columns(df, fconf["columns"])
    if ftype == "join_file":
        # embulk-filter-join_file: broadcast lookup join against a small
        # master file — the stream side never shuffles
        from .operators.rowops import join_file

        return join_file(df, fconf)
    if ftype == "split":
        # embulk-filter-split: delimited column → one row per element
        from .operators.rowops import split_rows

        return split_rows(
            df,
            fconf["target_key"],
            fconf.get("delimiter", ","),
            fconf.get("keep_input", False),
            fconf.get("trim", True),
        )
    if ftype == "expand_json":
        # embulk-filter-expand_json: one json column → typed columns
        from .operators.rowops import expand_json

        return expand_json(
            df,
            fconf.get("json_column_name", "record"),
            fconf.get("expanded_columns", []),
            fconf.get("root"),
            fconf.get("keep_expanding_json_column", False),
        )
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
    spark: SparkSession, in_conf: dict, diff_in: dict | None,
    *, for_preview: bool = False,
) -> tuple[DataFrame, dict]:
    itype = in_conf.get("type", "file")
    if itype == "file":
        last = (diff_in or {}).get("last_path") or in_conf.get("last_path")
        return read_input_files(spark, in_conf, last)
    if itype == "config":
        return inline_records(spark, in_conf), {}
    if itype == "parquet":
        df = spark.read.parquet(in_conf["path"])
        inc = in_conf.get("incremental_columns")
        if in_conf.get("incremental") and inc:
            # embulk-input-jdbc incremental contract: resume strictly
            # after the remembered last_record tuple (sources/cursor.py)
            from .sources.cursor import incremental_scan

            last = (diff_in or {}).get("last_record") or in_conf.get("last_record")
            # preview throws the ConfigDiff away — skip the cursor agg job
            return incremental_scan(df, inc, last, compute_cursor=not for_preview)
        return df, {}
    raise ValueError(f"unknown input type: {itype}")


def run(spark: SparkSession, config: dict, config_diff: dict | None = None) -> dict:
    """Execute the pipeline once; return the next run's ConfigDiff
    (nested under in:/out: like BulkLoader.java:299-317). The out: diff
    merges into the next run's out: config the same way in: does — the
    lake sink uses it to advance its epoch, so a `run --config-diff`
    loop is an incremental exactly-once ingest."""
    df, diff_in = _input_frame(spark, config["in"], (config_diff or {}).get("in"))
    df = apply_filters(df, config.get("filters"))
    out_conf = config.get("out", {"type": "stdout"})
    if config_diff and config_diff.get("out"):
        out_conf = deep_merge(out_conf, config_diff["out"])
    report = write_output(df, out_conf)
    return {"in": diff_in, "out": report.get("config_diff", {})}


# ---------------------------------------------------------------------------
# resumable batch run (reference ResumeState: exec/BulkLoader.java:584-659,
# driven by EmbulkRunner.java:278-327 — re-run only tasks without committed
# reports). Embulk's task unit is one input file; ours is a deterministic
# GROUP of input files (one Spark job per group keeps jobs big enough to
# saturate the cluster while bounding re-done work after a crash).
# ---------------------------------------------------------------------------

def _load_resume(resume_path: str) -> dict:
    if os.path.exists(resume_path):
        import json as _json

        with open(resume_path) as f:
            return _json.load(f)
    return {"committed": {}}


def _save_resume(resume_path: str, state: dict) -> None:
    """Crash-safe write: tmp + fsync + atomic rename (the resume file is
    the transaction log; a torn write must not lose committed groups)."""
    import json as _json
    import uuid as _uuid

    tmp = f"{resume_path}.tmp.{_uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        _json.dump(state, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, resume_path)


def run_resumable(
    spark: SparkSession,
    config: dict,
    resume_path: str,
    *,
    files_per_commit: int = 16,
    max_commits: int | None = None,
) -> dict:
    """Run a file→file pipeline as a sequence of per-file-group
    transactions logged in ``resume_path``; a killed run re-invoked with
    the same resume file skips committed groups and produces output
    byte-identical to a clean run (grouping is deterministic).

    Each group commits by writing its output under
    ``out.path_prefix/g{idx}/`` (Spark's file committer makes the
    directory appear complete-or-absent) — or, with a ``lake`` output,
    as lake epoch ``idx``, whose committed-epoch set independently
    dedups re-runs — and then recording the group in
    the resume file (atomic rename). A crash between the two re-runs the
    group: the overwrite mode makes that idempotent. The group fingerprint
    (sorted file list hash) is checked on resume — resuming against a
    changed input set fails loudly, like the reference refusing to resume
    with a mismatched ResumeState (exec/BulkLoader.java:601-612).

    Returns the ConfigDiff with ``done``: True once every group committed
    (``max_commits`` bounds work per invocation — also the fault-injection
    hook for tests)."""
    import hashlib as _hashlib

    from .sources.files import read_csv, read_json, read_ltsv, read_regexp

    in_conf = config["in"]
    if in_conf.get("type", "file") != "file":
        raise ValueError("run_resumable requires a file input")
    out_conf = config.get("out", {})
    if out_conf.get("type") not in ("file", "lake"):
        raise ValueError("run_resumable requires a file or lake output")

    paths = list_input_files(in_conf["path_prefix"], in_conf.get("last_path"), spark)
    groups = [
        paths[i:i + files_per_commit]
        for i in range(0, len(paths), files_per_commit)
    ]
    state = _load_resume(resume_path)

    parser = dict(in_conf.get("parser", {"type": "csv", "columns": []}))
    for k in ("charset", "newline"):
        if k in in_conf and k not in parser:
            parser[k] = in_conf[k]
    ptype = parser.get("type", "csv")
    read_group = {
        "csv": read_csv,
        "json": read_json,
        "regexp": read_regexp,
        "ltsv": read_ltsv,
    }.get(ptype, read_json)

    n_done = 0
    is_lake = out_conf.get("type") == "lake"
    base_prefix = None if is_lake else out_conf["path_prefix"]
    for gi, group in enumerate(groups):
        key = f"g{gi:05d}"
        # fingerprint covers path + size + mtime: a rewritten input file in
        # a committed group fails loudly instead of resuming stale output
        fp = _hashlib.md5(
            "\n".join(
                f"{p}:{os.path.getsize(p)}:{os.stat(p).st_mtime_ns}"
                for p in group
            ).encode()
        ).hexdigest()[:16]
        committed = state["committed"].get(key)
        if committed:
            if committed["fingerprint"] != fp:
                raise RuntimeError(
                    f"resume state mismatch for {key}: input files changed "
                    f"since the interrupted run (have {committed['fingerprint']},"
                    f" now {fp}) — clean the resume file to start over"
                )
            continue
        if max_commits is not None and n_done >= max_commits:
            break
        df = read_group(spark, group, parser)
        df = apply_filters(df, config.get("filters"))
        if is_lake:
            # group index = epoch: the lake's committed-epoch set makes a
            # crash between the lake commit and the resume-file write
            # harmless — the re-run's merge_epoch(gi) skips as a
            # duplicate, so the two logs can't double-apply a group
            sub_out = dict(out_conf, epoch=gi)
        else:
            sub_out = dict(
                out_conf, path_prefix=os.path.join(base_prefix, key)
            )
        write_output(df, sub_out)
        state["committed"][key] = {"fingerprint": fp, "files": len(group)}
        _save_resume(resume_path, state)
        n_done += 1

    done = len(state["committed"]) == len(groups)
    # the last_path cursor advances ONLY on completion: a partial run must
    # leave the next invocation seeing the same input set, else the
    # ConfigDiff written by the CLI would filter the unprocessed files out
    # and the run could never finish (or report done with data missing)
    new_last = (
        max(paths) if (done and paths) else in_conf.get("last_path")
    )
    return {
        "in": {"last_path": new_last},
        "out": {},
        "done": done,
        "groups_total": len(groups),
        "groups_committed": len(state["committed"]),
    }


def preview(spark: SparkSession, config: dict, n: int = PREVIEW_ROWS) -> DataFrame:
    """First ``n`` rows after filters; side-effect free
    (exec/PreviewExecutor.java:66 forPreview session ≈ we never touch out:)."""
    df, _ = _input_frame(spark, config["in"], None, for_preview=True)
    return apply_filters(df, config.get("filters")).limit(n)


def sample_bytes(in_conf: dict) -> bytes:
    """32 KiB head sample from the LARGEST candidate file (the reference
    samples the biggest file's head: exec/SamplingParserPlugin.java:35-98).
    ``sample_buffer_bytes`` overrides the budget and accepts ByteSize
    strings like ``"64KB"`` (spi/unit/ByteSize.java)."""
    from .functions.units import parse_byte_size

    budget = parse_byte_size(in_conf.get("sample_buffer_bytes", GUESS_SAMPLE_BYTES))
    paths = list_input_files(in_conf["path_prefix"])
    if not paths:
        raise FileNotFoundError(f"no input files for {in_conf['path_prefix']!r}")
    biggest = max(paths, key=os.path.getsize)
    with open(biggest, "rb") as f:
        sample = f.read(budget)
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
