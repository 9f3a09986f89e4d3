"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB at the same sf, compare
row count + order-insensitive values with columns sorted by name.

Usage: python tools/check_queries.py [--json out.json] [--dump-diff]
       [sf_dir] [query ...]

Strictness: beyond the order-insensitive value compare, any numeric-kind
disagreement between the Spark and DuckDB pandas frames (int vs float on
a non-all-null column) FAILS — the r04 driver gate proved a stricter
hasher rejects e.g. DuckDB hugeint->70.0 vs Spark int64 70 even when the
int-ified strings match. --dump-diff prints the canonical rows unique to
each side on a value mismatch.

--json writes a per-key log in the driver's CORRECTNESS_r{N}.json
schema (rows_match / schema_match / hash_match / spark_rows /
oracle_rows / err), so every round can commit a FULL-registry record
(e.g. CORRECTNESS_LOCAL_r03.json) instead of relying on the driver's
sample.
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, ".")

import duckdb
import pandas as pd

import __spark_entry__ as entrymod
from embulk_spark.session import get_spark

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def norm_cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "∅"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.6g}"
    if isinstance(v, bool):
        return str(bool(v))
    return str(v)


def canon(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(norm_cell(v) for v in row) for row in df[cols].itertuples(index=False)]
    return sorted(rows)


def _col_kind(s: pd.Series) -> str:
    """Coarse value-kind of a pandas column: int/float/bool/other, or
    'null' when every value is null (then any representation hashes
    alike)."""
    import numpy as np

    d = s.dtype
    if np.issubdtype(d, np.bool_):
        return "bool"
    if np.issubdtype(d, np.integer):
        return "int"
    if np.issubdtype(d, np.floating):
        return "null" if s.isna().all() else "float"
    for v in s:
        if v is None or (isinstance(v, float) and math.isnan(v)):
            continue
        if isinstance(v, bool):
            return "bool"
        if isinstance(v, (int,)):
            return "int"
        if isinstance(v, (float,)):
            return "float"
        return "other"
    return "null"


def kind_mismatches(got: pd.DataFrame, want: pd.DataFrame) -> list[str]:
    """Numeric-kind disagreements the int-ifying norm_cell would hide
    but a strict driver-side hasher rejects — the r04 failure mode
    (DuckDB hugeint -> pandas float 70.0 vs Spark int64 70). All-null
    columns are exempt (both render as null either way)."""
    out = []
    for c in got.columns:
        kg, kw = _col_kind(got[c]), _col_kind(want[c])
        if "null" in (kg, kw) or kg == kw:
            continue
        # int-with-nulls legitimately floatifies on BOTH sides via
        # pandas; if one side kept ints it means the other side's nulls
        # are the only difference-driver — still a real hazard.
        out.append(f"{c}: spark={kg} oracle={kw}")
    return out


def dump_diff(name: str, g: list[tuple], w: list[tuple], cols: list[str], n: int = 20):
    """Print up to n canonical rows unique to each side, column-labelled,
    so a single gate log localizes a value divergence."""
    gs, ws = set(g), set(w)
    only_g, only_w = sorted(gs - ws)[:n], sorted(ws - gs)[:n]
    print(f"  --dump-diff {name}: {len(gs - ws)} spark-only / {len(ws - gs)} oracle-only canonical rows")
    for side, rows in (("spark ", only_g), ("oracle", only_w)):
        for r in rows:
            cells = ", ".join(f"{c}={v}" for c, v in zip(cols, r))
            print(f"  {side}> {cells[:500]}")


def main() -> int:
    import json

    argv = list(sys.argv[1:])
    json_out = None
    want_dump = "--dump-diff" in argv
    if want_dump:
        argv.remove("--dump-diff")
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    log: dict = {}
    spark = get_spark("check_queries", master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    def rec(name, **kw):
        base = {
            "rows_match": None, "schema_match": None, "hash_match": None,
            "spark_rows": None, "oracle_rows": None, "err": None,
        }
        base.update(kw)
        log[name] = base

    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            rec(name, err=f"spark: {type(e).__name__}: {e}"[:300])
            failures += 1
            continue
        if name not in osql:
            print(f"rows-only {name}: {len(got)} rows")
            rec(name, spark_rows=len(got), err=None)
            continue
        try:
            want = con.execute(osql[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error {e}")
            rec(name, spark_rows=len(got), err=f"duckdb: {e}"[:300])
            failures += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rowcount spark={len(got)} duckdb={len(want)}")
            rec(name, rows_match=False, spark_rows=len(got),
                oracle_rows=len(want))
            failures += 1
            continue
        if sorted(got.columns) != sorted(want.columns):
            print(
                f"FAIL {name}: columns spark={sorted(got.columns)} duckdb={sorted(want.columns)}"
            )
            rec(name, rows_match=True, schema_match=False,
                spark_rows=len(got), oracle_rows=len(want))
            failures += 1
            continue
        g, w = canon(got), canon(want)
        if g != w:
            bad = [i for i, (a, b) in enumerate(zip(g, w)) if a != b][:3]
            print(f"FAIL {name}: value mismatch; first diffs:")
            for i in bad:
                print(f"  spark : {g[i]}\n  duckdb: {w[i]}")
            if want_dump:
                dump_diff(name, g, w, sorted(got.columns))
            rec(name, rows_match=True, schema_match=True, hash_match=False,
                spark_rows=len(got), oracle_rows=len(want))
            failures += 1
        elif kinds := kind_mismatches(got, want):
            # values agree under the int-ifying normalization but the
            # numeric kinds differ — a strict driver hasher fails this
            # (r04: substring_dedup/corpus_export/token_packing)
            print(f"FAIL {name}: numeric-kind mismatch: " + "; ".join(kinds))
            rec(name, rows_match=True, schema_match=True, hash_match=False,
                spark_rows=len(got), oracle_rows=len(want),
                err="kind: " + "; ".join(kinds)[:260])
            failures += 1
        else:
            print(f"OK   {name}: {len(got)} rows")
            rec(name, rows_match=True, schema_match=True, hash_match=True,
                spark_rows=len(got), oracle_rows=len(want))
    print("FAILURES:", failures)
    if json_out:
        with open(json_out, "w") as f:
            json.dump(log, f, indent=2)
        print(f"wrote {json_out} ({len(log)} keys)")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
