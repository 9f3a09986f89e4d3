"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB at the same sf, compare
row count + order-insensitive values with columns sorted by name.

Usage: python tools/check_queries.py [--json out.json] [sf_dir] [query ...]

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


def main() -> int:
    import json

    argv = list(sys.argv[1:])
    json_out = None
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
            rec(name, rows_match=True, schema_match=True, hash_match=False,
                spark_rows=len(got), oracle_rows=len(want))
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
