"""Audit oracle vs Spark column TYPE KINDS for driver-hash safety.

The r04 driver gate failed 3 keys whose oracles exposed a raw integer
``sum()`` output column: DuckDB widens sum(BIGINT) to HUGEINT, a pandas
fetch floatifies that (12345 -> 12345.0), and a strict value-hash then
rejects it against Spark's int64 even though the local checker's
int-ified normalization passed.  This tool makes the hazard visible for
EVERY key: it runs each oracle on DuckDB (sf0.01), takes the pandas
dtypes, takes the Spark DataFrame's *declared* schema (lazy - no
collect), and flags any integral-vs-floating kind mismatch in either
direction.

Usage: python tools/audit_oracle_dtypes.py [sf_dir] [key ...]
Exit 1 if any mismatch.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import duckdb
import numpy as np

import __spark_entry__ as entrymod
from embulk_spark.session import get_spark

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

_INTEGRAL_SPARK = {"long", "integer", "int", "short", "byte", "bigint"}
_FLOAT_SPARK = {"double", "float"}


def spark_kind(dt) -> str:
    name = dt.simpleString()
    if name in _INTEGRAL_SPARK:
        return "int"
    if name in _FLOAT_SPARK:
        return "float"
    if name == "boolean":
        return "bool"
    if name.startswith("decimal"):
        return "decimal"
    return "other"


def pandas_kind(dtype, sample) -> str:
    if np.issubdtype(dtype, np.bool_):
        return "bool"
    if np.issubdtype(dtype, np.integer):
        return "int"
    if np.issubdtype(dtype, np.floating):
        try:
            if all(v is None or (isinstance(v, float) and v != v) for v in sample):
                return "other"  # all-null: renders as null either way
        except TypeError:
            pass
        return "float"
    # object column: could be str, Decimal (DuckDB decimal/hugeint in
    # some versions), list, ...
    for v in sample:
        if v is None:
            continue
        if isinstance(v, bool):
            return "bool"
        if isinstance(v, int):
            return "int"
        if isinstance(v, float):
            return "float"
        break
    return "other"


def main() -> int:
    argv = sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    spark = get_spark("audit_dtypes", master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    bad = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in osql:
            continue
        try:
            sdf = fn(spark, sf_dir)
            skinds = {f.name: spark_kind(f.dataType) for f in sdf.schema.fields}
        except Exception as e:  # noqa: BLE001
            print(f"ERR  {name}: spark {type(e).__name__}: {e}"[:200])
            bad += 1
            continue
        try:
            ddf = con.execute(osql[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"ERR  {name}: duckdb {e}"[:200])
            bad += 1
            continue
        msgs = []
        for col in ddf.columns:
            if col not in skinds:
                msgs.append(f"{col}: oracle-only column")
                continue
            dk = pandas_kind(ddf[col].dtype, list(ddf[col]))
            sk = skinds[col]
            # the hazard classes: numeric kind disagreement
            if {sk, dk} == {"int", "float"} or (
                sk in ("int", "float", "bool") and dk != sk and dk != "other"
            ):
                msgs.append(f"{col}: spark={sk} oracle-pandas={dk}")
        for col in skinds:
            if col not in ddf.columns:
                msgs.append(f"{col}: spark-only column")
        if msgs:
            bad += 1
            print(f"FLAG {name}: " + "; ".join(msgs))
        else:
            print(f"ok   {name}")
    print("FLAGGED:", bad)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
