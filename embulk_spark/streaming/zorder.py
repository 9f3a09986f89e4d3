"""Z-order (Morton) clustering for multi-column data skipping.

Delta's ``OPTIMIZE ... ZORDER BY`` / Iceberg's z-order sort strategy
re-expressed for the lake's compaction write: a lexicographic
(range-partitioned) sort order clusters files tightly on the LEADING
sort column only — a predicate on the second column matches every
file's [min, max] envelope and prunes nothing. Interleaving the bits of
per-column quantile ranks instead makes each written file a small
hyper-rectangle in the sort-column space, so per-file manifest stats
(streaming/filestats.py) skip files for a selective predicate on ANY of
the z-ordered columns, at the cost of each being a little less tight
than the lexicographic leading column would be.

Shape at scale: one ``approxQuantile`` job computes the per-column bin
edges (Greenwald-Khanna sketch — one pass, driver gets ``2^bits - 1``
doubles per column, never data); the z-value itself is a pure JVM
Column (a constant-folded edge-array ``aggregate`` HOF per column plus
shift/mask interleaving), so the clustered write stays a single
range-partitioned shuffle exactly like the lexicographic branch. Rank
(quantile) binning rather than value binning makes the grid
skew-immune: a hot value region gets more bins, empty regions none.

Embulk has no physical-layout control at all (closest: the
``path_prefix`` file ordering contract, reference
spi/FileInputPlugin.java); this operator exists for the north rule's
scan-pruning path.
"""

from __future__ import annotations

import functools
import operator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: bins per column = 2**Z_BITS; 6 bits = 64 bins is plenty at file
#: granularity (a bucket rarely holds more than a few dozen base files)
#: and keeps the per-row HOF fold short.
Z_BITS = 6


def zorder_supported(dtype: T.DataType) -> bool:
    """Types with a monotone numeric view (quantile/bin space)."""
    return isinstance(
        dtype,
        (T.NumericType, T.BooleanType, T.TimestampType, T.DateType),
    )


def validate_zorder_columns(
    schema: T.StructType, cols, *, bits: int = Z_BITS
) -> None:
    """Fail-FAST check for a zorder layout: raises the same errors the
    write path would, but callable at table construction / DDL time —
    without it a bad sort column only surfaces when auto-maintenance
    first folds (hours into ingest), and every later compaction repeats
    the failure. Columns absent from ``schema`` are skipped (they may be
    added later; add_column re-validates)."""
    present = [c for c in cols if c in schema.fieldNames()]
    for c in present:
        dt = schema[c].dataType
        if not zorder_supported(dt):
            raise ValueError(
                f"zorder column {c!r} has unsupported type"
                f" {dt.simpleString()} (numeric/timestamp/date only —"
                " string ranges don't quantize; use lexicographic"
                " sort_columns or a key bloom for equality)"
            )
    if len(cols) * bits > 63:
        raise ValueError(
            f"zorder bit budget overflow: {len(cols)} columns ×"
            f" {bits} bits > 63 (a LongType Morton key); reduce the"
            " column count or bits"
        )


def _as_double(name: str, dtype: T.DataType) -> Column:
    """Monotone numeric view of a sortable column (quantile/bin space)."""
    if isinstance(dtype, T.TimestampType):
        return F.unix_micros(F.col(name)).cast("double")
    if isinstance(dtype, T.DateType):
        return F.unix_date(F.col(name)).cast("double")
    if isinstance(dtype, (T.NumericType, T.BooleanType)):
        return F.col(name).cast("double")
    raise ValueError(
        f"zorder column {name!r} has unsupported type {dtype.simpleString()}"
        " (numeric/timestamp/date only — string ranges don't quantize;"
        " use lexicographic sort_columns or a key bloom for equality)"
    )


def quantile_edges(
    df: DataFrame, cols: list[str], *, bits: int = Z_BITS,
) -> dict[str, list[float]]:
    """Per-column quantile bin edges from ONE approxQuantile pass.

    Returns ``2**bits - 1`` interior edges per column (possibly with
    repeats on low-cardinality columns — repeated edges just leave bins
    empty, which is sound). Nulls are ignored by the sketch and bin to
    0 at z-value time (they sort first, like Spark's nulls-first)."""
    nbins = 1 << bits
    probs = [i / nbins for i in range(1, nbins)]
    proj = df.select(
        *[
            _as_double(c, df.schema[c].dataType).alias(f"_zc{i}")
            for i, c in enumerate(cols)
        ]
    )
    qs = proj.approxQuantile(
        [f"_zc{i}" for i in range(len(cols))], probs, 1.0 / (4 * nbins)
    )
    return {c: qs[i] for i, c in enumerate(cols)}


def _bin_column(df: DataFrame, c: str, edges: list[float]) -> Column:
    """bin = #edges ≤ value, via an ``aggregate`` HOF over the constant
    edge array (foldable literals); nulls bin to 0 (sort first)."""
    d = _as_double(c, df.schema[c].dataType)
    earr = F.array(*[F.lit(float(e)) for e in edges])
    return F.aggregate(
        earr,
        F.lit(0),
        lambda acc, e: acc + F.when(d.isNotNull() & (d >= e), 1).otherwise(0),
    )


def _interleave(bins: list[Column], k: int, bits: int) -> Column:
    """Morton interleave of pre-computed bin columns: bit j of column i
    lands at position ``j * k + i`` so all columns share the high bits
    equally. ``k * bits`` must fit a signed long (validated)."""
    if k * bits > 63:
        raise ValueError(
            f"zorder bit budget overflow: {k} columns × {bits} bits > 63"
        )
    parts: list[Column] = []
    for i, b in enumerate(bins):
        for j in range(bits):
            parts.append(
                F.shiftright(b, j).bitwiseAND(F.lit(1)).cast("long")
                * F.lit(1 << (j * k + i)).cast("long")
            )
    return functools.reduce(operator.add, parts)


def z_value(
    df: DataFrame, cols: list[str], edges: dict[str, list[float]],
    *, bits: int = Z_BITS,
) -> Column:
    """The Morton key as ONE pure JVM Column expression (bin + interleave
    inlined — each bin's edge fold is referenced ``bits`` times, so
    prefer ``with_z_column`` in write paths; this form exists for tests
    and single-use expressions)."""
    bins = [_bin_column(df, c, edges[c]) for c in cols]
    return _interleave(bins, len(cols), bits).alias("_z")


def with_z_column(
    df: DataFrame, cols: list[str], edges: dict[str, list[float]],
    *, bits: int = Z_BITS, name: str = "_z",
) -> DataFrame:
    """``df`` plus the Morton key as column ``name``, with each column's
    edge-array fold evaluated ONCE: bins materialize in a first
    projection, the interleave references them from a second.
    ``aggregate`` is a CodegenFallback expression, so inlining it into
    every shift/mask term (as the one-Column form does) re-runs the
    whole fold per output bit; the two-step projection keeps the
    per-row cost at one fold per column (Catalyst's CollapseProject
    keeps multi-referenced non-trivial expressions materialized)."""
    k = len(cols)
    tmp = [f"_zb{i}" for i in range(k)]
    out = df.select(
        "*", *[_bin_column(df, c, edges[c]).alias(t)
               for c, t in zip(cols, tmp)]
    )
    out = out.withColumn(
        name, _interleave([F.col(t) for t in tmp], k, bits)
    )
    return out.drop(*tmp)
