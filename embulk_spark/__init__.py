"""embulk_spark — a PySpark-native CDC / incremental-ingest engine.

A brand-new engine with the capabilities of Embulk (reference at
/root/reference, embulk/embulk v0.11.5-SNAPSHOT), re-imagined per the
north rule as a binlog/WAL-tail → lakehouse upserter:

- change events (insert/update/delete/schema-change) for Common-Crawl-style
  web pages are tailed via Structured Streaming / micro-batch replay,
- keyed by ``url`` and applied with a key-bucketed MERGE over a
  copy-on-write snapshot table (Iceberg-compatible semantics; parquet +
  snapshot-manifest backend when Iceberg jars are absent),
- Embulk's Java plugin chain (parser/filter/formatter,
  reference embulk-core/src/main/java/org/embulk/spi/util/FiltersInternal.java:41-88)
  is replaced by vectorized pandas/Arrow UDFs and built-in pyspark.sql
  functions — no per-row Python,
- a per-micro-batch idempotent commit protocol (epoch-keyed snapshots,
  reference semantics embulk-core/src/main/java/org/embulk/exec/BulkLoader.java:154-159)
  delivers exactly-once sink semantics,
- schema evolution (add/rename/widen) mirrors Embulk's guess/config-diff
  behaviour (embulk-ruby/lib/embulk/guess/schema_guess.rb:112-128).

This is NOT a port: nothing here translates the reference's Java executor;
the physical strategy is Catalyst's.
"""

__version__ = "0.1.0"
