"""Physical-plan evidence: dump `.explain(formatted)` for the flagship
operators into EXPLAIN.md and assert the plan properties that matter at
100 TB — filters and projections reach the parquet scan, small dims are
broadcast, JVM-only operators contain no Python eval, the dedup is a
hash agg with partial combine (never a window sort), and the global
top-k is TakeOrderedAndProject (never a full sort).

Usage: python tools/explain_plans.py [--out EXPLAIN.md] [--sf SF_DIR]
Exits non-zero if any assertion fails.
"""

from __future__ import annotations

import argparse
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


CHECKS = {
    "cdc_latest_per_key": {
        "why": "dedup must be an aggregate with MAP-SIDE PARTIAL COMBINE "
               "(partial_max_by before the exchange) so only one winner per "
               "(url, map-partition) crosses the shuffle — a Window would "
               "shuffle every event. The agg is sort-based (max_by's struct "
               "buffer is not hash-agg eligible) which spills cleanly; the "
               "alternative (agg keys + join payload back) would shuffle "
               "full payloads with no partial reduction — strictly worse",
        "must": [r"SortAggregate|ObjectHashAggregate|HashAggregate",
                 r"partial_max_by"],
        "must_not": [r"\bWindow\b", r"BatchEvalPython"],
    },
    "lake_scan_pruned": {
        "why": "the stats-pruned scan (scan_where) plans file skipping "
               "DRIVER-SIDE from manifest min/max (the query itself raises "
               "if nothing was skipped), so the physical plan must be the "
               "ordinary MOR merge over FEWER files: the same partial "
               "max_by combine before the exchange, no Window, no Python "
               "eval — pruning only removes IO, it never adds plan nodes",
        "must": [r"partial_max_by",
                 r"SortAggregate|ObjectHashAggregate|HashAggregate"],
        "must_not": [r"\bWindow\b", r"BatchEvalPython", r"ArrowEvalPython"],
    },
    "lake_lookup_bloom": {
        "why": "the bloom-pruned point lookup plans file skipping "
               "DRIVER-SIDE from manifest key blooms (the query raises if "
               "no delta file was skipped), so the physical plan is the "
               "ordinary MOR merge over the handful of bloom-hit files: "
               "partial max_by combine before the exchange, no Window, no "
               "Python eval",
        "must": [r"partial_max_by",
                 r"SortAggregate|ObjectHashAggregate|HashAggregate"],
        "must_not": [r"\bWindow\b", r"BatchEvalPython", r"ArrowEvalPython"],
    },
    "lake_key_history": {
        "why": "the key-history read returns raw retained versions (no "
               "MOR collapse): file pruning happens DRIVER-SIDE via "
               "manifest blooms, so the plan is a plain union of pruned "
               "parquet scans + an IN filter — no merge aggregate, no "
               "Window, no Python eval",
        "must": [r"Scan parquet"],
        "must_not": [r"\bWindow\b", r"BatchEvalPython", r"ArrowEvalPython"],
    },
    "filter_remove_columns": {
        "why": "projection must prune at the scan (ReadSchema carries only "
               "selected columns)",
        "must": [r"ReadSchema: [^\n]*event_id"],
        "must_not": [r"ReadSchema: [^\n]*props", r"BatchEvalPython"],
    },
    "preview_sample": {
        "why": "preview is a pushed limit (TakeOrdered/CollectLimit), not a "
               "full materialization",
        "must": [r"TakeOrderedAndProject|CollectLimit|GlobalLimit"],
        "must_not": [r"BatchEvalPython"],
    },
    "agg_pricing_summary": {
        "why": "filter must push into the parquet scan as a data filter",
        "must": [r"PushedFilters: \[[^\]]*LessThanOrEqual|PushedFilters: \[[^\]]*IsNotNull"],
        "must_not": [r"ArrowEvalPython"],
    },
    "join_revenue_topk": {
        "why": "small dim side must broadcast; global top-10 must be "
               "TakeOrderedAndProject (per-partition heap), not a full sort",
        "must": [r"BroadcastHashJoin", r"TakeOrderedAndProject"],
        "must_not": [r"SortMergeJoin"],
    },
    "multimodal_sniff": {
        "why": "container sniffing is pure JVM column logic — zero Python",
        "must": [r"Project"],
        "must_not": [r"ArrowEvalPython", r"BatchEvalPython", r"mapInPandas"],
    },
    "incremental_cursor": {
        "why": "the resume predicate must reach the parquet scan as a "
               "pushed filter — an incremental run over 100 TB reads only "
               "row groups whose min/max straddle the cursor",
        "must": [r"PushedFilters: \[[^\]]*GreaterThan"],
        "must_not": [r"ArrowEvalPython", r"Exchange hashpartitioning"],
    },
    "filter_join_file": {
        "why": "the lookup side must broadcast — the stream side never "
               "shuffles for a master-file enrichment at any scale",
        "must": [r"BroadcastHashJoin"],
        "must_not": [r"SortMergeJoin", r"CartesianProduct"],
    },
    "parser_grok": {
        "why": "grok compiles on the driver; parsing is codegen'd regex "
               "extraction — no interpreter, no Python in the data path",
        "must": [r"Project"],
        "must_not": [r"ArrowEvalPython", r"BatchEvalPython", r"Exchange"],
    },
    "parser_xml": {
        "why": "row split is a same-stage generator (explode) over JVM "
               "regexp — one narrow pass, no shuffle, no Python",
        "must": [r"Generate"],
        "must_not": [r"ArrowEvalPython", r"BatchEvalPython", r"Exchange"],
    },
    "ann_cosine_topk": {
        "why": "brute-force cosine is JVM-side (zip_with/aggregate) with a "
               "TakeOrdered top-k; no Python, no full sort",
        "must": [r"TakeOrderedAndProject"],
        "must_not": [r"ArrowEvalPython", r"BatchEvalPython"],
    },
    "ann_ivf_topk": {
        "why": "IVF cell assignment is a narrow JVM map (array_max over "
               "per-centroid structs) and the probe ends in a TakeOrdered "
               "top-k — no Python, no join, no full sort",
        "must": [r"TakeOrderedAndProject"],
        "must_not": [r"ArrowEvalPython", r"BatchEvalPython",
                     r"CartesianProduct", r"\bSort\b \(\d"],
    },
    "token_stats": {
        "why": "token counting (whitespace + BPE-ish pre-tokenizer) is one "
               "Project of JVM regexes over a two-column scan — no shuffle, "
               "no Python",
        "must": [r"Project", r"ReadSchema: [^\n]*text"],
        "must_not": [r"\bExchange\b", r"ArrowEvalPython", r"BatchEvalPython"],
    },
    "benchmark_overlap": {
        "why": "decontamination probes eval-set shingle membership via a "
               "BROADCAST join — the corpus explode never shuffles on the "
               "gram key, only the final per-doc agg exchanges",
        "must": [r"BroadcastHashJoin"],
        "must_not": [r"SortMergeJoin", r"CartesianProduct"],
    },
    "stratified_sample": {
        "why": "per-stratum sampling is a broadcast join against the tiny "
               "rates table + a codegen'd md5-threshold filter — the corpus "
               "never shuffles, no Python",
        "must": [r"BroadcastHashJoin"],
        "must_not": [r"SortMergeJoin", r"ArrowEvalPython", r"BatchEvalPython",
                     r"CartesianProduct"],
    },
    "chunk_dedup": {
        "why": "content-defined chunking is a narrow codegen projection "
               "(sequence→filter→zip_with→posexplode, no Python); dedup is "
               "one shuffle on the uniform chunk-md5 key + an equi-join "
               "against the keeper frame — no window, no sort, no cartesian",
        "must": [r"Generate", r"HashAggregate",
                 r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin"],
        "must_not": [r"ArrowEvalPython", r"BatchEvalPython",
                     r"CartesianProduct", r"\bWindow\b"],
    },
    "page_change_classify": {
        "why": "both snapshots chunk as narrow projections; the multiset "
               "intersection is a full-outer equi-join on the same "
               "(key, chunk-md5) grouping key — co-partitioned, no window, "
               "no cartesian",
        "must": [r"Generate", r"HashAggregate",
                 r"SortMergeJoin|ShuffledHashJoin"],
        "must_not": [r"ArrowEvalPython", r"BatchEvalPython",
                     r"CartesianProduct", r"\bWindow\b"],
    },
    "weighted_sample": {
        "why": "the 1-row corpus mean enters via broadcast and Catalyst "
               "folds the weight-threshold predicate INTO the broadcast "
               "join condition (no separate filter pass) — the corpus "
               "never shuffles, no Python",
        "must": [r"BroadcastNestedLoopJoin|BroadcastHashJoin",
                 r"Join condition: [^\n]*least\(1\.0"],
        "must_not": [r"ArrowEvalPython", r"BatchEvalPython",
                     r"SortMergeJoin"],
    },
    "dynamodb_stream_parse": {
        "why": "the wire decode is ONE from_json projection over the "
               "record scan — per-row, no explode, no shuffle, no Python",
        "must": [r"Project"],
        "must_not": [r"ArrowEvalPython", r"BatchEvalPython",
                     r"\bExchange\b", r"Generate"],
    },
    "replica_merkle_diff": {
        "why": "leaf digests are one partial-combine hash agg per "
               "replica; the tree compare is an equi-join on the node id "
               "— never a cartesian, no Python",
        "must": [r"HashAggregate",
                 r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin"],
        "must_not": [r"ArrowEvalPython", r"BatchEvalPython",
                     r"CartesianProduct"],
    },
    "kmv_overlap": {
        "why": "sketches take one exchange on the group key with a "
               "bounded rank; the pair comparison is array algebra over "
               "≤k-element sketches on a tiny frame (the non-equi pair "
               "join broadcasts that frame) — no Python anywhere",
        "must": [r"HashAggregate"],
        "must_not": [r"ArrowEvalPython", r"BatchEvalPython"],
    },
    "feed_parse": {
        "why": "feed explode is a same-stage generator over JVM regexp "
               "(items/entries → rows), per-field extraction is codegen "
               "regexp_extract — no XML library, no Python in the data path",
        "must": [r"Generate"],
        "must_not": [r"ArrowEvalPython", r"BatchEvalPython",
                     r"CartesianProduct"],
    },
    # audio_meta: the parse is pure JVM (pinned by
    # tests/test_multimodal.py::test_wav_header_parse_is_jvm_only on the
    # expression itself); the driver query's plan still shows one
    # ArrowEvalPython because the WAV FIXTURE is synthesized by a pandas
    # UDF, so a whole-plan no-Python regex would assert the wrong thing.
    "minhash_near_dups": {
        "why": "LSH candidates come from an equi-join on (band, signature) "
               "— never a cartesian product",
        "must": [r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin"],
        "must_not": [r"CartesianProduct|BroadcastNestedLoopJoin"],
    },
    "embedding_neardup": {
        "why": "bucket self-join is an equi-join; cosine filter is JVM-side",
        "must": [r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin"],
        "must_not": [r"CartesianProduct", r"ArrowEvalPython"],
    },
    "incremental_agg_view": {
        "why": "the materialized state is answered from the view's OWN "
               "delta rows (key + signed measure deltas) — never a scan "
               "of the lake: ReadSchema carries only the view columns and "
               "the sum is one partial-combine hash agg; the lake's "
               "html/text bytes appear nowhere in the read",
        "must": [r"HashAggregate", r"ReadSchema: [^\n]*lang"],
        "must_not": [r"ReadSchema: [^\n]*html", r"ArrowEvalPython",
                     r"BatchEvalPython"],
    },
    "incremental_neardup": {
        "why": "the per-epoch probe joins Δ signatures against the "
               "as-of-epoch corpus on (band_idx, band_hash) — an "
               "equi-join on LSH buckets, never a cartesian product",
        "must": [r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin"],
        "must_not": [r"CartesianProduct|BroadcastNestedLoopJoin"],
    },
    "repetition_filters": {
        "why": "Gopher repetition metrics are per-row array HOFs — one "
               "Project over the scan, no explode/shuffle, no Python",
        "must": [r"Project"],
        "must_not": [r"\bExchange\b", r"Generate", r"ArrowEvalPython",
                     r"BatchEvalPython"],
    },
    "paragraph_dedup": {
        "why": "CCNet paragraph dedup must be hash aggs with map-side "
               "partial combine (count collapses in the combiner) plus an "
               "equi-join on the uniform md5 paragraph key — never a "
               "Window over all occurrences, never a cartesian, no Python",
        "must": [r"HashAggregate[^\n]*partial|partial_count", r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin"],
        "must_not": [r"\bWindow\b", r"Cartesian", r"ArrowEvalPython",
                     r"BatchEvalPython"],
    },
    "corpus_mixture": {
        "why": "mixture report is one hash agg with map-side partial "
               "combine (tiny group count; no Window, no Python)",
        "must": [r"HashAggregate[^\n]*partial|partial_count"],
        "must_not": [r"\bWindow\b", r"ArrowEvalPython", r"BatchEvalPython"],
    },
    "sessionize_events": {
        "why": "per-event session assignment is ONE window spec — a single "
               "hashpartitioning exchange on the key feeding lag + running "
               "sum; all JVM-side",
        "must": [r"\bWindow\b", r"hashpartitioning\(user_id"],
        "must_not": [r"ArrowEvalPython", r"BatchEvalPython",
                     r"CartesianProduct"],
    },
    "session_stats": {
        "why": "session rollup uses the native session_window aggregation "
               "(map-side partial session merge, streaming-capable) — no "
               "window-function sort over raw events, no Python",
        "must": [r"session_window|MergingSessions"],
        "must_not": [r"ArrowEvalPython", r"BatchEvalPython"],
    },
    "asof_join_attrib": {
        "why": "as-of join is union + ordered carry-forward: NO join "
               "operator at all (a range join would explode per key), one "
               "exchange on the key, last(ignorenulls) window",
        "must": [r"Union", r"\bWindow\b", r"hashpartitioning\(user_id"],
        "must_not": [r"CartesianProduct", r"BroadcastNestedLoopJoin",
                     r"SortMergeJoin", r"ArrowEvalPython", r"BatchEvalPython"],
    },
    "warc_roundtrip": {
        "why": "the WARC record scan is the ONE sanctioned Python boundary "
               "(MapInPandas over file blobs — a binary container Spark "
               "cannot read); archive SYNTHESIS is pure JVM concat, and "
               "there is no row-at-a-time Python, join, or cartesian "
               "anywhere in the plan",
        "must": [r"MapInPandas"],
        "must_not": [r"BatchEvalPython", r"ArrowEvalPython",
                     r"CartesianProduct", r"Join"],
    },
    "debezium_parse": {
        "why": "the Debezium envelope parse is ONE from_json pass over the "
               "wire stream — pure JVM (no Python anywhere, unlike binary "
               "containers), no join, and NO shuffle: a 10^10-event topic "
               "parses at scan speed, embarrassingly parallel",
        "must": [r"from_json"],
        "must_not": [r"BatchEvalPython", r"ArrowEvalPython", r"MapInPandas",
                     r"CartesianProduct", r"Join", r"Exchange"],
    },
    "cdc_replicate": {
        "why": "the replica's published read is the same MOR resolution as "
               "any lake read — partial_max_by dedup before the exchange, "
               "zero Python: the text column was extracted ONCE upstream "
               "and replicated as bytes, so a replica never re-runs "
               "extraction (the apply path itself is a narrow JVM map — "
               "schema normalize + bucket hash — with no shuffle)",
        "must": [r"partial_max_by"],
        "must_not": [r"ArrowEvalPython", r"BatchEvalPython", r"MapInPandas",
                     r"CartesianProduct"],
    },
    "dsir_weights": {
        "why": "DSIR scoring joins the exploded token stream against the "
               "tiny bucket-ratio table via BROADCAST (text never shuffles "
               "on the bucket key); both aggs have map-side partial combine; "
               "the totals cross-join is a broadcast of ONE row; all "
               "hashing/log arithmetic is JVM-side",
        "must": [r"BroadcastHashJoin", r"HashAggregate[^\n]*partial|partial_count"],
        "must_not": [r"SortMergeJoin", r"CartesianProduct",
                     r"ArrowEvalPython", r"BatchEvalPython"],
    },
    "lm_perplexity": {
        "why": "LM scoring joins the exploded bigram stream against two "
               "bucket-bounded count tables via BROADCAST left joins "
               "(each ≤ B rows regardless of corpus size); aggs have "
               "map-side partial combine; all hashing/log math is JVM",
        "must": [r"BroadcastHashJoin", r"HashAggregate[^\n]*partial|partial_count"],
        "must_not": [r"SortMergeJoin", r"CartesianProduct",
                     r"ArrowEvalPython", r"BatchEvalPython"],
    },
    "semantic_dedup": {
        "why": "cluster assignment is a narrow JVM map (array_max over "
               "per-centroid structs — no join against the centroid table); "
               "the k-row canonical table enters via broadcast joins; never "
               "a window sort, cartesian, or Python in the scoring plan",
        "must": [r"BroadcastHashJoin"],
        "must_not": [r"SortMergeJoin", r"CartesianProduct", r"\bWindow\b",
                     r"ArrowEvalPython", r"BatchEvalPython"],
    },
    "url_filter": {
        "why": "all three rule kinds collapse into ONE broadcast hash ANTI "
               "join keyed on the registered domain with the kind residual "
               "as the join condition — the corpus is scanned once, never "
               "shuffled, and never LIKE-ANY-scanned against the rule list",
        "must": [r"BroadcastHashJoin[^\n]*LeftAnti|BroadcastHashJoin[^\n]*Anti"],
        "must_not": [r"SortMergeJoin", r"CartesianProduct",
                     r"BroadcastNestedLoopJoin", r"ArrowEvalPython",
                     r"BatchEvalPython"],
    },
    "substring_dedup": {
        "why": "ExactSubstr dedup is hash aggs with map-side partial combine "
               "(duplicated grams collapse in the combiner) plus an "
               "equi-join of hits against the duplicated-key table on the "
               "uniform md5 gram key; span merge and text rebuild are JVM "
               "array HOFs — never a Window over occurrences, never a "
               "cartesian, no Python",
        "must": [r"HashAggregate[^\n]*partial|partial_count",
                 r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin"],
        "must_not": [r"\bWindow\b", r"CartesianProduct",
                     r"ArrowEvalPython", r"BatchEvalPython"],
    },
    "corpus_export": {
        "why": "the export round-trip read aggregates per shard with "
               "map-side partial combine over the partition-pruned shard "
               "layout — no Python, no cartesian, no window",
        "must": [r"HashAggregate[^\n]*partial|partial_count"],
        "must_not": [r"ArrowEvalPython", r"BatchEvalPython",
                     r"CartesianProduct", r"\bWindow\b"],
    },
    "ccnet_buckets": {
        "why": "CCNet bucketing scores via broadcast-joined bounded count "
               "tables then ntile over ONE hashpartitioning(lang) window — "
               "the corpus shuffles once on the language key; no "
               "cartesian, no Python (the threshold variant removes even "
               "the sort at 100 TB)",
        "must": [r"\bWindow\b", r"hashpartitioning\(lang",
                 r"BroadcastHashJoin"],
        "must_not": [r"CartesianProduct", r"ArrowEvalPython",
                     r"BatchEvalPython"],
    },
    "vocab_topk": {
        "why": "vocabulary induction is the canonical wordcount: explode "
               "is a narrow map, the count agg has map-side partial "
               "combine (shuffle carries |vocab| per partition, not "
               "|tokens|), and the global top-k is TakeOrderedAndProject "
               "(per-partition heaps) — never a full sort, no Python",
        "must": [r"HashAggregate[^\n]*partial|partial_count",
                 r"TakeOrderedAndProject"],
        "must_not": [r"ArrowEvalPython", r"BatchEvalPython",
                     r"\bWindow\b"],
    },
    "text_normalize": {
        "why": "unicode normalization is one Project of a JVM "
               "regexp_replace chain over a two-column scan — no shuffle, "
               "no Python",
        "must": [r"Project", r"ReadSchema: [^\n]*text"],
        "must_not": [r"\bExchange\b", r"ArrowEvalPython",
                     r"BatchEvalPython"],
    },
    "doc_chunks": {
        "why": "context-length chunking is a pure Column flat map "
               "(transform over start indices, slice + array_join, one "
               "Generate) — zero shuffles, zero Python",
        "must": [r"Generate"],
        "must_not": [r"\bExchange\b", r"\bWindow\b", r"ArrowEvalPython",
                     r"BatchEvalPython", r"Join"],
    },
    "token_packing": {
        "why": "concat-and-chunk packing is a two-level prefix sum: ONE "
               "hashpartitioning exchange on the fixed md5 bucket feeding "
               "a per-bucket running-sum window; bucket offsets are a "
               "constant-size relation re-entering via BROADCAST — never a "
               "global single-partition sort of the corpus, no Python",
        "must": [r"\bWindow\b", r"hashpartitioning\(_bkt",
                 r"BroadcastHashJoin"],
        "must_not": [r"SortMergeJoin", r"CartesianProduct",
                     r"ArrowEvalPython", r"BatchEvalPython"],
    },
    "dedup_keep_canonical": {
        "why": "keep-one dedup resolves winners with a max_by hash agg and "
               "anti-joins losers — equi-joins only, no cartesian, no Python "
               "in the final plan (cluster labels enter via localCheckpoint)",
        "must": [r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin"],
        "must_not": [r"CartesianProduct", r"ArrowEvalPython", r"BatchEvalPython"],
    },
    "scd2_history": {
        "why": "SCD-2 folds a change stream into validity intervals with "
               "ONE shuffle: the collapse lag, the lead(valid_to) and the "
               "version row_number all share partitionBy(key) orderBy(ts, "
               "tie), so Catalyst plans a single hashpartitioning exchange "
               "(the post-filter windows re-sort in place, never "
               "re-partition) — at 10^10 events the whole build costs one "
               "wide sort per key bucket",
        "must": [r"\bWindow\b", r"hashpartitioning\(user_id"],
        "must_not": [r"(?s)\+- Exchange.*\+- Exchange",
                     r"SortMergeJoin", r"ArrowEvalPython", r"BatchEvalPython"],
    },
    "bloom_dedup": {
        "why": "the bloom probe joins the exploded candidate positions "
               "against the packed filter words via BROADCAST (the filter "
               "is ≤ m/63 rows at any corpus size) and reduces with a "
               "partial-combine min agg — the corpus never appears in the "
               "probe side of the plan; bit packing itself is a bit_or "
               "hash agg with map-side combine",
        "must": [r"BroadcastHashJoin", r"partial_bit_or|partial_min",
                 r"HashAggregate"],
        "must_not": [r"CartesianProduct", r"ArrowEvalPython", r"BatchEvalPython"],
    },
    "metrics_rollup": {
        "why": "ROLLUP computes the whole subtotal lattice in one pass — "
               "Catalyst's Expand emits the grouping-set rows map-side and "
               "a single hash agg reduces them; the naive alternative "
               "(one scan+agg per level, unioned) re-reads the events "
               "log L times",
        "must": [r"Expand", r"HashAggregate"],
        "must_not": [r"(?s)\+- Scan parquet.*\+- Scan parquet",
                     r"ArrowEvalPython", r"BatchEvalPython"],
    },
    "hll_distinct": {
        "why": "the register build is ONE hash agg with map-side partial "
               "combine (partial_max per (group, bucket)) — ≤ groups·m "
               "rows cross the wire at any input size; the estimate agg "
               "runs over that constant-size frame. Pure JVM arithmetic, "
               "no Python, no window",
        "must": [r"partial_max", r"HashAggregate"],
        "must_not": [r"\bWindow\b", r"ArrowEvalPython", r"BatchEvalPython"],
    },
    "heavy_hitters": {
        "why": "the CMS counter build partial-combines map-side onto a "
               "constant d×w frame, and the point-query probe joins the "
               "(broadcast) counter frame — the raw stream never shuffles "
               "on the key; the min-reduction has partial combine too",
        "must": [r"partial_sum", r"BroadcastHashJoin", r"partial_min"],
        "must_not": [r"CartesianProduct", r"ArrowEvalPython", r"BatchEvalPython"],
    },
    "bm25_scores": {
        "why": "query terms prune INSIDE the token array before the "
               "explode (filter HOF under Generate), so only matching "
               "(doc, term) pairs flat-map out; term document-frequencies "
               "and corpus constants join back BROADCAST — the corpus "
               "never shuffles on the token key",
        "must": [r"BroadcastHashJoin", r"explode",
                 r"BroadcastNestedLoopJoin"],
        "must_not": [r"CartesianProduct", r"ArrowEvalPython", r"BatchEvalPython",
                     r"SortMergeJoin"],
    },
    "quality_classifier": {
        "why": "every GD iteration joins the feature frame to the ≤ B-row "
               "weight frame BROADCAST and reduces gradients with a "
               "partial-combine hash agg; text bytes never appear past "
               "featurization and no Python evaluates in the loop",
        "must": [r"BroadcastHashJoin", r"partial_sum", r"HashAggregate"],
        "must_not": [r"CartesianProduct", r"ArrowEvalPython", r"BatchEvalPython"],
    },
    "link_extract": {
        "why": "href extraction is a JVM regexp under a Generate explode "
               "(no UDF); the only exchange is the host-pair distinct + "
               "count aggs, both with map-side partial combine",
        "must": [r"explode", r"partial_count|partial"],
        "must_not": [r"ArrowEvalPython", r"BatchEvalPython", r"\bWindow\b"],
    },
    "group_split": {
        "why": "split assignment is pure per-row JVM arithmetic (md5 vs "
               "cumulative boundaries): NO exchange before the final "
               "report agg, no window, no Python",
        "must": [r"HashAggregate"],
        "must_not": [r"\bWindow\b", r"ArrowEvalPython", r"BatchEvalPython",
                     r"SortMergeJoin"],
    },
    "incremental_term_df": {
        "why": "the df answer reads the INDEX (O(index) parquet rows), "
               "never the corpus text: winner resolution is an equi-join "
               "on id plus a partial-combine count agg — no Python, no "
               "window, no cartesian",
        "must": [r"partial_count", r"HashAggregate"],
        "must_not": [r"ArrowEvalPython", r"BatchEvalPython",
                     r"CartesianProduct", r"\bWindow\b"],
    },
    "interval_window_counts": {
        "why": "point-in-interval matching must be a HASH join on the "
               "quantized time bin (intervals exploded to covered bins, "
               "broadcast) — a raw BETWEEN predicate would plan "
               "BroadcastNestedLoopJoin (or cartesian), O(points × "
               "intervals) at any scale",
        "must": [r"BroadcastHashJoin", r"explode|Generate"],
        "must_not": [r"BroadcastNestedLoopJoin", r"CartesianProduct",
                     r"ArrowEvalPython", r"BatchEvalPython"],
    },
    "anchor_topk": {
        "why": "the (href, anchor) pair extraction is JVM regexp + zip "
               "under a Generate explode (no UDF); the distinct-host vote "
               "partial-combines map-side, and the rank window runs over "
               "per-host anchor counts, never raw edges",
        "must": [r"explode", r"HashAggregate", r"partial"],
        "must_not": [r"ArrowEvalPython", r"BatchEvalPython",
                     r"CartesianProduct", r"SortMergeJoin"],
    },
    "robots_permissions": {
        "why": "the O(hosts) rules table BROADCASTS against the URL "
               "universe (the URL frame never shuffles on host, no "
               "cartesian prefix-match), and the per-url winner is a "
               "partial-combine max_by agg; all parsing/matching string "
               "work is JVM Columns",
        "must": [r"BroadcastHashJoin", r"partial_max_by"],
        "must_not": [r"CartesianProduct", r"BroadcastNestedLoopJoin",
                     r"ArrowEvalPython", r"BatchEvalPython"],
    },
    "crawl_frontier": {
        "why": "sitemap parsing is a narrow JVM regexp explode (no Python, "
               "no XML lib); duplicate-loc collapse is a partial-combine "
               "hash agg; the robots gate rides the BROADCAST join inside "
               "robots_match (the frontier never shuffles on host for the "
               "permission check); the only Window is the per-host "
               "politeness slot assignment, which is the output's semantics "
               "(hosts ≫ cores, so it parallelizes)",
        "must": [r"BroadcastHashJoin", r"partial_max", r"\bWindow\b"],
        "must_not": [r"CartesianProduct", r"BroadcastNestedLoopJoin",
                     r"ArrowEvalPython", r"BatchEvalPython"],
    },
    "recrawl_schedule": {
        "why": "the change-rate estimate is ONE partial-combine hash agg "
               "(count/min/max all reduce map-side) over the O(changes) "
               "feed — no window, no Python; the observation horizon joins "
               "as a broadcast 1-row aggregate (the BroadcastNestedLoopJoin "
               "with a single-row build side is the intended shape, not a "
               "blow-up), never a driver collect",
        "must": [r"HashAggregate", r"partial_min", r"partial_max",
                 r"BroadcastNestedLoopJoin|BroadcastHashJoin"],
        "must_not": [r"\bWindow\b", r"SortMergeJoin",
                     r"ArrowEvalPython", r"BatchEvalPython"],
    },
    "bpe_encode": {
        "why": "tokenizer application is ONE zero-shuffle Project of "
               "chained JVM folds over a two-column scan — no join, no "
               "re-aggregation, no Python at any corpus size",
        "must": [r"Project", r"ReadSchema: [^\n]*text"],
        "must_not": [r"\bExchange\b", r"ArrowEvalPython",
                     r"BatchEvalPython", r"CartesianProduct"],
    },
    "length_quantiles": {
        "why": "the histogram build is ONE hash agg with map-side partial "
               "combine onto ≤ groups×bins rows (bin index is a codegen'd "
               "HOF, no Python, no sort of the data); the quantile "
               "interpolation windows run over the constant-size "
               "histogram frame only",
        "must": [r"partial_count", r"HashAggregate"],
        "must_not": [r"ArrowEvalPython", r"BatchEvalPython",
                     r"CartesianProduct", r"SortMergeJoin"],
    },
}


def check_epoch_pruning(spark) -> tuple[str, str, list[str], list[str]]:
    """The replay hot path: with the event log written
    ``partitionBy("epoch")`` (bench.py / bench/scaling.py layout), the
    per-epoch scan inside ``replay_batches`` must PRUNE to that epoch's
    partition via PartitionFilters — reading one epoch is O(batch), not
    O(stream). Without pruning, a k-epoch replay re-reads the whole log k
    times (O(k·N) — the top scale-killer at 10^10 events)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from embulk_spark.sources.events import change_stream

    work = tempfile.mkdtemp(prefix="explain_epochprune_")
    try:
        path = os.path.join(work, "events")
        change_stream(spark, 2000, 200, 4, num_partitions=4).write.partitionBy(
            "epoch"
        ).mode("overwrite").parquet(path)
        events = spark.read.parquet(path)
        # exactly the scan replay_batches issues per epoch
        per_epoch = events.filter((F.col("epoch") == 2) & (F.col("op") != "S"))
        plan = plan_of(per_epoch)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    failures: list[str] = []
    verdicts: list[str] = []
    for pat in (r"PartitionFilters: \[[^\]]*epoch[^\]]*= 2", ):
        ok = re.search(pat, plan) is not None
        verdicts.append(f"- [{'x' if ok else ' '}] must match `{pat}`")
        if not ok:
            failures.append(f"replay_epoch_pruning: missing {pat}")
    for pat in (r"PushedFilters: \[[^\]]*epoch", ):
        # epoch must be handled at the PARTITION level, not as a row filter
        ok = re.search(pat, plan) is None
        verdicts.append(f"- [{'x' if ok else ' '}] must NOT match `{pat}`")
        if not ok:
            failures.append(f"replay_epoch_pruning: unexpectedly matched {pat}")
    why = (
        "the per-epoch replay scan must hit only that epoch's partition "
        "directory (PartitionFilters carries `epoch = e`); epoch is a "
        "partition column, so it never appears as a pushed data filter"
    )
    return why, plan, verdicts, failures


def check_snapshot_diff(spark) -> tuple[str, str, list[str], list[str]]:
    """snapshot_diff's event derivation: ONE equi-join on url where the
    table side projects to (url, xxhash64 digest) BEFORE the exchange —
    the table's html/text bytes must never cross the shuffle, and the
    time-unbounded full-outer must still be a hash-partitioned join
    (never a nested-loop/cartesian)."""
    import shutil
    import tempfile

    from embulk_spark.operators.merge import snapshot_diff
    from embulk_spark.sources.events import change_stream
    from embulk_spark.streaming.lake import ParquetLakeTable

    work = tempfile.mkdtemp(prefix="explain_snapdiff_")
    try:
        table = ParquetLakeTable(
            spark, os.path.join(work, "t"), n_buckets=2,
            compact_min_deltas=10_000,
        )
        ev = change_stream(spark, 600, 80, 1, num_partitions=2)
        table.merge_epoch(ev.drop("epoch", "schema_change"), 0, extract=False)
        # land the dump on parquet first (as a real crawl would arrive):
        # the fixture's html-synthesis UDF must not pollute the plan
        change_stream(spark, 400, 80, 1, num_partitions=2).select(
            "url", "warc_ts", "html", "lang"
        ).write.parquet(os.path.join(work, "dump"))
        snap = spark.read.parquet(os.path.join(work, "dump"))
        # the apply_snapshot fast path: digest per RAW row below the MOR
        # dedup (read(project=)), so the table side's agg and exchange
        # carry (url, order, digest) — never html/text bytes
        from pyspark.sql import functions as F

        cur = (
            table.read(project={"_digest": F.xxhash64(F.col("html"))})
            .filter(~F.col("is_deleted"))
            .select("url", "_digest")
        )
        events = snapshot_diff(
            cur, snap, compare=("html",), current_digest_col="_digest",
            delete_ts="2030-01-01 00:00:00",
        )
        plan = plan_of(events)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    failures: list[str] = []
    verdicts: list[str] = []
    for pat in (r"SortMergeJoin.*FullOuter|ShuffledHashJoin.*FullOuter",
                r"xxhash64", r"partial_max_by"):
        ok = re.search(pat, plan) is not None
        verdicts.append(f"- [{'x' if ok else ' '}] must match `{pat}`")
        if not ok:
            failures.append(f"snapshot_diff: missing {pat}")
    for pat in (r"CartesianProduct", r"BroadcastNestedLoop",
                r"BatchEvalPython", r"ArrowEvalPython",
                # the digest projection must land BELOW the join: no html
                # bytes in the exchange the table side feeds the join
                r"Exchange hashpartitioning\(url[^\n]*html"):
        ok = re.search(pat, plan) is None
        verdicts.append(f"- [{'x' if ok else ' '}] must NOT match `{pat}`")
        if not ok:
            failures.append(f"snapshot_diff: unexpectedly matched {pat}")
    why = (
        "diffing a full dump against the live table is one url equi-join; "
        "the table side ships only (url, 64-bit digest) across the wire "
        "(its payload bytes prune below the exchange), and the full-outer "
        "stays a shuffled hash/sort-merge join — at 10^10 urls a "
        "nested-loop or a payload-carrying exchange would be the bottleneck"
    )
    return why, plan, verdicts, failures


def check_jdbc_merge(spark) -> tuple[str, str, list[str], list[str]]:
    """sinks/jdbc_modes.py merge mode: the read side must (a) scan ONLY
    the hot-bucket leaves (driver-side pruning — cold leaves carry into
    the new manifest by reference, never read), and (b) remove
    overwritten keys with a BROADCAST anti-join on the deduped change-set
    keys — the table side never shuffles. At 100 TB a change-set touching
    k of B buckets reads k/B of the table; a shuffled anti-join or an
    unpruned scan would make every merge O(table)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from embulk_spark.sinks.jdbc_modes import JdbcModeTable, _leaf_bkt

    work = tempfile.mkdtemp(prefix="explain_jdbcmerge_")
    try:
        t = JdbcModeTable(spark, os.path.join(work, "t"), n_buckets=8)
        base = spark.range(0, 400).select(
            F.col("id"), F.col("id").cast("string").alias("v")
        )
        t.write(base, "insert", merge_keys=["id"])
        man = t._manifest()
        inc = spark.createDataFrame([(1, "x"), (2, "y")], "id long, v string")
        merged, read_leaves, keep = t.merge_frame(inc, man, ["id"])
        plan = plan_of(merged)
        hot = {r[0] for r in inc.select(
            F.pmod(F.xxhash64(F.col("id").cast("string")), F.lit(8))
        ).distinct().collect()}
        pruned_ok = (
            all(_leaf_bkt(lf) in hot for lf in read_leaves)
            and len(read_leaves) + len(keep) == len(man["leaves"])
            and len(keep) > 0
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    failures: list[str] = []
    verdicts: list[str] = [
        f"- [{'x' if pruned_ok else ' '}] driver-side leaf pruning: read "
        f"⊆ hot buckets, cold leaves carried by reference"
    ]
    if not pruned_ok:
        failures.append("jdbc_merge: leaf pruning broken")
    for pat in (r"BroadcastHashJoin[^\n]*LeftAnti",):
        ok = re.search(pat, plan) is not None
        verdicts.append(f"- [{'x' if ok else ' '}] must match `{pat}`")
        if not ok:
            failures.append(f"jdbc_merge: missing {pat}")
    for pat in (r"CartesianProduct", r"BroadcastNestedLoop",
                r"SortMergeJoin", r"BatchEvalPython", r"ArrowEvalPython"):
        ok = re.search(pat, plan) is None
        verdicts.append(f"- [{'x' if ok else ' '}] must NOT match `{pat}`")
        if not ok:
            failures.append(f"jdbc_merge: unexpectedly matched {pat}")
    why = (
        "jdbc merge = hot-leaf scan + broadcast anti-join + union: the "
        "table side is pruned to the buckets the change-set hashes into "
        "and never crosses an exchange; overwritten keys drop via a "
        "broadcast LeftAnti on the deduped incoming keys"
    )
    return why, plan, verdicts, failures


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "EXPLAIN.md"))
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    import __spark_entry__ as entry
    from embulk_spark.session import get_spark

    spark = get_spark("explain", master="local[4]", shuffle_partitions=8)
    qs = entry.queries()

    failures: list[str] = []
    sections: list[str] = [
        "# EXPLAIN — physical plans of the flagship operators",
        "",
        "Generated by `python tools/explain_plans.py` (asserts the plan",
        "properties; regenerate after planner-visible changes). Scale notes",
        "per operator say WHY the shape is the one that survives 100 TB.",
        "",
    ]
    for name, spec in CHECKS.items():
        df = qs[name](spark, args.sf)
        plan = plan_of(df)
        verdicts = []
        for pat in spec["must"]:
            ok = re.search(pat, plan) is not None
            verdicts.append(f"- [{'x' if ok else ' '}] must match `{pat}`")
            if not ok:
                failures.append(f"{name}: missing {pat}")
        for pat in spec["must_not"]:
            ok = re.search(pat, plan) is None
            verdicts.append(f"- [{'x' if ok else ' '}] must NOT match `{pat}`")
            if not ok:
                failures.append(f"{name}: unexpectedly matched {pat}")
        sections += [
            f"## {name}",
            "",
            f"**Scale rationale:** {spec['why']}.",
            "",
            *verdicts,
            "",
            "```",
            plan.strip()[:4000],
            "```",
            "",
        ]

    for title, check in (
        ("replay_epoch_pruning", check_epoch_pruning),
        ("snapshot_diff_events", check_snapshot_diff),
        ("jdbc_mode_merge_plan", check_jdbc_merge),
    ):
        why, plan, verdicts, fails = check(spark)
        failures += fails
        sections += [
            f"## {title}",
            "",
            f"**Scale rationale:** {why}.",
            "",
            *verdicts,
            "",
            "```",
            plan.strip()[:4000],
            "```",
            "",
        ]

    with open(args.out, "w") as f:
        f.write("\n".join(sections))
    if failures:
        print("PLAN CHECK FAILURES:")
        for x in failures:
            print(" -", x)
        return 1
    print(f"all plan checks passed; wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
