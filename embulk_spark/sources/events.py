"""Deterministic synthetic change-event stream (the binlog/WAL tail).

The engine-side analogue of Embulk's BufferFileInputPlugin test source
(reference embulk-core/src/main/java/org/embulk/exec/BufferFileInputPlugin.java)
and of the randomized-but-reproducible fixtures in the reference's test
harness (embulk-junit4/src/main/java/org/embulk/test/RandomManager.java):
everything is a pure function of ``seq`` and a fixed seed, so the stream is
identical regardless of partitioning, parallelism, or re-runs — which is
what makes the exactly-once / resume / duplicate-delivery tests meaningful.

Generation is DISTRIBUTED (spark.range → column exprs + one Arrow-batched
pandas UDF for html bytes); nothing is materialized on the driver, so the
same generator scales to the 10^10-event design point.

Stream shape (FIXTURES.md F2):
- birth block then tail: the first n_urls seqs insert url 0..n_urls-1 (the
  initial bulk load of a binlog replay); the tail (~90% of events) is
  weight-assigned updates/deletes (~77/23 U/D). Every url's first event is
  an insert BY CONSTRUCTION — no per-url window, no generation shuffle.
- one hot host receives ~20% of tail events (Zipf hosts, exponent 1.2) —
  skew.
- ~5% exact duplicate deliveries in a later epoch — dedup test.
- ~3% late arrivals (event assigned to a later epoch than its seq) — the
  latest-(warc_ts,seq)-wins and delete-stays-deleted tests.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.extract import LANG_PROFILES

N_HOSTS = 100
ZIPF_EXP = 1.2
HOT_HOST_FRAC = 0.20
BASE_EPOCH_SEC = 1_700_000_000  # 2023-11-14T22:13:20Z

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("seq", T.LongType(), False),
        T.StructField("epoch", T.LongType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("schema_change", T.StringType(), True),
    ]
)

_LANG_CHOICES = ("en", "de", "fr", "ja", "unknown")

_FILLER = (
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod "
    "tempor incididunt ut labore et dolore magna aliqua"
).split()


def _u01(col_name: str, tag: int):
    """Deterministic uniform [0,1) from a column + tag, JVM-side."""
    return (
        F.pmod(F.xxhash64(F.col(col_name), F.lit(tag)), F.lit(1_000_000_007))
        / F.lit(1_000_000_007.0)
    )


def host_weights(n_hosts: int = N_HOSTS, hot_frac: float = HOT_HOST_FRAC) -> np.ndarray:
    """Zipf(1.2) host popularity with host 0 pinned to the hot fraction."""
    ranks = np.arange(1, n_hosts + 1, dtype=np.float64)
    w = ranks ** (-ZIPF_EXP)
    w /= w.sum()
    w *= (1.0 - hot_frac) / max(1e-12, 1.0 - w[0])
    w[0] = hot_frac
    return w / w.sum()


def url_of(url_idx: int) -> str:
    host = url_idx % N_HOSTS
    return f"https://host{host:03d}.example.org/p/{url_idx:08d}"


def lang_of_url(url: str) -> str:
    h = int.from_bytes(hashlib.md5(url.encode()).digest()[:4], "big")
    return _LANG_CHOICES[h % len(_LANG_CHOICES)]


def html_for(url: str, version: int) -> bytes:
    """Pinned pseudo-HTML for (url, version): pure function of its args.

    Includes tags, a script block, comments, entities, language-specific
    stopwords (so lang-ID is exercised), and — for a deterministic subset —
    an invalid UTF-8 byte to exercise the REPLACE decode policy
    (reference spi/util/LineDecoder.java:43-46)."""
    lang = lang_of_url(url)
    seed = hashlib.md5(f"{url}#{version}".encode()).digest()
    rnd = np.random.default_rng(int.from_bytes(seed[:8], "big"))
    vocab = list(LANG_PROFILES.get(lang, ())) + _FILLER
    n_words = 30 + int(rnd.integers(0, 90))
    words = [vocab[int(i)] for i in rnd.integers(0, len(vocab), n_words)]
    body = " ".join(words)
    title = f"{url.split('/')[-1]} v{version}"
    html = (
        f"<html><head><title>{title}</title>"
        f"<style>p {{color: red}}</style></head>\n"
        f"<body><!-- gen v{version} -->"
        f"<script>var x = {version};</script>"
        f"<h1>{title} &amp; friends</h1>"
        f"<p>{body}</p>"
        f"<p>entity check: &lt;tag&gt; &quot;q&quot; &nbsp;end</p>"
        f"</body></html>"
    ).encode("utf-8")
    if seed[8] % 17 == 0:
        html += b"\xff\xfe trailing-garbage"
    return html


@F.pandas_udf(T.BinaryType())
def _html_udf(url: pd.Series, version: pd.Series) -> pd.Series:
    return pd.Series(
        [html_for(u, int(v)) for u, v in zip(url, version)], dtype=object
    )


def change_stream(
    spark: SparkSession,
    n_events: int,
    n_urls: int,
    n_epochs: int,
    *,
    p_update_given_rest: float = 0.77,
    p_late: float = 0.03,
    p_dup: float = 0.05,
    hot_frac: float = HOT_HOST_FRAC,
    with_html: bool = True,
    num_partitions: int | None = None,
) -> DataFrame:
    """Build the deterministic change stream as a distributed DataFrame.

    Column derivations are all pure functions of ``seq`` (xxhash64-based),
    so the result is independent of partitioning/parallelism."""
    hw = host_weights(hot_frac=hot_frac)
    # per-url weight: url i belongs to host i%N_HOSTS; weight spreads the
    # host's mass uniformly over its urls.
    urls_per_host = np.bincount(np.arange(n_urls) % N_HOSTS, minlength=N_HOSTS)
    url_w = hw[np.arange(n_urls) % N_HOSTS] / np.maximum(
        1, urls_per_host[np.arange(n_urls) % N_HOSTS]
    )
    url_w = url_w / url_w.sum()
    cum_w = np.cumsum(url_w)
    bc_cum = spark.sparkContext.broadcast(cum_w)

    @F.pandas_udf(T.LongType())
    def url_idx_of(u: pd.Series) -> pd.Series:
        idx = np.searchsorted(bc_cum.value, u.to_numpy(), side="right")
        return pd.Series(np.minimum(idx, len(bc_cum.value) - 1))

    parts = num_partitions or spark.sparkContext.defaultParallelism
    batch = max(1, n_events // n_epochs)

    # Scale-safe construction, NO shuffle: the first n_urls seqs are the
    # birth block (seq i inserts url i), the tail is weight-hash-assigned
    # updates/deletes. Every url's first event (lowest seq AND warc_ts) is
    # its insert BY CONSTRUCTION — the per-url row_number window the
    # previous version used was a full shuffle+sort of the stream at
    # generation time, which at the 10^10-event design point would make
    # the fixture generator itself the bottleneck. ``version`` (the html
    # content selector) is a seq hash for tail events: any deterministic
    # per-event value works, ordering semantics come from (warc_ts, seq).
    is_birth = F.col("seq") < n_urls
    df = (
        spark.range(0, n_events, numPartitions=parts)
        .withColumnRenamed("id", "seq")
        .withColumn(
            "url_idx",
            F.when(is_birth, F.col("seq")).otherwise(url_idx_of(_u01("seq", 1))),
        )
        .withColumn(
            "url",
            F.concat(
                F.lit("https://host"),
                F.lpad(F.pmod("url_idx", F.lit(N_HOSTS)).cast("string"), 3, "0"),
                F.lit(".example.org/p/"),
                F.lpad(F.col("url_idx").cast("string"), 8, "0"),
            ),
        )
    )
    df = df.withColumn(
        "version",
        F.when(is_birth, F.lit(1)).otherwise(
            (F.lit(2) + F.pmod(F.xxhash64("seq", F.lit(8)), F.lit(1000))).cast("int")
        ),
    )
    df = df.withColumn(
        "op",
        F.when(is_birth, F.lit("I"))
        .when(_u01("seq", 2) < p_update_given_rest, F.lit("U"))
        .otherwise(F.lit("D")),
    )
    df = df.withColumn(
        "warc_ts", F.timestamp_seconds(F.lit(BASE_EPOCH_SEC) + F.col("seq"))
    )
    base_epoch = F.floor(F.col("seq") / F.lit(batch))
    late_shift = F.when(
        _u01("seq", 3) < p_late,
        1 + F.pmod(F.xxhash64("seq", F.lit(4)), F.lit(3)),
    ).otherwise(F.lit(0))
    df = df.withColumn(
        "epoch", F.least(base_epoch + late_shift, F.lit(n_epochs - 1)).cast("long")
    )
    df = df.withColumn(
        "lang",
        F.when(
            F.col("op") == "D", F.lit(None).cast("string")
        ).otherwise(
            # same derivation as lang_of_url(): first 4 md5 bytes, big-endian
            F.element_at(
                F.array(*[F.lit(x) for x in _LANG_CHOICES]),
                (
                    F.pmod(
                        F.conv(F.substring(F.md5(F.encode("url", "utf-8")), 1, 8), 16, 10)
                        .cast("long"),
                        F.lit(len(_LANG_CHOICES)),
                    )
                    + 1
                ).cast("int"),
            )
        ),
    )
    if with_html:
        df = df.withColumn(
            "html",
            F.when(F.col("op") == "D", F.lit(None).cast("binary")).otherwise(
                _html_udf(F.col("url"), F.col("version"))
            ),
        )
    else:
        df = df.withColumn(
            "html",
            F.when(F.col("op") == "D", F.lit(None).cast("binary")).otherwise(
                F.encode(F.concat(F.lit("<p>"), F.col("url"), F.lit("</p>")), "utf-8")
            ),
        )
    df = df.withColumn("schema_change", F.lit(None).cast("string"))

    # duplicate deliveries: exact copies (same seq!) re-sent in a later epoch
    dups = (
        df.filter(_u01("seq", 5) < p_dup)
        .withColumn(
            "epoch",
            F.least(
                F.col("epoch") + 1 + F.pmod(F.xxhash64("seq", F.lit(6)), F.lit(2)),
                F.lit(n_epochs - 1),
            ).cast("long"),
        )
    )
    cols = [f.name for f in EVENT_SCHEMA.fields]
    return df.select(*cols).unionByName(dups.select(*cols))
