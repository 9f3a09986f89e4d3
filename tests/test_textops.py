"""URL canonicalization + PII redaction — JVM-side Column ops
(functions/textops.py), the web-corpus key-prep and scrub passes."""

from __future__ import annotations

from pyspark.sql import functions as F

from embulk_spark.functions.textops import (
    canonical_url,
    pii_counts,
    redact_pii,
    url_domain,
    url_host,
)


def _one(spark, url):
    df = spark.createDataFrame([(url,)], "u string")
    return df.select(
        canonical_url(F.col("u")).alias("c"),
        url_host(F.col("u")).alias("h"),
        url_domain(F.col("u")).alias("d"),
    ).first()


def test_canonical_url_matrix(spark):
    cases = {
        # scheme+host lowercase, path case preserved
        "HTTPS://WWW.Example.ORG/Path/X": (
            "https://www.example.org/Path/X", "www.example.org", "example.org"),
        # default ports stripped (scheme-matched only)
        "https://a.example.org:443/p": (
            "https://a.example.org/p", "a.example.org", "example.org"),
        "http://a.example.org:80/p": (
            "http://a.example.org/p", "a.example.org", "example.org"),
        # :443 under http is NOT default — kept
        "http://a.example.org:443/p": (
            "http://a.example.org:443/p", "a.example.org", "example.org"),
        "https://a.example.org:8080/p": (
            "https://a.example.org:8080/p", "a.example.org", "example.org"),
        # fragment stripped; bare trailing slash removed
        "https://a.example.org/p#frag": (
            "https://a.example.org/p", "a.example.org", "example.org"),
        "https://a.example.org/": (
            "https://a.example.org", "a.example.org", "example.org"),
        # a real path keeps its trailing slash? no: only bare '/' is removed
        "https://a.example.org/p/": (
            "https://a.example.org/p/", "a.example.org", "example.org"),
    }
    for url, (c, h, d) in cases.items():
        got = _one(spark, url)
        assert (got["c"], got["h"], got["d"]) == (c, h, d), url


def test_pii_redaction(spark):
    text = (
        "write to Bob.Smith+x@corp.example.com or call +1 (555) 123-4567; "
        "server at 192.168.0.1 answered"
    )
    df = spark.createDataFrame([(text,)], "t string")
    row = df.select(
        redact_pii(F.col("t")).alias("r"), *pii_counts(F.col("t"))
    ).first()
    assert "<EMAIL>" in row["r"] and "@" not in row["r"]
    assert "<PHONE>" in row["r"] and "123-4567" not in row["r"]
    assert "<IPV4>" in row["r"] and "192.168" not in row["r"]
    assert (row["n_email"], row["n_phone"], row["n_ipv4"]) == (1, 1, 1)


def test_pii_no_false_positives(spark):
    text = "version 1.2 of chapter 3.4.5 sold 1,234 units in 2024"
    df = spark.createDataFrame([(text,)], "t string")
    row = df.select(redact_pii(F.col("t")).alias("r"), *pii_counts(F.col("t"))).first()
    assert row["r"] == text
    assert (row["n_email"], row["n_phone"], row["n_ipv4"]) == (0, 0, 0)
