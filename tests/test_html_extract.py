"""HTML main-content text extraction (functions/textops.extract_page_text)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from embulk_spark.functions.textops import extract_page_text, html_title


def _extract(spark, html):
    df = extract_page_text(
        spark.createDataFrame([Row(html=html)], "html string"), "html"
    )
    return df.collect()[0]


def test_drop_blocks_never_leak(spark):
    row = _extract(
        spark,
        "<html><head><title>T</title>"
        "<style>p { color: red; }</style>"
        '<script>var x = "SECRET1";</script>'
        "<noscript>SECRET2</noscript>"
        "<template><p>SECRET3</p></template>"
        "</head><body><p>keep me</p></body></html>",
    )
    assert row.text == "keep me"
    assert "SECRET" not in row.text and "color" not in row.text


def test_script_with_raw_lt_inside(spark):
    # a '<' inside script source must not derail the lazy block match
    row = _extract(
        spark,
        "<body><script>if (1 < 2) { x(); }</script><p>body text</p></body>",
    )
    assert row.text == "body text"


def test_comments_and_block_tags(spark):
    row = _extract(
        spark,
        "<!-- top\nmultiline -->"
        "<h1>Head</h1><ul><li>one</li><li>two</li></ul>"
        "<p>para <b>bold</b> tail</p>",
    )
    # block tags break lines; inline <b> strips without adding space
    assert row.text == "Head\none\ntwo\npara bold tail"


def test_entity_folds_one_level(spark):
    row = _extract(
        spark,
        "<p>A &amp; B &lt;tag&gt; &quot;q&quot; &apos;a&apos;&nbsp;end"
        " &amp;amp; once</p>",
    )
    assert row.text == 'A & B <tag> "q" \'a\' end &amp; once'
    # folded &lt;tag&gt; arrived AFTER tag stripping — it survives as text
    assert "<tag>" in row.text


def test_title_extracted_and_trimmed(spark):
    df = spark.createDataFrame(
        [Row(html="<title>  Hello World </title><p>x</p>"),
         Row(html="<p>untitled</p>")]
    ).select(html_title(F.col("html")).alias("t"))
    got = [r.t for r in df.collect()]
    assert got == ["Hello World", ""]


def test_ratio_and_words(spark):
    html = "<html><body><p>three little words</p></body></html>"
    row = _extract(spark, html)
    assert row.n_words == 3
    assert abs(row.text_ratio - len("three little words") / len(html)) < 1e-6


def test_null_html_survives(spark):
    row = _extract(spark, None)
    assert row.text is None and row.n_words is None
