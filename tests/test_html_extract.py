"""HTML -> text extraction: engine equivalence, the byte-identity
per-url invariant, determinism across partitionings, and plan quality
(native path stays JVM-only)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gojsonschema_spark.ops.html import (
    extract_links, extract_text, extract_text_native, html_to_text)
from gojsonschema_spark.ops.webpages import generate_webpages

# Markup both engines must agree on byte-for-byte (no numeric charrefs,
# no unclosed script — those are the robust path's documented extras).
EQUIV_CASES = [
    '<html><head><title>T</title><style>p{color:red}</style></head>'
    '<body><p>a&amp;lt;b</p>&nbsp;<!-- c --><b>d</b> '
    '<script type="text/javascript">var q = "</p>";</script>tail</body></html>',
    '<!DOCTYPE html><body>plain <b>bold</b>text<br/>line'
    '<![CDATA[ raw cdata ]]>end</body>',
    '<p>multi\n  space\t here\r\n</p>',
    '<noscript><img src=x></noscript>visible<TEMPLATE>hidden</TEMPLATE>',
    '<STYLE media="x">s</STYLE><SCRIPT\nsrc="y">j</SCRIPT>mixed case',
    '',
    '<p></p>',
    'no markup at all',
    '<p>&quot;q&apos; &gt;&lt; &amp;amp; &amp;nbsp;</p>',
    '<?xml version="1.0"?><p>pi target</p>',
    '<a href="u?a=1&amp;b=2">link text</a> after',
    'a<!--x-->b',  # comment is a word boundary: "a b", never "ab"
    '<div class=">not closed by this" id=x>attr</div>',
]


def test_native_equals_robust(spark):
    df = spark.createDataFrame(
        [(i, c.encode("utf-8")) for i, c in enumerate(EQUIV_CASES)],
        "id long, html binary")
    rows = (extract_text(df, "html", "robust")
            .withColumn("native", extract_text_native(F.col("html")))
            .orderBy("id").collect())
    for r, case in zip(rows, EQUIV_CASES):
        assert r.native == r.robust == html_to_text(case.encode()), case


def test_robust_extras_beyond_native():
    # numeric character references (decimal + hex)
    assert html_to_text(b"x &#65;&#x42; y") == "x AB y"
    # full named table (html.unescape), not just the core six
    assert html_to_text(b"&eacute;&mdash;") == "\xe9—"
    # unclosed <script>: robust path suppresses to EOF
    assert html_to_text(b"a<script>var x=1; never closed") == "a"
    # malformed UTF-8 -> U+FFFD, never an exception
    assert html_to_text(b"ok \xff\xfe end") == "ok �� end"


def test_null_and_string_inputs(spark):
    df = spark.createDataFrame([(0, None), (1, b"<p>x</p>")],
                               "id long, html binary")
    rows = (extract_text(df, "html", "robust")
            .withColumn("native", extract_text_native(F.col("html")))
            .orderBy("id").collect())
    assert rows[0].robust is None and rows[0].native is None
    assert rows[1].robust == rows[1].native == "x"
    # string-typed column through the native path
    sdf = spark.createDataFrame([("<b>s</b>",)], "h string")
    assert sdf.select(extract_text_native(
        F.col("h"), is_binary=False).alias("t")).first().t == "s"


def test_byte_identical_per_url_on_generated_corpus(spark):
    """The north-star invariant: extraction is a pure function of the
    html bytes, so on the generated corpus (html wraps the text column)
    both engines reproduce `text` exactly — including empty pages."""
    pages = generate_webpages(spark, 3000, partitions=5)
    assert pages.where(extract_text_native(F.col("html")) != F.col("text")) \
                .count() == 0
    assert extract_text(pages, "html", "e") \
        .where(F.col("e") != F.col("text")).count() == 0


def test_deterministic_across_partitionings(spark):
    """Same rows, different partition counts -> identical extracted
    bytes per url (the two-cluster-size invariant at test scale)."""
    a = generate_webpages(spark, 1500, partitions=2)
    b = generate_webpages(spark, 1500, partitions=13)
    ea = {r.url: r.e for r in
          a.select("url", extract_text_native(F.col("html")).alias("e"))
           .collect()}
    eb = {r.url: r.e for r in
          b.select("url", extract_text_native(F.col("html")).alias("e"))
           .collect()}
    assert ea == eb


def test_injected_extractor(spark):
    df = spark.createDataFrame([(b"<p>x</p>",)], "html binary")
    got = extract_text(df, "html", "t",
                       extractor=lambda b: f"len={len(b)}").first().t
    assert got == "len=8"


def test_extract_links(spark):
    html = ('<a href="https://a.com/x?p=1&amp;q=2">A</a> '
            "<A HREF='h://b'>B</A> <a name=x>no href</a> "
            '<a data-href="no" href="c">C</a> <link href="css">'
            '<a\n  class="z"\n  href = "d">D</a>').encode()
    df = spark.createDataFrame([(0, html), (1, b"no anchors"), (2, None)],
                               "id long, html binary")
    rows = df.select("id", extract_links(F.col("html")).alias("l")) \
             .orderBy("id").collect()
    # &amp; decoded; data-href NOT an href; <link> not an <a>; multiline tag ok
    assert rows[0].l == ["https://a.com/x?p=1&q=2", "h://b", "c", "d"]
    assert rows[1].l == []
    assert rows[2].l is None


def test_extract_links_plan_is_jvm_only(spark):
    pages = generate_webpages(spark, 100)
    plan = pages.select(extract_links(F.col("html")).alias("l")) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Exchange" not in plan


def test_native_plan_is_jvm_only(spark):
    """The 100 TB path must not leave the JVM or shuffle: no Python eval
    nodes, no Exchange — extraction pipelines with the scan."""
    pages = generate_webpages(spark, 100)
    plan = pages.select(
        "url", extract_text_native(F.col("html")).alias("t")) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
    assert "Exchange" not in plan
