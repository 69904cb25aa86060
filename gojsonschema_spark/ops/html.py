"""HTML -> text extraction for Common-Crawl-style pages.

The north-star per-row invariant is *byte-identical extracted text per
url* across runs and cluster sizes: extraction must be a pure function
of the ``html`` bytes, independent of partitioning, core count, or
execution order. Two engines share one output contract:

* :func:`extract_text_native` — a chain of JVM-native ``regexp_replace``
  expressions (whole-stage codegen, zero Python, DuckDB-mirrorable).
  The 100 TB fast path: it pipelines with the parquet scan and needs no
  Python worker. Handles comments, CDATA, DOCTYPE, ``script``/``style``/
  ``noscript``/``template`` suppression and the core named character
  references; the tag tokenizer is quote-aware (a ``>`` inside a quoted
  attribute value does not end the tag). Numeric character references
  and pathological markup (e.g. an unclosed ``<script>``) are out of
  scope here — use the robust path for those.
* :func:`extract_text` — Python stdlib :class:`html.parser.HTMLParser`
  inside an Arrow-batched pandas UDF. Full named + numeric character
  reference table (``html.unescape`` semantics via ``convert_charrefs``),
  tolerant of ill-formed markup. ~10-30x slower per byte than the native
  path; use it when fidelity beats throughput, or inject your own
  ``extractor=`` (trafilatura/justext in production) through the same
  plumbing.

Output contract (both engines, equivalence-pinned in
tests/test_html_extract.py): markup boundaries become single spaces,
entities are decoded after tag removal (``&lt;b&gt;`` is literal text,
never markup), NBSP becomes a plain space, and runs of
``[ \\t\\n\\x0B\\f\\r\\u00A0]`` collapse to one space with the result
trimmed. The whitespace class is pinned explicitly because Java's
``\\s`` and Python's ``\\s`` disagree outside ASCII.

Reference parity note: gojsonschema has no HTML surface — this operator
exists for the web-pages corpus contract (BASELINE.json north_star:
"guarantees byte-identical extracted text per url").
"""

from __future__ import annotations

import re
from collections.abc import Callable
from html.parser import HTMLParser

import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import StringType

__all__ = ["extract_text_native", "extract_text", "html_to_text",
           "extract_links", "extract_anchors", "NATIVE_ENTITIES"]

# Named references the native path decodes, in application order.
# ``&amp;`` MUST be last so "&amp;lt;" decodes to the literal "&lt;",
# exactly as html.unescape does.
NATIVE_ENTITIES = (
    ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&apos;", "'"),
    ("&nbsp;", " "), ("&amp;", "&"),
)

# Pinned whitespace-run class — identical byte set in Java and Python.
_WS_JAVA = "[ \\t\\n\\x0B\\f\\r\\u00A0]+"
_WS_PY = re.compile("[ \\t\\n\\x0b\\f\\r\\xa0]+")


def _html_string(col: Column) -> Column:
    """Binary -> string. ``cast(binary as string)`` reinterprets the raw
    bytes as UTF-8 without validation (UTF8String.fromBytes) — total and
    deterministic, never throws under ANSI. Malformed sequences pass
    through byte-for-byte; the robust path replaces them with U+FFFD
    instead (the one documented divergence, valid UTF-8 is identical)."""
    return col.cast("string")


def extract_text_native(html_col: Column, *, is_binary: bool = True) -> Column:
    """Tag-stripping text extraction as a pure JVM expression chain.

    Deterministic by construction (regexp_replace is a pure function);
    stays inside whole-stage codegen, so at 10^12 pages it is scan-bound,
    not CPU-bound, and never leaves the JVM.
    """
    s = _html_string(html_col) if is_binary else html_col
    # element content that must vanish entirely — non-greedy, dotall,
    # case-insensitive; \1 backreference keeps <script>..</style> honest
    # quote-aware tag interior: a '>' inside "..." or '...' attribute
    # values does not end the tag (matches html.parser's tokenizer)
    tag_body = "(?:[^>\"']|\"[^\"]*\"|'[^']*')*"
    s = F.regexp_replace(
        s, "(?is)<(script|style|noscript|template)\\b" + tag_body
           + ">.*?</\\1\\s*>", " ")
    # comments, CDATA, doctype/processing declarations
    s = F.regexp_replace(s, "(?s)<!--.*?-->", " ")
    s = F.regexp_replace(s, "(?is)<!\\[CDATA\\[.*?\\]\\]>", " ")
    s = F.regexp_replace(s, "(?is)<[!?][^>]*>", " ")
    # every remaining tag is a word boundary
    s = F.regexp_replace(s, "(?s)<" + tag_body + ">", " ")
    # entities decode AFTER markup removal: "&lt;b&gt;" is literal text
    for ent, ch in NATIVE_ENTITIES:
        s = F.replace(s, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(s, _WS_JAVA, " "))


def extract_links(html_col: Column, *, is_binary: bool = True) -> Column:
    """Outlink (href) extraction as a single native ``regexp_extract_all``
    — the first step of any web-graph build (host graph, PageRank seeds,
    crawl frontiers). Zero Python, pipelines with the scan.

    Scope: double- or single-quoted ``href`` values on ``<a>`` tags
    (the overwhelmingly dominant form in real markup); ``&amp;`` inside
    URLs is decoded (query separators are routinely entity-escaped in
    conforming HTML). Unquoted hrefs and hrefs behind a quoted ``>``
    earlier in the same tag are out of scope — documented, like the
    native extractor's charref scope.
    """
    s = _html_string(html_col) if is_binary else html_col
    quoted = F.regexp_extract_all(
        s, F.lit("(?is)<a\\b[^>]*?\\shref\\s*=\\s*(\"[^\"]*\"|'[^']*')"), 1)
    return F.transform(
        quoted,
        lambda u: F.replace(F.substring(u, F.lit(2), F.length(u) - 2),
                            F.lit("&amp;"), F.lit("&")))


def extract_anchors(html_col: Column, *, is_binary: bool = True) -> Column:
    """(href, anchor text) pairs — ``array<struct<href,text>>``. Anchor
    text is a first-class training signal (it describes the TARGET
    page; search and query-doc datasets are built from it), so the
    graph build keeps it alongside the edge.

    All native: one ``regexp_extract_all`` for the ``<a
    href=...>...</a>`` blocks, then per block a href extract (same
    quoted-href scope as :func:`extract_links`) and a text cleanup
    (inner markup -> space, whitespace collapsed, ``&amp;`` decoded).
    Out of scope, documented: unquoted hrefs, NESTED ``<a>`` (the block
    regex ends at the first ``</a>``), and full charref decode (use
    :func:`extract_text` for that — anchors overwhelmingly carry plain
    words).
    """
    s = _html_string(html_col) if is_binary else html_col
    blocks = F.regexp_extract_all(
        s, F.lit("(?is)<a\\b[^>]*?\\shref\\s*=\\s*"
                 "(\"[^\"]*\"|'[^']*')[^>]*>.*?</a>"), 0)

    def to_struct(b: Column) -> Column:
        href_q = F.regexp_extract(
            b, "(?is)^<a\\b[^>]*?\\shref\\s*=\\s*(\"[^\"]*\"|'[^']*')", 1)
        href = F.replace(
            F.substring(href_q, F.lit(2), F.length(href_q) - 2),
            F.lit("&amp;"), F.lit("&"))
        # the opening tag is re-matched WITH the quoted href group so a
        # '>' inside the href value cannot end the tag early and leak
        # the attribute tail into the text (a quoted '>' in attributes
        # AFTER href remains out of scope, like extract_links)
        inner = F.regexp_extract(
            b, "(?is)^<a\\b[^>]*?\\shref\\s*=\\s*"
               "(\"[^\"]*\"|'[^']*')[^>]*>(.*)</a>$", 2)
        text = F.replace(
            F.trim(F.regexp_replace(
                F.regexp_replace(inner, "(?s)<[^>]*>", " "),
                "\\s+", " ")),
            F.lit("&amp;"), F.lit("&"))
        return F.struct(href.alias("href"), text.alias("text"))

    return F.transform(blocks, to_struct)


class _TextParser(HTMLParser):
    """Accumulates visible text; suppresses script/style/noscript/template
    subtrees; every markup token contributes a space so adjacent text
    never fuses across a tag (matching the native chain)."""

    _SKIP = frozenset({"script", "style", "noscript", "template"})

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._skip = 0
        self._parts: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag in self._SKIP:
            self._skip += 1
        self._parts.append(" ")

    def handle_endtag(self, tag):
        if tag in self._SKIP and self._skip:
            self._skip -= 1
        self._parts.append(" ")

    def handle_data(self, data):
        if not self._skip:
            self._parts.append(data)

    def handle_comment(self, data):        # markup, not text
        self._parts.append(" ")

    def handle_decl(self, decl):
        self._parts.append(" ")

    def handle_pi(self, data):
        self._parts.append(" ")

    def unknown_decl(self, data):          # CDATA and friends
        self._parts.append(" ")

    def text(self) -> str:
        return _WS_PY.sub(" ", "".join(self._parts)).strip()


def html_to_text(html: bytes | str | None) -> str | None:
    """Single-document robust extraction (the default ``extractor=``).

    Pure function of the input bytes — no state survives between calls
    (a fresh parser per document; HTMLParser is cheap to construct)."""
    if html is None:
        return None
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    p = _TextParser()
    try:
        p.feed(html)
        p.close()
    except Exception:
        # html.parser is tolerant by design; anything that still throws
        # (pathological declarations) yields whatever text was gathered
        pass
    return p.text()


def extract_text(df: DataFrame, html_col: str = "html",
                 out_col: str = "extracted_text",
                 extractor: Callable[[bytes], str] | None = None) -> DataFrame:
    """Robust-path extraction: Arrow-batched pandas UDF over the html
    column. ``extractor=`` injects a production extractor (trafilatura,
    justext, a boilerpipe port) through the same plumbing — it must be a
    pure function of the bytes to preserve the byte-identity invariant.
    """
    fn = extractor or html_to_text

    @F.pandas_udf(StringType())
    def _extract(batch: pd.Series) -> pd.Series:
        return batch.map(fn)

    # .asNondeterministic(): Catalyst filter pushdown clones Python eval
    # nodes for deterministic UDFs (see SURVEY — measured re-execution)
    udf = _extract.asNondeterministic()
    return df.withColumn(out_col, udf(F.col(html_col)))
