"""URL structure ops (parse / registered domain / query canonicalization /
reference resolution) and the host link graph + PageRank: known-answer
cases, RFC 3986 resolution examples, a numpy cross-check of the power
iteration, and parallelism invariance (the decimal-rank determinism
claim)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from gojsonschema_spark.ops.graph import (
    host_degrees, host_link_graph, pagerank)
from gojsonschema_spark.ops.web import (
    parse_url, registered_domain, resolve_link, sort_query_params)


def _one(spark, col, value):
    return spark.createDataFrame([(value,)], ["u"]) \
        .select(col(F.col("u")).alias("r")).first().r


PARSE_CASES = {
    "https://user:pw@Host99.Example.COM:8443/a/b?x=1&y=2#frag": (
        "https", "user:pw", "host99.example.com", 8443, "/a/b",
        "x=1&y=2", "frag"),
    "http://example.com": ("http", None, "example.com", None, None,
                           None, None),
    "https://example.com/?": ("https", None, "example.com", None, "/",
                              None, None),
    "HTTPS://[2001:DB8::1]:443/p": ("https", None, "[2001:db8::1]", 443,
                                    "/p", None, None),
    "mailto:a@b.com": ("mailto", None, None, None, "a@b.com", None, None),
    "//cdn.example.com/lib.js": (None, None, "cdn.example.com", None,
                                 "/lib.js", None, None),
    "https://h/#f?notquery": ("https", None, "h", None, "/", None,
                              "f?notquery"),
    "/rel/path?q=1": (None, None, None, None, "/rel/path", "q=1", None),
}


def test_parse_url_components(spark):
    for url, want in PARSE_CASES.items():
        got = _one(spark, parse_url, url)
        assert tuple(got) == want, url


def test_parse_url_no_percent_decoding(spark):
    got = _one(spark, parse_url, "https://h/a%2Fb?k=v%26w")
    assert got.path == "/a%2Fb" and got.query == "k=v%26w"


REGDOM_CASES = {
    "a.b.host99.example.com": "example.com",
    "news.bbc.co.uk": "bbc.co.uk",
    "co.uk": "co.uk",                 # bare suffix passes through
    "www.foo.ne.jp": "foo.ne.jp",
    "example.com": "example.com",
    "localhost": "localhost",
    "192.168.0.1": "192.168.0.1",     # IP literals never split
    "[2001:db8::1]": "[2001:db8::1]",
    "deep.sub.gov.br": "sub.gov.br",  # 2-letter cc + known sld
}


def test_registered_domain(spark):
    for host, want in REGDOM_CASES.items():
        assert _one(spark, registered_domain, host) == want, host
    # injection point: a full-suffix entry not in the builtin table
    got = _one(spark,
               lambda c: registered_domain(c, extra_suffixes=("blogspot.com",)),
               "x.myblog.blogspot.com")
    assert got == "myblog.blogspot.com"


SORTQ_CASES = {
    "https://h/p?b=2&a=1": "https://h/p?a=1&b=2",
    "https://h/p?b=2&a=1#frag": "https://h/p?a=1&b=2#frag",
    "https://h/p": "https://h/p",                    # no query: unchanged
    "https://h/p#a?b=1": "https://h/p#a?b=1",        # ? inside fragment
    "https://h/p?z": "https://h/p?z",
    "https://h/p?a=1&a=0": "https://h/p?a=0&a=1",    # repeats byte-sort
}


def test_sort_query_params(spark):
    for url, want in SORTQ_CASES.items():
        got = _one(spark, sort_query_params, url)
        assert got == want, url


BASE = "https://h.example.com/dir/sub/page.html?bq=1#bf"
RESOLVE_CASES = {
    # absolute + protocol-relative
    "https://other.com/x": "https://other.com/x",
    "//cdn.com/lib": "https://cdn.com/lib",
    # root-relative, query-relative
    "/top/x?q=2": "https://h.example.com/top/x?q=2",
    "?only=q": "https://h.example.com/dir/sub/page.html?only=q",
    # path-relative with RFC 3986 §5.2.4 dot segments
    "x.html": "https://h.example.com/dir/sub/x.html",
    "./x.html": "https://h.example.com/dir/sub/x.html",
    "../x.html": "https://h.example.com/dir/x.html",
    "../../x.html": "https://h.example.com/x.html",
    "../../../x.html": "https://h.example.com/x.html",   # clamped at root
    "..": "https://h.example.com/dir/",
    "a/../b/./c": "https://h.example.com/dir/sub/b/c",
    "x.html#f": "https://h.example.com/dir/sub/x.html#f",
    # non-edges
    "": None,
    "   ": None,
    "#sec": None,
    "javascript:void(0)": None,
    "MAILTO:a@b": None,
}


def test_resolve_link_rfc3986(spark):
    rows = [(BASE, h, want) for h, want in RESOLVE_CASES.items()]
    df = spark.createDataFrame(rows, ["base", "href", "want"]) \
        .select("href", "want",
                resolve_link(F.col("base"), F.col("href")).alias("got"))
    for r in df.collect():
        assert r.got == r.want, f"href={r.href!r}: {r.got!r} != {r.want!r}"
    # authority-only base: merge path is /
    got = spark.createDataFrame([("https://h.com", "x")], ["b", "h"]) \
        .select(resolve_link(F.col("b"), F.col("h")).alias("r")).first().r
    assert got == "https://h.com/x"


def _pages(spark):
    """Three pages; links across hosts incl. a relative href and one
    self-link (dropped by default)."""
    rows = [
        ("https://a.com/p1",
         '<a href="https://b.com/x">1</a><a href="/p2">self</a>'
         "<a href='//c.com/y'>2</a>"),
        ("https://a.com/p2", '<a href="https://b.com/x">again</a>'),
        ("https://b.com/q", '<a href="../z">rel</a>'
                            '<a href="mailto:x@y">no</a>'),
    ]
    return spark.createDataFrame(rows, ["url", "html"])


def test_host_link_graph_and_degrees(spark):
    edges = host_link_graph(_pages(spark), is_binary=False)
    got = {(r.src, r.dst): r.n_links for r in edges.collect()}
    # b.com/q's "../z" resolves inside b.com -> self edge, excluded
    assert got == {("a.com", "b.com"): 2, ("a.com", "c.com"): 1}
    deg = {r.host: (r.out_degree, r.out_links, r.in_degree, r.in_links)
           for r in host_degrees(edges).collect()}
    assert deg == {"a.com": (2, 3, 0, 0), "b.com": (0, 0, 1, 2),
                   "c.com": (0, 0, 1, 1)}
    # self-edges kept on request
    with_self = host_link_graph(_pages(spark), is_binary=False,
                                exclude_self=False)
    got2 = {(r.src, r.dst): r.n_links for r in with_self.collect()}
    assert got2[("a.com", "a.com")] == 1 and got2[("b.com", "b.com")] == 1


def _np_pagerank(edges, n_iter, damping=0.85, weighted=True):
    hosts = sorted({u for u, _, _ in edges} | {v for _, v, _ in edges})
    idx = {h: i for i, h in enumerate(hosts)}
    n = len(hosts)
    M = np.zeros((n, n))
    for u, v, w in edges:
        M[idx[v], idx[u]] += (w if weighted else 1.0)
    out = M.sum(axis=0)
    linked = out > 0
    M[:, linked] /= out[linked]
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        dangling = r[~linked].sum()
        r = (1 - damping) / n + damping * (M @ r + dangling / n)
    return dict(zip(hosts, r))


EDGES = [("a", "b", 3), ("a", "c", 1), ("b", "c", 1), ("c", "a", 2),
         ("b", "d", 2), ("d", "e", 1), ("f", "a", 1)]
# e is dangling (no out-edges); f has no in-edges


@pytest.mark.parametrize("weighted", [True, False])
def test_pagerank_matches_numpy(spark, weighted):
    df = spark.createDataFrame(EDGES, ["src", "dst", "n_links"])
    got = {r.host: r.rank
           for r in pagerank(df, max_iter=6, tol=None,
                             weighted=weighted).collect()}
    want = _np_pagerank(EDGES, 6, weighted=weighted)
    assert set(got) == set(want)
    for h in want:
        assert got[h] == pytest.approx(want[h], abs=1e-12), h
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_parallelism_invariant(spark):
    """Decimal ranks: identical bytes at 2 and 32 partitions."""
    a = spark.createDataFrame(EDGES, ["src", "dst", "n_links"]) \
        .repartition(2)
    b = spark.createDataFrame(EDGES, ["src", "dst", "n_links"]) \
        .repartition(32)
    ra = sorted((r.host, r.rank) for r in
                pagerank(a, max_iter=5, tol=None).collect())
    rb = sorted((r.host, r.rank) for r in
                pagerank(b, max_iter=5, tol=None).collect())
    assert ra == rb


def test_pagerank_converges_early(spark):
    """The tol early-stop actually fires: with damping 0.3 the L1 delta
    contracts ~0.3x/iteration, so 1e-6 is reached in ~12 iterations —
    far below max_iter — and the result matches the converged numpy
    fixed point."""
    df = spark.createDataFrame(EDGES, ["src", "dst", "n_links"])
    got = {r.host: r.rank
           for r in pagerank(df, damping=0.3, max_iter=50,
                             tol=1e-6).collect()}
    want = _np_pagerank(EDGES, 60, damping=0.3)
    for h in want:
        assert got[h] == pytest.approx(want[h], abs=1e-5), h


def test_pagerank_over_generated_pages(spark):
    """End-to-end composition: synthetic corpus html -> link graph ->
    pagerank; ranks form a probability distribution over hosts."""
    from gojsonschema_spark.ops.webpages import generate_webpages

    pages = generate_webpages(spark, 300, partitions=4).select(
        "url",
        F.concat(F.lit('<a href="https://host'),
                 (F.xxhash64("url") % 5).cast("string"),
                 F.lit('.example.com/l">x</a><a href="/self">s</a>'))
         .alias("html"))
    edges = host_link_graph(pages, is_binary=False)
    ranks = pagerank(edges, max_iter=3, tol=None)
    rows = ranks.collect()
    assert len(rows) > 0
    assert sum(r.rank for r in rows) == pytest.approx(1.0, abs=1e-6)
    assert all(r.rank > 0 for r in rows)


def test_extract_anchors(spark):
    """(href, text) pairs: quoted hrefs both styles, inner markup
    stripped to spaces, whitespace collapsed, &amp; decoded in BOTH
    fields, no-href anchors skipped, text-free anchors yield ''."""
    from gojsonschema_spark.ops.html import extract_anchors

    html = ('<p><a class="x" href="/a?x=1&amp;y=2"> <b>Bold</b>\n'
            'link </a><a name=skip>no href</a>'
            "<a href='/b'>salt &amp; pepper</a>"
            '<a href="/c"></a>tail</p>')
    [row] = spark.createDataFrame([(html,)], ["h"]).select(
        extract_anchors(F.col("h"), is_binary=False).alias("a")).collect()
    got = [(a.href, a.text) for a in row.a]
    assert got == [("/a?x=1&y=2", "Bold link"),
                   ("/b", "salt & pepper"),
                   ("/c", "")]


def test_anchor_text_aggregate(spark):
    """Resolution + counting + bounded top-k: relative hrefs resolve
    against each page, mailto drops, empty anchors drop, counts merge
    across pages, top_n slices (count desc, anchor asc)."""
    from gojsonschema_spark.ops.graph import anchor_text_aggregate

    def page(i):
        return (f"https://s{i % 2}.ex.com/p/{i}",
                f'<a href="/hub">go hub</a>'
                f'<a href="https://t.ex.com/x">{"alpha" if i % 3 else "beta"}</a>'
                f'<a href="mailto:a@b">m</a><a href="/hub"></a>'.encode())
    df = spark.createDataFrame([page(i) for i in range(12)],
                               "url string, html binary")
    out = anchor_text_aggregate(df, top_n=1)
    rows = {(r.target, r.anchor): r.n for r in out.collect()}
    # /hub resolves per-HOST: 6 pages each host, anchor "go hub"
    assert rows[("https://s0.ex.com/hub", "go hub")] == 6
    assert rows[("https://s1.ex.com/hub", "go hub")] == 6
    # t.ex.com/x: alpha 8x beats beta 4x; top_n=1 keeps alpha only
    assert rows[("https://t.ex.com/x", "alpha")] == 8
    assert len(rows) == 3


def test_extract_anchors_gt_inside_href(spark):
    """'>' inside the QUOTED href must not end the opening tag early
    and leak the attribute tail into the anchor text."""
    from gojsonschema_spark.ops.html import extract_anchors

    html = '<a href="/x?q=a>b" class="y">link text</a>'
    [row] = spark.createDataFrame([(html,)], ["h"]).select(
        extract_anchors(F.col("h"), is_binary=False).alias("a")).collect()
    assert [(a.href, a.text) for a in row.a] == [("/x?q=a>b", "link text")]
