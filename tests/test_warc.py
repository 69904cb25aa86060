"""WARC source: pure-parser round trips (plain + per-record gzip),
malformed-input failure modes, the distributed binaryFile ingest path,
and the full raw-crawl composition (WARC -> html -> extracted text ==
original, the byte-identity invariant from the container format up)."""

from __future__ import annotations

import gzip

import pytest
from pyspark.sql import functions as F

from gojsonschema_spark.io.warc import (
    parse_warc, read_warc, warc_record_bytes)
from gojsonschema_spark.ops.html import extract_text_native
from gojsonschema_spark.ops.webpages import generate_webpages


def _rec(i: int, html: bytes = b"<p>x</p>", **kw) -> bytes:
    return warc_record_bytes(f"https://h{i}.example.com/p",
                             "2026-08-17T01:02:03Z", html,
                             record_id=f"<urn:uuid:{i}>", **kw)


def test_parse_warc_round_trip_plain_and_gzip():
    plain = _rec(0) + _rec(1, b"<b>two</b>")
    recs = list(parse_warc(plain))
    assert [r[0]["warc-target-uri"] for r in recs] == [
        "https://h0.example.com/p", "https://h1.example.com/p"]
    assert recs[1][1].endswith(b"<b>two</b>")
    # Common Crawl framing: one gzip member per record, concatenated
    gz = _rec(0, compress=True) + _rec(1, b"<i>z</i>", compress=True)
    assert [r[1] for r in parse_warc(gz)] == \
        [r[1] for r in parse_warc(_rec(0) + _rec(1, b"<i>z</i>"))]
    # whole-file gzip also decodes
    assert len(list(parse_warc(gzip.compress(plain)))) == 2


def test_parse_warc_fails_loudly_on_malformed():
    good = _rec(0)
    with pytest.raises(ValueError, match="truncated"):
        list(parse_warc(good[:-30]))
    with pytest.raises(ValueError, match="version line"):
        list(parse_warc(b"NOT A WARC" + good))
    with pytest.raises(ValueError, match="Content-Length"):
        list(parse_warc(good.replace(b"Content-Length", b"X-Length")))


def test_read_warc_distributed(spark, tmp_path):
    d = tmp_path / "crawl"
    d.mkdir()
    (d / "a.warc").write_bytes(_rec(0) + _rec(1, b"<p>b</p>"))
    (d / "b.warc.gz").write_bytes(
        _rec(2, compress=True) + _rec(3, b"<p>d</p>", compress=True))
    df = read_warc(spark, str(d)).orderBy("record_id")
    rows = df.collect()
    assert [r.url for r in rows] == [
        f"https://h{i}.example.com/p" for i in range(4)]
    assert all(r.warc_ts.isoformat() == "2026-08-17T01:02:03" for r in rows)
    assert rows[1].html == b"<p>b</p>"          # HTTP headers stripped
    assert rows[3].html == b"<p>d</p>"
    assert rows[0].warc_file.endswith("a.warc")
    assert df.schema["html"].dataType.simpleString() == "binary"
    # one task per file: the binaryFile scan never splits a WARC
    assert "Exchange" not in df._jdf.queryExecution().executedPlan().toString() \
        .split("Sort")[0]


def test_read_warc_options(spark, tmp_path):
    f = tmp_path / "c.warc"
    req = _rec(7).replace(b"WARC-Type: response", b"WARC-Type: request")
    f.write_bytes(_rec(5) + req)
    # default keeps only responses
    assert read_warc(spark, str(f)).count() == 1
    assert read_warc(spark, str(f),
                     record_types=("request", "response")).count() == 2
    # strip_http=False keeps the full HTTP message
    raw = read_warc(spark, str(f), strip_http=False).first().html
    assert raw.startswith(b"HTTP/1.1 200 OK")
    # non-HTTP payload passes through unchanged
    bare = warc_record_bytes("https://x/", "2026-01-01T00:00:00Z",
                             b"\x00raw", http_headers=False)
    (tmp_path / "d.warc").write_bytes(bare)
    assert read_warc(spark, str(tmp_path / "d.warc")).first().html == b"\x00raw"


def test_warc_to_extracted_text_byte_identity(spark, tmp_path):
    """The ingest composition the north rule describes: container ->
    html binary -> native extraction reproduces the page text exactly."""
    pages = generate_webpages(spark, 40, partitions=2) \
        .dropDuplicates(["url"]).collect()
    # NB: mixing compressed and plain records in one file is NOT valid
    # WARC framing — write the two framings to separate files
    plain = b"".join(
        warc_record_bytes(r.url, r.warc_ts.isoformat() + "Z", bytes(r.html),
                          record_id=f"<urn:uuid:{i}>")
        for i, r in enumerate(pages) if i % 2 == 1)
    gz = b"".join(
        warc_record_bytes(r.url, r.warc_ts.isoformat() + "Z", bytes(r.html),
                          record_id=f"<urn:uuid:{i}>", compress=True)
        for i, r in enumerate(pages) if i % 2 == 0)
    (tmp_path / "p.warc").write_bytes(plain)
    (tmp_path / "g.warc.gz").write_bytes(gz)
    got = (read_warc(spark, str(tmp_path))
           .select("url", "warc_ts",
                   extract_text_native(F.col("html")).alias("t"))
           .collect())
    assert len(got) == len(pages)
    want = {r.url: (r.text, r.warc_ts) for r in pages}
    for r in got:
        assert (r.t, r.warc_ts) == want[r.url], r.url

def test_write_warc_round_trip(spark, tmp_path):
    """Distributed sink -> distributed source reproduces the pages:
    per-partition gzip-framed shards, manifest counts, no stray files."""
    from gojsonschema_spark.io.warc import write_warc

    pages = generate_webpages(spark, 60, partitions=3) \
        .dropDuplicates(["url"])
    d = str(tmp_path / "out")
    manifest = write_warc(pages, d, n_files=4).collect()
    import os
    names = sorted(os.listdir(d))
    assert names == sorted(os.path.basename(r.warc_file) for r in manifest)
    assert all(n.startswith("part-") and n.endswith(".warc.gz")
               for n in names)
    assert sum(r.n_records for r in manifest) == pages.count()
    back = read_warc(spark, d)
    want = {r.url: (bytes(r.html), r.warc_ts) for r in pages.collect()}
    got = {r.url: (bytes(r.html), r.warc_ts) for r in back.collect()}
    assert got == want
    # plain framing too, and empty partitions produce no file
    d2 = str(tmp_path / "out2")
    m2 = write_warc(pages.limit(2).repartition(8), d2,
                    compress=False).collect()
    assert sum(r.n_records for r in m2) == 2
    assert len(os.listdir(d2)) == len(m2) <= 2
