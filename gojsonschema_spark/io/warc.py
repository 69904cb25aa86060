"""WARC (ISO 28500) source — the container format Common Crawl actually
ships. Completes the source family (parquet / catalog / JSONL / CSV in
``io/tables.py``) with the raw-crawl ingest path:

    read_warc(spark, "s3a://commoncrawl/.../*.warc.gz")
        -> (warc_file, record_id, url, warc_ts, html binary)

Scale model: one WARC file = one task. Spark's ``binaryFile`` source
never splits a file, and WARC's gzip framing (one gzip member per
record) is not block-splittable anyway — Common Crawl publishes ~64k
files of ~1 GB per crawl precisely so that file-level parallelism is
sufficient. At 1000 executors the unit of work is the file, the parse
is a pure function of the file bytes (deterministic re-execution under
task retry), and nothing shuffles: parse output flows straight into
extraction/validation map stages.

The parser is pure stdlib (``gzip``/binary splitting — no warcio
dependency) and handles both plain and gzipped files, including the
multi-member per-record gzip framing Common Crawl uses (``gzip.
decompress`` consumes concatenated members). HTTP response payloads are
unwrapped to the entity body (the html bytes) by default, matching the
``html binary`` column of the input_hint shape.

Reference parity note: gojsonschema has no crawl-ingest surface — this
exists for the Common-Crawl-style corpus contract (BASELINE.json
north_star / input_hint).
"""

from __future__ import annotations

import gzip
from collections.abc import Iterator
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession

__all__ = ["read_warc", "parse_warc", "warc_record_bytes", "write_warc"]

_CRLF2 = b"\r\n\r\n"

READ_WARC_SCHEMA = ("warc_file string, record_id string, url string, "
                    "warc_ts timestamp, html binary")


def _parse_headers(block: bytes) -> dict[str, str]:
    """WARC named fields: 'Name: value' lines, names case-insensitive.
    Tolerates LWS continuation lines by folding them into the previous
    field (rare in practice, legal per the grammar)."""
    headers: dict[str, str] = {}
    last = None
    for line in block.split(b"\r\n"):
        if line[:1] in (b" ", b"\t") and last is not None:
            headers[last] += " " + line.strip().decode("latin-1")
            continue
        name, sep, value = line.partition(b":")
        if sep:
            last = name.strip().decode("latin-1").lower()
            headers[last] = value.strip().decode("latin-1")
    return headers


def parse_warc(data: bytes) -> Iterator[tuple[dict[str, str], bytes]]:
    """Yield ``(headers, payload)`` per record from raw WARC bytes
    (plain or gzip, multi-member ok). Pure function of the input —
    deterministic under task retry. Raises ValueError on a malformed
    record boundary (truncated files should fail loudly, not silently
    drop the tail of a crawl)."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record CRLFs
        while data[pos:pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            return
        if not data.startswith(b"WARC/", pos):
            raise ValueError(f"malformed WARC: no version line at byte {pos}")
        head_end = data.find(_CRLF2, pos)
        if head_end < 0:
            raise ValueError("malformed WARC: unterminated header block")
        # drop the version line, keep the named fields
        block = data[pos:head_end]
        fields = _parse_headers(block.split(b"\r\n", 1)[1]
                                if b"\r\n" in block else b"")
        try:
            length = int(fields["content-length"])
        except (KeyError, ValueError):
            raise ValueError("malformed WARC: missing/bad Content-Length")
        body_start = head_end + len(_CRLF2)
        if body_start + length > n:
            raise ValueError("malformed WARC: truncated record payload")
        yield fields, data[body_start:body_start + length]
        pos = body_start + length


def _http_body(payload: bytes) -> bytes:
    """Entity body of an HTTP response payload (headers dropped); a
    payload that isn't an HTTP message passes through unchanged."""
    if payload[:5] != b"HTTP/":
        return payload
    sep = payload.find(_CRLF2)
    return payload if sep < 0 else payload[sep + len(_CRLF2):]


def _warc_ts(value: str | None) -> datetime | None:
    """WARC-Date (ISO 8601 UTC) -> naive-UTC datetime (TIMESTAMP shape
    of the input_hint table)."""
    if not value:
        return None
    try:
        dt = datetime.fromisoformat(value.replace("Z", "+00:00"))
    except ValueError:
        return None
    if dt.tzinfo is not None:
        dt = dt.astimezone(timezone.utc).replace(tzinfo=None)
    return dt


def read_warc(spark: SparkSession, path: str, *,
              record_types: tuple[str, ...] = ("response",),
              strip_http: bool = True,
              path_glob: str | None = None) -> DataFrame:
    """Distributed WARC ingest: ``binaryFile`` scan (one file per task,
    never split) -> Arrow-batched per-file parse -> the input_hint page
    shape. ``record_types`` filters on WARC-Type (default: the
    ``response`` records that carry page bodies); ``strip_http=False``
    keeps the full HTTP message as the html payload.
    """
    import pandas as pd

    keep = tuple(t.lower() for t in record_types)

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path_, content in zip(pdf["path"], pdf["content"]):
                out: list[tuple] = []
                for fields, payload in parse_warc(bytes(content)):
                    if fields.get("warc-type", "").lower() not in keep:
                        continue
                    out.append((
                        path_,
                        fields.get("warc-record-id"),
                        fields.get("warc-target-uri"),
                        _warc_ts(fields.get("warc-date")),
                        _http_body(payload) if strip_http else payload,
                    ))
                yield pd.DataFrame(
                    out, columns=["warc_file", "record_id", "url",
                                  "warc_ts", "html"])

    reader = spark.read.format("binaryFile")
    if path_glob:
        reader = reader.option("pathGlobFilter", path_glob)
    files = reader.load(path).select("path", "content")
    return files.mapInPandas(_parse, READ_WARC_SCHEMA)


def warc_record_bytes(url: str, date: str, html: bytes, *,
                      record_id: str = "<urn:uuid:0>",
                      http_headers: bool = True,
                      compress: bool = False) -> bytes:
    """One serialized WARC response record (test/fixture builder — the
    write half of the round-trip pin). ``compress=True`` emits a single
    gzip member, Common Crawl's per-record framing: concatenating the
    results of many calls yields a valid ``.warc.gz``."""
    payload = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html
               if http_headers else html)
    rec = (b"WARC/1.0\r\n"
           b"WARC-Type: response\r\n"
           b"WARC-Target-URI: " + url.encode() + b"\r\n"
           b"WARC-Date: " + date.encode() + b"\r\n"
           b"WARC-Record-ID: " + record_id.encode() + b"\r\n"
           b"Content-Type: application/http; msgtype=response\r\n"
           b"Content-Length: " + str(len(payload)).encode() + b"\r\n"
           b"\r\n" + payload + b"\r\n\r\n")
    return gzip.compress(rec) if compress else rec


def write_warc(df: DataFrame, path: str, *,
               url_col: str = "url", ts_col: str = "warc_ts",
               html_col: str = "html", n_files: int | None = None,
               compress: bool = True) -> DataFrame:
    """Distributed WARC sink — the write half of the crawl round-trip:
    each partition serializes its rows as one ``part-NNNNN.warc[.gz]``
    (Common Crawl's per-record gzip-member framing, so any subset of
    files is itself a valid crawl shard). Returns a lazy one-row-per-
    file manifest ``(warc_file, n_records)``; **collecting the manifest
    performs the write**. Parallelism = number of partitions; pass
    ``n_files`` to repartition first (Spark's round-robin repartition
    sorts locally, so file contents are deterministic under task
    retry). Empty partitions produce no file. Writes go through a
    ``_tmp-`` name renamed into place, so a killed task never leaves a
    half-written shard visible.

    ``path`` must be a directory reachable from every executor (POSIX
    path on local/NFS; for object stores, write locally per task and
    ship — out of scope here). Timestamps: tz-aware values are
    converted to UTC; tz-naive values (TIMESTAMP_NTZ, or LTZ under a
    UTC session) are written as-is with a ``Z`` suffix — run sessions
    in UTC, the Spark default here.
    """
    import os

    import pandas as pd
    from pyspark import TaskContext

    if n_files is not None:
        df = df.repartition(n_files)
    cols = df.select(url_col, ts_col, html_col)
    ext = ".warc.gz" if compress else ".warc"

    def _write(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pid = TaskContext.get().partitionId()
        tmp = os.path.join(path, f"_tmp-part-{pid:05d}{ext}")
        final = os.path.join(path, f"part-{pid:05d}{ext}")
        n = 0
        fh = None
        for pdf in batches:
            if fh is None and len(pdf):
                fh = open(tmp, "wb")
            for url, ts, html in zip(pdf.iloc[:, 0], pdf.iloc[:, 1],
                                     pdf.iloc[:, 2]):
                if getattr(ts, "tzinfo", None) is not None:
                    ts = ts.tz_convert("UTC").tz_localize(None)
                fh.write(warc_record_bytes(
                    str(url), ts.strftime("%Y-%m-%dT%H:%M:%SZ"), bytes(html),
                    record_id=f"<urn:uuid:{pid}-{n}>", compress=compress))
                n += 1
        if fh is not None:
            fh.close()
            os.replace(tmp, final)
            yield pd.DataFrame([(final, n)],
                               columns=["warc_file", "n_records"])

    os.makedirs(path, exist_ok=True)
    return cols.mapInPandas(_write, "warc_file string, n_records long")
