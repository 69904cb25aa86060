"""Deterministic synthetic Common-Crawl-style web-pages table.

The north-rule input shape (BASELINE.json input_hint):
``url string, warc_ts timestamp, html binary, text string, lang string``.

Generated entirely with distributed, seed-stable SQL expressions over
``spark.range(n)`` — no driver-side data, no Python RNG — so the same
generator scales from 500 rows (unit tests) to 10^9+ (bench/cluster)
with perfect determinism per row id:

* hosts are Zipf-skewed (host rank ~ floor(exp(u*ln(H))) on a hashed
  uniform) — exercises salting/AQE on the uniqueness checks;
* a fixed % of duplicate urls (exercises uniqueness), malformed urls
  (fails format:uri) and empty texts (fails minLength);
* ``text`` is a pure function of the url hash -> byte-identical per url
  across runs and cluster sizes (the per-row invariant);
* ``warc_ts`` spans 30 days; ``warc_bucket`` (daily) is the partition key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = ["generate_webpages", "FLAGSHIP_SCHEMA", "webpage_doc_column",
           "normalize_url", "url_host"]

_WORDS = ("the quick brown fox jumps over lazy dog data spark schema json "
          "valid check table scan web page crawl text token index shard "
          "merge batch stream query row column vector hash join sort").split()

N_HOSTS = 1000
DUP_PCT = 3       # % rows whose url duplicates another row's
BAD_URL_PCT = 2   # % rows with a malformed url (format: uri fails)
EMPTY_TEXT_PCT = 1


def generate_webpages(spark: SparkSession, n_rows: int,
                      partitions: int | None = None) -> DataFrame:
    """Deterministic (seed-free: row-id-hash driven) web-pages DataFrame."""
    df = spark.range(0, n_rows, 1, partitions) if partitions else spark.range(n_rows)
    rid = F.col("id")
    h1 = F.abs(F.xxhash64(rid, F.lit(1)))
    h2 = F.abs(F.xxhash64(rid, F.lit(2)))
    h3 = F.abs(F.xxhash64(rid, F.lit(3)))

    # duplicate urls: DUP_PCT% of rows take the FULL url of (id - id%37),
    # so every url-derived column (host, path, text) duplicates with it
    base_id = F.when((h2 % 100) < DUP_PCT, rid - (rid % 37)).otherwise(rid)

    # Zipf-ish skewed host rank: u in [0,1) -> floor(H^u) - 1 concentrates
    # mass on low ranks (host0 dominates) — deliberately skewed for salting
    bh1 = F.abs(F.xxhash64(base_id, F.lit(1)))
    u = (bh1 % 1_000_000) / 1_000_000.0
    host_rank = F.floor(F.pow(F.lit(float(N_HOSTS)), u)) - 1
    host = F.concat(F.lit("host"), host_rank.cast("string"), F.lit(".example.com"))

    path = F.concat(F.lit("/page/"), F.abs(F.xxhash64(base_id, F.lit(4))).cast("string"))
    good_url = F.concat(F.lit("https://"), host, path)
    bad_url = F.concat(F.lit("::not a uri "), rid.cast("string"))
    url = F.when((h3 % 100) < BAD_URL_PCT, bad_url).otherwise(good_url)

    # text: pure function of the url (byte-identical per url) — seeded
    # token soup, log-normal-ish length via hash bits
    uh = F.abs(F.xxhash64(url))
    n_tok = (F.lit(5) + (uh % 40) * ((uh % 7) + 1)).cast("int")
    words_lit = F.array(*[F.lit(w) for w in _WORDS])
    text_tokens = F.transform(
        F.sequence(F.lit(1), n_tok),
        lambda i: F.element_at(words_lit,
                               (F.abs(F.xxhash64(uh.cast("string"), i)) %
                                len(_WORDS) + 1).cast("int")))
    # empty-text decision keyed on the url hash so text stays a pure
    # function of url (per-row invariant: byte-identical text per url)
    text = F.when((uh % 100) < EMPTY_TEXT_PCT, F.lit("")) \
            .otherwise(F.concat_ws(" ", text_tokens))

    lang = F.element_at(
        F.array(F.lit("en"), F.lit("en"), F.lit("en"), F.lit("de"),
                F.lit("fr"), F.lit("es"), F.lit("zh")),
        ((h2 % 7) + 1).cast("int"))

    warc_ts = F.timestamp_seconds(F.lit(1717200000) + (h3 % (30 * 86400)))
    html = F.encode(F.concat(F.lit("<html><body>"), text, F.lit("</body></html>")),
                    "utf-8")

    return df.select(
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        html.alias("html"),
        text.alias("text"),
        lang.alias("lang"),
        F.to_date(warc_ts).alias("warc_bucket"),
    )


# The flagship validation schema for the web-pages corpus (bench headline).
FLAGSHIP_SCHEMA = {
    "$schema": "http://json-schema.org/draft-07/schema#",
    "type": "object",
    "required": ["url", "warc_ts", "text", "lang"],
    "properties": {
        "url": {"type": "string", "format": "uri", "maxLength": 2048},
        "warc_ts": {"type": "string", "format": "date-time"},
        "text": {"type": "string", "minLength": 1},
        "lang": {"type": "string", "pattern": "^[a-z]{2}$"},
        "n_tokens": {"type": "integer", "minimum": 0},
    },
    "additionalProperties": False,
}


def webpage_doc_column() -> F.Column:
    """JSON document per page (string column) for schema validation."""
    return F.to_json(F.struct(
        F.col("url"),
        F.date_format("warc_ts", "yyyy-MM-dd'T'HH:mm:ssXXX").alias("warc_ts"),
        F.col("text"),
        F.col("lang"),
        F.size(F.split("text", " ")).alias("n_tokens"),
    ))


def normalize_url(url: F.Column) -> F.Column:
    """Conservative URL canonicalization for dedup keys, all native
    regexp expressions (no Python, DuckDB-mirrorable):

    * scheme and host lowercased (userinfo/path case preserved)
    * default ports stripped (http:80, https:443)
    * fragment dropped
    * empty path normalized to "/" (e.g. https://host?q -> https://host/?q)
    * trailing slash trimmed from non-root paths without a query
    """
    # drop fragment
    u = F.regexp_replace(url, r"#.*$", "")
    # lowercase scheme
    u = F.concat(F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*:)", 1)),
                 F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*:", ""))
    # lowercase host (authority up to first /, ?, or end; keep userinfo@)
    host = F.regexp_extract(u, r"^[a-z][a-z0-9+.-]*://(?:[^/?@]*@)?([^/?:]*)", 1)
    u = F.concat(
        F.regexp_extract(u, r"^([a-z][a-z0-9+.-]*://(?:[^/?@]*@)?)", 1),
        F.lower(host),
        F.regexp_replace(u, r"^[a-z][a-z0-9+.-]*://(?:[^/?@]*@)?[^/?:]*", ""))
    # strip default ports
    u = F.regexp_replace(u, r"^(http://[^/?]*):80(?=[/?]|$)", r"$1")
    u = F.regexp_replace(u, r"^(https://[^/?]*):443(?=[/?]|$)", r"$1")
    # empty path -> "/"
    u = F.when(u.rlike(r"^[a-z][a-z0-9+.-]*://[^/?]*$"), F.concat(u, F.lit("/"))) \
         .when(u.rlike(r"^[a-z][a-z0-9+.-]*://[^/?]*\?"),
               F.regexp_replace(u, r"^([a-z][a-z0-9+.-]*://[^/?]*)\?", r"$1/?")) \
         .otherwise(u)
    # trim trailing slash on non-root query-less paths (root keeps "/")
    u = F.regexp_replace(u, r"^([a-z][a-z0-9+.-]*://[^/?]+/[^?]*[^/?])/$", r"$1")
    return u


def url_host(url: F.Column) -> F.Column:
    """Lowercased host of a URL (authority minus userinfo/port) — the
    grouping key for boilerplate removal and skew salting. Native regexp;
    NULL for urls without an authority."""
    host = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?@]*@)?([^/?:]+)", 1)
    return F.when(host != "", F.lower(host))
