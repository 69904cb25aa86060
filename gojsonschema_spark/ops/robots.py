"""Robots Exclusion Protocol (RFC 9309) operators: parse per-host
robots.txt bodies into a rules table and evaluate crawl permission for
every page URL — the gate between a raw crawl and a usable corpus
(fetch compliance audits, retroactive takedown passes, corpus policy
filters).

Scale model (10^12 pages, ~10^8 hosts):

* robots.txt bodies are a HOST-level dimension (orders of magnitude
  smaller than the page table), so the stateful line parser runs as an
  Arrow-batched ``mapInPandas`` over that small side only — the page
  table never meets Python.
* :func:`crawl_allowed` joins pages to ONE row per host (the host's
  rules pre-collected into an array), so the join never multiplies
  page rows, and the verdict — RFC 9309 longest-match, allow wins ties
  — is a single map-side ``aggregate`` pass over that bounded array.
  No groupBy on url, no second shuffle; skewed hosts are AQE's problem
  (and the hot side carries only one dimension row per host).

Reference parity note: gojsonschema has no crawl surface; this exists
for the Common-Crawl corpus contract (BASELINE.json north_star). The
matching semantics are RFC 9309 §2.2: ``*`` wildcards, ``$`` end
anchor, longest-pattern precedence, allow wins length ties, and a
user-agent falls back to the ``*`` group only when no specific group
exists for it (agent matching is exact-token, case-insensitive —
the RFC's longest-prefix product-token refinement is out of scope,
documented).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame, functions as F

from gojsonschema_spark.ops.webpages import url_host

__all__ = ["parse_robots_text", "parse_robots", "crawl_allowed"]

RULES_SCHEMA = "host string, agent string, allow boolean, pattern string"


def parse_robots_text(body: str) -> list[tuple[str, bool, str]]:
    """Pure parser: robots.txt body -> [(agent, allow, pattern)].

    RFC 9309 grammar: ``#`` comments stripped; field names
    case-insensitive; consecutive ``User-agent`` lines open ONE group
    whose rules belong to every listed agent; a ``User-agent`` line
    after rules starts a new group. Empty-pattern rules carry no
    restriction and are dropped. Unknown fields (Crawl-delay, Sitemap)
    are ignored per §2.2.4."""
    out: list[tuple[str, bool, str]] = []
    agents: list[str] = []
    in_rules = False
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, value = line.split(":", 1)
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if in_rules:
                agents = []
                in_rules = False
            agents.append(value.lower())
        elif field in ("allow", "disallow"):
            in_rules = True
            if value:
                for a in agents:
                    out.append((a, field == "allow", value))
    return out


def parse_robots(df: DataFrame, host_col: str = "host",
                 body_col: str = "robots_txt") -> DataFrame:
    """Distributed robots.txt parse: ``(host, body)`` -> one row per
    rule ``(host, agent, allow, pattern)``. Arrow-batched mapInPandas
    (the parse is stateful across lines — not a native-expression
    shape); acceptable Python because robots bodies are the host-level
    small side, never the page table."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hosts, agents, allows, pats = [], [], [], []
            for host, body in zip(pdf[host_col], pdf[body_col]):
                for agent, allow, pattern in parse_robots_text(body or ""):
                    hosts.append(host)
                    agents.append(agent)
                    allows.append(allow)
                    pats.append(pattern)
            yield pd.DataFrame({"host": hosts, "agent": agents,
                                "allow": allows, "pattern": pats})

    return df.mapInPandas(run, RULES_SCHEMA)


def _pattern_rx(pattern: Column) -> Column:
    """REP pattern -> Java regex: ``*`` -> ``.*``, trailing ``$``
    anchors, everything else literal (prefix match — leading ``^``,
    open end)."""
    ends = pattern.endswith("$")
    core = F.when(ends, F.substr(pattern, F.lit(1),
                                 F.length(pattern) - 1)) \
        .otherwise(pattern)
    esc = F.regexp_replace(core, r"([.^$+?(){}\[\]\\|])", r"\\$1")
    wild = F.replace(esc, F.lit("*"), F.lit(".*"))
    return F.concat(F.lit("^"), wild,
                    F.when(ends, F.lit("$")).otherwise(F.lit("")))


def crawl_allowed(pages: DataFrame, rules: DataFrame, agent: str,
                  url_col: str = "url") -> DataFrame:
    """Append ``allowed`` (RFC 9309 verdict for ``agent``) to every
    page row.

    Rule selection per §2.2.1: the agent's own group if the host has
    one, else the ``*`` group, else no rules (allowed). Precedence per
    §2.2.2: longest matching pattern wins; on a length tie allow beats
    disallow. The match target is the URL path plus query.

    Plan shape: rules collapse to ONE array row per host (two small
    aggregations on the dimension side), pages join that once (AQE
    decides broadcast vs shuffle), and the verdict is one map-side
    ``aggregate`` lambda over the host's bounded rule array — page
    rows are never multiplied and never reshuffled.
    """
    target = agent.lower()
    r = rules.select(
        "host", F.lower(F.col("agent")).alias("agent"),
        F.col("allow").cast("int").alias("allow"),
        F.length("pattern").alias("plen"), _pattern_rx(F.col("pattern"))
        .alias("rx"))
    spec_hosts = (r.filter(F.col("agent") == target)
                   .select("host").distinct())
    applicable = (r.filter(F.col("agent") == target)
                   .unionByName(r.filter(F.col("agent") == "*")
                                 .join(spec_hosts, "host", "left_anti")))
    host_rules = applicable.groupBy("host").agg(
        F.collect_list(F.struct("plen", "allow", "rx")).alias("_rules"))

    url = F.col(url_col)
    pathq = F.concat(
        F.coalesce(F.nullif(F.regexp_extract(
            url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1),
            F.lit("")), F.lit("/")),
        F.regexp_extract(url, r"^[^#?]*(\?[^#]*)", 1))
    joined = pages.withColumn("_host", url_host(url)) \
        .join(host_rules, F.col("_host") == host_rules.host, "left") \
        .drop(host_rules.host)

    best = F.aggregate(
        F.filter(F.coalesce(F.col("_rules"),
                            F.array().cast(
                                "array<struct<plen:int,allow:int,rx:string>>")),
                 lambda rule: F.regexp_like(pathq, rule["rx"])),
        F.struct(F.lit(-1).alias("plen"), F.lit(1).alias("allow")),
        lambda acc, rule: F.when(
            (rule["plen"] > acc["plen"]) |
            ((rule["plen"] == acc["plen"]) & (rule["allow"] > acc["allow"])),
            F.struct(rule["plen"].alias("plen"),
                     rule["allow"].alias("allow"))).otherwise(acc))
    return joined.withColumn("allowed", best["allow"] == 1) \
        .drop("_host", "_rules")
