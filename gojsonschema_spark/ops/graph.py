"""Host-level web-graph operators: edge extraction from page HTML and
PageRank over the resulting graph — the canonical quality prior for
web corpora (crawl prioritization, per-site quality weighting, spam
demotion).

Scale model (10^12 pages -> ~10^8 hosts):

* :func:`host_link_graph` is one map stage (extract -> resolve -> host)
  plus one aggregation shuffle keyed on the (src, dst) pair — the only
  shuffle, and the pair key is far better distributed than raw host
  (no Zipf hot key: a mega-host's edges spread over its distinct
  destinations).
* :func:`pagerank` is the standard power iteration expressed as
  joins + aggregations. Per iteration: one shuffle join (ranks ×
  edges on ``src``) and one aggregation (contributions by ``dst``).
  Edges are repartitioned by ``src`` ONCE and persisted, so every
  iteration's join reuses that layout and only the (much smaller)
  rank table moves. Lineage is truncated per iteration with
  ``localCheckpoint`` (same pattern as
  ``ops/dedup.py::duplicate_clusters`` — an iterative plan that grows
  per generation is a driver OOM at scale), and the convergence
  L1-delta is computed inside the SAME aggregate that materializes the
  new ranks: one job per iteration, no second pass.
* Dangling mass (hosts with no out-links — the majority of a real web
  graph's leaves) is redistributed uniformly each iteration via a
  one-row aggregate, not a per-node join.

Reference parity note: gojsonschema has no graph surface; this exists
for the web-pages corpus contract (BASELINE.json north_star). The
PageRank recurrence is the published Brin/Page formulation
(d=0.85 damping, uniform teleport).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from gojsonschema_spark.ops.html import extract_anchors, extract_links
from gojsonschema_spark.ops.web import resolve_link
from gojsonschema_spark.ops.webpages import url_host

__all__ = ["host_link_graph", "host_degrees", "pagerank",
           "anchor_text_aggregate"]


def host_link_graph(pages: DataFrame, *, url_col: str = "url",
                    html_col: str = "html", is_binary: bool = True,
                    exclude_self: bool = True) -> DataFrame:
    """``(src, dst, n_links)`` host-level edges from page HTML.

    One generate + map stage (href extraction, RFC 3986 resolution
    against the page url, host projection) and one count shuffle on
    the pair key. Self-edges (intra-host navigation — boilerplate, not
    endorsement) are dropped by default.
    """
    links = pages.select(
        url_host(F.col(url_col)).alias("src"),
        F.explode(extract_links(F.col(html_col), is_binary=is_binary))
         .alias("href"),
        F.col(url_col).alias("_base"))
    edges = links.select(
        "src",
        url_host(resolve_link(F.col("_base"), F.col("href"))).alias("dst"))
    edges = edges.filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
    if exclude_self:
        edges = edges.filter(F.col("src") != F.col("dst"))
    return edges.groupBy("src", "dst").agg(
        F.count(F.lit(1)).alias("n_links"))


def host_degrees(edges: DataFrame) -> DataFrame:
    """Per-host degree summary over a ``(src, dst, n_links)`` edge set:
    out_degree / in_degree (distinct counterparties) and out_links /
    in_links (link multiplicity). Two partial aggregations unioned on
    the host key — no join, map-side combined."""
    out = edges.groupBy(F.col("src").alias("host")).agg(
        F.count(F.lit(1)).alias("out_degree"),
        F.sum("n_links").alias("out_links"))
    inn = edges.groupBy(F.col("dst").alias("host")).agg(
        F.count(F.lit(1)).alias("in_degree"),
        F.sum("n_links").alias("in_links"))
    return (out.join(inn, "host", "full_outer")
            .select("host",
                    F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
                    F.coalesce("out_links", F.lit(0)).alias("out_links"),
                    F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
                    F.coalesce("in_links", F.lit(0)).alias("in_links")))


def pagerank(edges: DataFrame, *, damping: float = 0.85,
             max_iter: int = 20, tol: float | None = 1e-6,
             weighted: bool = True) -> DataFrame:
    """PageRank over ``(src, dst[, n_links])`` edges ->
    ``(host, rank)``, ranks summing to 1.

    Power iteration: ``r'(v) = (1-d)/N + d * (sum_{u->v} r(u) *
    w(u,v)/W(u) + D/N)`` where ``W(u)`` is u's total out-weight
    (``weighted=False`` treats every edge as weight 1) and ``D`` is the
    dangling mass (ranks of hosts with no out-edges, redistributed
    uniformly). Stops early when the L1 delta falls under ``tol``
    (``None`` = always run ``max_iter``).

    One job per iteration: the new ranks are marked for a LAZY
    ``localCheckpoint`` and the stats aggregate both materializes them
    (lineage truncated) and computes the L1 delta, the total mass and
    next iteration's dangling mass in a single pass — possible because
    every rank row carries its host's ``has_out`` flag, so dangling
    needs no join.

    Deterministic: float addition order inside a SUM is
    partition-dependent, so ranks are carried as DECIMAL(38, 18) —
    associative addition, same result at any parallelism (the
    convergence-check lesson from duplicate_clusters, where a float
    cast made label propagation racy).
    """
    w = (F.col("n_links") if weighted and "n_links" in edges.columns
         else F.lit(1)).cast("decimal(38,18)")
    e = edges.select(F.col("src"), F.col("dst"), w.alias("w"))
    # normalize out-weights once; repartition by src so every
    # iteration's join reuses this layout
    # NB: Spark name resolution is case-insensitive — "w" vs "W" would
    # be ambiguous, hence "tot_w". The division runs in DOUBLE: decimal
    # division at (38,18)/(38,18) overflows precision and Spark
    # truncates the result scale to SIX digits (1e-7-class error);
    # per-row scalar double math is deterministic regardless of
    # parallelism — only the shuffled SUMs need decimal associativity.
    out_w = e.groupBy("src").agg(F.sum("w").alias("tot_w"))
    e = (e.join(out_w, "src")
          .select("src", "dst",
                  (F.col("w").cast("double") /
                   F.col("tot_w").cast("double"))
                  .cast("decimal(19,18)").alias("frac"))
          .repartition("src").persist())

    nodes = (e.select(F.col("src").alias("host"))
              .union(e.select(F.col("dst")))
              .distinct()
              .join(out_w.select(F.col("src").alias("host"),
                                 F.lit(True).alias("has_out")),
                    "host", "left")
              .select("host", F.coalesce("has_out", F.lit(False))
                      .alias("has_out"))
              .persist())
    counts = nodes.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("has_out").cast("long")).alias("n_linked")).first()
    n, n_linked = counts["n"], int(counts["n_linked"] or 0)
    if n == 0:
        return nodes.select("host", F.lit(0.0).alias("rank"))
    teleport = (1.0 - damping) / n

    # initial ranks ARE eagerly checkpointed: a plain projection over
    # the persisted nodes table measured consistently ~0.6s SLOWER per
    # pagerank call (tried and reverted this round — the checkpointed
    # RDD hands iteration 1 a materialized, partitioning-preserving
    # input where the cache-backed projection re-plans its exchanges)
    ranks = nodes.select(
        "host", "has_out",
        F.lit(1.0 / n).cast("decimal(38,18)").alias("rank"))
    ranks = ranks.localCheckpoint(eager=True)
    total, dangling = 1.0, (n - n_linked) / n

    for _ in range(max_iter):
        base = teleport * total + damping * dangling / n

        # rank(19,18) * frac(19,18) -> decimal(38,35): inside precision
        # bounds, so no silent scale truncation; the SUM stays decimal
        # (associative -> parallelism-invariant)
        contrib = (e.join(ranks, e.src == ranks.host)
                    .groupBy("dst")
                    .agg(F.sum(F.col("rank").cast("decimal(19,18)") *
                               F.col("frac"))
                          .alias("inflow")))
        new_ranks = (nodes.join(contrib, nodes.host == contrib.dst, "left")
                     .select(
                         "host", "has_out",
                         (F.lit(base) + F.lit(damping) *
                          F.coalesce(F.col("inflow").cast("double"),
                                     F.lit(0.0)))
                         .cast("decimal(38,18)").alias("rank")))
        joined = (new_ranks.alias("nw")
                  .join(ranks.select("host", F.col("rank").alias("_old")),
                        "host")
                  .select("host", "has_out", "rank",
                          F.abs(F.col("rank") - F.col("_old"))
                           .alias("_d")))
        # LAZY checkpoint + aggregate: the ONE stats job below both
        # materializes the checkpoint (lineage truncated) and yields the
        # scalars — the duplicate_clusters pattern; an eager checkpoint
        # followed by a separate stats scan costs a second full pass
        # over the rank table every iteration
        joined = joined.localCheckpoint(eager=False)
        stats = joined.agg(
            F.sum("_d").alias("delta"),
            F.sum("rank").alias("total"),
            F.sum(F.when(F.col("has_out"), F.col("rank"))
                  .otherwise(F.lit(0).cast("decimal(38,18)")))
             .alias("linked")).first()
        delta = float(stats["delta"] or 0)
        total = float(stats["total"] or 0)
        dangling = total - float(stats["linked"] or 0)
        ranks = joined.drop("_d")
        if tol is not None and delta < tol:
            break

    e.unpersist()
    nodes.unpersist()
    return ranks.select("host", F.col("rank").cast("double").alias("rank"))


def anchor_text_aggregate(pages: DataFrame, *, url_col: str = "url",
                          html_col: str = "html",
                          is_binary: bool = True, top_n: int = 5,
                          n_salts: int = 256) -> DataFrame:
    """Per-target anchor-text profile: the ``top_n`` most frequent
    anchor texts pointing at each resolved target URL, with counts.

    Anchor text describes the TARGET page (it is how the rest of the
    web labels it) — search relevance and query-document training sets
    are built from exactly this table. Pipeline: native anchor
    extraction (:func:`~gojsonschema_spark.ops.html.extract_anchors`)
    -> RFC 3986 resolution against the page URL (non-fetchable schemes
    and empty anchors drop) -> (target, anchor) counting (map-side
    combine; the shuffle carries distinct pairs) -> salted bounded
    top-k per target (:func:`~gojsonschema_spark.ops.dataset_checks.
    topk_per_group` — never a per-target window, so a target every
    page links to, e.g. a CDN root, cannot serialize a reducer).

    Returns ``(target, anchor, n)``, deterministic (count desc, anchor
    asc per target).
    """
    from gojsonschema_spark.ops.dataset_checks import topk_per_group

    anchors = pages.select(
        F.col(url_col).alias("base"),
        F.explode(extract_anchors(F.col(html_col),
                                  is_binary=is_binary)).alias("a"))
    resolved = (anchors
                .select(resolve_link(F.col("base"),
                                     F.col("a.href")).alias("target"),
                        F.col("a.text").alias("anchor"))
                .filter(F.col("target").isNotNull()
                        & (F.col("anchor") != "")))
    counts = (resolved.groupBy("target", "anchor")
              .agg(F.count(F.lit(1)).alias("n")))
    return topk_per_group(counts, ["target"], "n", k=top_n,
                          ascending=False, tiebreak_col="anchor",
                          n_salts=n_salts)
