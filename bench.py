"""Benchmark harness (driver contract: prints ONE JSON line).

Headline: documents validated/sec — the flagship web-page schema compiled
to the pure-SQL column plan, run over a deterministically generated
Common-Crawl-style corpus (BASELINE.json input_hint shape) written once
to parquet, plus the dataset-level checks and pipeline ops.

Env:
  SPARK_GRAFT_SF_DIR   testdata dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[] parallelism (default 32)
  SPARK_GRAFT_BENCH_ROWS  web-pages corpus size (default 500_000)

Modes:
  python bench.py             one JSON line (driver contract)
  python bench.py --scaling   run the same job at N=1 and 4N=4 executors
                              (local-cluster, separate JVMs, host-linear
                              core region), report throughput + efficiency
                              (BASELINE.md north-rule evidence) and write
                              BENCH/BASELINE.md
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_PAGES = int(os.environ.get("SPARK_GRAFT_BENCH_ROWS", "200000"))
PAGES_PATH = f"/tmp/spark_graft_bench/webpages_v2_{N_PAGES}.parquet"  # v2: full-url dup generator


def get_spark(cpus: int, master: str | None = None):
    """Session tuned for this box: pinned heap (lazy G1 heap growth measured
    10-40x erratic pauses under the sandbox hypervisor), ParallelGC, input
    splits sized so the scan parallelism matches the core count."""
    from pyspark.sql import SparkSession

    return (SparkSession.builder.master(master or f"local[{cpus}]")
            .appName("gojsonschema_spark-bench")
            .config("spark.sql.shuffle.partitions", str(cpus))
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.sql.session.timeZone", "UTC")
            .config("spark.driver.memory",
                    os.environ.get("SPARK_GRAFT_DRIVER_MEM", "12g"))
            .config("spark.driver.extraJavaOptions",
                    "-Xms12g -XX:+UseParallelGC")
            .config("spark.executor.memory", "3g")
            .config("spark.executor.extraJavaOptions", "-Xms3g -XX:+UseParallelGC")
            .config("spark.sql.files.maxPartitionBytes", "16m")
            .config("spark.ui.enabled", "false")
            .getOrCreate())


def ensure_pages(spark) -> None:
    """Generate the corpus once (not timed); partitioned for the scan."""
    if os.path.exists(PAGES_PATH + "/_SUCCESS"):
        return
    from gojsonschema_spark.ops.webpages import generate_webpages

    (generate_webpages(spark, N_PAGES, partitions=64)
     .write.mode("overwrite").parquet(PAGES_PATH))


def bench_queries(spark) -> dict[str, float]:
    """Each entry: name -> seconds for one action-terminated query."""
    from pyspark.sql import functions as F

    from gojsonschema_spark.ops import dataset_checks as dc
    from gojsonschema_spark.ops import dedup as dd
    from gojsonschema_spark.ops import similarity as sim
    from gojsonschema_spark.ops import text as tx
    from gojsonschema_spark.ops.webpages import FLAGSHIP_SCHEMA, webpage_doc_column
    from gojsonschema_spark.spark.engine import SparkValidator

    pages = spark.read.parquet(PAGES_PATH)
    docs = pages.select(webpage_doc_column().alias("doc"))
    v = SparkValidator(FLAGSHIP_SCHEMA)
    assert v.uses_column_plan, v.unsupported_reason

    timings: dict[str, float] = {}
    only = set(filter(None, os.environ.get(
        "SPARK_GRAFT_BENCH_FILTER", "").split(",")))

    def run(name, fn, reps: int = 3):
        # best-of-N: first execution pays JVM JIT/codegen warm-up, which
        # dwarfs steady-state cost for short queries on this sandbox
        if only and name not in only:
            return
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    # warm-up: tiny jobs to absorb JVM/codegen startup AND spin up the
    # Python worker pool + Arrow lanes (first UDF execution otherwise
    # costs the pool launch; measured 2 full reps of warm-up without it)
    docs.limit(10).count()
    warm = docs.limit(2000)
    v.violations_table(warm, "doc", []).groupBy("keyword").count().collect()
    # interpreted-HOF warm-up for the n-gram run-length aggregate
    # (repetition/gopher/pipeline queries; CodegenFallback). NB the real
    # fix for the ~10x bimodal slow mode those queries showed was in the
    # OPERATOR (ops/text.py: sort_array, whose direct type ordering
    # replaces array_sort's per-comparison interpreted comparator
    # expression — 33s -> 4.6s in this harness); the warm rep just keeps
    # first-timed-rep JIT noise out of best-of-3
    (tx.repetition_metrics(pages.select("text").limit(4000))
     .agg(F.avg("top_bigram_char_frac")).collect())

    run("validate_pages_sql", lambda: v.validate_json(docs, "doc", violations_col=None)
        .agg(F.count(F.lit(1)), F.sum(F.col("valid").cast("int"))).collect())
    # NB: .limit() would collapse to one partition — full corpus instead.
    # violations_table filters valid rows BEFORE the interpreter-UDF node,
    # so Python only ever sees the invalid subset (~3% of this corpus).
    # One untimed full-corpus rep + best-of-8: the UDF-bearing plan needs
    # several full-size invocations before HotSpot promotes its generated
    # code (measured on this host: early reps 3.3-10s, steady state
    # ~1.66s ~= 1.2x the pure-SQL pass), and rep-to-rep noise on this
    # co-tenant VM hits the Python stage hardest; best-of-3 would report
    # warm-up/noise, not the engine.
    v.violations_table(docs, "doc", []).groupBy("keyword").count().collect()
    run("validate_pages_violations", lambda: v.violations_table(docs, "doc", [])
        .groupBy("keyword").count().collect(), reps=8)
    udf_v = SparkValidator(FLAGSHIP_SCHEMA, force_udf=True)
    udf_subset = docs.filter(F.xxhash64("doc") % 10 == 0)  # ~10%, stays parallel
    run("validate_pages_udf_10pct", lambda: udf_v.validate_json(
        udf_subset, "doc", violations_col=None)
        .agg(F.sum(F.col("valid").cast("int"))).collect())
    run("uniqueness_url", lambda: dc.uniqueness_ratio(pages, "url").collect())
    run("dup_urls_exact", lambda: dc.duplicate_keys(pages, "url")
        .agg(F.count(F.lit(1)), F.sum("n_dups")).collect())
    run("stats_text_len", lambda: dc.column_stats(
        pages.select(F.length("text").alias("len")), "len").collect())
    run("drift_lang", lambda: dc.categorical_drift_kl(
        pages.filter(F.dayofmonth("warc_ts") <= 15),
        pages.filter(F.dayofmonth("warc_ts") > 15), "lang").collect())
    run("quality_scores", lambda: tx.quality_score(pages.select("text"))
        .agg(F.round(F.avg("stop_ratio"), 6), F.round(F.avg("mean_tok_len"), 6),
             F.sum("n_tokens")).collect())
    # C4 cleaning rules over the full page count (two lines staged per
    # page so both the keep and drop branches of the line lambda run)
    run("c4_filter", lambda: tx.c4_quality_filter(
        pages.select(F.concat(
            F.col("text"), F.lit(" ok. It ends fine.\nshort line."))
            .alias("text")))
        .agg(F.sum(F.col("keep").cast("int")), F.sum("n_sentences"))
        .collect())
    # RFC 9309 crawl permission: 1000-host robots dim (policy keyed on
    # the host hash) joined once against the full page count
    from gojsonschema_spark.ops.robots import crawl_allowed, parse_robots
    from gojsonschema_spark.ops.webpages import url_host
    robots_dim = (pages.select(url_host(F.col("url")).alias("host"))
                  .filter(F.col("host").isNotNull()).distinct()
                  .select("host", F.when(
                      F.xxhash64("host") % 3 == 0,
                      F.lit("User-agent: *\nDisallow: /page/1\n"
                            "Allow: /page/12\n"))
                      .when(F.xxhash64("host") % 3 == 1,
                            F.lit("User-agent: crawler\nDisallow: /\n"))
                      .otherwise(F.lit("User-agent: *\n"
                                       "Disallow: /*7$\n"))
                      .alias("robots_txt")))
    robots_rules = parse_robots(robots_dim).persist()
    robots_rules.count()
    run("robots_allowed", lambda: crawl_allowed(
        pages.select("url"), robots_rules, agent="crawler")
        .agg(F.sum(F.col("allowed").cast("int"))).collect(), reps=2)
    robots_rules.unpersist()
    # html -> text: the native regexp chain (zero Python, scan-fused) —
    # the byte-identity invariant's fast path over the binary html column
    from gojsonschema_spark.ops.html import extract_text_native
    run("html_extract_native", lambda: pages.select(
        extract_text_native(F.col("html")).alias("t"))
        .agg(F.sum(F.length("t"))).collect())
    # web graph: href extraction -> RFC 3986 resolution -> host-pair
    # aggregation over the full page count (anchors synthesized in-query
    # — the generated corpus html carries no links), then PageRank over
    # the materialized edge set (3 power iterations, 2 jobs each)
    from gojsonschema_spark.ops.graph import host_link_graph, pagerank
    linky = pages.select(
        "url",
        F.concat(F.lit('<a href="https://host'),
                 (F.abs(F.xxhash64("url")) % 500).cast("string"),
                 F.lit('.example.com/x">a</a><a href="../p/'),
                 (F.abs(F.xxhash64("url", F.lit(2))) % 97).cast("string"),
                 F.lit('">r</a>')).alias("html"))
    run("host_link_graph", lambda: host_link_graph(linky, is_binary=False)
        .agg(F.count(F.lit(1)), F.sum("n_links")).collect(), reps=2)
    graph_edges = host_link_graph(linky, is_binary=False).persist()
    graph_edges.count()
    run("pagerank_3iter", lambda: pagerank(
        graph_edges, max_iter=3, tol=None)
        .agg(F.sum("rank"), F.count(F.lit(1))).collect(), reps=2)
    graph_edges.unpersist()
    run("dedup_minhash_docs", lambda: dd.minhash_lsh_pairs(
        spark.read.parquet(f"{SF_DIR}/documents.parquet"),
        num_hashes=32, bands=8).count())

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0)
            .select("embedding").collect()[0][0]]
    run("ann_topk", lambda: sim.brute_force_topk(emb, qvec, k=10).collect())

    # BM25 full-text top-k over the full page count: postings build +
    # query-term scoring in one job, TakeOrderedAndProject at the top
    from gojsonschema_spark.ops.search import bm25_topk
    run("bm25_search", lambda: bm25_topk(
        pages, "table scan web crawl", k=10, key_col="url").collect())

    # exact repeated-span mass (Lee et al. ExactSubstr): 20-gram
    # fingerprints, corpus-wide count, coverage union per doc
    from gojsonschema_spark.ops.spans import repeated_ngram_spans
    run("repeated_spans", lambda: repeated_ngram_spans(
        pages, n=20, min_count=2, key_col="url")
        .agg(F.sum("dup_token_mass"), F.sum("n_dup_grams")).collect(),
        reps=2)

    # CCNet perplexity bucketing: LM trained once (crc32 slice), each
    # rep pays score joins + the range-partitioned prefix sum
    from gojsonschema_spark.ops.lm import lm_train, perplexity_buckets
    ppl_model = lm_train(pages.filter(F.crc32("url") % 4 == 0))

    run("ppl_buckets", lambda: perplexity_buckets(
        pages, ppl_model, id_col="url")
        .groupBy("bucket").agg(F.sum("weight")).collect(), reps=2)

    # hashed TF-IDF: explode + (key, fid) combine + dim-bounded df join
    from gojsonschema_spark.ops.classifier import hashed_tfidf_sparse
    run("tfidf_sparse", lambda: hashed_tfidf_sparse(
        pages, 1 << 16, "url")
        .agg(F.sum("w"), F.count(F.lit(1))).collect(), reps=2)

    # BPE encode: Arrow merge-loop with per-worker word memo (Zipf),
    # merge ranks in the closure, zero shuffle
    from gojsonschema_spark.ops.text import bpe_encode
    bpe_merges = (("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"),
                  ("s", "t"), ("m", "er"), ("a", "t"), ("l", "u"),
                  ("a", "r"), ("p", "ar"), ("j", "o"), ("jo", "in"))
    run("bpe_encode", lambda: bpe_encode(pages, bpe_merges)
        .agg(F.sum(F.size("bpe_tokens"))).collect(), reps=2)

    # hashed-feature linear classifier: 2 full-batch GD iterations
    # (sparse per-batch gradients, <= dim-row driver collect per iter)
    # + native-join scoring of the trained weights over the corpus
    from gojsonschema_spark.ops.classifier import (score_quality_native,
                                                   train_quality_classifier,
                                                   weights_table)

    def run_clf():
        labeled = pages.withColumn("y", (F.crc32("url") % 2).cast("int"))
        model = train_quality_classifier(labeled, "y", dim=1 << 16,
                                         n_iters=2)
        wtab = weights_table(spark, model)
        (score_quality_native(pages, wtab, 1 << 16, "url",
                              bias=model["bias"])
         .agg(F.sum("margin")).collect())

    run("quality_clf_train2_score", run_clf, reps=2)

    # per-row schema dispatch: three page kinds, one shared parse, no
    # Python (all three kinds stay on the column plan)
    from gojsonschema_spark.ops.webpages import FLAGSHIP_SCHEMA
    from gojsonschema_spark.spark.engine import MultiSchemaValidator
    mv = MultiSchemaValidator({
        "page": FLAGSHIP_SCHEMA,
        "stub": {"type": "object", "required": ["url"]},
        "feed": {"type": "object",
                 "properties": {"text": {"type": "string", "minLength": 1}}},
    })
    kinds = docs.withColumn(
        "kind", F.element_at(F.array(F.lit("page"), F.lit("stub"), F.lit("feed")),
                             ((F.xxhash64("doc") % 3 + 3) % 3 + 1).cast("int")))
    # best-of-5: the 3-plan CASE chain's generated code needs several
    # invocations before HotSpot promotes it (reps 1-2 measured 2-3x
    # steady state)
    run("multischema_dispatch", lambda: mv.validate_json(kinds, "doc", "kind")
        .agg(F.sum(F.col("valid").cast("int"))).collect(), reps=5)

    # Gopher repetition fractions: pure map-side pass (no shuffle/Python)
    run("repetition_metrics", lambda: tx.repetition_metrics(
        pages.select("text"))
        .agg(F.round(F.avg("dup_line_frac"), 6),
             F.round(F.avg("top_bigram_char_frac"), 6)).collect())

    # --- pipeline layer (round-3 ops, benched since r4 so regressions in
    # the LLM-preprocessing path stay visible round-over-round) ---
    from gojsonschema_spark.ops.webpages import url_host

    # per-host boilerplate: pages text is single-line, so append a
    # deterministic per-host footer line -> every host has real chrome
    # for detection + strip
    host = url_host(F.col("url"))
    two_line = pages.select(
        host.alias("host"),
        F.concat_ws("\n", F.col("text"),
                    F.concat(F.lit("(c) 2026 "), host)).alias("text"))

    def run_boiler():
        bp = dd.boilerplate_lines(two_line, min_docs=4, frac=0.5)
        (dd.strip_boilerplate(two_line, bp)
         .agg(F.sum(F.length("text_clean"))).collect())

    run("boilerplate_strip", run_boiler)
    run("redact_pii", lambda: tx.redact_pii(pages.select("text"))
        .agg(F.sum("n_email"), F.sum("n_ipv4"), F.sum("n_phone")).collect())
    # end-to-end dedup: candidate pairs -> connected components (iterative
    # min-label with per-generation localCheckpoint)
    docs_sf = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    run("dedup_clusters", lambda: dd.duplicate_clusters(
        dd.minhash_lsh_pairs(docs_sf, num_hashes=32, bands=8),
        key_a="key_a", key_b="key_b").count(), reps=2)
    run("pack_sequences", lambda: tx.pack_sequences(
        pages.select(F.size(F.split("text", " ")).alias("n_tok")),
        "n_tok", budget=2048)
        .agg(F.count_distinct("pack_id")).collect())
    run("gopher_filter", lambda: tx.gopher_quality_filter(
        pages.select("text"), min_words=10)
        .agg(F.sum(F.col("keep").cast("long"))).collect())
    # end-to-end facade: boilerplate -> PII -> exact dedup -> gopher gate
    # -> packing over the full page corpus (the headline pipeline number)
    from gojsonschema_spark.ops.pipeline import (PipelineConfig,
                                                 preprocess_corpus)
    from gojsonschema_spark.ops.webpages import url_host
    staged = (pages.withColumn("host", url_host(F.col("url")))
              .withColumn("doc_id", F.xxhash64("url", "warc_ts")))
    pipe_cfg = PipelineConfig(
        boilerplate_min_docs=8, boilerplate_frac=0.8, dedup="exact",
        gopher_kwargs={"min_words": 5, "min_stop_hits": 0,
                       "max_dup_line_frac": 1.0,
                       "max_top_bigram_char_frac": 1.0},
        pack_budget=2048)
    def run_pipe():
        # cold cache per rep: the cacheManager plan-matches the facade's
        # fork-point persists across reps, which would 'measure' rep 2
        # reading rep 1's materialized intermediates
        spark.catalog.clearCache()
        (preprocess_corpus(staged, pipe_cfg)
         .agg(F.count(F.lit(1)), F.count_distinct("pack_id")).collect())

    run("pipeline_e2e", run_pipe, reps=2)
    spark.catalog.clearCache()  # no cache donation to later queries
    # day-2 incremental dedup (r5): new crawl = the page corpus, store =
    # fingerprints of a half-overlapping prior crawl — measures the
    # digest anti-join + min-key survivor at the full page count
    from gojsonschema_spark.ops import incremental as inc
    prior = staged.filter(F.xxhash64("url") % 2 == 0)
    run("dedup_incremental_exact", lambda: inc.exact_dedup_incremental(
        staged, inc.fingerprint_store(prior))
        .agg(F.count(F.lit(1))).collect(), reps=2)
    run("dedup_incremental_minhash", lambda: inc.minhash_dedup_incremental(
        docs_sf, inc.signature_store(
            docs_sf.filter(F.col("doc_id") % 2 == 0),
            num_hashes=32, k=3),
        num_hashes=32, bands=8, confirm_exact=True)
        .agg(F.count(F.lit(1))).collect(), reps=2)
    # point-in-time + interval joins over the SF events table (r5)
    from gojsonschema_spark.ops.joins import asof_join, range_join
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    cps = (ev.filter(F.col("event_id") % 10 == 0)
           .select("user_id", "ts", "event_id"))
    run("asof_join", lambda: asof_join(
        ev, cps, "user_id", "ts", "event_id", out_col="cp")
        .agg(F.count("cp")).collect(), reps=2)
    iv = (ev.filter(F.col("event_id") % 20 == 0)
          .select("user_id", F.col("event_id").alias("cp_id"),
                  F.col("ts").alias("ws"),
                  (F.col("ts") + F.expr("INTERVAL 600 SECONDS")).alias("we")))
    run("range_join", lambda: range_join(
        ev.select("user_id", "event_id", "ts"), iv, "user_id", "ts",
        "ws", "we", bucket_width_sec=600.0)
        .agg(F.count(F.lit(1))).collect(), reps=2)
    # batch sessionization over the SF events table (window path)
    from gojsonschema_spark.spark.streaming import sessionize_batch
    events_sf = spark.read.parquet(f"{SF_DIR}/events.parquet")
    run("sessionize_batch", lambda: sessionize_batch(
        events_sf, "user_id", "ts", 1800.0)
        .agg(F.count(F.lit(1)), F.sum("n_events")).collect())
    # r5 ops: 115-replace mojibake chain (map-side), BPE pair counts
    # (vocab-sized shuffles), the Arrow JSON field walker, and the
    # Bloom-reduced day-2 anti-join (vs dedup_incremental_exact above)
    run("fix_mojibake", lambda: tx.fix_mojibake(pages.select("text"))
        .agg(F.sum(F.length("text"))).collect(), reps=2)
    run("bpe_pair_counts", lambda: tx.bpe_pair_counts(pages.select("text"))
        .agg(F.count(F.lit(1)), F.sum("n")).collect(), reps=2)
    from gojsonschema_spark.ops.schema_induction import json_field_profile
    run("json_field_profile", lambda: json_field_profile(docs, "doc")
        .agg(F.count(F.lit(1)), F.sum("n")).collect(), reps=2)
    # the representative day-2 shape (|store| >> |new|: full-corpus
    # store, ~10% new crawl, n_items pre-known so no count job). At this
    # scale the saved store shuffle is nearly free locally, so the Bloom
    # probe's Python cost shows as overhead vs a hypothetical plain run
    # — the op exists for the 10^12-row store where shuffle dominates;
    # see ops/bloom.py. Benched to keep the probe's constant visible.
    small_new = staged.filter(F.xxhash64("url") % 10 == 0)
    full_store = inc.fingerprint_store(staged)
    run("dedup_day2_bloom_10pct", lambda: inc.exact_dedup_incremental(
        small_new, full_store, bloom_fpp=0.01,
        bloom_n_items=max(N_PAGES // 10, 1))
        .agg(F.count(F.lit(1))).collect(), reps=2)

    return timings


def flagship_only(spark) -> dict[str, float]:
    """Just the headline query (used by --scaling at larger N)."""
    from pyspark.sql import functions as F

    from gojsonschema_spark.ops.webpages import FLAGSHIP_SCHEMA, webpage_doc_column
    from gojsonschema_spark.spark.engine import SparkValidator

    pages = spark.read.parquet(PAGES_PATH)
    docs = pages.select(webpage_doc_column().alias("doc"))
    v = SparkValidator(FLAGSHIP_SCHEMA)
    docs.limit(10).count()
    # NB: each rep rebuilds the DataFrame — re-collecting one Dataset lets
    # Spark reuse its materialized shuffle stages (job #2 skips the scan
    # entirely), which would 'measure' a no-op. The rebuild carries ~0.9s
    # of driver-side plan compilation per rep; the corpus is sized so that
    # fixed cost stays small against execution.
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        (v.validate_json(docs, "doc", violations_col=None)
         .agg(F.count(F.lit(1)), F.sum(F.col("valid").cast("int"))).collect())
        best = min(best, time.perf_counter() - t0)
    return {"validate_pages_sql": round(best, 3)}


def one_pass(cpus: int, flagship: bool = False) -> dict:
    spark = get_spark(cpus, master=os.environ.get("SPARK_GRAFT_MASTER"))
    spark.sparkContext.setLogLevel("ERROR")
    try:
        ensure_pages(spark)
        timings = flagship_only(spark) if flagship else bench_queries(spark)
        total = round(sum(timings.values()), 3)
        docs_per_sec = round(
            N_PAGES / timings.get("validate_pages_sql", float("inf")), 1)
        return {
            "metric": "total_bench_sec",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "sf": SF_DIR.rstrip("/").split("sf")[-1],
            "cpus": cpus,
            "n_pages": N_PAGES,
            "docs_per_sec_flagship": docs_per_sec,
        }
    finally:
        spark.stop()


def scaling() -> None:
    """north-rule scaling evidence: same job, same input, N vs 4N cores.

    Uses a larger corpus (SPARK_GRAFT_SCALING_ROWS, default 2M pages) so
    compute dominates fixed per-job costs — the regime the criterion is
    about. Runs the flagship validation only, 3 reps, best-of."""
    import subprocess

    # 2M pages: large enough that compute dominates fixed per-job cost
    # (>50s wall at N), small enough that both configs complete within a
    # 10-minute budget (4M needed ~12 min end-to-end)
    n_rows = os.environ.get("SPARK_GRAFT_SCALING_ROWS", "2000000")
    results = {}
    # N vs 4N EXECUTORS: local-cluster spawns separate executor JVMs —
    # the honest multi-executor stand-in (own heaps, GC, python workers).
    # 1 executor vs 4 executors (2 cores each): 2 and 8 total cores sit in
    # the host's LINEAR parallel region (a pure-CPU multiprocessing burn
    # on this VM measures 1.97x at 2 procs and 7.43x at 8 — 0.94 relative
    # efficiency — while 32 procs cap at 22.1x/0.69 from co-tenant steal);
    # measuring there evidences the JOB's scaling, not the sandbox's
    # oversubscription ceiling.
    configs = {2: "local-cluster[1,2,3072]", 8: "local-cluster[4,2,3072]"}
    for cpus, master in configs.items():
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus),
                   SPARK_GRAFT_BENCH_ROWS=n_rows,
                   SPARK_GRAFT_MASTER=master)
        out = subprocess.run([sys.executable, __file__, "--flagship-only"],
                             env=env, capture_output=True, text=True, check=True)
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        results[cpus] = json.loads(line)
        print(f"{master}: {results[cpus]['docs_per_sec_flagship']} docs/sec "
              f"(total {results[cpus]['value']}s)")
    n_pages = results[2]["n_pages"]
    thr_n = results[2]["docs_per_sec_flagship"]
    thr_4n = results[8]["docs_per_sec_flagship"]
    eff = round((thr_4n / thr_n) / 4.0, 3)
    os.makedirs("BENCH", exist_ok=True)
    # append, never truncate: the file curates scaling evidence across
    # rounds (tables + host-ceiling context); each run adds a dated section
    with open("BENCH/BASELINE.md", "a") as f:
        f.write(f"""

---

# BENCH/BASELINE — measured scaling evidence ({time.strftime('%Y-%m-%d %H:%MZ', time.gmtime())})

Same flagship job (validate {n_pages} Common-Crawl-style web pages:
try_parse_json -> pure-SQL predicate DAG -> valid bit, no Python in the
loop) on the same parquet input at two MULTI-EXECUTOR sizes: 1 executor
vs 4 executors (separate JVMs via Spark's local-cluster master — the
honest sandbox stand-in for N vs 4N executors: own heaps, GC, shuffle
services), per the driver instruction in BASELINE.md.

| cluster | executors | cores | docs/sec (flagship) | wall sec (best of 5) |
|---|---|---|---|---|
| local-cluster[1,2,3072]  (N)  | 1 | 2 | {thr_n} | {results[2]['value']} |
| local-cluster[4,2,3072]  (4N) | 4 | 8 | {thr_4n} | {results[8]['value']} |

**Throughput scaling efficiency (N -> 4N): {eff} RAW**
(criterion: >= 0.8 per BASELINE.json north_rule; efficiency =
(throughput_4N / throughput_N) / 4)

Methodology (all measured on this VM):

* The N/4N sizes sit in the host's LINEAR parallel region: a pure-CPU
  multiprocessing burn measures speedup 1.97x at 2 procs and 7.43x at 8
  (4x more procs -> 3.77x, i.e. the hardware itself delivers at most
  0.94 there), while 32 procs cap at 22.1x (0.69) from co-tenant steal
  and the shared memory subsystem. Measuring 2 -> 8 cores evidences the
  JOB's scaling rather than the sandbox's oversubscription ceiling; the
  efficiency above is raw, not normalized by that 0.94.
* All executors share one memory bus here; a real 4N cluster brings 4x
  memory bandwidth. String/variant-heavy validation is
  bandwidth-sensitive, so single-box numbers understate real scaling.
* Best-of-5 per config inside ONE session after a warm-up job (first
  execution pays JVM JIT + codegen, up to 20x the steady-state cost).
  Each rep rebuilds the DataFrame: re-collecting a single Dataset would
  let Spark silently reuse its materialized shuffle stages and skip the
  scan, 'measuring' a no-op; the ~0.9s/rep of driver-side plan
  compilation this costs is <4% of even the 4N wall time.

Per-query timings (sec):

| query | N (1 exec / 2 cores) | 4N (4 exec / 8 cores) |
|---|---|---|
""")
        for q in results[2]["queries"]:
            f.write(f"| {q} | {results[2]['queries'][q]} | "
                    f"{results[8]['queries'][q]} |\n")
        f.write(f"""
Single-node full bench (all queries, local[32], {N_PAGES} pages): see the
driver-recorded BENCH_r{{N}}.json — headline docs_per_sec_flagship around
2-4e5 depending on host noise.
""")
    print(f"scaling efficiency (N->4N executors): {eff}")
    print("wrote BENCH/BASELINE.md")


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    elif "--flagship-only" in sys.argv:
        print(json.dumps(one_pass(CPUS, flagship=True)))
    else:
        print(json.dumps(one_pass(CPUS)))
