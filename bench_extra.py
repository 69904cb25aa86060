"""Round-6 optimization harness (NOT the driver bench — bench.py is
frozen; this file exists for guide §1.4 noop-sink isolation, variant
A/B timing and .explain("formatted") capture).

Usage:
  python bench_extra.py explain <query>[,<query>...]   write plans/r06/<q>_<tag>.txt
  python bench_extra.py time <query>[,...] [reps]      noop-sink best-of-N per query
  python bench_extra.py all                            explain+time every known query

Env: same contract as bench.py (SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS,
SPARK_GRAFT_BENCH_ROWS) plus SPARK_GRAFT_PLAN_TAG (suffix for plan
files, default "before").
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bench  # reuse get_spark / ensure_pages / PAGES_PATH

SF_DIR = bench.SF_DIR
TAG = os.environ.get("SPARK_GRAFT_PLAN_TAG", "before")
PLAN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "plans", "r06")


def _frames(spark):
    """name -> lazily-built DataFrame, mirroring bench.py's queries
    (same operators, same inputs) but returned unexecuted so we can
    explain() or noop-write them."""
    from pyspark.sql import functions as F

    from gojsonschema_spark.ops import dataset_checks as dc
    from gojsonschema_spark.ops import dedup as dd
    from gojsonschema_spark.ops import text as tx
    from gojsonschema_spark.ops.webpages import (FLAGSHIP_SCHEMA, url_host,
                                                 webpage_doc_column)
    from gojsonschema_spark.spark.engine import SparkValidator

    pages = spark.read.parquet(bench.PAGES_PATH)
    docs = pages.select(webpage_doc_column().alias("doc"))
    v = SparkValidator(FLAGSHIP_SCHEMA)
    docs_sf = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    out = {}
    out["validate_pages_sql"] = lambda: v.validate_json(
        docs, "doc", violations_col=None)

    def spans():
        from gojsonschema_spark.ops.spans import repeated_ngram_spans
        return repeated_ngram_spans(pages, n=20, min_count=2, key_col="url")
    out["repeated_spans"] = spans

    def ppl():
        from gojsonschema_spark.ops.lm import lm_train, perplexity_buckets
        model = lm_train(pages.filter(F.crc32("url") % 4 == 0))
        return perplexity_buckets(pages, model, id_col="url")
    out["ppl_buckets"] = ppl

    def bm25():
        from gojsonschema_spark.ops.search import bm25_topk
        return bm25_topk(pages, "table scan web crawl", k=10, key_col="url")
    out["bm25_search"] = bm25

    def tfidf():
        from gojsonschema_spark.ops.classifier import hashed_tfidf_sparse
        return hashed_tfidf_sparse(pages, 1 << 16, "url")
    out["tfidf_sparse"] = tfidf

    def clf():
        from gojsonschema_spark.ops.classifier import (
            score_quality_native, train_quality_classifier, weights_table)
        labeled = pages.withColumn("y", (F.crc32("url") % 2).cast("int"))
        model = train_quality_classifier(labeled, "y", dim=1 << 16, n_iters=2)
        wtab = weights_table(spark, model)
        return score_quality_native(pages, wtab, 1 << 16, "url",
                                    bias=model["bias"])
    out["quality_clf_train2_score"] = clf

    def graph_edges():
        from gojsonschema_spark.ops.graph import host_link_graph
        linky = pages.select(
            "url",
            F.concat(F.lit('<a href="https://host'),
                     (F.abs(F.xxhash64("url")) % 500).cast("string"),
                     F.lit('.example.com/x">a</a><a href="../p/'),
                     (F.abs(F.xxhash64("url", F.lit(2))) % 97).cast("string"),
                     F.lit('">r</a>')).alias("html"))
        return host_link_graph(linky, is_binary=False)
    out["host_link_graph"] = graph_edges

    def pr():
        from gojsonschema_spark.ops.graph import pagerank
        edges = graph_edges().persist()
        edges.count()
        return pagerank(edges, max_iter=3, tol=None)
    out["pagerank_3iter"] = pr

    out["gopher_filter"] = lambda: tx.gopher_quality_filter(
        pages.select("text"), min_words=10)
    out["repetition_metrics"] = lambda: tx.repetition_metrics(
        pages.select("text"))

    def pipe():
        from gojsonschema_spark.ops.pipeline import (PipelineConfig,
                                                     preprocess_corpus)
        staged = (pages.withColumn("host", url_host(F.col("url")))
                  .withColumn("doc_id", F.xxhash64("url", "warc_ts")))
        cfg = PipelineConfig(
            boilerplate_min_docs=8, boilerplate_frac=0.8, dedup="exact",
            gopher_kwargs={"min_words": 5, "min_stop_hits": 0,
                           "max_dup_line_frac": 1.0,
                           "max_top_bigram_char_frac": 1.0},
            pack_budget=2048)
        spark.catalog.clearCache()
        return preprocess_corpus(staged, cfg)
    out["pipeline_e2e"] = pipe

    def inc_minhash():
        from gojsonschema_spark.ops import incremental as inc
        return inc.minhash_dedup_incremental(
            docs_sf, inc.signature_store(
                docs_sf.filter(F.col("doc_id") % 2 == 0),
                num_hashes=32, k=3),
            num_hashes=32, bands=8, confirm_exact=True)
    out["dedup_incremental_minhash"] = inc_minhash

    def inc_exact():
        from gojsonschema_spark.ops import incremental as inc
        staged = (pages.withColumn("host", url_host(F.col("url")))
                  .withColumn("doc_id", F.xxhash64("url", "warc_ts")))
        prior = staged.filter(F.xxhash64("url") % 2 == 0)
        return inc.exact_dedup_incremental(staged, inc.fingerprint_store(prior))
    out["dedup_incremental_exact"] = inc_exact

    out["dedup_minhash_docs"] = lambda: dd.minhash_lsh_pairs(
        docs_sf, num_hashes=32, bands=8)
    out["dedup_clusters"] = lambda: dd.duplicate_clusters(
        dd.minhash_lsh_pairs(docs_sf, num_hashes=32, bands=8),
        key_a="key_a", key_b="key_b")

    def boiler():
        host = url_host(F.col("url"))
        two_line = pages.select(
            host.alias("host"),
            F.concat_ws("\n", F.col("text"),
                        F.concat(F.lit("(c) 2026 "), host)).alias("text"))
        bp = dd.boilerplate_lines(two_line, min_docs=4, frac=0.5)
        return dd.strip_boilerplate(two_line, bp)
    out["boilerplate_strip"] = boiler

    out["fix_mojibake"] = lambda: tx.fix_mojibake(pages.select("text"))
    out["redact_pii"] = lambda: tx.redact_pii(pages.select("text"))
    out["c4_filter"] = lambda: tx.c4_quality_filter(
        pages.select(F.concat(
            F.col("text"), F.lit(" ok. It ends fine.\nshort line."))
            .alias("text")))
    out["quality_scores"] = lambda: tx.quality_score(pages.select("text"))

    def robots():
        from gojsonschema_spark.ops.robots import crawl_allowed, parse_robots
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
        return crawl_allowed(pages.select("url"), parse_robots(robots_dim),
                             agent="crawler")
    out["robots_allowed"] = robots

    def html_native():
        from gojsonschema_spark.ops.html import extract_text_native
        return pages.select(extract_text_native(F.col("html")).alias("t"))
    out["html_extract_native"] = html_native

    return out


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def bpe_train_bench(spark, n_merges: int = 256) -> None:
    """Evidence harness for the round-6 bpe_train rewrite: time the
    driver-local trainer (default path) for ``n_merges`` merges over the
    bench corpus, then the distributed per-merge fallback for 16 merges
    (forced via driver_vocab_cap=0), extrapolating the latter's
    per-merge cost — it is one vocabulary-sized Spark job PER MERGE, so
    running it for the full request would be hours at real vocab sizes.
    Also asserts the two paths' merge lists agree on the real corpus."""
    from gojsonschema_spark.ops.text import bpe_train

    pages = spark.read.parquet(bench.PAGES_PATH).select("text")
    pages.count()  # warm the scan
    spark.sparkContext.setJobDescription("r06:bpe_train_local")
    t0 = time.perf_counter()
    m_new = bpe_train(pages, n_merges)
    t_new = time.perf_counter() - t0
    print(f"driver-local: {n_merges}-merge request in {t_new:.2f}s "
          f"({len(m_new)} merges learned)", flush=True)
    spark.sparkContext.setJobDescription("r06:bpe_train_distributed")
    t0 = time.perf_counter()
    m_old = bpe_train(pages, 16, driver_vocab_cap=0)
    t_old = time.perf_counter() - t0
    per = t_old / 16
    print(f"distributed fallback: 16 merges in {t_old:.2f}s -> "
          f"{per:.2f}s/merge, x{n_merges} ~= {per * n_merges:.0f}s, "
          f"x32768 ~= {per * 32768 / 3600:.1f}h", flush=True)
    assert m_old == m_new[:len(m_old)], "path divergence"
    spark.sparkContext.setJobDescription(None)


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    names = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    spark = bench.get_spark(bench.CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    bench.ensure_pages(spark)
    if mode == "bpe_train":
        bpe_train_bench(spark, int(sys.argv[2]) if len(sys.argv) > 2 else 256)
        spark.stop()
        return
    frames = _frames(spark)
    todo = names or sorted(frames)
    os.makedirs(PLAN_DIR, exist_ok=True)
    results = {}
    for name in todo:
        build = frames[name]
        if mode in ("explain", "all"):
            df = build()
            path = os.path.join(PLAN_DIR, f"{name}_{TAG}.txt")
            with open(path, "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
            print(f"wrote {path}", flush=True)
        if mode in ("time", "all"):
            best, samples = float("inf"), []
            for _ in range(reps):
                spark.sparkContext.setJobDescription(f"r06:{name}")
                df = build()  # rebuild per rep: no stage-reuse freebies
                t0 = time.perf_counter()
                noop(df)
                dt = time.perf_counter() - t0
                samples.append(round(dt, 3))
                best = min(best, dt)
                spark.sparkContext.setJobDescription(None)
            results[name] = {"best": round(best, 3), "samples": samples}
            print(f"{name}: best={best:.3f} samples={samples}", flush=True)
    if results:
        print(json.dumps({"tag": TAG, "noop_best": {
            k: v["best"] for k, v in results.items()}}))
    spark.stop()


if __name__ == "__main__":
    main()
