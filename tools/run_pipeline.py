"""spark-submit entry point: full preprocessing pipeline over a corpus.

Usage (same launch shape as tools/submit_job.py):
    spark-submit --py-files gojsonschema_spark.zip tools/run_pipeline.py \
        <input_parquet> <output_dir> [--dedup exact|minhash|none]
        [--mix-col lang --temperature 3.0] [--pack-budget 2048]
        [--generate N]

Runs ops/pipeline.py::preprocess_corpus (boilerplate strip -> PII
redaction -> dedup -> Gopher quality gate -> optional temperature mix ->
sequence packing) and writes the survivors as parquet. Prints a one-line
JSON summary (rows in/out, packs).
"""
import argparse
import json
import os
import sys

# direct `python tools/run_pipeline.py` runs get the repo root on the
# path; spark-submit --py-files deployments resolve the zip instead
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("input")
    ap.add_argument("output")
    ap.add_argument("--dedup", default="exact",
                    choices=["exact", "minhash", "none"])
    ap.add_argument("--mix-col", default=None)
    ap.add_argument("--temperature", type=float, default=1.0)
    ap.add_argument("--pack-budget", type=int, default=2048)
    ap.add_argument("--no-quality", action="store_true",
                    help="skip the Gopher gate (published-English "
                         "thresholds drop synthetic/non-English corpora "
                         "wholesale — correctly)")
    ap.add_argument("--min-words", type=int, default=50)
    ap.add_argument("--min-stop-hits", type=int, default=2)
    ap.add_argument("--generate", type=int, default=0,
                    help="synthesize N web pages instead of reading input")
    ap.add_argument("--dedup-store", default=None,
                    help="parquet path of a persisted dedup store from a "
                         "prior run (fingerprint_store output for exact, "
                         "signature_store output for minhash) — day-2 "
                         "incremental mode")
    ap.add_argument("--write-store", default=None,
                    help="after dedup, write/extend the fingerprint store "
                         "with the SURVIVORS' fps at this parquet path "
                         "(exact mode) so the next run can pass it as "
                         "--dedup-store")
    ap.add_argument("--clf-model", default=None,
                    help="path of a save_classifier() store — enables the "
                         "trained-classifier quality gate (stage 4b)")
    ap.add_argument("--clf-threshold", type=float, default=0.5)
    ap.add_argument("--lm-model", default=None,
                    help="path of an lm_save() store — enables the CCNet "
                         "LM floor (stage 4c); requires --lm-min-logprob")
    ap.add_argument("--lm-min-logprob", type=float, default=None)
    args = ap.parse_args()

    spark = SparkSession.builder.appName("gjs-pipeline").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from gojsonschema_spark.ops.pipeline import (PipelineConfig,
                                                 preprocess_corpus)
    from gojsonschema_spark.ops.webpages import generate_webpages, url_host

    if args.generate:
        pages = generate_webpages(spark, args.generate,
                                  partitions=max(args.generate // 50000, 4))
    else:
        pages = spark.read.parquet(args.input)
    staged = (pages.withColumn("host", url_host(F.col("url")))
              .withColumn("doc_id", F.xxhash64("url", "warc_ts")))
    n_in = staged.count()

    store = spark.read.parquet(args.dedup_store) if args.dedup_store else None
    clf_model = None
    if args.clf_model:
        from gojsonschema_spark.ops.classifier import load_classifier
        clf_model = load_classifier(spark, args.clf_model)
    lm_model = None
    if args.lm_model:
        from gojsonschema_spark.ops.lm import lm_load
        lm_model = lm_load(spark, args.lm_model)
    cfg = PipelineConfig(dedup=args.dedup, mix_col=args.mix_col,
                         temperature=args.temperature,
                         pack_budget=args.pack_budget or None,
                         quality=not args.no_quality,
                         dedup_store=store,
                         clf_model=clf_model,
                         clf_threshold=args.clf_threshold,
                         lm_model=lm_model,
                         lm_min_logprob=args.lm_min_logprob,
                         gopher_kwargs={"min_words": args.min_words,
                                        "min_stop_hits": args.min_stop_hits})
    out = preprocess_corpus(staged, cfg)
    out.write.mode("overwrite").parquet(args.output)

    written = spark.read.parquet(args.output)
    n_out = written.count()
    n_packs = (written.select("pack_id").distinct().count()
               if "pack_id" in written.columns else None)
    if args.write_store:
        from gojsonschema_spark.ops.incremental import fingerprint_store
        fps = fingerprint_store(written, text_col="text_final")
        if store is not None and args.dedup == "exact":
            fps = fps.unionAll(store.select("fp")).distinct()
        if args.dedup_store and os.path.abspath(args.write_store) == \
                os.path.abspath(args.dedup_store):
            # extending the store in place: stage first (cannot overwrite
            # a parquet dir that the plan is still reading from)
            staging = args.write_store.rstrip("/") + ".staging"
            fps.write.mode("overwrite").parquet(staging)
            spark.read.parquet(staging).write.mode("overwrite") \
                .parquet(args.write_store)
        else:
            fps.write.mode("overwrite").parquet(args.write_store)
    print(json.dumps({"rows_in": n_in, "rows_out": n_out,
                      "n_packs": n_packs, "output": args.output,
                      "store": args.write_store}))
    spark.stop()


if __name__ == "__main__":
    main()
