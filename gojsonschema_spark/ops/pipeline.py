"""One-call preprocessing pipeline: the composition a production corpus
run actually executes, wired from the individual operators.

``preprocess_corpus`` chains (each stage optional via config):

    schema validation -> per-host boilerplate strip -> PII redaction ->
    dedup (exact or MinHash-LSH + Jaccard verify + cluster resolution;
    optionally INCREMENTAL against a persisted day-2 store via
    ``dedup_store``) -> composite Gopher quality gate -> trained
    classifier gate (``clf_model``) -> LM perplexity gate
    (``lm_model``) -> temperature-T mixing -> token-budget sequence
    packing

Everything stays lazy — one DataFrame in, one DataFrame out; the caller
triggers execution with its own action (usually a checkpointed write via
plans/checkpointed.py). Scale shape is inherited from the member ops:
map-side-only stages pipeline with the scan, shuffles carry digests, the
dedup small sides broadcast, iterative clustering localCheckpoints.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F

__all__ = ["PipelineConfig", "preprocess_corpus"]


@dataclass
class PipelineConfig:
    text_col: str = "text"
    key_col: str = "doc_id"
    host_col: str | None = "host"

    # stage 0: schema validation over a JSON payload column (None = skip)
    validate_schema: dict | None = None
    doc_col: str = "doc"
    keep_invalid: bool = False          # False = drop invalid rows

    # stage 1: per-host boilerplate strip (needs host_col)
    boilerplate: bool = True
    boilerplate_min_docs: int = 8
    boilerplate_frac: float = 0.5
    # opt-in broadcast of the |hosts|-sized boilerplate dims (unbounded
    # at web scale — default lets AQE decide from runtime stats)
    boilerplate_broadcast_hosts: bool = False

    # stage 2: PII redaction
    redact: bool = True

    # stage 3: dedup
    dedup: str = "exact"                # "exact" | "minhash" | "none"
    minhash_num_hashes: int = 64
    minhash_bands: int = 16
    jaccard_threshold: float = 0.9
    # day-2 incremental mode: a persisted store DataFrame from prior runs
    # (fingerprint_store output for dedup="exact", signature_store output
    # for dedup="minhash"); rows already in the store are dropped too
    dedup_store: object | None = None   # DataFrame; None = single-corpus

    # stage 4: composite Gopher quality gate
    quality: bool = True
    gopher_kwargs: dict = field(default_factory=dict)

    # stage 4b: trained classifier gate (train_quality_classifier
    # output dict) — zero-shuffle Arrow margin column, filtered
    # map-side at the logit of clf_threshold
    clf_model: dict | None = None
    clf_threshold: float = 0.5          # keep P(positive) >= threshold

    # stage 4c: LM quality gate (ops/lm.BackoffLM) — CCNet-style floor
    # on mean log-prob per token; survivors via left-semi join on
    # key_col (the score side shuffles model-table joins, the corpus
    # side only the semi-join)
    lm_model: object | None = None
    lm_min_logprob: float | None = None

    # stage 5: temperature mixing over a group column (None = skip)
    mix_col: str | None = None
    temperature: float = 1.0
    seed: int = 7

    # stage 6: sequence packing (None = skip)
    pack_budget: int | None = 2048

    # persist the frame at DAG fork points (the boilerplate census and
    # the dedup group-side both re-consume their input): without it the
    # regex-heavy upstream lineage recomputes once per fork — measured
    # ~41s -> ~25s on 200k pages. MEMORY_AND_DISK: spills, never OOMs.
    # For multi-day 100 TB runs prefer materializing between stages via
    # checkpointed writes (plans/checkpointed.py) over executor caches.
    persist_intermediate: bool = True


def preprocess_corpus(df: DataFrame,
                      config: PipelineConfig | None = None) -> DataFrame:
    """Run the configured preprocessing chain; returns the surviving rows
    with the cleaned text in ``text_final`` (plus ``n_tok``/``pack_id``
    when packing is enabled). See module docstring for the stage list.

    ``key_col`` must be UNIQUE per row (e.g. xxhash64(url, warc_ts)):
    dedup keeps one survivor per duplicate CLUSTER keyed by it — rows
    sharing a key are indistinguishable to the canonical-survivor step
    and will all be kept or all dropped together."""
    from ..spark.engine import SparkValidator
    from .dedup import (dedup_keep_canonical, boilerplate_lines,
                        exact_dedup_keep_canonical, minhash_lsh_pairs,
                        ngram_jaccard_pairs, strip_boilerplate)
    from .text import (gopher_quality_filter, pack_sequences, redact_pii,
                       temperature_resample, token_count_bpe)

    from pyspark import StorageLevel

    cfg = config or PipelineConfig()
    text = cfg.text_col

    def fork_point(d: DataFrame) -> DataFrame:
        # multiple downstream consumers: materialize once, spill-safe
        if cfg.persist_intermediate:
            return d.persist(StorageLevel.MEMORY_AND_DISK)
        return d

    if cfg.validate_schema is not None:
        v = SparkValidator(cfg.validate_schema)
        df = v.validate_json(df, cfg.doc_col, violations_col=None)
        if not cfg.keep_invalid:
            df = df.filter(F.col("valid")).drop("valid")

    if cfg.boilerplate:
        if not cfg.host_col:
            raise ValueError("boilerplate stage requires host_col")
        df = fork_point(df)  # consumed by line census, host counts, strip
        bp = boilerplate_lines(df, host_col=cfg.host_col, text_col=text,
                               min_docs=cfg.boilerplate_min_docs,
                               frac=cfg.boilerplate_frac,
                               broadcast_hosts=cfg.boilerplate_broadcast_hosts)
        df = strip_boilerplate(df, bp, host_col=cfg.host_col,
                               text_col=text, out_col="__text_stripped",
                               broadcast_hosts=cfg.boilerplate_broadcast_hosts)
        text = "__text_stripped"

    if cfg.redact:
        df = redact_pii(df, text_col=text, out_col="__text_redacted")
        if text == "__text_stripped":
            # the stripped intermediate has no consumer once redaction
            # replaced it; dropping it here keeps a whole text copy out
            # of the dedup fork's persist (and out of the output)
            df = df.drop(text)
        text = "__text_redacted"

    if cfg.dedup in ("exact", "minhash"):
        df = fork_point(df)  # consumed by the group/pair side + main
    if cfg.dedup == "exact":
        if cfg.dedup_store is not None:
            # day-2: drop rows whose fp is in the persisted store, then
            # the same within-batch min-key rule
            from .incremental import exact_dedup_incremental
            df = exact_dedup_incremental(df, cfg.dedup_store,
                                         text_col=text, key_col=cfg.key_col)
        else:
            # direct min-key survivor per fingerprint — exact at ANY
            # group size (the r4 exemplar-capped pair route
            # under-deduplicated groups with >64 members: the very
            # degenerate clusters exact dedup exists for), and one
            # shuffle cheaper (no pair explosion, no transitive closure
            # — byte-identical groups are cliques)
            df = exact_dedup_keep_canonical(df, text_col=text,
                                            key_col=cfg.key_col)
    elif cfg.dedup == "minhash":
        if cfg.dedup_store is not None:
            from .incremental import minhash_dedup_incremental
            df = minhash_dedup_incremental(
                df, cfg.dedup_store, text_col=text, key_col=cfg.key_col,
                num_hashes=cfg.minhash_num_hashes, bands=cfg.minhash_bands,
                confirm_exact="fp" in cfg.dedup_store.columns)
        else:
            cand = minhash_lsh_pairs(df, text_col=text, key_col=cfg.key_col,
                                     num_hashes=cfg.minhash_num_hashes,
                                     bands=cfg.minhash_bands)
            pairs = ngram_jaccard_pairs(df, cand, text_col=text,
                                        key_col=cfg.key_col,
                                        threshold=cfg.jaccard_threshold)
            df = dedup_keep_canonical(df, pairs, key_col=cfg.key_col,
                                      key_a="key_a", key_b="key_b")
    elif cfg.dedup != "none":
        raise ValueError(f"unknown dedup mode {cfg.dedup!r}")

    if cfg.quality:
        df = (gopher_quality_filter(df, text_col=text, **cfg.gopher_kwargs)
              .filter(F.col("keep")))
        df = df.drop("keep", *[c for c in df.columns
                               if c.startswith("ok_")])

    if cfg.clf_model is not None:
        import math

        from .classifier import margin_column
        t = min(max(cfg.clf_threshold, 1e-12), 1.0 - 1e-12)
        cutoff = math.log(t / (1.0 - t))
        df = (df.withColumn("__clf_margin",
                            margin_column(cfg.clf_model, text))
              .filter(F.col("__clf_margin") >= cutoff)
              .drop("__clf_margin"))

    if cfg.lm_model is not None:
        if cfg.lm_min_logprob is None:
            raise ValueError("lm_model requires lm_min_logprob")
        from .lm import lm_score
        # fork: lm_score and the left-semi below BOTH consume df —
        # without the persist the dedup shuffle join (and every map
        # stage above it) executes twice
        df = fork_point(df)
        keep = (lm_score(df, cfg.lm_model, text_col=text,
                         id_col=cfg.key_col)
                .filter(F.col("log_prob_per_token")
                        >= cfg.lm_min_logprob)
                .select(cfg.key_col))
        df = df.join(keep, cfg.key_col, "left_semi")

    if cfg.mix_col:
        df = temperature_resample(df, cfg.mix_col, cfg.temperature,
                                  seed=cfg.seed)

    df = df.withColumnRenamed(text, "text_final") if text != cfg.text_col \
        else df.withColumn("text_final", F.col(text))

    if cfg.pack_budget:
        df = df.withColumn("n_tok", token_count_bpe(df, "text_final"))
        df = pack_sequences(df, "n_tok", budget=cfg.pack_budget)
    return df
