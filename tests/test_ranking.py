"""Distributed cumulative-share bucketing (ops/ranking.py)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Window, functions as F

from gojsonschema_spark.ops.ranking import cumulative_share_buckets


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, lang string, score double, w long")


def test_hand_computed_buckets(spark):
    # lang 'a': weights in score-desc order = 2, 1, 1, 2 (total 6)
    # cum = 2, 3, 4, 6 -> share 1/3, 1/2, 2/3, 1
    # cuts (1/3, 2/3): share == cut lands in the EARLIER bucket
    rows = [(1, "a", 9.0, 2), (2, "a", 7.0, 1), (3, "a", 5.0, 1),
            (4, "a", 3.0, 2),
            (10, "b", 1.0, 5)]  # single doc: share 1.0 -> tail
    out = {r.doc_id: r for r in cumulative_share_buckets(
        _df(spark, rows), "score", id_col="doc_id", group_col="lang",
        weight_col="w").collect()}
    assert [out[i].bucket for i in (1, 2, 3, 4)] == \
        ["head", "middle", "middle", "tail"]
    assert [out[i].cum_weight for i in (1, 2, 3, 4)] == [2, 3, 4, 6]
    assert out[1].share == pytest.approx(1 / 3)
    assert out[10].bucket == "tail" and out[10].share == 1.0


def test_matches_single_window_reference(spark):
    """The two-pass prefix sum must equal the naive global window on
    randomized data with ties (rounded scores collide; doc_id breaks
    them), regardless of input partitioning."""
    rng = random.Random(7)
    rows = [(i, rng.choice(["en", "de", "fr"]),
             round(rng.uniform(-5, 0), 1), rng.randint(0, 9))
            for i in range(500)]
    df = _df(spark, rows).repartition(13)

    w = (Window.partitionBy("lang")
         .orderBy(F.col("score").desc(), F.col("doc_id"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    tot = Window.partitionBy("lang")
    ref = (df.select("doc_id", F.sum("w").over(w).alias("cum"),
                     (F.sum("w").over(w) /
                      F.sum("w").over(tot)).alias("share"))
           .collect())
    exp = {r.doc_id: (r.cum, r.share) for r in ref}

    for n_parts in (1, 7, 32):
        got = cumulative_share_buckets(
            df, "score", id_col="doc_id", group_col="lang",
            weight_col="w", num_partitions=n_parts).collect()
        assert len(got) == len(exp)
        for r in got:
            assert (r.cum_weight, r.share) == exp[r.doc_id], r


def test_ungrouped_and_unweighted(spark):
    rows = [(i, "x", float(-i), 1) for i in range(10)]
    out = cumulative_share_buckets(
        _df(spark, rows), "score", id_col="doc_id",
        descending=False).collect()
    # ascending score = doc_id 9..0 reversed -> doc 9 first
    by_id = {r.doc_id: r for r in out}
    assert by_id[9].cum_weight == 1 and by_id[0].cum_weight == 10
    assert by_id[9].bucket == "head" and by_id[0].bucket == "tail"
    assert all(r.weight == 1 for r in out)


def test_zero_weight_group_and_null_group(spark):
    rows = [(1, None, 2.0, 0), (2, None, 1.0, 0), (3, "a", 1.0, 4)]
    out = {r.doc_id: r for r in cumulative_share_buckets(
        _df(spark, rows), "score", id_col="doc_id", group_col="lang",
        weight_col="w").collect()}
    # all-zero-weight group: share 0.0 -> first label, both rows present
    assert out[1].share == 0.0 and out[2].share == 0.0
    assert out[1].bucket == "head"
    assert out[1].lang is None  # original group value passes through
    assert out[3].share == 1.0


def test_guards(spark):
    df = _df(spark, [(1, "a", 1.0, -2)])
    with pytest.raises(Exception, match="non-negative"):
        cumulative_share_buckets(df, "score", id_col="doc_id",
                                 weight_col="w").collect()
    with pytest.raises(ValueError, match="labels"):
        cumulative_share_buckets(df, "score", id_col="doc_id",
                                 cuts=(0.5,), labels=("a", "b", "c"))
    with pytest.raises(ValueError, match="increasing"):
        cumulative_share_buckets(df, "score", id_col="doc_id",
                                 cuts=(0.5, 0.5), labels=("a", "b", "c"))
    big = spark.range(50).select(
        F.col("id").alias("doc_id"), F.col("id").cast("string").alias("g"),
        F.lit(1.0).alias("score"), F.lit(1).alias("w"))
    with pytest.raises(ValueError, match="max_groups"):
        cumulative_share_buckets(big, "score", id_col="doc_id",
                                 group_col="g", weight_col="w",
                                 max_groups=10)


def test_perplexity_buckets_orders_by_quality(spark):
    """head docs score higher (lower perplexity) than tail docs within
    each language, and per-lang token mass is split ~evenly."""
    from gojsonschema_spark.ops.lm import lm_train, perplexity_buckets

    rng = random.Random(3)
    vocab = ["the", "cat", "sat", "on", "mat", "dog", "ran", "far"]
    rows = []
    for i in range(120):
        lang = "en" if i % 2 else "de"
        n = rng.randint(5, 30)
        if i % 3 == 0:  # gibberish third: OOV-heavy
            words = [f"zzz{rng.randint(0, 999)}" for _ in range(n)]
        else:
            words = [rng.choice(vocab) for _ in range(n)]
        rows.append((i, lang, " ".join(words)))
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    model = lm_train(df.filter(F.col("doc_id") % 4 == 0))
    out = perplexity_buckets(df, model).collect()
    assert len(out) == 120
    for lang in ("en", "de"):
        sub = [r for r in out if r.lang == lang]
        head = [r.log_prob_per_token for r in sub if r.bucket == "head"]
        tail = [r.log_prob_per_token for r in sub if r.bucket == "tail"]
        assert min(head) >= max(tail)
        mass = {b: sum(r.weight for r in sub if r.bucket == b)
                for b in ("head", "middle", "tail")}
        total = sum(mass.values())
        for b in mass:  # each bucket within a factor ~2 of a third
            assert mass[b] > total / 6, (lang, mass)


def test_exact_percentiles_unit_weights(spark):
    """q=0.5 with unit weights is the lower median; q=1 the max;
    boundary q exactly at a crossing share picks the crossing row."""
    from gojsonschema_spark.ops.ranking import exact_weighted_percentiles

    rows = [(i, "a", float(v), 1) for i, v in
            enumerate([10, 20, 30, 40])]  # shares .25 .5 .75 1.0
    df = _df(spark, rows)
    got = {(r.lang, r.q): r.value for r in exact_weighted_percentiles(
        df, "score", qs=(0.25, 0.5, 0.51, 1.0), id_col="doc_id",
        group_col="lang").collect()}
    assert got == {("a", 0.25): 10.0, ("a", 0.5): 20.0,
                   ("a", 0.51): 30.0, ("a", 1.0): 40.0}


def test_exact_percentiles_weighted_matches_reference(spark):
    """Type-1 weighted quantiles vs a pure-Python reference on random
    data with ties and zero weights, per group."""
    from gojsonschema_spark.ops.ranking import exact_weighted_percentiles

    rng = random.Random(11)
    rows = [(i, rng.choice(["en", "de"]), float(rng.randint(0, 20)),
             rng.randint(0, 5)) for i in range(300)]
    qs = (0.1, 0.5, 0.9, 1.0)

    def ref(lang):
        sub = sorted([r for r in rows if r[1] == lang],
                     key=lambda r: (r[2], r[0]))
        tot = sum(r[3] for r in sub)
        out = {}
        for q in qs:
            cum = 0
            for r in sub:
                prev = cum
                cum += r[3]
                if cum / tot >= q and prev / tot < q:
                    out[q] = r[2]
                    break
        return out

    got = {}
    for r in exact_weighted_percentiles(
            _df(spark, rows), "score", qs=qs, id_col="doc_id",
            group_col="lang", weight_col="w").collect():
        got.setdefault(r.lang, {})[r.q] = r.value
    assert got == {"en": ref("en"), "de": ref("de")}
    # exactly one row per (group, q)
    n = exact_weighted_percentiles(
        _df(spark, rows), "score", qs=qs, id_col="doc_id",
        group_col="lang", weight_col="w").count()
    assert n == 2 * len(qs)


def test_exact_percentiles_guards(spark):
    from gojsonschema_spark.ops.ranking import exact_weighted_percentiles

    df = _df(spark, [(1, "a", 1.0, 1)])
    with pytest.raises(ValueError, match="in \\(0, 1\\]"):
        exact_weighted_percentiles(df, "score", qs=(0.0,),
                                   id_col="doc_id")
    with pytest.raises(ValueError, match="duplicate"):
        exact_weighted_percentiles(df, "score", qs=(0.5, 0.5),
                                   id_col="doc_id")


def test_null_weights_rejected(spark):
    from gojsonschema_spark.ops.ranking import cumulative_share_buckets

    df = spark.createDataFrame([(1, "a", 1.0, 2), (2, "a", 2.0, None)],
                               "doc_id long, lang string, score double, w long")
    with pytest.raises(ValueError, match="non-null"):
        cumulative_share_buckets(df, "score", id_col="doc_id",
                                 group_col="lang", weight_col="w")
