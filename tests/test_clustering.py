"""k-means + SemDeDup (ops/clustering.py): path equivalence, Lloyd
convergence invariants, planted near-dup pruning, plan gates."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from gojsonschema_spark.ops.clustering import (kmeans_assign, kmeans_fit,
                                               semdedup)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def fixed_centroids(emb):
    rows = emb.filter(F.col("vec_id") < 6).orderBy("vec_id").collect()
    return [[float(x) for x in r.embedding] for r in rows]


def test_arrow_and_native_paths_agree(emb, fixed_centroids):
    a = {r.vec_id: (r.cid, r.dist2) for r in
         kmeans_assign(emb, fixed_centroids, method="arrow").collect()}
    n = {r.vec_id: (r.cid, r.dist2) for r in
         kmeans_assign(emb, fixed_centroids, method="native").collect()}
    assert a.keys() == n.keys()
    for k in a:
        assert a[k][0] == n[k][0], f"cid flip for vec {k}"
        assert a[k][1] == pytest.approx(n[k][1], abs=1e-9)


def test_assign_is_nearest_with_low_cid_ties(spark):
    # two identical centroids: the tie must go to the lower cid
    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [5.0, 5.0])], "vec_id long, embedding array<double>")
    cents = [[4.0, 4.0], [4.0, 4.0], [0.1, 0.0]]
    for method in ("arrow", "native"):
        got = {r.vec_id: r.cid
               for r in kmeans_assign(df, cents, method=method).collect()}
        assert got == {1: 2, 2: 0}, method


def test_assign_validates_inputs(emb):
    with pytest.raises(ValueError):
        kmeans_assign(emb, [])
    with pytest.raises(ValueError):
        kmeans_assign(emb, [[1.0, 2.0], [1.0]])
    with pytest.raises(ValueError):
        kmeans_assign(emb, [[1.0]], method="bogus")


def test_kmeans_fit_converges_to_member_means(emb):
    cents = kmeans_fit(emb, k=5, n_iter=100, seed=1)
    assigned = kmeans_assign(emb, cents).select("vec_id", "cid").collect()
    vecs = {r.vec_id: np.asarray(r.embedding, dtype=np.float64)
            for r in emb.collect()}
    byc: dict[int, list] = {}
    for r in assigned:
        byc.setdefault(r.cid, []).append(vecs[r.vec_id])
    # at a Lloyd fixed point every centroid is the mean of its members
    for cid, members in byc.items():
        assert np.allclose(np.mean(members, axis=0), cents[cid], atol=1e-9)
    # every vector was assigned, no empty output
    assert sum(len(m) for m in byc.values()) == len(vecs)


def test_kmeans_fit_deterministic_and_validates(emb):
    a = kmeans_fit(emb, k=3, n_iter=4, seed=7)
    b = kmeans_fit(emb, k=3, n_iter=4, seed=7)
    assert a == b
    c = kmeans_fit(emb, k=3, n_iter=4, seed=8)
    assert a != c  # different seed -> different init
    with pytest.raises(ValueError):
        kmeans_fit(emb, k=0)
    with pytest.raises(ValueError):
        kmeans_fit(emb.limit(2), k=5)


def _planted(emb):
    return emb.select("vec_id", "embedding").unionByName(
        emb.filter(F.col("vec_id") % 20 == 0).select(
            (F.col("vec_id") + 1000000).alias("vec_id"),
            F.transform("embedding",
                        lambda x: x * F.lit(1.001)).alias("embedding")))


def test_semdedup_prunes_planted_copies(emb, fixed_centroids):
    n_planted = emb.filter(F.col("vec_id") % 20 == 0).count()
    out = semdedup(_planted(emb), centroids=fixed_centroids, threshold=0.99)
    assert out.count() == emb.count() + n_planted
    lost = sorted(r.vec_id for r in out.filter(~F.col("keep")).collect())
    # canonical-min-id survivor: originals win, planted copies lose
    assert len(lost) == n_planted and all(v >= 1000000 for v in lost)
    assert out.filter(F.col("oversized")).count() == 0


def test_semdedup_oversized_clusters_keep_everything(emb, fixed_centroids):
    out = semdedup(_planted(emb), centroids=fixed_centroids,
                   threshold=0.99, max_cluster_size=3)
    # degenerate guard: flagged clusters are exempt from pair generation
    assert out.filter(~F.col("keep")).join(
        out.filter(F.col("oversized")), "vec_id").count() == 0
    assert out.filter(F.col("oversized")).count() > 0


def test_semdedup_requires_centroids_or_k(emb):
    with pytest.raises(ValueError):
        semdedup(emb)


def test_semdedup_fit_in_place(emb):
    out = semdedup(_planted(emb), k=4, n_iter=3, threshold=0.99)
    lost = out.filter(~F.col("keep")).count()
    assert lost == emb.filter(F.col("vec_id") % 20 == 0).count()


def test_plan_shapes(emb, fixed_centroids):
    # arrow assignment: map-side only — no shuffle exchange in the plan
    plan = kmeans_assign(emb, fixed_centroids)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
    # semdedup pair generation: equi-join on cid, never a cross product
    sd = semdedup(_planted(emb), centroids=fixed_centroids, threshold=0.99)
    splan = sd._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in splan and "BroadcastNestedLoop" not in splan
