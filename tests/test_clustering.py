"""Distributed k-means (`operators/clustering.py`): planted-partition
recovery, determinism/partition invariance, empty-cluster survival, and
agreement with a NumPy Lloyd reference on the same seeded init."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from autoextract.operators.clustering import (
    kmeans_assign,
    kmeans_fit,
    kmeans_verdict,
    plant_clusters,
)


def test_verdict_all_true(spark):
    rows = kmeans_verdict(spark, n_clusters=4, per_cluster=20, n_rounds=6).collect()
    assert len(rows) == 4
    assert all(r["pure"] and r["distinct_label"] for r in rows)


def test_partition_invariance(spark):
    corpus = plant_clusters(spark, 4, 15)
    c1 = kmeans_fit(corpus, k=4, n_rounds=5)
    c2 = kmeans_fit(corpus.repartition(17), k=4, n_rounds=5)
    assert np.allclose(c1, c2)


def test_matches_numpy_reference(spark):
    corpus = plant_clusters(spark, 3, 12, dim=12)
    got = kmeans_fit(corpus, k=3, n_rounds=4)
    rows = corpus.orderBy("vec_id").collect()
    X = np.array([list(r["embedding"]) for r in rows])
    cents = X[:3].copy()
    for _ in range(4):
        d2 = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        a = d2.argmin(axis=1)
        nxt = cents.copy()
        for c in range(3):
            m = X[a == c]
            if len(m):
                nxt[c] = m.mean(axis=0)
        if np.allclose(nxt, cents):
            break
        cents = nxt
    assert np.allclose(got, cents)


def test_empty_cluster_keeps_centroid(spark):
    # two tight planted clusters, k=3: the third centroid (init = vec 2,
    # inside a cluster) may starve — it must survive with SOME centroid
    # and assignment must still be total
    corpus = plant_clusters(spark, 2, 30, dim=8, noise=0.01)
    cents = kmeans_fit(corpus, k=3, n_rounds=5)
    assert cents.shape == (3, 8)
    assert np.isfinite(cents).all()
    labeled = kmeans_assign(corpus, cents)
    assert labeled.where(F.col("cluster_id").isNull()).count() == 0


def test_k_larger_than_corpus_raises(spark):
    corpus = plant_clusters(spark, 2, 2, dim=8)
    with pytest.raises(ValueError, match="fewer than k"):
        kmeans_fit(corpus, k=50)
