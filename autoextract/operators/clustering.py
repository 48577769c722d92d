"""Distributed k-means over an embedding column — the corpus-scale
clustering primitive.

`similarity.train_ivf_centroids` trains on a bounded DRIVER sample (the
right recipe for an ANN coarse quantizer). This module is the other tier:
Lloyd iterations where the ASSIGNMENT pass runs distributed over the whole
corpus and the centroid update is a map-side partial aggregation — the
shape that still works when the corpus is 10^12 rows and no sample fits
the quantization budget (topic bucketing, SemDeDup cell refinement,
cluster-balanced data selection).

Scale shape per round:
  * assignment — one NumPy distance matmul per Arrow batch against the
    broadcast centroid array (k × dim doubles in the UDF closure); narrow,
    vectors never shuffle;
  * update — ``posexplode`` to (cluster, dim_idx, value) rows, then
    ``groupBy(cluster, dim_idx).agg(sum, count)``: Catalyst partial-aggs
    map-side, so the exchange carries at most k × dim × partitions short
    rows, independent of corpus size;
  * the k × dim result is one tiny collect per round (the same bounded
    driver step as PageRank's 1-row dangling-mass broadcast); empty
    clusters keep their previous centroid (deterministic).

Determinism: seeded init from the k lowest ids (TakeOrdered — stable
under any partitioning), fixed round count, argmin ties to the lowest
cluster index. Identical on 1 or 1000 executors.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import ivf_assign


def kmeans_assign(
    embeddings: DataFrame, centroids: np.ndarray, vec_col: str = "embedding"
) -> DataFrame:
    """Attach ``cluster_id`` (nearest centroid, squared-L2, ties to the
    lowest index) — one matmul per Arrow batch."""
    return ivf_assign(embeddings, centroids, vec_col).withColumnRenamed(
        "ivf_cell", "cluster_id"
    )


def kmeans_fit(
    embeddings: DataFrame,
    k: int = 8,
    n_rounds: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Distributed Lloyd's: returns the (k, dim) centroid array after
    ``n_rounds`` synchronous rounds. Init = the k lowest-id vectors."""
    # r6 (ADVICE): persist the pruned source for the round loop — every
    # Lloyd round otherwise re-evaluates the full upstream lineage of
    # ``embeddings`` (assignment + explode + collect per round), and
    # convergence assumes the recomputed source is stable across rounds.
    # Unpersisted before returning, so nothing leaks across queries/runs.
    # Partitioning is scale-adaptive (~4k vectors per task, capped at the
    # cluster width): every round launches one Arrow batch stage over
    # these partitions, so a tiny input on a wide session would otherwise
    # pay rounds × width empty-task/worker overhead (measured: the
    # 240-row verdict fixture ran 32 Arrow tasks per round).
    emb = embeddings.select(id_col, vec_col)
    n_rows = emb.count()
    sc = embeddings.sparkSession.sparkContext
    parts = max(1, min(sc.defaultParallelism, -(-n_rows // 4096)))
    emb = emb.repartition(parts, id_col).persist()
    init_rows = emb.orderBy(id_col).limit(k).collect()
    if len(init_rows) < k:
        emb.unpersist(blocking=False)
        raise ValueError(f"corpus has fewer than k={k} rows")
    centroids = np.array(
        [list(r[vec_col]) for r in init_rows], dtype=np.float64
    )
    for _ in range(n_rounds):
        assigned = kmeans_assign(emb, centroids, vec_col)
        sums = (
            assigned.select(
                "cluster_id",
                F.posexplode(F.col(vec_col).cast("array<double>")).alias(
                    "dim_idx", "v"
                ),
            )
            .groupBy("cluster_id", "dim_idx")
            .agg(F.sum("v").alias("s"), F.count("v").alias("n"))
            .collect()
        )
        nxt = centroids.copy()  # empty clusters keep their centroid
        acc = np.zeros_like(centroids)
        cnt = np.zeros(len(centroids), dtype=np.int64)
        for r in sums:
            acc[r["cluster_id"], r["dim_idx"]] = r["s"]
            cnt[r["cluster_id"]] = r["n"]
        nonempty = cnt > 0
        nxt[nonempty] = acc[nonempty] / cnt[nonempty, None]
        if np.allclose(nxt, centroids):
            break
        centroids = nxt
    emb.unpersist(blocking=False)
    return centroids


# ----------------------------------------------------------------------
# driver verdict
# ----------------------------------------------------------------------


def plant_clusters(
    spark,
    n_clusters: int = 6,
    per_cluster: int = 40,
    dim: int = 64,
    noise: float = 0.05,
) -> DataFrame:
    """Deterministic well-separated corpus: cluster c's center is a block
    indicator on dims [c·dim/n, (c+1)·dim/n); members perturb it with a
    pure-expression sin() pattern (identical on every executor, no RNG)."""
    block = dim // n_clusters
    ids = spark.range(n_clusters * per_cluster).select(
        F.col("id").alias("vec_id"),
        (F.col("id") % n_clusters).cast("int").alias("true_cluster"),
    )
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: (
            F.when(
                (i >= F.col("true_cluster") * block)
                & (i < (F.col("true_cluster") + 1) * block),
                F.lit(1.0),
            ).otherwise(F.lit(0.0))
            + F.lit(noise) * F.sin(F.col("vec_id") * 37 + i)
        ).cast("double"),
    )
    return ids.select("vec_id", "true_cluster", vec.alias("embedding"))


def kmeans_verdict(
    spark,
    n_clusters: int = 6,
    per_cluster: int = 40,
    n_rounds: int = 8,
) -> DataFrame:
    """DRIVER-CHECKED verdict, one row per planted cluster: after the FULL
    distributed fit + assign, (a) every member of the planted cluster
    lands in ONE learned cluster (purity) and (b) that learned cluster is
    claimed by no other planted cluster (distinctness) — together: exact
    recovery of the planted partition."""
    corpus = plant_clusters(spark, n_clusters, per_cluster)
    cents = kmeans_fit(corpus, k=n_clusters, n_rounds=n_rounds)
    labeled = kmeans_assign(corpus, cents)
    per_true = (
        labeled.groupBy("true_cluster")
        .agg(
            F.countDistinct("cluster_id").alias("n_labels"),
            F.min("cluster_id").alias("label"),
        )
    )
    label_owners = (
        labeled.groupBy("cluster_id")
        .agg(F.countDistinct("true_cluster").alias("n_owners"))
        .withColumnRenamed("cluster_id", "label")
    )
    return (
        per_true.join(label_owners, "label")
        .select(
            F.col("true_cluster").cast("int").alias("cluster"),
            (F.col("n_labels") == 1).alias("pure"),
            (F.col("n_owners") == 1).alias("distinct_label"),
        )
        .orderBy("cluster")
    )
