"""Similarity search over an embedding column (``array<float>``).

Two tiers, as a 100 TB pipeline needs them:

  * brute-force cosine top-k — exact baseline. The dot product is a pure
    Spark expression (``aggregate(zip_with(...))``) against a *broadcast*
    literal query vector, so the scan stays JVM-side, codegen'd, and
    embarrassingly parallel (no shuffle until the final top-k, which is a
    ``TakeOrderedAndProject`` — bytes proportional to k, not N).
  * LSH-bucketed ANN — random-hyperplane (SRP) signatures computed in one
    vectorized pandas UDF (a single NumPy matmul per Arrow batch), then
    candidate generation by bucket equality. Hyperplanes are seeded —
    identical across executors/runs — and the matmul touches each row once:
    the scale path for N × N near-neighbor work.

Batch ANN (top-k for *every* row) composes the same pieces: bucket-join then
per-bucket exact rerank.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _dot(a, b) -> "F.Column":
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a) -> "F.Column":
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_similarity_col(a, b) -> "F.Column":
    denom = _norm(a) * _norm(b)
    return F.when(denom > 0, _dot(a, b) / denom).otherwise(F.lit(0.0))


def cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine against a literal query vector.

    The query vector is folded into the plan as a literal array (the
    broadcast-small-side idiom at its limit); ordering tie-breaks on id so
    results are total-ordered and cluster-size independent.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = embeddings.select(
        F.col(id_col),
        F.round(cosine_similarity_col(F.col(vec_col), q), 6).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    block_col: str | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Pairs with cosine ≥ threshold, optionally within a blocking key.

    Unblocked = crossjoin: only for small verified sets / oracles. The scale
    path blocks on ``srp_buckets`` output or a semantic key (label, shard).
    """
    sel = [F.col(id_col), F.col(vec_col)] + ([F.col(block_col)] if block_col else [])
    e = embeddings.select(*sel)
    a, b = e.alias("a"), e.alias("b")
    joined = (a.join(b, on=block_col) if block_col else a.crossJoin(b)).where(
        F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    )
    sim = cosine_similarity_col(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"))
    return joined.select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        F.round(sim, 6).alias("cosine"),
    ).where(F.col("cosine") >= threshold)


# ----------------------------------------------------------------------
# random-hyperplane LSH (SRP)
# ----------------------------------------------------------------------


def srp_bucket_udf(dim: int, n_planes: int = 16, seed: int = 42):
    """Signed-random-projection bucket id: sign pattern of ``n_planes``
    seeded Gaussian hyperplanes, packed into a long. One NumPy matmul per
    Arrow batch — the vectorized path for per-row Python-adjacent math."""
    planes = np.random.RandomState(seed).randn(dim, n_planes)
    weights = (1 << np.arange(n_planes, dtype=np.int64))

    @F.pandas_udf(T.LongType())
    def bucket(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="int64")
        m = np.vstack([np.asarray(v, dtype=np.float64) for v in vecs])
        signs = (m @ planes) > 0
        return pd.Series((signs @ weights).astype(np.int64))

    return bucket


def srp_buckets(
    embeddings: DataFrame,
    dim: int,
    n_planes: int = 16,
    seed: int = 42,
    vec_col: str = "embedding",
) -> DataFrame:
    """Attach the SRP bucket id. Rows sharing a bucket are ANN candidates."""
    return embeddings.withColumn(
        "srp_bucket", srp_bucket_udf(dim, n_planes, seed)(F.col(vec_col))
    )


def ann_topk_via_srp(
    embeddings: DataFrame,
    query_vec: list[float],
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: prune to the query's SRP bucket, exact-rank inside it.

    With ``n_planes`` planes the scan shrinks ~2^n_planes-fold; recall is
    tunable by lowering n_planes or probing neighboring buckets (Hamming-1
    probe left as the documented extension).
    """
    planes = np.random.RandomState(seed).randn(dim, n_planes)
    qsig = (np.asarray(query_vec, dtype=np.float64) @ planes) > 0
    qbucket = int((qsig @ (1 << np.arange(n_planes, dtype=np.int64))))
    bucketed = srp_buckets(embeddings, dim, n_planes, seed, vec_col)
    pruned = bucketed.where(F.col("srp_bucket") == F.lit(qbucket))
    return cosine_topk(pruned, query_vec, k, id_col, vec_col)
