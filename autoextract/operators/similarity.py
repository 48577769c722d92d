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

    The blocked path runs one chunked NumPy Gram multiply per block inside
    ``applyInPandas`` instead of |block|² interpreted-HOF dot products —
    the raw vectors cross Arrow once and only qualifying pairs come back
    (guide §4.2: batch native math beats per-row JVM expression chains by
    ~500× here). Cosines are ``round(dot/(‖a‖·‖b‖), 6)`` exactly as the
    expression path computes them; the row-chunked multiply bounds memory
    at chunk×|block| doubles, so no block-size cap is needed.
    """
    if block_col is None:
        e = embeddings.select(F.col(id_col), F.col(vec_col))
        a, b = e.alias("a"), e.alias("b")
        joined = a.crossJoin(b).where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        sim = cosine_similarity_col(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"))
        return joined.select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(sim, 6).alias("cosine"),
        ).where(F.col("cosine") >= threshold)

    out_schema = T.StructType(
        [
            T.StructField("id_a", T.LongType()),
            T.StructField("id_b", T.LongType()),
            T.StructField("cosine", T.DoubleType()),
        ]
    )
    chunk_rows = 2048

    def gram_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        empty = pd.DataFrame({"id_a": [], "id_b": [], "cosine": []}).astype(
            {"id_a": "int64", "id_b": "int64", "cosine": "float64"}
        )
        if n < 2:
            return empty
        ids = pdf[id_col].to_numpy()
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        m = np.vstack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
        m = m[order]
        norms = np.sqrt(np.einsum("ij,ij->i", m, m))
        # zero-norm rows: the expression path emits cosine 0.0 (its
        # `denom > 0` guard); dividing by +inf reproduces that exactly
        safe = np.where(norms == 0.0, np.inf, norms)
        outs = []
        for i0 in range(0, n - 1, chunk_rows):
            i1 = min(i0 + chunk_rows, n)
            d = m[i0:i1] @ m.T
            cos = np.round(d / (safe[i0:i1, None] * safe[None, :]), 6)
            ia, ib = np.nonzero(cos >= threshold)
            keep = ib > ia + i0  # strict upper triangle in global indices
            ia, ib = ia[keep], ib[keep]
            if len(ia):
                outs.append(
                    pd.DataFrame(
                        {
                            "id_a": ids[ia + i0].astype("int64"),
                            "id_b": ids[ib].astype("int64"),
                            "cosine": cos[ia, ib],
                        }
                    )
                )
        return pd.concat(outs, ignore_index=True) if outs else empty

    return (
        embeddings.select(block_col, id_col, vec_col)
        .groupBy(block_col)
        .applyInPandas(gram_pairs, schema=out_schema)
    )


def embedding_near_dup_pairs_blas(
    embeddings: DataFrame,
    threshold: float = 0.95,
    block_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_block_rows: int = 65536,
) -> DataFrame:
    """The SCALE variant of ``embedding_near_dup_pairs``: one NumPy/BLAS
    Gram matrix per block instead of |block|² interpreted-HOF dot products.

    Per block (``applyInPandas``): stack vectors → L2-normalize rows → one
    ``X @ X.T`` matmul → upper-triangle mask ≥ threshold → emit pairs. Only
    the raw vectors cross Arrow (once); output is the qualifying pairs, not
    the candidate cross product — at 64 dims this is ~50× the per-pair HOF
    expression path. ``max_block_rows`` guards the O(n²)-memory Gram matrix
    per block (a block beyond it raises rather than silently OOMing the
    executor; re-block first — that is the same contract the exact variant
    documents). Cosines here are float64 matmul sums, which can differ from
    the sequential-sum exact variant in the last ulp — fine for similarity
    work, which is why the ORACLE query stays on the expression path."""
    out_schema = T.StructType(
        [
            T.StructField("id_a", T.LongType()),
            T.StructField("id_b", T.LongType()),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def gram(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []}).astype(
                {"id_a": "int64", "id_b": "int64", "cosine": "float64"}
            )
        if n > max_block_rows:
            raise ValueError(
                f"block of {n} rows exceeds max_block_rows={max_block_rows}; "
                "use a finer block_col (e.g. srp_buckets) before the Gram pass"
            )
        ids = pdf[id_col].to_numpy()
        order = np.argsort(ids, kind="stable")  # deterministic pair ordering
        ids = ids[order]
        m = np.vstack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
        m = m[order]
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        g = (m / norms[:, None]) @ (m / norms[:, None]).T
        ia, ib = np.triu_indices(n, k=1)
        # round BEFORE thresholding — the exact variant's semantics (its
        # threshold applies to the 6dp-rounded cosine), so pair sets match
        cos = np.round(g[ia, ib], 6)
        keep = cos >= threshold
        return pd.DataFrame(
            {
                "id_a": ids[ia[keep]].astype("int64"),
                "id_b": ids[ib[keep]].astype("int64"),
                "cosine": cos[keep],
            }
        )

    return embeddings.select(block_col, id_col, vec_col).groupBy(
        block_col
    ).applyInPandas(gram, schema=out_schema)


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


# ----------------------------------------------------------------------
# IVF (inverted-file) ANN: coarse k-means quantizer + nprobe search
# ----------------------------------------------------------------------


def train_ivf_centroids(
    embeddings: DataFrame,
    n_cells: int = 16,
    sample_size: int = 4096,
    n_iters: int = 10,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """Coarse quantizer training: seeded Lloyd's k-means on a bounded driver
    sample (the standard IVF recipe — training is tiny and one-off; the
    corpus-sized work stays distributed). Deterministic end-to-end: the
    sample is the ``sample_size`` lowest ids (``orderBy(id_col).limit`` — a
    TakeOrdered, stable across partitionings and cluster sizes, unlike a
    bare ``limit`` whose row selection is partition-order dependent), then
    fixed seed, fixed iteration count, ties to the lowest centroid index.

    Train once and pass the result to ``ann_topk_via_ivf(centroids=...)``
    when issuing many queries — retraining per query re-collects the sample."""
    sample = np.array(
        [
            list(r[vec_col])
            for r in embeddings.select(id_col, vec_col)
            .orderBy(id_col)
            .limit(sample_size)
            .collect()
        ],
        dtype=np.float64,
    )
    rng = np.random.RandomState(seed)
    centroids = sample[rng.choice(len(sample), size=min(n_cells, len(sample)), replace=False)]
    for _ in range(n_iters):
        d2 = ((sample[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(len(centroids)):
            members = sample[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
    return centroids


def ivf_assign(
    embeddings: DataFrame, centroids: np.ndarray, vec_col: str = "embedding"
) -> DataFrame:
    """Attach the IVF cell id (nearest centroid) — one NumPy distance matrix
    per Arrow batch; centroids ride along in the UDF closure (broadcast-by-
    serialization, tiny)."""
    cents = np.asarray(centroids, dtype=np.float64)

    @F.pandas_udf(T.IntegerType())
    def cell(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="int32")
        m = np.vstack([np.asarray(v, dtype=np.float64) for v in vecs])
        d2 = (m * m).sum(axis=1)[:, None] - 2 * (m @ cents.T) + (cents * cents).sum(axis=1)[None, :]
        return pd.Series(d2.argmin(axis=1).astype("int32"))

    return embeddings.withColumn("ivf_cell", cell(F.col(vec_col)))


def ann_topk_via_ivf(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 2,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF ANN top-k: probe the ``nprobe`` cells nearest the query, exact
    cosine rerank inside them. Scan cost ≈ nprobe/n_cells of the corpus;
    recall tunes with nprobe (nprobe = n_cells → exact search)."""
    if centroids is None:
        centroids = train_ivf_centroids(
            embeddings, n_cells=n_cells, seed=seed, vec_col=vec_col, id_col=id_col
        )
    q = np.asarray(query_vec, dtype=np.float64)
    d2 = ((centroids - q[None, :]) ** 2).sum(axis=1)
    probe = np.argsort(d2, kind="stable")[:nprobe].tolist()
    assigned = ivf_assign(embeddings, centroids, vec_col)
    pruned = assigned.where(F.col("ivf_cell").isin([int(p) for p in probe]))
    return cosine_topk(pruned, query_vec, k, id_col, vec_col)


def batch_ann_topk(
    embeddings: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    seed: int = 42,
    probe_hamming: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k neighbors for EVERY row (the k-NN join): SRP
    bucket self-join, exact cosine rerank inside each candidate set.

    Multi-probe without re-bucketing: the LEFT side explodes its bucket id
    into the Hamming-``probe_hamming`` neighborhood (n_planes+1 keys at
    radius 1), the RIGHT side keeps its own bucket — every pair within one
    plane-flip meets on some key. One explode (constant factor), one shuffle
    on the short bucket key, then a per-query window top-k; candidate count,
    not corpus², bounds the cosine work. Self-pairs excluded; ties break on
    neighbor id so results are deterministic across cluster sizes.
    """
    from pyspark.sql import Window

    # norms computed ONCE per row before the join — inside the pair
    # projection they would re-evaluate per candidate pair (each candidate
    # costs 3 array folds instead of 1)
    bucketed = srp_buckets(embeddings, dim, n_planes, seed, vec_col).select(
        F.col(id_col), F.col(vec_col), F.col("srp_bucket"),
        _norm(F.col(vec_col)).alias("nrm"),
    )
    probes = F.array(
        F.col("srp_bucket"),
        *[
            F.col("srp_bucket").bitwiseXOR(F.lit(1 << b))
            for b in range(n_planes if probe_hamming >= 1 else 0)
        ],
    )
    left = bucketed.select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).alias("qvec"),
        F.col("nrm").alias("qnrm"),
        F.explode(probes).alias("blk"),
    )
    right = bucketed.select(
        F.col(id_col).alias("nid"),
        F.col(vec_col).alias("nvec"),
        F.col("nrm").alias("nnrm"),
        F.col("srp_bucket").alias("blk"),
    )
    denom = F.col("qnrm") * F.col("nnrm")
    sim = F.when(denom > 0, _dot(F.col("qvec"), F.col("nvec")) / denom).otherwise(
        F.lit(0.0)
    )
    pairs = (
        left.join(right, "blk")
        .where(F.col("qid") != F.col("nid"))
        .select("qid", "nid", F.round(sim, 6).alias("cosine"))
        .dropDuplicates(["qid", "nid"])  # met via several probe keys
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "nid", "cosine", "rank")
    )


def _srp_probe_set(
    query_vec: list[float],
    dim: int,
    n_planes: int,
    seed: int,
    probe_hamming: int,
) -> list[int]:
    """The query's SRP bucket plus its Hamming-``probe_hamming`` neighborhood
    — the SINGLE source of probe-set math, shared by the per-query ANN, the
    batch k-NN join's explode, and the recall verdicts (so the verdict
    exercises exactly the production probing)."""
    planes = np.random.RandomState(seed).randn(dim, n_planes)
    qsig = (np.asarray(query_vec, dtype=np.float64) @ planes) > 0
    qbucket = int((qsig @ (1 << np.arange(n_planes, dtype=np.int64))))
    probes = [qbucket]
    if probe_hamming >= 1:
        probes += [qbucket ^ (1 << b) for b in range(n_planes)]
    return probes


def ann_topk_via_srp(
    embeddings: DataFrame,
    query_vec: list[float],
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_hamming: int = 1,
) -> DataFrame:
    """ANN top-k: prune to the query's SRP bucket neighborhood, exact-rank
    inside it.

    ``probe_hamming`` controls multi-probe: 0 scans only the query's own
    bucket (~2^n_planes-fold prune, but a near neighbor on the wrong side of
    ONE hyperplane is missed — a real recall cliff at 16 planes);
    1 (default) also probes every bucket differing in a single bit
    (n_planes+1 buckets — still an exponential prune, recall recovers the
    single-plane-flip misses, the standard multi-probe LSH trade).
    The probe set is an IN filter over the bucket column, so the plan still
    prunes before the exact rerank.
    """
    probes = _srp_probe_set(query_vec, dim, n_planes, seed, probe_hamming)
    bucketed = srp_buckets(embeddings, dim, n_planes, seed, vec_col)
    pruned = bucketed.where(F.col("srp_bucket").isin(probes))
    return cosine_topk(pruned, query_vec, k, id_col, vec_col)


# ----------------------------------------------------------------------
# recall verdicts: ANN quality as a driver-checkable boolean table
# ----------------------------------------------------------------------


def _collect_queries(
    embeddings: DataFrame, n_queries: int, id_col: str, vec_col: str
) -> list[tuple[int, list[float]]]:
    """The ``n_queries`` lowest-id rows as (id, vector) — one tiny collect,
    deterministic under any partitioning (TakeOrdered)."""
    rows = (
        embeddings.select(id_col, vec_col)
        .where(F.col(id_col) < n_queries)
        .orderBy(id_col)
        .collect()
    )
    return [(int(r[id_col]), [float(x) for x in r[vec_col]]) for r in rows]


def _queries_df(spark, queries: list[tuple[int, list[float]]]) -> DataFrame:
    return spark.createDataFrame(
        [(qid, vec) for qid, vec in queries], "qid long, qvec array<double>"
    )


def _multi_topk(
    candidates: DataFrame,
    k: int,
    id_col: str,
    vec_col: str,
    exclude_self: bool = False,
) -> DataFrame:
    """Per-query exact cosine top-k over ``candidates`` (rows carrying a
    ``qid``/``qvec`` pair from a broadcast query join). One window, ties
    broken on id — deterministic across cluster sizes."""
    from pyspark.sql import Window

    scored = candidates.select(
        "qid",
        F.col(id_col).alias("nid"),
        F.round(cosine_similarity_col(F.col(vec_col), F.col("qvec")), 6).alias(
            "cosine"
        ),
    )
    if exclude_self:
        scored = scored.where(F.col("qid") != F.col("nid"))
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("qid", "nid")
    )


#: planted ids live far above any real corpus id so the two never collide
PLANT_ID_OFFSET = 10_000_000


def plant_near_neighbors(
    embeddings: DataFrame,
    n_queries: int,
    eps: float = 0.01,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Append a deterministic ε-perturbed twin of the first ``n_queries``
    rows (twin id = query id + PLANT_ID_OFFSET). The perturbation is a pure
    Spark expression (``sin`` of id×dim+index — no RNG, identical on every
    executor), so twin cosine ≈ 1-ε² and the planted pair is each query's
    unambiguous true nearest neighbor."""
    base = embeddings.select(id_col, vec_col)
    planted = base.where(F.col(id_col) < n_queries).select(
        (F.col(id_col) + PLANT_ID_OFFSET).alias(id_col),
        F.transform(
            F.col(vec_col),
            lambda x, i: x.cast("double")
            + F.lit(eps) * F.sin(F.col(id_col) * 64 + i),
        )
        .cast("array<float>")
        .alias(vec_col),
    )
    return base.unionByName(planted)


def _ann_verdict(
    approx_topk: DataFrame,
    exact_topk: DataFrame,
    queries_df: DataFrame,
    k: int,
    recall_floor: float,
) -> DataFrame:
    """(query_id, ann_ok): per query, the planted twin (id + PLANT_ID_OFFSET)
    must appear in the approximate top-k — the LSH locality guarantee — AND
    overlap with the exact top-k must clear ``recall_floor``. All joins are
    on short (qid, nid) keys; the query list is broadcast-tiny."""
    hits = (
        approx_topk.join(exact_topk, ["qid", "nid"])
        .groupBy("qid")
        .agg(
            F.count("*").alias("n_hits"),
            F.max(
                (F.col("nid") == F.col("qid") + PLANT_ID_OFFSET).cast("int")
            ).alias("planted_hit"),
        )
    )
    return (
        queries_df.select("qid")
        .join(hits, "qid", "left")
        .select(
            F.col("qid").cast("long").alias("query_id"),
            (
                (F.coalesce(F.col("planted_hit"), F.lit(0)) == 1)
                & (
                    F.coalesce(F.col("n_hits"), F.lit(0))
                    >= F.lit(recall_floor * k)
                )
            ).alias("ann_ok"),
        )
    )


def srp_ann_verdict(
    embeddings: DataFrame,
    n_queries: int = 8,
    k: int = 10,
    n_planes: int = 4,
    seed: int = 42,
    probe_hamming: int = 1,
    recall_floor: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """DRIVER-CHECKED verdict for SRP ANN, per query: the planted ε-twin is
    recovered in the multi-probe top-k AND recall@k vs the exact cosine
    baseline clears the floor.

    The probe sets come from ``_srp_probe_set`` — the same math
    ``ann_topk_via_srp`` uses — and the corpus bucketing is the production
    ``srp_buckets`` UDF, so a regression in planes/seeding/probing flips
    verdict rows. Unlike the per-query function, ALL queries ride ONE
    bucketed corpus scan (probe keys broadcast) — the multi-query shape a
    real retrieval job uses.
    """
    spark = embeddings.sparkSession
    corpus = plant_near_neighbors(embeddings, n_queries, id_col=id_col, vec_col=vec_col)
    queries = _collect_queries(embeddings, n_queries, id_col, vec_col)
    dim = len(queries[0][1])
    probe_rows = [
        (qid, blk)
        for qid, vec in queries
        for blk in _srp_probe_set(vec, dim, n_planes, seed, probe_hamming)
    ]
    probes_df = spark.createDataFrame(probe_rows, "qid long, blk long")
    qdf = _queries_df(spark, queries)

    bucketed = srp_buckets(corpus, dim, n_planes, seed, vec_col)
    ann_cand = (
        bucketed.join(
            F.broadcast(probes_df), bucketed["srp_bucket"] == probes_df["blk"]
        )
        .join(F.broadcast(qdf), "qid")
        .dropDuplicates([  # a row can match several probe keys of one query
            "qid", id_col,
        ])
    )
    approx = _multi_topk(ann_cand, k, id_col, vec_col)
    exact = _multi_topk(corpus.crossJoin(F.broadcast(qdf)), k, id_col, vec_col)
    return _ann_verdict(approx, exact, qdf, k, recall_floor)


def ivf_ann_verdict(
    embeddings: DataFrame,
    n_queries: int = 8,
    k: int = 10,
    n_cells: int = 8,
    nprobe: int = 2,
    seed: int = 42,
    recall_floor: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """DRIVER-CHECKED verdict for IVF ANN, per query: planted ε-twin
    recovered by nprobe-cell search AND recall@k clears the floor. Centroids
    train ONCE (the production ``train_ivf_centroids``) and every query rides
    one assigned-corpus scan; probe cells use the same nearest-centroid
    argsort as ``ann_topk_via_ivf``."""
    spark = embeddings.sparkSession
    corpus = plant_near_neighbors(embeddings, n_queries, id_col=id_col, vec_col=vec_col)
    queries = _collect_queries(embeddings, n_queries, id_col, vec_col)
    centroids = train_ivf_centroids(
        embeddings, n_cells=n_cells, seed=seed, vec_col=vec_col, id_col=id_col
    )
    probe_rows = []
    for qid, vec in queries:
        q = np.asarray(vec, dtype=np.float64)
        d2 = ((centroids - q[None, :]) ** 2).sum(axis=1)
        for cell in np.argsort(d2, kind="stable")[:nprobe].tolist():
            probe_rows.append((qid, int(cell)))
    probes_df = spark.createDataFrame(probe_rows, "qid long, cell int")
    qdf = _queries_df(spark, queries)

    assigned = ivf_assign(corpus, centroids, vec_col)
    ivf_cand = assigned.join(
        F.broadcast(probes_df), assigned["ivf_cell"] == probes_df["cell"]
    ).join(F.broadcast(qdf), "qid")
    approx = _multi_topk(ivf_cand, k, id_col, vec_col)
    exact = _multi_topk(corpus.crossJoin(F.broadcast(qdf)), k, id_col, vec_col)
    return _ann_verdict(approx, exact, qdf, k, recall_floor)


def batch_knn_verdict(
    embeddings: DataFrame,
    dim: int,
    n_queries: int = 50,
    k: int = 5,
    n_planes: int = 8,
    seed: int = 42,
    probe_hamming: int = 1,
    recall_floor: float = 0.2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """DRIVER-CHECKED verdict for the batch k-NN join: run the FULL
    production ``batch_ann_topk`` over the planted corpus (every row gets
    neighbors), then require each of the first ``n_queries`` rows to recover
    its planted ε-twin in top-k with exact-overlap ≥ the floor. At 8 planes
    the bucket count exceeds small test corpora — generic-neighbor recall is
    legitimately low there — so the twin recovery (cosine ≈ 1, same bucket
    w.h.p., Hamming-1 probed) is the property that must hold at ANY scale."""
    spark = embeddings.sparkSession
    corpus = plant_near_neighbors(embeddings, n_queries, id_col=id_col, vec_col=vec_col)
    approx = (
        batch_ann_topk(
            corpus, dim, k, n_planes, seed, probe_hamming, id_col, vec_col
        )
        .where(F.col("qid") < n_queries)
        .select("qid", "nid")
    )
    queries = _collect_queries(embeddings, n_queries, id_col, vec_col)
    qdf = _queries_df(spark, queries)
    exact = _multi_topk(
        corpus.crossJoin(F.broadcast(qdf)), k, id_col, vec_col, exclude_self=True
    )
    return _ann_verdict(approx, exact, qdf, k, recall_floor)


# ----------------------------------------------------------------------
# SemDeDup: embedding-cluster semantic deduplication
# ----------------------------------------------------------------------


def semantic_dedup(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_size: int = 4096,
    seed: int = 42,
    max_cell_rows: int = 65536,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): cluster the corpus embeddings with the
    IVF coarse quantizer, find intra-cluster cosine near-duplicates, and
    keep one representative per duplicate group.

    Composition of the repo's scale pieces, each already verdict-checked:

      1. ``train_ivf_centroids`` — seeded k-means on a bounded driver
         sample (tiny, one-off);
      2. ``ivf_assign`` — one NumPy distance matrix per Arrow batch;
      3. ``embedding_near_dup_pairs_blas`` blocked on the cell — one Gram
         matmul per cluster, never corpus²; ``max_cell_rows`` is the same
         OOM guard (re-cluster with larger ``n_cells`` if a cell overflows:
         the paper's recipe scales k with corpus size for exactly this
         reason);
      4. ``dedup.connected_components`` over the ≥ threshold pairs —
         keep-policy = component minimum, deterministic across runs and
         cluster sizes.

    Grouping is the transitive closure of the ≥ threshold relation within
    a cell (the paper greedily keeps one item per ε-ball; closure is the
    order-free deterministic variant of the same idea — every dropped row
    has a ≥ threshold edge into its component by construction).

    Returns every input row as ``(vec_id, cell, rep_id, keep)`` —
    downstream keeps ``keep`` rows; the verdict and lineage both want the
    dropped rows visible rather than silently filtered.
    """
    from .dedup import connected_components

    cents = train_ivf_centroids(
        embeddings,
        n_cells=n_cells,
        sample_size=sample_size,
        seed=seed,
        vec_col=vec_col,
        id_col=id_col,
    )
    cells = ivf_assign(embeddings, cents, vec_col=vec_col)
    pairs = embedding_near_dup_pairs_blas(
        cells,
        threshold=threshold,
        block_col="ivf_cell",
        id_col=id_col,
        vec_col=vec_col,
        max_block_rows=max_cell_rows,
    )
    comp = connected_components(
        pairs, nodes=embeddings.select(id_col), id_a="id_a", id_b="id_b"
    )
    return (
        cells.select(id_col, F.col("ivf_cell").alias("cell"))
        .join(
            comp.select(
                F.col("doc_id").alias(id_col), F.col("component").alias("rep_id")
            ),
            id_col,
        )
        .withColumn("keep", F.col("rep_id") == F.col(id_col))
    )


def semantic_dedup_verdict(
    embeddings: DataFrame,
    n_plants: int = 8,
    threshold: float = 0.95,
    n_cells: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup as a driver-checkable boolean table: plant an ε-twin of the
    first ``n_plants`` rows, run the FULL production pipeline, and emit
    ``(query_id, semdedup_ok)`` where ok requires, per planted pair:

      * the original and its twin land in the same duplicate component
        (the clustering did not split an ε-ball across cells);
      * their component keeps EXACTLY ONE member (dedup actually dropped
        the duplicates);
      * the keeper is the component's minimum id (the documented policy).
    """
    planted = plant_near_neighbors(
        embeddings, n_plants, id_col=id_col, vec_col=vec_col
    )
    out = semantic_dedup(
        planted,
        threshold=threshold,
        n_cells=n_cells,
        id_col=id_col,
        vec_col=vec_col,
    )
    comp_stats = out.groupBy("rep_id").agg(
        F.sum(F.col("keep").cast("int")).alias("n_keep"),
        F.min(id_col).alias("comp_min"),
    )
    facts = (
        out.join(comp_stats, "rep_id")
        .select(
            id_col,
            "rep_id",
            "n_keep",
            (F.col("comp_min") == F.col("rep_id")).alias("rep_is_min"),
        )
    )
    orig = facts.where(F.col(id_col) < n_plants).alias("o")
    twin = facts.where(
        (F.col(id_col) >= PLANT_ID_OFFSET)
        & (F.col(id_col) < PLANT_ID_OFFSET + n_plants)
    ).alias("t")
    return (
        orig.join(
            twin,
            F.col(f"o.{id_col}") + PLANT_ID_OFFSET == F.col(f"t.{id_col}"),
        )
        .select(
            F.col(f"o.{id_col}").cast("long").alias("query_id"),
            (
                (F.col("o.rep_id") == F.col("t.rep_id"))
                & (F.col("o.n_keep") == 1)
                & F.col("o.rep_is_min")
            ).alias("semdedup_ok"),
        )
        .orderBy("query_id")
    )


# ----------------------------------------------------------------------
# Product quantization (PQ): the compressed-ANN tier
# ----------------------------------------------------------------------
#
# SRP prunes by bucket, IVF prunes by cell — both still rerank against the
# FULL float vectors. PQ attacks the other axis: memory. Each vector is
# split into ``m`` subspaces and every subspace is replaced by the index of
# its nearest codeword (Jégou et al., "Product Quantization for Nearest
# Neighbor Search", TPAMI 2011) — 64 floats (256 B) become m=8 bytes, a 32×
# compression, which is what lets a 10^12-vector store sit in cluster RAM.
# Search is ADC (asymmetric distance computation): the query stays float,
# each subspace contributes a table lookup ``lut[sub][code]`` built ONCE per
# query on the driver (m × n_codes doubles — broadcast-tiny), so scoring a
# row is m adds, no float vectors touched. The top-``rerank`` ADC candidates
# are then reranked with exact cosine — the standard IVF-PQ refinement step.


def _lloyd(sample: np.ndarray, k: int, seed: int, n_iters: int) -> np.ndarray:
    """Seeded Lloyd's k-means (same recipe as ``train_ivf_centroids``:
    deterministic init, fixed iterations, stable ties)."""
    rng = np.random.RandomState(seed)
    cents = sample[rng.choice(len(sample), size=min(k, len(sample)), replace=False)]
    for _ in range(n_iters):
        d2 = ((sample[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(len(cents)):
            members = sample[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return cents


def train_pq_codebooks(
    embeddings: DataFrame,
    m: int = 8,
    n_codes: int = 16,
    sample_size: int = 4096,
    n_iters: int = 10,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """(m, n_codes, dim/m) codebooks — one seeded k-means per subspace on a
    bounded driver sample (the ``sample_size`` lowest ids, a TakeOrdered —
    stable across partitionings/cluster sizes). Training is tiny and
    one-off; the corpus-sized encode stays distributed."""
    sample = np.array(
        [
            list(r[vec_col])
            for r in embeddings.select(id_col, vec_col)
            .orderBy(id_col)
            .limit(sample_size)
            .collect()
        ],
        dtype=np.float64,
    )
    dim = sample.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    d_sub = dim // m
    return np.stack(
        [
            _lloyd(sample[:, s * d_sub : (s + 1) * d_sub], n_codes, seed + s, n_iters)
            for s in range(m)
        ]
    )


def pq_encode(
    embeddings: DataFrame, codebooks: np.ndarray, vec_col: str = "embedding"
) -> DataFrame:
    """Attach ``pq_code: array<int>`` (m nearest-codeword indices). One
    NumPy distance matrix per subspace per Arrow batch; codebooks ride in
    the UDF closure (broadcast-by-serialization, m × n_codes × d_sub
    doubles). Ties to the lowest code index (argmin), deterministic."""
    books = np.asarray(codebooks, dtype=np.float64)
    m, _, d_sub = books.shape

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def code(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="object")
        mat = np.vstack([np.asarray(v, dtype=np.float64) for v in vecs])
        cols = []
        for s in range(m):
            sub = mat[:, s * d_sub : (s + 1) * d_sub]
            cents = books[s]
            d2 = (
                (sub * sub).sum(axis=1)[:, None]
                - 2 * (sub @ cents.T)
                + (cents * cents).sum(axis=1)[None, :]
            )
            cols.append(d2.argmin(axis=1).astype("int32"))
        codes = np.stack(cols, axis=1)
        return pd.Series([row.tolist() for row in codes])

    return embeddings.withColumn("pq_code", code(F.col(vec_col)))


def _adc_luts(queries: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """(n_q, m, n_codes) squared-L2 lookup tables: lut[q, s, c] =
    ||query_sub - codeword||² — the ADC additive decomposition."""
    n_q = queries.shape[0]
    m, n_codes, d_sub = codebooks.shape
    luts = np.empty((n_q, m, n_codes), dtype=np.float64)
    for s in range(m):
        qs = queries[:, s * d_sub : (s + 1) * d_sub]
        diff = qs[:, None, :] - codebooks[s][None, :, :]
        luts[:, s, :] = (diff * diff).sum(axis=2)
    return luts


def _adc_score_col(luts: np.ndarray):
    """pandas UDF: pq_code → array<double> of per-query ADC distances.
    Scoring is pure table addition — the float vectors never load."""
    tables = np.ascontiguousarray(luts)
    n_q, m, _ = tables.shape

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def adc(codes: pd.Series) -> pd.Series:
        if len(codes) == 0:
            return pd.Series([], dtype="object")
        cm = np.vstack([np.asarray(c, dtype=np.int64) for c in codes])  # (B, m)
        acc = np.zeros((len(cm), n_q), dtype=np.float64)
        for s in range(m):
            acc += tables[:, s, :][:, cm[:, s]].T  # (B, n_q)
        return pd.Series([row.tolist() for row in acc])

    return adc


def ann_topk_via_pq(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    m: int = 8,
    n_codes: int = 16,
    rerank: int = 50,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebooks: np.ndarray | None = None,
) -> DataFrame:
    """PQ ANN top-k: ADC-score every row from its m-byte code (table adds
    only), TakeOrdered the best ``rerank`` candidates, exact cosine rerank.
    rerank = |corpus| degenerates to exact search (tested)."""
    if codebooks is None:
        codebooks = train_pq_codebooks(
            embeddings, m=m, n_codes=n_codes, seed=seed, vec_col=vec_col, id_col=id_col
        )
    q = np.asarray(query_vec, dtype=np.float64)[None, :]
    luts = _adc_luts(q, codebooks)
    encoded = pq_encode(embeddings, codebooks, vec_col)
    scored = encoded.withColumn(
        "adc", F.element_at(_adc_score_col(luts)(F.col("pq_code")), 1)
    )
    pruned = scored.orderBy(F.asc("adc"), F.asc(id_col)).limit(rerank)
    return cosine_topk(pruned, query_vec, k, id_col, vec_col)


def pq_ann_verdict(
    embeddings: DataFrame,
    n_queries: int = 8,
    k: int = 10,
    m: int = 8,
    n_codes: int = 16,
    rerank: int = 50,
    seed: int = 42,
    recall_floor: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """DRIVER-CHECKED verdict for PQ ANN, per query: the planted ε-twin is
    recovered through the FULL compressed path (codebooks → m-byte codes →
    ADC table scoring → top-``rerank`` prune → exact rerank) AND recall@k vs
    exact cosine clears the floor. All queries ride ONE encoded-corpus scan
    (their LUTs stack into a single (n_q, m, n_codes) closure array); the
    per-query prune is a window top-``rerank`` on the ADC score."""
    from pyspark.sql import Window

    spark = embeddings.sparkSession
    corpus = plant_near_neighbors(embeddings, n_queries, id_col=id_col, vec_col=vec_col)
    queries = _collect_queries(embeddings, n_queries, id_col, vec_col)
    codebooks = train_pq_codebooks(
        embeddings, m=m, n_codes=n_codes, seed=seed, vec_col=vec_col, id_col=id_col
    )
    qmat = np.array([vec for _, vec in queries], dtype=np.float64)
    luts = _adc_luts(qmat, codebooks)
    qdf = _queries_df(spark, queries)

    encoded = pq_encode(corpus, codebooks, vec_col)
    scored = encoded.select(
        id_col,
        vec_col,
        F.posexplode(_adc_score_col(luts)(F.col("pq_code"))).alias("qpos", "adc"),
    )
    w = Window.partitionBy("qpos").orderBy(F.asc("adc"), F.asc(id_col))
    cand = (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= rerank)
        .withColumn("qid", F.col("qpos").cast("long"))
        .join(F.broadcast(qdf), "qid")
    )
    approx = _multi_topk(cand, k, id_col, vec_col)
    exact = _multi_topk(corpus.crossJoin(F.broadcast(qdf)), k, id_col, vec_col)
    return _ann_verdict(approx, exact, qdf, k, recall_floor)
