"""Product-quantization ANN (`similarity.train_pq_codebooks` /
`pq_encode` / `ann_topk_via_pq` / `pq_ann_verdict`).

PQ is the memory tier of the ANN family (SRP prunes by bucket, IVF by
cell; PQ compresses the vectors themselves 32× so a 10^12-row store fits
in cluster RAM). The invariants tested here are the ones that must hold
at any scale: deterministic codes, codes in range, rerank=|corpus| ≡
exact search, planted-twin recovery through the full compressed path,
and partition invariance of the encode."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from autoextract.operators import similarity as SIM

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


def test_codebook_shape_and_determinism(emb):
    b1 = SIM.train_pq_codebooks(emb, m=8, n_codes=16)
    b2 = SIM.train_pq_codebooks(emb, m=8, n_codes=16)
    assert b1.shape == (8, 16, 8)
    assert np.array_equal(b1, b2)


def test_dim_not_divisible_raises(emb):
    with pytest.raises(ValueError, match="not divisible"):
        SIM.train_pq_codebooks(emb, m=7)


def test_codes_in_range_and_partition_invariant(emb):
    books = SIM.train_pq_codebooks(emb, m=8, n_codes=16)
    enc1 = SIM.pq_encode(emb, books).select("vec_id", "pq_code")
    rows1 = {r["vec_id"]: r["pq_code"] for r in enc1.collect()}
    assert all(len(c) == 8 and all(0 <= x < 16 for x in c) for c in rows1.values())
    enc2 = SIM.pq_encode(emb.repartition(13), books).select("vec_id", "pq_code")
    rows2 = {r["vec_id"]: r["pq_code"] for r in enc2.collect()}
    assert rows1 == rows2


def test_full_rerank_equals_exact(emb):
    q = [float(x) for x in emb.orderBy("vec_id").first()["embedding"]]
    n = emb.count()
    exact = [r.asDict() for r in SIM.cosine_topk(emb, q, 7).collect()]
    viapq = [r.asDict() for r in SIM.ann_topk_via_pq(emb, q, 7, rerank=n).collect()]
    assert exact == viapq


def test_adc_prune_recovers_self_and_twin(emb):
    # the query row itself (ADC distance = quantization error only) must
    # survive a tight prune and rank first in the rerank
    q = [float(x) for x in emb.orderBy("vec_id").first()["embedding"]]
    top = SIM.ann_topk_via_pq(emb, q, 3, rerank=25).collect()
    assert top[0]["vec_id"] == 0


def test_verdict_all_true(emb):
    v = SIM.pq_ann_verdict(emb, n_queries=8, k=10)
    rows = v.orderBy("query_id").collect()
    assert len(rows) == 8
    assert all(r["ann_ok"] for r in rows)


def test_adc_scores_match_numpy_reference(emb):
    """The distributed ADC sum of table lookups equals the direct NumPy
    ||q_sub - codeword(code_sub)||² sum, row for row."""
    books = SIM.train_pq_codebooks(emb, m=8, n_codes=16)
    rows = emb.orderBy("vec_id").limit(20).collect()
    q = np.asarray([float(x) for x in rows[0]["embedding"]], dtype=np.float64)
    luts = SIM._adc_luts(q[None, :], books)
    sub = emb.where(F.col("vec_id") < 20)
    scored = (
        SIM.pq_encode(sub, books)
        .withColumn("adc", F.element_at(SIM._adc_score_col(luts)(F.col("pq_code")), 1))
        .orderBy("vec_id")
        .collect()
    )
    m, _, d_sub = books.shape
    for r in scored:
        vec = np.asarray([float(x) for x in r["embedding"]], dtype=np.float64)
        expect = 0.0
        for s in range(m):
            cents = books[s]
            seg = vec[s * d_sub : (s + 1) * d_sub]
            code = ((cents - seg[None, :]) ** 2).sum(axis=1).argmin()
            qseg = q[s * d_sub : (s + 1) * d_sub]
            expect += ((qseg - cents[code]) ** 2).sum()
        assert abs(r["adc"] - expect) < 1e-9
