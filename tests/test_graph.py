"""PageRank: mass conservation, NumPy reference parity, structure sanity."""

from __future__ import annotations

import numpy as np
import pytest

from autoextract.operators.graph import pagerank, pagerank_oracle_sql


def _edges_df(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _numpy_pagerank(pairs, n_iter=10, d=0.85):
    nodes = sorted({u for u, _ in pairs} | {v for _, v in pairs})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    uniq = sorted(set(pairs))
    deg = np.zeros(n)
    for u, _ in uniq:
        deg[idx[u]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        dangling = r[deg == 0].sum()
        contrib = np.zeros(n)
        for u, v in uniq:
            contrib[idx[v]] += r[idx[u]] / deg[idx[u]]
        r = (1 - d) / n + d * (contrib + dangling / n)
    return {v: r[idx[v]] for v in nodes}


PAIRS = [(i, (i * 3 + 1) % 7) for i in range(20) if i % 4 != 0] + [
    (2, 5), (2, 5),  # duplicate edge must collapse
]


def test_matches_numpy_reference(spark):
    got = {r["node"]: r["rank"] for r in pagerank(_edges_df(spark, PAIRS)).collect()}
    want = _numpy_pagerank(PAIRS)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)


def test_mass_conserved_and_ring_uniform(spark):
    ring = [(i, (i + 1) % 8) for i in range(8)]
    ranks = [r["rank"] for r in pagerank(_edges_df(spark, ring), n_iter=5).collect()]
    assert sum(ranks) == pytest.approx(1.0, abs=1e-12)
    assert all(r == pytest.approx(1.0 / 8, abs=1e-12) for r in ranks)


def test_hub_outranks_leaves_and_partition_invariant(spark):
    star = [(i, 0) for i in range(1, 12)]  # everything points at node 0
    a = {r["node"]: r["rank"] for r in pagerank(_edges_df(spark, star).repartition(5)).collect()}
    b = {r["node"]: r["rank"] for r in pagerank(_edges_df(spark, star).repartition(2)).collect()}
    assert a == b
    assert a[0] > max(v for k, v in a.items() if k != 0) * 5


def test_validation_params(spark):
    df = _edges_df(spark, [(1, 2)])
    with pytest.raises(ValueError):
        pagerank(df, n_iter=0)
    with pytest.raises(ValueError):
        pagerank(df, damping=1.0)


def test_oracle_sql_replays_numpy(spark):
    import duckdb

    con = duckdb.connect()
    vals = ", ".join(f"({u}, {v})" for u, v in PAIRS)
    sql = pagerank_oracle_sql(
        f"SELECT col0 AS src, col1 AS dst FROM (VALUES {vals})"
    )
    got = dict(con.execute(sql).fetchall())
    want = _numpy_pagerank(PAIRS)
    for v in want:
        assert got[v] == pytest.approx(round(want[v], 8), abs=1e-8)
