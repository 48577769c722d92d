"""Count-min sketch heavy hitters (operators/sketches.py)."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from autoextract.operators.sketches import (
    cms_estimate,
    cms_sketch,
    heavy_hitters,
)


def _corpus(spark, n=300):
    # zipf-ish: token tN appears ~n/N times
    rows = []
    for i in range(n):
        words = ["the"] * 3 + [f"w{i % 10}"] * 2 + [f"rare{i}"]
        rows.append((i, " ".join(words)))
    return spark.createDataFrame(rows, "doc_id long, text string"), rows


def test_sketch_bounded_and_overestimates(spark):
    df, rows = _corpus(spark)
    sk = cms_sketch(df, width=64, depth=3).collect()
    assert len(sk) <= 64 * 3
    # total mass per row equals the token count
    n_tokens = sum(len(t.split()) for _, t in rows)
    per_row = Counter()
    for r in sk:
        per_row[r["row"]] += r["cnt"]
    assert all(v == n_tokens for v in per_row.values())

    truth = Counter(w for _, t in rows for w in t.split())
    cand = spark.createDataFrame(
        [(w,) for w in truth], "token string")
    est = cms_estimate(cms_sketch(df, width=64, depth=3), cand,
                       width=64, depth=3).collect()
    for r in est:
        assert r["est"] >= truth[r["token"]]   # CMS never undercounts


def test_heavy_hitters_exact_even_with_collisions(spark):
    df, rows = _corpus(spark)
    truth = Counter(w for _, t in rows for w in t.split())
    expected = {w: c for w, c in truth.items() if c >= 100}
    # width=8 forces heavy collision: candidates inflate, answer must not
    got = {r["token"]: r["n"]
           for r in heavy_hitters(df, min_count=100, width=8,
                                  depth=2).collect()}
    assert got == expected
    # a comfortable width gives the same answer
    got2 = {r["token"]: r["n"]
            for r in heavy_hitters(df, min_count=100, width=4096,
                                   depth=4).collect()}
    assert got2 == expected


def test_unknown_token_estimates_zero_when_row_empty(spark):
    df = spark.createDataFrame([(1, "a a b")], "doc_id long, text string")
    sk = cms_sketch(df, width=1024, depth=4)
    cand = spark.createDataFrame([("zzz-not-there",)], "token string")
    est = cms_estimate(sk, cand, width=1024, depth=4).collect()[0]
    # unseen token may alias into an occupied cell, but with 3 tokens in
    # 1024 cells at least one of 4 probes lands empty → bound 0
    assert est["est"] == 0


def test_min_frac_threshold(spark):
    df, rows = _corpus(spark)
    truth = Counter(w for _, t in rows for w in t.split())
    total = sum(truth.values())
    import math
    thr = math.ceil(0.05 * total)
    expected = {w: c for w, c in truth.items() if c >= thr}
    got = {r["token"]: r["n"]
           for r in heavy_hitters(df, min_frac=0.05, width=512,
                                  depth=3).collect()}
    assert got == expected and expected   # non-trivial

    import pytest
    with pytest.raises(ValueError):
        heavy_hitters(df)
    with pytest.raises(ValueError):
        heavy_hitters(df, min_count=1, min_frac=0.1)


def test_empty_and_null_text(spark):
    df = spark.createDataFrame(
        [(1, "x x x"), (2, ""), (3, None), (4, "   ")],
        "doc_id long, text string")
    got = heavy_hitters(df, min_count=3, width=64, depth=2).collect()
    assert [(r["token"], r["n"]) for r in got] == [("x", 3)]
