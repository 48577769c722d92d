"""Tests for corpus-assembly sampling: per-source quota downsampling and
deterministic shard layout (autoextract/operators/sampling.py)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from autoextract.operators.sampling import (
    _HASH_SPACE,
    shard_assignment,
    source_quota_sample,
)


def _h32(key: str, salt: str) -> int:
    return int(hashlib.md5(f"{key}{salt}".encode()).hexdigest()[:8], 16)


@pytest.fixture(scope="module")
def docs(spark):
    # 3 sources with very different sizes: "big" must be downsampled,
    # "small" kept whole, "edge" sits exactly at the cap
    rows = (
        [(i, "big") for i in range(600)]
        + [(1000 + i, "small") for i in range(40)]
        + [(2000 + i, "edge") for i in range(100)]
    )
    return spark.createDataFrame(rows, "doc_id: long, source: string")


def test_quota_matches_python_reference(docs):
    cap = 100
    kept = {
        r["doc_id"]: r["n_source_docs"]
        for r in source_quota_sample(docs, cap=cap).collect()
    }
    # python reference: identical rule, row-by-row
    for doc_id, source, n in [
        (i, "big", 600) for i in range(600)
    ] + [(1000 + i, "small", 40) for i in range(40)] + [
        (2000 + i, "edge", 100) for i in range(100)
    ]:
        expect = n <= cap or _h32(str(doc_id), "quota-v1") < cap / n * _HASH_SPACE
        assert (doc_id in kept) == expect, (doc_id, source)
        if doc_id in kept:
            assert kept[doc_id] == n


def test_quota_keeps_small_sources_whole_and_downsamples_big(docs):
    out = source_quota_sample(docs, cap=100)
    by_source = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert by_source["small"] == 40  # under cap: untouched
    assert by_source["edge"] == 100  # at cap: untouched
    # big: ~cap kept (binomial around 100 of 600); generous 3-sigma band
    assert 60 <= by_source["big"] <= 140


def test_quota_sample_is_superset_stable(docs):
    """Raising the cap only ADDS documents (hash-threshold property)."""
    k50 = {r["doc_id"] for r in source_quota_sample(docs, cap=50).collect()}
    k100 = {r["doc_id"] for r in source_quota_sample(docs, cap=100).collect()}
    assert k50 <= k100


def test_quota_rejects_bad_cap(docs):
    with pytest.raises(ValueError):
        source_quota_sample(docs, cap=0)


def test_shard_assignment_matches_python_reference(spark):
    df = spark.range(500).select(F.col("id").alias("doc_id"))
    out = {(r["doc_id"]): (r["shard"], r["pos"])
           for r in shard_assignment(df, n_shards=8).collect()}
    # python reference: same hashes, same per-shard ordering
    ref = {}
    per_shard = {}
    for i in range(500):
        s = _h32(str(i), "shard-v1") % 8
        per_shard.setdefault(s, []).append((_h32(str(i), "shard-v1/order"), i))
    for s, lst in per_shard.items():
        for pos, (_, i) in enumerate(sorted(lst)):
            ref[i] = (s, pos)
    assert out == ref


def test_shard_positions_are_dense_and_unique(spark):
    df = spark.range(300).select(F.col("id").alias("doc_id"))
    out = shard_assignment(df, n_shards=4)
    per = (
        out.groupBy("shard")
        .agg(F.count("*").alias("n"), F.min("pos").alias("lo"),
             F.max("pos").alias("hi"),
             F.countDistinct("pos").alias("d"))
        .collect()
    )
    assert {r["shard"] for r in per} == {0, 1, 2, 3}
    for r in per:
        assert r["lo"] == 0 and r["hi"] == r["n"] - 1 and r["d"] == r["n"]


def test_shard_assignment_independent_of_partitioning(spark):
    df1 = spark.range(400).select(F.col("id").alias("doc_id")).repartition(1)
    df7 = spark.range(400).select(F.col("id").alias("doc_id")).repartition(7)
    a = sorted(map(tuple, shard_assignment(df1, n_shards=5).collect()))
    b = sorted(map(tuple, shard_assignment(df7, n_shards=5).collect()))
    assert a == b


def test_temperature_sample_flattens_mixture(spark):
    from autoextract.operators.sampling import temperature_mixture_sample

    # 900-doc mega source vs two 50-doc rare sources, alpha=0.5
    rows = [(i, "mega" if i < 900 else ("a" if i < 950 else "b")) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = temperature_mixture_sample(df, alpha=0.5, target_total=300)
    per = {r["source"]: r["n"] for r in
           out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    # rare sources: rate = 300*sqrt(50)/(sqrt(900)+2*sqrt(50))/50 ~ 0.96
    # -> nearly everything kept (~48 of 50 expected)
    assert 40 <= per["a"] <= 50 and 40 <= per["b"] <= 50
    # mega: target share = sqrt(900)/(sqrt(900)+2*sqrt(50)) ~ 0.68 of 300
    # ~ 204 expected of 900 (a 0.23 rate vs 0.90 raw share: flattened);
    # binomial noise is ~ +-13 at one sigma
    assert 150 < per["mega"] < 260
    # the mixture is genuinely flattened: mega's kept share is far below
    # its 90% raw share
    assert per["mega"] / sum(per.values()) < 0.75


def test_temperature_sample_deterministic_and_validated(spark):
    import pytest as _pt

    from autoextract.operators.sampling import temperature_mixture_sample

    df = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 3).cast("string")).alias("source"),
    )
    a = sorted(map(tuple, temperature_mixture_sample(df.repartition(1)).collect()))
    b = sorted(map(tuple, temperature_mixture_sample(df.repartition(9)).collect()))
    assert a == b
    with _pt.raises(ValueError):
        temperature_mixture_sample(df, alpha=0.0)
    with _pt.raises(ValueError):
        temperature_mixture_sample(df, target_total=0)


def _skewed_docs(spark, n=600):
    # one mega host with 70% of rows, long tail for the rest
    rows = [
        (i, "mega" if i % 10 < 7 else f"host-{i % 10}", (i * 37) % 500)
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, n_chars long")


def test_host_cap_two_phase_equals_single_phase(spark):
    from autoextract.operators.sampling import host_cap_topk

    d = _skewed_docs(spark).repartition(7)
    one = host_cap_topk(d, cap=25, priority_col="n_chars")
    two = host_cap_topk(d, cap=25, priority_col="n_chars", salt_parts=8)
    assert sorted(map(tuple, one.collect())) == sorted(map(tuple, two.collect()))


def test_host_cap_exact_and_priority_ordered(spark):
    from autoextract.operators.sampling import host_cap_topk

    d = _skewed_docs(spark)
    out = host_cap_topk(d, cap=25, priority_col="n_chars", salt_parts=4).collect()
    by_host = {}
    for r in out:
        by_host.setdefault(r["source"], []).append(r)
    assert len(by_host["mega"]) == 25  # hard cap on the mega host
    src = {(r["doc_id"]): r for r in _skewed_docs(spark).collect()}
    for host, rows in by_host.items():
        rows.sort(key=lambda r: r["rank"])
        prios = [src[r["doc_id"]]["n_chars"] for r in rows]
        assert prios == sorted(prios, reverse=True)  # best-first
        # nothing outside the kept set beats the worst kept priority
        host_all = sorted(
            (v["n_chars"] for v in src.values() if v["source"] == host),
            reverse=True,
        )
        assert prios[-1] >= host_all[len(rows) - 1]


def test_host_cap_no_priority_is_hash_order_and_partition_invariant(spark):
    from autoextract.operators.sampling import host_cap_topk

    d = _skewed_docs(spark)
    a = host_cap_topk(d.repartition(3), cap=10, salt_parts=8).collect()
    b = host_cap_topk(d.repartition(11), cap=10, salt_parts=8).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_host_cap_rejects_bad_cap(spark):
    from autoextract.operators.sampling import host_cap_topk

    with pytest.raises(ValueError):
        host_cap_topk(_skewed_docs(spark), cap=0)


# ---------------------------------------------------------------- DSIR


def _dsir_corpus(spark):
    """Two vocabularies: 'alpha beta …' docs (target-like) vs 'zig zag …'
    docs; target = the alpha-vocabulary half with doc_id < 6."""
    rows = []
    for i in range(24):
        if i % 2 == 0:
            text = "alpha beta gamma delta alpha beta " * 3
        else:
            text = "zig zag zip zap zig zag " * 3
        rows.append((i, text.strip()))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dsir_weights_prefer_target_vocabulary(spark):
    from autoextract.operators.sampling import dsir_importance_weights

    raw = _dsir_corpus(spark)
    target = raw.where((F.col("doc_id") % 2 == 0) & (F.col("doc_id") < 6))
    w = {r.doc_id: r.log_w for r in dsir_importance_weights(raw, target).collect()}
    assert len(w) == 24  # every raw row keeps a weight
    alpha = [w[i] for i in range(24) if i % 2 == 0]
    other = [w[i] for i in range(24) if i % 2 == 1]
    assert min(alpha) > max(other)


def test_dsir_weights_python_reference(spark):
    import math

    from autoextract.operators.sampling import dsir_importance_weights

    raw = _dsir_corpus(spark)
    target = raw.where(F.col("doc_id") < 6)
    nb = 16

    def buckets(text):
        toks = [t for t in text.split() if t]
        return [
            _h32(f"{a} {b}", "dsir-v1") % nb for a, b in zip(toks, toks[1:])
        ]

    rows = raw.collect()
    tgt_ids = {r.doc_id for r in rows if r.doc_id < 6}
    rc, tc = {}, {}
    for r in rows:
        for b in buckets(r.text):
            rc[b] = rc.get(b, 0) + 1
            if r.doc_id in tgt_ids:
                tc[b] = tc.get(b, 0) + 1
    rt, tt = sum(rc.values()), sum(tc.values())
    lam = {
        b: math.log((tc.get(b, 0) + 1) / (tt + nb))
        - math.log((rc.get(b, 0) + 1) / (rt + nb))
        for b in rc
    }
    expected = {
        r.doc_id: round(sum(lam[b] for b in buckets(r.text)), 6) for r in rows
    }
    got = {
        r.doc_id: r.log_w
        for r in dsir_importance_weights(raw, target, n_buckets=nb).collect()
    }
    for i, e in expected.items():
        assert abs(got[i] - e) < 1e-6, (i, got[i], e)


def test_dsir_short_docs_weight_zero(spark):
    from autoextract.operators.sampling import dsir_importance_weights

    raw = spark.createDataFrame(
        [(1, "single"), (2, ""), (3, "two words here")],
        "doc_id long, text string",
    )
    target = raw.where(F.col("doc_id") == 3)
    w = {r.doc_id: (r.n_features, r.log_w) for r in
         dsir_importance_weights(raw, target).collect()}
    assert w[1] == (0, 0.0) and w[2] == (0, 0.0)
    assert w[3][0] == 2


def test_dsir_resample_topk_and_partition_invariance(spark):
    from autoextract.operators.sampling import dsir_resample

    raw = _dsir_corpus(spark)
    target = raw.where((F.col("doc_id") % 2 == 0) & (F.col("doc_id") < 6))
    one = dsir_resample(raw.coalesce(1), target, k=8).collect()
    many = dsir_resample(raw.repartition(7), target, k=8).collect()
    assert len(one) == 8
    assert sorted((r.doc_id, r.rank) for r in one) == sorted(
        (r.doc_id, r.rank) for r in many
    )
    # ranks are dense 1..k and ordered by key desc
    by_rank = sorted(one, key=lambda r: r.rank)
    assert [r.rank for r in by_rank] == list(range(1, 9))
    keys = [r.key for r in by_rank]
    assert keys == sorted(keys, reverse=True)
    # Gumbel noise means the sample is importance-BIASED toward the target
    # vocabulary, not a pure argmax — but with this weight gap every pick
    # must be an alpha-vocabulary doc
    assert all(r.doc_id % 2 == 0 for r in one)


def test_dsir_rejects_bad_args(spark):
    from autoextract.operators.sampling import (
        dsir_importance_weights,
        dsir_resample,
    )

    raw = _dsir_corpus(spark)
    with pytest.raises(ValueError):
        dsir_importance_weights(raw, raw, n_buckets=0)
    with pytest.raises(ValueError):
        dsir_resample(raw, raw, k=0)
