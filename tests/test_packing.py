"""Sequence packing (operators/packing): next-fit semantics, overflow
isolation, determinism, and the exact-invariant verdict."""

from __future__ import annotations

from autoextract.operators import packing as PK


def _docs(spark, sizes):
    rows = [(i + 1, " ".join(["tok"] * n)) for i, n in enumerate(sizes)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_next_fit_semantics_single_partition(spark):
    docs = _docs(spark, [100, 100, 60, 300, 10, 250, 40])
    out = {r["doc_id"]: r for r in
           PK.pack_sequences(docs, budget=256, partitions=1).collect()}
    assert len(out) == 7
    # docs 1+2 share a bin (200 <= 256); doc 3 opens a new one (260 > 256)
    assert out[1]["bin_id"] == out[2]["bin_id"] != out[3]["bin_id"]
    # the 300-token doc overflows alone
    assert out[4]["overflow"] is True
    assert sum(1 for r in out.values() if r["bin_id"] == out[4]["bin_id"]) == 1
    # bin totals never exceed the budget except overflow singletons
    totals = {}
    for r in out.values():
        totals.setdefault(r["bin_id"], [0, False])
        totals[r["bin_id"]][0] += r["n_tokens"]
        totals[r["bin_id"]][1] |= r["overflow"]
    for tot, ov in totals.values():
        assert tot <= 256 or ov


def test_packing_deterministic(spark):
    docs = _docs(spark, list(range(20, 120, 7)) * 3)
    a = sorted(map(tuple, PK.pack_sequences(docs, budget=200).collect()))
    b = sorted(map(tuple, PK.pack_sequences(docs, budget=200).collect()))
    assert a == b


def test_verdict_all_ok_including_overflow_shapes(spark):
    docs = _docs(spark, [100, 100, 60, 300, 10, 250, 40, 999, 5, 5])
    v = PK.packing_verdict(docs, budget=256).collect()
    assert len(v) == 10 and all(r["pack_ok"] for r in v)
