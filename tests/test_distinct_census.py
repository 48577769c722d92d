"""HLL distinct census (functions/text.distinct_census)."""

from __future__ import annotations

from autoextract.functions.text import distinct_census


def test_exact_counts_and_verdict(spark):
    rows = [(i, "t%d" % (i % 13), "s%d" % (i % 3)) for i in range(600)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r["source"]: r for r in distinct_census(df).collect()}
    assert set(got) == {"s0", "s1", "s2"}
    for s, r in got.items():
        assert r["n_rows"] == 200
        # i%3==j covers i%13 over 200 samples → all 13 values hit
        assert r["n_distinct"] == 13
        assert r["hll_ok"] is True


def test_high_cardinality_bound_holds(spark):
    # 20k distinct keys in one group: the HLL estimate must sit inside
    # the 5×rsd band the operator promises
    df = spark.createDataFrame(
        [(i, "k%06d" % i, "only") for i in range(20000)],
        "doc_id long, text string, source string")
    r = distinct_census(df).collect()[0]
    assert r["n_distinct"] == 20000 and r["hll_ok"] is True
