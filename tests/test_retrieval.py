"""BM25 inverted-index ranking: hand-computed values, ordering, top-k."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from autoextract.operators.retrieval import bm25_topk, postings


def _qt(spark, rows):
    return spark.createDataFrame(rows, "query_id long, term string")


def test_postings_tf_and_dl(spark):
    df = spark.createDataFrame(
        [(0, "a b a"), (1, "b")], "doc_id long, text string"
    )
    rows = {(r["doc_id"], r["term"]): (r["tf"], r["dl"]) for r in postings(df).collect()}
    assert rows[(0, "a")] == (2.0, 3.0)
    assert rows[(0, "b")] == (1.0, 3.0)
    assert rows[(1, "b")] == (1.0, 1.0)


def test_bm25_hand_computed_score(spark):
    # 2 docs, query = {a}: doc0 has tf=2, dl=3; doc1 lacks 'a'.
    # N=2, df(a)=1, avgdl=2 -> idf = ln(1 + 1.5/1.5) = ln 2
    # score = ln2 * 2*2.2 / (2 + 1.2*(0.25 + 0.75*3/2)) = ln2 * 4.4 / 3.65
    df = spark.createDataFrame(
        [(0, "a b a"), (1, "b")], "doc_id long, text string"
    )
    out = bm25_topk(df, _qt(spark, [(1, "a")]), k=5).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["query_id"], r["doc_id"], r["rank"]) == (1, 0, 1)
    expect = math.log(2.0) * 4.4 / (2 + 1.2 * (0.25 + 0.75 * 3 / 2))
    assert abs(r["score"] - round(expect, 6)) < 1e-9


def test_bm25_both_terms_beat_one(spark):
    df = spark.createDataFrame(
        [(0, "x y z"), (1, "x q r"), (2, "q r s")],
        "doc_id long, text string",
    )
    out = bm25_topk(df, _qt(spark, [(7, "x"), (7, "y")]), k=5).collect()
    ranked = sorted(out, key=lambda r: r["rank"])
    assert [r["doc_id"] for r in ranked] == [0, 1]  # doc2 matches nothing
    assert ranked[0]["score"] > ranked[1]["score"]


def test_bm25_k_cutoff_and_partition_invariance(spark):
    rows = [(i, "common w%d" % (i % 7)) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    q = _qt(spark, [(1, "common")])
    a = sorted(map(tuple, bm25_topk(df.repartition(1), q, k=3).collect()))
    b = sorted(map(tuple, bm25_topk(df.repartition(9), q, k=3).collect()))
    assert a == b and len(a) == 3
    # rank ties on equal scores resolve by doc_id: all docs share tf=1 for
    # 'common' and dl=2, so the top-3 are exactly doc_ids 0,1,2
    assert [t[1] for t in sorted(a, key=lambda t: t[3])] == [0, 1, 2]


def test_anchor_text_agg_semantics(spark):
    from autoextract.operators.retrieval import anchor_text_agg

    links = spark.createDataFrame(
        [
            ("d1", "https://t/a", "click here"),
            ("d1", "https://t/a", "click here"),   # same doc, same anchor
            ("d2", "https://t/a", "best page"),
            ("d3", "https://t/b", "other"),
            ("d4", None, "dropped"),               # unresolved -> excluded
        ],
        "doc_id string, url string, anchor string",
    )
    got = {r["url"]: r for r in anchor_text_agg(links).collect()}
    assert set(got) == {"https://t/a", "https://t/b"}
    a = got["https://t/a"]
    assert a["n_inlinks"] == 3 and a["n_source_docs"] == 2
    assert a["anchors"] == "best page|click here"  # sorted distinct
