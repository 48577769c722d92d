"""Snapshot diff (operators/snapshot.py)."""

from __future__ import annotations

from autoextract.operators.snapshot import snapshot_diff, snapshot_diff_report


def test_statuses(spark):
    old = spark.createDataFrame(
        [(1, "same"), (2, "will change"), (3, "going away")],
        "doc_id long, text string")
    new = spark.createDataFrame(
        [(1, "same"), (2, "changed now"), (4, "brand new")],
        "doc_id long, text string")
    got = {r["doc_id"]: r["status"]
           for r in snapshot_diff(old, new).collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_carry_and_fingerprints(spark):
    old = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    new = spark.createDataFrame([(1, "b", "web")],
                                "doc_id long, text string, source string")
    r = snapshot_diff(old, new, carry=["source"]).collect()[0]
    assert r["status"] == "changed" and r["source"] == "web"
    assert r["old_fingerprint"] != r["new_fingerprint"]
    assert len(r["new_fingerprint"]) == 64      # sha256 hex


def test_report_rollup(spark):
    old = spark.createDataFrame(
        [(i, f"t{i}") for i in range(10)], "doc_id long, text string")
    new = spark.createDataFrame(
        [(i, "t%d" % i if i < 6 else "mut%d" % i) for i in range(2, 12)],
        "doc_id long, text string")
    rep = snapshot_diff_report(snapshot_diff(old, new)).collect()[0]
    # keys 0,1 removed; 10,11 added; 6..9 changed; 2..5 unchanged
    assert (rep["n_total"], rep["n_added"], rep["n_removed"],
            rep["n_changed"], rep["n_unchanged"]) == (12, 2, 2, 4, 4)
    assert rep["churn_rate"] == round(8 / 12, 6)
