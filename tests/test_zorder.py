"""Z-order layout (plans/zorder.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from autoextract.plans.zorder import (
    layout_pruning_report,
    zorder_key,
    zorder_keyed,
    zorder_layout,
)


def _spread2(x: int) -> int:
    x &= 0xFFFFFFFF
    for sh, m in [(16, 0x0000FFFF0000FFFF), (8, 0x00FF00FF00FF00FF),
                  (4, 0x0F0F0F0F0F0F0F0F), (2, 0x3333333333333333),
                  (1, 0x5555555555555555)]:
        x = (x | (x << sh)) & m
    return x


def _spread3(x: int) -> int:
    x &= 0x1FFFFF
    for sh, m in [(32, 0x1F00000000FFFF), (16, 0x1F0000FF0000FF),
                  (8, 0x100F00F00F00F00F), (4, 0x10C30C30C30C30C3),
                  (2, 0x1249249249249249)]:
        x = (x | (x << sh)) & m
    return x


def test_key_matches_reference_2way(spark):
    vals = [(i, (i * 37) % 2048, (i * 91 + 3) % 2048) for i in range(512)]
    df = spark.createDataFrame(vals, "id long, a long, b long")
    got = {r["id"]: r["k"] for r in df.select(
        "id", zorder_key([F.col("a"), F.col("b")], 11).alias("k")).collect()}
    for i, a, b in vals:
        assert got[i] == _spread2(a) | (_spread2(b) << 1)


def test_key_matches_reference_3way(spark):
    vals = [(i, i % 64, (i * 7) % 64, (i * 13) % 64) for i in range(256)]
    df = spark.createDataFrame(vals, "id long, a long, b long, c long")
    got = {r["id"]: r["k"] for r in df.select(
        "id", zorder_key(
            [F.col("a"), F.col("b"), F.col("c")], 6).alias("k")).collect()}
    for i, a, b, c in vals:
        exp = _spread3(a) | (_spread3(b) << 1) | (_spread3(c) << 2)
        assert got[i] == exp


def test_normalization_and_nulls(spark):
    df = spark.createDataFrame(
        [(1, 100, 5), (2, 200, None), (3, 300, 9)],
        "id long, x long, y long")
    rows = {r["id"]: r["zkey"]
            for r in zorder_keyed(df, ["x", "y"], bits=4).collect()}
    # x=100 → rank 0, x=300 → rank 15; NULL y → rank 0
    def nrm(v, lo, hi):
        return math.floor((v - lo) / max(hi - lo, 1) * 15)
    assert rows[1] == _spread2(nrm(100, 100, 300)) | (
        _spread2(nrm(5, 5, 9)) << 1)
    assert rows[2] == _spread2(nrm(200, 100, 300))   # y NULL → 0
    assert rows[3] == _spread2(15) | (_spread2(15) << 1)


def test_bucket_spans_shrink_vs_single_column(spark):
    # the point of the layout: on a 2-d uniform grid, every z-range
    # bucket must span far less than the full range of BOTH columns
    rows = [(i, i % 100, i // 100) for i in range(10000)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    rep = layout_pruning_report(df, ["x", "y"], partitions=16,
                                bits=10).collect()
    assert len(rep) == 16
    assert sum(r["n_rows"] for r in rep) == 10000
    for r in rep:
        assert r["x_max"] - r["x_min"] <= 55     # ≪ full span 99
        assert r["y_max"] - r["y_min"] <= 55
    # a doc_id-range layout would give y spans of ~99 in every bucket


def test_layout_sorted_within_partitions(spark):
    rows = [(i, (i * 17) % 500, (i * 31) % 500) for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    laid = zorder_layout(df, ["x", "y"], partitions=8, bits=10)
    pdf = laid.withColumn("pid", F.spark_partition_id()).collect()
    by_pid: dict[int, list[int]] = {}
    for r in pdf:
        by_pid.setdefault(r["pid"], []).append(r["zkey"])
    assert sum(len(v) for v in by_pid.values()) == 2000
    for keys in by_pid.values():
        assert keys == sorted(keys)
    # range partitioning: partitions hold disjoint key ranges
    spans = sorted((min(v), max(v)) for v in by_pid.values() if v)
    for (_, hi), (lo, _) in zip(spans, spans[1:]):
        assert hi <= lo


def test_skew_report_values_and_ties(spark):
    from autoextract.plans.zorder import skew_report

    rows = [(i, "hot" if i % 3 == 0 else "k%02d" % (i % 5)) for i in
            range(300)]
    df = spark.createDataFrame(rows, "id long, k string")
    rep = skew_report(df, "k", top_k=3).collect()
    # hot: 100 rows; k00..k04 come deterministically by key asc on ties
    assert [(r["key"], r["n"]) for r in rep] == [
        ("hot", 100), ("k00", 40), ("k01", 40)]
    assert rep[0]["share"] == round(100 / 300, 6)
    # 6 distinct keys, mean 50, max 100 → factor 2.0
    assert rep[0]["skew_factor"] == 2.0
