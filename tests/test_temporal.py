"""Temporal join operators (operators/temporal): as-of join + interval
count join — edge semantics pinned (no-prior-match nulls, equal-ts
inclusion, deterministic ties, boundary inclusivity)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from autoextract.operators import temporal as TMP

T0 = dt.datetime(2024, 3, 1, 0, 0, 0)


def _ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def test_asof_basic_latest_prior(spark):
    left = spark.createDataFrame(
        [(100, 1, _ts(10)), (101, 1, _ts(30)), (102, 2, _ts(5))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, 200, _ts(0)), (1, 201, _ts(25)), (1, 202, _ts(40)), (3, 300, _ts(1))],
        "user_id long, view_event_id long, ts timestamp",
    )
    out = {r["event_id"]: r for r in TMP.as_of_join(
        left, right, on="user_id",
        right_cols=["view_event_id", "ts"], right_id="view_event_id",
    ).collect()}
    assert out[100]["view_event_id_right"] == 200   # only ts=0 is prior
    assert out[101]["view_event_id_right"] == 201   # ts=25 latest prior to 30
    assert out[102]["view_event_id_right"] is None  # user 2 has no views
    assert out[102]["ts_right"] is None


def test_asof_equal_ts_matches_and_ties_break_high_id(spark):
    left = spark.createDataFrame(
        [(100, 1, _ts(10))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, 200, _ts(10)), (1, 201, _ts(10)), (1, 150, _ts(9))],
        "user_id long, view_event_id long, ts timestamp",
    )
    out = TMP.as_of_join(
        left, right, on="user_id",
        right_cols=["view_event_id"], right_id="view_event_id",
    ).collect()[0]
    # ≤ semantics include the equal-ts rows; among them the max id wins
    assert out["view_event_id_right"] == 201


def test_interval_count_boundaries_inclusive(spark):
    intervals = spark.createDataFrame(
        [(1, 7, _ts(0), _ts(30))],
        "event_id long, user_id long, start_ts timestamp, end_ts timestamp",
    )
    points = spark.createDataFrame(
        [(7, _ts(0)), (7, _ts(15)), (7, _ts(30)), (7, _ts(31)), (8, _ts(15))],
        "user_id long, ts timestamp",
    )
    out = TMP.interval_count_join(
        intervals, points, on="user_id", start_col="start_ts", end_col="end_ts"
    ).collect()[0]
    assert out["n_points"] == 3  # both endpoints inclusive; other user excluded


def test_interval_count_zero_fill(spark):
    intervals = spark.createDataFrame(
        [(1, 7, _ts(0), _ts(30)), (2, 9, _ts(0), _ts(30))],
        "event_id long, user_id long, start_ts timestamp, end_ts timestamp",
    )
    points = spark.createDataFrame([(7, _ts(5))], "user_id long, ts timestamp")
    got = {r["event_id"]: r["n_points"] for r in TMP.interval_count_join(
        intervals, points, on="user_id", start_col="start_ts", end_col="end_ts"
    ).collect()}
    assert got == {1: 1, 2: 0}


def test_interval_spanning_many_buckets(spark):
    """An interval longer than one bucket still counts every inside point
    (the explode covers ⌈len/width⌉+1 buckets)."""
    intervals = spark.createDataFrame(
        [(1, 7, _ts(0), _ts(180))],
        "event_id long, user_id long, start_ts timestamp, end_ts timestamp",
    )
    points = spark.createDataFrame(
        [(7, _ts(m)) for m in (0, 29, 31, 90, 150, 180, 181)],
        "user_id long, ts timestamp",
    )
    out = TMP.interval_count_join(
        intervals, points, on="user_id", start_col="start_ts",
        end_col="end_ts", bucket_seconds=1800,
    ).collect()[0]
    assert out["n_points"] == 6


def test_asof_single_shuffle_plan(spark):
    """The union-window composition shuffles ONCE on the key — no join node
    at all in the physical plan."""
    left = spark.createDataFrame(
        [(100, 1, _ts(10))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, 200, _ts(0))], "user_id long, view_event_id long, ts timestamp"
    )
    out = TMP.as_of_join(left, right, on="user_id", right_cols=["view_event_id"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
