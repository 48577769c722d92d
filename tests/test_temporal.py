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


def test_interval_duplicate_rows_keep_per_row_counts(spark):
    """Two fully-identical interval rows each get their OWN count row (the
    surrogate-id keeps them apart; the old all-columns groupBy silently
    merged them into one row with a summed count)."""
    intervals = spark.createDataFrame(
        [(1, 7, _ts(0), _ts(30)), (1, 7, _ts(0), _ts(30))],
        "event_id long, user_id long, start_ts timestamp, end_ts timestamp",
    )
    points = spark.createDataFrame(
        [(7, _ts(5)), (7, _ts(10))], "user_id long, ts timestamp"
    )
    rows = TMP.interval_count_join(
        intervals, points, on="user_id", start_col="start_ts", end_col="end_ts"
    ).collect()
    assert len(rows) == 2
    assert [r["n_points"] for r in rows] == [2, 2]


def test_interval_null_columns_survive(spark):
    """Interval rows with null non-key columns are preserved (the old join
    keyed on every column, where null equality drops rows)."""
    intervals = spark.createDataFrame(
        [(1, 7, _ts(0), _ts(30), None), (2, 7, _ts(0), _ts(30), "x")],
        "event_id long, user_id long, start_ts timestamp, end_ts timestamp, tag string",
    )
    points = spark.createDataFrame([(7, _ts(5))], "user_id long, ts timestamp")
    got = {r["event_id"]: (r["n_points"], r["tag"]) for r in TMP.interval_count_join(
        intervals, points, on="user_id", start_col="start_ts", end_col="end_ts"
    ).collect()}
    assert got == {1: (1, None), 2: (1, "x")}


def test_interval_null_bounds_survive_with_zero_count(spark):
    """Interval rows whose start/end is NULL must survive to the output
    with count 0 (ADVICE r4: floor(NULL) made F.sequence NULL and a plain
    explode dropped the row; explode_outer keeps it)."""
    intervals = spark.createDataFrame(
        [(1, 7, _ts(0), _ts(30)), (2, 7, None, _ts(30)),
         (3, 7, _ts(0), None), (4, 7, None, None)],
        "event_id long, user_id long, start_ts timestamp, end_ts timestamp",
    )
    points = spark.createDataFrame([(7, _ts(5))], "user_id long, ts string")
    points = points.withColumn("ts", F.col("ts").cast("timestamp"))
    got = {r["event_id"]: r["n_points"] for r in TMP.interval_count_join(
        intervals, points, on="user_id", start_col="start_ts", end_col="end_ts"
    ).collect()}
    assert got == {1: 1, 2: 0, 3: 0, 4: 0}


def test_asof_hot_key_chunked_matches_default(spark):
    """The time-chunked variant returns IDENTICAL rows to the single-window
    default on a skewed distribution: one hot key with ~100x the median
    key's rows, matches carried across empty coarse buckets, a key whose
    left rows all precede any right row, and equal-ts ties."""
    left_rows = [(i, 1, _ts(i)) for i in range(300)]          # hot key
    left_rows += [(1000 + i, 2, _ts(i * 7)) for i in range(3)]  # median key
    left_rows += [(2000, 3, _ts(5))]                           # no right rows
    left = spark.createDataFrame(
        left_rows, "event_id long, user_id long, ts timestamp"
    )
    right_rows = [(1, 5000 + i, _ts(i * 10)) for i in range(30)]  # hot key
    right_rows += [(1, 5500, _ts(55)), (1, 5501, _ts(55))]        # equal-ts tie
    right_rows += [(2, 6000, _ts(8))]
    right = spark.createDataFrame(
        right_rows, "user_id long, view_event_id long, ts timestamp"
    )
    kw = dict(on="user_id", right_cols=["view_event_id", "ts"],
              right_id="view_event_id")
    base = sorted(
        TMP.as_of_join(left, right, **kw).collect(),
        key=lambda r: r["event_id"],
    )
    # 120 s buckets: the hot key's 300 left-minutes span ~150 buckets, many
    # of them empty of right rows — the cross-bucket carry must bridge them
    chunked = sorted(
        TMP.as_of_join(left, right, hot_key_bucket_seconds=120, **kw).collect(),
        key=lambda r: r["event_id"],
    )
    assert base == chunked
    by_id = {r["event_id"]: r for r in chunked}
    assert by_id[2000]["view_event_id_right"] is None  # key with no rights
    assert by_id[0]["view_event_id_right"] == 5000     # equal-ts at minute 0
    assert by_id[299]["view_event_id_right"] == 5029   # carried to the tail


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
