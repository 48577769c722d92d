"""availableNow incremental streaming (streaming/incremental.py)."""

from __future__ import annotations

import os

from autoextract import corpus
from autoextract.streaming.incremental import stream_spans_available_now


def test_incremental_availablenow(spark, tmp_path):
    words_dir = str(tmp_path / "words")
    out_dir = str(tmp_path / "out")

    gen1 = corpus.ocr_words_view(corpus.gen_corpus(spark, 20, seed=1))
    gen1.write.mode("append").parquet(words_dir)

    stream_spans_available_now(spark, words_dir, out_dir, n_buckets=4)
    first = spark.read.parquet(os.path.join(out_dir, "spans"))
    assert first.select("doc_id").distinct().count() == 20

    # second batch of NEW files → only the delta is processed, output appends
    gen2 = corpus.ocr_words_view(corpus.gen_corpus(spark, 15, seed=2))
    gen2.write.mode("append").parquet(words_dir)

    stream_spans_available_now(spark, words_dir, out_dir, n_buckets=4)
    both = spark.read.parquet(os.path.join(out_dir, "spans"))
    assert both.select("doc_id").distinct().count() == 35
    # no duplicates: batch-1 docs were not reprocessed
    assert both.count() == both.select("doc_id").distinct().count()


def test_replayed_batch_is_idempotent(spark, tmp_path):
    """Remove the last streaming commit → Spark replays the micro-batch with
    the SAME batch_id; the batch_id-keyed overwrite sink must not duplicate."""
    words_dir = str(tmp_path / "words")
    out_dir = str(tmp_path / "out")
    corpus.ocr_words_view(corpus.gen_corpus(spark, 12, seed=3)).write.mode(
        "append"
    ).parquet(words_dir)

    stream_spans_available_now(spark, words_dir, out_dir, n_buckets=4)
    spans_dir = os.path.join(out_dir, "spans")
    before = spark.read.parquet(spans_dir).count()

    commits = os.path.join(out_dir, "_stream_checkpoint", "commits")
    newest = max(
        (f for f in os.listdir(commits) if not f.startswith(".")), key=int
    )
    os.remove(os.path.join(commits, newest))
    crc = os.path.join(commits, f".{newest}.crc")
    if os.path.exists(crc):  # stale checksum reads as concurrent modification
        os.remove(crc)

    stream_spans_available_now(spark, words_dir, out_dir, n_buckets=4)
    after = spark.read.parquet(spans_dir)
    assert after.count() == before
    assert after.count() == after.select("doc_id").distinct().count()


def test_watermarked_hourly_rollup_parity(spark, tmp_path):
    """Watermark semantics end-to-end: a drained run leaves trailing windows
    pending; later-arriving events advance the watermark and finalize them;
    the finalized set equals the batch group-by exactly (and a window is
    never emitted twice)."""
    import datetime as dt

    import pandas as pd
    from pyspark.sql import functions as F

    from autoextract.streaming.windowed import read_hourly, stream_hourly_rollup

    events_dir = str(tmp_path / "events")
    out_dir = str(tmp_path / "out")
    base = dt.datetime(2024, 3, 1, 0, 0, 0)
    rows = []
    for i in range(300):  # 5 hours of events, 3 types
        rows.append(
            {
                "event_id": i,
                "ts": base + dt.timedelta(minutes=i),
                "event_type": ["view", "click", "buy"][i % 3],
                "value": float(i % 7),
            }
        )
    df1 = spark.createDataFrame(
        pd.DataFrame(rows),
        schema="event_id long, ts timestamp, event_type string, value double",
    )
    df1.write.mode("append").parquet(events_dir)

    stream_hourly_rollup(spark, events_dir, out_dir, watermark="1 hour")
    got1 = read_hourly(spark, out_dir)
    # watermark = max ts (04:59) - 1h = 03:59 → windows 00-02 finalized,
    # 03:00 and 04:00 still pending in state
    finalized1 = {r["hour_start"] for r in got1.select("hour_start").distinct().collect()}
    assert len(finalized1) == 3

    # a later file advances event time far past every real window
    late = [
        {
            "event_id": 9999,
            "ts": base + dt.timedelta(hours=24),
            "event_type": "view",
            "value": 0.0,
        }
    ]
    spark.createDataFrame(
        pd.DataFrame(late), schema=df1.schema
    ).write.mode("append").parquet(events_dir)
    stream_hourly_rollup(spark, events_dir, out_dir, watermark="1 hour")

    got = read_hourly(spark, out_dir).where(
        F.col("hour_start") < F.lit(base + dt.timedelta(hours=10))
    )
    expected = (
        df1.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(F.col("w.start").alias("hour_start"), "event_type", "n", "sum_value")
    )
    assert got.count() == expected.count() == 15  # 5 hours x 3 types
    assert got.exceptAll(expected).union(expected.exceptAll(got)).count() == 0


def test_stateful_sessionize_parity(spark, tmp_path):
    """applyInPandasWithState sessionization: state crosses availableNow
    runs via the checkpoint; event-time timeouts close idle sessions once
    the watermark passes; the closed set equals the batch lag/cumsum
    sessionization exactly."""
    import datetime as dt

    import pandas as pd
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from autoextract.streaming.stateful import read_sessions, stream_sessionize

    events_dir = str(tmp_path / "events")
    out_dir = str(tmp_path / "out")
    base = dt.datetime(2024, 3, 1, 0, 0, 0)
    rows = []
    eid = 0

    def add(user, minutes):
        nonlocal eid
        rows.append(
            {
                "event_id": eid,
                "ts": base + dt.timedelta(minutes=minutes),
                "user_id": user,
                "event_type": "view",
                "value": 0.0,
            }
        )
        eid += 1

    # user 1: two sessions (gap 45 min > 30); user 2: one session
    for m in (0, 10, 20, 65, 70):
        add(1, m)
    for m in (5, 25):
        add(2, m)
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    df1 = spark.createDataFrame(pd.DataFrame(rows), schema=schema)
    df1.write.mode("append").parquet(events_dir)
    stream_sessionize(spark, events_dir, out_dir, watermark="30 minutes")

    # second delivery: user 1's open session CONTINUES (75 < 70+30),
    # user 3 appears — state must have crossed the run boundary
    rows2 = []
    rows, eid = rows2, 100

    def add2(user, minutes):
        nonlocal eid
        rows2.append(
            {
                "event_id": eid,
                "ts": base + dt.timedelta(minutes=minutes),
                "user_id": user,
                "event_type": "view",
                "value": 0.0,
            }
        )
        eid += 1

    for m in (75, 85):
        add2(1, m)
    add2(3, 90)
    df2 = spark.createDataFrame(pd.DataFrame(rows2), schema=schema)
    df2.write.mode("append").parquet(events_dir)
    stream_sessionize(spark, events_dir, out_dir, watermark="30 minutes")

    # sentinel far in the future: watermark passes every open session's
    # timeout → all sessions finalize
    sent = [{"event_id": 999, "ts": base + dt.timedelta(hours=48),
             "user_id": 99, "event_type": "view", "value": 0.0}]
    spark.createDataFrame(pd.DataFrame(sent), schema=schema).write.mode(
        "append"
    ).parquet(events_dir)
    stream_sessionize(spark, events_dir, out_dir, watermark="30 minutes")

    got = (
        read_sessions(spark, out_dir)
        .where(F.col("user_id") < 99)
        .select("user_id", "session_start", "session_end", "n_events")
    )
    all_events = df1.unionByName(df2)
    w = Window.partitionBy("user_id").orderBy("ts")
    expected = (
        all_events.withColumn("prev", F.lag("ts").over(w))
        .withColumn(
            "new_s",
            (
                F.col("prev").isNull()
                | (F.unix_timestamp("ts") - F.unix_timestamp("prev") > 1800)
            ).cast("int"),
        )
        .withColumn("sid", F.sum("new_s").over(w))
        .groupBy("user_id", "sid")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").cast("long").alias("n_events"),
        )
        .drop("sid")
    )
    assert got.count() == expected.count() == 4  # u1: 2, u2: 1, u3: 1
    assert got.exceptAll(expected).union(expected.exceptAll(got)).count() == 0


def test_stateful_sessionize_out_of_order_within_watermark(spark, tmp_path):
    """r3 (r2 ADVICE): late-but-within-watermark events that predate the
    carried session's start or trail its last_ts must MERGE with
    min(start)/max(last) — the open session never moves backward, and the
    final closed session equals the batch semantics over all events."""
    import datetime as dt

    import pandas as pd
    from pyspark.sql import functions as F

    from autoextract.streaming.stateful import read_sessions, stream_sessionize

    events_dir = str(tmp_path / "events")
    out_dir = str(tmp_path / "out")
    base = dt.datetime(2024, 3, 1, 0, 0, 0)
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, value double"
    )

    def deliver(minutes, eid0):
        rows = [
            {"event_id": eid0 + i, "ts": base + dt.timedelta(minutes=m),
             "user_id": 7, "event_type": "view", "value": 0.0}
            for i, m in enumerate(minutes)
        ]
        spark.createDataFrame(pd.DataFrame(rows), schema=schema).write.mode(
            "append"
        ).parquet(events_dir)

    deliver([10, 20], 0)  # open session: start=10, last=20
    stream_sessionize(spark, events_dir, out_dir, watermark="30 minutes")
    # late events at 5 and 15 (older than carried last_ts, one predating the
    # carried start) plus a fresh one at 25 — all within the watermark
    deliver([5, 15, 25], 100)
    stream_sessionize(spark, events_dir, out_dir, watermark="30 minutes")
    # sentinel far ahead: the watermark passes the open session's timeout
    sent = [{"event_id": 999, "ts": base + dt.timedelta(hours=48),
             "user_id": 99, "event_type": "view", "value": 0.0}]
    spark.createDataFrame(pd.DataFrame(sent), schema=schema).write.mode(
        "append"
    ).parquet(events_dir)
    stream_sessionize(spark, events_dir, out_dir, watermark="30 minutes")

    got = read_sessions(spark, out_dir).where(F.col("user_id") == 7).collect()
    assert len(got) == 1
    s = got[0]
    assert s["session_start"] == base + dt.timedelta(minutes=5)
    assert s["session_end"] == base + dt.timedelta(minutes=25)
    assert s["n_events"] == 5


def test_stream_dedup_exactly_once_within_watermark(spark, tmp_path):
    """r3: duplicate deliveries (same event_id) within the watermark — in
    the SAME run and across a LATER availableNow run — collapse to exactly
    one output row; parity with batch dropDuplicates over all deliveries."""
    import datetime as dt

    import pandas as pd
    from pyspark.sql import functions as F

    from autoextract.streaming.dedup import read_deduped, stream_dedup_events

    events_dir = str(tmp_path / "events")
    out_dir = str(tmp_path / "out")
    base = dt.datetime(2024, 3, 1, 0, 0, 0)
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, value double"
    )

    def deliver(rows):
        pdf = pd.DataFrame(
            [
                {"event_id": e, "ts": base + dt.timedelta(minutes=m),
                 "user_id": u, "event_type": "view", "value": float(e)}
                for e, m, u in rows
            ]
        )
        spark.createDataFrame(pdf, schema=schema).write.mode("append").parquet(
            events_dir
        )

    # run 1: events 1..3, with 2 delivered twice inside the batch
    deliver([(1, 0, 7), (2, 1, 7), (2, 1, 7), (3, 2, 8)])
    stream_dedup_events(spark, events_dir, out_dir, watermark="30 minutes")
    # run 2: a LATE duplicate of 3 (within watermark) + new event 4
    deliver([(3, 2, 8), (4, 5, 8)])
    stream_dedup_events(spark, events_dir, out_dir, watermark="30 minutes")

    got = read_deduped(spark, out_dir)
    assert got.count() == 4
    assert sorted(r["event_id"] for r in got.collect()) == [1, 2, 3, 4]
    # batch parity: distinct over all deliveries (row-set compare; an
    # exceptAll-of-unionAll over these two parquet lineages trips a Catalyst
    # INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND in this Spark build)
    batch = spark.read.parquet(events_dir).dropDuplicates(["event_id"])
    key = lambda r: (r["event_id"], r["ts"], r["user_id"], r["event_type"], r["value"])
    assert sorted(map(key, got.collect())) == sorted(map(key, batch.collect()))
