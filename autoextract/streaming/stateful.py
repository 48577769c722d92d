"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState`` (SURVEY.md §2.10; the brief's "custom stateful
operators" path).

Semantics match the batch ``sessionize`` query (window-lag, 30-min gap): a
session is a maximal run of a user's events with consecutive gaps ≤ GAP.
Streaming form: per-user state carries the OPEN session (start, last event
time, count); each micro-batch's events extend or close it; a session also
closes by event-time TIMEOUT once the watermark passes last_ts + gap — that
is what finalizes sessions when a user simply stops sending events, and the
watermark is what bounds state size (open sessions only, never history).

Inside the kernel the per-batch work is vectorized pandas (sort, shift,
cumsum-split — no per-event Python beyond the tiny per-session emit list).
State crosses micro-batch AND restart boundaries via the streaming
checkpoint, so an ``availableNow`` drain + later re-run continues sessions
exactly where they left off.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from . import await_deregistration
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

GAP_SECONDS = 1800

SESSIONS_SINK = "sessions"
_OUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, n_events long"
)
_STATE_SCHEMA = "session_start timestamp, last_ts timestamp, n_events long"


def _sessionize_group(key, pdfs, state: GroupState):
    """Kernel: one user's new events (possibly several pandas chunks) +
    carried open-session state → closed sessions out, open session kept."""
    user_id = int(key[0])
    if state.hasTimedOut:
        start, last, n = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "session_start": [start],
                "session_end": [last],
                "n_events": [int(n)],
            }
        )
        return

    chunks = [pdf["ts"] for pdf in pdfs]
    ts = pd.concat(chunks).sort_values().reset_index(drop=True)
    if len(ts) == 0:
        return

    carried = state.get if state.exists else None
    prev = ts.shift(1)
    if carried is not None:
        prev.iloc[0] = carried[1]  # last_ts of the open session
    breaks = (ts - prev).dt.total_seconds() > GAP_SECONDS
    if carried is None:
        breaks.iloc[0] = True  # no open session: first event starts one
    sess_id = breaks.cumsum()  # 0 = continuation of the carried session

    closed = []
    open_start = open_last = None
    open_n = 0
    grouped = ts.groupby(sess_id)
    last_sid = int(sess_id.iloc[-1])
    for sid, grp in grouped:
        start, last, n = grp.iloc[0], grp.iloc[-1], len(grp)
        if int(sid) == 0 and carried is not None:
            # merge with min(start)/max(last): a late-but-within-watermark
            # event may predate the carried session's start or trail behind
            # its last_ts — the open session must never move backward
            # (r2 ADVICE: taking the batch's own bounds let negative gaps
            # drag last_ts back and diverge from the batch oracle)
            start = min(carried[0], start)
            last = max(carried[1], last)
            n += int(carried[2])
        if int(sid) == last_sid:
            open_start, open_last, open_n = start, last, n
        else:
            closed.append((user_id, start, last, int(n)))
    if carried is not None and last_sid > 0 and 0 not in sess_id.values:
        # carried session had no continuation in this batch: close it as-is
        closed.insert(0, (user_id, carried[0], carried[1], int(carried[2])))

    state.update((open_start, open_last, int(open_n)))
    # event-time timeout: fires once the WATERMARK passes last_ts + gap
    state.setTimeoutTimestamp(
        int(open_last.value // 1_000_000) + GAP_SECONDS * 1000
    )
    if closed:
        yield pd.DataFrame(
            closed,
            columns=["user_id", "session_start", "session_end", "n_events"],
        )


def stream_sessionize(
    spark: SparkSession,
    events_dir: str,
    out_dir: str,
    watermark: str = "1 hour",
) -> None:
    """One ``availableNow`` pass: new event files → CLOSED sessions appended
    under ``out_dir/sessions`` (batch_id-keyed idempotent sink); open
    sessions stay in checkpointed state for the next run."""
    schema = spark.read.parquet(events_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .parquet(events_dir)
        .select(
            F.col("user_id").cast("long").alias("user_id"),
            F.col("ts").cast("timestamp").alias("ts"),
        )
        .withWatermark("ts", watermark)
    )
    sessions = stream.groupBy("user_id").applyInPandasWithState(
        _sessionize_group,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            os.path.join(out_dir, SESSIONS_SINK, f"batch={batch_id}")
        )

    q = (
        sessions.writeStream.trigger(availableNow=True)
        .outputMode("append")
        .option(
            "checkpointLocation", os.path.join(out_dir, "_sessions_checkpoint")
        )
        .foreachBatch(sink)
        .start()
    )
    q.awaitTermination()
    await_deregistration(spark, q)


def read_sessions(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, SESSIONS_SINK)).drop("batch")
