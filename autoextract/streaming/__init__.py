"""Structured Streaming operators (incremental ingest, windowed aggs,
stateful sessionization) plus shared stream-lifecycle helpers."""

from __future__ import annotations

import time


def await_deregistration(spark, query, timeout_s: float = 10.0) -> None:
    """Wait for a terminated query to leave the StreamingQueryManager.

    Deregistration is asynchronous after ``awaitTermination``; an immediate
    re-run against the same checkpoint would be rejected as a concurrent
    query. BOUNDED (r2 ADVICE: the former bare busy-wait hung forever on a
    stalled manager): past ``timeout_s`` we proceed with a clear error —
    the caller's re-start will surface the conflict if one truly remains.
    """
    deadline = time.monotonic() + timeout_s
    while any(a.id == query.id for a in spark.streams.active):
        if time.monotonic() > deadline:
            raise TimeoutError(
                f"streaming query {query.id} still registered after "
                f"{timeout_s}s; StreamingQueryManager appears stalled"
            )
        time.sleep(0.05)
