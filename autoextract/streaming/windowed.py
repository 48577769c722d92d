"""Watermarked event-time windowed aggregation (SURVEY.md §2.10 upgrade).

The reference has no true stream (its job model is poll-and-batch); this is
the Structured-Streaming-native form of the ``events_hourly`` rollup: a file
stream over the events table, ``withWatermark`` bounding how late an event
may arrive, a 1-hour tumbling ``window`` aggregation, and an idempotent
``foreachBatch`` sink (batch_id-keyed overwrite, same replay contract as
``streaming.incremental``).

Append-mode semantics worth stating precisely (they drive the tests): a
window only EMITS once the watermark — max observed event time minus the
allowed lateness — passes its end. A drained ``availableNow`` run therefore
leaves the trailing windows pending in state; they finalize on a later run
whose new data advances the watermark. That is the correct production
behavior for continuously-arriving data (late events within the bound still
land in their window), and the parity test exercises it: run → newer events
arrive → run again → the finalized prefix equals the batch group-by exactly.

At 100 TB scale this plan is shuffle-once per micro-batch (partial
aggregation map-side, final agg keyed on (window, event_type)) with state
bounded by (#windows within the watermark horizon × #event types) — the
watermark is what keeps state from growing with the stream.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from . import await_deregistration
from pyspark.sql import functions as F

HOURLY_SINK = "events_hourly"


def stream_hourly_rollup(
    spark: SparkSession,
    events_dir: str,
    out_dir: str,
    watermark: str = "2 hours",
) -> None:
    """One ``availableNow`` pass: new event files → finalized hourly windows
    appended under ``out_dir/events_hourly`` (batch_id-keyed, replay-safe).
    """
    schema = spark.read.parquet(events_dir).schema
    stream = spark.readStream.schema(schema).parquet(events_dir)
    agg = (
        stream.select(
            F.col("ts").cast("timestamp").alias("ts"), "event_type", "value"
        )
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("hour_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.write.mode("overwrite").parquet(
                os.path.join(out_dir, HOURLY_SINK, f"batch={batch_id}")
            )
        )

    q = (
        agg.writeStream.trigger(availableNow=True)
        .outputMode("append")  # emit each window exactly once, on finalize
        .option(
            "checkpointLocation", os.path.join(out_dir, "_hourly_checkpoint")
        )
        .foreachBatch(sink)
        .start()
    )
    q.awaitTermination()
    await_deregistration(spark, q)


def read_hourly(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, HOURLY_SINK)).drop("batch")
