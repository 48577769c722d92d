"""Streaming ingestion dedup: duplicate deliveries collapse exactly once.

A landing stream redelivers records (at-least-once sources, producer
retries); the ingestion layer must emit each logical record once without
keeping unbounded state. ``dropDuplicatesWithinWatermark`` keys state by the
record id and lets the event-time watermark expire it — the standard
exactly-once-ingestion shape (state ∝ records inside the lateness window,
never the corpus).

Parity contract (tested): for deliveries whose duplicates arrive within the
watermark, the streamed output equals the batch ``dropDuplicates`` over all
deliveries.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import await_deregistration

DEDUP_SINK = "deduped"


def stream_dedup_events(
    spark: SparkSession,
    events_dir: str,
    out_dir: str,
    key: str = "event_id",
    watermark: str = "1 hour",
) -> None:
    """One ``availableNow`` drain: new event files → watermarked
    drop-duplicates on ``key`` → append sink (batch_id-keyed, idempotent on
    replay like the other sinks). Rerunning after new files arrive continues
    from checkpointed state, so a duplicate delivered in a LATER run (still
    within the watermark) is dropped too."""
    schema = spark.read.parquet(events_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .parquet(events_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark([key])
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            os.path.join(out_dir, DEDUP_SINK, f"batch={batch_id}")
        )

    q = (
        stream.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(out_dir, "_dedup_checkpoint"))
        .foreachBatch(sink)
        .start()
    )
    q.awaitTermination()
    await_deregistration(spark, q)


def read_deduped(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, DEDUP_SINK)).drop("batch")
