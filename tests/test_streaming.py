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
