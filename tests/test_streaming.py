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
