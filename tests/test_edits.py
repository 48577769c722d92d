"""Edit-and-re-extract MERGE flow (reference §3.3 semantics)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from autoextract import corpus
from autoextract.plans import pipeline
from autoextract.plans.edits import apply_edits, merge_reextract
from autoextract.schema import SHIPPING_SCHEMA


@pytest.fixture(scope="module")
def words(spark):
    gen = corpus.gen_corpus(spark, 30, seed=21).cache()
    gen.count()
    yield corpus.ocr_words_view(gen)
    gen.unpersist()


def _edit_rows(spark, doc_id: str):
    """Wholesale replacement: the doc now reads 注文日：9999年1月1日 only."""
    pdf = pd.DataFrame(
        [
            {
                "doc_id": doc_id,
                "page": 1,
                "word_seq": 0,
                "kind": "text",
                "content": "注文日：9999年1月1日",
                "media_ref": None,
                "rec_score": 1.0,
                "points": [[50.0, 100.0], [250.0, 100.0], [250.0, 130.0], [50.0, 130.0]],
            }
        ]
    )
    return spark.createDataFrame(pdf, schema=corpus.OCR_WORDS_SCHEMA)


def test_apply_edits_wholesale(spark, words):
    some_doc = words.select("doc_id").first()["doc_id"]
    edits = _edit_rows(spark, some_doc)
    merged = apply_edits(words, edits)
    assert merged.where(F.col("doc_id") == some_doc).count() == 1
    assert merged.select("doc_id").distinct().count() == 30


def test_merge_reextract_targets_only_edited(spark, words, tmp_path):
    out = str(tmp_path / "x")
    pipeline.run_extract_job(spark, words, SHIPPING_SCHEMA, out, n_buckets=4)
    before = pipeline.read_extracted(spark, out).cache()
    before.count()

    target = words.orderBy("doc_id").select("doc_id").first()["doc_id"]
    edits = _edit_rows(spark, target)
    n = merge_reextract(spark, words, edits, SHIPPING_SCHEMA, out, n_buckets=4)
    assert n == 1

    after = pipeline.read_extracted(spark, out)
    # edited doc reflects the new words
    got = {
        r["field_path"]: r["value"]
        for r in after.where(F.col("doc_id") == target).collect()
    }
    assert got["order_date"] == "9999年1月1日"
    assert got["operation_info.contract_work"] == ""
    # every other doc is byte-identical to before
    rest_a = before.where(F.col("doc_id") != target)
    rest_b = after.where(F.col("doc_id") != target)
    assert rest_a.exceptAll(rest_b).union(rest_b.exceptAll(rest_a)).count() == 0
    before.unpersist()


def test_merge_noop_on_empty_edits(spark, words, tmp_path):
    out = str(tmp_path / "noop")
    pipeline.run_extract_job(spark, words, SHIPPING_SCHEMA, out, n_buckets=4)
    empty = _edit_rows(spark, "nonexistent").limit(0)
    assert merge_reextract(spark, words, empty, SHIPPING_SCHEMA, out, n_buckets=4) == 0


def test_reader_during_merge_sees_consistent_snapshots(spark, words, tmp_path):
    """A concurrent reader during merge_reextract must only ever observe the
    old snapshot or the new one for the edited doc — never both, never a
    half-replaced bucket (the staged-swap commit protocol's guarantee)."""
    import os
    import threading

    out = str(tmp_path / "rw")
    pipeline.run_extract_job(spark, words, SHIPPING_SCHEMA, out, n_buckets=4)
    target = words.orderBy("doc_id").select("doc_id").first()["doc_id"]
    data_dir = os.path.join(out, "extracted")
    old_val = (
        spark.read.parquet(data_dir)
        .where((F.col("doc_id") == target) & (F.col("field_path") == "order_date"))
        .collect()[0]["value"]
    )

    snapshots, errors = [], []
    stop = threading.Event()

    def reader():
        while not stop.is_set():
            try:
                rows = (
                    spark.read.parquet(data_dir)
                    .where(
                        (F.col("doc_id") == target)
                        & (F.col("field_path") == "order_date")
                    )
                    .collect()
                )
                snapshots.append([r["value"] for r in rows])
            except Exception as exc:  # transient listing race during swap
                errors.append(str(exc))

    t = threading.Thread(target=reader)
    t.start()
    try:
        n = merge_reextract(
            spark, words, _edit_rows(spark, target), SHIPPING_SCHEMA, out, n_buckets=4
        )
    finally:
        stop.set()
        t.join()
    assert n == 1
    assert snapshots, "reader never completed a read"
    for vals in snapshots:
        assert vals in ([old_val], ["9999年1月1日"]), vals
    final = (
        spark.read.parquet(data_dir)
        .where((F.col("doc_id") == target) & (F.col("field_path") == "order_date"))
        .collect()
    )
    assert [r["value"] for r in final] == ["9999年1月1日"]
