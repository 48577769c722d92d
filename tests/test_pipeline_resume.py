"""Resumability + idempotence of the bucket-checkpointed pipeline
(north_rule: "resumable from checkpoint with per-partition lineage + metrics")."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from autoextract import corpus
from autoextract.plans import pipeline
from autoextract.plans.checkpoint import CheckpointStore

N_BUCKETS = 8


@pytest.fixture(scope="module")
def words(spark):
    gen = corpus.gen_corpus(spark, 80, seed=7).cache()
    gen.count()
    yield corpus.ocr_words_view(gen)
    gen.unpersist()


def _spans_sorted(spark, out_dir):
    return {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]]
        for r in pipeline.read_spans(spark, out_dir).collect()
    }


def test_clean_run_and_resume_equivalence(spark, words, tmp_path):
    clean_dir = str(tmp_path / "clean")
    resumed_dir = str(tmp_path / "resumed")

    # clean run: everything in one go
    res = pipeline.run_spans_job(spark, words, clean_dir, n_buckets=N_BUCKETS)
    assert res.buckets_processed == N_BUCKETS
    assert res.rows > 0

    # killed run: only 3 of 8 buckets complete before the "crash"
    partial = pipeline.run_spans_job(
        spark, words, resumed_dir, n_buckets=N_BUCKETS, only_buckets={0, 1, 2}
    )
    assert partial.buckets_processed == 3
    store = CheckpointStore(spark, resumed_dir)
    assert store.done_buckets(pipeline.SPANS_STAGE) == {0, 1, 2}

    # resume: processes exactly the remaining 5
    resume = pipeline.run_spans_job(spark, words, resumed_dir, n_buckets=N_BUCKETS)
    assert resume.buckets_processed == N_BUCKETS - 3

    assert _spans_sorted(spark, resumed_dir) == _spans_sorted(spark, clean_dir)


def test_rerun_after_completion_is_noop(spark, words, tmp_path):
    out = str(tmp_path / "noop")
    pipeline.run_spans_job(spark, words, out, n_buckets=N_BUCKETS)
    again = pipeline.run_spans_job(spark, words, out, n_buckets=N_BUCKETS)
    assert again.buckets_processed == 0
    assert again.rows == 0


def test_lineage_and_checkpoint_rows(spark, words, tmp_path):
    out = str(tmp_path / "lin")
    res = pipeline.run_spans_job(spark, words, out, n_buckets=N_BUCKETS)
    store = CheckpointStore(spark, out)
    ck = store.read()
    assert ck.where(F.col("status") == "done").count() == N_BUCKETS
    assert ck.agg(F.sum("n_rows")).collect()[0][0] == res.rows
    lin = store.read_lineage().collect()
    assert len(lin) == 1
    assert lin[0]["buckets_processed"] == N_BUCKETS
    assert lin[0]["output_rows"] == res.rows
    # input_rows comes from the observe() hook during the write job:
    # words in, docs out — strictly more input rows than output docs
    assert lin[0]["input_rows"] > lin[0]["output_rows"]


def test_extract_job_resume(spark, words, tmp_path):
    from autoextract.schema import SHIPPING_SCHEMA

    clean_dir = str(tmp_path / "xclean")
    resumed_dir = str(tmp_path / "xres")
    pipeline.run_extract_job(spark, words, SHIPPING_SCHEMA, clean_dir, n_buckets=4)
    pipeline.run_extract_job(
        spark, words, SHIPPING_SCHEMA, resumed_dir, n_buckets=4, only_buckets={1}
    )
    pipeline.run_extract_job(spark, words, SHIPPING_SCHEMA, resumed_dir, n_buckets=4)

    a = pipeline.read_extracted(spark, clean_dir)
    b = pipeline.read_extracted(spark, resumed_dir)
    assert a.exceptAll(b).union(b.exceptAll(a)).count() == 0


def test_html_job(spark, tmp_path):
    docs, expected = corpus.gen_html_corpus(spark, 30, seed=3)
    out = str(tmp_path / "html")
    res = pipeline.run_html_job(spark, docs, out, n_buckets=4)
    assert res.rows == 30
    got = pipeline.read_spans(spark, out)
    flat = got.select("doc_id", F.posexplode("spans").alias("seq", "s")).select(
        "doc_id", "seq", "s.kind", "s.text", "s.media_ref"
    )
    exp = expected.select("doc_id", F.col("seq").cast("int").alias("seq"), "kind", "text", "media_ref")
    flat2 = flat.select("doc_id", F.col("seq").cast("int").alias("seq"), "kind", "text", "media_ref")
    assert flat2.exceptAll(exp).union(exp.exceptAll(flat2)).count() == 0


def test_full_job_fused_equals_sequential(spark, words, tmp_path):
    from autoextract.schema import SHIPPING_SCHEMA

    fused_dir = str(tmp_path / "fused")
    seq_dir = str(tmp_path / "seq")
    r_s, r_e = pipeline.run_full_job(spark, words, SHIPPING_SCHEMA, fused_dir, n_buckets=4)
    assert r_s.buckets_processed == 4 and r_e.buckets_processed == 4
    pipeline.run_spans_job(spark, words, seq_dir, n_buckets=4)
    pipeline.run_extract_job(spark, words, SHIPPING_SCHEMA, seq_dir, n_buckets=4)

    for reader in (pipeline.read_spans, pipeline.read_extracted):
        a, b = reader(spark, fused_dir), reader(spark, seq_dir)
        assert a.exceptAll(b).union(b.exceptAll(a)).count() == 0

    # rerun is a noop on both stages
    r_s2, r_e2 = pipeline.run_full_job(spark, words, SHIPPING_SCHEMA, fused_dir, n_buckets=4)
    assert r_s2.buckets_processed == 0 and r_e2.buckets_processed == 0


def test_full_job_desynced_stages_fall_back(spark, words, tmp_path):
    from autoextract.schema import SHIPPING_SCHEMA

    out = str(tmp_path / "desync")
    # spans fully done, extract untouched → fused path must not be taken
    pipeline.run_spans_job(spark, words, out, n_buckets=4)
    r_s, r_e = pipeline.run_full_job(spark, words, SHIPPING_SCHEMA, out, n_buckets=4)
    assert r_s.buckets_processed == 0
    assert r_e.buckets_processed == 4
    assert pipeline.read_extracted(spark, out).count() > 0
