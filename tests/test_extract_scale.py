"""Extraction end-to-end vs the generator's extraction oracle
(FIXTURES.md §5: value + word_ids exact, confidence exact here since the
generator knows the matching rule class that must fire)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from autoextract import corpus
from autoextract.operators.extract import extract_fields
from autoextract.operators.layout import order_words
from autoextract.schema import SHIPPING_SCHEMA

N_DOCS = 40


@pytest.fixture(scope="module")
def extracted(spark):
    gen = corpus.gen_corpus(spark, N_DOCS, seed=13)
    words = corpus.ocr_words_view(gen)
    df = extract_fields(order_words(words), SHIPPING_SCHEMA).cache()
    df.count()
    yield df
    df.unpersist()


def test_extraction_matches_generator_oracle(spark, extracted):
    exp = corpus.expected_extracted(spark, N_DOCS, seed=13)
    got_f = extracted.where(F.col("value") != "")
    # exact equality on (doc_id, field_path, value, word_ids, confidence)
    diff = got_f.exceptAll(exp).union(exp.exceptAll(got_f))
    if diff.count() != 0:
        rows = diff.limit(6).collect()
        raise AssertionError(f"oracle mismatch, e.g. {rows}")


def test_unfilled_fields_follow_contract(extracted):
    empties = extracted.where(F.col("value") == "")
    bad = empties.where((F.size("word_ids") != 0) | (F.col("confidence") != 0.0))
    assert bad.count() == 0


def test_every_doc_has_all_scalar_fields(extracted):
    scalar_paths = ["order_date", "operation_info.contract_work", "operation_info.operation_date"]
    per_doc = (
        extracted.where(F.col("field_path").isin(scalar_paths))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n"))
    )
    assert per_doc.where(F.col("n") != 3).count() == 0
    assert per_doc.count() == N_DOCS


def test_multipage_doc_extracts_page1_scalars_once(spark, extracted):
    """Repeated per-page labels must not create extra rows or list items."""
    exp = corpus.expected_extracted(spark, N_DOCS, seed=13)
    n_items_exp = exp.where(F.col("field_path").startswith("shipment_details")).count()
    n_items_got = extracted.where(
        F.col("field_path").startswith("shipment_details") & (F.col("value") != "")
    ).count()
    assert n_items_got == n_items_exp
