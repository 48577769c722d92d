"""Physical-plan audits: the plan shapes that matter at 100 TB.

Correct results with the wrong plan do not survive a 1000-executor scale-up;
these tests pin the load-bearing optimizer outcomes (predicate pushdown into
the parquet scan, nested/column pruning, broadcast of small dims, bounded
exchange counts in the span pipeline)."""

from __future__ import annotations

import pytest

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"


def plan_str(df, mode: str = "formatted") -> str:
    jmode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(jmode)


def test_filter_pushed_to_parquet_scan(spark):
    p = plan_str(E._q_token_offsets(spark, SF))
    assert "PushedFilters" in p
    assert "LessThan(doc_id,100)" in p or "lessthan(doc_id,100)" in p.lower()


def test_column_pruning_on_scan(spark):
    p = plan_str(E._q_word_count(spark, SF))
    # only the two needed columns reach the scan — lang/source/n_chars pruned
    assert "ReadSchema" in p
    read = [l for l in p.splitlines() if "ReadSchema" in l][0]
    assert "doc_id" in read and "text" in read
    assert "lang" not in read and "n_chars" not in read


def test_small_dim_broadcast(spark):
    p = plan_str(E._q_dim_broadcast_join(spark, SF))
    assert "BroadcastHashJoin" in p


def test_anti_join_strategy(spark):
    p = plan_str(E._q_pending_anti_join(spark, SF))
    assert "LeftAnti" in p


def test_span_pipeline_exchange_budget(spark):
    """order_words + assemble_spans = exactly 2 exchanges (the doc_id
    repartition and the final groupBy) — no window sort, no extra shuffle.
    A third exchange appearing means someone broke the single-pass design."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    from autoextract.operators.layout import assemble_spans, order_words

    spans = assemble_spans(order_words(E._docs_to_word_boxes(docs)))
    p = plan_str(spans, "simple")
    # repartition-by-id counts once even under AQE re-plan markers
    n_exchanges = p.count("Exchange")
    assert n_exchanges <= 3, f"{n_exchanges} exchanges:\n{p}"
    assert "Window" not in p


def test_whole_stage_codegen_in_scalar_path(spark):
    p = plan_str(E._q_quality(spark, SF))
    # formatted mode marks whole-stage codegen with "[codegen id : N]"
    assert "codegen id" in p


def test_minhash_zero_shuffle_projection(spark):
    """r6: the signature is a per-doc ``array_min(transform(...))``
    projection chain — no explode, no string-buffer SortAggregate, and the
    only exchange is the query's small-file re-spread. The staged
    projections keep ``split()`` out of the shingle lambda (each md5 seed
    appears once, not once per comparison)."""
    p = plan_str(E._q_minhash_signatures(spark, SF), "simple")
    assert "array_min" in p
    assert "SortAggregate" not in p and "HashAggregate" not in p
    assert "Generate" not in p  # no shingle explode
    assert p.count("Exchange") <= 1  # the _spread repartition only
    # one md5 per hash seed in one projection — not re-inlined per window
    assert p.count("md5") == 4


def test_srp_bucket_prune_before_rerank(spark):
    """ANN path must filter on the bucket BEFORE the cosine rerank."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    from autoextract.operators.similarity import ann_topk_via_srp

    q = [0.1] * 64
    p = plan_str(ann_topk_via_srp(emb, q, dim=64, k=5, n_planes=4))
    # the bucket filter sits immediately above the Arrow UDF eval (the alias
    # is inlined away), and the cosine rerank only sees surviving rows
    assert "ArrowEvalPython" in p
    i_udf = p.index("ArrowEvalPython")
    assert "Filter" in p[: i_udf + 400]
    assert "TakeOrderedAndProject" in p  # top-k never materializes a full sort

def test_fused_spans_single_exchange(spark):
    """spans_table = exactly ONE exchange (the doc_id repartition): the
    kernel assembles documents in-pass, so no groupBy stage exists."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    from autoextract.operators.layout import spans_table

    p = plan_str(spans_table(E._docs_to_word_boxes(docs)), "simple")
    assert p.count("Exchange") <= 2  # doc repartition + source re-spread
    assert "HashAggregate" not in p and "ObjectHashAggregate" not in p
    assert "Window" not in p


def test_pdf_query_filter_pushdown(spark):
    """The pdf round-trip's doc_id < 300 filter reaches the parquet scan —
    at 10^12 docs the render stage must never see unselected rows."""
    p = plan_str(E._q_pdf_ingest_spans(spark, SF))
    assert "PushedFilters" in p
    assert "LessThan(doc_id,300)" in p or "lessthan(doc_id,300)" in p.lower()


def test_winnowing_hash_once_shape(spark):
    """Winnowing must hash each shingle ONCE: the hash array lands in a
    staged projection and the sliding min is an ``array_min(slice(...))``
    per window position over that attribute — no Python UDF, no SQL window
    (its full-stream exchange + sort are gone), and no global distinct
    exchange (fps are deduped per doc before the explode). The explode must
    be ``explode_outer`` so InferFiltersFromGenerate cannot inline the
    whole chain into a per-row size()>0 predicate (measured 20 s vs 0.3 s
    at sf0.01)."""
    p = plan_str(E._q_winnowing(spark, SF), "simple")
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
    assert "Generate" in p  # the final fps explode
    assert "Window" not in p
    assert p.count("Exchange") <= 1  # the _spread repartition only
    # md5 appears once (one transform over the shingle attribute), not
    # re-inlined into the per-window lambda or an inferred Generate filter
    assert p.count("md5") == 1
