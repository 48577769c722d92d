"""HTML boilerplate strip (SURVEY.md §2 P6, FIXTURES.md §3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from autoextract import corpus
from autoextract.operators.html import html_spans_table, html_to_spans, strip_html


def test_fixture_spans_exact():
    got = html_to_spans(corpus.HTML_DOC_ID, corpus.HTML_FIXTURE)
    assert got == corpus.HTML_EXPECTED


def test_boilerplate_never_leaks():
    got = html_to_spans(corpus.HTML_DOC_ID, corpus.HTML_FIXTURE)
    text = " ".join(t for _, t, _ in got if t)
    for bad in ("Home", "About", "Login", "Site Title", "Copyright", "Related post", "Terms"):
        assert bad not in text, bad


def test_malformed_html_does_not_crash():
    assert html_to_spans("x", "<div><p>unclosed <b>tags <img src='a.png'>") == [
        ("text", "unclosed tags", None),
        ("media", None, "a.png"),
    ]
    assert html_to_spans("x", "") == []
    assert html_to_spans("x", "plain text no tags") == [("text", "plain text no tags", None)]


def test_figure_uses_nested_img_src():
    html = "<body><article><p>t</p><figure><img src='f.png'><figcaption>c</figcaption></figure></article></body>"
    got = html_to_spans("x", html)
    assert ("media", None, "f.png") in got


def test_distributed_corpus_equality(spark):
    docs, expected = corpus.gen_html_corpus(spark, 40, seed=42)
    got = strip_html(docs)
    exp = expected.select("doc_id", "seq", "kind", "text", "media_ref")
    diff = got.exceptAll(exp).union(exp.exceptAll(got))
    assert diff.count() == 0


def test_html_spans_table_invariants(spark):
    docs, _ = corpus.gen_html_corpus(spark, 20, seed=1)
    table = html_spans_table(docs)
    bad = table.where(
        F.exists(
            "spans",
            lambda s: ((s["kind"] == "text") & (F.length(F.trim(s["text"])) == 0)),
        )
    )
    assert bad.count() == 0
    # offsets dense
    dense = table.where(
        ~(
            F.transform("spans", lambda s, i: s["offset"] == i.cast("int"))
            == F.transform("spans", lambda s: F.lit(True))
        )
    )
    assert dense.count() == 0


def test_parser_failure_emits_error_span(spark):
    """O6 containment: a document whose parse raises yields a flagged
    ("error", ...) span — distinguishable from an empty document, never a
    task failure (VERDICT r1 #10)."""
    # a non-string payload makes HTMLParser.feed raise — the kernel contract
    # must contain it per-document
    got = html_to_spans("x", 12345)
    assert len(got) == 1 and got[0][0] == "error"
    assert "html_parse_error" in got[0][1]

    import pandas as pd

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": ["bad", "good"],
                      "html": [None, "<html><body><article><p>fine text here</p></article></body></html>"]}),
        schema="doc_id string, html string",
    )
    rows = strip_html(docs).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # None html parses as empty (no rows), good doc yields text, no crashes
    assert "bad" not in by_doc or all(r["kind"] != "error" for r in by_doc["bad"])
    assert any(r["kind"] == "text" and "fine text here" in r["text"] for r in by_doc["good"])
