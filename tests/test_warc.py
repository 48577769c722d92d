"""WARC ingestion: every compression layout × HTTP body encoding must
round-trip the document text exactly; corruption is contained per file."""

from __future__ import annotations

import gzip

import pytest

from autoextract.sources.warc import (
    build_warc_segment,
    parse_warc_bytes,
    render_docs_to_warc,
    warc_records,
    warc_text_docs,
)

TEXT = "the quick brown fox jumps over the lazy dog " * 8  # > one chunk


@pytest.mark.parametrize("layout", ["plain", "gzip", "members"])
@pytest.mark.parametrize("encoding", ["identity", "chunked", "gzip"])
def test_roundtrip_all_shapes(layout, encoding):
    seg = build_warc_segment("d1", TEXT, layout, encoding)
    rows = parse_warc_bytes("d1", seg)
    assert [r["warc_type"] for r in rows] == ["warcinfo", "request", "response"]
    resp = rows[2]
    assert resp["http_status"] == 200
    assert resp["mime"] == "text/plain"
    assert resp["target_uri"] == "https://example.org/d1"
    assert resp["body"].decode("utf-8") == TEXT
    assert all(r["valid"] for r in rows)


def test_members_layout_is_concatenated_gzip():
    seg = build_warc_segment("d1", TEXT, "members", "identity")
    assert seg[:2] == b"\x1f\x8b"
    # three records -> three independent members
    assert seg.count(b"\x1f\x8b\x08") == 3


def test_deflate_content_encoding():
    import zlib

    body = TEXT.encode()
    coded = zlib.compress(body)
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n"
        b"Content-Encoding: deflate\r\n"
        b"Content-Length: " + str(len(coded)).encode() + b"\r\n\r\n" + coded
    )
    rec = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://x/\r\n"
        b"Content-Type: application/http; msgtype=response\r\n"
        b"Content-Length: " + str(len(http)).encode() + b"\r\n\r\n" + http + b"\r\n\r\n"
    )
    rows = parse_warc_bytes("d", rec)
    assert rows[0]["body"].decode() == TEXT


@pytest.mark.parametrize(
    "mutate",
    [
        lambda b: b[: len(b) // 2],                       # truncated
        lambda b: b"JUNK" + b[4:],                        # bad magic
        lambda b: b.replace(b"Content-Length: ", b"Content-Length: 9", 1),
        lambda b: gzip.compress(b)[:-8],                  # truncated gzip
    ],
)
def test_malformed_contained(mutate):
    seg = build_warc_segment("d1", TEXT, "plain", "identity")
    rows = parse_warc_bytes_safe("d1", mutate(seg))
    assert rows and rows[-1]["valid"] is False and rows[-1]["err"]


def parse_warc_bytes_safe(doc_id, buf):
    try:
        return parse_warc_bytes(doc_id, buf)
    except Exception as exc:
        return [{"valid": False, "err": str(exc) or type(exc).__name__}]


def test_spark_pipeline_roundtrip(spark):
    docs = spark.createDataFrame(
        [(f"doc-{i}", f"document {i} body text " * 5) for i in range(18)],
        "doc_id string, text string",
    ).repartition(4)
    raw = render_docs_to_warc(docs)
    recs = warc_records(raw)
    got = {
        r["doc_id"]: r
        for r in recs.where("warc_type = 'response'").collect()
    }
    assert len(got) == 18
    for i in range(18):
        assert got[f"doc-{i}"]["valid"]
        assert bytes(got[f"doc-{i}"]["body"]).decode() == f"document {i} body text " * 5
    # warcinfo/request records parsed but typed distinctly
    assert recs.where("warc_type = 'warcinfo'").count() == 18
    texts = {r["doc_id"]: r["text"] for r in warc_text_docs(raw).collect()}
    assert texts["doc-7"] == "document 7 body text " * 5


def test_spark_malformed_file_yields_error_row(spark):
    raw = spark.createDataFrame(
        [("bad-1", b"WARC/1.0\r\nno blank line ever")],
        "doc_id string, content binary",
    )
    rows = warc_records(raw).collect()
    assert len(rows) == 1 and rows[0]["valid"] is False


def test_html_fixture_page_strips_to_source_text():
    from autoextract.operators.html import html_to_spans
    from autoextract.sources.warc import doc_html_page

    text = "alpha <beta> & gamma   delta " * 6
    spans = html_to_spans("d9", doc_html_page("d9", text))
    texts = [t for k, t, _ in spans if k == "text"]
    media = [r for k, _, r in spans if k == "media"]
    assert " ".join(texts) == " ".join(text.split())  # no boilerplate leak
    assert len(texts) == 2 and media == ["https://example.org/d9/img.png"]
    assert "nav link" not in " ".join(texts) and "corpus" not in " ".join(texts)


def test_html_response_routes_to_strip_html(spark):
    from pyspark.sql import functions as F

    from autoextract.operators.html import strip_html
    from autoextract.sources.warc import _http_response, _warc_record

    html = (
        "<html><body><article><p>real content paragraph with plenty of "
        "words to win the density vote</p></article></body></html>"
    )
    http = _http_response(html.encode(), "identity", "text/html")
    rec = _warc_record(
        "response", "https://x/p", "2024-01-01T00:00:00Z", http,
        "application/http; msgtype=response", "r1",
    )
    raw = spark.createDataFrame(
        [("h1", rec)], "doc_id string, content binary"
    )
    recs = warc_records(raw)
    html_docs = recs.where(
        (F.col("warc_type") == "response") & (F.col("mime") == "text/html")
    ).select("doc_id", F.decode("body", "UTF-8").alias("html"))
    spans = strip_html(html_docs).collect()
    joined = " ".join(s["text"] for s in spans if s["text"])
    assert "real content paragraph" in joined


def test_resolve_href_branches():
    from autoextract.operators.html import resolve_href as r

    base = "https://example.org/a/b/c"
    assert r(base, "/x") == "https://example.org/x"
    assert r(base, "x/y") == "https://example.org/a/b/x/y"
    assert r(base, "../x") == "https://example.org/a/x"
    assert r(base, "../../../x") == "https://example.org/x"  # can't go above root
    assert r(base, "//cdn.example/img") == "https://cdn.example/img"
    assert r(base, "./x?q=1") == "https://example.org/a/b/x?q=1"
    assert r(base, "http://other/") == "http://other/"
    assert r(base, "mailto:x@y") is None
    assert r(base, "javascript:void(0)") is None
    assert r(base, "#frag") is None and r(base, "") is None
    with pytest.raises(ValueError):
        r("not-absolute", "/x")


def test_extract_links_order_anchor_and_containment(spark):
    from autoextract.operators.html import extract_links

    rows = spark.createDataFrame(
        [
            (
                "d1",
                "<nav><a href='/one'> first  link </a></nav>"
                "<p><a href='two'><b>second</b> link</a>"
                "<a name='no-href'>skipped</a>"
                "<a href='mailto:x'>mail</a></p>",
                "https://h.example/base/page",
            ),
            ("d2", None, "https://h.example/"),  # contained, zero rows
        ],
        "doc_id string, html string, base_url string",
    )
    got = extract_links(rows).collect()
    assert [(r["doc_id"], r["seq"], r["href"], r["anchor"], r["url"]) for r in got] == [
        ("d1", 0, "/one", "first link", "https://h.example/one"),
        ("d1", 1, "two", "second link", "https://h.example/base/two"),
        ("d1", 2, "mailto:x", "mail", None),
    ]


def test_link_graph_feeds_pagerank(spark):
    from pyspark.sql import functions as F

    from autoextract.operators.graph import pagerank
    from autoextract.operators.html import extract_links
    from autoextract.sources.warc import render_docs_to_html

    docs = spark.createDataFrame(
        [(str(i), f"text body {i} " * 8) for i in range(12)],
        "doc_id string, text string",
    )
    links = extract_links(render_docs_to_html(docs))
    edges = links.where(F.col("url").isNotNull()).select(
        F.col("doc_id").alias("src"), F.col("url").alias("dst")
    )
    pr = pagerank(edges, n_iter=3)
    ranks = {r["node"]: r["rank"] for r in pr.collect()}
    assert abs(sum(ranks.values()) - 1.0) < 1e-9
    # every page links to /home, so it must outrank any single doc page
    assert ranks["https://example.org/home"] > max(
        v for k, v in ranks.items() if k in {str(i) for i in range(12)}
    )


@pytest.mark.parametrize("charset", ["iso-8859-1", "windows-1252", "utf-16", "utf-8"])
def test_declared_charset_decodes_jvm_side(spark, charset):
    from autoextract.sources.warc import build_warc_segment, warc_text_docs

    text = "café naïve – déjà vu ünd æther " * 4
    if charset in ("iso-8859-1", "windows-1252"):
        # en-dash: absent from latin-1; cp1252 puts it in the 0x80-0x9F
        # range where the JVM-side latin-1 approximation degrades
        text = text.replace("–", "-")
    seg = build_warc_segment("c1", text, "plain", "identity", charset=charset)
    raw = spark.createDataFrame([("c1", seg)], "doc_id string, content binary")
    got = warc_text_docs(raw).collect()
    assert got[0]["text"] == text


def test_charset_parsed_from_content_type():
    from autoextract.sources.warc import _charset_of

    assert _charset_of("text/html; charset=ISO-8859-1") == "iso-8859-1"
    assert _charset_of('text/plain; charset="utf-16le"') == "utf-16le"
    assert _charset_of("text/plain") == ""
    assert _charset_of("text/plain; boundary=x; charset=UTF-8") == "utf-8"
