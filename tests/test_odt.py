"""ODT ingestion (sources/odt.py)."""

from __future__ import annotations

import io
import zipfile

from autoextract.sources.odt import build_odt, odt_spans, parse_odt


def test_block_vocabulary_order_entities_and_whitespace():
    spans = parse_odt(build_odt([
        ("heading", 1, "Spec & co"),
        ("text", "Body  double space <kept> here."),
        ("table", [["k", "v"], ["a", "3"]]),
        ("image", "Pictures/img.png"),
        ("list", ["one", "two"]),
        ("heading", 2, "Sub"),
    ]))
    assert [(s["seq"], s["kind"]) for s in spans] == [
        (0, "heading"), (1, "text"), (2, "table"), (3, "image"),
        (4, "list"), (5, "heading")]
    assert spans[0]["text"] == "Spec & co" and spans[0]["level"] == 1
    # <text:s/> expands back to the second space; entities unescape
    assert spans[1]["text"] == "Body  double space <kept> here."
    assert spans[2]["text"] == "k | v\na | 3"
    assert spans[3]["media_ref"] == "Pictures/img.png"
    assert spans[4]["text"] == "one\ntwo"
    assert spans[5]["level"] == 2


def test_empty_selfclosing_cell_alignment():
    # a self-closing empty cell must not swallow the next cell's content
    xml = ('<?xml version="1.0"?><office:document-content>'
           "<office:body><office:text>"
           '<table:table table:name="T"><table:table-row>'
           "<table:table-cell/>"
           '<table:table-cell office:value-type="string">'
           "<text:p>full</text:p></table:table-cell>"
           "</table:table-row></table:table>"
           "</office:text></office:body></office:document-content>")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("content.xml", xml)
    spans = parse_odt(buf.getvalue())
    assert spans[0]["text"] == " | full"


def test_odf_whitespace_elements():
    xml = ('<office:document-content><office:body><office:text>'
           "<text:p>a<text:s text:c=\"3\"/>b<text:tab/>c"
           "<text:line-break/>d</text:p>"
           "</office:text></office:body></office:document-content>")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("content.xml", xml)
    assert parse_odt(buf.getvalue())[0]["text"] == "a   b\tc\nd"


def test_containment(spark):
    no_content = io.BytesIO()
    with zipfile.ZipFile(no_content, "w") as z:
        z.writestr("other.xml", "x")
    df = spark.createDataFrame(
        [(1, build_odt([("text", "hello")])),
         (2, b"not a zip"), (3, no_content.getvalue()), (4, None)],
        "doc_id long, payload binary",
    )
    got = odt_spans(df).collect()
    assert [(r["doc_id"], r["text"]) for r in got] == [("1", "hello")]
