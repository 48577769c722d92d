"""RTF ingestion (sources/rtf.py)."""

from __future__ import annotations

from autoextract.sources.rtf import build_rtf, parse_rtf, rtf_spans


def test_rtf_span_kinds_order_escapes_and_tables():
    b = build_rtf([
        ("heading", 1, "Memo"),
        ("text", "Re: café — item {3} \\ok"),
        ("table", [["k", "5"], ["v", "7"]]),
        ("image",),
        ("heading", 2, "Close"),
    ])
    spans = parse_rtf(b)
    assert [(s["seq"], s["kind"]) for s in spans] == [
        (0, "heading"), (1, "text"), (2, "table"), (3, "image"),
        (4, "heading")]
    # \'e9, 舒? and \{ \} \\ escapes all round-trip
    assert spans[1]["text"] == "Re: café — item {3} \\ok"
    assert spans[2]["text"] == "k | 5\nv | 7"
    assert spans[0]["level"] == 1 and spans[4]["level"] == 2


def test_rtf_unicode_fallback_skip_and_destinations():
    # default \uc1: one fallback char dropped after \uN
    assert parse_rtf(b"{\\rtf1 a\\u8212?b\\par}")[0]["text"] == "a—b"
    # \uc2: two fallback chars dropped, hex escape counts as one
    got = parse_rtf(b"{\\rtf1\\uc2 a\\u8212\\'3f?b\\par}")
    assert got[0]["text"] == "a—b"
    # skip destinations and ignorable {\*\...} groups contribute no text
    got = parse_rtf(
        b"{\\rtf1{\\fonttbl{\\f0 Arial;}}{\\*\\mystery junk}body\\par}"
    )
    assert [s["text"] for s in got] == ["body"]
    # control symbols: \~ nbsp, \_ hyphen, \line newline, \tab tab
    got = parse_rtf(b"{\\rtf1 a\\~b\\_c\\line d\\tab e\\par}")
    assert got[0]["text"] == "a\N{NO-BREAK SPACE}b-c\nd\te"


def test_rtf_containment(spark):
    df = spark.createDataFrame(
        [(1, build_rtf([("text", "hello")])), (2, b"not rtf"), (3, None)],
        "doc_id long, payload binary",
    )
    got = rtf_spans(df).collect()
    assert [(r["doc_id"], r["text"]) for r in got] == [("1", "hello")]
