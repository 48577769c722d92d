"""Wikipedia-dump ingestion (`sources/wikidump.py`): wikitext cleanup
rules (nested templates, file-link captions with nested links, refs,
headings, quotes), page parsing (ns/redirect/id), containment, and the
Spark kernel."""

from __future__ import annotations

from autoextract.sources.wikidump import (
    clean_wikitext,
    parse_wikidump,
    to_wikidump,
    wiki_pages_table,
)


def test_nested_templates_unwind():
    assert clean_wikitext("a {{x|{{y|{{z}}}}}} b") == "a  b"


def test_ref_variants_dropped():
    s = 'k<ref name="a">body {{cite|x}}</ref>l<ref group=n/>m'
    assert clean_wikitext(s) == "klm"


def test_file_caption_with_nested_link():
    s = "pre [[File:X.jpg|thumb|see [[inner|label]] now]]post"
    assert clean_wikitext(s) == "pre post"


def test_pipe_and_plain_links():
    assert clean_wikitext("[[a|b]] and [[c]]") == "b and c"


def test_quotes_heading_blanks():
    s = "'''bold''' ''it''\n=== H3 ===\n\n\n\n\nend"
    assert clean_wikitext(s) == "bold it\nH3\n\nend"


def test_comment_dropped():
    assert clean_wikitext("a<!-- hidden {{t}} -->b") == "ab"


def test_parse_pages_fields():
    xml = to_wikidump([
        {"title": "A & B", "page_id": 5, "text": "x"},
        {"title": "R", "page_id": 6, "redirect": "A & B", "text": "#REDIRECT [[A & B]]"},
        {"title": "Talk:A", "page_id": 7, "ns": 1, "text": "t"},
    ])
    ps = parse_wikidump(xml)
    assert [p["page_id"] for p in ps] == [5, 6, 7]
    assert ps[0]["title"] == "A & B" and not ps[0]["redirect"]
    assert ps[1]["redirect"] is True
    assert ps[2]["ns"] == 1
    # entity round-trip through the escaped <text> node
    assert ps[1]["clean_text"] == "#REDIRECT A & B"


def test_containment_zero_rows():
    assert parse_wikidump("<page><title>t</title>") == []
    assert parse_wikidump("") == []


def test_kernel(spark):
    xml = to_wikidump([{"title": "T", "page_id": 1, "text": "'''T''' body"}])
    df = spark.createDataFrame(
        [(1, xml), (2, "garbage"), (3, None)], "doc_id long, xml string"
    )
    out = wiki_pages_table(df).collect()
    assert len(out) == 1
    assert out[0]["clean_text"] == "T body"
