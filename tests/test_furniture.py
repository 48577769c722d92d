"""Page-furniture removal + hyphenation repair (operators/furniture.py).

The reference pipeline emits OCR words verbatim — running headers, page
numbers, and split words land in the extracted text
(``ocr-containers/ocr/app/ocr.py`` has no repeat/hyphen handling).  These
tests pin the cleanup semantics the driver oracle also checks.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from autoextract.operators.furniture import (
    lines_table,
    mark_furniture,
    repair_hyphenation,
    strip_furniture,
)

H = 800.0


def _word(doc, page, seq, content, x0, y0, block_id=0, line_id=0):
    return (doc, page, seq, "text", content, None, 1.0,
            float(x0), float(y0), float(x0) + 80.0, float(y0) + 16.0,
            block_id, line_id)


_COLS = (
    "doc_id string, page int, seq int, kind string, content string, "
    "media_ref string, rec_score double, x0 double, y0 double, "
    "x1 double, y1 double, block_id int, line_id int"
)


def _lines_df(spark, rows):
    """rows: (doc_id, page, seq0, y0, text) → lines-table shape."""
    return spark.createDataFrame(
        [(d, p, s, float(y), float(y) + 16.0, t) for d, p, s, y, t in rows],
        "doc_id string, page int, seq0 int, y0 double, y1 double, text string",
    )


def test_lines_table_reassembles_in_reading_order(spark):
    rows = [
        _word("d1", 1, 2, "gamma", 220, 100, 0, 0),
        _word("d1", 1, 0, "alpha", 40, 100, 0, 0),
        _word("d1", 1, 1, "beta", 130, 100, 0, 0),
        _word("d1", 1, 3, "below", 40, 200, 0, 1),
        _word("d1", 1, 4, "media", 130, 200, 0, 1),
    ]
    df = spark.createDataFrame(rows, _COLS)
    # a media row in the same line must be excluded
    media = spark.createDataFrame(
        [("d1", 1, 5, "image", "", "m1", 1.0, 220.0, 200.0, 300.0, 216.0, 0, 1)],
        _COLS,
    )
    out = {
        (r["page"], r["line_id"]): r["text"]
        for r in lines_table(df.unionByName(media)).collect()
    }
    assert out == {(1, 0): "alpha beta gamma", (1, 1): "below media"}


def _fixture_lines(spark, n_pages=4):
    rows = []
    for p in range(1, n_pages + 1):
        rows.append(("d", p, 0, 20, "Running Header"))
        rows.append(("d", p, 10, 300, f"body text page {p} varies"))
        rows.append(("d", p, 20, 420, "repeated body notice"))
        rows.append(("d", p, 30, 760, f"Page {p} of {n_pages}"))
    rows.append(("d", 1, 5, 60, "one off stamp"))
    return _lines_df(spark, rows)


def test_mark_furniture_headers_footers_flagged(spark):
    marked = mark_furniture(_fixture_lines(spark), H)
    got = {(r["page"], r["text"]): (r["band"], r["is_furniture"])
           for r in marked.collect()}
    assert got[(2, "Running Header")] == ("header", True)
    assert got[(3, "Page 3 of 4")] == ("footer", True)  # digit-folded match
    # band trap: body repetition is never furniture
    assert got[(2, "repeated body notice")] == ("body", False)
    # frequency trap: one-page stamp in the header band survives
    assert got[(1, "one off stamp")] == ("header", False)
    assert got[(2, "body text page 2 varies")] == ("body", False)


def test_mark_furniture_single_page_doc_never_flags(spark):
    lines = _lines_df(spark, [("s", 1, 0, 20, "Header"), ("s", 1, 30, 760, "Page 1 of 1")])
    marked = mark_furniture(lines, H)
    assert all(not r["is_furniture"] for r in marked.collect())


def test_mark_furniture_min_page_frac(spark):
    # header present on 2 of 6 pages: >= min_pages but < ceil(6*0.5)=3
    rows = [("d", p, 10, 300, f"body {p}") for p in range(1, 7)]
    rows += [("d", 1, 0, 20, "Rare Header"), ("d", 2, 0, 20, "Rare Header")]
    marked = mark_furniture(_lines_df(spark, rows), H)
    rare = [r for r in marked.collect() if r["text"] == "Rare Header"]
    assert len(rare) == 2 and all(not r["is_furniture"] for r in rare)


def test_strip_furniture_keeps_body(spark):
    kept = strip_furniture(_fixture_lines(spark), H)
    texts = {r["text"] for r in kept.collect()}
    assert "Running Header" not in texts
    assert not any(t.startswith("Page ") for t in texts)
    assert "repeated body notice" in texts and "one off stamp" in texts


def _repair(spark, lines):
    df = _lines_df(spark, [("d", 1, i, 100 + 40 * i, t) for i, t in enumerate(lines)])
    out = repair_hyphenation(df).orderBy("seq0").collect()
    return [r["text"] for r in out]


def test_hyphenation_plain_merge(spark):
    assert _repair(spark, ["an exam-", "ple of text"]) == [
        "an example", "of text"]


def test_hyphenation_capital_blocks_merge(spark):
    assert _repair(spark, ["the docu-", "Ment stays"]) == [
        "the docu-", "Ment stays"]


def test_hyphenation_compound_keeps_hyphen(spark):
    assert _repair(spark, ["state-of-the-", "art systems"]) == [
        "state-of-the-art", "systems"]


def test_hyphenation_digit_tail_never_merges(spark):
    assert _repair(spark, ["in 2026-", "era text"]) == [
        "in 2026-", "era text"]


def test_hyphenation_raw_preserved_and_page_scoped(spark):
    df = spark.createDataFrame(
        [("d", 1, 0, 100.0, 116.0, "cross page exam-"),
         ("d", 2, 0, 100.0, 116.0, "ple never merges")],
        "doc_id string, page int, seq0 int, y0 double, y1 double, text string",
    )
    out = {r["page"]: (r["text"], r["text_raw"])
           for r in repair_hyphenation(df).collect()}
    # hyphen at a page boundary is left alone (different window partition)
    assert out[1] == ("cross page exam-", "cross page exam-")
    assert out[2] == ("ple never merges", "ple never merges")


def test_hyphenation_partition_invariance(spark):
    lines = ["alpha beta exam-", "ple gamma docu-", "Ment delta", "omega-", "tail end"]
    a = _repair(spark, lines)
    df = _lines_df(spark, [("d", 1, i, 100 + 40 * i, t) for i, t in enumerate(lines)])
    b = [r["text"] for r in repair_hyphenation(df.repartition(7)).orderBy("seq0").collect()]
    assert a == b


# ----------------------------------------------------------------------
# heading detection / outline
# ----------------------------------------------------------------------

def _hlines(spark, rows):
    """rows: (doc_id, seq0, y0, h, text)."""
    return spark.createDataFrame(
        [(d, 1, s, float(y), float(y) + float(h), t) for d, s, y, h, t in rows],
        "doc_id string, page int, seq0 int, y0 double, y1 double, text string",
    )


def test_headings_levels_by_relative_height(spark):
    from autoextract.operators.furniture import document_outline

    rows = [("d", 0, 20, 32, "Title")]
    rows += [("d", 10 * s, 100 + 100 * s, 24, f"Section {s}") for s in range(2)]
    rows += [("d", 50 + b, 400 + 30 * b, 16, f"body {b}") for b in range(5)]
    out = {r["text"]: r["level"] for r in document_outline(_hlines(spark, rows)).collect()}
    assert out == {"Title": 1, "Section 0": 2, "Section 1": 2}


def test_headings_median_is_per_document(spark):
    from autoextract.operators.furniture import detect_headings

    # doc "big" has 32px body: its 48px line is only 1.5x -> level 2, and
    # a 32px line is body there while the same height is a TITLE in "small"
    rows = [("big", i, 100 + 40 * i, 32, f"b{i}") for i in range(5)]
    rows += [("big", 9, 400, 48, "BigSection")]
    rows += [("small", i, 100 + 20 * i, 16, f"s{i}") for i in range(5)]
    rows += [("small", 9, 300, 32, "SmallTitle")]
    got = {(r["doc_id"], r["text"]): r["level"]
           for r in detect_headings(_hlines(spark, rows)).collect()}
    assert got[("big", "BigSection")] == 2
    assert got[("small", "SmallTitle")] == 1
    assert got[("big", "b0")] is None
