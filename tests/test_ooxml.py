"""DOCX / XLSX ingestion (sources/docx.py, sources/xlsx.py)."""

from __future__ import annotations

from autoextract.sources.docx import (
    build_docx,
    docx_spans,
    parse_docx,
    parse_docx_tables,
)
from autoextract.sources.xlsx import build_xlsx, parse_xlsx, xlsx_cells


def test_docx_span_kinds_order_and_entities():
    d = build_docx([
        ("heading", 1, "Title"),
        ("text", "A & B <escaped>."),
        ("table", [["a", "b"], ["c", "d"]]),
        ("image",),
        ("heading", 2, "Sub"),
    ])
    spans = parse_docx(d)
    assert [(s["seq"], s["kind"]) for s in spans] == [
        (0, "heading"), (1, "text"), (2, "table"), (3, "image"), (4, "heading")]
    assert spans[1]["text"] == "A & B <escaped>."
    assert spans[2]["text"] == "a | b\nc | d"
    assert spans[0]["level"] == 1 and spans[4]["level"] == 2
    assert parse_docx_tables(d) == [
        {"table_id": 0, "row": 0, "col": 0, "text": "a"},
        {"table_id": 0, "row": 0, "col": 1, "text": "b"},
        {"table_id": 0, "row": 1, "col": 0, "text": "c"},
        {"table_id": 0, "row": 1, "col": 1, "text": "d"},
    ]


def test_docx_containment(spark):
    df = spark.createDataFrame(
        [(1, build_docx([("text", "hello")])), (2, b"not a zip"), (3, None)],
        "doc_id long, payload binary",
    )
    got = docx_spans(df).collect()
    assert [(r["doc_id"], r["text"]) for r in got] == [("1", "hello")]


def test_xlsx_shared_inline_and_sparse():
    x = build_xlsx([["h", 1], [None, 2.5], ["h", "t"]])
    cells = {(c["row"], c["col"]): (c["value"], c["is_number"])
             for c in parse_xlsx(x)}
    assert cells[(0, 0)] == ("h", False) and cells[(0, 1)] == ("1", True)
    assert (1, 0) not in cells and cells[(1, 1)] == ("2.5", True)
    assert cells[(2, 0)] == ("h", False)      # shared-string dedup
    y = build_xlsx([["only <inline>"]], inline_strings=True)
    assert parse_xlsx(y)[0]["value"] == "only <inline>"


def test_xlsx_col_letters_beyond_z():
    from autoextract.sources.xlsx import _col_index, _col_letters

    for i in (0, 25, 26, 27, 51, 52, 701, 702):
        assert _col_index(_col_letters(i)) == i


def test_xlsx_kernel_containment(spark):
    df = spark.createDataFrame(
        [(1, build_xlsx([["v"]])), (2, b"junk")],
        "doc_id long, payload binary",
    )
    got = xlsx_cells(df).collect()
    assert len(got) == 1 and got[0]["value"] == "v"


def test_pptx_slide_order_and_entities(spark):
    from autoextract.sources.pptx import build_pptx, parse_pptx, pptx_slides

    # 11 slides: numeric part ordering must beat lexicographic
    # (slide10.xml < slide2.xml as strings)
    d = build_pptx([[f"s{i}"] for i in range(1, 12)])
    got = parse_pptx(d)
    assert [r["slide"] for r in got] == list(range(1, 12))
    e = build_pptx([["A & <b>", "", "second"]])
    rows = parse_pptx(e)
    assert [(r["seq"], r["text"]) for r in rows] == [
        (0, "A & <b>"), (1, "second")]    # empty paragraph dropped
    df = spark.createDataFrame(
        [(1, build_pptx([["x"]])), (2, b"junk")],
        "doc_id long, payload binary",
    )
    assert pptx_slides(df).count() == 1


def test_epub_spine_order_beats_zip_order(spark):
    from autoextract.sources.epub import build_epub, epub_chapters, parse_epub

    chs = [f"<html><body><p>chapter {i}</p></body></html>" for i in range(3)]
    e = build_epub(chs)   # zip members written in REVERSE of the spine
    got = parse_epub(e)
    assert [c["chapter"] for c in got] == [0, 1, 2]
    assert all(f"chapter {i}" in c["html"] for i, c in enumerate(got))
    assert got[0]["path"] == "OEBPS/ch0.xhtml"
    # css item in the manifest is not a chapter
    assert len(got) == 3
    assert parse_epub(b"not epub") == []
    df = spark.createDataFrame(
        [(1, e), (2, b"junk")], "doc_id long, payload binary")
    assert epub_chapters(df).count() == 3


def test_wds_tar_samples_and_containment(spark):
    from autoextract.sources.webdataset import (
        build_wds_tar, parse_wds_tar, wds_members)

    shard = build_wds_tar({
        "000001": {"txt": b"hello", "jpg": b"\xff\xd8jpeg", "seg.png": b"p"},
        "000002": {"txt": b"world"},
    })
    got = parse_wds_tar(shard)
    assert [(m["sample_key"], m["ext"]) for m in got] == [
        ("000001", "jpg"), ("000001", "seg.png"), ("000001", "txt"),
        ("000002", "txt")]
    assert got[2]["payload"] == b"hello" and got[2]["n_bytes"] == 5
    assert parse_wds_tar(b"definitely not tar") == []
    df = spark.createDataFrame(
        [(1, shard), (2, b"junk")], "doc_id long, payload binary")
    assert wds_members(df).count() == 4
