"""LaTeX ingestion (sources/latex.py)."""

from __future__ import annotations

from autoextract.sources.latex import build_latex, latex_spans, parse_latex


def test_latex_span_kinds_order_and_cleanup():
    b = build_latex([
        ("heading", 1, "Paper & results"),
        ("text", "We study --- topic \\emph{carefully} \\cite{ref5}~now."),
        ("math", "E = m c^2"),
        ("image", "fig.png", "A 100% caption"),
        ("table", [["a", "3"], ["b", "5"]]),
        ("heading", 2, "Results"),
    ])
    spans = parse_latex(b)
    assert [(s["seq"], s["kind"]) for s in spans] == [
        (0, "heading"), (1, "text"), (2, "math"), (3, "image"),
        (4, "table"), (5, "heading")]
    assert spans[0]["text"] == "Paper & results" and spans[0]["level"] == 1
    # ligature, style unwrap, cite bracket, nbsp tie
    assert spans[1]["text"] == "We study — topic carefully [ref5] now."
    assert spans[2]["text"] == "E = m c^2"
    assert spans[3]["media_ref"] == "fig.png"
    assert spans[3]["text"] == "A 100% caption"
    assert spans[4]["text"] == "a | 3\nb | 5"


def test_latex_math_delimiters_comments_containment():
    src = (
        b"\\documentclass{article}\n\\begin{document}\n"
        b"before % trailing comment vanishes\n\n"
        b"\\[x^2\\]\n\n$$y_1$$\n\npct is 50\\% here\n"
        b"\\end{document}\n"
    )
    spans = parse_latex(src)
    assert [s["kind"] for s in spans] == ["text", "math", "math", "text"]
    assert spans[0]["text"] == "before"
    assert spans[1]["text"] == "x^2" and spans[2]["text"] == "y_1"
    # escaped \% survives the comment stripper and unescapes
    assert spans[3]["text"] == "pct is 50% here"
    assert parse_latex(b"no tex markers here") == []


def test_latex_nested_styles_and_labels():
    src = (
        b"\\documentclass{article}\\begin{document}\n"
        b"\\textbf{\\emph{deep}} text\\label{sec:x} end\n"
        b"\\end{document}"
    )
    assert parse_latex(src)[0]["text"] == "deep text end"


def test_latex_containment(spark):
    df = spark.createDataFrame(
        [(1, build_latex([("text", "hello")])), (2, b"not tex"), (3, None)],
        "doc_id long, payload binary",
    )
    got = latex_spans(df).collect()
    assert [(r["doc_id"], r["text"]) for r in got] == [("1", "hello")]
