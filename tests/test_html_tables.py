"""HTML table extraction (operators/html.parse_html_tables)."""

from __future__ import annotations

from autoextract.operators.html import extract_html_tables, parse_html_tables


def test_grid_headers_colspan_entities():
    h = ('<table><tr><th>K</th><th colspan="2">Wide</th></tr>'
         "<tr><td>a &amp; b</td><td>1</td><td>2</td></tr></table>")
    cells = parse_html_tables(h)
    assert [(c["row"], c["col"], c["header"], c["text"]) for c in cells] == [
        (0, 0, True, "K"), (0, 1, True, "Wide"),
        (1, 0, False, "a & b"), (1, 1, False, "1"), (1, 2, False, "2")]


def test_nested_tables_split_not_merged():
    h = ("<table><tr><td>outer <table><tr><td>inner</td></tr></table>"
         " tail</td></tr></table>"
         "<table><tbody><tr><td>solo</td></tr></tbody></table>")
    cells = parse_html_tables(h)
    by_tid = {}
    for c in cells:
        by_tid.setdefault(c["table_id"], []).append(c["text"])
    # nested text excluded from the outer cell; three distinct tables
    assert by_tid == {0: ["outer tail"], 1: ["inner"], 2: ["solo"]}


def test_malformed_tolerated():
    # unclosed cells/rows: the tolerant tree builder still yields a grid
    h = "<table><tr><td>a<td>b<tr><td>c</table>"
    cells = parse_html_tables(h)
    assert [(c["row"], c["col"], c["text"]) for c in cells] == [
        (0, 0, "a"), (0, 1, "b"), (1, 0, "c")]
    assert parse_html_tables("no tables") == []
    # bad colspan value falls back to 1
    one = parse_html_tables('<table><tr><td colspan="x">a</td>'
                            "<td>b</td></tr></table>")
    assert [(c["col"]) for c in one] == [0, 1]


def test_kernel(spark):
    df = spark.createDataFrame(
        [(1, "<table><tr><td>x</td></tr></table>"), (2, "prose"),
         (3, None)],
        "doc_id long, html string",
    )
    got = extract_html_tables(df).collect()
    assert [(r["doc_id"], r["text"]) for r in got] == [("1", "x")]
