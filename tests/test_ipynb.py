"""Jupyter notebook ingestion (sources/ipynb.py)."""

from __future__ import annotations

import json

from autoextract.sources.ipynb import build_ipynb, ipynb_spans, parse_ipynb


def test_cell_vocabulary_and_markdown_routing():
    nb = build_ipynb([
        ("markdown", "# Title\n\nIntro **bold**."),
        ("code", "x = 5\nprint(x)", ["5\n"]),
        ("raw", "raw block"),
    ], lang="python")
    spans = parse_ipynb(nb)
    assert [(s["cell"], s["seq"], s["kind"]) for s in spans] == [
        (0, 0, "heading"), (0, 1, "text"), (1, 2, "code"),
        (1, 3, "output"), (2, 4, "text")]
    # markdown cells land in the SAME vocabulary as .md files
    assert spans[0]["text"] == "Title" and spans[0]["level"] == 1
    assert spans[1]["text"] == "Intro bold."
    assert spans[2]["text"] == "x = 5\nprint(x)"
    assert spans[2]["media_ref"] == "python"
    assert spans[3]["text"] == "5\n"


def test_both_source_forms_equivalent():
    cells = [("markdown", "# H\n\npara line one\npara line two."),
             ("code", "a = 1\nb = 2", ["out\n"])]
    a = parse_ipynb(build_ipynb(cells, list_sources=False))
    b = parse_ipynb(build_ipynb(cells, list_sources=True))
    assert a == b


def test_output_types():
    nb = {
        "nbformat": 4, "nbformat_minor": 5,
        "metadata": {"language_info": {"name": "julia"}},
        "cells": [{
            "cell_type": "code", "metadata": {}, "execution_count": 2,
            "source": "f()",
            "outputs": [
                {"output_type": "execute_result",
                 "data": {"text/plain": ["42"],
                          "image/png": "aGk="}},
                {"output_type": "display_data",
                 "data": {"image/png": "aGk="}},   # no text → no span
                {"output_type": "error", "ename": "ValueError",
                 "evalue": "bad", "traceback": []},
            ],
        }],
    }
    spans = parse_ipynb(json.dumps(nb).encode())
    assert [(s["kind"], s["text"]) for s in spans] == [
        ("code", "f()"), ("output", "42"), ("output", "ValueError: bad")]
    # language falls back to language_info.name
    assert spans[0]["media_ref"] == "julia"


def test_containment(spark):
    v3 = json.dumps({"nbformat": 3, "cells": [
        {"cell_type": "code", "input": "x"}]}).encode()
    df = spark.createDataFrame(
        [(1, build_ipynb([("code", "ok", [])])),
         (2, b"not json"), (3, b"{}"), (4, v3), (5, None)],
        "doc_id long, payload binary",
    )
    got = ipynb_spans(df).collect()
    assert [(r["doc_id"], r["kind"], r["text"]) for r in got] == [
        ("1", "code", "ok")]
