"""Layout engine: pure-NumPy units + Spark fixture goldens (SURVEY.md §2 P4/P5/W1/W3)."""

from __future__ import annotations

import numpy as np

from autoextract import corpus
from autoextract.operators import layout


def _boxes(rows):
    return np.array(rows, dtype=np.float64)


class TestPureGeometry:
    def test_boxes_from_points(self):
        pts = np.array([[[50, 120], [250, 120], [250, 150], [50, 150]]], dtype=float)
        b = layout.boxes_from_points(pts)
        assert b.tolist() == [[50.0, 120.0, 250.0, 150.0]]

    def test_projection_gaps(self):
        lo = np.array([0.0, 100.0])
        hi = np.array([30.0, 130.0])
        assert layout._projection_gaps(lo, hi, 50.0) == [65.0]
        assert layout._projection_gaps(lo, hi, 80.0) == []

    def test_xy_cut_two_columns(self):
        # two columns, tall enough to allow the x-cut
        left = [[0, y, 80, y + 10] for y in range(0, 100, 20)]
        right = [[200, y, 280, y + 10] for y in range(0, 100, 20)]
        b = _boxes(left + right)
        blocks = layout.xy_cut(b, y_gap=15.0, x_gap=50.0, min_x_extent=20.0)
        assert len(blocks) == 2
        assert sorted(blocks[0].tolist()) == list(range(5))  # left first
        assert sorted(blocks[1].tolist()) == list(range(5, 10))

    def test_xy_cut_never_splits_single_line(self):
        # three words on one line with wide gaps — must stay one block
        b = _boxes([[0, 0, 50, 30], [150, 0, 200, 30], [300, 0, 350, 30]])
        blocks = layout.xy_cut(b, y_gap=21.0, x_gap=60.0, min_x_extent=60.0)
        assert len(blocks) == 1

    def test_cluster_lines(self):
        b = _boxes(
            [[0, 0, 10, 10], [20, 1, 30, 11], [0, 40, 10, 50], [20, 41, 30, 51]]
        )
        ids = layout.cluster_lines(b)
        assert ids.tolist() == [0, 0, 1, 1]

    def test_reading_order_deterministic_under_permutation(self):
        rng = np.random.RandomState(3)
        rows = []
        for li in range(6):
            for wi in range(4):
                rows.append([50 + 100 * wi, 100 + 40 * li, 130 + 100 * wi, 130 + 40 * li])
        b = _boxes(rows)
        perm0, _, _ = layout.page_reading_order(b, tiebreak=np.arange(len(b)))
        shuffle = rng.permutation(len(b))
        perm1, _, _ = layout.page_reading_order(
            b[shuffle], tiebreak=np.arange(len(b))
        )
        # same geometric order regardless of input permutation
        assert [tuple(b[shuffle][i]) for i in perm1] == [tuple(b[i]) for i in perm0]


class TestSparkLayout:
    def test_two_column_fixture(self, spark):
        from autoextract.operators.layout import assemble_spans, order_words

        df = spark.createDataFrame(
            corpus.two_column_words_pdf(), schema=corpus.OCR_WORDS_SCHEMA
        )
        spans = assemble_spans(order_words(df)).collect()[0]["spans"]
        assert [s["text"] for s in spans] == corpus.TWO_COLUMN_EXPECTED
        assert [s["offset"] for s in spans] == list(range(len(spans)))

    def test_media_interleaving(self, spark):
        from autoextract.operators.layout import assemble_spans, order_words

        df = spark.createDataFrame(
            corpus.media_words_pdf(), schema=corpus.OCR_WORDS_SCHEMA
        )
        spans = assemble_spans(order_words(df)).collect()[0]["spans"]
        got = [(s["kind"], s["text"], s["media_ref"]) for s in spans]
        assert got == corpus.MEDIA_EXPECTED

    def test_empty_words_dropped(self, spark):
        """Reference rule: blank content never becomes a span (inference.py:108)."""
        import pandas as pd

        from autoextract.operators.layout import assemble_spans, order_words

        pdf = corpus.example_words_pdf()
        blank = pdf.iloc[0:1].copy()
        blank["content"] = "   "
        blank["word_seq"] = 99
        df = spark.createDataFrame(
            pd.concat([pdf, blank], ignore_index=True), schema=corpus.OCR_WORDS_SCHEMA
        )
        spans = assemble_spans(order_words(df)).collect()[0]["spans"]
        assert len(spans) == 6
        assert all(s["text"].strip() for s in spans)


class TestGeometryMemo:
    """The per-chunk geometry memo in the Arrow kernels must be pure CSE:
    identical (boxes, tiebreak) bytes reuse the permutation, ANY byte
    difference — including tiebreak-only differences — recomputes."""

    def _chunk(self, layouts):
        """Build a sorted (doc, page, word_seq) arrow table from
        [(doc_id, [(x0,y0,x1,y1), ...], seqs), ...]."""
        import pyarrow as pa

        cols = {k: [] for k in ("doc_id", "page", "word_seq", "kind",
                                "content", "media_ref", "rec_score",
                                "x0", "y0", "x1", "y1")}
        for doc_id, boxes, seqs in layouts:
            for (bx, by, ex, ey), sq in zip(boxes, seqs):
                cols["doc_id"].append(doc_id)
                cols["page"].append(1)
                cols["word_seq"].append(sq)
                cols["kind"].append("text")
                cols["content"].append(f"{doc_id}w{sq}")
                cols["media_ref"].append(None)
                cols["rec_score"].append(1.0)
                cols["x0"].append(bx)
                cols["y0"].append(by)
                cols["x1"].append(ex)
                cols["y1"].append(ey)
        import pyarrow as pa

        return pa.table(
            {
                "doc_id": pa.array(cols["doc_id"]),
                "page": pa.array(cols["page"], pa.int32()),
                "word_seq": pa.array(cols["word_seq"], pa.int32()),
                "kind": pa.array(cols["kind"]),
                "content": pa.array(cols["content"]),
                "media_ref": pa.array(cols["media_ref"], pa.string()),
                "rec_score": pa.array(cols["rec_score"]),
                "x0": pa.array(cols["x0"]),
                "y0": pa.array(cols["y0"]),
                "x1": pa.array(cols["x1"]),
                "y1": pa.array(cols["y1"]),
            }
        )

    def test_repeated_and_distinct_layouts_match_direct(self):
        import numpy as np

        from autoextract.operators.layout import (
            _spans_chunk_arrow,
            page_reading_order,
        )

        grid = [(40.0 + 70.0 * (i % 3), 40.0 + 32.0 * (i // 3),
                 100.0 + 70.0 * (i % 3), 52.0 + 32.0 * (i // 3))
                for i in range(7)]
        scatter = [(10.0 * i, 500.0 - 13.0 * i, 10.0 * i + 40.0,
                    512.0 - 13.0 * i) for i in range(5)]
        # d1/d2 share the grid (memo hit), d3 differs (miss), d4 repeats
        # the grid boxes but with REVERSED tiebreak seqs (must miss)
        layouts = [
            ("d1", grid, list(range(7))),
            ("d2", grid, list(range(7))),
            ("d3", scatter, list(range(5))),
            ("d4", grid, list(range(6, -1, -1))),
        ]
        out = _spans_chunk_arrow(self._chunk(layouts))
        got = {
            d: [s["text"] for s in spans]
            for d, spans in zip(out.column("doc_id").to_pylist(),
                                out.column("spans").to_pylist())
        }
        for doc_id, boxes, seqs in layouts:
            p, _, _ = page_reading_order(
                np.array(boxes, dtype=np.float64),
                tiebreak=np.array(seqs),
            )
            expect = [f"{doc_id}w{seqs[j]}" for j in p]
            assert got[doc_id] == expect, doc_id
        # the tiebreak-reversed doc must NOT equal the straight-grid order
        assert got["d4"] != [t.replace("d1", "d4") for t in got["d1"]]

    def test_order_kernel_memo_matches_direct(self):
        import numpy as np

        from autoextract.operators.layout import (
            _order_chunk_arrow,
            page_reading_order,
        )

        grid = [(40.0 + 70.0 * (i % 3), 40.0 + 32.0 * (i // 3),
                 100.0 + 70.0 * (i % 3), 52.0 + 32.0 * (i // 3))
                for i in range(6)]
        layouts = [("a", grid, list(range(6))), ("b", grid, list(range(6)))]
        out = _order_chunk_arrow(self._chunk(layouts))
        p, b, l = page_reading_order(
            np.array(grid, dtype=np.float64), tiebreak=np.arange(6)
        )
        contents = out.column("content").to_pylist()
        blocks = out.column("block_id").to_pylist()
        lines = out.column("line_id").to_pylist()
        for start, doc in ((0, "a"), (6, "b")):
            assert contents[start:start + 6] == [f"{doc}w{j}" for j in p]
            assert blocks[start:start + 6] == list(b[p])
            assert lines[start:start + 6] == list(l[p])
