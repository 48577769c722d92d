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
