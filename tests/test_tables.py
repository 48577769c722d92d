"""Table-structure reconstruction (operators/tables.py)."""

from __future__ import annotations

from autoextract.operators.tables import reconstruct_tables

_SCHEMA = (
    "doc_id string, page int, table_id int, word_seq int, content string, "
    "x0 double, y0 double, x1 double, y1 double"
)


def _w(seq, content, x0, y0, doc="d", page=1, tid=0):
    return (doc, page, tid, seq, content,
            float(x0), float(y0), float(x0) + 80.0, float(y0) + 16.0)


def _cells(spark, rows, **kw):
    df = spark.createDataFrame(rows, _SCHEMA)
    return {
        (r["doc_id"], r["table_id"], r["row"], r["col"]): r["text"]
        for r in reconstruct_tables(df, **kw).collect()
    }


def test_grid_with_multiword_cells(spark):
    rows = []
    seq = 0
    for r in range(2):
        for c in range(2):
            for i, word in enumerate(["val", f"{r}{c}"]):
                rows.append(_w(seq, word, 40 + c * 300 + i * 90, 100 + r * 30))
                seq += 1
    got = _cells(spark, rows)
    assert got == {
        ("d", 0, 0, 0): "val 00", ("d", 0, 0, 1): "val 01",
        ("d", 0, 1, 0): "val 10", ("d", 0, 1, 1): "val 11",
    }


def test_ragged_rows_share_global_columns(spark):
    # row 0 has both columns, row 1 only the RIGHT column — its cell must
    # still land in col 1 because columns are table-wide
    rows = [
        _w(0, "a", 40, 100), _w(1, "b", 340, 100),
        _w(2, "lonely", 340, 130),
    ]
    got = _cells(spark, rows)
    assert got[("d", 0, 1, 1)] == "lonely"
    assert ("d", 0, 1, 0) not in got


def test_jitter_and_seq_independence(spark):
    # ±2px jitter on a 30px row pitch, word_seq shuffled — geometry wins
    rows = [
        _w(7, "right", 340, 101), _w(3, "left", 40, 99),
        _w(1, "bottom", 40, 130),
    ]
    got = _cells(spark, rows)
    assert got[("d", 0, 0, 0)] == "left" and got[("d", 0, 0, 1)] == "right"
    assert got[("d", 0, 1, 0)] == "bottom"


def test_column_gap_factor(spark):
    # 20px gutter: merged at the default factor (gap >= 1.0*16 splits —
    # 20 >= 16 so it DOES split; at factor 2.0 (32px) it merges
    rows = [_w(0, "a", 40, 100), _w(1, "b", 140, 100)]  # gap 140-120=20
    assert len(_cells(spark, rows)) == 2
    merged = _cells(spark, rows, col_gap_factor=2.0)
    assert merged == {("d", 0, 0, 0): "a b"}


def test_partition_invariance(spark):
    rows = []
    seq = 0
    for r in range(3):
        for c in range(3):
            rows.append(_w(seq, f"x{r}{c}", 40 + c * 300, 100 + r * 30))
            seq += 1
    import pyspark.sql.functions as F
    df = spark.createDataFrame(rows, _SCHEMA)
    a = sorted(map(tuple, reconstruct_tables(df).collect()))
    b = sorted(map(tuple, reconstruct_tables(df.repartition(7)).collect()))
    assert a == b and len(a) == 9
