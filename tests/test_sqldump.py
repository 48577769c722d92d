"""MySQL-dump ingestion (`sources/sqldump.py`): tuple scanning with both
quote-escape conventions, NULL/number handling, multi-table/multi-
statement dumps, containment, and the Spark kernel."""

from __future__ import annotations

import pytest

from autoextract.sources.sqldump import (
    SqlDumpError,
    parse_sqldump,
    sqldump_rows_table,
    to_sqldump,
)


def test_roundtrip_escapes_and_nulls():
    d = to_sqldump({
        "page": [[1, "O'Brien \\ path", None, 0.5],
                 [2, "line\nbreak\ttab", "x", -3]],
    })
    rows = parse_sqldump(d)
    assert rows[0]["values"] == ["1", "O'Brien \\ path", None, "0.5"]
    assert rows[1]["values"] == ["2", "line\nbreak\ttab", "x", "-3"]
    assert [r["row_idx"] for r in rows] == [0, 1]


def test_doubled_quote_convention():
    rows = parse_sqldump("INSERT INTO t VALUES (1,'it''s'),(2,NULL);")
    assert rows[0]["values"] == ["1", "it's"]
    assert rows[1]["values"] == ["2", None]


def test_multi_table_and_filter():
    d = ("INSERT INTO `a` VALUES (1,'x');\n"
         "INSERT INTO `b` VALUES (2,'y'),(3,'z');\n"
         "INSERT INTO `a` VALUES (4,'w');")
    rows = parse_sqldump(d)
    assert [(r["table"], r["row_idx"]) for r in rows] == [
        ("a", 0), ("b", 0), ("b", 1), ("a", 1)]
    only_b = parse_sqldump(d, table="b")
    assert len(only_b) == 2


def test_column_list_and_case_insensitive():
    rows = parse_sqldump("insert into t (id, name) values (7,'n');")
    assert rows[0]["values"] == ["7", "n"]


def test_garbage_and_truncation():
    assert parse_sqldump("no inserts here") == []
    with pytest.raises(SqlDumpError):
        # direct tuple-scan failure (the kernel contains this per payload)
        from autoextract.sources.sqldump import _scan_tuple
        _scan_tuple("(1,'unterminated", 0)
    assert parse_sqldump("INSERT INTO t VALUES ") == []


def test_kernel_tsv_contract(spark):
    d = to_sqldump({"t": [[1, None, "a\tb"]]})
    df = spark.createDataFrame(
        [(1, d), (2, "INSERT INTO broken ("), (3, None)],
        "doc_id long, sql string",
    )
    out = sqldump_rows_table(df).collect()
    assert len(out) == 1
    r = out[0]
    assert r["values_tsv"] == "1\t\\N\ta\tb"
    assert r["n_values"] == 3 and r["table_name"] == "t"


def test_insert_inside_string_value_ignored():
    """ADVICE r5: an INSERT-looking fragment inside a string value must not
    be parsed as a statement (wiki page text/titles can contain them)."""
    from autoextract.sources.sqldump import parse_sqldump

    sql = (
        "INSERT INTO `page` VALUES "
        "(1,'real'),(2,'contains INSERT INTO `evil` VALUES (99,\\'x\\'); done');\n"
        "INSERT INTO `page` VALUES (3,'after');\n"
    )
    rows = parse_sqldump(sql)
    assert [r["table"] for r in rows] == ["page", "page", "page"]
    assert [r["values"][0] for r in rows] == ["1", "2", "3"]
    assert "INSERT INTO `evil`" in rows[1]["values"][1]
    # filtering by the embedded name must find nothing
    assert parse_sqldump(sql, table="evil") == []
