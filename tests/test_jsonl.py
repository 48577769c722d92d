"""JSONL column parsing (sources/jsonl.py)."""

from __future__ import annotations

from autoextract.sources.jsonl import _split_ddl, parse_jsonl_column

SCHEMA = "doc_id bigint, text string, meta struct<lang:string,score:double>"


def test_split_ddl_respects_nesting():
    assert _split_ddl(SCHEMA) == [
        "doc_id bigint", "text string",
        "meta struct<lang:string,score:double>",
    ]
    assert _split_ddl("a map<string,array<int>>, b int") == [
        "a map<string,array<int>>", "b int"]


def test_parse_valid_partial_and_corrupt(spark):
    df = spark.createDataFrame(
        [(1, '{"doc_id": 7, "text": "hi", "meta": {"lang": "en", "score": 0.5}}'),
         (2, '{"doc_id": 8}'),                 # missing fields -> NULLs, valid
         (3, "garbage"),                        # corrupt -> valid false
         (4, None)],                            # null line  -> valid false
        "row_id long, line string",
    )
    got = {r["row_id"]: r for r in parse_jsonl_column(df, SCHEMA).collect()}
    assert got[1]["doc_id"] == 7 and got[1]["meta"]["score"] == 0.5
    assert got[1]["valid"] is True
    assert got[2]["doc_id"] == 8 and got[2]["text"] is None
    assert got[2]["valid"] is True
    assert got[3]["valid"] is False and got[3]["doc_id"] is None
    assert got[4]["valid"] is False
    # original string column dropped by default, kept on request
    assert "line" not in got[1].asDict()
    kept = parse_jsonl_column(df, SCHEMA, keep=True).columns
    assert "line" in kept


def test_parse_csv_column_rfc4180(spark):
    from autoextract.sources.jsonl import parse_csv_column

    df = spark.createDataFrame(
        [(1, '7,"a, b ""c""",0.5'),
         (2, "8,plain,1.5"),
         (3, ",,"),                    # all-empty -> corrupt
         (4, None)],
        "row_id long, line string",
    )
    got = {r["row_id"]: r for r in parse_csv_column(
        df, "k bigint, body string, score double").collect()}
    assert got[1]["body"] == 'a, b "c"' and got[1]["k"] == 7
    assert got[2]["score"] == 1.5 and got[2]["valid"] is True
    assert got[3]["valid"] is False and got[4]["valid"] is False


def test_parse_csv_column_tsv_option(spark):
    from autoextract.sources.jsonl import parse_csv_column

    df = spark.createDataFrame([(1, "9\tx")], "row_id long, line string")
    r = parse_csv_column(df, "k bigint, body string", sep="\t").collect()[0]
    assert r["k"] == 9 and r["body"] == "x"
