"""Access-log ingestion (sources/accesslog.py)."""

from __future__ import annotations

from autoextract.sources.accesslog import parse_access_log


def test_clf_fields_zones_and_dashes(spark):
    lines = [
        '203.0.113.7 - alice [05/Apr/2023:08:30:09 +0000] '
        '"GET /index.html HTTP/1.1" 200 5120 '
        '"https://ref.example/" "Mozilla/5.0"',
        '198.51.100.2 - - [15/Mar/2022:23:59:59 -0500] '
        '"POST /api/v1 HTTP/2.0" 404 - "-" "curl/8.0"',
        "garbage line that matches nothing",
    ]
    df = spark.createDataFrame([(x,) for x in lines], "line string")
    rows = parse_access_log(df).collect()
    a, b, junk = rows
    assert a["host"] == "203.0.113.7" and a["ts"] == 1680683409
    assert (a["method"], a["path"], a["status"], a["n_bytes"]) == (
        "GET", "/index.html", 200, 5120)
    assert a["referer"] == "https://ref.example/"
    # negative zone shifts +5h to UTC; '-' bytes and referer → NULL
    assert b["ts"] == 1647406799 and b["n_bytes"] is None
    assert b["referer"] is None and b["user_agent"] == "curl/8.0"
    assert junk["valid"] is False and junk["host"] is None


def test_common_format_without_combined_tail(spark):
    # plain Common Log Format (no referer/UA quotes) still parses
    df = spark.createDataFrame(
        [('1.2.3.4 - - [01/Jan/2024:00:00:00 +0000] '
          '"GET / HTTP/1.0" 200 1',)], "line string")
    r = parse_access_log(df).collect()[0]
    assert r["valid"] and r["referer"] is None and r["user_agent"] is None
    assert r["ts"] == 1704067200
