"""RSS/Atom feed ingestion (sources/feeds.py)."""

from __future__ import annotations

from autoextract.sources.feeds import parse_feeds


def _parse(spark, xml, host="h.com"):
    df = spark.createDataFrame([(host, xml)], "host string, feed_xml string")
    return [r.asDict() for r in parse_feeds(df).orderBy("ord").collect()]


RSS = (
    '<rss version="2.0"><channel><title>chan title ignored</title>'
    "<item><title>First</title><link> https://h/a </link>"
    "<pubDate>Mon, 01 Jan 2026 00:00:00 GMT</pubDate>"
    '<guid isPermaLink="false">g1</guid></item>'
    "<item><title><![CDATA[Two  &amp; more]]></title><link>https://h/b</link></item>"
    "<item><title>NoLink</title></item>"
    "</channel></rss>"
)

ATOM = (
    '<feed xmlns="http://www.w3.org/2005/Atom"><title>feed title</title>'
    '<entry><title>E0</title><link rel="alternate" href="https://h/e0"/>'
    "<updated>2026-01-02T00:00:00Z</updated><id>urn:0</id></entry>"
    '<entry><title>E1</title><link href="https://h/e1"/><id>urn:1</id></entry>'
    "</feed>"
)


def test_rss_items(spark):
    rows = _parse(spark, RSS)
    # the linkless third item is dropped; channel title never leaks
    assert [r["title"] for r in rows] == ["First", "Two &amp; more"]
    assert rows[0]["kind"] == "rss"
    assert rows[0]["url"] == "https://h/a"          # whitespace trimmed
    assert rows[0]["published"] == "Mon, 01 Jan 2026 00:00:00 GMT"
    assert rows[0]["entry_id"] == "g1"
    assert rows[1]["published"] is None and rows[1]["entry_id"] is None


def test_atom_entries(spark):
    rows = _parse(spark, ATOM)
    assert [r["url"] for r in rows] == ["https://h/e0", "https://h/e1"]
    assert rows[0]["kind"] == "atom"
    assert rows[0]["published"] == "2026-01-02T00:00:00Z"
    assert rows[1]["published"] is None
    assert rows[1]["entry_id"] == "urn:1"


def test_malformed_feed_yields_no_rows(spark):
    assert _parse(spark, "not xml at all") == []
    assert _parse(spark, "<rss><channel><item><title>x</title>") == []


def test_parse_cdx_column(spark):
    from autoextract.sources.warc import parse_cdx_column

    rows = [
        (1, 'com,a)/x 20260101120000 {"url": "https://a.com/x", '
            '"mime": "text/html", "status": "200", "digest": "sha1:Q", '
            '"length": "512", "offset": "0", "filename": "f.warc.gz"}'),
        (2, 'com,b)/y  20260101120001  {"url": "https://b.com/y"}'),  # 2 spaces
        (3, "no json here"),
        (4, 'com,c)/z 2026 {"url": "https://c.com/z"}'),  # short ts
    ]
    df = spark.createDataFrame(rows, "doc_id long, line string")
    out = {r["doc_id"]: r for r in parse_cdx_column(df).collect()}
    assert out[1]["valid"] and out[1]["status"] == 200
    assert out[1]["length"] == 512 and out[1]["urlkey"] == "com,a)/x"
    assert out[1]["event_time"].year == 2026
    assert out[2]["valid"] and out[2]["url"] == "https://b.com/y"
    assert out[2]["mime"] is None  # absent field → NULL, not failure
    assert not out[3]["valid"] and out[3]["url"] is None
    assert not out[4]["valid"]
