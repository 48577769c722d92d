"""Sitemap XML ingestion (sources/sitemap.py)."""

from autoextract.sources.sitemap import parse_sitemaps

URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc> https://a.com/page1 </loc>
    <lastmod>2026-01-15</lastmod>
    <priority>0.8</priority>
  </url>
  <url><loc>https://a.com/page2</loc></url>
  <url>
    <loc>https://a.com/page3</loc>
    <lastmod>2026-02-01</lastmod>
  </url>
</urlset>
"""

INDEX = """<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>https://b.com/sitemap1.xml</loc><lastmod>2026-03-01</lastmod></sitemap>
  <sitemap><loc>https://b.com/sitemap2.xml</loc></sitemap>
</sitemapindex>
"""


def test_urlset_entries_in_order(spark):
    df = spark.createDataFrame(
        [("a.com", URLSET)], "host string, sitemap_xml string"
    )
    rows = parse_sitemaps(df).orderBy("ord").collect()
    assert [r.url for r in rows] == [
        "https://a.com/page1",
        "https://a.com/page2",
        "https://a.com/page3",
    ]
    assert rows[0].kind == "urlset"
    assert rows[0].lastmod == "2026-01-15" and rows[0].priority == 0.8
    assert rows[1].lastmod is None and rows[1].priority is None
    assert rows[2].lastmod == "2026-02-01" and rows[2].priority is None


def test_sitemapindex_detected(spark):
    df = spark.createDataFrame(
        [("b.com", INDEX)], "host string, sitemap_xml string"
    )
    rows = parse_sitemaps(df).orderBy("ord").collect()
    assert [r.kind for r in rows] == ["sitemapindex"] * 2
    assert rows[0].url == "https://b.com/sitemap1.xml"
    assert rows[1].lastmod is None


def test_malformed_yields_nothing(spark):
    df = spark.createDataFrame(
        [("c.com", "<html>not a sitemap</html>"), ("d.com", "")],
        "host string, sitemap_xml string",
    )
    assert parse_sitemaps(df).count() == 0
