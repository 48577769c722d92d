"""URL normalization / registered-domain / blocklist verdict edge cases."""

from __future__ import annotations

from pyspark.sql import functions as F

from autoextract.functions.urls import (
    domain_filter,
    normalize_url,
    registered_domain,
)


def _norm(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [
        r["n"] for r in df.select(normalize_url("url").alias("n")).collect()
    ]


def _dom(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [
        r["d"] for r in df.select(registered_domain("url").alias("d")).collect()
    ]


def test_normalize_case_port_fragment(spark):
    assert _norm(
        spark,
        [
            "HTTPS://Example.COM:443/A/B?x=1#frag",
            "http://example.com:80/",
            "http://example.com:8080/q",
        ],
    ) == [
        "https://example.com/A/B?x=1",  # path case preserved, :443 dropped
        "http://example.com/",
        "http://example.com:8080/q",  # non-default port kept
    ]


def test_normalize_tracking_params(spark):
    assert _norm(
        spark,
        [
            "https://a.com/p?utm_source=x&id=5",
            "https://a.com/p?id=5&utm_campaign=y",
            "https://a.com/p?utm_a=1&utm_b=2",
            "https://a.com/p?gclid=z&id=1&fbclid=q",
        ],
    ) == [
        "https://a.com/p?id=5",
        "https://a.com/p?id=5",
        "https://a.com/p",
        "https://a.com/p?id=1",
    ]


def test_registered_domain_psl_approximation(spark):
    assert _dom(
        spark,
        [
            "https://www.news.co.uk/x",
            "https://a.b.example.com/",
            "https://example.org/",
            "https://deep.sub.gov.br/",
        ],
    ) == ["news.co.uk", "example.com", "example.org", "sub.gov.br"]


def test_domain_filter_verdicts(spark):
    docs = spark.createDataFrame(
        [
            (0, "https://www.bad.com/x"),
            (1, "https://good.com/y"),
            (2, "https://sub.bad.com/z"),
        ],
        "doc_id long, url string",
    )
    bl = spark.createDataFrame([("bad.com",)], "domain string")
    out = {r["doc_id"]: r["blocked"] for r in domain_filter(docs, bl).collect()}
    assert out == {0: True, 1: False, 2: True}
