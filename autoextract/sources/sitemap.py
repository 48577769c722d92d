"""Sitemap ingestion (sitemaps.org XML protocol) — the crawl seed list.

Together with ``robots.py`` this completes the crawl front door: robots.txt
says what may be fetched, the sitemap says what the host WANTS fetched
(with freshness + priority hints that drive frontier ordering). At corpus
scale the sitemap pass is how re-crawl scheduling learns which of 10^9
hosts changed since the last snapshot.

Spark-first shape: pure JVM regexp expressions — ``regexp_extract_all``
pulls ``<url>``/``<sitemap>`` blocks, ``posexplode`` preserves document
order, per-block ``regexp_extract`` reads the child elements. No XML
library, no UDF: sitemap files are machine-generated from a 6-element
vocabulary, so anchored regexes over well-formed blocks are exact — and
engine-portable, which is what lets the DuckDB driver oracle replay the
chain verbatim. Malformed payloads simply yield zero blocks (same
containment stance as the HTML/WARC parsers: a bad file contributes
nothing, never a task failure).

Output one row per entry: ``(host, kind, ord, url, lastmod, priority)``
where ``kind`` is ``urlset`` (leaf) or ``sitemapindex`` (pointer file —
its ``url`` values are child sitemap URLs to fetch next), ``ord`` is the
in-file position, ``lastmod`` / ``priority`` are NULL when absent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: one <url>…</url> or <sitemap>…</sitemap> block, dotall
_BLOCK = r"(?s)<(?:url|sitemap)>(.*?)</(?:url|sitemap)>"


def parse_sitemaps(
    sitemaps: DataFrame, host_col: str = "host", xml_col: str = "sitemap_xml"
) -> DataFrame:
    """``(host, sitemap_xml)`` → per-entry rows (module docstring).

    Narrow plan: one projection + posexplode, zero shuffles — entry order
    within a file is preserved by the explode position, not a sort."""
    host, xml = F.col(host_col), F.col(xml_col)
    kind = F.when(
        xml.rlike(r"<sitemapindex[\s>]"), F.lit("sitemapindex")
    ).otherwise(F.lit("urlset"))
    rows = sitemaps.select(
        host.alias("host"),
        kind.alias("kind"),
        F.posexplode(F.regexp_extract_all(xml, F.lit(_BLOCK), 1)).alias(
            "ord", "block"
        ),
    )
    return rows.select(
        "host",
        "kind",
        "ord",
        F.trim(F.regexp_extract("block", r"(?s)<loc>\s*(.*?)\s*</loc>", 1)).alias(
            "url"
        ),
        F.nullif(
            F.regexp_extract("block", r"<lastmod>\s*([^<\s]+)\s*</lastmod>", 1),
            F.lit(""),
        ).alias("lastmod"),
        F.nullif(
            F.regexp_extract("block", r"<priority>\s*([^<\s]+)\s*</priority>", 1),
            F.lit(""),
        )
        .cast("double")
        .alias("priority"),
    ).where(F.col("url") != "")
