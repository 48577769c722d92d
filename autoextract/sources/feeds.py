"""RSS 2.0 / Atom feed ingestion — the freshness channel of a crawl.

Sitemaps enumerate a host's full URL inventory; feeds announce what is NEW.
A recrawl pipeline polls feeds between sitemap passes to find fresh
documents cheaply, so feed parsing sits next to ``sitemap.py`` and
``robots.py`` in the crawl front door.

Same Spark-first stance as the sitemap parser: pure JVM regexp
expressions over machine-generated XML (``regexp_extract_all`` for the
``<item>``/``<entry>`` blocks, ``posexplode`` to keep document order,
per-block ``regexp_extract`` for the children) — no XML library, no UDF,
engine-portable so the DuckDB oracle can replay it.  Malformed payloads
yield zero blocks, never task failures.

Output one row per entry: ``(host, kind, ord, title, url, published,
entry_id)`` with ``kind`` ∈ {``rss``, ``atom``}.  RSS links are element
text (``<link>…</link>``), Atom links are the ``href`` attribute
(``<link href="…"/>``) — the classic interop trap, handled per kind.
``<![CDATA[…]]>`` title wrappers are stripped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BLOCK = r"(?s)<(?:item|entry)>(.*?)</(?:item|entry)>"
_TITLE = r"(?s)<title[^>]*>\s*(?:<!\[CDATA\[)?\s*(.*?)\s*(?:\]\]>)?\s*</title>"


def parse_feeds(
    feeds: DataFrame, host_col: str = "host", xml_col: str = "feed_xml"
) -> DataFrame:
    """``(host, feed_xml)`` → per-entry rows (module docstring).

    Narrow plan: one projection + posexplode, zero shuffles."""
    host, xml = F.col(host_col), F.col(xml_col)
    kind = F.when(xml.rlike(r"<feed[\s>]"), F.lit("atom")).otherwise(
        F.lit("rss")
    )
    rows = feeds.select(
        host.alias("host"),
        kind.alias("kind"),
        F.posexplode(F.regexp_extract_all(xml, F.lit(_BLOCK), 1)).alias(
            "ord", "block"
        ),
    )
    b = F.col("block")
    rss_link = F.trim(F.regexp_extract(b, r"(?s)<link>\s*(.*?)\s*</link>", 1))
    atom_link = F.regexp_extract(b, r'<link[^>]*href=["\']([^"\']*)["\']', 1)
    published = F.coalesce(
        F.nullif(
            F.trim(F.regexp_extract(b, r"(?s)<pubDate>\s*(.*?)\s*</pubDate>", 1)),
            F.lit(""),
        ),
        F.nullif(
            F.trim(F.regexp_extract(b, r"(?s)<updated>\s*(.*?)\s*</updated>", 1)),
            F.lit(""),
        ),
    )
    entry_id = F.coalesce(
        F.nullif(
            F.trim(F.regexp_extract(b, r"(?s)<guid[^>]*>\s*(.*?)\s*</guid>", 1)),
            F.lit(""),
        ),
        F.nullif(
            F.trim(F.regexp_extract(b, r"(?s)<id>\s*(.*?)\s*</id>", 1)),
            F.lit(""),
        ),
    )
    return rows.select(
        "host",
        "kind",
        "ord",
        F.nullif(
            F.regexp_replace(F.regexp_extract(b, _TITLE, 1), r"\s+", " "),
            F.lit(""),
        ).alias("title"),
        F.nullif(
            F.when(F.col("kind") == "atom", atom_link).otherwise(rss_link),
            F.lit(""),
        ).alias("url"),
        published.alias("published"),
        entry_id.alias("entry_id"),
    ).where(F.col("url").isNotNull())
