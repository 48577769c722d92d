"""Stack Exchange dump ingestion — posts.xml ``<row .../>`` lines.

The Stack Exchange data dumps (a classic Q&A training-data source —
one of the public corpora most LLM data pipelines carry) ship each
table as machine-generated XML with exactly one self-closing ``<row``
element per line and all values XML-escaped into attributes.  That
regularity is the whole design: the parser is ONE codegen'd
regexp/projection chain — zero Python, zero shuffles, line-parallel
at dump scale — the same stance as the sitemap/feed/html-metadata
legs.

Per row: ``Id``, ``PostTypeId`` (1=question, 2=answer),
``CreationDate`` (ISO-8601 with millis → timestamp), ``Score`` (may
be negative), ``Title`` (questions only; entity-unescaped),
``Body`` (entity-unescaped ONCE, yielding the HTML that downstream
``strip_html`` consumes), ``Tags`` (``&lt;tag&gt;`` runs → comma
list), ``OwnerUserId``.  Absent attributes → NULL (answers carry no
Title/Tags).  Attribute patterns are anchored on the preceding space
so ``Id=`` never matches inside ``PostTypeId=``/``OwnerUserId=``.

Non-``<row`` lines (the XML declaration, the ``<posts>`` wrapper) are
filtered out, which is also the O6 story: junk lines vanish instead
of failing.

Entity unescape reuses ``operators.html._unescape_basic`` — the same
documented minimal set, ``&amp;`` last.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from autoextract.operators.html import _unescape_basic


def _attr(line: Column, name: str) -> Column:
    """Attribute value or NULL — anchored on the preceding whitespace so
    short names never match inside longer ones."""
    raw = F.regexp_extract(line, r'\s%s="([^"]*)"' % name, 1)
    return F.nullif(raw, F.lit(""))


def parse_se_posts(lines: DataFrame, line_col: str = "line") -> DataFrame:
    """Dump lines → one row per post: ``(post_id, post_type,
    creation_ts, score, title, body, tags_csv, owner_user_id)``.
    Pure JVM projection + filter; no exchange of any kind."""
    line = F.col(line_col)
    rows = lines.where(line.rlike(r"^\s*<row\s"))
    tags_raw = _attr(line, "Tags")
    return rows.select(
        _attr(line, "Id").cast("long").alias("post_id"),
        _attr(line, "PostTypeId").cast("int").alias("post_type"),
        F.to_timestamp(_attr(line, "CreationDate"),
                       "yyyy-MM-dd'T'HH:mm:ss.SSS").alias("creation_ts"),
        _attr(line, "Score").cast("int").alias("score"),
        _unescape_basic(_attr(line, "Title")).alias("title"),
        _unescape_basic(_attr(line, "Body")).alias("body"),
        F.array_join(
            F.regexp_extract_all(tags_raw, F.lit("&lt;([^&]*)&gt;"), 1),
            ",").alias("tags_csv"),
        _attr(line, "OwnerUserId").cast("long").alias("owner_user_id"),
    )
