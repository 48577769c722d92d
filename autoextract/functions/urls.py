"""URL hygiene for web-corpus pipelines: normalization, registered-domain
extraction, and blocklist filtering — the C4/CCNet-style source-filtering
pass that runs before (and feeds) per-source sampling.

Everything is a chain of JVM regexp expressions from the Java∩RE2 common
subset (the same portability contract as the PII redaction family), so the
DuckDB driver oracle replays the identical rules: no ``parse_url``, no UDF,
no Python. Scale shape: pure codegen'd projections; the blocklist is
broadcast (blocklists are small by definition); nothing shuffles.

Normalization (deterministic, order-documented):
  1. strip the fragment;
  2. lowercase scheme and host (path/query case is preserved — it is
     significant on real servers);
  3. drop default ports (``:80`` for http, ``:443`` for https);
  4. strip tracking parameters (``utm_*``, ``fbclid``, ``gclid``) wherever
     they sit in the query string.

Registered domain is the last two host labels, or three under the common
multi-part public suffixes (co/com/ac/org/net/gov + uk/au/jp/br/in) — a
deliberately small embedded approximation of the Public Suffix List; a
production run swaps in the full PSL as a broadcast map without changing
the plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Column

#: tracking parameters stripped by normalize_url
_TRACKING = r"(?:utm_[A-Za-z]+|fbclid|gclid)"

#: registered-domain pattern: prefer a 3-label match under known multi-part
#: suffixes, else the last 2 labels
_REG_DOMAIN = (
    r"([^.]+\.(?:co|com|ac|org|net|gov)\.(?:uk|au|jp|br|in)|[^.]+\.[^.]+)$"
)


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def url_scheme(url: Column | str) -> Column:
    return F.lower(F.regexp_extract(_c(url), r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))


def url_host(url: Column | str) -> Column:
    return F.lower(
        F.regexp_extract(_c(url), r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]+)", 1)
    )


def url_port(url: Column | str) -> Column:
    return F.regexp_extract(_c(url), r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#:]+:([0-9]+)", 1)


def _path_query(url: Column | str) -> Column:
    """Path+query with the fragment stripped (may be empty)."""
    no_frag = F.regexp_replace(_c(url), r"#.*$", "")
    return F.regexp_extract(
        no_frag, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$", 1
    )


def _strip_tracking(pq: Column) -> Column:
    # interior param (has a following '&'), then a trailing one (with its
    # leading '?' or '&') — two passes cover every position, no backrefs
    a = F.regexp_replace(pq, _TRACKING + r"=[^&#]*&", "")
    return F.regexp_replace(a, r"[?&]" + _TRACKING + r"=[^&#]*$", "")


def normalize_url(url: Column | str) -> Column:
    """The normalized URL string (rules in the module docstring)."""
    scheme = url_scheme(url)
    host = url_host(url)
    port = url_port(url)
    default = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    host_port = F.when(port == "", host).otherwise(
        F.when(default, host).otherwise(F.concat(host, F.lit(":"), port))
    )
    return F.concat(
        scheme, F.lit("://"), host_port, _strip_tracking(_path_query(url))
    )


def registered_domain(url: Column | str) -> Column:
    """Registered domain of the URL's host (PSL approximation above)."""
    return F.regexp_extract(url_host(url), _REG_DOMAIN, 1)


def domain_filter(
    docs: DataFrame, blocklist: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Per-row URL verdict: ``(…, url_norm, domain, blocked)``.

    ``blocklist`` is a one-column ``(domain)`` DataFrame — broadcast; the
    corpus side is a single codegen'd projection + broadcast left join, no
    shuffle of document rows. Filtering is the caller's
    ``.where(~F.col("blocked"))`` so the verdict stays auditable.
    """
    dom = registered_domain(F.col(url_col))
    marked = blocklist.select(
        F.col("domain").alias("__bl_domain"), F.lit(True).alias("__bl_hit")
    )
    return (
        docs.withColumn("url_norm", normalize_url(F.col(url_col)))
        .withColumn("domain", dom)
        .join(
            F.broadcast(marked),
            F.col("domain") == F.col("__bl_domain"),
            "left",
        )
        .withColumn("blocked", F.coalesce("__bl_hit", F.lit(False)))
        .drop("__bl_domain", "__bl_hit")
    )
