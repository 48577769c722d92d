"""Crawl-frontier assembly — the composition capstone of the crawl family.

``sources/sitemap.py`` and ``sources/feeds.py`` produce candidate URLs,
``sources/robots.py`` says which may be fetched, ``operators/graph.py``
(PageRank) supplies a host-quality prior, and ``operators/sampling.py``
(per-host cap) enforces politeness budgets.  This module stitches those
verified pieces into the fetch list a crawler actually consumes: allowed
URLs, scored by ``host_rank × sitemap_priority``, capped per host, with a
deterministic per-host fetch order.

Scale shape: everything delegates to operators whose plans are already
plan-audited — the robots join shuffles on ``host``, the rank join
shuffles on ``host`` (both short keys), the cap is the skew-safe window;
nothing here adds a new exchange beyond those.  Deterministic across
cluster sizes and engines (the cap's md5 tie-break, rounded scores).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from autoextract.operators.sampling import host_cap_topk
from autoextract.sources.robots import robots_filter

__all__ = ["build_frontier"]


def build_frontier(
    candidates: DataFrame,
    rules: DataFrame,
    host_ranks: DataFrame,
    agent: str,
    *,
    per_host_cap: int = 3,
    default_priority: float = 0.5,
    default_rank: float = 0.15,
    salt_parts: int | None = None,
) -> DataFrame:
    """``candidates(host, path, url, priority)`` + ``parse_robots`` rules +
    ``host_ranks(host, rank)`` → the frontier: ``(host, url, score,
    fetch_rank)`` with ``fetch_rank`` in [1, per_host_cap] per host.

    ``priority`` is the sitemap/feed hint (NULL → ``default_priority``);
    ``rank`` the link-centrality prior (missing host → ``default_rank`` —
    an unseen host still gets crawled, just last).  ``score`` is rounded
    to 9 dp so the ordering is engine-portable; ties break by the cap's
    md5 hash then URL.  ``salt_parts`` passes through to the skew-safe
    two-phase cap for mega-hosts.
    """
    allowed = robots_filter(candidates, rules, agent).where(F.col("allowed"))
    scored = allowed.join(host_ranks, "host", "left").withColumn(
        "score",
        F.round(
            F.coalesce(F.col("rank"), F.lit(float(default_rank)))
            * F.coalesce(F.col("priority"), F.lit(float(default_priority))),
            9,
        ),
    ).drop("rank")
    capped = host_cap_topk(
        scored,
        cap=per_host_cap,
        key_col="host",
        priority_col="score",
        id_col="url",
        salt_parts=salt_parts,
    )
    return capped.join(
        scored.select("host", "url", "score"), ["host", "url"]
    ).select(
        "host", "url", "score", F.col("rank").alias("fetch_rank")
    )
