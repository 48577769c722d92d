"""Snapshot diff — what changed between two crawls of the same corpus.

A recurring crawl re-fetches the world on a cadence; the first question
every downstream consumer asks of snapshot N vs N−1 is "what's new,
what's gone, what changed?" — it drives incremental re-extraction
(only ``added``/``changed`` docs re-enter the span pipeline), CDN-ish
freshness metrics, and deletion propagation.  Complements
``dedup.incremental_dedup`` (which admits novel *content*): this
classifies by *key*, per document.

Scale shape: both snapshots reduce to ``(key, sha256)`` projections
before anything moves — text never shuffles — then ONE full-outer join
on the key.  Status is a codegen'd CASE over null-ness + fingerprint
equality:

* ``added``     — key only in the new snapshot
* ``removed``   — key only in the old snapshot
* ``changed``   — both sides, fingerprints differ
* ``unchanged`` — both sides, fingerprints equal

``snapshot_diff_report`` rolls the verdicts up per source (or any
grouping column) — counts plus a 6-dp churn rate — the dashboard row a
crawl operator actually watches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(old: DataFrame, new: DataFrame, *,
                  key: str = "doc_id", text_col: str = "text",
                  carry: list[str] | None = None) -> DataFrame:
    """One row per key in either snapshot: ``(key, status,
    old_fingerprint, new_fingerprint, <carry cols from new>)``."""
    o = old.select(F.col(key),
                   F.sha2(F.col(text_col), 256).alias("old_fingerprint"))
    n = new.select(F.col(key),
                   F.sha2(F.col(text_col), 256).alias("new_fingerprint"),
                   *(carry or []))
    j = o.join(n, key, "full_outer")
    status = (
        F.when(F.col("old_fingerprint").isNull(), F.lit("added"))
        .when(F.col("new_fingerprint").isNull(), F.lit("removed"))
        .when(F.col("old_fingerprint") == F.col("new_fingerprint"),
              F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(key, status.alias("status"), "old_fingerprint",
                    "new_fingerprint", *(carry or []))


def snapshot_diff_report(diff: DataFrame, *,
                         group_col: str | None = None) -> DataFrame:
    """Per-group churn rollup over a ``snapshot_diff`` result: counts of
    each status plus ``churn_rate`` = (added+removed+changed) / total,
    6 dp.  One partial-agg exchange on the (tiny) group key."""
    gcols = [group_col] if group_col else []
    cnt = lambda s: F.sum(  # noqa: E731
        F.when(F.col("status") == s, 1).otherwise(0)).alias("n_" + s)
    agg = diff.groupBy(*gcols).agg(
        F.count(F.lit(1)).alias("n_total"),
        cnt("added"), cnt("removed"), cnt("changed"), cnt("unchanged"),
    )
    churn = F.round(
        (F.col("n_added") + F.col("n_removed") + F.col("n_changed"))
        / F.col("n_total"), 6)
    return agg.withColumn("churn_rate", churn)
