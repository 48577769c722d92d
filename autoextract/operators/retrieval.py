"""Corpus retrieval: distributed inverted-index construction + BM25 ranking.

The search-side capability a 100 TB corpus needs next to dedup/similarity:
score documents against term queries with the Robertson/Spärck-Jones BM25
function, entirely as DataFrame algebra.

Scale shape:

* the postings list ``(term, doc_id, tf)`` is ONE partial-agg shuffle over
  exploded tokens — the same shape as the unigram count pass; raw text
  never shuffles;
* document frequency is computed AFTER pruning the postings to query
  terms (a broadcast join), so the df table is bounded by the query
  vocabulary and broadcasts regardless of corpus size;
* corpus scalars (N, avgdl) and the query set broadcast — queries are tiny
  by definition;
* scoring is a postings⋈query-terms inner join (postings for non-query
  terms are pruned by the join, and Catalyst pushes an IsNotNull/semi
  filter when the query side is broadcast) followed by a (query_id,
  doc_id) partial agg and a per-query window top-k.  No stage ever holds
  more than |postings ∩ query terms| rows.

At real index scale the postings table is what you'd persist (bucketed by
term); this module keeps it lazy so the whole plan fuses into the scoring
query.  All expressions are JVM built-ins — zero Python stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def postings(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Inverted-index postings ``(term, doc_id, tf)`` + per-doc length
    ``dl`` carried on every row.

    One token explode, one (doc_id, term) partial aggregate; ``dl`` is a
    window sum over the aggregate's output (``Σ tf`` per doc) — the tokens
    are never exploded twice and the postings never self-join."""
    toks = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda x: x != F.lit("")
    )
    tok_rows = docs.select(id_col, F.explode(toks).alias("term"))
    per_doc_term = tok_rows.groupBy(id_col, "term").agg(
        F.count("*").cast("double").alias("tf")
    )
    return per_doc_term.withColumn(
        "dl", F.sum("tf").over(Window.partitionBy(id_col))
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` documents per query under BM25.

    ``query_terms`` is the long-format query set ``(query_id, term)`` —
    tiny, broadcast.  IDF uses the standard smoothed form
    ``ln(1 + (N - df + 0.5)/(df + 0.5))`` (always positive).  Returns
    ``(query_id, doc_id, score, rank)`` with the score rounded to 6 dp and
    the rank computed over the ROUNDED score (doc_id tiebreak) so the
    ordering is reproducible across engines despite float-sum order.
    """
    post = postings(docs, text_col, id_col)
    n_docs = docs.agg(F.count("*").cast("double").alias("n_docs"))
    # avgdl straight off the docs scan (size of the token array — no
    # explode, no shuffle) over docs with ≥1 token, so the postings
    # subtree has exactly ONE consumer and is never recomputed
    toks = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda x: x != F.lit("")
    )
    avgdl = (
        docs.select(F.size(toks).cast("double").alias("dl"))
        .where(F.col("dl") > 0)
        .agg(F.avg("dl").alias("avgdl"))
    )
    # prune the postings to query terms FIRST (broadcast — no shuffle),
    # then document frequency is a WINDOW COUNT over the pruned slice:
    # df exists only for query terms, costs one exchange of the (tiny)
    # pruned slice, and keeps the whole plan a single linear pass over
    # the corpus — the explode/aggregate subtree is never duplicated
    pruned = post.join(
        F.broadcast(query_terms.select("term").distinct()), "term"
    ).withColumn(
        "df", F.count("*").over(Window.partitionBy("term")).cast("double")
    )
    scored = (
        pruned.join(F.broadcast(query_terms), "term")
        .join(F.broadcast(n_docs))
        .join(F.broadcast(avgdl))
        .withColumn(
            "contrib",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            )
            * (F.col("tf") * F.lit(k1 + 1.0))
            / (
                F.col("tf")
                + F.lit(k1)
                * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
            ),
        )
        .groupBy("query_id", id_col)
        .agg(F.round(F.sum("contrib"), 6).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", id_col, "score", "rank")
    )


def anchor_text_agg(links, url_col: str = "url", anchor_col: str = "anchor"):
    """Aggregate incoming anchor text per target URL — the classic
    weak-supervision signal (anchor→document pairs approximate
    query→document relevance; an "anchor corpus" is a standard retrieval
    training set distilled from a crawl).

    Input is :func:`autoextract.operators.html.extract_links` output (or
    any ``(doc_id, url, anchor)`` edge list). One partial-agg shuffle on
    the target-URL key; anchors collapse map-side via ``collect_set``
    semantics, and the output is one row per target with the distinct
    anchors pipe-joined in sorted order (engine-portable — no array-hash
    ambiguity at the oracle boundary).
    """
    from pyspark.sql import functions as F

    return (
        links.where(F.col(url_col).isNotNull())
        .groupBy(F.col(url_col).alias("url"))
        .agg(
            F.count("*").cast("long").alias("n_inlinks"),
            F.countDistinct("doc_id").cast("long").alias("n_source_docs"),
            F.array_join(
                F.sort_array(F.collect_set(F.col(anchor_col))), "|"
            ).alias("anchors"),
        )
    )
