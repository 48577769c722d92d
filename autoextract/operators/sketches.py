"""Count-min sketch heavy hitters — bounded-memory token census.

The exact token census (``groupBy(token).count()``) shuffles the whole
vocabulary; at 10^12 documents the long tail makes that the dominant
exchange.  The classic fix (Cormode & Muthukrishnan 2005) is a
count-min sketch: depth×width counters indexed by d independent
hashes.  The CMS estimate only ever OVER-counts, so a two-pass heavy
hitter built on it has no false negatives — and because the second
pass exact-counts the surviving candidates, the final output is
EXACT, which is what makes it oracle-checkable.

Spark shape — the whole point is what shuffles:

* pass 1 (sketch): tokens → posexplode into d (row, cell) pairs →
  ONE partial-agg exchange on a key space bounded by depth×width
  (the unbounded vocabulary never shuffles);
* pass 2 (estimate): the sketch (≤ depth×width rows) is materialized
  once and BROADCAST d times; each token occurrence picks up its d
  counters map-side and filters on ``least(...) >= threshold`` —
  still zero vocabulary shuffles;
* pass 3 (exact): only candidate occurrences — a tiny, sketch-pruned
  slice — shuffle on the token key for the exact count, and a final
  filter drops the sketch's false positives.

Hashing is ``xxhash64(token, row)`` — JVM-side, seeded per row, the
same family the dedup operators use for shuffle-key hygiene.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from autoextract.functions.text import tokens


def _token_stream(df: DataFrame, text_col: str) -> DataFrame:
    return (df.select(F.explode(tokens(text_col)).alias("token"))
            .where(F.length("token") > 0))


def _cells(width: int, depth: int) -> list:
    return [
        F.pmod(F.xxhash64(F.col("token"), F.lit(r)), F.lit(width))
        .alias(f"c{r}")
        for r in range(depth)
    ]


def cms_sketch(df: DataFrame, text_col: str = "text", *,
               width: int = 8192, depth: int = 4) -> DataFrame:
    """Build the sketch table ``(row, cell, cnt)`` — at most depth×width
    rows regardless of vocabulary size; one bounded-key exchange."""
    occ = _token_stream(df, text_col).select(*_cells(width, depth))
    pairs = F.posexplode(F.array(*[F.col(f"c{r}") for r in range(depth)]))
    return (occ.select(pairs.alias("row", "cell"))
            .groupBy("row", "cell").agg(F.count(F.lit(1)).alias("cnt")))


def cms_estimate(sketch: DataFrame, candidates: DataFrame, *,
                 width: int = 8192, depth: int = 4,
                 token_col: str = "token") -> DataFrame:
    """Point-estimate counts for a candidate token column: d broadcast
    probes + ``least`` — upper bound on the true count, map-side."""
    est = candidates.withColumn("token", F.col(token_col))
    for r in range(depth):
        skr = (sketch.where(F.col("row") == r)
               .select(F.col("cell").alias(f"c{r}"),
                       F.col("cnt").alias(f"n{r}")))
        est = est.withColumn(
            f"c{r}", F.pmod(F.xxhash64(F.col("token"), F.lit(r)),
                            F.lit(width)))
        est = est.join(F.broadcast(skr), f"c{r}", "left")
    bound = F.least(*[F.coalesce(F.col(f"n{r}"), F.lit(0))
                      for r in range(depth)])
    return est.withColumn("est", bound).drop(
        *[f"c{r}" for r in range(depth)],
        *[f"n{r}" for r in range(depth)])


def heavy_hitters(df: DataFrame, text_col: str = "text", *,
                  min_count: int | None = None,
                  min_frac: float | None = None,
                  width: int = 8192, depth: int = 4) -> DataFrame:
    """Exact counts of every token occurring ≥ ``min_count`` times (or
    ≥ ``ceil(min_frac × total_tokens)`` — the scale-portable form),
    without ever shuffling the full vocabulary.  Returns ``(token, n)``
    — exact, so sketch width only affects the size of the candidate
    slice, never the answer."""
    if (min_count is None) == (min_frac is None):
        raise ValueError("exactly one of min_count / min_frac")
    tok = _token_stream(df, text_col)
    sketch = cms_sketch(df, text_col, width=width, depth=depth)
    # materialize once: the sketch is re-read by d broadcast probes
    sketch = sketch.localCheckpoint(eager=True)

    occ = tok.select("token", *_cells(width, depth))
    if min_frac is not None:
        # the threshold rides a 1-row broadcast, same as zorder bounds
        total = tok.agg(F.count(F.lit(1)).alias("__total"))
        occ = occ.crossJoin(F.broadcast(total))
        thr = F.ceil(F.col("__total") * F.lit(min_frac)).cast("long")
    else:
        thr = F.lit(int(min_count)).cast("long")
    for r in range(depth):
        skr = (sketch.where(F.col("row") == r)
               .select(F.col("cell").alias(f"c{r}"),
                       F.col("cnt").alias(f"n{r}")))
        occ = occ.join(F.broadcast(skr), f"c{r}")
    est = F.least(*[F.col(f"n{r}") for r in range(depth)])
    group_cols = (["token", "__total"] if min_frac is not None
                  else ["token"])
    cand = occ.where(est >= thr).select(*group_cols)
    return (cand.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("n"))
            .where(F.col("n") >= thr)
            .select("token", "n"))
