"""Distributed BPE tokenizer training — learn the merge table from the
corpus itself (the Sennrich-style word-level byte-pair-encoding procedure
every modern LM tokenizer starts from).

The reference app tokenizes nothing; a training-data pipeline must train
the tokenizer ON the corpus it just assembled. This is the textbook
iterative-aggregation shape (like PageRank / k-means): per merge step,

  1. pair counts: explode adjacent symbol pairs from the UNIQUE-WORD
     vocabulary weighted by word frequency — the corpus itself is touched
     exactly once, up front, to build that vocabulary (unique words are
     sublinear in corpus size, Heaps' law), so 100 TB of text becomes a
     few-hundred-MB symbolized vocab that every round iterates over;
  2. argmax: highest pair count, ties broken lexicographically — a
     ``LIMIT 1`` collect of a single row per round (bounded by design);
  3. apply: replace every left-to-right non-overlapping occurrence of the
     winning pair inside each word's symbol array — one ``aggregate`` HOF
     projection, pure JVM — then re-group identical arrays.

Lineage is truncated per round with ``localCheckpoint``. The merge
sequence is fully deterministic (count desc, pair asc), so a planted
corpus with an analytically known merge order can sit behind the driver's
value-hash oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _apply_merge(syms, left: str, right: str):
    """Left-to-right non-overlapping replacement of (left, right) →
    left+right inside a symbol array, as one aggregate HOF."""
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.lit(left + right)),
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def bpe_train(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
) -> list[tuple[int, str, str, str, int]]:
    """Learn ``n_merges`` BPE merges from the corpus; returns
    ``[(step, left, right, merged, pair_count)]`` (1-based steps). Stops
    early if no pair remains. The only driver-side data is ONE argmax row
    per round."""
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    spark = docs.sparkSession
    toks = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda x: x != F.lit("")
    )
    vocab = (
        docs.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
        .select(
            F.filter(F.split(F.col("w"), ""), lambda x: x != F.lit("")).alias(
                "syms"
            ),
            "cnt",
        )
        # lazy checkpoint (r6): lineage still truncates at first
        # materialization, but the checkpoint job fuses into the next
        # round's argmax collect — one job per round instead of two
        # (per-round fixed cost dominates: the vocab is Heaps-law small)
        .localCheckpoint(eager=False)
    )
    merges: list[tuple[int, str, str, str, int]] = []
    for step in range(1, n_merges + 1):
        n = F.size("syms")
        pair_rows = vocab.where(n >= 2).select(
            F.explode(
                F.arrays_zip(
                    F.slice("syms", F.lit(1), n - 1).alias("left"),
                    F.slice("syms", F.lit(2), n - 1).alias("right"),
                )
            ).alias("z"),
            "cnt",
        )
        top = (
            pair_rows.groupBy(
                F.col("z.left").alias("left"), F.col("z.right").alias("right")
            )
            .agg(F.sum("cnt").alias("pair_count"))
            .orderBy(F.desc("pair_count"), F.asc("left"), F.asc("right"))
            .limit(1)
            .collect()  # bounded: exactly one row per round
        )
        if not top:
            break
        left, right, cnt = top[0]["left"], top[0]["right"], int(top[0]["pair_count"])
        merges.append((step, left, right, left + right, cnt))
        vocab = (
            vocab.select(_apply_merge(F.col("syms"), left, right).alias("syms"), "cnt")
            .groupBy("syms")
            .agg(F.sum("cnt").alias("cnt"))
            .localCheckpoint(eager=False)
        )
    return merges


def bpe_merges_df(docs: DataFrame, n_merges: int, text_col: str = "text") -> DataFrame:
    """:func:`bpe_train` as a DataFrame ``(step, left, right, merged,
    pair_count)`` — the driver-oracle surface."""
    spark = docs.sparkSession
    rows = bpe_train(docs, n_merges, text_col=text_col)
    return spark.createDataFrame(
        rows, "step int, left string, right string, merged string, pair_count long"
    )


def bpe_encode(docs: DataFrame, merges: list, text_col: str = "text") -> DataFrame:
    """Apply a learned merge table to a corpus: per doc, tokenize, split
    to characters, replay the merges in order — ``len(merges)`` chained
    HOF projections, zero shuffles, zero Python. Returns
    ``(original columns…, bpe_tokens array<string>)``."""
    toks = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda x: x != F.lit("")
    )
    word_syms = lambda w: F.filter(  # noqa: E731
        F.split(w, ""), lambda x: x != F.lit("")
    )
    def apply_step(left: str, right: str):
        return lambda s: _apply_merge(s, left, right)

    per_word = F.transform(toks, word_syms)
    for _, left, right, _, _ in merges:
        per_word = F.transform(per_word, apply_step(left, right))
    return docs.withColumn("bpe_tokens", F.flatten(per_word))
