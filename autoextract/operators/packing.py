"""Sequence packing — the last step of a training-data pipeline: assign
documents to fixed-token-budget training sequences ("bins") so batches
waste minimal padding.

Scale shape: greedy next-fit runs PER PARTITION with one carried
(bin, fill) state — bins never cross partition boundaries, so the job is
embarrassingly parallel and the only data movement is the deterministic
doc_id repartition. Bin ids are globally unique via
``spark_partition_id() * 2^40 + local_bin``. A document longer than the
budget gets its own single-doc bin flagged ``overflow`` (downstream
truncates or splits); the driver verdict checks the exact next-fit
invariant (closed bin + next bin's first doc > budget).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: local-bin space per partition (2^40 bins ≫ any partition's doc count)
_BIN_STRIDE = 1 << 40


def pack_sequences(
    docs: DataFrame,
    budget: int = 2048,
    text_col: str = "text",
    partitions: int | None = None,
) -> DataFrame:
    """``(doc_id, text)`` → ``(doc_id, bin_id, n_tokens, overflow)``:
    greedy first-fit packing of whitespace token counts into bins of
    ``budget`` tokens, deterministic (docs are hash-repartitioned then
    processed in doc_id order inside each partition)."""
    counted = docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.col(text_col)), r"\s+")).alias("n_tokens"),
    )
    if partitions:
        counted = counted.repartition(partitions, "doc_id")
    else:
        counted = counted.repartition("doc_id")
    counted = counted.sortWithinPartitions("doc_id").withColumn(
        "pid", F.spark_partition_id()
    )

    schema = "doc_id long, bin_id long, n_tokens long, overflow boolean"

    def kernel(batches):
        state = {"bin": -1, "fill": None}  # carried across Arrow batches
        for pdf in batches:
            rows = []
            for doc_id, n_tok, pid in zip(
                pdf["doc_id"], pdf["n_tokens"], pdf["pid"]
            ):
                n_tok = int(n_tok)
                overflow = n_tok > budget
                if overflow:
                    # own bin; close the running bin so it stays ≤ budget
                    state["bin"] += 1
                    bin_local = state["bin"]
                    state["bin"] += 1
                    state["fill"] = 0
                elif state["fill"] is None or state["fill"] + n_tok > budget:
                    state["bin"] += 1
                    bin_local = state["bin"]
                    state["fill"] = n_tok
                else:
                    bin_local = state["bin"]
                    state["fill"] += n_tok
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "bin_id": int(pid) * _BIN_STRIDE + bin_local,
                        "n_tokens": n_tok,
                        "overflow": overflow,
                    }
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "bin_id", "n_tokens", "overflow"]
            )

    return counted.mapInPandas(kernel, schema=schema)


def packing_verdict(
    docs: DataFrame, budget: int = 2048, text_col: str = "text"
) -> DataFrame:
    """Per-doc pass/fail facts over a packing run (the driver-gate shape):
    (a) the doc appears exactly once, (b) its bin's total ≤ budget unless
    it is a single-doc overflow bin, and (c) the EXACT greedy invariant —
    a closed bin's total plus the FIRST doc of the next bin in the same
    partition exceeds the budget (else greedy would have kept filling),
    unless that next bin is an overflow bin (which always force-closes).
    Data-independent: holds for any corpus iff the packing is a correct
    next-fit run."""
    packed = pack_sequences(docs, budget=budget, text_col=text_col)
    bins = packed.groupBy("bin_id").agg(
        F.sum("n_tokens").alias("bin_total"),
        F.count("*").alias("bin_docs"),
        F.max(F.col("overflow").cast("int")).alias("bin_overflow"),
        F.min_by("n_tokens", "doc_id").alias("first_tok"),
    )
    w = Window.partitionBy(
        (F.col("bin_id") / _BIN_STRIDE).cast("long")
    ).orderBy("bin_id")
    bins = bins.withColumn("next_first", F.lead("first_tok").over(w)).withColumn(
        "next_overflow", F.lead("bin_overflow").over(w)
    )
    per_doc = packed.join(bins, "bin_id")
    dup = packed.groupBy("doc_id").agg(F.count("*").alias("n_rows"))
    greedy_ok = (
        F.col("next_first").isNull()
        | (F.col("next_overflow") == 1)
        | (F.col("bin_total") + F.col("next_first") > budget)
    )
    return (
        per_doc.join(dup, "doc_id")
        .select(
            "doc_id",
            (
                (F.col("n_rows") == 1)
                & (
                    (F.col("bin_total") <= budget)
                    | ((F.col("bin_docs") == 1) & (F.col("bin_overflow") == 1))
                )
                & (greedy_ok | (F.col("bin_overflow") == 1))
            ).alias("pack_ok"),
        )
        .orderBy("doc_id")
    )
