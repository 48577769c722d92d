"""Z-order (Morton) data layout — multi-dimensional clustering for scans.

At 10^12-document scale the dominant cost of most queries is the scan,
and the scan is bounded by how well file/row-group min-max statistics
prune.  Range-partitioning on ONE column (e.g. ``repartitionByRange(
doc_id)``) gives perfect pruning on that column and none on any other;
interleaving the bits of two or three columns into one Morton key and
range-partitioning on *that* gives useful pruning on every interleaved
dimension at once — the layout strategy behind Delta/Iceberg
``OPTIMIZE ZORDER BY`` (public algorithm: Morton 1966; the bit-spread
construction below is the standard parallel-prefix magic-number form,
e.g. Hacker's Delight §7-2).

Everything here is pure JVM expressions — five shift/mask ops per
column, fully codegen'd, zero Python, zero extra shuffles beyond the
one range exchange the re-layout IS.

``zorder_key`` normalizes each column to its [min, max] rank range
first (bit-interleave is only meaningful on comparable magnitudes) —
percentile-based normalization is the production choice; the exact
min/max variant here keeps the oracle arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: parallel bit-spread magic numbers: spread a 21-bit int so its bits
#: occupy every 3rd position (supports 3-way interleave into 63 bits);
#: the 2-way variant uses every-2nd-position masks.
_SPREAD2 = [
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
]
_SPREAD3 = [
    (32, 0x1F00000000FFFF),
    (16, 0x1F0000FF0000FF),
    (8, 0x100F00F00F00F00F),
    (4, 0x10C30C30C30C30C3),
    (2, 0x1249249249249249),
]


def _spread(col: Column, step: int) -> Column:
    table = _SPREAD2 if step == 2 else _SPREAD3
    out = col.bitwiseAND(F.lit(0xFFFFFFFF if step == 2 else 0x1FFFFF))
    for shift, mask in table:
        out = (out.bitwiseOR(F.shiftleft(out, shift))
               .bitwiseAND(F.lit(mask)))
    return out


def _normalize(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Rank ``col`` into [0, 2^bits): exact min/max scaling, NULL → 0."""
    span = F.greatest(hi - lo, F.lit(1)).cast("double")
    scaled = ((col - lo).cast("double") / span * float((1 << bits) - 1))
    return F.coalesce(F.floor(scaled).cast("long"), F.lit(0))


def zorder_key(cols: list[Column], bits: int = 21) -> Column:
    """Morton key interleaving 2 or 3 already-normalized integer columns
    (each in [0, 2^bits)); column 0 owns the least-significant bit."""
    n = len(cols)
    if n not in (2, 3):
        raise ValueError("zorder_key interleaves 2 or 3 columns")
    out = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        out = out.bitwiseOR(F.shiftleft(_spread(c.cast("long"), n), i))
    return out


def zorder_layout(df: DataFrame, columns: list[str], *,
                  partitions: int | None = None,
                  bits: int = 21,
                  key_col: str = "zkey") -> DataFrame:
    """Re-layout ``df`` for multi-dimensional scan pruning: normalize
    each named numeric column to its global [min, max], interleave into
    a Morton key, range-partition and sort on it.  One tiny global
    min/max aggregate (broadcast back — document rows never shuffle for
    it) + the ONE range exchange that the re-layout is.

    Written out (parquet/Iceberg), every interleaved column's file-level
    min-max spread shrinks by ~2^(bits/n) versus random layout, which is
    what makes the planner skip files on predicates over ANY of them.
    """
    keyed = zorder_keyed(df, columns, bits=bits, key_col=key_col)
    parts = partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions")
    return (keyed.repartitionByRange(int(parts), F.col(key_col))
            .sortWithinPartitions(key_col))


def zorder_keyed(df: DataFrame, columns: list[str], *, bits: int = 21,
                 key_col: str = "zkey") -> DataFrame:
    """The key computation alone (no re-layout exchange): global
    min/max normalize + Morton interleave, all codegen'd."""
    bits = min(bits, 63 // len(columns), 31)
    aggs = []
    for c in columns:
        aggs += [F.min(c).alias(f"__lo_{c}"), F.max(c).alias(f"__hi_{c}")]
    bounds = df.agg(*aggs)
    with_bounds = df.crossJoin(F.broadcast(bounds))
    normed = [
        _normalize(F.col(c), F.col(f"__lo_{c}"), F.col(f"__hi_{c}"), bits)
        for c in columns
    ]
    return with_bounds.withColumn(key_col, zorder_key(normed, bits)).drop(
        *[f"__lo_{c}" for c in columns], *[f"__hi_{c}" for c in columns])


def layout_pruning_report(df: DataFrame, columns: list[str], *,
                          partitions: int, bits: int = 21) -> DataFrame:
    """Measure what the layout buys: bucket rows into ``partitions``
    equal Morton-key ranges (pure arithmetic — deterministic, no global
    window) and report each bucket's per-column min/max plus row count —
    the exact quantities file-skipping reads.  Under Z-order layout each
    bucket's per-column span is ~2^(bits/n)× narrower than random
    placement; comparing this report before/after is the layout's
    acceptance test."""
    keyed = zorder_keyed(df, columns, bits=bits)
    bits = min(bits, 63 // len(columns), 31)
    key_span = float(1 << (min(bits, 63 // len(columns), 31)
                           * len(columns)))
    bucket = F.least(
        F.floor(F.col("zkey").cast("double") / key_span * partitions)
        .cast("int"),
        F.lit(partitions - 1),
    )
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in columns:
        aggs += [F.min(c).alias(f"{c}_min"), F.max(c).alias(f"{c}_max")]
    return (keyed.withColumn("bucket", bucket)
            .groupBy("bucket").agg(*aggs).orderBy("bucket"))


# ----------------------------------------------------------------------
# skew report — per-key hotness diagnosis for join/groupBy planning
# ----------------------------------------------------------------------

def skew_report(df: DataFrame, key_col: str, *, top_k: int = 10
                ) -> DataFrame:
    """The question every shuffle plan starts with: how hot are the
    hottest keys?  Returns the ``top_k`` keys by row count (ties broken
    on the key, so the report is deterministic) with each key's 6-dp
    ``share`` of all rows and the global ``skew_factor`` = hottest-key
    count / mean-per-distinct-key — the number that decides between a
    plain shuffle join, AQE skew splitting, salting, or the chunked
    hot-key paths the temporal operators carry.

    Scale shape: one partial-agg exchange on the key (map-side combine
    makes the per-key counts cheap), a 1-row global rollup broadcast
    back, and a distributed sort-limit (TakeOrderedAndProject — no
    global sort materializes) for the top slice.
    """
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("n"))
    totals = counts.agg(
        F.sum("n").alias("__total"),
        F.count(F.lit(1)).alias("__nkeys"),
        F.max("n").alias("__maxn"),
    )
    enriched = counts.crossJoin(F.broadcast(totals)).select(
        F.col(key_col).cast("string").alias("key"),
        "n",
        F.round(F.col("n") / F.col("__total"), 6).alias("share"),
        F.round(F.col("__maxn") * F.col("__nkeys") / F.col("__total"), 6)
        .alias("skew_factor"),
    )
    return (enriched.orderBy(F.col("n").desc(), F.col("key").asc())
            .limit(top_k))
