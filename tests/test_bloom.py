"""Bloom-prefiltered incremental dedup (operators/dedup.py).

The contract under test: ``incremental_dedup_bloom`` is bit-identical to
``incremental_dedup`` for ANY filter sizing — the Bloom stage may only
prune the fingerprint table, never change the admitted set.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from autoextract.operators.dedup import (
    bloom_bits,
    bloom_might_contain,
    incremental_dedup,
    incremental_dedup_bloom,
)


def _docs(spark, ids):
    return spark.createDataFrame(
        [(i, f"document body {i} with content") for i in ids],
        "doc_id long, text string",
    )


def test_bloom_no_false_negatives(spark):
    keys = _docs(spark, range(100)).select(
        F.sha2("text", 256).alias("h")
    )
    bloom = bloom_bits(keys, "h")
    probed = bloom_might_contain(keys, "h", bloom)
    assert probed.where(~F.col("might_contain")).count() == 0


def test_bloom_rejects_non_members(spark):
    members = _docs(spark, range(100)).select(F.sha2("text", 256).alias("h"))
    others = _docs(spark, range(10_000, 10_100)).select(
        F.sha2("text", 256).alias("h")
    )
    bloom = bloom_bits(members, "h")
    # deterministic fixture: at m=2^20, k=4 the expected FP count over 100
    # probes is ~1e-14 — any hit here means the probe logic is broken
    assert (
        bloom_might_contain(others, "h", bloom)
        .where(F.col("might_contain"))
        .count()
        == 0
    )


def _fixture(spark):
    seen = _docs(spark, range(50)).select(F.sha2("text", 256).alias("text_hash"))
    batch = (
        _docs(spark, range(25, 75))
        .unionByName(
            _docs(spark, range(60, 65)).select(
                (F.col("doc_id") + 1000).alias("doc_id"), "text"
            )
        )
    )
    return batch, seen


def test_bloom_variant_equals_plain(spark):
    batch, seen = _fixture(spark)
    plain = {
        (r["doc_id"],) for r in incremental_dedup(batch, seen).collect()
    }
    bloomed = {
        (r["doc_id"],)
        for r in incremental_dedup_bloom(batch, seen).collect()
    }
    assert bloomed == plain
    assert {d for (d,) in plain if d < 1000} == set(range(50, 75))


def test_bloom_variant_exact_under_heavy_false_positives(spark):
    # m_bits=64 (a single word): nearly everything collides — the exact
    # anti-join must still produce the identical admitted set
    batch, seen = _fixture(spark)
    plain = {r["doc_id"] for r in incremental_dedup(batch, seen).collect()}
    tiny = {
        r["doc_id"]
        for r in incremental_dedup_bloom(batch, seen, m_bits=64, k=2).collect()
    }
    assert tiny == plain


# ----------------------------------------------------------------------
# fuzzy field pairs
# ----------------------------------------------------------------------

def test_fuzzy_field_pairs(spark):
    from autoextract.operators.dedup import fuzzy_field_pairs

    df = spark.createDataFrame(
        [(1, "Annual Report 2026"),
         (2, "Annuel Report 2026"),        # distance 1, same block
         (3, "ANNUAL  report 2026"),       # normalizes to distance 0
         (4, "Annual Report 1999 extra long"),  # different length bucket
         (5, "Budget Summary 2026")],      # different prefix
        "doc_id long, title string",
    )
    pairs = {(r["id1"], r["id2"]): r["distance"]
             for r in fuzzy_field_pairs(df, "title").collect()}
    assert pairs[(1, 2)] == 1
    assert pairs[(1, 3)] == 0 and pairs[(2, 3)] == 1
    assert not any(4 in p or 5 in p for p in pairs)
