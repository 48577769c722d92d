"""Dedup + similarity operators: planted duplicates must be found."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from autoextract.operators import dedup as DD
from autoextract.operators import similarity as SIM


@pytest.fixture(scope="module")
def docs(spark):
    base = [
        (0, "the quick brown fox jumps over the lazy dog near the river bank today"),
        (1, "the quick brown fox jumps over the lazy dog near the river bank today"),  # exact dup of 0
        (2, "The quick brown fox, jumps over the lazy dog near the river bank today!"),  # normalized dup
        (3, "the quick brown fox jumps over the lazy dog near the river bank tomorrow"),  # near dup (1 token)
        (4, "completely different content about spark shuffle partitions and skew handling"),
        (5, "another unrelated document discussing columnar storage and predicate pushdown"),
    ]
    return spark.createDataFrame(base, ["doc_id", "text"])


def test_exact_duplicate_groups(spark, docs):
    groups = {r["keeper_doc_id"]: r["n_docs"] for r in DD.exact_duplicate_groups(docs).collect()}
    assert groups[0] == 2  # docs 0,1
    assert sum(groups.values()) == 6


def test_exact_dedup_keeps_min(spark, docs):
    kept = sorted(r["doc_id"] for r in DD.exact_dedup(docs).collect())
    assert kept == [0, 2, 3, 4, 5]


def test_normalized_dedup_catches_case_punct(spark, docs):
    groups = {r["keeper_doc_id"]: r["n_docs"] for r in DD.normalized_duplicate_groups(docs).collect()}
    assert groups[0] == 3  # 0,1,2 collapse after normalization


def test_minhash_finds_near_dup(spark, docs):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in DD.minhash_verified_pairs(docs, threshold=0.5, n_hashes=8, n_bands=8).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0
    assert (0, 3) in pairs and 0.5 < pairs[(0, 3)] < 1.0
    assert all(a in (0, 1, 2, 3) and b in (0, 1, 2, 3) for a, b in pairs)


def test_simhash_near_dups(spark, docs):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in DD.simhash_near_dup_pairs(docs, max_hamming=10).collect()
    }
    assert pairs.get((0, 1)) == 0  # identical text → identical sketch
    # near dup within a few bits
    assert (0, 3) in pairs or (1, 3) in pairs


def test_simhash_deterministic(spark, docs):
    a = {r["doc_id"]: r["sk"] for r in docs.select("doc_id", DD.simhash64("text").alias("sk")).collect()}
    b = {r["doc_id"]: r["sk"] for r in docs.select("doc_id", DD.simhash64("text").alias("sk")).collect()}
    assert a == b
    assert a[0] == a[1]


@pytest.fixture(scope="module")
def embeddings(spark):
    import numpy as np

    rng = np.random.RandomState(11)
    rows = []
    base = rng.rand(8).astype("float32")
    for i in range(50):
        if i == 1:  # exact clone of vec 0
            v = base
        elif i == 2:  # tiny perturbation
            v = base + rng.rand(8).astype("float32") * 0.01
        else:
            v = rng.rand(8).astype("float32")
        rows.append((i, [float(x) for x in (base if i == 0 else v)], i % 5))
    return spark.createDataFrame(rows, ["vec_id", "embedding", "label"])


def test_cosine_topk_exact(spark, embeddings):
    q = [r["embedding"] for r in embeddings.where("vec_id = 0").collect()][0]
    top = SIM.cosine_topk(embeddings, list(q), k=3).collect()
    ids = [r["vec_id"] for r in top]
    assert ids[0] in (0, 1) and ids[1] in (0, 1)  # the two identical vectors
    assert ids[2] == 2
    assert top[0]["cosine"] == 1.0


def test_srp_ann_finds_clones(spark, embeddings):
    q = [r["embedding"] for r in embeddings.where("vec_id = 0").collect()][0]
    top = SIM.ann_topk_via_srp(embeddings, list(q), dim=8, k=3, n_planes=4).collect()
    ids = {r["vec_id"] for r in top}
    assert 0 in ids and 1 in ids  # clones share every SRP bucket


def test_srp_buckets_deterministic(spark, embeddings):
    a = {r["vec_id"]: r["srp_bucket"] for r in SIM.srp_buckets(embeddings, dim=8).collect()}
    b = {r["vec_id"]: r["srp_bucket"] for r in SIM.srp_buckets(embeddings, dim=8).collect()}
    assert a == b
    assert a[0] == a[1]


def test_embedding_near_dup_pairs(spark, embeddings):
    pairs = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in SIM.embedding_near_dup_pairs(embeddings, threshold=0.999).collect()
    }
    assert (0, 1) in pairs


def test_embedding_near_dup_blas_matches_exact(spark, embeddings):
    """The Gram-matrix scale variant returns the SAME pair set as the
    expression-path exact variant (cosines within float tolerance) on a
    blocked corpus — and its one-matmul-per-block shape is the 100 TB
    path when combined with LSH blocking."""
    exact = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in SIM.embedding_near_dup_pairs(
            embeddings, threshold=0.5, block_col="label"
        ).collect()
    }
    blas = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in SIM.embedding_near_dup_pairs_blas(
            embeddings, threshold=0.5, block_col="label"
        ).collect()
    }
    # identical pair sets (threshold boundary coincidence is excluded by
    # construction: random vectors don't land within 1e-9 of 0.5)
    assert set(exact) == set(blas)
    for k in exact:
        assert abs(exact[k] - blas[k]) <= 1e-5, k


def test_embedding_near_dup_blas_block_cap(spark, embeddings):
    """Oversized blocks raise loudly instead of silently OOMing the
    executor's Gram matrix."""
    import pytest as _pytest

    with _pytest.raises(Exception, match="max_block_rows"):
        SIM.embedding_near_dup_pairs_blas(
            embeddings.withColumn("label", F.lit(0)),
            threshold=0.5,
            max_block_rows=10,
        ).collect()


def test_ivf_ann_finds_clones(spark, embeddings):
    q = [r["embedding"] for r in embeddings.where("vec_id = 0").collect()][0]
    top = SIM.ann_topk_via_ivf(
        embeddings, list(q), k=3, n_cells=4, nprobe=1, seed=7
    ).collect()
    ids = {r["vec_id"] for r in top}
    # clones of the query land in the query's own cell → always found
    assert 0 in ids and 1 in ids


def test_ivf_assign_deterministic_and_partitioned(spark, embeddings):
    cents = SIM.train_ivf_centroids(embeddings, n_cells=4, seed=7)
    a = {r["vec_id"]: r["ivf_cell"] for r in SIM.ivf_assign(embeddings, cents).collect()}
    b = {r["vec_id"]: r["ivf_cell"] for r in SIM.ivf_assign(embeddings, cents).collect()}
    assert a == b
    assert a[0] == a[1]  # identical vectors share a cell
    assert set(a.values()) <= set(range(4))


def test_ivf_nprobe_full_equals_exact(spark, embeddings):
    """nprobe = n_cells degenerates to exact brute-force top-k."""
    q = [r["embedding"] for r in embeddings.where("vec_id = 0").collect()][0]
    exact = [r["vec_id"] for r in SIM.cosine_topk(embeddings, list(q), k=5).collect()]
    full = [
        r["vec_id"]
        for r in SIM.ann_topk_via_ivf(
            embeddings, list(q), k=5, n_cells=4, nprobe=4, seed=7
        ).collect()
    ]
    assert full == exact


def test_srp_multiprobe_recall_at_16_planes(spark):
    """Hamming-1 multi-probe recovers near-clones that a single 16-plane
    bucket misses (one hyperplane flip ejects a neighbor from the query's
    bucket — the recall cliff VERDICT r1 #8 flagged). recall@10 >= 0.9 vs
    brute-force cosine."""
    import numpy as np

    rng = np.random.RandomState(3)
    dim = 16
    q = rng.randn(dim)
    rows = []
    for i in range(12):  # planted near-clones: the true top neighbors
        v = q + rng.randn(dim) * 0.05
        rows.append((i, [float(x) for x in v]))
    for i in range(12, 400):
        rows.append((i, [float(x) for x in rng.randn(dim)]))
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])

    exact = {r["vec_id"] for r in SIM.cosine_topk(emb, list(q), k=10).collect()}
    approx = {
        r["vec_id"]
        for r in SIM.ann_topk_via_srp(
            emb, list(q), dim=dim, k=10, n_planes=16, probe_hamming=1
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"recall@10 = {recall}"


def test_winnowing_guarantee(spark, docs):
    """Winnowing's core property: two docs sharing a run of >= window+k-1
    tokens share at least one fingerprint; identical docs share all of them."""
    fps = DD.winnowing_fingerprints(docs, k=3, window=4)
    by_doc = {}
    for r in fps.collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc[0] == by_doc[1]                       # exact dup: same set
    assert by_doc[0] & by_doc[3]                        # near dup: overlap
    assert not (by_doc[0] & by_doc[4])                  # unrelated: disjoint
    # selection actually prunes: fewer fingerprints than shingles
    n_shingles = len(docs.collect()[0]["text"].split()) - 2
    assert 0 < len(by_doc[0]) < n_shingles


def test_batch_ann_knn_join(spark, embeddings):
    """k-NN join: every row gets neighbors; planted clones find each other
    at rank 1 with cosine 1.0; ranks are dense and deterministic."""
    out = SIM.batch_ann_topk(embeddings, dim=8, k=3, n_planes=4).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["qid"], []).append((r["rank"], r["nid"], r["cosine"]))
    # vec 0 and 1 are identical: each is the other's top neighbor
    top0 = sorted(by_q[0])[0]
    assert top0[1] == 1 and top0[2] == 1.0
    top1 = sorted(by_q[1])[0]
    assert top1[1] == 0 and top1[2] == 1.0
    # no self pairs, ranks start at 1 and are <= k
    assert all(r["qid"] != r["nid"] for r in out)
    assert all(1 <= r["rank"] <= 3 for r in out)
    # every bucketed row got at least one neighbor (multi-probe coverage)
    assert len(by_q) >= 45


# ----------------------------------------------------------------------
# driver-checked verdict tables (r3): the engine-side facts behind the
# constant all-true oracles in __spark_entry__.oracle_sql
# ----------------------------------------------------------------------

SF001 = "/root/testdata/sf0.01"


def test_plant_near_neighbors_twin_geometry(spark):
    """The planted ε-twin is deterministic and nearly colinear with its
    query (cosine ≈ 1), and its id is offset by PLANT_ID_OFFSET."""
    import numpy as np

    e = spark.read.parquet(SF001 + "/embeddings.parquet")
    planted = SIM.plant_near_neighbors(e, n_queries=4)
    rows = {r["vec_id"]: np.array(r["embedding"], dtype=float) for r in planted.where(
        (F.col("vec_id") < 4) | (F.col("vec_id") >= SIM.PLANT_ID_OFFSET)
    ).collect()}
    for qid in range(4):
        a, b = rows[qid], rows[qid + SIM.PLANT_ID_OFFSET]
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert cos > 0.99
    once = {r["vec_id"]: list(r["embedding"]) for r in planted.where(
        F.col("vec_id") >= SIM.PLANT_ID_OFFSET).collect()}
    again = {r["vec_id"]: list(r["embedding"]) for r in SIM.plant_near_neighbors(
        e, n_queries=4).where(F.col("vec_id") >= SIM.PLANT_ID_OFFSET).collect()}
    assert again == once


def test_srp_ann_verdict_all_true(spark):
    e = spark.read.parquet(SF001 + "/embeddings.parquet")
    rows = SIM.srp_ann_verdict(e, n_queries=8, k=10, n_planes=4).collect()
    assert len(rows) == 8 and all(r["ann_ok"] for r in rows)


def test_ivf_ann_verdict_all_true(spark):
    e = spark.read.parquet(SF001 + "/embeddings.parquet")
    rows = SIM.ivf_ann_verdict(e, n_queries=8, k=10, n_cells=8, nprobe=2).collect()
    assert len(rows) == 8 and all(r["ann_ok"] for r in rows)


def test_batch_knn_verdict_all_true(spark):
    e = spark.read.parquet(SF001 + "/embeddings.parquet")
    dim = len(e.select("embedding").first()["embedding"])
    rows = SIM.batch_knn_verdict(e, dim=dim, n_queries=50, k=5).collect()
    assert len(rows) == 50 and all(r["ann_ok"] for r in rows)


def test_ann_verdict_detects_broken_probing(spark):
    """Negative control: recall floor above 1.0 is unsatisfiable, so the
    verdict machinery must actually flip rows (not be hardwired true)."""
    e = spark.read.parquet(SF001 + "/embeddings.parquet")
    rows = SIM.srp_ann_verdict(e, n_queries=4, k=10, n_planes=4, recall_floor=1.1).collect()
    assert not any(r["ann_ok"] for r in rows)


def test_simhash_verdict_all_true(spark):
    d = spark.read.parquet(SF001 + "/documents.parquet")
    rows = DD.simhash_verdict(d, n_docs=100).collect()
    assert len(rows) == 100 and all(r["simhash_ok"] for r in rows)


def test_simhash_verdict_detects_broken_locality(spark):
    """Negative control: a zero near-cap rejects any real one-token edit."""
    d = spark.read.parquet(SF001 + "/documents.parquet")
    rows = DD.simhash_verdict(d, n_docs=20, near_cap=0).collect()
    assert sum(1 for r in rows if not r["simhash_ok"]) > 0


def test_connected_components_known_graph(spark):
    """Chain, triangle, pair, singleton — min-label + pointer jumping lands
    the minimum reachable id on every node."""
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (20, 22)],
        ["doc_a", "doc_b"],
    )
    nodes = spark.createDataFrame(
        [(i,) for i in [0, 1, 2, 3, 10, 11, 20, 21, 22, 30]], ["doc_id"]
    )
    cc = {r["doc_id"]: r["component"] for r in DD.connected_components(edges, nodes).collect()}
    assert all(cc[i] == 0 for i in (0, 1, 2, 3))
    assert cc[10] == cc[11] == 10
    assert cc[20] == cc[21] == cc[22] == 20
    assert cc[30] == 30


def test_connected_components_long_path_converges(spark):
    """A 64-node path graph needs pointer jumping (plain propagation would
    take 64 rounds; the jump makes it O(log n) < max_iters)."""
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], ["doc_a", "doc_b"]
    )
    cc = DD.connected_components(edges, max_iters=12).collect()
    assert len(cc) == 64 and all(r["component"] == 0 for r in cc)


def test_duplicate_clusters_matches_union_find(spark):
    """The Spark component labels equal a driver union-find over the same
    verified pair list, on the real sf0.01 corpus."""
    docs = spark.read.parquet(SF001 + "/documents.parquet")
    pairs = DD.minhash_verified_pairs(docs, threshold=0.6).select(
        "doc_a", "doc_b"
    ).collect()
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in pairs:
        ra, rb = find(r["doc_a"]), find(r["doc_b"])
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    got = {r["doc_id"]: r["component"] for r in DD.duplicate_clusters(docs, threshold=0.6).collect()}
    all_ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    assert len(got) == len(all_ids)
    assert all(got[i] == find(i) for i in all_ids)
    assert sum(1 for i in all_ids if got[i] != i) > 0  # corpus has real dups


def test_canonical_docs_quality_argmax(spark):
    """canonical_docs keeps exactly one member per cluster — the one with
    most tokens, ties to the smallest doc_id — via the skew-proof max_by
    aggregation (no per-component window sort)."""
    from autoextract.operators import dedup as DD

    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon zeta eta"),   # same cluster, longer
        (3, "alpha beta gamma delta epsilon zeta"),        # tie vs 1 → keep 1? no: 2 is longest
        (10, "completely different text about other things"),
        (11, "short"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in DD.canonical_docs(docs, threshold=0.5, k=2).collect()}
    assert len(out) == 5
    cluster = {out[i]["component"] for i in (1, 2, 3)}
    assert len(cluster) == 1  # 1,2,3 really clustered
    assert out[2]["is_canonical"] is True        # longest member wins
    assert out[1]["is_canonical"] is False and out[3]["is_canonical"] is False
    assert out[10]["is_canonical"] is True and out[11]["is_canonical"] is True
    canon_per_comp = {}
    for r in out.values():
        canon_per_comp[r["component"]] = canon_per_comp.get(r["component"], 0) + (
            1 if r["is_canonical"] else 0
        )
    assert all(v == 1 for v in canon_per_comp.values())


def test_remove_common_lines_boilerplate_strip(spark):
    """CCNet-style line dedup: lines in >= min_docs distinct docs vanish
    corpus-wide, survivors keep order, fully-stripped docs yield an empty
    clean_text row (never disappear)."""
    from autoextract.operators import dedup as DD

    rows = [
        (1, "COMMON HEADER\nunique one\nCOMMON FOOTER"),
        (2, "COMMON HEADER\nunique two\nCOMMON FOOTER"),
        (3, "COMMON HEADER\nonly here\nalso only here"),
        (4, "totally unique document"),
        (5, "COMMON HEADER\nCOMMON FOOTER"),  # nothing survives
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in DD.remove_common_lines(docs, min_docs=2).collect()}
    assert out[1]["clean_text"] == "unique one" and out[1]["n_removed"] == 2
    assert out[2]["clean_text"] == "unique two"
    assert out[3]["clean_text"] == "only here\nalso only here"
    assert out[4]["clean_text"] == "totally unique document"
    assert out[5]["clean_text"] == "" and out[5]["n_kept"] == 0
    # higher threshold: the 2-doc footer survives
    out3 = {r["doc_id"]: r for r in DD.remove_common_lines(docs, min_docs=4).collect()}
    assert out3[1]["clean_text"] == "unique one\nCOMMON FOOTER"


def test_contamination_flags_strict_full_grams(spark):
    """Decontamination: full 13-gram matches flag with exact hit counts;
    docs shorter than n contribute and match nothing."""
    from autoextract.operators import dedup as DD

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog every single day again")],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            (1, "prefix words then the quick brown fox jumps over the lazy dog "
                "every single day again and more"),
            (2, "no overlap at all here just unrelated content words going on and on"),
            (3, "short doc"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in DD.contamination_flags(docs, bench, n=13).collect()}
    assert out[1]["contaminated"] is True and out[1]["n_hits"] == 1
    assert out[2]["contaminated"] is False and out[2]["n_hits"] == 0
    assert out[3]["contaminated"] is False


# ---------------------------------------------------------------- ExactSubstr


def _substr_rows(spark, texts, window=4):
    from autoextract.operators.dedup import exact_substring_dedup

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = exact_substring_dedup(df, window=window).orderBy("doc_id").collect()
    return {r["doc_id"]: r for r in out}


def test_substr_whole_duplicate_doc_empties_later_copy(spark):
    t = "a b c d e f g h"
    rows = _substr_rows(spark, [t, t], window=4)
    assert rows[0]["clean_text"] == t and rows[0]["n_dup_tokens"] == 0
    assert rows[1]["clean_text"] == "" and rows[1]["n_dup_tokens"] == 8


def test_substr_short_doc_passes_through(spark):
    rows = _substr_rows(spark, ["x y z", "x y z"], window=4)
    # both copies are shorter than the window: no grams, nothing excised
    for i in (0, 1):
        assert rows[i]["clean_text"] == "x y z"
        assert rows[i]["n_dup_tokens"] == 0


def test_substr_overlapping_runs_merge(spark):
    # doc1 embeds a 6-token run of doc0 -> three overlapping dup 4-grams
    # merge into ONE range of 6 tokens, not 12
    rows = _substr_rows(
        spark,
        ["p q r s t u", "A B p q r s t u C D"],
        window=4,
    )
    assert rows[0]["n_dup_tokens"] == 0
    assert rows[1]["n_dup_tokens"] == 6
    assert rows[1]["clean_text"] == "A B C D"


def test_substr_within_doc_repeat_keeps_first(spark):
    # the same 4-gram twice inside one doc: the second occurrence is excised
    rows = _substr_rows(spark, ["m n o p X m n o p"], window=4)
    assert rows[0]["n_dup_tokens"] == 4
    assert rows[0]["clean_text"] == "m n o p X"


def test_substr_deterministic_across_shuffle_partitions(spark):
    from autoextract.operators.dedup import exact_substring_dedup

    texts = [("d%d" % i, "w%d x y z a b c d e f" % (i % 3)) for i in range(30)]
    df = spark.createDataFrame(texts, "doc_id string, text string")
    a = {
        r["doc_id"]: (r["n_dup_tokens"], r["clean_text"])
        for r in exact_substring_dedup(df.repartition(1), window=5).collect()
    }
    b = {
        r["doc_id"]: (r["n_dup_tokens"], r["clean_text"])
        for r in exact_substring_dedup(df.repartition(7), window=5).collect()
    }
    assert a == b


# ---------------------------------------------------------------- SemDeDup


def test_semantic_dedup_drops_planted_twins(spark):
    from autoextract.operators.similarity import (
        PLANT_ID_OFFSET,
        plant_near_neighbors,
        semantic_dedup,
    )

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    planted = plant_near_neighbors(e, 4)
    out = semantic_dedup(planted, threshold=0.95, n_cells=4)
    rows = {r["vec_id"]: r for r in out.collect()}
    assert len(rows) == planted.count()  # every row survives with a verdict
    for q in range(4):
        o, t = rows[q], rows[q + PLANT_ID_OFFSET]
        assert o["rep_id"] == t["rep_id"]  # twin pair in one component
        assert o["keep"] and not t["keep"]  # min-id keeper policy
    # keepers are exactly the component minima, one per component
    comps = {}
    for r in rows.values():
        comps.setdefault(r["rep_id"], []).append(r)
    for rep, members in comps.items():
        keeps = [m for m in members if m["keep"]]
        assert len(keeps) == 1 and keeps[0]["vec_id"] == min(
            m["vec_id"] for m in members
        ) == rep


def test_semantic_dedup_verdict_all_true(spark):
    from autoextract.operators.similarity import semantic_dedup_verdict

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = semantic_dedup_verdict(e, n_plants=4, n_cells=4).collect()
    assert [r["query_id"] for r in out] == [0, 1, 2, 3]
    assert all(r["semdedup_ok"] for r in out)


def test_incremental_dedup_three_ways(spark):
    from pyspark.sql import functions as F

    from autoextract.operators.dedup import incremental_dedup

    seen_docs = spark.createDataFrame(
        [(i, f"seen text {i}") for i in range(5)], "doc_id long, text string"
    )
    seen = seen_docs.select(F.sha2("text", 256).alias("text_hash"))
    batch = spark.createDataFrame(
        [(10, "seen text 2")]             # bounces off the fingerprint table
        + [(11, "fresh a"), (12, "fresh a")]  # in-batch dup -> keeper 11
        + [(13, "fresh b")],
        "doc_id long, text string",
    )
    got = sorted(r["doc_id"] for r in incremental_dedup(batch, seen).collect())
    assert got == [11, 13]


def test_incremental_dedup_partition_invariant_and_replay_idempotent(spark):
    from pyspark.sql import functions as F

    from autoextract.operators.dedup import incremental_dedup

    batch = spark.createDataFrame(
        [(i, f"t{i % 7}") for i in range(30)], "doc_id long, text string"
    )
    seen = spark.createDataFrame([("t0",), ("t3",)], "text string").select(
        F.sha2("text", 256).alias("text_hash")
    )
    a = sorted(map(tuple, incremental_dedup(batch.repartition(2), seen).collect()))
    b = sorted(map(tuple, incremental_dedup(batch.repartition(9), seen).collect()))
    assert a == b
    admitted = incremental_dedup(batch, seen)
    # replay: union the admitted hashes into seen -> the same batch now
    # admits nothing (append-only fingerprint table is idempotent)
    seen2 = seen.unionByName(
        admitted.select(F.sha2("text", 256).alias("text_hash"))
    )
    assert incremental_dedup(batch, seen2).count() == 0
