"""Corpus-assembly sampling — deterministic downsampling and sharding for
training-data pipelines.

Three operators the 100 TB run needs between dedup and packing:

* :func:`source_quota_sample` — downsample over-represented sources to a
  per-source document cap (the CCNet/Dolma "domain quota" step) with a
  hash-threshold Bernoulli rule.  Scale shape: one tiny per-source count
  aggregate (map-side combined, a handful of rows) broadcast back onto the
  corpus; the big side is a single filter pass — no shuffle of document
  rows, no per-source window sort, immune to mega-source skew.
* :func:`temperature_mixture_sample` — reshape the source mixture to
  ``p_s ∝ n_s^alpha`` (the multilingual-LM temperature rule); same
  broadcast-filter scale shape as the quota, but targeting a corpus-wide
  distribution instead of independent caps.
* :func:`shard_assignment` — deterministic pseudo-random shard id +
  within-shard order for writing training shards: every engine and every
  cluster size produces byte-identical shard contents and ordering.  Scale
  shape: shard = hash % K is a map-side expression; the within-shard
  position is a rank inside each shard, which physically matches how the
  write happens anyway (``repartition(K)`` + ``sortWithinPartitions``) —
  the sort is per-shard, never global.

Both use the repo's engine-portable hash (md5 prefix → uint32, the same
family as :func:`autoextract.functions.text.train_val_split`): assignments
are reproducible across runs, cluster sizes AND engines, re-saltable for
fresh draws, and each row's fate depends only on its own key — corpus
growth never reshuffles prior decisions (hash-threshold sampling keeps a
superset-stable sample as caps rise).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: size of the md5-prefix hash space: first 8 hex chars → [0, 2^32)
_HASH_SPACE = 4294967296.0


def _hash32(col, salt: str):
    """First 8 hex of ``md5(key ‖ salt)`` as a BIGINT in [0, 2^32) — the
    engine-portable uniform hash (xxhash64 does not exist in DuckDB)."""
    return F.conv(
        F.substring(F.md5(F.concat(col.cast("string"), F.lit(salt))), 1, 8),
        16,
        10,
    ).cast("long")


def source_quota_sample(
    docs: DataFrame,
    cap: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "quota-v1",
) -> DataFrame:
    """Downsample each source to ~``cap`` documents: keep a row iff
    ``hash32(doc_id) < cap / count(source) * 2^32`` (sources at or under
    the cap keep everything).  Returns ``(doc_id, source, n_source_docs)``
    for the kept rows.

    The threshold comparison is float but deterministic: both engines
    evaluate the identical IEEE expression ``cap / cnt * 2^32``, so the
    kept set is exactly reproducible (the driver oracle recomputes it in
    DuckDB).  Expected kept count per source is ``cap`` ± binomial noise;
    the rule is the scale path — an exact top-``cap``-by-hash needs a
    per-source sort that a mega-source turns into a straggler, while this
    is a broadcast-joined filter.
    """
    if cap <= 0:
        raise ValueError("cap must be positive")
    counts = docs.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_source_docs")
    )
    h = _hash32(F.col(id_col), salt)
    return (
        docs.select(id_col, source_col)
        .join(F.broadcast(counts), source_col)
        .where(
            (F.col("n_source_docs") <= cap)
            | (h < F.lit(float(cap)) / F.col("n_source_docs") * F.lit(_HASH_SPACE))
        )
        .select(id_col, source_col, "n_source_docs")
    )


def shard_assignment(
    docs: DataFrame,
    n_shards: int = 16,
    id_col: str = "doc_id",
    salt: str = "shard-v1",
) -> DataFrame:
    """Deterministic training-shard layout: ``(doc_id, shard, pos)`` where
    ``shard = hash32(doc_id ‖ salt) % n_shards`` and ``pos`` is the row's
    0-based position within its shard under a second independent hash
    (tie-broken by doc_id) — a reproducible global pseudo-shuffle, so the
    written shards are byte-identical regardless of engine, run, or
    cluster size.

    The rank is per-shard (Window PARTITION BY shard), matching the
    physical write pattern ``repartition(n_shards) +
    sortWithinPartitions`` — each shard sorts independently; there is no
    global sort.  With n_shards sized so a shard is a comfortable task
    (e.g. 10^12 docs / 10^5 shards = 10^7 docs ≈ a few GB per shard), the
    sort stays in-memory per task; skew is impossible because shard
    membership is a uniform hash.
    """
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    shard = (_hash32(F.col(id_col), salt) % n_shards).alias("shard")
    order_key = _hash32(F.col(id_col), salt + "/order").alias("order_key")
    w = Window.partitionBy("shard").orderBy("order_key", id_col)
    return (
        docs.select(id_col, shard, order_key)
        .withColumn("pos", (F.row_number().over(w) - 1).cast("long"))
        .select(id_col, "shard", "pos")
    )


def temperature_mixture_sample(
    docs: DataFrame,
    alpha: float = 0.5,
    target_total: int = 1000,
    source_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "temp-v1",
) -> DataFrame:
    """Temperature-scaled mixture resampling: reshape the per-source
    distribution to ``p_s ∝ n_s^alpha`` (the multilingual-LM upsampling
    rule — alpha<1 flattens the mixture toward rare sources) and keep each
    row iff ``hash32(doc_id) < min(1, target_total·p_s/n_s)·2^32``.

    The complement of :func:`source_quota_sample`: a quota CAPS each
    source independently, temperature sampling targets a corpus-wide
    SHAPE.  Returns ``(doc_id, source, n_source_docs, p_target)`` for the
    kept rows, where ``p_target`` is the source's target mixture share.

    Scale shape is identical to the quota rule: the per-source counts and
    the scalar ``Σ n_t^alpha`` are a handful of rows broadcast onto one
    corpus filter pass — no document-row shuffle, no window, mega-source
    immune.  Acceptance cannot upsample (rate is clamped at 1); a true
    >1× upsample is a write-time repeat, not a filter, and stays out of
    scope here.  Hash-threshold acceptance keeps the sample
    superset-stable as ``target_total`` rises, and the threshold
    expression ``least(1, target·pow(n,alpha)/Σpow/n)·2^32`` is evaluated
    in the identical IEEE order by the DuckDB oracle.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError("alpha must be in (0, 1]")
    if target_total <= 0:
        raise ValueError("target_total must be positive")
    counts = docs.groupBy(source_col).agg(
        F.count(F.lit(1)).cast("double").alias("n_src")
    )
    sum_pow = counts.agg(
        F.sum(F.pow("n_src", F.lit(float(alpha)))).alias("sum_pow")
    )
    h = _hash32(F.col(id_col), salt)
    rate = F.least(
        F.lit(1.0),
        F.lit(float(target_total))
        * F.pow("n_src", F.lit(float(alpha)))
        / F.col("sum_pow")
        / F.col("n_src"),
    )
    return (
        docs.select(id_col, source_col)
        .join(F.broadcast(counts), source_col)
        .join(F.broadcast(sum_pow))
        .where(h < rate * F.lit(_HASH_SPACE))
        .select(
            id_col,
            source_col,
            F.col("n_src").cast("long").alias("n_source_docs"),
            F.round(
                F.pow("n_src", F.lit(float(alpha))) / F.col("sum_pow"), 6
            ).alias("p_target"),
        )
    )


def host_cap_topk(
    docs: DataFrame,
    cap: int,
    key_col: str = "source",
    priority_col: str | None = None,
    id_col: str = "doc_id",
    salt_parts: int | None = None,
    salt: str = "hostcap-v1",
) -> DataFrame:
    """EXACT per-host cap: keep the best ``min(cap, n)`` documents per key,
    ranked by ``priority_col`` descending (quality-first, the C4/RefinedWeb
    per-host cap) with the id as the deterministic tie-break; no priority →
    hash order (a uniform "first N").

    Unlike :func:`source_quota_sample` (Bernoulli, ~cap in expectation)
    this is exact — the shape needed when the budget is a hard limit.  The
    naive plan is one window over ``key_col``, which serializes a mega-host
    into a single task.  ``salt_parts=k`` selects the skew-safe two-phase
    plan: rank within ``(key, hash % k)`` first and keep ``cap`` per
    sub-partition (the global per-key top-cap is always a subset of the
    union of sub-partition top-caps), then re-rank only those ``≤ cap·k``
    survivors per key.  Phase-1 tasks are bounded by the largest host
    divided by k; phase 2 is bounded by ``cap·k`` rows per host regardless
    of host size.  Both phases are pure-JVM window aggregates; the result
    is identical to the single-phase plan (tested).

    Returns ``(id, key, rank)`` with ``rank`` in [1, cap] — deterministic
    across cluster sizes and engines (md5 ordering, no floats).
    """
    if cap <= 0:
        raise ValueError("cap must be positive")
    order = (
        [F.col(priority_col).desc()] if priority_col else []
    ) + [_hash32(F.col(id_col), salt).asc(), F.col(id_col).asc()]
    keep = [id_col, key_col] + ([priority_col] if priority_col else [])
    sub = docs.select(*keep)
    if salt_parts and salt_parts > 1:
        part = F.pmod(_hash32(F.col(id_col), salt + "-part"), F.lit(salt_parts))
        w1 = Window.partitionBy(F.col(key_col), part).orderBy(*order)
        sub = (
            sub.withColumn("__r1", F.row_number().over(w1))
            .where(F.col("__r1") <= cap)
            .drop("__r1")
        )
    w = Window.partitionBy(key_col).orderBy(*order)
    return (
        sub.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= cap)
        .select(id_col, key_col, F.col("rank").cast("int").alias("rank"))
    )


def dsir_importance_weights(
    raw: DataFrame,
    target: DataFrame,
    n_buckets: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "dsir-v1",
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score each raw document
    by how much more likely its hashed-bigram features are under the
    TARGET domain's distribution than under the raw corpus's own:

      log w(d) = Σ_features  count_d(b) · [ ln p_target(b) − ln p_raw(b) ]

    with Laplace-smoothed categorical distributions over ``n_buckets``
    hashed-bigram buckets (bucket = md5-prefix hash of the adjacent word
    pair, the repo's engine-portable family; production swaps xxhash64).

    Scale shape: two bucket-count aggregates partial-combine on a SHORT
    int key with bounded cardinality (``n_buckets``) — the log-ratio
    table is ≤``n_buckets`` rows and broadcasts; the per-doc pass is
    explode → broadcast join → one groupBy(``id_col``) sum.  Raw text
    never shuffles; a doc with <2 tokens carries weight 0.  Output:
    ``(id_col, n_features, log_w)`` for EVERY raw row, ``log_w`` rounded
    to 6 dp (float-sum-order guard, house convention).
    """
    from ..functions.text import tokens

    if n_buckets <= 0:
        raise ValueError("n_buckets must be positive")

    def bucket_rows(df):
        # staged projections: the token array lands in a column FIRST so
        # every later reference is a cheap attribute — the previous
        # slice/arrays_zip form re-evaluated the tokenize tree ~6× per row
        # (size bound, two slices, the length filter) and copied the token
        # array three times. Bucket ids come straight out of one indexed
        # transform (element_at is O(1)); explode_outer, not explode: the
        # array is never empty for n ≥ 2 rows, and a bare explode lets
        # InferFiltersFromGenerate inline the whole chain into a per-row
        # size()>0 predicate (the winnowing lesson).
        tk = df.select(
            F.col(id_col),
            F.filter(tokens(F.col(text_col)), lambda x: x != F.lit("")).alias(
                "_tk"
            ),
        ).where(F.size("_tk") >= 2)
        buckets = tk.select(
            id_col,
            F.transform(
                F.sequence(F.lit(1), F.size("_tk") - 1),
                lambda i: F.pmod(
                    _hash32(
                        F.concat(
                            F.element_at(F.col("_tk"), i),
                            F.lit(" "),
                            F.element_at(F.col("_tk"), i + 1),
                        ),
                        salt,
                    ),
                    F.lit(n_buckets),
                ),
            ).alias("_bk"),
        )
        return buckets.select(id_col, F.explode_outer("_bk").alias("bucket"))

    raw_b = bucket_rows(raw)
    tgt_b = bucket_rows(target)
    # r6 one-pass-per-side shape (VERDICT r5 finding #3: the lazy plan
    # re-evaluated the corpus explode once per consumer — per-doc weights,
    # bucket census, census total = 3×; target side 2×). The bucket
    # censuses are ≤``n_buckets`` short rows by construction, so they are
    # the guide §8 "small proxy": collect them once (a bounded driver
    # transfer, same class as the k·dim k-means round), derive the totals
    # as exact Python-int sums, and fold the Laplace log-ratio table into
    # a literal per-bucket array. The remaining lazy plan touches the
    # corpus exactly once more — explode → element_at(λ, bucket) →
    # groupBy(doc) — with no join and nothing recomputed. The λ expression
    # is evaluated by the same JVM ``log`` over the same integer counts as
    # the previous broadcast-join form, so weights are bit-identical.
    rc = dict(
        raw_b.groupBy("bucket").agg(F.count("*").alias("n")).collect()
    )
    tc = dict(
        tgt_b.groupBy("bucket").agg(F.count("*").alias("n")).collect()
    )
    rt, tt = sum(rc.values()), sum(tc.values())
    # one expr() string, not 256 Column objects: the per-element Column
    # construction costs ~1.5k py4j round-trips per call (~2 s of driver
    # time); the SQL form is a single call and the identical JVM ln/÷
    # arithmetic over the same exact-integer counts, so λ is bit-identical
    lam_arr = F.expr(
        "array("
        + ",".join(
            f"ln(({tc.get(b, 0)}+1.0D)/({tt}+{n_buckets}.0D))"
            f"-ln(({rc.get(b, 0)}+1.0D)/({rt}+{n_buckets}.0D))"
            for b in range(n_buckets)
        )
        + ")"
    )
    perdoc = (
        raw_b.withColumn(
            "lam",
            F.element_at(lam_arr, (F.col("bucket") + 1).cast("int")),
        )
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_features"),
            F.sum("lam").alias("__lw"),
        )
    )
    return (
        raw.select(id_col)
        .join(perdoc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_features", F.lit(0).cast("long")).alias("n_features"),
            F.round(F.coalesce("__lw", F.lit(0.0)), 6).alias("log_w"),
        )
    )


def dsir_resample(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    n_buckets: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "dsir-v1",
) -> DataFrame:
    """DSIR selection: Gumbel-top-k importance resampling WITHOUT
    replacement over :func:`dsir_importance_weights` — the paper's
    sampling rule, derandomized with the engine-portable hash so every
    engine/cluster draws the identical sample:

      key(d) = log w(d) + Gumbel(d),
      Gumbel(d) = −ln(−ln( (hash32(id ‖ salt/g) + 0.5) / 2^32 ))

    and the sample is the global top-``k`` by key.  Top-k is a sort-limit
    (Spark's distributed TakeOrdered — no single-partition window); the
    rank is re-derived on the ≤k survivors only.  Ranking uses the
    6-dp-rounded key with an ``id_col`` tie-break, so the oracle's
    ordering is bit-identical.  Output: ``(id_col, log_w, key, rank)``.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    w = dsir_importance_weights(
        raw, target, n_buckets=n_buckets, id_col=id_col, text_col=text_col, salt=salt
    )
    u = (_hash32(F.col(id_col), salt + "/g") + 0.5) / F.lit(_HASH_SPACE)
    keyed = w.select(
        id_col,
        "log_w",
        F.round(F.col("log_w") - F.log(-F.log(u)), 6).alias("key"),
    )
    topk = keyed.orderBy(F.col("key").desc(), F.col(id_col).asc()).limit(k)
    wr = Window.orderBy(F.col("key").desc(), F.col(id_col).asc())
    return topk.withColumn("rank", F.row_number().over(wr).cast("int"))
