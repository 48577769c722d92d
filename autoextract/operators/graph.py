"""Link-graph analytics for corpus curation — PageRank over the host/URL
graph.

Web-corpus pipelines rank hosts by link centrality and use the score as a
quality prior (crawl frontier ordering, spam-host down-weighting, and
"keep the top-ranked slice" curation policies). The reference app has no
graph surface; at 100 TB the link graph is a first-class input that arrives
with the crawl (WARC request/response records carry the URIs; the edge list
is a by-product of the HTML pass).

Scale shape per iteration: ``edges ⋈ ranks`` shuffles on the src key and the
contribution sum partial-aggregates on dst — two exchanges over (long, long,
double) rows, never over document payloads. Dangling-node mass is a 1-row
aggregate broadcast back (never a driver collect). Lineage is truncated
every round with ``localCheckpoint`` (same recipe as
``dedup.connected_components``); iterations are FIXED-count synchronous
Jacobi updates, so the result is engine-portable and the DuckDB oracle can
replay it as an unrolled CTE chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    n_iter: int = 10,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Synchronous PageRank with uniform dangling-mass redistribution:

    ``r'(v) = (1-d)/N + d * (Σ_{u→v} r(u)/deg(u) + D/N)``

    where ``D = Σ r(u)`` over nodes with no out-links. Duplicate edges are
    collapsed first (a crawl emits them). Returns ``(node, rank)`` after
    exactly ``n_iter`` rounds from the uniform start — fixed iterations,
    not a convergence test, so the output is deterministic and
    oracle-replayable. Ranks sum to 1 (mass-conserving) at every round.
    """
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    if not 0.0 < damping < 1.0:
        raise ValueError("damping must be in (0, 1)")
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).cast("double").alias("deg"))
    # out-degree pinned next to each node once; deg NULL marks dangling
    base = nodes.join(deg, nodes["node"] == deg["src"], "left").select(
        "node", "deg"
    ).localCheckpoint()
    n_nodes = base.count()  # scalar dimension, not data (bounded: one long)
    ranks = base.select("node", F.lit(1.0 / n_nodes).alias("rank"), "deg")
    for _ in range(n_iter):
        dangling = ranks.where(F.col("deg").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("d_mass")
        )
        contribs = (
            e.join(ranks.withColumnRenamed("node", "src"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("contrib"))
        )
        ranks = (
            base.join(contribs, base["node"] == contribs["dst"], "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n_nodes)
                    + F.lit(damping)
                    * (
                        F.coalesce("contrib", F.lit(0.0))
                        + F.col("d_mass") / F.lit(float(n_nodes))
                    )
                ).alias("rank"),
                "deg",
            )
            .localCheckpoint()
        )
    return ranks.select("node", "rank")


def pagerank_oracle_sql(
    edges_sql: str, n_iter: int = 10, damping: float = 0.85
) -> str:
    """The exact unrolled-CTE DuckDB replay of :func:`pagerank` for a given
    edge-list subquery ``edges_sql`` → columns ``(src, dst)``. Kept next to
    the operator so query and oracle can never drift."""
    d = damping
    # AS MATERIALIZED: each CTE is referenced by every unrolled round —
    # inlining would re-open the parquet scan per reference (and blow the
    # fd limit) and re-evaluate each round's ranks twice
    parts = [
        f"WITH e AS MATERIALIZED (SELECT DISTINCT src, dst FROM ({edges_sql}))",
        "nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "nn AS MATERIALIZED (SELECT COUNT(*)::DOUBLE AS n FROM nodes)",
        "deg AS MATERIALIZED (SELECT src, COUNT(*)::DOUBLE AS deg FROM e GROUP BY src)",
        "base AS MATERIALIZED (SELECT node, deg FROM nodes LEFT JOIN deg ON node = deg.src)",
        "r0 AS MATERIALIZED (SELECT node, 1.0/nn.n AS rank, deg FROM base, nn)",
    ]
    prev = "r0"
    for i in range(1, n_iter + 1):
        parts.append(
            f"""r{i} AS MATERIALIZED (
              SELECT b.node,
                     (1.0 - {d})/nn.n
                     + {d} * (COALESCE(c.contrib, 0.0)
                              + (SELECT COALESCE(SUM(rank), 0.0) FROM {prev}
                                 WHERE deg IS NULL) / nn.n) AS rank,
                     b.deg
              FROM base b CROSS JOIN nn
              LEFT JOIN (SELECT e.dst, SUM(p.rank / p.deg) AS contrib
                         FROM e JOIN {prev} p ON e.src = p.node
                         GROUP BY e.dst) c ON b.node = c.dst)"""
        )
        prev = f"r{i}"
    parts_sql = ",\n".join(parts)
    # 8 dp: ~1e9× above the float sum-order noise floor, well below any
    # rank gap that matters — both engines round identically here
    return f"{parts_sql}\nSELECT node, round(rank, 8) AS rank FROM {prev}"
