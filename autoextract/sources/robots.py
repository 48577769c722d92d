"""RFC 9309 robots.txt parsing + crawl-permission filtering — the
politeness front door of a web-scale corpus pipeline.

A 100 TB crawl corpus is only usable for training if the pipeline can
prove, per URL, that collection respected the host's published exclusion
rules; re-deriving the verdict from the archived ``robots.txt`` payloads is
also how post-hoc takedown/compliance audits run. The reference app has no
crawl front end (uploads arrive pre-blessed through the web UI,
``lambda/api/app/services/schema_service.py``), so this operator extends
the engine the same way the WARC front door (``sources/warc.py``) does:
by covering the shape real web corpora actually arrive in.

Spark-first shape — both stages are pure JVM expressions (split /
posexplode / windows / ``regexp_like``), no UDFs:

* ``parse_robots``: ``(host, robots_txt)`` → one row per (agent, rule).
  Group structure (consecutive ``User-agent`` lines own the rule block
  that follows, per RFC 9309 §2.2.1) is recovered with two window passes
  over the per-host line positions — one shuffle on ``host``, and a
  robots.txt is ≤500 KiB by spec so a host's lines always fit a task.
* ``robots_filter``: URL rows join the (pre-selected) rule rows on
  ``host`` — the natural shuffle key; per-host rule counts are small and
  bounded, so no skew — then a map-side-partial ``max(struct(...))``
  aggregation applies the RFC's longest-match-wins / allow-breaks-ties
  precedence without a second pass over raw rows. Two exchanges total.

Pattern semantics: ``*`` matches any octet sequence, a trailing ``$``
anchors the end, anything else is literal, and matching is anchored at the
path start (RFC 9309 §2.2.3). Patterns compile once per RULE row into a
Java∩RE2 regex (specials escaped, ``*`` → ``.*``), so the match predicate
is engine-portable and the DuckDB driver oracle replays it with
``regexp_matches``. Empty ``Allow:`` / ``Disallow:`` values are no-op
rules (dropped). The most-specific match is the longest PATTERN (octet
length, §2.2.2); among equal lengths ``Allow`` wins; a residual tie on
(len, verdict) is broken by the lexicographically greatest pattern so the
winner is deterministic on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: regex metacharacters escaped when compiling a robots path pattern
#: (``*`` is excluded — it is the robots wildcard, handled separately;
#: the set is the Java∩RE2 common subset used repo-wide)
_META = r"([.^$+?(){}\[\]|\\])"


def compile_pattern(pat: F.Column) -> F.Column:
    """Robots path pattern → anchored Java∩RE2 regex (see module doc)."""
    anchored = pat.endswith("$")
    core = F.when(anchored, F.substring(pat, F.lit(1), F.length(pat) - 1)).otherwise(pat)
    esc = F.regexp_replace(core, _META, r"\\$1")
    wild = F.regexp_replace(esc, r"\*", ".*")
    return F.concat(F.lit("^"), wild, F.when(anchored, F.lit("$")).otherwise(F.lit("")))


def parse_robots(
    robots: DataFrame, host_col: str = "host", text_col: str = "robots_txt"
) -> DataFrame:
    """``(host, robots_txt)`` → rule rows
    ``(host, agent, allow, pattern, pat_len, pat_regex)``.

    One shuffle (window partition on ``host``); every expression is JVM
    codegen'd. Lines that are comments, blank, or unknown fields are
    dropped; ``Sitemap:`` and friends are out of scope here (see
    ``sitemap.py``)."""
    host, txt = F.col(host_col), F.col(text_col)
    lines = robots.select(
        host.alias("host"),
        F.posexplode(F.split(txt, "\n")).alias("pos", "raw"),
    )
    # strip comment + surrounding whitespace; classify field:value
    ln = lines.withColumn("line", F.trim(F.regexp_replace("raw", r"#.*$", "")))
    ln = ln.select(
        "host",
        "pos",
        F.lower(F.regexp_extract("line", r"^([A-Za-z-]+)\s*:", 1)).alias("field"),
        F.trim(F.regexp_extract("line", r"^[A-Za-z-]+\s*:\s*(\S*)", 1)).alias("value"),
    ).where(F.col("field").isin("user-agent", "allow", "disallow"))

    w = Window.partitionBy("host").orderBy("pos")
    is_ua = F.col("field") == "user-agent"
    # a group starts at a user-agent line NOT preceded (among kept lines)
    # by another user-agent line (RFC 9309 §2.2.1: consecutive UA lines
    # share one group)
    ln = ln.withColumn(
        "grp",
        F.sum(
            F.when(is_ua & ~F.coalesce(F.lag(is_ua).over(w), F.lit(False)), 1)
            .otherwise(0)
        ).over(w),
    )
    agents = (
        ln.where(is_ua)
        .select("host", "grp", F.lower(F.col("value")).alias("agent"))
        .distinct()
    )
    rules = ln.where(~is_ua & (F.col("value") != "")).select(
        "host",
        "grp",
        (F.col("field") == "allow").alias("allow"),
        F.col("value").alias("pattern"),
    )
    out = rules.join(agents, ["host", "grp"]).select(
        "host",
        "agent",
        "allow",
        "pattern",
        F.length("pattern").alias("pat_len"),
        compile_pattern(F.col("pattern")).alias("pat_regex"),
    )
    return out


def select_agent_rules(rules: DataFrame, agent: str) -> DataFrame:
    """RFC 9309 §2.2.1 group choice: if ANY group on a host names our
    product token, ALL such groups' rules apply (matching groups combine);
    otherwise the ``*`` groups apply. Window over ``host`` — co-partitioned
    with ``parse_robots``'s output, so AQE usually elides the exchange."""
    ours = F.col("agent") == agent.lower()
    star = F.col("agent") == "*"
    cand = rules.where(ours | star)
    w = Window.partitionBy("host")
    cand = cand.withColumn("__has_exact", F.max(ours).over(w))
    return cand.where(ours | ~F.col("__has_exact")).drop("__has_exact")


def robots_filter(
    urls: DataFrame,
    rules: DataFrame,
    agent: str,
    host_col: str = "host",
    path_col: str = "path",
) -> DataFrame:
    """Per-URL crawl verdict ``(…, allowed, matched_rule)``.

    ``rules`` is ``parse_robots`` output (full table — agent selection
    happens here). Plan: rule-side agent selection (tiny window) → LEFT
    join on ``host`` (the one data shuffle; a host with no robots.txt or
    no applicable rules stays allowed) → ``regexp_like`` match →
    ``max(struct(pat_len, allow, pattern))`` groupBy with map-side partial
    aggregation applying longest-match / allow-tie / lexicographic-tie
    precedence. No match anywhere → ``allowed = true`` (RFC 9309 §2.2.2)."""
    sel = select_agent_rules(rules, agent).select(
        F.col("host").alias("__r_host"), "allow", "pattern", "pat_len", "pat_regex"
    )
    joined = urls.join(
        sel, urls[host_col] == sel["__r_host"], "left"
    ).withColumn(
        "__m",
        F.when(
            F.col("pat_regex").isNotNull()
            & F.expr(f"regexp_like({path_col}, pat_regex)"),
            F.struct(
                F.col("pat_len").alias("l"),
                F.col("allow").alias("a"),
                F.col("pattern").alias("p"),
            ),
        ),
    )
    keys = [c for c in urls.columns]
    agg = joined.groupBy(*keys).agg(F.max("__m").alias("__w"))
    return agg.select(
        *keys,
        F.coalesce(F.col("__w.a"), F.lit(True)).alias("allowed"),
        F.coalesce(F.col("__w.p"), F.lit("")).alias("matched_rule"),
    )
