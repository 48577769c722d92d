"""Generate PLANS.md: formatted physical plans for representative queries,
with the scale-relevant facts extracted (exchange count, pushed filters,
read schema width, whole-stage-codegen coverage).

The per-operator plan *assertions* live in tests/test_plans.py (they fail
the suite when a shape regresses); this tool renders the current plans into
a reviewable artifact: ``python tools/plan_audit.py [--sf DIR] [--out PLANS.md]``.
"""

from __future__ import annotations

import argparse
import io
import os
import re
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

#: query name → one-line note on what the plan should show (the claim the
#: extracted facts let a reviewer check)
AUDITED = {
    "tpch_q1": "single scan → partial agg → one exchange → final agg; "
    "shipdate filter and column pruning pushed to the parquet scan",
    "dim_broadcast_join": "nation broadcast (no shuffle for the dim side); "
    "one exchange for the fact-side aggregation",
    "pending_anti_join": "broadcast anti-join — no shuffle of the big side",
    "minhash_band_buckets": "two partial-agg exchanges on short keys (the "
    "per-doc signature agg, then the band-bucket agg after a constant-factor "
    "explode) — raw shingles never shuffle",
    "winnowing_fingerprints": "pure JVM expression pipeline — zero Python, "
    "zero joins, one distinct exchange",
    "repetition_metrics": "partial-agg shuffles on (doc_id, gram/tok) short "
    "keys for the gram and token statistics, then a broadcast join of the "
    "two per-doc stat tables; raw text never shuffles",
    "pii_redaction": "pure codegen'd regexp projection over one scan — "
    "no exchange at all",
    "batch_ann_knn": "probe-explode (constant factor) → shuffle on the "
    "short bucket key → window top-k; vector norms computed before the join",
    "asof_join": "union-window composition: NO join node at all — one "
    "exchange on the key for the running last() carry window, plus one for "
    "the optional right_id equal-ts dedup window",
    "interval_count_join": "linear surrogate-id plan: bucket-explode → one "
    "join on (key, bucket) → partial-agg on the one-long __iid key; the "
    "interval payload rides as a struct, never as a join key; no rejoin "
    "of the intervals table",
    # r5: the scale-path variants the 100 TB run would take
    "asof_join_chunked": "time-chunked hot-key variant: same union-window "
    "shape but partitioned on (key, bucket) so a mega-key splits across "
    "tasks; still no join node, bounded extra exchange for the carry",
    "embedding_neardup_blas": "LSH-bucket explode → shuffle on short band "
    "keys → ONE python stage doing a Gram matmul per block; raw vectors "
    "shuffle once, pairs never materialize outside blocks",
    "pdf_encrypted_ingest": "byte-payload render + parse as two python "
    "stages around the single spans exchange; decryption is per-row work "
    "inside the kernel, invisible to the shuffle plan",
    "source_quota_sample": "tiny per-source count agg broadcast back onto "
    "a single filter pass — document rows never shuffle; the md5 threshold "
    "is a codegen'd projection",
    "shard_assignment": "map-side hash shard id → one exchange on the "
    "shard key → per-shard window rank (matches the physical "
    "repartition+sortWithinPartitions write); no global sort",
    "exact_substring_dedup": "gram explode (constant ×n_tokens factor) → "
    "ONE window exchange on the 32-byte md5 gram key (raw text never "
    "shuffles) → per-doc collect+interval-merge agg → left join back; "
    "excision is a codegen'd filter HOF, no python stage",
    "temperature_mixture_sample": "per-source count agg + Σn^α scalar both "
    "broadcast onto a single filter pass — document rows never shuffle; "
    "the threshold chain is a codegen'd projection",
    "unigram_quality": "token explode → partial-agg exchange on the token "
    "key (vocab-sized result) → join back + per-doc partial agg; both "
    "shuffles carry short keys, raw text stays in the scan stage",
    "bm25_topk": "ONE corpus explode (single Generate): tf partial-agg + "
    "dl window are the only corpus-sized exchanges; query set, df (window "
    "count over the query-term-pruned slice) and scalars ride tiny/"
    "broadcast exchanges; (query_id, doc_id) agg fuses onto the doc_id "
    "partitioning; per-query window top-k — no python stages, raw text "
    "never shuffles",
    "url_domain_filter": "one codegen'd regexp projection + broadcast "
    "left join against the blocklist — zero non-broadcast exchanges, "
    "document rows never shuffle",
    # r5 late adds: crawl front door + curation caps + graph prior
    "warc_ingest": "two python stages (segment render is fixture-only; "
    "record parse + HTTP unwrap is the production one) around a single "
    "per-doc partial agg — segments parse independently, the stage is "
    "narrow until the one rollup exchange",
    "warc_html_ingest": "the full crawl entry chain as narrow python "
    "stages (WARC parse → HTTP unwrap → boilerplate strip) feeding one "
    "per-doc agg exchange — body bytes never shuffle raw",
    "host_cap_topk": "two-phase skew-safe top-K: WindowGroupLimit "
    "map-side partial top-K before BOTH window exchanges, so at most "
    "cap rows per (host, salt) per mapper ever shuffle; no python stages",
    "page_furniture": "lines partial-agg on (doc,page,block,line) + census "
    "aggregates on 8-byte xxhash64 keys joined back (n_pages broadcast); "
    "raw line text never a shuffle key",
    "hyphenation_repair": "one window exchange on (doc_id, page) feeding "
    "lag/lead — the whole merge rule is codegen'd regex, zero Python",
    "dedup_incremental_bloom": "k BROADCAST probes of the materialized "
    "bloom word table — the fingerprint side is pruned map-side with zero "
    "exchanges of its own before the exact anti-join",
    "table_structure": "one grouping exchange on (doc, page, table) into "
    "the per-table NumPy kernel; tables parallelize on the group key",
    "crawl_frontier": "robots rule join + rank join on the short host key, "
    "then the skew-safe cap window; no exchange beyond the audited "
    "component plans",
    "script_profile": "one codegen'd regexp_count projection — zero "
    "exchanges, zero Python",
    "text_scrub": "one codegen'd regexp chain — zero exchanges, zero Python",
    "html_metadata": "one codegen'd regexp projection over the page string "
    "— zero exchanges, zero Python",
    "sentence_split": "protect/mark/restore chain + posexplode in one "
    "projection — zero exchanges, zero Python",
    "filter_report": "verdict projection (codegen'd) joined back on the "
    "id key, ONE (source × keep × reason) cell aggregate then a tiny "
    "second aggregate with a min_by argmax — single verdict-chain "
    "evaluation, no window, no outer join; raw text never shuffles",
    "pagerank": "per-round: edges⋈ranks shuffle on src + partial-agg on "
    "dst, both over (long,long,double) rows; dangling mass is a 1-row "
    "broadcast; localCheckpoint truncates lineage between rounds — so "
    "the settled plan shown here is just the final round's checkpointed "
    "scan (rounds execute eagerly during construction)",
    "heavy_hitters": "the vocabulary never shuffles: ONE bounded "
    "depth×width sketch exchange (posexplode is a constant ×d factor), "
    "d broadcast probes of the materialized sketch + a 1-row total "
    "broadcast for the relative threshold, then a candidate-only exact "
    "count — the sole token-keyed exchange carries the sketch-pruned "
    "slice",
    "zorder_layout": "1-row global min/max agg broadcast back "
    "(BroadcastNestedLoopJoin against one row — document rows never "
    "shuffle for the bounds); the Morton key is a codegen'd shift/mask "
    "chain; the report rollup is the only real exchange. The re-layout "
    "variant (zorder_layout fn) adds exactly the one range exchange the "
    "re-layout IS.",
    "blocklist_terms": "narrow token explode carrying only (doc_id, term) "
    "→ BROADCAST hash join against the term list (the big side never "
    "shuffles for the match) → per-doc partial agg over matched rows only; "
    "the final left join back rides the short doc_id key",
    "license_detect": "one codegen'd regexp/contains projection over the "
    "scan — zero exchanges, zero Python",
    "extraction_cer": "built-in levenshtein in one codegen'd projection — "
    "zero exchanges, zero Python",
    "charset_detect": "two chained narrow Arrow stages (payload render + "
    "detect/decode) — zero exchanges; detection is per-row byte rules",
    "mp4_metadata": "narrow Arrow stage over the binary column — zero "
    "exchanges; the box walk reads headers only",
}


def split_sections(plan: str) -> tuple[str, str]:
    """Executed-AQE formatted explain → (settled node tree, detail blocks).
    Layout: ``== Final Plan ==`` tree, then ``== Initial Plan ==`` (the
    pre-AQE tree, dropped — it would double every count), then the per-node
    detail blocks (PushedFilters / ReadSchema / codegen ids)."""
    if "== Final Plan ==" in plan:
        after_final = plan.split("== Final Plan ==", 1)[1]
        tree, rest = after_final.split("== Initial Plan ==", 1)
        details = rest.split("\n\n", 1)[1] if "\n\n" in rest else ""
        return tree, details
    parts = plan.split("\n\n", 1)
    return parts[0], parts[1] if len(parts) > 1 else ""


def facts(tree: str, details: str) -> dict:
    """The scale facts: exchange / python-stage counts from the settled
    tree; codegen spans, pushdown, and pruned read schemas from the detail
    blocks (initial-plan-only nodes carry no codegen ids, so the distinct
    id count reflects the executed plan)."""
    return {
        "exchanges": len(re.findall(r"\bExchange \(\d+\)", tree)),
        "broadcast_exchanges": len(re.findall(r"BroadcastExchange \(\d+\)", tree)),
        "wholestage_spans": len(set(re.findall(r"\[codegen id : (\d+)\]", details))),
        "python_stages": len(
            re.findall(
                r"(?:MapInPandas|MapInArrow|ArrowEvalPython|"
                r"FlatMapGroupsInPandas|PythonMapInArrow) \(\d+\)",
                tree,
            )
        ),
        "pushed_filters": [
            f for f in re.findall(r"PushedFilters: \[([^\]]*)\]", details) if f
        ],
        "read_schemas": [
            s[:120] for s in re.findall(r"ReadSchema: struct<([^>]*)>", details)
        ],
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=os.path.join(REPO, "PLANS.md"))
    args = ap.parse_args()

    import __spark_entry__ as E
    from autoextract.session import get_spark

    spark = get_spark(app_name="plan-audit", parallelism=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()

    sections = []
    for name, note in AUDITED.items():
        df = qs[name](spark, args.sf)
        df.collect()  # finalize THIS QueryExecution: AQE settles the plan
        # and codegen ids are assigned (a bare explain shows the pre-AQE
        # tree without codegen annotations below exchanges)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        tree, details = split_sections(buf.getvalue())
        f = facts(tree, details)
        head = [
            f"## {name}",
            "",
            f"**Claim:** {note}",
            "",
            f"- exchanges: {f['exchanges']} (+{f['broadcast_exchanges']} broadcast)",
            f"- whole-stage-codegen spans: {f['wholestage_spans']}; "
            f"python stages: {f['python_stages']}",
        ]
        if f["pushed_filters"]:
            head.append(f"- pushed filters: {f['pushed_filters']}")
        if f["read_schemas"]:
            head.append(f"- read schemas (pruned): {f['read_schemas']}")
        # keep the plan section compact: settled node tree, not the detail dump
        sections.append(
            "\n".join(head) + "\n\n```\n== Final Plan ==\n"
            + tree.strip() + "\n```\n"
        )

    body = (
        "# PLANS — physical-plan audit of representative queries\n\n"
        "Generated by `python tools/plan_audit.py` at "
        f"`{args.sf}` (plan SHAPES are scale-invariant; assertions that fail "
        "the suite on regression live in `tests/test_plans.py`). For every "
        "query: the scale claim, the extracted facts (exchange/codegen/"
        "python-stage counts, pushdown, pruned read schemas), and the "
        "operator tree.\n\n" + "\n".join(sections)
    )
    with open(args.out, "w") as fh:
        fh.write(body)
    print(f"wrote {args.out} ({len(sections)} queries)")
    spark.stop()


if __name__ == "__main__":
    main()
