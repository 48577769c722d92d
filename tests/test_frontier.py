"""Crawl-frontier composition (operators/frontier.py)."""

from __future__ import annotations

from autoextract.operators.frontier import build_frontier
from autoextract.sources.robots import parse_robots


def _fixture(spark):
    cands = spark.createDataFrame(
        [("a.com", f"/p/{i}", f"https://a.com/p/{i}", i / 10.0) for i in range(6)]
        + [("a.com", "/private/x", "https://a.com/private/x", 0.9)]
        + [("b.com", "/only", "https://b.com/only", None)],
        "host string, path string, url string, priority double",
    )
    rules = parse_robots(
        spark.createDataFrame(
            [("a.com", "User-agent: *\nDisallow: /private/\n"),
             ("b.com", "User-agent: *\nDisallow:\n")],
            "host string, robots_txt string",
        )
    )
    ranks = spark.createDataFrame([("a.com", 0.8)], "host string, rank double")
    return cands, rules, ranks


def test_frontier_cap_robots_and_defaults(spark):
    cands, rules, ranks = _fixture(spark)
    rows = build_frontier(cands, rules, ranks, "bot", per_host_cap=3).collect()
    by_host = {}
    for r in rows:
        by_host.setdefault(r["host"], []).append(r)
    a = sorted(by_host["a.com"], key=lambda r: r["fetch_rank"])
    # disallowed /private/x never appears despite its 0.9 priority
    assert all("/private/" not in r["url"] for r in a)
    # top-3 of the allowed by score = 0.8 * priority -> p5, p4, p3
    assert [r["url"][-1] for r in a] == ["5", "4", "3"]
    assert abs(a[0]["score"] - 0.8 * 0.5) < 1e-12
    # host with no rank row gets the default_rank, NULL priority the
    # default_priority: score = 0.15 * 0.5
    b = by_host["b.com"]
    assert len(b) == 1 and abs(b[0]["score"] - 0.075) < 1e-12
    assert b[0]["fetch_rank"] == 1


def test_frontier_two_phase_cap_matches_single(spark):
    cands, rules, ranks = _fixture(spark)
    one = sorted(map(tuple, build_frontier(cands, rules, ranks, "bot").collect()))
    two = sorted(map(tuple, build_frontier(
        cands, rules, ranks, "bot", salt_parts=4).collect()))
    assert one == two
