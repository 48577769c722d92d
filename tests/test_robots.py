"""RFC 9309 robots.txt parse + filter (sources/robots.py)."""

import pytest
from pyspark.sql import functions as F

from autoextract.sources.robots import (
    compile_pattern,
    parse_robots,
    robots_filter,
    select_agent_rules,
)

TXT_A = """# policy comment
User-agent: TrainBot
Disallow: /private/
Allow: /private/ok

User-agent: *
Disallow: /tmp/*
Allow: /tmp/keep*
Disallow: /exact$
Disallow:

User-agent: otherbot
User-agent: trainbot
Disallow: /multi
"""

TXT_B = """User-agent: *
Disallow: /cgi-bin/*.php$
Allow: /
"""


@pytest.fixture(scope="module")
def rules(spark):
    robots = spark.createDataFrame(
        [("a.com", TXT_A), ("b.com", TXT_B)], "host string, robots_txt string"
    )
    return parse_robots(robots).cache()


def test_group_structure(rules):
    rows = {
        (r.host, r.agent, r.pattern): r.allow for r in rules.collect()
    }
    # trainbot owns its own group's rules AND the multi-UA group's rule
    assert rows[("a.com", "trainbot", "/private/")] is False
    assert rows[("a.com", "trainbot", "/private/ok")] is True
    assert rows[("a.com", "trainbot", "/multi")] is False
    # the same multi-UA group also binds otherbot
    assert rows[("a.com", "otherbot", "/multi")] is False
    # empty Disallow is a no-op rule: dropped
    assert not any(p == "" for (_, _, p) in rows)
    # agent tokens are lowercased
    assert not any(a != a.lower() for (_, a, _) in rows)


def test_pattern_compilation(rules):
    regexes = {
        r.pattern: r.pat_regex for r in rules.where(F.col("host") == "b.com").collect()
    }
    # '.' escaped, '*' -> '.*', trailing '$' is an anchor (not escaped)
    assert regexes["/cgi-bin/*.php$"] == r"^/cgi-bin/.*\.php$"
    assert regexes["/"] == "^/"


def test_agent_selection_combines_matching_groups(rules, spark):
    sel = select_agent_rules(rules, "TrainBot")
    a = {r.pattern for r in sel.where(F.col("host") == "a.com").collect()}
    # exact-agent groups only — the '*' group is suppressed on a.com
    assert a == {"/private/", "/private/ok", "/multi"}
    b = {r.pattern for r in sel.where(F.col("host") == "b.com").collect()}
    # no trainbot group on b.com -> '*' applies
    assert b == {"/cgi-bin/*.php$", "/"}


def test_filter_precedence(rules, spark):
    urls = spark.createDataFrame(
        [
            (1, "a.com", "/private/x"),       # trainbot Disallow
            (2, "a.com", "/private/ok-page"), # longer Allow wins
            (3, "a.com", "/tmp/junk"),        # '*' group suppressed -> allowed
            (4, "a.com", "/multi/page"),      # multi-UA group Disallow
            (5, "b.com", "/cgi-bin/run.php"), # $ anchor hits
            (6, "b.com", "/cgi-bin/run.php3"),# $ anchor misses -> Allow: /
            (7, "c.com", "/anything"),        # no robots.txt -> allowed
        ],
        "doc_id long, host string, path string",
    )
    out = {
        r.doc_id: (r.allowed, r.matched_rule)
        for r in robots_filter(urls, rules, "trainbot").collect()
    }
    assert out[1] == (False, "/private/")
    assert out[2] == (True, "/private/ok")
    assert out[3] == (True, "")
    assert out[4] == (False, "/multi")
    assert out[5] == (False, "/cgi-bin/*.php$")
    assert out[6] == (True, "/")
    assert out[7] == (True, "")


def test_dollar_anchor_semantics(spark):
    robots = spark.createDataFrame(
        [("h", "User-agent: *\nDisallow: /exact$\n")],
        "host string, robots_txt string",
    )
    rules = parse_robots(robots)
    urls = spark.createDataFrame(
        [(1, "h", "/exact"), (2, "h", "/exactish")],
        "doc_id long, host string, path string",
    )
    out = {r.doc_id: r.allowed for r in robots_filter(urls, rules, "x").collect()}
    assert out == {1: False, 2: True}


def test_partition_invariance(rules, spark):
    urls = spark.createDataFrame(
        [(i, "a.com" if i % 2 else "b.com", f"/tmp/p{i}") for i in range(40)],
        "doc_id long, host string, path string",
    )
    one = robots_filter(urls.coalesce(1), rules, "trainbot").collect()
    many = robots_filter(urls.repartition(8), rules, "trainbot").collect()
    key = lambda r: r.doc_id
    assert sorted(one, key=key) == sorted(many, key=key)
