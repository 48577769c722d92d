"""Stack Exchange dump ingestion (sources/sedump.py)."""

from __future__ import annotations

import datetime as dt

from autoextract.sources.sedump import parse_se_posts


def test_rows_parse_and_junk_lines_vanish(spark):
    lines = [
        '<?xml version="1.0" encoding="utf-8"?>',
        "<posts>",
        '  <row Id="7" PostTypeId="1" '
        'CreationDate="2023-04-05T08:30:09.000" Score="-3" '
        'Title="Q &amp; A &lt;fast&gt;" '
        'Body="&lt;p&gt;Body 7 &amp; more&lt;/p&gt;" '
        'Tags="&lt;python&gt;&lt;regex&gt;" OwnerUserId="21" />',
        '  <row PostTypeId="2" Id="8" '
        'CreationDate="2023-04-05T09:00:00.500" Score="12" '
        'Body="&lt;p&gt;answer&lt;/p&gt;" OwnerUserId="9" />',
        "</posts>",
    ]
    df = spark.createDataFrame([(x,) for x in lines], "line string")
    got = {r["post_id"]: r for r in parse_se_posts(df).collect()}
    assert set(got) == {7, 8}
    q = got[7]
    assert q["post_type"] == 1 and q["score"] == -3
    assert q["title"] == "Q & A <fast>"
    assert q["body"] == "<p>Body 7 & more</p>"
    assert q["tags_csv"] == "python,regex"
    assert q["owner_user_id"] == 21
    assert q["creation_ts"] == dt.datetime(2023, 4, 5, 8, 30, 9)
    # answers: attribute order differs (Id after PostTypeId) and no
    # Title/Tags — the anchored patterns must still bind correctly
    a = got[8]
    assert a["post_type"] == 2 and a["post_id"] == 8
    assert a["title"] is None and a["tags_csv"] is None
    assert a["creation_ts"] == dt.datetime(2023, 4, 5, 9, 0, 0, 500000)


def test_id_never_matches_inside_longer_names(spark):
    # a row with OwnerUserId BEFORE Id: the space-anchored pattern must
    # pick the real Id, not the suffix of OwnerUserId
    line = ('<row OwnerUserId="555" PostTypeId="2" Id="3" '
            'CreationDate="2020-01-01T00:00:00.000" Score="1" '
            'Body="x" />')
    df = spark.createDataFrame([(line,)], "line string")
    r = parse_se_posts(df).collect()[0]
    assert r["post_id"] == 3 and r["owner_user_id"] == 555
