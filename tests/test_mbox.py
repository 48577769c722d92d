"""MBOX / e-mail ingestion (sources/mbox.py)."""

from __future__ import annotations

from autoextract.sources.mbox import (
    build_mbox,
    decode_encoded_words,
    mbox_messages,
    parse_date,
    parse_mbox,
)


def test_framing_headers_and_mboxrd():
    mb = build_mbox([
        {"from_name": "Ann", "from_addr": "ann@x.com", "subject": "Hello",
         "date": "Mon, 1 Jan 2024 00:00:07 +0000",
         "body": "Plain body.\nFrom here on.\n>From quoted."},
        {"from_addr": "bob@y.org", "subject": "Re", "body": "Second."},
    ])
    msgs = parse_mbox(mb)
    assert [m["msg_idx"] for m in msgs] == [0, 1]
    assert msgs[0]["from_addr"] == "ann@x.com"
    assert msgs[0]["date_ts"] == 1704067207
    assert msgs[0]["message_id"] == "m0@example.com"
    # mboxrd: the builder quoted 'From ' body lines; the parser undoes it
    assert msgs[0]["body"] == "Plain body.\nFrom here on.\n>From quoted."
    assert msgs[1]["body"] == "Second."


def test_date_parser_variants():
    # numeric zone
    assert parse_date("2 Feb 2024 10:30:00 -0500") == 1706887800
    # two-digit year (RFC 5322 obsolete form) + alpha zone
    assert parse_date("Tue, 15 Mar 22 23:59:59 GMT") == 1647388799
    # missing seconds + PST
    assert parse_date("1 Jul 2023 12:00 PST") == 1688241600
    # leap-year day
    assert parse_date("29 Feb 2024 00:00:00 +0000") == 1709164800
    assert parse_date("not a date") is None


def test_encoded_words():
    import base64
    b = base64.b64encode("Ré: topic".encode()).decode()
    assert decode_encoded_words("=?utf-8?B?%s?=" % b) == "Ré: topic"
    # Q form: underscore is space, =hex decodes
    assert decode_encoded_words("=?utf-8?Q?na=C3=AFve_q?=") == "naïve q"
    # adjacent encoded words join WITHOUT the intervening space (§6.2)
    two = "=?utf-8?Q?ab?= =?utf-8?Q?cd?="
    assert decode_encoded_words(two) == "abcd"
    # unknown charset survives as-is rather than raising
    assert decode_encoded_words("=?x-bogus-9?B?////?=") == "=?x-bogus-9?B?////?="


def test_cte_decode_and_multipart_plain_wins():
    mb = build_mbox([
        {"from_addr": "a@x", "subject": "qp", "cte": "quoted-printable",
         "body": "Café line."},
        {"from_addr": "b@x", "subject": "b64", "cte": "base64",
         "body": "Base — ok."},
        {"from_addr": "c@x", "subject": "multi", "body": "Plain wins.",
         "html": "<b>html loses</b>"},
    ])
    msgs = parse_mbox(mb)
    assert msgs[0]["body"] == "Café line."
    assert msgs[1]["body"] == "Base — ok."
    # multipart/alternative lists html FIRST; text/plain must still win
    assert msgs[2]["body"] == "Plain wins."


def test_containment(spark):
    good = build_mbox([{"from_addr": "a@x", "subject": "s", "body": "ok"}])
    # malformed MIME: multipart with a missing boundary param → raw body
    bad_mime = (b"From x\nFrom: z@w\nSubject: t\n"
                b"Content-Type: multipart/mixed\n\nraw stays\n")
    df = spark.createDataFrame(
        [(1, good), (2, b"not a mailbox"), (3, None), (4, bad_mime)],
        "doc_id long, payload binary",
    )
    got = {(r["doc_id"], r["body"]) for r in mbox_messages(df).collect()}
    assert got == {("1", "ok"), ("4", "raw stays")}
