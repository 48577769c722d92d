"""Markdown ingestion (sources/markdown.py)."""

from __future__ import annotations

from autoextract.sources.markdown import (
    build_markdown,
    markdown_spans,
    parse_markdown,
)


def _kinds(spans):
    return [(s["seq"], s["kind"]) for s in spans]


def test_block_vocabulary_order_and_escapes():
    src = build_markdown([
        ("heading", 1, "Guide & notes"),
        ("rawtext", "Intro **bold** see [spec](https://x/1) and `a_b` now."),
        ("code", "py", "def f():\n    return 1"),
        ("image", "i.png", "Fig 1"),
        ("table", [["k", "v"], ["a", "1"]]),
        ("setext", 2, "Results"),
        ("list", ["one", "two"]),
        ("quote", "Said so."),
        ("text", "Closing *literal* stars."),
    ])
    spans = parse_markdown(src)
    assert _kinds(spans) == [
        (0, "heading"), (1, "text"), (2, "code"), (3, "image"),
        (4, "table"), (5, "heading"), (6, "list"), (7, "quote"),
        (8, "text")]
    assert spans[0]["text"] == "Guide & notes" and spans[0]["level"] == 1
    # links → anchor text, emphasis unwrapped, code-span underscores kept
    assert spans[1]["text"] == "Intro bold see spec and a_b now."
    assert spans[2]["text"] == "def f():\n    return 1"
    assert spans[2]["media_ref"] == "py"
    assert spans[3]["media_ref"] == "i.png" and spans[3]["text"] == "Fig 1"
    assert spans[4]["text"] == "k | v\na | 1"
    assert spans[5]["level"] == 2
    assert spans[6]["text"] == "one\ntwo"
    assert spans[7]["text"] == "Said so."
    # builder escaped the literal stars → they survive cleanup
    assert spans[8]["text"] == "Closing *literal* stars."


def test_setext_vs_thematic_break():
    # --- under a paragraph line = h2; --- after a blank = dropped break
    spans = parse_markdown(b"Title\n---\n\nbody\n\n---\n\ntail\n")
    assert _kinds(spans) == [(0, "heading"), (1, "text"), (2, "text")]
    assert spans[0]["level"] == 2 and spans[0]["text"] == "Title"
    assert [s["text"] for s in spans[1:]] == ["body", "tail"]
    # === underline gives level 1
    one = parse_markdown(b"Top\n====\n")
    assert one[0]["kind"] == "heading" and one[0]["level"] == 1


def test_fence_closing_rules():
    # closing fence must match char and be at least as long; inner ```
    # shorter runs and ~~~ stay inside the block
    src = b"````md\ninner ``` tick\n~~~\nstill code\n````\nafter\n"
    spans = parse_markdown(src)
    assert spans[0]["kind"] == "code"
    assert spans[0]["text"] == "inner ``` tick\n~~~\nstill code"
    assert spans[0]["media_ref"] == "md"
    assert spans[1]["kind"] == "text" and spans[1]["text"] == "after"
    # unterminated fence: rest of document is the code body
    tail = parse_markdown(b"```\nabc\ndef\n")
    assert tail[0]["kind"] == "code" and tail[0]["text"] == "abc\ndef"
    # empty info string → NULL media_ref
    assert parse_markdown(b"```\nx\n```\n")[0]["media_ref"] is None


def test_inline_cleanup_rules():
    spans = parse_markdown(
        b"![icon](u.png) starts, <https://auto.link> and "
        b"***deep nest*** plus `**not bold**` end.\n")
    assert spans[0]["text"] == (
        "icon starts, https://auto.link and deep nest "
        "plus **not bold** end.")
    # soft line breaks join with a single space
    assert parse_markdown(b"a\nb\nc\n")[0]["text"] == "a b c"
    # entity order: &amp;lt; must become &lt; (amp last), not <
    assert parse_markdown(b"x &amp;lt; y\n")[0]["text"] == "x &lt; y"


def test_quote_depth_and_list_markers():
    q = parse_markdown(b"> outer\n> > nested\n")
    assert q[0]["kind"] == "quote" and q[0]["text"] == "outer > nested"
    li = parse_markdown(b"- a\n* b\n+ c\n1. d\n2) e\n")
    assert li[0]["kind"] == "list"
    assert li[0]["text"] == "a\nb\nc\nd\ne"


def test_table_needs_delimiter_row():
    # a pipe line without the |---| row below is just paragraph text
    spans = parse_markdown(b"a | b\nplain\n")
    assert [s["kind"] for s in spans] == ["text"]
    spans = parse_markdown(b"| h1 | h2 |\n|---|:--:|\n| x | y |\n")
    assert spans[0]["kind"] == "table"
    assert spans[0]["text"] == "h1 | h2\nx | y"


def test_containment_and_kernel(spark):
    df = spark.createDataFrame(
        [(1, build_markdown([("text", "hello")])),
         (2, b"\xff\xfe\x00md"),          # not UTF-8 → zero spans
         (3, b"   \n\n  "),               # whitespace-only → zero spans
         (4, None)],
        "doc_id long, payload binary",
    )
    got = markdown_spans(df).collect()
    assert [(r["doc_id"], r["kind"], r["text"]) for r in got] == [
        ("1", "text", "hello")]


def test_front_matter_scalar_inline_block_and_absent():
    from autoextract.sources.markdown import parse_front_matter

    fm = parse_front_matter(
        b'---\ntitle: "My Post"\ndate: 2024-03-01\ndraft: true\n'
        b"tags: [ml, \"data eng\"]\nauthor: someone\n---\n\n# Body\n")
    assert fm == {"title": "My Post", "date": "2024-03-01", "draft": True,
                  "tags_csv": "ml,data eng", "n_meta": 5,
                  "body_first_line": "# Body"}
    blk = parse_front_matter(
        b"---\ntitle: Block\ntags:\n  - one\n  - two\n---\nbody\n")
    assert blk["tags_csv"] == "one,two" and blk["n_meta"] == 2
    # no front matter → NULL fields, real first line
    plain = parse_front_matter(b"plain doc\nrest")
    assert plain["n_meta"] == 0 and plain["body_first_line"] == "plain doc"
    # unterminated fence is NOT front matter
    unterm = parse_front_matter(b"---\nkey: v\nno close")
    assert unterm["n_meta"] == 0 and unterm["body_first_line"] == "---"


def test_front_matter_kernel(spark):
    from autoextract.sources.markdown import front_matter

    df = spark.createDataFrame(
        [(1, b"---\ntitle: T\n---\nbody"), (2, b"\xff\xfe"), (3, None)],
        "doc_id long, payload binary",
    )
    got = {r["doc_id"]: r for r in front_matter(df).collect()}
    assert got["1"]["title"] == "T" and got["1"]["n_meta"] == 1
    assert got["2"]["body_first_line"] is None
    assert got["3"]["n_meta"] == 0
