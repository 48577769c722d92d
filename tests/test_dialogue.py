"""Dialogue-turn assembly (functions/text.dialogue_turns)."""

from __future__ import annotations

from autoextract.functions.text import dialogue_turns


def _turns(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(dialogue_turns(df).collect(), key=lambda r: r["turn"])
    return [(r["turn"], r["speaker"], r["utterance"]) for r in rows]


def test_turns_continuations_and_preamble(spark):
    text = ("Preamble is dropped.\n"
            "Alice: Hi there,\nhow are you?\n"
            "Bob Smith: Fine.\n"
            "Alice: Good.\n\n"
            "Alice: Consecutive same-speaker turns stay separate.")
    assert _turns(spark, text) == [
        (0, "Alice", "Hi there, how are you?"),
        (1, "Bob Smith", "Fine."),
        (2, "Alice", "Good."),
        (3, "Alice", "Consecutive same-speaker turns stay separate."),
    ]


def test_no_tags_yields_nothing(spark):
    assert _turns(spark, "just prose\nwith lines\n") == []
    # lowercase openers are not speaker tags
    assert _turns(spark, "note: not a speaker\nmore prose") == []


def test_partition_invariance(spark):
    text = "A: one\ncont\nB: two\nA: three"
    df = spark.createDataFrame(
        [(i, text) for i in range(50)], "doc_id long, text string"
    ).repartition(16)
    got = dialogue_turns(df).collect()
    assert len(got) == 150
    per_doc = {}
    for r in got:
        per_doc.setdefault(r["doc_id"], []).append(
            (r["turn"], r["speaker"], r["utterance"]))
    for v in per_doc.values():
        assert sorted(v) == [(0, "A", "one cont"), (1, "B", "two"),
                             (2, "A", "three")]
