"""SRT / WebVTT ingestion (sources/subtitles.py)."""

from __future__ import annotations

from autoextract.sources.subtitles import (
    build_srt,
    build_vtt,
    parse_subtitles,
    subtitle_cues,
)


def test_srt_cues_multiline_and_renumber():
    srt = build_srt([(1000, 2500, "Hello."), (3000, 4750, "L1\nL2")])
    cues = parse_subtitles(srt)
    # builder writes gapped indices (1, 3); the parser renumbers 0..n
    assert [(c["cue"], c["start_ms"], c["end_ms"]) for c in cues] == [
        (0, 1000, 2500), (1, 3000, 4750)]
    assert cues[1]["text"] == "L1\nL2"


def test_vtt_tags_settings_notes_and_short_form():
    vtt = build_vtt([(61000, 62500, "VTT cue.")], note="meta comment")
    cues = parse_subtitles(vtt)
    # NOTE block skipped, cue id line skipped, settings dropped,
    # <v Speaker> markup stripped
    assert cues == [{"cue": 0, "start_ms": 61000, "end_ms": 62500,
                     "text": "VTT cue."}]
    short = b"WEBVTT\n\n01:02.500 --> 01:05.000\nShort form\n"
    assert parse_subtitles(short)[0]["start_ms"] == 62500


def test_malformed_cues_skipped():
    bad = (b"1\n00:00:01,000 --> 00:00:01,000\nzero length\n\n"
           b"not a timing line\n\n"
           b"2\n00:00:02,000 --> 00:00:03,000\nok\n")
    cues = parse_subtitles(bad)
    assert [(c["start_ms"], c["text"]) for c in cues] == [(2000, "ok")]


def test_kernel_containment(spark):
    df = spark.createDataFrame(
        [(1, build_srt([(0, 900, "x")])), (2, b"no cues"), (3, None)],
        "doc_id long, payload binary",
    )
    got = subtitle_cues(df).collect()
    assert [(r["doc_id"], r["text"]) for r in got] == [("1", "x")]
