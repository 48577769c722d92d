"""MP4/ISO-BMFF metadata walk (`sources/mp4.py`) — the video leg of the
multimodal curation surface: box framing (32-bit, largesize, nested),
mvhd v0/v1 duration math, tkhd 16.16 dimensions, hdlr track inventory,
and the O6 containment contract."""

from __future__ import annotations

import pytest

from autoextract.operators.multimodal import sniff_format
from autoextract.sources.mp4 import (
    Mp4Error,
    mp4_meta_table,
    parse_mp4_meta,
    to_mp4,
)


def test_v0_roundtrip():
    b = to_mp4("isom", 600, 1500, [("vide", 640, 360), ("soun", 0, 0)])
    m = parse_mp4_meta(b)
    assert m["major_brand"] == "isom"
    assert m["duration_ms"] == 2500
    assert m["n_tracks"] == 2
    assert (m["video_width"], m["video_height"]) == (640, 360)
    assert m["handlers"] == "vide,soun"


def test_v1_largesize_roundtrip():
    b = to_mp4(
        "mp42", 1200, 3605, [("soun", 0, 0), ("vide", 1920, 1080)],
        mvhd_version=1, moov_largesize=True,
    )
    m = parse_mp4_meta(b)
    assert m["major_brand"] == "mp42"
    assert m["duration_ms"] == 3605 * 1000 // 1200
    assert m["handlers"] == "soun,vide"
    assert (m["video_width"], m["video_height"]) == (1920, 1080)


def test_audio_only_has_null_dims():
    m = parse_mp4_meta(to_mp4("isom", 600, 600, [("soun", 0, 0)]))
    assert m["video_width"] is None and m["video_height"] is None
    assert m["n_tracks"] == 1


def test_malformed_raises():
    good = to_mp4()
    for bad in (b"", b"free", good[:40], b"\x00" * 64,
                good.replace(b"moov", b"niet", 1)):
        with pytest.raises(Mp4Error):
            parse_mp4_meta(bad)


def test_zero_timescale_raises():
    import struct
    b = to_mp4("isom", 600, 600)
    # patch the mvhd timescale field to 0
    i = b.index(b"mvhd") + 4 + 4 + 8
    bad = b[:i] + struct.pack(">I", 0) + b[i + 4:]
    with pytest.raises(Mp4Error):
        parse_mp4_meta(bad)


def test_sniffer_names_mp4():
    assert sniff_format(to_mp4()) == "mp4"
    assert sniff_format(b"\x00\x00\x00\x08fty") == "unknown"  # <12 bytes


def test_table_kernel_containment(spark):
    rows = [
        (0, to_mp4("isom", 600, 600, [("vide", 320, 240)])),
        (1, b"garbage not a container"),
        (2, None),
        (3, to_mp4("avc1", 2400, 7200, [("soun", 0, 0)], mvhd_version=1)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r.asDict() for r in mp4_meta_table(df).collect()}
    assert out[0]["valid"] and out[0]["video_width"] == 320
    assert not out[1]["valid"] and out[1]["major_brand"] is None
    assert not out[2]["valid"]
    assert out[3]["valid"] and out[3]["duration_ms"] == 3000
    assert out[3]["handlers"] == "soun"
