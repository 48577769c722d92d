"""MP3 frame-header walk (operators/mp3.py)."""

from __future__ import annotations

from autoextract.operators.id3 import build_id3
from autoextract.operators.mp3 import build_mp3, mp3_meta, parse_mp3_meta


def test_cbr_walk():
    m = parse_mp3_meta(build_mp3(10))
    assert m == {"version": "1", "layer": 3, "sample_rate": 44100,
                 "channels": 2, "bitrate_kbps": 128, "n_frames": 10,
                 "duration_ms": 10 * 1152 * 1000 // 44100,
                 "vbr": False, "valid": True}


def test_vbr_mean_and_flag():
    m = parse_mp3_meta(build_mp3(9, vbr_alternate=192))
    # frames 1,3,5,7 at 192; 0,2,4,6,8 at 128 → mean = (5*128+4*192)//9
    assert m["vbr"] is True
    assert m["bitrate_kbps"] == (5 * 128 + 4 * 192) // 9
    assert m["n_frames"] == 9


def test_xing_declared_frames_win():
    m = parse_mp3_meta(build_mp3(3, xing=500))
    assert m["n_frames"] == 500 and m["vbr"] is True
    assert m["duration_ms"] == 500 * 1152 * 1000 // 44100


def test_mpeg2_mono_and_id3_skip():
    m = parse_mp3_meta(build_mp3(6, version="2", bitrate=64, channels=1,
                                 id3=build_id3(title="t")))
    assert (m["version"], m["sample_rate"], m["channels"]) == (
        "2", 22050, 1)
    # MPEG-2 layer III: 576 samples per frame
    assert m["duration_ms"] == 6 * 576 * 1000 // 22050


def test_containment_and_truncation(spark):
    full = build_mp3(10)
    df = spark.createDataFrame(
        [(1, full), (2, b"no sync anywhere here...."), (3, None),
         (4, full[:len(full) // 2])],
        "doc_id long, payload binary",
    )
    got = {r["doc_id"]: r for r in mp3_meta(df).collect()}
    assert got["1"]["n_frames"] == 10 and got["1"]["valid"]
    assert got["2"]["valid"] is False and got["2"]["n_frames"] is None
    assert got["3"]["valid"] is False
    # truncation walks the prefix, stays valid
    assert got["4"]["valid"] and got["4"]["n_frames"] == 5
