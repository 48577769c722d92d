"""EXIF extraction (operators/exif.py): TIFF 6.0 IFD walk over APP1."""

from __future__ import annotations

from autoextract.operators.exif import (
    build_exif_app1,
    exif_metadata,
    parse_exif,
    splice_app1,
)

BASE = b"\xff\xd8\xff\xdb\x00\x04\x00\x00\xff\xda\x00\x02rest"


def test_roundtrip_both_byte_orders():
    for bo in ("II", "MM"):
        j = splice_app1(BASE, build_exif_app1(
            orientation=6, make="Acme", model="Cam 9000 Ultra",
            datetime="2026:01:02 03:04:05",
            datetime_original="2025:12:31 23:59:59", byte_order=bo))
        got = parse_exif(j)
        assert got["orientation"] == 6 and got["make"] == "Acme"
        assert got["model"] == "Cam 9000 Ultra"          # offset ASCII
        assert got["datetime_original"] == "2025:12:31 23:59:59"  # ExifIFD


def test_containment_and_range():
    assert parse_exif(b"junk")["orientation"] is None
    assert parse_exif(BASE)["make"] is None              # no APP1 at all
    bad = splice_app1(BASE, build_exif_app1(orientation=9))
    assert parse_exif(bad)["orientation"] is None        # out of 1..8
    # truncated APP1 must not raise
    trunc = splice_app1(BASE, build_exif_app1(orientation=3))[:14]
    assert parse_exif(trunc)["orientation"] is None


def test_exif_metadata_kernel(spark):
    rows = [
        (1, splice_app1(BASE, build_exif_app1(orientation=3, make="A"))),
        (2, b"not jpeg"),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in exif_metadata(df).collect()}
    assert got[1]["orientation"] == 3 and got[1]["make"] == "A"
    assert got[2]["orientation"] is None
    assert got[3]["orientation"] is None


# ----------------------------------------------------------------------
# ID3v2 (the audio-metadata twin)
# ----------------------------------------------------------------------

def test_id3_roundtrip_versions_and_encodings():
    from autoextract.operators.id3 import build_id3, parse_id3

    for v in (3, 4):
        for e in (0, 1, 3):
            tag = build_id3(title="Söng", artist="Bänd",
                            album="LP", year="2026", version=v, encoding=e)
            got = parse_id3(tag + b"\xff\xfbaudio")
            assert got == {"title": "Söng", "artist": "Bänd",
                           "album": "LP", "year": "2026"}, (v, e)


def test_id3_containment_and_partials(spark):
    from autoextract.operators.id3 import build_id3, id3_metadata, parse_id3

    assert parse_id3(b"\xff\xfbno tag")["title"] is None
    assert parse_id3(build_id3(title="x")[:6])["title"] is None
    df = spark.createDataFrame(
        [(1, build_id3(title="Only Title")), (2, None)],
        "doc_id long, payload binary",
    )
    got = {r["doc_id"]: r for r in id3_metadata(df).collect()}
    assert got[1]["title"] == "Only Title" and got[1]["artist"] is None
    assert got[2]["title"] is None


def test_strip_jpeg_metadata_roundtrip():
    import numpy as np

    from autoextract.operators.exif import (
        build_exif_app1,
        parse_exif,
        splice_app1,
        strip_jpeg_metadata,
    )
    from autoextract.operators.jpeg_codec import decode_jpeg, encode_jpeg

    rng = np.random.RandomState(3)
    j = encode_jpeg(rng.randint(0, 256, (16, 24, 3), dtype=np.uint8), quality=90)
    meta = splice_app1(j, build_exif_app1(orientation=6, make="Cam"))
    com = b"\xff\xfe\x00\x08note42"
    meta = meta[:2] + com + meta[2:]
    out, changed = strip_jpeg_metadata(meta)
    assert changed
    assert all(v is None for v in parse_exif(out).values())
    assert (decode_jpeg(out) == decode_jpeg(meta)).all()
    # idempotent + clean pass-through
    out2, changed2 = strip_jpeg_metadata(out)
    assert out2 == out and not changed2
    assert strip_jpeg_metadata(b"not jpeg") == (b"not jpeg", False)


def test_strip_media_metadata_kernel(spark):
    from autoextract.operators.exif import strip_media_metadata

    df = spark.createDataFrame(
        [("a", b"\xff\xd8\xff\xfe\x00\x04xx\xff\xd9"), ("b", b"junk"), ("c", None)],
        "media_ref string, payload binary",
    )
    out = {r["media_ref"]: r for r in strip_media_metadata(df).collect()}
    assert out["a"]["stripped"] and bytes(out["a"]["payload"]) == b"\xff\xd8\xff\xd9"
    assert not out["b"]["stripped"] and bytes(out["b"]["payload"]) == b"junk"
    assert not out["c"]["stripped"]


def test_strip_keeps_adobe_app14():
    """ADVICE r5: APP14 carries the Adobe color-transform flag — stripping
    it changes pixel interpretation, violating the pixels-untouched
    contract."""
    import struct
    from autoextract.operators.exif import strip_jpeg_metadata

    app14 = b"\xff\xee" + struct.pack(">H", 14) + b"Adobe" + bytes(7)
    app1 = b"\xff\xe1" + struct.pack(">H", 8) + b"Exif\x00\x00"
    sos = b"\xff\xda" + struct.pack(">H", 2) + b"\x00" * 4
    jpeg = b"\xff\xd8" + app1 + app14 + sos
    out, changed = strip_jpeg_metadata(jpeg)
    assert changed
    assert b"\xff\xee" in out  # APP14 kept
    assert b"\xff\xe1" not in out  # EXIF stripped
