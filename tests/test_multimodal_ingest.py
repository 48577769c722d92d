"""Multimodal plumbing + raw ingestion (operators/multimodal, sources/ingest)."""

from __future__ import annotations

from pyspark.sql import functions as F

from autoextract.operators import multimodal as MM
from autoextract.sources import ingest as ING


def test_sniff_format_pure():
    assert MM.sniff_format(ING.make_png(10, 20)) == "png"
    assert MM.sniff_format(ING.make_jpeg(10, 20)) == "jpeg"
    assert MM.sniff_format(ING.make_gif(10, 20)) == "gif"
    assert MM.sniff_format(ING.make_pdf()) == "pdf"
    assert MM.sniff_format(b"<html><body>") == "html"
    assert MM.sniff_format(b"") == "empty"
    assert MM.sniff_format(b"garbage") == "unknown"


def test_header_dims_real_parsers():
    assert MM._png_dims(ING.make_png(123, 456)) == (123, 456)
    assert MM._gif_dims(ING.make_gif(77, 88)) == (77, 88)
    assert MM._jpeg_dims(ING.make_jpeg(640, 480)) == (640, 480)


def test_decode_image_meta(spark):
    media = spark.createDataFrame(
        [
            ("m1", ING.make_png(3000, 1000)),
            ("m2", ING.make_jpeg(100, 150)),
            ("m3", b"not an image"),
        ],
        ["media_ref", "payload"],
    )
    rows = {r["media_ref"]: r for r in MM.decode_image_meta(media).collect()}
    assert rows["m1"]["fmt"] == "png" and rows["m1"]["width"] == 3000 and rows["m1"]["valid"]
    assert rows["m2"]["fmt"] == "jpeg" and rows["m2"]["height"] == 150
    assert rows["m3"]["fmt"] == "unknown" and not rows["m3"]["valid"]


def test_resize_plan_policy(spark):
    """The reference's 1568-long-edge cap (helpers.py:58-104)."""
    media = spark.createDataFrame(
        [("big", ING.make_png(3136, 1568)), ("small", ING.make_png(150, 100))],
        ["media_ref", "payload"],
    )
    plan = {r["media_ref"]: r for r in MM.resize_plan(MM.decode_image_meta(media)).collect()}
    assert plan["big"]["target_width"] == 1568
    assert plan["big"]["target_height"] == 784
    assert not plan["big"]["too_small_warning"]
    assert plan["small"]["target_width"] == 150  # no upscale
    assert plan["small"]["too_small_warning"]


def test_resize_flags(spark):
    """A genuinely decodable over-size PNG resizes for real; under-size
    payloads pass through byte-identical."""
    import numpy as np

    from autoextract.operators.png_codec import decode_png, encode_png

    big = encode_png(
        np.random.RandomState(3).randint(0, 256, (200, 1600, 3), dtype=np.uint8)
    )
    media = spark.createDataFrame(
        [("big", big), ("ok", ING.make_png(100, 100))],
        ["media_ref", "payload"],
    )
    rows = {r["media_ref"]: r for r in MM.resize_image_stub(media).collect()}
    assert rows["big"]["resized"] is True
    out = decode_png(bytes(rows["big"]["payload"]))
    assert out.shape[1] == MM.MAX_LONG_EDGE  # long edge capped
    assert rows["ok"]["resized"] is False
    assert bytes(rows["ok"]["payload"]) == ING.make_png(100, 100)


def test_resize_nonresizable_formats_pass_through_byte_identical(spark):
    """Formats without an in-container codec must NEVER emit modified bytes
    (r2 VERDICT: the truncation stub was strictly worse than a no-op) —
    over-size JPEG/GIF pass through unchanged with resized=false."""
    big_jpeg = ING.make_jpeg(4000, 3000)
    big_gif = ING.make_gif(4000, 3000)
    corrupt_png = ING.make_png(4000, 4000)[:40]  # valid header, dead stream
    media = spark.createDataFrame(
        [("j", big_jpeg), ("g", big_gif), ("p", corrupt_png)],
        ["media_ref", "payload"],
    )
    rows = {r["media_ref"]: r for r in MM.resize_image(media).collect()}
    assert bytes(rows["j"]["payload"]) == big_jpeg and rows["j"]["resized"] is False
    assert bytes(rows["g"]["payload"]) == big_gif and rows["g"]["resized"] is False
    assert bytes(rows["p"]["payload"]) == corrupt_png and rows["p"]["resized"] is False


def test_frame_sample_non_gif_emits_no_fake_frames(spark):
    """Containers without a demuxer yield ZERO rows, not fabricated byte
    slices; real GIFs still demux (test_gif_demux_real_frames)."""
    vids = spark.createDataFrame(
        [("v1", b"\x01" * 6400), ("g1", _make_animated_gif(1))],
        ["media_ref", "payload"],
    )
    rows = MM.frame_sample_stub(vids, every_n=1).collect()
    assert all(r["media_ref"] == "g1" for r in rows)
    assert len(rows) == 1  # the single-frame GIF's one real frame


def test_embed_media_deterministic(spark):
    media = spark.createDataFrame(
        [("a", b"payload-a"), ("b", b"payload-b"), ("a2", b"payload-a")],
        ["media_ref", "payload"],
    )
    rows = {r["media_ref"]: list(r["embedding"]) for r in MM.embed_media_stub(media, dim=8).collect()}
    assert rows["a"] == rows["a2"]  # content-derived, deterministic
    assert rows["a"] != rows["b"]
    assert len(rows["a"]) == 8


def test_embed_media_real_feature_flag(spark):
    """real_feature separates decoded features from hash-stub fallbacks, so
    similarity pipelines on dirty corpora can filter the noise vectors out
    before near-dup pairing."""
    import numpy as np

    from autoextract.operators.png_codec import encode_png

    img = np.full((8, 8, 3), 128, dtype=np.uint8)
    media = spark.createDataFrame(
        [("good", encode_png(img)), ("junk", b"\x00not-an-image"), ("empty", None)],
        "media_ref string, payload binary",
    )
    out = MM.embed_media(media)
    assert "real_feature" in out.columns
    flags = {r["media_ref"]: r["real_feature"] for r in out.collect()}
    assert flags == {"good": True, "junk": False, "empty": False}
    kept = out.where("real_feature").collect()
    assert [r["media_ref"] for r in kept] == ["good"]


def test_ingest_sniff_dispatch(spark):
    raw = ING.gen_raw_docs(spark, 100, seed=5)
    sniffed = ING.sniff(raw).cache()
    by_fmt = {r["fmt"]: r["n"] for r in sniffed.groupBy("fmt").agg(F.count("*").alias("n")).collect()}
    assert set(by_fmt) == {"png", "jpeg", "gif", "pdf", "html"}
    assert sum(by_fmt.values()) == 100
    routed = ING.dispatch(sniffed)
    assert routed["html"].count() == by_fmt["html"]
    assert routed["images"].count() == by_fmt["png"] + by_fmt["jpeg"] + by_fmt["gif"]
    assert routed["pdfs"].count() == by_fmt["pdf"]
    assert routed["other"].count() == 0
    # html branch feeds the real stripper
    from autoextract.operators.html import html_spans_table

    spans = html_spans_table(routed["html"])
    assert spans.count() == by_fmt["html"]
    # images branch presents the multimodal contract and pipes straight in
    assert "media_ref" in routed["images"].columns
    assert MM.resize_image(routed["images"]).count() == by_fmt["png"] + by_fmt["jpeg"] + by_fmt["gif"]
    sniffed.unpersist()


def _make_animated_gif(n_frames: int, w: int = 4, h: int = 4) -> bytes:
    """Structurally valid multi-frame GIF89a (demux-parseable; pixel data is
    opaque LZW sub-blocks, which is all a demuxer touches)."""
    import struct

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h) + bytes([0x00, 0, 0])  # LSD, no GCT
    for _ in range(n_frames):
        out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # graphic control ext
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"  # descriptor
        out += b"\x02"  # LZW min code size
        out += bytes([3, 0xAA, 0xBB, 0xCC])  # one 3-byte data sub-block
        out += b"\x00"  # block terminator
    out += b"\x3b"
    return bytes(out)


def test_gif_demux_real_frames(spark):
    from autoextract.operators.multimodal import frame_sample, gif_frames

    g = _make_animated_gif(7)
    assert len(gif_frames(g)) == 7
    assert gif_frames(b"GIF89a trunc") == []

    vids = spark.createDataFrame([("g1", g)], ["media_ref", "payload"])
    rows = frame_sample(vids, every_n=2).collect()
    assert [r["frame_idx"] for r in rows] == [0, 2, 4, 6]
    # each payload is that frame's real image section (starts with 0x2C)
    assert all(bytes(r["frame_payload"])[0] == 0x2C for r in rows)


def test_embed_media_real_png_features(spark):
    import numpy as np

    from autoextract.operators.png_codec import encode_png
    from autoextract.operators.multimodal import embed_media

    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (32, 32, 3), dtype=np.uint8)
    near = img.copy()
    near[0, 0] = 255 - near[0, 0]  # one pixel differs
    other = rng.randint(0, 256, (32, 32, 3), dtype=np.uint8)
    media = spark.createDataFrame(
        [("a", encode_png(img)), ("b", encode_png(near)), ("c", encode_png(other))],
        ["media_ref", "payload"],
    )
    vecs = {r["media_ref"]: np.array(r["embedding"]) for r in embed_media(media).collect()}
    cos = lambda x, y: float(x @ y / (np.linalg.norm(x) * np.linalg.norm(y)))
    assert cos(vecs["a"], vecs["b"]) > 0.999  # near-identical images
    assert cos(vecs["a"], vecs["c"]) < cos(vecs["a"], vecs["b"])
    assert len(vecs["a"]) == 16


def test_embed_media_gray_alpha_ignores_alpha(spark):
    """Gray+alpha PNGs must pool intensity from the gray channel only — a
    varying alpha channel over identical gray pixels may not move the
    feature (ADVICE r2: alpha was being averaged into intensity)."""
    import numpy as np

    from autoextract.operators.png_codec import encode_png
    from autoextract.operators.multimodal import embed_media

    rng = np.random.RandomState(9)
    gray = rng.randint(0, 256, (16, 16, 1), dtype=np.uint8)
    ga_opaque = np.concatenate([gray, np.full((16, 16, 1), 255, np.uint8)], axis=2)
    ga_varied = np.concatenate(
        [gray, rng.randint(0, 256, (16, 16, 1), dtype=np.uint8)], axis=2
    )
    media = spark.createDataFrame(
        [("opaque", encode_png(ga_opaque)), ("varied", encode_png(ga_varied))],
        ["media_ref", "payload"],
    )
    vecs = {
        r["media_ref"]: list(r["embedding"]) for r in embed_media(media).collect()
    }
    assert vecs["opaque"] == vecs["varied"]


def _make_webp(kind: str, w: int, h: int) -> bytes:
    """Minimal header-only WEBP payloads for each container flavor."""
    import struct as S

    if kind == "vp8x":
        body = b"VP8X" + S.pack("<I", 10) + b"\x00\x00\x00\x00" \
            + (w - 1).to_bytes(3, "little") + (h - 1).to_bytes(3, "little")
    elif kind == "vp8l":
        bits = (w - 1) | ((h - 1) << 14)
        body = b"VP8L" + S.pack("<I", 5) + b"\x2f" + S.pack("<I", bits)
    else:  # lossy vp8
        body = b"VP8 " + S.pack("<I", 10) + b"\x00\x00\x00" \
            + b"\x9d\x01\x2a" + S.pack("<HH", w, h)
    riff = b"WEBP" + body
    return b"RIFF" + S.pack("<I", len(riff)) + riff + b"\x00" * 8


def test_webp_dims_all_flavors():
    assert MM._webp_dims(_make_webp("vp8x", 640, 480)) == (640, 480)
    assert MM._webp_dims(_make_webp("vp8l", 123, 77)) == (123, 77)
    assert MM._webp_dims(_make_webp("vp8", 320, 240)) == (320, 240)
    assert MM.sniff_format(_make_webp("vp8x", 2, 2)) == "webp"
    assert MM._webp_dims(b"RIFF\x00\x00\x00\x00WEBPnope") is None


# ---------------------------------------------------------------- dHash


def _rand_rgb(seed, h=64, w=64):
    import numpy as np

    rng = np.random.RandomState(seed)
    return rng.randint(0, 200, size=(h, w, 3)).astype(np.uint8)


def test_dhash_brightness_invariant_and_patch_local():
    import numpy as np

    from autoextract.operators.multimodal import dhash64_bytes
    from autoextract.operators.png_codec import encode_png

    base = _rand_rgb(7)
    h0 = dhash64_bytes(encode_png(base))
    # uniform brightness shift: hash identical (cell-mean order preserved)
    bright = np.clip(base.astype(np.int16) + 4, 0, 255).astype(np.uint8)
    assert dhash64_bytes(encode_png(bright)) == h0
    # a 4x4 patch inside one grid cell flips at most 2 comparison bits
    patched = base.copy()
    patched[:4, :4] = 255
    hp = dhash64_bytes(encode_png(patched))
    assert bin((h0 ^ hp) & (2**64 - 1)).count("1") <= 2
    # an unrelated random image is far
    other = dhash64_bytes(encode_png(_rand_rgb(8)))
    assert bin((h0 ^ other) & (2**64 - 1)).count("1") > 10


def test_dhash_format_agnostic():
    from autoextract.operators.jpeg_codec import decode_jpeg, encode_jpeg
    from autoextract.operators.multimodal import dhash64_bytes
    from autoextract.operators.png_codec import encode_png

    base = _rand_rgb(3)
    jpeg = encode_jpeg(base, quality=90)
    # hash the JPEG as decoded (lossy) vs the decoded pixels re-encoded
    # losslessly: identical pixels -> identical hash across formats
    assert dhash64_bytes(jpeg) == dhash64_bytes(encode_png(decode_jpeg(jpeg)))


def test_dhash_containment_and_too_small():
    from autoextract.operators.multimodal import dhash64_bytes
    from autoextract.operators.png_codec import encode_png

    assert dhash64_bytes(b"") is None
    assert dhash64_bytes(b"garbage not an image") is None
    assert dhash64_bytes(encode_png(_rand_rgb(1, h=4, w=4))) is None


def test_image_dhash_neardup_end_to_end(spark):
    import numpy as np

    from autoextract.operators.dedup import hamming_near_dup_pairs
    from autoextract.operators.multimodal import image_dhash
    from autoextract.operators.png_codec import encode_png

    rows = []
    for i in range(10):
        base = _rand_rgb(100 + i)
        near = np.clip(base.astype(np.int16) + 4, 0, 255).astype(np.uint8)
        near[:4, :4] = 255
        rows.append((i, bytearray(encode_png(base))))
        rows.append((1000 + i, bytearray(encode_png(near))))
    media = spark.createDataFrame(
        [(str(i), bytes(p)) for i, p in rows], "media_ref string, payload binary"
    )
    hashes = image_dhash(media).where("valid")
    sk = hashes.select(
        F.col("media_ref").cast("long").alias("doc_id"), F.col("dhash").alias("sk")
    )
    pairs = {
        (r.doc_a, r.doc_b) for r in hamming_near_dup_pairs(sk, max_hamming=6).collect()
    }
    assert pairs == {(i, 1000 + i) for i in range(10)}


def test_sniff_new_container_family():
    from autoextract.operators.multimodal import sniff_format
    from autoextract.sources.docx import build_docx
    from autoextract.sources.epub import build_epub
    from autoextract.sources.pptx import build_pptx
    from autoextract.sources.webdataset import build_wds_tar
    from autoextract.sources.xlsx import build_xlsx
    from autoextract.operators.id3 import build_id3

    assert sniff_format(build_docx([("text", "x")])) == "docx"
    assert sniff_format(build_xlsx([["v"]])) == "xlsx"
    assert sniff_format(build_pptx([["s"]])) == "pptx"
    assert sniff_format(build_epub(["<html><body>c</body></html>"])) == "epub"
    from autoextract.sources.odt import build_odt
    assert sniff_format(build_odt([("text", "x")])) == "odt"
    assert sniff_format(build_wds_tar({"k": {"txt": b"t"}})) == "tar"
    assert sniff_format(build_id3(title="t") + b"\xff\xfb") == "mp3"
    assert sniff_format(b"fLaC....") == "flac"
    assert sniff_format(b"\x1f\x8b\x08...") == "gzip"
    assert sniff_format(b"WARC/1.0\r\n") == "warc"
    import io, zipfile
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("random.bin", b"x")
    assert sniff_format(buf.getvalue()) == "zip"
    # truncated zip header never raises
    assert sniff_format(b"PK\x03\x04trunc") == "zip"
