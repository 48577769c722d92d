"""Pure-Python GIF LZW codec (operators/gif_codec): lossless index
round-trips, interlace, palette preservation on resize, animated fallback."""

from __future__ import annotations

import numpy as np
import pytest

from autoextract.operators import gif_codec as G


def _random_gif(h=40, w=60, ncolors=7, seed=3):
    rng = np.random.RandomState(seed)
    pal = rng.randint(0, 256, (ncolors, 3), dtype=np.uint8)
    idx = rng.randint(0, ncolors, (h, w), dtype=np.uint8)
    return idx, pal, G.encode_gif(idx, pal)


def test_lossless_index_roundtrip():
    idx, pal, b = _random_gif()
    idx2, pal2 = G.decode_gif_indexed(b)
    assert np.array_equal(idx, idx2)
    assert np.array_equal(pal, pal2[: len(pal)])
    assert np.array_equal(G.decode_gif(b), pal[idx])


def test_large_palette_dict_growth():
    """200 colors + 15k pixels force the LZW dictionary through several
    width increases (and the 12-bit reset path on bigger inputs)."""
    idx, pal, b = _random_gif(100, 150, ncolors=200, seed=9)
    idx2, _ = G.decode_gif_indexed(b)
    assert np.array_equal(idx, idx2)


def test_deinterlace_order():
    rows = np.arange(10, dtype=np.uint8)[:, None].repeat(3, 1)
    order = []
    for start, step in G._INTERLACE_PASSES:
        order.extend(range(start, 10, step))
    assert np.array_equal(G._deinterlace(rows[np.array(order)]), rows)


def test_resize_preserves_palette_exactly():
    idx, pal, b = _random_gif()
    out = G.resize_gif_bytes(b, 30, 20)
    idx2, pal2 = G.decode_gif_indexed(out)
    assert idx2.shape == (20, 30)
    assert np.array_equal(pal2[: len(pal)], pal)
    # every output color is an input color (index resample, no quantization)
    assert set(np.unique(idx2)) <= set(np.unique(idx))


def _make_real_animated(W=40, H=30, n=3, ncolors=7, seed=11, loop_ext=True):
    """Decodable multi-frame GIF89a: per-frame GCE (delay = 10*frame,
    transparency on frame 1), varying sub-rect geometry, real LZW pixels,
    optional NETSCAPE loop application extension."""
    import struct as st

    rng = np.random.RandomState(seed)
    pal = rng.randint(0, 256, (ncolors, 3), dtype=np.uint8)
    bits = max(1, (ncolors - 1).bit_length())
    size = 1 << bits
    padded = np.zeros((size, 3), dtype=np.uint8)
    padded[:ncolors] = pal
    out = bytearray(b"GIF89a")
    out += st.pack("<HH", W, H) + bytes([0x80 | ((bits - 1) & 0x07), 0, 0])
    out += padded.tobytes()
    if loop_ext:
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    frames = []
    for f in range(n):
        fw, fh = W - 4 * f, H - 2 * f
        fx, fy = 2 * f, f
        idx = rng.randint(0, ncolors, (fh, fw), dtype=np.uint8)
        frames.append((fx, fy, fw, fh, idx))
        gce_packed = 0x05 if f == 1 else 0x04  # transparency flag on frame 1
        out += bytes([0x21, 0xF9, 0x04, gce_packed]) + st.pack("<H", 10 * f)
        out += bytes([3 if f == 1 else 0, 0])  # transparent idx 3 / none
        out += b"\x2c" + st.pack("<HHHH", fx, fy, fw, fh) + b"\x00"
        mcs = max(bits, 2)
        out += bytes([mcs])
        enc = G.lzw_encode(idx, mcs)
        for i in range(0, len(enc), 255):
            chunk = enc[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out), pal, frames


def test_animated_gif_resize_per_frame():
    """Animated GIFs really resize (r4): frame count, delays, transparency,
    the NETSCAPE loop extension, and palette subsets all survive; each
    frame's geometry scales by the canvas factors."""
    data, pal, frames = _make_real_animated()
    out = G.resize_gif_bytes(data, 20, 15)  # halve both axes
    W, H, header, rframes = G.parse_animated_gif(out)
    assert (W, H) == (20, 15)
    assert len(rframes) == len(frames)
    assert any(b"NETSCAPE" in e for e in header["exts"])  # loop preserved
    for f, (fr, (fx, fy, fw, fh, idx)) in enumerate(zip(rframes, frames)):
        assert fr["w"] == max(round(fw * 0.5), 1)
        assert fr["h"] == max(round(fh * 0.5), 1)
        assert fr["x"] == round(fx * 0.5) and fr["y"] == round(fy * 0.5)
        assert set(np.unique(fr["indices"])) <= set(np.unique(idx))
        # GCE fields verbatim: delay at bytes 4-5, transparency flag bit 0
        if f == 1:
            assert fr["gce"][3] & 0x01 and fr["gce"][6] == 3
        assert int.from_bytes(fr["gce"][4:6], "little") == 10 * f


def test_animated_gif_resize_roundtrip_stability():
    """Resizing to the SAME dims keeps every frame's pixels exactly (the
    index arrays pass through resize_nearest unchanged)."""
    data, _, frames = _make_real_animated()
    out = G.resize_gif_bytes(data, 40, 30)
    _, _, _, rframes = G.parse_animated_gif(out)
    for fr, (_, _, _, _, idx) in zip(rframes, frames):
        assert np.array_equal(fr["indices"], idx)


def test_transparency_survives_resize():
    """A GIF89a with a Graphic Control Extension transparency index keeps it
    through resize → re-encode (the old re-encode dropped all extensions and
    the background rendered as an opaque palette color)."""
    idx, pal, _ = _random_gif(ncolors=5)
    b = G.encode_gif(idx, pal, transparent_index=3)
    assert G.gif_transparency_index(b) == 3
    out = G.resize_gif_bytes(b, 30, 20)
    assert G.gif_transparency_index(out) == 3
    idx2, _ = G.decode_gif_indexed(out)
    assert idx2.shape == (20, 30)
    # opaque GIFs stay extension-free
    _, _, plain = _random_gif()
    assert G.gif_transparency_index(plain) is None
    assert G.gif_transparency_index(G.resize_gif_bytes(plain, 10, 10)) is None


def test_garbage_raises():
    with pytest.raises(G.GifError):
        G.decode_gif_indexed(b"GIF89a")
    with pytest.raises(G.GifError):
        G.decode_gif_indexed(b"nope")


def test_resize_kernel_resizes_real_and_animated_gifs(spark):
    from autoextract.operators import multimodal as MM

    rng = np.random.RandomState(5)
    pal = rng.randint(0, 256, (16, 3), dtype=np.uint8)
    big = G.encode_gif(rng.randint(0, 16, (100, 1600), dtype=np.uint8), pal)
    one = G.encode_gif(rng.randint(0, 16, (8, 8), dtype=np.uint8), pal)
    second = one[one.index(b"\x2c") : -1]
    # oversize AND animated: per-frame scaling kicks in (r4) — no more
    # pass-through for animated files
    big_anim = big[:-1] + second + b"\x3b"
    media = spark.createDataFrame(
        [("big", big), ("anim", big_anim)], ["media_ref", "payload"]
    )
    rows = {r["media_ref"]: r for r in MM.resize_image(media).collect()}
    assert rows["big"]["resized"] is True
    idx, _ = G.decode_gif_indexed(bytes(rows["big"]["payload"]))
    assert idx.shape[1] == MM.MAX_LONG_EDGE
    assert rows["anim"]["resized"] is True
    _, _, _, rframes = G.parse_animated_gif(bytes(rows["anim"]["payload"]))
    assert len(rframes) == 2
    assert rframes[0]["indices"].shape[1] == MM.MAX_LONG_EDGE


def test_interlaced_file_roundtrip():
    """A real interlaced GIF (descriptor flag + four-pass row storage)
    decodes back to the original index array — the deinterlace path pinned
    by a full file, not just the permutation helper."""
    rng = np.random.RandomState(4)
    pal = rng.randint(0, 256, (16, 3)).astype(np.uint8)
    idx = rng.randint(0, 16, (23, 31)).astype(np.uint8)
    b = G.encode_gif(idx, pal, interlace=True)
    dec_idx, _ = G.decode_gif_indexed(b)
    assert np.array_equal(dec_idx, idx)
