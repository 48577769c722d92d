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


def test_animated_gif_resize_raises():
    idx, pal, b = _random_gif()
    # splice a second image block in front of the trailer
    second = b[b.index(b"\x2c") : -1]
    animated = b[:-1] + second + b"\x3b"
    assert G.gif_frame_count(animated) == 2
    with pytest.raises(G.GifError, match="animated"):
        G.resize_gif_bytes(animated, 10, 10)


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


def test_resize_kernel_resizes_real_gif_and_passes_animated(spark):
    from autoextract.operators import multimodal as MM

    rng = np.random.RandomState(5)
    pal = rng.randint(0, 256, (16, 3), dtype=np.uint8)
    big = G.encode_gif(rng.randint(0, 16, (100, 1600), dtype=np.uint8), pal)
    one = G.encode_gif(rng.randint(0, 16, (8, 8), dtype=np.uint8), pal)
    second = one[one.index(b"\x2c") : -1]
    # oversize AND animated: codec refuses → honest pass-through
    big_anim = big[:-1] + second + b"\x3b"
    media = spark.createDataFrame(
        [("big", big), ("anim", big_anim)], ["media_ref", "payload"]
    )
    rows = {r["media_ref"]: r for r in MM.resize_image(media).collect()}
    assert rows["big"]["resized"] is True
    idx, _ = G.decode_gif_indexed(bytes(rows["big"]["payload"]))
    assert idx.shape[1] == MM.MAX_LONG_EDGE
    assert rows["anim"]["resized"] is False
    assert bytes(rows["anim"]["payload"]) == big_anim
