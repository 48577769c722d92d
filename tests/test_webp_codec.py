"""Pure-Python lossless-WebP codec (operators/webp_codec): exact
round-trips across the full VP8L transform matrix, containment for lossy /
corrupt payloads, and the multimodal resize-kernel integration."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from autoextract.operators import webp_codec as W


def _gradient(h=24, w=33, channels=3):
    g = (np.add.outer(np.linspace(0, 255, h), np.linspace(0, 255, w)) / 2).astype(
        np.uint8
    )
    layers = [g, g[::-1], np.full_like(g, 90), np.full_like(g, 255)]
    return np.stack(layers[:channels], axis=2)


def _rgba(arr):
    if arr.shape[2] == 4:
        return arr
    return np.dstack([arr, np.full(arr.shape[:2], 255, np.uint8)])


def test_literal_and_lz77_roundtrip():
    a = np.zeros((10, 40, 3), np.uint8)
    a[:, 20:] = [200, 10, 30]  # long flat runs → distance-1 copies
    assert np.array_equal(W.decode_webp(W.encode_webp_lossless(a)), _rgba(a))
    noisy = np.random.RandomState(3).randint(0, 256, (15, 17, 4)).astype(np.uint8)
    assert np.array_equal(W.decode_webp(W.encode_webp_lossless(noisy)), noisy)


def test_subtract_green_and_cross_color():
    arr = _gradient()
    for kwargs in (
        {"use_subtract_green": True},
        {"color_transform": (16, -7, 5)},
        {"color_transform": (127, -128, 33)},
        {"use_subtract_green": True, "predictor_mode": 11},
    ):
        b = W.encode_webp_lossless(arr, **kwargs)
        assert np.array_equal(W.decode_webp(b), _rgba(arr)), kwargs


@pytest.mark.parametrize("mode", list(range(14)))
def test_every_predictor_mode(mode):
    arr = _gradient()
    b = W.encode_webp_lossless(arr, predictor_mode=mode)
    assert np.array_equal(W.decode_webp(b), _rgba(arr))


@pytest.mark.parametrize("ncol", [2, 4, 13, 60])
def test_palette_with_pixel_packing(ncol):
    rng = np.random.RandomState(ncol)
    lut = rng.randint(0, 256, (ncol, 3)).astype(np.uint8)
    arr = lut[rng.randint(0, ncol, (9, 41))]
    b = W.encode_webp_lossless(arr, use_palette=True)
    assert np.array_equal(W.decode_webp(b), _rgba(arr))


def test_lossy_and_corrupt_contained():
    # lossy VP8 frame: honest error, not garbage pixels
    lossy = b"RIFF" + struct.pack("<I", 20) + b"WEBPVP8 " + b"\x00" * 12
    with pytest.raises(W.WebpError):
        W.decode_webp(lossy)
    with pytest.raises(W.WebpError):
        W.decode_webp(b"RIFF\x00\x00\x00\x00NOPE")
    # truncated VP8L body
    good = W.encode_webp_lossless(_gradient())
    with pytest.raises(W.WebpError):
        W.decode_webp(good[:30])


def test_resize_kernel_resizes_lossless_webp(spark):
    """The P2 resize path: an over-limit VP8L file really resamples to the
    plan target dims; a lossy VP8 payload passes through byte-identical
    with resized=false (containment)."""
    from autoextract.operators import multimodal as MM

    big = _gradient(20, 1700)
    wb = W.encode_webp_lossless(big)
    lossy = b"RIFF" + struct.pack("<I", 32) + b"WEBPVP8 " + b"\x00" * 24
    media = spark.createDataFrame(
        [("m-l", bytearray(wb)), ("m-v", bytearray(lossy))],
        "media_ref string, payload binary",
    )
    out = {r["media_ref"]: r for r in MM.resize_image(media).collect()}
    assert out["m-v"]["resized"] is False
    assert bytes(out["m-v"]["payload"]) == lossy
    assert out["m-l"]["resized"] is True
    dec = W.decode_webp(bytes(out["m-l"]["payload"]))
    assert dec.shape[1] == 1568  # long edge clamped to the plan target
    assert dec.shape[0] == max(round(20 * 1568 / 1700), 1)


def test_embed_media_real_feature_for_webp(spark):
    from autoextract.operators import multimodal as MM

    arr = _gradient(32, 32)
    media = spark.createDataFrame(
        [("m-w", bytearray(W.encode_webp_lossless(arr)))],
        "media_ref string, payload binary",
    )
    row = MM.embed_media(media).collect()[0]
    assert row["real_feature"] is True
    assert abs(sum(v * v for v in row["embedding"]) - 1.0) < 1e-5


@pytest.mark.parametrize("kwargs", [
    {"cache_bits": 4},
    {"cache_bits": 8},
    {"use_meta": True},
    {"cache_bits": 6, "use_meta": True},
    {"cache_bits": 5, "use_subtract_green": True},
])
def test_color_cache_meta_and_row_copies(kwargs):
    """The r5 coverage knobs: color-cache symbols (green alphabet > 280),
    meta prefix recursion, and whole-row LZ77 copies (distance = width,
    the 2D map's (0,1) entry) all decode exactly."""
    rng = np.random.RandomState(9)
    base_row = rng.randint(0, 6, (1, 50)).astype(np.uint8) * 40
    arr = np.repeat(base_row[:, :, None].repeat(3, axis=2), 12, axis=0)
    arr[6, 10:20] = [7, 7, 7]
    b = W.encode_webp_lossless(arr, **kwargs)
    assert np.array_equal(W.decode_webp(b), _rgba(arr))


def test_row_copy_compression_fires():
    rng = np.random.RandomState(9)
    base_row = rng.randint(0, 6, (1, 50)).astype(np.uint8) * 40
    arr = np.repeat(base_row[:, :, None].repeat(3, axis=2), 12, axis=0)
    assert len(W.encode_webp_lossless(arr)) < len(
        W.encode_webp_lossless(arr, use_lz77=False)
    )


def test_animated_webp_demux_and_frame_sample(spark):
    """Animated WebP (VP8X/ANMF) demuxes for real: every sampled frame is
    a standalone decodable WebP; stills yield one frame; garbage yields
    zero rows (same contract as the GIF path)."""
    from autoextract.operators import multimodal as MM

    rng = np.random.RandomState(3)
    frames = [rng.randint(0, 256, (10, 14, 3)).astype(np.uint8) for _ in range(4)]
    anim = W.encode_animated_webp(frames, delays_ms=[40, 60, 80, 100])
    outs = W.webp_frames(anim)
    assert len(outs) == 4
    for f, arr in zip(outs, frames):
        assert np.array_equal(W.decode_webp(f), _rgba(arr))
    media = spark.createDataFrame(
        [("m-anim", bytearray(anim)),
         ("m-still", bytearray(W.encode_webp_lossless(frames[0]))),
         ("m-junk", bytearray(b"RIFF\x08\x00\x00\x00WEBPxxxx"))],
        "media_ref string, payload binary",
    )
    rows = MM.frame_sample(media, every_n=2).collect()
    got = {}
    for r in rows:
        got.setdefault(r["media_ref"], []).append(r["frame_idx"])
    assert got["m-anim"] == [0, 2]  # every 2nd of 4 frames
    assert got["m-still"] == [0]
    assert "m-junk" not in got
    # sampled frames decode
    anim_frames = [r for r in rows if r["media_ref"] == "m-anim"]
    for r in anim_frames:
        W.decode_webp(bytes(r["frame_payload"]))
