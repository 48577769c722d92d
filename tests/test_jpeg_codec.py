"""Pure-Python baseline JPEG codec (operators/jpeg_codec): encode/decode
round-trips across subsampling and restart-marker shapes, resize path, and
integration with the multimodal resize kernel."""

from __future__ import annotations

import numpy as np
import pytest

from autoextract.operators import jpeg_codec as J


def _gradient_rgb(h=70, w=100):
    g = (np.add.outer(np.linspace(0, 255, h), np.linspace(0, 255, w)) / 2).astype(
        np.uint8
    )
    return np.stack([g, g[::-1], np.full_like(g, 90)], axis=2)


def test_gray_roundtrip_low_error():
    g = _gradient_rgb()[:, :, 0]
    dec = J.decode_jpeg(J.encode_jpeg(g, quality=90))
    assert dec.shape == (*g.shape, 1)
    assert np.abs(dec[:, :, 0].astype(float) - g.astype(float)).mean() < 2.0


@pytest.mark.parametrize("sub", ["4:4:4", "4:2:0"])
@pytest.mark.parametrize("dri", [0, 3])
def test_rgb_roundtrip_all_shapes(sub, dri):
    """4:4:4 and 4:2:0 sampling, with and without restart markers — the
    decoder handles interleaved MCUs, chroma upsampling, and RSTn resets."""
    rgb = _gradient_rgb()
    b = J.encode_jpeg(rgb, quality=90, subsampling=sub, restart_interval=dri)
    dec = J.decode_jpeg(b)
    assert dec.shape == rgb.shape
    mae = np.abs(dec.astype(float) - rgb.astype(float)).mean()
    assert mae < 3.0, (sub, dri, mae)


def test_non_multiple_of_8_and_of_16_dims():
    """Edge blocks pad by replication and crop back exactly — including the
    4:2:0 case where the MCU grid is 16×16."""
    for h, w in ((17, 23), (9, 40)):
        rgb = _gradient_rgb(h, w)
        for sub in ("4:4:4", "4:2:0"):
            dec = J.decode_jpeg(J.encode_jpeg(rgb, subsampling=sub))
            assert dec.shape == (h, w, 3)


def test_quality_tradeoff():
    noisy = np.random.RandomState(11).randint(0, 256, (48, 48, 3), dtype=np.uint8)
    b90 = J.encode_jpeg(noisy, quality=90)
    b30 = J.encode_jpeg(noisy, quality=30)
    assert len(b30) < len(b90)
    e90 = np.abs(J.decode_jpeg(b90).astype(float) - noisy).mean()
    e30 = np.abs(J.decode_jpeg(b30).astype(float) - noisy).mean()
    assert e90 < e30


def test_resize_jpeg_bytes_hits_targets():
    rgb = _gradient_rgb(64, 96)
    out = J.resize_jpeg_bytes(J.encode_jpeg(rgb), 48, 32)
    dec = J.decode_jpeg(out)
    assert dec.shape == (32, 48, 3)


def test_progressive_decodes_pixel_identical_to_baseline():
    """SOF2 progressive (DC/AC first + successive-approximation refinement
    scans) must decode to EXACTLY the baseline encoding's pixels at the
    same quality — progressive only reorders coefficient transmission, so
    any discrepancy in any of the four scan-type codecs breaks equality."""
    import numpy as np

    rng = np.random.RandomState(7)
    g = (np.arange(24)[:, None] * 10 + np.arange(40)[None, :] * 3).astype(np.uint8)
    rgb = rng.randint(0, 256, (37, 53, 3), dtype=np.uint8)
    smooth = np.tile(np.linspace(0, 255, 64, dtype=np.uint8)[None, :, None], (48, 1, 3))
    for img, sub in ((g, "4:4:4"), (rgb, "4:4:4"), (rgb, "4:2:0"), (smooth, "4:2:0")):
        base = J.decode_jpeg(J.encode_jpeg(img, quality=85, subsampling=sub))
        prog_bytes = J.encode_progressive_jpeg(img, quality=85, subsampling=sub)
        assert b"\xff\xc2" in prog_bytes[:200]  # really SOF2
        assert np.array_equal(J.decode_jpeg(prog_bytes), base), sub


def test_progressive_resize_kernel(spark):
    """The resize kernel really resizes over-size PROGRESSIVE JPEGs now
    (they were pass-through before r4)."""
    import numpy as np

    from autoextract.operators import multimodal as MM

    big = J.encode_progressive_jpeg(_gradient_rgb(100, 1700), quality=85)
    media = spark.createDataFrame([("p", big)], ["media_ref", "payload"])
    row = MM.resize_image(media).collect()[0]
    assert row["resized"] is True
    out = J.decode_jpeg(bytes(row["payload"]))
    assert out.shape[1] == MM.MAX_LONG_EDGE


def test_cmyk_and_ycck_decode():
    """Adobe APP14 4-component JPEGs (print-world files): inverted-CMYK
    (transform 0) and YCCK (transform 2) both decode to RGB. With K'=255
    (no black) the inverted CMY planes ARE the RGB planes, so the decode
    must recover the source image up to normal quantization error."""
    import numpy as np

    rng = np.random.RandomState(3)
    rgb = rng.randint(30, 226, (24, 33, 3), dtype=np.uint8)
    k = np.full(rgb.shape[:2], 255, dtype=np.uint8)
    # transform 0: inverted CMYK stored directly
    cmyk = np.dstack([rgb, k])
    enc = J.encode_jpeg(cmyk, quality=95)
    assert b"Adobe" in enc[:40]
    dec = J.decode_jpeg(enc)
    assert dec.shape == rgb.shape
    assert np.abs(dec.astype(int) - rgb.astype(int)).mean() < 4
    # transform 2: YCCK (YCbCr of the inverted CMY) + K
    r, g, b = (rgb[:, :, i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    ycck = np.dstack([np.clip(c, 0, 255).astype(np.uint8) for c in (y, cb, cr)] + [k])
    dec2 = J.decode_jpeg(J.encode_jpeg(ycck, quality=95, adobe_transform=2))
    assert np.abs(dec2.astype(int) - rgb.astype(int)).mean() < 5


def test_app14_transform_honored_on_3_components():
    """The decoder honors APP14 transform 0 on 3-component files (straight
    RGB components, no YCbCr inverse): a file whose only difference is the
    APP14 tag decodes to different pixels, while the untagged default still
    recovers the source through the YCbCr path."""
    import numpy as np

    rgb = _gradient_rgb(16, 16)
    y_dec = J.decode_jpeg(J.encode_jpeg(rgb, quality=95))
    tagged = J.decode_jpeg(J.encode_jpeg(rgb, quality=95, adobe_transform=0))
    assert np.abs(y_dec.astype(int) - rgb.astype(int)).mean() < 4
    assert not np.array_equal(y_dec, tagged)  # tag switched the color path


def test_fill_bytes_between_markers_decode():
    """T.81 B.1.1.3 allows any number of 0xFF fill bytes before a marker —
    real-world encoders emit them; the decoder must skip, not reject."""
    import numpy as np

    g = _gradient_rgb(24, 24)
    b = J.encode_jpeg(g, quality=90)
    # inject 0xFF padding immediately after SOI, before the first segment
    padded = b[:2] + b"\xff\xff\xff" + b[2:]
    assert np.array_equal(J.decode_jpeg(padded), J.decode_jpeg(b))


def test_unsupported_streams_raise_jpeg_error():
    from autoextract.sources.ingest import make_jpeg

    with pytest.raises(J.JpegError):
        J.decode_jpeg(b"not a jpeg")
    with pytest.raises(J.JpegError):
        J.decode_jpeg(make_jpeg(10, 10))  # header-only, no tables/scan
    # progressive SOF2 header with no scans: contained, not misdecoded
    prog = b"\xff\xd8\xff\xc2" + b"\x00\x0b\x08\x00\x10\x00\x10\x01\x01\x11\x00"
    with pytest.raises(J.JpegError, match="no scan data"):
        J.decode_jpeg(prog)
    # lossless SOF3 stays out of scope
    lossless = b"\xff\xd8\xff\xc3" + b"\x00\x0b\x08\x00\x10\x00\x10\x01\x01\x11\x00"
    with pytest.raises(J.JpegError, match="unsupported SOF"):
        J.decode_jpeg(lossless)


def test_resize_kernel_resizes_real_jpeg(spark):
    """The multimodal resize kernel now really resizes oversize baseline
    JPEGs (decoded dims == resize_plan targets) and still passes header-only
    payloads through untouched."""
    from autoextract.operators import multimodal as MM
    from autoextract.sources.ingest import make_jpeg

    big = J.encode_jpeg(_gradient_rgb(200, 1600), quality=85)
    header_only = make_jpeg(4000, 3000)
    media = spark.createDataFrame(
        [("real", big), ("hdr", header_only)], ["media_ref", "payload"]
    )
    rows = {r["media_ref"]: r for r in MM.resize_image(media).collect()}
    assert rows["real"]["resized"] is True
    dec = J.decode_jpeg(bytes(rows["real"]["payload"]))
    assert dec.shape[1] == MM.MAX_LONG_EDGE
    assert rows["hdr"]["resized"] is False
    assert bytes(rows["hdr"]["payload"]) == header_only


def test_embed_media_jpeg_features_near_png(spark):
    """The same image through the JPEG and PNG paths pools to nearly the
    same feature vector (lossy codec, cosine ≈ 1)."""
    from autoextract.operators.multimodal import embed_media
    from autoextract.operators.png_codec import encode_png

    img = _gradient_rgb(32, 32)
    media = spark.createDataFrame(
        [("jpg", J.encode_jpeg(img, quality=95)), ("png", encode_png(img))],
        ["media_ref", "payload"],
    )
    vecs = {r["media_ref"]: np.array(r["embedding"]) for r in embed_media(media).collect()}
    cos = float(
        vecs["jpg"] @ vecs["png"]
        / (np.linalg.norm(vecs["jpg"]) * np.linalg.norm(vecs["png"]))
    )
    assert cos > 0.999


def _image_with_zz_pattern(target_zz, quality):
    """Craft an 8x8 grayscale image whose quantized zigzag coefficients at
    ``quality`` equal ``target_zz`` (verified), via inverse DCT of the
    dequantized targets. Large quant steps (low quality) keep pixel-rounding
    noise from flipping any target value."""
    qt = J._scale_qt(J._QT_LUMA, quality)
    nat = np.zeros(64)
    nat[J._ZIGZAG] = np.asarray(target_zz, dtype=np.float64) * qt
    pix = J._DCT_M.T @ nat.reshape(8, 8) @ J._DCT_M + 128.0
    img = np.clip(np.rint(pix), 0, 255).astype(np.uint8)
    # verify the encoder's own quantization reproduces the target exactly
    coef = J._DCT_M @ (img.astype(np.float64) - 128.0) @ J._DCT_M.T
    got = np.rint(coef.reshape(64)[J._ZIGZAG] / qt).astype(int)
    assert got.tolist() == list(target_zz), "fixture did not survive rounding"
    return img


def test_ac_refine_zrl_before_correction_bit():
    """Regression: an AC refinement band with >=16 zeros, then a
    history-nonzero coeff (|q|>=2), then a newly-nonzero |q|=1 must flush
    the pending ZRL BEFORE buffering the correction bit (libjpeg
    encode_mcu_AC_refine ordering). The buggy order emitted the buffered
    bit after the ZRL where the decoder never reads it, desyncing the
    stream ('AC refinement s != 1')."""
    target = [0] * 64
    target[0] = 2   # DC
    # zigzag band 1..63: positions 1..16 zero (run of 16), then 6, then 1
    target[17] = 6  # |q|>1 -> history-nonzero in the Al=0 refinement scan
    target[18] = 1  # newly nonzero right after -> triggers the ZRL flush
    img = _image_with_zz_pattern(target, quality=25)
    prog = J.encode_progressive_jpeg(img, quality=25)
    dec = J.decode_jpeg(prog)  # buggy encoder: raises or misdecodes
    base = J.decode_jpeg(J.encode_jpeg(img, quality=25))
    assert np.array_equal(dec, base)


def test_ac_refine_zrl_trailing_correction_bits():
    """Companion shape: 16 zeros then |q|>=2 with NO later newly-nonzero
    coeff — the correction bit must ride under the trailing EOB."""
    target = [0] * 64
    target[0] = 2
    target[17] = 7  # odd -> correction bit is 1, must actually be read
    img = _image_with_zz_pattern(target, quality=25)
    dec = J.decode_jpeg(J.encode_progressive_jpeg(img, quality=25))
    base = J.decode_jpeg(J.encode_jpeg(img, quality=25))
    assert np.array_equal(dec, base)


@pytest.mark.parametrize("sub", ["4:4:4", "4:2:0"])
def test_progressive_with_restart_markers(sub):
    """Progressive + DRI (the wild combo): RSTn markers inside all four
    scan kinds — MCU-interval for interleaved DC scans, block-interval for
    single-component AC scans — decode pixel-identical to baseline."""
    img = _gradient_rgb(70, 100)
    base = J.decode_jpeg(J.encode_jpeg(img, quality=85, subsampling=sub))
    for dri in (1, 3, 5):
        prog = J.encode_progressive_jpeg(
            img, quality=85, subsampling=sub, restart_interval=dri
        )
        assert b"\xff\xdd" in prog
        assert np.array_equal(J.decode_jpeg(prog), base), dri


def test_422_sampling_roundtrip():
    """4:2:2 (2×1 luma sampling — the DSLR/scanner default): both encoders
    round-trip, progressive pixel-identical to baseline."""
    img = _gradient_rgb(70, 100)
    d1 = J.decode_jpeg(J.encode_jpeg(img, quality=90, subsampling="4:2:2"))
    assert d1.shape == img.shape
    assert np.abs(d1.astype(float) - img).mean() < 4.0
    d2 = J.decode_jpeg(
        J.encode_progressive_jpeg(img, quality=90, subsampling="4:2:2")
    )
    assert np.array_equal(d1, d2)
