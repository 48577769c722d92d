"""Pure-Python FLAC codec (operators/flac_codec): exact round-trips across
subframe types / stereo modes / sample widths, CRC tamper detection, and
the audio-kernel integration (transcode, metadata, real-feature embed)."""

from __future__ import annotations

import numpy as np
import pytest

from autoextract.operators import audio as A
from autoextract.operators import flac_codec as FL


def _tone(n=16000, rate=16000, freq=440.0, amp=0.6):
    t = np.arange(n) / rate
    return amp * np.sin(2 * np.pi * freq * t)


@pytest.mark.parametrize("case", ["mono", "stereo", "silence", "noise", "tail"])
def test_roundtrip_exact_within_quantization(case):
    rng = np.random.RandomState(5)
    x = {
        "mono": _tone()[:, None],
        "stereo": np.stack([_tone(), 0.5 * _tone()], axis=1),
        "silence": np.zeros((5000, 1)),
        "noise": (rng.rand(7000, 2) - 0.5) * 0.9,
        "tail": _tone(100)[:, None],  # non-tabled final block size
    }[case]
    for kwargs in ({}, {"force_verbatim": True}):
        y, sr = FL.decode_flac(FL.encode_flac(x, sample_rate=16000, **kwargs))
        assert sr == 16000 and y.shape == x.shape
        assert np.abs(y - x).max() <= 1.5 / (1 << 15)


def test_mid_side_stereo_decode():
    x = np.stack([_tone(freq=440), _tone(freq=221, amp=0.3)], axis=1)
    y, _ = FL.decode_flac(FL.encode_flac(x, mid_side=True))
    assert np.abs(y - x).max() <= 1.5 / (1 << 15)


def test_bit_depths_and_rates():
    x = _tone(3000)[:, None]
    for bps, tol in ((8, 1.5 / 128), (16, 1.5 / 32768)):
        y, sr = FL.decode_flac(FL.encode_flac(x, sample_rate=44100, bps=bps))
        assert sr == 44100 and np.abs(y - x).max() <= tol


def test_streaminfo_and_crc_tamper():
    b = FL.encode_flac(_tone(4096)[:, None], sample_rate=22050)
    info = FL.parse_flac_streaminfo(b)
    assert (info["sample_rate"], info["n_channels"], info["total_samples"]) == (
        22050, 1, 4096,
    )
    bad = bytearray(b)
    bad[-3] ^= 0xFF
    with pytest.raises(FL.FlacError):
        FL.decode_flac(bytes(bad))
    with pytest.raises(FL.FlacError):
        FL.decode_flac(b"fLaC")  # no STREAMINFO


def test_audio_kernels_handle_flac(spark):
    """The r5 seam closure: FLAC payloads transcode to 16 kHz mono WAV,
    report real metadata, and embed with real_feature=true; garbage still
    contains."""
    x = np.stack([_tone(rate=44100, n=22050), 0.5 * _tone(rate=44100, n=22050)],
                 axis=1)
    flac = FL.encode_flac(x, sample_rate=44100)
    media = spark.createDataFrame(
        [("m-f", bytearray(flac)), ("m-junk", bytearray(b"fLaC" + b"\x00" * 8))],
        "media_ref string, payload binary",
    )
    t = {r["media_ref"]: r for r in A.transcode_wav(media).collect()}
    assert t["m-f"]["transcoded"] is True and t["m-f"]["out_rate"] == 16000
    out_x, out_rate = A.decode_wav(bytes(t["m-f"]["payload"]))
    assert out_rate == 16000 and out_x.shape[1] == 1
    assert abs(out_x.shape[0] - 8000) <= 2  # 0.5s at 16kHz
    assert t["m-junk"]["transcoded"] is False
    m = {r["media_ref"]: r for r in A.decode_audio_meta(media).collect()}
    assert m["m-f"]["fmt"] == "flac" and m["m-f"]["sample_rate"] == 44100
    assert m["m-f"]["n_channels"] == 2 and m["m-f"]["valid"] is True
    assert m["m-junk"]["valid"] is False
    e = {r["media_ref"]: r for r in A.embed_audio(media).collect()}
    assert e["m-f"]["real_feature"] is True
    assert e["m-junk"]["real_feature"] is False


@pytest.mark.parametrize("kwargs", [
    {"stereo_mode": "left_side"},
    {"stereo_mode": "right_side"},
    {"stereo_mode": "mid_side"},
    {"use_lpc": True},
    {"partition_order": 2},
    {"rice_escape": True},
    {"method5": True},
    {"use_lpc": True, "partition_order": 1, "method5": True},
    {"stereo_mode": "left_side", "rice_escape": True},
])
def test_decoder_branch_coverage(kwargs):
    """r5 coverage knobs: every residual-coding and stereo-decorrelation
    decoder branch is exercised by a real stream and round-trips within
    the quantization bound."""
    t = np.arange(8192) / 16000.0
    x2 = np.stack([0.6 * np.sin(2 * np.pi * 440 * t),
                   0.3 * np.sin(2 * np.pi * 221 * t)], axis=1)
    x = x2 if "stereo_mode" in kwargs else x2[:, :1]
    y, sr = FL.decode_flac(FL.encode_flac(x, sample_rate=16000, **kwargs))
    assert y.shape == x.shape
    assert np.abs(y - x).max() <= 1.5 / (1 << 15)


def test_24_bit_roundtrip():
    x = (0.6 * np.sin(2 * np.pi * 440 * np.arange(3000) / 16000.0))[:, None]
    y, _ = FL.decode_flac(FL.encode_flac(x, bps=24))
    assert np.abs(y - x).max() <= 1.5 / (1 << 23)


@pytest.mark.parametrize("wb", [1, 2, 4])
def test_wasted_bits_roundtrip(wb):
    """The wasted-bits decoder branch: samples with shared zero low bits
    are coded shifted with a unary wasted count and shift back exactly."""
    x = (0.6 * np.sin(2 * np.pi * 440 * np.arange(8192) / 16000.0))[:, None]
    y, _ = FL.decode_flac(FL.encode_flac(x, wasted_bits=wb))
    assert np.abs(y - x).max() <= ((1 << wb) - 1 + 0.5) / (1 << 15)


def test_wasted_bits_with_stereo_modes():
    t = np.arange(8192) / 16000.0
    x2 = np.stack([0.6 * np.sin(2 * np.pi * 440 * t),
                   0.3 * np.sin(2 * np.pi * 221 * t)], axis=1)
    for mode in ("mid_side", "left_side", "right_side"):
        y, _ = FL.decode_flac(FL.encode_flac(x2, stereo_mode=mode, wasted_bits=2))
        assert np.abs(y - x2).max() <= 7.5 / (1 << 15), mode
