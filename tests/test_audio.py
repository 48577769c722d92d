"""Audio branch (operators/audio): WAV parse/decode round-trips, metadata
kernel containment, RMS-envelope features."""

from __future__ import annotations

import numpy as np
import pytest

from autoextract.operators import audio as A


def _tone(freq=440.0, seconds=0.25, rate=8000):
    t = np.arange(int(seconds * rate)) / rate
    return np.sin(2 * np.pi * freq * t) * 0.5


def test_wav_roundtrip_16bit():
    x = _tone()
    b = A.make_wav(x, sample_rate=8000, bits=16)
    y, rate = A.decode_wav(b)
    assert rate == 8000 and y.shape == (len(x), 1)
    assert np.abs(y[:, 0] - x).max() < 1e-3  # 16-bit quantization only


def test_wav_roundtrip_8bit_and_stereo():
    x = np.stack([_tone(440), _tone(880)], axis=1)
    y, rate = A.decode_wav(A.make_wav(x, sample_rate=8000, bits=8))
    assert y.shape == x.shape
    assert np.abs(y - x).max() < 2e-2  # 8-bit quantization


def test_header_facts():
    b = A.make_wav(_tone(seconds=0.5, rate=16000), sample_rate=16000)
    h = A.parse_wav_header(b)
    assert h["sample_rate"] == 16000
    assert h["n_channels"] == 1
    assert h["bits_per_sample"] == 16
    assert h["n_frames"] == 8000


def test_garbage_raises():
    with pytest.raises(A.WavError):
        A.parse_wav_header(b"RIFFxxxxNOPE")
    with pytest.raises(A.WavError):
        A.decode_wav(b"")


def test_decode_audio_meta_kernel(spark):
    good = A.make_wav(_tone(seconds=0.5, rate=16000), sample_rate=16000)
    media = spark.createDataFrame(
        [("a", good), ("junk", b"not audio")], ["media_ref", "payload"]
    )
    rows = {r["media_ref"]: r for r in A.decode_audio_meta(media).collect()}
    assert rows["a"]["valid"] and rows["a"]["sample_rate"] == 16000
    assert abs(rows["a"]["duration_s"] - 0.5) < 1e-9
    assert not rows["junk"]["valid"]


def test_embed_audio_envelope_similarity(spark):
    """Same clip + tiny noise → cosine ≈ 1; a clip with a silent half has a
    visibly different envelope."""
    rng = np.random.RandomState(4)
    base = _tone(seconds=0.5)
    near = base + rng.randn(len(base)) * 1e-3
    gated = base.copy()
    gated[: len(gated) // 2] = 0.0
    media = spark.createDataFrame(
        [
            ("base", A.make_wav(base)),
            ("near", A.make_wav(near)),
            ("gated", A.make_wav(gated)),
        ],
        ["media_ref", "payload"],
    )
    vecs = {r["media_ref"]: np.array(r["embedding"]) for r in A.embed_audio(media).collect()}
    cos = lambda a, b: float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert cos(vecs["base"], vecs["near"]) > 0.999
    assert cos(vecs["base"], vecs["gated"]) < 0.9
    assert len(vecs["base"]) == 16


def test_transcode_wav_resamples_and_monos(spark):
    """The audio normalizer: 48k stereo → 16k mono 16-bit; a pure tone
    survives resampling with its frequency intact (zero-crossing count),
    and junk passes through byte-identical with transcoded=false."""
    t = np.arange(int(48000 * 0.25)) / 48000.0
    tone = 0.5 * np.sin(2 * np.pi * 440.0 * t)
    stereo = np.stack([tone, tone * 0.25], axis=1)
    media = spark.createDataFrame(
        [("s", A.make_wav(stereo, sample_rate=48000)), ("junk", b"nope")],
        ["media_ref", "payload"],
    )
    rows = {r["media_ref"]: r for r in A.transcode_wav(media, 16000).collect()}
    assert rows["junk"]["transcoded"] is False
    assert bytes(rows["junk"]["payload"]) == b"nope"
    out = rows["s"]
    assert out["transcoded"] and out["out_rate"] == 16000 and out["out_channels"] == 1
    y, rate = A.decode_wav(bytes(out["payload"]))
    assert rate == 16000 and y.shape[1] == 1
    assert abs(y.shape[0] - 16000 * 0.25) <= 1
    # frequency preserved: a 440 Hz tone crosses zero ~2*440*0.25 times
    zc = int(np.sum(np.abs(np.diff(np.signbit(y[:, 0]).astype(int)))))
    assert abs(zc - 2 * 440 * 0.25) <= 4
    # mono mix: amplitude ≈ (0.5 + 0.125) / 2
    assert abs(np.abs(y).max() - 0.3125) < 0.02


def test_resample_identity_and_endpoints():
    x = np.linspace(-1, 1, 100)[:, None]
    same = A.resample_audio(x, 16000, 16000)
    assert np.array_equal(same, x)
    up = A.resample_audio(x, 8000, 16000)
    assert up.shape[0] == 200
    assert abs(up[0, 0] - x[0, 0]) < 1e-12 and abs(up[-1, 0] - x[-1, 0]) < 1e-12


def test_embed_audio_real_feature_flag(spark):
    """Decoded WAVs are flagged real; undecodable payloads carry
    real_feature=false so similarity pipelines can drop the hash stubs."""
    media = spark.createDataFrame(
        [("wav", A.make_wav(_tone(seconds=0.1))), ("junk", b"not audio")],
        ["media_ref", "payload"],
    )
    flags = {r["media_ref"]: r["real_feature"] for r in A.embed_audio(media).collect()}
    assert flags == {"wav": True, "junk": False}


def _riff(fmt_payload: bytes, data_payload: bytes) -> bytes:
    import struct
    body = b"WAVE"
    body += b"fmt " + struct.pack("<I", len(fmt_payload)) + fmt_payload
    body += b"data" + struct.pack("<I", len(data_payload)) + data_payload
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _fmt(af=1, ch=1, rate=16000, bits=16) -> bytes:
    import struct
    block = max(ch * bits // 8, 1)
    return struct.pack("<HHIIHH", af, ch, rate, rate * block, block, bits)


def test_malformed_riff_containment(spark):
    """O6 containment (ADVICE r4): malformed-but-RIFF payloads — odd-length
    16-bit data chunk, zero-channel fmt, zero-rate fmt — must emit
    transcoded=false / valid=false rows, never fail the task."""
    odd_data = _riff(_fmt(bits=16), b"\x01\x02\x03")         # 3 bytes, itemsize 2
    zero_ch = _riff(_fmt(ch=0), b"\x00" * 64)
    zero_rate = _riff(_fmt(rate=0), b"\x00" * 64)
    good = A.make_wav(np.zeros(800), sample_rate=8000)
    media = spark.createDataFrame(
        [("m-odd", bytearray(odd_data)), ("m-ch0", bytearray(zero_ch)),
         ("m-r0", bytearray(zero_rate)), ("m-ok", bytearray(good))],
        "media_ref string, payload binary",
    )
    t = {r["media_ref"]: r for r in A.transcode_wav(media).collect()}
    assert t["m-ok"]["transcoded"] is True
    # odd data chunk is a truncated final sample: lenient decode is fine,
    # the contract is only "no task failure" + payload survives either way
    for ref in ("m-ch0", "m-r0"):
        assert t[ref]["transcoded"] is False
        assert bytes(t[ref]["payload"]) == {"m-ch0": zero_ch, "m-r0": zero_rate}[ref]
    m = {r["media_ref"]: r for r in A.decode_audio_meta(media).collect()}
    assert m["m-ok"]["valid"] is True
    assert m["m-ch0"]["valid"] is False and m["m-r0"]["valid"] is False
    e = {r["media_ref"]: r for r in A.embed_audio(media).collect()}
    assert e["m-ok"]["real_feature"] is True
    assert e["m-ch0"]["real_feature"] is False  # hash-stub fallback fired
    assert len(e["m-ch0"]["embedding"]) == 16
