"""Codec roundtrip + SNR unit tests (no Ray needed).

Mirrors the reference's declared-vs-actual family:
MisreportedContentType.java:118-174 (declared content type vs actual parse).
"""

import numpy as np
import pytest

from metrics_ray import audio


@pytest.mark.parametrize("codec", ["pcm_s16le", "flac", "mp3", "opus"])
def test_roundtrip_snr(codec):
    pcm = audio.synth_pcm(12345, 16000)
    payload = audio.encode(pcm, codec)
    actual, decoded = audio.decode(payload)
    assert actual == codec
    assert len(decoded) == len(pcm)
    s = audio.snr_db(pcm, decoded)
    assert s >= 30.0, f"{codec}: SNR {s}"


def test_lossless_codecs_exact():
    pcm = audio.synth_pcm(7, 8000)
    for codec in ("pcm_s16le", "flac"):
        _, decoded = audio.decode(audio.encode(pcm, codec))
        # int16 quantization only → within 1/32767
        assert np.max(np.abs(decoded - pcm)) <= 1.0 / 32767 + 1e-9


def test_detect_codec_mismatch():
    pcm = audio.synth_pcm(9, 4000)
    payload = audio.encode(pcm, "mp3")
    assert audio.detect_codec(payload) == "mp3"
    assert audio.detect_codec(payload) != "flac"


def test_truncated_payload_raises():
    pcm = audio.synth_pcm(11, 4000)
    for codec in ("pcm_s16le", "flac", "mp3", "opus"):
        payload = audio.encode(pcm, codec)
        body_len = max(3, (len(payload) - 4) // 2)
        if body_len % 2 == 0:
            body_len -= 1
        with pytest.raises(ValueError):
            audio.decode(payload[: 4 + body_len])


def test_unknown_magic_raises():
    with pytest.raises(ValueError):
        audio.decode(b"XXXX" + b"\x00" * 10)


def test_synth_deterministic():
    a = audio.synth_pcm(42, 1000)
    b = audio.synth_pcm(42, 1000)
    assert np.array_equal(a, b)
    c = audio.synth_pcm(43, 1000)
    assert not np.array_equal(a, c)
    # prefix property: longer synth extends shorter one
    long = audio.synth_pcm(42, 2000)
    assert np.array_equal(long[:1000], a)


def test_noise_breaks_snr():
    pcm = audio.synth_pcm(5, 8000)
    idx = np.arange(8000, dtype=np.float64)
    noisy = pcm + (0.2 * np.sin(2.0 * idx + 5)).astype(np.float32)
    payload = audio.encode(noisy, "pcm_s16le")
    _, decoded = audio.decode(payload)
    assert audio.snr_db(pcm, decoded) < 30.0


def test_clip_seed_stable():
    assert audio.clip_seed("clip-00000001") == audio.clip_seed("clip-00000001")
    assert audio.clip_seed("clip-00000001") != audio.clip_seed("clip-00000002")
