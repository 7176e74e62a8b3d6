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


def test_codec_registry_third_codec_seam(ray_session):
    """Registering a NEW codec (the ffmpeg/soundfile drop-in seam) makes
    encode/decode/detect, DecodeCheck's full corruption taxonomy AND
    PayloadSizeCheck's registry-driven size triage work with zero edits
    outside audio.py."""
    import numpy as np
    import pyarrow as pa

    from metrics_ray import audio
    from metrics_ray.checks.base import CheckContext
    from metrics_ray.checks.decode import DecodeCheck, PayloadSizeCheck

    # 8-bit signed fixed-rate codec, 1 B/sample (deliberately NOT 2 to
    # prove PayloadSizeCheck reads the rate from the registry)
    def enc(pcm):
        return np.clip(np.rint(pcm * 127.0), -128, 127).astype(
            "<i1").tobytes()

    def dec(body):
        if len(body) == 0:
            raise ValueError("empty pcm8 body")
        return np.frombuffer(body, dtype="<i1").astype(np.float32) / 127.0

    audio.register_codec(audio.Codec(
        "pcm8", b"PCM8", enc, dec, bytes_per_sample=1))
    try:
        sr, dur = 8000, 250
        n = audio.n_samples_for(sr, dur)
        cid = "clip-7777"
        pcm = audio.synth_pcm(audio.clip_seed(cid), n)
        payload = audio.encode(pcm, "pcm8")
        assert audio.detect_codec(payload) == "pcm8"
        name, back = audio.decode(payload)
        assert name == "pcm8" and audio.snr_db(pcm, back) >= 30.0

        batch = pa.table({
            "clip_id": pa.array([cid, "clip-7778", "clip-7779"]),
            "bytes": pa.array(
                [payload,
                 payload[:4] + payload[4:-3],   # truncated: size mismatch
                 b"PCM8"],                      # empty body: decode error
                pa.binary()),
            "sr_hz": pa.array([sr] * 3, pa.int32()),
            "dur_ms": pa.array([dur] * 3, pa.int32()),
            "codec": pa.array(["pcm8"] * 3),
            "partition": pa.array([0, 0, 0], pa.int32()),
        })

        dc = DecodeCheck()
        dc.setup(CheckContext())
        out = dc.evaluate(batch)
        codes: dict = {}
        for c, k in zip(out.violations.column("clip_id").to_pylist(),
                        out.violations.column("code").to_pylist()):
            codes.setdefault(c, set()).add(k)
        assert codes.get("clip-7779") == {"DecodeError"}
        assert "DurationMismatch" in codes.get("clip-7778", set())
        assert cid not in codes  # clean row passes the full taxonomy

        ps = PayloadSizeCheck()
        ps.setup(CheckContext())
        out2 = ps.evaluate(batch)
        v2 = out2.violations
        ids2 = v2.column("clip_id").to_pylist()
        # 1 B/sample triage: truncated and empty bodies flagged, clean not
        assert set(ids2) == {"clip-7778", "clip-7779"}
        assert "1 B/sample" in v2.column("expected").to_pylist()[0]
    finally:
        audio.unregister_codec("pcm8")


def test_codec_registry_reaches_ray_workers(ray_session):
    """The registry is per-process: a driver-side register_codec must
    travel WITH the checks into Ray worker processes (snapshot in
    __init__, apply_codec_snapshot in setup) — otherwise every payload of
    the registered codec would be a spurious DECODE_ERROR in the
    distributed path even though the in-process seam test passes."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from metrics_ray import audio
    from metrics_ray.checks.decode import DecodeCheck, PayloadSizeCheck
    from metrics_ray.runner import run_batch_checks

    def enc(pcm):
        return np.clip(np.rint(pcm * 127.0), -128, 127).astype(
            "<i1").tobytes()

    def dec(body):
        if len(body) == 0:
            raise ValueError("empty pcm8 body")
        return np.frombuffer(body, dtype="<i1").astype(np.float32) / 127.0

    audio.register_codec(audio.Codec(
        "pcm8", b"PCM8", enc, dec, bytes_per_sample=1))
    try:
        sr, dur = 8000, 250
        n = audio.n_samples_for(sr, dur)
        rows = []
        for i in range(40):
            cid = f"clip-{7000 + i:08d}"
            pcm = audio.synth_pcm(audio.clip_seed(cid), n)
            rows.append((cid, audio.encode(pcm, "pcm8")))
        # one truncated row: must be flagged by BOTH checks, worker-side
        rows.append(("clip-00007777",
                     audio.encode(audio.synth_pcm(
                         audio.clip_seed("clip-00007777"), n), "pcm8")[:-3]))
        t = pa.table({
            "clip_id": pa.array([r[0] for r in rows]),
            "bytes": pa.array([r[1] for r in rows], pa.binary()),
            "sr_hz": pa.array([sr] * len(rows), pa.int32()),
            "dur_ms": pa.array([dur] * len(rows), pa.int32()),
            "codec": pa.array(["pcm8"] * len(rows)),
            "partition": pa.array([i % 2 for i in range(len(rows))],
                                  pa.int32()),
        })
        # IMPORTANT: checks constructed AFTER register_codec (driver
        # snapshot); actors force genuinely separate worker processes
        checks = [DecodeCheck(snr_threshold=-1000.0), PayloadSizeCheck()]
        viol, counters, _ = run_batch_checks(
            rd.from_arrow(t), checks, batch_size=8, concurrency=2,
            use_actors=True)
        v = viol.to_pandas()
        bad = v[v.clip_id == "clip-00007777"]
        # the 3-byte-truncated int8 body still DECODES (shorter), so the
        # worker-side flags are the duration and size mismatches — which
        # proves decode ran with the registered codec (an unregistered
        # worker would report DecodeError on EVERY pcm8 row instead)
        assert set(bad.code) >= {"DurationMismatch", "SizeMismatch"}
        # all clean pcm8 rows decoded fine in the workers
        assert set(v.clip_id) == {"clip-00007777"}
        assert "1 B/sample" in bad[bad.code == "SizeMismatch"
                                   ].expected.iloc[0]
    finally:
        audio.unregister_codec("pcm8")


def test_codec_snapshot_reset_semantics():
    """apply_codec_snapshot makes the process registry EQUAL the
    snapshot (reset, not merge): stale codecs from a previous pipeline
    must not survive in warm workers, and MAGIC's Mapping view must
    reflect the live registry under every idiom."""
    import numpy as np

    from metrics_ray import audio

    baseline = audio.codec_snapshot()
    audio.register_codec(audio.Codec(
        "pcm8", b"PCM8", lambda p: b"", lambda b: np.zeros(0, np.float32),
        bytes_per_sample=1))
    try:
        with_extra = audio.codec_snapshot()
        assert "pcm8" in audio.MAGIC and dict(audio.MAGIC)["pcm8"] == b"PCM8"
        # a snapshot captured WITHOUT the codec resets the registry
        audio.apply_codec_snapshot(baseline)
        assert "pcm8" not in audio.MAGIC
        assert audio.detect_codec(b"PCM8xxxx") is None
        # and re-applying the richer snapshot restores it
        audio.apply_codec_snapshot(with_extra)
        assert audio.MAGIC.get("pcm8") == b"PCM8"
        assert len(audio.MAGIC) == len(baseline) + 1
    finally:
        audio.apply_codec_snapshot(baseline)


def test_codec_registry_joins_checkpoint_fingerprint():
    """A resume under a DIFFERENT codec registry must refuse: the
    checks' public codec_config joins the param digest even though the
    raw snapshot (function objects) is excluded."""
    import numpy as np

    from metrics_ray import audio
    from metrics_ray.checks.decode import DecodeCheck
    from metrics_ray.state.checkpoint import _check_param_digest

    d0 = _check_param_digest(DecodeCheck())
    assert d0 == _check_param_digest(DecodeCheck())  # process-stable
    audio.register_codec(audio.Codec(
        "pcm8", b"PCM8", lambda p: b"", lambda b: np.zeros(0, np.float32),
        bytes_per_sample=1))
    try:
        assert _check_param_digest(DecodeCheck()) != d0
    finally:
        audio.unregister_codec("pcm8")
    assert _check_param_digest(DecodeCheck()) == d0
