"""Audio transform stages (stages/audio_ops.py): chunking, resampling,
VAD/clipping profile, and sequence packing — golden invariants the SQL
oracle can't reach (payload bytes are Ray-only)."""

import numpy as np
import pyarrow as pa
import pytest

from metrics_ray import audio

pytestmark = pytest.mark.usefixtures("ray_session")


def _clips_table(specs):
    """specs: list of (clip_id, sr, dur_ms, codec, corrupt_fn|None)."""
    ids, payloads, srs = [], [], []
    for cid, sr, dur, codec, corrupt in specs:
        n = audio.n_samples_for(sr, dur)
        pcm = audio.synth_pcm(audio.clip_seed(cid), n)
        payload = audio.encode(pcm, codec)
        if corrupt:
            payload = corrupt(payload)
        ids.append(cid)
        payloads.append(payload)
        srs.append(sr)
    return pa.table({"clip_id": pa.array(ids, pa.string()),
                     "bytes": pa.array(payloads, pa.binary()),
                     "sr_hz": pa.array(np.asarray(srs, dtype="int32"))})


def _run_stage(table, stage):
    import ray
    import ray.data as rd

    ds = rd.from_arrow(table).map_batches(
        stage, batch_format="pyarrow", batch_size=2)
    tables = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    return (pa.concat_tables(tables) if tables
            else None)


# ------------------------------------------------------------------ chunker


def test_chunker_counts_and_payload_roundtrip():
    from metrics_ray.stages.audio_ops import AudioChunker

    # 2500 ms @ 8 kHz, 1000 ms windows → 3 chunks (1000, 1000, 500)
    t = _clips_table([("clip-chunk-a", 8000, 2500, "pcm_s16le", None)])
    out = _run_stage(t, AudioChunker(window_ms=1000)).sort_by("chunk_idx")
    assert out.column("chunk_idx").to_pylist() == [0, 1, 2]
    assert out.column("chunk_ms").to_pylist() == [1000, 1000, 500]
    assert out.column("start_ms").to_pylist() == [0, 1000, 2000]
    # chunks decode back to the exact PCM slices (pcm source → lossless)
    n = audio.n_samples_for(8000, 2500)
    full = audio.synth_pcm(audio.clip_seed("clip-chunk-a"), n)
    q = np.clip(np.rint(full * 32767.0), -32768, 32767) / 32767.0
    win = 8000
    for idx, payload in enumerate(out.column("bytes").to_pylist()):
        actual, pcm = audio.decode(payload)
        assert actual == "pcm_s16le"
        np.testing.assert_allclose(
            pcm, q[idx * win:(idx + 1) * win].astype(np.float32),
            atol=1.5 / 32767.0)


def test_chunker_transcodes_lossy_and_skips_undecodable():
    from metrics_ray.stages.audio_ops import AudioChunker

    t = _clips_table([
        ("clip-lossy", 16000, 1500, "opus", None),
        ("clip-bad", 16000, 1000, "flac", lambda p: p[:9]),  # truncated
    ])
    out = _run_stage(t, AudioChunker(window_ms=1000))
    ids = set(out.column("clip_id").to_pylist())
    assert ids == {"clip-lossy"}  # undecodable yields no chunks
    # every chunk is canonical pcm_s16le and SNR vs the opus-decoded
    # source slice is high (requantization only)
    _, src = audio.decode(_clips_table(
        [("clip-lossy", 16000, 1500, "opus", None)]).column("bytes")[0].as_py())
    win = 16000
    for idx, payload in sorted(
            zip(out.column("chunk_idx").to_pylist(),
                out.column("bytes").to_pylist())):
        actual, pcm = audio.decode(payload)
        assert actual == "pcm_s16le"
        ref = src[idx * win:(idx + 1) * win]
        assert audio.snr_db(ref, pcm) > 40.0


# ---------------------------------------------------------------- resampler


def test_resample_identity_is_lossless_for_pcm():
    from metrics_ray.stages.audio_ops import Resampler

    t = _clips_table([("clip-res-id", 16000, 700, "pcm_s16le", None)])
    out = _run_stage(t, Resampler(16_000))
    n = audio.n_samples_for(16000, 700)
    assert out.column("n_samples").to_pylist() == [n]
    _, src = audio.decode(t.column("bytes")[0].as_py())
    _, res = audio.decode(out.column("bytes")[0].as_py())
    np.testing.assert_array_equal(src, res)


def test_resample_length_and_fidelity():
    from metrics_ray.stages.audio_ops import Resampler

    t = _clips_table([("clip-res-dn", 48000, 500, "pcm_s16le", None)])
    out = _run_stage(t, Resampler(16_000))
    n_in = audio.n_samples_for(48000, 500)
    assert out.column("n_samples").to_pylist() == [round(n_in * 16000 / 48000)]
    assert out.column("sr_hz").to_pylist() == [16000]
    # linear interp of a smooth low-frequency signal: decimated output
    # must track the source at the matching sample positions
    _, src = audio.decode(t.column("bytes")[0].as_py())
    _, res = audio.decode(out.column("bytes")[0].as_py())
    np.testing.assert_allclose(res, src[::3][:len(res)], atol=0.02)


# ----------------------------------------------------------------- profiler


def _encode_pcm(x: np.ndarray) -> bytes:
    return audio.encode(x.astype(np.float32), "pcm_s16le")


def test_silence_profile_known_layout():
    from metrics_ray.stages.audio_ops import SilenceProfiler

    sr = 8000
    frame = audio.n_samples_for(sr, 20)
    # 10 frames loud, 5 silent, 10 loud, 2 silent, plus a half frame tail
    loud = 0.5 * np.ones(frame)
    quiet = np.zeros(frame)
    x = np.concatenate([np.tile(loud, 10), np.tile(quiet, 5),
                        np.tile(loud, 10), np.tile(quiet, 2),
                        0.5 * np.ones(frame // 2)])
    t = pa.table({"clip_id": pa.array(["c1"], pa.string()),
                  "bytes": pa.array([_encode_pcm(x)], pa.binary()),
                  "sr_hz": pa.array(np.asarray([sr], dtype="int32"))})
    out = _run_stage(t, SilenceProfiler(frame_ms=20))
    assert out.column("n_frames").to_pylist() == [27]  # tail dropped
    assert out.column("speech_ratio").to_pylist() == [pytest.approx(20 / 27)]
    assert out.column("longest_silence_ms").to_pylist() == [100]


def test_clipping_fraction_and_undecodable():
    from metrics_ray.stages.audio_ops import SilenceProfiler

    sr = 8000
    x = np.concatenate([np.ones(400), 0.5 * np.ones(600)])
    t = pa.table({
        "clip_id": pa.array(["clip-hot", "clip-dead"], pa.string()),
        "bytes": pa.array([_encode_pcm(x), b"????junk"], pa.binary()),
        "sr_hz": pa.array(np.asarray([sr, sr], dtype="int32"))})
    out = _run_stage(t, SilenceProfiler()).sort_by("clip_id")
    assert out.column("decode_ok").to_pylist() == [False, True]
    hot = out.filter(pa.compute.equal(out.column("clip_id"), "clip-hot"))
    assert hot.column("clipping_frac").to_pylist() == [pytest.approx(0.4)]


# ------------------------------------------------------------------ packing


def test_pack_clips_matches_manual_prefix_scan():
    import ray
    import ray.data as rd

    from metrics_ray.stages.audio_ops import pack_clips

    # partition 0: durations 900×4 in id order → prefix 0,900,1800,2700
    # cap 2000 → packs 0,0,0,1 at offsets 0,900,1800,700
    # partition 1: one zero-duration row is excluded
    t = pa.table({
        "partition": pa.array(np.asarray([0, 0, 0, 0, 1, 1], dtype="int32")),
        "clip_id": pa.array([f"c{i}" for i in range(6)], pa.string()),
        "dur_ms": pa.array(np.asarray([900, 900, 900, 900, -5, 300],
                                      dtype="int32")),
    })
    out = pack_clips(rd.from_arrow(t), cap_ms=2000)
    tables = [x for x in ray.get(out.to_arrow_refs()) if x.num_rows]
    got = (pa.concat_tables(tables).to_pandas()
           .sort_values(["partition", "clip_id"]).reset_index(drop=True))
    assert got["clip_id"].tolist() == ["c0", "c1", "c2", "c3", "c5"]
    assert got["pack_id"].tolist() == [0, 0, 0, 1, 0]
    assert got["offset_ms"].tolist() == [0, 900, 1800, 700, 0]


# -------------------------------------------------------------- gain

def test_gain_normalizer_hits_target_rms():
    import numpy as np
    import pyarrow as pa

    from metrics_ray import audio
    from metrics_ray.stages.audio_ops import GainNormalizer, TARGET_RMS

    # quiet signal: normalization reaches the target exactly (no peak cap)
    pcm = (0.01 * np.sin(0.05 * np.arange(8000))).astype(np.float32)
    batch = pa.table({"clip_id": pa.array(["a"], pa.string()),
                      "bytes": pa.array([audio.encode(pcm, "pcm_s16le")],
                                        pa.binary())})
    out = GainNormalizer()(batch)
    assert out.num_rows == 1
    assert abs(out.column("rms_out")[0].as_py() - TARGET_RMS) < 1e-3
    # round-trip: the emitted payload really is the gained signal
    _, dec = audio.decode(out.column("bytes")[0].as_py())
    assert abs(float(np.sqrt(np.mean(dec.astype(np.float64) ** 2)))
               - TARGET_RMS) < 1e-3


def test_gain_normalizer_peak_cap_prevents_clipping():
    import numpy as np
    import pyarrow as pa

    from metrics_ray import audio
    from metrics_ray.stages.audio_ops import GainNormalizer, PEAK_CEIL

    # spiky signal: low RMS but peak near full scale -> gain is peak-capped
    pcm = np.zeros(8000, dtype=np.float32)
    pcm[::400] = 0.9
    batch = pa.table({"clip_id": pa.array(["spiky"], pa.string()),
                      "bytes": pa.array([audio.encode(pcm, "pcm_s16le")],
                                        pa.binary())})
    out = GainNormalizer()(batch)
    _, dec = audio.decode(out.column("bytes")[0].as_py())
    assert float(np.max(np.abs(dec))) <= PEAK_CEIL + 1e-3
    # capped -> rms_out falls short of the target
    assert out.column("rms_out")[0].as_py() < 0.25


def test_gain_normalizer_drops_undecodable_and_silent():
    import numpy as np
    import pyarrow as pa

    from metrics_ray import audio
    from metrics_ray.stages.audio_ops import GainNormalizer

    silent = np.zeros(100, dtype=np.float32)
    batch = pa.table({
        "clip_id": pa.array(["bad", "silent"], pa.string()),
        "bytes": pa.array([b"XXXXgarbage",
                           audio.encode(silent, "pcm_s16le")], pa.binary()),
    })
    out = GainNormalizer()(batch)
    assert out.num_rows == 0


# ---------------------------------------------------- acoustic near-dup

def test_audio_neardup_finds_exactly_the_same_signal_pairs(ray_session):
    """Recall: every seeded transcoded replica pairs with its base.
    Precision: every reported pair is the same signal at PCM level
    (same length, cosine >= 0.999) — verified by decoding both members."""
    import re

    import numpy as np
    import pyarrow.parquet as pq

    from metrics_ray import audio
    from metrics_ray.pipelines.clips import ensure_clips_parquet
    from metrics_ray.pipelines.queries import (
        ACOUSTIC_MOD,
        ACOUSTIC_RES,
        _acoustic_corpus_batch,
        q_audio_neardup,
    )

    SF = "/root/testdata/sf0.001"
    t = q_audio_neardup(SF)
    got = set(zip(t.column("clip_a").to_pylist(),
                  t.column("clip_b").to_pylist()))
    assert got, "no acoustic pairs found"

    clips = pq.read_table(ensure_clips_parquet(SF),
                          columns=["clip_id", "bytes"])
    expected = set()
    for cid, pay in zip(clips.column("clip_id").to_pylist(),
                        clips.column("bytes").to_pylist()):
        m = re.fullmatch(r"clip-(\d{8})", cid)
        if not m or int(m.group(1)) % ACOUSTIC_MOD != ACOUSTIC_RES:
            continue
        try:
            _, pcm = audio.decode(pay)
        except (ValueError, TypeError):
            continue
        if len(pcm):
            expected.add(tuple(sorted(
                (cid, f"clip-8{int(m.group(1)) % 10_000_000:07d}"))))
    assert expected, "fixture seeded no transcode pairs"
    assert expected <= got  # full recall of the seeded pair set

    ac = _acoustic_corpus_batch(clips)
    id2pay = dict(zip(ac.column("clip_id").to_pylist(),
                      ac.column("bytes").to_pylist()))
    for a, b in got:
        _, xa = audio.decode(id2pay[a])
        _, xb = audio.decode(id2pay[b])
        assert len(xa) == len(xb), (a, b)
        cos = float(np.dot(xa, xb)
                    / (np.linalg.norm(xa) * np.linalg.norm(xb)))
        assert cos >= 0.999, (a, b, cos)
    # the only non-seeded pairs are the byte-identical content-dup family
    for a, b in got - expected:
        assert b.startswith("clip-9") or a.startswith("clip-9"), (a, b)


def test_audio_knn_replicas_retrieve_their_base(ray_session):
    """Audio similarity search: every seeded transcoded replica's nearest
    neighbor (by spectral-embedding cosine) is its base clip, at
    cosine ~ 1 — the decode -> featurize -> normalize -> search path."""
    from metrics_ray.pipelines.queries import q_audio_knn

    t = q_audio_knn("/root/testdata/sf0.001").to_pandas()
    assert len(t) > 0, "no replica queries embedded"
    for _, r in t.iterrows():
        base = f"clip-{int(r.query_id[6:]):08d}"
        assert r.neighbor_id == base, (r.query_id, r.neighbor_id)
        assert r.cos >= 0.9999, (r.query_id, r.cos)


# ------------------------------------------------------------ speed perturb

def test_speed_perturb_lengths_and_interpolation():
    from metrics_ray.stages.audio_ops import SpeedPerturb, speed_n_out

    sr, dur = 8000, 1000  # n = 8000 samples
    t = _clips_table([("clip-speed-a", sr, dur, "pcm_s16le", None)])
    out = _run_stage(t, SpeedPerturb()).sort_by("speed_pct")
    assert out.column("speed_pct").to_pylist() == [90, 110]
    n = audio.n_samples_for(sr, dur)
    # speed 0.9 stretches (round(10n/9)), 1.1 compresses (round(10n/11))
    assert out.column("n_samples").to_pylist() == [
        speed_n_out(n, 9, 10), speed_n_out(n, 11, 10)]
    # payload decodes to exactly np.interp of the quantized source PCM
    src = audio.synth_pcm(audio.clip_seed("clip-speed-a"), n)
    q = (np.clip(np.rint(src * 32767.0), -32768, 32767) / 32767.0)
    for row, (num, den) in zip(range(2), ((9, 10), (11, 10))):
        _, pcm = audio.decode(out.column("bytes")[row].as_py())
        n_out = speed_n_out(n, num, den)
        pos = np.arange(n_out, dtype=np.float64) * (num / den)
        ref = np.interp(pos, np.arange(n, dtype=np.float64), q)
        assert len(pcm) == n_out
        np.testing.assert_allclose(pcm, ref.astype(np.float32),
                                   atol=1.5 / 32767.0)


def test_speed_n_out_matches_exact_rounding():
    from metrics_ray.stages.audio_ops import speed_n_out
    from fractions import Fraction

    for n in list(range(1, 200)) + [7993, 8000, 44100, 123457]:
        for num, den in ((9, 10), (11, 10), (3, 4), (5, 4)):
            exact = Fraction(n * den, num)
            # round half UP (ties away from zero on positives)
            want = (exact.numerator * 2 + exact.denominator) // (
                2 * exact.denominator)
            assert speed_n_out(n, num, den) == want, (n, num, den)


def test_speed_perturb_skips_undecodable_and_bad_sr():
    from metrics_ray.stages.audio_ops import SpeedPerturb

    t = _clips_table([
        ("clip-speed-ok", 8000, 500, "flac", None),
        ("clip-speed-trunc", 8000, 500, "opus", lambda p: p[:7]),
    ])
    # third row: sr <= 0
    t2 = pa.table({
        "clip_id": pa.array(t.column("clip_id").to_pylist() + ["clip-speed-sr0"]),
        "bytes": pa.array(t.column("bytes").to_pylist() + [
            audio.encode(np.zeros(100, np.float32) + 0.5, "pcm_s16le")]),
        "sr_hz": pa.array(np.asarray([8000, 8000, 0], dtype="int32")),
    })
    out = _run_stage(t2, SpeedPerturb())
    assert sorted(set(out.column("clip_id").to_pylist())) == ["clip-speed-ok"]
    assert out.num_rows == 2


# -------------------------------------------------------------- noise mixing

def test_noisemix_hits_target_snr_exactly():
    from metrics_ray.stages.audio_ops import NoiseMix

    sr, dur = 16000, 800
    t = _clips_table([("clip-noise-a", sr, dur, "pcm_s16le", None)])
    out = _run_stage(t, NoiseMix()).sort_by("snr_db")
    assert out.column("snr_db").to_pylist() == [5, 20]
    n = audio.n_samples_for(sr, dur)
    assert out.column("n_samples").to_pylist() == [n, n]
    src = audio.synth_pcm(audio.clip_seed("clip-noise-a"), n)
    q = np.clip(np.rint(src * 32767.0), -32768, 32767) / 32767.0
    noise = audio.synth_pcm(audio.clip_seed("clip-noise-a#noise"), n)
    for row, snr in ((0, 5), (1, 20)):
        _, mixed = audio.decode(out.column("bytes")[row].as_py())
        # reconstruct the exact mix from the documented recipe
        x = q.astype(np.float64)
        rms_sig = np.sqrt(np.mean(x * x))
        nn = noise.astype(np.float64)
        gain = rms_sig / (np.sqrt(np.mean(nn * nn)) * 10.0 ** (snr / 20.0))
        ref = np.clip(x + gain * nn, -1.0, 1.0)
        np.testing.assert_allclose(mixed, ref.astype(np.float32),
                                   atol=1.5 / 32767.0)
        # achieved SNR (pre-clip) equals the target to float precision
        err = gain * nn
        achieved = 10.0 * np.log10(np.mean(x * x) / np.mean(err * err))
        assert abs(achieved - snr) < 1e-9


def test_noisemix_noise_is_reproducible_and_per_clip():
    from metrics_ray.stages.audio_ops import NoiseMix

    t = _clips_table([("clip-noise-b", 8000, 300, "flac", None),
                      ("clip-noise-c", 8000, 300, "flac", None)])
    out1 = _run_stage(t, NoiseMix()).sort_by("clip_id")
    out2 = _run_stage(t, NoiseMix()).sort_by("clip_id")
    assert out1.column("bytes").to_pylist() == out2.column("bytes").to_pylist()
    # different clips get different noise: the 5 dB variants differ
    b = {(r["clip_id"], r["snr_db"]): r["bytes"] for r in out1.to_pylist()}
    assert b[("clip-noise-b", 5)] != b[("clip-noise-c", 5)]


def test_noisemix_skips_undecodable():
    from metrics_ray.stages.audio_ops import NoiseMix

    t = _clips_table([
        ("clip-noise-ok", 8000, 300, "mp3", None),
        ("clip-noise-bad", 8000, 300, "opus", lambda p: p[:7]),
    ])
    out = _run_stage(t, NoiseMix())
    assert sorted(set(out.column("clip_id").to_pylist())) == ["clip-noise-ok"]
    assert out.num_rows == 2


# ----------------------------------------------------------------- time mask


def test_timemask_zeroes_exact_span_and_preserves_rest():
    from metrics_ray.sketches import md5_lower64
    from metrics_ray.stages.audio_ops import MASK_PCT, TimeMask

    t = _clips_table([("clip-mask-a", 8000, 500, "pcm_s16le", None)])
    out = _run_stage(t, TimeMask())
    assert out.num_rows == 1
    row = out.to_pylist()[0]
    n = audio.n_samples_for(8000, 500)
    assert row["n_samples"] == n
    mlen = min(max(1, n * MASK_PCT // 100), n)
    start = int(md5_lower64(["clip-mask-a#mask"])[0] % np.uint64(n - mlen + 1))
    assert row["mask_len"] == mlen
    assert row["mask_start"] == start
    _, y = audio.decode(row["bytes"])
    assert len(y) == n
    # masked span is exactly zero
    assert np.all(y[start:start + mlen] == 0.0)
    # remainder matches the s16-quantized source to 1 LSB
    src = audio.synth_pcm(audio.clip_seed("clip-mask-a"), n)
    keep = np.ones(n, dtype=bool)
    keep[start:start + mlen] = False
    np.testing.assert_allclose(y[keep], src[keep], atol=1.5 / 32767.0)


def test_timemask_skips_undecodable_and_bad_sr():
    from metrics_ray.stages.audio_ops import TimeMask

    t = _clips_table([
        ("clip-mask-ok", 8000, 300, "flac", None),
        ("clip-mask-bad", 8000, 300, "opus", lambda p: p[:7]),
    ])
    t2 = pa.table({"clip_id": pa.array(t.column("clip_id").to_pylist()),
                   "bytes": t.column("bytes"),
                   "sr_hz": pa.array(np.asarray([8000, 0], dtype="int32"))})
    out = _run_stage(t2, TimeMask())
    assert out.column("clip_id").to_pylist() == ["clip-mask-ok"]
