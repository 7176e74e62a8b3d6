"""Audio transform stages over the binary payload column — the multimodal
operator family (decode / window / resample / profile / pack) expressed as
Ray Data ``map_batches`` stages.

Reference parity: the reference's decode-and-verify family validates payloads
(``MisreportedContentType.java:118-174``); a *training-data* engine must also
TRANSFORM them. These stages are that surface, built on the same deterministic
fake codecs (metrics_ray.audio — container has no real audio libs; the DSP on
decoded PCM is real numpy):

  AudioChunker     fixed-window segmentation + canonical transcode: each clip
                   → ceil(n/window) chunks re-encoded pcm_s16le (the
                   frame-sample / video-chunk pattern with real byte output).
  Resampler        sample-rate conversion via linear interpolation
                   (numpy.interp), canonical pcm_s16le output.
  SilenceProfiler  frame-energy VAD profile: speech ratio, longest silence
                   run, clipping fraction — the audio-quality scoring analog
                   of the text quality bank (functions/text.py).
  pack_clips       concat-then-chunk sequence packing over METADATA ONLY:
                   deterministic pack assignment (pack_id, offset_ms) from the
                   per-partition prefix sum of dur_ms in clip_id order — the
                   training-example packing step, SQL-oracle-verifiable.

Scale notes: payload bytes never leave the stage that reads them (chunk rows
carry only window-sized payloads; profiles are narrow scalar rows). The
stages are callable classes for ``map_batches(Cls, concurrency=N)`` actor
pools; defaults run the task path (round-1 measurement: task + per-process
cache beats actor pools for cheap ``__init__``). pack_clips shuffles only
(partition, clip_id, dur_ms) — the prefix scan is per-partition-sequential by
construction (each bucket's fold is vectorized cumsum), parallel across
partitions, which at the 10^12-clip design point number in the millions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .. import audio

CHUNK_MS = 1_000
FRAME_MS = 20
SILENCE_RMS = 0.05
CLIP_LEVEL = 0.999
PACK_CAP_MS = 30_000

CHUNK_SCHEMA = pa.schema([
    ("clip_id", pa.string()),
    ("chunk_idx", pa.int32()),
    ("start_ms", pa.int64()),
    ("chunk_ms", pa.int64()),
    ("sr_hz", pa.int32()),
    ("bytes", pa.binary()),
])


class AudioChunker:
    """clips (clip_id, bytes, sr_hz) → chunk rows, window_ms per chunk, last
    partial chunk kept. Output payloads are canonical pcm_s16le regardless of
    the source codec (transcode fused into the windowing pass — one decode).
    Undecodable payloads yield no chunks (they are the decode check's
    violation, not this stage's failure)."""

    columns = ("clip_id", "bytes", "sr_hz")

    def __init__(self, window_ms: int = CHUNK_MS):
        self.window_ms = int(window_ms)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("clip_id").to_pylist()
        payloads = batch.column("bytes").to_pylist()
        srs = batch.column("sr_hz").to_numpy(zero_copy_only=False)
        out = {k: [] for k in CHUNK_SCHEMA.names}
        for cid, payload, sr in zip(ids, payloads, srs):
            sr = int(sr)
            if sr <= 0:
                continue
            try:
                _, pcm = audio.decode(payload)
            except (ValueError, TypeError):
                continue
            win = audio.n_samples_for(sr, self.window_ms)
            if win <= 0 or len(pcm) == 0:
                continue
            for idx, s in enumerate(range(0, len(pcm), win)):
                piece = pcm[s:s + win]
                out["clip_id"].append(cid)
                out["chunk_idx"].append(idx)
                out["start_ms"].append(int(round(s * 1000.0 / sr)))
                out["chunk_ms"].append(int(round(len(piece) * 1000.0 / sr)))
                out["sr_hz"].append(sr)
                out["bytes"].append(audio.encode(piece, "pcm_s16le"))
        return pa.table(
            {n: pa.array(out[n], CHUNK_SCHEMA.field(n).type)
             for n in CHUNK_SCHEMA.names})


def resample_pcm(pcm: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Linear-interpolation sample-rate conversion; identity when rates
    match (no requantization loss)."""
    if sr_in == sr_out or len(pcm) == 0:
        return pcm
    n_out = int(round(len(pcm) * sr_out / sr_in))
    # output sample i sits at source position i * sr_in / sr_out
    pos = np.arange(n_out, dtype=np.float64) * (sr_in / sr_out)
    return np.interp(pos, np.arange(len(pcm), dtype=np.float64),
                     pcm.astype(np.float64)).astype(np.float32)


RESAMPLE_SCHEMA = pa.schema([
    ("clip_id", pa.string()),
    ("sr_hz", pa.int32()),
    ("n_samples", pa.int64()),
    ("bytes", pa.binary()),
])


class Resampler:
    """clips (clip_id, bytes, sr_hz) → payload resampled to ``target_sr``
    by linear interpolation, canonical pcm_s16le. Identity when the source
    rate already matches (no requantization loss on pcm/flac sources).
    Undecodable or sr<=0 rows are dropped (decode check's problem)."""

    columns = ("clip_id", "bytes", "sr_hz")

    def __init__(self, target_sr: int = 16_000):
        self.target_sr = int(target_sr)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("clip_id").to_pylist()
        payloads = batch.column("bytes").to_pylist()
        srs = batch.column("sr_hz").to_numpy(zero_copy_only=False)
        out = {k: [] for k in RESAMPLE_SCHEMA.names}
        for cid, payload, sr in zip(ids, payloads, srs):
            sr = int(sr)
            if sr <= 0:
                continue
            try:
                _, pcm = audio.decode(payload)
            except (ValueError, TypeError):
                continue
            res = resample_pcm(pcm, sr, self.target_sr)
            out["clip_id"].append(cid)
            out["sr_hz"].append(self.target_sr)
            out["n_samples"].append(len(res))
            out["bytes"].append(audio.encode(res, "pcm_s16le"))
        return pa.table(
            {n: pa.array(out[n], RESAMPLE_SCHEMA.field(n).type)
             for n in RESAMPLE_SCHEMA.names})


PROFILE_SCHEMA = pa.schema([
    ("clip_id", pa.string()),
    ("decode_ok", pa.bool_()),
    ("n_frames", pa.int64()),
    ("speech_ratio", pa.float64()),
    ("longest_silence_ms", pa.int64()),
    ("clipping_frac", pa.float64()),
])


class SilenceProfiler:
    """clips → per-clip VAD/quality profile rows: fraction of ``frame_ms``
    frames whose RMS >= ``silence_rms`` (speech_ratio), the longest
    consecutive silent run in ms, and the fraction of samples at or above
    ``clip_level`` (digital clipping). Trailing partial frames are dropped
    from the frame stats (standard frame-based VAD convention)."""

    columns = ("clip_id", "bytes", "sr_hz")

    def __init__(self, frame_ms: int = FRAME_MS,
                 silence_rms: float = SILENCE_RMS,
                 clip_level: float = CLIP_LEVEL):
        self.frame_ms = int(frame_ms)
        self.silence_rms = float(silence_rms)
        self.clip_level = float(clip_level)

    def _profile(self, pcm: np.ndarray, sr: int) -> dict:
        x = pcm.astype(np.float64)
        clipping = float(np.mean(np.abs(x) >= self.clip_level)) if len(x) else 0.0
        frame = audio.n_samples_for(sr, self.frame_ms)
        n_frames = len(x) // frame if frame > 0 else 0
        if n_frames == 0:
            return dict(n_frames=0, speech_ratio=0.0,
                        longest_silence_ms=0, clipping_frac=clipping)
        f = x[: n_frames * frame].reshape(n_frames, frame)
        rms = np.sqrt(np.mean(f * f, axis=1))
        silent = rms < self.silence_rms
        speech_ratio = float(1.0 - np.mean(silent))
        # longest run of consecutive silent frames (vectorized run-length)
        if silent.any():
            edged = np.concatenate(([False], silent, [False]))
            flips = np.flatnonzero(np.diff(edged.astype(np.int8)))
            run = int((flips[1::2] - flips[0::2]).max())
        else:
            run = 0
        return dict(n_frames=int(n_frames), speech_ratio=speech_ratio,
                    longest_silence_ms=run * self.frame_ms,
                    clipping_frac=clipping)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("clip_id").to_pylist()
        payloads = batch.column("bytes").to_pylist()
        srs = batch.column("sr_hz").to_numpy(zero_copy_only=False)
        out = {k: [] for k in PROFILE_SCHEMA.names}
        for cid, payload, sr in zip(ids, payloads, srs):
            sr = int(sr)
            out["clip_id"].append(cid)
            try:
                if sr <= 0:
                    raise ValueError("non-positive sample rate")
                _, pcm = audio.decode(payload)
            except (ValueError, TypeError):
                out["decode_ok"].append(False)
                out["n_frames"].append(0)
                out["speech_ratio"].append(float("nan"))
                out["longest_silence_ms"].append(0)
                out["clipping_frac"].append(float("nan"))
                continue
            p = self._profile(pcm, sr)
            out["decode_ok"].append(True)
            out["n_frames"].append(p["n_frames"])
            out["speech_ratio"].append(p["speech_ratio"])
            out["longest_silence_ms"].append(p["longest_silence_ms"])
            out["clipping_frac"].append(p["clipping_frac"])
        return pa.table(
            {n: pa.array(out[n], PROFILE_SCHEMA.field(n).type)
             for n in PROFILE_SCHEMA.names})


# -------------------------------------------------------------- gain

GAIN_SCHEMA = pa.schema([
    ("clip_id", pa.string()),
    ("rms_in", pa.float64()),
    ("rms_out", pa.float64()),
    ("gain_db", pa.float64()),
    ("bytes", pa.binary()),
])

TARGET_RMS = 0.25
PEAK_CEIL = 0.999


class GainNormalizer:
    """Loudness normalization: scale each clip's PCM so its RMS hits
    ``target_rms``, with the gain capped so the peak never exceeds
    ``peak_ceil`` (no hard clipping introduced) — the level-normalization
    pass every speech-training pipeline runs before featurization.
    Output is canonical pcm_s16le (one decode, transform fused).
    Undecodable or silent clips are dropped (the decode check's problem,
    not this stage's)."""

    columns = ("clip_id", "bytes")

    def __init__(self, target_rms: float = TARGET_RMS,
                 peak_ceil: float = PEAK_CEIL):
        self.target_rms = float(target_rms)
        self.peak_ceil = float(peak_ceil)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("clip_id").to_pylist()
        payloads = batch.column("bytes").to_pylist()
        out = {k: [] for k in GAIN_SCHEMA.names}
        for cid, payload in zip(ids, payloads):
            try:
                _, pcm = audio.decode(payload)
            except (ValueError, TypeError):
                continue
            x = pcm.astype(np.float64)
            rms = float(np.sqrt(np.mean(x * x))) if len(x) else 0.0
            peak = float(np.max(np.abs(x))) if len(x) else 0.0
            if rms == 0.0 or peak == 0.0:
                continue
            gain = min(self.target_rms / rms, self.peak_ceil / peak)
            y = (x * gain).astype(np.float32)
            out["clip_id"].append(cid)
            out["rms_in"].append(rms)
            out["rms_out"].append(float(np.sqrt(np.mean(
                y.astype(np.float64) ** 2))))
            out["gain_db"].append(float(20.0 * np.log10(gain)))
            out["bytes"].append(audio.encode(y, "pcm_s16le"))
        return pa.table(
            {n: pa.array(out[n], GAIN_SCHEMA.field(n).type)
             for n in GAIN_SCHEMA.names})


# ------------------------------------------------------------- augmentation

SPEED_SCHEMA = pa.schema([
    ("clip_id", pa.string()),
    ("speed_pct", pa.int32()),
    ("n_samples", pa.int64()),
    ("bytes", pa.binary()),
])

# speed factors as exact rationals (num/den): sox-style speed 0.9 / 1.1 —
# the standard 3-way speed-perturbation augmentation minus the identity copy
SPEED_FACTORS = ((9, 10), (11, 10))


def speed_n_out(n: int, num: int, den: int) -> int:
    """Output length of speed perturbation by num/den: round-half-up of
    n*den/num in EXACT integer arithmetic (no float .5 ties) — the same
    formula the SQL geometry oracle uses."""
    return (2 * n * den + num) // (2 * num)


class SpeedPerturb:
    """Speed-perturbation augmentation (the standard ASR 3-way speed perturb,
    sox ``speed 0.9/1.1``): each decodable clip emits one resampled variant
    per factor — playback speed num/den, so output length is
    round(n·den/num) — via linear interpolation at source positions
    j·num/den. Output payloads are canonical pcm_s16le (one decode, all
    variants from the same PCM). Undecodable / sr<=0 rows yield nothing
    (the decode check's violations, not this stage's).

    Reference parity: the augmentation analog of the reference's
    derived-representation family — deterministic, metadata-predictable
    geometry (the SQL oracle recomputes every output length from the
    fixture arithmetic) with real DSP inside."""

    columns = ("clip_id", "bytes", "sr_hz")

    def __init__(self, factors: tuple[tuple[int, int], ...] = SPEED_FACTORS):
        self.factors = tuple((int(n), int(d)) for n, d in factors)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("clip_id").to_pylist()
        payloads = batch.column("bytes").to_pylist()
        srs = batch.column("sr_hz").to_numpy(zero_copy_only=False)
        out = {k: [] for k in SPEED_SCHEMA.names}
        for cid, payload, sr in zip(ids, payloads, srs):
            if int(sr) <= 0:
                continue
            try:
                _, pcm = audio.decode(payload)
            except (ValueError, TypeError):
                continue
            if len(pcm) == 0:
                continue
            src = np.arange(len(pcm), dtype=np.float64)
            x = pcm.astype(np.float64)
            for num, den in self.factors:
                n_out = speed_n_out(len(pcm), num, den)
                pos = np.arange(n_out, dtype=np.float64) * (num / den)
                y = np.interp(pos, src, x).astype(np.float32)
                out["clip_id"].append(cid)
                out["speed_pct"].append(num * 100 // den)
                out["n_samples"].append(n_out)
                out["bytes"].append(audio.encode(y, "pcm_s16le"))
        return pa.table(
            {n: pa.array(out[n], SPEED_SCHEMA.field(n).type)
             for n in SPEED_SCHEMA.names})


NOISE_SCHEMA = pa.schema([
    ("clip_id", pa.string()),
    ("snr_db", pa.int32()),
    ("n_samples", pa.int64()),
    ("bytes", pa.binary()),
])

NOISE_SNRS_DB = (5, 20)


class NoiseMix:
    """SNR-controlled additive-noise augmentation (the second standard
    speech augmentation next to speed perturb): each decodable clip emits
    one variant per target SNR with a deterministic noise signal — synth
    from a seed derived from the clip's own id — scaled so the
    signal-to-noise power ratio hits the target EXACTLY:

        gain = rms(signal) / (rms(noise) · 10^(snr_db/20))

    Output is canonical pcm_s16le, same length as the input (one decode,
    all variants from the same PCM). Silent, undecodable or sr<=0 rows
    yield nothing. The noise is a pure function of (clip_id, length), so
    any downstream consumer can reconstruct it — the mix is reproducible
    across runs, workers and batch sizes.

    Caveat: the mixed signal is clamped to [-1, 1] before s16 encoding,
    so for hot signals at low target SNR the ACHIEVED ratio deviates
    from the target at clipped samples (and y − gain·noise ≠ x there) —
    the standard full-scale trade-off; the gain formula itself is exact."""

    columns = ("clip_id", "bytes", "sr_hz")

    def __init__(self, snrs_db: tuple[int, ...] = NOISE_SNRS_DB):
        self.snrs_db = tuple(int(s) for s in snrs_db)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("clip_id").to_pylist()
        payloads = batch.column("bytes").to_pylist()
        srs = batch.column("sr_hz").to_numpy(zero_copy_only=False)
        out = {k: [] for k in NOISE_SCHEMA.names}
        for cid, payload, sr in zip(ids, payloads, srs):
            if int(sr) <= 0:
                continue
            try:
                _, pcm = audio.decode(payload)
            except (ValueError, TypeError):
                continue
            if len(pcm) == 0:
                continue
            x = pcm.astype(np.float64)
            rms_sig = float(np.sqrt(np.mean(x * x)))
            if rms_sig == 0.0:
                continue
            noise = audio.synth_pcm(
                audio.clip_seed(cid + "#noise"), len(pcm)).astype(np.float64)
            rms_noise = float(np.sqrt(np.mean(noise * noise)))
            if rms_noise == 0.0:
                continue
            for snr in self.snrs_db:
                gain = rms_sig / (rms_noise * 10.0 ** (snr / 20.0))
                y = np.clip(x + gain * noise, -1.0, 1.0).astype(np.float32)
                out["clip_id"].append(cid)
                out["snr_db"].append(snr)
                out["n_samples"].append(len(y))
                out["bytes"].append(audio.encode(y, "pcm_s16le"))
        return pa.table(
            {n: pa.array(out[n], NOISE_SCHEMA.field(n).type)
             for n in NOISE_SCHEMA.names})


MASK_SCHEMA = pa.schema([
    ("clip_id", pa.string()),
    ("n_samples", pa.int64()),
    ("mask_start", pa.int64()),
    ("mask_len", pa.int64()),
    ("bytes", pa.binary()),
])

MASK_PCT = 10


class TimeMask:
    """SpecAugment-style time masking (the third standard speech
    augmentation next to speed perturb and noise mixing): each decodable
    clip emits one variant with a contiguous ``mask_pct``% span of samples
    zeroed. Mask geometry is a pure integer function of (clip_id, length)
    via the oracle-mirrorable md5 hash —

        mask_len   = clamp(n · mask_pct // 100, 1, n)
        mask_start = md5_lower64(clip_id + "#mask") % (n − mask_len + 1)

    — so the SQL oracle recomputes not just the row set but the exact
    mask placement, and the augmentation is reproducible across runs,
    workers and batch sizes. Output is canonical pcm_s16le, same length
    as the input. Undecodable / sr<=0 / empty rows yield nothing."""

    columns = ("clip_id", "bytes", "sr_hz")

    def __init__(self, mask_pct: int = MASK_PCT):
        self.mask_pct = int(mask_pct)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..sketches import md5_lower64

        ids = batch.column("clip_id").to_pylist()
        payloads = batch.column("bytes").to_pylist()
        srs = batch.column("sr_hz").to_numpy(zero_copy_only=False)
        out = {k: [] for k in MASK_SCHEMA.names}
        for cid, payload, sr in zip(ids, payloads, srs):
            if int(sr) <= 0:
                continue
            try:
                _, pcm = audio.decode(payload)
            except (ValueError, TypeError):
                continue
            n = len(pcm)
            if n == 0:
                continue
            mlen = min(max(1, n * self.mask_pct // 100), n)
            start = int(md5_lower64([cid + "#mask"])[0]
                        % np.uint64(n - mlen + 1))
            y = pcm.astype(np.float32, copy=True)
            y[start:start + mlen] = 0.0
            out["clip_id"].append(cid)
            out["n_samples"].append(n)
            out["mask_start"].append(start)
            out["mask_len"].append(mlen)
            out["bytes"].append(audio.encode(y, "pcm_s16le"))
        return pa.table(
            {n: pa.array(out[n], MASK_SCHEMA.field(n).type)
             for n in MASK_SCHEMA.names})


# ------------------------------------------------------------------ packing

PACK_SCHEMA = pa.schema([
    ("partition", pa.int32()),
    ("clip_id", pa.string()),
    ("pack_id", pa.int64()),
    ("offset_ms", pa.int64()),
])


def pack_clips(meta_ds, cap_ms: int = PACK_CAP_MS,
               n_buckets: int | None = None):
    """Concat-then-chunk sequence packing (the training-example packing
    step): within each ``partition``, clips are concatenated in clip_id
    order and the stream is cut every ``cap_ms`` — clip i lands in
    ``pack_id = prefix_ms // cap_ms`` at ``offset_ms = prefix_ms % cap_ms``
    where prefix_ms is the duration sum of all earlier clips. Rows with
    non-positive dur_ms are excluded (they are the range check's
    violations).

    Runs over metadata only (no payload): one key-projected co-group
    exchange (checks/keyed.py grouped_apply), then a vectorized sort +
    cumsum per partition. Order-dependent per partition by construction —
    parallelism is across partitions, which at design scale are millions."""
    from ..checks.keyed import grouped_apply_fast

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["dur_ms"] > 0].sort_values(
            ["partition", "clip_id"], kind="stable")
        prefix = (df.groupby("partition", sort=False)["dur_ms"]
                  .cumsum().to_numpy(dtype="int64")
                  - df["dur_ms"].to_numpy(dtype="int64"))
        return pd.DataFrame({
            "partition": df["partition"].to_numpy(),
            "clip_id": df["clip_id"].to_numpy(),
            "pack_id": prefix // cap_ms,
            "offset_ms": prefix % cap_ms,
        })

    projected = meta_ds.select_columns(["partition", "clip_id", "dur_ms"])
    return grouped_apply_fast(projected, "partition", per_bucket,
                         n_buckets=n_buckets, out_schema=PACK_SCHEMA)
