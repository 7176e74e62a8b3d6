"""Actor-pool feature-extraction stages over multimodal payload columns.

``AudioFeatureExtractor`` is the real path: decode the ``bytes`` payload
(metrics_ray.audio fake codecs — deterministic, magic-tagged), then compute
vectorized per-clip acoustic features: RMS energy, zero-crossing rate,
spectral centroid (rFFT), peak amplitude, and fixed-window frame energies
(the frame-sampling pattern for video/audio).

Stage shape (SURVEY.md §2.3 CorrectLanguageTag mapping — the model-based
scorer family): a callable CLASS for ``map_batches(Cls, concurrency=N,
batch_size=B)`` — construction cost (decoder context, feature config) paid
once per actor, per-batch work in ``__call__``. Payload never leaves the
batch: output is a narrow feature table.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import audio

N_FRAMES = 8  # fixed frame-sample count per clip


class AudioFeatureExtractor:
    """bytes → per-clip acoustic feature rows. Undecodable payloads yield
    NaN features + decode_ok=False (they are the decode check's problem;
    feature extraction must not fail the pipeline)."""

    columns = ("clip_id", "bytes", "sr_hz")

    def __init__(self, n_frames: int = N_FRAMES):
        self.n_frames = n_frames

    def _features(self, pcm: np.ndarray, sr_hz: int) -> dict:
        x = pcm.astype(np.float64)
        n = len(x)
        if n == 0:
            return dict(rms=0.0, zcr=0.0, centroid_hz=0.0, peak=0.0,
                        frames=[0.0] * self.n_frames)
        rms = float(np.sqrt(np.mean(x * x)))
        zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
        spec = np.abs(np.fft.rfft(x))
        freqs = np.fft.rfftfreq(n, d=1.0 / max(sr_hz, 1))
        denom = spec.sum()
        centroid = float((freqs * spec).sum() / denom) if denom > 0 else 0.0
        peak = float(np.abs(x).max())
        # fixed-count frame energies (frame-sampling analog)
        edges = np.linspace(0, n, self.n_frames + 1).astype(np.int64)
        frames = [float(np.sqrt(np.mean(x[s:e] ** 2))) if e > s else 0.0
                  for s, e in zip(edges[:-1], edges[1:])]
        return dict(rms=rms, zcr=zcr, centroid_hz=centroid, peak=peak,
                    frames=frames)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("clip_id").to_pylist()
        payloads = batch.column("bytes").to_pylist()
        srs = batch.column("sr_hz").to_numpy(zero_copy_only=False)
        rows = {"clip_id": [], "decode_ok": [], "rms": [], "zcr": [],
                "centroid_hz": [], "peak": [], "frame_rms": []}
        nanf = [float("nan")] * self.n_frames
        for cid, payload, sr in zip(ids, payloads, srs):
            rows["clip_id"].append(cid)
            try:
                _, pcm = audio.decode(payload)
            except (ValueError, TypeError):
                rows["decode_ok"].append(False)
                rows["rms"].append(float("nan"))
                rows["zcr"].append(float("nan"))
                rows["centroid_hz"].append(float("nan"))
                rows["peak"].append(float("nan"))
                rows["frame_rms"].append(nanf)
                continue
            f = self._features(pcm, int(sr))
            rows["decode_ok"].append(True)
            rows["rms"].append(f["rms"])
            rows["zcr"].append(f["zcr"])
            rows["centroid_hz"].append(f["centroid_hz"])
            rows["peak"].append(f["peak"])
            rows["frame_rms"].append(f["frames"])
        return pa.table({
            "clip_id": pa.array(rows["clip_id"], pa.string()),
            "decode_ok": pa.array(rows["decode_ok"], pa.bool_()),
            "rms": pa.array(rows["rms"], pa.float64()),
            "zcr": pa.array(rows["zcr"], pa.float64()),
            "centroid_hz": pa.array(rows["centroid_hz"], pa.float64()),
            "peak": pa.array(rows["peak"], pa.float64()),
            "frame_rms": pa.array(rows["frame_rms"],
                                  pa.list_(pa.float64(), self.n_frames)),
        })


def extract_audio_features(ds, batch_size: int = 256,
                           concurrency=None, num_cpus: float = 1.0,
                           use_actors: bool = False):
    """clips Dataset → feature Dataset. Small batches: payload rows are
    wide (bytes dominates block size, SURVEY.md §7.4).

    Default is the TASK path — a callable instance runs in reused worker
    processes with no actor-process startup; its state (feature config) is
    constructed once on the driver and shipped with the task spec. Use
    ``use_actors=True`` for extractors whose __init__ is genuinely heavy
    (real codec contexts, model weights)."""
    if use_actors:
        if concurrency is None:
            import ray

            concurrency = max(2, int(ray.cluster_resources().get("CPU", 4)) - 2)
        return ds.map_batches(
            AudioFeatureExtractor,
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
            num_cpus=num_cpus,
        )
    kwargs = {} if concurrency is None else {"concurrency": concurrency}
    return ds.map_batches(
        AudioFeatureExtractor(),
        batch_format="pyarrow",
        batch_size=batch_size,
        num_cpus=num_cpus,
        **kwargs,
    )
