"""Actor-pool stage tests: audio feature extraction correctness on known
signals, end-to-end plumbing over the clips table, and the image-decode
stub contract (real plumbing, gated decode)."""

import numpy as np
import pyarrow as pa
import pytest

from metrics_ray import audio
from metrics_ray.stages.features import N_FRAMES, AudioFeatureExtractor
from metrics_ray.stages.image import THUMB_H, THUMB_W, ImageFeatureExtractor


def _clip_batch(pcms, codecs, srs):
    return pa.table({
        "clip_id": pa.array([f"c{i}" for i in range(len(pcms))]),
        "bytes": pa.array([audio.encode(p, c) if p is not None else None
                           for p, c in zip(pcms, codecs)], pa.binary()),
        "sr_hz": pa.array(np.asarray(srs, np.int32)),
    })


def test_audio_features_known_signal():
    sr = 16000
    n = sr  # 1 s
    i = np.arange(n)
    # 1 kHz sine, amplitude 0.5 → rms = 0.5/sqrt(2), zcr ≈ 2*f/sr
    pcm = (0.5 * np.sin(2 * np.pi * 1000 * i / sr)).astype(np.float32)
    out = AudioFeatureExtractor()(_clip_batch([pcm], ["pcm_s16le"], [sr]))
    r = out.to_pylist()[0]
    assert r["decode_ok"]
    assert r["rms"] == pytest.approx(0.5 / np.sqrt(2), rel=1e-3)
    assert r["zcr"] == pytest.approx(2 * 1000 / sr, rel=1e-2)
    assert r["centroid_hz"] == pytest.approx(1000, rel=0.05)
    assert r["peak"] == pytest.approx(0.5, rel=1e-2)
    assert len(r["frame_rms"]) == N_FRAMES
    # stationary signal → all frames carry the same energy
    assert np.allclose(r["frame_rms"], r["rms"], rtol=1e-2)


def test_audio_features_bad_payload():
    pcm = audio.synth_pcm(7, 1000)
    batch = _clip_batch([pcm, None], ["flac", "flac"], [8000, 8000])
    # corrupt the first payload body
    raw = batch.column("bytes").to_pylist()
    raw[0] = raw[0][:6]
    batch = batch.set_column(1, "bytes", pa.array(raw, pa.binary()))
    out = AudioFeatureExtractor()(batch).to_pylist()
    assert [r["decode_ok"] for r in out] == [False, False]
    assert all(np.isnan(r["rms"]) for r in out)


@pytest.mark.usefixtures("ray_session")
def test_audio_features_pipeline(sf_unit):
    from metrics_ray.pipelines.queries import q_audio_features

    t = q_audio_features(sf_unit).to_pandas()
    assert len(t) == 504
    # decode failures are exactly the truncated-payload rows (k % 127 == 17)
    ks = np.arange(500)
    n_bad = int((ks % 127 == 17).sum())
    assert (~t.decode_ok).sum() == n_bad
    ok = t[t.decode_ok]
    assert (ok.rms > 0).all() and (ok.centroid_hz > 0).all()


def test_image_stage_contract():
    from metrics_ray.stages.image import encode_ppm, synth_image

    batch = pa.table({
        "img_id": pa.array(["a", "b", "c"], pa.string()),
        "bytes": pa.array([encode_ppm(synth_image(1)),
                           b"\xff\xd8\xffjunk", None], pa.binary()),
    })
    out = ImageFeatureExtractor()(batch)
    df = out.to_pylist()
    assert [r["decode_ok"] for r in df] == [True, False, False]
    assert all(len(r["thumbnail"]) == THUMB_H * THUMB_W * 3 for r in df)
    # deterministic: same payload → identical output (pandas equals is
    # NaN-aware; Table.equals treats the NaN feature rows as unequal)
    assert out.to_pandas().equals(ImageFeatureExtractor()(batch).to_pandas())


def test_lance_source_gating(tmp_path):
    import pyarrow.parquet as pq

    from metrics_ray.sources import lance_available, read_clips

    assert lance_available() in (True, False)
    if not lance_available():
        with pytest.raises(RuntimeError, match="lance"):
            read_clips("/tmp/nonexistent.lance")
    pq.write_table(pa.table({"a": [1, 2]}), tmp_path / "x.parquet")
    ds = read_clips(str(tmp_path))
    assert ds.count() == 2


def test_clips_cache_clears_partial_writes(tmp_path, sf_unit):
    """A cache dir left by a crashed write (files, no _SUCCESS) is cleared
    before rebuilding — Ray part-file names are per-run uuids, so writing
    into leftovers would commit a cache with duplicated rows."""
    import os

    import pyarrow.parquet as pq

    from metrics_ray.pipelines import clips as C

    old_root, C.CACHE_ROOT = C.CACHE_ROOT, str(tmp_path)
    try:
        path = C.ensure_clips_parquet(sf_unit)
        n_clean = sum(pq.read_metadata(os.path.join(path, f)).num_rows
                      for f in os.listdir(path) if f.endswith(".parquet"))
        # simulate a crashed write: drop the marker, leave the files
        os.remove(os.path.join(path, "_SUCCESS"))
        path2 = C.ensure_clips_parquet(sf_unit)
        assert path2 == path
        n_rebuilt = sum(pq.read_metadata(os.path.join(path2, f)).num_rows
                        for f in os.listdir(path2) if f.endswith(".parquet"))
        assert n_rebuilt == n_clean  # not doubled
    finally:
        C.CACHE_ROOT = old_root


def test_clips_cache_tag_tracks_source_identity(tmp_path, sf_unit):
    """Regenerating documents.parquet (same path, new mtime) must produce
    a DIFFERENT cache dir — a stale cache must never serve clips derived
    from a previous generation of the source."""
    import os
    import shutil

    from metrics_ray.pipelines import clips as C

    src = str(tmp_path / "sf")
    os.makedirs(src)
    shutil.copy(os.path.join(sf_unit, "documents.parquet"),
                os.path.join(src, "documents.parquet"))
    old_root, C.CACHE_ROOT = C.CACHE_ROOT, str(tmp_path / "cache")
    try:
        a = C.ensure_clips_parquet(src)
        os.utime(os.path.join(src, "documents.parquet"))  # "regenerated"
        b = C.ensure_clips_parquet(src)
        assert a != b
    finally:
        C.CACHE_ROOT = old_root


def test_grouped_apply_refs_fanout_guard_counts_per_source(ray_session):
    """The fan-out guard must count split tasks the way the launch loop
    creates them — per SOURCE — so a multi-source exchange cannot launch
    more than max_fanout bucket slices (r3 ADVICE: the old global-ceil
    guard undercounted by up to (n_sources-1)*B)."""
    import math

    import pandas as pd
    import pyarrow as pa
    import ray

    from metrics_ray.checks.keyed import grouped_apply_refs

    t = pa.table({"key": ["a", "b"], "v": [1, 2]})
    refs = [ray.put(t)] * 3
    schema = pa.schema([("key", pa.string()), ("n", pa.int64())])

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("key", as_index=False).size().rename(
            columns={"size": "n"})

    # 4 sources × ceil(3/8)=1 split each = 4 split tasks; B=8 buckets →
    # 32 slices. A global-ceil guard would see ceil(12/8)*8 = 16 and
    # wrongly allow a cap of 20; the per-source guard must refuse it.
    sources = [(refs, None)] * 4
    assert grouped_apply_refs(sources, "key", fn, n_buckets=8,
                              out_schema=schema, max_fanout=20) is None
    # at the true fan-out the exchange runs
    out = grouped_apply_refs(sources, "key", fn, n_buckets=8,
                             out_schema=schema, max_fanout=32)
    assert out is not None
    got = pa.concat_tables([x for x in ray.get(out) if x.num_rows])
    df = got.to_pandas().groupby("key")["n"].sum()
    assert df.to_dict() == {"a": 12, "b": 12}
