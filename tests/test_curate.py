"""End-to-end curation pipeline (pipelines/curate.py): filter → quality
gate → dedup → pack → partitioned write, with per-partition resume."""

import json
import os
import shutil

import numpy as np
import pyarrow.parquet as pq
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def curated(tmp_path_factory):
    from metrics_ray.pipelines.curate import curate_sf

    out = str(tmp_path_factory.mktemp("curated"))
    manifest = curate_sf(SF, out)
    return out, manifest


def test_manifest_accounting(curated):
    _, m = curated
    t = m["totals"]
    assert t["n_input"] == (t["n_meta"] + t["n_undecodable"]
                            + t["n_low_speech"] + t["n_clipping"]
                            + t["n_dup_dropped"] + t["n_out"])
    assert t["n_out"] > 0 and t["n_packs"] > 0
    # seeded corruptions must be exercised: metadata violations,
    # undecodable payloads, clipping (noisy k%131 rows), content dups
    assert t["n_meta"] > 0
    assert t["n_undecodable"] > 0
    assert t["n_clipping"] > 0
    assert t["n_dup_dropped"] > 0


def test_output_rows_canonical_and_packed(curated):
    out, m = curated
    parts = sorted(d for d in os.listdir(out) if d.startswith("partition="))
    assert len(parts) == 8
    total_rows = 0
    for pname in parts:
        t = pq.read_table(os.path.join(out, pname))
        total_rows += t.num_rows
        if not t.num_rows:
            continue
        df = t.to_pandas().sort_values("clip_id").reset_index(drop=True)
        # canonical format: 16 kHz everywhere, payloads decode as pcm_s16le
        assert (df["sr_hz"] == 16000).all()
        from metrics_ray import audio

        actual, pcm = audio.decode(df["bytes"].iloc[0])
        assert actual == "pcm_s16le"
        assert len(pcm) == round(df["dur_ms"].iloc[0] * 16.0)
        # pack assignment is the prefix scan in clip_id order
        prefix = df["dur_ms"].astype("int64").cumsum().shift(
            fill_value=0).to_numpy()
        np.testing.assert_array_equal(
            df["pack_id"].to_numpy(), prefix // 30_000)
        np.testing.assert_array_equal(
            df["offset_ms"].to_numpy(), prefix % 30_000)
    assert total_rows == m["totals"]["n_out"]


def test_no_duplicate_content_in_output(curated):
    out, _ = curated
    seen = {}
    for pname in sorted(os.listdir(out)):
        if not pname.startswith("partition="):
            continue
        t = pq.read_table(os.path.join(out, pname),
                          columns=["clip_id", "bytes", "transcript"])
        for cid, payload, txt in zip(t.column("clip_id").to_pylist(),
                                     t.column("bytes").to_pylist(),
                                     t.column("transcript").to_pylist()):
            key = (payload, txt)
            assert key not in seen, (cid, seen[key])
            seen[key] = cid


def test_rerun_skips_committed_partitions(curated):
    from metrics_ray.pipelines.curate import curate_sf

    out, m = curated
    mtimes = {p: os.path.getmtime(os.path.join(out, p, "_SUCCESS"))
              for p in os.listdir(out) if p.startswith("partition=")}
    m2 = curate_sf(SF, out)
    assert m2["resumed_skips"] == 8
    assert m2["totals"] == m["totals"]
    for p, t0 in mtimes.items():
        assert os.path.getmtime(os.path.join(out, p, "_SUCCESS")) == t0


def test_crash_resume_rebuilds_only_missing_partition(curated):
    from metrics_ray.pipelines.curate import curate_sf

    out, m = curated
    victim = "partition=3"
    survivor = "partition=5"
    shutil.rmtree(os.path.join(out, victim))
    t_surv = os.path.getmtime(os.path.join(out, survivor, "_SUCCESS"))
    m2 = curate_sf(SF, out)
    assert m2["resumed_skips"] == 7
    assert m2["totals"] == m["totals"]
    assert os.path.exists(os.path.join(out, victim, "_SUCCESS"))
    assert os.path.getmtime(os.path.join(out, survivor, "_SUCCESS")) == t_surv


def test_quality_gate_drops_seeded_noisy_rows(curated):
    """The k%131==23 rows (loud additive noise → digital clipping after
    int16 encode) must be dropped by the clipping gate, and their count
    must match the seed arithmetic for decodable, metadata-clean rows."""
    out, m = curated
    # recompute the expected victim set from the corruption matrix
    n_docs = pq.read_metadata(
        os.path.join(SF, "documents.parquet")).num_rows
    expected = 0
    for k in range(n_docs):
        if k % 131 != 23:
            continue
        if k % 127 == 17:  # truncated → counted as undecodable instead
            continue
        # metadata gate runs first — skip rows it would have dropped
        meta_bad = (k % 97 in (13, 50) or k % 103 in (11, 60)
                    or k % 107 in (3, 71, 40) or k % 109 == 9
                    or k % 89 in (5, 44))
        if meta_bad:
            continue
        expected += 1
        if k % 139 == 41:  # duplicate row copies the noisy payload
            expected += 1
    assert m["totals"]["n_clipping"] == expected


def test_manifest_file_written(curated):
    out, m = curated
    with open(os.path.join(out, "_MANIFEST.json")) as f:
        saved = json.load(f)
    assert saved["totals"] == {k: int(v) for k, v in m["totals"].items()}


def test_load_drop_sets_tolerates_empty_committed_dir(tmp_path):
    """A duplicate-free corpus writes ZERO drop parquet files; the loader
    must return empty sets instead of wedging every resume on
    ArrowInvalid."""
    from metrics_ray.pipelines.curate import _load_drop_sets

    d = tmp_path / "_dedup_drops"
    d.mkdir()
    (d / "_SUCCESS").write_text("ok")
    assert _load_drop_sets(str(d)) == {}


def test_rerun_with_different_config_refuses(curated):
    from metrics_ray.pipelines.curate import curate_sf

    out_dir, _manifest = curated
    with pytest.raises(ValueError, match="config mismatch"):
        curate_sf("/root/testdata/sf0.001", out_dir, min_speech=0.99)


def test_torn_success_marker_recurates_partition(curated):
    """A half-written _SUCCESS (crash mid-write, pre-atomic era) means NOT
    committed: the resume must recurate that partition, not die with
    JSONDecodeError on every subsequent run."""
    from metrics_ray.pipelines.curate import curate_sf

    out, m1 = curated
    victim = sorted(d for d in os.listdir(out)
                    if d.startswith("partition="))[0]
    marker = os.path.join(out, victim, "_SUCCESS")
    with open(marker, "w") as f:
        f.write('{"n_input": 5')  # torn JSON
    m2 = curate_sf(SF, out)
    assert m2["partitions"][victim] == m1["partitions"][victim]
    with open(marker) as f:
        json.load(f)  # rewritten whole


def test_dedup_keeper_prefers_metadata_valid_member(ray_session):
    """Identical (bytes, transcript) but different metadata: the keeper is
    the gate-passing member, so content with a curate-able copy is never
    lost to a gate-rejected lexicographically-smaller keeper."""
    import pyarrow as pa
    import ray.data as rd

    from metrics_ray import audio
    from metrics_ray.pipelines.curate import dedup_drop_ds

    payload = audio.encode(np.zeros(1600, np.float32), "pcm_s16le")
    t = pa.table({
        "clip_id": ["clip-00000001", "clip-00000002"],
        "bytes": pa.array([payload, payload], pa.binary()),
        "sr_hz": pa.array([7999, 16000], pa.int32()),  # first is INVALID
        "dur_ms": pa.array([100, 100], pa.int32()),
        "codec": ["pcm_s16le", "pcm_s16le"],
        "transcript": ["same text", "same text"],
        "partition": pa.array([0, 0], pa.int32()),
    })

    def factory(columns=None):
        ds = rd.from_arrow(t)
        return ds.select_columns(columns) if columns else ds

    drops = dedup_drop_ds(factory).to_pandas()
    # the metadata-invalid clip-...01 is dropped even though it sorts first
    assert list(drops["clip_id"]) == ["clip-00000001"]
