"""WebDataset tar shard sink (sinks/webdataset.py): tar-byte goldens the
SQL oracle can't reach (payloads are Ray-only), determinism, and the
partition-commit resume contract."""

import json
import os
import shutil
import tarfile

import pyarrow.parquet as pq
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")

OUT = "/tmp/metrics_ray_wds_test"


@pytest.fixture(scope="module")
def manifest(sf_unit):
    from metrics_ray.sinks.webdataset import write_webdataset_sf

    shutil.rmtree(OUT, ignore_errors=True)
    return write_webdataset_sf(sf_unit, OUT)


def _source_rows(sf_unit):
    from metrics_ray.pipelines.clips import ensure_clips_parquet

    t = pq.read_table(ensure_clips_parquet(sf_unit))
    # duplicate clip_ids exist ACROSS partitions (the seeded dup-id family);
    # within one partition clip_id is unique, so (partition, clip_id) keys
    return {(r["partition"], r["clip_id"]): r for r in t.to_pylist()}


def test_roundtrip_payload_and_transcript(manifest, sf_unit):
    src = _source_rows(sf_unit)
    seen = 0
    for pname, counts in manifest["partitions"].items():
        part = int(pname.split("=")[1])
        for s in counts["shards"]:
            path = os.path.join(OUT, pname,
                                f"shard-{s['shard_idx']:05d}.tar")
            with tarfile.open(path) as tf:
                members = {m.name: tf.extractfile(m).read()
                           for m in tf.getmembers()}
            ids = sorted({n.rsplit(".", 1)[0] for n in members})
            assert len(ids) == s["n_members"]
            for cid in ids:
                row = src[(part, cid)]
                assert members[cid + ".bin"] == (row["bytes"] or b"")
                meta = json.loads(members[cid + ".json"])
                assert meta["sr_hz"] == row["sr_hz"]
                assert meta["dur_ms"] == row["dur_ms"]
                assert meta["codec"] == row["codec"]
                if row["transcript"] is None:
                    assert cid + ".txt" not in members
                else:
                    assert members[cid + ".txt"].decode() == row["transcript"]
                seen += 1
    # every positive-duration clip landed in exactly one shard
    expect = sum(1 for r in src.values() if r["dur_ms"] > 0)
    assert seen == expect


def test_shards_are_byte_deterministic(manifest, sf_unit):
    from metrics_ray.sinks.webdataset import write_webdataset_sf

    out2 = OUT + "_again"
    shutil.rmtree(out2, ignore_errors=True)
    m2 = write_webdataset_sf(sf_unit, out2)
    for pname, counts in manifest["partitions"].items():
        a = {s["shard_idx"]: s["sha256"] for s in counts["shards"]}
        b = {s["shard_idx"]: s["sha256"]
             for s in m2["partitions"][pname]["shards"]}
        assert a == b, pname
    shutil.rmtree(out2, ignore_errors=True)


def test_resume_skips_committed_partitions(manifest, sf_unit):
    from metrics_ray.sinks.webdataset import write_webdataset_sf

    parts = sorted(manifest["partitions"])
    victim, survivor = parts[0], parts[1]
    os.remove(os.path.join(OUT, victim, "_SUCCESS"))
    survivor_tar = os.path.join(
        OUT, survivor,
        f"shard-{manifest['partitions'][survivor]['shards'][0]['shard_idx']:05d}.tar")
    mtime_before = os.path.getmtime(survivor_tar)

    m2 = write_webdataset_sf(sf_unit, OUT)
    assert m2["resumed_skips"] == len(parts) - 1
    assert os.path.getmtime(survivor_tar) == mtime_before  # untouched
    assert m2["partitions"][victim] == manifest["partitions"][victim]


def test_shard_assignment_matches_prefix_scan(sf_unit):
    import pandas as pd

    from metrics_ray.sinks.webdataset import SHARD_MS, shard_assign

    keys = pd.DataFrame({
        "clip_id": ["c", "a", "b", "z", "d"],
        "dur_ms": [50_000, 80_000, 0, 70_000, -3],
    })
    out = shard_assign(keys)
    # order a(80k) -> c(50k) -> z(70k); cut at 120k: prefixes 0, 80k, 130k
    assert list(out["clip_id"]) == ["a", "c", "z"]
    assert list(out["shard_idx"]) == [0, 80_000 // SHARD_MS,
                                      130_000 // SHARD_MS]


def test_read_webdataset_roundtrips_the_clips_table(manifest, sf_unit):
    import ray

    from metrics_ray.sinks.webdataset import read_webdataset

    ds = read_webdataset(OUT)
    tables = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    got = {(r["partition"], r["clip_id"]): r
           for t in tables for r in t.to_pylist()}
    src = _source_rows(sf_unit)
    expect = {k: r for k, r in src.items() if r["dur_ms"] > 0}
    assert set(got) == set(expect)
    for k, r in expect.items():
        g = got[k]
        for col in ("bytes", "sr_hz", "dur_ms", "codec", "transcript"):
            assert g[col] == r[col], (k, col)


def test_read_webdataset_ignores_uncommitted_dirs(manifest):
    from metrics_ray.sinks.webdataset import read_webdataset

    stale = os.path.join(OUT, "partition=0.tmp")
    os.makedirs(stale, exist_ok=True)
    try:
        n_parts = {r["partition"]
                   for t in _read_all(read_webdataset(OUT))
                   for r in t.to_pylist()}
        assert len(n_parts) == len(manifest["partitions"])
    finally:
        shutil.rmtree(stale, ignore_errors=True)


def _read_all(ds):
    import ray

    return [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]


def test_shard_assign_rejects_duplicate_ids():
    import pandas as pd

    from metrics_ray.sinks.webdataset import shard_assign

    keys = pd.DataFrame({"clip_id": ["a", "a", "b"],
                         "dur_ms": [100, 200, 300]})
    with pytest.raises(ValueError, match="duplicate clip_id"):
        shard_assign(keys)


def test_verify_webdataset_flags_corruption_and_unlisted(manifest):
    import ray

    from metrics_ray.sinks.webdataset import verify_webdataset

    def results():
        return {(r["partition"], r["shard_idx"]): r
                for t in [t for t in ray.get(
                    verify_webdataset(OUT).to_arrow_refs()) if t.num_rows]
                for r in t.to_pylist()}

    clean = results()
    assert clean and all(r["ok"] for r in clean.values())

    # corrupt one committed tar: flagged as sha256 mismatch, others clean
    parts = sorted(manifest["partitions"])
    victim = parts[0]
    part = int(victim.split("=")[1])
    sid = manifest["partitions"][victim]["shards"][0]["shard_idx"]
    path = os.path.join(OUT, victim, f"shard-{sid:05d}.tar")
    orig = open(path, "rb").read()
    try:
        with open(path, "r+b") as f:
            f.seek(0)
            f.write(b"\x00" * 8)
        stale = os.path.join(OUT, victim, "shard-09999.tar")
        with open(stale, "wb") as f:
            f.write(b"junk")
        got = results()
        assert got[(part, sid)]["ok"] is False
        assert got[(part, sid)]["reason"] == "sha256 mismatch"
        assert got[(part, 9999)]["reason"] == "unlisted tar on disk"
        others = [r for k, r in got.items()
                  if k not in {(part, sid), (part, 9999)}]
        assert all(r["ok"] for r in others)
    finally:
        with open(path, "wb") as f:
            f.write(orig)
        os.remove(stale)


def test_verify_webdataset_reports_misnamed_tar(manifest):
    """A tar whose name doesn't parse as shard-%05d must surface as an
    'unlisted tar on disk' violation, not crash the audit on int()."""
    import ray

    from metrics_ray.sinks.webdataset import verify_webdataset

    pname = sorted(manifest["partitions"])[1]
    stray = os.path.join(OUT, pname, "backup.tar")
    with open(stray, "wb") as f:
        f.write(b"junk")
    try:
        rows = [r for t in [t for t in ray.get(
                    verify_webdataset(OUT).to_arrow_refs()) if t.num_rows]
                for r in t.to_pylist()]
        bad = [r for r in rows if not r["ok"]]
        assert len(bad) == 1
        assert bad[0]["reason"] == "unlisted tar on disk"
        assert bad[0]["shard_idx"] == -1
    finally:
        os.remove(stray)


def test_write_partition_commits_empty_when_all_rows_filtered(tmp_path):
    """A partition whose every clip fails dur_ms > 0 writes zero shards
    but must still commit an (empty) manifest instead of KeyError."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from metrics_ray.sinks.webdataset import _write_partition

    part_dir = tmp_path / "partition=0"
    part_dir.mkdir()
    t = pa.table({
        "clip_id": pa.array(["a", "b"], pa.string()),
        "bytes": pa.array([b"x", b"y"], pa.binary()),
        "sr_hz": pa.array([8000, 8000], pa.int32()),
        "dur_ms": pa.array([0, -5], pa.int32()),
        "codec": pa.array(["pcm_s16le", "flac"], pa.string()),
        "transcript": pa.array(["t", None], pa.string()),
    })
    pq.write_table(t, str(part_dir / "data.parquet"))
    out_dir = tmp_path / "out" / "partition=0"
    counts = _write_partition(str(part_dir), str(out_dir), 120_000)
    assert counts == {"n_members": 0, "n_shards": 0, "total_ms": 0,
                      "shards": []}
    assert os.path.exists(out_dir / "_SUCCESS")


def test_torn_success_marker_reshards_partition(manifest, sf_unit):
    """A torn _SUCCESS manifest is treated as uncommitted: the partition is
    re-sharded on the next write instead of crashing resume/read."""
    from metrics_ray.sinks.webdataset import write_webdataset_sf

    m1 = manifest
    victim = sorted(m1["partitions"])[0]
    marker = os.path.join(OUT, victim, "_SUCCESS")
    with open(marker, "w") as f:
        f.write('{"n_shards":')  # torn JSON
    m2 = write_webdataset_sf(sf_unit, OUT)
    assert m2["partitions"][victim]["shards"] == \
        m1["partitions"][victim]["shards"]


def test_task_writer_matches_exchange_writer():
    """mode='tasks' (per-partition streaming writer, no exchange) and
    mode='exchange' (wave-job co-group) must produce byte-identical tars
    and identical committed manifests."""
    import glob
    import hashlib
    import json
    import os
    import shutil

    from metrics_ray.sinks.webdataset import write_webdataset_sf

    sf = "/root/testdata/sf0.001"
    outs = {}
    for mode in ("exchange", "tasks"):
        root = f"/tmp/metrics_ray_wds_mode_{mode}"
        shutil.rmtree(root, ignore_errors=True)
        m = write_webdataset_sf(sf, root, mode=mode)
        h = hashlib.sha256()
        for p in sorted(glob.glob(os.path.join(root, "partition=*",
                                               "*.tar"))):
            h.update(os.path.relpath(p, root).encode())
            h.update(open(p, "rb").read())
        outs[mode] = (json.dumps(m["partitions"], sort_keys=True),
                      h.hexdigest())
        shutil.rmtree(root, ignore_errors=True)
    assert outs["exchange"] == outs["tasks"]


def test_auto_mode_routes_oversized_partitions_to_exchange(monkeypatch):
    """mode='auto' (default) streams small partitions with tasks-mode
    writers but routes any partition whose on-disk bytes exceed
    TASKS_MODE_MAX_PART_BYTES to the exchange writer (bounded per-writer
    memory) — and the output is byte-identical either way."""
    import glob
    import hashlib
    import json
    import os
    import shutil

    import metrics_ray.sinks.webdataset as W

    sf = "/root/testdata/sf0.001"
    outs = {}
    for tag, cap in (("auto_small_cap", 1), ("auto_big_cap", 10 << 30)):
        # cap=1 byte → every partition routed to exchange; huge cap →
        # every partition routed to tasks
        monkeypatch.setattr(W, "TASKS_MODE_MAX_PART_BYTES", cap)
        root = f"/tmp/metrics_ray_wds_{tag}"
        shutil.rmtree(root, ignore_errors=True)
        m = W.write_webdataset_sf(sf, root, mode="auto")
        h = hashlib.sha256()
        for p in sorted(glob.glob(os.path.join(root, "partition=*",
                                               "*.tar"))):
            h.update(os.path.relpath(p, root).encode())
            h.update(open(p, "rb").read())
        outs[tag] = (json.dumps(m["partitions"], sort_keys=True),
                     h.hexdigest())
        shutil.rmtree(root, ignore_errors=True)
    assert outs["auto_small_cap"] == outs["auto_big_cap"]


def test_export_job_entrypoint_runs_and_resumes(tmp_path):
    """The ray-job-submit export entrypoint writes the full tar layout,
    prints one JSON summary, and a re-submit skips every committed
    partition (the sink's _SUCCESS resume contract)."""
    import json
    import os
    import subprocess
    import sys

    out = str(tmp_path / "wds")
    cmd = [sys.executable, "/root/repo/jobs/export_webdataset_job.py",
           "--sf-dir", "/root/testdata/sf0.001", "--out-dir", out]
    env = dict(os.environ, RAY_GRAFT_CPUS="4")
    env.pop("RAY_ADDRESS", None)

    r1 = subprocess.run(cmd, env=env, capture_output=True, text=True,
                        timeout=540)
    d1 = json.loads([l for l in r1.stdout.splitlines()
                     if l.startswith("{")][-1])
    assert d1["n_partitions"] == 8 and d1["n_shards"] > 0
    assert d1["n_members"] > 0 and d1["tar_bytes"] > 0
    assert d1["resumed_skips"] == 0

    r2 = subprocess.run(cmd, env=env, capture_output=True, text=True,
                        timeout=540)
    d2 = json.loads([l for l in r2.stdout.splitlines()
                     if l.startswith("{")][-1])
    assert d2["resumed_skips"] == 8
    assert d2["n_shards"] == d1["n_shards"]
    assert d2["n_members"] == d1["n_members"]
