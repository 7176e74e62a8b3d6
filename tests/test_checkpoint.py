"""Checkpoint / resume tests (north_rule: resumable from checkpoint with
per-partition lineage + metrics; FIXTURES.md fx_resume: resumed run produces
identical verdicts + violations as a single-shot run)."""

import json
import os
import shutil

import pyarrow.parquet as pq
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")


@pytest.fixture(scope="module")
def single_shot(sf_unit, tmp_path_factory):
    from metrics_ray.pipelines.clips import validate_checkpointed

    d = str(tmp_path_factory.mktemp("ckpt_single"))
    report = validate_checkpointed(sf_unit, d, wave_size=2, concurrency=2)
    return report


def _sorted_df(table, keys):
    return (table.to_pandas().sort_values(keys).reset_index(drop=True))


def test_single_shot_matches_unchunked(single_shot, sf_unit):
    """The wave-checkpointed run must agree with the plain streaming run
    (modulo the editdist gate, which is a job-surface-only keyed audit —
    validate_sf does not carry it)."""
    from metrics_ray.pipelines.clips import validate_sf

    plain = validate_sf(sf_unit, concurrency=2)
    a = _sorted_df(single_shot.violations, ["check_id", "clip_id", "code"])
    a = a[a.check_id != "transcript_editdist"].reset_index(drop=True)
    b = _sorted_df(plain.violations, ["check_id", "clip_id", "code"])
    assert len(a) == len(b)
    assert (a[["check_id", "clip_id", "code"]].values
            == b[["check_id", "clip_id", "code"]].values).all()

    ma = _sorted_df(single_shot.metrics, ["check_id", "partition"])
    ma = ma[ma.check_id != "transcript_editdist"].reset_index(drop=True)
    mb = _sorted_df(plain.metrics, ["check_id", "partition"])
    exact_a = ma[~ma.is_estimate].reset_index(drop=True)
    exact_b = mb[~mb.is_estimate].reset_index(drop=True)
    assert (exact_a.metric_value.values
            == pytest.approx(exact_b.metric_value.values, abs=1e-12))


def test_resume_after_crash(sf_unit, single_shot, tmp_path_factory):
    from metrics_ray.pipelines.clips import validate_checkpointed

    d = str(tmp_path_factory.mktemp("ckpt_resume"))
    with pytest.raises(RuntimeError, match="injected failure"):
        validate_checkpointed(sf_unit, d, wave_size=2, concurrency=2,
                              fail_after_waves=2)

    manifest = json.load(open(os.path.join(d, "MANIFEST.json")))
    assert len(manifest["completed"]) == 4  # 2 waves × 2 partitions

    resumed = validate_checkpointed(sf_unit, d, wave_size=2, concurrency=2)
    assert sorted(resumed.manifest["resumed_from"]) == sorted(
        manifest["completed"])

    # identical violations + exact metrics + verdicts vs the single-shot run
    a = _sorted_df(resumed.violations, ["check_id", "clip_id", "code"])
    b = _sorted_df(single_shot.violations, ["check_id", "clip_id", "code"])
    assert (a[["check_id", "clip_id", "code"]].values
            == b[["check_id", "clip_id", "code"]].values).all()

    ma = _sorted_df(resumed.metrics, ["check_id", "partition"])
    mb = _sorted_df(single_shot.metrics, ["check_id", "partition"])
    assert (ma.check_id.values == mb.check_id.values).all()
    exact = ~ma.is_estimate.values
    assert (ma.metric_value.values[exact]
            == pytest.approx(mb.metric_value.values[exact], abs=1e-12))
    # estimate checks (t-digest merge order) agree within sketch tolerance
    assert (ma.metric_value.values[~exact]
            == pytest.approx(mb.metric_value.values[~exact], rel=0.05))

    va = _sorted_df(resumed.verdicts, ["partition"])
    vb = _sorted_df(single_shot.verdicts, ["partition"])
    assert (va.passed.values == vb.passed.values).all()
    assert (va.n_violations.values == vb.n_violations.values).all()


def test_lineage_recorded(single_shot):
    lin = single_shot.manifest["partitions"]
    assert len(lin) == 8
    for p, files in lin.items():
        assert files, f"partition {p} has no lineage"
        assert all(f"partition={p}" in f for f in files)


def test_fingerprint_guard(sf_unit, tmp_path_factory):
    """A checkpoint dir belonging to a different suite must be rejected."""
    from metrics_ray.checks.stateless import NonNullCheck
    from metrics_ray.pipelines.clips import ensure_clips_hive
    from metrics_ray.state.checkpoint import checkpointed_validate

    d = str(tmp_path_factory.mktemp("ckpt_fp"))
    path = ensure_clips_hive(sf_unit)
    checkpointed_validate(path, [NonNullCheck("t", "transcript")],
                          checkpoint_dir=d, concurrency=2)
    with pytest.raises(ValueError, match="different run"):
        checkpointed_validate(path, [NonNullCheck("other", "transcript")],
                              checkpoint_dir=d, concurrency=2)


def test_job_entrypoint(tmp_path):
    """The ray-job-submit entrypoint runs standalone, reports per-partition
    latency + verdicts, and resumes from its checkpoint."""
    import json
    import subprocess
    import sys

    ckpt = str(tmp_path / "ckpt")
    cmd = [sys.executable, "/root/repo/jobs/validate_job.py",
           "--checkpoint-dir", ckpt, "--wave-size", "4"]
    env = dict(os.environ, RAY_GRAFT_CPUS="4")
    env.pop("RAY_ADDRESS", None)  # fresh local session inside the job

    r1 = subprocess.run(cmd, env=env, capture_output=True, text=True,
                        timeout=540)
    line = [l for l in r1.stdout.splitlines() if l.startswith("{")][-1]
    d1 = json.loads(line)
    assert d1["rows"] == 504 and len(d1["partitions"]) == 8
    assert d1["partition_latency_s"]["max"] > 0
    assert not d1["all_passed"]  # seeded corruptions
    assert d1["resumed_from"] == []

    r2 = subprocess.run(cmd, env=env, capture_output=True, text=True,
                        timeout=540)
    d2 = json.loads([l for l in r2.stdout.splitlines()
                     if l.startswith("{")][-1])
    assert d2["resumed_from"] == list(range(8))
    assert d2["n_violations"] == d1["n_violations"]


def test_checkpointed_distributed_referential_matches_broadcast(sf_unit, tmp_path):
    """The checkpointed path honors the same broadcast-budget switch as
    validate_sf: a forced-distributed run reproduces the broadcast run's
    referential violations and verdicts, and the keyed result is
    checkpointed (resume does not re-run the join)."""
    from metrics_ray.pipelines.clips import validate_checkpointed

    b = validate_checkpointed(sf_unit, str(tmp_path / "bcast"))
    d = validate_checkpointed(sf_unit, str(tmp_path / "dist"),
                              broadcast_budget_rows=0)

    def ref_rows(rep):
        df = rep.violations.to_pandas()
        df = df[df.check_id == "referential_transcript"]
        return sorted(zip(df.code, df.clip_id, df.partition))

    assert ref_rows(d) == ref_rows(b)
    bp = b.verdicts.to_pandas().set_index("partition")["passed"]
    dp = d.verdicts.to_pandas().set_index("partition")["passed"]
    assert dp.to_dict() == bp.to_dict()

    # resume with the same strategy: keyed join is loaded, not re-run
    d2 = validate_checkpointed(sf_unit, str(tmp_path / "dist"),
                               broadcast_budget_rows=0)
    assert ref_rows(d2) == ref_rows(d)


def test_resume_detects_stale_partition_lineage(sf_unit, tmp_path_factory):
    """A 'completed' partition whose file list changed since the crash
    (new/replaced parquet) must be re-validated on resume, not served
    from stale checkpointed counters — the lineage save exists for this."""
    from metrics_ray.pipelines.clips import ensure_clips_hive
    from metrics_ray.state.checkpoint import checkpointed_validate
    from metrics_ray.suite import metadata_checks

    src = ensure_clips_hive(sf_unit)
    data = str(tmp_path_factory.mktemp("stale_hive"))
    for d in os.listdir(src):
        if d.startswith("partition="):
            shutil.copytree(os.path.join(src, d), os.path.join(data, d))
    ck = str(tmp_path_factory.mktemp("ckpt_stale"))
    first = checkpointed_validate(data, metadata_checks(),
                                  checkpoint_dir=ck, wave_size=8,
                                  concurrency=2)
    rows0 = first.manifest["rows_scanned"]
    assert first.manifest["resumed_from"] == []

    p0 = os.path.join(data, "partition=0")
    f0 = sorted(f for f in os.listdir(p0) if f.endswith(".parquet"))[0]
    shutil.copy(os.path.join(p0, f0), os.path.join(p0, "zz_extra.parquet"))

    second = checkpointed_validate(data, metadata_checks(),
                                   checkpoint_dir=ck, wave_size=8,
                                   concurrency=2)
    assert 0 not in second.manifest["resumed_from"]
    assert sorted(second.manifest["resumed_from"]) == list(range(1, 8))
    assert second.manifest["rows_scanned"] > rows0  # partition 0 re-counted


def test_resume_detects_inplace_overwrite(sf_unit, tmp_path_factory):
    """A 'completed' partition whose file was overwritten IN PLACE (same
    path list, different bytes/size) must also re-validate: the path-only
    lineage compare passes, the stat signature catches it."""
    from metrics_ray.pipelines.clips import ensure_clips_hive
    from metrics_ray.state.checkpoint import checkpointed_validate
    from metrics_ray.suite import metadata_checks

    src = ensure_clips_hive(sf_unit)
    data = str(tmp_path_factory.mktemp("overwrite_hive"))
    for d in os.listdir(src):
        if d.startswith("partition="):
            shutil.copytree(os.path.join(src, d), os.path.join(data, d))
    ck = str(tmp_path_factory.mktemp("ckpt_overwrite"))
    first = checkpointed_validate(data, metadata_checks(),
                                  checkpoint_dir=ck, wave_size=8,
                                  concurrency=2)
    rows0 = first.manifest["rows_scanned"]

    # overwrite partition 0's file in place: same name, fewer rows
    p0 = os.path.join(data, "partition=0")
    f0 = sorted(f for f in os.listdir(p0) if f.endswith(".parquet"))[0]
    fp = os.path.join(p0, f0)
    t = pq.read_table(fp)
    pq.write_table(t.slice(0, max(1, t.num_rows // 2)), fp)

    second = checkpointed_validate(data, metadata_checks(),
                                   checkpoint_dir=ck, wave_size=8,
                                   concurrency=2)
    assert 0 not in second.manifest["resumed_from"]
    assert sorted(second.manifest["resumed_from"]) == list(range(1, 8))
    assert second.manifest["rows_scanned"] < rows0  # re-counted, fewer rows


def test_fingerprint_guard_detects_param_drift(sf_unit, tmp_path_factory):
    """Same check ids, DIFFERENT parameters: a resume must refuse instead
    of silently mixing partitions computed under the old config."""
    from metrics_ray.checks.stateless import RangeCheck
    from metrics_ray.pipelines.clips import ensure_clips_hive
    from metrics_ray.state.checkpoint import checkpointed_validate

    d = str(tmp_path_factory.mktemp("ckpt_fp_param"))
    path = ensure_clips_hive(sf_unit)
    checkpointed_validate(path, [RangeCheck("dur", "dur_ms", 1, 30000)],
                          checkpoint_dir=d, concurrency=2)
    with pytest.raises(ValueError, match="different run"):
        checkpointed_validate(path, [RangeCheck("dur", "dur_ms", 1, 20000)],
                              checkpoint_dir=d, concurrency=2)


def test_checkpoint_empty_parquet_dir_fails_loudly(tmp_path_factory):
    """A dir with no partition=* subdirs is a clear ValueError, not a
    pandas 'No objects to concatenate' from deep in the re-merge."""
    from metrics_ray.checks.stateless import NonNullCheck
    from metrics_ray.state.checkpoint import checkpointed_validate

    empty = str(tmp_path_factory.mktemp("no_parts"))
    with pytest.raises(ValueError, match="no partition"):
        checkpointed_validate(empty, [NonNullCheck("t", "transcript")],
                              checkpoint_dir=str(
                                  tmp_path_factory.mktemp("ckpt_empty")))


def test_editdist_gate_in_job_surface(sf_unit, tmp_path):
    """The graded transcript-drift gate rides the checkpointed job
    surface (VERDICT r3 next-round #7): its violations match the
    standalone val_transcript_editdist query fact-for-fact, resume loads
    the keyed result instead of re-running the join, and the
    config-built suite (configs/full_suite.yaml keyed section) produces
    the same gate rows as the code-built one."""
    import os

    from metrics_ray.pipelines.clips import validate_checkpointed
    from metrics_ray.pipelines.queries import q_transcript_editdist

    rep = validate_checkpointed(sf_unit, str(tmp_path / "code"),
                                wave_size=2, concurrency=2)
    df = rep.violations.to_pandas()
    gate = df[df.check_id == "transcript_editdist"]
    assert (gate.code == "EditDistance").all()
    got = sorted(zip(gate.clip_id, gate.actual.astype(int)))

    want_t = q_transcript_editdist(sf_unit)
    want = sorted(zip(want_t.column("clip_id").to_pylist(),
                      want_t.column("edit_dist").to_pylist()))
    assert got == want and len(want) > 0

    # resume: keyed result is loaded from the checkpoint, not re-run
    rep2 = validate_checkpointed(sf_unit, str(tmp_path / "code"),
                                 wave_size=2, concurrency=2)
    df2 = rep2.violations.to_pandas()
    gate2 = df2[df2.check_id == "transcript_editdist"]
    assert sorted(zip(gate2.clip_id, gate2.actual.astype(int))) == got

    # config-built suite: same gate rows from the YAML keyed section
    cfg = os.path.join(os.path.dirname(__file__), "..", "configs",
                       "full_suite.yaml")
    rep3 = validate_checkpointed(sf_unit, str(tmp_path / "cfg"),
                                 wave_size=2, concurrency=2,
                                 config_path=cfg)
    df3 = rep3.violations.to_pandas()
    gate3 = df3[df3.check_id == "transcript_editdist"]
    assert sorted(zip(gate3.clip_id, gate3.actual.astype(int))) == got
    # ...and the config-built run reports metrics for every keyed audit
    m3 = set(rep3.metrics.to_pandas().check_id)
    assert {"clipid_unique_exact", "content_dedup",
            "transcript_editdist"} <= m3


def test_keyed_config_rejects_unknown_audit(tmp_path):
    from metrics_ray.config import keyed_from_config

    with pytest.raises(ValueError, match="unknown keyed audit"):
        keyed_from_config({"keyed": [{"type": "nope", "id": "x"}]})
    with pytest.raises(ValueError, match="unknown parameter"):
        keyed_from_config({"keyed": [{"type": "content_dedup",
                                      "id": "x", "shards": 3}]})
    with pytest.raises(ValueError, match="requires transcript_index_ds"):
        keyed_from_config({"keyed": [{"type": "transcript_editdist",
                                      "id": "x"}]})


def test_keyed_param_edit_refuses_resume(sf_unit, tmp_path):
    """Editing a keyed audit's parameters (e.g. the editdist cap)
    between runs must refuse the checkpoint like a batch-check edit —
    keyed results are checkpointed wholesale by id, so a silent resume
    would serve the old-cap violations (round-4 review finding)."""
    import yaml

    from metrics_ray.pipelines.clips import validate_checkpointed

    base = {"checks": [{"type": "nonnull", "id": "t",
                        "column": "transcript"}],
            "keyed": [{"type": "transcript_editdist",
                       "id": "transcript_editdist", "cap": 8}]}
    cfg = tmp_path / "suite.yaml"
    cfg.write_text(yaml.safe_dump(base))
    d = str(tmp_path / "ckpt")
    validate_checkpointed(sf_unit, d, wave_size=4, concurrency=2,
                          config_path=str(cfg))
    base["keyed"][0]["cap"] = 4
    cfg.write_text(yaml.safe_dump(base))
    with pytest.raises(ValueError, match="different run"):
        validate_checkpointed(sf_unit, d, wave_size=4, concurrency=2,
                              config_path=str(cfg))


def test_config_broadcast_referential_refuses_past_budget(sf_unit, tmp_path):
    """A YAML `referential` (broadcast) entry on an index past the
    broadcast budget must refuse loudly — a None index would silently
    pass every row (round-4 review finding)."""
    import yaml

    from metrics_ray.pipelines.clips import validate_checkpointed

    cfg = tmp_path / "suite.yaml"
    cfg.write_text(yaml.safe_dump(
        {"checks": [{"type": "referential"}], "keyed": []}))
    with pytest.raises(ValueError, match="broadcast budget"):
        validate_checkpointed(sf_unit, str(tmp_path / "ckpt"),
                              config_path=str(cfg),
                              broadcast_budget_rows=0)


def test_keyed_config_unique_key_honors_column(sf_unit, tmp_path):
    """The unique_key keyed audit must audit the CONFIGURED column —
    before round 4's fix it always audited clip_id and crashed when the
    factory projected a different column (review finding)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from metrics_ray.config import keyed_from_config

    keyed = keyed_from_config({"keyed": [
        {"type": "unique_key", "id": "codec_unique", "column": "codec"}]})

    def factory(columns=None):
        from metrics_ray.pipelines.clips import ensure_clips_parquet

        return rd.read_parquet(ensure_clips_parquet(sf_unit),
                               columns=columns)

    out = keyed["codec_unique"](factory)
    t = out.to_pandas()
    # codecs repeat heavily, so the audit must flag duplicate-key rows
    assert len(t) > 0 and (t["code"] == "DuplicateKey").all()


def test_stale_data_invalidates_keyed_results(sf_unit, tmp_path_factory):
    """Keyed audits consume the WHOLE dataset, so a stale/changed
    partition must invalidate the checkpointed keyed parquet too — a
    duplicate clip_id introduced by a replaced file would otherwise be
    served as passing from the pre-edit keyed result (round-4 core
    review finding)."""
    import pyarrow as pa

    from metrics_ray.checks.keyed import exact_duplicate_keys
    from metrics_ray.pipelines.clips import ensure_clips_hive
    from metrics_ray.state.checkpoint import checkpointed_validate
    from metrics_ray.suite import metadata_checks

    src = ensure_clips_hive(sf_unit)
    data = str(tmp_path_factory.mktemp("keyed_stale_hive"))
    for d in os.listdir(src):
        if d.startswith("partition="):
            shutil.copytree(os.path.join(src, d), os.path.join(data, d))
    ck = str(tmp_path_factory.mktemp("ckpt_keyed_stale"))
    keyed = {"clipid_unique_exact": lambda f: exact_duplicate_keys(
        f(["clip_id", "partition"]))}

    first = checkpointed_validate(data, metadata_checks(),
                                  checkpoint_dir=ck, wave_size=8,
                                  concurrency=2, keyed=dict(keyed))
    dup0 = first.violations.to_pandas()
    dup0 = set(dup0[dup0.check_id == "clipid_unique_exact"].clip_id)

    # replace one partition file with a copy that adds a NEW duplicate
    # of an existing clip_id
    p0 = os.path.join(data, "partition=0")
    f0 = sorted(f for f in os.listdir(p0) if f.endswith(".parquet"))[0]
    t = pq.read_table(os.path.join(p0, f0))
    extra = t.slice(0, 1)  # duplicate the first row's clip_id
    new_id = extra.column("clip_id").to_pylist()[0]
    assert new_id not in dup0  # the seeded dups don't already cover it
    pq.write_table(pa.concat_tables([t, extra]), os.path.join(p0, f0))

    second = checkpointed_validate(data, metadata_checks(),
                                   checkpoint_dir=ck, wave_size=8,
                                   concurrency=2, keyed=dict(keyed))
    dup1 = second.violations.to_pandas()
    dup1 = set(dup1[dup1.check_id == "clipid_unique_exact"].clip_id)
    assert new_id in dup1  # keyed audit re-ran over the changed data
    assert dup0 < dup1


def test_fingerprint_format_migration_message(sf_unit, tmp_path_factory):
    """A checkpoint written under an older fingerprint FORMAT must refuse
    resume with a message naming the version migration, not the generic
    different-run error."""
    import json

    from metrics_ray.checks.stateless import NonNullCheck
    from metrics_ray.pipelines.clips import ensure_clips_hive
    from metrics_ray.state.checkpoint import (CKPT_FORMAT_VERSION,
                                              checkpointed_validate)

    d = str(tmp_path_factory.mktemp("ckpt_ver"))
    path = ensure_clips_hive(sf_unit)
    checkpointed_validate(path, [NonNullCheck("t", "transcript")],
                          checkpoint_dir=d, concurrency=2)
    mpath = os.path.join(d, "MANIFEST.json")
    with open(mpath) as f:
        m = json.load(f)
    assert m["format_version"] == CKPT_FORMAT_VERSION
    # simulate a pre-upgrade checkpoint: stale digest, old format token
    m["fingerprint"] = "deadbeefdeadbeef"
    m["format_version"] = CKPT_FORMAT_VERSION - 1
    with open(mpath, "w") as f:
        json.dump(m, f)
    with pytest.raises(ValueError, match="format v"):
        checkpointed_validate(path, [NonNullCheck("t", "transcript")],
                              checkpoint_dir=d, concurrency=2)


def test_keyed_config_memoizes_index_builder(sf_unit):
    """A config listing BOTH index-consuming audits must derive the
    transcript index dataset ONCE per run, not once per audit (the
    builder callable is wrapped with a memoizing closure)."""
    import ray.data as rd

    from metrics_ray.config import keyed_from_config
    from metrics_ray.pipelines.clips import (ensure_clips_parquet,
                                             transcript_index_ds)

    calls = []

    def builder():
        calls.append(1)
        return transcript_index_ds(sf_unit, 1)

    keyed = keyed_from_config(
        {"keyed": [{"type": "referential_dist", "id": "ref"},
                   {"type": "transcript_editdist", "id": "ed", "cap": 4}]},
        transcript_index_ds=builder)

    def factory(columns=None):
        return rd.read_parquet(ensure_clips_parquet(sf_unit),
                               columns=columns)

    a = keyed["ref"](factory)
    b = keyed["ed"](factory)
    assert a.count() >= 0 and b.count() >= 0
    assert len(calls) == 1, f"index built {len(calls)} times, want 1"


def test_incremental_append_validates_only_new_partitions(
        sf_unit, tmp_path_factory):
    """The daily-ingest shape: append NEW partitions to an
    already-committed corpus, re-run, and only the new partitions are
    scanned — completed partitions' checkpoint records are untouched,
    the global sketches re-merge across both waves, and the manifest
    carries the lineage of all partitions."""
    from metrics_ray.pipelines.clips import ensure_clips_hive
    from metrics_ray.state.checkpoint import checkpointed_validate
    from metrics_ray.suite import metadata_checks, sketch_checks

    src = ensure_clips_hive(sf_unit)
    parts = sorted(d for d in os.listdir(src) if d.startswith("partition="))
    assert len(parts) == 8
    data = str(tmp_path_factory.mktemp("append_hive"))
    for d in parts[:6]:
        shutil.copytree(os.path.join(src, d), os.path.join(data, d))

    def checks():
        return metadata_checks() + sketch_checks()

    ck = str(tmp_path_factory.mktemp("ckpt_append"))
    first = checkpointed_validate(data, checks(), checkpoint_dir=ck,
                                  wave_size=4, concurrency=2)
    assert len(first.manifest["partitions"]) == 6
    rec_mtime = {p: os.path.getmtime(
        os.path.join(ck, "partitions", f"p{p}.json")) for p in range(6)}

    # day 2: two new partitions land
    for d in parts[6:]:
        shutil.copytree(os.path.join(src, d), os.path.join(data, d))
    second = checkpointed_validate(data, checks(), checkpoint_dir=ck,
                                   wave_size=4, concurrency=2)

    # only the appended partitions were scanned
    assert sorted(second.manifest["resumed_from"]) == list(range(6))
    for p in range(6):  # completed records not rewritten
        assert os.path.getmtime(
            os.path.join(ck, "partitions", f"p{p}.json")) == rec_mtime[p]
    assert len(second.manifest["partitions"]) == 8

    # global sketches re-merged across both waves == one-shot over all 8
    ck2 = str(tmp_path_factory.mktemp("ckpt_append_oneshot"))
    oneshot = checkpointed_validate(data, checks(), checkpoint_dir=ck2,
                                    wave_size=8, concurrency=2)
    ma = _sorted_df(second.metrics, ["check_id", "partition"])
    mb = _sorted_df(oneshot.metrics, ["check_id", "partition"])
    assert (ma.check_id.values == mb.check_id.values).all()
    exact = ~ma.is_estimate.values
    assert (ma.metric_value.values[exact]
            == pytest.approx(mb.metric_value.values[exact], abs=1e-12))
    assert (ma.metric_value.values[~exact]
            == pytest.approx(mb.metric_value.values[~exact], rel=0.05))
    va = _sorted_df(second.verdicts, ["partition"])
    vb = _sorted_df(oneshot.verdicts, ["partition"])
    assert (va.passed.values == vb.passed.values).all()


def test_capped_object_store_streams_without_stall(tmp_path):
    """The 10^12-row memory contract: the flagship suite must COMPLETE
    under an object store capped at ~2x one partition's payload (~80 MB
    vs the ~271 MB sf0.1 corpus) because batch sizing is store-aware
    (clips.OBJECT_STORE_BATCH_DIV). Before the round-5 fix the suite
    stage sat at zero submitted tasks behind backpressure (>10 min for a
    5 s corpus); this guards the wall at a generous 150 s and checks the
    capped run scans every row with identical violation totals."""
    import json
    import subprocess
    import sys

    script = tmp_path / "capped_run.py"
    script.write_text("""
import json, os, sys, time
sys.path.insert(0, %r)
import ray
ray.init(address='local', num_cpus=8,
         object_store_memory=80 * 1024 * 1024,
         include_dashboard=False, logging_level='ERROR')
from metrics_ray.pipelines.clips import validate_sf
t0 = time.time()
r = validate_sf('/root/testdata/sf0.1', concurrency=4)
print(json.dumps({'wall_s': time.time() - t0,
                  'rows': int(r.manifest['rows_scanned']),
                  'n_violations': int(r.manifest['n_violations']),
                  'partitions': int(len(r.verdicts))}))
ray.shutdown()
""" % os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)
    env["PYTHONPATH"] = os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run([sys.executable, str(script)], env=env,
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    d = json.loads(line)
    assert d["rows"] == 5036 and d["partitions"] == 8
    assert d["wall_s"] < 150, f"capped run crawled: {d['wall_s']:.0f}s"
    # violation totals identical to the in-session (uncapped) run
    from metrics_ray.pipelines.clips import validate_sf

    full = validate_sf("/root/testdata/sf0.1", concurrency=4)
    assert d["n_violations"] == int(full.manifest["n_violations"])
