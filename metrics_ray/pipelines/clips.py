"""Clip-table source pipelines: distributed synthesis, parquet caching, and
the validation entrypoint used by __ray_entry__ / bench.

The clips table is derived from the driver's documents.parquet (synth.py);
for repeated validation runs it is materialized ONCE to a partitioned parquet
cache under /tmp so every validation pass streams from storage with column
pruning — the same shape as production (clips living in Lance/parquet on
shared storage; ray.data.read_lance would replace read_parquet verbatim,
SURVEY.md §2.2)."""

from __future__ import annotations

import os
from functools import partial

import pyarrow.parquet as pq

from .. import synth
from ..runner import SuiteReport, run_suite
from ..suite import build_baseline_profile, default_ctx, full_checks, keyed_checks

CACHE_ROOT = os.environ.get("METRICS_RAY_CACHE", "/tmp/metrics_ray_cache")


def documents_count(sf_dir: str) -> int:
    return pq.read_metadata(os.path.join(sf_dir, "documents.parquet")).num_rows


def clips_dataset(sf_dir: str, replicas: int = 1, with_audio: bool = True,
                  dur_scale: float = 1.0, override_num_blocks: int | None = None):
    """Lazily derive the clips Dataset from documents.parquet — synthesis
    runs inside map_batches, so generation itself is distributed."""
    import ray
    import ray.data as rd

    from ..collect import require_nonempty_parquet

    path = os.path.join(sf_dir, "documents.parquet")
    # loud-failure contract: an empty source table would otherwise
    # surface downstream as opaque internals ("Must provide at least
    # one path" from a file-less parquet cache, concat of no tables)
    n_docs = require_nonempty_parquet(path, "documents")
    if override_num_blocks is None:
        # documents.parquet is one file → one read block → single-task
        # synthesis; split so PCM synth + encode parallelizes
        override_num_blocks = max(16, 2 * int(
            ray.cluster_resources().get("CPU", 8)))
    parts = []
    for r in range(replicas):
        ds = rd.read_parquet(path, columns=["doc_id", "text"],
                             override_num_blocks=override_num_blocks)
        parts.append(ds.map_batches(
            partial(synth.derive_clips_batch, n_docs=n_docs, replica=r,
                    with_audio=with_audio, dur_scale=dur_scale),
            batch_format="pyarrow", batch_size=256))
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def transcript_index_ds(sf_dir: str, replicas: int = 1):
    """Transcript index derived DISTRIBUTEDLY from the documents table —
    the two-pass derive-index-then-join shape of
    UsageOfIncorrectDomainOrRangeDatatypes.java:77-190 (the reference
    derives its constraint index FROM the dataset, then joins the dataset
    against it). The derivation runs where the data is; nothing passes
    through the driver — the consumer joins it with a bucketed exchange
    (checks/keyed.py bucketed_anti_join / stages/join.py), the path for
    an index too large to broadcast. n_docs comes from parquet metadata
    (no scan)."""
    from functools import partial as _partial

    import ray.data as rd

    n = pq.read_metadata(
        os.path.join(sf_dir, "documents.parquet")).num_rows
    parts = []
    for r in range(replicas):
        ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                             columns=["doc_id", "text"])
        parts.append(ds.map_batches(
            _partial(synth.derive_transcript_index_batch, n_docs=n, replica=r),
            batch_format="pyarrow"))
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def transcript_index_df(sf_dir: str, replicas: int = 1):
    """Small reference side table (broadcast side of the referential join)."""
    import pandas as pd

    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"])
    n = docs.num_rows
    frames = [synth.derive_transcript_index_batch(docs, n_docs=n, replica=r)
              .to_pandas() for r in range(replicas)]
    return pd.concat(frames, ignore_index=True)


def _source_fingerprint(sf_dir: str) -> str:
    """Short digest of the source documents.parquet identity (abspath +
    size + mtime): the cache tag must change when the SOURCE changes —
    a basename-only tag would silently serve clips derived from a
    different dataset that happens to share the directory name, or from
    a regenerated file at the same path."""
    import hashlib

    from .. import audio

    p = os.path.abspath(os.path.join(sf_dir, "documents.parquet"))
    st = os.stat(p)
    return hashlib.sha256(
        f"{p}|{st.st_size}|{st.st_mtime_ns}|v{audio.SYNTH_VERSION}"
        .encode()).hexdigest()[:10]


def _fresh_cache_dir(out: str, done: str) -> None:
    """Clear any partial write (dir exists, no _SUCCESS): Ray part-file
    names are per-execution uuids, so writing into crash leftovers would
    APPEND a second copy of the data and then commit the poisoned cache."""
    if os.path.exists(out):
        import shutil

        shutil.rmtree(out)
    os.makedirs(out, exist_ok=True)


def ensure_clips_parquet(sf_dir: str, replicas: int = 1,
                         dur_scale: float = 1.0) -> str:
    """Materialize the derived clips to a cached parquet dir (one-off cost);
    returns the cache path. Layout is resumable: multiple part files, the
    `partition` column preserved for per-partition verdicts/pruning."""
    tag = (f"clips_{os.path.basename(os.path.normpath(sf_dir))}"
           f"_r{replicas}_d{dur_scale}_{_source_fingerprint(sf_dir)}")
    out = os.path.join(CACHE_ROOT, tag)
    done = os.path.join(out, "_SUCCESS")
    if os.path.exists(done):
        return out
    _fresh_cache_dir(out, done)
    ds = clips_dataset(sf_dir, replicas=replicas, dur_scale=dur_scale)
    ds.write_parquet(out)
    with open(done, "w") as f:
        f.write("ok")
    return out


def ensure_clips_hive(sf_dir: str, replicas: int = 1,
                      dur_scale: float = 1.0) -> str:
    """Materialize the derived clips as a HIVE-partitioned parquet cache
    (``partition=N/`` dirs) — the resumable layout: one directory per
    partition so checkpoint/resume can skip completed partitions and a
    partition-scoped read touches only its own files."""
    tag = (f"clips_hive_{os.path.basename(os.path.normpath(sf_dir))}"
           f"_r{replicas}_d{dur_scale}_{_source_fingerprint(sf_dir)}")
    out = os.path.join(CACHE_ROOT, tag)
    done = os.path.join(out, "_SUCCESS")
    if os.path.exists(done):
        return out
    _fresh_cache_dir(out, done)
    ds = clips_dataset(sf_dir, replicas=replicas, dur_scale=dur_scale)
    ds.write_parquet(out, partition_cols=["partition"])
    with open(done, "w") as f:
        f.write("ok")
    return out


# Per-executor-call input budget. The suite's per-call fixed cost (20
# checks x per-batch numpy/Arrow overhead) is amortized by LARGER batches
# — measured 1.5x on the staged core pass going 256 -> 1024 rows at
# ~52 kB/clip — but a fixed row count is wrong for big payloads (a 30 s
# 48 kHz clip is ~2.9 MB; 1024 of them is a 3 GB batch). Budget BYTES,
# derive rows.
TARGET_BATCH_BYTES = 64 << 20
# One batch may occupy at most 1/OBJECT_STORE_BATCH_DIV of the cluster's
# object store. Ray Data grants each operator a FRACTION of the store as
# its memory budget and gathers a full batch_size of queued blocks before
# submitting a task — if one bundle exceeds that budget, the executor
# degenerates into a backpressured trickle (observed at sf0.1 under an
# object_store_memory cap: the suite stage sat at 0 submitted tasks while
# the reader leaked ~1 block/5 s; wall went 5 s → >10 min). Dividing by
# 16 leaves room for ~5 in-flight tasks' inputs+outputs plus queues.
OBJECT_STORE_BATCH_DIV = 16


def _store_capped_target() -> int:
    """TARGET_BATCH_BYTES clamped to object_store/OBJECT_STORE_BATCH_DIV
    when a Ray session is up — the memory-aware half of batch sizing
    (the 10^12-row contract: batch bytes scale DOWN with the store, the
    streaming executor keeps pipelining instead of stalling)."""
    try:
        import ray

        if ray.is_initialized():
            store = int(ray.cluster_resources().get(
                "object_store_memory", 0))
            if store > 0:
                return max(1 << 20,
                           min(TARGET_BATCH_BYTES,
                               store // OBJECT_STORE_BATCH_DIV))
    except Exception:
        pass
    return TARGET_BATCH_BYTES


def auto_batch_size(parquet_dir: str, lo: int = 16, hi: int = 2048) -> int:
    """Payload-aware batch size for the suite pass: rows per executor call
    such that one call sees ~TARGET_BATCH_BYTES of on-disk input (capped
    so a batch fits the per-operator object-store budget — see
    OBJECT_STORE_BATCH_DIV). Derived from the cache's parquet footers
    (bytes and rows), clamped to [lo, hi]; falls back to 256 if the
    directory can't be inspected."""
    import pyarrow.parquet as pq

    try:
        total_b = total_r = 0
        for root, _dirs, files in os.walk(parquet_dir):
            for fn in files:
                if not fn.endswith(".parquet"):
                    continue
                p = os.path.join(root, fn)
                total_b += os.path.getsize(p)
                total_r += pq.ParquetFile(p).metadata.num_rows
        if not total_b or not total_r:
            return 256
        target = _store_capped_target()
        return int(min(hi, max(lo, target / (total_b / total_r))))
    except Exception:  # unreadable dir / corrupt footer (ArrowInvalid):
        return 256      # sizing is an optimization, never a failure mode


def validate_checkpointed(sf_dir: str, checkpoint_dir: str,
                          replicas: int = 1, wave_size: int = 4,
                          with_decode: bool = True,
                          with_editdist: bool = True,
                          fail_after_waves: int | None = None,
                          batch_size: int | None = None, concurrency=None,
                          broadcast_budget_rows: int | None = None,
                          config_path: str | None = None):
    """Resumable flagship run: hive cache → wave-checkpointed suite
    (metrics_ray.state.checkpoint). Re-entrant: call again with the same
    checkpoint_dir after a crash to resume from completed partitions.

    ``config_path`` switches suite assembly to the declarative config
    (checks: batch checks, keyed: global audits — SURVEY §2.9): the YAML
    decides the whole suite, including the referential strategy (list
    the ``referential`` batch check for broadcast, or the
    ``referential_dist`` keyed audit past the broadcast budget — a
    broadcast ``referential`` entry on an index past the budget REFUSES
    loudly rather than silently passing everything); with_decode /
    with_editdist are ignored in config mode. The keyed audit list and
    its parameters join the checkpoint fingerprint, so resuming after a
    keyed-config edit refuses exactly like a batch-check edit.

    Referential strategy follows the same broadcast-budget switch as
    validate_sf (the keyed distributed path is itself checkpointed
    wholesale under keyed/, so a resume never re-runs it). The strategy
    is part of the checkpoint fingerprint — resuming a broadcast-strategy
    checkpoint with the distributed strategy refuses loudly.

    ``with_editdist`` adds the graded transcript-drift gate
    (checks.referential.transcript_editdist_violations) as a keyed,
    checkpointed audit — the ray-job surface of the standalone
    val_transcript_editdist query."""
    import json as _json

    from ..checks.referential import (EDITDIST_DEFAULT_CAP,
                                      ReferentialCheck,
                                      referential_violations_dist,
                                      transcript_editdist_violations)
    from ..state.checkpoint import checkpointed_validate

    path = ensure_clips_hive(sf_dir, replicas=replicas)
    budget = (BROADCAST_BUDGET_ROWS if broadcast_budget_rows is None
              else broadcast_budget_rows)
    index_rows = documents_count(sf_dir) * replicas
    dist_referential = index_rows > budget
    if config_path is not None:
        from ..config import _load_cfg, checks_from_config, keyed_from_config

        cfg = _load_cfg(config_path)
        checks = checks_from_config(cfg)
        keyed = keyed_from_config(
            cfg,
            transcript_index_ds=lambda: transcript_index_ds(
                sf_dir, replicas))
        needs_index = any(isinstance(c, ReferentialCheck) for c in checks)
        if needs_index and dist_referential:
            # the broadcast check would silently pass every row with a
            # None index — refuse instead (config.py's loud-failure
            # contract)
            raise ValueError(
                f"config lists the broadcast `referential` batch check "
                f"but the transcript index ({index_rows} rows) exceeds "
                f"the broadcast budget ({budget}); list the "
                f"`referential_dist` keyed audit instead")
        # the index is driver-built + broadcast — only pay for it when a
        # configured check actually consumes it
        ctx = default_ctx(transcript_index=(
            transcript_index_df(sf_dir, replicas) if needs_index else None))
        keyed_spec = _json.dumps(cfg.get("keyed", []), sort_keys=True)
    else:
        ctx = default_ctx(
            transcript_index=(None if dist_referential
                              else transcript_index_df(sf_dir, replicas)))
        checks = full_checks(with_decode=with_decode,
                             with_referential=not dist_referential)
        keyed = keyed_checks()
        if dist_referential:
            keyed["referential_transcript"] = \
                lambda f: referential_violations_dist(
                    f(["clip_id", "transcript", "partition"]),
                    transcript_index_ds(sf_dir, replicas))
        if with_editdist:
            keyed["transcript_editdist"] = \
                lambda f: transcript_editdist_violations(
                    f(["clip_id", "transcript", "partition"]),
                    transcript_index_ds(sf_dir, replicas))
        keyed_spec = _json.dumps(
            {"keyed": sorted(keyed),
             "editdist_cap": EDITDIST_DEFAULT_CAP if with_editdist
             else None},
            sort_keys=True)
    return checkpointed_validate(
        path, checks,
        ctx=ctx, checkpoint_dir=checkpoint_dir, keyed=keyed,
        wave_size=wave_size,
        batch_size=batch_size if batch_size else auto_batch_size(path),
        concurrency=concurrency,
        keyed_spec=keyed_spec,
        fail_after_waves=fail_after_waves)


def time_core_pass(factory, sf_dir: str, replicas: int = 1,
                   batch_size: int = 256) -> float:
    """Time the core streaming validation pass alone (no concurrent keyed
    pipelines): the per-row component that dominates wall time at
    production row counts. Used by the scaling bench to report the
    engine's streaming scaling separately from the fixed-latency shuffle
    and driver-reduce tail."""
    import time

    from ..runner import run_batch_checks

    ctx = default_ctx(transcript_index=transcript_index_df(sf_dir, replicas))
    checks = full_checks()
    cols = set()
    for c in checks:
        cols.update(c.columns)
    t0 = time.time()
    run_batch_checks(factory(sorted(cols)), checks, ctx,
                     batch_size=batch_size)
    return time.time() - t0


def clips_factory(parquet_dir: str):
    """→ ds_factory(columns) reading the cached clips with projection
    pruning (prune-at-the-read: a keyed check over clip_id never touches
    the audio payload column)."""
    import ray.data as rd

    def factory(columns=None):
        files = [os.path.join(parquet_dir, f)
                 for f in sorted(os.listdir(parquet_dir))
                 if f.endswith(".parquet")]
        return rd.read_parquet(files, columns=columns)

    return factory


def validate_sf(sf_dir: str, replicas: int = 1, with_decode: bool = True,
                with_content_dedup: bool = True, dur_scale: float = 1.0,
                batch_size: int | None = None, concurrency=None,
                baseline_sf_dir: str | None = None,
                stage_in_memory: bool = False,
                broadcast_budget_rows: int | None = None,
                violations_sink: str | None = None) -> SuiteReport:
    """The flagship pipeline: derive/cache clips → full check suite.

    ``baseline_sf_dir`` supplies the clean reference generation for the
    drift check's baseline profile (defaults to self-profile).

    ``stage_in_memory`` materializes the clip table into the Ray object
    store before validation, so the suite reads from distributed memory
    instead of local disk. Used by the scaling bench: this sandbox has ONE
    local disk, so a disk-streaming run is bandwidth-bound at every CPU
    count — on a real cluster, storage bandwidth scales with nodes. The
    staged run isolates what the north_rule measures: how the ENGINE
    scales from N to 4N workers on identical input."""
    path = ensure_clips_parquet(sf_dir, replicas=replicas, dur_scale=dur_scale)
    factory = clips_factory(path)
    if stage_in_memory:
        factory = staged_factory(path)
    return validate_with_factory(
        factory, sf_dir, replicas=replicas, with_decode=with_decode,
        with_content_dedup=with_content_dedup,
        batch_size=batch_size if batch_size else auto_batch_size(path),
        concurrency=concurrency,
        baseline_factory=(clips_factory(ensure_clips_parquet(
            baseline_sf_dir, replicas=replicas, dur_scale=dur_scale))
            if baseline_sf_dir else None),
        broadcast_budget_rows=broadcast_budget_rows,
        violations_sink=violations_sink)


def staged_factory(parquet_dir: str):
    """Materialize the clip table into the Ray object store once and serve
    column selections from it (the in-memory input for scaling runs).

    The materialized blocks are re-wrapped via ``from_arrow_refs`` so
    every derived dataset provably starts from the in-store blocks
    independent of Ray's MaterializedDataset re-planning behavior (the
    pinned 2.49.2 already rebases materialize() on InputData; the wrap
    guards the scaling-bench contract against version drift)."""
    import ray
    import ray.data as rd

    refs = clips_factory(parquet_dir)(None).materialize().to_arrow_refs()

    def factory(columns=None):
        ds = rd.from_arrow_refs(refs)
        return ds.select_columns(columns) if columns else ds

    # consumers that only need a column slice (baseline profile) read the
    # blocks directly in a task wave — an Arrow column select inside the
    # task is zero-copy, vs select_columns' projection job that rewrites
    # every payload-bearing block
    factory.block_refs = tuple(refs)
    return factory


# Broadcast budget for the referential side index (rows). Below this the
# index ships once via ray.put and every executor does local hash lookups;
# above it the flagship auto-switches to the bucketed co-group path
# (referential_violations_dist) — a driver pandas materialization of a
# 10^12-row index would be a corpus-sized driver allocation. ~2M rows of
# (clip_id, transcript) is low hundreds of MB: comfortably broadcastable.
BROADCAST_BUDGET_ROWS = int(os.environ.get(
    "METRICS_RAY_BCAST_BUDGET_ROWS", 2_000_000))


def validate_with_factory(factory, sf_dir: str, replicas: int = 1,
                          with_decode: bool = True,
                          with_content_dedup: bool = True,
                          batch_size: int = 256, concurrency=None,
                          baseline_factory=None,
                          fuse_content_dedup: bool = True,
                          broadcast_budget_rows: int | None = None,
                          violations_sink: str | None = None) -> SuiteReport:
    """Run the full check suite over an arbitrary clip ds_factory.

    ``fuse_content_dedup=True`` (default): the shared batch pass hashes
    (bytes, transcript) while the payload is in memory and emits key rows;
    the dedup shuffle consumes those, so the payload columns are read
    exactly once — the right trade when the input streams from storage.
    ``False`` runs dedup as an independent concurrent pipeline re-reading
    the payload — better when the input is already in the object store
    (a memory re-read is cheaper than serializing the extra stage behind
    the batch pass).

    The referential check picks its execution strategy by index size:
    at or below ``broadcast_budget_rows`` (default BROADCAST_BUDGET_ROWS)
    the index is driver-built and broadcast (ReferentialCheck); above it
    the index is derived distributedly (transcript_index_ds) and checked
    via one bucketed co-group (referential_violations_dist) — identical
    verdicts, no driver materialization."""
    from ..checks.keyed import (
        ContentHashCheck,
        KeyUniquenessEmitter,
        composite_fused_duplicates,
        exact_duplicate_keys_from_keys,
    )
    from ..checks.referential import referential_violations_dist

    budget = (BROADCAST_BUDGET_ROWS if broadcast_budget_rows is None
              else broadcast_budget_rows)
    index_rows = documents_count(sf_dir) * replicas
    dist_referential = index_rows > budget

    # the two before()-style side inputs — baseline profile (one pruned
    # Ray pass) and transcript index (driver pandas derive, broadcast
    # path only) — are independent; build them concurrently so their
    # fixed latencies overlap instead of stacking ahead of the suite
    from concurrent.futures import ThreadPoolExecutor

    from .. import harden_fsspec_race

    harden_fsspec_race()
    import time as _time
    t_side = _time.time()
    # the transcript index (broadcast path) gates the pass — build it now;
    # the baseline profile is consumed only at driver-side finalize
    # (DriftCheck bins on declared edges), so its Ray pass runs
    # CONCURRENTLY with the suite and is resolved lazily by run_suite
    pool = ThreadPoolExecutor(max_workers=2)
    fut_profile = pool.submit(build_baseline_profile,
                              baseline_factory or factory)
    index = (None if dist_referential
             else transcript_index_df(sf_dir, replicas))
    pool.shutdown(wait=False)
    side_inputs_s = round(_time.time() - t_side, 3)
    ctx = default_ctx(transcript_index=index,
                      baseline_profile=fut_profile.result)
    keyed_from_keys = None
    keyed_composite = None
    if fuse_content_dedup:
        # fused mode: EVERY keyed check consumes key rows emitted by the
        # shared batch pass — one source scan total, and no independent
        # pipeline contends with the decode-heavy pass for cpus. With
        # both keyed checks active they share ONE composite-key exchange
        # (composite_fused_duplicates) instead of one exchange each —
        # halves the per-exchange fixed latencies that dominate the
        # suite's scaling tail on small drivers (BASELINE.md round-3
        # trials 14-17); violations are byte-identical (pinned by
        # tests/test_runner.py::test_unfused_keyed_path_matches_fused).
        if with_content_dedup:
            keyed_composite = (
                [KeyUniquenessEmitter(), ContentHashCheck()],
                composite_fused_duplicates,
                ["clipid_unique_exact", "content_dedup"])
        else:
            keyed_from_keys = {"clipid_unique_exact": (
                KeyUniquenessEmitter(), exact_duplicate_keys_from_keys)}
        keyed = {}
    else:
        keyed = keyed_checks(with_content_dedup=with_content_dedup)
    if dist_referential:
        keyed["referential_transcript"] = lambda f: referential_violations_dist(
            f(["clip_id", "transcript", "partition"]),
            transcript_index_ds(sf_dir, replicas))
    report = run_suite(factory,
                       full_checks(with_decode=with_decode,
                                   with_referential=not dist_referential),
                       ctx=ctx,
                       keyed=keyed,
                       batch_size=batch_size,
                       concurrency=concurrency,
                       keyed_from_keys=keyed_from_keys,
                       keyed_composite=keyed_composite,
                       violations_sink=violations_sink)
    report.manifest["side_inputs_s"] = side_inputs_s
    return report
