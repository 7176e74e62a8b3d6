"""WebDataset-style tar shard sink for audio clip + transcript pairs.

The standard multimodal training-data layout (tar shards consumed
sequentially by data loaders): each sample contributes members
``<clip_id>.bin`` (payload bytes), ``<clip_id>.json`` (metadata) and
``<clip_id>.txt`` (transcript, omitted for null transcripts — the
WebDataset missing-member convention); samples are grouped into
``partition=P/shard-%05d.tar`` files cut by a per-shard DURATION budget.
Duration is a metadata column, so the shard assignment is a pure
SQL-mirrorable function of the corpus (``val_wds_shards``'s oracle) —
payload byte sizes are codec-compressed and data-dependent, so a
byte-budget cut could not be oracle-verified.

Deterministic bytes: members in clip_id order, zeroed mtimes/owners/modes,
so a committed shard is byte-identical across runs, workers and batch
sizes (asserted by tests/test_webdataset.py).

Resumability (the pipelines/curate.py contract): one directory per
partition, committed atomically with a ``_SUCCESS`` manifest carrying the
partition's counts and shard list; a re-run skips committed partitions.

Filesystem contract: ``out_dir`` must be visible to every node (shared /
distributed filesystem or object-store mount) — the SAME assumption
``Dataset.write_parquet`` makes — because shard-writer tasks run on
workers while the partition commit (directory rename + manifest) runs on
the coordinating driver thread.

Scale shape: shard assignment is the pack_clips prefix scan over
metadata keys only (O(partition rows) keys on the coordinating thread,
bounded by shard-layout design exactly like curate's pack map); payload
bytes move exactly once, from the partition scan into the tar-writer
task that owns the shard (one groupby exchange keyed by shard index,
one writer task per shard). Partitions are processed in concurrent
waves — parallelism across partitions at design scale, across shards
within one.
"""

from __future__ import annotations

import hashlib
import io
import json
import os
import shutil
import tarfile

import numpy as np
import pandas as pd
import pyarrow as pa

SHARD_MS = 120_000  # duration budget per tar shard

_WDS_COLUMNS = ("clip_id", "bytes", "sr_hz", "dur_ms", "codec",
                "transcript")


def shard_assign(keys: pd.DataFrame, shard_ms: int = SHARD_MS
                 ) -> pd.DataFrame:
    """Deterministic shard index per clip within ONE partition: clips in
    clip_id order, shard = exclusive-prefix-duration // shard_ms (the
    pack_clips cut). Non-positive durations are excluded (they are the
    range check's violations, not trainable samples)."""
    # duplicate check BEFORE the duration filter: a duplicate pair where
    # one copy has non-positive duration would otherwise evade this guard
    # while the writers' clip_id-keyed row filters still pass BOTH copies
    # (colliding tar member names, inflated n_members — committed
    # silently in exchange mode)
    dup = keys["clip_id"].duplicated()
    if dup.any():
        # within-partition clip_id uniqueness is the layout invariant this
        # sink (member names, assignment map) is built on — the same
        # invariant clipid_unique_exact validates. Fail loudly instead of
        # colliding tar member names / crashing in pandas map.
        raise ValueError(
            "duplicate clip_id within a partition "
            f"(e.g. {keys.loc[dup, 'clip_id'].iloc[0]!r}); run the "
            "key-uniqueness check / dedup before sharding")
    keys = keys[keys["dur_ms"] > 0].sort_values("clip_id", kind="stable")
    dur = keys["dur_ms"].to_numpy(dtype="int64")
    prefix = np.cumsum(dur) - dur
    return pd.DataFrame({
        "clip_id": keys["clip_id"].to_numpy(),
        "dur_ms": dur,
        "shard_idx": prefix // shard_ms,
    })


def _tar_bytes(rows: list[dict]) -> bytes:
    """One deterministic tar: rows (already one shard) in clip_id order,
    three members per sample, zeroed metadata."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for r in sorted(rows, key=lambda r: r["clip_id"]):
            meta = {"clip_id": r["clip_id"], "sr_hz": int(r["sr_hz"]),
                    "dur_ms": int(r["dur_ms"]), "codec": r["codec"]}
            members = [(r["clip_id"] + ".bin", r["bytes"] or b""),
                       (r["clip_id"] + ".json",
                        json.dumps(meta, sort_keys=True).encode())]
            if r["transcript"] is not None:
                members.append((r["clip_id"] + ".txt",
                                r["transcript"].encode()))
            for name, payload in members:
                ti = tarfile.TarInfo(name=name)
                ti.size = len(payload)
                ti.mtime = 0
                ti.uid = ti.gid = 0
                ti.uname = ti.gname = ""
                ti.mode = 0o644
                tf.addfile(ti, io.BytesIO(payload))
    return buf.getvalue()


_WAVE_SCHEMA = pa.schema([
    ("part", pa.string()), ("shard_idx", pa.int64()),
    ("n_members", pa.int64()), ("total_ms", pa.int64()),
    ("sha256", pa.string()),
])


def _write_wave(part_dirs: dict, out_dirs: dict, shard_ms: int) -> dict:
    """Shard a WAVE of partitions into tars with ONE Ray Data job: every
    payload row is tagged (partition, shard_idx) via a broadcast
    assignment map (metadata-only prefix scans, read locally on the
    coordinating thread), the whole wave goes through a single composite
    co-group keyed by (part, shard), and each shard's writer task emits
    one tar + one manifest row. One streaming execution per wave instead
    of two per partition — the per-job driver overhead is what dominated
    the per-partition form at small partition sizes.

    Commit stays PER PARTITION: tars land under <out>/partition=P.tmp,
    each partition's directory rename + _SUCCESS happens only after the
    wave job finishes (a crash mid-wave commits nothing from that wave —
    the wave is the progressive-commit granule, bounded by wave_size).
    Returns {partition_name: manifest_counts}."""
    import glob

    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from ..checks.keyed import grouped_apply

    assigns, tmp_dirs, files = {}, {}, []
    total_shards = 0
    for pname, pdir in part_dirs.items():
        meta = pq.read_table(pdir,
                             columns=["clip_id", "dur_ms"]).to_pandas()
        assign = shard_assign(meta, shard_ms)
        assigns[pname] = (
            pa.array(assign["clip_id"], pa.string()),
            pd.Series(assign["shard_idx"].to_numpy(),
                      index=assign["clip_id"].to_numpy(), dtype="int64"))
        total_shards += (int(assign["shard_idx"].max()) + 1
                         if len(assign) else 0)
        tmp = out_dirs[pname] + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)
        tmp_dirs[pname] = tmp
        # explicit file list: include_paths needs files, and the path is
        # how tag() recovers which partition a block belongs to
        files.extend(sorted(glob.glob(os.path.join(pdir, "*.parquet"))))
    assign_ref = ray.put(assigns)

    def tag(b: pa.Table) -> pa.Table:
        amap = ray.get(assign_ref)
        paths = b.column("path").to_pylist()
        parts = [os.path.basename(os.path.dirname(p)) for p in paths]
        b = (b.drop_columns(["path"])
             .append_column("part", pa.array(parts, pa.string())))
        outs = []
        # blocks come from single files, so this loop is ~1 iteration
        for pname in sorted(set(parts)):
            keep_keys, shard_map = amap[pname]
            g = b.filter(pc.equal(b.column("part"), pname))
            kept = g.filter(pc.is_in(g.column("clip_id"),
                                     value_set=keep_keys))
            ids = pd.Series(kept.column("clip_id").to_pylist())
            outs.append(kept.append_column(
                "shard_idx",
                pa.array(ids.map(shard_map).to_numpy(np.int64))))
        return pa.concat_tables(outs) if outs else b.append_column(
            "shard_idx", pa.nulls(0, pa.int64()))

    def write_shard(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for (pname, sid), g in df.groupby(["part", "shard_idx"],
                                          sort=False):
            blob = _tar_bytes(g.to_dict("records"))
            path = os.path.join(tmp_dirs[pname],
                                f"shard-{int(sid):05d}.tar")
            with open(path + ".part", "wb") as f:
                f.write(blob)
            os.replace(path + ".part", path)
            outs.append({"part": pname, "shard_idx": int(sid),
                         "n_members": len(g),
                         "total_ms": int(g["dur_ms"].sum()),
                         "sha256": hashlib.sha256(blob).hexdigest()})
        return pd.DataFrame(outs, columns=[f.name for f in _WAVE_SCHEMA])

    ds = rd.read_parquet(files, columns=list(_WDS_COLUMNS),
                         include_paths=True)
    rows = grouped_apply(
        ds.map_batches(tag, batch_format="pyarrow"),
        ["part", "shard_idx"], write_shard,
        n_buckets=max(total_shards, 1),
        out_schema=_WAVE_SCHEMA).to_pandas()
    if "part" not in rows.columns:
        # a wave whose every clip fails the dur_ms > 0 filter produces
        # ZERO blocks — to_pandas then has no columns at all; partitions
        # must still COMMIT empty manifests
        rows = pd.DataFrame({f.name: pd.Series(
            dtype=f.type.to_pandas_dtype()) for f in _WAVE_SCHEMA})

    results = {}
    for pname in part_dirs:
        mine = (rows[rows["part"] == pname]
                .drop(columns="part").sort_values("shard_idx"))
        counts = {
            "n_members": int(mine["n_members"].sum()),
            "n_shards": int(len(mine)),
            "total_ms": int(mine["total_ms"].sum()),
            "shards": mine.to_dict("records"),
        }
        # atomic partition commit: the rename IS the commit point, the
        # _SUCCESS manifest makes the skip decision durable
        out_part_dir = out_dirs[pname]
        shutil.rmtree(out_part_dir, ignore_errors=True)
        os.replace(tmp_dirs[pname], out_part_dir)
        # marker written atomically: a torn _SUCCESS would crash every
        # resume/read/verify with JSONDecodeError
        marker_tmp = os.path.join(out_part_dir, "_SUCCESS.tmp")
        with open(marker_tmp, "w") as f:
            json.dump(counts, f, sort_keys=True)
        os.replace(marker_tmp, os.path.join(out_part_dir, "_SUCCESS"))
        results[pname] = counts
    return results


def _write_partition(part_dir: str, out_part_dir: str,
                     shard_ms: int) -> dict:
    """Single-partition wrapper over the wave writer (kept as the
    unit-testable seam)."""
    pname = os.path.basename(os.path.normpath(part_dir))
    return _write_wave({pname: part_dir}, {pname: out_part_dir},
                       shard_ms)[pname]


def _partition_tar_rows(part_dir: str, tmp_dir: str,
                        shard_ms: int) -> list[dict]:
    """Write every shard of ONE partition from a single streaming pass
    over its parquet files — payload moves storage → writer exactly once,
    with NO object-store exchange (the wave-job form shuffles every
    payload byte through a sort exchange keyed by shard; at payload
    volumes that doubles data movement and was the dominant cost of the
    sink at bench scale).

    Shard membership is the same shard_assign prefix scan (metadata
    only); rows accumulate per shard and each shard's tar is flushed the
    moment its expected member count arrives, so in-flight memory is
    bounded by how far file order strays from clip_id order — worst case
    one partition, the same bound the partition-commit layout already
    assumes. Tar bytes are byte-identical to the wave job's (_tar_bytes
    on clip_id-sorted members; asserted by tests/test_webdataset.py)."""
    import glob

    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(part_dir, "*.parquet")))
    meta = pq.read_table(part_dir,
                         columns=["clip_id", "dur_ms"]).to_pandas()
    assign = shard_assign(meta, shard_ms)
    if not len(assign):
        return []
    shard_of = dict(zip(assign["clip_id"], assign["shard_idx"]))
    expected = assign.groupby("shard_idx").size().to_dict()
    acc: dict[int, list[dict]] = {}
    out_rows: list[dict] = []

    def flush(sid: int) -> None:
        rows = acc.pop(sid)
        blob = _tar_bytes(rows)
        path = os.path.join(tmp_dir, f"shard-{int(sid):05d}.tar")
        with open(path + ".part", "wb") as f:
            f.write(blob)
        os.replace(path + ".part", path)
        out_rows.append({
            "shard_idx": int(sid), "n_members": len(rows),
            "total_ms": int(sum(r["dur_ms"] for r in rows)),
            "sha256": hashlib.sha256(blob).hexdigest()})

    for fn in files:
        pf = pq.ParquetFile(fn)
        for rg in range(pf.num_row_groups):
            t = pf.read_row_group(rg, columns=list(_WDS_COLUMNS))
            for r in t.to_pylist():
                sid = shard_of.get(r["clip_id"])
                if sid is None:  # dur_ms <= 0: range-check domain
                    continue
                acc.setdefault(int(sid), []).append(r)
                if len(acc[int(sid)]) == expected[sid]:
                    flush(int(sid))
    if acc:  # every member was scanned, so every shard must have flushed
        raise RuntimeError(
            f"shards {sorted(acc)} incomplete after full partition scan "
            f"of {part_dir} — assignment/metadata mismatch")
    return sorted(out_rows, key=lambda r: r["shard_idx"])


def _write_wave_tasks(part_dirs: dict, out_dirs: dict,
                      shard_ms: int) -> dict:
    """One Ray TASK per partition (no Ray Data job, no exchange): each
    task streams its partition and writes its shards
    (_partition_tar_rows); the coordinating thread then commits each
    partition atomically exactly as the wave job does. Parallelism
    across partitions — the design-scale axis (millions of partitions)
    — instead of across shards within one."""
    import ray

    task = ray.remote(_partition_tar_rows)
    tmp_dirs, futs = {}, {}
    for pname, pdir in part_dirs.items():
        tmp = out_dirs[pname] + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)
        tmp_dirs[pname] = tmp
        futs[pname] = task.remote(pdir, tmp, shard_ms)

    results = {}
    for pname in part_dirs:
        shards = ray.get(futs[pname])
        counts = {
            "n_members": int(sum(s["n_members"] for s in shards)),
            "n_shards": len(shards),
            "total_ms": int(sum(s["total_ms"] for s in shards)),
            "shards": shards,
        }
        out_part_dir = out_dirs[pname]
        shutil.rmtree(out_part_dir, ignore_errors=True)
        os.replace(tmp_dirs[pname], out_part_dir)
        marker_tmp = os.path.join(out_part_dir, "_SUCCESS.tmp")
        with open(marker_tmp, "w") as f:
            json.dump(counts, f, sort_keys=True)
        os.replace(marker_tmp, os.path.join(out_part_dir, "_SUCCESS"))
        results[pname] = counts
    return results


def read_webdataset(root: str):
    """Dataset over a WebDataset directory written by
    ``write_webdataset_sf``: one untar task per tar shard (shard paths
    fan out via from_items; a flat map_batches re-assembles each shard's
    members into clip rows) — shard-parallel and streaming, the standard
    consumption shape for tar-sharded training data. Missing ``.txt``
    members yield null transcripts (the sink's null convention)."""
    import ray.data as rd

    items = []
    for pname in sorted(os.listdir(root)):
        pdir = os.path.join(root, pname)
        # only COMMITTED partitions: a ``partition=<int>`` dir carrying its
        # _SUCCESS manifest; ``.tmp`` crash leftovers and partials are
        # invisible to readers (the commit contract)
        if not (pname.startswith("partition=") and os.path.isdir(pdir)
                and pname.split("=")[1].isdigit()
                and os.path.exists(os.path.join(pdir, "_SUCCESS"))):
            continue
        part = int(pname.split("=")[1])
        for f in sorted(os.listdir(pdir)):
            if f.endswith(".tar"):
                items.append({"path": os.path.join(pdir, f),
                              "partition": part})

    def untar(b: pa.Table) -> pa.Table:
        rows = {"clip_id": [], "bytes": [], "sr_hz": [], "dur_ms": [],
                "codec": [], "transcript": [], "partition": []}
        for path, part in zip(b.column("path").to_pylist(),
                              b.column("partition").to_pylist()):
            samples: dict[str, dict] = {}
            with tarfile.open(path) as tf:
                for m in tf.getmembers():
                    cid, ext = m.name.rsplit(".", 1)
                    samples.setdefault(cid, {})[ext] = \
                        tf.extractfile(m).read()
            for cid in sorted(samples):
                s = samples[cid]
                meta = json.loads(s["json"])
                rows["clip_id"].append(cid)
                rows["bytes"].append(s["bin"])
                rows["sr_hz"].append(int(meta["sr_hz"]))
                rows["dur_ms"].append(int(meta["dur_ms"]))
                rows["codec"].append(meta["codec"])
                rows["transcript"].append(
                    s["txt"].decode() if "txt" in s else None)
                rows["partition"].append(part)
        return pa.table({
            "clip_id": pa.array(rows["clip_id"], pa.string()),
            "bytes": pa.array(rows["bytes"], pa.binary()),
            "sr_hz": pa.array(rows["sr_hz"], pa.int32()),
            "dur_ms": pa.array(rows["dur_ms"], pa.int32()),
            "codec": pa.array(rows["codec"], pa.string()),
            "transcript": pa.array(rows["transcript"], pa.string()),
            "partition": pa.array(rows["partition"], pa.int32()),
        })

    return rd.from_items(items).map_batches(untar, batch_format="pyarrow",
                                            batch_size=1)


def verify_webdataset(root: str):
    """Integrity audit of a WebDataset directory against its committed
    manifests (the pre-training check that catches partial copies,
    truncated tars and bit-rot): one Ray task per manifest shard entry
    re-hashes the tar and compares sha256 + member count. Returns a
    Dataset of (partition, shard_idx, ok, reason) — shard-parallel, no
    payload leaves the hashing task. Missing tars and tars on disk that
    the manifest doesn't list are both violations."""
    import ray.data as rd

    items = []
    for pname in sorted(os.listdir(root)):
        pdir = os.path.join(root, pname)
        marker = os.path.join(pdir, "_SUCCESS")
        if not (pname.startswith("partition=") and os.path.isdir(pdir)
                and pname.split("=")[1].isdigit()
                and os.path.exists(marker)):
            continue
        part = int(pname.split("=")[1])
        with open(marker) as f:
            counts = json.load(f)
        listed = set()
        for s in counts["shards"]:
            listed.add(int(s["shard_idx"]))
            items.append({"partition": part, "shard_idx": int(s["shard_idx"]),
                          "path": os.path.join(
                              pdir, f"shard-{int(s['shard_idx']):05d}.tar"),
                          "sha256": s["sha256"],
                          "n_members": int(s["n_members"])})
        # exact-FILENAME comparison: parsing digits would let a stray
        # shard-1.tar alias listed shard-00001.tar and evade the audit
        listed_names = {f"shard-{sid:05d}.tar" for sid in listed}
        for f_ in os.listdir(pdir):
            if not f_.endswith(".tar") or f_ in listed_names:
                continue
            # ANY tar the manifest doesn't list is a violation — including
            # misnamed ones (backup.tar, shard-old.tar), which must be
            # reported, not crash the audit on int()
            stem = f_[len("shard-"):-len(".tar")] \
                if f_.startswith("shard-") else ""
            sid = int(stem) if stem.isdigit() else -1
            items.append({"partition": part, "shard_idx": sid,
                          "path": os.path.join(pdir, f_),
                          "sha256": None, "n_members": -1})

    def audit(b: pa.Table) -> pa.Table:
        rows = {"partition": [], "shard_idx": [], "ok": [], "reason": []}
        for r in b.to_pylist():
            ok, reason = True, ""
            if r["sha256"] is None:
                ok, reason = False, "unlisted tar on disk"
            elif not os.path.exists(r["path"]):
                ok, reason = False, "missing tar"
            else:
                with open(r["path"], "rb") as f:
                    blob = f.read()
                if hashlib.sha256(blob).hexdigest() != r["sha256"]:
                    ok, reason = False, "sha256 mismatch"
                else:
                    with tarfile.open(fileobj=io.BytesIO(blob)) as tf:
                        n = len({m.name.rsplit(".", 1)[0]
                                 for m in tf.getmembers()})
                    if n != r["n_members"]:
                        ok, reason = False, (f"member count {n} != "
                                             f"{r['n_members']}")
            rows["partition"].append(r["partition"])
            rows["shard_idx"].append(r["shard_idx"])
            rows["ok"].append(ok)
            rows["reason"].append(reason)
        return pa.table({
            "partition": pa.array(rows["partition"], pa.int64()),
            "shard_idx": pa.array(rows["shard_idx"], pa.int64()),
            "ok": pa.array(rows["ok"], pa.bool_()),
            "reason": pa.array(rows["reason"], pa.string()),
        })

    return rd.from_items(items).map_batches(audit, batch_format="pyarrow",
                                            batch_size=1)


# A 'tasks'-mode writer task buffers undelivered shard rows — payload
# bytes included — while file order strays from clip_id order, worst
# case one whole partition in one worker's heap. Partitions whose
# on-disk bytes exceed this bound are routed to 'exchange' mode, whose
# per-shard-writer memory is bounded by a single shard regardless of
# partition size. Parquet of ~incompressible audio payload ≈ memory
# footprint, so file bytes are the right cheap proxy.
TASKS_MODE_MAX_PART_BYTES = int(os.environ.get(
    "METRICS_RAY_WDS_TASKS_MAX_PART_BYTES", str(2 << 30)))


def _partition_bytes(part_dir: str) -> int:
    import glob

    return sum(os.stat(f).st_size
               for f in glob.glob(os.path.join(part_dir, "*.parquet")))


def write_webdataset_sf(sf_dir: str, out_dir: str,
                        shard_ms: int = SHARD_MS, replicas: int = 1,
                        wave_size: int | None = None,
                        mode: str = "auto") -> dict:
    """Shard the derived clips table into WebDataset tars under
    ``out_dir/partition=P/``; re-entrant (committed partitions are
    skipped). Returns the merged manifest.

    ``mode='tasks'``: one Ray task per partition streaming its own files
    — payload moves storage → writer once, no exchange; worker memory is
    bounded by ONE PARTITION (rows buffer until their shard completes).
    ``mode='exchange'``: the wave-job form (one Ray Data job per wave,
    payload through a (part, shard) co-group) — a payload shuffle, but
    per-writer memory bounded by one SHARD.
    ``mode='auto'`` (default): per partition — 'tasks' up to
    TASKS_MODE_MAX_PART_BYTES of on-disk parquet, 'exchange' above it,
    so an oversized partition can never OOM a streaming writer task."""
    from .. import harden_fsspec_race
    from ..pipelines.clips import ensure_clips_hive

    if mode not in ("auto", "tasks", "exchange"):
        raise ValueError(f"unknown mode {mode!r} "
                         "(expected 'auto', 'tasks' or 'exchange')")
    harden_fsspec_race()
    hive = ensure_clips_hive(sf_dir, replicas=replicas)
    parts = sorted(d for d in os.listdir(hive) if d.startswith("partition="))
    os.makedirs(out_dir, exist_ok=True)

    # resume config fingerprint (the curate.py _CONFIG contract): a
    # re-run with a different shard budget or source replication would
    # otherwise silently keep partitions committed under the OLD
    # parameters and mix layouts in one corpus
    cfg = {"shard_ms": int(shard_ms), "replicas": int(replicas),
           "sf_dir": os.path.normpath(sf_dir)}
    cfg_path = os.path.join(out_dir, "_CONFIG.json")
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            prior = json.load(f)
        if prior != cfg:
            raise ValueError(
                f"{out_dir} was written with config {prior}; resuming "
                f"with {cfg} would mix shard layouts — use a fresh "
                "out_dir or delete the old one")
    else:
        tmp_cfg = cfg_path + ".tmp"
        with open(tmp_cfg, "w") as f:
            json.dump(cfg, f, sort_keys=True)
        os.replace(tmp_cfg, cfg_path)

    manifest: dict = {"partitions": {}, "resumed_skips": 0}
    pending: list[str] = []
    for pname in parts:
        marker = os.path.join(out_dir, pname, "_SUCCESS")
        counts = None
        if os.path.exists(marker):
            try:
                with open(marker) as f:
                    counts = json.load(f)
            except json.JSONDecodeError:
                counts = None  # torn pre-atomic marker: not committed
        if counts is not None:
            manifest["partitions"][pname] = counts
            manifest["resumed_skips"] += 1
        else:
            pending.append(pname)

    if pending:
        if wave_size is None:
            wave_size = min(8, len(pending))
        wave_size = max(1, wave_size)
        # one Ray Data job per wave (not two per partition): the wave is
        # the progressive-commit granule — committed waves survive a
        # crash, the in-flight wave re-runs
        def pick(pname: str) -> str:
            if mode != "auto":
                return mode
            return ("tasks" if _partition_bytes(os.path.join(hive, pname))
                    <= TASKS_MODE_MAX_PART_BYTES else "exchange")

        from concurrent.futures import ThreadPoolExecutor

        for i in range(0, len(pending), wave_size):
            wave = pending[i:i + wave_size]
            by_mode: dict[str, list[str]] = {}
            for p in wave:
                by_mode.setdefault(pick(p), []).append(p)
            # a mixed wave runs its tasks-mode and exchange-mode groups
            # CONCURRENTLY (driver threads; the work itself is Ray tasks/
            # jobs) — sequential groups would idle the cluster for up to
            # the smaller group's duration
            with ThreadPoolExecutor(max_workers=len(by_mode)) as pool:
                futs = [
                    pool.submit(
                        _write_wave_tasks if m == "tasks" else _write_wave,
                        {p: os.path.join(hive, p) for p in ps},
                        {p: os.path.join(out_dir, p) for p in ps}, shard_ms)
                    for m, ps in by_mode.items()]
                for f in futs:
                    manifest["partitions"].update(f.result())
    return manifest
