"""Checkpoint / resume for the validation suite (north_rule requirement:
"resumable from checkpoint with per-partition lineage + metrics").

The reference has no checkpointing (single JVM, SURVEY.md §4); this layer is
new design. Unit of work = one value of the ``partition`` column, physically
one hive directory of the partitioned clips cache (``partition=N/``). Each
completed partition persists:

    partitions/p{N}.json     counters per check, sketch blobs (b64), wall_ms,
                             lineage (input file paths), rows scanned
    violations/p{N}.parquet  that partition's violation rows (batch checks)

plus a run-level ``MANIFEST.json`` (config fingerprint + completed set).
A resumed run skips completed partitions, re-runs only the missing ones, and
re-merges global sketches from the per-partition blobs — sketches are
associative/commutative (SURVEY.md §7.4) so the merged result is identical
to a single-shot run (asserted by tests/test_checkpoint.py).

Partitions are processed in WAVES (default 4): one streaming Dataset per
wave over the wave's files — inside a wave Ray parallelizes across
blocks/actors, and a crash loses at most the current wave. Keyed global
checks (uniqueness/content-dedup shuffles) run once after all partitions
complete and checkpoint their violations wholesale under ``keyed/``.
"""

from __future__ import annotations

import base64
import glob
import hashlib
import json
import os
import time
from typing import Any, Callable

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ..checks.base import BatchCheck, CheckContext
from ..runner import (
    SuiteReport,
    assemble_metrics,
    assemble_verdicts,
    run_batch_checks,
    _metric_rows,
)
from ..schema import VIOLATION_SCHEMA
from ..collect import arrow_refs


class CheckpointStore:
    """Filesystem layout + (de)serialization for one validation run."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(os.path.join(root, "partitions"), exist_ok=True)
        os.makedirs(os.path.join(root, "violations"), exist_ok=True)
        os.makedirs(os.path.join(root, "keyed"), exist_ok=True)

    # ---- manifest -------------------------------------------------------
    def manifest_path(self) -> str:
        return os.path.join(self.root, "MANIFEST.json")

    def read_manifest(self) -> dict[str, Any]:
        p = self.manifest_path()
        if not os.path.exists(p):
            return {"completed": [], "keyed_done": [], "fingerprint": None}
        with open(p) as f:
            return json.load(f)

    def write_manifest(self, m: dict[str, Any]) -> None:
        tmp = self.manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=1, sort_keys=True)
        os.replace(tmp, self.manifest_path())  # atomic

    # ---- per-partition records -----------------------------------------
    def partition_path(self, p: int) -> str:
        return os.path.join(self.root, "partitions", f"p{p}.json")

    def save_partition(self, p: int, counters: pd.DataFrame,
                       partials: dict[str, list[bytes]],
                       violations: pa.Table, lineage: list[str],
                       wall_s: float) -> None:
        vio_path = os.path.join(self.root, "violations", f"p{p}.parquet")
        pq.write_table(violations, vio_path)
        rec = {
            "partition": p,
            "lineage": lineage,
            "lineage_sig": lineage_signature(lineage),
            "wall_s": round(wall_s, 3),
            "rows_scanned": int(counters["scanned"].max()) if len(counters) else 0,
            "counters": counters.to_dict(orient="list"),
            "sketches": {cid: [base64.b64encode(b).decode() for b in blobs]
                         for cid, blobs in partials.items()},
            "violations_path": vio_path,
            "n_violations": int(violations.num_rows),
        }
        tmp = self.partition_path(p) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(rec, f)
        os.replace(tmp, self.partition_path(p))

    def load_partition_meta(self, p: int) -> dict[str, Any]:
        """The pN.json record alone — lineage/counters/wall, WITHOUT
        reading the violations parquet (cheap enough to call for every
        completed partition during resume validation)."""
        with open(self.partition_path(p)) as f:
            return json.load(f)

    def load_partition(self, p: int) -> tuple[pd.DataFrame,
                                              dict[str, list[bytes]],
                                              pa.Table, dict[str, Any]]:
        with open(self.partition_path(p)) as f:
            rec = json.load(f)
        counters = pd.DataFrame(rec["counters"])
        partials = {cid: [base64.b64decode(s) for s in blobs]
                    for cid, blobs in rec["sketches"].items()}
        violations = pq.read_table(rec["violations_path"])
        return counters, partials, violations, rec

    # ---- keyed (global shuffle) check results --------------------------
    def save_keyed(self, check_id: str, violations: pa.Table) -> None:
        pq.write_table(violations,
                       os.path.join(self.root, "keyed", f"{check_id}.parquet"))

    def load_keyed(self, check_id: str) -> pa.Table:
        return pq.read_table(
            os.path.join(self.root, "keyed", f"{check_id}.parquet"))

    def drop_keyed(self, check_id: str) -> None:
        try:
            os.remove(os.path.join(self.root, "keyed",
                                   f"{check_id}.parquet"))
        except FileNotFoundError:
            pass


def _check_param_digest(chk: BatchCheck) -> str:
    """Stable digest of a check's primitive parameters — so a resume
    detects CONFIG drift (e.g. a RangeCheck threshold edited between the
    crash and the rerun), not just a changed check list; without it,
    completed partitions computed under the old config silently mix with
    new-partition results. Non-primitive state (indexes, compiled
    patterns) is setup()-derived and excluded, and so is every
    UNDERSCORE-prefixed attribute: private derived state may embed
    process-unique reprs (DecodeCheck's codec-registry snapshot holds
    function objects whose str() carries memory addresses), which would
    shift the fingerprint every process and refuse every legitimate
    resume."""
    prim = {}
    for k, v in sorted(vars(chk).items()):
        if k.startswith("_"):
            continue
        if isinstance(v, (str, int, float, bool, type(None))):
            prim[k] = v
        elif isinstance(v, (tuple, list)):
            # ordered sequences keep their ORDER: (lo, hi) swapped, or
            # identity columns reordered, are different configs — a
            # sorted() canonicalization would digest them identically
            # and the resume guard would serve stale results
            prim[k] = list(map(str, v))
        elif isinstance(v, (set, frozenset)):
            try:
                prim[k] = sorted(map(str, v))
            except TypeError:
                pass
        elif isinstance(v, dict):
            prim[k] = sorted((str(kk), str(vv)) for kk, vv in v.items())
    return json.dumps(prim, sort_keys=True, default=str)


# Checkpoint-format version. Bump whenever the fingerprint RECIPE
# changes (param-digest canonicalization, keyed_spec tail, …): old
# checkpoints then refuse resume with an explicit format-migration
# message instead of a generic mismatch (they would be refused anyway —
# the recipe change shifts every digest — but the version token lets the
# error say WHY).
CKPT_FORMAT_VERSION = 2


def _suite_fingerprint(checks: list[BatchCheck], parquet_dir: str,
                       keyed_spec: str | None = None) -> str:
    """Suite identity for the resume guard. ``keyed_spec`` (a canonical
    JSON string of the keyed-audit names + parameters) joins the digest
    when provided: keyed results are checkpointed wholesale by id, so a
    parameter edit (e.g. editdist cap) between runs MUST refuse rather
    than serve the stale keyed parquet — the same contract the
    batch-check param digest enforces."""
    ids = ",".join(sorted(
        f"{c.check_id}:{_check_param_digest(c)}" for c in checks))
    tail = "" if keyed_spec is None else f"|{keyed_spec}"
    return hashlib.sha256(
        f"v{CKPT_FORMAT_VERSION}|{ids}|{parquet_dir}{tail}"
        .encode()).hexdigest()[:16]


def lineage_signature(files: list[str]) -> list[list]:
    """Stat-based content signature of a partition's file set: (path,
    size_bytes) per file. Catches in-place overwrites — same file NAME,
    different content — that a path-only lineage compare serves stale.
    Size (not mtime) keys the signature: a copy/restore that preserves
    bytes but not timestamps must NOT force re-validation, and a
    same-size in-place edit is caught by the content fingerprint layer
    (pipelines.queries.q_partition_fingerprints) when the operator runs
    the content-addressed audit."""
    return [[f, (os.path.getsize(f) if os.path.exists(f) else -1)]
            for f in files]


def partition_dirs(parquet_dir: str) -> dict[int, list[str]]:
    """Hive layout → {partition value: [file paths]} (the lineage map)."""
    out: dict[int, list[str]] = {}
    for d in sorted(glob.glob(os.path.join(parquet_dir, "partition=*"))):
        p = int(d.rsplit("=", 1)[1])
        out[p] = sorted(glob.glob(os.path.join(d, "*.parquet")))
    return out


def checkpointed_validate(
    parquet_dir: str,
    checks: list[BatchCheck],
    ctx: CheckContext | None = None,
    checkpoint_dir: str = "/tmp/metrics_ray_ckpt",
    keyed: dict[str, Callable] | None = None,
    wave_size: int = 4,
    batch_size: int = 1024,
    concurrency=None,
    keyed_spec: str | None = None,
    fail_after_waves: int | None = None,
) -> SuiteReport | None:
    """Run (or resume) the suite over a hive-partitioned clips cache.

    ``fail_after_waves`` is the crash-injection hook for resume tests: the
    run raises after that many waves have checkpointed (simulating a driver
    loss); a subsequent call with the same checkpoint_dir resumes.
    """
    import numpy as np
    import ray.data as rd
    from ray.data.datasource.partitioning import Partitioning

    from ..checks.base import CheckContext

    # assemble_metrics runs driver-side setup() only when ctx is not None
    # (its documented contract) — normalize here exactly as run_suite
    # does, so a default-ctx checkpointed run finalizes set-up checks
    ctx = ctx or CheckContext()

    hive = Partitioning("hive", base_dir=parquet_dir,
                        field_types={"partition": int})

    def _cast_partition(b: pa.Table) -> pa.Table:
        # hive restore types the partition key int64; the canonical clip
        # schema (BASELINE.json input_hint) declares int32
        i = b.column_names.index("partition")
        return b.set_column(i, "partition",
                            b.column("partition").cast(pa.int32()))

    store = CheckpointStore(checkpoint_dir)
    manifest = store.read_manifest()
    fp = _suite_fingerprint(checks, parquet_dir, keyed_spec)
    if manifest["fingerprint"] not in (None, fp):
        old_ver = manifest.get("format_version")
        if old_ver != CKPT_FORMAT_VERSION:
            raise ValueError(
                f"checkpoint {checkpoint_dir} was written by checkpoint "
                f"format v{old_ver or 1}; this library writes "
                f"v{CKPT_FORMAT_VERSION} — upgrading the library "
                "invalidates old checkpoints; delete the checkpoint "
                "directory (or point at a fresh one) to re-validate "
                "from scratch")
        raise ValueError(
            f"checkpoint {checkpoint_dir} belongs to a different run "
            f"({manifest['fingerprint']} != {fp}) — the check list, "
            "check parameters, keyed-audit spec, or input path changed "
            "since the checkpoint was written")
    manifest["fingerprint"] = fp
    manifest["format_version"] = CKPT_FORMAT_VERSION

    parts = partition_dirs(parquet_dir)
    if not parts:
        # fail with the actual cause — an empty dict otherwise surfaces
        # as pandas' "No objects to concatenate" deep in the re-merge
        raise ValueError(
            f"no partition=* directories under {parquet_dir!r} — "
            "checkpointed_validate needs the hive-partitioned clips cache")
    done = set(manifest["completed"])
    # lineage staleness: a "completed" partition whose CURRENT file list
    # differs from the checkpointed lineage (files added/replaced since
    # the crash) must be re-validated, not silently served from stale
    # counters — this is what save_partition persists the lineage FOR
    def _is_stale(p: int) -> bool:
        meta = store.load_partition_meta(p)
        if meta["lineage"] != parts[p]:
            return True
        # path lists match — compare the stat signature so an in-place
        # overwrite (same name, new bytes) re-validates; checkpoints
        # written before signatures existed fall back to path-only
        sig = meta.get("lineage_sig")
        return sig is not None and sig != lineage_signature(parts[p])

    stale = [p for p in sorted(done) if p in parts and _is_stale(p)]
    if stale:
        done -= set(stale)
        manifest["completed"] = [p for p in manifest["completed"]
                                 if p not in set(stale)]
    todo = [p for p in sorted(parts) if p not in done]
    if todo and manifest["keyed_done"]:
        # keyed audits consume the WHOLE dataset: any partition being
        # (re-)validated — stale lineage or newly added — invalidates
        # the wholesale keyed results, which would otherwise be served
        # from parquet that predates the change (a duplicate introduced
        # by a replaced file would be reported as passing)
        for kid in manifest["keyed_done"]:
            store.drop_keyed(kid)
        manifest["keyed_done"] = []
        store.write_manifest(manifest)

    waves = [todo[i:i + wave_size] for i in range(0, len(todo), wave_size)]
    for wi, wave in enumerate(waves):
        t0 = time.time()
        files = [f for p in wave for f in parts[p]]
        # hive col `partition` restored (typed) from the directory path
        ds = rd.read_parquet(files, partitioning=hive).map_batches(
            _cast_partition, batch_format="pyarrow", zero_copy_batch=True)
        viol, counters, partials = run_batch_checks(
            ds, checks, ctx, batch_size=batch_size, concurrency=concurrency)
        wall = time.time() - t0
        neg = sorted(cid for cid, blobs in partials.items()
                     if any(part_val < 0 for part_val, _ in blobs))
        if neg:
            # blobs tagged partition -1 (counterless batches) have no
            # wave partition to checkpoint under; silently dropping them
            # would make the resumed merge diverge from the single-shot
            # run — refuse loudly instead
            raise ValueError(
                f"checks {neg} emitted sketch partials without partition "
                "attribution (partition -1); the checkpointed path needs "
                "per-partition counters on every batch — run these via "
                "run_suite or add counters to the check")
        vdf = viol.to_pandas()
        for p in wave:
            sub = counters[counters.partition == p].reset_index(drop=True)
            pviol = (pa.Table.from_pandas(vdf[vdf.partition == p],
                                          preserve_index=False)
                     .cast(VIOLATION_SCHEMA) if (vdf.partition == p).any()
                     else VIOLATION_SCHEMA.empty_table())
            # sketch blobs carry the partition of their source batch (hive
            # layout ⇒ no batch spans partitions)
            ppart = {cid: [b for part_val, b in blobs if part_val == p]
                     for cid, blobs in partials.items()}
            ppart = {cid: blobs for cid, blobs in ppart.items() if blobs}
            store.save_partition(p, sub, ppart, pviol, parts[p],
                                 wall / max(len(wave), 1))
            manifest["completed"].append(p)
        store.write_manifest(manifest)
        if fail_after_waves is not None and wi + 1 >= fail_after_waves \
                and wi + 1 < len(waves):
            raise RuntimeError(f"injected failure after wave {wi + 1}")

    # ---- re-merge everything from the checkpoint ------------------------
    all_counters, all_partials, all_viol = [], {}, []
    recs: dict[int, dict] = {}
    for p in sorted(parts):
        counters, partials, violations, recs[p] = store.load_partition(p)
        all_counters.append(counters)
        for cid, blobs in partials.items():
            all_partials.setdefault(cid, []).extend((p, b) for b in blobs)
        if violations.num_rows:
            all_viol.append(violations)
    counters = (pd.concat(all_counters, ignore_index=True)
                .groupby(["check_id", "partition"], sort=True)
                .sum().reset_index())
    viol = (pa.concat_tables(all_viol).cast(VIOLATION_SCHEMA)
            if all_viol else VIOLATION_SCHEMA.empty_table())
    metrics = assemble_metrics(checks, counters, all_partials, ctx=ctx)

    # ---- keyed global checks (run once, checkpointed wholesale) ---------
    from ..runner import scanned_totals

    total_rows, part_scanned = (scanned_totals(counters) if checks
                                else (0, pd.Series(dtype="int64")))
    extra_rows = []
    for kid, fn in (keyed or {}).items():
        if kid in manifest["keyed_done"]:
            kvt = store.load_keyed(kid)
        else:
            import ray

            def factory(columns=None, _dir=parquet_dir):
                files = [f for fl in partition_dirs(_dir).values() for f in fl]
                return rd.read_parquet(
                    files, columns=columns, partitioning=hive).map_batches(
                        _cast_partition, batch_format="pyarrow",
                        zero_copy_batch=True)

            from ..checks.keyed import KEYED_VIOLATION_SCHEMA as keyed_schema
            tables = [t.cast(keyed_schema)
                      for t in ray.get(arrow_refs(fn(factory)))
                      if t.num_rows]
            kvt = (pa.concat_tables(tables) if tables
                   else keyed_schema.empty_table())
            kvt = kvt.add_column(
                0, "check_id",
                pa.array([kid] * kvt.num_rows, pa.string())).cast(
                    VIOLATION_SCHEMA)
            store.save_keyed(kid, kvt)
            manifest["keyed_done"].append(kid)
            store.write_manifest(manifest)
        n_v = kvt.num_rows
        viol = pa.concat_tables([viol, kvt])
        value = 1.0 if total_rows == 0 else 1.0 - n_v / total_rows
        extra_rows.append((kid, -1, value, total_rows, n_v, False, n_v == 0))
        vp = kvt.column("partition").to_numpy(zero_copy_only=False)
        uniq, cnt = np.unique(vp, return_counts=True)
        bad = dict(zip(uniq.tolist(), cnt.tolist()))
        for p in sorted(parts):
            nv = int(bad.get(p, 0))
            sc = int(part_scanned.get(p, 0))
            val = 1.0 if sc == 0 else 1.0 - nv / sc
            extra_rows.append((kid, int(p), val, sc, nv, False, nv == 0))
    if extra_rows:
        metrics = pa.concat_tables([metrics, _metric_rows(extra_rows)])

    verdicts = assemble_verdicts(metrics, viol)
    run_manifest = {
        "rows_scanned": total_rows,
        "n_violations": int(viol.num_rows),
        "n_checks": len(checks) + len(keyed or {}),
        "checkpoint_dir": checkpoint_dir,
        "partitions": {str(p): recs[p]["lineage"] for p in sorted(parts)},
        "resumed_from": sorted(done),
    }
    return SuiteReport(metrics=metrics, violations=viol, verdicts=verdicts,
                       manifest=run_manifest)
