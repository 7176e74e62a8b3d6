"""End-to-end training-data curation: the composite pipeline a user of the
validation engine runs to PRODUCE a training set, not just score one.

    metadata filter → decode-fused quality gate + canonical transcode
    → exact content dedup → sequence packing → partitioned parquet out

Two phases, mirroring how the work distributes at the 10^12-clip design
point:

  Phase 1 (global, key-only): content-dedup DECISIONS. The only step that
  needs cross-partition information. Streams (bytes, transcript) once
  through the 128-bit digest (checks/keyed.py content_hash_batch — zero-copy
  buffer slices), shuffles ONLY (key, partition, clip_id), and writes the
  resulting drop-list as partition-keyed parquet next to the output. Nothing
  row-sized touches the driver.

  Phase 2 (per-partition, resumable): everything else is row- or
  partition-local. Each partition is curated independently and committed
  with a ``_SUCCESS`` marker carrying its counts — a re-run SKIPS committed
  partitions (the north_rule's resumability, same contract as
  state/checkpoint.py). The decode/transcode work runs as parallel
  map_batches over the partition's batches; the pack-assignment prefix scan
  is the one sequential step and touches keys only (clip_id, dur_ms — a few
  bytes/row, bounded by shard size; at design scale partitions number in the
  millions and hold ~100 MB each).

Quality gate thresholds are acoustic (frame-RMS speech ratio, digital
clipping fraction — stages/audio_ops.py SilenceProfiler); undecodable
payloads and metadata violations are dropped with typed reasons, the same
reason taxonomy a SuiteReport's violations would cite.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .. import audio
from ..schema import MAX_DUR_MS, VALID_CODECS, VALID_SR_HZ
from ..collect import arrow_refs

TARGET_SR = 16_000
MIN_SPEECH_RATIO = 0.5
# clean synth signals never exceed |0.9| (zero clipping); the seeded
# noisy rows (k%131==23) clip ~0.4% of samples — 0.2% separates them
MAX_CLIPPING_FRAC = 0.002

R_META = "META"
R_UNDECODABLE = "UNDECODABLE"
R_LOW_SPEECH = "LOW_SPEECH"
R_CLIPPING = "CLIPPING"
R_KEPT = "KEPT"

STAGE_SCHEMA = pa.schema([
    ("clip_id", pa.string()),
    ("reason", pa.string()),
    ("sr_hz", pa.int32()),
    ("dur_ms", pa.int32()),
    ("transcript", pa.string()),
    ("bytes", pa.binary()),
])

CURATED_SCHEMA = pa.schema([
    ("clip_id", pa.string()),
    ("sr_hz", pa.int32()),
    ("dur_ms", pa.int32()),
    ("transcript", pa.string()),
    ("bytes", pa.binary()),
    ("pack_id", pa.int64()),
    ("offset_ms", pa.int64()),
])


def _meta_ok_mask(batch: pa.Table) -> np.ndarray:
    """Vectorized metadata gate (sr enum, dur range, codec enum, transcript
    non-empty) — shared by the curation stage and the dedup keeper choice."""
    import pyarrow.compute as pc

    sr_ok = pc.is_in(batch.column("sr_hz"),
                     value_set=pa.array(list(VALID_SR_HZ), pa.int32()))
    dur = batch.column("dur_ms")
    dur_ok = pc.and_(pc.greater(dur, 0), pc.less_equal(dur, MAX_DUR_MS))
    codec_ok = pc.is_in(batch.column("codec"),
                        value_set=pa.array(list(VALID_CODECS)))
    t = batch.column("transcript")
    t_ok = pc.and_(t.is_valid(), pc.not_equal(pc.fill_null(t, ""), ""))
    ok = pc.and_(pc.and_(sr_ok, dur_ok), pc.and_(codec_ok, t_ok))
    return pc.fill_null(ok, False).to_numpy(zero_copy_only=False)


def _atomic_json(path: str, obj) -> None:
    """Write-then-rename: a crash mid-write must never leave a torn JSON
    marker — json.load of a half-written _SUCCESS would wedge every
    subsequent resume (the state/checkpoint.py write_manifest contract)."""
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, sort_keys=True)
    os.replace(tmp, path)


class CurationStage:
    """One decode per surviving row: metadata gate (vectorized Arrow mask)
    → decode → VAD/clipping profile → resample to ``target_sr`` → canonical
    pcm_s16le. Emits a row per INPUT row with a typed ``reason``; payload
    bytes are non-null only for KEPT rows."""

    columns = ("clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript")

    def __init__(self, target_sr: int = TARGET_SR,
                 min_speech: float = MIN_SPEECH_RATIO,
                 max_clipping: float = MAX_CLIPPING_FRAC):
        from ..stages.audio_ops import SilenceProfiler

        self.target_sr = int(target_sr)
        self.min_speech = float(min_speech)
        self.max_clipping = float(max_clipping)
        self.profiler = SilenceProfiler()

    def _meta_ok(self, batch: pa.Table) -> np.ndarray:
        return _meta_ok_mask(batch)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..stages.audio_ops import resample_pcm

        meta_ok = self._meta_ok(batch)
        parts: list[pa.Table] = []
        # metadata-rejected rows take a fully-vectorized fast path (no
        # Python per-row work) — on a meta-heavy corpus the decode loop
        # below sees only the survivors
        if not meta_ok.all():
            bad = batch.filter(pa.array(~meta_ok))
            n = bad.num_rows
            parts.append(pa.table({
                "clip_id": bad.column("clip_id").cast(pa.string()),
                "reason": pa.array([R_META] * n, pa.string()),
                "sr_hz": bad.column("sr_hz").cast(pa.int32()),
                "dur_ms": bad.column("dur_ms").cast(pa.int32()),
                "transcript": bad.column("transcript").cast(pa.string()),
                "bytes": pa.nulls(n, pa.binary()),
            }))
        if meta_ok.any():
            from ..checks.keyed import _binary_views

            ok = batch.filter(pa.array(meta_ok))
            ids = ok.column("clip_id").to_pylist()
            # zero-copy memoryview slices: to_pylist would duplicate the
            # batch's dominant column (the payload) in Python bytes;
            # audio.decode reads any buffer (np.frombuffer / zlib)
            payloads = _binary_views(ok.column("bytes"))
            srs = ok.column("sr_hz").to_numpy(zero_copy_only=False)
            n = len(ids)
            # decode is inherently per-row (variable-length payloads);
            # everything around it stays columnar
            reasons: list[str] = [R_KEPT] * n
            out_sr = srs.astype(np.int64).copy()
            out_dur = ok.column("dur_ms").to_numpy(
                zero_copy_only=False).astype(np.int64).copy()
            out_bytes: list[bytes | None] = [None] * n
            for i in range(n):
                try:
                    _, pcm = audio.decode(payloads[i])
                except (ValueError, TypeError):
                    reasons[i] = R_UNDECODABLE
                    continue
                p = self.profiler._profile(pcm, int(srs[i]))
                if p["clipping_frac"] > self.max_clipping:
                    reasons[i] = R_CLIPPING
                    continue
                if p["speech_ratio"] < self.min_speech:
                    reasons[i] = R_LOW_SPEECH
                    continue
                res = resample_pcm(pcm, int(srs[i]), self.target_sr)
                out_sr[i] = self.target_sr
                out_dur[i] = int(round(len(res) * 1000.0 / self.target_sr))
                out_bytes[i] = audio.encode(res, "pcm_s16le")
            parts.append(pa.table({
                "clip_id": ok.column("clip_id").cast(pa.string()),
                "reason": pa.array(reasons, pa.string()),
                "sr_hz": pa.array(out_sr.astype(np.int32)),
                "dur_ms": pa.array(out_dur.astype(np.int32)),
                "transcript": ok.column("transcript").cast(pa.string()),
                "bytes": pa.array(out_bytes, pa.binary()),
            }))
        if not parts:
            return STAGE_SCHEMA.empty_table()
        return pa.concat_tables(parts).cast(STAGE_SCHEMA)


# -------------------------------------------------- phase 1: dedup decisions

DROP_SCHEMA = pa.schema([("partition", pa.int64()),
                         ("clip_id", pa.string())])


def dedup_drop_ds(factory):
    """Global exact-content dedup decisions: for every 128-bit content key
    seen more than once, drop all members except one canonical keeper.

    Keeper choice is GATE-AWARE: metadata-valid members win over
    metadata-invalid ones, lexicographically-smallest clip_id breaks
    ties. The content hash covers only (bytes, transcript), so members of
    one group can differ in sr_hz/dur_ms/codec — a blindly-lexicographic
    keeper could be the one copy phase 2's metadata gate rejects, losing
    content that had a perfectly curate-able duplicate. Decode-level
    gates (VAD/clipping) run on the payload, which is identical within a
    group — but their FRAME GEOMETRY derives from the declared sr_hz,
    which the content hash excludes: two meta-VALID members declaring
    different rates can still split on speech_ratio, and the keeper
    choice cannot see that (known residual gap; closing it would mean
    either hashing sr_hz into the content key — changing dedup
    semantics and the val_content_dedup oracle — or a decode-aware
    keeper pass; both deliberate non-goals for now). Shuffle payload
    is the projected (key, partition, clip_id, meta_ok) stream only."""
    import pandas as pd

    from ..checks.keyed import content_hash_batch, grouped_apply_fast

    def hash_with_meta(b: pa.Table) -> pa.Table:
        t = content_hash_batch(b)
        return t.append_column("meta_ok", pa.array(_meta_ok_mask(b)))

    keyed = factory(list(CurationStage.columns) + ["partition"]) \
        .map_batches(hash_with_meta, batch_format="pyarrow")

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        # keeper = first after (key, gate-fail flag, clip_id) sort: a
        # metadata-valid member always outranks an invalid one
        df = (df.assign(__bad=~df["meta_ok"].astype(bool))
              .sort_values(["key", "__bad", "clip_id"], kind="stable"))
        dup = df[df.duplicated("key", keep="first")]
        return pd.DataFrame({
            "partition": dup["partition"].astype("int64"),
            "clip_id": dup["clip_id"].astype(str),
        })

    return grouped_apply_fast(keyed, "key", bucket, out_schema=DROP_SCHEMA)


# ---------------------------------------------- phase 2: per-partition work


def _stats_partial_task(*blocks) -> pa.Table:
    """Per-group stats partial over staged blocks (task-wave collection:
    no Dataset job — the blocks are already in the object store)."""
    import pyarrow.compute as pc

    outs = []
    for b in blocks:
        vc = pc.value_counts(b.column("reason"))
        kept = b.filter(pc.equal(b.column("reason"), R_KEPT))
        outs.append(pa.table({
            "kind": pa.array(["c"] * len(vc) + ["k"] * kept.num_rows),
            "key": pa.concat_arrays([
                vc.field("values").cast(pa.string()),
                kept.column("clip_id").cast(pa.string()).combine_chunks()]),
            "val": pa.concat_arrays([
                vc.field("counts").cast(pa.int64()),
                kept.column("dur_ms").cast(pa.int64()).combine_chunks()]),
        }))
    return pa.concat_tables(outs)


def _stats_and_kept_keys(refs) -> tuple[dict[str, int], list[pa.Table]]:
    """ONE task-wave collection over the staged blocks returning both the
    reason counts and the kept (clip_id, dur_ms) key rows — per block:
    a handful of 'c' count rows plus key-only 'k' rows (never payload)."""
    import math

    import ray

    task = ray.remote(_stats_partial_task)
    G = max(1, math.ceil(len(refs) / 8))
    futs = [task.remote(*refs[i::G]) for i in range(G) if refs[i::G]]

    counts: dict[str, int] = {}
    kept_keys: list[pa.Table] = []
    for t in ray.get(futs):
        kinds = t.column("kind").to_numpy(zero_copy_only=False)
        c = t.filter(pa.array(kinds == "c"))
        for r, n in zip(c.column("key").to_pylist(),
                        c.column("val").to_pylist()):
            counts[r] = counts.get(r, 0) + int(n)
        k = t.filter(pa.array(kinds == "k"))
        if k.num_rows:
            kept_keys.append(pa.table({"clip_id": k.column("key"),
                                       "dur_ms": k.column("val")}))
    return counts, kept_keys


def _curate_partition(part_dir: str, out_part_dir: str, drop_ids: set,
                      stage: CurationStage, pack_cap_ms: int) -> dict:
    """Curate one partition's files; returns its counts. The decode fan-out
    is parallel map_batches; the pack prefix scan is sequential over the
    partition's KEYS only."""
    import ray
    import ray.data as rd

    ds = rd.read_parquet(part_dir, columns=list(CurationStage.columns))
    staged = ds.map_batches(stage, batch_format="pyarrow", batch_size=128)
    # partition-scoped materialization (bounded by shard size by design);
    # the from_arrow_refs re-wrap pins downstream transforms to the
    # in-store blocks regardless of how future Ray versions re-plan a
    # MaterializedDataset (in the pinned 2.49.2 materialize() already
    # rebases on InputData, so this is belt-and-suspenders, not a fix)
    staged_refs = staged.materialize().to_arrow_refs()
    mat = rd.from_arrow_refs(staged_refs)
    counts, kept_keys = _stats_and_kept_keys(staged_refs)
    # the stage emits exactly one reason row per input row, so the stats
    # wave already carries the input count — a separate per-file footer
    # read (the old _partition_rows) was redundant driver I/O and a
    # second accounting that could disagree with the stage's own
    n_input = sum(counts.values())

    # pack assignment over kept keys (clip_id unique within a partition)
    if kept_keys:
        keys = pa.concat_tables(kept_keys).to_pandas()
        keys = keys[~keys["clip_id"].isin(drop_ids)].sort_values(
            "clip_id", kind="stable")
        prefix = keys["dur_ms"].astype("int64").cumsum().to_numpy() \
            - keys["dur_ms"].to_numpy(dtype="int64")
        pack_map = {cid: (int(p // pack_cap_ms), int(p % pack_cap_ms))
                    for cid, p in zip(keys["clip_id"], prefix)}
        n_packs = int(prefix[-1] // pack_cap_ms) + 1 if len(keys) else 0
        total_ms = int(keys["dur_ms"].sum())
    else:
        pack_map, n_packs, total_ms = {}, 0, 0
    n_dup = counts.get(R_KEPT, 0) - len(pack_map)

    import pandas as pd

    pack_ref = ray.put((
        pa.array(list(pack_map), pa.string()),
        pd.Series({k: v[0] for k, v in pack_map.items()}, dtype="int64"),
        pd.Series({k: v[1] for k, v in pack_map.items()}, dtype="int64")))

    def finalize(b: pa.Table) -> pa.Table:
        import pandas as pd
        import pyarrow.compute as pc

        keep_set, packs, offs = ray.get(pack_ref)
        keep = pc.and_(pc.equal(b.column("reason"), R_KEPT),
                       pc.is_in(b.column("clip_id"), value_set=keep_set))
        kept = b.filter(keep)
        if not kept.num_rows:
            return CURATED_SCHEMA.empty_table()
        ids = pd.Series(kept.column("clip_id").to_pylist())
        return pa.table({
            "clip_id": kept.column("clip_id"),
            "sr_hz": kept.column("sr_hz"),
            "dur_ms": kept.column("dur_ms"),
            "transcript": kept.column("transcript"),
            "bytes": kept.column("bytes"),
            "pack_id": pa.array(ids.map(packs).to_numpy(np.int64)),
            "offset_ms": pa.array(ids.map(offs).to_numpy(np.int64)),
        })

    os.makedirs(out_part_dir, exist_ok=True)
    mat.map_batches(finalize, batch_format="pyarrow").write_parquet(
        out_part_dir)
    return {
        "n_input": int(n_input),
        "n_meta": counts.get(R_META, 0),
        "n_undecodable": counts.get(R_UNDECODABLE, 0),
        "n_low_speech": counts.get(R_LOW_SPEECH, 0),
        "n_clipping": counts.get(R_CLIPPING, 0),
        "n_dup_dropped": int(n_dup),
        "n_out": len(pack_map),
        "n_packs": n_packs,
        "total_out_ms": total_ms,
    }


def _load_drop_sets(drop_dir: str) -> dict[int, set]:
    """Per-partition dedup drop sets from the committed drop list. A
    duplicate-free corpus writes ZERO parquet files (Ray skips all-empty
    blocks), so the read must tolerate an empty committed directory —
    otherwise every resume wedges on the same ArrowInvalid forever."""
    import glob

    files = glob.glob(os.path.join(drop_dir, "*.parquet"))
    drop_sets: dict[int, set] = {}
    if not files:
        return drop_sets
    drop_tbl = pq.read_table(files, columns=["partition", "clip_id"])
    for p, cid in zip(drop_tbl.column("partition").to_pylist(),
                      drop_tbl.column("clip_id").to_pylist()):
        drop_sets.setdefault(int(p), set()).add(cid)
    return drop_sets


def curate_sf(sf_dir: str, out_dir: str, replicas: int = 1,
              target_sr: int = TARGET_SR, pack_cap_ms: int | None = None,
              min_speech: float = MIN_SPEECH_RATIO,
              max_clipping: float = MAX_CLIPPING_FRAC,
              wave_size: int | None = None) -> dict:
    """Run the full curation pipeline; re-entrant (committed partitions are
    skipped on re-run). Returns the merged manifest.

    Phase 2 curates ``wave_size`` partitions CONCURRENTLY (driver threads,
    each driving its own partition-scoped Ray pipelines — the
    state/checkpoint.py wave pattern): per-partition work is internally
    parallel but has fixed per-job latency (stage startup, driver
    collection), so a sequential partition loop would serialize the job at
    millions of partitions. Each partition still commits independently via
    its own ``_SUCCESS`` marker, so resume semantics are unchanged."""
    from ..stages.audio_ops import PACK_CAP_MS

    from .clips import clips_factory, ensure_clips_hive, ensure_clips_parquet

    pack_cap_ms = pack_cap_ms or PACK_CAP_MS
    hive = ensure_clips_hive(sf_dir, replicas=replicas)
    parts = sorted(d for d in os.listdir(hive) if d.startswith("partition="))
    os.makedirs(out_dir, exist_ok=True)

    # config fingerprint: a resume against the same out_dir with DIFFERENT
    # curation parameters would silently reuse committed partitions (and
    # the stale drop list) under the old parameters — refuse instead, the
    # state/checkpoint.py contract
    config = {"target_sr": int(target_sr), "pack_cap_ms": int(pack_cap_ms),
              "min_speech": float(min_speech),
              "max_clipping": float(max_clipping),
              "replicas": int(replicas), "sf_dir": os.path.abspath(sf_dir)}
    cfg_path = os.path.join(out_dir, "_CONFIG.json")
    prev = None
    if os.path.exists(cfg_path):
        try:
            with open(cfg_path) as f:
                prev = json.load(f)
        except json.JSONDecodeError:
            prev = None  # torn pre-atomic write: treat as uncommitted
    if prev is not None:
        if prev != config:
            raise ValueError(
                f"curate_sf resume config mismatch for {out_dir!r}: "
                f"committed {prev} vs requested {config}; use a fresh "
                "output dir (or delete this one) to change parameters")
    else:
        _atomic_json(cfg_path, config)

    # phase 1: global dedup decisions (skipped when already committed).
    # The drop list is O(duplicate rows) — tiny relative to the corpus —
    # so it is written FLAT (partition kept as a data column): Ray's
    # partition_cols write pays a fixed multi-second shuffle/requery cost
    # that dwarfs the list itself. At the 10^12-row design point, where the
    # drop list itself is huge, switch to a key-range-partitioned layout so
    # phase 2 reads stay partition-local.
    drop_dir = os.path.join(out_dir, "_dedup_drops")
    drop_done = os.path.join(drop_dir, "_SUCCESS")
    if not os.path.exists(drop_done):
        if os.path.exists(drop_dir):
            shutil.rmtree(drop_dir)
        os.makedirs(drop_dir, exist_ok=True)
        flat = ensure_clips_parquet(sf_dir, replicas=replicas)
        drops = dedup_drop_ds(clips_factory(flat))
        drops.write_parquet(drop_dir)
        with open(drop_done, "w") as f:
            f.write("ok")

    drop_sets = _load_drop_sets(drop_dir)

    def drop_ids_for(pname: str) -> set:
        return drop_sets.get(int(pname.split("=")[1]), set())

    # phase 2: per-partition curation, committed independently, processed
    # in concurrent waves (plan building from threads needs the hardened
    # fsspec probe — see metrics_ray.harden_fsspec_race)
    from concurrent.futures import ThreadPoolExecutor

    from .. import harden_fsspec_race

    harden_fsspec_race()

    stage = CurationStage(target_sr=target_sr, min_speech=min_speech,
                          max_clipping=max_clipping)
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
                counts = None  # torn marker: partition is NOT committed
        if counts is not None:
            manifest["partitions"][pname] = counts
            manifest["resumed_skips"] += 1
        else:
            pending.append(pname)

    def curate_one(pname: str) -> tuple[str, dict]:
        out_part = os.path.join(out_dir, pname)
        if os.path.exists(out_part):  # partial write from a crashed run
            shutil.rmtree(out_part)
        counts = _curate_partition(
            os.path.join(hive, pname), out_part, drop_ids_for(pname),
            stage, pack_cap_ms)
        _atomic_json(os.path.join(out_part, "_SUCCESS"), counts)
        return pname, counts

    if pending:
        if wave_size is None:
            wave_size = min(8, len(pending))
        with ThreadPoolExecutor(max_workers=max(1, wave_size)) as pool:
            for pname, counts in pool.map(curate_one, pending):
                manifest["partitions"][pname] = counts

    totals: dict[str, int] = {}
    for c in manifest["partitions"].values():
        for k, v in c.items():
            totals[k] = totals.get(k, 0) + int(v)
    manifest["totals"] = totals
    with open(os.path.join(out_dir, "_MANIFEST.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest
