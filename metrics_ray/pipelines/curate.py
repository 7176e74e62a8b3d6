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

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..stages.audio_ops import resample_pcm

        meta_ok = self._meta_ok(batch)
        ids = batch.column("clip_id").to_pylist()
        payloads = batch.column("bytes").to_pylist()
        srs = batch.column("sr_hz").to_numpy(zero_copy_only=False)
        transcripts = batch.column("transcript").to_pylist()
        durs = batch.column("dur_ms").to_numpy(zero_copy_only=False)

        out = {n: [] for n in STAGE_SCHEMA.names}

        def emit(i, reason, sr=None, dur=None, payload=None):
            out["clip_id"].append(ids[i])
            out["reason"].append(reason)
            out["sr_hz"].append(int(sr if sr is not None else srs[i]))
            out["dur_ms"].append(int(dur if dur is not None else durs[i]))
            out["transcript"].append(transcripts[i])
            out["bytes"].append(payload)

        for i in range(len(ids)):
            if not meta_ok[i]:
                emit(i, R_META)
                continue
            try:
                _, pcm = audio.decode(payloads[i])
            except (ValueError, TypeError):
                emit(i, R_UNDECODABLE)
                continue
            p = self.profiler._profile(pcm, int(srs[i]))
            if p["clipping_frac"] > self.max_clipping:
                emit(i, R_CLIPPING)
                continue
            if p["speech_ratio"] < self.min_speech:
                emit(i, R_LOW_SPEECH)
                continue
            res = resample_pcm(pcm, int(srs[i]), self.target_sr)
            dur_out = int(round(len(res) * 1000.0 / self.target_sr))
            emit(i, R_KEPT, sr=self.target_sr, dur=dur_out,
                 payload=audio.encode(res, "pcm_s16le"))
        return pa.table({n: pa.array(out[n], STAGE_SCHEMA.field(n).type)
                         for n in STAGE_SCHEMA.names})


# -------------------------------------------------- phase 1: dedup decisions

DROP_SCHEMA = pa.schema([("partition", pa.int64()),
                         ("clip_id", pa.string())])


def dedup_drop_ds(factory):
    """Global exact-content dedup decisions: for every 128-bit content key
    seen more than once, drop all members except the lexicographically
    smallest clip_id (the canonical keeper). Shuffle payload is the
    projected (key, partition, clip_id) stream only."""
    import pandas as pd

    from ..checks.keyed import content_hash_batch, grouped_apply

    keyed = factory(["bytes", "transcript", "clip_id", "partition"]) \
        .map_batches(content_hash_batch, batch_format="pyarrow")

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["key", "clip_id"], kind="stable")
        dup = df[df.duplicated("key", keep="first")]
        return pd.DataFrame({
            "partition": dup["partition"].astype("int64"),
            "clip_id": dup["clip_id"].astype(str),
        })

    return grouped_apply(keyed, "key", bucket, out_schema=DROP_SCHEMA)


# ---------------------------------------------- phase 2: per-partition work


def _reason_counts(mat) -> dict[str, int]:
    """Small per-batch partials → driver sum (6-row tables per batch)."""
    import ray

    def partial(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        vc = pc.value_counts(b.column("reason"))
        return pa.table({"reason": vc.field("values"),
                         "cnt": vc.field("counts")})

    counts: dict[str, int] = {}
    for t in ray.get(arrow_refs(mat.map_batches(partial, batch_format="pyarrow")
                     )):
        for r, c in zip(t.column("reason").to_pylist(),
                        t.column("cnt").to_pylist()):
            counts[r] = counts.get(r, 0) + int(c)
    return counts


def _curate_partition(part_dir: str, out_part_dir: str, drop_ids: set,
                      stage: CurationStage, pack_cap_ms: int) -> dict:
    """Curate one partition's files; returns its counts. The decode fan-out
    is parallel map_batches; the pack prefix scan is sequential over the
    partition's KEYS only."""
    import ray
    import ray.data as rd

    ds = rd.read_parquet(part_dir, columns=list(CurationStage.columns))
    n_input = ds.count()
    staged = ds.map_batches(stage, batch_format="pyarrow", batch_size=128)
    # partition-scoped materialization (bounded by shard size by design);
    # re-wrap via from_arrow_refs so downstream transforms don't re-execute
    # lineage (Ray 2.49 re-plans MaterializedDataset from the source)
    mat = rd.from_arrow_refs(staged.materialize().to_arrow_refs())
    counts = _reason_counts(mat)

    # pack assignment over kept keys (clip_id unique within a partition)
    kept_keys = [t for t in ray.get(arrow_refs(
        mat.map_batches(
            lambda b: b.filter(
                pa.compute.equal(b.column("reason"), R_KEPT))
            .select(["clip_id", "dur_ms"]),
            batch_format="pyarrow"))) if t.num_rows]
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

    pack_ref = ray.put(pack_map)

    def finalize(b: pa.Table) -> pa.Table:
        pm = ray.get(pack_ref)
        keep_mask = np.array(
            [r == R_KEPT and cid in pm
             for r, cid in zip(b.column("reason").to_pylist(),
                               b.column("clip_id").to_pylist())])
        if not keep_mask.any():
            return CURATED_SCHEMA.empty_table()
        kept = b.filter(pa.array(keep_mask))
        assign = [pm[c] for c in kept.column("clip_id").to_pylist()]
        return pa.table({
            "clip_id": kept.column("clip_id"),
            "sr_hz": kept.column("sr_hz"),
            "dur_ms": kept.column("dur_ms"),
            "transcript": kept.column("transcript"),
            "bytes": kept.column("bytes"),
            "pack_id": pa.array([a[0] for a in assign], pa.int64()),
            "offset_ms": pa.array([a[1] for a in assign], pa.int64()),
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


def curate_sf(sf_dir: str, out_dir: str, replicas: int = 1,
              target_sr: int = TARGET_SR, pack_cap_ms: int | None = None,
              min_speech: float = MIN_SPEECH_RATIO,
              max_clipping: float = MAX_CLIPPING_FRAC) -> dict:
    """Run the full curation pipeline; re-entrant (committed partitions are
    skipped on re-run). Returns the merged manifest."""
    from ..stages.audio_ops import PACK_CAP_MS

    from .clips import clips_factory, ensure_clips_hive, ensure_clips_parquet

    pack_cap_ms = pack_cap_ms or PACK_CAP_MS
    hive = ensure_clips_hive(sf_dir, replicas=replicas)
    parts = sorted(d for d in os.listdir(hive) if d.startswith("partition="))
    os.makedirs(out_dir, exist_ok=True)

    # phase 1: global dedup decisions (skipped when already committed)
    drop_dir = os.path.join(out_dir, "_dedup_drops")
    drop_done = os.path.join(drop_dir, "_SUCCESS")
    if not os.path.exists(drop_done):
        if os.path.exists(drop_dir):
            shutil.rmtree(drop_dir)
        os.makedirs(drop_dir, exist_ok=True)
        flat = ensure_clips_parquet(sf_dir, replicas=replicas)
        drops = dedup_drop_ds(clips_factory(flat))
        drops.write_parquet(drop_dir, partition_cols=["partition"])
        with open(drop_done, "w") as f:
            f.write("ok")

    def drop_ids_for(pname: str) -> set:
        d = os.path.join(drop_dir, pname)
        if not os.path.isdir(d):
            return set()
        return set(pq.read_table(d, columns=["clip_id"])
                   .column("clip_id").to_pylist())

    # phase 2: per-partition curation, committed independently
    stage = CurationStage(target_sr=target_sr, min_speech=min_speech,
                          max_clipping=max_clipping)
    manifest: dict = {"partitions": {}, "resumed_skips": 0}
    for pname in parts:
        out_part = os.path.join(out_dir, pname)
        marker = os.path.join(out_part, "_SUCCESS")
        if os.path.exists(marker):
            with open(marker) as f:
                manifest["partitions"][pname] = json.load(f)
            manifest["resumed_skips"] += 1
            continue
        if os.path.exists(out_part):  # partial write from a crashed run
            shutil.rmtree(out_part)
        counts = _curate_partition(
            os.path.join(hive, pname), out_part, drop_ids_for(pname),
            stage, pack_cap_ms)
        with open(marker, "w") as f:
            json.dump(counts, f)
        manifest["partitions"][pname] = counts

    totals: dict[str, int] = {}
    for c in manifest["partitions"].values():
        for k, v in c.items():
            totals[k] = totals.get(k, 0) + int(v)
    manifest["totals"] = totals
    with open(os.path.join(out_dir, "_MANIFEST.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest
