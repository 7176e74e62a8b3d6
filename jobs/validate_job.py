#!/usr/bin/env python
"""``ray job submit``-able validation entrypoint (north_rule: "run via ray
job submit on a fixed-size multi-node Ray cluster").

    ray job submit --working-dir . -- \
        python jobs/validate_job.py --sf-dir /data/sfX \
            --checkpoint-dir /ckpt/run1 --output /out/run1

In a Ray Job the cluster is already initialized (RAY_ADDRESS is set by the
job server), so ray.init is guarded; standalone invocation starts a local
session. The run is RESUMABLE: re-submitting with the same --checkpoint-dir
skips completed partitions (metrics_ray.state.checkpoint). This is also the
DAILY-INGEST surface: partitions appended to the corpus since the last run
are the only ones scanned on re-submit — ``resumed_from`` in the JSON
summary lists the skipped (already-committed) partitions, and the global
sketches re-merge across all waves (tests/test_checkpoint.py
test_incremental_append_validates_only_new_partitions). Prints one JSON
summary line: per-partition pass/fail + latency stats, violation counts,
wall time.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--sf-dir", default=os.environ.get(
        "GRAFT_SF_DIR", "/root/testdata/sf0.001"))
    p.add_argument("--checkpoint-dir", required=True)
    p.add_argument("--output", default=None,
                   help="write the report (metrics/verdicts/violations) here")
    p.add_argument("--replicas", type=int, default=1)
    p.add_argument("--wave-size", type=int, default=4)
    p.add_argument("--config", default=None,
                   help="declarative suite config (configs/full_suite.yaml"
                        " layout: checks + keyed sections); default builds"
                        " the code suite incl. the transcript-editdist gate")
    p.add_argument("--num-cpus", type=int, default=int(
        os.environ.get("RAY_GRAFT_CPUS", "0")) or None)
    args = p.parse_args()

    import ray

    if not ray.is_initialized():  # standalone; under `ray job submit` the
        addr = os.environ.get("RAY_ADDRESS", "local")             # cluster
        # num_cpus is only legal for a NEW local instance — passing it
        # when connecting to an existing cluster raises ValueError, which
        # would kill the job whenever RAY_GRAFT_CPUS happens to be set
        ray.init(address=addr,
                 num_cpus=args.num_cpus if addr == "local" else None,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    try:
        from metrics_ray.pipelines.clips import validate_checkpointed
        from metrics_ray.pipelines.queries import q_footer_profile
        from metrics_ray.schema import MAX_DUR_MS, MIN_DUR_MS, VALID_SR_HZ
        from metrics_ray.state.checkpoint import CheckpointStore

        # metadata-only triage BEFORE any data page is read: per
        # partition, do the parquet footer statistics alone PROVE at
        # least one violation? At the 100-TB design point this is the
        # first (and cheapest) verdict a job emits — a stats-dirty
        # partition is actionable while the scan is still queued. Note
        # the asymmetry: min/max stats can prove an INTERVAL violation
        # (dur range, sr hull, nulls) but can never prove a partition
        # CLEAN — sr_hz is a discrete enum, so an in-hull min/max still
        # admits invalid rates (e.g. 20000); the full suite decides
        # cleanliness.
        t_triage = time.time()
        prof = q_footer_profile(args.sf_dir, replicas=args.replicas
                                ).to_pylist()
        sr_lo, sr_hi = min(VALID_SR_HZ), max(VALID_SR_HZ)
        triage = [{
            **row,
            "stats_flag_dirty": bool(
                row["dur_min"] < MIN_DUR_MS
                or row["dur_max"] > MAX_DUR_MS
                or row["sr_min"] < sr_lo or row["sr_max"] > sr_hi
                or row["transcript_nulls"] > 0),
        } for row in prof]
        triage_s = time.time() - t_triage

        t0 = time.time()
        report = validate_checkpointed(
            args.sf_dir, args.checkpoint_dir,
            replicas=args.replicas, wave_size=args.wave_size,
            config_path=args.config)
        wall = time.time() - t0

        if args.output:
            report.write(args.output)

        # per-partition pass/fail latency (BASELINE.json metric)
        store = CheckpointStore(args.checkpoint_dir)
        lat = []
        verdict_by_part = {int(r["partition"]): bool(r["passed"])
                           for r in report.verdicts.to_pylist()}
        for pid in sorted(verdict_by_part):
            # record-only access: load_partition would also pull each
            # partition's whole violations parquet through the driver
            rec = store.load_partition_meta(pid)
            lat.append({"partition": pid, "wall_s": rec["wall_s"],
                        "rows": rec["rows_scanned"],
                        "passed": verdict_by_part[pid]})
        walls = [x["wall_s"] for x in lat] or [0.0]
        print(json.dumps({
            "metric": "validation_job",
            "wall_s": round(wall, 3),
            "rows": report.manifest["rows_scanned"],
            "n_violations": report.manifest["n_violations"],
            "partitions": lat,
            "partition_latency_s": {
                "mean": round(sum(walls) / len(walls), 3),
                "max": round(max(walls), 3),
            },
            "resumed_from": report.manifest["resumed_from"],
            "all_passed": all(verdict_by_part.values()),
            "footer_triage_s": round(triage_s, 3),
            "footer_triage": triage,
        }))
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
