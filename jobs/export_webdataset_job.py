#!/usr/bin/env python
"""``ray job submit``-able WebDataset export entrypoint — the sink-side
sibling of jobs/validate_job.py:

    ray job submit --working-dir . -- \
        python jobs/export_webdataset_job.py --sf-dir /data/sfX \
            --out-dir /out/wds

RESUMABLE: committed partitions (``partition=P/_SUCCESS``) are skipped on
re-submit (the sink's atomic partition-commit contract), so a crashed
export continues where it stopped. Prints one JSON summary line:
per-partition shard counts, total members/bytes, resume skips, wall time.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--sf-dir", default=os.environ.get(
        "GRAFT_SF_DIR", "/root/testdata/sf0.001"))
    p.add_argument("--out-dir", required=True)
    p.add_argument("--replicas", type=int, default=1)
    p.add_argument("--shard-ms", type=int, default=None,
                   help="target shard payload duration (default: sink's "
                        "SHARD_MS)")
    p.add_argument("--mode", default="auto",
                   choices=["auto", "tasks", "exchange"],
                   help="writer mode: auto routes oversized partitions "
                        "to the exchange writer (bounded writer memory)")
    p.add_argument("--wave-size", type=int, default=None)
    p.add_argument("--num-cpus", type=int, default=int(
        os.environ.get("RAY_GRAFT_CPUS", "0")) or None)
    args = p.parse_args()

    import ray

    if not ray.is_initialized():  # under `ray job submit` the cluster is up
        addr = os.environ.get("RAY_ADDRESS", "local")
        ray.init(address=addr,
                 num_cpus=args.num_cpus if addr == "local" else None,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    try:
        from metrics_ray.sinks.webdataset import SHARD_MS, write_webdataset_sf

        t0 = time.time()
        manifest = write_webdataset_sf(
            args.sf_dir, args.out_dir,
            shard_ms=args.shard_ms or SHARD_MS,
            replicas=args.replicas, wave_size=args.wave_size,
            mode=args.mode)
        wall = time.time() - t0

        parts = manifest["partitions"]
        tar_bytes = sum(
            os.path.getsize(f) for f in glob.glob(
                os.path.join(args.out_dir, "partition=*", "*.tar")))
        print(json.dumps({
            "metric": "webdataset_export",
            "wall_s": round(wall, 3),
            "n_partitions": len(parts),
            "n_shards": int(sum(c["n_shards"] for c in parts.values())),
            "n_members": int(sum(c["n_members"] for c in parts.values())),
            "total_ms": int(sum(c["total_ms"] for c in parts.values())),
            "tar_bytes": int(tar_bytes),
            "resumed_skips": int(manifest["resumed_skips"]),
            "partitions": {p: {"n_shards": c["n_shards"],
                               "n_members": c["n_members"]}
                           for p, c in sorted(parts.items())},
        }))
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
