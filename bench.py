#!/usr/bin/env python
"""Benchmark harness for the metrics_ray validation engine.

Default: run the headline validation suite (full check family over the
derived clips table, SURVEY.md §7.3) plus every driver query over
``$GRAFT_SF_DIR`` (default /root/testdata/sf0.1) and print ONE JSON line::

    {"metric": "validation_suite_sec", "value": N, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N, ...}

``--scaling``: run the headline suite twice in FRESH python processes at
num_cpus=8 and num_cpus=32 on the same pre-built input, report clips/sec at
both plus scaling efficiency (speedup / cpu-ratio) — the in-sandbox evidence
for the north_rule's N→4N cluster-size criterion (BASELINE.md).

Owns its Ray session (the one entry point allowed to call ray.init).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time


def _sf_tag(sf_dir: str) -> float:
    base = os.path.basename(os.path.normpath(sf_dir))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def _init_ray(num_cpus: int) -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")


def run_headline(sf_dir: str, replicas: int) -> dict:
    """Full validation suite; returns timing + throughput."""
    from metrics_ray.pipelines.clips import ensure_clips_parquet, validate_sf

    t0 = time.time()
    ensure_clips_parquet(sf_dir, replicas=replicas)  # warm the input cache
    prepare_s = time.time() - t0

    t0 = time.time()
    report = validate_sf(sf_dir, replicas=replicas)
    suite_s = time.time() - t0
    rows = int(report.manifest["rows_scanned"])
    return {
        "prepare_s": round(prepare_s, 3),
        "suite_s": round(suite_s, 3),
        "rows": rows,
        "clips_per_sec": round(rows / suite_s, 1),
        "n_violations": int(report.manifest["n_violations"]),
        "n_checks": int(report.manifest["n_checks"]),
    }


def run_queries(sf_dir: str) -> dict[str, float]:
    """Time every driver-facing query (the SURVEY.md §2 operator surface)."""
    import __ray_entry__ as e

    out: dict[str, float] = {}
    for name, fn in e.queries().items():
        t0 = time.time()
        fn(sf_dir)
        out[name] = round(time.time() - t0, 3)
    return out


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--sf-dir", default=os.environ.get(
        "GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    p.add_argument("--num-cpus", type=int, default=int(
        os.environ.get("RAY_GRAFT_CPUS", "32")))
    p.add_argument("--replicas", type=int, default=1,
                   help="replicate the derived clips table N× for bigger runs")
    p.add_argument("--headline-only", action="store_true",
                   help="suite only (used by --scaling child processes)")
    p.add_argument("--scaling", action="store_true",
                   help="run headline at 8 and 32 cpus in fresh processes")
    args = p.parse_args()

    if args.scaling:
        run_scaling(args)
        return

    _init_ray(args.num_cpus)
    try:
        head = run_headline(args.sf_dir, args.replicas)
        queries = {} if args.headline_only else run_queries(args.sf_dir)
        result = {
            "metric": "validation_suite_sec",
            "value": head["suite_s"],
            "unit": "sec",
            "queries": queries,
            "sf": _sf_tag(args.sf_dir),
            "num_cpus": args.num_cpus,
            "rows": head["rows"],
            "clips_per_sec": head["clips_per_sec"],
            "prepare_s": head["prepare_s"],
            "n_violations": head["n_violations"],
            "n_checks": head["n_checks"],
        }
        print(json.dumps(result))
    finally:
        import ray

        ray.shutdown()


def run_scaling(args) -> None:
    """Same job, two parallelism levels, fresh processes (north_rule)."""
    lo, hi = 8, 32
    # Pre-build the input cache once so both children stream identical parquet.
    _init_ray(args.num_cpus)
    from metrics_ray.pipelines.clips import ensure_clips_parquet

    ensure_clips_parquet(args.sf_dir, replicas=args.replicas)
    import ray

    ray.shutdown()

    runs = {}
    for n in (lo, hi):
        env = dict(os.environ, RAY_GRAFT_CPUS=str(n))
        cmd = [sys.executable, os.path.abspath(__file__),
               "--sf-dir", args.sf_dir, "--num-cpus", str(n),
               "--replicas", str(args.replicas), "--headline-only"]
        out = subprocess.run(cmd, env=env, capture_output=True, text=True,
                             cwd=os.path.dirname(os.path.abspath(__file__)))
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        runs[n] = json.loads(line)

    tput = {n: runs[n]["clips_per_sec"] for n in (lo, hi)}
    speedup = tput[hi] / tput[lo] if tput[lo] else float("nan")
    efficiency = speedup / (hi / lo)
    print(json.dumps({
        "metric": "scaling_efficiency",
        "value": round(efficiency, 3),
        "unit": "ratio",
        "queries": {f"suite_cpus{n}_sec": runs[n]["value"] for n in (lo, hi)},
        "sf": _sf_tag(args.sf_dir),
        "num_cpus": hi,
        "throughput": {str(n): tput[n] for n in (lo, hi)},
        "speedup": round(speedup, 3),
        "cpu_ratio": hi / lo,
        "rows": runs[hi]["rows"],
    }))


if __name__ == "__main__":
    main()
