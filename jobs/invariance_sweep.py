#!/usr/bin/env python
"""Full-registry partition-invariance sweep — the cross-plan certification
tool behind BASELINE.md's "131/131 identical" records.

Runs EVERY ``__ray_entry__.queries()`` entry in a fresh Ray session at a
given cpu count and prints one JSON line mapping query name to
``[row_count, value_hash]`` (columns sorted by name, rows sorted, CSV
sha256 — the same normalization the driver's oracle compare uses).
Running it at two cpu counts and diffing the outputs certifies that every
physical plan (Dataset sort exchange, task-graph hash exchange, task-wave
collections, broadcast vs distributed joins) produces bit-identical
results regardless of parallelism:

    python jobs/invariance_sweep.py 2  > /tmp/a.json
    python jobs/invariance_sweep.py 32 > /tmp/b.json
    python - <<'PY'
    import json
    a, b = (json.load(open(p)) for p in ("/tmp/a.json", "/tmp/b.json"))
    diff = {k: (a[k], b.get(k)) for k in a if a[k] != b.get(k)}
    print(f"{len(a)-len(diff)}/{len(a)} identical", diff or "")
    PY

``SWEEP_SF`` selects the scale dir (default sf0.01; sf0.001 maximizes
empty-bucket pressure on the task-graph plans).
"""
from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ncpu = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
                 logging_level="ERROR")
    import pandas as pd
    import pyarrow as pa

    import __ray_entry__ as e

    sf = os.environ.get("SWEEP_SF", "/root/testdata/sf0.01")
    out = {}
    for name, fn in e.queries().items():
        try:
            r = fn(sf)
            if isinstance(r, pd.DataFrame):
                t = pa.Table.from_pandas(r, preserve_index=False)
            elif hasattr(r, "to_arrow_refs"):
                t = pa.concat_tables(
                    [x for x in ray.get(r.materialize().to_arrow_refs())
                     if x.num_rows])
            else:
                t = r
            df = t.to_pandas()
            df = (df[sorted(df.columns)].sort_values(sorted(df.columns))
                  .reset_index(drop=True))
            h = hashlib.sha256(df.to_csv(index=False).encode()).hexdigest()[:16]
            out[name] = [len(df), h]
        except Exception as ex:  # recorded, not raised: the DIFF is the gate
            out[name] = ["ERR", f"{type(ex).__name__}: {str(ex)[:120]}"]
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
