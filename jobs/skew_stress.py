#!/usr/bin/env python
"""Skew-stress harness for the keyed exchange paths (VERDICT r4 #1).

Builds two deliberately skewed fixtures and drives the three shuffle-bearing
dedup/join paths over them, with DuckDB parity on the SAME skewed data:

  clips-side : ~10% of rows collapsed onto ONE clip_id AND one identical
               (bytes, transcript) payload — a mega key group through
               exact_duplicate_keys + content_duplicates, and (via a right
               index that lacks the hot id) a mega miss through
               bucketed_anti_join.
  docs-side  : ~10% of documents share one text — every minhash band of the
               hot family collides into one mega-band through
               q_doc_neardup_minhash's banding exchange.

The reference design-point this demonstrates is the stratified/proportional
family's skew posture (EstimatedDereferenceabilityByStratified.java:40-80):
hot keys must co-locate for correctness, so the engine pre-aggregates
per-batch BEFORE the exchange (the shuffle payload for the hot key is one
partial row per batch, not its members) and caps in-bucket pair expansion
(cap_group_members). This harness measures what those guards deliver
end-to-end: wall under skew vs uniform, per-bucket row distribution, and
violations byte-identical to SQL recomputed on the skewed table.

Run (fresh process per cpu count, same input):
    RAY_GRAFT_CPUS=2 python jobs/skew_stress.py --sf-dir /root/testdata/sf0.01
    RAY_GRAFT_CPUS=8 python jobs/skew_stress.py --sf-dir /root/testdata/sf0.01
Prints ONE JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

HOT_ID = "clip-90099999"  # inside the 9-prefix dup namespace, unused value


def _dir_fingerprint(path: str) -> str:
    """Cheap (mtime_ns, size) digest over a file or a directory's parquet
    files — keys the skew-fixture caches so regenerated SOURCE data
    rebuilds them instead of silently comparing two data generations."""
    import hashlib

    files = ([path] if os.path.isfile(path) else sorted(
        os.path.join(r, f) for r, _d, fs in os.walk(path) for f in fs
        if f.endswith(".parquet")))
    h = hashlib.sha256()
    for f in files:
        st = os.stat(f)
        h.update(f"{f}:{st.st_mtime_ns}:{st.st_size};".encode())
    return h.hexdigest()[:10]


def build_skewed_clips(sf_dir: str, out_dir: str, hot_every: int = 10) -> str:
    """Every hot_every-th row of the derived clips table collapses onto
    HOT_ID with one shared (bytes, transcript) payload. Deterministic,
    cached by source fingerprint."""
    from metrics_ray.pipelines.clips import ensure_clips_parquet

    src = ensure_clips_parquet(sf_dir)
    tag = f"{os.path.basename(os.path.normpath(src))}_{_dir_fingerprint(src)}"
    out = os.path.join(out_dir, f"skew_{tag}_h{hot_every}.parquet")
    if os.path.exists(out):
        return out
    t = pq.read_table(src)
    n = t.num_rows
    hot = np.arange(n) % hot_every == 0
    first = int(np.nonzero(hot)[0][0])
    ids = np.asarray(t.column("clip_id").to_pylist(), dtype=object)
    ids[hot] = HOT_ID
    pay = t.column("bytes").to_pylist()
    hot_pay = pay[first]
    tr = t.column("transcript").to_pylist()
    hot_tr = tr[first]
    for i in np.nonzero(hot)[0]:
        pay[i] = hot_pay
        tr[i] = hot_tr
    cols = {name: t.column(name) for name in t.column_names}
    cols["clip_id"] = pa.array(ids.tolist(), pa.string())
    cols["bytes"] = pa.array(pay, pa.binary())
    cols["transcript"] = pa.array(tr, pa.string())
    os.makedirs(out_dir, exist_ok=True)
    # row groups sized like the uniform cache's (~300-row groups): the
    # skewed fixture must differ from uniform ONLY in key/content skew,
    # not in read parallelism — one monolithic row group would cap the
    # payload-bound content-hash stage at a single read task and the A/B
    # would measure file layout, not skew
    pq.write_table(pa.table(cols), out, row_group_size=max(64, n // 16))
    return out


def build_skewed_docs(sf_dir: str, out_dir: str, hot_every: int = 10) -> str:
    """sf-dir clone containing only documents.parquet, with every
    hot_every-th document's text replaced by document 0's text — one
    mega minhash band family."""
    doc_src = os.path.join(sf_dir, "documents.parquet")
    out_sf = os.path.join(
        out_dir,
        f"skewdocs_{os.path.basename(os.path.normpath(sf_dir))}"
        f"_{_dir_fingerprint(doc_src)}_h{hot_every}")
    out = os.path.join(out_sf, "documents.parquet")
    if os.path.exists(out):
        return out_sf
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    txt = t.column("text").to_pylist()
    hot_txt = txt[0]
    for i in range(0, len(txt), hot_every):
        txt[i] = hot_txt
    cols = {name: t.column(name) for name in t.column_names}
    cols["text"] = pa.array(txt, pa.string())
    os.makedirs(out_sf, exist_ok=True)
    pq.write_table(pa.table(cols), out)
    return out_sf


def _collect_sorted(ds, keys):
    import ray

    from metrics_ray.collect import arrow_refs

    tables = [t for t in ray.get(arrow_refs(ds)) if t.num_rows]
    if not tables:
        return None
    return pa.concat_tables(tables).sort_by([(k, "ascending") for k in keys])


def bucket_stats(path: str) -> dict:
    """Exchange-payload shape for the dup-key path: per-bucket row counts
    AFTER the per-batch pre-agg (what actually crosses the wire) and the
    per-bucket MEMBER counts (what the reducer expands)."""
    from metrics_ray.checks.keyed import shuffle_blocks
    from metrics_ray.sketches import hash_column

    t = pq.read_table(path, columns=["clip_id"])
    keys = t.column("clip_id").combine_chunks()
    B = shuffle_blocks()
    bk = (hash_column(keys) % np.uint64(B)).astype(np.int64)
    members = np.bincount(bk, minlength=B)
    # pre-agg partials: distinct key per (batch, partition) — upper-bound
    # with distinct keys per bucket (single partial per key after merge)
    import pandas as pd

    dk = pd.DataFrame({"b": bk, "k": keys.to_pylist()}).groupby(
        "b")["k"].nunique().reindex(range(B), fill_value=0).to_numpy()
    return {
        "n_buckets": int(B),
        "member_rows_max": int(members.max()),
        "member_rows_median": float(np.median(members)),
        "exchange_keys_max": int(dk.max()),
        "exchange_keys_median": float(np.median(dk)),
    }


def drive_clips_paths(path: str, uniform_path: str) -> dict:
    """exact_duplicate_keys + content_duplicates + bucketed_anti_join over
    one clips parquet; each path runs TWICE and reports the second (warm)
    wall, so the A/B compares exchange behavior under skew rather than
    which fixture paid the page-cache cold start. Returns walls and
    violation counts."""
    import ray.data as rd

    from metrics_ray.checks.keyed import (bucketed_anti_join,
                                          content_duplicates,
                                          exact_duplicate_keys)

    def timed(build, keys):
        res = wall = None
        for _ in range(2):  # second run = warm wall
            t0 = time.time()
            res = _collect_sorted(build(), keys)
            wall = round(time.time() - t0, 3)
        return wall, res

    out = {}
    out["dup_wall_s"], dup = timed(
        lambda: exact_duplicate_keys(rd.read_parquet(
            path, columns=["clip_id", "partition"])),
        ["clip_id", "partition"])
    out["dup_rows"] = 0 if dup is None else dup.num_rows

    out["content_wall_s"], cd = timed(
        lambda: content_duplicates(rd.read_parquet(
            path, columns=["bytes", "transcript", "clip_id", "partition"])),
        ["clip_id", "partition"])
    out["content_rows"] = 0 if cd is None else cd.num_rows

    # right index = distinct clip_ids of the UNIFORM table → the hot id
    # (and the fixture's seeded missing refs) miss through one bucket
    out["anti_wall_s"], anti = timed(
        lambda: bucketed_anti_join(
            rd.read_parquet(path, columns=["clip_id", "partition"]),
            rd.read_parquet(uniform_path, columns=["clip_id"])),
        ["clip_id", "partition"])
    out["anti_rows"] = 0 if anti is None else anti.num_rows
    return out, dup, cd, anti


def clips_parity(con, path: str, uniform_path: str, dup, cd, anti) -> dict:
    """DuckDB recompute of all three violation sets on the SAME skewed
    parquet; byte-identical comparison on the sorted frames."""
    import pandas as pd

    def pat(p: str) -> str:  # ensure_clips_parquet returns a DIRECTORY
        return os.path.join(p, "*.parquet") if os.path.isdir(p) else p

    con.execute(
        f"CREATE OR REPLACE VIEW sk AS SELECT * FROM read_parquet('{pat(path)}')")
    con.execute(
        f"CREATE OR REPLACE VIEW un AS SELECT * FROM read_parquet('{pat(uniform_path)}')")

    def eq(engine_tbl, sql, cols):
        want = con.execute(sql).fetchdf()
        got = (pd.DataFrame(columns=cols) if engine_tbl is None
               else engine_tbl.to_pandas()[cols])
        got = got.sort_values(cols, kind="stable").reset_index(drop=True)
        want = want[cols].sort_values(cols, kind="stable").reset_index(drop=True)
        return bool(len(got) == len(want)
                    and (got.astype(str).values == want.astype(str).values).all())

    ok = {}
    ok["dup"] = eq(dup, """
WITH c AS (SELECT clip_id, partition, COUNT(*) AS cnt
           FROM sk GROUP BY clip_id, partition),
t AS (SELECT clip_id, SUM(cnt) AS total FROM c
      GROUP BY clip_id HAVING SUM(cnt) > 1)
SELECT c.partition, c.clip_id,
       CAST(t.total AS VARCHAR) || ' occurrences' AS actual
FROM c JOIN t USING (clip_id), UNNEST(range(c.cnt))
ORDER BY clip_id, partition""", ["partition", "clip_id", "actual"])
    # content dedup is FIRST-WINS (members beyond the first, by clip_id
    # order, violate). partition is excluded from the compare: the hot
    # family shares ONE clip_id across partitions, so WHICH of the tied
    # rows is "first" (and therefore which partition drops out) is
    # bucket-arrival-dependent — clip_id multiset + group size are the
    # deterministic content-identity facts
    ok["content"] = eq(cd, """
WITH g AS (SELECT clip_id,
                  row_number() OVER (PARTITION BY bytes, transcript
                                     ORDER BY clip_id) AS rn,
                  COUNT(*) OVER (PARTITION BY bytes, transcript) AS total
           FROM sk)
SELECT clip_id, 'group of ' || total AS actual
FROM g WHERE total > 1 AND rn > 1 ORDER BY clip_id""",
                      ["clip_id", "actual"])
    ok["anti"] = eq(anti, """
SELECT s.partition, s.clip_id
FROM sk s LEFT JOIN (SELECT DISTINCT clip_id FROM un) u USING (clip_id)
WHERE u.clip_id IS NULL ORDER BY s.clip_id, s.partition""",
                    ["partition", "clip_id"])
    return ok


def drive_minhash(sf_dir: str, con, with_parity: bool = True) -> dict:
    """q_doc_neardup_minhash over a (possibly skewed) docs dir + parity
    against its exact O(n²) Jaccard oracle on the same documents view."""
    from metrics_ray.pipelines.queries import VALIDATION_QUERIES

    fn, sql = VALIDATION_QUERIES["doc_neardup_minhash"]
    t0 = time.time()
    got = fn(sf_dir)
    wall = round(time.time() - t0, 3)
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    out = {"wall_s": wall, "pairs": len(got)}
    if with_parity:
        con.execute(
            "CREATE OR REPLACE VIEW documents AS SELECT * FROM "
            f"read_parquet('{os.path.join(sf_dir, 'documents.parquet')}')")
        want = con.execute(sql).fetchdf()
        cols = sorted(got.columns)
        g = got[cols].astype(str).sort_values(cols).reset_index(drop=True)
        w = want[cols].astype(str).sort_values(cols).reset_index(drop=True)
        out["parity"] = bool(len(g) == len(w) and (g.values == w.values).all())
    return out


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p.add_argument("--hot-every", type=int, default=10)
    p.add_argument("--out-dir", default="/tmp/metrics_ray_skew")
    p.add_argument("--num-cpus", type=int, default=int(
        os.environ.get("RAY_GRAFT_CPUS", "8")))
    p.add_argument("--no-parity", action="store_true",
                   help="walls only (the exact O(n²) Jaccard oracle is "
                        "meant for the sf0.01 gate scale)")
    args = p.parse_args()

    import duckdb
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    try:
        from metrics_ray.pipelines.clips import ensure_clips_parquet

        uniform = ensure_clips_parquet(args.sf_dir)
        skew = build_skewed_clips(args.sf_dir, args.out_dir, args.hot_every)
        skew_docs = build_skewed_docs(args.sf_dir, args.out_dir,
                                      args.hot_every)
        con = duckdb.connect()

        u_walls, *_ = drive_clips_paths(uniform, uniform)
        s_walls, dup, cd, anti = drive_clips_paths(skew, uniform)
        parity = (None if args.no_parity
                  else clips_parity(con, skew, uniform, dup, cd, anti))
        mh_u = drive_minhash(args.sf_dir, con, with_parity=not args.no_parity)
        mh_s = drive_minhash(skew_docs, con, with_parity=not args.no_parity)

        print(json.dumps({
            "metric": "skew_stress",
            "num_cpus": args.num_cpus,
            "hot_every": args.hot_every,
            "rows": int(pq.read_table(skew, columns=["partition"]).num_rows),
            "uniform": u_walls,
            "skewed": s_walls,
            "parity": parity,
            "minhash_uniform": mh_u,
            "minhash_skewed": mh_s,
            "bucket_stats": {"uniform": bucket_stats(uniform),
                             "skewed": bucket_stats(skew)},
        }))
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
