"""Distributed sampling operators — the reference's Estimated* sampling
machinery (SURVEY.md §2.5/§2.6) re-expressed as deterministic hash-based
Dataset stages:

  stratified_sample   proportional per-stratum sampling
                      (EstimatedDereferenceabilityByStratified.java:76-80:
                      20% of every stratum, preserving stratum proportions)
  per_key_sample      bounded per-key reservoir (ByTld semantics:
                      EstimatedDereferenceabilityByTld.java:151-167 — at
                      most k sampled members for every key)

Both are deterministic (seeded hash priorities, no RNG): the sampled set
is a pure function of the row identity, so it is identical across
workers, runs, batch sizes, and resume — the property a classic
stateful reservoir cannot give a multi-worker engine (see
sketches.BottomKSample for the mergeable sketch flavor).

Scale notes: stratified_sample is embarrassingly parallel (a row-local
mask inside map_batches — no shuffle at all, strata need not be
co-located because Bernoulli-by-hash is proportional per stratum by
construction). per_key_sample shuffles (key, row_key, carried columns)
through ONE bucketed co-group and selects bottom-k per key vectorized
inside each bucket.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..checks.keyed import grouped_apply_fast
from ..sketches import hash64

_GOLD = 0x9E3779B97F4A7C15


# Re-exported for callers that treat sampling as the entry point; the
# canonical home is sketches.md5_lower64 (shared with the simhash path).
from ..sketches import md5_lower64  # noqa: E402,F401


def _row_priorities(ids, seed: int, priority: str = "siphash") -> np.ndarray:
    if priority == "md5":
        return md5_lower64(ids)
    ids = np.array(ids, dtype=object)
    return hash64(ids) ^ np.uint64(seed * _GOLD % (1 << 64))


def stratified_sample(ds, fraction: float, row_key: str,
                      seed: int = 0xA11CE, priority: str = "siphash"):
    """Keep each row iff hash(row[row_key], seed) falls below ``fraction``
    of the hash space. Expected per-stratum rate = ``fraction`` for EVERY
    stratum regardless of skew (each row tosses its own deterministic
    coin), which is exactly proportional allocation — without computing
    stratum sizes, without a shuffle, and stable under resume.

    ``priority="md5"`` selects the DuckDB-mirrorable hash (see
    ``md5_lower64``) so the sampled set itself is SQL-checkable."""
    # float(2**64 - 1) == 2.0**64 exactly, so fraction == 1.0 would scale
    # to 2**64 and overflow uint64 — cap at the max representable value
    # (keep-everything); fractions < 1.0 are unchanged (same formula as
    # the SQL mirrors' threshold constants).
    thr = np.uint64(min(int(min(max(fraction, 0.0), 1.0) * float(2**64 - 1)),
                        2**64 - 1))

    def samp(b: pa.Table) -> pa.Table:
        pri = _row_priorities(b.column(row_key).to_pylist(), seed, priority)
        return b.take(pa.array(np.nonzero(pri <= thr)[0]))

    return ds.map_batches(samp, batch_format="pyarrow")


def per_key_sample(ds, key: str, k: int, row_key: str,
                   seed: int = 0xBEE5, out_schema: pa.Schema | None = None,
                   priority: str = "siphash"):
    """At most ``k`` rows per distinct ``key`` value: the members with the
    smallest hash(row_key) priorities (deterministic per-key bottom-k —
    a uniform without-replacement sample of each key's members).

    One bucketed co-group (grouped_apply) co-locates each key's rows;
    selection is a vectorized groupby-rank inside the bucket. Hot keys
    cost O(members log members) locally and emit exactly k rows — the
    per-key reservoir the reference holds in a single JVM map, made
    distributed."""
    def pick(df: pd.DataFrame) -> pd.DataFrame:
        pri = _row_priorities(df[row_key].to_numpy(), seed, priority)
        # deterministic tie-break on row_key (matches the SQL window
        # ORDER BY priority, row_key) — rank(method="first") alone would
        # depend on in-bucket row order at equal priorities
        df = (df.assign(__pri=pri)
              .sort_values([key, "__pri", row_key], kind="stable"))
        rank = df.groupby(key, sort=False).cumcount()
        out = df[rank < k].drop(columns="__pri")
        return out.sort_values([key, row_key], kind="stable")

    return grouped_apply_fast(ds, key, pick, out_schema=out_schema)
