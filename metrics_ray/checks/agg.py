"""Sketches as Ray Data aggregations: mergeable sketch state merged VIA
``groupby().aggregate`` (the north-star dataflow), complementing the
runner's tagged-stream driver reduce.

Use this path when per-key sketch state must stay distributed — e.g. a
distinct-count per partition over 10^12 rows where even one blob per batch
per key is too much for the driver: the combine tree runs inside Ray's
aggregate operator and only the final per-key sketches come back.

``AggregateFnV2`` contract (ray.data.aggregate): ``aggregate_block`` folds
one block into an accumulator, ``combine`` merges two accumulators — both
must be serializable; sketches are carried as their ``dumps()`` bytes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data.aggregate import AggregateFnV2
from ray.data.block import Block, BlockAccessor

from ..sketches import HLL, TDigest, hash64, loads_any


class HLLAgg(AggregateFnV2):
    """groupby(key).aggregate(HLLAgg("col")) → per-key serialized HLL.

    The per-block fold hashes the whole column vectorized; combines are
    register-wise max (associative + commutative), so the aggregation tree
    shape cannot change the result."""

    def __init__(self, on: str, alias_name: str | None = None):
        super().__init__(alias_name or f"hll({on})", zero_factory=bytes,
                         on=on, ignore_nulls=False)
        self._col = on

    def aggregate_block(self, block: Block) -> bytes:
        t = BlockAccessor.for_block(block).to_arrow()
        vals = t.column(self._col).to_numpy(zero_copy_only=False)
        h = HLL()
        h.add_hashes(hash64(vals))
        return h.dumps()

    def combine(self, a: bytes, b: bytes) -> bytes:
        if not a:
            return b
        if not b:
            return a
        return loads_any(a).merge(loads_any(b)).dumps()


class TDigestAgg(AggregateFnV2):
    """groupby(key).aggregate(TDigestAgg("col")) → per-key serialized
    t-digest (quantile profile per key)."""

    def __init__(self, on: str, alias_name: str | None = None):
        super().__init__(alias_name or f"tdigest({on})", zero_factory=bytes,
                         on=on, ignore_nulls=False)
        self._col = on

    def aggregate_block(self, block: Block) -> bytes:
        t = BlockAccessor.for_block(block).to_arrow()
        vals = t.column(self._col).to_numpy(zero_copy_only=False)
        td = TDigest()
        td.add(np.asarray(vals, dtype=np.float64))
        return td.dumps()

    def combine(self, a: bytes, b: bytes) -> bytes:
        if not a:
            return b
        if not b:
            return a
        return loads_any(a).merge(loads_any(b)).dumps()


def distinct_per_key(ds, key: str, column: str) -> pa.Table:
    """Per-key approximate distinct counts, merged inside Ray's aggregate
    operator: → (key, est_distinct)."""
    out = ds.groupby(key).aggregate(HLLAgg(column, alias_name="sketch"))
    rows = out.take_all()
    return pa.table({
        key: pa.array([r[key] for r in rows]),
        "est_distinct": pa.array(
            [float(loads_any(r["sketch"]).estimate()) if r["sketch"]
             else 0.0 for r in rows], pa.float64()),
    }).sort_by(key)


def quantiles_per_key(ds, key: str, column: str,
                      qs=(0.25, 0.5, 0.75)) -> pa.Table:
    """Per-key quantile profile via distributed t-digest merge:
    → (key, p25, p50, p75, ...)."""
    out = ds.groupby(key).aggregate(TDigestAgg(column, alias_name="sketch"))
    rows = out.take_all()
    cols = {key: pa.array([r[key] for r in rows])}
    tds = [loads_any(r["sketch"]) if r["sketch"] else TDigest()
           for r in rows]
    for q in qs:
        cols[f"p{int(q * 100):02d}"] = pa.array(
            [td.quantile(q) for td in tds], pa.float64())
    return pa.table(cols).sort_by(key)
