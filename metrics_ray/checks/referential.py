"""Referential integrity + transcript equality — broadcast semi/anti join.

DataCubePopulationCompleteness.java:58-289 analog: before() loads a
gold-standard codelist, finalize computes gold MINUS observed and reports
missing members as a Bag. Here the gold standard is the transcript_index side
table; the join is BROADCAST (ray.put once, ray.get in each actor's setup —
never re-shipped per batch) because the index is the small side. For an index
too large to broadcast, use the bucketed variant in ``checks/keyed.py``
(hash-partitioned anti-join — same verdicts, explicit shuffle).

Two problem families from one lookup:
  MISSING_REFERENCE    clip_id not in the index (anti-join hit)
  TRANSCRIPT_MISMATCH  transcript differs from the index reference
                       (the input_hint's exact-transcript-equality invariant)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..schema import Codes
from .base import (
    BatchCheck,
    BatchOutcome,
    CheckContext,
    per_partition_counts,
    violations_table,
)


class ReferentialCheck(BatchCheck):
    check_id = "referential_transcript"
    columns = ("clip_id", "transcript", "partition")

    def __init__(self, check_id: str = "referential_transcript",
                 check_equality: bool = True):
        self.check_id = check_id
        self.check_equality = check_equality
        self._index: pd.DataFrame | None = None

    def setup(self, ctx: CheckContext) -> None:
        idx = ctx.params.get("transcript_index")
        if idx is not None and not isinstance(idx, pd.DataFrame):
            import ray

            idx = ray.get(idx)  # broadcast ObjectRef → local read-only copy
        if idx is not None:
            idx = idx.set_index("clip_id")["ref_transcript"]
        self._index = idx

    def evaluate(self, batch: pa.Table) -> BatchOutcome:
        part = batch.column("partition").to_numpy(zero_copy_only=False)
        if self._index is None:
            return BatchOutcome(
                counters=per_partition_counts(part, np.zeros(len(batch), bool)))
        ids = pd.Series(batch.column("clip_id").to_pylist())
        ref = ids.map(self._index)  # vectorized hash lookup
        missing = ref.isna().to_numpy()
        mask = missing.copy()
        tables = []
        if missing.any():
            i = np.nonzero(missing)[0]
            tables.append(violations_table(
                part[i], ids.iloc[i].tolist(), Codes.MISSING_REFERENCE,
                ids.iloc[i].tolist(), "clip_id present in transcript_index"))
        if self.check_equality:
            tr = pd.Series(batch.column("transcript").to_pylist())
            neq = (~missing) & ~(
                (tr.isna() & ref.isna()) | (tr == ref)).to_numpy()
            if neq.any():
                i = np.nonzero(neq)[0]
                tables.append(violations_table(
                    part[i], ids.iloc[i].tolist(), Codes.TRANSCRIPT_MISMATCH,
                    ["null" if v is None else str(v)[:80] for v in tr.iloc[i]],
                    "exact transcript equality vs index"))
            mask |= neq
        viol = pa.concat_tables(tables) if tables else None
        return BatchOutcome(violations=viol,
                            counters=per_partition_counts(part, mask))
