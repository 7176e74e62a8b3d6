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


def referential_violations_dist(clips_ds, index_ds,
                                check_equality: bool = True,
                                n_buckets: int | None = None):
    """Distributed referential check for a NON-broadcastable index: one
    tagged-union co-group on clip_id emits BOTH problem families
    (MISSING_REFERENCE + TRANSCRIPT_MISMATCH) from a single exchange —
    same verdicts as the broadcast ReferentialCheck, no driver
    materialization of either side. This is the path ``validate_sf``
    auto-switches to when the index exceeds the broadcast budget
    (checks/referential.py module docstring; the reference's analog is
    DataCubePopulationCompleteness's gold-standard MINUS observed, which
    also never assumes the gold standard fits one worker).

    Shuffle payload: (clip_id, transcript|ref_transcript, partition) —
    the audio payload never enters the exchange. Returns a violations
    Dataset (KEYED_VIOLATION_SCHEMA, no check_id column)."""
    from .keyed import KEYED_VIOLATION_SCHEMA, grouped_apply_fast

    def tag(side: str, text_col: str):
        def f(b: pa.Table) -> pa.Table:
            n = b.num_rows
            return pa.table({
                "key": b.column("clip_id").cast(pa.string()),
                "side": pa.array([side] * n, pa.string()),
                "text": b.column(text_col).cast(pa.string()),
                "partition": (b.column("partition").cast(pa.int32())
                              if "partition" in b.column_names
                              else pa.nulls(n, pa.int32())),
            })
        return f

    tagged = clips_ds.map_batches(
        tag("l", "transcript"), batch_format="pyarrow").union(
        index_ds.map_batches(tag("r", "ref_transcript"),
                             batch_format="pyarrow"))

    def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # duplicate index keys are a data error; verdicts follow the
        # lexicographically-least ref text — DETERMINISTIC across runs
        # (bucket arrival order is not) and identical to the broadcast
        # ReferentialCheck's policy
        right = (g[g["side"] == "r"]
                 .sort_values(["key", "text"], kind="stable")
                 .drop_duplicates("key"))
        ref = right.set_index("key")["text"]
        left = g[g["side"] == "l"]
        ids = left["key"]
        looked = ids.map(ref)
        present = ids.isin(ref.index).to_numpy()
        out = []
        if (~present).any():
            miss = left[~present]
            out.append(pd.DataFrame({
                # fillna: a left side without a partition column tags null
                # partitions (pa.nulls above) → NaN after to_pandas; the
                # plain int32 cast would raise IntCastingNaNError
                "partition": miss["partition"].fillna(-1).astype("int32"),
                "clip_id": miss["key"].astype(str),
                "code": Codes.MISSING_REFERENCE,
                "actual": miss["key"].astype(str),
                "expected": "clip_id present in transcript_index",
                "detail": "bucketed",
            }))
        if check_equality:
            tr = left["text"]
            neq = present & ~((tr.isna() & looked.isna())
                              | (tr == looked)).to_numpy()
            if neq.any():
                bad = left[neq]
                out.append(pd.DataFrame({
                    "partition": bad["partition"].fillna(-1).astype("int32"),
                    "clip_id": bad["key"].astype(str),
                    "code": Codes.TRANSCRIPT_MISMATCH,
                    "actual": bad["text"].map(
                        lambda v: "null" if pd.isna(v) else str(v)[:80]),
                    "expected": "exact transcript equality vs index",
                    "detail": "bucketed",
                }))
        if not out:
            return pd.DataFrame({
                "partition": pd.Series(dtype="int32"),
                "clip_id": pd.Series(dtype="object"),
                "code": pd.Series(dtype="object"),
                "actual": pd.Series(dtype="object"),
                "expected": pd.Series(dtype="object"),
                "detail": pd.Series(dtype="object"),
            })
        return pd.concat(out, ignore_index=True)

    return grouped_apply_fast(tagged, "key", reduce_bucket, n_buckets=n_buckets,
                         out_schema=KEYED_VIOLATION_SCHEMA)


EDITDIST_DEFAULT_CAP = 8


def transcript_editdist_violations(clips_ds, index_ds,
                                   cap: int = EDITDIST_DEFAULT_CAP,
                                   n_buckets: int | None = None):
    """Graded transcript-drift audit as a KEYED suite check (the
    ray-job/resume surface of pipelines.queries.q_transcript_editdist):
    clips whose transcript is within 1..cap byte-level edits of the
    indexed reference become EditDistance violations — a small distance
    is a typo/light re-label; equality and hard mismatches are the
    ReferentialCheck's domain.

    Two-phase scale shape (same as the standalone query): phase 1 joins
    8-byte transcript DIGESTS (text never crosses the wire) and collects
    only the O(violations) mismatched clip_ids; phase 2 re-filters both
    sides to that broadcast candidate set and ships text through ONE
    bucketed exchange, scoring each pair with the pair-batched capped DP
    (functions.text.levenshtein_batch). Returns a violations Dataset
    (KEYED_VIOLATION_SCHEMA, no check_id column)."""
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    from ..collect import arrow_refs
    from ..functions.text import levenshtein_batch
    from ..sketches import hash_column
    from ..stages.join import bucketed_inner_join
    from .keyed import KEYED_VIOLATION_SCHEMA

    def hashed(src_col: str, out_col: str):
        def f(b: pa.Table) -> pa.Table:
            dig = pc.cast(pa.array(hash_column(b.column(src_col)),
                                   pa.uint64()), pa.string())
            return pa.table({"clip_id": b.column("clip_id"), out_col: dig})
        return f

    left_h = clips_ds.map_batches(hashed("transcript", "th"),
                                  batch_format="pyarrow")
    right_h = index_ds.map_batches(hashed("ref_transcript", "rth"),
                                   batch_format="pyarrow")

    def mismatched(df: pd.DataFrame) -> pd.DataFrame:
        neq = df["th"] != df["rth"]
        return pd.DataFrame({"clip_id": df.loc[neq, "clip_id"].astype(str)})

    cand_t = [t for t in ray.get(arrow_refs(bucketed_inner_join(
        left_h, right_h, left_key="clip_id", right_key="clip_id",
        left_cols=["clip_id", "th"], right_cols=["rth"],
        post=mismatched, n_buckets=n_buckets,
        out_schema=pa.schema([("clip_id", pa.string())]))))
        if t.num_rows]
    if not cand_t:
        return rd.from_arrow(KEYED_VIOLATION_SCHEMA.empty_table())
    cand_ref = ray.put(
        pa.concat_tables(cand_t).column("clip_id").combine_chunks())

    def member_filter(drop_null_transcript: bool):
        def f(b: pa.Table) -> pa.Table:
            m = pc.is_in(b.column("clip_id"), value_set=ray.get(cand_ref))
            if drop_null_transcript:
                m = pc.and_(m, pc.is_valid(b.column("transcript")))
            return b.filter(m)
        return f

    left = clips_ds.map_batches(member_filter(True), batch_format="pyarrow")
    right = index_ds.map_batches(member_filter(False),
                                 batch_format="pyarrow")

    def post(df: pd.DataFrame) -> pd.DataFrame:
        d = levenshtein_batch(df["transcript"].tolist(),
                              df["ref_transcript"].tolist(), cap=cap)
        keep = (d >= 1) & (d <= cap)
        bad = df[keep]
        return pd.DataFrame({
            "partition": bad["partition"].fillna(-1).astype("int32"),
            "clip_id": bad["clip_id"].astype(str),
            "code": Codes.EDIT_DISTANCE,
            "actual": d[keep].astype(np.int64).astype(str),
            "expected": "0 byte edits vs indexed reference",
            "detail": f"levenshtein<= {cap}",
        })

    return bucketed_inner_join(
        left, right, left_key="clip_id", right_key="clip_id",
        left_cols=["clip_id", "transcript", "partition"],
        right_cols=["ref_transcript"],
        post=post, n_buckets=n_buckets,
        out_schema=KEYED_VIOLATION_SCHEMA)


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
            # dup-safe AND deterministic: a duplicated index key must not
            # crash every batch with InvalidIndexError, and the kept row
            # must not depend on input order — verdicts follow the
            # lexicographically-least ref text, same policy as the dist
            # variant's reduce_bucket
            idx = (idx.sort_values(["clip_id", "ref_transcript"],
                                   kind="stable")
                   .drop_duplicates("clip_id")
                   .set_index("clip_id")["ref_transcript"])
        self._index = idx

    def evaluate(self, batch: pa.Table) -> BatchOutcome:
        part = batch.column("partition").to_numpy(zero_copy_only=False)
        if self._index is None:
            return BatchOutcome(
                counters=per_partition_counts(part, np.zeros(len(batch), bool)))
        ids = pd.Series(batch.column("clip_id").to_pylist())
        ref = ids.map(self._index)  # vectorized hash lookup
        # membership, not ref.isna(): an index row whose ref_transcript is
        # null is PRESENT (null==null counts as equal below) — same
        # verdicts as referential_violations_dist's ids.isin(ref.index)
        missing = (~ids.isin(self._index.index)).to_numpy()
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
