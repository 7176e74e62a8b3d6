"""Keyed (shuffle) checks — the operations that genuinely need an all-to-all
exchange (SURVEY.md §2.4): exact key uniqueness, content dedup, and the
bucketed anti-join for a non-broadcastable reference index.

Scale notes (the part the reference never had to solve — single JVM):
  * every shuffle here moves ONLY the key columns (clip_id / 64-bit content
    hash + partition), never the audio payload — pre-projection keeps the
    exchange O(rows × ~20B) even when the table is O(rows × 100 kB);
  * per-batch pre-aggregation (key, partition, cnt) shrinks the shuffle
    further when duplicates cluster;
  * violations and metric rows are the only materialized outputs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..schema import Codes
from ..sketches import hash64

_GOLD = np.uint64(0x9E3779B97F4A7C15)


def _preagg_key_counts(batch: pa.Table, col: str) -> pa.Table:
    """Per-batch (key, partition, cnt) partial counts (combiner before the
    groupby shuffle, 'Aggregation at scale' pattern)."""
    df = pd.DataFrame({
        "key": batch.column(col).to_pylist(),
        "partition": batch.column("partition").to_numpy(zero_copy_only=False),
    })
    g = df.groupby(["key", "partition"], sort=False).size().reset_index(name="cnt")
    return pa.table({
        "key": pa.array(g["key"].tolist(), pa.string()),
        "partition": pa.array(g["partition"].to_numpy().astype(np.int32)),
        "cnt": pa.array(g["cnt"].to_numpy().astype(np.int64)),
    })


def _dup_groups_to_rows(group: pd.DataFrame, code: str, expected: str) -> pd.DataFrame:
    """Per-key reducer: key appears with total count > 1 → one violation row
    per member occurrence (Bag-of-violating-subjects semantics,
    ValidIFPUsage.java:82-104: ALL colliding subjects are reported)."""
    total = int(group["cnt"].sum())
    if total <= 1:
        return pd.DataFrame({
            "partition": pd.Series(dtype="int32"),
            "clip_id": pd.Series(dtype="object"),
            "code": pd.Series(dtype="object"),
            "actual": pd.Series(dtype="object"),
            "expected": pd.Series(dtype="object"),
            "detail": pd.Series(dtype="object"),
        })
    g = group.sort_values(["partition", "key"], kind="stable")
    rows = g.loc[g.index.repeat(g["cnt"])]
    return pd.DataFrame({
        "partition": rows["partition"].astype("int32"),
        "clip_id": rows["key"].astype(str),
        "code": code,
        "actual": f"{total} occurrences",
        "expected": expected,
        "detail": "",
    })


def exact_duplicate_keys(ds, column: str = "clip_id",
                         check_id: str = "clipid_unique_exact"):
    """Exact key-uniqueness via hash shuffle (ValidIFPUsage.java:42-148:
    key (P,O) must map to exactly one subject; violations accumulate every
    colliding member). Returns (violations Dataset, stats dict).

    Dataflow: project(key, partition) → per-batch pre-agg → groupby(key)
    → per-group reduce. Shuffle payload = distinct keys per batch only."""
    pre = ds.select_columns([column, "partition"]).map_batches(
        lambda b: _preagg_key_counts(b, column), batch_format="pyarrow")
    viol = pre.groupby("key").map_groups(
        lambda g: _dup_groups_to_rows(g, Codes.DUPLICATE_KEY,
                                      "unique " + column),
        batch_format="pandas")
    return viol


def content_hash_batch(batch: pa.Table,
                       cols: tuple[str, ...] = ("bytes", "transcript")) -> pa.Table:
    """Vectorized 64-bit content hash over the identity columns
    (ExtensionalConciseness.java:92-134 replaced the O(n²) pairwise
    set-equality with... nothing; here: hash + groupby, SURVEY.md §2.4)."""
    h = np.zeros(len(batch), dtype=np.uint64)
    for c in cols:
        vals = batch.column(c).to_numpy(zero_copy_only=False)
        h = h * _GOLD + hash64(vals).astype(np.uint64)
    return pa.table({
        "key": pa.array([f"{x:016x}" for x in h], pa.string()),
        "partition": batch.column("partition"),
        "clip_id": batch.column("clip_id"),
    })


def _content_group_rows(group: pd.DataFrame) -> pd.DataFrame:
    """Members beyond the first (by clip_id order) of an identical-content
    group are DUPLICATE_CONTENT violations."""
    g = group.sort_values("clip_id", kind="stable")
    dup = g.iloc[1:]
    return pd.DataFrame({
        "partition": dup["partition"].astype("int32"),
        "clip_id": dup["clip_id"].astype(str),
        "code": Codes.DUPLICATE_CONTENT,
        "actual": f"group of {len(g)}",
        "expected": "unique (bytes, transcript) content",
        "detail": "first=" + str(g["clip_id"].iloc[0]),
    })


def content_duplicates(ds, cols: tuple[str, ...] = ("bytes", "transcript"),
                       check_id: str = "content_dedup"):
    """Exact content dedup: hash(content) → groupby → per-group first wins.
    Shuffles 16-byte hex keys, never the payload."""
    hashed = ds.select_columns([*cols, "clip_id", "partition"]).map_batches(
        lambda b: content_hash_batch(b, cols), batch_format="pyarrow")
    return hashed.groupby("key").map_groups(_content_group_rows,
                                            batch_format="pandas")


def bucketed_anti_join(left_ds, right_ds, key: str = "clip_id",
                       right_key: str | None = None, n_buckets: int = 32):
    """Hash-partitioned anti-join for a non-broadcastable right side
    (DataCubePopulationCompleteness's gold-standard MINUS observed at scale).
    Both sides gain bucket = hash(key) % B, are co-grouped per bucket, and
    the per-bucket reducer emits left keys absent from right.

    ``right_key`` names the join column on the right side when it differs
    (e.g. customer.c_custkey vs orders.o_custkey).

    Skew note: bucket on the hashed key (uniform) — hot raw keys cannot
    concentrate because identical keys MUST co-locate for correctness; the
    B knob caps per-task memory instead."""
    right_key = right_key or key

    def tag(side: str, col: str):
        def f(b: pa.Table) -> pa.Table:
            keys = [None if k is None else str(k)
                    for k in b.column(col).to_pylist()]
            h = hash64(np.array(keys, dtype=object))
            return pa.table({
                "bucket": pa.array((h % np.uint64(n_buckets)).astype(np.int32)),
                "key": pa.array(keys, pa.string()),
                "side": pa.array([side] * len(keys), pa.string()),
                "partition": (b.column("partition") if "partition" in b.column_names
                              else pa.array([-1] * len(keys), pa.int32())),
            })
        return f

    left_cols = [key] + (["partition"]
                         if "partition" in left_ds.schema().names else [])
    tagged = left_ds.select_columns(left_cols).map_batches(
        tag("l", key), batch_format="pyarrow").union(
        right_ds.select_columns([right_key]).map_batches(
            tag("r", right_key), batch_format="pyarrow"))

    def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
        right_keys = set(g.loc[g["side"] == "r", "key"])
        left = g[g["side"] == "l"]
        miss = left[~left["key"].isin(right_keys)]
        return pd.DataFrame({
            "partition": miss["partition"].astype("int32"),
            "clip_id": miss["key"].astype(str),
            "code": Codes.MISSING_REFERENCE,
            "actual": miss["key"].astype(str),
            "expected": f"{key} present in reference index",
            "detail": "bucketed",
        })

    return tagged.groupby("bucket").map_groups(reduce_bucket,
                                               batch_format="pandas")
