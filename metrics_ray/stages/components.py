"""Duplicate-cluster resolution — the step after near-dup detection that a
training-data pipeline actually consumes: group the pair list into connected
components and pick one canonical representative (min doc_id) per cluster,
so every other member can be dropped.

Two implementations with identical semantics:

  connected_components_local  union-find over a driver-resident pair table.
                              Pairs are the OUTPUT of the near-dup queries
                              (already O(duplicates), already collected), so
                              this is not a corpus materialization — but it
                              is bounded by the dup rate.
  label_propagation           the scale path: iterative min-label spreading
                              over a distributed edge Dataset. Each round is
                              two bucketed co-groups (src-side join emits
                              candidate labels to each dst; dst-side reduce
                              takes the min); rounds needed = component
                              diameter, and a near-dup graph's components
                              are tiny cliques (diameter 1-2), so the
                              default bound is ample. Nothing reaches the
                              driver except the per-round changed-label
                              count (one small aggregate).

Tested against each other on random graphs (tests/test_components.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..checks.keyed import grouped_apply_fast

_MSG_SCHEMA = pa.schema([("doc", pa.int64()), ("lbl", pa.int64()),
                         ("own", pa.int64())])
_LBL_SCHEMA = pa.schema([("doc", pa.int64()), ("lbl", pa.int64())])
_OUT_SCHEMA = pa.schema([("doc", pa.int64()), ("lbl", pa.int64()),
                         ("changed", pa.int64())])


def connected_components_local(pairs: pa.Table,
                               a_col: str = "doc_a",
                               b_col: str = "doc_b") -> pd.DataFrame:
    """Union-find → DataFrame (doc_id, cluster_id = component min)."""
    a = pairs.column(a_col).to_numpy(zero_copy_only=False).astype(np.int64)
    b = pairs.column(b_col).to_numpy(zero_copy_only=False).astype(np.int64)
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.setdefault(root, root) != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for u, v in zip(a, b):
        ru, rv = find(int(u)), find(int(v))
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    docs = sorted(parent)
    return pd.DataFrame({
        "doc_id": pd.Series(docs, dtype="int64"),
        "cluster_id": pd.Series([find(d) for d in docs], dtype="int64"),
    })


def label_propagation(edges_ds, max_rounds: int = 8):
    """Distributed min-label connected components over an edge Dataset
    (columns doc_a, doc_b) → Dataset (doc_id, cluster_id).

    Per round: (1) co-group labels with the symmetric edge list by SOURCE
    node — each bucket emits its sources' current labels to their
    neighbors, plus each node's own label marked ``own``; (2) co-group by
    DESTINATION — min over candidates, flagging changes. Stops when a
    round changes nothing, or logs loudly at ``max_rounds`` so truncation
    is never silent."""
    import logging

    import ray.data as rd

    def to_edges(b: pa.Table) -> pa.Table:
        a = b.column("doc_a").to_numpy(zero_copy_only=False).astype(np.int64)
        bb = b.column("doc_b").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "src": pa.array(np.concatenate([a, bb])),
            "dst": pa.array(np.concatenate([bb, a])),
        })

    edges = edges_ds.map_batches(to_edges, batch_format="pyarrow")
    edge_refs = edges.materialize().to_arrow_refs()

    def seed(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("src")["dst"].min().reset_index()
        return pd.DataFrame({
            "doc": g["src"].astype("int64"),
            "lbl": np.minimum(g["src"], g["dst"]).astype("int64"),
        })

    labels = grouped_apply_fast(rd.from_arrow_refs(edge_refs), "src", seed,
                           out_schema=_LBL_SCHEMA)

    def tag_lbl(b: pa.Table) -> pa.Table:
        return pa.table({"key": b.column("doc"), "side_lbl": b.column("lbl"),
                         "dst": pa.array([None] * b.num_rows, pa.int64())})

    def tag_edge(b: pa.Table) -> pa.Table:
        return pa.table({"key": b.column("src"),
                         "side_lbl": pa.array([None] * b.num_rows, pa.int64()),
                         "dst": b.column("dst")})

    def emit_msgs(df: pd.DataFrame) -> pd.DataFrame:
        lbl = df[df["dst"].isna()]
        edge = df[df["dst"].notna()]
        cur = pd.Series(lbl["side_lbl"].to_numpy(),
                        index=lbl["key"].to_numpy())
        cur = cur[~cur.index.duplicated()]
        own = pd.DataFrame({"doc": lbl["key"].astype("int64"),
                            "lbl": lbl["side_lbl"].astype("int64"),
                            "own": 1})
        msg = pd.DataFrame({"doc": edge["dst"].astype("int64"),
                            "lbl": edge["key"].map(cur).astype("int64"),
                            "own": 0})
        return pd.concat([own, msg], ignore_index=True)

    def reduce_min(df: pd.DataFrame) -> pd.DataFrame:
        new = df.groupby("doc")["lbl"].min()
        old = df[df["own"] == 1].groupby("doc")["lbl"].min()
        old = old.reindex(new.index)  # every node carries an own row
        return pd.DataFrame({
            "doc": new.index.to_numpy().astype("int64"),
            "lbl": new.to_numpy().astype("int64"),
            "changed": (new.to_numpy() != old.to_numpy()).astype("int64"),
        })

    for _ in range(max_rounds):
        tagged = (labels.map_batches(tag_lbl, batch_format="pyarrow")
                  .union(rd.from_arrow_refs(edge_refs).map_batches(
                      tag_edge, batch_format="pyarrow")))
        msgs = grouped_apply_fast(tagged, "key", emit_msgs,
                             out_schema=_MSG_SCHEMA)
        new_labels = grouped_apply_fast(msgs, "doc", reduce_min,
                                   out_schema=_OUT_SCHEMA).materialize()
        # distributed count — only the scalar reaches the driver
        # (take_all here would ship O(nodes) rows per round)
        changed = int(new_labels.select_columns(["changed"])
                      .sum("changed") or 0)
        labels = (rd.from_arrow_refs(new_labels.to_arrow_refs())
                  .select_columns(["doc", "lbl"]))
        if changed == 0:
            break
    else:
        logging.getLogger(__name__).warning(
            "label_propagation hit max_rounds=%d before convergence",
            max_rounds)

    return labels.map_batches(
        lambda b: pa.table({"doc_id": b.column("doc"),
                            "cluster_id": b.column("lbl")}),
        batch_format="pyarrow")
