"""Duplicate-cluster resolution: driver union-find vs distributed
min-label propagation must agree on arbitrary pair graphs."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from metrics_ray.stages.components import connected_components_local

pytestmark = pytest.mark.usefixtures("ray_session")


def _random_pairs(n_nodes=120, n_edges=90, seed=3):
    rng = np.random.RandomState(seed)
    a = rng.randint(0, n_nodes, n_edges).astype(np.int64)
    b = rng.randint(0, n_nodes, n_edges).astype(np.int64)
    keep = a != b
    return pa.table({"doc_a": pa.array(a[keep]), "doc_b": pa.array(b[keep])})


def test_union_find_basics():
    pairs = pa.table({"doc_a": pa.array([1, 2, 10], pa.int64()),
                      "doc_b": pa.array([2, 3, 11], pa.int64())})
    df = connected_components_local(pairs)
    got = dict(zip(df["doc_id"], df["cluster_id"]))
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_label_propagation_matches_union_find():
    import ray.data as rd

    from metrics_ray.stages.components import label_propagation

    pairs = _random_pairs()
    exact = connected_components_local(pairs)
    out = label_propagation(rd.from_arrow(pairs), max_rounds=16)
    got = (out.to_pandas().sort_values("doc_id").reset_index(drop=True)
           .astype("int64"))
    exp = exact.sort_values("doc_id").reset_index(drop=True).astype("int64")
    assert got.equals(exp)


def test_label_propagation_chain_diameter():
    """A long path graph needs multiple rounds — exercises iteration."""
    import ray.data as rd

    from metrics_ray.stages.components import label_propagation

    n = 12
    pairs = pa.table({
        "doc_a": pa.array(list(range(100, 100 + n - 1)), pa.int64()),
        "doc_b": pa.array(list(range(101, 100 + n)), pa.int64()),
    })
    out = label_propagation(rd.from_arrow(pairs), max_rounds=16).to_pandas()
    assert set(out["cluster_id"]) == {100}
    assert len(out) == n
