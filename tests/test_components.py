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


def test_label_propagation_matches_union_find_on_audio_graph(sf_unit):
    """The distributed scale path reproduces the driver union-find on the
    REAL acoustic near-dup pair graph (string clip ids mapped through the
    same 8-digit int encoding the query uses) — locks the documented
    'label_propagation as the unbounded path' claim for audio clusters."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from metrics_ray.pipelines.queries import (q_audio_dup_clusters,
                                               q_audio_neardup)
    from metrics_ray.stages.components import label_propagation

    pairs = q_audio_neardup(sf_unit)
    assert pairs.num_rows > 0

    def as_int(col):
        return pc.cast(pc.utf8_slice_codeunits(col, 5, 13), pa.int64())

    edges = pa.table({"doc_a": as_int(pairs.column("clip_a")),
                      "doc_b": as_int(pairs.column("clip_b"))})
    lp = (label_propagation(rd.from_arrow(edges), max_rounds=16)
          .to_pandas().sort_values("doc_id").reset_index(drop=True))
    uf = q_audio_dup_clusters(sf_unit).to_pandas()
    uf_int = pa.table({
        "doc_id": as_int(pa.chunked_array([uf["clip_id"]])),
        "cluster_id": as_int(pa.chunked_array([uf["cluster_id"]])),
    }).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert (lp["doc_id"].to_numpy() == uf_int["doc_id"].to_numpy()).all()
    assert (lp["cluster_id"].to_numpy()
            == uf_int["cluster_id"].to_numpy()).all()
