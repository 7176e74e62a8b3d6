"""Join operators (stages/join.py): broadcast enrichment chain and the
large-large bucketed inner join, plus edge cases the oracle queries don't
reach (empty sides, unmatched keys, overlap rejection)."""

import pandas as pd
import pyarrow as pa
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")


def _ds(table: pa.Table):
    import ray.data as rd

    return rd.from_arrow(table)


def test_broadcast_enrich_chain_and_default():
    from metrics_ray.stages.join import broadcast_enrich

    facts = _ds(pa.table({"k": [1, 2, 3, 9], "x": [10, 20, 30, 90]}))
    dim1 = pa.table({"k1": [1, 2, 3], "mid": [100, 200, 300]})
    dim2 = pa.table({"k2": [100, 200], "name": ["a", "b"]})
    out = broadcast_enrich(
        facts,
        [(dim1, "k", "k1", {"mid": "mid"}),
         (dim2, "mid", "k2", {"name": "name"})],
        defaults={"name": "?"})
    df = out.to_pandas().sort_values("k").reset_index(drop=True)
    assert list(df["name"]) == ["a", "b", "?", "?"]  # 3→300 missing, 9 missing


def test_bucketed_inner_join_matches_pandas_merge():
    from metrics_ray.stages.join import bucketed_inner_join

    left = pa.table({"lk": [1, 2, 2, 3, 5], "lv": [10, 20, 21, 30, 50]})
    right = pa.table({"rk": [2, 3, 3, 4], "rv": ["x", "y", "z", "w"]})
    out = bucketed_inner_join(
        _ds(left), _ds(right), "lk", "rk", ["lv"], ["rv"],
        out_schema=pa.schema([("lv", pa.int64()), ("rv", pa.string())]))
    got = (out.to_pandas().sort_values(["lv", "rv"])
           .reset_index(drop=True))
    exp = (left.to_pandas().assign(__k=lambda d: d.lk.astype(str))
           .merge(right.to_pandas().assign(__k=lambda d: d.rk.astype(str)),
                  on="__k")[["lv", "rv"]]
           .sort_values(["lv", "rv"]).reset_index(drop=True))
    assert got.equals(exp)
    assert len(got) == 4  # lk=2 (×2) ⋈ rk=2 (×1) + lk=3 (×1) ⋈ rk=3 (×2)


def test_bucketed_inner_join_rejects_overlap():
    from metrics_ray.stages.join import bucketed_inner_join

    t = pa.table({"k": [1], "v": [1]})
    with pytest.raises(ValueError, match="disjoint"):
        bucketed_inner_join(_ds(t), _ds(t), "k", "k", ["v"], ["v"])


def test_verify_pairs_distributed_empty_candidates():
    import ray.data as rd

    from metrics_ray.pipelines.docs import (
        _PAIR_SCHEMA,
        verify_pairs_distributed,
    )

    cand = rd.from_arrow(_PAIR_SCHEMA.empty_table())
    corpus = rd.from_arrow(pa.table({"doc_id": [1, 2],
                                     "text": ["a b c", "d e f"]}))
    out = verify_pairs_distributed(cand, corpus)
    import ray

    tables = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
    assert tables == []
