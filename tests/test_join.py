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


# ------------------------------------------------------------ as-of join

_ASOF_SCHEMA = pa.schema([("eid", pa.int64()), ("price", pa.int64())])


def _asof(left: pa.Table, right: pa.Table, **kw):
    from metrics_ray.stages.join import bucketed_asof_join

    def typed(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"eid": df["eid"].astype("int64"),
                             "price": df["price"].astype("Int64")})

    out = bucketed_asof_join(
        _ds(left), _ds(right), left_key="k", right_key="k",
        left_ts="ts", right_ts="ts", left_cols=["eid"],
        right_cols=["price"], post=typed, out_schema=_ASOF_SCHEMA, **kw)
    import ray
    tables = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
    return (pa.concat_tables(tables).to_pandas()
            .sort_values("eid").reset_index(drop=True))


def _ts(*secs):
    return pa.array([pd.Timestamp(2024, 1, 1) + pd.Timedelta(seconds=s)
                     for s in secs], pa.timestamp("us"))


def test_asof_backward_match_and_no_match():
    left = pa.table({"k": [1, 1, 2], "ts": _ts(10, 3, 10),
                     "eid": [100, 101, 102]})
    right = pa.table({"k": [1, 1, 2], "ts": _ts(5, 9, 11),
                      "price": [50, 90, 110]})
    df = _asof(left, right)
    # eid=100 (t=10) ← price@9; eid=101 (t=3) ← none; eid=102 (t=10) ← none
    assert list(df["eid"]) == [100, 101, 102]
    assert df["price"].tolist() == [90, pd.NA, pd.NA] or \
        [None if pd.isna(v) else v for v in df["price"]] == [90, None, None]


def test_asof_exact_match_and_tie_break():
    # right rows share the match timestamp → greatest tie id must win
    left = pa.table({"k": [7], "ts": _ts(5), "eid": [1]})
    right = pa.table({"k": [7, 7, 7], "ts": _ts(5, 5, 2),
                      "price": [10, 30, 99]})
    df = _asof(left, right, right_tie="price")
    assert df["price"].tolist() == [30]


def test_asof_empty_right_side():
    left = pa.table({"k": [1, 2], "ts": _ts(1, 2), "eid": [5, 6]})
    right = pa.table({"k": pa.array([], pa.int64()),
                      "ts": pa.array([], pa.timestamp("us")),
                      "price": pa.array([], pa.int64())})
    df = _asof(left, right)
    assert list(df["eid"]) == [5, 6]
    assert df["price"].isna().all()


# ------------------------------------------------------- range (band) join

_RANGE_SCHEMA = pa.schema([("eid", pa.int64()), ("n", pa.int64())])


def _range_count(left: pa.Table, right: pa.Table, band_us: int):
    from metrics_ray.stages.join import bucketed_range_count

    out = bucketed_range_count(
        _ds(left), _ds(right), left_ts="ts", right_ts="ts",
        band_us=band_us, left_cols=["eid"], out_count="n",
        out_schema=_RANGE_SCHEMA)
    import ray
    tables = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
    if not tables:
        return pd.DataFrame({"eid": [], "n": []})
    return (pa.concat_tables(tables).to_pandas()
            .sort_values("eid").reset_index(drop=True))


def test_range_count_band_edges_inclusive():
    # band = 10s; right rows exactly at ±band must count, ±(band+1) must not
    left = pa.table({"ts": _ts(100), "eid": [1]})
    right = pa.table({"ts": _ts(90, 110, 89, 111, 100),
                      "x": [0, 0, 0, 0, 0]})
    df = _range_count(left, right, band_us=10 * 1_000_000)
    assert df["n"].tolist() == [3]


def test_range_count_zero_matches_and_empty_right():
    left = pa.table({"ts": _ts(0, 5000), "eid": [1, 2]})
    right = pa.table({"ts": _ts(2000), "x": [0]})
    df = _range_count(left, right, band_us=1_000_000)
    assert df["n"].tolist() == [0, 0]
    empty = pa.table({"ts": pa.array([], pa.timestamp("us")),
                      "x": pa.array([], pa.int64())})
    df = _range_count(left, empty, band_us=1_000_000)
    assert df["n"].tolist() == [0, 0]


def test_range_count_matches_bruteforce_randomized():
    import numpy as np

    rng = np.random.RandomState(11)
    n_l, n_r = 150, 400
    lts = rng.randint(0, 50_000, n_l)
    rts = rng.randint(0, 50_000, n_r)
    band = 3_000  # seconds → tiles hold many rows, rows cross tiles
    left = pa.table({"ts": _ts(*lts),
                     "eid": np.arange(n_l, dtype="int64")})
    right = pa.table({"ts": _ts(*rts), "x": np.zeros(n_r, dtype="int64")})
    df = _range_count(left, right, band_us=band * 1_000_000)
    lus = lts.astype("int64") * 1_000_000
    rus = rts.astype("int64") * 1_000_000
    exp = [int(np.sum(np.abs(rus - t) <= band * 1_000_000)) for t in lus]
    assert df["eid"].tolist() == list(range(n_l))
    assert df["n"].tolist() == exp


def test_asof_matches_pandas_merge_asof_randomized():
    import numpy as np

    rng = np.random.RandomState(7)
    n_l, n_r = 200, 300
    lk = rng.randint(0, 12, n_l)
    rk = rng.randint(0, 12, n_r)
    lts = rng.randint(0, 10_000, n_l)
    rts = rng.randint(0, 10_000, n_r)
    left = pa.table({"k": lk, "ts": _ts(*lts),
                     "eid": np.arange(n_l, dtype="int64")})
    right = pa.table({"k": rk, "ts": _ts(*rts),
                      "price": np.arange(n_r, dtype="int64")})
    df = _asof(left, right, right_tie="price")

    lpd = left.to_pandas().sort_values("ts", kind="stable")
    rpd = (right.to_pandas()
           .sort_values(["ts", "price"], kind="stable"))
    exp = (pd.merge_asof(lpd, rpd, on="ts", by="k", direction="backward")
           .sort_values("eid").reset_index(drop=True))
    assert df["eid"].tolist() == exp["eid"].tolist()
    got = [None if pd.isna(v) else int(v) for v in df["price"]]
    want = [None if pd.isna(v) else int(v) for v in exp["price"]]
    assert got == want


def test_bloom_anti_join_matches_plain_anti_join():
    """bloom_anti_join == the exact pandas anti-join, on a deterministic
    fixture where ~half the left keys have no right match.  m_bits is
    deliberately tiny (512 bits for 600 right keys) so the Bloom filter
    produces MANY false positives — proving the bucketed verify phase
    removes every one (exactness does not depend on the fp rate)."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from metrics_ray.stages.join import bloom_anti_join

    left = pa.table({
        "k": [f"id{i:04d}" for i in range(1000)],
        "payload": [i * 3 for i in range(1000)],
    })
    right = pa.table({"rk": [f"id{i:04d}" for i in range(0, 1200, 2)]})
    got = bloom_anti_join(
        rd.from_arrow(left), rd.from_arrow(right),
        "k", "rk", ["k", "payload"], m_bits=512, k=3).to_pandas()
    ldf, rdf = left.to_pandas(), right.to_pandas()
    want = ldf[~ldf["k"].isin(rdf["rk"])]
    got = got.sort_values("k").reset_index(drop=True)
    want = want.sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    assert len(got) == 500  # odd ids 1..999


def test_bucketed_inner_join_null_keys_never_match():
    """SQL semantics: NULL join keys match nothing (pandas merge would
    pair NaN==NaN) — null-keyed rows on both sides must vanish."""
    from metrics_ray.stages.join import bucketed_inner_join

    left = pa.table({"lk": pa.array([1, None, 2], pa.int64()),
                     "lv": [10, 11, 20]})
    right = pa.table({"rk": pa.array([None, 2], pa.int64()),
                      "rv": ["nullrow", "two"]})
    out = bucketed_inner_join(
        _ds(left), _ds(right), "lk", "rk", ["lv"], ["rv"],
        out_schema=pa.schema([("lv", pa.int64()), ("rv", pa.string())]))
    df = out.to_pandas()
    assert list(df["lv"]) == [20] and list(df["rv"]) == ["two"]


def test_broadcast_enrich_duplicate_dim_key_raises():
    """A duplicated dimension key fails loudly at build time on the
    driver, not with a pandas InvalidIndexError inside N map tasks."""
    from metrics_ray.stages.join import broadcast_enrich

    facts = _ds(pa.table({"k": [1], "x": [1]}))
    dup_dim = pa.table({"k1": [1, 1], "v": [10, 11]})
    with pytest.raises(ValueError, match="duplicate key"):
        broadcast_enrich(facts, [(dup_dim, "k", "k1", {"v": "v"})])


def test_bloom_anti_join_key_not_in_left_cols():
    """The projected output need not carry the join key — phase 2 keeps
    the key internally for verification and still emits only left_cols."""
    from metrics_ray.stages.join import bloom_anti_join

    left = pa.table({"lk": ["a", "b", "c"], "lv": [1, 2, 3]})
    right = pa.table({"rk": ["b"]})
    out = bloom_anti_join(_ds(left), _ds(right), "lk", "rk",
                          ["lv"], m_bits=1 << 12)
    df = out.to_pandas()
    assert list(df.columns) == ["lv"]
    assert sorted(df["lv"]) == [1, 3]


def test_asof_null_keys_never_match():
    """NULL keys on the left keep null attachments; NULL keys on the
    right are dropped — merge_asof's by= would group NaN==NaN."""
    from metrics_ray.stages.join import bucketed_asof_join

    left = pa.table({
        "k": pa.array(["a", None], pa.string()),
        "ts": pa.array([10, 10], pa.int64()),
        "lv": [1, 2],
    })
    right = pa.table({
        "k": pa.array(["a", None], pa.string()),
        "rts": pa.array([5, 5], pa.int64()),
        "rv": ["hit", "nullside"],
    })
    out = bucketed_asof_join(
        _ds(left), _ds(right), "k", "k", "ts", "rts",
        ["lv"], ["rv"],
        out_schema=pa.schema([("__ts", pa.int64()), ("lv", pa.int64()),
                              ("__rts", pa.int64()), ("rv", pa.string())]))
    df = out.to_pandas().sort_values("lv").reset_index(drop=True)
    assert len(df) == 2  # left rows always survive (left join)
    assert df.loc[0, "rv"] == "hit"
    assert pd.isna(df.loc[1, "rv"])  # null key attached to nothing
