"""Sampling family: bottom-k reservoir sketch, stratified / per-key
sampling stages, sampled DecodeCheck (the Estimated* execution mode), and
the deterministic mega-group cap that replaced round-1's drop guard."""

import numpy as np
import pyarrow as pa
import pytest

from metrics_ray.checks.keyed import cap_group_members
from metrics_ray.sketches import BottomKSample, loads_any

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------------ bottom-k sketch

def test_bottomk_deterministic_and_bounded():
    keys = np.array([f"k{i}" for i in range(5000)], dtype=object)
    a = BottomKSample(k=100)
    a.add(keys)
    b = BottomKSample(k=100)
    b.add(keys)
    assert a.n == 100
    assert set(a.sample()) == set(b.sample())


def test_bottomk_merge_equals_single_pass():
    keys = np.array([f"k{i}" for i in range(3000)], dtype=object)
    whole = BottomKSample(k=64)
    whole.add(keys)
    parts = []
    for lo in range(0, 3000, 700):  # uneven splits, arbitrary order
        s = BottomKSample(k=64)
        s.add(keys[lo:lo + 700])
        parts.append(s)
    merged = parts[3].merge(parts[0]).merge(parts[2]).merge(
        parts[1]).merge(parts[4])
    assert set(merged.sample()) == set(whole.sample())
    # idempotent: re-merging a partial changes nothing (resume safety)
    again = merged.merge(parts[2])
    assert set(again.sample()) == set(whole.sample())


def test_bottomk_roundtrip_and_values():
    keys = np.array(["a", "b", "c"], dtype=object)
    vals = np.array([1.0, 2.0, 3.0], dtype=object)
    s = BottomKSample(k=10)
    s.add(keys, vals)
    r = loads_any(s.dumps())
    assert set(r.sample()) == {1.0, 2.0, 3.0}


def test_bottomk_is_uniformish():
    # each disjoint half of the key space should get roughly half the slots
    keys = np.array([f"k{i}" for i in range(20000)], dtype=object)
    s = BottomKSample(k=1000)
    s.add(keys)
    picked = {str(v) for v in s.sample()}
    lo = sum(1 for p in picked if int(p[1:]) < 10000)
    assert 350 < lo < 650


# ------------------------------------------------------------- group capping

def test_cap_group_members_identity_below_cap():
    ids = np.arange(50, dtype=np.int64)
    assert np.array_equal(cap_group_members(ids, 100), np.arange(50))


def test_cap_group_members_bounded_deterministic_subset():
    ids = np.arange(5000, dtype=np.int64) * 3 + 1
    idx1 = cap_group_members(ids, 200)
    idx2 = cap_group_members(ids, 200)
    assert len(idx1) == 200
    assert np.array_equal(idx1, idx2)
    assert np.all(np.diff(idx1) > 0)  # sorted positions
    # spread: both halves represented (a prefix-take would fail this)
    assert 50 < (idx1 < 2500).sum() < 150


# ------------------------------------------------------- dataset-level stages

def test_stratified_sample_proportions_and_determinism(ray_session):
    from metrics_ray.pipelines.queries import q_stratified_sample

    t1 = q_stratified_sample(SF)
    t2 = q_stratified_sample(SF)
    assert t1.to_pydict() == t2.to_pydict()
    from metrics_ray.pipelines.clips import clips_dataset

    total = clips_dataset(SF, with_audio=False).count()
    rate = t1.num_rows / total
    assert 0.12 < rate < 0.28  # 20% +- sampling noise at ~500 rows
    # every partition represented (proportional, not collapsed)
    assert len(set(t1.column("partition").to_pylist())) >= 6


def test_per_key_sample_bound_and_determinism(ray_session):
    from metrics_ray.pipelines.queries import q_ev_user_sample

    t1 = q_ev_user_sample(SF)
    t2 = q_ev_user_sample(SF)
    assert t1.to_pydict() == t2.to_pydict()
    import pandas as pd

    df = t1.to_pandas()
    per_key = df.groupby("user_id").size()
    assert per_key.max() <= 5
    # the sampled rows are real events
    import pyarrow.parquet as pq

    ev = pq.read_table(f"{SF}/events.parquet", columns=["event_id"])
    assert set(df["event_id"]).issubset(set(ev.column("event_id").to_pylist()))


# -------------------------------------------------------- sampled DecodeCheck

def test_decode_sampled_subset_and_rate(ray_session):
    from metrics_ray.pipelines.queries import (
        q_decode_violations,
        q_decode_violations_sampled,
    )

    full = q_decode_violations(SF).to_pandas()
    samp = q_decode_violations_sampled(SF).to_pandas()
    # determinism
    samp2 = q_decode_violations_sampled(SF).to_pandas()
    assert samp.equals(samp2)
    # sampled violations are exactly a subset of the full-scan violations
    full_set = set(map(tuple, full.itertuples(index=False)))
    samp_set = set(map(tuple, samp.itertuples(index=False)))
    assert samp_set.issubset(full_set)
    assert 0 < len(samp_set) < len(full_set)
    # violation-rate estimate within the reference's 0.15 tolerance
    from metrics_ray.pipelines.clips import clips_dataset
    from metrics_ray.pipelines.queries import DECODE_SAMPLE_FRACTION

    n = clips_dataset(SF, with_audio=False).count()
    rate_full = full["clip_id"].nunique() / n
    rate_samp = samp["clip_id"].nunique() / (n * DECODE_SAMPLE_FRACTION)
    assert abs(rate_samp - rate_full) <= 0.15


def test_decode_sampled_is_estimate():
    from metrics_ray.checks.decode import DecodeCheck

    assert DecodeCheck(sample_fraction=0.5).is_estimate
    assert not DecodeCheck().is_estimate


def test_reservoir_quantile_check(ray_session):
    from metrics_ray.checks.sketch_checks import ReservoirQuantileCheck
    from metrics_ray.pipelines.clips import clips_dataset
    from metrics_ray.runner import run_batch_checks

    check = ReservoirQuantileCheck("dur_reservoir", "dur_ms", k=256)
    ds = clips_dataset(SF, with_audio=False)
    _, counters, partials = run_batch_checks(ds, [check])
    blob = check.merge([b for _, b in partials["dur_reservoir"]])
    assert blob is not None
    value, passed, detail = check.finalize_value(1, 0, blob)
    assert passed and "n=256" in detail
    # the reservoir median should sit near the true median
    import pyarrow.compute as pc

    exact = np.median([r["dur_ms"] for r in
                       ds.select_columns(["dur_ms"]).take_all()])
    assert abs(value - exact) / max(exact, 1) < 0.25


# ------------------------------------------- per-entity disjoint-set check

def test_disjoint_types_matches_oracle(ray_session):
    """AdvancedEntitiesAsMembersOfDisjointClasses semantics: grouped
    type-set vs rule bank == the DuckDB self-join oracle."""
    import duckdb

    from metrics_ray.pipelines.rel import (SQL_EV_DISJOINT_TYPES,
                                           q_ev_disjoint_types)

    t = q_ev_disjoint_types(SF)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    o = con.sql(SQL_EV_DISJOINT_TYPES).arrow()
    assert t.num_rows == o.num_rows
    assert t.to_pydict() == o.to_pydict()


def test_disjoint_types_sampled_is_entity_restriction(ray_session):
    """EstimateSimple… flavor: the hash-Bernoulli entity bound yields
    EXACTLY the full result restricted to the sampled entity universe —
    deterministic, no recall loss within the sample."""
    from metrics_ray.pipelines.rel import (q_ev_disjoint_types,
                                           q_ev_disjoint_types_sampled)

    full = q_ev_disjoint_types(SF)
    samp = q_ev_disjoint_types_sampled(SF)
    rows = lambda t: set(zip(*[t.column(c).to_pylist()
                               for c in t.column_names]))
    f, s = rows(full), rows(samp)
    assert s <= f
    sampled_users = {r[0] for r in s}
    # every violation of a sampled entity is present (subset is exact,
    # not lossy) and re-running is bit-stable
    assert s == {r for r in f if r[0] in sampled_users}
    again = rows(q_ev_disjoint_types_sampled(SF))
    assert again == s


def test_stratified_fraction_one_keeps_all(ray_session):
    """fraction=1.0 scales to exactly 2**64 in float — must clamp to the
    max uint64 (keep everything), not OverflowError before any batch."""
    import ray.data as rd

    from metrics_ray.stages.sampling import stratified_sample

    t = pa.table({"clip_id": [f"clip-{i:08d}" for i in range(50)]})
    out = stratified_sample(rd.from_arrow(t), 1.0, "clip_id")
    assert out.count() == 50
