"""Sketch layer tests: mergeability, determinism, accuracy envelopes.

Accuracy tolerances follow the reference's estimate-test pattern
(ReuseExistingTermsTest.java:53 — tol 0.15 on estimated metrics) while
determinism is exact (SURVEY.md §7.4 mergeable-state correctness).
"""

import numpy as np
import pytest

from metrics_ray.sketches import HLL, FixedHistogram, TDigest, hash64, loads_any


def test_hash64_stable_and_vectorized():
    a = np.array(["a", "b", "a"], dtype=object)
    h = hash64(a)
    assert h[0] == h[2] and h[0] != h[1]
    assert np.array_equal(h, hash64(a.copy()))


def test_hll_accuracy_and_merge():
    vals = hash64(np.arange(50_000)).astype(np.uint64)
    n_true = len(np.unique(vals))
    one = HLL()
    one.add_hashes(vals)
    est = one.estimate()
    assert abs(est - n_true) / n_true < 0.05

    # merge of halves == whole (exact register equality)
    h1, h2 = HLL(), HLL()
    h1.add_hashes(vals[:25_000])
    h2.add_hashes(vals[25_000:])
    merged = h1.merge(h2)
    assert np.array_equal(merged.registers, one.registers)
    # serialization roundtrip
    assert np.array_equal(loads_any(merged.dumps()).registers, one.registers)


def test_hll_small_cardinality_linear_counting():
    h = HLL()
    vals = np.arange(100, dtype=np.uint64) * np.uint64(2654435761) * np.uint64(2**32 + 1)
    import pandas as pd

    h.add_hashes(pd.util.hash_array(np.arange(100)))
    assert abs(h.estimate() - 100) < 3


def test_tdigest_quantiles_and_merge():
    rng = np.random.default_rng(7)
    vals = rng.normal(1000.0, 100.0, size=40_000)
    td = TDigest()
    for chunk in np.array_split(vals, 10):
        td.add(chunk)
    for q, expect in ((0.5, 1000.0), (0.1, 1000.0 - 128.2), (0.9, 1000.0 + 128.2)):
        got = td.quantile(q)
        assert abs(got - np.quantile(vals, q)) < 15.0, (q, got)
    # merge path
    t1, t2 = TDigest(), TDigest()
    t1.add(vals[:20_000])
    t2.add(vals[20_000:])
    tm = t1.merge(t2)
    assert abs(tm.quantile(0.5) - np.quantile(vals, 0.5)) < 15.0
    assert tm.n == 40_000
    rt = loads_any(tm.dumps())
    assert rt.quantile(0.5) == tm.quantile(0.5)


def test_histogram_psi_ks():
    edges = np.linspace(0, 100, 21)
    rng = np.random.default_rng(3)
    ref = FixedHistogram(edges)
    ref.add(rng.uniform(0, 100, 100_000))
    same = FixedHistogram(edges)
    same.add(rng.uniform(0, 100, 50_000))
    shifted = FixedHistogram(edges)
    shifted.add(rng.uniform(30, 130, 50_000))
    assert same.psi(ref) < 0.01
    assert shifted.psi(ref) > 0.5
    assert same.ks(ref) < 0.02
    assert shifted.ks(ref) > 0.2
    # merge
    m = same.merge(shifted)
    assert m.counts.sum() == 100_000
    rt = loads_any(m.dumps())
    assert np.array_equal(rt.counts, m.counts)


def test_tdigest_deterministic():
    vals = np.sin(np.arange(10_000)) * 500 + 500
    a, b = TDigest(), TDigest()
    a.add(vals)
    b.add(vals)
    assert np.array_equal(a.means, b.means)


@pytest.mark.usefixtures("ray_session")
def test_sketch_aggregate_fns(sf_unit):
    """Sketches merged INSIDE Ray's groupby-aggregate: per-partition HLL
    distinct counts within 2% of exact; t-digest medians within the
    partition's value range."""
    import duckdb

    from metrics_ray.checks.agg import distinct_per_key, quantiles_per_key
    from metrics_ray.pipelines.clips import clips_dataset

    ds = clips_dataset(sf_unit, with_audio=False)
    got = distinct_per_key(ds, "partition", "clip_id").to_pandas()

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf_unit}/documents.parquet'")
    from metrics_ray import synth

    exact = con.execute(
        f"WITH {synth.CLIPS_SQL} SELECT partition, "
        "COUNT(DISTINCT clip_id) AS n FROM clips GROUP BY partition "
        "ORDER BY partition").fetchdf()
    assert len(got) == len(exact) == 8
    rel = abs(got.est_distinct.values - exact.n.values) / exact.n.values
    assert (rel < 0.02).all()

    qs = quantiles_per_key(clips_dataset(sf_unit, with_audio=False),
                           "partition", "dur_ms").to_pandas()
    assert len(qs) == 8
    assert ((qs.p25 <= qs.p50) & (qs.p50 <= qs.p75)).all()


# ----------------------------------------------------------- heavy hitters

def test_heavyhitters_exact_when_under_k():
    from metrics_ray.sketches import HeavyHitters, merge_blobs

    rng = np.random.default_rng(7)
    stream = rng.choice([f"t{i}" for i in range(20)], size=5000,
                        p=np.arange(20, 0, -1) / np.arange(20, 0, -1).sum())
    items, true = np.unique(stream.astype(str), return_counts=True)
    hh = HeavyHitters(k=64)
    # offer in 10 pre-aggregated chunks
    for chunk in np.array_split(stream, 10):
        it, ct = np.unique(chunk.astype(str), return_counts=True)
        hh.offer(it.astype(object), ct)
    assert hh.err == 0
    got_items, got_counts = hh.estimates()
    want = {i: c for i, c in zip(items, true)}
    assert {i: c for i, c in zip(got_items, got_counts)} == want
    # n-way blob merge of per-chunk partials == single-pass sketch
    blobs = []
    for chunk in np.array_split(stream, 10):
        it, ct = np.unique(chunk.astype(str), return_counts=True)
        p = HeavyHitters(k=64)
        p.offer(it.astype(object), ct)
        blobs.append(p.dumps())
    merged = merge_blobs(blobs)
    assert merged.err == 0
    mi, mc = merged.estimates()
    assert {i: c for i, c in zip(mi, mc)} == want


def test_heavyhitters_guarantee_under_small_k():
    """Misra–Gries bounds: est <= true, true - est <= err, and every item
    with true > err survives — even with k far below the cardinality."""
    from metrics_ray.sketches import HeavyHitters

    rng = np.random.default_rng(11)
    # zipf-ish: a few giants, a long tail of singletons
    giants = np.repeat([f"g{i}" for i in range(5)], 2000)
    tail = np.array([f"tail{i}" for i in range(3000)])
    stream = np.concatenate([giants, tail])
    rng.shuffle(stream)
    items, true = np.unique(stream.astype(str), return_counts=True)
    truth = dict(zip(items, true))

    hh = HeavyHitters(k=16)
    for chunk in np.array_split(stream, 23):
        it, ct = np.unique(chunk.astype(str), return_counts=True)
        hh.offer(it.astype(object), ct)
    assert hh.err > 0
    gi, gc = hh.estimates()
    est = dict(zip(gi, gc))
    assert len(est) <= 16
    for i, c in est.items():
        assert c <= truth[i]
        assert truth[i] - c <= hh.err
    for i, c in truth.items():
        if c > hh.err:
            assert i in est, f"heavy item {i} (n={c}, err={hh.err}) missing"


def test_heavyhitters_serialization_roundtrip():
    from metrics_ray.sketches import HeavyHitters

    hh = HeavyHitters(k=8)
    hh.offer(np.array(["a", "b", "a"], dtype=object),
             np.array([3, 2, 1], dtype=np.int64))
    rt = loads_any(hh.dumps())
    assert rt.k == 8 and rt.err == hh.err
    assert list(rt.estimates()[0]) == list(hh.estimates()[0])
    assert list(rt.estimates()[1]) == [4, 2]


# ------------------------------------------------------------ Bloom filter

def test_bloom_no_false_negatives_and_fp_rate():
    from metrics_ray.sketches import BloomFilter, loads_any, merge_blobs

    keys = np.array([f"k{i}" for i in range(5000)], dtype=object)
    bf = BloomFilter(m_bits=1 << 16, k=7)
    bf.add(keys)
    assert bf.contains(keys).all()  # no false negatives, ever
    probe = np.array([f"absent{i}" for i in range(20000)], dtype=object)
    fp = bf.contains(probe).mean()
    # theoretical fp ≈ (1-e^{-kn/m})^k ≈ 0.0086 at this load; allow 3x
    assert fp < 0.03
    # merge = OR; roundtrip preserves bits
    b2 = BloomFilter(m_bits=1 << 16, k=7)
    b2.add(probe[:500])
    merged = merge_blobs([bf.dumps(), b2.dumps()])
    assert merged.contains(keys).all()
    assert merged.contains(probe[:500]).all()
    assert np.array_equal(loads_any(bf.dumps()).bits, bf.bits)


def test_hll_estimate_within_tolerance_of_exact_query(ray_session):
    """The HLL per-partition distinct estimate must sit within 2% of the
    EXACT distinct query (val_partition_distinct_exact — itself
    SQL-oracle-verified), anchoring the sketch's accuracy claim to a
    hash-checked ground truth rather than an in-test recompute."""
    import pandas as pd

    from metrics_ray.pipelines.queries import VALIDATION_QUERIES

    SF = "/root/testdata/sf0.001"
    est = VALIDATION_QUERIES["val_partition_distinct"][0](SF).to_pandas()
    exact = VALIDATION_QUERIES["val_partition_distinct_exact"][0](
        SF).to_pandas()
    m = est.merge(exact, on="partition")
    assert len(m) == len(exact) > 0
    rel = (m["est_distinct"] - m["n_distinct"]).abs() / m["n_distinct"]
    assert (rel <= 0.02).all(), m
