"""Property-based (hypothesis) tests for the mergeable sketches — the
engine's distributed-state backbone (north star: "actor pools holding
mergeable sketches ... merged via groupby-aggregate").

Each property is the exact guarantee the suite architecture RELIES on,
checked over arbitrary inputs and arbitrary stream partitionings instead
of hand-picked fixtures:

  * partition invariance — adding a stream in any split + merging the
    partials must equal the single-pass sketch (what makes per-batch /
    per-partition partials + groupby-merge correct at any block layout);
  * error bounds — the estimator guarantees the checks threshold on
    (HLL relative error, Misra–Gries undercount, t-digest rank error,
    Bloom no-false-negatives).

Pure library-level tests: no Ray session needed.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from metrics_ray.sketches import (
    HLL,
    BloomFilter,
    BottomKSample,
    FixedHistogram,
    HeavyHitters,
    TDigest,
    hash64,
    merge_blobs,
)

# keep runtime bounded: these run inside the full suite on every commit
_SETTINGS = dict(max_examples=30, deadline=None)

keys_st = st.lists(st.text(min_size=0, max_size=12), min_size=0, max_size=300)
floats_st = st.lists(
    st.floats(min_value=-1e6, max_value=1e6,
              allow_nan=False, allow_infinity=False),
    min_size=1, max_size=400)


def _splits(data, cut_fracs):
    """Partition ``data`` at the given fractional cut points."""
    cuts = sorted({int(f * len(data)) for f in cut_fracs})
    parts, prev = [], 0
    for c in cuts + [len(data)]:
        parts.append(data[prev:c])
        prev = c
    return parts


def _obj(vals):
    return np.array(vals, dtype=object)


# ------------------------------------------------------------------- HLL

@given(keys_st, st.lists(st.floats(0, 1), max_size=4))
@settings(**_SETTINGS)
def test_hll_partition_invariance(vals, cut_fracs):
    one = HLL()
    if vals:
        one.add_hashes(hash64(_obj(vals)))
    merged = HLL()
    for part in _splits(vals, cut_fracs):
        p = HLL()
        if part:
            p.add_hashes(hash64(_obj(part)))
        merged = merged.merge(p)
    assert np.array_equal(one.registers, merged.registers)


@given(st.integers(min_value=100, max_value=5000), st.integers(0, 2**32))
@settings(max_examples=15, deadline=None)
def test_hll_estimate_accuracy(n, offset):
    h = HLL()
    h.add_hashes(hash64(np.arange(offset, offset + n, dtype=np.int64)))
    est = h.estimate()
    assert abs(est - n) / n < 0.05, (n, est)


# --------------------------------------------------------------- bottom-k

@given(keys_st, st.lists(st.floats(0, 1), max_size=4),
       st.integers(min_value=1, max_value=64))
@settings(**_SETTINGS)
def test_bottomk_partition_invariance(vals, cut_fracs, k):
    one = BottomKSample(k=k)
    if vals:
        one.add(_obj(vals))
    merged = BottomKSample(k=k)
    for part in _splits(vals, cut_fracs):
        p = BottomKSample(k=k)
        if part:
            p.add(_obj(part))
        merged = merged.merge(p)
    assert sorted(map(str, one.sample())) == sorted(map(str, merged.sample()))
    assert merged.n <= k


@given(keys_st)
@settings(**_SETTINGS)
def test_bottomk_merge_idempotent(vals):
    a = BottomKSample(k=16)
    if vals:
        a.add(_obj(vals))
    again = a.merge(a)  # re-merging a checkpointed partial must be harmless
    assert sorted(map(str, a.sample())) == sorted(map(str, again.sample()))


# -------------------------------------------------------------- histogram

@given(floats_st, st.lists(st.floats(0, 1), max_size=4))
@settings(**_SETTINGS)
def test_histogram_partition_invariance(vals, cut_fracs):
    edges = np.array([-1e5, -100.0, 0.0, 100.0, 1e5])
    one = FixedHistogram(edges)
    one.add(np.array(vals))
    merged = FixedHistogram(edges)
    for part in _splits(vals, cut_fracs):
        p = FixedHistogram(edges)
        p.add(np.array(part))
        merged = merged.merge(p)
    assert np.array_equal(one.counts, merged.counts)
    assert abs(one.psi(merged)) < 1e-12
    assert one.ks(merged) == 0.0


# ---------------------------------------------------------------- t-digest

@given(floats_st, st.floats(min_value=0.05, max_value=0.95))
@settings(**_SETTINGS)
def test_tdigest_rank_error(vals, q):
    td = TDigest()
    td.add(np.array(vals))
    est = td.quantile(q)
    v = np.sort(np.asarray(vals, dtype=np.float64))
    # rank guarantee: the estimate lies within the value band of q±7.5%
    # (delta=100 gives ~1-2% typical; the band covers interpolation slack
    # on tiny inputs too)
    lo = v[max(0, int(np.floor((q - 0.075) * (len(v) - 1))))]
    hi = v[min(len(v) - 1, int(np.ceil((q + 0.075) * (len(v) - 1))))]
    assert lo - 1e-9 <= est <= hi + 1e-9, (q, est, lo, hi)


@given(floats_st, st.lists(st.floats(0, 1), max_size=4))
@settings(max_examples=15, deadline=None)
def test_tdigest_merge_close_to_single_pass(vals, cut_fracs):
    one = TDigest()
    one.add(np.array(vals))
    merged = TDigest()
    for part in _splits(vals, cut_fracs):
        p = TDigest()
        p.add(np.array(part))
        merged = merged.merge(p)
    assert merged.n == one.n
    v = np.sort(np.asarray(vals, dtype=np.float64))
    spread = max(float(v[-1] - v[0]), 1e-9)
    for q in (0.25, 0.5, 0.75):
        # both are valid digests of the same data: their estimates agree
        # to a small fraction of the data spread
        assert abs(one.quantile(q) - merged.quantile(q)) <= 0.2 * spread

# ------------------------------------------------------------------ bloom

@given(keys_st, keys_st, st.lists(st.floats(0, 1), max_size=3))
@settings(**_SETTINGS)
def test_bloom_no_false_negatives_any_partitioning(added, probed, cut_fracs):
    merged = BloomFilter(m_bits=1 << 12, k=5)
    for part in _splits(added, cut_fracs):
        p = BloomFilter(m_bits=1 << 12, k=5)
        if part:
            p.add(_obj(part))
        merged = merged.merge(p)
    if added:
        assert merged.contains(_obj(added)).all()  # never a false negative
    if probed:
        hits = merged.contains(_obj(probed))
        misses = [p for p, hit in zip(probed, hits) if not hit]
        assert not (set(misses) & set(added))


# ----------------------------------------------------------- heavy hitters

@given(st.lists(st.sampled_from("abcdefghij"), min_size=1, max_size=500),
       st.integers(min_value=2, max_value=8),
       st.lists(st.floats(0, 1), max_size=3))
@settings(**_SETTINGS)
def test_heavy_hitters_bounds_any_partitioning(stream, k, cut_fracs):
    import collections

    true = collections.Counter(stream)
    merged = HeavyHitters(k=k)
    for part in _splits(stream, cut_fracs):
        if not part:
            continue
        items, counts = np.unique(np.array(part, dtype=object), return_counts=True)
        p = HeavyHitters(k=k)
        p.offer(items, counts.astype(np.int64))
        merged = merged.merge(p)
    items, ests = merged.estimates()
    for item, est in zip(items, ests):
        t = true[str(item)]
        assert est <= t <= est + merged.err, (item, est, t, merged.err)
    # any item more frequent than the undercount bound must be present
    present = set(map(str, items))
    for item, t in true.items():
        if t > merged.err:
            assert item in present, (item, t, merged.err)


# -------------------------------------------------------------- merge_blobs

@given(keys_st, st.lists(st.floats(0, 1), min_size=1, max_size=4))
@settings(max_examples=15, deadline=None)
def test_merge_blobs_equals_pairwise_fold(vals, cut_fracs):
    parts = []
    for part in _splits(vals, cut_fracs):
        h = HLL()
        if part:
            h.add_hashes(hash64(_obj(part)))
        parts.append(h)
    blobs = [p.dumps() for p in parts]
    nway = merge_blobs(blobs)
    fold = parts[0]
    for p in parts[1:]:
        fold = fold.merge(p)
    assert np.array_equal(nway.registers, fold.registers)


# ------------------------------------------------- DuckDB rounding parity

@given(st.lists(st.floats(min_value=-1e9, max_value=1e9,
                          allow_nan=False, allow_infinity=False),
                min_size=1, max_size=50),
       st.integers(min_value=0, max_value=9))
@settings(max_examples=40, deadline=None)
def test_round_half_away_matches_duckdb(vals, nd):
    """The oracle-parity foundation: every float column the driver
    hash-compares goes through round_half_away on the engine side and
    round() on the DuckDB side — they must agree bit-for-bit for
    arbitrary doubles and digit counts."""
    import duckdb

    from metrics_ray.functions.rounding import round_half_away

    got = [round_half_away(v, nd) for v in vals]
    con = duckdb.connect()
    want = [r[0] for r in con.execute(
        f"SELECT round(x, {nd}) FROM (SELECT UNNEST(?::DOUBLE[]) AS x)",
        [vals]).fetchall()]
    con.close()
    assert got == want, (nd, [(v, g, w) for v, g, w in zip(vals, got, want)
                              if g != w][:3])


# ------------------------------------------------- DuckDB md5 hash parity

@given(st.lists(st.one_of(
    st.text(min_size=0, max_size=40),
    st.integers(min_value=-2**62, max_value=2**62)),
    min_size=1, max_size=30))
@settings(max_examples=40, deadline=None)
def test_md5_lower64_matches_duckdb(vals):
    """The sampling/simhash oracle foundation: md5_lower64(v) must equal
    DuckDB md5_number_lower(CAST(v AS VARCHAR)) for arbitrary strings and
    integers — every hash-sampled query's oracle relies on this being
    bit-for-bit, not just statistically uniform."""
    import duckdb

    from metrics_ray.sketches import md5_lower64

    got = [int(x) for x in md5_lower64(vals)]
    strs = [str(v) for v in vals]
    con = duckdb.connect()
    want = [int(r[0]) for r in con.execute(
        "SELECT md5_number_lower(x) FROM (SELECT UNNEST(?::VARCHAR[]) AS x)",
        [strs]).fetchall()]
    con.close()
    assert got == want


@given(st.lists(st.floats(min_value=0.0, max_value=0.5, allow_nan=False),
                min_size=3, max_size=3),
       st.lists(st.floats(min_value=-1.0, max_value=1.0),
                min_size=3, max_size=3))
@settings(max_examples=200, deadline=None)
def test_staggered_grids_guarantee_shared_band(centers, jitter_fracs):
    """The acoustic near-dup banding contract, full 3-component form:
    with band keys enumerating every per-component grid combination
    (_AC_GRIDS), two fingerprints whose components each differ by less
    than step/4 ALWAYS share at least one band key — even when each
    component needs a different grid (the failure mode of banding on a
    single shared grid offset)."""
    import numpy as np

    from metrics_ray.pipelines.queries import _AC_GRIDS, _AC_STEP as s

    a = np.array(centers)
    b = a + np.array(jitter_fracs) * (s / 4.0) * 0.999  # |Δ| < s/4 each
    keys_a = {tuple(int(np.floor(c / s + g))
                    for c, g in zip(a, grids)) + (gi,)
              for gi, grids in enumerate(_AC_GRIDS)}
    keys_b = {tuple(int(np.floor(c / s + g))
                    for c, g in zip(b, grids)) + (gi,)
              for gi, grids in enumerate(_AC_GRIDS)}
    assert keys_a & keys_b, (a, b)


# ------------------------------------------------- exchange hash invariance

@given(st.lists(st.one_of(st.text(max_size=30), st.none()),
                min_size=1, max_size=60),
       st.integers(min_value=1, max_value=5))
@settings(max_examples=40, deadline=None)
def test_hash_column_chunk_layout_invariant(vals, n_chunks):
    """hash_column (the keyed-exchange tag hash) must be a pure function
    of the VALUES — identical across chunk layouts, slices, and plain
    Arrow arrays — or identical keys could land in different buckets and
    silently break every co-group. Also pins the polars path against the
    fallback contract: nulls hash consistently."""
    import numpy as np
    import pyarrow as pa

    from metrics_ray.sketches import hash_column

    whole = pa.chunked_array([pa.array(vals, pa.string())])
    # split into n chunks at arbitrary (deterministic) boundaries
    edges = sorted({(i * len(vals)) // n_chunks for i in range(1, n_chunks)})
    parts, prev = [], 0
    for e in edges + [len(vals)]:
        parts.append(pa.array(vals[prev:e], pa.string()))
        prev = e
    chunked = pa.chunked_array([p for p in parts if len(p)])
    h1 = hash_column(whole)
    h2 = hash_column(chunked)
    h3 = hash_column(pa.array(vals, pa.string()))
    assert np.array_equal(h1, h2)
    assert np.array_equal(h1, h3)
    # equal values hash equal; a sliced view hashes like a copy
    tbl = pa.table({"k": pa.array(vals, pa.string())})
    sl = tbl.slice(len(vals) // 2)
    h4 = hash_column(sl.column("k"))
    assert np.array_equal(h4, h1[len(vals) // 2:])


@given(st.lists(st.tuples(st.integers(0, 10**6),
                          st.integers(-100, 400_000)),
                min_size=0, max_size=200))
@settings(**_SETTINGS)
def test_shard_assign_covers_each_positive_row_once(rows):
    """WebDataset shard assignment (sinks/webdataset.py): every
    positive-duration clip lands in exactly one shard; shard indices are
    non-decreasing along clip_id order starting at 0; a shard's duration
    never exceeds the budget plus one clip (the prefix-cut guarantee)."""
    import pandas as pd

    from metrics_ray.sinks.webdataset import SHARD_MS, shard_assign

    keys = pd.DataFrame({
        "clip_id": [f"c{k:07d}" for k, _ in rows],
        "dur_ms": [d for _, d in rows],
    }).drop_duplicates("clip_id")
    out = shard_assign(keys)
    positive = keys[keys["dur_ms"] > 0]
    assert len(out) == len(positive)
    assert set(out["clip_id"]) == set(positive["clip_id"])
    if len(out):
        s = out["shard_idx"].to_numpy()
        assert s[0] == 0
        assert (np.diff(s) >= 0).all()
        g = out.groupby("shard_idx")["dur_ms"]
        assert (g.sum() <= SHARD_MS + g.last()).all()


@given(st.integers(1, 48_000), st.integers(1, 3_000))
@settings(**_SETTINGS)
def test_timemask_geometry_bounds(sr, dur_ms):
    """TimeMask placement (stages/audio_ops.py): for any (sr, dur) the
    mask is a valid in-bounds span of the clamped length — the exact
    integers the SQL oracle recomputes."""
    from metrics_ray import audio
    from metrics_ray.sketches import md5_lower64
    from metrics_ray.stages.audio_ops import MASK_PCT

    n = audio.n_samples_for(sr, dur_ms)
    if n <= 0:
        return
    mlen = min(max(1, n * MASK_PCT // 100), n)
    start = int(md5_lower64(["x#mask"])[0] % np.uint64(n - mlen + 1))
    assert 1 <= mlen <= n
    assert 0 <= start <= n - mlen


@given(st.lists(st.text(
    alphabet=st.characters(min_codepoint=1, max_codepoint=0x2FFF),
    max_size=40), max_size=8))
@settings(max_examples=200, deadline=None)
def test_ws_tokens_matches_arrow_re2_split(texts):
    """functions.text.ws_tokens must agree with Arrow's RE2 \\s+ split
    (the tokenizer every SQL mirror assumes) on ARBITRARY unicode —
    including the non-ASCII whitespace str.split() would break on."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from metrics_ray.functions import text as T

    arr = pa.array(texts, pa.string())
    re2 = [[t for t in lst if t]
           for lst in pc.split_pattern_regex(arr, r"\s+").to_pylist()]
    assert [T.ws_tokens(s) for s in texts] == re2
