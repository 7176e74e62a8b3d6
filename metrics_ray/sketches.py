"""Mergeable, deterministic sketches: HyperLogLog, t-digest, fixed-bin histogram.

The reference bounds state with an RLBS Bloom filter bank (k=13, M=5.5e6
bits, fp 0.01 — ``EstimatedExtensionalConciseness.java:40-45,79``) and 1M-slot
reservoirs (``EstimateSimpleEntitiesAsMembersOfDisjointClasses.java:55``),
merged never (single JVM instance). Here every sketch is associative +
commutative so per-batch partials can be merged through
``groupby().aggregate`` and a driver-side reduce, and deterministic so golden
tests stay exact (SURVEY.md §7.4 "Mergeable-state correctness").

Value hashing uses ``pandas.util.hash_array`` (vectorized 64-bit, fixed key,
stable across processes).
"""

from __future__ import annotations

import pickle
from dataclasses import dataclass, field

import numpy as np
import pandas as pd


def hash64(values: np.ndarray) -> np.ndarray:
    """Vectorized stable 64-bit hash of a numpy array. Object arrays of
    str / bytes / None hash directly (pandas siphash with a fixed key)."""
    return pd.util.hash_array(np.asarray(values), categorize=False)


def hash_column(col) -> np.ndarray:
    """64-bit hash of an Arrow column (Array or ChunkedArray) WITHOUT
    materializing Python objects — the hot path of every keyed exchange
    (grouped_apply / bucketed joins tag each row with hash(key) % B).

    Uses polars' vectorized hash zero-copy from Arrow (~30x faster than
    to_pylist + per-object siphash). Deterministic for a fixed seed within
    one polars version, which is all an intra-run exchange needs: identical
    keys MUST co-locate (same hash everywhere in the run); the bucket ids
    themselves never appear in results. Oracle-visible hashes (sampling
    decisions) use md5_lower64 instead and are unaffected. Falls back to
    the object-array siphash when polars is unavailable."""
    import pyarrow as pa

    try:
        import polars as pl

        s = pl.from_arrow(col)
        if isinstance(s, pl.DataFrame):  # single-column table edge
            s = s.to_series()
        return s.hash(seed=0).to_numpy().astype(np.uint64, copy=False)
    except ImportError:
        vals = col.to_pylist() if isinstance(
            col, (pa.Array, pa.ChunkedArray)) else col
        return hash64(np.array(vals, dtype=object)).astype(np.uint64)


def md5_lower64(values) -> np.ndarray:
    """Per-value uint64 hash equal to DuckDB ``md5_number_lower(CAST(v AS
    VARCHAR))``: the little-endian lower half of md5 over the value's
    string form. An oracle-mirrorable hash — operators built on it
    (sampling decisions, simhash signatures) can be verified bit-for-bit
    in SQL, not just statistically. ~1 µs/value (a hashlib call per
    row); prefer the vectorized siphash (``hash64``) where no SQL mirror
    is needed."""
    import hashlib

    out = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        d = hashlib.md5(str(v).encode()).digest()
        out[i] = np.uint64(int.from_bytes(d[8:16], "little"))
    return out


# ------------------------------------------------------------------- HLL

@dataclass
class HLL:
    """HyperLogLog distinct-count sketch, p=14 (16384 registers, ~0.8% err)."""

    p: int = 14
    registers: np.ndarray = field(default=None)  # type: ignore[assignment]

    def __post_init__(self):
        if self.registers is None:
            self.registers = np.zeros(1 << self.p, dtype=np.uint8)

    def add_hashes(self, h: np.ndarray) -> None:
        h = h.astype(np.uint64)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = h << np.uint64(self.p)  # remaining 64-p bits in the high part
        # rho = position of the leftmost 1-bit in `rest` (1-based), capped
        nz = rest != 0
        lz = np.full(h.shape, 64 - self.p, dtype=np.uint8)
        # leading zeros via the float64 exponent (deterministic; the rare
        # round-up-to-power-of-2 edge shifts rho by 1 with prob ~2^-53 —
        # harmless for an estimator, and identical on every worker)
        _, exp = np.frexp(rest[nz].astype(np.float64))
        lz[nz] = np.minimum(64 - exp, 64 - self.p).astype(np.uint8)
        rho = lz + 1
        np.maximum.at(self.registers, idx, rho)

    def merge(self, other: "HLL") -> "HLL":
        out = HLL(self.p, np.maximum(self.registers, other.registers))
        return out

    def estimate(self) -> float:
        m = float(1 << self.p)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        inv = np.power(2.0, -self.registers.astype(np.float64))
        e = alpha * m * m / inv.sum()
        zeros = int((self.registers == 0).sum())
        if e <= 2.5 * m and zeros:
            return m * np.log(m / zeros)  # linear counting
        return float(e)

    def dumps(self) -> bytes:
        return pickle.dumps(("hll", self.p, self.registers))

    @staticmethod
    def loads(b: bytes) -> "HLL":
        tag, p, reg = pickle.loads(b)
        assert tag == "hll"
        return HLL(p, reg)


# ---------------------------------------------------------------- t-digest

@dataclass
class TDigest:
    """Merging t-digest (Dunning): capped centroid list, scale function k1.
    Deterministic: centroids kept sorted; merge = concat + sorted compress."""

    delta: float = 100.0
    means: np.ndarray = field(default_factory=lambda: np.empty(0, np.float64))
    weights: np.ndarray = field(default_factory=lambda: np.empty(0, np.float64))

    def add(self, values: np.ndarray) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return
        # vectorized pre-clustering: reduce the batch to <=512 equal-weight
        # centroids so the O(n) python compress loop stays O(hundreds)
        if v.size > 512:
            v = np.sort(v, kind="stable")
            bounds = np.linspace(0, v.size, 513).astype(np.int64)
            sums = np.add.reduceat(v, bounds[:-1])
            cnts = np.diff(bounds).astype(np.float64)
            keep = cnts > 0
            m, w = sums[keep] / cnts[keep], cnts[keep]
        else:
            m, w = v, np.ones(v.size)
        self.means = np.concatenate([self.means, m])
        self.weights = np.concatenate([self.weights, w])
        self._compress()

    def merge(self, other: "TDigest") -> "TDigest":
        out = TDigest(self.delta,
                      np.concatenate([self.means, other.means]),
                      np.concatenate([self.weights, other.weights]))
        out._compress()
        return out

    def _compress(self) -> None:
        if self.means.size <= 1:
            return
        order = np.argsort(self.means, kind="stable")
        m, w = self.means[order], self.weights[order]
        total = w.sum()
        out_m, out_w = [], []
        cur_m, cur_w = m[0], w[0]
        w_so_far = 0.0
        for i in range(1, m.size):
            q = (w_so_far + cur_w) / total
            limit = total * self._k_size(q)
            if cur_w + w[i] <= limit:
                cur_m = (cur_m * cur_w + m[i] * w[i]) / (cur_w + w[i])
                cur_w += w[i]
            else:
                out_m.append(cur_m); out_w.append(cur_w)
                w_so_far += cur_w
                cur_m, cur_w = m[i], w[i]
        out_m.append(cur_m); out_w.append(cur_w)
        self.means = np.asarray(out_m)
        self.weights = np.asarray(out_w)

    def _k_size(self, q: float) -> float:
        # k1 scale function size bound: 4 * sqrt(q(1-q)) / delta
        return max(4.0 * np.sqrt(max(q * (1 - q), 1e-12)) / self.delta, 1e-9)

    def quantile(self, q: float) -> float:
        if self.means.size == 0:
            return float("nan")
        if self.means.size == 1:
            return float(self.means[0])
        cum = np.cumsum(self.weights) - self.weights / 2.0
        target = q * self.weights.sum()
        return float(np.interp(target, cum, self.means))

    @property
    def n(self) -> float:
        return float(self.weights.sum())

    def dumps(self) -> bytes:
        return pickle.dumps(("tdigest", self.delta, self.means, self.weights))

    @staticmethod
    def loads(b: bytes) -> "TDigest":
        tag, d, m, w = pickle.loads(b)
        assert tag == "tdigest"
        return TDigest(d, m, w)


# --------------------------------------------------------------- histogram

@dataclass
class FixedHistogram:
    """Counts over fixed bin edges (from a baseline profile) + under/overflow.
    Supports PSI and KS distance vs a reference histogram on the same edges."""

    edges: np.ndarray  # len B+1
    counts: np.ndarray = field(default=None)  # type: ignore[assignment]

    def __post_init__(self):
        if self.counts is None:
            self.counts = np.zeros(len(self.edges) + 1, dtype=np.int64)

    def add(self, values: np.ndarray) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        idx = np.searchsorted(self.edges, v, side="right")  # 0..B+1
        np.add.at(self.counts, np.clip(idx, 0, len(self.counts) - 1), 1)

    def merge(self, other: "FixedHistogram") -> "FixedHistogram":
        assert np.array_equal(self.edges, other.edges)
        return FixedHistogram(self.edges, self.counts + other.counts)

    def psi(self, reference: "FixedHistogram", eps: float = 1e-6) -> float:
        p = self.counts / max(self.counts.sum(), 1)
        q = reference.counts / max(reference.counts.sum(), 1)
        p = np.clip(p, eps, None)
        q = np.clip(q, eps, None)
        return float(np.sum((p - q) * np.log(p / q)))

    def ks(self, reference: "FixedHistogram") -> float:
        p = np.cumsum(self.counts) / max(self.counts.sum(), 1)
        q = np.cumsum(reference.counts) / max(reference.counts.sum(), 1)
        return float(np.max(np.abs(p - q)))

    def dumps(self) -> bytes:
        return pickle.dumps(("hist", self.edges, self.counts))

    @staticmethod
    def loads(b: bytes) -> "FixedHistogram":
        tag, e, c = pickle.loads(b)
        assert tag == "hist"
        return FixedHistogram(e, c)


# ------------------------------------------------------------- reservoir

@dataclass
class BottomKSample:
    """Deterministic mergeable uniform sample (bottom-k sketch) — the
    mergeable re-expression of the reference's 1M-slot reservoir
    (``ReservoirSampler.java``, used by
    ``EstimateSimpleEntitiesAsMembersOfDisjointClasses.java:55`` and the
    per-key reservoirs of ``EstimatedDereferenceabilityByTld.java:151-167``).

    A classic reservoir is order-dependent and RNG-stateful — unusable
    when thousands of workers each see a slice of the stream. Bottom-k is
    the associative equivalent: every item gets a fixed hash priority
    (seeded, no RNG at add time) and the sketch keeps the k smallest.
    Merge = concat + reselect: associative, commutative, IDEMPOTENT
    (re-merging a checkpointed partial is harmless), and the result is
    identical to a single-stream pass — exactly the property the
    checkpoint/resume path needs. For distinct item keys the selected set
    is a uniform without-replacement sample of the distinct keys."""

    k: int = 1024
    seed: int = 7
    priorities: np.ndarray = field(
        default_factory=lambda: np.empty(0, np.uint64))
    values: np.ndarray = field(
        default_factory=lambda: np.empty(0, object))

    def add(self, keys: np.ndarray, values: np.ndarray | None = None) -> None:
        """``keys`` determine the priorities (row identity, e.g. clip_id);
        ``values`` are the sampled payloads (default: the keys)."""
        keys = np.asarray(keys, dtype=object)
        if keys.size == 0:
            return
        vals = keys if values is None else np.asarray(values, dtype=object)
        pri = hash64(keys) ^ np.uint64(self.seed * 0x9E3779B97F4A7C15 % (1 << 64))
        self.priorities = np.concatenate([self.priorities, pri])
        self.values = np.concatenate([self.values, vals])
        self._select()

    def merge(self, other: "BottomKSample") -> "BottomKSample":
        out = BottomKSample(
            self.k, self.seed,
            np.concatenate([self.priorities, other.priorities]),
            np.concatenate([self.values, other.values]))
        out._select()
        return out

    def _select(self) -> None:
        # dedupe identical priorities (same key re-added / re-merged),
        # then keep the k smallest
        pri, idx = np.unique(self.priorities, return_index=True)
        vals = self.values[idx]
        if pri.size > self.k:
            pri, vals = pri[: self.k], vals[: self.k]
        self.priorities, self.values = pri, vals

    def sample(self) -> np.ndarray:
        return self.values

    @property
    def n(self) -> int:
        return int(self.priorities.size)

    def dumps(self) -> bytes:
        return pickle.dumps(
            ("bottomk", self.k, self.seed, self.priorities, self.values))

    @staticmethod
    def loads(b: bytes) -> "BottomKSample":
        tag, k, seed, pri, vals = pickle.loads(b)
        assert tag == "bottomk"
        return BottomKSample(k, seed, pri, vals)


# ------------------------------------------------------------ Bloom filter

def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) \
        & np.uint64(0xFFFFFFFFFFFFFFFF)
    x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) \
        & np.uint64(0xFFFFFFFFFFFFFFFF)
    return x ^ (x >> np.uint64(31))


@dataclass
class BloomFilter:
    """Mergeable Bloom filter — the direct analog of the reference's RLBS
    Bloom bank (EstimatedExtensionalConciseness.java:40-45: k=13,
    M=5.5e6 bits, fp≈0.01), made associative: per-partition filters OR
    together into the global filter, so membership state builds in one
    streaming pass with byte-sized partials.

    Double hashing (Kirsch–Mitzenmacher): the k probe positions are
    h1 + i·h2 mod m derived from ONE vectorized hash64 pass — no per-key
    python, no k rehashes. No false negatives ever; false-positive rate
    ≈ (1 - e^{-kn/m})^k, tested in tests/test_sketches.py."""

    m_bits: int = 1 << 20
    k: int = 7
    bits: np.ndarray = field(default_factory=lambda: np.empty(0, np.uint8))

    def __post_init__(self):
        if self.bits.size == 0:
            self.bits = np.zeros(self.m_bits // 8, np.uint8)

    def _positions(self, keys: np.ndarray) -> np.ndarray:
        h1 = hash64(np.asarray(keys, dtype=object)).astype(np.uint64)
        h2 = _splitmix64(h1) | np.uint64(1)
        i = np.arange(self.k, dtype=np.uint64)[:, None]
        return ((h1[None, :] + i * h2[None, :]) % np.uint64(self.m_bits))

    def add(self, keys: np.ndarray) -> None:
        pos = self._positions(keys).ravel()
        np.bitwise_or.at(self.bits, (pos >> np.uint64(3)).astype(np.int64),
                         np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))

    def contains(self, keys: np.ndarray) -> np.ndarray:
        """Vectorized membership: True = maybe present, False = DEFINITELY
        absent."""
        pos = self._positions(keys)
        byte = self.bits[(pos >> np.uint64(3)).astype(np.int64)]
        hit = (byte >> (pos & np.uint64(7)).astype(np.uint8)) & np.uint8(1)
        return hit.all(axis=0)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert self.m_bits == other.m_bits and self.k == other.k
        return BloomFilter(self.m_bits, self.k, self.bits | other.bits)

    def dumps(self) -> bytes:
        return pickle.dumps(("bloom", self.m_bits, self.k, self.bits))

    @staticmethod
    def loads(b: bytes) -> "BloomFilter":
        tag, m, k, bits = pickle.loads(b)
        assert tag == "bloom"
        return BloomFilter(m, k, bits)


# --------------------------------------------------------- heavy hitters

@dataclass
class HeavyHitters:
    """Misra–Gries heavy-hitters summary (the mergeable form of
    SpaceSaving; Agarwal et al., "Mergeable Summaries", PODS'12).

    Keeps at most ``k`` (item, count) counters plus a global undercount
    bound ``err``. Updates are BATCH decrements: concat the incoming
    pre-aggregated (item, weight) pairs with the resident counters,
    group-sum, and if more than ``k`` distinct items survive, subtract the
    (k+1)-th largest count from everyone and drop the non-positives —
    exactly one decrement round per batch, fully vectorized. Guarantees:
    ``true - err <= est <= true`` for every item, and any item with true
    frequency > err is guaranteed present. When the total number of
    distinct items ever offered is <= k no decrement fires and the sketch
    is EXACT (err == 0) — the property the oracle-backed
    ``doc_top_tokens_approx`` query relies on. Merge = concat counters,
    sum, one shrink round; associative up to the stated bounds and
    deterministic for a fixed offer/merge tree."""

    k: int = 4096
    items: np.ndarray = field(
        default_factory=lambda: np.empty(0, object))
    counts: np.ndarray = field(
        default_factory=lambda: np.empty(0, np.int64))
    err: int = 0

    def offer(self, items: np.ndarray, weights: np.ndarray) -> None:
        """Add pre-aggregated (item, weight>0) pairs (e.g. a batch's
        value_counts output)."""
        it = np.concatenate([self.items, np.asarray(items, dtype=object)])
        w = np.concatenate([self.counts,
                            np.asarray(weights, dtype=np.int64)])
        self.items, self.counts = self._shrink(it, w)

    def merge(self, other: "HeavyHitters") -> "HeavyHitters":
        out = HeavyHitters(self.k, err=self.err + other.err)
        out.offer(np.concatenate([self.items, other.items]),
                  np.concatenate([self.counts, other.counts]))
        return out

    def _shrink(self, items: np.ndarray, w: np.ndarray):
        uniq, inv = np.unique(items.astype(str), return_inverse=True)
        tot = np.bincount(inv, weights=w).astype(np.int64)
        if uniq.size > self.k:
            thresh = int(np.partition(tot, -(self.k + 1))[-(self.k + 1)])
            tot = tot - thresh
            self.err += thresh
            keep = tot > 0
            uniq, tot = uniq[keep], tot[keep]
        return uniq.astype(object), tot

    def estimates(self) -> tuple[np.ndarray, np.ndarray]:
        """(items, est_counts) sorted by (count desc, item asc)."""
        order = np.lexsort((self.items.astype(str), -self.counts))
        return self.items[order], self.counts[order]

    def dumps(self) -> bytes:
        return pickle.dumps(
            ("mg", self.k, self.items, self.counts, self.err))

    @staticmethod
    def loads(b: bytes) -> "HeavyHitters":
        tag, k, items, counts, err = pickle.loads(b)
        assert tag == "mg"
        return HeavyHitters(k, items, counts, err)


def loads_any(b: bytes):
    # unpickle ONCE and dispatch on the loaded tuple — the former
    # tag-peek + Class.loads(b) deserialized every blob twice, doubling
    # driver-side cost on exactly the hot path merge_blobs exists for
    t = pickle.loads(b)
    tag = t[0]
    if tag == "hll":
        return HLL(t[1], t[2])
    if tag == "tdigest":
        return TDigest(t[1], t[2], t[3])
    if tag == "hist":
        return FixedHistogram(t[1], t[2])
    if tag == "bottomk":
        return BottomKSample(t[1], t[2], t[3], t[4])
    if tag == "mg":
        return HeavyHitters(t[1], t[2], t[3], t[4])
    if tag == "bloom":
        return BloomFilter(t[1], t[2], t[3])
    raise ValueError(f"unknown sketch tag {tag!r}")


def merge_blobs(blobs: list[bytes]):
    """Merge MANY serialized sketch partials in one shot.

    The pairwise ``acc.merge(loads(b))`` loop costs one compress/reselect
    per partial — at 10k partials (batches × partitions × sketch checks)
    that is seconds of sequential driver time per suite run. All four
    sketches are associative, so an n-way merge is semantically a fold:
    HLL = one reduced max over stacked registers; histogram = one summed
    count matrix; bottom-k = one concat + select; t-digest = one concat +
    single compress (a valid merge order — the digest is order-sensitive
    only in its ±quantile-estimate noise, which estimate consumers already
    tolerance-test)."""
    if not blobs:
        return None
    sketches = [loads_any(b) for b in blobs]
    first = sketches[0]
    if len(sketches) == 1:
        return first
    if isinstance(first, HLL):
        assert all(s.p == first.p for s in sketches), "HLL p mismatch"
        regs = np.maximum.reduce([s.registers for s in sketches])
        return HLL(first.p, regs)
    if isinstance(first, FixedHistogram):
        # the invariant the pairwise merge() enforced: identical edges
        assert all(np.array_equal(s.edges, first.edges)
                   for s in sketches), "histogram edge mismatch"
        counts = np.sum([s.counts for s in sketches], axis=0)
        return FixedHistogram(first.edges, counts)
    if isinstance(first, BloomFilter):
        assert all(s.m_bits == first.m_bits and s.k == first.k
                   for s in sketches), "bloom geometry mismatch"
        bits = np.bitwise_or.reduce([s.bits for s in sketches])
        return BloomFilter(first.m_bits, first.k, bits)
    if isinstance(first, HeavyHitters):
        out = HeavyHitters(first.k, err=sum(s.err for s in sketches))
        out.offer(np.concatenate([s.items for s in sketches]),
                  np.concatenate([s.counts for s in sketches]))
        return out
    if isinstance(first, BottomKSample):
        assert all(s.k == first.k and s.seed == first.seed
                   for s in sketches), "bottom-k seed/k mismatch"
        out = BottomKSample(
            first.k, first.seed,
            np.concatenate([s.priorities for s in sketches]),
            np.concatenate([s.values for s in sketches]))
        out._select()
        return out
    if isinstance(first, TDigest):
        m = np.concatenate([s.means for s in sketches])
        w = np.concatenate([s.weights for s in sketches])
        if m.size > 2048:
            # vectorized weighted pre-clustering (the n-way extension of
            # add()'s equal-count pre-clustering): sort by mean, cut into
            # ~1024 equal-WEIGHT buckets, one weighted mean per bucket —
            # keeps the final python compress loop O(1024) instead of
            # O(total centroids across all partials)
            order = np.argsort(m, kind="stable")
            m, w = m[order], w[order]
            cw = np.cumsum(w)
            targets = np.linspace(0, cw[-1], 1025)[1:-1]
            cuts = np.unique(np.searchsorted(cw, targets, side="left"))
            bounds = np.concatenate([[0], cuts + 1, [m.size]])
            bounds = np.unique(bounds)
            wsum = np.add.reduceat(w, bounds[:-1])
            msum = np.add.reduceat(m * w, bounds[:-1])
            keep = wsum > 0
            m, w = msum[keep] / wsum[keep], wsum[keep]
        out = TDigest(first.delta, m, w)
        out._compress()
        return out
    acc = first
    for s in sketches[1:]:
        acc = acc.merge(s)
    return acc
