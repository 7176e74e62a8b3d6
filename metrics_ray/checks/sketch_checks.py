"""Sketch-backed estimated checks (the reference's ``isEstimate`` family —
EstimatedExtensionalConciseness's bloom-filter dedup, the 1M-slot reservoir
metrics, SURVEY.md §2.6) re-expressed as mergeable per-batch partials.

Each batch emits one serialized sketch; partials merge associatively in the
driver reduce — no ordered-stream assumption (the reference's one
order-dependent operator, EstimatedExtensionalConciseness.java:96-120, is
deliberately re-expressed order-free, SURVEY.md §7.4)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..schema import Codes
from ..sketches import (
    HLL,
    BottomKSample,
    FixedHistogram,
    TDigest,
    hash64,
    loads_any,
    merge_blobs,
)
from .base import BatchCheck, BatchOutcome, CheckContext, per_partition_counts


class DistinctHLLCheck(BatchCheck):
    """Approximate key-uniqueness (ValidIFPUsage.java:42-148 semantics — a
    key must map to exactly one entity — with the estimate flavor of the
    RLBS bloom filter, EstimatedExtensionalConciseness.java:40-45).

    metric = estimated_distinct / rows  (1.0 ⇒ no duplication)."""

    is_estimate = True

    def __init__(self, check_id: str, column: str, tolerance: float = 0.02):
        self.check_id = check_id
        self.column = column
        self.tolerance = tolerance
        self.columns = (column, "partition")

    def evaluate(self, batch: pa.Table) -> BatchOutcome:
        vals = batch.column(self.column).to_numpy(zero_copy_only=False)
        hashes = hash64(vals)
        part = batch.column("partition").to_numpy(zero_copy_only=False)
        partials: dict[int, bytes] = {}
        for p in np.unique(part):
            h = HLL()
            h.add_hashes(hashes[part == p])
            partials[int(p)] = h.dumps()
        return BatchOutcome(
            counters=per_partition_counts(part, np.zeros(len(batch), bool)),
            partials=partials,
        )

    def merge(self, partials):
        if not partials:
            return None
        return merge_blobs(partials).dumps()

    def finalize_value(self, scanned, violating, merged):
        if scanned == 0 or merged is None:
            return 1.0, True, ""
        est = loads_any(merged).estimate()
        ratio = min(est / scanned, 1.0)
        return ratio, ratio >= 1.0 - self.tolerance, f"est_distinct={est:.0f}"


class QuantileProfileCheck(BatchCheck):
    """t-digest column profile (the observation-activity analog: estimation
    parameters reported per run, EstimatedExtensionalConciseness.java:183-207).
    metric = p50; detail carries p01/p25/p50/p75/p99. Always passes —
    profiles inform, thresholds belong to DriftCheck."""

    is_estimate = True

    def __init__(self, check_id: str, column: str):
        self.check_id = check_id
        self.column = column
        self.columns = (column, "partition")

    def evaluate(self, batch: pa.Table) -> BatchOutcome:
        vals = batch.column(self.column).to_numpy(zero_copy_only=False).astype(np.float64)
        part = batch.column("partition").to_numpy(zero_copy_only=False)
        partials: dict[int, bytes] = {}
        for p in np.unique(part):
            td = TDigest()
            td.add(vals[part == p])
            partials[int(p)] = td.dumps()
        return BatchOutcome(
            counters=per_partition_counts(part, np.zeros(len(batch), bool)),
            partials=partials,
        )

    def merge(self, partials):
        if not partials:
            return None
        return merge_blobs(partials).dumps()

    def finalize_value(self, scanned, violating, merged):
        if merged is None:
            return float("nan"), True, ""
        td = loads_any(merged)
        qs = {q: td.quantile(q) for q in (0.01, 0.25, 0.5, 0.75, 0.99)}
        detail = " ".join(f"p{int(q*100):02d}={v:.1f}" for q, v in qs.items())
        return qs[0.5], True, detail


class ReservoirQuantileCheck(BatchCheck):
    """Reservoir-sample estimate over a numeric column — the reference's
    1M-slot reservoir metrics
    (EstimateSimpleEntitiesAsMembersOfDisjointClasses.java:55,
    ReservoirSampler.java) re-expressed on the mergeable bottom-k sketch
    (sketches.BottomKSample): each batch contributes a deterministic
    hash-priority sample keyed on clip_id; partials merge associatively
    (identical to one single-stream reservoir pass).

    metric = sample median of ``column``; detail carries the sample size
    and p25/p75. Always passes — like QuantileProfileCheck it informs,
    but through the reference's SAMPLE-the-rows machinery rather than a
    streaming digest (the two estimates cross-check each other)."""

    is_estimate = True

    def __init__(self, check_id: str, column: str, k: int = 1024,
                 key_column: str = "clip_id"):
        self.check_id = check_id
        self.column = column
        self.k = k
        self.key_column = key_column
        self.columns = (column, key_column, "partition")

    def evaluate(self, batch: pa.Table) -> BatchOutcome:
        vals = batch.column(self.column).to_numpy(
            zero_copy_only=False).astype(np.float64)
        keys = np.array(batch.column(self.key_column).to_pylist(),
                        dtype=object)
        part = batch.column("partition").to_numpy(zero_copy_only=False)
        partials: dict[int, bytes] = {}
        for p in np.unique(part):
            sel = part == p
            bk = BottomKSample(self.k)
            bk.add(keys[sel], vals[sel])
            partials[int(p)] = bk.dumps()
        return BatchOutcome(
            counters=per_partition_counts(part, np.zeros(len(batch), bool)),
            partials=partials,
        )

    def merge(self, partials):
        if not partials:
            return None
        return merge_blobs(partials).dumps()

    def finalize_value(self, scanned, violating, merged):
        if merged is None:
            return float("nan"), True, ""
        bk = loads_any(merged)
        if bk.n == 0:
            return float("nan"), True, "empty sample"
        vals = np.sort(bk.sample().astype(np.float64))
        p25, p50, p75 = (float(np.quantile(vals, q))
                         for q in (0.25, 0.5, 0.75))
        return p50, True, f"n={bk.n} p25={p25:.1f} p75={p75:.1f}"


class DriftCheck(BatchCheck):
    """Distribution drift vs a baseline profile (the engine's KS/PSI analog
    of the Estimated* family's baseline-vs-observed comparisons; baseline
    loaded once per actor like ComplexQualityMetric.before()).

    metric = PSI; fails when PSI > threshold."""

    is_estimate = True
    # PSI against the GLOBAL baseline is ill-posed for one partition's small
    # sample (bin noise alone can exceed the threshold): global row only
    per_partition_sketch = False

    def __init__(self, check_id: str, column: str, psi_threshold: float = 0.2):
        from ..schema import declared_histogram_edges

        self.check_id = check_id
        self.column = column
        self.psi_threshold = psi_threshold
        self.columns = (column, "partition")
        # edges come from the DECLARED domain (schema.py), so the per-batch
        # observed histogram needs no side input — the baseline profile
        # (counts) is consumed only at driver-side finalize. This lets the
        # suite overlap the baseline-profile pass with the main pass
        # instead of building it up front (clips.py validate_with_factory).
        self._edges: np.ndarray = np.asarray(
            declared_histogram_edges(column), dtype=np.float64)
        self._baseline_counts: np.ndarray | None = None

    def setup(self, ctx: CheckContext) -> None:
        prof = ctx.baseline_profile
        prof = prof.get(self.column) if isinstance(prof, dict) else None
        if prof is not None:
            self._edges = np.asarray(prof["edges"], dtype=np.float64)
            self._baseline_counts = np.asarray(prof["counts"], dtype=np.int64)

    def evaluate(self, batch: pa.Table) -> BatchOutcome:
        part = batch.column("partition").to_numpy(zero_copy_only=False)
        counters = per_partition_counts(part, np.zeros(len(batch), bool))
        if self._edges is None:
            return BatchOutcome(counters=counters)
        vals = batch.column(self.column).to_numpy(zero_copy_only=False).astype(np.float64)
        partials: dict[int, bytes] = {}
        for p in np.unique(part):
            h = FixedHistogram(self._edges)
            h.add(vals[part == p])
            partials[int(p)] = h.dumps()
        return BatchOutcome(counters=counters, partials=partials)

    def merge(self, partials):
        if not partials:
            return None
        return merge_blobs(partials).dumps()

    def finalize_value(self, scanned, violating, merged):
        if merged is None or self._baseline_counts is None:
            return 0.0, True, "no baseline profile"
        h = loads_any(merged)
        ref = FixedHistogram(self._edges, self._baseline_counts)
        psi = h.psi(ref)
        ks = h.ks(ref)
        return psi, psi <= self.psi_threshold, f"psi={psi:.4f} ks={ks:.4f}"
