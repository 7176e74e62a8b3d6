"""The Check protocol — Luzzu's QualityMetric lifecycle re-expressed for
batch execution (SURVEY.md §2.9, §7.1).

Reference lifecycle (``commons/AbstractQualityMetric.java:12``,
``AbstractComplexQualityMetric.java:12-26``):
    before(args) → compute(quad) per record → metricValue() → problem
    collection + observation activity.

New lifecycle (mergeable because many executors run concurrently — the one
thing the single-instance reference never needed):
    setup() once per actor → evaluate(batch) → (violations, counters,
    sketch partial) per batch → merge(partials) → finalize() → metric rows
    (value + pass/fail) per partition and global.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pyarrow as pa

VIOLATION_COLS = ("partition", "clip_id", "code", "actual", "expected", "detail")


@dataclass
class CheckContext:
    """Broadcast, read-only side inputs (the VocabularyLoader analog):
    constraint constants, baseline profiles, small reference indexes."""

    baseline_profile: dict[str, Any] = field(default_factory=dict)
    params: dict[str, Any] = field(default_factory=dict)
    # the reference's global problem-report switch (ShortURIs.java:49):
    # computation and counters still happen, only violation ROWS are
    # suppressed — for runs where the metric values are all that's needed
    require_problem_report: bool = True


@dataclass
class BatchOutcome:
    """Result of evaluating one check over one Arrow batch."""

    # violation rows (columns = VIOLATION_COLS), or None
    violations: pa.Table | None = None
    # per-partition counters: partition -> (rows_scanned, rows_violating)
    counters: dict[int, tuple[int, int]] = field(default_factory=dict)
    # serialized mergeable sketch partial for this batch, or None
    # (attributed to the batch's first partition — only exact when the
    # input layout is partition-pure; prefer ``partials``)
    partial: bytes | None = None
    # per-partition sketch partials: partition -> blob (correct attribution
    # regardless of layout; enables per-partition sketch metrics + resume)
    partials: dict[int, bytes] | None = None
    # per-row key stream for fused keyed checks: (partition, clip_id, key)
    # rows emitted while the payload is already in memory — shuffled
    # distributedly by the runner, NEVER collected to the driver
    keys: pa.Table | None = None


def violations_table(partition: np.ndarray, clip_id: np.ndarray | list,
                     code: str, actual: list | np.ndarray,
                     expected: str, detail: str = "") -> pa.Table:
    n = len(clip_id)
    return pa.table(
        {
            "partition": pa.array(np.asarray(partition, dtype=np.int32)),
            "clip_id": pa.array(list(clip_id), pa.string()),
            "code": pa.array([code] * n, pa.string()),
            "actual": pa.array([str(a) for a in actual], pa.string()),
            "expected": pa.array([expected] * n, pa.string()),
            "detail": pa.array([detail] * n, pa.string()),
        }
    )


def per_partition_counts(partition: np.ndarray,
                         viol_mask: np.ndarray) -> dict[int, tuple[int, int]]:
    """Vectorized (scanned, violating) tally per partition value."""
    part = np.asarray(partition, dtype=np.int64)
    uniq, inv = np.unique(part, return_inverse=True)
    scanned = np.bincount(inv, minlength=len(uniq))
    violating = np.bincount(inv, weights=viol_mask.astype(np.float64),
                            minlength=len(uniq)).astype(np.int64)
    return {int(u): (int(s), int(v)) for u, s, v in zip(uniq, scanned, violating)}


class BatchCheck:
    """Base class for row-local checks executed inside the single shared
    map_batches pass. Subclasses override ``evaluate``; sketch-bearing
    subclasses also override ``merge``/``finalize_value``."""

    check_id: str = "base"
    is_estimate: bool = False
    #: columns this check reads (union drives read-time projection pruning)
    columns: tuple[str, ...] = ()

    def setup(self, ctx: CheckContext) -> None:  # noqa: B027
        """Once per actor — compile regexes, load profiles (Luzzu before())."""

    def evaluate(self, batch: pa.Table) -> BatchOutcome:
        raise NotImplementedError

    # ---- sketch path (checks with partial-state payloads) ----
    def merge(self, partials: list[bytes]) -> bytes | None:
        return None

    def finalize_value(self, scanned: int, violating: int,
                       merged: bytes | None) -> tuple[float, bool, str]:
        """→ (metric_value, passed, detail). Default: Luzzu ratio semantics
        value = 1 − violating/scanned with the NaN→1.0 rule
        (CompatibleDatatype.java:83-92) and pass iff no violations."""
        if scanned == 0:
            return 1.0, True, ""
        v = 1.0 - violating / scanned
        return v, violating == 0, ""
