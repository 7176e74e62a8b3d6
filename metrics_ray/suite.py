"""CheckSuite assembly — the declarative config that plays the role of the
reference's metric registry + VocabularyLoader config (SURVEY.md §2.9: a
suite is assembled from config, not hard-coded into the engine).
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa

from .checks.base import BatchCheck, CheckContext
from .checks.decode import DecodeCheck, PayloadSizeCheck
from .checks.keyed import content_duplicates, exact_duplicate_keys
from .checks.referential import ReferentialCheck
from .checks.sketch_checks import (
    DistinctHLLCheck,
    DriftCheck,
    QuantileProfileCheck,
    ReservoirQuantileCheck,
)
from .checks.stateless import (
    CrossColumnCheck,
    CtcFeasibilityCheck,
    EnumCheck,
    NonNullCheck,
    OwnershipCheck,
    SpeakingRateCheck,
    RangeCheck,
    RegexCheck,
    SchemaCheck,
)
from .schema import (
    CLIP_ID_RE,
    CLIP_SCHEMA,
    DEPRECATED_CODECS,
    MAX_DUR_MS,
    MIN_DUR_MS,
    VALID_CODECS,
    VALID_SR_HZ,
    Codes,
)


# value-kind coherence rules (MisusedOwlDatatypeOrObjectProperties /
# MisplacedClassesOrProperties analog): a declaration and its paired value
# must agree in kind — violation when WHEN holds and REQUIRE fails
CROSS_RULES = [
    ("dur_requires_sr", ("dur_ms", ">", 0), ("sr_hz", ">", 0)),
    ("no_codec_no_transcript", ("codec", "==", ""),
     ("transcript", "null_or_empty", None)),
]


def metadata_checks() -> list[BatchCheck]:
    """The stateless MB family (SURVEY.md §2.3 mappings)."""
    return [
        SchemaCheck("schema_conformance", CLIP_SCHEMA),
        EnumCheck("sr_enum", "sr_hz", VALID_SR_HZ, code=Codes.OUT_OF_RANGE),
        RangeCheck("dur_range", "dur_ms", MIN_DUR_MS, MAX_DUR_MS),
        EnumCheck("codec_enum", "codec", VALID_CODECS),
        EnumCheck("codec_deprecated", "codec", DEPRECATED_CODECS,
                  code=Codes.DEPRECATED_VALUE, invert=True),
        NonNullCheck("transcript_nonnull", "transcript"),
        RegexCheck("clipid_format", "clip_id", CLIP_ID_RE),
        OwnershipCheck("partition_ownership"),
        CrossColumnCheck("cross_kind", CROSS_RULES),
        SpeakingRateCheck("speaking_rate"),
        CtcFeasibilityCheck("ctc_feasible"),
    ]


def sketch_checks() -> list[BatchCheck]:
    return [
        DistinctHLLCheck("clipid_unique_hll", "clip_id"),
        QuantileProfileCheck("dur_profile", "dur_ms"),
        # the north star names BOTH dur_ms and sr_hz t-digest profiles
        QuantileProfileCheck("sr_profile", "sr_hz"),
        ReservoirQuantileCheck("dur_reservoir", "dur_ms"),
        DriftCheck("dur_drift_psi", "dur_ms"),
    ]


def full_checks(with_decode: bool = True,
                with_referential: bool = True) -> list[BatchCheck]:
    checks = metadata_checks() + sketch_checks()
    if with_referential:
        checks.append(ReferentialCheck())
    if with_decode:
        # triage before decode: the size gate costs an offset read; the
        # decode check pays per-sample work on the same payload columns
        checks.append(PayloadSizeCheck())
        checks.append(DecodeCheck())
    return checks


def keyed_checks(with_content_dedup: bool = True) -> dict:
    """check_id → fn(ds_factory) -> violations Dataset."""
    out = {
        "clipid_unique_exact": lambda f: exact_duplicate_keys(
            f(["clip_id", "partition"])),
    }
    if with_content_dedup:
        out["content_dedup"] = lambda f: content_duplicates(
            f(["bytes", "transcript", "clip_id", "partition"]))
    return out


def _hist_partial_task(column: str, edges: tuple, *blocks) -> bytes:
    """One histogram partial over a group of materialized blocks (the
    baseline profile's task-wave path)."""
    from .sketches import FixedHistogram

    h = FixedHistogram(np.asarray(edges, dtype=np.float64))
    for b in blocks:
        h.add(b.column(column).to_numpy(
            zero_copy_only=False).astype(np.float64))
    return h.dumps()


def build_baseline_profile(ds_factory, column: str = "dur_ms",
                           n_bins: int = 30,
                           domain: tuple[float, float] | None = None) -> dict[str, Any]:
    """Build the baseline distribution profile from a (clean) reference
    table — the ComplexQualityMetric.before() gold-standard load, computed
    distributedly in ONE pruned-column pass.

    Histogram edges come from the column's DECLARED domain (the schema's
    range constraint), not a data-dependent quantile pass: the profile of a
    clean run and the observed histogram of a later run are then always on
    identical edges, mergeable and comparable across runs — and the build
    costs one pass instead of two."""
    import ray.data  # noqa: F401
    from .schema import declared_histogram_edges
    from .sketches import FixedHistogram, loads_any, merge_blobs

    if domain is None:
        edges = declared_histogram_edges(column, n_bins)
    else:
        # log-spaced edges: duration/rate-style columns span orders of
        # magnitude; linear bins would lump realistic values into one bin
        # and blind the PSI comparison
        edges = (np.geomspace(domain[0], domain[1], n_bins + 1)
                 if domain[0] > 0 else np.linspace(domain[0], domain[1],
                                                   n_bins + 1))
    refs = getattr(ds_factory, "block_refs", None)
    if refs:
        # staged input: ONE task wave over the existing block refs — the
        # in-task Arrow column read is zero-copy, vs a select_columns
        # projection job that rewrites every payload-bearing block just
        # to histogram one numeric column
        import math

        import ray

        task = ray.remote(_hist_partial_task)
        G = max(1, math.ceil(len(refs) / 8))
        futs = [task.remote(column, tuple(edges.tolist()), *refs[i::G])
                for i in range(G) if refs[i::G]]
        blobs = ray.get(futs)
    else:
        ds = ds_factory([column, "partition"])

        def hist_partial(b: pa.Table) -> pa.Table:
            h = FixedHistogram(edges)
            h.add(b.column(column).to_numpy(
                zero_copy_only=False).astype(np.float64))
            return pa.table({"payload": pa.array([h.dumps()], pa.binary())})

        blobs = [r["payload"] for r in
                 ds.map_batches(hist_partial,
                                batch_format="pyarrow").take_all()]
    h = merge_blobs(blobs)
    if h is None:
        # merge_blobs([]) is None — surface the real cause (empty baseline
        # input) instead of an AttributeError in a background thread
        raise ValueError(
            f"cannot build a baseline profile for {column!r}: the baseline "
            "dataset produced no batches (empty table or wrong path)")
    return {column: {"edges": edges.tolist(), "counts": h.counts.tolist()}}


def default_ctx(transcript_index=None, baseline_profile=None,
                broadcast: bool = True) -> CheckContext:
    """Assemble the broadcast side-input context. With ``broadcast`` the
    index goes through ray.put once (read by every actor's setup) instead of
    being re-serialized into each actor constructor."""
    params: dict[str, Any] = {}
    if transcript_index is not None:
        if broadcast:
            import ray

            params["transcript_index"] = ray.put(transcript_index)
        else:
            params["transcript_index"] = transcript_index
    return CheckContext(baseline_profile=baseline_profile or {}, params=params)
