"""Hardening: empty batches, all-null columns, and the reference's
require-problem-report switch (ShortURIs.java:49 — metric computation
continues, violation rows are suppressed)."""

import numpy as np
import pyarrow as pa
import pytest

from metrics_ray.checks.base import CheckContext
from metrics_ray.checks.decode import DecodeCheck
from metrics_ray.checks.referential import ReferentialCheck
from metrics_ray.checks.sketch_checks import (
    DistinctHLLCheck, DriftCheck, QuantileProfileCheck)
from metrics_ray.runner import SuiteExecutor, TAGGED_SCHEMA
from metrics_ray.schema import CLIP_SCHEMA
from metrics_ray.suite import full_checks


def _batch(n, null_all=False):
    if null_all:
        return pa.table({
            "clip_id": pa.array([None] * n, pa.string()),
            "bytes": pa.array([None] * n, pa.binary()),
            "sr_hz": pa.array([None] * n, pa.int32()),
            "dur_ms": pa.array([None] * n, pa.int32()),
            "codec": pa.array([None] * n, pa.string()),
            "transcript": pa.array([None] * n, pa.string()),
            "partition": pa.array([0] * n, pa.int32()),
        })
    return CLIP_SCHEMA.empty_table()


def test_empty_batch_all_checks():
    ex = SuiteExecutor(full_checks(), CheckContext())
    out = ex(_batch(0))
    assert out.schema.equals(TAGGED_SCHEMA)
    assert out.num_rows == 0


def test_all_null_batch_all_checks():
    """Every column null: checks must flag violations, never crash."""
    ex = SuiteExecutor(full_checks(), CheckContext())
    out = ex(_batch(5, null_all=True))
    df = out.to_pandas()
    v = df[df.kind == "v"]
    # null sr/dur/codec/transcript/bytes are all violations of their checks
    for cid in ("sr_enum", "dur_range", "codec_enum", "transcript_nonnull",
                "clipid_format", "decode_invariants"):
        assert (v.check_id == cid).sum() == 5, cid


def test_require_problem_report_off():
    """Violations suppressed, counters (and thus metric values) intact."""
    ctx = CheckContext(require_problem_report=False)
    ex = SuiteExecutor(full_checks(with_decode=False,
                                   with_referential=False), ctx)
    out = ex(_batch(5, null_all=True)).to_pandas()
    assert (out.kind == "v").sum() == 0
    partial = out[out.kind == "p"]
    assert (partial[partial.check_id == "transcript_nonnull"]
            .violating.sum()) == 5


def test_sketches_on_degenerate_input():
    part = pa.table({
        "dur_ms": pa.array([None, None], pa.int32()),
        "clip_id": pa.array([None, None], pa.string()),
        "partition": pa.array([0, 1], pa.int32()),
    })
    for check in (DistinctHLLCheck("u", "clip_id"),
                  QuantileProfileCheck("q", "dur_ms"),
                  DriftCheck("d", "dur_ms")):
        check.setup(CheckContext())
        o = check.evaluate(part)
        assert set(o.counters) == {0, 1}


def test_decode_check_wrong_type_payload():
    b = pa.table({
        "clip_id": pa.array(["x"], pa.string()),
        "bytes": pa.array([b"\x00\x01\x02"], pa.binary()),  # short garbage
        "sr_hz": pa.array([8000], pa.int32()),
        "dur_ms": pa.array([100], pa.int32()),
        "codec": pa.array(["flac"], pa.string()),
        "partition": pa.array([0], pa.int32()),
    })
    c = DecodeCheck()
    c.setup(CheckContext())
    o = c.evaluate(b)
    assert o.violations.num_rows == 1
    assert o.violations.column("code").to_pylist() == ["DecodeError"]


def test_content_hash_large_types_slices_nulls():
    """content_hash_batch reads zero-copy buffer slices — large_binary/
    large_string (int64 offsets), sliced arrays, and nulls must all hash
    identically to their small-type equivalents."""
    import pyarrow as pa

    from metrics_ray.checks.keyed import content_hash_batch

    t = pa.table({
        "bytes": pa.array([b"abc", None, b"abc", b"x"], pa.large_binary()),
        "transcript": pa.array(["t1", "t2", "t1", None], pa.large_string()),
        "clip_id": pa.array(["a", "b", "c", "d"]),
        "partition": pa.array([0, 1, 0, 1], pa.int32()),
    })
    k1 = content_hash_batch(t).column("key").to_pylist()
    assert k1[0] == k1[2] and len(set(k1)) == 3
    assert content_hash_batch(t.slice(2)).column("key").to_pylist()[0] == k1[2]
    t2 = pa.table({
        "bytes": t.column("bytes").cast(pa.binary()),
        "transcript": t.column("transcript").cast(pa.string()),
        "clip_id": t.column("clip_id"), "partition": t.column("partition")})
    assert content_hash_batch(t2).column("key").to_pylist() == k1


def test_noise_filter_is_selective():
    """quiet_ray_logs drops exactly the two known-noise ray.data warnings
    and passes everything else through (a level change would mask real
    operational warnings from the same modules)."""
    import logging

    from metrics_ray import _NOISE_FILTER, quiet_ray_logs

    quiet_ray_logs()  # idempotent: second attach must not duplicate
    lg = logging.getLogger(
        "ray.data._internal.arrow_ops.transform_pyarrow")
    assert lg.filters.count(_NOISE_FILTER) == 1

    def rec(msg):
        return logging.LogRecord("x", logging.WARNING, "f", 1, msg, (), None)

    assert not _NOISE_FILTER.filter(rec(
        "Failed to hash the schemas (for deduplication): unhashable"))
    assert not _NOISE_FILTER.filter(rec(
        "Operator produced a RefBundle with a different schema than ..."))
    assert _NOISE_FILTER.filter(rec("Failed to unify schemas: boom"))
    assert _NOISE_FILTER.filter(rec("spilling 2 GiB to disk"))
