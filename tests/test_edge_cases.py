"""Hardening: empty batches, all-null columns, and the reference's
require-problem-report switch (ShortURIs.java:49 — metric computation
continues, violation rows are suppressed)."""

import numpy as np
import pyarrow as pa
import pytest

from metrics_ray.checks.base import CheckContext
from metrics_ray.schema import Codes
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


def _ref_batch(ids, transcripts, parts=None):
    n = len(ids)
    return pa.table({
        "clip_id": pa.array(ids, pa.string()),
        "transcript": pa.array(transcripts, pa.string()),
        "partition": pa.array(parts or [0] * n, pa.int32()),
    })


def test_referential_broadcast_null_ref_is_present_not_missing():
    """An index row whose ref_transcript is null is PRESENT — null==null
    counts as equal (the dist variant's rule); ref.isna() used to emit a
    false MissingReference here."""
    import pandas as pd

    idx = pd.DataFrame({"clip_id": ["c1", "c2"],
                        "ref_transcript": ["hello", None]})
    chk = ReferentialCheck()
    chk.setup(CheckContext(params={"transcript_index": idx}))
    out = chk.evaluate(_ref_batch(["c1", "c2", "c3"],
                                  ["hello", None, "x"]))
    v = out.violations.to_pandas()
    assert list(v["clip_id"]) == ["c3"]  # only the truly-absent key
    assert list(v["code"].unique()) == [Codes.MISSING_REFERENCE]


def test_referential_broadcast_duplicate_index_keys():
    """Duplicate index keys keep the lexicographically-least ref text —
    deterministic regardless of input order (no InvalidIndexError, no
    arrival-order dependence; same policy as the dist variant)."""
    import pandas as pd

    # deliberately list the greater text FIRST: keep-first would pick it
    idx = pd.DataFrame({"clip_id": ["c1", "c1"],
                        "ref_transcript": ["zzz", "aaa"]})
    chk = ReferentialCheck()
    chk.setup(CheckContext(params={"transcript_index": idx}))
    out = chk.evaluate(_ref_batch(["c1"], ["aaa"]))
    assert out.violations is None  # matches the least text, not "zzz"


def test_referential_dist_left_without_partition(ray_session):
    """A left side lacking the partition column reports partition -1
    instead of IntCastingNaNError inside the co-group task."""
    import ray.data as rd

    from metrics_ray.checks.referential import referential_violations_dist

    clips = rd.from_arrow(pa.table({
        "clip_id": ["c1", "c9"],
        "transcript": ["hello", "orphan"],
    }))
    index = rd.from_arrow(pa.table({
        "clip_id": ["c1"], "ref_transcript": ["hello"],
    }))
    df = referential_violations_dist(clips, index).to_pandas()
    assert list(df["clip_id"]) == ["c9"]
    assert list(df["partition"]) == [-1]


def test_schema_check_missing_partition_column_reports():
    """Dropping the partition column itself is reported as SCHEMA_MISMATCH,
    not a KeyError that kills the suite pass."""
    from metrics_ray.checks.stateless import SchemaCheck

    chk = SchemaCheck("schema", pa.schema([("clip_id", pa.string()),
                                           ("partition", pa.int32())]))
    out = chk.evaluate(pa.table({"clip_id": pa.array(["a"], pa.string())}))
    v = out.violations.to_pandas()
    assert "<column:partition>" in set(v["clip_id"])


def test_schema_check_type_drifted_partition_column_reports():
    """A partition column PRESENT but drifted to string is reported as
    SCHEMA_MISMATCH, not a ValueError from the int64 cast."""
    from metrics_ray.checks.stateless import SchemaCheck

    chk = SchemaCheck("schema", pa.schema([("partition", pa.int32())]))
    out = chk.evaluate(pa.table({"partition": pa.array(["p0"], pa.string())}))
    v = out.violations.to_pandas()
    assert "<column:partition>" in set(v["clip_id"])
    assert list(v["actual"]) == ["string"]


def test_ownership_custom_prefix_length():
    """Owner digits come from the trailing digit run, not a hard-coded
    slice(5) — a 6-char prefix must still assign the right owner."""
    from metrics_ray.checks.stateless import OwnershipCheck

    chk = OwnershipCheck("ownership", id_re=r"^audio-[0-9]{8}$",
                         n_partitions=8)
    batch = pa.table({
        "clip_id": pa.array(["audio-00000003", "audio-00000011"]),
        "partition": pa.array([3, 0], pa.int32()),
    })
    out = chk.evaluate(batch)
    v = out.violations.to_pandas()
    # owner(3)=3 stored at 3 → fine; owner(11)=3 stored at 0 → violation
    assert list(v["clip_id"]) == ["audio-00000011"]


def test_partition_fingerprint_flips_on_single_row_change():
    """The incremental-revalidation contract: the fingerprint is invariant
    to row order, and any single-row edit flips exactly its partition's
    value."""
    from metrics_ray.sketches import md5_lower64

    def fp(rows):
        out = {}
        for part, cid, tr, sr, dm, cod in rows:
            s = f"{cid}#{tr if tr is not None else chr(1)}#{sr}#{dm}#{cod}"
            h = int(md5_lower64([s])[0])
            out[part] = (out.get(part, 0) + h) % (1 << 64)
        return out

    rows = [(p, f"clip-{i:08d}", f"text {i}", 16000, 500 + i, "flac")
            for i in range(40) for p in (i % 4,)]
    base = fp(rows)
    # order invariance
    assert fp(list(reversed(rows))) == base
    # single-row transcript edit → only partition 2's fingerprint moves
    edited = [(p, c, ("CHANGED" if (p, c[5:]) == (2, "clip-00000002"[5:])
                      and c == "clip-00000002" else t), s, d, k)
              for p, c, t, s, d, k in rows]
    got = fp(edited)
    diff = {p for p in base if base[p] != got[p]}
    assert diff == {2}
    # NULL transcript and empty transcript fingerprint differently
    a = fp([(0, "c", None, 1, 2, "x")])
    b = fp([(0, "c", "", 1, 2, "x")])
    assert a != b


def test_empty_source_tables_fail_loudly(tmp_path, ray_session):
    """An EMPTY documents/embeddings table must raise the explicit
    check-the-upstream-ingest ValueError from every derived source —
    before round 5 these died downstream in opaque internals ('Must
    provide at least one path', concat of no tables, schema KeyError)."""
    import pyarrow.parquet as pq
    import pytest

    d = str(tmp_path)
    for t in ("documents", "embeddings"):
        src = pq.read_table(f"/root/testdata/sf0.001/{t}.parquet").slice(0, 0)
        pq.write_table(src, f"{d}/{t}.parquet")

    from metrics_ray.pipelines.queries import VALIDATION_QUERIES

    for name in ("val_silence_geometry", "val_payload_size",
                 "val_footer_profile", "img_decode_geometry",
                 "vid_frame_geometry", "emb_kcenter", "emb_neardup_lsh",
                 "doc_dup_spans"):
        with pytest.raises(ValueError, match="EMPTY"):
            VALIDATION_QUERIES[name][0](d)
