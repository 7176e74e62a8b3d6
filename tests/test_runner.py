"""Golden-value end-to-end suite tests (the reference's test strategy,
SURVEY.md §5: stream a fixture with a known corruption count, assert the
metric value against a hand-computed constant — here the constants are
computed analytically from the corruption matrix in synth.py).

Base keys k = 0..499 (sf0.001 documents), plus content-dup extra rows for
k % 139 == 41 & k > 0 → 504 rows total.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")

N = 500
KS = np.arange(N)
N_DUP_ROWS = int(((KS % 139 == 41) & (KS > 0)).sum())  # 4
TOTAL = N + N_DUP_ROWS  # 504


@pytest.fixture(scope="module")
def report(sf_unit):
    from metrics_ray.pipelines.clips import validate_sf

    return validate_sf(sf_unit, concurrency=2)


def _counts(report, check_id=None, code=None):
    df = report.violations.to_pandas()
    if check_id:
        df = df[df.check_id == check_id]
    if code:
        df = df[df.code == code]
    return len(df)


def test_total_rows(report):
    assert report.manifest["rows_scanned"] == TOTAL


def test_sr_enum_golden(report):
    n_bad = int(((KS % 97 == 13) | (KS % 97 == 50)).sum())  # 11
    assert _counts(report, "sr_enum") == n_bad
    m = report.metric("sr_enum")
    assert m["metric_value"] == pytest.approx(1 - n_bad / TOTAL, abs=1e-9)
    assert not m["passed"]


def test_dur_range_golden(report):
    n_bad = int(((KS % 103 == 11) | (KS % 103 == 60)).sum())  # 10
    assert _counts(report, "dur_range") == n_bad


def test_codec_golden(report):
    bad_enum = ((KS % 107 == 3) | (KS % 107 == 71) | (KS % 107 == 40))
    gsm = (KS % 109 == 9) & ~bad_enum
    assert _counts(report, "codec_enum") == int((bad_enum | gsm).sum())
    assert _counts(report, "codec_deprecated") == int(gsm.sum())


def test_transcript_nonnull_golden(report):
    n_bad = int(((KS % 89 == 5) | (KS % 89 == 44)).sum())  # 12
    assert _counts(report, "transcript_nonnull") == n_bad


def test_clipid_format_passes(report):
    assert _counts(report, "clipid_format") == 0
    assert report.metric("clipid_format")["passed"]


def test_exact_uniqueness_golden(report):
    """ValidIFPUsage Bag semantics: ALL colliding members are violations."""
    n_pairs = int(((KS % 101 == 7) & (KS > 0)).sum())  # 5
    assert _counts(report, "clipid_unique_exact") == 2 * n_pairs
    df = report.violations.to_pandas()
    dup_ids = sorted(df[df.check_id == "clipid_unique_exact"].clip_id.unique())
    expected = sorted(f"clip-{k-1:08d}" for k in KS[(KS % 101 == 7) & (KS > 0)])
    assert dup_ids == expected


def test_hll_uniqueness_estimate(report):
    m = report.metric("clipid_unique_hll")
    exact_distinct = TOTAL - int(((KS % 101 == 7) & (KS > 0)).sum())
    est_ratio = m["metric_value"]
    assert abs(est_ratio - exact_distinct / TOTAL) < 0.02  # HLL tol
    assert m["is_estimate"]


def test_referential_golden(report):
    missing = int((KS % 113 == 29).sum())  # 5
    assert _counts(report, "referential_transcript", "MissingReference") == missing
    # mismatches: seeded (%137==31) + null/empty (%89) + dup-id rows whose id
    # points at k-1's reference text
    seeded = int((KS % 137 == 31).sum())
    nullish = int(((KS % 89 == 5) | (KS % 89 == 44)).sum())
    dup_id = int(((KS % 101 == 7) & (KS > 0)).sum())
    assert _counts(report, "referential_transcript", "TranscriptMismatch") == \
        seeded + nullish + dup_id


def test_content_dedup_golden(report):
    assert _counts(report, "content_dedup") == N_DUP_ROWS
    m = report.metric("content_dedup")
    assert m["metric_value"] == pytest.approx(1 - N_DUP_ROWS / TOTAL, abs=1e-9)


def test_decode_golden(report):
    assert _counts(report, "decode_invariants", "DecodeError") == \
        int((KS % 127 == 17).sum())
    assert _counts(report, "decode_invariants", "CodecMismatch") == \
        int((KS % 111 == 21).sum())
    # noisy rows + the content-dup rows (payload keyed to the base clip_id)
    assert _counts(report, "decode_invariants", "LowSNR") == \
        int((KS % 131 == 23).sum()) + N_DUP_ROWS
    # every corrupted sr/dur row is also metadata-inconsistent with its bytes
    assert _counts(report, "decode_invariants", "DurationMismatch") == \
        int(((KS % 97 == 13) | (KS % 97 == 50) |
             (KS % 103 == 11) | (KS % 103 == 60)).sum())


def test_drift_self_is_zero(report):
    m = report.metric("dur_drift_psi")
    assert m["metric_value"] == pytest.approx(0.0, abs=1e-9)
    assert m["passed"]


def test_verdicts_all_partitions_fail_on_corrupt_table(report):
    v = report.verdicts.to_pandas()
    assert len(v) == 8
    assert not v.passed.any()  # corruption hits every partition at this scale
    assert v.rows_scanned.sum() == TOTAL


def test_quantile_profile_sane(report):
    m = report.metric("dur_profile")
    # base_dur uniform in [200, 1999] → p50 ≈ 1100 (t-digest tolerance)
    assert 1000 < m["metric_value"] < 1200


def test_report_write(report, tmp_path):
    """ProblemCollection-serializer analog: partitioned parquet + manifest."""
    import json
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    out = report.write(str(tmp_path / "report"))
    assert pq.read_table(os.path.join(out, "metrics.parquet")).num_rows \
        == report.metrics.num_rows
    assert pq.read_table(os.path.join(out, "verdicts.parquet")).num_rows == 8
    vdirs = sorted(os.listdir(os.path.join(out, "violations")))
    assert all(d.startswith("partition=") for d in vdirs)
    n = sum(pq.read_table(os.path.join(out, "violations", d,
                                       "violations.parquet")).num_rows
            for d in vdirs)
    assert n == report.violations.num_rows
    manifest = json.load(open(os.path.join(out, "manifest.json")))
    assert manifest["rows_scanned"] == report.manifest["rows_scanned"]


def test_problem_granularities(report):
    """The three ProblemCollection element granularities (reference usage:
    ProblemCollection<Quad> = flat rows, <Model> = per-constraint Bag of
    violating subjects (ValidIFPUsage.java:80-104), <Resource> = the bare
    offender (HumanReadableLabelling.java)) must be consistent views of
    the same violation set."""
    flat = report.violations.to_pandas()
    assert len(flat) > 0

    models = report.problem_models().to_pandas()
    # every flat row lands in exactly one model bag
    assert models["n_offenders"].sum() == len(flat)
    # bag membership matches the flat rows for each (check, partition, code)
    for _, r in models.iterrows():
        want = sorted(flat[(flat.check_id == r.check_id)
                           & (flat.partition == r.partition)
                           & (flat.code == r.code)].clip_id)
        assert list(r.members) == want[:1000]
        assert r.n_offenders == len(want)
    # bag cap: deterministic sorted head, count preserved
    capped = report.problem_models(max_members=1).to_pandas()
    assert (capped["members"].map(len) <= 1).all()
    assert capped["n_offenders"].sum() == len(flat)

    res = report.problem_resources().to_pandas()
    assert res["n_problems"].sum() == len(flat)
    worst = flat.groupby("clip_id")["code"].agg(lambda s: sorted(set(s)))
    for _, r in res.iterrows():
        assert list(r.codes) == worst[r.clip_id]


def test_violations_sink_mode(sf_unit, tmp_path):
    """With a sink, violation rows go straight to partitioned parquet from
    the tasks; the driver sees none, but counters and the written rows
    match the in-driver mode exactly."""
    import glob
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from metrics_ray.checks.stateless import NonNullCheck, RangeCheck
    from metrics_ray.pipelines.clips import clips_factory, ensure_clips_parquet
    from metrics_ray.runner import run_batch_checks

    factory = clips_factory(ensure_clips_parquet(sf_unit))
    checks = [RangeCheck("dur_range", "dur_ms", 1, 30000),
              NonNullCheck("transcript_nonnull", "transcript")]
    cols = ["dur_ms", "transcript", "clip_id", "partition"]

    viol_a, counters_a, _ = run_batch_checks(factory(cols), checks,
                                             concurrency=2)
    sink = str(tmp_path / "sink")
    viol_b, counters_b, _ = run_batch_checks(factory(cols), checks,
                                             concurrency=2,
                                             violations_sink=sink)
    assert viol_b.num_rows == 0  # nothing through the driver
    import pandas as pd

    pd.testing.assert_frame_equal(counters_a, counters_b)

    files = glob.glob(os.path.join(sink, "**", "*.parquet"), recursive=True)
    written = pa.concat_tables([pq.read_table(f, columns=[
        "check_id", "clip_id", "code"]) for f in files])
    a = viol_a.select(["check_id", "clip_id", "code"]).to_pandas() \
        .sort_values(["check_id", "clip_id"]).reset_index(drop=True)
    b = written.to_pandas().sort_values(["check_id", "clip_id"]) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # hive layout: one dir per partition
    assert any("partition=" in f for f in files)


def test_compare_reports(report, sf_unit):
    """Run-over-run metric regression detection: a corrupted-vs-clean
    comparison flags exactly the checks whose metric dropped."""
    from metrics_ray.checks.stateless import NonNullCheck, RangeCheck
    from metrics_ray.pipelines.clips import clips_factory, ensure_clips_parquet
    from metrics_ray.runner import compare_reports, run_suite

    factory = clips_factory(ensure_clips_parquet(sf_unit))
    checks = lambda: [RangeCheck("dur_range", "dur_ms", 1, 30000),  # noqa: E731
                      NonNullCheck("transcript_nonnull", "transcript")]
    a = run_suite(factory, checks(), concurrency=2)

    # identical run → no regressions
    b = run_suite(factory, checks(), concurrency=2)
    cmp_same = compare_reports(b, a).to_pandas()
    assert not cmp_same.regressed.any()
    assert (cmp_same.delta.abs() < 1e-12).all()

    # widened range ⇒ fewer violations ⇒ HIGHER metric: improvement not
    # regression; narrowed range ⇒ regression flagged
    worse = run_suite(factory, [RangeCheck("dur_range", "dur_ms", 500, 1000),
                                NonNullCheck("transcript_nonnull",
                                             "transcript")], concurrency=2)
    cmp_worse = compare_reports(worse, a).to_pandas()
    dur = cmp_worse[cmp_worse.check_id == "dur_range"]
    assert dur.regressed.any()
    non = cmp_worse[cmp_worse.check_id == "transcript_nonnull"]
    assert not non.regressed.any()


def test_circuit_breaker_trips_and_records(sf_unit):
    """Error budget (SURVEY.md §2.6 N-strikes fail-fast): once global
    violations exceed the budget, remaining batches are skipped; the
    synthetic __circuit__ counter row records total + tripped flag."""
    from metrics_ray.pipelines.clips import clips_dataset
    from metrics_ray.runner import run_batch_checks
    from metrics_ray.suite import metadata_checks

    ds = clips_dataset(sf_unit, with_audio=False)
    checks = [c for c in metadata_checks()
              if c.check_id != "schema_conformance"]
    viol, counters, _ = run_batch_checks(ds, checks, batch_size=32,
                                         error_budget=0)
    row = counters[counters.check_id == "__circuit__"]
    assert len(row) == 1
    assert int(row.iloc[0]["violating"]) == 1  # tripped
    assert int(row.iloc[0]["scanned"]) > 0    # saw violations
    # skipped batches ⇒ at least one check scanned fewer than all rows
    scanned = counters[counters.check_id == "sr_enum"]["scanned"].sum()
    assert scanned < 504

    # generous budget: never trips, full scan
    viol2, counters2, _ = run_batch_checks(ds, checks, batch_size=32,
                                           error_budget=10_000)
    row2 = counters2[counters2.check_id == "__circuit__"]
    assert int(row2.iloc[0]["violating"]) == 0
    assert counters2[counters2.check_id == "sr_enum"]["scanned"].sum() == 504


def test_run_suite_error_budget_manifest(sf_unit):
    from metrics_ray.pipelines.clips import clips_factory, ensure_clips_parquet
    from metrics_ray.runner import run_suite
    from metrics_ray.suite import metadata_checks

    factory = clips_factory(ensure_clips_parquet(sf_unit))
    checks = [c for c in metadata_checks()
              if c.check_id != "schema_conformance"]
    report = run_suite(factory, checks, batch_size=32, error_budget=0)
    assert report.manifest["circuit_open"] is True
    assert report.manifest["circuit_violations_seen"] > 0


def test_distributed_referential_matches_broadcast(report, sf_unit):
    """The flagship auto-switch (broadcast index vs bucketed co-group,
    pipelines/clips.py BROADCAST_BUDGET_ROWS): forcing the distributed
    path must reproduce the broadcast path's referential violation set
    (both problem families) and identical per-partition verdicts."""
    from metrics_ray.pipelines.clips import validate_sf

    dist = validate_sf(sf_unit, concurrency=2, broadcast_budget_rows=0)

    def ref_rows(rep):
        df = rep.violations.to_pandas()
        df = df[df.check_id == "referential_transcript"]
        return sorted(zip(df.code, df.clip_id, df.partition))

    assert ref_rows(dist) == ref_rows(report)
    # same overall verdicts (pass/fail per partition)
    b = report.verdicts.to_pandas().set_index("partition")["passed"]
    d = dist.verdicts.to_pandas().set_index("partition")["passed"]
    assert d.to_dict() == b.to_dict()


def test_unfused_keyed_path_matches_fused(report, sf_unit):
    """The fused keyed path (key rows emitted inside the shared batch
    pass — content_dedup AND clipid_unique_exact) must reproduce the
    independent-pipeline path's violation sets and verdicts exactly."""
    from metrics_ray.pipelines.clips import (clips_factory,
                                             ensure_clips_parquet,
                                             validate_with_factory)

    path = ensure_clips_parquet(sf_unit)
    unfused = validate_with_factory(clips_factory(path), sf_unit,
                                    concurrency=2,
                                    fuse_content_dedup=False)

    def keyed_rows(rep, cid):
        df = rep.violations.to_pandas()
        df = df[df.check_id == cid]
        return sorted(zip(df.code, df.clip_id, df.partition, df.actual))

    for cid in ("content_dedup", "clipid_unique_exact"):
        assert keyed_rows(unfused, cid) == keyed_rows(report, cid), cid
        assert keyed_rows(report, cid), cid  # fixture seeds violations
    f = report.verdicts.to_pandas().set_index("partition")["passed"]
    u = unfused.verdicts.to_pandas().set_index("partition")["passed"]
    assert u.to_dict() == f.to_dict()


def test_speaking_rate_and_ctc_checks_match_their_queries(report, sf_unit):
    """The two joint-quality suite checks (speaking_rate, ctc_feasible)
    flag exactly the rows their standalone oracle-backed queries return —
    the suite path and the driver-query path share semantics."""
    from metrics_ray.pipelines.queries import q_ctc_feasible, q_speaking_rate

    df = report.violations.to_pandas()
    got_sr = sorted(df[df.check_id == "speaking_rate"].clip_id)
    got_ctc = sorted(df[df.check_id == "ctc_feasible"].clip_id)
    assert got_sr == sorted(
        q_speaking_rate(sf_unit).column("clip_id").to_pylist())
    assert got_ctc == sorted(
        q_ctc_feasible(sf_unit).column("clip_id").to_pylist())
    assert got_sr and got_ctc  # fixture seeds both families


def test_payload_size_check_matches_its_query(report, sf_unit):
    """The pre-decode size-triage suite check flags exactly the rows its
    standalone oracle-backed query returns — suite path and driver-query
    path share semantics (the speaking_rate/ctc contract)."""
    from metrics_ray.pipelines.queries import q_payload_size

    df = report.violations.to_pandas()
    got = sorted(df[df.check_id == "payload_size"].clip_id)
    want = sorted(q_payload_size(sf_unit).column("clip_id").to_pylist())
    assert got == want
    assert got  # fixture seeds size-corrupted uncompressed payloads
    # triage⊆decode sanity: a size-flagged clip is always also flagged by
    # the decode stage (truncation or duration mismatch) — the gate never
    # invents a violation the expensive stage wouldn't confirm
    decode_ids = set(df[df.check_id == "decode_invariants"].clip_id)
    assert set(got).issubset(decode_ids)


def test_circuit_budget_with_keyed_has_unique_metric_rows(sf_unit):
    """The circuit breaker's synthetic partition=-1 counter row must not
    leak a second (check_id, -1) metric row into keyed checks' rollups —
    every (check_id, partition) pair in the metric table is unique."""
    from metrics_ray.pipelines.clips import clips_factory, ensure_clips_parquet
    from metrics_ray.runner import run_suite
    from metrics_ray.suite import keyed_checks, metadata_checks

    factory = clips_factory(ensure_clips_parquet(sf_unit))
    checks = [c for c in metadata_checks()
              if c.check_id != "schema_conformance"]
    rep = run_suite(factory, checks, keyed=keyed_checks(),
                    batch_size=64, error_budget=100)
    m = rep.metrics.to_pandas()
    dup = m.groupby(["check_id", "partition"]).size()
    assert (dup == 1).all(), dup[dup > 1]


def test_schema_check_survives_column_pruning(sf_unit):
    """A metadata-only suite prunes 'bytes' from the read; SchemaCheck
    must treat the pruned column as out-of-evidence, not 'missing' —
    previously every row false-failed schema_conformance."""
    from metrics_ray.checks.stateless import RangeCheck, SchemaCheck
    from metrics_ray.pipelines.clips import clips_factory, ensure_clips_parquet
    from metrics_ray.runner import run_suite
    from metrics_ray.schema import CLIP_SCHEMA

    factory = clips_factory(ensure_clips_parquet(sf_unit))
    rep = run_suite(factory, [SchemaCheck("schema_conformance", CLIP_SCHEMA),
                              RangeCheck("dur_range", "dur_ms", 1, 30000)],
                    concurrency=2)
    assert rep.metric("schema_conformance")["metric_value"] == 1.0
    v = rep.violations.to_pandas()
    assert (v.check_id == "schema_conformance").sum() == 0


def test_sampled_check_first_keeps_full_denominator(sf_unit):
    """A sampling check in FIRST position must not shrink rows_scanned /
    keyed denominators to the sampled count (the old checks[0] rule)."""
    from metrics_ray.checks.decode import DecodeCheck
    from metrics_ray.checks.stateless import RangeCheck
    from metrics_ray.pipelines.clips import clips_factory, ensure_clips_parquet
    from metrics_ray.runner import run_suite

    factory = clips_factory(ensure_clips_parquet(sf_unit))
    rep = run_suite(factory,
                    [DecodeCheck("decode_sampled", sample_fraction=0.25),
                     RangeCheck("dur_range", "dur_ms", 1, 30000)],
                    concurrency=2)
    assert rep.manifest["rows_scanned"] == TOTAL


def test_run_suite_violations_sink_keyed(sf_unit, tmp_path):
    """Suite-level sink mode: batch AND keyed violation rows land in the
    sink, the driver report carries counts only, and metric values match
    the in-driver mode."""
    import glob
    import os

    from metrics_ray.pipelines.clips import validate_sf

    sink = str(tmp_path / "sink")
    a = validate_sf(sf_unit, concurrency=2)
    b = validate_sf(sf_unit, concurrency=2, violations_sink=sink)
    assert b.violations.num_rows == 0
    ma = (a.metrics.to_pandas()
          .set_index(["check_id", "partition"])["metric_value"])
    mb = (b.metrics.to_pandas()
          .set_index(["check_id", "partition"])["metric_value"])
    import pandas as pd

    pd.testing.assert_series_equal(ma.sort_index(), mb.sort_index())
    files = glob.glob(os.path.join(sink, "**", "*.parquet"), recursive=True)
    assert files
    assert any("keyed_" in os.path.basename(f) for f in files)


def test_composite_exchange_scopes_and_splits():
    """composite_fused_duplicates: (a) both checks reduce correctly in
    ONE exchange, (b) key rows from a foreign emitter are ignored, (c)
    identical key VALUES under different check_ids never cross-talk."""
    import pyarrow as pa
    import ray

    from metrics_ray.checks.keyed import (COMPOSITE_KEYED_SCHEMA,
                                          composite_fused_duplicates)

    # fused tagged key stream shape: check_id, actual(=key), partition,
    # clip_id. Key 'K' appears under BOTH checks: twice for uniqueness
    # (a duplicate) and once for content (no duplicate) — composite
    # bucketing on (check_id, key) must keep them apart.
    rows = {
        "check_id": (["clipid_unique_exact"] * 3
                     + ["content_dedup"] * 3
                     + ["some_other_check"]),
        "actual": ["K", "K", "solo", "K", "h2", "h2", "K"],
        "partition": pa.array([0, 1, 0, 0, 1, 1, 0], pa.int32()),
        "clip_id": ["K", "K", "solo", "c1", "c2", "c3", "foreign"],
    }
    keys_ds = ray.data.from_arrow(pa.table(rows))
    out = pa.concat_tables(
        [t.cast(COMPOSITE_KEYED_SCHEMA) for t in
         ray.get(composite_fused_duplicates(keys_ds).to_arrow_refs())
         if t.num_rows])
    df = out.to_pandas().sort_values(["check_id", "clip_id"])
    # uniqueness: key K duplicated (2 occurrences) -> 2 violation rows
    u = df[df.check_id == "clipid_unique_exact"]
    assert list(u.clip_id) == ["K", "K"]
    assert set(u.actual) == {"2 occurrences"}
    # content: h2 shared by c2,c3 -> second member flagged; the 'K'
    # content key (single member) and the foreign row produce nothing
    c = df[df.check_id == "content_dedup"]
    assert list(c.clip_id) == ["c3"]
    assert "some_other_check" not in set(df.check_id)


def test_composite_task_graph_matches_dataset_path():
    """The two-wave task-graph exchange (composite_fused_duplicates_refs)
    produces byte-identical violations to the Dataset sort-exchange plan,
    including: kind-column filtering of a raw tagged stream, foreign-check
    scoping, and key cross-talk isolation — at several bucket counts."""
    import pyarrow as pa
    import ray

    from metrics_ray.checks.keyed import (COMPOSITE_KEYED_SCHEMA,
                                          composite_fused_duplicates,
                                          composite_fused_duplicates_refs)

    rows = {
        "kind": ["k"] * 7 + ["v"],  # one non-key row: must be dropped
        "check_id": (["clipid_unique_exact"] * 3
                     + ["content_dedup"] * 3
                     + ["some_other_check", "clipid_unique_exact"]),
        "actual": ["K", "K", "solo", "K", "h2", "h2", "K", "K"],
        "partition": pa.array([0, 1, 0, 0, 1, 1, 0, 0], pa.int32()),
        "clip_id": ["K", "K", "solo", "c1", "c2", "c3", "foreign", "vrow"],
    }
    t = pa.table(rows)
    # Dataset path consumes the kind=='k' view (as run_suite's KeyStream
    # dataset does); the task path consumes the RAW tagged blocks
    keys_tbl = t.filter(pa.compute.equal(t.column("kind"), "k"))
    ds_out = pa.concat_tables(
        [x.cast(COMPOSITE_KEYED_SCHEMA) for x in
         ray.get(composite_fused_duplicates(
             ray.data.from_arrow(keys_tbl)).to_arrow_refs())
         if x.num_rows]).to_pandas()
    ds_out = ds_out.sort_values(list(ds_out.columns)).reset_index(drop=True)

    # split the raw tagged table across two blocks to exercise multi-ref
    # grouping, at B=1 (single bucket) and B=5 (keys split across buckets)
    refs = [ray.put(t.slice(0, 3)), ray.put(t.slice(3))]
    for B in (1, 5):
        got = pa.concat_tables(
            [x for x in ray.get(composite_fused_duplicates_refs(
                refs, n_buckets=B, group_width=1)) if x.num_rows]
        ).to_pandas()
        got = got.sort_values(list(got.columns)).reset_index(drop=True)
        import pandas as pd

        pd.testing.assert_frame_equal(got, ds_out)


def test_grouped_apply_refs_matches_dataset_plan_property():
    """Property: for arbitrary keyed tables, block splits, and bucket
    counts, grouped_apply_refs produces the same multiset of output rows
    as the Dataset-plan grouped_apply — including all-empty-bucket and
    single-key-skew shapes. (The framework-level pin behind the
    131/131 cross-cpu invariance sweep.)"""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray

    from metrics_ray.checks.keyed import grouped_apply, grouped_apply_refs

    out_schema = pa.schema([("k", pa.string()), ("n", pa.int64()),
                            ("s", pa.int64())])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("k")["v"].agg(n="size", s="sum").reset_index()
        return g.astype({"n": "int64", "s": "int64"})

    rng = np.random.default_rng(7)
    for trial in range(6):
        n = int(rng.integers(0, 200))
        keys = [f"key{int(x)}" for x in
                rng.integers(0, max(1, int(rng.integers(1, 12))), n)]
        vals = rng.integers(-100, 100, n).astype("int64")
        t = pa.table({"k": pa.array(keys, pa.string()),
                      "v": pa.array(vals)})
        # split into 1-5 ragged blocks
        n_blocks = int(rng.integers(1, 6))
        cuts = sorted(rng.integers(0, n + 1, n_blocks - 1).tolist())
        bounds = [0] + cuts + [n]
        blocks = [t.slice(bounds[i], bounds[i + 1] - bounds[i])
                  for i in range(len(bounds) - 1)]
        refs = [ray.put(b) for b in blocks]
        B = int(rng.integers(1, 40))

        got_refs = grouped_apply_refs([(refs, None)], "k", per_bucket,
                                      n_buckets=B, out_schema=out_schema)
        got = pa.concat_tables(
            [x for x in ray.get(got_refs) if x.num_rows]
            or [out_schema.empty_table()]).to_pandas()
        ds_out = grouped_apply(ray.data.from_arrow_refs(refs), "k",
                               per_bucket, n_buckets=B,
                               out_schema=out_schema)
        want = pa.concat_tables(
            [x.cast(out_schema) for x in
             ray.get(ds_out.materialize().to_arrow_refs()) if x.num_rows]
            or [out_schema.empty_table()]).to_pandas()
        got = got.sort_values(["k"]).reset_index(drop=True)
        want = want.sort_values(["k"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want), trial


def test_sink_is_one_readable_hive_dataset(sf_unit, tmp_path):
    """Batch AND keyed sink files share the hive layout (partition in
    the path, not a physical column), so the sink reads back as ONE
    dataset with a typed partition column — the documented consumption
    pattern (round-4 core review finding: keyed files used to land flat
    at the root with a physical partition column)."""
    import glob
    import os

    import pyarrow.dataset as pads

    from metrics_ray.pipelines.clips import validate_sf

    sink = str(tmp_path / "sink")
    rep = validate_sf(sf_unit, concurrency=2, violations_sink=sink)
    assert rep.violations.num_rows == 0

    # every parquet file lives under a partition=N dir
    files = glob.glob(os.path.join(sink, "**", "*.parquet"), recursive=True)
    assert files and all("partition=" in f for f in files)

    ds = pads.dataset(sink, partitioning="hive")
    t = ds.to_table()
    assert "partition" in t.column_names
    df = t.to_pandas()
    # both the batch checks and the keyed audits landed in the one dataset
    assert "dur_range" in set(df.check_id) or \
        "schema_conformance" in set(df.check_id)
    assert {"clipid_unique_exact", "content_dedup"} <= set(df.check_id)
    # per-check totals match the driver metrics' violation counts
    m = rep.metrics.to_pandas()
    m = m[(m.partition == -1) & (m.check_id == "clipid_unique_exact")]
    assert int(m.rows_violating.iloc[0]) == int(
        (df.check_id == "clipid_unique_exact").sum())
