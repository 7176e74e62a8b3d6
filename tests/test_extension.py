"""User-extension surface (SURVEY.md §2.9): a new check is one BatchCheck
subclass — setup/evaluate(/merge/finalize) — dropped into the suite list,
exactly as a new Luzzu metric is one QualityMetric implementation. This
test defines a custom check end-to-end through the engine: broadcast
config via CheckContext, vectorized evaluate, violations + counters,
per-partition metric rows and verdicts."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from metrics_ray.checks.base import (
    BatchCheck, BatchOutcome, CheckContext, per_partition_counts,
    violations_table)

pytestmark = pytest.mark.usefixtures("ray_session")


def test_custom_check_through_engine(sf_unit):
    # defined inside the test so cloudpickle ships it by value
    class TranscriptLengthCheck(BatchCheck):
        """Custom check: transcript must be at least ``min_chars`` long
        (threshold arrives via broadcast context params)."""

        check_id = "transcript_min_len"
        columns = ("transcript", "clip_id", "partition")

        def setup(self, ctx: CheckContext) -> None:
            self.min_chars = int(ctx.params.get("transcript_min_chars", 10))

        def evaluate(self, batch: pa.Table) -> BatchOutcome:
            col = pc.fill_null(batch.column("transcript"), "")
            short = pc.less(pc.utf8_length(col), self.min_chars)
            mask = short.to_numpy(zero_copy_only=False).astype(bool)
            part = batch.column("partition").to_numpy(zero_copy_only=False)
            viol = None
            if mask.any():
                idx = np.nonzero(mask)[0]
                viol = violations_table(
                    part[idx],
                    batch.column("clip_id").take(pa.array(idx)).to_pylist(),
                    "TranscriptTooShort",
                    [str(v) for v in pc.utf8_length(col).take(
                        pa.array(idx)).to_pylist()],
                    f">= {self.min_chars} chars")
            return BatchOutcome(violations=viol,
                                counters=per_partition_counts(part, mask))

    from metrics_ray.pipelines.clips import clips_factory, ensure_clips_parquet
    from metrics_ray.runner import run_suite
    from metrics_ray.suite import metadata_checks

    factory = clips_factory(ensure_clips_parquet(sf_unit))
    ctx = CheckContext(params={"transcript_min_chars": 60})
    checks = metadata_checks() + [TranscriptLengthCheck()]
    report = run_suite(factory, checks, ctx=ctx, concurrency=2)

    m = report.metric("transcript_min_len")
    assert m is not None and m["rows_scanned"] == 504
    v = report.violations.to_pandas()
    mine = v[v.check_id == "transcript_min_len"]
    assert len(mine) == m["rows_violating"] > 0
    assert (mine.code == "TranscriptTooShort").all()
    # per-partition rows exist for the custom check too
    mdf = report.metrics.to_pandas()
    assert len(mdf[(mdf.check_id == "transcript_min_len")
                   & (mdf.partition >= 0)]) == 8


def test_config_suite_matches_code_suite(sf_unit):
    """SURVEY.md §2.9: the suite assembled from the YAML config must be
    byte-identical in behavior to the python-assembled one."""
    import os

    from metrics_ray.config import checks_from_config
    from metrics_ray.pipelines.clips import (
        clips_factory, ensure_clips_parquet, transcript_index_df)
    from metrics_ray.runner import run_suite
    from metrics_ray.suite import (
        build_baseline_profile, default_ctx, full_checks)

    cfg_path = os.path.join(os.path.dirname(__file__), "..",
                            "configs", "full_suite.yaml")
    cfg_checks = checks_from_config(cfg_path)
    code_checks = full_checks()
    assert [type(c).__name__ for c in cfg_checks] == \
        [type(c).__name__ for c in code_checks]
    assert [c.check_id for c in cfg_checks] == \
        [c.check_id for c in code_checks]
    assert [tuple(c.columns) for c in cfg_checks] == \
        [tuple(c.columns) for c in code_checks]

    factory = clips_factory(ensure_clips_parquet(sf_unit))
    profile = build_baseline_profile(factory)
    ctx = default_ctx(transcript_index=transcript_index_df(sf_unit),
                      baseline_profile=profile)
    r_cfg = run_suite(factory, cfg_checks, ctx=ctx, concurrency=2)
    r_code = run_suite(factory, code_checks, ctx=ctx, concurrency=2)
    assert r_cfg.metrics.to_pydict() == r_code.metrics.to_pydict()


def test_config_rejects_unknown_type(tmp_path):
    import json

    import pytest as _pytest

    from metrics_ray.config import checks_from_config

    p = tmp_path / "bad.json"
    p.write_text(json.dumps({"checks": [{"type": "nope", "id": "x"}]}))
    with _pytest.raises(ValueError, match="unknown check type"):
        checks_from_config(str(p))


def test_config_rejects_unknown_parameter():
    """A misspelled parameter fails the BUILD (module contract) instead of
    silently running with the default."""
    import pytest

    from metrics_ray.config import checks_from_config

    cfg = {"checks": [{"type": "drift", "id": "d", "column": "dur_ms",
                       "psi_treshold": 0.5}]}
    with pytest.raises(ValueError, match="unknown parameter"):
        checks_from_config(cfg)


def test_baseline_profile_empty_dataset_fails_loudly(ray_session):
    """merge_blobs([]) is None — an empty baseline input must raise a
    clear error, not AttributeError in a profile thread."""
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from metrics_ray.suite import build_baseline_profile

    def factory(columns=None):
        t = pa.table({"dur_ms": pa.array([], pa.int32()),
                      "partition": pa.array([], pa.int32())})
        return rd.from_arrow(t)

    with pytest.raises(ValueError, match="no batches"):
        build_baseline_profile(factory, column="dur_ms")
