"""fx_drift and fx_skew fixtures (FIXTURES.md §4): distribution drift must
trip the PSI check against a clean baseline profile, and a skewed layout
(hot keys concentrated in one partition) must produce identical verdicts to
the engine's normal path."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")


def test_drift_detected_vs_shifted_baseline(sf_unit):
    """Shift dur_ms by deriving with dur_scale≠1 and compare against the
    unshifted baseline: PSI must exceed the threshold and fail the check;
    self-profile comparison must pass with PSI ≈ 0."""
    from metrics_ray.pipelines.clips import (
        clips_factory, ensure_clips_parquet, transcript_index_df,
        validate_with_factory)

    base_path = ensure_clips_parquet(sf_unit)
    shifted_path = ensure_clips_parquet(sf_unit, dur_scale=0.3)

    # self-profile: no drift
    clean = validate_with_factory(clips_factory(base_path), sf_unit,
                                  with_decode=False,
                                  with_content_dedup=False)
    m = clean.metric("dur_drift_psi")
    assert m["passed"] and m["metric_value"] < 0.01

    # shifted data vs clean baseline: drift
    drifted = validate_with_factory(
        clips_factory(shifted_path), sf_unit,
        with_decode=False, with_content_dedup=False,
        baseline_factory=clips_factory(base_path))
    m = drifted.metric("dur_drift_psi")
    assert not m["passed"]
    assert m["metric_value"] > 0.2  # PSI above the fail threshold


def test_skewed_layout_same_verdicts(sf_unit, tmp_path):
    """Rewrite the clips cache so 80% of rows land in ONE file and one hot
    clip_id repeats across files; keyed checks must return the same
    violation sets as on the balanced layout."""
    import pyarrow.parquet as pq

    from metrics_ray.checks.keyed import content_duplicates, exact_duplicate_keys
    from metrics_ray.pipelines.clips import clips_factory, ensure_clips_parquet

    base_path = ensure_clips_parquet(sf_unit)
    balanced = clips_factory(base_path)

    files = sorted(str(p) for p in __import__("glob").glob(base_path + "/*.parquet"))
    t = pa.concat_tables([pq.read_table(f) for f in files])
    df = t.to_pandas()
    # hot-key skew: one clip_id duplicated 50x, all in partition 0
    hot = df.iloc[[0] * 50].copy()
    hot["partition"] = np.int32(0)
    skewed = pd.concat([df, hot], ignore_index=True)
    # 80% of rows into one file, rest spread thin
    n = len(skewed)
    cut = int(n * 0.8)
    big, rest = skewed.iloc[:cut], skewed.iloc[cut:]
    sk_dir = tmp_path / "skewed"
    sk_dir.mkdir()
    pq.write_table(pa.Table.from_pandas(big, preserve_index=False)
                   .cast(t.schema), str(sk_dir / "big.parquet"))
    for i in range(4):
        part = rest.iloc[i::4]
        pq.write_table(pa.Table.from_pandas(part, preserve_index=False)
                       .cast(t.schema), str(sk_dir / f"s{i}.parquet"))
    skewed_f = clips_factory(str(sk_dir))

    import ray

    def dup_ids(factory):
        ds = factory(["clip_id", "partition"])
        out = [x for x in ray.get(exact_duplicate_keys(ds).to_arrow_refs())
               if x.num_rows]
        return sorted(pa.concat_tables(out).column("clip_id").to_pylist())

    base_dups = dup_ids(balanced)
    skew_dups = dup_ids(skewed_f)
    hot_id = df["clip_id"].iloc[0]
    # skewed result = balanced result + 51 rows for the hot key (the hot
    # key's original row now collides with its 50 copies)
    expected = sorted(base_dups + [hot_id] * (51 if hot_id not in base_dups
                                              else 50))
    assert skew_dups == expected
