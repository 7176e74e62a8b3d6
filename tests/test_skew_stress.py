"""Skew-stress parity locks (VERDICT r4 #1): the keyed dedup/join paths
must stay byte-identical to SQL recomputed on a deliberately skewed table
(one hot key/content family at ~10% of rows; one minhash mega-band).
Walls are measured by jobs/skew_stress.py (BASELINE.md round-5 section);
these tests lock the CORRECTNESS half at unit scale."""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "jobs"))

pytestmark = pytest.mark.usefixtures("ray_session")


@pytest.fixture(scope="module")
def skew_fixtures(sf_unit, tmp_path_factory):
    import skew_stress as S

    out = str(tmp_path_factory.mktemp("skewfx"))
    from metrics_ray.pipelines.clips import ensure_clips_parquet

    uniform = ensure_clips_parquet(sf_unit)
    skew = S.build_skewed_clips(sf_unit, out)
    skew_docs = S.build_skewed_docs(sf_unit, out)
    return uniform, skew, skew_docs


def test_keyed_paths_oracle_parity_under_skew(skew_fixtures):
    import skew_stress as S

    uniform, skew, _ = skew_fixtures
    _, dup, cd, anti = S.drive_clips_paths(skew, uniform)
    con = duckdb.connect()
    ok = S.clips_parity(con, skew, uniform, dup, cd, anti)
    assert ok == {"dup": True, "content": True, "anti": True}
    # the hot family actually exercises the mega-group shape
    assert dup.num_rows >= 50 and cd.num_rows >= 50 and anti.num_rows >= 50


def test_minhash_mega_band_matches_exact_jaccard(skew_fixtures):
    import skew_stress as S

    _, _, skew_docs = skew_fixtures
    con = duckdb.connect()
    res = S.drive_minhash(skew_docs, con, with_parity=True)
    assert res["parity"] is True
    # the mega-band inflates the pair graph well past the uniform fixture
    assert res["pairs"] > 1000
