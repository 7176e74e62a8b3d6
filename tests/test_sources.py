"""Format-dispatch source tests: identical schema + content across
parquet / JSONL / CSV for the same table (SURVEY.md §2.2 multi-format
ingestion analog)."""

import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("srcfmt")
    t = pq.read_table(os.path.join(SF, "documents.parquet"))
    df = t.to_pandas()
    df.to_json(d / "documents.jsonl", orient="records", lines=True)
    df.to_csv(d / "documents.csv", index=False)
    t.to_pandas().to_parquet(d / "documents.parquet")
    return d


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    return (df[sorted(df.columns)].astype(str)
            .sort_values(sorted(df.columns), kind="stable")
            .reset_index(drop=True))


@pytest.mark.parametrize("fname", ["documents.parquet", "documents.jsonl",
                                   "documents.csv"])
def test_read_any_format_parity(fixture_dir, fname):
    from metrics_ray.sources.clips_source import read_any

    want = pq.read_table(os.path.join(SF, "documents.parquet")).to_pandas()
    got = read_any(str(fixture_dir / fname)).to_pandas()
    pd.testing.assert_frame_equal(_norm(got), _norm(want))


def test_read_any_column_projection(fixture_dir):
    from metrics_ray.sources.clips_source import read_any

    got = read_any(str(fixture_dir / "documents.jsonl"),
                   columns=["doc_id", "lang"])
    assert sorted(got.schema().names) == ["doc_id", "lang"]


def test_read_any_rejects_unknown_ext(fixture_dir):
    from metrics_ray.sources.clips_source import read_any

    with pytest.raises(ValueError, match="unsupported"):
        read_any(str(fixture_dir / "documents.xyz"))


def test_jsonl_roundtrip(fixture_dir, tmp_path):
    from metrics_ray.sources.clips_source import read_any, write_jsonl

    ds = read_any(str(fixture_dir / "documents.parquet"))
    out = tmp_path / "out_jsonl"
    write_jsonl(ds, str(out))
    back = read_any(str(fixture_dir / "documents.parquet")).to_pandas()
    import ray.data as rd
    rt = rd.read_json([str(out / f) for f in sorted(os.listdir(out))]).to_pandas()
    pd.testing.assert_frame_equal(_norm(rt), _norm(back))


def test_lance_parity_when_available(sf_unit, tmp_path):
    """Import-gated Lance round-trip parity (BASELINE.json input_hint names
    Lance as the primary input format): write the derived clip table to a
    .lance dataset, read it back through read_any/read_clips, and assert
    schema + content equality with the parquet path. Skips when pylance is
    absent (this sandbox); on a cluster with pylance the branch is
    exercised for real."""
    import pytest

    from metrics_ray.sources.clips_source import (
        lance_available, read_any, read_clips)

    if not lance_available():
        with pytest.raises(RuntimeError, match="lance"):
            read_clips("/tmp/nonexistent.lance")
        pytest.skip("pylance not installed")

    import lance
    import pyarrow as pa
    import pyarrow.parquet as pq

    from metrics_ray.pipelines.clips import ensure_clips_parquet

    pdir = ensure_clips_parquet(sf_unit)
    files = sorted(f"{pdir}/{f}" for f in __import__("os").listdir(pdir)
                   if f.endswith(".parquet"))
    tbl = pa.concat_tables([pq.read_table(f) for f in files])
    lpath = str(tmp_path / "clips.lance")
    lance.write_dataset(tbl, lpath)

    got = read_any(lpath, columns=["clip_id", "sr_hz"]) \
        .to_pandas().sort_values("clip_id").reset_index(drop=True)
    want = tbl.select(["clip_id", "sr_hz"]).to_pandas() \
        .sort_values("clip_id").reset_index(drop=True)
    assert got.equals(want)


def test_emb_neardup_broadcast_size_guard(sf_unit, monkeypatch):
    """q_emb_neardup's exact baseline must refuse (loudly) above the
    broadcast ceiling instead of shipping a production corpus matrix."""
    import pytest

    from metrics_ray.pipelines import embed

    monkeypatch.setattr(embed, "CORPUS_BROADCAST_MAX_ROWS", 10)
    embed._emb_neardup_impl.cache_clear()
    with pytest.raises(ValueError, match="broadcast ceiling"):
        embed.q_emb_neardup(sf_unit)
    embed._emb_neardup_impl.cache_clear()
