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


def test_lance_dispatch_contract(sf_unit, tmp_path, monkeypatch):
    """The .lance branch is one delegation to ray.data.read_lance; this
    locks the DISPATCH CONTRACT without pylance (which cannot be
    installed here — BASELINE.md environment fact): a '.lance' path must
    route to read_lance exactly once with the path and the pruned column
    list forwarded, for both read_clips and read_any. NOT a substitute
    for the real-lance parity test above, which activates unchanged the
    moment pylance exists."""
    import ray.data as rd

    from metrics_ray.pipelines.clips import ensure_clips_parquet
    from metrics_ray.sources import clips_source

    pq_dir = ensure_clips_parquet(sf_unit)
    calls = []

    def fake_read_lance(path, columns=None, **kw):
        calls.append((path, tuple(columns or ())))
        return rd.read_parquet(pq_dir, columns=columns)

    monkeypatch.setattr(rd, "read_lance", fake_read_lance, raising=False)
    monkeypatch.setattr(clips_source, "lance_available", lambda: True)

    lpath = str(tmp_path / "clips.lance")
    ds = clips_source.read_clips(lpath, columns=["clip_id", "sr_hz"])
    assert ds.schema().names == ["clip_id", "sr_hz"]
    # read_any dispatches .lance through the same branch
    os.makedirs(lpath, exist_ok=True)
    ds2 = clips_source.read_any(lpath, columns=["clip_id"])
    assert ds2.schema().names == ["clip_id"]
    assert calls == [(lpath, ("clip_id", "sr_hz")), (lpath, ("clip_id",))]
