"""Unit tests for the session-5 screens beyond their SQL-oracle parity:
the vectorized kernels on inputs the ASCII fixture never exercises
(non-ASCII graphemes, astral codepoints) and the exact-integer
determinism contract of the regression fit."""

import numpy as np
import pyarrow as pa
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")


def _alphabet_reference(texts, ids):
    """Plain-python reference for the pairs kernel: per (grapheme, clip)
    occurrence counts over non-null, non-empty transcripts."""
    from collections import Counter

    occ = Counter()
    for cid, t in zip(ids, texts):
        if t:
            for ch in t:
                occ[(ch, cid)] += 1
    return occ


def test_alphabet_pairs_kernel_unicode():
    """The utf-32 np.unique kernel must agree with a per-char python count
    on non-ASCII input: combining marks, CJK, and astral (surrogate-pair)
    codepoints — the inputs string_split-based oracles never see."""
    from metrics_ray.pipelines import queries as Q

    texts = ["héllo wörld", "日本語 テスト", "emoji 🎵🎵 twice", None, "",
             "mixed ascii + ñ + 𝄞 clef", "aaa"]
    ids = [f"clip-{i:08d}" for i in range(len(texts))]
    batch = pa.table({"clip_id": pa.array(ids, pa.string()),
                      "transcript": pa.array(texts, pa.string())})

    # drive the same kernel the query ships (rebuild it via the query's
    # closure by running the query body on a tiny in-memory dataset)
    import ray

    ds = ray.data.from_arrow(batch.rename_columns(["clip_id", "transcript"]))
    # reuse the full query path against a synthetic sf_dir is not possible
    # here; instead exercise the kernel through q_alphabet's building
    # blocks: np.unique over packed keys must equal the Counter reference.
    joined = "".join(t for t in texts if t)
    codes = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
    lens = np.fromiter((len(t) for t in texts if t), dtype=np.int64)
    row = np.repeat(np.arange(len(lens), dtype=np.uint64), lens)
    key = (row << np.uint64(32)) | codes.astype(np.uint64)
    uk, counts = np.unique(key, return_counts=True)
    got = {}
    kept_ids = [i for i, t in zip(ids, texts) if t]
    for k, c in zip(uk, counts):
        rid = int(k >> np.uint64(32))
        ch = chr(int(k & np.uint64(0xFFFFFFFF)))
        got[(ch, kept_ids[rid])] = int(c)
    assert got == dict(_alphabet_reference(texts, ids))


def test_alphabet_query_matches_brute_force(sf_unit):
    """End-to-end q_alphabet vs a pandas explode over the same clips."""
    from metrics_ray.pipelines.clips import clips_dataset
    from metrics_ray.pipelines.queries import q_alphabet

    got = q_alphabet(sf_unit).to_pandas().set_index("grapheme")

    meta = []
    for b in clips_dataset(sf_unit, with_audio=False).select_columns(
            ["clip_id", "transcript"]).iter_batches(batch_format="pyarrow"):
        meta.append(pa.table(b).to_pandas())
    import pandas as pd

    df = pd.concat(meta)
    df = df[df.transcript.notna() & (df.transcript != "")]
    rows = df.apply(lambda r: [(c, r.clip_id) for c in r.transcript],
                    axis=1).explode()
    pairs = pd.DataFrame(rows.tolist(), columns=["grapheme", "clip_id"])
    want = pairs.groupby("grapheme").agg(
        n_occ=("clip_id", "size"), n_clips=("clip_id", "nunique"))
    assert got["n_occ"].to_dict() == want["n_occ"].to_dict()
    assert got["n_clips"].to_dict() == want["n_clips"].to_dict()


def test_len_fit_exact_integer_fold_matches_numpy(sf_unit):
    """The distributed integer-moment fit must equal a single-pass numpy
    computation over the whole eligible table — the determinism anchor
    (same integers in, same doubles out, regardless of partitioning)."""
    from metrics_ray.pipelines.clips import clips_dataset
    from metrics_ray.pipelines.queries import LEN_FIT_TOP_K, q_len_fit

    got = q_len_fit(sf_unit).to_pandas()
    assert len(got) == LEN_FIT_TOP_K
    assert got["z"].notna().all()

    import pandas as pd

    meta = pd.concat([pa.table(b).to_pandas() for b in clips_dataset(
        sf_unit, with_audio=False).select_columns(
        ["clip_id", "dur_ms", "transcript"]).iter_batches(
        batch_format="pyarrow")])
    elig = meta[meta.transcript.notna() & (meta.transcript.str.len() > 0)
                & (meta.dur_ms > 0)]
    x = elig.dur_ms.to_numpy(dtype=np.int64)
    y = elig.transcript.str.len().to_numpy(dtype=np.int64)
    n, sx, sy = len(x), int(x.sum()), int(y.sum())
    sxy, sxx, syy = int((x * y).sum()), int((x * x).sum()), int((y * y).sum())
    b_ = float(n * sxy - sx * sy) / float(n * sxx - sx * sx)
    a_ = (float(sy) - b_ * float(sx)) / float(n)
    r = y.astype(np.float64) - (a_ + b_ * x.astype(np.float64))
    mu, sd = r.mean(), r.std()
    from metrics_ray.functions.rounding import round_half_away

    z = round_half_away((y - (a_ + b_ * x) - r.sum() / n) / np.sqrt(
        (np.sum((y - a_ - b_ * x) ** 2) / n) - (r.sum() / n) ** 2), 6)
    # the top-k members by |z| (total order) must match
    ref = pd.DataFrame({"clip_id": elig.clip_id.to_numpy(),
                        "n_chars": y, "dur_ms": x, "z": z})
    ref["_az"] = ref.z.abs()
    ref = ref.sort_values(["_az", "clip_id", "n_chars", "dur_ms"],
                          ascending=[False, True, True, True],
                          kind="stable").head(LEN_FIT_TOP_K)
    got_set = set(map(tuple, got[["clip_id", "n_chars", "dur_ms"]].values))
    ref_set = set(map(tuple, ref[["clip_id", "n_chars", "dur_ms"]].values))
    assert got_set == ref_set
    # avoid unused-variable lint noise while keeping the sanity anchors
    assert np.isfinite(mu) and sd > 0


def test_epoch_shuffle_is_a_permutation_head(sf_unit):
    """Rank column is 1..k, ids exist in the corpus, and the order is the
    md5 hash order (spot-check adjacent pairs)."""
    from metrics_ray.pipelines.clips import clips_dataset
    from metrics_ray.pipelines.queries import (SHUFFLE_EPOCH, SHUFFLE_HEAD,
                                               q_epoch_shuffle)
    from metrics_ray.sketches import md5_lower64

    got = q_epoch_shuffle(sf_unit).to_pandas()
    assert list(got["rank"]) == list(range(1, len(got) + 1))
    assert len(got) == SHUFFLE_HEAD
    keys = md5_lower64([f"{i}:{SHUFFLE_EPOCH}" for i in got["clip_id"]])
    assert (np.diff(keys.astype(np.uint64)) >= 0).all()

    corpus = set()
    for b in clips_dataset(sf_unit, with_audio=False).select_columns(
            ["clip_id"]).iter_batches(batch_format="pyarrow"):
        corpus.update(pa.table(b).column("clip_id").to_pylist())
    assert set(got["clip_id"]).issubset(corpus)


def test_char_entropy_matches_python_reference(sf_unit):
    """q_char_entropy vs a per-row Counter entropy over the same clips:
    identical flagged set AND identical 6-decimal entropy values."""
    from collections import Counter

    import pandas as pd

    from metrics_ray.functions.rounding import round_half_away
    from metrics_ray.pipelines.clips import clips_dataset
    from metrics_ray.pipelines.queries import (CHAR_ENTROPY_MIN,
                                               CHAR_ENTROPY_MIN_CHARS,
                                               q_char_entropy)

    got = q_char_entropy(sf_unit).to_pandas()
    assert len(got) > 0  # discriminative at the unit fixture

    meta = pd.concat([pa.table(b).to_pandas() for b in clips_dataset(
        sf_unit, with_audio=False).select_columns(
        ["clip_id", "transcript"]).iter_batches(batch_format="pyarrow")])
    want = []
    for cid, txt in zip(meta.clip_id, meta.transcript):
        if txt is None or len(txt) < CHAR_ENTROPY_MIN_CHARS:
            continue
        c = np.array(list(Counter(txt).values()), dtype=np.float64)
        n = float(len(txt))
        ent = np.log2(n) - float((c * np.log2(c)).sum()) / n
        if ent < CHAR_ENTROPY_MIN:
            want.append((cid, len(txt),
                         float(round_half_away(np.array([ent]), 6)[0])))
    want_df = pd.DataFrame(want, columns=["clip_id", "n_chars", "entropy"])
    g = got.sort_values(["clip_id", "n_chars"]).reset_index(drop=True)
    w = want_df.sort_values(["clip_id", "n_chars"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w, check_dtype=False)


def test_char_entropy_kernel_unicode():
    """The packed-key entropy kernel path must handle astral codepoints
    (one list entry per CODEPOINT, not per utf-16 unit): a transcript of
    repeated 𝄞 has entropy exactly 0."""
    from collections import Counter

    texts = ["𝄞𝄞𝄞𝄞𝄞𝄞𝄞𝄞𝄞𝄞𝄞𝄞𝄞𝄞𝄞𝄞𝄞𝄞𝄞𝄞", "日本語 テスト 日本語 テスト 日本語"]
    for s in texts:
        codes = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
        assert len(codes) == len(s)
        _, counts = np.unique(codes, return_counts=True)
        c = counts.astype(np.float64)
        n = float(len(s))
        ent = np.log2(n) - float((c * np.log2(c)).sum()) / n
        cc = np.array(list(Counter(s).values()), dtype=np.float64)
        ref = np.log2(n) - float((cc * np.log2(cc)).sum()) / n
        assert abs(ent - ref) < 1e-12
    # the repeated single-codepoint transcript: H == 0 exactly
    s = texts[0]
    cc = np.array(list(Counter(s).values()), dtype=np.float64)
    assert np.log2(len(s)) - (cc * np.log2(cc)).sum() / len(s) == 0.0


def test_payload_size_matches_brute_force(sf_unit):
    """q_payload_size vs a per-row python check over the physical clips:
    identical flagged set, and every truncated uncompressed payload is in
    it (truncation is not maskable — the forced-odd body can never equal
    the even expected length)."""
    import pandas as pd

    from metrics_ray import audio
    from metrics_ray.pipelines.clips import clips_factory, ensure_clips_parquet
    from metrics_ray.pipelines.queries import q_payload_size

    got = q_payload_size(sf_unit).to_pandas()
    assert len(got) > 0

    path = ensure_clips_parquet(sf_unit)
    rows = pd.concat([pa.table(b).to_pandas() for b in clips_factory(path)(
        ["clip_id", "bytes", "sr_hz", "dur_ms"]).iter_batches(
        batch_format="pyarrow")])
    uncompressed = {audio.MAGIC["pcm_s16le"], audio.MAGIC["mp3"]}
    want = []
    for r in rows.itertuples():
        payload = bytes(r.bytes) if r.bytes is not None else b""
        if (len(payload) < 4 or payload[:4] not in uncompressed
                or r.sr_hz <= 0 or r.dur_ms <= 0):
            continue
        exp = 2 * round(int(r.sr_hz) * int(r.dur_ms) / 1000.0)
        act = len(payload) - 4
        if act != exp:
            want.append((r.clip_id, act, exp))
        # oddness invariant: truncated bodies are odd, so any truncated
        # uncompressed payload must be flagged
        if act % 2 == 1:
            assert act != exp
    want_df = pd.DataFrame(
        want, columns=["clip_id", "actual_bytes", "expected_bytes"])
    g = got.sort_values(["clip_id", "actual_bytes"]).reset_index(drop=True)
    w = want_df.sort_values(["clip_id", "actual_bytes"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w, check_dtype=False)


def test_mix_resample_clamp_keeps_everything(sf_unit, monkeypatch):
    """With an epoch larger than the corpus every source hits the f=1
    clamp and the materialized epoch is the whole table (a downsampling
    materialization must never drop rows it was asked to repeat)."""
    from metrics_ray.pipelines import queries as Q
    from metrics_ray.pipelines.clips import clips_dataset

    monkeypatch.setattr(Q, "RESAMPLE_EPOCH_ROWS", 10_000_000)
    got = Q.q_mix_resample(sf_unit)
    total = clips_dataset(sf_unit, with_audio=False).count()
    assert got.num_rows == total


def test_mix_resample_is_a_stable_subset(sf_unit):
    """The kept set is a per-row pure function of clip_id: rerunning
    yields the identical table, and every kept id exists in the corpus."""
    from metrics_ray.pipelines.clips import clips_dataset
    from metrics_ray.pipelines.queries import q_mix_resample

    a = q_mix_resample(sf_unit)
    b = q_mix_resample(sf_unit)
    assert a.equals(b)
    assert 0 < a.num_rows
    corpus = set()
    for blk in clips_dataset(sf_unit, with_audio=False).select_columns(
            ["clip_id"]).iter_batches(batch_format="pyarrow"):
        corpus.update(pa.table(blk).column("clip_id").to_pylist())
    assert set(a.column("clip_id").to_pylist()).issubset(corpus)
    assert a.num_rows < len(corpus)  # the fixture epoch downsamples


def test_auto_batch_size_budget(tmp_path):
    """Byte-budget sizing: rows ~ TARGET_BATCH_BYTES / bytes-per-row,
    clamped; unreadable dirs fall back to the safe default."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from metrics_ray.pipelines.clips import TARGET_BATCH_BYTES, auto_batch_size

    big = pa.table({"clip_id": pa.array([f"c{i}" for i in range(100)]),
                    "bytes": pa.array([b"x" * 100_000] * 100)})
    pq.write_table(big, str(tmp_path / "part.parquet"))
    got = auto_batch_size(str(tmp_path))
    on_disk = (tmp_path / "part.parquet").stat().st_size
    want = int(min(2048, max(16, TARGET_BATCH_BYTES / (on_disk / 100))))
    assert got == want
    assert auto_batch_size(str(tmp_path / "nonexistent")) == 256


def test_footer_profile_aggregates_row_groups_and_files(tmp_path, monkeypatch):
    """q_footer_profile must fold MULTIPLE row groups and MULTIPLE files
    per partition correctly: min of mins, max of maxes, summed row and
    null counts (the sf fixtures write one file per partition, which
    would hide a bad fold)."""
    import os

    import pyarrow.parquet as pq

    import metrics_ray.pipelines.queries as Q

    hive = tmp_path / "hive"
    for part, specs in {
        0: [([("a0", 10, 8000, "x"), ("a1", 500, 16000, None)], 1),
            ([("a2", 7, 48000, "y")], 1)],     # two files
        1: [([("b0", 30, 8000, None), ("b1", 40, 8000, None),
              ("b2", 50, 22050, "z"), ("b3", 60, 44100, "w")], 2)],
    }.items():
        pdir = hive / f"partition={part}"
        os.makedirs(pdir, exist_ok=True)
        for i, (rows, rg_rows) in enumerate(specs):
            t = pa.table({
                "clip_id": pa.array([r[0] for r in rows], pa.string()),
                "dur_ms": pa.array([r[1] for r in rows], pa.int32()),
                "sr_hz": pa.array([r[2] for r in rows], pa.int32()),
                "transcript": pa.array([r[3] for r in rows], pa.string()),
            })
            pq.write_table(t, pdir / f"f{i}.parquet", row_group_size=rg_rows)

    monkeypatch.setattr(
        "metrics_ray.pipelines.clips.ensure_clips_hive",
        lambda sf_dir, **kw: str(hive))
    got = Q.q_footer_profile("unused").to_pylist()
    assert got == [
        {"partition": 0, "n_rows": 3, "dur_min": 7, "dur_max": 500,
         "sr_min": 8000, "sr_max": 48000, "transcript_nulls": 1},
        {"partition": 1, "n_rows": 4, "dur_min": 30, "dur_max": 60,
         "sr_min": 8000, "sr_max": 44100, "transcript_nulls": 2},
    ]

def test_footer_profile_refuses_min_max_less_stats(tmp_path, monkeypatch):
    """Row-group stats that carry only null_count (all-null column →
    has_min_max False) must raise the loud write_statistics guidance
    error, not TypeError from int(None)."""
    import os

    import pyarrow.parquet as pq
    import pytest

    import metrics_ray.pipelines.queries as Q

    hive = tmp_path / "hive"
    pdir = hive / "partition=0"
    os.makedirs(pdir, exist_ok=True)
    t = pa.table({
        "clip_id": pa.array(["a0", "a1"], pa.string()),
        "dur_ms": pa.array([None, None], pa.int32()),  # all-null: no min/max
        "sr_hz": pa.array([8000, 16000], pa.int32()),
        "transcript": pa.array(["x", "y"], pa.string()),
    })
    pq.write_table(t, pdir / "f0.parquet")
    # confirm the fixture really produces min/max-less stats
    st = pq.ParquetFile(pdir / "f0.parquet").metadata.row_group(0) \
        .column(1).statistics
    assert st is not None and not st.has_min_max

    monkeypatch.setattr(
        "metrics_ray.pipelines.clips.ensure_clips_hive",
        lambda sf_dir, **kw: str(hive))
    with pytest.raises(Exception, match="statistics"):
        Q.q_footer_profile("unused")
