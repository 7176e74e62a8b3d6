"""Embedding-operator tests: brute-force kNN correctness vs numpy, exact
near-dup seeded-pair goldens, and LSH recall vs the exact result."""

import numpy as np
import pyarrow.parquet as pq
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")


def _matrix(sf_dir):
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    ids = t.column("vec_id").to_numpy().astype(np.int64)
    E = np.stack([np.asarray(x, dtype=np.float64)
                  for x in t.column("embedding").to_pylist()])
    order = np.argsort(ids)
    return ids[order], E[order]


def test_knn_matches_numpy(sf_unit):
    from metrics_ray.pipelines.embed import KNN_K, N_QUERIES, q_emb_knn

    ids, E = _matrix(sf_unit)
    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    got = q_emb_knn(sf_unit).to_pandas()
    assert len(got) == N_QUERIES * KNN_K

    for qid in range(N_QUERIES):
        sims = np.round(En @ En[ids == qid].ravel(), 6)
        mask = ids != qid
        cand_ids, cand = ids[mask], sims[mask]
        order = np.lexsort((cand_ids, -cand))[:KNN_K]
        sub = got[got.query_id == qid].sort_values("rank")
        assert sub.neighbor_id.tolist() == cand_ids[order].tolist()
        assert sub.cos.to_numpy() == pytest.approx(cand[order], abs=1e-9)


def test_neardup_seeded_pairs(sf_unit):
    from metrics_ray.pipelines.embed import NEAR_OFF, q_emb_neardup

    ids, _ = _matrix(sf_unit)
    seeded = {(int(i), int(i) + NEAR_OFF) for i in ids if i % 11 == 3}
    got = q_emb_neardup(sf_unit).to_pandas()
    pairs = set(zip(got.vec_a, got.vec_b))
    assert seeded <= pairs            # every seeded pair found
    assert (got.cos >= 0.98).all()


def test_lsh_recall(sf_unit):
    from metrics_ray.pipelines.embed import q_emb_neardup, q_emb_neardup_lsh

    exact = q_emb_neardup(sf_unit).to_pandas()
    lsh = q_emb_neardup_lsh(sf_unit).to_pandas()
    e = set(zip(exact.vec_a, exact.vec_b))
    l = set(zip(lsh.vec_a, lsh.vec_b))
    assert l <= e                     # verify step keeps precision exact
    assert len(e & l) / len(e) >= 0.9


def test_norm_check_clean(sf_unit):
    from metrics_ray.pipelines.embed import q_emb_norm_check

    t = q_emb_norm_check(sf_unit).to_pandas()
    assert (t.dim == 64).all()
    assert (t.n_nan == 0).all()
    assert (~t.is_zero).all()


def test_ivf_knn_recall(sf_unit):
    """IVF-probed top-k recall vs exact brute force ≥ 0.9 (4/16 cells
    probed), with identical ordering rules."""
    from metrics_ray.pipelines.embed import q_emb_knn, q_emb_knn_ivf

    exact = q_emb_knn(sf_unit).to_pandas()
    ivf = q_emb_knn_ivf(sf_unit).to_pandas()
    assert set(ivf.query_id) == set(exact.query_id)
    hits = total = 0
    for qid in exact.query_id.unique():
        e = set(exact[exact.query_id == qid].neighbor_id)
        a = set(ivf[ivf.query_id == qid].neighbor_id)
        hits += len(e & a)
        total += len(e)
    assert hits / total >= 0.9


# ------------------------------------------- projection / quantization

def test_project_matches_numpy_recompute_and_jl(sf_unit):
    import numpy as np

    from metrics_ray.pipelines.embed import (
        PROJ_K, _proj_matrix, embeddings_ds, _emb_matrix, q_emb_project)

    from metrics_ray.functions.rounding import round_half_away

    long = q_emb_project(sf_unit).to_pandas()
    got = long.pivot(index="vec_id", columns="k", values="val").sort_index()
    raw = embeddings_ds(sf_unit, ["vec_id", "embedding"]).to_pandas()
    import pyarrow as pa
    t = pa.Table.from_pandas(raw, preserve_index=False)
    m = _emb_matrix(t)
    ids = raw["vec_id"].to_numpy()
    order = np.argsort(ids)
    m, ids = m[order], ids[order]
    want = round_half_away(m @ _proj_matrix(m.shape[1]), 6)
    got_mat = got.to_numpy()
    np.testing.assert_allclose(got_mat, want, atol=1e-9)
    # JL: projected pairwise sq-distances within tolerance of originals
    rng = np.random.default_rng(3)
    i = rng.integers(0, len(ids), 200)
    j = rng.integers(0, len(ids), 200)
    keep = i != j
    d0 = np.sum((m[i[keep]] - m[j[keep]]) ** 2, axis=1)
    d1 = np.sum((got_mat[i[keep]] - got_mat[j[keep]]) ** 2, axis=1)
    ratio = d1 / np.maximum(d0, 1e-12)
    # k=16 → loose epsilon; assert the bulk is preserved
    assert np.median(np.abs(ratio - 1)) < 0.35
    norms = np.sqrt((got_mat ** 2).sum(axis=1))
    assert ((norms >= 0) & (norms <= 2)).all()


def test_quantize_error_bounds(sf_unit):
    import numpy as np
    import pyarrow as pa

    from metrics_ray.pipelines.embed import (
        _emb_matrix, embeddings_ds, q_emb_quantize)

    got = q_emb_quantize(sf_unit).to_pandas()
    raw = embeddings_ds(sf_unit, ["vec_id", "embedding"]).to_pandas()
    t = pa.Table.from_pandas(raw, preserve_index=False)
    m = _emb_matrix(t)
    lo, hi = m.min(axis=0), m.max(axis=0)
    scale = np.where(hi > lo, (hi - lo) / 255.0, 1.0)
    bound = scale.max() / 2 + 1e-9
    assert len(got) == len(raw)
    assert (got["max_abs_err"] <= bound).all()
    assert (got["mse"] <= bound ** 2).all()
    assert (got["mse"] >= 0).all()


def test_kcenter_matches_numpy_greedy_traversal(ray_session):
    """The distributed K-round farthest-point traversal (per-batch argmax
    partials, driver reduce) equals the single-matrix numpy recompute
    exactly — selection order, ids, and distances."""
    import numpy as np
    import pandas as pd

    from metrics_ray.pipelines.embed import KCENTER_K, q_emb_kcenter

    SF = "/root/testdata/sf0.001"
    t = q_emb_kcenter(SF).to_pandas()
    df = pd.read_parquet(f"{SF}/embeddings.parquet",
                         columns=["vec_id", "embedding"]).sort_values("vec_id")
    ids = df["vec_id"].to_numpy()
    M = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    centers, dists = [0], [0.0]
    for _ in range(KCENTER_K - 1):
        d = np.sqrt(((M[:, None, :] - M[centers][None, :, :]) ** 2)
                    .sum(axis=2)).min(axis=1)
        i = np.lexsort((ids, -d))[0]
        centers.append(int(i)); dists.append(float(d[i]))
    assert list(t["vec_id"]) == [int(ids[c]) for c in centers]
    assert np.allclose(t["dist"], np.round(dists, 6), atol=2e-6)
    assert list(t["rank"]) == list(range(KCENTER_K))


def test_emb_norm_check_handles_empty_and_ragged_rows(tmp_path, ray_session):
    """Zero-length embedding rows — the dim violations the check exists
    to flag — must report their OWN zeros, not a neighbor's values (the
    np.add.reduceat repeated-offset trap), including when the last row of
    a batch is empty (the IndexError trap)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from metrics_ray.pipelines.embed import q_emb_norm_check

    t = pa.table({
        "vec_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "embedding": pa.array(
            [[1.0, float("nan")], [], [0.0, 0.0], [2.0], []],
            pa.list_(pa.float64())),
    })
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))
    out = q_emb_norm_check(str(tmp_path)).to_pydict()
    assert out["dim"] == [2, 0, 2, 1, 0]
    assert out["n_nan"] == [1, 0, 0, 0, 0]
    assert out["is_zero"] == [False, True, True, False, True]


def test_hardneg_matches_numpy_and_excludes_query_label(sf_unit):
    """Hard negatives: every reported neighbor carries a label different
    from its query's; the (cos desc, id asc) top-k matches a brute-force
    numpy recompute with the same label mask."""
    from metrics_ray.pipelines.embed import (HARDNEG_K, N_QUERIES,
                                             q_emb_hardneg)

    t = pq.read_table(f"{sf_unit}/embeddings.parquet")
    ids = t.column("vec_id").to_numpy().astype(np.int64)
    labs = t.column("label").to_numpy().astype(np.int64)
    E = np.stack([np.asarray(x, dtype=np.float64)
                  for x in t.column("embedding").to_pylist()])
    En = E / np.linalg.norm(E, axis=1, keepdims=True)

    got = q_emb_hardneg(sf_unit).to_pandas()
    assert len(got) == N_QUERIES * HARDNEG_K

    lab_by_id = dict(zip(ids.tolist(), labs.tolist()))
    for qid in range(N_QUERIES):
        ql = lab_by_id[qid]
        sub = got[got.query_id == qid].sort_values("rank")
        assert (sub.neighbor_label != ql).all()
        sims = np.round(En @ En[ids == qid].ravel(), 6)
        mask = labs != ql
        cand_ids, cand = ids[mask], sims[mask]
        order = np.lexsort((cand_ids, -cand))[:HARDNEG_K]
        assert sub.neighbor_id.tolist() == cand_ids[order].tolist()
        assert sub.cos.to_numpy() == pytest.approx(cand[order], abs=1e-9)


def test_pq_matches_numpy_recompute_and_beats_random_codes(sf_unit):
    """q_emb_pq must equal a straight numpy recompute of the full chain
    (distributed hash-sample training → per-subspace k-means → encode →
    reconstruct), and the learned codebooks must actually help: mean
    reconstruction MSE far below that of seeded random codebooks."""
    import numpy as np
    import pyarrow.parquet as pq

    from metrics_ray.pipelines.embed import (
        PQ_CODEBOOK_K, PQ_SUBSPACES, _emb_matrix, _pq_codebooks,
        _pq_encode, embeddings_ds, q_emb_pq, sample_matrix)
    from metrics_ray.functions.rounding import round_half_away

    got = q_emb_pq(sf_unit)

    # reference: same sample, same k-means, plain numpy end-to-end
    train = sample_matrix(
        embeddings_ds(sf_unit, ["vec_id", "embedding"]), rate_inv=4)
    books = _pq_codebooks(train)
    t = pq.read_table(f"{sf_unit}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    order = np.argsort(t.column("vec_id").to_numpy(zero_copy_only=False))
    t = t.take(order)
    M = _emb_matrix(t)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    codes = _pq_encode(Mn, books)
    deq = np.concatenate(
        [books[s][codes[:, s]] for s in range(PQ_SUBSPACES)], axis=1)
    err = Mn - deq

    assert got.column("vec_id").to_pylist() == \
        t.column("vec_id").to_pylist()
    packed = (codes.astype(np.int64)
              << (4 * np.arange(PQ_SUBSPACES, dtype=np.int64))[None, :]
              ).sum(axis=1)
    assert got.column("codes_packed").to_pylist() == packed.tolist()
    np.testing.assert_array_equal(
        got.column("mse").to_numpy(),
        round_half_away(np.mean(err * err, axis=1), 9))

    # quality: learned codebooks beat seeded random centroid sets by a
    # wide margin (sanity that training actually ran and helps)
    rng = np.random.RandomState(5)
    rand_books = np.stack([
        train[rng.choice(len(train), PQ_CODEBOOK_K, replace=False),
              s * (M.shape[1] // PQ_SUBSPACES):
              (s + 1) * (M.shape[1] // PQ_SUBSPACES)]
        for s in range(PQ_SUBSPACES)])
    rcodes = _pq_encode(Mn, rand_books)
    rdeq = np.concatenate(
        [rand_books[s][rcodes[:, s]] for s in range(PQ_SUBSPACES)], axis=1)
    rmse = np.mean((Mn - rdeq) ** 2)
    assert got.column("mse").to_numpy().mean() < 0.9 * rmse
    # 4 B of codes reconstruct within a usable error envelope
    assert got.column("mse").to_numpy().mean() < 0.01


def test_pq_adc_knn_recall(sf_unit):
    """PQ asymmetric-distance shortlist + exact re-rank: recall vs exact
    brute force ≥ 0.9, and every reported cosine is EXACT (re-ranked),
    so overlapping rows agree with the brute-force values bit-for-bit."""
    from metrics_ray.pipelines.embed import q_emb_knn, q_emb_knn_pq

    exact = q_emb_knn(sf_unit).to_pandas()
    adc = q_emb_knn_pq(sf_unit).to_pandas()
    assert set(adc.query_id) == set(exact.query_id)
    hits = total = 0
    for qid in exact.query_id.unique():
        e = set(exact[exact.query_id == qid].neighbor_id)
        a = set(adc[adc.query_id == qid].neighbor_id)
        hits += len(e & a)
        total += len(e)
    assert hits / total >= 0.9
    merged = adc.merge(exact, on=["query_id", "neighbor_id"],
                       suffixes=("_adc", "_exact"))
    assert (merged.cos_adc == merged.cos_exact).all()


def test_pq_codebook_cache_invalidates_on_regeneration(tmp_path):
    """Regenerating embeddings.parquet IN-PROCESS (same Ray session,
    same sf_dir path) must retrain the PQ codebooks — the memo is keyed
    on a (mtime_ns, size) source fingerprint, not sf_dir alone (round-5
    advisory)."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from metrics_ray.pipelines.embed import _pq_codebooks_for

    d = str(tmp_path)

    def write(seed):
        rng = np.random.default_rng(seed)
        n, dim = 64, 64
        M = rng.normal(size=(n, dim)).astype(np.float32)
        t = pa.table({
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array([r.tolist() for r in M],
                                  pa.list_(pa.float32())),
            "label": pa.array(np.zeros(n, np.int32), pa.int32()),
        })
        pq.write_table(t, os.path.join(d, "embeddings.parquet"))

    write(1)
    books1 = _pq_codebooks_for(d)
    books1_again = _pq_codebooks_for(d)
    assert np.array_equal(books1, books1_again)  # memo hit, same source
    write(2)  # regenerate in-process: mtime/size fingerprint changes
    books2 = _pq_codebooks_for(d)
    assert not np.array_equal(books1, books2), \
        "stale codebooks served after source regeneration"


def test_ann_sql_oracles_hold_on_random_tables(ray_session, tmp_path):
    """The five ANN SQL replays (k-center / LSH / PQ / ADC / IVF) must
    match the engine on a RANDOM embeddings table, not just the driver
    fixture — guards the oracles against testdata regeneration and
    certifies the parity argument (exact integer seeding, engine-order
    float accumulation, deterministic tie-breaks) is data-independent."""
    import os

    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from metrics_ray.pipelines.embed import EMB_QUERIES

    d = str(tmp_path)
    rng = np.random.default_rng(424242)
    n = 300
    M = rng.normal(size=(n, 64)).astype(np.float32)
    # near-dup structure so the LSH/neardup paths emit pairs
    M[280:] = M[:20] + rng.normal(scale=0.01, size=(20, 64)).astype(
        np.float32)
    pq.write_table(pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array([r.tolist() for r in M],
                              pa.list_(pa.float32())),
        "label": pa.array((np.arange(n) % 7).astype(np.int32), pa.int32()),
    }), os.path.join(d, "embeddings.parquet"))

    con = duckdb.connect()
    con.execute("CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{d}/embeddings.parquet')")
    for name in ("emb_kcenter", "emb_neardup_lsh", "emb_pq",
                 "emb_knn_pq", "emb_knn_ivf"):
        fn, sql = EMB_QUERIES[name]
        got = fn(d)
        got = got.to_pandas() if hasattr(got, "to_pandas") else got
        want = con.execute(sql).fetchdf()
        cols = sorted(got.columns)
        g = got[cols].astype(str).sort_values(cols).reset_index(drop=True)
        w = want[cols].astype(str).sort_values(cols).reset_index(drop=True)
        assert len(g) == len(w) and (g.values == w.values).all(), name
        assert len(g) > 0, name
