"""Embedding-column operators over the ``embeddings`` table: vector-schema
validation, brute-force cosine top-k (ANN baseline), exact near-duplicate
detection, and an LSH-bucketed approximate variant (the scale path).

Near-dup runs over a derived VCORPUS = embeddings plus seeded near-identical
copies (vec_id % 11 == 3 → vec_id + 1_000_000 with +0.1 added to the first
component — the vectors are unit-norm, so +0.1 keeps cosine ≈ 0.995, above
the 0.98 threshold), mirrored exactly in SQL so DuckDB's ``list_cosine_similarity``
is the oracle. All similarity math is float64 on both sides; cosines are
rounded to 6 decimals before thresholding/ranking so engine and oracle order
identically.

Scale notes: the query matrix / normalized reference matrix is broadcast
once via ``ray.put`` and read inside each batch task (never re-shipped per
batch); per-batch work is one numpy matmul. Exact all-pairs is O(N·B) per
batch — the LSH variant bounds candidate generation by bucket, which is the
10^12-row path (bucket groupby = hash shuffle of (bucket, vec_id), never
the vectors)."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from ..checks.keyed import cap_group_members, grouped_apply_fast
from ..sketches import hash64
from ..functions.rounding import round_half_away
from ..collect import arrow_refs

NEAR_TAU = 0.98
KNN_K = 5
N_QUERIES = 10
NEAR_OFF = 1_000_000
EMB_DIM = 64  # the embeddings table's declared vector width
_LSH_BITS = 8     # bits per table
_LSH_TABLES = 8   # candidate = same bucket in ANY table
_HYPER = np.random.RandomState(7).standard_normal(
    (_LSH_TABLES * _LSH_BITS, EMB_DIM))


def embeddings_ds(sf_dir: str, columns=None):
    import ray.data as rd

    from ..collect import require_nonempty_parquet

    path = os.path.join(sf_dir, "embeddings.parquet")
    require_nonempty_parquet(path, "embeddings")
    return rd.read_parquet(path, columns=columns)


def _emb_matrix(batch: pa.Table) -> np.ndarray:
    """Arrow list<float> column → (n, d) float64 matrix."""
    col = batch.column("embedding")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.values.to_numpy(zero_copy_only=False).astype(np.float64)
    offs = col.offsets.to_numpy(zero_copy_only=False)
    widths = np.diff(offs)
    if len(widths) == 0:
        # empty block (empty parquet fragment / fully-filtered upstream):
        # a (0, EMB_DIM) matrix keeps downstream matmuls shape-correct
        return np.zeros((0, EMB_DIM))
    if len(set(widths.tolist())) == 1:
        return flat.reshape(len(widths), int(widths[0]))
    # ragged fallback (dim violations): pad with NaN
    d = int(widths.max())
    out = np.full((len(widths), d), np.nan)
    for i, (s, e) in enumerate(zip(offs[:-1], offs[1:])):
        out[i, : e - s] = flat[s:e]
    return out


def derive_vcorpus_batch(batch: pa.Table) -> pa.Table:
    vec_id = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    m = _emb_matrix(batch)
    sel = vec_id % 11 == 3
    pert = m[sel].copy()
    pert[:, 0] += 0.1
    ids = np.concatenate([vec_id, vec_id[sel] + NEAR_OFF])
    mats = np.concatenate([m, pert], axis=0)
    return pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.array(list(mats), pa.list_(pa.float64())),
    })


VCORPUS_SQL = """
vcorpus AS (
    SELECT vec_id,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
    FROM embeddings
    UNION ALL
    SELECT vec_id + 1000000,
           list_prepend(CAST(embedding[1] AS DOUBLE) + 0.1,
                        list_transform(embedding[2:], x -> CAST(x AS DOUBLE)))
    FROM embeddings WHERE vec_id % 11 = 3
)
"""


def _collect(ds, sort_keys) -> pa.Table | None:
    from ..collect import collect_sorted

    return collect_sorted(ds, sort_keys)


# ---------------------------------------------------------- schema validation

def q_emb_norm_check(sf_dir: str) -> pa.Table:
    """Vector-column conformance: dimensionality, NaN presence, zero-norm
    (the embedding-side analog of the clip table's schema/range checks)."""
    def check(b: pa.Table) -> pa.Table:
        col = b.column("embedding")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        dims = np.diff(offs)
        flat = col.values.to_numpy(zero_copy_only=False).astype(np.float64)
        nan_flags = np.isnan(flat)
        # reduceat over NON-EMPTY segments only: plain reduceat returns a
        # NEIGHBOR'S element for a zero-length row (repeated offset) and
        # raises IndexError when the last row is empty — exactly the
        # dim-violation rows this check exists to flag. Restricting the
        # offsets to non-empty rows keeps per-row left-to-right float
        # summation (the oracle's list_sum order); empties get exact 0.
        nz = dims > 0
        n_nan = np.zeros(len(dims), np.int64)
        sumsq = np.zeros(len(dims))
        if nz.any():
            starts = offs[:-1][nz]
            n_nan[nz] = np.add.reduceat(nan_flags.astype(np.int64), starts)
            sumsq[nz] = np.add.reduceat(
                np.where(nan_flags, 0.0, flat * flat), starts)
        return pa.table({
            "vec_id": b.column("vec_id"),
            "dim": pa.array(dims),
            "n_nan": pa.array(n_nan),
            "is_zero": pa.array(sumsq == 0.0),
        })

    return _collect(embeddings_ds(sf_dir, ["vec_id", "embedding"])
                    .map_batches(check, batch_format="pyarrow"), ["vec_id"])


# COALESCE: DuckDB's list_sum([]) is NULL while the engine's sumsq for a
# zero-length embedding is an exact 0.0 (is_zero=True) — without it a
# dim-violation row would hash-mismatch
SQL_EMB_NORM_CHECK = """SELECT vec_id,
       len(embedding) AS dim,
       len(list_filter(embedding, x -> isnan(x))) AS n_nan,
       COALESCE(list_sum(list_transform(embedding,
                x -> CASE WHEN isnan(x) THEN 0.0
                          ELSE CAST(x AS DOUBLE) * CAST(x AS DOUBLE) END)),
                0.0) = 0.0
           AS is_zero
FROM embeddings ORDER BY vec_id"""


# -------------------------------------------------------------- cosine top-k

_TOPK_SCHEMA = pa.schema([
    ("query_id", pa.int64()), ("rank", pa.int64()),
    ("neighbor_id", pa.int64()), ("cos", pa.float64()),
])


def _merge_topk(partial: pa.Table | None) -> pa.Table:
    """Global top-k merge of per-batch partials: (rounded cos DESC,
    neighbor_id ASC) within each query, rank 1..KNN_K. ONE definition of
    the ranking contract, shared by the brute-force and IVF paths; a None
    partial (empty query set / empty corpus) yields an empty typed
    table instead of an AttributeError."""
    if partial is None:
        return _TOPK_SCHEMA.empty_table()
    df = partial.to_pandas()
    df = df.sort_values(["query_id", "cos", "neighbor_id"],
                        ascending=[True, False, True], kind="stable")
    df["rank"] = df.groupby("query_id").cumcount() + 1
    df = df[df["rank"] <= KNN_K].reset_index(drop=True)
    return pa.table({
        "query_id": pa.array(df["query_id"], pa.int64()),
        "rank": pa.array(df["rank"], pa.int64()),
        "neighbor_id": pa.array(df["neighbor_id"], pa.int64()),
        "cos": pa.array(df["cos"], pa.float64()),
    })



def q_emb_knn(sf_dir: str) -> pa.Table:
    """Brute-force cosine top-k: the first N_QUERIES vectors are the query
    set; each batch computes its local similarities against the broadcast
    query matrix and emits its top-k candidates; the driver merges the tiny
    per-batch partials. Rank order: (rounded cos DESC, neighbor_id ASC)."""
    import ray
    import pyarrow.parquet as pq

    qt = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                       columns=["vec_id", "embedding"])
    qsel = qt.filter(pa.compute.less(qt.column("vec_id"), N_QUERIES))
    Q = _emb_matrix(qsel)
    qids = qsel.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    q_ref = ray.put((qids, Qn))

    def topk(b: pa.Table) -> pa.Table:
        q_ids, Qm = ray.get(q_ref)
        M = _emb_matrix(b)
        Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
        ids = b.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        sims = round_half_away(Mn @ Qm.T, 6)  # (n, nq)
        rows_q, rows_n, rows_c = [], [], []
        for j, qid in enumerate(q_ids):
            col = sims[:, j]
            mask = ids != qid
            cand_ids, cand = ids[mask], col[mask]
            k = min(KNN_K, len(cand))
            # partial top-k with deterministic (cos desc, id asc) order
            order = np.lexsort((cand_ids, -cand))[:k]
            rows_q.extend([qid] * k)
            rows_n.extend(cand_ids[order].tolist())
            rows_c.extend(cand[order].tolist())
        return pa.table({
            "query_id": pa.array(rows_q, pa.int64()),
            "neighbor_id": pa.array(rows_n, pa.int64()),
            "cos": pa.array(rows_c, pa.float64()),
        })

    return _merge_topk(_collect(
        embeddings_ds(sf_dir, ["vec_id", "embedding"])
        .map_batches(topk, batch_format="pyarrow"),
        ["query_id", "neighbor_id"]))


SQL_EMB_KNN = f"""WITH q AS (
    SELECT vec_id AS qid, embedding AS qe FROM embeddings
    WHERE vec_id < {N_QUERIES}
),
sims AS (
    SELECT q.qid AS query_id, e.vec_id AS neighbor_id,
           round(list_cosine_similarity(
               list_transform(q.qe, x -> CAST(x AS DOUBLE)),
               list_transform(e.embedding, x -> CAST(x AS DOUBLE))), 6) AS cos
    FROM q, embeddings e WHERE e.vec_id != q.qid
),
ranked AS (
    SELECT query_id, neighbor_id, cos,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cos DESC, neighbor_id) AS rank
    FROM sims
)
SELECT query_id, rank, neighbor_id, cos FROM ranked
WHERE rank <= {KNN_K} ORDER BY query_id, rank"""


# ----------------------------------------------------- hard-negative mining

HARDNEG_K = 3

_HARDNEG_SCHEMA = pa.schema([
    ("query_id", pa.int64()), ("rank", pa.int64()),
    ("neighbor_id", pa.int64()), ("neighbor_label", pa.int64()),
    ("cos", pa.float64()),
])


def q_emb_hardneg(sf_dir: str) -> pa.Table:
    """Hard-negative mining for contrastive training: for each query
    vector, the HARDNEG_K most-similar corpus vectors with a DIFFERENT
    label — the highest-loss negatives a triplet/contrastive loop would
    sample. Same scale shape as q_emb_knn (the broadcast query matrix
    ships once via ray.put; each batch emits its local label-masked
    top-k partial, the driver merges tiny partials), plus the per-batch
    label mask. Rank order: (rounded cos DESC, neighbor_id ASC)."""
    import ray
    import pyarrow.parquet as pq

    qt = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                       columns=["vec_id", "embedding", "label"])
    qsel = qt.filter(pa.compute.less(qt.column("vec_id"), N_QUERIES))
    Q = _emb_matrix(qsel)
    qids = qsel.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    qlabs = qsel.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    q_ref = ray.put((qids, qlabs, Qn))

    def topk(b: pa.Table) -> pa.Table:
        q_ids, q_labs, Qm = ray.get(q_ref)
        M = _emb_matrix(b)
        Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
        ids = b.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        labs = b.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
        sims = round_half_away(Mn @ Qm.T, 6)  # (n, nq)
        rows_q, rows_n, rows_l, rows_c = [], [], [], []
        for j, (qid, ql) in enumerate(zip(q_ids, q_labs)):
            mask = labs != ql  # different label ⇒ never the query itself
            cand_ids, cand_labs = ids[mask], labs[mask]
            cand = sims[mask, j]
            k = min(HARDNEG_K, len(cand_ids))
            order = np.lexsort((cand_ids, -cand))[:k]
            rows_q.extend([qid] * k)
            rows_n.extend(cand_ids[order].tolist())
            rows_l.extend(cand_labs[order].tolist())
            rows_c.extend(cand[order].tolist())
        return pa.table({
            "query_id": pa.array(rows_q, pa.int64()),
            "neighbor_id": pa.array(rows_n, pa.int64()),
            "neighbor_label": pa.array(rows_l, pa.int64()),
            "cos": pa.array(rows_c, pa.float64()),
        })

    partial = _collect(
        embeddings_ds(sf_dir, ["vec_id", "embedding", "label"])
        .map_batches(topk, batch_format="pyarrow"),
        ["query_id", "neighbor_id"])
    if partial is None:
        return _HARDNEG_SCHEMA.empty_table()
    df = partial.to_pandas()
    df = df.sort_values(["query_id", "cos", "neighbor_id"],
                        ascending=[True, False, True], kind="stable")
    df["rank"] = df.groupby("query_id").cumcount() + 1
    df = df[df["rank"] <= HARDNEG_K].reset_index(drop=True)
    return pa.table({
        "query_id": pa.array(df["query_id"], pa.int64()),
        "rank": pa.array(df["rank"], pa.int64()),
        "neighbor_id": pa.array(df["neighbor_id"], pa.int64()),
        "neighbor_label": pa.array(df["neighbor_label"], pa.int64()),
        "cos": pa.array(df["cos"], pa.float64()),
    })


SQL_EMB_HARDNEG = f"""WITH q AS (
    SELECT vec_id AS qid, embedding AS qe, label AS qlab FROM embeddings
    WHERE vec_id < {N_QUERIES}
),
sims AS (
    SELECT q.qid AS query_id, e.vec_id AS neighbor_id,
           CAST(e.label AS BIGINT) AS neighbor_label,
           round(list_cosine_similarity(
               list_transform(q.qe, x -> CAST(x AS DOUBLE)),
               list_transform(e.embedding, x -> CAST(x AS DOUBLE))), 6) AS cos
    FROM q, embeddings e WHERE e.label != q.qlab
),
ranked AS (
    SELECT query_id, neighbor_id, neighbor_label, cos,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cos DESC, neighbor_id) AS rank
    FROM sims
)
SELECT query_id, rank, neighbor_id, neighbor_label, cos FROM ranked
WHERE rank <= {HARDNEG_K} ORDER BY query_id, rank"""


# ------------------------------------------------------------ exact near-dup

from functools import lru_cache


def q_emb_neardup(sf_dir: str) -> pa.Table:
    """Per-process memo shared with q_emb_dup_clusters (same pair
    graph); keyed on the embeddings.parquet fingerprint so in-process
    regeneration invalidates (same class as _pq_codebooks_cached)."""
    return _emb_neardup_impl(sf_dir, _emb_fingerprint(sf_dir))


@lru_cache(maxsize=4)  # pa.Table result is immutable.
def _emb_neardup_impl(sf_dir: str, _fp: tuple) -> pa.Table:
    """Exact cosine near-duplicate pairs over the vcorpus (cos >= tau,
    vec_a < vec_b): per-batch matmul against the broadcast normalized
    corpus matrix. DELIBERATELY the small-scale exact baseline — it is
    the oracle anchor the LSH recall test compares against, and its
    O(N·corpus) broadcast shape does not scale; q_emb_neardup_lsh is the
    production path (bucket-local verify, no corpus broadcast)."""
    import ray
    import ray.data as rd

    # derive + materialize the vcorpus ONCE; the broadcast matrix and the
    # pair scan both consume the in-store blocks (no second parquet scan)
    refs = vcorpus_ds(sf_dir).materialize().to_arrow_refs()
    tables = [t for t in ray.get(refs) if t.num_rows]
    ref = ray.put(corpus_matrix_from_tables(tables))

    def pairs(b: pa.Table) -> pa.Table:
        c_ids, Cn = ray.get(ref)
        M = _emb_matrix(b)
        Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
        ids = b.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        sims = round_half_away(Mn @ Cn.T, 6)
        ai, bj = np.nonzero(sims >= NEAR_TAU)
        a_ids, b_ids = ids[ai], c_ids[bj]
        keep = a_ids < b_ids
        return pa.table({
            "vec_a": pa.array(a_ids[keep], pa.int64()),
            "vec_b": pa.array(b_ids[keep], pa.int64()),
            "cos": pa.array(sims[ai, bj][keep], pa.float64()),
        })

    ds = rd.from_arrow_refs(refs).map_batches(pairs, batch_format="pyarrow")
    out = _collect(ds, ["vec_a", "vec_b"])
    if out is None:
        return pa.table({"vec_a": pa.array([], pa.int64()),
                         "vec_b": pa.array([], pa.int64()),
                         "cos": pa.array([], pa.float64())})
    return out


SQL_EMB_NEARDUP = f"""WITH {VCORPUS_SQL}
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_cosine_similarity(a.emb, b.emb), 6) AS cos
FROM vcorpus a JOIN vcorpus b ON a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(a.emb, b.emb), 6) >= {NEAR_TAU}
ORDER BY vec_a, vec_b"""


def vcorpus_ds(sf_dir: str):
    return embeddings_ds(sf_dir, ["vec_id", "embedding"]).map_batches(
        derive_vcorpus_batch, batch_format="pyarrow")


# Hard ceiling for the exact-baseline corpus broadcast: q_emb_neardup is
# the small-scale oracle anchor by design; refusing loudly above this bound
# prevents it from being pointed at a production corpus by accident (the
# production path is q_emb_neardup_lsh). 2M × 64 float32 ≈ 0.5 GB.
CORPUS_BROADCAST_MAX_ROWS = int(os.environ.get(
    "METRICS_RAY_CORPUS_BCAST_MAX_ROWS", 2_000_000))


def corpus_matrix(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """Materialize the normalized vcorpus matrix for broadcast.

    ONLY the exact O(n·corpus) oracle baseline (q_emb_neardup) uses this —
    it exists to give the approximate paths (LSH, IVF) something exact to
    be measured against, and is inherently bounded to corpora that fit one
    machine (enforced: refuses above CORPUS_BROADCAST_MAX_ROWS). The scale
    paths never call it: LSH verifies inside shuffled buckets, IVF trains
    on a distributed hash-sample (sample_matrix)."""
    import ray

    tables = [t for t in ray.get(arrow_refs(vcorpus_ds(sf_dir)))
              if t.num_rows]
    return corpus_matrix_from_tables(tables)


def corpus_matrix_from_tables(tables: list[pa.Table]
                              ) -> tuple[np.ndarray, np.ndarray]:
    """corpus_matrix over already-collected blocks (lets a caller that
    materialized the vcorpus reuse the blocks instead of re-deriving)."""
    t = pa.concat_tables(tables)
    if t.num_rows > CORPUS_BROADCAST_MAX_ROWS:
        raise ValueError(
            f"corpus_matrix: {t.num_rows} rows exceeds the exact-baseline "
            f"broadcast ceiling ({CORPUS_BROADCAST_MAX_ROWS}). This is the "
            "small-scale oracle anchor; use q_emb_neardup_lsh (bucketed "
            "verify, no broadcast) for production corpora, or raise "
            "METRICS_RAY_CORPUS_BCAST_MAX_ROWS explicitly.")
    ids = t.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    M = _emb_matrix(t)
    order = np.argsort(ids)
    ids, M = ids[order], M[order]
    return ids, M / np.linalg.norm(M, axis=1, keepdims=True)


def sample_matrix(ds, rate_inv: int = 4, seed: int = 0x1F3D) -> np.ndarray:
    """Distributed deterministic sample of an embedding Dataset → small
    normalized (k, d) matrix on the driver.

    Each batch task keeps rows with md5_lower64(f"{vec_id}:{seed}") ≡ 0
    (mod rate_inv) — a seeded 1/rate_inv Bernoulli-by-hash sample
    computed WHERE THE DATA IS; only the sampled vectors come back to
    the driver. Deterministic across runs/block layouts (no RNG),
    mergeable across workers, and the sampling fraction is the knob that
    bounds driver memory at any corpus size (choose rate_inv ≈
    N / target_sample). The hash is the DuckDB-mirrorable
    md5_number_lower (sketches.md5_lower64) — a few µs per TRAINING
    candidate, paid once per training scan — so the sample membership,
    and therefore the whole codebook-training chain built on it
    (SQL_EMB_PQ / SQL_EMB_KNN_PQ), is replayable in the oracle."""
    def samp(b: pa.Table) -> pa.Table:
        from ..sketches import md5_lower64

        ids = b.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        pri = md5_lower64([f"{int(i)}:{seed}" for i in ids])
        keep = np.nonzero(pri % np.uint64(rate_inv) == 0)[0]
        return b.take(pa.array(keep))

    import ray

    tables = [t for t in
              ray.get(arrow_refs(ds.map_batches(samp, batch_format="pyarrow")
                      )) if t.num_rows]
    if not tables:
        raise ValueError(
            f"embedding training sample is EMPTY (1/{rate_inv} hash-sample "
            "matched no rows) — the corpus is too small for this sampling "
            "rate; lower rate_inv or use the full corpus")
    t = pa.concat_tables(tables)
    # canonical vec_id order: block arrival order varies with the worker
    # count/layout, and downstream k-means (seeded init from row
    # positions, per-cell float sums) is order-sensitive — sorting makes
    # the trained centroids partition-invariant
    order = np.argsort(
        t.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64))
    M = _emb_matrix(t)[order]
    return M / np.linalg.norm(M, axis=1, keepdims=True)


# -------------------------------------------------------------- LSH near-dup

def q_emb_neardup_lsh(sf_dir: str) -> pa.Table:
    """Approximate near-dup via multi-table random-hyperplane LSH:
    8 tables × 8 sign bits; a pair is a candidate if it shares a bucket in
    ANY table (miss prob = (1-(1-p)^8)^8 for per-bit flip prob p) → bucket
    groupby with the NORMALIZED VECTOR carried alongside the bucket key →
    exact cosine verify INSIDE the bucket → pair dedupe across tables.

    The 10^12-row path, fully distributed: the shuffle payload is
    (bucket, vec_id, 64×f64 ≈ 0.5 kB) per table row and verification is a
    per-bucket matmul over co-located rows — no driver materialization and
    no whole-corpus broadcast anywhere (round-1's verify read every vector
    from a ray.put of the full corpus matrix). Recall < 1 vs the exact
    baseline by construction (asserted >= 0.9 on the seeded pairs in
    tests), but the ALGORITHM is deterministic: the hyperplanes are a
    fixed seed-derived constant, so SQL_EMB_NEARDUP_LSH embeds them as
    exact literals and replays sign→bucket→in-bucket-verify row for row
    (exact while every bucket stays under the 2000-member sampling cap —
    at gate scale buckets hold ~tens of rows)."""
    def tag(b: pa.Table) -> pa.Table:
        M = _emb_matrix(b)
        Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
        signs = (Mn @ _HYPER.T) > 0  # (n, T*B)
        ids = b.column("vec_id")
        emb = pa.array(list(Mn), pa.list_(pa.float64()))
        tables = []
        weights = 1 << np.arange(_LSH_BITS)
        for t in range(_LSH_TABLES):
            chunk = signs[:, t * _LSH_BITS:(t + 1) * _LSH_BITS]
            bucket = (chunk.dot(weights).astype(np.int64)
                      + (t << np.int64(_LSH_BITS)))
            tables.append(pa.table({"bucket": pa.array(bucket),
                                    "vec_id": ids, "emb": emb}))
        return pa.concat_tables(tables)

    pair_schema = pa.schema([("vec_a", pa.int64()), ("vec_b", pa.int64()),
                             ("cos", pa.float64())])

    def bucket_verified_pairs(df: pd.DataFrame) -> pd.DataFrame:
        size = df.groupby("bucket")["vec_id"].transform("size")
        multi = df[size > 1]
        outs = [pd.DataFrame({"vec_a": pd.Series(dtype="int64"),
                              "vec_b": pd.Series(dtype="int64"),
                              "cos": pd.Series(dtype="float64")})]
        for _, g in multi.groupby("bucket"):
            g = g.sort_values("vec_id", kind="stable")
            ids = g["vec_id"].to_numpy()
            keep = cap_group_members(ids, 2000)  # sample mega-buckets
            ids = ids[keep]
            Mn = np.vstack(g["emb"].to_numpy()[keep])
            ai, bj = np.triu_indices(len(ids), k=1)
            cos = round_half_away(
                np.einsum("ij,ij->i", Mn[ai], Mn[bj]), 6)
            hit = cos >= NEAR_TAU
            outs.append(pd.DataFrame({"vec_a": ids[ai][hit],
                                      "vec_b": ids[bj][hit],
                                      "cos": cos[hit]}))
        return pd.concat(outs, ignore_index=True)

    tagged = vcorpus_ds(sf_dir).map_batches(tag, batch_format="pyarrow")
    out = grouped_apply_fast(
        grouped_apply_fast(tagged, "bucket", bucket_verified_pairs,
                      out_schema=pair_schema),
        ["vec_a", "vec_b"],  # dedupe pairs found in >1 table
        lambda df: df.drop_duplicates(["vec_a", "vec_b"]),
        out_schema=pair_schema)
    res = _collect(out, ["vec_a", "vec_b"])
    if res is None:
        return pa.table({"vec_a": pa.array([], pa.int64()),
                         "vec_b": pa.array([], pa.int64()),
                         "cos": pa.array([], pa.float64())})
    return res


def _hyper_values_sql() -> str:
    """The 64 seed-fixed hyperplanes as (plane, dim, weight) literals.
    repr() emits the shortest round-trip decimal, which DuckDB's
    correctly-rounding parser restores to the identical float64 — the
    oracle sees bit-identical planes."""
    return ", ".join(
        f"({p}, {d}, {_HYPER[p, d]!r})"
        for p in range(_HYPER.shape[0]) for d in range(_HYPER.shape[1]))


# Exact replay of the LSH chain: normalize → 64 plane dots → 8-bit bucket
# per table → same-bucket candidates in ANY table (DISTINCT dedupes the
# multi-table hits, mirroring the second grouped_apply) → exact cosine
# verify at the same rounding/threshold.
SQL_EMB_NEARDUP_LSH = f"""WITH {VCORPUS_SQL},
ex AS (
    SELECT vec_id, generate_subscripts(emb, 1) - 1 AS d,
           CAST(unnest(emb) AS DOUBLE) AS v
    FROM vcorpus
),
nrm AS (SELECT vec_id, sqrt(SUM(v * v)) AS nn FROM ex GROUP BY vec_id),
exn AS (SELECT e.vec_id, e.d, e.v / n.nn AS v
        FROM ex e JOIN nrm n USING (vec_id)),
hp(p, d, w) AS (VALUES {_hyper_values_sql()}),
dots AS (SELECT e.vec_id, h.p, SUM(e.v * h.w) AS dot
         FROM exn e JOIN hp h USING (d) GROUP BY e.vec_id, h.p),
buckets AS (
    SELECT vec_id, p // {_LSH_BITS} AS tbl,
           SUM(CASE WHEN dot > 0 THEN (1 << (p % {_LSH_BITS})) ELSE 0 END)
           + ((p // {_LSH_BITS}) << {_LSH_BITS}) AS bucket
    FROM dots GROUP BY vec_id, p // {_LSH_BITS}
),
cand AS (
    SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
    FROM buckets a JOIN buckets b
      ON a.bucket = b.bucket AND a.vec_id < b.vec_id
),
cosv AS (
    SELECT c.vec_a, c.vec_b, round(SUM(ea.v * eb.v), 6) AS cos
    FROM cand c
    JOIN exn ea ON ea.vec_id = c.vec_a
    JOIN exn eb ON eb.vec_id = c.vec_b AND ea.d = eb.d
    GROUP BY c.vec_a, c.vec_b
)
SELECT vec_a, vec_b, cos FROM cosv WHERE cos >= {NEAR_TAU}
ORDER BY vec_a, vec_b"""


# ------------------------------------------------------------------ IVF ANN

def _seed_indices(n: int, k: int) -> np.ndarray:
    """k evenly spaced row indices over [0, n-1] in EXACT integer
    arithmetic: ((n-1)·j) // (k-1). The float np.linspace(...).astype
    convention this replaces can land 1 ulp below an exact integer and
    truncate differently from an oracle's integer formula — integer
    division makes the k-means seeding bit-identical in both engines."""
    j = np.arange(k, dtype=np.int64)
    return ((n - 1) * j) // (k - 1)


IVF_CELLS = 16
# The synthetic embeddings are ~uniform on the sphere — IVF's worst case
# (neighbors spread over many cells; measured recall at nprobe=4 is ~0.6).
# nprobe=12 reaches ≥0.9 recall here; on clustered real-world embeddings
# the standard nprobe ≈ cells/4 setting applies and the scan fraction
# drops proportionally. The probing/assignment plumbing is identical.
IVF_NPROBE = 12
_KMEANS_ITERS = 10


def _ivf_centroids(Mn: np.ndarray, k: int = IVF_CELLS,
                   iters: int = _KMEANS_ITERS) -> np.ndarray:
    """Deterministic Lloyd k-means over a TRAINING SAMPLE (seeded init
    from evenly spaced rows). Callers pass sample_matrix(...) — a
    distributed hash-sample — so training cost is fixed by the sampling
    rate, independent of corpus size; assignment and probing run
    distributedly against the broadcast centroids."""
    n = len(Mn)
    C = Mn[_seed_indices(n, k)].copy()
    for _ in range(iters):
        assign = np.argmax(Mn @ C.T, axis=1)
        for c in range(k):
            sel = Mn[assign == c]
            if len(sel):
                v = sel.mean(axis=0)
                nrm = np.linalg.norm(v)
                if nrm > 0:
                    C[c] = v / nrm
    return C


def q_emb_knn_ivf(sf_dir: str) -> pa.Table:
    """Approximate top-k via IVF: k-means cells over the corpus, queries
    probe their IVF_NPROBE nearest cells only — each batch task scores its
    rows against the queries whose probe set contains the row's cell
    (broadcast centroids + query matrix; per-batch work is one masked
    matmul). Recall vs exact brute force asserted ≥ 0.9 in
    tests/test_embed.py; the approximate ALGORITHM itself is
    deterministic and fully replayed by SQL_EMB_KNN_IVF (train → cell
    assign → probe → scan)."""
    import ray
    import pyarrow.parquet as pq

    qt = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                       columns=["vec_id", "embedding"])
    qsel = qt.filter(pa.compute.less(qt.column("vec_id"), N_QUERIES))
    Q = _emb_matrix(qsel)
    qids = qsel.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)

    # centroids train on a distributed 1/4 hash-sample of the corpus (the
    # driver never materializes the full matrix). Train on the SAME table
    # the scan reads (embeddings), not the near-dup-augmented vcorpus —
    # the ~9% synthetic perturbed copies would skew cells toward seeded
    # clones, and the derivation pass bought nothing (the PQ paths'
    # convention)
    C = _ivf_centroids(sample_matrix(
        embeddings_ds(sf_dir, ["vec_id", "embedding"]), rate_inv=4))
    # per-query probe set: nearest IVF_NPROBE cells. kind="stable" is
    # load-bearing: equal dots (duplicated centroids — e.g. an empty cell
    # that kept its seed) must resolve lowest-cell-first to match the SQL
    # oracle's ORDER BY dot DESC, c; default quicksort doesn't promise it
    probe = np.argsort(-(Qn @ C.T), axis=1, kind="stable")[:, :IVF_NPROBE]
    ref = ray.put((qids, Qn, C, probe))

    def topk(b: pa.Table) -> pa.Table:
        q_ids, Qm, cents, probes = ray.get(ref)
        M = _emb_matrix(b)
        Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
        ids = b.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        cell = np.argmax(Mn @ cents.T, axis=1)
        sims = round_half_away(Mn @ Qm.T, 6)
        rows_q, rows_n, rows_c = [], [], []
        for j, qid in enumerate(q_ids):
            in_probe = np.isin(cell, probes[j]) & (ids != qid)
            cand_ids, cand = ids[in_probe], sims[in_probe, j]
            k = min(KNN_K, len(cand))
            order = np.lexsort((cand_ids, -cand))[:k]
            rows_q.extend([qid] * k)
            rows_n.extend(cand_ids[order].tolist())
            rows_c.extend(cand[order].tolist())
        return pa.table({
            "query_id": pa.array(rows_q, pa.int64()),
            "neighbor_id": pa.array(rows_n, pa.int64()),
            "cos": pa.array(rows_c, pa.float64()),
        })

    return _merge_topk(_collect(
        embeddings_ds(sf_dir, ["vec_id", "embedding"])
        .map_batches(topk, batch_format="pyarrow"),
        ["query_id", "neighbor_id"]))


def _sql_emb_knn_ivf() -> str:
    """Full IVF replay: the spherical-k-means trainer (argmax-dot
    assignment, mean-then-renormalize update with the engine's
    keep-old-centroid guards), corpus cell assignment, per-query
    top-NPROBE probe sets, probed-cell scan, exact-cosine top-K. Same
    md5 sample / integer seeding / MATERIALIZED conventions as the PQ
    mirrors (see the comment above _pq_kmeans_ctes)."""
    parts = [f"""se AS (
    SELECT vec_id,
           row_number() OVER (ORDER BY vec_id) - 1 AS pt
    FROM embeddings
    WHERE md5_number_lower(CAST(vec_id AS VARCHAR) || ':{0x1F3D}') % 4 = 0
),
sn AS (SELECT COUNT(*) AS n FROM se),
sx AS MATERIALIZED (
    SELECT s.pt, generate_subscripts(e.embedding, 1) - 1 AS d,
           CAST(unnest(e.embedding) AS DOUBLE) AS v
    FROM se s JOIN embeddings e USING (vec_id)
),
snorm AS (SELECT pt, sqrt(SUM(v * v)) AS nn FROM sx GROUP BY pt),
sl AS MATERIALIZED (
    SELECT x.pt, x.d, x.v / m.nn AS v
    FROM sx x JOIN snorm m USING (pt)
),
iv0 AS MATERIALIZED (
    SELECT j.c, sl.d, sl.v
    FROM generate_series(0, {IVF_CELLS - 1}) AS j(c), sn, sl
    WHERE sl.pt = ((sn.n - 1) * j.c) // {IVF_CELLS - 1}
)"""]
    for it in range(_KMEANS_ITERS):
        parts.append(f"""iasg{it} AS MATERIALIZED (
    SELECT pt, c FROM (
        SELECT dt.pt, dt.c,
               row_number() OVER (PARTITION BY dt.pt
                                  ORDER BY dt.dot DESC, dt.c) AS rn
        FROM (
            SELECT p.pt, k.c, SUM(p.v * k.v) AS dot
            FROM sl p JOIN iv{it} k ON p.d = k.d
            GROUP BY p.pt, k.c
        ) dt
    ) WHERE rn = 1
),
im{it} AS MATERIALIZED (
    SELECT a.c, p.d, AVG(p.v) AS mv
    FROM iasg{it} a JOIN sl p ON p.pt = a.pt
    GROUP BY a.c, p.d
),
inm{it} AS (SELECT c, sqrt(SUM(mv * mv)) AS nm FROM im{it} GROUP BY c),
iv{it + 1} AS MATERIALIZED (
    SELECT k.c, k.d,
           CASE WHEN m.mv IS NOT NULL AND n.nm > 0
                THEN m.mv / n.nm ELSE k.v END AS v
    FROM iv{it} k
    LEFT JOIN im{it} m ON m.c = k.c AND m.d = k.d
    LEFT JOIN inm{it} n ON n.c = k.c
)""")
    book = f"iv{_KMEANS_ITERS}"
    parts.append(f"""cx AS MATERIALIZED (
    SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS d,
           CAST(unnest(embedding) AS DOUBLE) AS v
    FROM embeddings
),
cnorm AS (SELECT vec_id, sqrt(SUM(v * v)) AS nn FROM cx GROUP BY vec_id),
cn AS MATERIALIZED (
    SELECT x.vec_id, x.d, x.v / m.nn AS v
    FROM cx x JOIN cnorm m USING (vec_id)
),
ccell AS MATERIALIZED (
    SELECT vec_id, c FROM (
        SELECT dt.vec_id, dt.c,
               row_number() OVER (PARTITION BY dt.vec_id
                                  ORDER BY dt.dot DESC, dt.c) AS rn
        FROM (
            SELECT p.vec_id, k.c, SUM(p.v * k.v) AS dot
            FROM cn p JOIN {book} k ON p.d = k.d
            GROUP BY p.vec_id, k.c
        ) dt
    ) WHERE rn = 1
),
qn AS MATERIALIZED (
    SELECT vec_id AS q, d, v FROM cn WHERE vec_id < {N_QUERIES}
),
probe AS MATERIALIZED (
    SELECT q, c FROM (
        SELECT dt.q, dt.c,
               row_number() OVER (PARTITION BY dt.q
                                  ORDER BY dt.dot DESC, dt.c) AS rn
        FROM (
            SELECT n.q, k.c, SUM(n.v * k.v) AS dot
            FROM qn n JOIN {book} k ON n.d = k.d
            GROUP BY n.q, k.c
        ) dt
    ) WHERE rn <= {IVF_NPROBE}
),
cand AS (
    SELECT p.q, cc.vec_id AS neighbor_id
    FROM probe p JOIN ccell cc ON cc.c = p.c
    WHERE cc.vec_id != p.q
),
cosr AS (
    SELECT s.q, s.neighbor_id, round(SUM(a.v * b.v), 6) AS cos
    FROM cand s
    JOIN qn a ON a.q = s.q
    JOIN cn b ON b.vec_id = s.neighbor_id AND b.d = a.d
    GROUP BY s.q, s.neighbor_id
)""")
    ctes = ",\n".join(parts)
    return f"""WITH {ctes}
SELECT q AS query_id, CAST(rn AS BIGINT) AS rank, neighbor_id, cos FROM (
    SELECT q, neighbor_id, cos,
           row_number() OVER (PARTITION BY q
                              ORDER BY cos DESC, neighbor_id ASC) AS rn
    FROM cosr
) WHERE rn <= {KNN_K} ORDER BY query_id, rank"""


SQL_EMB_KNN_IVF = _sql_emb_knn_ivf()


# ------------------------------------------- semantic dup clusters

def q_emb_dup_clusters(sf_dir: str) -> pa.Table:
    """Semantic-dedup cluster resolution: connected components over the
    exact cosine near-dup pair graph → (vec_id, cluster_id = component
    min); cluster_id == vec_id marks the canonical keep. Completes the
    dedup family (exact / minhash / simhash / embedding) with the same
    consumption format as doc_dup_clusters; the distributed path for
    unbounded dup rates is stages/components.label_propagation (tested
    equivalent on the doc graph). The pair graph is memoized per sf_dir
    (pure function of the input), matching the real-pipeline shape where
    cluster resolution consumes the already-materialized pair stream."""
    from ..stages.components import connected_components_local

    pairs = q_emb_neardup(sf_dir)
    df = connected_components_local(pairs, "vec_a", "vec_b")
    return pa.table({
        "vec_id": pa.array(df["doc_id"], pa.int64()),
        "cluster_id": pa.array(df["cluster_id"], pa.int64()),
    })


SQL_EMB_DUP_CLUSTERS = f"""WITH RECURSIVE {VCORPUS_SQL},
pairs AS (
    SELECT a.vec_id AS u, b.vec_id AS v
    FROM vcorpus a JOIN vcorpus b ON a.vec_id < b.vec_id
    WHERE round(list_cosine_similarity(a.emb, b.emb), 6) >= {NEAR_TAU}
),
edges AS (
    SELECT u, v FROM pairs UNION SELECT v, u FROM pairs
),
reach(node, lbl) AS (
    SELECT u, u FROM edges
    UNION
    SELECT e.v, r.lbl FROM reach r JOIN edges e ON e.u = r.node
)
SELECT node AS vec_id, MIN(lbl) AS cluster_id
FROM reach GROUP BY node ORDER BY vec_id"""


# ---------------------------------------------- projection / quantization

PROJ_K = 16
# Achlioptas sparse-sign JL projection: entries ±1/sqrt(k), fixed seed —
# identical on every worker with zero coordination (no broadcast needed:
# the matrix is a pure function of the seed, rebuilt per actor/task init).
_PROJ_SEED = 13


def _proj_matrix(d: int = EMB_DIM, k: int = PROJ_K) -> np.ndarray:
    signs = np.random.RandomState(_PROJ_SEED).choice(
        [-1.0, 1.0], size=(d, k))
    return signs / np.sqrt(k)


def q_emb_project(sf_dir: str) -> pa.Table:
    """Random-projection dimensionality reduction (64 → PROJ_K dims,
    Achlioptas sign matrix) — the JL compression pass used before
    clustering / ANN at scale.

    Scale shape: row-local (one (B,64)×(64,k) matmul per batch, no
    shuffle, no state); the projection matrix is seed-derived in every
    task rather than shipped. JL distance preservation is asserted in
    tests (pairwise-distance ratio within the JL tolerance for k=16).

    Output is long format (vec_id, k, val): the sign matrix's ±1/√16 =
    ±0.25 entries are exactly representable, so the oracle embeds them
    as literals and recomputes the matmul in SQL — hash-compared, not
    just recall-tested."""
    def project(b: pa.Table) -> pa.Table:
        m = _emb_matrix(b)
        p = round_half_away(m @ _proj_matrix(m.shape[1]), 6)
        n, k = p.shape
        ids = b.column("vec_id").to_numpy(zero_copy_only=False)
        return pa.table({
            "vec_id": pa.array(np.repeat(ids, k), pa.int64()),
            "k": pa.array(np.tile(np.arange(k, dtype=np.int64), n)),
            "val": pa.array(p.reshape(-1), pa.float64()),
        })

    return _collect(
        embeddings_ds(sf_dir, ["vec_id", "embedding"])
        .map_batches(project, batch_format="pyarrow"), ["vec_id", "k"])


def _proj_values_sql() -> str:
    P = _proj_matrix(64)
    return ", ".join(
        f"({d}, {k}, {'0.25' if P[d, k] > 0 else '-0.25'})"
        for d in range(P.shape[0]) for k in range(P.shape[1]))


SQL_EMB_PROJECT = f"""WITH p(d, k, s) AS (VALUES {_proj_values_sql()}),
ex AS (
    SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS d,
           CAST(unnest(embedding) AS DOUBLE) AS v
    FROM embeddings
)
SELECT vec_id, CAST(k AS BIGINT) AS k, round(SUM(v * s), 6) AS val
FROM ex JOIN p USING (d)
GROUP BY vec_id, k ORDER BY vec_id, k"""


def q_emb_quantize(sf_dir: str) -> pa.Table:
    """Int8 scalar quantization with reconstruction-error audit — the
    embedding-compression pass (and its quality check) of a vector-store
    build.

    Scale shape: pass 1 computes per-dimension (min, max) as per-batch
    partials reduced on the driver (64 pairs of floats — constant-size
    state, the extreme case of pre-aggregation); the resulting scale
    vector is closure-broadcast; pass 2 is row-local
    quantize→dequantize→error. Per-dim error is bounded by scale/2,
    asserted per row in tests."""
    import ray

    def minmax(b: pa.Table) -> pa.Table:
        m = _emb_matrix(b)
        if not len(m):  # empty fragment: no partial (min of 0 rows raises)
            return pa.table({"part": pa.array([], pa.int64()),
                             "lo": pa.array([], pa.list_(pa.float64())),
                             "hi": pa.array([], pa.list_(pa.float64()))})
        return pa.table({
            "part": pa.array([0], pa.int64()),
            "lo": pa.array([m.min(axis=0)], pa.list_(pa.float64())),
            "hi": pa.array([m.max(axis=0)], pa.list_(pa.float64())),
        })

    parts = _collect(
        embeddings_ds(sf_dir, ["embedding"])
        .map_batches(minmax, batch_format="pyarrow"), ["part"])
    if parts is None or parts.num_rows == 0:
        return pa.table({"vec_id": pa.array([], pa.int64()),
                         "mse": pa.array([], pa.float64()),
                         "max_abs_err": pa.array([], pa.float64())})
    lo = np.min(np.array(parts.column("lo").to_pylist()), axis=0)
    hi = np.max(np.array(parts.column("hi").to_pylist()), axis=0)
    scale = np.where(hi > lo, (hi - lo) / 255.0, 1.0)
    ref = ray.put((lo, scale))

    def quant(b: pa.Table) -> pa.Table:
        qlo, qscale = ray.get(ref)
        m = _emb_matrix(b)
        # round-half-away (DuckDB ROUND semantics) so the whole
        # quantize→dequantize→error chain is oracle-mirrorable in SQL
        q = np.clip(round_half_away((m - qlo) / qscale, 0),
                    0, 255).astype(np.uint8)
        deq = q.astype(np.float64) * qscale + qlo
        err = m - deq
        return pa.table({
            "vec_id": b.column("vec_id"),
            "mse": pa.array(
                round_half_away(np.mean(err * err, axis=1), 12)),
            "max_abs_err": pa.array(
                round_half_away(np.abs(err).max(axis=1), 9)),
        })

    return _collect(
        embeddings_ds(sf_dir, ["vec_id", "embedding"])
        .map_batches(quant, batch_format="pyarrow"), ["vec_id"])


# Arithmetic mirror of q_emb_quantize: same per-dim (lo, scale), same
# half-away rounding (round_half_away == DuckDB ROUND, property-tested),
# same clip → dequantize → error chain, all in DOUBLE (the engine casts
# the float32 storage to float64 before any arithmetic).
SQL_EMB_QUANTIZE = """WITH ex AS (
    SELECT vec_id,
           generate_subscripts(embedding, 1) AS d,
           CAST(unnest(embedding) AS DOUBLE) AS v
    FROM embeddings
), s AS (
    SELECT d, min(v) AS lo,
           CASE WHEN max(v) > min(v)
                THEN (max(v) - min(v)) / 255.0 ELSE 1.0 END AS scale
    FROM ex GROUP BY d
), err AS (
    SELECT vec_id,
           v - (LEAST(GREATEST(round((v - lo) / scale, 0), 0), 255)
                * scale + lo) AS e
    FROM ex JOIN s USING (d)
)
SELECT vec_id, round(avg(e * e), 12) AS mse,
       round(max(abs(e)), 9) AS max_abs_err
FROM err GROUP BY vec_id ORDER BY vec_id"""


PQ_SUBSPACES = 8    # 64 dims → 8 subvectors of 8 dims
PQ_CODEBOOK_K = 16  # 16 centroids per subspace → 4-bit codes, 4 B/vector


def _pq_codebooks(M: np.ndarray, m: int = PQ_SUBSPACES,
                  k: int = PQ_CODEBOOK_K,
                  iters: int = _KMEANS_ITERS) -> np.ndarray:
    """Deterministic per-subspace Lloyd k-means over a TRAINING SAMPLE
    (seeded init from evenly spaced rows — same convention as
    _ivf_centroids, so training is partition-invariant given
    sample_matrix's canonical vec_id ordering). Returns (m, k, d/m)."""
    d = M.shape[1]
    sub = d // m
    books = []
    for s in range(m):
        X = M[:, s * sub:(s + 1) * sub]
        C = X[_seed_indices(len(X), k)].copy()
        for _ in range(iters):
            d2 = (C * C).sum(axis=1)[None, :] - 2.0 * (X @ C.T)
            assign = np.argmin(d2, axis=1)
            for c in range(k):
                sel = X[assign == c]
                if len(sel):
                    C[c] = sel.mean(axis=0)
        books.append(C)
    return np.stack(books)


def _emb_fingerprint(sf_dir: str) -> tuple:
    """Cheap (mtime_ns, size) fingerprint of embeddings.parquet — memo
    keys include it so regenerating the table IN-PROCESS within one Ray
    session invalidates cached codebooks instead of serving stale ones
    (mirrors queries.py:_sf_fingerprint)."""
    p = os.path.join(sf_dir, "embeddings.parquet")
    try:
        st = os.stat(p)
        return (st.st_mtime_ns, st.st_size)
    except OSError:
        return (0, 0)


def _pq_codebooks_for(sf_dir: str) -> np.ndarray:
    """Session-memoized PQ codebooks per sf_dir: q_emb_pq and
    q_emb_knn_pq train the SAME deterministic books — one sampling scan
    + one k-means per (sf_dir, source fingerprint, session), not one per
    query (the q_emb_neardup memo precedent)."""
    from .. import ray_session_tag

    return _pq_codebooks_cached(sf_dir, _emb_fingerprint(sf_dir),
                                ray_session_tag()).copy()


from functools import lru_cache as _lru  # noqa: E402


@_lru(maxsize=4)
def _pq_codebooks_cached(sf_dir: str, _fp: tuple,
                         _session: str) -> np.ndarray:
    return _pq_codebooks(sample_matrix(
        embeddings_ds(sf_dir, ["vec_id", "embedding"]), rate_inv=4))


def _pq_encode(Mn: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, d) → (n, m) uint8 codes: per-subspace nearest centroid."""
    m, _k, sub = books.shape
    codes = np.empty((len(Mn), m), dtype=np.uint8)
    for s in range(m):
        X = Mn[:, s * sub:(s + 1) * sub]
        C = books[s]
        d2 = (C * C).sum(axis=1)[None, :] - 2.0 * (X @ C.T)
        codes[:, s] = np.argmin(d2, axis=1).astype(np.uint8)
    return codes


def q_emb_pq(sf_dir: str) -> pa.Table:
    """Product quantization — the ANN-scale compression standard (64-dim
    float32 → 8 four-bit codes ≈ 4 B/vector, 64× smaller than float32)
    with a per-row reconstruction audit, completing the compression
    family next to the int8 scalar quantizer (q_emb_quantize) and the JL
    projection (q_emb_project).

    Scale shape (the IVF pattern): codebooks train on sample_matrix's
    distributed hash-sample (driver cost fixed by the sampling rate,
    independent of corpus size), broadcast once via ray.put; encoding +
    reconstruction is one row-local pass (per-batch matmuls per
    subspace). Codes ship as ONE packed int64 (8 × 4-bit codes — the
    literal storage layout the 4 B/vector claim describes). Oracle:
    the whole train→encode→reconstruct chain is replayed in SQL
    (SQL_EMB_PQ — md5-mirrorable sample, integer-exact seeding,
    chained-CTE Lloyd iterations); the golden test additionally
    recomputes it in numpy, asserts PQ's mean error beats the scalar
    quantizer's worst case, and the invariance sweep certifies
    cross-cpu determinism."""
    import ray

    books = _pq_codebooks_for(sf_dir)
    ref = ray.put(books)

    def encode(b: pa.Table) -> pa.Table:
        bk = ray.get(ref)
        M = _emb_matrix(b)
        Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
        codes = _pq_encode(Mn, bk)
        m, _k, sub = bk.shape
        deq = np.concatenate(
            [bk[s][codes[:, s]] for s in range(m)], axis=1)
        err = Mn - deq
        packed = (codes.astype(np.int64)
                  << (4 * np.arange(m, dtype=np.int64))[None, :]).sum(axis=1)
        return pa.table({
            "vec_id": b.column("vec_id"),
            "codes_packed": pa.array(packed, pa.int64()),
            "mse": pa.array(
                round_half_away(np.mean(err * err, axis=1), 9)),
            "max_abs_err": pa.array(
                round_half_away(np.abs(err).max(axis=1), 9)),
        })

    return _collect(
        embeddings_ds(sf_dir, ["vec_id", "embedding"])
        .map_batches(encode, batch_format="pyarrow"), ["vec_id"])


# ---- SQL mirrors of the full PQ chain --------------------------------
# The oracle replays train → encode → reconstruct end-to-end:
#   sample    md5_number_lower(vec_id || ':seed') % 4 = 0 — the identical
#             membership sample_matrix computes (md5_lower64 ==
#             md5_number_lower is pinned by tests/test_properties.py)
#   seeding   ((n-1)·j) // (k-1) over the vec_id-sorted sample — the
#             integer-exact _seed_indices formula
#   Lloyd     _KMEANS_ITERS chained MATERIALIZED CTEs; the same
#             |c|² − 2⟨x,c⟩ argmin (ties → lower centroid id, matching
#             np.argmin) and AVG update with COALESCE for empty cells
#   encode    same argmin over the full corpus; codes packed to ONE
#             int64 exactly as the engine packs them
# Float sums differ from BLAS only in association order (~1e-16);
# discrete divergence would need a k-means/encode argmin tie within
# ~1e-14, and the 9-dp output rounding keeps boundary collisions at the
# same negligible level the emb_quantize oracle has run green on.
# MATERIALIZED is load-bearing twice over: inlined CTEs re-open the
# parquet per reference (fd exhaustion) and re-run the k-means chain
# per consumer.

def _pq_kmeans_ctes() -> tuple[str, str]:
    """Shared CTE chunk (sample → normalize → seed → Lloyd iterations →
    corpus encode); returns (cte_sql, final_codebook_name)."""
    sub = EMB_DIM // PQ_SUBSPACES
    parts = [f"""se AS (
    SELECT vec_id,
           row_number() OVER (ORDER BY vec_id) - 1 AS pt
    FROM embeddings
    WHERE md5_number_lower(CAST(vec_id AS VARCHAR) || ':{0x1F3D}') % 4 = 0
),
sn AS (SELECT COUNT(*) AS n FROM se),
sx AS MATERIALIZED (
    SELECT s.pt, generate_subscripts(e.embedding, 1) - 1 AS d,
           CAST(unnest(e.embedding) AS DOUBLE) AS v
    FROM se s JOIN embeddings e USING (vec_id)
),
snorm AS (SELECT pt, sqrt(SUM(v * v)) AS nn FROM sx GROUP BY pt),
sl AS MATERIALIZED (
    SELECT x.pt, x.d // {sub} AS s, x.d % {sub} AS dm, x.v / m.nn AS v
    FROM sx x JOIN snorm m USING (pt)
),
km0 AS MATERIALIZED (
    SELECT sl.s, j.c, sl.dm, sl.v
    FROM generate_series(0, {PQ_CODEBOOK_K - 1}) AS j(c), sn, sl
    WHERE sl.pt = ((sn.n - 1) * j.c) // {PQ_CODEBOOK_K - 1}
)"""]
    for it in range(_KMEANS_ITERS):
        parts.append(f"""asg{it} AS MATERIALIZED (
    SELECT s, pt, c FROM (
        SELECT d2.s, d2.pt, d2.c,
               row_number() OVER (PARTITION BY d2.s, d2.pt
                                  ORDER BY d2.d2, d2.c) AS rn
        FROM (
            SELECT k.s, p.pt, k.c,
                   SUM(k.v * k.v) - 2 * SUM(p.v * k.v) AS d2
            FROM sl p JOIN km{it} k ON p.s = k.s AND p.dm = k.dm
            GROUP BY k.s, p.pt, k.c
        ) d2
    ) WHERE rn = 1
),
km{it + 1} AS MATERIALIZED (
    SELECT k.s, k.c, k.dm, COALESCE(m.mv, k.v) AS v
    FROM km{it} k LEFT JOIN (
        SELECT a.s, a.c, p.dm, AVG(p.v) AS mv
        FROM asg{it} a JOIN sl p ON p.s = a.s AND p.pt = a.pt
        GROUP BY a.s, a.c, p.dm
    ) m ON m.s = k.s AND m.c = k.c AND m.dm = k.dm
)""")
    book = f"km{_KMEANS_ITERS}"
    parts.append(f"""cx AS MATERIALIZED (
    SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS d,
           CAST(unnest(embedding) AS DOUBLE) AS v
    FROM embeddings
),
cnorm AS (SELECT vec_id, sqrt(SUM(v * v)) AS nn FROM cx GROUP BY vec_id),
cl AS MATERIALIZED (
    SELECT x.vec_id, x.d // {sub} AS s, x.d % {sub} AS dm, x.v / m.nn AS v
    FROM cx x JOIN cnorm m USING (vec_id)
),
casg AS MATERIALIZED (
    SELECT s, vec_id, c FROM (
        SELECT d2.s, d2.vec_id, d2.c,
               row_number() OVER (PARTITION BY d2.s, d2.vec_id
                                  ORDER BY d2.d2, d2.c) AS rn
        FROM (
            SELECT k.s, p.vec_id, k.c,
                   SUM(k.v * k.v) - 2 * SUM(p.v * k.v) AS d2
            FROM cl p JOIN {book} k ON p.s = k.s AND p.dm = k.dm
            GROUP BY k.s, p.vec_id, k.c
        ) d2
    ) WHERE rn = 1
)""")
    return ",\n".join(parts), book


def _sql_emb_pq() -> str:
    ctes, book = _pq_kmeans_ctes()
    return f"""WITH {ctes},
err AS (
    SELECT p.vec_id, p.v - k.v AS e
    FROM cl p
    JOIN casg a ON a.vec_id = p.vec_id AND a.s = p.s
    JOIN {book} k ON k.s = p.s AND k.c = a.c AND k.dm = p.dm
),
packed AS (
    SELECT vec_id,
           CAST(SUM(c * (1::BIGINT << (4 * s))) AS BIGINT) AS codes_packed
    FROM casg GROUP BY vec_id
)
SELECT e.vec_id, p.codes_packed,
       round(AVG(e.e * e.e), 9) AS mse,
       round(MAX(ABS(e.e)), 9) AS max_abs_err
FROM err e JOIN packed p USING (vec_id)
GROUP BY e.vec_id, p.codes_packed ORDER BY e.vec_id"""


SQL_EMB_PQ = _sql_emb_pq()


# Global ADC shortlist width = PQ_SHORTLIST × KNN_K. Like IVF_NPROBE, sized
# for the synthetic ~uniform-sphere embeddings (PQ's worst case: 4-byte
# codes rank a diffuse neighborhood coarsely — measured recall@5 on the
# fixture: 0.52 at S=20, 0.88 at S=100, 0.98 at S=200); clustered
# real-world embeddings need far smaller S. S is a CONSTANT per query —
# at the 10^12-row design point the shortlist is noise next to the scan.
PQ_SHORTLIST = 40


def q_emb_knn_pq(sf_dir: str) -> pa.Table:
    """Approximate top-k via PQ asymmetric distance (ADC) with exact
    re-rank — the standard product-quantization search architecture:
    each batch scores its rows against every query USING ONLY THE 4-BYTE
    CODES (one table lookup + add per subspace — the compute shape that
    lets a scan touch 64× less memory than float32), keeps an ADC
    shortlist of PQ_SHORTLIST×K rows per query, and re-ranks just the
    shortlist with exact dots. The shortlist is the GLOBAL ADC top-S per
    query: each batch emits its local ADC top-S partials and the driver
    reduces them — a member of the global top-S is in the top-S of every
    subset containing it, so per-batch partials are a guaranteed
    superset — which makes the result independent of block layout / cpu
    count (a per-physical-batch-only shortlist would not be; certified
    by the invariance sweep). Recall loss occurs only when a true top-K
    row falls outside the global ADC shortlist; asserted ≥0.9 vs the
    exact brute force (q_emb_knn) in tests — the IVF path's contract.

    Scale shape: codebooks from the distributed hash-sample, broadcast
    once with the per-query lookup tables (nq × m × k floats); per-batch
    work is one encode + nq table-gathers; driver merges
    O(batches × queries × S) partials, never the corpus."""
    import pyarrow.parquet as pq
    import ray

    qt = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                       columns=["vec_id", "embedding"])
    qsel = qt.filter(pa.compute.less(qt.column("vec_id"), N_QUERIES))
    Q = _emb_matrix(qsel)
    qids = qsel.column("vec_id").to_numpy(zero_copy_only=False).astype(
        np.int64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)

    books = _pq_codebooks_for(sf_dir)
    m, k, sub = books.shape
    # ADC tables: T[q, s, c] = <query subvector s, codebook s centroid c>
    T = np.einsum("qsd,skd->qsk",
                  Qn.reshape(len(Qn), m, sub), books)
    ref = ray.put((qids, Qn, books, T))

    def topk(b: pa.Table) -> pa.Table:
        q_ids, Qm, bk, tab = ray.get(ref)
        M = _emb_matrix(b)
        Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
        ids = b.column("vec_id").to_numpy(zero_copy_only=False).astype(
            np.int64)
        codes = _pq_encode(Mn, bk)
        # adc[n, q] = sum_s tab[q, s, codes[n, s]]
        adc = np.zeros((len(Mn), len(q_ids)))
        for s in range(bk.shape[0]):
            adc += tab[:, s, :][:, codes[:, s]].T
        shortlist = PQ_SHORTLIST * KNN_K
        rows_q, rows_n, rows_a, rows_c = [], [], [], []
        for j, qid in enumerate(q_ids):
            cand_idx = np.nonzero(ids != qid)[0]
            if not len(cand_idx):
                continue
            # local ADC top-S partial (ties: neighbor_id asc) — a
            # guaranteed superset of this batch's members of the global
            # ADC top-S, so the driver reduce below is layout-invariant
            s_adc = adc[cand_idx, j]
            order = np.lexsort((ids[cand_idx], -s_adc))[:shortlist]
            top = cand_idx[order]
            exact = round_half_away(Mn[top] @ Qm[j], 6)
            rows_q.extend([qid] * len(top))
            rows_n.extend(ids[top].tolist())
            rows_a.extend(s_adc[order].tolist())
            rows_c.extend(exact.tolist())
        return pa.table({
            "query_id": pa.array(rows_q, pa.int64()),
            "neighbor_id": pa.array(rows_n, pa.int64()),
            "adc": pa.array(rows_a, pa.float64()),
            "cos": pa.array(rows_c, pa.float64()),
        })

    parts = _collect(
        embeddings_ds(sf_dir, ["vec_id", "embedding"])
        .map_batches(topk, batch_format="pyarrow"),
        ["query_id", "neighbor_id"])
    if parts is None:
        return _TOPK_SCHEMA.empty_table()
    df = parts.to_pandas()
    # global ADC shortlist per query (adc desc, neighbor asc), then exact
    # re-rank of the shortlist (cos desc, neighbor asc) — same output
    # schema as the rest of the knn family (rank included)
    df = (df.sort_values(["query_id", "adc", "neighbor_id"],
                         ascending=[True, False, True], kind="stable")
          .groupby("query_id", sort=True).head(PQ_SHORTLIST * KNN_K))
    df = (df.sort_values(["query_id", "cos", "neighbor_id"],
                         ascending=[True, False, True], kind="stable")
          .groupby("query_id", sort=True).head(KNN_K)
          .reset_index(drop=True))
    rank = df.groupby("query_id", sort=False).cumcount() + 1
    return pa.table({
        "query_id": pa.array(df["query_id"].to_numpy(), pa.int64()),
        "rank": pa.array(rank.to_numpy(np.int64)),
        "neighbor_id": pa.array(df["neighbor_id"].to_numpy(), pa.int64()),
        "cos": pa.array(df["cos"].to_numpy(), pa.float64()),
    })


def _sql_emb_knn_pq() -> str:
    """ADC mirror: per-query lookup tables from the SQL-trained books,
    the 8 per-subspace terms pivoted to columns and added LEFT TO RIGHT
    (the exact accumulation order of the engine's `adc += tab_s` loop,
    so identical-code neighbors tie EXACTLY and the neighbor_id
    tie-break is deterministic on both sides), global top-S shortlist,
    exact-cosine re-rank."""
    sub = EMB_DIM // PQ_SUBSPACES
    ctes, book = _pq_kmeans_ctes()
    addchain = "(((((((m0 + m1) + m2) + m3) + m4) + m5) + m6) + m7)"
    pivot = ", ".join(
        f"MAX(CASE WHEN a.s = {s} THEN t.tv END) AS m{s}"
        for s in range(PQ_SUBSPACES))
    return f"""WITH {ctes},
cn AS MATERIALIZED (
    SELECT x.vec_id, x.d, x.v / m.nn AS v
    FROM cx x JOIN cnorm m USING (vec_id)
),
qn AS MATERIALIZED (
    SELECT vec_id AS q, d, v FROM cn WHERE vec_id < {N_QUERIES}
),
tq AS MATERIALIZED (
    SELECT n.q, k.s, k.c, SUM(n.v * k.v) AS tv
    FROM qn n JOIN {book} k
      ON n.d // {sub} = k.s AND n.d % {sub} = k.dm
    GROUP BY n.q, k.s, k.c
),
adcp AS MATERIALIZED (
    SELECT t.q, a.vec_id AS neighbor_id, {pivot}
    FROM casg a JOIN tq t ON t.s = a.s AND t.c = a.c
    WHERE a.vec_id != t.q
    GROUP BY t.q, a.vec_id
),
short AS MATERIALIZED (
    SELECT q, neighbor_id FROM (
        SELECT q, neighbor_id,
               row_number() OVER (PARTITION BY q
                                  ORDER BY {addchain} DESC,
                                           neighbor_id ASC) AS rn
        FROM adcp
    ) WHERE rn <= {PQ_SHORTLIST * KNN_K}
),
cosr AS (
    SELECT s.q, s.neighbor_id, round(SUM(a.v * b.v), 6) AS cos
    FROM short s
    JOIN qn a ON a.q = s.q
    JOIN cn b ON b.vec_id = s.neighbor_id AND b.d = a.d
    GROUP BY s.q, s.neighbor_id
)
SELECT q AS query_id, CAST(rn AS BIGINT) AS rank, neighbor_id, cos FROM (
    SELECT q, neighbor_id, cos,
           row_number() OVER (PARTITION BY q
                              ORDER BY cos DESC, neighbor_id ASC) AS rn
    FROM cosr
) WHERE rn <= {KNN_K} ORDER BY query_id, rank"""


SQL_EMB_KNN_PQ = _sql_emb_knn_pq()


def q_emb_drift(sf_dir: str) -> pa.Table:
    """Embedding-space centroid drift: cosine between the mean vectors of
    the two dataset halves (vec_id parity) — the vector sibling of the
    dur_ms/codec PSI drift family (DriftCheck's baseline-vs-observed
    comparison applied to an embedding column). cos≈1 means no drift.

    Scale shape: per-batch (side, dim, partial_sum, n) rows — 2×d rows
    per batch regardless of batch size (the combiner), one tiny
    groupby-sum, d-dim driver math. Cosine of SUM vectors == cosine of
    MEAN vectors (positive scaling invariance), so no division happens
    before the merge — bitwise-stable under any batch layout."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        vec_id = b.column("vec_id").to_numpy(zero_copy_only=False).astype(
            np.int64)
        m = _emb_matrix(b).astype(np.float64)
        rows = {"side": [], "dim": [], "s": [], "n": []}
        for side in (0, 1):
            sel = (vec_id % 2) == side
            if not sel.any():
                continue
            s = m[sel].sum(axis=0)
            rows["side"].extend([side] * m.shape[1])
            rows["dim"].extend(range(1, m.shape[1] + 1))
            rows["s"].extend(s.tolist())
            rows["n"].extend([int(sel.sum())] * m.shape[1])
        return pa.table({
            "side": pa.array(rows["side"], pa.int64()),
            "dim": pa.array(rows["dim"], pa.int64()),
            "s": pa.array(rows["s"], pa.float64()),
            "n": pa.array(rows["n"], pa.int64()),
        })

    out = (embeddings_ds(sf_dir, ["vec_id", "embedding"])
           .map_batches(partial, batch_format="pyarrow")
           .groupby(["side", "dim"])
           .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n")))
    df = out.to_pandas().sort_values(["side", "dim"]).reset_index(drop=True)
    sb = df[df["side"] == 0]["s"].to_numpy(np.float64)
    sc = df[df["side"] == 1]["s"].to_numpy(np.float64)
    nb = int(df[df["side"] == 0]["n"].max()) if (df["side"] == 0).any() else 0
    nc = int(df[df["side"] == 1]["n"].max()) if (df["side"] == 1).any() else 0
    denom = np.sqrt((sb * sb).sum()) * np.sqrt((sc * sc).sum())
    cos = float((sb * sc).sum() / denom) if denom else 0.0
    return pa.table({
        "n_base": pa.array([nb], pa.int64()),
        "n_cur": pa.array([nc], pa.int64()),
        "cos_means": pa.array([round_half_away(cos, 6)], pa.float64()),
    })


SQL_EMB_DRIFT = """WITH dims AS (
    SELECT vec_id % 2 AS side, i AS dim,
           CAST(embedding[i] AS DOUBLE) AS v
    FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
), sums AS (
    SELECT side, dim, SUM(v) AS s, COUNT(*) AS n FROM dims GROUP BY side, dim
)
SELECT CAST((SELECT MAX(n) FROM sums WHERE side = 0) AS BIGINT) AS n_base,
       CAST((SELECT MAX(n) FROM sums WHERE side = 1) AS BIGINT) AS n_cur,
       round(SUM(a.s * b.s) /
             (sqrt(SUM(a.s * a.s)) * sqrt(SUM(b.s * b.s))), 6) AS cos_means
FROM sums a JOIN sums b USING (dim) WHERE a.side = 0 AND b.side = 1"""


KCENTER_K = 8


def q_emb_kcenter(sf_dir: str) -> pa.Table:
    """Diversity coreset selection: greedy k-center (farthest-point
    traversal) over the embedding column — the data-pruning selection
    step that picks K maximally-spread representatives. Deterministic:
    seeded at the min vec_id, ties broken by min vec_id.

    Scale shape: K rounds, each ONE streaming pass — the current center
    set (K × d floats) broadcasts via ray.put; every batch computes its
    rows' distance to the nearest center (one matmul) and emits a single
    (vec_id, dist) argmax PARTIAL; the driver reduces O(batches) partials
    to the next center. Nothing but K×d floats and per-batch argmax rows
    ever move. (At 10^12 rows real deployments seed from a pre-sampled
    candidate pool to cut rounds — same plan per round.) Oracle: the
    greedy traversal IS SQL-expressible as a recursive CTE carrying the
    chosen-center list (SQL_EMB_KCENTER) — same seed, same Euclidean
    argmax, same dist-DESC/vec_id-ASC tie-break; the golden test
    additionally recomputes the full traversal in numpy."""
    import ray
    import ray.data as rd

    # materialize the (vec_id, embedding) blocks ONCE — the K rounds then
    # stream from the object store instead of re-reading + re-projecting
    # the parquet K times (from_arrow_refs breaks lineage so each round's
    # map_batches starts from the in-store blocks)
    _refs = embeddings_ds(sf_dir, ["vec_id", "embedding"]) \
        .materialize().to_arrow_refs()

    def cols_ds():
        return rd.from_arrow_refs(_refs)

    cols = cols_ds()

    def seed_partial(b: pa.Table) -> pa.Table:
        ids = b.column("vec_id").to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "vec": pa.array([], pa.list_(pa.float64()))})
        i = int(np.argmin(ids))
        m = _emb_matrix(b)
        return pa.table({
            "vec_id": pa.array([int(ids[i])], pa.int64()),
            "vec": pa.array([list(map(float, m[i]))],
                            pa.list_(pa.float64())),
        })

    parts = [t for t in ray.get(arrow_refs(cols.map_batches(
        seed_partial, batch_format="pyarrow")))
        if t.num_rows and "vec" in t.schema.names]
    cand = pa.concat_tables(parts).to_pandas().sort_values("vec_id")
    centers = [(int(cand["vec_id"].iloc[0]),
                np.array(cand["vec"].iloc[0], dtype=np.float64))]
    dists = [0.0]

    for _ in range(KCENTER_K - 1):
        c_mat = np.stack([c[1] for c in centers])
        ref = ray.put(c_mat)

        def far_partial(b: pa.Table) -> pa.Table:
            cm = ray.get(ref)
            ids = b.column("vec_id").to_numpy(zero_copy_only=False)
            if len(ids) == 0:
                return pa.table({"vec_id": pa.array([], pa.int64()),
                                 "dist": pa.array([], pa.float64()),
                                 "vec": pa.array([],
                                                 pa.list_(pa.float64()))})
            m = _emb_matrix(b)
            # min Euclidean distance to any current center, per row
            d2 = ((m[:, None, :] - cm[None, :, :]) ** 2).sum(axis=2)
            dmin = np.sqrt(d2.min(axis=1))
            # deterministic batch argmax: max dist, tie -> min vec_id;
            # the partial CARRIES the winning vector (d floats) so the
            # round needs no second fetch pass
            order = np.lexsort((ids, -dmin))
            i = order[0]
            return pa.table({
                "vec_id": pa.array([int(ids[i])], pa.int64()),
                "dist": pa.array([float(dmin[i])], pa.float64()),
                "vec": pa.array([list(map(float, m[i]))],
                                pa.list_(pa.float64())),
            })

        parts = [t.to_pandas() for t in ray.get(arrow_refs(
            cols_ds().map_batches(far_partial, batch_format="pyarrow")))
            if t.num_rows and "dist" in t.schema.names]
        best = (pd.concat(parts, ignore_index=True)
                .sort_values(["dist", "vec_id"], ascending=[False, True])
                .iloc[0])
        centers.append((int(best["vec_id"]),
                        np.array(best["vec"], dtype=np.float64)))
        dists.append(float(best["dist"]))

    return pa.table({
        "rank": pa.array(list(range(len(centers))), pa.int64()),
        "vec_id": pa.array([c[0] for c in centers], pa.int64()),
        "dist": pa.array(round_half_away(np.array(dists), 6), pa.float64()),
    })


# Exact SQL mirror of the greedy farthest-point traversal: the recursive
# CTE carries the chosen-center id list; each step joins the long-format
# embedding view against the centers in that list, takes per-candidate
# min squared Euclidean distance, and picks max dist with min-vec_id
# tie-break — the same reduction q_emb_kcenter's per-batch partials
# implement. The anchor's CAST(0.0 AS DOUBLE) is load-bearing: a bare
# 0.0 types the dist column DECIMAL(2,1) and every distance would be
# rounded to one digit before the ROUND(…, 6) in the projection.
SQL_EMB_KCENTER = f"""WITH RECURSIVE
ex AS (
    SELECT vec_id, generate_subscripts(embedding, 1) AS d,
           CAST(unnest(embedding) AS DOUBLE) AS v
    FROM embeddings
),
sel(rank, vec_id, dist, chosen) AS (
    SELECT 0, min(vec_id), CAST(0.0 AS DOUBLE), [min(vec_id)]
    FROM embeddings
    UNION ALL
    SELECT s.rank + 1, w.vec_id, w.dist, list_append(s.chosen, w.vec_id)
    FROM sel s, LATERAL (
        SELECT p.a_vec AS vec_id, sqrt(MIN(p.d2)) AS dist
        FROM (
            SELECT a.vec_id AS a_vec, c.vec_id AS c_vec,
                   SUM((a.v - c.v) * (a.v - c.v)) AS d2
            FROM ex a JOIN ex c ON a.d = c.d
            WHERE list_contains(s.chosen, c.vec_id)
            GROUP BY a.vec_id, c.vec_id
        ) p
        GROUP BY p.a_vec
        ORDER BY dist DESC, p.a_vec ASC
        LIMIT 1
    ) w
    WHERE s.rank < {KCENTER_K - 1}
)
SELECT CAST(rank AS BIGINT) AS rank, vec_id, round(dist, 6) AS dist
FROM sel ORDER BY rank"""


def q_emb_centroids(sf_dir: str) -> pa.Table:
    """Per-label class centroids (the distributed-mean op behind
    prototype classifiers, per-class drift baselines and balanced
    sampling): mean embedding per label. Scale shape: per-batch
    (label, dim, partial_sum, n) combiner rows — labels×d per batch
    regardless of batch size — one tiny groupby-sum, division only
    after the merge (same shape as q_emb_drift)."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        lab = b.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
        m = _emb_matrix(b).astype(np.float64)
        rows = {"label": [], "dim": [], "s": [], "n": []}
        for lv in np.unique(lab):
            sel = lab == lv
            s = m[sel].sum(axis=0)
            rows["label"].extend([int(lv)] * m.shape[1])
            rows["dim"].extend(range(1, m.shape[1] + 1))
            rows["s"].extend(s.tolist())
            rows["n"].extend([int(sel.sum())] * m.shape[1])
        return pa.table({
            "label": pa.array(rows["label"], pa.int64()),
            "dim": pa.array(rows["dim"], pa.int64()),
            "s": pa.array(rows["s"], pa.float64()),
            "n": pa.array(rows["n"], pa.int64()),
        })

    out = (embeddings_ds(sf_dir, ["embedding", "label"])
           .map_batches(partial, batch_format="pyarrow")
           .groupby(["label", "dim"])
           .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n")))
    df = out.to_pandas().sort_values(["label", "dim"]).reset_index(drop=True)
    return pa.table({
        "label": pa.array(df["label"].astype("int64")),
        "dim": pa.array(df["dim"].astype("int64")),
        "n": pa.array(df["n"].astype("int64")),
        "centroid": pa.array(
            round_half_away(df["s"].to_numpy(np.float64)
                            / df["n"].to_numpy(np.float64), 6),
            pa.float64()),
    })


SQL_EMB_CENTROIDS = """SELECT CAST(label AS BIGINT) AS label, i AS dim,
       COUNT(*) AS n,
       round(SUM(CAST(embedding[i] AS DOUBLE)) / COUNT(*), 6) AS centroid
FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
GROUP BY label, i ORDER BY label, dim"""


OUTLIER_Z = 2.0


def q_emb_outliers(sf_dir: str) -> pa.Table:
    """Embedding-space anomaly screen: vectors whose Euclidean distance to
    their label's centroid sits more than OUTLIER_Z population standard
    deviations above the label's mean distance — mislabeled rows, encoder
    glitches and distribution-tail samples all surface here (the
    embedding sibling of ev_amount_outliers' per-group z-scoring).

    Scale shape (derive-stats-then-scan, twice): pass 1 is the
    q_emb_centroids combiner (labels×d partial-sum rows per batch, tiny
    groupby-sum), whose ROUNDED centroids broadcast via closure — the
    rounding pins the reference point both engine- and oracle-side so
    the distance arithmetic starts from identical floats. Pass 2 folds
    per-batch (label, n, mean, M2) Welford partials over the rounded
    distances, merged with Chan's parallel-variance combination in
    deterministic order (STDDEV_POP-stable numerics). Pass 3 is row-local
    z-scoring against the O(labels) moment table — no exchange. z is
    rounded to 6 decimals on BOTH sides before thresholding."""
    import ray

    cent = q_emb_centroids(sf_dir).to_pandas()
    cmap = {int(lv): sub.sort_values("dim")["centroid"].to_numpy(np.float64)
            for lv, sub in cent.groupby("label")}

    def dists(b: pa.Table) -> np.ndarray:
        lab = b.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
        m = _emb_matrix(b).astype(np.float64)
        c = np.stack([cmap[int(lv)] for lv in lab])
        return round_half_away(np.sqrt(((m - c) ** 2).sum(axis=1)), 6)

    def moments(b: pa.Table) -> pa.Table:
        lab = b.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
        d = dists(b)
        rows = {"label": [], "n": [], "mean": [], "M2": []}
        for lv in np.unique(lab):
            x = d[lab == lv]
            rows["label"].append(int(lv))
            rows["n"].append(int(x.size))
            rows["mean"].append(float(x.mean()))
            rows["M2"].append(float(((x - x.mean()) ** 2).sum()))
        return pa.table({
            "label": pa.array(rows["label"], pa.int64()),
            "n": pa.array(rows["n"], pa.int64()),
            "mean": pa.array(rows["mean"], pa.float64()),
            "M2": pa.array(rows["M2"], pa.float64()),
        })

    partials = [t for t in ray.get(arrow_refs(
        embeddings_ds(sf_dir, ["embedding", "label"])
        .map_batches(moments, batch_format="pyarrow"))) if t.num_rows]
    agg = (pa.concat_tables(partials).to_pandas()
           .sort_values(["label", "n", "mean"], kind="stable"))
    stats = {}
    for lv, sub in agg.groupby("label", sort=True):
        n_acc, mean_acc, m2_acc = 0, 0.0, 0.0
        for _, r in sub.iterrows():  # deterministic fold order (sorted)
            nb, mb, m2b = int(r["n"]), float(r["mean"]), float(r["M2"])
            tot = n_acc + nb
            delta = mb - mean_acc
            m2_acc = m2_acc + m2b + delta * delta * n_acc * nb / tot
            mean_acc = mean_acc + delta * nb / tot
            n_acc = tot
        stats[int(lv)] = (mean_acc, float(np.sqrt(m2_acc / n_acc)))

    def flag(b: pa.Table) -> pa.Table:
        lab = b.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
        vid = b.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        d = dists(b)
        mu = np.array([stats[int(lv)][0] for lv in lab])
        sg = np.array([stats[int(lv)][1] for lv in lab])
        z = round_half_away(np.where(sg > 0, (d - mu) / np.where(sg > 0, sg, 1),
                                     0.0), 6)
        keep = z > OUTLIER_Z
        return pa.table({
            "vec_id": pa.array(vid[keep]),
            "label": pa.array(lab[keep]),
            "dist": pa.array(d[keep], pa.float64()),
            "z": pa.array(z[keep], pa.float64()),
        })

    out = (embeddings_ds(sf_dir, ["vec_id", "embedding", "label"])
           .map_batches(flag, batch_format="pyarrow"))
    tables = [t for t in ray.get(arrow_refs(out)) if t.num_rows]
    if not tables:
        return pa.table({"vec_id": pa.array([], pa.int64()),
                         "label": pa.array([], pa.int64()),
                         "dist": pa.array([], pa.float64()),
                         "z": pa.array([], pa.float64())})
    return pa.concat_tables(tables).sort_by("vec_id")


SQL_EMB_OUTLIERS = f"""WITH cent AS (
    SELECT CAST(label AS BIGINT) AS label, i AS dim,
           round(SUM(CAST(embedding[i] AS DOUBLE)) / COUNT(*), 6) AS c
    FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
    GROUP BY label, i
),
dists AS (
    SELECT e.vec_id, CAST(e.label AS BIGINT) AS label,
           round(sqrt(SUM(pow(CAST(e.embedding[c.dim] AS DOUBLE) - c.c, 2))),
                 6) AS dist
    FROM embeddings e
    JOIN cent c ON CAST(e.label AS BIGINT) = c.label
    GROUP BY e.vec_id, e.label
),
stats AS (
    SELECT label, AVG(dist) AS mu, STDDEV_POP(dist) AS sigma
    FROM dists GROUP BY label
)
SELECT d.vec_id, d.label, d.dist,
       round(CASE WHEN s.sigma > 0 THEN (d.dist - s.mu) / s.sigma
                  ELSE 0 END, 6) AS z
FROM dists d JOIN stats s USING (label)
WHERE round(CASE WHEN s.sigma > 0 THEN (d.dist - s.mu) / s.sigma
                 ELSE 0 END, 6) > {OUTLIER_Z}
ORDER BY vec_id"""


EMB_QUERIES = {
    "emb_outliers": (q_emb_outliers, SQL_EMB_OUTLIERS),
    "emb_centroids": (q_emb_centroids, SQL_EMB_CENTROIDS),
    "emb_kcenter": (q_emb_kcenter, SQL_EMB_KCENTER),
    "emb_norm_check": (q_emb_norm_check, SQL_EMB_NORM_CHECK),
    "emb_drift": (q_emb_drift, SQL_EMB_DRIFT),
    "emb_knn": (q_emb_knn, SQL_EMB_KNN),
    "emb_hardneg": (q_emb_hardneg, SQL_EMB_HARDNEG),
    "emb_neardup": (q_emb_neardup, SQL_EMB_NEARDUP),
    "emb_neardup_lsh": (q_emb_neardup_lsh, SQL_EMB_NEARDUP_LSH),
    "emb_knn_ivf": (q_emb_knn_ivf, SQL_EMB_KNN_IVF),
    "emb_dup_clusters": (q_emb_dup_clusters, SQL_EMB_DUP_CLUSTERS),
    "emb_project": (q_emb_project, SQL_EMB_PROJECT),
    "emb_quantize": (q_emb_quantize, SQL_EMB_QUANTIZE),
    "emb_pq": (q_emb_pq, SQL_EMB_PQ),
    "emb_knn_pq": (q_emb_knn_pq, SQL_EMB_KNN_PQ),
}
