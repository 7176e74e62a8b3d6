"""Keyed (shuffle) checks — the operations that genuinely need an all-to-all
exchange (SURVEY.md §2.4): exact key uniqueness, content dedup, and the
bucketed anti-join for a non-broadcastable reference index.

Scale notes (the part the reference never had to solve — single JVM):
  * every shuffle here moves ONLY the key columns (clip_id / 64-bit content
    hash + partition), never the audio payload — pre-projection keeps the
    exchange O(rows × ~20B) even when the table is O(rows × 100 kB);
  * per-batch pre-aggregation (key, partition, cnt) shrinks the shuffle
    further when duplicates cluster;
  * violations and metric rows are the only materialized outputs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..schema import VIOLATION_SCHEMA, Codes
from ..sketches import hash64

# keyed violations carry every VIOLATION_SCHEMA field except check_id
KEYED_VIOLATION_SCHEMA = pa.schema(
    [f for f in VIOLATION_SCHEMA if f.name != "check_id"])

_GOLD = np.uint64(0x9E3779B97F4A7C15)


def shuffle_blocks(n: int | None = None) -> int:
    """Shuffle parallelism for the keyed exchanges — passed as
    ``groupby(key, num_partitions=...)`` so the sort-reduce side lands on
    ~2×CPU output partitions directly (one all-to-all; round 2 replaced
    the earlier repartition-then-groupby chain, which paid a SECOND
    exchange just to coalesce blocks). On a multi-node cluster total_cpus
    scales with the cluster, so this grows with the hardware, not the
    data."""
    if n is not None:
        return n
    import ray

    return max(16, 2 * int(ray.cluster_resources().get("CPU", 8)))


def grouped_apply(ds, key, fn, n_buckets: int | None = None,
                  out_schema: pa.Schema | None = None):
    """Co-group rows by ``key`` into B coarse hash buckets and apply
    ``fn(bucket_df)`` once per bucket.

    The per-KEY ``groupby(key).map_groups(fn)`` shape pays a python call +
    DataFrame construction per group — ruinous for high-cardinality keys
    (one group per clip_id/band). Identical keys only need to be
    CO-LOCATED, not individually dispatched: hash-bucket the key, one
    sort exchange into B = shuffle_blocks() partitions (groupby
    num_partitions — no separate repartition), and let ``fn`` do
    vectorized pandas group-ops inside each bucket. Per-bucket memory
    = rows/B, tunable for skew."""
    B = np.uint64(n_buckets or shuffle_blocks())

    def tag(b: pa.Table) -> pa.Table:
        from .. import quiet_ray_logs
        from ..sketches import hash_column

        quiet_ray_logs()  # workers re-apply after ray.data's log config
        if isinstance(key, str):
            h = hash_column(b.column(key))
        else:  # composite key: combine column hashes
            h = np.zeros(len(b), dtype=np.uint64)
            for k in key:
                h = h * _GOLD + hash_column(b.column(k))
        return b.append_column("__bucket",
                               pa.array((h % B).astype(np.int64)))

    def apply(g):
        from .. import quiet_ray_logs

        quiet_ray_logs()
        # Arrow-native reduce path: the shuffle moves Arrow blocks end to
        # end (hashable schemas — no per-reduce "Failed to hash" noise,
        # no pandas-block round trip in Ray's concat); the per-bucket
        # reducer still gets the pandas frame it is written against.
        if not isinstance(g, pd.DataFrame):
            g = g.to_pandas()
        out = fn(g.drop(columns="__bucket"))
        if out_schema is not None and isinstance(out, pd.DataFrame):
            # emit typed Arrow so every bucket (incl. empty) agrees on
            # schema — avoids object-dtype inference noise downstream
            return pa.Table.from_pandas(
                out, schema=out_schema, preserve_index=False)
        return out

    # NOTE (measured, do not "optimize"): forcing a batch_size here makes
    # Ray's bundler coalesce fragmented key blocks and drops the ISOLATED
    # exchange cost 4.5s → 0.6s on a 5k-row stream — but in real pipelines
    # the exchange OVERLAPS its upstream under streaming execution, and
    # the bundling barrier breaks that overlap: suite 2.7→4.5s, minhash
    # 7.5→8.9s even at batch_size=2048. Block-granularity tag keeps the
    # pipeline streaming; per-block sort overhead is the cheaper tax.
    return (ds.map_batches(tag, batch_format="pyarrow")
            # never more sort partitions than distinct bucket keys — a
            # caller-shrunk B otherwise pays for empty reduce partitions
            .groupby("__bucket", num_partitions=min(int(B),
                                                    shuffle_blocks()))
            .map_groups(apply, batch_format="pyarrow"))


def _ga_hash_buckets(t: pa.Table, key, B: int) -> np.ndarray:
    """Bucket ids for ``t``'s rows under grouped_apply's key hash."""
    from ..sketches import hash_column

    if isinstance(key, str):
        h = hash_column(t.column(key))
    else:
        h = np.zeros(len(t), dtype=np.uint64)
        for k in key:
            h = h * _GOLD + hash_column(t.column(k))
    return (h % np.uint64(B)).astype(np.int64)


def _ga_split_task(B: int, key, map_fn, *blocks):
    """Wave 1 of grouped_apply_refs: per-block map (optional), then
    hash-partition this group's rows into B bucket slices."""
    from .. import quiet_ray_logs

    quiet_ray_logs()
    mapped = [map_fn(b) if map_fn is not None else b for b in blocks]
    mapped = [m for m in mapped if m.num_rows] or [mapped[0]]
    t = pa.concat_tables(mapped, promote_options="default")
    bk = _ga_hash_buckets(t, key, B)
    out = tuple(t.filter(pa.array(bk == i)) for i in range(B))
    return out if B > 1 else out[0]


def _ga_reduce_task(fn, out_schema, *parts) -> pa.Table:
    """Wave 2: one hash bucket — concat every source's slice and run the
    per-bucket reducer (same contract as grouped_apply's ``fn``)."""
    from .. import quiet_ray_logs

    quiet_ray_logs()
    t = pa.concat_tables([p for p in parts if p.num_rows]
                         or [parts[0]], promote_options="default")
    if t.num_rows == 0:
        # match the Dataset plan exactly: map_groups never invokes fn on
        # an empty partition, so reducers are entitled to assume rows
        # (empty-frame pandas quirks — e.g. merge(right_index=True)
        # adopting the right's index name — otherwise leak in)
        return (out_schema.empty_table() if out_schema is not None else t)
    # strip pandas schema metadata: a source block built via from_pandas
    # carries index info that to_pandas would reconstruct as a named
    # index, colliding with same-named columns inside fn's groupby
    out = fn(t.replace_schema_metadata(None).to_pandas())
    if out_schema is not None and isinstance(out, pd.DataFrame):
        if not len(out):
            # an empty bucket's frame carries pandas-inferred dtypes (an
            # empty named-agg yields int64 object columns) that a strict
            # from_pandas(schema=...) refuses; the typed empty table IS
            # the correct value
            return out_schema.empty_table()
        return pa.Table.from_pandas(out, schema=out_schema,
                                    preserve_index=False)
    return out


def grouped_apply_refs(sources, key, fn, n_buckets: int | None = None,
                       out_schema: pa.Schema | None = None,
                       group_width: int = 8,
                       max_fanout: int | None = None):
    """``grouped_apply`` as a TWO-WAVE task-graph hash exchange over
    ALREADY-materialized blocks — same per-bucket ``fn`` contract and
    co-location guarantee, without the Dataset plan's ~4 mini-stage
    scheduling latencies (the documented fixed-latency tax that dominates
    short exchanges; see composite_fused_duplicates_refs).

    ``sources``: list of ``(block_refs, map_fn | None)`` — each source's
    blocks get ``map_fn`` applied per block in the split task (the
    task-graph analog of ``ds.map_batches(map_fn)`` feeding the
    exchange), letting several tagged streams co-group in ONE exchange
    (the union-then-shuffle shape of the distributed verify join).

    Returns a list of per-bucket ObjectRefs, or ``None`` when the G×B
    fan-out exceeds ``max_fanout`` — callers then fall back to the
    Dataset plan, which keeps bounded object counts at cluster scale."""
    import math

    import ray

    B = int(n_buckets or shuffle_blocks())
    n_refs = sum(len(refs) for refs, _ in sources)
    cap = COMPOSITE_TASK_MAX_FANOUT if max_fanout is None else max_fanout
    if n_refs == 0:
        return []
    # out_schema=None would let an all-empty bucket keep its PRE-exchange
    # (input) schema while non-empty buckets carry fn's output schema —
    # from_arrow_refs over mixed-schema refs breaks downstream. Every
    # caller passes a schema; a real exception (not assert — python -O
    # strips asserts) makes the contract survive optimized runs.
    if out_schema is None:
        raise ValueError("grouped_apply_refs requires out_schema")
    # guard must count split tasks the way the launch loop below creates
    # them: per SOURCE (sum of per-source ceils), not one global ceil —
    # the latter undercounts multi-source fan-out by up to
    # (n_sources-1)*B bucket slices
    n_split = sum(max(1, math.ceil(len(refs) / group_width))
                  for refs, _ in sources if len(refs))
    if n_split * B > cap:
        return None
    split = ray.remote(_ga_split_task)
    reduce_ = ray.remote(_ga_reduce_task)
    outs = []
    for refs, map_fn in sources:
        G = max(1, math.ceil(len(refs) / group_width))
        for i in range(G):
            g = list(refs[i::G])
            if not g:
                continue
            o = split.options(num_returns=B).remote(B, key, map_fn, *g)
            outs.append([o] if B == 1 else o)
    return [reduce_.remote(fn, out_schema, *[o[b] for o in outs])
            for b in range(B)]


def grouped_apply_fast(ds, key, fn, n_buckets: int | None = None,
                       out_schema: pa.Schema | None = None):
    """grouped_apply with the task-graph physical plan: materialize the
    keyed stream, then run the two-wave hash exchange over its blocks
    (grouped_apply_refs); Dataset sort-exchange fallback past the
    fan-out guard. Returns a Dataset either way.

    Use when the exchange input is a COMPACT derived stream (key rows,
    fingerprints, pre-aggregated partials) — there the exchange's fixed
    mini-stage latency dominates its data movement, and the materialize
    barrier costs nothing the sort exchange would not also pay (a sort
    materializes its whole input anyway). Keep plain grouped_apply when
    bulk rows cross the exchange and streaming overlap with the upstream
    matters."""
    import ray.data as rd

    mat = ds.materialize()
    out = grouped_apply_refs([(tuple(mat.to_arrow_refs()), None)],
                             key, fn, n_buckets=n_buckets,
                             out_schema=out_schema)
    if out is not None:
        return rd.from_arrow_refs(out)
    return grouped_apply(mat, key, fn, n_buckets=n_buckets,
                         out_schema=out_schema)


def cap_group_members(ids: np.ndarray, cap: int,
                      salt: int = 0x5BD1E995) -> np.ndarray:
    """Deterministic bounded subsample of a hot group's members.

    The reference handles skew by SAMPLING strata proportionally
    (EstimatedDereferenceabilityByStratified.java:76-80), never by
    dropping them. For pair-generating stages (LSH bands, simhash chunks,
    vector buckets) a group of size g costs O(g²) pairs; a degenerate
    mega-group (hot band key, near-constant column) must be bounded — but
    round 1's ``continue`` silently lost ALL of its recall. This keeps a
    deterministic pseudo-random ``cap``-subset instead: members with the
    smallest hash64 priority (stable across workers/runs, no RNG), so a
    mega-group degrades to sampled recall rather than zero.

    Returns indices into ``ids`` (all of them when len <= cap)."""
    if len(ids) <= cap:
        return np.arange(len(ids))
    pri = hash64(np.asarray(ids, dtype=np.int64)
                 * np.int64(2654435761) + np.int64(salt))
    return np.sort(np.argsort(pri, kind="stable")[:cap])


def _preagg_key_counts(batch: pa.Table, col: str) -> pa.Table:
    """Per-batch (key, partition, cnt) partial counts (combiner before the
    groupby shuffle, 'Aggregation at scale' pattern)."""
    df = batch.select([col, "partition"]).to_pandas()
    df.columns = ["key", "partition"]
    g = df.groupby(["key", "partition"], sort=False).size().reset_index(name="cnt")
    return pa.table({
        "key": pa.array(g["key"].tolist(), pa.string()),
        "partition": pa.array(g["partition"].to_numpy().astype(np.int32)),
        "cnt": pa.array(g["cnt"].to_numpy().astype(np.int64)),
    })


def _dup_bucket_rows(df: pd.DataFrame, code: str,
                     expected: str) -> pd.DataFrame:
    """Vectorized per-bucket reducer over (key, partition, cnt) partials:
    keys with total count > 1 → one violation row per member occurrence
    (Bag-of-violating-subjects semantics, ValidIFPUsage.java:82-104)."""
    totals = df.groupby("key")["cnt"].transform("sum")
    dup = df[totals > 1]
    if dup.empty:
        return pd.DataFrame({
            "partition": pd.Series(dtype="int32"),
            "clip_id": pd.Series(dtype="object"),
            "code": pd.Series(dtype="object"),
            "actual": pd.Series(dtype="object"),
            "expected": pd.Series(dtype="object"),
            "detail": pd.Series(dtype="object"),
        })
    dup = dup.assign(total=totals[totals > 1]).sort_values(
        ["key", "partition"], kind="stable")
    rep = dup.loc[dup.index.repeat(dup["cnt"])]
    return pd.DataFrame({
        "partition": rep["partition"].astype("int32"),
        "clip_id": rep["key"].astype(str),
        "code": code,
        "actual": rep["total"].astype(str) + " occurrences",
        "expected": expected,
        "detail": "",
    })


PROBLEM_MODEL_SCHEMA = pa.schema([
    ("key", pa.string()),
    ("n_members", pa.int64()),
    ("members", pa.string()),  # canonical ordered Bag, comma-joined
])


def duplicate_key_groups(ds, column: str = "clip_id"):
    """Structured violation payload for key-uniqueness — the
    ProblemCollectionModel shape (ValidIFPUsage.java:80-104: one problem
    node per violated key carrying violatedPredicate/violatedObject and a
    Bag of ALL violating subjects), rather than the flat one-row-per-member
    stream: one row per duplicated key with its ordered member Bag
    (partition locators, multiplicity preserved, canonical order so the
    Bag is hash-comparable).

    Same exchange as exact_duplicate_keys: per-batch (key, partition, cnt)
    combiner → one bucketed co-group → vectorized per-bucket fold."""
    keyed = ds.map_batches(lambda b: _preagg_key_counts(b, column),
                           batch_format="pyarrow")

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        totals = df.groupby("key")["cnt"].transform("sum")
        dup = df[totals > 1]
        if dup.empty:
            return pd.DataFrame({"key": pd.Series(dtype="object"),
                                 "n_members": pd.Series(dtype="int64"),
                                 "members": pd.Series(dtype="object")})
        rep = dup.loc[dup.index.repeat(dup["cnt"]),
                      ["key", "partition"]].sort_values(
            ["key", "partition"], kind="stable")
        g = rep.groupby("key")["partition"].agg(
            n_members="size",
            members=lambda s: ",".join("p" + s.astype(str))).reset_index()
        return g[["key", "n_members", "members"]]

    return grouped_apply_fast(keyed, "key", bucket,
                         out_schema=PROBLEM_MODEL_SCHEMA)


def exact_duplicate_keys(ds, column: str = "clip_id"):
    """Exact key-uniqueness via hash shuffle (ValidIFPUsage.java:42-148:
    key (P,O) must map to exactly one subject; violations accumulate every
    colliding member).

    Dataflow: project(key, partition) → per-batch pre-agg → bucketed
    co-group → vectorized per-bucket reduce. Shuffle payload = distinct
    keys per batch only. NULL keys are excluded by design (pandas
    groupby dropna in the pre-agg): a null key is a NonNullCheck /
    SchemaCheck violation, not a well-defined uniqueness collision —
    SQL's UNIQUE constraints treat NULLs the same way."""
    pre = ds.select_columns([column, "partition"]).map_batches(
        lambda b: _preagg_key_counts(b, column), batch_format="pyarrow")
    return grouped_apply_fast(
        pre, "key",
        lambda g: _dup_bucket_rows(g, Codes.DUPLICATE_KEY,
                                   "unique " + column),
        out_schema=KEYED_VIOLATION_SCHEMA)


def exact_duplicate_keys_from_keys(keys_ds, column: str = "clip_id"):
    """Same uniqueness semantics over the pass-emitted key stream — the
    FUSED path: the shared batch pass emits (key=<column>, partition,
    clip_id) rows via KeyUniquenessEmitter, so no second source scan runs
    concurrently with (and contends against) the decode-heavy pass; only
    per-batch (key, partition, cnt) partials enter the exchange."""
    pre = keys_ds.map_batches(lambda b: _preagg_key_counts(b, "key"),
                              batch_format="pyarrow")
    return grouped_apply_fast(
        pre, "key",
        lambda g: _dup_bucket_rows(g, Codes.DUPLICATE_KEY,
                                   "unique " + column),
        out_schema=KEYED_VIOLATION_SCHEMA)


class KeyUniquenessEmitter:
    """Key-emitting pseudo-check for the fused key-uniqueness path
    (ValidIFPUsage.java:42-148 semantics, same reduce as
    exact_duplicate_keys): emits (key=<column value>, partition, clip_id)
    rows from inside the shared batch pass; the duplicate reduce happens
    in the keyed stage over those rows."""

    check_id = "clipid_unique_exact"
    is_estimate = False
    per_partition_sketch = False

    def __init__(self, column: str = "clip_id"):
        self.column = column
        self.columns = (column, "clip_id", "partition")

    def setup(self, ctx) -> None:  # noqa: B027
        pass

    def evaluate(self, batch: pa.Table):
        from .base import BatchOutcome

        return BatchOutcome(keys=pa.table({
            "key": batch.column(self.column).cast(pa.string()),
            "partition": batch.column("partition"),
            "clip_id": batch.column("clip_id"),
        }))

    def merge(self, partials):
        return None

    def finalize_value(self, scanned, violating, merged):
        return 1.0, True, ""


def _binary_views(col) -> list:
    """Per-row zero-copy memoryview slices of a Binary/String column
    (None for null rows). Avoids both to_pylist's full materialization
    AND combine_chunks' full copy of the payload bytes — the digest reads
    straight from each chunk's Arrow buffer."""
    chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
    out: list = []
    for arr in chunks:
        n = len(arr)
        if n == 0:
            continue
        if pa.types.is_binary(arr.type) or pa.types.is_string(arr.type):
            off_dtype = np.int32
        elif (pa.types.is_large_binary(arr.type)
              or pa.types.is_large_string(arr.type)):
            off_dtype = np.int64
        else:
            out.extend(None if v is None else str(v).encode("utf-8")
                       for v in arr.to_pylist())
            continue
        bufs = arr.buffers()
        offs = np.frombuffer(bufs[1], dtype=off_dtype,
                             count=n + 1 + arr.offset)[arr.offset:]
        data = (memoryview(bufs[2]) if bufs[2] is not None
                else memoryview(b""))
        if arr.null_count == 0:
            out.extend(data[offs[i]:offs[i + 1]] for i in range(n))
        else:
            valid = arr.is_valid().to_numpy(zero_copy_only=False)
            out.extend(data[offs[i]:offs[i + 1]] if valid[i] else None
                       for i in range(n))
    return out


def content_hash_batch(batch: pa.Table,
                       cols: tuple[str, ...] = ("bytes", "transcript")) -> pa.Table:
    """128-bit content digest over the identity columns
    (ExtensionalConciseness.java:92-134 replaced the O(n²) pairwise
    set-equality with... nothing; here: hash + groupby, SURVEY.md §2.4).

    sha256 truncated to 128 bits over length-prefixed, null-tagged column
    values: at the 10^12-row design target a 64-bit key would see
    guaranteed birthday collisions (~10^4 colliding pairs at 10^9 rows
    already) and report false DUPLICATE_CONTENT violations on an exact
    (is_estimate=False) check; 128 bits keeps the whole-corpus collision
    probability < 1e-14. sha256 because it is the fastest 128+-bit digest
    on this hardware (SHA-NI ≈ 1.2 GB/s vs blake2b 0.77 / md5 0.63); the
    values are read as zero-copy Arrow buffer slices, so the stage stays
    payload-bandwidth-bound. Shuffle key = 32 hex chars."""
    import hashlib

    cols_views = [_binary_views(batch.column(c)) for c in cols]
    keys = []
    for i in range(len(batch)):
        d = hashlib.sha256()
        for views in cols_views:
            v = views[i]
            if v is None:
                d.update(b"\xff\xff\xff\xff\xff\xff\xff\xff")
            else:
                d.update(len(v).to_bytes(8, "little"))
                d.update(v)
        keys.append(d.hexdigest()[:32])
    return pa.table({
        "key": pa.array(keys, pa.string()),
        "partition": batch.column("partition"),
        "clip_id": batch.column("clip_id"),
    })


def _content_bucket_rows(df: pd.DataFrame) -> pd.DataFrame:
    """Vectorized per-bucket reducer: members beyond the first (by clip_id
    order) of an identical-content group are DUPLICATE_CONTENT violations."""
    df = df.sort_values(["key", "clip_id"], kind="stable")
    g = df.groupby("key")["clip_id"]
    size = g.transform("size")
    first = g.transform("first")
    rank = df.groupby("key").cumcount()
    dup = df[(size > 1) & (rank > 0)]
    if dup.empty:
        return pd.DataFrame({
            "partition": pd.Series(dtype="int32"),
            "clip_id": pd.Series(dtype="object"),
            "code": pd.Series(dtype="object"),
            "actual": pd.Series(dtype="object"),
            "expected": pd.Series(dtype="object"),
            "detail": pd.Series(dtype="object"),
        })
    return pd.DataFrame({
        "partition": dup["partition"].astype("int32"),
        "clip_id": dup["clip_id"].astype(str),
        "code": Codes.DUPLICATE_CONTENT,
        "actual": "group of " + size[dup.index].astype(str),
        "expected": "unique (bytes, transcript) content",
        "detail": "first=" + first[dup.index].astype(str),
    })


def content_duplicates(ds, cols: tuple[str, ...] = ("bytes", "transcript")):
    """Exact content dedup: hash(content) → bucketed co-group → first wins.
    Shuffles 16-byte hex keys, never the payload."""
    hashed = ds.select_columns([*cols, "clip_id", "partition"]).map_batches(
        lambda b: content_hash_batch(b, cols), batch_format="pyarrow")
    return grouped_apply_fast(hashed, "key", _content_bucket_rows,
                         out_schema=KEYED_VIOLATION_SCHEMA)


def content_duplicates_from_keys(keys_ds):
    """Same dedup semantics over a pre-hashed key stream — the FUSED path:
    the suite's single payload scan emits (key, clip_id, partition) rows
    via ContentHashCheck, so the payload bytes are read ONCE for decode +
    hashing together instead of twice."""
    return grouped_apply_fast(keys_ds, "key", _content_bucket_rows,
                         out_schema=KEYED_VIOLATION_SCHEMA)


class ContentHashCheck:
    """Key-emitting pseudo-check for the fused content-dedup path: hashes
    the identity columns inside the shared batch pass (payload already in
    memory) and emits per-row key rows; no violations or counters of its
    own — the dedup reduce happens in the keyed stage."""

    check_id = "content_dedup"
    is_estimate = False
    per_partition_sketch = False

    def __init__(self, cols: tuple[str, ...] = ("bytes", "transcript")):
        self.cols = cols
        self.columns = (*cols, "clip_id", "partition")

    def setup(self, ctx) -> None:  # noqa: B027
        pass

    def evaluate(self, batch: pa.Table):
        from .base import BatchOutcome

        return BatchOutcome(keys=content_hash_batch(batch, self.cols))

    def merge(self, partials):
        return None

    def finalize_value(self, scanned, violating, merged):
        return 1.0, True, ""


# composite keyed rows carry check_id so ONE exchange can serve several
# keyed checks at once; field order == VIOLATION_SCHEMA so sink-mode casts
# are zero-rearrangement
COMPOSITE_KEYED_SCHEMA = pa.schema(
    [("check_id", pa.string()), *KEYED_VIOLATION_SCHEMA])

_COMPOSITE_PRE_SCHEMA = pa.schema([
    ("check_id", pa.string()),
    ("key", pa.string()),
    ("partition", pa.int32()),
    ("clip_id", pa.string()),
    ("cnt", pa.int64()),
])

# fused checks whose key rows pre-aggregate to (key, partition, cnt)
# partials before the exchange (pure-count semantics, no member payload)
_COMPOSITE_PREAGG_KIDS = frozenset({"clipid_unique_exact"})


def _composite_pre(b: pa.Table, kids: tuple[str, ...]) -> pa.Table:
    """Per-block combiner for the composite exchange: scope to this
    composite's checks, pre-aggregate pure-count checks to (check_id,
    key, partition, cnt) partials, pass member-payload checks through
    with cnt=1. Shared by the Dataset plan and the task-graph plan."""
    import pyarrow.compute as pc

    # the fused key stream carries rows for EVERY emitter; keep only
    # this composite's checks so a coexisting keyed_from_keys entry
    # can never leak rows in
    b = b.filter(pc.is_in(b.column("check_id"),
                          value_set=pa.array(sorted(kids), pa.string())))
    cid = b.column("check_id")
    um = pc.is_in(cid, value_set=pa.array(
        sorted(_COMPOSITE_PREAGG_KIDS), pa.string()))
    parts = []
    ub = b.filter(um)
    if ub.num_rows:
        # per-batch (check_id, key, partition, cnt) combiner — the
        # _preagg_key_counts shape with check_id carried through
        df = pd.DataFrame({
            "check_id": ub.column("check_id").to_pylist(),
            "key": ub.column("actual").to_pylist(),
            "partition": ub.column("partition").to_numpy(
                zero_copy_only=False),
        })
        g = (df.groupby(["check_id", "key", "partition"], sort=False)
             .size().reset_index(name="cnt"))
        parts.append(pa.table({
            "check_id": pa.array(g["check_id"].tolist(), pa.string()),
            "key": pa.array(g["key"].tolist(), pa.string()),
            "partition": pa.array(
                g["partition"].to_numpy().astype(np.int32)),
            "clip_id": pa.nulls(len(g), pa.string()),
            "cnt": pa.array(g["cnt"].to_numpy().astype(np.int64)),
        }))
    cb = b.filter(pc.invert(um))
    if cb.num_rows:
        parts.append(pa.table({
            "check_id": cb.column("check_id"),
            "key": cb.column("actual"),
            "partition": cb.column("partition"),
            "clip_id": cb.column("clip_id"),
            "cnt": pa.array(np.ones(cb.num_rows, dtype=np.int64)),
        }))
    if not parts:
        return _COMPOSITE_PRE_SCHEMA.empty_table()
    return pa.concat_tables(
        [p.cast(_COMPOSITE_PRE_SCHEMA) for p in parts])


_COMPOSITE_EMPTY_OUT = {
    "check_id": pd.Series(dtype="object"),
    "partition": pd.Series(dtype="int32"),
    "clip_id": pd.Series(dtype="object"),
    "code": pd.Series(dtype="object"),
    "actual": pd.Series(dtype="object"),
    "expected": pd.Series(dtype="object"),
    "detail": pd.Series(dtype="object"),
}


def _composite_bucket(df: pd.DataFrame) -> pd.DataFrame:
    """Per-bucket reducer: dispatch each check's rows to its unchanged
    per-bucket reduction; check_id in the group key means identical key
    VALUES under different checks can never cross-talk."""
    outs = []
    for kid, sub in df.groupby("check_id", sort=True):
        if kid in _COMPOSITE_PREAGG_KIDS:
            r = _dup_bucket_rows(sub[["key", "partition", "cnt"]],
                                 Codes.DUPLICATE_KEY, "unique clip_id")
        else:
            r = _content_bucket_rows(
                sub[["key", "partition", "clip_id"]])
        if len(r):
            r.insert(0, "check_id", kid)
            outs.append(r)
    if not outs:
        return pd.DataFrame(_COMPOSITE_EMPTY_OUT)
    return pd.concat(outs, ignore_index=True)


def composite_fused_duplicates(
        keys_ds, kids: tuple[str, ...] = ("clipid_unique_exact",
                                          "content_dedup")):
    """ONE composite-key exchange for ALL fused keyed checks — exact
    clip_id uniqueness (ValidIFPUsage.java:42-148 semantics) and exact
    content dedup (ExtensionalConciseness.java:92-134 semantics) share a
    single bucketed co-group instead of one exchange each.

    Why: each keyed exchange is a short Ray pipeline (tag → sort →
    reduce) whose ~4 mini-stage fixed latencies a small driver
    serializes; at 2 cpus that tail is the documented suite-efficiency
    gap (BASELINE.md round-3 trials 14-17). Bucketing on the composite
    (check_id, key) halves the exchange count with byte-identical
    violations — the per-bucket reducers are unchanged, merely
    dispatched by check_id inside the bucket. Keys from different checks
    can never collide because check_id is part of the group key.

    Constraint: the uniqueness branch hardcodes expected='unique
    clip_id' — the composite plan is only wired for the suite's default
    KeyUniquenessEmitter (key = clip_id); a custom-column emitter must
    use the per-check fused path (exact_duplicate_keys_from_keys),
    whose expected text carries its column.

    Input: the suite's fused key stream (kind='k' tagged rows: check_id,
    actual=key, partition, clip_id). Output: violations Dataset with a
    leading check_id column (COMPOSITE_KEYED_SCHEMA); the caller splits
    per check_id."""

    def pre(b: pa.Table) -> pa.Table:
        return _composite_pre(b, kids)

    return grouped_apply(
        keys_ds.map_batches(pre, batch_format="pyarrow"),
        ["check_id", "key"], _composite_bucket,
        out_schema=COMPOSITE_KEYED_SCHEMA)


# Above this many (input blocks × buckets) shuffle slices, the task-graph
# exchange's G×B small-object fan-out outweighs its latency win and the
# Dataset sort path (push/sort shuffle, bounded object counts) takes over.
COMPOSITE_TASK_MAX_FANOUT = 50_000


def _composite_split_task(B: int, kids: tuple[str, ...], *blocks):
    """Wave 1 of the task-graph exchange: concat this group's tagged
    blocks, keep kind='k' rows, run the shared pre-combiner, and
    hash-partition into B bucket slices (num_returns=B)."""
    import pyarrow.compute as pc

    from .. import quiet_ray_logs
    from ..sketches import hash_column

    quiet_ray_logs()
    t = pa.concat_tables(blocks)
    if "kind" in t.column_names:  # raw tagged stream: key rows only
        t = t.filter(pc.equal(t.column("kind"), "k"))
    pre = _composite_pre(t, kids)
    h = np.zeros(len(pre), dtype=np.uint64)
    for k in ("check_id", "key"):
        h = h * _GOLD + hash_column(pre.column(k))
    bk = (h % np.uint64(B)).astype(np.int64)
    out = tuple(pre.filter(pa.array(bk == i)) for i in range(B))
    return out if B > 1 else out[0]


def _composite_reduce_task(kids: tuple[str, ...], *parts) -> pa.Table:
    """Wave 2: this task IS one hash bucket — every row of every key
    assigned to it is present, so the shared per-bucket reducer applies
    unchanged."""
    from .. import quiet_ray_logs

    quiet_ray_logs()
    t = pa.concat_tables(parts)
    if t.num_rows == 0:  # empty bucket: fn is never invoked (Dataset-plan parity)
        return COMPOSITE_KEYED_SCHEMA.empty_table()
    df = t.replace_schema_metadata(None).to_pandas()
    return pa.Table.from_pandas(_composite_bucket(df),
                                schema=COMPOSITE_KEYED_SCHEMA,
                                preserve_index=False)


def composite_fused_duplicates_refs(
        block_refs, kids: tuple[str, ...] = ("clipid_unique_exact",
                                             "content_dedup"),
        n_buckets: int | None = None, group_width: int = 16):
    """The composite exchange as a TWO-WAVE raw-task hash shuffle over
    already-materialized tagged blocks — same semantics as
    ``composite_fused_duplicates`` (shared ``_composite_pre`` /
    ``_composite_bucket``), ~5x lower fixed latency.

    Why raw tasks here: the Dataset plan (filter → map → sort → reduce)
    carries ~4 mini-stage scheduling latencies (~4 s measured at 8 cpus
    on a 322k-row key stream — BASELINE.md session-7) that land entirely
    on the suite's critical path because the exchange can only start at
    the pass's materialize barrier. Over blocks that ALREADY sit in the
    object store, the same hash exchange is two task waves: G split
    tasks (filter+combine+partition, ``num_returns=B``) and B reduce
    tasks (one per bucket) — 0.8 s for the same input, byte-identical
    violations (tests/test_runner.py::test_composite_task_graph_matches_dataset_path).

    Scale: data movement equals the Dataset path (every key row crosses
    once, pre-aggregated); per-reduce memory is rows/B. The G×B
    small-object fan-out is the scale ceiling — callers switch paths via
    COMPOSITE_TASK_MAX_FANOUT, keeping the Dataset sort exchange as the
    large-cluster default.

    Returns a list of ObjectRefs of COMPOSITE_KEYED_SCHEMA tables (one
    per bucket)."""
    import math

    import ray

    B = int(n_buckets or shuffle_blocks())
    if not block_refs:
        # zero input blocks → zero split tasks → every reduce task would
        # crash on pa.concat_tables(()); an empty ref list IS the result
        return []
    G = max(1, math.ceil(len(block_refs) / group_width))
    groups = [list(block_refs[i::G]) for i in range(G)]
    groups = [g for g in groups if g]
    split = ray.remote(_composite_split_task)
    reduce_ = ray.remote(_composite_reduce_task)
    outs = [split.options(num_returns=B).remote(B, tuple(kids), *g)
            for g in groups]
    if B == 1:
        outs = [[o] for o in outs]
    return [reduce_.remote(tuple(kids), *[o[b] for o in outs])
            for b in range(B)]


# the runner picks the task-graph plan when the key stream is already
# materialized and the fan-out is under COMPOSITE_TASK_MAX_FANOUT
composite_fused_duplicates.refs_variant = composite_fused_duplicates_refs


def bucketed_anti_join(left_ds, right_ds, key: str = "clip_id",
                       right_key: str | None = None, n_buckets: int = 32):
    """Hash-partitioned anti-join for a non-broadcastable right side
    (DataCubePopulationCompleteness's gold-standard MINUS observed at scale).
    Both sides gain bucket = hash(key) % B, are co-grouped per bucket, and
    the per-bucket reducer emits left keys absent from right.

    ``right_key`` names the join column on the right side when it differs
    (e.g. customer.c_custkey vs orders.o_custkey).

    Skew note: bucket on the hashed key (uniform) — hot raw keys cannot
    concentrate because identical keys MUST co-locate for correctness; the
    B knob caps per-task memory instead."""
    right_key = right_key or key

    def tag(side: str, col: str):
        def f(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            from ..sketches import hash_column

            # cast-to-string normalizes key types across the two sides
            # (int64 custkey vs string id) so identical logical keys hash
            # identically; hashing stays Arrow-native (no to_pylist).
            # Python-str fallback for types Arrow cannot cast (same
            # normalization as stages/join._key_str, which this module
            # cannot import without a cycle)
            try:
                keys = pc.cast(b.column(col), pa.string())
            except pa.ArrowNotImplementedError:
                keys = pa.array(
                    [None if v is None else str(v)
                     for v in b.column(col).to_pylist()], pa.string())
            h = hash_column(keys)
            n = len(keys)
            return pa.table({
                "bucket": pa.array((h % np.uint64(n_buckets)).astype(np.int32)),
                "key": keys,
                "side": pa.array([side] * n, pa.string()),
                "partition": (b.column("partition") if "partition" in b.column_names
                              else pa.array([-1] * n, pa.int32())),
            })
        return f

    left_cols = [key] + (["partition"]
                         if "partition" in left_ds.schema().names else [])
    # batch_size is a BLOCK COALESCER here, not a memory knob: a parquet
    # read sized for the payload table can hand this 2-column projection
    # hundreds of tiny blocks, and the sort exchange's driver-side
    # scheduling then dwarfs its compute (observed at sf0.1: 416 input
    # blocks → 11 s sort wall for ~1.5 s of remote time; coalesced → <2 s).
    # Key rows are ~30 B, so 64k-row batches are ~2 MB blocks.
    _coalesce = 65536
    tagged = left_ds.select_columns(left_cols).map_batches(
        tag("l", key), batch_format="pyarrow", batch_size=_coalesce).union(
        right_ds.select_columns([right_key]).map_batches(
            tag("r", right_key), batch_format="pyarrow",
            batch_size=_coalesce))

    def reduce_bucket(g: pd.DataFrame) -> pa.Table:
        right_keys = set(g.loc[g["side"] == "r", "key"])
        left = g[g["side"] == "l"]
        miss = left[~left["key"].isin(right_keys)]
        return pa.Table.from_pandas(pd.DataFrame({
            "partition": miss["partition"].astype("int32"),
            "clip_id": miss["key"].astype(str),
            "code": Codes.MISSING_REFERENCE,
            "actual": miss["key"].astype(str),
            "expected": f"{key} present in reference index",
            "detail": "bucketed",
        }), schema=KEYED_VIOLATION_SCHEMA, preserve_index=False)

    # bucket values are capped at n_buckets — extra sort partitions could
    # never receive a key and would only add empty-partition overhead
    return (tagged.groupby("bucket",
                           num_partitions=min(n_buckets, shuffle_blocks()))
            .map_groups(reduce_bucket, batch_format="pandas"))
