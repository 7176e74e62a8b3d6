"""Join operators — the multi-table enrichment paths
(ExtendedProvenanceMetric.java:56-155: a provenance chain resolved across
three tables; UsageOfIncorrectDomainOrRangeDatatypes.java:77-190: derive an
index FROM the dataset, then join the dataset against it).

Two shapes, chosen by side size — the decision a 10^12-row engine must
make explicitly:

  broadcast_enrich     N small dimension sides, ONE streaming pass over
                       the fact stream: every side ships once via ray.put
                       and each batch applies all lookups as vectorized
                       pandas index-maps. No shuffle at all.
  bucketed_inner_join  two LARGE sides: hash-bucket both on the join key,
                       union, one co-group exchange, vectorized
                       pandas merge per bucket. Shuffle payload = the
                       projected join columns only (callers pre-project).
  bucketed_asof_join   temporal AS-OF join (each left row ← the single
                       most recent right row with right.ts <= left.ts,
                       same key): same tagged-union co-group exchange,
                       one vectorized ``pandas.merge_asof`` per bucket.
                       Ray Data has no native as-of join; the only
                       partitioning assumption is that identical keys
                       co-locate (guaranteed by the bucket hash).
  bucketed_range_count temporal RANGE (band) join, count flavor: each
                       left row ← COUNT of right rows within ±band of
                       its timestamp. Time is tiled into band-width
                       buckets; right rows replicate to the 3 buckets
                       they can reach (bounded 3× blow-up, no key
                       needed), then one sorted-searchsorted count per
                       bucket. The non-equi join Ray Data cannot
                       express natively.

All compose: a 3-way fact⋈fact⋈dim plan is one bucketed join with a
broadcast_enrich before or after it.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..checks.keyed import grouped_apply_fast
from ..sketches import hash64
from ..collect import arrow_refs


def _key_str(col) -> pa.Array:
    """Stringified join key as an Arrow string array — vectorized for the
    common key types (strings pass through; integers via pc.cast, whose
    decimal form equals Python ``str()``); Python-loop fallback for
    anything else. Nulls stay null. This is the per-row hot path of every
    tag stage, so no ``to_pylist`` for string/int keys."""
    import pyarrow.compute as pc

    t = col.type
    if pa.types.is_string(t):
        out = col
    elif pa.types.is_integer(t) or pa.types.is_large_string(t):
        # large_string is cast down so BOTH join sides always emit the
        # same pa.string() __key type (the union's schema must unify)
        out = pc.cast(col, pa.string())
    else:
        out = pa.array([None if k is None else str(k)
                        for k in col.to_pylist()], pa.string())
    return (out.combine_chunks() if isinstance(out, pa.ChunkedArray)
            else out)


def broadcast_enrich(ds, sides: list[tuple], defaults: dict | None = None):
    """``sides``: list of (table: pa.Table, left_key, right_key, carry)
    where ``carry`` maps output column → right column. Each side becomes a
    broadcast pandas Series per carried column (ray.put once, ray.get per
    task — never re-shipped per batch); lookups chain, so a later side may
    key on a column produced by an earlier one (customer → nation).

    ``defaults`` maps output column → fill value for unmatched keys;
    columns without a default keep NaN/None (and a chained lookup through
    them stays unmatched — inner-join semantics downstream)."""
    defaults = defaults or {}
    import ray

    maps = []
    for table, left_key, right_key, carry in sides:
        idx = table.column(right_key).to_numpy(zero_copy_only=False)
        if pd.Index(idx).has_duplicates:
            # fail at build time on the driver with a clear message —
            # a duplicated dimension key would otherwise raise pandas
            # InvalidIndexError inside every map task
            raise ValueError(
                f"broadcast_enrich: dimension side keyed on "
                f"{right_key!r} has duplicate key values")
        series_map = {out_col: pd.Series(
            table.column(src_col).to_numpy(zero_copy_only=False), index=idx)
            for out_col, src_col in carry.items()}
        maps.append((left_key, series_map))
    ref = ray.put(maps)

    def enrich(b: pa.Table) -> pa.Table:
        lookups = ray.get(ref)
        df = b.to_pandas()
        for left_key, series_map in lookups:
            keys = df[left_key]
            for out_col, s in series_map.items():
                col = keys.map(s)
                df[out_col] = (col.fillna(defaults[out_col])
                               if out_col in defaults else col)
        return pa.Table.from_pandas(df, preserve_index=False)

    return ds.map_batches(enrich, batch_format="pyarrow")


_INT_EXACT_MAX = 1 << 53  # float64 integer-exactness bound


def _guard_int_precision(col, name: str):
    """The tagged union pads each side's carry columns with the OTHER
    side's nulls, so the per-bucket pandas frame holds integer columns
    as float64 — exact only to 2^53. A 64-bit id beyond that would round
    SILENTLY (wrong join output, no error); refuse loudly and tell the
    caller to carry the column as a string instead."""
    import pyarrow.compute as pc

    mm = pc.min_max(col)
    lo, hi = mm["min"].as_py(), mm["max"].as_py()
    if lo is not None and (abs(lo) > _INT_EXACT_MAX
                           or abs(hi) > _INT_EXACT_MAX):
        raise ValueError(
            f"join carry column {name!r} holds integers beyond 2^53 "
            f"(min={lo}, max={hi}); the null-padded per-bucket pandas "
            "frame would round them silently — cast the column to "
            "string before the join to carry full 64-bit values")


def bucketed_inner_join(left_ds, right_ds, left_key: str, right_key: str,
                        left_cols: list[str], right_cols: list[str],
                        post=None, out_schema: pa.Schema | None = None,
                        n_buckets: int | None = None):
    """Hash-partitioned inner join of two large Datasets.

    Both sides are tagged (stringified key + side + projected columns,
    padded to a shared schema), unioned, and co-grouped by key hash;
    each bucket runs one vectorized ``pandas.merge``. ``post(merged_df)``
    optionally reduces inside the bucket (pre-aggregation before any
    further exchange — give it the partial-aggregate, not the row
    emitter, whenever the final result is an aggregate).

    Skew: identical keys must co-locate, so a hot key concentrates in one
    bucket by necessity; ``post`` sees the whole key group and can sample
    or pre-aggregate it (grouped_apply's bucket count only caps how many
    DISTINCT keys share a task)."""
    overlap = set(left_cols) & set(right_cols)
    if overlap:
        raise ValueError(f"join columns must be disjoint, got {overlap}")
    lsch = dict(zip(left_ds.schema().names, left_ds.schema().types))
    rsch = dict(zip(right_ds.schema().names, right_ds.schema().types))
    lfields = [(c, lsch[c]) for c in left_cols]
    rfields = [(c, rsch[c]) for c in right_cols]

    def tag(side: str, key_col: str, present: list, absent: list):
        def f(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            # SQL inner-join semantics: NULL keys never match (pandas
            # merge would pair NaN==NaN) — drop them before the shuffle;
            # skip the filter copy on the common all-valid batch
            if b.column(key_col).null_count:
                b = b.filter(pc.is_valid(b.column(key_col)))
            n = b.num_rows
            cols = {
                "__key": _key_str(b.column(key_col)),
                "__side": pa.array([side] * n, pa.string()),
            }
            for name, typ in lfields + rfields:
                if (name, typ) in present:
                    col = b.column(name).combine_chunks()
                    if pa.types.is_integer(typ) and n:
                        _guard_int_precision(col, name)
                    cols[name] = col
                else:
                    cols[name] = pa.nulls(n, typ)
            return pa.table(cols)
        return f

    tagged = left_ds.map_batches(
        tag("l", left_key, lfields, rfields),
        batch_format="pyarrow").union(
        right_ds.map_batches(
            tag("r", right_key, rfields, lfields),
            batch_format="pyarrow"))

    def reduce_bucket(df: pd.DataFrame) -> pd.DataFrame:
        l = df.loc[df["__side"] == "l", ["__key"] + left_cols]
        r = df.loc[df["__side"] == "r", ["__key"] + right_cols]
        merged = l.merge(r, on="__key").drop(columns="__key")
        return post(merged) if post is not None else merged

    return grouped_apply_fast(tagged, "__key", reduce_bucket,
                         n_buckets=n_buckets, out_schema=out_schema)


def bucketed_asof_join(left_ds, right_ds, left_key: str, right_key: str,
                       left_ts: str, right_ts: str,
                       left_cols: list[str], right_cols: list[str],
                       right_tie: str | None = None,
                       post=None, out_schema: pa.Schema | None = None,
                       n_buckets: int | None = None):
    """Backward AS-OF left join of two large Datasets: every left row is
    joined to the single most recent right row of the same key whose
    timestamp is <= the left timestamp (left rows with no match keep
    nulls). The classic "attribute event to preceding touchpoint" /
    "price as of trade time" operator.

    Same physical shape as ``bucketed_inner_join``: tag + union + ONE
    co-group exchange; inside each bucket a vectorized
    ``pandas.merge_asof`` resolves all keys of the bucket at once.

    Tie-break: among right rows sharing the match timestamp the row with
    the greatest ``right_tie`` wins (sort-last), making the join
    deterministic; pass the right side's unique id. Null timestamps AND
    null keys never match (right nulls dropped, left nulls keep null
    attachments — SQL semantics, not pandas NaN==NaN grouping)."""
    overlap = set(left_cols) & set(right_cols)
    if overlap:
        raise ValueError(f"join columns must be disjoint, got {overlap}")
    lsch = dict(zip(left_ds.schema().names, left_ds.schema().types))
    rsch = dict(zip(right_ds.schema().names, right_ds.schema().types))
    ts_type = lsch[left_ts]
    lfields = [(c, lsch[c]) for c in left_cols]
    rfields = [(c, rsch[c]) for c in right_cols]

    def tag(side: str, key_col: str, ts_col: str, present: list):
        present_names = {name for name, _ in present}

        def f(b: pa.Table) -> pa.Table:
            n = b.num_rows
            cols = {
                "__key": _key_str(b.column(key_col)),
                "__side": pa.array([side] * n, pa.string()),
                "__ts": b.column(ts_col).combine_chunks().cast(ts_type),
            }
            for name, typ in lfields + rfields:
                if name in present_names:
                    col = b.column(name).combine_chunks()
                    if pa.types.is_integer(typ) and n:
                        _guard_int_precision(col, name)
                    cols[name] = col
                else:
                    cols[name] = pa.nulls(n, typ)
            return pa.table(cols)
        return f

    tagged = left_ds.map_batches(
        tag("l", left_key, left_ts, lfields),
        batch_format="pyarrow").union(
        right_ds.map_batches(
            tag("r", right_key, right_ts, rfields),
            batch_format="pyarrow"))

    def reduce_bucket(df: pd.DataFrame) -> pd.DataFrame:
        lall = df.loc[df["__side"] == "l", ["__key", "__ts"] + left_cols]
        # SQL semantics: a NULL key matches nothing (merge_asof's by=
        # would group NaN==NaN) — null-key left rows keep null
        # attachments exactly like null-ts rows; null-key right rows drop
        no_match = lall["__ts"].isna() | lall["__key"].isna()
        l_null = lall[no_match]
        l = lall[~no_match].sort_values("__ts", kind="stable")
        r = (df.loc[df["__side"] == "r", ["__key", "__ts"] + right_cols]
             .dropna(subset=["__key", "__ts"])
             .rename(columns={"__ts": "__rts"}))
        r = r.sort_values(["__rts"] + ([right_tie] if right_tie else []),
                          kind="stable")
        if len(l) == 0:
            merged = l.assign(
                __rts=pd.Series([], dtype=r["__rts"].dtype),
                **{c: pd.Series([], dtype=r[c].dtype) for c in right_cols})
        else:
            merged = pd.merge_asof(l, r, left_on="__ts", right_on="__rts",
                                   by="__key", direction="backward")
        if len(l_null):
            merged = pd.concat([merged, l_null], ignore_index=True)
        merged = merged.drop(columns="__key")
        return post(merged) if post is not None else merged

    return grouped_apply_fast(tagged, "__key", reduce_bucket,
                         n_buckets=n_buckets, out_schema=out_schema)


def bucketed_range_count(left_ds, right_ds, left_ts: str, right_ts: str,
                         band_us: int, left_cols: list[str],
                         out_count: str = "n_in_band",
                         n_buckets: int | None = None,
                         out_schema: pa.Schema | None = None):
    """Band join (count flavor): for every left row, the number of right
    rows whose timestamp lies in [left_ts − band, left_ts + band], both
    ends inclusive — with NO join key (the non-equi shape a hash join
    cannot express).

    Plan: tile time into band-width buckets. A right row in bucket b can
    only reach left rows in buckets b−1..b+1, so each right row
    replicates to exactly 3 bucket tags (bounded blow-up, independent of
    skew); left rows carry their single bucket. One co-group exchange by
    bucket tile, then each tile sorts its right timestamps once and
    answers all its left rows with two vectorized ``searchsorted``
    probes — O((L+R)·log R) per tile, never O(L·R).

    Timestamps are compared as int64 microseconds (exact); null
    timestamps on either side are dropped."""
    ts_i64 = "__ts_us"

    def tag_left(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        b = b.filter(pc.is_valid(b.column(left_ts)))
        ts = (b.column(left_ts).combine_chunks()
              .cast(pa.timestamp("us")).cast(pa.int64())
              .to_numpy(zero_copy_only=False))
        cols = {
            "__tile": pa.array(ts // band_us, pa.int64()),
            "__side": pa.array(["l"] * b.num_rows, pa.string()),
            ts_i64: pa.array(ts, pa.int64()),
        }
        for c in left_cols:
            col = b.column(c).combine_chunks()
            if pa.types.is_integer(lsch[c]) and b.num_rows:
                _guard_int_precision(col, c)
            cols[c] = col
        return pa.table(cols)

    lsch = dict(zip(left_ds.schema().names, left_ds.schema().types))

    def tag_right(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        b = b.filter(pc.is_valid(b.column(right_ts)))
        ts = (b.column(right_ts).combine_chunks()
              .cast(pa.timestamp("us")).cast(pa.int64())
              .to_numpy(zero_copy_only=False))
        tile = ts // band_us
        # replicate to the 3 reachable tiles
        rep_ts = np.concatenate([ts, ts, ts])
        rep_tile = np.concatenate([tile - 1, tile, tile + 1])
        n = len(rep_ts)
        cols = {
            "__tile": pa.array(rep_tile, pa.int64()),
            "__side": pa.array(["r"] * n, pa.string()),
            ts_i64: pa.array(rep_ts, pa.int64()),
        }
        for c in left_cols:
            cols[c] = pa.nulls(n, lsch[c])
        return pa.table(cols)

    tagged = left_ds.map_batches(
        tag_left, batch_format="pyarrow").union(
        right_ds.map_batches(tag_right, batch_format="pyarrow"))

    def count_tile(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        # a co-group bucket may hold many tiles — resolve each exactly
        for _, g in df.groupby("__tile", sort=False):
            l = g[g["__side"] == "l"]
            if not len(l):
                continue
            r_ts = np.sort(g.loc[g["__side"] == "r", ts_i64].to_numpy())
            lt = l[ts_i64].to_numpy()
            lo = np.searchsorted(r_ts, lt - band_us, side="left")
            hi = np.searchsorted(r_ts, lt + band_us, side="right")
            res = l[left_cols].copy()
            res[out_count] = (hi - lo).astype("int64")
            out.append(res)
        if not out:
            return pd.DataFrame(
                {**{c: pd.Series([], dtype="object") for c in left_cols},
                 out_count: pd.Series([], dtype="int64")})
        return pd.concat(out, ignore_index=True)

    return grouped_apply_fast(tagged, "__tile", count_tile,
                         n_buckets=n_buckets, out_schema=out_schema)


def bloom_anti_join(left_ds, right_ds, left_key: str, right_key: str,
                    left_cols: list[str], m_bits: int = 1 << 20,
                    k: int = 7, n_buckets: int | None = None):
    """EXACT anti-join (left rows with no right-side key match) with a
    Bloom prefilter — the shuffle-minimizing form of the reference's
    completeness anti-join (DataCubePopulationCompleteness semantics,
    checks/keyed.py:240 pattern) for when BOTH sides are large.

    Phase 1 streams the right side into per-batch partial Bloom filters
    (m/8-byte blobs, OR-merged on the driver, ray.put once). Phase 2
    splits the left stream row-locally: keys the filter calls DEFINITELY
    absent are anti-join results immediately — they never enter a
    shuffle; only MAYBE-present keys (true matches + the ~1% false
    positives) go through one bucketed co-group against the right keys
    for exact verification. No false negatives, so the result is exact;
    the shuffle carries ~|matches| + fp·|left| rows instead of |left| +
    |right|.

    Trade-off (explicit): the left side is read twice (once per split) —
    two streaming scans in exchange for an all-to-all shuffle of the
    full stream; at 10^12 rows the scan is the cheap side. Callers
    wanting one scan can materialize the tagged stream instead. The
    RIGHT side's key projection is materialized once (object store,
    spillable) and feeds BOTH the bloom build and the verify union —
    the index side's keys are the small projection by design, and a
    second storage scan of them bought nothing."""
    import ray

    from ..sketches import BloomFilter, merge_blobs

    right_keys = right_ds.select_columns([right_key]).materialize()

    def bloom_partial(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        bf = BloomFilter(m_bits, k)
        # fill_null("None") preserves the historical str(None) key form
        bf.add(pc.fill_null(_key_str(b.column(right_key)), "None")
               .to_numpy(zero_copy_only=False))
        return pa.table({"blob": pa.array([bf.dumps()], pa.binary())})

    blobs = [t.column("blob").to_pylist()
             for t in ray.get(arrow_refs(right_keys
                              .map_batches(bloom_partial,
                                           batch_format="pyarrow")
                              ))]
    bloom_ref = ray.put(merge_blobs([b for chunk in blobs for b in chunk]))

    lsch = dict(zip(left_ds.schema().names, left_ds.schema().types))
    out_fields = [(c, lsch[c]) for c in left_cols]
    out_schema = pa.schema(out_fields)

    # the maybe-branch feeds tag(), which re-reads the key column — keep
    # it in the projection even when the caller's left_cols omit it
    maybe_cols = list(dict.fromkeys(left_cols + [left_key]))

    def split(want_maybe: bool):
        proj = maybe_cols if want_maybe else left_cols

        def f(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            bf = ray.get(bloom_ref)
            keys = (pc.fill_null(_key_str(b.column(left_key)), "None")
                    .to_numpy(zero_copy_only=False))
            maybe = bf.contains(keys)
            mask = maybe if want_maybe else ~maybe
            return b.select(proj).filter(pa.array(mask))
        return f

    definite = left_ds.map_batches(split(False), batch_format="pyarrow")

    def tag(side: str, key_col: str):
        def f(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            cols = {
                "__key": pc.fill_null(_key_str(b.column(key_col)), "None"),
                "__side": pa.array([side] * b.num_rows, pa.string()),
            }
            for name, typ in out_fields:
                if name in b.column_names:
                    col = b.column(name).combine_chunks()
                    if pa.types.is_integer(typ) and b.num_rows:
                        _guard_int_precision(col, name)
                    cols[name] = col
                else:
                    cols[name] = pa.nulls(b.num_rows, typ)
            return pa.table(cols)
        return f

    maybe_tagged = (left_ds.map_batches(split(True), batch_format="pyarrow")
                    .map_batches(tag("l", left_key), batch_format="pyarrow")
                    .union(right_keys
                           .map_batches(tag("r", right_key),
                                        batch_format="pyarrow")))

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        rkeys = set(df.loc[df["__side"] == "r", "__key"])
        l = df[df["__side"] == "l"]
        return l.loc[~l["__key"].isin(rkeys), left_cols]

    survivors = grouped_apply_fast(maybe_tagged, "__key", verify,
                              n_buckets=n_buckets, out_schema=out_schema)
    return definite.union(survivors)
