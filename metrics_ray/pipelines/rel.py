"""Relational + event-stream operators over the driver's TPC-H-ish tables:
shuffle anti-join referential integrity, pre-aggregated groupby rollups,
tumbling-window counts, and gap-based sessionization.

These exercise the engine's wide operations on the generic tables
(TESTDATA.md) with DuckDB oracles:

  rel_customers_without_orders   hash-bucketed ANTI-JOIN (checks/keyed.py),
                                 the non-broadcastable-side referential path
                                 (DataCubePopulationCompleteness's
                                 gold-standard MINUS observed at scale)
  ev_type_stats                  per-batch partial agg → groupby sum (the
                                 combiner-before-shuffle pattern)
  ev_daily_counts                tumbling 1-day window aggregate
  ev_sessions                    per-user gap sessionization (30-min gap) —
                                 the order-dependent window re-expressed as
                                 groupby(user).map_groups(sort + fold),
                                 SURVEY.md §2.8 (the reference's one
                                 order-dependent operator)
  ev_disjoint_types[_sampled]    per-entity type-set intersection vs a
                                 disjointness rule bank (AdvancedEntities…
                                 DisjointClasses), plus the hash-Bernoulli
                                 entity-bounded estimate flavor
                                 (EstimateSimple…'s reservoir bound)
  ev_purchase_attribution        temporal AS-OF join: each purchase ← the
                                 user's most recent click at-or-before it
                                 (stages/join.py bucketed_asof_join)
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from ..checks.keyed import bucketed_anti_join, shuffle_blocks
from ..functions.rounding import round_half_away
from ..collect import arrow_refs

SESSION_GAP_S = 1800


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, f"{table}.parquet"),
                           columns=columns)


def _collect(ds, sort_keys) -> pa.Table | None:
    from ..collect import collect_sorted

    return collect_sorted(ds, sort_keys)


# ------------------------------------------------------- referential anti-join

PREMIUM_PRICE = 400_000


def q_customers_without_orders(sf_dir: str) -> pa.Table:
    """Left keys (customers) absent from the right index (premium orders)
    via the hash-bucketed anti-join — the right side is filtered at the
    read (predicate + projection pruning) and only (bucket, key) rows
    shuffle."""
    right = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).filter(
        expr=f"o_totalprice > {PREMIUM_PRICE}").select_columns(["o_custkey"])
    out = bucketed_anti_join(
        _read(sf_dir, "customer", ["c_custkey"]),
        right, key="c_custkey", right_key="o_custkey")
    res = _collect(out, ["clip_id"])
    if res is None:
        return pa.table({"c_custkey": pa.array([], pa.int64())})
    ids = sorted(int(x) for x in res.column("clip_id").to_pylist())
    return pa.table({"c_custkey": pa.array(ids, pa.int64())})


SQL_CUSTOMERS_WITHOUT_ORDERS = f"""SELECT c_custkey FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                        WHERE o_totalprice > {PREMIUM_PRICE})
ORDER BY c_custkey"""


# --------------------------------------------------------------- groupby agg

def q_ev_type_stats(sf_dir: str) -> pa.Table:
    """Per-event-type rollup with per-batch pre-aggregation before the
    (tiny) groupby shuffle."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "event_type": b.column("event_type").to_pylist(),
            "value": b.column("value").to_numpy(zero_copy_only=False),
        })
        g = df.groupby("event_type", sort=False).agg(
            n_events=("value", "size"), total_value=("value", "sum"))
        g = g.reset_index()
        return pa.table({
            "event_type": pa.array(g["event_type"], pa.string()),
            "n_events": pa.array(g["n_events"].astype("int64")),
            "total_value": pa.array(g["total_value"].astype("float64")),
        })

    pre = _read(sf_dir, "events", ["event_type", "value"]).map_batches(
        partial, batch_format="pyarrow")
    out = pre.groupby("event_type", num_partitions=shuffle_blocks()).aggregate(
        Sum("n_events", alias_name="n_events"),
        Sum("total_value", alias_name="total_value"))
    df = out.to_pandas().sort_values("event_type").reset_index(drop=True)
    return pa.table({
        "event_type": pa.array(df["event_type"], pa.string()),
        "n_events": pa.array(df["n_events"].astype("int64")),
        "total_value": pa.array(round_half_away(df["total_value"].to_numpy(), 6)),
    })


SQL_EV_TYPE_STATS = """SELECT event_type,
       COUNT(*) AS n_events,
       round(SUM(value), 6) AS total_value
FROM events GROUP BY event_type ORDER BY event_type"""


# ----------------------------------------------------------- tumbling window

def q_ev_daily_counts(sf_dir: str) -> pa.Table:
    """Tumbling 1-day window counts: derive the window key inside
    map_batches, pre-aggregate, shuffle only (day, n) rows."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        ts = b.column("ts").to_pandas()
        day = ts.dt.floor("D").dt.strftime("%Y-%m-%d")
        g = day.value_counts().sort_index()
        return pa.table({
            "day": pa.array(g.index.tolist(), pa.string()),
            "n_events": pa.array(g.to_numpy().astype("int64")),
        })

    pre = _read(sf_dir, "events", ["ts"]).map_batches(
        partial, batch_format="pyarrow")
    out = pre.groupby("day", num_partitions=shuffle_blocks()).aggregate(Sum("n_events", alias_name="n_events"))
    df = out.to_pandas().sort_values("day").reset_index(drop=True)
    return pa.table({
        "day": pa.array(df["day"], pa.string()),
        "n_events": pa.array(df["n_events"].astype("int64")),
    })


SQL_EV_DAILY_COUNTS = """SELECT CAST(date_trunc('day', ts) AS VARCHAR) AS day,
       COUNT(*) AS n_events
FROM events GROUP BY 1 ORDER BY 1"""


# -------------------------------------------------------- broadcast join

def q_segment_revenue(sf_dir: str) -> pa.Table:
    """Revenue per customer market segment: BROADCAST join (the small
    customer→segment map ships once via ray.put and is read inside each
    batch task — no shuffle of the orders side), then pre-agg + tiny
    groupby. The canonical small-side-join pattern at 10^12-row scale."""
    import ray
    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum

    cust = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey", "c_mktsegment"])
    seg_series = pd.Series(
        cust.column("c_mktsegment").to_pylist(),
        index=cust.column("c_custkey").to_numpy(zero_copy_only=False))
    seg_ref = ray.put(seg_series)

    def enrich(b: pa.Table) -> pa.Table:
        seg = ray.get(seg_ref)
        keys = b.column("o_custkey").to_numpy(zero_copy_only=False)
        price = b.column("o_totalprice").to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            # vectorized hash lookup on the broadcast Series (no per-row
            # python dict.get)
            "segment": pd.Series(keys).map(seg).fillna("UNKNOWN").to_numpy(),
            "price": price,
        })
        g = df.groupby("segment", sort=False)["price"].agg(["size", "sum"])
        g = g.reset_index()
        return pa.table({
            "segment": pa.array(g["segment"], pa.string()),
            "n_orders": pa.array(g["size"].astype("int64")),
            "revenue": pa.array(g["sum"].astype("float64")),
        })

    pre = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        enrich, batch_format="pyarrow")
    out = pre.groupby("segment", num_partitions=shuffle_blocks()).aggregate(
        Sum("n_orders", alias_name="n_orders"),
        Sum("revenue", alias_name="revenue"))
    df = out.to_pandas().sort_values("segment").reset_index(drop=True)
    return pa.table({
        "segment": pa.array(df["segment"], pa.string()),
        "n_orders": pa.array(df["n_orders"].astype("int64")),
        "revenue": pa.array(round_half_away(df["revenue"].to_numpy(), 4)),
    })


SQL_SEGMENT_REVENUE = """SELECT c.c_mktsegment AS segment,
       COUNT(*) AS n_orders,
       round(SUM(o.o_totalprice), 4) AS revenue
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY 1 ORDER BY 1"""


# ---------------------------------------------------------- sliding window

def q_ev_sliding_counts(sf_dir: str) -> pa.Table:
    """Sliding 2-day window (1-day step) event counts: each event expands
    to the windows containing it inside map_batches, then pre-agg +
    groupby — the flat-map windowing pattern."""
    from ray.data.aggregate import Sum

    def windows(b: pa.Table) -> pa.Table:
        ts = b.column("ts").to_pandas()
        day0 = ts.dt.floor("D")
        frames = []
        for off in (0, 1):  # window starts: day and day-1
            start = day0 - pd.Timedelta(days=off)
            frames.append(start.dt.strftime("%Y-%m-%d"))
        win = pd.concat(frames, ignore_index=True)
        g = win.value_counts().sort_index()
        return pa.table({
            "window_start": pa.array(g.index.tolist(), pa.string()),
            "n_events": pa.array(g.to_numpy().astype("int64")),
        })

    pre = _read(sf_dir, "events", ["ts"]).map_batches(
        windows, batch_format="pyarrow")
    out = pre.groupby("window_start", num_partitions=shuffle_blocks()).aggregate(
        Sum("n_events", alias_name="n_events"))
    df = out.to_pandas().sort_values("window_start").reset_index(drop=True)
    return pa.table({
        "window_start": pa.array(df["window_start"], pa.string()),
        "n_events": pa.array(df["n_events"].astype("int64")),
    })


SQL_EV_SLIDING_COUNTS = """WITH expanded AS (
    SELECT CAST(CAST(date_trunc('day', ts) AS DATE) AS VARCHAR)
        AS window_start FROM events
    UNION ALL
    SELECT CAST(CAST(date_trunc('day', ts) - INTERVAL 1 DAY AS DATE)
        AS VARCHAR) FROM events
)
SELECT window_start, COUNT(*) AS n_events
FROM expanded GROUP BY 1 ORDER BY 1"""


def q_ev_sliding_distinct(sf_dir: str) -> pa.Table:
    """EXACT distinct users per sliding 2-day window (1-day step) — the
    windowed distinct-aggregation every usage-telemetry pipeline needs.

    Scale shape: each batch emits its DISTINCT (window_start, user_id)
    pairs (combiner: per-batch dedupe, so the exchange carries at most one
    row per pair per batch, never the event stream); one co-group on
    window_start and a vectorized nunique per bucket. Exact per-window
    distincts hold each window's user set only inside its bucket; for
    windows whose user cardinality outgrows a worker, the HLL sketch path
    (checks/agg.distinct_per_key, ~0.8% err) is the drop-in estimate —
    same shuffle shape, O(registers) state."""
    from ..checks.keyed import grouped_apply_fast

    def pairs(b: pa.Table) -> pa.Table:
        ts = b.column("ts").to_pandas()
        uid = b.column("user_id").to_numpy(zero_copy_only=False)
        day0 = ts.dt.floor("D")
        frames = []
        for off in (0, 1):
            start = (day0 - pd.Timedelta(days=off)).dt.strftime("%Y-%m-%d")
            frames.append(pd.DataFrame({"window_start": start,
                                        "user_id": uid}))
        df = pd.concat(frames, ignore_index=True).drop_duplicates()
        return pa.table({
            "window_start": pa.array(df["window_start"], pa.string()),
            "user_id": pa.array(df["user_id"].astype("int64")),
        })

    def nunique(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby("window_start", sort=False)["user_id"].nunique()
             .reset_index(name="n_users"))
        return pd.DataFrame({"window_start": g["window_start"],
                             "n_users": g["n_users"].astype("int64")})

    pre = _read(sf_dir, "events", ["ts", "user_id"]).map_batches(
        pairs, batch_format="pyarrow")
    out = grouped_apply_fast(pre, "window_start", nunique,
                        out_schema=pa.schema([
                            ("window_start", pa.string()),
                            ("n_users", pa.int64())]))
    t = _collect(out, ["window_start"])
    if t is None:
        return pa.table({"window_start": pa.array([], pa.string()),
                         "n_users": pa.array([], pa.int64())})
    return pa.table({
        "window_start": t.column("window_start"),
        "n_users": t.column("n_users").cast(pa.int64()),
    })


SQL_EV_SLIDING_DISTINCT = """WITH expanded AS (
    SELECT CAST(CAST(date_trunc('day', ts) AS DATE) AS VARCHAR)
        AS window_start, user_id FROM events
    UNION ALL
    SELECT CAST(CAST(date_trunc('day', ts) - INTERVAL 1 DAY AS DATE)
        AS VARCHAR), user_id FROM events
)
SELECT window_start, COUNT(DISTINCT user_id) AS n_users
FROM expanded GROUP BY 1 ORDER BY 1"""


# ------------------------------------------------------------ sessionization

_SESSIONS_SCHEMA = pa.schema([("user_id", pa.int64()),
                              ("n_events", pa.int64()),
                              ("n_sessions", pa.int64())])


def q_ev_sessions(sf_dir: str) -> pa.Table:
    """Gap sessionization: hash-BUCKET by user_id (grouped_apply — one
    vectorized pandas fold per coarse bucket, never a python dispatch per
    user), sort each bucket by (user_id, ts, event_id), new session when
    the within-user gap > 30 min.

    user_id is high-cardinality, so the per-key
    ``groupby(user).map_groups`` shape costs a python call + DataFrame
    per user — the exact anti-pattern grouped_apply exists to avoid; the
    bucketed fold keeps identical semantics (keys only need co-location)."""
    from ..checks.keyed import grouped_apply_fast

    def sessions_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
        gap = df.groupby("user_id", sort=False)["ts"].diff().dt.total_seconds()
        g = (df.assign(brk=(gap > SESSION_GAP_S))
             .groupby("user_id", sort=False)
             .agg(n_events=("ts", "size"), brk=("brk", "sum"))
             .reset_index())
        return pd.DataFrame({
            "user_id": g["user_id"].astype("int64"),
            "n_events": g["n_events"].astype("int64"),
            "n_sessions": (g["brk"] + 1).astype("int64"),
        })

    out = grouped_apply_fast(
        _read(sf_dir, "events", ["user_id", "ts", "event_id"]),
        "user_id", sessions_bucket, out_schema=_SESSIONS_SCHEMA)
    return _collect(out, ["user_id"])


SQL_EV_SESSIONS = f"""WITH gaps AS (
    SELECT user_id,
           epoch(ts - lag(ts) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id)) AS gap_s
    FROM events
)
SELECT user_id,
       COUNT(*) AS n_events,
       CAST(1 + SUM(CASE WHEN gap_s > {SESSION_GAP_S} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_sessions
FROM gaps GROUP BY user_id ORDER BY user_id"""


# ------------------------------------------------------------ 3-way joins

def q_nation_revenue(sf_dir: str) -> pa.Table:
    """Revenue per customer NATION — the 3-table enrichment
    (ExtendedProvenanceMetric.java:56-155: agent→entity→activity chain):
    orders ⋈ customer ⋈ nation as ONE broadcast_enrich pass (both
    dimension sides ship once; chained vectorized lookups inside the
    batch), then partial-agg → tiny groupby."""
    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum

    from ..stages.join import broadcast_enrich

    cust = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey", "c_nationkey"])
    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"),
                           columns=["n_nationkey", "n_name"])
    enriched = broadcast_enrich(
        _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]),
        [(cust, "o_custkey", "c_custkey", {"nationkey": "c_nationkey"}),
         (nation, "nationkey", "n_nationkey", {"nation": "n_name"})])

    def partial(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        g = (df.groupby("nation", sort=False)["o_totalprice"]
             .agg(["size", "sum"]).reset_index())
        return pa.table({
            "nation": pa.array(g["nation"], pa.string()),
            "n_orders": pa.array(g["size"].astype("int64")),
            "revenue": pa.array(g["sum"].astype("float64")),
        })

    out = (enriched.map_batches(partial, batch_format="pyarrow")
           .groupby("nation", num_partitions=shuffle_blocks()).aggregate(
               Sum("n_orders", alias_name="n_orders"),
               Sum("revenue", alias_name="revenue")))
    df = out.to_pandas().sort_values("nation").reset_index(drop=True)
    return pa.table({
        "nation": pa.array(df["nation"], pa.string()),
        "n_orders": pa.array(df["n_orders"].astype("int64")),
        "revenue": pa.array(round_half_away(df["revenue"].to_numpy(), 4)),
    })


SQL_NATION_REVENUE = """SELECT n.n_name AS nation,
       COUNT(*) AS n_orders,
       round(SUM(o.o_totalprice), 4) AS revenue
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY 1 ORDER BY 1"""


def q_region_brand_revenue(sf_dir: str) -> pa.Table:
    """Discounted revenue per (supplier REGION, part BRAND) — the TPC-H
    Q9-shaped star join over every remaining dimension table (part,
    supplier, nation, region) as ONE streaming pass: four chained
    broadcast lookups inside the batch (each dimension ships once via
    ray.put; supplier→nation→region chains through derived columns),
    then partial-agg → tiny groupby. The fact side (lineitem) is never
    shuffled; output is O(regions × brands)."""
    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum

    from ..stages.join import broadcast_enrich

    part = pq.read_table(os.path.join(sf_dir, "part.parquet"),
                         columns=["p_partkey", "p_brand"])
    supp = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                         columns=["s_suppkey", "s_nationkey"])
    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"),
                           columns=["n_nationkey", "n_regionkey"])
    region = pq.read_table(os.path.join(sf_dir, "region.parquet"),
                           columns=["r_regionkey", "r_name"])
    enriched = broadcast_enrich(
        _read(sf_dir, "lineitem",
              ["l_partkey", "l_suppkey", "l_extendedprice", "l_discount"]),
        [(part, "l_partkey", "p_partkey", {"brand": "p_brand"}),
         (supp, "l_suppkey", "s_suppkey", {"nationkey": "s_nationkey"}),
         (nation, "nationkey", "n_nationkey", {"regionkey": "n_regionkey"}),
         (region, "regionkey", "r_regionkey", {"region": "r_name"})])

    def partial(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        df = df[df["brand"].notna() & df["region"].notna()]
        df = df.assign(rev=df["l_extendedprice"] * (1.0 - df["l_discount"]))
        g = (df.groupby(["region", "brand"], sort=False)["rev"]
             .agg(["size", "sum"]).reset_index())
        return pa.table({
            "region": pa.array(g["region"].astype(str), pa.string()),
            "brand": pa.array(g["brand"].astype(str), pa.string()),
            "n_items": pa.array(g["size"].astype("int64")),
            "revenue": pa.array(g["sum"].astype("float64")),
        })

    out = (enriched.map_batches(partial, batch_format="pyarrow")
           .groupby(["region", "brand"], num_partitions=shuffle_blocks())
           .aggregate(Sum("n_items", alias_name="n_items"),
                      Sum("revenue", alias_name="revenue")))
    df = out.to_pandas().sort_values(["region", "brand"]).reset_index(drop=True)
    return pa.table({
        "region": pa.array(df["region"], pa.string()),
        "brand": pa.array(df["brand"], pa.string()),
        "n_items": pa.array(df["n_items"].astype("int64")),
        "revenue": pa.array(round_half_away(df["revenue"].to_numpy(), 4)),
    })


SQL_REGION_BRAND_REVENUE = """SELECT r.r_name AS region,
       p.p_brand AS brand,
       COUNT(*) AS n_items,
       round(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY 1, 2 ORDER BY 1, 2"""


def q_priority_revenue(sf_dir: str) -> pa.Table:
    """Discounted revenue per order priority — the LARGE ⋈ LARGE join
    (lineitem ⋈ orders, neither broadcastable at scale): one bucketed
    hash co-group on the order key with the per-bucket reducer emitting
    PARTIAL aggregates (priority, n, revenue), then a tiny global
    groupby. Shuffle payload = 4 projected columns, never full rows."""
    from ray.data.aggregate import Sum

    from ..stages.join import bucketed_inner_join

    def post(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(rev=df["l_extendedprice"] * (1.0 - df["l_discount"]))
        g = (df.groupby("o_orderpriority", sort=False)["rev"]
             .agg(["size", "sum"]).reset_index())
        return pd.DataFrame({
            "priority": g["o_orderpriority"].astype(str),
            "n_items": g["size"].astype("int64"),
            "revenue": g["sum"].astype("float64"),
        })

    joined = bucketed_inner_join(
        _read(sf_dir, "lineitem",
              ["l_orderkey", "l_extendedprice", "l_discount"]),
        _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"]),
        left_key="l_orderkey", right_key="o_orderkey",
        left_cols=["l_extendedprice", "l_discount"],
        right_cols=["o_orderpriority"],
        post=post,
        out_schema=pa.schema([("priority", pa.string()),
                              ("n_items", pa.int64()),
                              ("revenue", pa.float64())]))
    out = joined.groupby("priority", num_partitions=shuffle_blocks()).aggregate(
        Sum("n_items", alias_name="n_items"),
        Sum("revenue", alias_name="revenue"))
    df = out.to_pandas().sort_values("priority").reset_index(drop=True)
    return pa.table({
        "priority": pa.array(df["priority"], pa.string()),
        "n_items": pa.array(df["n_items"].astype("int64")),
        "revenue": pa.array(round_half_away(df["revenue"].to_numpy(), 4)),
    })


SQL_PRIORITY_REVENUE = """SELECT o.o_orderpriority AS priority,
       COUNT(*) AS n_items,
       round(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY 1 ORDER BY 1"""


# -------------------------------------------------- group-wise top-N

TOP_ORDERS_N = 3


def q_segment_top_orders(sf_dir: str) -> pa.Table:
    """Top-N rows per group (the window-rank `row_number() <= N` family):
    the N most expensive orders per customer market segment.

    Scale shape: segment attaches via broadcast_enrich (dimension ships
    once), then every batch keeps only its LOCAL top-N per segment — a
    combiner that bounds the exchange to N×|segments| rows per batch
    regardless of input size — and one final reduce takes the global
    head. Ties are broken by (price DESC, orderkey ASC) so the result is
    deterministic."""
    import pyarrow.parquet as pq

    from ..stages.join import broadcast_enrich

    cust = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey", "c_mktsegment"])
    enriched = broadcast_enrich(
        _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"]),
        [(cust, "o_custkey", "c_custkey", {"segment": "c_mktsegment"})])

    def local_topn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.dropna(subset=["segment"]).sort_values(
            ["segment", "o_totalprice", "o_orderkey"],
            ascending=[True, False, True], kind="stable")
        return (df.groupby("segment", sort=False).head(TOP_ORDERS_N)
                [["segment", "o_orderkey", "o_totalprice"]])

    parts = _collect(
        enriched.map_batches(local_topn, batch_format="pandas"),
        ["segment"])
    if parts is None:
        return pa.table({"segment": pa.array([], pa.string()),
                         "rn": pa.array([], pa.int64()),
                         "o_orderkey": pa.array([], pa.int64()),
                         "o_totalprice": pa.array([], pa.float64())})
    df = (parts.to_pandas().sort_values(
        ["segment", "o_totalprice", "o_orderkey"],
        ascending=[True, False, True], kind="stable")
        .groupby("segment", sort=False).head(TOP_ORDERS_N)
        .reset_index(drop=True))
    rn = df.groupby("segment", sort=False).cumcount() + 1
    return pa.table({
        "segment": pa.array(df["segment"], pa.string()),
        "rn": pa.array(rn.to_numpy(), pa.int64()),
        "o_orderkey": pa.array(df["o_orderkey"].astype("int64")),
        "o_totalprice": pa.array(df["o_totalprice"].astype("float64")),
    })


SQL_SEGMENT_TOP_ORDERS = f"""SELECT segment, rn, o_orderkey, o_totalprice
FROM (
    SELECT c.c_mktsegment AS segment, o.o_orderkey, o.o_totalprice,
           row_number() OVER (PARTITION BY c.c_mktsegment
                              ORDER BY o.o_totalprice DESC,
                                       o.o_orderkey) AS rn
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
)
WHERE rn <= {TOP_ORDERS_N}
ORDER BY segment, rn"""


# --------------------------------------------------------- as-of join

_ATTRIB_SCHEMA = pa.schema([("event_id", pa.int64()),
                            ("user_id", pa.int64()),
                            ("click_id", pa.int64()),
                            ("gap_us", pa.int64())])


def q_ev_purchase_attribution(sf_dir: str) -> pa.Table:
    """Touchpoint attribution via the temporal AS-OF join
    (stages/join.py bucketed_asof_join): every purchase event is joined
    to the same user's most recent click at-or-before the purchase time
    (latest click_id wins a timestamp tie; purchases with no prior click
    keep nulls). Both sides are filtered + projected at the read; shuffle
    payload = (key, ts, id) only."""
    from ..stages.join import bucketed_asof_join

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id",
                                  "event_type"])
    purchases = (ev.filter(expr="event_type == 'purchase'")
                 .select_columns(["event_id", "ts", "user_id"]))
    clicks = (ev.filter(expr="event_type == 'click'")
              .select_columns(["event_id", "ts", "user_id"])
              .rename_columns({"event_id": "click_id"}))

    def typed(merged: pd.DataFrame) -> pd.DataFrame:
        m = merged["__rts"].notna().to_numpy()
        lts = merged["__ts"].to_numpy().astype("datetime64[us]").astype(
            "int64")
        rts = np.where(m, merged["__rts"].to_numpy()
                       .astype("datetime64[us]").astype("int64"), 0)
        return pd.DataFrame({
            "event_id": merged["event_id"].astype("int64"),
            "user_id": merged["user_id"].astype("int64"),
            "click_id": merged["click_id"].astype("Int64"),
            "gap_us": pd.Series(np.where(m, lts - rts, 0))
                        .mask(~m).astype("Int64"),
        })

    out = bucketed_asof_join(
        purchases, clicks, left_key="user_id", right_key="user_id",
        left_ts="ts", right_ts="ts",
        left_cols=["event_id", "user_id"], right_cols=["click_id"],
        right_tie="click_id", post=typed, out_schema=_ATTRIB_SCHEMA)
    res = _collect(out, ["event_id"])
    if res is None:
        return _ATTRIB_SCHEMA.empty_table()
    # drop the pandas-dtype schema metadata so nullable ints round-trip
    # as plain arrow int64 (to_pandas → NaN like every SQL engine, not
    # pd.NA), keeping the driver's value comparison dtype-uniform
    return res.replace_schema_metadata(None)


SQL_EV_PURCHASE_ATTRIBUTION = """WITH c AS (
    SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'
), p AS (
    SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id AS event_id,
       p.user_id AS user_id,
       c.event_id AS click_id,
       CAST(epoch_us(p.ts) - epoch_us(c.ts) AS BIGINT) AS gap_us
FROM p LEFT JOIN c ON c.user_id = p.user_id AND c.ts <= p.ts
QUALIFY row_number() OVER (PARTITION BY p.event_id
                           ORDER BY c.ts DESC, c.event_id DESC) = 1
ORDER BY event_id"""


# --------------------------------------------------------- range join

BURST_BAND_US = 15 * 60 * 1_000_000  # ±15 min


def q_ev_click_burst(sf_dir: str) -> pa.Table:
    """Temporal RANGE join (stages/join.py bucketed_range_count): for
    every purchase event, the number of click events — by ANY user —
    within ±15 minutes. No join key exists, so a hash join can't express
    it; the band-tiling plan bounds the exchange at 3× the click rows
    and resolves each tile with two vectorized searchsorted probes."""
    from ..stages.join import bucketed_range_count

    ev = _read(sf_dir, "events", ["event_id", "ts", "event_type"])
    purchases = (ev.filter(expr="event_type == 'purchase'")
                 .select_columns(["event_id", "ts"]))
    clicks = (ev.filter(expr="event_type == 'click'")
              .select_columns(["ts"]))
    out = bucketed_range_count(
        purchases, clicks, left_ts="ts", right_ts="ts",
        band_us=BURST_BAND_US, left_cols=["event_id"],
        out_count="n_clicks",
        out_schema=pa.schema([("event_id", pa.int64()),
                              ("n_clicks", pa.int64())]))
    res = _collect(out, ["event_id"])
    if res is None:
        return pa.table({"event_id": pa.array([], pa.int64()),
                         "n_clicks": pa.array([], pa.int64())})
    return res


SQL_EV_CLICK_BURST = """WITH c AS (
    SELECT ts FROM events WHERE event_type = 'click'
), p AS (
    SELECT event_id, ts FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id, COUNT(c.ts) AS n_clicks
FROM p LEFT JOIN c
  ON c.ts BETWEEN p.ts - INTERVAL 15 MINUTE
              AND p.ts + INTERVAL 15 MINUTE
GROUP BY p.event_id ORDER BY p.event_id"""


# ------------------------------------ per-entity disjoint-set membership

HIGH_VALUE_T = 150.0
DISJOINT_RULES = (("purchase", "error"), ("signup", "click"))


def _disjoint_types_ds(sf_dir: str, entity_fraction: float | None):
    """Shared pipeline for the disjoint-set check: filter+project at the
    read → per-batch DISTINCT (user_id, event_type) combiner (≤5 types
    per user survive the shuffle) → grouped_apply co-groups each user
    once → vectorized per-bucket rule check (one self-merge per rule,
    never a per-entity python dispatch)."""
    import pyarrow.compute as pc

    from ..checks.keyed import grouped_apply_fast
    from ..stages.sampling import md5_lower64

    thr = (None if entity_fraction is None else
           np.uint64(int(min(max(entity_fraction, 0.0), 1.0)
                         * float(2**64 - 1))))

    def distinct_types(b: pa.Table) -> pa.Table:
        b = b.filter(pc.greater_equal(b.column("value"), HIGH_VALUE_T))
        if thr is not None and b.num_rows:
            # md5 priority == DuckDB md5_number_lower(CAST(user_id AS
            # VARCHAR)) — the sampled entity universe is oracle-checked
            pri = md5_lower64(b.column("user_id").to_pylist())
            b = b.take(pa.array(np.nonzero(pri <= thr)[0]))
        df = (b.select(["user_id", "event_type"]).to_pandas()
              .drop_duplicates())
        return pa.table({
            "user_id": pa.array(df["user_id"].to_numpy(), pa.int64()),
            "event_type": pa.array(df["event_type"], pa.string()),
        })

    def check_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # cross-batch distinct, then one self-merge per disjointness rule
        df = df.drop_duplicates()
        outs = []
        for a, b in DISJOINT_RULES:
            hit = (df.loc[df["event_type"] == a, ["user_id"]]
                   .merge(df.loc[df["event_type"] == b, ["user_id"]],
                          on="user_id"))
            if len(hit):
                outs.append(pd.DataFrame({
                    "user_id": hit["user_id"].astype("int64"),
                    "type_a": a, "type_b": b}))
        if not outs:
            return pd.DataFrame({
                "user_id": pd.Series([], dtype="int64"),
                "type_a": pd.Series([], dtype=str),
                "type_b": pd.Series([], dtype=str)})
        return pd.concat(outs, ignore_index=True)

    ds = (_read(sf_dir, "events", ["user_id", "event_type", "value"])
          .map_batches(distinct_types, batch_format="pyarrow"))
    return grouped_apply_fast(ds, "user_id", check_bucket,
                         out_schema=_DISJOINT_SCHEMA)


_DISJOINT_SCHEMA = pa.schema([("user_id", pa.int64()),
                              ("type_a", pa.string()),
                              ("type_b", pa.string())])


def q_ev_disjoint_types(sf_dir: str) -> pa.Table:
    """Per-entity set-intersection against a broadcast disjointness rule
    bank — AdvancedEntitiesAsMembersOfDisjointClasses.java:44-233 (group
    types by subject, flag subjects whose type set intersects a
    disjointWith pair). Entity = user_id; its "type set" = the distinct
    event_type values among the entity's high-value events; a rule
    (a, b) is violated when both members appear in the set."""
    out = _collect(_disjoint_types_ds(sf_dir, None), ["user_id", "type_a"])
    return out if out is not None else _DISJOINT_SCHEMA.empty_table()


def q_ev_disjoint_types_sampled(sf_dir: str) -> pa.Table:
    """Entity-bounded estimate flavor —
    EstimateSimpleEntitiesAsMembersOfDisjointClasses.java:42-196 bounds
    the entity universe with a 1M reservoir before the same check. The
    mergeable multi-worker analog is a deterministic hash-Bernoulli
    ENTITY sample applied before the shuffle: every partition keeps the
    same entities with zero coordination, and the kept set is stable
    under resume/re-execution (a classic stateful reservoir is not).
    Result = exact violations restricted to the sampled entity universe
    (verified subset-of-full in tests); rate estimates scale by 1/f."""
    out = _collect(_disjoint_types_ds(sf_dir, 0.5), ["user_id", "type_a"])
    return out if out is not None else _DISJOINT_SCHEMA.empty_table()


SQL_EV_DISJOINT_TYPES = f"""WITH t AS (
    SELECT DISTINCT user_id, event_type FROM events
    WHERE value >= {HIGH_VALUE_T}
)
SELECT t1.user_id AS user_id,
       t1.event_type AS type_a,
       t2.event_type AS type_b
FROM t t1 JOIN t t2 USING (user_id)
WHERE (t1.event_type = 'purchase' AND t2.event_type = 'error')
   OR (t1.event_type = 'signup' AND t2.event_type = 'click')
ORDER BY user_id, type_a"""

_DISJOINT_SAMPLE_THR = int(0.5 * float(2**64 - 1))

SQL_EV_DISJOINT_TYPES_SAMPLED = f"""WITH t AS (
    SELECT DISTINCT user_id, event_type FROM events
    WHERE value >= {HIGH_VALUE_T}
      AND md5_number_lower(CAST(user_id AS VARCHAR))
          <= {_DISJOINT_SAMPLE_THR}
)
SELECT t1.user_id AS user_id,
       t1.event_type AS type_a,
       t2.event_type AS type_b
FROM t t1 JOIN t t2 USING (user_id)
WHERE (t1.event_type = 'purchase' AND t2.event_type = 'error')
   OR (t1.event_type = 'signup' AND t2.event_type = 'click')
ORDER BY user_id, type_a"""


# ------------------------------------------------- funnel / retention / Q1

_FUNNEL_STAGES = ("view", "click", "purchase")
_FUNNEL_SCHEMA = pa.schema([("user_id", pa.int64()),
                            ("funnel_depth", pa.int64())])


def q_ev_funnel(sf_dir: str) -> pa.Table:
    """Ordered funnel depth per user (view → click-after-view →
    purchase-after-that-click) — the sequence-analytics fold of product
    pipelines, strictly-ordered timestamps.

    Scale shape: one bucketed co-group on user_id (grouped_apply), then
    three vectorized stage passes inside the bucket (per-user min over
    the stage events filtered by the previous stage's timestamp via an
    indexed merge) — no python-per-user dispatch, no window shuffle."""
    from ..checks.keyed import grouped_apply_fast

    def funnel_bucket(df: pd.DataFrame) -> pd.DataFrame:
        users = df["user_id"].drop_duplicates().sort_values()
        prev = None  # Series: user_id -> ts of previous stage hit
        depth = pd.Series(0, index=users, dtype="int64")
        for i, stage in enumerate(_FUNNEL_STAGES, start=1):
            ev = df[df["event_type"] == stage][["user_id", "ts"]]
            if prev is not None:
                ev = ev.merge(prev.rename("prev_ts"), left_on="user_id",
                              right_index=True)
                ev = ev[ev["ts"] > ev["prev_ts"]]
            hit = ev.groupby("user_id")["ts"].min()
            depth.loc[depth.index.isin(hit.index)] = i
            prev = hit
        return pd.DataFrame({"user_id": depth.index.astype("int64"),
                             "funnel_depth": depth.to_numpy()})

    out = grouped_apply_fast(
        _read(sf_dir, "events", ["user_id", "ts", "event_type"]),
        "user_id", funnel_bucket, out_schema=_FUNNEL_SCHEMA)
    return _collect(out, ["user_id"])


SQL_EV_FUNNEL = """WITH u AS (SELECT DISTINCT user_id FROM events),
v AS (SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id),
c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
      JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id),
p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
      JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id)
SELECT u.user_id,
       CASE WHEN p.user_id IS NOT NULL THEN 3
            WHEN c.user_id IS NOT NULL THEN 2
            WHEN v.user_id IS NOT NULL THEN 1 ELSE 0 END AS funnel_depth
FROM u LEFT JOIN v USING (user_id) LEFT JOIN c USING (user_id)
       LEFT JOIN p USING (user_id)
ORDER BY u.user_id"""


RETENTION_OFFSETS = (0, 1, 7)


def q_ev_retention(sf_dir: str) -> pa.Table:
    """Cohort retention: users grouped by first-activity day, counted on
    day-offsets {0,1,7} — the cohort-analysis staple.

    Scale shape: bucketed co-group on user_id derives each user's cohort
    + distinct active-day offsets vectorized (datetime64[D] arithmetic),
    emits per-bucket (cohort, day_offset, partial n) counts, and a tiny
    groupby-sum merges buckets — the shuffle carries cohort×offset rows,
    never user rows."""
    from ray.data.aggregate import Sum

    from ..checks.keyed import grouped_apply_fast

    def cohort_bucket(df: pd.DataFrame) -> pd.DataFrame:
        day = df["ts"].to_numpy().astype("datetime64[D]")
        d = pd.DataFrame({"user_id": df["user_id"].to_numpy(), "day": day})
        cohort = d.groupby("user_id")["day"].min().rename("cohort")
        d = d.drop_duplicates().merge(cohort, left_on="user_id",
                                      right_index=True)
        d["day_offset"] = (d["day"] - d["cohort"]).dt.days.astype("int64")
        d = d[d["day_offset"].isin(RETENTION_OFFSETS)]
        g = (d.groupby(["cohort", "day_offset"]).size().rename("n_users")
             .reset_index())
        g["cohort"] = g["cohort"].astype(str)
        return g

    out = (grouped_apply_fast(
        _read(sf_dir, "events", ["user_id", "ts"]),
        "user_id", cohort_bucket,
        out_schema=pa.schema([("cohort", pa.string()),
                              ("day_offset", pa.int64()),
                              ("n_users", pa.int64())]))
        .groupby(["cohort", "day_offset"])
        .aggregate(Sum("n_users", alias_name="n_users")))
    return _collect(out, ["cohort", "day_offset"])


SQL_EV_RETENTION = f"""WITH f AS (
    SELECT user_id, CAST(min(date_trunc('day', ts)) AS DATE) AS cohort
    FROM events GROUP BY user_id
),
a AS (
    SELECT DISTINCT e.user_id, f.cohort,
           date_diff('day', f.cohort,
                     CAST(date_trunc('day', e.ts) AS DATE)) AS day_offset
    FROM events e JOIN f USING (user_id)
)
SELECT CAST(cohort AS VARCHAR) AS cohort, day_offset,
       COUNT(*) AS n_users
FROM a WHERE day_offset IN {RETENTION_OFFSETS}
GROUP BY cohort, day_offset ORDER BY cohort, day_offset"""


def q_rel_pricing_summary(sf_dir: str) -> pa.Table:
    """TPC-H-Q1-shaped pricing summary over lineitem: the canonical wide
    multi-aggregate with a per-batch COMBINER — all five measures reduce
    to (flag, status) partials inside map_batches, so the groupby
    shuffles a handful of rows per batch regardless of lineitem size."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        qty = b.column("l_quantity").to_numpy(zero_copy_only=False)
        price = b.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = b.column("l_discount").to_numpy(zero_copy_only=False)
        tax = b.column("l_tax").to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "l_returnflag": b.column("l_returnflag").to_pylist(),
            "l_linestatus": b.column("l_linestatus").to_pylist(),
            "sum_qty": qty,
            "sum_base": price,
            "sum_disc": price * (1.0 - disc),
            "sum_charge": price * (1.0 - disc) * (1.0 + tax),
            "count_order": np.ones(len(b), np.int64),
        })
        return pa.Table.from_pandas(
            df.groupby(["l_returnflag", "l_linestatus"], sort=False)
            .sum().reset_index(), preserve_index=False)

    out = (_read(sf_dir, "lineitem",
                 ["l_returnflag", "l_linestatus", "l_quantity",
                  "l_extendedprice", "l_discount", "l_tax"])
           .map_batches(partial, batch_format="pyarrow")
           .groupby(["l_returnflag", "l_linestatus"],
                    num_partitions=shuffle_blocks())
           .aggregate(Sum("sum_qty", alias_name="sum_qty"),
                      Sum("sum_base", alias_name="sum_base"),
                      Sum("sum_disc", alias_name="sum_disc"),
                      Sum("sum_charge", alias_name="sum_charge"),
                      Sum("count_order", alias_name="count_order")))
    df = out.to_pandas().sort_values(
        ["l_returnflag", "l_linestatus"]).reset_index(drop=True)
    return pa.table({
        "l_returnflag": pa.array(df["l_returnflag"], pa.string()),
        "l_linestatus": pa.array(df["l_linestatus"], pa.string()),
        "sum_qty": pa.array(round_half_away(df["sum_qty"].to_numpy(), 2)),
        "sum_base": pa.array(round_half_away(df["sum_base"].to_numpy(), 2)),
        "sum_disc": pa.array(round_half_away(df["sum_disc"].to_numpy(), 2)),
        "sum_charge": pa.array(
            round_half_away(df["sum_charge"].to_numpy(), 2)),
        "count_order": pa.array(df["count_order"].astype("int64")),
    })


SQL_REL_PRICING_SUMMARY = """SELECT l_returnflag, l_linestatus,
       round(SUM(l_quantity), 2) AS sum_qty,
       round(SUM(l_extendedprice), 2) AS sum_base,
       round(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc,
       round(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
           AS sum_charge,
       COUNT(*) AS count_order
FROM lineitem GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus"""


def q_ev_amount_outliers(sf_dir: str) -> pa.Table:
    """Per-group statistical outlier flagging: events whose value sits
    more than 3 population standard deviations above their type's mean —
    the distribution-based anomaly screen of the drift/quality family
    applied row-wise (every flagged row is a violation candidate, the
    ProblemCollection shape).

    Scale shape (derive-stats-then-scan, the two-pass
    UsageOfIncorrectDomainOrRange pattern): pass 1 folds each batch to
    (type, n, mean, M2) Welford partials — constant rows per batch —
    merged on the driver with Chan's parallel-variance combination (the
    raw E[x^2]-mu^2 form cancels catastrophically for large means and can
    flip the rounded z>3 boundary vs STDDEV_POP's stable two-pass);
    the resulting O(groups) moment table broadcasts via closure; pass 2
    is row-local z-scoring, no exchange. z is rounded to 6 decimals on
    BOTH sides before thresholding so engine and oracle flag identical
    rows."""
    import ray

    def moments(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "event_type": b.column("event_type").to_pylist(),
            "v": b.column("value").to_numpy(zero_copy_only=False),
        })

        def m2(x):
            a = x.to_numpy(dtype=np.float64)
            return float(((a - a.mean()) ** 2).sum())

        g = df.groupby("event_type", sort=False)["v"].agg(
            n="size", mean="mean", M2=m2).reset_index()
        return pa.table({
            "event_type": pa.array(g["event_type"], pa.string()),
            "n": pa.array(g["n"].astype("int64")),
            "mean": pa.array(g["mean"].astype("float64")),
            "M2": pa.array(g["M2"].astype("float64")),
        })

    partial_tables = [t for t in ray.get(arrow_refs(
        _read(sf_dir, "events", ["event_type", "value"])
        .map_batches(moments, batch_format="pyarrow"))) if t.num_rows]
    agg = (pa.concat_tables(partial_tables).to_pandas()
           .sort_values(["event_type", "n", "mean"], kind="stable")
           if partial_tables else pd.DataFrame(
               columns=["event_type", "n", "mean", "M2"]))
    stats = {}
    for etype, sub in agg.groupby("event_type", sort=True):
        n_acc, mean_acc, m2_acc = 0, 0.0, 0.0
        for _, r in sub.iterrows():  # deterministic fold order (sorted)
            nb, mb, m2b = int(r["n"]), float(r["mean"]), float(r["M2"])
            tot = n_acc + nb
            delta = mb - mean_acc
            m2_acc = m2_acc + m2b + delta * delta * n_acc * nb / tot
            mean_acc = mean_acc + delta * nb / tot
            n_acc = tot
        stats[etype] = (mean_acc, float(np.sqrt(m2_acc / n_acc)))

    def scan(b: pa.Table) -> pa.Table:
        ids = b.column("event_id").to_numpy(zero_copy_only=False)
        types = b.column("event_type").to_pylist()
        vals = b.column("value").to_numpy(zero_copy_only=False)
        mu = np.array([stats[t][0] for t in types])
        sd = np.array([stats[t][1] for t in types])
        z = round_half_away((vals - mu) / np.where(sd > 0, sd, 1.0), 6)
        m = (z > 3.0) & (sd > 0)
        return pa.table({
            "event_id": pa.array(ids[m].astype(np.int64)),
            "event_type": pa.array([t for t, k in zip(types, m) if k],
                                   pa.string()),
            "value": pa.array(vals[m].astype(np.float64)),
            "z": pa.array(z[m], pa.float64()),
        })

    out = _read(sf_dir, "events",
                ["event_id", "event_type", "value"]).map_batches(
        scan, batch_format="pyarrow")
    t = _collect(out, ["event_id"])
    if t is None:
        return pa.table({"event_id": pa.array([], pa.int64()),
                         "event_type": pa.array([], pa.string()),
                         "value": pa.array([], pa.float64()),
                         "z": pa.array([], pa.float64())})
    return t


# DuckDB TRY_CAST(VARCHAR AS DOUBLE) literal syntax (no underscores, no
# bare 'nan'/'inf' needed here — fixture payloads are plain JSON numbers)
_DOUBLE_RE = __import__("re").compile(
    r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$")


def json_k_buckets(props: list) -> np.ndarray:
    """Top-level ``k`` field of each JSON blob → decade bucket (int64),
    -1 for unparsable/missing/non-numeric — bit-for-bit the SQL mirror's
    ``floor(TRY_CAST(json_extract_string(props,'$.k') AS DOUBLE)/10)*10``:
    a real JSON parse, so {"k": 1e2} (scientific notation) buckets as 100
    and {"a":{"k":1}} (nested, not top-level) buckets as -1 — cases a
    substring regex mishandles."""
    import json

    out = np.full(len(props), -1, dtype=np.int64)
    for i, p in enumerate(props):
        if not p:
            continue
        try:
            obj = json.loads(p)
        except (ValueError, TypeError):
            continue
        if not isinstance(obj, dict) or "k" not in obj:
            continue
        v = obj["k"]
        if isinstance(v, bool) or v is None:
            continue  # json_extract_string('true') fails TRY_CAST
        if isinstance(v, str):
            # json_extract_string returns the raw string; TRY_CAST parses
            # plain double literals only
            if not _DOUBLE_RE.match(v.strip()):
                continue
            v = float(v)
        elif not isinstance(v, (int, float)):
            continue  # nested object / list
        out[i] = int(np.floor(float(v) / 10.0) * 10)
    return out


def q_ev_props_rollup(sf_dir: str) -> pa.Table:
    """Semi-structured extraction: parse the JSON ``props`` column,
    extract the numeric ``k`` field, and roll up (count, total value)
    per k-decade bucket — the schema-on-read step every event pipeline
    runs over raw property blobs.

    Scale shape: extraction is a real JSON parse (json.loads per row —
    the honest semantic for schema-on-read; a regex shortcut buckets
    scientific-notation or nested-object payloads differently from the
    SQL mirror's json_extract); the rollup is the standard
    combiner-before-shuffle: per-batch partials, tiny groupby-sum. Rows
    whose props don't parse are counted under bucket -1 (violation
    bucket, never silently dropped)."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        bucket = json_k_buckets(b.column("props").to_pylist())
        df = pd.DataFrame({
            "k_bucket": bucket,
            "v": b.column("value").to_numpy(zero_copy_only=False),
        })
        g = df.groupby("k_bucket", sort=False)["v"].agg(
            n="size", total="sum").reset_index()
        return pa.table({
            "k_bucket": pa.array(g["k_bucket"].astype("int64")),
            "n": pa.array(g["n"].astype("int64")),
            "total": pa.array(g["total"].astype("float64")),
        })

    out = (_read(sf_dir, "events", ["props", "value"])
           .map_batches(partial, batch_format="pyarrow")
           .groupby("k_bucket", num_partitions=shuffle_blocks())
           .aggregate(Sum("n", alias_name="n"),
                      Sum("total", alias_name="total"))
           .to_pandas().sort_values("k_bucket").reset_index(drop=True))
    return pa.table({
        "k_bucket": pa.array(out["k_bucket"].astype("int64")),
        "n": pa.array(out["n"].astype("int64")),
        "total": pa.array(round_half_away(out["total"].to_numpy(), 6)),
    })


SQL_EV_PROPS_ROLLUP = """WITH parsed AS (
    SELECT COALESCE(
               CAST(floor(TRY_CAST(json_extract_string(props, '$.k')
                                   AS DOUBLE) / 10) AS BIGINT) * 10,
               -1) AS k_bucket,
           value
    FROM events
)
SELECT k_bucket, COUNT(*) AS n, ROUND(SUM(value), 6) AS total
FROM parsed GROUP BY k_bucket ORDER BY k_bucket"""


SQL_EV_AMOUNT_OUTLIERS = """WITH stats AS (
    SELECT event_type, AVG(value) AS mu, STDDEV_POP(value) AS sigma
    FROM events GROUP BY event_type
)
SELECT e.event_id, e.event_type, e.value,
       ROUND((e.value - s.mu) / s.sigma, 6) AS z
FROM events e JOIN stats s USING (event_type)
WHERE s.sigma > 0 AND ROUND((e.value - s.mu) / s.sigma, 6) > 3
ORDER BY e.event_id"""


REL_QUERIES = {
    "ev_amount_outliers": (q_ev_amount_outliers, SQL_EV_AMOUNT_OUTLIERS),
    "ev_props_rollup": (q_ev_props_rollup, SQL_EV_PROPS_ROLLUP),
    "rel_cust_no_premium_orders": (q_customers_without_orders,
                                   SQL_CUSTOMERS_WITHOUT_ORDERS),
    "rel_segment_revenue": (q_segment_revenue, SQL_SEGMENT_REVENUE),
    "rel_nation_revenue": (q_nation_revenue, SQL_NATION_REVENUE),
    "rel_region_brand_revenue": (q_region_brand_revenue,
                                 SQL_REGION_BRAND_REVENUE),
    "rel_priority_revenue": (q_priority_revenue, SQL_PRIORITY_REVENUE),
    "rel_segment_top_orders": (q_segment_top_orders,
                               SQL_SEGMENT_TOP_ORDERS),
    "ev_type_stats": (q_ev_type_stats, SQL_EV_TYPE_STATS),
    "ev_sliding_counts": (q_ev_sliding_counts, SQL_EV_SLIDING_COUNTS),
    "ev_sliding_distinct": (q_ev_sliding_distinct, SQL_EV_SLIDING_DISTINCT),
    "ev_daily_counts": (q_ev_daily_counts, SQL_EV_DAILY_COUNTS),
    "ev_sessions": (q_ev_sessions, SQL_EV_SESSIONS),
    "ev_disjoint_types": (q_ev_disjoint_types, SQL_EV_DISJOINT_TYPES),
    "ev_purchase_attribution": (q_ev_purchase_attribution,
                                SQL_EV_PURCHASE_ATTRIBUTION),
    "ev_click_burst": (q_ev_click_burst, SQL_EV_CLICK_BURST),
    "ev_disjoint_types_sampled": (q_ev_disjoint_types_sampled,
                                  SQL_EV_DISJOINT_TYPES_SAMPLED),
    "ev_funnel": (q_ev_funnel, SQL_EV_FUNNEL),
    "ev_retention": (q_ev_retention, SQL_EV_RETENTION),
    "rel_pricing_summary": (q_rel_pricing_summary, SQL_REL_PRICING_SUMMARY),
}
