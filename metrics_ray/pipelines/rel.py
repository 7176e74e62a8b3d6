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
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from ..checks.keyed import bucketed_anti_join, shuffle_blocks

SESSION_GAP_S = 1800


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, f"{table}.parquet"),
                           columns=columns)


def _collect(ds, sort_keys) -> pa.Table | None:
    import ray

    tables = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    if not tables:
        return None
    return pa.concat_tables(tables).sort_by(
        [(k, "ascending") for k in sort_keys])


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
    out = pre.repartition(shuffle_blocks()).groupby("event_type").aggregate(
        Sum("n_events", alias_name="n_events"),
        Sum("total_value", alias_name="total_value"))
    df = out.to_pandas().sort_values("event_type").reset_index(drop=True)
    return pa.table({
        "event_type": pa.array(df["event_type"], pa.string()),
        "n_events": pa.array(df["n_events"].astype("int64")),
        "total_value": pa.array(df["total_value"].round(6)),
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
    out = pre.repartition(shuffle_blocks()).groupby("day").aggregate(Sum("n_events", alias_name="n_events"))
    df = out.to_pandas().sort_values("day").reset_index(drop=True)
    return pa.table({
        "day": pa.array(df["day"], pa.string()),
        "n_events": pa.array(df["n_events"].astype("int64")),
    })


SQL_EV_DAILY_COUNTS = """SELECT CAST(date_trunc('day', ts) AS VARCHAR) AS day,
       COUNT(*) AS n_events
FROM events GROUP BY 1 ORDER BY 1"""


# ------------------------------------------------------------ sessionization

def q_ev_sessions(sf_dir: str) -> pa.Table:
    """Gap sessionization: hash-shuffle by user_id, per-group sort by
    (ts, event_id), new session when gap > 30 min."""
    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="stable")
        gaps = g["ts"].diff().dt.total_seconds()
        n_sessions = int((gaps > SESSION_GAP_S).sum()) + 1
        return pd.DataFrame({
            "user_id": [int(g["user_id"].iloc[0])],
            "n_events": [len(g)],
            "n_sessions": [n_sessions],
        })

    out = (_read(sf_dir, "events", ["user_id", "ts", "event_id"])
           .repartition(shuffle_blocks()).groupby("user_id").map_groups(sessions, batch_format="pandas"))
    return _collect(out, ["user_id"])


SQL_EV_SESSIONS = f"""WITH gaps AS (
    SELECT user_id,
           epoch(ts - lag(ts) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id)) AS gap_s
    FROM events
)
SELECT user_id,
       COUNT(*) AS n_events,
       1 + SUM(CASE WHEN gap_s > {SESSION_GAP_S} THEN 1 ELSE 0 END)
           AS n_sessions
FROM gaps GROUP BY user_id ORDER BY user_id"""


REL_QUERIES = {
    "rel_cust_no_premium_orders": (q_customers_without_orders,
                                   SQL_CUSTOMERS_WITHOUT_ORDERS),
    "ev_type_stats": (q_ev_type_stats, SQL_EV_TYPE_STATS),
    "ev_daily_counts": (q_ev_daily_counts, SQL_EV_DAILY_COUNTS),
    "ev_sessions": (q_ev_sessions, SQL_EV_SESSIONS),
}
