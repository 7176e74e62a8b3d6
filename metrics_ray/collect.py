"""Driver-side collection of a Dataset's blocks as Arrow tables — via
materialize-then-enumerate, never bare ``to_arrow_refs`` on a lazy plan.

Why: ``Dataset.to_arrow_refs()`` on a not-yet-materialized dataset first
executes the plan (``iter_internal_ref_bundles``), then calls
``schema(fetch_if_missing=True)`` — and because a consumed STREAMING
execution caches no schema on the plan, that builds and EXECUTES a
``limit(1)`` copy of the entire pipeline (ray/data/dataset.py:3410-3425,
:5838-5841).  A limit cannot short-circuit all-to-all stages, so every
driver collection of a shuffle/groupby result silently paid a SECOND full
pipeline run.  ``materialize()`` executes exactly once and caches blocks +
schema; ``to_arrow_refs`` on the materialized dataset is pure zero-copy
ref enumeration.
"""

from __future__ import annotations

import pyarrow as pa


def arrow_refs(ds) -> list:
    """Object refs of ``ds``'s blocks as Arrow tables, executing the plan
    exactly once."""
    from . import quiet_ray_logs

    quiet_ray_logs()  # ray.data's per-dataset config resets logger levels
    return ds.materialize().to_arrow_refs()


def collect_tables(ds) -> list[pa.Table]:
    """Execute once and pull every non-empty block to the driver.

    Driver-collection is the QUERY contract (queries return tables);
    production paths keep bulk rows distributed (violations_sink etc.)."""
    import ray

    return [t for t in ray.get(arrow_refs(ds)) if t.num_rows]


def collect_sorted(ds, sort_keys) -> pa.Table | None:
    """collect_tables + ascending sort — the query-result collection
    contract shared by the docs/rel/embed pipelines (None when the
    pipeline produced no rows)."""
    tables = collect_tables(ds)
    if not tables:
        return None
    return pa.concat_tables(tables).sort_by(
        [(k, "ascending") for k in sort_keys])


def require_nonempty_parquet(path: str, what: str) -> int:
    """Loud-failure gate for source tables: footer-only row count (no
    data page read); raises the check-the-upstream-ingest ValueError on
    an empty table. One definition — every derived source (clips, docs,
    embeddings, images, videos) routes through it, so the contract
    (message wording, footer-only cost) changes in exactly one place.
    Returns the row count for callers that need it."""
    import pyarrow.parquet as pq

    n = pq.read_metadata(path).num_rows
    if n == 0:
        raise ValueError(
            f"{what} table {path!r} is EMPTY — nothing to derive or "
            "validate; check the upstream ingest")
    return n
