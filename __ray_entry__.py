"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing in
here (or in metrics_ray) calls ray.init() / ray.shutdown().

``entry()`` runs the flagship validation suite over the sf0.001 clip table;
``queries()`` exposes each implemented operator (SURVEY.md §2 inventory) as a
callable(sf_dir); ``oracle_sql()`` gives the DuckDB-equivalent SQL for every
operator whose semantics are SQL-expressible (the clips table is a
deterministic derivation of the ``documents`` view — synth.CLIPS_SQL — so
the oracle recomputes the identical table; audio-bytes checks are Ray-only
and get rows-only verification).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline: full validation suite (stateless + sketch + decode
    + referential + keyed checks) on /root/testdata/sf0.001; returns the
    metric table (one row per check per partition + global roll-ups)."""
    from metrics_ray.pipelines.clips import validate_sf

    report = validate_sf("/root/testdata/sf0.001")
    return report.metrics.to_pandas()


def queries() -> dict[str, Callable[[str], Any]]:
    from metrics_ray.pipelines.queries import VALIDATION_QUERIES

    out: dict[str, Callable[[str], Any]] = {}
    for name, (fn, _sql) in VALIDATION_QUERIES.items():
        out[name] = fn
    return out


def oracle_sql() -> dict[str, str]:
    from metrics_ray.pipelines.queries import VALIDATION_QUERIES

    return {name: sql for name, (fn, sql) in VALIDATION_QUERIES.items()
            if sql is not None}
