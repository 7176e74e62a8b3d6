"""Clip-table source: Lance when available, parquet otherwise.

The production target (BASELINE.json input_hint) stores clips in Lance
tables; this sandbox has no ``lance`` package, so the source is gated
behind an import-try and every pipeline reads through ``read_clips`` — on
a cluster with ``pylance`` installed the same call becomes
``ray.data.read_lance`` with identical downstream semantics (both produce
an Arrow-block Dataset with projection pruning).
"""

from __future__ import annotations

import os


def lance_available() -> bool:
    try:
        import lance  # noqa: F401

        return True
    except ImportError:
        return False


def read_clips(path: str, columns: list[str] | None = None, **kwargs):
    """Read a clips table from ``path``: a Lance dataset dir (``.lance``),
    a parquet dir, or a parquet file list."""
    import ray.data as rd

    if isinstance(path, str) and path.endswith(".lance"):
        if not lance_available():
            raise RuntimeError(
                "Lance dataset requested but the lance package is not "
                "installed; install pylance or point at parquet")
        return rd.read_lance(path, columns=columns, **kwargs)
    if isinstance(path, str) and os.path.isdir(path):
        files = [os.path.join(path, f) for f in sorted(os.listdir(path))
                 if f.endswith(".parquet")]
        return rd.read_parquet(files, columns=columns, **kwargs)
    return rd.read_parquet(path, columns=columns, **kwargs)
