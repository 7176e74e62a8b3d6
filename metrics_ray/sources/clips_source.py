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


_EXT_READERS = {".parquet": "read_parquet", ".lance": "read_lance",
                ".jsonl": "read_json", ".json": "read_json",
                ".csv": "read_csv"}


def read_any(path: str, columns: list[str] | None = None, **kwargs):
    """Format-dispatching table reader — the analog of the reference's
    multi-serialization ingestion (its Rio/Jena stream parsers accept
    every RDF wire format behind one reader interface; see
    StreamProcessor semantics in SURVEY.md §2.2). Dispatch is by
    extension: parquet (column-pruned at the read), Lance (gated on
    pylance), JSONL, CSV; directories read every same-format file inside.

    Parquet/Lance push ``columns`` into the scan (only the needed columns
    leave storage); row-based JSONL/CSV cannot prune at the read, so the
    projection is applied immediately after parse — the schema seen
    downstream is identical across formats (asserted in
    tests/test_sources.py)."""
    import ray.data as rd

    ext = os.path.splitext(path)[1]
    if os.path.isdir(path) and not path.endswith(".lance"):
        inner = sorted(os.listdir(path))
        exts = {os.path.splitext(f)[1] for f in inner
                if os.path.splitext(f)[1] in _EXT_READERS}
        if len(exts) != 1:
            raise ValueError(f"directory {path} holds {sorted(exts)}; "
                             "expected exactly one readable format")
        ext = exts.pop()
        path = [os.path.join(path, f) for f in inner if f.endswith(ext)]
    if ext not in _EXT_READERS:
        raise ValueError(f"unsupported table format: {ext!r}")
    if ext == ".lance":
        return read_clips(path, columns=columns, **kwargs)
    if ext == ".parquet":
        return rd.read_parquet(path, columns=columns, **kwargs)
    ds = (rd.read_json(path, **kwargs) if ext in (".jsonl", ".json")
          else rd.read_csv(path, **kwargs))
    return ds.select_columns(columns) if columns else ds


def write_jsonl(ds, path: str, **kwargs) -> str:
    """Row-oriented JSONL sink (interchange format for downstream
    tokenizer / loader tooling). Partitioned: one file per block, so a
    resumed or parallel run never contends on a single giant file."""
    ds.write_json(path, **kwargs)
    return path
