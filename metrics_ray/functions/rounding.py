"""DuckDB-compatible rounding for oracle-compared float outputs.

Python's ``round`` / ``np.round`` use banker's rounding (half to even);
DuckDB's ``round()`` rounds half away from zero. Values that land exactly
on a half ULP of the rounding grid — e.g. a Jaccard of 1/128 = 0.0078125
rounded to 6 decimals — would otherwise differ in the last digit between
the engine and its SQL oracle."""

from __future__ import annotations

import numpy as np


def round_half_away(x, ndigits: int = 6):
    """Round half away from zero (DuckDB semantics). Works on scalars and
    numpy arrays; always returns float64."""
    m = 10.0 ** ndigits
    a = np.asarray(x, dtype=np.float64)
    out = np.sign(a) * np.floor(np.abs(a) * m + 0.5) / m
    if np.isscalar(x) or getattr(x, "ndim", 1) == 0:
        return float(out)
    return out
