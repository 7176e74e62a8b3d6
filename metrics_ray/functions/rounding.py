"""DuckDB-compatible rounding for oracle-compared float outputs.

Python's ``round`` / ``np.round`` use banker's rounding (half to even);
DuckDB's ``round()`` rounds half away from zero. Values that land exactly
on a half ULP of the rounding grid — e.g. a Jaccard of 1/128 = 0.0078125
rounded to 6 decimals — would otherwise differ in the last digit between
the engine and its SQL oracle.

DuckDB computes ``std::round(x * 10^nd) / 10^nd``. C ``round`` is an exact
half-away-from-zero on the scaled double, so we must NOT emulate it with
``floor(|x|*m + 0.5)``: when ``|x|*m`` is at or above 2^52 the ``+ 0.5``
is itself a rounding operation and can bump an already-integral value
(e.g. round_half_away(450359963.4140625, 7)), and just below 0.5 the sum
can round up to 1.0. Instead we take the exact fractional part — for any
finite double f >= 0, ``f - floor(f)`` is exact in IEEE754 — and bump
when it is >= 0.5, which reproduces std::round bit-for-bit."""

from __future__ import annotations

import numpy as np


def round_half_away(x, ndigits: int = 6):
    """Round half away from zero (DuckDB semantics). Works on scalars and
    numpy arrays; always returns float64."""
    m = 10.0 ** ndigits
    a = np.asarray(x, dtype=np.float64)
    f = np.abs(a) * m
    fl = np.floor(f)
    # f - fl is exact for all finite doubles, so the >= 0.5 test is the
    # true mathematical comparison std::round performs.
    r = np.where(f - fl >= 0.5, fl + 1.0, fl)
    out = np.where(np.signbit(a), -r, r) / m
    # DuckDB returns the input unchanged if the scaled round overflowed.
    out = np.where(np.isfinite(out), out, a)
    if np.isscalar(x) or getattr(x, "ndim", 1) == 0:
        return float(out)
    return out
