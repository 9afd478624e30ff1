"""Numeric kernels shared by the query suites.

``round_sql`` exists because numpy/pandas ``round`` is half-to-EVEN while
DuckDB's ``round()`` is half-AWAY-from-zero: an engine output and its SQL
oracle restatement that round the SAME double with different tie rules
diverge exactly on tie values — a latent mismatch that never fired at
sf0.01 but produced 4 of the 5 sf0.1 gate failures (session 9). The
formula below was verified bit-identical to DuckDB ``round(v, n)`` on
240k samples including exact ties at 2/3/6/9 digits (and equals pyarrow's
``round_mode="half_towards_infinity"``, which despite the name rounds
ties away from zero — matching on the same sample).
"""

from __future__ import annotations

import numpy as np


def round_sql(x, ndigits: int) -> np.ndarray:
    """DuckDB-compatible rounding (ties away from zero) for arrays /
    Series / scalars; returns float64 ndarray (0-d for scalar input)."""
    a = np.asarray(x, dtype=np.float64)
    p = np.float64(10.0**ndigits)
    return np.copysign(np.floor(np.abs(a) * p + np.float64(0.5)) / p, a)
