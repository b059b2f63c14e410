"""Exact-arithmetic helpers for cross-engine result parity.

Floating-point SUMs are order-dependent, so a distributed Ray
aggregation and a single-threaded DuckDB oracle would differ in the
last bits and fail value-hash comparison. Rule used by every query in
this repo: never emit a float produced by summing floats. Instead:

  cents(x) = floor(x * 100 + 0.5) as int64

is a deterministic, engine-identical scalar op (the same IEEE double
multiply/add/floor in numpy and DuckDB), and integer sums are exact in
any order. Averages are then emitted as a single double division of
two exact integers (also bit-deterministic).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def cents(x) -> np.ndarray:
    """floor(x*100 + 0.5) -> int64 (numpy array in/out). NaN/None
    raises: int64 has no null, and numpy's astype would otherwise turn
    NaN into INT64_MIN silently — ±9.2e18 garbage in every integer SUM
    where the SQL oracle yields NULL. Null-tolerant callers use
    :func:`cents_arrow`, which propagates Arrow nulls."""
    out = np.floor(np.asarray(x, dtype=np.float64) * 100.0 + 0.5)
    if np.isnan(out).any():
        raise ValueError(
            "cents(): NaN/null amount in a non-nullable int64 kernel; "
            "use cents_arrow (null-propagating) or fill nulls first")
    return out.astype(np.int64)


def cents_arrow(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Arrow-native cents: identical semantics to :func:`cents`."""
    x = pc.cast(col, pa.float64())
    return pc.cast(pc.floor(pc.add(pc.multiply(x, 100.0), 0.5)), pa.int64())


def cents_sql(expr: str) -> str:
    """DuckDB expression mirroring :func:`cents`."""
    return f"CAST(FLOOR(({expr}) * 100 + 0.5) AS BIGINT)"
