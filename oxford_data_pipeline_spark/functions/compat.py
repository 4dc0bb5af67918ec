"""Oracle-compatibility helpers.

The driver hash-compares Spark results against DuckDB on raw values, so
floating aggregates must be bit-stable across engines. Naive
round(x, d) is NOT stable: inputs have 2 decimals, so aggregate means
frequently land EXACTLY on a half at the d-th decimal, where ~1e-15 of
engine-order summation noise decides the rounding direction.

Convention (mirrored in every oracle SQL):
    round_d(x) = round(x * 10^d + 0.01) / 10^d  (+0 to normalize -0.0)
The +0.01 epsilon is ~100× any cross-engine noise and shifts every
exact-half boundary off the attainable rationals, so both engines
always round the same way; the result is k/10^d — the identical double
in both engines. The ≤1e-8 bias is far below the reported precision.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _round_scaled(col: Column | str, scale: int) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * scale + F.lit(0.01), 0) / scale + F.lit(0.0)


def round6(col: Column | str) -> Column:
    """6-decimal stable rounding (oracle:
    ``round(x * 1000000 + 0.01, 0) / 1000000 + 0``). For means, ratios,
    stddevs — magnitudes ≲ 1e6."""
    return _round_scaled(col, 1_000_000)


def round2(col: Column | str) -> Column:
    """2-decimal stable rounding (oracle:
    ``round(x * 100 + 0.01, 0) / 100 + 0``). For SUMs over large fact
    tables where accumulated noise reaches ~1e-4."""
    return _round_scaled(col, 100)
