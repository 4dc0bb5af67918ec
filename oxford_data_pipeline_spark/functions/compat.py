"""Oracle-compatibility helpers.

The driver hash-compares Spark results against DuckDB on raw values, so
floating aggregates must be bit-stable across engines: both sides round
to 6 decimals (Spark `round` and DuckDB `round` both use half-away-from-
zero, so the results agree except on measure-zero half-way ties).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ROUND_DIGITS = 6


def round6(col: Column | str) -> Column:
    """Round to 6 decimals; +0.0 normalizes -0.0 → 0.0 so hashes agree.

    Oracle SQL mirrors this as ``round(x, 6) + 0``.
    """
    return F.round(col, ROUND_DIGITS) + F.lit(0.0)
