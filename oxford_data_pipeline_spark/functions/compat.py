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

    Oracle SQL mirrors this as ``round(x, 6) + 0``. Use for means,
    ratios, stddevs — quantities of magnitude ≲ 1e6 whose cross-engine
    accumulation error is ≪ 5e-7.
    """
    return F.round(col, ROUND_DIGITS) + F.lit(0.0)


def round2(col: Column | str) -> Column:
    """Round to 2 decimals (oracle: ``round(x, 2) + 0``).

    Use for SUMs over large fact tables: a 1e8–1e10-magnitude double
    sum carries ~1e-6..1e-4 of engine-order-dependent error, which
    breaks 6-decimal stability but is far inside 2-decimal stability.
    """
    return F.round(col, 2) + F.lit(0.0)
