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


def floor_div_sql(expr: str, divisor: int) -> str:
    """Spark-SQL snippet for exact int64 FLOOR division of ``expr`` by
    a positive ``divisor`` — the day/week-grain calendar contract.

    Both Spark's ``DIV`` and DuckDB's integer ``//`` truncate toward
    zero (measured — DuckDB only floors for FLOAT operands), so a bare
    quotient puts a pre-epoch evening (e.g. 1969-12-31T18:00, day
    -0.25) on day 0 alongside 1970-01-01 (r13 advisor item 2).  The
    calendar grain must FLOOR.  Subtracting ``pmod`` (always
    non-negative) first makes the numerator an exact multiple of the
    divisor, so truncating division returns the true floor quotient in
    pure int64 arithmetic — no double round-trip, which would lose ns
    precision above 2^53."""
    return f"(({expr}) - pmod(({expr}), {divisor})) DIV {divisor}"


def oracle_floor_div_sql(expr: str, divisor: int) -> str:
    """DuckDB twin of :func:`floor_div_sql`: DuckDB's integer ``//``
    truncates toward zero and its ``%`` follows the dividend's sign, so
    the non-negative remainder is ``((x % d) + d) % d`` and subtracting
    it makes ``//`` exact-floor — identical int64 semantics to the
    Spark snippet on every input, pre-epoch included."""
    return (
        f"(({expr}) - ((({expr}) % {divisor} + {divisor}) % {divisor}))"
        f" // {divisor}"
    )


# Floored epoch-day / epoch-week snippets for the event-time grain
# (ns timestamps).  Every Spark-side day/week key derives from these so
# batch plans, streaming maintainers, and the DuckDB oracles (which use
# the already-flooring ``//``) agree on ALL inputs, pre-epoch included.
EPOCH_DAY_SQL = floor_div_sql("ts", 86_400_000_000_000)
EPOCH_WEEK_SQL = floor_div_sql("ts", 604_800_000_000_000)
ORACLE_EPOCH_DAY_SQL = oracle_floor_div_sql("epoch_ns(ts)", 86_400_000_000_000)
ORACLE_EPOCH_WEEK_SQL = oracle_floor_div_sql(
    "epoch_ns(ts)", 604_800_000_000_000
)
