"""Registry wiring query callables to their DuckDB oracle SQL.

Contract (driver): every entry in QUERIES takes (spark, sf_dir) and
returns a DataFrame; ORACLES[name] is ANSI SQL DuckDB runs over the
same parquet tables (views: region nation customer supplier part orders
lineitem events documents embeddings). Column names must match exactly;
floats are rounded to 6 decimals on BOTH sides so the driver's
order-insensitive value hash is stable across engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query (and its oracle SQL, if expressible)."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
