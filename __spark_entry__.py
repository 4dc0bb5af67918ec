"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``oxford_data_pipeline_spark``; every query is
registered in ``oxford_data_pipeline_spark.plans`` together with its
oracle SQL.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# ensure the package resolves regardless of the driver's CWD
_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from oxford_data_pipeline_spark.plans import ORACLES, QUERIES  # noqa: E402

def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (J1 event-window join + PSTH) on sf0.001."""
    return QUERIES["j1_event_psth"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, in
    registry (definition) order.  The full oracle-parity record across
    every query — independent of any snapshot cap — is self-reported by
    the test suite into ``ORACLE_PARITY.json``."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    return dict(ORACLES)
