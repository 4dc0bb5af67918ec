"""Flagship J1+A1 query: DuckDB-oracle parity + plan shape checks."""

from __future__ import annotations

import pytest

from oxford_data_pipeline_spark.plans import ORACLES, QUERIES
from tests.conftest import SF_DIR, assert_matches_oracle


def test_flagship_matches_oracle(spark, ddb):
    df = QUERIES["j1_event_psth"](spark, SF_DIR)
    assert_matches_oracle(df, ddb, ORACLES["j1_event_psth"])


def test_flagship_nonempty(spark):
    df = QUERIES["j1_event_psth"](spark, SF_DIR)
    assert df.count() > 0


def test_flagship_plan_is_equijoin(spark):
    """The J1 join must be an equality join (hash/sort-merge/broadcast),
    never a broadcast-nested-loop range join — the 100 TB guarantee."""
    df = QUERIES["j1_event_psth"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
