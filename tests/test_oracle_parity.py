"""Every registered oracle-checked query must match DuckDB exactly
(the driver's t2 gate, run here at sf0.001 for speed)."""

from __future__ import annotations

import pytest

from oxford_data_pipeline_spark.plans import ORACLES, QUERIES
from tests.conftest import SF_DIR, assert_matches_oracle


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, ddb, name):
    df = QUERIES[name](spark, SF_DIR)
    assert_matches_oracle(df, ddb, ORACLES[name])


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs_nonempty(spark, name):
    # rows-only smoke for everything, including non-oracle queries
    assert QUERIES[name](spark, SF_DIR).count() >= 0
