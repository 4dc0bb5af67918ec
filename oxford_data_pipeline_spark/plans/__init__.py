"""Query plans: named queries + their DuckDB oracle SQL.

Importing this package populates the registry from every plan module.
Imports are strict — a broken plan module must fail loudly, never
silently drop its queries from the driver contract.
"""

from oxford_data_pipeline_spark.plans.registry import ORACLES, QUERIES, register
from oxford_data_pipeline_spark.plans import (  # noqa: F401  (registration side effects)
    flagship,
    relational,
    windows,
    projection,
    stats,
    alignment,
    coverage_fill,
    cross_session,
    curation,
    dedup,
    eventops,
    similarity,
    textops,
    mlops,
    multimodal,
    quality,
)

__all__ = ["QUERIES", "ORACLES", "register"]
