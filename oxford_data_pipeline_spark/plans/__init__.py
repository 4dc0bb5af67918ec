"""Query plans: named queries + their DuckDB oracle SQL.

Importing this package populates the registry from every plan module.
"""

from oxford_data_pipeline_spark.plans.registry import ORACLES, QUERIES, register

# Import for registration side effects.
from oxford_data_pipeline_spark.plans import flagship  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLES", "register"]


def _load_all() -> None:
    """Import every plan module (idempotent)."""
    from oxford_data_pipeline_spark.plans import (  # noqa: F401
        flagship,
    )
    for mod in (
        "relational",
        "windows",
        "projection",
        "stats",
        "dedup",
        "similarity",
        "textops",
        "mlops",
    ):
        try:
            __import__(f"oxford_data_pipeline_spark.plans.{mod}")
        except ImportError:
            pass


_load_all()
