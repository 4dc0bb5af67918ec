from oxford_data_pipeline_spark.sources.catalog import (
    TABLES,
    load_table,
    load_tables,
    register_views,
)
from oxford_data_pipeline_spark.sources.sinks import (
    incremental_write,
    write_json_report,
    write_partitioned,
    write_text_summary,
)

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "register_views",
    "incremental_write",
    "write_json_report",
    "write_partitioned",
    "write_text_summary",
]
