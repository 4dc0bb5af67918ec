from oxford_data_pipeline_spark.sources.catalog import TABLES, load_table, load_tables

__all__ = ["TABLES", "load_table", "load_tables"]
