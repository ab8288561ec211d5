"""Data sources: parquet scale-factor tables and the reference's native
``metadata.txt`` + integer-CSV format."""

from mini_sql_engine_spark.sources.metadata_catalog import (
    load_metadata,
    load_csv_table,
    register_csv_tables,
)

__all__ = ["load_metadata", "load_csv_table", "register_csv_tables"]
