"""mini_sql_engine_spark — a PySpark-native analytics engine.

A brand-new engine with the query capabilities of the reference
``chaitanya100100/Mini-SQL-Engine`` (an educational single-file SQL
executor over integer CSV tables; see SURVEY.md §2.1 for the surveyed
operator contract O1–O16), re-expressed Spark-first:

- the SQL front end is Catalyst (``spark.sql``) behind a thin
  reference-dialect validator (`plans.dialect`);
- the catalog is the Spark session catalog fed from either parquet
  directories (`catalog.register_sf_tables`) or the reference's
  ``metadata.txt`` + CSV format (`sources.metadata_catalog`);
- execution is whole-stage-codegen DataFrame plans — no row-at-a-time
  Python anywhere in the engine path;
- beyond parity, the `operators` package adds the LLM-data-pipeline
  surface (dedup, similarity search, text analysis, multimodal
  plumbing) designed for 100 TB scale (partitioning/broadcast notes in
  each module docstring).
"""

from mini_sql_engine_spark.session import get_spark
from mini_sql_engine_spark.catalog import SF_TABLES, load_table, register_sf_tables
from mini_sql_engine_spark.engine import Engine

__all__ = ["get_spark", "SF_TABLES", "load_table", "register_sf_tables", "Engine"]

__version__ = "0.1.0"
