"""Reference-native catalog and CSV source.

The reference reads an external catalog file ``metadata.txt`` of the form

    <begin_table>
    table1
    A
    B
    <end_table>
    ...

(one block per table, one column name per line; reference ``main.py``
``load_metadata()`` — SURVEY.md §2.1 O1) and loads ``<table>.csv`` files
of unquoted-or-double-quoted integers, no header, whole-file into memory
(``load_table()`` — O2).

Here the catalog parse is the same 20 lines, but the CSV load is a lazy
Spark scan with an explicit all-LongType schema: Spark's CSV reader
strips double quotes by default, distributes the read across executors,
and column-prunes — a 100-column CSV queried for 2 columns still parses
text but only materializes 2 (and at scale you'd convert to parquet once
via :func:`csv_to_parquet`).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import LongType, StructField, StructType

from mini_sql_engine_spark.plans.dialect import EngineError


def load_metadata(path: str) -> dict[str, list[str]]:
    """Parse a ``metadata.txt`` file → {table: [columns]} (order kept)."""
    schema: dict[str, list[str]] = {}
    if not os.path.exists(path):
        raise EngineError(f"catalog file not found: {path}")
    with open(path) as fh:
        lines = [ln.strip() for ln in fh if ln.strip()]
    i = 0
    while i < len(lines):
        if lines[i] != "<begin_table>":
            raise EngineError(f"malformed metadata: expected <begin_table> at line {i + 1}")
        i += 1
        if i >= len(lines) or lines[i].startswith("<"):
            raise EngineError("malformed metadata: missing table name")
        table = lines[i]
        i += 1
        cols: list[str] = []
        while i < len(lines) and lines[i] != "<end_table>":
            cols.append(lines[i])
            i += 1
        if i >= len(lines):
            raise EngineError(f"malformed metadata: missing <end_table> for {table!r}")
        i += 1  # skip <end_table>
        if not cols:
            raise EngineError(f"table {table!r} has no columns")
        schema[table] = cols
    return schema


def load_csv_table(
    spark: SparkSession, data_dir: str, table: str, columns: list[str]
) -> DataFrame:
    """Lazy scan of ``{data_dir}/{table}.csv`` with an all-integer schema."""
    struct = StructType([StructField(c, LongType(), nullable=False) for c in columns])
    path = os.path.join(data_dir, f"{table}.csv")
    if not os.path.exists(path):
        raise EngineError(f"data file not found for table {table!r}: {path}")
    # the reference's CSVs optionally double-quote values; Spark's reader
    # unquotes by default (quote='"')
    return spark.read.csv(path, schema=struct, header=False)


def register_csv_tables(
    spark: SparkSession, data_dir: str, metadata_path: str | None = None
) -> tuple[dict[str, list[str]], dict[str, DataFrame]]:
    """Load metadata.txt + every table; return (schema dict, name → DF)."""
    metadata_path = metadata_path or os.path.join(data_dir, "metadata.txt")
    schema = load_metadata(metadata_path)
    tables = {t: load_csv_table(spark, data_dir, t, cols) for t, cols in schema.items()}
    return schema, tables


def csv_to_parquet(df: DataFrame, out_path: str, partition_cols: list[str] | None = None) -> None:
    """One-time conversion path for scale: columnar, splittable, statistics."""
    writer = df.write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(out_path)
