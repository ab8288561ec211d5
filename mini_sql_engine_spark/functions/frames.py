"""JVM-side construction of small literal / empty DataFrames.

``spark.createDataFrame(rows, schema)`` routes tiny driver-side tables
through a Python RDD parallelized over ``defaultParallelism`` (32
here) partitions — EVERY evaluation of the plan pays ~32 Python-runner
round-trips (~0.3-0.5 s warm; ~4 s when a downstream ``coalesce(1)``
serializes them into a single task, the exactly-once sinks' shape).
Measured round 7: the empty-state branch of the streaming MERGE demos
spent 4.8 of their ~7 s replay in exactly this.

These helpers build the same tables purely JVM-side:

- ``jvm_rows``: a SQL ``VALUES`` clause (Catalyst ``LocalRelation`` —
  zero tasks, zero Python workers), with every column cast to the
  requested type. Literals are rendered exactly: ints verbatim,
  floats via ``repr`` + ``D`` (shortest round-trip decimal, parsed by
  ``Double.parseDouble`` back to the identical binary64), strings
  escaped, sequences as ``array(...)``.
- ``jvm_empty``: ``spark.range(0)`` + typed null casts — a 0-row,
  1-partition JVM relation.

At 100 TB these tables are broadcast dimension seeds (centroids,
thresholds, bands, target grids); building them as LocalRelations also
lets Catalyst constant-fold and prune them at plan time.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F


def _split_schema(schema: str) -> list[tuple[str, str]]:
    """'a int, b array<double>' -> [('a', 'int'), ('b', 'array<double>')]
    (splits on top-level commas only, so map<k,v> nests safely)."""
    cols: list[tuple[str, str]] = []
    depth = 0
    part = ""
    for ch in schema + ",":
        if ch == "," and depth == 0:
            name, typ = part.strip().split(" ", 1)
            cols.append((name, typ.strip()))
            part = ""
            continue
        depth += ch in "<("
        depth -= ch in ">)"
        part += ch
    return cols


def _sql_lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        import math

        if math.isinf(v):
            sign = "" if v > 0 else "-"
            return f"CAST('{sign}Infinity' AS DOUBLE)"
        if math.isnan(v):
            return "CAST('NaN' AS DOUBLE)"
        return repr(v) + "D"  # exact binary64 round-trip
    if isinstance(v, str):
        escaped = v.replace("\\", "\\\\").replace("'", "\\'")
        return f"'{escaped}'"
    if isinstance(v, (bytes, bytearray, memoryview)):
        # bytes IS a Sequence, so without this guard a binary value
        # would silently render as array(104, 105, ...) int literals —
        # wrong data with no error against an array-typed column
        raise TypeError(
            "binary literals are not supported by jvm_rows; "
            "hex-encode to str or use createDataFrame"
        )
    if isinstance(v, Sequence):
        return "array(" + ", ".join(_sql_lit(x) for x in v) + ")"
    raise TypeError(f"unsupported literal type {type(v).__name__}")


def jvm_rows(spark: SparkSession, rows, schema: str) -> DataFrame:
    """Small literal table as a pure-JVM LocalRelation (SQL VALUES)."""
    cols = _split_schema(schema)
    if not rows:
        return jvm_empty(spark, schema)
    values = ", ".join(
        "(" + ", ".join(_sql_lit(v) for v in row) + ")" for row in rows
    )
    names = ", ".join(n for n, _ in cols)
    casts = ", ".join(f"CAST({n} AS {t}) AS {n}" for n, t in cols)
    return spark.sql(f"SELECT {casts} FROM (VALUES {values}) AS t({names})")


def jvm_empty(spark: SparkSession, schema: str) -> DataFrame:
    """0-row DataFrame with the given schema, built without Python RDDs."""
    return spark.range(0).select(
        *[
            F.lit(None).cast(t).alias(n)
            for n, t in _split_schema(schema)
        ]
    )
