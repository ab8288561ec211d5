"""Vector math over ArrayType(FloatType()) columns — JVM-side only.

`zip_with` + `aggregate` keep the arithmetic in codegen; elements are
cast to double before multiplication so accumulation matches engines
that compute in double (DuckDB's list_dot_product), avoiding float32
accumulation drift in oracle comparisons.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """General cosine; for unit-norm embeddings prefer plain `dot`
    (FIXTURES.md §1.2 verifies unit L2 norm for every row)."""
    return dot(a, b) / (norm(a) * norm(b))
