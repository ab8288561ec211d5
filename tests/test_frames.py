"""Property tests for functions.frames: the JVM-side literal builders
must be drop-in equivalent to createDataFrame on values, names, and
types (nullability intentionally differs: VALUES columns are
non-nullable, which is strictly more precise and union-compatible)."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings, strategies as st

from mini_sql_engine_spark.functions.frames import (
    _split_schema,
    jvm_empty,
    jvm_rows,
)

_FINITE = st.floats(allow_nan=False, allow_infinity=False, width=64)
_SPECIAL = st.sampled_from(
    [float("inf"), float("-inf"), 0.0, -0.0, 1e-308, -1e308]
)
_STRINGS = st.text(
    alphabet=st.characters(
        codec="ascii", min_codepoint=32, max_codepoint=126
    ),
    max_size=12,
)


def _collect(df):
    return sorted(
        tuple(None if isinstance(v, float) and math.isnan(v) else v for v in r)
        for r in map(tuple, df.collect())
    )


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(-(2**31), 2**31 - 1),
            st.one_of(_FINITE, _SPECIAL),
            _STRINGS,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_jvm_rows_matches_createDataFrame(spark, rows):
    schema = "a int, b double, s string"
    a = jvm_rows(spark, rows, schema)
    b = spark.createDataFrame(rows, schema)
    assert [(f.name, f.dataType) for f in a.schema.fields] == [
        (f.name, f.dataType) for f in b.schema.fields
    ]
    assert _collect(a) == _collect(b)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 100),
            st.lists(_FINITE, min_size=2, max_size=4),
        ),
        min_size=1,
        max_size=5,
    )
)
def test_jvm_rows_arrays_match(spark, rows):
    schema = "i int, v array<double>"
    a = jvm_rows(spark, rows, schema)
    b = spark.createDataFrame(rows, schema)
    assert _collect(a) == _collect(b)


def test_jvm_rows_nan_roundtrip(spark):
    [(x,)] = jvm_rows(spark, [(float("nan"),)], "x double").collect()
    assert math.isnan(x)


def test_jvm_empty_matches(spark):
    schema = "val long, g long, s string, m map<string,int>"
    a = jvm_empty(spark, schema)
    b = spark.createDataFrame([], schema)
    assert [(f.name, f.dataType) for f in a.schema.fields] == [
        (f.name, f.dataType) for f in b.schema.fields
    ]
    assert a.count() == 0


def test_split_schema_handles_nesting():
    assert _split_schema("a int, b map<string,int>, c array<double>") == [
        ("a", "int"),
        ("b", "map<string,int>"),
        ("c", "array<double>"),
    ]


def test_sql_lit_rejects_binary():
    # bytes IS a Sequence — without an explicit guard it would render
    # as array(104, 105) int literals (wrong data, no error)
    from mini_sql_engine_spark.functions.frames import _sql_lit

    import pytest as _pytest

    for v in (b"hi", bytearray(b"hi"), memoryview(b"hi")):
        with _pytest.raises(TypeError, match="binary literals"):
            _sql_lit(v)
