"""Property-based tests for the reference-dialect front end.

Hypothesis generates random-but-valid queries over the mini fixture and
asserts structural invariants the hand-picked micro-tests can't sweep:
every generated query parses, analyzes, and EXECUTES with the expected
column count; results are invariant under keyword case and whitespace
mangling; and a differential check against Spark SQL (the dialect's
semantics re-stated in ANSI) on single-table queries.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from mini_sql_engine_spark.engine import Engine
from mini_sql_engine_spark.plans.dialect import EngineError

TABLES = {"table1": ["A", "B", "C"], "table2": ["B", "D"]}
OPS = ["<=", ">=", "!=", "<>", "=", "<", ">"]
AGGS = ["MAX", "MIN", "SUM", "AVG", "COUNT"]

_ENGINE = {}


@pytest.fixture()
def eng(spark, mini_dir):
    if "e" not in _ENGINE:
        _ENGINE["e"] = Engine.from_metadata_dir(spark, mini_dir)
    return _ENGINE["e"]


@st.composite
def single_table_query(draw):
    """A valid single-table query: projection or aggregate + where."""
    table = draw(st.sampled_from(sorted(TABLES)))
    cols = TABLES[table]
    if draw(st.booleans()):
        agg = draw(st.sampled_from(AGGS))
        select = f"{agg}({draw(st.sampled_from(cols))})"
        n_out = 1
    else:
        chosen = draw(
            st.lists(st.sampled_from(cols), min_size=1, max_size=3, unique=True)
        )
        distinct = draw(st.booleans())
        if distinct and len(chosen) == 1 and draw(st.booleans()):
            # sibling spelling DISTINCT(col)
            select = f"DISTINCT({chosen[0]})"
        else:
            select = ("DISTINCT " if distinct else "") + ", ".join(chosen)
        n_out = len(chosen)

    def cond(d):
        lhs = d(st.sampled_from(cols))
        op = d(st.sampled_from(OPS))
        rhs = (
            str(d(st.integers(min_value=-5, max_value=300)))
            if d(st.booleans())
            else d(st.sampled_from(cols))
        )
        return f"{lhs} {op} {rhs}"

    n_conds = draw(st.integers(min_value=0, max_value=2))
    where = ""
    if n_conds == 1:
        where = f" WHERE {cond(draw)}"
    elif n_conds == 2:
        conn = draw(st.sampled_from(["AND", "OR"]))
        where = f" WHERE {cond(draw)} {conn} {cond(draw)}"
    return f"SELECT {select} FROM {table}{where};", n_out


@given(q=single_table_query())
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_generated_queries_execute(eng, q):
    query, n_out = q
    df = eng.sql(query)
    assert len(df.columns) == n_out
    df.collect()  # must execute, not just plan


@given(q=single_table_query(), data=st.data())
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_case_and_whitespace_invariance(eng, q, data):
    query, _ = q
    mangled = query.replace("SELECT", data.draw(st.sampled_from(["select", "SeLeCt"])))
    mangled = mangled.replace(" FROM ", data.draw(st.sampled_from([" from  ", "  FROM "])))
    mangled = mangled.replace(" WHERE ", data.draw(st.sampled_from([" where ", "  WHERE  "])))
    base = sorted(tuple(r) for r in eng.sql(query).collect())
    alt = sorted(tuple(r) for r in eng.sql(mangled).collect())
    assert base == alt


@given(q=single_table_query())
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_missing_semicolon_rejected(eng, q):
    query, _ = q
    with pytest.raises(EngineError):
        eng.sql(query.rstrip(";"))


@given(q=single_table_query())
@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_differential_vs_spark_sql(eng, q, spark):
    """Dialect result ≡ Catalyst running the ANSI re-statement (modulo
    the dialect's qualified output names and AVG's double)."""
    query, _ = q
    df = eng.sql(query)
    ansi = query.rstrip(";")
    for t in TABLES:
        eng.tables[t].createOrReplaceTempView(t)
    expect = spark.sql(ansi)
    got = sorted(tuple(float(v) if isinstance(v, float) else v for v in r) for r in df.collect())
    want = sorted(tuple(float(v) if isinstance(v, float) else v for v in r) for r in expect.collect())
    assert got == want
