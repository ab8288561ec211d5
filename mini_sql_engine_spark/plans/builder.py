"""Lower a ResolvedQuery onto the Spark DataFrame API.

The reference executes FROM as a k-fold nested-loop cartesian product and
evaluates WHERE per row afterwards (reference ``main.py`` join loop —
SURVEY.md §3.1). We declare exactly those semantics — crossJoin then
filter — and let Catalyst do what the reference cannot (SURVEY.md §4.1):
``PushDownPredicates`` recognizes equality conditions across the product
and rewrites cross+filter into a real equi-join, then picks
broadcast-hash / shuffled-hash / sort-merge by size. The *semantics*
stay the reference's (both join columns appear in ``*`` output), the
*plan* is a proper join — verified in tests by asserting no
CartesianProduct node survives for equi-join queries.

Scale note: nothing here collects to the driver; output is a DataFrame.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from mini_sql_engine_spark.plans.analyzer import ResolvedQuery
from mini_sql_engine_spark.plans.dialect import ColumnRef, Condition, SelectItem

_AGG_FN = {
    "MAX": F.max,
    "MIN": F.min,
    "SUM": F.sum,
    "AVG": F.avg,
    "COUNT": F.count,
}


def _col(ref: ColumnRef) -> Column:
    # refs are fully qualified after analysis; the per-table DataFrame
    # aliases make `t.c` resolvable even when column names collide
    return F.col(f"{ref.table}.{ref.column}")


def _condition_expr(cond: Condition) -> Column:
    lhs = _col(cond.lhs)
    rhs = _col(cond.rhs) if isinstance(cond.rhs, ColumnRef) else F.lit(cond.rhs)
    op = cond.op
    if op == "=":
        return lhs == rhs
    if op == "!=":
        return lhs != rhs
    if op == "<":
        return lhs < rhs
    if op == ">":
        return lhs > rhs
    if op == "<=":
        return lhs <= rhs
    return lhs >= rhs


def _item_header(item: SelectItem) -> str:
    """Reference-style output header (qualified names — SURVEY.md §2.1 O16)."""
    name = f"{item.column.table}.{item.column.column}"
    if item.agg:
        inner = f"DISTINCT {name}" if item.agg_distinct else name
        return f"{item.agg}({inner})"
    return name


def build_dataframe(r: ResolvedQuery, tables: dict[str, DataFrame]) -> DataFrame:
    """ResolvedQuery + (name → DataFrame) → result DataFrame."""
    q = r.parsed

    df: DataFrame | None = None
    for t in q.tables:
        aliased = tables[t].alias(t)
        df = aliased if df is None else df.crossJoin(aliased)
    assert df is not None

    if r.conditions:
        exprs = [_condition_expr(c) for c in r.conditions]
        pred = exprs[0]
        if len(exprs) == 2:
            pred = (pred & exprs[1]) if q.connective == "AND" else (pred | exprs[1])
        df = df.filter(pred)

    if q.select_star:
        df = df.select([_col(c).alias(f"{c.table}.{c.column}") for c in r.star_columns])
    elif q.is_aggregate:
        aggs = []
        for item in r.items:
            fn = _AGG_FN[item.agg]
            col = _col(item.column)
            expr = (
                F.count_distinct(col)
                if (item.agg == "COUNT" and item.agg_distinct)
                else fn(col)
            )
            aggs.append(expr.alias(_item_header(item)))
        df = df.agg(*aggs)
    else:
        df = df.select([_col(i.column).alias(_item_header(i)) for i in r.items])

    if q.distinct:
        df = df.distinct()
    return df
