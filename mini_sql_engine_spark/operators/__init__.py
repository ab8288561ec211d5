"""Operator query packs.

Each module exposes ``QUERIES`` (name → callable(spark, sf_dir) →
DataFrame) and ``ORACLES`` (name → DuckDB oracle SQL; entries may be
omitted for non-SQL-expressible operators). ``ALL_QUERIES`` /
``ALL_ORACLES`` are the merged registries consumed by
``__spark_entry__.py``.
"""

from __future__ import annotations

from collections.abc import Callable

from mini_sql_engine_spark.operators import (
    analytics,
    asof,
    curation,
    dedup,
    funcs_ext,
    joins_ext,
    ml_lsh,
    multimodal,
    parity,
    pipeline_ops,
    rollups,
    similarity,
    text,
    tpch,
    udfs,
    window_funcs,
)
from mini_sql_engine_spark.streaming import windows as streaming_windows

_MODULES = [
    parity,
    tpch,
    rollups,
    window_funcs,
    joins_ext,
    funcs_ext,
    analytics,
    asof,
    text,
    dedup,
    similarity,
    ml_lsh,
    multimodal,
    pipeline_ops,
    udfs,
    curation,
    streaming_windows,
]

ALL_QUERIES: dict[str, Callable] = {}
ALL_ORACLES: dict[str, str] = {}
for _m in _MODULES:
    for _name, _fn in _m.QUERIES.items():
        if _name in ALL_QUERIES:
            raise ValueError(f"duplicate query name {_name!r}")
        ALL_QUERIES[_name] = _fn
    ALL_ORACLES.update(getattr(_m, "ORACLES", {}))
