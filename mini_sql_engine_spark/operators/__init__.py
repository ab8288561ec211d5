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
    association,
    auditing,
    bpe_train,
    curation,
    dedup,
    funcs_ext,
    governance,
    graph_ops,
    joins_ext,
    layout,
    ml_lsh,
    multimodal,
    parity,
    pipeline_ops,
    pq,
    quality,
    rollups,
    similarity,
    text,
    textprep,
    tpch,
    udfs,
    window_funcs,
)
from mini_sql_engine_spark.streaming import joins_ext as streaming_joins_ext
from mini_sql_engine_spark.streaming import upsert as streaming_upsert
from mini_sql_engine_spark.streaming import windows as streaming_windows

# Fixed, deterministic registry order. The LLM-pipeline packs (dedup,
# similarity, text, streaming, multimodal, curation) lead because they
# are the flagship extension surface; the parity/TPC-H packs follow.
# The order is a static property of the code — it never depends on
# runtime state or any recorded artifact.
_MODULES = [
    dedup,
    similarity,
    text,
    streaming_windows,
    streaming_upsert,
    multimodal,
    curation,
    quality,
    pq,
    bpe_train,
    governance,
    layout,
    asof,
    ml_lsh,
    pipeline_ops,
    udfs,
    parity,
    tpch,
    rollups,
    window_funcs,
    joins_ext,
    funcs_ext,
    analytics,
    auditing,
    association,
    graph_ops,
    streaming_joins_ext,
    textprep,
]

ALL_QUERIES: dict[str, Callable] = {}
ALL_ORACLES: dict[str, str] = {}
for _m in _MODULES:
    for _name, _fn in _m.QUERIES.items():
        if _name in ALL_QUERIES:
            raise ValueError(f"duplicate query name {_name!r}")
        ALL_QUERIES[_name] = _fn
    ALL_ORACLES.update(getattr(_m, "ORACLES", {}))
