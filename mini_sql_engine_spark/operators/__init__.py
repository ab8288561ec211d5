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

# Static head of the enumeration: the flagship LLM-pipeline operators
# (core dedup variants, similarity search, text analysis, streaming
# batch-parity, multimodal, corpus curation). This is a fixed list in
# the source — a property of the code, independent of runtime state or
# recorded artifacts — kept explicit so the registry's most important
# entries enumerate first regardless of module-internal ordering.
_PRIORITY: tuple[str, ...] = (
    # dedup core (12)
    "ext_dedup_exact",
    "ext_dedup_exact_by_key",
    "ext_dedup_jaccard",
    "ext_dedup_prefix_filter",
    "ext_dedup_canonical_keep",
    "ext_dedup_minhash_lsh",
    "ext_dedup_simhash",
    "ext_dedup_embedding",
    "ext_dedup_clusters",
    "ext_dedup_containment",
    "ext_dedup_cross_lang",
    "ext_dedup_dual_modality",
    # similarity search (5)
    "ext_sim_bruteforce_topk",
    "ext_sim_ann_lsh_topk",
    "ext_sim_ivf_topk",
    "ext_sim_recall_eval",
    "ext_sim_label_pairs",
    # text analysis (15, incl. leakage/contamination companions)
    "ext_text_token_stats",
    "ext_text_lang_stats",
    "ext_text_language_id",
    "ext_text_quality",
    "ext_text_fingerprint",
    "ext_text_token_histogram",
    "ext_text_heavy_hitters",
    "ext_text_bigram_lift",
    "ext_text_tfidf",
    "ext_text_chunking",
    "ext_text_repetition",
    "ext_decontaminate",
    "ext_inverted_index",
    "ext_split_leakage",
    "ext_contamination_hops",
    # streaming batch-parity (8)
    "stream_tumbling_counts",
    "stream_stateful_user_totals",
    "stream_session_windows",
    "stream_click_purchase_join",
    "stream_sliding_counts",
    "stream_static_enrich",
    "stream_dedup",
    "stream_dedup_watermarked",
    # multimodal (4)
    "ext_mm_decode_stats",
    "ext_mm_frame_sample",
    "ext_mm_resize_meta",
    "ext_mm_resize_pixels",
    # corpus curation (6)
    "ext_boilerplate_ngrams",
    "ext_key_skew",
    "ext_pii_scrub",
    "ext_data_profile",
    "ext_doc_len_outliers",
    "ext_emb_quality",
)

_missing = [n for n in _PRIORITY if n not in ALL_QUERIES]
if _missing:
    raise ValueError(f"priority names not in registry: {_missing}")
ALL_QUERIES = {
    **{n: ALL_QUERIES[n] for n in _PRIORITY},
    **{n: f for n, f in ALL_QUERIES.items() if n not in set(_PRIORITY)},
}
