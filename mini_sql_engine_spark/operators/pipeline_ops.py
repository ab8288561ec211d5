"""Training-data pipeline operators: embedding statistics, quantization,
stratified sampling, and skew-hardened joins.

These extend the dedup/similarity/text packs with the remaining ops a
100 TB curation pipeline runs routinely: per-class embedding centroids
(clustering seeds, drift monitoring), int8 vector quantization (storage
/ ANN prep), per-stratum deterministic sampling (eval-set carving), and
a salted join (the hot-key survival path for power-law user data).

Scale notes:
- Centroids: posexplode fans 64× but hash partial-aggregation collapses
  each partition to ≤ labels×64 rows before the shuffle — network cost
  is O(partitions × 640), independent of row count.
- Quantization: pure per-row JVM expression work (transform/array_min) —
  no shuffle, whole-stage pipeline with the scan.
- Stratified sampling by md5 of the key: reproducible across engines,
  runs, AND partitionings (unlike rand()-based sampleBy), so an eval
  split never bleeds into training data between reruns.
- Salted join: identical results to the plain join by construction;
  plan cost is the n_salts-fold replication of the SMALL side only.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from mini_sql_engine_spark.catalog import load_table
from mini_sql_engine_spark.functions.hashing import md5_long
from mini_sql_engine_spark.functions.skew import salted_join

EMB_DIM = 64  # verified for every row (FIXTURES.md §1.2)

# per-lang sampling percentages — a typical eval-carve keeps rare
# languages whole and thins the dominant one
_LANG_PCT = {"en": 5, "fr": 10, "es": 20, "zh": 50, "de": 100}


def emb_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids in long form (label, dim, n,
    centroid). Decimal accumulation keeps the float sums
    order-independent across engines and partitionings."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select("label", F.posexplode("embedding").alias("pos", "v"))
        .withColumn("dim", (F.col("pos") + 1).cast("long"))
        .groupBy("label", "dim")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.col("v").cast("decimal(28,12)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("centroid"),
        )
    )


def emb_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector min-max int8-range quantization (0..255), emitted as
    a comma-joined string plus the (zero-point, scale) pair needed to
    dequantize. All-double IEEE arithmetic + FLOOR → bit-identical in
    any engine."""
    emb = load_table(spark, sf_dir, "embeddings")
    with_range = emb.select(
        "vec_id",
        "embedding",
        F.array_min("embedding").cast("double").alias("mn"),
        F.array_max("embedding").cast("double").alias("mx"),
    )
    quant = F.transform(
        "embedding",
        lambda v: F.floor(
            (v.cast("double") - F.col("mn"))
            / (F.col("mx") - F.col("mn") + F.lit(1e-12))
            * 255
        ).cast("int"),
    )
    return with_range.select(
        "vec_id",
        F.round("mn", 6).alias("zero_point"),
        F.round((F.col("mx") - F.col("mn")) / 255, 9).alias("scale"),
        F.array_join(quant, ",").alias("q8"),
    )


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language document sample: md5(doc_id) mod 100
    under a per-stratum threshold."""
    docs = load_table(spark, sf_dir, "documents")
    pct = F.lit(None)
    for lang, p in _LANG_PCT.items():
        pct = F.when(F.col("lang") == lang, p).otherwise(pct)
    return docs.filter(
        md5_long(F.col("doc_id").cast("string")) % 100 < pct
    ).select("doc_id", "lang", "source")


def salted_user_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation purchase revenue via a SALTED events⋈customer join —
    result must equal the plain join (the oracle runs the unsalted
    SQL), proving salting is a pure re-partitioning."""
    events = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    ).select("user_id", "value")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_nationkey"
    )
    return (
        salted_join(events, cust, "user_id", n_salts=8)
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("revenue"),
        )
    )


QUERIES: dict[str, Callable] = {
    "ext_emb_centroids": emb_centroids,
    "ext_emb_quantize": emb_quantize,
    "ext_stratified_sample": stratified_sample,
    "ext_salted_join": salted_user_revenue,
}

_HASH = "CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)"
_PCT_CASE = " ".join(
    f"WHEN lang = '{lang}' THEN {p}" for lang, p in _LANG_PCT.items()
)

ORACLES: dict[str, str] = {
    "ext_emb_centroids": f"""
        SELECT label, CAST(dim AS BIGINT) AS dim, COUNT(*) AS n,
               ROUND(CAST(SUM(CAST(embedding[dim] AS DECIMAL(28,12)))
                          AS DOUBLE) / COUNT(*), 6) AS centroid
        FROM embeddings, generate_series(1, {EMB_DIM}) AS t(dim)
        GROUP BY label, dim
    """,
    "ext_emb_quantize": """
        SELECT vec_id,
               ROUND(mn, 6) AS zero_point,
               ROUND((mx - mn) / 255, 9) AS scale,
               array_to_string(list_transform(embedding,
                   v -> CAST(FLOOR((CAST(v AS DOUBLE) - mn)
                                   / (mx - mn + 1e-12) * 255) AS INT)),
                   ',') AS q8
        FROM (SELECT vec_id, embedding,
                     CAST(list_min(embedding) AS DOUBLE) AS mn,
                     CAST(list_max(embedding) AS DOUBLE) AS mx
              FROM embeddings) t
    """,
    "ext_stratified_sample": f"""
        SELECT doc_id, lang, source
        FROM documents
        WHERE {_HASH} % 100 < (CASE {_PCT_CASE} END)
    """,
    "ext_salted_join": """
        SELECT c_nationkey, COUNT(*) AS n_purchases,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE)
                   AS revenue
        FROM events JOIN customer ON user_id = c_custkey
        WHERE event_type = 'purchase'
        GROUP BY c_nationkey
    """,
}
