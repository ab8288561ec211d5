"""pyspark.ml LSH variants of dedup / similarity (SURVEY.md §2.2).

`operators/dedup.py` and `operators/similarity.py` implement MinHash
and random-hyperplane LSH from first principles so a DuckDB oracle can
replay them bit-for-bit. This module is the other legitimate route: the
built-in `pyspark.ml.feature` estimators (MinHashLSH,
BucketedRandomProjectionLSH). Their hash families are engine-specific,
so these queries are rows-only for the driver (no oracle_sql entry);
the pytest properties instead assert containment against the exactly-
verified operators.

Scale notes: `approxSimilarityJoin` is the distributed path — it
explodes each row to its hash buckets, self-joins on bucket, then
computes EXACT distances on candidates only (same candidate-verify
shape as our hand-rolled LSH). numHashTables trades recall for
candidate volume. Seeds fixed → deterministic across runs.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from mini_sql_engine_spark.catalog import ensure_min_partitions, load_table
from mini_sql_engine_spark.functions import textfns

JACCARD_DIST_T = 0.8  # keep pairs with jaccard similarity >= 0.2
COSINE_T = 0.45  # matches operators.dedup.COSINE_T
N_HASH_TABLES = 4
SEED = 42


def ml_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup candidate pairs via pyspark.ml MinHashLSH over binary
    token-shingle vectors."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents")).select(
        "doc_id", textfns.shingles("text", 3).alias("sh")
    )
    tf = HashingTF(
        inputCol="sh", outputCol="features", numFeatures=1 << 18, binary=True
    )
    # the featurized relation is consumed 3× (fit + both sides of the
    # self-join) and Spark does not reuse the exchange — materialize it
    # once (lazy executor-local blocks): measured 4-5× on this query
    feat = tf.transform(docs).localCheckpoint(eager=False)
    lsh = MinHashLSH(
        inputCol="features",
        outputCol="hashes",
        numHashTables=N_HASH_TABLES,
        seed=SEED,
    )
    model = lsh.fit(feat)
    pairs = model.approxSimilarityJoin(feat, feat, JACCARD_DIST_T, distCol="jd")
    return (
        pairs.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            F.round(1.0 - F.col("jd"), 6).alias("jacc_sim"),
        )
    )


def ml_brp_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs via BucketedRandomProjectionLSH
    (euclidean); unit-norm inputs make dist² = 2·(1 − cos), so the
    euclidean threshold √(2·(1−T)) is exactly cosine ≥ T."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    dist_t = float((2.0 * (1.0 - COSINE_T)) ** 0.5)
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            array_to_vector(F.col("embedding").cast("array<double>")).alias("v"),
        )
        .localCheckpoint(eager=False)  # consumed 3×, same as minhash
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="v",
        outputCol="hashes",
        bucketLength=0.5,
        numHashTables=N_HASH_TABLES,
        seed=SEED,
    )
    model = lsh.fit(emb)
    pairs = model.approxSimilarityJoin(emb, emb, dist_t, distCol="dist")
    return (
        pairs.filter(F.col("datasetA.vec_id") < F.col("datasetB.vec_id"))
        .select(
            F.col("datasetA.vec_id").alias("vec_a"),
            F.col("datasetB.vec_id").alias("vec_b"),
            F.round(1.0 - F.col("dist") * F.col("dist") / 2.0, 4).alias("cos_sim"),
        )
    )


QUERIES: dict[str, Callable] = {
    "ext_ml_minhash_pairs": ml_minhash_pairs,
    "ext_ml_brp_pairs": ml_brp_pairs,
}

# Rows-only by design: ml hash families are engine-specific (no DuckDB
# replay). Containment properties live in tests/test_operators.py.
ORACLES: dict[str, str] = {}
