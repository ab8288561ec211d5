"""Product-quantization (PQ) ANN: train, encode, ADC search, recall.

The third ANN family next to LSH buckets (`similarity.ann_lsh_topk`)
and IVF cells (`similarity.ivf_topk`): PQ compresses each 64-dim
vector to M=4 one-byte codes (one per 16-dim subspace, K=8 codes) and
scores queries against the COMPRESSED corpus via an asymmetric
distance computation (ADC) lookup table — the memory-side half of
every billion-vector index (FAISS IVFPQ's PQ part), where the win is
shipping 4 bytes per vector instead of 256.

Everything is ENGINE-EXACT via the kmeans_refine determinism pattern
(quality.py): embeddings quantize to micro-unit longs, every distance
is an exactly-associative integer sum, argmins tie-break on code id.
The codebook is genuinely trained: one Lloyd iteration per subspace
from the shared IVF seed centroids (similarity.CENTROIDS sliced per
subspace), then the corpus is encoded against the refined codebook.

Output: per query (vec_id < N_QUERIES), the overlap between PQ-ADC
top-k and exact integer-L2 top-k — the recall measurement that decides
whether M/K are big enough for production, computed inside the engine.
On THIS testdata recall is low (0–2 of 5) and that is the honest
number: the fixtures are i.i.d. random unit vectors, the known
worst case for PQ (no cluster structure for codebooks to exploit;
measured: K=16 does not help). Real embedding corpora are strongly
clustered and sit at the opposite end of that curve; the operator's
value is that it MEASURES where a given corpus falls instead of
assuming.

Scale (100 TB): training touches thin (vec, subspace, dim, qval) rows
with a K·D codebook broadcast both Lloyd rounds; encoding is the same
broadcast-join argmin (one shuffle of thin rows per round). ADC is the
point: the per-query lookup table is M·K integers (broadcast), and the
scoring join touches only (vec, m, code) rows — 4 codes per corpus
vector, never the vectors themselves. The exact-side baseline here is
the O(queries × corpus) check that exists only to measure recall.

No reference counterpart (SURVEY.md §2.1 — the reference has no
vectors at all); extension per SURVEY §2.2 similarity-search row.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from mini_sql_engine_spark.functions.frames import jvm_rows
from mini_sql_engine_spark.catalog import load_table
from mini_sql_engine_spark.operators.similarity import CENTROIDS, N_QUERIES

PQ_M = 4  # subspaces
PQ_SUBDIM = 16  # dims per subspace (M * SUBDIM = 64)
PQ_K = 8  # codes per subspace
PQ_TOPK = 5
PQ_SCALE = 1_000_000  # micro-unit quantization (exact in both engines)


def _init_codebook_rows() -> list[tuple[int, int, int, int]]:
    """(m, code, sd, cval): IVF seed centroids sliced per subspace."""
    return [
        (m, j, sd, int(np.floor(CENTROIDS[j][m * PQ_SUBDIM + sd] * PQ_SCALE + 0.5)))
        for m in range(PQ_M)
        for j in range(PQ_K)
        for sd in range(PQ_SUBDIM)
    ]


def _assign(sub: DataFrame, cb: DataFrame) -> DataFrame:
    """Nearest-code per (vec, subspace): integer L2 argmin, ties on j."""
    dist = (
        sub.join(F.broadcast(cb), ["m", "sd"])
        .groupBy("vec_id", "m", "j")
        .agg(
            F.sum(
                (F.col("qval") - F.col("cval")) * (F.col("qval") - F.col("cval"))
            ).alias("dist")
        )
    )
    w = Window.partitionBy("vec_id", "m").orderBy("dist", "j")
    return (
        dist.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "m", "j")
    )


def pq_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train PQ (1 Lloyd round/subspace), encode, ADC top-k, recall."""
    emb = load_table(spark, sf_dir, "embeddings")
    sub = (
        emb.select("vec_id", F.posexplode("embedding").alias("dim", "v"))
        .select(
            "vec_id",
            (F.col("dim") / PQ_SUBDIM).cast("int").alias("m"),
            (F.col("dim") % PQ_SUBDIM).cast("int").alias("sd"),
            F.floor(F.col("v").cast("double") * PQ_SCALE + F.lit(0.5))
            .cast("long")
            .alias("qval"),
        )
        .localCheckpoint(eager=False)  # feeds train, encode, LUT, exact
    )
    cands = sub.filter(F.col("vec_id") >= N_QUERIES)
    queries = sub.filter(F.col("vec_id") < N_QUERIES)

    cb0 = jvm_rows(
        spark, _init_codebook_rows(), "m int, j int, sd int, cval long"
    )
    # one Lloyd round per subspace over the candidate corpus
    a1 = _assign(cands, cb0)
    cb1 = (
        cands.join(a1, ["vec_id", "m"])
        .groupBy("m", "j", "sd")
        .agg(
            F.floor(F.sum("qval") / F.count(F.lit(1))).cast("long").alias("cval")
        )
        .localCheckpoint(eager=False)  # feeds encode + LUT
    )
    codes = _assign(cands, cb1)  # (vec_id, m, j): 4 codes per vector

    # ADC lookup table: query-to-code partial distances, M*K ints/query
    lut = (
        queries.join(F.broadcast(cb1), ["m", "sd"])
        .groupBy(F.col("vec_id").alias("qid"), "m", "j")
        .agg(
            F.sum(
                (F.col("qval") - F.col("cval")) * (F.col("qval") - F.col("cval"))
            ).alias("pdist")
        )
    )
    adc = (
        codes.join(F.broadcast(lut), ["m", "j"])
        .groupBy("qid", "vec_id")
        .agg(F.sum("pdist").alias("adist"))
    )
    wq = Window.partitionBy("qid").orderBy("adist", "vec_id")
    pq_top = (
        adc.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= PQ_TOPK)
        .select("qid", "vec_id")
    )

    # exact integer-L2 top-k (recall baseline)
    exact = (
        cands.join(
            F.broadcast(
                queries.select(
                    F.col("vec_id").alias("qid"),
                    "m",
                    "sd",
                    F.col("qval").alias("quv"),
                )
            ),
            ["m", "sd"],
        )
        .groupBy("qid", "vec_id")
        .agg(
            F.sum(
                (F.col("qval") - F.col("quv")) * (F.col("qval") - F.col("quv"))
            ).alias("dist")
        )
    )
    we = Window.partitionBy("qid").orderBy("dist", "vec_id")
    exact_top = (
        exact.withColumn("rn", F.row_number().over(we))
        .filter(F.col("rn") <= PQ_TOPK)
        .select("qid", "vec_id")
    )

    return (
        exact_top.alias("e")
        .join(
            pq_top.alias("p"),
            (F.col("e.qid") == F.col("p.qid"))
            & (F.col("e.vec_id") == F.col("p.vec_id")),
            "left",
        )
        .groupBy(F.col("e.qid").alias("query_id"))
        .agg(
            F.lit(PQ_TOPK).cast("long").alias("k"),
            F.sum(F.col("p.vec_id").isNotNull().cast("long")).alias("n_hits"),
        )
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "ext_pq_ann_recall": pq_ann_recall,
}

_CB0_SQL = ", ".join(
    f"({m}, {j}, {sd}, {cval})" for m, j, sd, cval in _init_codebook_rows()
)

ORACLES: dict[str, str] = {
    "ext_pq_ann_recall": f"""
        WITH cb0(m, j, sd, cval) AS (VALUES {_CB0_SQL}),
        qs AS (SELECT vec_id,
                      unnest([struct_pack(
                          m := (d - 1) // {PQ_SUBDIM},
                          sd := (d - 1) % {PQ_SUBDIM},
                          qval := CAST(FLOOR(CAST(embedding[d] AS DOUBLE)
                                             * {PQ_SCALE} + 0.5) AS BIGINT))
                              for d in range(1, len(embedding) + 1)]) AS s
               FROM embeddings),
        sub AS (SELECT vec_id, s.m AS m, s.sd AS sd, s.qval AS qval FROM qs),
        cands AS (SELECT * FROM sub WHERE vec_id >= {N_QUERIES}),
        queries AS (SELECT * FROM sub WHERE vec_id < {N_QUERIES}),
        d1 AS (SELECT c.vec_id, c.m, b.j,
                      SUM((c.qval - b.cval) * (c.qval - b.cval)) AS dist
               FROM cands c JOIN cb0 b USING (m, sd)
               GROUP BY c.vec_id, c.m, b.j),
        a1 AS (SELECT vec_id, m, j FROM (
                   SELECT vec_id, m, j, row_number() OVER (
                       PARTITION BY vec_id, m ORDER BY dist, j) AS rn
                   FROM d1) r WHERE rn = 1),
        cb1 AS (SELECT c.m, a1.j, c.sd,
                       CAST(FLOOR(SUM(c.qval) * 1.0 / COUNT(*)) AS BIGINT)
                           AS cval
                FROM cands c JOIN a1 USING (vec_id, m)
                GROUP BY c.m, a1.j, c.sd),
        d2 AS (SELECT c.vec_id, c.m, b.j,
                      SUM((c.qval - b.cval) * (c.qval - b.cval)) AS dist
               FROM cands c JOIN cb1 b USING (m, sd)
               GROUP BY c.vec_id, c.m, b.j),
        codes AS (SELECT vec_id, m, j FROM (
                      SELECT vec_id, m, j, row_number() OVER (
                          PARTITION BY vec_id, m ORDER BY dist, j) AS rn
                      FROM d2) r WHERE rn = 1),
        lut AS (SELECT q.vec_id AS qid, q.m, b.j,
                       SUM((q.qval - b.cval) * (q.qval - b.cval)) AS pdist
                FROM queries q JOIN cb1 b USING (m, sd)
                GROUP BY q.vec_id, q.m, b.j),
        adc AS (SELECT l.qid, c.vec_id, SUM(l.pdist) AS adist
                FROM codes c JOIN lut l USING (m, j)
                GROUP BY l.qid, c.vec_id),
        pq_top AS (SELECT qid, vec_id FROM (
                       SELECT qid, vec_id, row_number() OVER (
                           PARTITION BY qid ORDER BY adist, vec_id) AS rn
                       FROM adc) r WHERE rn <= {PQ_TOPK}),
        ex AS (SELECT q.vec_id AS qid, c.vec_id,
                      SUM((c.qval - q.qval) * (c.qval - q.qval)) AS dist
               FROM cands c JOIN queries q USING (m, sd)
               GROUP BY q.vec_id, c.vec_id),
        exact_top AS (SELECT qid, vec_id FROM (
                          SELECT qid, vec_id, row_number() OVER (
                              PARTITION BY qid ORDER BY dist, vec_id) AS rn
                          FROM ex) r WHERE rn <= {PQ_TOPK})
        SELECT e.qid AS query_id, CAST({PQ_TOPK} AS BIGINT) AS k,
               CAST(SUM(CASE WHEN p.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_hits
        FROM exact_top e LEFT JOIN pq_top p
          ON e.qid = p.qid AND e.vec_id = p.vec_id
        GROUP BY e.qid
    """,
}
