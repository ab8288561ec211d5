"""Similarity search over the `embeddings` table (64-dim unit-norm).

Two paths, both oracle-checked:
- brute-force top-k cosine: exact baseline — every (query, candidate)
  pair scored, per-query window top-k;
- LSH-bucketed ANN: random-hyperplane signatures partition vectors into
  buckets; search only within the query's bucket. This is the scale
  path: at 100 TB the bucket join replaces the all-pairs product, the
  bucket id is a shuffle key, and recall/cost is tuned by N_PLANES
  (more planes → smaller buckets) and multi-probe.

Determinism: hyperplanes are pseudo-random constants derived from md5
of "(plane,dim)" — computed once driver-side with hashlib (bit-identical
to SQL md5) and inlined as literals into BOTH the Spark plan and the
DuckDB oracle, so the two engines bucket identically. Cosine = plain
dot product (unit-norm inputs, FIXTURES.md §1.2); accumulation is
left-to-right in double on both engines, so scores match bit-for-bit
before rounding.

Scale notes: the query side is tiny (broadcast); brute force is a
broadcast nested-loop scoring scan (no shuffle of the corpus); ANN
shuffles (bucket, vec) pairs once. Window top-k keeps k rows per query
per partition before the final merge.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession, Window, functions as F

from mini_sql_engine_spark.catalog import load_table
from mini_sql_engine_spark.functions import vector

DIM = 64
N_PLANES = 4  # 16 buckets
TOP_K = 10
ANN_TOP_K = 5
N_QUERIES = 5  # vec_id < 5 are the query points


def _plane(p: int) -> list[float]:
    """Deterministic pseudo-random hyperplane component in [-1, 1].

    Same construction as SQL: int(md5("p,d")[:15], 16) % 2001 → scaled.
    """
    out = []
    for d in range(DIM):
        h = int(hashlib.md5(f"{p},{d}".encode()).hexdigest()[:15], 16)
        out.append((h % 2001 - 1000) / 1000.0)
    return out


PLANES: list[list[float]] = [_plane(p) for p in range(N_PLANES)]

N_CENTROIDS = 8
NPROBE = 2
IVF_TOP_K = 5


def _centroid(c: int) -> list[float]:
    """Deterministic pseudo-random centroid (same md5 construction as
    `_plane`, different salt). Real IVF would k-means these; the operator
    shape (assign → probe nprobe cells → score within cells) is what a
    trained index runs, and determinism is what the oracle needs."""
    out = []
    for d in range(DIM):
        h = int(hashlib.md5(f"c{c},{d}".encode()).hexdigest()[:15], 16)
        out.append((h % 2001 - 1000) / 1000.0)
    return out


CENTROIDS: list[list[float]] = [_centroid(c) for c in range(N_CENTROIDS)]


def _dot_const(emb: Column, plane: list[float]) -> Column:
    return vector.dot(emb, F.array(*[F.lit(v) for v in plane]))


def bucket_expr(emb: Column) -> Column:
    """Random-hyperplane LSH bucket id (sign-bit signature)."""
    out = F.lit(0)
    for p, plane in enumerate(PLANES):
        out = out + F.when(_dot_const(emb, plane) >= 0, F.lit(1 << p)).otherwise(0)
    return out


def brute_force_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-10 cosine neighbors for each query vector."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qe")
    )
    c = emb.select(F.col("vec_id").alias("n_id"), F.col("embedding").alias("ne"))
    scored = (
        F.broadcast(q)
        .join(c, F.col("q_id") != F.col("n_id"))
        .withColumn("cos_sim", F.round(vector.dot(F.col("qe"), F.col("ne")), 4))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("n_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("q_id", "n_id", "cos_sim", F.col("rnk").cast("long").alias("rnk"))
    )


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN: score only candidates in the query's LSH bucket."""
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "bucket", bucket_expr(F.col("embedding"))
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qe"), "bucket"
    )
    c = emb.select(
        F.col("vec_id").alias("n_id"), F.col("embedding").alias("ne"), "bucket"
    )
    scored = (
        F.broadcast(q)
        .join(c, "bucket")
        .filter(F.col("q_id") != F.col("n_id"))
        .withColumn("cos_sim", F.round(vector.dot(F.col("qe"), F.col("ne")), 4))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("n_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= ANN_TOP_K)
        .select("q_id", "n_id", "cos_sim", F.col("rnk").cast("long").alias("rnk"))
    )


def ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: assign every vector to its nearest centroid cell;
    queries probe their NPROBE nearest cells and score only those cells'
    vectors. The scale path for >billions of vectors: the cell id is the
    partition key, the centroid table is broadcast (it is tiny by
    construction), and only probed cells shuffle."""
    cent = spark.createDataFrame(
        [(i, v) for i, v in enumerate(CENTROIDS)], "cidx int, cvec array<double>"
    )
    emb = load_table(spark, sf_dir, "embeddings")
    scored_cells = (
        emb.crossJoin(F.broadcast(cent))
        .withColumn("cscore", vector.dot(F.col("embedding"), F.col("cvec")))
    )
    cw = Window.partitionBy("vec_id").orderBy(F.col("cscore").desc(), F.col("cidx"))
    ranked = scored_cells.withColumn("crn", F.row_number().over(cw))
    corpus = ranked.filter(F.col("crn") == 1).select(
        F.col("vec_id").alias("n_id"), F.col("embedding").alias("ne"),
        F.col("cidx").alias("cell"),
    )
    probes = (
        ranked.filter((F.col("vec_id") < N_QUERIES) & (F.col("crn") <= NPROBE))
        .select(
            F.col("vec_id").alias("q_id"), F.col("embedding").alias("qe"),
            F.col("cidx").alias("cell"),
        )
    )
    scored = (
        F.broadcast(probes)
        .join(corpus, "cell")
        .filter(F.col("q_id") != F.col("n_id"))
        .withColumn("cos_sim", F.round(vector.dot(F.col("qe"), F.col("ne")), 4))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("n_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= IVF_TOP_K)
        .select("q_id", "n_id", "cos_sim", F.col("rnk").cast("long").alias("rnk"))
    )


def ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of both ANN paths (LSH buckets, IVF probes) against the
    exact brute-force top-k, per query — the measurement loop every ANN
    deployment needs before trading recall for cost. Hits are computed
    with a semi-join of the exact top-k against each ANN result (both
    sides are tiny: queries × k rows), so the eval itself costs three
    reused subplans plus two key-only joins; recall is an exact integer
    ratio, deterministic across engines.

    100 TB: the expensive side (brute force) is what recall evaluation
    runs on a SAMPLE of queries by construction — the operator shape
    (exact-on-sample vs approx-on-all, semi-join, ratio) is unchanged;
    only N_QUERIES grows."""
    exact_k = brute_force_topk(spark, sf_dir).filter(
        F.col("rnk") <= ANN_TOP_K
    ).select("q_id", "n_id")
    lsh = ann_lsh_topk(spark, sf_dir).select("q_id", "n_id")
    ivf = ivf_topk(spark, sf_dir).select("q_id", "n_id")
    base = exact_k.groupBy("q_id").agg(F.count(F.lit(1)).alias("n_exact"))
    lsh_hits = (
        exact_k.join(lsh, ["q_id", "n_id"], "left_semi")
        .groupBy("q_id")
        .agg(F.count(F.lit(1)).alias("lsh_hits"))
    )
    ivf_hits = (
        exact_k.join(ivf, ["q_id", "n_id"], "left_semi")
        .groupBy("q_id")
        .agg(F.count(F.lit(1)).alias("ivf_hits"))
    )
    return (
        base.join(lsh_hits, "q_id", "left")
        .join(ivf_hits, "q_id", "left")
        .select(
            "q_id",
            "n_exact",
            F.coalesce("lsh_hits", F.lit(0)).cast("long").alias("lsh_hits"),
            F.coalesce("ivf_hits", F.lit(0)).cast("long").alias("ivf_hits"),
            (F.coalesce("lsh_hits", F.lit(0)) / F.col("n_exact")).alias("lsh_recall"),
            (F.coalesce("ivf_hits", F.lit(0)) / F.col("n_exact")).alias("ivf_recall"),
        )
    )


HARD_NEG_K = 3


def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-training data op: for each query vector, the top-k
    most-similar vectors carrying a DIFFERENT label — the classic
    hard-negative set (similar in embedding space, semantically wrong).

    Same broadcast-scoring scan as brute_force_topk plus a label
    inequality before ranking, so the label filter prunes rows BEFORE
    the window. At 100 TB the anchor side is the (sampled, broadcast)
    query set and the corpus is scanned once; the per-anchor top-k is
    the same bounded window. An ANN pre-filter (LSH/IVF above) in front
    is the recall/cost dial, unchanged.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("qe"),
        F.col("label").alias("q_label"),
    )
    c = emb.select(
        F.col("vec_id").alias("n_id"),
        F.col("embedding").alias("ne"),
        F.col("label").alias("n_label"),
    )
    scored = (
        F.broadcast(q)
        .join(c, F.col("q_id") != F.col("n_id"))
        .filter(F.col("q_label") != F.col("n_label"))
        .withColumn("cos_sim", F.round(vector.dot(F.col("qe"), F.col("ne")), 4))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("n_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= HARD_NEG_K)
        .select(
            "q_id",
            F.col("q_label").cast("long").alias("q_label"),
            "n_id",
            F.col("n_label").cast("long").alias("n_label"),
            "cos_sim",
            F.col("rnk").cast("long").alias("rnk"),
        )
    )


MMR_POOL = 15  # candidate pool per query (top-N by relevance)
MMR_K = 5  # diversified picks per query
# λ = 0.7 as the integer pair (7, 3): score = 7·rel_q − 3·max_sim_q on
# 1e-4-quantized cosines — integer arithmetic, so the greedy argmax
# order can never differ between engines by float noise
MMR_LAMBDA_NUM = 7
MMR_DIV_NUM = 3
MMR_Q = 10_000  # cosine quantization steps (matches the round-4 digits)


def _q4(c: Column) -> Column:
    """1e-4-quantized cosine as an exact integer (round-half-up)."""
    return F.floor(F.round(c, 4) * MMR_Q + 0.5).cast("long")


def mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-marginal-relevance diversified top-k (Carbonell &
    Goldstein 1998): greedily pick MMR_K of the MMR_POOL most-relevant
    candidates per query, each step maximizing
    λ·rel(q,c) − (1−λ)·max_{s∈selected} sim(c,s) — the re-ranking that
    keeps a retrieval slate from being MMR_K near-copies of the same
    document (the failure mode near-dup-heavy corpora hit hardest).

    Execution: the DISTRIBUTED stage is candidate generation — the
    same broadcast-query scoring scan as brute_force_topk, window
    top-MMR_POOL per query. The greedy loop then runs as MMR_K
    unrolled DataFrame steps over (queries × MMR_POOL) rows — a
    constant-size table, so the unrolled joins are driver-planned but
    executor-evaluated, never a collect. Scores quantize to integers
    (1e-4 steps) before any comparison, making the argmax sequence
    exactly reproducible; ties break on candidate id. The oracle
    unrolls the identical greedy steps as chained CTEs.

    100 TB: pool generation is the cost (swap the brute-force scan
    for the ANN path when the corpus outgrows it); the rerank itself
    touches q×MMR_POOL rows regardless of corpus size — this split
    (heavy recall stage, tiny precision stage) is the production
    shape of every retrieval pipeline.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qe")
    )
    c = emb.select(F.col("vec_id").alias("n_id"), F.col("embedding").alias("ne"))
    scored = (
        F.broadcast(q)
        .join(c, F.col("q_id") != F.col("n_id"))
        .withColumn("r", _q4(vector.dot(F.col("qe"), F.col("ne"))))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("r").desc(), F.col("n_id"))
    cand = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= MMR_POOL)
        .select("q_id", "n_id", "r", "ne")
    )
    # pairwise candidate sims: (q × POOL²) rows — constant-size; cache
    # so the MMR_K step plans don't rebuild the scoring scan each step
    a = cand.select("q_id", F.col("n_id").alias("a_id"), F.col("ne").alias("ae"))
    b = cand.select("q_id", F.col("n_id").alias("b_id"), F.col("ne").alias("be"))
    sims = (
        a.join(b, ["q_id"])
        .filter(F.col("a_id") != F.col("b_id"))
        .select(
            "q_id", "a_id", "b_id",
            _q4(vector.dot(F.col("ae"), F.col("be"))).alias("s"),
        )
    ).localCheckpoint(eager=False)
    cand = cand.drop("ne").localCheckpoint(eager=False)

    w1 = Window.partitionBy("q_id").orderBy(F.col("r").desc(), F.col("n_id"))
    sel = (
        cand.withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") == 1)
        .select(
            "q_id",
            F.lit(1).cast("long").alias("step"),
            "n_id",
            "r",
            (F.col("r") * MMR_LAMBDA_NUM).alias("score"),
        )
    )
    for t in range(2, MMR_K + 1):
        max_s = (
            sims.join(
                sel.select("q_id", F.col("n_id").alias("b_id")), ["q_id", "b_id"]
            )
            .groupBy("q_id", "a_id")
            .agg(F.max("s").alias("max_s"))
        )
        rem = cand.join(sel.select("q_id", "n_id"), ["q_id", "n_id"], "left_anti")
        step_scored = rem.join(
            max_s.withColumnRenamed("a_id", "n_id"), ["q_id", "n_id"]
        ).withColumn(
            "score",
            F.col("r") * MMR_LAMBDA_NUM - F.col("max_s") * MMR_DIV_NUM,
        )
        wt = Window.partitionBy("q_id").orderBy(
            F.col("score").desc(), F.col("n_id")
        )
        pick = (
            step_scored.withColumn("rn", F.row_number().over(wt))
            .filter(F.col("rn") == 1)
            .select(
                "q_id", F.lit(t).cast("long").alias("step"), "n_id", "r", "score"
            )
        )
        sel = sel.unionAll(pick)
    return sel.select(
        "q_id",
        "step",
        "n_id",
        F.round(F.col("r") / MMR_Q, 4).alias("rel"),
        # score/1e5 carries exactly 5 decimal digits — round at 5, never
        # 4: a 4-digit round can land on an exact .xxxx5 half, where
        # Spark (HALF_UP) and DuckDB disagree
        F.round(F.col("score") / (MMR_Q * 10.0), 5).alias("mmr"),
    )


def embedding_array_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function coverage over the vector column: per-vector max /
    min / mean / positive-component count — all JVM-side array
    expressions, one scan, no shuffle."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = F.col("embedding")
    total = F.aggregate(
        e, F.lit(0.0), lambda acc, x: acc + x.cast("double")
    )
    return emb.select(
        "vec_id",
        F.round(F.array_max(e).cast("double"), 6).alias("dim_max"),
        F.round(F.array_min(e).cast("double"), 6).alias("dim_min"),
        F.round(total / F.size(e), 6).alias("dim_mean"),
        F.size(F.filter(e, lambda x: x > 0)).cast("long").alias("n_positive"),
    )


def label_centroid_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean pairwise cosine within/between label classes — corpus-level
    embedding-space diagnostics (intra vs inter class separation).

    Blocked matmul with map-side partial (sum, count) per label pair
    (functions.vector.allpairs_grouped_sums): the final shuffle carries
    one row per (block pair × label pair) instead of one per vector
    pair. Rounding at 1e-6 absorbs the matmul's accumulation-order
    drift (≤1e-12 on a mean of ~1e6 pairs)."""
    emb = load_table(spark, sf_dir, "embeddings")
    partial = vector.allpairs_grouped_sums(
        emb, "vec_id", "embedding", ["label"], n_blocks=8
    )
    return (
        partial.groupBy(
            F.col("ga_label").cast("long").alias("label_a"),
            F.col("gb_label").cast("long").alias("label_b")
        )
        .agg(
            F.round(F.sum("part_sum") / F.sum("part_n"), 6).alias("avg_cos"),
            F.sum("part_n").alias("n_pairs"),
        )
    )


# ---- oracles ---------------------------------------------------------------


def _plane_sql(plane: list[float]) -> str:
    return "[" + ", ".join(repr(v) for v in plane) + "]"


_EMB = "CAST({t}.embedding AS DOUBLE[])"
_BUCKET = " + ".join(
    f"(CASE WHEN list_dot_product({{e}}, {_plane_sql(p)}) >= 0 THEN {1 << i} ELSE 0 END)"
    for i, p in enumerate(PLANES)
)

_BRUTE_ORACLE = f"""
    WITH scored AS (
        SELECT q.vec_id AS q_id, c.vec_id AS n_id,
               ROUND(list_dot_product({_EMB.format(t='q')},
                                      {_EMB.format(t='c')}), 4) AS cos_sim
        FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
        WHERE q.vec_id < {N_QUERIES}),
    ranked AS (
        SELECT q_id, n_id, cos_sim,
               ROW_NUMBER() OVER (PARTITION BY q_id
                                  ORDER BY cos_sim DESC, n_id) AS rnk
        FROM scored)
    SELECT q_id, n_id, cos_sim, rnk FROM ranked WHERE rnk <= {TOP_K}
"""

_ANN_ORACLE = f"""
    WITH bucketed AS (
        SELECT vec_id, embedding,
               {_BUCKET.format(e='CAST(embedding AS DOUBLE[])')} AS bucket
        FROM embeddings),
    scored AS (
        SELECT q.vec_id AS q_id, c.vec_id AS n_id,
               ROUND(list_dot_product(CAST(q.embedding AS DOUBLE[]),
                                      CAST(c.embedding AS DOUBLE[])), 4) AS cos_sim
        FROM bucketed q JOIN bucketed c
          ON q.bucket = c.bucket AND q.vec_id != c.vec_id
        WHERE q.vec_id < {N_QUERIES}),
    ranked AS (
        SELECT q_id, n_id, cos_sim,
               ROW_NUMBER() OVER (PARTITION BY q_id
                                  ORDER BY cos_sim DESC, n_id) AS rnk
        FROM scored)
    SELECT q_id, n_id, cos_sim, rnk FROM ranked WHERE rnk <= {ANN_TOP_K}
"""

_CENT_VALUES = ", ".join(
    f"({i}, {_plane_sql(v)})" for i, v in enumerate(CENTROIDS)
)

_IVF_ORACLE = f"""
    WITH cent(cidx, cvec) AS (VALUES {_CENT_VALUES}),
    scored_cells AS (
        SELECT e.vec_id, e.embedding,
               c.cidx,
               ROW_NUMBER() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                             c.cvec) DESC, c.cidx) AS crn
        FROM embeddings e CROSS JOIN cent c),
    corpus AS (
        SELECT vec_id AS n_id, embedding AS ne, cidx AS cell
        FROM scored_cells WHERE crn = 1),
    probes AS (
        SELECT vec_id AS q_id, embedding AS qe, cidx AS cell
        FROM scored_cells WHERE vec_id < {N_QUERIES} AND crn <= {NPROBE}),
    scored AS (
        SELECT q_id, n_id,
               ROUND(list_dot_product(CAST(qe AS DOUBLE[]),
                                      CAST(ne AS DOUBLE[])), 4) AS cos_sim
        FROM probes JOIN corpus USING (cell)
        WHERE q_id != n_id),
    ranked AS (
        SELECT q_id, n_id, cos_sim,
               ROW_NUMBER() OVER (PARTITION BY q_id
                                  ORDER BY cos_sim DESC, n_id) AS rnk
        FROM scored)
    SELECT q_id, n_id, cos_sim, rnk FROM ranked WHERE rnk <= {IVF_TOP_K}
"""

_LABEL_ORACLE = """
    SELECT least(a.label, b.label) AS label_a,
           greatest(a.label, b.label) AS label_b,
           ROUND(AVG(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                      CAST(b.embedding AS DOUBLE[]))), 6) AS avg_cos,
           COUNT(*) AS n_pairs
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    GROUP BY 1, 2
"""

_RECALL_ORACLE = f"""
    WITH exact_k AS (
        SELECT q_id, n_id FROM ({_BRUTE_ORACLE}) b WHERE rnk <= {ANN_TOP_K}),
    lsh AS (SELECT q_id, n_id FROM ({_ANN_ORACLE}) a),
    ivf AS (SELECT q_id, n_id FROM ({_IVF_ORACLE}) i),
    base AS (SELECT q_id, COUNT(*) AS n_exact FROM exact_k GROUP BY q_id),
    hl AS (SELECT e.q_id, COUNT(*) AS lsh_hits
           FROM exact_k e JOIN lsh USING (q_id, n_id) GROUP BY e.q_id),
    hi AS (SELECT e.q_id, COUNT(*) AS ivf_hits
           FROM exact_k e JOIN ivf USING (q_id, n_id) GROUP BY e.q_id)
    SELECT base.q_id, base.n_exact,
           CAST(COALESCE(lsh_hits, 0) AS BIGINT) AS lsh_hits,
           CAST(COALESCE(ivf_hits, 0) AS BIGINT) AS ivf_hits,
           CAST(COALESCE(lsh_hits, 0) AS DOUBLE) / base.n_exact AS lsh_recall,
           CAST(COALESCE(ivf_hits, 0) AS DOUBLE) / base.n_exact AS ivf_recall
    FROM base LEFT JOIN hl ON base.q_id = hl.q_id
              LEFT JOIN hi ON base.q_id = hi.q_id
"""

_HARD_NEG_ORACLE = f"""
    WITH scored AS (
        SELECT q.vec_id AS q_id, CAST(q.label AS BIGINT) AS q_label,
               c.vec_id AS n_id, CAST(c.label AS BIGINT) AS n_label,
               ROUND(list_dot_product(CAST(q.embedding AS DOUBLE[]),
                                      CAST(c.embedding AS DOUBLE[])), 4) AS cos_sim
        FROM embeddings q JOIN embeddings c
          ON q.vec_id != c.vec_id AND q.label != c.label
        WHERE q.vec_id < {N_QUERIES}),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                                     ORDER BY cos_sim DESC, n_id) AS rnk
        FROM scored)
    SELECT q_id, q_label, n_id, n_label, cos_sim, rnk
    FROM ranked WHERE rnk <= {HARD_NEG_K}
"""

def _mmr_oracle() -> str:
    """Unrolled greedy MMR as chained CTEs — the same integer-quantized
    argmax sequence the Spark loop runs, step for step."""
    q4 = "CAST(FLOOR(ROUND({x}, 4) * {q} + 0.5) AS BIGINT)".format
    dot = (
        "list_dot_product(CAST({a}.embedding AS DOUBLE[]), "
        "CAST({b}.embedding AS DOUBLE[]))"
    ).format
    parts = [
        f"""
    WITH scored AS (
        SELECT q.vec_id AS q_id, c.vec_id AS n_id,
               {q4(x=dot(a='q', b='c'), q=MMR_Q)} AS r
        FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
        WHERE q.vec_id < {N_QUERIES}),
    cand AS (
        SELECT q_id, n_id, r FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                        ORDER BY r DESC, n_id) AS rn
            FROM scored) WHERE rn <= {MMR_POOL}),
    sims AS (
        SELECT a.q_id, a.n_id AS a_id, b.n_id AS b_id,
               {q4(x=dot(a='ea', b='eb'), q=MMR_Q)} AS s
        FROM cand a JOIN cand b
          ON a.q_id = b.q_id AND a.n_id != b.n_id
        JOIN embeddings ea ON ea.vec_id = a.n_id
        JOIN embeddings eb ON eb.vec_id = b.n_id),
    selall1 AS (
        SELECT q_id, CAST(1 AS BIGINT) AS step, n_id, r,
               r * {MMR_LAMBDA_NUM} AS score
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                          ORDER BY r DESC, n_id) AS rn
              FROM cand) WHERE rn = 1)"""
    ]
    for t in range(2, MMR_K + 1):
        parts.append(f""",
    selall{t} AS (
        SELECT * FROM selall{t - 1}
        UNION ALL
        SELECT q_id, CAST({t} AS BIGINT) AS step, n_id, r, score FROM (
            SELECT c.q_id, c.n_id, c.r,
                   c.r * {MMR_LAMBDA_NUM} - m.max_s * {MMR_DIV_NUM} AS score,
                   ROW_NUMBER() OVER (PARTITION BY c.q_id
                       ORDER BY c.r * {MMR_LAMBDA_NUM}
                                - m.max_s * {MMR_DIV_NUM} DESC,
                                c.n_id) AS rn
            FROM cand c
            JOIN (SELECT s.q_id, s.a_id, MAX(s.s) AS max_s
                  FROM sims s JOIN selall{t - 1} p
                    ON p.q_id = s.q_id AND p.n_id = s.b_id
                  GROUP BY 1, 2) m
              ON m.q_id = c.q_id AND m.a_id = c.n_id
            WHERE NOT EXISTS (SELECT 1 FROM selall{t - 1} p
                              WHERE p.q_id = c.q_id AND p.n_id = c.n_id)
        ) WHERE rn = 1)""")
    parts.append(f"""
    SELECT q_id, step, n_id,
           ROUND(r / {MMR_Q}.0, 4) AS rel,
           ROUND(score / {MMR_Q * 10}.0, 5) AS mmr
    FROM selall{MMR_K}""")
    return "".join(parts)


_MMR_ORACLE = _mmr_oracle()


QUERIES: dict[str, Callable] = {
    "ext_sim_bruteforce_topk": brute_force_topk,
    "ext_sim_ann_lsh_topk": ann_lsh_topk,
    "ext_sim_ivf_topk": ivf_topk,
    "ext_sim_recall_eval": ann_recall_eval,
    "ext_sim_label_pairs": label_centroid_similarity,
    "ext_sim_hard_negatives": hard_negative_mining,
    "ext_mmr_rerank": mmr_rerank,
    "ext_array_funcs": embedding_array_stats,
}

ORACLES: dict[str, str] = {
    "ext_sim_bruteforce_topk": _BRUTE_ORACLE,
    "ext_sim_hard_negatives": _HARD_NEG_ORACLE,
    "ext_mmr_rerank": _MMR_ORACLE,
    "ext_sim_ann_lsh_topk": _ANN_ORACLE,
    "ext_sim_ivf_topk": _IVF_ORACLE,
    "ext_sim_recall_eval": _RECALL_ORACLE,
    "ext_sim_label_pairs": _LABEL_ORACLE,
    # float32 values round-trip exactly through the DOUBLE cast; the
    # mean accumulates left-to-right in double on both engines
    "ext_array_funcs": """
        SELECT vec_id,
               ROUND(CAST(list_max(embedding) AS DOUBLE), 6) AS dim_max,
               ROUND(CAST(list_min(embedding) AS DOUBLE), 6) AS dim_min,
               ROUND(list_sum(CAST(embedding AS DOUBLE[]))
                     / len(embedding), 6) AS dim_mean,
               len(list_filter(embedding, x -> x > 0)) AS n_positive
        FROM embeddings
    """,
}
