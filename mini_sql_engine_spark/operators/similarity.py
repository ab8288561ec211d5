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
import math
from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession, Window, functions as F

from mini_sql_engine_spark.functions.frames import jvm_rows
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


def _dot_const_sql(col: str, plane: list[float]) -> str:
    """SQL-text twin of `_dot_const` — same zip_with/aggregate
    left-to-right evaluation, `D`-suffixed literals parse to the same
    IEEE doubles `F.lit` produced (repr round-trip)."""
    vals = ", ".join(f"{v!r}D" for v in plane)
    return (
        f"aggregate(zip_with({col}, array({vals}), "
        "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0.0D, "
        "(acc, v) -> acc + v)"
    )


def bucket_expr(emb: Column, col_name: str = "embedding") -> Column:
    """Random-hyperplane LSH bucket id (sign-bit signature).

    Built as ONE SQL string (SCALE.md round-10 rule 1): the Column
    comprehension cost ~0.4 s of py4j PER CALL (4 planes × 64 F.lit
    doubles + 8 lambda closures) and five registry entries pay it —
    value-identical by the same argument as quality._centroid_scored
    (oracles re-verified at 3 SFs). `emb` is kept for signature
    compatibility; the parsed expression references `col_name`."""
    del emb  # the SQL text binds by name; callers pass F.col(col_name)
    terms = " + ".join(
        f"(CASE WHEN {_dot_const_sql(col_name, plane)} >= 0 "
        f"THEN {1 << p} ELSE 0 END)"
        for p, plane in enumerate(PLANES)
    )
    return F.expr(f"0 + {terms}")


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
    cent = jvm_rows(
        spark, [(i, v) for i, v in enumerate(CENTROIDS)], "cidx int, cvec array<double>"
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


def _mmr_rerank_kernel(pool_pdf, sims_pdf):
    """Greedy λ-MMR per query over the bounded (pool, pairwise-sims)
    tables — integer arithmetic only, replicating the unrolled
    join/window formulation pick-for-pick: step 1 maximizes
    (r, -n_id); step t maximizes (r·λnum − divnum·max_{b∈sel} s,
    -n_id) over unselected candidates having a sims row to a selected
    doc (the inner join would drop the others)."""
    import pandas as pd

    pool = [
        (int(r.n_id), int(r.r)) for r in pool_pdf.itertuples(index=False)
    ]
    smap = {
        (int(r.a_id), int(r.b_id)): int(r.s)
        for r in sims_pdf.itertuples(index=False)
    }
    rows: list[tuple] = []
    sel_ids: list[int] = []
    if pool:
        qid = int(pool_pdf["q_id"].iloc[0])
        nid, rel = max(pool, key=lambda p: (p[1], -p[0]))
        rows.append((qid, 1, nid, rel, rel * MMR_LAMBDA_NUM))
        sel_ids.append(nid)
        for t in range(2, MMR_K + 1):
            scored = [
                (rel * MMR_LAMBDA_NUM - MMR_DIV_NUM * max(sims), nid, rel)
                for nid, rel in pool
                if nid not in sel_ids
                and (
                    sims := [
                        smap[(nid, b)]
                        for b in sel_ids
                        if (nid, b) in smap
                    ]
                )
            ]
            if not scored:
                break
            score, nid, rel = max(scored, key=lambda c: (c[0], -c[1]))
            rows.append((qid, t, nid, rel, score))
            sel_ids.append(nid)
    return pd.DataFrame(
        rows, columns=["q_id", "step", "n_id", "r", "score"]
    )


def mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-marginal-relevance diversified top-k (Carbonell &
    Goldstein 1998): greedily pick MMR_K of the MMR_POOL most-relevant
    candidates per query, each step maximizing
    λ·rel(q,c) − (1−λ)·max_{s∈selected} sim(c,s) — the re-ranking that
    keeps a retrieval slate from being MMR_K near-copies of the same
    document (the failure mode near-dup-heavy corpora hit hardest).

    Execution: the DISTRIBUTED stage is candidate generation — the
    same broadcast-query scoring scan as brute_force_topk, window
    top-MMR_POOL per query. The greedy selection then runs as ONE
    Arrow cogroup kernel per query over the (pool, pairwise-sims)
    tables — both constant-size (≤ POOL / POOL² rows) by
    construction — because greedy MMR is inherently sequential in the
    picks; the former MMR_K-step unrolled join+window loop paid a
    driver-synchronized multi-stage job per pick (never a collect,
    but fixed cost at any scale). Scores quantize to integers
    (1e-4 steps) BEFORE the kernel, so Python arithmetic is
    integer-only and the argmax sequence exactly reproducible; ties
    break on candidate id. The oracle unrolls the identical greedy
    steps as chained CTEs.

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
    # checkpoint the candidate pool FIRST (one run of the corpus
    # scoring scan), then derive the pairwise-sim table from the
    # checkpointed pool — deriving it from the raw lineage would run
    # the full scan a second time (measured: 2× the scan cost)
    cand = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= MMR_POOL)
        .select("q_id", "n_id", "r", "ne")
        # q×POOL rows: collapse to one partition so every loop stage
        # below is a single task (the scan stage ahead of the window
        # shuffle keeps its full parallelism)
        .coalesce(1)
    ).localCheckpoint(eager=False)
    # pairwise candidate sims: (q × POOL²) rows — constant-size
    a = cand.select("q_id", F.col("n_id").alias("a_id"), F.col("ne").alias("ae"))
    b = cand.select("q_id", F.col("n_id").alias("b_id"), F.col("ne").alias("be"))
    sims = (
        a.join(b, ["q_id"])
        .filter(F.col("a_id") != F.col("b_id"))
        .select(
            "q_id", "a_id", "b_id",
            _q4(vector.dot(F.col("ae"), F.col("be"))).alias("s"),
        )
        .coalesce(1)
        # cheap (derives from the checkpointed pool) — and severs the
        # shared-attribute lineage the cogroup below would reject as
        # an ambiguous self-join
        .localCheckpoint(eager=False)
    )
    cand = cand.drop("ne")

    # Round 10: the greedy selection runs as ONE Arrow cogroup kernel
    # per query (the `pipeline_hybrid_retrieval` shape) instead of
    # MMR_K−1 unrolled join+window steps each behind a lazy
    # localCheckpoint — a lazy checkpoint's toRdd executes eagerly, so
    # the old loop paid a driver-synchronized multi-stage job PER PICK
    # (fixed cost at any scale; the per-step tables are q×POOL ≤ 75
    # rows). Pool and sims stay bounded by construction and all kernel
    # arithmetic is the same quantized-integer sequence, so the pick
    # trajectory is bit-identical (oracle-checked).
    sel = (
        cand.groupBy("q_id")
        .cogroup(sims.groupBy("q_id"))
        .applyInPandas(
            _mmr_rerank_kernel,
            "q_id long, step long, n_id long, r long, score long",
        )
    )
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


RBO_P = 0.9  # rank-biased overlap persistence
RBO_K = 10  # evaluation depth (= TOP_K)
# W(m) = Σ_{d=m..K} p^(d-1)/d: an item appearing at ranks (ra, rb)
# contributes to every prefix depth d ≥ max(ra, rb), so RBO@K reduces
# to (1−p)·Σ_items W(max(ra, rb)) — one weight lookup per matched item
# instead of a per-depth intersection loop. Constants are computed
# driver-side and inlined as identical literals into both engines.
_RBO_W: list[float] = [
    sum(RBO_P ** (d - 1) / d for d in range(m, RBO_K + 1))
    for m in range(1, RBO_K + 1)
]

# NDCG position discounts 1/log2(d+1) and their prefix sums (IDCG for
# an ideal list of the first n positions) — literals, no runtime libm.
_NDCG_DISC: list[float] = [1.0 / math.log2(d + 1) for d in range(1, RBO_K + 1)]
_NDCG_CUM: list[float] = [
    sum(_NDCG_DISC[: i + 1]) for i in range(RBO_K)
]


def _ann_ranking(emb: DataFrame, depth: int) -> DataFrame:
    """LSH-bucketed ANN ranking to `depth` (same bucket machinery as
    ann_lsh_topk, parameterized depth)."""
    bucketed = emb.withColumn("bucket", bucket_expr(F.col("embedding")))
    q = bucketed.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("qe"),
        F.col("bucket"),
    )
    c = bucketed.select(
        F.col("vec_id").alias("n_id"),
        F.col("embedding").alias("ne"),
        F.col("bucket"),
    )
    scored = (
        F.broadcast(q)
        .join(c, ["bucket"])
        .filter(F.col("q_id") != F.col("n_id"))
        .withColumn("cos_sim", F.round(vector.dot(F.col("qe"), F.col("ne")), 4))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("n_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= depth)
        .select("q_id", "n_id", "rnk")
    )


def rank_biased_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RBO@K (Webber et al. 2010) between the exact brute-force and the
    LSH-ANN rankings per query — the top-weighted agreement measure for
    comparing two retrieval systems (recall@k treats rank 1 and rank k
    alike; RBO discounts geometrically, which is how users read result
    lists). Uses the weight-lookup identity (see _RBO_W): one inner
    join on (query, item), a greatest(ra, rb) per matched item, one
    constant-array lookup, one qsum.

    Scale notes (100 TB): both input rankings are top-K per query —
    q×K rows regardless of corpus size; the corpus-scale work lives in
    the ranking producers. The join is on the thin (q_id, n_id) key
    and the weight table is a K-entry literal, so evaluation cost is
    O(q·K) always.
    """
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
    wA = Window.partitionBy("q_id").orderBy(
        F.col("cos_sim").desc(), F.col("n_id")
    )
    exact = (
        scored.withColumn("ra", F.row_number().over(wA))
        .filter(F.col("ra") <= RBO_K)
        .select("q_id", "n_id", "ra")
    )
    ann = _ann_ranking(emb, RBO_K).withColumnRenamed("rnk", "rb")
    warr = F.array(*[F.lit(v) for v in _RBO_W])
    matched = exact.join(ann, ["q_id", "n_id"]).select(
        "q_id",
        F.element_at(
            warr, F.greatest("ra", "rb").cast("int")
        ).alias("w"),
    )
    per_q = matched.groupBy("q_id").agg(
        F.count(F.lit(1)).alias("n_overlap"),
        F.sum(F.floor(F.col("w") * 1_000_000_000 + 0.5).cast("long")).alias(
            "w_q"
        ),
    )
    qs = q.select("q_id")
    return (
        qs.join(per_q, "q_id", "left")
        .select(
            "q_id",
            F.coalesce("n_overlap", F.lit(0)).cast("long").alias("n_overlap"),
            F.round(
                (1.0 - RBO_P) * F.coalesce("w_q", F.lit(0)) / 1_000_000_000,
                6,
            ).alias("rbo"),
        )
    )


def ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-graded NDCG@K of the LSH-ANN ranking: binary relevance =
    candidate shares the query's label; IDCG uses the corpus-wide
    same-label count (capped at K), so the score penalizes both
    mis-ranked and missed relevant neighbors — the retrieval-quality
    readout recall@k (ext_sim_recall_eval) cannot give because it
    ignores positions. Discounts 1/log2(d+1) and their prefix sums are
    driver-side literal constants; the per-query sums run through
    integer-quantized accumulation.

    Scale notes (100 TB): ANN list is q×K rows; the label prior is a
    |labels|-row broadcast. Nothing scales with the corpus except the
    ranking producer itself.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    ann = _ann_ranking(emb, RBO_K)
    labels = emb.select(F.col("vec_id").alias("n_id"), F.col("label").alias("n_label"))
    qlab = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("label").alias("q_label")
    )
    disc = F.array(*[F.lit(v) for v in _NDCG_DISC])
    cum = F.array(*[F.lit(v) for v in _NDCG_CUM])
    dcg = (
        ann.join(F.broadcast(labels), "n_id")
        .join(F.broadcast(qlab), "q_id")
        .groupBy("q_id", "q_label")
        .agg(
            F.sum(
                F.when(F.col("n_label") == F.col("q_label"), 1).otherwise(0)
            ).alias("n_hits"),
            F.sum(
                F.when(
                    F.col("n_label") == F.col("q_label"),
                    F.floor(
                        F.element_at(disc, F.col("rnk").cast("int"))
                        * 1_000_000_000
                        + 0.5
                    ).cast("long"),
                ).otherwise(0)
            ).alias("dcg_q"),
        )
    )
    lab_counts = emb.groupBy(F.col("label").alias("q_label")).agg(
        F.count(F.lit(1)).alias("n_label_total")
    )
    joined = dcg.join(F.broadcast(lab_counts), "q_label").select(
        "q_id",
        "n_hits",
        (F.col("dcg_q") / 1_000_000_000).alias("dcg"),
        # ideal list length: same-label corpus members excluding the
        # query itself, capped at K
        F.least(F.col("n_label_total") - 1, F.lit(RBO_K)).alias("ideal_len"),
    )
    return joined.select(
        "q_id",
        F.col("n_hits").cast("long").alias("n_hits"),
        F.round("dcg", 6).alias("dcg"),
        F.round(
            F.when(F.col("ideal_len") <= 0, F.lit(0.0)).otherwise(
                F.col("dcg")
                / F.element_at(cum, F.col("ideal_len").cast("int"))
            ),
            6,
        ).alias("ndcg"),
    )


MRR_LCM = 2520  # lcm(1..10): MRR_LCM/rank is an exact integer ∀ rank ≤ RBO_K


def mrr_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean reciprocal rank of the LSH-ANN ranking (binary relevance =
    shares the query's label) — the first-hit metric that complements
    NDCG (graded whole-list quality) and recall@k (set coverage): MRR
    is what a retrieval-augmented pipeline that consumes only the top
    usable hit actually experiences. Per query: the rank of the first
    relevant neighbor and its reciprocal; queries with no relevant hit
    in the top-K contribute 0 (rank reported as 0, not NULL, so the
    value hash is engine-stable).

    Float discipline: reciprocal ranks are accumulated as the exact
    integers MRR_LCM/rank (every rank ≤ K divides MRR_LCM), so the MRR
    sum is BIGINT-exact and order-proof; the only float ops are two
    final divisions on exact operands — no ROUND, no ordering hazard.

    Scale notes (100 TB): the ANN list is q×K rows however large the
    corpus; labels attach by broadcast. Everything here is
    metadata-sized next to the ranking producer."""
    emb = load_table(spark, sf_dir, "embeddings")
    ann = _ann_ranking(emb, RBO_K)
    labels = emb.select(F.col("vec_id").alias("n_id"), F.col("label").alias("n_label"))
    qlab = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("label").alias("q_label")
    )
    first = (
        ann.join(F.broadcast(labels), "n_id")
        .join(F.broadcast(qlab), "q_id")
        .groupBy("q_id")
        .agg(
            F.min(
                F.when(F.col("n_label") == F.col("q_label"), F.col("rnk"))
            ).alias("first_rel")
        )
    )
    scaled = (
        qlab.select("q_id")
        .join(first, "q_id", "left")  # a query whose ANN list has no hit still scores 0
        .select(
            "q_id",
            F.coalesce("first_rel", F.lit(0)).cast("long").alias("first_rel_rank"),
            F.coalesce(
                F.expr(f"{MRR_LCM} div first_rel"), F.lit(0)
            ).cast("long").alias("rr_scaled"),
        )
    )
    total = scaled.agg(F.sum("rr_scaled").alias("rr_sum"))
    return scaled.crossJoin(F.broadcast(total)).select(
        "q_id",
        "first_rel_rank",
        (F.col("rr_scaled").cast("double") / MRR_LCM).alias("rr"),
        (F.col("rr_sum").cast("double") / (MRR_LCM * float(N_QUERIES))).alias("mrr"),
    )


NOISE_SAMPLE = 100  # audit-sample size (vec_id < this)
NOISE_K = 10  # neighborhood size for the label-agreement vote


def label_noise_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Likely-mislabeled-example detection by kNN label disagreement
    (the confident-learning screen a curation pipeline runs before
    trusting labels for training or eval): for each audit-sample
    point, the fraction of its NOISE_K nearest neighbors (cosine)
    that share its label; a point whose neighborhood majority
    DISAGREES is flagged suspect. ext_knn_shapley prices examples,
    this one flags the probably-wrong ones — same ranking machinery,
    different question.

    Ranking orders by the RAW dot product (bit-identical sequential
    fold in both engines) with vec_id tie-break — no rounding anywhere
    in the rank path; agreement is integer ppm and the suspect flag is
    an integer comparison.

    Scale notes (100 TB): the deterministic audit sample broadcasts
    against the corpus — cost is |corpus| × |sample| map-side work +
    one sample-keyed window, the sampled-audit shape that keeps label
    QA linear in the corpus. Auditing EVERY point would swap the
    broadcast for the ANN bucket join (ext_sim_ann_lsh_topk)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < NOISE_SAMPLE).select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("q_label"),
        F.col("embedding").alias("qe"),
    )
    c = emb.select(
        F.col("vec_id").alias("n_id"),
        F.col("label").alias("n_label"),
        F.col("embedding").alias("ne"),
    )
    scored = (
        F.broadcast(q)
        .join(c, F.col("q_id") != F.col("n_id"))
        .withColumn("s", vector.dot(F.col("qe"), F.col("ne")))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("s").desc(), F.col("n_id"))
    agree = (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= NOISE_K)
        .groupBy("q_id", "q_label")
        .agg(
            F.sum(
                F.when(F.col("n_label") == F.col("q_label"), 1).otherwise(0)
            ).alias("n_agree")
        )
    )
    return agree.select(
        "q_id",
        F.col("q_label").alias("label"),
        F.col("n_agree").cast("long").alias("n_agree"),
        F.floor(F.col("n_agree") * 1_000_000 / NOISE_K)
        .cast("long")
        .alias("agree_ppm"),
        F.when(F.col("n_agree") * 2 < NOISE_K, 1)
        .otherwise(0)
        .cast("long")
        .alias("suspect"),
    )


KSH_K = 5  # the KNN classifier's k
KSH_TOPB = 3  # most/least valuable train points reported per test


def knn_shapley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact KNN-Shapley data valuation (Jia et al., VLDB 2019): the
    Shapley value of every training point for a k-NN classifier on
    each test point, via the closed-form recurrence
    s_(N) = 1[y_N = y]/N,
    s_(j) = s_(j+1) + (1[y_j = y] − 1[y_j+1 = y])/K · min(K, j)/j —
    the data-valuation method that tells a curation pipeline WHICH
    examples help or hurt, at sort cost instead of Monte-Carlo
    retraining. The recurrence telescopes into a reverse cumulative
    sum over the similarity ranking, so the whole computation is two
    windows; increments quantize to integer nano-units before the
    cumulative sum, making the telescoped float sum order-proof.
    Output: the KSH_TOPB most and least valuable train points per
    test query (ties → smaller id).

    Scale notes (100 TB): per-test ranking is the same broadcast-
    scoring scan + keyed window as brute-force top-k — one shuffle on
    the test key; the recurrence adds two window passes over the
    ranked partition, no extra shuffle. At billions of train points,
    rank within ANN candidates instead (the recurrence only needs
    contiguous ranks, which a re-rank within the candidate set
    provides).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("qe"),
        F.col("label").alias("q_label"),
    )
    c = emb.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("n_id"),
        F.col("embedding").alias("ne"),
        F.col("label").alias("n_label"),
    )
    ranked = (
        F.broadcast(q)
        .join(c)
        .withColumn("cos_sim", F.round(vector.dot(F.col("qe"), F.col("ne")), 4))
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy("q_id").orderBy(
                    F.col("cos_sim").desc(), F.col("n_id")
                )
            ),
        )
        .withColumn(
            "ind", (F.col("n_label") == F.col("q_label")).cast("long")
        )
        .select("q_id", "n_id", "rnk", "ind")
    )
    wq = Window.partitionBy("q_id")
    wrev = wq.orderBy(F.col("rnk").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    n_tot = F.count(F.lit(1)).over(wq)
    ind_next = F.lead("ind").over(wq.orderBy("rnk"))
    # per-rank increment t_j = (ind_j − ind_{j+1})/K · min(K, j)/j,
    # quantized; the farthest rank seeds the recurrence with ind_N/N
    term = (
        (F.col("ind") - ind_next)
        / KSH_K
        * F.least(F.lit(KSH_K), F.col("rnk"))
        / F.col("rnk")
    )
    base = F.when(
        F.col("rnk") == n_tot,
        F.floor(F.col("ind") / n_tot * 1_000_000_000 + 0.5).cast("long"),
    ).otherwise(
        F.floor(term * 1_000_000_000 + 0.5).cast("long")
    )
    with_s = ranked.withColumn("t_q", base).withColumn(
        "s_q", F.sum("t_q").over(wrev)
    )
    wtop = Window.partitionBy("q_id").orderBy(
        F.col("s_q").desc(), F.col("n_id")
    )
    wbot = Window.partitionBy("q_id").orderBy(F.col("s_q"), F.col("n_id"))
    return (
        with_s.withColumn("r_top", F.row_number().over(wtop))
        .withColumn("r_bot", F.row_number().over(wbot))
        .filter((F.col("r_top") <= KSH_TOPB) | (F.col("r_bot") <= KSH_TOPB))
        .select(
            "q_id",
            "n_id",
            F.col("rnk").cast("long").alias("sim_rank"),
            F.col("ind").alias("same_label"),
            F.round(F.col("s_q") / 1_000_000_000, 6).alias("shapley"),
            F.when(F.col("r_top") <= KSH_TOPB, F.lit("helpful"))
            .otherwise(F.lit("harmful"))
            .alias("role"),
        )
    )


FL_POOL = 16  # candidate facilities (vec_id < FL_POOL)
FL_K = 5  # representatives selected


def facility_location_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Submodular facility-location coreset selection: greedily pick
    FL_K representatives from a candidate pool maximizing
    Σ_v max_{s∈S} sim(v, s) over the WHOLE corpus — the published
    data-selection objective for representative subset / coreset
    construction (greedy is (1−1/e)-optimal by submodularity). Unlike
    MMR (which diversifies a slate against itself), facility location
    optimizes how well the selection COVERS everything else — the
    right objective when choosing exemplars for labeling or few-shot
    prompts. All marginal gains are exact integer sums of quantized
    similarities (no float reduction at all), so the greedy sequence
    is engine- and partitioning-independent.

    Scale notes (100 TB): the (pool × corpus) similarity table is one
    broadcast-scoring scan (|pool| copies of each corpus row — the
    pool is the broadcast side); each greedy step is one join +
    |pool|-row aggregate over it, recomputing the coverage vector
    in-plan from the selected set (nothing corpus-sized is ever
    checkpointed). Costs FL_K corpus passes — the published
    lazy-greedy/stochastic variants cut that when pools grow.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    pool = emb.filter(F.col("vec_id") < FL_POOL).select(
        F.col("vec_id").alias("c"), F.col("embedding").alias("ce")
    )
    corpus = emb.select(F.col("vec_id").alias("v"), F.col("embedding").alias("ve"))
    sims = (
        F.broadcast(pool)
        .join(corpus)
        .select("c", "v", _q4(vector.dot(F.col("ce"), F.col("ve"))).alias("s"))
        .localCheckpoint(eager=False)
    )
    # Round 10: no per-step corpus-sized coverage checkpoint. The
    # coverage vector after picking S is cur(v) = max(0, max_{c∈S}
    # s(c, v)) — recomputable per step from the ONE checkpointed sims
    # table and the (≤ FL_K-row) selected set, inside the same job as
    # the gain aggregate. The old chain lazily checkpointed cur every
    # step, and a lazy checkpoint's toRdd executes eagerly — FL_K
    # serialized corpus-wide materialization jobs of pure fixed cost.
    # Each step still pays its corpus pass (the published greedy
    # shape); only the per-step argmax rows are checkpointed (1 row).
    selected: DataFrame | None = None
    for t in range(1, FL_K + 1):
        if selected is None:
            g = sims.groupBy("c").agg(
                F.sum(F.greatest(F.col("s"), F.lit(0))).alias("gain")
            )
        else:
            sel_c = selected.select(F.col("vec_id").alias("c"))
            cur = (
                sims.join(F.broadcast(sel_c), "c")
                .groupBy("v")
                .agg(
                    F.greatest(F.max("s"), F.lit(0).cast("long")).alias(
                        "cur"
                    )
                )
            )
            g = (
                sims.join(cur, "v")
                .groupBy("c")
                .agg(
                    F.sum(
                        F.greatest(F.col("s") - F.col("cur"), F.lit(0))
                    ).alias("gain")
                )
                .join(F.broadcast(sel_c), "c", "left_anti")
            )
        best = (
            g.withColumn(
                "rn",
                F.row_number().over(
                    # bounded global window: argmax over the bounded candidate pool
                    Window.orderBy(F.col("gain").desc(), F.col("c"))
                ),
            )
            .filter(F.col("rn") == 1)
            .select(
                F.lit(t).cast("long").alias("step"),
                F.col("c").alias("vec_id"),
                "gain",
            )
        ).localCheckpoint(eager=False)
        selected = best if selected is None else selected.unionAll(best)
    assert selected is not None
    return selected.select(
        "step",
        "vec_id",
        F.round(F.col("gain") / MMR_Q, 4).alias("marginal_gain"),
    )


KC_K = 4  # total k-center picks: seed + 3 greedy selections
KC_SCALE = 1_000_000  # component quantization (exact integer distances)


def kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center (Gonzalez) coreset selection: seed with the
    smallest vec_id, then repeatedly add the point FARTHEST from the
    current centers (squared L2, ties to the smaller id). The greedy
    sequence 2-approximates the optimal covering radius — the MINIMAX
    dual of `facility_location_coreset` (which maximizes coverage
    similarity): k-center picks OUTLIER-robust diverse exemplars,
    facility location picks density-weighted representatives; a
    curation pipeline wants both views.

    Exactness: components are quantized to integers
    (floor(v·1e6 + 0.5), identical IEEE ops in DuckDB), so every
    distance is an exact BIGINT sum and the greedy trajectory is
    engine- and partitioning-independent. Output is the selection
    trace: each step's chosen center plus the covering radius of the
    PREVIOUS center set (the chosen point's distance — the classic
    certificate that the radius curve decreases), and a final row with
    the covering radius of the full selection.

    Scale notes (100 TB): each step is ONE narrow corpus pass — the
    centers ride along as a broadcast 1-row array (≤ KC_K structs), the
    per-point min-distance is a JVM higher-order expression
    (zip_with + aggregate, no Python, no shuffle), and the argmax is a
    TakeOrdered(1), not a sort. K passes total, the textbook
    distributed Gonzalez; the selected-point frames are 1-row
    localCheckpoints so step t never re-executes steps < t.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    pts = (
        emb.select(
            "vec_id",
            F.transform(
                "embedding",
                lambda v: F.floor(
                    v.cast("double") * KC_SCALE + F.lit(0.5)
                ).cast("long"),
            ).alias("q"),
        )
        .localCheckpoint(eager=False)  # reused by all K+1 passes
    )

    def dmin_col(cs_col: Column) -> Column:
        return F.array_min(
            F.transform(
                cs_col,
                lambda c: F.aggregate(
                    F.zip_with(
                        F.col("q"), c["c_q"], lambda a, b: (a - b) * (a - b)
                    ),
                    F.lit(0).cast("long"),
                    lambda acc, x: acc + x,
                ),
            )
        )

    seed = (
        pts.orderBy("vec_id")
        .limit(1)
        .select(
            F.lit(0).cast("long").alias("step"),
            F.col("vec_id").alias("center_id"),
            F.col("q").alias("c_q"),
            F.lit(None).cast("long").alias("radius_sq"),
        )
        .localCheckpoint(eager=False)
    )
    centers = seed
    trace = seed.select("step", "center_id", "radius_sq")
    for t in range(1, KC_K):
        cs1 = centers.agg(
            F.collect_list(F.struct(F.col("c_q"))).alias("cs")
        )
        chosen = (
            pts.crossJoin(F.broadcast(cs1))
            .select(
                "vec_id", "q", dmin_col(F.col("cs")).alias("dmin")
            )
            .orderBy(F.col("dmin").desc(), F.col("vec_id"))
            .limit(1)
            .select(
                F.lit(t).cast("long").alias("step"),
                F.col("vec_id").alias("center_id"),
                F.col("q").alias("c_q"),
                F.col("dmin").alias("radius_sq"),
            )
            .localCheckpoint(eager=False)
        )
        centers = centers.unionByName(chosen)
        trace = trace.unionByName(
            chosen.select("step", "center_id", "radius_sq")
        )
    cs_final = centers.agg(
        F.collect_list(F.struct(F.col("c_q"))).alias("cs")
    )
    final = (
        pts.crossJoin(F.broadcast(cs_final))
        .agg(F.max(dmin_col(F.col("cs"))).alias("radius_sq"))
        .select(
            F.lit(KC_K).cast("long").alias("step"),
            F.lit(-1).cast("long").alias("center_id"),
            "radius_sq",
        )
    )
    return trace.unionByName(final)


def _kc_oracle() -> str:
    """Unrolled greedy k-center replay: center t is a 1-row CTE; the
    per-point min distance at step t is LEAST of t correlated exact
    integer sums over the quantized components."""
    from mini_sql_engine_spark.operators.pipeline_ops import EMB_DIM

    def dist(c: str) -> str:
        return (
            f"(SELECT SUM((p.q[i] - {c}.c_q[i]) * (p.q[i] - {c}.c_q[i]))"
            f" FROM {c}, generate_series(1, {EMB_DIM}) t(i))"
        )

    parts = [
        f"""
    WITH q AS (
        SELECT vec_id,
               list_transform(embedding,
                   v -> CAST(FLOOR(CAST(v AS DOUBLE) * {KC_SCALE} + 0.5)
                             AS BIGINT)) AS q
        FROM embeddings),
    c0 AS (SELECT vec_id AS center_id, q AS c_q FROM q
           ORDER BY vec_id LIMIT 1)"""
    ]
    for t in range(1, KC_K + 1):
        dmin = "LEAST(" + ", ".join(
            dist(f"c{j}") for j in range(t)
        ) + ")"
        parts.append(
            f""",
    s{t} AS (SELECT p.vec_id, p.q, {dmin} AS dmin FROM q p)"""
        )
        if t < KC_K:
            parts.append(
                f""",
    c{t} AS (SELECT vec_id AS center_id, q AS c_q, dmin AS r
             FROM s{t} ORDER BY dmin DESC, vec_id LIMIT 1)"""
            )
    selects = [
        "SELECT CAST(0 AS BIGINT) AS step, CAST(center_id AS BIGINT) AS "
        "center_id, CAST(NULL AS BIGINT) AS radius_sq FROM c0"
    ]
    for t in range(1, KC_K):
        selects.append(
            f"SELECT CAST({t} AS BIGINT), CAST(center_id AS BIGINT), "
            f"CAST(r AS BIGINT) FROM c{t}"
        )
    selects.append(
        f"SELECT CAST({KC_K} AS BIGINT), CAST(-1 AS BIGINT), "
        f"CAST((SELECT MAX(dmin) FROM s{KC_K}) AS BIGINT)"
    )
    return "".join(parts) + "\n    " + "\n    UNION ALL ".join(selects)


def _fl_oracle() -> str:
    q4 = f"CAST(FLOOR(ROUND(list_dot_product(CAST(p.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])), 4) * {MMR_Q} + 0.5) AS BIGINT)"
    parts = [f"""
    WITH sims AS (
        SELECT p.vec_id AS c, e.vec_id AS v, {q4} AS s
        FROM (SELECT * FROM embeddings WHERE vec_id < {FL_POOL}) p
        CROSS JOIN embeddings e),
    cur0 AS (SELECT vec_id AS v, CAST(0 AS BIGINT) AS cur
             FROM embeddings),
    sel0 AS (SELECT CAST(NULL AS BIGINT) AS c WHERE 1 = 0)"""]
    for t in range(1, FL_K + 1):
        parts.append(f""",
    g{t} AS (
        SELECT s.c,
               CAST(SUM(GREATEST(s.s - cur.cur, 0)) AS BIGINT) AS gain
        FROM sims s JOIN cur{t - 1} cur ON cur.v = s.v
        WHERE s.c NOT IN (SELECT c FROM sel{t - 1})
        GROUP BY s.c),
    b{t} AS (
        SELECT c, gain FROM (
            SELECT *, ROW_NUMBER() OVER (ORDER BY gain DESC, c) AS rn
            FROM g{t}) WHERE rn = 1),
    cur{t} AS (
        SELECT cur.v,
               GREATEST(cur.cur, COALESCE(u.s, 0)) AS cur
        FROM cur{t - 1} cur
        LEFT JOIN (SELECT v, s FROM sims JOIN b{t} USING (c)) u
          ON u.v = cur.v),
    sel{t} AS (SELECT c FROM sel{t - 1} UNION ALL SELECT c FROM b{t})""")
    finals = " UNION ALL ".join(
        f"""SELECT CAST({t} AS BIGINT) AS step, c AS vec_id,
               ROUND(gain / {MMR_Q}.0, 4) AS marginal_gain FROM b{t}"""
        for t in range(1, FL_K + 1)
    )
    parts.append("\n    " + finals)
    return "".join(parts)


JL_DIM = 16  # target dimensionality of the random projection


def _jl_plane(j: int) -> list[float]:
    """Deterministic pseudo-random JL projection row (md5 construction,
    'jl' salt — same recipe as PLANES/CENTROIDS)."""
    return [
        (int(hashlib.md5(f"jl{j},{d}".encode()).hexdigest()[:15], 16) % 2001
         - 1000) / 1000.0
        for d in range(DIM)
    ]


JL_PLANES: list[list[float]] = [_jl_plane(j) for j in range(JL_DIM)]


def jl_projection_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson–Lindenstrauss distortion audit: project the embeddings
    64→16 dims through a deterministic random matrix and measure, on
    each query's exact top-10 neighbor pairs, how far the projected
    cosine drifts from the true one — the measurement that decides
    whether a cheap low-dimensional index (4× less memory and
    bandwidth) is safe for THIS corpus, instead of trusting the JL
    bound's constants. Projection scale cancels in cosine, so no
    1/√k factor is needed; all per-pair arithmetic (16 dots, two
    norms, one ratio) runs on identical operands in both engines, and
    the mean absolute error reduces through qsum.

    Scale notes (100 TB): the pair set is queries×top-k (constant);
    the expensive part at scale is projecting the CORPUS — one
    scan-side map (16 dots/vector, codegen-friendly), no shuffle. The
    top-k rank runs on THIN (q_id, n_id, cos64) rows — the 64-dim
    vectors re-join only onto the constant surviving pair set (the
    oracle's own shape) instead of riding the rank shuffle. The 16×64
    projection matrix enters as ONE parsed SQL literal: the former
    per-element `F.lit` construction made 2 000+ py4j calls (~1 s of
    driver time per run at any data scale; round-10).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qe")
    )
    c = emb.select(F.col("vec_id").alias("n_id"), F.col("embedding").alias("ne"))
    scored = (
        F.broadcast(q)
        .join(c, F.col("q_id") != F.col("n_id"))
        .select(
            "q_id",
            "n_id",
            F.round(vector.dot(F.col("qe"), F.col("ne")), 4).alias("cos64"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos64").desc(), F.col("n_id"))
    pairs = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("q_id", "n_id", "cos64")
    )
    pairs = (
        pairs.join(
            emb.select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("qe")),
            "q_id",
        )
        .join(
            emb.select(F.col("vec_id").alias("n_id"), F.col("embedding").alias("ne")),
            "n_id",
        )
    )

    # D-suffixed literals parse to the same IEEE doubles F.lit made;
    # the aggregate/zip_with shape mirrors functions.vector.dot, so
    # every operand and accumulation step is unchanged
    def proj_sql(col: str, j: int) -> str:
        plane = "array(" + ", ".join(f"{v!r}D" for v in JL_PLANES[j]) + ")"
        return (
            f"aggregate(zip_with({col}, {plane}, "
            "(x, y) -> CAST(x AS DOUBLE) * y), 0.0D, (acc, v) -> acc + v)"
        )

    proj_cols = [f"{proj_sql('qe', j)} AS pa{j}" for j in range(JL_DIM)] + [
        f"{proj_sql('ne', j)} AS pb{j}" for j in range(JL_DIM)
    ]
    dot16 = " + ".join(f"pa{j} * pb{j}" for j in range(JL_DIM))
    na = " + ".join(f"pa{j} * pa{j}" for j in range(JL_DIM))
    nb = " + ".join(f"pb{j} * pb{j}" for j in range(JL_DIM))
    rows = (
        pairs.selectExpr("q_id", "n_id", "cos64", *proj_cols)
        .selectExpr(
            "q_id",
            "n_id",
            "cos64",
            f"round(({dot16}) / (sqrt({na}) * sqrt({nb})), 6) AS cos16",
        )
        .localCheckpoint(eager=False)
    )
    err = rows.agg(
        F.sum(
            F.floor(
                F.abs(F.col("cos16") - F.col("cos64")) * 1_000_000_000 + 0.5
            ).cast("long")
        ).alias("err_q"),
        F.count(F.lit(1)).alias("n_pairs"),
    )
    return rows.crossJoin(F.broadcast(err)).select(
        "q_id",
        "n_id",
        "cos64",
        "cos16",
        F.round(
            F.col("err_q") / 1_000_000_000 / F.col("n_pairs"), 6
        ).alias("mean_abs_err"),
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

_KSH_ORACLE = f"""
    WITH ranked AS (
        SELECT q.vec_id AS q_id, c.vec_id AS n_id,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                   ORDER BY ROUND(list_dot_product(
                       CAST(q.embedding AS DOUBLE[]),
                       CAST(c.embedding AS DOUBLE[])), 4) DESC,
                       c.vec_id) AS rnk,
               CAST(c.label = q.label AS BIGINT) AS ind
        FROM (SELECT * FROM embeddings WHERE vec_id < {N_QUERIES}) q
        CROSS JOIN (SELECT * FROM embeddings
                    WHERE vec_id >= {N_QUERIES}) c),
    terms AS (
        SELECT q_id, n_id, rnk, ind,
               COUNT(*) OVER (PARTITION BY q_id) AS n_tot,
               LEAD(ind) OVER (PARTITION BY q_id ORDER BY rnk) AS ind_next
        FROM ranked),
    tq AS (
        SELECT q_id, n_id, rnk, ind,
               CASE WHEN rnk = n_tot
                    THEN CAST(FLOOR(ind / n_tot * 1000000000 + 0.5)
                              AS BIGINT)
                    ELSE CAST(FLOOR((ind - ind_next) / {KSH_K}
                              * LEAST({KSH_K}, rnk) / rnk
                              * 1000000000 + 0.5) AS BIGINT)
               END AS t_q
        FROM terms),
    cum AS (
        SELECT *, SUM(t_q) OVER (PARTITION BY q_id ORDER BY rnk DESC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS s_q
        FROM tq),
    rankedv AS (
        SELECT *,
               ROW_NUMBER() OVER (PARTITION BY q_id
                   ORDER BY s_q DESC, n_id) AS r_top,
               ROW_NUMBER() OVER (PARTITION BY q_id
                   ORDER BY s_q, n_id) AS r_bot
        FROM cum)
    SELECT q_id, n_id, rnk AS sim_rank, ind AS same_label,
           ROUND(s_q / 1000000000 * 1.0, 6) AS shapley,
           CASE WHEN r_top <= {KSH_TOPB} THEN 'helpful'
                ELSE 'harmful' END AS role
    FROM rankedv
    WHERE r_top <= {KSH_TOPB} OR r_bot <= {KSH_TOPB}
"""

def _jl_oracle() -> str:
    pa_cols = ", ".join(
        f"list_dot_product(CAST(ea.embedding AS DOUBLE[]), "
        f"{_plane_sql(JL_PLANES[j])}) AS pa{j}, "
        f"list_dot_product(CAST(eb.embedding AS DOUBLE[]), "
        f"{_plane_sql(JL_PLANES[j])}) AS pb{j}"
        for j in range(JL_DIM)
    )
    dot16 = " + ".join(f"pa{j} * pb{j}" for j in range(JL_DIM))
    na = " + ".join(f"pa{j} * pa{j}" for j in range(JL_DIM))
    nb = " + ".join(f"pb{j} * pb{j}" for j in range(JL_DIM))
    return f"""
    WITH scored AS (
        SELECT q.vec_id AS q_id, c.vec_id AS n_id,
               ROUND(list_dot_product({_EMB.format(t='q')},
                                      {_EMB.format(t='c')}), 4) AS cos64
        FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
        WHERE q.vec_id < {N_QUERIES}),
    pairs AS (
        SELECT q_id, n_id, cos64 FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                        ORDER BY cos64 DESC, n_id) AS rn
            FROM scored) WHERE rn <= {TOP_K}),
    proj AS (
        SELECT p.q_id, p.n_id, p.cos64, {pa_cols}
        FROM pairs p
        JOIN embeddings ea ON ea.vec_id = p.q_id
        JOIN embeddings eb ON eb.vec_id = p.n_id),
    rws AS (
        SELECT q_id, n_id, cos64,
               ROUND(({dot16}) / (sqrt({na}) * sqrt({nb})), 6) AS cos16
        FROM proj),
    err AS (
        SELECT CAST(SUM(CAST(FLOOR(ABS(cos16 - cos64) * 1000000000
                   + 0.5) AS BIGINT)) AS BIGINT) AS err_q,
               CAST(COUNT(*) AS BIGINT) AS n_pairs
        FROM rws)
    SELECT q_id, n_id, cos64, cos16,
           ROUND(err_q / 1000000000 / n_pairs, 6) AS mean_abs_err
    FROM rws CROSS JOIN err
"""


_JL_ORACLE = _jl_oracle()


_ANN_RANK_K = f"""
    bucketed AS (
        SELECT vec_id, embedding,
               {_BUCKET.format(e='CAST(embedding AS DOUBLE[])')} AS bucket
        FROM embeddings),
    ann_s AS (
        SELECT q.vec_id AS q_id, c.vec_id AS n_id,
               ROUND(list_dot_product(CAST(q.embedding AS DOUBLE[]),
                                      CAST(c.embedding AS DOUBLE[])), 4)
                   AS cos_sim
        FROM bucketed q JOIN bucketed c
          ON q.bucket = c.bucket AND q.vec_id != c.vec_id
        WHERE q.vec_id < {N_QUERIES}),
    ann_r AS (
        SELECT q_id, n_id, rn AS rnk FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                        ORDER BY cos_sim DESC, n_id) AS rn
            FROM ann_s) WHERE rn <= {RBO_K})"""

_RBO_ORACLE = f"""
    WITH scored AS (
        SELECT q.vec_id AS q_id, c.vec_id AS n_id,
               ROUND(list_dot_product({_EMB.format(t='q')},
                                      {_EMB.format(t='c')}), 4) AS cos_sim
        FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
        WHERE q.vec_id < {N_QUERIES}),
    exact_r AS (
        SELECT q_id, n_id, rn AS ra FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                        ORDER BY cos_sim DESC, n_id) AS rn
            FROM scored) WHERE rn <= {RBO_K}),
    {_ANN_RANK_K},
    matched AS (
        SELECT e.q_id,
               (CAST({_plane_sql(_RBO_W)} AS DOUBLE[]))
                   [GREATEST(e.ra, a.rnk)] AS w
        FROM exact_r e JOIN ann_r a
          ON a.q_id = e.q_id AND a.n_id = e.n_id),
    per_q AS (
        SELECT q_id, COUNT(*) AS n_overlap,
               CAST(SUM(CAST(FLOOR(w * 1000000000 + 0.5) AS BIGINT))
                    AS BIGINT) AS w_q
        FROM matched GROUP BY q_id)
    SELECT e.vec_id AS q_id,
           CAST(COALESCE(n_overlap, 0) AS BIGINT) AS n_overlap,
           ROUND(CAST({1.0 - RBO_P!r} AS DOUBLE)
                 * COALESCE(w_q, 0) / 1000000000, 6) AS rbo
    FROM embeddings e LEFT JOIN per_q p ON p.q_id = e.vec_id
    WHERE e.vec_id < {N_QUERIES}
"""

_NDCG_ORACLE = f"""
    WITH {_ANN_RANK_K},
    dcg AS (
        SELECT a.q_id, ql.label AS q_label,
               CAST(SUM(CASE WHEN cl.label = ql.label THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_hits,
               CAST(SUM(CASE WHEN cl.label = ql.label
                        THEN CAST(FLOOR((CAST({_plane_sql(_NDCG_DISC)}
                                         AS DOUBLE[]))[a.rnk]
                                        * 1000000000 + 0.5) AS BIGINT)
                        ELSE 0 END) AS BIGINT) AS dcg_q
        FROM ann_r a
        JOIN embeddings cl ON cl.vec_id = a.n_id
        JOIN embeddings ql ON ql.vec_id = a.q_id
        GROUP BY a.q_id, ql.label),
    lc AS (SELECT label, COUNT(*) AS n_label_total
           FROM embeddings GROUP BY label),
    j AS (
        SELECT q_id, n_hits, dcg_q / 1000000000 AS dcg,
               LEAST(n_label_total - 1, {RBO_K}) AS ideal_len
        FROM dcg JOIN lc ON lc.label = dcg.q_label)
    SELECT q_id, n_hits, ROUND(dcg, 6) AS dcg,
           ROUND(CASE WHEN ideal_len <= 0 THEN 0.0
                      ELSE dcg / ((CAST({_plane_sql(_NDCG_CUM)}
                                   AS DOUBLE[]))[CAST(ideal_len AS INT)])
                 END, 6) AS ndcg
    FROM j
"""


# Ranking on the raw sequential-fold dot product (no rounding in the
# rank path); agreement in integer ppm; suspect = integer comparison.
_NOISE_ORACLE = f"""
    WITH q AS (
        SELECT vec_id AS q_id, label AS q_label,
               CAST(embedding AS DOUBLE[]) AS qe
        FROM embeddings WHERE vec_id < {NOISE_SAMPLE}),
    c AS (
        SELECT vec_id AS n_id, label AS n_label,
               CAST(embedding AS DOUBLE[]) AS ne
        FROM embeddings),
    ranked AS (
        SELECT q_id, q_label, n_label,
               ROW_NUMBER() OVER (
                   PARTITION BY q_id
                   ORDER BY list_dot_product(qe, ne) DESC, n_id) AS rnk
        FROM q JOIN c ON q_id <> n_id)
    SELECT q_id, q_label AS label,
           CAST(SUM(CASE WHEN n_label = q_label THEN 1 ELSE 0 END)
                AS BIGINT) AS n_agree,
           CAST(FLOOR(SUM(CASE WHEN n_label = q_label THEN 1 ELSE 0 END)
                      * 1000000 / {NOISE_K}) AS BIGINT) AS agree_ppm,
           CAST(CASE WHEN 2 * SUM(CASE WHEN n_label = q_label
                                       THEN 1 ELSE 0 END) < {NOISE_K}
                     THEN 1 ELSE 0 END AS BIGINT) AS suspect
    FROM ranked WHERE rnk <= {NOISE_K}
    GROUP BY q_id, q_label
"""


# Reciprocal ranks accumulate as exact integers MRR_LCM/rank (see
# mrr_eval); the two final divisions have exact operands in both engines.
_MRR_ORACLE = f"""
    WITH {_ANN_RANK_K},
    q AS (SELECT vec_id AS q_id, label AS q_label
          FROM embeddings WHERE vec_id < {N_QUERIES}),
    fr AS (
        SELECT q.q_id,
               MIN(CASE WHEN cl.label = q.q_label THEN a.rnk END) AS first_rel
        FROM q
        LEFT JOIN ann_r a ON a.q_id = q.q_id
        LEFT JOIN embeddings cl ON cl.vec_id = a.n_id
        GROUP BY q.q_id),
    s AS (
        SELECT q_id,
               CAST(COALESCE(first_rel, 0) AS BIGINT) AS first_rel_rank,
               CAST(COALESCE({MRR_LCM} // first_rel, 0) AS BIGINT) AS rr_scaled
        FROM fr)
    SELECT q_id, first_rel_rank,
           CAST(rr_scaled AS DOUBLE) / {MRR_LCM} AS rr,
           (SELECT CAST(SUM(rr_scaled) AS DOUBLE) FROM s)
           / ({MRR_LCM} * {float(N_QUERIES)}) AS mrr
    FROM s
"""


QUERIES: dict[str, Callable] = {
    "ext_sim_bruteforce_topk": brute_force_topk,
    "ext_sim_ann_lsh_topk": ann_lsh_topk,
    "ext_sim_ivf_topk": ivf_topk,
    "ext_sim_recall_eval": ann_recall_eval,
    "ext_sim_label_pairs": label_centroid_similarity,
    "ext_sim_hard_negatives": hard_negative_mining,
    "ext_mmr_rerank": mmr_rerank,
    "ext_rank_biased_overlap": rank_biased_overlap,
    "ext_ndcg_eval": ndcg_eval,
    "ext_mrr_eval": mrr_eval,
    "ext_label_noise_knn": label_noise_knn,
    "ext_knn_shapley": knn_shapley,
    "ext_facility_location": facility_location_coreset,
    "ext_coreset_kcenter": kcenter_coreset,
    "ext_jl_projection_audit": jl_projection_audit,
    "ext_array_funcs": embedding_array_stats,
}

ORACLES: dict[str, str] = {
    "ext_sim_bruteforce_topk": _BRUTE_ORACLE,
    "ext_sim_hard_negatives": _HARD_NEG_ORACLE,
    "ext_mmr_rerank": _MMR_ORACLE,
    "ext_rank_biased_overlap": _RBO_ORACLE,
    "ext_ndcg_eval": _NDCG_ORACLE,
    "ext_mrr_eval": _MRR_ORACLE,
    "ext_label_noise_knn": _NOISE_ORACLE,
    "ext_knn_shapley": _KSH_ORACLE,
    "ext_facility_location": _fl_oracle(),
    "ext_coreset_kcenter": _kc_oracle(),
    "ext_jl_projection_audit": _JL_ORACLE,
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
