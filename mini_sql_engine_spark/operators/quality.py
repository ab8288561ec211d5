"""Corpus-quality gates: Gopher-style rule filtering, per-domain
quotas, Zipf-fit sanity checks, and SemDeDup-style semantic dedup.

The reference engine has none of these (SURVEY.md §2.1 is
scan/filter/join/agg only); they extend the training-data-pipeline
surface (SURVEY.md §2.2 X rows) with the published curation recipes a
100 TB text pipeline actually runs: the Gopher/MassiveText rule gate,
C4-style per-domain balancing, corpus-statistics QA, and SemDeDup
(cluster-then-dedup over embeddings). Everything except the documented
within-cell pair scoring is expression-only Catalyst code.

Scale notes (100 TB):
- gopher gate: pure per-row projection + one thin grouped agg on
  `source` — embarrassingly parallel, one partial-agg shuffle of a
  few counters per source;
- domain quota: one shuffle on `source` for the per-domain
  row_number; priority is a hash, so the kept set is a uniform
  deterministic sample (no full sort — the window sorts within each
  domain partition only). Skewed domains are the known hazard: a
  domain with 10⁹ docs makes one window partition a straggler; the
  production fix is a two-phase top-K (per-split partial top-K, then
  merge), same shape as text.heavy_hitters_bounded;
- zipf fit: token-count shuffle (map-side partial agg), then the
  regression runs over the VOCABULARY (≪ corpus) — a single-reducer
  window over ~10⁵–10⁶ types, with regr_slope/regr_r2 composing into
  one scalar agg pass;
- semdedup: centroid table is a constant (broadcast); assignment is
  per-row codegen (argmax over K dot products, no shuffle). The
  quadratic verify is confined WITHIN each cell — that containment is
  the published SemDeDup design — and ships through one shuffle keyed
  on (cell, id-block). K at 100 TB is 10⁴–10⁵ cells (k-means
  pretrained), so cells stay ~10⁴ vectors and the per-cell pair work
  is bounded; a degenerate hot cell falls back to the blocked-matmul
  kernel (functions.vector.allpairs_cosine) exactly like the LSH
  bucket path in dedup.embedding_near_dup.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from mini_sql_engine_spark.functions.frames import jvm_rows
from mini_sql_engine_spark.catalog import ensure_min_partitions, load_table
from mini_sql_engine_spark.functions.ranking import range_prefix
from mini_sql_engine_spark.functions import hashing, textfns, vector
from mini_sql_engine_spark.operators.dedup import (
    EMB_DIM,
    _BASE,
    _JACCARD_PAIRS,
    JACCARD_T,
    _shingled,
)
from mini_sql_engine_spark.operators.similarity import CENTROIDS

# The centroid-assignment argmax shared by SemDeDup, cluster_sample and
# knn_graph_ann, built ONCE as SQL text (SCALE.md round-10 rule 1: above
# ~100 nodes, generate SQL). The Column-comprehension form cost ~1.2 s
# of py4j PER CALL at any data scale (8 centroids × 64 F.lit doubles +
# 16 lambda closures); one F.expr parse is a single round trip. The
# `D`-suffixed literals parse to the same IEEE doubles F.lit produced
# (repr round-trip), and the lambda bodies mirror functions.vector.dot
# exactly — left-to-right aggregate over zip_with products — so the
# scored structs are bit-identical (oracles re-verified at 3 SFs).
_CENTROID_SCORED_SQL = (
    "array("
    + ", ".join(
        "struct(-aggregate(zip_with(embedding, array("
        + ", ".join(f"{v!r}D" for v in c)
        + "), (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0.0D, "
        f"(acc, v) -> acc + v) AS neg_score, {i} AS cidx)"
        for i, c in enumerate(CENTROIDS)
    )
    + ")"
)


def _centroid_scored() -> F.Column:
    """Parsed (neg_score, cidx) struct array over the `embedding` col."""
    return F.expr(_CENTROID_SCORED_SQL)

# Gopher-style rule thresholds, tuned so each rule discriminates on the
# synthetic fixture (words/doc spans 10–99, mean word length 3.69–5.08,
# stopword ratio 0–0.33, distinct-token ratio 0.28–1.0).
GOPHER_MIN_WORDS = 20
GOPHER_MAX_WORDS = 90
GOPHER_MIN_WLEN = 3.8
GOPHER_MAX_WLEN = 5.0
GOPHER_MIN_STOP = 0.02
GOPHER_MIN_UNIQ = 0.5

DOMAIN_QUOTA = 15  # kept docs per source domain

SEM_THRESH = 0.40  # within-cell cosine above which the later vec drops


def _gopher_flags(docs: DataFrame) -> DataFrame:
    """Per-document rule flags (all original columns + f_* booleans) —
    the per-row core shared by the gate reports and the composed
    pipeline."""
    toks = textfns.tokens("text")
    n_words = F.size(toks)
    # mean word length = non-whitespace chars / words (exact division)
    mean_wlen = F.length(F.regexp_replace("text", r"\s", "")) / n_words
    stop = textfns.stopword_ratio("text")
    uniq = F.size(F.array_distinct(toks)) / n_words
    return docs.select(
        "*",
        (~n_words.between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)).alias("f_len"),
        (~mean_wlen.between(GOPHER_MIN_WLEN, GOPHER_MAX_WLEN)).alias("f_wlen"),
        (stop < GOPHER_MIN_STOP).alias("f_stop"),
        (uniq < GOPHER_MIN_UNIQ).alias("f_uniq"),
    )


def _gopher_keep() -> F.Column:
    """Keep = every rule passes. (A function, not a module constant:
    Column expressions need a live session/JVM gateway to build.)"""
    return ~(
        F.col("f_len") | F.col("f_wlen") | F.col("f_stop") | F.col("f_uniq")
    )


def _gopher_report(docs: DataFrame) -> DataFrame:
    """Rule flags + per-domain rollup shared by the batch and streaming
    forms (stream-batch unification: the SAME plan runs per-microbatch
    as a streaming aggregation)."""
    flags = _gopher_flags(docs)
    keep = _gopher_keep()
    return flags.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("f_len").cast("long")).alias("n_fail_len"),
        F.sum(F.col("f_wlen").cast("long")).alias("n_fail_wlen"),
        F.sum(F.col("f_stop").cast("long")).alias("n_fail_stop"),
        F.sum(F.col("f_uniq").cast("long")).alias("n_fail_uniq"),
        F.sum(keep.cast("long")).alias("n_keep"),
        F.round(F.sum(keep.cast("long")) / F.count(F.lit(1)), 4).alias(
            "keep_rate"
        ),
    )


def gopher_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/MassiveText-style rule gate, reported per source domain.

    Four published rule families — word-count bounds, mean-word-length
    bounds, minimum stopword fraction, minimum distinct-token ratio —
    evaluated per document in one codegen projection; a doc is kept
    only if every rule passes. Output is the per-domain audit a
    curation run reviews before committing the filter: (source,
    n_docs, n_fail_len, n_fail_wlen, n_fail_stop, n_fail_uniq,
    n_keep, keep_rate).

    All ratios are exact int/int double divisions compared against
    decimal literals, so the pass/fail booleans are engine-exact.
    """
    return _gopher_report(load_table(spark, sf_dir, "documents"))


def stream_gopher_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME gate as a streaming aggregation over a document stream
    (the ingest-time quality monitor): per-row flags are stateless, so
    streaming state is exactly the per-domain counter row — O(domains),
    independent of stream length — and the result must equal the batch
    report on the same data (stream-batch parity; the oracle IS
    `ext_gopher_gate`'s)."""
    from mini_sql_engine_spark.streaming.windows import (
        stream_to_df,
        table_stream,
    )

    docs = table_stream(spark, sf_dir, "documents")
    return stream_to_df(spark, _gopher_report(docs), "complete")


def domain_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style per-domain balancing: keep at most DOMAIN_QUOTA docs
    per source, chosen by a deterministic hash priority — a uniform
    random-without-replacement sample per domain that every rerun (and
    the oracle) reproduces exactly.

    Output: (source, doc_id, rk) for the kept docs. The window sorts
    within each domain only (no global sort); see module scale notes
    for the skewed-domain variant.
    """
    pr = hashing.md5_long(F.col("doc_id").cast("string"), "quota")
    w = Window.partitionBy("source").orderBy("pr", "doc_id")
    return (
        load_table(spark, sf_dir, "documents")
        .select("source", "doc_id", pr.alias("pr"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= DOMAIN_QUOTA)
        .select("source", "doc_id", "rk")
    )


def zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-statistics QA: least-squares fit of log(freq) vs
    log(rank) over the token frequency table — natural text tracks
    Zipf (slope ≈ −1); a synthetic or degenerate corpus shows up as a
    flat slope or poor r². One scalar row: (n_types, zipf_slope,
    zipf_r2).

    The regression runs over the VOCABULARY, not the corpus: the
    token-count agg is the only wide shuffle; the unpartitioned
    ranking window then sees only distinct types (tiny by
    construction — document the 10⁶-type bound, not the corpus size).
    """
    freq = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(textfns.tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # vocab-scaled frequency rank via range_prefix (desc rides as a
    # negated key) — no single-partition window over the type table
    ranked = range_prefix(
        freq.withColumn("_negc", -F.col("cnt")), ["_negc", "token"],
        rank_col="rk",
    )
    # exact-moment regression: quantize ln(rk)/ln(cnt) to integer
    # micros per TYPE, accumulate Σx Σy Σxy Σx² Σy² as DECIMAL (order-
    # independent exact integer sums — regr_slope's internal float
    # reduction is partial-agg-order dependent), then slope/r² are a
    # handful of IEEE ops on identical exact operands in both engines.
    moments = ranked.select(
        F.floor(F.log("rk") * 1_000_000 + F.lit(0.5))
        .cast("decimal(19,0)")
        .alias("x"),
        F.floor(F.log("cnt") * 1_000_000 + F.lit(0.5))
        .cast("decimal(19,0)")
        .alias("y"),
    ).agg(
        F.count(F.lit(1)).cast("decimal(19,0)").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    den_x = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    den_y = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
        "double"
    )
    return moments.select(
        F.col("n").cast("long").alias("n_types"),
        F.round(num / den_x, 4).alias("zipf_slope"),
        F.round(num * num / (den_x * den_y), 4).alias("zipf_r2"),
    )


def _cell_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
    """applyInPandas kernel: one centroid cell's above-threshold pairs.

    float64 matmul prunes with a 1e-9 margin (≫ any accumulation
    reorder drift at dim 64), then survivors are re-accumulated
    sequentially (vector._seq_dot) so the ≥ SEM_THRESH decision is
    bit-identical to the expression tier and DuckDB's
    list_dot_product — the same two-step exactness contract as
    dedup._bucket_score.
    """
    empty = pd.DataFrame({"cidx": [], "dropped": []}).astype(
        {"cidx": "int32", "dropped": "int64"}
    )
    if len(pdf) < 2:
        return empty
    M = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    ids = pdf["vec_id"].to_numpy()
    scores = M @ M.T
    mask = (scores >= SEM_THRESH - 1e-9) & (ids[:, None] < ids[None, :])
    ia, ib = np.nonzero(mask)
    if ia.size == 0:
        return empty
    keep = vector._seq_dot(M[ia], M[ib]) >= SEM_THRESH
    if not keep.any():
        return empty
    return pd.DataFrame(
        {"cidx": pdf["cidx"].iloc[0], "dropped": ids[ib][keep]}
    )


def semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): assign every embedding to its
    nearest centroid cell, then drop, within each cell, any vector
    whose cosine to an earlier (lower-id) cell-mate exceeds
    SEM_THRESH. Per-cell audit: (cidx, n_vecs, n_dup_pairs,
    n_dropped, n_kept).

    Assignment is a codegen argmax over the K broadcast-constant
    centroid dots (sort_array over (neg_score, cidx) structs — the
    same shuffle-free pattern as textfns.language_id); the cell key
    then confines the quadratic verify, which is the whole point of
    the algorithm, and each cell is scored by one Arrow-batched numpy
    matmul task (`_cell_pairs`) instead of an interpreted
    expression-tier self-join — ~3× faster at sf0.1 and the gap grows
    with cell size. Embeddings are unit-norm (FIXTURES.md §1.2) so
    cosine = dot; see `_cell_pairs` for the oracle-exactness contract.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    scored = _centroid_scored()  # one parsed expr, not 8x64 F.lit
    assigned = emb.select(
        "vec_id",
        "embedding",
        F.sort_array(scored).getItem(0).getField("cidx").alias("cidx"),
    )
    pairs = assigned.groupBy("cidx").applyInPandas(
        _cell_pairs, "cidx int, dropped long"
    )
    per_cell_pairs = pairs.groupBy("cidx").agg(
        F.count(F.lit(1)).alias("n_dup_pairs"),
        F.countDistinct("dropped").alias("n_dropped"),
    )
    return (
        assigned.groupBy("cidx")
        .agg(F.count(F.lit(1)).alias("n_vecs"))
        .join(per_cell_pairs, "cidx", "left")
        .select(
            "cidx",
            "n_vecs",
            F.coalesce("n_dup_pairs", F.lit(0)).alias("n_dup_pairs"),
            F.coalesce("n_dropped", F.lit(0)).alias("n_dropped"),
            (F.col("n_vecs") - F.coalesce("n_dropped", F.lit(0))).alias(
                "n_kept"
            ),
        )
    )


NOVELTY_N = 3  # gram width, matches curation.BOILER_N / text NGRAM_N


def ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty curve: the fraction of a doc's distinct
    3-grams whose FIRST corpus occurrence (by doc_id ingestion order)
    is this document — the dataset-growth diagnostic that shows when a
    crawl stops contributing new content (novelty → 0 means the
    marginal doc is recombination, time to stop ingesting the source).

    Plan: distinct (doc_id, gram) pairs explode once; a gram-keyed agg
    computes each gram's first doc; one gram-keyed join back marks
    novel pairs; a doc-keyed agg rolls up. Both shuffles ship thin
    (gram, doc_id) / (doc_id, counters) rows — text arrays never move
    twice, the same shape as the inverted index. Output: (doc_id,
    n_grams, n_novel, novelty).
    """
    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    pairs = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(textfns.shingles("text", NOVELTY_N))
        ).alias("gram"),
    )
    # windowed min over the gram partition: ONE shuffle of the pair
    # list (vs groupBy-then-join's two), no second pass over the grams
    first = F.min("doc_id").over(Window.partitionBy("gram"))
    return (
        pairs.withColumn("first_doc", first)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(
                (F.col("doc_id") == F.col("first_doc")).cast("long")
            ).alias("n_novel"),
        )
        .withColumn(
            "novelty", F.round(F.col("n_novel") / F.col("n_grams"), 4)
        )
    )


KNN_K = 5  # neighbors per node in the exact graph


def knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual k-NN graph audit over the embedding table: each vector's
    top-KNN_K cosine neighbors, intersected with the reverse direction
    — mutual degree is the standard density/diversity signal (isolated
    points = outliers; high mutual degree = redundant modes) and the
    input graph for graph-based dedup and diversity sampling.

    This is the EXACT graph (like sim.brute_force_topk): the compute
    is the blocked matmul, but each block task pre-ranks and emits at
    most KNN_K candidates per node per direction
    (`vector.blocked_topk`), so the shuffle after the matmul carries
    O(n·B·k) rows, never the O(n²) pair list; one global window then
    merges the partials. Scores are rounded to 4 digits BEFORE
    ranking with a (score desc, neighbor asc) tie-break, so ranking
    is engine-deterministic even at rounded-score ties. Output:
    (vec_id, label, mean_top_sim, n_mutual).

    100 TB: the matmul front end still touches all block pairs — the
    documented O(n²) compute knob; swap it for ANN candidates (IVF
    cells / LSH buckets, both in operators.similarity) and keep the
    identical merge + mutual-join tail. Per-node window state is the
    B·k candidate list, never the corpus.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    cand = vector.blocked_topk(emb, "vec_id", "embedding", k=KNN_K)
    w = Window.partitionBy("src").orderBy(F.col("cos_sim").desc(), "dst")
    topk = (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= KNN_K)
        .select("src", "dst", "cos_sim")
        # thin n*k rows, consumed by THREE branches (rev, per-node agg,
        # mutual semi-join) - checkpoint or the kernel subtree re-runs
        # once per branch
        .localCheckpoint(eager=False)
    )
    rev = topk.select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    mutual = topk.join(rev, ["src", "dst"], "left_semi")
    per_node = topk.groupBy("src").agg(
        # exact-integer numerator (scores are 4-dec fixed point, so
        # x10000 is integral), then ONE IEEE division — identical
        # doubles in both engines with no float-sum order dependence
        # and no round-at-a-tie (avg of an even neighbor count can
        # land exactly on a .00005 boundary)
        (
            F.sum(F.round(F.col("cos_sim") * 10000).cast("long")).cast(
                "double"
            )
            / (F.count(F.lit(1)) * 10000)
        ).alias("mean_top_sim")
    )
    mdeg = mutual.groupBy("src").agg(F.count(F.lit(1)).alias("n_mutual"))
    return (
        emb.select(F.col("vec_id"), "label")
        .join(per_node, F.col("vec_id") == F.col("src"), "left")
        .drop("src")
        .join(mdeg, F.col("vec_id") == F.col("src"), "left")
        .drop("src")
        .select(
            "vec_id",
            "label",
            "mean_top_sim",
            F.coalesce("n_mutual", F.lit(0)).alias("n_mutual"),
        )
    )


SPAN_GRAM = 5  # positional gram width (tokens)
SPAN_MIN = 8  # minimum reported duplicate span length (tokens)
SPAN_DF_CAP = 100  # drop grams hotter than this before the pair join


def dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate-SPAN detection (the substring-dedup signal of
    Lee et al. 2022): for every document pair, maximal runs of
    consecutive shared SPAN_GRAM-token grams — i.e. verbatim shared
    substrings of ≥ SPAN_MIN tokens, the thing n-gram-set Jaccard
    blurs away. Output: (doc_a, doc_b, n_spans, max_span_len).

    Plan: positional grams explode once; a gram-keyed self-join emits
    only co-occurring positions (thin (doc, pos) rows — text never
    joins); runs are recovered with the gaps-and-islands trick (pos −
    row_number per (pair, diagonal) is constant within a consecutive
    run). Grams hotter than SPAN_DF_CAP are excluded BEFORE the join
    — the df-cap that keeps a boilerplate gram from exploding the
    self-join into its df² pairs; the cap is part of the operator
    definition (the oracle applies it identically), the standard
    trade in production substring-dedup pipelines where a true suffix
    array is the exact alternative.
    """
    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    grams = docs.select(
        "doc_id",
        F.posexplode(textfns.shingles("text", SPAN_GRAM)).alias("pos", "gram"),
    ).localCheckpoint(eager=False)  # feeds df-count, then both join sides
    hot = (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > SPAN_DF_CAP)
        .select("gram")
    )
    cold = grams.join(F.broadcast(hot), "gram", "left_anti")
    a, b = cold.alias("a"), cold.alias("b")
    matches = (
        a.join(b, "gram")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.pos").alias("pa"),
            (F.col("a.pos") - F.col("b.pos")).alias("diag"),
        )
    )
    w = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pa")
    runs = matches.withColumn(
        "grp", F.col("pa") - F.row_number().over(w)
    )
    spans = (
        runs.groupBy("doc_a", "doc_b", "diag", "grp")
        .agg((F.count(F.lit(1)) + (SPAN_GRAM - 1)).alias("span_len"))
        .filter(F.col("span_len") >= SPAN_MIN)
    )
    return spans.groupBy("doc_a", "doc_b").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.max("span_len").alias("max_span_len"),
    )


BI_LAMBDA = 0.7  # interpolation weight on the bigram term


def bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc mean negative log-likelihood under an interpolated
    bigram LM trained on the corpus — the next model up from
    `ext_lm_perplexity`'s unigram: p(w2|w1) = λ·c(w1,w2)/c(w1) +
    (1−λ)·(c(w2)+1)/(N+V). Bigram context catches word-salad text a
    unigram scorer rates as fluent (every token common, no common
    transitions). Output: (doc_id, n_bigrams, nll_micro) — the doc
    score is an integer micro-nat: each bigram TYPE's -ln p is rounded
    to integer micros once on the type table, so the per-doc mean is
    exact integer arithmetic, independent of float accumulation order
    in either engine (the rounded-avg-of-logs it replaces was the
    canonical unstable-double hazard).

    Plan: unigram and bigram TYPE tables aggregate with map-side
    combine (shuffle bounded by vocabulary, not corpus); the
    per-type probability composes on the tiny type table, which then
    broadcasts back onto the corpus bigram stream; one doc-keyed agg
    finishes. At web scale the bigram-type table outgrows a broadcast
    — the join flips to its natural (w1, w2) key, exactly like the
    unigram scorer's token join; the formula and dataflow hold.
    """
    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    bi = docs.select(
        "doc_id", F.explode(textfns.shingles("text", 2)).alias("bg")
    ).select(
        "doc_id",
        F.split("bg", " ").getItem(0).alias("w1"),
        F.split("bg", " ").getItem(1).alias("w2"),
    )
    uni = (
        docs.select(F.explode(textfns.tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cu"))
    )
    tot = uni.agg(F.sum("cu").alias("n"), F.count(F.lit(1)).alias("v"))
    bic = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb"))
    types = (
        bic.join(
            uni.select(F.col("tok").alias("w1"), F.col("cu").alias("c1")),
            "w1",
        )
        .join(
            uni.select(F.col("tok").alias("w2"), F.col("cu").alias("c2")),
            "w2",
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            F.floor(
                -F.log(
                    F.lit(BI_LAMBDA) * (F.col("cb") / F.col("c1"))
                    + F.lit(1.0 - BI_LAMBDA)
                    * ((F.col("c2") + F.lit(1.0)) / (F.col("n") + F.col("v")))
                )
                * 1_000_000
                + F.lit(0.5)
            )
            .cast("long")
            .alias("nll_micro"),
        )
    )
    return (
        bi.join(F.broadcast(types), ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.expr(
                "(sum(nll_micro) + count(1) div 2) div count(1)"
            ).alias("nll_micro"),
        )
    )


KN_D = 0.75  # absolute-discount mass (the standard Kneser–Ney value)
KN_CONTEXTS = 10  # most-frequent left-contexts reported
KN_TOPK = 3  # next-word predictions per context


def kneser_ney_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kneser–Ney smoothed bigram next-word table: for the KN_CONTEXTS
    most frequent left-words, the top next-word probabilities under
    P_KN(w2|w1) = max(c(w1w2)−D, 0)/c(w1·) +
    D·N1+(w1·)/c(w1·) · N1+(·w2)/N1+(··) — the smoothing that backs
    off to CONTINUATION counts ("in how many contexts does w2 start?")
    rather than raw frequency, which is why KN remains the reference
    n-gram LM (`ext_bigram_perplexity`'s interpolated model is the
    cheap cousin; this is the published estimator). All inputs are
    exact type/token counts; D is the exactly-representable 0.75, so
    probabilities are bit-identical across engines.

    Scale notes (100 TB): every aggregate is bounded by VOCABULARY or
    bigram-type counts, not corpus size (map-side combine on the
    explode); the continuation and context tables join on their
    natural keys and the totals broadcast. Same dataflow as the
    perplexity scorer with two extra type-count rollups.
    """
    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    bi = docs.select(
        F.explode(textfns.shingles("text", 2)).alias("bg")
    ).select(
        F.split("bg", " ").getItem(0).alias("w1"),
        F.split("bg", " ").getItem(1).alias("w2"),
    )
    # the bigram-type table feeds four consumers (context counts,
    # continuation counts, the type total, the scored join) —
    # checkpoint so the corpus explode runs once
    bic = bi.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("cb")
    ).localCheckpoint(eager=False)
    ctx = bic.groupBy("w1").agg(
        F.sum("cb").alias("c1"), F.count(F.lit(1)).alias("n1p_fwd")
    )
    cont = bic.groupBy("w2").agg(F.count(F.lit(1)).alias("n1p_bwd"))
    tt = bic.agg(F.count(F.lit(1)).alias("n_types"))
    # global top-K via sort-limit: Spark plans TakeOrderedAndProject
    # (per-partition heaps + K-row merge), never a full global sort
    top_ctx = ctx.orderBy(F.col("c1").desc(), F.col("w1")).limit(
        KN_CONTEXTS
    )
    scored = (
        bic.join(F.broadcast(top_ctx), "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(tt))
        .select(
            "w1",
            "w2",
            "cb",
            (
                F.greatest(F.col("cb") - KN_D, F.lit(0.0)) / F.col("c1")
                + F.lit(KN_D)
                * F.col("n1p_fwd")
                / F.col("c1")
                * (F.col("n1p_bwd") / F.col("n_types"))
            ).alias("p"),
        )
    )
    wr = Window.partitionBy("w1").orderBy(F.col("p").desc(), F.col("w2"))
    return (
        scored.withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") <= KN_TOPK)
        .select(
            "w1",
            "w2",
            "cb",
            F.round("p", 6).alias("p_kn"),
            F.col("rnk").cast("long").alias("rnk"),
        )
    )


KM_SCALE = 1_000_000  # embedding quantization: micro-units


def _int_centroids(spark: SparkSession) -> DataFrame:
    """Seed centroids (similarity.CENTROIDS) quantized to micro-unit
    longs, in (cidx, dim, cval) long form."""
    rows = [
        (c, d, int(np.floor(v * KM_SCALE + 0.5)))
        for c, vec in enumerate(CENTROIDS)
        for d, v in enumerate(vec)
    ]
    return jvm_rows(spark, rows, "cidx int, dim int, cval long")


def _km_assign(q: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest-centroid assignment over quantized vectors: integer
    squared distance per (vec, cell), then the (dist, cidx)-min row.
    Integer sums are exactly associative — no accumulation-order
    nondeterminism anywhere."""
    dist = (
        q.join(F.broadcast(cents), "dim")
        .groupBy("vec_id", "cidx")
        .agg(
            F.sum(
                (F.col("qval") - F.col("cval"))
                * (F.col("qval") - F.col("cval"))
            ).alias("dist")
        )
    )
    w = Window.partitionBy("vec_id").orderBy("dist", "cidx")
    return (
        dist.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cidx")
    )


def kmeans_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two Lloyd iterations refining the IVF seed centroids,
    ENGINE-EXACT: embeddings quantize to micro-unit longs
    (floor(v·1e6 + 0.5) — identical IEEE ops in both engines), so
    every distance is an exactly-associative integer sum and the
    argmin is deterministic; centroid means floor back to longs (sums
    stay < 2^53, so the one double division is exact too). This is
    the determinism pattern for distributed iterative numerics —
    floats drift with partitioning, integers never. Output per final
    cell: (cidx, n_vecs, shift_l1, n_moved) — shift_l1 = L1 centroid
    movement in micro-units, n_moved = members that switched cells
    between the iterations (both ~0 ⇒ converged).

    Scale: the corpus-side table is thin (vec, dim, qval) rows; each
    iteration is one broadcast join + two keyed aggs (K·D centroid
    table broadcasts at any realistic K); the argmin window partitions
    by vector with K-row state. The relational dot/distance form
    trades 1 row per (vec, dim) for exactness — the float expression
    tier (semdedup's argmax) is the fast path when bit-determinism
    across engines is not required.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select(
        "vec_id", F.posexplode("embedding").alias("dim", "v")
    ).select(
        "vec_id",
        "dim",
        # explicit double: float32 × int would stay float32 in Spark
        # (precision loss ≫ 1 at the 1e6 scale) while DuckDB widens
        F.floor(F.col("v").cast("double") * KM_SCALE + F.lit(0.5))
        .cast("long")
        .alias("qval"),
    ).localCheckpoint(eager=False)  # reused by both assignment rounds
    c0 = _int_centroids(spark)
    # each assignment feeds two consumers (next centroids + the moved
    # count / final rollup) — checkpoint so the join+agg+window subtree
    # runs once per iteration
    a1 = _km_assign(q, c0).localCheckpoint(eager=False)
    c1 = (
        q.join(a1, "vec_id")
        .groupBy("cidx", "dim")
        .agg(
            F.floor(F.sum("qval") / F.count(F.lit(1)))
            .cast("long")
            .alias("cval")
        )
    )
    a2 = _km_assign(q, c1).localCheckpoint(eager=False)
    shift = (
        c1.join(
            c0.select("cidx", "dim", F.col("cval").alias("cval0")),
            ["cidx", "dim"],
        )
        .groupBy("cidx")
        .agg(F.sum(F.abs(F.col("cval") - F.col("cval0"))).alias("shift_l1"))
    )
    moved = (
        a2.join(a1.select("vec_id", F.col("cidx").alias("cidx1")), "vec_id")
        .groupBy("cidx")
        .agg(
            F.sum((F.col("cidx") != F.col("cidx1")).cast("long")).alias(
                "n_moved"
            )
        )
    )
    return (
        a2.groupBy("cidx")
        .agg(F.count(F.lit(1)).alias("n_vecs"))
        .join(shift, "cidx")
        .join(moved, "cidx")
        .select("cidx", "n_vecs", "shift_l1", "n_moved")
    )


SWEEP_THRESHOLDS = (0.2, 0.4, 0.6, 0.8)

CELL_SAMPLE_M = 10  # kept vectors per centroid cell


def dedup_rate_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup policy-tuning sweep: pair counts, docs dropped, and drop
    rate at several Jaccard thresholds from ONE pass over the verified
    candidate pairs — the report that picks the production threshold
    without re-running the dedup join per candidate value. Output:
    (threshold, n_pairs, n_dropped, drop_rate), every threshold
    present even when empty.

    The pair list (dedup._jaccard_pairs' inverted-index join) is
    computed once and checkpointed; the sweep is a |thresholds|-way
    conditional aggregate over it — cost is the candidate join, the
    sweep itself is free.
    """
    from mini_sql_engine_spark.operators.dedup import _jaccard_pairs

    pairs = _jaccard_pairs(spark, sf_dir).localCheckpoint(eager=False)
    # corpus size as a broadcast 1-row scalar, not an eager driver count
    n_docs = load_table(spark, sf_dir, "documents").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    ts = jvm_rows(
        spark, [(t,) for t in SWEEP_THRESHOLDS], "threshold double"
    )
    hit = F.col("jacc") >= F.col("threshold")
    return (
        pairs.crossJoin(F.broadcast(ts))
        .groupBy("threshold")
        .agg(
            F.sum(hit.cast("long")).alias("n_pairs"),
            F.countDistinct(F.when(hit, F.col("doc_b"))).alias("n_dropped"),
        )
        .crossJoin(F.broadcast(n_docs))
        .select(
            "threshold",
            "n_pairs",
            "n_dropped",
            F.round(F.col("n_dropped") / F.col("n_docs"), 4).alias(
                "drop_rate"
            ),
        )
    )


def cluster_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity-stratified sampling: at most CELL_SAMPLE_M vectors per
    centroid cell, chosen by deterministic md5 priority — the eval-set
    construction that guarantees every region of embedding space is
    represented instead of letting the head cluster dominate a uniform
    sample. Output: (cidx, vec_id, rk).

    Assignment is the same shuffle-free struct argmax as SemDeDup; the
    per-cell window sorts within cells only. The mega-cell hazard and
    its two-phase partial-top-K fix are the same as `ext_domain_quota`
    (documents → domains, vectors → cells).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    scored = _centroid_scored()  # one parsed expr, not 8x64 F.lit
    pr = hashing.md5_long(F.col("vec_id").cast("string"), "cell")
    w = Window.partitionBy("cidx").orderBy("pr", "vec_id")
    return (
        emb.select(
            "vec_id",
            F.sort_array(scored).getItem(0).getField("cidx").alias("cidx"),
            pr.alias("pr"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= CELL_SAMPLE_M)
        .select("cidx", "vec_id", "rk")
    )


LANGID_TOP_G = 40  # profile grams kept per language


def char_ngram_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained character-trigram language ID (the fastText/
    langid.py shape, relationally): train per-language trigram
    profiles from the labeled corpus, score every document by summed
    profile-gram counts, report the confusion matrix (lang,
    pred_lang, n_docs). Unlike `textfns.language_id`'s fixed marker
    words, the profile here is LEARNED from the data — the operator a
    pipeline runs to audit its language labels before mixture
    balancing.

    Determinism: scores are INTEGER sums of corpus gram counts
    (doubles would make the argmax order-sensitive); profile
    selection and the argmax both break ties lexicographically.
    Plan: gram counts aggregate map-side (shuffle bounded by the gram
    vocabulary); the ≤ |langs|·TOP_G profile broadcasts back onto the
    exploded doc grams; docs with zero profile hits classify as
    'und' via a left join.
    """
    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    grams = docs.filter(F.length("text") >= 3).select(
        "doc_id",
        "lang",
        F.explode(
            F.expr(
                "transform(sequence(1, length(text) - 2),"
                " i -> substring(text, i, 3))"
            )
        ).alias("gram"),
    ).localCheckpoint(eager=False)  # feeds training and scoring once
    counts = grams.groupBy("lang", "gram").agg(
        F.count(F.lit(1)).alias("c")
    )
    wg = Window.partitionBy("lang").orderBy(F.col("c").desc(), "gram")
    profile = (
        counts.withColumn("rg", F.row_number().over(wg))
        .filter(F.col("rg") <= LANGID_TOP_G)
        .select(F.col("lang").alias("lang_p"), "gram", "c")
    )
    scored = (
        grams.join(F.broadcast(profile), "gram")
        .groupBy("doc_id", "lang_p")
        .agg(F.sum("c").alias("score"))
    )
    wd = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "lang_p")
    best = (
        scored.withColumn("rn", F.row_number().over(wd))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("lang_p").alias("pred"))
    )
    return (
        docs.select("doc_id", "lang")
        .join(best, "doc_id", "left")
        .groupBy("lang", F.coalesce("pred", F.lit("und")).alias("pred_lang"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def pipeline_quality_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-4 pack composed END-TO-END in one Catalyst plan — the
    pretraining-mix construction a curation run actually executes:

      1. Gopher rule gate (per-row flags, stateless)
      2. drop verbatim duplicates (docs appearing as the LATER side of
         any `ext_dup_spans` duplicate span)
      3. bigram-LM perplexity screen (keep docs at or below the
         surviving set's median NLL — the fluent half)
      4. C4-style per-domain quota (deterministic hash priority)

    Output per source: (source, n_gate_dedup, n_after_ppl, n_kept,
    kept_chars) — the funnel report plus the final mix's character
    mass. Every stage's filter shrinks the next stage's input; the
    only driver-side value is the scalar median (broadcast back, the
    same shape as the outlier screen's med/MAD).
    """
    docs = load_table(spark, sf_dir, "documents")
    gated = _gopher_flags(docs).filter(_gopher_keep())
    dups = dup_spans(spark, sf_dir).select(
        F.col("doc_b").alias("doc_id")
    ).distinct()
    nll = bigram_perplexity(spark, sf_dir).select(
        "doc_id", "nll_micro", F.lit(1).alias("_ppl")
    )
    # ONE shared checkpoint for every downstream branch (funnel counts,
    # median, quota). Round 10: this was TWO chained lazy checkpoints
    # (s1, then s1 ⋈ nll) — but a lazy localCheckpoint's toRdd still
    # executes all upstream stages under AQE, so the chain SERIALIZED
    # the two independent heavy subtrees (dup-span mining, bigram LM).
    # The nll join is LEFT + inner-marker filter so the single
    # checkpoint carries both s1 (all rows) and s1⋈nll (rows with
    # _ppl) — identical row sets, and Spark now schedules the dup-span
    # and LM stages concurrently inside one job (guide §2: fewer,
    # wider jobs).
    s1all = (
        gated.join(dups, "doc_id", "left_anti")
        .join(nll, "doc_id", "left")
        .localCheckpoint(eager=False)
    )
    s1 = s1all.drop("nll_micro", "_ppl")
    s1n = s1all.filter(F.col("_ppl").isNotNull()).drop("_ppl")
    med = s1n.agg(F.expr("percentile(nll_micro, 0.5)").alias("m"))
    s2 = s1n.crossJoin(F.broadcast(med)).filter(
        F.col("nll_micro") <= F.col("m")
    )
    pr = hashing.md5_long(F.col("doc_id").cast("string"), "quota")
    wq = Window.partitionBy("source").orderBy("pr", "doc_id")
    kept = (
        s2.select("source", "doc_id", "n_chars", pr.alias("pr"))
        .withColumn("rk", F.row_number().over(wq))
        .filter(F.col("rk") <= DOMAIN_QUOTA)
    )
    funnel1 = s1.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_gate_dedup")
    )
    funnel2 = s2.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_after_ppl")
    )
    funnel3 = kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_chars").alias("kept_chars"),
    )
    return (
        funnel1.join(funnel2, "source", "left")
        .join(funnel3, "source", "left")
        .select(
            "source",
            "n_gate_dedup",
            F.coalesce("n_after_ppl", F.lit(0)).alias("n_after_ppl"),
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("kept_chars", F.lit(0)).alias("kept_chars"),
        )
    )


def knn_graph_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The k-NN graph's SCALE PATH: candidates are confined to each
    vector's IVF cell (nearest centroid) instead of all pairs — the
    ANN front end `ext_knn_graph` documents. Per cell, one Arrow
    matmul task scores and pre-ranks its members' neighbors (top-k
    within the cell IS the final top-k, since candidates never cross
    cells); the mutual intersection and per-node rollup are the same
    tail as the exact graph. Compute drops from O(n²) to
    Σ_cells |cell|², and `ext_sim_recall_eval` is the operator that
    quantifies what the cell confinement loses.

    Output: (vec_id, label, mean_top_sim, n_mutual) — same schema as
    the exact graph, null mean_top_sim for vectors alone in their
    cell.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    scored = _centroid_scored()  # one parsed expr, not 8x64 F.lit
    assigned = emb.select(
        "vec_id",
        "embedding",
        F.sort_array(scored).getItem(0).getField("cidx").alias("cidx"),
    )
    cand = assigned.groupBy("cidx").applyInPandas(
        _cell_topk, "src long, dst long, cos_sim double"
    )
    w = Window.partitionBy("src").orderBy(F.col("cos_sim").desc(), "dst")
    topk = (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= KNN_K)
        .select("src", "dst", "cos_sim")
        # thin n*k rows, consumed by THREE branches (rev, per-node agg,
        # mutual semi-join) - checkpoint or the kernel subtree re-runs
        # once per branch
        .localCheckpoint(eager=False)
    )
    rev = topk.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    mutual = topk.join(rev, ["src", "dst"], "left_semi")
    per_node = topk.groupBy("src").agg(
        # exact-integer numerator (scores are 4-dec fixed point, so
        # x10000 is integral), then ONE IEEE division — identical
        # doubles in both engines with no float-sum order dependence
        # and no round-at-a-tie (avg of an even neighbor count can
        # land exactly on a .00005 boundary)
        (
            F.sum(F.round(F.col("cos_sim") * 10000).cast("long")).cast(
                "double"
            )
            / (F.count(F.lit(1)) * 10000)
        ).alias("mean_top_sim")
    )
    mdeg = mutual.groupBy("src").agg(F.count(F.lit(1)).alias("n_mutual"))
    return (
        emb.select("vec_id", "label")
        .join(per_node, F.col("vec_id") == F.col("src"), "left")
        .drop("src")
        .join(mdeg, F.col("vec_id") == F.col("src"), "left")
        .drop("src")
        .select(
            "vec_id",
            "label",
            "mean_top_sim",
            F.coalesce("n_mutual", F.lit(0)).alias("n_mutual"),
        )
    )


def _cell_topk(pdf: pd.DataFrame) -> pd.DataFrame:
    """applyInPandas kernel: within-cell directed top-KNN_K neighbors.
    Same margin + sequential re-accumulation contract as
    `vector.blocked_topk`'s kernel (1.5·10⁻⁴ covers one rounding class
    plus drift), so rounded scores and tie-breaks match the oracle
    exactly."""
    empty = pd.DataFrame({"src": [], "dst": [], "cos_sim": []}).astype(
        {"src": "int64", "dst": "int64", "cos_sim": "float64"}
    )
    if len(pdf) < 2:
        return empty
    M = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    ids = pdf["vec_id"].to_numpy()
    scores = M @ M.T
    np.fill_diagonal(scores, -np.inf)
    k = KNN_K
    if scores.shape[1] > k:
        kth = np.partition(scores, -k, axis=1)[:, -k]
    else:
        kth = np.full(scores.shape[0], -np.inf)
    mask = scores >= (kth[:, None] - 1.5e-4)
    np.fill_diagonal(mask, False)
    ia, ib = np.nonzero(mask)
    if ia.size == 0:
        return empty
    exact = np.round(vector._seq_dot(M[ia], M[ib]), 4)
    cand = pd.DataFrame(
        {"src": ids[ia], "dst": ids[ib], "cos_sim": exact}
    ).sort_values(["src", "cos_sim", "dst"], ascending=[True, False, True])
    return cand[cand.groupby("src").cumcount() < k]


INCR_MOD = 5  # doc_id % INCR_MOD == 0 → "new batch"; else → "index"


def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup — the PRODUCTION shape: a new ingest batch is
    checked against the EXISTING corpus index, never against itself
    and never index-vs-index. The inverted-index join is asymmetric
    (new-side grams probe index-side postings), so per-ingest cost
    scales with the batch, not the corpus. Here the split is
    deterministic (doc_id % INCR_MOD == 0 is the batch, ~20%); output
    is the admission report per new doc: (doc_id, n_dup_matches,
    best_match, best_jacc), zero-match docs included via a left join.
    """
    sh = _shingled(spark, sf_dir)
    ex = sh.select(
        "doc_id", F.size("sh").alias("n"), F.explode("sh").alias("shingle")
    )
    new = ex.filter(F.col("doc_id") % INCR_MOD == 0)
    idx = ex.filter(F.col("doc_id") % INCR_MOD != 0)
    pairs = (
        new.alias("a")
        .join(idx.alias("b"), "shingle")
        .groupBy(
            F.col("a.doc_id").alias("d_new"),
            F.col("b.doc_id").alias("d_idx"),
            F.col("a.n").alias("na"),
            F.col("b.n").alias("nb"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
        .withColumn(
            "jacc",
            F.round(
                F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")),
                6,
            ),
        )
        .filter(F.col("jacc") >= JACCARD_T)
    )
    wb = Window.partitionBy("d_new").orderBy(F.col("jacc").desc(), "d_idx")
    best = (
        pairs.withColumn("rn", F.row_number().over(wb))
        .withColumn(
            "nm", F.count(F.lit(1)).over(Window.partitionBy("d_new"))
        )
        .filter(F.col("rn") == 1)
        .select("d_new", "nm", "d_idx", "jacc")
    )
    newdocs = sh.filter(F.col("doc_id") % INCR_MOD == 0).select("doc_id")
    return (
        newdocs.join(best, newdocs.doc_id == best.d_new, "left")
        .select(
            "doc_id",
            F.coalesce("nm", F.lit(0)).alias("n_dup_matches"),
            F.col("d_idx").alias("best_match"),
            F.col("jacc").alias("best_jacc"),
        )
    )


def cluster_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified silhouette of the centroid assignment: per vector,
    a = distance to its own centroid, b = distance to the nearest
    OTHER centroid, s = (b − a)/max(a, b) — the clustering-quality
    score in [−1, 1] that says whether the cells are real structure
    or arbitrary cuts (mean s ≈ 0 ⇒ the centroids explain nothing).
    Distances are exactly-associative integer sums on micro-quantized
    vectors (the `ext_kmeans_refine` determinism pattern); the one
    sqrt/ratio per vector is row-local, and per-cell means reduce
    through qsum.

    Scale notes (100 TB): same thin (vec, dim, qval) × broadcast
    centroid join as the k-means pass — the simplified (centroid-
    based) silhouette exists precisely because the classic all-pairs
    silhouette is O(n²) and this one is O(n·K).
    """
    from mini_sql_engine_spark.functions.numeric import NANO, qsum

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select(
        "vec_id", F.posexplode("embedding").alias("dim", "v")
    ).select(
        "vec_id",
        "dim",
        F.floor(F.col("v").cast("double") * KM_SCALE + F.lit(0.5))
        .cast("long")
        .alias("qval"),
    )
    cents = _int_centroids(spark)
    dist = (
        q.join(F.broadcast(cents), "dim")
        .groupBy("vec_id", "cidx")
        .agg(
            F.sum(
                (F.col("qval") - F.col("cval"))
                * (F.col("qval") - F.col("cval"))
            ).alias("dist")
        )
    )
    own = dist.groupBy("vec_id").agg(
        F.min(F.struct("dist", "cidx")).alias("o")
    ).select(
        "vec_id",
        F.col("o.cidx").alias("own_c"),
        F.col("o.dist").alias("a2"),
    )
    b = (
        dist.join(own, "vec_id")
        .filter(F.col("cidx") != F.col("own_c"))
        .groupBy("vec_id")
        .agg(F.min("dist").alias("b2"))
    )
    s = own.join(b, "vec_id").select(
        "own_c",
        (
            (F.sqrt("b2") - F.sqrt("a2"))
            / F.greatest(F.sqrt("a2"), F.sqrt("b2"))
        ).alias("s"),
    )
    per_cell = s.groupBy(F.col("own_c").cast("long").alias("cidx")).agg(
        F.count(F.lit(1)).alias("n_vecs"),
        qsum(F.col("s")).alias("sq"),
    )
    return per_cell.select(
        "cidx",
        "n_vecs",
        F.round(F.col("sq") / NANO / F.col("n_vecs"), 6).alias(
            "mean_silhouette"
        ),
    )


PCA_ITERS = 3
PCA_TOP_DIMS = 8


def pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding cloud by MATRIX-FREE
    power iteration: v ← X'(Xv), X never materialized as a matrix —
    each step is two long-form joins over thin (vec, dim, value)
    rows, the shape distributed linear algebra actually takes.
    Determinism engineering: vectors center on integer-quantized
    micro-units; every mat-vec accumulates exact integers
    (DECIMAL/int128 where products pass 2^63); the iterate
    re-quantizes to 1e6-unit ints after each max-normalization, so
    BOTH engines walk the identical integer sequence — float power
    iteration drifts with partitioning and would never hash-match.
    Output: the PCA_TOP_DIMS largest |loadings| of the converged
    direction plus the Rayleigh explained-variance share.

    Scale notes (100 TB): per iteration, one broadcast of the 64-row
    iterate and two keyed aggregations — O(nnz) work, K·D driver
    state. This is how you get leading components at corpus scale
    without ever collecting a matrix.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    q0 = emb.select(
        "vec_id", F.posexplode("embedding").alias("dim", "v")
    ).select(
        "vec_id",
        "dim",
        F.floor(F.col("v").cast("double") * KM_SCALE + F.lit(0.5))
        .cast("long")
        .alias("qval"),
    )
    means = q0.groupBy("dim").agg(
        F.floor(F.sum("qval") / F.count(F.lit(1)) + 0.5)
        .cast("long")
        .alias("mq")
    )
    x = (
        q0.join(F.broadcast(means), "dim")
        .select("vec_id", "dim", (F.col("qval") - F.col("mq")).alias("xc"))
        .localCheckpoint()
    )
    dec = "decimal(19,0)"
    v = spark.range(EMB_DIM).select(
        F.col("id").cast("int").alias("dim"),
        F.lit(KM_SCALE).cast("long").alias("vq"),
    )
    for _ in range(PCA_ITERS):
        y = (
            x.join(F.broadcast(v), "dim")
            .groupBy("vec_id")
            .agg(F.sum(F.col("xc") * F.col("vq")).alias("y"))
        )
        z = (
            x.join(y, "vec_id")
            .groupBy("dim")
            .agg(
                F.sum(
                    F.col("xc").cast(dec) * F.col("y").cast(dec)
                ).alias("z")
            )
        )
        zmax = z.agg(F.max(F.abs(F.col("z"))).alias("zm"))
        v = (
            z.crossJoin(F.broadcast(zmax))
            .select(
                "dim",
                F.floor(
                    F.col("z").cast("double")
                    / F.col("zm").cast("double")
                    * KM_SCALE
                    + 0.5
                )
                .cast("long")
                .alias("vq"),
            )
            .localCheckpoint()
        )
    y = (
        x.join(F.broadcast(v), "dim")
        .groupBy("vec_id")
        .agg(F.sum(F.col("xc") * F.col("vq")).alias("y"))
    )
    num = y.agg(
        F.sum(F.col("y").cast(dec) * F.col("y").cast(dec)).alias("num")
    )
    den = v.agg(F.sum(F.col("vq") * F.col("vq")).alias("den"))
    trace = x.agg(
        F.sum(F.col("xc").cast(dec) * F.col("xc").cast(dec)).alias("tr")
    )
    loadings = (
        v.crossJoin(F.broadcast(den))
        .crossJoin(F.broadcast(num))
        .crossJoin(F.broadcast(trace))
        .select(
            F.col("dim").cast("long").alias("dim"),
            F.round(
                F.col("vq") / F.sqrt(F.col("den").cast("double")), 6
            ).alias("loading"),
            F.round(
                (
                    F.col("num").cast("double")
                    / F.col("den").cast("double")
                )
                / F.col("tr").cast("double")
                * 100.0,
                4,
            ).alias("explained_pct"),
        )
    )
    return (
        loadings.orderBy(F.abs(F.col("loading")).desc(), "dim")
        .limit(PCA_TOP_DIMS)
    )


QUERIES: dict[str, Callable] = {
    "ext_pca_power_iteration": pca_power_iteration,
    "ext_cluster_silhouette": cluster_silhouette,
    "ext_gopher_gate": gopher_gate,
    "ext_domain_quota": domain_quota,
    "ext_zipf_fit": zipf_fit,
    "ext_semdedup": semdedup,
    "ext_ngram_novelty": ngram_novelty,
    "ext_knn_graph": knn_graph,
    "ext_dup_spans": dup_spans,
    "stream_gopher_gate": stream_gopher_gate,
    "ext_bigram_perplexity": bigram_perplexity,
    "ext_kneser_ney_bigram": kneser_ney_bigram,
    "ext_kmeans_refine": kmeans_refine,
    "ext_dedup_rate_curve": dedup_rate_curve,
    "ext_cluster_sample": cluster_sample,
    "ext_char_ngram_langid": char_ngram_langid,
    "pipeline_quality_mix": pipeline_quality_mix,
    "ext_knn_graph_ann": knn_graph_ann,
    "ext_dedup_incremental": dedup_incremental,
}

_TOKS = "string_split_regex(text, '\\s+')"
_STOPWORDS_SQL = (
    "[" + ", ".join(f"'{s}'" for s in textfns.STOPWORDS) + "]"
)
_QUOTA_PR = (
    "CAST('0x' || substr(md5('quota:' || CAST(doc_id AS VARCHAR)), 1, 15) "
    "AS BIGINT)"
)
_CENTS_SQL = ", ".join(f"({i}, {list(c)})" for i, c in enumerate(CENTROIDS))
_INT_CENTS_SQL = ", ".join(
    f"({c}, {d}, {int(np.floor(v * KM_SCALE + 0.5))})"
    for c, vec in enumerate(CENTROIDS)
    for d, v in enumerate(vec)
)

_GOPHER_ORACLE = f"""
        WITH m AS (
            SELECT source,
                   len({_TOKS}) AS nw,
                   len(regexp_replace(text, '\\s', '', 'g')) * 1.0
                       / len({_TOKS}) AS wlen,
                   len(list_filter({_TOKS},
                                   t -> list_contains({_STOPWORDS_SQL}, t)))
                       * 1.0 / greatest(len({_TOKS}), 1) AS stop,
                   len(list_distinct({_TOKS})) * 1.0 / len({_TOKS}) AS uniq
            FROM documents),
        f AS (
            SELECT source,
                   NOT (nw BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS})
                       AS f_len,
                   NOT (wlen BETWEEN {GOPHER_MIN_WLEN} AND {GOPHER_MAX_WLEN})
                       AS f_wlen,
                   stop < {GOPHER_MIN_STOP} AS f_stop,
                   uniq < {GOPHER_MIN_UNIQ} AS f_uniq
            FROM m)
        SELECT source, COUNT(*) AS n_docs,
               CAST(SUM(CASE WHEN f_len THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_fail_len,
               CAST(SUM(CASE WHEN f_wlen THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_fail_wlen,
               CAST(SUM(CASE WHEN f_stop THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_fail_stop,
               CAST(SUM(CASE WHEN f_uniq THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_fail_uniq,
               CAST(SUM(CASE WHEN NOT (f_len OR f_wlen OR f_stop OR f_uniq)
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
               ROUND(SUM(CASE WHEN NOT (f_len OR f_wlen OR f_stop OR f_uniq)
                         THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 4) AS keep_rate
        FROM f GROUP BY source
    """

ORACLES: dict[str, str] = {
    "ext_pca_power_iteration": f"""
        WITH qs AS (SELECT vec_id,
                      unnest([struct_pack(
                          dim := d - 1,
                          qval := CAST(FLOOR(CAST(embedding[d] AS DOUBLE)
                                             * {KM_SCALE} + 0.5) AS BIGINT))
                              for d in range(1, len(embedding) + 1)]) AS s
               FROM embeddings),
        q0 AS (SELECT vec_id, s.dim AS dim, s.qval AS qval FROM qs),
        means AS (SELECT dim,
                         CAST(FLOOR(SUM(qval) / COUNT(*) + 0.5)
                              AS BIGINT) AS mq
                  FROM q0 GROUP BY dim),
        x AS (SELECT vec_id, q0.dim, qval - mq AS xc
              FROM q0 JOIN means USING (dim)),
        v0 AS (SELECT CAST(r AS INT) AS dim,
                      CAST({KM_SCALE} AS BIGINT) AS vq
               FROM (SELECT UNNEST(range({EMB_DIM})) AS r)),
        y1 AS (SELECT x.vec_id, CAST(SUM(x.xc * v.vq) AS BIGINT) AS y
                 FROM x JOIN v0 v USING (dim) GROUP BY x.vec_id),
        z1 AS (SELECT x.dim,
                        SUM(CAST(x.xc AS HUGEINT) * CAST(y.y AS HUGEINT))
                            AS z
                 FROM x JOIN y1 y USING (vec_id) GROUP BY x.dim),
        zm1 AS (SELECT MAX(ABS(z)) AS zm FROM z1),
        v1 AS (SELECT dim,
                        CAST(FLOOR(CAST(z AS DOUBLE) / CAST(zm AS DOUBLE)
                             * {KM_SCALE} + 0.5) AS BIGINT) AS vq
                 FROM z1 CROSS JOIN zm1),
        y2 AS (SELECT x.vec_id, CAST(SUM(x.xc * v.vq) AS BIGINT) AS y
                 FROM x JOIN v1 v USING (dim) GROUP BY x.vec_id),
        z2 AS (SELECT x.dim,
                        SUM(CAST(x.xc AS HUGEINT) * CAST(y.y AS HUGEINT))
                            AS z
                 FROM x JOIN y2 y USING (vec_id) GROUP BY x.dim),
        zm2 AS (SELECT MAX(ABS(z)) AS zm FROM z2),
        v2 AS (SELECT dim,
                        CAST(FLOOR(CAST(z AS DOUBLE) / CAST(zm AS DOUBLE)
                             * {KM_SCALE} + 0.5) AS BIGINT) AS vq
                 FROM z2 CROSS JOIN zm2),
        y3 AS (SELECT x.vec_id, CAST(SUM(x.xc * v.vq) AS BIGINT) AS y
                 FROM x JOIN v2 v USING (dim) GROUP BY x.vec_id),
        z3 AS (SELECT x.dim,
                        SUM(CAST(x.xc AS HUGEINT) * CAST(y.y AS HUGEINT))
                            AS z
                 FROM x JOIN y3 y USING (vec_id) GROUP BY x.dim),
        zm3 AS (SELECT MAX(ABS(z)) AS zm FROM z3),
        v3 AS (SELECT dim,
                        CAST(FLOOR(CAST(z AS DOUBLE) / CAST(zm AS DOUBLE)
                             * {KM_SCALE} + 0.5) AS BIGINT) AS vq
                 FROM z3 CROSS JOIN zm3),
        yf AS (SELECT x.vec_id, CAST(SUM(x.xc * v.vq) AS BIGINT) AS y
               FROM x JOIN v3 v USING (dim) GROUP BY x.vec_id),
        num AS (SELECT SUM(CAST(y AS HUGEINT) * CAST(y AS HUGEINT))
                           AS num FROM yf),
        den AS (SELECT CAST(SUM(vq * vq) AS BIGINT) AS den FROM v3),
        tr AS (SELECT SUM(CAST(xc AS HUGEINT) * CAST(xc AS HUGEINT))
                          AS tr FROM x),
        loadings AS (
            SELECT CAST(dim AS BIGINT) AS dim,
                   ROUND(vq / SQRT(CAST(den AS DOUBLE)), 6) AS loading,
                   ROUND((CAST(num AS DOUBLE) / CAST(den AS DOUBLE))
                         / CAST(tr AS DOUBLE) * 100.0, 4)
                       AS explained_pct
            FROM v3 CROSS JOIN den CROSS JOIN num CROSS JOIN tr)
        SELECT dim, loading, explained_pct FROM loadings
        ORDER BY ABS(loading) DESC, dim LIMIT {PCA_TOP_DIMS}
    """,
    "ext_cluster_silhouette": f"""
        WITH cents0(cidx, dim, cval) AS (VALUES {_INT_CENTS_SQL}),
        qs AS (SELECT vec_id,
                      unnest([struct_pack(
                          dim := d - 1,
                          qval := CAST(FLOOR(CAST(embedding[d] AS DOUBLE)
                                             * {KM_SCALE} + 0.5) AS BIGINT))
                              for d in range(1, len(embedding) + 1)]) AS s
               FROM embeddings),
        q AS (SELECT vec_id, s.dim AS dim, s.qval AS qval FROM qs),
        dist AS (SELECT q.vec_id, c.cidx,
                        SUM((q.qval - c.cval) * (q.qval - c.cval))
                            AS dist
                 FROM q JOIN cents0 c USING (dim)
                 GROUP BY q.vec_id, c.cidx),
        own AS (SELECT vec_id, cidx AS own_c, dist AS a2 FROM (
                    SELECT vec_id, cidx, dist, ROW_NUMBER() OVER (
                        PARTITION BY vec_id ORDER BY dist, cidx) AS rn
                    FROM dist) WHERE rn = 1),
        b AS (SELECT d.vec_id, MIN(d.dist) AS b2
              FROM dist d JOIN own o ON o.vec_id = d.vec_id
              WHERE d.cidx != o.own_c GROUP BY d.vec_id),
        sil AS (SELECT own_c,
                       (SQRT(CAST(b2 AS DOUBLE))
                        - SQRT(CAST(a2 AS DOUBLE)))
                       / GREATEST(SQRT(CAST(a2 AS DOUBLE)),
                                  SQRT(CAST(b2 AS DOUBLE))) AS s
                FROM own JOIN b USING (vec_id))
        SELECT CAST(own_c AS BIGINT) AS cidx, COUNT(*) AS n_vecs,
               ROUND(CAST(SUM(CAST(FLOOR(s * 1000000000 + 0.5)
                                   AS BIGINT)) AS BIGINT)
                     / 1000000000 / COUNT(*), 6) AS mean_silhouette
        FROM sil GROUP BY own_c
    """,
    "ext_gopher_gate": _GOPHER_ORACLE,
    # stream-batch parity: the streaming aggregation must reproduce the
    # batch report exactly on the same data
    "stream_gopher_gate": _GOPHER_ORACLE,
    "ext_domain_quota": f"""
        SELECT source, doc_id, rk FROM (
            SELECT source, doc_id,
                   CAST(row_number() OVER (
                       PARTITION BY source
                       ORDER BY {_QUOTA_PR}, doc_id) AS INTEGER) AS rk
            FROM documents) t
        WHERE rk <= {DOMAIN_QUOTA}
    """,
    "ext_zipf_fit": f"""
        WITH freq AS (
            SELECT token, COUNT(*) AS cnt FROM (
                SELECT unnest({_TOKS}) AS token FROM documents) t
            GROUP BY token),
        ranked AS (
            SELECT cnt, row_number() OVER (ORDER BY cnt DESC, token) AS rk
            FROM freq),
        q AS (SELECT CAST(FLOOR(ln(rk) * 1000000 + 0.5) AS HUGEINT) AS x,
                     CAST(FLOOR(ln(cnt) * 1000000 + 0.5) AS HUGEINT) AS y
              FROM ranked),
        m AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
                     SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
                     SUM(x * x) AS sxx, SUM(y * y) AS syy
              FROM q)
        SELECT CAST(n AS BIGINT) AS n_types,
               ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE), 4) AS zipf_slope,
               ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                     * CAST(n * sxy - sx * sy AS DOUBLE)
                     / (CAST(n * sxx - sx * sx AS DOUBLE)
                        * CAST(n * syy - sy * sy AS DOUBLE)), 4) AS zipf_r2
        FROM m
    """,
    "ext_ngram_novelty": f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        g AS (SELECT DISTINCT doc_id, gram FROM (
                SELECT doc_id,
                       unnest([array_to_string(toks[i : i + {NOVELTY_N - 1}], ' ')
                               for i in range(1, len(toks) - {NOVELTY_N - 2})])
                           AS gram
                FROM t WHERE len(toks) >= {NOVELTY_N}) raw),
        first AS (SELECT gram, MIN(doc_id) AS first_doc FROM g GROUP BY gram)
        SELECT g.doc_id, COUNT(*) AS n_grams,
               CAST(SUM(CASE WHEN g.doc_id = f.first_doc THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_novel,
               ROUND(SUM(CASE WHEN g.doc_id = f.first_doc THEN 1 ELSE 0 END)
                     * 1.0 / COUNT(*), 4) AS novelty
        FROM g JOIN first f USING (gram)
        GROUP BY g.doc_id
    """,
    "ext_bigram_perplexity": f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        bi AS (SELECT doc_id,
                      unnest([struct_pack(w1 := toks[i], w2 := toks[i + 1])
                              for i in range(1, len(toks))]) AS bg
               FROM t WHERE len(toks) >= 2),
        b AS (SELECT doc_id, bg.w1 AS w1, bg.w2 AS w2 FROM bi),
        uni AS (SELECT tok, COUNT(*) AS cu FROM (
                    SELECT unnest(toks) AS tok FROM t) u GROUP BY tok),
        tot AS (SELECT SUM(cu) AS n, COUNT(*) AS v FROM uni),
        bic AS (SELECT w1, w2, COUNT(*) AS cb FROM b GROUP BY w1, w2),
        types AS (
            SELECT bic.w1, bic.w2,
                   {BI_LAMBDA} * (bic.cb * 1.0 / u1.cu)
                   + {1.0 - BI_LAMBDA} * ((u2.cu + 1.0) / (tot.n + tot.v))
                       AS p
            FROM bic
            JOIN uni u1 ON bic.w1 = u1.tok
            JOIN uni u2 ON bic.w2 = u2.tok
            CROSS JOIN tot),
        micro AS (
            SELECT w1, w2,
                   CAST(FLOOR(-ln(p) * 1000000 + 0.5) AS BIGINT)
                       AS nll_micro
            FROM types)
        SELECT b.doc_id, COUNT(*) AS n_bigrams,
               CAST((SUM(nll_micro) + COUNT(*) // 2) // COUNT(*)
                    AS BIGINT) AS nll_micro
        FROM b JOIN micro ty ON b.w1 = ty.w1 AND b.w2 = ty.w2
        GROUP BY b.doc_id
    """,
    "ext_kneser_ney_bigram": f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        bi AS (SELECT doc_id,
                      unnest([struct_pack(w1 := toks[i], w2 := toks[i + 1])
                              for i in range(1, len(toks))]) AS bg
               FROM t WHERE len(toks) >= 2),
        b AS (SELECT bg.w1 AS w1, bg.w2 AS w2 FROM bi),
        bic AS (SELECT w1, w2, COUNT(*) AS cb FROM b GROUP BY w1, w2),
        ctx AS (SELECT w1, CAST(SUM(cb) AS BIGINT) AS c1,
                       COUNT(*) AS n1p_fwd
                FROM bic GROUP BY w1),
        cont AS (SELECT w2, COUNT(*) AS n1p_bwd FROM bic GROUP BY w2),
        tt AS (SELECT COUNT(*) AS n_types FROM bic),
        top_ctx AS (
            SELECT w1, c1, n1p_fwd FROM (
                SELECT *, ROW_NUMBER() OVER (ORDER BY c1 DESC, w1) AS rn
                FROM ctx) WHERE rn <= {KN_CONTEXTS}),
        scored AS (
            SELECT bic.w1, bic.w2, bic.cb,
                   GREATEST(bic.cb - CAST({KN_D} AS DOUBLE), 0.0) / tc.c1
                   + CAST({KN_D} AS DOUBLE) * tc.n1p_fwd / tc.c1
                     * (cont.n1p_bwd / tt.n_types) AS p
            FROM bic
            JOIN top_ctx tc ON tc.w1 = bic.w1
            JOIN cont ON cont.w2 = bic.w2
            CROSS JOIN tt)
        SELECT w1, w2, cb, ROUND(p, 6) AS p_kn, rnk FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY w1
                        ORDER BY p DESC, w2) AS rnk
            FROM scored)
        WHERE rnk <= {KN_TOPK}
    """,
    "ext_dup_spans": f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        g AS (SELECT doc_id, i AS pos,
                     array_to_string(toks[i : i + {SPAN_GRAM - 1}], ' ') AS gram
              FROM (SELECT doc_id, toks,
                           unnest(range(1, len(toks) - {SPAN_GRAM - 2})) AS i
                    FROM t WHERE len(toks) >= {SPAN_GRAM})),
        cold AS (SELECT * FROM g WHERE gram NOT IN (
                     SELECT gram FROM g GROUP BY gram
                     HAVING COUNT(*) > {SPAN_DF_CAP})),
        m AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pa,
                     a.pos - b.pos AS diag
              FROM cold a JOIN cold b
                ON a.gram = b.gram AND a.doc_id < b.doc_id),
        runs AS (SELECT doc_a, doc_b, diag,
                        pa - row_number() OVER (
                            PARTITION BY doc_a, doc_b, diag ORDER BY pa) AS grp
                 FROM m),
        spans AS (SELECT doc_a, doc_b,
                         COUNT(*) + {SPAN_GRAM - 1} AS span_len
                  FROM runs GROUP BY doc_a, doc_b, diag, grp
                  HAVING COUNT(*) + {SPAN_GRAM - 1} >= {SPAN_MIN})
        SELECT doc_a, doc_b, COUNT(*) AS n_spans,
               MAX(span_len) AS max_span_len
        FROM spans GROUP BY doc_a, doc_b
    """,
    "ext_knn_graph": f"""
        WITH e AS (SELECT vec_id, label,
                          list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                   FROM embeddings),
        d AS (SELECT a.vec_id AS src, b.vec_id AS dst,
                     ROUND(list_dot_product(a.v, b.v), 4) AS cos_sim
              FROM e a JOIN e b ON a.vec_id <> b.vec_id),
        topk AS (SELECT src, dst, cos_sim FROM (
                     SELECT src, dst, cos_sim,
                            row_number() OVER (
                                PARTITION BY src
                                ORDER BY cos_sim DESC, dst) AS rn
                     FROM d) r WHERE rn <= {KNN_K}),
        pn AS (SELECT src,
                      CAST(SUM(CAST(ROUND(cos_sim * 10000) AS BIGINT))
                           AS DOUBLE) / (COUNT(*) * 10000)
                          AS mean_top_sim
               FROM topk GROUP BY src),
        md AS (SELECT t.src, COUNT(*) AS n_mutual FROM topk t
               WHERE EXISTS (SELECT 1 FROM topk r
                             WHERE r.src = t.dst AND r.dst = t.src)
               GROUP BY t.src)
        SELECT e.vec_id, e.label, pn.mean_top_sim,
               COALESCE(md.n_mutual, 0) AS n_mutual
        FROM e LEFT JOIN pn ON e.vec_id = pn.src
               LEFT JOIN md ON e.vec_id = md.src
    """,
    "ext_semdedup": f"""
        WITH cents(cidx, cvec) AS (VALUES {_CENTS_SQL}),
        e AS (SELECT vec_id,
                     list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
              FROM embeddings),
        assign AS (
            SELECT vec_id, v,
                   (SELECT cidx FROM cents
                    ORDER BY list_dot_product(v, cvec) DESC, cidx
                    LIMIT 1) AS cidx
            FROM e),
        pairs AS (
            SELECT a.cidx, b.vec_id AS dropped
            FROM assign a JOIN assign b
              ON a.cidx = b.cidx AND a.vec_id < b.vec_id
            WHERE list_dot_product(a.v, b.v) >= {SEM_THRESH}),
        pc AS (
            SELECT cidx, COUNT(*) AS n_dup_pairs,
                   COUNT(DISTINCT dropped) AS n_dropped
            FROM pairs GROUP BY cidx)
        SELECT s.cidx, COUNT(*) AS n_vecs,
               COALESCE(MAX(pc.n_dup_pairs), 0) AS n_dup_pairs,
               COALESCE(MAX(pc.n_dropped), 0) AS n_dropped,
               COUNT(*) - COALESCE(MAX(pc.n_dropped), 0) AS n_kept
        FROM assign s LEFT JOIN pc USING (cidx)
        GROUP BY s.cidx
    """,
    "ext_dedup_rate_curve": f"""
        WITH p AS ({{jaccard_pairs}}),
        t(threshold) AS (VALUES {", ".join(
            f"(CAST({t} AS DOUBLE))" for t in SWEEP_THRESHOLDS)})
        SELECT t.threshold,
               CAST(SUM(CASE WHEN p.jacc >= t.threshold THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_pairs,
               COUNT(DISTINCT CASE WHEN p.jacc >= t.threshold
                              THEN p.doc_b END) AS n_dropped,
               ROUND(COUNT(DISTINCT CASE WHEN p.jacc >= t.threshold
                           THEN p.doc_b END) * 1.0 /
                     (SELECT COUNT(*) FROM documents), 4) AS drop_rate
        FROM t CROSS JOIN p
        GROUP BY t.threshold
    """,
    "ext_char_ngram_langid": f"""
        WITH g AS (
            SELECT doc_id, lang,
                   unnest([substring(text, i, 3)
                           for i in range(1, len(text) - 1)]) AS gram
            FROM documents WHERE len(text) >= 3),
        counts AS (SELECT lang, gram, COUNT(*) AS c FROM g
                   GROUP BY lang, gram),
        profile AS (
            SELECT lang AS lang_p, gram, c FROM (
                SELECT lang, gram, c, row_number() OVER (
                    PARTITION BY lang ORDER BY c DESC, gram) AS rg
                FROM counts) r
            WHERE rg <= {LANGID_TOP_G}),
        scored AS (
            SELECT g.doc_id, p.lang_p, SUM(p.c) AS score
            FROM g JOIN profile p USING (gram)
            GROUP BY g.doc_id, p.lang_p),
        best AS (
            SELECT doc_id, lang_p AS pred FROM (
                SELECT doc_id, lang_p, row_number() OVER (
                    PARTITION BY doc_id ORDER BY score DESC, lang_p) AS rn
                FROM scored) r
            WHERE rn = 1)
        SELECT d.lang, COALESCE(b.pred, 'und') AS pred_lang,
               COUNT(*) AS n_docs
        FROM documents d LEFT JOIN best b USING (doc_id)
        GROUP BY d.lang, COALESCE(b.pred, 'und')
    """,
    "ext_cluster_sample": f"""
        WITH cents(cidx, cvec) AS (VALUES {_CENTS_SQL}),
        e AS (SELECT vec_id,
                     list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
              FROM embeddings),
        assign AS (
            SELECT vec_id,
                   (SELECT cidx FROM cents
                    ORDER BY list_dot_product(v, cvec) DESC, cidx
                    LIMIT 1) AS cidx
            FROM e),
        pr AS (SELECT cidx, vec_id,
                      CAST('0x' || substr(md5('cell:' ||
                           CAST(vec_id AS VARCHAR)), 1, 15) AS BIGINT) AS pr
               FROM assign)
        SELECT cidx, vec_id, rk FROM (
            SELECT cidx, vec_id,
                   CAST(row_number() OVER (
                       PARTITION BY cidx ORDER BY pr, vec_id) AS INTEGER)
                       AS rk
            FROM pr) r
        WHERE rk <= {CELL_SAMPLE_M}
    """,
    "ext_dedup_incremental": f"""
        WITH base AS ({_BASE}),
        ex AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS shingle
               FROM base),
        a AS (SELECT * FROM ex WHERE doc_id % {INCR_MOD} = 0),
        b AS (SELECT * FROM ex WHERE doc_id % {INCR_MOD} <> 0),
        p AS (SELECT a.doc_id AS d_new, b.doc_id AS d_idx,
                     a.n AS na, b.n AS nb, COUNT(*) AS inter
              FROM a JOIN b USING (shingle)
              GROUP BY 1, 2, 3, 4),
        v AS (SELECT d_new, d_idx,
                     ROUND(inter * 1.0 / (na + nb - inter), 6) AS jacc
              FROM p
              WHERE ROUND(inter * 1.0 / (na + nb - inter), 6)
                    >= {JACCARD_T}),
        best AS (SELECT d_new, d_idx, jacc,
                        row_number() OVER (
                            PARTITION BY d_new
                            ORDER BY jacc DESC, d_idx) AS rn,
                        COUNT(*) OVER (PARTITION BY d_new) AS nm
                 FROM v)
        SELECT nd.doc_id, COALESCE(b1.nm, 0) AS n_dup_matches,
               b1.d_idx AS best_match, b1.jacc AS best_jacc
        FROM (SELECT doc_id FROM base WHERE doc_id % {INCR_MOD} = 0) nd
        LEFT JOIN (SELECT * FROM best WHERE rn = 1) b1
          ON nd.doc_id = b1.d_new
    """,
    "ext_knn_graph_ann": f"""
        WITH cents(cidx, cvec) AS (VALUES {_CENTS_SQL}),
        e AS (SELECT vec_id, label,
                     list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
              FROM embeddings),
        assign AS (
            SELECT vec_id, v,
                   (SELECT cidx FROM cents
                    ORDER BY list_dot_product(v, cvec) DESC, cidx
                    LIMIT 1) AS cidx
            FROM e),
        d AS (SELECT a.vec_id AS src, b.vec_id AS dst,
                     ROUND(list_dot_product(a.v, b.v), 4) AS cos_sim
              FROM assign a JOIN assign b
                ON a.cidx = b.cidx AND a.vec_id <> b.vec_id),
        topk AS (SELECT src, dst, cos_sim FROM (
                     SELECT src, dst, cos_sim,
                            row_number() OVER (
                                PARTITION BY src
                                ORDER BY cos_sim DESC, dst) AS rn
                     FROM d) r WHERE rn <= {KNN_K}),
        pn AS (SELECT src,
                      CAST(SUM(CAST(ROUND(cos_sim * 10000) AS BIGINT))
                           AS DOUBLE) / (COUNT(*) * 10000)
                          AS mean_top_sim
               FROM topk GROUP BY src),
        md AS (SELECT t.src, COUNT(*) AS n_mutual FROM topk t
               WHERE EXISTS (SELECT 1 FROM topk r
                             WHERE r.src = t.dst AND r.dst = t.src)
               GROUP BY t.src)
        SELECT e.vec_id, e.label, pn.mean_top_sim,
               COALESCE(md.n_mutual, 0) AS n_mutual
        FROM e LEFT JOIN pn ON e.vec_id = pn.src
               LEFT JOIN md ON e.vec_id = md.src
    """,
    "ext_kmeans_refine": f"""
        WITH cents0(cidx, dim, cval) AS (VALUES {_INT_CENTS_SQL}),
        qs AS (SELECT vec_id,
                      unnest([struct_pack(
                          dim := d - 1,
                          qval := CAST(FLOOR(CAST(embedding[d] AS DOUBLE)
                                             * {KM_SCALE} + 0.5) AS BIGINT))
                              for d in range(1, len(embedding) + 1)]) AS s
               FROM embeddings),
        q AS (SELECT vec_id, s.dim AS dim, s.qval AS qval FROM qs),
        d1 AS (SELECT q.vec_id, c.cidx,
                      SUM((q.qval - c.cval) * (q.qval - c.cval)) AS dist
               FROM q JOIN cents0 c USING (dim)
               GROUP BY q.vec_id, c.cidx),
        a1 AS (SELECT vec_id, cidx FROM (
                   SELECT vec_id, cidx, row_number() OVER (
                       PARTITION BY vec_id ORDER BY dist, cidx) AS rn
                   FROM d1) r WHERE rn = 1),
        c1 AS (SELECT a1.cidx, q.dim,
                      CAST(FLOOR(SUM(q.qval) * 1.0 / COUNT(*)) AS BIGINT)
                          AS cval
               FROM q JOIN a1 USING (vec_id)
               GROUP BY a1.cidx, q.dim),
        d2 AS (SELECT q.vec_id, c.cidx,
                      SUM((q.qval - c.cval) * (q.qval - c.cval)) AS dist
               FROM q JOIN c1 c USING (dim)
               GROUP BY q.vec_id, c.cidx),
        a2 AS (SELECT vec_id, cidx FROM (
                   SELECT vec_id, cidx, row_number() OVER (
                       PARTITION BY vec_id ORDER BY dist, cidx) AS rn
                   FROM d2) r WHERE rn = 1),
        shift AS (SELECT c1.cidx,
                         CAST(SUM(ABS(c1.cval - c0.cval)) AS BIGINT)
                             AS shift_l1
                  FROM c1 JOIN cents0 c0 USING (cidx, dim)
                  GROUP BY c1.cidx),
        moved AS (SELECT a2.cidx,
                         CAST(SUM(CASE WHEN a2.cidx <> a1.cidx
                                  THEN 1 ELSE 0 END) AS BIGINT) AS n_moved
                  FROM a2 JOIN a1 USING (vec_id)
                  GROUP BY a2.cidx)
        SELECT a2.cidx, COUNT(*) AS n_vecs, MAX(shift.shift_l1) AS shift_l1,
               MAX(moved.n_moved) AS n_moved
        FROM a2 JOIN shift USING (cidx) JOIN moved USING (cidx)
        GROUP BY a2.cidx
    """,
}

# the sweep oracle nests dedup's full candidate-pair construction; it is
# substituted here (not in the f-string above) to keep the literal readable
ORACLES["ext_dedup_rate_curve"] = ORACLES["ext_dedup_rate_curve"].format(
    jaccard_pairs=_JACCARD_PAIRS
)

# composed-pipeline oracle: reuses the dup-span and bigram-LM oracle
# queries as parenthesized subqueries so the stages cannot drift apart
ORACLES["pipeline_quality_mix"] = f"""
    WITH g0 AS (
        SELECT doc_id, source, n_chars,
               len({_TOKS}) AS nw,
               len(regexp_replace(text, '\\s', '', 'g')) * 1.0
                   / len({_TOKS}) AS wlen,
               len(list_filter({_TOKS},
                               t -> list_contains({_STOPWORDS_SQL}, t)))
                   * 1.0 / greatest(len({_TOKS}), 1) AS stop,
               len(list_distinct({_TOKS})) * 1.0 / len({_TOKS}) AS uniq
        FROM documents),
    gated AS (
        SELECT doc_id, source, n_chars FROM g0
        WHERE (nw BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS})
          AND (wlen BETWEEN {GOPHER_MIN_WLEN} AND {GOPHER_MAX_WLEN})
          AND stop >= {GOPHER_MIN_STOP}
          AND uniq >= {GOPHER_MIN_UNIQ}),
    s1 AS (
        SELECT * FROM gated
        WHERE doc_id NOT IN (
            SELECT DISTINCT doc_b FROM ({ORACLES["ext_dup_spans"]}) ds)),
    s1n AS (
        SELECT s1.*, bp.nll_micro
        FROM s1 JOIN ({ORACLES["ext_bigram_perplexity"]}) bp
          USING (doc_id)),
    med AS (SELECT median(nll_micro) AS m FROM s1n),
    s2 AS (SELECT s1n.* FROM s1n, med WHERE s1n.nll_micro <= med.m),
    kept AS (
        SELECT source, doc_id, n_chars FROM (
            SELECT source, doc_id, n_chars,
                   row_number() OVER (
                       PARTITION BY source ORDER BY {_QUOTA_PR}, doc_id)
                       AS rk
            FROM s2) r
        WHERE rk <= {DOMAIN_QUOTA}),
    f1 AS (SELECT source, COUNT(*) AS n_gate_dedup FROM s1
           GROUP BY source),
    f2 AS (SELECT source, COUNT(*) AS n_after_ppl FROM s2
           GROUP BY source),
    f3 AS (SELECT source, COUNT(*) AS n_kept,
                  CAST(SUM(n_chars) AS BIGINT) AS kept_chars FROM kept
           GROUP BY source)
    SELECT f1.source, f1.n_gate_dedup,
           COALESCE(f2.n_after_ppl, 0) AS n_after_ppl,
           COALESCE(f3.n_kept, 0) AS n_kept,
           COALESCE(f3.kept_chars, 0) AS kept_chars
    FROM f1 LEFT JOIN f2 USING (source) LEFT JOIN f3 USING (source)
"""
