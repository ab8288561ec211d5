"""Text-analysis operators over the `documents` table.

Training-data pipeline surface (driver mandate, BASELINE.json north
star): token counting (whitespace + BPE-ish regex), per-language corpus
stats, language-ID, quality scoring, content fingerprinting, token
histograms. All expressions come from `functions.textfns` — JVM-side
built-ins only, so the whole pipeline is one whole-stage-codegen scan.

Scale notes (100 TB):
- every per-doc operator is a pure projection — embarrassingly
  parallel, no shuffle at all;
- the token histogram explodes tokens (row multiplication ≈ tokens per
  doc) then aggregates — Spark's partial aggregation collapses each
  partition's counts before the shuffle, so shuffle volume is bounded by
  |vocab| × partitions, not corpus size; the global top-k after the agg
  is TakeOrderedAndProject;
- fingerprint-based grouping shuffles only (hash, doc_id) pairs.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from mini_sql_engine_spark.catalog import ensure_min_partitions, load_table
from mini_sql_engine_spark.functions import hashing, textfns
from mini_sql_engine_spark.functions.ranking import ntile_expr, range_prefix


def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc token counts: whitespace and BPE-ish regex tokenizations."""
    return load_table(spark, sf_dir, "documents").select(
        "doc_id",
        textfns.n_tokens("text").cast("long").alias("n_ws_tokens"),
        textfns.n_bpe_tokens("text").cast("long").alias("n_bpe_tokens"),
        F.round(textfns.avg_token_len("text"), 4).alias("avg_tok_len"),
    )


def lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus statistics."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("n_toks", textfns.n_tokens("text"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
            F.round(F.avg("n_toks"), 4).alias("avg_tokens"),
            F.count_distinct("source").alias("n_sources"),
        )
    )


def language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language-ID: argmax marker-token overlap per doc,
    summarized as a (labelled lang × predicted lang) confusion matrix."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("lang", textfns.language_id("text").alias("pred_lang"))
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def langid_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa of the marker-based language identifier against
    the gold labels — chance-corrected agreement, the metric that
    survives class imbalance where raw accuracy misleads (a majority-
    class predictor on a 90%-en corpus scores 90% accuracy but
    kappa ≈ 0). Complements ext_text_language_id's confusion matrix
    with the one-number summary an eval dashboard thresholds.

    Exactness: kappa = (N·Σdiag − S) / (N² − S) with S = Σ_k row_k·
    col_k — the po/pe form cleared of fractions, so everything up to
    the final division is BIGINT arithmetic and the division itself
    is one IEEE correctly-rounded op, bit-identical across engines.

    Scale notes (100 TB): the per-doc prediction is a scan-side
    expression; everything after is arithmetic on the |langs|²
    confusion matrix — the corpus pays one map-side-combinable
    grouped count and nothing else.
    """
    conf = (
        load_table(spark, sf_dir, "documents")
        .select("lang", textfns.language_id("text").alias("pred_lang"))
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint()  # three scalar consumers, one corpus pass
    )
    rowm = conf.groupBy(F.col("lang").alias("k")).agg(
        F.sum("n").alias("row_n")
    )
    colm = conf.groupBy(F.col("pred_lang").alias("k")).agg(
        F.sum("n").alias("col_n")
    )
    chance = (
        rowm.join(colm, "k", "full_outer")
        .agg(
            F.sum(
                F.coalesce("row_n", F.lit(0))
                * F.coalesce("col_n", F.lit(0))
            ).alias("s_chance")
        )
    )
    totals = conf.agg(
        F.sum("n").alias("n_docs"),
        F.sum(
            F.when(F.col("lang") == F.col("pred_lang"), F.col("n")).otherwise(0)
        ).alias("n_agree"),
    )
    return totals.crossJoin(F.broadcast(chance)).select(
        "n_docs",
        "n_agree",
        "s_chance",
        F.floor(
            F.col("n_agree").cast("double")
            * 1_000_000
            / F.col("n_docs").cast("double")
        )
        .cast("long")
        .alias("accuracy_ppm"),
        (
            (F.col("n_docs") * F.col("n_agree") - F.col("s_chance")).cast(
                "double"
            )
            / (
                F.col("n_docs") * F.col("n_docs") - F.col("s_chance")
            ).cast("double")
        ).alias("kappa"),
    )


def langid_class_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class precision/recall/F1 of the marker-based language
    identifier against gold labels — the sklearn-style classification
    report as a dataflow, and the per-class view `ext_langid_kappa`'s
    single number hides (a classifier can carry strong kappa while
    silently never predicting one minority language). One row per
    gold class: support, true positives, predicted count, and
    P/R/F1 in integer ppm.

    Exactness: all counts are integer aggregates of the confusion
    matrix; P/R are round-half-up integer ppm; F1 is computed from
    the RAW integer counts (2·tp·1e6 vs denominators) in one integer
    expression — never from the already-rounded P/R, so no compounded
    rounding and no doubles anywhere.

    Scale notes (100 TB): scan-side prediction expression, one
    map-side-combinable (lang, pred) count, then arithmetic on the
    |langs|² matrix.
    """
    conf = (
        load_table(spark, sf_dir, "documents")
        .select("lang", textfns.language_id("text").alias("pred_lang"))
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint()  # three marginal consumers, one corpus pass
    )
    support = conf.groupBy(F.col("lang").alias("cls")).agg(
        F.sum("n").alias("support")
    )
    predicted = conf.groupBy(F.col("pred_lang").alias("cls")).agg(
        F.sum("n").alias("n_pred")
    )
    tp = (
        conf.filter(F.col("lang") == F.col("pred_lang"))
        .select(F.col("lang").alias("cls"), F.col("n").alias("tp"))
    )
    return (
        support.join(F.broadcast(predicted), "cls", "left")
        .join(F.broadcast(tp), "cls", "left")
        .select(
            "cls",
            "support",
            F.coalesce("tp", F.lit(0)).alias("tp"),
            F.coalesce("n_pred", F.lit(0)).alias("n_pred"),
        )
        .select(
            "cls",
            "support",
            "tp",
            "n_pred",
            F.when(
                F.col("n_pred") > 0,
                F.expr("(1000000 * tp + n_pred div 2) div n_pred"),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("precision_ppm"),
            F.expr("(1000000 * tp + support div 2) div support")
            .cast("long")
            .alias("recall_ppm"),
            F.when(
                F.col("n_pred") + F.col("support") > 0,
                F.expr(
                    "(2000000 * tp + (n_pred + support) div 2)"
                    " div (n_pred + support)"
                ),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("f1_ppm"),
        )
    )


def quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc quality metrics + composite score."""
    return load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.length("text").cast("long").alias("text_len"),
        F.round(textfns.punct_ratio("text"), 6).alias("punct_ratio"),
        F.round(textfns.stopword_ratio("text"), 6).alias("stopword_ratio"),
        textfns.quality_score("text").alias("quality"),
    )


def fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint per doc (md5 over normalized text)."""
    return load_table(spark, sf_dir, "documents").select(
        "doc_id", textfns.fingerprint("text").alias("fp")
    )


def token_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-20 tokens: explode → partial-agg count → top-k."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(textfns.tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("token"))
        .limit(20)
    )


HH_K = 20  # final top-k
HH_M = 100  # per-partition summary size (candidate generation)


def heavy_hitters_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT global top-k tokens via bounded-communication two-pass heavy
    hitters — same output as token_histogram, different scale contract.

    Pass 1 keeps only each partition's local top-M (token, count) summary
    — the shuffle carries at most M rows per partition instead of the
    whole vocabulary. Any token outside every partition's top-M has
    global count <= theta = sum over partitions of the M-th local count,
    so the local-top-M union is a provably complete candidate set
    whenever the k-th best candidate exceeds theta. Pass 2 exact-counts
    the candidates (semi-join, broadcastable candidate set). If the
    certificate fails (flat distribution), fall back to the plain full
    aggregation — the result is exact on EITHER path, which is why this
    operator shares the exact-SQL oracle with token_histogram.

    100 TB: the full-vocab shuffle of the naive plan is the bottleneck
    when vocabulary is huge (web-scale n-grams); here shuffle volume is
    M x partitions rows for pass 1 and |candidates| partial counts for
    pass 2, both independent of vocabulary size. The two driver-side
    scalars (theta, k-th count) are metadata-only aggregates, same
    pattern as dedup_clusters' convergence check."""
    from pyspark.sql import Window

    tok = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(textfns.tokens("text")).alias("token"))
        .localCheckpoint(eager=False)  # consumed by both passes
    )
    per_part = (
        tok.withColumn("pid", F.spark_partition_id())
        .groupBy("pid", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("pid").orderBy(F.col("cnt").desc(), "token")
    summaries = (
        per_part.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= HH_M)
        .localCheckpoint(eager=False)  # theta probe + candidate set
    )
    theta = (
        summaries.filter(F.col("rn") == HH_M).agg(F.sum("cnt")).collect()[0][0] or 0
    )
    candidates = summaries.select("token").distinct()
    topk = (
        tok.join(candidates, "token", "left_semi")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "token")
        .limit(HH_K)
    )
    kth = topk.agg(F.min("cnt")).collect()[0][0]
    if kth is None or kth <= theta:  # certificate failed → exact fallback
        topk = (
            tok.groupBy("token")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy(F.col("cnt").desc(), "token")
            .limit(HH_K)
        )
    return topk


TFIDF_TOP_K = 5


def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 TF-IDF terms per document (smoothed idf = ln((N+1)/(df+1))+1).

    Plan shape: one token explode → (doc, token) partial-agg counts
    (tf), token-level agg (df) joined back, window top-k per doc. At
    100 TB the df table is |vocab|-sized — broadcast if it fits, else
    a shuffled join on token; both aggregations are partial-first so
    the shuffles carry counts, not tokens × docs."""
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.select(F.count(F.lit(1)).alias("n"))
    tok = docs.select("doc_id", F.explode(textfns.tokens("text")).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df = tok.groupBy("token").agg(F.count_distinct("doc_id").alias("df"))
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("token"))
    return (
        tf.join(df, "token")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * (F.log((F.col("n") + 1) / (F.col("df") + 1)) + F.lit(1.0)),
                6,
            ),
        )
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TFIDF_TOP_K)
        .select(
            "doc_id", "token", "tf", "df", "tfidf",
            F.col("rnk").cast("long").alias("rnk"),
        )
    )


CHUNK_TOKENS = 32
CHUNK_STRIDE = 24  # 8-token overlap


def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split documents into overlapping token-window chunks — the
    standard LLM-training-data shaping step (context windows with
    overlap). Pure per-row transform: sequence → slice → posexplode,
    no shuffle, parallel in the scan."""
    docs = load_table(spark, sf_dir, "documents")
    toks = textfns.tokens("text")
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.size(toks) - 1, F.lit(0)),
        F.lit(CHUNK_STRIDE),
    )
    chunks = F.transform(
        starts,
        lambda s: F.array_join(F.slice(toks, s + 1, CHUNK_TOKENS), " "),
    )
    return docs.select(
        "doc_id", F.posexplode(chunks).alias("chunk_idx", "chunk_text")
    ).withColumn(
        "n_chunk_tokens", F.size(textfns.tokens(F.col("chunk_text"))).cast("long")
    )


# decontamination n-gram width — production uses 8-13-grams; the
# synthetic ~15-token word-soup docs collide on nothing that long
# (verified: zero 8-gram overlap at sf0.01), so 3 keeps the operator's
# output non-trivial while the plan shape is width-independent
NGRAM_N = 3


def decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag corpus documents that share any
    exact n-gram with a held-out benchmark set (docs with
    doc_id % 97 == 0 stand in for the benchmark). Distinct from
    near-dup dedup — the test is exact n-gram CONTAINMENT against a
    fixed reference set, the standard pre-training decontamination
    gate; output is (doc_id, distinct overlapping grams).

    Scale: benchmark n-grams are distinct'd and BROADCAST (benchmarks
    are tiny next to the corpus), so the exploded corpus grams are
    filtered by a broadcast semi join with no shuffle; only the
    surviving (contaminated) pairs pay the per-doc count shuffle.
    """
    # small local files scan as ONE split; spread the gram explosion
    # across cores (no-op at scale where the scan is already many splits)
    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    toks = textfns.tokens("text")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (NGRAM_N - 1)),
        lambda i: F.array_join(F.slice(toks, i, NGRAM_N), " "),
    )
    pairs = (
        docs.filter(F.size(toks) >= NGRAM_N)
        .select("doc_id", F.explode(F.array_distinct(grams)).alias("gram"))
        .localCheckpoint(eager=False)  # feeds both the bench and corpus sides
    )
    bench = pairs.filter(F.col("doc_id") % 97 == 0).select("gram").distinct()
    corpus = pairs.filter(F.col("doc_id") % 97 != 0)
    return (
        corpus.join(F.broadcast(bench), "gram", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hit_grams"))  # grams distinct per doc
    )


LIFT_MIN_COUNT = 3  # bigram support floor
LIFT_TOP_K = 30


def bigram_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: top bigrams by lift,
    P(xy) / (P(x)·P(y)) = n_xy·N² / (M·n_x·n_y) over adjacent token
    pairs — the classic PMI-family statistic with the log dropped so
    the score stays a ratio of exact integers (both engines compute
    the identical double quotient; the log would reintroduce
    engine-specific rounding). Bigrams are built JVM-side with an
    indexed higher-order transform (no UDTF, no Python); unigram and
    total counts attach by broadcast (vocabulary-sized and scalar).

    100 TB: two partial-aggregated shuffles (bigrams, unigrams) — both
    count tables, never token streams; the scalar totals ride a
    broadcast cross join, and top-k is TakeOrderedAndProject, not a
    global sort."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(textfns.tokens("text").alias("toks"))
    bgc = (
        toks.select(
            F.explode(
                F.expr(
                    "transform(slice(toks, 1, size(toks) - 1),"
                    " (w, i) -> struct(w AS w1, toks[i + 1] AS w2))"
                )
            ).alias("bg")
        )
        .select("bg.w1", "bg.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_xy"))
    )
    uni = (
        toks.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n_w"))
    )
    tot = toks.select(F.size("toks").alias("k")).agg(
        F.sum("k").alias("n_tok"), F.sum(F.col("k") - 1).alias("n_big")
    )
    u1 = uni.select(F.col("w").alias("w1"), F.col("n_w").alias("n_x"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("n_w").alias("n_y"))
    quotient = (F.col("n_xy") * F.col("n_tok") * F.col("n_tok")) / (
        F.col("n_big") * F.col("n_x") * F.col("n_y")
    )
    return (
        bgc.filter(F.col("n_xy") >= LIFT_MIN_COUNT)
        .join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            "n_xy",
            F.round(quotient.cast("decimal(28,10)"), 6).cast("double").alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "w1", "w2")
        .limit(LIFT_TOP_K)
    )


def repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality signals (the MassiveText/Gopher-style
    filters): top-bigram share and distinct-token ratio per doc. Plan:
    explode bigrams → per-(doc, bigram) partial counts → per-doc max —
    two shuffles of counts, never of text."""
    # spread the bigram explosion (single-split local scan otherwise)
    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    bi = docs.select(
        "doc_id",
        F.explode(textfns.shingles("text", 2)).alias("bigram"),
    )
    per_doc = (
        bi.groupBy("doc_id", "bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("doc_id")
        .agg(
            F.max("cnt").alias("top_bigram_cnt"),
            F.sum("cnt").alias("n_bigrams"),
        )
        .withColumn(
            "top_bigram_share",
            F.round(F.col("top_bigram_cnt") / F.col("n_bigrams"), 6),
        )
    )
    tok_ratio = docs.select(
        "doc_id",
        F.round(
            F.size(F.array_distinct(textfns.tokens("text")))
            / F.size(textfns.tokens("text")),
            6,
        ).alias("distinct_token_ratio"),
    )
    return per_doc.join(tok_ratio, "doc_id").select(
        "doc_id", "top_bigram_share", "distinct_token_ratio", "n_bigrams"
    )


def inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the retrieval-side inverted index: per token, document
    frequency, total term frequency, and the sorted posting list.

    Plan: token explode → one hash aggregation keyed on token; partial
    aggregation collapses each partition to ≤|vocab| rows before the
    shuffle. The posting list is emitted sorted (deterministic). At
    100 TB, hot tokens' posting lists exceed a single row's practical
    size — production shards them into (token, segment) rows after a
    size cutoff; the aggregation shape is unchanged.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.array_distinct(textfns.tokens("text"))).alias("token")
    )
    tf = docs.select("doc_id", F.explode(textfns.tokens("text")).alias("token"))
    per_token = toks.groupBy("token").agg(
        F.count(F.lit(1)).alias("df"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list("doc_id")), lambda x: x.cast("string")
            ),
            ",",
        ).alias("postings"),
    )
    ttf = tf.groupBy("token").agg(F.count(F.lit(1)).alias("ttf"))
    return per_token.join(ttf, "token").select("token", "df", "ttf", "postings")


N_BINS = 20
BIN_LO = 0.0
BIN_HI = 1000.0


def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of events.value — one partial-agg shuffle
    of (bin, count), the distributed histogram primitive."""
    events = load_table(spark, sf_dir, "events")
    w = (BIN_HI - BIN_LO) / N_BINS
    bin_idx = F.least(
        F.greatest(
            F.floor((F.col("value") - F.lit(BIN_LO)) / F.lit(w)), F.lit(0)
        ),
        F.lit(N_BINS - 1),
    ).cast("int")
    return (
        events.groupBy(bin_idx.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("value"), 4).alias("lo"),
            F.round(F.max("value"), 4).alias("hi"),
        )
    )


def regexp_extract_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured extraction: numeric id from 'Customer#000000014' names."""
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.regexp_extract("c_name", r"Customer#(\d+)", 1).cast("long").alias("name_id"),
    )


# ---- oracles ---------------------------------------------------------------

CODE_SYM_PPM_T = 20_000  # symbol-rate (ppm of chars) flagging code-like text
_CODE_RE = r"[{}();=\[\]<>]"  # structural symbols rare in prose, dense in code


def readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per document, ALL-INTEGER: words are
    whitespace tokens, sentences are runs of terminal punctuation
    (min 1), syllables are vowel-group runs (the standard regex proxy
    — exact syllabification needs a dictionary). The score's two ratio
    terms use integer floor-division over milli-units, so
    flesch_milli = 206835 − (1015·W) div S − (84600·Y) div W is exact
    in both engines — a readability gate thresholds this like any
    other fixed-point quality signal (ext_gopher_gate composes it).

    Scale: pure per-row projection (three regexp passes) + nothing
    else — embarrassingly parallel, no shuffle."""
    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    counted = docs.select(
        "doc_id",
        F.greatest(F.size(F.split("text", r"\s+")), F.lit(1))
        .cast("long")
        .alias("n_words"),
        F.greatest(
            F.size(F.expr("regexp_extract_all(text, '[.!?]+', 0)")), F.lit(1)
        )
        .cast("long")
        .alias("n_sentences"),
        F.size(F.expr("regexp_extract_all(lower(text), '[aeiouy]+', 0)"))
        .cast("long")
        .alias("n_syllables"),
    )
    return counted.select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        (
            F.lit(206835)
            - F.expr("(1015 * n_words) div n_sentences")
            - F.expr("(84600 * n_syllables) div n_words")
        )
        .cast("long")
        .alias("flesch_milli"),
    )


def code_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-vs-prose triage per source: a document is code-like when
    its structural-symbol rate ({}();=[]<> as ppm of characters)
    crosses CODE_SYM_PPM_T — the cheap first-pass router a pretraining
    pipeline uses to send code to a code-specific cleaning stack
    before any expensive classifier. Symbol counting is
    length-minus-stripped (one regexp_replace), the rate is integer
    ppm, and the per-source rollup reports the code share.

    Scale: per-row projection + one map-side-combinable aggregate on
    the tiny source key."""
    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    sym = F.length("text") - F.length(
        F.regexp_replace("text", _CODE_RE, "")
    )
    flagged = docs.select(
        "source",
        (
            F.floor(
                sym * 1_000_000 / F.greatest(F.length("text"), F.lit(1))
            ).cast("long")
            >= CODE_SYM_PPM_T
        )
        .cast("long")
        .alias("is_code"),
    )
    return flagged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("is_code").cast("long").alias("n_code"),
        F.floor(F.sum("is_code") * 1_000_000 / F.count(F.lit(1)))
        .cast("long")
        .alias("code_ppm"),
    )


_TOKS = "string_split_regex(text, '\\s+')"
_STOPWORDS_SQL = "['the','a','an','of','and','or','to','in','is','for']"
# language marker profiles — keep in sync with functions.textfns.LANG_MARKERS
_MARKERS_SQL = {
    "en": "['the','of','and','a','to']",
    "fr": "['le','la','et','les','des']",
    "es": "['el','los','las','y','en']",
    "de": "['der','die','und','das','ein']",
    "zh": "['de','shi','le','zai','he']",
}
_SCORES = ", ".join(
    f"len(list_intersect(list_distinct({_TOKS}), {arr})) AS s_{lang}"
    for lang, arr in _MARKERS_SQL.items()
)
# argmax with lexicographically-smallest-language tiebreak (matches the
# Spark sort_array(struct(-score, lang)) encoding)
_ARGMAX = """
    CASE WHEN s_de = 0 AND s_en = 0 AND s_es = 0 AND s_fr = 0 AND s_zh = 0
         THEN 'und'
         WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh
         THEN 'de'
         WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
         WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
         WHEN s_fr >= s_zh THEN 'fr'
         ELSE 'zh' END
"""

def lm_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style quality filter: per-doc mean negative log-likelihood
    under an add-one-smoothed unigram LM trained on the corpus itself,
    bucketed into head/middle/tail terciles (low NLL = head = keep).

    Real CCNet scores with a wiki-trained KenLM; the operator shape —
    train token statistics on a reference corpus, score every document,
    keep the best perplexity terciles — is identical, and a unigram LM
    keeps both engines exactly replayable.

    Scale: one explode + token-count aggregate (map-side combined,
    shuffle bounded by |vocab| × partitions), one shuffle join of tokens
    against counts keyed by token (the natural key; a hot-token skew cap
    would salt here), one per-doc aggregate. The tercile assignment is
    exact ntile semantics replayed by ARITHMETIC on the global rank
    from range_prefix (range-partitioned rank over the thin
    (doc_id, avg_nll_micro) ladder — no single-partition sort): with
    n = 3q + r, the first r buckets take q+1 rows, so
    bucket(p) = ceil(p/(q+1)) while p ≤ r(q+1), else
    r + ceil((p − r(q+1))/q). Bit-identical to ntile(3) over the same
    (avg_nll_micro, doc_id) order, so the oracle keeps DuckDB's own
    NTILE. The doc score itself is an integer micro-nat fixed-point
    (see the in-body note) — no rounded unstable double in the output.
    """
    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    toks = docs.select("doc_id", F.explode(textfns.tokens("text")).alias("tok"))
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    tot = counts.agg(
        F.sum("c").alias("n"), F.count(F.lit(1)).alias("v")
    )
    # per-DISTINCT-token NLL in integer micro-nats: the log runs once
    # per vocabulary entry (not per token instance), and rounding to an
    # integer BEFORE the per-doc reduction makes the doc score an exact
    # integer sum — independent of float accumulation order, so Spark's
    # partial-agg order and DuckDB's scan order cannot diverge (the
    # rounded-avg-of-logs form this replaces was the repo's canonical
    # unstable-double hazard).
    micro = counts.crossJoin(F.broadcast(tot)).select(
        "tok",
        F.floor(
            (F.log(F.col("n") + F.col("v")) - F.log(F.col("c") + 1))
            * 1_000_000
            + F.lit(0.5)
        )
        .cast("long")
        .alias("nll_micro"),
    )
    scored = (
        toks.join(micro, "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.expr(
                "(sum(nll_micro) + count(1) div 2) div count(1)"
            ).alias("avg_nll_micro"),
        )
    )
    ranked = range_prefix(
        scored, ["avg_nll_micro", "doc_id"], total_rows_col="_n"
    )
    bucket_no = ntile_expr("rnk", "_n", 3)
    return ranked.select(
        "doc_id",
        "n_tokens",
        "avg_nll_micro",
        F.element_at(
            F.array(F.lit("head"), F.lit("middle"), F.lit("tail")),
            bucket_no.cast("int"),
        ).alias("bucket"),
    )


BPE_TOP_K = 50


def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BPE merge-step statistic: corpus-wide counts of adjacent
    character pairs within whitespace tokens, top-k by frequency — one
    iteration of what a BPE tokenizer trainer computes before each
    merge. All JVM-side: token explode → in-token pair transform →
    explode → count. Shuffle is bounded by |distinct pairs| ×
    partitions (map-side partial agg); the top-k is
    TakeOrderedAndProject. A full trainer loops this with a merge
    applied between rounds — the per-round dataflow is exactly this.
    """
    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    toks = docs.select(F.explode(textfns.tokens("text")).alias("t"))
    pairs = toks.filter(F.length("t") >= 2).select(
        F.explode(
            F.expr("transform(sequence(1, length(t) - 1), i -> substring(t, i, 2))")
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "pair")
        .limit(BPE_TOP_K)
    )


LO_ALPHA = 100.0  # Dirichlet prior mass (Monroe et al. informative prior)
LO_TOPK = 3  # distinctive terms reported per language


def log_odds_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinctive vocabulary per language via weighted log-odds with
    an informative Dirichlet prior (Monroe, Colaresi & Quinn 2008) —
    the corpora-comparison statistic that fixes what raw TF-IDF and
    PMI get wrong about rare words (they reward noise; the prior
    shrinks by global frequency, the variance term z-scores the
    confidence). For each (lang, term): δ = ln-odds(term | lang) −
    ln-odds(term | rest), σ² ≈ 1/(y+α_w) + 1/(y'+α_w), report the
    LO_TOPK highest-z terms per language. Per-row arithmetic on
    exact counts — no cross-row float reduction anywhere.

    Scale notes (100 TB): (lang, token) counts map-side combine;
    per-lang totals and the global term table broadcast; top-k per
    lang is a keyed rank window over the vocabulary-sized table.
    """
    from pyspark.sql import Window

    tok = ensure_min_partitions(
        load_table(spark, sf_dir, "documents")
    ).select(
        "lang", F.explode(F.split(F.col("text"), r"\s+")).alias("t")
    )
    lw = tok.groupBy("lang", "t").agg(F.count(F.lit(1)).alias("y"))
    gw = lw.groupBy("t").agg(F.sum("y").alias("yg"))
    nl = lw.groupBy("lang").agg(F.sum("y").alias("n"))
    ng = nl.agg(F.sum("n").alias("ntot"))
    j = (
        lw.join(F.broadcast(gw), "t")
        .join(F.broadcast(nl), "lang")
        .crossJoin(F.broadcast(ng))
        .withColumn(
            "aw",
            F.lit(LO_ALPHA) * F.col("yg") / F.col("ntot"),
        )
        .withColumn("yr", F.col("yg") - F.col("y"))
        .withColumn("nr", F.col("ntot") - F.col("n"))
    )
    delta = (
        F.log(
            (F.col("y") + F.col("aw"))
            / (F.col("n") + LO_ALPHA - F.col("y") - F.col("aw"))
        )
        - F.log(
            (F.col("yr") + F.col("aw"))
            / (F.col("nr") + LO_ALPHA - F.col("yr") - F.col("aw"))
        )
    )
    var = 1.0 / (F.col("y") + F.col("aw")) + 1.0 / (
        F.col("yr") + F.col("aw")
    )
    scored = j.select(
        "lang",
        "t",
        "y",
        F.round(delta / F.sqrt(var), 4).alias("z"),
    )
    wo = Window.partitionBy("lang").orderBy(
        F.col("z").desc(), "t"
    )
    return (
        scored.withColumn("rk", F.row_number().over(wo).cast("long"))
        .filter(F.col("rk") <= LO_TOPK)
        .select("lang", "rk", F.col("t").alias("term"), "y", "z")
    )


def tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language tokenizer fertility: BPE-ish tokens per whitespace
    word and characters per BPE token — THE numbers that decide
    whether a tokenizer is fair to a language (high fertility =
    shorter effective context and higher cost per byte for that
    language; the standard multilingual-tokenizer audit). Corpus-level
    ratios of exact integer sums, not averages of ratios, so small
    docs don't distort the budget.

    Scale notes (100 TB): per-row token counting (no explode — counts
    come from size(), so the scan emits 3 ints/doc) into one
    |languages|-row rollup. Cheapest possible full-corpus audit.
    """
    docs = load_table(spark, sf_dir, "documents")
    per = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(textfns.n_tokens("text").cast("long")).alias("ws"),
        F.sum(textfns.n_bpe_tokens("text").cast("long")).alias("bpe"),
        F.sum("n_chars").alias("chars"),
    )
    return per.select(
        "lang",
        "n_docs",
        F.col("ws").alias("n_ws_tokens"),
        F.col("bpe").alias("n_bpe_tokens"),
        F.round(F.col("bpe") / F.col("ws"), 6).alias("fertility"),
        F.round(F.col("chars") / F.col("bpe"), 6).alias("chars_per_token"),
    )


CDC_MOD = 8  # boundary when hash(token) % CDC_MOD == 0 → ~8-token chunks


def cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking dedup (the backup/storage-dedup
    technique, token-level): a chunk boundary falls wherever a token's
    hash ≡ 0 (mod CDC_MOD), so boundaries depend only on LOCAL content
    — an insertion reshuffles one chunk, not every downstream chunk
    the way fixed-size chunking does. Chunks fingerprint by md5 and
    dedup corpus-wide; the report gives chunk counts, the duplicate-
    chunk rate, and the token-weighted storage savings exact dedup at
    chunk granularity would deliver — the sub-document dedup signal
    complementary to shingle Jaccard (which scores pairs, not
    storage).

    Scale notes (100 TB): one token explode with a per-doc cumulative
    window (pos-ordered, partition-local after one doc-keyed
    shuffle), one (doc, chunk) rollup rebuilding chunk text, one
    fingerprint rollup — shuffle volume is bounded by token rows then
    chunk rows. Fingerprints are md5 of chunk text, so the operator
    is exactly replayable anywhere.
    """
    from pyspark.sql import Window

    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id", F.posexplode(textfns.tokens("text")).alias("pos", "tok")
    )
    b = (hashing.md5_long(F.col("tok"), salt="cdc") % CDC_MOD == 0).cast(
        "long"
    )
    wdoc = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    chunked = toks.withColumn(
        "chunk", F.coalesce(F.sum(b).over(wdoc), F.lit(0))
    )
    chunks = chunked.groupBy("doc_id", "chunk").agg(
        F.count(F.lit(1)).alias("c_len"),
        F.md5(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("pos", "tok"))
                    ),
                    lambda s: s["tok"],
                ),
                " ",
            )
        ).alias("fp"),
    )
    per_fp = chunks.groupBy("fp").agg(
        F.count(F.lit(1)).alias("cnt"), F.max("c_len").alias("c_len")
    )
    return per_fp.agg(
        F.sum("cnt").alias("n_chunks"),
        F.count(F.lit(1)).alias("n_unique_chunks"),
        F.sum(F.col("cnt") * F.col("c_len")).alias("n_tokens"),
        F.floor(
            F.sum(F.lit(1_000_000) * (F.col("cnt") - 1))
            / F.sum("cnt")
        )
        .cast("long")
        .alias("dup_chunk_ppm"),
        F.floor(
            F.sum(F.lit(1_000_000) * (F.col("cnt") - 1) * F.col("c_len"))
            / F.sum(F.col("cnt") * F.col("c_len"))
        )
        .cast("long")
        .alias("token_savings_ppm"),
    )


QUERIES: dict[str, Callable] = {
    "ext_cdc_chunk_dedup": cdc_chunk_dedup,
    "ext_readability": readability,
    "ext_code_detect": code_detect,
    "ext_tokenizer_fertility": tokenizer_fertility,
    "ext_log_odds_terms": log_odds_terms,
    "ext_text_token_stats": token_stats,
    "ext_text_lang_stats": lang_stats,
    "ext_text_language_id": language_id,
    "ext_langid_kappa": langid_kappa,
    "ext_langid_class_report": langid_class_report,
    "ext_text_quality": quality,
    "ext_text_fingerprint": fingerprints,
    "ext_text_token_histogram": token_histogram,
    "ext_text_heavy_hitters": heavy_hitters_bounded,
    "ext_text_bigram_lift": bigram_lift,
    "ext_text_tfidf": tfidf_top_terms,
    "ext_text_chunking": chunk_documents,
    "ext_text_repetition": repetition_stats,
    "ext_decontaminate": decontaminate,
    "ext_inverted_index": inverted_index,
    "ext_histogram": value_histogram,
    "ext_regexp_extract": regexp_extract_ids,
    "ext_lm_perplexity": lm_perplexity_buckets,
    "ext_bpe_pair_counts": bpe_pair_counts,
}

# {}-rich regex can't live inside an f-string — concatenate instead.
_READABILITY_ORACLE = r"""
    WITH counted AS (
        SELECT doc_id,
               GREATEST(len(string_split_regex(text, '\s+')), 1) AS n_words,
               GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1)
                   AS n_sentences,
               len(regexp_extract_all(lower(text), '[aeiouy]+'))
                   AS n_syllables
        FROM documents)
    SELECT doc_id,
           CAST(n_words AS BIGINT) AS n_words,
           CAST(n_sentences AS BIGINT) AS n_sentences,
           CAST(n_syllables AS BIGINT) AS n_syllables,
           CAST(206835 - ((1015 * n_words) // n_sentences)
                       - ((84600 * n_syllables) // n_words)
                AS BIGINT) AS flesch_milli
    FROM counted
"""

# NB: DuckDB regexp_replace needs the 'g' flag to strip ALL matches
# (Spark's replaces all by default).
_CODE_DETECT_ORACLE = (
    """
    WITH flagged AS (
        SELECT source,
               CASE WHEN FLOOR((length(text)
                                - length(regexp_replace(text, '"""
    + _CODE_RE
    + """', '', 'g')))
                              * 1000000 / GREATEST(length(text), 1))
                         >= """
    + str(CODE_SYM_PPM_T)
    + """
                    THEN 1 ELSE 0 END AS is_code
        FROM documents)
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(is_code) AS BIGINT) AS n_code,
           CAST(FLOOR(SUM(is_code) * 1000000 / COUNT(*)) AS BIGINT)
               AS code_ppm
    FROM flagged GROUP BY source
"""
)


ORACLES: dict[str, str] = {
    "ext_readability": _READABILITY_ORACLE,
    "ext_code_detect": _CODE_DETECT_ORACLE,
    "ext_log_odds_terms": rf"""
        WITH tok AS (
            SELECT lang, UNNEST(string_split_regex(text, '\s+')) AS t
            FROM documents),
        lw AS (SELECT lang, t, COUNT(*) AS y FROM tok GROUP BY 1, 2),
        gw AS (SELECT t, SUM(y) AS yg FROM lw GROUP BY t),
        nl AS (SELECT lang, SUM(y) AS n FROM lw GROUP BY lang),
        ng AS (SELECT SUM(n) AS ntot FROM nl),
        j AS (
            SELECT lang, lw.t, y,
                   {LO_ALPHA!r} * yg / ntot AS aw,
                   yg - y AS yr, ntot - n AS nr, n
            FROM lw JOIN gw USING (t) JOIN nl USING (lang)
            CROSS JOIN ng),
        scored AS (
            SELECT lang, t, CAST(y AS BIGINT) AS y,
                   ROUND((LN((y + aw)
                             / (n + {LO_ALPHA!r} - y - aw))
                          - LN((yr + aw)
                               / (nr + {LO_ALPHA!r} - yr - aw)))
                         / SQRT(1.0 / (y + aw) + 1.0 / (yr + aw)),
                         4) AS z
            FROM j)
        SELECT lang, CAST(rk AS BIGINT) AS rk, t AS term, y, z
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY z DESC, t) AS rk
              FROM scored)
        WHERE rk <= {LO_TOPK}
    """,
    "ext_cdc_chunk_dedup": f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        tok AS (
            SELECT doc_id, i AS pos, toks[i] AS tok
            FROM (SELECT doc_id, toks,
                         unnest(range(1, len(toks) + 1)) AS i
                  FROM t)),
        flagged AS (
            SELECT doc_id, pos, tok,
                   CAST(CAST(('0x' || substr(md5('cdc:' || tok), 1, 15))
                        AS BIGINT) % {CDC_MOD} = 0 AS BIGINT) AS b
            FROM tok),
        chunked AS (
            SELECT doc_id, pos, tok,
                   COALESCE(SUM(b) OVER (PARTITION BY doc_id
                       ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS chunk
            FROM flagged),
        chunks AS (
            SELECT doc_id, chunk, COUNT(*) AS c_len,
                   md5(string_agg(tok, ' ' ORDER BY pos)) AS fp
            FROM chunked GROUP BY doc_id, chunk),
        per_fp AS (
            SELECT fp, CAST(COUNT(*) AS BIGINT) AS cnt,
                   CAST(MAX(c_len) AS BIGINT) AS c_len
            FROM chunks GROUP BY fp)
        SELECT CAST(SUM(cnt) AS BIGINT) AS n_chunks,
               CAST(COUNT(*) AS BIGINT) AS n_unique_chunks,
               CAST(SUM(cnt * c_len) AS BIGINT) AS n_tokens,
               CAST(FLOOR(SUM(1000000 * (cnt - 1)) / SUM(cnt))
                    AS BIGINT) AS dup_chunk_ppm,
               CAST(FLOOR(SUM(1000000 * (cnt - 1) * c_len)
                    / SUM(cnt * c_len)) AS BIGINT) AS token_savings_ppm
        FROM per_fp
    """,
    "ext_tokenizer_fertility": f"""
        WITH per AS (
            SELECT lang, COUNT(*) AS n_docs,
                   CAST(SUM(len({_TOKS})) AS BIGINT) AS ws,
                   CAST(SUM(len(regexp_extract_all(text,
                       '[A-Za-z0-9]+|[^A-Za-z0-9\\s]'))) AS BIGINT) AS bpe,
                   CAST(SUM(n_chars) AS BIGINT) AS chars
            FROM documents GROUP BY lang)
        SELECT lang, n_docs,
               ws AS n_ws_tokens, bpe AS n_bpe_tokens,
               ROUND(bpe / ws, 6) AS fertility,
               ROUND(chars / bpe, 6) AS chars_per_token
        FROM per
    """,
    "ext_text_token_stats": f"""
        SELECT doc_id,
               len({_TOKS}) AS n_ws_tokens,
               len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\\s]'))
                   AS n_bpe_tokens,
               ROUND(list_sum(list_transform({_TOKS}, t -> len(t)))
                     * 1.0 / greatest(len({_TOKS}), 1), 4) AS avg_tok_len
        FROM documents
    """,
    "ext_text_lang_stats": f"""
        SELECT lang, COUNT(*) AS n_docs,
               ROUND(AVG(n_chars), 4) AS avg_chars,
               ROUND(AVG(len({_TOKS})), 4) AS avg_tokens,
               COUNT(DISTINCT source) AS n_sources
        FROM documents GROUP BY lang
    """,
    "ext_text_language_id": f"""
        WITH scored AS (SELECT lang, {_SCORES} FROM documents)
        SELECT lang, {_ARGMAX} AS pred_lang, COUNT(*) AS n_docs
        FROM scored GROUP BY 1, 2
    """,
    "ext_langid_class_report": f"""
        WITH scored AS (SELECT lang, {_SCORES} FROM documents),
        conf AS (
            SELECT lang, {_ARGMAX} AS pred_lang, COUNT(*) AS n
            FROM scored GROUP BY 1, 2),
        support AS (SELECT lang AS cls, CAST(SUM(n) AS BIGINT) AS support
                    FROM conf GROUP BY 1),
        predicted AS (SELECT pred_lang AS cls,
                             CAST(SUM(n) AS BIGINT) AS n_pred
                      FROM conf GROUP BY 1),
        tp AS (SELECT lang AS cls, CAST(n AS BIGINT) AS tp FROM conf
               WHERE lang = pred_lang),
        j AS (
            SELECT s.cls, s.support,
                   COALESCE(t.tp, 0) AS tp,
                   COALESCE(p.n_pred, 0) AS n_pred
            FROM support s
            LEFT JOIN predicted p ON s.cls = p.cls
            LEFT JOIN tp t ON s.cls = t.cls)
        SELECT cls, support, tp, n_pred,
               CASE WHEN n_pred > 0
                    THEN (1000000 * tp + n_pred // 2) // n_pred
                    ELSE 0 END AS precision_ppm,
               (1000000 * tp + support // 2) // support AS recall_ppm,
               CASE WHEN n_pred + support > 0
                    THEN (2000000 * tp + (n_pred + support) // 2)
                         // (n_pred + support)
                    ELSE 0 END AS f1_ppm
        FROM j
    """,
    "ext_langid_kappa": f"""
        WITH scored AS (SELECT lang, {_SCORES} FROM documents),
        conf AS (
            SELECT lang, {_ARGMAX} AS pred_lang, COUNT(*) AS n
            FROM scored GROUP BY 1, 2),
        rowm AS (SELECT lang AS k, CAST(SUM(n) AS BIGINT) AS row_n
                 FROM conf GROUP BY 1),
        colm AS (SELECT pred_lang AS k, CAST(SUM(n) AS BIGINT) AS col_n
                 FROM conf GROUP BY 1),
        chance AS (
            SELECT CAST(SUM(COALESCE(row_n, 0) * COALESCE(col_n, 0))
                        AS BIGINT) AS s_chance
            FROM rowm FULL OUTER JOIN colm USING (k)),
        totals AS (
            SELECT CAST(SUM(n) AS BIGINT) AS n_docs,
                   CAST(SUM(CASE WHEN lang = pred_lang THEN n ELSE 0 END)
                        AS BIGINT) AS n_agree
            FROM conf)
        SELECT n_docs, n_agree, s_chance,
               CAST(FLOOR(CAST(n_agree AS DOUBLE) * 1000000
                          / CAST(n_docs AS DOUBLE)) AS BIGINT)
                   AS accuracy_ppm,
               CAST(n_docs * n_agree - s_chance AS DOUBLE)
                   / CAST(n_docs * n_docs - s_chance AS DOUBLE) AS kappa
        FROM totals CROSS JOIN chance
    """,
    "ext_text_quality": f"""
        WITH m AS (
            SELECT doc_id,
                   len(text) AS text_len,
                   (len(text) - len(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')))
                       * 1.0 / greatest(len(text), 1) AS praw,
                   len(list_filter({_TOKS},
                                   t -> list_contains({_STOPWORDS_SQL}, t)))
                       * 1.0 / greatest(len({_TOKS}), 1) AS sraw
            FROM documents)
        SELECT doc_id, text_len,
               ROUND(praw, 6) AS punct_ratio,
               ROUND(sraw, 6) AS stopword_ratio,
               ROUND(0.4 * least(text_len / 200.0, 1.0)
                   + 0.3 * (1.0 - least(praw * 5, 1.0))
                   + 0.3 * least(sraw * 4, 1.0), 6) AS quality
        FROM m
    """,
    "ext_text_fingerprint": """
        SELECT doc_id,
               md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp
        FROM documents
    """,
    "ext_text_token_histogram": f"""
        SELECT token, COUNT(*) AS cnt
        FROM (SELECT unnest({_TOKS}) AS token FROM documents) t
        GROUP BY token ORDER BY cnt DESC, token LIMIT 20
    """,
    # exact on either path (certificate or fallback) → same exact oracle
    "ext_text_heavy_hitters": f"""
        SELECT token, COUNT(*) AS cnt
        FROM (SELECT unnest({_TOKS}) AS token FROM documents) t
        GROUP BY token ORDER BY cnt DESC, token LIMIT 20
    """,
    "ext_text_bigram_lift": f"""
        WITH toks AS (SELECT {_TOKS} AS t FROM documents),
        big AS (
            SELECT unnest([t[i] for i in range(1, len(t))]) AS w1,
                   unnest([t[i + 1] for i in range(1, len(t))]) AS w2
            FROM toks),
        bgc AS (SELECT w1, w2, COUNT(*) AS n_xy FROM big GROUP BY 1, 2),
        uni AS (SELECT unnest(t) AS w FROM toks),
        u AS (SELECT w, COUNT(*) AS n_w FROM uni GROUP BY w),
        tot AS (SELECT CAST(SUM(len(t)) AS BIGINT) AS n_tok,
                       CAST(SUM(len(t) - 1) AS BIGINT) AS n_big FROM toks)
        SELECT w1, w2, n_xy,
               CAST(ROUND(CAST(CAST(n_xy * n_tok * n_tok AS DOUBLE)
                               / CAST(n_big * ux.n_w * uy.n_w AS DOUBLE)
                               AS DECIMAL(28,10)), 6) AS DOUBLE) AS lift
        FROM bgc
        JOIN u ux ON bgc.w1 = ux.w
        JOIN u uy ON bgc.w2 = uy.w
        CROSS JOIN tot
        WHERE n_xy >= {LIFT_MIN_COUNT}
        ORDER BY lift DESC, w1, w2 LIMIT {LIFT_TOP_K}
    """,
    "ext_text_tfidf": f"""
        WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS token FROM documents),
        tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
        df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
        n AS (SELECT COUNT(*) AS n FROM documents),
        scored AS (
            SELECT tf.doc_id, tf.token, tf.tf, df.df,
                   ROUND(tf.tf * (ln((n.n + 1) * 1.0 / (df.df + 1)) + 1.0), 6)
                       AS tfidf
            FROM tf JOIN df USING (token) CROSS JOIN n),
        ranked AS (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                         ORDER BY tfidf DESC, token) AS rnk
            FROM scored)
        SELECT doc_id, token, tf, df, tfidf, rnk
        FROM ranked WHERE rnk <= {TFIDF_TOP_K}
    """,
    "ext_text_chunking": f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        s AS (SELECT doc_id, toks,
                     unnest(range(0, greatest(len(toks) - 1, 0) + 1,
                                  {CHUNK_STRIDE})) AS st
              FROM t)
        SELECT doc_id,
               CAST(st / {CHUNK_STRIDE} AS INT) AS chunk_idx,
               array_to_string(toks[st + 1 : st + {CHUNK_TOKENS}], ' ')
                   AS chunk_text,
               len(toks[st + 1 : st + {CHUNK_TOKENS}]) AS n_chunk_tokens
        FROM s
    """,
    "ext_inverted_index": f"""
        WITH t AS (SELECT doc_id, unnest({_TOKS}) AS token FROM documents),
        d AS (SELECT doc_id, token FROM t GROUP BY doc_id, token)
        SELECT d.token,
               COUNT(*) AS df,
               (SELECT COUNT(*) FROM t WHERE t.token = d.token) AS ttf,
               array_to_string(list_sort(list(d.doc_id)), ',') AS postings
        FROM d
        GROUP BY d.token
    """,
    "ext_decontaminate": f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        g AS (SELECT DISTINCT doc_id, gram FROM (
                SELECT doc_id,
                       unnest([array_to_string(toks[i : i + {NGRAM_N - 1}], ' ')
                               for i in range(1, len(toks) - {NGRAM_N - 2})]) AS gram
                FROM t WHERE len(toks) >= {NGRAM_N}) raw),
        bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0),
        corpus AS (SELECT * FROM g WHERE doc_id % 97 != 0)
        SELECT doc_id, COUNT(*) AS n_hit_grams
        FROM corpus WHERE gram IN (SELECT gram FROM bench)
        GROUP BY doc_id
    """,
    "ext_text_repetition": f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        sh AS (SELECT doc_id,
                      CASE WHEN len(toks) >= 2
                           THEN [array_to_string(toks[i : i + 1], ' ')
                                 for i in range(1, len(toks))]
                           ELSE [array_to_string(toks, ' ')] END AS bigrams,
                      toks
               FROM t),
        bi AS (SELECT doc_id, unnest(bigrams) AS bigram FROM sh),
        per_doc AS (
            SELECT doc_id, MAX(cnt) AS top_bigram_cnt,
                   CAST(SUM(cnt) AS BIGINT) AS n_bigrams
            FROM (SELECT doc_id, bigram, COUNT(*) AS cnt
                  FROM bi GROUP BY 1, 2) g
            GROUP BY doc_id)
        SELECT p.doc_id,
               ROUND(top_bigram_cnt * 1.0 / n_bigrams, 6) AS top_bigram_share,
               ROUND(len(list_distinct(toks)) * 1.0 / len(toks), 6)
                   AS distinct_token_ratio,
               n_bigrams
        FROM per_doc p JOIN sh USING (doc_id)
    """,
    "ext_histogram": f"""
        SELECT CAST(least(greatest(floor((value - {BIN_LO})
                                   / {(BIN_HI - BIN_LO) / N_BINS}), 0),
                          {N_BINS - 1}) AS INT) AS bin,
               COUNT(*) AS n,
               ROUND(MIN(value), 4) AS lo,
               ROUND(MAX(value), 4) AS hi
        FROM events GROUP BY 1
    """,
    "ext_regexp_extract": r"""
        SELECT c_custkey,
               CAST(regexp_extract(c_name, 'Customer#(\d+)', 1) AS BIGINT)
                   AS name_id
        FROM customer
    """,
    "ext_lm_perplexity": f"""
        WITH toks AS (
            SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
        counts AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
        tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n, COUNT(*) AS v
                FROM counts),
        micro AS (
            SELECT tok,
                   CAST(FLOOR((ln(n + v) - ln(c + 1)) * 1000000 + 0.5)
                        AS BIGINT) AS nll_micro
            FROM counts CROSS JOIN tot),
        scored AS (
            SELECT doc_id, COUNT(*) AS n_tokens,
                   CAST((SUM(nll_micro) + COUNT(*) // 2) // COUNT(*)
                        AS BIGINT) AS avg_nll_micro
            FROM toks JOIN micro USING (tok)
            GROUP BY doc_id)
        SELECT doc_id, n_tokens, avg_nll_micro,
               (['head', 'middle', 'tail'])[
                   NTILE(3) OVER (ORDER BY avg_nll_micro, doc_id)] AS bucket
        FROM scored
    """,
    "ext_bpe_pair_counts": f"""
        WITH toks AS (
            SELECT unnest({_TOKS}) AS t FROM documents),
        pairs AS (
            SELECT unnest(list_transform(range(1, len(t)),
                                         i -> substr(t, i, 2))) AS pair
            FROM toks WHERE len(t) >= 2)
        SELECT pair, COUNT(*) AS n FROM pairs
        GROUP BY pair ORDER BY n DESC, pair LIMIT {BPE_TOP_K}
    """,
}
