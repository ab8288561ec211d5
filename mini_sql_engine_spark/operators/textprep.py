"""Training-data text preparation: span-corruption masking and
vocabulary OOV coverage.

- ``ext_span_corruption``: T5-style span corruption applied
  deterministically — every GAP-th length-SPAN_LEN token span is
  replaced by a numbered sentinel ``<extra_id_k>``. Output carries the
  masked text itself plus the span accounting (token/mask/span
  counts), i.e. the actual seq2seq pretraining input, not just
  statistics. The deterministic rule (position arithmetic, no RNG)
  is what makes the construction exactly replayable in both engines;
  a production run swaps the rule for a seeded hash over (doc_id,
  span_id) — same plan shape.
- ``ext_vocab_oov_rate``: out-of-vocabulary rate per language against
  the corpus' own top-V token vocabulary (count-desc, token-asc
  tie-break — deterministic at the cutoff). THE report that sizes a
  tokenizer vocabulary: a lang with high OOV ppm against the shared
  vocab needs either more vocab or its own tokenizer.

Scale notes (100 TB):
- span corruption is a pure scan-side expression pipeline (tokens →
  indexed transform → filter → concat): zero shuffles, whole rows
  never leave their partition; the sentinel arithmetic is per-token
  integer math inside the JVM.
- vocab building is one token-count aggregation (map-side combined)
  + a top-V sort-limit (partial top-V per partition); the V-row vocab
  broadcasts to the OOV probe, so the corpus-sized side never
  shuffles for the membership test. Per-lang rollup is a second
  map-side-combinable aggregation of integer counts.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from mini_sql_engine_spark.functions.ranking import range_prefix
from mini_sql_engine_spark.catalog import ensure_min_partitions, load_table
from mini_sql_engine_spark.functions import textfns
from mini_sql_engine_spark.functions.hashing import md5_long
from mini_sql_engine_spark.operators.dedup import _BASE as _DEDUP_BASE
from mini_sql_engine_spark.operators.text import _TOKS

SPAN_LEN = 3  # tokens per masked span
GAP = 5  # every GAP-th span is masked (mask ratio = 1/GAP)
VOCAB_V = 500  # vocabulary size for the OOV report


def span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mask every GAP-th SPAN_LEN-token span with <extra_id_k>."""
    toks = textfns.tokens("text")
    # token at 0-based position p belongs to span s = p // SPAN_LEN;
    # span s is masked iff s % GAP == 0; sentinel number k = s // GAP
    def _span(i: F.Column) -> F.Column:
        return F.floor((i - 1) / SPAN_LEN).cast("long")

    masked_arr = F.transform(
        toks,
        lambda t, i0: F.when(
            (_span(i0 + 1) % GAP == 0) & ((i0 % SPAN_LEN) == 0),
            F.concat(
                F.lit("<extra_id_"),
                (_span(i0 + 1) / GAP).cast("long").cast("string"),
                F.lit(">"),
            ),
        )
        .when(_span(i0 + 1) % GAP == 0, F.lit(None).cast("string"))
        .otherwise(t),
    )
    kept = F.filter(masked_arr, lambda x: x.isNotNull())
    n_tokens = F.size(toks).cast("long")
    n_masked = (
        n_tokens
        - F.size(F.filter(masked_arr, lambda x: x.isNotNull())).cast("long")
        + F.size(
            F.filter(masked_arr, lambda x: x.startswith("<extra_id_"))
        ).cast("long")
    )
    n_spans = F.size(
        F.filter(masked_arr, lambda x: x.startswith("<extra_id_"))
    ).cast("long")
    return load_table(spark, sf_dir, "documents").select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_masked.alias("n_masked"),
        n_spans.alias("n_spans"),
        F.concat_ws(" ", kept).alias("masked_text"),
    )


def vocab_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language OOV rate (ppm) vs the corpus top-VOCAB_V vocab."""
    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    tok = docs.select("lang", F.explode(textfns.tokens("text")).alias("t"))
    vocab = (
        tok.groupBy("t")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "t")
        .limit(VOCAB_V)
        .select("t", F.lit(1).alias("in_vocab"))
    )
    probed = tok.join(F.broadcast(vocab), "t", "left")
    return probed.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_oov"),
        F.floor(
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
            * 1_000_000
            / F.count(F.lit(1))
        )
        .cast("long")
        .alias("oov_ppm"),
    )


CTX_N = 10  # most-frequent context tokens to inspect
NEXT_K = 3  # next-token alternatives reported per context


def next_token_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram LM inspection: for the CTX_N most frequent context
    tokens, the NEXT_K most likely next tokens with probability in
    integer ppm — the eyeball check on what a unigram-context LM
    would actually predict, and the dataflow of every "top completions
    per prefix" report. Deterministic ties: contexts and next tokens
    both break on (count desc, token asc).

    Scale: bigram and context counts are map-side-combinable aggs; the
    CTX_N context table broadcasts into the probability join, and the
    per-context top-K is one window over contexts' bigram rows only."""
    from pyspark.sql.window import Window

    # spread the bigram explosion across cores (single-split local scan
    # otherwise; no-op at production scale — see catalog helper)
    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    bi = docs.select(
        F.explode(textfns.shingles("text", 2)).alias("bg")
    ).filter(F.size(F.split(F.col("bg"), " ")) == 2)
    pairs = bi.select(
        F.split("bg", " ")[0].alias("ctx"),
        F.split("bg", " ")[1].alias("nxt"),
    )
    pair_cnt = pairs.groupBy("ctx", "nxt").agg(
        F.count(F.lit(1)).alias("cnt")
        # bigram-type-sized; feeds both the context rollup and the
        # scored join — one corpus explode instead of two (round 10)
    ).localCheckpoint(eager=False)
    # ctx_total = Σ_nxt cnt by definition — roll up the type table,
    # never the corpus again
    ctx_cnt = pair_cnt.groupBy("ctx").agg(F.sum("cnt").alias("ctx_total"))
    top_ctx = (
        ctx_cnt.orderBy(F.col("ctx_total").desc(), "ctx")
        .limit(CTX_N)
    )
    w = Window.partitionBy("ctx").orderBy(F.col("cnt").desc(), "nxt")
    return (
        pair_cnt.join(F.broadcast(top_ctx), "ctx")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= NEXT_K)
        .select(
            "ctx",
            F.col("rk").cast("long").alias("rk"),
            "nxt",
            "cnt",
            F.floor(F.col("cnt") * 1_000_000 / F.col("ctx_total"))
            .cast("long")
            .alias("prob_ppm"),
        )
    )


HEAPS_BUCKET = 50  # docs per bucket in the vocabulary-growth curve


def heaps_law_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-growth (Heaps' law) curve: walking the corpus in
    doc_id order, how many NEVER-SEEN-BEFORE shingles each
    HEAPS_BUCKET-doc bucket contributes, plus the cumulative
    vocabulary. The planning curve for dedup indexes and tokenizer
    vocabularies: a flattening curve says the corpus is saturating
    (more data, few new types); a linear one says keep crawling.

    Plan: shingle first-occurrence = one min(doc_id) aggregation per
    shingle (map-side combinable — never a sort of the corpus);
    bucketing and the cumulative sum run over the buckets-sized
    histogram."""
    from mini_sql_engine_spark.operators.dedup import _shingled
    from pyspark.sql.window import Window

    sh = _shingled(spark, sf_dir)
    first = (
        sh.select("doc_id", F.explode("sh").alias("s"))
        .groupBy("s")
        .agg(F.min("doc_id").alias("first_doc"))
    )
    buckets = first.groupBy(
        F.floor(F.col("first_doc") / HEAPS_BUCKET).cast("long").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("n_new"))
    return range_prefix(buckets, ["bucket"], sum_cols=("n_new",)).select(
        "bucket", "n_new", F.col("cum_n_new").alias("cum_vocab")
    )


NEG_K = 2  # negatives drawn per positive token
NEG_DOC_MOD = 7  # positives come from the doc_id % MOD == 0 sample
NEG_RES = 1000  # weight quantization for the cumulative table
NEG_TOPK = 20


def negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """word2vec-style negative sampling as a dataflow: draw NEG_K
    "noise" tokens per positive ∝ freq^0.75 (the smoothing that keeps
    rare words reachable), with draws inverted through a broadcast
    CUMULATIVE-weight table — the relational alias table. freq^0.75
    is computed as sqrt(sqrt(c³)): sqrt is IEEE-correctly-rounded so
    both engines quantize identical weights, where pow(c, 0.75)
    (exp·ln under the hood) is not. Output: the NEG_TOPK most-drawn
    noise tokens with drawn-vs-expected ppm — the sampler's own
    calibration check.

    Scale notes (100 TB): the vocabulary table (with cumulative
    ranges) broadcasts; each positive row computes its draws by pure
    hashing and range-joins the broadcast — no shuffle grows with the
    corpus, and the positives here are a deterministic doc sample.
    """
    from pyspark.sql import Window

    toks = ensure_min_partitions(
        load_table(spark, sf_dir, "documents")
    ).select(
        "doc_id", F.posexplode(F.split("text", r"\s+")).alias("p", "t")
    )
    vocab = toks.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    weighted = vocab.select(
        "t",
        F.floor(
            F.sqrt(F.sqrt((F.col("c") * F.col("c") * F.col("c")).cast("double")))
            * NEG_RES
            + 0.5
        )
        .cast("long")
        .alias("w"),
        # vocab-sized; consumed by ranges, tot and (via tot) every
        # crossJoin below — without this the corpus tokenize+agg
        # subtree re-ran ~5x (round 10, guide §2.4)
    ).localCheckpoint(eager=False)
    # vocab-scaled cumulative ranges via range_prefix — no
    # single-partition window over the type table
    ranges = range_prefix(weighted, ["t"], sum_cols=("w",)).select(
        "t",
        "w",
        (F.col("cum_w") - F.col("w")).alias("lo"),
        F.col("cum_w").alias("hi"),
    )
    tot = weighted.agg(F.sum("w").alias("tw"))
    pos = toks.filter(F.col("doc_id") % NEG_DOC_MOD == 0)
    draws = (
        pos.select(
            "doc_id",
            "p",
            F.explode(F.sequence(F.lit(1), F.lit(NEG_K))).alias("k"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            (
                md5_long(
                    F.concat_ws(
                        ":",
                        F.col("doc_id"),
                        F.col("p"),
                        F.col("k"),
                    ),
                    salt="neg",
                )
                % F.col("tw")
            ).alias("h")
        )
    )
    # Round 10 (guide §3.3): the pure range condition planned a
    # broadcast NESTED-LOOP join — every draw scanned the whole vocab
    # range table (O(draws × vocab) comparisons, the query's entire
    # cost). Bucketizing makes it a broadcast HASH join: each range
    # explodes into the fixed-width buckets it overlaps (S = ceil of
    # tw/2^16, so the expansion is ~vocab + 2^16 rows and each draw's
    # bucket holds ~avg-width/S ≈ O(1) candidate ranges), the join is
    # bucket-equality, and the original lo ≤ h < hi re-checks as the
    # residual — same matches exactly (ranges partition [0, tw), w ≥
    # NEG_RES > 0 keeps every bucket sequence ascending).
    _NB = 1 << 16
    bucketed = (
        ranges.crossJoin(F.broadcast(tot))
        .withColumn("_s", F.expr(f"(tw + {_NB} - 1) div {_NB}"))
        .select(
            "t",
            "w",
            "lo",
            "hi",
            F.explode(
                F.sequence(
                    F.expr("lo div _s"), F.expr("(hi - 1) div _s")
                )
            ).alias("bkt"),
        )
    )
    draws_b = draws.crossJoin(F.broadcast(tot)).select(
        "h", F.expr(f"h div ((tw + {_NB} - 1) div {_NB})").alias("dbkt")
    )
    drawn = (
        draws_b.join(
            F.broadcast(bucketed),
            (F.col("dbkt") == F.col("bkt"))
            & (F.col("lo") <= F.col("h"))
            & (F.col("h") < F.col("hi")),
        )
        .groupBy("t", "w")
        .agg(F.count(F.lit(1)).alias("n_drawn"))
    )
    drawn = drawn.localCheckpoint(eager=False)  # feeds output + nd
    # every draw lands in EXACTLY one range (they partition [0, tw)),
    # so the draw count is the sum of per-type counts — no second
    # evaluation of the draws subtree
    n_draws = drawn.agg(F.sum("n_drawn").alias("nd"))
    return (
        drawn.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(n_draws))
        .select(
            "t",
            "n_drawn",
            F.floor(
                F.col("n_drawn").cast("double") * 1_000_000 / F.col("nd")
            )
            .cast("long")
            .alias("drawn_ppm"),
            F.floor(
                F.col("w").cast("double") * 1_000_000 / F.col("tw")
            )
            .cast("long")
            .alias("expected_ppm"),
        )
        .orderBy(F.col("n_drawn").desc(), "t")
        .limit(NEG_TOPK)
    )


def chao1_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language vocabulary-richness estimate: Chao1 unseen-species
    lower bound and Good–Turing unseen probability mass, from the
    token frequency-of-frequencies. Chao1 = V + f1·(f1−1)/(2·(f2+1))
    estimates how many token TYPES the crawl has not yet seen (the
    asymptote Heaps' law [ext_heaps_law_curve] approaches); Good–
    Turing p0 = f1/N is the probability the NEXT token is a novel
    type. Together they answer "is more crawling worth it, per
    language" with estimates instead of the growth curve's trend.

    Exactness: V, f1, f2, N are integer aggregates; the two estimates
    are each ONE IEEE division (plus one add for Chao1) on BIGINT-cast
    operands — correctly rounded, so Spark and DuckDB agree bitwise.

    Scale notes (100 TB): one (lang, token) count aggregation —
    map-side combinable, the same shuffle the vocabulary build already
    pays — then a lang-sized rollup of the frequency histogram. No
    per-row state, no sort of the corpus.
    """
    tok = ensure_min_partitions(
        load_table(spark, sf_dir, "documents")
    ).select("lang", F.explode(F.split("text", r"\s+")).alias("t"))
    counts = tok.groupBy("lang", "t").agg(F.count(F.lit(1)).alias("c"))
    per = counts.groupBy("lang").agg(
        F.count(F.lit(1)).alias("v_obs"),
        F.sum("c").alias("n_tokens"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).alias("f1"),
        F.sum(F.when(F.col("c") == 2, 1).otherwise(0)).alias("f2"),
    )
    return per.select(
        "lang",
        "v_obs",
        "n_tokens",
        "f1",
        "f2",
        (
            F.col("v_obs").cast("double")
            + (F.col("f1") * (F.col("f1") - 1)).cast("double")
            / (2 * (F.col("f2") + 1)).cast("double")
        ).alias("chao1_est"),
        (
            F.col("f1").cast("double") / F.col("n_tokens").cast("double")
        ).alias("gt_unseen_mass"),
    )


WINNOW_K = 3  # tokens per gram
WINNOW_W = 4  # winnowing window (guarantee: matches ≥ K+W-1 tokens share a fp)
_POS_BITS = 20  # positions per doc < 2^20 (tokens per doc, bounded)
_HASH_MOD = 1 << 40  # gram-hash truncation so key fits in a BIGINT


def _winnow_parts(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Shared winnowing construction: (keyed grams, selected
    fingerprints, distinct per-doc fingerprint hashes)."""
    from pyspark.sql import Window

    base = (
        ensure_min_partitions(load_table(spark, sf_dir, "documents"))
        .select("doc_id", F.split("text", r"\s+").alias("toks"))
        .filter(F.size("toks") >= WINNOW_K)
    )
    grams = base.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, size(toks) - {WINNOW_K}), "
                "i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"
            )
        ).alias("pos", "gram"),
    )
    keyed = grams.select(
        "doc_id",
        "pos",
        (
            (md5_long(F.col("gram"), salt="win") % _HASH_MOD)
            * (1 << _POS_BITS)
            + ((1 << _POS_BITS) - 1 - F.col("pos"))
        ).alias("key"),
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(-(WINNOW_W - 1), 0)
    )
    # Round 10: both sketch tables lazily checkpoint — winnowing_pairs
    # consumes doc_hashes FOUR times (df count, both self-join sides,
    # per-doc sketch size) and fingerprints twice; without the
    # checkpoints each consumer re-ran the gram hash + window-min
    # pipeline (guide §2.4). Both tables are winnowed-sketch-sized
    # (~2/(W+1) of the gram stream), far below the corpus.
    fps = (
        keyed.select(
            "doc_id", "pos", F.min("key").over(w).alias("sel")
        )
        .filter(F.col("pos") >= WINNOW_W - 1)
        .select("doc_id", "sel")
        .distinct()
        .localCheckpoint(eager=False)
    )
    doc_hashes = (
        fps.select(
            "doc_id", F.expr(f"sel div {1 << _POS_BITS}").alias("fp")
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    return keyed, fps, doc_hashes


def winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer–Wilkerson–Aiken,
    SIGMOD'03 — the MOSS algorithm): hash every K-token gram, then in
    each sliding window of W consecutive gram hashes select the
    minimum (rightmost on ties). The selected (position, hash) set is
    the document's fingerprint sketch, with the winnowing guarantee:
    any shared run of ≥ K+W−1 tokens between two documents yields at
    least one shared selected hash — a DETECTION guarantee MinHash
    cannot give (MinHash bounds expected recall, winnowing bounds
    worst-case). Output per doc: gram count, selected-fingerprint
    count, and how many of its distinct fingerprint hashes also occur
    in some other document (the plagiarism/boilerplate signal).

    The rightmost-min tie-break is encoded arithmetically: key =
    (hash mod 2^40)·2^20 + (2^20−1−pos), so MIN(key) over the window
    is (min hash, max position) — one window aggregate, no struct
    comparison needed, and the identical expression runs in DuckDB.

    Scale notes (100 TB): gram hashing and window selection are
    per-document (partition-local after the scan — Window partitions
    by doc_id); the only corpus-wide shuffle ships the DISTINCT
    (hash, doc) fingerprint pairs — the winnowed sketch is ~2/(W+1)
    of the grams, so the shuffle is a fraction of the corpus' token
    stream. The cross-doc sharing rollup runs on that thin sketch.
    Position capacity is 2^20 grams/doc; longer docs chunk upstream
    (ext_text_chunking) before fingerprinting.
    """
    keyed, fps, doc_hashes = _winnow_parts(spark, sf_dir)
    shared = (
        doc_hashes.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("fp")
    )
    n_shared = (
        doc_hashes.join(shared, "fp", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    per_doc = (
        keyed.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_grams"))
        .join(
            fps.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_fp")),
            "doc_id",
            "left",
        )
        .join(n_shared, "doc_id", "left")
    )
    return per_doc.select(
        "doc_id",
        "n_grams",
        F.coalesce("n_fp", F.lit(0)).alias("n_fps"),
        F.coalesce("n_shared", F.lit(0)).alias("n_shared"),
    )


WINNOW_MIN_SHARED = 2  # pair survives with at least this many shared fps
WINNOW_DF_CAP = 32  # fps in more docs than this are boilerplate, not identity


def winnowing_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Guarantee-backed near-dup candidate pairs from the winnowed
    sketches: doc pairs sharing ≥ WINNOW_MIN_SHARED fingerprint
    hashes, with the shared count and a containment score (shared /
    smaller sketch, ppm). By the winnowing guarantee, any pair with a
    common run of ≥ 2·(K+W−1)−1 tokens... strictly: EVERY shared run
    of ≥ K+W−1 tokens contributes a shared fingerprint — so unlike
    the MinHash/SimHash blockers (probabilistic recall) this
    candidate set provably contains every pair with two such runs.
    Fingerprints present in more than WINNOW_DF_CAP documents are
    excluded as boilerplate (corpus-wide headers/footers describe the
    template, not the document), the same df-cap reasoning as the
    PPJoin prefix filter and dup-span miner.

    Scale notes (100 TB): the self-join runs on the winnowed sketch
    (~2/(W+1) of the gram stream) keyed by fingerprint hash; the
    df-cap bounds per-fingerprint fan-out at WINNOW_DF_CAP², so no
    single hot fingerprint can produce a quadratic pair explosion —
    the exact failure mode the cap exists to kill.
    """
    _, _, doc_hashes = _winnow_parts(spark, sf_dir)
    nd = doc_hashes.groupBy("fp").agg(F.count(F.lit(1)).alias("nd"))
    eligible = nd.filter(
        (F.col("nd") >= 2) & (F.col("nd") <= WINNOW_DF_CAP)
    ).select("fp")
    dh = doc_hashes.join(eligible, "fp", "left_semi")
    a, b = dh.alias("a"), dh.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= WINNOW_MIN_SHARED)
    )
    n_fp = doc_hashes.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_fp")
    )
    return (
        pairs.join(
            F.broadcast(n_fp.withColumnRenamed("doc_id", "doc_a")), "doc_a"
        )
        .withColumnRenamed("n_fp", "fp_a")
        .join(
            F.broadcast(n_fp.withColumnRenamed("doc_id", "doc_b")), "doc_b"
        )
        .withColumnRenamed("n_fp", "fp_b")
        .select(
            "doc_a",
            "doc_b",
            "n_shared",
            F.floor(
                F.col("n_shared").cast("double")
                * 1_000_000
                / F.least("fp_a", "fp_b").cast("double")
            )
            .cast("long")
            .alias("containment_ppm"),
        )
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "ext_negative_sampling": negative_sampling,
    "ext_span_corruption": span_corruption,
    "ext_vocab_oov_rate": vocab_oov_rate,
    "ext_next_token_topk": next_token_topk,
    "ext_heaps_law_curve": heaps_law_curve,
    "ext_chao1_vocab": chao1_vocab,
    "ext_winnowing_fingerprints": winnowing_fingerprints,
    "ext_winnowing_pairs": winnowing_pairs,
}

# shared winnowing construction as SQL CTE text (mirrors _winnow_parts)
_WINNOW_CTES = f"""
        base AS (
            SELECT doc_id, toks FROM (
                SELECT doc_id, {{toks}} AS toks FROM documents)
            WHERE len(toks) >= {WINNOW_K}),
        grams AS (
            SELECT doc_id,
                   UNNEST(range(len(toks) - {WINNOW_K - 1})) AS pos,
                   UNNEST(list_transform(
                       range(len(toks) - {WINNOW_K - 1}),
                       i -> toks[i + 1] || ' ' || toks[i + 2]
                            || ' ' || toks[i + 3])) AS gram
            FROM base),
        keyed AS (
            SELECT doc_id, pos,
                   (CAST(('0x' || substr(md5('win:' || gram), 1, 15))
                         AS BIGINT) % {_HASH_MOD}) * {1 << _POS_BITS}
                   + ({(1 << _POS_BITS) - 1} - pos) AS key
            FROM grams),
        fps AS (
            SELECT DISTINCT doc_id, sel FROM (
                SELECT doc_id, pos,
                       MIN(key) OVER (PARTITION BY doc_id ORDER BY pos
                           ROWS BETWEEN {WINNOW_W - 1} PRECEDING
                           AND CURRENT ROW) AS sel
                FROM keyed)
            WHERE pos >= {WINNOW_W - 1}),
        doc_hashes AS (
            SELECT DISTINCT doc_id, sel // {1 << _POS_BITS} AS fp
            FROM fps)"""

ORACLES: dict[str, str] = {
    "ext_chao1_vocab": f"""
        WITH tok AS (
            SELECT lang, UNNEST({_TOKS}) AS t FROM documents),
        counts AS (
            SELECT lang, t, COUNT(*) AS c FROM tok GROUP BY lang, t),
        per AS (
            SELECT lang,
                   COUNT(*) AS v_obs,
                   CAST(SUM(c) AS BIGINT) AS n_tokens,
                   CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
                   CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
            FROM counts GROUP BY lang)
        SELECT lang, v_obs, n_tokens, f1, f2,
               CAST(v_obs AS DOUBLE)
                 + CAST(f1 * (f1 - 1) AS DOUBLE)
                   / CAST(2 * (f2 + 1) AS DOUBLE) AS chao1_est,
               CAST(f1 AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                 AS gt_unseen_mass
        FROM per
    """,
    "ext_winnowing_pairs": f"""
        WITH {_WINNOW_CTES.format(toks=_TOKS)},
        nd AS (SELECT fp, COUNT(*) AS nd FROM doc_hashes GROUP BY fp),
        eligible AS (
            SELECT fp FROM nd WHERE nd >= 2 AND nd <= {WINNOW_DF_CAP}),
        dh AS (
            SELECT doc_id, fp FROM doc_hashes
            WHERE fp IN (SELECT fp FROM eligible)),
        pairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   COUNT(*) AS n_shared
            FROM dh a JOIN dh b
              ON a.fp = b.fp AND a.doc_id < b.doc_id
            GROUP BY 1, 2
            HAVING COUNT(*) >= {WINNOW_MIN_SHARED}),
        n_fp AS (
            SELECT doc_id, COUNT(*) AS n_fp FROM doc_hashes
            GROUP BY doc_id)
        SELECT p.doc_a, p.doc_b, p.n_shared,
               CAST(FLOOR(CAST(p.n_shared AS DOUBLE) * 1000000
                          / CAST(LEAST(fa.n_fp, fb.n_fp) AS DOUBLE))
                    AS BIGINT) AS containment_ppm
        FROM pairs p
        JOIN n_fp fa ON p.doc_a = fa.doc_id
        JOIN n_fp fb ON p.doc_b = fb.doc_id
    """,
    "ext_winnowing_fingerprints": f"""
        WITH {_WINNOW_CTES.format(toks=_TOKS)},
        shared AS (
            SELECT fp FROM doc_hashes GROUP BY fp
            HAVING COUNT(*) >= 2),
        n_shared AS (
            SELECT doc_id, COUNT(*) AS n_shared FROM doc_hashes
            WHERE fp IN (SELECT fp FROM shared) GROUP BY doc_id),
        n_fp AS (
            SELECT doc_id, COUNT(*) AS n_fp FROM fps GROUP BY doc_id)
        SELECT g.doc_id, g.n_grams,
               COALESCE(f.n_fp, 0) AS n_fps,
               COALESCE(s.n_shared, 0) AS n_shared
        FROM (SELECT doc_id, COUNT(*) AS n_grams FROM keyed
              GROUP BY doc_id) g
        LEFT JOIN n_fp f ON g.doc_id = f.doc_id
        LEFT JOIN n_shared s ON g.doc_id = s.doc_id
    """,
    "ext_negative_sampling": f"""
        WITH tok AS (
            SELECT doc_id, UNNEST({_TOKS}) AS t,
                   UNNEST(range(len({_TOKS}))) AS p
            FROM documents),
        vocab AS (SELECT t, COUNT(*) AS c FROM tok GROUP BY t),
        weighted AS (
            SELECT t,
                   CAST(FLOOR(SQRT(SQRT(CAST(c * c * c AS DOUBLE)))
                              * {NEG_RES} + 0.5) AS BIGINT) AS w
            FROM vocab),
        ranges AS (
            SELECT t, w,
                   COALESCE(SUM(w) OVER (ORDER BY t
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS lo,
                   SUM(w) OVER (ORDER BY t
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS hi
            FROM weighted),
        tot AS (SELECT CAST(SUM(w) AS BIGINT) AS tw FROM weighted),
        draws AS (
            SELECT CAST('0x' || substr(md5('neg:'
                       || CAST(doc_id AS VARCHAR) || ':'
                       || CAST(p AS VARCHAR) || ':'
                       || CAST(k AS VARCHAR)), 1, 15) AS BIGINT)
                   % tw AS h
            FROM (SELECT doc_id, p, UNNEST(range(1, {NEG_K} + 1)) AS k
                  FROM tok WHERE doc_id % {NEG_DOC_MOD} = 0)
            CROSS JOIN tot),
        drawn AS (
            SELECT t, w, COUNT(*) AS n_drawn
            FROM draws JOIN ranges ON lo <= h AND h < hi
            GROUP BY t, w),
        nd AS (SELECT COUNT(*) AS nd FROM draws)
        SELECT t, n_drawn,
               CAST(FLOOR(CAST(n_drawn AS DOUBLE) * 1000000 / nd)
                    AS BIGINT) AS drawn_ppm,
               CAST(FLOOR(CAST(w AS DOUBLE) * 1000000 / tw)
                    AS BIGINT) AS expected_ppm
        FROM drawn CROSS JOIN tot CROSS JOIN nd
        ORDER BY n_drawn DESC, t LIMIT {NEG_TOPK}
    """,
    "ext_span_corruption": f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        m AS (
            SELECT doc_id, len(toks) AS n_tokens,
                   [CASE
                        WHEN (((i - 1) // {SPAN_LEN}) % {GAP}) = 0
                             AND ((i - 1) % {SPAN_LEN}) = 0
                        THEN '<extra_id_'
                             || CAST(((i - 1) // {SPAN_LEN}) // {GAP}
                                     AS VARCHAR) || '>'
                        WHEN (((i - 1) // {SPAN_LEN}) % {GAP}) = 0
                        THEN NULL
                        ELSE toks[i]
                    END for i in range(1, len(toks) + 1)] AS marr
            FROM t)
        SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(n_tokens - len(list_filter(marr, x -> x IS NOT NULL))
                    + len(list_filter(marr,
                          x -> x LIKE '<extra_id_%')) AS BIGINT) AS n_masked,
               CAST(len(list_filter(marr, x -> x LIKE '<extra_id_%'))
                    AS BIGINT) AS n_spans,
               array_to_string(list_filter(marr, x -> x IS NOT NULL), ' ')
                   AS masked_text
        FROM m
    """,
    "ext_heaps_law_curve": f"""
        WITH base AS ({_DEDUP_BASE}),
        first AS (
            SELECT s, MIN(doc_id) AS first_doc
            FROM (SELECT doc_id, unnest(sh) AS s FROM base)
            GROUP BY s),
        buckets AS (
            SELECT CAST(floor(first_doc / {HEAPS_BUCKET}) AS BIGINT)
                       AS bucket,
                   COUNT(*) AS n_new
            FROM first GROUP BY 1)
        SELECT bucket, n_new,
               CAST(SUM(n_new) OVER (ORDER BY bucket
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum_vocab
        FROM buckets
    """,
    "ext_next_token_topk": f"""
        WITH t AS (SELECT {_TOKS} AS toks FROM documents),
        pairs AS (
            SELECT toks[i] AS ctx, toks[i + 1] AS nxt
            FROM t, unnest(range(1, len(toks))) AS r(i)
            WHERE len(toks) >= 2),
        pair_cnt AS (
            SELECT ctx, nxt, COUNT(*) AS cnt FROM pairs GROUP BY ctx, nxt),
        ctx_cnt AS (
            SELECT ctx, COUNT(*) AS ctx_total FROM pairs GROUP BY ctx),
        top_ctx AS (
            SELECT ctx, ctx_total FROM ctx_cnt
            ORDER BY ctx_total DESC, ctx LIMIT {CTX_N}),
        ranked AS (
            SELECT p.ctx, p.nxt, p.cnt, tc.ctx_total,
                   ROW_NUMBER() OVER (PARTITION BY p.ctx
                                      ORDER BY p.cnt DESC, p.nxt) AS rk
            FROM pair_cnt p JOIN top_ctx tc USING (ctx))
        SELECT ctx, CAST(rk AS BIGINT) AS rk, nxt, cnt,
               CAST(floor(cnt * 1000000 / ctx_total) AS BIGINT) AS prob_ppm
        FROM ranked WHERE rk <= {NEXT_K}
    """,
    "ext_vocab_oov_rate": f"""
        WITH tok AS (
            SELECT lang, unnest({_TOKS}) AS t FROM documents),
        vocab AS (
            SELECT t FROM (SELECT t, COUNT(*) AS cnt FROM tok GROUP BY t)
            ORDER BY cnt DESC, t LIMIT {VOCAB_V})
        SELECT lang, COUNT(*) AS n_tokens,
               CAST(SUM(CASE WHEN vocab.t IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_oov,
               CAST(floor(SUM(CASE WHEN vocab.t IS NULL THEN 1 ELSE 0 END)
                          * 1000000 / COUNT(*)) AS BIGINT) AS oov_ppm
        FROM tok LEFT JOIN vocab USING (t)
        GROUP BY lang
    """,
}
