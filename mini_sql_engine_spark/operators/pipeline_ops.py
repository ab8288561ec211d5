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

from mini_sql_engine_spark.catalog import ensure_min_partitions, load_table
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


def aqe_skew_join(
    spark: SparkSession, sf_dir: str, amplify: int = 1
) -> DataFrame:
    """Per-nation purchase revenue through a deliberately SKEWED,
    UNSALTED events⋈customer join — the runtime-re-plan companion to
    `ext_salted_join` (round-8 verdict asked for the AQE side of that
    comparison). Three of every four purchase events are remapped onto
    customer 1, so one join key carries ~75% of the fact side; the
    query plans a plain shuffle join and leaves the skew to Spark's
    adaptive execution (`spark.sql.adaptive.skewJoin`), which splits
    the oversized partition into advisory-sized slices at runtime and
    joins each slice against a replicated copy of the matching build
    rows. The result must equal the plain join — the oracle runs the
    same remapping in SQL — proving the AQE split, like manual
    salting, is a pure re-partitioning.

    Scale notes (100 TB): manual salting (`functions/skew.py`) costs
    an up-front explode of the build side whether or not skew
    materializes; AQE's skew split costs nothing until a runtime map
    stat crosses `skewedPartitionThresholdInBytes`. On a production
    cluster prefer AQE for unpredictable skew and reserve salting for
    the cases AQE can't see (broadcast-ineligible aggregations,
    stream-stream joins, or skew inside a single advisory slice).
    `tests/test_plans.py::test_aqe_splits_the_skewed_join` pins the
    runtime behavior itself: with demo-scale thresholds the executed
    plan must carry `skew=true` on this join and produce identical
    results.

    ``amplify`` replicates the fact side (cross-join with a range) so
    the plan test can push the hot partition past a realistic byte
    threshold on the tiny sf0.001 fixture; the registry entry always
    runs at 1 (results are invariant up to counts × amplify, but the
    oracle is only registered for the unamplified shape)."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            F.when(F.col("user_id") % 4 != 0, F.lit(1))
            .otherwise(F.col("user_id"))
            .cast("long")
            .alias("user_id"),
            "value",
        )
    )
    if amplify > 1:
        ev = ev.crossJoin(spark.range(amplify).select(F.lit(1).alias("_r")))
        ev = ev.drop("_r")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_nationkey"
    )
    # hint the shuffle join explicitly: broadcast would hide the skew
    # path this entry exists to demonstrate
    return (
        ev.join(cust.hint("shuffle_hash"), "user_id")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("revenue"),
        )
    )


def curate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The marquee composition: a full corpus-curation pass as ONE plan.

    quality filter → language filter → exact dedup (fingerprint
    keeper) → near-dup canonical keep (Jaccard inverted index) →
    per-(lang, source) token-budget summary. Every stage is an
    individually-oracled operator elsewhere in this repo; this entry
    proves they COMPOSE — one DataFrame, one Catalyst plan, no
    driver-side materialization between stages.

    Scale path: the filters are scan-fused projections; exact dedup
    shuffles (fp, doc_id) pairs only; the near-dup self-join runs on
    the already-filtered survivor set (each stage shrinks the data the
    next stage shuffles — filter-early is the whole game at 100 TB).
    """
    from mini_sql_engine_spark.catalog import ensure_min_partitions
    from mini_sql_engine_spark.functions import textfns
    from mini_sql_engine_spark.operators.dedup import JACCARD_T, SHINGLE_K

    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    toks = textfns.tokens("text")
    qualified = (
        docs.withColumn("n_toks", F.size(toks))
        .withColumn(
            "dtr",
            F.round(F.size(F.array_distinct(toks)) / F.size(toks), 6),
        )
        .filter(
            (F.col("n_toks") >= 8)
            & (F.col("dtr") >= 0.5)
            & F.col("lang").isin("en", "fr", "es")
        )
    )
    exact_keep = (
        qualified.select("doc_id", textfns.fingerprint("text").alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    surv1 = qualified.join(exact_keep, "doc_id", "left_semi")
    sh = surv1.select(
        "doc_id",
        F.array_distinct(textfns.shingles("text", SHINGLE_K)).alias("sh"),
    ).localCheckpoint(eager=False)
    ex = sh.select(
        "doc_id", F.size("sh").alias("n"), F.explode("sh").alias("shingle")
    )
    a, b = ex.alias("a"), ex.alias("b")
    dropped = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n").alias("na"),
            F.col("b.n").alias("nb"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
        .filter(
            F.round(
                F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6
            )
            >= JACCARD_T
        )
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    surv2 = surv1.join(dropped, "doc_id", "left_anti")
    return surv2.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").alias("total_tokens"),
    )


PACK_BUDGET = 512  # tokens per training sequence


def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing: assign each document to the
    training pack (fixed token budget) its START offset falls in,
    within its language. This is the standard pretraining packing
    scheme — documents are laid out consecutively and the stream is
    chunked every PACK_BUDGET tokens; a doc belongs to the pack where
    it begins. All-integer window arithmetic → exact in both engines.

    Scale: one shuffle on lang + an in-partition sort (the same cost
    profile as any keyed window). Real pipelines partition the
    cumulative sum by (lang, shard) to keep partitions bounded; the
    per-pack aggregate is a second thin shuffle.
    """
    from pyspark.sql import Window

    from mini_sql_engine_spark.functions import textfns

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "n_toks", textfns.n_tokens("text").cast("long")
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        docs.withColumn("cum", F.sum("n_toks").over(w))
        .withColumn(
            "pack_id", ((F.col("cum") - F.col("n_toks")) / PACK_BUDGET).cast("long")
        )
        .groupBy("lang", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").alias("sum_tokens"),
            F.min("doc_id").alias("first_doc"),
        )
    )


def temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted quality sampling: keep a document with
    probability (weight / max_weight)^(1/T) — the mixture-reweighting
    step that upsamples high-quality/rare data before training.
    T = 2 → sqrt, which is bit-exact in both engines (IEEE), and the
    uniform draw is md5-derived — reproducible across engines, runs,
    and partitionings, so the sampled corpus is stable.

    Scale: the max weight is a 1-row broadcast; everything else is
    per-row expression work fused into the scan.
    """
    docs = load_table(spark, sf_dir, "documents")
    maxc = docs.agg(F.max("n_chars").alias("max_chars"))
    u = (md5_long(F.col("doc_id").cast("string"), salt="temp") % 10000) / 10000.0
    p = F.sqrt(F.col("n_chars") / F.col("max_chars"))
    return (
        docs.crossJoin(F.broadcast(maxc))
        .withColumn("p_keep", p)
        .filter(u < F.col("p_keep"))
        .select("doc_id", "lang", "n_chars", "p_keep")
    )


def mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture rebalancing table: per-source token mass and the
    downsampling rate that flattens the mixture to a uniform target —
    rate = min(1, target_share / actual_share). This is the driver
    table a sampler joins against (e.g. temperature_sample keyed by
    source) to hit a target mixture; emitting it as a relation keeps
    the policy inspectable and versionable.

    All-integer token totals; the rate is one double division per
    SOURCE (20 rows), so cross-engine float identity is trivial. One
    aggregate shuffle; the global total is a 1-row broadcast.
    """
    from mini_sql_engine_spark.functions import textfns

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "n_toks", textfns.n_tokens("text").cast("long")
    )
    per_source = docs.groupBy("source").agg(
        F.sum("n_toks").alias("source_tokens"),
        F.count(F.lit(1)).alias("n_docs"),
    ).localCheckpoint(eager=False)  # reused by the global total
    totals = per_source.agg(
        F.sum("source_tokens").alias("total_tokens"),
        F.count(F.lit(1)).alias("n_sources"),
    )
    return (
        per_source.crossJoin(F.broadcast(totals))
        .select(
            "source",
            "n_docs",
            "source_tokens",
            F.least(
                F.lit(1.0),
                F.col("total_tokens")
                / (F.col("n_sources") * F.col("source_tokens")),
            ).alias("sample_rate"),
        )
    )


def length_bucket_padding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-padding efficiency diagnostic: documents bucketed by the
    power-of-2 sequence length a length-grouped batcher would pad to;
    per bucket the doc count, real token mass, padded capacity and
    waste percentage — the numbers that decide between naive batching
    (one global max length) and length-bucketed batching.

    The bucket is computed integer-exactly as 1 << bit_length(n-1)
    (via the length of bin(n-1)) on BOTH engines — float log2 at an
    exact power-of-2 boundary is engine-dependent and would misplace
    boundary docs. Pure projection + one small aggregate: no shuffle
    beyond the |buckets|-row agg at any corpus size.
    """
    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select(
        F.size(F.split("text", r"\s+")).cast("long").alias("n_tok")
    )
    bucket = F.when(F.col("n_tok") <= 1, F.lit(1).cast("long")).otherwise(
        F.expr("CAST(shiftleft(1, length(bin(n_tok - 1))) AS BIGINT)")
    )
    return (
        sized.select("n_tok", bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("sum_tokens"),
        )
        .withColumn("capacity", F.col("bucket") * F.col("n_docs"))
        .withColumn(
            "waste_pct",
            F.round(
                (F.col("capacity") - F.col("sum_tokens")) * 100.0 / F.col("capacity"),
                4,
            ),
        )
    )


SPLIT_TRAIN_PCT2 = 80  # exact stratified split: train share
SPLIT_VAL_PCT2 = 90  # train+val boundary; tail is test


def stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-proportion stratified train/val/test assignment: within
    each (lang, source) stratum, docs are ranked by md5(doc_id) (a
    deterministic shuffle) and split by RANK thresholds — so every
    stratum hits the 80/10/10 proportions exactly (±1 doc), unlike
    hash-modulo splits (ext_hash_sample / ext_split_leakage), which
    only hit them in expectation. The assignment is still stable
    under re-runs and engine changes because the rank order is the
    md5 order. Output: per (lang, source, split) doc counts.

    Scale: one hash-partitioned window per stratum (rank), then a
    map-side-combinable rollup; no global order."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source"
    )
    w = Window.partitionBy("lang", "source").orderBy(
        md5_long(F.col("doc_id").cast("string"), salt="strat"), "doc_id"
    )
    wc = Window.partitionBy("lang", "source")
    ranked = docs.select(
        "lang",
        "source",
        F.row_number().over(w).alias("rnk"),
        F.count(F.lit(1)).over(wc).alias("n"),
    )
    split = (
        F.when(
            F.col("rnk") * 100 <= F.col("n") * SPLIT_TRAIN_PCT2, "train"
        )
        .when(F.col("rnk") * 100 <= F.col("n") * SPLIT_VAL_PCT2, "val")
        .otherwise("test")
    )
    return ranked.groupBy("lang", "source", split.alias("split")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )


DSIR_BUCKETS = 256  # hashed-unigram feature buckets
DSIR_TARGET_LANG = "en"  # docs in the target domain for the importance ratio


def dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, public method):
    score every raw doc by how target-like its hashed-unigram feature
    distribution is. Features = tokens hashed into DSIR_BUCKETS; the
    weight is the bag-of-buckets log-likelihood ratio
    sum_b log(p_target(b) / p_raw(b)) with Laplace smoothing, where
    target = the DSIR_TARGET_LANG slice and raw = the whole corpus.
    Output: (doc_id, n_tokens, weight_micro) — the ranking a selection
    pass (temperature/Gumbel top-k) consumes. Each bucket's log-ratio
    is rounded ONCE to integer micro-nats on the 256-row ratio table;
    the per-doc weight is then an exact integer sum, so float
    accumulation order (Spark partial aggs vs DuckDB single-node)
    cannot surface at all — stronger than the rounded-double form this
    replaces (one of the three historical sf0.1 divergences).

    Scale notes (100 TB): both bucket histograms are map-side-combined
    aggregations whose shuffle is bounded by DSIR_BUCKETS, not corpus
    size; the 256-row log-ratio table broadcasts onto the token stream,
    so the only corpus-sized shuffle is the final doc_id rollup of thin
    (doc_id, lr) rows. This is why DSIR-style selection scales where a
    model-based scorer needs a GPU fleet: the whole pass is two integer
    histograms and one hash join.
    """
    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    tok = docs.select(
        "doc_id",
        "lang",
        F.explode(F.split(F.col("text"), r"\s+")).alias("t"),
    ).select(
        "doc_id", "lang", (md5_long(F.col("t")) % DSIR_BUCKETS).alias("b")
    )
    raw = tok.groupBy("b").agg(F.count(F.lit(1)).alias("cr"))
    tgt = (
        tok.filter(F.col("lang") == DSIR_TARGET_LANG)
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("ct"))
    )
    tot = raw.agg(F.sum("cr").alias("tr")).crossJoin(
        tgt.agg(F.sum("ct").alias("tt"))
    )
    lr = (
        raw.join(tgt, "b", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "b",
            F.floor(
                (
                    F.log(
                        (F.coalesce(F.col("ct"), F.lit(0)) + F.lit(1.0))
                        / (F.col("tt") + F.lit(float(DSIR_BUCKETS)))
                    )
                    - F.log(
                        (F.col("cr") + F.lit(1.0))
                        / (F.col("tr") + F.lit(float(DSIR_BUCKETS)))
                    )
                )
                * 1_000_000
                + F.lit(0.5)
            )
            .cast("long")
            .alias("lr_micro"),
        )
    )
    return (
        tok.join(F.broadcast(lr), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            # exact integer sum of per-bucket micro-nats: no float
            # accumulation, no -0.0 canonicalization needed
            F.sum("lr_micro").alias("weight_micro"),
        )
    )


GUMBEL_K = 200  # documents selected per pass
GUMBEL_RES = 1_000_000  # uniform-noise resolution (hash buckets)


def gumbel_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gumbel top-K data selection (public trick: Gumbel-max sampling
    WITHOUT replacement ∝ exp(score) == take the K largest
    score + Gumbel(0,1) keys). Score here is ln(n_chars) — i.e. sample
    ∝ document length — with the noise derived from a salted hash so
    the draw is deterministic and engine-portable:
    u = (h % RES + 0.5) / RES, g = -ln(-ln(u)). Output: the selected
    K docs with their rounded keys, ranked.

    Scale notes (100 TB): a global top-K never globally sorts — Spark's
    sort+limit physical plan is TakeOrdered (per-partition heap of K,
    then a K·partitions merge on the driver), so cost is one scan plus
    a tiny merge regardless of corpus size. The noise is a hash of the
    row key, not rand(): re-runs and retried tasks produce the same
    sample — the property that makes distributed sampling reproducible.
    """
    docs = load_table(spark, sf_dir, "documents")
    u = (
        md5_long(F.col("doc_id").cast("string"), salt="gumbel") % GUMBEL_RES
        + 0.5
    ) / float(GUMBEL_RES)
    key = F.log(F.col("n_chars").cast("double")) - F.log(-F.log(u))
    ranked = (
        docs.select("doc_id", "lang", "n_chars", key.alias("key"))
        .orderBy(F.col("key").desc(), "doc_id")
        .limit(GUMBEL_K)
    )
    from pyspark.sql import Window

    # bounded global window: post-limit top-K rows, never the corpus
    w = Window.orderBy(F.col("key").desc(), "doc_id")
    return ranked.select(
        F.row_number().over(w).cast("long").alias("rank"),
        "doc_id",
        "lang",
        "n_chars",
        F.round("key", 4).alias("gumbel_key"),
    )


N_SHARDS = 8  # training-shard fan-out


def shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced training-shard assignment: serpentine (snake-draft)
    placement of docs into N_SHARDS by token count, done WITHIN integer
    log2 length bands so no global ordering is ever needed — docs in a
    band are within 2× of each other, so snaking a band is near-
    perfectly balanced and the shard totals are sums of near-balanced
    bands. Output: per shard, doc/token totals and the deviation from
    the mean shard load in basis points (integer inputs → IEEE-stable).

    Scale notes (100 TB): the serpentine needs a rank, but only within
    (band) — the window partitions by band, so the work is parallel
    across ~20 bands and each band's sort is a partial order, never a
    single-partition global window. (A global row_number over 100 TB
    funnels every row through one task — the design this banding
    exists to avoid.) The final rollup is N_SHARDS rows.
    """
    from pyspark.sql import Window

    # band = bit_length(n-1): integer-exact power-of-2 banding (float
    # log2 at a 2^k boundary is engine-dependent — see length_bucket)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(F.col("n_chars") <= 1, F.lit(0))
        .otherwise(F.expr("length(bin(n_chars - 1))"))
        .alias("band"),
        F.col("n_chars").alias("n_toks"),
    )
    w = Window.partitionBy("band").orderBy(
        F.col("n_toks").desc(), "doc_id"
    )
    placed = docs.withColumn(
        "rn", (F.row_number().over(w) - 1).cast("long")
    ).select(
        "n_toks",
        F.when(
            F.floor(F.col("rn") / N_SHARDS) % 2 == 0,
            F.col("rn") % N_SHARDS,
        )
        .otherwise(N_SHARDS - 1 - F.col("rn") % N_SHARDS)
        .alias("shard"),
    )
    per_shard = placed.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").alias("sum_tokens"),
    )
    tot = per_shard.agg(
        (F.sum("sum_tokens") / F.lit(float(N_SHARDS))).alias("mean_load")
    )
    return per_shard.crossJoin(F.broadcast(tot)).select(
        "shard",
        "n_docs",
        "sum_tokens",
        F.round(
            (F.col("sum_tokens") - F.col("mean_load"))
            * 10000.0
            / F.col("mean_load"),
            2,
        ).alias("dev_bps"),
    )


NUCLEUS_PCT = 90  # keep the smallest top-quality prefix ≥ this token share


def nucleus_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nucleus (top-p) corpus selection per language: rank documents
    by length descending and keep the smallest prefix whose token mass
    reaches NUCLEUS_PCT% of the language total — the corpus-curation
    analogue of nucleus sampling (cut the long tail, keep the mass).
    A doc is kept iff the cumulative mass BEFORE it is still under the
    target, so the boundary doc that crosses the threshold is included
    — all-integer arithmetic, no percent rounding at the cut. Output:
    per language, total vs kept docs/tokens and the realized share.

    Scale notes (100 TB): as written the rank is a per-language window
    — few partition keys, heavy sort. The scale path keeps the same
    semantics in two cheap passes: per (lang, bit-length band) token
    sums locate the band the threshold falls in (bands are a ~60-row
    table), then only that single boundary band needs row-level
    ranking; every other band is kept or dropped wholesale. The
    window form is used here because it is the exactness oracle the
    banded rewrite must reproduce.
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.col("n_chars").cast("long").alias("toks")
    )
    wo = Window.partitionBy("lang").orderBy(
        F.col("toks").desc(), "doc_id"
    )
    cum = F.sum("toks").over(
        wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = F.sum("toks").over(Window.partitionBy("lang"))
    flagged = docs.select(
        "lang",
        "toks",
        ((cum - F.col("toks")) * 100 < tot * NUCLEUS_PCT)
        .cast("long")
        .alias("keep"),
    )
    return flagged.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("keep").alias("n_kept"),
        F.sum("toks").alias("total_tokens"),
        F.sum(F.col("keep") * F.col("toks")).alias("kept_tokens"),
        F.round(
            F.sum(F.col("keep") * F.col("toks"))
            * 100.0
            / F.sum("toks"),
            4,
        ).alias("kept_share_pct"),
    )


HRW_WORKERS = 10  # rendezvous-hash worker pool size
HRW_REMOVED = 3  # the worker that "fails" in the rebalance scenario


def rendezvous_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous (highest-random-weight) hashing of documents onto a
    worker pool, plus the failover rebalance: each doc goes to the
    worker maximizing hash(doc, worker); when worker HRW_REMOVED
    dies, ONLY its docs move (the consistent-hashing guarantee — a
    mod-N scheme would reshuffle ~everything). Output: per surviving
    worker, the steady-state load, the post-failover load, and how
    many docs it inherited. Ties in the argmax are broken by worker
    id, deterministically.

    Scale notes (100 TB): the doc × worker score table is an explode
    by a CONSTANT small factor (the pool size) followed by a thin
    max_by per doc — embarrassingly parallel, no shuffle until the
    |workers|-row load rollup. For thousands of workers, score only
    each doc's top-C candidate workers via a two-level pool
    (rendezvous over groups, then within the group).
    """
    workers = F.array(*[F.lit(i) for i in range(HRW_WORKERS)])
    scored = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.explode(workers).alias("w"))
        .select(
            "doc_id",
            "w",
            md5_long(
                F.concat_ws(
                    "#", F.col("doc_id").cast("string"), F.col("w")
                ),
                salt="hrw",
            ).alias("score"),
        )
    )
    # argmax by (score, w): max_by with a struct orders lexicographically
    pick = scored.groupBy("doc_id").agg(
        F.max(F.struct("score", "w")).alias("best"),
        F.max(
            F.when(
                F.col("w") != HRW_REMOVED, F.struct("score", "w")
            )
        ).alias("best_after"),
    )
    placed = pick.select(
        F.col("best.w").alias("w_before"),
        F.col("best_after.w").alias("w_after"),
    )
    return (
        placed.groupBy(F.col("w_after").cast("long").alias("worker"))
        .agg(
            F.sum(
                (F.col("w_before") == F.col("w_after")).cast("long")
            ).alias("n_steady"),
            F.count(F.lit(1)).alias("n_after"),
            F.sum(
                (F.col("w_before") != F.col("w_after")).cast("long")
            ).alias("n_inherited"),
        )
    )


from mini_sql_engine_spark.functions.numeric import NANO as _NANO
from mini_sql_engine_spark.functions.numeric import qsum as _qsum


def mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information (and normalized MI) between document
    language and source — the feature-relevance / leakage probe: how
    many nats does knowing the source tell you about the language?
    MI = Σ_cells (n/N)·ln(n·N/(n_l·n_s)), entropies likewise — every
    term a deterministic double from exact counts, every SUM the
    fixed-point `_qsum` reduction, so the result is bit-stable under
    any aggregation order. NMI = MI / min(H_lang, H_source).

    Scale notes (100 TB): three map-side-combined rollups (cells and
    two margins, each ≤ |domain| rows), margins broadcast back onto
    the cell table, one quantized sum each. Nothing is ever collected
    or single-threaded — contrast an ordered-fold (collect_list +
    aggregate) construction, which funnels terms into one task to pin
    the order; quantization makes order irrelevant instead.
    """
    docs = load_table(spark, sf_dir, "documents").select("lang", "source")
    cells = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n")
    )
    ml = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("nl"))
    ms = docs.groupBy("source").agg(F.count(F.lit(1)).alias("ns"))
    nn = docs.agg(F.count(F.lit(1)).alias("nt"))
    mi_terms = (
        cells.join(F.broadcast(ml), "lang")
        .join(F.broadcast(ms), "source")
        .crossJoin(F.broadcast(nn))
        .select(
            (
                (F.col("n") / F.col("nt"))
                * F.log(
                    (F.col("n").cast("double") * F.col("nt"))
                    / (F.col("nl").cast("double") * F.col("ns"))
                )
            ).alias("t")
        )
    )
    mi = mi_terms.agg(
        _qsum(F.col("t")).alias("mi_q"),
        F.count(F.lit(1)).alias("n_cells"),
    )
    hl = (
        ml.crossJoin(F.broadcast(nn))
        .select(
            (
                -(F.col("nl") / F.col("nt"))
                * F.log(F.col("nl") / F.col("nt"))
            ).alias("t")
        )
        .agg(_qsum(F.col("t")).alias("hl_q"))
    )
    hs = (
        ms.crossJoin(F.broadcast(nn))
        .select(
            (
                -(F.col("ns") / F.col("nt"))
                * F.log(F.col("ns") / F.col("nt"))
            ).alias("t")
        )
        .agg(_qsum(F.col("t")).alias("hs_q"))
    )
    return (
        mi.crossJoin(F.broadcast(hl))
        .crossJoin(F.broadcast(hs))
        .select(
            "n_cells",
            F.round(F.col("mi_q") / _NANO, 6).alias("mi_nats"),
            F.round(F.col("hl_q") / _NANO, 6).alias("h_lang"),
            F.round(F.col("hs_q") / _NANO, 6).alias("h_source"),
            F.round(
                F.col("mi_q")
                / F.least("hl_q", "hs_q").cast("double"),
                6,
            ).alias("nmi"),
        )
    )


def token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of the token distribution per source — the
    vocabulary-diversity gauge (low entropy ⇒ templated/boilerplate
    feeds; high ⇒ diverse natural text), plus perplexity 2^H_bits and
    type count. The Σ p·ln p runs over the full vocabulary via the
    `_qsum` fixed-point reduction, which is what makes a
    many-thousand-term float sum reproducible across engines and
    aggregation orders — the construction the 7-term MI query merely
    demonstrates actually earning its keep here.

    Scale notes (100 TB): (source, token) type counts are map-side
    combined; per-source totals broadcast back; one quantized sum per
    source. The token explosion is the only corpus-sized stage.
    """
    docs = ensure_min_partitions(
        load_table(spark, sf_dir, "documents")
    ).select(
        "source", F.explode(F.split(F.col("text"), r"\s+")).alias("t")
    )
    types = docs.groupBy("source", "t").agg(
        F.count(F.lit(1)).alias("c")
    )
    totals = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    term = -(F.col("c") / F.col("n")) * F.log(
        F.col("c") / F.col("n")
    )
    ent = (
        types.join(F.broadcast(totals), "source")
        .groupBy("source")
        .agg(
            _qsum(term).alias("h_q"),
            F.count(F.lit(1)).alias("n_types"),
        )
        .join(F.broadcast(totals), "source")
    )
    h_nats = F.col("h_q") / _NANO
    return ent.select(
        "source",
        "n",
        "n_types",
        F.round(h_nats, 6).alias("entropy_nats"),
        F.round(
            F.pow(F.lit(2.0), h_nats / F.log(F.lit(2.0))), 4
        ).alias("perplexity"),
    )


def js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen–Shannon divergence between the sources' token
    distributions — the symmetric, bounded ([0, ln 2]) drift metric
    for "are these two feeds the same kind of text", robust where KL
    blows up on vocabulary mismatch. Absent-token terms contribute
    only their present side (the JS definition), so the full-outer
    vocabulary union needs no smoothing. Terms reduce via `_qsum`;
    the normalized column divides by ln 2 → [0, 1].

    Scale notes (100 TB): the (source, token) type table is the only
    corpus-derived input; the pair stage self-joins it ON TOKEN (thin
    rows, set-sized shuffle) so each vocabulary type fans out to at
    most |sources|² pair terms — same member-keyed shape as
    `ext_audience_overlap`.
    """
    tok = ensure_min_partitions(
        load_table(spark, sf_dir, "documents")
    ).select(
        "source", F.explode(F.split(F.col("text"), r"\s+")).alias("t")
    )
    types = tok.groupBy("source", "t").agg(F.count(F.lit(1)).alias("c"))
    totals = tok.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    dist = types.join(F.broadcast(totals), "source").select(
        "source", "t", (F.col("c") / F.col("n")).alias("p")
    )
    # union-vocabulary per PAIR: explode each side's rows to every
    # counterpart source, then full-outer per (pair, token) — a plain
    # full-outer on token alone would cross unrelated sources
    srcs = totals.select(F.col("source").alias("s2"))
    left = (
        dist.crossJoin(F.broadcast(srcs))
        .filter(F.col("source") < F.col("s2"))
        .select(
            F.col("source").alias("sa"),
            F.col("s2").alias("sb"),
            "t",
            F.col("p").alias("pa"),
        )
    )
    right = (
        dist.crossJoin(F.broadcast(srcs))
        .filter(F.col("s2") < F.col("source"))
        .select(
            F.col("s2").alias("sa"),
            F.col("source").alias("sb"),
            "t",
            F.col("p").alias("pb"),
        )
    )
    merged = left.join(right, ["sa", "sb", "t"], "full_outer").select(
        "sa",
        "sb",
        F.coalesce("pa", F.lit(0.0)).alias("p"),
        F.coalesce("pb", F.lit(0.0)).alias("q"),
    )
    term = F.when(
        F.col("p") > 0,
        0.5
        * F.col("p")
        * F.log(2.0 * F.col("p") / (F.col("p") + F.col("q"))),
    ).otherwise(0.0) + F.when(
        F.col("q") > 0,
        0.5
        * F.col("q")
        * F.log(2.0 * F.col("q") / (F.col("p") + F.col("q"))),
    ).otherwise(0.0)
    return (
        merged.groupBy("sa", "sb")
        .agg(_qsum(term).alias("js_q"), F.count(F.lit(1)).alias("n_types"))
        .select(
            "sa",
            "sb",
            "n_types",
            F.round(F.col("js_q") / _NANO, 6).alias("js_nats"),
            F.round(F.col("js_q") / _NANO / F.log(F.lit(2.0)), 6).alias(
                "js_norm"
            ),
        )
    )


def effective_sample_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance-weighting diagnostic: Kish effective sample size
    (Σw)²/Σw² of the length-proportional weights, per language — the
    number that says how many EQUAL-weight documents a weighted
    corpus is actually worth (ess_ratio ≪ 1 ⇒ a few huge docs
    dominate and the weighting scheme is burning data). Entirely
    exact integer moments (w = n_chars), no floats until the final
    ratio.

    Scale notes (100 TB): one map-side-combined moments pass, one row
    per language. DECIMAL(38,0) for Σw² — 10^8 per squared doc-length
    times 10^9 docs overflows a long.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "lang", F.col("n_chars").cast("decimal(19,0)").alias("w")
    )
    m = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("w").alias("sw"),
        F.sum(F.col("w") * F.col("w")).alias("sww"),
    )
    ess = (F.col("sw") * F.col("sw")).cast("double") / F.col(
        "sww"
    ).cast("double")
    return m.select(
        "lang",
        "n_docs",
        F.round(ess, 4).alias("ess"),
        F.round(ess / F.col("n_docs"), 6).alias("ess_ratio"),
    )


SEL_K = 400  # documents selected by the Gumbel draw


def select_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SELECTION counterpart to `pipeline_curate_corpus`: a full
    data-selection pass as ONE Catalyst plan — quality gate → exact
    dedup (fingerprint keeper) → DSIR importance weights on the
    survivors → Gumbel top-K selection ∝ exp(weight) → banded
    serpentine shard packing of the selected set. Every stage is an
    individually-oracled operator; this entry proves the SELECTION
    pack composes end-to-end with no driver materialization. Output:
    the per-shard load sheet a trainer consumes.

    Scale notes (100 TB): the gates shrink what dedup shuffles, dedup
    shrinks what DSIR tokenizes, the 256-row ratio table broadcasts,
    top-K is TakeOrdered, and the shard rank windows partition by
    bit-length band — every stage inherits its standalone operator's
    scale shape, and stages only ever shrink the data.
    """
    from pyspark.sql import Window

    from mini_sql_engine_spark.functions import textfns

    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    toks = F.split("text", r"\s+")
    gated = (
        docs.withColumn("n_toks", F.size(toks))
        .withColumn(
            "dtr",
            F.round(
                F.size(F.array_distinct(toks)) / F.size(toks), 6
            ),
        )
        .filter((F.col("n_toks") >= 8) & (F.col("dtr") >= 0.5))
    )
    keep = (
        gated.select("doc_id", textfns.fingerprint("text").alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
        # thin keeper ids, materialized once: the survivor set feeds
        # BOTH corpus passes below (round-10: uncheckpointed, the
        # fingerprint shuffle re-ran per downstream evaluation)
        .localCheckpoint(eager=False)
    )
    surv = gated.join(keep, "doc_id", "left_semi")
    tok = surv.select(
        "doc_id", "lang", F.explode(toks).alias("t")
    ).select(
        "doc_id", "lang", (md5_long(F.col("t")) % DSIR_BUCKETS).alias("b")
    )
    # ONE aggregation produces both the raw and target bucket counts
    # (the target count as a conditional sum — identical integers to
    # the filtered twin aggregate), materialized at 256 rows: DSIR is
    # then exactly two corpus passes — estimate ratios, weight docs —
    # not five (round-10: raw/tgt/tot/lr each re-ran the explode)
    bc = (
        tok.groupBy("b")
        .agg(
            F.count(F.lit(1)).alias("cr"),
            F.sum(
                (F.col("lang") == DSIR_TARGET_LANG).cast("long")
            ).alias("ct"),
        )
        .localCheckpoint(eager=False)
    )
    tot = bc.agg(F.sum("cr").alias("tr"), F.sum("ct").alias("tt"))
    lr = (
        bc.crossJoin(F.broadcast(tot))
        .select(
            "b",
            F.floor(
                (
                    F.log(
                        (F.coalesce(F.col("ct"), F.lit(0)) + F.lit(1.0))
                        / (F.col("tt") + F.lit(float(DSIR_BUCKETS)))
                    )
                    - F.log(
                        (F.col("cr") + F.lit(1.0))
                        / (F.col("tr") + F.lit(float(DSIR_BUCKETS)))
                    )
                )
                * 1_000_000
                + F.lit(0.5)
            )
            .cast("long")
            .alias("lr_micro"),
        )
    )
    wts = (
        tok.join(F.broadcast(lr), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            # exact integer sum of per-bucket micro-nats: no float
            # accumulation, no -0.0 canonicalization needed
            F.sum("lr_micro").alias("weight_micro"),
        )
    )
    u = (
        md5_long(F.col("doc_id").cast("string"), salt="gumbsel")
        % GUMBEL_RES
        + 0.5
    ) / float(GUMBEL_RES)
    sel = (
        wts.select(
            "doc_id",
            "n_tokens",
            # integer micro key: the Gumbel term rounds to micros per
            # doc BEFORE the subtraction, so the top-K comparator works
            # on exact integers — no cross-engine boundary flips
            (
                F.col("weight_micro")
                - F.floor(F.log(-F.log(u)) * 1_000_000 + F.lit(0.5)).cast(
                    "long"
                )
            ).alias("key_micro"),
        )
        .orderBy(F.col("key_micro").desc(), "doc_id")
        .limit(SEL_K)
    )
    banded = sel.select(
        "doc_id",
        F.when(F.col("n_tokens") <= 1, F.lit(0))
        .otherwise(F.expr("length(bin(n_tokens - 1))"))
        .alias("band"),
        F.col("n_tokens").alias("n_toks"),
    )
    w = Window.partitionBy("band").orderBy(
        F.col("n_toks").desc(), "doc_id"
    )
    placed = banded.withColumn(
        "rn", (F.row_number().over(w) - 1).cast("long")
    ).select(
        "n_toks",
        F.when(
            F.floor(F.col("rn") / N_SHARDS) % 2 == 0,
            F.col("rn") % N_SHARDS,
        )
        .otherwise(N_SHARDS - 1 - F.col("rn") % N_SHARDS)
        .alias("shard"),
    )
    per_shard = placed.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").alias("sum_tokens"),
    )
    stot = per_shard.agg(
        (F.sum("sum_tokens") / F.lit(float(N_SHARDS))).alias("mean_load")
    )
    return per_shard.crossJoin(F.broadcast(stot)).select(
        "shard",
        "n_docs",
        "sum_tokens",
        F.round(
            (F.col("sum_tokens") - F.col("mean_load"))
            * 10000.0
            / F.col("mean_load"),
            2,
        ).alias("dev_bps"),
    )


IPF_ITERS = 3  # full row+column raking rounds (oracle unrolls the same)


def ipf_raking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative proportional fitting (raking): per-(lang, source)
    document weights that simultaneously balance the corpus toward
    UNIFORM language and source marginals — the survey-statistics
    workhorse reused by data-mixture rebalancing (hit per-language
    budgets without abandoning per-source ones; `ext_mixture_weights`
    handles one margin, IPF reconciles two). IPF_ITERS alternating
    row/column scalings; weights re-quantize to 1e-9 after every
    half-step and margin sums run through qsum, so both engines walk
    the identical weight sequence. Output: cell counts, final weight,
    and the weighted count.

    Scale notes (100 TB): the cell table is dimension-bounded
    (|langs|×|sources|) after ONE corpus rollup; every iteration is
    arithmetic + a broadcast join on that constant-size table. The
    only collected scalars are the grand total and margin counts
    (control values).
    """
    docs = load_table(spark, sf_dir, "documents")
    cells = (
        docs.groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("w", F.lit(1.0))
        .localCheckpoint(eager=False)
    )
    tot = cells.agg(
        F.sum("n").alias("N"),
        F.countDistinct("lang").alias("nl"),
        F.countDistinct("source").alias("ns"),
    ).collect()[0]
    n_total, n_lang, n_src = tot["N"], tot["nl"], tot["ns"]
    t_row = n_total / n_lang
    t_col = n_total / n_src

    def _half_step(cur: DataFrame, key: str, target: float) -> DataFrame:
        marg = cur.groupBy(key).agg(
            F.sum(
                F.floor(F.col("w") * F.col("n") * 1_000_000_000 + 0.5).cast(
                    "long"
                )
            ).alias("mq")
        )
        factor = F.lit(target) / (F.col("mq") / 1_000_000_000)
        return (
            cur.join(F.broadcast(marg), key)
            .withColumn(
                "w",
                F.floor(
                    F.col("w") * factor * 1_000_000_000 + 0.5
                ).cast("long")
                / 1_000_000_000,
            )
            .drop("mq")
        )

    for _ in range(IPF_ITERS):
        cells = _half_step(cells, "lang", t_row)
        cells = _half_step(cells, "source", t_col).localCheckpoint(
            eager=False
        )
    return cells.select(
        "lang",
        "source",
        "n",
        F.round("w", 6).alias("w"),
        F.round(F.col("w") * F.col("n"), 4).alias("weighted_n"),
    )


def _ipf_oracle() -> str:
    parts = [
        """
    WITH c0 AS (
        SELECT lang, source, COUNT(*) AS n, CAST(1.0 AS DOUBLE) AS w
        FROM documents GROUP BY lang, source),
    tot AS (
        SELECT CAST(SUM(n) AS BIGINT) AS grand,
               CAST(COUNT(DISTINCT lang) AS BIGINT) AS nl,
               CAST(COUNT(DISTINCT source) AS BIGINT) AS ns
        FROM c0)"""
    ]
    step = 0
    for _ in range(IPF_ITERS):
        for key, tgt in (("lang", "grand / nl"), ("source", "grand / ns")):
            prev = f"c{step}"
            step += 1
            parts.append(f""",
    m{step} AS (
        SELECT {key},
               CAST(SUM(CAST(FLOOR(w * n * 1000000000 + 0.5) AS BIGINT))
                    AS BIGINT) AS mq
        FROM {prev} GROUP BY {key}),
    c{step} AS (
        SELECT p.lang, p.source, p.n,
               FLOOR(p.w * (({tgt}) / (m.mq / 1000000000))
                     * 1000000000 + 0.5) / 1000000000 AS w
        FROM {prev} p
        JOIN m{step} m ON m.{key} = p.{key}
        CROSS JOIN tot)""")
    parts.append(f"""
    SELECT lang, source, n, ROUND(w, 6) AS w,
           ROUND(w * n, 4) AS weighted_n
    FROM c{step}""")
    return "".join(parts)


NEY_BUDGET = 200  # total samples to allocate across strata
NEY_RES = 1000  # weight quantization (milli-units) before apportionment


def neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal stratified sampling allocation: split a labeling
    or QA budget of NEY_BUDGET across language strata proportional to
    N_h·S_h (stratum size × stratum std of token count) — the
    variance-minimizing allocation for estimating the corpus mean,
    versus the naive proportional split (emitted alongside; the gap
    between the columns is the payoff of measuring spread before
    spending annotation money). Integer seats are assigned by
    largest-remainder (Hamilton) apportionment, so the allocation
    sums to the budget EXACTLY.

    Determinism: each stratum's weight quantizes ONCE —
    floor(N·S·1000 + 0.5), with S the sqrt of a ratio of exact
    BIGINT moment terms — and everything after (totals, floor
    quotas, remainders, the leftover-seat ranking with lang
    tie-break) is pure integer arithmetic both engines replay.

    Scale notes (100 TB): one map-side-combinable moment rollup to
    |strata| rows; apportionment runs entirely on that tiny table.
    """
    from pyspark.sql import Window

    mom = (
        ensure_min_partitions(load_table(spark, sf_dir, "documents"))
        .select(
            "lang",
            F.size(F.split("text", r"\s+")).cast("long").alias("x"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
        )
    )
    s_h = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
            "double"
        )
        / (F.col("n") * (F.col("n") - 1)).cast("double")
    )
    wq = mom.select(
        "lang",
        "n",
        F.floor(F.col("n").cast("double") * s_h * NEY_RES + 0.5)
        .cast("long")
        .alias("wq"),
    )
    tot = wq.agg(
        F.sum("wq").alias("tw"), F.sum("n").alias("tn")
    )
    base = wq.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n",
        F.expr(f"({NEY_BUDGET} * wq) div tw").alias("base_ney"),
        F.expr(f"({NEY_BUDGET} * wq) % tw").alias("rem_ney"),
        F.expr(f"({NEY_BUDGET} * n) div tn").alias("base_prop"),
        F.expr(f"({NEY_BUDGET} * n) % tn").alias("rem_prop"),
        "tw",
        "tn",
    )
    # bounded global windows: one row per language (<= |langs|)
    wn = Window.orderBy(F.col("rem_ney").desc(), "lang")
    wp = Window.orderBy(F.col("rem_prop").desc(), "lang")
    tots2 = base.agg(
        (F.lit(NEY_BUDGET) - F.sum("base_ney")).alias("left_ney"),
        (F.lit(NEY_BUDGET) - F.sum("base_prop")).alias("left_prop"),
    )
    return (
        base.withColumn("rk_ney", F.row_number().over(wn).cast("long"))
        .withColumn("rk_prop", F.row_number().over(wp).cast("long"))
        .crossJoin(F.broadcast(tots2))
        .select(
            "lang",
            F.col("n").alias("n_stratum"),
            (
                F.col("base_ney")
                + (F.col("rk_ney") <= F.col("left_ney")).cast("long")
            ).alias("neyman_alloc"),
            (
                F.col("base_prop")
                + (F.col("rk_prop") <= F.col("left_prop")).cast("long")
            ).alias("prop_alloc"),
        )
    )


CURRICULUM_STOPWORDS = [
    "the", "a", "an", "of", "and", "or", "to", "in", "is", "for",
]  # = functions.textfns.STOPWORDS; inlined for the oracle f-string


def curriculum_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum construction by quality tier under token budgets —
    the data-ORDERING op of a pretraining run (easy/fluent first):
    rank documents by stopword-ratio fluency (descending, doc_id
    tie-break — a unique composite), then cut the ranked stream into
    three phases at CUMULATIVE-TOKEN-share boundaries (20% / 50% /
    rest), not document counts — phases are compute budgets, and
    compute is tokens. Output per phase: docs, token mass, and the
    fluency band it spans.

    All-integer arithmetic end to end: sw_ppm = (stopword_count *
    1e6) div tokens, inclusive cumulative token sums, integer-product
    phase comparisons — hash-exact across engines.

    Scale notes (100 TB): the global order rides ``range_prefix``
    (range-partitioned ladder, no single-partition window); the total
    token mass is a 1-row broadcast; the phase rollup is a 3-group
    aggregate. The oracle replays the same order with a window
    cumulative sum."""
    from mini_sql_engine_spark.functions import textfns
    from mini_sql_engine_spark.functions.ranking import range_prefix

    docs = load_table(spark, sf_dir, "documents")
    toks = textfns.tokens("text")
    scored = docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("nt"),
        F.expr(
            "(size(filter(split(text, '\\\\s+'), "
            "t -> array_contains(array("
            + ", ".join(f"'{s}'" for s in CURRICULUM_STOPWORDS)
            + "), t))) * CAST(1000000 AS BIGINT)) "
            "div greatest(size(split(text, '\\\\s+')), 1)"
        ).alias("sw_ppm"),
    ).withColumn("neg_sw", -F.col("sw_ppm"))
    ranked = range_prefix(
        scored, ["neg_sw", "doc_id"], sum_cols=("nt",)
    )
    total = scored.agg(F.sum("nt").cast("long").alias("total_nt"))
    phased = ranked.crossJoin(F.broadcast(total)).select(
        "nt",
        "sw_ppm",
        F.when(F.col("cum_nt") * 5 <= F.col("total_nt"), F.lit(1))
        .when(F.col("cum_nt") * 2 <= F.col("total_nt"), F.lit(2))
        .otherwise(F.lit(3))
        .cast("long")
        .alias("phase"),
    )
    return phased.groupBy("phase").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("nt").cast("long").alias("phase_tokens"),
        F.min("sw_ppm").alias("min_sw_ppm"),
        F.max("sw_ppm").alias("max_sw_ppm"),
    )


QUERIES: dict[str, Callable] = {
    "ext_curriculum_schedule": curriculum_schedule,
    "ext_neyman_allocation": neyman_allocation,
    "ext_ipf_raking": ipf_raking,
    "pipeline_select_shards": select_shards,
    "ext_js_divergence": js_divergence,
    "ext_effective_sample_size": effective_sample_size,
    "ext_token_entropy": token_entropy,
    "ext_mutual_information": mutual_information,
    "ext_rendezvous_routing": rendezvous_routing,
    "ext_nucleus_selection": nucleus_selection,
    "ext_gumbel_topk": gumbel_topk,
    "ext_shard_assignment": shard_assignment,
    "ext_dsir_weights": dsir_weights,
    "ext_stratified_split": stratified_split,
    "ext_length_buckets": length_bucket_padding,
    "pipeline_curate_corpus": curate_corpus,
    "ext_pack_sequences": pack_sequences,
    "ext_temperature_sample": temperature_sample,
    "ext_mixture_weights": mixture_weights,
    "ext_emb_centroids": emb_centroids,
    "ext_emb_quantize": emb_quantize,
    "ext_stratified_sample": stratified_sample,
    "ext_salted_join": salted_user_revenue,
    "ext_aqe_skew_join": aqe_skew_join,
}

_HASH = "CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)"
_PCT_CASE = " ".join(
    f"WHEN lang = '{lang}' THEN {p}" for lang, p in _LANG_PCT.items()
)

_CURRICULUM_SW_LIST = (
    "[" + ", ".join(f"'{s}'" for s in CURRICULUM_STOPWORDS) + "]"
)

ORACLES: dict[str, str] = {
    "ext_curriculum_schedule": rf"""
        WITH t AS (
            SELECT doc_id,
                   len(string_split_regex(text, '\s+')) AS nt,
                   (len(list_filter(string_split_regex(text, '\s+'),
                        t -> list_contains({_CURRICULUM_SW_LIST}, t)))
                    * 1000000)
                   // greatest(len(string_split_regex(text, '\s+')), 1)
                       AS sw_ppm
            FROM documents),
        c AS (
            SELECT nt, sw_ppm,
                   SUM(nt) OVER (ORDER BY sw_ppm DESC, doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum_nt,
                   SUM(nt) OVER () AS total_nt
            FROM t),
        p AS (
            SELECT nt, sw_ppm,
                   CASE WHEN cum_nt * 5 <= total_nt THEN 1
                        WHEN cum_nt * 2 <= total_nt THEN 2
                        ELSE 3 END AS phase
            FROM c)
        SELECT CAST(phase AS BIGINT) AS phase,
               COUNT(*) AS n_docs,
               CAST(SUM(nt) AS BIGINT) AS phase_tokens,
               CAST(MIN(sw_ppm) AS BIGINT) AS min_sw_ppm,
               CAST(MAX(sw_ppm) AS BIGINT) AS max_sw_ppm
        FROM p GROUP BY phase
    """,
    "ext_neyman_allocation": rf"""
        WITH mom AS (
            SELECT lang, COUNT(*) AS n,
                   CAST(SUM(x) AS BIGINT) AS sx,
                   CAST(SUM(x * x) AS BIGINT) AS sxx
            FROM (SELECT lang,
                         CAST(len(string_split_regex(text, '\s+'))
                              AS BIGINT) AS x
                  FROM documents)
            GROUP BY lang),
        wq AS (
            SELECT lang, n,
                   CAST(FLOOR(CAST(n AS DOUBLE)
                        * SQRT(CAST(n * sxx - sx * sx AS DOUBLE)
                               / CAST(n * (n - 1) AS DOUBLE))
                        * {NEY_RES} + 0.5) AS BIGINT) AS wq
            FROM mom),
        tot AS (SELECT CAST(SUM(wq) AS BIGINT) AS tw,
                       CAST(SUM(n) AS BIGINT) AS tn FROM wq),
        base AS (
            SELECT lang, n,
                   ({NEY_BUDGET} * wq) // tw AS base_ney,
                   ({NEY_BUDGET} * wq) % tw AS rem_ney,
                   ({NEY_BUDGET} * n) // tn AS base_prop,
                   ({NEY_BUDGET} * n) % tn AS rem_prop
            FROM wq CROSS JOIN tot),
        lefts AS (
            SELECT {NEY_BUDGET} - CAST(SUM(base_ney) AS BIGINT)
                       AS left_ney,
                   {NEY_BUDGET} - CAST(SUM(base_prop) AS BIGINT)
                       AS left_prop
            FROM base),
        ranked AS (
            SELECT *,
                   CAST(ROW_NUMBER() OVER (ORDER BY rem_ney DESC, lang)
                        AS BIGINT) AS rk_ney,
                   CAST(ROW_NUMBER() OVER (ORDER BY rem_prop DESC, lang)
                        AS BIGINT) AS rk_prop
            FROM base)
        SELECT lang, n AS n_stratum,
               base_ney + CAST(rk_ney <= left_ney AS BIGINT)
                   AS neyman_alloc,
               base_prop + CAST(rk_prop <= left_prop AS BIGINT)
                   AS prop_alloc
        FROM ranked CROSS JOIN lefts
    """,
    "ext_ipf_raking": _ipf_oracle(),
    "pipeline_select_shards": rf"""
        WITH toksed AS (
            SELECT doc_id, lang, text,
                   string_split_regex(text, '\s+') AS toks
            FROM documents),
        gated AS (
            SELECT doc_id, lang, text, toks, len(toks) AS n_toks
            FROM toksed
            WHERE len(toks) >= 8
              AND ROUND(len(list_distinct(toks)) * 1.0 / len(toks), 6)
                  >= 0.5),
        keep AS (
            SELECT MIN(doc_id) AS doc_id
            FROM (SELECT doc_id,
                         md5(regexp_replace(trim(lower(text)),
                                            '\s+', ' ', 'g')) AS fp
                  FROM gated) f
            GROUP BY fp),
        surv AS (SELECT g.* FROM gated g
                 WHERE doc_id IN (SELECT doc_id FROM keep)),
        tok AS (
            SELECT doc_id, lang,
                   CAST('0x' || substr(md5(t), 1, 15) AS BIGINT)
                       % {DSIR_BUCKETS} AS b
            FROM (SELECT doc_id, lang, UNNEST(toks) AS t FROM surv)),
        raw AS (SELECT b, COUNT(*) AS cr FROM tok GROUP BY b),
        tgt AS (SELECT b, COUNT(*) AS ct FROM tok
                WHERE lang = '{DSIR_TARGET_LANG}' GROUP BY b),
        tot AS (SELECT (SELECT SUM(cr) FROM raw) AS tr,
                       (SELECT SUM(ct) FROM tgt) AS tt),
        lr AS (
            SELECT raw.b,
                   CAST(FLOOR((
                       LN((COALESCE(ct, 0) + 1.0) / (tt + {DSIR_BUCKETS}.0))
                     - LN((cr + 1.0) / (tr + {DSIR_BUCKETS}.0))
                   ) * 1000000 + 0.5) AS BIGINT) AS lr_micro
            FROM raw LEFT JOIN tgt ON raw.b = tgt.b CROSS JOIN tot),
        wts AS (
            SELECT doc_id, COUNT(*) AS n_tokens,
                   CAST(SUM(lr_micro) AS BIGINT) AS weight_micro
            FROM tok JOIN lr USING (b) GROUP BY doc_id),
        sel AS (
            SELECT doc_id, n_tokens,
                   weight_micro - CAST(FLOOR(
                       LN(-LN((CAST('0x' || substr(md5('gumbsel:'
                              || CAST(doc_id AS VARCHAR)), 1, 15)
                           AS BIGINT) % {GUMBEL_RES} + 0.5)
                         / {GUMBEL_RES}.0)) * 1000000 + 0.5) AS BIGINT)
                       AS key_micro
            FROM wts ORDER BY key_micro DESC, doc_id LIMIT {SEL_K}),
        banded AS (
            SELECT doc_id,
                   CASE WHEN n_tokens <= 1 THEN 0
                        ELSE len(bin(n_tokens - 1)) END AS band,
                   n_tokens AS n_toks
            FROM sel),
        placed AS (
            SELECT n_toks,
                   ROW_NUMBER() OVER (PARTITION BY band
                                      ORDER BY n_toks DESC, doc_id)
                       - 1 AS rn
            FROM banded),
        sharded AS (
            SELECT n_toks,
                   CASE WHEN (rn // {N_SHARDS}) % 2 = 0
                        THEN rn % {N_SHARDS}
                        ELSE {N_SHARDS} - 1 - rn % {N_SHARDS}
                   END AS shard
            FROM placed),
        per_shard AS (
            SELECT shard, COUNT(*) AS n_docs,
                   CAST(SUM(n_toks) AS BIGINT) AS sum_tokens
            FROM sharded GROUP BY shard),
        stot AS (SELECT SUM(sum_tokens) / {N_SHARDS}.0 AS mean_load
                 FROM per_shard)
        SELECT shard, n_docs, sum_tokens,
               ROUND((sum_tokens - mean_load) * 10000.0 / mean_load, 2)
                   AS dev_bps
        FROM per_shard CROSS JOIN stot
    """,
    "ext_js_divergence": rf"""
        WITH tok AS (
            SELECT source, UNNEST(string_split_regex(text, '\s+')) AS t
            FROM documents),
        types AS (SELECT source, t, COUNT(*) AS c
                  FROM tok GROUP BY 1, 2),
        totals AS (SELECT source, COUNT(*) AS n FROM tok GROUP BY 1),
        dist AS (
            SELECT source, t, c / n AS p
            FROM types JOIN totals USING (source)),
        srcs AS (SELECT source AS s2 FROM totals),
        l AS (
            SELECT source AS sa, s2 AS sb, t, p AS pa
            FROM dist CROSS JOIN srcs WHERE source < s2),
        r AS (
            SELECT s2 AS sa, source AS sb, t, p AS pb
            FROM dist CROSS JOIN srcs WHERE s2 < source),
        merged AS (
            SELECT COALESCE(l.sa, r.sa) AS sa,
                   COALESCE(l.sb, r.sb) AS sb,
                   COALESCE(pa, 0.0) AS p, COALESCE(pb, 0.0) AS q
            FROM l FULL OUTER JOIN r
              ON l.sa = r.sa AND l.sb = r.sb AND l.t = r.t),
        terms AS (
            SELECT sa, sb,
                   (CASE WHEN p > 0
                         THEN 0.5 * p * LN(2.0 * p / (p + q))
                         ELSE 0.0 END
                    + CASE WHEN q > 0
                           THEN 0.5 * q * LN(2.0 * q / (p + q))
                           ELSE 0.0 END) AS term
            FROM merged),
        agg AS (
            SELECT sa, sb,
                   CAST(SUM(CAST(FLOOR(term * {_NANO} + 0.5)
                                 AS BIGINT)) AS BIGINT) AS js_q,
                   COUNT(*) AS n_types
            FROM terms GROUP BY 1, 2)
        SELECT sa, sb, n_types,
               ROUND(js_q / {_NANO}, 6) AS js_nats,
               ROUND(js_q / {_NANO} / LN(2.0), 6) AS js_norm
        FROM agg
    """,
    "ext_effective_sample_size": """
        WITH m AS (
            SELECT lang, COUNT(*) AS n_docs,
                   CAST(SUM(CAST(n_chars AS HUGEINT)) AS HUGEINT)
                       AS sw,
                   CAST(SUM(CAST(n_chars AS HUGEINT)
                            * CAST(n_chars AS HUGEINT)) AS HUGEINT)
                       AS sww
            FROM documents GROUP BY lang)
        SELECT lang, n_docs,
               ROUND(CAST(sw * sw AS DOUBLE) / CAST(sww AS DOUBLE), 4)
                   AS ess,
               ROUND(CAST(sw * sw AS DOUBLE) / CAST(sww AS DOUBLE)
                     / n_docs, 6) AS ess_ratio
        FROM m
    """,
    "ext_token_entropy": rf"""
        WITH tok AS (
            SELECT source, UNNEST(string_split_regex(text, '\s+')) AS t
            FROM documents),
        types AS (SELECT source, t, COUNT(*) AS c
                  FROM tok GROUP BY 1, 2),
        totals AS (SELECT source, COUNT(*) AS n FROM tok GROUP BY 1),
        ent AS (
            SELECT source,
                   CAST(SUM(CAST(FLOOR(-(c / n) * LN(c / n)
                            * {_NANO} + 0.5) AS BIGINT)) AS BIGINT)
                       AS h_q,
                   COUNT(*) AS n_types
            FROM types JOIN totals USING (source)
            GROUP BY source)
        SELECT ent.source, n, n_types,
               ROUND(h_q / {_NANO}, 6) AS entropy_nats,
               ROUND(POW(2.0, h_q / {_NANO} / LN(2.0)), 4)
                   AS perplexity
        FROM ent JOIN totals USING (source)
    """,
    "ext_mutual_information": f"""
        WITH d AS (SELECT lang, source FROM documents),
        cells AS (SELECT lang, source, COUNT(*) AS n
                  FROM d GROUP BY 1, 2),
        ml AS (SELECT lang, COUNT(*) AS nl FROM d GROUP BY 1),
        ms AS (SELECT source, COUNT(*) AS ns FROM d GROUP BY 1),
        nn AS (SELECT COUNT(*) AS nt FROM d),
        mi AS (
            SELECT CAST(SUM(CAST(FLOOR((n / nt)
                       * LN((CAST(n AS DOUBLE) * nt)
                            / (CAST(nl AS DOUBLE) * ns))
                       * {_NANO} + 0.5) AS BIGINT)) AS BIGINT) AS mi_q,
                   COUNT(*) AS n_cells
            FROM cells JOIN ml USING (lang) JOIN ms USING (source)
            CROSS JOIN nn),
        hl AS (
            SELECT CAST(SUM(CAST(FLOOR(-(nl / nt) * LN(nl / nt)
                       * {_NANO} + 0.5) AS BIGINT)) AS BIGINT) AS hl_q
            FROM ml CROSS JOIN nn),
        hs AS (
            SELECT CAST(SUM(CAST(FLOOR(-(ns / nt) * LN(ns / nt)
                       * {_NANO} + 0.5) AS BIGINT)) AS BIGINT) AS hs_q
            FROM ms CROSS JOIN nn)
        SELECT n_cells,
               ROUND(mi_q / {_NANO}, 6) AS mi_nats,
               ROUND(hl_q / {_NANO}, 6) AS h_lang,
               ROUND(hs_q / {_NANO}, 6) AS h_source,
               ROUND(mi_q / CAST(LEAST(hl_q, hs_q) AS DOUBLE), 6)
                   AS nmi
        FROM mi CROSS JOIN hl CROSS JOIN hs
    """,
    "ext_rendezvous_routing": f"""
        WITH scored AS (
            SELECT doc_id, w,
                   CAST('0x' || substr(md5('hrw:'
                            || CAST(doc_id AS VARCHAR) || '#'
                            || CAST(w AS VARCHAR)), 1, 15)
                        AS BIGINT) AS score
            FROM documents
            CROSS JOIN (SELECT UNNEST(range({HRW_WORKERS})) AS w)),
        before AS (
            SELECT doc_id, w AS w_before
            FROM (SELECT doc_id, w,
                         ROW_NUMBER() OVER (PARTITION BY doc_id
                                            ORDER BY score DESC, w DESC)
                             AS rn
                  FROM scored)
            WHERE rn = 1),
        after AS (
            SELECT doc_id, w AS w_after
            FROM (SELECT doc_id, w,
                         ROW_NUMBER() OVER (PARTITION BY doc_id
                                            ORDER BY score DESC, w DESC)
                             AS rn
                  FROM scored WHERE w != {HRW_REMOVED})
            WHERE rn = 1)
        SELECT w_after AS worker,
               CAST(SUM(CASE WHEN w_before = w_after
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_steady,
               COUNT(*) AS n_after,
               CAST(SUM(CASE WHEN w_before != w_after
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_inherited
        FROM before JOIN after USING (doc_id)
        GROUP BY w_after
    """,
    "ext_nucleus_selection": f"""
        WITH flagged AS (
            SELECT lang, n_chars AS toks,
                   CASE WHEN (SUM(n_chars) OVER (
                                  PARTITION BY lang
                                  ORDER BY n_chars DESC, doc_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) - n_chars) * 100
                             < SUM(n_chars) OVER (PARTITION BY lang)
                               * {NUCLEUS_PCT}
                        THEN 1 ELSE 0 END AS keep
            FROM documents)
        SELECT lang, COUNT(*) AS n_docs,
               CAST(SUM(keep) AS BIGINT) AS n_kept,
               CAST(SUM(toks) AS BIGINT) AS total_tokens,
               CAST(SUM(keep * toks) AS BIGINT) AS kept_tokens,
               ROUND(SUM(keep * toks) * 100.0 / SUM(toks), 4)
                   AS kept_share_pct
        FROM flagged GROUP BY lang
    """,
    "ext_gumbel_topk": f"""
        WITH scored AS (
            SELECT doc_id, lang, n_chars,
                   LN(n_chars * 1.0)
                   - LN(-LN((CAST('0x' || substr(md5('gumbel:'
                                 || CAST(doc_id AS VARCHAR)), 1, 15)
                              AS BIGINT) % {GUMBEL_RES} + 0.5)
                            / {GUMBEL_RES}.0)) AS key
            FROM documents),
        topk AS (SELECT * FROM scored
                 ORDER BY key DESC, doc_id LIMIT {GUMBEL_K})
        SELECT ROW_NUMBER() OVER (ORDER BY key DESC, doc_id) AS rank,
               doc_id, lang, n_chars, ROUND(key, 4) AS gumbel_key
        FROM topk
    """,
    "ext_shard_assignment": f"""
        WITH docs AS (
            SELECT doc_id,
                   CASE WHEN n_chars <= 1 THEN 0
                        ELSE len(bin(n_chars - 1)) END AS band,
                   n_chars AS n_toks
            FROM documents),
        placed AS (
            SELECT n_toks,
                   ROW_NUMBER() OVER (PARTITION BY band
                                      ORDER BY n_toks DESC, doc_id)
                       - 1 AS rn
            FROM docs),
        sharded AS (
            SELECT n_toks,
                   CASE WHEN (rn // {N_SHARDS}) % 2 = 0
                        THEN rn % {N_SHARDS}
                        ELSE {N_SHARDS} - 1 - rn % {N_SHARDS}
                   END AS shard
            FROM placed),
        per_shard AS (
            SELECT shard, COUNT(*) AS n_docs,
                   CAST(SUM(n_toks) AS BIGINT) AS sum_tokens
            FROM sharded GROUP BY shard),
        tot AS (SELECT SUM(sum_tokens) / {N_SHARDS}.0 AS mean_load
                FROM per_shard)
        SELECT shard, n_docs, sum_tokens,
               ROUND((sum_tokens - mean_load) * 10000.0 / mean_load, 2)
                   AS dev_bps
        FROM per_shard CROSS JOIN tot
    """,
    "ext_dsir_weights": rf"""
        WITH tok AS (
            SELECT doc_id, lang,
                   CAST('0x' || substr(md5(t), 1, 15) AS BIGINT)
                       % {DSIR_BUCKETS} AS b
            FROM (SELECT doc_id, lang,
                         UNNEST(string_split_regex(text, '\s+')) AS t
                  FROM documents)),
        raw AS (SELECT b, COUNT(*) AS cr FROM tok GROUP BY b),
        tgt AS (SELECT b, COUNT(*) AS ct FROM tok
                WHERE lang = '{DSIR_TARGET_LANG}' GROUP BY b),
        tot AS (SELECT (SELECT SUM(cr) FROM raw) AS tr,
                       (SELECT SUM(ct) FROM tgt) AS tt),
        lr AS (
            SELECT raw.b,
                   CAST(FLOOR((
                       LN((COALESCE(ct, 0) + 1.0) / (tt + {DSIR_BUCKETS}.0))
                     - LN((cr + 1.0) / (tr + {DSIR_BUCKETS}.0))
                   ) * 1000000 + 0.5) AS BIGINT) AS lr_micro
            FROM raw LEFT JOIN tgt ON raw.b = tgt.b CROSS JOIN tot)
        SELECT doc_id, COUNT(*) AS n_tokens,
               CAST(SUM(lr_micro) AS BIGINT) AS weight_micro
        FROM tok JOIN lr USING (b)
        GROUP BY doc_id
    """,
    "ext_stratified_split": f"""
        WITH ranked AS (
            SELECT lang, source,
                   ROW_NUMBER() OVER (
                       PARTITION BY lang, source
                       ORDER BY CAST(('0x' || substr(md5('strat:'
                                     || CAST(doc_id AS VARCHAR)), 1, 15))
                                AS BIGINT), doc_id) AS rnk,
                   COUNT(*) OVER (PARTITION BY lang, source) AS n
            FROM documents)
        SELECT lang, source,
               CASE WHEN rnk * 100 <= n * {SPLIT_TRAIN_PCT2} THEN 'train'
                    WHEN rnk * 100 <= n * {SPLIT_VAL_PCT2} THEN 'val'
                    ELSE 'test' END AS split,
               COUNT(*) AS n_docs
        FROM ranked GROUP BY 1, 2, 3
    """,
    "ext_length_buckets": r"""
        WITH sized AS (
            SELECT len(string_split_regex(text, '\s+')) AS n_tok
            FROM documents),
        bucketed AS (
            SELECT n_tok,
                   CASE WHEN n_tok <= 1 THEN 1
                        ELSE CAST(1 << len(bin(n_tok - 1)) AS BIGINT)
                   END AS bucket
            FROM sized),
        agg AS (
            SELECT bucket, COUNT(*) AS n_docs,
                   CAST(SUM(n_tok) AS BIGINT) AS sum_tokens
            FROM bucketed GROUP BY bucket)
        SELECT bucket, n_docs, sum_tokens,
               bucket * n_docs AS capacity,
               ROUND((bucket * n_docs - sum_tokens) * 100.0
                     / (bucket * n_docs), 4) AS waste_pct
        FROM agg
    """,
    "ext_pack_sequences": r"""
        SELECT lang, pack_id, COUNT(*) AS n_docs,
               CAST(SUM(n_toks) AS BIGINT) AS sum_tokens,
               MIN(doc_id) AS first_doc
        FROM (
            SELECT lang, doc_id, n_toks,
                   CAST(FLOOR((SUM(n_toks) OVER (
                        PARTITION BY lang ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) - n_toks) / 512.0) AS BIGINT) AS pack_id
            FROM (SELECT lang, doc_id,
                         len(string_split_regex(text, '\s+')) AS n_toks
                  FROM documents) tok) packed
        GROUP BY lang, pack_id
    """,
    "ext_mixture_weights": r"""
        WITH per_source AS (
            SELECT source,
                   CAST(SUM(len(string_split_regex(text, '\s+'))) AS BIGINT)
                       AS source_tokens,
                   COUNT(*) AS n_docs
            FROM documents GROUP BY source)
        SELECT source, n_docs, source_tokens,
               LEAST(1.0,
                     (SELECT SUM(source_tokens) FROM per_source) * 1.0
                     / ((SELECT COUNT(*) FROM per_source) * source_tokens))
                   AS sample_rate
        FROM per_source
    """,
    "ext_temperature_sample": """
        SELECT doc_id, lang, n_chars,
               SQRT(n_chars * 1.0 / (SELECT MAX(n_chars) FROM documents))
                   AS p_keep
        FROM documents
        WHERE (CAST('0x' || substr(md5('temp:' || CAST(doc_id AS VARCHAR)),
                                   1, 15) AS BIGINT) % 10000) / 10000.0
              < SQRT(n_chars * 1.0 / (SELECT MAX(n_chars) FROM documents))
    """,
    "pipeline_curate_corpus": r"""
        WITH toksed AS (
            SELECT doc_id, lang, source, text,
                   string_split_regex(text, '\s+') AS toks
            FROM documents),
        q AS (
            SELECT doc_id, lang, source, text, toks, len(toks) AS n_toks
            FROM toksed
            WHERE len(toks) >= 8
              AND ROUND(len(list_distinct(toks)) * 1.0 / len(toks), 6) >= 0.5
              AND lang IN ('en', 'fr', 'es')),
        ek AS (
            SELECT MIN(doc_id) AS doc_id
            FROM (SELECT doc_id,
                         md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'))
                             AS fp
                  FROM q) f
            GROUP BY fp),
        s1 AS (SELECT q.* FROM q WHERE doc_id IN (SELECT doc_id FROM ek)),
        base AS (
            SELECT doc_id,
                   list_distinct([array_to_string(toks[i:i+2], ' ')
                                  for i in range(1, len(toks) - 1)]) AS sh
            FROM s1),
        ex AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS shingle FROM base),
        pairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n AS na, b.n AS nb,
                   COUNT(*) AS inter
            FROM ex a JOIN ex b
              ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2, 3, 4),
        dropped AS (
            SELECT DISTINCT doc_b AS doc_id FROM pairs
            WHERE ROUND(inter * 1.0 / (na + nb - inter), 6) >= 0.2),
        s2 AS (SELECT * FROM s1
               WHERE doc_id NOT IN (SELECT doc_id FROM dropped))
        SELECT lang, source, COUNT(*) AS n_docs,
               CAST(SUM(n_toks) AS BIGINT) AS total_tokens
        FROM s2 GROUP BY lang, source
    """,
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
    "ext_aqe_skew_join": """
        WITH ev AS (
            SELECT CASE WHEN user_id % 4 <> 0 THEN 1 ELSE user_id END
                       AS user_id,
                   value
            FROM events WHERE event_type = 'purchase'
        )
        SELECT c_nationkey, COUNT(*) AS n_purchases,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE)
                   AS revenue
        FROM ev JOIN customer ON ev.user_id = c_custkey
        GROUP BY c_nationkey
    """,
}
