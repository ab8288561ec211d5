"""Corpus-curation operators: boilerplate removal, PII scrubbing,
column profiling, robust outlier filtering, embedding QA.

The reference engine has none of these (SURVEY.md §2.1 covers only
scan/filter/join/agg); they are the training-data-pipeline extension
surface the driver mandates alongside dedup/similarity/text
(SURVEY.md §2.2 X rows). Everything here is expression-only Catalyst
code — no Python UDFs anywhere in this module.

Scale notes (100 TB):
- boilerplate: the gram→document-frequency count is the only wide
  shuffle, and it ships (gram, partial count) pairs after map-side
  aggregation; the resulting hot-gram set is tiny BY CONSTRUCTION
  (only grams repeated across ≥ BOILER_DF docs survive) and is
  broadcast back, so the corpus side never shuffles its exploded grams
  a second time;
- PII scrub is a pure per-row projection (regexp) + one thin grouped
  agg — embarrassingly parallel;
- data profile is ONE scan with composed aggregates (count/distinct/
  min/max for every column in a single partial-agg pass), then a
  constant-width unpivot of the single result row;
- outlier filter: group medians/MADs are two grouped aggs over the
  (lang, source) key — group count is small, so the med/MAD tables
  broadcast back to the doc side; the doc side shuffles twice on the
  same key (AQE coalesces the tiny exchanges);
- embedding QA: norms are computed JVM-side with F.aggregate over the
  float array (no Python, no explode), then one grouped agg on label.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from mini_sql_engine_spark.catalog import ensure_min_partitions, load_table
from mini_sql_engine_spark.functions import textfns

# A gram is "boilerplate" when it recurs across at least this many
# distinct documents — the n-gram form of the repeated-line removal
# used on web crawls (headers, nav bars, license blurbs).
BOILER_DF = 4
BOILER_N = 3  # gram width, matches text.decontaminate's NGRAM_N

PII_NUM_RE = "[0-9]+"  # digit runs in event props stand in for PII ids


def _doc_grams(docs: DataFrame) -> DataFrame:
    """(doc_id, gram) pairs, grams distinct within each doc."""
    toks = textfns.tokens("text")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (BOILER_N - 1)),
        lambda i: F.array_join(F.slice(toks, i, BOILER_N), " "),
    )
    return docs.filter(F.size(toks) >= BOILER_N).select(
        "doc_id", F.explode(F.array_distinct(grams)).alias("gram")
    )


def boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document boilerplate exposure: how many of a doc's distinct
    3-grams recur across ≥ BOILER_DF documents corpus-wide.

    Output: (doc_id, n_grams, n_boiler, boiler_ratio) — the filter a
    curation pipeline applies before training (drop or trim docs whose
    ratio exceeds a policy threshold).
    """
    # spread the gram explosion across cores (single-split local scan
    # otherwise; no-op at scale where the scan is already many splits)
    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    pairs = _doc_grams(docs).localCheckpoint(
        eager=False  # feeds both the df-count and per-doc sides once
    )
    hot = (
        pairs.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("df"))  # pairs are doc-distinct
        .filter(F.col("df") >= BOILER_DF)
        .select("gram")
    )
    per_doc = pairs.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    boiler = (
        pairs.join(F.broadcast(hot), "gram", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_boiler"))
    )
    return (
        per_doc.join(boiler, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            F.coalesce("n_boiler", F.lit(0)).alias("n_boiler"),
            F.round(
                F.coalesce("n_boiler", F.lit(0)) / F.col("n_grams"), 4
            ).alias("boiler_ratio"),
        )
    )


def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redaction accounting over event payloads: count digit-run "ids"
    in props, replace them with a <NUM> sentinel, report per event type.

    Output: (event_type, n_events, n_redactions, avg_scrubbed_len).
    The scrub itself is `regexp_replace`; production would persist the
    scrubbed column — here the grouped stats prove both the match count
    and the rewritten text agree with the oracle byte-for-byte.
    """
    events = load_table(spark, sf_dir, "events")
    scrubbed = events.select(
        "event_type",
        F.size(F.regexp_extract_all("props", F.lit(PII_NUM_RE), F.lit(0))).alias(
            "n_red"
        ),
        F.length(F.regexp_replace("props", PII_NUM_RE, "<NUM>")).alias("slen"),
    )
    return scrubbed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("n_red").alias("n_redactions"),
        F.round(F.avg("slen"), 4).alias("avg_scrubbed_len"),
    )


_PROFILE_COLS = ("l_orderkey", "l_quantity", "l_extendedprice", "l_discount")


def data_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass column profile of lineitem's numeric columns: row count,
    distinct count, min, max per column — the schema-drift /
    data-quality summary every ingestion pipeline runs first.

    All aggregates compose into a SINGLE scan (one partial-agg pass,
    one 1-row result), then a constant-width stack() unpivots to the
    (col_name, n_rows, n_distinct, min_val, max_val) long form. No
    per-column rescans.
    """
    li = load_table(spark, sf_dir, "lineitem")
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in _PROFILE_COLS:
        aggs += [
            F.countDistinct(c).alias(f"_d_{c}"),
            F.min(F.col(c).cast("double")).alias(f"_min_{c}"),
            F.max(F.col(c).cast("double")).alias(f"_max_{c}"),
        ]
    one = li.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', _d_{c}, _min_{c}, _max_{c}" for c in _PROFILE_COLS
    )
    return one.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack_args}) "
        "AS (col_name, n_distinct, min_val, max_val)",
        "_n AS n_rows",
    ).select("col_name", "n_rows", "n_distinct", "min_val", "max_val")


MAD_K = 3.0  # flag |x - median| > K * MAD


def doc_len_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust length-outlier screen per (lang, source) stratum: exact
    median and MAD (median absolute deviation) of n_chars, then count
    docs beyond MAD_K·MAD — the heavy-tail document filter that mean/
    stddev screens get wrong on skewed corpora.

    Group keys are low-cardinality, so both stats tables broadcast back
    to the doc side; n_chars is integer so median/MAD land on exact
    .0/.5 doubles and the outlier comparison is engine-deterministic.
    """
    docs = load_table(spark, sf_dir, "documents").select("lang", "source", "n_chars")
    med = docs.groupBy("lang", "source").agg(
        F.expr("percentile(n_chars, 0.5)").alias("med"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    dev = docs.join(F.broadcast(med), ["lang", "source"]).select(
        "lang", "source", "n_docs", "med",
        F.abs(F.col("n_chars") - F.col("med")).alias("adev"),
    )
    mad = dev.groupBy("lang", "source", "n_docs", "med").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    flagged = dev.join(
        F.broadcast(mad.select("lang", "source", "mad")), ["lang", "source"]
    ).groupBy("lang", "source").agg(
        F.sum((F.col("adev") > MAD_K * F.col("mad")).cast("long")).alias(
            "n_outliers"
        )
    )
    return mad.join(flagged, ["lang", "source"]).select(
        "lang",
        "source",
        "n_docs",
        F.round("med", 2).alias("med_chars"),
        F.round("mad", 2).alias("mad_chars"),
        "n_outliers",
    )


NORM_TOL = 1e-3  # unit-norm tolerance for "bad" vectors


def embedding_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-table QA per label: vector count, dimensionality, mean
    L2 norm, and count of vectors off the unit sphere — the sanity gate
    before any ANN index build (a single wrong-dim or zero vector
    poisons IVF centroids silently).

    Norms are computed JVM-side (F.aggregate over the float array in a
    double accumulator); one thin grouped agg on label follows.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    norm = F.sqrt(
        F.aggregate(
            "embedding", F.lit(0.0).cast("double"), lambda a, x: a + x * x
        )
    )
    return (
        emb.select(
            "label",
            F.size("embedding").cast("long").alias("dim"),
            norm.alias("norm"),
        )
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.max("dim").alias("dim"),
            # exact-integer numerator (per-row micro-quantized norm),
            # ONE IEEE division — no float-sum order dependence
            (
                F.sum(
                    F.floor(F.col("norm") * 1_000_000 + F.lit(0.5)).cast(
                        "long"
                    )
                ).cast("double")
                / (F.count(F.lit(1)) * 1_000_000)
            ).alias("avg_norm"),
            F.sum(
                (F.abs(F.col("norm") - 1.0) > NORM_TOL).cast("long")
            ).alias("n_off_unit"),
        )
    )


def key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnosis: per candidate shuffle key, the key count,
    max/avg rows per key, skew factor (max/avg), and exact p99 — the
    report that decides whether a join needs salting (`ext_salted_join`)
    or AQE skew handling before anyone burns a 1000-executor hour on a
    straggler.

    Each relation costs one partial-aggregated count shuffle on the key
    plus a scalar roll-up; the per-key count table never leaves the
    cluster.

    The fixed-point columns (avg ×10⁴, skew ×10²) are EXACT integer
    round-half-up — (scale·num + den div 2) div den on BIGINTs — not
    ROUND() on a double ratio: at sf0.1 the events skew ratio lands on
    1.4849999999999999, where Spark's BigDecimal HALF_UP and DuckDB's
    rounding disagree by a full hundredth. Integer arithmetic has no
    such tie. p99 stays the raw exact-percentile double (bit-identical
    across engines, parity pinned by ext_percentiles) — rounding it
    would reintroduce the hazard.
    """

    def one(df: DataFrame, rel: str, col: str) -> DataFrame:
        cnt = df.groupBy(F.col(col).alias("key")).agg(
            F.count(F.lit(1)).alias("cnt")
        )
        base = cnt.agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.max("cnt").alias("max_cnt"),
            F.sum("cnt").alias("s"),
            F.expr("percentile(cnt, 0.99)").alias("p99_cnt"),
        )
        return base.select(
            F.lit(rel).alias("rel"),
            "n_keys",
            "max_cnt",
            # avg rows/key in exact 1e-4 units: round_half_up(1e4·s/n)
            F.expr("(10000 * s + n_keys div 2) div n_keys").alias(
                "avg_x10000"
            ),
            # skew = max/avg = max·n/s, in exact 1e-2 units
            F.expr("(100 * max_cnt * n_keys + s div 2) div s").alias(
                "skew_x100"
            ),
            "p99_cnt",
        )

    events = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        one(events, "events.user_id", "user_id")
        .unionByName(one(orders, "orders.o_custkey", "o_custkey"))
        .unionByName(one(lineitem, "lineitem.l_orderkey", "l_orderkey"))
    )


def dedup_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-windowed log dedup: keep the FIRST event per (user,
    event_type, calendar day) — the log-hygiene pass every event
    pipeline runs before aggregation (exact dedup would collapse
    legitimate repeats across days; global dropDuplicates keeps
    unbounded state in streams). One window keyed on (user, type,
    day); the keeper is the (ts, event_id)-minimal row, so the output
    is engine-independent. At 100 TB: a single hash shuffle on the
    dedup key; state per key is one row; the streaming twin is
    dropDuplicatesWithinWatermark with a 1-day delay
    (stream_dedup_watermarked)."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy(
        "user_id", "event_type", F.date_format("ts", "yyyy-MM-dd")
    ).orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            F.col("event_id").alias("keep_event_id"),
        )
    )


SPEAR_PAIRS = (
    ("n_tokens", "n_chars"),
    ("n_tokens", "n_types"),
    ("n_chars", "n_types"),
)


def spearman_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between per-document quality signals
    (token count, character count, distinct-token count) — the
    redundancy audit for a curation stack: two signals with |rho|
    near 1 gate the same documents, so computing (and thresholding)
    both buys nothing. Rank correlation, not Pearson, because quality
    gates act on ORDER (percentile cutoffs), and rho is invariant to
    the monotone rescalings (log length, per-lang normalization) the
    raw signals routinely undergo.

    Exact construction, no global sort: tied ranks use the textbook
    average-rank convention, computed from each signal's VALUE
    HISTOGRAM — doubled average rank 2r = 2·cum_before + cnt + 1 is an
    integer, so Σ(2r) = n(n+1) exactly and the centered products
    accumulate as BIGINTs. rho = Sab / (√Saa·√Sbb) is then three IEEE
    correctly-rounded ops on BIGINT-cast operands — bit-identical in
    Spark and DuckDB.

    Scale notes (100 TB): ranking shuffles only each signal's value
    HISTOGRAM (distinct values, not rows) — the cumulative window runs
    over that small table and broadcasts back, so the corpus side pays
    three broadcast-hash joins and one map-side-combinable aggregate;
    no row-level sort, no row-level window. This is how exact ranks
    survive scale when the value domain is small (counts, lengths);
    continuous domains would quantize first (ext_equidepth_histogram).
    """
    from pyspark.sql import Window

    toks = F.split("text", r"\s+")
    docs = ensure_min_partitions(
        load_table(spark, sf_dir, "documents")
    ).select(
        F.size(toks).alias("n_tokens"),
        F.length("text").alias("n_chars"),
        F.size(F.array_distinct(toks)).alias("n_types"),
    )
    nrow = docs.agg(F.count(F.lit(1)).alias("n"))
    ranked = docs.crossJoin(F.broadcast(nrow))
    # bounded global window: runs over each signal's value
    # HISTOGRAM (distinct counts), never the corpus
    wcum = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    for s in ("n_tokens", "n_chars", "n_types"):
        hist = docs.groupBy(F.col(s).alias("v")).agg(
            F.count(F.lit(1)).alias("cnt")
        )
        r2 = hist.select(
            "v",
            (
                2 * F.coalesce(F.sum("cnt").over(wcum), F.lit(0))
                + F.col("cnt")
                + 1
            ).alias(f"r2_{s}"),
        )
        ranked = ranked.join(
            F.broadcast(r2), ranked[s] == r2["v"]
        ).drop("v")
    centered = ranked.select(
        *[
            (F.col(f"r2_{s}") - (F.col("n") + 1)).alias(f"d_{s}")
            for s in ("n_tokens", "n_chars", "n_types")
        ]
    )
    sums = centered.agg(
        *[
            F.sum(F.col(f"d_{s}") * F.col(f"d_{s}")).alias(f"s_{s}_{s}")
            for s in ("n_tokens", "n_chars", "n_types")
        ],
        *[
            F.sum(F.col(f"d_{a}") * F.col(f"d_{b}")).alias(f"s_{a}_{b}")
            for a, b in SPEAR_PAIRS
        ],
    )
    return sums.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(a).alias("signal_a"),
                        F.lit(b).alias("signal_b"),
                        (
                            F.col(f"s_{a}_{b}").cast("double")
                            / (
                                F.sqrt(F.col(f"s_{a}_{a}").cast("double"))
                                * F.sqrt(F.col(f"s_{b}_{b}").cast("double"))
                            )
                        ).alias("rho"),
                    )
                    for a, b in SPEAR_PAIRS
                ]
            )
        ).alias("row")
    ).select("row.*")


def kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b between the per-document quality signals — the
    concordance twin of ext_spearman_signals. Tau answers a different
    question than rho: the probability a randomly chosen document PAIR
    is ordered the same way by both signals (minus the reversed
    probability), which is exactly the "do these two gates agree on
    who passes a percentile cutoff" statistic, and it is far less
    sensitive than rho to a handful of extreme ranks.

    Naively tau is an O(n²) pair statistic. Integer signals have SMALL
    VALUE DOMAINS, so all pair counts are computed exactly from the
    JOINT VALUE HISTOGRAM: concordant mass C = Σ n₁n₂ over cell pairs
    ordered the same way on both axes, discordant D likewise reversed,
    and the tie corrections come from the marginal histograms —
    tau_b = (C − D) / (√(n₀−t_a)·√(n₀−t_b)). Every count is a BIGINT
    (exact in both engines); the final value is two correctly-rounded
    sqrts and one division on those integers, so it is bit-identical
    cross-engine with no rounding step (never ROUND an unstable
    ratio — see the fixed-point rule in ext_key_skew).

    Scale notes (100 TB): the corpus pays ONE map-side-combinable
    aggregate TOTAL — the joint (n_tokens, n_chars, n_types) value
    histogram, materialized once — and every pair's joint/marginal
    histogram re-aggregates that metadata-sized table (round-10: the
    per-pair formulation re-ran the corpus aggregate for each of the
    5 histogram consumers × 3 pairs = 15 corpus shuffles); the
    triangular cell-pair join runs on the broadcast histogram —
    independent of corpus row count. Same exact-ranks-without-row-sort
    argument as spearman_signals; continuous signals would quantize
    first."""
    toks = F.split("text", r"\s+")
    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents")).select(
        F.size(toks).alias("n_tokens"),
        F.length("text").alias("n_chars"),
        F.size(F.array_distinct(toks)).alias("n_types"),
    )
    hist3 = (
        docs.groupBy("n_tokens", "n_chars", "n_types")
        .agg(F.count(F.lit(1)).alias("cnt3"))
        .localCheckpoint(eager=False)
    )
    parts = []
    for a, b in SPEAR_PAIRS:
        # materialize the (tiny, value-domain-sized) per-pair histogram:
        # four consumers below (cd both join sides, totals, ta, tb)
        # re-embed it, and Catalyst re-analyzes the whole checkpointed-
        # hist3 regroup subtree once per reference — measured 3.7 →
        # 2.3 s warm for the entry with values identical (round 10:
        # analysis depth × reference count is a driver fixed cost, the
        # same axis as the py4j rule in SCALE.md)
        hist = (
            hist3.groupBy(F.col(a).alias("va"), F.col(b).alias("vb"))
            .agg(F.sum("cnt3").alias("cnt"))
            .localCheckpoint(eager=False)
        )
        h1, h2 = hist.alias("h1"), hist.alias("h2")
        cd = h1.join(F.broadcast(h2), F.col("h1.va") < F.col("h2.va")).agg(
            F.sum(
                F.when(
                    F.col("h1.vb") < F.col("h2.vb"),
                    F.col("h1.cnt") * F.col("h2.cnt"),
                ).otherwise(F.lit(0))
            ).alias("conc"),
            F.sum(
                F.when(
                    F.col("h1.vb") > F.col("h2.vb"),
                    F.col("h1.cnt") * F.col("h2.cnt"),
                ).otherwise(F.lit(0))
            ).alias("disc"),
        )
        totals = hist.agg(
            F.sum("cnt").alias("n"),
            (F.sum(F.expr("cnt * (cnt - 1)")) / 2).cast("long").alias("t_ab"),
        )
        ta = (
            hist.groupBy("va")
            .agg(F.sum("cnt").alias("m"))
            .agg((F.sum(F.expr("m * (m - 1)")) / 2).cast("long").alias("t_a"))
        )
        tb = (
            hist.groupBy("vb")
            .agg(F.sum("cnt").alias("m"))
            .agg((F.sum(F.expr("m * (m - 1)")) / 2).cast("long").alias("t_b"))
        )
        parts.append(
            cd.crossJoin(F.broadcast(totals))
            .crossJoin(F.broadcast(ta))
            .crossJoin(F.broadcast(tb))
            .select(
                F.lit(a).alias("signal_a"),
                F.lit(b).alias("signal_b"),
                (F.col("n") * (F.col("n") - 1) / 2).cast("long").alias("n_pairs"),
                F.coalesce(F.col("conc"), F.lit(0)).cast("long").alias("concordant"),
                F.coalesce(F.col("disc"), F.lit(0)).cast("long").alias("discordant"),
                (
                    (
                        F.coalesce(F.col("conc"), F.lit(0))
                        - F.coalesce(F.col("disc"), F.lit(0))
                    ).cast("double")
                    / (
                        F.sqrt(
                            (
                                (F.col("n") * (F.col("n") - 1) / 2).cast("long")
                                - F.col("t_a")
                            ).cast("double")
                        )
                        * F.sqrt(
                            (
                                (F.col("n") * (F.col("n") - 1) / 2).cast("long")
                                - F.col("t_b")
                            ).cast("double")
                        )
                    )
                ).alias("tau_b"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


QUERIES: dict[str, Callable] = {
    "ext_spearman_signals": spearman_signals,
    "ext_kendall_tau": kendall_tau,
    "ext_boilerplate_ngrams": boilerplate_ngrams,
    "ext_key_skew": key_skew,
    "ext_pii_scrub": pii_scrub,
    "ext_data_profile": data_profile,
    "ext_doc_len_outliers": doc_len_outliers,
    "ext_emb_quality": embedding_quality,
    "ext_dedup_windowed": dedup_windowed,
}

_TOKS = "string_split_regex(text, '\\s+')"

_SKEW_RELS = (
    ("events.user_id", "events", "user_id"),
    ("orders.o_custkey", "orders", "o_custkey"),
    ("lineitem.l_orderkey", "lineitem", "l_orderkey"),
)

_SPEAR_RHO = " UNION ALL ".join(
    f"""
        SELECT '{a}' AS signal_a, '{b}' AS signal_b,
               CAST(s_{a}_{b} AS DOUBLE)
                 / (SQRT(CAST(s_{a}_{a} AS DOUBLE))
                    * SQRT(CAST(s_{b}_{b} AS DOUBLE))) AS rho
        FROM sums"""
    for a, b in SPEAR_PAIRS
)

ORACLES: dict[str, str] = {
    # Same joint-histogram construction as the Spark side: all pair
    # masses are BIGINT-exact; tau_b is two correctly-rounded sqrts and
    # one division on those integers — no ROUND anywhere.
    "ext_kendall_tau": f"""
        WITH docs AS (
            SELECT len({_TOKS}) AS n_tokens,
                   length(text) AS n_chars,
                   len(list_distinct({_TOKS})) AS n_types
            FROM documents),
        {", ".join(
            f'''h_{a}_{b} AS (
                SELECT {a} AS va, {b} AS vb, COUNT(*) AS cnt
                FROM docs GROUP BY 1, 2),
            cd_{a}_{b} AS (
                SELECT CAST(COALESCE(SUM(CASE WHEN h1.vb < h2.vb
                           THEN h1.cnt * h2.cnt ELSE 0 END), 0) AS BIGINT) AS conc,
                       CAST(COALESCE(SUM(CASE WHEN h1.vb > h2.vb
                           THEN h1.cnt * h2.cnt ELSE 0 END), 0) AS BIGINT) AS disc
                FROM h_{a}_{b} h1 JOIN h_{a}_{b} h2 ON h1.va < h2.va),
            n_{a}_{b} AS (
                SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM h_{a}_{b}),
            ta_{a}_{b} AS (
                SELECT CAST(SUM(m * (m - 1)) / 2 AS BIGINT) AS t_a
                FROM (SELECT SUM(cnt) AS m FROM h_{a}_{b} GROUP BY va)),
            tb_{a}_{b} AS (
                SELECT CAST(SUM(m * (m - 1)) / 2 AS BIGINT) AS t_b
                FROM (SELECT SUM(cnt) AS m FROM h_{a}_{b} GROUP BY vb))'''
            for a, b in SPEAR_PAIRS
        )}
        {" UNION ALL ".join(
            f'''SELECT '{a}' AS signal_a, '{b}' AS signal_b,
                   CAST(n.n * (n.n - 1) / 2 AS BIGINT) AS n_pairs,
                   cd.conc AS concordant, cd.disc AS discordant,
                   CAST(cd.conc - cd.disc AS DOUBLE)
                   / (sqrt(CAST(CAST(n.n * (n.n - 1) / 2 AS BIGINT)
                                - ta.t_a AS DOUBLE))
                      * sqrt(CAST(CAST(n.n * (n.n - 1) / 2 AS BIGINT)
                                  - tb.t_b AS DOUBLE))) AS tau_b
            FROM cd_{a}_{b} cd, n_{a}_{b} n, ta_{a}_{b} ta, tb_{a}_{b} tb'''
            for a, b in SPEAR_PAIRS
        )}
    """,
    "ext_spearman_signals": f"""
        WITH docs AS (
            SELECT len({_TOKS}) AS n_tokens,
                   length(text) AS n_chars,
                   len(list_distinct({_TOKS})) AS n_types
            FROM documents),
        n AS (SELECT COUNT(*) AS n FROM docs),
        {", ".join(
            f'''h_{s} AS (
                SELECT {s} AS v, COUNT(*) AS cnt FROM docs GROUP BY 1),
            r_{s} AS (
                SELECT v,
                       2 * COALESCE(SUM(cnt) OVER (ORDER BY v
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING), 0) + cnt + 1 AS r2
                FROM h_{s})'''
            for s in ("n_tokens", "n_chars", "n_types")
        )},
        centered AS (
            SELECT rx.r2 - (n.n + 1) AS d_n_tokens,
                   rc.r2 - (n.n + 1) AS d_n_chars,
                   rt.r2 - (n.n + 1) AS d_n_types
            FROM docs d
            JOIN r_n_tokens rx ON d.n_tokens = rx.v
            JOIN r_n_chars rc ON d.n_chars = rc.v
            JOIN r_n_types rt ON d.n_types = rt.v
            CROSS JOIN n),
        sums AS (
            SELECT
                {", ".join(
                    f"CAST(SUM(d_{s} * d_{s}) AS BIGINT) AS s_{s}_{s}"
                    for s in ("n_tokens", "n_chars", "n_types")
                )},
                {", ".join(
                    f"CAST(SUM(d_{a} * d_{b}) AS BIGINT) AS s_{a}_{b}"
                    for a, b in SPEAR_PAIRS
                )}
            FROM centered)
        {_SPEAR_RHO}
    """,
    "ext_dedup_windowed": """
        SELECT user_id, event_type,
               strftime(ts, '%Y-%m-%d') AS day,
               event_id AS keep_event_id
        FROM (SELECT user_id, event_type, ts, event_id,
                     ROW_NUMBER() OVER (
                         PARTITION BY user_id, event_type,
                                      strftime(ts, '%Y-%m-%d')
                         ORDER BY ts, event_id) AS rn
              FROM events)
        WHERE rn = 1
    """,
    "ext_key_skew": " UNION ALL ".join(
        f"""
        SELECT '{rel}' AS rel, n_keys, max_cnt,
               (10000 * s + n_keys // 2) // n_keys AS avg_x10000,
               (100 * max_cnt * n_keys + s // 2) // s AS skew_x100,
               p99_cnt
        FROM (SELECT COUNT(*) AS n_keys, MAX(cnt) AS max_cnt,
                     CAST(SUM(cnt) AS BIGINT) AS s,
                     quantile_cont(cnt, 0.99) AS p99_cnt
              FROM (SELECT {col}, COUNT(*) AS cnt
                    FROM {tbl} GROUP BY {col}) t) g
        """
        for rel, tbl, col in _SKEW_RELS
    ),
    "ext_boilerplate_ngrams": f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        g AS (SELECT DISTINCT doc_id, gram FROM (
                SELECT doc_id,
                       unnest([array_to_string(toks[i : i + {BOILER_N - 1}], ' ')
                               for i in range(1, len(toks) - {BOILER_N - 2})]) AS gram
                FROM t WHERE len(toks) >= {BOILER_N}) raw),
        hot AS (SELECT gram FROM g GROUP BY gram
                HAVING COUNT(*) >= {BOILER_DF}),
        per_doc AS (SELECT doc_id, COUNT(*) AS n_grams FROM g GROUP BY doc_id),
        boiler AS (SELECT doc_id, COUNT(*) AS n_boiler FROM g
                   WHERE gram IN (SELECT gram FROM hot) GROUP BY doc_id)
        SELECT p.doc_id, p.n_grams,
               COALESCE(b.n_boiler, 0) AS n_boiler,
               ROUND(COALESCE(b.n_boiler, 0) * 1.0 / p.n_grams, 4)
                   AS boiler_ratio
        FROM per_doc p LEFT JOIN boiler b USING (doc_id)
    """,
    "ext_pii_scrub": f"""
        SELECT event_type, COUNT(*) AS n_events,
               CAST(SUM(len(regexp_extract_all(props, '{PII_NUM_RE}')))
                    AS BIGINT) AS n_redactions,
               ROUND(AVG(len(regexp_replace(props, '{PII_NUM_RE}', '<NUM>',
                                            'g'))), 4) AS avg_scrubbed_len
        FROM events GROUP BY event_type
    """,
    "ext_data_profile": " UNION ALL ".join(
        f"""
        SELECT '{c}' AS col_name, COUNT(*) AS n_rows,
               COUNT(DISTINCT {c}) AS n_distinct,
               CAST(MIN({c}) AS DOUBLE) AS min_val,
               CAST(MAX({c}) AS DOUBLE) AS max_val
        FROM lineitem
        """
        for c in _PROFILE_COLS
    ),
    "ext_doc_len_outliers": f"""
        WITH med AS (
            SELECT lang, source, COUNT(*) AS n_docs,
                   median(n_chars) AS med FROM documents GROUP BY lang, source),
        dev AS (
            SELECT d.lang, d.source, m.n_docs, m.med,
                   ABS(d.n_chars - m.med) AS adev
            FROM documents d JOIN med m USING (lang, source)),
        mad AS (
            SELECT lang, source, n_docs, med, median(adev) AS mad
            FROM dev GROUP BY lang, source, n_docs, med)
        SELECT m.lang, m.source, m.n_docs,
               ROUND(m.med, 2) AS med_chars, ROUND(m.mad, 2) AS mad_chars,
               CAST(SUM(CASE WHEN v.adev > {MAD_K} * m.mad THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_outliers
        FROM mad m JOIN dev v USING (lang, source)
        GROUP BY m.lang, m.source, m.n_docs, m.med, m.mad
    """,
    "ext_emb_quality": f"""
        WITH n AS (
            SELECT label, len(embedding) AS dim,
                   sqrt(list_sum(list_transform(embedding,
                                 x -> CAST(x AS DOUBLE) * x))) AS norm
            FROM embeddings)
        SELECT label, COUNT(*) AS n_vecs, MAX(dim) AS dim,
               CAST(SUM(CAST(FLOOR(norm * 1000000 + 0.5) AS BIGINT))
                    AS DOUBLE) / (COUNT(*) * 1000000) AS avg_norm,
               CAST(SUM(CASE WHEN ABS(norm - 1.0) > {NORM_TOL} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_off_unit
        FROM n GROUP BY label
    """,
}
