"""Data-governance, record-linkage and QA operators.

The reference engine has none of these (SURVEY.md §2.1 covers only
scan/filter/join/agg); they extend the training-data-pipeline surface
(SURVEY.md §2.2 X rows) with the governance side of corpus ops:
fuzzy record linkage, mergeable frequency sketches, weighted
subsampling, snapshot/CDC diffing, re-identification-risk audits and
per-entity anomaly screens. Everything is expression-only Catalyst
code — no Python UDFs — and all arithmetic that reaches the output is
integer or single-op IEEE (exact under the driver's repr-equality
hash compare; no order-dependent float reductions).

Scale notes (100 TB):
- fuzzy vocab join: SymSpell deletion-neighborhood blocking — each
  distinct name emits L+1 deletion variants, the self-join runs on the
  variant key (thin (variant, name) shuffle, group sizes bounded by
  the alphabet), and the exact levenshtein post-filter touches only
  candidates. The oracle is the NAIVE O(V^2) threshold join, so every
  green run is a proof the blocking is lossless at distance <= 1.
- count-min sketch: the sketch is a fixed d*w cell grid aggregated
  map-side (one thin shuffle of at most d*w rows per partition);
  probes join against the broadcast sketch. Mergeability = cell-wise
  addition, the property that makes it work across 1000 executors.
- weighted sample: one window top-k per group over an integer
  priority — no global sort, no collect; ties broken by key.
- snapshot diff: a single full-outer sort-merge join on the snapshot
  key; at scale both sides arrive bucketed by the same key and the
  join is co-located.
- k-anonymity: one grouped count over the quasi-identifier tuple +
  a broadcast of the tiny class table back onto nation names.
- breakout screen: one window per user (partition-local after a
  single hash shuffle on user_id) — no second pass, no self-join.

Later round-4 additions in this module (scale notes in SCALE.md):
incremental view maintenance (`ext_incremental_agg` — delta-only
rollup absorption, oracle = full recompute), declarative data-contract
validation (`ext_data_contract` — anti-join FK checks + conditional
aggregates), export pseudonymization with injectivity audit
(`ext_pseudonymize`), the rollup-lattice re-aggregability proof
(`ext_rollup_lattice`), an in-engine Bloom filter with exact FPR audit
(`ext_bloom_membership`), and the native-format time-travel diff
(`ext_time_travel_diff` — retained versions read via versionAsOf).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from mini_sql_engine_spark.catalog import ensure_min_partitions, load_table
from mini_sql_engine_spark.functions.hashing import md5_long
from mini_sql_engine_spark.functions.numeric import NANO as _NANO
from mini_sql_engine_spark.functions.numeric import qsum as _qsum

# --- fuzzy vocabulary join (SymSpell deletion neighborhood) ---------

EDIT_MAX = 1  # deletion-neighborhood blocking is lossless iff <= 1

# --- count-min sketch ----------------------------------------------

CMS_DEPTH = 4  # hash rows (independent md5 salts)
CMS_WIDTH = 16  # buckets per row; small so collisions actually occur

# --- weighted sample -----------------------------------------------

WS_K = 10  # docs kept per language

# --- snapshot diff -------------------------------------------------

DIFF_MOD = 19  # deterministic per-key mutation classes
PRICE_BUMP = 100.0  # exact IEEE add — no rounding-mode divergence

# --- k-anonymity ---------------------------------------------------

K_ANON = 5

# --- breakout screen -----------------------------------------------

BREAKOUT_LOOKBACK = 10  # trailing events per user
BREAKOUT_HI = 1.5  # value > trailing max * HI  -> spike
BREAKOUT_LO = 0.5  # value < trailing min * LO  -> collapse


def _stage_token(sf_dir: str, table: str = "documents") -> str:
    """Cache token for tempdir staging keyed on sf_dir CONTENT, not just
    its path (round-8 advice). Delegates to the canonical
    :func:`catalog.content_token` — the same fingerprint now also keys
    the DataFrame memos (DFMemo, round-10 advice)."""
    from mini_sql_engine_spark.catalog import content_token

    return content_token(sf_dir, table)


def _deletion_variants(name) -> F.Column:
    """All single-character deletions of ``name``, plus ``name`` itself.

    Two equal-length strings at levenshtein distance 1 differ by one
    substitution and therefore share the variant that deletes the
    differing position; a string and its 1-char extension share the
    shorter string itself. Hence distance-<=1 pairs always collide on
    at least one variant (the SymSpell blocking property)."""
    name = F.col(name) if isinstance(name, str) else name
    deletions = F.transform(
        F.sequence(F.lit(1), F.length(name)),
        lambda i: F.concat(
            name.substr(F.lit(1), i - 1),
            name.substr(i + 1, F.length(name)),
        ),
    )
    return F.array_union(deletions, F.array(name))


def fuzzy_vocab_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record linkage: all customer-name pairs within edit distance 1.

    SymSpell-style: block on shared deletion variants, then verify with
    exact levenshtein. The candidate join ships only thin
    (variant, name) rows; the quadratic all-pairs comparison never
    happens (the oracle DOES run it, proving losslessness)."""
    names = ensure_min_partitions(
        load_table(spark, sf_dir, "customer").select("c_name").distinct()
    )
    variants = names.select(
        F.col("c_name").alias("name"),
        F.explode(_deletion_variants("c_name")).alias("variant"),
    )
    a, b = variants.alias("a"), variants.alias("b")
    return (
        a.join(
            b,
            (F.col("a.variant") == F.col("b.variant"))
            & (F.col("a.name") < F.col("b.name")),
        )
        .select(
            F.col("a.name").alias("name_a"), F.col("b.name").alias("name_b")
        )
        .dropDuplicates(["name_a", "name_b"])
        .filter(F.levenshtein("name_a", "name_b") <= EDIT_MAX)
    )


def _cms_bucket(tok, row: int) -> F.Column:
    return (md5_long(tok, salt=f"cms{row}") % CMS_WIDTH).cast("int")


def cms_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over the corpus token stream, audited vs truth.

    Builds the d x w sketch as a DataFrame (cell = sum of token
    occurrences hashing there), then estimates every distinct token's
    frequency as min over rows of its cell — alongside the exact count
    so the output exposes the overestimate each collision causes.
    The sketch is mergeable by construction: cells add."""
    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    toks = docs.select(F.explode(F.split("text", r"\s+")).alias("tok"))
    cells = toks.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _cms_bucket(F.col("tok"), r).alias("bucket"),
                    )
                    for r in range(CMS_DEPTH)
                ]
            )
        ).alias("cell")
    ).groupBy("cell.row", "cell.bucket").agg(F.count("*").alias("cnt"))
    truth = toks.groupBy("tok").agg(F.count("*").alias("true_cnt"))
    probes = truth.select(
        "tok",
        "true_cnt",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _cms_bucket(F.col("tok"), r).alias("bucket"),
                    )
                    for r in range(CMS_DEPTH)
                ]
            )
        ).alias("cell"),
    )
    return (
        probes.join(
            F.broadcast(cells),  # sketch is <= d*w rows by construction
            (probes["cell.row"] == cells["row"])
            & (probes["cell.bucket"] == cells["bucket"]),
        )
        .groupBy("tok", "true_cnt")
        .agg(F.min("cnt").alias("cms_est"))
        .select(
            "tok",
            "true_cnt",
            "cms_est",
            (F.col("cms_est") - F.col("true_cnt")).alias("overestimate"),
        )
    )


def weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted k-sample per language, integer priority.

    Priority = hash(doc_id) div n_chars: a document with twice the
    weight halves its expected priority, so the k smallest priorities
    per group form a weighted sample without replacement (the
    integer-arithmetic analogue of Efraimidis-Spirakis keys — chosen
    over -ln(u)/w because the output must be exactly reproducible in
    both engines; libm log() is not)."""
    docs = load_table(spark, sf_dir, "documents")
    pri = (md5_long(F.col("doc_id").cast("string"), salt="ws") / F.col("n_chars")).cast(
        "long"
    )
    w = Window.partitionBy("lang").orderBy("priority", "doc_id")
    return (
        docs.select("doc_id", "lang", "n_chars", pri.alias("priority"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= WS_K)
    )


def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-style diff between two snapshot versions of ``orders``.

    v1 is the table as stored; v2 applies a deterministic per-key
    mutation (delete / price-bump / insert-shifted classes keyed by
    o_orderkey mod DIFF_MOD). The diff is ONE full-outer join on the
    key emitting added / removed / changed rows — the operator a
    pipeline needs to audit what an ingest batch actually did."""
    v1 = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    cls = F.col("o_orderkey") % DIFF_MOD
    v2 = (
        v1.filter(cls != 3)  # deletes
        .withColumn(
            "o_totalprice",
            F.when(cls.isin(4, 5), F.col("o_totalprice") + PRICE_BUMP).otherwise(
                F.col("o_totalprice")
            ),
        )
        .unionAll(  # inserts: class-6 keys re-ingested under a shifted id
            v1.filter(cls == 6).select(
                (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
                "o_totalprice",
            )
        )
    )
    a, b = v1.alias("a"), v2.alias("b")
    joined = a.join(b, F.col("a.o_orderkey") == F.col("b.o_orderkey"), "full_outer")
    return (
        joined.select(
            F.coalesce(F.col("a.o_orderkey"), F.col("b.o_orderkey")).alias(
                "o_orderkey"
            ),
            F.col("a.o_totalprice").alias("old_price"),
            F.col("b.o_totalprice").alias("new_price"),
            F.when(F.col("a.o_orderkey").isNull(), F.lit("added"))
            .when(F.col("b.o_orderkey").isNull(), F.lit("removed"))
            .when(
                F.col("a.o_totalprice") != F.col("b.o_totalprice"),
                F.lit("changed"),
            )
            .otherwise(F.lit("unchanged"))
            .alias("status"),
        )
        .filter(F.col("status") != "unchanged")
    )


def k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-identification-risk audit over quasi-identifiers.

    Equivalence classes on (nation, market segment); any class smaller
    than K_ANON rows means those customers are re-identifiable from the
    quasi-identifier tuple alone — the audit every release of a
    customer-derived training set needs."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    classes = cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count("*").alias("class_size")
    )
    return classes.join(
        F.broadcast(nation), classes["c_nationkey"] == nation["n_nationkey"]
    ).select(
        "n_name",
        F.col("c_mktsegment").alias("segment"),
        "class_size",
        (F.col("class_size") < K_ANON).cast("int").alias("at_risk"),
    )


def value_breakout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user rolling band-breakout screen on the event stream.

    Flags an event whose value escapes [trailing_min * LO,
    trailing_max * HI] over the user's previous BREAKOUT_LOOKBACK
    events (band multiplications are single IEEE ops — exact in both
    engines; min/max are order-insensitive). Requires a full lookback
    window so early events never alert. One shuffle on user_id; the
    window is then partition-local."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-BREAKOUT_LOOKBACK, -1)
    )
    scr = ev.select(
        "user_id",
        "event_id",
        "value",
        F.min("value").over(w).alias("lo"),
        F.max("value").over(w).alias("hi"),
        F.count("value").over(w).alias("n_prior"),
    )
    return scr.filter(
        (F.col("n_prior") == BREAKOUT_LOOKBACK)
        & (
            (F.col("value") > F.col("hi") * BREAKOUT_HI)
            | (F.col("value") < F.col("lo") * BREAKOUT_LO)
        )
    ).select(
        "user_id",
        "event_id",
        "value",
        "lo",
        "hi",
        F.when(F.col("value") > F.col("hi") * BREAKOUT_HI, F.lit("spike"))
        .otherwise(F.lit("collapse"))
        .alias("kind"),
    )


def incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance: update an aggregate from the delta
    batch ONLY — never by re-scanning the base table.

    The maintained view is per-customer (n_orders, total_cents) over
    ``orders``; the change batch applies the same deterministic per-key
    mutation classes as ``ext_snapshot_diff`` (delete class 3, price-
    bump classes 4/5, re-insert class 6 under a shifted key). Each
    change row becomes a delta (±1 count, ±cents); the view merges via
    one full-outer join on the group key and zero-count groups drop
    out. The ORACLE aggregates the v2 table directly, so a green row
    is a proof the incremental maintenance is EXACT — the property
    that lets a 100 TB rollup absorb a per-batch delta at delta cost
    instead of a full recompute. Money is integer cents
    (floor(x*100 + 0.5), the streaming-upsert convention) so delta
    addition is exactly associative."""
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    v1 = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", cents.alias("cents")
    )
    view = v1.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"), F.sum("cents").alias("total_cents")
    )
    cls = F.col("o_orderkey") % DIFF_MOD
    bump = F.lit(int(PRICE_BUMP) * 100)
    deltas = (
        v1.filter(cls == 3)  # deletes: retract the row
        .select("o_custkey", F.lit(-1).alias("d_n"), (-F.col("cents")).alias("d_cents"))
        .unionAll(  # updates: count unchanged, cents delta only
            v1.filter(cls.isin(4, 5)).select(
                "o_custkey", F.lit(0).alias("d_n"), bump.alias("d_cents")
            )
        )
        .unionAll(  # inserts: class-6 re-ingested (same customer)
            v1.filter(cls == 6).select(
                "o_custkey", F.lit(1).alias("d_n"), F.col("cents").alias("d_cents")
            )
        )
        .groupBy("o_custkey")
        .agg(F.sum("d_n").alias("d_n"), F.sum("d_cents").alias("d_cents"))
    )
    return (
        view.join(deltas, "o_custkey", "full_outer")
        .select(
            "o_custkey",
            (F.coalesce("n_orders", F.lit(0)) + F.coalesce("d_n", F.lit(0))).alias(
                "n_orders"
            ),
            (
                F.coalesce("total_cents", F.lit(0)) + F.coalesce("d_cents", F.lit(0))
            ).alias("total_cents"),
        )
        .filter(F.col("n_orders") > 0)
    )


def data_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-contract validation (dbt-test / expectation
    style): each check is one aggregate or anti-join counting
    violations, unioned into a (check_name, n_violations, passed)
    report. The checks every ingest gate needs:

    - not_null / unique on primary keys;
    - referential integrity as ANTI JOINS (orders→customer,
      lineitem→orders) — at scale these shuffle only the key columns,
      and the dimension side of each probe broadcasts when small;
    - range and accepted-values checks as single-pass conditional
      aggregates (map-side combinable, zero shuffle beyond the final
      1-row exchanges).

    The report is constant-width regardless of data size — the shape
    that lets a 100 TB contract run publish a dashboard row, not a
    dataset."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")

    def one(name: str, df: DataFrame) -> DataFrame:
        return df.select(
            F.lit(name).alias("check_name"),
            F.col("n_violations").cast("long").alias("n_violations"),
            (F.col("n_violations") == 0).cast("int").alias("passed"),
        )

    checks = [
        one(
            "orders_key_not_null",
            orders.agg(
                F.sum(F.col("o_orderkey").isNull().cast("long")).alias(
                    "n_violations"
                )
            ),
        ),
        one(
            "orders_key_unique",
            orders.groupBy("o_orderkey")
            .agg(F.count(F.lit(1)).alias("c"))
            .agg(F.sum((F.col("c") > 1).cast("long")).alias("n_violations")),
        ),
        one(
            "orders_customer_fk",
            orders.join(
                cust, orders["o_custkey"] == cust["c_custkey"], "left_anti"
            ).agg(F.count(F.lit(1)).alias("n_violations")),
        ),
        one(
            "lineitem_orders_fk",
            li.join(
                orders, li["l_orderkey"] == orders["o_orderkey"], "left_anti"
            ).agg(F.count(F.lit(1)).alias("n_violations")),
        ),
        one(
            "quantity_in_range",
            li.agg(
                F.sum(
                    (~F.col("l_quantity").between(1, 50)).cast("long")
                ).alias("n_violations")
            ),
        ),
        one(
            "price_positive",
            li.agg(
                F.sum((F.col("l_extendedprice") <= 0).cast("long")).alias(
                    "n_violations"
                )
            ),
        ),
        one(
            "orderstatus_accepted",
            orders.agg(
                F.sum(
                    (~F.col("o_orderstatus").isin("O", "F", "P")).cast("long")
                ).alias("n_violations")
            ),
        ),
        one(
            "acctbal_not_null",
            cust.agg(
                F.sum(F.col("c_acctbal").isNull().cast("long")).alias(
                    "n_violations"
                )
            ),
        ),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


PSEUDO_SALT = "release-2026-08"  # per-release secret; rotate per export


def pseudonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted-hash pseudonymization + collision audit.

    Replaces customer keys with a 60-bit salted hash (stable within a
    release salt, unlinkable across salts — the standard export
    pseudonym scheme) and proves the mapping injective for this
    release: output is the per-pseudonym cardinality audit, which must
    show every pseudonym maps to exactly one source key before the
    export ships. One grouped count over the hashed key; at 100 TB the
    audit is the same single map-side-combinable aggregate."""
    cust = load_table(spark, sf_dir, "customer")
    pseudo = cust.select(
        md5_long(F.col("c_custkey").cast("string"), salt=PSEUDO_SALT).alias(
            "pseudonym"
        ),
        "c_custkey",
    )
    return (
        pseudo.groupBy("pseudonym")
        .agg(F.count(F.lit(1)).alias("n_keys"))
        .groupBy("n_keys")
        .agg(F.count(F.lit(1)).alias("n_pseudonyms"))
    )


DP_EPS = 1.0  # release budget; Laplace scale b = 1/eps for count queries
_DP_U52 = 2**52  # uniform-seed resolution (fits exactly in a double)


def dp_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private count release (Laplace mechanism, ε=1)
    with a per-cell utility audit. Counts have sensitivity 1, so
    adding Laplace(1/ε) noise gives ε-DP; the inverse-CDF transform
    X = −b·sgn(u)·ln(1−2|u|) over a SEEDED md5-derived uniform makes
    the draw deterministic — reproducible across engines, reruns and
    partitionings, exactly like the sampling operators (a production
    release would secret the seed; determinism here is what lets the
    oracle replay the mechanism bit-for-bit). Output keeps the true
    count and absolute error alongside the noisy release — the utility
    report a privacy reviewer signs off on; the shipped release table
    would drop `n_true`.

    One map-side-combinable grouped count plus per-row codegen math —
    no extra shuffle over the plain count at any scale. Stats rounded
    to 6 decimals so cross-engine ln() ulp drift cannot surface."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_true")
    )
    u = (
        md5_long(F.concat_ws("|", "lang", "source"), salt="dp") % _DP_U52
    ) / F.lit(float(_DP_U52)) - 0.5
    noise = -(1.0 / DP_EPS) * F.signum(u) * F.log(1 - 2 * F.abs(u))
    return counts.select(
        "lang",
        "source",
        "n_true",
        F.round(F.col("n_true") + noise, 6).alias("n_released"),
        F.round(F.abs(noise), 6).alias("abs_err"),
    )


def rollup_lattice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-rollup lattice: month re-aggregated FROM the daily
    rollup, proven equal to month-from-raw.

    The lattice property (sum-of-sums, count-of-counts) is what lets a
    100 TB warehouse answer month queries from the day table without
    touching raw events; the oracle computes months DIRECTLY from the
    raw table, so a green row proves the re-aggregation path exact.
    Integer cents keep the additions associative. Day rollup is one
    shuffle over raw; month-from-day touches only day-rollup rows."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias(
            "cents"
        ),
    )
    return daily.groupBy(
        F.substring("day", 1, 7).alias("month"), "event_type"
    ).agg(
        F.sum("n_events").alias("n_events"),
        F.sum("cents").alias("cents"),
        F.count(F.lit(1)).alias("n_days"),
    )


BF_BITS = 16_384  # filter size (2^14 bits = 256 longs)
BF_K = 3  # hash functions
BF_WORD = 63  # usable bits per long word (1<<63 overflows signed in DuckDB)
BF_PROBES = 1_000  # synthetic non-member probes


def _bf_pos(col, j: int):
    return md5_long(col, salt=f"bf{j}") % BF_BITS


def bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom filter built in-engine + exact false-positive audit.

    The filter is a 256-long bitset DataFrame (word_idx → OR of bit
    masks via `bit_or` — mergeable across partitions exactly like the
    count-min cells), loaded with every customer name. Probing runs
    1000 synthetic non-members and all true members through the same
    k hashes against the BROADCAST bitset; output is one row:
    (n_keys, bits_set, n_members_missed, n_probes, false_positives).
    n_members_missed MUST be 0 (Bloom filters have no false negatives
    — the row is the self-check), and false_positives is the measured
    FPR numerator that validates the m/k sizing against theory. At
    100 TB the bitset is fixed-size by construction and the build is
    one map-side-combinable bit_or aggregate over the keys."""
    names = load_table(spark, sf_dir, "customer").select(
        F.col("c_name").alias("key")
    )
    positions = names.select(
        F.explode(
            F.array(*[_bf_pos(F.col("key"), j) for j in range(BF_K)])
        ).alias("pos")
    )
    bitset = positions.groupBy(
        F.floor(F.col("pos") / BF_WORD).cast("long").alias("word_idx")
    ).agg(
        # SQL-form shift: the Python shiftleft() helper only takes a
        # literal bit count, the SQL function takes an expression
        F.expr(f"bit_or(shiftleft(CAST(1 AS BIGINT), CAST(pos % {BF_WORD} AS INT)))").alias(
            "word"
        )
    )

    def probe(df: DataFrame) -> DataFrame:
        """n of k set bits per key against the broadcast bitset."""
        pos = df.select(
            "key",
            F.explode(
                F.array(*[_bf_pos(F.col("key"), j) for j in range(BF_K)])
            ).alias("pos"),
        ).select(
            "key",
            F.floor(F.col("pos") / BF_WORD).cast("long").alias("word_idx"),
            (F.col("pos") % BF_WORD).cast("int").alias("bit"),
        )
        return (
            pos.join(F.broadcast(bitset), "word_idx")
            .groupBy("key")
            .agg(
                F.expr("sum(shiftright(word, bit) & 1)").alias("n_set")
            )
        )

    members = probe(names)
    fakes = probe(
        spark.range(BF_PROBES).select(
            F.concat(F.lit("probe:"), F.col("id")).alias("key")
        )
    )
    stats = bitset.agg(
        F.sum(F.bit_count("word")).alias("bits_set")
    )
    return (
        members.agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum((F.col("n_set") < BF_K).cast("long")).alias(
                "n_members_missed"
            ),
        )
        .crossJoin(F.broadcast(stats))
        .crossJoin(
            F.broadcast(
                fakes.agg(
                    F.count(F.lit(1)).alias("n_probes"),
                    F.sum((F.col("n_set") == BF_K).cast("long")).alias(
                        "false_positives"
                    ),
                )
            )
        )
        .select(
            "n_keys", "bits_set", "n_members_missed", "n_probes",
            "false_positives",
        )
    )


def time_travel_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff ACROSS RETAINED TABLE VERSIONS of the native
    format — time travel as a first-class read.

    Stages (once per sf_dir) two committed versions of an
    orders-derived table through the ``format("minisql")`` writer with
    ``option("retain", "true")`` — v1 as stored, v2 after the
    deterministic DIFF_MOD mutation — then reads BOTH back with
    ``option("versionAsOf", N)`` and reports row counts per diff
    status. The oracle recomputes the same statuses straight from
    ``orders``, so a green row proves the whole loop: writer commit →
    version archive → time-travel read → diff. At 100 TB the same
    read contract is a table format's snapshot log; the diff itself
    is one full-outer join on the snapshot key."""
    import hashlib
    import os
    import tempfile

    from mini_sql_engine_spark.sources import datasource

    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    cls = F.col("o_orderkey") % DIFF_MOD
    v1 = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", cents.alias("cents")
    )
    v2 = (
        v1.filter(cls != 3)
        .withColumn(
            "cents",
            F.when(
                cls.isin(4, 5), F.col("cents") + int(PRICE_BUMP) * 100
            ).otherwise(F.col("cents")),
        )
        .unionAll(
            v1.filter(cls == 6).select(
                (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"), "cents"
            )
        )
    )
    digest = hashlib.md5(f"tt|{_stage_token(sf_dir, 'orders')}".encode()).hexdigest()[:8]
    stage = os.path.join(tempfile.gettempdir(), f"minisql_tt_{digest}")
    datasource.register(spark)
    if not os.path.exists(os.path.join(stage, "metadata.txt")):
        tmp = stage + f".tmp-{os.getpid()}"
        os.makedirs(tmp, exist_ok=True)
        for df in (v1, v2):
            (
                df.write.format("minisql")
                .option("path", tmp)
                .option("table", "orders_cents")
                .option("retain", "true")
                .mode("overwrite")
                .save()
            )
        try:
            os.rename(tmp, stage)
        except OSError:  # staging race lost; winner's copy is identical
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)

    def read_version(n: int) -> DataFrame:
        return (
            spark.read.format("minisql")
            .option("path", stage)
            .option("table", "orders_cents")
            .option("versionAsOf", str(n))
            .load()
        )

    a, b = read_version(1).alias("a"), read_version(2).alias("b")
    joined = a.join(b, F.col("a.o_orderkey") == F.col("b.o_orderkey"), "full_outer")
    status = (
        F.when(F.col("a.o_orderkey").isNull(), F.lit("added"))
        .when(F.col("b.o_orderkey").isNull(), F.lit("removed"))
        .when(F.col("a.cents") != F.col("b.cents"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        joined.select(status.alias("status"))
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


BNOV_BITS = 131_072  # shingle-set Bloom width (2^17)
BNOV_K = 3
BNOV_MOD = 5  # doc_id % 5 == 0 is the ingest batch (~20%)


def _bn_pos(col, j: int):
    return md5_long(col, salt=f"bn{j}") % BNOV_BITS


def bloom_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered novelty admission check for an ingest batch.

    The existing corpus' distinct shingle set loads a Bloom bitset
    (broadcast); each batch document's shingles probe it. A shingle
    the filter rejects is DEFINITELY novel (no false negatives), so
    `novel_bloom` — what the cheap prefilter alone can certify — is a
    lower bound on `novel_exact` (the anti-join truth, also computed),
    and their gap per document is the filter's measured false-positive
    effect at this saturation. At 100 TB this is the admission shape:
    the broadcast bitset screens the firehose without joining the
    corpus; only filter-passing shingles (claimed-seen) would need the
    exact index probe. One corpus pass builds the bitset (bit_or,
    mergeable); the probe is map-side against the broadcast."""
    from mini_sql_engine_spark.functions import textfns

    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    sh = docs.select(
        "doc_id",
        F.explode(F.array_distinct(textfns.shingles("text"))).alias("sh"),
    )
    batch = sh.filter(F.col("doc_id") % BNOV_MOD == 0)
    exist_sh = (
        sh.filter(F.col("doc_id") % BNOV_MOD != 0).select("sh").distinct()
    )
    bitset = (
        exist_sh.select(
            F.explode(
                F.array(*[_bn_pos(F.col("sh"), j) for j in range(BNOV_K)])
            ).alias("pos")
        )
        .groupBy(F.floor(F.col("pos") / BF_WORD).cast("long").alias("word_idx"))
        .agg(
            F.expr(
                f"bit_or(shiftleft(CAST(1 AS BIGINT), CAST(pos % {BF_WORD} AS INT)))"
            ).alias("word")
        )
    )
    probed = (
        batch.select(
            "doc_id",
            "sh",
            F.explode(
                F.array(*[_bn_pos(F.col("sh"), j) for j in range(BNOV_K)])
            ).alias("pos"),
        )
        .select(
            "doc_id",
            "sh",
            F.floor(F.col("pos") / BF_WORD).cast("long").alias("word_idx"),
            (F.col("pos") % BF_WORD).cast("int").alias("bit"),
        )
        .join(F.broadcast(bitset), "word_idx", "left")  # absent word = 0
        .groupBy("doc_id", "sh")
        .agg(
            F.expr("sum(coalesce(shiftright(word, bit) & 1, 0))").alias(
                "n_set"
            )
        )
    )
    flags = probed.join(
        exist_sh.withColumn("seen", F.lit(1)), "sh", "left"
    ).select(
        "doc_id",
        (F.col("n_set") < BNOV_K).cast("long").alias("bloom_novel"),
        F.col("seen").isNull().cast("long").alias("exact_novel"),
    )
    return flags.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum("exact_novel").alias("novel_exact"),
        F.sum("bloom_novel").alias("novel_bloom"),
    )


ERASURE_EVERY = 97  # deterministic delete-request list: custkey % 97 == 0


def erasure_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-erasure (GDPR Art. 17) audit: simulate a deletion
    request list (every ERASURE_EVERY-th customer), apply the purge as
    anti-joins across every table keyed by the subject, and PROVE the
    purge with a residual count that must be zero. Orders cascade to
    their lineitems (erasing a customer erases their orders' items) —
    the fan-out a real erasure pipeline must get right.

    Scale: the delete list is customers/ERASURE_EVERY rows — broadcast
    to every anti-join; each table is scanned once; residual checks
    are semi-joins against the same broadcast list. Nothing data-sized
    shuffles."""
    subjects = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % ERASURE_EVERY == 0)
        .select(F.col("c_custkey").alias("skey"))
    )
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    erased_orders = orders.join(
        F.broadcast(subjects), orders.o_custkey == subjects.skey, "left_semi"
    ).select("o_orderkey")

    def audit(
        name: str, df: DataFrame, key: F.Column, purge_keys: DataFrame,
        pk: str,
    ) -> DataFrame:
        purged = df.join(
            F.broadcast(purge_keys), key == purge_keys[pk], "left_semi"
        )
        remaining = df.join(
            F.broadcast(purge_keys), key == purge_keys[pk], "left_anti"
        )
        residual = remaining.join(
            F.broadcast(purge_keys), key == purge_keys[pk], "left_semi"
        )
        return (
            df.agg(F.count(F.lit(1)).alias("n_total"))
            .crossJoin(purged.agg(F.count(F.lit(1)).alias("n_purged")))
            .crossJoin(
                residual.agg(F.count(F.lit(1)).alias("n_residual"))
            )
            .select(F.lit(name).alias("table"), "n_total", "n_purged",
                    "n_residual")
        )

    out = (
        audit("customer", cust, F.col("c_custkey"), subjects, "skey")
        .unionByName(
            audit("orders", orders, F.col("o_custkey"), subjects, "skey")
        )
        .unionByName(
            audit(
                "lineitem",
                li,
                F.col("l_orderkey"),
                erased_orders.select(
                    F.col("o_orderkey").alias("skey")
                ),
                "skey",
            )
        )
    )
    return out


def ldp_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-differential-privacy frequency estimation (randomized
    response, p=1/2): each event reports its TRUE type with
    probability ½, else a uniformly drawn type — so no single report
    reveals anything — and the aggregator debiases with
    n̂_t = 2·c_t − n/k. Complements `ext_dp_release` (central DP:
    trusted aggregator adds noise once) with the local model (no
    trusted aggregator at all). The coin flips are salted hashes of
    the event id, so the whole mechanism is deterministic and
    exactly oracle-checkable, estimator error included.

    Scale notes (100 TB): the type dictionary (k rows) broadcasts;
    everything else is one map-side-combinable count per reported
    type plus a 1-row total. The perturbation is per-row projection
    work — the shape LDP was designed for: the server only ever sees
    k counters.
    """
    ev = load_table(spark, sf_dir, "events").select(
        F.col("event_id").cast("string").alias("eid"), "event_type"
    )
    types = (
        ev.select("event_type")
        .distinct()
        .withColumn(
            "idx",
            # bounded global window: one row per distinct event_type
            F.row_number().over(Window.orderBy("event_type")).cast("long")
            - 1,
        )
    )
    kn = types.agg(F.count(F.lit(1)).alias("k"))
    perturbed = (
        ev.crossJoin(F.broadcast(kn))
        .withColumn(
            "truthful", md5_long(F.col("eid"), salt="ldp1") % 2 == 0
        )
        .withColumn(
            "ridx",
            F.when(
                ~F.col("truthful"),
                md5_long(F.col("eid"), salt="ldp2") % F.col("k"),
            ),
        )
        .join(
            F.broadcast(types.select(F.col("idx").alias("ridx"),
                                     F.col("event_type").alias("rtype"))),
            "ridx",
            "left",
        )
        .select(
            F.coalesce("rtype", "event_type").alias("reported"),
            "event_type",
            "k",
        )
    )
    reported = perturbed.groupBy(
        F.col("reported").alias("event_type")
    ).agg(F.count(F.lit(1)).alias("n_reported"), F.max("k").alias("k"))
    truth = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_true")
    )
    tot = ev.agg(F.count(F.lit(1)).alias("n"))
    est = (
        2.0 * F.col("n_reported") - F.col("n") * 1.0 / F.col("k")
    )
    return (
        truth.join(F.broadcast(reported), "event_type")
        .crossJoin(F.broadcast(tot))
        .select(
            "event_type",
            "n_true",
            "n_reported",
            F.round(est, 4).alias("ldp_est"),
            F.round(
                (est - F.col("n_true")) * 100.0 / F.col("n_true"), 4
            ).alias("err_pct"),
        )
    )


_FP_TABLES = {
    "nation": "CAST(n_nationkey AS VARCHAR) || '|' || n_name || '|' "
    "|| CAST(n_regionkey AS VARCHAR)",
    "region": "CAST(r_regionkey AS VARCHAR) || '|' || r_name",
    "supplier": "CAST(s_suppkey AS VARCHAR) || '|' || s_name || '|' "
    "|| CAST(s_nationkey AS VARCHAR)",
}
_FP_SPARK = {
    "nation": "concat_ws('|', CAST(n_nationkey AS STRING), n_name, "
    "CAST(n_regionkey AS STRING))",
    "region": "concat_ws('|', CAST(r_regionkey AS STRING), r_name)",
    "supplier": "concat_ws('|', CAST(s_suppkey AS STRING), s_name, "
    "CAST(s_nationkey AS STRING))",
}


def dataset_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive dataset fingerprint: per table, XOR-fold of
    per-row canonical-string hashes plus the row count — a commutative
    checksum two replicas can compute independently (any partitioning,
    any row order) and compare in O(1). XOR cancels even-multiplicity
    duplicate rows, which is why the count rides along; a
    multiplicity-sensitive variant would sum hashes in int128 instead.
    Key/string columns only — float columns would need a canonical
    decimal rendering first.

    Scale notes (100 TB): bit_xor is a map-side-combinable aggregate —
    the fingerprint of a 100 TB table shuffles one long per partition.
    This is the cheap answer to "did the migration copy everything",
    before any row-level diff (`ext_snapshot_diff`) runs.
    """
    outs = []
    for t, expr in _FP_SPARK.items():
        df = load_table(spark, sf_dir, t).select(
            F.expr(expr).alias("canon")
        )
        outs.append(
            df.select(md5_long(F.col("canon"), salt="fp").alias("h"))
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.expr("bit_xor(h)").alias("fingerprint"),
            )
            .select(
                F.lit(t).alias("table_name"), "n_rows", "fingerprint"
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


def schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution read: two parquet batches written with
    DIFFERENT schemas (an early 2-column feed, then the feed after a
    column was added) land in one directory; `mergeSchema` unifies
    them and back-fills the missing column with NULLs. The output is
    the per-column presence audit (rows vs non-nulls) a migration
    review reads to see exactly which slice predates the column —
    the ingest-side contract check that schema drift is ADDITIVE.

    Batches stage once per sf_dir under an atomic rename (same
    pattern as the streaming feeds); the audit re-derives from the
    documents table, so the DuckDB oracle never needs the temp dir.

    Scale notes (100 TB): mergeSchema reconciles FOOTERS (per-file
    metadata), not data; the audit is one map-side-combined
    conditional aggregate. Schema-on-read unification is exactly what
    keeps a century of accumulated batches queryable without a
    rewrite.
    """
    import hashlib
    import os
    import tempfile

    digest = hashlib.md5(f"schemaevo|{_stage_token(sf_dir)}".encode()).hexdigest()[:8]
    stage = os.path.join(tempfile.gettempdir(), f"schema_evo_{digest}")
    if not os.path.exists(stage):
        tmp = stage + f".tmp-{os.getpid()}"
        docs = load_table(spark, sf_dir, "documents")
        (
            docs.filter(F.col("doc_id") % 2 == 0)
            .select("doc_id", "lang")
            .write.mode("overwrite")
            .parquet(os.path.join(tmp, "batch=v1"))
        )
        (
            docs.filter(F.col("doc_id") % 2 == 1)
            .select("doc_id", "lang", "n_chars")
            .write.mode("append")
            .parquet(os.path.join(tmp, "batch=v2"))
        )
        try:
            os.rename(tmp, stage)
        except OSError:
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
    merged = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(stage, "batch=v1"), os.path.join(stage, "batch=v2")
    )
    aggs = []
    for c in ("doc_id", "lang", "n_chars"):
        aggs += [
            F.count(F.lit(1)).alias(f"rows_{c}"),
            F.count(c).alias(f"nn_{c}"),
        ]
    one = merged.agg(*aggs)
    stack = ", ".join(
        f"'{c}', rows_{c}, nn_{c}" for c in ("doc_id", "lang", "n_chars")
    )
    return one.selectExpr(
        f"stack(3, {stack}) AS (col_name, n_rows, n_nonnull)"
    )


def xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML source round-trip (Spark 4's built-in XML data source, the
    last built-in batch format the suite didn't exercise): a documents
    projection is written as <doc> row elements and read back with an
    EXPLICIT schema (never inference — inferred types are
    sample-order-dependent), then audited per language: row count,
    character mass, and an integer per-row checksum
    Σ(doc_id·1000003 + n_chars·31 + len(lang)). Green means the
    write→escape→parse→read loop is lossless row-by-row — the oracle
    recomputes the same audit straight from the parquet, so any
    encode/decode mangling breaks the hash.

    Stages once per sf_dir behind an atomic rename (the streaming-feed
    pattern). Scale notes: XML is the interchange wrapper, not the
    analytics format — the demo keeps the payload columns simple and
    the audit is one map-side-combined aggregate; at 100 TB the same
    reader parallelizes per-file like any text source."""
    import hashlib
    import os
    import tempfile

    digest = hashlib.md5(f"xmlrt|{_stage_token(sf_dir)}".encode()).hexdigest()[:8]
    stage = os.path.join(tempfile.gettempdir(), f"xml_rt_{digest}")
    if not os.path.exists(stage):
        tmp = stage + f".tmp-{os.getpid()}"
        (
            load_table(spark, sf_dir, "documents")
            .select("doc_id", "lang", "source", "n_chars")
            .write.format("xml")
            .option("rootTag", "docs")
            .option("rowTag", "doc")
            .mode("overwrite")
            .save(tmp)
        )
        try:
            os.rename(tmp, stage)
        except OSError:
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
    back = (
        spark.read.format("xml")
        .option("rowTag", "doc")
        .schema("doc_id long, lang string, source string, n_chars long")
        .load(stage)
    )
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum(
            F.col("doc_id") * 1000003
            + F.col("n_chars") * 31
            + F.length("source")
        ).alias("row_checksum"),
    )


def _format_roundtrip(
    spark: SparkSession, sf_dir: str, fmt: str, mult: int
) -> DataFrame:
    """Shared core of the JSON/ORC round-trip audits: stage a documents
    projection through ``sources.io.write_any`` once per sf_dir (atomic
    rename), read it back through ``sources.io.read_any`` — JSON with
    an EXPLICIT schema (the 100-TB rule: inference scans twice and
    types drift per file), ORC with its embedded schema — and audit per
    language with an integer per-row checksum
    Σ(doc_id·mult + n_chars·31 + len(source)). The oracle recomputes
    the audit straight from the parquet, so any encode/escape/decode
    mangling in the format loop breaks the hash. ``mult`` differs per
    format so a cross-wired staging dir can't satisfy both entries.

    Scale notes: the write is one pass, the read parallelizes per file
    like any splittable source, and the audit is a single map-side-
    combined aggregate on a tiny (lang) key."""
    import hashlib
    import os
    import tempfile

    from ..sources.io import read_any, write_any

    digest = hashlib.md5(f"{fmt}rt|{_stage_token(sf_dir)}".encode()).hexdigest()[:8]
    stage = os.path.join(tempfile.gettempdir(), f"{fmt}_rt_{digest}")
    if not os.path.exists(stage):
        tmp = stage + f".tmp-{os.getpid()}"
        write_any(
            load_table(spark, sf_dir, "documents").select(
                "doc_id", "lang", "source", "n_chars"
            ),
            tmp,
            fmt,
        )
        try:
            os.rename(tmp, stage)
        except OSError:
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
    schema = (
        "doc_id long, lang string, source string, n_chars long"
        if fmt == "json"
        else None  # ORC files carry their own schema
    )
    back = read_any(spark, stage, fmt, schema=schema)
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum(
            F.col("doc_id") * mult
            + F.col("n_chars") * 31
            + F.length("source")
        ).alias("row_checksum"),
    )


def json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines source round-trip through ``sources.io`` with an
    explicit read schema — see :func:`_format_roundtrip`."""
    return _format_roundtrip(spark, sf_dir, "json", 999983)


def orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC source round-trip through ``sources.io`` (schema embedded in
    the files) — see :func:`_format_roundtrip`."""
    return _format_roundtrip(spark, sf_dir, "orc", 1000033)


def avro_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avro Object Container File round-trip with a FROM-SPEC codec
    (``sources.avro_codec`` — Apache Avro 1.11.1 spec; the sandbox has
    no spark-avro jar, so magic/metadata-map/zigzag-varints/sync-
    markers/deflate blocks are implemented directly, the way the
    from-spec JPEG decoder closed the image row).

    Write: each input partition serializes itself into ONE container
    file via ``mapInPandas`` (distributed encode; staged once per
    sf_dir behind an atomic rename). Read: ``binaryFile`` scan →
    ``mapInPandas`` decode, validating every block's 16-byte sync
    marker. The audit is the shared per-language checksum recomputed
    by the oracle straight from parquet, so any encode/compress/decode
    mangling breaks the hash.

    Scale notes (100 TB): container files parallelize per-file (the
    sync markers exist so real readers can split WITHIN a file; this
    reader keeps whole-file grain, the right call for the staged
    file-per-partition layout). Executors here write to local tmp —
    on a cluster the same ``mapInPandas`` body writes to shared
    storage; nothing driver-side touches row data."""
    import functools
    import hashlib
    import os
    import tempfile

    from ..sources.avro_codec import avro_decode_files, avro_write_partition

    digest = hashlib.md5(f"avrort|{_stage_token(sf_dir)}".encode()).hexdigest()[:8]
    stage = os.path.join(tempfile.gettempdir(), f"avro_rt_{digest}")
    if not os.path.exists(stage):
        tmp = stage + f".tmp-{os.getpid()}"
        os.makedirs(tmp, exist_ok=True)
        manifest = (
            load_table(spark, sf_dir, "documents")
            .select("doc_id", "lang", "source", "n_chars")
            .repartition(4)
            .mapInPandas(
                functools.partial(avro_write_partition, out_dir=tmp),
                schema="path string, n_records long",
            )
        )
        manifest.count()  # run the distributed encode job
        try:
            os.rename(tmp, stage)
        except OSError:
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
    back = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.avro")
        .load(stage)
        .select("content")
        .mapInPandas(
            avro_decode_files,
            schema="doc_id long, lang string, source string, n_chars long",
        )
    )
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum(
            F.col("doc_id") * 1000099
            + F.col("n_chars") * 31
            + F.length("source")
        ).alias("row_checksum"),
    )


L_DIV = 3  # minimum sensitive-value diversity per equivalence class
T_CLOSE = 0.2  # t-closeness threshold
BAL_BAND_CENTS = 100_000  # $1000 account-balance bands (sensitive attr)


def _sensitive_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(quasi-identifier class, sensitive band) counts — shared core of
    the l-diversity and t-closeness audits. Quasi-identifiers match
    `k_anonymity`; the sensitive attribute is the $1000 balance band."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.floor(F.col("c_acctbal") * 100 + 0.5) / BAL_BAND_CENTS)
        .cast("long")
        .alias("band"),
        # t-closeness derives four tables from this projection —
        # checkpoint so the customer scan runs once per call
    ).localCheckpoint(eager=False)


def l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit: distinct sensitive values (balance bands) per
    quasi-identifier equivalence class — the attribute-disclosure
    check k-anonymity misses (a class of 50 rows that all share ONE
    sensitive value leaks it to anyone who can place a person in the
    class). Classes below L_DIV distinct bands flag.

    Scale notes (100 TB): one (class, band) rollup then a class
    rollup — two map-side-combinable shuffles on dimension-bounded
    keys; the nation name attaches by broadcast.
    """
    nation = load_table(spark, sf_dir, "nation")
    per = (
        _sensitive_classes(spark, sf_dir)
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("class_size"),
            F.countDistinct("band").alias("l_count"),
        )
    )
    return per.join(
        F.broadcast(nation), per["c_nationkey"] == nation["n_nationkey"]
    ).select(
        "n_name",
        F.col("c_mktsegment").alias("segment"),
        "class_size",
        F.col("l_count").cast("long").alias("l_count"),
        (F.col("l_count") < L_DIV).cast("int").alias("at_risk"),
    )


def t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit: earth-mover distance between each class's
    sensitive-band distribution and the global one, on the ordered
    band ladder normalized by (m−1) — the strongest of the
    k-anon / l-div / t-close ladder (a class can be diverse yet still
    skewed toward 'all rich'; t-closeness catches exactly that).
    EMD over an ordinal attribute = mean |cumF_class − cumF_global|
    across the m−1 ladder steps; cumulative counts are exact integers
    and the combine runs through qsum.

    Scale notes (100 TB): the grid is classes × bands — both
    dimension-bounded, so the audit costs one rollup plus windows over
    a constant-size grid regardless of row count. The global ladder
    broadcasts.
    """
    from pyspark.sql import Window

    sens = _sensitive_classes(spark, sf_dir)
    classes = sens.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("class_size")
    )
    bands = sens.groupBy("band").agg(F.count(F.lit(1)).alias("g_cnt"))
    cell = sens.groupBy("c_nationkey", "c_mktsegment", "band").agg(
        F.count(F.lit(1)).alias("c_cnt")
    )
    n_tot = sens.agg(F.count(F.lit(1)).alias("n_tot"))
    m = bands.agg(F.count(F.lit(1)).alias("m"))
    # full grid: every class × every global band (zero-filled)
    grid = (
        classes.crossJoin(F.broadcast(bands))
        .join(cell, ["c_nationkey", "c_mktsegment", "band"], "left")
        .select(
            "c_nationkey",
            "c_mktsegment",
            "class_size",
            "band",
            "g_cnt",
            F.coalesce("c_cnt", F.lit(0)).alias("c_cnt"),
        )
    )
    wc = (
        Window.partitionBy("c_nationkey", "c_mktsegment")
        .orderBy("band")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (
        grid.withColumn("cum_c", F.sum("c_cnt").over(wc))
        .withColumn("cum_g", F.sum("g_cnt").over(wc))
        .crossJoin(F.broadcast(n_tot))
        .crossJoin(F.broadcast(m))
        # the last ladder step (cum = total on both sides) contributes
        # |1−1| = 0; keep it out of the mean's m−1 denominator
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("c_nationkey", "c_mktsegment").orderBy(
                    "band"
                )
            ),
        )
        .filter(F.col("rn") < F.col("m"))
    )
    emd = cum.groupBy("c_nationkey", "c_mktsegment", "class_size", "m").agg(
        _qsum(
            F.abs(
                F.col("cum_c") / F.col("class_size")
                - F.col("cum_g") / F.col("n_tot")
            )
        ).alias("emd_q")
    )
    nation = load_table(spark, sf_dir, "nation")
    return emd.join(
        F.broadcast(nation), emd["c_nationkey"] == nation["n_nationkey"]
    ).select(
        "n_name",
        F.col("c_mktsegment").alias("segment"),
        "class_size",
        F.round(F.col("emd_q") / _NANO / (F.col("m") - 1), 6).alias("t_emd"),
        (F.col("emd_q") / _NANO / (F.col("m") - 1) > T_CLOSE)
        .cast("int")
        .alias("at_risk"),
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "ext_l_diversity": l_diversity,
    "ext_t_closeness": t_closeness,
    "ext_schema_evolution": schema_evolution,
    "ext_xml_roundtrip": xml_roundtrip,
    "ext_json_roundtrip": json_roundtrip,
    "ext_orc_roundtrip": orc_roundtrip,
    "ext_avro_roundtrip": avro_roundtrip,
    "ext_ldp_frequency": ldp_frequency,
    "ext_dataset_fingerprint": dataset_fingerprint,
    "ext_erasure_audit": erasure_audit,
    "ext_fuzzy_vocab_join": fuzzy_vocab_join,
    "ext_cms_frequency": cms_frequency,
    "ext_weighted_sample": weighted_sample,
    "ext_snapshot_diff": snapshot_diff,
    "ext_k_anonymity": k_anonymity,
    "ext_value_breakout": value_breakout,
    "ext_incremental_agg": incremental_agg,
    "ext_data_contract": data_contract,
    "ext_pseudonymize": pseudonymize,
    "ext_rollup_lattice": rollup_lattice,
    "ext_bloom_membership": bloom_membership,
    "ext_time_travel_diff": time_travel_diff,
    "ext_bloom_novelty": bloom_novelty,
    "ext_dp_release": dp_release,
}

# DuckDB mirror of hashing.md5_long (same 60-bit truncation)
def _md5_long_sql(expr: str, salt: str) -> str:
    return (
        f"CAST(('0x' || substr(md5('{salt}:' || {expr}), 1, 15)) AS BIGINT)"
    )


_FP_ORACLE_PARTS = " UNION ALL ".join(
    f"""
        SELECT '{t}' AS table_name, COUNT(*) AS n_rows,
               BIT_XOR(CAST('0x' || substr(md5('fp:' || {expr}), 1, 15)
                            AS BIGINT)) AS fingerprint
        FROM {t}
    """
    for t, expr in _FP_TABLES.items()
)

ORACLES: dict[str, str] = {
    "ext_schema_evolution": """
        SELECT 'doc_id' AS col_name, COUNT(*) AS n_rows,
               COUNT(*) AS n_nonnull FROM documents
        UNION ALL
        SELECT 'lang', COUNT(*), COUNT(*) FROM documents
        UNION ALL
        SELECT 'n_chars', COUNT(*),
               CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END)
                    AS BIGINT)
        FROM documents
    """,
    # audit straight from parquet: green proves the XML loop lossless
    "ext_xml_roundtrip": """
        SELECT lang, COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               CAST(SUM(doc_id * 1000003 + n_chars * 31 + len(source))
                    AS BIGINT) AS row_checksum
        FROM documents GROUP BY lang
    """,
    # same audit recomputed from parquet; mult differs per format so a
    # cross-wired staging dir can't satisfy both entries
    "ext_json_roundtrip": """
        SELECT lang, COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               CAST(SUM(doc_id * 999983 + n_chars * 31 + len(source))
                    AS BIGINT) AS row_checksum
        FROM documents GROUP BY lang
    """,
    "ext_orc_roundtrip": """
        SELECT lang, COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               CAST(SUM(doc_id * 1000033 + n_chars * 31 + len(source))
                    AS BIGINT) AS row_checksum
        FROM documents GROUP BY lang
    """,
    "ext_avro_roundtrip": """
        SELECT lang, COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               CAST(SUM(doc_id * 1000099 + n_chars * 31 + len(source))
                    AS BIGINT) AS row_checksum
        FROM documents GROUP BY lang
    """,
    "ext_ldp_frequency": """
        WITH ev AS (SELECT CAST(event_id AS VARCHAR) AS eid,
                           event_type FROM events),
        types AS (
            SELECT event_type,
                   ROW_NUMBER() OVER (ORDER BY event_type) - 1 AS idx
            FROM (SELECT DISTINCT event_type FROM ev)),
        kn AS (SELECT COUNT(*) AS k FROM types),
        pert AS (
            SELECT CASE WHEN CAST('0x' || substr(md5('ldp1:' || eid),
                                                 1, 15) AS BIGINT)
                             % 2 = 0
                        THEN ev.event_type
                        ELSE t.event_type END AS reported
            FROM ev CROSS JOIN kn
            LEFT JOIN types t
              ON t.idx = CAST('0x' || substr(md5('ldp2:' || eid),
                                             1, 15) AS BIGINT) % k),
        rep AS (
            SELECT reported AS event_type, COUNT(*) AS n_reported
            FROM pert GROUP BY reported),
        truth AS (
            SELECT event_type, COUNT(*) AS n_true
            FROM ev GROUP BY event_type),
        tot AS (SELECT COUNT(*) AS n FROM ev)
        SELECT truth.event_type, n_true, n_reported,
               ROUND(2.0 * n_reported - n * 1.0 / k, 4) AS ldp_est,
               ROUND((2.0 * n_reported - n * 1.0 / k - n_true)
                     * 100.0 / n_true, 4) AS err_pct
        FROM truth JOIN rep USING (event_type)
        CROSS JOIN tot CROSS JOIN kn
    """,
    "ext_dataset_fingerprint": _FP_ORACLE_PARTS,
    "ext_erasure_audit": f"""
        WITH subjects AS (
            SELECT c_custkey AS skey FROM customer
            WHERE c_custkey % {ERASURE_EVERY} = 0),
        erased_orders AS (
            SELECT o_orderkey FROM orders
            WHERE o_custkey IN (SELECT skey FROM subjects))
        SELECT 'customer' AS "table",
               (SELECT COUNT(*) FROM customer) AS n_total,
               (SELECT COUNT(*) FROM customer
                WHERE c_custkey IN (SELECT skey FROM subjects)) AS n_purged,
               (SELECT COUNT(*) FROM customer
                WHERE c_custkey NOT IN (SELECT skey FROM subjects)
                  AND c_custkey IN (SELECT skey FROM subjects))
                   AS n_residual
        UNION ALL
        SELECT 'orders',
               (SELECT COUNT(*) FROM orders),
               (SELECT COUNT(*) FROM orders
                WHERE o_custkey IN (SELECT skey FROM subjects)),
               (SELECT COUNT(*) FROM orders
                WHERE o_custkey NOT IN (SELECT skey FROM subjects)
                  AND o_custkey IN (SELECT skey FROM subjects))
        UNION ALL
        SELECT 'lineitem',
               (SELECT COUNT(*) FROM lineitem),
               (SELECT COUNT(*) FROM lineitem
                WHERE l_orderkey IN (SELECT o_orderkey FROM erased_orders)),
               (SELECT COUNT(*) FROM lineitem
                WHERE l_orderkey NOT IN
                      (SELECT o_orderkey FROM erased_orders)
                  AND l_orderkey IN (SELECT o_orderkey FROM erased_orders))
    """,
    "ext_dp_release": f"""
        WITH c AS (
            SELECT lang, source, COUNT(*) AS n_true
            FROM documents GROUP BY lang, source
        ),
        s AS (
            SELECT lang, source, n_true,
                   ({_md5_long_sql("lang || '|' || source", "dp")})
                       % {_DP_U52} / {float(_DP_U52)!r} - 0.5 AS u
            FROM c
        )
        SELECT lang, source, n_true,
               ROUND(n_true + (-(1.0 / {DP_EPS!r}) * sign(u)
                               * ln(1 - 2 * abs(u))), 6) AS n_released,
               ROUND(abs((1.0 / {DP_EPS!r}) * ln(1 - 2 * abs(u))), 6) AS abs_err
        FROM s
    """,
    "ext_bloom_novelty": """
        WITH base AS (
            SELECT doc_id,
                   list_distinct([array_to_string(toks[i:i+2], ' ')
                                  for i in range(1, len(toks) - 1)]) AS shs
            FROM (SELECT doc_id, string_split_regex(text, '\\s+') AS toks
                  FROM documents)),
        sh AS (SELECT doc_id, unnest(shs) AS sh FROM base),
        batch AS (SELECT * FROM sh WHERE doc_id % 5 = 0),
        exist AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 5 != 0),
        epos AS (SELECT unnest([CAST(('0x' || substr(md5('bn0:' || sh), 1, 15)) AS BIGINT) % 131072 , CAST(('0x' || substr(md5('bn1:' || sh), 1, 15)) AS BIGINT) % 131072 , CAST(('0x' || substr(md5('bn2:' || sh), 1, 15)) AS BIGINT) % 131072]) AS pos FROM exist),
        bitset AS (
            SELECT CAST(FLOOR(pos / 63) AS BIGINT) AS word_idx,
                   bit_or(CAST(1 AS BIGINT) << CAST(pos % 63 AS INT)) AS word
            FROM epos GROUP BY 1),
        bpos AS (SELECT doc_id, sh, unnest([CAST(('0x' || substr(md5('bn0:' || sh), 1, 15)) AS BIGINT) % 131072 , CAST(('0x' || substr(md5('bn1:' || sh), 1, 15)) AS BIGINT) % 131072 , CAST(('0x' || substr(md5('bn2:' || sh), 1, 15)) AS BIGINT) % 131072]) AS pos
                 FROM batch),
        probed AS (
            SELECT p.doc_id, p.sh,
                   SUM(COALESCE((b.word >> CAST(p.pos % 63 AS INT)) & 1, 0))
                       AS n_set
            FROM bpos p LEFT JOIN bitset b
              ON CAST(FLOOR(p.pos / 63) AS BIGINT) = b.word_idx
            GROUP BY p.doc_id, p.sh),
        flags AS (
            SELECT p.doc_id,
                   CASE WHEN p.n_set < 3 THEN 1 ELSE 0 END AS bloom_novel,
                   CASE WHEN e.sh IS NULL THEN 1 ELSE 0 END AS exact_novel
            FROM probed p LEFT JOIN exist e ON p.sh = e.sh)
        SELECT doc_id, COUNT(*) AS n_shingles,
               CAST(SUM(exact_novel) AS BIGINT) AS novel_exact,
               CAST(SUM(bloom_novel) AS BIGINT) AS novel_bloom
        FROM flags GROUP BY doc_id
    """,
    # recomputed straight from orders — green <=> writer commit,
    # version archival, and the versionAsOf read all round-tripped
    "ext_time_travel_diff": f"""
        WITH v1 AS (
            SELECT o_orderkey,
                   CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
            FROM orders),
        v2 AS (
            SELECT o_orderkey,
                   CASE WHEN o_orderkey % {DIFF_MOD} IN (4, 5)
                        THEN cents + {int(PRICE_BUMP) * 100}
                        ELSE cents END AS cents
            FROM v1 WHERE o_orderkey % {DIFF_MOD} != 3
            UNION ALL
            SELECT o_orderkey + 10000000, cents
            FROM v1 WHERE o_orderkey % {DIFF_MOD} = 6),
        d AS (
            SELECT CASE WHEN a.o_orderkey IS NULL THEN 'added'
                        WHEN b.o_orderkey IS NULL THEN 'removed'
                        WHEN a.cents != b.cents THEN 'changed'
                        ELSE 'unchanged' END AS status
            FROM v1 a FULL OUTER JOIN v2 b USING (o_orderkey))
        SELECT status, COUNT(*) AS n_rows FROM d GROUP BY status
    """,
    "ext_bloom_membership": """
        WITH keys AS (SELECT c_name AS key FROM customer),
        kpos AS (
            SELECT key, unnest([CAST(('0x' || substr(md5('bf0:' || key), 1, 15)) AS BIGINT) % 16384, CAST(('0x' || substr(md5('bf1:' || key), 1, 15)) AS BIGINT) % 16384, CAST(('0x' || substr(md5('bf2:' || key), 1, 15)) AS BIGINT) % 16384]) AS pos
            FROM keys),
        bitset AS (
            SELECT CAST(FLOOR(pos / 63) AS BIGINT) AS word_idx,
                   bit_or(CAST(1 AS BIGINT) << CAST(pos % 63 AS INT))
                       AS word
            FROM kpos GROUP BY 1),
        stats AS (SELECT CAST(SUM(bit_count(word)) AS BIGINT) AS bits_set
                  FROM bitset),
        mem AS (
            SELECT k.key,
                   SUM((b.word >> CAST(k.pos % 63 AS INT)) & 1) AS n_set
            FROM kpos k JOIN bitset b
              ON CAST(FLOOR(k.pos / 63) AS BIGINT) = b.word_idx
            GROUP BY k.key),
        fk AS (SELECT 'probe:' || CAST(range AS VARCHAR) AS key
               FROM range(1000)),
        fpos AS (
            SELECT key, unnest([CAST(('0x' || substr(md5('bf0:' || key), 1, 15)) AS BIGINT) % 16384, CAST(('0x' || substr(md5('bf1:' || key), 1, 15)) AS BIGINT) % 16384, CAST(('0x' || substr(md5('bf2:' || key), 1, 15)) AS BIGINT) % 16384]) AS pos
            FROM fk),
        fmem AS (
            SELECT f.key,
                   SUM((b.word >> CAST(f.pos % 63 AS INT)) & 1) AS n_set
            FROM fpos f JOIN bitset b
              ON CAST(FLOOR(f.pos / 63) AS BIGINT) = b.word_idx
            GROUP BY f.key),
        ms AS (SELECT COUNT(*) AS n_keys,
                      CAST(SUM(CASE WHEN n_set < 3 THEN 1 ELSE 0 END)
                           AS BIGINT) AS n_members_missed
               FROM mem),
        fs AS (SELECT COUNT(*) AS n_probes,
                      CAST(SUM(CASE WHEN n_set = 3 THEN 1 ELSE 0 END)
                           AS BIGINT) AS false_positives
               FROM fmem)
        SELECT ms.n_keys, stats.bits_set, ms.n_members_missed,
               fs.n_probes, fs.false_positives
        FROM ms, stats, fs
    """,
    "ext_pseudonymize": f"""
        WITH p AS (
            SELECT CAST(('0x' || substr(md5('{PSEUDO_SALT}:'
                         || CAST(c_custkey AS VARCHAR)), 1, 15)) AS BIGINT)
                       AS pseudonym
            FROM customer),
        per AS (SELECT pseudonym, COUNT(*) AS n_keys FROM p
                GROUP BY pseudonym)
        SELECT n_keys, COUNT(*) AS n_pseudonyms FROM per GROUP BY n_keys
    """,
    # months computed DIRECTLY from raw events — green <=> the Spark
    # side's month-from-daily re-aggregation is exact (lattice property)
    "ext_rollup_lattice": """
        WITH m AS (
            SELECT strftime(ts, '%Y-%m') AS month, event_type,
                   COUNT(*) AS n_events,
                   CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS cents,
                   COUNT(DISTINCT strftime(ts, '%Y-%m-%d')) AS n_days
            FROM events GROUP BY 1, 2)
        SELECT month, event_type, n_events, cents, n_days FROM m
    """,
    "ext_data_contract": '''
        SELECT 'orders_key_not_null' AS check_name,
               CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_violations,
               CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) = 0
                    AS INT) AS passed
        FROM orders
        UNION ALL
        SELECT 'orders_key_unique',
               CAST(COALESCE(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END), 0)
                    AS BIGINT),
               CAST(COALESCE(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END), 0) = 0
                    AS INT)
        FROM (SELECT o_orderkey, COUNT(*) AS c FROM orders
              GROUP BY o_orderkey) t
        UNION ALL
        SELECT 'orders_customer_fk', CAST(COUNT(*) AS BIGINT),
               CAST(COUNT(*) = 0 AS INT)
        FROM orders o WHERE NOT EXISTS (
            SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
        UNION ALL
        SELECT 'lineitem_orders_fk', CAST(COUNT(*) AS BIGINT),
               CAST(COUNT(*) = 0 AS INT)
        FROM lineitem l WHERE NOT EXISTS (
            SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
        UNION ALL
        SELECT 'quantity_in_range',
               CAST(SUM(CASE WHEN l_quantity NOT BETWEEN 1 AND 50
                        THEN 1 ELSE 0 END) AS BIGINT),
               CAST(SUM(CASE WHEN l_quantity NOT BETWEEN 1 AND 50
                        THEN 1 ELSE 0 END) = 0 AS INT)
        FROM lineitem
        UNION ALL
        SELECT 'price_positive',
               CAST(SUM(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END)
                    AS BIGINT),
               CAST(SUM(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END) = 0
                    AS INT)
        FROM lineitem
        UNION ALL
        SELECT 'orderstatus_accepted',
               CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
                        THEN 1 ELSE 0 END) AS BIGINT),
               CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
                        THEN 1 ELSE 0 END) = 0 AS INT)
        FROM orders
        UNION ALL
        SELECT 'acctbal_not_null',
               CAST(SUM(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT),
               CAST(SUM(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END) = 0
                    AS INT)
        FROM customer
    ''',
    # direct re-aggregation of the v2 table — green <=> the delta-only
    # maintenance on the Spark side is exact
    "ext_incremental_agg": f"""
        WITH v1 AS (
            SELECT o_orderkey, o_custkey,
                   CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
            FROM orders),
        v2 AS (
            SELECT o_orderkey, o_custkey,
                   CASE WHEN o_orderkey % {DIFF_MOD} IN (4, 5)
                        THEN cents + {int(PRICE_BUMP) * 100}
                        ELSE cents END AS cents
            FROM v1 WHERE o_orderkey % {DIFF_MOD} != 3
            UNION ALL
            SELECT o_orderkey + 10000000, o_custkey, cents
            FROM v1 WHERE o_orderkey % {DIFF_MOD} = 6)
        SELECT o_custkey, COUNT(*) AS n_orders,
               CAST(SUM(cents) AS BIGINT) AS total_cents
        FROM v2 GROUP BY o_custkey
    """,
    # the NAIVE quadratic threshold join — green <=> the SymSpell
    # deletion blocking on the Spark side is lossless at distance 1
    "ext_fuzzy_vocab_join": f"""
        WITH v AS (SELECT DISTINCT c_name FROM customer)
        SELECT a.c_name AS name_a, b.c_name AS name_b
        FROM v a JOIN v b
          ON a.c_name < b.c_name
         AND levenshtein(a.c_name, b.c_name) <= {EDIT_MAX}
    """,
    "ext_cms_frequency": f"""
        WITH toks AS (
            SELECT unnest(string_split_regex(text, '\\s+')) AS tok
            FROM documents),
        hashed AS (
            SELECT tok,
                   {" , ".join(_md5_long_sql("tok", f"cms{r}") + f" % {CMS_WIDTH} AS b{r}" for r in range(CMS_DEPTH))}
            FROM toks),
        cells AS (
            {" UNION ALL ".join(f"SELECT {r} AS row, b{r} AS bucket, COUNT(*) AS cnt FROM hashed GROUP BY b{r}" for r in range(CMS_DEPTH))}),
        truth AS (SELECT tok, COUNT(*) AS true_cnt,
                         {" , ".join(f"MIN(b{r}) AS b{r}" for r in range(CMS_DEPTH))}
                  FROM hashed GROUP BY tok),
        est AS (
            SELECT t.tok, t.true_cnt, MIN(c.cnt) AS cms_est
            FROM truth t JOIN cells c
              ON ({" OR ".join(f"(c.row = {r} AND c.bucket = t.b{r})" for r in range(CMS_DEPTH))})
            GROUP BY t.tok, t.true_cnt)
        SELECT tok, true_cnt, cms_est, cms_est - true_cnt AS overestimate
        FROM est
    """,
    "ext_weighted_sample": f"""
        WITH pri AS (
            SELECT doc_id, lang, n_chars,
                   {_md5_long_sql("CAST(doc_id AS VARCHAR)", "ws")} // n_chars
                       AS priority
            FROM documents),
        ranked AS (
            SELECT *, ROW_NUMBER() OVER (
                       PARTITION BY lang ORDER BY priority, doc_id) AS rank
            FROM pri)
        SELECT doc_id, lang, n_chars, priority, rank
        FROM ranked WHERE rank <= {WS_K}
    """,
    "ext_snapshot_diff": f"""
        WITH v1 AS (SELECT o_orderkey, o_totalprice FROM orders),
        v2 AS (
            SELECT o_orderkey,
                   CASE WHEN o_orderkey % {DIFF_MOD} IN (4, 5)
                        THEN o_totalprice + {PRICE_BUMP}
                        ELSE o_totalprice END AS o_totalprice
            FROM v1 WHERE o_orderkey % {DIFF_MOD} != 3
            UNION ALL
            SELECT o_orderkey + 10000000, o_totalprice
            FROM v1 WHERE o_orderkey % {DIFF_MOD} = 6),
        d AS (
            SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
                   a.o_totalprice AS old_price,
                   b.o_totalprice AS new_price,
                   CASE WHEN a.o_orderkey IS NULL THEN 'added'
                        WHEN b.o_orderkey IS NULL THEN 'removed'
                        WHEN a.o_totalprice != b.o_totalprice THEN 'changed'
                        ELSE 'unchanged' END AS status
            FROM v1 a FULL OUTER JOIN v2 b USING (o_orderkey))
        SELECT * FROM d WHERE status != 'unchanged'
    """,
    "ext_l_diversity": f"""
        WITH
        sens AS (
            SELECT c_nationkey, c_mktsegment,
                   CAST(FLOOR(FLOOR(c_acctbal * 100 + 0.5) / 100000)
                        AS BIGINT) AS band
            FROM customer),
        per AS (
            SELECT c_nationkey, c_mktsegment, COUNT(*) AS class_size,
                   CAST(COUNT(DISTINCT band) AS BIGINT) AS l_count
            FROM sens GROUP BY 1, 2)
        SELECT n_name, c_mktsegment AS segment, class_size, l_count,
               CAST(l_count < {L_DIV} AS INT) AS at_risk
        FROM per JOIN nation ON n_nationkey = c_nationkey
    """,
    "ext_t_closeness": f"""
        WITH
        sens AS (
            SELECT c_nationkey, c_mktsegment,
                   CAST(FLOOR(FLOOR(c_acctbal * 100 + 0.5) / 100000)
                        AS BIGINT) AS band
            FROM customer),
        classes AS (
            SELECT c_nationkey, c_mktsegment, COUNT(*) AS class_size
            FROM sens GROUP BY 1, 2),
        bands AS (SELECT band, COUNT(*) AS g_cnt FROM sens GROUP BY band),
        cell AS (
            SELECT c_nationkey, c_mktsegment, band, COUNT(*) AS c_cnt
            FROM sens GROUP BY 1, 2, 3),
        nt AS (SELECT COUNT(*) AS n_tot FROM sens),
        mm AS (SELECT COUNT(*) AS m FROM bands),
        grid AS (
            SELECT c.c_nationkey, c.c_mktsegment, c.class_size,
                   b.band, b.g_cnt, COALESCE(x.c_cnt, 0) AS c_cnt
            FROM classes c CROSS JOIN bands b
            LEFT JOIN cell x
              ON x.c_nationkey = c.c_nationkey
             AND x.c_mktsegment = c.c_mktsegment
             AND x.band = b.band),
        cum AS (
            SELECT g.*, n_tot, m,
                   SUM(c_cnt) OVER (PARTITION BY g.c_nationkey,
                       g.c_mktsegment ORDER BY band
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cum_c,
                   SUM(g_cnt) OVER (PARTITION BY g.c_nationkey,
                       g.c_mktsegment ORDER BY band
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cum_g,
                   ROW_NUMBER() OVER (PARTITION BY g.c_nationkey,
                       g.c_mktsegment ORDER BY band) AS rn
            FROM grid g CROSS JOIN nt CROSS JOIN mm),
        emd AS (
            SELECT c_nationkey, c_mktsegment, class_size, m,
                   CAST(SUM(CAST(FLOOR(ABS(cum_c / class_size
                       - cum_g / n_tot) * {_NANO} + 0.5) AS BIGINT))
                       AS BIGINT) AS emd_q
            FROM cum WHERE rn < m GROUP BY 1, 2, 3, 4)
        SELECT n_name, c_mktsegment AS segment, class_size,
               ROUND(emd_q / {_NANO} / (m - 1), 6) AS t_emd,
               CAST(emd_q / {_NANO} / (m - 1) > {T_CLOSE} AS INT)
                   AS at_risk
        FROM emd JOIN nation ON n_nationkey = c_nationkey
    """,
    "ext_k_anonymity": f"""
        SELECT n.n_name, c.c_mktsegment AS segment,
               COUNT(*) AS class_size,
               CAST(COUNT(*) < {K_ANON} AS INT) AS at_risk
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name, c.c_mktsegment
    """,
    "ext_value_breakout": f"""
        WITH scr AS (
            SELECT user_id, event_id, value,
                   MIN(value) OVER w AS lo,
                   MAX(value) OVER w AS hi,
                   COUNT(value) OVER w AS n_prior
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN {BREAKOUT_LOOKBACK} PRECEDING
                                  AND 1 PRECEDING))
        SELECT user_id, event_id, value, lo, hi,
               CASE WHEN value > hi * {BREAKOUT_HI} THEN 'spike'
                    ELSE 'collapse' END AS kind
        FROM scr
        WHERE n_prior = {BREAKOUT_LOOKBACK}
          AND (value > hi * {BREAKOUT_HI} OR value < lo * {BREAKOUT_LO})
    """,
}


MERKLE_ARITY = 16
MERKLE_LEVELS = 4  # 16^4 = 65,536 leaf capacity >= every testdata SF


def merkle_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merkle-tree dataset fingerprint (Merkle 1987 — public): leaf =
    md5 of the canonical row encoding, each level hashes the
    child-bucket hashes in child order (16-ary, 4 levels — capacity
    65,536 rows). The root hash certifies the whole table; two
    versions of a dataset diff in O(log n) comparisons by descending
    only into buckets whose hashes differ — the integrity primitive
    behind dataset version audits (complements the time-travel reads
    and the CDC operators). Output: levels 2..4 (bucket hashes + the
    root), small at every scale.

    The oracle rebuilds the identical tree with chained
    string_agg-ordered CTEs, so any row mutation, dropped row, or
    child-ordering bug flips hashes all the way to the root.

    Scale notes (100 TB): each level is one map-side-combinable
    groupBy on a key that shrinks 16× per level; leaf hashing is
    embarrassingly parallel. The same shape backs content-addressed
    storage manifests; arity trades tree depth for per-node fanout."""
    docs = load_table(spark, sf_dir, "documents")
    cur = docs.select(
        F.col("doc_id").cast("long").alias("b"),
        F.md5(
            F.concat_ws(
                "|",
                F.col("doc_id").cast("string"),
                "lang",
                F.col("n_chars").cast("string"),
                F.md5("text"),
            )
        ).alias("h"),
    )
    levels: dict[int, DataFrame] = {}
    for k in range(1, MERKLE_LEVELS + 1):
        cur = (
            cur.groupBy(F.floor(F.col("b") / MERKLE_ARITY).alias("b"))
            .agg(
                F.md5(
                    F.concat_ws(
                        "",
                        F.transform(
                            F.array_sort(
                                F.collect_list(F.struct("b", "h"))
                            ),
                            lambda s: s["h"],
                        ),
                    )
                ).alias("h")
            )
        )
        levels[k] = cur.select(
            F.lit(k).cast("long").alias("level"), F.col("b").cast("long"), "h"
        )
    out = levels[2]
    for k in range(3, MERKLE_LEVELS + 1):
        out = out.unionByName(levels[k])
    return out


QUERIES["ext_merkle_fingerprint"] = merkle_fingerprint

ORACLES["ext_merkle_fingerprint"] = f"""
    WITH l0 AS (
        SELECT doc_id AS b,
               md5(CAST(doc_id AS VARCHAR) || '|' || lang || '|' ||
                   CAST(n_chars AS VARCHAR) || '|' || md5(text)) AS h
        FROM documents),
    l1 AS (SELECT b // {MERKLE_ARITY} AS b,
                  md5(string_agg(h, '' ORDER BY b)) AS h
           FROM l0 GROUP BY b // {MERKLE_ARITY}),
    l2 AS (SELECT b // {MERKLE_ARITY} AS b,
                  md5(string_agg(h, '' ORDER BY b)) AS h
           FROM l1 GROUP BY b // {MERKLE_ARITY}),
    l3 AS (SELECT b // {MERKLE_ARITY} AS b,
                  md5(string_agg(h, '' ORDER BY b)) AS h
           FROM l2 GROUP BY b // {MERKLE_ARITY}),
    l4 AS (SELECT b // {MERKLE_ARITY} AS b,
                  md5(string_agg(h, '' ORDER BY b)) AS h
           FROM l3 GROUP BY b // {MERKLE_ARITY})
    SELECT CAST(2 AS BIGINT) AS level, CAST(b AS BIGINT) AS b, h FROM l2
    UNION ALL
    SELECT 3, b, h FROM l3
    UNION ALL
    SELECT 4, b, h FROM l4
"""


MERKLE_MUT_MOD = 97  # v2 mutates docs with doc_id % 97 == 13


def merkle_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merkle DIFF LOCALIZATION — the use-case
    :func:`merkle_fingerprint` exists for: version 2 of the documents
    table mutates a deterministic ~1% slice (doc_id % MERKLE_MUT_MOD
    == 13 gets its n_chars bumped), both versions build the same
    16-ary tree, and the diff walk compares hashes level by level —
    only buckets whose hashes differ need descending, so the changed
    rows are localized by comparing O(changed · log n) hashes instead
    of re-scanning either version. Output: per level (4 → 0), how many
    buckets exist and how many differ; level 0 differing "buckets" ARE
    the mutated rows, so the walk provably bottoms out at exactly the
    mutation slice.

    The oracle computes the differing-bucket counts directly from the
    mutation predicate (a bucket differs iff it CONTAINS a mutated
    doc), so any hash-propagation bug — a mutation that fails to flip
    every ancestor hash — breaks the comparison.

    Scale notes (100 TB): both trees build with the log-shrinking
    groupBy ladder of the fingerprint; the diff itself joins hash
    tables level-wise on bucket id (broadcast — level tables shrink
    16× per level). This is how content-addressed replication ships
    only changed blocks."""
    docs = load_table(spark, sf_dir, "documents")

    def leaf(df: DataFrame, bump) -> DataFrame:
        return df.select(
            F.col("doc_id").cast("long").alias("b"),
            F.md5(
                F.concat_ws(
                    "|",
                    F.col("doc_id").cast("string"),
                    "lang",
                    (F.col("n_chars") + bump).cast("string"),
                    F.md5("text"),
                )
            ).alias("h"),
        )

    mutated = F.when(
        F.col("doc_id") % MERKLE_MUT_MOD == 13, F.lit(1)
    ).otherwise(F.lit(0))
    trees = {}
    for tag, bump in (("v1", F.lit(0)), ("v2", mutated)):
        cur = leaf(docs, bump)
        levels = [cur]
        for _ in range(MERKLE_LEVELS):
            cur = cur.groupBy(
                F.floor(F.col("b") / MERKLE_ARITY).alias("b")
            ).agg(
                F.md5(
                    F.concat_ws(
                        "",
                        F.transform(
                            F.array_sort(F.collect_list(F.struct("b", "h"))),
                            lambda s: s["h"],
                        ),
                    )
                ).alias("h")
            )
            levels.append(cur)
        trees[tag] = levels
    out = None
    for lvl in range(MERKLE_LEVELS + 1):
        a = trees["v1"][lvl].withColumnRenamed("h", "h1")
        b = trees["v2"][lvl].withColumnRenamed("h", "h2")
        cmp = a.join(b, "b").select(
            F.lit(lvl).cast("long").alias("level"),
            (F.col("h1") != F.col("h2")).cast("long").alias("differs"),
        )
        agg = cmp.groupBy("level").agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.sum("differs").alias("n_differing"),
        )
        out = agg if out is None else out.unionByName(agg)
    return out


QUERIES["ext_merkle_diff"] = merkle_diff

# direct oracle: a bucket differs iff it contains a mutated doc
ORACLES["ext_merkle_diff"] = f"""
    WITH d AS (
        SELECT doc_id,
               CASE WHEN doc_id % {MERKLE_MUT_MOD} = 13 THEN 1 ELSE 0 END
                   AS mut
        FROM documents),
    lv AS (SELECT unnest(range(0, {MERKLE_LEVELS + 1})) AS level)
    SELECT CAST(lv.level AS BIGINT) AS level,
           CAST(COUNT(DISTINCT doc_id
                      // POWER({MERKLE_ARITY}, lv.level)::BIGINT)
                AS BIGINT) AS n_buckets,
           CAST(COUNT(DISTINCT CASE WHEN mut = 1 THEN doc_id
                      // POWER({MERKLE_ARITY}, lv.level)::BIGINT END)
                AS BIGINT) AS n_differing
    FROM d CROSS JOIN lv
    GROUP BY lv.level
"""
