"""Ledger-auditing pack: Benford digit audit, CDC changelog apply,
EWMA trend smoothing, Pareto (skyline) frontier.

The reference engine's users run ad-hoc integrity checks over ingested
fact tables (SURVEY.md §2.2 scans + aggregations); these four
operators are the audit-side queries a data platform team layers on
top of that surface. Each is a pure DataFrame computation with an
exact DuckDB oracle; every output column is an integer, a raw
pass-through value, or a formatted date string, so the driver's
repr-exact hash compare cannot be tripped by float reduction order.

- ``ext_benford_audit``: first-significant-digit distribution of
  o_totalprice vs the Benford expectation — the classic synthetic- or
  corrupted-data screen. Digits come from the decimal string (no
  log10 near a power-of-ten boundary); observed and expected rates are
  integer parts-per-million, the expected ppm embedded as literals
  computed once in Python so both engines compare against identical
  constants.
- ``ext_cdc_apply``: ordered change-data-capture apply. A
  deterministic changelog (INSERT for every key, UPDATE for keys
  divisible by 3, DELETE for keys divisible by 7, strictly increasing
  seq) is folded to final table state: last event per key wins,
  deletes drop the key. This is the ordered-log counterpart of
  ``ext_merge_upsert`` (single-batch MERGE) — the semantics a Delta/
  Hudi/Iceberg CDF consumer applies.
- ``ext_ewma_daily``: exponentially-weighted moving average of daily
  revenue with alpha = 1/2 truncated to a {K}-day trailing window.
  Weights are powers of two on integer cents, so the weighted sum is
  an exact BIGINT in both engines; the only float op is one IEEE
  divide of exactly-representable integers, identical everywhere.
- ``ext_fd_violations``: functional-dependency audit over declared
  FD specs (key → attribute that holds, denormalization FDs the data
  violates) — lhs group counts, violating-group counts, integer-ppm
  violation rate, worst rhs cardinality. One map-side-combinable
  two-level aggregation per FD.
- ``ext_pareto_frontier``: the skyline of distinct (p_retailprice,
  p_size) pairs — pairs no other pair beats on both price (lower
  better) and size (higher better). The Spark side is the O(n log n)
  sort + running-max formulation; the oracle is the literal NOT
  EXISTS dominance definition, so the two engines agree from
  independent constructions.

Scale notes (100 TB):
- benford: one map-side-combinable groupBy over 9 digit values; the
  window total runs on the 9-row digit table. No data-sized shuffle
  beyond the partial-agg combine.
- cdc_apply: the changelog shuffles once on key (window per key);
  at production scale this is the standard CDF-apply shape and the
  per-key event count is bounded (3 here). A billion-key log is a
  single hash-partitioned window — no global order anywhere.
- ewma: the daily rollup reduces 100 TB of orders to a dates-sized
  table (map-side combine), and the 16-lag window runs over that tiny
  series on one task. Per-key EWMAs at scale would partition the same
  window by key — same plan, hash-distributed.
- pareto: the running-max skyline needs one global sort of the
  DISTINCT pair table — pairs-sized, not data-sized (the groupBy
  collapses duplicates map-side first). The quadratic NOT EXISTS
  stays oracle-only.
"""

from __future__ import annotations

import math
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from mini_sql_engine_spark.catalog import load_table
from mini_sql_engine_spark.functions import vector
from mini_sql_engine_spark.functions.ranking import range_prefix

# --- benford --------------------------------------------------------

# Expected first-digit rate, integer ppm: floor(log10(1 + 1/d) * 1e6).
# Computed once here and embedded as literals in BOTH engines' plans.
BENFORD_PPM: dict[int, int] = {
    d: math.floor(math.log10(1.0 + 1.0 / d) * 1_000_000) for d in range(1, 10)
}

# --- cdc ------------------------------------------------------------

UPDATE_EVERY = 3  # keys divisible by this get an UPDATE event
DELETE_EVERY = 7  # keys divisible by this get a DELETE event
UPDATE_BUMP_CENTS = 12_345  # deterministic price bump on UPDATE

# --- ewma -----------------------------------------------------------

EWMA_K = 16  # trailing window length; weight of lag i is 2**(K-1-i)

# --------------------------------------------------------------------


def _cents(col: str) -> F.Column:
    """Exact integer cents from a 2-decimal DOUBLE (TESTDATA.md: all
    monetary columns carry 2 decimals; same construction as
    ext_gap_fill_daily)."""
    return F.floor(F.col(col) * 100 + F.lit(0.5)).cast("long")


def benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-digit distribution of o_totalprice vs Benford, in ppm.

    The digit is the first character of the integer part's decimal
    string — never log10, whose ulp behaviour at 10^k boundaries could
    differ between engines. rate_ppm = floor(n * 1e6 / total): the
    numerator is an exact integer-valued double and the divide is one
    IEEE op, identical in both engines."""
    orders = load_table(spark, sf_dir, "orders")
    digits = orders.select(
        F.substring(
            F.floor("o_totalprice").cast("long").cast("string"), 1, 1
        )
        .cast("int")
        .alias("digit")
    )
    counts = digits.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    total = F.sum("n").over(Window.partitionBy())
    expected = F.element_at(
        F.create_map(
            *[F.lit(x) for d, p in BENFORD_PPM.items() for x in (d, p)]
        ),
        F.col("digit"),
    )
    return counts.select(
        "digit",
        "n",
        F.floor(F.col("n") * 1_000_000 / total).cast("long").alias("rate_ppm"),
        expected.cast("long").alias("benford_ppm"),
        (
            F.floor(F.col("n") * 1_000_000 / total).cast("long")
            - expected.cast("long")
        ).alias("delta_ppm"),
    )


def cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fold a deterministic ordered changelog to final table state.

    Events per key (seq strictly increasing): INSERT(cents) always;
    UPDATE(cents + bump) when key % UPDATE_EVERY == 0; DELETE when
    key % DELETE_EVERY == 0. Apply = keep the highest-seq event per
    key, drop keys whose last event is the DELETE."""
    base = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("key"), _cents("o_totalprice").alias("cents")
    )
    ins = base.select(
        "key", F.lit(1).alias("seq"), F.lit("I").alias("op"), "cents"
    )
    upd = base.filter(F.col("key") % UPDATE_EVERY == 0).select(
        "key",
        F.lit(2).alias("seq"),
        F.lit("U").alias("op"),
        (F.col("cents") + UPDATE_BUMP_CENTS).alias("cents"),
    )
    dele = base.filter(F.col("key") % DELETE_EVERY == 0).select(
        "key",
        F.lit(3).alias("seq"),
        F.lit("D").alias("op"),
        F.lit(None).cast("long").alias("cents"),
    )
    log = ins.unionByName(upd).unionByName(dele)
    wk = Window.partitionBy("key")
    ranked = log.select(
        "key",
        "op",
        "cents",
        F.row_number()
        .over(wk.orderBy(F.col("seq").desc()))
        .alias("rn"),
        F.count(F.lit(1)).over(wk).cast("long").alias("n_events"),
    )
    return (
        ranked.filter((F.col("rn") == 1) & (F.col("op") != "D"))
        .select(
            "key",
            F.col("op").alias("last_op"),
            F.col("cents").alias("final_cents"),
            "n_events",
        )
    )


def ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA(alpha=1/2) of daily revenue, truncated to EWMA_K lags.

    Daily totals are exact integer cents; the weighted numerator and
    denominator are exact BIGINTs built from EWMA_K explicit lag()
    terms with power-of-two weights (newest highest). ewma_cents =
    floor(num / den) — num is integer-valued and < 2^53, so the one
    IEEE divide is identical in both engines. Gaps in the calendar are
    treated as absent observations (see ext_gap_fill_daily for the
    densification operator)."""
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.date_format("o_orderdate", "yyyy-MM-dd").alias("day"))
        .agg(F.sum(_cents("o_totalprice")).alias("cents"))
    )
    # bounded global window: calendar-days ladder (~thousands of rows)
    w = Window.orderBy("day")
    num = F.lit(0).cast("long")
    den = F.lit(0).cast("long")
    for i in range(EWMA_K):
        weight = 1 << (EWMA_K - 1 - i)
        lagged = F.lag("cents", i).over(w)
        num = num + F.coalesce(lagged, F.lit(0)) * weight
        den = den + F.when(lagged.isNotNull(), F.lit(weight)).otherwise(0)
    return daily.select(
        "day",
        "cents",
        F.floor(num / den).cast("long").alias("ewma_cents"),
    )


def pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline of distinct (p_retailprice asc-better, p_size desc-
    better) pairs, with the number of parts carrying each pair.

    Order pairs by (price asc, size desc); a pair is dominated iff the
    running max of size over strictly-preceding rows reaches its own
    size (preceding rows are cheaper, or same-price-bigger). The
    running max is range_prefix's prevmax — range-partitioned, no
    single-partition sort even when the distinct-pair grid is large —
    and the oracle checks the same set against the quadratic NOT
    EXISTS dominance definition."""
    pairs = (
        load_table(spark, sf_dir, "part")
        .groupBy("p_retailprice", "p_size")
        .agg(F.count(F.lit(1)).alias("n_parts"))
        .withColumn("_negsize", -F.col("p_size"))
    )
    return (
        range_prefix(
            pairs, ["p_retailprice", "_negsize"], max_cols=("p_size",)
        )
        .filter(
            F.col("prevmax_p_size").isNull()
            | (F.col("p_size") > F.col("prevmax_p_size"))
        )
        .select(
            "p_retailprice", F.col("p_size").cast("long").alias("p_size"),
            "n_parts",
        )
    )


FD_SPECS: list[tuple[str, str, str, str]] = [
    # (fd_name, table, lhs, rhs) — one FD per report row; mixes an FD
    # that plainly holds (key → attribute) with ones the data violates,
    # so both branches of the audit are exercised.
    ("orders: o_orderkey -> o_orderstatus", "orders", "o_orderkey", "o_orderstatus"),
    ("orders: o_custkey -> o_orderpriority", "orders", "o_custkey", "o_orderpriority"),
    ("documents: source -> lang", "documents", "source", "lang"),
]


def fd_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency audit: for each declared FD lhs -> rhs,
    how many lhs groups exist, how many carry >1 distinct rhs value
    (violations), the violation rate in integer ppm, and the worst
    group's rhs cardinality. The discovery loop every data-quality
    tool (Deequ/dbt tests) runs before trusting a join key or a
    denormalized column."""
    out: DataFrame | None = None
    for fd_name, table, lhs, rhs in FD_SPECS:
        groups = (
            load_table(spark, sf_dir, table)
            .groupBy(lhs)
            .agg(F.countDistinct(rhs).alias("n_rhs"))
        )
        row = groups.agg(
            F.lit(fd_name).alias("fd"),
            F.count(F.lit(1)).cast("long").alias("n_lhs_groups"),
            F.sum((F.col("n_rhs") > 1).cast("long")).alias("n_violating"),
            F.floor(
                F.sum((F.col("n_rhs") > 1).cast("long"))
                * 1_000_000
                / F.count(F.lit(1))
            )
            .cast("long")
            .alias("violation_ppm"),
            F.max("n_rhs").cast("long").alias("max_rhs_distinct"),
        )
        out = row if out is None else out.unionByName(row)
    assert out is not None
    return out


def decimal_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact money aggregation: revenue per priority as DECIMAL(18,2).

    Decimal accumulation is exactly associative — unlike double sums,
    the result is bit-identical under ANY partitioning or reduction
    order, which is the correct type discipline for money at 100 TB
    (no round-through-double tricks needed). Emitted as a string so
    both engines' pandas bridges agree on dtype; the string is the
    full exact decimal, not a rounding."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("string")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


EMB_DIMS = 64  # embeddings table dimensionality (TESTDATA.md)
EMB_MICRO = 1_000_000  # micro-unit quantization (same as quality.KM_SCALE)


def embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding distribution drift screen: per-dimension mean of two
    deterministic snapshots (vec_id parity stands in for old/new
    model versions) in integer micro-units, plus the shift. The
    monitor an embedding pipeline runs after a model swap — a large
    per-dimension shift means re-indexing/re-clustering is due.

    Exactness: float32 components widen to double exactly, quantize to
    micro-unit longs (floor), sums of longs are exactly associative,
    and the mean is one floor-divide of exact integers — deterministic
    under any partitioning, in both engines."""
    emb = load_table(spark, sf_dir, "embeddings")
    vals = emb.select(
        (F.col("vec_id") % 2).alias("snap"),
        F.posexplode("embedding").alias("pos", "val"),
    ).select(
        "snap",
        (F.col("pos") + 1).cast("long").alias("dim"),
        F.floor(F.col("val").cast("double") * EMB_MICRO)
        .cast("long")
        .alias("micro"),
    )
    agg = vals.groupBy("dim").agg(
        F.sum(F.when(F.col("snap") == 0, F.col("micro"))).alias("sum_old"),
        F.sum((F.col("snap") == 0).cast("long")).alias("n_old"),
        F.sum(F.when(F.col("snap") == 1, F.col("micro"))).alias("sum_new"),
        F.sum((F.col("snap") == 1).cast("long")).alias("n_new"),
    )
    mean_old = F.floor(F.col("sum_old") / F.col("n_old")).cast("long")
    mean_new = F.floor(F.col("sum_new") / F.col("n_new")).cast("long")
    return agg.select(
        "dim",
        mean_old.alias("mean_old_micro"),
        mean_new.alias("mean_new_micro"),
        (mean_new - mean_old).alias("shift_micro"),
    )


MMD_NANO = 1_000_000_000  # nano-unit quantization of the h-statistic


def mmd_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kernel two-sample drift test between the two embedding
    snapshots (vec_id parity, as in ext_embedding_drift) via the
    LINEAR-TIME MMD estimator (Gretton et al., JMLR 2012 §6):
    disjoint quadruples (x₀,x₁,y₀,y₁) score
    h = k(x₀,x₁) + k(y₀,y₁) − k(x₀,y₁) − k(x₁,y₀), and MMD² is the
    mean of h. Unlike the per-dimension mean shift, the kernel sees
    distribution-SHAPE drift (covariance rotation, cluster mass moves)
    that leaves every marginal mean in place. Kernel is the degree-2
    polynomial (1 + ⟨a,b⟩)² — captures first- and second-moment drift
    with no transcendental calls, so both engines evaluate the exact
    same IEEE op sequence (an RBF kernel's exp() is NOT guaranteed
    identical across libm implementations — see the cross-engine
    rounding rule).

    Quadruples are formed by vec_id arithmetic (quad = id div 4), so
    membership is deterministic, partitioning-proof, and incomplete
    tail quads drop out of the inner joins. h quantizes to nano-unit
    longs (floor of a bit-identical double is exact), the sum is
    BIGINT, and the final MMD² is two divisions on exact operands.

    Scale notes (100 TB): O(n) by construction — the defining virtue
    of the linear estimator (the full U-statistic is O(n²) kernel
    evaluations). The 4-way join co-partitions on the thin quad key;
    at scale the four slot relations come from one scan (AQE reuses
    the exchange), and the final aggregate is one map-side-combinable
    sum. Power grows with n like any MMD-l test; block estimators
    interpolate if more power per row is ever needed."""
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select(
        (F.col("vec_id") / 4).cast("long").alias("quad"),
        (F.col("vec_id") % 4).alias("slot"),
        "embedding",
    )

    def side(slot: int, name: str) -> DataFrame:
        return base.filter(F.col("slot") == slot).select(
            "quad", F.col("embedding").alias(name)
        )

    # slots: 0,2 are snapshot X (even ids), 1,3 snapshot Y (odd ids)
    quads = (
        side(0, "x0")
        .join(side(2, "x1"), "quad")
        .join(side(1, "y0"), "quad")
        .join(side(3, "y1"), "quad")
    )

    def k(a: str, b: str):
        d = vector.dot(F.col(a), F.col(b))
        return (F.lit(1.0) + d) * (F.lit(1.0) + d)

    h = k("x0", "x1") + k("y0", "y1") - k("x0", "y1") - k("x1", "y0")
    scored = quads.select(
        "quad", F.floor(h * MMD_NANO).cast("long").alias("h_nano")
    )
    return scored.agg(
        F.count(F.lit(1)).alias("n_quads"),
        F.sum("h_nano").alias("h_sum_nano"),
        (
            F.sum("h_nano").cast("double")
            / F.count(F.lit(1))
            / F.lit(float(MMD_NANO))
        ).alias("mmd2"),
    )


SCATTER_TOPK = 20  # most-coupled dimension pairs reported


def emb_scatter_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K most-coupled embedding dimension pairs by |uncentered
    scatter| Σ_v q_i(v)·q_j(v) on micro-unit-quantized components —
    the integer-exact core of the covariance/PCA-prep dataflow
    (centering subtracts the ext_embedding_drift means; the scatter
    matrix is the part that touches every vector). Plan: one
    posexplode per vector, a per-vector dim×dim self-join bounded by
    64 dims, and a map-side-combinable (d1, d2) rollup — the same
    shape as a distributed Gram-matrix computation, where at 100 TB
    each partition computes its local scatter and the combine adds
    exact integers (associative, partitioning-independent)."""
    emb = load_table(spark, sf_dir, "embeddings")
    vals = emb.select(
        "vec_id", F.posexplode("embedding").alias("pos", "val")
    ).select(
        "vec_id",
        (F.col("pos") + 1).cast("long").alias("dim"),
        F.floor(F.col("val").cast("double") * EMB_MICRO)
        .cast("long")
        .alias("micro"),
    )
    a, b = vals.alias("a"), vals.alias("b")
    scatter = (
        a.join(
            b,
            (F.col("a.vec_id") == F.col("b.vec_id"))
            & (F.col("a.dim") < F.col("b.dim")),
        )
        .groupBy(
            F.col("a.dim").alias("d1"), F.col("b.dim").alias("d2")
        )
        .agg(F.sum(F.col("a.micro") * F.col("b.micro")).alias("scatter"))
    )
    return (
        scatter.orderBy(F.abs(F.col("scatter")).desc(), "d1", "d2")
        .limit(SCATTER_TOPK)
    )


def gini_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-inequality Gini coefficient across customers, in ppm:
    G = (2·Σ(rank·rev) − (n+1)·Σrev) / (n·Σrev) over revenues sorted
    ascending with deterministic rank ties (rev, custkey). Complements
    ext_supplier_hhi (concentration) with the inequality view. All
    Σ terms are exact BIGINTs (rank ≤ n, integer cents); the final
    ratio runs in double from those exact integers — identical IEEE
    ops both engines. One customer rollup, then the global rank comes
    from range_prefix (range-partitioned rank — no single-partition
    sort; the customers ladder stays distributed at any scale)."""
    per_cust = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(_cents("o_totalprice")).alias("rev"))
    )
    ranked = range_prefix(per_cust, ["rev", "o_custkey"])
    return ranked.agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("rev").alias("total_cents"),
        F.floor(
            (
                F.lit(2.0) * F.sum(F.col("rnk") * F.col("rev")).cast("double")
                - (F.count(F.lit(1)) + 1).cast("double")
                * F.sum("rev").cast("double")
            )
            * 1_000_000
            / (
                F.count(F.lit(1)).cast("double")
                * F.sum("rev").cast("double")
            )
        )
        .cast("long")
        .alias("gini_ppm"),
    )


def lorenz_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve at customer-population deciles: cumulative revenue
    share held by the poorest k/10 of customers — the full inequality
    CURVE whose enclosed area `ext_gini_coefficient` summarizes to one
    number (a dashboard plots this; reading "the bottom half holds 9%
    of revenue" off a Gini alone is impossible). Points are exact:
    decile k cuts at rank (n·k) div 10 of the (rev, custkey)-sorted
    ladder, and both shares are integer-ppm round-half-up on BIGINT
    cumulative sums — no doubles anywhere.

    Scale notes (100 TB): one map-side-combinable customer rollup;
    the global rank AND the cumulative revenue both come from
    range_prefix — range-partitioned rank + per-partition running sum
    with tiny pid offsets, so the customers ladder never funnels
    through one task; the 10-row decile grid broadcasts onto it.
    """
    per_cust = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(_cents("o_totalprice")).alias("rev"))
    )
    ranked = range_prefix(
        per_cust, ["rev", "o_custkey"], sum_cols=("rev",)
    ).select("rnk", "cum_rev")
    tot = per_cust.agg(
        F.count(F.lit(1)).alias("n"), F.sum("rev").alias("tot")
    )
    grid = spark.range(1, 11).select(F.col("id").alias("decile"))
    cuts = grid.crossJoin(F.broadcast(tot)).select(
        "decile",
        "n",
        "tot",
        F.expr("(n * decile) div 10").alias("cut"),
    )
    return (
        cuts.join(ranked, cuts["cut"] == ranked["rnk"])
        .select(
            "decile",
            F.col("cut").alias("n_cust_cum"),
            F.expr("(1000000 * cut + n div 2) div n").alias(
                "pop_share_ppm"
            ),
            F.expr("(1000000 * cum_rev + tot div 2) div tot").alias(
                "rev_share_ppm"
            ),
        )
    )


ABC_A_PPM = 800_000  # cumulative-revenue share boundary for class A
ABC_B_PPM = 950_000  # boundary for class B; the tail is class C


def abc_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto 80/15/5) revenue classification of parts: rank parts
    by lineitem revenue, classify by cumulative revenue share — A up
    to 80%, B to 95%, C the tail. The inventory-policy classic; at
    100 TB the per-part rollup is one map-side-combinable aggregation
    and the cumulative sum runs through range_prefix (range-
    partitioned prefix sums — the parts table is millions of rows at
    scale, never one task; round-8 verdict). Revenue is integer cents;
    shares are floor-ppm of exact integer ratios, and ties in the
    revenue sort break by part key, so class assignment is
    deterministic in both engines. Output is the per-class summary
    (part counts, revenue share)."""
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(_cents("l_extendedprice")).alias("rev")
    )
    total = per_part.agg(F.sum("rev").alias("total_rev"))
    # descending revenue order as an ascending composite key (negated
    # revenue, part key breaks ties) — range_prefix orders ascending
    ranked = range_prefix(
        per_part.withColumn("negrev", -F.col("rev")),
        ["negrev", "l_partkey"],
        sum_cols=("rev",),
    )
    cum_ppm = F.floor(
        F.col("cum_rev") * 1_000_000 / F.col("total_rev")
    ).cast("long")
    classed = ranked.crossJoin(F.broadcast(total)).withColumn(
        "cls",
        F.when(cum_ppm <= ABC_A_PPM, "A")
        .when(cum_ppm <= ABC_B_PPM, "B")
        .otherwise("C"),
    )
    by_cls = classed.groupBy("cls").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum("rev").alias("rev_cents"),
    )
    cls_total = F.sum("rev_cents").over(Window.partitionBy())
    return by_cls.select(
        "cls",
        "n_parts",
        "rev_cents",
        F.floor(F.col("rev_cents") * 1_000_000 / cls_total)
        .cast("long")
        .alias("rev_share_ppm"),
    )


GA_YEAR0 = 1996  # growth-accounting base period
GA_YEAR1 = 1997  # growth-accounting comparison period


def growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period revenue bridge per priority: the delta between
    GA_YEAR0 and GA_YEAR1 revenue decomposed into a volume effect
    (order-count change at base-period average price) and a price
    effect (the exact residual). volume_effect = floor(Δvol · rev0 /
    vol0) — one IEEE divide of exact integers; price_effect =
    Δrev − volume_effect, exact by construction, so the bridge always
    reconciles to the cent."""
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "yr", F.year("o_orderdate")
    )
    per = (
        orders.filter(F.col("yr").isin(GA_YEAR0, GA_YEAR1))
        .groupBy("o_orderpriority", "yr")
        .agg(
            F.sum(_cents("o_totalprice")).alias("rev"),
            F.count(F.lit(1)).alias("vol"),
        )
    )
    p0 = per.filter(F.col("yr") == GA_YEAR0).select(
        "o_orderpriority",
        F.col("rev").alias("rev0"),
        F.col("vol").alias("vol0"),
    )
    p1 = per.filter(F.col("yr") == GA_YEAR1).select(
        "o_orderpriority",
        F.col("rev").alias("rev1"),
        F.col("vol").alias("vol1"),
    )
    j = p0.join(p1, "o_orderpriority")
    vol_eff = F.floor(
        (F.col("vol1") - F.col("vol0")) * F.col("rev0") / F.col("vol0")
    ).cast("long")
    return j.select(
        "o_orderpriority",
        "rev0",
        "rev1",
        "vol0",
        "vol1",
        (F.col("rev1") - F.col("rev0")).alias("delta_rev"),
        vol_eff.alias("volume_effect"),
        (F.col("rev1") - F.col("rev0") - vol_eff).alias("price_effect"),
    )


SEASONAL_LAGS = 4  # same-weekday occurrences in the naive forecast


def seasonal_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Naive seasonal forecast backtest: predict each day's revenue as
    the mean of the previous SEASONAL_LAGS same-weekday revenues, then
    report per-weekday MAPE in integer ppm. The baseline every real
    forecast must beat — running it in-engine makes the bar explicit.
    forecast = floor(sum of 4 lags / 4) on integer cents; ape_ppm =
    floor(|actual − forecast| · 1e6 / actual); mape_ppm = floor(sum /
    n) — every op integer-exact or one IEEE divide of exact ints."""
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("day"),
            F.weekday(F.to_date(F.col("o_orderdate"))).alias("wd"),
        )
        .agg(F.sum(_cents("o_totalprice")).alias("cents"))
    )
    w = Window.partitionBy("wd").orderBy("day")
    lag_sum = sum(
        (F.lag("cents", i).over(w) for i in range(1, SEASONAL_LAGS + 1)),
        F.lit(0).cast("long"),
    )
    n_lags = sum(
        (
            F.when(F.lag("cents", i).over(w).isNotNull(), 1).otherwise(0)
            for i in range(1, SEASONAL_LAGS + 1)
        ),
        F.lit(0),
    )
    scored = (
        daily.withColumn("n_lags", n_lags)
        .withColumn("forecast", F.floor(lag_sum / F.col("n_lags")).cast("long"))
        .filter(F.col("n_lags") == SEASONAL_LAGS)
        .withColumn(
            "ape_ppm",
            F.floor(
                F.abs(F.col("cents") - F.col("forecast"))
                * 1_000_000
                / F.col("cents")
            ).cast("long"),
        )
    )
    return scored.groupBy("wd").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.floor(F.sum("ape_ppm") / F.count(F.lit(1)))
        .cast("long")
        .alias("mape_ppm"),
    )


HOLT_INIT_TREND = 0  # b_1; documented initialization, oracle-matched


def _holt_kernel(batches):
    """Arrow kernel: Holt's linear (double exponential) smoothing with
    alpha = beta = 1/2 over the day-ordered series, all-integer:
    l_t = trunc((y_t + l_{t-1} + b_{t-1}) / 2),
    b_t = trunc((l_t - l_{t-1} + b_{t-1}) / 2).
    Division TRUNCATES toward zero (trend deltas go negative, and
    DuckDB's integer ``//`` truncates where Python's floors — the
    kernel matches the oracle's semantics explicitly). State carries
    across Arrow batches; the input is a single day-sorted partition.
    """
    import pandas as pd

    def tdiv2(v: int) -> int:
        return v // 2 if v >= 0 else -((-v) // 2)

    lvl = trend = None
    for pdf in batches:
        out = {k: [] for k in (
            "day", "cents", "level_cents", "trend_cents", "forecast_cents")}
        for day, cents in zip(pdf["day"], pdf["cents"]):
            cents = int(cents)
            if lvl is None:
                lvl, trend = cents, HOLT_INIT_TREND
            else:
                prev = lvl
                lvl = tdiv2(cents + lvl + trend)
                trend = tdiv2(lvl - prev + trend)
            out["day"].append(day)
            out["cents"].append(cents)
            out["level_cents"].append(lvl)
            out["trend_cents"].append(trend)
            out["forecast_cents"].append(lvl + trend)
        yield pd.DataFrame(out)


def holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear-trend smoothing of daily revenue — the trend-aware
    sibling of `ext_ewma_daily` (level only): a coupled two-state
    recursion (level, trend) with the one-step-ahead forecast
    level+trend per day. All-integer with truncating halving, so the
    DuckDB recursive-CTE oracle reproduces every state bit-for-bit.

    Scale notes (100 TB): the corpus pass is the one map-side-combined
    daily rollup; the recursion is inherently sequential (each state
    depends on the previous day), so per the round-7 decision rule it
    runs as a single Arrow kernel over the DAY LADDER — thousands of
    rows at any corpus size, one partition by necessity, never the
    corpus. Per-key smoothing at scale would partition the same kernel
    by key (applyInPandas), hash-distributed."""
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.date_format("o_orderdate", "yyyy-MM-dd").alias("day"))
        .agg(F.sum(_cents("o_totalprice")).alias("cents"))
    )
    return (
        daily.orderBy("day")
        .coalesce(1)  # bounded ladder: the recursion needs one ordered stream
        .mapInPandas(
            _holt_kernel,
            schema=(
                "day string, cents long, level_cents long, "
                "trend_cents long, forecast_cents long"
            ),
        )
    )


def _holt_group_kernel(pdf):
    """applyInPandas kernel: Holt's linear recursion over ONE key's
    day-ordered series — the same truncating-integer arithmetic as
    `_holt_kernel`, but each invocation sees exactly one nation's
    rows (whole group in one pandas frame, so no cross-batch state
    carry is needed). Sorting by day happens HERE, inside the group,
    because applyInPandas gives no intra-group order guarantee."""
    import pandas as pd

    def tdiv2(v: int) -> int:
        return v // 2 if v >= 0 else -((-v) // 2)

    pdf = pdf.sort_values("day", kind="mergesort").reset_index(drop=True)
    nation = pdf["nation"].iloc[0]
    lvl = trend = None
    out = {k: [] for k in (
        "nation", "day", "cents", "level_cents", "trend_cents",
        "forecast_cents")}
    for day, cents in zip(pdf["day"], pdf["cents"]):
        cents = int(cents)
        if lvl is None:
            lvl, trend = cents, HOLT_INIT_TREND
        else:
            prev = lvl
            lvl = tdiv2(cents + lvl + trend)
            trend = tdiv2(lvl - prev + trend)
        out["nation"].append(nation)
        out["day"].append(day)
        out["cents"].append(cents)
        out["level_cents"].append(lvl)
        out["trend_cents"].append(trend)
        out["forecast_cents"].append(lvl + trend)
    return pd.DataFrame(out)


def holt_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key Holt's linear smoothing: the DISTRIBUTED form of
    `ext_holt_linear`. That operator documents "per-key smoothing at
    scale would partition the same kernel by key (applyInPandas)" —
    this entry ships it: daily revenue per customer NATION, each
    nation's day ladder smoothed independently by the identical
    truncating-integer recursion.

    Scale notes (100 TB): the corpus pass is one map-side-combined
    (nation, day) rollup; `applyInPandas(groupBy(nation))` then
    hash-distributes the sequential kernel — each executor runs the
    recursion for its keys in parallel, memory bounded by one key's
    day ladder (thousands of rows at any corpus size). This is the
    canonical shape for millions of keys × sequential state: the
    shuffle moves only the pre-aggregated ladder, never the corpus,
    and no key waits on another. Skewed key-ladders are impossible
    by construction (a ladder's length is bounded by the calendar)."""
    # customer scales with the corpus → hash join on custkey (AQE
    # broadcasts it at toy SF on its own); nation is 25 rows forever
    # → explicit broadcast. The rollup shrinks (nation, day) BEFORE
    # the sequential kernel ever sees a row.
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    ).join(
        F.broadcast(
            load_table(spark, sf_dir, "nation").select(
                "n_nationkey", F.col("n_name").alias("nation")
            )
        ),
        F.col("c_nationkey") == F.col("n_nationkey"),
    ).select("c_custkey", "nation")
    daily = (
        load_table(spark, sf_dir, "orders")
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            "nation",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("day"),
        )
        .agg(F.sum(_cents("o_totalprice")).alias("cents"))
    )
    return daily.groupBy("nation").applyInPandas(
        _holt_group_kernel,
        schema=(
            "nation string, day string, cents long, level_cents long, "
            "trend_cents long, forecast_cents long"
        ),
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "ext_benford_audit": benford_audit,
    "ext_cdc_apply": cdc_apply,
    "ext_ewma_daily": ewma_daily,
    "ext_pareto_frontier": pareto_frontier,
    "ext_fd_violations": fd_violations,
    "ext_decimal_revenue": decimal_revenue,
    "ext_growth_accounting": growth_accounting,
    "ext_seasonal_baseline": seasonal_baseline,
    "ext_embedding_drift": embedding_drift,
    "ext_mmd_drift": mmd_drift,
    "ext_abc_analysis": abc_analysis,
    "ext_gini_coefficient": gini_coefficient,
    "ext_lorenz_curve": lorenz_curve,
    "ext_emb_scatter_topk": emb_scatter_topk,
    "ext_holt_linear": holt_linear,
    "ext_holt_by_nation": holt_by_nation,
}

_FD_ORACLE = " UNION ALL ".join(
    f"""
    SELECT '{fd_name}' AS fd,
           CAST(COUNT(*) AS BIGINT) AS n_lhs_groups,
           CAST(SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_violating,
           CAST(floor(SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END)
                      * 1000000 / COUNT(*)) AS BIGINT) AS violation_ppm,
           CAST(MAX(n_rhs) AS BIGINT) AS max_rhs_distinct
    FROM (SELECT {lhs}, COUNT(DISTINCT {rhs}) AS n_rhs
          FROM {table} GROUP BY {lhs})
    """
    for fd_name, table, lhs, rhs in FD_SPECS
)

_BENFORD_CASE = " ".join(
    f"WHEN {d} THEN {p}" for d, p in BENFORD_PPM.items()
)

_EWMA_NUM = " + ".join(
    f"COALESCE(lag(cents, {i}) OVER (ORDER BY day), 0) * {1 << (EWMA_K - 1 - i)}"
    for i in range(EWMA_K)
)
_EWMA_DEN = " + ".join(
    f"(CASE WHEN lag(cents, {i}) OVER (ORDER BY day) IS NOT NULL"
    f" THEN {1 << (EWMA_K - 1 - i)} ELSE 0 END)"
    for i in range(EWMA_K)
)

ORACLES: dict[str, str] = {
    # list_dot_product on DOUBLE[] accumulates left-to-right like the
    # Spark-side sequential fold (same parity ext_dedup_embedding
    # relies on); FLOOR of the bit-identical double is exact.
    "ext_mmd_drift": f"""
        WITH q AS (
            SELECT vec_id // 4 AS quad, vec_id % 4 AS slot,
                   CAST(embedding AS DOUBLE[]) AS e
            FROM embeddings),
        quads AS (
            SELECT a.quad, a.e AS x0, b.e AS x1, c.e AS y0, d.e AS y1
            FROM q a
            JOIN q b ON b.quad = a.quad AND b.slot = 2
            JOIN q c ON c.quad = a.quad AND c.slot = 1
            JOIN q d ON d.quad = a.quad AND d.slot = 3
            WHERE a.slot = 0),
        h AS (
            SELECT quad, CAST(FLOOR((
                  (1.0 + list_dot_product(x0, x1))
                  * (1.0 + list_dot_product(x0, x1))
                + (1.0 + list_dot_product(y0, y1))
                  * (1.0 + list_dot_product(y0, y1))
                - (1.0 + list_dot_product(x0, y1))
                  * (1.0 + list_dot_product(x0, y1))
                - (1.0 + list_dot_product(x1, y0))
                  * (1.0 + list_dot_product(x1, y0))
            ) * {MMD_NANO}) AS BIGINT) AS h_nano
            FROM quads)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_quads,
               CAST(SUM(h_nano) AS BIGINT) AS h_sum_nano,
               CAST(SUM(h_nano) AS DOUBLE) / COUNT(*) / {float(MMD_NANO)}
                   AS mmd2
        FROM h
    """,
    "ext_benford_audit": f"""
        WITH digits AS (
            SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                                    AS VARCHAR), 1, 1) AS INTEGER) AS digit
            FROM orders),
        counts AS (SELECT digit, COUNT(*) AS n FROM digits GROUP BY digit)
        SELECT digit, n,
               CAST(floor(n * 1000000 / SUM(n) OVER ()) AS BIGINT)
                   AS rate_ppm,
               CAST(CASE digit {_BENFORD_CASE} END AS BIGINT) AS benford_ppm,
               CAST(floor(n * 1000000 / SUM(n) OVER ()) AS BIGINT)
                   - CAST(CASE digit {_BENFORD_CASE} END AS BIGINT)
                   AS delta_ppm
        FROM counts
    """,
    "ext_cdc_apply": f"""
        WITH base AS (
            SELECT o_orderkey AS key,
                   CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
            FROM orders),
        log AS (
            SELECT key, 1 AS seq, 'I' AS op, cents FROM base
            UNION ALL
            SELECT key, 2, 'U', cents + {UPDATE_BUMP_CENTS}
            FROM base WHERE key % {UPDATE_EVERY} = 0
            UNION ALL
            SELECT key, 3, 'D', CAST(NULL AS BIGINT)
            FROM base WHERE key % {DELETE_EVERY} = 0),
        ranked AS (
            SELECT key, op, cents,
                   ROW_NUMBER() OVER (PARTITION BY key ORDER BY seq DESC)
                       AS rn,
                   CAST(COUNT(*) OVER (PARTITION BY key) AS BIGINT)
                       AS n_events
            FROM log)
        SELECT key, op AS last_op, cents AS final_cents, n_events
        FROM ranked WHERE rn = 1 AND op <> 'D'
    """,
    "ext_ewma_daily": f"""
        WITH daily AS (
            SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
                   CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS cents
            FROM orders GROUP BY 1)
        SELECT day, cents,
               CAST(floor(CAST({_EWMA_NUM} AS DOUBLE)
                          / ({_EWMA_DEN})) AS BIGINT) AS ewma_cents
        FROM daily
    """,
    "ext_fd_violations": _FD_ORACLE,
    "ext_emb_scatter_topk": f"""
        WITH vals AS (
            SELECT vec_id, d.i AS dim,
                   CAST(floor(CAST(embedding[d.i] AS DOUBLE) * {EMB_MICRO})
                        AS BIGINT) AS micro
            FROM embeddings
            CROSS JOIN (SELECT unnest(generate_series(1, {EMB_DIMS})) AS i) d)
        SELECT a.dim AS d1, b.dim AS d2,
               CAST(SUM(a.micro * b.micro) AS BIGINT) AS scatter
        FROM vals a JOIN vals b
          ON a.vec_id = b.vec_id AND a.dim < b.dim
        GROUP BY a.dim, b.dim
        ORDER BY abs(CAST(SUM(a.micro * b.micro) AS BIGINT)) DESC, d1, d2
        LIMIT {SCATTER_TOPK}
    """,
    "ext_lorenz_curve": """
        WITH per_cust AS (
            SELECT o_custkey,
                   CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS rev
            FROM orders GROUP BY o_custkey),
        ranked AS (
            SELECT CAST(ROW_NUMBER() OVER (ORDER BY rev, o_custkey)
                        AS BIGINT) AS rnk,
                   CAST(SUM(rev) OVER (ORDER BY rev, o_custkey
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS BIGINT) AS cum_rev
            FROM per_cust),
        tot AS (SELECT COUNT(*) AS n, CAST(SUM(rev) AS BIGINT) AS tot
                FROM per_cust),
        cuts AS (
            SELECT decile, n, tot, (n * decile) // 10 AS cut
            FROM (SELECT UNNEST(range(1, 11)) AS decile) g
            CROSS JOIN tot)
        SELECT decile, cut AS n_cust_cum,
               (1000000 * cut + n // 2) // n AS pop_share_ppm,
               (1000000 * cum_rev + tot // 2) // tot AS rev_share_ppm
        FROM cuts JOIN ranked ON cuts.cut = ranked.rnk
    """,
    "ext_gini_coefficient": """
        WITH per_cust AS (
            SELECT o_custkey,
                   CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS rev
            FROM orders GROUP BY o_custkey),
        ranked AS (
            SELECT rev,
                   CAST(ROW_NUMBER() OVER (ORDER BY rev, o_custkey)
                        AS BIGINT) AS rnk
            FROM per_cust)
        SELECT COUNT(*) AS n_customers,
               CAST(SUM(rev) AS BIGINT) AS total_cents,
               CAST(floor((2.0 * CAST(SUM(rnk * rev) AS DOUBLE)
                           - CAST(COUNT(*) + 1 AS DOUBLE)
                             * CAST(SUM(rev) AS DOUBLE))
                          * 1000000
                          / (CAST(COUNT(*) AS DOUBLE)
                             * CAST(SUM(rev) AS DOUBLE))) AS BIGINT)
                   AS gini_ppm
        FROM ranked
    """,
    "ext_abc_analysis": f"""
        WITH per_part AS (
            SELECT l_partkey,
                   CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5)
                                 AS BIGINT)) AS BIGINT) AS rev
            FROM lineitem GROUP BY l_partkey),
        classed AS (
            SELECT rev,
                   CASE WHEN CAST(floor(SUM(rev) OVER (
                                 ORDER BY rev DESC, l_partkey
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND CURRENT ROW)
                             * 1000000.0 / SUM(rev) OVER ()) AS BIGINT)
                             <= {ABC_A_PPM} THEN 'A'
                        WHEN CAST(floor(SUM(rev) OVER (
                                 ORDER BY rev DESC, l_partkey
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND CURRENT ROW)
                             * 1000000.0 / SUM(rev) OVER ()) AS BIGINT)
                             <= {ABC_B_PPM} THEN 'B'
                        ELSE 'C' END AS cls
            FROM per_part)
        SELECT cls, COUNT(*) AS n_parts,
               CAST(SUM(rev) AS BIGINT) AS rev_cents,
               CAST(floor(SUM(rev) * 1000000.0
                          / (SELECT SUM(rev) FROM per_part)) AS BIGINT)
                   AS rev_share_ppm
        FROM classed GROUP BY cls
    """,
    "ext_embedding_drift": f"""
        WITH vals AS (
            SELECT vec_id % 2 AS snap, d.i AS dim,
                   CAST(floor(CAST(embedding[d.i] AS DOUBLE) * {EMB_MICRO})
                        AS BIGINT) AS micro
            FROM embeddings
            CROSS JOIN (SELECT unnest(generate_series(1, {EMB_DIMS})) AS i) d),
        agg AS (
            SELECT dim,
                   SUM(CASE WHEN snap = 0 THEN micro END) AS sum_old,
                   SUM(CASE WHEN snap = 0 THEN 1 ELSE 0 END) AS n_old,
                   SUM(CASE WHEN snap = 1 THEN micro END) AS sum_new,
                   SUM(CASE WHEN snap = 1 THEN 1 ELSE 0 END) AS n_new
            FROM vals GROUP BY dim)
        SELECT CAST(dim AS BIGINT) AS dim,
               CAST(floor(sum_old * 1.0 / n_old) AS BIGINT)
                   AS mean_old_micro,
               CAST(floor(sum_new * 1.0 / n_new) AS BIGINT)
                   AS mean_new_micro,
               CAST(floor(sum_new * 1.0 / n_new) AS BIGINT)
                   - CAST(floor(sum_old * 1.0 / n_old) AS BIGINT)
                   AS shift_micro
        FROM agg
    """,
    "ext_growth_accounting": f"""
        WITH per AS (
            SELECT o_orderpriority, year(o_orderdate) AS yr,
                   CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS rev,
                   COUNT(*) AS vol
            FROM orders
            WHERE year(o_orderdate) IN ({GA_YEAR0}, {GA_YEAR1})
            GROUP BY 1, 2),
        p0 AS (SELECT o_orderpriority, rev AS rev0, vol AS vol0
               FROM per WHERE yr = {GA_YEAR0}),
        p1 AS (SELECT o_orderpriority, rev AS rev1, vol AS vol1
               FROM per WHERE yr = {GA_YEAR1})
        SELECT p0.o_orderpriority, rev0, rev1, vol0, vol1,
               rev1 - rev0 AS delta_rev,
               CAST(floor((vol1 - vol0) * rev0 * 1.0 / vol0) AS BIGINT)
                   AS volume_effect,
               rev1 - rev0
                   - CAST(floor((vol1 - vol0) * rev0 * 1.0 / vol0) AS BIGINT)
                   AS price_effect
        FROM p0 JOIN p1 USING (o_orderpriority)
    """,
    "ext_seasonal_baseline": f"""
        WITH daily AS (
            SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
                   isodow(o_orderdate) - 1 AS wd,
                   CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS cents
            FROM orders GROUP BY 1, 2),
        lagged AS (
            SELECT wd, cents,
                   {" + ".join(f"COALESCE(lag(cents, {i}) OVER (PARTITION BY wd ORDER BY day), 0)" for i in range(1, SEASONAL_LAGS + 1))}
                       AS lag_sum,
                   {" + ".join(f"(CASE WHEN lag(cents, {i}) OVER (PARTITION BY wd ORDER BY day) IS NOT NULL THEN 1 ELSE 0 END)" for i in range(1, SEASONAL_LAGS + 1))}
                       AS n_lags
            FROM daily),
        scored AS (
            SELECT wd, cents,
                   CAST(floor(lag_sum * 1.0 / n_lags) AS BIGINT) AS forecast
            FROM lagged WHERE n_lags = {SEASONAL_LAGS})
        SELECT CAST(wd AS INTEGER) AS wd, COUNT(*) AS n_days,
               CAST(floor(SUM(CAST(floor(abs(cents - forecast) * 1000000.0
                                         / cents) AS BIGINT)) * 1.0
                          / COUNT(*)) AS BIGINT) AS mape_ppm
        FROM scored GROUP BY wd
    """,
    "ext_decimal_revenue": """
        SELECT o_orderpriority,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR)
                   AS revenue,
               COUNT(*) AS n_orders
        FROM orders GROUP BY o_orderpriority
    """,
    "ext_pareto_frontier": """
        WITH pairs AS (
            SELECT p_retailprice, p_size, COUNT(*) AS n_parts
            FROM part GROUP BY p_retailprice, p_size)
        SELECT p_retailprice, CAST(p_size AS BIGINT) AS p_size, n_parts
        FROM pairs p
        WHERE NOT EXISTS (
            SELECT 1 FROM pairs q
            WHERE q.p_retailprice <= p.p_retailprice
              AND q.p_size >= p.p_size
              AND (q.p_retailprice < p.p_retailprice
                   OR q.p_size > p.p_size))
    """,
}


ORACLES["ext_holt_linear"] = """
    -- AS MATERIALIZED: the recursive step must not re-evaluate the
    -- parquet scan + window each iteration (150x at sf0.1)
    WITH RECURSIVE daily AS MATERIALIZED (
        SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
               CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders GROUP BY 1),
    d AS MATERIALIZED (
        SELECT row_number() OVER (ORDER BY day) AS rn, day, cents
        FROM daily),
    rec AS (
        SELECT rn, day, cents, cents AS l, CAST(0 AS BIGINT) AS b
        FROM d WHERE rn = 1
        UNION ALL
        SELECT d.rn, d.day, d.cents,
               (d.cents + r.l + r.b) // 2 AS l,
               ((d.cents + r.l + r.b) // 2 - r.l + r.b) // 2 AS b
        FROM rec r JOIN d ON d.rn = r.rn + 1)
    SELECT day, cents, l AS level_cents, b AS trend_cents,
           l + b AS forecast_cents
    FROM rec
"""

ORACLES["ext_holt_by_nation"] = """
    -- AS MATERIALIZED: see ext_holt_linear
    WITH RECURSIVE daily AS MATERIALIZED (
        SELECT n_name AS nation,
               strftime(o_orderdate, '%Y-%m-%d') AS day,
               CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY 1, 2),
    d AS MATERIALIZED (
        SELECT row_number() OVER (PARTITION BY nation ORDER BY day) AS rn,
               nation, day, cents
        FROM daily),
    rec AS (
        SELECT rn, nation, day, cents, cents AS l, CAST(0 AS BIGINT) AS b
        FROM d WHERE rn = 1
        UNION ALL
        SELECT d.rn, d.nation, d.day, d.cents,
               (d.cents + r.l + r.b) // 2 AS l,
               ((d.cents + r.l + r.b) // 2 - r.l + r.b) // 2 AS b
        FROM rec r JOIN d ON d.nation = r.nation AND d.rn = r.rn + 1)
    SELECT nation, day, cents, l AS level_cents, b AS trend_cents,
           l + b AS forecast_cents
    FROM rec
"""
