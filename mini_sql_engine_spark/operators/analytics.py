"""OLAP analytics operators beyond the reference's surface.

The reference caps out at whole-table aggregates (SURVEY.md §2.1
O9–O13, "no GROUP BY anywhere in the spec"); this module covers the
OLAP staples a Spark engine gets from Catalyst: multi-dimensional
aggregation (ROLLUP / CUBE / GROUPING SETS), pivot, statistical
aggregates, scalar expression coverage (string/date/math), subqueries
(scalar / IN / correlated), deterministic hash-sampling, and
approx_count_distinct.

Scale notes (100 TB):
- rollup/cube expand each input row to its grouping-set combinations
  BEFORE the shuffle, but partial aggregation collapses per-partition
  groups first, so shuffle volume is bounded by (groups × partitions),
  not rows × sets;
- pivot with an explicit value list is one groupBy shuffle; never call
  pivot without values at scale (it runs a distinct scan first);
- hash-sampling (md5 % 100 < p) is stateless per row — pushes to the
  scan, no shuffle, reproducible across engines and runs, and stable
  under repartitioning (unlike TABLESAMPLE / rand());
- correlated subqueries decorrelate in Catalyst to joins — the plans
  below all become broadcast or shuffled joins, never per-row lookups;
- approx_count_distinct is the HLL++ sketch: constant memory per
  group vs. the exact count's full key shuffle.
"""

from __future__ import annotations

import math
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from mini_sql_engine_spark.functions.frames import jvm_rows
from mini_sql_engine_spark.catalog import (
    ensure_min_partitions,
    load_table,
    register_sf_tables,
)
from mini_sql_engine_spark.functions.hashing import md5_long
from mini_sql_engine_spark import oracle_shared
from mini_sql_engine_spark.functions.numeric import NANO as _NANO
from mini_sql_engine_spark.functions.numeric import qsum as _qsum
from mini_sql_engine_spark.functions.ranking import ntile_expr, range_prefix

ALL = "(all)"  # marker for super-aggregate rows (testdata is NOT NULL,
# so coalescing grouped NULLs to a marker is unambiguous)

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
SAMPLE_PCT = 5  # md5-hash sampling keeps ~5% of rows


def rollup_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (priority, status): hierarchy of subtotals + grand total."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            # integer cents: the grand-total row sums the WHOLE orders
            # table — a rounded float sum there is safe at sf0.1 but
            # marginal at 100x (random-walk error approaches the round
            # grid); integer cents are exact in any order at any scale
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast(
                    "long"
                )
            ).alias("total_cents"),
        )
        .select(
            F.coalesce("o_orderpriority", F.lit(ALL)).alias("priority"),
            F.coalesce("o_orderstatus", F.lit(ALL)).alias("status"),
            "n_orders",
            "total_cents",
        )
    )


def cube_returnflag_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE (returnflag, linestatus): all 2^2 grouping combinations."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit(ALL)).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit(ALL)).alias("linestatus"),
            "n_lines",
            "sum_qty",
        )
    )


def grouping_sets_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS: (type), (user), () — SQL form."""
    register_sf_tables(spark, sf_dir, ("events",))
    return spark.sql(
        f"""
        SELECT coalesce(event_type, '{ALL}') AS event_type,
               coalesce(CAST(user_id AS STRING), '{ALL}') AS user_id,
               COUNT(*) AS n_events,
               -- integer-cents money: per-row fixed point, exact
               -- integer SUM — no float accumulation order anywhere
               CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS total_cents
        FROM events
        GROUP BY GROUPING SETS ((event_type), (user_id), ())
        """
    )


def pivot_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event counts pivoted to one column per event type.

    Explicit value list → single shuffle, stable schema at any scale."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .select(
            "user_id",
            *[F.coalesce(t, F.lit(0)).alias(f"n_{t}") for t in EVENT_TYPES],
        )
    )


def stats_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates per market segment.

    Fixed-point discipline (SCALE.md): avg/stddev/variance are derived
    from EXACT integer-cent moment sums (s, ss as DECIMAL(38,0) — the
    2-decimal money grid makes cents lossless), then a handful of IEEE
    double ops in an order the DuckDB oracle mirrors token for token.
    The streaming float moments (F.avg/F.stddev_samp over doubles)
    they replace reduce in partial-aggregation order — the last
    order-dependent aggregate class left in an oracle pair. min/max
    are exact order statistics; median of an even group is one IEEE
    midpoint op on exact operands — deterministic in both engines.
    DECIMAL(38,0) headroom: cents² ≤ 1e12, so the n·ss cross term
    stays inside 38 digits to n ≈ 1e25 rows."""
    c = load_table(spark, sf_dir, "customer")
    cents = F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("decimal(38,0)")
    m = c.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cents).alias("_s"),
        F.sum(cents * cents).alias("_ss"),
        F.round(F.median("c_acctbal"), 4).alias("med_bal"),
        F.round(F.min("c_acctbal"), 4).alias("min_bal"),
        F.round(F.max("c_acctbal"), 4).alias("max_bal"),
    )
    n_dec = F.col("n").cast("decimal(38,0)")
    var_c2 = (n_dec * F.col("_ss") - F.col("_s") * F.col("_s")).cast(
        "double"
    ) / (F.col("n").cast("double") * (F.col("n") - 1).cast("double"))
    return m.select(
        "c_mktsegment",
        "n",
        F.round(F.col("_s").cast("double") / F.col("n") / 100.0, 4).alias(
            "avg_bal"
        ),
        F.round(F.sqrt(var_c2) / 100.0, 4).alias("sd_bal"),
        F.round(var_c2 / 10000.0, 2).alias("var_bal"),
        "med_bal",
        "min_bal",
        "max_bal",
    )


def corr_price_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation + covariance per return flag.

    Same fixed-point discipline as stats_by_segment: all five moment
    sums are exact DECIMAL(38,0) integers (quantity is integral,
    price/discount live on the 2-decimal grid → cents), so corr =
    (n·Sqp − Sq·Sp) / (√(n·Sqq − Sq²)·√(n·Spp − Sp²)) is a fixed
    sequence of IEEE ops on identical operands in Spark and DuckDB —
    correlation is scale-invariant, so cents give the same value as
    dollars. covar_samp comes back to dollar units via one /100."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("decimal(38,0)")
    p = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast(
        "decimal(38,0)"
    )
    d = F.floor(F.col("l_discount") * 100 + F.lit(0.5)).cast("decimal(38,0)")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).alias("_sq"),
        F.sum(p).alias("_sp"),
        F.sum(d).alias("_sd"),
        F.sum(q * q).alias("_sqq"),
        F.sum(p * p).alias("_spp"),
        F.sum(q * p).alias("_sqp"),
        F.sum(q * d).alias("_sqd"),
    )
    n_dec = F.col("n").cast("decimal(38,0)")
    num = (n_dec * F.col("_sqp") - F.col("_sq") * F.col("_sp")).cast("double")
    dq = (n_dec * F.col("_sqq") - F.col("_sq") * F.col("_sq")).cast("double")
    dp = (n_dec * F.col("_spp") - F.col("_sp") * F.col("_sp")).cast("double")
    cnum = (n_dec * F.col("_sqd") - F.col("_sq") * F.col("_sd")).cast("double")
    den_n = F.col("n").cast("double") * (F.col("n") - 1).cast("double")
    return m.select(
        "l_returnflag",
        F.round(num / (F.sqrt(dq) * F.sqrt(dp)), 6).alias("corr_qty_price"),
        F.round(cnum / den_n / 100.0, 6).alias("covar_qty_disc"),
    )


def scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String / date / math scalar coverage in one projection —
    the entire category is absent from the reference (SURVEY §2.1)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("o_year"),
        F.month("o_orderdate").cast("long").alias("o_month"),
        F.dayofmonth("o_orderdate").cast("long").alias("o_day"),
        F.quarter("o_orderdate").cast("long").alias("o_quarter"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "month_start"
        ),
        F.upper(F.substring("o_orderpriority", 3, 20)).alias("prio_name"),
        F.concat_ws("/", "o_orderstatus", "o_orderpriority").alias("status_prio"),
        F.length("o_orderpriority").cast("long").alias("prio_len"),
        F.round(F.abs(F.col("o_totalprice") - 1000.0), 2).alias("abs_diff"),
        F.round(F.sqrt("o_totalprice"), 6).alias("sqrt_price"),
        F.floor(F.col("o_totalprice") / 100).alias("price_bucket"),
        F.when(F.col("o_totalprice") > 1000, "big").otherwise("small").alias("size_tag"),
    )


def hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~5% sample of lineitem keyed on (orderkey,
    linenumber) — reproducible across engines, runs, and partitionings."""
    li = load_table(spark, sf_dir, "lineitem")
    key = F.concat_ws(":", "l_orderkey", "l_linenumber")
    return li.filter(md5_long(key) % 100 < SAMPLE_PCT).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )


def scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers above the global average balance (scalar subquery)."""
    register_sf_tables(spark, sf_dir, ("customer",))
    return spark.sql(
        """
        SELECT c_custkey, c_acctbal
        FROM customer
        WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
        """
    )


def in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers in nations that have >= 50 customers (IN subquery)."""
    register_sf_tables(spark, sf_dir, ("supplier", "customer"))
    return spark.sql(
        """
        SELECT s_suppkey, s_name
        FROM supplier
        WHERE s_nationkey IN (SELECT c_nationkey FROM customer
                              GROUP BY c_nationkey HAVING COUNT(*) >= 50)
        """
    )


def correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers above their nation's average balance (correlated scalar
    subquery — Catalyst decorrelates to an aggregate + join)."""
    register_sf_tables(spark, sf_dir, ("customer",))
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_nationkey
        FROM customer c
        WHERE c.c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
                             WHERE c2.c_nationkey = c.c_nationkey)
        """
    )


def lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation top-2 customers via a correlated LATERAL subquery —
    the SQL-standard spelling of top-k-per-group. Catalyst decorrelates
    the LATERAL into a window/join plan, so it costs one shuffle on the
    correlation key, same as the explicit Window top-k
    (rollups.topk_per_group); the point is the FRONTEND: a user can
    write the standard form and still get the scalable plan. Ties are
    broken on c_custkey so the LIMIT boundary is deterministic."""
    register_sf_tables(spark, sf_dir, ("nation", "customer"))
    return spark.sql(
        """
        SELECT n.n_name, t.c_custkey, t.c_acctbal
        FROM nation n,
        LATERAL (SELECT c.c_custkey, c.c_acctbal
                 FROM customer c
                 WHERE c.c_nationkey = n.n_nationkey
                 ORDER BY c.c_acctbal DESC, c.c_custkey
                 LIMIT 2) t
        """
    )


def percentiles_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark `percentile` ≡
    DuckDB `quantile_cont`). At 100 TB exact percentiles are a full
    sort per group — switch to `percentile_approx` (t-digest sketch,
    mergeable, one pass) and accept bounded rank error; both are
    exposed here so the trade is visible."""
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.round(F.expr("percentile(c_acctbal, 0.25)"), 6).alias("p25"),
        F.round(F.expr("percentile(c_acctbal, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(c_acctbal, 0.9)"), 6).alias("p90"),
    )


def anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly detection per event type: modified z-score
    0.6745·(x − median)/MAD with the Iglewicz–Hoaglin cutoff 3.5.
    Mean/stddev outlier rules break exactly when you need them (the
    outliers inflate the stddev that defines them); median/MAD have a
    50% breakdown point, so this is the detector a metrics pipeline
    should run on raw event values.

    Two grouped exact-percentile passes (median, then median of
    absolute deviations) with the tiny per-type stats broadcast back
    onto the event stream — at 100 TB swap `percentile` for the
    mergeable t-digest sketch (`percentile_approx`) and both passes
    become single-shuffle map-side-combine aggs. Stats are rounded to
    6 decimals before the z-score so 1-ulp interpolation differences
    between engines cannot flip a threshold-boundary row."""
    e = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    med = e.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("med")
    )
    dev = e.join(F.broadcast(med), "event_type")
    mad = dev.groupBy("event_type").agg(
        F.round(F.expr("percentile(abs(value - med), 0.5)"), 6).alias("mad")
    )
    z = F.round(0.6745 * (F.col("value") - F.col("med")) / F.col("mad"), 6)
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter(F.col("mad") > 0)
        .withColumn("robust_z", z)
        .filter(F.abs(F.col("robust_z")) > 3.5)
        .select("event_id", "event_type", F.round("value", 6).alias("value"), "robust_z")
    )


def unpivot_part_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot (melt) of part metrics."""
    part = load_table(spark, sf_dir, "part")
    return part.unpivot(
        "p_partkey", ["p_size", "p_retailprice"], "metric", "value"
    )


def conditional_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTER-style conditional aggregation: count_if / bool_or /
    guarded sums — one scan, no self-joins."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.count_if(F.col("l_discount") > 0.05).alias("n_discounted"),
        F.count_if(F.col("l_returnflag") == "R").alias("n_returned"),
        F.bool_or(F.col("l_quantity") > 49).alias("any_bulk"),
        F.round(
            F.sum(F.when(F.col("l_tax") > 0.04, F.col("l_extendedprice"))), 2
        ).alias("high_tax_revenue"),
    )


def string_agg_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation: nation list per region. Sorted before
    joining so the result is deterministic under any partitioning."""
    nation = load_table(spark, sf_dir, "nation")
    return (
        nation.groupBy("n_regionkey")
        .agg(
            F.array_join(F.sort_array(F.collect_list("n_name")), "|").alias(
                "nations"
            ),
            F.count(F.lit(1)).alias("n_nations"),
        )
    )


def hll_mergeable_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE cardinality sketches — the pattern that matters at
    100 TB: build a Datasketches HLL per (event_type, day) partial
    (`hll_sketch_agg`), then UNION the partials per event type
    (`hll_union_agg`) and estimate. Unlike a COUNT(DISTINCT) — which
    must reshuffle raw keys to re-aggregate at a coarser grain — the
    daily sketches are tiny, additive, and storable: a dashboard can
    roll up any date range by unioning pre-computed partials without
    touching the fact table again.

    Cross-engine oracle contract: the sketch ESTIMATE itself is
    engine-specific (never emitted), so the output carries only the
    deterministic facts — the exact distinct count, the number of
    daily partials — plus an in-plan ``within_tol`` boolean asserting
    |union-estimate − exact| ≤ 10% · exact (lgK=12 → ~1.6% rse, so the
    10% envelope has >5σ slack). DuckDB recomputes the exact values
    and expects ``true``: a hard hash-matching check of the sketch's
    accuracy without hashing sketch internals."""
    events = load_table(spark, sf_dir, "events")
    # COUPLED CONSTANTS: lgK=12 here and the *10 envelope in the select
    # below (|est − exact| ≤ 10%·exact) are a pair. lgK=12 gives rse
    # ≈ 1.04/sqrt(2^12) ≈ 1.6%, so 10% is a >5σ bound — effectively
    # deterministic. Lowering lgK (or a future scale factor with very
    # small per-type cardinalities) narrows that safety margin and can
    # flip the whole correctness row to FAIL rather than reporting
    # degraded accuracy: revisit the envelope whenever lgK changes.
    _HLL_LGK = 12
    daily = events.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.hll_sketch_agg("user_id", _HLL_LGK).alias("sketch"))
    return (
        daily.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("_approx"),
            F.count(F.lit(1)).alias("n_daily_sketches"),
        )
        .join(
            load_table(spark, sf_dir, "events")
            .groupBy("event_type")
            .agg(F.count_distinct("user_id").alias("exact_users")),
            "event_type",
        )
        .select(
            "event_type",
            "n_daily_sketches",
            "exact_users",
            (
                F.abs(F.col("_approx") - F.col("exact_users"))
                * 10
                <= F.col("exact_users")
            ).alias("within_tol"),
        )
    )


def quantile_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT mergeable quantile summaries: per-(event_type, day)
    value-histogram partials — (value, count) pairs, the trivially
    additive summary — merged per event type, then discrete p50/p90/p99
    read off the cumulative counts. Counterpart to hll_mergeable_
    sketches but exactly oracle-able: merging histograms is integer
    addition, and the quantile rule (least value with cum*den >=
    p_num*total) is pure integer comparison, so both engines agree
    bit-for-bit — no sketch internals, no float accumulation.

    100 TB: the partials are the storable artifact — each day's
    histogram is |distinct values|-sized (bounded for discretized
    measures like 2-decimal monetary values), so any date-range rollup
    merges pre-computed partials without rescanning the fact table.
    The merge is one map-side-combined agg; the cumulative pass is a
    keyed window over the (small) merged histogram, never over rows."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    partials = events.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day"), "value"
    ).agg(F.count(F.lit(1)).alias("cnt"))
    merged = partials.groupBy("event_type", "value").agg(F.sum("cnt").alias("cnt"))
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = merged.withColumn("cum", F.sum("cnt").over(wcum)).withColumn(
        "total", F.sum("cnt").over(Window.partitionBy("event_type"))
    )
    return cum.groupBy("event_type").agg(
        F.min(F.when(F.col("cum") * 2 >= F.col("total"), F.col("value"))).alias("p50"),
        F.min(
            F.when(F.col("cum") * 10 >= F.col("total") * 9, F.col("value"))
        ).alias("p90"),
        F.min(
            F.when(F.col("cum") * 100 >= F.col("total") * 99, F.col("value"))
        ).alias("p99"),
        F.sum("cnt").alias("n_rows"),
        F.count(F.lit(1)).alias("n_distinct_values"),
    )


def approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ distinct-count sketch per event type, checked against the
    exact count IN-PLAN: the sketch estimate (engine-specific, never
    emitted) must land within 10% of the exact count (rsd was requested
    at 2%, so 10% is a >5σ envelope). The output is fully deterministic
    — (event_type, exact_users, within_tol) — so DuckDB hash-matches it
    by recomputing the exact count and expecting ``true``. This keeps a
    hard cross-engine oracle on the operator without pretending two
    engines' HLL registers agree bit-for-bit."""
    events = load_table(spark, sf_dir, "events")
    # COUPLED CONSTANTS: rsd=0.02 and the *10 (10%) envelope below are
    # a pair (>5σ slack). Loosening rsd or shrinking per-type
    # cardinality at a new scale factor erodes the margin and would
    # flip this row to FAIL outright — revisit both together.
    return (
        events.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", 0.02).alias("_approx"),
            F.count_distinct("user_id").alias("exact_users"),
        )
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("_approx") - F.col("exact_users")) * 10
                <= F.col("exact_users")
            ).alias("within_tol"),
        )
    )


# QSK_K / QSK_TARGETS live in oracle_shared (leaf) so the streaming
# twin can share them without importing this pack on the executors
from mini_sql_engine_spark.oracle_shared import QSK_K, QSK_TARGETS  # noqa: E402

QSK_P = 16  # fixed hash-partition count (part of the error bound)


def quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile sketch with a PROVEN rank-error certificate.

    Each of QSK_P hash partitions of lineitem prices (integer cents)
    is compacted to ≤ QSK_K evenly-spaced order statistics carrying
    their local rank GAPS; the merged summary (≤ K·P rows — constant,
    the point of a sketch) answers any quantile by prefix-summed
    weight: est(t) = min value whose merged weight ≥ t. Two exact
    in-plan counts certify the textbook mergeable-summary guarantee
    for every target:

      ok_hi: count(x <= est) >= t                       (slack-free)
      ok_lo: count(x <  est) <  t + floor(n/K) + P      (the bound)

    since each partition's recorded rank understates count(<= v) never
    and overstates count(< v) by at most its max gap ceil(n_p/K), and
    sum_p ceil(n_p/K) <= floor(n/K) + P. The estimate itself is
    sketch-internal (depends on partition boundaries) and never
    emitted; the OUTPUT — (q_ppm, n_rows, slack, ok_hi, ok_lo) — is
    fully deterministic, so DuckDB hash-matches it by recomputing n
    and the bound and expecting true/true (the
    `ext_approx_count_distinct` certificate pattern).

    Scale notes (100 TB): this is the one-pass distributed-quantile
    shape (same family as Spark's approxQuantile/GK): a pure
    per-partition map to K rows, a K·P-row merge, and ONE exact
    counting pass for the certificate (drop it in production — it
    exists to make the sketch falsifiable). Memory per executor is K
    order statistics, independent of partition size."""
    import numpy as np
    import pandas as pd

    cents = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
    base = (
        load_table(spark, sf_dir, "lineitem")
        .select(cents.alias("cents"), "l_orderkey")
        .repartition(QSK_P, "l_orderkey")
        .localCheckpoint(eager=False)  # consumed by sketch AND certify
    )

    def summarize(batches):
        vals = [pdf["cents"].to_numpy(np.int64) for pdf in batches]
        v = np.sort(np.concatenate(vals)) if vals else np.empty(0, np.int64)
        n = len(v)
        out = {"val": [], "g": []}
        prev = 0
        for i in range(1, QSK_K + 1):
            r = -(-i * n // QSK_K)  # ceil(i*n/K); r == n at i == K
            if r > prev:
                out["val"].append(int(v[r - 1]))
                out["g"].append(r - prev)
                prev = r
        yield pd.DataFrame(out)

    summ = (
        base.mapInPandas(summarize, "val long, g long")
        .groupBy("val")
        .agg(F.sum("g").alias("g"))
    )
    # bounded-summary window: the merged sketch is <= K*P rows BY
    # CONSTRUCTION (constant in data scale), so the prefix sum runs as
    # a single-partition window over the summary — the same bounded
    # exception range_prefix itself uses for its offset grid
    from pyspark.sql import Window

    w = Window.orderBy("val").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ladder = summ.coalesce(1).select(
        "val", F.sum("g").over(w).alias("cum_g")
    )
    n1 = base.agg(F.count(F.lit(1)).alias("n"))
    targets = jvm_rows(
        spark, [(q,) for q in QSK_TARGETS], "q_ppm long"
    ).crossJoin(F.broadcast(n1))
    targets = targets.select(
        "q_ppm",
        "n",
        F.greatest(
            F.floor(F.col("q_ppm") * F.col("n") / 1_000_000), F.lit(1)
        )
        .cast("long")
        .alias("t"),
    )
    # est(t) = min summary value whose cumulative weight reaches t
    ests = (
        F.broadcast(targets)
        .join(ladder, F.col("cum_g") >= F.col("t"))
        .groupBy("q_ppm", "n", "t")
        .agg(F.min("val").alias("est"))
    )
    # ONE exact pass certifies all targets: 5 broadcast rows × base
    certify = base.crossJoin(F.broadcast(ests)).groupBy(
        "q_ppm", "n", "t"
    ).agg(
        F.sum(F.when(F.col("cents") <= F.col("est"), 1).otherwise(0)).alias(
            "_le"
        ),
        F.sum(F.when(F.col("cents") < F.col("est"), 1).otherwise(0)).alias(
            "_lt"
        ),
    )
    slack = (F.floor(F.col("n") / QSK_K) + QSK_P).cast("long")
    return certify.select(
        "q_ppm",
        F.col("n").alias("n_rows"),
        slack.alias("slack"),
        (F.col("_le") >= F.col("t")).alias("ok_hi"),
        (F.col("_lt") < F.col("t") + slack).alias("ok_lo"),
    )


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-level cohort retention triangle: users grouped by their
    first-activity day, counted distinct on each later activity day.

    Two thin shuffles at any scale: the per-user min-day aggregate
    (map-side partial), then the (cohort, offset) distinct-count — the
    raw event stream is never self-joined, only joined against the
    ~|users| first-day table (broadcast-able when users ≪ events)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")
    )
    first = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        ev.join(first, "user_id")
        .groupBy(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort"),
            F.datediff("day", "cohort_day").cast("long").alias("day_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


SESSION_GAP_US = 30 * 60 * 1_000_000  # 30-minute inactivity gap
PATH_TOP_K = 20


def session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top user-journey paths: sessionize each user's event stream by a
    30-minute inactivity gap (gaps-and-islands: lag + boundary flag +
    running sum — the window form of `ext_session_window`'s
    session_window), then reduce each session to its ordered
    event-type path and count path frequencies. Output: the PATH_TOP_K
    most common (path, n_sessions).

    Order inside a session is pinned by (unix_micros(ts), event_id) —
    collect_list alone is shuffle-order-nondeterministic, so the path
    string is built by sorting an array of (ts_us, event_id, type)
    structs, which is deterministic in both engines. Both windows and
    the session rollup shuffle once on user_id; the path count is a
    thin (path, 1) aggregate.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
        "event_type",
    )
    from pyspark.sql import Window

    wo = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    flagged = ev.withColumn(
        "new_sess",
        F.when(
            F.col("ts_us") - F.lag("ts_us").over(wo) > SESSION_GAP_US, 1
        ).otherwise(0)
        + F.when(F.lag("ts_us").over(wo).isNull(), 1).otherwise(0),
    ).withColumn(
        "sess",
        F.sum("new_sess").over(
            wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    paths = flagged.groupBy("user_id", "sess").agg(
        F.concat_ws(
            ">",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts_us", "event_id", "event_type"))
                ),
                lambda s: s.getField("event_type"),
            ),
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(PATH_TOP_K)
    )


def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over event types: for each
    user's (ts, event_id)-ordered stream, count (prev_type → type)
    transitions and row-normalize into probabilities — the base table
    for next-event prediction and anomaly scoring. Output:
    (prev_type, event_type, n, prob).

    One user-keyed window (lag) then a transition-keyed count agg;
    row normalization is a window sum over the tiny type×type table —
    nothing wide touches the raw stream twice.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
        "event_type",
    )
    from pyspark.sql import Window

    wo = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    trans = (
        ev.withColumn("prev_type", F.lag("event_type").over(wo))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wnorm = Window.partitionBy("prev_type")
    return trans.select(
        "prev_type",
        "event_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(wnorm), 4).alias("prob"),
    )


def running_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users per event type by day — the DAU-style
    "users reached so far" curve. A cumulative COUNT(DISTINCT)
    decomposes EXACTLY: a user contributes to every prefix from their
    FIRST day on, so min-day per (type, user) → new-user histogram →
    running sum gives the same numbers as a distinct-set window while
    carrying one counter of state instead of a growing set. (Spark
    windows reject COUNT(DISTINCT); the common `size(collect_set())`
    workaround is what this replaces — 100 TB state is O(1) per
    partition here, vs O(users) for the set.) Output: (event_type,
    day, n_users_cum).
    """
    from pyspark.sql import Window

    # day as a string: Spark date and DuckDB DATE surface as different
    # pandas dtypes in the driver compare (same trick as cohort_retention)
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day"), "user_id"
    )
    first = ev.groupBy("event_type", "user_id").agg(
        F.min("day").alias("day")
    )
    hist = first.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).alias("n_new")
    )
    days = ev.select("event_type", "day").distinct()
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        days.join(hist, ["event_type", "day"], "left")
        .withColumn(
            "n_users_cum",
            F.sum(F.coalesce("n_new", F.lit(0))).over(w),
        )
        .select("event_type", "day", "n_users_cum")
    )


def concurrency_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line concurrency: treat each event as a session of
    SESSION_GAP_US/2 duration, explode into +1 (start) / −1 (end)
    deltas, and take the running sum in time order — the "how many
    sessions are open right now" gauge, entirely relational. Output:
    per event_type, the peak concurrency and when it first occurred.

    One shuffle on event_type; the window orders the 2n thin delta
    rows within each type. Ties order by (ts_us, delta DESC, event_id)
    — starts before ends at the same instant, deterministically.
    """
    from pyspark.sql import Window

    half = SESSION_GAP_US // 2
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.unix_micros("ts").alias("ts_us"), "event_id"
    )
    deltas = ev.select(
        "event_type", "ts_us", "event_id", F.lit(1).alias("delta")
    ).unionByName(
        ev.select(
            "event_type",
            (F.col("ts_us") + half).alias("ts_us"),
            "event_id",
            F.lit(-1).alias("delta"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts_us", F.col("delta").desc(), "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = deltas.withColumn("open", F.sum("delta").over(w))
    wp = Window.partitionBy("event_type").orderBy(
        F.col("open").desc(), "ts_us", "event_id"
    )
    return (
        running.withColumn("rn", F.row_number().over(wp))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("open").alias("peak_concurrency"),
            F.col("ts_us").alias("peak_at_us"),
        )
    )


MAP_SHARE_MIN = 0.04  # drop days below this share of the type's events


def map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface, round-tripped entirely JVM-side: per event
    type build a day→count map (`map_from_entries` over the sorted
    entry array — collect_list alone is shuffle-order-nondeterministic),
    `transform_values` to each day's share of the type's events,
    `map_filter` to the days above MAP_SHARE_MIN, and explode the map
    back to (event_type, day, share) rows. The oracle computes the
    same numbers map-free, so the test proves the map operators are
    value-transparent. The (k, v) lambdas here are the INTENDED binary
    higher-order form (cf. the unary-only rule in
    `hashing.minhash_signature`).
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    )
    counts = ev.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).alias("n")
    )
    per_type = counts.groupBy("event_type").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("day", "n")))
        ).alias("m"),
        F.sum("n").alias("total"),
    )
    shares = per_type.select(
        "event_type",
        F.map_filter(
            F.transform_values(
                "m", lambda k, v: F.round(v / F.col("total"), 6)
            ),
            lambda k, v: v >= MAP_SHARE_MIN,
        ).alias("m2"),
    )
    return shares.select(
        "event_type", F.explode("m2").alias("day", "share")
    )


WM_CANDIDATES_MIN = (10, 30, 60)  # candidate watermark delays, minutes


def watermark_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-orderness audit — the input to choosing a watermark
    delay: treating event_id as arrival order (the documented proxy in
    this fixture), each event's lateness is how far the stream's
    event-time high-water mark had already advanced past it when it
    arrived. Reports, per event type: max and p99 lateness (seconds)
    and how many events each candidate watermark delay would drop as
    late — read the row where n_dropped hits 0 and that is the delay
    the streaming pack's `withWatermark` needs. One window over the
    arrival order per type + a thin rollup.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.unix_micros("ts").alias("ts_us"), "event_id"
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    late = ev.withColumn(
        "late_us",
        F.greatest(
            F.coalesce(F.max("ts_us").over(w), F.col("ts_us"))
            - F.col("ts_us"),
            F.lit(0),
        ),
    )
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.max("late_us") / 1e6, 1).alias("max_late_s"),
        F.round(F.expr("percentile(late_us, 0.99)") / 1e6, 1).alias(
            "p99_late_s"
        ),
    ]
    for m in WM_CANDIDATES_MIN:
        aggs.append(
            F.sum(
                (F.col("late_us") > m * 60 * 1_000_000).cast("long")
            ).alias(f"dropped_{m}m")
        )
    return late.groupBy("event_type").agg(*aggs)


ATTR_WINDOW_US = 7 * 24 * 3600 * 1_000_000  # last-touch lookback: 7 days


def gap_fill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample: per-user daily totals with calendar gaps
    generated and forward-filled.

    Each user's active-day range is densified (sequence + explode —
    the distributed replacement for a calendar dimension join), actual
    daily cents land by left join, and missing days carry the last
    observed total forward (`last(..., ignorenulls)` over an unbounded
    preceding frame) with an is_gap marker. This is the resample/LOCF
    operator every per-entity time-series feed needs before windowed
    features. One shuffle on user_id; the generated rows are bounded
    by the span, not the event count. Day rides as a yyyy-MM-dd string
    so both engines hash the identical value."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias(
            "day_cents"
        )
    )
    spans = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    alldays = spans.select(
        "user_id",
        F.explode(F.sequence("d0", "d1")).alias("day"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        alldays.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.last("day_cents", ignorenulls=True).over(w).alias("filled_cents"),
            F.col("day_cents").isNull().cast("int").alias("is_gap"),
        )
    )


def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase credits the user's most
    recent click no older than ATTR_WINDOW_US.

    Carry the latest click's (ts, event_id) forward over the user's
    (ts, event_id)-ordered stream, keep purchase rows, and null the
    credit when the click is outside the lookback. One shuffle on
    user_id, one window, no self-join — the join-free shape that holds
    when a user's history is millions of events. Microsecond integer
    arithmetic end to end (unix_micros / epoch_us), so the minutes-
    since value is exact in both engines."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    is_click = F.col("event_type") == "click"
    tagged = ev.select(
        "user_id",
        "event_id",
        "event_type",
        "ts_us",
        F.last(F.when(is_click, F.col("ts_us")), ignorenulls=True)
        .over(w)
        .alias("click_ts_us"),
        F.last(F.when(is_click, F.col("event_id")), ignorenulls=True)
        .over(w)
        .alias("click_event"),
    )
    in_window = F.col("ts_us") - F.col("click_ts_us") <= ATTR_WINDOW_US
    return tagged.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_event"),
        F.when(in_window, F.col("click_event")).alias("click_event"),
        F.when(
            in_window,
            F.floor((F.col("ts_us") - F.col("click_ts_us")) / 60_000_000).cast(
                "long"
            ),
        ).alias("mins_since_click"),
    )


PR_SCALE = 1_000_000  # PageRank mass in ppm (integer-exact)
PR_ITERS = 3
PR_D_NUM, PR_D_DEN = 85, 100  # damping 0.85 as a ratio


def pagerank_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the event-type transition graph, integer-exact.

    Edges are consecutive-event transitions per user (the Markov graph
    `ext_event_transitions` normalizes); PR_ITERS power iterations run
    with all mass in integer ppm — floor(d·pr·cnt / out) per edge, so
    every sum is exactly associative and the result is deterministic
    under any partitioning (the kmeans_refine determinism pattern
    applied to graph centrality). Dangling nodes would leak mass by
    construction (documented; none exist in this graph — every type
    transitions onward).

    Scale: the heavy step is building the edge list (one window over
    the user-partitioned event stream + a grouped count — same cost
    class as sessionization); iterations then run on the
    node/edge-count tables, which are type-cardinality-sized. For a
    web-scale graph the same loop shape holds with edges partitioned
    by dst and pr broadcast-joined per iteration."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        ev.select(
            F.col("event_type").alias("src"),
            F.lead("event_type").over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=False)  # reused every iteration
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = nodes.agg(F.count(F.lit(1)).alias("n_nodes"))
    out = edges.groupBy("src").agg(F.sum("cnt").alias("out_cnt"))
    base = F.floor(
        F.lit((PR_D_DEN - PR_D_NUM) * PR_SCALE) / (F.lit(PR_D_DEN) * F.col("n_nodes"))
    ).cast("long")
    pr = nodes.crossJoin(F.broadcast(n)).select(
        "node",
        F.floor(F.lit(PR_SCALE) / F.col("n_nodes")).cast("long").alias("pr"),
    )
    for _ in range(PR_ITERS):
        contrib = (
            edges.join(out, "src")
            .join(pr, edges["src"] == pr["node"])
            .groupBy("dst")
            .agg(
                F.sum(
                    F.floor(
                        (F.lit(PR_D_NUM) * F.col("pr") * F.col("cnt"))
                        / (F.lit(PR_D_DEN) * F.col("out_cnt"))
                    ).cast("long")
                ).alias("in_mass")
            )
        )
        pr = (
            nodes.crossJoin(F.broadcast(n))
            .join(contrib, nodes["node"] == contrib["dst"], "left")
            .select(
                "node",
                (base + F.coalesce("in_mass", F.lit(0))).alias("pr"),
            )
        )
    return pr.select(F.col("node").alias("event_type"), F.col("pr").alias("pr_ppm"))


AB_CONV_VALUE = 180.0  # high-value-purchase conversion threshold


def ab_test_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: deterministic hash split, per-variant
    conversion, two-proportion pooled z-score.

    Users split by salted hash (the assignment every experiment
    platform uses — stable, uniform, no assignment table); conversion
    is 'did the user ever purchase'. The z-score formula uses only
    +,-,*,/ and sqrt — all IEEE correctly-rounded, so the value is
    bit-identical in both engines when written as the same expression
    tree (ln/exp would NOT be; that is why the lift CI stops at z).
    One grouped agg over users; the variant rollup is 2 rows."""
    ev = load_table(spark, sf_dir, "events")
    # conversion = a HIGH-VALUE purchase (> AB_CONV_VALUE): plain
    # 'ever purchased' saturates to 100% on this fixture (pooled
    # variance 0, z undefined); the threshold keeps both arms strictly
    # inside (0, 1) at every sf
    users = ev.groupBy("user_id").agg(
        F.max(
            (
                (F.col("event_type") == "purchase")
                & (F.col("value") > AB_CONV_VALUE)
            ).cast("int")
        ).alias("conv")
    )
    per = (
        users.select(
            (md5_long(F.col("user_id").cast("string"), salt="ab") % 2).alias(
                "variant"
            ),
            "conv",
        )
        .groupBy("variant")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("conv").cast("long").alias("n_conv"),
        )
    )
    a = per.filter(F.col("variant") == 0).select(
        F.col("n_users").alias("n_a"), F.col("n_conv").alias("conv_a")
    )
    b = per.filter(F.col("variant") == 1).select(
        F.col("n_users").alias("n_b"), F.col("n_conv").alias("conv_b")
    )
    j = a.crossJoin(b)
    rate_a = F.col("conv_a") / F.col("n_a")
    rate_b = F.col("conv_b") / F.col("n_b")
    pool = (F.col("conv_a") + F.col("conv_b")) / (F.col("n_a") + F.col("n_b"))
    se = F.sqrt(
        pool * (1 - pool) * (1 / F.col("n_a") + 1 / F.col("n_b"))
    )
    return j.select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        F.round(rate_a, 6).alias("rate_a"),
        F.round(rate_b, 6).alias("rate_b"),
        F.round((rate_a - rate_b) / se, 4).alias("z_score"),
    )


DRIFT_BUCKET_W = 50.0  # fixed-width value buckets (domain 0..~500)
DRIFT_BUCKETS = 10
DRIFT_SCALE = 1_000_000  # chi-square reported as floor(1e6 * term) sum


def drift_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor: two-sample chi-square over fixed
    value buckets, for two deterministic sample pairs.

    Pair "even_odd" splits events by event_id parity (a null
    comparison — the statistic should be small) and "half_month" by
    day-of-month halves (where real temporal drift would show). The
    chi-square sum uses per-term floor(1e6 · (O−E)²/E) so the output
    is an exactly-reproducible integer — the drift DASHBOARD number,
    comparable across runs and engines (a float chi2 would be
    reduction-order-dependent). One conditional aggregate per pair
    over fixed-width buckets: map-side combinable, no shuffle beyond
    the bucket rollup; the bucket table is constant-width at any
    scale."""
    ev = load_table(spark, sf_dir, "events")
    bucket = F.least(
        F.floor(F.col("value") / DRIFT_BUCKET_W).cast("long"),
        F.lit(DRIFT_BUCKETS - 1),
    )

    def one_pair(name: str, ref_cond, cur_cond) -> DataFrame:
        per = ev.groupBy(bucket.alias("bucket")).agg(
            F.sum(ref_cond.cast("long")).alias("a"),
            F.sum(cur_cond.cast("long")).alias("b"),
        )
        tot = per.agg(
            F.sum("a").alias("na"), F.sum("b").alias("nb")
        )
        j = per.crossJoin(F.broadcast(tot)).filter(F.col("a") + F.col("b") > 0)
        ea = (
            (F.col("a") + F.col("b"))
            * F.col("na")
            / (F.col("na") + F.col("nb"))
        )
        eb = (
            (F.col("a") + F.col("b"))
            * F.col("nb")
            / (F.col("na") + F.col("nb"))
        )
        term = F.floor(
            F.lit(DRIFT_SCALE) * (F.col("a") - ea) * (F.col("a") - ea) / ea
        ) + F.floor(
            F.lit(DRIFT_SCALE) * (F.col("b") - eb) * (F.col("b") - eb) / eb
        )
        return j.agg(
            F.lit(name).alias("pair"),
            F.max("na").alias("n_ref"),
            F.max("nb").alias("n_cur"),
            F.count(F.lit(1)).alias("n_buckets"),
            F.sum(term).cast("long").alias("chi2_scaled"),
        )

    even = one_pair(
        "even_odd",
        F.col("event_id") % 2 == 0,
        F.col("event_id") % 2 == 1,
    )
    halves = one_pair(
        "half_month",
        F.dayofmonth("ts") <= 15,
        F.dayofmonth("ts") > 15,
    )
    return even.unionByName(halves)


SLO_PPM = 50_000  # error budget: 5% of events may be errors
SLO_WINDOW_D = 7  # trailing burn window (days)


def slo_burn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRE error-budget burn: daily error rate + trailing 7-day burn
    vs the SLO, with breach flags.

    Rates are integer ppm (floor(1e6·errors/events)) so the report is
    exactly reproducible; the trailing window runs over the
    days-cardinality rollup (tiny at any scale — the raw-event pass
    is one map-side-combinable conditional aggregate). The burn window
    requires a FULL window (n_days = 7) before flagging, mirroring
    the breakout screen's warm-up rule."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum((F.col("event_type") == "error").cast("long")).alias("n_errors"),
    )
    # bounded global window: calendar-days ladder (~thousands of rows)
    w = Window.orderBy("day").rowsBetween(-(SLO_WINDOW_D - 1), 0)
    burn = F.floor(
        F.lit(1_000_000) * F.sum("n_errors").over(w) / F.sum("n_events").over(w)
    ).cast("long")
    return daily.select(
        "day",
        "n_events",
        "n_errors",
        F.floor(F.lit(1_000_000) * F.col("n_errors") / F.col("n_events"))
        .cast("long")
        .alias("err_ppm"),
        burn.alias("burn7_ppm"),
        F.count(F.lit(1)).over(w).alias("n_days"),
    ).select(
        "day",
        "n_events",
        "n_errors",
        "err_ppm",
        "burn7_ppm",
        (
            (F.col("n_days") == SLO_WINDOW_D)
            & (F.col("burn7_ppm") > SLO_PPM)
        )
        .cast("int")
        .alias("breach"),
    )


RFM_BUCKETS = 4  # quartile scores per dimension


def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation over purchase events.

    Per user: Recency (days from last purchase to the corpus horizon),
    Frequency (purchase count), Monetary (integer cents); each scored
    into quartiles with deterministic (metric, user_id) tie-breaks,
    then labeled champion / loyal / at_risk / other by the standard
    score rules. The horizon is max(ts) over the corpus — a 1-row
    broadcast scalar, not a driver-side collect. The three quartile
    scores are exact ntile replays (ntile_expr) on range-partitioned
    global ranks (range_prefix) — the users ladder never funnels
    through a single-partition window sort; segments are a
    projection."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    per_user = purchases.groupBy("user_id").agg(
        F.max(F.unix_micros("ts")).alias("last_us"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias(
            "monetary_cents"
        ),
    )
    horizon = purchases.agg(F.max(F.unix_micros("ts")).alias("h_us"))
    base = per_user.crossJoin(F.broadcast(horizon)).select(
        "user_id",
        F.floor((F.col("h_us") - F.col("last_us")) / 86_400_000_000)
        .cast("long")
        .alias("recency_days"),
        "frequency",
        "monetary_cents",
    )
    # three independent global ranks (low recency / high frequency /
    # high monetary = best); desc orders ride as negated sort keys
    ranked = range_prefix(
        base, ["recency_days", "user_id"], rank_col="r_rnk",
        total_rows_col="_n",
    )
    ranked = range_prefix(
        ranked.withColumn("_negf", -F.col("frequency")),
        ["_negf", "user_id"],
        rank_col="f_rnk",
    )
    ranked = range_prefix(
        ranked.withColumn("_negm", -F.col("monetary_cents")),
        ["_negm", "user_id"],
        rank_col="m_rnk",
    )
    scored = ranked.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary_cents",
        ntile_expr("r_rnk", "_n", RFM_BUCKETS).cast("long").alias("r_score"),
        ntile_expr("f_rnk", "_n", RFM_BUCKETS).cast("long").alias("f_score"),
        ntile_expr("m_rnk", "_n", RFM_BUCKETS).cast("long").alias("m_score"),
    )
    return scored.withColumn(
        "segment",
        F.when(
            (F.col("r_score") == 1)
            & (F.col("f_score") == 1)
            & (F.col("m_score") == 1),
            "champion",
        )
        .when((F.col("r_score") <= 2) & (F.col("f_score") <= 2), "loyal")
        .when(F.col("r_score") == RFM_BUCKETS, "at_risk")
        .otherwise("other"),
    )


def repeat_purchase_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase rate by acquisition month: of the customers whose
    FIRST order fell in month M, what fraction ever ordered again —
    the one-number growth metric behind every cohort chart. Two
    map-side-combinable aggregations (per-customer first date + order
    count, then per-month rollup); rate in integer ppm."""
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.date_format(F.min("o_orderdate"), "yyyy-MM").alias("cohort_month"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    return per_cust.groupBy("cohort_month").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum((F.col("n_orders") > 1).cast("long")).alias("n_repeaters"),
        F.floor(
            F.sum((F.col("n_orders") > 1).cast("long"))
            * 1_000_000
            / F.count(F.lit(1))
        )
        .cast("long")
        .alias("repeat_ppm"),
    )


def inactivity_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event gap distribution in power-of-two microsecond buckets
    — the evidence behind a sessionization gap choice (the 30-minute
    constant in ext_session_paths should sit past the histogram's
    elbow). Bucket = floor(log2(gap_us)) computed EXACTLY as
    length(bin(gap)) - 1 — integer string arithmetic, no float log
    whose last-ulp could flip a power-of-two boundary differently per
    engine. One keyed window (lag per user), then a buckets-sized
    rollup."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        ev.select(
            "user_id",
            "ts",
            "event_id",
            (
                F.unix_micros("ts")
                - F.unix_micros(F.lag("ts").over(w))
            ).alias("gap_us"),
        )
        .filter(F.col("gap_us").isNotNull() & (F.col("gap_us") > 0))
    )
    bucket = (F.length(F.bin("gap_us")) - 1).cast("long")
    return gaps.groupBy(bucket.alias("log2_gap_us")).agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.min("gap_us").alias("min_gap_us"),
        F.max("gap_us").alias("max_gap_us"),
    )


def time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click→purchase latency distribution: for every purchase, the
    time since the SAME user's most recent prior click, bucketed into
    power-of-two microsecond classes (exact length(bin(gap))
    arithmetic, like ext_inactivity_histogram). The funnel-latency
    metric behind attribution-window choices: the 1-hour horizon in
    the stream-stream join should cover the histogram's mass. Plan:
    one keyed window over the (click|purchase) union carries the last
    click time onto each purchase — the PIT construction again, no
    interval join."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    last_click = F.max(
        F.when(F.col("event_type") == "click", F.unix_micros("ts"))
    ).over(w)
    gaps = (
        ev.withColumn("last_click_us", last_click)
        .filter(
            (F.col("event_type") == "purchase")
            & F.col("last_click_us").isNotNull()
        )
        .select(
            (F.unix_micros("ts") - F.col("last_click_us")).alias("gap_us")
        )
        .filter(F.col("gap_us") > 0)
    )
    bucket = (F.length(F.bin("gap_us")) - 1).cast("long")
    return gaps.groupBy(bucket.alias("log2_latency_us")).agg(
        F.count(F.lit(1)).alias("n_conversions")
    )


HHI_REGION_TABLE = "supplier"


def supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-concentration (Herfindahl) index per supplier nation:
    HHI_ppm = floor(Σ rev_i² · 1e6 / (Σ rev_i)²) over each nation's
    suppliers' lineitem revenue (whole dollars — keeps the squares
    inside exact integer range; the final ratio is IEEE-identical in
    both engines from the same exact integer inputs). 10000 ppm = a
    perfectly fragmented market; 1e6 = a monopoly supplier."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    rev = (
        li.groupBy("l_suppkey")
        .agg(
            F.floor(
                F.sum(F.floor(F.col("l_extendedprice") * 100 + 0.5)) / 100
            )
            .cast("long")
            .alias("rev_usd")
        )
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    return rev.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.sum("rev_usd").alias("total_usd"),
        F.floor(
            F.sum(F.col("rev_usd") * F.col("rev_usd")).cast("double")
            * 1_000_000
            / (
                F.sum("rev_usd").cast("double")
                * F.sum("rev_usd").cast("double")
            )
        )
        .cast("long")
        .alias("hhi_ppm"),
    )


COVER_WINDOW_US = 5 * 60 * 1_000_000  # each event covers 5 min of activity


def interval_union_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union-of-intervals covered time per user: every event opens a
    fixed COVER_WINDOW_US activity interval; overlapping intervals are
    merged (gaps-and-islands) and the user's covered wall-clock is the
    sum of merged-island lengths — the classic "billable uptime" /
    "active minutes" metric that naive sum-of-durations double-counts.
    Island detection: a row starts a new island iff its start exceeds
    the running MAX(end) over all earlier rows of the user (running max,
    not lag — an earlier long interval can swallow several later ones).
    Output: (user_id, n_intervals, covered_us), all exact integers.

    Scale notes (100 TB): one hash exchange on user_id feeds both the
    running-max window and the island rollup; rows stay thin
    (user_id, start, end). Per-user state is a single running max —
    no island materializes more than its member rows, no driver
    participation. The sweep-line cousin (`concurrency_sweep`) answers
    "how many open now"; this answers "how long was anything open".
    """
    from pyspark.sql import Window

    iv = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("s")
    ).withColumn("e", F.col("s") + COVER_WINDOW_US)
    wo = Window.partitionBy("user_id").orderBy("s", "e")
    prev_end = F.max("e").over(
        wo.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.withColumn(
        "new_island",
        F.when(prev_end.isNull() | (F.col("s") > prev_end), 1).otherwise(0),
    ).withColumn(
        "island",
        F.sum("new_island").over(
            wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    islands = flagged.groupBy("user_id", "island").agg(
        (F.max("e") - F.min("s")).alias("len_us")
    )
    return islands.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum("len_us").alias("covered_us"),
    )


KMV_K = 64  # bottom-k sketch size
_MAX60 = float(1 << 60)  # md5_long range, for hash → (0,1) normalization


def kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values / bottom-k) distinct-count sketch per
    event type over daily-active (user, day) keys: keep the K smallest
    distinct hash values; the estimator is (K−1)/u_K where u_K is the
    K-th smallest hash normalized to (0,1). Unlike HLL (rows-only in
    this suite), KMV is fully deterministic from the hash function, so
    the sketch itself is exactly oracle-checkable — the output carries
    the exact count and the signed estimator error side by side.

    Scale notes (100 TB): the sketch is mergeable (union = bottom-K of
    the union), so per-partition bottom-K heaps combine map-side; the
    shuffle is K rows per (group, partition), never data-sized. Here
    the bottom-K is expressed as a rank-≤-K window over the distinct
    thin (type, hash) rows — Spark pushes the rank filter into the
    sort. Distinct-hash semantics (collisions merge) is the sketch's
    own definition, identically on both engines.
    """
    from pyspark.sql import Window

    keys = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.concat_ws(
            ":",
            F.col("user_id").cast("string"),
            F.date_format("ts", "yyyy-MM-dd"),
        ).alias("key"),
    )
    hashed = keys.select(
        "event_type", md5_long(F.col("key"), salt="kmv").alias("h")
    ).distinct()
    w = Window.partitionBy("event_type").orderBy("h")
    bottom = (
        hashed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= KMV_K)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("k_seen"),
            F.max("h").alias("u_k"),
        )
    )
    exact = hashed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_exact")
    )
    est = F.when(
        F.col("k_seen") < KMV_K, F.col("k_seen").cast("double")
    ).otherwise(
        F.lit(float(KMV_K - 1)) / (F.col("u_k") / F.lit(_MAX60))
    )
    return (
        exact.join(F.broadcast(bottom), "event_type")
        .select(
            "event_type",
            "n_exact",
            F.round(est, 4).alias("kmv_est"),
            F.round(
                (est - F.col("n_exact")) * 100.0 / F.col("n_exact"), 4
            ).alias("err_pct"),
        )
    )


def winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized robust statistics per return flag: clip extended
    prices to the [p1, p99] exact percentile bounds, then compare the
    raw and winsorized means — the standard outlier-robust location
    estimate that, unlike trimming, keeps n constant. All arithmetic
    runs in exact integer cents (bounds integerized by round-half-up)
    so the means are order-of-accumulation-proof on both engines.

    Scale notes (100 TB): two passes over the fact table — a grouped
    exact-percentile pass whose tiny (group, lo, hi) result broadcasts
    back onto the stream, then one map-side-combinable rollup. The
    group key has only 3 values; at real scale swap `percentile` for
    the mergeable t-digest `percentile_approx` (same shape, one pass,
    bounded rank error) as `ext_percentiles` documents.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.floor(F.col("l_extendedprice") * 100 + 0.5)
        .cast("long")
        .alias("pc"),
    )
    bounds = li.groupBy("l_returnflag").agg(
        F.floor(F.expr("percentile(pc, 0.01)") + 0.5)
        .cast("long")
        .alias("lo_c"),
        F.floor(F.expr("percentile(pc, 0.99)") + 0.5)
        .cast("long")
        .alias("hi_c"),
    )
    j = li.join(F.broadcast(bounds), "l_returnflag").withColumn(
        "cl", F.least(F.greatest("pc", "lo_c"), "hi_c")
    )
    return j.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.max("lo_c") / 100.0, 2).alias("lo"),
        F.round(F.max("hi_c") / 100.0, 2).alias("hi"),
        F.round(F.sum("pc") / (100.0 * F.count(F.lit(1))), 4).alias(
            "mean_raw"
        ),
        F.round(F.sum("cl") / (100.0 * F.count(F.lit(1))), 4).alias(
            "mean_winsorized"
        ),
    )


AUTOCORR_LAGS = (1, 7)  # day-over-day and week-over-week


def autocorr_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-k autocorrelation of the daily order-revenue series (lags
    1 and 7 — the day-over-day momentum and weekly seasonality
    gauges). Pearson r is computed from the CLOSED FORM
    (n·Sxy − Sx·Sy) / (√(n·Sxx − Sx²)·√(n·Syy − Sy²)) where every S
    is an exact DECIMAL(38,0) sum of integer cents (and cent
    products) — never a float accumulation, so the result is
    bit-identical regardless of partial-agg order. Built-in corr()
    would be one pass but order-dependent in the last ulp; a metrics
    gate needs the reproducible form. Missing calendar days simply
    drop the pair (inner join on day+lag), as documented.

    Scale notes (100 TB): the daily rollup is dates-sized (map-side
    combined); the lagged self-join runs on that tiny series
    (broadcast), and each lag reduces to ONE 5-decimal-sum aggregate
    row. Adding lags adds broadcast joins over the same cached daily
    table, not passes over the fact data.
    """
    daily = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.to_date("o_orderdate").alias("day"),
            F.floor(F.col("o_totalprice") * 100 + 0.5)
            .cast("long")
            .alias("cents"),
        )
        .groupBy("day")
        .agg(F.sum("cents").alias("rev"))
        .localCheckpoint()  # consumed 2× per lag; cut the re-scan
    )
    dec = "decimal(19,0)"
    outs = []
    for lag in AUTOCORR_LAGS:
        lead = daily.select(
            F.date_add("day", -lag).alias("day"),
            F.col("rev").alias("rev_y"),
        )
        pairs = daily.join(lead, "day").select(
            F.col("rev").cast(dec).alias("x"),
            F.col("rev_y").cast(dec).alias("y"),
        )
        s = pairs.agg(
            F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.col("y") * F.col("y")).alias("syy"),
        )
        outs.append(
            s.select(
                F.lit(lag).cast("long").alias("lag"),
                F.col("n").cast("long").alias("n_pairs"),
                F.round(
                    (
                        (F.col("n") * F.col("sxy")).cast("double")
                        - (F.col("sx") * F.col("sy")).cast("double")
                    )
                    / (
                        F.sqrt(
                            (F.col("n") * F.col("sxx")).cast("double")
                            - (F.col("sx") * F.col("sx")).cast("double")
                        )
                        * F.sqrt(
                            (F.col("n") * F.col("syy")).cast("double")
                            - (F.col("sy") * F.col("sy")).cast("double")
                        )
                    ),
                    6,
                ).alias("r"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


def bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitmap-index distinct count: pack user ids into 32-bit chunk
    bitmaps (chunk = id div 32, bit = id mod 32 — 32 not 64 because a
    portable engine pair must avoid the 1<<63 sign-boundary shift,
    which DuckDB rejects as overflow), BIT_OR the masks per
    (event_type, chunk), then SUM(bit_count(mask)) — the roaring-
    bitmap-style exact distinct that replaces a wide `count(distinct)`
    expand with plain integer aggregation. The exact countDistinct
    runs alongside and the output carries both, pinning the bitmap
    path to the truth.

    Scale notes (100 TB): the shuffle after the map-side BIT_OR is
    bounded by groups × ceil(id_space/32) mask rows — for a 10^9-user
    id space that is ~31M longs per group, independent of event count;
    the masks then collapse to one long per group. This is the
    standard bitmap rollup for dense integer key spaces; for sparse or
    non-integer keys, hash to a dense space first (collisions then
    make it a sketch — see `ext_kmv_distinct` for the principled one).
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("user_id") / 32).cast("long").alias("chunk"),
        (F.col("user_id") % 32).cast("int").alias("bit"),
    )
    masks = ev.groupBy("event_type", "chunk").agg(
        F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), bit))").alias("mask")
    )
    bitmap = masks.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(F.bit_count("mask")).alias("n_distinct_bitmap"),
    )
    exact = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n_distinct_exact"))
    )
    return bitmap.join(F.broadcast(exact), "event_type")


def ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority OLS trend of daily order revenue on the calendar
    day index: slope (cents/day), intercept and R² from the normal-
    equation closed form, with every moment an exact DECIMAL(38,0)
    sum of integers (x = epoch day, y = cents) — the same
    order-of-accumulation-proof construction as `ext_autocorr_daily`,
    extended from correlation to regression. Both engines evaluate
    the IDENTICAL expression tree over the exact moments, so the
    doubles agree to the bit before rounding.

    Scale notes (100 TB): the (priority, day) rollup is the only
    fact-sized pass (map-side combined); the five moments per group
    reduce to one row each, and the closed form is driver-free
    arithmetic on those rows. This is how you regress on 100 TB
    without MLlib: aggregate moments, not rows.
    """
    dec = "decimal(19,0)"
    daily = (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_orderpriority",
            F.datediff(
                F.to_date("o_orderdate"), F.lit("1970-01-01")
            ).alias("xd"),
            F.floor(F.col("o_totalprice") * 100 + 0.5)
            .cast("long")
            .alias("cents"),
        )
        .groupBy("o_orderpriority", "xd")
        .agg(F.sum("cents").alias("rev"))
        .select(
            "o_orderpriority",
            F.col("xd").cast(dec).alias("x"),
            F.col("rev").cast(dec).alias("y"),
        )
    )
    m = daily.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy")).cast("double") - (
        F.col("sx") * F.col("sy")
    ).cast("double")
    den = (F.col("n") * F.col("sxx")).cast("double") - (
        F.col("sx") * F.col("sx")
    ).cast("double")
    deny = (F.col("n") * F.col("syy")).cast("double") - (
        F.col("sy") * F.col("sy")
    ).cast("double")
    return m.select(
        "o_orderpriority",
        F.col("n").cast("long").alias("n_days"),
        F.round(num / den, 6).alias("slope_cents_per_day"),
        F.round(
            (
                F.col("sy").cast("double")
                - num / den * F.col("sx").cast("double")
            )
            / F.col("n").cast("double"),
            2,
        ).alias("intercept_cents"),
        F.round(num * num / (den * deny), 6).alias("r2"),
    )


def weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-weighted median quantity per return flag: the smallest
    quantity q where the cumulative revenue of rows with quantity ≤ q
    reaches half the group's total (lower weighted median). Entirely
    integer arithmetic — the crossing test is 2·cum ≥ total on exact
    cents, so no midpoint float ever forms. The plain (unweighted)
    median ignores that a 50-unit line carries 50× the money of a
    1-unit line; the weighted one answers "half the revenue sits at or
    below THIS quantity".

    Scale notes (100 TB): pre-aggregate to (group, quantity) cells
    first — the window then runs over ≤|quantity domain| rows per
    group, not fact rows, and the fact-sized work is one map-side-
    combinable rollup. The crossing row is selected with min-over-
    filter, no driver logic.
    """
    from pyspark.sql import Window

    cells = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            "l_returnflag",
            F.col("l_quantity").cast("long").alias("qty"),
            F.floor(F.col("l_extendedprice") * 100 + 0.5)
            .cast("long")
            .alias("cents"),
        )
        .groupBy("l_returnflag", "qty")
        .agg(F.sum("cents").alias("w"))
    )
    wo = Window.partitionBy("l_returnflag").orderBy("qty")
    cum = F.sum("w").over(
        wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = F.sum("w").over(Window.partitionBy("l_returnflag"))
    crossed = cells.select(
        "l_returnflag",
        "qty",
        tot.alias("total_cents"),
        (cum * 2 >= tot).alias("crossed"),
    ).filter("crossed")
    return crossed.groupBy("l_returnflag").agg(
        F.min("qty").alias("weighted_median_qty"),
        F.max("total_cents").alias("total_cents"),
    )


CUSUM_TOP = 5  # report the top-|S| candidate changepoint days


def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint screen on the daily revenue series: the
    classic cumulative-sum statistic S_i = Σ_{j≤i}(y_j − ȳ), whose
    extremum marks the most likely single changepoint. Computed
    SCALED BY n — S'_i = n·cum_i − i·total — so the statistic stays
    exact integer arithmetic (no float mean subtraction to accumulate
    error); the reported deviation divides back once at the end.
    Output: the CUSUM_TOP days with the largest |S'|, their mean-
    relative deviation in cents and the sign (+1 level-up / −1
    level-down regime before vs after).

    Scale notes (100 TB): the only fact-sized pass is the daily
    rollup; the ordered window then runs on the dates-sized series
    (thousands of rows at any corpus size), and top-|S| is a
    TakeOrdered, not a sort. Exactness at scale forces the n-scaling:
    n·cum reaches ~10^20 at 100 TB, hence DECIMAL(38,0)/int128, not
    long.
    """
    from pyspark.sql import Window

    daily = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("day"),
            F.floor(F.col("o_totalprice") * 100 + 0.5)
            .cast("long")
            .alias("cents"),
        )
        .groupBy("day")
        .agg(F.sum("cents").cast("decimal(19,0)").alias("rev"))
    )
    tot = daily.agg(
        F.count(F.lit(1)).cast("decimal(19,0)").alias("n"),
        F.sum("rev").alias("total"),
    )
    # bounded global window: calendar-days ladder (~thousands of rows)
    wo = Window.orderBy("day")
    scored = (
        daily.crossJoin(F.broadcast(tot))
        .withColumn(
            "cum",
            F.sum("rev").over(
                wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .withColumn(
            "i", F.row_number().over(wo).cast("decimal(19,0)")
        )
        .withColumn(
            "s",
            F.col("n") * F.col("cum") - F.col("i") * F.col("total"),
        )
    )
    return (
        scored.orderBy(F.abs("s").desc(), "day")
        .limit(CUSUM_TOP)
        .select(
            "day",
            F.round(
                F.col("s").cast("double") / F.col("n").cast("double") / 100.0,
                2,
            ).alias("cusum_usd"),
            F.signum(F.col("s").cast("double")).cast("long").alias("sign"),
        )
    )


def audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact pairwise audience overlap between event types: Jaccard of
    the daily-active (user, day) key sets for every unordered type
    pair — the segment-overlap matrix behind "do clickers also buy".
    Output: both set sizes, the intersection and the Jaccard (exact
    integer ratio, rounded once at the end).

    Scale notes (100 TB): the self-join runs on DISTINCT thin
    (type, key-hash) rows — the join key is the member, so the shuffle
    is set-sized, not event-sized, and each member contributes at most
    |types|² pair rows (types is small). Per-type sizes broadcast back
    onto the tiny pair table. For hundreds of segments, switch to the
    sketch route (`ext_kmv_intersection`) — same shape, constant-size
    state per segment.
    """
    keys = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.concat_ws(
            ":",
            F.col("user_id").cast("string"),
            F.date_format("ts", "yyyy-MM-dd"),
        ).alias("key"),
    )
    hashed = keys.select(
        "event_type", md5_long(F.col("key"), salt="kmv").alias("h")
    ).distinct()
    sizes = hashed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    a, b = hashed.alias("a"), hashed.alias("b")
    inter = (
        a.join(b, F.col("a.h") == F.col("b.h"))
        .filter(F.col("a.event_type") < F.col("b.event_type"))
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(
        F.col("event_type").alias("type_a"), F.col("n").alias("n_a")
    )
    sb = sizes.select(
        F.col("event_type").alias("type_b"), F.col("n").alias("n_b")
    )
    return (
        inter.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            "n_inter",
            F.round(
                F.col("n_inter")
                * 1.0
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                4,
            ).alias("jaccard"),
        )
    )


def kmv_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch-style set intersection from KMV bottom-K sketches:
    for each event-type pair, intersect the two sketches, keep common
    hashes below θ = min(θ_a, θ_b) (θ of a saturated sketch is its
    K-th value; of an unsaturated one, 1.0 — it holds the whole set),
    and estimate |A∩B| ≈ |common < θ| / θ. The exact intersection
    (from `ext_audience_overlap`'s construction) rides along, so the
    artifact shows the estimator error the sketch trades for its
    constant size. Deterministic end-to-end — same salted hash, no
    randomness.

    Scale notes (100 TB): this is the whole point of the sketch — the
    pairwise stage touches only K-row sketches (segments × K longs,
    broadcastable for thousands of segments), never the member sets.
    Building the sketches is the same mergeable bottom-K pass as
    `ext_kmv_distinct`.
    """
    from pyspark.sql import Window

    keys = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.concat_ws(
            ":",
            F.col("user_id").cast("string"),
            F.date_format("ts", "yyyy-MM-dd"),
        ).alias("key"),
    )
    hashed = keys.select(
        "event_type", md5_long(F.col("key"), salt="kmv").alias("h")
    ).distinct()
    w = Window.partitionBy("event_type").orderBy("h")
    sk = hashed.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= KMV_K
    )
    theta = sk.groupBy("event_type").agg(
        F.when(F.count(F.lit(1)) < KMV_K, F.lit(1 << 60))
        .otherwise(F.max("h"))
        .alias("theta")
    )
    a, b = sk.alias("a"), sk.alias("b")
    ta = theta.select(
        F.col("event_type").alias("type_a"),
        F.col("theta").alias("theta_a"),
    )
    tb = theta.select(
        F.col("event_type").alias("type_b"),
        F.col("theta").alias("theta_b"),
    )
    common = (
        a.join(b, F.col("a.h") == F.col("b.h"))
        .filter(F.col("a.event_type") < F.col("b.event_type"))
        .select(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
            F.col("a.h").alias("h"),
        )
        .join(F.broadcast(ta), "type_a")
        .join(F.broadcast(tb), "type_b")
        .filter(F.col("h") < F.least("theta_a", "theta_b"))
        .groupBy("type_a", "type_b")
        .agg(
            F.count(F.lit(1)).alias("n_below"),
            F.max(F.least("theta_a", "theta_b")).alias("theta"),
        )
    )
    exact_full = (
        hashed.alias("x")
        .join(
            hashed.alias("y"), F.col("x.h") == F.col("y.h")
        )
        .filter(F.col("x.event_type") < F.col("y.event_type"))
        .groupBy(
            F.col("x.event_type").alias("type_a"),
            F.col("y.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_inter_exact"))
    )
    est = F.col("n_below") / (
        F.col("theta").cast("double") / F.lit(_MAX60)
    )
    return (
        exact_full.join(F.broadcast(common), ["type_a", "type_b"])
        .select(
            "type_a",
            "type_b",
            "n_inter_exact",
            F.round(est, 4).alias("kmv_est"),
            F.round(
                (est - F.col("n_inter_exact"))
                * 100.0
                / F.col("n_inter_exact"),
                4,
            ).alias("err_pct"),
        )
    )


def sliding_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct users per day, computed with mergeable
    chunk bitmaps instead of 7 overlapping COUNT(DISTINCT) passes:
    each (day, chunk) activity mask is SCATTERED to the 7 windows it
    participates in (a constant ×7 explode), masks BIT_OR-merge per
    (window-day, chunk), and bit_count sums give the exact distinct.
    `distinct users this week` for every day in one relational pass —
    the pre-aggregated daily state is what an incremental/streaming
    materialization would checkpoint.

    Scale notes (100 TB): event-sized work is only the daily mask
    build (map-side combined); the scatter multiplies the already
    tiny (days × active-chunks) state by the window length, never the
    events. Window length W costs ×W state — for W=90 switch to a
    two-level day→week pyramid (OR of 13 weekly masks + edge days).
    Compare `ext_running_distinct_users` (cumulative exact via min
    first-seen day) — that trick cannot do sliding windows; bitmaps
    can.
    """
    ev = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"),
        F.floor(F.col("user_id") / 32).cast("long").alias("chunk"),
        (F.col("user_id") % 32).cast("int").alias("bit"),
    )
    masks = ev.groupBy("day", "chunk").agg(
        F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), bit))").alias("mask")
    )
    scattered = masks.select(
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("off"),
        "day",
        "chunk",
        "mask",
    ).select(
        F.date_add("day", F.col("off")).alias("day"), "chunk", "mask"
    )
    win = scattered.groupBy("day", "chunk").agg(
        F.expr("bit_or(mask)").alias("m7")
    )
    days = ev.select("day").distinct()
    return (
        win.join(days, "day")
        .groupBy("day")
        .agg(F.sum(F.bit_count("m7")).alias("n_distinct_7d"))
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n_distinct_7d",
        )
    )


def burstiness_fano(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burstiness screen per event type: the Fano factor
    (variance/mean) of the DAILY event counts — ≈1 for a Poisson
    (memoryless) stream, ≫1 for bursty traffic, ≪1 for throttled/
    regular traffic. Sample variance comes from exact integer moments
    ((n·Σx² − (Σx)²)/(n·(n−1))), so the statistic is accumulation-
    order-proof like `ext_ols_trend`. The classifier column applies
    the conventional 0.9/1.1 cutoffs.

    Scale notes (100 TB): daily counts are a map-side-combined
    rollup; the moments reduce dates-sized rows to one row per type.
    Nothing here ever holds more than (types × days) thin rows.
    """
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
        )
        .agg(F.count(F.lit(1)).cast("decimal(19,0)").alias("c"))
    )
    m = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("decimal(19,0)").alias("n"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("ss"),
    )
    var = (
        (F.col("n") * F.col("ss")).cast("double")
        - (F.col("s") * F.col("s")).cast("double")
    ) / (F.col("n") * (F.col("n") - 1)).cast("double")
    mean = F.col("s").cast("double") / F.col("n").cast("double")
    fano = var / mean
    return m.select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        F.round(mean, 4).alias("mean_daily"),
        F.round(var, 4).alias("var_daily"),
        F.round(fano, 4).alias("fano"),
        F.when(fano > 1.1, F.lit("bursty"))
        .when(fano < 0.9, F.lit("regular"))
        .otherwise(F.lit("poisson-like"))
        .alias("regime"),
    )


EQD_BUCKETS = 10  # equi-depth histogram bucket count


def equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (equi-height) histogram of extended price — the
    optimizer-statistics histogram that adapts bucket widths to the
    data (a fixed-width histogram wastes buckets on empty ranges and
    crushes the mode into one bin; see `ext_histogram` for that
    primitive). Boundaries are the exact i/B percentiles of integer
    cents; rows are assigned by counting boundaries strictly below
    the value, so boundary ties land deterministically in the lower
    bucket on both engines. Output: per bucket its realized row count
    and [lo, hi] — near-equal counts, data-driven widths.

    Scale notes (100 TB): NO global sort and NO ntile window — the
    B−1 boundary values broadcast as a tiny array and assignment is a
    per-row scan expression, then one (bucket, agg) shuffle of B
    rows. The cumulative ladder over the DISTINCT values (which
    scales with the value domain, ~rows for near-unique prices) runs
    through range_prefix — range-partitioned prefix sums, never one
    task. At real scale compute boundaries with the mergeable
    t-digest (`percentile_approx`) instead of exact percentile; the
    assignment side is unchanged.
    """
    li = ensure_min_partitions(load_table(spark, sf_dir, "lineitem")).select(
        F.floor(F.col("l_extendedprice") * 100 + 0.5)
        .cast("long")
        .alias("pc")
    )
    # Boundaries WITHOUT the percentile aggregate: Spark's exact
    # percentile buffers the whole column into one reducer (~10×
    # slower here and memory-bound at scale). Round 10: the previous
    # form aggregated the 583k DISTINCT prices and ran the cumulative
    # ladder over them — but only 18 ORDER STATISTICS are consumed, so
    # rank the rows directly through range_prefix's rank-only fast
    # path (one range exchange, no distinct aggregation, no prefix
    # sums) and pick the rows whose global rank IS a boundary rank.
    # The value at a given rank is independent of how ties in pc are
    # ordered, so a monotonically_increasing_id tiebreak (unique per
    # materialization — the ladder checkpoints internally) satisfies
    # the unique-order contract without affecting the output. Rank
    # math is exact integer rational — lo_rank = (n−1)·i div B,
    # frac = ((n−1)·i mod B)/B — so both engines pick identical order
    # statistics (float (n−1)·q at a divisibility boundary does not).
    ranked = range_prefix(
        li.withColumn("_rid", F.monotonically_increasing_id()),
        ["pc", "_rid"],
        total_rows_col="_n",
    ).select("pc", "rnk")
    n = li.agg(F.count(F.lit(1)).alias("n"))
    ranks = (
        spark.range(1, EQD_BUCKETS)
        .withColumnRenamed("id", "i")
        .crossJoin(F.broadcast(n))
        .select(
            "i",
            F.expr(f"(n - 1) * i div {EQD_BUCKETS}").alias("lo_r"),
            (
                ((F.col("n") - 1) * F.col("i") % EQD_BUCKETS)
                / float(EQD_BUCKETS)
            ).alias("frac"),
            F.col("n"),
        )
        .select(
            "i",
            "lo_r",
            "frac",
            F.least(F.col("lo_r") + 1, F.col("n") - 1).alias("hi_r"),
        )
    )
    lo = (
        ranked.join(
            F.broadcast(ranks), F.col("rnk") == F.col("lo_r") + 1
        )
        .select("i", "frac", F.col("pc").alias("v_lo"))
    )
    hi = (
        ranked.join(
            F.broadcast(ranks), F.col("rnk") == F.col("hi_r") + 1
        )
        .select(F.col("i").alias("i2"), F.col("pc").alias("v_hi"))
    )
    blong = lo.join(F.broadcast(hi), F.col("i") == F.col("i2")).select(
        "i",
        F.floor(
            F.col("v_lo")
            + (F.col("v_hi") - F.col("v_lo")) * F.col("frac")
            + 0.5
        )
        .cast("long")
        .alias("b"),
    )
    bounds = blong.agg(
        *[
            F.max(F.when(F.col("i") == k + 1, F.col("b"))).alias(f"b{k}")
            for k in range(EQD_BUCKETS - 1)
        ]
    )
    bucket = sum(
        (F.col("pc") > F.col(f"b{i}")).cast("long")
        for i in range(EQD_BUCKETS - 1)
    )
    return (
        li.crossJoin(F.broadcast(bounds))
        .select(bucket.alias("bucket"), "pc")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.min("pc") / 100.0, 2).alias("lo"),
            F.round(F.max("pc") / 100.0, 2).alias("hi"),
        )
    )


EQA_ACC = 100  # percentile_approx accuracy → rank error <= n/EQA_ACC


def equidepth_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth histogram with t-digest-style APPROXIMATE boundaries
    — the documented 100-TB path of `ext_equidepth_histogram`, shipped
    with a PROVEN depth-tolerance certificate (the
    `ext_quantile_sketch` pattern): boundaries come from Spark's
    mergeable `percentile_approx` sketch (one pass, constant memory
    per executor, rank error <= n/accuracy guaranteed); assignment is
    the identical broadcast-bounds scan expression; and one exact
    counting pass certifies every bucket's realized depth against the
    guarantee. The approximate boundary VALUES are sketch-internal
    (they depend on merge order) and never emitted — the output
    (bucket, n_rows, target_depth, tol, depth_ok) is fully
    deterministic, so DuckDB hash-matches it by recomputing n, the
    target spacing, the tolerance, and expecting TRUE.

    Why the bound holds: boundary i's returned value has rank within
    n/ACC of ceil(i·n/B), so bucket i's realized count — the gap
    between two consecutive boundary ranks — deviates from its exact
    spacing by at most 2·n/ACC (each edge contributes n/ACC), plus
    <= 1 row per edge for ties sitting exactly on a boundary value:
    tol = 2·floor(n/ACC) + 2.

    Scale notes (100 TB): this REPLACES the exact operator's
    distinct-value ladder with a constant-size mergeable sketch — no
    per-value shuffle at all. The plan is: one map-side-combined
    sketch aggregate (B−1 boundaries out), broadcast of B−1 longs,
    one scan for assignment, one B-row agg. The certificate pass
    exists to make the approximation falsifiable; production drops
    it."""
    li = (
        ensure_min_partitions(load_table(spark, sf_dir, "lineitem"))
        .select(
            F.floor(F.col("l_extendedprice") * 100 + 0.5)
            .cast("long")
            .alias("pc")
        )
        .localCheckpoint()  # consumed by sketch AND assignment: decode once
    )
    qs = [i / EQD_BUCKETS for i in range(1, EQD_BUCKETS)]
    bounds = li.agg(
        F.percentile_approx("pc", qs, F.lit(EQA_ACC)).alias("bs"),
        F.count(F.lit(1)).alias("n"),
    ).select(
        *[F.col("bs")[k].alias(f"b{k}") for k in range(EQD_BUCKETS - 1)],
        "n",
    )
    bucket = sum(
        (F.col("pc") > F.col(f"b{i}")).cast("long")
        for i in range(EQD_BUCKETS - 1)
    )
    tol = 2 * F.floor(F.col("n") / EQA_ACC).cast("long") + 2
    return (
        li.crossJoin(F.broadcast(bounds))
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("depth"),
            F.max("n").alias("n"),
        )
        .select(
            "bucket",
            F.col("n").alias("n_rows"),
            F.floor(F.col("n") / EQD_BUCKETS).cast("long")
            .alias("target_depth"),
            tol.alias("tol"),
            (
                F.abs(
                    F.col("depth")
                    - F.floor(F.col("n") / EQD_BUCKETS).cast("long")
                )
                <= tol + F.lit(1)  # +1: floor vs ceil spacing remainder
            ).alias("depth_ok"),
        )
    )


def fifo_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIFO credit allocation per user: click values accrue a credit
    pool, purchase values consume it first-in-first-out — the classic
    inventory/lot-matching problem, solved relationally by turning
    both sides into CUMULATIVE ranges ([cum−x, cum) per event) and
    joining overlapping intervals; the overlap length IS the
    allocated amount. No loops, no state machine — two windows and a
    range join, all in exact cents. Output per user: allocation
    count, matched cents, and the unmatched remainder on each side.

    Scale notes (100 TB): both windows and the range join partition
    by user_id — one hash exchange each, per-user sequential scans.
    Intra-user skew (a mega-user's quadratic overlap pairs) is
    bounded because FIFO overlaps form a staircase: each click range
    overlaps at most (its span ÷ typical purchase) purchases, so the
    join output is ~linear in events, not quadratic.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
    )
    wo = Window.partitionBy("user_id").orderBy("ts_us", "event_id")

    def ranged(typ: str, lo: str, hi: str) -> DataFrame:
        side = ev.filter(F.col("event_type") == typ)
        cum = F.sum("cents").over(
            wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return side.select(
            "user_id",
            (cum - F.col("cents")).alias(lo),
            cum.alias(hi),
        )

    clicks = ranged("click", "cs", "ce")
    buys = ranged("purchase", "ps", "pe")
    alloc = (
        clicks.join(buys, "user_id")
        .filter((F.col("cs") < F.col("pe")) & (F.col("ps") < F.col("ce")))
        .select(
            "user_id",
            (
                F.least("ce", "pe") - F.greatest("cs", "ps")
            ).alias("matched"),
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_allocs"),
            F.sum("matched").alias("matched_cents"),
        )
    )
    totals = ev.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("event_type") == "click", F.col("cents")).otherwise(
                0
            )
        ).alias("click_cents"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase", F.col("cents")
            ).otherwise(0)
        ).alias("purchase_cents"),
    )
    return (
        totals.join(alloc, "user_id")
        .select(
            "user_id",
            "n_allocs",
            "matched_cents",
            (F.col("click_cents") - F.col("matched_cents")).alias(
                "unused_credit_cents"
            ),
            (F.col("purchase_cents") - F.col("matched_cents")).alias(
                "uncovered_purchase_cents"
            ),
        )
    )


def peak_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak detection on daily order revenue: a day is a peak iff it
    strictly beats both neighbors AND exceeds 1.5× its trailing
    7-day mean — the neighbor test kills plateaus, the prominence
    test kills noise ripples. The prominence comparison runs as
    14·rev > 3·sum7 in exact cents (no float mean), so a boundary
    day cannot flip between engines. Output: the peak days with
    revenue and prominence ratio.

    Scale notes (100 TB): all windows run on the dates-sized daily
    rollup; the only fact-sized pass is the map-side-combined daily
    sum. Same series-on-top-of-rollup shape as
    `ext_cusum_changepoint`.
    """
    from pyspark.sql import Window

    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.date_format("o_orderdate", "yyyy-MM-dd").alias("day"))
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
            ).alias("rev")
        )
    )
    # bounded global window: calendar-days ladder (~thousands of rows)
    wo = Window.orderBy("day")
    sum7 = F.sum("rev").over(wo.rowsBetween(-6, 0))
    n7 = F.count(F.lit(1)).over(wo.rowsBetween(-6, 0))
    scored = daily.select(
        "day",
        "rev",
        F.lag("rev", 1).over(wo).alias("prev"),
        F.lead("rev", 1).over(wo).alias("nxt"),
        sum7.alias("s7"),
        n7.alias("n7"),
    ).filter(
        (F.col("rev") > F.col("prev"))
        & (F.col("rev") > F.col("nxt"))
        & (F.col("n7") == 7)
        & (F.col("rev") * 14 > F.col("s7") * 3)
    )
    return scored.select(
        "day",
        F.round(F.col("rev") / 100.0, 2).alias("rev_usd"),
        F.round(F.col("rev") * 7.0 / F.col("s7"), 4).alias(
            "prominence"
        ),
    )


DID_CUT = "2024-01-16"  # pre/post boundary (events span Jan 2024)


def diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences on purchase value: treatment is a
    deterministic hash split of users, periods split at DID_CUT, and
    the estimator is (T_post − T_pre) − (C_post − C_pre) on mean
    purchase value — the design that removes both the level gap
    between arms and the common time trend, where a naive post-only
    comparison confounds the two. All four cell means are exact-cent
    sums over exact counts folded into ONE conditional-aggregate row,
    so no float ever crosses a group boundary.

    Scale notes (100 TB): one map-side-combined pass producing a
    single 8-counter row; the estimator is row-local arithmetic.
    Conditional aggregation (not 4 filtered subqueries) is what keeps
    it one scan.
    """
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            (
                md5_long(F.col("user_id").cast("string"), salt="did") % 2
                == 0
            ).alias("treated"),
            (F.date_format("ts", "yyyy-MM-dd") >= DID_CUT).alias("post"),
            F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
        )
    )

    def cell(tr: bool, po: bool, what: str):
        cond = (F.col("treated") == tr) & (F.col("post") == po)
        if what == "s":
            return F.sum(F.when(cond, F.col("cents")).otherwise(0))
        return F.sum(F.when(cond, 1).otherwise(0))

    m = ev.agg(
        *[
            cell(tr, po, w).alias(f"{w}_{int(tr)}{int(po)}")
            for tr in (False, True)
            for po in (False, True)
            for w in ("s", "n")
        ]
    )
    mean = {
        (tr, po): F.col(f"s_{int(tr)}{int(po)}")
        / 100.0
        / F.col(f"n_{int(tr)}{int(po)}")
        for tr in (False, True)
        for po in (False, True)
    }
    return m.select(
        F.round(mean[(True, False)], 4).alias("treat_pre"),
        F.round(mean[(True, True)], 4).alias("treat_post"),
        F.round(mean[(False, False)], 4).alias("ctrl_pre"),
        F.round(mean[(False, True)], 4).alias("ctrl_post"),
        F.round(
            (mean[(True, True)] - mean[(True, False)])
            - (mean[(False, True)] - mean[(False, False)]),
            4,
        ).alias("did_usd"),
    )


def ab_power_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment design: minimum detectable effect per event type at
    80% power / 5% α for an equal-split test on event value —
    MDE = 2.8·√(2σ²/n)/mean (the standard two-sample approximation),
    with σ² and the mean from exact integer moments. This is the
    query an experimentation platform runs BEFORE the test, and the
    honest answer to "can we even measure a 1% lift here"; the
    z-score query (`ext_ab_test_zscore`) is the after.

    Scale notes (100 TB): one map-side-combined moments pass, one row
    per type — same moments-not-rows shape as `ext_ols_trend`.
    """
    m = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_type",
            F.floor(F.col("value") * 100 + 0.5)
            .cast("decimal(19,0)")
            .alias("c"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("decimal(19,0)").alias("n"),
            F.sum("c").alias("s"),
            F.sum(F.col("c") * F.col("c")).alias("ss"),
        )
    )
    var = (
        (F.col("n") * F.col("ss")).cast("double")
        - (F.col("s") * F.col("s")).cast("double")
    ) / (F.col("n") * (F.col("n") - 1)).cast("double")
    mean = F.col("s").cast("double") / F.col("n").cast("double")
    n_arm = F.col("n").cast("double") / 2.0
    mde = F.lit(2.8) * F.sqrt(2.0 * var / n_arm) / mean
    return m.select(
        "event_type",
        F.col("n").cast("long").alias("n_events"),
        F.round(mean / 100.0, 4).alias("mean_usd"),
        F.round(F.sqrt(var) / 100.0, 4).alias("stddev_usd"),
        F.round(mde * 100.0, 4).alias("mde_pct"),
    )


def ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov test: D = max |F_click(v) −
    F_purchase(v)| over the merged value ladder — the distribution-
    shape test that catches what a mean test can't (same mean,
    different shape). The CDFs are exact integer cumulative counts
    over the distinct-cents ladder; D and its location come from a
    TakeOrdered argmax (ties broken toward the smaller value), and
    the 5% rejection threshold 1.36·√((n_a+n_b)/(n_a·n_b)) rides
    along. max-of-doubles is order-insensitive, so unlike a float SUM
    this is deterministic with no special construction.

    Scale notes (100 TB): one map-side-combined (value, side) rollup,
    then the cumulative counts run through range_prefix (range-
    partitioned prefix sums) — the distinct-value ladder of a
    CONTINUOUS column is ~rows for near-unique values, so a global
    unpartitioned window here would funnel everything through one
    task (round-8 verdict). Argmax is TakeOrdered. Nothing holds more
    than the distinct-value table, and no stage holds it in one task.
    """
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "purchase"))
        .select(
            F.floor(F.col("value") * 100 + 0.5).cast("long").alias("v"),
            (F.col("event_type") == "click").alias("is_a"),
        )
    )
    cells = ev.groupBy("v").agg(
        F.sum(F.col("is_a").cast("long")).alias("ca"),
        F.sum((~F.col("is_a")).cast("long")).alias("cb"),
    )
    tot = ev.agg(
        F.sum(F.col("is_a").cast("long")).alias("na"),
        F.sum((~F.col("is_a")).cast("long")).alias("nb"),
    )
    ladder = (
        range_prefix(cells, ["v"], sum_cols=("ca", "cb"))
        .select(
            "v",
            F.col("cum_ca").alias("cum_a"),
            F.col("cum_cb").alias("cum_b"),
        )
        .crossJoin(F.broadcast(tot))
    )
    d = F.abs(
        F.col("cum_a") / F.col("na") - F.col("cum_b") / F.col("nb")
    )
    return (
        ladder.select(
            "na", "nb", "v", d.alias("d")
        )
        .orderBy(F.col("d").desc(), "v")
        .limit(1)
        .select(
            "na",
            "nb",
            F.round("d", 6).alias("d_stat"),
            F.round(F.col("v") / 100.0, 2).alias("at_usd"),
            F.round(
                F.lit(1.36)
                * F.sqrt(
                    (F.col("na") + F.col("nb"))
                    / (F.col("na").cast("double") * F.col("nb"))
                ),
                6,
            ).alias("d_crit_5pct"),
        )
    )


VSHAPE_NUM, VSHAPE_DEN = 11, 10  # ≥10% move: 10·outer ≥ 11·bottom


def vshape_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-style row-pattern detection, emulated with lag
    windows: find V-shapes in daily revenue — a ≥10% drop into a
    bottom day immediately followed by a ≥10% recovery. Both
    threshold tests run as integer cross-multiplication
    (10·neighbor ≥ 11·bottom), so no float ratio ever decides a
    match. Output: each bottom day with its drop and recovery
    percentages. The same lag-chain technique extends to any
    fixed-length pattern (W-shapes, three-rising-peaks, …) — the
    relational emulation of Flink/Trino MATCH_RECOGNIZE for patterns
    of bounded length.

    Scale notes (100 TB): lag windows on the dates-sized rollup; the
    only fact-sized pass is the daily sum. Unbounded-length patterns
    need real state machines (see the streaming pack); bounded ones
    compile to lag chains like this.
    """
    from pyspark.sql import Window

    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.date_format("o_orderdate", "yyyy-MM-dd").alias("day"))
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
            ).alias("rev")
        )
    )
    # bounded global window: calendar-days ladder (~thousands of rows)
    wo = Window.orderBy("day")
    lagged = daily.select(
        "day",
        "rev",
        F.lag("rev", 1).over(wo).alias("prev"),
        F.lead("rev", 1).over(wo).alias("nxt"),
    ).filter(
        (F.col("prev") * VSHAPE_DEN >= F.col("rev") * VSHAPE_NUM)
        & (F.col("nxt") * VSHAPE_DEN >= F.col("rev") * VSHAPE_NUM)
    )
    return lagged.select(
        "day",
        F.round(F.col("rev") / 100.0, 2).alias("bottom_usd"),
        F.round(
            (F.col("prev") - F.col("rev")) * 100.0 / F.col("prev"), 4
        ).alias("drop_pct"),
        F.round(
            (F.col("nxt") - F.col("rev")) * 100.0 / F.col("rev"), 4
        ).alias("recovery_pct"),
    )


_KM_NANO = 1_000_000_000  # fixed-point scale for the log-survival sum


def _surv_event_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared right-censored click→purchase survival construction:
    per-duration event rows (dur, d_at, n_risk) with d_at > 0 — the
    day-grid both Kaplan–Meier and Nelson–Aalen walk."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.to_date("ts").alias("day")
    )
    per_user = (
        ev.groupBy("user_id")
        .agg(
            F.min(
                F.when(F.col("event_type") == "click", F.col("day"))
            ).alias("t0"),
            F.max("day").alias("last_seen"),
        )
        .filter(F.col("t0").isNotNull())
    )
    first_buy = (
        ev.filter(F.col("event_type") == "purchase")
        .join(
            per_user.select("user_id", "t0"), "user_id"
        )
        .filter(F.col("day") >= F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("day").alias("t_buy"))
    )
    durs = per_user.join(first_buy, "user_id", "left").select(
        F.datediff(
            F.coalesce("t_buy", "last_seen"), F.col("t0")
        ).cast("long").alias("dur"),
        F.col("t_buy").isNotNull().cast("long").alias("d"),
    )
    cells = durs.groupBy("dur").agg(
        F.count(F.lit(1)).alias("n_at"),
        F.sum("d").alias("d_at"),
    )
    n_total = durs.agg(F.count(F.lit(1)).alias("n_total"))
    # bounded global window: duration-days grid (<= calendar span)
    wo = Window.orderBy("dur")
    return (
        cells.crossJoin(F.broadcast(n_total))
        .select(
            "dur",
            "n_at",
            "d_at",
            (
                F.col("n_total")
                - F.coalesce(
                    F.sum("n_at").over(
                        wo.rowsBetween(Window.unboundedPreceding, -1)
                    ),
                    F.lit(0),
                )
            ).alias("n_risk"),
        )
        .filter(F.col("d_at") > 0)
    )


def nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson–Aalen cumulative hazard for click→purchase conversion —
    the estimator survival analysis reaches for when the HAZARD (not
    the survival probability) is the quantity of interest: H(t) =
    Σ_{t_i ≤ t} d_i/n_i accumulates risk additively, so segment
    slopes read directly as conversion intensity, and the companion
    variance Σ d_i/n_i² gives the pointwise confidence width.
    Kaplan–Meier (`ext_kaplan_meier`) shares this exact day-grid; the
    Breslow identity S ≈ exp(−H) ties the two (pytest-pinned).

    Exactness: each increment quantizes once — floor(1e9·d/n + 0.5),
    one IEEE division + floor — and the cumulative sums run on
    BIGINTs, so both engines walk identical integer sequences (no
    float running sum anywhere).

    Scale notes (100 TB): identical to Kaplan–Meier — one map-side
    combined per-user reduction, then all curve arithmetic on the
    durations-sized day grid.
    """
    from pyspark.sql import Window

    rows = _surv_event_rows(spark, sf_dir)
    hq = F.floor(
        F.col("d_at") / F.col("n_risk") * _KM_NANO + 0.5
    ).cast("long")
    vq = F.floor(
        F.col("d_at") / (F.col("n_risk") * F.col("n_risk")) * _KM_NANO
        + 0.5
    ).cast("long")
    # bounded global window: distinct-durations ladder
    wc = Window.orderBy("dur").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    curve = rows.select(
        "dur", "n_risk", "d_at", hq.alias("hq"), vq.alias("vq")
    ).select(
        "dur",
        "n_risk",
        "d_at",
        F.sum("hq").over(wc).alias("cum_hq"),
        F.sum("vq").over(wc).alias("cum_vq"),
    )
    return curve.select(
        F.col("dur").alias("t_days"),
        "n_risk",
        F.col("d_at").alias("d_events"),
        (F.col("cum_hq").cast("double") / _KM_NANO).alias("cum_hazard"),
        (F.col("cum_vq").cast("double") / _KM_NANO).alias("hazard_var"),
    )


def kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival curve for click→purchase conversion with
    RIGHT CENSORING: per user, time from first click to first
    subsequent purchase (event) or to last activity (censored — the
    observation that plain "average days to convert" silently throws
    away). S(t) = Π(1 − d_i/n_i) over event days, computed as the
    exp of an integer-quantized cumulative Σ ln(1 − d/n) — products
    of floats order-deterministically, same fixed-point trick as the
    entropy pack. Output per event day: risk-set size, events,
    survival and the discrete hazard d/n.

    Scale notes (100 TB): per-user reduction is one map-side-combined
    pass; the curve machinery (risk sets via reverse cumulative
    counts, the quantized log-sum) runs on the DURATIONS-sized
    day-grid, thousands of rows at any corpus size.
    """
    from pyspark.sql import Window

    graded = _surv_event_rows(spark, sf_dir)
    # the last event time can absorb the whole risk set (d = n):
    # ln(0) → substitute a -100-nat sentinel, which exp-rounds to the
    # correct S = 0 without an infinity crossing either engine
    logterm = F.when(
        F.col("d_at") < F.col("n_risk"),
        F.floor(
            F.log(1.0 - F.col("d_at") / F.col("n_risk")) * _KM_NANO + 0.5
        ).cast("long"),
    ).otherwise(F.lit(-100 * _KM_NANO).cast("long"))
    curve = graded.select(
        "dur", "n_risk", "d_at", logterm.alias("lq")
    ).withColumn(
        "cum_lq",
        F.sum("lq").over(
            # bounded global window: distinct-durations ladder
            Window.orderBy("dur").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        ),
    )
    return curve.select(
        F.col("dur").alias("t_days"),
        "n_risk",
        F.col("d_at").alias("d_events"),
        F.round(F.exp(F.col("cum_lq") / _KM_NANO), 6).alias("survival"),
        F.round(F.col("d_at") / F.col("n_risk"), 6).alias("hazard"),
    )


BOOT_B = 40  # bootstrap replicates
BOOT_RES = 1_000_000  # uniform resolution for the hash-derived draws
# cumulative Poisson(1) pmf, capped at k=7 — the weight ladder
_POIS_CUM = (
    0.36787944, 0.73575888, 0.92073549, 0.98101184,
    0.99634015, 0.99940582, 0.99991676,
)


def poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap 95% CI for the mean purchase value — the
    resampling scheme that works when the data won't fit one machine:
    instead of drawing n rows with replacement (which needs global
    coordination), each row independently receives a Poisson(1)
    weight per replicate; replicate means are weighted means. Here
    the "draws" are salted hashes pushed through the Poisson(1)
    inverse CDF ladder, so the whole procedure is deterministic and
    the CI is exactly reproducible. The interval is the 2nd/39th of
    the 40 ordered replicate means (the discrete 2.5%/97.5% ranks —
    no interpolation, no float percentile).

    Scale notes (100 TB): the explode is a constant ×B fan-out of
    thin (replicate, weight, cents) rows feeding one
    map-side-combined weighted-sum pass; replicate means are B rows.
    This is THE distributed bootstrap — per-row independence is the
    entire design.
    """
    from pyspark.sql import Window

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").cast("string").alias("eid"),
            F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
        )
    )
    reps = ev.select(
        "eid",
        "cents",
        F.explode(F.sequence(F.lit(0), F.lit(BOOT_B - 1))).alias("rep"),
    )
    u = (
        md5_long(
            F.concat_ws("#", F.col("eid"), F.col("rep")), salt="boot"
        )
        % BOOT_RES
        + 0.5
    ) / float(BOOT_RES)
    w = F.lit(7)
    for k in range(len(_POIS_CUM) - 1, -1, -1):
        w = F.when(u < _POIS_CUM[k], k).otherwise(w)
    means = (
        reps.select("rep", w.cast("long").alias("w"), "cents")
        .groupBy("rep")
        .agg(
            (
                F.sum(F.col("w") * F.col("cents"))
                / (100.0 * F.sum("w"))
            ).alias("m")
        )
    )
    # bounded global window: one row per bootstrap replicate (BOOT_REPS)
    wo = Window.orderBy("m", "rep")
    ranked = means.select(
        F.row_number().over(wo).alias("rk"), "m"
    )
    point = ev.agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("cents") / (100.0 * F.count(F.lit(1)))).alias("mean"),
    )
    # ONE aggregate picks both CI ranks — filtering `ranked` twice
    # would duplicate its whole subtree (and its scan) in the plan
    ci = ranked.agg(
        F.max(F.when(F.col("rk") == 2, F.col("m"))).alias("lo"),
        F.max(F.when(F.col("rk") == BOOT_B - 1, F.col("m"))).alias(
            "hi"
        ),
    )
    return (
        point.crossJoin(F.broadcast(ci))
        .select(
            "n",
            F.round("mean", 4).alias("mean_usd"),
            F.round("lo", 4).alias("ci_lo_usd"),
            F.round("hi", 4).alias("ci_hi_usd"),
        )
    )


def cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction: use each user's PRE-period purchase
    total as the covariate for their post-period metric —
    θ = cov(X,Y)/var(X), adjusted metric Y − θ(X − X̄) — the standard
    trick that shrinks experiment variance by exactly ρ²·100% and
    therefore the needed sample size by the same factor (pair with
    `ext_ab_power_mde`: CUPED is how you BUY a smaller MDE without
    more traffic). θ and ρ² come from exact DECIMAL moments over
    per-user integer cents (users absent in a period contribute 0 —
    the covariate must be defined for everyone).

    Scale notes (100 TB): one conditional-aggregate pass to per-user
    (pre, post) cents, one moments pass, row-local closed form —
    moments-not-rows again.
    """
    cut = DID_CUT
    per_user = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(
                    F.date_format("ts", "yyyy-MM-dd") < cut,
                    F.floor(F.col("value") * 100 + 0.5).cast("long"),
                ).otherwise(0)
            )
            .cast("decimal(19,0)")
            .alias("x"),
            F.sum(
                F.when(
                    F.date_format("ts", "yyyy-MM-dd") >= cut,
                    F.floor(F.col("value") * 100 + 0.5).cast("long"),
                ).otherwise(0)
            )
            .cast("decimal(19,0)")
            .alias("y"),
        )
    )
    m = per_user.agg(
        F.count(F.lit(1)).cast("decimal(19,0)").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy")).cast("double") - (
        F.col("sx") * F.col("sy")
    ).cast("double")
    denx = (F.col("n") * F.col("sxx")).cast("double") - (
        F.col("sx") * F.col("sx")
    ).cast("double")
    deny = (F.col("n") * F.col("syy")).cast("double") - (
        F.col("sy") * F.col("sy")
    ).cast("double")
    return m.select(
        F.col("n").cast("long").alias("n_users"),
        F.round(
            F.col("sy").cast("double")
            / F.col("n").cast("double")
            / 100.0,
            4,
        ).alias("mean_post_usd"),
        F.round(num / denx, 6).alias("theta"),
        F.round(num * num / (denx * deny) * 100.0, 4).alias(
            "var_reduction_pct"
        ),
    )


def mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney rank-sum test (click vs purchase values) with the
    tie correction — the distribution-free location test that pairs
    with `ext_ks_two_sample`'s shape test. All ranking runs on the
    distinct-value ladder in integers: doubled average ranks
    (2·rank = 2·cum_prev + t + 1) keep tied ranks exact, the tie
    term Σ(t³−t) is an exact integer sum, and the z-score is the
    only float — built once from exact moments.

    Scale notes (100 TB): identical shape to the KS ladder — one
    map-side-combined value rollup, cumulative counts via
    range_prefix (range-partitioned prefix sums — a continuous
    column's distinct-value ladder is ~rows, so never one task;
    round-8 verdict), a 1-row closed form.
    """
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "purchase"))
        .select(
            F.floor(F.col("value") * 100 + 0.5).cast("long").alias("v"),
            (F.col("event_type") == "click").alias("is_a"),
        )
    )
    cells = ev.groupBy("v").agg(
        F.sum(F.col("is_a").cast("long")).alias("ca"),
        F.sum((~F.col("is_a")).cast("long")).alias("cb"),
    )
    ladder = range_prefix(cells, ["v"], sum_cols=("ca", "cb")).select(
        "v",
        "ca",
        "cb",
        (F.col("ca") + F.col("cb")).alias("t"),
        # exclusive prefix of t = inclusive prefix sums minus own cell
        (
            F.col("cum_ca") + F.col("cum_cb") - F.col("ca") - F.col("cb")
        ).alias("cum_prev"),
    )
    sums = ladder.agg(
        F.sum("ca").alias("na"),
        F.sum("cb").alias("nb"),
        F.sum(
            F.col("ca") * (2 * F.col("cum_prev") + F.col("t") + 1)
        ).alias("r2a"),
        F.sum(
            F.col("t") * F.col("t") * F.col("t") - F.col("t")
        ).alias("ties"),
    )
    n = F.col("na") + F.col("nb")
    u2 = F.col("r2a") - F.col("na") * (F.col("na") + 1)
    mu2 = F.col("na") * F.col("nb")  # 2·E[U] = na·nb
    var = (
        F.col("na").cast("double")
        * F.col("nb")
        / 12.0
        * (
            (n + 1).cast("double")
            - F.col("ties").cast("double")
            / (n.cast("double") * (n - 1).cast("double"))
        )
    )
    return sums.select(
        F.col("na"),
        F.col("nb"),
        (u2 / F.lit(2.0)).alias("u_a"),
        F.round(
            (u2 - mu2).cast("double") / (2.0 * F.sqrt(var)), 6
        ).alias("z"),
    )


BH_Q = 0.10  # false-discovery-rate target
# Abramowitz–Stegun 26.2.17 constants for Φ(x), |err| < 7.5e-8 —
# pure +,*,/,exp arithmetic, so both engines produce identical doubles
_AS_B = (0.319381530, -0.356563782, 1.781477937, -1.821255978, 1.330274429)
_AS_P = 0.2316419
_SQRT_2PI = 2.5066282746310002


def _phi_tail(z):
    """Upper-tail 1−Φ(z) for z ≥ 0, A&S polynomial (column expr)."""
    k = 1.0 / (1.0 + _AS_P * z)
    poly = (
        _AS_B[0] * k
        + _AS_B[1] * k * k
        + _AS_B[2] * k * k * k
        + _AS_B[3] * k * k * k * k
        + _AS_B[4] * k * k * k * k * k
    )
    return F.exp(-z * z / 2.0) / _SQRT_2PI * poly


def bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini–Hochberg FDR correction across the per-type
    mean-value z-tests — the multiple-testing step every metrics
    sweep needs once it tests more than one hypothesis (5 tests at
    α=0.05 ⇒ ~23% chance of a false alarm uncorrected). p-values come
    from the A&S 26.2.17 normal-CDF polynomial (pure arithmetic —
    deterministic across engines, unlike a library erf); BH rejects
    every test ranked ≤ k* = max{i : p_i ≤ i·q/m}. Moments-based z,
    ladder logic in windows, all on m rows.

    Scale notes (100 TB): one moments pass per type; everything after
    is m-row arithmetic. The z here is one-sample vs the global mean
    — swap in any per-group test, the BH machinery is unchanged.
    """
    from pyspark.sql import Window

    m = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_type",
            F.floor(F.col("value") * 100 + 0.5)
            .cast("decimal(19,0)")
            .alias("c"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("decimal(19,0)").alias("n"),
            F.sum("c").alias("s"),
            F.sum(F.col("c") * F.col("c")).alias("ss"),
        )
    )
    g = m.agg(
        F.sum("n").alias("gn"),
        F.sum("s").alias("gs"),
        F.sum("ss").alias("gss"),
    )
    j = m.crossJoin(F.broadcast(g))
    gvar = (
        (F.col("gn") * F.col("gss")).cast("double")
        - (F.col("gs") * F.col("gs")).cast("double")
    ) / (F.col("gn") * (F.col("gn") - 1)).cast("double")
    gmean = F.col("gs").cast("double") / F.col("gn").cast("double")
    tmean = F.col("s").cast("double") / F.col("n").cast("double")
    z = (tmean - gmean) / F.sqrt(gvar / F.col("n").cast("double"))
    scored = j.select(
        "event_type",
        F.col("n").cast("long").alias("n_events"),
        z.alias("z"),
        (2.0 * _phi_tail(F.abs(z))).alias("p"),
    )
    # bounded global window: one row per distinct event_type
    wo = Window.orderBy("p", "event_type")
    mtot = Window.partitionBy()
    ranked = scored.select(
        "event_type",
        "n_events",
        # + 0.0 canonicalizes IEEE -0.0 (a tiny negative z rounds to
        # the signed zero on one engine and not the other)
        (F.round("z", 4) + 0.0).alias("z"),
        F.round("p", 8).alias("p"),
        F.row_number().over(wo).cast("long").alias("rank"),
        F.count(F.lit(1)).over(mtot).alias("m"),
    ).withColumn(
        "bh_cut", F.col("rank") * BH_Q / F.col("m")
    )
    kstar = ranked.filter(F.col("p") <= F.col("bh_cut")).agg(
        F.max("rank").alias("kstar")
    )
    return (
        ranked.crossJoin(F.broadcast(kstar))
        .select(
            "event_type",
            "n_events",
            "z",
            "p",
            "rank",
            F.round("bh_cut", 8).alias("bh_cut"),
            (
                F.col("rank") <= F.coalesce("kstar", F.lit(0))
            ).alias("reject"),
        )
    )


TFIDF_DF_MAX_PCT = 50  # drop tokens in more than half the docs
TFIDF_TOPK = 20


def tfidf_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse TF-IDF cosine similarity — the CLASSIC sparse vector
    join, complementing the set-based (Jaccard/MinHash) and dense
    (embedding) routes: docs as tf·idf vectors over a df-capped
    vocabulary, pairwise dot products via the inverted index (only
    co-occurring tokens ever meet), cosine from `_qsum`-quantized
    dot products and norms so the float sums are order-proof. Output:
    the TFIDF_TOPK most cosine-similar pairs.

    Scale notes (100 TB): the self-join is keyed on the TOKEN, so
    shuffle volume is index-sized and the df cap bounds each token's
    fan-out (df² pairs) — the same stop-word economics as
    `ext_dedup_jaccard`; the norm pass is one map-side-combined
    rollup. Dot products accumulate as exact longs.
    """
    docs = ensure_min_partitions(
        load_table(spark, sf_dir, "documents")
    ).select(
        "doc_id", F.explode(F.split(F.col("text"), r"\s+")).alias("t")
    )
    tf = docs.groupBy("doc_id", "t").agg(F.count(F.lit(1)).alias("tf"))
    nn = docs.agg(F.countDistinct("doc_id").alias("nd"))
    df = tf.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    vocab = df.crossJoin(F.broadcast(nn)).filter(
        F.col("df") * 100 <= F.col("nd") * TFIDF_DF_MAX_PCT
    )
    w = (
        tf.join(vocab, "t")
        .select(
            "doc_id",
            "t",
            (
                F.col("tf")
                * F.log(F.col("nd").cast("double") / F.col("df"))
            ).alias("w"),
        )
    )
    norms = w.groupBy("doc_id").agg(
        _qsum(F.col("w") * F.col("w")).alias("nq")
    )
    a, b = w.alias("a"), w.alias("b")
    dots = (
        a.join(b, F.col("a.t") == F.col("b.t"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(
            _qsum(F.col("a.w") * F.col("b.w")).alias("dq"),
            F.count(F.lit(1)).alias("n_shared"),
        )
    )
    na = norms.select(
        F.col("doc_id").alias("doc_a"), F.col("nq").alias("qa")
    )
    nb = norms.select(
        F.col("doc_id").alias("doc_b"), F.col("nq").alias("qb")
    )
    cos = (F.col("dq") / _NANO) / (
        F.sqrt(F.col("qa") / _NANO) * F.sqrt(F.col("qb") / _NANO)
    )
    return (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a", "doc_b", "n_shared", F.round(cos, 6).alias("cosine")
        )
        .orderBy(F.col("cosine").desc(), "doc_a", "doc_b")
        .limit(TFIDF_TOPK)
    )


BM25_QUERY = ("hash", "join", "window")  # fixed keyword query
BM25_K1, BM25_B = 1.2, 0.75
BM25_TOPK = 20


def _bm25_per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One codegen pass over documents: (doc_id, dl, tf_i per query
    term) — tf by `size(filter(toks))`, dl by `size(toks)`; identical
    integers to the explode+count formulation, with no explode and no
    shuffle."""
    toks = F.split(F.col("text"), r"\s+")

    def _tf(term: str) -> F.Column:
        # NB: the filter lambda must be UNARY — a second parameter
        # (even a default-arg capture) selects PySpark's binary
        # (element, index) form and binds it to the index Column
        # (same trap as minhash_signature, functions/hashing.py)
        return F.size(F.filter(toks, lambda x: x == F.lit(term)))

    return ensure_min_partitions(
        load_table(spark, sf_dir, "documents")
    ).select(
        "doc_id",
        F.size(toks).cast("long").alias("dl"),
        *[
            _tf(term).cast("long").alias(f"tf_{i}")
            for i, term in enumerate(BM25_QUERY)
        ],
    )


def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval for a fixed keyword query — the IR
    scoring the reference-class engines bolt on as FTS extensions,
    expressed relationally: score(d) = Σ_q idf(q) · tf·(k1+1) /
    (tf + k1·(1−b+b·dl/avgdl)) with the Robertson idf
    ln(1 + (N−df+0.5)/(df+0.5)). Per-doc score sums run through the
    qsum fixed-point reduction (≤|query| terms, but order-proof on
    principle). Output: top BM25_TOPK docs, tie-broken by doc_id.

    Scale notes (100 TB): ONE pass over the corpus computes per doc
    its length (`size(split)`) and one counter per query term
    (`size(filter(toks))`) — all inside whole-stage codegen, no
    explode, no corpus-wide shuffle (the former explode+groupBy doc
    length table shuffled every token; round-10). The per-term doc
    frequencies and corpus stats reduce to ONE broadcast row; scoring
    then touches only docs with a hit. At scale the tf pass is the
    scan itself; an inverted index/bucketing on token turns it into a
    pruned probe — the relational shape is unchanged either way.
    """
    per_doc = _bm25_per_doc(spark, sf_dir)
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("nd"),
        F.sum("dl").alias("total_len"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(BM25_QUERY))
        ],
    )
    postings = (
        per_doc.filter(
            sum(
                (F.col(f"tf_{i}") > 0).cast("int")
                for i in range(len(BM25_QUERY))
            )
            > 0
        )
        .select(
            "doc_id",
            "dl",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("ti"),
                            F.col(f"tf_{i}").alias("tf"),
                        )
                        for i in range(len(BM25_QUERY))
                    ]
                )
            ).alias("p"),
        )
        .select("doc_id", "dl", "p.ti", "p.tf")
        .filter(F.col("tf") > 0)
    )
    df_col = F.when(F.col("ti") == 0, F.col("df_0"))
    for i in range(1, len(BM25_QUERY)):
        df_col = df_col.when(F.col("ti") == i, F.col(f"df_{i}"))
    scored = (
        postings.crossJoin(F.broadcast(stats))
        .withColumn("df", df_col)
        .select(
            "doc_id",
            (
                F.log(
                    1.0
                    + (F.col("nd") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                )
                * (F.col("tf") * (BM25_K1 + 1.0))
                / (
                    F.col("tf")
                    + BM25_K1
                    * (
                        1.0
                        - BM25_B
                        + BM25_B
                        * F.col("dl")
                        / (
                            F.col("total_len").cast("double")
                            / F.col("nd")
                        )
                    )
                )
            ).alias("term_score"),
            F.lit(1).cast("long").alias("hit"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            _qsum(F.col("term_score")).alias("sq"),
            F.sum("hit").alias("n_terms_hit"),
        )
        .select(
            "doc_id",
            "n_terms_hit",
            F.round(F.col("sq") / _NANO, 6).alias("bm25"),
        )
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(BM25_TOPK)
    )


RRF_K = 60  # the standard reciprocal-rank-fusion damping constant
RRF_TOPK = 10


def rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid-retrieval fusion: combine the BM25 keyword ranking with
    a tf-based lexical-overlap ranking for the same query via
    Reciprocal Rank Fusion — score(d) = Σ_lists 1/(K + rank_d) — the
    standard trick for merging incomparable score scales (BM25 floats
    vs cosine vs anything) using only RANKS. Docs missing from a list
    simply contribute nothing (full-outer join). Output: the fused
    top-RRF_TOPK with both source ranks.

    Scale notes (100 TB): both input rankings are top-K TakeOrdered
    results — K-row tables; fusion is a K-row full-outer join. The
    expensive parts are the underlying retrievals, already bounded.
    """
    from pyspark.sql import Window

    bm = bm25_search(spark, sf_dir).select(
        "doc_id",
        F.row_number()
        # bounded global window: post-limit top-K rows, never the corpus
        .over(Window.orderBy(F.col("bm25").desc(), "doc_id"))
        .cast("long")
        .alias("r_bm25"),
    )
    # second list: rank by raw query-term hit COUNT (coverage-first
    # lexical overlap — deliberately a different scale/shape); same
    # no-explode single-pass counters as bm25_search (round-10)
    per_doc = _bm25_per_doc(spark, sf_dir)
    n_terms = len(BM25_QUERY)
    cov = (
        per_doc.select(
            "doc_id",
            sum(F.col(f"tf_{i}") for i in range(n_terms)).alias("hits"),
            sum(
                (F.col(f"tf_{i}") > 0).cast("long") for i in range(n_terms)
            ).alias("terms"),
        )
        .filter(F.col("hits") > 0)
        .orderBy(
            F.col("terms").desc(), F.col("hits").desc(), "doc_id"
        )
        .limit(BM25_TOPK)
    )
    cv = cov.select(
        "doc_id",
        F.row_number()
        .over(
            # bounded global window: post-limit top-K rows, never the corpus
            Window.orderBy(
                F.col("terms").desc(), F.col("hits").desc(), "doc_id"
            )
        )
        .cast("long")
        .alias("r_cov"),
    )
    fused = bm.join(cv, "doc_id", "full_outer").select(
        "doc_id",
        "r_bm25",
        "r_cov",
        (
            F.coalesce(1.0 / (RRF_K + F.col("r_bm25")), F.lit(0.0))
            + F.coalesce(1.0 / (RRF_K + F.col("r_cov")), F.lit(0.0))
        ).alias("rrf"),
    )
    return (
        fused.orderBy(F.col("rrf").desc(), "doc_id")
        .limit(RRF_TOPK)
        .select(
            "doc_id", "r_bm25", "r_cov", F.round("rrf", 6).alias("rrf")
        )
    )


HR_K = 5  # diversified picks from the fused list
HR_Q = 10_000  # quantization steps (rank rel and cosine share scale)


def _mmr_greedy_kernel(pool_pdf, sims_pdf):
    """Greedy λ-MMR selection over the BOUNDED candidate pool (≤
    RRF_TOPK rows) and its pairwise quantized-cosine table (≤ TOPK²
    rows) — integer arithmetic only, replicating the join/window
    formulation pick-for-pick: step 1 maximizes (rel_q, -doc_id);
    step t maximizes (rel_q·7 − 3·max_{b∈sel} s(a,b), -doc_id) over
    the unselected, mirroring the inner join on the sims table (a
    candidate without a sims row to any selected doc is skipped, as
    the join would drop it)."""
    import pandas as pd

    pool = [
        (int(r.doc_id), int(r.fr), int(r.rel_q))
        for r in pool_pdf.itertuples(index=False)
    ]
    smap = {
        (int(r.a_id), int(r.b_id)): int(r.s)
        for r in sims_pdf.itertuples(index=False)
    }
    rows: list[tuple] = []
    sel_ids: list[int] = []
    if pool:
        did, fr, rel_q = max(pool, key=lambda p: (p[2], -p[0]))
        rows.append((1, did, fr, rel_q, rel_q * 7))
        sel_ids.append(did)
    for t in range(2, HR_K + 1):
        scored = [
            (p[2] * 7 - 3 * max(sims), p)
            for p in pool
            if p[0] not in sel_ids
            and (
                sims := [
                    smap[(p[0], b)] for b in sel_ids if (p[0], b) in smap
                ]
            )
        ]
        if not scored:
            break
        score, (did, fr, rel_q) = max(scored, key=lambda c: (c[0], -c[1][0]))
        rows.append((t, did, fr, rel_q, score))
        sel_ids.append(did)
    return pd.DataFrame(
        rows, columns=["step", "doc_id", "fr", "rel_q", "score"]
    )


def hybrid_retrieval_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end hybrid retrieval in ONE Catalyst plan: BM25 keyword
    ranking + coverage ranking → reciprocal-rank fusion (top
    RRF_TOPK) → embedding join → greedy MMR-style diversification of
    the final slate — the full modern retrieval stack (lexical recall,
    rank fusion, semantic de-redundancy) composed from this engine's
    own operators, the way a production RAG pipeline actually chains
    them. Relevance enters the greedy stage as the fused RANK mapped
    to the cosine quantization scale ((TOPK+1−rank)·Q/TOPK — exact
    integers), so the λ=0.7 trade-off runs in one integer unit system;
    ties break on doc_id. Docs without an embedding row drop at the
    join (consistently in both engines).

    Scale notes (100 TB): the three retrieval stages are each bounded
    (postings probe, K-row fusion); the diversification works on ≤
    RRF_TOPK candidates — constant, like ext_mmr_rerank's precision
    stage. The whole pipeline shuffles nothing wider than the
    inverted-index probe. The greedy selection itself is ONE Arrow
    cogroup kernel over the (pool, pairwise-sims) tables — both
    bounded at ≤ TOPK / TOPK² rows BY CONSTRUCTION — because greedy
    MMR is inherently sequential in the picks: the former HR_K-step
    driver loop of joins+windows rebuilt and ran a multi-stage plan
    per pick (~2.5 s of fixed cost at any data scale for 10 rows).
    The pairwise dots stay JVM-side (quantized to exact integers
    BEFORE the kernel), so Python arithmetic is integer-only and the
    oracle equivalence is bit-exact.
    """
    from pyspark.sql import Window

    from mini_sql_engine_spark.functions import vector

    def q4(c):
        return F.floor(F.round(c, 4) * HR_Q + 0.5).cast("long")

    fused = rrf_fusion(spark, sf_dir)
    ranked = fused.select(
        "doc_id",
        F.row_number()
        # bounded global window: post-limit top-K rows, never the corpus
        .over(Window.orderBy(F.col("rrf").desc(), "doc_id"))
        .cast("long")
        .alias("fr"),
    )
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    cand = (
        ranked.join(emb, "doc_id")
        .select(
            "doc_id",
            "fr",
            (
                (RRF_TOPK + 1 - F.col("fr")) * (HR_Q // RRF_TOPK)
            ).alias("rel_q"),
            "embedding",
        )
        .coalesce(1)
    ).localCheckpoint(eager=False)
    a = cand.select(
        F.col("doc_id").alias("a_id"), F.col("embedding").alias("ae")
    )
    b = cand.select(
        F.col("doc_id").alias("b_id"), F.col("embedding").alias("be")
    )
    sims = a.join(b, F.col("a_id") != F.col("b_id")).select(
        "a_id", "b_id", q4(vector.dot(F.col("ae"), F.col("be"))).alias("s")
    )
    pool = cand.select("doc_id", "fr", "rel_q")
    sel = (
        pool.withColumn("g", F.lit(1))
        .groupBy("g")
        .cogroup(sims.withColumn("g", F.lit(1)).groupBy("g"))
        .applyInPandas(
            _mmr_greedy_kernel,
            "step long, doc_id long, fr long, rel_q long, score long",
        )
    )
    return sel.select(
        "step",
        "doc_id",
        F.col("fr").alias("fused_rank"),
        F.round(F.col("rel_q") / HR_Q, 4).alias("rel"),
        F.round(F.col("score") / (HR_Q * 10.0), 5).alias("mmr"),
    )


SNIP_W = 10  # snippet window length in tokens


def snippet_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-passage (KWIC) snippet extraction: for every document
    matching the keyword query, find the SNIP_W-token window packing
    the most query-term hits and emit it as text. Window scoring is
    scatter-based — each hit position votes for the ≤W window starts
    that would contain it, one groupBy picks the densest start
    (ties → leftmost) — the same scatter-to-windows shape as the
    sliding bitmap, reused on token positions. Output: doc_id, hit
    stats and the reconstructed snippet.

    Scale notes (100 TB): only matching docs' positions explode (×W
    on HIT positions, not all tokens); the per-doc argmax is a keyed
    max_by, no global sort.
    """
    docs = ensure_min_partitions(
        load_table(spark, sf_dir, "documents")
    ).select("doc_id", F.split(F.col("text"), r"\s+").alias("toks"))
    pos = docs.select(
        "doc_id", F.posexplode("toks").alias("p", "t")
    ).filter(F.col("t").isin(*BM25_QUERY))
    votes = pos.select(
        "doc_id",
        F.explode(
            F.sequence(
                F.greatest(F.col("p") - SNIP_W + 1, F.lit(0)), F.col("p")
            )
        ).alias("start"),
    )
    best = (
        votes.groupBy("doc_id", "start")
        .agg(F.count(F.lit(1)).alias("hits"))
        .groupBy("doc_id")
        .agg(
            F.max(
                F.struct(
                    "hits", (-F.col("start")).alias("neg_start")
                )
            ).alias("b")
        )
        .select(
            "doc_id",
            F.col("b.hits").alias("win_hits"),
            (-F.col("b.neg_start")).cast("long").alias("win_start"),
        )
    )
    return (
        best.join(docs, "doc_id")
        .select(
            "doc_id",
            "win_hits",
            "win_start",
            F.array_join(
                F.slice(
                    "toks", F.col("win_start").cast("int") + 1, SNIP_W
                ),
                " ",
            ).alias("snippet"),
        )
    )


def logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank test: do two user cohorts (deterministic hash split)
    convert at the same rate, accounting for censoring? The
    Kaplan–Meier curve (`ext_kaplan_meier`) describes ONE arm; the
    log-rank statistic (Σ(d₁−E₁))²/ΣV with hypergeometric E and V at
    each event day is the hypothesis test between two. Risk sets come
    from dur ≥ t aggregation against the (tiny) event-day list; the
    two float sums run through qsum. Output: one row with per-arm
    sizes, observed vs expected events and the χ²(1) statistic.

    Scale notes (100 TB): same shape as KM — one user-level pass,
    then all machinery on the day-grid × 2 arms. The event-day join
    is broadcast (days are few); nothing data-sized is ever
    crossed.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.to_date("ts").alias("day")
    )
    per_user = (
        ev.groupBy("user_id")
        .agg(
            F.min(
                F.when(F.col("event_type") == "click", F.col("day"))
            ).alias("t0"),
            F.max("day").alias("last_seen"),
        )
        .filter(F.col("t0").isNotNull())
    )
    first_buy = (
        ev.filter(F.col("event_type") == "purchase")
        .join(per_user.select("user_id", "t0"), "user_id")
        .filter(F.col("day") >= F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("day").alias("t_buy"))
    )
    durs = per_user.join(first_buy, "user_id", "left").select(
        (
            md5_long(F.col("user_id").cast("string"), salt="arm") % 2
        ).alias("arm"),
        F.datediff(F.coalesce("t_buy", "last_seen"), F.col("t0"))
        .cast("long")
        .alias("dur"),
        F.col("t_buy").isNotNull().cast("long").alias("d"),
    )
    cells = durs.groupBy("arm", "dur").agg(
        F.count(F.lit(1)).alias("n_at"),
        F.sum("d").alias("d_at"),
    )
    ev_days = (
        cells.filter(F.col("d_at") > 0)
        .select(F.col("dur").alias("t"))
        .distinct()
    )
    at_t = (
        cells.join(F.broadcast(ev_days), F.col("dur") >= F.col("t"))
        .groupBy("t", "arm")
        .agg(
            F.sum("n_at").alias("n_risk"),
            F.sum(
                F.when(F.col("dur") == F.col("t"), F.col("d_at")).otherwise(
                    0
                )
            ).alias("d_t"),
        )
    )
    a1 = at_t.filter(F.col("arm") == 1).select(
        "t", F.col("n_risk").alias("n1"), F.col("d_t").alias("d1")
    )
    a0 = at_t.filter(F.col("arm") == 0).select(
        "t", F.col("n_risk").alias("n0"), F.col("d_t").alias("d0")
    )
    terms = a1.join(a0, "t").select(
        "t",
        "d1",
        (F.col("n1") + F.col("n0")).alias("n"),
        (F.col("d1") + F.col("d0")).alias("d"),
        "n1",
        "n0",
    )
    e1 = F.col("d").cast("double") * F.col("n1") / F.col("n")
    v = (
        F.col("d").cast("double")
        * F.col("n1")
        * F.col("n0")
        * (F.col("n") - F.col("d"))
        / (
            F.col("n").cast("double")
            * F.col("n")
            * (F.col("n") - 1)
        )
    )
    agg = terms.filter(F.col("n") > 1).agg(
        F.sum("d1").alias("o1"),
        _qsum(e1).alias("e1_q"),
        _qsum(v).alias("v_q"),
    )
    sizes = durs.groupBy("arm").agg(F.count(F.lit(1)).alias("nu"))
    n1u = sizes.filter(F.col("arm") == 1).select(
        F.col("nu").alias("n_arm1")
    )
    n0u = sizes.filter(F.col("arm") == 0).select(
        F.col("nu").alias("n_arm0")
    )
    diff = F.col("o1") - F.col("e1_q") / _NANO
    return (
        agg.crossJoin(F.broadcast(n1u))
        .crossJoin(F.broadcast(n0u))
        .select(
            "n_arm1",
            "n_arm0",
            F.col("o1").alias("observed1"),
            F.round(F.col("e1_q") / _NANO, 4).alias("expected1"),
            F.round(
                diff * diff / (F.col("v_q") / _NANO), 4
            ).alias("chi2"),
        )
    )


def sliding_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day EXACT median of daily revenue — the robust
    moving-location smoother (a moving MEAN lets one flash-sale day
    poison a week of the series; the median shrugs). `percentile`
    runs as a WINDOW aggregate over the ROWS frame, interpolation
    semantics matching DuckDB quantile_cont (the parity pinned by
    `ext_percentiles`). Only full 7-day windows emit.

    Scale notes (100 TB): the window runs on the dates-sized rollup —
    order statistics in moving frames are O(W log W) per row on
    thousands of rows, not a fact-table concern. For value-stream
    sliding medians at scale, the scatter-to-windows + per-window
    exact rank trick (`ext_equidepth_histogram`'s machinery) applies.
    """
    from pyspark.sql import Window

    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.date_format("o_orderdate", "yyyy-MM-dd").alias("day"))
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
            ).alias("rev")
        )
    )
    # bounded global window: calendar-days ladder (~thousands of rows)
    wo = Window.orderBy("day").rowsBetween(-6, 0)
    rolled = daily.select(
        "day",
        F.round(F.col("rev") / 100.0, 2).alias("rev_usd"),
        F.round(
            F.expr("percentile(rev, 0.5)").over(wo) / 100.0, 4
        ).alias("med7_usd"),
        F.count(F.lit(1)).over(wo).alias("n7"),
    )
    return rolled.filter(F.col("n7") == 7).drop("n7")


def max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of the cumulative-revenue curve: the largest
    peak-to-trough fall of the running total — the running-extremum
    pattern (cummax of cumsum) every risk report runs, entirely in
    exact integer cents. Output: the CUSUM_TOP deepest drawdown days
    with the peak value and depth in basis points of the peak.

    Scale notes (100 TB): two stacked unbounded-preceding windows on
    the dates-sized series, TakeOrdered for the report — same shape
    as `ext_cusum_changepoint`.
    """
    from pyspark.sql import Window

    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.date_format("o_orderdate", "yyyy-MM-dd").alias("day"))
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
            ).alias("rev")
        )
    )
    # bounded global window: calendar-days ladder
    wo = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    curve = daily.select(
        "day",
        F.sum("rev").over(wo).alias("cum"),
    ).select(
        "day",
        "cum",
        F.max("cum").over(wo).alias("peak"),
    )
    dd = curve.select(
        "day",
        F.round(F.col("cum") / 100.0, 2).alias("cum_usd"),
        F.round(F.col("peak") / 100.0, 2).alias("peak_usd"),
        (F.col("peak") - F.col("cum")).alias("dd_cents"),
        F.floor(
            (F.col("peak") - F.col("cum")).cast("double")
            * 10000
            / F.col("peak")
        )
        .cast("long")
        .alias("dd_bps"),
    )
    return (
        dd.orderBy(F.col("dd_cents").desc(), "day")
        .limit(CUSUM_TOP)
        .drop("dd_cents")
    )


def ratio_metric_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-method z-test on a RATIO metric — revenue-per-click
    between two hash-split arms. Ratio metrics (the majority of real
    experiment metrics) violate the i.i.d. assumption a plain t-test
    needs, because numerator and denominator share the user; the
    delta method var(R) ≈ (σx² + R²σy² − 2Rσxy)/(n·μy²) from
    USER-level moments is the standard correction. All moments are
    exact DECIMAL sums of integer cents/counts; the z is one
    mirrored expression tree.

    Scale notes (100 TB): one conditional-aggregate pass to user
    rows, one 6-moment rollup per arm, row-local closed form —
    moments-not-rows, like OLS/CUPED.
    """
    per_user = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "purchase"))
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.floor(F.col("value") * 100 + 0.5).cast("long"),
                ).otherwise(0)
            )
            .cast("decimal(19,0)")
            .alias("x"),
            F.sum(
                F.when(F.col("event_type") == "click", 1).otherwise(0)
            )
            .cast("decimal(19,0)")
            .alias("y"),
        )
        .select(
            (
                md5_long(F.col("user_id").cast("string"), salt="arm") % 2
            ).alias("arm"),
            "x",
            "y",
        )
    )
    m = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).cast("decimal(19,0)").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    r = F.col("sx").cast("double") / F.col("sy").cast("double")
    nd = F.col("n").cast("double")
    varx = (
        (F.col("n") * F.col("sxx")).cast("double")
        - (F.col("sx") * F.col("sx")).cast("double")
    ) / (F.col("n") * (F.col("n") - 1)).cast("double")
    vary = (
        (F.col("n") * F.col("syy")).cast("double")
        - (F.col("sy") * F.col("sy")).cast("double")
    ) / (F.col("n") * (F.col("n") - 1)).cast("double")
    covxy = (
        (F.col("n") * F.col("sxy")).cast("double")
        - (F.col("sx") * F.col("sy")).cast("double")
    ) / (F.col("n") * (F.col("n") - 1)).cast("double")
    muy = F.col("sy").cast("double") / nd
    var_r = (varx + r * r * vary - 2.0 * r * covxy) / (
        nd * muy * muy
    )
    arms = m.select(
        "arm",
        F.col("n").cast("long").alias("n_users"),
        r.alias("r"),
        var_r.alias("vr"),
    )
    a1 = arms.filter(F.col("arm") == 1).select(
        F.col("n_users").alias("n1"),
        F.col("r").alias("r1"),
        F.col("vr").alias("v1"),
    )
    a0 = arms.filter(F.col("arm") == 0).select(
        F.col("n_users").alias("n0"),
        F.col("r").alias("r0"),
        F.col("vr").alias("v0"),
    )
    return a1.crossJoin(F.broadcast(a0)).select(
        "n1",
        "n0",
        F.round(F.col("r1") / 100.0, 6).alias("rpc1_usd"),
        F.round(F.col("r0") / 100.0, 6).alias("rpc0_usd"),
        F.round(
            (F.col("r1") - F.col("r0"))
            / F.sqrt(F.col("v1") + F.col("v0")),
            4,
        ).alias("z"),
    )


def ltv_triangle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV triangle: users grouped by first-seen week, each
    cohort's CUMULATIVE purchase revenue per user tracked by age
    week — the money companion to `ext_cohort_retention`'s count
    matrix, and the table LTV forecasting reads its diagonals from.
    Exact cents all the way; the per-user division happens once at
    the end.

    Scale notes (100 TB): first-seen per user is one
    map-side-combined pass; the triangle itself is
    (cohorts × ages)-sized, cumulated with a per-cohort window.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.to_date("ts").alias("day"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
    )
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("day")).cast("date").alias("cohort")
    )
    sizes = first_seen.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    rev = (
        ev.filter(F.col("event_type") == "purchase")
        .join(first_seen, "user_id")
        .groupBy(
            "cohort",
            F.floor(
                F.datediff(F.col("day"), F.col("cohort")) / 7
            )
            .cast("long")
            .alias("age_week"),
        )
        .agg(F.sum("cents").alias("rev"))
    )
    wo = Window.partitionBy("cohort").orderBy("age_week").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        rev.withColumn("cum", F.sum("rev").over(wo))
        .join(F.broadcast(sizes), "cohort")
        .select(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort"),
            "age_week",
            "n_users",
            F.round(
                F.col("cum").cast("double") / 100.0 / F.col("n_users"),
                4,
            ).alias("cum_ltv_usd"),
        )
    )


TS_MAX_OFFSET = 60  # banded Theil-Sen: pair days at most this far apart


def mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Kendall monotonic-trend test on daily revenue — the
    distribution-free significance companion to the trend ESTIMATORS
    (`ext_ols_trend` fits a line, `ext_theil_sen_slope` fits it
    robustly; this answers "is there a trend AT ALL" without assuming
    linearity or normality). S = Σ_{i<j} sign(rev_j − rev_i) over day
    pairs, tie-corrected variance Var = [n(n−1)(2n+5) −
    Σ_g t_g(t_g−1)(2t_g+5)]/18, continuity-corrected z.

    Exactness: S and the ×18 variance numerator are pure BIGINT
    arithmetic; z is the identical three-op IEEE sequence
    (divide-by-18, sqrt, divide) in both engines.

    Scale notes (100 TB): the pair set is quadratic ON THE DATE
    LADDER — bounded by the calendar (years of days), never by data
    volume; the corpus pays exactly one map-side-combinable daily
    rollup, checkpointed once for its three scalar consumers. For
    ladders beyond ~10^4 points, swap the pair sum for the
    O(n log n) inversion-count form.
    """
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.datediff(
                F.to_date("o_orderdate"), F.lit("1970-01-01")
            ).alias("xd")
        )
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
            ).alias("rev")
        )
        .localCheckpoint()  # three scalar consumers, one orders pass
    )
    a, b = daily.alias("a"), daily.alias("b")
    s_stat = a.join(b, F.col("a.xd") < F.col("b.xd")).agg(
        F.sum(
            F.when(F.col("b.rev") > F.col("a.rev"), 1)
            .when(F.col("b.rev") < F.col("a.rev"), -1)
            .otherwise(0)
        ).alias("s_stat")
    )
    ties = (
        daily.groupBy("rev")
        .agg(F.count(F.lit(1)).alias("t"))
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            ).alias("tie_term")
        )
    )
    nn = daily.agg(F.count(F.lit(1)).alias("n_days"))
    var18 = (
        F.col("n_days") * (F.col("n_days") - 1) * (2 * F.col("n_days") + 5)
        - F.col("tie_term")
    )
    z = F.when(
        F.col("s_stat") > 0,
        (F.col("s_stat") - 1).cast("double")
        / F.sqrt(F.col("var18").cast("double") / 18.0),
    ).when(
        F.col("s_stat") < 0,
        (F.col("s_stat") + 1).cast("double")
        / F.sqrt(F.col("var18").cast("double") / 18.0),
    ).otherwise(F.lit(0.0))
    return (
        s_stat.crossJoin(F.broadcast(ties))
        .crossJoin(F.broadcast(nn))
        .withColumn("var18", var18)
        .select(
            "n_days",
            "s_stat",
            "var18",
            z.alias("z_score"),
            F.when(z > 1.96, "increasing")
            .when(z < -1.96, "decreasing")
            .otherwise("none")
            .alias("trend"),
        )
    )


def theil_sen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded Theil–Sen robust trend: the MEDIAN of pairwise revenue
    slopes across day pairs at most TS_MAX_OFFSET apart — the
    windowed variant of the 29.3%-breakdown estimator that shrugs
    off the outlier days dragging `ext_ols_trend`'s least-squares
    line (the OLS slope rides along for contrast). Banding is not
    just an optimization: short-offset slopes weight local trend
    over level shifts, and it turns the O(days²) pair set into
    O(days·W) — this IS the estimator long series run. Slopes are
    exact-integer ratios evaluated once into doubles; the median is
    the exact interpolated percentile (≡ quantile_cont, parity
    pinned by ext_percentiles).

    Scale notes (100 TB): days·W thin pairs from a dates-sized
    self-join; the percentile buffers only the banded pair set.
    """
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.datediff(
                F.to_date("o_orderdate"), F.lit("1970-01-01")
            ).alias("xd")
        )
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
            ).alias("rev")
        )
        .localCheckpoint()  # consumed by pairs AND the OLS moments
    )
    a, b = daily.alias("a"), daily.alias("b")
    slopes = a.join(
        b,
        (F.col("a.xd") < F.col("b.xd"))
        & (F.col("b.xd") - F.col("a.xd") <= TS_MAX_OFFSET),
    ).select(
        (
            (F.col("b.rev") - F.col("a.rev")).cast("double")
            / (F.col("b.xd") - F.col("a.xd"))
        ).alias("slope")
    )
    ts = slopes.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.expr("percentile(slope, 0.5)").alias("ts_slope"),
    )
    dec = "decimal(19,0)"
    m = daily.select(
        F.col("xd").cast(dec).alias("x"), F.col("rev").cast(dec).alias("y")
    ).agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    ols = m.select(
        F.col("n").cast("long").alias("n_days"),
        (
            (
                (F.col("n") * F.col("sxy")).cast("double")
                - (F.col("sx") * F.col("sy")).cast("double")
            )
            / (
                (F.col("n") * F.col("sxx")).cast("double")
                - (F.col("sx") * F.col("sx")).cast("double")
            )
        ).alias("ols_slope"),
    )
    return ols.crossJoin(F.broadcast(ts)).select(
        "n_days",
        "n_pairs",
        F.round(F.col("ts_slope") / 100.0, 6).alias(
            "theil_sen_usd_per_day"
        ),
        F.round(F.col("ols_slope") / 100.0, 6).alias("ols_usd_per_day"),
    )


_SHAP_CHANNELS = ("click", "view", "signup")


def shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Shapley-value conversion attribution over the three
    marketing channels — the coalition-game answer to "which channel
    deserves the conversion" that last-touch (`ext_attribution_
    last_touch`) answers by fiat. Coalition value v(S) = conversions
    from users whose pre-purchase touched-channel set ⊆ S; with 3
    channels the Shapley sum has closed weights (2,1,1,2)/6, so the
    whole computation runs ×6 in EXACT INTEGERS from the 7
    touched-set counts and divides once at the end. The channel
    values sum to total attributed conversions — the additivity
    axiom, visible in the output as a self-check column.

    Scale notes (100 TB): one conditional-aggregate pass to per-user
    touch flags, one 8-cell rollup, then constant combinatorics. The
    n-channel general case is exponential by nature — 3-5 channels
    is exactly where exact Shapley is used in practice.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    first_buy = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t_buy"))
    )
    flags = (
        ev.join(first_buy, "user_id")
        .filter(F.col("ts_us") < F.col("t_buy"))
        .groupBy("user_id")
        .agg(
            *[
                F.max(
                    (F.col("event_type") == ch).cast("long")
                ).alias(f"f_{i}")
                for i, ch in enumerate(_SHAP_CHANNELS)
            ]
        )
        .filter(F.col("f_0") + F.col("f_1") + F.col("f_2") > 0)
    )
    cells = flags.groupBy("f_0", "f_1", "f_2").agg(
        F.count(F.lit(1)).alias("c")
    )

    def cnt(a: int, b: int, c: int):
        return F.sum(
            F.when(
                (F.col("f_0") == a)
                & (F.col("f_1") == b)
                & (F.col("f_2") == c),
                F.col("c"),
            ).otherwise(0)
        )

    one = cells.agg(
        cnt(1, 0, 0).alias("cA"),
        cnt(0, 1, 0).alias("cB"),
        cnt(0, 0, 1).alias("cC"),
        cnt(1, 1, 0).alias("cAB"),
        cnt(1, 0, 1).alias("cAC"),
        cnt(0, 1, 1).alias("cBC"),
        cnt(1, 1, 1).alias("cABC"),
    )
    # v(S) = Σ_{T⊆S} count_T; Shapley_i·6 = 2[v(i)] + 1[v(i∪j)−v(j)]
    # + 1[v(i∪k)−v(k)] + 2[v(ijk)−v(jk)]  (v(∅)=0)
    A, B, C = F.col("cA"), F.col("cB"), F.col("cC")
    AB, AC, BC, ABC = (
        F.col("cAB"),
        F.col("cAC"),
        F.col("cBC"),
        F.col("cABC"),
    )
    vA, vB, vC = A, B, C
    vAB, vAC, vBC = A + B + AB, A + C + AC, B + C + BC
    vABC = A + B + C + AB + AC + BC + ABC
    sh = {
        "click": 2 * vA + (vAB - vB) + (vAC - vC) + 2 * (vABC - vBC),
        "view": 2 * vB + (vAB - vA) + (vBC - vC) + 2 * (vABC - vAC),
        "signup": 2 * vC + (vAC - vA) + (vBC - vB) + 2 * (vABC - vAB),
    }
    total = vABC
    wide = one.select(
        *[v.alias(f"s6_{ch}") for ch, v in sh.items()],
        total.alias("total_conv"),
    )
    stack = ", ".join(f"'{ch}', s6_{ch}" for ch in sh)
    return wide.selectExpr(
        f"stack(3, {stack}) AS (channel, s6)", "total_conv"
    ).select(
        "channel",
        F.round(F.col("s6") / 6.0, 4).alias("shapley_conversions"),
        "total_conv",
    )


def journey_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Journey predictability: the conditional entropy of the NEXT
    event given the current one, per state — the information-theoretic
    summary of `ext_event_transitions`' matrix (H ≈ 0: railroad
    journeys, a next-step cache would hit; H ≈ ln k: anything can
    happen). Per-state H = −Σ_j (c_ij/c_i)·ln(c_ij/c_i) reduces
    through qsum; h_norm divides by ln(branches) into [0,1].

    Scale notes (100 TB): one user-keyed window builds the bigram
    stream; everything after lives on the (states × states) count
    matrix.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("ts_us"), "event_id"
    )
    wo = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    bi = (
        ev.withColumn("nxt", F.lead("event_type", 1).over(wo))
        .filter(F.col("nxt").isNotNull())
        .groupBy(F.col("event_type").alias("cur"), "nxt")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    outc = bi.groupBy("cur").agg(
        F.sum("c").alias("ci"), F.count(F.lit(1)).alias("n_branches")
    )
    term = -(F.col("c") / F.col("ci")) * F.log(
        F.col("c") / F.col("ci")
    )
    h = (
        bi.join(F.broadcast(outc), "cur")
        .groupBy("cur")
        .agg(_qsum(term).alias("hq"))
        .join(F.broadcast(outc), "cur")
    )
    hn = F.col("hq") / _NANO
    return h.select(
        "cur",
        F.col("ci").alias("n_transitions"),
        "n_branches",
        F.round(hn, 6).alias("h_nats"),
        F.round(
            F.when(
                F.col("n_branches") > 1,
                hn / F.log(F.col("n_branches").cast("double")),
            ).otherwise(0.0),
            6,
        ).alias("h_norm"),
    )


PERM_B = 200  # permutation replicates


def permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Permutation test on per-user purchase totals between the two
    hash arms — exact-inference sibling of the z/t machinery: the
    null distribution is built by RELABELING users (hash-derived
    labels per replicate, so deterministic), and the p-value is the
    add-one-smoothed fraction of replicates at least as extreme as
    the observed mean difference. No normality assumption anywhere —
    the test the small-n / skewed-metric case needs.

    Scale notes (100 TB): users × PERM_B thin explode feeding one
    conditional-aggregate pass (map-side combined); every replicate
    statistic is a 4-sum closed form. Same ×B economics as the
    Poisson bootstrap.
    """
    per_user = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.sum(
                F.floor(F.col("value") * 100 + 0.5).cast("long")
            ).alias("x")
        )
    )
    obs = per_user.select(
        (
            md5_long(F.col("user_id").cast("string"), salt="arm") % 2
        ).alias("arm"),
        "x",
    ).agg(
        F.count(F.lit(1)).alias("n_users"),
        (
            F.sum(F.when(F.col("arm") == 1, F.col("x")).otherwise(0))
            / F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
            - F.sum(F.when(F.col("arm") == 0, F.col("x")).otherwise(0))
            / F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        ).alias("obs"),
    )
    reps = per_user.select(
        "user_id",
        "x",
        F.explode(F.sequence(F.lit(1), F.lit(PERM_B))).alias("b"),
    ).select(
        "b",
        "x",
        (
            md5_long(
                F.concat_ws("#", F.col("user_id"), F.col("b")),
                salt="perm",
            )
            % 2
        ).alias("arm"),
    )
    stats = reps.groupBy("b").agg(
        (
            F.sum(F.when(F.col("arm") == 1, F.col("x")).otherwise(0))
            / F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
            - F.sum(F.when(F.col("arm") == 0, F.col("x")).otherwise(0))
            / F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        ).alias("stat")
    )
    extreme = stats.crossJoin(F.broadcast(obs)).agg(
        F.sum(
            (F.abs(F.col("stat")) >= F.abs(F.col("obs")))
            .cast("long")
        ).alias("n_extreme")
    )
    return (
        obs.crossJoin(F.broadcast(extreme))
        .select(
            "n_users",
            F.round(F.col("obs") / 100.0, 4).alias("obs_diff_usd"),
            F.lit(PERM_B).cast("long").alias("n_perms"),
            F.round(
                (F.col("n_extreme") + 1.0) / (PERM_B + 1.0), 4
            ).alias("p_value"),
        )
    )


DECAY_HALF_LIFE_D = 7.0  # engagement half-life in days
DECAY_TOPK = 25


def decayed_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decayed engagement scoring: each event contributes
    2^(−age/half-life) — the recency weighting every recommender /
    churn feature store runs, where a raw count says a user who
    binged last year equals one active yesterday. Decayed event mass
    and decayed purchase revenue accumulate through qsum (exp terms
    are floats; quantized longs make the sums order-proof). Output:
    the DECAY_TOPK most-engaged users, scored as of the corpus' last
    day.

    Scale notes (100 TB): pure projection + one map-side-combined
    user rollup + TakeOrdered; the as-of anchor is a broadcast
    1-row max. Incremental refresh multiplies yesterday's scores by
    the day factor and adds the new day — the same associativity the
    quantization relies on.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.to_date("ts").alias("day"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
    )
    anchor = ev.agg(F.max("day").alias("d0"))
    aged = ev.crossJoin(F.broadcast(anchor)).withColumn(
        "w",
        F.pow(
            F.lit(2.0),
            -F.datediff(F.col("d0"), F.col("day"))
            / F.lit(DECAY_HALF_LIFE_D),
        ),
    )
    scored = aged.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        _qsum(F.col("w")).alias("eng_q"),
        _qsum(
            F.when(
                F.col("event_type") == "purchase",
                F.col("w") * F.col("cents") / 100.0,
            ).otherwise(0.0)
        ).alias("rev_q"),
    )
    return (
        scored.select(
            "user_id",
            "n_events",
            F.round(F.col("eng_q") / _NANO, 4).alias("decayed_events"),
            F.round(F.col("rev_q") / _NANO, 4).alias("decayed_rev_usd"),
        )
        .orderBy(F.col("decayed_events").desc(), "user_id")
        .limit(DECAY_TOPK)
    )


def simpson_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson's-paradox screen: per market segment, compare the two
    hash arms' purchase-conversion rates AND the pooled rates — a
    segment whose effect sign disagrees with the pooled sign is
    flagged, the classic aggregation reversal that makes a pooled-only
    readout lie. All rates are exact integer ratios; the flag is a
    sign comparison of identically-computed doubles.

    Scale notes (100 TB): two conditional-aggregate rollups
    (per-segment and pooled, the latter broadcast back) — one user
    pass feeds both.
    """
    users = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.max(
                (F.col("event_type") == "purchase").cast("long")
            ).alias("converted")
        )
        .select(
            "user_id",
            "converted",
            (
                md5_long(F.col("user_id").cast("string"), salt="arm") % 2
            ).alias("arm"),
        )
    )
    seg = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = users.join(F.broadcast(seg), "user_id")

    def rates(df, keys):
        return df.groupBy(*keys).agg(
            F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n1"),
            F.sum(
                F.when(F.col("arm") == 1, F.col("converted")).otherwise(0)
            ).alias("c1"),
            F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n0"),
            F.sum(
                F.when(F.col("arm") == 0, F.col("converted")).otherwise(0)
            ).alias("c0"),
        )

    per_seg = rates(joined, ["c_mktsegment"]).filter(
        (F.col("n1") > 0) & (F.col("n0") > 0)
    )  # degenerate segments (an empty arm) have no defined diff
    pooled = rates(joined, []).select(
        (
            F.col("c1") / F.col("n1") - F.col("c0") / F.col("n0")
        ).alias("pooled_diff")
    )
    seg_diff = F.col("c1") / F.col("n1") - F.col("c0") / F.col("n0")
    return per_seg.crossJoin(F.broadcast(pooled)).select(
        "c_mktsegment",
        "n1",
        "n0",
        F.round(F.col("c1") / F.col("n1"), 6).alias("rate1"),
        F.round(F.col("c0") / F.col("n0"), 6).alias("rate0"),
        F.round(seg_diff, 6).alias("seg_diff"),
        F.round("pooled_diff", 6).alias("pooled_diff"),
        (
            F.signum(seg_diff) != F.signum(F.col("pooled_diff"))
        ).alias("reversed"),
    )


CHURN_CUT = "2024-01-24"  # feature/label boundary (events span Jan)


def churn_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe churn dataset builder: features computed ONLY
    from events before CHURN_CUT (counts, spend, recency, active
    days), label = "no activity on or after the cut" — the
    point-in-time discipline that keeps target information out of
    the features, which a naive full-range feature join silently
    violates. One conditional-aggregate pass builds both sides;
    anything in the feature columns after the cut would be a bug the
    oracle catches.

    Scale notes (100 TB): single map-side-combined user rollup; the
    cut is a pushdown-friendly literal predicate inside conditional
    aggregates, so no second scan and no join.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
    )
    pre = F.col("day") < CHURN_CUT

    return (
        ev.groupBy("user_id")
        .agg(
            F.sum(pre.cast("long")).alias("n_events_pre"),
            F.sum(
                F.when(
                    pre & (F.col("event_type") == "purchase"),
                    F.col("cents"),
                ).otherwise(0)
            ).alias("spend_pre_cents"),
            F.countDistinct(F.when(pre, F.col("day"))).alias(
                "active_days_pre"
            ),
            F.max(F.when(pre, F.col("day"))).alias("last_seen_pre"),
            F.max((~pre).cast("long")).alias("active_post"),
        )
        .filter(F.col("n_events_pre") > 0)
        .select(
            "user_id",
            "n_events_pre",
            "spend_pre_cents",
            "active_days_pre",
            F.datediff(F.lit(CHURN_CUT), F.col("last_seen_pre"))
            .cast("long")
            .alias("recency_days"),
            (1 - F.col("active_post")).alias("churned"),
        )
    )


TE_SMOOTH_M = 20.0  # m-estimate pseudo-count


def target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed (m-estimate) target encoding of market segment
    against purchase conversion: enc = (S + m·μ)/(n + m) — the
    Bayesian shrinkage that keeps rare categories from memorizing
    their few labels (raw category means are the classic overfit).
    Both the raw and smoothed encodings emit, so the shrinkage is
    visible per category. Exact counts everywhere; two divisions at
    the end.

    Scale notes (100 TB): one user pass, one category rollup, the
    global prior broadcast — the encoding table is |categories| rows
    and broadcasts back onto training joins downstream.
    """
    users = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.max(
                (F.col("event_type") == "purchase").cast("long")
            ).alias("y")
        )
    )
    seg = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = users.join(F.broadcast(seg), "user_id")
    cat = joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("s")
    )
    prior = joined.agg(
        (F.sum("y") / F.count(F.lit(1))).alias("mu")
    )
    return cat.crossJoin(F.broadcast(prior)).select(
        "c_mktsegment",
        "n",
        F.round(F.col("s") / F.col("n"), 6).alias("raw_rate"),
        F.round(
            (F.col("s") + TE_SMOOTH_M * F.col("mu"))
            / (F.col("n") + TE_SMOOTH_M),
            6,
        ).alias("encoded"),
        F.round("mu", 6).alias("prior"),
    )


def stratified_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified (blocked) treatment-effect estimate: the per-market-
    segment arm differences averaged with segment-size weights — the
    adjustment that removes confounding carried by the blocking
    variable, where the pooled difference (`ext_simpson_screen`'s
    flag) can even flip sign. Per-segment means are exact ratios;
    the weighted combine runs through qsum. Output: the stratified
    ATE next to the naive pooled difference.

    Scale notes (100 TB): one user pass, one per-segment rollup,
    |segments| weighted terms — the classic "stratify then average"
    at aggregation cost, no matching pairs materialized.
    """
    users = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.floor(F.col("value") * 100 + 0.5).cast("long"),
                ).otherwise(0)
            ).alias("x")
        )
        .select(
            "user_id",
            "x",
            (
                md5_long(F.col("user_id").cast("string"), salt="arm") % 2
            ).alias("arm"),
        )
    )
    seg = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = users.join(F.broadcast(seg), "user_id")
    per_seg = (
        joined.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_seg"),
            F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n1"),
            F.sum(
                F.when(F.col("arm") == 1, F.col("x")).otherwise(0)
            ).alias("s1"),
            F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n0"),
            F.sum(
                F.when(F.col("arm") == 0, F.col("x")).otherwise(0)
            ).alias("s0"),
        )
        .filter((F.col("n1") > 0) & (F.col("n0") > 0))
    )
    ntot = per_seg.agg(F.sum("n_seg").alias("nt"))
    term = (
        F.col("n_seg")
        / F.col("nt")
        * (
            F.col("s1") / F.col("n1") - F.col("s0") / F.col("n0")
        )
    )
    strat = per_seg.crossJoin(F.broadcast(ntot)).agg(
        _qsum(term).alias("ate_q"),
        F.sum("n_seg").alias("n_used"),
    )
    pooled = joined.agg(
        (
            F.sum(F.when(F.col("arm") == 1, F.col("x")).otherwise(0))
            / F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
            - F.sum(F.when(F.col("arm") == 0, F.col("x")).otherwise(0))
            / F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        ).alias("pooled")
    )
    return strat.crossJoin(F.broadcast(pooled)).select(
        F.col("n_used").alias("n_users"),
        F.round(F.col("ate_q") / _NANO / 100.0, 4).alias(
            "stratified_ate_usd"
        ),
        F.round(F.col("pooled") / 100.0, 4).alias("pooled_diff_usd"),
    )


QTE_PS = (0.25, 0.5, 0.75)


def quantile_treatment_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile treatment effects: the arm difference at the 25th,
    50th and 75th percentiles of purchase value — the distributional
    readout a mean-only test hides (an effect that lifts the tail
    but not the median is invisible to `ext_ab_test_zscore`). Exact
    interpolated percentiles per arm on integer cents, one row per
    quantile.

    Scale notes (100 TB): grouped exact percentiles — swap in the
    mergeable t-digest at real scale, as ext_percentiles documents;
    the QTE arithmetic is per-row on 3×2 numbers.
    """
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            (
                md5_long(F.col("user_id").cast("string"), salt="arm") % 2
            ).alias("arm"),
            F.floor(F.col("value") * 100 + 0.5).cast("long").alias("c"),
        )
    )
    m = ev.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.round(F.expr(f"percentile(c, {p!r})"), 6).alias(
                f"q_{int(p * 100)}"
            )
            for p in QTE_PS
        ],
    )
    a1 = m.filter(F.col("arm") == 1).select(
        F.col("n").alias("n1"),
        *[
            F.col(f"q_{int(p * 100)}").alias(f"t_{int(p * 100)}")
            for p in QTE_PS
        ],
    )
    a0 = m.filter(F.col("arm") == 0).select(
        F.col("n").alias("n0"),
        *[
            F.col(f"q_{int(p * 100)}").alias(f"c_{int(p * 100)}")
            for p in QTE_PS
        ],
    )
    wide = a1.crossJoin(F.broadcast(a0))
    rows = []
    for p in QTE_PS:
        k = int(p * 100)
        rows.append(
            wide.select(
                F.lit(k).cast("long").alias("pct"),
                "n1",
                "n0",
                F.round(F.col(f"t_{k}") / 100.0, 4).alias("treat_usd"),
                F.round(F.col(f"c_{k}") / 100.0, 4).alias("ctrl_usd"),
                F.round(
                    (F.col(f"t_{k}") - F.col(f"c_{k}")) / 100.0, 4
                ).alias("qte_usd"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


HILL_K = 50  # tail order statistics used by the Hill estimator


def hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator of the revenue distribution's power-law tail
    index: α̂ = k / Σ_{i≤k} ln(x_(i)/x_(k+1)) over the top-k customer
    revenue totals — the rigorous tail statistic next to
    `ext_zipf_fit`'s rank-slope regression (α ≤ 2 means infinite
    variance: means and stddevs of revenue stop being meaningful,
    which changes which statistics you are allowed to report). Top
    k+1 selection is TakeOrdered; the log-ratio sum reduces through
    qsum.

    Scale notes (100 TB): one customer rollup, a k+1-row TakeOrdered,
    k-row arithmetic — the estimator only ever looks at the tail it
    measures.
    """
    rev = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
            ).alias("cents")
        )
        .filter(F.col("cents") > 0)
    )
    top = rev.orderBy(F.col("cents").desc(), "o_custkey").limit(
        HILL_K + 1
    )
    ref = top.agg(F.min("cents").alias("x_ref"))
    tail = top.crossJoin(F.broadcast(ref)).filter(
        F.col("cents") > F.col("x_ref")
    )
    agg = tail.agg(
        F.count(F.lit(1)).alias("k_used"),
        _qsum(
            F.log(
                F.col("cents").cast("double") / F.col("x_ref")
            )
        ).alias("lq"),
    )
    return agg.crossJoin(F.broadcast(ref)).select(
        "k_used",
        F.round(F.col("x_ref") / 100.0, 2).alias("x_ref_usd"),
        F.round(
            F.col("k_used") / (F.col("lq") / _NANO), 4
        ).alias("hill_alpha"),
    )


def price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-log price elasticity of demand per brand: the OLS slope of
    ln(quantity) on ln(unit price) over that brand's line items —
    the econometric constant-elasticity model, fit from MOMENTS like
    `ext_ols_trend`, except the moments themselves are float
    (logs), so each of the five sums reduces through qsum before the
    closed form. Elasticity < −1 means demand is elastic: a price
    cut grows revenue.

    Scale notes (100 TB): part dimension broadcasts onto the fact
    scan, one brand rollup of five quantized sums, row-local closed
    form.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.col("l_quantity").cast("double").alias("q"),
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("p"),
    )
    parts = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    lx = li.join(F.broadcast(parts), "l_partkey").select(
        "p_brand",
        F.log("p").alias("x"),
        F.log("q").alias("y"),
    )
    m = lx.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        _qsum(F.col("x")).alias("sx"),
        _qsum(F.col("y")).alias("sy"),
        _qsum(F.col("x") * F.col("y")).alias("sxy"),
        _qsum(F.col("x") * F.col("x")).alias("sxx"),
    )
    nd = F.col("n").cast("double")
    sx = F.col("sx") / _NANO
    sy = F.col("sy") / _NANO
    sxy = F.col("sxy") / _NANO
    sxx = F.col("sxx") / _NANO
    slope = (nd * sxy - sx * sy) / (nd * sxx - sx * sx)
    return m.select(
        "p_brand",
        F.col("n").alias("n_lines"),
        F.round(slope, 4).alias("elasticity"),
        (F.round(slope, 4) < -1.0).alias("elastic"),
    )


def experiment_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-readout experiment health report: sample-ratio-mismatch
    chi² ((n₁−n₀)²/n against the 50/50 design — the single most
    common way experiments silently rot), plus daily assignment
    imbalance (worst |share₁ − ½| day) — trend-shaped SRM that a
    single end-of-test total hides. A failed SRM check invalidates
    every downstream readout in this pack, which is why the platform
    runs THIS query first. All integer counts; two divisions.

    Scale notes (100 TB): one user-day rollup (map-side combined),
    one dates-sized max — health checks must stay cheap enough to
    run on every sync.
    """
    ud = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id", F.date_format("ts", "yyyy-MM-dd").alias("day")
        )
        .distinct()
        .select(
            "day",
            (
                md5_long(F.col("user_id").cast("string"), salt="arm") % 2
            ).alias("arm"),
        )
    )
    users = ud.select("arm").groupBy("arm").count()
    n1 = F.max(F.when(F.col("arm") == 1, F.col("count")))
    n0 = F.max(F.when(F.col("arm") == 0, F.col("count")))
    tot = users.agg(n1.alias("n1"), n0.alias("n0"))
    daily = ud.groupBy("day").agg(
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("d1"),
        F.count(F.lit(1)).alias("dn"),
    )
    worst = daily.agg(
        F.max(
            F.abs(F.col("d1") / F.col("dn") - 0.5)
        ).alias("worst_daily_imbalance")
    )
    chi2 = (
        (F.col("n1") - F.col("n0"))
        * (F.col("n1") - F.col("n0"))
    ).cast("double") / (F.col("n1") + F.col("n0"))
    return tot.crossJoin(F.broadcast(worst)).select(
        F.col("n1").alias("n_arm1_user_days"),
        F.col("n0").alias("n_arm0_user_days"),
        F.round(chi2, 4).alias("srm_chi2"),
        (chi2 > 3.841).alias("srm_fail"),
        F.round("worst_daily_imbalance", 4).alias(
            "worst_daily_imbalance"
        ),
    )


CONF_ALPHA = 0.1  # target 90% coverage


def conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction interval for purchase value — the
    distribution-free uncertainty wrapper: fit the (trivial) mean
    predictor on the calibration half (hash split), take the
    ⌈(n+1)(1−α)⌉-th smallest absolute residual as the radius, and
    VERIFY the finite-sample guarantee by measuring coverage on the
    held-out half. The quantile is a discrete order statistic (exact
    rank, no interpolation — the conformal definition), selected via
    the same rank-lookup machinery as the equi-depth histogram.
    Output: one row with the interval and both halves' realized
    coverage.

    Scale notes (100 TB): two conditional aggregates and one ranked
    selection on the calibration residual ladder — conformal's
    selling point is exactly that it adds only order statistics on
    top of any predictor.
    """
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            F.floor(F.col("value") * 100 + 0.5).cast("long").alias("c"),
            (
                md5_long(F.col("event_id").cast("string"), salt="conf")
                % 2
                == 0
            ).alias("cal"),
        )
    )
    mu = ev.filter("cal").agg(
        F.floor(F.sum("c") / F.count(F.lit(1)) + 0.5)
        .cast("long")
        .alias("mu"),
        F.count(F.lit(1)).alias("n_cal"),
    )
    resid = (
        ev.filter("cal")
        .crossJoin(F.broadcast(mu))
        .select(F.abs(F.col("c") - F.col("mu")).alias("r"))
    )
    # radius = the ceil((n+1)(1-alpha))-th smallest residual (exact
    # conformal rank); computed from range-partitioned prefix counts
    # over the residual value ladder
    cells = resid.groupBy("r").agg(F.count(F.lit(1)).alias("k"))
    # residuals of a continuous value have a ~rows-sized distinct
    # ladder — range-partitioned prefix sums, never one task
    ladder = range_prefix(cells, ["r"], sum_cols=("k",)).select(
        "r",
        (F.col("cum_k") - F.col("k")).alias("cum_prev"),
        F.col("cum_k").alias("cum"),
    )
    rank = F.ceil(
        (F.col("n_cal") + 1) * F.lit(1.0 - CONF_ALPHA)
    ).cast("long")
    radius = (
        ladder.crossJoin(F.broadcast(mu))
        .filter(
            (F.col("cum_prev") < rank) & (rank <= F.col("cum"))
        )
        .select(F.col("r").alias("radius"))
    )
    cov = (
        ev.crossJoin(F.broadcast(mu))
        .crossJoin(F.broadcast(radius))
        .groupBy("cal")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                (
                    F.abs(F.col("c") - F.col("mu")) <= F.col("radius")
                ).cast("long")
            ).alias("n_in"),
        )
    )
    c1 = cov.filter("cal").select(
        F.col("n").alias("n_cal"), F.col("n_in").alias("in_cal")
    )
    c0 = cov.filter(~F.col("cal")).select(
        F.col("n").alias("n_test"), F.col("n_in").alias("in_test")
    )
    return (
        mu.crossJoin(F.broadcast(radius))
        .crossJoin(F.broadcast(c1.drop("n_cal")))
        .crossJoin(F.broadcast(c0))
        .select(
            "n_cal",
            "n_test",
            F.round(F.col("mu") / 100.0, 2).alias("pred_usd"),
            F.round(F.col("radius") / 100.0, 2).alias("radius_usd"),
            F.round(F.col("in_cal") / F.col("n_cal"), 4).alias(
                "coverage_cal"
            ),
            F.round(F.col("in_test") / F.col("n_test"), 4).alias(
                "coverage_test"
            ),
        )
    )


ECE_BINS = 10
ECE_SMOOTH = 2  # p̂ = clicks / (clicks + ECE_SMOOTH): a monotone
# activity-based conversion score — exact small-integer ratio, so both
# engines compute bit-identical doubles


def calibration_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram + expected calibration error (ECE) for a
    deterministic conversion predictor: per user-day, score
    p̂ = clicks/(clicks+2) against the did-purchase label, bin p̂ into
    ECE_BINS equal-width bins, and report per-bin confidence (mean p̂)
    vs accuracy (positive rate) plus the n-weighted |acc − conf| sum —
    the standard post-hoc calibration audit every model-driven
    curation gate needs before its scores can be thresholded.

    Numeric discipline: p̂ is an exact ratio of small ints; per-bin
    mean p̂ accumulates through qsum (order-proof integer sum); ECE's
    weighted combine is a second qsum over the ECE_BINS bin rows.

    Scale notes (100 TB): one user-day rollup (map-side partial agg),
    one ECE_BINS-row regroup — aggregation-only, no joins wider than
    the final bins×1 cross of two broadcast scalars.
    """
    ev = load_table(spark, sf_dir, "events")
    ud = (
        ev.groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias(
                "clicks"
            ),
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("y"),
        )
        .select(
            (F.col("clicks") / (F.col("clicks") + F.lit(float(ECE_SMOOTH)))).alias(
                "p"
            ),
            "y",
        )
    )
    binned = ud.select(
        F.least(F.floor(F.col("p") * ECE_BINS), F.lit(ECE_BINS - 1))
        .cast("long")
        .alias("bin"),
        "p",
        "y",
    )
    # checkpoint the ECE_BINS-row rollup — its four consumers would
    # otherwise each re-run the user-day scan (no common-subplan dedup)
    per_bin = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_days"),
        _qsum(F.col("p")).alias("conf_q"),
        F.sum("y").alias("n_pos"),
    ).localCheckpoint(eager=False)
    tot = per_bin.agg(F.sum("n_days").alias("n_total"))
    rows = per_bin.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n_days",
        (F.col("conf_q") / _NANO / F.col("n_days")).alias("conf"),
        (F.col("n_pos") / F.col("n_days")).alias("acc"),
        "n_total",
    ).localCheckpoint(eager=False)
    ece = rows.agg(
        _qsum(
            F.col("n_days")
            / F.col("n_total")
            * F.abs(F.col("acc") - F.col("conf"))
        ).alias("ece_q")
    )
    return rows.crossJoin(F.broadcast(ece)).select(
        "bin",
        "n_days",
        F.round(F.col("conf"), 6).alias("conf"),
        F.round(F.col("acc"), 6).alias("acc"),
        F.round(F.col("ece_q") / _NANO, 6).alias("ece"),
    )


def isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT isotonic regression (the pool-adjacent-violators fit) of
    the conversion label on the click-count score ladder — the
    calibration FIX that pairs with `ext_calibration_ece`'s audit:
    the fitted values are the unique monotone sequence minimizing
    squared error, i.e. the calibrated probabilities a thresholding
    gate should use instead of the raw scores.

    PAV is usually presented as a sequential merge loop; this uses
    the closed-form minimax identity fit_i = max_{j≤i} min_{k≥i}
    avg(y over ladder[j..k]), which turns the whole fit into joins
    and aggregates over the LADDER (distinct click counts — tens of
    rows), not the corpus. Interval averages are (S_k−S_{j−1}) /
    (N_k−N_{j−1}) on BIGINT prefix sums — one IEEE division each, so
    both engines compare identical doubles and the min/max pick
    identical values.

    Scale notes (100 TB): one user-day rollup (map-side combinable)
    collapses the corpus onto the ladder; the O(L³) minimax triple
    runs on L≈20 ladder rows — constant work regardless of data
    volume. A continuous score would quantize onto a bounded ladder
    first (ext_equidepth_histogram), which is also how production
    isotonic calibrators bin anyway.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    ladder = (
        ev.groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(
            F.sum(
                F.when(F.col("event_type") == "click", 1).otherwise(0)
            ).alias("clicks"),
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("y"),
        )
        .groupBy("clicks")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("y").alias("pos"),
        )
        .localCheckpoint()  # the whole corpus collapses to ~L rows here
    )
    # bounded global window: ~L click-count cells (see checkpoint)
    wc = Window.orderBy("clicks").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    pre = ladder.select(
        "clicks",
        "n",
        "pos",
        F.sum("n").over(wc).alias("cn"),
        F.sum("pos").over(wc).alias("cs"),
    )
    # interval averages avg(j..k) from prefix sums; j,k are ladder
    # clicks values with j <= k
    a, b = pre.alias("a"), pre.alias("b")
    intervals = a.join(
        b, F.col("a.clicks") <= F.col("b.clicks")
    ).select(
        F.col("a.clicks").alias("j"),
        F.col("b.clicks").alias("k"),
        (
            (
                F.col("b.cs") - F.col("a.cs") + F.col("a.pos")
            ).cast("double")
            / (F.col("b.cn") - F.col("a.cn") + F.col("a.n")).cast("double")
        ).alias("avg_jk"),
    )
    pts = pre.select(F.col("clicks").alias("i"))
    inner = (
        intervals.join(
            pts,
            (F.col("j") <= F.col("i")) & (F.col("i") <= F.col("k")),
        )
        .groupBy("i", "j")
        .agg(F.min("avg_jk").alias("m_ij"))
        .groupBy("i")
        .agg(F.max("m_ij").alias("iso_p"))
    )
    return (
        pre.join(inner, pre["clicks"] == inner["i"])
        .select(
            "clicks",
            "n",
            "pos",
            (F.col("pos").cast("double") / F.col("n").cast("double")).alias(
                "raw_rate"
            ),
            "iso_p",
        )
    )


def propensity_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor propensity matching (with replacement) and the
    matched ATT: treated users (hash arm) each match the control
    activity level nearest their own (ties → the lower level), and the
    effect is the mean of (treated outcome − matched control mean) —
    the workhorse observational-causal adjustment when covariates,
    not randomization, drive assignment. The propensity proxy is the
    integer activity count, so matching is exact integer arithmetic.

    Execution: controls collapse to one row per distinct activity
    level (count + outcome sum — matching WITH replacement needs only
    the level means, never the control rows); the nearest level per
    treated user comes from a sorted interleave — union the control
    levels with the treated rows, one pass of last_value-ignore-nulls
    in each direction, pick the closer side. The oracle runs the same
    two windows.

    Scale notes (100 TB): the interleave's two directional passes run
    through range_prefix (range-partitioned prefix max — the
    last-non-null propagation, since control levels ascend with the
    sort key); everything after is per-row arithmetic plus one
    broadcast join back to the collapsed control levels
    (|levels| ≪ |users|).
    """
    from pyspark.sql import Window

    users = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("a"),
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.floor(F.col("value") * 100 + 0.5).cast("long"),
                ).otherwise(0)
            ).alias("x"),
        )
        .select(
            "user_id",
            "a",
            "x",
            (md5_long(F.col("user_id").cast("string"), salt="arm") % 2).alias(
                "arm"
            ),
        )
        # the control and treated branches both consume this rollup —
        # checkpoint so the events scan runs once
        .localCheckpoint(eager=False)
    )
    ctrl = (
        users.filter(F.col("arm") == 0)
        .groupBy("a")
        .agg(F.count(F.lit(1)).alias("n_c"), F.sum("x").alias("sx"))
    )
    treated = users.filter(F.col("arm") == 1)
    stream = ctrl.select(
        F.col("a"),
        F.lit(0).alias("tag"),
        F.lit(-1).cast("long").alias("user_id"),
        F.lit(None).cast("long").alias("x"),
        F.col("a").alias("ctrl_a"),
    ).unionAll(
        treated.select(
            "a",
            F.lit(1).alias("tag"),
            "user_id",
            "x",
            F.lit(None).cast("long").alias("ctrl_a"),
        )
    )
    # last-non-null in each direction WITHOUT a single-partition
    # window: ctrl_a equals the sort key on control rows, so along
    # ascending (a, tag, user_id) order the last prior control level
    # IS the prefix max of ctrl_a — range_prefix's prevmax; the
    # backward pass is the same with negated keys. Treated rows carry
    # NULL ctrl_a, so strict-vs-inclusive frames agree on them.
    fwd = range_prefix(
        stream, ["a", "tag", "user_id"], max_cols=("ctrl_a",)
    ).withColumnRenamed("prevmax_ctrl_a", "prev_a")
    bwd = range_prefix(
        fwd.withColumn("_nega", -F.col("a")).withColumn(
            "_negctrl", -F.col("ctrl_a")
        ),
        ["_nega", "tag", "user_id"],
        max_cols=("_negctrl",),
    ).withColumn("next_a", -F.col("prevmax__negctrl"))
    matched = (
        bwd.filter(F.col("tag") == 1)
        .select(
            "user_id",
            "a",
            "x",
            F.when(F.col("prev_a").isNull(), F.col("next_a"))
            .when(F.col("next_a").isNull(), F.col("prev_a"))
            .when(
                F.col("a") - F.col("prev_a") <= F.col("next_a") - F.col("a"),
                F.col("prev_a"),
            )
            .otherwise(F.col("next_a"))
            .alias("m_a"),
        )
    )
    joined = matched.join(
        F.broadcast(ctrl.withColumnRenamed("a", "m_a")), "m_a"
    )
    return joined.agg(
        F.count(F.lit(1)).alias("n_treated"),
        F.round(
            _qsum(F.col("x") - F.col("sx") / F.col("n_c"))
            / _NANO
            / F.count(F.lit(1))
            / 100.0,
            4,
        ).alias("att_usd"),
        F.round(
            F.sum(F.abs(F.col("a") - F.col("m_a"))) / F.count(F.lit(1)), 6
        ).alias("avg_abs_gap"),
    )


# shared with the streaming twin via the leaf oracle_shared module
from mini_sql_engine_spark.oracle_shared import (  # noqa: E402
    PSI_BIN_CENTS,
    PSI_BINS,
)


def psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stability index between the first and second half of
    the month (calendar split, day-of-month ≤ 15) over binned purchase
    values — the industry-standard "has my feature distribution
    shifted" monitor (PSI < 0.1 stable, > 0.25 action), complementing
    the χ² (`ext_drift_chi2`) and JS (`ext_js_divergence`) monitors
    with the metric ops teams actually threshold on. Add-one smoothing
    keeps empty-on-one-side bins finite; PSI = Σ (p−q)·ln(p/q) runs
    through qsum (ln on identical exact-ratio operands is
    deterministic across engines). Bins empty on BOTH sides carry no
    row (and zero contribution) by construction.

    Scale notes (100 TB): one (bin, half) rollup with map-side
    partial agg, then arithmetic over PSI_BINS rows. The calendar
    split is a per-row predicate, so no second scan.
    """
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            F.least(
                F.floor(
                    F.floor(F.col("value") * 100 + 0.5) / PSI_BIN_CENTS
                ),
                F.lit(PSI_BINS - 1),
            )
            .cast("long")
            .alias("bin"),
            (F.dayofmonth("ts") <= 15).alias("early"),
        )
    )
    per_bin = ev.groupBy("bin").agg(
        F.sum(F.when(F.col("early"), 1).otherwise(0)).alias("n_early"),
        F.sum(F.when(F.col("early"), 0).otherwise(1)).alias("n_late"),
    )
    return psi_readout(per_bin)


def psi_readout(per_bin: DataFrame) -> DataFrame:
    """Smoothed-PSI arithmetic over a (bin, n_early, n_late) table —
    shared by the batch monitor and its exactly-once streaming twin
    (`stream_psi_drift` reads the same counts back from the merged
    native state table, and after a full drain they equal the batch
    counts exactly). Checkpoints the input: four consumers (totals,
    the row table, the PSI combine, the final select) would otherwise
    each re-run the upstream scan — Spark does not dedupe common
    subplans across DataFrame branches.
    """
    per_bin = per_bin.localCheckpoint(eager=False)
    tot = per_bin.agg(
        F.sum("n_early").alias("ne"), F.sum("n_late").alias("nl")
    )
    rws = per_bin.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n_early",
        "n_late",
        ((F.col("n_early") + 1) / (F.col("ne") + PSI_BINS)).alias("p"),
        ((F.col("n_late") + 1) / (F.col("nl") + PSI_BINS)).alias("q"),
    ).localCheckpoint(eager=False)
    psi = rws.agg(
        _qsum((F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))).alias(
            "psi_q"
        )
    )
    return rws.crossJoin(F.broadcast(psi)).select(
        "bin",
        "n_early",
        "n_late",
        F.round("p", 6).alias("p"),
        F.round("q", 6).alias("q"),
        F.round(F.col("psi_q") / _NANO, 6).alias("psi"),
    )


def wasserstein_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wasserstein-1 (earth-mover) distance between the click and
    purchase value distributions — the integral companion to the KS
    sup-statistic (`ext_ks_two_sample`): KS sees the single worst CDF
    gap, W₁ = ∫|F−G| sees the total transport cost, which is what a
    "how big is the shift in dollars" question actually asks. Exact on
    the integer-cents ladder: W₁ = Σ_i (v_{i+1}−v_i)·|F(v_i)−G(v_i)|
    with cumulative integer counts and exact count/total ratios; the
    float combine runs through qsum.

    Scale notes (100 TB): one (value, side) rollup, cumulative counts
    via range_prefix (range-partitioned prefix sums — a continuous
    column's distinct-cents ladder is ~rows, never one task; round-8
    verdict), successor values by a rank self-join on the ladder
    (ladder-sized shuffle, not a global lead window), one scalar
    combine. Same shape as the KS test.
    """
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "purchase"))
        .select(
            F.floor(F.col("value") * 100 + 0.5).cast("long").alias("v"),
            (F.col("event_type") == "click").alias("is_a"),
        )
    )
    # one scan: the ladder rollup is the only corpus pass — totals
    # derive from it (Σ over cells ≡ Σ over rows), and the checkpoint
    # stops the total/ladder branches re-running the scan
    cells = ev.groupBy("v").agg(
        F.sum(F.col("is_a").cast("long")).alias("ca"),
        F.sum((~F.col("is_a")).cast("long")).alias("cb"),
    ).localCheckpoint(eager=False)
    tot = cells.agg(
        F.sum("ca").alias("na"),
        F.sum("cb").alias("nb"),
    )
    pre = range_prefix(cells, ["v"], sum_cols=("ca", "cb")).select(
        "v",
        F.col("cum_ca").alias("cum_a"),
        F.col("cum_cb").alias("cum_b"),
        "rnk",
    )
    # successor lookup: rank k joins rank k+1 — the inner join drops
    # the max-value row (no successor), same as the old lead+filter
    nxt = pre.select(
        (F.col("rnk") - 1).alias("rnk"), F.col("v").alias("next_v")
    )
    ladder = pre.join(nxt, "rnk").drop("rnk")
    w1 = ladder.crossJoin(F.broadcast(tot)).agg(
        _qsum(
            (F.col("next_v") - F.col("v"))
            * F.abs(F.col("cum_a") / F.col("na") - F.col("cum_b") / F.col("nb"))
        ).alias("w1_q"),
        F.max("na").alias("na"),
        F.max("nb").alias("nb"),
    )
    return w1.select(
        F.col("na").cast("long").alias("n_click"),
        F.col("nb").cast("long").alias("n_purchase"),
        F.round(F.col("w1_q") / _NANO / 100.0, 6).alias("w1_usd"),
    )


def quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization: map every event's value onto the POOLED
    all-events distribution at the same within-group rank fraction —
    the transform that makes per-source feature distributions
    comparable (identical marginals) before mixing, standard in batch-
    effect correction and multi-source training-data blending. Exact
    rank arithmetic: within-group rank r of n_g maps to pooled rank
    k = ⌊((2r−1)·N)/(2·n_g)⌋ + 1 (midpoint rule) — all-integer
    operands below 2^53, so the double division floors identically on
    both engines; ties order by (value, event_id) for determinism.

    Scale notes (100 TB): the per-group rank window partitions by
    event_type; the POOLED ladder rank comes from range_prefix
    (range-partitioned, never one task); one shuffle join on the
    pooled rank. The pooled ladder can be sampled/sketched (t-digest)
    at real scale; the exact-rank form is the oracle-checkable spec.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("v"),
        # four consumers (group sizes, total, group ranks, pooled
        # ladder) — checkpoint the 3-column projection so the parquet
        # scan runs once; at real scale this materialization is the
        # standard "project then reuse" staging table
    ).localCheckpoint(eager=False)
    n_g = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_g"))
    n_tot = ev.agg(F.count(F.lit(1)).alias("n_tot"))
    wg = Window.partitionBy("event_type").orderBy("v", "event_id")
    ranked = (
        ev.withColumn("r", F.row_number().over(wg))
        .join(F.broadcast(n_g), "event_type")
        .crossJoin(F.broadcast(n_tot))
    )
    pooled = range_prefix(
        ev.select("v", "event_id"), ["v", "event_id"]
    ).select(F.col("rnk").alias("k"), F.col("v").alias("pv"))
    keyed = ranked.select(
        "event_id",
        "event_type",
        F.col("v").alias("orig_cents"),
        F.greatest(
            F.lit(1),
            F.least(
                F.col("n_tot"),
                F.floor(
                    (2 * F.col("r") - 1)
                    * F.col("n_tot")
                    / (2 * F.col("n_g"))
                ).cast("long")
                + 1,
            ),
        ).alias("k"),
    )
    return keyed.join(pooled, "k").select(
        "event_id", "event_type", "orig_cents", F.col("pv").alias("norm_cents")
    )


IV_CLICK_MIN = 15  # "heavy clicker" treatment threshold


def iv_wald(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Instrumental-variable (Wald) estimator: effect of clicking on
    spend using a hash instrument Z —
    β_IV = (E[y|z=1] − E[y|z=0]) / (E[d|z=1] − E[d|z=0]) — the
    estimator for when the treatment itself is confounded but an
    exogenous nudge exists (encouragement designs). Completes the
    causal toolkit next to DiD, stratification, matching and QTE.
    Everything reduces to ONE conditional-aggregate row over exact
    integer sums: spend in cents, d = user clicked ≥ once, z = hash
    arm; the intent-to-treat and first-stage contrasts ride along so
    a weak instrument is visible (|first_stage| small).

    Scale notes (100 TB): one user rollup, one 1-row conditional
    aggregate — the same shape as `ext_diff_in_diff`. No joins.
    """
    users = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.floor(F.col("value") * 100 + 0.5).cast("long"),
                ).otherwise(0)
            ).alias("y"),
            # d = heavy clicker (≥ IV_CLICK_MIN clicks): a binary
            # treatment with real variation at every scale (plain
            # "ever clicked" saturates to 1 for all users, collapsing
            # the first stage to zero)
            (
                F.sum(
                    F.when(F.col("event_type") == "click", 1).otherwise(0)
                )
                >= IV_CLICK_MIN
            )
            .cast("int")
            .alias("d"),
        )
        .select(
            "y",
            "d",
            (md5_long(F.col("user_id").cast("string"), salt="iv") % 2).alias(
                "z"
            ),
        )
    )
    row = users.agg(
        F.sum(F.when(F.col("z") == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("z") == 0, 1).otherwise(0)).alias("n0"),
        F.sum(F.when(F.col("z") == 1, F.col("y")).otherwise(0)).alias("sy1"),
        F.sum(F.when(F.col("z") == 0, F.col("y")).otherwise(0)).alias("sy0"),
        F.sum(F.when(F.col("z") == 1, F.col("d")).otherwise(0)).alias("sd1"),
        F.sum(F.when(F.col("z") == 0, F.col("d")).otherwise(0)).alias("sd0"),
    )
    itt = F.col("sy1") / F.col("n1") - F.col("sy0") / F.col("n0")
    fs = F.col("sd1") / F.col("n1") - F.col("sd0") / F.col("n0")
    return row.select(
        (F.col("n1") + F.col("n0")).alias("n_users"),
        F.round(itt / 100.0, 4).alias("itt_usd"),
        F.round(fs, 6).alias("first_stage"),
        # a zero first stage (no instrument-treatment link in this
        # sample) leaves the Wald ratio undefined — NULL, not an error
        F.when(fs != 0, F.round(itt / fs / 100.0, 4)).alias("wald_iv_usd"),
    )


# SPRT: H0 conversion p0 vs H1 p1; boundaries from alpha/beta = 0.05.
# The corpus daily conversion sits ~0.42, between the hypotheses, so
# the monitor shows a real sequential trajectory (days of "continue"
# before a boundary) instead of saturating on day one.
SPRT_P0 = 0.40
SPRT_P1 = 0.44
SPRT_LLR_CONV = math.log(SPRT_P1 / SPRT_P0)
SPRT_LLR_FAIL = math.log((1.0 - SPRT_P1) / (1.0 - SPRT_P0))
SPRT_LOG_A = math.log((1.0 - 0.05) / 0.05)  # accept-H1 boundary
SPRT_LOG_B = math.log(0.05 / (1.0 - 0.05))  # accept-H0 boundary


def sprt_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald's sequential probability ratio test over the daily
    conversion stream: cumulative log-likelihood ratio of H1 (p=0.22)
    vs H0 (p=0.18) with the 5%/5% decision boundaries — the monitor
    that lets an experiment STOP the day evidence suffices instead of
    waiting out a fixed horizon (the fixed-N z-test is
    `ext_ab_test_zscore`). Per user-day: converted = any purchase.
    LLR increments are integer counts times two LITERAL constants
    (ln ratios precomputed driver-side), so the cumulative sum is
    exact integer arithmetic after quantization; the boundary
    comparison happens on identical doubles in both engines.

    Scale notes (100 TB): one user-day rollup, one |days|-row daily
    rollup, one cumulative window over days — the monitoring readout
    is O(days) after the first map-side-combined shuffle.
    """
    from pyspark.sql import Window

    ud = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            F.date_format("ts", "yyyy-MM-dd").alias("day"), "user_id"
        )
        .agg(
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("conv")
        )
    )
    daily = ud.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_userdays"),
        F.sum("conv").alias("n_conv"),
    )
    # quantized LLR increment: counts × literal ln-ratios
    inc_q = F.floor(
        (
            F.col("n_conv") * F.lit(SPRT_LLR_CONV)
            + (F.col("n_userdays") - F.col("n_conv")) * F.lit(SPRT_LLR_FAIL)
        )
        * _NANO
        + 0.5
    ).cast("long")
    # bounded global window: calendar-days ladder
    wcum = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = daily.withColumn("llr_q", F.sum(inc_q).over(wcum))
    return cum.select(
        "day",
        "n_userdays",
        "n_conv",
        F.round(F.col("llr_q") / _NANO, 6).alias("cum_llr"),
        F.when(F.col("llr_q") / _NANO >= SPRT_LOG_A, F.lit("accept_h1"))
        .when(F.col("llr_q") / _NANO <= SPRT_LOG_B, F.lit("accept_h0"))
        .otherwise(F.lit("continue"))
        .alias("decision"),
    )


DML_Q = 10_000  # residual-product quantization (keeps qsums < 2^53)


def double_ml_plm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Double/debiased ML, partially-linear model (Chernozhukov et al.
    2018) with 2-fold cross-fitting: the effect of clicks on spend
    after partialling the activity confounder (views) out of BOTH —
    θ = Σ ỹ·d̃ / Σ d̃², residuals ỹ, d̃ taken against nuisance fits
    trained on the OPPOSITE hash fold (cross-fitting is what kills
    the own-fit overfitting bias; the naive pooled OLS slope rides
    along for contrast). Nuisance fits are closed-form OLS from
    exact integer moment sums; the driver collects one moment row
    per fold (control values), derives each fold's out-of-fold
    coefficients with the same float(int)/float(int) divisions the
    oracle's CTEs write, and a second aggregate reduces the residual
    products through the fixed-point sum at 1e-4 quanta (products
    are ~1e6-scale; 1e-9 quanta would push the long sum past 2^53,
    where BIGINT-vs-Python division semantics diverge).

    Scale notes (100 TB): one user rollup (checkpointed), two
    map-side-combinable aggregates over it — moments, then residual
    products. No joins; the per-row residual arithmetic uses literal
    coefficients.
    """
    users = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.floor(F.col("value") * 100 + 0.5).cast("long"),
                ).otherwise(0)
            ).alias("y"),
            F.sum(
                F.when(F.col("event_type") == "click", 1).otherwise(0)
            ).alias("d"),
            F.sum(
                F.when(F.col("event_type") == "view", 1).otherwise(0)
            ).alias("x"),
        )
        .select(
            "y",
            "d",
            "x",
            (md5_long(F.col("user_id").cast("string"), salt="dml") % 2).alias(
                "fold"
            ),
        )
        .localCheckpoint(eager=False)
    )
    mom = (
        users.groupBy("fold")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum("d").alias("sd"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("x") * F.col("d")).alias("sxd"),
        )
        .collect()
    )
    m = {r["fold"]: r for r in mom}

    def _fit(r) -> tuple[float, float, float, float]:
        """Out-of-fold OLS coefficients (a_y, b_y, a_d, b_d) — the
        float(int)/float(int) forms the oracle mirrors exactly."""
        by = float(r["n"] * r["sxy"] - r["sx"] * r["sy"]) / float(
            r["n"] * r["sxx"] - r["sx"] * r["sx"]
        )
        ay = (float(r["sy"]) - by * float(r["sx"])) / float(r["n"])
        bd = float(r["n"] * r["sxd"] - r["sx"] * r["sd"]) / float(
            r["n"] * r["sxx"] - r["sx"] * r["sx"]
        )
        ad = (float(r["sd"]) - bd * float(r["sx"])) / float(r["n"])
        return ay, by, ad, bd

    # fold f's residuals use coefficients fit on fold 1-f
    co = {f: _fit(m[1 - f]) for f in (0, 1)}
    ay = F.when(F.col("fold") == 0, F.lit(co[0][0])).otherwise(F.lit(co[1][0]))
    by = F.when(F.col("fold") == 0, F.lit(co[0][1])).otherwise(F.lit(co[1][1]))
    ad = F.when(F.col("fold") == 0, F.lit(co[0][2])).otherwise(F.lit(co[1][2]))
    bd = F.when(F.col("fold") == 0, F.lit(co[0][3])).otherwise(F.lit(co[1][3]))
    ry = F.col("y") - (ay + by * F.col("x"))
    rd = F.col("d") - (ad + bd * F.col("x"))
    red = users.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.floor(ry * rd * DML_Q + 0.5).cast("long")).alias("syd_q"),
        F.sum(F.floor(rd * rd * DML_Q + 0.5).cast("long")).alias("sdd_q"),
    )
    # naive pooled OLS slope of y on d (no partialling) for contrast
    pooled = users.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("sy"),
        F.sum("d").alias("sd"),
        F.sum(F.col("d") * F.col("d")).alias("sdd"),
        F.sum(F.col("d") * F.col("y")).alias("sdy"),
    )
    naive = (
        (F.col("n") * F.col("sdy") - F.col("sd") * F.col("sy"))
        / (F.col("n") * F.col("sdd") - F.col("sd") * F.col("sd"))
    )
    return red.crossJoin(F.broadcast(pooled)).select(
        "n_users",
        F.round(F.col("syd_q") / F.col("sdd_q") / 100.0, 6).alias(
            "theta_usd_per_click"
        ),
        F.round(naive / 100.0, 6).alias("naive_usd_per_click"),
    )


AIPW_Q = 10_000  # fixed-point quanta for the influence-function sum
AIPW_CUT = 12  # treated = more than this many clicks (both arms and
# within-arm x variance populate on the overlap set at every sf)


def aipw_doubly_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AIPW (augmented inverse-propensity) doubly-robust ATE of being
    a heavy clicker (more than AIPW_CUT clicks — self-selected, hence
    confounded with activity) on purchase spend — the capstone of the
    causal suite:
    ψ = μ1(x) − μ0(x) + D·(Y−μ1)/e(x) − (1−D)·(Y−μ0)/(1−e(x)),
    consistent if EITHER nuisance is right. Here the outcome models
    are deliberately misspecified (global per-arm LINEAR OLS on the
    view count) while the propensity is saturated-exact (per-level
    treated fraction), so the augmentation term is doing real work —
    the configuration that shows why AIPW beats either plug-in alone
    (`ext_propensity_match` trusts only e, `ext_double_ml_plm`
    partials linearly).

    Estimation restricts to OVERLAP levels (both arms present —
    e ∈ (0,1); positivity is an assumption, not a hope) and reports
    how many users fall outside it. All nuisances derive from exact
    integer moments via the same division chains in both engines; the
    per-user ψ reduces through the fixed-point sum, and the reported
    doubles are UNROUNDED ratios of exact integers (no ROUND — see
    ext_key_skew's tie lesson).

    Scale notes (100 TB): one user rollup; the level table (distinct
    view counts) broadcasts e(x) back; the moment row is a 1-row
    broadcast; one final map-side-combinable ψ aggregate. Joinless on
    the corpus side beyond the two broadcasts.
    """
    users = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.floor(F.col("value") * 100 + 0.5).cast("long"),
                ).otherwise(0)
            ).alias("y"),
            F.when(
                F.sum(
                    F.when(F.col("event_type") == "click", 1).otherwise(0)
                )
                > AIPW_CUT,
                1,
            )
            .otherwise(0)
            .alias("d"),
            F.sum(
                F.when(F.col("event_type") == "view", 1).otherwise(0)
            ).alias("x"),
        )
        .localCheckpoint(eager=False)
    )
    levels = users.groupBy("x").agg(
        F.count(F.lit(1)).alias("nl"),
        F.sum("d").alias("nl1"),
    )
    overlap = levels.filter(
        (F.col("nl1") > 0) & (F.col("nl1") < F.col("nl"))
    )
    uo = users.join(F.broadcast(overlap), "x")
    mom = uo.agg(
        F.count(F.lit(1)).alias("n_overlap"),
        *[
            F.sum(
                F.when(F.col("d") == arm, expr).otherwise(0)
            ).alias(f"{tag}{arm}")
            for arm in (1, 0)
            for tag, expr in (
                ("n", F.lit(1)),
                ("sx", F.col("x")),
                ("sy", F.col("y")),
                ("sxx", F.col("x") * F.col("x")),
                ("sxy", F.col("x") * F.col("y")),
            )
        ],
    )

    def _ab(arm: int) -> tuple[F.Column, F.Column]:
        n, sx, sy, sxx, sxy = (
            F.col(f"{t}{arm}").cast("double")
            for t in ("n", "sx", "sy", "sxx", "sxy")
        )
        b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        a = (sy - b * sx) / n
        return a, b

    a1, b1 = _ab(1)
    a0, b0 = _ab(0)
    mu1 = a1 + b1 * F.col("x")
    mu0 = a0 + b0 * F.col("x")
    e = F.col("nl1").cast("double") / F.col("nl").cast("double")
    psi = (
        (mu1 - mu0)
        + F.col("d") * (F.col("y") - mu1) / e
        - (1 - F.col("d")) * (F.col("y") - mu0) / (1 - e)
    )
    red = uo.crossJoin(F.broadcast(mom)).agg(
        F.sum(F.floor(psi * AIPW_Q + 0.5).cast("long")).alias("psi_q")
    )
    naive = users.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.when(F.col("d") == 1, F.col("y")).otherwise(0)).alias("ny1"),
        F.sum("d").alias("nd1"),
        F.sum(F.when(F.col("d") == 0, F.col("y")).otherwise(0)).alias("ny0"),
        F.sum(1 - F.col("d")).alias("nd0"),
    )
    return (
        red.crossJoin(F.broadcast(mom.select("n_overlap")))
        .crossJoin(F.broadcast(naive))
        .select(
            "n_users",
            "n_overlap",
            "psi_q",
            (
                F.col("psi_q").cast("double")
                / (F.col("n_overlap") * AIPW_Q * 100).cast("double")
            ).alias("aipw_ate_usd"),
            (
                F.col("ny1").cast("double") / F.col("nd1").cast("double")
                - F.col("ny0").cast("double") / F.col("nd0").cast("double")
            ).alias("naive_diff_cents"),
        )
    )


RDD_CUT = 66  # activity cutoff — the corpus mean events/user (~66 at
# every sf: events and users scale together), so both sides populate
RDD_BW = 20  # local-linear bandwidth in activity units


def regression_discontinuity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharp regression discontinuity at an activity cutoff: fit a
    local linear regression of spend on centered activity separately
    on each side of RDD_CUT (within bandwidth RDD_BW) and report the
    jump between the two intercepts at the cutoff — the design for
    threshold-assigned treatments (feature unlocks, tier upgrades)
    where units just above and just below the line are comparable.
    Both fits are closed-form OLS from exact integer moment sums
    folded into ONE conditional-aggregate row (the DiD pattern with
    slopes); all divisions are BIGINT-derived doubles mirrored
    operation-for-operation by the oracle.

    Scale notes (100 TB): one user rollup, one 1-row conditional
    aggregate, row-local arithmetic — joinless, collect-free.
    """
    users = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("a"),
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.floor(F.col("value") * 100 + 0.5).cast("long"),
                ).otherwise(0)
            ).alias("y"),
        )
        .select((F.col("a") - RDD_CUT).alias("t"), "y")
        .filter(
            (F.col("t") >= -RDD_BW) & (F.col("t") <= RDD_BW)
        )
    )
    right = F.col("t") >= 0

    def side_moms(cond, tag: str) -> list:
        z = F.lit(0)
        return [
            F.sum(F.when(cond, 1).otherwise(z)).alias(f"n_{tag}"),
            F.sum(F.when(cond, F.col("t")).otherwise(z)).alias(f"st_{tag}"),
            F.sum(F.when(cond, F.col("y")).otherwise(z)).alias(f"sy_{tag}"),
            F.sum(
                F.when(cond, F.col("t") * F.col("t")).otherwise(z)
            ).alias(f"stt_{tag}"),
            F.sum(
                F.when(cond, F.col("t") * F.col("y")).otherwise(z)
            ).alias(f"sty_{tag}"),
        ]

    row = users.agg(*side_moms(~right, "l"), *side_moms(right, "r"))

    def fit(tag: str):
        n, st, sy = F.col(f"n_{tag}"), F.col(f"st_{tag}"), F.col(f"sy_{tag}")
        stt, sty = F.col(f"stt_{tag}"), F.col(f"sty_{tag}")
        b = (n * sty - st * sy) / (n * stt - st * st)
        alpha = (sy - b * st) / n
        return alpha, b

    al, bl = fit("l")
    ar, br = fit("r")
    # a side with < 2 distinct running values cannot support a linear
    # fit — NULL, not a divide-by-zero (small-sf samples can be lopsided)
    den = lambda tag: (  # noqa: E731 — local formula alias
        F.col(f"n_{tag}") * F.col(f"stt_{tag}")
        - F.col(f"st_{tag}") * F.col(f"st_{tag}")
    )
    valid = (den("l") != 0) & (den("r") != 0)
    return row.select(
        F.col("n_l").alias("n_left"),
        F.col("n_r").alias("n_right"),
        F.when(valid, F.round((ar - al) / 100.0, 4)).alias("rd_effect_usd"),
        F.when(valid, F.round(bl / 100.0, 6)).alias("slope_left_usd"),
        F.when(valid, F.round(br / 100.0, 6)).alias("slope_right_usd"),
    )


# target policy over event types (sums to 1) — the counterfactual
# whose value IPS estimates from logs collected under the empirical
# logging distribution
OPE_TARGET = {
    "click": 0.3,
    "purchase": 0.4,
    "view": 0.1,
    "signup": 0.1,
    "error": 0.1,
}


def offpolicy_ips(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Off-policy evaluation via inverse propensity scoring: estimate
    what the TARGET action distribution would earn per event from
    logs collected under the logging policy — V_IPS = mean(r·w),
    V_SNIPS = Σr·w / Σw with w = π_target(a)/π_log(a) — the
    counterfactual-evaluation workhorse for rankers/policies that
    cannot be A/B-tested before deployment, plus Kish's effective
    sample size of the weights (the diagnostic that says whether the
    estimate is resting on a handful of high-weight rows). The
    logging propensities are the exact empirical action frequencies;
    target propensities are literals; every float reduction runs
    through qsum.

    Scale notes (100 TB): one |actions|-row rollup (broadcast back),
    one weighted-aggregate pass — two map-side-combinable shuffles,
    no joins wider than the 5-row propensity table.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("r"),
    )
    freq = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_a"))
    tot = ev.agg(F.count(F.lit(1)).alias("n"))
    tgt = F.lit(None).cast("double")
    for a, pi in OPE_TARGET.items():
        tgt = F.when(F.col("event_type") == a, F.lit(pi)).otherwise(tgt)
    w = tgt / (F.col("n_a") / F.col("n"))
    joined = ev.join(F.broadcast(freq), "event_type").crossJoin(
        F.broadcast(tot)
    )
    out = joined.agg(
        F.max("n").alias("n_events"),
        _qsum(F.col("r") / 100.0).alias("vlog_q"),
        _qsum(F.col("r") / 100.0 * w).alias("vips_q"),
        _qsum(w).alias("w_q"),
        _qsum(w * w).alias("ww_q"),
    )
    return out.select(
        "n_events",
        F.round(F.col("vlog_q") / _NANO / F.col("n_events"), 6).alias(
            "v_logged_usd"
        ),
        F.round(F.col("vips_q") / _NANO / F.col("n_events"), 6).alias(
            "v_ips_usd"
        ),
        # ratio of same-scale fixed-point sums — the quantization factor
        # cancels exactly
        F.round(F.col("vips_q") / F.col("w_q"), 6).alias("v_snips_usd"),
        F.round(
            F.col("w_q") / _NANO * (F.col("w_q") / _NANO) / (
                F.col("ww_q") / _NANO
            ),
            4,
        ).alias("ess_weights"),
    )


AUC_POS_MIN = 7  # second-half purchases defining a positive label


def segment_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment ROC-AUC of a leakage-safe conversion score: first-
    half-of-month activity predicting second-half purchase, sliced by
    market segment — the per-slice discrimination audit that catches a
    model working globally but failing a segment (the fairness/
    robustness readout a single pooled AUC hides). AUC computes
    exactly as the tie-corrected rank statistic on each segment's
    integer score ladder (doubled average ranks, the `ext_mann_whitney`
    construction), so the only float per segment is one final
    division. Segments with an empty class emit NULL.

    Scale notes (100 TB): one user rollup + broadcast segment attach,
    one (segment, score) rollup, one cumulative window per segment
    ladder (distinct scores ≪ users), one |segments|-row readout.
    """
    from pyspark.sql import Window

    users = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(F.dayofmonth("ts") <= 15, 1).otherwise(0)
            ).alias("s"),
            # label: HEAVY second-half purchaser (≥ AUC_POS_MIN) — a
            # simple any-purchase label saturates to 1 for every user
            # at this event density, leaving no negative class
            (
                F.sum(
                    F.when(
                        (F.col("event_type") == "purchase")
                        & (F.dayofmonth("ts") > 15),
                        1,
                    ).otherwise(0)
                )
                >= AUC_POS_MIN
            )
            .cast("long")
            .alias("y"),
        )
    )
    seg = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), F.col("c_mktsegment").alias("segment")
    )
    su = users.join(F.broadcast(seg), "user_id")
    cells = su.groupBy("segment", "s").agg(
        F.sum("y").alias("pos"),
        F.sum(F.lit(1) - F.col("y")).alias("neg"),
    )
    wseg = Window.partitionBy("segment").orderBy("s")
    wcum = wseg.rowsBetween(Window.unboundedPreceding, -1)
    ladder = (
        cells.withColumn(
            "cum_prev",
            F.coalesce(
                F.sum(F.col("pos") + F.col("neg")).over(wcum), F.lit(0)
            ),
        )
        .withColumn("t", F.col("pos") + F.col("neg"))
        # doubled average rank of every member of this score cell:
        # 2·rank = 2·cum_prev + t + 1 (exact under ties)
        .withColumn(
            "r1_2",
            F.col("pos") * (2 * F.col("cum_prev") + F.col("t") + 1),
        )
    )
    agg = ladder.groupBy("segment").agg(
        F.sum("pos").alias("n_pos"),
        F.sum("neg").alias("n_neg"),
        F.sum("r1_2").alias("sr1_2"),
    )
    auc = (
        F.col("sr1_2") - F.col("n_pos") * (F.col("n_pos") + 1)
    ) / (2 * F.col("n_pos") * F.col("n_neg"))
    return agg.select(
        "segment",
        "n_pos",
        "n_neg",
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0), F.round(auc, 6)
        ).alias("auc"),
    )


def _ud_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-day (clicks-based score, purchase label) — the shared
    predictor of the calibration/PR/Brier evaluation suite (same
    construction as `ext_calibration_ece`)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias(
                "clicks"
            ),
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("y"),
        )
        .select("clicks", "y")
    )


def pr_curve_ap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision–recall curve + exact average precision for the
    calibration suite's conversion score: one row per distinct score
    threshold (predict positive when clicks ≥ threshold) with exact
    precision/recall, plus AP = Σ ΔR·P — the class-imbalance-robust
    ranking metric ROC-AUC overstates (`ext_segment_auc`'s
    complement). Everything is integer cumulative counts over the
    DISTINCT-score ladder; AP accumulates ΔTP·P through qsum.

    Scale notes (100 TB): one user-day rollup, one |distinct scores|-
    row ladder with a descending cumulative window — identical shape
    to the KS/W1 ladders.
    """
    from pyspark.sql import Window

    ud = _ud_scored(spark, sf_dir)
    cells = ud.groupBy("clicks").agg(
        F.sum("y").alias("pos"),
        F.sum(F.lit(1) - F.col("y")).alias("neg"),
    )
    tot = cells.agg(
        F.sum("pos").alias("n_pos"), F.sum("neg").alias("n_neg")
    )
    # bounded global window: click-count cells, not rows
    wdesc = Window.orderBy(F.col("clicks").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ladder = (
        cells.withColumn("tp", F.sum("pos").over(wdesc))
        .withColumn("fp", F.sum("neg").over(wdesc))
        .crossJoin(F.broadcast(tot))
        .withColumn("prec", F.col("tp") / (F.col("tp") + F.col("fp")))
        .withColumn("rec", F.col("tp") / F.col("n_pos"))
        .localCheckpoint(eager=False)
    )
    # AP = Σ_thresholds (ΔTP/n_pos)·precision — ΔTP is this cell's pos
    ap = ladder.agg(
        _qsum(F.col("pos") / F.col("n_pos") * F.col("prec")).alias("ap_q")
    )
    return ladder.crossJoin(F.broadcast(ap)).select(
        F.col("clicks").alias("threshold"),
        "tp",
        "fp",
        F.round("prec", 6).alias("precision"),
        F.round("rec", 6).alias("recall"),
        F.round(F.col("ap_q") / _NANO, 6).alias("average_precision"),
    )


def f1_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operating-point picker: the score threshold maximizing F1 for
    the calibration suite's conversion score — the decision every
    deployed gate needs after the ranking metrics are settled. F1 per
    threshold is exact integer arithmetic on the cumulative ladder
    (F1 = 2TP/(2TP+FP+FN)); the argmax breaks ties toward the HIGHER
    threshold (stricter gate). Output: the chosen row plus the
    extremes for context.

    Scale notes (100 TB): the same descending ladder as the PR curve;
    the argmax is a 1-row window pick over |distinct scores| rows.
    """
    from pyspark.sql import Window

    ud = _ud_scored(spark, sf_dir)
    cells = ud.groupBy("clicks").agg(
        F.sum("y").alias("pos"),
        F.sum(F.lit(1) - F.col("y")).alias("neg"),
    )
    tot = cells.agg(F.sum("pos").alias("n_pos"))
    # bounded global window: click-count cells, not rows
    wdesc = Window.orderBy(F.col("clicks").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ladder = (
        cells.withColumn("tp", F.sum("pos").over(wdesc))
        .withColumn("fp", F.sum("neg").over(wdesc))
        .crossJoin(F.broadcast(tot))
        .withColumn("fn", F.col("n_pos") - F.col("tp"))
        # exact rational compare via cross-multiplication is overkill
        # here: F1's one division is identical IEEE on both engines
        .withColumn(
            "f1",
            2 * F.col("tp")
            / (2 * F.col("tp") + F.col("fp") + F.col("fn")),
        )
    )
    pick = (
        ladder.withColumn(
            "rn",
            F.row_number().over(
                # bounded global window: distinct daily-click-count ladder (small value domain)
                Window.orderBy(F.col("f1").desc(), F.col("clicks").desc())
            ),
        )
        .filter(F.col("rn") == 1)
    )
    return pick.select(
        F.col("clicks").alias("best_threshold"),
        "tp",
        "fp",
        "fn",
        F.round("f1", 6).alias("f1"),
    )


def brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murphy decomposition of the Brier score over the calibration
    bins: BS = reliability − resolution + uncertainty — the exact
    accounting that says WHETHER a bad Brier score comes from
    miscalibration (reliability) or from the score simply not
    separating outcomes (low resolution), which ECE alone cannot
    distinguish. Computed on `ext_calibration_ece`'s bins: per-bin
    confidence/accuracy from exact sums, the three components as
    n-weighted qsum reductions, and the identity BS = REL − RES + UNC
    holds to quantization precision (pinned by pytest).

    Scale notes (100 TB): the user-day rollup plus two ECE_BINS-row
    aggregates — same cost envelope as the ECE audit itself.
    """
    ev = load_table(spark, sf_dir, "events")
    ud = (
        ev.groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias(
                "clicks"
            ),
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("y"),
        )
        .select(
            (F.col("clicks") / (F.col("clicks") + F.lit(float(ECE_SMOOTH)))).alias(
                "p"
            ),
            "y",
        )
        .localCheckpoint(eager=False)
    )
    binned = ud.select(
        F.least(F.floor(F.col("p") * ECE_BINS), F.lit(ECE_BINS - 1))
        .cast("long")
        .alias("bin"),
        "p",
        "y",
    )
    per_bin = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_b"),
        _qsum(F.col("p")).alias("conf_q"),
        F.sum("y").alias("pos_b"),
    ).localCheckpoint(eager=False)
    tot = per_bin.agg(
        F.sum("n_b").alias("n"), F.sum("pos_b").alias("n_pos")
    )
    base = F.col("n_pos") / F.col("n")
    rows = per_bin.crossJoin(F.broadcast(tot)).select(
        "n_b",
        (F.col("conf_q") / _NANO / F.col("n_b")).alias("conf"),
        (F.col("pos_b") / F.col("n_b")).alias("acc"),
        base.alias("base"),
        "n",
    )
    comp = rows.agg(
        _qsum(
            F.col("n_b")
            / F.col("n")
            * (F.col("conf") - F.col("acc"))
            * (F.col("conf") - F.col("acc"))
        ).alias("rel_q"),
        _qsum(
            F.col("n_b")
            / F.col("n")
            * (F.col("acc") - F.col("base"))
            * (F.col("acc") - F.col("base"))
        ).alias("res_q"),
        F.max("base").alias("base_rate"),
    )
    # BS itself, directly: mean (p − y)² over user-days
    bs = ud.agg(
        F.count(F.lit(1)).alias("n_days"),
        _qsum(
            (F.col("p") - F.col("y")) * (F.col("p") - F.col("y"))
        ).alias("bs_q"),
    )
    return comp.crossJoin(F.broadcast(bs)).select(
        "n_days",
        F.round(F.col("bs_q") / _NANO / F.col("n_days"), 6).alias("brier"),
        F.round(F.col("rel_q") / _NANO, 6).alias("reliability"),
        F.round(F.col("res_q") / _NANO, 6).alias("resolution"),
        F.round(
            F.col("base_rate") * (1.0 - F.col("base_rate")), 6
        ).alias("uncertainty"),
    )


QINI_Y_MIN = 14  # purchases defining a converter (~median at all sf)


def qini_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qini curve for uplift targeting: rank users by a targeting
    score (activity), and at each score threshold report the
    INCREMENTAL conversions the treated targeted users deliver over
    the control-rate expectation — Q(k) = Y_t(k) − Y_c(k)·N_t(k)/N_c(k)
    — against the random-targeting diagonal, plus the rectangle-rule
    Qini coefficient (area between curve and diagonal). This is the
    standard evaluation for "whom should we treat" models, closing
    the causal suite's loop from estimating effects to TARGETING
    them. Cumulative counts are exact integers on the score ladder;
    the only floats are the control-scaling ratios and the qsum'd
    area terms; ladder prefixes with no control users yet emit NULL
    (mirrored CASE in the oracle).

    Scale notes (100 TB): one user rollup, one (score, arm) rollup,
    cumulative windows over the DISTINCT-score ladder — the PR-curve
    shape with a treatment dimension.
    """
    from pyspark.sql import Window

    users = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("s"),
            (
                F.sum(
                    F.when(F.col("event_type") == "purchase", 1).otherwise(0)
                )
                >= QINI_Y_MIN
            )
            .cast("long")
            .alias("y"),
        )
        .select(
            "s",
            "y",
            (md5_long(F.col("user_id").cast("string"), salt="arm") % 2).alias(
                "z"
            ),
        )
    )
    cells = users.groupBy("s").agg(
        F.sum(F.when(F.col("z") == 1, 1).otherwise(0)).alias("nt"),
        F.sum(F.when(F.col("z") == 0, 1).otherwise(0)).alias("nc"),
        F.sum(F.when(F.col("z") == 1, F.col("y")).otherwise(0)).alias("yt"),
        F.sum(F.when(F.col("z") == 0, F.col("y")).otherwise(0)).alias("yc"),
    )
    # bounded global window: propensity-strata cells, not rows
    wdesc = Window.orderBy(F.col("s").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ladder = (
        cells.withColumn("cnt", F.sum("nt").over(wdesc))
        .withColumn("cnc", F.sum("nc").over(wdesc))
        .withColumn("cyt", F.sum("yt").over(wdesc))
        .withColumn("cyc", F.sum("yc").over(wdesc))
        .localCheckpoint(eager=False)
    )
    tot = ladder.agg(
        F.max("cnt").alias("tnt"),
        F.max("cnc").alias("tnc"),
        F.max("cyt").alias("tyt"),
        F.max("cyc").alias("tyc"),
    )
    q = F.col("cyt") - F.col("cyc") * (F.col("cnt") / F.col("cnc"))
    overall = F.col("tyt") - F.col("tyc") * (F.col("tnt") / F.col("tnc"))
    frac = (F.col("cnt") + F.col("cnc")) / (F.col("tnt") + F.col("tnc"))
    rows = ladder.crossJoin(F.broadcast(tot)).localCheckpoint(eager=False)
    dn = F.col("nt") + F.col("nc")
    coef = rows.agg(
        _qsum(
            F.when(
                F.col("cnc") > 0,
                (q - overall * frac)
                * (dn / (F.col("tnt") + F.col("tnc"))),
            ).otherwise(F.lit(0.0))
        ).alias("coef_q")
    )
    return rows.crossJoin(F.broadcast(coef)).select(
        F.col("s").alias("score_threshold"),
        (F.col("cnt") + F.col("cnc")).alias("n_targeted"),
        F.when(F.col("cnc") > 0, F.round(q, 4)).alias("qini_inc"),
        F.when(F.col("cnc") > 0, F.round(overall * frac, 4)).alias(
            "random_inc"
        ),
        F.round(F.col("coef_q") / _NANO, 6).alias("qini_coef"),
    )


GAP_SWEEP_MIN = [1, 5, 15, 30, 60, 120, 360, 1440]  # candidate gaps (minutes)


def session_gap_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization-threshold sweep: for each candidate inactivity
    gap, the session count and mean events/session the corpus would
    produce — the actual elbow curve behind choosing a session gap
    (the inactivity histogram shows the gap distribution; this shows
    the CONSEQUENCE of each cut). n_sessions(T) = n_users +
    #{gaps > T}, all exact integer arithmetic over one per-user lag
    pass; the sweep itself is |grid| conditional sums in ONE
    aggregate row, unpivoted to a row per threshold.

    Scale notes (100 TB): one shuffle on user_id for the lag window,
    then a single map-side-combinable aggregate — the whole sweep
    costs one pass regardless of grid size.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros(F.col("ts")).alias("us"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    gaps = ev.withColumn("prev", F.lag("us").over(w)).select(
        "user_id", (F.col("us") - F.col("prev")).alias("gap_us")
    )
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct("user_id").alias("n_users"),
    ]
    for m in GAP_SWEEP_MIN:
        aggs.append(
            F.sum(
                F.when(F.col("gap_us") > m * 60_000_000, 1).otherwise(0)
            ).alias(f"brk_{m}")
        )
    row = gaps.agg(*aggs).localCheckpoint(eager=False)
    out: DataFrame | None = None
    for m in GAP_SWEEP_MIN:
        n_sessions = F.col("n_users") + F.col(f"brk_{m}")
        r = row.select(
            F.lit(m).cast("long").alias("gap_minutes"),
            n_sessions.alias("n_sessions"),
            F.round(F.col("n_events") / n_sessions, 4).alias(
                "avg_events_per_session"
            ),
        )
        out = r if out is None else out.unionAll(r)
    assert out is not None
    return out


QUERIES: dict[str, Callable] = {
    "ext_session_gap_sweep": session_gap_sweep,
    "ext_qini_curve": qini_curve,
    "ext_pr_curve": pr_curve_ap,
    "ext_f1_threshold": f1_threshold,
    "ext_brier_decomposition": brier_decomposition,
    "ext_segment_auc": segment_auc,
    "ext_offpolicy_ips": offpolicy_ips,
    "ext_rdd_cutoff": regression_discontinuity,
    "ext_double_ml_plm": double_ml_plm,
    "ext_iv_wald": iv_wald,
    "ext_sprt_monitor": sprt_monitor,
    "ext_psi_drift": psi_drift,
    "ext_wasserstein_distance": wasserstein_distance,
    "ext_quantile_normalize": quantile_normalize,
    "ext_calibration_ece": calibration_ece,
    "ext_isotonic_calibration": isotonic_calibration,
    "ext_aipw_ate": aipw_doubly_robust,
    "ext_propensity_match": propensity_match,
    "ext_conformal_interval": conformal_interval,
    "ext_experiment_health": experiment_health,
    "ext_hill_tail_index": hill_tail_index,
    "ext_price_elasticity": price_elasticity,
    "ext_stratified_effect": stratified_effect,
    "ext_quantile_treatment_effect": quantile_treatment_effect,
    "ext_churn_features": churn_features,
    "ext_target_encoding": target_encoding,
    "ext_decayed_engagement": decayed_engagement,
    "ext_simpson_screen": simpson_screen,
    "ext_permutation_test": permutation_test,
    "ext_journey_entropy": journey_entropy,
    "ext_shapley_attribution": shapley_attribution,
    "ext_theil_sen_slope": theil_sen_slope,
    "ext_mann_kendall_trend": mann_kendall_trend,
    "ext_ratio_metric_delta": ratio_metric_delta,
    "ext_ltv_triangle": ltv_triangle,
    "ext_sliding_median": sliding_median,
    "ext_max_drawdown": max_drawdown,
    "ext_logrank_test": logrank_test,
    "ext_rrf_fusion": rrf_fusion,
    "ext_snippet_extraction": snippet_extraction,
    "ext_bm25_search": bm25_search,
    "ext_bh_fdr": bh_fdr,
    "ext_tfidf_cosine_pairs": tfidf_cosine_pairs,
    "ext_cuped_adjustment": cuped_adjustment,
    "ext_mann_whitney": mann_whitney,
    "ext_poisson_bootstrap": poisson_bootstrap,
    "ext_kaplan_meier": kaplan_meier,
    "ext_nelson_aalen": nelson_aalen,
    "ext_ks_two_sample": ks_two_sample,
    "ext_vshape_patterns": vshape_patterns,
    "ext_diff_in_diff": diff_in_diff,
    "ext_ab_power_mde": ab_power_mde,
    "ext_fifo_allocation": fifo_allocation,
    "ext_peak_days": peak_days,
    "ext_burstiness_fano": burstiness_fano,
    "ext_equidepth_histogram": equidepth_histogram,
    "ext_equidepth_approx": equidepth_approx,
    "ext_sliding_bitmap_distinct": sliding_bitmap_distinct,
    "ext_audience_overlap": audience_overlap,
    "ext_kmv_intersection": kmv_intersection,
    "ext_weighted_median": weighted_median,
    "ext_cusum_changepoint": cusum_changepoint,
    "ext_bitmap_distinct": bitmap_distinct,
    "ext_ols_trend": ols_trend,
    "ext_autocorr_daily": autocorr_daily,
    "ext_kmv_distinct": kmv_distinct,
    "ext_winsorized_stats": winsorized_stats,
    "ext_interval_union": interval_union_coverage,
    "ext_time_to_convert": time_to_convert,
    "ext_supplier_hhi": supplier_hhi,
    "ext_inactivity_histogram": inactivity_histogram,
    "ext_repeat_purchase_rate": repeat_purchase_rate,
    "ext_rfm_segments": rfm_segments,
    "ext_slo_burn": slo_burn,
    "ext_drift_chi2": drift_chi2,
    "ext_ab_test_zscore": ab_test_zscore,
    "ext_pagerank_types": pagerank_event_types,
    "ext_gap_fill_daily": gap_fill_daily,
    "ext_attribution_last_touch": attribution_last_touch,
    "ext_watermark_audit": watermark_audit,
    "ext_map_funcs": map_functions,
    "ext_running_distinct_users": running_distinct_users,
    "ext_concurrency_sweep": concurrency_sweep,
    "ext_session_paths": session_paths,
    "ext_event_transitions": event_transitions,
    "ext_cohort_retention": cohort_retention,
    "ext_rollup": rollup_priority_status,
    "ext_cube": cube_returnflag_linestatus,
    "ext_grouping_sets": grouping_sets_events,
    "ext_pivot": pivot_event_types,
    "ext_stats_by_group": stats_by_segment,
    "ext_corr_covar": corr_price_quantity,
    "ext_scalar_funcs": scalar_functions,
    "ext_hash_sample": hash_sample,
    "ext_scalar_subquery": scalar_subquery,
    "ext_in_subquery": in_subquery,
    "ext_correlated_subquery": correlated_subquery,
    "ext_lateral_topk": lateral_topk,
    "ext_percentiles": percentiles_by_segment,
    "ext_anomaly_mad": anomaly_mad,
    "ext_unpivot": unpivot_part_metrics,
    "ext_conditional_agg": conditional_aggregates,
    "ext_string_agg": string_agg_nations,
    "ext_approx_count_distinct": approx_count_distinct,
    "ext_quantile_sketch": quantile_sketch,
    "ext_hll_mergeable": hll_mergeable_sketches,
    "ext_quantile_mergeable": quantile_mergeable,
}

_SAMPLE_HASH = (
    "CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || ':' || "
    "CAST(l_linenumber AS VARCHAR)), 1, 15)) AS BIGINT)"
)

def _pr_iter_sql(r: int) -> str:
    p = f"pr{r - 1}"
    return f"""
        c{r} AS (
            SELECT e.dst,
                   CAST(SUM(CAST(FLOOR(({PR_D_NUM} * p.pr * e.cnt) * 1.0
                                 / ({PR_D_DEN} * o.out_cnt)) AS BIGINT))
                        AS BIGINT) AS in_mass
            FROM edges e JOIN outdeg o ON e.src = o.src
                         JOIN {p} p ON e.src = p.node
            GROUP BY e.dst),
        pr{r} AS (
            SELECT n.node,
                   CAST(FLOOR({(PR_D_DEN - PR_D_NUM) * PR_SCALE} * 1.0
                              / ({PR_D_DEN} * (SELECT n_nodes FROM nn)))
                        AS BIGINT)
                   + COALESCE(c.in_mass, 0) AS pr
            FROM nodes n LEFT JOIN c{r} c ON n.node = c.dst)"""


def _drift_pair_sql(name: str, ref: str, cur: str) -> str:
    return f"""
        SELECT '{name}' AS pair, MAX(na) AS n_ref, MAX(nb) AS n_cur,
               COUNT(*) AS n_buckets,
               CAST(SUM(
                   CAST(FLOOR({DRIFT_SCALE} * (a - ea) * (a - ea) / ea)
                        AS BIGINT)
                 + CAST(FLOOR({DRIFT_SCALE} * (b - eb) * (b - eb) / eb)
                        AS BIGINT)) AS BIGINT) AS chi2_scaled
        FROM (
            SELECT *,
                   (a + b) * na / (na + nb) AS ea,
                   (a + b) * nb / (na + nb) AS eb
            FROM (
                SELECT bucket,
                       CAST(SUM(r) AS BIGINT) AS a,
                       CAST(SUM(c) AS BIGINT) AS b,
                       CAST(SUM(SUM(r)) OVER () AS BIGINT) AS na,
                       CAST(SUM(SUM(c)) OVER () AS BIGINT) AS nb
                FROM (
                    SELECT LEAST(CAST(FLOOR(value / {DRIFT_BUCKET_W!r})
                                      AS BIGINT), {DRIFT_BUCKETS - 1})
                               AS bucket,
                           CASE WHEN {ref} THEN 1 ELSE 0 END AS r,
                           CASE WHEN {cur} THEN 1 ELSE 0 END AS c
                    FROM events) x
                GROUP BY bucket) g
            WHERE a + b > 0) t
    """


def _autocorr_lag_sql(lag: int) -> str:
    # exact int128 sums, double conversion in the SAME op order as the
    # Spark decimal path — both sides convert each closed-form term
    # from an exact integer, so r is bit-identical
    return f"""
        SELECT CAST({lag} AS BIGINT) AS lag,
               CAST(n AS BIGINT) AS n_pairs,
               ROUND((CAST(n * sxy AS DOUBLE) - CAST(sx * sy AS DOUBLE))
                     / (SQRT(CAST(n * sxx AS DOUBLE)
                             - CAST(sx * sx AS DOUBLE))
                        * SQRT(CAST(n * syy AS DOUBLE)
                               - CAST(sy * sy AS DOUBLE))), 6) AS r
        FROM (
            SELECT CAST(COUNT(*) AS HUGEINT) AS n, SUM(x) AS sx,
                   SUM(y) AS sy, SUM(x * y) AS sxy,
                   SUM(x * x) AS sxx, SUM(y * y) AS syy
            FROM (SELECT a.rev AS x, b.rev AS y
                  FROM daily a JOIN daily b ON b.day = a.day + {lag}))
    """


_KMV_HASHED = """
        SELECT DISTINCT event_type,
               CAST('0x' || substr(md5('kmv:'
                        || CAST(user_id AS VARCHAR) || ':'
                        || strftime(ts, '%Y-%m-%d')), 1, 15)
                    AS BIGINT) AS h
        FROM events
"""

def _rdd_side_sql(cond: str, tag: str) -> str:
    return ", ".join(
        [
            f"CAST(SUM(CASE WHEN {cond} THEN 1 ELSE 0 END) AS BIGINT)"
            f" AS n_{tag}",
            f"CAST(SUM(CASE WHEN {cond} THEN t ELSE 0 END) AS BIGINT)"
            f" AS st_{tag}",
            f"CAST(SUM(CASE WHEN {cond} THEN y ELSE 0 END) AS BIGINT)"
            f" AS sy_{tag}",
            f"CAST(SUM(CASE WHEN {cond} THEN t * t ELSE 0 END) AS BIGINT)"
            f" AS stt_{tag}",
            f"CAST(SUM(CASE WHEN {cond} THEN t * y ELSE 0 END) AS BIGINT)"
            f" AS sty_{tag}",
        ]
    )


def _rdd_fit_sql(tag: str) -> tuple[str, str]:
    n, st, sy = f"n_{tag}", f"st_{tag}", f"sy_{tag}"
    stt, sty = f"stt_{tag}", f"sty_{tag}"
    b = f"(({n} * {sty} - {st} * {sy}) / ({n} * {stt} - {st} * {st}))"
    alpha = f"(({sy} - {b} * {st}) / {n})"
    return alpha, b


_RDD_AL, _RDD_BL = _rdd_fit_sql("l")
_RDD_AR, _RDD_BR = _rdd_fit_sql("r")


_OPE_TGT_SQL = "CASE " + " ".join(
    f"WHEN event_type = '{a}' THEN CAST({pi} AS DOUBLE)"
    for a, pi in OPE_TARGET.items()
) + " END"

_UD_SQL = """
            SELECT CAST(SUM(CASE WHEN event_type = 'click'
                       THEN 1 ELSE 0 END) AS BIGINT) AS clicks,
                   MAX(CASE WHEN event_type = 'purchase'
                       THEN 1 ELSE 0 END) AS y
            FROM events GROUP BY user_id, CAST(ts AS DATE)"""

_PR_LADDER_SQL = f"""
        ud AS ({_UD_SQL}),
        cells AS (
            SELECT clicks, CAST(SUM(y) AS BIGINT) AS pos,
                   CAST(SUM(1 - y) AS BIGINT) AS neg
            FROM ud GROUP BY clicks),
        tot AS (SELECT CAST(SUM(pos) AS BIGINT) AS n_pos,
                       CAST(SUM(neg) AS BIGINT) AS n_neg
                FROM cells),
        ladder AS (
            SELECT clicks, pos,
                   SUM(pos) OVER (ORDER BY clicks DESC ROWS BETWEEN
                       UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
                   SUM(neg) OVER (ORDER BY clicks DESC ROWS BETWEEN
                       UNBOUNDED PRECEDING AND CURRENT ROW) AS fp,
                   n_pos
            FROM cells CROSS JOIN tot)"""

_GAP_SWEEP_BRKS = ",\n                   ".join(
    f"CAST(SUM(CASE WHEN gap_us > {m * 60_000_000} THEN 1 ELSE 0 END)"
    f" AS BIGINT) AS brk_{m}"
    for m in GAP_SWEEP_MIN
)
_GAP_SWEEP_ROWS = "\n        UNION ALL ".join(
    f"""SELECT CAST({m} AS BIGINT) AS gap_minutes,
               n_users + brk_{m} AS n_sessions,
               ROUND(n_events / (n_users + brk_{m}), 4)
                   AS avg_events_per_session
        FROM agg"""
    for m in GAP_SWEEP_MIN
)

# shared right-censored survival day-grid (mirrors _surv_event_rows)
_SURV_CTES = """
        ev AS (
            SELECT user_id, event_type, CAST(ts AS DATE) AS day
            FROM events),
        per_user AS (
            SELECT user_id,
                   MIN(CASE WHEN event_type = 'click'
                            THEN day END) AS t0,
                   MAX(day) AS last_seen
            FROM ev GROUP BY user_id
            HAVING MIN(CASE WHEN event_type = 'click' THEN day END)
                   IS NOT NULL),
        first_buy AS (
            SELECT e.user_id, MIN(e.day) AS t_buy
            FROM ev e JOIN per_user p ON e.user_id = p.user_id
            WHERE e.event_type = 'purchase' AND e.day >= p.t0
            GROUP BY e.user_id),
        durs AS (
            SELECT CAST(datediff('day', t0,
                                 COALESCE(t_buy, last_seen))
                        AS BIGINT) AS dur,
                   CASE WHEN t_buy IS NOT NULL THEN 1 ELSE 0 END AS d
            FROM per_user LEFT JOIN first_buy USING (user_id)),
        cells AS (SELECT dur, COUNT(*) AS n_at, SUM(d) AS d_at
                  FROM durs GROUP BY dur),
        nt AS (SELECT COUNT(*) AS n_total FROM durs),
        graded AS (
            SELECT dur, d_at,
                   n_total - COALESCE(SUM(n_at) OVER (
                       ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS n_risk
            FROM cells CROSS JOIN nt),
        evrows AS (SELECT * FROM graded WHERE d_at > 0)"""

ORACLES: dict[str, str] = {
    "ext_nelson_aalen": f"""
        WITH {_SURV_CTES},
        curve AS (
            SELECT dur, n_risk, d_at,
                   SUM(CAST(FLOOR(d_at / n_risk * {_KM_NANO} + 0.5)
                            AS BIGINT))
                       OVER (ORDER BY dur
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS cum_hq,
                   SUM(CAST(FLOOR(d_at / (n_risk * n_risk) * {_KM_NANO}
                                  + 0.5) AS BIGINT))
                       OVER (ORDER BY dur
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS cum_vq
            FROM evrows)
        SELECT dur AS t_days, CAST(n_risk AS BIGINT) AS n_risk,
               CAST(d_at AS BIGINT) AS d_events,
               CAST(cum_hq AS DOUBLE) / {_KM_NANO} AS cum_hazard,
               CAST(cum_vq AS DOUBLE) / {_KM_NANO} AS hazard_var
        FROM curve
    """,
    "ext_session_gap_sweep": f"""
        WITH ev AS (
            SELECT user_id, epoch_us(ts) AS us, event_id
            FROM events),
        gaps AS (
            SELECT user_id,
                   us - LAG(us) OVER (PARTITION BY user_id
                       ORDER BY us, event_id) AS gap_us
            FROM ev),
        agg AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
                   {_GAP_SWEEP_BRKS}
            FROM gaps)
        {_GAP_SWEEP_ROWS}
    """,
    "ext_qini_curve": f"""
        WITH users AS (
            SELECT COUNT(*) AS s,
                   CAST(SUM(CASE WHEN event_type = 'purchase'
                       THEN 1 ELSE 0 END) >= {QINI_Y_MIN} AS BIGINT)
                       AS y,
                   CAST('0x' || substr(md5('arm:'
                       || CAST(user_id AS VARCHAR)), 1, 15)
                       AS BIGINT) % 2 AS z
            FROM events GROUP BY user_id),
        cells AS (
            SELECT s,
                   CAST(SUM(CASE WHEN z = 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS nt,
                   CAST(SUM(CASE WHEN z = 0 THEN 1 ELSE 0 END) AS BIGINT)
                       AS nc,
                   CAST(SUM(CASE WHEN z = 1 THEN y ELSE 0 END) AS BIGINT)
                       AS yt,
                   CAST(SUM(CASE WHEN z = 0 THEN y ELSE 0 END) AS BIGINT)
                       AS yc
            FROM users GROUP BY s),
        ladder AS (
            SELECT s, nt, nc,
                   SUM(nt) OVER w AS cnt, SUM(nc) OVER w AS cnc,
                   SUM(yt) OVER w AS cyt, SUM(yc) OVER w AS cyc
            FROM cells
            WINDOW w AS (ORDER BY s DESC ROWS BETWEEN UNBOUNDED
                         PRECEDING AND CURRENT ROW)),
        tot AS (
            SELECT CAST(MAX(cnt) AS BIGINT) AS tnt,
                   CAST(MAX(cnc) AS BIGINT) AS tnc,
                   CAST(MAX(cyt) AS BIGINT) AS tyt,
                   CAST(MAX(cyc) AS BIGINT) AS tyc
            FROM ladder),
        rws AS (
            SELECT l.*, t.tnt, t.tnc, t.tyt, t.tyc,
                   cyt - cyc * (cnt / cnc) AS q,
                   (tyt - tyc * (tnt / tnc))
                       * ((cnt + cnc) / (tnt + tnc)) AS rinc
            FROM ladder l CROSS JOIN tot t),
        coef AS (
            SELECT CAST(SUM(CASE WHEN cnc > 0
                       THEN CAST(FLOOR((q - rinc)
                            * ((nt + nc) / (tnt + tnc))
                            * {_NANO} + 0.5) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS coef_q
            FROM rws)
        SELECT s AS score_threshold,
               CAST(cnt + cnc AS BIGINT) AS n_targeted,
               CASE WHEN cnc > 0 THEN ROUND(q, 4) END AS qini_inc,
               CASE WHEN cnc > 0 THEN ROUND(rinc, 4) END AS random_inc,
               ROUND(coef_q / {_NANO} * 1.0, 6) AS qini_coef
        FROM rws CROSS JOIN coef
    """,
    "ext_pr_curve": f"""
        WITH {_PR_LADDER_SQL},
        l2 AS (
            SELECT clicks, pos, tp, fp,
                   tp / (tp + fp) AS prec,
                   tp / n_pos AS rec, n_pos
            FROM ladder),
        ap AS (
            SELECT CAST(SUM(CAST(FLOOR(pos / n_pos * prec * {_NANO}
                       + 0.5) AS BIGINT)) AS BIGINT) AS ap_q
            FROM l2)
        SELECT clicks AS threshold,
               CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
               ROUND(prec, 6) AS precision,
               ROUND(rec, 6) AS recall,
               ROUND(ap_q / {_NANO} * 1.0, 6) AS average_precision
        FROM l2 CROSS JOIN ap
    """,
    "ext_f1_threshold": f"""
        WITH {_PR_LADDER_SQL},
        l2 AS (
            SELECT clicks, tp, fp, n_pos - tp AS fn,
                   2 * tp / (2 * tp + fp + (n_pos - tp)) AS f1
            FROM ladder)
        SELECT clicks AS best_threshold,
               CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
               CAST(fn AS BIGINT) AS fn,
               ROUND(f1, 6) AS f1
        FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY f1 DESC,
                          clicks DESC) AS rn
              FROM l2) WHERE rn = 1
    """,
    "ext_brier_decomposition": f"""
        WITH ud0 AS ({_UD_SQL}),
        udp AS (SELECT clicks / (clicks + {float(ECE_SMOOTH)}) AS p, y
                FROM ud0),
        binned AS (
            SELECT CAST(LEAST(FLOOR(p * {ECE_BINS}), {ECE_BINS - 1})
                        AS BIGINT) AS bin, p, y
            FROM udp),
        per_bin AS (
            SELECT bin, COUNT(*) AS n_b,
                   CAST(SUM(CAST(FLOOR(p * {_NANO} + 0.5) AS BIGINT))
                        AS BIGINT) AS conf_q,
                   CAST(SUM(y) AS BIGINT) AS pos_b
            FROM binned GROUP BY bin),
        tot AS (SELECT CAST(SUM(n_b) AS BIGINT) AS n,
                       CAST(SUM(pos_b) AS BIGINT) AS n_pos
                FROM per_bin),
        rws AS (
            SELECT n_b,
                   conf_q / {_NANO} / n_b AS conf,
                   pos_b / n_b AS acc,
                   n_pos / n AS base, n
            FROM per_bin CROSS JOIN tot),
        comp AS (
            SELECT CAST(SUM(CAST(FLOOR(n_b / n * (conf - acc)
                       * (conf - acc) * {_NANO} + 0.5) AS BIGINT))
                       AS BIGINT) AS rel_q,
                   CAST(SUM(CAST(FLOOR(n_b / n * (acc - base)
                       * (acc - base) * {_NANO} + 0.5) AS BIGINT))
                       AS BIGINT) AS res_q,
                   MAX(base) AS base_rate
            FROM rws),
        bs AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
                   CAST(SUM(CAST(FLOOR((p - y) * (p - y) * {_NANO}
                       + 0.5) AS BIGINT)) AS BIGINT) AS bs_q
            FROM udp)
        SELECT n_days,
               ROUND(bs_q / {_NANO} / n_days, 6) AS brier,
               ROUND(rel_q / {_NANO} * 1.0, 6) AS reliability,
               ROUND(res_q / {_NANO} * 1.0, 6) AS resolution,
               ROUND(base_rate * (1.0 - base_rate), 6) AS uncertainty
        FROM comp CROSS JOIN bs
    """,
    "ext_segment_auc": """
        WITH users AS (
            SELECT user_id,
                   CAST(SUM(CASE WHEN EXTRACT(day FROM ts) <= 15
                       THEN 1 ELSE 0 END) AS BIGINT) AS s,
                   CAST(SUM(CASE WHEN event_type = 'purchase'
                            AND EXTRACT(day FROM ts) > 15
                            THEN 1 ELSE 0 END) >= 7 AS BIGINT) AS y
            FROM events GROUP BY user_id),
        su AS (
            SELECT u.*, c.c_mktsegment AS segment
            FROM users u JOIN customer c ON c.c_custkey = u.user_id),
        cells AS (
            SELECT segment, s,
                   CAST(SUM(y) AS BIGINT) AS pos,
                   CAST(SUM(1 - y) AS BIGINT) AS neg
            FROM su GROUP BY segment, s),
        ladder AS (
            SELECT segment, pos, neg,
                   COALESCE(SUM(pos + neg) OVER (PARTITION BY segment
                       ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS cum_prev,
                   pos + neg AS t
            FROM cells),
        agg AS (
            SELECT segment,
                   CAST(SUM(pos) AS BIGINT) AS n_pos,
                   CAST(SUM(neg) AS BIGINT) AS n_neg,
                   CAST(SUM(pos * (2 * cum_prev + t + 1)) AS BIGINT)
                       AS sr1_2
            FROM ladder GROUP BY segment)
        SELECT segment, n_pos, n_neg,
               CASE WHEN n_pos > 0 AND n_neg > 0
                    THEN ROUND((sr1_2 - n_pos * (n_pos + 1))
                               / (2 * n_pos * n_neg), 6)
               END AS auc
        FROM agg
    """,
    "ext_offpolicy_ips": f"""
        WITH ev AS (
            SELECT event_type,
                   CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS r
            FROM events),
        freq AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_a
                 FROM ev GROUP BY event_type),
        tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM ev),
        wtd AS (
            SELECT e.r,
                   ({_OPE_TGT_SQL}) / (f.n_a / t.n) AS w,
                   t.n
            FROM ev e JOIN freq f USING (event_type) CROSS JOIN tot t),
        agg AS (
            SELECT CAST(MAX(n) AS BIGINT) AS n_events,
                   CAST(SUM(CAST(FLOOR(r / CAST(100.0 AS DOUBLE) * {_NANO} + 0.5)
                       AS BIGINT)) AS BIGINT) AS vlog_q,
                   CAST(SUM(CAST(FLOOR(r / CAST(100.0 AS DOUBLE) * w * {_NANO} + 0.5)
                       AS BIGINT)) AS BIGINT) AS vips_q,
                   CAST(SUM(CAST(FLOOR(w * {_NANO} + 0.5) AS BIGINT))
                       AS BIGINT) AS w_q,
                   CAST(SUM(CAST(FLOOR(w * w * {_NANO} + 0.5) AS BIGINT))
                       AS BIGINT) AS ww_q
            FROM wtd)
        SELECT n_events,
               ROUND(vlog_q / {_NANO} / n_events, 6) AS v_logged_usd,
               ROUND(vips_q / {_NANO} / n_events, 6) AS v_ips_usd,
               ROUND(vips_q / w_q * 1.0, 6) AS v_snips_usd,
               ROUND(w_q / {_NANO} * (w_q / {_NANO}) / (ww_q / {_NANO}),
                     4) AS ess_weights
        FROM agg
    """,
    "ext_rdd_cutoff": f"""
        WITH users AS (
            SELECT COUNT(*) - {RDD_CUT} AS t,
                   CAST(SUM(CASE WHEN event_type = 'purchase'
                       THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS y
            FROM events GROUP BY user_id),
        band AS (
            SELECT * FROM users
            WHERE t >= -{RDD_BW} AND t <= {RDD_BW}),
        moms AS (
            SELECT {_rdd_side_sql("t < 0", "l")},
                   {_rdd_side_sql("t >= 0", "r")}
            FROM band)
        SELECT n_l AS n_left, n_r AS n_right,
               CASE WHEN (n_l * stt_l - st_l * st_l) != 0
                     AND (n_r * stt_r - st_r * st_r) != 0
                    THEN ROUND(({_RDD_AR} - {_RDD_AL}) / 100.0, 4)
               END AS rd_effect_usd,
               CASE WHEN (n_l * stt_l - st_l * st_l) != 0
                     AND (n_r * stt_r - st_r * st_r) != 0
                    THEN ROUND({_RDD_BL} / 100.0, 6)
               END AS slope_left_usd,
               CASE WHEN (n_l * stt_l - st_l * st_l) != 0
                     AND (n_r * stt_r - st_r * st_r) != 0
                    THEN ROUND({_RDD_BR} / 100.0, 6)
               END AS slope_right_usd
        FROM moms
    """,
    "ext_double_ml_plm": f"""
        WITH users AS (
            SELECT CAST(SUM(CASE WHEN event_type = 'purchase'
                       THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS y,
                   CAST(SUM(CASE WHEN event_type = 'click'
                       THEN 1 ELSE 0 END) AS BIGINT) AS d,
                   CAST(SUM(CASE WHEN event_type = 'view'
                       THEN 1 ELSE 0 END) AS BIGINT) AS x,
                   CAST('0x' || substr(md5('dml:'
                       || CAST(user_id AS VARCHAR)), 1, 15)
                       AS BIGINT) % 2 AS fold
            FROM events GROUP BY user_id),
        mom AS (
            SELECT fold, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS sx,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM(d) AS BIGINT) AS sd,
                   CAST(SUM(x * x) AS BIGINT) AS sxx,
                   CAST(SUM(x * y) AS BIGINT) AS sxy,
                   CAST(SUM(x * d) AS BIGINT) AS sxd
            FROM users GROUP BY fold),
        slopes AS (
            SELECT (1 - fold) AS fold, n, sx, sy, sd,
                   CAST(n * sxy - sx * sy AS DOUBLE)
                       / CAST(n * sxx - sx * sx AS DOUBLE) AS by,
                   CAST(n * sxd - sx * sd AS DOUBLE)
                       / CAST(n * sxx - sx * sx AS DOUBLE) AS bd
            FROM mom),
        co AS (
            SELECT fold, by, bd,
                   (CAST(sy AS DOUBLE) - by * CAST(sx AS DOUBLE))
                       / CAST(n AS DOUBLE) AS ay,
                   (CAST(sd AS DOUBLE) - bd * CAST(sx AS DOUBLE))
                       / CAST(n AS DOUBLE) AS ad
            FROM slopes),
        red AS (
            SELECT (u.y - (c.ay + c.by * u.x)) AS ry,
                   (u.d - (c.ad + c.bd * u.x)) AS rd
            FROM users u JOIN co c ON c.fold = u.fold),
        sums AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
                   CAST(SUM(CAST(FLOOR(ry * rd * {DML_Q} + 0.5)
                       AS BIGINT)) AS BIGINT) AS syd_q,
                   CAST(SUM(CAST(FLOOR(rd * rd * {DML_Q} + 0.5)
                       AS BIGINT)) AS BIGINT) AS sdd_q
            FROM red),
        pooled AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM(d) AS BIGINT) AS sd,
                   CAST(SUM(d * d) AS BIGINT) AS sdd,
                   CAST(SUM(d * y) AS BIGINT) AS sdy
            FROM users)
        SELECT n_users,
               ROUND(syd_q / sdd_q / 100.0, 6) AS theta_usd_per_click,
               ROUND((n * sdy - sd * sy) / (n * sdd - sd * sd)
                     / 100.0, 6) AS naive_usd_per_click
        FROM sums CROSS JOIN pooled
    """,
    "ext_iv_wald": f"""
        WITH users AS (
            SELECT user_id,
                   CAST(SUM(CASE WHEN event_type = 'purchase'
                            THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                            ELSE 0 END) AS BIGINT) AS y,
                   CAST(SUM(CASE WHEN event_type = 'click'
                            THEN 1 ELSE 0 END) >= {IV_CLICK_MIN} AS INT)
                       AS d,
                   CAST('0x' || substr(md5('iv:'
                       || CAST(user_id AS VARCHAR)), 1, 15)
                       AS BIGINT) % 2 AS z
            FROM events GROUP BY user_id),
        agg AS (
            SELECT CAST(SUM(CASE WHEN z = 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n1,
                   CAST(SUM(CASE WHEN z = 0 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n0,
                   CAST(SUM(CASE WHEN z = 1 THEN y ELSE 0 END) AS BIGINT)
                       AS sy1,
                   CAST(SUM(CASE WHEN z = 0 THEN y ELSE 0 END) AS BIGINT)
                       AS sy0,
                   CAST(SUM(CASE WHEN z = 1 THEN d ELSE 0 END) AS BIGINT)
                       AS sd1,
                   CAST(SUM(CASE WHEN z = 0 THEN d ELSE 0 END) AS BIGINT)
                       AS sd0
            FROM users)
        SELECT n1 + n0 AS n_users,
               ROUND((sy1 / n1 - sy0 / n0) / 100.0, 4) AS itt_usd,
               ROUND(sd1 / n1 - sd0 / n0, 6) AS first_stage,
               CASE WHEN sd1 / n1 - sd0 / n0 != 0
                    THEN ROUND((sy1 / n1 - sy0 / n0)
                               / (sd1 / n1 - sd0 / n0) / 100.0, 4)
                    END AS wald_iv_usd
        FROM agg
    """,
    "ext_sprt_monitor": f"""
        WITH ud AS (
            SELECT strftime(ts, '%Y-%m-%d') AS day, user_id,
                   MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       AS conv
            FROM events GROUP BY 1, 2),
        daily AS (
            SELECT day, COUNT(*) AS n_userdays,
                   CAST(SUM(conv) AS BIGINT) AS n_conv
            FROM ud GROUP BY day),
        cum AS (
            SELECT *,
                   SUM(CAST(FLOOR((n_conv
                       * CAST({SPRT_LLR_CONV!r} AS DOUBLE)
                       + (n_userdays - n_conv)
                       * CAST({SPRT_LLR_FAIL!r} AS DOUBLE))
                       * {_NANO} + 0.5) AS BIGINT))
                       OVER (ORDER BY day ROWS BETWEEN UNBOUNDED
                             PRECEDING AND CURRENT ROW) AS llr_q
            FROM daily)
        SELECT day, n_userdays, n_conv,
               ROUND(llr_q / {_NANO} * 1.0, 6) AS cum_llr,
               CASE WHEN llr_q / {_NANO}
                         >= CAST({SPRT_LOG_A!r} AS DOUBLE)
                    THEN 'accept_h1'
                    WHEN llr_q / {_NANO}
                         <= CAST({SPRT_LOG_B!r} AS DOUBLE)
                    THEN 'accept_h0'
                    ELSE 'continue' END AS decision
        FROM cum
    """,
    "ext_psi_drift": oracle_shared.PSI_DRIFT_ORACLE,
    "ext_wasserstein_distance": f"""
        WITH ev AS (
            SELECT CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v,
                   event_type = 'click' AS is_a
            FROM events WHERE event_type IN ('click', 'purchase')),
        cells AS (
            SELECT v,
                   CAST(SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT)
                       AS ca,
                   CAST(SUM(CASE WHEN is_a THEN 0 ELSE 1 END) AS BIGINT)
                       AS cb
            FROM ev GROUP BY v),
        tot AS (
            SELECT CAST(SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT)
                       AS na,
                   CAST(SUM(CASE WHEN is_a THEN 0 ELSE 1 END) AS BIGINT)
                       AS nb
            FROM ev),
        ladder AS (
            SELECT v,
                   SUM(ca) OVER (ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cum_a,
                   SUM(cb) OVER (ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cum_b,
                   LEAD(v) OVER (ORDER BY v) AS next_v
            FROM cells)
        SELECT na AS n_click, nb AS n_purchase,
               ROUND(CAST(SUM(CAST(FLOOR((next_v - v)
                       * ABS(cum_a / na - cum_b / nb) * {_NANO} + 0.5)
                       AS BIGINT)) AS BIGINT) / {_NANO} / 100.0, 6)
                   AS w1_usd
        FROM ladder CROSS JOIN tot
        WHERE next_v IS NOT NULL
        GROUP BY na, nb
    """,
    "ext_quantile_normalize": """
        WITH ev AS (
            SELECT event_id, event_type,
                   CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v
            FROM events),
        ng AS (SELECT event_type, COUNT(*) AS n_g FROM ev GROUP BY 1),
        nt AS (SELECT COUNT(*) AS n_tot FROM ev),
        ranked AS (
            SELECT e.event_id, e.event_type, e.v,
                   ROW_NUMBER() OVER (PARTITION BY e.event_type
                                      ORDER BY e.v, e.event_id) AS r,
                   g.n_g, t.n_tot
            FROM ev e JOIN ng g USING (event_type) CROSS JOIN nt t),
        pooled AS (
            SELECT CAST(ROW_NUMBER() OVER (ORDER BY v, event_id)
                        AS BIGINT) AS k,
                   v AS pv
            FROM ev),
        keyed AS (
            SELECT event_id, event_type, v AS orig_cents,
                   GREATEST(1, LEAST(n_tot,
                       CAST(FLOOR((2 * r - 1) * n_tot / (2 * n_g))
                            AS BIGINT) + 1)) AS k
            FROM ranked)
        SELECT event_id, event_type, orig_cents, pv AS norm_cents
        FROM keyed JOIN pooled USING (k)
    """,
    "ext_aipw_ate": f"""
        WITH users AS (
            SELECT user_id,
                   CAST(SUM(CASE WHEN event_type = 'purchase'
                            THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                            ELSE 0 END) AS BIGINT) AS y,
                   CASE WHEN SUM(CASE WHEN event_type = 'click'
                                 THEN 1 ELSE 0 END) > 12
                        THEN 1 ELSE 0 END AS d,
                   CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                        AS BIGINT) AS x
            FROM events GROUP BY user_id),
        levels AS (
            SELECT x, COUNT(*) AS nl, CAST(SUM(d) AS BIGINT) AS nl1
            FROM users GROUP BY x),
        overlap AS (
            SELECT x, nl, nl1 FROM levels WHERE nl1 > 0 AND nl1 < nl),
        uo AS (
            SELECT u.y, u.d, u.x, o.nl, o.nl1
            FROM users u JOIN overlap o USING (x)),
        mom AS (
            SELECT COUNT(*) AS n_overlap,
                   {", ".join(
                       f"CAST(SUM(CASE WHEN d = {arm} THEN {expr} "
                       f"ELSE 0 END) AS BIGINT) AS {tag}{arm}"
                       for arm in (1, 0)
                       for tag, expr in (
                           ("n", "1"), ("sx", "x"), ("sy", "y"),
                           ("sxx", "x * x"), ("sxy", "x * y"),
                       )
                   )}
            FROM uo),
        co AS (
            SELECT *,
                   (CAST(n1 AS DOUBLE) * CAST(sxy1 AS DOUBLE)
                    - CAST(sx1 AS DOUBLE) * CAST(sy1 AS DOUBLE))
                   / (CAST(n1 AS DOUBLE) * CAST(sxx1 AS DOUBLE)
                      - CAST(sx1 AS DOUBLE) * CAST(sx1 AS DOUBLE)) AS b1,
                   (CAST(n0 AS DOUBLE) * CAST(sxy0 AS DOUBLE)
                    - CAST(sx0 AS DOUBLE) * CAST(sy0 AS DOUBLE))
                   / (CAST(n0 AS DOUBLE) * CAST(sxx0 AS DOUBLE)
                      - CAST(sx0 AS DOUBLE) * CAST(sx0 AS DOUBLE)) AS b0
            FROM mom),
        co2 AS (
            SELECT *,
                   (CAST(sy1 AS DOUBLE) - b1 * CAST(sx1 AS DOUBLE))
                       / CAST(n1 AS DOUBLE) AS a1,
                   (CAST(sy0 AS DOUBLE) - b0 * CAST(sx0 AS DOUBLE))
                       / CAST(n0 AS DOUBLE) AS a0
            FROM co),
        psi AS (
            SELECT uo.*,
                   (a1 + b1 * x) AS mu1, (a0 + b0 * x) AS mu0,
                   CAST(nl1 AS DOUBLE) / CAST(nl AS DOUBLE) AS e
            FROM uo CROSS JOIN co2),
        red AS (
            SELECT CAST(SUM(CAST(FLOOR(
                       ((mu1 - mu0)
                        + d * (y - mu1) / e
                        - (1 - d) * (y - mu0) / (1 - e)) * {AIPW_Q}
                       + 0.5) AS BIGINT)) AS BIGINT) AS psi_q
            FROM psi),
        naive AS (
            SELECT COUNT(*) AS n_users,
                   CAST(SUM(CASE WHEN d = 1 THEN y ELSE 0 END) AS BIGINT)
                       AS ny1,
                   CAST(SUM(d) AS BIGINT) AS nd1,
                   CAST(SUM(CASE WHEN d = 0 THEN y ELSE 0 END) AS BIGINT)
                       AS ny0,
                   CAST(SUM(1 - d) AS BIGINT) AS nd0
            FROM users)
        SELECT n_users, n_overlap, psi_q,
               CAST(psi_q AS DOUBLE)
                   / CAST(n_overlap * {AIPW_Q} * 100 AS DOUBLE)
                   AS aipw_ate_usd,
               CAST(ny1 AS DOUBLE) / CAST(nd1 AS DOUBLE)
                   - CAST(ny0 AS DOUBLE) / CAST(nd0 AS DOUBLE)
                   AS naive_diff_cents
        FROM red CROSS JOIN (SELECT n_overlap FROM mom) m
        CROSS JOIN naive
    """,
    "ext_isotonic_calibration": """
        WITH ud AS (
            SELECT user_id, CAST(ts AS DATE) AS day,
                   SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                       AS clicks,
                   MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       AS y
            FROM events GROUP BY 1, 2),
        ladder AS (
            SELECT CAST(clicks AS BIGINT) AS clicks, COUNT(*) AS n,
                   CAST(SUM(y) AS BIGINT) AS pos
            FROM ud GROUP BY 1),
        pre AS (
            SELECT clicks, n, pos,
                   CAST(SUM(n) OVER (ORDER BY clicks) AS BIGINT) AS cn,
                   CAST(SUM(pos) OVER (ORDER BY clicks) AS BIGINT) AS cs
            FROM ladder),
        intervals AS (
            SELECT a.clicks AS j, b.clicks AS k,
                   CAST(b.cs - a.cs + a.pos AS DOUBLE)
                       / CAST(b.cn - a.cn + a.n AS DOUBLE) AS avg_jk
            FROM pre a JOIN pre b ON a.clicks <= b.clicks),
        inner_m AS (
            SELECT i.clicks AS i, v.j, MIN(v.avg_jk) AS m_ij
            FROM intervals v
            JOIN pre i ON v.j <= i.clicks AND i.clicks <= v.k
            GROUP BY 1, 2),
        iso AS (SELECT i, MAX(m_ij) AS iso_p FROM inner_m GROUP BY 1)
        SELECT p.clicks, p.n, p.pos,
               CAST(p.pos AS DOUBLE) / CAST(p.n AS DOUBLE) AS raw_rate,
               iso.iso_p
        FROM pre p JOIN iso ON p.clicks = iso.i
    """,
    "ext_calibration_ece": f"""
        WITH ud AS (
            SELECT user_id, CAST(ts AS DATE) AS day,
                   SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                       AS clicks,
                   MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       AS y
            FROM events GROUP BY 1, 2),
        scoredp AS (
            SELECT clicks / (clicks + {float(ECE_SMOOTH)}) AS p, y FROM ud),
        binned AS (
            SELECT CAST(LEAST(FLOOR(p * {ECE_BINS}), {ECE_BINS - 1})
                        AS BIGINT) AS bin, p, y
            FROM scoredp),
        per_bin AS (
            SELECT bin, COUNT(*) AS n_days,
                   CAST(SUM(CAST(FLOOR(p * {_NANO} + 0.5) AS BIGINT))
                        AS BIGINT) AS conf_q,
                   CAST(SUM(y) AS BIGINT) AS n_pos
            FROM binned GROUP BY bin),
        tot AS (SELECT CAST(SUM(n_days) AS BIGINT) AS n_total
                FROM per_bin),
        rws AS (
            SELECT bin, n_days,
                   conf_q / {_NANO} / n_days AS conf,
                   n_pos / n_days AS acc,
                   n_total
            FROM per_bin CROSS JOIN tot),
        ece AS (
            SELECT CAST(SUM(CAST(FLOOR(n_days / n_total
                       * ABS(acc - conf) * {_NANO} + 0.5) AS BIGINT))
                       AS BIGINT) AS ece_q
            FROM rws)
        SELECT bin, CAST(n_days AS BIGINT) AS n_days,
               ROUND(conf, 6) AS conf, ROUND(acc, 6) AS acc,
               ROUND(ece_q / {_NANO} * 1.0, 6) AS ece
        FROM rws CROSS JOIN ece
    """,
    "ext_propensity_match": f"""
        WITH users AS (
            SELECT user_id, COUNT(*) AS a,
                   CAST(SUM(CASE WHEN event_type = 'purchase'
                            THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                            ELSE 0 END) AS BIGINT) AS x,
                   CAST('0x' || substr(md5('arm:'
                       || CAST(user_id AS VARCHAR)), 1, 15)
                       AS BIGINT) % 2 AS arm
            FROM events GROUP BY user_id),
        ctrl AS (
            SELECT a, COUNT(*) AS n_c, CAST(SUM(x) AS BIGINT) AS sx
            FROM users WHERE arm = 0 GROUP BY a),
        strm AS (
            SELECT a, 0 AS tag, CAST(-1 AS BIGINT) AS user_id,
                   CAST(NULL AS BIGINT) AS x, a AS ctrl_a
            FROM ctrl
            UNION ALL
            SELECT a, 1 AS tag, user_id, x, CAST(NULL AS BIGINT) AS ctrl_a
            FROM users WHERE arm = 1),
        win AS (
            SELECT *,
                   LAST_VALUE(ctrl_a IGNORE NULLS) OVER (
                       ORDER BY a, tag, user_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS prev_a,
                   LAST_VALUE(ctrl_a IGNORE NULLS) OVER (
                       ORDER BY a DESC, tag, user_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS next_a
            FROM strm),
        matched AS (
            SELECT user_id, a, x,
                   CASE WHEN prev_a IS NULL THEN next_a
                        WHEN next_a IS NULL THEN prev_a
                        WHEN a - prev_a <= next_a - a THEN prev_a
                        ELSE next_a END AS m_a
            FROM win WHERE tag = 1)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_treated,
               ROUND(CAST(SUM(CAST(FLOOR((x - sx / n_c) * {_NANO} + 0.5)
                       AS BIGINT)) AS DOUBLE)
                   / {_NANO} / COUNT(*) / 100.0, 4) AS att_usd,
               ROUND(CAST(SUM(ABS(m.a - m.m_a)) AS DOUBLE) / COUNT(*), 6)
                   AS avg_abs_gap
        FROM matched m JOIN ctrl c ON c.a = m.m_a
    """,
    "ext_conformal_interval": f"""
        WITH ev AS (
            SELECT CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c,
                   CAST('0x' || substr(md5('conf:'
                       || CAST(event_id AS VARCHAR)), 1, 15)
                       AS BIGINT) % 2 = 0 AS cal
            FROM events WHERE event_type = 'purchase'),
        mu AS (
            SELECT CAST(FLOOR(SUM(c) / COUNT(*) + 0.5) AS BIGINT)
                       AS mu,
                   COUNT(*) AS n_cal
            FROM ev WHERE cal),
        resid AS (
            SELECT ABS(c - mu) AS r FROM ev CROSS JOIN mu WHERE cal),
        cells AS (SELECT r, COUNT(*) AS k FROM resid GROUP BY r),
        ladder AS (
            SELECT r,
                   COALESCE(SUM(k) OVER (ORDER BY r
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS cum_prev,
                   SUM(k) OVER (ORDER BY r
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS cum
            FROM cells),
        radius AS (
            SELECT r AS radius
            FROM ladder CROSS JOIN mu
            WHERE cum_prev < CAST(CEIL((n_cal + 1)
                                       * {1.0 - CONF_ALPHA!r})
                                  AS BIGINT)
              AND CAST(CEIL((n_cal + 1) * {1.0 - CONF_ALPHA!r})
                       AS BIGINT) <= cum),
        cov AS (
            SELECT cal, COUNT(*) AS n,
                   CAST(SUM(CASE WHEN ABS(c - mu) <= radius
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_in
            FROM ev CROSS JOIN mu CROSS JOIN radius
            GROUP BY cal)
        SELECT mu.n_cal,
               (SELECT n FROM cov WHERE NOT cal) AS n_test,
               ROUND(mu / 100.0, 2) AS pred_usd,
               ROUND(radius / 100.0, 2) AS radius_usd,
               ROUND((SELECT n_in FROM cov WHERE cal)
                     / (SELECT n FROM cov WHERE cal), 4)
                   AS coverage_cal,
               ROUND((SELECT n_in FROM cov WHERE NOT cal)
                     / (SELECT n FROM cov WHERE NOT cal), 4)
                   AS coverage_test
        FROM mu CROSS JOIN radius
    """,
    "ext_experiment_health": """
        WITH ud AS (
            SELECT DISTINCT user_id, strftime(ts, '%Y-%m-%d') AS day
            FROM events),
        armed AS (
            SELECT day,
                   CAST('0x' || substr(md5('arm:'
                       || CAST(user_id AS VARCHAR)), 1, 15)
                       AS BIGINT) % 2 AS arm
            FROM ud),
        tot AS (
            SELECT CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n1,
                   CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n0
            FROM armed),
        daily AS (
            SELECT day,
                   SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS d1,
                   COUNT(*) AS dn
            FROM armed GROUP BY day),
        worst AS (
            SELECT MAX(ABS(d1 / dn - 0.5)) AS worst_daily_imbalance
            FROM daily)
        SELECT n1 AS n_arm1_user_days, n0 AS n_arm0_user_days,
               ROUND(CAST((n1 - n0) * (n1 - n0) AS DOUBLE)
                     / (n1 + n0), 4) AS srm_chi2,
               CAST((n1 - n0) * (n1 - n0) AS DOUBLE) / (n1 + n0)
                   > 3.841 AS srm_fail,
               ROUND(worst_daily_imbalance, 4)
                   AS worst_daily_imbalance
        FROM tot CROSS JOIN worst
    """,
    "ext_hill_tail_index": f"""
        WITH rev AS (
            SELECT o_custkey,
                   CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5)
                                 AS BIGINT)) AS BIGINT) AS cents
            FROM orders GROUP BY o_custkey
            HAVING SUM(CAST(FLOOR(o_totalprice * 100 + 0.5)
                            AS BIGINT)) > 0),
        top AS (SELECT * FROM rev
                ORDER BY cents DESC, o_custkey LIMIT {HILL_K + 1}),
        ref AS (SELECT MIN(cents) AS x_ref FROM top),
        tail AS (SELECT cents, x_ref FROM top CROSS JOIN ref
                 WHERE cents > x_ref),
        agg AS (
            SELECT COUNT(*) AS k_used,
                   CAST(SUM(CAST(FLOOR(LN(CAST(cents AS DOUBLE)
                                           / x_ref)
                        * {_NANO} + 0.5) AS BIGINT)) AS BIGINT) AS lq
            FROM tail)
        SELECT k_used,
               ROUND(x_ref / 100.0, 2) AS x_ref_usd,
               ROUND(k_used / (lq / {_NANO}), 4) AS hill_alpha
        FROM agg CROSS JOIN ref
    """,
    "ext_price_elasticity": f"""
        WITH lx AS (
            SELECT p_brand,
                   LN(l_extendedprice / l_quantity) AS x,
                   LN(CAST(l_quantity AS DOUBLE)) AS y
            FROM lineitem
            JOIN part ON p_partkey = l_partkey),
        m AS (
            SELECT p_brand, COUNT(*) AS n,
                   CAST(SUM(CAST(FLOOR(x * {_NANO} + 0.5) AS BIGINT))
                        AS BIGINT) AS sx,
                   CAST(SUM(CAST(FLOOR(y * {_NANO} + 0.5) AS BIGINT))
                        AS BIGINT) AS sy,
                   CAST(SUM(CAST(FLOOR(x * y * {_NANO} + 0.5)
                                 AS BIGINT)) AS BIGINT) AS sxy,
                   CAST(SUM(CAST(FLOOR(x * x * {_NANO} + 0.5)
                                 AS BIGINT)) AS BIGINT) AS sxx
            FROM lx GROUP BY p_brand)
        SELECT p_brand, n AS n_lines,
               ROUND((CAST(n AS DOUBLE) * (sxy / {_NANO})
                      - (sx / {_NANO}) * (sy / {_NANO}))
                     / (CAST(n AS DOUBLE) * (sxx / {_NANO})
                        - (sx / {_NANO}) * (sx / {_NANO})), 4)
                   AS elasticity,
               ROUND((CAST(n AS DOUBLE) * (sxy / {_NANO})
                      - (sx / {_NANO}) * (sy / {_NANO}))
                     / (CAST(n AS DOUBLE) * (sxx / {_NANO})
                        - (sx / {_NANO}) * (sx / {_NANO})), 4) < -1.0
                   AS elastic
        FROM m
    """,
    "ext_stratified_effect": f"""
        WITH users AS (
            SELECT user_id,
                   CAST(SUM(CASE WHEN event_type = 'purchase'
                            THEN CAST(FLOOR(value * 100 + 0.5)
                                      AS BIGINT)
                            ELSE 0 END) AS BIGINT) AS x,
                   CAST('0x' || substr(md5('arm:'
                       || CAST(user_id AS VARCHAR)), 1, 15)
                       AS BIGINT) % 2 AS arm
            FROM events GROUP BY user_id),
        joined AS (
            SELECT u.*, c.c_mktsegment
            FROM users u JOIN customer c ON c.c_custkey = u.user_id),
        per_seg AS (
            SELECT c_mktsegment, COUNT(*) AS n_seg,
                   CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n1,
                   CAST(SUM(CASE WHEN arm = 1 THEN x ELSE 0 END)
                        AS BIGINT) AS s1,
                   CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n0,
                   CAST(SUM(CASE WHEN arm = 0 THEN x ELSE 0 END)
                        AS BIGINT) AS s0
            FROM joined GROUP BY c_mktsegment
            HAVING SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) > 0
               AND SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) > 0),
        ntot AS (SELECT CAST(SUM(n_seg) AS BIGINT) AS nt
                 FROM per_seg),
        strat AS (
            SELECT CAST(SUM(CAST(FLOOR(n_seg / nt
                       * (s1 / n1 - s0 / n0) * {_NANO} + 0.5)
                       AS BIGINT)) AS BIGINT) AS ate_q,
                   CAST(SUM(n_seg) AS BIGINT) AS n_used
            FROM per_seg CROSS JOIN ntot),
        pooled AS (
            SELECT SUM(CASE WHEN arm = 1 THEN x ELSE 0 END)
                   / SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END)
                   - SUM(CASE WHEN arm = 0 THEN x ELSE 0 END)
                     / SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END)
                       AS pooled
            FROM joined)
        SELECT n_used AS n_users,
               ROUND(ate_q / {_NANO} / 100.0, 4)
                   AS stratified_ate_usd,
               ROUND(pooled / 100.0, 4) AS pooled_diff_usd
        FROM strat CROSS JOIN pooled
    """,
    "ext_quantile_treatment_effect": f"""
        WITH ev AS (
            SELECT CAST('0x' || substr(md5('arm:'
                       || CAST(user_id AS VARCHAR)), 1, 15)
                       AS BIGINT) % 2 AS arm,
                   CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c
            FROM events WHERE event_type = 'purchase'),
        m AS (
            SELECT arm, COUNT(*) AS n,
                   {", ".join(
                       f"ROUND(quantile_cont(c, {p!r}), 6)"
                       f" AS q_{int(p * 100)}"
                       for p in QTE_PS
                   )}
            FROM ev GROUP BY arm),
        wide AS (
            SELECT a1.n AS n1, a0.n AS n0,
                   {", ".join(
                       f"a1.q_{int(p * 100)} AS t_{int(p * 100)}, "
                       f"a0.q_{int(p * 100)} AS c_{int(p * 100)}"
                       for p in QTE_PS
                   )}
            FROM (SELECT * FROM m WHERE arm = 1) a1
            CROSS JOIN (SELECT * FROM m WHERE arm = 0) a0)
        {" UNION ALL ".join(
            f'''SELECT CAST({int(p * 100)} AS BIGINT) AS pct, n1, n0,
                   ROUND(t_{int(p * 100)} / 100.0, 4) AS treat_usd,
                   ROUND(c_{int(p * 100)} / 100.0, 4) AS ctrl_usd,
                   ROUND((t_{int(p * 100)} - c_{int(p * 100)})
                         / 100.0, 4) AS qte_usd
            FROM wide'''
            for p in QTE_PS
        )}
    """,
    "ext_churn_features": f"""
        WITH ev AS (
            SELECT user_id, event_type,
                   strftime(ts, '%Y-%m-%d') AS day,
                   CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
            FROM events)
        SELECT user_id,
               CAST(SUM(CASE WHEN day < '{CHURN_CUT}'
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_events_pre,
               CAST(SUM(CASE WHEN day < '{CHURN_CUT}'
                                  AND event_type = 'purchase'
                             THEN cents ELSE 0 END) AS BIGINT)
                   AS spend_pre_cents,
               CAST(COUNT(DISTINCT CASE WHEN day < '{CHURN_CUT}'
                                        THEN day END) AS BIGINT)
                   AS active_days_pre,
               CAST(datediff('day',
                    CAST(MAX(CASE WHEN day < '{CHURN_CUT}'
                             THEN day END) AS DATE),
                    DATE '{CHURN_CUT}') AS BIGINT) AS recency_days,
               CAST(1 - MAX(CASE WHEN day >= '{CHURN_CUT}'
                                 THEN 1 ELSE 0 END) AS BIGINT)
                   AS churned
        FROM ev GROUP BY user_id
        HAVING SUM(CASE WHEN day < '{CHURN_CUT}'
                        THEN 1 ELSE 0 END) > 0
    """,
    "ext_target_encoding": f"""
        WITH users AS (
            SELECT user_id,
                   MAX(CASE WHEN event_type = 'purchase'
                            THEN 1 ELSE 0 END) AS y
            FROM events GROUP BY user_id),
        joined AS (
            SELECT u.*, c.c_mktsegment
            FROM users u JOIN customer c ON c.c_custkey = u.user_id),
        cat AS (
            SELECT c_mktsegment, COUNT(*) AS n,
                   CAST(SUM(y) AS BIGINT) AS s
            FROM joined GROUP BY c_mktsegment),
        prior AS (
            SELECT SUM(y) / COUNT(*) AS mu FROM joined)
        SELECT c_mktsegment, n,
               ROUND(s / n, 6) AS raw_rate,
               ROUND((s + {TE_SMOOTH_M!r} * mu) / (n + {TE_SMOOTH_M!r}),
                     6) AS encoded,
               ROUND(mu, 6) AS prior
        FROM cat CROSS JOIN prior
    """,
    "ext_decayed_engagement": f"""
        WITH ev AS (
            SELECT user_id, event_type, CAST(ts AS DATE) AS day,
                   CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
            FROM events),
        anchor AS (SELECT MAX(day) AS d0 FROM ev),
        aged AS (
            SELECT user_id, event_type, cents,
                   POW(2.0, -datediff('day', day, d0)
                             / {DECAY_HALF_LIFE_D!r}) AS w
            FROM ev CROSS JOIN anchor),
        scored AS (
            SELECT user_id, COUNT(*) AS n_events,
                   CAST(SUM(CAST(FLOOR(w * {_NANO} + 0.5) AS BIGINT))
                        AS BIGINT) AS eng_q,
                   CAST(SUM(CAST(FLOOR(CASE WHEN event_type = 'purchase'
                                 THEN w * cents / 100.0 ELSE 0.0 END
                                 * {_NANO} + 0.5) AS BIGINT))
                        AS BIGINT) AS rev_q
            FROM aged GROUP BY user_id)
        SELECT user_id, n_events,
               ROUND(eng_q / {_NANO}, 4) AS decayed_events,
               ROUND(rev_q / {_NANO}, 4) AS decayed_rev_usd
        FROM scored
        ORDER BY decayed_events DESC, user_id LIMIT {DECAY_TOPK}
    """,
    "ext_simpson_screen": """
        WITH users AS (
            SELECT user_id,
                   MAX(CASE WHEN event_type = 'purchase'
                            THEN 1 ELSE 0 END) AS converted,
                   CAST('0x' || substr(md5('arm:'
                       || CAST(MIN(user_id) AS VARCHAR)), 1, 15)
                       AS BIGINT) % 2 AS arm
            FROM events GROUP BY user_id),
        joined AS (
            SELECT u.*, c.c_mktsegment
            FROM users u
            JOIN customer c ON c.c_custkey = u.user_id),
        per_seg AS (
            SELECT c_mktsegment,
                   CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n1,
                   CAST(SUM(CASE WHEN arm = 1 THEN converted
                            ELSE 0 END) AS BIGINT) AS c1,
                   CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n0,
                   CAST(SUM(CASE WHEN arm = 0 THEN converted
                            ELSE 0 END) AS BIGINT) AS c0
            FROM joined GROUP BY c_mktsegment
            HAVING SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) > 0
               AND SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) > 0),
        pooled AS (
            SELECT SUM(CASE WHEN arm = 1 THEN converted ELSE 0 END)
                   / SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END)
                   - SUM(CASE WHEN arm = 0 THEN converted ELSE 0 END)
                     / SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END)
                       AS pooled_diff
            FROM joined)
        SELECT c_mktsegment, n1, n0,
               ROUND(c1 / n1, 6) AS rate1,
               ROUND(c0 / n0, 6) AS rate0,
               ROUND(c1 / n1 - c0 / n0, 6) AS seg_diff,
               ROUND(pooled_diff, 6) AS pooled_diff,
               SIGN(c1 / n1 - c0 / n0) <> SIGN(pooled_diff)
                   AS reversed
        FROM per_seg CROSS JOIN pooled
    """,
    "ext_permutation_test": f"""
        WITH per_user AS (
            SELECT user_id,
                   CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS x
            FROM events WHERE event_type = 'purchase'
            GROUP BY user_id),
        obs AS (
            SELECT COUNT(*) AS n_users,
                   SUM(CASE WHEN arm = 1 THEN x ELSE 0 END)
                   / SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END)
                   - SUM(CASE WHEN arm = 0 THEN x ELSE 0 END)
                     / SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS obs
            FROM (SELECT x,
                         CAST('0x' || substr(md5('arm:'
                             || CAST(user_id AS VARCHAR)), 1, 15)
                             AS BIGINT) % 2 AS arm
                  FROM per_user)),
        reps AS (
            SELECT b, x,
                   CAST('0x' || substr(md5('perm:'
                       || CAST(user_id AS VARCHAR) || '#'
                       || CAST(b AS VARCHAR)), 1, 15)
                       AS BIGINT) % 2 AS arm
            FROM per_user
            CROSS JOIN (SELECT UNNEST(range(1, {PERM_B} + 1)) AS b)),
        stats AS (
            SELECT b,
                   SUM(CASE WHEN arm = 1 THEN x ELSE 0 END)
                   / SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END)
                   - SUM(CASE WHEN arm = 0 THEN x ELSE 0 END)
                     / SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END)
                       AS stat
            FROM reps GROUP BY b),
        extreme AS (
            SELECT CAST(SUM(CASE WHEN ABS(stat) >= ABS(obs)
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_extreme
            FROM stats CROSS JOIN obs)
        SELECT n_users,
               ROUND(obs / 100.0, 4) AS obs_diff_usd,
               CAST({PERM_B} AS BIGINT) AS n_perms,
               ROUND((n_extreme + 1.0) / ({PERM_B} + 1.0), 4)
                   AS p_value
        FROM obs CROSS JOIN extreme
    """,
    "ext_journey_entropy": f"""
        WITH ev AS (
            SELECT user_id, event_type, epoch_us(ts) AS ts_us,
                   event_id
            FROM events),
        bi AS (
            SELECT cur, nxt, COUNT(*) AS c
            FROM (SELECT event_type AS cur,
                         LEAD(event_type, 1) OVER (
                             PARTITION BY user_id
                             ORDER BY ts_us, event_id) AS nxt
                  FROM ev)
            WHERE nxt IS NOT NULL GROUP BY cur, nxt),
        outc AS (
            SELECT cur, CAST(SUM(c) AS BIGINT) AS ci,
                   COUNT(*) AS n_branches
            FROM bi GROUP BY cur),
        h AS (
            SELECT cur,
                   CAST(SUM(CAST(FLOOR(-(c / ci) * LN(c / ci)
                            * {_NANO} + 0.5) AS BIGINT)) AS BIGINT)
                       AS hq
            FROM bi JOIN outc USING (cur) GROUP BY cur)
        SELECT h.cur, ci AS n_transitions, n_branches,
               ROUND(hq / {_NANO}, 6) AS h_nats,
               ROUND(CASE WHEN n_branches > 1
                          THEN hq / {_NANO}
                               / LN(CAST(n_branches AS DOUBLE))
                          ELSE 0.0 END, 6) AS h_norm
        FROM h JOIN outc USING (cur)
    """,
    "ext_shapley_attribution": """
        WITH ev AS (
            SELECT user_id, event_type, epoch_us(ts) AS ts_us
            FROM events),
        first_buy AS (
            SELECT user_id, MIN(ts_us) AS t_buy FROM ev
            WHERE event_type = 'purchase' GROUP BY user_id),
        flags AS (
            SELECT ev.user_id,
                   MAX(CASE WHEN event_type = 'click'
                            THEN 1 ELSE 0 END) AS f0,
                   MAX(CASE WHEN event_type = 'view'
                            THEN 1 ELSE 0 END) AS f1,
                   MAX(CASE WHEN event_type = 'signup'
                            THEN 1 ELSE 0 END) AS f2
            FROM ev JOIN first_buy USING (user_id)
            WHERE ts_us < t_buy
            GROUP BY ev.user_id
            HAVING MAX(CASE WHEN event_type = 'click'
                            THEN 1 ELSE 0 END)
                 + MAX(CASE WHEN event_type = 'view'
                            THEN 1 ELSE 0 END)
                 + MAX(CASE WHEN event_type = 'signup'
                            THEN 1 ELSE 0 END) > 0),
        one AS (
            SELECT
                SUM(CASE WHEN f0=1 AND f1=0 AND f2=0 THEN 1 ELSE 0 END) AS cA,
                SUM(CASE WHEN f0=0 AND f1=1 AND f2=0 THEN 1 ELSE 0 END) AS cB,
                SUM(CASE WHEN f0=0 AND f1=0 AND f2=1 THEN 1 ELSE 0 END) AS cC,
                SUM(CASE WHEN f0=1 AND f1=1 AND f2=0 THEN 1 ELSE 0 END) AS cAB,
                SUM(CASE WHEN f0=1 AND f1=0 AND f2=1 THEN 1 ELSE 0 END) AS cAC,
                SUM(CASE WHEN f0=0 AND f1=1 AND f2=1 THEN 1 ELSE 0 END) AS cBC,
                SUM(CASE WHEN f0=1 AND f1=1 AND f2=1 THEN 1 ELSE 0 END) AS cABC
            FROM flags),
        sh AS (
            SELECT
                2*cA + (cA+cB+cAB - cB) + (cA+cC+cAC - cC)
                + 2*((cA+cB+cC+cAB+cAC+cBC+cABC) - (cB+cC+cBC))
                    AS s6_click,
                2*cB + (cA+cB+cAB - cA) + (cB+cC+cBC - cC)
                + 2*((cA+cB+cC+cAB+cAC+cBC+cABC) - (cA+cC+cAC))
                    AS s6_view,
                2*cC + (cA+cC+cAC - cA) + (cB+cC+cBC - cB)
                + 2*((cA+cB+cC+cAB+cAC+cBC+cABC) - (cA+cB+cAB))
                    AS s6_signup,
                CAST(cA+cB+cC+cAB+cAC+cBC+cABC AS BIGINT)
                    AS total_conv
            FROM one)
        SELECT channel, ROUND(s6 / 6.0, 4) AS shapley_conversions,
               total_conv
        FROM (
            SELECT 'click' AS channel, CAST(s6_click AS BIGINT) AS s6,
                   total_conv FROM sh
            UNION ALL
            SELECT 'view', CAST(s6_view AS BIGINT), total_conv FROM sh
            UNION ALL
            SELECT 'signup', CAST(s6_signup AS BIGINT), total_conv
            FROM sh)
    """,
    "ext_mann_kendall_trend": """
        WITH daily AS (
            SELECT datediff('day', DATE '1970-01-01',
                            CAST(o_orderdate AS DATE)) AS xd,
                   CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5)
                                 AS BIGINT)) AS BIGINT) AS rev
            FROM orders GROUP BY 1),
        s AS (
            SELECT CAST(SUM(CASE WHEN b.rev > a.rev THEN 1
                                 WHEN b.rev < a.rev THEN -1
                                 ELSE 0 END) AS BIGINT) AS s_stat
            FROM daily a JOIN daily b ON a.xd < b.xd),
        ties AS (
            SELECT CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT)
                   AS tie_term
            FROM (SELECT COUNT(*) AS t FROM daily GROUP BY rev)),
        nn AS (SELECT COUNT(*) AS n_days FROM daily),
        g AS (
            SELECT n_days, s_stat,
                   n_days * (n_days - 1) * (2 * n_days + 5) - tie_term
                       AS var18
            FROM s CROSS JOIN ties CROSS JOIN nn)
        SELECT n_days, s_stat, var18,
               CASE WHEN s_stat > 0 THEN
                        CAST(s_stat - 1 AS DOUBLE)
                        / SQRT(CAST(var18 AS DOUBLE) / 18.0)
                    WHEN s_stat < 0 THEN
                        CAST(s_stat + 1 AS DOUBLE)
                        / SQRT(CAST(var18 AS DOUBLE) / 18.0)
                    ELSE 0.0 END AS z_score,
               CASE WHEN s_stat > 0 AND CAST(s_stat - 1 AS DOUBLE)
                        / SQRT(CAST(var18 AS DOUBLE) / 18.0) > 1.96
                        THEN 'increasing'
                    WHEN s_stat < 0 AND CAST(s_stat + 1 AS DOUBLE)
                        / SQRT(CAST(var18 AS DOUBLE) / 18.0) < -1.96
                        THEN 'decreasing'
                    ELSE 'none' END AS trend
        FROM g
    """,
    "ext_theil_sen_slope": f"""
        WITH daily AS (
            SELECT CAST(datediff('day', DATE '1970-01-01',
                                 CAST(o_orderdate AS DATE)) AS BIGINT)
                       AS xd,
                   CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5)
                                 AS BIGINT)) AS BIGINT) AS rev
            FROM orders GROUP BY 1),
        slopes AS (
            SELECT CAST(b.rev - a.rev AS DOUBLE) / (b.xd - a.xd)
                       AS slope
            FROM daily a JOIN daily b
              ON a.xd < b.xd AND b.xd - a.xd <= {TS_MAX_OFFSET}),
        ts AS (SELECT COUNT(*) AS n_pairs,
                      quantile_cont(slope, 0.5) AS ts_slope
               FROM slopes),
        m AS (
            SELECT CAST(COUNT(*) AS HUGEINT) AS n,
                   CAST(SUM(CAST(xd AS HUGEINT)) AS HUGEINT) AS sx,
                   CAST(SUM(CAST(rev AS HUGEINT)) AS HUGEINT) AS sy,
                   SUM(CAST(xd AS HUGEINT) * CAST(rev AS HUGEINT))
                       AS sxy,
                   SUM(CAST(xd AS HUGEINT) * CAST(xd AS HUGEINT))
                       AS sxx
            FROM daily),
        ols AS (
            SELECT CAST(n AS BIGINT) AS n_days,
                   (CAST(n * sxy AS DOUBLE) - CAST(sx * sy AS DOUBLE))
                   / (CAST(n * sxx AS DOUBLE)
                      - CAST(sx * sx AS DOUBLE)) AS ols_slope
            FROM m)
        SELECT n_days, n_pairs,
               ROUND(ts_slope / 100.0, 6) AS theil_sen_usd_per_day,
               ROUND(ols_slope / 100.0, 6) AS ols_usd_per_day
        FROM ols CROSS JOIN ts
    """,
    "ext_ratio_metric_delta": """
        WITH per_user AS (
            SELECT CAST('0x' || substr(md5('arm:'
                       || CAST(user_id AS VARCHAR)), 1, 15)
                       AS BIGINT) % 2 AS arm,
                   CAST(SUM(CASE WHEN event_type = 'purchase'
                            THEN CAST(FLOOR(value * 100 + 0.5)
                                      AS BIGINT) ELSE 0 END)
                        AS HUGEINT) AS x,
                   CAST(SUM(CASE WHEN event_type = 'click'
                            THEN 1 ELSE 0 END) AS HUGEINT) AS y
            FROM events
            WHERE event_type IN ('click', 'purchase')
            GROUP BY user_id),
        m AS (
            SELECT arm, CAST(COUNT(*) AS HUGEINT) AS n,
                   SUM(x) AS sx, SUM(y) AS sy,
                   SUM(x * x) AS sxx, SUM(y * y) AS syy,
                   SUM(x * y) AS sxy
            FROM per_user GROUP BY arm),
        f AS (
            SELECT arm, CAST(n AS BIGINT) AS n_users,
                   CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE) AS r,
                   ((CAST(n * sxx AS DOUBLE) - CAST(sx * sx AS DOUBLE))
                    / CAST(n * (n - 1) AS DOUBLE)
                    + (CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE))
                      * (CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE))
                      * ((CAST(n * syy AS DOUBLE)
                          - CAST(sy * sy AS DOUBLE))
                         / CAST(n * (n - 1) AS DOUBLE))
                    - 2.0 * (CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE))
                      * ((CAST(n * sxy AS DOUBLE)
                          - CAST(sx * sy AS DOUBLE))
                         / CAST(n * (n - 1) AS DOUBLE)))
                   / (CAST(n AS DOUBLE)
                      * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
                      * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)))
                       AS vr
            FROM m)
        SELECT a1.n_users AS n1, a0.n_users AS n0,
               ROUND(a1.r / 100.0, 6) AS rpc1_usd,
               ROUND(a0.r / 100.0, 6) AS rpc0_usd,
               ROUND((a1.r - a0.r) / SQRT(a1.vr + a0.vr), 4) AS z
        FROM (SELECT * FROM f WHERE arm = 1) a1
        CROSS JOIN (SELECT * FROM f WHERE arm = 0) a0
    """,
    "ext_ltv_triangle": """
        WITH ev AS (
            SELECT user_id, event_type, CAST(ts AS DATE) AS day,
                   CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
            FROM events),
        first_seen AS (
            SELECT user_id,
                   CAST(date_trunc('week', MIN(day)) AS DATE) AS cohort
            FROM ev GROUP BY user_id),
        sizes AS (SELECT cohort, COUNT(*) AS n_users
                  FROM first_seen GROUP BY cohort),
        rev AS (
            SELECT cohort,
                   CAST(FLOOR(datediff('day', cohort, day) / 7)
                        AS BIGINT) AS age_week,
                   CAST(SUM(cents) AS BIGINT) AS rev
            FROM ev JOIN first_seen USING (user_id)
            WHERE event_type = 'purchase'
            GROUP BY 1, 2),
        cum AS (
            SELECT cohort, age_week,
                   SUM(rev) OVER (PARTITION BY cohort ORDER BY age_week
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS cum
            FROM rev)
        SELECT strftime(cum.cohort, '%Y-%m-%d') AS cohort, age_week,
               n_users,
               ROUND(CAST(cum AS DOUBLE) / 100.0 / n_users, 4)
                   AS cum_ltv_usd
        FROM cum JOIN sizes ON sizes.cohort = cum.cohort
    """,
    "ext_sliding_median": """
        WITH daily AS (
            SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
                   CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5)
                                 AS BIGINT)) AS BIGINT) AS rev
            FROM orders GROUP BY 1),
        rolled AS (
            SELECT day, ROUND(rev / 100.0, 2) AS rev_usd,
                   ROUND(quantile_cont(rev, 0.5) OVER (ORDER BY day
                       ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
                       / 100.0, 4) AS med7_usd,
                   COUNT(*) OVER (ORDER BY day
                       ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS n7
            FROM daily)
        SELECT day, rev_usd, med7_usd FROM rolled WHERE n7 = 7
    """,
    "ext_max_drawdown": f"""
        WITH daily AS (
            SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
                   CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5)
                                 AS BIGINT)) AS BIGINT) AS rev
            FROM orders GROUP BY 1),
        curve AS (
            SELECT day,
                   SUM(rev) OVER (ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS cum
            FROM daily),
        peaks AS (
            SELECT day, cum,
                   MAX(cum) OVER (ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS peak
            FROM curve)
        SELECT day, ROUND(cum / 100.0, 2) AS cum_usd,
               ROUND(peak / 100.0, 2) AS peak_usd,
               CAST(FLOOR(CAST(peak - cum AS DOUBLE) * 10000 / peak)
                    AS BIGINT) AS dd_bps
        FROM peaks ORDER BY peak - cum DESC, day LIMIT {CUSUM_TOP}
    """,
    "ext_logrank_test": f"""
        WITH ev AS (
            SELECT user_id, event_type, CAST(ts AS DATE) AS day
            FROM events),
        per_user AS (
            SELECT user_id,
                   MIN(CASE WHEN event_type = 'click'
                            THEN day END) AS t0,
                   MAX(day) AS last_seen
            FROM ev GROUP BY user_id
            HAVING MIN(CASE WHEN event_type = 'click' THEN day END)
                   IS NOT NULL),
        first_buy AS (
            SELECT e.user_id, MIN(e.day) AS t_buy
            FROM ev e JOIN per_user p ON e.user_id = p.user_id
            WHERE e.event_type = 'purchase' AND e.day >= p.t0
            GROUP BY e.user_id),
        durs AS (
            SELECT CAST('0x' || substr(md5('arm:'
                            || CAST(user_id AS VARCHAR)), 1, 15)
                        AS BIGINT) % 2 AS arm,
                   CAST(datediff('day', t0,
                                 COALESCE(t_buy, last_seen))
                        AS BIGINT) AS dur,
                   CASE WHEN t_buy IS NOT NULL THEN 1 ELSE 0 END AS d
            FROM per_user LEFT JOIN first_buy USING (user_id)),
        cells AS (SELECT arm, dur, COUNT(*) AS n_at,
                         CAST(SUM(d) AS BIGINT) AS d_at
                  FROM durs GROUP BY 1, 2),
        ev_days AS (SELECT DISTINCT dur AS t FROM cells
                    WHERE d_at > 0),
        at_t AS (
            SELECT t, arm, CAST(SUM(n_at) AS BIGINT) AS n_risk,
                   CAST(SUM(CASE WHEN dur = t THEN d_at ELSE 0 END)
                        AS BIGINT) AS d_t
            FROM cells JOIN ev_days ON dur >= t
            GROUP BY t, arm),
        terms AS (
            SELECT a1.t, a1.d_t AS d1,
                   a1.n_risk + a0.n_risk AS n,
                   a1.d_t + a0.d_t AS d,
                   a1.n_risk AS n1, a0.n_risk AS n0
            FROM (SELECT * FROM at_t WHERE arm = 1) a1
            JOIN (SELECT * FROM at_t WHERE arm = 0) a0
              ON a1.t = a0.t),
        agg AS (
            SELECT CAST(SUM(d1) AS BIGINT) AS o1,
                   CAST(SUM(CAST(FLOOR(CAST(d AS DOUBLE) * n1 / n
                            * {_NANO} + 0.5) AS BIGINT)) AS BIGINT)
                       AS e1_q,
                   CAST(SUM(CAST(FLOOR(CAST(d AS DOUBLE) * n1 * n0
                            * (n - d)
                            / (CAST(n AS DOUBLE) * n * (n - 1))
                            * {_NANO} + 0.5) AS BIGINT)) AS BIGINT)
                       AS v_q
            FROM terms WHERE n > 1),
        sizes AS (SELECT arm, COUNT(*) AS nu FROM durs GROUP BY arm)
        SELECT (SELECT nu FROM sizes WHERE arm = 1) AS n_arm1,
               (SELECT nu FROM sizes WHERE arm = 0) AS n_arm0,
               o1 AS observed1,
               ROUND(e1_q / {_NANO}, 4) AS expected1,
               ROUND((o1 - e1_q / {_NANO}) * (o1 - e1_q / {_NANO})
                     / (v_q / {_NANO}), 4) AS chi2
        FROM agg
    """,
    "ext_rrf_fusion": rf"""
        WITH tok AS (
            SELECT doc_id, UNNEST(string_split_regex(text, '\s+')) AS t
            FROM documents),
        dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
        stats AS (SELECT COUNT(*) AS nd,
                         CAST(SUM(dl) AS BIGINT) AS total_len
                  FROM dl),
        postings AS (
            SELECT doc_id, t, COUNT(*) AS tf FROM tok
            WHERE t IN {BM25_QUERY!r}
            GROUP BY doc_id, t),
        dfs AS (SELECT t, COUNT(DISTINCT doc_id) AS df
                FROM postings GROUP BY t),
        scored AS (
            SELECT doc_id,
                   LN(1.0 + (nd - df + 0.5) / (df + 0.5))
                   * (tf * ({BM25_K1} + 1.0))
                   / (tf + {BM25_K1}
                      * (1.0 - {BM25_B} + {BM25_B} * dl
                         / (CAST(total_len AS DOUBLE) / nd)))
                       AS term_score
            FROM postings JOIN dfs USING (t) JOIN dl USING (doc_id)
            CROSS JOIN stats),
        bmtop AS (
            SELECT doc_id,
                   ROUND(CAST(SUM(CAST(FLOOR(term_score * {_NANO}
                                             + 0.5) AS BIGINT))
                              AS BIGINT) / {_NANO}, 6) AS bm25
            FROM scored GROUP BY doc_id
            ORDER BY bm25 DESC, doc_id LIMIT {BM25_TOPK}),
        bm AS (
            SELECT doc_id,
                   ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id)
                       AS r_bm25
            FROM bmtop),
        covtop AS (
            SELECT doc_id, COUNT(*) AS hits,
                   COUNT(DISTINCT t) AS terms
            FROM tok WHERE t IN {BM25_QUERY!r}
            GROUP BY doc_id
            ORDER BY terms DESC, hits DESC, doc_id
            LIMIT {BM25_TOPK}),
        cv AS (
            SELECT doc_id,
                   ROW_NUMBER() OVER (ORDER BY terms DESC, hits DESC,
                                      doc_id) AS r_cov
            FROM covtop),
        fused AS (
            SELECT COALESCE(bm.doc_id, cv.doc_id) AS doc_id,
                   r_bm25, r_cov,
                   COALESCE(1.0 / ({RRF_K} + r_bm25), 0.0)
                   + COALESCE(1.0 / ({RRF_K} + r_cov), 0.0) AS rrf
            FROM bm FULL OUTER JOIN cv ON bm.doc_id = cv.doc_id)
        SELECT doc_id, r_bm25, r_cov, ROUND(rrf, 6) AS rrf
        FROM fused ORDER BY rrf DESC, doc_id LIMIT {RRF_TOPK}
    """,
    "ext_snippet_extraction": rf"""
        WITH docs AS (
            SELECT doc_id, string_split_regex(text, '\s+') AS toks
            FROM documents),
        pos0 AS (
            SELECT doc_id, UNNEST(toks) AS t,
                   UNNEST(range(len(toks))) AS p
            FROM docs),
        pos AS (SELECT doc_id, CAST(p AS BIGINT) AS p FROM pos0
                WHERE t IN {BM25_QUERY!r}),
        votes AS (
            SELECT doc_id,
                   UNNEST(range(GREATEST(p - {SNIP_W} + 1, 0), p + 1))
                       AS start
            FROM pos),
        cand AS (SELECT doc_id, CAST(start AS BIGINT) AS start,
                        COUNT(*) AS hits
                 FROM votes GROUP BY 1, 2),
        best AS (
            SELECT doc_id, hits AS win_hits, start AS win_start
            FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY hits DESC, start) AS rn
                  FROM cand)
            WHERE rn = 1)
        SELECT b.doc_id, win_hits, win_start,
               array_to_string(list_slice(toks,
                   CAST(win_start + 1 AS INT),
                   CAST(win_start + {SNIP_W} AS INT)), ' ') AS snippet
        FROM best b JOIN docs USING (doc_id)
    """,
    "ext_bm25_search": rf"""
        WITH tok AS (
            SELECT doc_id, UNNEST(string_split_regex(text, '\s+')) AS t
            FROM documents),
        dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
        stats AS (SELECT COUNT(*) AS nd,
                         CAST(SUM(dl) AS BIGINT) AS total_len
                  FROM dl),
        postings AS (
            SELECT doc_id, t, COUNT(*) AS tf FROM tok
            WHERE t IN {BM25_QUERY!r}
            GROUP BY doc_id, t),
        dfs AS (SELECT t, COUNT(DISTINCT doc_id) AS df
                FROM postings GROUP BY t),
        scored AS (
            SELECT doc_id,
                   LN(1.0 + (nd - df + 0.5) / (df + 0.5))
                   * (tf * ({BM25_K1} + 1.0))
                   / (tf + {BM25_K1}
                      * (1.0 - {BM25_B} + {BM25_B} * dl
                         / (CAST(total_len AS DOUBLE) / nd)))
                       AS term_score
            FROM postings JOIN dfs USING (t) JOIN dl USING (doc_id)
            CROSS JOIN stats)
        SELECT doc_id, COUNT(*) AS n_terms_hit,
               ROUND(CAST(SUM(CAST(FLOOR(term_score * {_NANO} + 0.5)
                                   AS BIGINT)) AS BIGINT)
                     / {_NANO}, 6) AS bm25
        FROM scored GROUP BY doc_id
        ORDER BY bm25 DESC, doc_id LIMIT {BM25_TOPK}
    """,
    "ext_bh_fdr": f"""
        WITH m AS (
            SELECT event_type, CAST(COUNT(*) AS HUGEINT) AS n,
                   SUM(c) AS s, SUM(c * c) AS ss
            FROM (SELECT event_type,
                         CAST(FLOOR(value * 100 + 0.5) AS HUGEINT) AS c
                  FROM events)
            GROUP BY event_type),
        g AS (SELECT SUM(n) AS gn, SUM(s) AS gs, SUM(ss) AS gss
              FROM m),
        scored AS (
            SELECT event_type, CAST(n AS BIGINT) AS n_events,
                   (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                    - CAST(gs AS DOUBLE) / CAST(gn AS DOUBLE))
                   / SQRT(((CAST(gn * gss AS DOUBLE)
                            - CAST(gs * gs AS DOUBLE))
                           / CAST(gn * (gn - 1) AS DOUBLE))
                          / CAST(n AS DOUBLE)) AS z
            FROM m CROSS JOIN g),
        withp AS (
            SELECT event_type, n_events, z,
                   2.0 * (EXP(-ABS(z) * ABS(z) / 2.0)
                          / {_SQRT_2PI!r}
                          * ({_AS_B[0]!r} * k
                             + {_AS_B[1]!r} * k * k
                             + {_AS_B[2]!r} * k * k * k
                             + {_AS_B[3]!r} * k * k * k * k
                             + {_AS_B[4]!r} * k * k * k * k * k))
                       AS p
            FROM (SELECT *, 1.0 / (1.0 + {_AS_P!r} * ABS(z)) AS k
                  FROM scored)),
        ranked AS (
            SELECT event_type, n_events, ROUND(z, 4) + 0.0 AS z,
                   ROUND(p, 8) AS p,
                   ROW_NUMBER() OVER (ORDER BY p, event_type) AS rank,
                   COUNT(*) OVER () AS m
            FROM withp),
        kstar AS (
            SELECT MAX(rank) AS kstar FROM ranked
            WHERE p <= rank * {BH_Q} / m)
        SELECT event_type, n_events, z, p, rank,
               ROUND(rank * {BH_Q} / m, 8) AS bh_cut,
               rank <= COALESCE(kstar, 0) AS reject
        FROM ranked CROSS JOIN kstar
    """,
    "ext_tfidf_cosine_pairs": rf"""
        WITH tok AS (
            SELECT doc_id, UNNEST(string_split_regex(text, '\s+')) AS t
            FROM documents),
        tf AS (SELECT doc_id, t, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
        nn AS (SELECT COUNT(DISTINCT doc_id) AS nd FROM tok),
        df AS (SELECT t, COUNT(*) AS df FROM tf GROUP BY t),
        vocab AS (
            SELECT t, df, nd FROM df CROSS JOIN nn
            WHERE df * 100 <= nd * {TFIDF_DF_MAX_PCT}),
        w AS (
            SELECT doc_id, tf.t,
                   tf * LN(CAST(nd AS DOUBLE) / df) AS w
            FROM tf JOIN vocab ON tf.t = vocab.t),
        norms AS (
            SELECT doc_id,
                   CAST(SUM(CAST(FLOOR(w * w * {_NANO} + 0.5)
                                 AS BIGINT)) AS BIGINT) AS nq
            FROM w GROUP BY doc_id),
        dots AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(SUM(CAST(FLOOR(a.w * b.w * {_NANO} + 0.5)
                                 AS BIGINT)) AS BIGINT) AS dq,
                   COUNT(*) AS n_shared
            FROM w a JOIN w b
              ON a.t = b.t AND a.doc_id < b.doc_id
            GROUP BY 1, 2)
        SELECT doc_a, doc_b, n_shared,
               ROUND((dq / {_NANO})
                     / (SQRT(na.nq / {_NANO}) * SQRT(nb.nq / {_NANO})),
                     6) AS cosine
        FROM dots
        JOIN norms na ON na.doc_id = doc_a
        JOIN norms nb ON nb.doc_id = doc_b
        ORDER BY cosine DESC, doc_a, doc_b LIMIT {TFIDF_TOPK}
    """,
    "ext_cuped_adjustment": f"""
        WITH per_user AS (
            SELECT user_id,
                   CAST(SUM(CASE WHEN strftime(ts, '%Y-%m-%d')
                                      < '{DID_CUT}'
                                 THEN CAST(FLOOR(value * 100 + 0.5)
                                           AS BIGINT)
                                 ELSE 0 END) AS HUGEINT) AS x,
                   CAST(SUM(CASE WHEN strftime(ts, '%Y-%m-%d')
                                      >= '{DID_CUT}'
                                 THEN CAST(FLOOR(value * 100 + 0.5)
                                           AS BIGINT)
                                 ELSE 0 END) AS HUGEINT) AS y
            FROM events WHERE event_type = 'purchase'
            GROUP BY user_id),
        m AS (
            SELECT CAST(COUNT(*) AS HUGEINT) AS n, SUM(x) AS sx,
                   SUM(y) AS sy, SUM(x * y) AS sxy,
                   SUM(x * x) AS sxx, SUM(y * y) AS syy
            FROM per_user),
        f AS (
            SELECT n, sy,
                   CAST(n * sxy AS DOUBLE) - CAST(sx * sy AS DOUBLE)
                       AS num,
                   CAST(n * sxx AS DOUBLE) - CAST(sx * sx AS DOUBLE)
                       AS denx,
                   CAST(n * syy AS DOUBLE) - CAST(sy * sy AS DOUBLE)
                       AS deny
            FROM m)
        SELECT CAST(n AS BIGINT) AS n_users,
               ROUND(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) / 100.0, 4)
                   AS mean_post_usd,
               ROUND(num / denx, 6) AS theta,
               ROUND(num * num / (denx * deny) * 100.0, 4)
                   AS var_reduction_pct
        FROM f
    """,
    "ext_mann_whitney": """
        WITH ev AS (
            SELECT CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v,
                   event_type = 'click' AS is_a
            FROM events WHERE event_type IN ('click', 'purchase')),
        cells AS (
            SELECT v,
                   CAST(SUM(CASE WHEN is_a THEN 1 ELSE 0 END)
                        AS BIGINT) AS ca,
                   CAST(SUM(CASE WHEN is_a THEN 0 ELSE 1 END)
                        AS BIGINT) AS cb
            FROM ev GROUP BY v),
        ladder AS (
            SELECT v, ca, cb, ca + cb AS t,
                   COALESCE(SUM(ca + cb) OVER (ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS cum_prev
            FROM cells),
        sums AS (
            SELECT CAST(SUM(ca) AS BIGINT) AS na,
                   CAST(SUM(cb) AS BIGINT) AS nb,
                   CAST(SUM(ca * (2 * cum_prev + t + 1)) AS BIGINT)
                       AS r2a,
                   CAST(SUM(t * t * t - t) AS BIGINT) AS ties
            FROM ladder)
        SELECT na, nb,
               (r2a - na * (na + 1)) / 2.0 AS u_a,
               ROUND(CAST(r2a - na * (na + 1) - na * nb AS DOUBLE)
                     / (2.0 * SQRT(CAST(na AS DOUBLE) * nb / 12.0
                         * (CAST(na + nb + 1 AS DOUBLE)
                            - CAST(ties AS DOUBLE)
                              / (CAST(na + nb AS DOUBLE)
                                 * CAST(na + nb - 1 AS DOUBLE))))),
                     6) AS z
        FROM sums
    """,
    "ext_poisson_bootstrap": f"""
        WITH ev AS (
            SELECT CAST(event_id AS VARCHAR) AS eid,
                   CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
            FROM events WHERE event_type = 'purchase'),
        reps AS (
            SELECT eid, cents, CAST(r AS BIGINT) AS rep
            FROM ev
            CROSS JOIN (SELECT UNNEST(range({BOOT_B})) AS r)),
        ws AS (
            SELECT rep, cents,
                   (CAST('0x' || substr(md5('boot:' || eid || '#'
                             || CAST(rep AS VARCHAR)), 1, 15)
                         AS BIGINT) % {BOOT_RES} + 0.5)
                       / {BOOT_RES}.0 AS u
            FROM reps),
        weighted AS (
            SELECT rep, cents,
                   CASE {" ".join(
                       f"WHEN u < {c!r} THEN {k}"
                       for k, c in enumerate(_POIS_CUM)
                   )} ELSE 7 END AS w
            FROM ws),
        means AS (
            SELECT rep, SUM(w * cents) / (100.0 * SUM(w)) AS m
            FROM weighted GROUP BY rep),
        ranked AS (
            SELECT ROW_NUMBER() OVER (ORDER BY m, rep) AS rk, m
            FROM means),
        point AS (
            SELECT COUNT(*) AS n,
                   SUM(cents) / (100.0 * COUNT(*)) AS mean
            FROM ev)
        SELECT n, ROUND(mean, 4) AS mean_usd,
               ROUND((SELECT m FROM ranked WHERE rk = 2), 4)
                   AS ci_lo_usd,
               ROUND((SELECT m FROM ranked WHERE rk = {BOOT_B - 1}), 4)
                   AS ci_hi_usd
        FROM point
    """,
    "ext_kaplan_meier": f"""
        WITH {_SURV_CTES},
        curve AS (
            SELECT dur, n_risk, d_at,
                   SUM(CASE WHEN d_at < n_risk
                            THEN CAST(FLOOR(LN(1.0 - d_at / n_risk)
                                 * {_KM_NANO} + 0.5) AS BIGINT)
                            ELSE CAST({-100 * _KM_NANO} AS BIGINT)
                       END)
                       OVER (ORDER BY dur
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS cum_lq
            FROM evrows)
        SELECT dur AS t_days, CAST(n_risk AS BIGINT) AS n_risk,
               CAST(d_at AS BIGINT) AS d_events,
               ROUND(EXP(cum_lq / {_KM_NANO}), 6) AS survival,
               ROUND(d_at / n_risk, 6) AS hazard
        FROM curve
    """,
    "ext_ks_two_sample": """
        WITH ev AS (
            SELECT CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v,
                   event_type = 'click' AS is_a
            FROM events WHERE event_type IN ('click', 'purchase')),
        cells AS (
            SELECT v,
                   SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS ca,
                   SUM(CASE WHEN is_a THEN 0 ELSE 1 END) AS cb
            FROM ev GROUP BY v),
        tot AS (
            SELECT SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS na,
                   SUM(CASE WHEN is_a THEN 0 ELSE 1 END) AS nb
            FROM ev),
        ladder AS (
            SELECT v,
                   SUM(ca) OVER (ORDER BY v
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS cum_a,
                   SUM(cb) OVER (ORDER BY v
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS cum_b
            FROM cells),
        scored AS (
            SELECT CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb,
                   v, ABS(cum_a / na - cum_b / nb) AS d
            FROM ladder CROSS JOIN tot)
        SELECT na, nb, ROUND(d, 6) AS d_stat,
               ROUND(v / 100.0, 2) AS at_usd,
               ROUND(1.36 * SQRT((na + nb)
                                 / (CAST(na AS DOUBLE) * nb)), 6)
                   AS d_crit_5pct
        FROM scored ORDER BY d DESC, v LIMIT 1
    """,
    "ext_vshape_patterns": f"""
        WITH daily AS (
            SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
                   CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5)
                                 AS BIGINT)) AS BIGINT) AS rev
            FROM orders GROUP BY 1),
        lagged AS (
            SELECT day, rev,
                   LAG(rev, 1) OVER (ORDER BY day) AS prev,
                   LEAD(rev, 1) OVER (ORDER BY day) AS nxt
            FROM daily)
        SELECT day, ROUND(rev / 100.0, 2) AS bottom_usd,
               ROUND((prev - rev) * 100.0 / prev, 4) AS drop_pct,
               ROUND((nxt - rev) * 100.0 / rev, 4) AS recovery_pct
        FROM lagged
        WHERE prev * {VSHAPE_DEN} >= rev * {VSHAPE_NUM}
          AND nxt * {VSHAPE_DEN} >= rev * {VSHAPE_NUM}
    """,
    "ext_diff_in_diff": f"""
        WITH ev AS (
            SELECT CAST('0x' || substr(md5('did:'
                            || CAST(user_id AS VARCHAR)), 1, 15)
                        AS BIGINT) % 2 = 0 AS treated,
                   strftime(ts, '%Y-%m-%d') >= '{DID_CUT}' AS post,
                   CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
            FROM events WHERE event_type = 'purchase'),
        m AS (
            SELECT
                SUM(CASE WHEN treated AND NOT post
                         THEN cents ELSE 0 END) AS s_10,
                SUM(CASE WHEN treated AND NOT post
                         THEN 1 ELSE 0 END) AS n_10,
                SUM(CASE WHEN treated AND post
                         THEN cents ELSE 0 END) AS s_11,
                SUM(CASE WHEN treated AND post
                         THEN 1 ELSE 0 END) AS n_11,
                SUM(CASE WHEN NOT treated AND NOT post
                         THEN cents ELSE 0 END) AS s_00,
                SUM(CASE WHEN NOT treated AND NOT post
                         THEN 1 ELSE 0 END) AS n_00,
                SUM(CASE WHEN NOT treated AND post
                         THEN cents ELSE 0 END) AS s_01,
                SUM(CASE WHEN NOT treated AND post
                         THEN 1 ELSE 0 END) AS n_01
            FROM ev)
        SELECT ROUND(s_10 / 100.0 / n_10, 4) AS treat_pre,
               ROUND(s_11 / 100.0 / n_11, 4) AS treat_post,
               ROUND(s_00 / 100.0 / n_00, 4) AS ctrl_pre,
               ROUND(s_01 / 100.0 / n_01, 4) AS ctrl_post,
               ROUND((s_11 / 100.0 / n_11 - s_10 / 100.0 / n_10)
                     - (s_01 / 100.0 / n_01 - s_00 / 100.0 / n_00), 4)
                   AS did_usd
        FROM m
    """,
    "ext_ab_power_mde": """
        WITH m AS (
            SELECT event_type, CAST(COUNT(*) AS HUGEINT) AS n,
                   SUM(c) AS s, SUM(c * c) AS ss
            FROM (SELECT event_type,
                         CAST(FLOOR(value * 100 + 0.5) AS HUGEINT) AS c
                  FROM events)
            GROUP BY event_type),
        f AS (
            SELECT event_type, n,
                   (CAST(n * ss AS DOUBLE) - CAST(s * s AS DOUBLE))
                       / CAST(n * (n - 1) AS DOUBLE) AS var,
                   CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean
            FROM m)
        SELECT event_type, CAST(n AS BIGINT) AS n_events,
               ROUND(mean / 100.0, 4) AS mean_usd,
               ROUND(SQRT(var) / 100.0, 4) AS stddev_usd,
               ROUND(2.8 * SQRT(2.0 * var
                                / (CAST(n AS DOUBLE) / 2.0))
                     / mean * 100.0, 4) AS mde_pct
        FROM f
    """,
    "ext_fifo_allocation": """
        WITH ev AS (
            SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us,
                   CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
            FROM events),
        clicks AS (
            SELECT user_id,
                   SUM(cents) OVER w - cents AS cs,
                   SUM(cents) OVER w AS ce
            FROM ev WHERE event_type = 'click'
            WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW)),
        buys AS (
            SELECT user_id,
                   SUM(cents) OVER w - cents AS ps,
                   SUM(cents) OVER w AS pe
            FROM ev WHERE event_type = 'purchase'
            WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW)),
        alloc AS (
            SELECT c.user_id, COUNT(*) AS n_allocs,
                   CAST(SUM(LEAST(ce, pe) - GREATEST(cs, ps))
                        AS BIGINT) AS matched_cents
            FROM clicks c JOIN buys b
              ON c.user_id = b.user_id
             AND cs < pe AND ps < ce
            GROUP BY c.user_id),
        totals AS (
            SELECT user_id,
                   CAST(SUM(CASE WHEN event_type = 'click'
                                 THEN cents ELSE 0 END) AS BIGINT)
                       AS click_cents,
                   CAST(SUM(CASE WHEN event_type = 'purchase'
                                 THEN cents ELSE 0 END) AS BIGINT)
                       AS purchase_cents
            FROM ev GROUP BY user_id)
        SELECT user_id, n_allocs, matched_cents,
               click_cents - matched_cents AS unused_credit_cents,
               purchase_cents - matched_cents
                   AS uncovered_purchase_cents
        FROM totals JOIN alloc USING (user_id)
    """,
    "ext_peak_days": """
        WITH daily AS (
            SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
                   CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5)
                                 AS BIGINT)) AS BIGINT) AS rev
            FROM orders GROUP BY 1),
        scored AS (
            SELECT day, rev,
                   LAG(rev, 1) OVER (ORDER BY day) AS prev,
                   LEAD(rev, 1) OVER (ORDER BY day) AS nxt,
                   SUM(rev) OVER (ORDER BY day
                                  ROWS BETWEEN 6 PRECEDING
                                  AND CURRENT ROW) AS s7,
                   COUNT(*) OVER (ORDER BY day
                                  ROWS BETWEEN 6 PRECEDING
                                  AND CURRENT ROW) AS n7
            FROM daily)
        SELECT day, ROUND(rev / 100.0, 2) AS rev_usd,
               ROUND(rev * 7.0 / s7, 4) AS prominence
        FROM scored
        WHERE rev > prev AND rev > nxt AND n7 = 7
          AND rev * 14 > s7 * 3
    """,
    "ext_burstiness_fano": """
        WITH daily AS (
            SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
                   CAST(COUNT(*) AS HUGEINT) AS c
            FROM events GROUP BY 1, 2),
        m AS (
            SELECT event_type, CAST(COUNT(*) AS HUGEINT) AS n,
                   SUM(c) AS s, SUM(c * c) AS ss
            FROM daily GROUP BY event_type),
        f AS (
            SELECT event_type, n,
                   (CAST(n * ss AS DOUBLE) - CAST(s * s AS DOUBLE))
                       / CAST(n * (n - 1) AS DOUBLE) AS var,
                   CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean
            FROM m)
        SELECT event_type, CAST(n AS BIGINT) AS n_days,
               ROUND(mean, 4) AS mean_daily,
               ROUND(var, 4) AS var_daily,
               ROUND(var / mean, 4) AS fano,
               CASE WHEN var / mean > 1.1 THEN 'bursty'
                    WHEN var / mean < 0.9 THEN 'regular'
                    ELSE 'poisson-like' END AS regime
        FROM f
    """,
    "ext_equidepth_histogram": f"""
        WITH pc AS (
            SELECT CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
                       AS pc
            FROM lineitem),
        cells AS (SELECT pc, COUNT(*) AS c FROM pc GROUP BY pc),
        dist AS (
            SELECT pc,
                   COALESCE(SUM(c) OVER (ORDER BY pc
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING), 0) AS cum_prev,
                   SUM(c) OVER (ORDER BY pc
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cum
            FROM cells),
        nn AS (SELECT COUNT(*) AS n FROM pc),
        ranks AS (
            SELECT i, (n - 1) * i // {EQD_BUCKETS} AS lo_r,
                   ((n - 1) * i % {EQD_BUCKETS})
                       / {float(EQD_BUCKETS)!r} AS frac,
                   LEAST((n - 1) * i // {EQD_BUCKETS} + 1, n - 1)
                       AS hi_r
            FROM (SELECT UNNEST(range(1, {EQD_BUCKETS})) AS i)
            CROSS JOIN nn),
        lo AS (
            SELECT i, frac, pc AS v_lo
            FROM dist JOIN ranks
              ON cum_prev <= lo_r AND lo_r < cum),
        hi AS (
            SELECT i AS i2, pc AS v_hi
            FROM dist JOIN ranks
              ON cum_prev <= hi_r AND hi_r < cum),
        blong AS (
            SELECT i, CAST(FLOOR(v_lo + (v_hi - v_lo) * frac + 0.5)
                           AS BIGINT) AS b
            FROM lo JOIN hi ON i = i2),
        bounds AS (
            SELECT {", ".join(
                f"MAX(CASE WHEN i = {k + 1} THEN b END) AS b{k}"
                for k in range(EQD_BUCKETS - 1)
            )}
            FROM blong),
        assigned AS (
            SELECT ({" + ".join(
                f"CASE WHEN pc > b{i} THEN 1 ELSE 0 END"
                for i in range(EQD_BUCKETS - 1)
            )}) AS bucket, pc
            FROM pc CROSS JOIN bounds)
        SELECT CAST(bucket AS BIGINT) AS bucket, COUNT(*) AS n_rows,
               ROUND(MIN(pc) / 100.0, 2) AS lo,
               ROUND(MAX(pc) / 100.0, 2) AS hi
        FROM assigned GROUP BY bucket
    """,
    "ext_equidepth_approx": f"""
        WITH n1 AS (SELECT COUNT(*) AS n FROM lineitem)
        SELECT CAST(b AS BIGINT) AS bucket,
               CAST(n AS BIGINT) AS n_rows,
               CAST(n // {EQD_BUCKETS} AS BIGINT) AS target_depth,
               CAST(2 * (n // {EQA_ACC}) + 2 AS BIGINT) AS tol,
               TRUE AS depth_ok
        FROM (SELECT UNNEST(range({EQD_BUCKETS})) AS b) CROSS JOIN n1
    """,
    "ext_sliding_bitmap_distinct": """
        WITH ev AS (
            SELECT CAST(ts AS DATE) AS day, user_id // 32 AS chunk,
                   CAST(user_id % 32 AS INT) AS bit
            FROM events),
        masks AS (
            SELECT day, chunk, BIT_OR(CAST(1 AS BIGINT) << bit) AS mask
            FROM ev GROUP BY 1, 2),
        scattered AS (
            SELECT day + CAST(off AS INT) AS day, chunk, mask
            FROM masks
            CROSS JOIN (SELECT UNNEST(range(7)) AS off)),
        win AS (
            SELECT day, chunk, BIT_OR(mask) AS m7
            FROM scattered GROUP BY 1, 2),
        days AS (SELECT DISTINCT day FROM ev)
        SELECT strftime(day, '%Y-%m-%d') AS day,
               CAST(SUM(bit_count(m7)) AS BIGINT) AS n_distinct_7d
        FROM win JOIN days USING (day) GROUP BY day
    """,
    "ext_audience_overlap": f"""
        WITH hashed AS ({_KMV_HASHED}),
        sizes AS (SELECT event_type, COUNT(*) AS n
                  FROM hashed GROUP BY event_type),
        inter AS (
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   COUNT(*) AS n_inter
            FROM hashed a JOIN hashed b
              ON a.h = b.h AND a.event_type < b.event_type
            GROUP BY 1, 2)
        SELECT type_a, type_b, sa.n AS n_a, sb.n AS n_b, n_inter,
               ROUND(n_inter * 1.0 / (sa.n + sb.n - n_inter), 4)
                   AS jaccard
        FROM inter
        JOIN sizes sa ON sa.event_type = type_a
        JOIN sizes sb ON sb.event_type = type_b
    """,
    "ext_kmv_intersection": f"""
        WITH hashed AS ({_KMV_HASHED}),
        sk AS (
            SELECT event_type, h
            FROM (SELECT event_type, h,
                         ROW_NUMBER() OVER (PARTITION BY event_type
                                            ORDER BY h) AS rn
                  FROM hashed)
            WHERE rn <= {KMV_K}),
        theta AS (
            SELECT event_type,
                   CASE WHEN COUNT(*) < {KMV_K}
                        THEN CAST({1 << 60} AS BIGINT)
                        ELSE MAX(h) END AS theta
            FROM sk GROUP BY event_type),
        common AS (
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   COUNT(*) AS n_below,
                   MAX(LEAST(ta.theta, tb.theta)) AS theta
            FROM sk a
            JOIN sk b ON a.h = b.h AND a.event_type < b.event_type
            JOIN theta ta ON ta.event_type = a.event_type
            JOIN theta tb ON tb.event_type = b.event_type
            WHERE a.h < LEAST(ta.theta, tb.theta)
            GROUP BY 1, 2),
        exact_full AS (
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   COUNT(*) AS n_inter_exact
            FROM hashed a JOIN hashed b
              ON a.h = b.h AND a.event_type < b.event_type
            GROUP BY 1, 2)
        SELECT e.type_a, e.type_b, n_inter_exact,
               ROUND(n_below
                     / (CAST(theta AS DOUBLE) / {float(1 << 60)!r}), 4)
                   AS kmv_est,
               ROUND((n_below
                      / (CAST(theta AS DOUBLE) / {float(1 << 60)!r})
                      - n_inter_exact) * 100.0 / n_inter_exact, 4)
                   AS err_pct
        FROM exact_full e
        JOIN common c ON c.type_a = e.type_a AND c.type_b = e.type_b
    """,
    "ext_weighted_median": """
        WITH cells AS (
            SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS qty,
                   SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5)
                            AS BIGINT)) AS w
            FROM lineitem GROUP BY 1, 2),
        c AS (
            SELECT l_returnflag, qty,
                   SUM(w) OVER (PARTITION BY l_returnflag ORDER BY qty
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cum,
                   SUM(w) OVER (PARTITION BY l_returnflag) AS total
            FROM cells)
        SELECT l_returnflag, MIN(qty) AS weighted_median_qty,
               CAST(MAX(total) AS BIGINT) AS total_cents
        FROM c WHERE cum * 2 >= total GROUP BY l_returnflag
    """,
    "ext_cusum_changepoint": f"""
        WITH daily AS (
            SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
                   CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5)
                                 AS BIGINT)) AS HUGEINT) AS rev
            FROM orders GROUP BY 1),
        t AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n, SUM(rev) AS total
              FROM daily),
        sc AS (
            SELECT day, n, total,
                   SUM(rev) OVER (ORDER BY day
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS cum,
                   CAST(ROW_NUMBER() OVER (ORDER BY day) AS HUGEINT)
                       AS i
            FROM daily CROSS JOIN t),
        s AS (SELECT day, n * cum - i * total AS s, n FROM sc)
        SELECT day,
               ROUND(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 100.0, 2)
                   AS cusum_usd,
               CAST(SIGN(CAST(s AS DOUBLE)) AS BIGINT) AS sign
        FROM s ORDER BY ABS(s) DESC, day LIMIT {CUSUM_TOP}
    """,
    "ext_bitmap_distinct": """
        WITH masks AS (
            SELECT event_type, user_id // 32 AS chunk,
                   BIT_OR(CAST(1 AS BIGINT) << CAST(user_id % 32 AS INT))
                       AS mask
            FROM events GROUP BY event_type, chunk),
        bitmap AS (
            SELECT event_type, COUNT(*) AS n_chunks,
                   CAST(SUM(bit_count(mask)) AS BIGINT)
                       AS n_distinct_bitmap
            FROM masks GROUP BY event_type),
        exact AS (
            SELECT event_type, COUNT(DISTINCT user_id)
                       AS n_distinct_exact
            FROM events GROUP BY event_type)
        SELECT bitmap.event_type, n_chunks, n_distinct_bitmap,
               n_distinct_exact
        FROM bitmap JOIN exact USING (event_type)
    """,
    "ext_ols_trend": """
        WITH daily AS (
            SELECT o_orderpriority,
                   CAST(datediff('day', DATE '1970-01-01',
                                 CAST(o_orderdate AS DATE)) AS HUGEINT)
                       AS x,
                   CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5)
                                 AS BIGINT)) AS HUGEINT) AS y
            FROM orders
            GROUP BY o_orderpriority, CAST(o_orderdate AS DATE)),
        m AS (
            SELECT o_orderpriority, CAST(COUNT(*) AS HUGEINT) AS n,
                   SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
                   SUM(x * x) AS sxx, SUM(y * y) AS syy
            FROM daily GROUP BY o_orderpriority),
        f AS (
            SELECT o_orderpriority, n, sx, sy,
                   CAST(n * sxy AS DOUBLE) - CAST(sx * sy AS DOUBLE)
                       AS num,
                   CAST(n * sxx AS DOUBLE) - CAST(sx * sx AS DOUBLE)
                       AS den,
                   CAST(n * syy AS DOUBLE) - CAST(sy * sy AS DOUBLE)
                       AS deny
            FROM m)
        SELECT o_orderpriority, CAST(n AS BIGINT) AS n_days,
               ROUND(num / den, 6) AS slope_cents_per_day,
               ROUND((CAST(sy AS DOUBLE)
                      - num / den * CAST(sx AS DOUBLE))
                     / CAST(n AS DOUBLE), 2) AS intercept_cents,
               ROUND(num * num / (den * deny), 6) AS r2
        FROM f
    """,
    "ext_autocorr_daily": f"""
        WITH daily AS (
            SELECT CAST(o_orderdate AS DATE) AS day,
                   CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5)
                                 AS BIGINT)) AS HUGEINT) AS rev
            FROM orders GROUP BY 1)
        {_autocorr_lag_sql(1)}
        UNION ALL
        {_autocorr_lag_sql(7)}
    """,
    "ext_kmv_distinct": f"""
        WITH hashed AS (
            SELECT DISTINCT event_type,
                   CAST('0x' || substr(md5('kmv:'
                            || CAST(user_id AS VARCHAR) || ':'
                            || strftime(ts, '%Y-%m-%d')), 1, 15)
                        AS BIGINT) AS h
            FROM events),
        bottom AS (
            SELECT event_type, COUNT(*) AS k_seen, MAX(h) AS u_k
            FROM (SELECT event_type, h,
                         ROW_NUMBER() OVER (PARTITION BY event_type
                                            ORDER BY h) AS rn
                  FROM hashed)
            WHERE rn <= {KMV_K} GROUP BY event_type),
        exact AS (
            SELECT event_type, COUNT(*) AS n_exact
            FROM hashed GROUP BY event_type),
        est AS (
            SELECT exact.event_type, n_exact,
                   CASE WHEN k_seen < {KMV_K} THEN k_seen * 1.0
                        ELSE {KMV_K - 1}.0
                             / (u_k / {float(1 << 60)!r})
                   END AS e
            FROM exact JOIN bottom USING (event_type))
        SELECT event_type, n_exact, ROUND(e, 4) AS kmv_est,
               ROUND((e - n_exact) * 100.0 / n_exact, 4) AS err_pct
        FROM est
    """,
    "ext_winsorized_stats": """
        WITH pc AS (
            SELECT l_returnflag,
                   CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
                       AS pc
            FROM lineitem),
        b AS (
            SELECT l_returnflag,
                   CAST(FLOOR(quantile_cont(pc, 0.01) + 0.5) AS BIGINT)
                       AS lo_c,
                   CAST(FLOOR(quantile_cont(pc, 0.99) + 0.5) AS BIGINT)
                       AS hi_c
            FROM pc GROUP BY l_returnflag),
        j AS (
            SELECT pc.l_returnflag, pc.pc, lo_c, hi_c,
                   LEAST(GREATEST(pc.pc, lo_c), hi_c) AS cl
            FROM pc JOIN b USING (l_returnflag))
        SELECT l_returnflag, COUNT(*) AS n,
               ROUND(MAX(lo_c) / 100.0, 2) AS lo,
               ROUND(MAX(hi_c) / 100.0, 2) AS hi,
               ROUND(SUM(pc) / (100.0 * COUNT(*)), 4) AS mean_raw,
               ROUND(SUM(cl) / (100.0 * COUNT(*)), 4)
                   AS mean_winsorized
        FROM j GROUP BY l_returnflag
    """,
    "ext_interval_union": f"""
        WITH iv AS (
            SELECT user_id, epoch_us(ts) AS s,
                   epoch_us(ts) + {COVER_WINDOW_US} AS e
            FROM events),
        m AS (
            SELECT user_id, s, e,
                   MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING) AS prev_end
            FROM iv),
        f AS (
            SELECT user_id, s, e,
                   CASE WHEN prev_end IS NULL OR s > prev_end
                        THEN 1 ELSE 0 END AS new_island
            FROM m),
        isl AS (
            SELECT user_id, s, e,
                   SUM(new_island) OVER (PARTITION BY user_id
                                         ORDER BY s, e
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) AS island
            FROM f),
        merged AS (
            SELECT user_id, island, MAX(e) - MIN(s) AS len_us
            FROM isl GROUP BY user_id, island)
        SELECT user_id, COUNT(*) AS n_intervals,
               CAST(SUM(len_us) AS BIGINT) AS covered_us
        FROM merged GROUP BY user_id
    """,
    "ext_time_to_convert": """
        WITH ev AS (
            SELECT user_id, event_type, ts, event_id FROM events
            WHERE event_type IN ('click', 'purchase')),
        carried AS (
            SELECT user_id, event_type, epoch_us(ts) AS t,
                   MAX(CASE WHEN event_type = 'click'
                            THEN epoch_us(ts) END) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       AS last_click_us
            FROM ev),
        gaps AS (
            SELECT t - last_click_us AS gap_us FROM carried
            WHERE event_type = 'purchase' AND last_click_us IS NOT NULL
              AND t - last_click_us > 0)
        SELECT CAST(length(bin(gap_us)) - 1 AS BIGINT) AS log2_latency_us,
               COUNT(*) AS n_conversions
        FROM gaps GROUP BY 1
    """,
    "ext_supplier_hhi": """
        WITH rev AS (
            SELECT s.s_nationkey,
                   CAST(floor(SUM(CAST(floor(l_extendedprice * 100 + 0.5)
                                       AS BIGINT)) / 100) AS BIGINT)
                       AS rev_usd
            FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
            GROUP BY s.s_nationkey, l.l_suppkey)
        SELECT s_nationkey, COUNT(*) AS n_suppliers,
               CAST(SUM(rev_usd) AS BIGINT) AS total_usd,
               CAST(floor(CAST(SUM(rev_usd * rev_usd) AS DOUBLE) * 1000000
                          / (CAST(SUM(rev_usd) AS DOUBLE)
                             * CAST(SUM(rev_usd) AS DOUBLE))) AS BIGINT)
                   AS hhi_ppm
        FROM rev GROUP BY s_nationkey
    """,
    "ext_inactivity_histogram": """
        WITH gaps AS (
            SELECT epoch_us(ts)
                   - LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id)
                       AS gap_us
            FROM events)
        SELECT CAST(length(bin(gap_us)) - 1 AS BIGINT) AS log2_gap_us,
               COUNT(*) AS n_gaps,
               MIN(gap_us) AS min_gap_us,
               MAX(gap_us) AS max_gap_us
        FROM gaps WHERE gap_us IS NOT NULL AND gap_us > 0
        GROUP BY 1
    """,
    "ext_repeat_purchase_rate": """
        WITH per_cust AS (
            SELECT o_custkey,
                   strftime(MIN(o_orderdate), '%Y-%m') AS cohort_month,
                   COUNT(*) AS n_orders
            FROM orders GROUP BY o_custkey)
        SELECT cohort_month, COUNT(*) AS n_customers,
               CAST(SUM(CASE WHEN n_orders > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_repeaters,
               CAST(floor(SUM(CASE WHEN n_orders > 1 THEN 1 ELSE 0 END)
                          * 1000000 / COUNT(*)) AS BIGINT) AS repeat_ppm
        FROM per_cust GROUP BY cohort_month
    """,
    "ext_rfm_segments": f"""
        WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
        per AS (
            SELECT user_id,
                   MAX(epoch_us(ts)) AS last_us,
                   COUNT(*) AS frequency,
                   CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS monetary_cents
            FROM p GROUP BY user_id),
        base AS (
            SELECT user_id,
                   CAST(FLOOR(((SELECT MAX(epoch_us(ts)) FROM p) - last_us)
                              / 86400000000) AS BIGINT) AS recency_days,
                   frequency, monetary_cents
            FROM per),
        scored AS (
            SELECT *,
                   CAST(ntile({RFM_BUCKETS}) OVER (
                       ORDER BY recency_days, user_id) AS BIGINT) AS r_score,
                   CAST(ntile({RFM_BUCKETS}) OVER (
                       ORDER BY frequency DESC, user_id) AS BIGINT)
                       AS f_score,
                   CAST(ntile({RFM_BUCKETS}) OVER (
                       ORDER BY monetary_cents DESC, user_id) AS BIGINT)
                       AS m_score
            FROM base)
        SELECT user_id, recency_days, frequency, monetary_cents,
               r_score, f_score, m_score,
               CASE WHEN r_score = 1 AND f_score = 1 AND m_score = 1
                    THEN 'champion'
                    WHEN r_score <= 2 AND f_score <= 2 THEN 'loyal'
                    WHEN r_score = {RFM_BUCKETS} THEN 'at_risk'
                    ELSE 'other' END AS segment
        FROM scored
    """,
    "ext_slo_burn": f"""
        WITH daily AS (
            SELECT strftime(ts, '%Y-%m-%d') AS day,
                   COUNT(*) AS n_events,
                   CAST(SUM(CASE WHEN event_type = 'error'
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_errors
            FROM events GROUP BY 1),
        win AS (
            SELECT day, n_events, n_errors,
                   CAST(FLOOR(1000000 * n_errors / n_events) AS BIGINT)
                       AS err_ppm,
                   CAST(FLOOR(1000000 * SUM(n_errors) OVER w
                              / SUM(n_events) OVER w) AS BIGINT)
                       AS burn7_ppm,
                   COUNT(*) OVER w AS n_days
            FROM daily
            WINDOW w AS (ORDER BY day
                         ROWS BETWEEN {SLO_WINDOW_D - 1} PRECEDING
                                  AND CURRENT ROW))
        SELECT day, n_events, n_errors, err_ppm, burn7_ppm,
               CAST(n_days = {SLO_WINDOW_D} AND burn7_ppm > {SLO_PPM}
                    AS INT) AS breach
        FROM win
    """,
    "ext_drift_chi2": (
        _drift_pair_sql(
            "even_odd", "event_id % 2 = 0", "event_id % 2 = 1"
        )
        + " UNION ALL "
        + _drift_pair_sql(
            "half_month",
            "EXTRACT(day FROM ts) <= 15",
            "EXTRACT(day FROM ts) > 15",
        )
    ),
    "ext_ab_test_zscore": """
        WITH users AS (
            SELECT user_id,
                   MAX(CASE WHEN event_type = 'purchase'
                            AND value > 180.0
                       THEN 1 ELSE 0 END) AS conv
            FROM events GROUP BY user_id),
        per AS (
            SELECT CAST(('0x' || substr(md5('ab:'
                        || CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) % 2
                       AS variant,
                   COUNT(*) AS n_users, CAST(SUM(conv) AS BIGINT) AS n_conv
            FROM users GROUP BY 1),
        a AS (SELECT n_users AS n_a, n_conv AS conv_a FROM per
              WHERE variant = 0),
        b AS (SELECT n_users AS n_b, n_conv AS conv_b FROM per
              WHERE variant = 1)
        SELECT n_a, conv_a, n_b, conv_b,
               ROUND(conv_a / n_a, 6) AS rate_a,
               ROUND(conv_b / n_b, 6) AS rate_b,
               ROUND((conv_a / n_a - conv_b / n_b)
                     / sqrt(((conv_a + conv_b) / (n_a + n_b))
                            * (1 - (conv_a + conv_b) / (n_a + n_b))
                            * (1.0 / n_a + 1.0 / n_b)), 4) AS z_score
        FROM a, b
    """,
    "ext_pagerank_types": f"""
        WITH seq AS (
            SELECT event_type AS src,
                   lead(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS dst
            FROM events),
        edges AS (SELECT src, dst, COUNT(*) AS cnt FROM seq
                  WHERE dst IS NOT NULL GROUP BY src, dst),
        nodes AS (SELECT DISTINCT node FROM (
                      SELECT src AS node FROM edges
                      UNION ALL SELECT dst FROM edges) u),
        nn AS (SELECT COUNT(*) AS n_nodes FROM nodes),
        outdeg AS (SELECT src, CAST(SUM(cnt) AS BIGINT) AS out_cnt
                   FROM edges GROUP BY src),
        pr0 AS (SELECT node,
                       CAST(FLOOR({PR_SCALE} * 1.0
                                  / (SELECT n_nodes FROM nn)) AS BIGINT)
                           AS pr
                FROM nodes),
        {", ".join(_pr_iter_sql(r).strip() for r in range(1, PR_ITERS + 1))}
        SELECT node AS event_type, pr AS pr_ppm FROM pr{PR_ITERS}
    """,
    "ext_gap_fill_daily": """
        WITH daily AS (
            SELECT user_id, CAST(ts AS DATE) AS day,
                   CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS day_cents
            FROM events GROUP BY user_id, CAST(ts AS DATE)),
        spans AS (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1
                  FROM daily GROUP BY user_id),
        alldays AS (
            SELECT user_id, CAST(unnest(generate_series(d0, d1,
                                        INTERVAL 1 DAY)) AS DATE) AS day
            FROM spans)
        SELECT a.user_id, strftime(a.day, '%Y-%m-%d') AS day,
               last_value(d.day_cents IGNORE NULLS) OVER (
                   PARTITION BY a.user_id ORDER BY a.day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS filled_cents,
               CAST(d.day_cents IS NULL AS INT) AS is_gap
        FROM alldays a LEFT JOIN daily d
          ON a.user_id = d.user_id AND a.day = d.day
    """,
    "ext_attribution_last_touch": f"""
        WITH ev AS (
            SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
            FROM events),
        tagged AS (
            SELECT user_id, event_id, event_type, ts_us,
                   last_value(CASE WHEN event_type = 'click'
                                   THEN ts_us END IGNORE NULLS) OVER w
                       AS click_ts_us,
                   last_value(CASE WHEN event_type = 'click'
                                   THEN event_id END IGNORE NULLS) OVER w
                       AS click_event
            FROM ev
            WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        SELECT user_id, event_id AS purchase_event,
               CASE WHEN ts_us - click_ts_us <= {ATTR_WINDOW_US}
                    THEN click_event END AS click_event,
               CASE WHEN ts_us - click_ts_us <= {ATTR_WINDOW_US}
                    THEN CAST(FLOOR((ts_us - click_ts_us) / 60000000)
                              AS BIGINT) END AS mins_since_click
        FROM tagged WHERE event_type = 'purchase'
    """,
    "ext_watermark_audit": f"""
        WITH ev AS (SELECT event_type, epoch_us(ts) AS ts_us, event_id
                    FROM events),
        l AS (SELECT event_type,
                     greatest(COALESCE(MAX(ts_us) OVER (
                         PARTITION BY event_type ORDER BY event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                         ts_us) - ts_us, 0) AS late_us
              FROM ev)
        SELECT event_type, COUNT(*) AS n_events,
               ROUND(MAX(late_us) / 1e6, 1) AS max_late_s,
               ROUND(quantile_cont(late_us, 0.99) / 1e6, 1) AS p99_late_s,
               {", ".join(
                   f"CAST(SUM(CASE WHEN late_us > {m * 60 * 1_000_000} "
                   f"THEN 1 ELSE 0 END) AS BIGINT) AS dropped_{m}m"
                   for m in WM_CANDIDATES_MIN)}
        FROM l GROUP BY event_type
    """,
    "ext_map_funcs": f"""
        WITH c AS (SELECT event_type,
                          strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
                          COUNT(*) AS n
                   FROM events GROUP BY event_type, day),
        t AS (SELECT event_type, SUM(n) AS total FROM c GROUP BY event_type)
        SELECT c.event_type, c.day,
               ROUND(c.n * 1.0 / t.total, 6) AS share
        FROM c JOIN t USING (event_type)
        WHERE ROUND(c.n * 1.0 / t.total, 6) >= {MAP_SHARE_MIN}
    """,
    "ext_running_distinct_users": """
        SELECT e1.event_type, e1.day,
               CAST(COUNT(DISTINCT e2.user_id) AS BIGINT) AS n_users_cum
        FROM (SELECT DISTINCT event_type,
                     strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day
              FROM events) e1
        JOIN (SELECT DISTINCT event_type,
                     strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day, user_id
              FROM events) e2
          ON e1.event_type = e2.event_type AND e2.day <= e1.day
        GROUP BY e1.event_type, e1.day
    """,
    "ext_concurrency_sweep": f"""
        WITH ev AS (SELECT event_type, epoch_us(ts) AS ts_us, event_id
                    FROM events),
        d AS (SELECT event_type, ts_us, event_id, 1 AS delta FROM ev
              UNION ALL
              SELECT event_type, ts_us + {SESSION_GAP_US // 2}, event_id,
                     -1 FROM ev),
        r AS (SELECT event_type, ts_us, event_id,
                     CAST(SUM(delta) OVER (
                         PARTITION BY event_type
                         ORDER BY ts_us, delta DESC, event_id
                         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS open
              FROM d)
        SELECT event_type, open AS peak_concurrency, ts_us AS peak_at_us
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY event_type
                  ORDER BY open DESC, ts_us, event_id) AS rn FROM r) t
        WHERE rn = 1
    """,
    "ext_session_paths": f"""
        WITH ev AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
                           event_type FROM events),
        l AS (SELECT *, lag(ts_us) OVER (
                  PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_ts
              FROM ev),
        f AS (SELECT *, CASE WHEN prev_ts IS NULL
                              OR ts_us - prev_ts > {SESSION_GAP_US}
                        THEN 1 ELSE 0 END AS new_sess FROM l),
        s AS (SELECT *, SUM(new_sess) OVER (
                  PARTITION BY user_id ORDER BY ts_us, event_id
                  ROWS UNBOUNDED PRECEDING) AS sess FROM f),
        p AS (SELECT user_id, sess,
                     string_agg(event_type, '>' ORDER BY ts_us, event_id)
                         AS path
              FROM s GROUP BY user_id, sess)
        SELECT path, COUNT(*) AS n_sessions FROM p GROUP BY path
        ORDER BY n_sessions DESC, path LIMIT {PATH_TOP_K}
    """,
    "ext_event_transitions": """
        WITH ev AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
                           event_type FROM events),
        l AS (SELECT user_id, event_type, lag(event_type) OVER (
                  PARTITION BY user_id ORDER BY ts_us, event_id)
                  AS prev_type FROM ev),
        t AS (SELECT prev_type, event_type, COUNT(*) AS n FROM l
              WHERE prev_type IS NOT NULL GROUP BY prev_type, event_type)
        SELECT prev_type, event_type, n,
               ROUND(n * 1.0 / SUM(n) OVER (PARTITION BY prev_type), 4)
                   AS prob
        FROM t
    """,
    "ext_quantile_mergeable": """
        WITH partials AS (
            SELECT event_type,
                   strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                   value, COUNT(*) AS cnt
            FROM events GROUP BY 1, 2, 3),
        merged AS (
            SELECT event_type, value, CAST(SUM(cnt) AS BIGINT) AS cnt
            FROM partials GROUP BY 1, 2),
        cum AS (
            SELECT event_type, value, cnt,
                   SUM(cnt) OVER (PARTITION BY event_type ORDER BY value
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND CURRENT ROW) AS cum,
                   SUM(cnt) OVER (PARTITION BY event_type) AS total
            FROM merged)
        SELECT event_type,
               MIN(CASE WHEN cum * 2 >= total THEN value END) AS p50,
               MIN(CASE WHEN cum * 10 >= total * 9 THEN value END) AS p90,
               MIN(CASE WHEN cum * 100 >= total * 99 THEN value END) AS p99,
               CAST(SUM(cnt) AS BIGINT) AS n_rows,
               COUNT(*) AS n_distinct_values
        FROM cum GROUP BY event_type
    """,
    "ext_cohort_retention": """
        WITH ev AS (SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
                    FROM events),
             firsts AS (SELECT user_id, MIN(day) AS cohort_day
                        FROM ev GROUP BY user_id)
        SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort,
               date_diff('day', cohort_day, day) AS day_offset,
               COUNT(DISTINCT ev.user_id) AS n_users
        FROM ev JOIN firsts ON ev.user_id = firsts.user_id
        GROUP BY cohort_day, day_offset
    """,
    "ext_rollup": f"""
        SELECT coalesce(o_orderpriority, '{ALL}') AS priority,
               coalesce(o_orderstatus, '{ALL}') AS status,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS total_cents
        FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
    """,
    "ext_cube": f"""
        SELECT coalesce(l_returnflag, '{ALL}') AS returnflag,
               coalesce(l_linestatus, '{ALL}') AS linestatus,
               COUNT(*) AS n_lines,
               ROUND(SUM(l_quantity), 4) AS sum_qty
        FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    "ext_grouping_sets": f"""
        SELECT coalesce(event_type, '{ALL}') AS event_type,
               coalesce(CAST(user_id AS VARCHAR), '{ALL}') AS user_id,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS total_cents
        FROM events
        GROUP BY GROUPING SETS ((event_type), (user_id), ())
    """,
    "ext_pivot": """
        SELECT user_id,
               COUNT(*) FILTER (event_type = 'click')    AS n_click,
               COUNT(*) FILTER (event_type = 'error')    AS n_error,
               COUNT(*) FILTER (event_type = 'purchase') AS n_purchase,
               COUNT(*) FILTER (event_type = 'signup')   AS n_signup,
               COUNT(*) FILTER (event_type = 'view')     AS n_view
        FROM events GROUP BY user_id
    """,
    # exact integer-cent moments, same IEEE op order as the Spark side
    # (SUM over HUGEINT is exact; see stats_by_segment docstring)
    "ext_stats_by_group": """
        WITH m AS (
            SELECT c_mktsegment, COUNT(*) AS n,
                   SUM(CAST(FLOOR(c_acctbal * 100 + 0.5) AS HUGEINT)) AS s,
                   SUM(CAST(FLOOR(c_acctbal * 100 + 0.5) AS HUGEINT)
                       * CAST(FLOOR(c_acctbal * 100 + 0.5) AS HUGEINT)) AS ss,
                   ROUND(median(c_acctbal), 4) AS med_bal,
                   ROUND(MIN(c_acctbal), 4) AS min_bal,
                   ROUND(MAX(c_acctbal), 4) AS max_bal
            FROM customer GROUP BY c_mktsegment)
        SELECT c_mktsegment, n,
               ROUND(CAST(s AS DOUBLE) / n / 100.0, 4) AS avg_bal,
               ROUND(SQRT(CAST(n * ss - s * s AS DOUBLE)
                          / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)))
                     / 100.0, 4) AS sd_bal,
               ROUND(CAST(n * ss - s * s AS DOUBLE)
                     / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))
                     / 10000.0, 2) AS var_bal,
               med_bal, min_bal, max_bal
        FROM m
    """,
    # exact DECIMAL/HUGEINT moment sums, IEEE ops mirrored from
    # corr_price_quantity (corr is scale-invariant, cents == dollars)
    "ext_corr_covar": """
        WITH m AS (
            SELECT l_returnflag, COUNT(*) AS n,
                   SUM(CAST(l_quantity AS HUGEINT)) AS sq,
                   SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5)
                       AS HUGEINT)) AS sp,
                   SUM(CAST(FLOOR(l_discount * 100 + 0.5) AS HUGEINT)) AS sd,
                   SUM(CAST(l_quantity AS HUGEINT)
                       * CAST(l_quantity AS HUGEINT)) AS sqq,
                   SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS HUGEINT)
                       * CAST(FLOOR(l_extendedprice * 100 + 0.5)
                              AS HUGEINT)) AS spp,
                   SUM(CAST(l_quantity AS HUGEINT)
                       * CAST(FLOOR(l_extendedprice * 100 + 0.5)
                              AS HUGEINT)) AS sqp,
                   SUM(CAST(l_quantity AS HUGEINT)
                       * CAST(FLOOR(l_discount * 100 + 0.5)
                              AS HUGEINT)) AS sqd
            FROM lineitem GROUP BY l_returnflag)
        SELECT l_returnflag,
               ROUND(CAST(n * sqp - sq * sp AS DOUBLE)
                     / (SQRT(CAST(n * sqq - sq * sq AS DOUBLE))
                        * SQRT(CAST(n * spp - sp * sp AS DOUBLE))),
                     6) AS corr_qty_price,
               ROUND(CAST(n * sqd - sq * sd AS DOUBLE)
                     / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))
                     / 100.0, 6) AS covar_qty_disc
        FROM m
    """,
    "ext_scalar_funcs": """
        SELECT o_orderkey,
               year(o_orderdate) AS o_year,
               month(o_orderdate) AS o_month,
               day(o_orderdate) AS o_day,
               quarter(o_orderdate) AS o_quarter,
               strftime(date_trunc('month', o_orderdate), '%Y-%m-%d')
                   AS month_start,
               upper(substr(o_orderpriority, 3, 20)) AS prio_name,
               concat_ws('/', o_orderstatus, o_orderpriority) AS status_prio,
               length(o_orderpriority) AS prio_len,
               ROUND(ABS(o_totalprice - 1000.0), 2) AS abs_diff,
               ROUND(SQRT(o_totalprice), 6) AS sqrt_price,
               CAST(FLOOR(o_totalprice / 100) AS BIGINT) AS price_bucket,
               CASE WHEN o_totalprice > 1000 THEN 'big' ELSE 'small' END
                   AS size_tag
        FROM orders
    """,
    "ext_hash_sample": f"""
        SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        FROM lineitem
        WHERE {_SAMPLE_HASH} % 100 < {SAMPLE_PCT}
    """,
    "ext_scalar_subquery": """
        SELECT c_custkey, c_acctbal FROM customer
        WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
    """,
    "ext_in_subquery": """
        SELECT s_suppkey, s_name FROM supplier
        WHERE s_nationkey IN (SELECT c_nationkey FROM customer
                              GROUP BY c_nationkey HAVING COUNT(*) >= 50)
    """,
    "ext_lateral_topk": """
        SELECT n.n_name, t.c_custkey, t.c_acctbal
        FROM nation n,
        LATERAL (SELECT c.c_custkey, c.c_acctbal
                 FROM customer c
                 WHERE c.c_nationkey = n.n_nationkey
                 ORDER BY c.c_acctbal DESC, c.c_custkey
                 LIMIT 2) t
    """,
    "ext_correlated_subquery": """
        SELECT c.c_custkey, c.c_nationkey FROM customer c
        WHERE c.c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
                             WHERE c2.c_nationkey = c.c_nationkey)
    """,
    "ext_percentiles": """
        SELECT c_mktsegment,
               ROUND(quantile_cont(c_acctbal, 0.25), 6) AS p25,
               ROUND(quantile_cont(c_acctbal, 0.5), 6) AS p50,
               ROUND(quantile_cont(c_acctbal, 0.9), 6) AS p90
        FROM customer GROUP BY c_mktsegment
    """,
    "ext_anomaly_mad": """
        WITH m AS (
            SELECT event_type, ROUND(quantile_cont(value, 0.5), 6) AS med
            FROM events GROUP BY event_type
        ),
        d AS (
            SELECT e.event_id, e.event_type, e.value, m.med
            FROM events e JOIN m USING (event_type)
        ),
        md AS (
            SELECT event_type,
                   ROUND(quantile_cont(abs(value - med), 0.5), 6) AS mad
            FROM d GROUP BY event_type
        )
        SELECT d.event_id, d.event_type, ROUND(d.value, 6) AS value,
               ROUND(0.6745 * (d.value - d.med) / md.mad, 6) AS robust_z
        FROM d JOIN md USING (event_type)
        WHERE md.mad > 0
          AND abs(ROUND(0.6745 * (d.value - d.med) / md.mad, 6)) > 3.5
    """,
    "ext_unpivot": """
        SELECT p_partkey, metric, value
        FROM (SELECT p_partkey, CAST(p_size AS DOUBLE) AS p_size,
                     p_retailprice
              FROM part)
        UNPIVOT (value FOR metric IN (p_size, p_retailprice))
    """,
    "ext_conditional_agg": """
        SELECT l_linestatus,
               COUNT(*) FILTER (l_discount > 0.05) AS n_discounted,
               COUNT(*) FILTER (l_returnflag = 'R') AS n_returned,
               bool_or(l_quantity > 49) AS any_bulk,
               ROUND(SUM(l_extendedprice) FILTER (l_tax > 0.04), 2)
                   AS high_tax_revenue
        FROM lineitem GROUP BY l_linestatus
    """,
    "ext_string_agg": """
        SELECT n_regionkey,
               string_agg(n_name, '|' ORDER BY n_name) AS nations,
               COUNT(*) AS n_nations
        FROM nation GROUP BY n_regionkey
    """,
    # Sketch operators: the estimate itself is engine-specific and is
    # never emitted; the output is the exact count plus an in-plan
    # within-tolerance boolean, so the oracle recomputes the exact
    # count and expects TRUE — a hard hash-matching accuracy check
    # without hashing sketch internals.
    "ext_approx_count_distinct": """
        SELECT event_type,
               COUNT(DISTINCT user_id) AS exact_users,
               TRUE AS within_tol
        FROM events GROUP BY event_type
    """,
    # the estimate is sketch-internal; the deterministic output is the
    # target grid, n, the PROVEN bound floor(n/K) + P, and the two
    # certificate booleans the in-plan exact counts must satisfy
    "ext_quantile_sketch": f"""
        WITH n1 AS (SELECT COUNT(*) AS n FROM lineitem)
        SELECT CAST(q.q_ppm AS BIGINT) AS q_ppm, n1.n AS n_rows,
               CAST(floor(n1.n / {QSK_K}) + {QSK_P} AS BIGINT) AS slack,
               TRUE AS ok_hi, TRUE AS ok_lo
        FROM (VALUES {", ".join(f"({q})" for q in QSK_TARGETS)}) q(q_ppm)
        CROSS JOIN n1
    """,
    "ext_hll_mergeable": """
        SELECT event_type,
               COUNT(DISTINCT CAST(ts AS DATE)) AS n_daily_sketches,
               COUNT(DISTINCT user_id) AS exact_users,
               TRUE AS within_tol
        FROM events GROUP BY event_type
    """,
}


def _hybrid_retrieval_oracle() -> str:
    """Composes the RRF oracle with the unrolled single-slate greedy
    diversification — the same integer argmax sequence as the Spark
    pipeline, step for step."""
    q4 = (
        "CAST(FLOOR(ROUND({x}, 4) * " + str(HR_Q) + " + 0.5) AS BIGINT)"
    ).format
    dot = (
        "list_dot_product(CAST(ea.embedding AS DOUBLE[]), "
        "CAST(eb.embedding AS DOUBLE[]))"
    )
    parts = [f"""
    WITH fused AS ({ORACLES["ext_rrf_fusion"]}),
    rankedf AS (
        SELECT doc_id,
               CAST(ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id)
                    AS BIGINT) AS fr
        FROM fused),
    cand AS (
        SELECT r.doc_id, r.fr,
               ({RRF_TOPK} + 1 - r.fr) * {HR_Q // RRF_TOPK} AS rel_q
        FROM rankedf r JOIN embeddings e ON e.vec_id = r.doc_id),
    sims AS (
        SELECT a.doc_id AS a_id, b.doc_id AS b_id, {q4(x=dot)} AS s
        FROM cand a JOIN cand b ON a.doc_id != b.doc_id
        JOIN embeddings ea ON ea.vec_id = a.doc_id
        JOIN embeddings eb ON eb.vec_id = b.doc_id),
    selall1 AS (
        SELECT CAST(1 AS BIGINT) AS step, doc_id, fr, rel_q,
               rel_q * 7 AS score
        FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY rel_q DESC,
                          doc_id) AS rn
              FROM cand) WHERE rn = 1)"""]
    for t in range(2, HR_K + 1):
        parts.append(f""",
    selall{t} AS (
        SELECT * FROM selall{t - 1}
        UNION ALL
        SELECT CAST({t} AS BIGINT) AS step, doc_id, fr, rel_q, score
        FROM (
            SELECT c.doc_id, c.fr, c.rel_q,
                   c.rel_q * 7 - m.max_s * 3 AS score,
                   ROW_NUMBER() OVER (ORDER BY c.rel_q * 7
                       - m.max_s * 3 DESC, c.doc_id) AS rn
            FROM cand c
            JOIN (SELECT s.a_id, MAX(s.s) AS max_s
                  FROM sims s JOIN selall{t - 1} p ON p.doc_id = s.b_id
                  GROUP BY 1) m ON m.a_id = c.doc_id
            WHERE NOT EXISTS (SELECT 1 FROM selall{t - 1} p
                              WHERE p.doc_id = c.doc_id)
        ) WHERE rn = 1)""")
    parts.append(f"""
    SELECT step, doc_id, fr AS fused_rank,
           ROUND(rel_q / {HR_Q}.0, 4) AS rel,
           ROUND(score / {HR_Q * 10}.0, 5) AS mmr
    FROM selall{HR_K}""")
    return "".join(parts)


QUERIES["pipeline_hybrid_retrieval"] = hybrid_retrieval_pipeline
ORACLES["pipeline_hybrid_retrieval"] = _hybrid_retrieval_oracle()
