"""Analytic window-function operators beyond lag/lead and top-k.

The reference has no window functions at all (SURVEY.md §2.1 "Explicitly
ABSENT"); these are the standard analyst surface (running totals, moving
averages, distribution ranks, first/last per entity, calendar rollups)
expressed with ``pyspark.sql.Window`` so Catalyst plans a single
sort-within-partition per frame.

Scale notes:
- Every window here partitions by a key (user_id / c_custkey / o_custkey)
  → one hash shuffle on the key, then a per-partition sort; no global
  sort, no driver involvement. Skewed users would need salting, but the
  tables' keys are near-uniform (FIXTURES.md §1.1).
- Running double-sums are accumulated in decimal: window aggregation
  order is engine-internal (DuckDB uses a segment tree, Spark a running
  accumulator), so float accumulation is only reproducible when the
  arithmetic is exact. `value` has 2-decimal inputs → decimal(18,2) is
  lossless.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from mini_sql_engine_spark.catalog import load_table


def running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative per-user spend over the event stream."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            "event_id",
            F.sum(F.col("value").cast("decimal(18,2)"))
            .over(w)
            .cast("double")
            .alias("running_spend"),
        )
    )


def moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-event moving average of event value per user (current + 3 prior).

    Sum and count are computed separately (exact decimal sum, long
    count) and divided once as doubles — dividing decimals directly has
    engine-specific result scales.
    """
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, Window.currentRow)
    )
    dec_sum = F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double")
    cnt = F.count(F.lit(1)).over(w)
    return (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            "event_id",
            F.round(dec_sum / cnt, 4).alias("avg_value_4"),
        )
    )


def ntile_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balance distribution ranks per nation: quartile, percent_rank,
    cume_dist. The (c_acctbal, c_custkey) order key is globally unique,
    so every rank is deterministic — and with unique keys
    percent_rank = (rn−1)/(n−1), cume_dist = rn/n, which are emitted
    as EXACT integer ppm (round-half-up on BIGINTs) rather than
    ROUND()ed doubles: at sf0.1 a cume_dist value lands on a 6-decimal
    tie where Spark (half-up) and DuckDB (half-even) disagree."""
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    wp = Window.partitionBy("c_nationkey")
    rn = F.row_number().over(w).cast("long")
    n = F.count(F.lit(1)).over(wp).cast("long")
    return (
        load_table(spark, sf_dir, "customer")
        .select(
            "c_custkey",
            "c_nationkey",
            F.ntile(4).over(w).cast("long").alias("bal_quartile"),
            rn.alias("rn"),
            n.alias("n"),
        )
        .select(
            "c_custkey",
            "c_nationkey",
            "bal_quartile",
            F.when(
                F.col("n") > 1,
                F.expr(
                    "(1000000 * (rn - 1) + (n - 1) div 2) div (n - 1)"
                ),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("bal_pct_rank_ppm"),
            F.expr("(1000000 * rn + n div 2) div n")
            .cast("long")
            .alias("bal_cume_ppm"),
        )
    )


def first_last_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each customer's first and last order price, plus their delta —
    one unbounded frame per customer, deduplicated to a per-customer row."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        load_table(spark, sf_dir, "orders")
        .select(
            F.col("o_custkey").alias("custkey"),
            F.round(F.first("o_totalprice").over(w), 2).alias("first_price"),
            F.round(F.last("o_totalprice").over(w), 2).alias("last_price"),
        )
        .distinct()
        .withColumn(
            "price_delta", F.round(F.col("last_price") - F.col("first_price"), 2)
        )
    )


def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar rollup: orders per (year, quarter, month) with exact
    decimal revenue. year/quarter/month land as longs to match the
    oracle's EXTRACT (BIGINT)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            F.year("o_orderdate").cast("long").alias("yr"),
            F.quarter("o_orderdate").cast("long").alias("qtr"),
            F.month("o_orderdate").cast("long").alias("mo"),
            "o_totalprice",
        )
        .groupBy("yr", "qtr", "mo")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("revenue"),
        )
    )


def trailing_time_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user trailing-7-day spend at every event — a RANGE frame.

    Unlike the ROWS frames above, the frame boundary here is on the
    TIME axis (µs since epoch), so each row's window holds a
    data-dependent number of rows — the canonical "trailing N days"
    feature for ML feature engineering. The ordering key is integer
    microseconds (`unix_micros`), which round-trips identically in both
    engines (verified over every sf0.01 row), so frame membership is
    exact; the frame sum accumulates in decimal.

    Scale: one hash shuffle on user_id + per-partition sort, the same
    cost profile as any keyed window; no state beyond the 7-day frame.
    """
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-7 * 86400 * 1_000_000, 0)
    )
    return load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.sum(F.col("value").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("trailing_7d_spend"),
    )


def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 build from an event log: collapse
    each user's consecutive runs of the same event_type into validity
    intervals [valid_from, valid_to) with an is_current flag — the
    standard CDC → dimension-table materialization.

    Two keyed windows over (ts, event_id): a lag() to keep only
    change-points (run starts), then a lead() over the survivors to close
    each interval at the next change. event_id breaks ts ties, so the
    order is total and the result engine-independent; timestamps are
    emitted as second-granularity strings (raw ns timestamps don't
    round-trip identically across engines).

    Scale: both windows shuffle on user_id ONCE — same partitioning, so
    Catalyst reuses the exchange; state per key is one row. This is the
    batch analog of the streaming dedup-then-sessionize pattern, and at
    100 TB it is strictly cheaper than the groupBy-collect_list
    alternative because nothing materializes a per-user array."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    runs = ev.withColumn("prev_type", F.lag("event_type").over(w)).filter(
        F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type"))
    )
    fmt = "yyyy-MM-dd HH:mm:ss"
    return runs.withColumn("next_ts", F.lead("ts").over(w)).select(
        "user_id",
        F.col("event_type").alias("state"),
        F.date_format("ts", fmt).alias("valid_from"),
        F.coalesce(
            F.date_format("next_ts", fmt), F.lit("9999-12-31 00:00:00")
        ).alias("valid_to"),
        F.col("next_ts").isNull().alias("is_current"),
    )


PIT_LOOKBACK_US = 3_600_000_000  # PIT lookup asks "state 1 hour ago"


def scd2_pit_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (as-of) lookup against the SCD2 state dimension:
    for every purchase, the user's state valid one hour BEFORE the
    purchase (coalesced to 'unknown' before the first interval).

    The Spark side uses the scalable PIT construction — NO interval
    join: state-change rows and lookup rows union into one stream,
    partitioned by user and ordered by (time, marker, event_id)
    (change rows sort before lookups at equal time, matching the
    [from, to) interval convention), and `last(state, ignorenulls)`
    over the running frame carries the in-effect state onto each
    lookup. One shuffle on user_id, O(1) window state — the pattern
    that beats a range join at 100 TB because nothing is quadratic in
    interval × lookup density. The oracle is the INDEPENDENT interval
    construction: the SCD2 validity table left-joined on
    valid_from <= t < valid_to."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    runs = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
        .select(
            "user_id",
            F.unix_micros("ts").alias("t"),
            F.lit(0).alias("marker"),
            "event_id",
            F.col("event_type").alias("state"),
            F.lit(None).cast("long").alias("purchase_id"),
        )
    )
    lookups = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        (F.unix_micros("ts") - PIT_LOOKBACK_US).alias("t"),
        F.lit(1).alias("marker"),
        "event_id",
        F.lit(None).cast("string").alias("state"),
        F.col("event_id").alias("purchase_id"),
    )
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("t", "marker", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        runs.unionByName(lookups)
        .withColumn("state_at", F.last("state", ignorenulls=True).over(w2))
        .filter(F.col("marker") == 1)
        .select(
            "user_id",
            "purchase_id",
            F.coalesce("state_at", F.lit("unknown")).alias("state_at"),
        )
    )


QUERIES: dict[str, Callable] = {
    "ext_scd2_history": scd2_history,
    "ext_scd2_pit_lookup": scd2_pit_lookup,
    "ext_trailing_time_window": trailing_time_window,
    "ext_running_total": running_total,
    "ext_moving_avg": moving_avg,
    "ext_ntile_percent_rank": ntile_percent_rank,
    "ext_first_last_order": first_last_order,
    "ext_date_funcs": date_functions,
}

ORACLES: dict[str, str] = {
    "ext_scd2_pit_lookup": f"""
        WITH marked AS (
            SELECT user_id, event_type, ts, event_id,
                   LAG(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS prev_type
            FROM events),
        runs AS (
            SELECT user_id, event_type, epoch_us(ts) AS t, event_id
            FROM marked
            WHERE prev_type IS NULL OR prev_type <> event_type),
        closed AS (
            SELECT user_id, event_type, t,
                   LEAD(t) OVER (PARTITION BY user_id
                                 ORDER BY t, event_id) AS next_t
            FROM runs),
        lookups AS (
            SELECT user_id, event_id,
                   epoch_us(ts) - {PIT_LOOKBACK_US} AS lt
            FROM events WHERE event_type = 'purchase')
        SELECT l.user_id, l.event_id AS purchase_id,
               COALESCE(s.event_type, 'unknown') AS state_at
        FROM lookups l LEFT JOIN closed s
          ON s.user_id = l.user_id
         AND s.t <= l.lt AND (s.next_t IS NULL OR l.lt < s.next_t)
    """,
    "ext_scd2_history": """
        WITH marked AS (
            SELECT user_id, event_type, ts, event_id,
                   LAG(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS prev_type
            FROM events),
        runs AS (
            SELECT user_id, event_type, ts, event_id FROM marked
            WHERE prev_type IS NULL OR prev_type <> event_type),
        closed AS (
            SELECT user_id, event_type, ts,
                   LEAD(ts) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS next_ts
            FROM runs)
        SELECT user_id, event_type AS state,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
               COALESCE(strftime(next_ts, '%Y-%m-%d %H:%M:%S'),
                        '9999-12-31 00:00:00') AS valid_to,
               (next_ts IS NULL) AS is_current
        FROM closed
    """,
    "ext_trailing_time_window": """
        SELECT user_id, event_id,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
                   PARTITION BY user_id ORDER BY epoch_us(ts)
                   RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS trailing_7d_spend
        FROM events
    """,
    "ext_running_total": """
        SELECT user_id, event_id,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS running_spend
        FROM events
        WHERE event_type = 'purchase'
    """,
    "ext_moving_avg": """
        SELECT user_id, event_id,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
                     / COUNT(*) OVER w, 4) AS avg_value_4
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
    """,
    "ext_ntile_percent_rank": """
        SELECT c_custkey, c_nationkey, bal_quartile,
               CASE WHEN n > 1 THEN
                   (1000000 * (rn - 1) + (n - 1) // 2) // (n - 1)
                   ELSE 0 END AS bal_pct_rank_ppm,
               (1000000 * rn + n // 2) // n AS bal_cume_ppm
        FROM (
            SELECT c_custkey, c_nationkey,
                   NTILE(4) OVER w AS bal_quartile,
                   CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
                   CAST(COUNT(*) OVER (PARTITION BY c_nationkey)
                        AS BIGINT) AS n
            FROM customer
            WINDOW w AS (PARTITION BY c_nationkey
                         ORDER BY c_acctbal, c_custkey))
    """,
    "ext_first_last_order": """
        SELECT custkey, first_price, last_price,
               ROUND(last_price - first_price, 2) AS price_delta
        FROM (
            SELECT DISTINCT o_custkey AS custkey,
                   ROUND(FIRST_VALUE(o_totalprice) OVER w, 2) AS first_price,
                   ROUND(LAST_VALUE(o_totalprice) OVER w, 2) AS last_price
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                         ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND UNBOUNDED FOLLOWING)
        ) t
    """,
    "ext_date_funcs": """
        SELECT EXTRACT(YEAR FROM o_orderdate) AS yr,
               EXTRACT(QUARTER FROM o_orderdate) AS qtr,
               EXTRACT(MONTH FROM o_orderdate) AS mo,
               COUNT(*) AS n_orders,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2)
                    AS DOUBLE) AS revenue
        FROM orders
        GROUP BY 1, 2, 3
    """,
}
