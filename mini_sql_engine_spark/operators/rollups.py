"""Extension operators: grouped aggregation, sort/limit/top-k, time windows.

The reference has no GROUP BY / ORDER BY / windows at all (SURVEY.md
§2.1 "explicitly absent" list); these are the driver-mandated extension
surface (§2.2 X rows) that everything downstream (text analysis, dedup)
builds on.

Scale notes (100 TB):
- grouped aggregation: Spark always does partial (map-side) aggregation
  before the shuffle, so a groupBy on a low-cardinality key (returnflag,
  event_type) shuffles only #partitions × #groups rows;
- global top-k (`orderBy().limit(k)`) compiles to TakeOrderedAndProject
  — each partition keeps its local k, the driver merges k × #partitions
  rows, never a full sort;
- per-group top-k uses a window over the group key: one shuffle on the
  key, no global sort;
- tumbling/sliding windows are pure projections (`F.window` computes the
  bucket per row) followed by grouped agg — no extra shuffle beyond the
  agg itself; sliding duplicates rows ×(duration/slide), which is the
  row-multiplication cost any engine pays;
- events.ts is session-zoned µs-precision TIMESTAMP after catalog
  normalization (`catalog.normalize_event_ts` handles both the current
  parquet timestamp[us]/NTZ form and the legacy TIMESTAMP(NANOS) form);
  oracles bucket via epoch_us so both engines see identical inputs
  (FIXTURES.md §1.4).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from mini_sql_engine_spark import oracle_shared
from mini_sql_engine_spark.catalog import load_table


def group_by_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: multi-agg over a 6-value grouping key."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )


def group_by_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY + HAVING: order-priority histogram, frequent classes only."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") > 100)
    )


def order_by_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 orders by price — TakeOrderedAndProject, no full sort.

    o_orderkey tiebreak keeps the row set deterministic under ties.
    """
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer via row_number window — one shuffle."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        load_table(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_totalprice").alias("totalprice"),
            F.col("rn").cast("long").alias("rnk"),
        )
    )


def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead analytics: per-user deltas between consecutive events."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        load_table(spark, sf_dir, "events")
        .withColumn("prev_value", F.lag("value").over(w))
        .withColumn("delta", F.round(F.col("value") - F.col("prev_value"), 2))
        .filter(F.col("prev_value").isNotNull())
        .select(
            "event_id",
            "user_id",
            F.round("value", 2).alias("val"),
            F.round("prev_value", 2).alias("prev_val"),
            "delta",
        )
    )


def tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily tumbling rollup of events: F.window projection + grouped agg."""
    return (
        load_table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
            ).alias("sum_cents"),
        )
        .select(
            # ISO string, not date: date/timestamp objects round-trip
            # differently through Spark vs DuckDB result fetches
            F.date_format("w.start", "yyyy-MM-dd").alias("day"),
            "event_type",
            "n_events",
            "sum_cents",
        )
    )


def sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """48h windows sliding by 24h — each event lands in exactly 2 buckets."""
    return (
        load_table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "2 days", "1 day").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd").alias("win_start"),
            "event_type",
            "n_events",
        )
    )


def session_window_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with a 1-hour inactivity gap, batch form.

    `F.session_window` works in batch too; per-user sessions need only a
    shuffle on user_id. Output avoids raw timestamps (ns-vs-µs oracle
    drift) by reporting per-session event counts and value sums.
    """
    return (
        load_table(spark, sf_dir, "events")
        .groupBy(F.session_window("ts", "1 hour").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
            ).alias("sum_cents"),
        )
        .select(
            "user_id",
            # unix_seconds over an explicit timestamp cast works whether
            # the session window was computed over TIMESTAMP or NTZ —
            # robust to either physical ts type independently of the
            # catalog normalization.
            F.unix_seconds(F.col("w.start").cast("timestamp")).alias("sess_start_s"),
            "n_events",
            "sum_cents",
        )
    )


def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup → purchase funnel: users whose first purchase follows
    their first signup within 7 days. Two thin aggregates (min ts per
    user per stage) then a key join — never a self-join of raw events."""
    events = load_table(spark, sf_dir, "events")
    first_signup = (
        events.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("purchase_ts")
    )
    converted = (
        first_signup.join(purchases, "user_id")
        .filter(
            (F.col("purchase_ts") >= F.col("signup_ts"))
            & (F.col("purchase_ts") <= F.col("signup_ts") + F.expr("INTERVAL 7 DAYS"))
        )
        .select("user_id")
        .distinct()
    )
    return first_signup.agg(
        F.count(F.lit(1)).alias("n_signup_users")
    ).crossJoin(converted.agg(F.count(F.lit(1)).alias("n_converted"))).withColumn(
        "conversion_rate",
        F.round(F.col("n_converted") / F.col("n_signup_users"), 6),
    )


def json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse the JSON props column and aggregate the extracted field."""
    return (
        load_table(spark, sf_dir, "events")
        .withColumn("k", F.from_json("props", "k INT").getField("k"))
        .groupBy("event_type")
        .agg(
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.max("k").alias("max_k"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )


def json_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON as a first-class VariantType (Spark 4).

    `parse_json` keeps the whole document as a binary-encoded variant —
    schema-on-read for heterogeneous metadata columns, no fixed struct
    declared up front — and `variant_get` extracts typed paths JVM-side
    (no per-row Python). Compare `json_props` above, which needs the
    `k INT` schema at parse time. At scale variant columns shred into
    columnar storage (parquet variant shredding) so typed path reads
    stay pruned.
    """
    return (
        load_table(spark, sf_dir, "events")
        .withColumn(
            "k",
            F.variant_get(F.parse_json("props"), "$.k", "int").cast("long"),
        )
        .groupBy((F.col("k") % 10).alias("k_mod"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
        )
    )


# DuckDB oracles. Events oracles normalize ts to µs precision first so
# both engines bucket the same values.
_EVENTS_US = oracle_shared.EVENTS_US

QUERIES: dict[str, Callable] = {
    "ext_group_by_agg": group_by_agg,
    "ext_group_by_having": group_by_having,
    "ext_order_by_limit": order_by_limit,
    "ext_topk_per_group": topk_per_group,
    "ext_window_lag_lead": window_lag_lead,
    "ext_tumbling_window": tumbling_window,
    "ext_sliding_window": sliding_window,
    "ext_session_window": session_window_batch,
    "ext_json_props": json_props,
    "ext_json_variant": json_variant,
    "ext_funnel": funnel_conversion,
}

ORACLES: dict[str, str] = {
    "ext_group_by_agg": """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               ROUND(SUM(l_extendedprice), 2) AS sum_price,
               ROUND(AVG(l_discount), 6) AS avg_disc,
               COUNT(*) AS cnt
        FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
    "ext_group_by_having": """
        SELECT o_orderpriority, COUNT(*) AS n_orders
        FROM orders GROUP BY o_orderpriority HAVING COUNT(*) > 100
    """,
    "ext_order_by_limit": """
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    "ext_topk_per_group": """
        SELECT custkey, orderkey, totalprice, rnk FROM (
            SELECT o_custkey AS custkey, o_orderkey AS orderkey,
                   o_totalprice AS totalprice,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey) AS rnk
            FROM orders) t
        WHERE rnk <= 3
    """,
    "ext_window_lag_lead": """
        SELECT event_id, user_id, ROUND(value, 2) AS val,
               ROUND(prev_value, 2) AS prev_val,
               ROUND(value - prev_value, 2) AS delta
        FROM (
            SELECT event_id, user_id, value, ts,
                   LAG(value) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS prev_value
            FROM events) t
        WHERE prev_value IS NOT NULL
    """,
    "ext_tumbling_window": """
        SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
               COUNT(*) AS n_events, CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
                   AS BIGINT) AS sum_cents
        FROM events GROUP BY 1, 2
    """,
    "ext_sliding_window": oracle_shared.SLIDING_WINDOW_ORACLE,
    "ext_funnel": f"""
        WITH e AS (SELECT * FROM {_EVENTS_US}),
        fs AS (SELECT user_id, MIN(ts) AS signup_ts FROM e
               WHERE event_type = 'signup' GROUP BY user_id),
        conv AS (
            SELECT DISTINCT fs.user_id
            FROM fs JOIN e p ON p.user_id = fs.user_id
            WHERE p.event_type = 'purchase'
              AND p.ts >= fs.signup_ts
              AND p.ts <= fs.signup_ts + INTERVAL 7 DAY)
        SELECT (SELECT COUNT(*) FROM fs) AS n_signup_users,
               (SELECT COUNT(*) FROM conv) AS n_converted,
               ROUND((SELECT COUNT(*) FROM conv) * 1.0
                     / (SELECT COUNT(*) FROM fs), 6) AS conversion_rate
    """,
    "ext_session_window": oracle_shared.SESSION_WINDOW_ORACLE,
    "ext_json_props": r"""
        SELECT event_type,
               ROUND(AVG(k), 4) AS avg_k, MAX(k) AS max_k, COUNT(*) AS cnt
        FROM (SELECT event_type,
                     CAST(regexp_extract(props, '"k": (\d+)', 1) AS INT) AS k
              FROM events) t
        GROUP BY event_type
    """,
    "ext_json_variant": """
        SELECT k % 10 AS k_mod, COUNT(*) AS cnt,
               CAST(SUM(k) AS BIGINT) AS sum_k, MAX(k) AS max_k
        FROM (SELECT CAST(json_extract(props, '$.k') AS BIGINT) AS k
              FROM events) t
        GROUP BY 1
    """,
}
