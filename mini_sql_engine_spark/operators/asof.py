"""As-of and range joins — time-series operators Spark lacks natively.

The reference has neither (SURVEY.md §2.1 lists joins as cross +
equi-filter only); both are staples of event/market-data pipelines, so
they are implemented Spark-first as compositions of built-in operators
(SURVEY.md §2.2 "custom operators" guidance — composition before UDF):

- as-of join: the classic union + partitioned-window encoding. Both
  sides are unioned on (key, time) with a side marker, then one window
  per key ordered by (time, side) carries the most recent left-side
  attributes forward (`last(col, ignorenulls=True)`). ONE shuffle on
  the join key, no range blow-up, no per-row Python — at 100 TB this
  is a single sort-merge pass per key partition, and skewed keys are
  handled by AQE the same as any other shuffle. Equal timestamps sort
  the order row first, i.e. a trade at t matches a quote at t (<=
  semantics, matching DuckDB ASOF's `>=` condition).

- range join: band lookup via broadcast nested-loop join against a
  tiny literal bounds table — the plan Spark picks automatically when
  the build side is broadcast; the fact side never shuffles.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from mini_sql_engine_spark.functions.frames import jvm_rows
from mini_sql_engine_spark.catalog import load_table

VALUE_BANDS: list[tuple[str, float, float]] = [
    ("low", 0.0, 100.0),
    ("mid", 100.0, 250.0),
    ("high", 250.0, 500.0),
    ("whale", 500.0, float("inf")),
]


def asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each event: the user's most recent order at-or-before the
    event time (inner as-of). Returns one row per matched event."""
    events = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        "event_id",
        F.lit(1).alias("is_event"),
        F.lit(None).cast("long").alias("o_orderkey"),
        F.lit(None).cast("double").alias("o_totalprice"),
    )
    # one order per (user, date): max orderkey wins — both engines would
    # otherwise tie-break equal timestamps arbitrarily
    dw = Window.partitionBy("o_custkey", "o_orderdate").orderBy(
        F.col("o_orderkey").desc()
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(dw))
        .filter(F.col("rn") == 1)
        .select(
            F.col("o_custkey").alias("k"),
            F.col("o_orderdate").alias("t"),
            F.lit(None).cast("long").alias("event_id"),
            F.lit(0).alias("is_event"),
            "o_orderkey",
            "o_totalprice",
        )
    )
    w = (
        Window.partitionBy("k")
        .orderBy("t", "is_event")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = events.unionByName(orders).select(
        "k",
        "event_id",
        "is_event",
        F.last("o_orderkey", ignorenulls=True).over(w).alias("last_orderkey"),
        F.last("o_totalprice", ignorenulls=True).over(w).alias("last_totalprice"),
    )
    return (
        merged.filter((F.col("is_event") == 1) & F.col("last_orderkey").isNotNull())
        .select(
            "event_id",
            F.col("k").alias("user_id"),
            F.col("last_orderkey").alias("o_orderkey"),
            F.col("last_totalprice").alias("o_totalprice"),
        )
    )


def range_join_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bin event values into literal bands via broadcast range join."""
    spark_bands = jvm_rows(
        spark, [(n, lo, hi) for n, lo, hi in VALUE_BANDS], "band string, lo double, hi double"
    )
    events = load_table(spark, sf_dir, "events")
    return (
        events.join(
            F.broadcast(spark_bands),
            (events.value >= F.col("lo")) & (events.value < F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
            ).alias("total_cents"),
        )
    )


_BANDS_VALUES = ", ".join(
    f"('{n}', {lo}, {'1e308' if hi == float('inf') else hi})"
    for n, lo, hi in VALUE_BANDS
)

QUERIES: dict[str, Callable] = {
    "ext_asof_join": asof_join,
    "ext_range_join": range_join_bands,
}

ORACLES: dict[str, str] = {
    # DuckDB ASOF JOIN: latest order with o_orderdate <= ts per user
    "ext_asof_join": """
        WITH o AS (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate
                                         ORDER BY o_orderkey DESC) AS rn
            FROM orders)
        SELECT e.event_id, e.user_id, o.o_orderkey, o.o_totalprice
        FROM events e
        ASOF JOIN (SELECT * FROM o WHERE rn = 1) o
          ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    """,
    "ext_range_join": f"""
        WITH bands(band, lo, hi) AS (VALUES {_BANDS_VALUES})
        SELECT band, COUNT(*) AS n_events,
               CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS total_cents
        FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
        GROUP BY band
    """,
}
