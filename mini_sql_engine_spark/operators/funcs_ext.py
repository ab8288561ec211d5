"""Scalar-function packs and union-by-name schema evolution.

The reference has zero scalar functions (SURVEY.md §2.1 "Explicitly
ABSENT"); this pack covers the string/math/null-handling surface plus
`unionByName` schema evolution and a salted-aggregate entry whose
oracle is the UNSALTED SQL.

Determinism notes (the driver hash-compares values exactly):
- sqrt is IEEE-correctly-rounded everywhere and matches bit-for-bit;
  ln is libm-dependent, so it is rounded to 4 decimals and evaluated
  over the small supplier table (boundary-collision odds ~1e-11/row).
- squares are written x*x, not pow(x, 2) — pow's correct rounding is
  not guaranteed by either engine.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from mini_sql_engine_spark.catalog import load_table
from mini_sql_engine_spark.functions.skew import salted_aggregate


def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function sweep over customer names — pure projection,
    fused into the scan stage."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.lower("c_name").alias("lname"),
        F.upper("c_mktsegment").alias("useg"),
        F.length("c_name").cast("long").alias("name_len"),
        F.substring("c_name", 1, 8).alias("prefix"),
        F.replace(F.col("c_name"), F.lit("#"), F.lit("-")).alias("dashed"),
        F.reverse("c_name").alias("rev"),
        F.lpad("c_mktsegment", 12, ".").alias("padded"),
        F.levenshtein("c_mktsegment", F.lit("BUILDING")).cast("long").alias(
            "lev_building"
        ),
        F.concat_ws("|", "c_name", "c_mktsegment").alias("joined"),
    )


def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math-function sweep over supplier balances."""
    s = load_table(spark, sf_dir, "supplier")
    bal = F.col("s_acctbal")
    return s.select(
        "s_suppkey",
        F.round(F.abs(bal), 2).alias("abs_bal"),
        F.ceil(bal).cast("long").alias("ceil_bal"),
        F.floor(bal).cast("long").alias("floor_bal"),
        F.signum(bal).cast("long").alias("sign_bal"),
        F.round(F.sqrt(F.abs(bal)), 6).alias("sqrt_bal"),
        F.round(F.log(F.abs(bal) + F.lit(1.0)), 4).alias("ln_bal"),
        F.round(bal * bal, 4).alias("sq_bal"),
        (F.col("s_suppkey") % 7).cast("long").alias("mod7"),
        F.greatest(bal, F.lit(0.0)).alias("pos_part"),
        F.least(bal, F.lit(0.0)).alias("neg_part"),
    )


def null_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling sweep: the left join manufactures nulls (the base
    tables have none — FIXTURES.md §1.4), then COALESCE / NULLIF /
    CASE / IS NULL shape them."""
    cust = load_table(spark, sf_dir, "customer")
    big = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 4000)
        .groupBy("o_custkey")
        .agg(F.round(F.max("o_totalprice"), 2).alias("max_big"))
    )
    j = cust.join(big, cust.c_custkey == big.o_custkey, "left_outer")
    return j.select(
        "c_custkey",
        F.coalesce("max_big", F.lit(0.0)).alias("max_big_or_zero"),
        F.col("max_big").isNull().alias("no_big_orders"),
        F.when(F.col("max_big").isNotNull(), "whale")
        .otherwise("regular")
        .alias("tier"),
        F.nullif(F.round("c_acctbal", 0), F.lit(0.0)).alias("bal_nz"),
    )


def union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution: two part projections with different column
    sets/order, aligned by NAME (missing columns become null) — the
    multi-source ingestion pattern where file batches drift."""
    part = load_table(spark, sf_dir, "part")
    old_batch = part.filter(F.col("p_size") <= 25).select(
        "p_partkey", "p_brand", "p_size"
    )
    new_batch = part.filter(F.col("p_size") > 25).select(
        "p_size", "p_partkey", "p_brand", F.round("p_retailprice", 2).alias("price")
    )
    return old_batch.unionByName(new_batch, allowMissingColumns=True)


def salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregate over events; the oracle runs the
    plain GROUP BY — salting must be result-invariant."""
    events = load_table(spark, sf_dir, "events").select(
        "event_type",
        "user_id",
        F.col("value").cast("decimal(18,2)").alias("value_dec"),
    )
    out = salted_aggregate(
        events,
        keys=["event_type"],
        aggs={
            "n_events": ("count", "user_id"),
            "sum_value": ("sum", "value_dec"),
            "max_value": ("max", "value_dec"),
        },
        n_salts=8,
    )
    return out.select(
        "event_type",
        "n_events",
        F.round(F.col("sum_value").cast("double"), 2).alias("sum_value"),
        F.col("max_value").cast("double").alias("max_value"),
    )


def merge_upsert_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE/upsert as a composition (no Delta in this container):
    SCD2-style versioning of customer balances against the latest
    purchase per user. Updated keys emit the closed old version AND
    the new current version; untouched keys pass through.

    Scale shape: the updates side is a thin per-key aggregate; the
    merge itself is one left join on the dimension key + a union of
    two projections over the SAME joined relation (Catalyst reuses the
    join subplan). A lakehouse MERGE compiles to essentially this.
    """
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    latest = (
        ev.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(F.col("user_id").alias("c_custkey"), F.col("value").alias("new_bal"))
    )
    j = cust.join(latest, "c_custkey", "left_outer")
    updated_old = j.filter(F.col("new_bal").isNotNull()).select(
        "c_custkey",
        F.round("c_acctbal", 2).alias("bal"),
        F.lit(False).alias("is_current"),
    )
    updated_new = j.filter(F.col("new_bal").isNotNull()).select(
        "c_custkey",
        F.round("new_bal", 2).alias("bal"),
        F.lit(True).alias("is_current"),
    )
    untouched = j.filter(F.col("new_bal").isNull()).select(
        "c_custkey",
        F.round("c_acctbal", 2).alias("bal"),
        F.lit(True).alias("is_current"),
    )
    return updated_old.unionAll(updated_new).unionAll(untouched)


def try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe arithmetic: try_divide / try_* return NULL instead of
    raising on bad inputs — the posture for dirty data at scale, where
    one malformed row must not kill a 6-hour job. The zero divisor is
    manufactured (the data has none): revenue-per-unit where quantity
    is nulled-out for one returnflag."""
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.when(F.col("l_returnflag") == "A", F.lit(0.0)).otherwise(
        F.col("l_quantity")
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        # round via decimal: ROUND(double) is implemented differently
        # across engines exactly at .xxxx5 boundaries
        F.round(
            F.try_divide(F.col("l_extendedprice"), qty).cast("decimal(28,10)"), 4
        )
        .cast("double")
        .alias("price_per_unit"),
        F.try_divide(F.lit(1.0), F.col("l_quantity") - F.col("l_quantity")).alias(
            "div_zero_is_null"
        ),
    )


QUERIES: dict[str, Callable] = {
    "ext_try_arithmetic": try_arithmetic,
    "ext_merge_upsert": merge_upsert_scd2,
    "ext_string_funcs": string_funcs,
    "ext_math_funcs": math_funcs,
    "ext_null_funcs": null_funcs,
    "ext_union_by_name": union_by_name,
    "ext_salted_agg": salted_agg,
}

ORACLES: dict[str, str] = {
    "ext_try_arithmetic": """
        SELECT l_orderkey, l_linenumber,
               CAST(ROUND(CAST(l_extendedprice /
                     NULLIF(CASE WHEN l_returnflag = 'A' THEN 0.0
                                 ELSE l_quantity END, 0.0)
                     AS DECIMAL(28,10)), 4) AS DOUBLE) AS price_per_unit,
               1.0 / NULLIF(l_quantity - l_quantity, 0.0) AS div_zero_is_null
        FROM lineitem
    """,
    "ext_merge_upsert": """
        WITH latest AS (
            SELECT user_id AS c_custkey, value AS new_bal
            FROM (SELECT user_id, value,
                         ROW_NUMBER() OVER (PARTITION BY user_id
                                            ORDER BY ts DESC, event_id DESC)
                             AS rn
                  FROM events WHERE event_type = 'purchase') t
            WHERE rn = 1),
        j AS (SELECT c.c_custkey, c.c_acctbal, l.new_bal
              FROM customer c LEFT OUTER JOIN latest l USING (c_custkey))
        SELECT c_custkey, ROUND(c_acctbal, 2) AS bal, FALSE AS is_current
        FROM j WHERE new_bal IS NOT NULL
        UNION ALL
        SELECT c_custkey, ROUND(new_bal, 2) AS bal, TRUE AS is_current
        FROM j WHERE new_bal IS NOT NULL
        UNION ALL
        SELECT c_custkey, ROUND(c_acctbal, 2) AS bal, TRUE AS is_current
        FROM j WHERE new_bal IS NULL
    """,
    "ext_string_funcs": """
        SELECT c_custkey,
               LOWER(c_name) AS lname,
               UPPER(c_mktsegment) AS useg,
               LENGTH(c_name) AS name_len,
               SUBSTR(c_name, 1, 8) AS prefix,
               REPLACE(c_name, '#', '-') AS dashed,
               REVERSE(c_name) AS rev,
               LPAD(c_mktsegment, 12, '.') AS padded,
               levenshtein(c_mktsegment, 'BUILDING') AS lev_building,
               c_name || '|' || c_mktsegment AS joined
        FROM customer
    """,
    "ext_math_funcs": """
        SELECT s_suppkey,
               ROUND(ABS(s_acctbal), 2) AS abs_bal,
               CAST(CEIL(s_acctbal) AS BIGINT) AS ceil_bal,
               CAST(FLOOR(s_acctbal) AS BIGINT) AS floor_bal,
               CAST(SIGN(s_acctbal) AS BIGINT) AS sign_bal,
               ROUND(SQRT(ABS(s_acctbal)), 6) AS sqrt_bal,
               ROUND(LN(ABS(s_acctbal) + 1.0), 4) AS ln_bal,
               ROUND(s_acctbal * s_acctbal, 4) AS sq_bal,
               s_suppkey % 7 AS mod7,
               GREATEST(s_acctbal, 0.0) AS pos_part,
               LEAST(s_acctbal, 0.0) AS neg_part
        FROM supplier
    """,
    "ext_null_funcs": """
        SELECT c_custkey,
               COALESCE(max_big, 0.0) AS max_big_or_zero,
               max_big IS NULL AS no_big_orders,
               CASE WHEN max_big IS NOT NULL THEN 'whale'
                    ELSE 'regular' END AS tier,
               NULLIF(ROUND(c_acctbal, 0), 0.0) AS bal_nz
        FROM customer LEFT OUTER JOIN
             (SELECT o_custkey, ROUND(MAX(o_totalprice), 2) AS max_big
              FROM orders WHERE o_totalprice > 4000
              GROUP BY o_custkey) big
          ON c_custkey = big.o_custkey
    """,
    "ext_union_by_name": """
        SELECT p_partkey, p_brand, p_size, NULL AS price
        FROM part WHERE p_size <= 25
        UNION ALL
        SELECT p_partkey, p_brand, p_size, ROUND(p_retailprice, 2) AS price
        FROM part WHERE p_size > 25
    """,
    "ext_salted_agg": """
        SELECT event_type, COUNT(user_id) AS n_events,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE)
                   AS sum_value,
               CAST(MAX(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS max_value
        FROM events
        GROUP BY event_type
    """,
}
