"""TPC-H-shaped marquee queries adapted to the driver's star schema.

The reference cannot run ANY of these (no GROUP BY, no ORDER BY, no
dates, no multi-way joins — SURVEY.md §2.1); they are the canonical
"would a real analyst's workload run on this engine" check, and the
classic plans Catalyst is built for. Columns the testdata lacks
(o_shippriority, l_suppkey costs on Q5's supp-nation equality, etc.)
are adapted, not faked; names follow the TPC-H query they mirror.

Scale notes:
- Q1: single scan + 4-group agg — partial aggregation makes the
  shuffle 4 rows/partition regardless of fact size;
- Q3: fact ⋈ orders ⋈ customer with selective dim filters — AQE picks
  broadcast for the filtered customer side, dynamic partition pruning
  applies when orders is date-partitioned (tests/test_plans.py);
- Q5: 5-way star join — region/nation broadcast always, the
  supplier-nation = customer-nation equality prunes before the fact
  join;
- Q6: pure scan-filter-agg, every predicate pushed to parquet.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from mini_sql_engine_spark.catalog import load_table


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", F.col("o_orderdate").cast("date").cast("string").alias("o_date"))
    )


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        ).agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            )
        )
    )


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4: orders with at least one late-shipping lineitem, by priority.

    EXISTS with a correlated non-equi term → left-semi join whose
    condition mixes the equi key (hash-partitionable) with the
    l_shipdate > o_orderdate residual. At scale the semi join shuffles
    only (l_orderkey, l_shipdate) — Catalyst prunes lineitem to 2 cols.
    """
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01"))
        & (F.col("o_orderdate") < F.lit("1996-10-01"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10: top-20 customers by revenue lost to returns in a quarter.

    nation broadcasts always; the orders date filter is pushed to
    parquet, so the fact join's build side is one quarter of orders.
    """
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-04-01"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            # decimal accumulation: exact, order-independent — double sums
            # round-trip differently between engines at .xx5 boundaries
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,4)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "revenue", F.round("c_acctbal", 2).alias("acctbal"), "n_name")
    )


def q12_priority_by_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 adapted (testdata has no l_shipmode): high- vs low-priority
    line counts per linestatus for a ship-year. Conditional aggregation
    over a single fact⋈orders join; both CASE sums fold into one
    partial-agg pass."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13: distribution of order counts per customer, including
    zero-order customers (left outer join with an extra join-side
    predicate, then COUNT of the nullable key)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "5-LOW"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14: share of one month's revenue from PROMO-type parts."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01"))
        & (F.col("l_shipdate") < F.lit("1996-10-01"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                2,
            ).alias("promo_revenue_pct")
        )
    )


def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18: customers with orders whose total quantity exceeds 250.

    The HAVING subquery is a thin (l_orderkey, sum_qty) aggregate —
    at scale it's the only full-fact shuffle; the survivors (<1% of
    orders) then drive broadcast joins against orders and customer.
    """
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            F.col("o_orderkey").alias("orderkey"),
            F.round("o_totalprice", 2).alias("totalprice"),
            "sum_qty",
        )
        .orderBy(F.col("totalprice").desc(), F.col("orderkey"))
        .limit(20)
    )


def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 adapted (no shipmode/container): revenue from three OR'd
    brand/size/quantity bands. The shared l_partkey = p_partkey equi
    conjunct is extractable from the disjunction, so Catalyst still
    plans a hash join with the OR as a post-join residual filter."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    j = li.join(part, li.l_partkey == part.p_partkey)
    band = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 15)
        )
        | (
            (F.col("p_brand") == "Brand#15")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 25)
        )
        | (
            (F.col("p_brand") == "Brand#22")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 35)
        )
    )
    return j.filter(band).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue")
    )


def q22_inactive_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22: per-nation count/balance of above-average-balance customers
    who never placed an order. Scalar-subquery average (broadcast as a
    1-row cross join) + left-anti join against orders keys."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7: shipping volume between two nations, by direction and year.

    The two nation lookups broadcast (25 rows); the OR of direction
    pairs is a residual on the joined row, so the plan stays a chain of
    hash joins over the date-filtered fact."""
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(n1, supp.s_nationkey == n1.s_nkey)
        .join(n2, cust.c_nationkey == n2.c_nkey)
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,4)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
    )


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15: supplier(s) with the maximum quarterly revenue — the
    revenue subplan is computed once and reused for both the per-key
    rows and the scalar max (1-row broadcast). Decimal accumulation
    makes the argmax deterministic."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    revenue = (
        li.groupBy("l_suppkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            ).alias("total_rev")
        )
        .localCheckpoint(eager=False)  # reused by the scalar max
    )
    max_rev = revenue.agg(F.max("total_rev").alias("max_rev"))
    supp = load_table(spark, sf_dir, "supplier")
    return (
        revenue.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_rev") == F.col("max_rev"))
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.round("total_rev", 2).cast("double").alias("total_rev"),
        )
    )


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17: revenue from lineitems whose quantity is below 20% of their
    part's average quantity.

    The correlated AVG threshold is rewritten in exact arithmetic:
    l_quantity < 0.2 * (sum/cnt)  ⇔  5 * cnt * l_quantity < sum,
    with decimal sums — a float threshold computed in two engines can
    disagree at the boundary and flip rows in or out."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#12")
    per_part = li.groupBy(F.col("l_partkey").alias("agg_partkey")).agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt_qty"),
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(per_part, li.l_partkey == F.col("agg_partkey"))
        .filter(
            (F.lit(5) * F.col("cnt_qty") * F.col("l_quantity").cast("decimal(18,2)"))
            < F.col("sum_qty")
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,4)")) / 7,
                2,
            )
            .cast("double")
            .alias("avg_yearly")
        )
    )


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 adapted (testdata has no partsupp): the part-supplier price
    list is derived from lineitem — cost(part, supp) = min unit price
    ever charged. For each size-15 part, the European supplier(s)
    matching the per-part minimum cost.

    Scale: the derived partsupp aggregates AFTER a semi-join that
    prunes lineitem to European suppliers (broadcast — supplier joined
    to nation/region is tiny), so the groupBy shuffle carries only the
    surviving (partkey, suppkey) pairs. The per-part min is a thin
    second aggregate over the derived relation; the argmin join back is
    an equi-join on (partkey, cost) — exact double equality is safe
    because both sides are the SAME min value, not a recomputation.
    """
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eur_supp = (
        supp.join(nation, supp.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    ps = (
        li.join(F.broadcast(eur_supp), li.l_suppkey == eur_supp.s_suppkey)
        .groupBy("l_partkey", "l_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("cost"))
        .localCheckpoint(eager=False)  # reused by the per-part min
    )
    min_cost = ps.groupBy(F.col("l_partkey").alias("mc_partkey")).agg(
        F.min("cost").alias("min_cost")
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    return (
        ps.join(
            min_cost,
            (ps.l_partkey == min_cost.mc_partkey)
            & (ps.cost == min_cost.min_cost),
        )
        .join(part, ps.l_partkey == part.p_partkey)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "cost")
        .orderBy(F.col("s_acctbal").desc(), "s_name", "p_partkey")
        .limit(100)
    )


def q8_national_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8: NATION_3's share of ECONOMY-part revenue sold into the ASIA
    market, by order year. Faithful to TPC-H (all columns exist).

    Scale: region/nation broadcast; the two selective dim filters
    (r_name, p_type) prune before the fact joins; the final agg is 2
    rows, so the ratio math is driver-trivial. Decimal accumulation +
    round-through-decimal keeps the share bit-identical across engines.
    """
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01"))
        & (F.col("o_orderdate") <= F.lit("1996-12-31"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    zero = F.lit(0).cast("decimal(18,4)")
    num = F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(zero))
    den = F.sum(vol)
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(n1, cust.c_nationkey == F.col("c_nkey"))
        .join(region, F.col("c_rkey") == region.r_regionkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(n2, supp.s_nationkey == F.col("s_nkey"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                (num.cast("double") / den.cast("double")).cast("decimal(28,10)"),
                6,
            )
            .cast("double")
            .alias("mkt_share")
        )
    )


def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 adapted (no partsupp.supplycost): profit = discounted revenue
    for parts named '%red%', by supplier nation and order year.

    Scale: the p_name LIKE filter is a scan-side predicate on the small
    part dim, which then broadcasts into the fact join; nation always
    broadcasts. One fact shuffle for the (nation, year) aggregate.
    """
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(nation, supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,4)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("sum_profit")
        )
    )


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 adapted (no partsupp): per-part revenue from Europe's
    suppliers, keeping parts worth more than the average part — the
    HAVING-against-global-scalar shape. TPC-H scales its Q11 fraction
    by 1/SF; comparing against the average is the scale-free
    equivalent, so the predicate stays selective at any data size.

    Scale: the region's supplier keys broadcast into the fact scan; the
    per-part aggregate is the only shuffle; the global total is a 1-row
    broadcast. Threshold compared in decimal on both sides — a float
    fraction of a float total flips boundary parts between engines.
    """
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    nat_supp = (
        supp.join(nation, supp.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    per_part = (
        li.join(F.broadcast(nat_supp), li.l_suppkey == nat_supp.s_suppkey)
        .groupBy("l_partkey")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("decimal(28,2)")
            .alias("value_d")
        )
        .localCheckpoint(eager=False)  # reused by the global total
    )
    total = per_part.agg(
        F.sum("value_d").cast("decimal(28,2)").alias("total_d"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value_d") * F.col("n_parts") > F.col("total_d"))
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("value_d").cast("double").alias("value"),
        )
    )


def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 adapted (no partsupp; supplier 'complaints' comment filter
    becomes a negative-balance filter): how many distinct suppliers
    ship each (brand, type, size) combination, excluding one brand,
    square sizes only, and excluding suppliers in arrears.

    Scale: COUNT(DISTINCT) plans as a two-phase expand+agg; the
    excluded-supplier list is a broadcast anti join, never a shuffle.
    """
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    bad_supp = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(F.broadcast(bad_supp), li.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
        .limit(50)
    )


def q20_excess_volume_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 adapted (no partsupp.availqty / receiptdate): suppliers who
    shipped more than 1.25x the average supplier's volume of 'small %'
    parts during 1996 — the nested-semi-join shape (supplier IN a
    HAVING subquery over a part-filtered fact slice), with the
    threshold made scale-free like Q11's.

    Scale: part filter broadcasts into the date-pruned fact scan; the
    per-supplier aggregate is tiny; the global average is a 1-row
    broadcast; the final semi join broadcasts the surviving keys. The
    4/5 integer form keeps the decimal comparison exact in both
    engines.
    """
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("small %")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    per_supp = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty"))
        .localCheckpoint(eager=False)  # reused by the global average
    )
    stats = per_supp.agg(
        F.sum("qty").cast("decimal(28,2)").alias("tq"),
        F.count(F.lit(1)).alias("nq"),
    )
    heavy = (
        per_supp.crossJoin(F.broadcast(stats))
        .filter(F.col("qty") * 4 * F.col("nq") > F.lit(5) * F.col("tq"))
        .select("l_suppkey")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        supp.join(F.broadcast(heavy), supp.s_suppkey == heavy.l_suppkey, "left_semi")
        .join(nation, supp.s_nationkey == nation.n_nationkey)
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


def q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 adapted (no receipt/commit dates — 'late' means shipped more
    than 60 days after the order date): European suppliers who were the
    ONLY late supplier on a multi-supplier finalized order.

    EXISTS → left-semi self-join (another supplier on the order);
    NOT EXISTS → left-anti self-join (another LATE supplier). The
    order-scoped lateness flags are computed once and checkpointed —
    the relation feeds the probe side and both self-join build sides.
    At scale all three consumers shuffle on l_orderkey, so the
    exchange is reused across the semi and anti joins.
    """
    orders_f = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    lo = (
        li.join(orders_f, li.l_orderkey == orders_f.o_orderkey)
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
            ).alias("late"),
        )
        .localCheckpoint(eager=False)  # probe + 2 self-join builds
    )
    others = lo.select(
        F.col("l_orderkey").alias("ok2"),
        F.col("l_suppkey").alias("sk2"),
        F.col("late").alias("late2"),
    )
    waiting = (
        lo.filter(F.col("late"))
        .join(
            others,
            (F.col("ok2") == F.col("l_orderkey"))
            & (F.col("sk2") != F.col("l_suppkey")),
            "left_semi",
        )
        .join(
            others.filter(F.col("late2")),
            (F.col("ok2") == F.col("l_orderkey"))
            & (F.col("sk2") != F.col("l_suppkey")),
            "left_anti",
        )
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    return (
        waiting.join(supp, waiting.l_suppkey == supp.s_suppkey)
        .join(nation, supp.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


QUERIES: dict[str, Callable] = {
    "tpch_q1": q1_pricing_summary,
    "tpch_q2": q2_min_cost_supplier,
    "tpch_q8": q8_national_market_share,
    "tpch_q9": q9_product_type_profit,
    "tpch_q11": q11_important_parts,
    "tpch_q16": q16_supplier_part_counts,
    "tpch_q20": q20_excess_volume_suppliers,
    "tpch_q21": q21_suppliers_kept_waiting,
    "tpch_q3": q3_shipping_priority,
    "tpch_q4": q4_order_priority,
    "tpch_q7": q7_volume_shipping,
    "tpch_q5": q5_local_supplier_volume,
    "tpch_q6": q6_forecast_revenue,
    "tpch_q10": q10_returned_items,
    "tpch_q12": q12_priority_by_linestatus,
    "tpch_q13": q13_customer_distribution,
    "tpch_q14": q14_promo_effect,
    "tpch_q15": q15_top_supplier,
    "tpch_q17": q17_small_quantity_revenue,
    "tpch_q18": q18_large_volume_customers,
    "tpch_q19": q19_disjunctive_predicates,
    "tpch_q22": q22_inactive_rich_customers,
}

ORACLES: dict[str, str] = {
    "tpch_q2": """
        WITH eur AS (
            SELECT l_partkey, s_name, s_acctbal, n_name,
                   MIN(l_extendedprice / l_quantity) AS cost
            FROM lineitem, supplier, nation, region
            WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
              AND n_regionkey = r_regionkey AND r_name = 'EUROPE'
            GROUP BY l_partkey, l_suppkey, s_name, s_acctbal, n_name)
        SELECT s_acctbal, s_name, n_name, p_partkey, p_name, cost
        FROM part, eur
        WHERE p_partkey = l_partkey AND p_size = 15
          AND cost = (SELECT MIN(cost) FROM eur e2
                      WHERE e2.l_partkey = eur.l_partkey)
        ORDER BY s_acctbal DESC, s_name, p_partkey
        LIMIT 100
    """,
    "tpch_q8": """
        SELECT o_year,
               CAST(ROUND(CAST(CAST(num AS DOUBLE) / CAST(den AS DOUBLE)
                               AS DECIMAL(28,10)), 6) AS DOUBLE) AS mkt_share
        FROM (
            SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year,
                   SUM(CASE WHEN n2.n_name = 'NATION_3'
                            THEN CAST(l_extendedprice * (1 - l_discount)
                                      AS DECIMAL(18,4))
                            ELSE CAST(0 AS DECIMAL(18,4)) END) AS num,
                   SUM(CAST(l_extendedprice * (1 - l_discount)
                            AS DECIMAL(18,4))) AS den
            FROM part, lineitem, orders, customer, supplier,
                 nation n1, nation n2, region
            WHERE p_partkey = l_partkey AND l_orderkey = o_orderkey
              AND o_custkey = c_custkey AND c_nationkey = n1.n_nationkey
              AND n1.n_regionkey = r_regionkey AND r_name = 'ASIA'
              AND l_suppkey = s_suppkey AND s_nationkey = n2.n_nationkey
              AND p_type = 'ECONOMY'
              AND o_orderdate >= TIMESTAMP '1995-01-01'
              AND o_orderdate <= TIMESTAMP '1996-12-31'
            GROUP BY 1) t
    """,
    "tpch_q9": """
        SELECT n_name AS nation,
               EXTRACT(YEAR FROM o_orderdate) AS o_year,
               CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                                   AS DECIMAL(18,4))), 2) AS DOUBLE)
                   AS sum_profit
        FROM lineitem, part, orders, supplier, nation
        WHERE l_partkey = p_partkey AND l_orderkey = o_orderkey
          AND l_suppkey = s_suppkey AND s_nationkey = n_nationkey
          AND p_name LIKE '%red%'
        GROUP BY 1, 2
    """,
    "tpch_q11": """
        WITH per_part AS (
            SELECT l_partkey,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                        AS DECIMAL(28,2)) AS value_d
            FROM lineitem, supplier, nation, region
            WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
              AND n_regionkey = r_regionkey AND r_name = 'EUROPE'
            GROUP BY l_partkey)
        SELECT l_partkey AS partkey, CAST(value_d AS DOUBLE) AS value
        FROM per_part
        WHERE value_d * (SELECT COUNT(*) FROM per_part)
              > (SELECT CAST(SUM(value_d) AS DECIMAL(28,2)) FROM per_part)
    """,
    "tpch_q16": """
        SELECT p_brand, p_type, p_size,
               COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem, part
        WHERE l_partkey = p_partkey
          AND p_brand <> 'Brand#1'
          AND p_size IN (1, 4, 9, 16, 25, 36, 49)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        LIMIT 50
    """,
    "tpch_q20": """
        WITH per_supp AS (
            SELECT l_suppkey,
                   SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty
            FROM lineitem, part
            WHERE l_partkey = p_partkey AND p_name LIKE 'small %'
              AND l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
            GROUP BY l_suppkey)
        SELECT s_name, n_name
        FROM supplier, nation
        WHERE s_nationkey = n_nationkey
          AND s_suppkey IN (
              SELECT l_suppkey FROM per_supp
              WHERE qty * 4 * (SELECT COUNT(*) FROM per_supp)
                    > 5 * (SELECT CAST(SUM(qty) AS DECIMAL(28,2))
                           FROM per_supp))
        ORDER BY s_name
    """,
    "tpch_q21": """
        WITH lo AS (
            SELECT l_orderkey, l_suppkey,
                   (l_shipdate > o_orderdate + INTERVAL 60 DAY) AS late
            FROM lineitem, orders
            WHERE l_orderkey = o_orderkey AND o_orderstatus = 'F')
        SELECT s_name, COUNT(*) AS numwait
        FROM lo l1, supplier, nation, region
        WHERE l1.late AND l1.l_suppkey = s_suppkey
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'EUROPE'
          AND EXISTS (SELECT 1 FROM lo l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lo l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 20
    """,
    "tpch_q1": """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)
                   AS sum_disc_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
                   AS sum_charge,
               ROUND(AVG(l_quantity), 6) AS avg_qty,
               ROUND(AVG(l_extendedprice), 6) AS avg_price,
               ROUND(AVG(l_discount), 6) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "tpch_q3": """
        SELECT l_orderkey,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               strftime(o_orderdate, '%Y-%m-%d') AS o_date
        FROM customer, orders, lineitem
        WHERE c_mktsegment = 'BUILDING'
          AND c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND o_orderdate < TIMESTAMP '1998-03-15'
          AND l_shipdate > TIMESTAMP '1998-03-15'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
    "tpch_q5": """
        SELECT n_name,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM customer, orders, lineitem, supplier, nation, region
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          AND c_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n_name
    """,
    "tpch_q6": """
        SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.03 AND 0.07
          AND l_quantity < 24
    """,
    "tpch_q7": """
        SELECT supp_nation, cust_nation, l_year,
               CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                                   AS DECIMAL(18,4))), 2) AS DOUBLE)
                   AS revenue
        FROM (
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   EXTRACT(YEAR FROM l_shipdate) AS l_year,
                   l_extendedprice, l_discount
            FROM supplier, lineitem, orders, customer, nation n1, nation n2
            WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
              AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
              AND c_nationkey = n2.n_nationkey
              AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
              AND l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1998-01-01') shipping
        GROUP BY supp_nation, cust_nation, l_year
    """,
    "tpch_q15": """
        WITH revenue AS (
            SELECT l_suppkey,
                   SUM(CAST(l_extendedprice * (1 - l_discount)
                            AS DECIMAL(18,4))) AS total_rev
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1996-04-01'
            GROUP BY l_suppkey)
        SELECT s_suppkey, s_name,
               CAST(ROUND(total_rev, 2) AS DOUBLE) AS total_rev
        FROM supplier, revenue
        WHERE s_suppkey = l_suppkey
          AND total_rev = (SELECT MAX(total_rev) FROM revenue)
    """,
    "tpch_q17": """
        SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) / 7, 2)
                    AS DOUBLE) AS avg_yearly
        FROM lineitem, part,
             (SELECT l_partkey AS agg_partkey,
                     SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
                     COUNT(*) AS cnt_qty
              FROM lineitem GROUP BY l_partkey) pq
        WHERE p_partkey = l_partkey AND agg_partkey = l_partkey
          AND p_brand = 'Brand#12'
          AND 5 * cnt_qty * CAST(l_quantity AS DECIMAL(18,2)) < sum_qty
    """,
    "tpch_q4": """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-07-01'
          AND o_orderdate < TIMESTAMP '1996-10-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority
    """,
    "tpch_q10": """
        SELECT c_custkey, c_name,
               CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                                   AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
               ROUND(c_acctbal, 2) AS acctbal, n_name
        FROM customer, orders, lineitem, nation
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1996-04-01'
          AND l_returnflag = 'R' AND c_nationkey = n_nationkey
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    "tpch_q12": """
        SELECT l_linestatus,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM orders, lineitem
        WHERE o_orderkey = l_orderkey
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY l_linestatus
    """,
    "tpch_q13": """
        SELECT c_count, COUNT(*) AS custdist
        FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
              FROM customer LEFT OUTER JOIN orders
                ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
              GROUP BY c_custkey) t
        GROUP BY c_count
    """,
    "tpch_q14": """
        SELECT ROUND(100.0 * SUM(CASE WHEN p_type = 'PROMO'
                                      THEN l_extendedprice * (1 - l_discount)
                                      ELSE 0.0 END)
                     / SUM(l_extendedprice * (1 - l_discount)), 2)
                   AS promo_revenue_pct
        FROM lineitem, part
        WHERE l_partkey = p_partkey
          AND l_shipdate >= TIMESTAMP '1996-09-01'
          AND l_shipdate < TIMESTAMP '1996-10-01'
    """,
    "tpch_q18": """
        SELECT c_custkey, c_name, o_orderkey AS orderkey,
               ROUND(o_totalprice, 2) AS totalprice, sum_qty
        FROM customer, orders,
             (SELECT l_orderkey, ROUND(SUM(l_quantity), 2) AS sum_qty
              FROM lineitem GROUP BY l_orderkey
              HAVING ROUND(SUM(l_quantity), 2) > 250) big
        WHERE big.l_orderkey = o_orderkey AND o_custkey = c_custkey
        ORDER BY totalprice DESC, orderkey
        LIMIT 20
    """,
    "tpch_q19": """
        SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem, part
        WHERE l_partkey = p_partkey
          AND ((p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
                AND l_quantity BETWEEN 1 AND 15)
            OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 25
                AND l_quantity BETWEEN 10 AND 25)
            OR (p_brand = 'Brand#22' AND p_size BETWEEN 1 AND 35
                AND l_quantity BETWEEN 20 AND 35))
    """,
    "tpch_q22": """
        SELECT c_nationkey, COUNT(*) AS numcust,
               ROUND(SUM(c_acctbal), 2) AS totacctbal
        FROM customer
        WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer
                           WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY c_nationkey
    """,
}
