"""Extended joins and set operations.

The reference only has inner equi-join via cross+filter (SURVEY.md §2.1
O6–O7). This module adds the join types a real pipeline needs — semi,
anti, left/full outer — and the set operations (union / intersect /
except). Semi/anti are first-class because dedup keeps/drops canonical
rows with exactly these (operators/dedup.py).

Scale notes:
- semi/anti joins shuffle only the distinct keys of the probe side and
  short-circuit on first match — strictly cheaper than inner join +
  distinct; Catalyst broadcasts the smaller side when under threshold;
- intersect/except compile to the same semi/anti machinery after a
  distinct — at 100 TB prefer the explicit semi/anti-join form on the
  key columns (shuffles keys, not whole rows), which is what these
  operators do;
- outer joins: null-safe downstream expressions required (coalesce on
  aggregated counts below) — the testdata is NOT NULL but outer joins
  reintroduce nulls (FIXTURES.md §1.4).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from mini_sql_engine_spark.catalog import content_token, load_table

# (layout kind, session id) -> full stage key of the CURRENTLY staged
# layout. In-memory only: a fresh process always re-stages from the
# parquet inputs (never reuses on-disk leftovers), and a content or
# sf_dir change within a session re-stages because the token differs.
_STAGED_LAYOUTS: dict = {}


def semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with ≥1 order in the 1-URGENT class."""
    customer = load_table(spark, sf_dir, "customer")
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return customer.join(
        urgent, customer.c_custkey == urgent.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


def anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no 1-URGENT order (non-empty at every sf — plain
    'no orders at all' is empty in this data, a trivially-passing check)."""
    customer = load_table(spark, sf_dir, "customer")
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return customer.join(
        urgent, customer.c_custkey == urgent.o_custkey, "left_anti"
    ).select("c_custkey", "c_mktsegment")


def left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders per customer including zero-order customers (null-safe)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))  # count(col) skips nulls
    )


def full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer over two event-type slices keyed by user."""
    events = load_table(spark, sf_dir, "events")
    clicks = (
        events.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_clicks"))
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_purchases"))
    )
    return (
        clicks.join(purchases, "user_id", "full_outer")
        .select(
            "user_id",
            F.coalesce("n_clicks", F.lit(0)).alias("n_clicks"),
            F.coalesce("n_purchases", F.lit(0)).alias("n_purchases"),
        )
    )


def union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct): high-balance ∪ BUILDING-segment customer keys."""
    customer = load_table(spark, sf_dir, "customer")
    a = customer.filter(F.col("c_acctbal") > 9000).select("c_custkey")
    b = customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    return a.union(b).distinct()


def union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL with provenance tag — schema-aligned concatenation."""
    customer = load_table(spark, sf_dir, "customer")
    a = (
        customer.filter(F.col("c_acctbal") > 9000)
        .select("c_custkey", F.lit("high_bal").alias("src"))
    )
    b = (
        customer.filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey", F.lit("building").alias("src"))
    )
    return a.unionByName(b)


def intersect_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users appearing in both orders and events (INTERSECT ≡ semi-join
    on distinct keys — the form that scales)."""
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey")
    )
    events = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("custkey")
    )
    return orders.intersect(events)


def except_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers who ordered but never produced an event (EXCEPT)."""
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey")
    )
    events = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("custkey")
    )
    return orders.subtract(events)  # EXCEPT DISTINCT semantics


def bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located join via a bucketed storage layout.

    Writes lineitem and orders bucketed (and sorted) on the order key,
    then joins the bucketed tables: both scans arrive pre-partitioned,
    so the join plans with NO Exchange above either side — the shuffle
    was paid once at write time and is amortized over every future
    query that joins on the key (tests/test_sources.py asserts the
    exchange-free plan). This is the layout strategy for a 100 TB fact
    table joined on the same key by many queries; at that scale the
    write is a one-time ingest step, not per-query work as here —
    round 10 makes that explicit: the ingest write runs ONCE per
    (session, input fingerprint) and repeat calls in the same session
    reuse the staged layout (an in-memory guard, so a fresh process
    always re-stages from the parquet inputs; a content change
    re-stages too).
    """
    from mini_sql_engine_spark.sources.io import write_bucketed

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    stage_key = (
        id(spark),
        "bkt",
        content_token(sf_dir, "lineitem"),
        content_token(sf_dir, "orders"),
    )
    if _STAGED_LAYOUTS.get(("bkt", id(spark))) != stage_key:
        write_bucketed(li, "bkt_lineitem", "l_orderkey", n_buckets=8)
        write_bucketed(orders, "bkt_orders", "o_orderkey", n_buckets=8)
        _STAGED_LAYOUTS[("bkt", id(spark))] = stage_key
    bl = spark.table("bkt_lineitem")
    bo = spark.table("bkt_orders")
    return (
        bl.join(bo, bl.l_orderkey == bo.o_orderkey)
        .groupBy("o_orderpriority")
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


def partitioned_pruned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning over a hive-partitioned layout.

    Orders are written partitioned by order year; the query joins the
    partitioned fact to a filtered dimension ON THE PARTITION COLUMN,
    so Spark plans a `dynamicpruning` subquery: the dim side runs
    first and only the matching year directories are ever read
    (plan-asserted in tests/test_plans.py). At 100 TB this is the
    difference between scanning one partition and scanning the table —
    the partitioned write is a one-time ingest step amortized across
    every pruned query, as with the bucketed layout above.
    """
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate").cast("long")
    )
    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    path = warehouse.rstrip("/") + "/orders_by_year"
    # one-time ingest, same per-(session, fingerprint) guard as the
    # bucketed layout above: fresh processes always re-stage
    stage_key = (id(spark), "pby", content_token(sf_dir, "orders"))
    if _STAGED_LAYOUTS.get(("pby", id(spark))) != stage_key:
        orders.write.mode("overwrite").partitionBy("o_year").parquet(path)
        _STAGED_LAYOUTS[("pby", id(spark))] = stage_key
    fact = spark.read.parquet(path)
    # the dim filter is on a DERIVED attribute (not the join key):
    # filtering on yr itself would let constraint propagation push a
    # static o_year = 1996 predicate and bypass the runtime pruning
    dim = (
        spark.range(1990, 2010)
        .select(
            F.col("id").alias("yr"),
            F.concat(F.lit("y"), F.col("id").cast("string")).alias("tag"),
        )
        .filter(F.col("tag") == "y1996")
    )
    return (
        fact.join(dim, fact.o_year == dim.yr)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("revenue"),
        )
    )


_BLOOM_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    # fixture-sized thresholds; production keeps the 10MB/10GB defaults
    # (a dim under 10MB broadcasts instead, which subsumes the bloom)
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10GB",
    "spark.sql.optimizer.runtime.bloomFilter."
    "applicationSideScanSizeThreshold": "0",
    "spark.sql.optimizer.runtimeFilter.semiJoinReduction.enabled": "false",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


def bloom_pruned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime Bloom-filter join pruning: a selective dimension filter
    (1-URGENT orders) is turned by Catalyst into a `bloom_filter_agg`
    subquery whose `might_contain` probe lands on the FACT SCAN — fact
    rows that cannot match are dropped BEFORE the join shuffle. At
    100 TB this is the difference between shuffling the whole fact
    table and shuffling the ~20% that survive the filter, when the
    build side is too big to broadcast (broadcast is forced off here
    to model that regime; a dim under the threshold would broadcast,
    which subsumes the bloom).

    The physical plan is forced (`executedPlan` is a lazy val pinned
    to this DataFrame) INSIDE the conf window, then the session confs
    are restored — planning-time flags must not leak into other
    queries. `tests/test_plans.py` asserts the might_contain probe.
    """
    old = {k: spark.conf.get(k, None) for k in _BLOOM_CONFS}
    for k, v in _BLOOM_CONFS.items():
        spark.conf.set(k, v)
    try:
        orders = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        li = load_table(spark, sf_dir, "lineitem")
        out = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n_items"),
                F.sum(F.col("l_quantity").cast("decimal(18,2)"))
                .cast("double")
                .alias("sum_qty"),
            )
        )
        out._jdf.queryExecution().executedPlan()  # pin the bloom plan
        return out
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def shuffle_hash_hint_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-strategy steering via hints: the orders⋈lineitem join is
    forced to a ShuffledHashJoin with `hint("shuffle_hash")` — at
    100 TB this is the right call when BOTH sides are large but one
    side's per-partition slice fits memory: it skips SortMergeJoin's
    two sorts (the dominant cost for a wide fact join) at the price
    of building a per-partition hash map. The hint is advisory
    steering of Catalyst, not a bypass — the plan test asserts it
    took effect and the oracle confirms results are unchanged.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    return (
        li.join(
            orders.hint("shuffle_hash"),
            li.l_orderkey == orders.o_orderkey,
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_qty"),
        )
    )


def join_size_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact join-cardinality forecast from per-key count tables:
    |A ⋈ B on k| = Σ_k cnt_A(k)·cnt_B(k). The forecast costs two THIN
    count aggregates (keys + one long each) — run it BEFORE paying for
    the join itself to catch a fan-out blowup (a key hot on both sides
    multiplies) while it is still cheap to react: salt, pre-aggregate,
    or bail. Output: (est_rows, actual_rows) — equal by identity, the
    operator proves its own forecast against the executed join.
    """
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    ca = orders.groupBy(F.col("o_custkey").alias("k")).agg(
        F.count(F.lit(1)).alias("na")
    )
    cb = cust.groupBy(F.col("c_custkey").alias("k")).agg(
        F.count(F.lit(1)).alias("nb")
    )
    est = ca.join(cb, "k").agg(
        F.sum(F.col("na") * F.col("nb")).alias("est_rows")
    )
    actual = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .agg(F.count(F.lit(1)).alias("actual_rows"))
    )
    return est.crossJoin(actual)


QUERIES: dict[str, Callable] = {
    "ext_join_size_forecast": join_size_forecast,
    "ext_bucketed_colocated_join": bucketed_colocated_join,
    "ext_partitioned_pruned_join": partitioned_pruned_join,
    "ext_semi_join": semi_join,
    "ext_anti_join": anti_join,
    "ext_left_outer_join": left_outer_join,
    "ext_full_outer_join": full_outer_join,
    "ext_union_distinct": union_distinct,
    "ext_union_all": union_all,
    "ext_intersect": intersect_keys,
    "ext_except": except_keys,
    "ext_bloom_pruned_join": bloom_pruned_join,
    "ext_shuffle_hash_join": shuffle_hash_hint_join,
}

ORACLES: dict[str, str] = {
    "ext_join_size_forecast": """
        WITH ca AS (SELECT o_custkey AS k, COUNT(*) AS na FROM orders
                    GROUP BY o_custkey),
        cb AS (SELECT c_custkey AS k, COUNT(*) AS nb FROM customer
               GROUP BY c_custkey),
        est AS (SELECT CAST(SUM(na * nb) AS BIGINT) AS est_rows
                FROM ca JOIN cb USING (k)),
        act AS (SELECT COUNT(*) AS actual_rows
                FROM orders JOIN customer ON o_custkey = c_custkey)
        SELECT est.est_rows, act.actual_rows FROM est, act
    """,
    "ext_bloom_pruned_join": """
        SELECT o_orderpriority, COUNT(*) AS n_items,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                   AS sum_qty
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderpriority = '1-URGENT'
        GROUP BY o_orderpriority
    """,
    "ext_shuffle_hash_join": """
        SELECT o_orderpriority, COUNT(*) AS n_items,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                   AS sum_qty
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority
    """,
    "ext_bucketed_colocated_join": """
        SELECT o_orderpriority,
               CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                                   AS DECIMAL(18,4))), 2) AS DOUBLE)
                   AS revenue
        FROM lineitem, orders
        WHERE l_orderkey = o_orderkey
        GROUP BY o_orderpriority
    """,
    "ext_partitioned_pruned_join": """
        SELECT o_orderpriority, COUNT(*) AS n_orders,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2)
                    AS DOUBLE) AS revenue
        FROM orders
        WHERE EXTRACT(YEAR FROM o_orderdate) = 1996
        GROUP BY o_orderpriority
    """,
    "ext_semi_join": """
        SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    """,
    "ext_anti_join": """
        SELECT c_custkey, c_mktsegment FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderpriority = '1-URGENT')
    """,
    "ext_left_outer_join": """
        SELECT c_custkey, COUNT(o_orderkey) AS n_orders
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    """,
    "ext_full_outer_join": """
        WITH clicks AS (
            SELECT user_id, COUNT(*) AS n_clicks FROM events
            WHERE event_type = 'click' GROUP BY user_id),
        purchases AS (
            SELECT user_id, COUNT(*) AS n_purchases FROM events
            WHERE event_type = 'purchase' GROUP BY user_id)
        SELECT COALESCE(c.user_id, p.user_id) AS user_id,
               COALESCE(n_clicks, 0) AS n_clicks,
               COALESCE(n_purchases, 0) AS n_purchases
        FROM clicks c FULL OUTER JOIN purchases p ON c.user_id = p.user_id
    """,
    "ext_union_distinct": """
        SELECT c_custkey FROM customer WHERE c_acctbal > 9000
        UNION
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    """,
    "ext_union_all": """
        SELECT c_custkey, 'high_bal' AS src FROM customer WHERE c_acctbal > 9000
        UNION ALL
        SELECT c_custkey, 'building' AS src FROM customer
        WHERE c_mktsegment = 'BUILDING'
    """,
    "ext_intersect": """
        SELECT o_custkey AS custkey FROM orders
        INTERSECT
        SELECT user_id AS custkey FROM events
    """,
    "ext_except": """
        SELECT o_custkey AS custkey FROM orders
        EXCEPT
        SELECT user_id AS custkey FROM events
    """,
}


GRID_R = 50  # Chebyshev radius; cell size = R so 3x3 cells cover it
GRID_SPACE = 10_000  # coordinate range per axis


def grid_spatial_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial self-join by GRID-CELL BLOCKING: documents get
    deterministic md5-derived integer coordinates in a
    GRID_SPACE² plane; pairs within Chebyshev distance GRID_R are
    found by hashing points into R-sized cells and joining each point
    against its 3×3 cell neighborhood (one side stamped into the 9
    neighbor cells, the other keyed on its home cell), then verifying
    the exact distance. Integer coordinates and Chebyshev (max-norm)
    distance keep the predicate engine-portable — no sqrt, no float.

    The oracle is the INDEPENDENT quadratic method (all pairs,
    distance filter), so a stamping bug that misses a neighbor cell
    breaks the hash.

    Scale notes (100 TB): the classic point-pair pattern — shuffle
    keys are cells (constant 9× stamping overhead on one side only),
    candidate count ∝ true neighbor density × 9, never n². Skewed
    cells (hotspots) salt like any hot join key; R-tree/quad-tree
    refinements change the cell function, not the join shape."""
    from mini_sql_engine_spark.functions.hashing import md5_long

    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("id")
    )
    pts = docs.select(
        "id",
        (md5_long(F.col("id").cast("string"), "gx") % GRID_SPACE).alias("x"),
        (md5_long(F.col("id").cast("string"), "gy") % GRID_SPACE).alias("y"),
    )
    home = pts.select(
        "id", "x", "y",
        F.floor(F.col("x") / GRID_R).alias("cx"),
        F.floor(F.col("y") / GRID_R).alias("cy"),
    )
    # stamp side: each point also claims the 8 surrounding cells (one
    # generator: a 9-struct offset array, exploded once)
    stamped = pts.select(
        "id", "x", "y",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                    for dx in (-1, 0, 1)
                    for dy in (-1, 0, 1)
                ]
            )
        ).alias("o"),
    ).select(
        "id", "x", "y",
        (F.floor(F.col("x") / GRID_R) + F.col("o.dx")).alias("cx"),
        (F.floor(F.col("y") / GRID_R) + F.col("o.dy")).alias("cy"),
    )
    a, b = stamped.alias("a"), home.alias("b")
    return (
        a.join(
            b,
            (F.col("a.cx") == F.col("b.cx"))
            & (F.col("a.cy") == F.col("b.cy"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .filter(
            F.greatest(
                F.abs(F.col("a.x") - F.col("b.x")),
                F.abs(F.col("a.y") - F.col("b.y")),
            )
            <= GRID_R
        )
        .select(
            F.col("a.id").alias("doc_a"),
            F.col("b.id").alias("doc_b"),
            F.greatest(
                F.abs(F.col("a.x") - F.col("b.x")),
                F.abs(F.col("a.y") - F.col("b.y")),
            ).cast("long").alias("cheb"),
        )
    )


QUERIES["ext_grid_spatial_join"] = grid_spatial_join

ORACLES["ext_grid_spatial_join"] = f"""
    WITH pts AS (
        SELECT doc_id AS id,
               CAST('0x' || substr(md5('gx:' || CAST(doc_id AS VARCHAR)),
                                   1, 15) AS BIGINT) % {GRID_SPACE} AS x,
               CAST('0x' || substr(md5('gy:' || CAST(doc_id AS VARCHAR)),
                                   1, 15) AS BIGINT) % {GRID_SPACE} AS y
        FROM documents)
    SELECT a.id AS doc_a, b.id AS doc_b,
           CAST(GREATEST(ABS(a.x - b.x), ABS(a.y - b.y)) AS BIGINT) AS cheb
    FROM pts a JOIN pts b ON a.id < b.id
    WHERE GREATEST(ABS(a.x - b.x), ABS(a.y - b.y)) <= {GRID_R}
"""


def yannakakis_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yannakakis semi-join reduction (Yannakakis 1981 — public) over
    the acyclic chain lineitem — orders — customer with selective
    filters on both leaves: a leaf→root→leaf SEMI-JOIN sweep removes
    every dangling tuple BEFORE the expensive joins, so the join phase
    shuffles only rows that appear in the final result — the classic
    optimality guarantee for acyclic queries, and at 100 TB the
    difference between shuffling the full orders table and shuffling
    the ~few-% that survive both filters. Spark's optimizer does not
    synthesize this rewrite (it pushes filters but not cross-relation
    semi-reductions; the Bloom-pruned join entry is the probabilistic
    cousin). The oracle is the plain 3-way join, which the reduced
    plan must equal EXACTLY — semi-join reduction never changes the
    answer, only the intermediate sizes.

    Output: per-nation surviving item counts and integer quantity
    mass."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey", "c_nationkey")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity") > 45
    ).select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    # reduction sweep: orders keeps only tuples that can join BOTH
    # ways (explicit aliases: the reduced relations share lineage with
    # the originals, so qualified names keep the re-joins unambiguous)
    ord_r = orders.alias("o1").join(
        cust.select(F.col("c_custkey").alias("ck")),
        F.col("o1.o_custkey") == F.col("ck"),
        "left_semi",
    )
    ord_r = ord_r.alias("o2").join(
        li.select(F.col("l_orderkey").alias("lk")),
        F.col("o2.o_orderkey") == F.col("lk"),
        "left_semi",
    )
    li_r = li.alias("l1").join(
        ord_r.select(F.col("o_orderkey").alias("rk")),
        F.col("l1.l_orderkey") == F.col("rk"),
        "left_semi",
    )
    joined = (
        li_r.alias("L")
        .join(ord_r.alias("O"), F.col("L.l_orderkey") == F.col("O.o_orderkey"))
        .join(cust.alias("C"), F.col("O.o_custkey") == F.col("C.c_custkey"))
    )
    return joined.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
    )


QUERIES["ext_yannakakis_reduction"] = yannakakis_reduction

# the plain join: semi-join reduction must not change the answer
ORACLES["ext_yannakakis_reduction"] = """
    SELECT c.c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE l.l_quantity > 45 AND c.c_mktsegment = 'BUILDING'
    GROUP BY c.c_nationkey
"""
