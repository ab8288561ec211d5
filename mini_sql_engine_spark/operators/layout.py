"""Storage-layout planning operators: zone maps, compaction, Z-order.

The reference engine stores one CSV per table and scans all of it for
every query (SURVEY.md §2.1 O2); at 100 TB the difference between a
scan and a fast scan IS the physical layout — file-level min/max zone
maps, right-sized files, and multi-column clustering. These operators
are the PLANNING side of that story, each expressed as a pure
DataFrame computation with an exact DuckDB oracle:

- ``ext_zone_map_pruning``: builds per-zone min/max statistics (the
  logical form of parquet footer / lakehouse manifest stats) under the
  table's NATIVE order and under a re-clustered order, and forecasts
  how many zones a given predicate could skip in each. The operator
  makes the case for re-clustering with numbers, not folklore.
- ``ext_compaction_plan``: bin-packs micro-zones into target-sized
  output files by a running-sum assignment — the planning pass of
  OPTIMIZE/compaction on any lakehouse table.
- ``ext_zorder_clustering``: interleaves two columns' bits into a
  Morton code, blocks the table in Morton order, and measures per-block
  min/max range coverage on BOTH dimensions vs a single-column sort —
  the measurement that justifies Z-ordering for two-predicate scans.

All outputs are integers (counts, parts-per-million coverage) so the
driver's repr-exact hash compare cannot be tripped by float reduction
order; per-element normalizations are single IEEE ops from embedded
literals, identical in both engines.

Scale notes (100 TB):
- zone stats are one grouped agg (map-side combinable) over the zone
  key; the stats table is zones-sized (~files-sized), i.e. tiny
  relative to data, exactly like a manifest;
- the compaction plan runs entirely on that stats table — planning
  never touches data rows, which is what makes OPTIMIZE cheap to plan
  even on petabyte tables;
- Z-order blocking at production scale is `repartitionByRange` on the
  Morton key + `sortWithinPartitions` (range exchange, no global
  sort); here blocks come from one window over the Morton order, and
  the quality metric (sum of block range widths) aggregates map-side.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from mini_sql_engine_spark.catalog import load_table
from mini_sql_engine_spark.functions.ranking import (
    ntile_expr,
    range_lag,
    range_prefix,
)

# --- zone maps ------------------------------------------------------

ZONES = 50  # zones per layout (stand-in for files / row-groups)
PRICE_CUT = 450_000.0  # forecast predicate: o_totalprice > PRICE_CUT

# --- compaction -----------------------------------------------------

ZONE_KEYS = 100  # orders per micro-zone (ingest batch stand-in)
TARGET_ROWS = 5_000  # target rows per compacted output file

# --- Z-order --------------------------------------------------------

MORTON_BITS = 16
Q_SCALE = 1310.0  # (l_quantity - 1) * Q_SCALE  < 2^16 (qty <= 50)
P_BASE = 900.0  # l_extendedprice lower bound across all sf
P_SCALE = 0.6  # (price - P_BASE) * P_SCALE < 2^16 (price <= ~110k)
BLOCK_ROWS = 1_000  # rows per storage block in the clustering metric


def zone_map_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skip-forecast for ``o_totalprice > PRICE_CUT`` under two layouts.

    Layout "native": zones follow the stored order (orderkey ranges —
    ingest order). Layout "clustered": zones follow an ntile over
    o_totalprice (what re-clustering by the predicate column would
    produce). For each, the per-zone max decides skippability; the
    2-row summary is the before/after business case: near-zero zones
    skip in ingest order, nearly all skip after clustering."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    # exact ntile replay on range-partitioned ranks: the orders ladder
    # is entity-scaled, so neither layout's zoning may funnel through
    # a single-partition window sort
    native = range_prefix(
        orders, ["o_orderkey"], total_rows_col="_n"
    ).withColumn("zone", ntile_expr("rnk", "_n", ZONES).cast("int"))
    clustered = range_prefix(
        orders, ["o_totalprice", "o_orderkey"], total_rows_col="_n"
    ).withColumn("zone", ntile_expr("rnk", "_n", ZONES).cast("int"))

    def summarize(df: DataFrame, layout: str) -> DataFrame:
        stats = df.groupBy("zone").agg(
            F.count("*").alias("n_rows"), F.max("o_totalprice").alias("zmax")
        )
        return stats.agg(
            F.lit(layout).alias("layout"),
            F.count("*").cast("long").alias("n_zones"),
            F.sum((F.col("zmax") <= PRICE_CUT).cast("long")).alias(
                "zones_skippable"
            ),
            F.sum("n_rows").alias("rows_total"),
            F.sum(
                F.when(F.col("zmax") <= PRICE_CUT, F.col("n_rows")).otherwise(0)
            ).alias("rows_skipped"),
        )

    return summarize(native, "native").unionByName(
        summarize(clustered, "clustered")
    )


def compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bin-pack per-zone row counts into TARGET_ROWS-sized output files.

    Zones (= small ingest files) are walked in key order; a zone's file
    id is floor(rows_before_it / TARGET_ROWS) — the streaming bin-pack
    every OPTIMIZE planner uses. Runs entirely on the zones-sized stats
    table; data rows are never touched during planning."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    zones = li.groupBy(
        F.floor(F.col("l_orderkey") / ZONE_KEYS).cast("long").alias("zone")
    ).agg(F.count("*").alias("n_rows"))
    # rows-before-this-zone from range_prefix (the zones ladder scales
    # with the key domain — thin, but not one-task thin)
    planned = range_prefix(zones, ["zone"], sum_cols=("n_rows",)).withColumn(
        "file_id",
        F.floor(
            (F.col("cum_n_rows") - F.col("n_rows")) / TARGET_ROWS
        ).cast("long"),
    )
    return planned.groupBy("file_id").agg(
        F.count("*").cast("long").alias("n_zones"),
        F.sum("n_rows").alias("n_rows"),
        F.min("zone").alias("first_zone"),
        F.max("zone").alias("last_zone"),
    )


def _norm_q() -> F.Column:
    return F.floor((F.col("l_quantity") - 1.0) * Q_SCALE).cast("long")


def _norm_p() -> F.Column:
    return F.least(
        F.floor((F.col("l_extendedprice") - P_BASE) * P_SCALE).cast("long"),
        F.lit((1 << MORTON_BITS) - 1),
    )


def _morton(qn: F.Column, pn: F.Column) -> F.Column:
    """Interleave MORTON_BITS bits of two 16-bit ints into a Z-value."""
    out = F.lit(0).cast("long")
    for b in range(MORTON_BITS):
        out = (
            out
            + F.shiftleft(F.shiftright(qn, b).bitwiseAND(F.lit(1)), 2 * b)
            + F.shiftleft(F.shiftright(pn, b).bitwiseAND(F.lit(1)), 2 * b + 1)
        )
    return out


def _hilbert_np(xs, ys):
    """Hilbert-curve distance of grid points (xs, ys) on the
    2^MORTON_BITS square — the published xy2d algorithm (top-down
    quadrant walk with reflect/swap rotation) as ~30 numpy vector ops.
    Bijective on the grid, so d is unique per distinct point; exact
    int64 arithmetic, bit-identical to the oracle's chained-CTE
    replay (`_hilbert_sql`, generated from the same per-level loop).

    Why numpy and not a column expression: the recursion's rotation
    references x and y twice per level, so a single inlined expression
    doubles its tree per level (2^MORTON_BITS blowup — OOMs plan
    construction), and the chained-projection form materializing the
    walk state per level builds, but its generated code falls out of
    JIT/codegen limits and ran ~5 s for 600k rows at sf0.1 — the
    Arrow-batched vector loop below does the same rows in
    milliseconds. This is exactly the 'vectorized Pandas UDF when the
    built-ins genuinely can't express it cheaply' escape hatch."""
    import numpy as np

    n1 = (1 << MORTON_BITS) - 1
    x = np.asarray(xs, dtype=np.int64).copy()
    y = np.asarray(ys, dtype=np.int64).copy()
    d = np.zeros(len(x), dtype=np.int64)
    for lvl in range(MORTON_BITS - 1, -1, -1):
        s = 1 << lvl
        rx = (x >> lvl) & 1
        ry = (y >> lvl) & 1
        d += s * s * ((3 * rx) ^ ry)
        swap = ry == 0
        refl = swap & (rx == 1)
        nx = np.where(refl, n1 - y, y)
        ny = np.where(refl, n1 - x, x)
        x = np.where(swap, nx, x)
        y = np.where(swap, ny, y)
    return d


def _hilbert_sql(passthrough: str) -> str:
    """Chained-CTE DuckDB replay of `_hilbert`, generated from the
    SAME per-level loop so the two engines cannot drift: h15..h0 each
    update (hx, hy, hd) exactly as one unrolled level does."""
    n1 = (1 << MORTON_BITS) - 1
    ctes = [
        "h16 AS (SELECT qn AS hx, pn AS hy, CAST(0 AS BIGINT) AS hd, "
        f"qn, pn, {passthrough} FROM pts)"
    ]
    prev = "h16"
    for lvl in range(MORTON_BITS - 1, -1, -1):
        s = 1 << lvl
        rx = f"((hx >> {lvl}) & 1)"
        ry = f"((hy >> {lvl}) & 1)"
        ctes.append(
            f"h{lvl} AS (SELECT "
            f"CASE WHEN {ry} = 0 THEN CASE WHEN {rx} = 1 "
            f"THEN {n1} - hy ELSE hy END ELSE hx END AS hx, "
            f"CASE WHEN {ry} = 0 THEN CASE WHEN {rx} = 1 "
            f"THEN {n1} - hx ELSE hx END ELSE hy END AS hy, "
            f"hd + {s * s} * CAST(xor(3 * {rx}, {ry}) AS BIGINT) AS hd, "
            f"qn, pn, {passthrough} FROM {prev})"
        )
        prev = f"h{lvl}"
    return ",\n        ".join(ctes)


def _hilbert_relation(spark: SparkSession, sf_dir: str):
    """(base lineitem point relation, same + Arrow-computed `hd`).

    Split out so tests can assert the PRE-ladder plan (the
    range_prefix checkpoint truncates lineage, hiding the
    ArrowEvalPython node from the final plan string)."""
    import pandas as pd

    # hint-free form: the module's `from __future__ import annotations`
    # stringifies type hints, which pandas_udf's eval-type inference
    # can't resolve for a locally-imported pd
    hilbert_udf = F.pandas_udf(
        lambda xs, ys: pd.Series(_hilbert_np(xs.to_numpy(), ys.to_numpy())),
        "long",
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        _norm_q().alias("qn"),
        _norm_p().alias("pn"),
        "l_orderkey",
        "l_linenumber",
        "l_extendedprice",
        "l_quantity",
    )
    return li, li.withColumn("hd", hilbert_udf("qn", "pn"))


def hilbert_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert vs Z-order head-to-head on the SAME two-dimension
    skipping metric as `zorder_clustering`: block the table under each
    curve's order, report summed per-block min/max range width per
    dimension in ppm of the domain. The Hilbert curve never jumps
    (adjacent d values are always grid neighbors), so its blocks are
    tighter rectangles than Morton's — this is the quantified argument
    for choosing Hilbert clustering keys in a lakehouse layout.

    Scale notes (100 TB): the Hilbert value is an Arrow-batched
    vectorized pandas_udf (`_hilbert_np` — a pure map, no shuffle; see
    its docstring for why the expression form loses here), the Morton
    value stays a fused integer expression, and the blocking rank
    rides the range-partitioned `range_prefix` ladder — never a
    single-partition sort. Same plan shape as `zorder_clustering` at
    any scale factor."""
    li, hd = _hilbert_relation(spark, sf_dir)
    full = (1 << MORTON_BITS) - 1

    def blocks(df: DataFrame, order, layout: str) -> DataFrame:
        blk = range_prefix(df, list(order)).withColumn(
            "block", F.floor((F.col("rnk") - 1) / BLOCK_ROWS).cast("long")
        )
        per = blk.groupBy("block").agg(
            (F.max("qn") - F.min("qn")).alias("q_width"),
            (F.max("pn") - F.min("pn")).alias("p_width"),
        )
        return per.agg(
            F.lit(layout).alias("layout"),
            F.count("*").cast("long").alias("n_blocks"),
            F.floor(F.sum("q_width") * 1_000_000 / (F.count("*") * full))
            .cast("long")
            .alias("q_range_ppm"),
            F.floor(F.sum("p_width") * 1_000_000 / (F.count("*") * full))
            .cast("long")
            .alias("p_range_ppm"),
        )

    tiebreak = ["l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity"]
    hi = blocks(hd, ["hd", *tiebreak], "hilbert")
    zo = blocks(
        li.withColumn("z", _morton(F.col("qn"), F.col("pn"))),
        ["z", *tiebreak],
        "zorder",
    )
    return hi.unionByName(zo)


def zorder_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-dimension skipping quality: Z-order vs single-column sort.

    Blocks the table into BLOCK_ROWS-row storage blocks under (a) the
    Morton order of (quantity, price) and (b) a plain price sort, then
    reports each layout's summed per-block min/max range width on both
    dimensions as parts-per-million of the full domain. Small ppm on a
    dimension = a predicate on it skips most blocks. The price sort is
    perfect on price and useless on quantity; Z-order is good on BOTH —
    this output is that argument with numbers."""
    # (l_orderkey, l_linenumber) is NOT unique in the synthetic data,
    # and quantization can map two distinct rows to one z / pn — the
    # raw (price, quantity) pair completes a provably unique composite
    # (pinned by the suite's SPARK_GRAFT_CHECK_UNIQUE_ORDER guard,
    # which caught exactly one colliding pair at sf0.1). Without the
    # tie-break, the price_sorted layout's q_width could differ by
    # which of two same-pn rows lands at a block boundary.
    li = load_table(spark, sf_dir, "lineitem").select(
        _norm_q().alias("qn"),
        _norm_p().alias("pn"),
        "l_orderkey",
        "l_linenumber",
        "l_extendedprice",
        "l_quantity",
    )
    full = (1 << MORTON_BITS) - 1

    def blocks(df: DataFrame, order, layout: str) -> DataFrame:
        # range-partitioned global rank: the lineitem ladder is
        # entity-scaled, no single-partition sort
        blk = range_prefix(df, list(order)).withColumn(
            "block", F.floor((F.col("rnk") - 1) / BLOCK_ROWS).cast("long")
        )
        per = blk.groupBy("block").agg(
            (F.max("qn") - F.min("qn")).alias("q_width"),
            (F.max("pn") - F.min("pn")).alias("p_width"),
        )
        return per.agg(
            F.lit(layout).alias("layout"),
            F.count("*").cast("long").alias("n_blocks"),
            F.floor(F.sum("q_width") * 1_000_000 / (F.count("*") * full))
            .cast("long")
            .alias("q_range_ppm"),
            F.floor(F.sum("p_width") * 1_000_000 / (F.count("*") * full))
            .cast("long")
            .alias("p_range_ppm"),
        )

    tiebreak = ["l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity"]
    zo = blocks(
        li.withColumn("z", _morton(F.col("qn"), F.col("pn"))),
        ["z", *tiebreak],
        "zorder",
    )
    ps = blocks(li, ["pn", *tiebreak], "price_sorted")
    return zo.unionByName(ps)


TARGET_PART_BYTES = 128 * 1024 * 1024  # maxPartitionBytes-style target
NUM_W = 8  # bytes charged per numeric/timestamp column (uncompressed)


def partition_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-count advisor: per-table logical byte estimate
    (NUM_W bytes per numeric/timestamp column + exact octet length per
    string column, summed over rows) and the partition count that
    hits TARGET_PART_BYTES — the calculation behind
    spark.sql.files.maxPartitionBytes / shuffle.partitions sizing,
    run in-engine over the actual data. One map-side-combinable
    aggregate per table; the estimate is deliberately the UNCOMPRESSED
    logical width (what shuffles and fills executor memory), not the
    parquet on-disk size."""
    specs: list[tuple[str, list[str], list[str]]] = [
        # (table, numeric-ish columns, string columns)
        ("lineitem", ["l_orderkey", "l_partkey", "l_suppkey",
                      "l_linenumber", "l_quantity", "l_extendedprice",
                      "l_discount", "l_shipdate"], ["l_returnflag"]),
        ("orders", ["o_orderkey", "o_custkey", "o_totalprice",
                    "o_orderdate"], ["o_orderstatus", "o_orderpriority"]),
        ("events", ["event_id", "ts", "user_id", "value"],
         ["event_type", "props"]),
        ("documents", ["doc_id", "n_chars"], ["text", "lang", "source"]),
    ]
    out: DataFrame | None = None
    for table, nums, strs in specs:
        df = load_table(spark, sf_dir, table)
        row_bytes = F.lit(NUM_W * len(nums))
        for s in strs:
            row_bytes = row_bytes + F.coalesce(
                F.octet_length(F.col(s)), F.lit(0)
            )
        row = df.agg(
            F.lit(table).alias("table"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(row_bytes).cast("long").alias("est_bytes"),
            F.greatest(
                F.lit(1),
                F.ceil(F.sum(row_bytes) / TARGET_PART_BYTES),
            )
            .cast("long")
            .alias("rec_partitions"),
        )
        out = row if out is None else out.unionByName(row)
    assert out is not None
    return out


RLE_LAYOUTS: list[tuple[str, list[str]]] = [
    # (layout name, sort keys) — natural write order vs date-clustered
    ("by_custkey", ["o_custkey", "o_orderkey"]),
    ("by_date", ["o_orderdate", "o_orderkey"]),
]
RLE_COLS = ["o_custkey", "o_orderstatus", "o_orderpriority"]


def rle_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run-length layout advisor: for each candidate sort order, count
    each column's value RUNS (changes along the order) and the implied
    average run length — the number that decides whether a rewrite to
    a given clustering is worth it, since parquet's RLE/dictionary
    encoding and min-max pruning both pay off in proportion to run
    length. Sorting by customer makes o_custkey runs ~n/|customers|
    long; sorting by date collapses them to ~1 — the advisor puts
    exact numbers on that trade per column before anyone rewrites
    100 TB.

    Scale notes (100 TB): one range-partitioned lag pass per layout
    (functions.ranking.range_lag — per-partition lag + a tiny
    boundary-row stitch; never a single-task sort); the lag-compare
    is per-row. Counting runs needs no state beyond the previous row,
    so this is the cheapest possible probe of a rewrite's value —
    run it on a sampled fraction first at real scale.
    """
    orders = load_table(spark, sf_dir, "orders")
    out: DataFrame | None = None
    # Round 10: no per-layout checkpoint and no per-column fan-out.
    # The old shape lazily checkpointed each layout's 1-row aggregate
    # (so each column row wouldn't re-run the sort) — but a lazy
    # checkpoint's toRdd executes eagerly, SERIALIZING the two
    # layouts' range-lag passes. Instead each layout's aggregate is
    # unpivoted to its per-column rows with ONE in-plan stack() (the
    # aggregate subtree appears once per layout, not once per column)
    # and the layouts union into a single plan, so both range-lag
    # passes schedule concurrently in one job (guide §2: fewer, wider
    # jobs).
    stack_args = ", ".join(f"'{c}', runs_{c}" for c in RLE_COLS)
    for layout, keys in RLE_LAYOUTS:
        lagged = range_lag(orders, keys, tuple(RLE_COLS))
        flagged = lagged.select(
            *[
                (
                    (F.col(f"prev_{c}").isNull())
                    | (F.col(c) != F.col(f"prev_{c}"))
                )
                .cast("long")
                .alias(f"chg_{c}")
                for c in RLE_COLS
            ]
        )
        agg = flagged.agg(
            F.count(F.lit(1)).alias("n_rows"),
            *[F.sum(f"chg_{c}").alias(f"runs_{c}") for c in RLE_COLS],
        )
        rows = agg.select(
            F.lit(layout).alias("layout"),
            F.col("n_rows"),
            F.expr(
                f"stack({len(RLE_COLS)}, {stack_args})"
                " as (column, n_runs)"
            ),
        ).select(
            "layout",
            "column",
            "n_rows",
            "n_runs",
            F.round(F.col("n_rows") / F.col("n_runs"), 4).alias(
                "avg_run_len"
            ),
        )
        out = rows if out is None else out.unionByName(rows)
    assert out is not None
    return out


def _rle_oracle() -> str:
    parts = []
    for layout, keys in RLE_LAYOUTS:
        order = ", ".join(keys)
        chg = ", ".join(
            f"CAST(SUM(CASE WHEN prev_{c} IS NULL OR {c} != prev_{c} "
            f"THEN 1 ELSE 0 END) AS BIGINT) AS runs_{c}"
            for c in RLE_COLS
        )
        lags = ", ".join(
            f"LAG({c}) OVER (ORDER BY {order}) AS prev_{c}" for c in RLE_COLS
        )
        for c in RLE_COLS:
            parts.append(f"""
            SELECT '{layout}' AS layout, '{c}' AS "column",
                   n_rows, runs_{c} AS n_runs,
                   ROUND(n_rows / runs_{c} * 1.0, 4) AS avg_run_len
            FROM (
                SELECT COUNT(*) AS n_rows, {chg}
                FROM (SELECT *, {lags} FROM orders))""")
    return " UNION ALL ".join(parts)


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "ext_rle_advisor": rle_advisor,
    "ext_zone_map_pruning": zone_map_pruning,
    "ext_compaction_plan": compaction_plan,
    "ext_zorder_clustering": zorder_clustering,
    "ext_hilbert_clustering": hilbert_clustering,
    "ext_partition_advisor": partition_advisor,
}


_ADVISOR_SPECS = [
    ("lineitem", 8, ["l_returnflag"]),
    ("orders", 4, ["o_orderstatus", "o_orderpriority"]),
    ("events", 4, ["event_type", "props"]),
    ("documents", 2, ["text", "lang", "source"]),
]


def _advisor_oracle() -> str:
    rows = []
    for table, n_num, strs in _ADVISOR_SPECS:
        width = f"{NUM_W * n_num}" + "".join(
            f" + COALESCE(octet_length(encode({s})), 0)" for s in strs
        )
        rows.append(
            f"""
            SELECT '{table}' AS "table", COUNT(*) AS n_rows,
                   CAST(SUM({width}) AS BIGINT) AS est_bytes,
                   CAST(GREATEST(1, CEIL(SUM({width}) * 1.0
                        / {TARGET_PART_BYTES})) AS BIGINT)
                       AS rec_partitions
            FROM {table}"""
        )
    return " UNION ALL ".join(rows)


ORACLES: dict[str, str] = {
    "ext_rle_advisor": _rle_oracle(),
    "ext_partition_advisor": _advisor_oracle(),
    "ext_zone_map_pruning": f"""
        WITH native AS (
            SELECT o_totalprice,
                   ntile({ZONES}) OVER (ORDER BY o_orderkey) AS zone
            FROM orders),
        clustered AS (
            SELECT o_totalprice,
                   ntile({ZONES}) OVER (ORDER BY o_totalprice, o_orderkey)
                       AS zone
            FROM orders),
        ns AS (SELECT zone, COUNT(*) AS n_rows, MAX(o_totalprice) AS zmax
               FROM native GROUP BY zone),
        cs AS (SELECT zone, COUNT(*) AS n_rows, MAX(o_totalprice) AS zmax
               FROM clustered GROUP BY zone)
        SELECT 'native' AS layout, COUNT(*) AS n_zones,
               CAST(SUM(CASE WHEN zmax <= {PRICE_CUT} THEN 1 ELSE 0 END)
                    AS BIGINT) AS zones_skippable,
               CAST(SUM(n_rows) AS BIGINT) AS rows_total,
               CAST(SUM(CASE WHEN zmax <= {PRICE_CUT} THEN n_rows ELSE 0 END)
                    AS BIGINT) AS rows_skipped
        FROM ns
        UNION ALL
        SELECT 'clustered', COUNT(*),
               CAST(SUM(CASE WHEN zmax <= {PRICE_CUT} THEN 1 ELSE 0 END)
                    AS BIGINT),
               CAST(SUM(n_rows) AS BIGINT),
               CAST(SUM(CASE WHEN zmax <= {PRICE_CUT} THEN n_rows ELSE 0 END)
                    AS BIGINT)
        FROM cs
    """,
    "ext_compaction_plan": f"""
        WITH zones AS (
            SELECT CAST(floor(l_orderkey / {ZONE_KEYS}) AS BIGINT) AS zone,
                   COUNT(*) AS n_rows
            FROM lineitem GROUP BY 1),
        planned AS (
            SELECT zone, n_rows,
                   CAST(floor(COALESCE(SUM(n_rows) OVER (
                            ORDER BY zone
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING), 0)
                        / {TARGET_ROWS}) AS BIGINT) AS file_id
            FROM zones)
        SELECT file_id, COUNT(*) AS n_zones,
               CAST(SUM(n_rows) AS BIGINT) AS n_rows,
               MIN(zone) AS first_zone, MAX(zone) AS last_zone
        FROM planned GROUP BY file_id
    """,
    "ext_zorder_clustering": f"""
        WITH pts AS (
            SELECT CAST(floor((l_quantity - 1.0) * {Q_SCALE!r}) AS BIGINT)
                       AS qn,
                   LEAST(CAST(floor((l_extendedprice - {P_BASE!r})
                                    * {P_SCALE!r}) AS BIGINT),
                         {(1 << MORTON_BITS) - 1}) AS pn,
                   l_orderkey, l_linenumber, l_extendedprice, l_quantity
            FROM lineitem),
        z AS (
            SELECT *,
                   {" + ".join(f"(((qn >> {b}) & 1) << {2 * b}) + (((pn >> {b}) & 1) << {2 * b + 1})" for b in range(MORTON_BITS))}
                       AS zval
            FROM pts),
        zb AS (
            SELECT qn, pn,
                   CAST(floor((ROW_NUMBER() OVER (
                            ORDER BY zval, l_orderkey, l_linenumber,
                                     l_extendedprice, l_quantity) - 1)
                        / {BLOCK_ROWS}) AS BIGINT) AS block
            FROM z),
        pb AS (
            SELECT qn, pn,
                   CAST(floor((ROW_NUMBER() OVER (
                            ORDER BY pn, l_orderkey, l_linenumber,
                                     l_extendedprice, l_quantity) - 1)
                        / {BLOCK_ROWS}) AS BIGINT) AS block
            FROM pts),
        zs AS (SELECT block, MAX(qn) - MIN(qn) AS q_width,
                      MAX(pn) - MIN(pn) AS p_width FROM zb GROUP BY block),
        pss AS (SELECT block, MAX(qn) - MIN(qn) AS q_width,
                       MAX(pn) - MIN(pn) AS p_width FROM pb GROUP BY block)
        SELECT 'zorder' AS layout, COUNT(*) AS n_blocks,
               CAST(floor(SUM(q_width) * 1000000
                    / (COUNT(*) * {(1 << MORTON_BITS) - 1})) AS BIGINT)
                   AS q_range_ppm,
               CAST(floor(SUM(p_width) * 1000000
                    / (COUNT(*) * {(1 << MORTON_BITS) - 1})) AS BIGINT)
                   AS p_range_ppm
        FROM zs
        UNION ALL
        SELECT 'price_sorted', COUNT(*),
               CAST(floor(SUM(q_width) * 1000000
                    / (COUNT(*) * {(1 << MORTON_BITS) - 1})) AS BIGINT),
               CAST(floor(SUM(p_width) * 1000000
                    / (COUNT(*) * {(1 << MORTON_BITS) - 1})) AS BIGINT)
        FROM pss
    """,
    "ext_hilbert_clustering": f"""
        WITH pts AS (
            SELECT CAST(floor((l_quantity - 1.0) * {Q_SCALE!r}) AS BIGINT)
                       AS qn,
                   LEAST(CAST(floor((l_extendedprice - {P_BASE!r})
                                    * {P_SCALE!r}) AS BIGINT),
                         {(1 << MORTON_BITS) - 1}) AS pn,
                   l_orderkey, l_linenumber, l_extendedprice, l_quantity
            FROM lineitem),
        {_hilbert_sql("l_orderkey, l_linenumber, l_extendedprice, l_quantity")},
        z AS (
            SELECT qn, pn, l_orderkey, l_linenumber, l_extendedprice,
                   l_quantity,
                   {" + ".join(f"(((qn >> {b}) & 1) << {2 * b}) + (((pn >> {b}) & 1) << {2 * b + 1})" for b in range(MORTON_BITS))}
                       AS zval
            FROM pts),
        hb AS (
            SELECT qn, pn,
                   CAST(floor((ROW_NUMBER() OVER (
                            ORDER BY hd, l_orderkey, l_linenumber,
                                     l_extendedprice, l_quantity) - 1)
                        / {BLOCK_ROWS}) AS BIGINT) AS block
            FROM h0),
        zb AS (
            SELECT qn, pn,
                   CAST(floor((ROW_NUMBER() OVER (
                            ORDER BY zval, l_orderkey, l_linenumber,
                                     l_extendedprice, l_quantity) - 1)
                        / {BLOCK_ROWS}) AS BIGINT) AS block
            FROM z),
        hs AS (SELECT block, MAX(qn) - MIN(qn) AS q_width,
                      MAX(pn) - MIN(pn) AS p_width FROM hb GROUP BY block),
        zs AS (SELECT block, MAX(qn) - MIN(qn) AS q_width,
                      MAX(pn) - MIN(pn) AS p_width FROM zb GROUP BY block)
        SELECT 'hilbert' AS layout, COUNT(*) AS n_blocks,
               CAST(floor(SUM(q_width) * 1000000
                    / (COUNT(*) * {(1 << MORTON_BITS) - 1})) AS BIGINT)
                   AS q_range_ppm,
               CAST(floor(SUM(p_width) * 1000000
                    / (COUNT(*) * {(1 << MORTON_BITS) - 1})) AS BIGINT)
                   AS p_range_ppm
        FROM hs
        UNION ALL
        SELECT 'zorder', COUNT(*),
               CAST(floor(SUM(q_width) * 1000000
                    / (COUNT(*) * {(1 << MORTON_BITS) - 1})) AS BIGINT),
               CAST(floor(SUM(p_width) * 1000000
                    / (COUNT(*) * {(1 << MORTON_BITS) - 1})) AS BIGINT)
        FROM zs
    """,
}
