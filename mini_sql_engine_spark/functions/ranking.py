"""Scale-safe global ordering primitives.

A ``Window.orderBy(...)`` without ``partitionBy`` funnels every row
through ONE task — fine for bounded grids (deciles, vocab top-K),
fatal for entity-scaled ladders (per-customer ranks, per-doc scores)
at 10^8+ rows. ``range_prefix`` computes the same exact global
row_number / prefix-sum / prefix-max with no single-partition stage:

1. ``repartitionByRange`` on the order key — each partition owns a
   contiguous key range (the range exchange samples boundaries; equal
   keys land together, and our callers always pass a unique composite
   key so within-partition order is total);
2. per-partition window (``partitionBy(_pid)``) for the local
   row_number / running sum / running max — parallel across tasks;
3. a per-partition stats table (one row per partition — bounded by
   ``spark.sql.shuffle.partitions``, so ITS global window is a
   bounded-grid window, the allowed class) provides each partition's
   offset: rows before it, sum before it, max before it;
4. a broadcast join puts the offsets back on the big side.

Determinism: the offsets table and the main output BOTH read the
range-partitioned data, and their pids must agree — but AQE may
re-plan the range exchange per consumer (different sampled boundaries
→ misaligned offsets → duplicated/skipped ranks; caught by the sf0.1
sweep on ext_zorder_clustering). The partitioned input is therefore
localCheckpoint'ed (lazy): it materializes exactly once on first use
and every consumer reads the SAME partitioning. This is the
"stage-table" materialization a production job would persist anyway
before fanning out.

Cost at 100 TB: one range shuffle + one hash shuffle of the ladder
(both on thin projected rows), one tiny stats agg, one broadcast —
versus the single-partition sort this replaces, which does not finish.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["ntile_expr", "range_lag", "range_prefix"]


def _assert_unique_order(df: DataFrame, order_cols: list[str]) -> None:
    """Debug-mode guard for the unique-composite-key contract.

    ``order_cols`` forming a unique key is what makes every
    range_prefix/range_lag output deterministic (per-partition window
    tie order and ``max_by`` ties are otherwise free to differ between
    runs — and between this engine and an oracle). The contract is
    documented at every call site, but docstrings don't fail builds:
    with ``SPARK_GRAFT_CHECK_UNIQUE_ORDER=1`` (set in the test suite)
    a violating caller dies loudly here instead of shipping flaky
    ranks. Off by default — the check is a full extra aggregate over
    ``df``, unacceptable in the hot path."""
    if os.environ.get("SPARK_GRAFT_CHECK_UNIQUE_ORDER") != "1":
        return
    # count_distinct skips rows where ANY column is NULL, which would
    # both miscount and mislabel the failure — wrap each column in a
    # struct (NULL becomes a countable value) and report NULL-bearing
    # rows with their own message, since a NULL in an order key is a
    # different bug (nondeterministic NULLS FIRST/LAST placement vs
    # the oracle) than a duplicate key
    cols = [F.col(c) for c in order_cols]
    n, d, nulls = df.select(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct(F.struct(*cols)).alias("d"),
        F.sum(
            F.when(
                F.greatest(*[c.isNull() for c in cols])
                if len(cols) > 1
                else cols[0].isNull(),
                1,
            ).otherwise(0)
        ).alias("nulls"),
    ).first()
    if nulls:
        raise AssertionError(
            f"range order {order_cols} contains {nulls} rows with a "
            f"NULL order column — order keys must be non-null"
        )
    if n != d:
        raise AssertionError(
            f"range order {order_cols} is not a unique key: "
            f"{n} rows, {d} distinct — add a tie-break id column"
        )


def ntile_expr(rank: str, total: str, buckets: int) -> Column:
    """Exact ntile(buckets) replayed as integer arithmetic on a
    1-based global rank column and a total-count column (both LONG,
    e.g. from ``range_prefix(..., total_rows_col=...)``).

    With n = b·q + r, ntile gives the first r buckets q+1 rows each:
    bucket(p) = ceil(p/(q+1)) while p ≤ r(q+1), else
    r + ceil((p − r(q+1))/q). All-`div` integer arithmetic —
    bit-identical to the window ntile both in Spark and in a DuckDB
    oracle's NTILE, with no single-partition window. The q=0 branch
    (n < b) never divides by zero: every p falls inside the head span
    r(q+1) = n, so the otherwise() is unreachable there."""
    b = int(buckets)
    q = f"({total} div {b})"
    r = f"({total} % {b})"
    head = f"({r} * ({q} + 1))"
    return F.expr(
        f"""CASE WHEN {rank} <= {head}
                 THEN ({rank} + {q}) div ({q} + 1)
                 ELSE {r} + ({rank} - {head} + {q} - 1) div {q}
            END"""
    )


_MID_OFFSET_BITS = 33  # monotonically_increasing_id: pid*2^33 + offset


def _range_rank_fast(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str,
    total_rows_col: str | None,
) -> DataFrame:
    """Exact global row_number with ONE full-table exchange.

    ``repartitionByRange`` puts contiguous key ranges in pid order;
    ``sortWithinPartitions`` totally orders each partition (order_cols
    are a unique key); ``monotonically_increasing_id`` then encodes
    (pid, 0-based offset in iteration order) as pid·2^33 + offset, and
    iteration order is the sorted order because the id is
    non-deterministic, so Catalyst may not reorder its Project below
    the Sort. Global rank = offset + 1 + rows in earlier pids, where
    the per-pid counts come from a partitions-sized stats table
    (bounded-grid window) broadcast back — the same stitch as the
    window ladder, minus its hashpartitioning(_pid) exchange and
    per-branch sort. The lazy localCheckpoint keeps one physical
    materialization feeding both consumers (AQE must not re-sample the
    range boundaries per branch: pids in the stats table and the main
    output must agree)."""
    part = (
        df.repartitionByRange(*[F.col(c) for c in order_cols])
        .sortWithinPartitions(*[F.col(c).asc() for c in order_cols])
        .withColumn("_mid", F.monotonically_increasing_id())
        .localCheckpoint(eager=False)
    )
    decoded = part.select(
        "*",
        F.shiftright("_mid", _MID_OFFSET_BITS).alias("_pid"),
        (
            F.col("_mid").bitwiseAND(F.lit((1 << _MID_OFFSET_BITS) - 1)) + 1
        ).alias("_loc"),
    )
    stats = decoded.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
    # bounded-grid window: one row per shuffle partition
    w_prev = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    off_cols = [
        F.col("_pid"),
        F.coalesce(F.sum("_cnt").over(w_prev), F.lit(0)).alias("_off_rows"),
    ]
    if total_rows_col is not None:
        w_all = Window.orderBy("_pid").rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        off_cols.append(
            F.sum("_cnt").over(w_all).cast("long").alias(total_rows_col)
        )
    offsets = stats.select(*off_cols)
    out = decoded.join(F.broadcast(offsets), "_pid").withColumn(
        rank_col, (F.col("_loc") + F.col("_off_rows")).cast("long")
    )
    return out.drop("_pid", "_loc", "_mid", "_off_rows")


def _range_sum_fast(
    df: DataFrame,
    order_cols: list[str],
    sum_cols: tuple[str, ...],
    rank_col: str,
    total_rows_col: str | None,
) -> DataFrame:
    """Rank + inclusive prefix sums with ONE full-table exchange.

    Same skeleton as :func:`_range_rank_fast`; the per-partition
    running sums that previously forced a hashpartitioning(_pid)
    exchange + sort + Window run instead as ONE Arrow ``mapInPandas``
    cumsum over the already-sorted range partitions (guide §4.2 —
    vectorized kernel over whole batches, no extra shuffle). The
    kernel carries the running total across batches from the last
    emitted cumulative value, so accumulation is strictly sequential
    in sort order — element-identical to the ordered window running
    sum it replaces (every caller's sum column is a LONG count/cents
    value, so this is integer arithmetic; for doubles both forms are
    the same left-to-right IEEE sequence). Cross-partition offsets
    ride the same partitions-sized stats table as the window ladder
    and are added JVM-side. max_cols callers stay on the window path
    (nullable strict-prefix max does not vectorize exactly)."""
    import pandas as pd  # noqa: F401 (kernel-side)

    part = (
        df.repartitionByRange(*[F.col(c) for c in order_cols])
        .sortWithinPartitions(*[F.col(c).asc() for c in order_cols])
        .withColumn("_mid", F.monotonically_increasing_id())
        .localCheckpoint(eager=False)
    )
    in_fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in part.schema.fields
    )
    lcum_fields = ", ".join(
        f"`_lcum_{c}` {df.schema[c].dataType.simpleString()}"
        for c in sum_cols
    )
    out_schema = f"{in_fields}, {lcum_fields}"
    cols = tuple(sum_cols)

    def cumsum_kernel(batches):
        run = dict.fromkeys(cols, 0)
        for pdf in batches:
            for c in cols:
                s = pdf[c].cumsum() + run[c]
                pdf[f"_lcum_{c}"] = s
                if len(s):
                    run[c] = s.iloc[-1]
            yield pdf

    cummed = part.mapInPandas(cumsum_kernel, out_schema)

    pid = F.shiftright("_mid", _MID_OFFSET_BITS)
    stats = part.groupBy(pid.alias("_pid")).agg(
        F.count(F.lit(1)).alias("_cnt"),
        *[F.sum(c).alias(f"_sum_{c}") for c in sum_cols],
    )
    w_prev = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    off_cols = [
        F.col("_pid"),
        F.coalesce(F.sum("_cnt").over(w_prev), F.lit(0)).alias("_off_rows"),
    ]
    off_cols += [
        F.coalesce(F.sum(f"_sum_{c}").over(w_prev), F.lit(0)).alias(
            f"_off_sum_{c}"
        )
        for c in sum_cols
    ]
    if total_rows_col is not None:
        w_all = Window.orderBy("_pid").rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        off_cols.append(
            F.sum("_cnt").over(w_all).cast("long").alias(total_rows_col)
        )
    offsets = stats.select(*off_cols)

    out = (
        cummed.withColumn("_pid", pid)
        .withColumn(
            "_loc",
            F.col("_mid").bitwiseAND(F.lit((1 << _MID_OFFSET_BITS) - 1)) + 1,
        )
        .join(F.broadcast(offsets), "_pid")
        .withColumn(
            rank_col, (F.col("_loc") + F.col("_off_rows")).cast("long")
        )
    )
    for c in sum_cols:
        out = out.withColumn(
            f"cum_{c}", F.col(f"_lcum_{c}") + F.col(f"_off_sum_{c}")
        )
    drop = ["_pid", "_loc", "_mid", "_off_rows"]
    drop += [f"_lcum_{c}" for c in sum_cols]
    drop += [f"_off_sum_{c}" for c in sum_cols]
    return out.drop(*drop)


def range_prefix(
    df: DataFrame,
    order_cols: list[str],
    *,
    sum_cols: tuple[str, ...] = (),
    max_cols: tuple[str, ...] = (),
    rank_col: str = "rnk",
    total_rows_col: str | None = None,
) -> DataFrame:
    """Attach exact global-order prefix statistics to ``df``.

    ``order_cols`` must form a unique composite key (callers break
    value ties with an id column, same as they did under the global
    window). Adds:

    - ``rank_col``: 1-based global row_number over ``order_cols``;
    - ``cum_<c>`` for each c in ``sum_cols``: inclusive prefix sum;
    - ``prevmax_<c>`` for each c in ``max_cols``: prefix max over
      STRICTLY preceding rows (NULL for the global first row) — the
      running-dominance primitive (Pareto frontier);
    - ``total_rows_col`` (if named): the grand row count on every row
      (rides the same tiny stats table — no extra pass over ``df``),
      for rank-arithmetic consumers like exact ntile replay.
    """
    _assert_unique_order(df, order_cols)
    if not sum_cols and not max_cols:
        # rank-only fast path (round 10): the window form below needs a
        # SECOND full-table exchange (hashpartitioning(_pid)) + sort
        # just to run row_number per partition. Sorting within the
        # range partitions instead and decoding monotonically_
        # increasing_id (pid*2^33 + iteration offset, and iteration
        # order IS the sorted order — the non-deterministic Project
        # cannot be pushed below the Sort) yields the identical global
        # rank with ZERO exchanges past the range one: guide §2.4,
        # "remove shuffles outright". Running prefix columns still need
        # the ordered window, so sum/max callers keep the ladder.
        return _range_rank_fast(df, order_cols, rank_col, total_rows_col)
    if not max_cols:
        # sum-only callers: Arrow cumsum kernel, same exchange saving
        return _range_sum_fast(
            df, order_cols, sum_cols, rank_col, total_rows_col
        )
    ordered = [F.col(c).asc() for c in order_cols]
    part = (
        df.repartitionByRange(*[F.col(c) for c in order_cols])
        .withColumn("_pid", F.spark_partition_id())
        # one materialization shared by the offsets and main consumers:
        # pids MUST come from a single physical execution (see module
        # docstring — AQE may otherwise re-plan the exchange per branch)
        .localCheckpoint(eager=False)
    )

    stats_aggs = [F.count(F.lit(1)).alias("_cnt")]
    stats_aggs += [F.sum(c).alias(f"_sum_{c}") for c in sum_cols]
    stats_aggs += [F.max(c).alias(f"_max_{c}") for c in max_cols]
    stats = part.groupBy("_pid").agg(*stats_aggs)

    # bounded-grid window: one row per shuffle partition
    w_prev = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    off_cols: list[Column] = [
        F.col("_pid"),
        F.coalesce(F.sum("_cnt").over(w_prev), F.lit(0)).alias("_off_rows"),
    ]
    off_cols += [
        F.coalesce(F.sum(f"_sum_{c}").over(w_prev), F.lit(0)).alias(
            f"_off_sum_{c}"
        )
        for c in sum_cols
    ]
    off_cols += [
        F.max(f"_max_{c}").over(w_prev).alias(f"_off_max_{c}")
        for c in max_cols
    ]
    if total_rows_col is not None:
        w_all = Window.orderBy("_pid").rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        off_cols.append(
            F.sum("_cnt").over(w_all).cast("long").alias(total_rows_col)
        )
    offsets = stats.select(*off_cols)

    w_loc = Window.partitionBy("_pid").orderBy(*ordered)
    w_run = w_loc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_strict = w_loc.rowsBetween(Window.unboundedPreceding, -1)

    out = part.join(F.broadcast(offsets), "_pid")
    out = out.withColumn(
        rank_col,
        (F.row_number().over(w_loc) + F.col("_off_rows")).cast("long"),
    )
    for c in sum_cols:
        out = out.withColumn(
            f"cum_{c}", F.sum(c).over(w_run) + F.col(f"_off_sum_{c}")
        )
    for c in max_cols:
        # greatest() is null-safe only when at least one side is
        # non-null; spell out the three cases so the global first row
        # stays NULL (strict prefix of nothing), matching the window
        # semantics this replaces.
        local = F.max(c).over(w_strict)
        off = F.col(f"_off_max_{c}")
        out = out.withColumn(
            f"prevmax_{c}",
            F.when(local.isNull(), off)
            .when(off.isNull(), local)
            .otherwise(F.greatest(local, off)),
        )
    drop = ["_pid", "_off_rows"]
    drop += [f"_off_sum_{c}" for c in sum_cols]
    drop += [f"_off_max_{c}" for c in max_cols]
    return out.drop(*drop)


def range_lag(
    df: DataFrame,
    order_cols: list[str],
    lag_cols: tuple[str, ...],
) -> DataFrame:
    """Attach ``prev_<c>`` — each row's predecessor value of ``c`` in
    the global order over ``order_cols`` — with no single-partition
    window (the distributed lag behind run-length counting and
    change-detection along a sort order).

    Mechanics mirror ``range_prefix``: range-partition on the order
    key, lag within each partition, and stitch the partition
    boundaries with a tiny per-partition "last row's values" table
    (``max_by`` over the order key) lagged across pid — the first row
    of each partition takes the previous NON-EMPTY partition's last
    value, and the global first row stays NULL, exactly as the global
    window form. Assumes ``lag_cols`` values are non-NULL (a data NULL
    is indistinguishable from "no predecessor" only on the global
    first row; callers here count runs over NOT-NULL columns)."""
    _assert_unique_order(df, order_cols)
    part = (
        df.repartitionByRange(*[F.col(c) for c in order_cols])
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)  # same pid-consistency rule
    )
    okey = F.struct(*[F.col(c) for c in order_cols])
    stats = part.groupBy("_pid").agg(
        *[F.max_by(F.col(c), okey).alias(f"_last_{c}") for c in lag_cols]
    )
    # bounded grid: one row per NON-EMPTY partition, so lag over pid
    # order skips empty partitions by construction
    w_pid = Window.orderBy("_pid")
    bounds = stats.select(
        "_pid",
        *[
            F.lag(f"_last_{c}").over(w_pid).alias(f"_prevlast_{c}")
            for c in lag_cols
        ],
    )
    w_loc = Window.partitionBy("_pid").orderBy(
        *[F.col(c).asc() for c in order_cols]
    )
    out = part.join(F.broadcast(bounds), "_pid")
    first_local = F.row_number().over(w_loc) == 1
    for c in lag_cols:
        out = out.withColumn(
            f"prev_{c}",
            F.when(first_local, F.col(f"_prevlast_{c}")).otherwise(
                F.lag(c).over(w_loc)
            ),
        )
    return out.drop("_pid", *[f"_prevlast_{c}" for c in lag_cols])
