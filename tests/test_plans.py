"""Physical-plan shape assertions — the 100 TB design review, executable.

Correctness tests prove the operators compute the right answer; these
prove the PLANS are the ones that survive scale-up: dimension joins
broadcast, filters reach the parquet scan, expression pipelines stay in
whole-stage codegen, and salting preserves results exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mini_sql_engine_spark.catalog import load_table
from mini_sql_engine_spark.functions import skew
from mini_sql_engine_spark.operators import ALL_QUERIES
from mini_sql_engine_spark.operators.parity import engine_for


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_dimension_join_broadcasts(spark, sf_dir):
    """customer ⋈ nation must broadcast the nation side (25 rows at any
    sf) — never shuffle the customer side for a fixed-size dim."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    joined = customer.join(nation, customer.c_nationkey == nation.n_nationkey)
    assert "BroadcastHashJoin" in _plan(joined), _plan(joined)


def test_semi_join_stays_semi(spark, sf_dir):
    """ext_semi_join compiles to a semi join (key-only probe), not an
    inner join + distinct."""
    plan = _plan(ALL_QUERIES["ext_semi_join"](spark, sf_dir))
    assert "LeftSemi" in plan, plan


def test_text_pipeline_is_single_jvm_scan(spark, sf_dir):
    """The text-quality projection is one JVM scan stage: no shuffle,
    no Python boundary. (The projection itself uses higher-order
    functions, which Spark evaluates outside whole-stage codegen but
    still JVM-side — the codegen'd part is the columnar scan, `*(1)`.)"""
    plan = _plan(ALL_QUERIES["ext_text_quality"](spark, sf_dir))
    assert "*(1)" in plan  # a whole-stage-codegen stage exists
    assert "Exchange" not in plan, plan  # pure projection: zero shuffles
    assert "Python" not in plan  # no row-at-a-time or Arrow Python eval


def test_flagship_pushes_filter_to_scan(spark, sf_dir):
    plan = _plan(ALL_QUERIES["flagship"](spark, sf_dir))
    assert "PushedFilters: [" in plan and "l_discount" in plan, plan


def test_engine_dialect_join_is_real_join(spark, sf_dir):
    """The reference computes FROM t1,t2 WHERE t1.k = t2.k as cross
    product THEN filter (SURVEY §3.1); Catalyst must recognize the
    equality and plan a hash/merge join, never a cartesian."""
    eng = engine_for(spark, sf_dir)
    df = eng.sql(
        "SELECT nation.n_nationkey, region.r_regionkey FROM nation, region "
        "WHERE nation.n_regionkey = region.r_regionkey;"
    )
    plan = _plan(df)
    assert "CartesianProduct" not in plan and "Join" in plan, plan


def test_engine_explain_is_formatted(spark, sf_dir):
    eng = engine_for(spark, sf_dir)
    out = eng.explain("SELECT MAX(n_nationkey) FROM nation;")
    assert "Physical Plan" in out


def test_salted_aggregate_matches_plain(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    salted = skew.salted_aggregate(
        events,
        ["event_type"],
        {"n": ("count", "event_id"), "total": ("sum", "value"), "mx": ("max", "value")},
        n_salts=8,
    )
    plain = events.groupBy("event_type").agg(
        F.count("event_id").alias("n"),
        F.sum("value").alias("total"),
        F.max("value").alias("mx"),
    )
    s = {r.event_type: (r.n, round(r.total, 6), r.mx) for r in salted.collect()}
    p = {r.event_type: (r.n, round(r.total, 6), r.mx) for r in plain.collect()}
    assert s == p


def test_salted_join_matches_plain(spark, sf_dir):
    events = load_table(spark, sf_dir, "events").withColumnRenamed(
        "user_id", "custkey"
    )
    customer = load_table(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "custkey"
    )
    salted = skew.salted_join(events, customer, "custkey", n_salts=4)
    plain = events.join(customer, "custkey")
    assert salted.count() == plain.count()
    assert sorted(salted.columns) == sorted(plain.columns)
    key_counts_s = {r.custkey: r.n for r in salted.groupBy("custkey").agg(F.count(F.lit(1)).alias("n")).collect()}
    key_counts_p = {r.custkey: r.n for r in plain.groupBy("custkey").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert key_counts_s == key_counts_p


def test_dynamic_partition_pruning(spark, sf_dir, tmp_path):
    """Partitioned fact ⋈ filtered dim on the partition column must
    plan a dynamicpruning subquery: only matching partitions are read,
    decided at runtime from the dim side — the 100 TB star-join path."""
    li = load_table(spark, sf_dir, "lineitem")
    path = str(tmp_path / "li_part")
    li.write.mode("overwrite").partitionBy("l_returnflag").parquet(path)
    dim = spark.createDataFrame(
        [("A", "accept"), ("N", "new"), ("R", "reject")], "flag string, label string"
    )
    fact = spark.read.parquet(path)
    j = (
        fact.join(dim, fact.l_returnflag == dim.flag)
        .filter(F.col("label") == "reject")
        .groupBy("flag")
        .count()
    )
    assert "dynamicpruning" in _plan(j).lower()
    expect = li.filter(F.col("l_returnflag") == "R").count()
    assert j.collect()[0]["count"] == expect


def test_q4_exists_compiles_to_semi_join(spark, sf_dir):
    """Q4's EXISTS must stay a left-semi join carrying the correlated
    l_shipdate > o_orderdate term as a join residual — never an inner
    join + distinct (which would duplicate-then-dedup the fact)."""
    plan = _plan(ALL_QUERIES["tpch_q4"](spark, sf_dir))
    assert "LeftSemi" in plan, plan
    assert "Deduplicate" not in plan and "Distinct" not in plan, plan


def test_q4_prunes_lineitem_to_two_columns(spark, sf_dir):
    """The semi-join probe needs only (l_orderkey, l_shipdate); the
    scan must not read the other 9 lineitem columns."""
    plan = _plan(ALL_QUERIES["tpch_q4"](spark, sf_dir))
    scan = next(l for l in plan.splitlines() if "FileScan" in l and "l_orderkey" in l)
    assert "l_shipdate" in scan and "l_extendedprice" not in scan, scan


def test_q10_broadcasts_every_dimension(spark, sf_dir):
    """The star join around the filtered fact: nation (25 rows),
    customer, and one quarter of orders all hash-broadcast; the only
    shuffle left is the final group-by."""
    plan = _plan(ALL_QUERIES["tpch_q10"](spark, sf_dir))
    assert plan.count("BroadcastHashJoin") == 3, plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan, plan


def test_q22_anti_join_and_scalar_broadcast(spark, sf_dir):
    """Q22: NOT EXISTS → LeftAnti on the thin o_custkey projection; the
    scalar average arrives as a 1-row broadcast, not a per-row
    subquery re-evaluation."""
    plan = _plan(ALL_QUERIES["tpch_q22"](spark, sf_dir))
    assert "LeftAnti" in plan, plan
    scan = next(l for l in plan.splitlines() if "FileScan" in l and "o_custkey" in l)
    assert "o_totalprice" not in scan and "o_orderdate" not in scan, scan


def test_window_pack_single_shuffle_per_frame(spark, sf_dir):
    """A partitioned window is one hash exchange on the partition key
    plus an in-partition sort — a second exchange would mean the frame
    was re-partitioned per function."""
    for name in ("ext_running_total", "ext_ntile_percent_rank"):
        plan = _plan(ALL_QUERIES[name](spark, sf_dir))
        assert plan.count("Exchange hashpartitioning") == 1, (name, plan)


def test_global_sort_uses_range_partitioning(spark, sf_dir):
    """A full orderBy (no limit) must plan a range exchange — every
    partition gets a contiguous key range, so the sort parallelizes;
    a single-partition sort would serialize 100 TB through one task.
    With a LIMIT, the plan must instead collapse to
    TakeOrderedAndProject (no global sort at all)."""
    li = load_table(spark, sf_dir, "lineitem")
    full = li.orderBy("l_extendedprice")
    assert "rangepartitioning" in _plan(full).lower()
    topk = li.orderBy("l_extendedprice").limit(5)
    assert "TakeOrderedAndProject" in _plan(topk)


def test_cached_table_serves_from_memory(spark, sf_dir):
    """df.cache() must turn downstream scans into InMemoryTableScan
    with identical results — the interactive-reuse path."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    expect = li.agg(F.sum("l_quantity")).collect()[0][0]
    cached = li.cache()
    try:
        cached.count()  # materialize
        again = cached.agg(F.sum("l_quantity"))
        assert "InMemoryTableScan" in _plan(again)
        assert again.collect()[0][0] == expect
    finally:
        cached.unpersist()


def test_join_hints_are_honored(spark, sf_dir):
    """Explicit strategy hints must override the optimizer's choice —
    the operator's manual override when statistics mislead (e.g. a
    filter the CBO can't estimate leaves a 'small' side huge)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    merged = li.join(orders.hint("merge"), li.l_orderkey == orders.o_orderkey)
    assert "SortMergeJoin" in _plan(merged), _plan(merged)
    bcast = li.join(orders.hint("broadcast"), li.l_orderkey == orders.o_orderkey)
    assert "BroadcastHashJoin" in _plan(bcast), _plan(bcast)


def test_observe_metrics_match_aggregates(spark, sf_dir):
    """df.observe(): pipeline-health counters collected as a side
    effect of the normal pass — no second scan. The observed values
    must equal the standalone aggregates."""
    from pyspark.sql import Observation

    li = load_table(spark, sf_dir, "lineitem")
    obs = Observation("health")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.col("l_quantity")).alias("qty"),
    )
    observed.write.format("noop").mode("overwrite").save()
    expect = li.agg(
        F.count(F.lit(1)).alias("rows"), F.sum("l_quantity").alias("qty")
    ).collect()[0]
    assert obs.get["rows"] == expect["rows"]
    assert abs(obs.get["qty"] - expect["qty"]) < 1e-6


def test_udtf_uses_arrow_eval(spark, sf_dir):
    """The UDTF entry must cross the Python boundary via Arrow batches
    (ArrowEvalPythonUDTF), never pickled row-at-a-time transfer."""
    plan = _plan(ALL_QUERIES["ext_udtf_ngrams"](spark, sf_dir))
    assert "ArrowEvalPythonUDTF" in plan, plan


def test_aqe_splits_skewed_join_partition(spark, sf_dir):
    """AQE's runtime skew-join handling, demonstrated end-to-end: a
    join key holding ~90% of all rows is detected AFTER the shuffle
    materializes and its partition is split across multiple tasks
    (OptimizeSkewedJoin), with no salting in the query. Thresholds are
    tuned down so the effect is observable at test scale; at 100 TB the
    defaults (256 MB partition threshold) fire the same way.

    Three preconditions discovered the hard way, each load-bearing:
    - the map stage needs MULTIPLE tasks (repartition(16)) — a skewed
      reduce partition is split by assigning mapper RANGES to tasks, so
      a single-mapper shuffle (one parquet split at small sf) can never
      be split;
    - the payload must be incompressible (sha2 concat) — skew detection
      reads POST-compression map-output sizes, and a repeated-literal
      payload compresses below any threshold;
    - the non-skewed side must be a PLAIN shuffle (spark.range) — an
      aggregate between the shuffle stage and the join (e.g. distinct)
      breaks OptimizeSkewedJoin's Sort←ShuffleQueryStage pattern match.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    # deterministic skew: ~90% of rows collapse onto key 0
    payload = F.concat(
        *[
            F.sha2(F.concat(F.col("l_orderkey").cast("string"), F.lit(str(i))), 512)
            for i in range(4)
        ]
    )
    skewed = (
        li.repartition(16)
        .withColumn(
            "k",
            F.when(F.col("l_orderkey") % 10 != 0, F.lit(0)).otherwise(
                F.col("l_orderkey")
            ),
        )
        .withColumn("payload", payload)
    )
    max_key = li.agg(F.max("l_orderkey")).collect()[0][0]
    keys = spark.range(0, max_key + 1).select(F.col("id").alias("k2"))
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64k",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        joined = skewed.join(keys, F.col("k") == F.col("k2"))
        # materialize THIS DataFrame's execution (count() would plan a
        # separate query) so AQE re-plans it with runtime stats
        rows = joined.collect()
        assert len(rows) == li.count()  # distinct-key build: row-preserving
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skewed" in plan or "isSkew" in plan, plan
    finally:
        for k, v in old.items():
            (spark.conf.set(k, v) if v is not None else spark.conf.unset(k))


def test_partitioned_pruned_join_plans_dpp(spark, sf_dir):
    """ext_partitioned_pruned_join must plan a dynamicpruning subquery
    — the dim filter is on a derived attribute, so only runtime DPP
    (not static constraint propagation) can skip the year partitions."""
    plan = _plan(ALL_QUERIES["ext_partitioned_pruned_join"](spark, sf_dir))
    assert "dynamicpruning" in plan.lower(), plan


def test_runtime_bloom_filter_injection(spark, sf_dir):
    """InjectRuntimeFilter: a selective dim filter seeds a bloom filter
    (bloom_filter_agg → BloomFilterMightContain) that pre-filters the
    fact scan BEFORE the join shuffle — rows that can't match never get
    shuffled. Defaults gate on 10 GB application-side scans; thresholds
    are lowered so the 100 TB behavior is visible at test scale."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = load_table(spark, sf_dir, "lineitem")
        orders = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("l_linestatus")
            .count()
        )
        plan = _plan(j)
        assert "bloom_filter_agg" in plan, plan
    finally:
        for k, v in old.items():
            (spark.conf.set(k, v) if v is not None else spark.conf.unset(k))


def test_prefix_filter_broadcasts_thin_sides(spark, sf_dir):
    """ext_dedup_prefix_filter: the df >= 2 attach and both verify
    joins broadcast their small side (repeated-shingle table / per-doc
    shingle table) — neither the pair table nor the shingle arrays may
    ride a shuffle (SURVEY.md §2.2 dedup scale notes). The only
    non-broadcast join is the prefix self-join on (shingle, doc_id)
    pairs."""
    plan = _plan(ALL_QUERIES["ext_dedup_prefix_filter"](spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 3, plan
    smj = plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin")
    assert smj <= 1, plan


def test_boilerplate_hot_grams_broadcast(spark, sf_dir):
    """The hot-gram (df >= BOILER_DF) set must broadcast back to the
    exploded corpus side as a semi join — shuffling the full gram
    explosion a second time would double the widest shuffle at scale."""
    plan = _plan(ALL_QUERIES["ext_boilerplate_ngrams"](spark, sf_dir))
    assert "BroadcastHashJoin LeftSemi" in plan.replace("(", " ").replace(
        ")", " "
    ) or ("LeftSemi" in plan and "BroadcastExchange" in plan), plan


def test_key_skew_no_python_no_collect(spark, sf_dir):
    """Skew diagnosis is pure JVM aggregation: per-key counts partial-
    aggregate before their shuffle and only scalar roll-ups unite."""
    plan = _plan(ALL_QUERIES["ext_key_skew"](spark, sf_dir))
    assert "Python" not in plan
    assert "partial_count" in plan, plan  # map-side combine before shuffle


def test_aqe_splits_skewed_join_partition(spark):
    """AQE must detect a pathologically skewed join key at RUNTIME and
    split the hot partition (SortMergeJoin(skew=true)) — the no-code
    fallback behind SCALE.md's skew story: ext_key_skew diagnoses,
    ext_salted_join is the manual fix, and this is what the engine does
    on its own when neither ran."""
    confs = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        left = spark.range(0, 200_000).select(
            F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id")).alias("k"),
            F.col("id").alias("v"),
        )
        right = spark.range(0, 50_000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        j = left.join(right, "k")
        rows = j.count()
        j.collect()  # executes j's own QueryExecution so AQE finalizes it
        plan = _plan(j)
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan
        # 90% of left rows share k=0 and every k<50000 matches: result
        # size proves the split join lost/duplicated nothing
        assert rows == 185_000
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_embedding_dedup_has_no_quadratic_operator(spark, sf_dir):
    """The LSH-banded embedding near-dup is one exchange on the
    (band, bval) bucket key into a per-bucket Arrow kernel — never a
    cartesian product / nested-loop join (the quadratic shapes the
    banding exists to avoid), and the final pair-dedup aggregate runs
    on the post-verify result, after the Python stage."""
    plan = _plan(ALL_QUERIES["ext_dedup_embedding"](spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "FlatMapGroupsInPandas" in plan, plan
    assert "hashpartitioning(band" in plan, plan


def test_lm_perplexity_scalars_broadcast(spark, sf_dir):
    """The corpus-level (N, V) scalar aggregate must broadcast into the
    scoring join, and token counts must partial-aggregate before their
    shuffle (HashAggregate below the Exchange)."""
    plan = _plan(ALL_QUERIES["ext_lm_perplexity"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_dup_spans_hot_set_broadcasts(spark, sf_dir):
    """The SPAN_DF_CAP exclusion must be a broadcast anti-join (the hot
    set is tiny by construction); the gram self-join must be a real
    equi-join, never a cartesian."""
    plan = _plan(ALL_QUERIES["ext_dup_spans"](spark, sf_dir))
    assert any(
        "BroadcastHashJoin" in ln and "LeftAnti" in ln
        for ln in plan.splitlines()
    ), plan
    assert "CartesianProduct" not in plan, plan


def test_semdedup_assignment_has_no_join(spark, sf_dir):
    """Centroid assignment is per-row codegen (struct argmax over
    constant dots) — the plan up to the cell shuffle must contain no
    join at all, and exactly one Python stage (the per-cell kernel)."""
    plan = _plan(ALL_QUERIES["ext_semdedup"](spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert plan.count("FlatMapGroupsInPandas") == 1, plan


def test_gopher_gate_is_single_agg_exchange(spark, sf_dir):
    """The rule gate is projection + one grouped agg: exactly one
    exchange (the partial-agg shuffle on source), no Python, no join."""
    plan = _plan(ALL_QUERIES["ext_gopher_gate"](spark, sf_dir))
    assert plan.count("Exchange") == 1, plan
    assert "Join" not in plan, plan
    assert "Python" not in plan, plan


def test_bigram_type_table_broadcasts_back(spark, sf_dir):
    """The scored bigram TYPE table must broadcast onto the corpus
    bigram stream (types ≪ corpus); the doc-keyed agg is the only
    wide data shuffle of exploded rows."""
    plan = _plan(ALL_QUERIES["ext_bigram_perplexity"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan


def test_bloom_pruned_join_probes_fact_scan(spark, sf_dir):
    """The runtime Bloom filter must land as a might_contain probe on
    the fact side before the join, and the conf window must not leak
    into the session after the query builds."""
    before = spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.enabled", "false"
    )
    df = ALL_QUERIES["ext_bloom_pruned_join"](spark, sf_dir)
    plan = _plan(df)
    assert "might_contain" in plan, plan
    assert "bloom_filter_agg" in plan, plan
    after = spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.enabled", "false"
    )
    assert after == before  # confs restored
    # and the pinned plan still executes correctly after restoration
    assert df.count() == 1


def test_shuffle_hash_hint_takes_effect(spark, sf_dir):
    """The shuffle_hash hint must produce a ShuffledHashJoin (no sort
    on either side), not SortMergeJoin or a broadcast."""
    plan = _plan(ALL_QUERIES["ext_shuffle_hash_join"](spark, sf_dir))
    assert "ShuffledHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_fuzzy_vocab_join_is_blocked_not_quadratic(spark, sf_dir):
    """The SymSpell linkage joins on the deletion-variant key — an
    equi-join, never a cartesian/nested-loop pass over name pairs.
    (Its oracle IS the quadratic join, so a green oracle row plus this
    assertion proves blocking is both lossless and actually used.)"""
    plan = _plan(ALL_QUERIES["ext_fuzzy_vocab_join"](spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_cms_sketch_side_broadcasts(spark, sf_dir):
    """The d*w-cell sketch must broadcast to the probe side (it is
    <= CMS_DEPTH * CMS_WIDTH rows by construction at ANY corpus size —
    that bound is the whole point of a sketch)."""
    plan = _plan(ALL_QUERIES["ext_cms_frequency"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan


def test_value_breakout_single_shuffle(spark, sf_dir):
    """The per-user rolling screen is one hash shuffle on user_id then
    a partition-local window — no second exchange, no Python."""
    plan = _plan(ALL_QUERIES["ext_value_breakout"](spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Python" not in plan, plan


def test_compaction_plan_never_touches_data_rows(spark, sf_dir):
    """The bin-pack runs on the zones-sized stats table, reading ONLY
    the zone key column. The cumulative pass rides range_prefix, whose
    partitioned input localCheckpoints once (pid consistency — see
    functions/ranking.py) — so the executed plan reads the
    materialized RDD, with the single pruned parquet scan paid at
    checkpoint time, and both consumers (offsets + main) share it."""
    df = ALL_QUERIES["ext_compaction_plan"](spark, sf_dir)
    df.collect()
    plan = _plan(df)
    assert "ExistingRDD" in plan or "ReusedExchange" in plan, plan
    assert "l_quantity" not in plan, plan
    # positive column-pruning pin: every materialized-RDD scan must
    # carry EXACTLY the thin stats columns (zone key, zone row count,
    # raw monotonic id — decoded to a partition id post-checkpoint) —
    # if checkpoint-time pruning regressed, extra lineitem columns
    # would ride the RDD and show up here
    import re

    scans = re.findall(r"Scan ExistingRDD\[([^\]]*)\]", plan)
    assert scans, plan
    for cols in scans:
        names = {c.split("#")[0].strip() for c in cols.split(",")}
        assert names == {"zone", "n_rows", "_mid"}, (names, plan)


def test_zorder_beats_linear_sort_on_secondary_dim(spark, sf_dir):
    """The clustering metric must show what Z-order exists to show: the
    price sort is near-perfect on price but near-useless on quantity,
    while Z-order keeps BOTH dimensions' block ranges well under the
    full domain. (Behavioral pin, not a plan check: if a refactor
    breaks the Morton interleave, ppm degrades to ~full-domain and
    this catches it even though the oracle — same construction —
    would agree.)"""
    rows = {
        r["layout"]: r
        for r in ALL_QUERIES["ext_zorder_clustering"](spark, sf_dir).collect()
    }
    zo, ps = rows["zorder"], rows["price_sorted"]
    assert zo["q_range_ppm"] < ps["q_range_ppm"], (zo, ps)
    # z-order blocks cover a bounded fraction of each dimension; the
    # price sort covers nearly the whole quantity domain per block
    assert ps["q_range_ppm"] > 900_000, ps
    assert zo["q_range_ppm"] < 700_000, zo


def test_data_contract_fk_checks_are_anti_joins(spark, sf_dir):
    """Referential-integrity checks must compile to LeftAnti joins
    (key-only probes), never inner-join + filter or a cartesian."""
    plan = _plan(ALL_QUERIES["ext_data_contract"](spark, sf_dir))
    assert plan.count("LeftAnti") == 2, plan
    assert "CartesianProduct" not in plan, plan


def test_bloom_bitset_broadcasts(spark, sf_dir):
    """The Bloom bitset (fixed-size by construction) must broadcast to
    both probe sides — the probes never shuffle for the membership
    join."""
    plan = _plan(ALL_QUERIES["ext_bloom_membership"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan


def test_basket_pairs_broadcasts_side_tables(spark, sf_dir):
    """ext_basket_pairs must broadcast the item-count and scalar
    order-count sides onto the pair table (they are parts-sized and
    1-row) and must not plan a cartesian product anywhere — the pair
    explosion is the per-order equi self-join."""
    plan = _plan(ALL_QUERIES["ext_basket_pairs"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_sorted_neighborhood_is_window_not_allpairs(spark, sf_dir):
    """ext_dedup_sorted_neighborhood's candidates come from the
    explode of W partner ranks (a Generate node joined back on rank) —
    never a cartesian/nested-loop pairing; the Jaccard verify joins
    shingle arrays onto that thin candidate set by doc id."""
    plan = _plan(ALL_QUERIES["ext_dedup_sorted_neighborhood"](spark, sf_dir))
    assert "Generate" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_pit_lookup_single_user_shuffle(spark, sf_dir):
    """ext_scd2_pit_lookup must be ONE hash exchange on user_id (both
    the run-detection window and the PIT carry-forward window share the
    user partitioning) — and never an interval/nested-loop join; the
    interval formulation is oracle-only."""
    plan = _plan(ALL_QUERIES["ext_scd2_pit_lookup"](spark, sf_dir))
    assert plan.count("Exchange hashpartitioning(user_id") <= 2, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_growth_accounting_broadcasts_period_tables(spark, sf_dir):
    """The two per-period aggregates are priority-sized (5 rows) — the
    bridge join must broadcast, never shuffle the already-tiny sides
    into a sort-merge join."""
    plan = _plan(ALL_QUERIES["ext_growth_accounting"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_seasonal_baseline_window_is_keyed(spark, sf_dir):
    """The lag window partitions by weekday — no global single-task
    window anywhere in the seasonal backtest."""
    plan = _plan(ALL_QUERIES["ext_seasonal_baseline"](spark, sf_dir))
    assert "Exchange hashpartitioning(wd" in plan, plan
    assert "Exchange SinglePartition" not in plan or "partial" in plan, plan


def test_gumbel_topk_is_take_ordered(spark, sf_dir):
    """Global top-K must plan as TakeOrdered (per-partition heaps +
    driver merge), never a full global sort."""
    plan = _plan(ALL_QUERIES["ext_gumbel_topk"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan


def test_shard_assignment_window_is_banded(spark, sf_dir):
    """The serpentine rank partitions by band — no single-task global
    row_number anywhere."""
    plan = _plan(ALL_QUERIES["ext_shard_assignment"](spark, sf_dir))
    assert "Exchange hashpartitioning(band" in plan, plan


def test_dsir_ratio_table_broadcasts(spark, sf_dir):
    """The 256-row log-likelihood-ratio table must broadcast onto the
    token stream; the token stream itself is never broadcast."""
    plan = _plan(ALL_QUERIES["ext_dsir_weights"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan


def test_equidepth_bounds_broadcast_no_percentile_buffer(spark, sf_dir):
    """Boundary row broadcasts into the assignment (nested-loop over
    ONE row is fine); the plan must not contain Spark's buffering
    exact-percentile aggregate."""
    plan = _plan(ALL_QUERIES["ext_equidepth_histogram"](spark, sf_dir))
    assert "percentile" not in plan.lower(), plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan


def test_interval_union_single_user_exchange(spark, sf_dir):
    """Running-max island detection and the rollups reuse ONE
    user_id hash exchange."""
    plan = _plan(ALL_QUERIES["ext_interval_union"](spark, sf_dir))
    assert plan.count("Exchange hashpartitioning(user_id") <= 1, plan


def test_kmv_sketch_sides_broadcast(spark, sf_dir):
    """KMV estimator joins tiny sketch/size tables — every join in the
    distinct estimator must be broadcast, never shuffle both sides."""
    plan = _plan(ALL_QUERIES["ext_kmv_distinct"](spark, sf_dir))
    assert "SortMergeJoin" not in plan, plan


def test_bitmap_distinct_no_expand(spark, sf_dir):
    """The bitmap path must aggregate masks (bit_or), not rewrite into
    the count-distinct Expand; the exact arm rides in the same plan, so
    assert the mask aggregate is present."""
    plan = _plan(ALL_QUERIES["ext_bitmap_distinct"](spark, sf_dir))
    assert "bit_or" in plan, plan


def test_fifo_allocation_user_keyed_join(spark, sf_dir):
    """The FIFO range join must carry the user_id equi-key (hash
    exchanges on user_id), not degrade to a pure cartesian."""
    plan = _plan(ALL_QUERIES["ext_fifo_allocation"](spark, sf_dir))
    assert "Exchange hashpartitioning(user_id" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_bm25_stats_broadcast(spark, sf_dir):
    """BM25's corpus-stats side (1 row: nd, total_len, per-term df)
    attaches via broadcast; no sort-merge join and no corpus explode
    anywhere in the scoring plan (the tf/dl counters are per-row
    array expressions since round 10)."""
    plan = _plan(ALL_QUERIES["ext_bm25_search"](spark, sf_dir))
    assert "BroadcastExchange" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "Generate explode(split" not in plan, plan


def test_ks_argmax_is_take_ordered(spark, sf_dir):
    """KS D-argmax must plan as TakeOrdered, not a global sort."""
    plan = _plan(ALL_QUERIES["ext_ks_two_sample"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan


def test_tfidf_pairs_join_is_token_keyed(spark, sf_dir):
    """The sparse cosine self-join must key on the token (hash
    exchange on t), never a cartesian."""
    plan = _plan(ALL_QUERIES["ext_tfidf_cosine_pairs"](spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert "Exchange hashpartitioning(t" in plan, plan


def test_poisson_bootstrap_single_pass(spark, sf_dir):
    """Replicate means come from ONE aggregate over the exploded
    rows — no per-replicate rescans (≤1 scan of the events parquet
    on the replicate path + 1 for the point estimate)."""
    plan = _plan(ALL_QUERIES["ext_poisson_bootstrap"](spark, sf_dir))
    assert plan.count("Scan parquet") <= 2, plan


def test_sliding_bitmap_no_count_distinct_expand(spark, sf_dir):
    """The sliding distinct must aggregate masks, not rewrite into
    the count-distinct Expand."""
    plan = _plan(ALL_QUERIES["ext_sliding_bitmap_distinct"](spark, sf_dir))
    assert "Expand" not in plan, plan
    assert "bit_or" in plan, plan


def test_iv_wald_is_joinless_single_pass(spark, sf_dir):
    """The Wald IV estimator is two stacked aggregates over one events
    scan — any Join in the plan means the conditional-aggregate
    rewrite regressed."""
    plan = _plan(ALL_QUERIES["ext_iv_wald"](spark, sf_dir))
    assert "Join" not in plan, plan
    assert plan.count("Scan parquet") == 1, plan


def test_propensity_control_levels_broadcast(spark, sf_dir):
    """The collapsed control-level table (|levels| << users) must
    re-join as a broadcast, and the interleave must not cartesian."""
    plan = _plan(ALL_QUERIES["ext_propensity_match"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_psi_scalar_combines_broadcast(spark, sf_dir):
    """PSI's totals/psi scalar cross joins must be broadcast nested
    loops over 1-row sides, never a shuffled cartesian."""
    plan = _plan(ALL_QUERIES["ext_psi_drift"](spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    # the bin rollup is checkpointed (one corpus pass builds it); every
    # residual parquet scan would mean a consumer bypassed it
    assert plan.count("Scan parquet") <= 1, plan


def test_wasserstein_ladder_no_cartesian(spark, sf_dir):
    """W1 rides the distinct-cents ladder: one scan, broadcast scalar
    total, no cartesian."""
    plan = _plan(ALL_QUERIES["ext_wasserstein_distance"](spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    # totals derive from the checkpointed ladder rollup, so at most the
    # single ladder-building scan may appear
    assert plan.count("Scan parquet") <= 1, plan


def test_quantile_normalize_group_sizes_broadcast(spark, sf_dir):
    """Per-group sizes and the pooled total attach as broadcasts; the
    only shuffled join is the rank-keyed pooled lookup."""
    plan = _plan(ALL_QUERIES["ext_quantile_normalize"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_lsh_tuning_reuses_cached_pairs(spark, sf_dir):
    """Every (r, b) config row must read the memoized verified-pair
    table (InMemoryTableScan), not re-run the inverted-index join."""
    plan = _plan(ALL_QUERIES["ext_lsh_tuning_curve"](spark, sf_dir))
    assert "InMemoryTableScan" in plan, plan


def test_t_closeness_grid_is_broadcast_only(spark, sf_dir):
    """The classes × bands grid builds from broadcast joins (both
    sides dimension-bounded); no shuffled cartesian anywhere."""
    plan = _plan(ALL_QUERIES["ext_t_closeness"](spark, sf_dir))
    assert "CartesianProduct" not in plan, plan


def test_spearman_ranks_broadcast_no_row_sort(spark, sf_dir):
    """Every histogram→doc rank attach is a broadcast-hash join and no
    sort-merge join appears: the corpus side must never be globally
    sorted or shuffled for ranking (the whole point of the
    value-histogram construction)."""
    plan = _plan(ALL_QUERIES["ext_spearman_signals"](spark, sf_dir))
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_winnowing_window_is_per_doc(spark, sf_dir):
    """The winnowing selection window partitions by doc_id — the plan
    must hash-partition on doc_id for the window, and no sort-merge
    join may appear (all rollup joins ride thin doc-keyed exchanges
    or broadcasts)."""
    plan = _plan(
        ALL_QUERIES["ext_winnowing_fingerprints"](spark, sf_dir)
    )
    assert "hashpartitioning(doc_id" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_isotonic_runs_on_checkpointed_ladder(spark, sf_dir):
    """The corpus collapses to the checkpointed ladder: zero residual
    parquet scans in the plan, no sort-merge join, no cartesian — the
    minimax triple rides broadcast joins over ladder-sized inputs."""
    plan = _plan(ALL_QUERIES["ext_isotonic_calibration"](spark, sf_dir))
    assert plan.count("Scan parquet") == 0, plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_aipw_is_broadcast_only(spark, sf_dir):
    """Propensity levels and the moment row attach as broadcasts onto
    the checkpointed user rollup: no sort-merge join, no cartesian,
    zero residual parquet scans."""
    plan = _plan(ALL_QUERIES["ext_aipw_ate"](spark, sf_dir))
    assert plan.count("Scan parquet") == 0, plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_kendall_histogram_join_is_broadcast(spark, sf_dir):
    """The triangular cell-pair join runs on the BROADCAST joint
    histogram (a BroadcastNestedLoopJoin on the va < vb range
    condition is the intended metadata-sized plan); the corpus side
    must never sort-merge or cartesian."""
    plan = _plan(ALL_QUERIES["ext_kendall_tau"](spark, sf_dir))
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan


def test_mmd_quads_no_cartesian_single_agg(spark, sf_dir):
    """The 4-way quad join must plan as joins on the thin quad key
    (never a cartesian), and the reduction is one partial+final
    aggregate pair."""
    plan = _plan(ALL_QUERIES["ext_mmd_drift"](spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert "HashAggregate" in plan, plan


def test_dup_weight_ops_ride_broadcasts(spark, sf_dir):
    """Source labels / cluster sizes attach by broadcast-hash join in
    the dedup diagnostics; no sort-merge join anywhere."""
    for name in ("ext_dup_source_matrix", "ext_dup_loss_weights"):
        plan = _plan(ALL_QUERIES[name](spark, sf_dir))
        assert "SortMergeJoin" not in plan, (name, plan)
        assert "BroadcastHashJoin" in plan, (name, plan)


def test_container_decode_is_shuffle_free_arrow_map(spark, sf_dir):
    """The PNG/GIF decode pipelines are pure fused maps: scan →
    ONE Arrow-batched Python stage (synth composed with decode inside
    the worker — the payload never crosses Arrow back to the JVM),
    with NO exchange — at 100 TB of media the decode adds zero
    shuffle, only a pipelined Python stage."""
    for name in ("ext_mm_png_decode", "ext_mm_gif_decode", "ext_mm_jpeg_decode"):
        plan = _plan(ALL_QUERIES[name](spark, sf_dir))
        assert "Exchange" not in plan, (name, plan)
        assert plan.count("MapInPandas") == 1, (name, plan)


def test_literal_frames_are_jvm_local_relations(spark, sf_dir):
    """jvm_rows/jvm_empty build literal seed tables as Catalyst
    LocalRelations (LocalTableScan / empty scan) — NEVER a Python-RDD
    createDataFrame, whose 32 Python partitions each pay a runner
    round-trip per plan evaluation (~4 s when a downstream coalesce(1)
    serializes them; the round-7 streaming-sketch finding)."""
    from mini_sql_engine_spark.functions.frames import jvm_empty, jvm_rows

    lit = jvm_rows(spark, [(1, 2.5), (2, -0.5)], "a int, b double")
    plan = _plan(lit)
    assert "Scan ExistingRDD" not in plan, plan
    assert "LocalTableScan" in plan, plan
    emp = jvm_empty(spark, "a long, b string")
    plan = _plan(emp)
    assert "Scan ExistingRDD" not in plan, plan
    # the IVF centroid seed (converted site) must stay a LocalRelation
    plan = _plan(ALL_QUERIES["ext_sim_ivf_topk"](spark, sf_dir))
    assert "Scan ExistingRDD" not in plan, plan


def test_full_outer_stream_join_is_symmetric_hash(spark, sf_dir):
    """The full-outer stream-stream join plans as a watermarked
    StreamingSymmetricHashJoin in FullOuter mode, keyed on user — state
    evicts by the watermark bounds, never an unbounded buffer."""
    from mini_sql_engine_spark.streaming.joins_ext import (
        click_purchase_full_join,
    )
    from mini_sql_engine_spark.streaming.windows import events_stream

    ev = events_stream(spark, sf_dir)
    j = click_purchase_full_join(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
    )
    # streaming plans only materialize inside a query; the analyzed
    # logical plan still pins the join type + watermarks
    lp = j._jdf.queryExecution().analyzed().toString()
    assert "FullOuter" in lp, lp
    assert lp.count("EventTimeWatermark") == 2, lp


def test_hilbert_value_is_vectorized_not_per_row(spark, sf_dir):
    """The Hilbert distance must come from the Arrow-vectorized
    kernel (ArrowEvalPython), never a row-at-a-time Python UDF
    (BatchEvalPython) — asserted on the pre-ladder relation, since
    range_prefix's checkpoint truncates lineage out of the final plan
    — and the blocking must ride range partitioning (the remaining
    SinglePartition exchanges aggregate the bounded per-block stats
    table, not data rows)."""
    from mini_sql_engine_spark.operators.layout import _hilbert_relation

    _, hd = _hilbert_relation(spark, sf_dir)
    pre = _plan(hd)
    assert "ArrowEvalPython" in pre, pre
    assert "BatchEvalPython" not in pre, pre
    # the blocking rank itself is range_prefix — the shared
    # range-partitioned ladder, plan-audited by its own tests (the
    # checkpoint inside it truncates these nodes out of the final
    # plan string, so they can't be asserted here)


def test_quantile_sketch_certificate_broadcasts(spark, sf_dir):
    """The sketch's exact certificate pass joins the 5-row estimate
    table against the data by BROADCAST (never shuffling the fact for
    a 5-row side), and the whole plan has no cartesian of data or
    sort-merge join — the summary merge is the only keyed exchange."""
    plan = _plan(ALL_QUERIES["ext_quantile_sketch"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_unigram_dp_is_single_arrow_kernel(spark, sf_dir):
    """The unigram lattice tokenizer keeps exactly ONE Python stage —
    the per-word-type DP kernel (the round-7 decision rule for
    state-carrying recursions); the vocab rides a broadcast join into
    the edge lattice."""
    plan = _plan(ALL_QUERIES["ext_unigram_tokenize"](spark, sf_dir))
    assert plan.count("MapInPandas") == 1, plan
    assert "BroadcastHashJoin" in plan, plan


def test_edit_distance_blocking_single_variant_exchange(spark, sf_dir):
    """FastSS blocking joins on the deletion variant — a SortMergeJoin
    or hash join keyed on the variant string, with the exact
    levenshtein verify as a post-join Filter, never a cartesian."""
    plan = _plan(ALL_QUERIES["ext_edit_distance_pairs"](spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert "levenshtein" in plan, plan


def test_grid_joins_block_on_cells_not_allpairs(spark, sf_dir):
    """The spatial self-join must key on (cx, cy) cells (constant 9x
    stamping), never plan a cartesian. DBSCAN's final plan reads its
    checkpointed neighbor RDD (lineage cut per round), so the cell
    keys are asserted on the spatial join it builds from; DBSCAN
    itself is pinned cartesian-free."""
    plan = _plan(ALL_QUERIES["ext_grid_spatial_join"](spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert "cx" in plan and "cy" in plan, plan
    dplan = _plan(ALL_QUERIES["ext_grid_dbscan"](spark, sf_dir))
    assert "CartesianProduct" not in dplan, dplan


def test_yannakakis_semi_reducers_survive(spark, sf_dir):
    """The semi-join sweep must stay in the physical plan (Catalyst
    must not collapse the reducers into the plain join)."""
    plan = _plan(ALL_QUERIES["ext_yannakakis_reduction"](spark, sf_dir))
    assert plan.count("LeftSemi") >= 3, plan


def test_merkle_ladder_is_hash_aggregates(spark, sf_dir):
    """The fingerprint ladder is groupBy levels (objhash/sort agg on a
    16x-shrinking key) with no window, no collect-to-driver loop."""
    plan = _plan(ALL_QUERIES["ext_merkle_fingerprint"](spark, sf_dir))
    assert "Window" not in plan, plan
    assert plan.count("Aggregate") >= 4, plan


def test_global_windows_carry_bounded_justification():
    """Every ``Window.orderBy`` without ``partitionBy`` funnels all its
    input through one task; at 100 TB that is only acceptable when the
    input is bounded BY CONSTRUCTION (post-limit top-K, a sketch
    summary <= K*P rows, a calendar-days or value-domain ladder).
    Round-8 verdict: each such site must be classifiable at a glance.
    This lint enforces a ``bounded`` justification comment within the
    six lines above (or one line below) every global-window site; the
    corpus-proportional ladders (KS, Mann-Whitney, W1, conformal, ABC)
    were rewritten onto range_prefix instead of being tagged.
    ``functions/ranking.py`` is exempt: its internal windows run on the
    one-row-per-shuffle-partition offset grid and the module docstring
    is the justification."""
    import glob
    import os

    root = os.path.join(os.path.dirname(__file__), "..")
    offenders: list[str] = []
    for path in glob.glob(
        os.path.join(root, "mini_sql_engine_spark", "**", "*.py"),
        recursive=True,
    ):
        if path.endswith(os.path.join("functions", "ranking.py")):
            continue
        with open(path) as fh:
            lines = fh.read().split("\n")
        for i, line in enumerate(lines):
            if "Window.orderBy" not in line or line.strip().startswith("#"):
                continue
            ctx = "\n".join(lines[max(0, i - 6) : i + 2]).lower()
            # the SPECIFIC tag, not the bare word: an unrelated
            # 'bounded' in a nearby docstring must not satisfy the
            # lint (round-9 advice)
            if "# bounded" not in ctx:
                offenders.append(f"{os.path.relpath(path, root)}:{i + 1}")
    assert not offenders, (
        "unjustified global windows (add a '# bounded global window: "
        "<why>' tag or rewrite onto functions.ranking.range_prefix): "
        f"{offenders}"
    )


def test_aqe_splits_the_skewed_join(spark, sf_dir):
    """ext_aqe_skew_join leaves a 75%-hot join key to adaptive
    execution. With demo-scale thresholds, AQE must (a) mark the
    shuffle-hash join ``skew=true`` in the final adaptive plan and
    (b) produce exactly the plain-join result — the runtime split is
    a pure re-partitioning, the same contract ext_salted_join pins
    for manual salting."""
    from mini_sql_engine_spark.operators.pipeline_ops import aqe_skew_join

    overrides = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "10KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "10KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in overrides}
    try:
        for k, v in overrides.items():
            spark.conf.set(k, v)
        # amplified fact side: sf0.001 holds ~200 purchase rows, far
        # below any realistic byte threshold; x256 pushes the hot
        # partition into the hundreds of KB so real thresholds fire
        df = aqe_skew_join(spark, sf_dir, amplify=256)
        rows = {r.c_nationkey: (r.n_purchases, r.revenue) for r in df.collect()}
        final = df._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final, final
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    # identical result with the skew machinery left at defaults
    base = {
        r.c_nationkey: (r.n_purchases, r.revenue)
        for r in aqe_skew_join(spark, sf_dir, amplify=256).collect()
    }
    assert rows == base


def test_band_registry_is_jvm_side_and_blocked(spark, sf_dir):
    """The streaming band registry's per-doc banding must stay JVM-side
    (md5 + affine-permutation expressions — no Python eval in the hot
    projection) and the final audit must join registry-by-band, never
    plan a cartesian."""
    from mini_sql_engine_spark.catalog import load_table
    from mini_sql_engine_spark.streaming.upsert import _doc_bands

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    plan = _plan(_doc_bands(docs))
    assert "Python" not in plan, plan  # no Arrow/pickled eval in the path
    assert "CartesianProduct" not in plan, plan
    audit = ALL_QUERIES["stream_band_dedup"](spark, sf_dir)
    aplan = _plan(audit)
    assert "CartesianProduct" not in aplan, aplan
