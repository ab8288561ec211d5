"""Time a subset of registry entries in isolation (noop sink, min-of-N).

Usage: python tools/time_queries.py name1 name2 ... [--reps 3] [--sf sf0.1]

Round-10 optimization helper (guide §1.4): same methodology as
bench.py (fresh plan per rep, noop sink, min over reps) but for a
handful of queries, so a tail query can be re-measured in seconds
instead of re-running the 438-entry suite. Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    args = sys.argv[1:]
    reps, sf = 3, "sf0.1"
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        del args[i : i + 2]
    if "--sf" in args:
        i = args.index("--sf")
        sf = args[i + 1]
        del args[i : i + 2]
    names = args
    sf_dir = f"/root/testdata/{sf}"

    from pyspark.sql import functions as F

    from mini_sql_engine_spark.catalog import SF_TABLES, load_table
    from mini_sql_engine_spark.operators import ALL_QUERIES
    from mini_sql_engine_spark.session import get_spark

    spark = get_spark(app_name="time-queries")
    # identical warmup to bench.py: JVM, parquet footers, worker pool
    spark.range(1000).selectExpr("sum(id)").collect()
    for t in SF_TABLES:
        load_table(spark, sf_dir, t).limit(1).collect()
    n_cores = spark.sparkContext.defaultParallelism
    spark.range(4096).repartition(n_cores).withColumn(
        "g", F.col("id") % (n_cores * 4)
    ).groupBy("g").applyInPandas(lambda pdf: pdf, "id long, g long").collect()

    out: dict[str, float] = {}
    for name in names:
        fn = ALL_QUERIES[name]
        spark.sparkContext.setJobDescription(name)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 3)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"sf": sf, "reps": reps, "loadavg": round(os.getloadavg()[0], 2), "queries": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
