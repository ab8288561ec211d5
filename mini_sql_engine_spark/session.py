"""SparkSession factory with scale-minded defaults.

Local testing runs on ``local[N]``; the configs below are chosen so the
same code is correct and fast on a 1000-executor cluster:

- AQE on (runtime re-plan: coalesce shuffle partitions, skew-join
  splitting, broadcast-join demotion/promotion at runtime);
- Arrow on (any Pandas-UDF path ships columnar batches, not pickled rows);
- shuffle partitions sized by ``SPARK_GRAFT_CPUS`` locally; on a real
  cluster AQE coalescing makes the static number mostly irrelevant as
  long as it is an upper bound, so we leave the knob overridable.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "mini-sql-engine-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults."""
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # parquet scans: split large files, keep partition size bounded so a
        # partition always fits executor memory at any scale factor
        .config("spark.sql.files.maxPartitionBytes", "128m")
        # events.ts is parquet TIMESTAMP(NANOS) which Spark cannot read
        # natively; read as long nanos, catalog.load_table converts to a
        # microsecond TimestampType column
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # let the native format("minisql") reader absorb integer
        # comparison predicates (MiniSQLReader.pushFilters)
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
