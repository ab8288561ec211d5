"""General sources & sinks: parquet / CSV / JSON / ORC, partitioned and
bucketed writes.

The reference's only source is whole-file CSV into memory and its only
sink is stdout (SURVEY.md §2.1 O2/O16). Spark's readers are lazy,
schema-aware, splittable scans; the writers here encode the layout
decisions that matter at 100 TB:

- `write_partitioned`: hive-style directory partitioning on low-
  cardinality keys → static + dynamic partition pruning at read time;
- `write_bucketed`: pre-shuffled, bucket-sorted table layout keyed on a
  join column → co-located (shuffle-free) joins and aggs for every
  downstream query that joins on that key, at the cost of one shuffle
  at write time;
- `compact_files`: small-files compaction — rewrite a directory into
  ~target-size files with an atomic rename swap;
- CSV/JSON readers take an explicit schema — schema inference scans the
  data twice and infers per-file at scale (never in production paths).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

FORMATS = ("parquet", "csv", "json", "orc")


def read_any(
    spark: SparkSession,
    path: str,
    fmt: str,
    schema: StructType | str | None = None,
    allow_infer: bool = False,
    **options: str,
) -> DataFrame:
    """Lazy scan of `path` in any supported format.

    Parquet/ORC carry their own schema; CSV/JSON require one — an
    explicit schema beats inference (one pass, stable types,
    nullability kept), and at 100 TB inference is an extra full scan
    whose result can differ per file. That rule is enforced: a
    schema-less CSV/JSON read raises unless ``allow_infer=True`` is
    passed explicitly (tests / interactive exploration only).
    """
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; supported: {FORMATS}")
    reader = spark.read.format(fmt)
    if fmt == "csv":
        reader = reader.option("header", "true")
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt in ("csv", "json"):
        if not allow_infer:
            raise ValueError(
                f"{fmt} read of {path!r} needs an explicit schema "
                "(inference double-scans and drifts per file at scale); "
                "pass allow_infer=True to opt in for small/test data"
            )
        reader = reader.option("inferSchema", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def write_any(df: DataFrame, path: str, fmt: str, **options: str) -> None:
    """Write `df` to `path`; CSV gets a header so round-trips keep names."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; supported: {FORMATS}")
    writer = df.write.format(fmt).mode("overwrite")
    if fmt == "csv":
        writer = writer.option("header", "true")
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save(path)


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], fmt: str = "parquet"
) -> None:
    """Hive-style partitioned layout: `path/col=value/...`.

    Readers with a filter on `partition_cols` scan only matching
    directories (partition pruning — visible as `PartitionFilters` in
    the physical plan). Keep partition columns low-cardinality; a
    high-cardinality partition key creates a small-files problem."""
    df.write.mode("overwrite").partitionBy(*partition_cols).format(fmt).save(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_col: str | None = None,
) -> None:
    """Bucketed + sorted managed table (`saveAsTable` — bucketing needs
    the session catalog, not a bare path).

    Two tables bucketed on the same key with the same bucket count join
    WITHOUT a shuffle on either side — the physical plan shows no
    Exchange above the scans. This is the pre-partitioning strategy for
    a fact table joined on the same key by many queries.

    A previous session's managed-table directory can outlive the
    in-memory catalog entry, which makes `overwrite` fail with
    LOCATION_ALREADY_EXISTS — drop the table and clear any orphaned
    location first."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    jvm = spark._jvm
    location = jvm.org.apache.hadoop.fs.Path(warehouse, table_name.lower())
    fs = location.getFileSystem(spark._jsc.hadoopConfiguration())
    fs.delete(location, True)
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    writer = writer.sortBy(sort_col or bucket_col)
    writer.format("parquet").saveAsTable(table_name)


def compact_files(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite a directory of many small files into ~target-size files;
    returns the new file count.

    Small files are the classic operational failure mode of a long-
    lived 100 TB lake: every file costs a scheduler task, an open, and
    a footer read, so a table ingested by thousands of tiny streaming
    micro-batches scans 100x slower than the same bytes in 128 MB
    files. Compaction sizes the output from the ACTUAL byte size
    (hadoop FS API — works for any filesystem Spark can reach), uses
    `coalesce` (no shuffle — task-side concatenation), writes beside
    the source, then swaps via FS rename so readers never see a
    HALF-WRITTEN directory. Caveat: between the two renames there is a
    brief window where `path` does not exist at all — a concurrent
    reader can get FileNotFound (inherent to two renames on a Hadoop
    FS; true atomicity needs a metadata/manifest indirection à la
    Iceberg/Delta). Data is always restorable: at every step either
    `path` or `path + ".compact-backup"` holds the full original.
    """
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    src = jvm.org.apache.hadoop.fs.Path(path)
    fs = src.getFileSystem(hconf)
    total = fs.getContentSummary(src).getLength()
    n_files = max(1, -(-int(total) // target_file_bytes))  # ceil

    df = spark.read.format(fmt).load(path)
    tmp = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + ".compact-tmp")
    backup = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + ".compact-backup")
    fs.delete(tmp, True)
    df.coalesce(n_files).write.mode("overwrite").format(fmt).save(tmp.toString())
    # Swap via backup-then-rename so the original data is never the only
    # casualty of a failed rename: src moves aside first (restorable),
    # tmp moves into place, and only then is the backup deleted. If the
    # forward rename fails the backup is restored before raising.
    fs.delete(backup, True)
    if not fs.rename(src, backup):
        fs.delete(tmp, True)
        raise IOError(f"compaction backup rename failed for {path}")
    if not fs.rename(tmp, src):
        restored = fs.rename(backup, src)  # restore original
        fs.delete(tmp, True)
        if not restored:
            raise IOError(
                f"compaction swap failed for {path} AND restore failed; "
                f"original data is intact at {backup.toString()}"
            )
        raise IOError(f"compaction swap failed for {path} (original restored)")
    fs.delete(backup, True)
    return n_files
