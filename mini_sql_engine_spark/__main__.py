"""CLI parity with the reference: ``python -m mini_sql_engine_spark "<query>"``.

The reference runs ``python main.py "SELECT ... ;"`` against
``metadata.txt`` + CSV tables in the working directory (SURVEY.md §3.1).
Same contract here: query string argv, CSV to stdout, error message +
exit 1 on bad queries. ``--data`` picks the catalog directory
(metadata.txt layout), ``--parquet`` a scale-factor parquet directory.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="mini_sql_engine_spark")
    p.add_argument("query", help="reference-dialect SQL, must end with ';'")
    p.add_argument("--data", default=".", help="dir with metadata.txt + <table>.csv files")
    p.add_argument("--parquet", default=None, help="scale-factor parquet dir instead of --data")
    p.add_argument("--cpus", type=int, default=4, help="local parallelism for the CLI session")
    p.add_argument(
        "--explain",
        action="store_true",
        help="print the physical plan instead of executing",
    )
    p.add_argument(
        "--ansi",
        action="store_true",
        help="treat the query as full Spark SQL instead of the reference dialect",
    )
    p.add_argument(
        "--connector",
        action="store_true",
        help="read --data tables through the format('minisql') DataSource",
    )
    args = p.parse_args(argv)

    from mini_sql_engine_spark.engine import Engine
    from mini_sql_engine_spark.plans.dialect import EngineError
    from mini_sql_engine_spark.session import get_spark

    spark = get_spark(app_name="mini-sql-engine-cli", master=f"local[{args.cpus}]")
    try:
        if args.parquet:
            eng = Engine.from_parquet_dir(spark, args.parquet)
        elif args.connector:
            eng = Engine.from_datasource_dir(spark, args.data)
        else:
            eng = Engine.from_metadata_dir(spark, args.data)
        if args.ansi:
            from pyspark.errors import AnalysisException, ParseException

            try:
                df = eng.ansi_sql(args.query)
                if args.explain:
                    print(df._jdf.queryExecution().explainString(
                        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
                    ))
                else:
                    rows = df.collect()
                    print(",".join(df.columns))
                    for row in rows:
                        print(",".join(str(v) for v in row))
            except (AnalysisException, ParseException) as e:
                print(f"error: {e.getMessage() if hasattr(e, 'getMessage') else e}", file=sys.stderr)
                return 1
        else:
            print(eng.explain(args.query) if args.explain else eng.execute(args.query))
    except EngineError as e:
        print(f"error: {e}", file=sys.stderr)
        return 1
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
