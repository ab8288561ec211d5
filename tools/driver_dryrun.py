"""Driver dry-run (BUILDER-TIME tool): simulate the correctness gate.

Reproduces what the driver does each round, under conditions the test
suite can't: a BARE SparkSession with default confs (no
``session.get_spark`` settings — the environment that produced round
5's only failures), running the FIRST N entries of ``queries()`` (the
window the driver will hash) at the driver's scale factor and
comparing each against its ``oracle_sql()`` with the suite's exact
replica of the driver compare (rows + schema + exact values).

    python tools/driver_dryrun.py [n_queries] [sf_dir]
    python tools/driver_dryrun.py <name> [<name> ...] [sf_dir]

Defaults: 50 queries (the driver window), /root/testdata/sf0.01 (the
driver gate scale). A non-integer first argument selects queries by
NAME instead (spot-check a new operator under the bare session).
Exit 0 = every entry would go green.
"""

from __future__ import annotations

import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main() -> int:
    argv = sys.argv[1:]
    names: list[str] = []
    n_window = 50
    sf_dir = "/root/testdata/sf0.01"
    if argv and argv[-1].startswith("/"):
        sf_dir = argv.pop()
    if argv:
        try:
            n_window = int(argv[0])
        except ValueError:
            names = argv

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("driver-dryrun")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    assert (
        spark.conf.get("spark.sql.python.filterPushdown.enabled") == "false"
    ), "session is not vanilla; dry run is void"

    import __spark_entry__ as entrymod
    from oracle_utils import assert_frames_match, duckdb_run

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if names:
        unknown = [n for n in names if n not in queries]
        assert not unknown, f"not in queries(): {unknown}"
        window = names
    else:
        window = list(queries)[:n_window]

    failed: list[str] = []
    for i, name in enumerate(window):
        t0 = time.perf_counter()
        try:
            sdf = queries[name](spark, sf_dir).toPandas()
            if name in oracles:
                odf = duckdb_run(oracles[name], sf_dir)
                assert_frames_match(sdf, odf, name)
                verdict = "green"
            else:
                verdict = "rows-only" if len(sdf) > 0 else "EMPTY"
        except Exception as exc:  # noqa: BLE001
            verdict = f"FAIL {type(exc).__name__}: {exc}"
            traceback.print_exc()
            failed.append(name)
        print(
            f"[{i + 1:2d}/{len(window)}] {name}: {verdict} "
            f"({time.perf_counter() - t0:.1f}s)",
            flush=True,
        )
    print(f"dry run: {len(window) - len(failed)}/{len(window)} green")
    if failed:
        print("FAILED:", failed)
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
