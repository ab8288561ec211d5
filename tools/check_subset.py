"""Verify a subset of registry entries against their DuckDB oracles.

Usage:  python tools/check_subset.py name1 name2 ... [--sfs sf0.001,sf0.01,sf0.1]

Round-10 optimization helper: after touching an operator, re-prove the
exact oracle (rows + schema + value-hash via tests.oracle_utils) at all
three SFs without paying for the full 438-entry sweep. Exit 0 iff every
named entry passes at every SF.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    args = sys.argv[1:]
    sfs = ["sf0.001", "sf0.01", "sf0.1"]
    if "--sfs" in args:
        i = args.index("--sfs")
        sfs = args[i + 1].split(",")
        del args[i : i + 2]
    names = args
    if not names:
        print("usage: check_subset.py name1 [name2 ...] [--sfs a,b]")
        return 2

    import __spark_entry__ as entrymod
    from mini_sql_engine_spark.session import get_spark
    from tests.oracle_utils import assert_frames_match, duckdb_run

    spark = get_spark()
    queries, oracles = entrymod.queries(), entrymod.oracle_sql()
    fail = 0
    for name in names:
        if name not in queries:
            print(f"{name}: NOT IN REGISTRY")
            fail += 1
            continue
        for sf in sfs:
            sf_dir = f"/root/testdata/{sf}"
            t0 = time.time()
            try:
                sdf = queries[name](spark, sf_dir).toPandas()
                if name in oracles:
                    odf = duckdb_run(oracles[name], sf_dir)
                    assert_frames_match(sdf, odf, name)
                    status = "hash_match"
                else:
                    assert len(sdf) > 0, "rows-only query returned 0 rows"
                    status = "rows_only_pass"
                print(f"{name} @ {sf}: {status} "
                      f"({len(sdf)} rows, {time.time() - t0:.1f}s)")
            except Exception as ex:  # noqa: BLE001
                fail += 1
                print(f"{name} @ {sf}: FAIL {type(ex).__name__}: {ex}")
    print("PASS" if fail == 0 else f"FAIL ({fail})")
    return 0 if fail == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
