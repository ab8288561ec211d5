"""Round-closing oracle sweep gate (BUILDER-TIME tool).

Runs the FULL queries()-vs-DuckDB differential at a given scale factor
and writes a machine-readable summary to SWEEP_<sf>.json at the repo
root. The sf0.1 sweep is the round-closing gate: it is 10x the
driver's sf0.01 check scale and is what surfaced every cross-engine
divergence found so far (all rounded-unstable-double ties; see
SCALE.md). Run both before closing a round:

    python tools/sweep_oracles.py /root/testdata/sf0.01
    python tools/sweep_oracles.py /root/testdata/sf0.1

Exit code 0 iff every entry passes (oracle hash-match, or rows>0 for
the rows-only-by-design entries).
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    tag = os.path.basename(sf_dir.rstrip("/"))

    import __spark_entry__ as entrymod
    from mini_sql_engine_spark.session import get_spark
    from tests.oracle_utils import assert_frames_match, duckdb_run

    spark = get_spark()
    queries, oracles = entrymod.queries(), entrymod.oracle_sql()
    results: dict[str, dict] = {}
    n_pass = n_fail = 0
    t_start = time.time()
    for name, fn in queries.items():
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
            if name in oracles:
                odf = duckdb_run(oracles[name], sf_dir)
                assert_frames_match(sdf, odf, name)
                status = "hash_match"
            else:
                assert len(sdf) > 0, "rows-only query returned 0 rows"
                status = "rows_only_pass"
            n_pass += 1
            results[name] = {
                "status": status,
                "rows": int(len(sdf)),
                "sec": round(time.time() - t0, 2),
            }
        except Exception as ex:  # noqa: BLE001 - sweep must not stop
            n_fail += 1
            results[name] = {
                "status": "FAIL",
                "error": f"{type(ex).__name__}: {ex}"[:500],
                "sec": round(time.time() - t0, 2),
            }
            traceback.print_exc(limit=3)
        print(
            f"[{n_pass + n_fail}/{len(queries)}] {name}: "
            f"{results[name]['status']}",
            flush=True,
        )
    summary = {
        "sf_dir": sf_dir,
        "n_queries": len(queries),
        "n_pass": n_pass,
        "n_fail": n_fail,
        "failed": sorted(n for n, r in results.items() if r["status"] == "FAIL"),
        "total_sec": round(time.time() - t_start, 1),
        "results": results,
    }
    out = os.path.join(REPO, f"SWEEP_{tag}.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=1)
    print(f"\n{out}: {n_pass}/{len(queries)} pass, {n_fail} fail")
    return 0 if n_fail == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
