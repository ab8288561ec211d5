"""Reproduce the scaling evidence: run bench.py at two scale factors
and report the wall-clock ratio.

    python tools/scaling_report.py [sf_small_dir] [sf_big_dir]

Defaults to sf0.001 vs sf0.1 (100x data). Each run is a separate
process (fresh JVM) so neither run warms the other. Prints one JSON
line: totals, per-query counts, and the big/small ratio — the number
BASELINE.md §3 records (fixed-overhead-dominated: 100x data should
cost well under 2x wall-clock on this suite).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        check=True,
    )
    last = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(last)


def main() -> None:
    small = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    big = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    a = run_bench(small)
    b = run_bench(big)
    print(
        json.dumps(
            {
                "small_sf": a["sf"],
                "small_total_s": a["value"],
                "big_sf": b["sf"],
                "big_total_s": b["value"],
                "n_queries": b["n_queries"],
                "wallclock_ratio": round(b["value"] / a["value"], 4),
                "data_ratio": round(b["sf"] / a["sf"], 2) if a["sf"] > 0 else None,
            }
        )
    )


if __name__ == "__main__":
    main()
