"""Driver-session robustness: run conf-sensitive queries under a BARE
SparkSession with none of ``session.get_spark``'s confs.

Round 5's only failure class was environmental: the correctness driver
runs ``queries()`` under ITS OWN session (default confs), and the four
foreachBatch streaming demos that read state back through
``format("minisql")`` died because Spark 4.1 hard-fails a Python data
source whose reader implements ``pushFilters()`` while
``spark.sql.python.filterPushdown.enabled`` is off
(``DATA_SOURCE_PUSHDOWN_DISABLED``). Every conf that ``get_spark``
sets is a latent instance of the same hazard — any query that needs a
conf must set it itself.

This test would have caught round 5's failure before the driver did:
it spawns a SUBPROCESS (the only way to get a truly conf-free JVM —
the suite's session fixture bakes its confs into the shared
SparkContext), builds ``SparkSession.builder.master("local[4]")`` with
no engine confs, asserts the pushdown conf really is off, and runs a
sample covering every conf-sensitive family:

- native-source foreachBatch sink (the 4 round-5 reds' family):
  ``stream_upsert_totals``, ``stream_psi_drift``;
- native-source streaming tail read: ``stream_native_tail``;
- Arrow pandas_udf path: ``ext_pandas_udf_score``;
- TIMESTAMP(NANOS) parquet read (``nanosAsLong``): ``ext_session_window``;
- native batch read + time travel: ``ext_time_travel_diff``;
- the flagship composed plan: ``flagship``.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

SAMPLE = [
    "stream_upsert_totals",
    "stream_psi_drift",
    "stream_native_tail",
    # round-7 additions to the native-sink family: session_window over
    # the tail's reconstructed µs timestamps, and the mergeable-sketch
    # append sink
    "stream_native_tail_sessions",
    "stream_quantile_sketch",
    # round-7 continuation: the first-class minisql streaming SINK
    "stream_native_sink_totals",
    "ext_pandas_udf_score",
    "ext_session_window",
    "ext_time_travel_diff",
    "flagship",
]

_SUBPROC = r"""
import sys

from pyspark.sql import SparkSession

sf_dir, names = sys.argv[1], sys.argv[2].split(",")
spark = (
    SparkSession.builder.master("local[4]")
    .appName("vanilla-session-check")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
# Prove this session is driver-like: the conf that killed round 5's
# four streams must be OFF here (engine code has to cope on its own).
assert (
    spark.conf.get("spark.sql.python.filterPushdown.enabled") == "false"
), "subprocess session is not vanilla; test is void"

from __spark_entry__ import queries

qs = queries()
for name in names:
    df = qs[name](spark, sf_dir)
    n = df.count()
    print(f"VANILLA PASS {name} rows={n}", flush=True)
print("VANILLA_ALL_OK", flush=True)
"""


def test_sample_runs_under_bare_session(tmp_path):
    if not os.path.isdir(SF_DIR):
        pytest.skip(f"test data missing: {SF_DIR}")
    script = tmp_path / "vanilla_check.py"
    script.write_text(_SUBPROC)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, str(script), SF_DIR, ",".join(SAMPLE)],
        capture_output=True,
        text=True,
        timeout=900,
        env=env,
        cwd=REPO,
    )
    tail = "\n".join((proc.stdout + "\n" + proc.stderr).splitlines()[-40:])
    assert proc.returncode == 0, f"vanilla-session run failed:\n{tail}"
    assert "VANILLA_ALL_OK" in proc.stdout, f"incomplete run:\n{tail}"
    for name in SAMPLE:
        assert f"VANILLA PASS {name} " in proc.stdout, f"{name} missing:\n{tail}"
