from __future__ import annotations

import os

import pytest

from mini_sql_engine_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
MINI_DIR = os.path.join(os.path.dirname(__file__), "fixtures", "mini")

# every range_prefix/range_lag call in the suite verifies its
# unique-composite-order contract (functions/ranking.py) — a caller
# passing a tie-prone order fails the suite instead of shipping
# nondeterministic ranks; production runs skip the extra aggregate
os.environ.setdefault("SPARK_GRAFT_CHECK_UNIQUE_ORDER", "1")


@pytest.fixture(scope="session")
def spark():
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    os.environ["SPARK_GRAFT_CPUS"] = cpus
    s = get_spark(app_name="mini-sql-engine-tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def mini_dir() -> str:
    return MINI_DIR
