"""Local replica of the driver's DuckDB-oracle comparison.

Mirrors __spark_entry__'s documented check: row-count + schema (column
names, sorted) + order-insensitive value comparison. Used by
tests/test_oracle.py so every queries() entry is validated before the
driver ever runs.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from mini_sql_engine_spark.catalog import SF_TABLES


def duckdb_run(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in SF_TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def assert_frames_match(spark_df: pd.DataFrame, oracle_df: pd.DataFrame, name: str) -> None:
    if len(spark_df) != len(oracle_df):
        # show the symmetric difference, not just counts — a one-row
        # discrepancy is undebuggable from counts alone (this dump is
        # how the minhash lambda-arity bug was found)
        sa = {tuple(r) for r in spark_df.itertuples(index=False)}
        so = {tuple(r) for r in oracle_df.itertuples(index=False)}
        raise AssertionError(
            f"{name}: row count {len(spark_df)} != oracle {len(oracle_df)}; "
            f"spark-only={sorted(sa - so)[:10]} "
            f"oracle-only={sorted(so - sa)[:10]}"
        )
    assert sorted(spark_df.columns) == sorted(oracle_df.columns), (
        f"{name}: columns {sorted(spark_df.columns)} != oracle {sorted(oracle_df.columns)}"
    )
    a, b = _canon(spark_df), _canon(oracle_df)
    for col in a.columns:
        # dtype parity: the driver's compare includes schema; int32-vs-
        # int64 (Spark row_number/size/... return int) or HUGEINT-via-
        # float64 drift would pass a value check but fail a schema one.
        # Cast to long on the Spark side / BIGINT in the oracle.
        assert str(a[col].dtype) == str(b[col].dtype), (
            f"{name}: col {col} dtype spark={a[col].dtype} "
            f"oracle={b[col].dtype}"
        )
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if isinstance(x, float) or isinstance(y, float):
                # EXACT equality: the driver compares value hashes, not
                # tolerances — a query that only matches within 1e-9
                # here would fail the real gate. (Audited round 1: all
                # 127 oracles are repr-identical at sf0.01.)
                ok = (pd.isna(x) and pd.isna(y)) or repr(float(x)) == repr(
                    float(y)
                )
                if not ok and math.isclose(
                    float(x), float(y), rel_tol=1e-9, abs_tol=1e-9
                ):
                    raise AssertionError(
                        f"{name}: col {col} row {i}: spark={x!r} vs "
                        f"oracle={y!r} — close but not EXACT; make the "
                        "expression deterministic (decimal accumulation "
                        "/ round-through-decimal), do not loosen this"
                    )
            else:
                ok = str(x) == str(y)
            assert ok, f"{name}: col {col} row {i}: spark={x!r} oracle={y!r}"
