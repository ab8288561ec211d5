"""User-defined function surfaces: vectorized pandas UDF and Python UDTF.

SURVEY.md §2.2 marks UDF/UDAF/UDTF as stretch — built-ins always win
when they can express the semantics (everything else in this repo is
built-in). These two entries exist to cover the escape hatch itself:

- `ext_pandas_udf_score`: an Arrow-batched scalar pandas UDF. The whole
  column batch crosses the JVM↔Python boundary ONCE per Arrow batch
  (not per row) and is processed with vectorized numpy/pandas ops —
  the only acceptable Python hot path at 100 TB.
- `ext_udtf_ngrams`: a Python UDTF (Spark 4 lateral-join surface) that
  expands each document into its token bigrams. Arrow-optimized eval;
  output cardinality is data-dependent, which is exactly what UDTFs
  add over scalar UDFs.

Both use arithmetic that plain SQL replicates, so the DuckDB oracle
checks values — the point is the plumbing, not novel math.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.functions import pandas_udf, udtf
from pyspark.sql.types import DoubleType

from mini_sql_engine_spark.catalog import load_table


@pandas_udf(DoubleType())
def _density_score(n_chars: pd.Series, text: pd.Series) -> pd.Series:
    """chars-per-token density, computed vectorized on Arrow batches."""
    n_tokens = text.str.split().map(len).astype("float64")
    return (n_chars.astype("float64") / (1.0 + n_tokens)).round(6)


def pandas_udf_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", _density_score("n_chars", "text").alias("density")
    )


@udtf(returnType="doc_id: bigint, pos: int, bigram: string", useArrow=True)
class _BigramUDTF:
    """Expand one document row into (pos, bigram) rows.

    useArrow=True plans ArrowEvalPythonUDTF — results cross the
    Python→JVM boundary as Arrow batches instead of pickled rows
    (plan-asserted in tests/test_plans.py)."""

    def eval(self, doc_id: int, text: str) -> Iterator[tuple]:
        toks = text.split()
        for i in range(len(toks) - 1):
            yield doc_id, i, f"{toks[i]} {toks[i + 1]}"


def udtf_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("udtf_docs_src")
    spark.udtf.register("bigram_udtf", _BigramUDTF)
    return spark.sql(
        """
        SELECT b.doc_id, b.pos, b.bigram
        FROM udtf_docs_src d,
             LATERAL bigram_udtf(d.doc_id, d.text) b
        """
    )


@pandas_udf(DoubleType())
def _median_agg(v: pd.Series) -> float:
    """Grouped-aggregate pandas UDF (UDAF): exact median per group.

    The whole group's column arrives as one pandas Series (Arrow
    batch); numpy's midpoint interpolation matches DuckDB's median
    for even-sized groups.
    """
    import numpy as np

    return float(np.median(v.to_numpy()))


def pandas_udaf_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.round(_median_agg("value"), 4).alias("median_value")
    )


QUERIES: dict[str, Callable] = {
    "ext_pandas_udf_score": pandas_udf_score,
    "ext_pandas_udaf_median": pandas_udaf_median,
    "ext_udtf_ngrams": udtf_ngrams,
}

ORACLES: dict[str, str] = {
    "ext_pandas_udf_score": """
        SELECT doc_id,
               ROUND(CAST(n_chars AS DOUBLE)
                     / (1.0 + len(string_split_regex(text, '\\s+'))), 6)
                   AS density
        FROM documents
    """,
    "ext_pandas_udaf_median": """
        SELECT event_type, ROUND(median(value), 4) AS median_value
        FROM events GROUP BY event_type
    """,
    "ext_udtf_ngrams": """
        WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
                   FROM documents),
        b AS (SELECT doc_id,
                     [{'pos': i - 1, 'bigram': toks[i] || ' ' || toks[i + 1]}
                      for i in range(1, len(toks))] AS pairs
              FROM t WHERE len(toks) >= 2),
        u AS (SELECT doc_id, unnest(pairs) AS p FROM b)
        SELECT doc_id, CAST(p.pos AS INT) AS pos, p.bigram FROM u
    """,
}
