"""Deterministic numeric reductions.

`qsum` is the fixed-point quantized float sum used by the
entropy/information operators: quantize each identically-computed
double term to integer nano-units, SUM the longs exactly, divide back
once at the end. Integer addition is associative, so partial-agg order
can never change the result — the construction that makes
Σ f(count)-style float reductions bit-stable at any parallelism. The
cost is 1e-9 quantization per term, far below reporting precision.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

NANO = 1_000_000_000  # fixed-point scale


def qsum(term: Column) -> Column:
    """Order-proof distributed sum of a double expression (see module
    docstring). Divide the result by NANO to recover the float."""
    return F.sum(F.floor(term * NANO + 0.5).cast("long"))
