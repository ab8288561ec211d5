"""Vector math over ArrayType(FloatType()) columns.

Two tiers:

- Expression tier (`dot`/`norm`/`cosine`): `zip_with` + `aggregate`,
  JVM-side. Elements are cast to double before multiplication so
  accumulation matches engines that compute in double (DuckDB's
  list_dot_product), avoiding float32 accumulation drift in oracle
  comparisons. Right for O(n) scoring (query-vs-corpus with a small
  broadcast query side). Higher-order functions are NOT whole-stage
  codegen'd, so this tier is wrong for O(n²) all-pairs work.

- Blocked-matmul tier (`allpairs_cosine`, `allpairs_grouped_sums`):
  the all-pairs scale path. Vectors are assigned to B blocks; each of
  the B(B+1)/2 block pairs becomes one `applyInPandas` group that
  scores its cross product with one numpy float64 matmul (Arrow in,
  Arrow out — no per-row Python). Peak memory per task is 2·(n/B)
  vectors, so B is the knob that keeps tasks bounded as n grows; the
  shuffle moves each vector B+1 times (replication factor ≈ B+1),
  which at 100 TB is the standard blocked-nested-loop trade.

  Oracle exactness: matmul may reorder the 64-term accumulation
  (SIMD/blocking), so emitted scores are RE-computed with
  `np.cumsum` over the per-element float64 products — sequential
  left-to-right accumulation, bit-identical to both the expression
  tier and DuckDB's list_dot_product. The matmul only prunes, with a
  1e-9 margin (≫ any reorder drift at dim 64).
"""

from __future__ import annotations

from collections.abc import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """General cosine; for unit-norm embeddings prefer plain `dot`
    (FIXTURES.md §1.2 verifies unit L2 norm for every row)."""
    return dot(a, b) / (norm(a) * norm(b))


def _seq_dot(ea: np.ndarray, eb: np.ndarray) -> np.ndarray:
    """Row-wise dot with strict left-to-right float64 accumulation
    (np.cumsum is sequential by definition) — bit-identical to the
    expression tier and DuckDB."""
    prod = ea.astype(np.float64) * eb.astype(np.float64)
    return np.cumsum(prod, axis=1)[:, -1]


def _blocked_pairs(df: DataFrame, id_col: str, n_blocks: int) -> DataFrame:
    """Replicate rows onto the B(B+1)/2 block-pair groups.

    Row with block r joins group (bp, bq) as side 'a' when r == bp and
    side 'b' when r == bq; bp <= bq covers each unordered block pair
    once. groupBy("bp", "bq") then sees both sides of one block pair.
    """
    from mini_sql_engine_spark.functions.frames import jvm_rows

    spark = df.sparkSession
    pairs = jvm_rows(
        spark,
        [(p, q) for p in range(n_blocks) for q in range(p, n_blocks)],
        "bp int, bq int",
    )
    blocked = df.withColumn("blk", (F.col(id_col) % n_blocks).cast("int"))
    side_a = blocked.join(F.broadcast(pairs), F.col("blk") == F.col("bp")).withColumn(
        "side", F.lit("a")
    )
    side_b = blocked.join(F.broadcast(pairs), F.col("blk") == F.col("bq")).withColumn(
        "side", F.lit("b")
    )
    return side_a.unionByName(side_b)


def allpairs_cosine(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    n_blocks: int = 8,
    round_digits: int = 4,
) -> DataFrame:
    """All unordered pairs (id_a < id_b) with round(dot, d) >= threshold.

    Output schema: id_a long, id_b long, cos_sim double.
    """

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": [], "id_b": [], "cos_sim": []}).astype(
            {"id_a": "int64", "id_b": "int64", "cos_sim": "float64"}
        )
        a = pdf[pdf["side"] == "a"]
        b = pdf[pdf["side"] == "b"]
        if a.empty or b.empty:
            return empty
        same_block = pdf["bp"].iat[0] == pdf["bq"].iat[0]
        ma = np.stack(a[vec_col].to_numpy()).astype(np.float64)
        mb = np.stack(b[vec_col].to_numpy()).astype(np.float64)
        ids_a = a[id_col].to_numpy()
        ids_b = b[id_col].to_numpy()
        scores = ma @ mb.T
        # margin must cover BOTH matmul reorder drift (1e-9) and the
        # final rounding step: a raw score half a rounding unit below
        # the threshold still rounds UP to it and must not be pruned
        mask = scores >= threshold - (0.5 * 10.0**-round_digits + 1e-9)
        if same_block:
            # same set on both sides: upper triangle covers each pair once
            mask &= ids_a[:, None] < ids_b[None, :]
        ia, ib = np.nonzero(mask)
        if ia.size == 0:
            return empty
        exact = np.round(_seq_dot(ma[ia], mb[ib]), round_digits)
        keep = exact >= threshold
        ka, kb = ids_a[ia][keep], ids_b[ib][keep]
        return pd.DataFrame(
            {
                # cross-block pairs arrive in block order; normalize to id order
                "id_a": np.minimum(ka, kb),
                "id_b": np.maximum(ka, kb),
                "cos_sim": exact[keep],
            }
        )

    return _blocked_pairs(df.select(id_col, vec_col), id_col, n_blocks).groupBy(
        "bp", "bq"
    ).applyInPandas(score, "id_a long, id_b long, cos_sim double")


def allpairs_dot_ge(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    n_blocks: int = 8,
) -> DataFrame:
    """All unordered pairs (id_a < id_b) whose RAW left-to-right dot
    clears ``threshold`` — no rounding step, so membership equals a
    DuckDB ``list_dot_product(...) >= t`` predicate bit for bit.

    Same blocked matmul as :func:`allpairs_cosine`: the BLAS product
    is only a prefilter (kept with a 1e-9 reorder margin); every
    surviving candidate is re-scored with the sequential
    :func:`_seq_dot` the oracle's accumulation order matches, and the
    final keep uses that exact value. Work is n²/B(B+1)/2 per task —
    parallel across block pairs, never a single-task nested loop."""

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": [], "id_b": []}).astype(
            {"id_a": "int64", "id_b": "int64"}
        )
        a = pdf[pdf["side"] == "a"]
        b = pdf[pdf["side"] == "b"]
        if a.empty or b.empty:
            return empty
        same_block = pdf["bp"].iat[0] == pdf["bq"].iat[0]
        ma = np.stack(a[vec_col].to_numpy()).astype(np.float64)
        mb = np.stack(b[vec_col].to_numpy()).astype(np.float64)
        ids_a = a[id_col].to_numpy()
        ids_b = b[id_col].to_numpy()
        scores = ma @ mb.T
        mask = scores >= threshold - 1e-9  # matmul reorder drift only
        if same_block:
            mask &= ids_a[:, None] < ids_b[None, :]
        ia, ib = np.nonzero(mask)
        if ia.size == 0:
            return empty
        exact = _seq_dot(ma[ia], mb[ib])
        keep = exact >= threshold
        ka, kb = ids_a[ia][keep], ids_b[ib][keep]
        return pd.DataFrame(
            {
                "id_a": np.minimum(ka, kb),
                "id_b": np.maximum(ka, kb),
            }
        )

    return _blocked_pairs(df.select(id_col, vec_col), id_col, n_blocks).groupBy(
        "bp", "bq"
    ).applyInPandas(score, "id_a long, id_b long")


def blocked_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    n_blocks: int = 8,
    round_digits: int = 4,
) -> DataFrame:
    """Per-node DIRECTED top-k cosine candidates via partial top-k
    merge: each of the B(B+1)/2 block-pair tasks emits at most k
    candidates per node per direction, so the shuffle after the matmul
    carries O(n·B·k) thin rows instead of the O(n²) full pair list —
    the standard two-phase top-k. The caller finishes with one global
    window `row_number() <= k` per src (total order: rounded score
    desc, dst asc), and partial-top-k-under-a-total-order guarantees
    the merge is exact.

    Candidate preselection inside a task uses the raw matmul scores
    with a 1.5·10^-round_digits margin below each row's kth raw score:
    that covers the full width of one rounding class plus accumulation
    drift, so every dst that could enter the block's top-k after exact
    re-accumulation + rounding + dst tie-break is retained. Survivors
    are re-accumulated sequentially (`_seq_dot`), rounded, and ranked
    per src before emission.

    Output schema: src long, dst long, cos_sim double.
    """
    margin = 1.5 * 10.0**-round_digits

    def _directed(ms, ids_s, md, ids_d, mask_self):
        scores = ms @ md.T
        if mask_self:
            scores[ids_s[:, None] == ids_d[None, :]] = -np.inf
        if scores.shape[1] > k:
            kth = np.partition(scores, -k, axis=1)[:, -k]
        else:
            kth = np.full(scores.shape[0], -np.inf)
        mask = scores >= (kth[:, None] - margin)
        if mask_self:
            mask &= ids_s[:, None] != ids_d[None, :]
        ia, ib = np.nonzero(mask)
        if ia.size == 0:
            return None
        exact = np.round(_seq_dot(ms[ia], md[ib]), round_digits)
        cand = pd.DataFrame(
            {"src": ids_s[ia], "dst": ids_d[ib], "cos_sim": exact}
        ).sort_values(
            ["src", "cos_sim", "dst"], ascending=[True, False, True]
        )
        return cand[cand.groupby("src").cumcount() < k]

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"src": [], "dst": [], "cos_sim": []}).astype(
            {"src": "int64", "dst": "int64", "cos_sim": "float64"}
        )
        a = pdf[pdf["side"] == "a"]
        b = pdf[pdf["side"] == "b"]
        if a.empty or b.empty:
            return empty
        same_block = pdf["bp"].iat[0] == pdf["bq"].iat[0]
        ma = np.stack(a[vec_col].to_numpy()).astype(np.float64)
        mb = np.stack(b[vec_col].to_numpy()).astype(np.float64)
        ids_a = a[id_col].to_numpy()
        ids_b = b[id_col].to_numpy()
        parts = [_directed(ma, ids_a, mb, ids_b, same_block)]
        if not same_block:  # same sides ⇒ b→a duplicates a→b
            parts.append(_directed(mb, ids_b, ma, ids_a, False))
        parts = [p for p in parts if p is not None]
        return pd.concat(parts) if parts else empty

    return _blocked_pairs(df.select(id_col, vec_col), id_col, n_blocks).groupBy(
        "bp", "bq"
    ).applyInPandas(score, "src long, dst long, cos_sim double")


def allpairs_grouped_sums(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    group_cols: Iterable[str],
    n_blocks: int = 8,
) -> DataFrame:
    """Partial (sum, count) of pairwise dot products per unordered
    group-label pair — the map-side-combine form of "mean pairwise
    similarity by class". Finish with groupBy(ga..., gb...).sum().

    Output: ga_<c>/gb_<c> per group col (lexicographically ordered
    label pair), part_sum double, part_n long.
    """
    group_cols = list(group_cols)

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        a = pdf[pdf["side"] == "a"]
        b = pdf[pdf["side"] == "b"]
        cols: dict[str, list] = {
            **{f"ga_{c}": [] for c in group_cols},
            **{f"gb_{c}": [] for c in group_cols},
            "part_sum": [],
            "part_n": [],
        }
        if a.empty or b.empty:
            return pd.DataFrame(cols).astype({"part_sum": "float64", "part_n": "int64"})
        ma = np.stack(a[vec_col].to_numpy()).astype(np.float64)
        mb = np.stack(b[vec_col].to_numpy()).astype(np.float64)
        ids_a = a[id_col].to_numpy()
        ids_b = b[id_col].to_numpy()
        scores = ma @ mb.T
        if pdf["bp"].iat[0] == pdf["bq"].iat[0]:
            ia, ib = np.nonzero(ids_a[:, None] < ids_b[None, :])
        else:  # distinct blocks: every cross pair counts exactly once
            ia, ib = np.nonzero(np.ones_like(scores, dtype=bool))
        if ia.size == 0:
            return pd.DataFrame(cols)
        out = pd.DataFrame({"part_sum": scores[ia, ib]})
        for c in group_cols:
            la = a[c].to_numpy()[ia]
            lb = b[c].to_numpy()[ib]
            lo = np.minimum(la, lb)
            hi = np.maximum(la, lb)
            out[f"ga_{c}"] = lo
            out[f"gb_{c}"] = hi
        agg = (
            out.groupby([f"ga_{c}" for c in group_cols] + [f"gb_{c}" for c in group_cols])
            .agg(part_sum=("part_sum", "sum"), part_n=("part_sum", "size"))
            .reset_index()
        )
        return agg

    dtypes = dict(df.dtypes)
    schema_parts = [f"ga_{c} {dtypes[c]}, gb_{c} {dtypes[c]}" for c in group_cols]
    schema = ", ".join(schema_parts + ["part_sum double", "part_n long"])
    return _blocked_pairs(df.select(id_col, vec_col, *group_cols), id_col, n_blocks).groupBy(
        "bp", "bq"
    ).applyInPandas(score, schema)
