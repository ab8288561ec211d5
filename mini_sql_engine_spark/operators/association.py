"""Association & blocking pack: market-basket pair mining and
sorted-neighborhood dedup blocking.

Two classic large-scale techniques the earlier packs don't cover:

- ``ext_basket_pairs``: market-basket association over lineitem —
  part pairs co-purchased in the same order, with support and lift in
  integer ppm. The A-priori-style pair enumeration is bounded by
  basket size (≤ ~13 distinct parts/order in this schema), so the
  self-join explodes per-order, never across orders.
- ``ext_dedup_sorted_neighborhood``: the Hernández–Stolfo
  sorted-neighborhood method — the SORT-based alternative to the
  hash-based LSH blockers in ``operators/dedup.py``. Docs are sorted
  by a content prefix key, candidate pairs are the docs within a
  fixed window of the sorted order, and candidates are verified with
  the same exact Jaccard the all-pairs oracle uses. Found pairs are
  by construction a subset of ``ext_dedup_jaccard``'s exact output —
  the oracle pins exactly which subset (the window's).

All outputs are integers or the shared round-6 Jaccard ratio (one
IEEE divide of exact integers, identical in both engines).

Scale notes (100 TB):
- basket_pairs: one shuffle on orderkey groups each basket; the pair
  explosion is per-basket quadratic but baskets are small and bounded
  — the canonical A-priori candidate shape. Item counts and the
  single-row order count are broadcast to the pair table, so the only
  wide shuffle carries (pair → count) partials, map-side combined.
- sorted_neighborhood: the global rank comes from ``range_prefix``
  (repartitionByRange on the key + per-partition row_number + pid
  offsets) — the standard distributed-SN construction, no global
  single-task window; the W-row boundary overlap rides on the rank
  sequence join, which crosses partition boundaries by key. Candidate
  pairs are W per doc — linear in corpus size, vs the inverted-index
  join's posting-list quadratic worst case. Verification joins the
  shingle arrays onto the thin candidate set only.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from mini_sql_engine_spark.catalog import load_table
from mini_sql_engine_spark.functions.ranking import ntile_expr, range_prefix
from mini_sql_engine_spark.operators.dedup import (
    _JACCARD_PAIRS,
    _MINHASH_ORACLE,
    _shingled,
    JACCARD_T,
)

MIN_SUP = 2  # minimum co-occurrence count for a reported pair
SN_KEY_TOKENS = 3  # prefix tokens forming the sorted-neighborhood key
SN_WINDOW = 5  # candidate window width in the sorted order


def basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-purchased part pairs with support and lift in integer ppm.

    support_ppm = floor(pair_orders * 1e6 / n_orders); lift_ppm =
    floor(pair_orders * n_orders * 1e6 / (orders_a * orders_b)) — all
    numerators exact integer-valued doubles < 2^53, one IEEE divide
    each."""
    baskets = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    item_cnt = baskets.groupBy(F.col("l_partkey").alias("part")).agg(
        F.count(F.lit(1)).alias("item_orders")
    )
    n_orders = baskets.agg(
        F.countDistinct("l_orderkey").alias("n_orders")
    )
    a, b = baskets.alias("a"), baskets.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("pair_orders"))
        .filter(F.col("pair_orders") >= MIN_SUP)
    )
    ca = item_cnt.select(
        F.col("part").alias("part_a"), F.col("item_orders").alias("orders_a")
    )
    cb = item_cnt.select(
        F.col("part").alias("part_b"), F.col("item_orders").alias("orders_b")
    )
    return (
        pairs.join(F.broadcast(ca), "part_a")
        .join(F.broadcast(cb), "part_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            "pair_orders",
            F.floor(F.col("pair_orders") * 1_000_000 / F.col("n_orders"))
            .cast("long")
            .alias("support_ppm"),
            F.floor(
                F.col("pair_orders")
                * F.col("n_orders")
                * 1_000_000
                / (F.col("orders_a") * F.col("orders_b"))
            )
            .cast("long")
            .alias("lift_ppm"),
        )
    )


def _sn_key(text_col: str) -> F.Column:
    """First SN_KEY_TOKENS tokens of the lower/trimmed text — near-dup
    docs share prefixes, so they land adjacent in the sorted order.
    Documents are single-space word streams (TESTDATA.md), so a plain
    space split matches DuckDB's string_split exactly."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), " ")
    return F.concat_ws(" ", F.slice(toks, 1, SN_KEY_TOKENS))


def sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood blocking: rank docs by prefix key, pair each
    doc with the next SN_WINDOW docs in rank order, verify candidates
    with exact Jaccard >= JACCARD_T on the shared shingle sets."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # global rank over the prefix key via range_prefix — the sorted
    # order the method needs, WITHOUT a single-partition sort (this is
    # the repartitionByRange + boundary-window shape the docstring
    # promises at cluster scale; the W-row overlap rides on the rank
    # sequence join below, which crosses partition boundaries by key)
    ranked = range_prefix(
        docs.withColumn("_key", _sn_key("text")), ["_key", "doc_id"]
    ).select("doc_id", F.col("rnk").cast("int").alias("rnk"))
    partner = ranked.select(
        F.col("doc_id").alias("id_lo"),
        F.explode(
            F.sequence(F.col("rnk") + 1, F.col("rnk") + SN_WINDOW)
        ).alias("rnk"),
    )
    cand = partner.join(ranked, "rnk").select(
        F.least("id_lo", "doc_id").alias("doc_a"),
        F.greatest("id_lo", "doc_id").alias("doc_b"),
    )
    sh = _shingled(spark, sf_dir)
    sa = sh.select(
        F.col("doc_id").alias("doc_a"),
        F.col("sh").alias("sh_a"),
        F.size("sh").alias("na"),
    )
    sb = sh.select(
        F.col("doc_id").alias("doc_b"),
        F.col("sh").alias("sh_b"),
        F.size("sh").alias("nb"),
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(inter / (F.col("na") + F.col("nb") - inter), 6).alias(
                "jacc"
            ),
        )
        .filter(F.col("jacc") >= JACCARD_T)
    )


TOP_PAIRS_K = 20  # global ranked near-dup report size


def dedup_top_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-K most-similar doc pairs — the threshold-less ranked
    near-dup report (what a curator eyeballs before picking JACCARD_T).
    Candidates come from the shared inverted-index join; the global
    top-K is a sort-limit (TakeOrdered — per-partition partial top-K,
    then a K-row driver merge, never a full global sort). Determinism:
    ties on the round-6 jacc break by (doc_a, doc_b)."""
    from mini_sql_engine_spark.operators.dedup import _jaccard_pairs

    return (
        _jaccard_pairs(spark, sf_dir)
        .select("doc_a", "doc_b", "jacc")
        .orderBy(F.col("jacc").desc(), "doc_a", "doc_b")
        .limit(TOP_PAIRS_K)
    )


def blocker_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocker benchmark: recall of each candidate-generation strategy
    against the exact-Jaccard ground truth at the shared threshold.

    Every blocker here verifies candidates with the exact Jaccard, so
    found ⊆ true and precision is 1 by construction — the report still
    computes matched via a semi-join rather than assuming it, so a
    blocker that ever emitted a non-true pair would surface as
    matched < found. This is the decision table a curator reads before
    picking a blocking strategy for a corpus: LSH trades a recall loss
    for hash-bucket locality, sorted-neighborhood for sort locality.

    Scale: each method's pair table is the (small) output of its own
    blocking pass; all aggregates are single-row and meet in broadcast
    cross joins — nothing data-sized moves."""
    from mini_sql_engine_spark.operators.dedup import (
        jaccard_dedup,
        minhash_lsh_dedup,
    )

    exact = (
        jaccard_dedup(spark, sf_dir).select("doc_a", "doc_b").localCheckpoint()
    )
    true_cnt = exact.agg(F.count(F.lit(1)).alias("true_pairs"))
    # each method table is consumed twice (count + semi-join) — one
    # localCheckpoint avoids re-running the whole blocking pass per
    # consumer (the SN global-rank window in particular)
    methods: list[tuple[str, DataFrame]] = [
        ("exact_inverted_index", exact),
        (
            "minhash_lsh",
            minhash_lsh_dedup(spark, sf_dir)
            .select("doc_a", "doc_b")
            .localCheckpoint(),
        ),
        (
            "sorted_neighborhood",
            sorted_neighborhood(spark, sf_dir)
            .select("doc_a", "doc_b")
            .localCheckpoint(),
        ),
    ]
    out: DataFrame | None = None
    for name, df in methods:
        found = df.agg(F.count(F.lit(1)).alias("found_pairs"))
        matched = df.join(exact, ["doc_a", "doc_b"], "left_semi").agg(
            F.count(F.lit(1)).alias("matched_pairs")
        )
        row = (
            found.crossJoin(F.broadcast(matched))
            .crossJoin(F.broadcast(true_cnt))
            .select(
                F.lit(name).alias("method"),
                "found_pairs",
                "true_pairs",
                "matched_pairs",
                F.floor(F.col("matched_pairs") * 1_000_000 / F.col("true_pairs"))
                .cast("long")
                .alias("recall_ppm"),
            )
        )
        out = row if out is None else out.unionByName(row)
    assert out is not None
    return out


def quality_dup_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-signal curation diagnostic: near-duplicate incidence per
    quality decile. Joins the per-doc heuristic quality score (deciled
    by ntile over (quality, doc_id) — deterministic total order) with
    membership in the exact-Jaccard near-dup pair set, and reports the
    dup rate per decile in integer ppm. If low-quality deciles
    duplicate more (they usually do — boilerplate is both low-quality
    and repetitive), quality filtering EARLY shrinks the dedup join's
    candidate volume — this report is the evidence for that pipeline
    ordering decision.

    Scale: the quality projection is a pure scan-side expression; the
    decile is an exact ntile replay (ntile_expr) on a range-partitioned
    global rank (range_prefix) — docs-sized but never one task; dup
    membership is a semi-join against the near-dup pair output, which
    is orders of magnitude below corpus size."""
    from mini_sql_engine_spark.operators.dedup import jaccard_dedup
    from mini_sql_engine_spark.operators.text import quality

    q = quality(spark, sf_dir).select("doc_id", "quality")
    deciled = range_prefix(
        q, ["quality", "doc_id"], total_rows_col="_n"
    ).withColumn("decile", ntile_expr("rnk", "_n", 10).cast("long"))
    pairs = jaccard_dedup(spark, sf_dir)
    dup_docs = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .union(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    flagged = deciled.join(
        dup_docs.withColumn("is_dup", F.lit(1)), "doc_id", "left"
    )
    return flagged.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.coalesce("is_dup", F.lit(0)).cast("long")).alias("n_dup"),
        F.floor(
            F.sum(F.coalesce("is_dup", F.lit(0)).cast("long"))
            * 1_000_000
            / F.count(F.lit(1))
        )
        .cast("long")
        .alias("dup_ppm"),
    )


PREFIX_FAM_K = 10  # tokens in the shared-prefix fingerprint


def prefix_families(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact shared-prefix duplicate families: docs whose first
    PREFIX_FAM_K normalized tokens are identical. The truncated-crawl
    signal — re-fetched pages and boilerplate-headed docs share exact
    prefixes long before their token SETS look similar, so this
    catches a family the Jaccard blockers see only weakly. One
    map-side-combinable groupBy on a fingerprint string; families of
    size 1 are dropped."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), " ")
    fp = F.concat_ws(" ", F.slice(toks, 1, PREFIX_FAM_K))
    return (
        docs.select("doc_id", fp.alias("prefix"))
        .groupBy("prefix")
        .agg(
            F.count(F.lit(1)).alias("family_size"),
            F.min("doc_id").alias("keep_id"),
        )
        .filter(F.col("family_size") > 1)
    )


def minhash_estimator_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash estimator-quality report: for every true near-dup pair,
    the K-component signature's Jaccard ESTIMATE (matching components
    / K) against the exact Jaccard, both in integer ppm, plus the
    signed error. The in-engine evidence for sizing MINHASH_K: if the
    error column is too wide, K is too small for the threshold in
    use. Exactness: est_ppm = floor(matches·1e6/K) and jacc_ppm =
    floor(inter·1e6/union) are both integer ratios — no float
    round-trip anywhere."""
    from mini_sql_engine_spark.functions.hashing import minhash_signature
    from mini_sql_engine_spark.operators.dedup import (
        MINHASH_K,
        _shingled,
        jaccard_dedup,
    )

    pairs = jaccard_dedup(spark, sf_dir).select("doc_a", "doc_b")
    sh = _shingled(spark, sf_dir)
    # Round 10 (guide §2.3): signatures only exist for docs that occur
    # in a true pair — restrict FIRST, so the K-hash-per-shingle
    # signature expression runs over the pair members (a small
    # fraction of the corpus), and checkpoint so the a/b self-join
    # sides don't each recompute it.
    members = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .union(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    sig = (
        sh.join(F.broadcast(members), "doc_id", "left_semi")
        .withColumn("sig", minhash_signature(F.col("sh"), MINHASH_K))
        .localCheckpoint(eager=False)
    )
    a = sig.select(
        F.col("doc_id").alias("doc_a"),
        F.col("sh").alias("sh_a"),
        F.col("sig").alias("sig_a"),
    )
    b = sig.select(
        F.col("doc_id").alias("doc_b"),
        F.col("sh").alias("sh_b"),
        F.col("sig").alias("sig_b"),
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    matches = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
            lambda eq: eq,
        )
    )
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.floor(inter * 1_000_000 / union).cast("long").alias("jacc_ppm"),
            F.floor(matches * 1_000_000 / F.lit(MINHASH_K))
            .cast("long")
            .alias("est_ppm"),
            (
                F.floor(matches * 1_000_000 / F.lit(MINHASH_K)).cast("long")
                - F.floor(inter * 1_000_000 / union).cast("long")
            ).alias("err_ppm"),
        )
    )


def basket_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-priori level-3: frequent co-purchased part TRIPLES, mined
    with the downward-closure pruning that makes itemset mining
    tractable — a triple can only be frequent if all three of its
    sub-pairs are, so the 3-way self-join runs on the (tiny)
    frequent-pair-restricted candidate set instead of all baskets³.
    The oracle is the NAIVE unpruned 3-way join with the same HAVING
    — every green run is a proof the pruning is lossless.

    Scale notes (100 TB): the frequent-pair table is support-pruned
    (power-law tails die at MIN_SUP) and broadcasts into the
    candidate joins; the basket table joins only on orderkey with
    per-basket bounded pair fan-out. Each A-priori level shrinks the
    candidate space multiplicatively — the reason level-wise mining
    beats direct enumeration everywhere.
    """
    baskets = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .localCheckpoint()  # consumed by L2 and the candidate joins
    )
    a, b = baskets.alias("a"), baskets.alias("b")
    # ONE materialization of the per-basket pair stream serves both
    # the support count (fp) and the candidate stream (ab) — the
    # standard A-priori trade of storing the level-2 stream instead
    # of re-running the basket self-join per consumer (round-10: the
    # join ran twice)
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_orderkey").alias("o"),
            F.col("a.l_partkey").alias("pa"),
            F.col("b.l_partkey").alias("pb"),
        )
        .localCheckpoint()
    )
    fp = (
        pairs.groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= MIN_SUP)
        .select("pa", "pb")
        .localCheckpoint()  # closure-checked three times below
    )
    ab = pairs.join(F.broadcast(fp), ["pa", "pb"], "left_semi")
    c = baskets.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("pc")
    )
    tri = (
        ab.join(c, "o")
        .filter(F.col("pb") < F.col("pc"))
        .join(
            F.broadcast(
                fp.select(
                    F.col("pa"), F.col("pb").alias("pc")
                )
            ),
            ["pa", "pc"],
            "left_semi",
        )
        .join(
            F.broadcast(
                fp.select(
                    F.col("pa").alias("pb"), F.col("pb").alias("pc")
                )
            ),
            ["pb", "pc"],
            "left_semi",
        )
        .groupBy("pa", "pb", "pc")
        .agg(F.count(F.lit(1)).alias("tri_orders"))
        .filter(F.col("tri_orders") >= MIN_SUP)
    )
    n_orders = baskets.agg(
        F.countDistinct("l_orderkey").alias("n_orders")
    )
    return tri.crossJoin(F.broadcast(n_orders)).select(
        "pa",
        "pb",
        "pc",
        "tri_orders",
        F.floor(
            F.col("tri_orders").cast("double")
            * 1_000_000
            / F.col("n_orders")
        )
        .cast("long")
        .alias("support_ppm"),
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "ext_basket_triples": basket_triples,
    "ext_quality_dup_correlation": quality_dup_correlation,
    "ext_prefix_families": prefix_families,
    "ext_minhash_estimator_error": minhash_estimator_error,
    "ext_basket_pairs": basket_pairs,
    "ext_dedup_sorted_neighborhood": sorted_neighborhood,
    "ext_dedup_top_pairs": dedup_top_pairs,
    "ext_blocker_recall_report": blocker_recall_report,
}

_SN_PAIRS_SQL = f"""
    WITH keyed AS (
        SELECT doc_id,
               array_to_string(
                   (string_split(lower(trim(text)), ' '))
                       [1:{SN_KEY_TOKENS}], ' ') AS key
        FROM documents),
    ranked AS (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY key, doc_id) AS rnk
        FROM keyed),
    cand AS (
        SELECT LEAST(a.doc_id, b.doc_id) AS doc_a,
               GREATEST(a.doc_id, b.doc_id) AS doc_b
        FROM ranked a JOIN ranked b
          ON b.rnk - a.rnk BETWEEN 1 AND {SN_WINDOW}),
    jp AS ({_JACCARD_PAIRS})
    SELECT jp.doc_a, jp.doc_b, jp.jacc
    FROM jp JOIN cand
      ON jp.doc_a = cand.doc_a AND jp.doc_b = cand.doc_b
    WHERE jp.jacc >= {JACCARD_T}
"""


def _recall_row(label: str, rel: str) -> str:
    """One method row of the blocker recall report (matched computed
    via EXISTS against the exact set, never assumed)."""
    matched = f"""(SELECT COUNT(*) FROM {rel} e
                   WHERE EXISTS (SELECT 1 FROM exact x
                                 WHERE x.doc_a = e.doc_a
                                   AND x.doc_b = e.doc_b))"""
    return f"""
        SELECT '{label}' AS method,
               (SELECT COUNT(*) FROM {rel}) AS found_pairs,
               true_pairs,
               {matched} AS matched_pairs,
               CAST(floor({matched} * 1000000 / true_pairs) AS BIGINT)
                   AS recall_ppm
        FROM t"""


def _quality_dup_oracle() -> str:
    from mini_sql_engine_spark.operators.text import _STOPWORDS_SQL, _TOKS

    return f"""
        WITH m AS (
            SELECT doc_id,
                   ROUND(0.4 * least(len(text) / 200.0, 1.0)
                       + 0.3 * (1.0 - least(
                             (len(text) - len(regexp_replace(text,
                                  '[^A-Za-z0-9\\s]', '', 'g')))
                                 * 1.0 / greatest(len(text), 1) * 5, 1.0))
                       + 0.3 * least(
                             len(list_filter({_TOKS},
                                 t -> list_contains({_STOPWORDS_SQL}, t)))
                                 * 1.0 / greatest(len({_TOKS}), 1) * 4,
                             1.0), 6) AS quality
            FROM documents),
        deciled AS (
            SELECT doc_id,
                   CAST(ntile(10) OVER (ORDER BY quality, doc_id) AS BIGINT)
                       AS decile
            FROM m),
        dup_docs AS (
            SELECT DISTINCT doc_id FROM (
                SELECT doc_a AS doc_id FROM ({_JACCARD_PAIRS}) p
                WHERE jacc >= {JACCARD_T}
                UNION
                SELECT doc_b FROM ({_JACCARD_PAIRS}) p2
                WHERE jacc >= {JACCARD_T}))
        SELECT decile, COUNT(*) AS n_docs,
               CAST(SUM(CASE WHEN dup_docs.doc_id IS NOT NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
               CAST(floor(SUM(CASE WHEN dup_docs.doc_id IS NOT NULL
                                   THEN 1 ELSE 0 END) * 1000000
                          / COUNT(*)) AS BIGINT) AS dup_ppm
        FROM deciled LEFT JOIN dup_docs USING (doc_id)
        GROUP BY decile
    """


def _minhash_err_oracle() -> str:
    from mini_sql_engine_spark.operators.dedup import (
        _BASE,
        _SIG_EXPRS,
        MINHASH_K,
    )

    matches = " + ".join(
        f"(CASE WHEN a.s{j} = b.s{j} THEN 1 ELSE 0 END)"
        for j in range(MINHASH_K)
    )
    return f"""
        WITH mh_base AS MATERIALIZED ({_BASE}),
        sig AS MATERIALIZED (SELECT doc_id, sh, {_SIG_EXPRS} FROM mh_base),
        exact AS (SELECT doc_a, doc_b FROM ({_JACCARD_PAIRS}) p
                  WHERE jacc >= {JACCARD_T}),
        j AS (
            SELECT e.doc_a, e.doc_b,
                   len(list_intersect(a.sh, b.sh)) AS inter,
                   len(a.sh) + len(b.sh)
                       - len(list_intersect(a.sh, b.sh)) AS un,
                   {matches} AS matches
            FROM exact e
            JOIN sig a ON a.doc_id = e.doc_a
            JOIN sig b ON b.doc_id = e.doc_b)
        SELECT doc_a, doc_b,
               CAST(floor(inter * 1000000 / un) AS BIGINT) AS jacc_ppm,
               CAST(floor(matches * 1000000 / {MINHASH_K}) AS BIGINT)
                   AS est_ppm,
               CAST(floor(matches * 1000000 / {MINHASH_K}) AS BIGINT)
                   - CAST(floor(inter * 1000000 / un) AS BIGINT) AS err_ppm
        FROM j
    """


ORACLES: dict[str, str] = {
    "ext_basket_triples": f"""
        WITH b AS (SELECT DISTINCT l_orderkey, l_partkey
                   FROM lineitem),
        nn AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM b),
        tri AS (
            SELECT a.l_partkey AS pa, b2.l_partkey AS pb,
                   c.l_partkey AS pc, COUNT(*) AS tri_orders
            FROM b a
            JOIN b b2 ON a.l_orderkey = b2.l_orderkey
                     AND a.l_partkey < b2.l_partkey
            JOIN b c ON a.l_orderkey = c.l_orderkey
                     AND b2.l_partkey < c.l_partkey
            GROUP BY 1, 2, 3
            HAVING COUNT(*) >= {MIN_SUP})
        SELECT pa, pb, pc, tri_orders,
               CAST(FLOOR(CAST(tri_orders AS DOUBLE) * 1000000
                          / n_orders) AS BIGINT) AS support_ppm
        FROM tri CROSS JOIN nn
    """,
    "ext_minhash_estimator_error": _minhash_err_oracle(),
    "ext_prefix_families": f"""
        SELECT prefix, COUNT(*) AS family_size, MIN(doc_id) AS keep_id
        FROM (SELECT doc_id,
                     array_to_string(
                         (string_split(lower(trim(text)), ' '))
                             [1:{PREFIX_FAM_K}], ' ') AS prefix
              FROM documents)
        GROUP BY prefix HAVING COUNT(*) > 1
    """,
    "ext_quality_dup_correlation": _quality_dup_oracle(),
    "ext_basket_pairs": f"""
        WITH baskets AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        item_cnt AS (
            SELECT l_partkey AS part, COUNT(*) AS item_orders
            FROM baskets GROUP BY 1),
        tot AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM baskets),
        pairs AS (
            SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                   COUNT(*) AS pair_orders
            FROM baskets a JOIN baskets b
              ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2
            HAVING COUNT(*) >= {MIN_SUP})
        SELECT part_a, part_b, pair_orders,
               CAST(floor(pair_orders * 1000000 / n_orders) AS BIGINT)
                   AS support_ppm,
               CAST(floor(pair_orders * n_orders * 1000000
                          / (ca.item_orders * cb.item_orders)) AS BIGINT)
                   AS lift_ppm
        FROM pairs
        JOIN item_cnt ca ON ca.part = pairs.part_a
        JOIN item_cnt cb ON cb.part = pairs.part_b
        CROSS JOIN tot
    """,
    "ext_dedup_top_pairs": f"""
        SELECT doc_a, doc_b, jacc FROM ({_JACCARD_PAIRS}) p
        ORDER BY jacc DESC, doc_a, doc_b
        LIMIT {TOP_PAIRS_K}
    """,
    "ext_dedup_sorted_neighborhood": _SN_PAIRS_SQL,
    "ext_blocker_recall_report": f"""
        WITH exact AS MATERIALIZED (
            SELECT doc_a, doc_b FROM ({_JACCARD_PAIRS}) p
            WHERE jacc >= {JACCARD_T}),
        mh AS MATERIALIZED (
            SELECT doc_a, doc_b FROM ({_MINHASH_ORACLE}) m),
        sn AS MATERIALIZED (
            SELECT doc_a, doc_b FROM ({_SN_PAIRS_SQL}) s),
        t AS (SELECT COUNT(*) AS true_pairs FROM exact)
        {_recall_row("exact_inverted_index", "exact")}
        UNION ALL
        {_recall_row("minhash_lsh", "mh")}
        UNION ALL
        {_recall_row("sorted_neighborhood", "sn")}
    """,
}
