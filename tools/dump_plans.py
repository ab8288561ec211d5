"""Generate PLANS.md: formatted physical plans of the marquee queries.

Run from anywhere:  python tools/dump_plans.py [sf_dir]

The annotations state what each plan must show to survive a 100 TB
scale-up; tests/test_plans.py asserts the load-bearing ones.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MARQUEE = [
    ("flagship", "join + filter + agg: filters pushed to the parquet scan, "
     "broadcast for the smaller side, single partial-aggregated shuffle"),
    ("tpch_q1", "scan → partial agg → 4-group exchange: shuffle volume is "
     "groups × partitions, independent of fact size"),
    ("tpch_q4", "EXISTS stays a LeftSemi with the correlated non-equi term "
     "as residual; lineitem scan pruned to 2 columns"),
    ("tpch_q5", "5-way star join: dims broadcast, fact never re-shuffled "
     "between joins"),
    ("tpch_q18", "HAVING subquery = the only full-fact shuffle (thin "
     "orderkey/qty aggregate); survivors drive broadcast joins"),
    ("ext_topk_per_group", "window top-k: one hash exchange + in-partition "
     "sort, rank filter pushed into the window operator"),
    ("ext_dedup_minhash_lsh", "band join: shuffle carries (band, doc) keys "
     "only, never shingle arrays"),
    ("ext_sim_bruteforce_topk", "query side broadcast; per-partition "
     "score+rank, no all-pairs shuffle"),
    ("pipeline_curate_corpus", "5-stage curation composed into one plan: "
     "each stage's filter shrinks the next stage's shuffle"),
    ("tpch_q21", "EXISTS/NOT EXISTS pair = semi + anti self-joins reusing "
     "ONE l_orderkey exchange (lazy-checkpointed lateness relation)"),
    ("ext_partitioned_pruned_join", "dynamicpruning subquery: only the "
     "matching year partitions of the fact are read, decided at runtime"),
    ("ext_trailing_time_window", "RANGE frame on integer microseconds: one "
     "hash exchange + in-partition sort, frame bounded by the time axis"),
    ("ext_dedup_prefix_filter", "exact similarity join via prefix filter: "
     "df attach and both verify joins are broadcasts — shingle arrays "
     "never shuffle; only (shingle, doc) prefix pairs ride the self-join"),
    ("ext_quantile_mergeable", "histogram partials merge map-side; the "
     "cumulative window runs over the merged histogram, never raw rows"),
    ("ext_boilerplate_ngrams", "hot-gram set (df >= BOILER_DF) broadcasts "
     "back to the exploded corpus; grams shuffle once for the df count, "
     "never again"),
    ("ext_key_skew", "per-key counts partial-aggregate before their "
     "shuffle; only scalar roll-ups reach the union"),
    ("ext_dedup_embedding", "LSH-banded near-dup: one exchange on the "
     "(band, bval) bucket key into a per-bucket matmul-prune + "
     "sequential-exact Arrow kernel; pair dedup runs post-verify"),
    ("ext_lm_perplexity", "unigram-LM scoring: token counts partial-"
     "aggregate before one vocab-keyed shuffle; the (n, v) scalars "
     "broadcast; the tercile window sorts thin (doc_id, nll) rows only"),
    ("ext_dup_spans", "duplicate spans: hot-gram set broadcasts as an "
     "anti-join; the positional-gram self-join ships thin (doc, pos) "
     "rows; runs recovered by one window per (pair, diagonal)"),
    ("ext_knn_graph", "mutual k-NN: block tasks emit <= k candidates per "
     "node per direction, so the post-matmul exchange is O(n*B*k) rows; "
     "the merge window and the two joins run on candidate lists only"),
    ("ext_bloom_pruned_join", "runtime bloom filter: bloom_filter_agg "
     "subquery from the filtered dim; might_contain probe on the fact "
     "scan drops rows before the join exchange"),
    ("pipeline_quality_mix", "4-stage funnel in one plan: gate "
     "projection, dup-span anti join, median-NLL screen (scalar "
     "broadcast), per-domain quota window; filters shrink each stage"),
    ("ext_fuzzy_vocab_join", "SymSpell linkage: deletion variants "
     "equi-join on the variant key — no cartesian/nested-loop pass; "
     "levenshtein verifies only collided candidates"),
    ("ext_cms_frequency", "count-min sketch: d*w cell grid aggregates "
     "map-side and BROADCASTS to the probe side — the corpus never "
     "shuffles for the estimate join"),
    ("ext_zorder_clustering", "Morton interleave is pure bit arithmetic "
     "in codegen; blocking windows over thin (qn, pn, key) rows; range "
     "widths aggregate map-side per block"),
    ("ext_pq_ann_recall", "PQ ADC: codebook and per-query lookup tables "
     "broadcast; the scoring join touches only (vec, m, code) rows — "
     "4 small ints per corpus vector, never the vectors"),
    ("ext_data_contract", "contract checks: FK probes are LeftAnti joins "
     "on key columns; every other check is a map-side-combinable "
     "conditional aggregate into a 1-row exchange"),
    ("ext_incremental_agg", "IVM: change rows aggregate to per-key "
     "deltas map-side; ONE keyed full-outer join merges them into the "
     "maintained view — per-batch cost is delta-sized"),
    ("ext_pagerank_types", "integer-ppm power iterations: the corpus "
     "cost is the edge window; iterations join type-cardinality "
     "tables with the rank table broadcast"),
    ("ext_basket_pairs", "market-basket pairs: per-order bounded self-"
     "join; item counts and the 1-row order total broadcast onto the "
     "pair table — only (pair, count) partials ride the wide shuffle"),
    ("ext_kcore_graph", "k-core peel: per-round degree partial-agg + "
     "two semi-joins keyed on node id over the edges-sized table; "
     "localCheckpoint keeps each round's plan flat"),
    ("ext_pareto_frontier", "skyline: DISTINCT pair collapse map-side, "
     "then one range-partitioned sort + running max over the "
     "pairs-sized table — never a quadratic dominance join"),
    ("ext_mmr_rerank", "two-stage retrieval: the corpus scoring scan is "
     "the ONLY distributed cost; the greedy loop runs over the "
     "checkpointed constant-size pool with broadcast step joins"),
    ("ext_knn_shapley", "data valuation at sort cost: one exchange on "
     "the test key, then two window passes (rank, reverse cumulative) "
     "over each ranked partition — no extra shuffle"),
    ("ext_facility_location", "submodular greedy: pool broadcast against "
     "the corpus once; each step is one join + |pool|-row integer "
     "aggregate with the coverage vector checkpointed"),
    ("ext_wasserstein_distance", "W1 on the distinct-cents ladder: one "
     "map-side-combined rollup, one cumulative window over the ladder "
     "(<< rows), totals derived from the same checkpointed rollup"),
    ("ext_double_ml_plm", "cross-fitted DML: joinless — one user rollup "
     "feeds a moments aggregate and a residual-product aggregate; "
     "per-row residuals use literal out-of-fold coefficients"),
    ("ext_spearman_signals", "rank without a row sort: value HISTOGRAMS "
     "take the (single-partition, histogram-sized) cumulative windows; "
     "doubled ranks broadcast back — the corpus side pays broadcast "
     "joins + one moments aggregate, never a row-level window"),
    ("ext_winnowing_fingerprints", "window-min selection is per-doc "
     "(partitionBy doc_id — partition-local after the scan); the only "
     "corpus-wide shuffles carry the winnowed sketch's thin "
     "(doc, key) pairs"),
    ("ext_isotonic_calibration", "PAV via the minimax identity: the "
     "corpus collapses to the checkpointed score ladder in one "
     "rollup; the O(L^3) triple join never touches corpus rows"),
    ("ext_aipw_ate", "doubly-robust ATE: level propensities and the "
     "1-row moment aggregate broadcast; the influence-function "
     "reduce is one map-side-combinable aggregate — no corpus-side "
     "shuffle joins"),
    ("ext_kendall_tau", "concordance from the joint value histogram: "
     "one map-side-combinable aggregate per signal pair; the "
     "triangular cell-pair join is a BroadcastNestedLoop on the "
     "metadata-sized histogram — the corpus never sorts or re-shuffles"),
    ("ext_mmd_drift", "linear-time kernel MMD: 4-way join on the thin "
     "quad key (one scan, exchange reused), h quantized to longs, one "
     "partial+final aggregate — O(n) where the U-statistic is O(n²)"),
    ("ext_equidepth_histogram", "exact percentile boundaries WITHOUT "
     "the percentile aggregate: value-distribution rollup (map-side "
     "combined) + cumulative window over the DISTINCT-cents ladder "
     "(documented single-partition, ladder-sized not data-sized) + an "
     "18-row rank lookup; at real scale swap the exact ladder for "
     "percentile_approx's mergeable t-digest, assignment unchanged"),
    ("ext_capture_recapture", "composition cost by design: consumes "
     "THREE verified pair tables (exact Jaccard, MinHash-LSH route, "
     "SimHash route) then five 1-row counts over semi-joins on thin "
     "keys — the estimator itself adds nothing data-sized"),
    ("ext_stats_by_group", "fixed-point moments: one map-side-combined "
     "aggregate of exact DECIMAL(38,0) cent sums (s, ss) per segment; "
     "avg/stddev/variance are derived scalars — no streaming float "
     "moment whose partial-merge order could vary between runs"),
    ("ext_corr_covar", "Pearson corr + covar from five exact DECIMAL "
     "moment sums in ONE aggregate pass over lineitem — same single-"
     "shuffle shape as a plain groupBy despite the richer statistics"),
    ("ext_ml_brp_pairs", "recall certificate: the pyspark.ml BRP-LSH "
     "candidate join (bucketed, exact-rescored) semi-joined against "
     "the blocked-matmul exhaustive truth; output is two 1-row counts "
     "crossJoined as broadcast scalars — nothing data-sized leaves "
     "the executors"),
    ("ext_mm_jpeg_decode", "baseline JPEG from the T.81 spec: a pure "
     "fused scan → Arrow synth → Arrow decode map — zero exchanges; "
     "at 100 TB of media the codec adds pipeline cost only, bounded "
     "by the Arrow batch size"),
    ("ext_coreset_kcenter", "greedy k-center: K narrow corpus passes — "
     "centers ride a broadcast 1-row struct array, min-distance is a "
     "JVM zip_with/aggregate expression, the argmax a TakeOrdered(1); "
     "literal seeds are LocalRelations, never Python-RDD scans"),
    ("ext_unigram_tokenize", "unigram lattice tokenization: DP per "
     "DISTINCT word type in ONE Arrow kernel (state-carrying "
     "recursion per the codegen rule); the piece vocab broadcasts "
     "into the edge lattice; per-doc stats are one instances join"),
    ("ext_edit_distance_pairs", "FastSS blocking: the deletion-variant "
     "explode is the ONLY shuffle key; candidates ∝ near-dups, the "
     "exact levenshtein verify runs post-join — never n² pairs"),
    ("ext_grid_spatial_join", "grid-cell blocking: 9-cell stamping on "
     "one side only (constant fan-out), home-cell key on the other; "
     "the exact Chebyshev check is a post-join filter"),
    ("ext_yannakakis_reduction", "acyclic-chain semi-join sweep: the "
     "LeftSemi reducers run before the join phase so the joins "
     "shuffle only result-contributing rows — the rewrite Catalyst "
     "doesn't synthesize from the plain 3-way join"),
    ("ext_merkle_fingerprint", "16-ary hash ladder: each level is one "
     "map-side-combinable groupBy on a key that shrinks 16× — no "
     "wide rows, no collect; leaf hashing fused into the scan"),
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from mini_sql_engine_spark.operators import ALL_QUERIES
    from mini_sql_engine_spark.session import get_spark

    spark = get_spark()
    out = [
        "# PLANS — physical plans of the marquee queries",
        "",
        f"Generated by `python tools/dump_plans.py {sf_dir}` "
        "(regenerate after plan-affecting changes).",
        "Assertions for the load-bearing properties live in "
        "`tests/test_plans.py`.",
        "",
    ]
    for name, note in MARQUEE:
        df = ALL_QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        out += [f"## {name}", "", f"*{note}*", "", "```",
                buf.getvalue().rstrip(), "```", ""]
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"PLANS.md written ({len(MARQUEE)} plans, sf_dir={sf_dir})")


if __name__ == "__main__":
    main()
