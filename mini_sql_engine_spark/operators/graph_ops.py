"""k-core decomposition of the near-duplicate graph.

``ext_kcore_graph`` peels the Jaccard near-dup graph (same edge set as
``ext_triangle_census`` / ``ext_dedup_clusters``) down to its K-core:
repeatedly drop nodes with degree < K until a fixpoint. The surviving
core is the "template family" heart of the duplicate structure — the
set a clique-collapse dedup policy should treat as one unit, and the
set where transitive over-merging is NOT a risk (every member is
multiply connected). Output: each core member with its within-core
degree.

Iterative pattern (same as ``dedup_clusters`` / ``contamination_hops``):
a driver loop over DataFrame ops, ``localCheckpoint`` per round to cut
lineage, and a METADATA-ONLY convergence check (a scalar node count —
never data collection). The oracle unrolls ``KCORE_MAX_PEEL`` peel
rounds as CTEs; peeling is monotone, so once Spark's loop reaches the
fixpoint every further unrolled round is a no-op and the two engines
agree exactly. A pytest pins observed rounds ≤ KCORE_MAX_PEEL - 2 at
driver scale so a testdata change that deepens peeling can't silently
outrun the oracle's unroll.

Scale notes (100 TB): the edge list is the near-dup pass's output —
orders of magnitude below corpus size. Each round is one degree
aggregation (map-side combinable) plus two semi-joins keyed on node
id; AQE handles hub-node skew. Rounds needed = peel depth, bounded by
graph degeneracy (shallow for near-dup graphs); distributed k-core at
scale is exactly this loop with the edge table bucketed on src so
per-round joins never reshuffle the static side.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from mini_sql_engine_spark.operators.dedup import (
    _JACCARD_PAIRS,
    ITERATION_COUNTS,
    JACCARD_T,
    jaccard_dedup,
)

KCORE_K = 2  # minimum within-core degree
KCORE_MAX_PEEL = 8  # oracle unroll depth; Spark asserts convergence first


def kcore_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peel to the KCORE_K-core; return (doc_id, core_degree)."""
    pairs = jaccard_dedup(spark, sf_dir).select("doc_a", "doc_b")
    edges = (
        pairs.selectExpr("doc_a AS src", "doc_b AS dst")
        .union(pairs.selectExpr("doc_b AS src", "doc_a AS dst"))
        .localCheckpoint()
    )
    prev_nodes = None
    for rounds in range(1, KCORE_MAX_PEEL + 1):
        deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        keep = deg.filter(F.col("deg") >= KCORE_K).select("src")
        edges = (
            edges.join(keep, "src", "left_semi")
            .join(keep.selectExpr("src AS dst"), "dst", "left_semi")
            .localCheckpoint()
        )
        # node count is monotonically non-increasing; unchanged ⇒ no
        # node fell below K this round ⇒ fixpoint (scalar-only check)
        cur_nodes = edges.select("src").distinct().count()
        if cur_nodes == prev_nodes:
            ITERATION_COUNTS["kcore_graph"] = rounds
            break
        prev_nodes = cur_nodes
    else:
        raise RuntimeError(
            f"k-core peel not converged in {KCORE_MAX_PEEL} rounds"
        )
    return edges.groupBy(F.col("src").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("core_degree")
    )


def cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster size histogram: how many components of each
    size the near-dup graph contains (size 1 = unique docs). THE
    one-glance dedup summary — a heavy tail of big clusters means
    template families and argues for clique-collapse; all-pairs-sized
    clusters mean chains. Composition of ``dedup_clusters``; two
    map-side-combinable aggregations over the docs-sized label table."""
    from mini_sql_engine_spark.operators.dedup import dedup_clusters

    return (
        dedup_clusters(spark, sf_dir)
        .groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("cluster_size"))
        .groupBy("cluster_size")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
    )


def degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman degree assortativity r of the near-dup graph: the
    Pearson correlation of endpoint degrees over edges — positive r
    means hubs link hubs (template families chain together: clique-
    collapse is safe), negative r means hubs link leaves (star
    contamination: collapsing merges unrelated docs through one hub).
    The one-number structural summary that complements modularity
    (community strength), triangles (closure) and k-core (depth).
    Sums over the symmetrized edge list are exact integers; r is one
    float formula over six of them, NULL for a degree-regular graph
    (zero variance).

    Scale notes (100 TB): degree table = one map-side-combined
    rollup of the (small) edge list, broadcast back onto it; the
    moment pass is a single aggregate. Nothing touches the corpus.
    """
    from mini_sql_engine_spark.operators.dedup import jaccard_dedup

    pairs = jaccard_dedup(spark, sf_dir).select("doc_a", "doc_b")
    e = (
        pairs.select(F.col("doc_a").alias("s"), F.col("doc_b").alias("d"))
        .unionAll(
            pairs.select(F.col("doc_b").alias("s"), F.col("doc_a").alias("d"))
        )
        .localCheckpoint(eager=False)
    )
    deg = e.groupBy("s").agg(F.count(F.lit(1)).alias("deg"))
    ed = (
        e.join(F.broadcast(deg), "s")
        .withColumnRenamed("deg", "dj")
        .join(
            F.broadcast(deg.withColumnRenamed("s", "d")), "d"
        )
        .withColumnRenamed("deg", "dk")
    )
    mom = ed.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("dj").alias("sj"),
        F.sum(F.col("dj") * F.col("dk")).alias("sjk"),
        F.sum(F.col("dj") * F.col("dj")).alias("sjj"),
    ).crossJoin(F.broadcast(deg.agg(F.count(F.lit(1)).alias("n_nodes"))))
    mean = F.col("sj") / F.col("m")
    num = F.col("sjk") / F.col("m") - mean * mean
    den = F.col("sjj") / F.col("m") - mean * mean
    return mom.select(
        "n_nodes",
        (F.col("m") / 2).cast("long").alias("n_edges"),
        F.when(den != 0, F.round(num / den, 6)).alias("assortativity"),
    )


def local_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node local clustering coefficient of the near-dup graph:
    LCC(v) = 2·tri(v) / (deg(v)·(deg(v)−1)) — the node-level
    counterpart of `ext_triangle_census`'s global closure rate. A
    high-LCC node sits inside a template clique (safe to collapse to
    one canonical doc); a high-degree LOW-LCC node is a hub stitching
    unrelated documents (collapsing through it over-merges) — the
    per-node triage the global number can't give. Only nodes with
    deg ≥ 2 appear (LCC undefined below). Output in exact integer ppm.

    Plan: triangles enumerate once as a<b<c on the (a<b)-ordered pair
    table (two joins), then scatter 1 count to each member; degree is
    one rollup of the symmetric edge list. All integers.

    Scale notes (100 TB): identical cost class to the triangle census
    — joins on the thin near-dup edge list, orders below corpus size;
    the scatter adds a 3×triangles explode. Hub skew in the triangle
    join is the known hotspot; at scale the standard mitigation is
    degree-ordered orientation (already the a<b ordering here), which
    bounds the join fan-out by arboricity.
    """
    pairs = (
        jaccard_dedup(spark, sf_dir)
        .select("doc_a", "doc_b")
        .localCheckpoint()
    )
    deg = (
        pairs.selectExpr("doc_a AS node")
        .union(pairs.selectExpr("doc_b AS node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    e1 = pairs.selectExpr("doc_a AS a", "doc_b AS b")
    e2 = pairs.selectExpr("doc_a AS b2", "doc_b AS c")
    tri = (
        e1.join(e2, F.col("b") == F.col("b2"))
        .join(
            pairs.selectExpr("doc_a AS a3", "doc_b AS c3"),
            (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3")),
        )
        .select("a", "b", "c")
    )
    member_tri = (
        tri.selectExpr("a AS node")
        .union(tri.selectExpr("b AS node"))
        .union(tri.selectExpr("c AS node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("tri"))
    )
    return (
        deg.filter(F.col("deg") >= 2)
        .join(member_tri, "node", "left")
        .select(
            F.col("node").alias("doc_id"),
            "deg",
            F.coalesce("tri", F.lit(0)).alias("n_triangles"),
            F.expr(
                "(2000000 * coalesce(tri, 0)"
                " + (deg * (deg - 1)) div 2) div (deg * (deg - 1))"
            ).alias("lcc_ppm"),
        )
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "ext_kcore_graph": kcore_graph,
    "ext_cluster_size_histogram": cluster_size_histogram,
    "ext_graph_assortativity": degree_assortativity,
    "ext_local_clustering": local_clustering,
}


def _kcore_oracle() -> str:
    rounds = []
    for r in range(1, KCORE_MAX_PEEL + 1):
        rounds.append(
            f"""k{r} AS MATERIALIZED (
                SELECT s FROM (SELECT s, COUNT(*) AS c FROM e{r - 1}
                               GROUP BY s)
                WHERE c >= {KCORE_K}),
            e{r} AS MATERIALIZED (
                SELECT e.s, e.d FROM e{r - 1} e
                JOIN k{r} a ON e.s = a.s
                JOIN k{r} b ON e.d = b.s)"""
        )
    return f"""
        WITH pairs AS MATERIALIZED (
            SELECT doc_a, doc_b FROM ({_JACCARD_PAIRS}) p
            WHERE jacc >= {JACCARD_T}),
        e0 AS MATERIALIZED (
            SELECT doc_a AS s, doc_b AS d FROM pairs
            UNION ALL
            SELECT doc_b AS s, doc_a AS d FROM pairs),
        {", ".join(rounds)}
        SELECT s AS doc_id, COUNT(*) AS core_degree
        FROM e{KCORE_MAX_PEEL} GROUP BY s
    """


def _cluster_sizes_oracle() -> str:
    from mini_sql_engine_spark.operators import dedup

    clusters_sql = dedup.ORACLES["ext_dedup_clusters"]
    return f"""
        SELECT cluster_size, COUNT(*) AS n_clusters
        FROM (SELECT cluster_id, COUNT(*) AS cluster_size
              FROM ({clusters_sql}) c GROUP BY cluster_id)
        GROUP BY cluster_size
    """


_ASSORT_ORACLE = f"""
    WITH pairs AS (
        SELECT doc_a, doc_b FROM ({_JACCARD_PAIRS}) p
        WHERE jacc >= {JACCARD_T}),
    e AS (
        SELECT doc_a AS s, doc_b AS d FROM pairs
        UNION ALL
        SELECT doc_b AS s, doc_a AS d FROM pairs),
    deg AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY s),
    ed AS (
        SELECT a.deg AS dj, b.deg AS dk
        FROM e JOIN deg a ON a.s = e.s JOIN deg b ON b.s = e.d),
    mom AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS m,
               CAST(SUM(dj) AS BIGINT) AS sj,
               CAST(SUM(dj * dk) AS BIGINT) AS sjk,
               CAST(SUM(dj * dj) AS BIGINT) AS sjj,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_nodes
        FROM ed)
    SELECT n_nodes, CAST(m / 2 AS BIGINT) AS n_edges,
           CASE WHEN sjj / m - (sj / m) * (sj / m) != 0
                THEN ROUND((sjk / m - (sj / m) * (sj / m))
                           / (sjj / m - (sj / m) * (sj / m)), 6)
           END AS assortativity
    FROM mom
"""

ORACLES: dict[str, str] = {
    "ext_kcore_graph": _kcore_oracle(),
    "ext_cluster_size_histogram": _cluster_sizes_oracle(),
    "ext_graph_assortativity": _ASSORT_ORACLE,
    "ext_local_clustering": f"""
        WITH pairs AS (
            SELECT doc_a, doc_b FROM ({_JACCARD_PAIRS}) p
            WHERE jacc >= {JACCARD_T}),
        deg AS (
            SELECT node, COUNT(*) AS deg FROM (
                SELECT doc_a AS node FROM pairs
                UNION ALL SELECT doc_b FROM pairs) u
            GROUP BY node),
        tri AS (
            SELECT e1.doc_a AS a, e1.doc_b AS b, e2.doc_b AS c
            FROM pairs e1
            JOIN pairs e2 ON e1.doc_b = e2.doc_a
            JOIN pairs e3 ON e1.doc_a = e3.doc_a
                         AND e2.doc_b = e3.doc_b),
        member_tri AS (
            SELECT node, COUNT(*) AS tri FROM (
                SELECT a AS node FROM tri
                UNION ALL SELECT b FROM tri
                UNION ALL SELECT c FROM tri) m
            GROUP BY node)
        SELECT d.node AS doc_id, CAST(d.deg AS BIGINT) AS deg,
               CAST(COALESCE(t.tri, 0) AS BIGINT) AS n_triangles,
               (2000000 * COALESCE(t.tri, 0)
                + (d.deg * (d.deg - 1)) // 2)
               // (d.deg * (d.deg - 1)) AS lcc_ppm
        FROM deg d LEFT JOIN member_tri t ON d.node = t.node
        WHERE d.deg >= 2
    """,
}


PJ_MAX_ROUNDS = 64  # doubling rounds backstop (reaches depth 2^64)


def pointer_jump_roots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tree-depth resolution by POINTER DOUBLING (pointer jumping —
    Wyllie's list-ranking construction, standard PRAM technique): over
    a deterministic random recursive forest on the customer keys
    (parent(k) = md5-hash(k) mod k, root = key 0 — every parent id is
    a smaller key, so the forest is well-formed on the contiguous key
    range), resolve every node's distance to the root in
    O(log depth) self-join rounds: each round replaces (ancestor,
    distance) with (ancestor's ancestor, distance + ancestor's
    distance), halving the unresolved path length. Output: the depth
    histogram.

    The oracle walks parents one step at a time with a recursive CTE —
    the O(depth) sequential method — so the two engines agree only if
    the doubling recurrence is exactly right.

    Scale notes (100 TB): THE pattern for transitive closure /
    hierarchy flattening when the chain is too deep to walk row-at-a-
    time: a naive resolve is `depth` dependent joins, doubling needs
    ceil(log2(depth)) self-joins each shuffled on the node key (a
    bucketed node table makes them co-located). Convergence check is
    a scalar count per round (metadata-only, the house rule for
    iterative operators); localCheckpoint cuts the lineage so round N
    doesn't replan rounds 1..N-1."""
    from mini_sql_engine_spark.catalog import load_table
    from mini_sql_engine_spark.functions.hashing import md5_long

    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("long").alias("node")
    )
    ptr = cust.select(
        "node",
        F.when(F.col("node") == 0, F.lit(0).cast("long"))
        .otherwise(md5_long(F.col("node").cast("string"), "pj") % F.col("node"))
        .alias("anc"),
        F.when(F.col("node") == 0, F.lit(0).cast("long"))
        .otherwise(F.lit(1).cast("long"))
        .alias("d"),
    ).localCheckpoint()
    for rounds in range(1, PJ_MAX_ROUNDS + 1):
        nxt = (
            ptr.alias("x")
            .join(ptr.alias("p"), F.col("x.anc") == F.col("p.node"))
            .select(
                F.col("x.node").alias("node"),
                F.col("p.anc").alias("anc"),
                (F.col("x.d") + F.col("p.d")).alias("d"),
            )
            .localCheckpoint()
        )
        # root rows (anc = 0) join the root's own (anc=0, d=0) entry and
        # pass through unchanged, so the join needs no special casing
        ptr = nxt
        if ptr.filter(F.col("anc") != 0).count() == 0:  # scalar only
            ITERATION_COUNTS["pointer_jump"] = rounds
            break
    return ptr.groupBy(F.col("d").alias("depth")).agg(
        F.count(F.lit(1)).alias("n_nodes")
    )


QUERIES["ext_pointer_jump_roots"] = pointer_jump_roots

# sequential-walk oracle: one parent step per recursion level
ORACLES["ext_pointer_jump_roots"] = """
    WITH RECURSIVE walk AS (
        SELECT c_custkey AS node, CAST(c_custkey AS BIGINT) AS cur,
               CAST(0 AS BIGINT) AS d
        FROM customer
        UNION ALL
        SELECT node,
               CAST('0x' || substr(md5('pj:' || CAST(cur AS VARCHAR)),
                                   1, 15) AS BIGINT) % cur,
               d + 1
        FROM walk WHERE cur <> 0
    )
    SELECT d AS depth, CAST(COUNT(*) AS BIGINT) AS n_nodes
    FROM walk WHERE cur = 0 GROUP BY d
"""


DB_R = 150  # DBSCAN eps (Chebyshev); grid cell size = DB_R
DB_MINPTS = 3  # core point: >= MINPTS points within eps (incl. itself)
DB_SPACE_MULT = 425  # plane side = 425 * floor(sqrt(n)) -> constant density
DB_MAX_ROUNDS = 24  # label-propagation backstop (max cluster diameter)


def grid_dbscan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN (Ester et al. 1996) with GRID-CELL neighbor blocking and
    distributed label propagation — the density-based member of the
    clustering family (k-means and Gonzalez k-center already exist).
    Documents get deterministic md5 coordinates on a plane whose side
    scales with sqrt(n) (DB_SPACE_MULT · floor(sqrt(n)), computed
    IN-PLAN from the corpus count), so the expected neighbor degree —
    and with it core density, cluster sizes, and propagation depth —
    is the SAME at every scale factor: the subcritical-percolation
    regime where components stay small. Pipeline: 9-cell grid join for
    eps-neighbor pairs (never n²) → degree count → core points
    (≥ DB_MINPTS−1 neighbors) → min-label propagation over core-core
    edges (scalar-only convergence, localCheckpoint per round) →
    border points adopt the min label among their core neighbors.
    Output: per-cluster core/border counts, label = min core doc_id.

    The oracle recomputes everything quadratically with a recursive-
    CTE reachability closure — an independent method for both the
    blocking AND the propagation.

    Scale notes (100 TB): neighbor discovery is the grid join
    (shuffle keys = cells, candidates ∝ true density); propagation
    rounds = cluster diameter, which the density regime keeps O(1) —
    the same loop shape as `dedup_clusters`, whose alternating-star
    variant takes over if components grow."""
    from mini_sql_engine_spark.catalog import load_table
    from mini_sql_engine_spark.functions.hashing import md5_long

    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("id")
    )
    n1 = docs.agg(
        (
            F.lit(DB_SPACE_MULT)
            * F.floor(F.sqrt(F.count(F.lit(1)))).cast("long")
        ).alias("space")
    )
    pts = docs.crossJoin(F.broadcast(n1)).select(
        "id",
        (md5_long(F.col("id").cast("string"), "db:gx") % F.col("space")).alias("x"),
        (md5_long(F.col("id").cast("string"), "db:gy") % F.col("space")).alias("y"),
    )
    home = pts.select(
        "id", "x", "y",
        F.floor(F.col("x") / DB_R).alias("cx"),
        F.floor(F.col("y") / DB_R).alias("cy"),
    )
    stamped = pts.select(
        "id", "x", "y",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                    for dx in (-1, 0, 1)
                    for dy in (-1, 0, 1)
                ]
            )
        ).alias("o"),
    ).select(
        "id", "x", "y",
        (F.floor(F.col("x") / DB_R) + F.col("o.dx")).alias("cx"),
        (F.floor(F.col("y") / DB_R) + F.col("o.dy")).alias("cy"),
    )
    nbr = (
        stamped.alias("a")
        .join(
            home.alias("b"),
            (F.col("a.cx") == F.col("b.cx"))
            & (F.col("a.cy") == F.col("b.cy"))
            & (F.col("a.id") != F.col("b.id")),
        )
        .filter(
            F.greatest(
                F.abs(F.col("a.x") - F.col("b.x")),
                F.abs(F.col("a.y") - F.col("b.y")),
            )
            <= DB_R
        )
        .select(F.col("a.id").alias("a"), F.col("b.id").alias("b"))
        .localCheckpoint()  # feeds degree, edges, and border below
    )
    core = (
        nbr.groupBy("a")
        .agg(F.count(F.lit(1)).alias("deg"))
        .filter(F.col("deg") >= DB_MINPTS - 1)
        .select(F.col("a").alias("id"))
    )
    ce = (
        nbr.join(core.withColumnRenamed("id", "a"), "a", "left_semi")
        .join(core.withColumnRenamed("id", "b"), "b", "left_semi")
        .select("a", "b")
        .localCheckpoint()
    )
    lab = core.select("id", F.col("id").alias("lab")).localCheckpoint()
    for rounds in range(1, DB_MAX_ROUNDS + 1):
        prop = (
            ce.join(lab.withColumnRenamed("id", "a"), "a")
            .select(F.col("b").alias("id"), "lab")
            .unionByName(lab)
            .groupBy("id")
            .agg(F.min("lab").alias("lab"))
            .localCheckpoint()
        )
        changed = (
            prop.alias("n")
            .join(lab.alias("o"), F.col("n.id") == F.col("o.id"))
            .filter(F.col("n.lab") != F.col("o.lab"))
            .count()
        )  # scalar-only convergence check
        lab = prop
        if changed == 0:
            ITERATION_COUNTS["grid_dbscan"] = rounds
            break
    else:
        # The density argument bounds cluster diameter only in
        # expectation — an adversarial layout can exceed DB_MAX_ROUNDS.
        # Partially-propagated labels would silently diverge from the
        # oracle's exact connected components, so fail loudly instead.
        raise RuntimeError(
            f"grid_dbscan: label propagation did not converge within "
            f"{DB_MAX_ROUNDS} rounds ({changed} labels still changing)"
        )
    border = (
        nbr.join(core.withColumnRenamed("id", "a"), "a", "left_anti")
        .join(
            lab.withColumnRenamed("id", "b").withColumnRenamed("lab", "blab"),
            "b",
        )
        .groupBy("a")
        .agg(F.min("blab").alias("lab"))
    )
    n_core = lab.groupBy("lab").agg(F.count(F.lit(1)).alias("n_core"))
    n_border = border.groupBy("lab").agg(F.count(F.lit(1)).alias("n_border"))
    return (
        n_core.join(n_border, "lab", "left_outer")
        .select(
            F.col("lab").alias("cluster"),
            "n_core",
            F.coalesce("n_border", F.lit(0)).cast("long").alias("n_border"),
        )
    )


QUERIES["ext_grid_dbscan"] = grid_dbscan

# independent oracle: quadratic neighbors + recursive-CTE reachability
ORACLES["ext_grid_dbscan"] = f"""
    WITH RECURSIVE n1 AS (
        SELECT {DB_SPACE_MULT} * CAST(FLOOR(SQRT(COUNT(*))) AS BIGINT)
               AS space
        FROM documents),
    pts AS (
        SELECT doc_id AS id,
               CAST('0x' || substr(md5('db:gx:' || CAST(doc_id AS VARCHAR)),
                                   1, 15) AS BIGINT) % space AS x,
               CAST('0x' || substr(md5('db:gy:' || CAST(doc_id AS VARCHAR)),
                                   1, 15) AS BIGINT) % space AS y
        FROM documents CROSS JOIN n1),
    nbr AS (
        SELECT a.id AS a, b.id AS b FROM pts a JOIN pts b
        ON a.id <> b.id
           AND GREATEST(ABS(a.x - b.x), ABS(a.y - b.y)) <= {DB_R}),
    core AS (SELECT a AS id FROM nbr GROUP BY a
             HAVING COUNT(*) >= {DB_MINPTS - 1}),
    ce AS (SELECT n.a, n.b FROM nbr n
           WHERE EXISTS (SELECT 1 FROM core c WHERE c.id = n.a)
             AND EXISTS (SELECT 1 FROM core c WHERE c.id = n.b)),
    reach AS (
        SELECT id, id AS lab FROM core
        UNION
        SELECT e.b AS id, r.lab FROM reach r JOIN ce e ON e.a = r.id),
    lab AS (SELECT id, MIN(lab) AS lab FROM reach GROUP BY id),
    border AS (
        SELECT n.a AS id, MIN(l.lab) AS lab FROM nbr n
        JOIN lab l ON l.id = n.b
        WHERE NOT EXISTS (SELECT 1 FROM core c WHERE c.id = n.a)
        GROUP BY n.a)
    SELECT l.lab AS cluster,
           CAST(COUNT(*) AS BIGINT) AS n_core,
           CAST(COALESCE(MAX(b.nb), 0) AS BIGINT) AS n_border
    FROM lab l LEFT JOIN (
        SELECT lab, COUNT(*) AS nb FROM border GROUP BY lab) b
      ON b.lab = l.lab
    GROUP BY l.lab
"""
