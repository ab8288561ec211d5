"""In-engine BPE merge training: the tokenizer-building operator.

Byte-pair-encoding training is the canonical pre-tokenizer step of an
LLM data pipeline; this operator runs BPE_ROUNDS greedy merge rounds
INSIDE the engine and emits the learned merge table — (round, sym1,
sym2, pair_count) — with every step exactly reproduced by the DuckDB
oracle (the same rounds unrolled as CTEs).

Algorithm (Sennrich et al.'s original corpus-level BPE, expressed
relationally):
1. word TYPES + corpus frequencies (the one corpus-wide shuffle);
2. each type exploded to (word, pos, sym) single-char rows;
3. per round: adjacent-pair counts weighted by type frequency →
   argmax pair (ties: lexicographic) → LEFTMOST-GREEDY merge of all
   its occurrences → renumber positions. Leftmost-greedy overlap
   resolution (the "aaaa" case: merge positions 1 and 3, not 2) is a
   gaps-and-islands window: consecutive match runs keep their
   even-offset members.

The round loop is a Python loop building ONE lazy Catalyst plan per
round boundary (lazy localCheckpoint between rounds — each round's
table feeds both the next pair count and the next merge); the argmax
is an orderBy(1) inside the plan and broadcast-joined back, so no
driver-side collect anywhere.

Scale (100 TB): this is exactly how SentencePiece-style distributed
BPE scales — the corpus is touched ONCE (token → type frequencies,
map-side combinable); every merge round then runs on the TYPE table,
which is vocabulary-sized (thousands to millions of rows), not
corpus-sized. Round cost: one window pass + one tiny broadcast join
over the types. The merge table itself (the operator's output) is the
artifact shipped to tokenizer workers.

No reference counterpart (SURVEY.md §2.1); extension per SURVEY §2.2
text-analysis row.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from mini_sql_engine_spark.catalog import ensure_min_partitions, load_table

BPE_ROUNDS = 3


def _word_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(word, freq) corpus type table — the only corpus-wide pass."""
    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    return (
        docs.select(F.explode(F.split("text", r"\s+")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _char_rows(types: DataFrame) -> DataFrame:
    """(word, freq, pos, sym): each type as single-char symbol rows."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length("word")),
        lambda i: F.col("word").substr(i, F.lit(1)),
    )
    return types.select(
        "word", "freq", F.posexplode(chars).alias("pos", "sym")
    )


def _merge_round(t: DataFrame) -> tuple[DataFrame, DataFrame]:
    """One BPE round over the types table.

    Returns (best, merged): ``best`` is the 1-row argmax pair with its
    weighted count; ``merged`` is the table after the leftmost-greedy
    merge, positions renumbered."""
    w = Window.partitionBy("word").orderBy("pos")
    t2 = t.withColumn("s2", F.lead("sym").over(w))
    pairs = t2.filter(F.col("s2").isNotNull())
    best = (
        pairs.groupBy(
            F.col("sym").alias("sym1"), F.col("s2").alias("sym2")
        )
        .agg(F.sum("freq").alias("pair_count"))
        .orderBy(F.desc("pair_count"), "sym1", "sym2")
        .limit(1)
    )
    matches = t2.join(
        F.broadcast(best),
        (t2["sym"] == best["sym1"]) & (t2["s2"] == best["sym2"]),
    ).select("word", "pos")
    # leftmost-greedy: in a run of consecutive match positions only the
    # even offsets from the run head actually merge
    wm = Window.partitionBy("word").orderBy("pos")
    isl = matches.withColumn(
        "island", F.col("pos") - F.row_number().over(wm)
    )
    wi = Window.partitionBy("word", "island")
    kept = (
        isl.withColumn("head", F.min("pos").over(wi))
        .filter((F.col("pos") - F.col("head")) % 2 == 0)
        .select("word", "pos")
    )
    merged = (
        t2.join(kept.withColumn("is_merge", F.lit(True)), ["word", "pos"], "left")
        .join(
            kept.select(
                "word", (F.col("pos") + 1).alias("pos"), F.lit(True).alias("is_drop")
            ),
            ["word", "pos"],
            "left",
        )
        .filter(F.col("is_drop").isNull())
        .select(
            "word",
            "freq",
            "pos",
            F.when(F.col("is_merge"), F.concat("sym", "s2"))
            .otherwise(F.col("sym"))
            .alias("sym"),
        )
        .withColumn("pos", F.row_number().over(w))
    )
    return best, merged


def bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE_ROUNDS greedy merges over the corpus type table; output the
    learned merge table (round, sym1, sym2, pair_count)."""
    t = _char_rows(_word_types(spark, sf_dir)).localCheckpoint(eager=False)
    out: DataFrame | None = None
    for r in range(1, BPE_ROUNDS + 1):
        best, t = _merge_round(t)
        t = t.localCheckpoint(eager=False)  # feeds next count AND merge
        row = best.select(
            F.lit(r).cast("long").alias("round"), "sym1", "sym2", "pair_count"
        )
        out = row if out is None else out.unionByName(row)
    return out


def bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize with the learned merges: after BPE_ROUNDS rounds, each
    word type's symbol count is its tokenized length. Output per word:
    (word, freq, n_chars, n_syms, saved) — saved = char-tokens avoided,
    weighted by corpus frequency. The compression report that decides
    whether the merge table is worth shipping; costs nothing beyond
    training (the final round's table IS the applied tokenization)."""
    t = _char_rows(_word_types(spark, sf_dir)).localCheckpoint(eager=False)
    for _ in range(BPE_ROUNDS):
        _, t = _merge_round(t)
        t = t.localCheckpoint(eager=False)
    return t.groupBy("word", "freq").agg(
        F.sum(F.length("sym")).alias("n_chars"),
        F.count(F.lit(1)).alias("n_syms"),
        (
            (F.sum(F.length("sym")) - F.count(F.lit(1))) * F.first("freq")
        ).alias("saved"),
    ).select("word", "freq", "n_chars", "n_syms", "saved")


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "ext_bpe_train": bpe_train,
    "ext_bpe_apply": bpe_apply,
}


def _round_sql(r: int) -> str:
    """CTE block for round r: t{r-1} -> best{r}, t{r}."""
    p, c = f"t{r - 1}", f"t{r}"
    return f"""
        p{r} AS (
            SELECT word, freq, pos, sym,
                   lead(sym) OVER (PARTITION BY word ORDER BY pos) AS s2
            FROM {p}),
        best{r} AS (
            SELECT sym AS sym1, s2 AS sym2,
                   CAST(SUM(freq) AS BIGINT) AS pair_count
            FROM p{r} WHERE s2 IS NOT NULL
            GROUP BY sym, s2
            ORDER BY pair_count DESC, sym1, sym2 LIMIT 1),
        m{r} AS (
            SELECT p.word, p.pos,
                   p.pos - row_number() OVER (
                       PARTITION BY p.word ORDER BY p.pos) AS island
            FROM p{r} p JOIN best{r} b
              ON p.sym = b.sym1 AND p.s2 = b.sym2),
        k{r} AS (
            SELECT word, pos FROM (
                SELECT word, pos,
                       pos - MIN(pos) OVER (PARTITION BY word, island)
                           AS off
                FROM m{r}) q WHERE off % 2 = 0),
        {c} AS (
            SELECT word, freq,
                   row_number() OVER (PARTITION BY word ORDER BY pos)
                       AS pos,
                   CASE WHEN mrg THEN sym || s2 ELSE sym END AS sym
            FROM (
                SELECT p.word, p.freq, p.pos, p.sym, p.s2,
                       k1.pos IS NOT NULL AS mrg
                FROM p{r} p
                LEFT JOIN k{r} k1
                  ON p.word = k1.word AND p.pos = k1.pos
                LEFT JOIN k{r} k2
                  ON p.word = k2.word AND p.pos = k2.pos + 1
                WHERE k2.pos IS NULL) q)"""


ORACLES: dict[str, str] = {
    "ext_bpe_train": f"""
        WITH types AS (
            SELECT word, CAST(COUNT(*) AS BIGINT) AS freq FROM (
                SELECT unnest(string_split_regex(text, '\\s+')) AS word
                FROM documents) w GROUP BY word),
        t0 AS (
            SELECT word, freq, s.pos AS pos, s.sym AS sym FROM (
                SELECT word, freq,
                       unnest([struct_pack(pos := i, sym := word[i:i])
                               for i in range(1, len(word) + 1)]) AS s
                FROM types) q),
        {", ".join(_round_sql(r).strip() for r in range(1, BPE_ROUNDS + 1))}
        {" UNION ALL ".join(
            f"SELECT CAST({r} AS BIGINT) AS round, sym1, sym2, pair_count FROM best{r}"
            for r in range(1, BPE_ROUNDS + 1)
        )}
    """,
}

# same unrolled rounds, but the output is the final table's per-word
# tokenization stats instead of the merge rows
ORACLES["ext_bpe_apply"] = (
    ORACLES["ext_bpe_train"].rsplit("SELECT CAST(1", 1)[0]
    + f"""
        SELECT word, freq, CAST(SUM(len(sym)) AS BIGINT) AS n_chars,
               COUNT(*) AS n_syms,
               CAST((SUM(len(sym)) - COUNT(*)) * freq AS BIGINT) AS saved
        FROM t{BPE_ROUNDS} GROUP BY word, freq
    """
)
