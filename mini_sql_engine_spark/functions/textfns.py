"""Text-analysis column expressions — all JVM-side built-ins.

Every function here returns a Column built from pyspark.sql.functions
only: tokenization, BPE-ish token counting, quality metrics, language-ID
scoring, and fingerprinting all run inside whole-stage codegen; no
Python UDF appears anywhere in the text pipeline (SURVEY.md §2.2 —
"UDFs are the slow path").
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# BPE-ish pre-tokenizer: word pieces or single non-space symbols — the
# standard GPT-2-style pre-split shape, ASCII-simplified.
BPE_ISH_PATTERN = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"

# Tiny deterministic marker profiles for language-ID scoring. Real
# pipelines would learn n-gram profiles; the operator shape (argmax over
# per-language overlap scores) is identical.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "of", "and", "a", "to"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "los", "las", "y", "en"],
    "de": ["der", "die", "und", "das", "ein"],
    "zh": ["de", "shi", "le", "zai", "he"],
}

STOPWORDS = ["the", "a", "an", "of", "and", "or", "to", "in", "is", "for"]


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization (documents.text is space-separated)."""
    return F.split(text, r"\s+")


def n_tokens(text: Column | str) -> Column:
    return F.size(tokens(text))


def n_bpe_tokens(text: Column | str) -> Column:
    """BPE-ish token count via regexp — the cheap len(tokenizer(text))
    proxy used for corpus budgeting."""
    return F.size(F.regexp_extract_all(F.col(text) if isinstance(text, str) else text,
                                       F.lit(BPE_ISH_PATTERN), F.lit(0)))


def lang_score(text_tokens: Column, lang: str) -> Column:
    """Distinct-token overlap with the language's marker profile."""
    markers = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
    return F.size(F.array_intersect(text_tokens, markers))


def language_id(text: Column | str) -> Column:
    """Argmax language by marker overlap, deterministic tiebreak.

    Encoded as sort_array over (score desc, lang asc) structs — stays in
    codegen, no UDF. Zero overlap everywhere → 'und' (undetermined).
    """
    toks = tokens(text)
    scored = F.array(
        *[
            F.struct(
                (-lang_score(toks, lang)).alias("neg_score"), F.lit(lang).alias("lang")
            )
            for lang in sorted(LANG_MARKERS)
        ]
    )
    best = F.sort_array(scored).getItem(0)
    return F.when(best.getField("neg_score") < 0, best.getField("lang")).otherwise(
        F.lit("und")
    )


def punct_ratio(text: Column | str) -> Column:
    col = F.col(text) if isinstance(text, str) else text
    stripped = F.regexp_replace(col, r"[^A-Za-z0-9\s]", "")
    return (F.length(col) - F.length(stripped)) / F.greatest(F.length(col), F.lit(1))


def stopword_ratio(text: Column | str) -> Column:
    toks = tokens(text)
    sw = F.array(*[F.lit(s) for s in STOPWORDS])
    n_sw = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return n_sw / F.greatest(F.size(toks), F.lit(1))


def avg_token_len(text: Column | str) -> Column:
    toks = tokens(text)
    total = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda acc, x: acc + x
    )
    return total / F.greatest(F.size(toks), F.lit(1))


def quality_score(text: Column | str) -> Column:
    """Composite heuristic quality score in [0, 1]: rewards mid-length
    docs, low punctuation density, presence of stopwords."""
    col = F.col(text) if isinstance(text, str) else text
    length_term = F.least(F.length(col) / F.lit(200.0), F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(col) * 5, F.lit(1.0))
    sw_term = F.least(stopword_ratio(col) * 4, F.lit(1.0))
    return F.round(0.4 * length_term + 0.3 * punct_term + 0.3 * sw_term, 6)


def normalize_text(text: Column | str) -> Column:
    """Canonical form for fingerprinting: lower, trim, collapse spaces."""
    col = F.col(text) if isinstance(text, str) else text
    return F.regexp_replace(F.trim(F.lower(col)), r"\s+", " ")


def fingerprint(text: Column | str) -> Column:
    """Content fingerprint = md5 of normalized text (engine-portable)."""
    return F.md5(normalize_text(text))


def shingles(text: Column | str, k: int = 3) -> Column:
    """Token k-shingles as strings — input to MinHash / Jaccard dedup.

    Built with transform over token indices; stays JVM-side.
    """
    toks = tokens(text)
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.when(
        n >= k,
        F.transform(
            idx,
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))
