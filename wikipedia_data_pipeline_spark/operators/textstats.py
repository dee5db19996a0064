"""Text-analysis operators for training-data curation: language ID,
quality scoring, token counting, document fingerprinting.

All pure `pyspark.sql.functions` expressions (whole-stage codegen, no
Python) — these run per-document as narrow maps, so they cost one scan
at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Tiny seed stopword lists per language for the n-gram/stopword-overlap
# language heuristic. Deliberately small and deterministic.
LANG_STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is"],
    "es": ["el", "la", "de", "que", "y", "los"],
    "fr": ["le", "la", "les", "de", "et", "un"],
    "de": ["der", "die", "das", "und", "ist", "ein"],
}

QUALITY_STOPWORDS = LANG_STOPWORDS["en"]

# BPE-ish pre-tokenization: runs of letters, runs of digits, or a single
# non-alphanumeric non-space character. Same regex runs on both engines.
BPE_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"

FINGERPRINT_MOD = (1 << 31) - 1  # Mersenne prime 2^31-1


def _tokens(text_col):
    return F.split(text_col, " ")


def language_id(documents: DataFrame) -> DataFrame:
    """Stopword-overlap language scorer: count tokens that appear in
    each language's seed list; predict the argmax (ties → lexicographic
    language order; 'und' = undetermined when every score is 0)."""
    toks = _tokens(F.col("text"))

    def score(lang: str):
        words = LANG_STOPWORDS[lang]
        return F.size(
            F.filter(toks, lambda t: t.isin(*[F.lit(w) for w in words]))
        ).cast("long")

    scored = documents.select(
        "doc_id",
        "lang",
        *[score(lang).alias(f"score_{lang}") for lang in sorted(LANG_STOPWORDS)],
    )
    langs = sorted(LANG_STOPWORDS)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pred = F.lit("und")
    # reversed so the earliest language wins ties via later overwrite
    for lang in reversed(langs):
        pred = F.when(
            (best > 0) & (F.col(f"score_{lang}") == best), F.lit(lang)
        ).otherwise(pred)
    return scored.select(
        "doc_id",
        "lang",
        pred.alias("predicted_lang"),
        best.alias("best_score"),
    )


def quality_scores(documents: DataFrame) -> DataFrame:
    """Length / punctuation / stopword heuristics. All ratios are
    int/int divisions — deterministic doubles."""
    toks = _tokens(F.col("text"))
    n_tok = F.size(toks).cast("long")
    n_stop = F.size(
        F.filter(toks, lambda t: t.isin(*[F.lit(w) for w in QUALITY_STOPWORDS]))
    ).cast("long")
    n_chars = F.length("text").cast("long")
    n_alpha = F.length(F.regexp_replace("text", "[^a-zA-Z]", "")).cast("long")
    sum_tok_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    return documents.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        n_chars.alias("n_chars_text"),
        (sum_tok_len / n_tok).alias("avg_token_len"),
        (n_stop / n_tok).alias("stopword_ratio"),
        (n_alpha / n_chars).alias("alpha_ratio"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
        (F.size(F.array_distinct(toks)) / n_tok).alias("ttr"),
    )


def token_counts(documents: DataFrame) -> DataFrame:
    """Whitespace token count + BPE-ish pre-token count (regex runs)."""
    return documents.select(
        "doc_id",
        F.size(_tokens(F.col("text"))).cast("long").alias("ws_tokens"),
        F.regexp_count(F.col("text"), F.lit(BPE_PATTERN)).cast("long").alias(
            "bpe_tokens"
        ),
        F.length("text").cast("long").alias("n_chars_text"),
    )


def fingerprints(documents: DataFrame) -> DataFrame:
    """Order-sensitive document fingerprint, SQL-portable: per token at
    1-based position i, contribute i * (131*len(tok) + ascii(first
    char)); sum mod 2^31-1. Catches reorderings that bag-of-words
    hashes miss while staying expressible on any engine (the
    engine-native path would just be xxhash64(text))."""
    toks = _tokens(F.col("text"))
    contrib = F.zip_with(
        toks,
        F.sequence(F.lit(1), F.size(toks)),
        lambda t, i: i.cast("long")
        * (F.lit(131) * F.length(t) + F.ascii(F.substring(t, 1, 1))),
    )
    total = F.aggregate(contrib, F.lit(0).cast("long"), lambda a, x: a + x)
    return documents.select(
        "doc_id",
        F.pmod(total, F.lit(FINGERPRINT_MOD)).alias("fingerprint"),
        F.xxhash64(F.col("text")).alias("content_hash64"),
    )
