"""Text-analysis query registrations (operators.textstats)."""

from __future__ import annotations

from pyspark.sql import functions as F

from wikipedia_data_pipeline_spark.operators import text as T
from wikipedia_data_pipeline_spark.operators import textstats as TS
from wikipedia_data_pipeline_spark.registry import register
from wikipedia_data_pipeline_spark.sources.tables import load_table


def _in_list(words: list[str]) -> str:
    return ", ".join(f"'{w}'" for w in words)


_SCORES = ",\n       ".join(
    f"len(list_filter(toks, x -> x IN ({_in_list(TS.LANG_STOPWORDS[lang])})))"
    f" AS score_{lang}"
    for lang in sorted(TS.LANG_STOPWORDS)
)


@register(
    "text_language_id",
    oracle=f"""
WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
s AS (SELECT doc_id, lang,
       {_SCORES}
      FROM t)
SELECT doc_id, lang,
       CASE WHEN greatest(score_de, score_en, score_es, score_fr) = 0 THEN 'und'
            WHEN score_de = greatest(score_de, score_en, score_es, score_fr) THEN 'de'
            WHEN score_en = greatest(score_de, score_en, score_es, score_fr) THEN 'en'
            WHEN score_es = greatest(score_de, score_en, score_es, score_fr) THEN 'es'
            ELSE 'fr' END AS predicted_lang,
       greatest(score_de, score_en, score_es, score_fr) AS best_score
FROM s
""",
)
def text_language_id(spark, sf_dir):
    """Stopword-overlap language ID heuristic."""
    return TS.language_id(load_table(spark, sf_dir, "documents"))


@register(
    "text_quality_scores",
    oracle="""
WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents)
SELECT doc_id,
       len(toks)::BIGINT AS n_tokens,
       length(text)::BIGINT AS n_chars_text,
       CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT)
         / len(toks) AS avg_token_len,
       len(list_filter(toks, x -> x IN ('the','a','and','of','to','in','is')))
         / len(toks) AS stopword_ratio,
       length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))::BIGINT
         / length(text) AS alpha_ratio,
       len(list_distinct(toks))::BIGINT AS n_distinct_tokens,
       len(list_distinct(toks)) / len(toks) AS ttr
FROM t
""",
)
def text_quality_scores(spark, sf_dir):
    """Length/punctuation/stopword/type-token-ratio quality features."""
    return TS.quality_scores(load_table(spark, sf_dir, "documents"))


@register(
    "text_token_counts",
    oracle=f"""
SELECT doc_id,
       len(string_split(text, ' '))::BIGINT AS ws_tokens,
       len(regexp_extract_all(text, '{TS.BPE_PATTERN}'))::BIGINT AS bpe_tokens,
       length(text)::BIGINT AS n_chars_text
FROM documents
""",
)
def text_token_counts(spark, sf_dir):
    """Whitespace + BPE-ish regex token counting."""
    return TS.token_counts(load_table(spark, sf_dir, "documents"))


@register(
    "text_fingerprints",
    oracle=f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
SELECT doc_id,
       CAST(list_sum(list_transform(
              list_zip(toks, generate_series(1, len(toks))),
              x -> x[2]::BIGINT * (131 * length(x[1]) + ascii(substring(x[1], 1, 1)))
            )) % {TS.FINGERPRINT_MOD} AS BIGINT) AS fingerprint
FROM t
""",
)
def text_fingerprints(spark, sf_dir):
    """Order-sensitive positional fingerprint (mod 2^31-1)."""
    return TS.fingerprints(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "fingerprint"
    )


@register(
    "text_trigram_counts",
    oracle="""
WITH t AS (
  SELECT doc_id,
         list_filter(list_transform(string_split(text, ' '),
                     x -> lower(regexp_replace(x, '[^a-zA-Z]', '', 'g'))),
                     w -> length(w) > 0) AS ws
  FROM documents
)
SELECT doc_id, ngram, count(*) AS n
FROM (
  SELECT doc_id, concat_ws(' ', ws[g], ws[g+1], ws[g+2]) AS ngram
  FROM t, unnest(generate_series(1, len(ws) - 2)) AS u(g)
  WHERE len(ws) >= 3
) GROUP BY doc_id, ngram
""",
)
def text_trigram_counts(spark, sf_dir):
    """Word 3-gram generation (order-preserving, pure higher-order
    functions) + per-doc gram counts."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        T.ngrams(docs, n=3)
        .groupBy("doc_id", "ngram")
        .agg(F.count("*").alias("n"))
    )
