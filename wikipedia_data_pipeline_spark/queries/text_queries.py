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


# PII patterns restated for DuckDB (same regex dialect subset; 'g' flag
# because DuckDB's regexp_replace is first-match-only by default while
# Spark's replaces all).
_PII_SQL = (
    "regexp_replace(regexp_replace(regexp_replace({col},"
    " '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}', '<EMAIL>', 'g'),"
    " '\\b(?:[0-9]{{1,3}}\\.){{3}}[0-9]{{1,3}}\\b', '<IP>', 'g'),"
    " '\\+?[0-9][0-9()\\-. ]{{7,}}[0-9]', '<PHONE>', 'g')"
)

_WITH_PII = (
    "text || ' contact user' || doc_id || '@example.com at 10.0.'"
    " || (doc_id % 256) || '.1 or +1 (555) 000-' || (1000 + doc_id % 9000)"
)


@register(
    "text_pii_scrub",
    oracle=f"""
SELECT doc_id, {_PII_SQL.format(col=_WITH_PII)} AS text_clean
FROM documents
""",
)
def text_pii_scrub(spark, sf_dir):
    """PII scrubbing, driver-checked for real: both engines append a
    synthetic email/IP/phone (derived from doc_id) to every document,
    then the Spark side runs the production regex chain
    (operators.curation.scrub_pii) — hash equality fails unless every
    injected token is actually rewritten."""
    from wikipedia_data_pipeline_spark.operators.curation import scrub_pii

    docs = load_table(spark, sf_dir, "documents")
    with_pii = F.concat(
        F.col("text"),
        F.lit(" contact user"), F.col("doc_id").cast("string"),
        F.lit("@example.com at 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".1 or +1 (555) 000-"),
        (1000 + F.col("doc_id") % 9000).cast("string"),
    )
    return docs.select("doc_id", scrub_pii(with_pii).alias("text_clean"))


@register(
    "documents_curation_pipeline",
    oracle=f"""
WITH gated AS (
  SELECT doc_id, lang, text FROM documents
  WHERE lang IN ('en', 'es') AND length(text) BETWEEN 20 AND 1000000
),
kept AS (
  SELECT doc_id, lang, text,
         row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
  FROM gated
)
SELECT doc_id, lang, {_PII_SQL.format(col='text')} AS text_clean,
       CAST(length(text) AS BIGINT) AS n_chars
FROM kept WHERE rn = 1
""",
)
def documents_curation_pipeline(spark, sf_dir):
    """End-to-end curation: language gate → length gates → exact-dedup
    keep (one shuffle) → PII scrub. The relation an LLM training run
    would consume."""
    from wikipedia_data_pipeline_spark.operators.curation import curate

    return curate(
        load_table(spark, sf_dir, "documents"), languages=["en", "es"]
    )


@register(
    "text_segment_dedup",
    oracle="""
WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
segs AS (
  SELECT doc_id, i AS seg_idx,
         array_to_string(list_slice(w, i * 10 + 1, i * 10 + 10), ' ') AS seg_text
  FROM words,
       unnest(generate_series(0, CAST(ceil(len(w) / 10.0) AS BIGINT) - 1)) AS t(i)
),
kept AS (
  SELECT doc_id, seg_idx, seg_text,
         row_number() OVER (PARTITION BY seg_text ORDER BY doc_id, seg_idx) AS rn
  FROM segs
)
SELECT doc_id,
       count(*)::BIGINT AS n_segs,
       CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       coalesce(
         array_to_string(list(seg_text ORDER BY seg_idx) FILTER (WHERE rn = 1), ' '),
         '') AS text_clean
FROM kept GROUP BY doc_id
""",
)
def text_segment_dedup(spark, sf_dir):
    """C4-style segment-level dedup: drop exact-duplicate 10-word
    segments corpus-wide (first occurrence wins), reassemble documents
    from the survivors. See operators.curation.segment_dedup for the
    scale discussion."""
    from wikipedia_data_pipeline_spark.operators.curation import segment_dedup

    return segment_dedup(load_table(spark, sf_dir, "documents"), seg_words=10)


# BPE oracle (round 11): the full trainer AND encoder replayed in SQL,
# so the one formerly-rows-only deterministic LLM-core operator gets an
# exact twin. Representation trick: a symbol sequence is a space-joined
# string of \x1f-wrapped symbols ("\x1fl\x1f \x1fo\x1f \x1fw\x1f"), so
# applying a merge IS SQL replace() — leftmost non-overlapping, exactly
# BPE's left-to-right merge order — and the wrapper makes partial-symbol
# matches impossible. Each training round is one unrolled CTE level
# (pair explode → argmin by (-count, a, b) → replace), the same
# unrolled-fixpoint pattern as the sssp/pagerank oracles. Encoding
# applies the 8 learned (pat, rep) pairs in rank order, which equals
# the engine's lowest-rank-first one-occurrence-at-a-time loop because
# a merge can only CREATE pairs of higher rank than itself (a new pair
# involves the merged symbol, which no earlier merge could reference).
# Assumptions, asserted by the charset of this corpus: text is \x1f-free
# and has no codepoints below space (so wrapped-symbol binary compare
# equals raw-symbol compare), and the corpus supports ≥ 8 merges.
_BPE_S = "\x1f"


def _bpe_oracle_sql(n_merges: int = 8, tail: str | None = None) -> str:
    S = _BPE_S
    parts = [
        f"""
WITH dw AS (
  SELECT doc_id, w FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents) t
  WHERE len(w) > 0
),
wc AS (SELECT w, CAST(count(*) AS BIGINT) AS n FROM dw GROUP BY w),
v0 AS (
  SELECT n, rtrim(regexp_replace(w, '(.)', '{S}\\1{S} ', 'g')) AS s
  FROM wc
)"""
    ]
    for k in range(1, n_merges + 1):
        parts.append(
            f""",
p{k} AS (
  SELECT l[i] AS a, l[i + 1] AS b, sum(n) AS cnt
  FROM (SELECT n, string_split(s, ' ') AS l FROM v{k - 1}) t,
       unnest(generate_series(1, len(l) - 1)) AS g(i)
  GROUP BY a, b
),
b{k} AS (
  SELECT a || ' ' || b AS pat, replace(a || b, '{S}{S}', '') AS rep
  FROM p{k}
  ORDER BY cnt DESC, replace(a, '{S}', '') ASC, replace(b, '{S}', '') ASC
  LIMIT 1
),
v{k} AS (SELECT n, replace(s, b{k}.pat, b{k}.rep) AS s FROM v{k - 1}, b{k})"""
        )
    parts.append(
        f""",
e0 AS (
  SELECT doc_id, rtrim(regexp_replace(w, '(.)', '{S}\\1{S} ', 'g')) AS s
  FROM dw
)"""
    )
    for k in range(1, n_merges + 1):
        parts.append(
            f""",
e{k} AS (SELECT doc_id, replace(s, b{k}.pat, b{k}.rep) AS s
         FROM e{k - 1}, b{k})"""
        )
    parts.append(
        f""",
agg AS (
  SELECT doc_id,
         CAST(sum(len(string_split(s, ' '))) AS BIGINT) AS n_bpe_tokens,
         CAST(count(*) AS BIGINT) AS n_words
  FROM e{n_merges} GROUP BY doc_id
)"""
    )
    parts.append(
        tail
        or """
SELECT d.doc_id,
       coalesce(a.n_bpe_tokens, 0) AS n_bpe_tokens,
       coalesce(a.n_words, 0) AS n_words,
       CASE WHEN a.n_words > 0
            THEN round(CAST(a.n_bpe_tokens AS DOUBLE) / a.n_words, 4)
       END AS tokens_per_word
FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id"""
    )
    return "".join(parts)


# eager: bpe_train_merges collects the bounded word dictionary at
# CONSTRUCTION (the central trainer), so timing only the encode tail
# would misprice it — same flag discipline as graph_kcore_peel
@register("text_bpe_tokenize", oracle=_bpe_oracle_sql(8), eager=True)
def text_bpe_tokenize(spark, sf_dir):
    """Train 8 BPE merges on the corpus (distributed word-count agg +
    central merge loop on the bounded dictionary), then encode every
    document distributed. Deterministic (lexicographic tie-break) —
    and since round 11 exactly SQL-checkable: the oracle replays
    training as 8 unrolled CTE levels and encoding as rank-ordered
    replace() application (see _bpe_oracle_sql for why that equals the
    engine's lowest-rank-first loop). The hand-computed example in
    tests/test_textstats.py still pins the semantics independently."""
    docs = load_table(spark, sf_dir, "documents")
    merges = TS.bpe_train_merges(docs, n_merges=8)
    return TS.bpe_encode(docs, merges)


_FERTILITY_TAIL = """
SELECT d.lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(coalesce(a.n_bpe_tokens, 0)) AS BIGINT) AS n_bpe_tokens,
       CAST(sum(coalesce(a.n_words, 0)) AS BIGINT) AS n_words,
       CAST(sum(coalesce(a.n_bpe_tokens, 0)) AS DOUBLE)
         / CAST(sum(coalesce(a.n_words, 0)) AS DOUBLE) AS fertility
FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
GROUP BY d.lang
ORDER BY fertility DESC, d.lang
"""


# eager: shares text_bpe_tokenize's central trainer (same flag logic)
@register(
    "text_tokenizer_fertility",
    oracle=_bpe_oracle_sql(8, tail=_FERTILITY_TAIL),
    eager=True,
)
def text_tokenizer_fertility(spark, sf_dir):
    """Tokenizer fertility per language — BPE tokens per whitespace
    word under the corpus-trained 8-merge tokenizer (text_bpe_tokenize's
    trainer): the multilinguality cost audit (Rust et al. 2021 / Ahia
    et al. 2023 'language tax') — a language whose fertility runs high
    pays proportionally more context window and compute per word, which
    is exactly what a mixture planner needs next to token counts.
    Per-language BIGINT token/word sums from the distributed encode,
    one double division per language. Oracle replays the trainer as
    unrolled CTE levels and aggregates the same encode by lang."""
    docs = load_table(spark, sf_dir, "documents")
    merges = TS.bpe_train_merges(docs, n_merges=8)
    enc = TS.bpe_encode(docs, merges)
    return (
        enc.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_bpe_tokens").cast("long").alias("n_bpe_tokens"),
            F.sum("n_words").cast("long").alias("n_words"),
        )
        .withColumn(
            "fertility",
            F.col("n_bpe_tokens").cast("double")
            / F.col("n_words").cast("double"),
        )
        .orderBy(F.desc("fertility"), F.asc("lang"))
    )
