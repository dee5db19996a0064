"""TF-IDF family — the reference's Task 1 + Task 3 surface (SURVEY.md §2).

Each query pairs the Spark operator (operators.tfidf / operators.text)
with a DuckDB oracle that restates the same semantics in ANSI SQL.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from wikipedia_data_pipeline_spark.operators import tfidf as T
from wikipedia_data_pipeline_spark.operators.text import tokenize
from wikipedia_data_pipeline_spark.registry import register
from wikipedia_data_pipeline_spark.sources.tables import load_table

# Shared DuckDB CTE: tokenize + normalize + drop empties (P2-P4).
TOKS_CTE = """
toks AS (
    SELECT doc_id,
           lower(regexp_replace(tok, '[^a-zA-Z]', '', 'g')) AS word
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
    WHERE length(lower(regexp_replace(tok, '[^a-zA-Z]', '', 'g'))) > 0
)
"""

DOC_TF_CTES = f"""
{TOKS_CTE},
counts AS (
    SELECT doc_id, word, count(*) AS count
    FROM toks GROUP BY doc_id, word
),
capped AS (
    SELECT doc_id, word, count
    FROM (SELECT doc_id, word, count,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY count DESC, word ASC) AS rn
          FROM counts)
    WHERE rn <= {T.PER_DOC_VOCAB_CAP}
),
denom AS (
    SELECT doc_id, len(string_split(text, ' '))::BIGINT AS raw_token_count
    FROM documents
),
doc_tf AS (
    SELECT c.doc_id, c.word, c.count,
           round(c.count / d.raw_token_count, 2) AS tf
    FROM capped c JOIN denom d ON c.doc_id = d.doc_id
    WHERE round(c.count / d.raw_token_count, 2) > 0
)
"""

IDF_CTES = f"""
{TOKS_CTE},
dfreq AS (
    SELECT word, count(*) AS df
    FROM (SELECT DISTINCT doc_id, word FROM toks) GROUP BY word
),
ndocs AS (SELECT count(*) AS n_docs FROM documents),
idf AS (
    SELECT word, round(log10(CAST(n_docs AS DOUBLE) / df), 2) AS idf
    FROM dfreq, ndocs
    WHERE round(log10(CAST(n_docs AS DOUBLE) / df), 2) > 0
)
"""


@register(
    "doc_tokens",
    oracle=f"WITH {TOKS_CTE} SELECT doc_id, word FROM toks",
)
def doc_tokens(spark, sf_dir):
    """P1-P4: tokenize + normalize + non-empty filter."""
    return tokenize(load_table(spark, sf_dir, "documents"))


@register(
    "doc_term_counts",
    oracle=f"""
WITH {TOKS_CTE}
SELECT doc_id, word, count(*) AS count FROM toks GROUP BY doc_id, word
""",
)
def doc_term_counts(spark, sf_dir):
    """A2: per-document hash-agg word counts."""
    return T.doc_term_counts(load_table(spark, sf_dir, "documents"))


@register(
    "doc_tf",
    oracle=f"WITH {DOC_TF_CTES} SELECT doc_id, word, count, tf FROM doc_tf",
)
def doc_tf(spark, sf_dir):
    """W2 + TF formula + P5: per-doc top-K, raw-token denominator, tf>0."""
    return T.doc_tf(load_table(spark, sf_dir, "documents"))


@register(
    "idf",
    oracle=f"WITH {IDF_CTES} SELECT word, idf FROM idf",
)
def idf(spark, sf_dir):
    """A3 + IDF formula + P6: document frequency → log10(N/df)."""
    return T.idf(load_table(spark, sf_dir, "documents"))


@register(
    "tfidf_full",
    oracle=f"""
WITH {DOC_TF_CTES},
dfreq AS (
    SELECT word, count(*) AS df
    FROM (SELECT DISTINCT doc_id, word FROM toks) GROUP BY word
),
ndocs AS (SELECT count(*) AS n_docs FROM documents),
idf AS (
    SELECT word, round(log10(CAST(n_docs AS DOUBLE) / df), 2) AS idf
    FROM dfreq, ndocs
    WHERE round(log10(CAST(n_docs AS DOUBLE) / df), 2) > 0
)
SELECT t.doc_id, t.word, t.count, t.tf, round(t.tf * i.idf, 2) AS tf_idf
FROM doc_tf t JOIN idf i ON t.word = i.word
""",
)
def tfidf_full(spark, sf_dir):
    """J1: the full TF-IDF pipeline — flagship query."""
    return T.tfidf(load_table(spark, sf_dir, "documents"))


@register(
    "task1_dictionary",
    oracle=f"""
WITH {TOKS_CTE},
counts AS (SELECT word, count(*) AS count FROM toks GROUP BY word),
ranked AS (
    SELECT word, count,
           row_number() OVER (ORDER BY count DESC, word ASC) - 1 AS rank
    FROM counts
)
SELECT upper(word) AS word, rank, count
FROM ranked WHERE rank < {T.DICTIONARY_CAP}
""",
)
def task1_dictionary(spark, sf_dir):
    """A1 + W1 + W3 + P7: corpus dictionary with frequency ranks."""
    return T.task1_dictionary(load_table(spark, sf_dir, "documents"))


@register(
    "task1_probe",
    oracle=f"""
WITH {TOKS_CTE},
counts AS (SELECT word, count(*) AS count FROM toks GROUP BY word),
ranked AS (
    SELECT word, count,
           row_number() OVER (ORDER BY count DESC, word ASC) - 1 AS rank
    FROM counts
)
SELECT upper(word) AS word, rank, count
FROM ranked
WHERE rank < {T.DICTIONARY_CAP}
  AND upper(word) IN ('JOIN', 'HASH', 'STREAM', 'WINDOW', 'DUP')
""",
)
def task1_probe(spark, sf_dir):
    """P8/J2: literal IN-set probe filter on the dictionary.

    Probe words are drawn from the testdata vocabulary so the check is
    non-vacuous (>0 rows); the reference's own literal list
    (Main.java:99-103) is registered separately as
    ``task1_probe_reference``."""
    return T.task1_probe(
        load_table(spark, sf_dir, "documents"), probe_words=T.CORPUS_PROBE_WORDS
    )


# task1_probe_reference (the reference's literal 5-word list) registers
# in queries.analytics_queries so its inherently-empty result does not
# occupy a slot in the driver's bounded correctness window.


@register(
    "corpus_doc_count",
    oracle="SELECT count(*) AS n_docs FROM documents",
)
def corpus_doc_count(spark, sf_dir):
    """A4: total-document counter (the reference's AtomicLong)."""
    return load_table(spark, sf_dir, "documents").select(
        F.count("*").alias("n_docs")
    )
