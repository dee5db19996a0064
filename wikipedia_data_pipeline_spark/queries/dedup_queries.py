"""Dedup query registrations (operators.dedup) with exact oracles.

The near-dup oracles are the brute-force all-pairs shingle-Jaccard in
SQL; the Spark side answers via three different physical strategies
(brute force, MinHash-LSH, SimHash blocking) that all converge to the
same verified pair set — LSH params are chosen so the false-negative
probability at the 0.5 threshold is < 1e-7, and SimHash's 16×4-bit
banding catches any pair within hamming 15 by pigeonhole.
"""

from __future__ import annotations

from wikipedia_data_pipeline_spark.operators import dedup as D
from wikipedia_data_pipeline_spark.registry import register
from wikipedia_data_pipeline_spark.sources.tables import load_table

JACCARD_THRESHOLD = 0.5

SHINGLE_PAIRS_SQL = """
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
sh AS (
  SELECT doc_id,
         CASE WHEN len(t) >= 3
              THEN list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                                 FOR i IN generate_series(1, len(t) - 2)])
              ELSE CAST([] AS VARCHAR[]) END AS s
  FROM tok
),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
           / len(list_distinct(list_concat(a.s, b.s))) AS jaccard
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, jaccard FROM pairs WHERE jaccard >= 0.5
"""


@register(
    "dedup_exact",
    oracle="""
SELECT md5(text) AS content_hash, min(doc_id) AS doc_id_kept,
       count(*) AS n_copies
FROM documents GROUP BY md5(text)
""",
)
def dedup_exact(spark, sf_dir):
    """Exact dedup: hash group-by, representative = min doc_id."""
    return D.exact_duplicates(load_table(spark, sf_dir, "documents"))


@register("dedup_ngram_jaccard_brute", oracle=SHINGLE_PAIRS_SQL)
def dedup_ngram_jaccard_brute(spark, sf_dir):
    """All-pairs 3-gram shingle Jaccard ≥ 0.5 (exact path)."""
    return D.brute_force_pairs(
        load_table(spark, sf_dir, "documents"), JACCARD_THRESHOLD
    )


@register("dedup_minhash_lsh", oracle=SHINGLE_PAIRS_SQL)
def dedup_minhash_lsh(spark, sf_dir):
    """MinHash(128) + 32×4 LSH banding + exact-Jaccard verify — the
    scale path; must equal the brute-force oracle."""
    return D.minhash_lsh_pairs(
        load_table(spark, sf_dir, "documents"), JACCARD_THRESHOLD
    )


@register("dedup_simhash", oracle=SHINGLE_PAIRS_SQL)
def dedup_simhash(spark, sf_dir):
    """SimHash 64-bit fingerprint blocking + exact-Jaccard verify."""
    return D.simhash_pairs(
        load_table(spark, sf_dir, "documents"), JACCARD_THRESHOLD
    )


@register(
    "dedup_cluster_select",
    oracle="""
WITH RECURSIVE tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
sh AS (
  SELECT doc_id,
         CASE WHEN len(t) >= 3
              THEN list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                                 FOR i IN generate_series(1, len(t) - 2)])
              ELSE CAST([] AS VARCHAR[]) END AS s
  FROM tok
),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
          / len(list_distinct(list_concat(a.s, b.s))) >= 0.5
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
reach(doc_id, label) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.doc_id
)
SELECT doc_id, min(label) AS cluster_id, doc_id = min(label) AS keep
FROM reach GROUP BY doc_id
""",
    eager=True,
)
def dedup_cluster_select(spark, sf_dir):
    """Connected components over verified MinHash-LSH near-dup pairs →
    one kept representative (min doc_id) per duplicate cluster. The
    oracle recomputes components from the brute-force pair set with a
    recursive CTE — Spark's iterative min-label propagation must agree
    exactly."""
    docs = load_table(spark, sf_dir, "documents")
    return D.near_dup_clusters(docs, D.minhash_lsh_pairs(docs, JACCARD_THRESHOLD))
