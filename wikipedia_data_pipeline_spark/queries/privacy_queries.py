"""Privacy screens for release gating: k-anonymity over
quasi-identifier tuples and l-diversity of the sensitive column within
each equivalence class. Split out of profiling_queries (round 7)."""

from __future__ import annotations

from pyspark.sql import functions as F

from wikipedia_data_pipeline_spark.operators import dedup as D
from wikipedia_data_pipeline_spark.operators import profiling as P
from wikipedia_data_pipeline_spark.operators.sampling import SQL_DET_HASH
from wikipedia_data_pipeline_spark.registry import register
from wikipedia_data_pipeline_spark.sources.tables import load_table


@register(
    "privacy_k_anonymity",
    oracle="""
SELECT lang, source, n_chars // 100 AS len_bucket,
       count(*) AS group_size,
       count(*) < 5 AS reidentification_risk
FROM documents
GROUP BY 1, 2, 3
ORDER BY group_size ASC, lang, source, len_bucket
""",
)
def privacy_k_anonymity(spark, sf_dir):
    """k-anonymity audit over the quasi-identifier tuple (lang, source,
    length bucket): any equivalence class smaller than k=5 is a
    re-identification risk the release pipeline must generalize or
    suppress. One hash aggregate over the quasi-identifiers — the
    audit costs one scan at any corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy(
            "lang",
            "source",
            F.expr("n_chars div 100").alias("len_bucket"),
        )
        .agg(F.count(F.lit(1)).alias("group_size"))
        .withColumn("reidentification_risk", F.col("group_size") < 5)
        .orderBy(
            F.asc("group_size"), F.asc("lang"), F.asc("source"), F.asc("len_bucket")
        )
    )


@register(
    "privacy_l_diversity",
    oracle="""
WITH g AS (
  SELECT lang, source, count(*) AS group_size,
         count(DISTINCT event_cnt_bucket) AS l_distinct
  FROM (
    SELECT d.lang, d.source, d.doc_id,
           d.n_chars // 200 AS event_cnt_bucket
    FROM documents d
  ) q
  GROUP BY lang, source
)
SELECT lang, source, group_size, l_distinct,
       l_distinct < 3 AS homogeneity_risk
FROM g
ORDER BY l_distinct ASC, group_size ASC, lang, source
""",
)
def privacy_l_diversity(spark, sf_dir):
    """l-diversity audit, the companion check k-anonymity misses: an
    equivalence class over the quasi-identifiers (lang, source) whose
    SENSITIVE attribute (length bucket standing in for one) takes
    fewer than l=3 distinct values is vulnerable to homogeneity
    attacks even when the class itself is large. One aggregate with a
    distinct count per class — same one-scan cost envelope as the
    k-anonymity audit it pairs with."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "lang",
            "source",
            F.expr("n_chars div 200").alias("event_cnt_bucket"),
        )
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("group_size"),
            F.countDistinct("event_cnt_bucket").alias("l_distinct"),
        )
        .withColumn("homogeneity_risk", F.col("l_distinct") < 3)
        .orderBy(
            F.asc("l_distinct"),
            F.asc("group_size"),
            F.asc("lang"),
            F.asc("source"),
        )
    )
