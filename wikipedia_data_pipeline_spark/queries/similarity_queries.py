"""Similarity-search query registrations (operators.similarity).

The cosine expression (sequential double fold over zip_with) is
bit-identical to DuckDB's list_sum(list_transform(list_zip(...))) —
verified empirically — so exact oracles work for the brute-force paths.
The LSH-bucketed ANN is approximate by construction → rows-only.
"""

from __future__ import annotations

from wikipedia_data_pipeline_spark.operators import similarity as S
from wikipedia_data_pipeline_spark.registry import register
from wikipedia_data_pipeline_spark.sources.tables import load_table

QUERY_IDS = [0, 1, 2, 3, 4]
TOP_K = 10

COS_SQL = (
    "list_sum(list_transform(list_zip({a}, {b}),"
    " x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))"
    " / (sqrt(list_sum(list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    " * sqrt(list_sum(list_transform({b}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))"
)


@register(
    "ann_cosine_topk_brute",
    oracle=f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings
  WHERE vec_id IN (0, 1, 2, 3, 4)
),
scored AS (
  SELECT query_id, e.vec_id,
         {COS_SQL.format(a='q.q_emb', b='e.embedding')} AS cos
  FROM embeddings e CROSS JOIN q WHERE e.vec_id != q.query_id
),
ranked AS (
  SELECT query_id, vec_id, cos,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY cos DESC, vec_id) AS BIGINT) AS rnk
  FROM scored
)
SELECT query_id, vec_id, cos, rnk FROM ranked WHERE rnk <= {TOP_K}
""",
)
def ann_cosine_topk_brute(spark, sf_dir):
    """Exact top-10 cosine neighbors for 5 query vectors."""
    return S.cosine_topk(
        load_table(spark, sf_dir, "embeddings"), QUERY_IDS, TOP_K
    )


@register("ann_cosine_topk_lsh")  # approximate → rows-only check
def ann_cosine_topk_lsh(spark, sf_dir):
    """LSH-bucketed ANN: same interface, bucket equi-join instead of
    cross product."""
    return S.ann_lsh_topk(
        load_table(spark, sf_dir, "embeddings"), QUERY_IDS, TOP_K
    )


@register("ann_cosine_topk_ivf")  # approximate → rows-only check
def ann_cosine_topk_ivf(spark, sf_dir):
    """IVF-bucketed ANN: nearest-centroid cells + nprobe=2 exact rerank."""
    return S.ann_ivf_topk(
        load_table(spark, sf_dir, "embeddings"), QUERY_IDS, TOP_K
    )


@register(
    "embedding_near_dup",
    oracle=f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       {COS_SQL.format(a='a.embedding', b='b.embedding')} AS cos
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE {COS_SQL.format(a='a.embedding', b='b.embedding')} >= 0.45
""",
)
def embedding_near_dup(spark, sf_dir):
    """All-pairs embedding-cosine near-dup pairs (cos ≥ 0.45)."""
    return S.embedding_near_dup_pairs(
        load_table(spark, sf_dir, "embeddings"), 0.45
    )
