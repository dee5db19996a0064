from __future__ import annotations

import math

from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from wikipedia_data_pipeline_spark.functions import cosine_similarity
from wikipedia_data_pipeline_spark.operators import similarity as S

SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("label", IntegerType()),
    ]
)


def embeddings(spark):
    rows = [
        (0, [1.0, 0.0, 0.0], 0),
        (1, [0.9, 0.1, 0.0], 0),   # closest to 0
        (2, [0.0, 1.0, 0.0], 1),
        (3, [-1.0, 0.0, 0.0], 1),  # antipode of 0
        (4, [0.7, 0.7, 0.0], 2),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_cosine_expression(spark):
    df = embeddings(spark)
    a = df.filter("vec_id = 0").select(F.col("embedding").alias("ea"))
    b = df.filter("vec_id = 4").select(F.col("embedding").alias("eb"))
    cos = (
        a.crossJoin(b)
        .select(cosine_similarity(F.col("ea"), F.col("eb")).alias("c"))
        .first()
        .c
    )
    assert abs(cos - math.cos(math.pi / 4)) < 1e-6  # float32 inputs


def test_cosine_topk_ordering(spark):
    out = S.cosine_topk(embeddings(spark), [0], k=4).orderBy("rnk").collect()
    assert [r.vec_id for r in out] == [1, 4, 2, 3]
    assert [r.rnk for r in out] == [1, 2, 3, 4]
    assert out[0].cos > 0.99 and out[3].cos == -1.0


def test_ann_lsh_subset_of_exact_scores(spark):
    """ANN results are exact cosines, just over a candidate subset."""
    exact = {
        (r.query_id, r.vec_id): r.cos
        for r in S.cosine_topk(embeddings(spark), [0], k=4).collect()
    }
    for r in S.ann_lsh_topk(embeddings(spark), [0], k=4, dim=3).collect():
        key = (r.query_id, r.vec_id)
        if key in exact:
            assert r.cos == exact[key]


def test_embedding_near_dup_threshold(spark):
    out = {
        (r.vec_a, r.vec_b)
        for r in S.embedding_near_dup_pairs(embeddings(spark), 0.99).collect()
    }
    assert out == {(0, 1)}
