"""Similarity search over embedding columns (array<float>).

  * brute-force cosine top-k — the exact baseline: broadcast the query
    set, score every (query, candidate) pair JVM-side with
    higher-order functions, per-query top-k via window. Scales linearly
    in corpus size × |queries|; at 100 TB this is the "small query set
    against big corpus" path and is embarrassingly parallel (no
    shuffle until the final per-query top-k, which is tiny).
  * random-hyperplane LSH ANN — the scale path: deterministic
    pseudo-random hyperplanes (hash-derived ±1 components) bucket
    vectors by sign pattern; candidates share a bucket with the query;
    exact rerank inside buckets. Approximate by construction →
    rows-only correctness check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from wikipedia_data_pipeline_spark.functions import cosine_similarity

# Bucket count is 2^planes; tune to corpus size (buckets ≈ n/avg_bucket).
# 4 planes → 16 buckets suits the 500-2000-vector testdata; a web-scale
# corpus would use 16-24 planes plus multi-probe.
ANN_PLANES = 4


def cosine_topk(
    embeddings: DataFrame, query_ids: list[int], k: int = 10
) -> DataFrame:
    """Exact top-k neighbors by cosine for each query vector (self
    excluded). Deterministic order: (query_id, cos desc, vec_id)."""
    q = embeddings.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    scored = (
        embeddings.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            cosine_similarity(F.col("q_emb"), F.col("embedding")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "vec_id", "cos", "rnk")
    )


def _bucket_expr(emb_col, dim: int, planes: int = ANN_PLANES):
    """Sign-pattern bucket id from deterministic ±1 hyperplanes.

    plane p component j = +1 if xxhash64(p*dim+j) has low bit set else
    -1; bucket bit p = [dot(plane_p, v) > 0]. Pure expressions — no UDF,
    no randomness at runtime."""
    def plane_sign(p: int):
        return lambda j: F.when(
            F.xxhash64(F.lit(p * dim) + j).bitwiseAND(F.lit(1)) == 1, 1.0
        ).otherwise(-1.0)

    bucket = F.lit(0).cast("long")
    for p in range(planes):
        dot = F.aggregate(
            F.zip_with(
                emb_col,
                F.transform(F.sequence(F.lit(0), F.lit(dim - 1)), plane_sign(p)),
                lambda x, s: x.cast("double") * s,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def _probe_masks(planes: int, radius: int) -> list[int]:
    """All XOR masks over ``planes`` bits with popcount <= radius."""
    return [m for m in range(1 << planes) if bin(m).count("1") <= radius]


def ann_lsh_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    dim: int = 64,
    planes: int = ANN_PLANES,
    probe_radius: int = 1,
) -> DataFrame:
    """Approximate top-k: exact rerank restricted to the query's LSH
    bucket neighborhood. Recall < 1 by design (rows-only check); the
    point is the plan shape — bucket equi-join instead of full cross
    product.

    Multi-probe: each query probes every bucket within Hamming distance
    ``probe_radius`` of its own sign pattern (the classic multi-probe
    LSH recall lever) — the query side explodes by ``C(planes, <=r)``
    rows, still broadcast-tiny, while the corpus side stays one bucket
    per vector."""
    with_bucket = embeddings.withColumn(
        "bucket", _bucket_expr(F.col("embedding"), dim, planes)
    )
    masks = F.array(*[F.lit(m) for m in _probe_masks(planes, probe_radius)])
    q = (
        with_bucket.filter(F.col("vec_id").isin(query_ids))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.explode(
                F.transform(masks, lambda m: F.col("bucket").bitwiseXOR(m))
            ).alias("q_bucket"),
        )
    )
    scored = (
        with_bucket.join(
            F.broadcast(q), F.col("bucket") == F.col("q_bucket"), "inner"
        )
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            cosine_similarity(F.col("q_emb"), F.col("embedding")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "vec_id", "cos", "rnk")
    )


IVF_CENTROID_MOD = 37  # ~n/37 coarse centroids; tune to sqrt(n) at scale
IVF_NPROBE = 2


def ann_ivf_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    centroid_mod: int = IVF_CENTROID_MOD,
    nprobe: int = IVF_NPROBE,
) -> DataFrame:
    """IVF-style ANN: coarse-quantize the corpus to its nearest centroid
    (centroids = a deterministic hash-sample of the corpus itself), then
    answer each query by exact rerank inside its ``IVF_NPROBE`` closest
    centroid cells.

    Plan shape at scale: the centroid table is tiny and broadcast twice
    (assignment pass + query probe); the corpus is scanned once to build
    the cell assignment, and the candidate join is an equi-join on
    centroid_id — no cross product against the corpus. Recall < 1 by
    construction → rows-only correctness check, like the LSH variant.
    """
    centroids = embeddings.filter(
        F.col("vec_id") % centroid_mod == 0
    ).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("c_emb")
    )

    def assign(df: DataFrame, id_out: str, keep_rank: int) -> DataFrame:
        scored = df.crossJoin(F.broadcast(centroids)).select(
            df["*"],
            "centroid_id",
            cosine_similarity(F.col("embedding"), F.col("c_emb")).alias("c_cos"),
        )
        w = Window.partitionBy("vec_id").orderBy(
            F.desc("c_cos"), F.asc("centroid_id")
        )
        return (
            scored.withColumn("c_rnk", F.row_number().over(w))
            .filter(F.col("c_rnk") <= keep_rank)
            .select(df["*"], F.col("centroid_id").alias(id_out))
        )

    corpus = assign(embeddings, "cell", 1)
    queries = assign(
        embeddings.filter(F.col("vec_id").isin(query_ids)), "cell", nprobe
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        "cell",
    )
    scored = (
        corpus.join(F.broadcast(queries), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            cosine_similarity(F.col("q_emb"), F.col("embedding")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "vec_id", "cos", "rnk")
    )


def ann_recall(exact: DataFrame, approx: DataFrame) -> DataFrame:
    """Per-query recall@k of an ANN result against the exact top-k.

    Pure DataFrame join of the two result sets (VERDICT.md round-1
    item 4): hits = |approx ∩ exact| per query via a broadcast-size
    semi-join on (query_id, vec_id); recall = hits / |exact top-k|.
    Both inputs are tiny (|queries| × k rows), so this is driver-cheap
    at any corpus scale.
    """
    e = exact.select("query_id", "vec_id")
    hits = (
        e.join(approx.select("query_id", "vec_id"), ["query_id", "vec_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count("*").alias("hits"))
    )
    possible = e.groupBy("query_id").agg(F.count("*").alias("k_possible"))
    return (
        possible.join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("hits"), F.lit(0)).cast("long").alias("hits"),
            F.col("k_possible").cast("long").alias("k_possible"),
            F.round(
                F.coalesce(F.col("hits"), F.lit(0)) / F.col("k_possible"), 4
            ).alias("recall"),
        )
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame, threshold: float = 0.45
) -> DataFrame:
    """All-pairs cosine near-dup detection (exact; the embedding analog
    of brute-force Jaccard dedup)."""
    a = embeddings.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a")
    )
    b = embeddings.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b")
    )
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .withColumn("cos", cosine_similarity(F.col("emb_a"), F.col("emb_b")))
        .filter(F.col("cos") >= threshold)
        .select("vec_a", "vec_b", "cos")
    )
