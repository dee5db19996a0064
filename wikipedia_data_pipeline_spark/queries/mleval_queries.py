"""ML evaluation + feature preparation: exact AUC via rank-sum on the
hierarchical ordered_scan, decile gains/lift via global_ntile, feature
hashing, leave-one-out target encoding, embedding quantization/
centroid diagnostics, language-ID confusion audit, and entity/time
holdout splits. Split out of profiling_queries (round 7)."""

from __future__ import annotations

from pyspark.sql import functions as F

from wikipedia_data_pipeline_spark.operators import dedup as D
from wikipedia_data_pipeline_spark.operators import profiling as P
from wikipedia_data_pipeline_spark.operators.sampling import SQL_DET_HASH
from wikipedia_data_pipeline_spark.registry import register
from wikipedia_data_pipeline_spark.sources.tables import load_table


# ---- eval & sequence analytics --------------------------------------------

from wikipedia_data_pipeline_spark.queries.text_queries import _SCORES


@register(
    "text_langid_confusion",
    oracle=f"""
WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
s AS (SELECT doc_id, lang, {_SCORES} FROM t),
p AS (
  SELECT lang,
         CASE WHEN greatest(score_de, score_en, score_es, score_fr) = 0 THEN 'und'
              WHEN score_de = greatest(score_de, score_en, score_es, score_fr) THEN 'de'
              WHEN score_en = greatest(score_de, score_en, score_es, score_fr) THEN 'en'
              WHEN score_es = greatest(score_de, score_en, score_es, score_fr) THEN 'es'
              ELSE 'fr' END AS predicted_lang
  FROM s
)
SELECT lang, predicted_lang, count(*) AS n
FROM p GROUP BY lang, predicted_lang
""",
)
def text_langid_confusion(spark, sf_dir):
    """Classifier-eval confusion matrix: metadata language label vs
    the stopword-overlap language-ID prediction, counted per (label,
    prediction) cell — the accuracy report a pipeline runs on every
    heuristic gate. One narrow scoring map + one hash agg."""
    from wikipedia_data_pipeline_spark.operators import textstats as TS5

    return (
        TS5.language_id(load_table(spark, sf_dir, "documents"))
        .groupBy("lang", "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )


from wikipedia_data_pipeline_spark.queries.similarity_queries import COS_SQL


@register(
    "embedding_centroid_distances",
    oracle=f"""
WITH comp AS (
  SELECT label, g - 1 AS pos,
         CAST(sum(CAST(CAST(embedding[g] AS DOUBLE) AS DECIMAL(18,6)))
              AS DOUBLE) / count(*) AS mean_x
  FROM embeddings, unnest(generate_series(1, len(embedding))) AS u(g)
  GROUP BY label, pos
),
cent AS (
  SELECT label, list(mean_x ORDER BY pos) AS c FROM comp GROUP BY label
)
SELECT a.label AS label_a, b.label AS label_b,
       {COS_SQL.format(a='a.c', b='b.c')} AS cos
FROM cent a JOIN cent b ON a.label < b.label
""",
)
def embedding_centroid_distances(spark, sf_dir):
    """Label-centroid separation matrix: decimal-exact centroid
    components (the label_centroids construction) assembled into
    ordered arrays, then pairwise cosine via the deterministic
    sequential fold — the cluster-separability report behind embedding
    QA. The pair join runs over |labels| rows; everything heavy is the
    one component aggregation."""
    from wikipedia_data_pipeline_spark.functions import cosine_similarity

    emb = load_table(spark, sf_dir, "embeddings")
    comp = (
        emb.select("label", F.posexplode("embedding").alias("pos", "x"))
        .groupBy("label", F.col("pos").cast("long").alias("pos"))
        .agg(
            (
                F.sum(F.col("x").cast("double").cast("decimal(18,6)"))
                .cast("double")
                / F.count("*")
            ).alias("mean_x")
        )
    )
    cent = comp.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "mean_x"))),
            lambda s: s["mean_x"],
        ).alias("c")
    )
    a = cent.select(
        F.col("label").alias("label_a"), F.col("c").alias("ca")
    )
    b = cent.select(
        F.col("label").alias("label_b"), F.col("c").alias("cb")
    )
    return (
        a.join(F.broadcast(b), F.col("label_a") < F.col("label_b"))
        .select(
            "label_a",
            "label_b",
            cosine_similarity(F.col("ca"), F.col("cb")).alias("cos"),
        )
    )


_US_PER_DAY = 86_400_000_000


@register(
    "sample_time_split_events",
    oracle=f"""
WITH t0 AS (SELECT min(epoch_us(ts)) AS ts0 FROM events)
SELECT event_id, user_id,
       (epoch_us(ts) - ts0) // {_US_PER_DAY} AS day_idx,
       CASE WHEN (epoch_us(ts) - ts0) // {_US_PER_DAY} < 24 THEN 'train'
            WHEN (epoch_us(ts) - ts0) // {_US_PER_DAY} < 27 THEN 'val'
            ELSE 'test' END AS split
FROM events, t0
""",
)
def sample_time_split_events(spark, sf_dir):
    """Temporal train/val/test split of the event stream: day index
    from the stream's own epoch start, first 24 days train / next 3
    val / rest test. For forecasting-style models a HASH split leaks
    the future into training — the cut must be on time. The global min
    is a 1-row aggregate broadcast onto a narrow map; integer-µs
    arithmetic keeps the assignment exact and engine-portable."""
    ev = load_table(spark, sf_dir, "events")
    t0 = ev.agg(F.min("ts").alias("ts0"))
    day_idx = F.expr(f"(ts - ts0) div {_US_PER_DAY}")
    return ev.crossJoin(F.broadcast(t0)).select(
        "event_id",
        "user_id",
        day_idx.alias("day_idx"),
        F.when(day_idx < 24, "train")
        .when(day_idx < 27, "val")
        .otherwise("test")
        .alias("split"),
    )


# --- ML feature prep + privacy screen (round 5) -------------------------

_FH_DIM = 64


@register(
    "features_hash_encoded",
    oracle=f"""
WITH feats AS (
  SELECT doc_id, 'lang:' || lang AS f FROM documents
  UNION ALL
  SELECT doc_id, 'source:' || source AS f FROM documents
)
SELECT doc_id,
       CAST((({P.sql_cms_word_key('f')} % {P.CMS_PRE_MOD})
             * {P.CMS_SEEDS[0][0]} + {P.CMS_SEEDS[0][1]})
            % {P.CMS_HASH_MOD} % {_FH_DIM} AS BIGINT) AS feature_idx,
       CAST(count(*) AS BIGINT) AS feature_val
FROM feats
GROUP BY 1, 2
""",
)
def features_hash_encoded(spark, sf_dir):
    """The hashing trick (Weinberger et al. 2009): categorical columns
    → a fixed-width sparse feature space via a portable hash of
    'column:value', collisions summing — the encoder that needs NO
    vocabulary pass, no fit/transform state, and no driver-side
    dictionary, which is why it's the default categorical encoder at
    100 TB (a one-pass narrow map; new category values never change
    the schema). Output is the sparse (row, feature_idx, value)
    relation."""
    docs = load_table(spark, sf_dir, "documents")
    feats = docs.select(
        "doc_id", F.concat(F.lit("lang:"), F.col("lang")).alias("f")
    ).unionAll(
        docs.select(
            "doc_id", F.concat(F.lit("source:"), F.col("source")).alias("f")
        )
    )
    mult, add = P.CMS_SEEDS[0]
    idx = (
        (P.cms_word_key(F.col("f")) % P.CMS_PRE_MOD) * F.lit(mult) + F.lit(add)
    ) % P.CMS_HASH_MOD % _FH_DIM
    return (
        feats.select("doc_id", idx.cast("long").alias("feature_idx"))
        .groupBy("doc_id", "feature_idx")
        .agg(F.count(F.lit(1)).alias("feature_val"))
    )


@register(
    "features_target_encode_loo",
    oracle="""
WITH s AS (
  SELECT o_orderpriority,
         count(*) AS n,
         sum(CAST(o_totalprice AS DECIMAL(18,6))) AS tot
  FROM orders GROUP BY o_orderpriority
)
SELECT o_orderkey, o.o_orderpriority,
       CASE WHEN n > 1
            THEN CAST(tot - CAST(o_totalprice AS DECIMAL(18,6)) AS DOUBLE)
                 / (n - 1) END AS loo_target_mean
FROM orders o JOIN s ON o.o_orderpriority = s.o_orderpriority
""",
)
def features_target_encode_loo(spark, sf_dir):
    """Leave-one-out target encoding of a categorical column (category
    → mean target over the OTHER rows of the category — the standard
    leakage guard for target encoding). (Σ−y)/(n−1) needs only the
    per-category decimal-exact (n, Σ) broadcast back onto the fact
    rows: no window, no per-row re-aggregation, bit-reproducible."""
    orders = load_table(spark, sf_dir, "orders")
    dec = F.col("o_totalprice").cast("decimal(18,6)")
    s = orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), F.sum(dec).alias("tot")
    )
    return orders.join(F.broadcast(s), "o_orderpriority").select(
        "o_orderkey",
        "o_orderpriority",
        F.when(
            F.col("n") > 1,
            (F.col("tot") - dec).cast("double") / (F.col("n") - 1),
        ).alias("loo_target_mean"),
    )


@register(
    "embedding_int8_quantize",
    oracle="""
WITH s AS (
  SELECT vec_id,
         list_max(list_transform(embedding,
                                 x -> abs(CAST(x AS DOUBLE)))) AS qscale,
         embedding
  FROM embeddings
)
SELECT vec_id, qscale,
       COALESCE(array_to_string(
         CASE WHEN qscale > 0
              THEN list_transform(embedding,
                     x -> CAST(round(CAST(x AS DOUBLE) * 127 / qscale, 0)
                               AS INTEGER))
              ELSE list_transform(embedding, x -> 0) END, ','), '') AS qvec
FROM s
""",
)
def embedding_int8_quantize(spark, sf_dir):
    """Per-vector symmetric int8 quantization (qᵢ = round(127·xᵢ/max|x|)
    plus the one float scale) — the 4× compression applied to embedding
    corpora before ANN serving. A narrow higher-order-function map, no
    shuffle, no UDF: at 100 TB this halves-twice the bytes every
    downstream similarity scan reads, which is usually worth more than
    any CPU optimization. Zero vectors quantize to zeros (guarded
    division)."""
    emb = load_table(spark, sf_dir, "embeddings")
    xd = lambda x: x.cast("double")  # noqa: E731
    qscale = F.array_max(F.transform(F.col("embedding"), lambda x: F.abs(xd(x))))
    s = emb.select("vec_id", qscale.alias("qscale"), "embedding")
    qvec = F.when(
        F.col("qscale") > 0,
        F.transform(
            F.col("embedding"),
            lambda x: F.round(xd(x) * 127 / F.col("qscale"), 0).cast("int"),
        ),
    ).otherwise(F.transform(F.col("embedding"), lambda x: F.lit(0)))
    # string-join, not a raw array column: the driver's pandas
    # canonicalizer cannot hash list cells (r9 red row). No final
    # orderBy — the driver compares order-insensitively.
    qvec_str = F.array_join(F.transform(qvec, lambda v: v.cast("string")), ",")
    return s.select("vec_id", "qscale", qvec_str.alias("qvec"))


@register("embedding_pca_project")  # eigensolver output: no SQL oracle
def embedding_pca_project(spark, sf_dir):
    """Distributed PCA to 2 components: Arrow-batch NumPy partials →
    d²-row aggregate → driver-side eigh on the model-sized covariance →
    broadcast-literal projection map. See operators/similarity.py:
    pca_project for the moments/solve/broadcast boundary."""
    from wikipedia_data_pipeline_spark.operators.similarity import pca_project

    emb = load_table(spark, sf_dir, "embeddings")
    return pca_project(emb, k=2).orderBy("vec_id")


@register(
    "sample_holdout_users",
    oracle=f"""
WITH u AS (SELECT DISTINCT user_id FROM events),
assign AS (
  SELECT user_id,
         {SQL_DET_HASH.format(col='user_id')} % 100 AS bucket
  FROM u
)
SELECT e.event_id, e.user_id,
       CASE WHEN bucket < 80 THEN 'train' ELSE 'holdout' END AS split
FROM events e JOIN assign a ON e.user_id = a.user_id
""",
)
def sample_holdout_users(spark, sf_dir):
    """ENTITY-level holdout: the split key is the user, not the event —
    splitting event rows directly leaks every held-out user's behavior
    into training through their other events. Same portable arithmetic
    hash as the document splits, assigned once per user and joined
    back (broadcast: the user relation is cardinality-bounded)."""
    from wikipedia_data_pipeline_spark.operators.sampling import det_hash

    ev = load_table(spark, sf_dir, "events")
    assign = (
        ev.select("user_id")
        .distinct()
        .select(
            "user_id", (det_hash("user_id") % 100).alias("bucket")
        )
    )
    return ev.join(F.broadcast(assign), "user_id").select(
        "event_id",
        "user_id",
        F.when(F.col("bucket") < 80, "train")
        .otherwise("holdout")
        .alias("split"),
    )


# ---------------------------------------------------------------------------
# Embedding label-outlier screen (mislabeled-data candidates)
# ---------------------------------------------------------------------------

from wikipedia_data_pipeline_spark.queries.similarity_queries import COS_SQL

_LABEL_OUTLIER_ORACLE = f"""
WITH comp AS (
  SELECT label, g - 1 AS pos,
         CAST(sum(CAST(CAST(embedding[g] AS DOUBLE) AS DECIMAL(18,6)))
              AS DOUBLE) / count(*) AS mean_x
  FROM embeddings, unnest(generate_series(1, len(embedding))) AS u(g)
  GROUP BY label, pos
),
cent AS (
  SELECT label, list(mean_x ORDER BY pos) AS c FROM comp GROUP BY label
),
scored AS (
  SELECT e.vec_id, e.label,
         {COS_SQL.format(a='e.embedding', b='cent.c')} AS cos_to_centroid,
         row_number() OVER (
           PARTITION BY e.label
           ORDER BY {COS_SQL.format(a='e.embedding', b='cent.c')}, e.vec_id
         ) AS rn
  FROM embeddings e JOIN cent ON e.label = cent.label
)
SELECT vec_id, label, cos_to_centroid, CAST(rn AS BIGINT) AS outlier_rank
FROM scored WHERE rn <= 3
"""


@register("embedding_label_outliers", oracle=_LABEL_OUTLIER_ORACLE)
def embedding_label_outliers(spark, sf_dir):
    """Mislabeled-data screen: the 3 vectors per label FARTHEST from
    their own label centroid (lowest cosine) — the embedding-QA
    worklist human review starts from (a vector far from its class
    center is a labeling error, an outlier, or a class in need of
    splitting).

    Centroids use the decimal-exact component construction shared with
    `embedding_label_centroids`; each vector's cosine runs as the
    deterministic sequential fold (JVM higher-order functions, no
    UDF), and the per-label ranking breaks ties by vec_id. The
    centroid relation is |labels|-sized and broadcast; one scan of the
    vectors scores everything.
    """
    from pyspark.sql import Window

    from wikipedia_data_pipeline_spark.functions import cosine_similarity

    emb = load_table(spark, sf_dir, "embeddings")
    comp = (
        emb.select("label", F.posexplode("embedding").alias("pos", "x"))
        .groupBy("label", F.col("pos").cast("long").alias("pos"))
        .agg(
            (
                F.sum(F.col("x").cast("double").cast("decimal(18,6)"))
                .cast("double")
                / F.count("*")
            ).alias("mean_x")
        )
    )
    cent = comp.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "mean_x"))),
            lambda s: s["mean_x"],
        ).alias("c")
    )
    scored = emb.join(F.broadcast(cent), "label").select(
        "vec_id",
        "label",
        cosine_similarity(F.col("embedding"), F.col("c")).alias(
            "cos_to_centroid"
        ),
    )
    w = Window.partitionBy("label").orderBy("cos_to_centroid", "vec_id")
    return (
        scored.withColumn("outlier_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("outlier_rank") <= 3)
    )


@register(
    "ml_eval_auc_events",
    oracle=f"""
WITH scored AS (
  SELECT event_id, value AS score,
         CAST(({SQL_DET_HASH.format(col="user_id")}) % 2 AS BIGINT) AS label
  FROM events
),
rk AS (
  SELECT label,
         row_number() OVER (ORDER BY score, event_id) AS r
  FROM scored
),
s AS (
  SELECT CAST(sum(CASE WHEN label = 1 THEN r ELSE 0 END) AS BIGINT) AS rpos,
         CAST(sum(label) AS BIGINT) AS n_pos,
         CAST(count(*) - sum(label) AS BIGINT) AS n_neg
  FROM rk
),
topk AS (
  SELECT CAST(sum(label) AS BIGINT) AS hits
  FROM (SELECT label FROM scored ORDER BY score DESC, event_id LIMIT 100) q
)
SELECT s.n_pos, s.n_neg,
       CAST(s.rpos - s.n_pos * (s.n_pos + 1) // 2 AS DOUBLE)
         / (s.n_pos * s.n_neg) AS auc,
       CAST(topk.hits AS DOUBLE) / 100 AS precision_at_100
FROM s, topk
""",
)
def ml_eval_auc_events(spark, sf_dir):
    """Exact large-scale model-evaluation metrics — the audit a quality
    classifier over a 100 TB corpus needs without sampling: AUC from
    the Mann-Whitney rank-sum identity (positives' global rank sum,
    ranks via the hierarchical ordered_scan — no single-partition sort
    of the score column) and precision@100 via TakeOrderedAndProject.
    Scores are the event values, labels a deterministic hash parity
    (so AUC ≈ 0.5 by construction — it's the machinery under audit,
    not the model). Ties resolved by the (score, event_id) total
    order, making every rank — and therefore the statistic — integer-
    exact and bit-identical in both engines. The n_pos(n_pos+1)/2
    correction is computed with exact integer division (ranks.py's idiv
    discipline; DuckDB `//`) BEFORE the double cast — rpos and the
    triangular term individually exceed 2^53 near 1e8 rows, so only the
    difference (bounded by n_pos*n_neg) may safely become a double."""
    from wikipedia_data_pipeline_spark.operators.ranks import ordered_scan
    from wikipedia_data_pipeline_spark.operators.sampling import det_hash

    scored = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.col("value").alias("score"),
        (det_hash("user_id") % 2).cast("long").alias("label"),
    )
    rk = ordered_scan(scored, ["score", "event_id"], rank_col="r")
    s = rk.agg(
        F.sum(F.when(F.col("label") == 1, F.col("r")).otherwise(0))
        .cast("long")
        .alias("rpos"),
        F.sum("label").cast("long").alias("n_pos"),
        (F.count(F.lit(1)) - F.sum("label")).cast("long").alias("n_neg"),
    )
    topk = (
        scored.orderBy(F.desc("score"), F.asc("event_id"))
        .limit(100)
        .agg(F.sum("label").cast("long").alias("hits"))
    )
    # exact triangular number: n_pos*(n_pos+1) is always even, so the
    # idiv (via DECIMAL(38,0), like ranks.global_ntile) is lossless;
    # the rpos - tri difference is <= n_pos*n_neg, double-safe.
    prod = F.col("n_pos") * (F.col("n_pos") + 1)
    tri = ((prod - prod % 2).cast("decimal(38,0)") / 2).cast("long")
    return (
        s.crossJoin(F.broadcast(topk))
        .select(
            "n_pos",
            "n_neg",
            (
                (F.col("rpos") - tri).cast("double")
                / (F.col("n_pos") * F.col("n_neg")).cast("double")
            ).alias("auc"),
            (F.col("hits").cast("double") / 100).alias("precision_at_100"),
        )
    )


@register(
    "ml_eval_gains_table",
    oracle=f"""
WITH scored AS (
  SELECT event_id, value AS score,
         CAST(({SQL_DET_HASH.format(col="user_id")}) % 2 AS BIGINT) AS label
  FROM events
),
deciled AS (
  SELECT label,
         ntile(10) OVER (ORDER BY score DESC, event_id) AS decile
  FROM scored
),
per AS (
  SELECT decile, count(*) AS n, CAST(sum(label) AS BIGINT) AS n_pos
  FROM deciled GROUP BY decile
),
tot AS (SELECT sum(n) AS nn, sum(n_pos) AS np FROM per)
SELECT p.decile, CAST(p.n AS BIGINT) AS n, p.n_pos,
       CAST(sum(p.n_pos) OVER (ORDER BY p.decile
                               ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS cum_pos,
       CAST(sum(p.n_pos) OVER (ORDER BY p.decile ROWS UNBOUNDED PRECEDING)
            AS DOUBLE) / t.np AS gain,
       (CAST(p.n_pos AS DOUBLE) / p.n)
         / (CAST(t.np AS DOUBLE) / t.nn) AS lift
FROM per p, tot t
""",
)
def ml_eval_gains_table(spark, sf_dir):
    """Decile gains/lift table for a score column — the campaign-
    targeting companion to ml_eval_auc_events: rows ranked by score
    fall into 10 equal tiles via global_ntile (the hierarchical NTILE —
    no single-partition window over the scored corpus), then per-tile
    capture and lift are pure integer/count arithmetic. The cumulative
    window runs over the 10-row decile relation. Hash-parity labels
    again: the machinery is under audit, so gain≈decile/10 and lift≈1
    are the expected fixed points."""
    from wikipedia_data_pipeline_spark.operators.ranks import global_ntile
    from wikipedia_data_pipeline_spark.operators.sampling import det_hash
    from pyspark.sql import Window

    scored = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.col("value").alias("score"),
        (det_hash("user_id") % 2).cast("long").alias("label"),
    )
    deciled = global_ntile(
        scored, [F.desc("score"), F.asc("event_id")], 10, "decile"
    )
    per = deciled.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("label").cast("long").alias("n_pos"),
    )
    tot = per.agg(
        F.sum("n").alias("nn"), F.sum("n_pos").alias("np")
    )
    w = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .withColumn("cum_pos", F.sum("n_pos").over(w).cast("long"))
        .select(
            "decile",
            "n",
            "n_pos",
            "cum_pos",
            (F.col("cum_pos").cast("double") / F.col("np")).alias("gain"),
            (
                (F.col("n_pos").cast("double") / F.col("n"))
                / (F.col("np").cast("double") / F.col("nn"))
            ).alias("lift"),
        )
    )


# --- Exact ranking evaluation: NDCG@10 (round 7) ------------------------
#
# Discount table 1/log2(i+1) for positions 1..10, frozen as shortest
# round-trip double literals so BOTH engines parse the identical IEEE
# values — transcendentals never cross engines unrounded (the
# quantize-once discipline of events_kl_user_vs_global, here
# degenerating to ten compile-time constants).

_NDCG_K = 10
_NDCG_DISC = [
    1.0, 0.6309297535714575, 0.5, 0.43067655807339306,
    0.38685280723454163, 0.3562071871080222, 0.3333333333333333,
    0.31546487678572877, 0.3010299956639812, 0.2890648263178879,
]
_SQL_DISC = "CASE rnk " + " ".join(
    f"WHEN {i + 1} THEN {d!r}" for i, d in enumerate(_NDCG_DISC)
) + " END"


@register(
    "ml_eval_ndcg_events",
    oracle=f"""
WITH scored AS (
  SELECT user_id, event_id, value AS score,
         CAST(({SQL_DET_HASH.format(col="event_id")}) % 3 AS BIGINT) AS rel
  FROM events
),
by_score AS (
  SELECT user_id, rel,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY score DESC, event_id) AS rnk
  FROM scored
),
dcg AS (
  SELECT user_id,
         CAST(sum(CAST(round(rel * ({_SQL_DISC}) * 1000000000) AS BIGINT))
              AS BIGINT) AS dcg_q
  FROM by_score WHERE rnk <= {_NDCG_K} GROUP BY user_id
),
by_rel AS (
  SELECT user_id, rel,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY rel DESC, event_id) AS rnk
  FROM scored
),
idcg AS (
  SELECT user_id,
         CAST(sum(CAST(round(rel * ({_SQL_DISC}) * 1000000000) AS BIGINT))
              AS BIGINT) AS idcg_q
  FROM by_rel WHERE rnk <= {_NDCG_K} GROUP BY user_id
),
per_user AS (
  SELECT dcg.user_id,
         CAST(round(CAST(dcg_q AS DOUBLE) / idcg_q * 1000000000) AS BIGINT)
           AS ndcg_q
  FROM dcg JOIN idcg ON dcg.user_id = idcg.user_id
  WHERE idcg_q > 0
)
SELECT CAST(count(*) AS BIGINT) AS n_users,
       CAST(CAST(sum(ndcg_q) AS BIGINT) AS DOUBLE) / count(*) / 1000000000
         AS mean_ndcg_at_10
FROM per_user
""",
)
def ml_eval_ndcg_events(spark, sf_dir):
    """Exact NDCG@10 — the ranking metric that completes the
    model-evaluation family (AUC: ml_eval_auc_events; gains/lift:
    ml_eval_gains_table): per user, events ranked by score with graded
    hash relevance (0/1/2), DCG against the per-user ideal ordering.
    Exactness: each rel*discount term is quantized once to nano-units
    and summed as BIGINT (per-user sums are order-free), the per-user
    NDCG ratio re-quantized before the corpus mean — so the one output
    double is bit-identical in both engines despite ten transcendental
    constants and two divisions. Scale: two user-partitioned top-10
    windows (user-sized groups, fully parallel) + one user-keyed join;
    nothing global but the final 1-row mean."""
    from pyspark.sql import Window

    from wikipedia_data_pipeline_spark.operators.sampling import det_hash

    k = _NDCG_K
    disc = F.element_at(
        F.array(*[F.lit(d) for d in _NDCG_DISC]), F.col("rnk").cast("int")
    )
    term = F.round(F.col("rel") * disc * 1_000_000_000).cast("long")
    scored = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.col("value").alias("score"),
        (det_hash("event_id") % 3).cast("long").alias("rel"),
    )
    w_score = Window.partitionBy("user_id").orderBy(
        F.desc("score"), F.asc("event_id")
    )
    dcg = (
        scored.withColumn("rnk", F.row_number().over(w_score))
        .filter(F.col("rnk") <= k)
        .groupBy("user_id")
        .agg(F.sum(term).cast("long").alias("dcg_q"))
    )
    w_rel = Window.partitionBy("user_id").orderBy(
        F.desc("rel"), F.asc("event_id")
    )
    idcg = (
        scored.withColumn("rnk", F.row_number().over(w_rel))
        .filter(F.col("rnk") <= k)
        .groupBy("user_id")
        .agg(F.sum(term).cast("long").alias("idcg_q"))
    )
    per_user = (
        dcg.join(idcg, "user_id")
        .filter(F.col("idcg_q") > 0)
        .select(
            F.round(
                F.col("dcg_q").cast("double")
                / F.col("idcg_q")
                * 1_000_000_000
            )
            .cast("long")
            .alias("ndcg_q")
        )
    )
    return per_user.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        (
            F.sum("ndcg_q").cast("double")
            / F.count(F.lit(1))
            / 1_000_000_000
        ).alias("mean_ndcg_at_10"),
    )


@register(
    "features_woe_binning",
    oracle=f"""
WITH scored AS (
  SELECT event_id, value,
         CAST(({SQL_DET_HASH.format(col="user_id")}) % 2 AS BIGINT) AS label
  FROM events
),
binned AS (
  SELECT label,
         CAST(ntile(10) OVER (ORDER BY value, event_id) AS BIGINT) AS bin
  FROM scored
),
per AS (
  SELECT bin,
         CAST(sum(label) AS BIGINT) AS n_pos,
         CAST(count(*) - sum(label) AS BIGINT) AS n_neg
  FROM binned GROUP BY bin
),
tot AS (
  SELECT CAST(sum(n_pos) AS BIGINT) AS p, CAST(sum(n_neg) AS BIGINT) AS n
  FROM per
),
woe AS (
  SELECT bin, n_pos, n_neg,
         CAST(round(ln((CAST(n_pos AS DOUBLE) * t.n)
                       / (CAST(n_neg AS DOUBLE) * t.p)) * 1000000000)
              AS BIGINT) AS woe_q,
         CAST(n_pos AS DOUBLE) / t.p - CAST(n_neg AS DOUBLE) / t.n AS dp
  FROM per, tot t
  WHERE n_pos > 0 AND n_neg > 0
)
SELECT bin, n_pos, n_neg,
       CAST(woe_q AS DOUBLE) / 1000000000 AS woe,
       dp * (CAST(woe_q AS DOUBLE) / 1000000000) AS iv_term
FROM woe
""",
)
def features_woe_binning(spark, sf_dir):
    """Weight-of-Evidence / Information-Value binning — the
    credit-scoring encoder that turns a numeric feature into
    monotonic-risk bins: value deciles (global_ntile — the
    hierarchical NTILE, no single-partition sort of the fact table),
    per-bin WoE = ln(odds ratio) and its IV contribution. The ln is
    applied to an IDENTICAL double ratio built from exact integer
    counts and quantized once per bin to nano-nats (10 quantized
    transcendentals total — the events_kl_user_vs_global discipline),
    so the report replays exactly. Bins with a zero class are excluded
    in both engines (WoE undefined there). Completes the ML feature
    prep family: hashing trick, LOO target encoding, int8
    quantization, now supervised binning."""
    from wikipedia_data_pipeline_spark.operators.ranks import global_ntile
    from wikipedia_data_pipeline_spark.operators.sampling import det_hash

    scored = load_table(spark, sf_dir, "events").select(
        "event_id",
        "value",
        (det_hash("user_id") % 2).cast("long").alias("label"),
    )
    binned = global_ntile(
        scored, [F.asc("value"), F.asc("event_id")], 10, "bin"
    )
    per = binned.groupBy("bin").agg(
        F.sum("label").cast("long").alias("n_pos"),
        (F.count(F.lit(1)) - F.sum("label")).cast("long").alias("n_neg"),
    )
    tot = per.agg(
        F.sum("n_pos").cast("long").alias("p"),
        F.sum("n_neg").cast("long").alias("n"),
    )
    woe_q = (
        F.round(
            F.log(
                (F.col("n_pos").cast("double") * F.col("n"))
                / (F.col("n_neg").cast("double") * F.col("p"))
            )
            * 1_000_000_000
        )
    ).cast("long")
    dp = F.col("n_pos").cast("double") / F.col("p") - F.col(
        "n_neg"
    ).cast("double") / F.col("n")
    return (
        per.crossJoin(F.broadcast(tot))
        .filter((F.col("n_pos") > 0) & (F.col("n_neg") > 0))
        .select(
            "bin",
            "n_pos",
            "n_neg",
            (woe_q.cast("double") / 1_000_000_000).alias("woe"),
            (dp * (woe_q.cast("double") / 1_000_000_000)).alias("iv_term"),
        )
    )


@register(
    "ml_eval_calibration_bins",
    oracle=f"""
WITH ev AS (
  SELECT CAST(round(value * 1000000) AS BIGINT) AS v_u,
         CAST(({SQL_DET_HASH.format(col="user_id")}) % 2 AS BIGINT) AS label
  FROM events
),
rng AS (
  SELECT CAST(min(v_u) AS BIGINT) AS lo, CAST(max(v_u) AS BIGINT) AS hi
  FROM ev
),
binned AS (
  SELECT least(9, ((ev.v_u - rng.lo) * 10) // (rng.hi - rng.lo + 1)) AS bin,
         ev.v_u - rng.lo AS dv, ev.label, rng.hi - rng.lo AS rng_w
  FROM ev, rng
),
per AS (
  SELECT bin, CAST(max(rng_w) AS BIGINT) AS rng_w,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(label) AS BIGINT) AS n_pos,
         CAST(sum(dv) AS BIGINT) AS sum_dv
  FROM binned GROUP BY bin
),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM per)
SELECT bin, n, n_pos,
       CAST(n_pos AS DOUBLE) / n AS mean_label,
       CAST(sum_dv AS DOUBLE) / n / rng_w AS mean_score,
       abs(CAST(n_pos AS DOUBLE) / n
           - CAST(sum_dv AS DOUBLE) / n / rng_w)
         * CAST(n AS DOUBLE) / CAST(t.nn AS DOUBLE) AS ece_term
FROM per, tot t
ORDER BY bin
""",
)
def ml_eval_calibration_bins(spark, sf_dir):
    """Reliability table + Expected-Calibration-Error terms for a score
    column — the companion to ml_eval_auc_events/gains_table that asks
    not "does the score RANK well" but "does it mean what it says":
    per fixed-width score bin, mean predicted score vs observed
    positive rate, and the bin's |gap|·n/N contribution to ECE.

    Exactness: the score is quantized to integer micro-units
    (functions.cents_units' quantum — events.value is cent-quantized),
    the bin id is pure integer arithmetic against the broadcast global
    [lo, hi] range (least(9, (v-lo)*10 div (hi-lo+1)) — no float
    boundary can flip a row), and every per-bin statistic is an exact
    BIGINT sum; mean/ECE doubles come from single divisions of exact
    integers in a fixed order, so both engines emit identical bits.
    Hash-parity labels (the det_hash machinery under audit): mean_label
    ~= 0.5 per bin and ECE picks up |mean_score - 0.5| by construction.

    Scale shape: one scan -> hash agg to <=10 rows + one broadcast
    1-row range; sum_dv stays exact below 2^63 up to ~1.8e10 rows of
    full-range micro-unit scores (same 2^53-class bound family as
    cents_sum, documented there)."""
    from wikipedia_data_pipeline_spark.functions import cents_units
    from wikipedia_data_pipeline_spark.operators.sampling import det_hash

    ev = load_table(spark, sf_dir, "events").select(
        cents_units("value").alias("v_u"),
        (det_hash("user_id") % 2).cast("long").alias("label"),
    )
    rng = ev.agg(
        F.min("v_u").cast("long").alias("lo"),
        F.max("v_u").cast("long").alias("hi"),
    )
    binned = ev.crossJoin(F.broadcast(rng)).select(
        F.least(
            F.lit(9).cast("long"),
            F.expr("((v_u - lo) * 10) div (hi - lo + 1)"),
        ).alias("bin"),
        (F.col("v_u") - F.col("lo")).alias("dv"),
        "label",
        (F.col("hi") - F.col("lo")).alias("rng_w"),
    )
    per = binned.groupBy("bin").agg(
        F.max("rng_w").cast("long").alias("rng_w"),
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("label").cast("long").alias("n_pos"),
        F.sum("dv").cast("long").alias("sum_dv"),
    )
    # <=10 rows consumed by two branches (total + final) — persist so
    # the fact agg above runs once, not per branch
    from pyspark import StorageLevel

    from wikipedia_data_pipeline_spark.operators.ranks import track_persisted

    per = track_persisted(per.persist(StorageLevel.MEMORY_AND_DISK))
    tot = per.agg(F.sum("n").cast("long").alias("nn"))
    mean_label = F.col("n_pos").cast("double") / F.col("n")
    mean_score = (
        F.col("sum_dv").cast("double") / F.col("n") / F.col("rng_w")
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            "n",
            "n_pos",
            mean_label.alias("mean_label"),
            mean_score.alias("mean_score"),
            (
                F.abs(mean_label - mean_score)
                * F.col("n").cast("double")
                / F.col("nn").cast("double")
            ).alias("ece_term"),
        )
        .orderBy("bin")
    )


@register(
    "ml_eval_rater_kappa",
    oracle=f"""
WITH rated AS (
  SELECT CAST(({SQL_DET_HASH.format(col="event_id")}) % 3 AS BIGINT) AS r1,
         CAST(({SQL_DET_HASH.format(col="((event_id % 1000003) * 13 + 5)")}) % 10 AS BIGINT) AS flip,
         CAST(({SQL_DET_HASH.format(col="((event_id % 1000003) * 31 + 11)")}) % 3 AS BIGINT) AS alt
  FROM events
),
cells AS (
  SELECT r1, CASE WHEN flip < 7 THEN r1 ELSE alt END AS r2,
         CAST(count(*) AS BIGINT) AS n_cell
  FROM rated GROUP BY 1, 2
),
m1 AS (SELECT r1 AS k, CAST(sum(n_cell) AS BIGINT) AS n1 FROM cells GROUP BY 1),
m2 AS (SELECT r2 AS k, CAST(sum(n_cell) AS BIGINT) AS n2 FROM cells GROUP BY 1),
s AS (
  SELECT CAST(sum(CAST(m1.n1 AS DECIMAL(18,0)) * CAST(m2.n2 AS DECIMAL(18,0)))
              AS DECIMAL(38,0)) AS chance
  FROM m1 JOIN m2 USING (k)
),
t AS (
  SELECT CAST(sum(n_cell) AS BIGINT) AS n_items,
         CAST(sum(CASE WHEN r1 = r2 THEN n_cell ELSE 0 END) AS BIGINT) AS agree
  FROM cells
)
SELECT n_items,
       CAST(agree AS DOUBLE) / n_items AS observed_agreement,
       CAST(chance AS DOUBLE) / n_items / n_items AS expected_agreement,
       CAST(CAST(n_items AS DECIMAL(18,0)) * CAST(agree AS DECIMAL(18,0))
            - chance AS DOUBLE)
         / CAST(CAST(n_items AS DECIMAL(18,0)) * CAST(n_items AS DECIMAL(18,0))
                - chance AS DOUBLE) AS kappa
FROM t, s
""",
)
def ml_eval_rater_kappa(spark, sf_dir):
    """Cohen's kappa inter-rater agreement — the label-QA statistic for
    human/model annotation pipelines (does rater agreement beat the
    agreement their marginal label rates would produce by chance?).
    Two deterministic pseudo-raters over events: rater 1 labels by
    event-id hash into 3 classes; rater 2 copies rater 1 on ~70% of
    items (second hash stream) and re-draws from a third stream
    otherwise — expected kappa ~= 0.7 - 0.3/3 chance-corrected, a
    non-trivial fixed point that breaks if any hash stream drifts.

    Exactness: the 3x3 confusion matrix is exact BIGINT counts from
    ONE hash aggregate of the fact table; kappa's textbook
    (po - pe)/(1 - pe) is algebraically cleared of early divisions to
    (N*agree - sum_k n1_k*n2_k) / (N^2 - sum_k n1_k*n2_k) — both sides
    exact DECIMAL integers (products via DECIMAL(18,0) operands, big
    enough for N ~ 9e17) — so the single final double division is
    bit-identical across engines; po/pe doubles likewise come from
    fixed-order divisions of exact integers.

    Scale shape: scan -> 9-row hash agg; marginals/products are
    driver-tiny. The hash arguments are pre-reduced mod 1000003 before
    the *13/*31 stretches so the key expression can't overflow BIGINT
    at any event_id (DuckDB errors on overflow where the JVM wraps)."""
    from wikipedia_data_pipeline_spark.operators.sampling import det_hash

    ev = load_table(spark, sf_dir, "events")
    rated = ev.select(
        (det_hash("event_id") % 3).cast("long").alias("r1"),
        (det_hash((F.col("event_id") % 1000003) * 13 + 5) % 10)
        .cast("long")
        .alias("flip"),
        (det_hash((F.col("event_id") % 1000003) * 31 + 11) % 3)
        .cast("long")
        .alias("alt"),
    )
    cells = (
        rated.select(
            "r1",
            F.when(F.col("flip") < 7, F.col("r1"))
            .otherwise(F.col("alt"))
            .alias("r2"),
        )
        .groupBy("r1", "r2")
        .agg(F.count(F.lit(1)).cast("long").alias("n_cell"))
    )
    # 9-row confusion matrix consumed by FOUR branches (two marginals,
    # the chance product, the agree total) — persist so the fact agg
    # runs once, not per branch
    from pyspark import StorageLevel

    from wikipedia_data_pipeline_spark.operators.ranks import track_persisted

    cells = track_persisted(cells.persist(StorageLevel.MEMORY_AND_DISK))
    m1 = cells.groupBy(F.col("r1").alias("k")).agg(
        F.sum("n_cell").cast("long").alias("n1")
    )
    m2 = cells.groupBy(F.col("r2").alias("k")).agg(
        F.sum("n_cell").cast("long").alias("n2")
    )
    dec = "decimal(18,0)"
    s = (
        m1.join(m2, "k")
        .agg(
            F.sum(F.col("n1").cast(dec) * F.col("n2").cast(dec))
            .cast("decimal(38,0)")
            .alias("chance")
        )
    )
    t = cells.agg(
        F.sum("n_cell").cast("long").alias("n_items"),
        F.sum(F.when(F.col("r1") == F.col("r2"), F.col("n_cell")).otherwise(0))
        .cast("long")
        .alias("agree"),
    )
    n_dec = F.col("n_items").cast(dec)
    return t.crossJoin(F.broadcast(s)).select(
        "n_items",
        (F.col("agree").cast("double") / F.col("n_items")).alias(
            "observed_agreement"
        ),
        (
            F.col("chance").cast("double")
            / F.col("n_items")
            / F.col("n_items")
        ).alias("expected_agreement"),
        (
            (n_dec * F.col("agree").cast(dec) - F.col("chance")).cast(
                "double"
            )
            / (n_dec * n_dec - F.col("chance")).cast("double")
        ).alias("kappa"),
    )


@register(
    "ml_eval_fairness_gaps",
    oracle=f"""
WITH scored AS (
  SELECT CAST(({SQL_DET_HASH.format(col="((user_id % 1000003) * 17 + 3)")}) % 2 AS BIGINT) AS grp,
         CAST(({SQL_DET_HASH.format(col="user_id")}) % 2 AS BIGINT) AS label,
         CASE WHEN CAST(round(value * 1000000) AS BIGINT) >= 25000000
              THEN 1 ELSE 0 END AS yhat
  FROM events
),
per AS (
  SELECT grp,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN label = 1 AND yhat = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         CAST(sum(CASE WHEN label = 0 AND yhat = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         CAST(sum(CASE WHEN label = 0 AND yhat = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
         CAST(sum(CASE WHEN label = 1 AND yhat = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fn
  FROM scored GROUP BY grp
)
SELECT grp, n, tp, fp, tn, fn,
       CAST(tp AS DOUBLE) / (tp + fn) AS tpr,
       CAST(fp AS DOUBLE) / (fp + tn) AS fpr,
       CAST(tp + fp AS DOUBLE) / n AS positive_rate
FROM per
ORDER BY grp
""",
)
def ml_eval_fairness_gaps(spark, sf_dir):
    """Group-fairness audit of a thresholded classifier — per protected
    group, the exact confusion matrix and the three rates behind the
    standard criteria: positive_rate (demographic parity), tpr/fpr
    (equalized odds). Group and label come from INDEPENDENT hash
    streams over user_id (different affine stretches of the reduced
    key, the ml_eval_rater_kappa discipline) and the prediction is a
    fixed micro-unit threshold (value >= 25.0) — so near-zero gaps
    between the two group rows are the designed fixed point, and any
    drift flags the hash or threshold plumbing, not the users.

    Exactness: counts are one hash aggregate of exact BIGINTs; the
    rates are single fixed-order divisions of those integers — both
    engines emit identical bits. Scale: scan -> 2-row agg, nothing
    else."""
    from wikipedia_data_pipeline_spark.functions import cents_units
    from wikipedia_data_pipeline_spark.operators.sampling import det_hash

    scored = load_table(spark, sf_dir, "events").select(
        (det_hash((F.col("user_id") % 1000003) * 17 + 3) % 2)
        .cast("long")
        .alias("grp"),
        (det_hash("user_id") % 2).cast("long").alias("label"),
        F.when(cents_units("value") >= 25_000_000, F.lit(1))
        .otherwise(F.lit(0))
        .alias("yhat"),
    )
    agree = lambda l, y: F.sum(  # noqa: E731
        F.when((F.col("label") == l) & (F.col("yhat") == y), 1).otherwise(0)
    ).cast("long")
    per = scored.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        agree(1, 1).alias("tp"),
        agree(0, 1).alias("fp"),
        agree(0, 0).alias("tn"),
        agree(1, 0).alias("fn"),
    )
    return per.select(
        "grp",
        "n",
        "tp",
        "fp",
        "tn",
        "fn",
        (
            F.col("tp").cast("double") / (F.col("tp") + F.col("fn"))
        ).alias("tpr"),
        (
            F.col("fp").cast("double") / (F.col("fp") + F.col("tn"))
        ).alias("fpr"),
        ((F.col("tp") + F.col("fp")).cast("double") / F.col("n")).alias(
            "positive_rate"
        ),
    ).orderBy("grp")


@register(
    "ml_eval_conformal_threshold",
    oracle=f"""
WITH ev AS (
  SELECT event_id,
         CAST(round(value * 1000000) AS BIGINT) AS v_u,
         CAST(({SQL_DET_HASH.format(col="user_id")}) % 2 AS BIGINT) AS label,
         CAST(({SQL_DET_HASH.format(col="((event_id % 1000003) * 7 + 1)")}) % 2 AS BIGINT) AS split
  FROM events
),
rng AS (
  SELECT CAST(min(v_u) AS BIGINT) AS lo, CAST(max(v_u) AS BIGINT) AS hi FROM ev
),
scored AS (
  SELECT ev.event_id, ev.split,
         CASE WHEN ev.label = 1 THEN rng.hi - ev.v_u
              ELSE ev.v_u - rng.lo END AS a_u
  FROM ev, rng
),
cal AS (
  SELECT a_u, event_id,
         row_number() OVER (ORDER BY a_u, event_id) AS rnk,
         count(*) OVER () AS n_cal
  FROM scored WHERE split = 0
),
sel AS (
  SELECT a_u AS q_u, CAST(n_cal AS BIGINT) AS n_cal
  FROM cal WHERE rnk = (9 * n_cal + 9) // 10
),
evl AS (
  SELECT CAST(count(*) AS BIGINT) AS n_eval,
         CAST(sum(CASE WHEN s.a_u <= sel.q_u THEN 1 ELSE 0 END) AS BIGINT)
           AS n_covered
  FROM scored s, sel WHERE s.split = 1
)
SELECT sel.n_cal, e.n_eval, 0.1 AS alpha,
       CAST(sel.q_u AS DOUBLE) / 1000000 AS q_hat,
       CAST(e.n_covered AS DOUBLE) / e.n_eval AS coverage
FROM sel, evl e
""",
)
def ml_eval_conformal_threshold(spark, sf_dir):
    """Split-conformal calibration — the distribution-free coverage
    machinery modern selective-prediction stacks run over their score
    column: hash-split events into calibration/evaluation halves,
    nonconformity a = (hi - v) for positives / (v - lo) for negatives
    in EXACT integer micro-units, pick the ceil(0.9·n_cal)-th smallest
    calibration score by distributed order-statistic SELECTION
    (operators.ranks.exact_quantiles — per-block counts + a local sort
    of only the boundary block, never a rank-everything pass), and
    audit the empirical coverage of "predict the label whose
    nonconformity clears q_hat" on the held-out half. Coverage ~= 0.9
    is the designed fixed point (labels independent of scores by
    construction, so eval nonconformity is exchangeable with
    calibration's).

    Exactness: the threshold is a SELECTED row of an integer column
    under the total order (a_u, event_id) — identical in both engines
    by construction — and coverage is one division of exact counts.
    Scale: one scan for the range, one slim range-exchange of the
    calibration half for the selection, one map-side comparison pass
    for coverage — no global sort anywhere."""
    from wikipedia_data_pipeline_spark.functions import cents_units
    from wikipedia_data_pipeline_spark.operators.ranks import exact_quantiles
    from wikipedia_data_pipeline_spark.operators.sampling import det_hash

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        cents_units("value").alias("v_u"),
        (det_hash("user_id") % 2).cast("long").alias("label"),
        (det_hash((F.col("event_id") % 1000003) * 7 + 1) % 2)
        .cast("long")
        .alias("split"),
    )
    rng = ev.agg(
        F.min("v_u").cast("long").alias("lo"),
        F.max("v_u").cast("long").alias("hi"),
    )
    scored = ev.crossJoin(F.broadcast(rng)).select(
        "event_id",
        "split",
        F.when(F.col("label") == 1, F.col("hi") - F.col("v_u"))
        .otherwise(F.col("v_u") - F.col("lo"))
        .alias("a_u"),
    )
    cal = scored.filter(F.col("split") == 0).select("a_u", "event_id")
    ks = cal.agg(F.count(F.lit(1)).cast("long").alias("n_cal")).select(
        "n_cal", F.expr("(9 * n_cal + 9) div 10").alias("k")
    )
    sel = exact_quantiles(cal, ["a_u", "event_id"], ks).select(
        F.col("a_u").alias("q_u"), "n_cal"
    )
    evl = (
        scored.filter(F.col("split") == 1)
        .crossJoin(F.broadcast(sel))
        .agg(
            F.max("q_u").alias("q_u"),
            F.max("n_cal").alias("n_cal"),
            F.count(F.lit(1)).cast("long").alias("n_eval"),
            F.sum(
                F.when(F.col("a_u") <= F.col("q_u"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_covered"),
        )
    )
    return evl.select(
        "n_cal",
        "n_eval",
        F.lit(0.1).alias("alpha"),
        (F.col("q_u").cast("double") / F.lit(1_000_000)).alias("q_hat"),
        (F.col("n_covered").cast("double") / F.col("n_eval")).alias(
            "coverage"
        ),
    )


# logged action (0..2) and its reward-stream hash key, shared between
# the two oracle references below (the reward depends on the ACTION, so
# the key folds a_log in — precomputed here because str.format cannot
# nest)
_IPS_ALOG = f"(({SQL_DET_HASH.format(col='event_id')}) % 3)"
_IPS_RKEY = f"((user_id % 1000003) * 41 + 13 * {_IPS_ALOG})"


@register(
    "ml_eval_ips_value",
    oracle=f"""
WITH logged AS (
  SELECT CAST({_IPS_ALOG} AS BIGINT) AS a_log,
         CASE WHEN CAST(({SQL_DET_HASH.format(col=_IPS_RKEY)}) % 10 AS BIGINT)
                   < 3 + CAST({_IPS_ALOG} AS BIGINT)
              THEN 1 ELSE 0 END AS r
  FROM events
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN a_log = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
         CAST(sum(CASE WHEN a_log = 2 THEN r ELSE 0 END) AS BIGINT) AS k_r
  FROM logged
)
SELECT n, n_matched, k_r,
       CAST(3 * k_r AS DOUBLE) / n AS ips_value,
       CAST(k_r AS DOUBLE) / n_matched AS snips_value
FROM agg
""",
)
def ml_eval_ips_value(spark, sf_dir):
    """Off-policy evaluation by inverse-propensity scoring — the
    counterfactual "what would the new policy have earned on the old
    logs" estimate a ranking/recommendation team computes before any
    online test: uniform-random logged actions (propensity exactly
    1/3), a reward channel whose success rate rises with the action
    ((3+a)/10 by independent hash stream), and a deterministic target
    policy pi = "always action 2". The importance weight collapses to
    the constant 3 on matched rows, so IPS = 3*sum(r*match)/n and
    SNIPS = sum(r*match)/sum(match) are single divisions of exact
    BIGINT counts — bit-identical across engines. Designed fixed
    points: SNIPS ~= E[r|a=2] = 0.5, IPS ~= 0.5 (its extra variance is
    exactly the n_matched/(n/3) fluctuation), and IPS ~= SNIPS iff the
    logging propensities really are uniform — drift flags the hash
    plumbing.

    Scale shape: one scan -> 1-row agg; nothing else."""
    from wikipedia_data_pipeline_spark.operators.sampling import det_hash

    ev = load_table(spark, sf_dir, "events")
    a_log = (det_hash("event_id") % 3).cast("long")
    r = F.when(
        (
            det_hash(
                (F.col("user_id") % 1000003) * 41
                + 13 * (det_hash("event_id") % 3)
            )
            % 10
        ).cast("long")
        < 3 + a_log,
        1,
    ).otherwise(0)
    logged = ev.select(a_log.alias("a_log"), r.alias("r"))
    agg = logged.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("a_log") == 2, 1).otherwise(0))
        .cast("long")
        .alias("n_matched"),
        F.sum(F.when(F.col("a_log") == 2, F.col("r")).otherwise(0))
        .cast("long")
        .alias("k_r"),
    )
    return agg.select(
        "n",
        "n_matched",
        "k_r",
        ((F.lit(3) * F.col("k_r")).cast("double") / F.col("n")).alias(
            "ips_value"
        ),
        (F.col("k_r").cast("double") / F.col("n_matched")).alias(
            "snips_value"
        ),
    )


@register(
    "ml_eval_pass_at_k",
    oracle=f"""
WITH samples AS (
  SELECT user_id,
         CASE WHEN CAST(({SQL_DET_HASH.format(col="((event_id % 1000003) * 11 + 3)")}) % 5 AS BIGINT) = 0
              THEN 1 ELSE 0 END AS ok
  FROM events
),
per AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n, CAST(sum(ok) AS BIGINT) AS c
  FROM samples GROUP BY user_id
  HAVING count(*) >= 5
),
terms AS (
  SELECT user_id, n, c,
         CASE WHEN n - c < 5 THEN CAST(1000000000 AS BIGINT)
              ELSE CAST(round((1.0
                - CAST(CAST(n-c AS DECIMAL(38,0)) * (n-c-1) * (n-c-2)
                       * (n-c-3) * (n-c-4) AS DOUBLE)
                  / CAST(CAST(n AS DECIMAL(38,0)) * (n-1) * (n-2)
                         * (n-3) * (n-4) AS DOUBLE))
                * 1000000000) AS BIGINT) END AS pass_q
  FROM per
)
SELECT CAST(count(*) AS BIGINT) AS n_tasks,
       CAST(5 AS BIGINT) AS k,
       CAST(sum(pass_q) AS DOUBLE) / count(*) / 1000000000
         AS mean_pass_at_k
FROM terms
""",
)
def ml_eval_pass_at_k(spark, sf_dir):
    """Unbiased pass@k (k=5) — the generation-eval aggregate for
    sampled model attempts: per task (user) with n >= k attempts and c
    successes, pass@k = 1 - C(n-c,k)/C(n,k), the Chen et al. (2021)
    estimator, averaged over tasks. Success is a 20%% hash stream, so
    mean pass@5 ~= 1 - C(0.8n,5)/C(n,5) ~= 0.67 is the designed fixed
    point.

    Exactness: the falling-factorial products C(n-c,k)/C(n,k) are
    exact DECIMAL(38,0) integers (5 factors of <= n each — overflow-
    safe to n ~ 3e7 attempts per task); their ratio is ONE fixed-order
    double division, the per-task pass is quantized once to
    nano-units, and the task mean is an exact BIGINT sum with two
    final fixed-order divisions — bit-identical across engines
    (the events_kl_user_vs_global quantization discipline). Tasks with
    n-c < k short-circuit to pass = 1 before the product (a zero
    factor would poison the DECIMAL product's sign).

    Scale shape: scan -> per-task hash agg -> 1-row mean; no joins, no
    windows."""
    from wikipedia_data_pipeline_spark.operators.sampling import det_hash

    ev = load_table(spark, sf_dir, "events")
    samples = ev.select(
        "user_id",
        F.when(
            (det_hash((F.col("event_id") % 1000003) * 11 + 3) % 5) == 0, 1
        )
        .otherwise(0)
        .alias("ok"),
    )
    per = (
        samples.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("ok").cast("long").alias("c"),
        )
        .filter(F.col("n") >= 5)
    )
    dec = "decimal(38,0)"
    nc = F.col("n") - F.col("c")
    num = (
        nc.cast(dec) * (nc - 1) * (nc - 2) * (nc - 3) * (nc - 4)
    ).cast("double")
    den = (
        F.col("n").cast(dec)
        * (F.col("n") - 1)
        * (F.col("n") - 2)
        * (F.col("n") - 3)
        * (F.col("n") - 4)
    ).cast("double")
    pass_q = F.when(nc < 5, F.lit(1_000_000_000).cast("long")).otherwise(
        F.round((F.lit(1.0) - num / den) * F.lit(1_000_000_000)).cast(
            "long"
        )
    )
    terms = per.select("n", "c", pass_q.alias("pass_q"))
    return terms.agg(
        F.count(F.lit(1)).cast("long").alias("n_tasks"),
        F.lit(5).cast("long").alias("k"),
        (
            F.sum("pass_q").cast("double")
            / F.count(F.lit(1))
            / F.lit(1_000_000_000)
        ).alias("mean_pass_at_k"),
    )


_BT_ORACLE = """
WITH c AS (
  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
types AS (SELECT DISTINCT event_type FROM events),
obs AS (
  SELECT a.event_type AS i, b.event_type AS j,
         CAST(sum(CASE WHEN a.n <> b.n THEN 1 ELSE 0 END) AS BIGINT) AS n_obs,
         CAST(sum(CASE WHEN a.n > b.n THEN 1 ELSE 0 END) AS BIGINT) AS w_obs
  FROM c a JOIN c b
    ON a.user_id = b.user_id AND a.event_type <> b.event_type
  GROUP BY 1, 2
),
m AS (
  SELECT ti.event_type AS i, tj.event_type AS j,
         CAST(COALESCE(n_obs, 0) + 2 AS BIGINT) AS n_ij,
         CAST(COALESCE(w_obs, 0) + 1 AS BIGINT) AS w_ij
  FROM types ti
  JOIN types tj ON ti.event_type <> tj.event_type
  LEFT JOIN obs ON obs.i = ti.event_type AND obs.j = tj.event_type
),
it1 AS (
  SELECT i,
         CAST(sum(CAST(round(CAST(n_ij AS DOUBLE) / 2.0 * 1000000000.0)
                       AS BIGINT)) AS BIGINT) AS denom_nano,
         CAST(sum(w_ij) AS BIGINT) AS wins
  FROM m GROUP BY 1
),
p1 AS (
  SELECT i,
         (CAST(wins AS DOUBLE) * 1000000000.0)
           / CAST(denom_nano AS DOUBLE) AS p
  FROM it1
),
it2 AS (
  SELECT m.i AS i,
         CAST(sum(CAST(round(CAST(m.n_ij AS DOUBLE) / (pi.p + pj.p)
                             * 1000000000.0) AS BIGINT)) AS BIGINT)
           AS denom_nano,
         CAST(sum(m.w_ij) AS BIGINT) AS wins,
         CAST(sum(m.n_ij) AS BIGINT) AS n_comparisons
  FROM m
  JOIN p1 pi ON pi.i = m.i
  JOIN p1 pj ON pj.i = m.j
  GROUP BY 1
),
p2 AS (
  SELECT i AS item, wins, n_comparisons,
         CAST(round((CAST(wins AS DOUBLE) * 1000000000.0)
                    / CAST(denom_nano AS DOUBLE) * 1000000000.0)
              AS BIGINT) AS strength_nano
  FROM it2
),
tot AS (SELECT CAST(sum(strength_nano) AS BIGINT) AS t FROM p2)
SELECT item, wins, n_comparisons, strength_nano,
       CAST(strength_nano AS DOUBLE) / CAST(t AS DOUBLE) AS strength_share,
       CAST(row_number() OVER (ORDER BY strength_nano DESC, item)
            AS BIGINT) AS bt_rank
FROM p2, tot
"""


@register("ml_eval_bradley_terry", oracle=_BT_ORACLE)
def ml_eval_bradley_terry(spark, sf_dir):
    """Bradley-Terry preference aggregation — the model that turns
    pairwise comparison logs (RLHF preference data, arena-style model
    matchups) into a per-item strength ranking. Items are event types;
    one "judge" per user: for each type pair the user compared, the
    type they triggered MORE often wins (ties abstain). Strengths are
    fit with two unrolled Hunter-MM iterations
    p_i <- W_i / sum_j n_ij/(p_i+p_j) from p=1, with add-one
    smoothing (w+1, n+2 per directed pair) so every strength is
    positive at any scale.

    Exactness: wins/comparison counts are exact BIGINT from hash
    aggregates; each MM denominator term n_ij/(p_i+p_j) is quantized
    once to nano-units so the per-item sum is an associative BIGINT
    sum (the events_psi_drift discipline); each p is then ONE
    fixed-order double division of exact integers, so both engines
    walk bit-identical iterates. Final strengths are re-quantized to
    nano-units; shares and the rank are derived from those integers.

    Scale shape: one (user, type) hash agg -> co-partitioned self-join
    on user_id (each user contributes <= K^2 rows, K = |types|) ->
    K(K-1)-row directed win matrix; both MM iterations and the
    ranking run on that driver-tiny relation (broadcast joins only).
    The per-user counts and the matrix are persisted because two plan
    branches consume each."""
    from pyspark import StorageLevel
    from pyspark.sql import Window

    from wikipedia_data_pipeline_spark.operators.ranks import track_persisted

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    c = track_persisted(
        ev.groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    a, b = c.alias("a"), c.alias("b")
    obs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") != F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("i"),
            F.col("b.event_type").alias("j"),
        )
        .agg(
            F.sum(F.when(F.col("a.n") != F.col("b.n"), 1).otherwise(0))
            .cast("long")
            .alias("n_obs"),
            F.sum(F.when(F.col("a.n") > F.col("b.n"), 1).otherwise(0))
            .cast("long")
            .alias("w_obs"),
        )
    )
    types = ev.select("event_type").distinct()
    spine = types.select(F.col("event_type").alias("i")).crossJoin(
        types.select(F.col("event_type").alias("j"))
    ).filter(F.col("i") != F.col("j"))
    m = track_persisted(
        spine.join(obs, ["i", "j"], "left")
        .select(
            "i",
            "j",
            (F.coalesce("n_obs", F.lit(0)) + 2).cast("long").alias("n_ij"),
            (F.coalesce("w_obs", F.lit(0)) + 1).cast("long").alias("w_ij"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    it1 = m.groupBy("i").agg(
        F.sum(
            F.round(F.col("n_ij").cast("double") / 2.0 * 1_000_000_000.0)
            .cast("long")
        )
        .cast("long")
        .alias("denom_nano"),
        F.sum("w_ij").cast("long").alias("wins"),
    )
    p1 = it1.select(
        "i",
        (
            (F.col("wins").cast("double") * 1_000_000_000.0)
            / F.col("denom_nano").cast("double")
        ).alias("p"),
    )
    pi = p1.select("i", F.col("p").alias("p_i"))
    pj = p1.select(F.col("i").alias("j"), F.col("p").alias("p_j"))
    it2 = (
        m.join(F.broadcast(pi), "i")
        .join(F.broadcast(pj), "j")
        .groupBy("i")
        .agg(
            F.sum(
                F.round(
                    F.col("n_ij").cast("double")
                    / (F.col("p_i") + F.col("p_j"))
                    * 1_000_000_000.0
                ).cast("long")
            )
            .cast("long")
            .alias("denom_nano"),
            F.sum("w_ij").cast("long").alias("wins"),
            F.sum("n_ij").cast("long").alias("n_comparisons"),
        )
    )
    p2 = it2.select(
        F.col("i").alias("item"),
        "wins",
        "n_comparisons",
        F.round(
            (F.col("wins").cast("double") * 1_000_000_000.0)
            / F.col("denom_nano").cast("double")
            * 1_000_000_000.0
        )
        .cast("long")
        .alias("strength_nano"),
    )
    tot = p2.agg(F.sum("strength_nano").cast("long").alias("t"))
    w = Window.orderBy(F.col("strength_nano").desc(), "item")
    return (
        p2.crossJoin(F.broadcast(tot))
        .select(
            "item",
            "wins",
            "n_comparisons",
            "strength_nano",
            (
                F.col("strength_nano").cast("double")
                / F.col("t").cast("double")
            ).alias("strength_share"),
        )
        .withColumn("bt_rank", F.row_number().over(w).cast("long"))
    )


_FLEISS_ORACLE = f"""
WITH rated AS (
  SELECT r1,
         CASE WHEN flip2 < 7 THEN r1 ELSE alt2 END AS r2,
         CASE WHEN flip3 < 5 THEN r1 ELSE alt3 END AS r3
  FROM (
    SELECT CAST(({SQL_DET_HASH.format(col="event_id")}) % 3 AS BIGINT) AS r1,
           CAST(({SQL_DET_HASH.format(col="((event_id % 1000003) * 13 + 5)")}) % 10 AS BIGINT) AS flip2,
           CAST(({SQL_DET_HASH.format(col="((event_id % 1000003) * 31 + 11)")}) % 3 AS BIGINT) AS alt2,
           CAST(({SQL_DET_HASH.format(col="((event_id % 1000003) * 43 + 17)")}) % 10 AS BIGINT) AS flip3,
           CAST(({SQL_DET_HASH.format(col="((event_id % 1000003) * 53 + 29)")}) % 3 AS BIGINT) AS alt3
    FROM events
  )
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_items,
         CAST(sum(CASE WHEN r1 = r2 THEN 1 ELSE 0 END
                  + CASE WHEN r1 = r3 THEN 1 ELSE 0 END
                  + CASE WHEN r2 = r3 THEN 1 ELSE 0 END) AS BIGINT) AS agree_pairs,
         CAST(sum(CASE WHEN r1 = 0 THEN 1 ELSE 0 END
                  + CASE WHEN r2 = 0 THEN 1 ELSE 0 END
                  + CASE WHEN r3 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
         CAST(sum(CASE WHEN r1 = 1 THEN 1 ELSE 0 END
                  + CASE WHEN r2 = 1 THEN 1 ELSE 0 END
                  + CASE WHEN r3 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
         CAST(sum(CASE WHEN r1 = 2 THEN 1 ELSE 0 END
                  + CASE WHEN r2 = 2 THEN 1 ELSE 0 END
                  + CASE WHEN r3 = 2 THEN 1 ELSE 0 END) AS BIGINT) AS c2
  FROM rated
),
d AS (
  SELECT n_items, agree_pairs,
         CAST(CAST(c0 AS DECIMAL(18,0)) * CAST(c0 AS DECIMAL(18,0))
              + CAST(c1 AS DECIMAL(18,0)) * CAST(c1 AS DECIMAL(18,0))
              + CAST(c2 AS DECIMAL(18,0)) * CAST(c2 AS DECIMAL(18,0))
              AS DECIMAL(38,0)) AS csq,
         CAST(CAST(n_items AS DECIMAL(18,0)) * CAST(agree_pairs AS DECIMAL(18,0)) * 3
              AS DECIMAL(38,0)) AS num_l,
         CAST(CAST(n_items AS DECIMAL(18,0)) * CAST(n_items AS DECIMAL(18,0)) * 9
              AS DECIMAL(38,0)) AS nm_sq
  FROM agg
)
SELECT n_items,
       CAST(agree_pairs AS DOUBLE) / CAST(3 * n_items AS DOUBLE)
         AS mean_pairwise_agreement,
       CAST(csq AS DOUBLE) / CAST(nm_sq AS DOUBLE) AS expected_agreement,
       CAST(num_l - csq AS DOUBLE) / CAST(nm_sq - csq AS DOUBLE)
         AS fleiss_kappa
FROM d
"""


@register("ml_eval_fleiss_kappa", oracle=_FLEISS_ORACLE)
def ml_eval_fleiss_kappa(spark, sf_dir):
    """Fleiss' kappa for THREE raters — the multi-rater agreement
    statistic Cohen's (two-rater) kappa can't express; the label-QA
    readout when each item in an annotation pipeline is rated by a
    panel. Raters are deterministic hash streams over events (the
    ml_eval_rater_kappa discipline): rater 1 labels into 3 classes;
    rater 2 copies rater 1 on ~70% of items, rater 3 on ~50%,
    re-drawing from independent streams otherwise.

    Exactness: with m=3 raters, sum_k n_ik^2 per item equals
    3 + 2*(pairwise agreements among the three ratings), so Fleiss'
    P_bar collapses to agree_pairs/(3N) and the WHOLE statistic needs
    only ONE fact-level hash aggregate (N, pairwise-agreement count,
    3 per-category rating totals) — no per-item grouping at all. The
    algebra clears every early division:
    kappa = (3*N*A - sum_k c_k^2) / (9*N^2 - sum_k c_k^2) with both
    sides exact DECIMAL(38,0) integers, so the one final double
    division (and the fixed-order agreement ratios) are bit-identical
    across engines. Hash args are pre-reduced mod 1000003 so the key
    expression cannot overflow BIGINT at any event_id.

    Scale shape: scan -> 1-row aggregate. Nothing else."""
    from wikipedia_data_pipeline_spark.operators.sampling import det_hash

    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        (det_hash("event_id") % 3).cast("long").alias("r1"),
        (det_hash((F.col("event_id") % 1000003) * 13 + 5) % 10)
        .cast("long")
        .alias("flip2"),
        (det_hash((F.col("event_id") % 1000003) * 31 + 11) % 3)
        .cast("long")
        .alias("alt2"),
        (det_hash((F.col("event_id") % 1000003) * 43 + 17) % 10)
        .cast("long")
        .alias("flip3"),
        (det_hash((F.col("event_id") % 1000003) * 53 + 29) % 3)
        .cast("long")
        .alias("alt3"),
    )
    rated = base.select(
        "r1",
        F.when(F.col("flip2") < 7, F.col("r1"))
        .otherwise(F.col("alt2"))
        .alias("r2"),
        F.when(F.col("flip3") < 5, F.col("r1"))
        .otherwise(F.col("alt3"))
        .alias("r3"),
    )

    def eq(x, y):
        return F.when(F.col(x) == F.col(y), 1).otherwise(0)

    def is_k(col, k):
        return F.when(F.col(col) == k, 1).otherwise(0)

    agg = rated.agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum(eq("r1", "r2") + eq("r1", "r3") + eq("r2", "r3"))
        .cast("long")
        .alias("agree_pairs"),
        *[
            F.sum(is_k("r1", k) + is_k("r2", k) + is_k("r3", k))
            .cast("long")
            .alias(f"c{k}")
            for k in (0, 1, 2)
        ],
    )
    dec = "decimal(18,0)"
    csq = (
        F.col("c0").cast(dec) * F.col("c0").cast(dec)
        + F.col("c1").cast(dec) * F.col("c1").cast(dec)
        + F.col("c2").cast(dec) * F.col("c2").cast(dec)
    ).cast("decimal(38,0)")
    num_l = (
        F.col("n_items").cast(dec) * F.col("agree_pairs").cast(dec) * 3
    ).cast("decimal(38,0)")
    nm_sq = (
        F.col("n_items").cast(dec) * F.col("n_items").cast(dec) * 9
    ).cast("decimal(38,0)")
    d = agg.select(
        "n_items",
        "agree_pairs",
        csq.alias("csq"),
        num_l.alias("num_l"),
        nm_sq.alias("nm_sq"),
    )
    return d.select(
        "n_items",
        (
            F.col("agree_pairs").cast("double")
            / (F.lit(3) * F.col("n_items")).cast("double")
        ).alias("mean_pairwise_agreement"),
        (F.col("csq").cast("double") / F.col("nm_sq").cast("double")).alias(
            "expected_agreement"
        ),
        (
            (F.col("num_l") - F.col("csq")).cast("double")
            / (F.col("nm_sq") - F.col("csq")).cast("double")
        ).alias("fleiss_kappa"),
    )


_CUPED_ORACLE = f"""
WITH u AS (
  SELECT user_id,
         CAST(({SQL_DET_HASH.format(col="user_id")}) % 2 AS BIGINT) AS arm,
         CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-16'
                       THEN CAST(round(value * 100) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS x,
         CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-16'
                       THEN CAST(round(value * 100) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS y
  FROM events GROUP BY 1
),
g AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(x AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS sx,
         CAST(sum(CAST(y AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS sy,
         CAST(sum(CAST(x AS DECIMAL(18,0)) * CAST(x AS DECIMAL(18,0)))
              AS DECIMAL(38,0)) AS sxx,
         CAST(sum(CAST(x AS DECIMAL(18,0)) * CAST(y AS DECIMAL(18,0)))
              AS DECIMAL(38,0)) AS sxy,
         CAST(sum(CAST(y AS DECIMAL(18,0)) * CAST(y AS DECIMAL(18,0)))
              AS DECIMAL(38,0)) AS syy
  FROM u
),
t AS (
  SELECT n,
         (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS theta,
         ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
             - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
          * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
             - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
           / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
           AS variance_reduction,
         CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mx
  FROM g
),
a AS (
  SELECT arm, CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(CAST(x AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS sxa,
         CAST(sum(CAST(y AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS sya
  FROM u GROUP BY arm
)
SELECT arm, n_users,
       CAST(sxa AS DOUBLE) / CAST(n_users AS DOUBLE) / 100.0
         AS mean_pre_value,
       CAST(sya AS DOUBLE) / CAST(n_users AS DOUBLE) / 100.0
         AS mean_post_value,
       (CAST(sya AS DOUBLE) / CAST(n_users AS DOUBLE)
          - theta * (CAST(sxa AS DOUBLE) / CAST(n_users AS DOUBLE) - mx))
         / 100.0 AS cuped_adjusted_mean,
       theta, variance_reduction
FROM a, t
"""


@register("ml_eval_cuped_ab", oracle=_CUPED_ORACLE)
def ml_eval_cuped_ab(spark, sf_dir):
    """CUPED variance-reduced A/B readout (Deng et al., WSDM 2013) —
    the experiment-analysis operator that uses each user's PRE-period
    behavior as a control covariate: adjusted_i = y_i - theta (x_i -
    E[x]) with theta = cov(x, y)/var(x), shrinking metric variance by
    the squared pre/post correlation without biasing the treatment
    contrast. Arms are det_hash(user_id) % 2; the pre period is days
    1-15, the experiment period the rest of the month; the per-user
    metric is summed value in cents.

    Exact: per-user x/y are BIGINT cents sums; all five pooled moment
    sums are DECIMAL(38,0) hash aggregates, so theta, the pre/post R^2
    (= the variance-reduction factor), and both arms' adjusted means
    are fixed-order double expressions both engines evaluate
    identically — the events_feature_corr_matrix discipline.

    Scale shape: one events scan -> per-user hash agg (the only
    fact-sized shuffle) -> persisted user-level relation feeds the
    1-row pooled-moments aggregate AND the 2-row per-arm aggregate ->
    broadcast the 1-row theta onto the arms. At 1000 executors the
    user relation is the natural experiment-analysis table; nothing
    else grows with the event count."""
    from pyspark import StorageLevel

    from wikipedia_data_pipeline_spark.operators.ranks import track_persisted
    from wikipedia_data_pipeline_spark.operators.sampling import det_hash

    ev = load_table(spark, sf_dir, "events")
    # load_table exposes ts as epoch-micros BIGINT; 1705363200000000 is
    # TIMESTAMP '2024-01-16' UTC — the same instant the oracle names
    pre = F.col("ts") < F.lit(1705363200000000)
    cents = F.round(F.col("value") * 100).cast("long")
    u = track_persisted(
        ev.groupBy("user_id")
        .agg(
            F.sum(F.when(pre, cents).otherwise(0)).cast("long").alias("x"),
            F.sum(F.when(~pre, cents).otherwise(0)).cast("long").alias("y"),
        )
        .select(
            (det_hash("user_id") % 2).cast("long").alias("arm"), "x", "y"
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    dec = "decimal(18,0)"
    g = u.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("x").cast(dec)).cast("decimal(38,0)").alias("sx"),
        F.sum(F.col("y").cast(dec)).cast("decimal(38,0)").alias("sy"),
        F.sum(F.col("x").cast(dec) * F.col("x").cast(dec))
        .cast("decimal(38,0)")
        .alias("sxx"),
        F.sum(F.col("x").cast(dec) * F.col("y").cast(dec))
        .cast("decimal(38,0)")
        .alias("sxy"),
        F.sum(F.col("y").cast(dec) * F.col("y").cast(dec))
        .cast("decimal(38,0)")
        .alias("syy"),
    )
    t = g.selectExpr(
        "n",
        """(cast(n as double) * cast(sxy as double)
            - cast(sx as double) * cast(sy as double))
           / (cast(n as double) * cast(sxx as double)
              - cast(sx as double) * cast(sx as double)) AS theta""",
        """((cast(n as double) * cast(sxy as double)
             - cast(sx as double) * cast(sy as double))
            * (cast(n as double) * cast(sxy as double)
               - cast(sx as double) * cast(sy as double)))
           / ((cast(n as double) * cast(sxx as double)
               - cast(sx as double) * cast(sx as double))
              * (cast(n as double) * cast(syy as double)
                 - cast(sy as double) * cast(sy as double)))
           AS variance_reduction""",
        "cast(sx as double) / cast(n as double) AS mx",
    ).drop("n")
    a = u.groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum(F.col("x").cast(dec)).cast("decimal(38,0)").alias("sxa"),
        F.sum(F.col("y").cast(dec)).cast("decimal(38,0)").alias("sya"),
    )
    return a.crossJoin(F.broadcast(t)).selectExpr(
        "arm",
        "n_users",
        "cast(sxa as double) / cast(n_users as double) / 100.0"
        " AS mean_pre_value",
        "cast(sya as double) / cast(n_users as double) / 100.0"
        " AS mean_post_value",
        """(cast(sya as double) / cast(n_users as double)
            - theta * (cast(sxa as double) / cast(n_users as double) - mx))
           / 100.0 AS cuped_adjusted_mean""",
        "theta",
        "variance_reduction",
    )


_BRIER_ORACLE = f"""
WITH ev AS (
  SELECT CAST(round(value * 1000000) AS BIGINT) AS v_u,
         CAST(({SQL_DET_HASH.format(col="user_id")}) % 2 AS BIGINT) AS label
  FROM events
),
rng AS (
  SELECT CAST(min(v_u) AS BIGINT) AS lo, CAST(max(v_u) AS BIGINT) AS hi
  FROM ev
),
binned AS (
  SELECT least(9, ((ev.v_u - rng.lo) * 10) // (rng.hi - rng.lo + 1)) AS bin,
         ev.v_u - rng.lo AS dv, ev.label, rng.hi - rng.lo AS rng_w
  FROM ev, rng
),
item AS (
  SELECT CAST(sum(CAST(round(
           (CAST(dv AS DOUBLE) / rng_w - label)
           * (CAST(dv AS DOUBLE) / rng_w - label) * 1000000000.0)
           AS BIGINT)) AS BIGINT) AS brier_nano,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(label) AS BIGINT) AS n_pos
  FROM binned
),
per AS (
  SELECT bin, CAST(max(rng_w) AS BIGINT) AS rng_w,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(label) AS BIGINT) AS n_pos,
         CAST(sum(dv) AS BIGINT) AS sum_dv
  FROM binned GROUP BY bin
),
terms AS (
  SELECT CAST(round(per.n
           * (CAST(sum_dv AS DOUBLE) / per.n / rng_w
              - CAST(per.n_pos AS DOUBLE) / per.n)
           * (CAST(sum_dv AS DOUBLE) / per.n / rng_w
              - CAST(per.n_pos AS DOUBLE) / per.n)
           * 1000000000.0) AS BIGINT) AS rel_nano,
         CAST(round(per.n
           * (CAST(per.n_pos AS DOUBLE) / per.n
              - CAST(i.n_pos AS DOUBLE) / i.n)
           * (CAST(per.n_pos AS DOUBLE) / per.n
              - CAST(i.n_pos AS DOUBLE) / i.n)
           * 1000000000.0) AS BIGINT) AS res_nano,
         CAST(round((per.n * (CAST(sum_dv AS DOUBLE) / per.n / rng_w)
                       * (CAST(sum_dv AS DOUBLE) / per.n / rng_w)
                     - 2 * (CAST(sum_dv AS DOUBLE) / per.n / rng_w)
                         * per.n_pos
                     + per.n_pos) * 1000000000.0) AS BIGINT) AS bb_nano
  FROM per, item i
)
SELECT i.n,
       CAST(i.n_pos AS DOUBLE) / i.n AS base_rate,
       CAST(i.brier_nano AS DOUBLE) / 1000000000.0 / i.n AS brier_score,
       CAST((SELECT CAST(sum(bb_nano) AS BIGINT) FROM terms) AS DOUBLE)
         / 1000000000.0 / i.n AS brier_binned,
       CAST((SELECT CAST(sum(rel_nano) AS BIGINT) FROM terms) AS DOUBLE)
         / 1000000000.0 / i.n AS reliability,
       CAST((SELECT CAST(sum(res_nano) AS BIGINT) FROM terms) AS DOUBLE)
         / 1000000000.0 / i.n AS resolution,
       (CAST(i.n_pos AS DOUBLE) / i.n)
         * (1.0 - CAST(i.n_pos AS DOUBLE) / i.n) AS uncertainty
FROM item i
"""


@register("ml_eval_brier_decomposition", oracle=_BRIER_ORACLE)
def ml_eval_brier_decomposition(spark, sf_dir):
    """Murphy (1973) decomposition of the Brier score — the
    diagnostic that splits a probabilistic scorer's squared error
    into reliability (calibration gap to shrink), resolution
    (discrimination to keep), and irreducible outcome uncertainty:
    brier_binned = reliability - resolution + uncertainty exactly
    when forecasts are replaced by their bin means. Same deterministic
    score/label streams and min-max 10-bin layout as
    ml_eval_calibration_bins, so the two reports read together.

    Exactness: every per-item and per-bin squared-error term is
    quantized once to nano-units, so both engines sum identical
    BIGINTs regardless of reduction order; the base rate, component
    normalizations, and uncertainty are fixed-order double expressions
    over exact integers.

    Scale shape: one events scan -> (bin) hash agg (10 groups) plus
    one 1-row item-level moment aggregate; the decomposition itself
    runs on the 10-row relation."""
    from wikipedia_data_pipeline_spark.operators.sampling import det_hash

    ev = load_table(spark, sf_dir, "events").select(
        F.round(F.col("value") * 1_000_000).cast("long").alias("v_u"),
        (det_hash("user_id") % 2).cast("long").alias("label"),
    )
    rng = ev.agg(
        F.min("v_u").cast("long").alias("lo"),
        F.max("v_u").cast("long").alias("hi"),
    )
    binned = ev.crossJoin(F.broadcast(rng)).select(
        F.least(
            F.lit(9).cast("long"),
            F.expr("((v_u - lo) * 10) div (hi - lo + 1)"),
        ).alias("bin"),
        (F.col("v_u") - F.col("lo")).alias("dv"),
        "label",
        (F.col("hi") - F.col("lo")).alias("rng_w"),
    )
    f_item = F.col("dv").cast("double") / F.col("rng_w")
    item = binned.agg(
        F.sum(
            F.round((f_item - F.col("label")) * (f_item - F.col("label"))
                    * 1_000_000_000.0).cast("long")
        )
        .cast("long")
        .alias("brier_nano"),
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("label").cast("long").alias("n_pos"),
    )
    per = binned.groupBy("bin").agg(
        F.max("rng_w").cast("long").alias("rng_w"),
        F.count(F.lit(1)).cast("long").alias("bn"),
        F.sum("label").cast("long").alias("bn_pos"),
        F.sum("dv").cast("long").alias("sum_dv"),
    )
    f_k = F.col("sum_dv").cast("double") / F.col("bn") / F.col("rng_w")
    o_k = F.col("bn_pos").cast("double") / F.col("bn")
    o_bar = F.col("n_pos").cast("double") / F.col("n")
    terms = per.crossJoin(F.broadcast(item)).select(
        F.round(F.col("bn") * (f_k - o_k) * (f_k - o_k) * 1_000_000_000.0)
        .cast("long")
        .alias("rel_nano"),
        F.round(
            F.col("bn") * (o_k - o_bar) * (o_k - o_bar) * 1_000_000_000.0
        )
        .cast("long")
        .alias("res_nano"),
        F.round(
            (
                F.col("bn") * f_k * f_k
                - F.lit(2) * f_k * F.col("bn_pos")
                + F.col("bn_pos")
            )
            * 1_000_000_000.0
        )
        .cast("long")
        .alias("bb_nano"),
    )
    sums = terms.agg(
        F.sum("rel_nano").cast("long").alias("rel_s"),
        F.sum("res_nano").cast("long").alias("res_s"),
        F.sum("bb_nano").cast("long").alias("bb_s"),
    )
    return item.crossJoin(F.broadcast(sums)).select(
        "n",
        o_bar.alias("base_rate"),
        (F.col("brier_nano").cast("double") / 1_000_000_000.0 / F.col("n"))
        .alias("brier_score"),
        (F.col("bb_s").cast("double") / 1_000_000_000.0 / F.col("n"))
        .alias("brier_binned"),
        (F.col("rel_s").cast("double") / 1_000_000_000.0 / F.col("n"))
        .alias("reliability"),
        (F.col("res_s").cast("double") / 1_000_000_000.0 / F.col("n"))
        .alias("resolution"),
        (o_bar * (F.lit(1.0) - o_bar)).alias("uncertainty"),
    )


_MCNEMAR_ORACLE = f"""
WITH p AS (
  SELECT CAST(({SQL_DET_HASH.format(col="event_id")}) % 2 AS BIGINT)
           AS truth,
         CAST(({SQL_DET_HASH.format(col="((event_id % 1000003) * 7 + 3)")}) % 100 AS BIGINT)
           AS da,
         CAST(({SQL_DET_HASH.format(col="((event_id % 1000003) * 19 + 11)")}) % 100 AS BIGINT)
           AS db
  FROM events
),
o AS (
  SELECT CASE WHEN da < 50 THEN truth ELSE 1 - truth END AS pred_a,
         CASE WHEN db < 70 THEN truth ELSE 1 - truth END AS pred_b,
         truth
  FROM p
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN pred_a = truth AND pred_b <> truth
                       THEN 1 ELSE 0 END) AS BIGINT) AS b_only_a,
         CAST(sum(CASE WHEN pred_a <> truth AND pred_b = truth
                       THEN 1 ELSE 0 END) AS BIGINT) AS c_only_b,
         CAST(sum(CASE WHEN pred_a = truth THEN 1 ELSE 0 END) AS BIGINT)
           AS n_correct_a,
         CAST(sum(CASE WHEN pred_b = truth THEN 1 ELSE 0 END) AS BIGINT)
           AS n_correct_b
  FROM o
)
SELECT n, n_correct_a, n_correct_b, b_only_a, c_only_b,
       CAST((b_only_a - c_only_b) * (b_only_a - c_only_b) AS DOUBLE)
         / CAST(b_only_a + c_only_b AS DOUBLE) AS mcnemar_chi2,
       (b_only_a - c_only_b) * (b_only_a - c_only_b) * 1000000
         >= 3841459 * (b_only_a + c_only_b) AS reject_h0
FROM agg
"""


@register("ml_eval_mcnemar_test", oracle=_MCNEMAR_ORACLE)
def ml_eval_mcnemar_test(spark, sf_dir):
    """McNemar's test for PAIRED model comparison — the statistically
    correct way to ask "is model B better than model A on the same
    eval items" (two accuracy numbers alone ignore the pairing): only
    the discordant counts matter, chi2 = (b - c)^2 / (b + c) with
    b = A-right/B-wrong, c = A-wrong/B-right. Models are deterministic
    hash streams over events: A matches the truth with p = 0.50 (a
    coin), B with p = 0.70 — the designed fixed point is REJECT, with
    chi2 growing linearly in n.

    Exactness: all five counts are exact BIGINT aggregates from one
    scan; the statistic is one double division of exact integers, and
    the alpha = 0.05 decision is the PURE-INTEGER comparison
    (b-c)^2 * 10^6 >= 3841459 * (b+c) (chi2_1,0.95 = 3.841459...
    frozen as a micro-unit literal, the events_sprt_ab discipline), so
    no transcendental ever runs at query time.

    Scale shape: scan -> 1-row aggregate. Nothing else."""
    from wikipedia_data_pipeline_spark.operators.sampling import det_hash

    ev = load_table(spark, sf_dir, "events")
    o = ev.select(
        (det_hash("event_id") % 2).cast("long").alias("truth"),
        (det_hash((F.col("event_id") % 1000003) * 7 + 3) % 100)
        .cast("long")
        .alias("da"),
        (det_hash((F.col("event_id") % 1000003) * 19 + 11) % 100)
        .cast("long")
        .alias("db"),
    ).select(
        "truth",
        F.when(F.col("da") < 50, F.col("truth"))
        .otherwise(1 - F.col("truth"))
        .alias("pred_a"),
        F.when(F.col("db") < 70, F.col("truth"))
        .otherwise(1 - F.col("truth"))
        .alias("pred_b"),
    )
    right_a = F.col("pred_a") == F.col("truth")
    right_b = F.col("pred_b") == F.col("truth")
    agg = o.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(right_a & ~right_b, 1).otherwise(0))
        .cast("long")
        .alias("b_only_a"),
        F.sum(F.when(~right_a & right_b, 1).otherwise(0))
        .cast("long")
        .alias("c_only_b"),
        F.sum(F.when(right_a, 1).otherwise(0))
        .cast("long")
        .alias("n_correct_a"),
        F.sum(F.when(right_b, 1).otherwise(0))
        .cast("long")
        .alias("n_correct_b"),
    )
    d = F.col("b_only_a") - F.col("c_only_b")
    s = F.col("b_only_a") + F.col("c_only_b")
    return agg.select(
        "n",
        "n_correct_a",
        "n_correct_b",
        "b_only_a",
        "c_only_b",
        ((d * d).cast("double") / s.cast("double")).alias("mcnemar_chi2"),
        (d * d * F.lit(1_000_000) >= F.lit(3_841_459) * s).alias(
            "reject_h0"
        ),
    )
