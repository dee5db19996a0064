"""Privacy screens for release gating: k-anonymity over
quasi-identifier tuples, l-diversity of the sensitive column within
each equivalence class, t-closeness of each class's sensitive
distribution against the corpus (ordered earth-mover distance), and an
epsilon-DP count release. Split out of profiling_queries (round 7)."""

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


@register(
    "privacy_t_closeness",
    oracle="""
WITH rows_b AS (
  SELECT lang, source, n_chars // 200 AS b FROM documents
),
dom AS (
  SELECT b, count(*) AS q_cnt FROM rows_b GROUP BY b
),
gtot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_total,
         CAST(count(DISTINCT b) AS BIGINT) AS m
  FROM rows_b
),
cls AS (
  SELECT lang, source, count(*) AS n_g FROM rows_b GROUP BY lang, source
),
per AS (
  SELECT lang, source, b, count(*) AS p_cnt
  FROM rows_b GROUP BY lang, source, b
),
grid AS (
  SELECT c.lang, c.source, c.n_g, d.b, d.q_cnt,
         COALESCE(p.p_cnt, 0) AS p_cnt
  FROM cls c CROSS JOIN dom d
  LEFT JOIN per p ON p.lang = c.lang AND p.source = c.source AND p.b = d.b
),
cum AS (
  SELECT lang, source, n_g, b,
         sum(p_cnt) OVER (PARTITION BY lang, source ORDER BY b) AS cum_p,
         sum(q_cnt) OVER (PARTITION BY lang, source ORDER BY b) AS cum_q
  FROM grid
),
emd AS (
  SELECT lang, source, n_g,
         sum(abs(CAST(g.n_total AS HUGEINT) * cum_p
                 - CAST(n_g AS HUGEINT) * cum_q)) AS num_u,
         max(g.n_total) AS n_total, max(g.m) AS m
  FROM cum, gtot g
  GROUP BY lang, source, n_g
)
SELECT lang, source, CAST(n_g AS BIGINT) AS group_size,
       CASE WHEN m > 1
            THEN CAST(num_u AS DOUBLE)
                 / (CAST(n_g AS DOUBLE) * CAST(n_total AS DOUBLE)
                    * CAST(m - 1 AS DOUBLE))
            ELSE 0.0 END AS emd,
       CASE WHEN m > 1
            THEN CAST(num_u AS DOUBLE)
                 / (CAST(n_g AS DOUBLE) * CAST(n_total AS DOUBLE)
                    * CAST(m - 1 AS DOUBLE))
            ELSE 0.0 END > 0.15 AS t_violation
FROM emd
ORDER BY emd DESC, lang, source
""",
)
def privacy_t_closeness(spark, sf_dir):
    """t-closeness audit — the third equivalence-class screen (after
    k-anonymity and l-diversity, Li et al. 2007): a class passes only
    if its SENSITIVE-attribute distribution stays within t of the
    corpus distribution under the ordered earth-mover distance. For an
    ordered domain with m values at unit spacing, EMD(P,Q) =
    Σᵢ|CumP(i) − CumQ(i)| / (m−1); clamped to [0,1].

    Exactness: the cumulative difference is kept as the INTEGER
    N·cum_p(i) − n_g·cum_q(i) (clearing both denominators), summed in
    DECIMAL(38,0) (bound: m·N·n_g ≤ ~1e3·(5e7)² ≈ 2.5e18·m at a 50M-doc
    corpus — well inside 38 digits), with ONE double division at the
    end — bit-identical across engines.

    Scale shape: two hash aggs collapse the corpus to |classes| and
    |classes×buckets| rows; the grid (classes × ordered domain) and its
    per-class cumulative windows run on those post-agg relations —
    the domain side is broadcast, the window is PARTITIONED by class,
    and nothing entity-sized crosses an unpartitioned boundary."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    rows_b = docs.select(
        "lang", "source", F.expr("n_chars div 200").alias("b")
    )
    dom = rows_b.groupBy("b").agg(F.count(F.lit(1)).alias("q_cnt"))
    glob = rows_b.agg(
        F.count(F.lit(1)).cast("long").alias("n_total"),
        F.countDistinct("b").cast("long").alias("m"),
    )
    cls = rows_b.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_g")
    )
    per = rows_b.groupBy("lang", "source", "b").agg(
        F.count(F.lit(1)).alias("p_cnt")
    )
    grid = (
        cls.crossJoin(F.broadcast(dom))
        .join(per, ["lang", "source", "b"], "left")
        .select(
            "lang",
            "source",
            "n_g",
            "b",
            "q_cnt",
            F.coalesce(F.col("p_cnt"), F.lit(0)).alias("p_cnt"),
        )
    )
    w = (
        Window.partitionBy("lang", "source")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = grid.select(
        "lang",
        "source",
        "n_g",
        F.sum("p_cnt").over(w).alias("cum_p"),
        F.sum("q_cnt").over(w).alias("cum_q"),
    )
    emd_terms = cum.crossJoin(F.broadcast(glob)).select(
        "lang",
        "source",
        "n_g",
        "n_total",
        "m",
        F.abs(
            F.col("n_total").cast("decimal(38,0)") * F.col("cum_p")
            - F.col("n_g").cast("decimal(38,0)") * F.col("cum_q")
        ).alias("du"),
    )
    agg = emd_terms.groupBy("lang", "source", "n_g").agg(
        F.sum("du").alias("num_u"),
        F.max("n_total").alias("n_total"),
        F.max("m").alias("m"),
    )
    emd = F.when(
        F.col("m") > 1,
        F.col("num_u").cast("double")
        / (
            F.col("n_g").cast("double")
            * F.col("n_total").cast("double")
            * (F.col("m") - 1).cast("double")
        ),
    ).otherwise(F.lit(0.0))
    return agg.select(
        "lang",
        "source",
        F.col("n_g").cast("long").alias("group_size"),
        emd.alias("emd"),
        (emd > 0.15).alias("t_violation"),
    ).orderBy(F.desc("emd"), F.asc("lang"), F.asc("source"))


@register(
    "privacy_dp_release_counts",
    oracle=f"""
WITH per AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY event_type
),
seeded AS (
  SELECT event_type, n,
         length(event_type)
           + ascii(substr(event_type, 1, 1)) * 2097152
           + ascii(substr(event_type, 2, 1)) * 16384
           + ascii(substr(event_type, 3, 1)) * 128
           + ascii(substr(event_type, 4, 1)) AS tid
  FROM per
),
noise AS (
  SELECT event_type, n,
         (CAST(({SQL_DET_HASH.format(col="tid")}) AS DOUBLE) + 0.5)
           / 2147483647.0 - 0.5 AS c
  FROM seeded
),
q AS (
  SELECT event_type, n,
         CAST(round((CASE WHEN c < 0 THEN 1.0 ELSE -1.0 END)
                    * ln(1.0 - 2.0 * abs(c)) * 1000000000) AS BIGINT)
           AS noise_q
  FROM noise
)
SELECT event_type, 1.0 AS epsilon,
       CAST(n AS DOUBLE) + CAST(noise_q AS DOUBLE) / 1000000000 AS noisy_count
FROM q
ORDER BY event_type
""",
)
def privacy_dp_release_counts(spark, sf_dir):
    """epsilon-differentially-private count release — the third leg of
    the privacy family (k-anonymity screens groups, l-diversity
    screens homogeneity; this RELEASES a statistic): per-event-type
    counts plus Laplace(sensitivity/epsilon) noise, epsilon=1,
    L1-sensitivity 1 (one event belongs to one type).

    The noise is drawn by inverse-CDF from the engine's deterministic
    hash stream seeded on the TYPE STRING (ascii-packed first 4 chars
    + length — portable integer, identical in both engines), NOT a
    private RNG: the same replayability discipline as
    events_bootstrap_ci's hash-seeded resamples, chosen so the DuckDB
    oracle replays the release bit-for-bit. A production release would
    swap the seed for a sealed RNG; everything else (mechanism shape,
    sensitivity accounting, quantization) is the production form.
    The single transcendental ln(1-2|u-0.5|) is quantized once per
    released row to nano-units (events_kl_user_vs_global discipline),
    so engines never compare unrounded libm bits; |noise| is bounded
    by ln(2^31)/epsilon ~= 21.5 because the hash stream's u never
    reaches the CDF tails closer than 2^-31.

    Scale shape: one scan -> hash agg to |types| rows; the noise math
    runs on that driver-tiny relation. Completes: gates -> dedup ->
    PII scrub -> k-anon/l-div audit -> DP release."""
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    from wikipedia_data_pipeline_spark.operators.sampling import det_hash

    tid = (
        F.length("event_type")
        + F.ascii(F.substring("event_type", 1, 1)) * 2097152
        + F.ascii(F.substring("event_type", 2, 1)) * 16384
        + F.ascii(F.substring("event_type", 3, 1)) * 128
        + F.ascii(F.substring("event_type", 4, 1))
    )
    c = (
        (det_hash(tid.cast("long")).cast("double") + F.lit(0.5))
        / F.lit(2147483647.0)
        - F.lit(0.5)
    )
    noise_q = F.round(
        F.when(c < 0, F.lit(1.0)).otherwise(F.lit(-1.0))
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(c))
        * F.lit(1_000_000_000)
    ).cast("long")
    return (
        per.select(
            "event_type",
            F.lit(1.0).alias("epsilon"),
            (
                F.col("n").cast("double")
                + noise_q.cast("double") / F.lit(1_000_000_000)
            ).alias("noisy_count"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# epsilon-DP median release via the exponential mechanism (round 12)
# ---------------------------------------------------------------------------
# Candidate outputs = the distinct micro-unit values; utility u(v) =
# -|#below - #above| (sensitivity 2); selection probability
# proportional to exp(eps*u/4) is realized with the Gumbel-max trick,
# whose uniforms come from the engine's portable det_hash of the
# candidate value -- so the whole "random" release replays
# bit-for-bit in the SQL twin (privacy_dp_release_counts discipline;
# a production release would swap the hash for a real CSPRNG draw,
# which changes ONE expression).

_DPM_EPS = 1.0
_HASH_MOD = (1 << 31) - 1


_DPM_ORACLE = f"""
WITH v AS (
  SELECT CAST(round(value * 1000000) AS BIGINT) AS v_u,
         CAST(count(*) AS BIGINT) AS t
  FROM events GROUP BY 1
),
sc AS (
  SELECT v_u, t,
         CAST(sum(t) OVER (ORDER BY v_u
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum,
         CAST(sum(t) OVER () AS BIGINT) AS n
  FROM v
),
scored AS (
  SELECT v_u, t, cum, n,
         -abs(2 * cum - t - n) AS u2,
         CAST({_DPM_EPS} AS DOUBLE) * CAST(-abs(2 * cum - t - n) AS DOUBLE)
           / 4.0
         - ln(-ln((CAST({SQL_DET_HASH.format(col='v_u')} AS DOUBLE) + 0.5)
                  / {_HASH_MOD}.0)) AS g_score
  FROM sc
),
rel AS (
  SELECT v_u AS released_v_u, cum AS released_cum, t AS released_t, n
  FROM scored
  ORDER BY g_score DESC, v_u ASC LIMIT 1
),
med AS (
  SELECT min(v_u) AS true_median_v_u FROM sc
  WHERE 2 * cum >= n
)
SELECT rel.n AS n_total, rel.released_v_u, med.true_median_v_u,
       abs(2 * rel.released_cum - rel.released_t - rel.n) AS released_gap2
FROM rel, med
"""


@register("privacy_dp_median_release", oracle=_DPM_ORACLE)
def privacy_dp_median_release(spark, sf_dir):
    """ε-differentially-private MEDIAN release of events.value via the
    exponential mechanism (McSherry–Talwar) — the quantile companion
    to `privacy_dp_release_counts`: candidates are the distinct
    micro-unit values, utility −|#below − #above| peaks at the true
    median, and the Gumbel-max trick realizes the exp(εu/4) selection
    with the portable det_hash as the uniform source (bit-replayable;
    one expression swaps in a real CSPRNG for production). Output is
    the released value, the true median, and the released value's
    exact rank gap — integers only, so the cross-engine hash is immune
    to the two transcendentals inside the selection.

    Scale shape: one hash agg to the distinct-value relation, one
    hierarchical `ordered_scan` for the prefix counts (near-unique
    value domains never serialize), one TakeOrdered(1) argmax."""
    from wikipedia_data_pipeline_spark.operators.ranks import ordered_scan

    ev = load_table(spark, sf_dir, "events")
    v = ev.groupBy(
        F.round(F.col("value") * 1_000_000).cast("long").alias("v_u")
    ).agg(F.count(F.lit(1)).cast("long").alias("t"))
    sc = ordered_scan(
        v, ["v_u"], running=[("cum", "t", "sum")], with_totals=True
    ).select("v_u", "t", "cum", F.col("cum_total").alias("n"))
    gap2 = F.abs(2 * F.col("cum") - F.col("t") - F.col("n"))
    uni = (
        F.expr(SQL_DET_HASH.format(col="v_u")).cast("double") + 0.5
    ) / float(_HASH_MOD)
    g_score = (
        F.lit(_DPM_EPS) * (-gap2).cast("double") / 4.0
        - F.log(-F.log(uni))
    )
    scored = sc.select("v_u", "t", "cum", "n", g_score.alias("g_score"))
    rel = (
        scored.orderBy(F.desc("g_score"), F.asc("v_u"))
        .limit(1)
        .select(
            F.col("n").alias("n_total"),
            F.col("v_u").alias("released_v_u"),
            (F.abs(2 * F.col("cum") - F.col("t") - F.col("n"))).alias(
                "released_gap2"
            ),
        )
    )
    med = (
        sc.filter(2 * F.col("cum") >= F.col("n"))
        .agg(F.min("v_u").alias("true_median_v_u"))
    )
    return rel.crossJoin(F.broadcast(med)).select(
        "n_total", "released_v_u", "true_median_v_u", "released_gap2"
    )


# ---------------------------------------------------------------------------
# Randomized response: local-DP prevalence estimation
# ---------------------------------------------------------------------------
# Warner (1965), the original local-differential-privacy mechanism and
# still the building block of RAPPOR-style telemetry: each respondent
# reports their sensitive bit TRUTHFULLY with probability p = 3/4 and
# INVERTED otherwise, giving every individual plausible deniability
# (epsilon = ln(p/(1-p)) = ln 3); the aggregator de-biases the observed
# yes-rate lambda_hat with pi_hat = (lambda_hat - (1-p)) / (2p - 1).
# Both the sensitive bit (~20% prevalence) and each respondent's coin
# are deterministic det_hash streams over the distinct-user relation,
# so both engines flip the SAME coins and the estimate is exactly
# reproducible; every reported number is an exact BIGINT count or a
# single fixed double expression over them (p literals 0.25/0.5 are
# exact binary doubles).

_RR_ORACLE = f"""
WITH u AS (SELECT DISTINCT user_id FROM events),
resp AS (
  SELECT CASE WHEN ({SQL_DET_HASH.format(col="user_id")}) % 5 = 0
              THEN 1 ELSE 0 END AS a,
         CASE WHEN ({SQL_DET_HASH.format(col="((user_id % 1000003) * 7 + 3)")}) % 4 < 3
              THEN 1 ELSE 0 END AS truth_coin
  FROM u
),
obs AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(a) AS BIGINT) AS n_true,
         CAST(sum(CASE WHEN truth_coin = 1 THEN a ELSE 1 - a END)
              AS BIGINT) AS n_yes_reported
  FROM resp
)
SELECT n, n_yes_reported,
       CAST(n_yes_reported AS DOUBLE) / n AS lambda_hat,
       (CAST(n_yes_reported AS DOUBLE) / n - 0.25) / 0.5 AS pi_hat,
       CAST(n_true AS DOUBLE) / n AS pi_true,
       abs((CAST(n_yes_reported AS DOUBLE) / n - 0.25) / 0.5
           - CAST(n_true AS DOUBLE) / n) AS abs_err
FROM obs
"""


@register("privacy_randomized_response", oracle=_RR_ORACLE)
def privacy_randomized_response(spark, sf_dir):
    """Warner randomized-response release over the distinct-user
    relation: per-user deterministic truth-coin (p = 3/4, epsilon =
    ln 3 local DP), observed yes-rate, and the de-biased prevalence
    estimate next to the true prevalence it may not leak individually.
    See the section comment.

    Scale shape: one distinct-user agg (shuffle on user_id), one
    count-sum pass, driver-sized finals. The coins are hash streams —
    no RNG state, retry- and partitioning-invariant at any scale."""
    from wikipedia_data_pipeline_spark.operators.sampling import det_hash

    ev = load_table(spark, sf_dir, "events")
    u = ev.select("user_id").distinct()
    resp = u.select(
        F.when(det_hash("user_id") % 5 == 0, 1).otherwise(0).alias("a"),
        F.when(
            det_hash((F.col("user_id") % 1000003) * 7 + 3) % 4 < 3, 1
        )
        .otherwise(0)
        .alias("truth_coin"),
    )
    obs = resp.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("a").cast("long").alias("n_true"),
        F.sum(
            F.when(F.col("truth_coin") == 1, F.col("a")).otherwise(
                1 - F.col("a")
            )
        )
        .cast("long")
        .alias("n_yes_reported"),
    )
    lam = F.col("n_yes_reported").cast("double") / F.col("n")
    pi_hat = (lam - 0.25) / 0.5
    pi_true = F.col("n_true").cast("double") / F.col("n")
    return obs.select(
        "n",
        "n_yes_reported",
        lam.alias("lambda_hat"),
        pi_hat.alias("pi_hat"),
        pi_true.alias("pi_true"),
        F.abs(pi_hat - pi_true).alias("abs_err"),
    )


# ---------------------------------------------------------------------------
# epsilon-DP top-k release of heavy-hitter words (round 12, session 6)
# ---------------------------------------------------------------------------
# One-shot Gumbel top-k (Durfee & Rogers 2019): adding independent
# Gumbel noise to eps*count/2 and taking the k largest is equivalent
# to k sequential exponential-mechanism peels — so a single pass
# releases a DP top-k list. Uniforms come from the portable det_hash
# of a deterministic per-word rank id (the dp_median discipline: the
# "random" release replays bit-for-bit in the SQL twin; swapping in a
# real CSPRNG changes one expression). eps is set low enough that the
# noise actually reorders the tail at the gate SF, so the query
# exercises the mechanism, not just argmax-of-counts. The exact count
# rank of each released word ships alongside (the utility audit).

_DPTOPK_EPS = 0.001
_DPTOPK_K = 10


_DPTOPK_ORACLE = f"""
WITH wc AS (
  SELECT x AS word, CAST(count(*) AS BIGINT) AS c
  FROM documents, unnest(string_split(text, ' ')) AS u(x)
  GROUP BY 1
),
rid AS (
  SELECT word, c,
         CAST(row_number() OVER (ORDER BY word) AS BIGINT) AS r,
         CAST(row_number() OVER (ORDER BY c DESC, word) AS BIGINT)
           AS true_count_rank
  FROM wc
),
scored AS (
  SELECT word, c, true_count_rank,
         CAST({_DPTOPK_EPS} AS DOUBLE) * c / 2.0
         - ln(-ln((CAST({{dh}} AS DOUBLE) + 0.5) / {_HASH_MOD}.0))
           AS g_score
  FROM rid
)
SELECT CAST(row_number() OVER (ORDER BY g_score DESC, word) AS BIGINT)
         AS release_rank,
       word, c AS n_occurrences, true_count_rank
FROM scored
ORDER BY g_score DESC, word
LIMIT {_DPTOPK_K}
"""


@register(
    "privacy_dp_topk_words",
    oracle=_DPTOPK_ORACLE.replace("{dh}", SQL_DET_HASH.format(col="r")),
)
def privacy_dp_topk_words(spark, sf_dir):
    """ε-DP top-10 heavy-hitter word release via one-shot Gumbel top-k
    over eps·count/2 — the set-valued companion to
    `privacy_dp_median_release`, with each released word's TRUE count
    rank alongside as the utility audit. See the section comment.

    Scale shape: one token-count hash agg; ranks over the
    Heaps-bounded vocab relation ride hierarchical `ordered_scan`s;
    one TakeOrdered(k)."""
    from wikipedia_data_pipeline_spark.operators.ranks import ordered_scan
    from wikipedia_data_pipeline_spark.operators.sampling import SQL_DET_HASH as _DH
    from wikipedia_data_pipeline_spark.sources.tables import fan_out

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    wc = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    rid = ordered_scan(wc, ["word"], rank_col="r")
    rid = ordered_scan(
        rid, [F.desc("c"), F.asc("word")], rank_col="true_count_rank"
    )
    uni = (
        F.expr(_DH.format(col="r")).cast("double") + 0.5
    ) / float(_HASH_MOD)
    scored = rid.select(
        "word",
        "c",
        "true_count_rank",
        (
            F.lit(_DPTOPK_EPS) * F.col("c") / 2.0 - F.log(-F.log(uni))
        ).alias("g_score"),
    )
    top = scored.orderBy(F.desc("g_score"), F.asc("word")).limit(_DPTOPK_K)
    from pyspark.sql import Window as W

    wr = W.orderBy(F.desc("g_score"), F.asc("word"))
    return top.select(
        F.row_number().over(wr).cast("long").alias("release_rank"),
        "word",
        F.col("c").alias("n_occurrences"),
        "true_count_rank",
    )
