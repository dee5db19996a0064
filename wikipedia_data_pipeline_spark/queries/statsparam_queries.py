"""Parametric moment-based tests over the events stream (round 12,
session 6): Grubbs' extreme-outlier test, the Jarque-Bera normality
screen, and the two-sample Poisson rate-ratio (Wald) test.

Same exactness discipline as the rank/nonparam modules (registry.py
module doc): all sufficient statistics are exact BIGINT/DECIMAL sums
(value cents, cross-multiplied deviations so no rational mean ever
materializes); where a standardized per-row term must be re-summed
(the z-power moments in Jarque-Bera), it is micro-quantized after ONE
fixed double expression over broadcast exact aggregates — the
Brown-Forsythe row-quantization pattern. New module rather than
statstests_queries / statsnonparam_queries, which both sit against the
2,000-line split threshold.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from wikipedia_data_pipeline_spark.registry import register
from wikipedia_data_pipeline_spark.sources.tables import load_table

_US_PER_DAY = 86_400_000_000


# ---------------------------------------------------------------------------
# Grubbs' test for a single extreme outlier in the daily-total series
# ---------------------------------------------------------------------------
# G = max_i |x_i - xbar| / s. The argmax is decided on the EXACT
# integer |n*x_i - S| (cross-multiplied deviation — no float tiebreak),
# and G itself is one fixed double expression over n, S, and the
# DECIMAL sum of squares: G = |n*x* - S| / sqrt(n * (n*Q - S^2) / (n-1))
# (numerator and variance both scaled by n). The day relation is
# calendar-bounded; the only fact-sized work is one hash aggregate.

_GRUBBS_ORACLE = f"""
WITH daily AS (
  SELECT (epoch_us(ts) - (SELECT min(epoch_us(ts)) FROM events))
           // {_US_PER_DAY} AS day_idx,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
  FROM events GROUP BY 1
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS s,
         CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0)) AS q
  FROM daily
),
dev AS (
  SELECT daily.day_idx, daily.x, agg.n, agg.s, agg.q,
         abs(agg.n * daily.x - agg.s) AS abs_dev
  FROM daily CROSS JOIN agg
)
SELECT n AS n_days, day_idx AS day_star, x AS x_star_cents,
       abs_dev AS max_scaled_dev,
       CAST(abs_dev AS DOUBLE)
         / sqrt(CAST(n AS DOUBLE)
                * CAST(CAST(n AS DECIMAL(38,0)) * q
                       - CAST(s AS DECIMAL(38,0)) * s AS DOUBLE)
                / (n - 1)) AS g_stat
FROM dev
ORDER BY abs_dev DESC, day_idx ASC
LIMIT 1
"""


@register("stats_grubbs_outlier", oracle=_GRUBBS_ORACLE)
def stats_grubbs_outlier(spark, sf_dir):
    """Grubbs' maximum-normed-residual test on the daily revenue-total
    series: the single most deviant day and its G statistic — the
    formal version of "is that spike real or just the tail of a normal
    day". See the section comment: the argmax rides the exact integer
    |n*x - S|, and G is one fixed double expression."""
    ev = load_table(spark, sf_dir, "events")
    t0 = ev.agg(F.min(F.col("ts").cast("long")).alias("t0"))
    daily = (
        ev.crossJoin(F.broadcast(t0))
        .groupBy(
            ((F.col("ts").cast("long") - F.col("t0")) / _US_PER_DAY)
            .cast("long")
            .alias("day_idx")
        )
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("x")
        )
    )
    agg = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x"))
        .cast("decimal(38,0)")
        .alias("q"),
    )
    dev = daily.crossJoin(F.broadcast(agg)).select(
        "day_idx",
        "x",
        "n",
        "s",
        "q",
        F.abs(F.col("n") * F.col("x") - F.col("s")).alias("abs_dev"),
    )
    var_scaled = (
        F.col("n").cast("decimal(38,0)") * F.col("q")
        - F.col("s").cast("decimal(38,0)") * F.col("s")
    ).cast("double")
    return (
        dev.orderBy(F.desc("abs_dev"), F.asc("day_idx"))
        .limit(1)
        .select(
            F.col("n").alias("n_days"),
            F.col("day_idx").alias("day_star"),
            F.col("x").alias("x_star_cents"),
            F.col("abs_dev").alias("max_scaled_dev"),
            (
                F.col("abs_dev").cast("double")
                / F.sqrt(
                    F.col("n").cast("double") * var_scaled / (F.col("n") - 1)
                )
            ).alias("g_stat"),
        )
    )


# ---------------------------------------------------------------------------
# Jarque-Bera normality screen on event values
# ---------------------------------------------------------------------------
# JB = n * (g1^2/6 + g2^2/24) from sample skewness g1 and excess
# kurtosis g2. Two passes: (1) exact n, S, sum-of-squares -> mu and
# sigma as broadcast doubles (sigma = sqrt(n*Q - S^2)/n, the DECIMAL
# cross-multiplied form — no rational mean); (2) per-row z = (c-mu)/
# sigma, with z^3 and z^4 micro-quantized to BIGINT after the one
# fixed expression and re-summed in DECIMAL (n^3-scaled all-integer
# fourth moments would overflow DECIMAL(38) at the 100x replica —
# documented trade: the quantization error is bounded by 5e-7 * n
# absolute on each moment sum, identical in both engines).

_JB_ORACLE = """
WITH r AS (SELECT CAST(round(value * 100) AS BIGINT) AS c FROM events),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(c) AS BIGINT) AS s,
         CAST(sum(CAST(c AS DECIMAL(38,0)) * c) AS DECIMAL(38,0)) AS q
  FROM r
),
mo AS (
  SELECT n, s,
         CAST(s AS DOUBLE) / n AS mu,
         sqrt(CAST(CAST(n AS DECIMAL(38,0)) * q
                   - CAST(s AS DECIMAL(38,0)) * s AS DOUBLE)) / n AS sigma
  FROM agg
),
z AS (
  SELECT CAST(round((((CAST(r.c AS DOUBLE) - mo.mu) / mo.sigma)
                     * ((CAST(r.c AS DOUBLE) - mo.mu) / mo.sigma))
                    * ((CAST(r.c AS DOUBLE) - mo.mu) / mo.sigma) * 1e6)
              AS BIGINT) AS t3,
         CAST(round((((CAST(r.c AS DOUBLE) - mo.mu) / mo.sigma)
                     * ((CAST(r.c AS DOUBLE) - mo.mu) / mo.sigma))
                    * (((CAST(r.c AS DOUBLE) - mo.mu) / mo.sigma)
                       * ((CAST(r.c AS DOUBLE) - mo.mu) / mo.sigma)) * 1e6)
              AS BIGINT) AS t4
  FROM r CROSS JOIN mo
),
zs AS (
  SELECT CAST(sum(CAST(t3 AS DECIMAL(38,0))) AS DOUBLE) AS s3,
         CAST(sum(CAST(t4 AS DECIMAL(38,0))) AS DOUBLE) AS s4
  FROM z
)
SELECT mo.n, mo.mu AS mean_cents, mo.sigma AS sd_cents,
       zs.s3 / 1e6 / mo.n AS skewness,
       zs.s4 / 1e6 / mo.n - 3 AS ex_kurtosis,
       CAST(mo.n AS DOUBLE)
         * ((zs.s3 / 1e6 / mo.n) * (zs.s3 / 1e6 / mo.n) / 6
            + (zs.s4 / 1e6 / mo.n - 3) * (zs.s4 / 1e6 / mo.n - 3) / 24)
         AS jb_stat
FROM mo CROSS JOIN zs
"""


@register("stats_jarque_bera", oracle=_JB_ORACLE)
def stats_jarque_bera(spark, sf_dir):
    """Jarque-Bera normality test on event values: skewness, excess
    kurtosis, and JB = n(g1^2/6 + g2^2/24) — the moment screen a
    pipeline runs before trusting z-score outlier gates or normal-
    theory intervals on a metric. See the section comment for the
    two-pass broadcast-moments + micro-quantized z-power construction;
    both passes are single fact scans."""
    ev = load_table(spark, sf_dir, "events")
    r = ev.select(F.round(F.col("value") * 100).cast("long").alias("c"))
    agg = r.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("c").cast("long").alias("s"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c"))
        .cast("decimal(38,0)")
        .alias("q"),
    )
    mo = agg.select(
        "n",
        "s",
        (F.col("s").cast("double") / F.col("n")).alias("mu"),
        (
            F.sqrt(
                (
                    F.col("n").cast("decimal(38,0)") * F.col("q")
                    - F.col("s").cast("decimal(38,0)") * F.col("s")
                ).cast("double")
            )
            / F.col("n")
        ).alias("sigma"),
    )
    zc = (F.col("c").cast("double") - F.col("mu")) / F.col("sigma")
    z = r.crossJoin(F.broadcast(mo)).select(
        F.round(((zc * zc) * zc) * 1e6).cast("long").alias("t3"),
        F.round(((zc * zc) * (zc * zc)) * 1e6).cast("long").alias("t4"),
        "n",
        "mu",
        "sigma",
    )
    zs = z.groupBy("n", "mu", "sigma").agg(
        F.sum(F.col("t3").cast("decimal(38,0)")).cast("double").alias("s3"),
        F.sum(F.col("t4").cast("decimal(38,0)")).cast("double").alias("s4"),
    )
    skew = F.col("s3") / 1e6 / F.col("n")
    ex_k = F.col("s4") / 1e6 / F.col("n") - 3
    return zs.select(
        "n",
        F.col("mu").alias("mean_cents"),
        F.col("sigma").alias("sd_cents"),
        skew.alias("skewness"),
        ex_k.alias("ex_kurtosis"),
        (
            F.col("n").cast("double")
            * (skew * skew / 6 + ex_k * ex_k / 24)
        ).alias("jb_stat"),
    )


# ---------------------------------------------------------------------------
# Two-sample Poisson rate-ratio (Wald) test on purchase incidence
# ---------------------------------------------------------------------------
# The count-data A/B test the lift/chi2 family does not cover: treat
# each arm's total event stream as exposure and its purchase events as
# incidents; RR = (c1/e1)/(c2/e2), z = ln(RR)/sqrt(1/c1 + 1/c2). Arms
# are the same user-parity split as events_ks_test_ab. One fact scan
# with four conditional sums; every statistic is one fixed double
# expression of four exact BIGINTs.

_POISSON_RR_ORACLE = """
WITH cnt AS (
  SELECT
    CAST(sum(CASE WHEN user_id % 2 = 0 AND event_type = 'purchase'
             THEN 1 ELSE 0 END) AS BIGINT) AS c1,
    CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS e1,
    CAST(sum(CASE WHEN user_id % 2 = 1 AND event_type = 'purchase'
             THEN 1 ELSE 0 END) AS BIGINT) AS c2,
    CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS e2
  FROM events
)
SELECT c1 AS n_purchase_a, e1 AS n_events_a,
       c2 AS n_purchase_b, e2 AS n_events_b,
       CAST(c1 AS DOUBLE) / e1 AS rate_a,
       CAST(c2 AS DOUBLE) / e2 AS rate_b,
       (CAST(c1 AS DOUBLE) / e1) / (CAST(c2 AS DOUBLE) / e2) AS rate_ratio,
       ln((CAST(c1 AS DOUBLE) / e1) / (CAST(c2 AS DOUBLE) / e2))
         / sqrt(1.0 / c1 + 1.0 / c2) AS z_wald
FROM cnt
"""


@register("stats_poisson_rate_ratio", oracle=_POISSON_RR_ORACLE)
def stats_poisson_rate_ratio(spark, sf_dir):
    """Wald test for the ratio of purchase rates between the two
    user-parity arms, with total per-arm event volume as exposure —
    the Poisson-count companion to events_ab_test_lift (which compares
    means) and stats_g_test_type_dow (which compares composition).
    See the section comment; one scan, four conditional sums."""
    ev = load_table(spark, sf_dir, "events")
    is_a = F.col("user_id") % 2 == 0
    is_p = F.col("event_type") == "purchase"
    cnt = ev.agg(
        F.sum(F.when(is_a & is_p, 1).otherwise(0)).cast("long").alias("c1"),
        F.sum(F.when(is_a, 1).otherwise(0)).cast("long").alias("e1"),
        F.sum(F.when(~is_a & is_p, 1).otherwise(0)).cast("long").alias("c2"),
        F.sum(F.when(~is_a, 1).otherwise(0)).cast("long").alias("e2"),
    )
    c1, e1 = F.col("c1").cast("double"), F.col("e1")
    c2, e2 = F.col("c2").cast("double"), F.col("e2")
    rr = (c1 / e1) / (c2 / e2)
    return cnt.select(
        F.col("c1").alias("n_purchase_a"),
        F.col("e1").alias("n_events_a"),
        F.col("c2").alias("n_purchase_b"),
        F.col("e2").alias("n_events_b"),
        (c1 / e1).alias("rate_a"),
        (c2 / e2).alias("rate_b"),
        rr.alias("rate_ratio"),
        (
            F.log(rr)
            / F.sqrt(1.0 / F.col("c1") + 1.0 / F.col("c2"))
        ).alias("z_wald"),
    )
