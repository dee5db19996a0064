"""Hypothesis tests, drift screens, and dependence measures over the
events stream: A/B lift, PSI, Benford, KS, Mann-Whitney, bootstrap CI,
correlation matrix, mutual information, KL divergence, lognormal fit,
Theil-Sen / Mann-Kendall trend, chi-square, and CUSUM change-point.
All exact-oracle: test statistics reduce to counts/ranks/decimal sums
both engines compute bit-identically. Split out of stats_queries
(round 9 — the screens/robust-gates half stays there)."""

from __future__ import annotations

from pyspark.sql import functions as F

from wikipedia_data_pipeline_spark.operators.sampling import SQL_DET_HASH
from wikipedia_data_pipeline_spark.registry import register
from wikipedia_data_pipeline_spark.sources.tables import load_table

# microseconds per day (epoch_us day bucketing; same constant as
# stats_queries._US_PER_DAY)
_US_PER_DAY = 86_400_000_000


def sprt_treated_daily_obs(events):
    """Treated-arm (day, conversion) observations for the SPRT monitor —
    the ONE definition of the arm-selection hash and the day divisor,
    shared between the batch test (``events_sprt_ab``) and its
    streaming twin (``streaming.pipeline.run_sprt_daily_counts``): the
    two must stay bit-identical, and a literal edited in only one of
    them would silently desynchronize the monitor from its batch
    oracle. ``events`` needs ``ts`` as epoch-us BIGINT and ``user_id``;
    works on both static and streaming DataFrames (pure narrow ops)."""
    from pyspark.sql import functions as F

    from wikipedia_data_pipeline_spark.operators.sampling import det_hash

    return events.filter(
        (det_hash((F.col("user_id") % 1000003) * 23 + 7) % 2) == 1
    ).select(
        F.expr(f"ts div {_US_PER_DAY}").cast("long").alias("day"),
        (det_hash("user_id") % 2).cast("long").alias("x"),
    )

# --- Experimentation + entity-level splits (round 5) --------------------

@register(
    "events_ab_test_lift",
    oracle="""
WITH u AS (
  SELECT user_id, user_id % 2 AS variant,
         CASE WHEN sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) >= 15
              THEN 1 ELSE 0 END AS converted
  FROM events GROUP BY user_id
),
s AS (
  SELECT variant, count(*) AS n,
         CAST(sum(converted) AS BIGINT) AS conv
  FROM u GROUP BY variant
),
w AS (
  SELECT
    (SELECT n FROM s WHERE variant = 0) AS n_a,
    (SELECT conv FROM s WHERE variant = 0) AS conv_a,
    (SELECT n FROM s WHERE variant = 1) AS n_b,
    (SELECT conv FROM s WHERE variant = 1) AS conv_b
)
SELECT n_a, conv_a, n_b, conv_b,
       CAST(conv_a AS DOUBLE) / n_a AS rate_a,
       CAST(conv_b AS DOUBLE) / n_b AS rate_b,
       CAST(conv_b AS DOUBLE) / n_b - CAST(conv_a AS DOUBLE) / n_a AS lift,
       (CAST(conv_b AS DOUBLE) / n_b - CAST(conv_a AS DOUBLE) / n_a)
         / sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                * (1 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                * (1.0 / n_a + 1.0 / n_b)) AS z_score
FROM w
""",
)
def events_ab_test_lift(spark, sf_dir):
    """Two-proportion A/B readout (variant = user parity, conversion =
    ≥15 clicks — a non-saturated engagement bar on this stream): per-variant user counts, conversion rates, lift, and
    the pooled z-statistic. Every input is an integer aggregate, and
    the statistic uses only IEEE ops that are CORRECTLY-ROUNDED by the
    standard (+ − × ÷ sqrt), so even the z-score is bit-identical
    across engines with no rounding crutch. One user-keyed aggregate
    (the only data shuffle), then arithmetic on a 2-row relation."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.when(
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
            >= 15,
            1,
        )
        .otherwise(0)
        .alias("converted")
    ).select((F.col("user_id") % 2).alias("variant"), "converted")
    s = u.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n"), F.sum("converted").alias("conv")
    )
    a = s.filter(F.col("variant") == 0).select(
        F.col("n").alias("n_a"), F.col("conv").alias("conv_a")
    )
    b = s.filter(F.col("variant") == 1).select(
        F.col("n").alias("n_b"), F.col("conv").alias("conv_b")
    )
    w = a.crossJoin(b)
    rate_a = F.col("conv_a").cast("double") / F.col("n_a")
    rate_b = F.col("conv_b").cast("double") / F.col("n_b")
    pooled = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    return w.select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        rate_a.alias("rate_a"),
        rate_b.alias("rate_b"),
        (rate_b - rate_a).alias("lift"),
        (
            (rate_b - rate_a)
            / F.sqrt(
                pooled
                * (1 - pooled)
                * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
            )
        ).alias("z_score"),
    )


# ---------------------------------------------------------------------------
# Population Stability Index — distribution drift between period halves
# ---------------------------------------------------------------------------
# Term sums over buckets are quantized to BIGINT nano-units before the
# final aggregate (same discipline as the Naive-Bayes micro-nat scores):
# integer sums are associative, so the result is identical under any
# partitioning; each term itself is a fixed IEEE expression of exact
# Laplace-smoothed count ratios.

_PSI_ORACLE = """
WITH b AS (
  SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi,
         max(value) AS vmax
  FROM events
),
tagged AS (
  SELECT event_type,
         CASE WHEN epoch_us(ts) * 2 <= lo + hi THEN 0 ELSE 1 END AS half,
         CAST(least(floor(value / (vmax / 10.0)), 9.0) AS BIGINT) AS bucket
  FROM events, b
),
spine AS (
  SELECT event_type, bucket
  FROM (SELECT DISTINCT event_type FROM tagged),
       (SELECT unnest(generate_series(0, 9)) AS bucket)
),
cnt AS (
  SELECT spine.event_type, spine.bucket,
         coalesce(sum(CASE WHEN half = 0 THEN 1 END), 0) AS ca,
         coalesce(sum(CASE WHEN half = 1 THEN 1 END), 0) AS cb
  FROM spine LEFT JOIN tagged
    ON spine.event_type = tagged.event_type
   AND spine.bucket = tagged.bucket
  GROUP BY spine.event_type, spine.bucket
),
tot AS (
  SELECT event_type, bucket, ca, cb,
         sum(ca) OVER (PARTITION BY event_type) AS ta,
         sum(cb) OVER (PARTITION BY event_type) AS tb
  FROM cnt
),
terms AS (
  SELECT event_type, ta, tb,
         CAST(round(
           ((CAST(ca + 1 AS DOUBLE) / CAST(ta + 10 AS DOUBLE))
            - (CAST(cb + 1 AS DOUBLE) / CAST(tb + 10 AS DOUBLE)))
           * ln((CAST(ca + 1 AS DOUBLE) / CAST(ta + 10 AS DOUBLE))
                / (CAST(cb + 1 AS DOUBLE) / CAST(tb + 10 AS DOUBLE)))
           * 1000000000.0
         ) AS BIGINT) AS term_nano
  FROM tot
)
SELECT event_type,
       CAST(max(ta) AS BIGINT) AS n_first_half,
       CAST(max(tb) AS BIGINT) AS n_second_half,
       CAST(sum(term_nano) AS BIGINT) AS psi_nano
FROM terms GROUP BY event_type
"""


@register("events_psi_drift", oracle=_PSI_ORACLE)
def events_psi_drift(spark, sf_dir):
    """Population Stability Index of the value distribution, first half
    of the observation window vs. second, per event type — the standard
    "did my feature distribution drift?" monitor (PSI > 0.2 = act).

    10 equal-width value buckets (bounds derived from one 1-row min/max
    agg, broadcast), Laplace-smoothed shares so empty buckets stay
    finite, and per-bucket PSI terms quantized to BIGINT nano-units so
    the cross-bucket sum is associative — reproducible on any cluster.
    Heavy lineage: one scan + one (type, bucket) aggregate over a dense
    10-row-per-type spine; everything after is window math on ≤ 50
    rows.
    """
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    b = ev.agg(
        F.min("ts").alias("lo"),
        F.max("ts").alias("hi"),
        F.max("value").alias("vmax"),
    )
    tagged = ev.crossJoin(F.broadcast(b)).select(
        "event_type",
        F.when(F.col("ts") * 2 <= F.col("lo") + F.col("hi"), 0)
        .otherwise(1)
        .alias("half"),
        F.least(
            F.floor(F.col("value") / (F.col("vmax") / 10.0)), F.lit(9.0)
        )
        .cast("long")
        .alias("bucket"),
    )
    spine = (
        tagged.select("event_type")
        .distinct()
        .crossJoin(
            F.broadcast(
                ev.sparkSession.range(0, 10).select(
                    F.col("id").alias("bucket")
                )
            )
        )
    )
    cnt = (
        spine.join(tagged, ["event_type", "bucket"], "left")
        .groupBy("event_type", "bucket")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("half") == 0, 1)), F.lit(0)
            ).alias("ca"),
            F.coalesce(
                F.sum(F.when(F.col("half") == 1, 1)), F.lit(0)
            ).alias("cb"),
        )
    )
    w = Window.partitionBy("event_type")
    tot = cnt.select(
        "event_type",
        "ca",
        "cb",
        F.sum("ca").over(w).alias("ta"),
        F.sum("cb").over(w).alias("tb"),
    )
    pa = (F.col("ca") + 1).cast("double") / (F.col("ta") + 10).cast("double")
    pb = (F.col("cb") + 1).cast("double") / (F.col("tb") + 10).cast("double")
    terms = tot.select(
        "event_type",
        "ta",
        "tb",
        F.round((pa - pb) * F.log(pa / pb) * 1_000_000_000.0)
        .cast("long")
        .alias("term_nano"),
    )
    return terms.groupBy("event_type").agg(
        F.max("ta").cast("long").alias("n_first_half"),
        F.max("tb").cast("long").alias("n_second_half"),
        F.sum("term_nano").cast("long").alias("psi_nano"),
    )


# ---------------------------------------------------------------------------
# Benford first-digit screen
# ---------------------------------------------------------------------------

_BENFORD_ORACLE = """
WITH digits AS (
  SELECT event_type,
         CAST(floor(value / power(10.0, floor(log10(value)))) AS BIGINT)
           AS d
  FROM events WHERE value > 0
),
spine AS (
  SELECT event_type, d
  FROM (SELECT DISTINCT event_type FROM digits),
       (SELECT unnest(generate_series(1, 9)) AS d)
),
cnt AS (
  SELECT spine.event_type, spine.d,
         coalesce(count(digits.d), 0) AS obs
  FROM spine LEFT JOIN digits
    ON spine.event_type = digits.event_type AND spine.d = digits.d
  GROUP BY spine.event_type, spine.d
),
tot AS (
  SELECT event_type, d, obs,
         sum(obs) OVER (PARTITION BY event_type) AS n
  FROM cnt
),
terms AS (
  SELECT event_type, n,
         CAST(round(
           (CAST(obs AS DOUBLE)
            - CAST(n AS DOUBLE) * log10(1.0 + 1.0 / CAST(d AS DOUBLE)))
           * (CAST(obs AS DOUBLE)
              - CAST(n AS DOUBLE) * log10(1.0 + 1.0 / CAST(d AS DOUBLE)))
           / (CAST(n AS DOUBLE) * log10(1.0 + 1.0 / CAST(d AS DOUBLE)))
           * 1000000.0
         ) AS BIGINT) AS term_micro
  FROM tot
)
SELECT event_type, CAST(max(n) AS BIGINT) AS n_values,
       CAST(sum(term_micro) AS BIGINT) AS chi2_micro
FROM terms GROUP BY event_type
"""


@register("events_benford_screen", oracle=_BENFORD_ORACLE)
def events_benford_screen(spark, sf_dir):
    """Benford's-law first-digit screen: χ² distance between the
    observed leading-digit distribution of event values and the Benford
    expectation log10(1+1/d) — the classic fabricated-data / broken-
    instrumentation detector.

    The digit extraction is a fixed double expression (log10/power of
    the same IEEE input on both engines); per-digit χ² terms are
    quantized to BIGINT micro-units before summing so the 9-term
    reduction is associative. Dense digit spine (types × 1..9) keeps
    zero-observation digits in the statistic. One scan + one small
    aggregate; the value > 0 predicate pushes to parquet.
    """
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    digits = ev.filter(F.col("value") > 0).select(
        "event_type",
        F.floor(
            F.col("value") / F.pow(F.lit(10.0), F.floor(F.log10("value")))
        )
        .cast("long")
        .alias("d"),
    )
    spine = (
        digits.select("event_type")
        .distinct()
        .crossJoin(
            F.broadcast(
                ev.sparkSession.range(1, 10).select(F.col("id").alias("d"))
            )
        )
    )
    cnt = (
        spine.alias("s")
        .join(
            digits.alias("g"),
            (F.col("s.event_type") == F.col("g.event_type"))
            & (F.col("s.d") == F.col("g.d")),
            "left",
        )
        .groupBy(F.col("s.event_type").alias("event_type"), F.col("s.d").alias("d"))
        .agg(F.count(F.col("g.d")).alias("obs"))
    )
    w = Window.partitionBy("event_type")
    tot = cnt.select(
        "event_type", "d", "obs", F.sum("obs").over(w).alias("n")
    )
    exp = F.col("n").cast("double") * F.log10(
        1.0 + 1.0 / F.col("d").cast("double")
    )
    dev = F.col("obs").cast("double") - exp
    terms = tot.select(
        "event_type",
        "n",
        F.round(dev * dev / exp * 1_000_000.0).cast("long").alias(
            "term_micro"
        ),
    )
    return terms.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n_values"),
        F.sum("term_micro").cast("long").alias("chi2_micro"),
    )


# ---------------------------------------------------------------------------
# Exact two-sample tests between A/B variants (KS and Mann-Whitney)
# ---------------------------------------------------------------------------
# Both tests reduce to cumulative counts over the DISTINCT-value
# relation: every statistic is integer until one final fixed-form
# double expression, so the result is bit-reproducible under any
# partitioning. The cumulative window is global, but it runs on the
# collapsed distinct-value relation (not the fact table); at cluster
# scale the same prefix-sum runs over a repartitionByRange + running
# per-partition offsets — the plan below is the sf-appropriate form.

_KS_ORACLE = """
WITH v AS (
  SELECT value,
         sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS ca_v,
         sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS cb_v
  FROM events GROUP BY value
),
c AS (
  SELECT sum(ca_v) OVER (ORDER BY value
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS ca,
         sum(cb_v) OVER (ORDER BY value
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS cb,
         sum(ca_v) OVER () AS na,
         sum(cb_v) OVER () AS nb
  FROM v
)
SELECT CAST(max(na) AS BIGINT) AS n_a,
       CAST(max(nb) AS BIGINT) AS n_b,
       CAST(max(abs(ca * max_nb - cb * max_na)) AS BIGINT) AS d_num,
       CAST(max(abs(ca * max_nb - cb * max_na)) AS DOUBLE)
         / (CAST(max(na) AS DOUBLE) * CAST(max(nb) AS DOUBLE)) AS ks_stat
FROM (SELECT ca, cb, na, nb,
             max(na) OVER () AS max_na, max(nb) OVER () AS max_nb
      FROM c)
"""


@register("events_ks_test_ab", oracle=_KS_ORACLE)
def events_ks_test_ab(spark, sf_dir):
    """Exact two-sample Kolmogorov-Smirnov statistic between the A/B
    variants' value distributions (variant = user_id % 2, as in
    `events_ab_test_lift`): D = max |F_a − F_b| with the CDF gap kept
    as the INTEGER |ca·n_b − cb·n_a| until one final division.

    Lineage: one hash-agg collapses the fact table to per-distinct-
    value A/B counts; the cumulative window and the max then run over
    that collapsed relation. Integer cross-multiplication avoids the
    per-row double division a naive CDF comparison would do — and makes
    the max deterministic (no float ties).
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    is_a = (F.col("user_id") % 2 == 0).cast("long")
    v = ev.groupBy("value").agg(
        F.sum(is_a).alias("ca_v"),
        F.sum(1 - is_a).alias("cb_v"),
    )
    run = Window.orderBy("value").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    allw = Window.partitionBy()
    c = v.select(
        F.sum("ca_v").over(run).alias("ca"),
        F.sum("cb_v").over(run).alias("cb"),
        F.sum("ca_v").over(allw).alias("na"),
        F.sum("cb_v").over(allw).alias("nb"),
    )
    gap = F.abs(F.col("ca") * F.col("nb") - F.col("cb") * F.col("na"))
    return c.agg(
        F.max("na").cast("long").alias("n_a"),
        F.max("nb").cast("long").alias("n_b"),
        F.max(gap).cast("long").alias("d_num"),
        (
            F.max(gap).cast("double")
            / (F.max("na").cast("double") * F.max("nb").cast("double"))
        ).alias("ks_stat"),
    )


_MWU_ORACLE = """
WITH v AS (
  SELECT value,
         sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS ca_v,
         sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS cb_v
  FROM events GROUP BY value
),
r AS (
  SELECT ca_v, cb_v, ca_v + cb_v AS t,
         coalesce(sum(ca_v + cb_v) OVER (ORDER BY value
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_before
  FROM v
),
s AS (
  SELECT CAST(sum(ca_v) AS BIGINT) AS na,
         CAST(sum(cb_v) AS BIGINT) AS nb,
         CAST(sum(ca_v * (2 * cum_before + t + 1)) AS BIGINT) AS s2a,
         sum(CAST(t * t * t - t AS DECIMAL(38,0))) AS tie3
  FROM r
)
SELECT na, nb,
       s2a - na * (na + 1) AS u2_a,
       (CAST(s2a - na * (na + 1) AS DOUBLE) - CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))
       / (2.0 * sqrt(
            CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 12.0
            * (CAST(na + nb + 1 AS DOUBLE)
               - CAST(tie3 AS DOUBLE)
                 / (CAST(na + nb AS DOUBLE) * CAST(na + nb - 1 AS DOUBLE)))
          )) AS z_stat
FROM s
"""


@register("events_mannwhitney_ab", oracle=_MWU_ORACLE)
def events_mannwhitney_ab(spark, sf_dir):
    """Exact Mann-Whitney U between the A/B variants — the rank-based
    (distribution-free) companion to the mean-based z-test in
    `events_ab_test_lift`, robust to the heavy tails that
    `events_skew_kurtosis` diagnoses.

    Tie-averaged ranks are kept integral by working in DOUBLED rank
    units: a tied run of t values starting after cum_before rows has
    average 2×rank = 2·cum_before + t + 1, so U arrives as the exact
    BIGINT u2_a = 2·U_a. The tie-corrected normal approximation is one
    fixed double expression over (na, nb, u2_a, Σt³−t). Same collapsed
    distinct-value lineage as the KS test: one hash-agg + prefix sums
    over the distinct-value relation.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    is_a = (F.col("user_id") % 2 == 0).cast("long")
    v = ev.groupBy("value").agg(
        F.sum(is_a).alias("ca_v"),
        F.sum(1 - is_a).alias("cb_v"),
    )
    before = Window.orderBy("value").rowsBetween(
        Window.unboundedPreceding, -1
    )
    t = F.col("ca_v") + F.col("cb_v")
    r = v.select(
        "ca_v",
        "cb_v",
        t.alias("t"),
        F.coalesce(F.sum(t).over(before), F.lit(0)).alias("cum_before"),
    )
    s = r.agg(
        F.sum("ca_v").cast("long").alias("na"),
        F.sum("cb_v").cast("long").alias("nb"),
        F.sum(
            F.col("ca_v") * (2 * F.col("cum_before") + F.col("t") + 1)
        )
        .cast("long")
        .alias("s2a"),
        F.sum(
            (F.col("t") * F.col("t") * F.col("t") - F.col("t")).cast(
                "decimal(38,0)"
            )
        ).alias("tie3"),
    )
    na, nb = F.col("na"), F.col("nb")
    u2a = F.col("s2a") - na * (na + 1)
    nad, nbd = na.cast("double"), nb.cast("double")
    z = (u2a.cast("double") - nad * nbd) / (
        2.0
        * F.sqrt(
            nad * nbd / 12.0
            * (
                (na + nb + 1).cast("double")
                - F.col("tie3").cast("double")
                / ((na + nb).cast("double") * (na + nb - 1).cast("double"))
            )
        )
    )
    return s.select(
        "na",
        "nb",
        u2a.alias("u2_a"),
        z.alias("z_stat"),
    )


# ---------------------------------------------------------------------------
# Deterministic distributed bootstrap (Poissonized resampling)
# ---------------------------------------------------------------------------
# The scale-canonical bootstrap: instead of materializing R resamples,
# each row carries a Poisson(1) weight per replicate (the Poissonized /
# "Bag of Little Bootstraps" trick — one scan, R weighted sums). The
# Poisson draw is the fixed inverse-CDF table below applied to a
# uniform derived from the engine's portable det_hash — so the whole
# procedure is reproducible across engines, runs, and cluster sizes,
# and the DuckDB oracle can replay it exactly.

_BOOT_REPS = 100
# Poisson(1) CDF × 1e6, capped at weight 4 (P(W>4) ≈ 0.37%).
_POIS_CUM = [367879, 735759, 919699, 981012]


def _pois_w_sql(u: str) -> str:
    return (
        f"CASE WHEN {u} < {_POIS_CUM[0]} THEN 0"
        f" WHEN {u} < {_POIS_CUM[1]} THEN 1"
        f" WHEN {u} < {_POIS_CUM[2]} THEN 2"
        f" WHEN {u} < {_POIS_CUM[3]} THEN 3"
        f" ELSE 4 END"
    )


_BOOT_ORACLE = f"""
WITH expanded AS (
  SELECT rep,
         CAST(round(value * 100) AS BIGINT) AS y,
         {SQL_DET_HASH.format(col='(event_id * 101 + rep)')} % 1000000 AS u6
  FROM events,
       (SELECT unnest(generate_series(0, {_BOOT_REPS - 1})) AS rep)
),
reps AS (
  SELECT rep,
         CAST(sum({_pois_w_sql('u6')}) AS BIGINT) AS sw,
         CAST(sum({_pois_w_sql('u6')} * y) AS BIGINT) AS swy
  FROM expanded GROUP BY rep
),
means AS (
  SELECT rep, CAST(swy AS DOUBLE) / CAST(sw AS DOUBLE) AS m,
         row_number() OVER (ORDER BY CAST(swy AS DOUBLE) / CAST(sw AS DOUBLE),
                            rep) AS rn
  FROM reps WHERE sw > 0
),
base AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
           / CAST(count(*) AS DOUBLE) AS mean_scaled
  FROM events
)
SELECT base.n, base.mean_scaled,
       (SELECT m FROM means WHERE rn = 3) AS ci_lo_scaled,
       (SELECT m FROM means WHERE rn = 98) AS ci_hi_scaled,
       CAST({_BOOT_REPS} AS BIGINT) AS n_reps
FROM base
"""


@register("events_bootstrap_ci", oracle=_BOOT_ORACLE)
def events_bootstrap_ci(spark, sf_dir):
    """95% bootstrap CI for the mean event value via deterministic
    Poissonized resampling: each row carries a Poisson(1) weight per
    replicate, drawn by inverse-CDF from the portable hash of
    (event_id, rep) — R=100 resamples in ONE scan, no data
    materialization, fully reproducible (same CI on any cluster).

    This is the production form of the bootstrap at 100 TB: the naive
    version materializes R copies of the data; the Poissonized version
    is a single explode×R (row-local) followed by an R-group hash-agg
    of two BIGINT counters each — shuffle volume is R rows, not R
    datasets. Replicate means order by (mean, rep) for a total order;
    the percentile pick is exact rank 3/98 of 100.
    """
    ev = load_table(spark, sf_dir, "events")
    reps = F.explode(F.sequence(F.lit(0), F.lit(_BOOT_REPS - 1))).alias("rep")
    y = F.round(F.col("value") * 100).cast("long")
    expanded = ev.select(y.alias("y"), "event_id", reps)
    key = F.col("event_id") * 101 + F.col("rep")
    from wikipedia_data_pipeline_spark.operators.sampling import det_hash

    u6 = (det_hash(key) % 1_000_000).alias("u6")
    expanded = expanded.select("rep", "y", u6)
    w = (
        F.when(F.col("u6") < _POIS_CUM[0], 0)
        .when(F.col("u6") < _POIS_CUM[1], 1)
        .when(F.col("u6") < _POIS_CUM[2], 2)
        .when(F.col("u6") < _POIS_CUM[3], 3)
        .otherwise(4)
    )
    rep_sums = (
        expanded.select("rep", w.alias("w"), "y")
        .groupBy("rep")
        .agg(
            F.sum("w").cast("long").alias("sw"),
            F.sum(F.col("w") * F.col("y")).cast("long").alias("swy"),
        )
        .filter(F.col("sw") > 0)
    )
    from pyspark.sql import Window

    m = (F.col("swy").cast("double") / F.col("sw").cast("double")).alias("m")
    rn = F.row_number().over(
        Window.orderBy(
            F.col("swy").cast("double") / F.col("sw").cast("double"),
            F.col("rep"),
        )
    )
    means = rep_sums.select(m, rn.alias("rn"))
    lo = means.filter(F.col("rn") == 3).select(
        F.col("m").alias("ci_lo_scaled")
    )
    hi = means.filter(F.col("rn") == 98).select(
        F.col("m").alias("ci_hi_scaled")
    )
    base = ev.agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.sum(y).cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("mean_scaled"),
    )
    return (
        base.crossJoin(F.broadcast(lo))
        .crossJoin(F.broadcast(hi))
        .withColumn("n_reps", F.lit(_BOOT_REPS).cast("long"))
    )


# ---------------------------------------------------------------------------
# Single-pass feature correlation matrix
# ---------------------------------------------------------------------------

_CORR_EXPR = (
    "(nd * {sab} - {sa} * {sb})"
    " / (sqrt(nd * {saa} - {sa} * {sa})"
    "    * sqrt(nd * {sbb} - {sb} * {sb}))"
)

_CORRM_ORACLE = f"""
WITH p AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS v,
         (epoch_us(ts) // 3600000000) % 24 AS hod,
         (epoch_us(ts) // 86400000000 + 4) % 7 AS dow
  FROM events
),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         sum(CAST(v AS DECIMAL(38,0))) AS sv,
         sum(CAST(hod AS DECIMAL(38,0))) AS sh,
         sum(CAST(dow AS DECIMAL(38,0))) AS sd,
         sum(CAST(v * v AS DECIMAL(38,0))) AS svv,
         sum(CAST(hod * hod AS DECIMAL(38,0))) AS shh,
         sum(CAST(dow * dow AS DECIMAL(38,0))) AS sdd,
         sum(CAST(v * hod AS DECIMAL(38,0))) AS svh,
         sum(CAST(v * dow AS DECIMAL(38,0))) AS svd,
         sum(CAST(hod * dow AS DECIMAL(38,0))) AS shd
  FROM p
),
d AS (
  SELECT n, CAST(n AS DOUBLE) AS nd,
         CAST(sv AS DOUBLE) AS dv, CAST(sh AS DOUBLE) AS dh,
         CAST(sd AS DOUBLE) AS dd, CAST(svv AS DOUBLE) AS dvv,
         CAST(shh AS DOUBLE) AS dhh, CAST(sdd AS DOUBLE) AS ddd,
         CAST(svh AS DOUBLE) AS dvh, CAST(svd AS DOUBLE) AS dvd,
         CAST(shd AS DOUBLE) AS dhd
  FROM s
)
SELECT 'value' AS feat_a, 'hour_of_day' AS feat_b,
       {_CORR_EXPR.format(sab='dvh', sa='dv', sb='dh', saa='dvv', sbb='dhh')}
         AS corr FROM d
UNION ALL
SELECT 'value', 'day_of_week',
       {_CORR_EXPR.format(sab='dvd', sa='dv', sb='dd', saa='dvv', sbb='ddd')}
       FROM d
UNION ALL
SELECT 'hour_of_day', 'day_of_week',
       {_CORR_EXPR.format(sab='dhd', sa='dh', sb='dd', saa='dhh', sbb='ddd')}
       FROM d
"""


@register("events_feature_corr_matrix", oracle=_CORRM_ORACLE)
def events_feature_corr_matrix(spark, sf_dir):
    """Pairwise Pearson correlation matrix of derived event features
    (value, hour-of-day, day-of-week) in ONE scan: all 10 moment sums
    ride a single aggregate, so adding features widens the row instead
    of adding passes — the feature-screening shape that matters when
    the input is 100 TB (k features = one pass, k² counters, not k²
    passes).

    Same exactness discipline as `events_autocorr_lag1`: integer-scaled
    features, DECIMAL moment sums, fixed IEEE Pearson finale shared
    with the oracle text.
    """
    ev = load_table(spark, sf_dir, "events")
    p = ev.select(
        F.round(F.col("value") * 100).cast("long").alias("v"),
        ((F.col("ts") / 3_600_000_000).cast("long") % 24).alias("hod"),
        ((F.col("ts") / 86_400_000_000).cast("long") + 4) .alias("_d"),
    ).select("v", "hod", (F.col("_d") % 7).alias("dow"))
    dec = "decimal(38,0)"
    s = p.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("v").cast(dec)).alias("sv"),
        F.sum(F.col("hod").cast(dec)).alias("sh"),
        F.sum(F.col("dow").cast(dec)).alias("sd"),
        F.sum((F.col("v") * F.col("v")).cast(dec)).alias("svv"),
        F.sum((F.col("hod") * F.col("hod")).cast(dec)).alias("shh"),
        F.sum((F.col("dow") * F.col("dow")).cast(dec)).alias("sdd"),
        F.sum((F.col("v") * F.col("hod")).cast(dec)).alias("svh"),
        F.sum((F.col("v") * F.col("dow")).cast(dec)).alias("svd"),
        F.sum((F.col("hod") * F.col("dow")).cast(dec)).alias("shd"),
    )
    d = s.selectExpr(
        "cast(n as double) AS nd",
        "cast(sv as double) AS dv",
        "cast(sh as double) AS dh",
        "cast(sd as double) AS dd",
        "cast(svv as double) AS dvv",
        "cast(shh as double) AS dhh",
        "cast(sdd as double) AS ddd",
        "cast(svh as double) AS dvh",
        "cast(svd as double) AS dvd",
        "cast(shd as double) AS dhd",
    )
    pairs = [
        ("value", "hour_of_day", "dvh", "dv", "dh", "dvv", "dhh"),
        ("value", "day_of_week", "dvd", "dv", "dd", "dvv", "ddd"),
        ("hour_of_day", "day_of_week", "dhd", "dh", "dd", "dhh", "ddd"),
    ]
    outs = [
        d.selectExpr(
            f"'{a}' AS feat_a",
            f"'{b}' AS feat_b",
            _CORR_EXPR.format(sab=sab, sa=sa, sb=sb, saa=saa, sbb=sbb)
            + " AS corr",
        )
        for a, b, sab, sa, sb, saa, sbb in pairs
    ]
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


# ---------------------------------------------------------------------------
# Mutual information (event_type ; value bucket)
# ---------------------------------------------------------------------------

_MI_ORACLE = """
WITH b AS (SELECT max(value) AS vmax FROM events),
cells AS (
  SELECT event_type AS x,
         CAST(least(floor(value / (vmax / 10.0)), 9.0) AS BIGINT) AS y,
         count(*) AS nxy
  FROM events, b GROUP BY event_type,
       CAST(least(floor(value / (vmax / 10.0)), 9.0) AS BIGINT)
),
m AS (
  SELECT x, y, nxy,
         sum(nxy) OVER (PARTITION BY x) AS nx,
         sum(nxy) OVER (PARTITION BY y) AS ny,
         sum(nxy) OVER () AS n
  FROM cells
),
terms AS (
  SELECT n,
         CAST(round(
           (CAST(nxy AS DOUBLE) / CAST(n AS DOUBLE))
           * ln(CAST(nxy AS DOUBLE) * CAST(n AS DOUBLE)
                / (CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE)))
           * 1000000000.0) AS BIGINT) AS term_nano
  FROM m
)
SELECT CAST(max(n) AS BIGINT) AS n,
       CAST(count(*) AS BIGINT) AS n_cells,
       CAST(sum(term_nano) AS BIGINT) AS mi_nano
FROM terms
"""


@register("events_mutual_information", oracle=_MI_ORACLE)
def events_mutual_information(spark, sf_dir):
    """Mutual information I(event_type ; value-bucket) — the model-free
    "is this feature informative about that label?" screen feature
    selection runs before training (correlation only sees linear
    dependence; MI sees any).

    All probabilities stay as ratios of the BIGINT contingency counts;
    each cell's p·ln(pN²/(nx·ny)) term quantizes to nano-nats so the
    cross-cell sum is associative. The contingency table is one
    hash-agg (≤ 50 cells); the marginals are windows over it.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    b = ev.agg(F.max("value").alias("vmax"))
    cells = (
        ev.crossJoin(F.broadcast(b))
        .select(
            F.col("event_type").alias("x"),
            F.least(
                F.floor(F.col("value") / (F.col("vmax") / 10.0)), F.lit(9.0)
            )
            .cast("long")
            .alias("y"),
        )
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("nxy"))
    )
    m = cells.select(
        "nxy",
        F.sum("nxy").over(Window.partitionBy("x")).alias("nx"),
        F.sum("nxy").over(Window.partitionBy("y")).alias("ny"),
        F.sum("nxy").over(Window.partitionBy()).alias("n"),
    )
    p = F.col("nxy").cast("double") / F.col("n").cast("double")
    ratio = (
        F.col("nxy").cast("double")
        * F.col("n").cast("double")
        / (F.col("nx").cast("double") * F.col("ny").cast("double"))
    )
    terms = m.select(
        "n",
        F.round(p * F.log(ratio) * 1_000_000_000.0)
        .cast("long")
        .alias("term_nano"),
    )
    return terms.agg(
        F.max("n").cast("long").alias("n"),
        F.count(F.lit(1)).alias("n_cells"),
        F.sum("term_nano").cast("long").alias("mi_nano"),
    )


# ---------------------------------------------------------------------------
# Per-user KL divergence from the global behavior mix
# ---------------------------------------------------------------------------

_KL_ORACLE = """
WITH c AS (
  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n_ut
  FROM events GROUP BY user_id, event_type
),
m AS (
  SELECT user_id, event_type, n_ut,
         sum(n_ut) OVER (PARTITION BY user_id) AS n_u,
         sum(n_ut) OVER (PARTITION BY event_type) AS n_t,
         sum(n_ut) OVER () AS n
  FROM c
),
terms AS (
  SELECT user_id, n_u,
         CAST(round(
           (CAST(n_ut AS DOUBLE) / CAST(n_u AS DOUBLE))
           * ln((CAST(n_ut AS DOUBLE) / CAST(n_u AS DOUBLE))
                / (CAST(n_t AS DOUBLE) / CAST(n AS DOUBLE)))
           * 1000000000.0) AS BIGINT) AS term_nano
  FROM m
)
SELECT user_id,
       CAST(max(n_u) AS BIGINT) AS n_events,
       CAST(sum(term_nano) AS BIGINT) AS kl_nano
FROM terms GROUP BY user_id
"""


@register("events_kl_user_vs_global", oracle=_KL_ORACLE)
def events_kl_user_vs_global(spark, sf_dir):
    """Per-user KL divergence of the user's event-type mix from the
    global mix — the relative counterpart to `events_user_entropy`:
    entropy flags low-variety users, KL flags users whose variety is
    *unlike everyone else's* (scripted traffic has both signatures).

    Every probability is a ratio of BIGINT contingency counts; each
    (user, type) term quantizes to nano-nats so the per-user sum is
    associative. Absent types contribute 0 (the Σ p·ln(p/q) convention
    for p=0), so no dense spine is needed.

    Marginal shapes, chosen per cardinality: the per-USER marginal is
    a window partitioned by user_id (1e8+ partitions — fully
    parallel); the per-TYPE and GRAND totals must NOT be windows over
    the (user, type) relation (|types| partitions would funnel 1e8
    rows through a handful of tasks; the grand total through one), so
    they come from a separate |types|-row aggregate of the fact table
    — broadcast back, grand total derived from those 5 rows for free.
    Cost: a second 2-column scan of events with map-side partials,
    instead of serializing the entity relation.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n_ut")
    )
    per_type = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_t"))
    totals = per_type.crossJoin(
        F.broadcast(per_type.select(F.sum("n_t").alias("n")))
    )
    m = c.withColumn(
        "n_u", F.sum("n_ut").over(Window.partitionBy("user_id"))
    ).join(F.broadcast(totals), "event_type")
    p = F.col("n_ut").cast("double") / F.col("n_u").cast("double")
    q = F.col("n_t").cast("double") / F.col("n").cast("double")
    terms = m.select(
        "user_id",
        "n_u",
        F.round(p * F.log(p / q) * 1_000_000_000.0)
        .cast("long")
        .alias("term_nano"),
    )
    return terms.groupBy("user_id").agg(
        F.max("n_u").cast("long").alias("n_events"),
        F.sum("term_nano").cast("long").alias("kl_nano"),
    )


# ---------------------------------------------------------------------------
# Log-normal fit of document lengths
# ---------------------------------------------------------------------------

_LOGNORM_ORACLE = """
WITH distinct_len AS (
  SELECT n_chars, CAST(count(*) AS BIGINT) AS cnt
  FROM documents WHERE n_chars > 0 GROUP BY n_chars
),
q AS (
  SELECT cnt,
         CAST(round(ln(CAST(n_chars AS DOUBLE)) * 1000000000.0) AS BIGINT)
           AS l_nano
  FROM distinct_len
),
s AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS n,
         sum(CAST(cnt * l_nano AS DECIMAL(38,0))) AS sl,
         sum(CAST(cnt AS DECIMAL(38,0))
             * CAST(l_nano AS DECIMAL(38,0))
             * CAST(l_nano AS DECIMAL(38,0))) AS sll
  FROM q
)
SELECT n,
       CAST(sl AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000000.0) AS mu_ln,
       sqrt(CAST(n AS DOUBLE) * CAST(sll AS DOUBLE)
            - CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE))
         / (CAST(n AS DOUBLE) * 1000000000.0) AS sigma_ln
FROM s
"""


@register("documents_length_lognormal_fit", oracle=_LOGNORM_ORACLE)
def documents_length_lognormal_fit(spark, sf_dir):
    """Log-normal MLE fit (μ, σ of ln length) for document lengths —
    natural text lengths are approximately log-normal, so a corpus
    whose fitted σ drifts between snapshots has changed its mix
    (boilerplate floods narrow it; concatenation bugs widen it).

    The transcendental ln is quantized ONCE per distinct length (the
    vocabulary-level discipline — lengths are integers, so the
    quantized log table is exact and engine-portable); the weighted
    moment sums are then pure DECIMAL integer arithmetic, and μ/σ are
    fixed IEEE finales. One tiny distinct-length aggregate does all
    the math — the corpus scan only counts.
    """
    d = load_table(spark, sf_dir, "documents")
    dl = (
        d.filter(F.col("n_chars") > 0)
        .groupBy("n_chars")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    q = dl.select(
        "cnt",
        F.round(F.log(F.col("n_chars").cast("double")) * 1_000_000_000.0)
        .cast("long")
        .alias("l_nano"),
    )
    dec = "decimal(38,0)"
    s = q.agg(
        F.sum("cnt").cast("long").alias("n"),
        F.sum((F.col("cnt") * F.col("l_nano")).cast(dec)).alias("sl"),
        F.sum(
            F.col("cnt").cast(dec)
            * F.col("l_nano").cast(dec)
            * F.col("l_nano").cast(dec)
        ).alias("sll"),
    )
    nd = F.col("n").cast("double")
    sl, sll = F.col("sl").cast("double"), F.col("sll").cast("double")
    return s.select(
        "n",
        (sl / (nd * 1_000_000_000.0)).alias("mu_ln"),
        (F.sqrt(nd * sll - sl * sl) / (nd * 1_000_000_000.0)).alias(
            "sigma_ln"
        ),
    )


@register(
    "events_theil_sen_trend",
    oracle="""
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
         epoch(CAST(date_trunc('day', ts) AS DATE)) // 86400 AS d,
         count(*) AS n
  FROM events GROUP BY 1, 2
),
pairs AS (
  SELECT (b.n - a.n) / (b.d - a.d) AS slope
  FROM daily a JOIN daily b ON a.d < b.d
)
SELECT median(slope) AS ts_slope,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM pairs
""",
)
def events_theil_sen_trend(spark, sf_dir):
    """Theil-Sen slope of the daily event count — the robust companion
    to events_linear_trend's OLS fit (a single corrupted day moves OLS
    arbitrarily; the median of pairwise slopes has a 29% breakdown
    point). The pairwise self-join runs on the DAY-sized aggregate
    (30 days → 435 pairs at any corpus size), so the robustness costs
    O(days²) on a driver-tiny relation, never O(rows). Slopes are
    single double divisions and the median of an odd/even pair count
    interpolates identically in both engines, so the oracle replays
    the estimate bit-for-bit."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            F.date_trunc("day", F.timestamp_micros(F.col("ts")))
            .cast("date")
            .alias("day")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            (F.unix_date(F.col("day"))).cast("long").alias("d"),
            "n",
        )
    )
    b = daily.select(
        F.col("d").alias("d2"), F.col("n").alias("n2")
    )
    pairs = daily.join(b, F.col("d") < F.col("d2")).select(
        ((F.col("n2") - F.col("n")) / (F.col("d2") - F.col("d"))).alias(
            "slope"
        )
    )
    return pairs.agg(
        F.median("slope").alias("ts_slope"),
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
    )


@register(
    "events_mann_kendall_trend",
    oracle="""
WITH daily AS (
  SELECT epoch(CAST(date_trunc('day', ts) AS DATE)) // 86400 AS d,
         count(*) AS n
  FROM events GROUP BY 1
),
pairs AS (
  SELECT CASE WHEN b.n > a.n THEN 1 WHEN b.n < a.n THEN -1 ELSE 0 END AS sgn
  FROM daily a JOIN daily b ON a.d < b.d
),
stats AS (
  SELECT CAST(sum(sgn) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n_pairs,
         (SELECT count(*) FROM daily) AS n_days
  FROM pairs
)
SELECT s, n_pairs, n_days,
       CAST(s AS DOUBLE) / n_pairs AS kendall_tau_a,
       s > 0 AS increasing
FROM stats
""",
)
def events_mann_kendall_trend(spark, sf_dir):
    """Mann-Kendall monotonic-trend test statistic S = Σ sign(n_j−n_i)
    over day pairs, with Kendall's τ-a — the nonparametric yes/no
    companion to the Theil-Sen slope magnitude (no distributional
    assumption, ties contribute zero). Same scale shape: the pairwise
    join runs on the day-sized aggregate, integer sign sums are exact
    in any order, and the one double division replays identically."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            F.date_trunc("day", F.timestamp_micros(F.col("ts")))
            .cast("date")
            .alias("day")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.unix_date(F.col("day")).cast("long").alias("d"), "n")
    )
    b = daily.select(F.col("d").alias("d2"), F.col("n").alias("n2"))
    pairs = daily.join(b, F.col("d") < F.col("d2")).select(
        F.when(F.col("n2") > F.col("n"), 1)
        .when(F.col("n2") < F.col("n"), -1)
        .otherwise(0)
        .alias("sgn")
    )
    n_days = daily.agg(F.count(F.lit(1)).alias("n_days"))
    return (
        pairs.agg(
            F.sum("sgn").cast("long").alias("s"),
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
        )
        .crossJoin(F.broadcast(n_days))
        .select(
            "s",
            "n_pairs",
            "n_days",
            (F.col("s").cast("double") / F.col("n_pairs")).alias(
                "kendall_tau_a"
            ),
            (F.col("s") > 0).alias("increasing"),
        )
    )


@register(
    "events_chi2_type_dow",
    oracle="""
WITH cells AS (
  SELECT event_type,
         (epoch(CAST(date_trunc('day', ts) AS DATE)) // 86400) % 7 AS dow,
         count(*) AS o
  FROM events GROUP BY 1, 2
),
m AS (
  SELECT c.event_type, c.dow, c.o,
         sum(c.o) OVER (PARTITION BY c.event_type) AS rt,
         sum(c.o) OVER (PARTITION BY c.dow) AS ct,
         sum(c.o) OVER () AS n
  FROM cells c
)
SELECT CAST(sum(CAST(
         (o - CAST(rt * ct AS DOUBLE) / n)
         * (o - CAST(rt * ct AS DOUBLE) / n)
         / (CAST(rt * ct AS DOUBLE) / n) AS DECIMAL(18, 6)))
       AS DOUBLE) AS chi2,
       CAST((count(DISTINCT event_type) - 1)
            * (count(DISTINCT dow) - 1) AS BIGINT) AS dof,
       CAST(max(n) AS BIGINT) AS n_events
FROM m
""",
)
def events_chi2_type_dow(spark, sf_dir):
    """Chi-square independence audit of event type × day-of-week — the
    drift screen for 'does traffic mix depend on weekday'. All heavy
    work is one hash aggregate to the 35-cell contingency table;
    margins ride windows over that tiny relation. The weekday bucket
    is epoch-day mod 7 (engine-free arithmetic, not locale-dependent
    dayofweek functions), and per-cell terms round through
    DECIMAL(18,6) before summing so the statistic is bit-identical
    under any parallel addition order."""
    cells = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            (
                F.unix_date(
                    F.date_trunc(
                        "day", F.timestamp_micros(F.col("ts"))
                    ).cast("date")
                ).cast("long")
                % 7
            ).alias("dow"),
        )
        .agg(F.count(F.lit(1)).alias("o"))
    )
    from pyspark.sql import Window

    m = (
        cells.withColumn(
            "rt", F.sum("o").over(Window.partitionBy("event_type"))
        )
        .withColumn("ct", F.sum("o").over(Window.partitionBy("dow")))
        .withColumn(
            "n",
            F.sum("o").over(
                Window.partitionBy()
            ),
        )
    )
    e = (F.col("rt") * F.col("ct")).cast("double") / F.col("n")
    term = ((F.col("o") - e) * (F.col("o") - e) / e).cast("decimal(18,6)")
    return m.agg(
        F.sum(term).cast("double").alias("chi2"),
        (
            (F.countDistinct("event_type") - 1)
            * (F.countDistinct("dow") - 1)
        )
        .cast("long")
        .alias("dof"),
        F.max("n").cast("long").alias("n_events"),
    )


# --- CUSUM change-point detection (round 7) -----------------------------


@register(
    "events_changepoint_value",
    oracle=f"""
WITH daily AS (
  SELECT (epoch_us(ts) - (SELECT min(epoch_us(ts)) FROM events))
           // {_US_PER_DAY} AS day_idx,
         CAST(count(*) AS BIGINT) AS n_t,
         CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) AS u_t
  FROM events GROUP BY 1
),
cum AS (
  SELECT day_idx, n_t, u_t,
         CAST(sum(n_t) OVER w AS BIGINT) AS cum_n,
         CAST(sum(u_t) OVER w AS BIGINT) AS cum_u,
         CAST(sum(n_t) OVER () AS BIGINT) AS tot_n,
         CAST(sum(u_t) OVER () AS BIGINT) AS tot_u
  FROM daily
  WINDOW w AS (ORDER BY day_idx ROWS UNBOUNDED PRECEDING)
),
dev AS (
  SELECT day_idx, cum_n, cum_u, tot_n, tot_u,
         abs(CAST(cum_u AS DECIMAL(38,0)) * tot_n
             - CAST(cum_n AS DECIMAL(38,0)) * tot_u) AS abs_d
  FROM cum
  WHERE cum_n < tot_n
)
SELECT day_idx AS cp_day,
       CAST(abs_d AS DOUBLE) / tot_n / 1000000 AS cusum_stat,
       CAST(cum_u AS DOUBLE) / cum_n / 1000000 AS mean_before,
       CAST(tot_u - cum_u AS DOUBLE) / (tot_n - cum_n) / 1000000
         AS mean_after
FROM dev
ORDER BY abs_d DESC, day_idx ASC
LIMIT 1
""",
)
def events_changepoint_value(spark, sf_dir):
    """Single change-point detection on the daily event-value series —
    the screen a data pipeline runs before trusting a drifting metric:
    the split point t* maximizing the CUSUM deviation |S_t| where
    S_t = cum(t) - (cum_rows(t)/N)*total. Everything up to the final
    division is integer-exact: values in BIGINT micro-units (the
    cents_sum convention), and the deviation cross-multiplied to
    D_t = cum_u*N - cum_n*total_u through DECIMAL(38,0) (the products
    reach ~1e23 at the 100x replica — past int64, trivially inside
    decimal), so the argmax day is exact in both engines, not a float
    tiebreak. The day relation is calendar-sized (~30 rows), so its
    running window and the argmax sort are legal single-partition ops;
    the only fact-sized work is one hash aggregate."""
    from pyspark.sql import Window

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
            F.count(F.lit(1)).cast("long").alias("n_t"),
            F.sum(F.round(F.col("value") * 1000000).cast("long"))
            .cast("long")
            .alias("u_t"),
        )
    )
    w = Window.orderBy("day_idx").rowsBetween(Window.unboundedPreceding, 0)
    wa = Window.orderBy("day_idx").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = daily.select(
        "day_idx",
        F.sum("n_t").over(w).cast("long").alias("cum_n"),
        F.sum("u_t").over(w).cast("long").alias("cum_u"),
        F.sum("n_t").over(wa).cast("long").alias("tot_n"),
        F.sum("u_t").over(wa).cast("long").alias("tot_u"),
    )
    dev = cum.filter(F.col("cum_n") < F.col("tot_n")).select(
        "day_idx",
        "cum_n",
        "cum_u",
        "tot_n",
        "tot_u",
        F.abs(
            F.col("cum_u").cast("decimal(38,0)") * F.col("tot_n")
            - F.col("cum_n").cast("decimal(38,0)") * F.col("tot_u")
        ).alias("abs_d"),
    )
    return (
        dev.orderBy(F.desc("abs_d"), F.asc("day_idx"))
        .limit(1)
        .select(
            F.col("day_idx").alias("cp_day"),
            (
                F.col("abs_d").cast("double") / F.col("tot_n") / 1000000
            ).alias("cusum_stat"),
            (
                F.col("cum_u").cast("double") / F.col("cum_n") / 1000000
            ).alias("mean_before"),
            (
                (F.col("tot_u") - F.col("cum_u")).cast("double")
                / (F.col("tot_n") - F.col("cum_n"))
                / 1000000
            ).alias("mean_after"),
        )
    )


@register(
    "events_sprt_ab",
    oracle=f"""
WITH obs AS (
  SELECT epoch_us(ts) // 86400000000 AS day,
         CAST(({SQL_DET_HASH.format(col="user_id")}) % 2 AS BIGINT) AS x
  FROM events
  WHERE CAST(({SQL_DET_HASH.format(col="((user_id % 1000003) * 23 + 7)")}) % 2 AS BIGINT) = 1
),
daily AS (
  SELECT day, CAST(count(*) AS BIGINT) AS n_day,
         CAST(sum(x) AS BIGINT) AS k_day
  FROM obs GROUP BY day
),
cum AS (
  SELECT day,
         CAST(sum(n_day) OVER (ORDER BY day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_cum,
         CAST(sum(k_day) OVER (ORDER BY day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS k_cum
  FROM daily
)
SELECT CAST(day AS BIGINT) AS day, n_cum, k_cum,
       CAST(k_cum * 95310180 + (n_cum - k_cum) * (-105360516) AS DOUBLE)
         / 1000000000 AS llr,
       CASE
         WHEN k_cum * 95310180 + (n_cum - k_cum) * (-105360516)
              >= 2944438979 THEN 'reject_h0'
         WHEN k_cum * 95310180 + (n_cum - k_cum) * (-105360516)
              <= -2944438979 THEN 'accept_h0'
         ELSE 'continue'
       END AS decision
FROM cum
ORDER BY day
""",
)
def events_sprt_ab(spark, sf_dir):
    """Wald sequential probability-ratio test (SPRT) — the always-valid
    sequential monitor an experimentation platform runs so it can stop
    an A/B arm early without peeking penalties: day-by-day cumulative
    log-likelihood ratio for H1: p=0.55 vs H0: p=0.5 over the treated
    arm's conversion stream, against the alpha=beta=0.05 decision
    boundaries ln(19)/-ln(19). Completes the testing family's fixed-
    horizon tests (z, KS, Mann-Whitney) with the sequential shape.

    Exactness: the LLR is k*ln(p1/p0) + (n-k)*ln((1-p1)/(1-p0)) — both
    transcendentals FROZEN as nano-nat integer literals (95310180,
    -105360516; the ml_eval_ndcg_events frozen-literal discipline), so
    the cumulative statistic and the boundary comparisons are pure
    BIGINT arithmetic; the reported llr double is one division of that
    exact integer. Hash-parity conversions (true p=0.5): the LLR
    drifts at -5.02 millinats/observation in expectation, so marching
    into 'accept_h0' and staying there is the designed fixed point.

    Scale shape: scan -> per-day hash agg; the cumulative window runs
    over the day spine (date-keyed, bounded by the calendar — the
    audit_windows-safe class), never over events."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    # ts is epoch-us BIGINT after load_table's normalize_event_time
    obs = sprt_treated_daily_obs(ev)
    daily = obs.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("n_day"),
        F.sum("x").cast("long").alias("k_day"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    cum = daily.select(
        "day",
        F.sum("n_day").over(w).cast("long").alias("n_cum"),
        F.sum("k_day").over(w).cast("long").alias("k_cum"),
    )
    llr_nano = F.col("k_cum") * F.lit(95310180) + (
        F.col("n_cum") - F.col("k_cum")
    ) * F.lit(-105360516)
    return cum.select(
        "day",
        "n_cum",
        "k_cum",
        (llr_nano.cast("double") / F.lit(1_000_000_000)).alias("llr"),
        F.when(llr_nano >= 2944438979, F.lit("reject_h0"))
        .when(llr_nano <= -2944438979, F.lit("accept_h0"))
        .otherwise(F.lit("continue"))
        .alias("decision"),
    ).orderBy("day")


_BH_ORACLE = """
WITH v AS (
  SELECT event_type, value,
         sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS ca_v,
         sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS cb_v
  FROM events GROUP BY event_type, value
),
c AS (
  SELECT event_type,
         sum(ca_v) OVER (PARTITION BY event_type ORDER BY value
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS ca,
         sum(cb_v) OVER (PARTITION BY event_type ORDER BY value
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS cb,
         sum(ca_v) OVER (PARTITION BY event_type) AS na,
         sum(cb_v) OVER (PARTITION BY event_type) AS nb
  FROM v
),
per AS (
  SELECT event_type,
         CAST(max(na) AS BIGINT) AS n_a,
         CAST(max(nb) AS BIGINT) AS n_b,
         CAST(max(abs(ca * nb - cb * na)) AS BIGINT) AS d_num
  FROM c GROUP BY event_type
),
scored AS (
  SELECT event_type, n_a, n_b, d_num,
         CAST(d_num AS DOUBLE)
           / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) AS ks_stat,
         least(CAST(1000000000 AS BIGINT),
               CAST(round(2.0 * exp(
                 -2.0 * (CAST(d_num AS DOUBLE)
                         / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)))
                      * (CAST(d_num AS DOUBLE)
                         / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)))
                      * CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
                      / CAST(n_a + n_b AS DOUBLE)) * 1000000000.0)
                    AS BIGINT)) AS p_nano
  FROM per
),
m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM scored),
ranked AS (
  SELECT s.*, m.m,
         CAST(row_number() OVER (ORDER BY p_nano ASC, event_type ASC)
              AS BIGINT) AS bh_rank
  FROM scored s, m
),
cut AS (
  SELECT CAST(max(CASE WHEN p_nano * m <= bh_rank * 100000000
                       THEN bh_rank ELSE 0 END) AS BIGINT) AS cutoff
  FROM ranked
)
SELECT event_type, n_a, n_b, d_num, ks_stat,
       CAST(p_nano AS DOUBLE) / 1000000000.0 AS p_value,
       bh_rank,
       bh_rank <= cutoff AS rejected
FROM ranked, cut
"""


@register("stats_bh_fdr_screen", oracle=_BH_ORACLE)
def stats_bh_fdr_screen(spark, sf_dir):
    """Benjamini-Hochberg FDR control (q = 0.10) over a battery of
    per-event-type two-sample KS tests (arm = user_id % 2 — parity
    data, so every null is true and the designed fixed point is ZERO
    rejections at FDR q): the multiple-testing layer every metrics
    platform needs once it screens many slices at once. The KS
    statistic per type is the events_ks_test_ab integer
    cross-multiplication discipline partitioned by type; p-values are
    the asymptotic tail bound 2·exp(-2·D²·n_a·n_b/(n_a+n_b)), capped
    at 1 and quantized ONCE to nano-units so the BH step-up — find
    the largest rank i with p_(i) <= i·q/m, reject ranks <= i — runs
    on pure BIGINT comparisons (p_nano·m <= i·10^8) both engines
    evaluate identically.

    Scale shape: fact scan -> (type, value) hash agg -> per-type
    cumulative windows over the COLLAPSED distinct-value relation ->
    type-level rows; the BH layer (rank, step-up cutoff) runs on the
    handful of per-type rows (agg-backed low-cardinality windows)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    is_a = (F.col("user_id") % 2 == 0).cast("long")
    v = ev.groupBy("event_type", "value").agg(
        F.sum(is_a).alias("ca_v"),
        F.sum(1 - is_a).alias("cb_v"),
    )
    run = Window.partitionBy("event_type").orderBy("value").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tw = Window.partitionBy("event_type")
    c = v.select(
        "event_type",
        F.sum("ca_v").over(run).alias("ca"),
        F.sum("cb_v").over(run).alias("cb"),
        F.sum("ca_v").over(tw).alias("na"),
        F.sum("cb_v").over(tw).alias("nb"),
    )
    gap = F.abs(F.col("ca") * F.col("nb") - F.col("cb") * F.col("na"))
    per = c.groupBy("event_type").agg(
        F.max("na").cast("long").alias("n_a"),
        F.max("nb").cast("long").alias("n_b"),
        F.max(gap).cast("long").alias("d_num"),
    )
    ks = F.col("d_num").cast("double") / (
        F.col("n_a").cast("double") * F.col("n_b").cast("double")
    )
    scored = per.select(
        "event_type",
        "n_a",
        "n_b",
        "d_num",
        ks.alias("ks_stat"),
        F.least(
            F.lit(1_000_000_000).cast("long"),
            F.round(
                F.lit(2.0)
                * F.exp(
                    F.lit(-2.0)
                    * ks
                    * ks
                    * F.col("n_a").cast("double")
                    * F.col("n_b").cast("double")
                    / (F.col("n_a") + F.col("n_b")).cast("double")
                )
                * 1_000_000_000.0
            ).cast("long"),
        ).alias("p_nano"),
    )
    m = scored.agg(F.count(F.lit(1)).cast("long").alias("m"))
    ranked = scored.crossJoin(F.broadcast(m)).withColumn(
        "bh_rank",
        F.row_number()
        .over(Window.orderBy(F.asc("p_nano"), F.asc("event_type")))
        .cast("long"),
    )
    cutoff = F.max(
        F.when(
            F.col("p_nano") * F.col("m")
            <= F.col("bh_rank") * F.lit(100_000_000),
            F.col("bh_rank"),
        ).otherwise(F.lit(0))
    ).over(Window.partitionBy())
    return ranked.select(
        "event_type",
        "n_a",
        "n_b",
        "d_num",
        "ks_stat",
        (F.col("p_nano").cast("double") / 1_000_000_000.0).alias("p_value"),
        "bh_rank",
        (F.col("bh_rank") <= cutoff).alias("rejected"),
    )


# ---------------------------------------------------------------------------
# Permutation test via deterministic hash reassignments (round 10)
# ---------------------------------------------------------------------------

_PERM_K = 199  # pseudo-permutations; k=0 is the OBSERVED assignment

_PERM_ORACLE = f"""
WITH per_user AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_u,
         CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) AS s_u
  FROM events GROUP BY user_id
),
assigned AS (
  SELECT k, n_u, s_u,
         CAST(({SQL_DET_HASH.format(col="((user_id % 1000003) * (2 * k + 1) + k)")}) % 2 AS BIGINT) AS arm
  FROM per_user, (SELECT unnest(generate_series(0, {_PERM_K})) AS k)
),
arms AS (
  SELECT k,
         CAST(sum(CASE WHEN arm = 1 THEN n_u ELSE 0 END) AS BIGINT) AS n1,
         CAST(sum(CASE WHEN arm = 1 THEN s_u ELSE 0 END) AS BIGINT) AS s1,
         CAST(sum(CASE WHEN arm = 0 THEN n_u ELSE 0 END) AS BIGINT) AS n0,
         CAST(sum(CASE WHEN arm = 0 THEN s_u ELSE 0 END) AS BIGINT) AS s0
  FROM assigned GROUP BY k
),
diffs AS (
  SELECT k,
         CAST(round((CAST(s1 AS DOUBLE) / n1 - CAST(s0 AS DOUBLE) / n0)
                    * 1000.0) AS BIGINT) AS diff_nano
  FROM arms WHERE n1 > 0 AND n0 > 0
),
obs AS (SELECT diff_nano AS obs_nano FROM diffs WHERE k = 0)
SELECT CAST((SELECT count(*) FROM diffs) AS BIGINT) AS n_perms_valid,
       (SELECT obs_nano FROM obs) AS obs_diff_nano,
       (SELECT count(*) FROM obs) = 1 AS obs_valid,
       CAST((SELECT count(*) FROM diffs, obs
             WHERE k > 0 AND abs(diff_nano) >= abs(obs_nano)) AS BIGINT)
         AS n_as_extreme,
       CASE WHEN (SELECT count(*) FROM obs) = 1 THEN
       CAST(1 + (SELECT count(*) FROM diffs, obs
                 WHERE k > 0 AND abs(diff_nano) >= abs(obs_nano)) AS DOUBLE)
         / CAST(1 + (SELECT count(*) - 1 FROM diffs) AS DOUBLE) END AS p_value
"""


@register("stats_permutation_test_ab", oracle=_PERM_ORACLE)
def stats_permutation_test_ab(spark, sf_dir):
    """Permutation test for the A/B mean-value difference with
    DETERMINISTIC pseudo-permutations: permutation k reassigns each
    user's arm by an independent hash stream (k=0 reproduces the
    engine's standard observed assignment, det_hash(user_id) % 2,
    because user ids sit far below the 1000003 pre-reduction), and the
    two-sided p-value is the add-one estimator
    (1 + #{k>0: |d_k| >= |d_obs|}) / (K + 1) — Monte-Carlo permutation
    inference (Good, 'Permutation Tests') with the repo's reproducible
    hash-stream discipline instead of an RNG, so the test is
    bit-stable across runs, partitionings, and engines.

    Exactness: per-user (n_u, Σ micro-units) are exact BIGINTs; each
    permutation's mean difference quantizes ONCE to fixed-point
    (micro-units × 1000 = nano-dollars) and every comparison is then
    integer. Randomization is user-level (clustered), matching how
    the observed assignment would be deployed. The k=0 observed row
    could in principle fail the n1>0/n0>0 validity filter (one arm
    empty); the output carries an explicit `obs_valid` flag and a
    NULL p_value for that degenerate case instead of silently
    reporting n_as_extreme = 0 against a missing observation.

    Scale shape: ONE fact-table hash-agg to the user relation (the
    only wide exchange), then a |users| × (K+1) explode of the TINY
    entity relation (users × 200 rows), one more small agg, and a
    200-row comparison against the broadcast k=0 row. The fact table
    is never replicated K ways — the permutation fan-out happens
    after aggregation, which is what makes 200 permutations viable
    at 100 TB."""
    from wikipedia_data_pipeline_spark.operators.sampling import det_hash

    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_u"),
        F.sum(F.round(F.col("value") * 1_000_000).cast("long"))
        .cast("long")
        .alias("s_u"),
    )
    ks = F.explode(F.sequence(F.lit(0), F.lit(_PERM_K))).alias("k")
    assigned = per_user.select("user_id", "n_u", "s_u", ks).select(
        "k",
        "n_u",
        "s_u",
        (
            det_hash(
                (F.col("user_id") % 1000003) * (2 * F.col("k") + 1)
                + F.col("k")
            )
            % 2
        )
        .cast("long")
        .alias("arm"),
    )
    arms = assigned.groupBy("k").agg(
        F.sum(F.when(F.col("arm") == 1, F.col("n_u")).otherwise(0))
        .cast("long")
        .alias("n1"),
        F.sum(F.when(F.col("arm") == 1, F.col("s_u")).otherwise(0))
        .cast("long")
        .alias("s1"),
        F.sum(F.when(F.col("arm") == 0, F.col("n_u")).otherwise(0))
        .cast("long")
        .alias("n0"),
        F.sum(F.when(F.col("arm") == 0, F.col("s_u")).otherwise(0))
        .cast("long")
        .alias("s0"),
    )
    diffs = arms.filter((F.col("n1") > 0) & (F.col("n0") > 0)).select(
        "k",
        F.round(
            (
                F.col("s1").cast("double") / F.col("n1")
                - F.col("s0").cast("double") / F.col("n0")
            )
            * 1000.0
        )
        .cast("long")
        .alias("diff_nano"),
    )
    obs = diffs.filter(F.col("k") == 0).select(
        F.col("diff_nano").alias("obs_nano")
    )
    # LEFT join (not crossJoin): if the k=0 observed assignment were
    # ever dropped by the n1>0/n0>0 validity filter, a cross join
    # would silently empty the whole relation — the left join keeps
    # the permutation rows and surfaces the degeneracy as
    # obs_valid = false / p_value = NULL instead.
    joined = diffs.join(F.broadcast(obs), F.lit(True), "left")
    return joined.agg(
        F.count(F.lit(1)).cast("long").alias("n_perms_valid"),
        F.max("obs_nano").alias("obs_diff_nano"),
        F.sum(
            F.when(
                (F.col("k") > 0)
                & (F.abs("diff_nano") >= F.abs("obs_nano")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_as_extreme"),
    ).select(
        "n_perms_valid",
        "obs_diff_nano",
        F.col("obs_diff_nano").isNotNull().alias("obs_valid"),
        "n_as_extreme",
        F.when(
            F.col("obs_diff_nano").isNotNull(),
            (1 + F.col("n_as_extreme")).cast("double")
            / (F.col("n_perms_valid")).cast("double"),
        ).alias("p_value"),
    )


# ---------------------------------------------------------------------------
# TOST equivalence test for two proportions (round 10)
# ---------------------------------------------------------------------------

_TOST_DELTA_U = 30_000  # equivalence margin, micro-units (0.03)
_TOST_ZC_U = 1_644_854  # z_{0.95}, micro-units (one-sided alpha=0.05)

_TOST_ORACLE = f"""
WITH u AS (
  SELECT user_id, user_id % 2 AS variant,
         CASE WHEN sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) >= 15
              THEN 1 ELSE 0 END AS converted
  FROM events GROUP BY user_id
),
s AS (
  SELECT variant, count(*) AS n, CAST(sum(converted) AS BIGINT) AS conv
  FROM u GROUP BY variant
),
w AS (
  SELECT
    (SELECT n FROM s WHERE variant = 0) AS n_a,
    (SELECT conv FROM s WHERE variant = 0) AS conv_a,
    (SELECT n FROM s WHERE variant = 1) AS n_b,
    (SELECT conv FROM s WHERE variant = 1) AS conv_b
),
m AS (
  SELECT n_a, conv_a, n_b, conv_b,
         conv_b * n_a - conv_a * n_b AS d,
         n_a * n_b AS mm,
         conv_a + conv_b AS c,
         n_a + n_b AS nn
  FROM w
),
dec AS (
  SELECT m.*,
         d * 1000000 + {_TOST_DELTA_U} * mm AS a_low,
         d * 1000000 - {_TOST_DELTA_U} * mm AS a_up,
         CAST({_TOST_ZC_U} AS HUGEINT) * {_TOST_ZC_U}
           * (c * (nn - c)) * CAST(mm AS HUGEINT) AS rhs,
         CAST(nn AS HUGEINT) AS scale_l
  FROM m
)
SELECT n_a, conv_a, n_b, conv_b,
       CASE WHEN c > 0 AND c < nn THEN
       (CAST(conv_b AS DOUBLE) / n_b - CAST(conv_a AS DOUBLE) / n_a + 0.03)
         / sqrt((CAST(c AS DOUBLE) / nn) * (1 - CAST(c AS DOUBLE) / nn)
                * (1.0 / n_a + 1.0 / n_b)) END AS z_lower,
       CASE WHEN c > 0 AND c < nn THEN
       (CAST(conv_b AS DOUBLE) / n_b - CAST(conv_a AS DOUBLE) / n_a - 0.03)
         / sqrt((CAST(c AS DOUBLE) / nn) * (1 - CAST(c AS DOUBLE) / nn)
                * (1.0 / n_a + 1.0 / n_b)) END AS z_upper,
       (a_low >= 0 AND CAST(a_low AS HUGEINT) * a_low * scale_l >= rhs)
       AND
       (a_up <= 0 AND CAST(a_up AS HUGEINT) * a_up * scale_l >= rhs)
         AS equivalent
FROM dec
"""


@register("stats_tost_equivalence", oracle=_TOST_ORACLE)
def stats_tost_equivalence(spark, sf_dir):
    """TOST equivalence test (Schuirmann's two one-sided tests) for
    the two-proportion A/B — the question events_ab_test_lift CANNOT
    answer: not "is B different" but "is B provably WITHIN ±3 points
    of A" (the parity bar for tokenizer swaps, infra migrations,
    cheaper-model rollouts). Equivalent iff (lift+δ)/se ≥ z_c AND
    (lift−δ)/se ≤ −z_c at one-sided α = 0.05. Same conversion
    construction as ab_test_lift, so the two readouts are directly
    comparable.

    Exactness: the DECISION never touches a float — with lift = D/M
    (D = conv_b·n_a − conv_a·n_b, M = n_a·n_b), pooled se² =
    C(N−C)/(N·n_a·n_b), and δ, z_c frozen as micro-unit integer
    literals, each one-sided condition squares (sign-guarded) to
        (D·10⁶ ± δ_u·M)² · N  ≥  z_c_u² · C(N−C) · M
    (the common positive factor M divided out of both sides — the
    undivided form (…)²·N·M vs …·M² overflows DECIMAL(38,0)/HUGEINT
    at ~2e4 users per arm; this form holds to ~1.5e5 per arm, i.e.
    lhs = a²·N with a ≤ n²·10⁶ stays under 10³⁸ while n ≤ ~1.5e5).
    The reported z's use only correctly-rounded IEEE ops in a fixed
    order (the ab_test_lift discipline), bit-identical across
    engines.

    Scale shape: one user-keyed aggregate (the only data shuffle),
    then arithmetic on a 2-row relation."""
    ev = load_table(spark, sf_dir, "events")
    u = (
        ev.groupBy("user_id")
        .agg(
            F.when(
                F.sum(
                    F.when(F.col("event_type") == "click", 1).otherwise(0)
                )
                >= 15,
                1,
            )
            .otherwise(0)
            .alias("converted")
        )
        .select((F.col("user_id") % 2).alias("variant"), "converted")
    )
    s = u.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("converted").cast("long").alias("conv"),
    )
    a = s.filter(F.col("variant") == 0).select(
        F.col("n").alias("n_a"), F.col("conv").alias("conv_a")
    )
    b = s.filter(F.col("variant") == 1).select(
        F.col("n").alias("n_b"), F.col("conv").alias("conv_b")
    )
    m = a.crossJoin(b).select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        (F.col("conv_b") * F.col("n_a") - F.col("conv_a") * F.col("n_b"))
        .cast("long")
        .alias("d"),
        (F.col("n_a") * F.col("n_b")).cast("long").alias("mm"),
        (F.col("conv_a") + F.col("conv_b")).cast("long").alias("c"),
        (F.col("n_a") + F.col("n_b")).cast("long").alias("nn"),
    )
    dec18 = lambda col: col.cast("decimal(18,0)")  # noqa: E731
    a_low = (F.col("d") * 1_000_000 + _TOST_DELTA_U * F.col("mm")).cast("long")
    a_up = (F.col("d") * 1_000_000 - _TOST_DELTA_U * F.col("mm")).cast("long")
    cn = (F.col("c") * (F.col("nn") - F.col("c"))).cast("long")
    rhs = (
        (dec18(F.lit(_TOST_ZC_U)) * F.lit(_TOST_ZC_U)).cast("decimal(38,0)")
        * dec18(cn)
    ).cast("decimal(38,0)") * dec18(F.col("mm"))
    scale_l = dec18(F.col("nn"))
    lhs_low = (dec18(a_low) * dec18(a_low)).cast("decimal(38,0)") * scale_l
    lhs_up = (dec18(a_up) * dec18(a_up)).cast("decimal(38,0)") * scale_l
    lift = (
        F.col("conv_b").cast("double") / F.col("n_b")
        - F.col("conv_a").cast("double") / F.col("n_a")
    )
    pbar = F.col("c").cast("double") / F.col("nn")
    se = F.sqrt(
        pbar * (1 - pbar)
        * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
    )
    # degenerate variance (all users converted, or none — the 100x
    # replica's click density saturates the threshold): the z's are
    # undefined, but the INTEGER decision still is (rhs = 0 and the
    # sign guards reduce to |lift| <= delta exactly)
    nondeg = (F.col("c") > 0) & (F.col("c") < F.col("nn"))
    return m.select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        F.when(nondeg, (lift + 0.03) / se).alias("z_lower"),
        F.when(nondeg, (lift - 0.03) / se).alias("z_upper"),
        (
            ((a_low >= 0) & (lhs_low >= rhs))
            & ((a_up <= 0) & (lhs_up >= rhs))
        ).alias("equivalent"),
    )
