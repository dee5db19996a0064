"""Hourly-series diagnostics over the events stream (split out of
statsnonparam_queries in round 12, session 6, before the 2,000-line
threshold — keys and oracles unchanged): the Wald-Wolfowitz runs test,
the Ljung-Box autocorrelation panel, and the Durbin-Watson statistic,
plus the shared calendar-bounded hourly-count helpers the PACF panel
(timeseries_queries) also consumes.

Same exactness discipline as the parent module (see its docstring /
registry.py): exact n-scaled DECIMAL cross-products, calendar-lag
self-joins rather than row-offset lags, windows only over the
calendar-bounded hourly relation.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from wikipedia_data_pipeline_spark.registry import register
from wikipedia_data_pipeline_spark.sources.tables import load_table

_US_PER_HOUR = 3_600_000_000


# ---------------------------------------------------------------------------
# Hourly-series diagnostics: runs test, Ljung-Box panel, Durbin-Watson
# ---------------------------------------------------------------------------
# All three reduce the fact table to the hourly series FIRST (one hash
# agg; the series is calendar-bounded - |hours|, not |events|), so the
# global order-by-hour windows below run over a bounded relation; the
# audit triages them agg[h]-safe.

_HOURLY_CNT = f"""
  SELECT epoch_us(ts) // {_US_PER_HOUR} AS h,
         CAST(count(*) AS BIGINT) AS x
  FROM events GROUP BY 1
"""


def _hourly_counts(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.expr(f"ts div {_US_PER_HOUR}").alias("h")
    ).agg(F.count(F.lit(1)).alias("x"))


_RUNS_ORACLE = f"""
WITH hc AS ({_HOURLY_CNT}),
med AS (SELECT quantile_cont(CAST(x AS DOUBLE), 0.5) AS m FROM hc),
sg AS (
  SELECT h, CASE WHEN CAST(x AS DOUBLE) > m THEN 1 ELSE 0 END AS s
  FROM hc, med WHERE CAST(x AS DOUBLE) <> m
),
runs AS (
  SELECT s,
         CASE WHEN lag(s) OVER (ORDER BY h) IS NULL
                OR lag(s) OVER (ORDER BY h) <> s
              THEN 1 ELSE 0 END AS new_run
  FROM sg
),
agg AS (
  SELECT CAST(sum(s) AS BIGINT) AS n1,
         CAST(sum(1 - s) AS BIGINT) AS n2,
         CAST(sum(new_run) AS BIGINT) AS n_runs
  FROM runs
)
SELECT n1, n2, n_runs,
       (CAST(n_runs AS DOUBLE)
        - (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
           / CAST(n1 + n2 AS DOUBLE) + 1.0))
       / sqrt(2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
              * (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                 - CAST(n1 + n2 AS DOUBLE))
              / (CAST(n1 + n2 AS DOUBLE) * CAST(n1 + n2 AS DOUBLE)
                 * CAST(n1 + n2 - 1 AS DOUBLE))) AS z_stat
FROM agg
"""


@register("stats_runs_test", oracle=_RUNS_ORACLE)
def stats_runs_test(spark, sf_dir):
    """Wald-Wolfowitz runs test for serial dependence in hourly event
    volume: too FEW runs of above/below-median hours means trending or
    clustered load (the thing that breaks iid-based capacity models);
    too many means oscillation. The distribution-free companion to
    `events_autocorr_lag1`.

    The fact collapses to the calendar-bounded hourly series first;
    signs, the lag-based run starts, and the exact (n1, n2, R) counts
    follow, with the normal z one fixed expression. Median-tied hours
    are excluded (the standard dichotomization)."""
    hc = _hourly_counts(spark, sf_dir)
    med = hc.agg(
        F.expr("percentile(cast(x as double), 0.5D)").alias("m")
    )
    sg = (
        hc.crossJoin(F.broadcast(med))
        .filter(F.col("x").cast("double") != F.col("m"))
        .select(
            "h",
            (F.col("x").cast("double") > F.col("m")).cast("long").alias("s"),
        )
    )
    wh = Window.orderBy("h")
    runs = sg.select(
        "s",
        F.when(
            F.lag("s").over(wh).isNull() | (F.lag("s").over(wh) != F.col("s")),
            1,
        )
        .otherwise(0)
        .alias("new_run"),
    )
    agg = runs.agg(
        F.sum("s").cast("long").alias("n1"),
        F.sum(1 - F.col("s")).cast("long").alias("n2"),
        F.sum("new_run").cast("long").alias("n_runs"),
    )
    n1d, n2d = F.col("n1").cast("double"), F.col("n2").cast("double")
    ntd = (F.col("n1") + F.col("n2")).cast("double")
    mu = 2.0 * n1d * n2d / ntd + 1.0
    sig = F.sqrt(
        2.0 * n1d * n2d * (2.0 * n1d * n2d - ntd)
        / (ntd * ntd * (ntd - 1.0))
    )
    return agg.select(
        "n1",
        "n2",
        "n_runs",
        ((F.col("n_runs").cast("double") - mu) / sig).alias("z_stat"),
    )


_LB_MAX_LAG = 6

_LB_ORACLE = f"""
WITH hc AS ({_HOURLY_CNT}),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx
  FROM hc
),
den AS (
  SELECT sum(CAST(t.n * hc.x - t.sx AS DECIMAL(38,0))
             * (t.n * hc.x - t.sx)) AS den2
  FROM hc, tot t
),
pairs AS (
  SELECT lg.lag, a.x AS a, b.x AS b
  FROM (SELECT unnest(range(1, {_LB_MAX_LAG} + 1)) AS lag) lg
  JOIN hc a ON true
  JOIN hc b ON a.h - lg.lag = b.h
),
num AS (
  SELECT lag,
         CAST(count(*) AS BIGINT) AS n_pairs,
         sum(CAST(t.n * a - t.sx AS DECIMAL(38,0)) * (t.n * b - t.sx))
           AS num2
  FROM pairs, tot t GROUP BY lag
),
rho AS (
  SELECT lag, n_pairs,
         CAST(num2 AS DOUBLE) / CAST(d.den2 AS DOUBLE) AS rho,
         CAST(round(1e9 * CAST(t.n AS DOUBLE) * CAST(t.n + 2 AS DOUBLE)
                    * CAST(num2 AS DOUBLE) / CAST(d.den2 AS DOUBLE)
                    * CAST(num2 AS DOUBLE) / CAST(d.den2 AS DOUBLE)
                    / CAST(t.n - lag AS DOUBLE)) AS BIGINT) AS term_nano
  FROM num, den d, tot t
)
SELECT CAST(lag AS BIGINT) AS lag, n_pairs, rho,
       CAST(sum(term_nano) OVER (ORDER BY lag
                 ROWS UNBOUNDED PRECEDING) AS DOUBLE) / 1e9 AS q_lb
FROM rho
ORDER BY lag
"""


@register("stats_ljung_box", oracle=_LB_ORACLE)
def stats_ljung_box(spark, sf_dir):
    """Ljung-Box portmanteau panel on hourly event counts: the
    autocorrelation function at lags 1..6 plus the cumulative Q
    statistic testing "white noise through lag k" - the standard
    residual-whiteness diagnostic after any forecast fit, and the
    multi-lag generalization of `events_autocorr_lag1`.

    rho_k is exact-rational: with integer counts x and S = sum x, the
    mean-centered products scale by n to (n*x_t - S)(n*x_{{t-k}} - S),
    summed as DECIMAL - so each rho is ONE double division of exact
    integers. The k-term Q sum is nano-quantized per lag. The series
    is calendar-bounded (one hash agg off the fact) so the order-by-
    hour lag windows are bounded-relation-safe."""
    hc = _hourly_counts(spark, sf_dir)
    tot = hc.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
    )
    dec = "decimal(38,0)"
    hct = hc.crossJoin(F.broadcast(tot))
    cen = (F.col("n") * F.col("x") - F.col("sx")).cast(dec)
    den = hct.agg(F.sum(cen * (F.col("n") * F.col("x") - F.col("sx"))).alias("den2"))
    lags = spark.range(1, _LB_MAX_LAG + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    # per-lag shifted partner: lag(x, k) needs a constant offset, and a
    # row-based lag would silently bridge calendar gaps in the series —
    # join the series to itself on h = h + lag instead (calendar-lag
    # semantics; the series is bounded, the join is a broadcast hash
    # join, and gap hours drop out identically on both engines).
    a = hc.select(F.col("h").alias("ha"), F.col("x").alias("a"))
    b = hc.select(F.col("h").alias("hb"), F.col("x").alias("b"))
    pairs = (
        lags.crossJoin(a)
        .join(
            F.broadcast(b),
            F.col("ha") - F.col("lag") == F.col("hb"),
            "inner",
        )
        .crossJoin(F.broadcast(tot))
    )
    num = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(
            (F.col("n") * F.col("a") - F.col("sx")).cast(dec)
            * (F.col("n") * F.col("b") - F.col("sx"))
        ).alias("num2"),
    )
    rho_c = F.col("num2").cast("double") / F.col("den2").cast("double")
    rho = (
        num.crossJoin(F.broadcast(den))
        .crossJoin(F.broadcast(tot))
        .select(
            "lag",
            "n_pairs",
            rho_c.alias("rho"),
            F.round(
                1e9
                * F.col("n").cast("double")
                * (F.col("n") + 2).cast("double")
                * rho_c
                * rho_c
                / (F.col("n") - F.col("lag")).cast("double")
            )
            .cast("long")
            .alias("term_nano"),
        )
    )
    wq = Window.orderBy("lag").rowsBetween(Window.unboundedPreceding, 0)
    return rho.select(
        F.col("lag").cast("long").alias("lag"),
        "n_pairs",
        "rho",
        (F.sum("term_nano").over(wq).cast("double") / 1e9).alias("q_lb"),
    ).orderBy("lag")


_DW_ORACLE = f"""
WITH hv AS (
  SELECT epoch_us(ts) // {_US_PER_HOUR} AS h,
         CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) AS v
  FROM events GROUP BY 1
),
idx AS (
  SELECT h, v, CAST(row_number() OVER (ORDER BY h) AS BIGINT) AS t
  FROM hv
),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(t) AS BIGINT) AS st,
         CAST(sum(t * t) AS BIGINT) AS stt,
         sum(CAST(v AS DECIMAL(38,0))) AS sv,
         sum(CAST(v AS DECIMAL(38,0)) * t) AS stv
  FROM idx
),
fit AS (
  SELECT n,
         (CAST(n AS DOUBLE) * CAST(stv AS DOUBLE)
          - CAST(st AS DOUBLE) * CAST(sv AS DOUBLE))
         / (CAST(n AS DOUBLE) * CAST(stt AS DOUBLE)
            - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)) AS b,
         CAST(sv AS DOUBLE) AS svd, CAST(st AS DOUBLE) AS std_
  FROM s
),
res AS (
  SELECT idx.t,
         CAST(round((CAST(idx.v AS DOUBLE) / 1e6
                     - (f.svd / 1e6 - f.b / 1e6 * f.std_) / CAST(f.n AS DOUBLE)
                     - f.b / 1e6 * CAST(idx.t AS DOUBLE)) * 1000)
              AS BIGINT) AS e_milli
  FROM idx, fit f
),
dw AS (
  SELECT CAST(sum(CASE WHEN de IS NULL THEN 0
                       ELSE CAST(de AS DECIMAL(38,0)) * de END) AS DOUBLE)
           / CAST(sum(CAST(e_milli AS DECIMAL(38,0)) * e_milli) AS DOUBLE)
           AS dw_stat
  FROM (SELECT e_milli,
               e_milli - lag(e_milli) OVER (ORDER BY t) AS de
        FROM res)
)
SELECT fit.n AS n_hours, fit.b / 1e6 AS slope_per_hour, dw.dw_stat
FROM fit, dw
"""


@register("stats_durbin_watson", oracle=_DW_ORACLE)
def stats_durbin_watson(spark, sf_dir):
    """Durbin-Watson statistic on the residuals of hourly total value
    regressed on time - "after removing the linear trend, is what's
    left serially correlated?" (DW ~ 2 means no; << 2 positive
    autocorrelation, the classic sign that a trend-only capacity model
    underfits).

    The OLS fit is closed-form from five exact integer/DECIMAL sums
    (per-row values micro-quantized before summing so the hourly
    totals are associative); residuals are a fixed double expression
    of those sums, milli-quantized back to BIGINT so the DW ratio's
    numerator and denominator are exact integer sums. Series is
    calendar-bounded; the only order-by windows run above the hourly
    aggregate."""
    ev = load_table(spark, sf_dir, "events")
    hv = ev.groupBy(F.expr(f"ts div {_US_PER_HOUR}").alias("h")).agg(
        F.sum(F.round(F.col("value") * 1_000_000).cast("long"))
        .cast("long")
        .alias("v")
    )
    wh = Window.orderBy("h")
    idx = hv.select(
        "h", "v", F.row_number().over(wh).cast("long").alias("t")
    )
    dec = "decimal(38,0)"
    s = idx.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("t").cast("long").alias("st"),
        F.sum(F.col("t") * F.col("t")).cast("long").alias("stt"),
        F.sum(F.col("v").cast(dec)).alias("sv"),
        F.sum(F.col("v").cast(dec) * F.col("t")).alias("stv"),
    )
    b = (
        F.col("n").cast("double") * F.col("stv").cast("double")
        - F.col("st").cast("double") * F.col("sv").cast("double")
    ) / (
        F.col("n").cast("double") * F.col("stt").cast("double")
        - F.col("st").cast("double") * F.col("st").cast("double")
    )
    fit = s.select(
        "n",
        b.alias("b"),
        F.col("sv").cast("double").alias("svd"),
        F.col("st").cast("double").alias("std_"),
    )
    e_unit = (
        F.col("v").cast("double") / 1e6
        - (F.col("svd") / 1e6 - F.col("b") / 1e6 * F.col("std_"))
        / F.col("n").cast("double")
        - F.col("b") / 1e6 * F.col("t").cast("double")
    )
    res = idx.crossJoin(F.broadcast(fit)).select(
        "t", F.round(e_unit * 1000).cast("long").alias("e_milli")
    )
    wt = Window.orderBy("t")
    de = res.select(
        "e_milli",
        (F.col("e_milli") - F.lag("e_milli").over(wt)).alias("de"),
    )
    # denominator runs over ALL n residuals (textbook DW); only the
    # numerator's first difference is undefined on the first row
    dw = de.agg(
        (
            F.sum(
                F.when(F.col("de").isNull(), F.lit(0).cast(dec)).otherwise(
                    F.col("de").cast(dec) * F.col("de")
                )
            ).cast("double")
            / F.sum(F.col("e_milli").cast(dec) * F.col("e_milli")).cast(
                "double"
            )
        ).alias("dw_stat")
    )
    return fit.crossJoin(F.broadcast(dw)).select(
        F.col("n").alias("n_hours"),
        (F.col("b") / 1e6).alias("slope_per_hour"),
        "dw_stat",
    )
