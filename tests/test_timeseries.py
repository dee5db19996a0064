"""Semantic invariants of the time-series / mining family
(queries/timeseries_queries.py) beyond the oracle equality gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from wikipedia_data_pipeline_spark.queries.timeseries_queries import (
    _EWMA_W,
    events_autocorr_lag1,
    events_cusum_drift,
    events_ewma_value,
    graph_jaccard_suppliers,
    lateral_top_orders_per_customer,
    orders_dow_seasonality,
    text_naive_bayes_langid,
)
from wikipedia_data_pipeline_spark.sources.tables import load_table


def test_ewma_kernel_weights_decay_and_sum():
    assert all(a > b for a, b in zip(_EWMA_W, _EWMA_W[1:]))
    # truncated geometric mass: 1 - (1-alpha)^K
    assert abs(sum(_EWMA_W) - (1 - 0.7**8)) < 1e-12


def test_ewma_nonnegative_and_row_preserving(spark, sf_dir):
    """Zero-padded EWMA of positive values stays >= 0, one row per
    event (a window expression never changes cardinality)."""
    out = events_ewma_value(spark, sf_dir)
    assert out.count() == load_table(spark, sf_dir, "events").count()
    assert out.filter(F.col("ewma") < 0).count() == 0


def test_autocorr_in_unit_interval(spark, sf_dir):
    rows = events_autocorr_lag1(spark, sf_dir).collect()
    assert rows, "expected at least one user with >=2 events"
    assert all(-1.0 - 1e-9 <= r.acf1 <= 1.0 + 1e-9 for r in rows)


def test_cusum_nonnegative_and_alarm_consistent(spark, sf_dir):
    rows = events_cusum_drift(spark, sf_dir).collect()
    assert all(r.max_cusum >= 0 for r in rows)
    for r in rows:
        if r.n_alarms > 0:
            assert r.max_cusum > 100 * 1_000_000


def test_dow_seasonality_weighted_mean_is_one(spark, sf_dir):
    """Σ n_d · idx_d / Σ n_d == 1 exactly (the index is a reweighting)."""
    rows = orders_dow_seasonality(spark, sf_dir).collect()
    assert {r.dow_idx for r in rows} <= set(range(7))
    n_tot = sum(r.n_orders for r in rows)
    weighted = sum(r.n_orders * r.seasonality_idx for r in rows)
    assert abs(weighted / n_tot - 1.0) < 1e-9


def test_lateral_topn_matches_window_formulation(spark, sf_dir):
    """The LATERAL decorrelation must agree with row_number() <= 3."""
    from pyspark.sql import Window

    lat = lateral_top_orders_per_customer(spark, sf_dir)
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    win = (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            F.col("o_custkey").alias("c_custkey"),
            "o_orderkey",
            "o_totalprice",
        )
    )
    assert lat.exceptAll(win).count() == 0
    assert win.exceptAll(lat).count() == 0


def test_naive_bayes_beats_majority_class(spark, sf_dir):
    """Resubstitution NB must beat predicting the most common lang."""
    out = text_naive_bayes_langid(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    majority = (
        docs.groupBy("lang").count().orderBy(F.desc("count")).first()["count"]
    )
    correct = out.filter("correct").count()
    assert out.count() == n
    assert correct > majority


def test_supplier_jaccard_symmetric_bounds(spark, sf_dir):
    rows = graph_jaccard_suppliers(spark, sf_dir).collect()
    for r in rows:
        assert r.s1 < r.s2
        assert 0.15 <= r.jaccard <= 1.0
        assert r.n_common <= min(r.deg1, r.deg2)
