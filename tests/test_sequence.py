"""Semantic invariants of the sequence/ordering family
(queries/sequence_queries.py) beyond the oracle equality gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from wikipedia_data_pipeline_spark.queries.sequence_queries import (
    _TOL_US,
    asof_join_next_click,
    events_linear_trend,
    events_markov_transitions,
    events_mode_event_type,
    orders_gaps_islands,
    scalar_bitwise_funcs,
)
from wikipedia_data_pipeline_spark.sources.tables import load_table


def test_asof_forward_latency_bounds(spark, sf_dir):
    """Every match is strictly forward-looking and inside tolerance."""
    rows = asof_join_next_click(spark, sf_dir).collect()
    assert rows, "expected at least one view->click match"
    for r in rows:
        assert 0 <= r.latency_us <= _TOL_US
        assert r.click_ts_us == r.view_ts_us + r.latency_us


def test_asof_forward_click_exists(spark, sf_dir):
    """Each matched click_ts must belong to a real click by that user."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts_us")
    )
    out = asof_join_next_click(spark, sf_dir)
    unmatched = out.join(
        clicks, ["user_id", "click_ts_us"], "left_anti"
    ).count()
    assert unmatched == 0


def test_linear_trend_one_row_per_type(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    n_types = ev.select("event_type").distinct().count()
    rows = events_linear_trend(spark, sf_dir).collect()
    assert len(rows) == n_types
    # testdata values are bounded; a sane fit can't have astronomic slope
    for r in rows:
        assert abs(r.slope_scaled) < 1e12
        assert r.n > 1


def test_markov_rows_sum_to_one(spark, sf_dir):
    rows = events_markov_transitions(spark, sf_dir).collect()
    by_prev: dict[str, float] = {}
    for r in rows:
        assert 0.0 < r.prob <= 1.0
        by_prev[r.prev_type] = by_prev.get(r.prev_type, 0.0) + r.prob
    for prev, total in by_prev.items():
        assert abs(total - 1.0) < 1e-9, prev


def test_islands_are_maximal_and_disjoint(spark, sf_dir):
    """Islands of one customer never touch or overlap (else they would
    have been merged), and length == end - start + 1."""
    rows = orders_gaps_islands(spark, sf_dir).collect()
    per_cust: dict[int, list] = {}
    for r in rows:
        assert r.n_months == r.end_month - r.start_month + 1
        per_cust.setdefault(r.o_custkey, []).append(
            (r.start_month, r.end_month)
        )
    for spans in per_cust.values():
        spans.sort()
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert s2 > e1 + 1  # a gap of >= 1 month separates islands


def test_bitwise_roundtrip(spark, sf_dir):
    rows = scalar_bitwise_funcs(spark, sf_dir).collect()
    assert rows
    for r in rows[:100]:
        k = r.o_orderkey
        assert r.band == k & 255
        assert r.bor == k | 4096
        assert r.shl == k << 2
        assert r.shr == k >> 3
        assert r.popcnt == bin(k).count("1")


def test_mode_is_true_argmax(spark, sf_dir):
    """Spot-check: the reported mode count equals the max per-user
    (user,type) count, and ties break alphabetically."""
    ev = load_table(spark, sf_dir, "events")
    c = (
        ev.groupBy("user_id", "event_type")
        .count()
        .groupBy("user_id")
        .agg(F.max("count").alias("mx"))
    )
    out = events_mode_event_type(spark, sf_dir)
    joined = out.join(c, "user_id")
    assert joined.filter(F.col("mode_count") != F.col("mx")).count() == 0


def test_cdc_apply_respects_ops(spark, sf_dir):
    from wikipedia_data_pipeline_spark.queries.relational_queries import (
        cdc_apply_orders,
    )

    out = cdc_apply_orders(spark, sf_dir)
    base = load_table(spark, sf_dir, "orders")
    n_base = base.count()
    n_del = base.filter("o_orderkey % 100 = 7").count()
    n_ins = base.filter("o_orderkey % 100 = 50").count()
    # deletes shrink, inserts grow, updates are cardinality-neutral
    assert out.count() == n_base - n_del + n_ins
    # no deleted key survives
    assert out.filter("o_orderkey % 100 = 7 AND o_orderkey < 1000000").count() == 0
    # every update really applied +10
    upd = out.filter("op = 'updated'").select("o_orderkey", "o_totalprice")
    chk = upd.join(
        base.select("o_orderkey", F.col("o_totalprice").alias("orig")),
        "o_orderkey",
    )
    assert chk.filter(F.col("o_totalprice") != F.col("orig") + 10.0).count() == 0


def test_skew_kurtosis_matches_numpy(spark, sf_dir):
    import numpy as np

    from wikipedia_data_pipeline_spark.queries.timeseries_queries import (
        events_skew_kurtosis,
    )

    rows = {r.event_type: r for r in events_skew_kurtosis(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").select("event_type", "value").collect()
    by_type: dict[str, list[float]] = {}
    for r in ev:
        by_type.setdefault(r.event_type, []).append(round(r.value * 100))
    for t, vals in by_type.items():
        a = np.array(vals, dtype=np.float64)
        m2 = ((a - a.mean()) ** 2).mean()
        m3 = ((a - a.mean()) ** 3).mean()
        m4 = ((a - a.mean()) ** 4).mean()
        assert abs(rows[t].skewness - m3 / m2**1.5) < 1e-6
        assert abs(rows[t].excess_kurtosis - (m4 / m2**2 - 3)) < 1e-6


def test_cumulative_distinct_monotone_and_bounded(spark, sf_dir):
    from wikipedia_data_pipeline_spark.queries.sequence_queries import (
        events_cumulative_distinct_types,
    )

    out = events_cumulative_distinct_types(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    assert out.count() == ev.count()
    # final per-user value == true distinct count
    final = out.groupBy("user_id").agg(
        F.max("cum_distinct_types").alias("got")
    )
    truth = ev.groupBy("user_id").agg(
        F.countDistinct("event_type").alias("want")
    )
    assert final.join(truth, "user_id").filter("got <> want").count() == 0


def test_share_of_parent_sums_to_one(spark, sf_dir):
    from wikipedia_data_pipeline_spark.queries.sequence_queries import (
        revenue_share_of_parent,
    )

    rows = revenue_share_of_parent(spark, sf_dir).collect()
    by_region: dict[str, float] = {}
    regions: dict[str, float] = {}
    for r in rows:
        by_region[r.r_name] = by_region.get(r.r_name, 0.0) + r.share_of_region
        regions[r.r_name] = r.region_share_of_total
    for total in by_region.values():
        assert abs(total - 1.0) < 1e-9
    assert abs(sum(regions.values()) - 1.0) < 1e-9


def test_interpolate_fills_between_neighbors(spark, sf_dir):
    from wikipedia_data_pipeline_spark.queries.analytics_queries import (
        events_daily_interpolate,
    )

    out = events_daily_interpolate(spark, sf_dir).collect()
    assert {r.fill_kind for r in out} <= {"actual", "interpolated", "edge"}
    by_user: dict[int, list] = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append(r)
    n_interp = 0
    for rows in by_user.values():
        rows.sort(key=lambda r: r.day_s)
        for i, r in enumerate(rows):
            if r.fill_kind == "interpolated":
                n_interp += 1
                # interpolated value lies between its two neighbors' values
                prevs = [x for x in rows[:i] if x.fill_kind == "actual"]
                nxts = [x for x in rows[i + 1:] if x.fill_kind == "actual"]
                a, b = prevs[-1].filled_value, nxts[0].filled_value
                assert min(a, b) - 1e-9 <= r.filled_value <= max(a, b) + 1e-9
            if r.fill_kind == "edge":
                assert r.filled_value is None
    assert n_interp > 0, "testdata should contain interior gaps"


def test_cohort_curves_cumulative_monotone(spark, sf_dir):
    from wikipedia_data_pipeline_spark.queries.analytics_queries import (
        cohort_value_curves,
    )

    rows = cohort_value_curves(spark, sf_dir).collect()
    by_cohort: dict[int, list] = {}
    for r in rows:
        assert r.age_d >= 0
        by_cohort.setdefault(r.cohort_d, []).append(r)
    for curve in by_cohort.values():
        curve.sort(key=lambda r: r.age_d)
        assert curve[0].age_d == 0  # cohort day itself is always active
        for a, b in zip(curve, curve[1:]):
            assert b.cum_value >= a.cum_value - 1e-9
        assert abs(curve[-1].cum_value
                   - sum(r.day_value for r in curve)) < 1e-6


def test_regex_funcs_match_python_re(spark, sf_dir):
    import re

    from wikipedia_data_pipeline_spark.queries.relational_queries import (
        scalar_regex_funcs,
    )

    out = scalar_regex_funcs(spark, sf_dir).collect()
    docs = dict(
        load_table(spark, sf_dir, "documents")
        .filter("doc_id % 10 = 0")
        .select("doc_id", "text")
        .collect()
    )
    assert out
    for r in out[:50]:
        t = docs[r.doc_id]
        m = re.search(r"([a-z]+)", t)
        assert r.first_word == (m.group(1) if m else "")
        assert r.all_numbers == ",".join(re.findall(r"[0-9]+", t))
        assert r.n_the == len(re.findall(r"(^| )the ", t))
        assert r.starts_upper == bool(re.match(r"[A-Z]", t))
        assert r.devoweled == re.sub(r"[aeiou]", "*", t)


def test_yoy_growth_consistency(spark, sf_dir):
    from wikipedia_data_pipeline_spark.queries.sequence_queries import (
        orders_yoy_growth,
    )

    rows = sorted(orders_yoy_growth(spark, sf_dir).collect(),
                  key=lambda r: r.mth)
    by_mth = {r.mth: r for r in rows}
    # first 12 months have no prior year
    for r in rows[:12]:
        assert r.revenue_ly is None and r.yoy_growth is None
    n_checked = 0
    for r in rows:
        if r.revenue_ly is not None:
            assert r.revenue_ly == by_mth[r.mth - 12].revenue
            assert abs(r.yoy_growth - (r.revenue / r.revenue_ly - 1)) < 1e-12
            n_checked += 1
    assert n_checked > 0


def test_pattern_match_counts_on_constructed_history(spark, tmp_path):
    # One user, a hand-written history: v c v v p e e e c p
    # 'vc'      -> 1 (only positions 0-1 are adjacent v,c)
    # 'vcp'     -> 0 (no adjacent v,c,p run)
    # 'v[^p]*p' -> 1 non-overlapping greedy match (first v consumes
    #              through the first p; the remaining suffix 'eeecp'
    #              has no v)
    # 'ee+'     -> 1 (the 3-e run matches once, non-overlapping)
    import pyarrow as pa
    import pyarrow.parquet as pq

    types = {
        "v": "view",
        "c": "click",
        "p": "purchase",
        "e": "error",
    }
    hist = "vcvvpeeecp"
    base = 1_700_000_000_000_000
    tbl = pa.table(
        {
            "event_id": pa.array(range(len(hist)), pa.int64()),
            "user_id": pa.array([1] * len(hist), pa.int64()),
            "event_type": pa.array([types[ch] for ch in hist]),
            "ts": pa.array(
                [base + i * 1_000_000 for i in range(len(hist))],
                pa.timestamp("ns"),
            ),
            "value": pa.array([1.0] * len(hist), pa.float64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    from wikipedia_data_pipeline_spark.queries.opsevents_queries import events_pattern_match

    got = {
        r.pattern: (r.n_matches, r.n_users)
        for r in events_pattern_match(spark, str(tmp_path)).collect()
    }
    assert got == {
        "vc": (1, 1),
        "vcp": (0, 0),
        "v[^p]*p": (1, 1),
        "ee+": (1, 1),
    }, got
