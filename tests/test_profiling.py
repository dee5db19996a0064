"""operators.profiling: Z-order key/layout, column profile null
handling, incremental LSH semantics on constructed inputs. (The exact
oracles for profile/skew/incremental-LSH run in the registry gate; these
cover what SQL comparison can't — physical layout and null paths.)"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from wikipedia_data_pipeline_spark.operators import dedup as D
from wikipedia_data_pipeline_spark.operators import profiling as P


def _morton(vals: list[int], bits: int) -> int:
    z = 0
    for i in range(bits):
        for j, v in enumerate(vals):
            z |= ((v >> i) & 1) << (i * len(vals) + j)
    return z


def test_zorder_key_matches_reference_interleave(spark):
    rows = [(x, y) for x in range(8) for y in range(8)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r.x, r.y): r.z
        for r in df.withColumn(
            "z", P.zorder_key([F.col("x"), F.col("y")], bits=8)
        ).collect()
    }
    for x, y in rows:
        assert got[(x, y)] == _morton([x, y], 8), (x, y)


def test_zorder_layout_partitions_cover_disjoint_zranges(spark):
    df = spark.range(0, 4096).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    )
    laid = P.zorder_layout(df, P.zorder_key([F.col("x"), F.col("y")], bits=8), n_files=8)
    ranges = (
        laid.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.min("zval").alias("lo"), F.max("zval").alias("hi"))
        .orderBy("lo")
        .collect()
    )
    assert len(ranges) > 1
    # range partitioning => consecutive partitions hold disjoint,
    # ordered z-ranges, i.e. every output file is a tight z-interval
    for a, b in zip(ranges, ranges[1:]):
        assert a.hi <= b.lo, (a, b)


def test_profile_columns_counts_nulls(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (None, "a")],
        T.StructType(
            [
                T.StructField("k", T.LongType()),
                T.StructField("v", T.StringType()),
            ]
        ),
    )
    out = {r.col_name: r for r in P.profile_columns(df, ["k", "v"]).collect()}
    assert out["k"].n_rows == 3 and out["k"].n_nulls == 1
    assert out["k"].n_distinct == 2
    assert out["v"].n_nulls == 1 and out["v"].n_distinct == 1
    assert out["v"].min_val == "a" and out["v"].max_val == "a"


def test_key_skew_report_shares_sum_and_order(spark):
    df = spark.createDataFrame(
        [(k,) for k in [1] * 6 + [2] * 3 + [3]], "key_col long"
    )
    rows = P.key_skew_report(df, "key_col", top_n=2).collect()
    assert [(r.key, r.n) for r in rows] == [(1, 6), (2, 3)]
    assert abs(rows[0].share - 0.6) < 1e-12


def test_incremental_lsh_finds_cross_pair_only(spark):
    text = "the quick brown fox jumps over the lazy dog " * 5
    corpus = spark.createDataFrame(
        [(1, text), (2, "completely different words here entirely " * 5)],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame([(10, text)], "doc_id long, text string")
    pairs = D.incremental_lsh_pairs(corpus, batch, 0.5).collect()
    assert [(p.doc_new, p.doc_old) for p in pairs] == [(10, 1)]
    assert pairs[0].jaccard == 1.0


def test_exact_heavy_hitters_matches_full_histogram(spark):
    # Adversarial mix: 3 true heavy hitters, a near-miss item just
    # under threshold, and a long tail of singletons spread across
    # many partitions (each partition's MG summary must not lose the
    # global heavy hitters even when they are locally diluted).
    rows = (
        [("hot_a",)] * 400
        + [("hot_b",)] * 150
        + [("hot_c",)] * 100
        + [("near",)] * 99
        + [(f"tail_{i}",) for i in range(4000)]
    )
    df = spark.createDataFrame(rows, "word string").repartition(16)
    n_total = len(rows)
    got = {
        r.word: r.n
        for r in P.exact_heavy_hitters(df, "word", 1, 100).collect()
    }
    truth = {
        w: c
        for w, c in {"hot_a": 400, "hot_b": 150, "hot_c": 100, "near": 99}.items()
        if c * 100 >= n_total
    }
    assert got == truth


def test_exact_heavy_hitters_share_and_ties(spark):
    # Exactly-at-threshold items must be kept (>= semantics).
    rows = [("x",)] * 10 + [("y",)] * 10 + [(f"t{i}",) for i in range(80)]
    df = spark.createDataFrame(rows, "word string").repartition(4)
    out = {r.word: (r.n, r.share) for r in
           P.exact_heavy_hitters(df, "word", 1, 10).collect()}
    assert out == {"x": (10, 0.1), "y": (10, 0.1)}


def test_observed_metrics_ride_the_single_action(spark):
    df = spark.range(0, 1000).select(
        "id", (F.col("id") % 10).alias("k")
    )
    got, obs = P.observed(
        df,
        "scan_stats",
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("k").alias("k_sum"),
        F.max("id").alias("max_id"),
    )
    # One action drives both the result and the metrics.
    assert got.where(F.col("k") == 0).count() == 100
    m = obs.get
    assert m["n_rows"] == 1000 and m["max_id"] == 999
    assert m["k_sum"] == sum(i % 10 for i in range(1000))


def _vocab_df(spark, counts):
    return spark.createDataFrame(
        [(w, c) for w, c in counts.items()], "word string, cnt long"
    )


def test_cms_estimates_never_underestimate(spark):
    counts = {f"w{i}": i + 1 for i in range(40)}  # 40 words >> 8 cells
    got = {
        r.word: (r.n_exact, r.n_cms)
        for r in P.cms_estimates(_vocab_df(spark, counts), width=8).collect()
    }
    assert set(got) == set(counts)
    for w, (exact, est) in got.items():
        assert exact == counts[w]
        assert est >= exact  # the CMS one-sided error guarantee
    # With 40 keys in 8 cells per row, collisions are certain somewhere.
    assert any(est > exact for exact, est in got.values())


def test_cms_sketch_is_mergeable(spark):
    # sketch(A ⊎ B) == cellwise sum — the property that lets partial
    # aggregation build the sketch distributed. Estimating the merged
    # counts from the two halves must equal estimating from the union.
    a = {"x": 5, "y": 3, "z": 2}
    b = {"x": 7, "q": 4}
    union = {"x": 12, "y": 3, "z": 2, "q": 4}
    est_union = {
        r.word: r.n_cms
        for r in P.cms_estimates(_vocab_df(spark, union), width=4).collect()
    }
    # Rebuild by summing the two halves' vocab relations first — same
    # cells, same sums, by associativity of +.
    merged = _vocab_df(spark, a).union(_vocab_df(spark, b)).groupBy(
        "word"
    ).agg(F.sum("cnt").alias("cnt"))
    est_merged = {
        r.word: r.n_cms for r in P.cms_estimates(merged, width=4).collect()
    }
    assert est_union == est_merged


def test_psi_drift_nonnegative_and_totals(spark, sf_dir):
    from wikipedia_data_pipeline_spark.queries.statsdrift_queries import events_psi_drift
    from wikipedia_data_pipeline_spark.sources.tables import load_table

    rows = events_psi_drift(spark, sf_dir).collect()
    ev_n = load_table(spark, sf_dir, "events").count()
    assert rows
    # PSI is a sum of (p-q)ln(p/q) terms, each >= 0
    assert all(r.psi_nano >= 0 for r in rows)
    assert sum(r.n_first_half + r.n_second_half for r in rows) == ev_n


def test_benford_chi2_matches_python(spark, sf_dir):
    import math

    from wikipedia_data_pipeline_spark.queries.statsdrift_queries import events_benford_screen
    from wikipedia_data_pipeline_spark.sources.tables import load_table

    rows = {r.event_type: r for r in
            events_benford_screen(spark, sf_dir).collect()}
    vals = (
        load_table(spark, sf_dir, "events")
        .filter("value > 0")
        .select("event_type", "value")
        .collect()
    )
    obs: dict[str, dict[int, int]] = {}
    for r in vals:
        d = int(r.value / 10 ** math.floor(math.log10(r.value)))
        obs.setdefault(r.event_type, {}).setdefault(d, 0)
        obs[r.event_type][d] += 1
    for t, counts in obs.items():
        n = sum(counts.values())
        chi2 = sum(
            (counts.get(d, 0) - n * math.log10(1 + 1 / d)) ** 2
            / (n * math.log10(1 + 1 / d))
            for d in range(1, 10)
        )
        assert rows[t].n_values == n
        assert abs(rows[t].chi2_micro / 1e6 - chi2) < 1e-3


def test_ks_test_matches_scipy_style(spark, sf_dir):
    from wikipedia_data_pipeline_spark.queries.statstests_queries import events_ks_test_ab
    from wikipedia_data_pipeline_spark.sources.tables import load_table

    r = events_ks_test_ab(spark, sf_dir).collect()[0]
    vals = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "value")
        .collect()
    )
    a = sorted(v.value for v in vals if v.user_id % 2 == 0)
    b = sorted(v.value for v in vals if v.user_id % 2 == 1)
    assert r.n_a == len(a) and r.n_b == len(b)
    # brute-force D over the pooled support
    import bisect

    d = max(
        abs(
            bisect.bisect_right(a, x) * len(b)
            - bisect.bisect_right(b, x) * len(a)
        )
        for x in set(a + b)
    )
    assert r.d_num == d
    assert abs(r.ks_stat - d / (len(a) * len(b))) < 1e-12


def test_mannwhitney_matches_bruteforce(spark, sf_dir):
    from wikipedia_data_pipeline_spark.queries.statstests_queries import events_mannwhitney_ab
    from wikipedia_data_pipeline_spark.sources.tables import load_table

    r = events_mannwhitney_ab(spark, sf_dir).collect()[0]
    vals = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "value")
        .collect()
    )
    pooled = sorted((v.value, v.user_id % 2) for v in vals)
    # tie-averaged ranks, brute force
    from collections import defaultdict

    pos = defaultdict(list)
    for i, (val, g) in enumerate(pooled, start=1):
        pos[val].append((i, g))
    rank_sum_a = 0.0
    for val, entries in pos.items():
        avg = sum(i for i, _ in entries) / len(entries)
        rank_sum_a += sum(avg for _, g in entries if g == 0)
    na = sum(1 for _, g in pooled if g == 0)
    u_a = rank_sum_a - na * (na + 1) / 2
    assert r.u2_a == round(2 * u_a)
    assert abs(r.z_stat) < 50  # sanity: finite, sane magnitude


def test_bootstrap_ci_brackets_mean(spark, sf_dir):
    from wikipedia_data_pipeline_spark.queries.statstests_queries import events_bootstrap_ci

    r = events_bootstrap_ci(spark, sf_dir).collect()[0]
    assert r.n_reps == 100
    assert r.ci_lo_scaled < r.ci_hi_scaled
    # With n=10k the CI must be tight around (and contain) the mean
    assert r.ci_lo_scaled <= r.mean_scaled <= r.ci_hi_scaled
    half_width = (r.ci_hi_scaled - r.ci_lo_scaled) / 2
    assert half_width < 0.1 * r.mean_scaled


def test_lateness_audit_consistency(spark, sf_dir):
    from wikipedia_data_pipeline_spark.queries.opsevents_queries import events_lateness_audit
    from wikipedia_data_pipeline_spark.sources.tables import load_table

    rows = events_lateness_audit(spark, sf_dir).collect()
    total = sum(r.n_events for r in rows)
    assert total == load_table(spark, sf_dir, "events").count()
    for r in rows:
        assert 0 <= r.n_late_1h <= r.n_late_10m <= r.n_events
        assert r.max_late_us >= 0


def test_sparklines_aligned_and_sorted(spark, sf_dir):
    from wikipedia_data_pipeline_spark.queries.finance_queries import nation_revenue_sparklines

    rows = nation_revenue_sparklines(spark, sf_dir).collect()
    assert len(rows) == 25
    for r in rows:
        months = [int(v) for v in r.months.split(",")]
        revs = [int(v) for v in r.revenues_cents.split(",")]
        assert len(months) == len(revs) == r.n_months
        assert months == sorted(months)
        assert all(v > 0 for v in revs)


def test_checksum_detects_mutation(spark, sf_dir):
    from wikipedia_data_pipeline_spark.operators.sampling import det_hash
    from wikipedia_data_pipeline_spark.queries.opsevents_queries import orders_integrity_checksum
    from wikipedia_data_pipeline_spark.sources.tables import load_table

    base = orders_integrity_checksum(spark, sf_dir).collect()[0]
    o = load_table(spark, sf_dir, "orders")
    assert base.n_rows == o.count()
    # recompute after mutating one key: checksum must move
    mutated = o.withColumn(
        "o_orderkey",
        F.when(F.col("o_orderkey") == 0, 999_999).otherwise(
            F.col("o_orderkey")
        ),
    )
    chk2 = mutated.agg(
        F.sum(
            det_hash(F.col("o_orderkey") * 31 + F.col("o_custkey")).cast(
                "decimal(38,0)"
            )
        ).cast("long")
    ).collect()[0][0]
    assert chk2 != base.key_checksum


def test_corr_matrix_in_range_and_symmetric_defn(spark, sf_dir):
    from wikipedia_data_pipeline_spark.queries.statsdrift_queries import events_feature_corr_matrix

    rows = events_feature_corr_matrix(spark, sf_dir).collect()
    assert len(rows) == 3
    assert {(r.feat_a, r.feat_b) for r in rows} == {
        ("value", "hour_of_day"),
        ("value", "day_of_week"),
        ("hour_of_day", "day_of_week"),
    }
    for r in rows:
        assert -1.0 - 1e-9 <= r.corr <= 1.0 + 1e-9


def test_weighted_median_brute(spark, sf_dir):
    from wikipedia_data_pipeline_spark.queries.finance_queries import lineitem_weighted_median_price
    from wikipedia_data_pipeline_spark.sources.tables import load_table

    rows = {r.p_brand: r for r in
            lineitem_weighted_median_price(spark, sf_dir).collect()}
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    data = (
        li.join(p, li.l_partkey == p.p_partkey)
        .select("p_brand", "l_extendedprice", "l_quantity")
        .collect()
    )
    from collections import defaultdict

    per_brand = defaultdict(list)
    for r in data:
        cents = round(r.l_extendedprice / r.l_quantity * 100)
        per_brand[r.p_brand].append((cents, int(r.l_quantity)))
    for brand, pairs in per_brand.items():
        pairs.sort()
        tot = sum(q for _, q in pairs)
        cum = 0
        med = None
        for cents, q in pairs:
            cum += q
            if cum * 2 >= tot:
                med = cents
                break
        assert rows[brand].weighted_median_cents == med
        assert rows[brand].total_qty == tot


def test_hhi_bounds(spark, sf_dir):
    from wikipedia_data_pipeline_spark.queries.finance_queries import nation_revenue_hhi

    rows = nation_revenue_hhi(spark, sf_dir).collect()
    assert len(rows) == 25
    for r in rows:
        assert 1.0 / r.n_customers - 1e-12 <= r.hhi <= 1.0


def test_survival_curve_monotone(spark, sf_dir):
    import math

    from wikipedia_data_pipeline_spark.queries.finance_queries import orders_survival_curve

    rows = sorted(
        orders_survival_curve(spark, sf_dir).collect(),
        key=lambda r: r.duration_m,
    )
    assert rows
    prev = 0  # log S starts at 0 (S=1) and only decreases
    for r in rows:
        assert r.n_churned >= 1
        assert r.n_at_risk >= r.n_churned
        if r.log_survival_nano is not None:
            assert r.log_survival_nano <= prev
            prev = r.log_survival_nano
            s = math.exp(r.log_survival_nano / 1e9)
            assert 0.0 < s <= 1.0
    # risk set shrinks over time
    risks = [r.n_at_risk for r in rows]
    assert risks == sorted(risks, reverse=True)


def test_mutual_information_nonneg_and_bounded(spark, sf_dir):
    import math

    from wikipedia_data_pipeline_spark.queries.statsdrift_queries import events_mutual_information

    r = events_mutual_information(spark, sf_dir).collect()[0]
    mi = r.mi_nano / 1e9
    # MI >= 0 (up to quantization) and <= ln(min(|X|,|Y|))
    assert mi >= -1e-6
    assert mi <= math.log(10) + 1e-6
    assert r.n_cells <= 50


def test_seasonal_decompose_identity(spark, sf_dir):
    from wikipedia_data_pipeline_spark.queries.finance_queries import orders_seasonal_decompose

    rows = orders_seasonal_decompose(spark, sf_dir).collect()
    assert len(rows) == 80
    interior = [r for r in rows if r.trend is not None]
    assert len(interior) == 80 - 12  # 6 edge months each side
    for r in interior:
        # additive identity: revenue = trend + seasonal + residual
        assert abs(r.revenue - (r.trend + r.seasonal + r.residual)) < 1e-6
    # seasonal indices sum to ~0 across a full year (mean-deviation defn)
    by_moy = {}
    for r in rows:
        by_moy[r.mth % 12] = r.seasonal
    assert abs(sum(by_moy.values())) < max(abs(v) for v in by_moy.values())


def test_xyz_classes_consistent(spark, sf_dir):
    from wikipedia_data_pipeline_spark.queries.finance_queries import parts_xyz_variability

    rows = parts_xyz_variability(spark, sf_dir).collect()
    assert rows
    for r in rows[:500]:
        assert r.cv >= 0
        want = "X" if r.cv < 0.5 else ("Y" if r.cv < 1.0 else "Z")
        assert r.xyz_class == want
    assert {r.xyz_class for r in rows} >= {"X", "Y"} or len(rows) < 10


def test_gini_matches_bruteforce(spark, sf_dir):
    from wikipedia_data_pipeline_spark.queries.stats_queries import events_value_gini
    from wikipedia_data_pipeline_spark.sources.tables import load_table

    r = events_value_gini(spark, sf_dir).collect()[0]
    vals = (
        load_table(spark, sf_dir, "events")
        .selectExpr("user_id", "cast(round(value * 100) as long) AS c")
        .groupBy("user_id")
        .agg(F.sum("c").alias("cents"))
        .collect()
    )
    xs = sorted(v.cents for v in vals)
    n = len(xs)
    gini = 2 * sum((i + 1) * x for i, x in enumerate(xs)) / (
        n * sum(xs)
    ) - (n + 1) / n
    assert r.n == n
    assert abs(r.gini - gini) < 1e-12
    assert 0.0 <= r.gini < 1.0


def test_heatmap_lift_weighted_mean_is_one(spark, sf_dir):
    from wikipedia_data_pipeline_spark.queries.stats_queries import events_dow_hod_heatmap

    rows = events_dow_hod_heatmap(spark, sf_dir).collect()
    assert all(0 <= r.dow <= 6 and 0 <= r.hod <= 23 for r in rows)
    n = sum(r.n_events for r in rows)
    # E[lift] under the cell distribution is sum(n_xy * lift)/N
    # = sum(n_xy^2 * N / (n_x n_y)) / N >= 1 by Cauchy-Schwarz; and
    # equals 1 iff independent. Just sanity-bound it.
    w = sum(r.n_events * r.lift for r in rows) / n
    assert w >= 1.0 - 1e-9


def test_repeat_curve_monotone_and_bounded(spark, sf_dir):
    from wikipedia_data_pipeline_spark.queries.finance_queries import orders_repeat_purchase_curve
    from wikipedia_data_pipeline_spark.sources.tables import load_table

    rows = sorted(
        orders_repeat_purchase_curve(spark, sf_dir).collect(),
        key=lambda r: r.gap_m,
    )
    assert rows and rows[0].gap_m >= 0
    n_cust = (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey")
        .distinct()
        .count()
    )
    prev = 0
    for r in rows:
        assert r.cum_converted == prev + r.n_customers_at_gap
        prev = r.cum_converted
        assert abs(r.cum_conversion - r.cum_converted / n_cust) < 1e-12
    assert rows[-1].cum_conversion <= 1.0


def test_price_dispersion_nonnegative(spark, sf_dir):
    from wikipedia_data_pipeline_spark.queries.finance_queries import lineitem_price_dispersion

    rows = lineitem_price_dispersion(spark, sf_dir).collect()
    assert rows
    for r in rows[:500]:
        assert r.n_suppliers >= 3
        assert 0 < r.min_cents <= r.max_cents
        assert abs(
            r.dispersion - (r.max_cents - r.min_cents) / r.min_cents
        ) < 1e-12


def test_skyline_is_exact_pareto_set(spark, sf_dir):
    from wikipedia_data_pipeline_spark.queries.finance_queries import parts_skyline_price_size
    from wikipedia_data_pipeline_spark.sources.tables import load_table

    sky = {
        r.p_partkey: (r.price_cents, r.p_size)
        for r in parts_skyline_price_size(spark, sf_dir).collect()
    }
    allp = [
        (r.p_partkey, round(r.p_retailprice * 100), r.p_size)
        for r in load_table(spark, sf_dir, "part").collect()
    ]
    # brute-force dominance: kept iff no other part is <= price and >= size
    # with at least one strict (under the query's deterministic tie-break)
    def dominated(k, pc, sz):
        for k2, pc2, sz2 in allp:
            if k2 == k:
                continue
            if pc2 <= pc and sz2 >= sz and (pc2 < pc or sz2 > sz or k2 < k):
                return True
        return False

    expect = {k for k, pc, sz in allp if not dominated(k, pc, sz)}
    assert set(sky) == expect


def test_customer_trend_matches_numpy_sample(spark, sf_dir):
    import numpy as np

    from wikipedia_data_pipeline_spark.queries.finance_queries import customer_spend_trend
    from wikipedia_data_pipeline_spark.sources.tables import load_table

    got = {r.o_custkey: r for r in customer_spend_trend(spark, sf_dir).collect()}
    o = (
        load_table(spark, sf_dir, "orders")
        .selectExpr(
            "o_custkey",
            "year(o_orderdate) * 12 + month(o_orderdate) - 24000 AS x",
            "cast(round(o_totalprice * 100) as long) AS y",
        )
        .collect()
    )
    from collections import defaultdict

    per = defaultdict(list)
    for r in o:
        per[r.o_custkey].append((r.x, r.y))
    checked = 0
    for cust, pts in list(per.items())[:50]:
        if len(pts) < 3:
            assert cust not in got
            continue
        xs = np.array([p[0] for p in pts], dtype=np.float64)
        ys = np.array([p[1] for p in pts], dtype=np.float64)
        if np.var(xs) == 0:
            assert cust not in got
            continue
        slope = np.polyfit(xs, ys, 1)[0]
        assert abs(got[cust].slope_cents_per_month - slope) < 1e-4 * max(
            1, abs(slope)
        )
        checked += 1
    assert checked > 10


def test_label_outliers_are_per_label_minima(spark, sf_dir):
    from wikipedia_data_pipeline_spark.queries.embedding_queries import embedding_label_outliers
    from wikipedia_data_pipeline_spark.sources.tables import load_table

    rows = embedding_label_outliers(spark, sf_dir).collect()
    n_labels = (
        load_table(spark, sf_dir, "embeddings")
        .select("label")
        .distinct()
        .count()
    )
    assert len(rows) == 3 * n_labels
    from collections import defaultdict

    per = defaultdict(list)
    for r in rows:
        assert -1.0 - 1e-9 <= r.cos_to_centroid <= 1.0 + 1e-9
        per[r.label].append(r)
    for label, rs in per.items():
        assert sorted(r.outlier_rank for r in rs) == [1, 2, 3]
        rs.sort(key=lambda r: r.outlier_rank)
        assert (
            rs[0].cos_to_centroid
            <= rs[1].cos_to_centroid
            <= rs[2].cos_to_centroid
        )


def test_trade_flow_totals_match_global(spark, sf_dir):
    from wikipedia_data_pipeline_spark.queries.finance_queries import trade_flow_matrix
    from wikipedia_data_pipeline_spark.sources.tables import load_table

    rows = trade_flow_matrix(spark, sf_dir).collect()
    sup_nations = {r.supp_nation for r in rows}
    cust_nations = {r.cust_nation for r in rows}
    # every (present supplier nation, present customer nation) pair trades
    assert len(rows) == len(sup_nations) * len(cust_nations)
    total_li = load_table(spark, sf_dir, "lineitem").count()
    assert sum(r.n_lineitems for r in rows) == total_li
    assert all(r.revenue > 0 for r in rows)


def test_kl_nonnegative_and_total_events(spark, sf_dir):
    from wikipedia_data_pipeline_spark.queries.statsdrift_queries import events_kl_user_vs_global
    from wikipedia_data_pipeline_spark.sources.tables import load_table

    rows = events_kl_user_vs_global(spark, sf_dir).collect()
    # KL >= 0 (up to nano quantization of per-term rounding)
    assert all(r.kl_nano >= -5 * 5 for r in rows)  # 5 types x 5 nano slop
    total = sum(r.n_events for r in rows)
    assert total == load_table(spark, sf_dir, "events").count()


def test_vocab_overlap_bounds(spark, sf_dir):
    from wikipedia_data_pipeline_spark.queries.textcorpus_queries import documents_vocab_overlap_langs
    from wikipedia_data_pipeline_spark.sources.tables import load_table

    rows = documents_vocab_overlap_langs(spark, sf_dir).collect()
    n_langs = (
        load_table(spark, sf_dir, "documents")
        .select("lang")
        .distinct()
        .count()
    )
    assert len(rows) <= n_langs * (n_langs - 1) // 2
    for r in rows:
        assert r.lang_a < r.lang_b
        assert 0 < r.n_common <= min(r.n_words_a, r.n_words_b)
        assert 0.0 < r.jaccard <= 1.0


def test_burstiness_in_range(spark, sf_dir):
    from wikipedia_data_pipeline_spark.queries.stats_queries import events_burstiness_index

    rows = events_burstiness_index(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert -1.0 <= r.burstiness < 1.0
        assert r.n_gaps > 1


def test_lognormal_fit_matches_numpy(spark, sf_dir):
    import numpy as np

    from wikipedia_data_pipeline_spark.queries.statsdrift_queries import documents_length_lognormal_fit
    from wikipedia_data_pipeline_spark.sources.tables import load_table

    r = documents_length_lognormal_fit(spark, sf_dir).collect()[0]
    lens = [
        x.n_chars
        for x in load_table(spark, sf_dir, "documents")
        .filter("n_chars > 0")
        .collect()
    ]
    logs = np.log(np.array(lens, dtype=np.float64))
    assert r.n == len(lens)
    assert abs(r.mu_ln - logs.mean()) < 1e-6
    assert abs(r.sigma_ln - logs.std()) < 1e-6


def test_ttm_matches_bruteforce(spark, sf_dir):
    from wikipedia_data_pipeline_spark.queries.finance_queries import orders_ttm_revenue

    rows = sorted(orders_ttm_revenue(spark, sf_dir).collect(),
                  key=lambda r: r.mth)
    for i, r in enumerate(rows):
        lo = max(0, i - 11)
        window = rows[lo : i + 1]
        assert r.n_months_in_window == len(window)
        assert abs(r.ttm_revenue - sum(x.revenue for x in window)) < 1e-6


def test_zorder_skipping_prunes_both_dims(spark, tmp_path):
    # Skewed bit widths on purpose (x: 6 bits, y: 12 bits): the grid
    # normalization inside the report must equalize them or x would
    # never prune (the raw interleave's high bits would be all-y).
    df = spark.range(0, 8192).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 64).alias("x"),
        ((F.col("id") * 2654435761) % 4096).alias("y"),
        F.lit(1.0).alias("value"),
    )
    rep = {
        r.layout: r
        for r in P.zorder_skipping_report(
            df, "x", "y", (16, 32), (1024, 2048), str(tmp_path), n_files=16
        ).collect()
    }
    un, lin, zo = rep["unordered"], rep["linear_y"], rep["zorder"]
    # Round-robin layout prunes nothing on either dimension.
    assert un.files_matching_xbox == un.n_files
    assert un.files_matching_ybox == un.n_files
    # The linear sort prunes its own column but not the other.
    assert lin.files_matching_ybox < lin.n_files
    assert lin.files_matching_xbox == lin.n_files
    # Z-order prunes BOTH dimensions — the point of the layout.
    assert zo.files_matching_xbox < un.files_matching_xbox
    assert zo.files_matching_ybox < un.files_matching_ybox


def test_quantile_summary_weights_sum_to_rowcount(spark):
    df = spark.range(0, 5000).select(
        F.col("id").alias("k"),
        ((F.col("id") * 2654435761) % 997).cast("double").alias("v"),
    )
    summary = P.quantile_summary(df, "v", "k", blocks=16, eps=0.05)
    total = summary.agg(F.sum("weight").alias("w")).collect()[0].w
    assert total == 5000
    # The summary must actually summarize: ~blocks/eps rows, not O(N).
    assert summary.count() < 1000


def test_quantile_summary_rank_error_within_bound(spark):
    # Heavy-tailed values (quadratic growth) + duplicate runs — the
    # shapes that break naive equi-width histograms.
    n, blocks, eps = 20000, 16, 0.05
    df = spark.range(0, n).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 7 == 0, 1.0)
        .otherwise((F.col("id") % 1000) * (F.col("id") % 1000) / 7.0)
        .alias("v"),
    )
    summary = P.quantile_summary(df, "v", "k", blocks=blocks, eps=eps)
    rows = sorted(
        summary.collect(), key=lambda r: (r.v, r.k)
    )
    values = {r.k: r.v for r in df.collect()}
    ordered = sorted(values.items(), key=lambda kv: (kv[1], kv[0]))
    pos = {k: i + 1 for i, (k, _) in enumerate(ordered)}
    bound = eps * n + blocks
    cum = 0
    for p in (0.01, 0.25, 0.5, 0.9, 0.99):
        target = -(-p * n // 1)
        cum = 0
        est = None
        for r in rows:
            cum += r.weight
            if cum >= target:
                est = r
                break
        assert est is not None
        true_rank = pos[est.k]
        assert abs(true_rank - target) <= bound, (p, true_rank, target)


def test_kmv_two_phase_equals_single_phase_min_k(spark):
    from wikipedia_data_pipeline_spark.operators.sampling import det_hash

    df = spark.range(0, 3000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        det_hash(F.col("id") * F.col("id") + 7).alias("h"),
    )
    got = {
        (r.g, r.rk): r.h
        for r in P.kmv_min_hashes(df, "g", "h", k=16, fan=8).collect()
    }
    rows = df.distinct().collect()
    for g in ("0", "1", "2"):
        want = sorted({r.h for r in rows if r.g == g})[:16]
        for i, h in enumerate(want, start=1):
            assert got[(g, i)] == h, (g, i)


def test_kmv_sketch_merges_like_the_full_sketch(spark):
    # Mergeability: bottom-k of (sketch(A) ∪ sketch(B)) must equal
    # sketch(A ∪ B) — the property that lets sketches be kept per
    # partition/segment and combined later.
    from wikipedia_data_pipeline_spark.operators.sampling import det_hash

    k = 24
    full = spark.range(0, 4000).select(
        F.lit("all").alias("g"), det_hash(F.col("id") * 31 + 5).alias("h")
    )
    half_a = full.filter(F.col("h") % 2 == 0)
    half_b = full.filter(F.col("h") % 2 == 1)
    merged = (
        P.kmv_min_hashes(half_a, "g", "h", k=k)
        .unionByName(P.kmv_min_hashes(half_b, "g", "h", k=k))
        .select("h")
    )
    want = [r.h for r in P.kmv_min_hashes(full, "g", "h", k=k).orderBy("h").collect()]
    got = sorted(r.h for r in merged.collect())[:k]
    assert got == want


def test_quantile_summary_grouped_weights_partition_by_group(spark):
    df = spark.range(0, 6000).select(
        (F.col("id") % 4).cast("string").alias("g"),
        F.col("id").alias("k"),
        ((F.col("id") * 48271) % 9973).cast("double").alias("v"),
    )
    summary = P.quantile_summary(
        df, "v", "k", blocks=8, eps=0.05, group_cols=("g",)
    )
    got = {
        r.g: r.w
        for r in summary.groupBy("g")
        .agg(F.sum("weight").alias("w"))
        .collect()
    }
    assert got == {"0": 1500, "1": 1500, "2": 1500, "3": 1500}
    # Bounded per-group summaries, not O(rows).
    per_group = {
        r.g: r.c
        for r in summary.groupBy("g").agg(F.count("*").alias("c")).collect()
    }
    assert all(c < 400 for c in per_group.values()), per_group


def test_spatial_grid_join_equals_brute_force(spark, tmp_path):
    # The grid decomposition must find EXACTLY the brute-force pair
    # set — a missed neighbor (cell fan-out bug) or duplicate (probe
    # direction bug) both fail set equality.
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = 400
    tbl = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "user_id": pa.array([(i * 131) % 89 for i in range(n)],
                                pa.int64()),
            "event_type": pa.array(["view"] * n),
            "ts": pa.array(
                [1_700_000_000_000_000 + i for i in range(n)],
                pa.timestamp("ns"),
            ),
            "value": pa.array([1.0] * n, pa.float64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    from wikipedia_data_pipeline_spark.operators.sampling import det_hash
    from wikipedia_data_pipeline_spark.queries.spatial_queries import spatial_grid_join_events
    from wikipedia_data_pipeline_spark.sources.tables import load_table

    got = {
        (r.event_a, r.event_b)
        for r in spatial_grid_join_events(spark, str(tmp_path)).collect()
    }
    pts = {
        r.event_id: (r.x, r.y)
        for r in load_table(spark, str(tmp_path), "events")
        .select(
            "event_id",
            ((det_hash("user_id") % 1000) / 10.0).alias("x"),
            ((det_hash("event_id") % 1000) / 10.0).alias("y"),
        )
        .collect()
    }
    ids = sorted(pts)
    want = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if (pts[a][0] - pts[b][0]) ** 2 + (pts[a][1] - pts[b][1]) ** 2
        <= 1.0
    }
    assert got == want, (len(got), len(want))


def test_changepoint_matches_bruteforce(spark, sf_dir):
    from wikipedia_data_pipeline_spark.queries.statsdrift_queries import (
        events_changepoint_value,
    )
    from wikipedia_data_pipeline_spark.sources.tables import load_table

    r = events_changepoint_value(spark, sf_dir).collect()[0]
    # brute-force replay on the collected daily aggregate
    rows = (
        load_table(spark, sf_dir, "events")
        .selectExpr("cast(ts as long) AS t", "cast(round(value*1000000) as long) AS u")
        .collect()
    )
    t0 = min(x.t for x in rows)
    daily = {}
    for x in rows:
        d = (x.t - t0) // 86_400_000_000
        n, u = daily.get(d, (0, 0))
        daily[d] = (n + 1, u + x.u)
    days = sorted(daily)
    tot_n = sum(n for n, _ in daily.values())
    tot_u = sum(u for _, u in daily.values())
    best = None
    cum_n = cum_u = 0
    for d in days:
        n, u = daily[d]
        cum_n += n
        cum_u += u
        if cum_n >= tot_n:
            break
        absd = abs(cum_u * tot_n - cum_n * tot_u)
        if best is None or absd > best[1]:
            best = (d, absd, cum_n, cum_u)
    assert r.cp_day == best[0]
    assert abs(r.cusum_stat - best[1] / tot_n / 1e6) < 1e-6 * max(r.cusum_stat, 1)
    assert r.mean_before > 0 and r.mean_after > 0


def test_join_cardinality_estimate_replayable(spark, sf_dir):
    from wikipedia_data_pipeline_spark.operators.sampling import (
        HASH_MOD, KNUTH, PRE_MOD,
    )
    from wikipedia_data_pipeline_spark.queries.sketch_queries import (
        _JC_MOD, _JC_T, sketch_join_cardinality_events,
    )
    from wikipedia_data_pipeline_spark.sources.tables import load_table

    r = sketch_join_cardinality_events(spark, sf_dir).collect()[0]
    per = {}
    for x in (
        load_table(spark, sf_dir, "events")
        .filter("event_type IN ('view','click')")
        .select("user_id", "event_type")
        .collect()
    ):
        v, c = per.get(x.user_id, (0, 0))
        per[x.user_id] = (v + (x.event_type == "view"), c + (x.event_type == "click"))
    exact = sum(v * c for v, c in per.values())
    s_pairs = sum(
        v * c
        for u, (v, c) in per.items()
        if ((u % PRE_MOD) * KNUTH + 12345) % HASH_MOD < _JC_T
    )
    assert r.exact_join_card == exact
    assert abs(r.est_join_card - s_pairs * _JC_MOD / _JC_T) < 1e-9 * max(exact, 1)
    # a 1/16 sample of ~150 heavy keys should land within 3x — this is
    # an estimator sanity rail, not a statistical claim
    assert 0 < r.est_join_card < 10 * exact


def test_incremental_join_mv_agrees_with_recompute(spark, sf_dir):
    from wikipedia_data_pipeline_spark.queries.opsevents_queries import (
        incremental_mv_join_pairs,
    )

    rows = incremental_mv_join_pairs(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.pairs_incremental == r.pairs_recomputed, r


def test_ndcg_matches_bruteforce(spark, sf_dir):
    import math

    from wikipedia_data_pipeline_spark.operators.sampling import (
        HASH_MOD, KNUTH, PRE_MOD,
    )
    from wikipedia_data_pipeline_spark.queries.mleval_queries import (
        _NDCG_DISC, ml_eval_ndcg_events,
    )
    from wikipedia_data_pipeline_spark.sources.tables import load_table

    r = ml_eval_ndcg_events(spark, sf_dir).collect()[0]
    by_user = {}
    for x in (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_id", "value")
        .collect()
    ):
        rel = ((x.event_id % PRE_MOD) * KNUTH + 12345) % HASH_MOD % 3
        by_user.setdefault(x.user_id, []).append((x.value, x.event_id, rel))
    total_q, n_users = 0, 0
    for items in by_user.values():
        top = sorted(items, key=lambda t: (-t[0], t[1]))[:10]
        dcg_q = sum(
            round(rel * _NDCG_DISC[i] * 1e9) for i, (_, _, rel) in enumerate(top)
        )
        ideal = sorted(items, key=lambda t: (-t[2], t[1]))[:10]
        idcg_q = sum(
            round(rel * _NDCG_DISC[i] * 1e9) for i, (_, _, rel) in enumerate(ideal)
        )
        if idcg_q > 0:
            total_q += round(dcg_q / idcg_q * 1e9)
            n_users += 1
    assert r.n_users == n_users
    assert math.isclose(r.mean_ndcg_at_10, total_q / n_users / 1e9, rel_tol=1e-12)
    assert 0 < r.mean_ndcg_at_10 <= 1.0


def test_woe_binning_structure(spark, sf_dir):
    from wikipedia_data_pipeline_spark.queries.features_queries import (
        features_woe_binning,
    )
    from wikipedia_data_pipeline_spark.sources.tables import load_table

    rows = features_woe_binning(spark, sf_dir).collect()
    n_events = load_table(spark, sf_dir, "events").count()
    assert {r.bin for r in rows} <= set(range(1, 11))
    assert sum(r.n_pos + r.n_neg for r in rows) == n_events  # no bin dropped here
    for r in rows:
        # sign coherence: positive WoE iff bin odds beat global odds
        p = sum(x.n_pos for x in rows)
        n = sum(x.n_neg for x in rows)
        odds_ratio = (r.n_pos * n) / (r.n_neg * p)
        assert (r.woe > 0) == (odds_ratio > 1.0) or abs(r.woe) < 1e-9
        assert r.iv_term == r.iv_term  # not NaN


def test_merkle_segments_roll_up_to_table_totals(spark, sf_dir):
    from wikipedia_data_pipeline_spark.operators.sampling import det_hash
    from wikipedia_data_pipeline_spark.queries.opsevents_queries import (
        orders_merkle_segments,
    )
    from wikipedia_data_pipeline_spark.sources.tables import load_table

    segs = orders_merkle_segments(spark, sf_dir).collect()
    orders = load_table(spark, sf_dir, "orders")
    tot = orders.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(det_hash("o_orderkey")).alias("kc"),
        F.sum(F.round(F.col("o_totalprice") * 1000000).cast("long")).alias("vc"),
    ).collect()[0]
    assert sum(s.n_rows for s in segs) == tot.n
    assert sum(s.key_checksum for s in segs) == tot.kc
    assert sum(s.value_checksum_u for s in segs) == tot.vc
    # flipping one row's key changes exactly that segment's checksum
    seg_of = {s.segment: s.key_checksum for s in segs}
    assert len(seg_of) == len(segs)
