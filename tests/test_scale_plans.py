"""Plan-shape tests: assert the physical plans carry the properties the
100 TB design depends on — bucketed joins plan without exchanges,
partition pruning reaches the scan, filters/column pruning push into
parquet, small dims broadcast, and top-k avoids full sorts.

These are the `.explain()` checks from the build guidance, frozen as
regressions via plans.inspect: a future edit that silently reintroduces
a shuffle or drops a pushdown fails here, not in a cluster bill.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wikipedia_data_pipeline_spark.operators.tfidf import task1_dictionary
from wikipedia_data_pipeline_spark.plans import plan_summary
from wikipedia_data_pipeline_spark.queries.relational_queries import (
    events_hourly_rollup,
    q1_pricing_summary,
    q3_shipping_priority,
)
from wikipedia_data_pipeline_spark.sources.bucketing import (
    drop_table,
    write_bucketed,
)
from wikipedia_data_pipeline_spark.sources.tables import load_table


def test_bucketed_join_plans_without_shuffle(spark, sf_dir):
    """Both sides bucketed+sorted by the join key → sort-merge join with
    no Exchange: the write-time layout replaces the per-query shuffle
    (the fact-fact join strategy at scale)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    write_bucketed(li, "b_lineitem", ["l_orderkey"], 8, sort_cols=["l_orderkey"])
    write_bucketed(o, "b_orders", ["o_orderkey"], 8, sort_cols=["o_orderkey"])
    try:
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = spark.table("b_lineitem").join(
                spark.table("b_orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            ps = plan_summary(joined)
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        assert ps.n_sort_merge_joins == 1
        assert ps.n_shuffles == 0
        assert all(s["bucketed"] for s in ps.scans)
        # row-level sanity: bucketed join equals the plain join
        n_plain = (
            load_table(spark, sf_dir, "lineitem")
            .join(
                load_table(spark, sf_dir, "orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .count()
        )
        assert joined.count() == n_plain
    finally:
        drop_table(spark, "b_lineitem")
        drop_table(spark, "b_orders")


def test_q18_bucketed_colocated_zero_shuffles(spark, sf_dir):
    """The registered bucketed-layout consumer: BOTH of q18's wide
    exchanges (the fact-sized groupBy(l_orderkey) pre-agg and the
    big ⋈ orders join) must ride the twins' bucket partitioning —
    zero shuffle Exchange in the executed plan, broadcasts only.
    Results must equal the plain-layout q18 exactly."""
    from wikipedia_data_pipeline_spark import registry

    qs = registry.spark_queries()
    df = qs["q18_bucketed_colocated"](spark, sf_dir)
    ps = plan_summary(df)
    assert ps.n_shuffles == 0, ps
    got = sorted(map(tuple, df.collect()))
    want = sorted(map(tuple, qs["q18_large_orders"](spark, sf_dir).collect()))
    assert got == want


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    """Hive-style partitionBy layout → a partition-column predicate is a
    PartitionFilter (directory pruning), never a row filter."""
    ev = load_table(spark, sf_dir, "events")
    out = str(tmp_path / "events_by_type")
    ev.write.partitionBy("event_type").parquet(out)
    got = spark.read.parquet(out).filter(F.col("event_type") == "click")
    ps = plan_summary(got)
    assert "(event_type" in ps.scans[0]["partition_filters"]
    n_expected = ev.filter(F.col("event_type") == "click").count()
    assert got.count() == n_expected


def test_q1_pushes_filter_and_prunes_columns(spark, sf_dir):
    """The shipdate predicate must reach the parquet scan and the scan
    must not read columns the query never touches."""
    ps = plan_summary(q1_pricing_summary(spark, sf_dir))
    scan = ps.scan_for("lineitem")
    assert "LessThanOrEqual(l_shipdate" in scan["pushed_filters"]
    assert "l_comment" not in scan["read_schema"]
    assert "l_orderkey" not in scan["read_schema"]  # unused by q1
    assert "l_quantity" in scan["read_schema"]


def test_q3_broadcasts_filtered_dim(spark, sf_dir):
    """The selective customer dim must broadcast — never shuffle the
    fact side for a dim join."""
    ps = plan_summary(q3_shipping_priority(spark, sf_dir))
    assert ps.n_broadcast_joins >= 1


def test_task1_topk_avoids_full_sort(spark, sf_dir):
    """orderBy+limit must lower to TakeOrderedAndProject (per-partition
    partial top-k), not a global Sort."""
    docs = load_table(spark, sf_dir, "documents")
    assert plan_summary(task1_dictionary(docs)).has_take_ordered


def test_events_hourly_rollup_shuffle_budget(spark, sf_dir):
    """The hourly rollup must shuffle exactly twice — the two-phase
    count(DISTINCT user_id) agg — and nowhere else; the window-bucket
    computation is a narrow map."""
    assert plan_summary(events_hourly_rollup(spark, sf_dir)).n_shuffles == 2


@pytest.mark.parametrize("query_name", ["q5_region_revenue"])
def test_star_join_no_fact_side_shuffle_for_dims(spark, sf_dir, query_name):
    """Star joins: every dim join is broadcast; the only hash exchanges
    allowed are the fact-fact orderkey join and the final group-by."""
    from wikipedia_data_pipeline_spark import registry

    df = registry.spark_queries()[query_name](spark, sf_dir)
    assert plan_summary(df).n_broadcast_joins >= 2


def test_tfidf_two_data_shuffles(spark, sf_dir):
    """The whole TF-IDF pipeline must keep its shuffle budget: the
    (doc_id, word) agg and the doc_id TF-denominator join exchange on
    the persisted counts' consumers — broadcast everywhere else."""
    from wikipedia_data_pipeline_spark import registry

    df = registry.spark_queries()["tfidf_full"](spark, sf_dir)
    ps = plan_summary(df)
    assert ps.n_shuffles <= 3
    assert ps.n_broadcast_joins >= 1

def test_q18_preaggregates_before_joins(spark, sf_dir):
    """Q18's big-order filter must reduce lineitem BEFORE the customer/
    orders joins: the plan aggregates lineitem first (shuffle on
    l_orderkey), then broadcast-joins the shrunken set — never the raw
    fact table through the dimension joins."""
    from wikipedia_data_pipeline_spark.queries.analytics_queries import (
        q18_large_orders,
    )

    ps = plan_summary(q18_large_orders(spark, sf_dir))
    # lineitem scan reads only the agg inputs, not the full 11 columns
    li_scan = ps.scan_for("lineitem")
    assert "l_orderkey" in li_scan["read_schema"]
    assert "l_extendedprice" not in li_scan["read_schema"]
    assert ps.n_broadcast_joins >= 1


def test_events_funnel_single_shuffle(spark, sf_dir):
    """The conditional-agg funnel shuffles events exactly once (user_id
    grouping) plus a 1-row final agg — no per-stage self-joins."""
    from wikipedia_data_pipeline_spark.queries.analytics_queries import (
        events_funnel,
    )

    ps = plan_summary(events_funnel(spark, sf_dir))
    assert ps.n_shuffles <= 1
    ev_scan = ps.scan_for("events")
    assert "props" not in ev_scan["read_schema"]  # column pruning holds


def test_retention_prunes_event_columns(spark, sf_dir):
    from wikipedia_data_pipeline_spark.queries.analytics_queries import (
        events_retention_cohorts,
    )

    ps = plan_summary(events_retention_cohorts(spark, sf_dir))
    ev_scan = ps.scan_for("events")
    assert "user_id" in ev_scan["read_schema"]
    assert "props" not in ev_scan["read_schema"]
    assert "event_type" not in ev_scan["read_schema"]


def test_q6_filters_push_to_parquet_scan(spark, sf_dir):
    """Q6 is the canonical pushdown check: all four predicates must
    reach the lineitem scan as PushedFilters, and the scan must read
    only the four referenced columns."""
    from wikipedia_data_pipeline_spark.queries.analytics_queries import (
        q6_forecast_revenue,
    )

    ps = plan_summary(q6_forecast_revenue(spark, sf_dir))
    scan = ps.scan_for("lineitem")
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in scan["pushed_filters"], scan["pushed_filters"]
    assert "l_returnflag" not in scan["read_schema"]
    assert "l_tax" not in scan["read_schema"]


def test_q20_single_lineitem_scan(spark, sf_dir):
    """Q20's conditional aggregation must keep ONE lineitem scan (the
    spec form needs two scans joined on the pair key) and broadcast the
    part/nation dims; the docstring's 100 TB claim, frozen as a plan
    regression."""
    from wikipedia_data_pipeline_spark import registry

    df = registry.spark_queries()["q20_potential_promotion"](spark, sf_dir)
    ps = plan_summary(df)
    li_scans = [s for s in ps.scans if "lineitem" in s["location"]]
    assert len(li_scans) == 1, ps.scans
    assert ps.n_broadcast_joins >= 2
    assert ps.n_shuffles <= 2  # pair agg + distinct suppkey set


def test_segment_dedup_shuffle_budget(spark, sf_dir):
    """Segment dedup is exactly two wide ops: the global first-occurrence
    window on seg_text and the reassembly groupBy on doc_id."""
    from wikipedia_data_pipeline_spark import registry

    df = registry.spark_queries()["text_segment_dedup"](spark, sf_dir)
    ps = plan_summary(df)
    assert ps.n_shuffles <= 2, ps.n_shuffles
    doc_scans = [s for s in ps.scans if "documents" in s["location"]]
    assert len(doc_scans) == 1


def test_minhash_lsh_shuffle_budget(spark, sf_dir):
    """The LSH near-dup pipeline's shuffle budget, frozen: fan_out of the
    under-split scan, the (band,bhash) bucket grouping, and the
    candidate-pair distinct — 3 data shuffles total. The verify joins
    must broadcast (candidate pairs are banding-bounded), never shuffle
    the shingle relation."""
    from wikipedia_data_pipeline_spark.queries.dedup_queries import (
        dedup_minhash_lsh,
    )

    ps = plan_summary(dedup_minhash_lsh(spark, sf_dir))
    assert ps.n_shuffles <= 3, ps.n_shuffles


def test_bloom_prefilter_join_shuffle_budget(spark, sf_dir):
    # One broadcast (the 1-row sketch) + the exact equi-join; the
    # prefilter must not add data shuffles beyond the join's own.
    from wikipedia_data_pipeline_spark.queries.sketch_queries import bloom_prefilter_join_revenue

    ps = plan_summary(bloom_prefilter_join_revenue(spark, sf_dir))
    assert ps.n_broadcast_joins >= 1
    assert ps.n_shuffles <= 3  # join (2 sides at most) + final agg


def test_heavy_hitter_recount_broadcasts_candidates(spark, sf_dir):
    from wikipedia_data_pipeline_spark.queries.textcorpus_queries import heavy_hitter_tokens

    ps = plan_summary(heavy_hitter_tokens(spark, sf_dir))
    # Pass 2's semi join against the candidate set must be broadcast —
    # the full-histogram shuffle is exactly what the operator avoids.
    assert ps.n_broadcast_joins >= 1


def test_doc_similarity_prunes_high_df_words_before_join(spark, sf_dir):
    from wikipedia_data_pipeline_spark.queries.textsearch_queries import doc_similarity_tfidf

    plan = (
        doc_similarity_tfidf(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # The scale-relative df cap must appear as a filter in the plan
    # (pre-join pruning), and the top-100 must be a TakeOrdered, not a
    # global sort.
    assert "df#" in plan and "* 10)" in plan and "n_docs" in plan
    assert "TakeOrderedAndProject" in plan


def test_market_basket_topk_avoids_full_sort(spark, sf_dir):
    from wikipedia_data_pipeline_spark.queries.graph_queries import market_basket_pairs

    plan = (
        market_basket_pairs(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan  # top-100, not a global sort


def test_brand_return_rates_broadcasts_dimension(spark, sf_dir):
    from wikipedia_data_pipeline_spark.queries.finance_queries import part_brand_return_rates

    ps = plan_summary(part_brand_return_rates(spark, sf_dir))
    assert ps.n_broadcast_joins >= 1
    assert ps.n_sort_merge_joins == 0  # fact side never shuffles for the join


def test_rolling_active_users_collapses_before_range_join(spark, sf_dir):
    # The fact table must aggregate to the distinct (day, user) state
    # BEFORE the 7-day range join: the join inputs are aggregates, not
    # the raw events scan.
    from wikipedia_data_pipeline_spark.queries.opsevents_queries import events_rolling_active_users

    plan = (
        events_rolling_active_users(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # The distinct (day, user) state is persisted and both join inputs
    # read the cached relation — the raw events scan feeds the join
    # exactly once, through the aggregation.
    assert "InMemoryTableScan" in plan
    assert "Join" in plan and "HashAggregate" in plan


def test_prefix_filter_join_is_all_equi(spark, sf_dir):
    """The point of prefix filtering: candidate generation is an
    EQUI-join on the prefix token — no cartesian/nested-loop node may
    appear anywhere (the brute-force twin is exactly one)."""
    from wikipedia_data_pipeline_spark.operators.dedup import (
        prefix_filter_pairs,
    )
    from wikipedia_data_pipeline_spark.plans.inspect import executed_plan

    docs = load_table(spark, sf_dir, "documents")
    df = prefix_filter_pairs(docs, 0.5)
    ps = plan_summary(df)
    assert ps.n_nested_loop_joins == 0
    assert "CartesianProduct" not in executed_plan(df, run=False)


def test_text_search_topk_avoids_full_sort(spark, sf_dir):
    from wikipedia_data_pipeline_spark.queries.textsearch_queries import text_search_tfidf

    ps = plan_summary(text_search_tfidf(spark, sf_dir))
    assert ps.has_take_ordered  # top-20 must be TakeOrdered, not Sort
    assert ps.n_broadcast_joins >= 1  # idf side stays broadcast


def test_pagerank_reuses_persisted_edges(spark, sf_dir):
    """Each iteration must read the persisted edge relation (one
    InMemoryTableScan per iteration), not recompute the lineitem
    distinct — the property that keeps iteration cost proportional to
    cached edges."""
    from wikipedia_data_pipeline_spark.plans.inspect import executed_plan
    from wikipedia_data_pipeline_spark.queries.graph_queries import graph_pagerank_partsupp

    plan = executed_plan(graph_pagerank_partsupp(spark, sf_dir))
    assert plan.count("TableCacheQueryStage") + plan.count(
        "InMemoryTableScan"
    ) >= 3


def test_target_encode_broadcasts_category_stats(spark, sf_dir):
    from wikipedia_data_pipeline_spark.queries.features_queries import features_target_encode_loo

    ps = plan_summary(features_target_encode_loo(spark, sf_dir))
    assert ps.n_broadcast_joins >= 1
    assert ps.n_shuffles <= 1  # the category aggregate only


def test_containment_join_is_all_equi(spark, sf_dir):
    from wikipedia_data_pipeline_spark.operators.dedup import containment_pairs
    from wikipedia_data_pipeline_spark.plans.inspect import executed_plan

    docs = load_table(spark, sf_dir, "documents")
    df = containment_pairs(docs, 0.8)
    ps = plan_summary(df)
    assert ps.n_nested_loop_joins == 0
    assert "CartesianProduct" not in executed_plan(df, run=False)


def test_fuzzy_levenshtein_blocks_before_comparing(spark, sf_dir):
    """Edit distance may only run on blocked candidates: the join must
    be an equi-join on the block key (no cartesian), and the scan must
    prune to the 3 needed columns."""
    from wikipedia_data_pipeline_spark.plans.inspect import executed_plan
    from wikipedia_data_pipeline_spark.queries.profiling_queries import dedup_fuzzy_levenshtein

    df = dedup_fuzzy_levenshtein(spark, sf_dir)
    ps = plan_summary(df)
    assert ps.n_nested_loop_joins == 0
    assert "CartesianProduct" not in executed_plan(df, run=False)
    scan = ps.scan_for("documents")
    assert "text" in scan["read_schema"]
    assert "lang" not in scan["read_schema"]


def test_abc_classification_windows_over_aggregate(spark, sf_dir):
    """The running-share scan must sit ABOVE the part-keyed aggregate,
    not the lineitem scan: the hash shuffles are the groupBy plus the
    hierarchical scan's by-block exchange — never a full-sort."""
    from wikipedia_data_pipeline_spark.queries.finance_queries import parts_abc_classification

    ps = plan_summary(parts_abc_classification(spark, sf_dir))
    assert ps.n_shuffles <= 2  # part-key agg + ordered_scan's by-block hash


@pytest.mark.parametrize(
    "query_name",
    [
        "events_lateness_audit",
        "events_value_gini",
        "customer_rfm_segments",
        "parts_abc_classification",
        "revenue_concentration_deciles",
        "corpus_zipf_fit",
        "parts_skyline_price_size",
        "corpus_heaps_growth",
        "events_kl_user_vs_global",
        "key_skew_events",
        "lineitem_exact_percentiles",
        # round 6: ordered_scan consumers + sketch merge windows
        "sketch_quantile_summary_events",
        "sample_pps_systematic_orders",
        "sketch_kmv_distinct_users",
        "incremental_distinct_users_kmv",
        # round 12: the distinct-value stats lineage — on a near-unique
        # score column the per-distinct-value relation is fact-sized,
        # so these must ride ordered_scan, not a global window
        "ml_eval_auc_delong_ci",
        "events_ks_test_ab",
        "events_mannwhitney_ab",
        "stats_cliffs_delta",
        "stats_logrank_test",
        "orders_survival_curve",
    ],
)
def test_no_unguarded_global_windows(spark, sf_dir, query_name):
    """The entity-rank family (global rank / running share / ntile over
    users, parts, customers, vocab) must never plan an unpartitioned
    WindowExec over a data- or entity-sized input — at 100 TB those
    relations are 1e8+ rows and a SinglePartition window serializes
    them through one task. After migration to operators.ranks, the ONLY
    unpartitioned windows allowed in these plans are the ones over the
    per-block offsets relation (≤ shuffle-partition-count rows),
    recognizable by their _os_pid-keyed aggregate input."""
    from wikipedia_data_pipeline_spark import registry
    from wikipedia_data_pipeline_spark.plans import global_windows

    q = registry.spark_queries()[query_name]
    for w in global_windows(q(spark, sf_dir)):
        assert w["guarded"], f"unguarded global window: {w['node'][:120]}"


def test_zorder_key_query_is_shuffle_free(spark):
    # The clustering key is pure per-row shift/mask arithmetic: the
    # query must plan as scan -> project with no Exchange anywhere.
    from wikipedia_data_pipeline_spark.queries.spatial_queries import layout_zorder_key_events

    plan = layout_zorder_key_events(
        spark, "/root/testdata/sf0.001"
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_r9_eval_queries_scan_budget(spark, sf_dir):
    """The round-9 eval/privacy/mixing queries are single-scan hash
    aggregations (plus pruned re-scans where a broadcast global range
    is genuinely needed): column pruning must reach every events scan,
    no SortMergeJoin may appear (the only joins are broadcast 1-row
    crossJoins), and the driver-tiny intermediate relations must be
    persisted so branching consumers don't re-run the fact agg."""
    from wikipedia_data_pipeline_spark import registry
    from wikipedia_data_pipeline_spark.operators import ranks

    qs = registry.spark_queries()
    import re

    budgets = {
        # name: (max scans, the ONLY events columns any scan may read)
        "ml_eval_calibration_bins": (2, {"user_id", "value"}),
        "ml_eval_rater_kappa": (1, {"event_id"}),
        "ml_eval_fairness_gaps": (1, {"user_id", "value"}),
        "ml_eval_ips_value": (1, {"event_id", "user_id"}),
        "ml_eval_pass_at_k": (1, {"event_id", "user_id"}),
        "privacy_dp_release_counts": (1, {"event_type"}),
        "events_sprt_ab": (1, {"ts", "user_id"}),
    }
    try:
        for name, (max_scans, allowed) in budgets.items():
            ps = plan_summary(qs[name](spark, sf_dir))
            assert len(ps.scans) <= max_scans, (name, len(ps.scans))
            assert ps.n_sort_merge_joins == 0, name
            for s in ps.scans:
                read = set(re.findall(r"(\w+):", s["read_schema"]))
                assert read <= allowed, (name, read - allowed)
    finally:
        ranks.unpersist_all()


def test_mixture_weights_single_corpus_scan(spark, sf_dir):
    from wikipedia_data_pipeline_spark import registry
    from wikipedia_data_pipeline_spark.operators import ranks

    q = registry.spark_queries()["curation_mixture_weights"]
    try:
        ps = plan_summary(q(spark, sf_dir))
        assert len(ps.scans) == 1
        assert "text" not in ps.scans[0]["read_schema"]
        assert ps.n_sort_merge_joins == 0
    finally:
        ranks.unpersist_all()


def test_conformal_no_sort_merge_and_pruned(spark, sf_dir):
    """Split-conformal rides exact_quantiles: the threshold must come
    from selection (no SortMergeJoin, no TakeOrdered full sort of the
    calibration half) and every events scan stays pruned."""
    from wikipedia_data_pipeline_spark import registry
    from wikipedia_data_pipeline_spark.operators import ranks

    q = registry.spark_queries()["ml_eval_conformal_threshold"]
    try:
        ps = plan_summary(q(spark, sf_dir))
        assert ps.n_sort_merge_joins == 0
        for s in ps.scans:
            assert "props" not in s["read_schema"]
            assert "event_type" not in s["read_schema"]
    finally:
        ranks.unpersist_all()


def test_winnowing_is_two_aggs_no_joins(spark, sf_dir):
    """Winnowing must stay scan -> array math -> (lang, fp) agg ->
    lang rollup: no join of any kind, exactly two hash exchanges, and
    no Python evaluation in the plan (the hash is pure expressions)."""
    from wikipedia_data_pipeline_spark.plans.inspect import executed_plan
    from wikipedia_data_pipeline_spark.registry import spark_queries

    df = spark_queries()["text_winnowing_shared_fingerprints"](
        spark, sf_dir
    )
    s = plan_summary(df)
    assert s.n_broadcast_joins == 0
    assert s.n_sort_merge_joins == 0
    assert s.n_nested_loop_joins == 0
    assert s.n_shuffles == 2
    plan = executed_plan(df)
    assert "EvalPython" not in plan  # no Batch/ArrowEvalPython nodes


def test_rrf_truncations_are_take_ordered(spark, sf_dir):
    """Both RRF list truncations must plan as TakeOrderedAndProject —
    no global sort — and the fusion must never sort-merge more than
    the one bounded 200-row full-outer join."""
    from wikipedia_data_pipeline_spark.registry import spark_queries

    df = spark_queries()["text_search_rrf_hybrid"](spark, sf_dir)
    s = plan_summary(df)
    assert s.has_take_ordered
    assert s.n_sort_merge_joins <= 1


def test_truncation_recall_single_pass(spark, sf_dir):
    """The r13 Arrow-kernel rewrite: per-pair scoring lives in ONE
    MapInPandas over the corpus scan (each batch emits only its top-10
    per (query, dim)), no join of any kind, and the (dim, query) rank
    window plus the (query, vec) pivot as the only hash exchanges —
    they run over ~150 rows per batch, not |pairs|×3."""
    from wikipedia_data_pipeline_spark.plans.inspect import executed_plan
    from wikipedia_data_pipeline_spark.registry import spark_queries

    df = spark_queries()["ann_dim_truncation_recall"](spark, sf_dir)
    s = plan_summary(df)
    assert s.n_sort_merge_joins == 0
    assert s.n_shuffles <= 3
    plan = executed_plan(df, run=False)
    assert "MapInPandas" in plan


def test_hamming_topk_is_broadcast_probe_no_python(spark, sf_dir):
    """1-bit ANN: the probe side must broadcast (5 rows), the packing
    must be pure expressions (no Python eval), and the only hash
    exchange is the per-query rank window."""
    from wikipedia_data_pipeline_spark.plans.inspect import executed_plan
    from wikipedia_data_pipeline_spark.registry import spark_queries

    df = spark_queries()["embedding_hamming_topk"](spark, sf_dir)
    s = plan_summary(df)
    assert s.n_sort_merge_joins == 0
    assert s.n_shuffles <= 1
    plan = executed_plan(df)
    assert "EvalPython" not in plan


def test_dsir_lambda_table_broadcasts(spark, sf_dir):
    """DSIR: the 256-row lambda table must broadcast back onto the
    token stream (never shuffle the tokens against it), and no Python
    evaluation anywhere."""
    from wikipedia_data_pipeline_spark.plans.inspect import executed_plan
    from wikipedia_data_pipeline_spark.registry import spark_queries

    df = spark_queries()["curation_dsir_importance_weights"](spark, sf_dir)
    s = plan_summary(df)
    assert s.n_broadcast_joins >= 1
    assert s.n_sort_merge_joins == 0
    plan = executed_plan(df)
    assert "EvalPython" not in plan


def test_permutation_test_fans_out_after_aggregation(spark, sf_dir):
    """The 200-way permutation fan-out must multiply the per-user
    aggregate, never the fact table: exactly one fact-sized exchange
    (the user grouping); the k/arm explode and the per-k agg ride the
    entity relation."""
    from wikipedia_data_pipeline_spark.plans.inspect import executed_plan
    from wikipedia_data_pipeline_spark.registry import spark_queries

    df = spark_queries()["stats_permutation_test_ab"](spark, sf_dir)
    plan = executed_plan(df).split("== Initial Plan ==")[0]
    # the explode (Generate) must sit ABOVE the user-level HashAggregate
    # in text order (executed plans print top-down: consumers first)
    gen = plan.index("Generate explode")
    agg = plan.rindex("HashAggregate")
    assert gen < agg, "explode must consume the aggregate, not events"
    assert plan.count("FileScan parquet") == 1  # one events scan total


def test_gumbel_topk_is_take_ordered(spark, sf_dir):
    """The k-draw must plan as TakeOrderedAndProject (no global sort of
    the weighted corpus); the only rank window runs post-limit."""
    from wikipedia_data_pipeline_spark.registry import spark_queries

    df = spark_queries()["sample_gumbel_topk_docs"](spark, sf_dir)
    s = plan_summary(df)
    assert s.has_take_ordered
    assert s.n_sort_merge_joins == 0


def test_pinball_trains_via_selection_not_window(spark, sf_dir):
    """The p90 forecast must come from grouped_exact_quantiles'
    selection (its _gq working columns appear in the plan) and the
    forecast join back onto the test slice must broadcast."""
    from wikipedia_data_pipeline_spark.plans.inspect import executed_plan
    from wikipedia_data_pipeline_spark.registry import spark_queries

    df = spark_queries()["ml_eval_pinball_loss"](spark, sf_dir)
    plan = executed_plan(df).split("== Initial Plan ==")[0]
    assert "_gq_k" in plan  # selection machinery, not a rank-all window
    s = plan_summary(df)
    assert s.n_broadcast_joins >= 1


def test_mrr_windows_are_user_partitioned(spark, sf_dir):
    """MRR must never serialize: its one window is partitioned by
    user_id (global_windows finds no unpartitioned WindowExec)."""
    from wikipedia_data_pipeline_spark.plans.inspect import global_windows
    from wikipedia_data_pipeline_spark.registry import spark_queries

    df = spark_queries()["ml_eval_mrr"](spark, sf_dir)
    assert global_windows(df) == []


def test_q3_bucketed_colocated_zero_shuffles(spark, sf_dir):
    """Second bucketed-layout consumer (amortization argument: one twin
    layout serves every orderkey-keyed join): q3's fact⋈fact join and
    orderkey-leading groupBy must both ride the bucket partitioning —
    zero shuffle Exchange, filtered customer dim broadcast only.
    Results must equal the plain-layout q3 exactly."""
    from wikipedia_data_pipeline_spark import registry

    qs = registry.spark_queries()
    df = qs["q3_bucketed_colocated"](spark, sf_dir)
    ps = plan_summary(df)
    assert ps.n_shuffles == 0, ps
    got = [tuple(r) for r in df.collect()]
    want = [
        tuple(r) for r in qs["q3_shipping_priority"](spark, sf_dir).collect()
    ]
    assert got == want


def test_q5_bucketed_colocated_one_shuffle(spark, sf_dir):
    """Third bucketed consumer: the fact⋈fact join must ride the
    bucket partitioning; the only allowed exchange is the 25-group
    nation-level aggregate AFTER the joins (dims broadcast)."""
    from wikipedia_data_pipeline_spark import registry

    qs = registry.spark_queries()
    df = qs["q5_bucketed_colocated"](spark, sf_dir)
    ps = plan_summary(df)
    assert ps.n_shuffles <= 1, ps
    got = sorted(map(tuple, df.collect()))
    want = sorted(map(tuple, qs["q5_region_revenue"](spark, sf_dir).collect()))
    assert got == want


def test_sessionization_bucketed_zero_shuffles(spark, sf_dir):
    """Fourth bucketed consumer, first on the user_id key: the per-user
    gaps-and-islands windows AND the (user_id, session_id) final
    aggregate must both ride the events twin's bucket partitioning
    (user_id is a prefix of the grouping keys) — zero shuffle Exchange
    in the executed plan. Results must equal plain sessionization
    exactly."""
    from wikipedia_data_pipeline_spark import registry

    qs = registry.spark_queries()
    df = qs["sessionization_bucketed"](spark, sf_dir)
    ps = plan_summary(df)
    assert ps.n_shuffles == 0, ps
    got = sorted(map(tuple, df.collect()))
    want = sorted(map(tuple, qs["sessionization"](spark, sf_dir).collect()))
    assert got == want


def test_asof_bucketed_zero_shuffles(spark, sf_dir):
    """Fifth bucketed consumer, second on the user_id key: the as-of
    join's per-user window must ride the events twin's bucket
    partitioning — zero shuffle Exchange. Results must equal the plain
    as-of join exactly."""
    from wikipedia_data_pipeline_spark import registry

    qs = registry.spark_queries()
    df = qs["asof_join_last_view_bucketed"](spark, sf_dir)
    ps = plan_summary(df)
    assert ps.n_shuffles == 0, ps
    got = sorted(map(tuple, df.collect()))
    want = sorted(
        map(tuple, qs["asof_join_last_view"](spark, sf_dir).collect())
    )
    assert got == want


def test_rolling_active_users_bucketed_no_fact_shuffle(spark, sf_dir):
    """Sixth bucketed consumer, third on the user_id key: the plain
    form's only fact-sized exchange is the distinct over
    (day, user_id); the twin's HashPartitioning(user_id) satisfies
    that grouping (subset of the keys), so the bucketed plan must
    drop exactly that exchange — one fewer shuffle than the plain
    plan, with everything remaining operating on the collapsed
    day x user state. Results must match the plain form exactly."""
    from wikipedia_data_pipeline_spark import registry

    qs = registry.spark_queries()
    plain = qs["events_rolling_active_users"](spark, sf_dir)
    bucketed = qs["events_rolling_active_users_bucketed"](spark, sf_dir)
    ps_p, ps_b = plan_summary(plain), plan_summary(bucketed)
    assert ps_b.n_shuffles == ps_p.n_shuffles - 1, (ps_p, ps_b)
    got = sorted(map(tuple, bucketed.collect()))
    want = sorted(map(tuple, plain.collect()))
    assert got == want
