#!/usr/bin/env python
"""100x-replica scale probe with DuckDB twin timings (round-9 form;
r8 verdict items #3 and #5).

Runs the headline family, the round-6/7 novelties, the streaming batch
twins, and the three round-9 grouped-selection quantile consumers
(paired with their round-8 window-baseline formulations as an A/B) on
the 100x replica of the driver's sf0.1 data (~sf10 facts: 60M
lineitem, 10M events), best-of-3 warm each, and times the DuckDB
oracle twin of every oracle-bearing query on the same replica, so the
micro-aggregate family has a ratio at a scale where the scheduling
floor is fully amortized. Also re-establishes the controlled
decimal-tax figure (q1 dec_sum vs BIGINT-cents) the r8 bench artifact
clouded.

DuckDB twins that exceed a per-query budget are recorded as "timeout"
(the brute-force-oracle twins are DELIBERATELY quadratic; timing them
measures oracle design, not engines — same exclusion rule as bench.py).

Usage: python tools/scale_probe.py [out_json]
"""

from __future__ import annotations

import json
import multiprocessing
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC_SF = "/root/testdata/sf0.1"
DUCK_BUDGET_S = 120.0

PROBE = [
    # headline family (comparable to SCALE_PROBE_r06)
    "q1_pricing_summary",
    "q1_pricing_summary_cents",   # the dec_sum-vs-cents A/B at 100x
    "q3_shipping_priority",
    "q5_region_revenue",
    "events_hourly_rollup",
    "sessionization",
    "window_rank_orders",
    "dedup_exact",
    "parts_abc_classification",
    "lineitem_exact_percentiles",
    "customer_rfm_segments",
    "events_lateness_audit",
    "revenue_concentration_deciles",
    "text_quality_scores",
    "tfidf_full",
    "dedup_minhash_lsh",
    # r6s2 novelties (verdict #4: 100x rows + plan note each)
    "spatial_grid_join_events",
    "events_rolling_median_value",
    "sketch_kmv_distinct_users",
    "sketch_kmv_jaccard_matrix",
    "events_rolling_distinct_kmv",
    "incremental_distinct_users_kmv",
    "sketch_quantile_summary_events",
    "sketch_ams_f2_users",
    "ml_eval_auc_events",
    "ml_eval_gains_table",
    "events_theil_sen_trend",
    "events_pattern_match",
    "sample_pps_systematic_orders",
    # r7 novelties (r8 verdict #3: 100x rows + DuckDB twins)
    "ml_eval_ndcg_events",
    "features_woe_binning",
    "events_changepoint_value",
    "sketch_join_cardinality_events",
    "incremental_mv_join_pairs",
    "orders_merkle_segments",
    # Streaming family: NOT probed here. The streaming_* queries run
    # their availableNow stream into a memory sink at CONSTRUCTION
    # time (streaming/pipeline.py), so the noop-write timing below
    # would measure only the sink read — and each best-of-3 iteration
    # would re-run a full 10M-event stateful stream (the file source
    # parallelizes by FILE, 4 files in the replica, so one such run
    # alone exceeded 15 min). Their exact batch equivalence is what
    # the oracle gate proves; the probe times the registered BATCH
    # twin of the interval join instead:
    "events_view_click_join",
    # r9: the three per-type quantile consumers moved to grouped exact
    # SELECTION this round — paired with __window_baseline A/Bs below
    "events_quantile_table",
    "events_winsorized",
    "events_mad_outliers",
    # r9 novelties: eval/privacy/sequential/mixing additions (100x rows
    # + DuckDB twins, same standing rule as the r6/r7 novelty blocks)
    "ml_eval_calibration_bins",
    "ml_eval_rater_kappa",
    "ml_eval_fairness_gaps",
    "ml_eval_conformal_threshold",
    "ml_eval_ips_value",
    "ml_eval_pass_at_k",
    "privacy_dp_release_counts",
    "events_sprt_ab",
    "curation_mixture_weights",
    # customer is a dimension (copied unchanged into the replica), so
    # the linkage block density stays REAL at 100x; embeddings shift
    # ids, so truncation-recall scores a 100x corpus against the same
    # 5 query vectors
    "linkage_customer_pairs",
    "ann_dim_truncation_recall",
    # r9 session-4 additions: BT rides a per-user self-join (user ids
    # shift per replica, so pair density stays real); Fleiss is a
    # single 1-row aggregate; distinct-n is two count-distinct aggs
    "ml_eval_bradley_terry",
    "ml_eval_fleiss_kappa",
    "text_distinct_ngrams",
    # winnowing/chao1 scan the 100x documents corpus; CUPED is the
    # per-user agg -> tiny-moments shape on 10M events
    "text_winnowing_shared_fingerprints",
    "corpus_chao1_richness",
    "ml_eval_cuped_ab",
    # RRF rides the BM25 + cosine stacks end-to-end
    "text_search_rrf_hybrid",
    # span-dedup rides the let-binding fix (shingle lambda)
    "text_span_dedup_stats",
    # delta-tokenize + vocab-merge refresh of the reference's idf table
    "tfidf_incremental_idf_refresh",
    # greedy facility-location coreset: k corpus scans vs broadcast pool
    "curation_coreset_facility_location",
    # Brier/Murphy decomposition: scan -> 10-bin agg + 1-row moments
    "ml_eval_brier_decomposition",
    # BH-FDR over per-type KS: windows over the collapsed value relation
    "stats_bh_fdr_screen",
    # McNemar paired-model test: scan -> 1-row aggregate
    "ml_eval_mcnemar_test",
    # r10 novelties (standing rule: 100x rows + DuckDB twins)
    "curation_dsir_importance_weights",
    "embedding_hamming_topk",
    "ml_eval_krippendorff_alpha",
    "stats_permutation_test_ab",
    "text_yule_k_diversity",
    "ml_eval_cochran_q",
    "curation_token_mixture_epochs",
    "graph_sssp_3hop",
    "multimodal_audio_vad_segments",
    "sample_gumbel_topk_docs",
    "multimodal_image_ahash_groups",
    "ml_eval_average_precision",
    "ml_eval_pinball_loss",
    "ml_eval_isotonic_calibration",
    "stats_tost_equivalence",
    "ml_eval_mrr",
    # r10 cents flips: agg-dominated shapes re-probed post-flip
    "q18_large_orders",
    "agg_grouping_sets",
    "join_range_periods",
    "events_daily_gapfill",
    "events_sliding_window",
    # r11: the registered bucketed-layout consumer (eager: run 1 pays
    # the one-time twin write, best-of-3 reads the post-write steady
    # state; compare against q18_large_orders directly above)
    "q18_bucketed_colocated",
    # r11 session 2: second bucketed consumer (one twin layout serves
    # every orderkey-keyed join; measured 2.42 -> 1.60 s vs
    # q3_shipping_priority, zero exchanges)
    "q3_bucketed_colocated",
    "q5_bucketed_colocated",
    # r11 session 2 novelties: the ones with fact-scale work
    "events_sax_symbols",
    "ml_eval_bleu_corpus",
    "ml_eval_rouge_n",
    "ml_eval_spearman_rho",
    "ml_eval_auc_delong_ci",
    "ml_eval_youden_j_threshold",
    "stats_cliffs_delta",
    "stats_logrank_test",
    "stats_mantel_haenszel",
    "privacy_t_closeness",
    "profiling_fd_violations",
    "sample_class_balanced_docs",
    "graph_hits_scores",
    "recs_catalog_coverage",
    "text_tokenizer_fertility",
    "dedup_cross_source_matrix",
    # r12: distinct-value-lineage members not yet probed (the other
    # three — delong/cliffs/logrank — are in the r11 block above);
    # all six now ride ordered_scan instead of unpartitioned windows
    "events_ks_test_ab",
    "events_mannwhitney_ab",
    "orders_survival_curve",
    # r12 session-2 novelties (standing rule: 100x rows + DuckDB twins)
    "stats_kruskal_wallis",
    "stats_cochran_armitage_trend",
    "orders_nelson_aalen_hazard",
    "sample_neyman_allocation",
    "embedding_cosine_pair_histogram",
    "stats_kendall_tau_b",
    "stats_jonckheere_terpstra",
    "ml_eval_regression_panel",
    "multimodal_image_luma_histogram",
    "dedup_doc_continuation",
    # r12 bucketed consumers on the user_id twin (eager; run 1 pays
    # the one-time twin write, best-of pays steady state)
    "sessionization_bucketed",
    "asof_join_last_view_bucketed",
    # r12 session-3 novelties
    "privacy_dp_median_release",
    "stats_effect_size_panel",
    "sample_mixture_temperature",
    "text_ngram_novelty_rate",
    # r12 session-4 nonparametric battery + extensions
    "stats_friedman_test",
    "stats_brown_forsythe",
    "stats_mood_median_test",
    "stats_wilcoxon_signed_rank",
    "stats_brunner_munzel",
    "stats_runs_test",
    "stats_ljung_box",
    "stats_durbin_watson",
    "stats_anderson_darling_2s",
    "stats_page_trend",
    "stats_ansari_bradley",
    "stats_hodges_lehmann",
    "events_hurst_rs",
    "sample_horvitz_thompson_counts",
    "dedup_connected_components",
    "ml_eval_chrf",
    # r12 session-5 novelties
    "stats_kendall_w",
    "stats_cvm_2s",
    "ml_eval_weighted_kappa",
    "ml_eval_macro_f1",
    "ml_eval_rbo_rankings",
    "ml_eval_wer",
    "sample_split_ks_uniformity",
    "privacy_randomized_response",
    # r12 session-6 novelties
    "text_good_turing_mass",
    "text_log_odds_sources",
    "text_hellinger_sources",
    "events_theil_inequality",
    "events_capture_recapture",
    "orders_rmst",
    "events_page_hinkley",
    "stats_grubbs_outlier",
    "stats_jarque_bera",
    "stats_poisson_rate_ratio",
    "ml_eval_spiegelhalter_z",
    "ml_eval_hosmer_lemeshow",
    "ml_eval_cronbach_alpha",
    "stats_welch_ttest",
    "stats_oneway_anova_f",
    "events_cramers_v_matrix",
    "events_gpd_moment_fit",
    "stats_pacf_durbin_levinson",
    "text_sttr_segments",
    "text_burrows_delta",
    "privacy_dp_topk_words",
    "spatial_moran_i_events",
    "text_rake_keywords",
    "sample_group_kfold_audit",
    "embedding_participation_ratio",
    # r13: third user_id-twin consumer (A/B pair — the plain form was
    # never probed; the bucketed form elides the fact-sized distinct
    # exchange)
    "events_rolling_active_users",
    "events_rolling_active_users_bucketed",
]
# quadratic-oracle twins: timing DuckDB here measures the oracle's
# deliberate brute-force design, not the engine — skip, like bench.py
DUCK_SKIP = {"dedup_minhash_lsh", "dedup_cross_source_matrix"}  # quadratic oracles

# Floor-adjusted view (r12 verdict #6): the sub-3 s absolute rows with
# the worst 100x ratios are HYPOTHESIZED to be scheduling-floor-bound,
# not plan-bound — measure it instead of asserting it. For each row
# both engines run the SAME plan at sf0.001 (pure fixed cost: parse,
# codegen, scheduling) and the floor-subtracted ratio
#   (spark_100x - spark_floor) / (duck_100x - duck_floor)
# isolates the data-dependent plan time, exactly like bench.py's
# adjusted_ratio. Set = the 14 worst sub-3 s ratios in SCALE_PROBE_r12
# plus the two the verdict named explicitly (Kendall W, CvM).
FLOOR_SF = "/root/testdata/sf0.001"
FLOOR_ROWS = [
    "customer_rfm_segments",
    "stats_brunner_munzel",
    "stats_ansari_bradley",
    "privacy_randomized_response",
    "curation_mixture_weights",
    "stats_runs_test",
    "stats_wilcoxon_signed_rank",
    "join_range_periods",
    "stats_cliffs_delta",
    "events_mannwhitney_ab",
    "stats_tost_equivalence",
    "incremental_mv_join_pairs",
    "stats_welch_ttest",
    "stats_ljung_box",
    "stats_kendall_w",
    "stats_cvm_2s",
]

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck_worker(sql, sf_dir, q):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    best = float("inf")
    for _ in range(2):  # best-of-2: first run doubles as page-cache warmup
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        best = min(best, time.perf_counter() - t0)
    q.put(round(best, 2))


def duck_time(sql, sf_dir):
    """One DuckDB run in a subprocess so a runaway twin can be killed
    at the budget instead of wedging the probe."""
    q = multiprocessing.Queue()
    p = multiprocessing.Process(target=_duck_worker, args=(sql, sf_dir, q))
    p.start()
    p.join(DUCK_BUDGET_S)
    if p.is_alive():
        p.terminate()
        p.join()
        return "timeout"
    return q.get() if not q.empty() else "error"


def _win_quantile_table(spark, sf_dir):
    """Round-8 formulation of events_quantile_table (per-type window
    ranking every row) — kept here ONLY as the A/B baseline for the
    round-9 grouped-selection rewrite; same output, same oracle."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from wikipedia_data_pipeline_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.asc("value"), F.asc("event_id")
    )
    wn = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        "value",
        F.row_number().over(w).cast("long").alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    qs = ranked.select(
        "event_type",
        "value",
        "rn",
        F.explode(
            F.array(
                F.struct(
                    F.lit("p50").alias("q"),
                    F.expr("(n + 1) div 2").alias("pos"),
                ),
                F.struct(
                    F.lit("p90").alias("q"),
                    F.expr("(9 * n + 9) div 10").alias("pos"),
                ),
                F.struct(
                    F.lit("p99").alias("q"),
                    F.expr("(99 * n + 99) div 100").alias("pos"),
                ),
            )
        ).alias("qp"),
    )
    return qs.filter(F.col("rn") == F.col("qp.pos")).select(
        "event_type",
        F.col("qp.q").alias("q"),
        F.col("value").alias("quantile_value"),
    )


def _win_winsorized(spark, sf_dir):
    """Round-8 window formulation of events_winsorized (A/B baseline)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from wikipedia_data_pipeline_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    cw = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_id",
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(cw).alias("cnt"),
    )
    p99 = (
        ranked.where(F.col("rn") >= F.ceil(0.99 * F.col("cnt")).cast("long"))
        .groupBy("event_type")
        .agg(F.min("value").alias("p99_v"))
    )
    return ranked.join(F.broadcast(p99), "event_type").select(
        "event_id",
        "event_type",
        "value",
        F.least(F.col("value"), F.col("p99_v")).alias("value_capped"),
    )


def _win_mad_outliers(spark, sf_dir):
    """Round-8 window formulation of events_mad_outliers (A/B baseline)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from wikipedia_data_pipeline_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")

    def rank_select(df, order_col, out_name):
        w = Window.partitionBy("event_type").orderBy(
            F.asc(order_col), F.asc("event_id")
        )
        wn = Window.partitionBy("event_type")
        return (
            df.select(
                "event_type",
                F.col(order_col),
                F.row_number().over(w).alias("rn"),
                F.count(F.lit(1)).over(wn).alias("n"),
            )
            .filter(F.col("rn") == F.expr("(n + 1) div 2"))
            .select("event_type", F.col(order_col).alias(out_name))
        )

    med = rank_select(ev, "value", "med")
    d = ev.join(F.broadcast(med), "event_type").select(
        "event_id",
        "event_type",
        "value",
        "med",
        (F.abs(F.col("value") - F.col("med"))).alias("dev"),
    )
    mad = rank_select(d, "dev", "mad")
    return (
        d.join(F.broadcast(mad), "event_type")
        .filter(F.col("dev") > 3 * F.col("mad"))
        .select("event_id", "event_type", "value", "med", "mad")
    )


def _ntile_rfm_variant(spark, sf_dir):
    """ntile_by_cuts (boundary-selection) formulation of
    customer_rfm_segments — the round-9 rewrite CANDIDATE that was
    measured and REJECTED: at the 100× probe the three chained cuts
    over the persisted customer aggregate ran 6.59 s vs 1.88 s for the
    registered global_ntile form. exact_quantiles' fixed per-cut job
    count (count + slim range exchange + boundary window + broadcast
    back) dominates when the entity-sized relation block-sorts
    cheaply; kept here so the A/B stays in SCALE_PROBE artifacts."""
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from wikipedia_data_pipeline_spark.functions import cents_sum
    from wikipedia_data_pipeline_spark.operators.ranks import (
        ntile_by_cuts,
        track_persisted,
    )
    from wikipedia_data_pipeline_spark.sources.tables import load_table

    orders = load_table(spark, sf_dir, "orders")
    agg = orders.groupBy("o_custkey").agg(
        F.max(F.col("o_orderdate").cast("date")).alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        cents_sum("o_totalprice", "monetary"),
    )
    agg = track_persisted(agg.persist(StorageLevel.MEMORY_AND_DISK))
    seg = ntile_by_cuts(
        agg,
        [("last_order", "desc"), ("o_custkey", "asc")],
        4,
        "r_quartile",
    )
    seg = ntile_by_cuts(
        seg,
        [("frequency", "desc"), ("o_custkey", "asc")],
        4,
        "f_quartile",
    )
    seg = ntile_by_cuts(
        seg,
        [("monetary", "desc"), ("o_custkey", "asc")],
        4,
        "m_quartile",
    )
    return seg.select(
        "o_custkey", "last_order", "frequency", "monetary",
        "r_quartile", "f_quartile", "m_quartile",
    )


def _ntile_deciles_variant(spark, sf_dir):
    """ntile_by_cuts formulation of revenue_concentration_deciles —
    measured and REJECTED (100× probe: 1.71 s vs 0.87 s for the
    registered global_ntile form; same reasoning as
    _ntile_rfm_variant)."""
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from wikipedia_data_pipeline_spark.functions import UNIT, cents_units
    from wikipedia_data_pipeline_spark.operators.ranks import (
        ntile_by_cuts,
        track_persisted,
    )
    from wikipedia_data_pipeline_spark.sources.tables import load_table

    orders = load_table(spark, sf_dir, "orders")
    cust = orders.groupBy("o_custkey").agg(
        F.sum(cents_units("o_totalprice")).alias("rev_u")
    )
    cust = track_persisted(cust.persist(StorageLevel.MEMORY_AND_DISK))
    dec = ntile_by_cuts(
        cust, [("rev_u", "desc"), ("o_custkey", "asc")], 10, "decile"
    )
    total = dec.agg(F.sum("rev_u").alias("total_u"))
    return (
        dec.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("rev_u").alias("dec_u"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "decile",
            "n_customers",
            (F.col("dec_u").cast("double") / UNIT).alias("revenue_total"),
            (
                F.col("dec_u").cast("double")
                / F.col("total_u").cast("double")
            ).alias("revenue_share"),
        )
    )


def _ntile_gains_variant(spark, sf_dir):
    """ntile_by_cuts formulation of ml_eval_gains_table — measured and
    REJECTED (100× probe: 4.93 s vs 4.18 s for the registered
    global_ntile form — boundary selection re-scans the fact
    projection and still loses to the hierarchical rank pass)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from wikipedia_data_pipeline_spark.operators.ranks import ntile_by_cuts
    from wikipedia_data_pipeline_spark.operators.sampling import det_hash
    from wikipedia_data_pipeline_spark.sources.tables import load_table

    scored = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.col("value").alias("score"),
        (det_hash("user_id") % 2).cast("long").alias("label"),
    )
    deciled = ntile_by_cuts(
        scored, [("score", "desc"), ("event_id", "asc")], 10, "decile"
    )
    per = deciled.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("label").cast("long").alias("n_pos"),
    )
    tot = per.agg(F.sum("n").alias("nn"), F.sum("n_pos").alias("np"))
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
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


def _ntile_woe_variant(spark, sf_dir):
    """ntile_by_cuts formulation of features_woe_binning — measured
    and REJECTED (100× probe: 4.30 s vs 3.34 s for the registered
    global_ntile form; same reasoning as _ntile_gains_variant)."""
    from pyspark.sql import functions as F

    from wikipedia_data_pipeline_spark.operators.ranks import ntile_by_cuts
    from wikipedia_data_pipeline_spark.operators.sampling import det_hash
    from wikipedia_data_pipeline_spark.sources.tables import load_table

    scored = load_table(spark, sf_dir, "events").select(
        "event_id",
        "value",
        (det_hash("user_id") % 2).cast("long").alias("label"),
    )
    binned = ntile_by_cuts(
        scored, [("value", "asc"), ("event_id", "asc")], 10, "bin"
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


def _kmv_distinct_multipass_baseline(spark, sf_dir):
    """The pre-round-11 registered form of sketch_kmv_distinct_users:
    every exact-audit branch runs its own countDistinct / flags pass
    over the raw fact table (4 independent fact scans) instead of
    sharing one persisted distinct (type, user) pair relation. r9's
    sequential A/B kept this form (3.45 s vs 3.85 s); r10's sequential
    probe reversed it (3.08 s vs 1.98 s); the r11 INTERLEAVED
    same-process best-of-3 (AB_KMV_r11.json: 3.32 s vs 2.45 s)
    adjudicated the contradiction for the shared form, which is now
    registered. Kept so both sides of the measured decision stay
    probed (ntile_by_cuts discipline)."""
    from pyspark.sql import functions as F

    from wikipedia_data_pipeline_spark.operators import profiling as P
    from wikipedia_data_pipeline_spark.operators.ranks import track_persisted
    from wikipedia_data_pipeline_spark.operators.sampling import det_hash
    from wikipedia_data_pipeline_spark.queries.sketch_queries import _KMV_K
    from wikipedia_data_pipeline_spark.sources.tables import load_table

    K, MOD = _KMV_K, (1 << 31) - 1
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    hsh = ev.select("event_type", det_hash("user_id").alias("h"))
    sk = track_persisted(
        P.kmv_min_hashes(hsh, "event_type", "h", k=K).cache()
    )
    pertype = sk.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("cnt"), F.max("h").alias("hk")
    )
    exact_t = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact")
    )
    est = F.when(
        F.col("cnt") < K, F.col("cnt").cast("double")
    ).otherwise(F.lit((K - 1) * MOD) / F.col("hk"))
    t_rows = (
        pertype.join(exact_t, "event_type")
        .select(
            F.col("event_type").alias("segment"),
            "n_exact",
            est.alias("est_kmv"),
        )
    )
    usk = (
        sk.select("h").distinct().orderBy("h").limit(K)
        .agg(F.count(F.lit(1)).alias("cnt"), F.max("h").alias("hk"))
    )
    u_exact = ev.agg(F.countDistinct("user_id").alias("n_exact"))
    u_row = (
        usk.crossJoin(F.broadcast(u_exact))
        .select(
            F.lit("__union_all__").alias("segment"),
            "n_exact",
            est.alias("est_kmv"),
        )
    )

    def theta_of(t):
        return (
            sk.filter(F.col("event_type") == t)
            .agg(
                F.when(F.count(F.lit(1)) >= K, F.max("h"))
                .otherwise(F.lit(MOD))
                .alias("th")
            )
        )

    th = (
        theta_of("view")
        .crossJoin(theta_of("click").withColumnRenamed("th", "th2"))
        .select(F.least("th", "th2").alias("theta"))
    )
    va = sk.filter(F.col("event_type") == "view").select("h")
    cb = sk.filter(F.col("event_type") == "click").select("h")
    common = (
        va.join(cb, "h")
        .crossJoin(F.broadcast(th))
        .filter(F.col("h") < F.col("theta"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    i_exact = (
        ev.groupBy("user_id")
        .agg(
            F.max((F.col("event_type") == "view").cast("int")).alias("v"),
            F.max((F.col("event_type") == "click").cast("int")).alias("c"),
        )
        .filter((F.col("v") == 1) & (F.col("c") == 1))
        .agg(F.count(F.lit(1)).alias("n_exact"))
    )
    i_row = (
        common.crossJoin(F.broadcast(th))
        .crossJoin(F.broadcast(i_exact))
        .select(
            F.lit("__intersect_view_click__").alias("segment"),
            "n_exact",
            (
                F.col("c").cast("double") * F.lit(MOD) / F.col("theta")
            ).alias("est_kmv"),
        )
    )
    donly = (
        va.join(cb, "h", "left_anti")
        .crossJoin(F.broadcast(th))
        .filter(F.col("h") < F.col("theta"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    d_exact = (
        ev.groupBy("user_id")
        .agg(
            F.max((F.col("event_type") == "view").cast("int")).alias("v"),
            F.max((F.col("event_type") == "click").cast("int")).alias("c"),
        )
        .filter((F.col("v") == 1) & (F.col("c") == 0))
        .agg(F.count(F.lit(1)).alias("n_exact"))
    )
    d_row = (
        donly.crossJoin(F.broadcast(th))
        .crossJoin(F.broadcast(d_exact))
        .select(
            F.lit("__view_minus_click__").alias("segment"),
            "n_exact",
            (
                F.col("c").cast("double") * F.lit(MOD) / F.col("theta")
            ).alias("est_kmv"),
        )
    )
    return (
        t_rows.unionByName(u_row).unionByName(i_row).unionByName(d_row)
    )


def _trunc_recall_twopass_baseline(spark, sf_dir):
    """Pre-session-4 formulation of ann_dim_truncation_recall: TWO
    passes over the query x corpus pairs (full-dim ranking branch +
    per-dim sliced-cosine branch) joined on (query_id, vec_id). Kept
    as the A/B baseline for the one-pass prefix-dot rewrite."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from wikipedia_data_pipeline_spark.functions import cosine_similarity
    from wikipedia_data_pipeline_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id").isin([0, 1, 2, 3, 4])).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    pairs = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
    )
    w_full = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("vec_id")
    )
    full_rank = (
        pairs.select(
            "query_id",
            "vec_id",
            cosine_similarity(F.col("q_emb"), F.col("embedding")).alias("cos"),
        )
        .withColumn("rnk", F.row_number().over(w_full).cast("long"))
        .filter(F.col("rnk") <= 10)
        .select("query_id", "vec_id")
    )
    dims = spark.range(1).select(
        F.explode(F.array(F.lit(64), F.lit(32), F.lit(16))).alias("dim_kept")
    )
    w_trunc = Window.partitionBy("dim_kept", "query_id").orderBy(
        F.desc("cos"), F.asc("vec_id")
    )
    trunc_rank = (
        pairs.crossJoin(F.broadcast(dims))
        .select(
            "dim_kept",
            "query_id",
            "vec_id",
            cosine_similarity(
                F.expr("slice(q_emb, 1, dim_kept)"),
                F.expr("slice(embedding, 1, dim_kept)"),
            ).alias("cos"),
        )
        .withColumn("rnk", F.row_number().over(w_trunc).cast("long"))
        .filter(F.col("rnk") <= 10)
        .select("dim_kept", "query_id", "vec_id")
    )
    return (
        trunc_rank.join(full_rank, ["query_id", "vec_id"])
        .groupBy("dim_kept", "query_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_overlap"),
            (F.count(F.lit(1)).cast("double") / F.lit(10)).alias(
                "recall_at_10"
            ),
        )
        .orderBy("dim_kept", "query_id")
    )


# A/B twins: timed like PROBE entries, no DuckDB twin of their own
# (their output IS the registered query's — identical oracle). The
# __window_baseline rows are the REPLACED formulations (selection won);
# the __ntile_by_cuts_variant rows are REJECTED candidates (ranking
# won) — kept so both sides of each measured decision stay probed.
BASELINES = {
    "ann_dim_truncation_recall__twopass_baseline": _trunc_recall_twopass_baseline,
    "events_quantile_table__window_baseline": _win_quantile_table,
    "events_winsorized__window_baseline": _win_winsorized,
    "events_mad_outliers__window_baseline": _win_mad_outliers,
    "sketch_kmv_distinct_users__multipass_baseline": _kmv_distinct_multipass_baseline,
    "customer_rfm_segments__ntile_by_cuts_variant": _ntile_rfm_variant,
    "revenue_concentration_deciles__ntile_by_cuts_variant": _ntile_deciles_variant,
    "ml_eval_gains_table__ntile_by_cuts_variant": _ntile_gains_variant,
    "features_woe_binning__ntile_by_cuts_variant": _ntile_woe_variant,
}


def skew_join_ab(spark, dir100):
    """Adversarial skew shape (r9 verdict #6): a shuffle join on a
    deliberately Zipfian key — 90% of the 10M-row fact collapses onto
    ONE key, the rest spread over ~1M tail keys — against a ~1M-row
    dim NOT eligible for broadcast (autoBroadcastJoinThreshold=-1 for
    the section, the honest stand-in for a dim too big to ship at
    100 TB). Three variants, best-of-2 warm:

      * aqe_skew_off  — plain sort-merge join, AQE skew split disabled:
        the hot key's ~9M rows land in ONE task (the straggler bar).
      * aqe_skew_on   — AQE skewJoin enabled (thresholds lowered to
        engage on this replica's ~150 MB hot partition; at real 100 TB
        scale the DEFAULT 256 MB threshold fires on its own): Spark
        splits the skewed partition at runtime. Plan evidence captured:
        the final adaptive plan must contain 'skew=true'.
      * salted_32     — operators.skew.salted_join with 32 salts: the
        engine-level mitigation for the cases AQE can't fix (both
        sides skewed, or non-SMJ shapes).

    All three must agree on (row count, exact grouped sum) — asserted,
    not assumed. Returns the timing/evidence dict for the artifact."""
    from pyspark.sql import functions as F

    from wikipedia_data_pipeline_spark.operators.skew import salted_join

    ev = spark.read.parquet(os.path.join(dir100, "events.parquet"))
    big = ev.select(
        F.when(F.col("event_id") % 10 < 9, F.lit(0))
        .otherwise(F.col("event_id"))
        .alias("k"),
        (F.col("value") * 100).cast("long").alias("v_c"),
    )
    # The dim is persisted ROUND-ROBIN on purpose: deriving it with
    # distinct() leaves the cached relation hash-partitioned on the
    # join key, ensureRequirements then skips the dim-side exchange,
    # and OptimizeSkewedJoin CANNOT fire — it requires shuffle stages
    # on BOTH sides (found the hard way in this probe's first run; a
    # real dim loaded from storage has no such co-partitioning). That
    # planner interaction is itself a scale lesson: a cached relation
    # that "helpfully" satisfies the join distribution disables the
    # runtime skew mitigation.
    dim = (
        big.select("k")
        .distinct()
        .select(F.col("k").alias("dk"), (F.pmod(F.xxhash64("k"), F.lit(97))).alias("w"))
        .repartition(32)
    )
    dim.persist()
    dim.count()

    def joined(b):
        j = b.join(dim, b["k"] == dim["dk"])
        return j.groupBy().agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("v_c") * F.col("w")).alias("s"),
        )

    def salted():
        j = salted_join(big, dim, "k", "dk", num_salts=32)
        return j.groupBy().agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("v_c") * F.col("w")).alias("s"),
        )

    conf = spark.conf
    saved = {
        "spark.sql.autoBroadcastJoinThreshold": conf.get(
            "spark.sql.autoBroadcastJoinThreshold"
        ),
        "spark.sql.adaptive.skewJoin.enabled": conf.get(
            "spark.sql.adaptive.skewJoin.enabled"
        ),
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": conf.get(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
        ),
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": conf.get(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes"
        ),
    }
    results = {}
    checks = {}

    def run(name, fn):
        best, row = float("inf"), None
        for _ in range(2):
            df = fn()
            t0 = time.perf_counter()
            row = df.collect()[0]
            best = min(best, time.perf_counter() - t0)
            plan = df._jdf.queryExecution().executedPlan().toString()
        results[name] = round(best, 2)
        checks[name] = (row["n"], row["s"])
        return plan

    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        run("aqe_skew_off", lambda: joined(big))

        conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            str(8 * 1024 * 1024),
        )
        conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            str(4 * 1024 * 1024),
        )
        plan_on = run("aqe_skew_on", lambda: joined(big))
        skew_engaged = "skew=true" in plan_on

        conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        run("salted_32", salted)

        # --- cache-suppressed rows (r11 verdict #8): the dim cached
        # HASH-PARTITIONED ON THE JOIN KEY — ensureRequirements reuses
        # the cache's partitioning, the dim-side shuffle stage
        # disappears, and OptimizeSkewedJoin cannot fire even with
        # skewJoin enabled (it requires shuffle stages on BOTH sides).
        # This is the measured case that justifies salted_join's
        # existence: the salt changes the join key to (k, salt), which
        # the cache partitioning does NOT satisfy, so both sides
        # exchange again and the hot key spreads over 32 tasks.
        dim_cp = (
            big.select("k")
            .distinct()
            .select(
                F.col("k").alias("dk"),
                (F.pmod(F.xxhash64("k"), F.lit(97))).alias("w"),
            )
        )
        dim_cp.persist()
        dim_cp.count()

        def joined_cp():
            j = big.join(dim_cp, big["k"] == dim_cp["dk"])
            return j.groupBy().agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("v_c") * F.col("w")).alias("s"),
            )

        def salted_cp():
            j = salted_join(big, dim_cp, "k", "dk", num_salts=32)
            return j.groupBy().agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("v_c") * F.col("w")).alias("s"),
            )

        try:
            conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
            plan_cp = run("aqe_on_cache_suppressed", joined_cp)
            skew_engaged_cp = "skew=true" in plan_cp
            run("salted_32_cache_suppressed", salted_cp)
        finally:
            dim_cp.unpersist()
    finally:
        for k_, v_ in saved.items():
            conf.set(k_, v_)
        dim.unpersist()

    assert len(set(checks.values())) == 1, f"variant results differ: {checks}"
    return {
        "shape": (
            "10M-row fact, 90% of rows on ONE key, ~1M tail keys; "
            "~1M-row dim persisted round-robin (the shape where AQE "
            "skew split CAN fire), broadcast disabled; exact "
            "grouped-sum checksum identical across variants. The "
            "*_cache_suppressed rows re-run the join with the dim "
            "cached hash-partitioned ON the key — the dim-side "
            "exchange disappears, AQE skew split cannot fire, and "
            "salting is the only mitigation left (the decision rule "
            "documented in operators/skew.py)"
        ),
        "times_sec": results,
        "aqe_skew_split_engaged": skew_engaged,
        "aqe_skew_split_engaged_cache_suppressed": skew_engaged_cp,
        "checksum": list(checks.values())[0],
    }


def bucketed_join_ab(spark, dir100):
    """Bucketed-layout A/B (the shuffle-free fact-fact join path the
    100 TB design leans on): lineitem ⋈ orders on orderkey → per-
    priority revenue rollup, timed (a) over plain parquet — both sides
    exchange — and (b) over the same data written bucketed+sorted by
    the join key, where the scan's reported partitioning lets the
    planner drop BOTH exchanges (and sorts). The one-time bucketed
    write is priced too: that is the real trade — pay the shuffle at
    write time once instead of at every query. Plan evidence: exchange
    counts captured from the executed plans; results checksum-asserted
    identical."""
    from pyspark.sql import functions as F

    from wikipedia_data_pipeline_spark.sources.bucketing import (
        drop_table,
        write_bucketed,
    )

    li = spark.read.parquet(os.path.join(dir100, "lineitem.parquet"))
    o = spark.read.parquet(os.path.join(dir100, "orders.parquet"))

    def q(li_rel, o_rel):
        j = li_rel.join(o_rel, li_rel["l_orderkey"] == o_rel["o_orderkey"])
        return j.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    * 1_000_000
                ).cast("long")
            ).alias("rev_u"),
        )

    def run(mk):
        # rebuild the DataFrame per iteration: re-collecting one DF
        # object reuses its already-materialized AQE query stages and
        # times ~0 (bit us on this probe's first run)
        best, rows, df = float("inf"), None, None
        for _ in range(2):
            df = mk()
            t0 = time.perf_counter()
            rows = sorted(tuple(r) for r in df.collect())
            best = min(best, time.perf_counter() - t0)
        plan = df._jdf.queryExecution().executedPlan().toString()
        plan = plan.split("== Initial Plan ==")[0]
        return round(best, 2), rows, plan.count("Exchange ")

    # force the SMJ path on both variants so the A/B isolates the
    # exchanges (orders at 100x exceeds the broadcast threshold anyway)
    conf = spark.conf
    saved = conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plain_t, plain_rows, plain_ex = run(lambda: q(li, o))

        t0 = time.perf_counter()
        write_bucketed(li.select("l_orderkey", "l_extendedprice", "l_discount"),
                       "wdp_probe_li_b", ["l_orderkey"], 32,
                       sort_cols=["l_orderkey"])
        write_bucketed(o.select("o_orderkey", "o_orderpriority"),
                       "wdp_probe_o_b", ["o_orderkey"], 32,
                       sort_cols=["o_orderkey"])
        write_t = round(time.perf_counter() - t0, 2)

        lib = spark.table("wdp_probe_li_b")
        ob = spark.table("wdp_probe_o_b")
        buck_t, buck_rows, buck_ex = run(lambda: q(lib, ob))
    finally:
        conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
        drop_table(spark, "wdp_probe_li_b")
        drop_table(spark, "wdp_probe_o_b")

    assert plain_rows == buck_rows, "bucketed join changed the result"
    return {
        "shape": ("60M-row lineitem x 15M-row orders SMJ + rollup at the "
                  "100x replica; bucketed = both sides bucketBy(32, "
                  "orderkey) sortBy(orderkey), exchanges elided at scan"),
        "plain_join_sec": plain_t,
        "bucketed_join_sec": buck_t,
        "one_time_bucketed_write_sec": write_t,
        "exchanges_plain": plain_ex,
        "exchanges_bucketed": buck_ex,
    }


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "SCALE_PROBE_r09.json"
    # restrict to a comma-separated subset (resume after an aborted run;
    # results are merged into out_path if it already exists)
    only = os.environ.get("SPARK_GRAFT_PROBE_ONLY")
    probe = [n for n in PROBE if n in set(only.split(","))] if only else PROBE
    baselines = (
        {k: v for k, v in BASELINES.items() if k in set(only.split(","))}
        if only
        else BASELINES
    )

    from pyspark.sql import SparkSession

    from tools.make_benchdata import ensure
    from wikipedia_data_pipeline_spark import registry
    from wikipedia_data_pipeline_spark.operators import ranks

    dir100 = ensure(
        SRC_SF,
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "benchdata", "sf10r"),
        100,
    )
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("scale-probe-100x")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(32 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    queries = registry.spark_queries()
    oracles = registry.oracle_queries()

    # Global warmup: the first measured query otherwise pays JVM/codegen
    # warmup AND the cold page-cache read of the whole 1.7 GB replica
    # (observed: q1 at 18 s cold vs 6 s warm). One full-table count per
    # fact table touches every page; one q1 pass warms codegen.
    for t in ("lineitem", "orders", "events", "documents"):
        spark.read.parquet(os.path.join(dir100, f"{t}.parquet")).count()
    queries["q1_pricing_summary"](spark, dir100).write.format("noop").mode(
        "overwrite"
    ).save()

    spark_t: dict[str, float] = {}
    duck_t: dict = {}

    eager = registry.eager_queries()

    def time_spark(fn, name=None):
        """Best-of-3 noop-write time. EAGER queries run their jobs at
        CONSTRUCTION, so for those the timer starts before fn() — the
        lazy default keeps construction (plan building, ms) outside
        the window to stay comparable with prior rounds' artifacts."""
        best = float("inf")
        for _ in range(3):
            if name in eager:
                t0 = time.perf_counter()
                df = fn(spark, dir100)
            else:
                df = fn(spark, dir100)
                t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            ranks.unpersist_all()
        return round(best, 2)

    # merge-resume: carry prior results for names not re-probed, and
    # any extra top-level sections (manual A/B notes) verbatim
    prior = {}
    if os.path.exists(out_path):
        with open(out_path) as fh:
            prior = json.load(fh)
        if only:  # resume: carry prior timings for names not re-probed
            spark_t.update(prior.get("queries", {}))
            duck_t.update(prior.get("duckdb", {}))

    for name in probe:
        spark_t[name] = time_spark(queries[name], name)
        print(f"spark  {name}: {spark_t[name]}s", flush=True)
        if name in oracles and name not in DUCK_SKIP:
            duck_t[name] = duck_time(oracles[name], dir100)
            print(f"duckdb {name}: {duck_t[name]}", flush=True)
    for name, fn in baselines.items():
        spark_t[name] = time_spark(fn)
        print(f"spark  {name}: {spark_t[name]}s", flush=True)

    # floor-adjusted ratios for the worst sub-3s rows (r12 verdict #6);
    # resumable by name like the A/B sections
    floor_section = prior.get("floor_adjusted")
    if (not only) or ("floor_adjusted" in set(only.split(","))):
        floor_section = {}
        for name in FLOOR_ROWS:
            s100 = spark_t.get(name)
            d100 = duck_t.get(name)
            if not isinstance(s100, (int, float)):
                continue
            fs = float("inf")
            for _ in range(3):
                df = queries[name](spark, FLOOR_SF)
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                fs = min(fs, time.perf_counter() - t0)
                ranks.unpersist_all()
            row = {"spark_100x": s100, "spark_floor": round(fs, 2),
                   "spark_adj": round(max(s100 - fs, 0.0), 2)}
            if isinstance(d100, (int, float)):
                fd = duck_time(oracles[name], FLOOR_SF)
                if isinstance(fd, float):
                    row["duck_100x"] = d100
                    row["duck_floor"] = fd
                    row["duck_adj"] = round(max(d100 - fd, 1e-4), 4)
                    # A ratio of two near-zero residuals is noise/noise:
                    # when either engine's data-dependent cost is inside
                    # measurement jitter the row is adjudicated
                    # floor-bound, not given a fake ratio.
                    if row["spark_adj"] < 0.5:
                        row["verdict"] = "floor_bound_spark"
                    elif row["duck_adj"] < 0.03:
                        row["verdict"] = "duck_floor_bound_no_ratio"
                    else:
                        row["adjusted_ratio"] = round(
                            row["spark_adj"] / row["duck_adj"], 2
                        )
                        row["verdict"] = (
                            "plan_bound" if row["adjusted_ratio"] > 2
                            else "within_2x_adjusted"
                        )
            floor_section[name] = row
            print(f"floor  {name}: {row}", flush=True)

    # adversarial skew-join A/B (r9 verdict #6); resumable by name
    skew_section = prior.get("skew_join_ab")
    if (not only) or ("skew_join_ab" in set(only.split(","))):
        skew_section = skew_join_ab(spark, dir100)
        print(f"skew_join_ab: {skew_section['times_sec']} "
              f"(AQE split engaged: {skew_section['aqe_skew_split_engaged']})",
              flush=True)

    # bucketed-layout fact-fact join A/B (r10); resumable by name
    bucket_section = prior.get("bucketed_join_ab")
    if (not only) or ("bucketed_join_ab" in set(only.split(","))):
        bucket_section = bucketed_join_ab(spark, dir100)
        print(f"bucketed_join_ab: {bucket_section}", flush=True)

    ratios = {
        n: round(spark_t[n] / duck_t[n], 2)
        for n in duck_t
        if isinstance(duck_t[n], float) and duck_t[n] > 0
    }
    out = {
        "metric": "scale_probe_100x_with_duckdb_twins",
        "unit": "sec",
        "dir": "100x replica of /root/testdata/sf0.1 "
               "(~sf10 facts: 60M lineitem, 10M events, 50k docs x100)",
        "queries": spark_t,
        "duckdb": duck_t,
        "ratio_per_query": ratios,
        "notes": (
            "best-of-3 warm Spark times on local[%s]; DuckDB twin = the "
            "gate-proven oracle SQL, best-of-2, %ss total budget. "
            "q1_pricing_summary_cents is the BIGINT-cents A/B of the "
            "DECIMAL q1 (dec_over_cents = %s). q3/q5 run BIGINT-cents "
            "revenue as of round 9. *__window_baseline entries are the "
            "round-8 per-type-window formulations of the three quantile "
            "consumers, timed as A/B against the round-9 grouped exact "
            "selection. *__ntile_by_cuts_variant entries are the "
            "REJECTED round-9 boundary-selection rewrites of the four "
            "global_ntile consumers (measured slower at this scale; "
            "registered queries keep the hierarchical rank form)."
            % (
                cpus,
                int(DUCK_BUDGET_S),
                round(
                    spark_t["q1_pricing_summary"]
                    / spark_t["q1_pricing_summary_cents"],
                    2,
                )
                if spark_t.get("q1_pricing_summary_cents")
                else "n/a",
            )
        ),
    }
    if floor_section is not None:
        out["floor_adjusted"] = floor_section
    if skew_section is not None:
        out["skew_join_ab"] = skew_section
    if bucket_section is not None:
        out["bucketed_join_ab"] = bucket_section
    for k, v in prior.items():
        out.setdefault(k, v)
    with open(out_path, "w") as fh:
        fh.write(json.dumps(out, indent=1))
    print(json.dumps({k: out[k] for k in ("queries", "ratio_per_query")}))
    spark.stop()


if __name__ == "__main__":
    main()
