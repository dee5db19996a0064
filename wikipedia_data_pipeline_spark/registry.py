"""Query registry: every implemented operator as a (Spark callable,
DuckDB oracle SQL) pair, keyed by name — the source of truth behind
``__spark_entry__.queries()`` / ``oracle_sql()``.

Conventions (driver compare is row-count + schema + order-insensitive
value hash):
  * every computed column is aliased identically in Spark and SQL;
  * counts/ranks are BIGINT on both sides (Spark row_number is INT —
    cast it);
  * double aggregates that are sensitive to summation order are summed
    as DECIMAL and cast back to DOUBLE, so both engines produce
    bit-identical values regardless of parallel reduction order;
  * top-k queries carry a total (deterministic) sort order.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

Query = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, Query] = {}
_ORACLES: dict[str, str] = {}
_EAGER: set[str] = set()


def register(
    name: str, oracle: str | None = None, eager: bool = False
) -> Callable[[Query], Query]:
    """``eager=True`` marks a query whose CONSTRUCTION already runs
    Spark jobs (iterative fixpoints that must materialize per round,
    demo round-trips that write artifacts). Correctness gates treat
    them like any other query; bench/tooling must exclude them
    mechanically via ``eager_queries()`` — timing an eager query's
    final action measures only the tail of its work."""

    def deco(fn: Query) -> Query:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        if eager:
            _EAGER.add(name)
        return fn

    return deco


# The driver's correctness gate walks a bounded prefix (~50 entries) of
# queries(). Those slots are only useful for oracle-checkable queries, so
# the exported order is: (1) a PINNED set — the reference surface
# (TF-IDF / Task 1) plus the event-time family that broke in round 4,
# which keep driver evidence every round; (2) a per-round ROTATION that
# cycles the remaining ~35 slots through the least-recently-driver-
# verified oracle families, so independent verification sweeps the whole
# registry over rounds instead of re-checking the same prefix; (3) every
# other oracle-bearing query in registration order; (4) the no-oracle
# approximate/streaming-only entries (rows-only checks) at the very end.
_PINNED = [
    # event-time family (r4 breakage — keeps hard driver evidence)
    "events_funnel",
    "window_lag_lead",
    "window_running_sum",
    "asof_join_last_view",
    "sessionization",
    "streaming_static_enrich",
    # reference surface: the TF-IDF / Task 1 pipeline itself
    "doc_tokens",
    "doc_term_counts",
    "doc_tf",
    "idf",
    "tfidf_full",
    "task1_dictionary",
    "task1_probe",
    "corpus_doc_count",
    "dedup_exact",
]

# Round-12 rotation. Priority order inside the ~35 slots: (1) every
# query whose CODE changed this round — the six ordered_scan prefix-sum
# rewrites (r11 verdict #1), the BLEU/ROUGE gram fingerprinting, the
# fused Spearman flip, and the half-pair recs coverage — the driver
# must re-verify changed code; (2) the round's NEW queries (first-time
# evidence); (3) the oldest never-driver-verified backlog (the rest of
# the r5s3 finance/sequence block rotates in r13). The r11 rotation
# went driver-green in CORRECTNESS_r11 (50/50) and rotates out with
# that evidence. Driver-ever before this round: 249/366 oracle keys.
_ROTATION = [
    # changed this round — ordered_scan rewrite of the prefix sums
    "ml_eval_auc_delong_ci",
    "events_ks_test_ab",
    "events_mannwhitney_ab",
    "stats_cliffs_delta",
    "stats_logrank_test",
    "orders_survival_curve",
    # changed this round — session 2 perf rewrites (same oracles)
    "ml_eval_bleu_corpus",
    "ml_eval_rouge_n",
    "ml_eval_spearman_rho",
    "recs_catalog_coverage",
    # judge-verified r11 but never in a driver window
    "q3_bucketed_colocated",
    # new this round — first-time driver evidence. 29 queries were
    # added across the four r12 sessions; 24 fit the remaining slots.
    # Deferred to the r13 rotation (each a small variant of machinery
    # that is ALREADY driver-green, with its own sf0.01 gate + pytest
    # replication this round): sessionization_bucketed,
    # asof_join_last_view_bucketed (plan-asserted twins of driver-green
    # queries), stats_effect_size_panel, sample_mixture_temperature
    # (siblings of driver-green stats/token-mixture),
    # ml_eval_regression_panel, and dedup_doc_continuation (heaviest
    # novelty, 10 s at the 100x probe — gate + pytest cover it) — plus
    # the late-session-4 additions stats_page_trend,
    # stats_ansari_bradley, and stats_hodges_lehmann (each gated at
    # two SFs + brute-force-replicated), the 20 session-5 additions
    # (stats_kendall_w, stats_cvm_2s, stats_kuiper_hod_uniformity,
    # stats_bartlett_test, stats_hill_tail_index,
    # ml_eval_weighted_kappa, ml_eval_macro_f1, ml_eval_mcc_multiclass,
    # ml_eval_rbo_rankings, ml_eval_wer, sample_split_ks_uniformity,
    # privacy_randomized_response, events_conditional_entropy,
    # events_mean_excess_pot, embedding_simplified_silhouette,
    # graph_degree_assortativity, market_basket_rules,
    # features_stump_information_gain, text_js_divergence_sources,
    # text_word_burstiness — each sf0.01-gated + brute-force-
    # replicated in test_round12s5*.py),
    # the r5s3 finance block, and the stats/graph/privacy
    # never-verified tail, which continue in r13. The 13 session-6
    # additions (text_good_turing_mass, text_log_odds_sources,
    # text_hellinger_sources, events_theil_inequality,
    # events_capture_recapture, orders_rmst, events_page_hinkley,
    # stats_grubbs_outlier, stats_jarque_bera,
    # stats_poisson_rate_ratio, ml_eval_spiegelhalter_z,
    # ml_eval_hosmer_lemeshow, ml_eval_cronbach_alpha, plus the later
    # session-6 additions stats_welch_ttest, stats_oneway_anova_f,
    # events_cramers_v_matrix, events_gpd_moment_fit,
    # stats_pacf_durbin_levinson, text_sttr_segments,
    # text_burrows_delta, privacy_dp_topk_words,
    # spatial_moran_i_events — each
    # sf0.001+sf0.01-gated and brute-force-replicated in
    # test_round12s6.py) also queue for the r13 rotation.
    "stats_kruskal_wallis",
    "stats_cochran_armitage_trend",
    "orders_nelson_aalen_hazard",
    "sample_neyman_allocation",
    "embedding_cosine_pair_histogram",
    "stats_kendall_tau_b",
    "stats_jonckheere_terpstra",
    "multimodal_image_luma_histogram",
    "privacy_dp_median_release",
    # new in session 3
    "text_ngram_novelty_rate",
    # new in session 4 — the nonparametric battery + extensions
    "stats_friedman_test",
    "stats_brown_forsythe",
    "stats_mood_median_test",
    "stats_wilcoxon_signed_rank",
    "stats_brunner_munzel",
    "stats_runs_test",
    "stats_ljung_box",
    "stats_durbin_watson",
    "stats_anderson_darling_2s",
    "events_hurst_rs",
    "sample_horvitz_thompson_counts",
    "dedup_connected_components",
    "ml_eval_chrf",
    "incremental_distinct_users_kmv",
]


def _ordered_names() -> list[str]:
    head = [n for n in _PINNED + _ROTATION if n in _QUERIES]
    seen = set(head)
    rest = [n for n in _QUERIES if n in _ORACLES and n not in seen]
    no_oracle = [n for n in _QUERIES if n not in _ORACLES and n not in seen]
    return head + rest + no_oracle


def spark_queries() -> dict[str, Query]:
    _load_all()
    return {n: _QUERIES[n] for n in _ordered_names()}


def oracle_queries() -> dict[str, str]:
    _load_all()
    return {n: _ORACLES[n] for n in _ordered_names() if n in _ORACLES}


def eager_queries() -> set[str]:
    """Names whose query functions execute Spark jobs at build time —
    exclude from any timing set (see ``register(eager=...)``)."""
    _load_all()
    return set(_EAGER)


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    _load_all()
    return _QUERIES["tfidf_full"](spark, sf_dir)


_LOADED = False


def _load_all() -> None:
    """Import all query-definition modules (idempotent).

    Import order IS registration order IS the order the driver's
    correctness gate walks ``queries()`` (it checks a bounded prefix of
    ~50 registrations).  The reference surface (TF-IDF / Task 1,
    SURVEY.md §2.1–2.5) and the LLM-pipeline extensions (text, dedup,
    similarity, multimodal/UDF, streaming) therefore register FIRST;
    the commodity relational/advanced suites — all driver-verified
    green in round 1 — fill the tail.
    """
    global _LOADED
    if _LOADED:
        return
    from wikipedia_data_pipeline_spark.queries import (  # noqa: F401
        tfidf_queries,
        text_queries,
        dedup_queries,
        similarity_queries,
        multimodal_queries,
        sampling_queries,
        streaming_queries,
        relational_queries,
        advanced_queries,
        tpch_queries,
        analytics_queries,
        profiling_queries,
        # round-12 split of profiling_queries: operational event
        # analytics / incremental maintenance moved out before the
        # 2,000-line threshold (keys and oracles unchanged)
        opsevents_queries,
        timeseries_queries,
        sequence_queries,
        # round-7 split of the former 8.4k-line profiling grab-bag
        # along SURVEY family lines (registration order after the
        # driver prefix is cosmetic — the ~50-slot window is addressed
        # by NAME via _PINNED/_ROTATION):
        textcorpus_queries,
        # round-12 split of textcorpus_queries: retrieval/search +
        # curation-mixing moved out before the 2,000-line threshold
        textsearch_queries,
        # round-12 session-6 split of textcorpus_queries: lexical-
        # diversity / source-profile statistics moved out before the
        # 2,000-line threshold (keys and oracles unchanged)
        textprofile_queries,
        sketch_queries,
        stats_queries,
        # round-9 split of stats_queries along screens-vs-tests lines;
        # round-11 split again along fixed-horizon-vs-drift/sequential
        statstests_queries,
        statsdrift_queries,
        # round-12: rank-based / ordered-category tests (new module —
        # statstests sits against the 2,000-line split threshold)
        statsrank_queries,
        # round-12 session 4: nonparametric location/dispersion tests
        # and regression-residual diagnostics
        statsnonparam_queries,
        # round-12 session-6 split of statsnonparam_queries: hourly-
        # series diagnostics (runs/Ljung-Box/Durbin-Watson) moved out
        # past the 2,000-line threshold (keys and oracles unchanged)
        statsseries_queries,
        # round-12 session 6: parametric moment-based tests (Grubbs,
        # Jarque-Bera, Poisson rate ratio) — statstests/statsnonparam
        # both sit against the 2,000-line split threshold
        statsparam_queries,
        mleval_queries,
        # round-10 split of mleval_queries along family lines
        features_queries,
        embedding_queries,
        mleval_paired_queries,
        # round-12 session 6: calibration tests + rater reliability
        # (mleval_queries / mleval_paired_queries both near threshold)
        mleval_reliability_queries,
        # round-11 session-2 split: generation metrics (BLEU/ROUGE)
        generation_queries,
        finance_queries,
        graph_queries,
        privacy_queries,
        spatial_queries,
    )

    _LOADED = True
