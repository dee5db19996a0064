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
# the exported order is: (1) a PINNED set that keeps driver evidence
# every round; (2) a per-round ROTATION that cycles the remaining slots
# through the least-recently-driver-verified oracle families, so
# independent verification sweeps the whole registry over rounds instead
# of re-checking the same prefix; (3) every other oracle-bearing query
# in registration order; (4) the no-oracle approximate/streaming-only
# entries (rows-only checks) at the very end.
#
# ROUND 13: the r12 verdict's #2 directive is to spend the whole window
# on the 155 oracle-bearing keys that have never appeared in a driver
# window (277/432 ever-green; backlog grew while the registry did).
# The pinned set is therefore cut to the two flagship reference-surface
# keys for this round — the usual pinned members (event-time family,
# TF-IDF stages) all have multi-round driver evidence (r1–r12 green)
# and rotate back in once the backlog drains.
_PINNED = [
    "tfidf_full",
    "task1_dictionary",
]

# Round-13 rotation: 48 slots, ALL first-time driver keys, drawn from
# the 155-key never-driver-verified backlog (r12 verdict #2: "point the
# r13 window's ~50 slots entirely at least-recently-verified keys").
# Selection: the two bucketed twins the r12 comment promised for r13,
# then the oldest untouched cohorts in age order — the early relational
# /window/dedup tail, the r5s3 sequence/events block, the early text-
# corpus block, and the r5s3 finance block (the largest untouched block
# per the r12 verdict). The remaining ~107 backlog keys (the r12 stats
# battery, mleval tail, graph/privacy/spatial, remaining text) queue
# for the r14–r15 rotations. The r12 rotation went driver-green in
# CORRECTNESS_r12 (50/50, 28 first-time) and rotates out with that
# evidence. Driver-ever before this round: 277/432 oracle keys.
_ROTATION = [
    # bucketed twins of driver-green queries (deferred from r12)
    "asof_join_last_view_bucketed",
    "sessionization_bucketed",
    # oldest never-verified relational / window / dedup tail
    "sql_interface_top_nations",
    "task1_probe_reference",
    "cohort_value_curves",
    "profiling_fd_violations",
    "key_skew_events",
    "window_rank_variants",
    "window_value_picks",
    "join_salted_user_enrich",
    "semantics_null_suite",
    "order_by_nulls_placement",
    "dedup_containment",
    "dedup_doc_continuation",
    # r5s3 sequence/events block
    "events_latest_per_key",
    "incremental_mv_orders",
    "events_multi_touch_attribution",
    "events_rolling_active_users",
    "events_peak_event_per_user",
    "events_path_signatures",
    "lineitem_point_in_time_join",
    "events_burst_users",
    "orders_integrity_checksum",
    "events_ewma_value",
    "orders_dow_seasonality",
    "lateral_top_orders_per_customer",
    # early text-corpus block
    "text_tokenizer_fertility",
    "heavy_hitter_tokens",
    "text_trigram_commonness",
    "text_chunk_documents",
    "text_word_cooccurrence",
    "text_unigram_surprisal",
    "text_infer_stopwords",
    "text_readability_scores",
    # r5s3 finance block (largest untouched block, r12 verdict)
    "orders_priority_transitions",
    "order_ship_delay_histogram",
    "revenue_mom_change",
    "part_brand_return_rates",
    "orders_open_backlog_daily",
    "events_cumulative_new_users",
    "events_time_weighted_avg",
    "lineitem_weighted_median_price",
    "nation_revenue_hhi",
    "orders_seasonal_decompose",
    "parts_xyz_variability",
    "orders_repeat_purchase_curve",
    "lineitem_price_dispersion",
    "customer_spend_trend",
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
        # round-12 session-6 ADDITIONS (not a split — textcorpus was
        # near the 2,000-line threshold, so the new lexical-diversity /
        # source-profile queries landed in their own module)
        textprofile_queries,
        sketch_queries,
        stats_queries,
        # round-9 split of stats_queries along screens-vs-tests lines;
        # round-11 split again along fixed-horizon-vs-drift/sequential
        statstests_queries,
        # round-13 split of statstests_queries at the 2,000-line
        # threshold: survival / stratified-contingency contrasts and
        # effect sizes moved out (keys and oracles unchanged)
        statscontrast_queries,
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
