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

# Round-9 rotation (the r7/r8 verdicts' #1 item, two rounds overdue):
# the never-driver-verified tail — (a) the TPC-H long tail (q4/q6/q10/
# q12/q13/q17-q22 have pytest + self-gate evidence but no driver row);
# (b) SQL-surface odds and ends (regex scalars, unpivot, CDC merge,
# recursive CTE); (c) the features/embedding QA family; (d) the
# textcorpus family; (e) the round-7 novelties (NDCG, WoE, changepoint,
# sketch-join-cardinality, MV join-pairs, Merkle); plus every query
# whose CODE PATH changes THIS round — q3/q5 (cents flip),
# q1_pricing_summary_cents (the perf-headline twin), and the three
# quantile consumers moving to grouped exact selection — so the driver
# re-verifies each touched path. The r7/r8 rotation (streaming family,
# r6s2 robust/rolling/sketch, events statistics tail, finance windows)
# went driver-green 50/50 in CORRECTNESS_r07 AND r08 and rotates back
# out with that double evidence.
_ROTATION = [
    # paths touched this round, in front of the driver
    "q3_shipping_priority",
    "q5_region_revenue",
    "q1_pricing_summary_cents",
    "events_quantile_table",
    "events_winsorized",
    "events_mad_outliers",
    # TPC-H tail: never driver-verified
    "q4_order_priority",
    "q6_forecast_revenue",
    "q10_returned_items",
    "q12_flag_priority_buckets",
    "q13_customer_distribution",
    "q17_small_quantity_revenue",
    "q18_large_orders",
    "q19_disjunctive_predicates",
    "q20_potential_promotion",
    "q21_waiting_supplier",
    "q22_idle_rich_customers",
    # SQL-surface tail
    "scalar_regex_funcs",
    "unpivot_part_measures",
    "cdc_apply_orders",
    "sql_recursive_chain",
    # features / embedding QA
    "features_hash_encoded",
    "features_target_encode_loo",
    "features_woe_binning",
    "embedding_centroid_distances",
    "embedding_label_outliers",
    "embedding_int8_quantize",
    # textcorpus family
    "text_collocations",
    "corpus_heaps_growth",
    "text_search_tfidf",
    # round-7 novelties
    "ml_eval_ndcg_events",
    "events_changepoint_value",
    "sketch_join_cardinality_events",
    "incremental_mv_join_pairs",
    "orders_merkle_segments",
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
        timeseries_queries,
        sequence_queries,
        # round-7 split of the former 8.4k-line profiling grab-bag
        # along SURVEY family lines (registration order after the
        # driver prefix is cosmetic — the ~50-slot window is addressed
        # by NAME via _PINNED/_ROTATION):
        textcorpus_queries,
        sketch_queries,
        stats_queries,
        # round-9 split of stats_queries along screens-vs-tests lines
        statstests_queries,
        mleval_queries,
        finance_queries,
        graph_queries,
        privacy_queries,
        spatial_queries,
    )

    _LOADED = True
