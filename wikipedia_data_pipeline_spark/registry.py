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

# Round-11 rotation. Front of the line: every query whose CODE changed
# this round — the KMV shared-distinct flip, the new bucketed-layout
# consumer, the new span extractor, BPE (newly exact-oracled), the
# three ADVICE fixes (integral div, TOST rescale, permutation obs
# guard — the latter two changed output schema/arithmetic), and the
# rewritten aHash path. Then the six round-10 cents-flip queries whose
# implementations changed AFTER the r10 window was set (never
# driver-re-verified post-flip), the remaining round-10 novelties
# (16/16 judge-sampled green but never driver-windowed), one streaming
# pin (stateful-path hygiene — static_enrich + sessionization ride
# _PINNED), and the never-verified ml-eval/UDF tail. The r10 rotation
# went driver-green in CORRECTNESS_r10 (50/50) and rotates out with
# that evidence. Driver-ever before this round: 220/341 oracle keys.
_ROTATION = [
    # changed this round — driver must re-verify each touched path
    "sketch_kmv_distinct_users",
    "q18_bucketed_colocated",
    "text_duplicate_spans_extract",
    "text_bpe_tokenize",
    "curation_token_mixture_epochs",
    "stats_tost_equivalence",
    "stats_permutation_test_ab",
    "multimodal_image_ahash_groups",
    # r10 cents flips: implementation changed after the r10 window
    "q18_large_orders",
    "agg_grouping_sets",
    "join_range_periods",
    "events_daily_gapfill",
    "events_daily_interpolate",
    "events_sliding_window",
    # remaining round-10 novelties: never driver-verified
    "embedding_hamming_topk",
    "multimodal_audio_vad_segments",
    "sample_gumbel_topk_docs",
    "text_yule_k_diversity",
    "curation_dsir_importance_weights",
    "ml_eval_average_precision",
    "ml_eval_pinball_loss",
    "ml_eval_isotonic_calibration",
    "ml_eval_mrr",
    "ml_eval_krippendorff_alpha",
    "ml_eval_cochran_q",
    "graph_sssp_3hop",
    # streaming pin (stateful-path hygiene)
    "streaming_stateful_user_stats",
    # session-2 paths whose CODE changed after the window was first
    # set (rewrites + fixes need driver re-verification before stable
    # never-verified keys, which rotate in r12): the BLEU/ROUGE
    # single-pass + UNK-fixture rewrite, the cross-source exact-first
    # collapse, the Spearman overflow fix, the new bucketed consumer,
    # and SAX as the session's fact-scale novelty
    "ml_eval_bleu_corpus",
    "ml_eval_rouge_n",
    "dedup_cross_source_matrix",
    "ml_eval_spearman_rho",
    "q5_bucketed_colocated",
    "events_sax_symbols",
    # never-verified UDF-surface tail (the ml-eval tail moved to r12)
    "udf_grouped_agg_median",
    "udf_arrow_long_words",
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
        # round-9 split of stats_queries along screens-vs-tests lines;
        # round-11 split again along fixed-horizon-vs-drift/sequential
        statstests_queries,
        statsdrift_queries,
        mleval_queries,
        # round-10 split of mleval_queries along family lines
        features_queries,
        embedding_queries,
        mleval_paired_queries,
        # round-11 session-2 split: generation metrics (BLEU/ROUGE)
        generation_queries,
        finance_queries,
        graph_queries,
        privacy_queries,
        spatial_queries,
    )

    _LOADED = True
