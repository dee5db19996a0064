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


def register(name: str, oracle: str | None = None) -> Callable[[Query], Query]:
    def deco(fn: Query) -> Query:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


# The driver's correctness gate walks a bounded prefix (~50 entries) of
# queries(). Those slots are only useful for oracle-checkable queries, so
# the exported order is: (1) a promoted set — the event-time family that
# broke in round 4 and now needs hard driver evidence; (2) every other
# oracle-bearing query in registration order (reference surface first);
# (3) the no-oracle approximate/streaming-only entries, which the driver
# can only rows-check anyway, at the very end.
_WINDOW_PROMOTED = [
    "events_funnel",
    "window_lag_lead",
    "window_running_sum",
    "asof_join_last_view",
    "sessionization",
    "streaming_static_enrich",
]


def _ordered_names() -> list[str]:
    promoted = [n for n in _WINDOW_PROMOTED if n in _QUERIES]
    rest = [n for n in _QUERIES if n in _ORACLES and n not in _WINDOW_PROMOTED]
    no_oracle = [n for n in _QUERIES if n not in _ORACLES]
    return promoted + rest + no_oracle


def spark_queries() -> dict[str, Query]:
    _load_all()
    return {n: _QUERIES[n] for n in _ordered_names()}


def oracle_queries() -> dict[str, str]:
    _load_all()
    return {n: _ORACLES[n] for n in _ordered_names() if n in _ORACLES}


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
    )

    _LOADED = True
