"""Shared column-expression helpers.

``dec_sum`` exists for cross-engine determinism: double summation is
order-dependent, and Spark's parallel partial aggregation will not sum
in the same order as a single-threaded oracle. Routing the sum through
DECIMAL makes it exact (associative), so the result is bit-identical no
matter the partitioning — which also means the answer is stable across
cluster sizes, a property worth having at 100 TB, not just for tests.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,6)"


def dec_sum(col: Column | str, alias: str) -> Column:
    """Order-independent SUM of a double column, returned as DOUBLE."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double").alias(alias)


def dec_avg(col: Column | str, alias: str) -> Column:
    """Order-independent AVG (decimal sum / count) as DOUBLE."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast(DEC)).cast("double") / F.count(c)).alias(alias)


def sql_dec_sum(expr: str, alias: str) -> str:
    """DuckDB twin of ``dec_sum``."""
    return f"CAST(sum(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE) AS {alias}"


def sql_dec_avg(expr: str, alias: str) -> str:
    """DuckDB twin of ``dec_avg``."""
    return (
        f"CAST(sum(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE)"
        f" / count({expr}) AS {alias}"
    )


def ts_us(col: str = "ts") -> Column:
    """events.ts in the engine's event-time domain: BIGINT µs since the
    epoch. ``sources.tables.load_table`` / ``streaming.pipeline.read_events_stream``
    normalize the parquet column (whatever its physical encoding — BIGINT
    ns, TIMESTAMP, TIMESTAMP_NTZ) to that domain at scan time, so this is
    a plain column reference. Kept as the single named accessor so the
    domain can move again without touching 17 call sites."""
    return F.col(col)


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<float|double> columns using
    higher-order functions — stays JVM-side, no UDF. Sequential left
    fold → deterministic, engine-independent result in double."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    dot = F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)
    na = F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    nb = F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    return dot / (F.sqrt(na) * F.sqrt(nb))
