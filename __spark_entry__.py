"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (smoke, sf0.001, rows > 0).
``queries()`` — one entry per implemented operator (SURVEY.md §2).
``oracle_sql()`` — matching DuckDB ANSI-SQL per query (correctness gate).

Query registration lives in ``wikipedia_data_pipeline_spark.registry`` so
the engine package is the single source of truth; this module stays a
thin adapter for the driver.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from wikipedia_data_pipeline_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the TF-IDF pipeline on /root/testdata/sf0.001 documents.

    Exercises scan → project → explode → agg → window top-k → broadcast
    join → scalar math in one lazy plan (SURVEY.md §7 step 1).
    """
    return registry.flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.spark_queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_queries()
