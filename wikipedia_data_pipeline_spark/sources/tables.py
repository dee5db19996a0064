"""Parquet table catalog for the driver's synthetic star schema.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings — one parquet file per table under
``/root/testdata/sf{SF}/``. Scans are plain ``spark.read.parquet`` so
Catalyst gets predicate pushdown + column pruning for free; at cluster
scale the same calls point at partitioned/bucketed parquet layouts and
partition pruning kicks in with zero code change.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def sf_dir_from_env(default: str = DEFAULT_SF_DIR) -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", default)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    # Engine type policy (set at session build in session.get_spark):
    # TIMESTAMP(NANOS) parquet columns read as BIGINT nanoseconds
    # (events.ts is the one such column; Spark raises
    # PARQUET_TYPE_ILLEGAL otherwise). The driver brings its OWN
    # SparkSession, so ensure the policy holds here too — idempotent,
    # session-wide by design, not a per-table toggle.
    if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition a narrow input up to cluster parallelism before
    CPU-heavy per-row work (shingling, minhashing, tokenization).

    A small parquet file arrives as ONE input split (a row group cannot
    be subdivided), which serializes everything downstream on a single
    core no matter how wide the cluster is. The round-robin shuffle here
    is proportional to the raw input bytes — trivially cheap next to the
    per-row work it parallelizes. No-op when the scan already has enough
    splits (the 100 TB case, where inputs arrive thousands of splits
    wide).
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def load_tables(
    spark: SparkSession, sf_dir: str, register_views: bool = False
) -> dict[str, DataFrame]:
    out = {}
    for name in TABLE_NAMES:
        df = load_table(spark, sf_dir, name)
        if register_views:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out
