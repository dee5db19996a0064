"""Table maintenance: small-file compaction and sorted rewrite.

At 100 TB the silent killer is not one slow query — it is a table that
has accreted millions of small files (streaming micro-batches, per-key
partitioned sinks, upsert churn). Every scan then pays open/seek/footer
costs per file and the driver pays listing time. Compaction is the
standard maintenance job: read, coalesce to target-sized output files,
optionally range-sort so min/max column statistics become selective
(the poor-man's Z-order for single-column predicates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from wikipedia_data_pipeline_spark.sources.io import read_table, write_table

DEFAULT_TARGET_FILE_BYTES = 128 * 1024 * 1024


def plan_compaction(
    df: DataFrame,
    total_bytes: int,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
) -> int:
    """Output file count for ``total_bytes`` of data at the target file
    size (>= 1). Callers supply bytes from the catalog / file listing —
    computing it by scanning would defeat the purpose."""
    return max(1, (total_bytes + target_file_bytes - 1) // target_file_bytes)


def compact(
    spark: SparkSession,
    src_path: str,
    dest_path: str,
    total_bytes: int,
    sort_col: str | None = None,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
    fmt: str = "parquet",
) -> int:
    """Rewrite ``src_path`` into ``n`` target-sized files at
    ``dest_path``; returns ``n``.

    With ``sort_col``, the rewrite is ``repartitionByRange`` +
    ``sortWithinPartitions`` — each output file covers a disjoint value
    range, so parquet min/max stats let later scans skip whole files
    for range/equality predicates on that column. Without it, a plain
    ``repartition`` balances bytes. Writing to a NEW path + atomic
    swap-by-rename is the caller's transaction strategy (plain parquet
    has no log to make in-place rewrite safe)."""
    df = read_table(spark, src_path, fmt=fmt)
    n = plan_compaction(df, total_bytes, target_file_bytes)
    if sort_col is not None:
        df = df.repartitionByRange(n, sort_col).sortWithinPartitions(sort_col)
    else:
        df = df.repartition(n)
    write_table(df, dest_path, fmt=fmt, mode="overwrite")
    return n
