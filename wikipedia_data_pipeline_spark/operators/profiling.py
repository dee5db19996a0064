"""Dataset profiling and physical-layout operators — the operational
side of running a 100 TB corpus: know your data (column profiles, key
skew) and lay it out so scans prune (Z-order multi-column clustering).

All pure DataFrame programs. Profiling is one aggregation pass over the
table (partial + final, no per-column jobs); the skew report is one
hash aggregation plus a broadcast of the 1-row total; Z-values are a
narrow bit-arithmetic projection that whole-stage codegen inlines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per-column profile: rows, nulls, exact distinct count, min/max
    (stringified so heterogeneous column types share one schema) — the
    ANALYZE-style statistics pass a pipeline runs before planning a big
    job.

    Single wide aggregation computing every statistic for every column
    in one scan (count_distinct for several columns in one agg expands
    to an expand-node plan, still one pass over the input), then an
    unpivot via ``stack`` to one row per column. At 100 TB swap
    count_distinct for approx_count_distinct — same single-scan shape.
    """
    aggs: list[Column] = [F.count(F.lit(1)).alias("_rows")]
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"_nn_{c}"),
            F.count_distinct(F.col(c)).alias(f"_nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"_min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"_max_{c}"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', _nn_{c}, _nd_{c}, _min_{c}, _max_{c}" for c in cols
    )
    return wide.select(
        F.col("_rows").alias("n_rows"),
        F.expr(
            f"stack({len(cols)}, {stack_args}) "
            "AS (col_name, n_non_null, n_distinct, min_val, max_val)"
        ),
    ).select(
        "col_name",
        "n_rows",
        "n_non_null",
        (F.col("n_rows") - F.col("n_non_null")).alias("n_nulls"),
        "n_distinct",
        "min_val",
        "max_val",
    )


def key_skew_report(
    df: DataFrame, key_col: str, top_n: int = 20
) -> DataFrame:
    """Hottest keys and their share of the table — the diagnostic run
    before choosing a join/shuffle strategy (a key with share ≫ 1/shuffle
    partitions is the one you salt or let AQE split).

    One hash aggregation on the key; the total rides along as
    sum-over-window of the aggregated counts (tiny: |distinct keys|
    rows), so the table is scanned once.
    """
    from pyspark.sql import Window

    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    total = F.sum("n").over(Window.partitionBy())
    return (
        counts.withColumn("share", F.col("n") / total)
        .orderBy(F.desc("n"), F.asc("key"))
        .limit(top_n)
    )


def zorder_key(cols: list[Column], bits: int = 16) -> Column:
    """Z-value (Morton code) of non-negative integer columns: bit i of
    column j lands at position ``i * n_cols + j``. A range-partition +
    sort on this key clusters ALL participating dimensions at once, so
    per-file min/max stats stay tight on every dimension and scans with
    a predicate on ANY of them prune files — the standard multi-column
    data-skipping layout (cf. Delta/Iceberg OPTIMIZE ZORDER BY).

    Plain shift/mask arithmetic — `bits * n_cols` OR terms, all inside
    whole-stage codegen; no UDF, no shuffle (the layout write adds one
    range-partition exchange, which IS the clustering).
    """
    n = len(cols)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + j))
    return z


def zorder_layout(
    df: DataFrame, zcol: Column, n_files: int = 16
) -> DataFrame:
    """Cluster a table by Z-value for writing: range-partition into
    ``n_files`` buckets and sort within each — every output file covers
    a compact Z-range, i.e. a small hyper-rectangle of the original
    dimensions."""
    return (
        df.withColumn("zval", zcol)
        .repartitionByRange(n_files, "zval")
        .sortWithinPartitions("zval")
    )
