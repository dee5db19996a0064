"""MERGE / upsert emulation on plain parquet (no Delta/Iceberg).

A CDC-style upsert — apply a batch of keyed updates to a base table,
update-wins — is a MERGE INTO on table formats with transaction logs.
On plain files the same result is a declarative program: tag both
sides with a priority, keep the highest-priority row per key. One
shuffle on the key; at scale this is exactly the compaction job a
log-structured ingest runs, and bucketing base + updates on the key
makes it shuffle-free (sources.bucketing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    keys: list[str],
    order_by: list[str] | None = None,
) -> DataFrame:
    """Update-wins upsert: rows from ``updates`` replace base rows with
    the same key; unmatched update rows are inserted. Schemas must
    match.

    Fully deterministic, including when one CDC batch carries several
    updates to the same key (real MERGE INTO errors on duplicate source
    keys; CDC streams routinely produce them): ties inside a priority
    class break first by ``order_by`` columns DESC (pass the batch's
    sequence/timestamp column — latest change wins), then by a stable
    content hash of the whole row, so the winner never depends on
    partition layout or task retries."""
    tagged = updates.withColumn("_prio", F.lit(0)).unionByName(
        base.withColumn("_prio", F.lit(1))
    )
    tie = [F.desc(c) for c in (order_by or [])]
    content_hash = F.xxhash64(*[F.col(c) for c in updates.columns])
    w = Window.partitionBy(*keys).orderBy("_prio", *tie, content_hash)
    return (
        tagged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_prio", "_rn")
    )
