"""File sources/sinks beyond the parquet catalog (SURVEY.md §2.1).

The reference's sinks are hand-rolled FileWriters with appends and
per-doc files (S4/S5, DocInfo.java:56-62) plus S3 puts (S6); here they
are declarative writes — atomic via the commit protocol, so the
reference's words.txt append race (SURVEY.md §4.2) cannot exist.
S3 works by swapping the path for ``s3a://`` (credentials come from the
provider chain, never code).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    **options,
) -> None:
    """Declarative sink. ``partition_by`` gives the reference's
    one-file-per-doc layout (S5) as hive-style directories — at scale
    this is also what makes partition pruning work on re-read."""
    w = df.write.format(fmt).mode(mode).options(**options)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | str | None = None,
    **options,
) -> DataFrame:
    """Declarative scan; explicit schema skips inference (S3-scan
    equivalent — no positional split(', ') conventions, SURVEY.md §1.3)."""
    r = spark.read.format(fmt).options(**options)
    if schema is not None:
        r = r.schema(schema)
    return r.load(path)


def read_text_corpus(spark: SparkSession, path: str) -> DataFrame:
    """The reference's raw source: one pseudo-XML document per line of a
    text object (S1/S2). Combine with operators.text.parse_wiki_lines."""
    return spark.read.text(path)
