"""Object-store (s3a://) configuration for the S6 sink path.

The reference talks to S3 through hand-rolled SDK calls with literal
credentials embedded in source (Main.java:36-38 in /root/reference — the
anti-pattern this engine must not replicate). In Spark the same I/O is
the ordinary ``spark.read``/``df.write`` against an ``s3a://`` URI; what
actually matters at 100 TB is the *committer and filesystem tuning*,
which is pure configuration:

  * credentials come from the provider chain (environment, instance
    profile, or explicit provider class) — never from code;
  * the "magic" S3A committer makes writes correct-and-fast on an
    eventually-renamed store: no O(data) copy-on-rename finalize, task
    commits are atomic multipart completions;
  * upload/connection tuning keeps 1000 executors from serializing on
    the driver or the store's request limits.

These helpers only *set configuration*; they do not require S3 to be
reachable (nothing here opens a connection), so they are unit-testable
in the sandbox and drop-in on a real cluster.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

S3A_COMMITTER_CONFS: dict[str, str] = {
    # committer: magic committer needs no consistent-listing store anymore
    # (S3 is strongly consistent since 2020) and avoids rename entirely.
    "spark.sql.sources.commitProtocolClass": (
        "org.apache.spark.internal.io.cloud.PathOutputCommitProtocol"
    ),
    "spark.sql.parquet.output.committer.class": (
        "org.apache.spark.internal.io.cloud.BindingParquetOutputCommitter"
    ),
    "spark.hadoop.fs.s3a.committer.name": "magic",
    "spark.hadoop.fs.s3a.committer.magic.enabled": "true",
}

S3A_THROUGHPUT_CONFS: dict[str, str] = {
    # parallel multipart uploads sized for large parquet row groups
    "spark.hadoop.fs.s3a.multipart.size": str(128 * 1024 * 1024),
    "spark.hadoop.fs.s3a.fast.upload": "true",
    "spark.hadoop.fs.s3a.connection.maximum": "96",
    "spark.hadoop.fs.s3a.threads.max": "64",
    # read path: random IO for parquet footer+column-chunk seeks
    "spark.hadoop.fs.s3a.experimental.input.fadvise": "random",
}


def s3a_confs(extra: dict[str, str] | None = None) -> dict[str, str]:
    """The full recommended conf set (committer + throughput). No
    credential keys: the default AWSCredentialsProviderChain resolves
    them from the environment/instance — embedding them in configuration
    would repeat the reference's Main.java:36 mistake."""
    out = {**S3A_COMMITTER_CONFS, **S3A_THROUGHPUT_CONFS}
    if extra:
        out.update(extra)
    return out


HADOOP_PREFIX = "spark.hadoop."


def configure_object_store(
    spark: SparkSession, extra: dict[str, str] | None = None
) -> SparkSession:
    """Apply the s3a conf set to a live session: ``spark.hadoop.*``
    keys go onto the Hadoop configuration (their runtime home — Spark
    only reads the ``spark.hadoop.`` prefix at session build), SQL keys
    through ``spark.conf``. On a real cluster pass ``s3a_confs()`` to
    the session *builder* instead so executor-side Hadoop configs match."""
    from pyspark.errors.exceptions.captured import IllegalArgumentException

    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    for k, v in s3a_confs(extra).items():
        if k.startswith(HADOOP_PREFIX):
            hconf.set(k[len(HADOOP_PREFIX):], v)
        else:
            try:
                spark.conf.set(k, v)
            except IllegalArgumentException:
                # committer classes live in the spark-hadoop-cloud module;
                # when that jar is absent (local/test) Spark validates and
                # rejects the class name — skip, the remaining fs.s3a
                # tuning still applies and a real cluster sets these at
                # session build where the jar is present.
                pass
    return spark
