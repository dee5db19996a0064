#!/usr/bin/env python
"""Interleaved A/B: registered dedup_cross_source_matrix vs a
pinned-intermediates form (guide §5 — the multiply-referenced-
intermediate rule).

The honest r14 probe (post persist-tracking) read 18.1 s at 100× —
the r13 4.15 s row was almost entirely cache-served. Reference
counting in the registered DAG: `tmap` (reps ⋈ ts — BOTH are full
groupBys over 500k full texts) feeds FOUR subtrees (a, b, tsa, tsb),
and `lab` (the union of cross-text and within-text weights) is
evaluated TWICE (the n_total aggregate + the final group-by), so the
text-collapse work runs up to 8 times per execution (Spark does no
cross-subtree CSE).

Candidate:
1. persist (tracked) `tmap` — text-count-sized, no text payload;
2. persist (tracked) the GROUPED matrix (≤ |sources|² rows) and
   derive n_total = Σ n_pairs from it (the quantile-summary N trick),
   so `lab` — and the prefix-filter pair join under it — runs once.

Same integers, same output (Σ of per-group sums == the global sum).

Usage: python tools/ab_cross_source.py [rounds]  (default 3)
Writes AB_CROSS_SOURCE_r14.json. Flip iff >20% at the 100x replica.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

_J = 0.5


def cross_source_pinned(spark, sf_dir):
    from pyspark import StorageLevel

    from wikipedia_data_pipeline_spark.operators import dedup as D
    from wikipedia_data_pipeline_spark.operators.ranks import track_persisted
    from wikipedia_data_pipeline_spark.queries.dedup_queries import (
        JACCARD_THRESHOLD,
    )
    from wikipedia_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    ts = docs.groupBy("text", "source").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    reps = docs.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
    has_sh = F.size(F.split("text", " ")) >= 3
    pairs = D.prefix_filter_pairs(
        reps.select("doc_id", "text"), JACCARD_THRESHOLD
    )
    tmap = track_persisted(
        reps.join(ts, "text")
        .select(
            F.col("doc_id").alias("t_id"), "source", "cnt",
            has_sh.alias("ok"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    a = tmap.select(
        F.col("t_id").alias("doc_a"),
        F.col("source").alias("src_a"),
        F.col("cnt").alias("cnt_a"),
    )
    b = tmap.select(
        F.col("t_id").alias("doc_b"),
        F.col("source").alias("src_b"),
        F.col("cnt").alias("cnt_b"),
    )
    cross_text = (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            F.least("src_a", "src_b").alias("source_lo"),
            F.greatest("src_a", "src_b").alias("source_hi"),
            (F.col("src_a") != F.col("src_b")).alias("cross_source"),
            (F.col("cnt_a") * F.col("cnt_b")).alias("w"),
            F.round(F.col("jaccard") * 1_000_000_000)
            .cast("long")
            .alias("j_nano"),
        )
    )
    tsa = tmap.filter("ok").select(
        "t_id", F.col("source").alias("src_a"), F.col("cnt").alias("cnt_a")
    )
    tsb = tmap.filter("ok").select(
        "t_id", F.col("source").alias("src_b"), F.col("cnt").alias("cnt_b")
    )
    within = (
        tsa.join(tsb, "t_id")
        .filter(F.col("src_a") <= F.col("src_b"))
        .select(
            F.col("src_a").alias("source_lo"),
            F.col("src_b").alias("source_hi"),
            (F.col("src_a") != F.col("src_b")).alias("cross_source"),
            F.when(
                F.col("src_a") == F.col("src_b"),
                F.col("cnt_a") * (F.col("cnt_a") - 1) / 2,
            )
            .otherwise(F.col("cnt_a") * F.col("cnt_b"))
            .cast("long")
            .alias("w"),
            F.lit(1_000_000_000).cast("long").alias("j_nano"),
        )
        .filter(F.col("w") > 0)
    )
    lab = cross_text.unionByName(within)
    grouped = track_persisted(
        lab.groupBy("source_lo", "source_hi", "cross_source")
        .agg(
            F.sum("w").cast("long").alias("n_pairs"),
            F.sum(F.col("w") * F.col("j_nano"))
            .cast("long")
            .alias("j_nano_sum"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    tot = grouped.agg(F.sum("n_pairs").cast("long").alias("n_total"))
    return (
        grouped.crossJoin(F.broadcast(tot))
        .select(
            "source_lo",
            "source_hi",
            "cross_source",
            "n_pairs",
            (
                F.col("j_nano_sum").cast("double")
                / (F.col("n_pairs") * F.lit(1_000_000_000.0))
            ).alias("mean_jaccard"),
            (
                F.col("n_pairs").cast("double")
                / F.col("n_total").cast("double")
            ).alias("pair_share"),
        )
        .orderBy(F.desc("n_pairs"), F.asc("source_lo"), F.asc("source_hi"))
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    from pyspark.sql import SparkSession

    from tools.make_benchdata import ensure
    from wikipedia_data_pipeline_spark import registry
    from wikipedia_data_pipeline_spark.operators import ranks

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ab-cross-source")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(32 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"),
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    queries = registry.spark_queries()
    reg = queries["dedup_cross_source_matrix"]

    for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        a, b = _rows(reg(spark, sf)), _rows(cross_source_pinned(spark, sf))
        ranks.unpersist_all()
        assert a == b, f"variant diverges at {sf}"
        print(f"equivalence at {sf}: OK (exact, {len(a)} rows)")

    dir100 = ensure(
        "/root/testdata/sf0.1",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "benchdata",
            "sf10r",
        ),
        100,
    )

    def timed(fn):
        df = fn(spark, dir100)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        ranks.unpersist_all()
        return round(dt, 2)

    timed(cross_source_pinned)
    timed(reg)  # warmups
    times: dict[str, list] = {"registered": [], "pinned_tmap_grouped": []}
    for _ in range(rounds):
        times["registered"].append(timed(reg))
        times["pinned_tmap_grouped"].append(timed(cross_source_pinned))
        print("round:", times, flush=True)

    out = {
        "metric": "ab_cross_source_100x_r14",
        "times": times,
        "best": {k: min(v) for k, v in times.items()},
    }
    print(json.dumps(out))
    with open(
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "AB_CROSS_SOURCE_r14.json",
        ),
        "w",
    ) as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    spark.stop()


if __name__ == "__main__":
    main()
