#!/usr/bin/env python
"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"q1": sec, ...}, "sf": 0.1}

Each query is forced end-to-end with a noop-format write (full
computation, no driver-side result transfer), which is what a cluster
sink would look like — collect() would make the driver the bottleneck
and measure pickling, not the engine.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# Headline set: one per major engine area (TF-IDF pipeline, relational
# agg/join/window, events/time-series, dedup, similarity, text analysis).
HEADLINE = [
    "tfidf_full",
    "task1_dictionary",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "window_rank_orders",
    "events_hourly_rollup",
    "sessionization",
    "dedup_exact",
    "dedup_minhash_lsh",
    "ann_cosine_topk_brute",
    "text_quality_scores",
]


def main() -> None:
    from pyspark.sql import SparkSession

    # Same engine configs as session.get_spark: the bench must measure
    # the plans the engine actually ships (notably the 64 MB broadcast
    # threshold — the default 10 MB would silently shuffle-join mid-size
    # dims at sf>=0.1 and bench a plan no user of the engine would run).
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("wikipedia-data-pipeline-spark-bench")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from wikipedia_data_pipeline_spark import registry

    queries = registry.spark_queries()

    # Warm-up: run every headline plan twice at the TARGET SF so JVM/JIT
    # codegen compilation (C2 needs repeat executions, not one), Python/
    # Arrow worker startup, and page cache don't land in the timed run.
    # Steady-state is what a long-lived cluster sees; one-time startup is
    # not a per-query property.
    for _ in range(2):
        for name in HEADLINE:
            queries[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()

    # Best-of-5: this VM shares a noisy host (loadavg from neighbors
    # alone routinely > 5); single-shot timings swing 2-3x run-to-run.
    # The minimum is the engine's actual cost — the standard defense
    # against neighbor noise.
    timings: dict[str, float] = {}
    for name in HEADLINE:
        best = float("inf")
        for _ in range(5):
            df = queries[name](spark, SF_DIR)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    sf = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "")
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
