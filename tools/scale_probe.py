#!/usr/bin/env python
"""100x-replica scale probe with DuckDB twin timings (round-7 form of
the r6 single-shot probe; verdict items #2 and #4).

Runs the headline family PLUS the round-6-session-2 novelties (spatial
grid join, rolling median/MAD, KMV compositions, ml_eval_auc — the
ordered_scan consumers most likely to be stressed) on the 100x replica
of the driver's sf0.1 data (~sf10 facts: 60M lineitem, 10M events),
each query twice (keep the better), and — new this round — times the
DuckDB oracle twin of every oracle-bearing query on the same replica,
so the micro-aggregate family finally has a ratio at a scale where the
scheduling floor is fully amortized.

DuckDB twins that exceed a per-query budget are recorded as "timeout"
(the brute-force-oracle twins are DELIBERATELY quadratic; timing them
measures oracle design, not engines — same exclusion rule as bench.py).

Usage: python tools/scale_probe.py [out_json]
"""

from __future__ import annotations

import json
import multiprocessing
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC_SF = "/root/testdata/sf0.1"
DUCK_BUDGET_S = 120.0

PROBE = [
    # headline family (comparable to SCALE_PROBE_r06)
    "q1_pricing_summary",
    "q1_pricing_summary_cents",   # the dec_sum-vs-cents A/B at 100x
    "q3_shipping_priority",
    "q5_region_revenue",
    "events_hourly_rollup",
    "sessionization",
    "window_rank_orders",
    "dedup_exact",
    "parts_abc_classification",
    "lineitem_exact_percentiles",
    "customer_rfm_segments",
    "events_lateness_audit",
    "revenue_concentration_deciles",
    "text_quality_scores",
    "tfidf_full",
    "dedup_minhash_lsh",
    # r6s2 novelties (verdict #4: 100x rows + plan note each)
    "spatial_grid_join_events",
    "events_rolling_median_value",
    "sketch_kmv_distinct_users",
    "sketch_kmv_jaccard_matrix",
    "events_rolling_distinct_kmv",
    "incremental_distinct_users_kmv",
    "sketch_quantile_summary_events",
    "sketch_ams_f2_users",
    "ml_eval_auc_events",
    "ml_eval_gains_table",
    "events_theil_sen_trend",
    "events_pattern_match",
    "sample_pps_systematic_orders",
]
# quadratic-oracle twins: timing DuckDB here measures the oracle's
# deliberate brute-force design, not the engine — skip, like bench.py
DUCK_SKIP = {"dedup_minhash_lsh"}

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck_worker(sql, sf_dir, q):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    best = float("inf")
    for _ in range(2):  # best-of-2: first run doubles as page-cache warmup
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        best = min(best, time.perf_counter() - t0)
    q.put(round(best, 2))


def duck_time(sql, sf_dir):
    """One DuckDB run in a subprocess so a runaway twin can be killed
    at the budget instead of wedging the probe."""
    q = multiprocessing.Queue()
    p = multiprocessing.Process(target=_duck_worker, args=(sql, sf_dir, q))
    p.start()
    p.join(DUCK_BUDGET_S)
    if p.is_alive():
        p.terminate()
        p.join()
        return "timeout"
    return q.get() if not q.empty() else "error"


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "SCALE_PROBE_r07.json"

    from pyspark.sql import SparkSession

    from tools.make_benchdata import ensure
    from wikipedia_data_pipeline_spark import registry
    from wikipedia_data_pipeline_spark.operators import ranks

    dir100 = ensure(
        SRC_SF,
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "benchdata", "sf10r"),
        100,
    )
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("scale-probe-100x")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(32 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    queries = registry.spark_queries()
    oracles = registry.oracle_queries()

    # Global warmup: the first measured query otherwise pays JVM/codegen
    # warmup AND the cold page-cache read of the whole 1.7 GB replica
    # (observed: q1 at 18 s cold vs 6 s warm). One full-table count per
    # fact table touches every page; one q1 pass warms codegen.
    for t in ("lineitem", "orders", "events", "documents"):
        spark.read.parquet(os.path.join(dir100, f"{t}.parquet")).count()
    queries["q1_pricing_summary"](spark, dir100).write.format("noop").mode(
        "overwrite"
    ).save()

    spark_t: dict[str, float] = {}
    duck_t: dict = {}
    for name in PROBE:
        best = float("inf")
        for _ in range(3):
            df = queries[name](spark, dir100)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            ranks.unpersist_all()
        spark_t[name] = round(best, 2)
        print(f"spark  {name}: {spark_t[name]}s", flush=True)
        if name in oracles and name not in DUCK_SKIP:
            duck_t[name] = duck_time(oracles[name], dir100)
            print(f"duckdb {name}: {duck_t[name]}", flush=True)

    ratios = {
        n: round(spark_t[n] / duck_t[n], 2)
        for n in duck_t
        if isinstance(duck_t[n], float) and duck_t[n] > 0
    }
    out = {
        "metric": "scale_probe_100x_with_duckdb_twins",
        "unit": "sec",
        "dir": "100x replica of /root/testdata/sf0.1 "
               "(~sf10 facts: 60M lineitem, 10M events, 50k docs x100)",
        "queries": spark_t,
        "duckdb": duck_t,
        "ratio_per_query": ratios,
        "notes": (
            "best-of-2 warm Spark times on local[%s]; DuckDB twin = the "
            "gate-proven oracle SQL, best-of-2, %ss total budget. "
            "q1_pricing_summary_cents is the BIGINT-cents A/B of the "
            "DECIMAL q1 (dec_over_cents = %s)."
            % (
                cpus,
                int(DUCK_BUDGET_S),
                round(
                    spark_t["q1_pricing_summary"]
                    / spark_t["q1_pricing_summary_cents"],
                    2,
                )
                if spark_t.get("q1_pricing_summary_cents")
                else "n/a",
            )
        ),
    }
    with open(out_path, "w") as fh:
        fh.write(json.dumps(out, indent=1))
    print(json.dumps({k: out[k] for k in ("queries", "ratio_per_query")}))
    spark.stop()


if __name__ == "__main__":
    main()
