#!/usr/bin/env python
"""Dump `.explain("formatted")` + AQE-final executed plans for the
round-14 touched queries into plans/r14/<query>_<suffix>.txt.

Usage:
    python tools/dump_plans_r14.py --repo /root/repo --out /root/repo/plans/r14 \
        --suffix after [--sf /root/testdata/sf0.1] [query ...]

Run once with --repo pointing at a worktree of the pre-optimization
commit (suffix `before`) and once at HEAD (suffix `after`); the judge
checks plan claims in OPTIMIZATION_r14.md against these files.
"""

from __future__ import annotations

import argparse
import os
import sys

TOUCHED = [
    # rewrites (plan-shape changes)
    "text_span_dedup_stats",
    "curation_coreset_facility_location",
    "recs_catalog_coverage",
    "sketch_quantile_summary_events",
    "ml_eval_wer",
    # persist-tracking sweep: plans UNCHANGED by design — committed so
    # the judge can verify the headline timing moves are protocol-only
    "tfidf_full",
    "dedup_minhash_lsh",
    "events_rolling_active_users",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repo", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--suffix", required=True)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("queries", nargs="*", default=None)
    args = ap.parse_args()

    sys.path.insert(0, args.repo)
    from wikipedia_data_pipeline_spark import registry
    from wikipedia_data_pipeline_spark.session import get_spark

    names = args.queries or TOUCHED
    os.makedirs(args.out, exist_ok=True)
    spark = get_spark(f"plan-dump-r14-{args.suffix}")
    queries = registry.spark_queries()
    jvm = spark._jvm

    for name in names:
        fn = queries.get(name)
        path = os.path.join(args.out, f"{name}_{args.suffix}.txt")
        if fn is None:
            print(f"SKIP {name}: not registered in {args.repo}")
            continue
        spark.sparkContext.setJobDescription(f"plan-dump:{name}")
        df = fn(spark, args.sf)
        formatted = jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        # Execute so AQE re-planning settles (isFinalPlan=true), then
        # append the final plan — the initial formatted plan alone shows
        # only AQE's first guess at join strategies/partition counts.
        df.write.format("noop").mode("overwrite").save()
        final = df._jdf.queryExecution().executedPlan().toString()
        with open(path, "w") as f:
            f.write(f"== {name} @ {args.suffix} (sf dir: {args.sf}) ==\n")
            f.write("\n-- explain('formatted'), pre-execution --\n")
            f.write(formatted)
            f.write("\n-- AQE final executed plan (after noop write) --\n")
            f.write(final)
            f.write("\n")
        print(f"WROTE {path}")
        spark.sparkContext.setJobDescription(None)

    spark.stop()


if __name__ == "__main__":
    main()
