#!/usr/bin/env python
"""Interleaved A/B: registered dedup_doc_continuation vs two rewrites.

The first honest probe of this query (r14 sweep) read 37.9 s at 100x —
now the heaviest non-timeout row. Two independent causes:

1. the boundary-key relation `hk` feeds BOTH sides of the tail=head
   self-join with no persist, so the full normalization pass runs
   TWICE (Spark does no cross-subtree CSE) — fix: persist (tracked);
2. normalization is a PER-TOKEN regexp_replace inside a transform
   lambda (~|tokens| regex invocations per document) — fix: one
   whole-text regex that keeps letters AND the single-space delimiter
   (`[^a-zA-Z ]` -> ''), then lower + split + filter-empty: identical
   token lists (tokens are space-delimited; a token with no letters
   normalizes to '' and is filtered in both forms), ~1 regex call per
   document instead of ~|tokens|.

Variants: `persist_only` isolates (1); `persist_single_regex` adds (2).

Usage: python tools/ab_continuation.py [rounds]  (default 3)
Writes AB_CONTINUATION_r14.json. Flip iff >20% at the 100x replica.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

_K = 3


def _finish(hk):
    a = hk.select(
        F.col("doc_id").alias("tail_doc"), F.col("tail").alias("overlap")
    )
    b = hk.select(F.col("doc_id").alias("head_doc"), F.col("head"))
    return (
        a.join(b, a["overlap"] == b["head"])
        .filter(F.col("tail_doc") != F.col("head_doc"))
        .select("tail_doc", "head_doc", "overlap")
    )


def _persisted(hk):
    from pyspark import StorageLevel

    from wikipedia_data_pipeline_spark.operators.ranks import track_persisted

    return track_persisted(hk.persist(StorageLevel.MEMORY_AND_DISK))


def continuation_persist_only(spark, sf_dir):
    from wikipedia_data_pipeline_spark.operators.text import (
        NORMALIZE_PATTERN,
        TOKEN_DELIMITER,
    )
    from wikipedia_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(
        F.transform(
            F.split(F.col("text"), TOKEN_DELIMITER),
            lambda w: F.lower(F.regexp_replace(w, NORMALIZE_PATTERN, "")),
        ),
        lambda w: F.length(w) > 0,
    )
    hk = (
        docs.select("doc_id", toks.alias("toks"))
        .filter(F.size("toks") >= 2 * _K)
        .select(
            "doc_id",
            F.concat_ws(" ", F.slice("toks", 1, _K)).alias("head"),
            F.concat_ws(" ", F.slice("toks", -_K, _K)).alias("tail"),
        )
    )
    return _finish(_persisted(hk))


def continuation_single_regex(spark, sf_dir):
    from wikipedia_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(
            F.lower(F.regexp_replace(F.col("text"), "[^a-zA-Z ]", "")), " "
        ),
        lambda w: F.length(w) > 0,
    )
    hk = (
        docs.select("doc_id", toks.alias("toks"))
        .filter(F.size("toks") >= 2 * _K)
        .select(
            "doc_id",
            F.concat_ws(" ", F.slice("toks", 1, _K)).alias("head"),
            F.concat_ws(" ", F.slice("toks", -_K, _K)).alias("tail"),
        )
    )
    return _finish(_persisted(hk))


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
        .appName("ab-continuation")
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
    reg = queries["dedup_doc_continuation"]

    variants = {
        "persist_only": continuation_persist_only,
        "persist_single_regex": continuation_single_regex,
    }
    for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        a = _rows(reg(spark, sf))
        for name, fn in variants.items():
            b = _rows(fn(spark, sf))
            ranks.unpersist_all()
            assert a == b, f"{name} diverges at {sf}"
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

    for fn in (reg, *variants.values()):  # warmup
        timed(fn)
    times: dict[str, list] = {
        "registered": [], "persist_only": [], "persist_single_regex": []
    }
    for _ in range(rounds):
        times["registered"].append(timed(reg))
        for name, fn in variants.items():
            times[name].append(timed(fn))
        print("round:", times, flush=True)

    out = {
        "metric": "ab_continuation_100x_r14",
        "times": times,
        "best": {k: min(v) for k, v in times.items()},
    }
    print(json.dumps(out))
    with open(
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "AB_CONTINUATION_r14.json",
        ),
        "w",
    ) as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    spark.stop()


if __name__ == "__main__":
    main()
