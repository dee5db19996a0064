#!/usr/bin/env python
"""Interleaved A/B: registered text_rake_keywords vs a phrase-explode
restructure.

The registered plan joins the token-level ``nons`` relation against
``phrase`` and consumes that join TWICE (wstat, pscore); with no
cross-subtree CSE the posexplode of the whole corpus re-runs for every
reference (~6 token-level passes per execution). The candidate derives
BOTH word stats and phrase scores by re-exploding the PERSISTED phrase
relation instead: split(ptext, ' ') recovers each phrase's exact word
multiset (words cannot contain spaces — they came from split(' ')), so

  wstat  = explode(phrase.ptext) -> (w, plen)  -> groupBy(w)
  pscore = explode(phrase.ptext) -> join broadcast(wstat) -> groupBy

are exactly the nons-join aggregations, with the token-level fact
touched twice total (stopword scan + segmentation) and the persisted
phrase relation (one row per candidate phrase, ~tokens/3 rows) serving
everything downstream.

Usage: python tools/ab_rake_phrase.py [rounds]  (default 3)
Writes AB_RAKE_PHRASE_r13.json. Flip iff >20% at the 100x replica.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

_RAKE_K_STOP = 20
_RAKE_TOPK = 20


def rake_phrase_variant(spark, sf_dir):
    from pyspark.sql import Window

    from wikipedia_data_pipeline_spark.operators.ranks import track_persisted
    from wikipedia_data_pipeline_spark.sources.tables import fan_out, load_table

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    tok = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("p0", "w")
    ).select("doc_id", (F.col("p0") + 1).alias("p"), "w")
    stop = (
        tok.groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "w")
        .limit(_RAKE_K_STOP)
        .select("w")
    )
    w_doc = Window.partitionBy("doc_id").orderBy("p")
    nons = (
        tok.join(F.broadcast(stop), "w", "left_anti")
        .withColumn("grp", F.col("p") - F.row_number().over(w_doc))
    )
    phrase = track_persisted(
        nons.groupBy("doc_id", "grp")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("p"), F.col("w")))
                    ),
                    lambda s: s["w"],
                ),
            ).alias("ptext"),
            F.count(F.lit(1)).cast("long").alias("plen"),
        )
        .persist()
    )
    pw = phrase.select(
        "doc_id",
        "grp",
        "ptext",
        "plen",
        F.explode(F.split("ptext", " ")).alias("w"),
    )
    wstat = pw.groupBy("w").agg(
        F.count(F.lit(1)).cast("long").alias("freq"),
        F.sum("plen").cast("long").alias("deg"),
    )
    pscore = (
        pw.join(F.broadcast(wstat), "w")
        .groupBy("doc_id", "grp", "ptext")
        .agg(
            F.sum(
                F.round(
                    1e9 * F.col("deg").cast("double") / F.col("freq")
                ).cast("long")
            )
            .cast("long")
            .alias("score_nano")
        )
    )
    dedup = pscore.groupBy("ptext").agg(
        F.count(F.lit(1)).cast("long").alias("n_occurrences"),
        F.max("score_nano").cast("long").alias("score_nano"),
    )
    return (
        dedup.orderBy(F.desc("score_nano"), "ptext")
        .limit(_RAKE_TOPK)
        .select(
            F.col("ptext").alias("phrase"),
            "n_occurrences",
            (F.col("score_nano").cast("double") / 1e9).alias("rake_score"),
        )
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
        .appName("ab-rake-phrase")
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
    reg = queries["text_rake_keywords"]

    sf001 = "/root/testdata/sf0.01"
    a, b = _rows(reg(spark, sf001)), _rows(rake_phrase_variant(spark, sf001))
    ranks.unpersist_all()
    assert a == b, f"variant diverges at sf0.01:\n{a}\nvs\n{b}"
    print("equivalence at sf0.01: OK (exact)")

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

    timed(rake_phrase_variant)
    timed(reg)  # warmups
    times: dict[str, list] = {"registered": [], "phrase_explode": []}
    for _ in range(rounds):
        times["registered"].append(timed(reg))
        times["phrase_explode"].append(timed(rake_phrase_variant))
        print("round:", times, flush=True)

    out = {
        "metric": "ab_rake_phrase_100x_r13",
        "times": times,
        "best": {k: min(v) for k, v in times.items()},
    }
    print(json.dumps(out))
    with open(
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "AB_RAKE_PHRASE_r13.json",
        ),
        "w",
    ) as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    spark.stop()


if __name__ == "__main__":
    main()
