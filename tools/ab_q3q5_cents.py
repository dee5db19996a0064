#!/usr/bin/env python
"""Isolated A/B: q3/q5 revenue aggregate as DECIMAL vs BIGINT-cents vs
integer-products (q1_cents form) on the 100x replica — diagnosis for
the round-9 probe's q3/q5 slowdown after the cents flip. Prints
best-of-3 warm times per variant plus the physical-plan agg expression
so the cost can be attributed (Round(double) codegen routes through
BigDecimal.valueOf, which may exceed the DECIMAL cast it replaced).

Usage: python tools/ab_q3q5_cents.py [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def q3_variant(spark, sf_dir, agg):
    from wikipedia_data_pipeline_spark.sources.tables import load_table

    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1998-01-01"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1997-01-01"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            "o_orderkey",
            F.to_date("o_orderdate").alias("orderdate"),
            "o_orderpriority",
        )
        .agg(agg)
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


def q5_variant(spark, sf_dir, agg):
    from wikipedia_data_pipeline_spark.sources.tables import load_table

    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem")
    dims = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(dims), o.o_custkey == dims.c_custkey)
        .groupBy("r_name", "n_name")
        .agg(agg)
    )


def aggs():
    from wikipedia_data_pipeline_spark.functions import cents_sum, dec_sum

    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    # integer-products form (q1_cents style): two cheap rounds on the
    # SOURCE columns (cent / percent quanta), then a pure long product
    price_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_b = F.round(F.col("l_discount") * 100).cast("long")
    intprod = (
        (F.sum(price_c * (100 - disc_b)).cast("double") / 10_000)
        .alias("revenue")
    )
    return {
        "dec": dec_sum(disc_price, "revenue"),
        "cents": cents_sum(disc_price, "revenue"),
        "intprod": intprod,
    }


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ab_q3q5.json"
    from pyspark.sql import SparkSession

    from tools.make_benchdata import ensure

    dir100 = ensure(
        "/root/testdata/sf0.1",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "benchdata", "sf10r",
        ),
        100,
    )
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ab-q3q5-cents")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(32 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm page cache + codegen
    for t in ("lineitem", "orders", "customer"):
        spark.read.parquet(os.path.join(dir100, f"{t}.parquet")).count()

    out: dict = {}
    for qname, builder in (("q3", q3_variant), ("q5", q5_variant)):
        for aname, agg in aggs().items():
            df = builder(spark, dir100, agg)
            df.write.format("noop").mode("overwrite").save()  # warm
            best = float("inf")
            for _ in range(3):
                df = builder(spark, dir100, agg)
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            out[f"{qname}_{aname}"] = round(best, 2)
            print(f"{qname}_{aname}: {out[f'{qname}_{aname}']}s", flush=True)
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
