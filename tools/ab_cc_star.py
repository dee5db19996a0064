#!/usr/bin/env python
"""Interleaved A/B: registered dedup_connected_components vs a
group-linear "star" edge generation (guide §1.2 — fix the algorithm).

The registered form feeds ``G.connected_components`` the FULL
quadratic pair contract from ``minhash_lsh_pairs``: a byte-identical
duplicate group of k docs contributes C(k,2) within-group pairs, and a
verified rep-level pair between groups of sizes k_a, k_b expands to
k_a*k_b member pairs. Components only need CONNECTIVITY, so the same
node set and the same components are produced by

  edges = verified rep-level pairs  UNION  per-group stars
          (rep=min(members) -> member, for groups with >= 2 members
           and a non-empty shingle set — exactly the registered
           within-group filter jaccard(hsh, hsh) >= threshold)

which is group-LINEAR: k-1 star edges instead of C(k,2), one rep-level
edge instead of k_a*k_b. Node-set equality: members of a group appear
in the quadratic pair relation iff (size >= 2 and shingles non-empty)
or their rep has a verified cross pair — both cases covered by the
star/rep edges under identical filters (jaccard(empty, empty) = 0
drops both forms). comp_id = min over the same component, comp_size =
count over the same node set => bit-identical output.

The candidate also materializes the edge relation (persist + count)
before connected_components' undirected union, so the LSH verify
lineage runs once, not once per union branch.

Usage: python tools/ab_cc_star.py [rounds]  (default 3)
Writes AB_CC_STAR_r13.json. Flip iff >20% at the 100x replica.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

_THRESHOLD = 0.5


def cc_quadratic(spark, sf_dir):
    """The pre-flip registered body (r12): connected components over
    the full quadratic pair contract. Self-contained here because the
    registry entry now carries the star form."""
    from wikipedia_data_pipeline_spark.operators import dedup as D
    from wikipedia_data_pipeline_spark.operators import graph as G
    from wikipedia_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_pairs(docs, _THRESHOLD).select("doc_a", "doc_b")
    cc = G.connected_components(pairs, src="doc_a", dst="doc_b")
    sizes = cc.groupBy("comp").agg(F.count(F.lit(1)).alias("comp_size"))
    return cc.join(sizes, "comp").select(
        F.col("node").alias("doc_id"),
        F.col("comp").alias("comp_id"),
        F.col("comp_size").cast("long").alias("comp_size"),
    )


def cc_star_variant(spark, sf_dir):
    from wikipedia_data_pipeline_spark.operators import dedup as D
    from wikipedia_data_pipeline_spark.operators import graph as G
    from wikipedia_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    groups = (
        docs.groupBy("text")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.sort_array(F.collect_list("doc_id")).alias("members"),
        )
        .persist()
    )
    reps = groups.select("doc_id", "text")
    sh = D.hashed_shingles(reps).persist()
    cands = D.lsh_candidate_pairs(sh)
    rep_pairs = D.verify_pairs_jaccard(cands, sh, _THRESHOLD).select(
        "doc_a", "doc_b"
    )
    stars = (
        groups.filter(F.size("members") >= 2)
        .join(sh, "doc_id")
        .withColumn("j", D.jaccard(F.col("hsh"), F.col("hsh")))
        .filter(F.col("j") >= _THRESHOLD)
        .select(
            F.col("doc_id").alias("doc_a"),
            F.explode("members").alias("doc_b"),
        )
        .filter(F.col("doc_a") != F.col("doc_b"))
    )
    # groups/sh stay persisted like the registered form leaves them
    # (plan-canonicalized cache reuse across best-of-N runs must be
    # symmetric between the two arms).
    edges = rep_pairs.unionByName(stars).persist()
    edges.count()  # materialize once: CC's undirected union reads cache
    cc = G.connected_components(edges, src="doc_a", dst="doc_b")
    edges.unpersist()
    sizes = cc.groupBy("comp").agg(F.count(F.lit(1)).alias("comp_size"))
    return cc.join(sizes, "comp").select(
        F.col("node").alias("doc_id"),
        F.col("comp").alias("comp_id"),
        F.col("comp_size").cast("long").alias("comp_size"),
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
        .appName("ab-cc-star")
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

    registry.spark_queries()  # import side effects only
    reg = cc_quadratic

    if os.environ.get("SPARK_GRAFT_AB_SKIP_EQUIV") != "1":
        for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
            a, b = _rows(reg(spark, sf)), _rows(cc_star_variant(spark, sf))
            ranks.unpersist_all()
            assert (
                a == b
            ), f"variant diverges at {sf}: {len(a)} vs {len(b)} rows"
            print(f"equivalence at {sf}: OK (exact, {len(a)} rows)", flush=True)

    dir100 = ensure(
        "/root/testdata/sf0.1",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "benchdata",
            "sf10r",
        ),
        100,
    )

    def timed(fn, cold):
        # Two protocols. COLD clears the cache so every run pays its
        # true end-to-end cost (connected_components leaves persisted
        # relations that plan-canonicalized cache lookup would hand to
        # the NEXT identical run) — but then both arms are dominated
        # by the SHARED cold shingling/LSH head of the 500k-doc
        # corpus. WARM leaves the head's groups/sh caches in place
        # (exactly what the shipped probe protocol does), isolating
        # the tail this A/B actually changes: the edge relation and
        # the propagation over it.
        if cold:
            spark.catalog.clearCache()
        t0 = time.perf_counter()
        df = fn(spark, dir100)
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        # connected_components registers its persisted result with
        # track_persisted (r13), so this releases each run's own CC
        # cache while the warm protocol keeps the raw-persisted
        # groups/sh head in place.
        ranks.unpersist_all()
        return round(dt, 2)

    times: dict[str, dict] = {
        "cold": {"quadratic": [], "star_edges": []},
        "warm": {"quadratic": [], "star_edges": []},
    }
    # COLD protocol first.
    for _ in range(rounds):
        times["cold"]["quadratic"].append(timed(reg, cold=True))
        times["cold"]["star_edges"].append(timed(cc_star_variant, cold=True))
        print("round cold:", times["cold"], flush=True)
    # WARM protocol: one unmeasured warmup per arm re-warms the head
    # (and leaves each arm's plan-canonical caches populated, the same
    # steady state the probe's best-of-3 reaches).
    spark.catalog.clearCache()
    timed(reg, cold=False)
    timed(cc_star_variant, cold=False)
    for _ in range(rounds):
        times["warm"]["quadratic"].append(timed(reg, cold=False))
        times["warm"]["star_edges"].append(timed(cc_star_variant, cold=False))
        print("round warm:", times["warm"], flush=True)

    out = {
        "metric": "ab_cc_star_100x_r13",
        "times": times,
        "best": {
            proto: {k: min(v) for k, v in arms.items()}
            for proto, arms in times.items()
        },
    }
    print(json.dumps(out))
    with open(
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "AB_CC_STAR_r13.json",
        ),
        "w",
    ) as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    spark.stop()


if __name__ == "__main__":
    main()
