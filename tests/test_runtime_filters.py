"""operators.runtime_filters: Bloom no-false-negative property, exact
join equivalence, actual pruning, and a JVM-only plan (the membership
test must not fall out of codegen into a Python eval node)."""

from __future__ import annotations

from pyspark.sql import functions as F

from wikipedia_data_pipeline_spark.operators import runtime_filters as RF


def test_bloom_has_no_false_negatives(spark):
    keys = spark.range(0, 5000).select((F.col("id") * 7919).alias("k"))
    bits = RF.build_bloom_bits(keys, "k", n_bits=1 << 16, n_hashes=5)
    bloom = spark.createDataFrame([(bits,)], "b array<bigint>")
    missed = (
        keys.crossJoin(F.broadcast(bloom))
        .where(~RF.bloom_might_contain(F.col("k"), F.col("b"), 1 << 16, 5))
        .count()
    )
    assert missed == 0


def test_bloom_actually_prunes(spark):
    # Disjoint probe keys: nearly all should be filtered out (false
    # positive rate at n=1000, m=2^16, k=5 is well under 1%).
    dim = spark.range(0, 1000).select(F.col("id").alias("k"))
    bits = RF.build_bloom_bits(dim, "k", n_bits=1 << 16, n_hashes=5)
    bloom = spark.createDataFrame([(bits,)], "b array<bigint>")
    survivors = (
        spark.range(1_000_000, 1_010_000)
        .select(F.col("id").alias("k"))
        .crossJoin(F.broadcast(bloom))
        .where(RF.bloom_might_contain(F.col("k"), F.col("b"), 1 << 16, 5))
        .count()
    )
    assert survivors < 200  # 2% of 10k, generous vs expected <1%


def test_bloom_prefilter_join_is_exact(spark):
    fact = spark.range(0, 20000).select(
        (F.col("id") % 500).alias("fk"), F.col("id").alias("payload")
    )
    dim = (
        spark.range(0, 500)
        .where(F.col("id") % 7 == 0)
        .select(F.col("id").alias("dk"), (F.col("id") * 2).alias("attr"))
    )
    got = (
        RF.bloom_prefilter_join(fact, dim, "fk", "dk")
        .select("fk", "payload", "attr")
        .collect()
    )
    want = (
        fact.join(dim, fact["fk"] == dim["dk"])
        .select("fk", "payload", "attr")
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_bloom_probe_stays_jvm_side(spark):
    fact = spark.range(0, 100).select(F.col("id").alias("fk"))
    dim = spark.range(0, 10).select(F.col("id").alias("dk"))
    plan = RF.bloom_prefilter_join(fact, dim, "fk", "dk")._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
