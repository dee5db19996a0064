"""operators.incremental: the algebraic-merge property — folding a
fact table in as 1, 2, or many slices must give identical states, and
a three-way merge must equal the single-pass aggregate bit-for-bit."""

from __future__ import annotations

from pyspark.sql import functions as F

from wikipedia_data_pipeline_spark.operators import incremental as I


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_merge_of_slices_equals_full_aggregate(spark):
    facts = spark.range(0, 3000).select(
        "id",
        (F.col("id") % 7).alias("k"),
        ((F.col("id") % 100).cast("double") / 3).alias("v"),
    )
    full = I.finalize(I.partial_aggregate(facts, ["k"], F.col("v")), ["k"])
    slices = [
        I.partial_aggregate(
            facts.where(F.col("id") % 3 == i), ["k"], F.col("v")
        )
        for i in range(3)
    ]
    merged = I.finalize(I.merge_partials(slices, ["k"]), ["k"])
    assert _rows(merged) == _rows(full)


def test_merge_handles_keys_missing_from_a_slice(spark):
    a = spark.createDataFrame([("x", 1.0), ("x", 3.0)], "k string, v double")
    b = spark.createDataFrame([("y", 10.0)], "k string, v double")
    merged = I.finalize(
        I.merge_partials(
            [
                I.partial_aggregate(a, ["k"], F.col("v")),
                I.partial_aggregate(b, ["k"], F.col("v")),
            ],
            ["k"],
        ),
        ["k"],
    )
    got = {r.k: (r.n, r.total, r.avg, r.min_v, r.max_v) for r in merged.collect()}
    assert got == {"x": (2, 4.0, 2.0, 1.0, 3.0), "y": (1, 10.0, 10.0, 10.0, 10.0)}


def test_distinct_state_merge_equals_global_distinct(spark):
    facts = spark.range(0, 5000).select(
        (F.col("id") % 4).alias("k"), (F.col("id") % 97).alias("m"), "id"
    )
    # Overlapping members across slices must not double-count.
    slices = [
        I.distinct_state(facts.where(F.col("id") % 2 == i), ["k"], "m")
        for i in range(2)
    ]
    got = {
        r.k: r.n_distinct
        for r in I.merge_distinct_states(slices, ["k"], "m").collect()
    }
    want = {
        r.k: r.n
        for r in facts.groupBy("k")
        .agg(F.countDistinct("m").alias("n"))
        .collect()
    }
    assert got == want


def test_hll_state_merge_tracks_exact_within_tolerance(spark):
    facts = spark.range(0, 20000).select(
        (F.col("id") % 3).alias("k"), (F.col("id") % 1777).alias("m"), "id"
    )
    slices = [
        I.hll_distinct_state(facts.where(F.col("id") % 2 == i), ["k"], "m")
        for i in range(2)
    ]
    approx = {
        r.k: r.n_distinct_approx
        for r in I.merge_hll_states(slices, ["k"]).collect()
    }
    exact = {
        r.k: r.n
        for r in facts.groupBy("k")
        .agg(F.countDistinct("m").alias("n"))
        .collect()
    }
    for k, n in exact.items():
        assert abs(approx[k] - n) / n < 0.05, (k, approx[k], n)
