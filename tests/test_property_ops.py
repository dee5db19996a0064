"""Property tests for the round-5 exact operators: on arbitrary
generated inputs, the scale-shaped implementation must equal a naive
single-machine reimplementation — heavy hitters (Misra-Gries candidate
superset + exact recount vs a full histogram) and the token-budget cut
(hierarchical prefix sum vs a global cumulative walk)."""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from wikipedia_data_pipeline_spark.operators.profiling import (
    exact_heavy_hitters,
)
from wikipedia_data_pipeline_spark.operators.sampling import (
    shuffle_order,
    token_budget_cut,
)

# Small alphabet → heavy collisions; weights skew some items hot.
items_strategy = st.lists(
    st.sampled_from(["a", "b", "c", "d", "e", "f", "g", "h"]),
    min_size=1,
    max_size=400,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(items=items_strategy, den=st.sampled_from([3, 5, 10]))
def test_heavy_hitters_equal_full_histogram(spark, items, den):
    df = spark.createDataFrame(
        [(w,) for w in items], "word string"
    ).repartition(5)
    got = {
        r.word: r.n
        for r in exact_heavy_hitters(df, "word", 1, den).collect()
    }
    counts = Counter(items)
    n = len(items)
    want = {w: c for w, c in counts.items() if c * den >= n}
    assert got == want


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    n_docs=st.integers(min_value=1, max_value=120),
    budget=st.integers(min_value=0, max_value=1200),
)
def test_token_budget_cut_equals_global_walk(spark, n_docs, budget):
    docs = spark.createDataFrame(
        [(i, "t " * (i % 13 + 1)) for i in range(n_docs)],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.cum_tokens
        for r in token_budget_cut(docs, budget, shards=4).collect()
    }
    order = sorted(
        (r.shard_pos, r.shard, r.doc_id)
        for r in shuffle_order(docs, shards=4).collect()
    )
    want, cum = {}, 0
    for _, _, doc_id in order:
        cum += doc_id % 13 + 1
        if cum <= budget:
            want[doc_id] = cum
    assert got == want


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    keys=st.lists(
        st.integers(min_value=-(2**40), max_value=2**40),
        min_size=1,
        max_size=300,
        unique=True,
    ),
    n_hashes=st.sampled_from([1, 3, 5]),
)
def test_bloom_never_drops_a_build_key(spark, keys, n_hashes):
    from wikipedia_data_pipeline_spark.operators import runtime_filters as RF

    df = spark.createDataFrame([(k,) for k in keys], "k long").repartition(4)
    bits = RF.build_bloom_bits(df, "k", n_bits=1 << 14, n_hashes=n_hashes)
    bloom = spark.createDataFrame([(bits,)], "b array<bigint>")
    missed = (
        df.crossJoin(F.broadcast(bloom))
        .where(
            ~RF.bloom_might_contain(F.col("k"), F.col("b"), 1 << 14, n_hashes)
        )
        .count()
    )
    assert missed == 0
