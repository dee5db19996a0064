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


@given(
    st.integers(min_value=0, max_value=2**85 - 1),
)
@settings(max_examples=200, deadline=None)
def test_three_word_split_is_correctly_rounded(n):
    """The d3/d4 bridge in events_skew_kurtosis: for n < 2^85
    (hi*2^32+mid then stays under 2^53 and exact), the three-word
    recombination equals the correctly-rounded direct conversion
    (Python's float(int) is correctly rounded) — the engine's moment
    sums live far below that bound (s4 <= ~1e24 < 2^80). Past 2^85 the
    expression rounds twice; it stays deterministic and engine-
    identical (the oracle-equality requirement) but may differ from
    the single-rounded conversion by 1 ULP."""
    hi = n // 4294967296 // 4294967296
    mid = (n // 4294967296) % 4294967296
    lo = n % 4294967296
    recombined = (float(hi) * 4294967296.0 + float(mid)) * 4294967296.0 + float(lo)
    assert recombined == float(n)


@given(st.integers(min_value=2, max_value=12))
@settings(
    max_examples=3,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_band_signatures_partitioning_invariant(spark, n_parts):
    """LSH bucket keys must be identical under any partitioning (the
    numpy fold has no cross-row state, but this is the property 100 TB
    correctness rests on, so it is pinned)."""
    from wikipedia_data_pipeline_spark.operators.dedup import (
        band_signatures,
        hashed_shingles,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon zeta doc{i} eta theta") for i in range(40)],
        ["doc_id", "text"],
    )
    base = {
        r.doc_id: tuple(r.bh)
        for r in band_signatures(hashed_shingles(docs)).collect()
    }
    shuffled = {
        r.doc_id: tuple(r.bh)
        for r in band_signatures(
            hashed_shingles(docs.repartition(n_parts))
        ).collect()
    }
    assert base == shuffled


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    kvs=st.lists(
        st.tuples(
            st.integers(min_value=-50, max_value=50),      # tie-heavy key
            st.integers(min_value=-(10**6), max_value=10**6),
        ),
        min_size=1,
        max_size=300,
    ),
    nparts=st.sampled_from([1, 3, 8, 40]),  # 40 > row count → empty blocks
)
def test_ordered_scan_equals_single_window(spark, kvs, nparts):
    """On arbitrary inputs and ANY block count (including more blocks
    than rows), the hierarchical scan must equal the single-window
    reference bit-for-bit: rank, running sum, running max, exclusive
    running max, and ntile."""
    from pyspark.sql import Window

    from wikipedia_data_pipeline_spark.operators.ranks import (
        global_ntile,
        ordered_scan,
    )

    data = [(i, k, v) for i, (k, v) in enumerate(kvs)]
    df = spark.createDataFrame(data, ["id", "k", "v"]).repartition(5)
    order = [F.desc("k"), F.asc("id")]
    w = Window.orderBy(*order)
    wr = w.rowsBetween(Window.unboundedPreceding, 0)
    wx = w.rowsBetween(Window.unboundedPreceding, -1)
    ref = {
        r["id"]: (r["rnk"], r["rs"], r["rm"], r["xm"], r["t"])
        for r in df.select(
            "id",
            F.row_number().over(w).cast("long").alias("rnk"),
            F.sum("v").over(wr).alias("rs"),
            F.max("v").over(wr).alias("rm"),
            F.max("v").over(wx).alias("xm"),
            F.ntile(7).over(w).cast("long").alias("t"),
        ).collect()
    }
    scanned = ordered_scan(
        df,
        order,
        rank_col="rnk",
        running=[
            ("rs", "v", "sum"),
            ("rm", "v", "max"),
            ("xm", "v", "max", "exclusive"),
        ],
        num_partitions=nparts,
    )
    tiles = global_ntile(df, order, 7, "t", num_partitions=nparts)
    got = {
        r["id"]: (r["rnk"], r["rs"], r["rm"], r["xm"])
        for r in scanned.collect()
    }
    tgot = {r["id"]: r["t"] for r in tiles.collect()}
    assert {k: v + (tgot[k],) for k, v in got.items()} == ref
