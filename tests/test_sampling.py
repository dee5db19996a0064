"""Unit tests for training-data sampling / packing / decontamination /
repetition operators (operators.sampling, operators.textstats)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from wikipedia_data_pipeline_spark.operators import sampling as S
from wikipedia_data_pipeline_spark.operators import textstats as TS


def docs(spark, n=40):
    rows = [
        (i, f"w{i % 7} common text tail {'x ' * (i % 5)}".strip(),
         ["en", "es", "de"][i % 3], f"src{i % 4}")
        for i in range(n)
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])


def test_split_assignment_deterministic_and_partition_invariant(spark):
    d = docs(spark)
    a = {r.doc_id: r.split for r in S.assign_splits(d).collect()}
    b = {
        r.doc_id: r.split
        for r in S.assign_splits(d.repartition(13, "lang")).collect()
    }
    assert a == b  # hash-derived: layout must not change the split
    assert set(a.values()) <= {"train", "val", "test"}


def test_stratified_sample_exact_quotas(spark):
    d = docs(spark, n=60)
    out = S.stratified_sample(d, group_col="lang", fraction=0.25).collect()
    sizes = d.groupBy("lang").count().collect()
    want = {r.lang: math.ceil(r["count"] * 0.25) for r in sizes}
    got: dict[str, int] = {}
    for r in out:
        got[r.lang] = got.get(r.lang, 0) + 1
    assert got == want


def test_weighted_mixture_quotas(spark):
    d = docs(spark, n=80)
    out = S.weighted_mixture(
        d, weights={"src0": 0.5, "src1": 0.25}, default_weight=0.1
    )
    sizes = {r.source: r["count"] for r in d.groupBy("source").count().collect()}
    got: dict[str, int] = {}
    for r in out.collect():
        got[r.source] = got.get(r.source, 0) + 1
    assert got["src0"] == math.ceil(sizes["src0"] * 0.5)
    assert got["src1"] == math.ceil(sizes["src1"] * 0.25)
    assert got["src2"] == math.ceil(sizes["src2"] * 0.1)


def test_pack_sequences_boundary_semantics(spark):
    # 3 docs of 4 tokens each, budget 6: doc B starts at cumsum 4 (<6)
    # so it straddles the boundary and stays in pack 0; doc C starts
    # at 8 -> pack 1.
    rows = [
        (1, "a b c d", "en"),
        (2, "e f g h", "en"),
        (3, "i j k l", "en"),
    ]
    d = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = {r.doc_id: r.pack_id for r in S.pack_sequences(d, token_budget=6).collect()}
    assert out == {1: 0, 2: 0, 3: 1}


def test_repetition_stats_known_values(spark):
    rows = [
        # tokens: the the the cat -> top frac 3/4; trigrams:
        # "the the the", "the the cat" -> all unique -> dup 0
        (1, "the the the cat", "en"),
        # tokens: a b a b a b -> top 3/6; trigrams: "a b a" x2,
        # "b a b" x2 -> 4 occurrences, 0 singles -> dup 1.0
        (2, "a b a b a b", "en"),
        # under 3 tokens -> no trigrams -> dup NULL
        (3, "xy zq", "en"),
    ]
    d = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = {r.doc_id: r for r in TS.repetition_stats(d).collect()}
    assert out[1].top_token_frac == 3 / 4
    assert out[1].dup_trigram_frac == 0.0
    assert out[2].top_token_frac == 3 / 6
    assert out[2].dup_trigram_frac == 1.0
    assert out[3].dup_trigram_frac is None


def test_decontaminate_flags_overlap_only(spark):
    rows = [
        (0, "alpha beta gamma delta tail zero", "en"),   # benchmark (id%97==0)
        (5, "alpha beta gamma delta other words", "en"),  # shares 4-gram
        (6, "no overlap here at all folks", "en"),
    ]
    d = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = {r.doc_id: r.n_hit_grams for r in TS.decontaminate(d, 97, n=4).collect()}
    assert out == {5: 1}


def test_det_hash_matches_sql_twin(spark):
    d = docs(spark, n=25)
    sql = S.SQL_DET_HASH.format(col="doc_id")
    got = d.select("doc_id", S.det_hash("doc_id").alias("h")).collect()
    want = {r.doc_id: r.h for r in d.select("doc_id", F.expr(sql).alias("h")).collect()}
    for r in got:
        assert want[r.doc_id] == r.h


def test_shuffle_order_is_seeded_permutation(spark):
    from wikipedia_data_pipeline_spark.operators.sampling import shuffle_order

    docs = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    a = shuffle_order(docs, seed=0).collect()
    # every (shard, shard_pos) is unique and positions are 1..n per shard
    assert len({(r.shard, r.shard_pos) for r in a}) == 200
    by_shard = {}
    for r in a:
        by_shard.setdefault(r.shard, []).append(r.shard_pos)
    for positions in by_shard.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))
    # deterministic across runs, different under a different seed
    b = shuffle_order(docs, seed=0).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    c = {r.doc_id: (r.shard, r.shard_pos) for r in shuffle_order(docs, seed=1).collect()}
    a_map = {r.doc_id: (r.shard, r.shard_pos) for r in a}
    assert any(a_map[d] != c[d] for d in a_map)  # order actually moved


def test_token_budget_cut_matches_naive_global_prefix(spark):
    from wikipedia_data_pipeline_spark.operators.sampling import (
        shuffle_order,
        token_budget_cut,
    )

    docs = spark.createDataFrame(
        [(i, "w " * (i % 17 + 1)) for i in range(300)],
        "doc_id long, text string",
    )
    budget = 800
    got = {
        r.doc_id: r.cum_tokens
        for r in token_budget_cut(docs, budget, shards=8).collect()
    }
    # Naive check: global order (shard_pos, shard), running sum, cut.
    order = sorted(
        (
            (r.shard_pos, r.shard, r.doc_id)
            for r in shuffle_order(docs, shards=8).collect()
        )
    )
    toks = {i: i % 17 + 1 for i in range(300)}
    want, cum = {}, 0
    for _, _, doc_id in order:
        cum += toks[doc_id]
        if cum <= budget:
            want[doc_id] = cum
    assert got == want


def test_token_mask_deterministic_and_consistent(spark):
    from wikipedia_data_pipeline_spark.operators.sampling import (
        HASH_MOD,
        KNUTH,
        PRE_MOD,
        token_mask,
    )

    docs = spark.createDataFrame(
        [(7, "aa bb cc dd ee ff gg hh ii jj")], "doc_id long, text string"
    )
    r = token_mask(docs, rate_den=3).collect()[0]
    words = "aa bb cc dd ee ff gg hh ii jj".split()
    expect_mask = [
        ((((7 % PRE_MOD) + i) % PRE_MOD) * KNUTH + 12345) % HASH_MOD % 3 == 0
        for i in range(10)
    ]
    want_text = " ".join(
        "<MASK>" if m else w for w, m in zip(words, expect_mask)
    )
    want_targets = " ".join(w for w, m in zip(words, expect_mask) if m)
    assert r.masked_text == want_text
    assert r.targets == want_targets
    assert r.n_masked == sum(expect_mask) and r.n_tokens == 10
    # Re-running under a different partitioning reproduces the mask.
    r2 = token_mask(docs.repartition(8), rate_den=3).collect()[0]
    assert (r2.masked_text, r2.targets) == (r.masked_text, r.targets)


def test_negative_samples_valid_and_reproducible(spark):
    from wikipedia_data_pipeline_spark.operators.sampling import (
        negative_samples,
    )

    # Sparse ids (gaps) + small table: negatives must all be existing
    # ids, never the anchor, and identical across partitionings.
    docs = spark.createDataFrame(
        [(i,) for i in [0, 3, 5, 9, 12, 20]], "doc_id long"
    )
    a = sorted(map(tuple, negative_samples(docs, k=3).collect()))
    ids = {0, 3, 5, 9, 12, 20}
    assert a, "expected some negatives"
    for anchor, j, neg in a:
        assert neg in ids and neg != anchor and 0 <= j < 3
    b = sorted(map(tuple, negative_samples(docs.repartition(7), k=3).collect()))
    assert a == b
