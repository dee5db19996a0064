"""Unit tests for the advanced-operator additions: n-grams, IVF ANN,
multimodal audio/video stubs, sliding windows, range join, and the
streaming dedup-within-watermark."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wikipedia_data_pipeline_spark.operators import multimodal as MM
from wikipedia_data_pipeline_spark.operators import similarity as S
from wikipedia_data_pipeline_spark.operators.text import ngrams
from wikipedia_data_pipeline_spark.queries.advanced_queries import (
    events_sliding_window,
    join_range_periods,
)
from wikipedia_data_pipeline_spark.streaming import pipeline as P


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_ngrams_order_and_normalization(spark):
    df = _docs(spark, [(1, "The quick, brown FOX jumps")])
    out = [r.ngram for r in ngrams(df, n=3).collect()]
    assert out == ["the quick brown", "quick brown fox", "brown fox jumps"]


def test_ngrams_short_doc_empty(spark):
    df = _docs(spark, [(1, "two words"), (2, "a b c")])
    out = ngrams(df, n=3).collect()
    assert [(r.doc_id, r.ngram) for r in out] == [(2, "a b c")]


def test_ngrams_skips_empty_tokens(spark):
    # "..." normalizes to empty and must not break adjacency
    df = _docs(spark, [(1, "alpha ... beta gamma")])
    out = [r.ngram for r in ngrams(df, n=3).collect()]
    assert out == ["alpha beta gamma"]


def test_ivf_returns_exact_cosines_over_subset(spark, sf_dir):
    """IVF candidates are a subset of the corpus; scores must equal the
    brute-force cosine for the same (query, candidate) pairs."""
    from wikipedia_data_pipeline_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    exact = {
        (r.query_id, r.vec_id): r.cos
        for r in S.cosine_topk(emb, [0, 1], k=10_000).collect()
    }
    approx = S.ann_ivf_topk(emb, [0, 1], k=5).collect()
    assert len(approx) > 0
    for r in approx:
        assert abs(exact[(r.query_id, r.vec_id)] - r.cos) < 1e-12


def test_audio_meta_deterministic(spark):
    docs = _docs(spark, [(7, "abcdef")])  # 6 bytes
    row = MM.decode_audio_meta(MM.attach_binary_payload(docs)).first()
    assert row.n_bytes == 6
    assert row.sample_rate == 8000  # 6 % 3 == 0
    assert row.n_samples == 24
    assert row.duration_us == 24 * 1_000_000 // 8000


def test_video_framesample_expansion(spark):
    docs = _docs(spark, [(7, "x" * 9)])  # 9 bytes → n_frames = 10
    rows = (
        MM.sample_video_frames(MM.attach_binary_payload(docs))
        .orderBy("frame_idx")
        .collect()
    )
    assert [r.frame_idx for r in rows] == [0, 4, 8]
    assert all(r.n_frames == 10 for r in rows)
    assert rows[1].frame_offset == 4 * (9 // 10)


def test_sliding_window_double_counts(spark, sf_dir):
    """Every event lands in exactly 2 overlapping 1h/30min windows."""
    from wikipedia_data_pipeline_spark.sources.tables import load_table

    n_events = load_table(spark, sf_dir, "events").count()
    total = (
        events_sliding_window(spark, sf_dir)
        .agg(F.sum("n_events").alias("s"))
        .first()
        .s
    )
    assert total == 2 * n_events


def test_range_join_covers_window(spark, sf_dir):
    """Period counts must sum to the orders inside the covered range."""
    from wikipedia_data_pipeline_spark.sources.tables import load_table

    o = load_table(spark, sf_dir, "orders")
    in_range = o.filter(
        (F.col("o_orderdate") >= "1995-07-01")
        & (F.col("o_orderdate") < "1998-01-01")
    ).count()
    per_period = join_range_periods(spark, sf_dir)
    assert per_period.agg(F.sum("n_orders").alias("s")).first().s == in_range


def test_merge_upsert_updates_and_inserts(spark):
    """Update-wins on matched keys, plain insert on unmatched ones."""
    from wikipedia_data_pipeline_spark.operators.upsert import merge_upsert

    base = spark.createDataFrame(
        [(1, "a"), (2, "b")], "id bigint, val string"
    )
    updates = spark.createDataFrame(
        [(2, "B"), (3, "C")], "id bigint, val string"
    )
    got = sorted(map(tuple, merge_upsert(base, updates, ["id"]).collect()))
    assert got == [(1, "a"), (2, "B"), (3, "C")]


def test_salted_join_equals_plain_join(spark, sf_dir):
    """Salting must be a pure physical rewrite: identical rows out."""
    from wikipedia_data_pipeline_spark.operators.skew import salted_join
    from wikipedia_data_pipeline_spark.sources.tables import load_table

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    salted = salted_join(o, c, "o_custkey", "c_custkey", num_salts=8)
    plain = o.join(c, o.o_custkey == c.c_custkey)
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_streaming_dedup_watermark_roundtrip(spark, sf_dir):
    """Self-unioned stream deduped on event_id == the original table."""
    from wikipedia_data_pipeline_spark.sources.tables import load_table

    out = P.run_dedup_within_watermark(spark, sf_dir)
    n = load_table(spark, sf_dir, "events").count()
    assert out.count() == n
    assert out.select("event_id").distinct().count() == n


def test_salted_join_rejects_small_side_preserving_hows(spark):
    from wikipedia_data_pipeline_spark.operators.skew import salted_join

    a = spark.range(10).withColumnRenamed("id", "k")
    b = spark.range(3).withColumnRenamed("id", "j")
    for how in ("right", "full", "full_outer", "outer"):
        with pytest.raises(ValueError):
            salted_join(a, b, "k", "j", how=how)


def test_salted_join_left_preserves_unmatched_and_matches_plain(spark):
    from wikipedia_data_pipeline_spark.operators.skew import salted_join

    big = spark.createDataFrame(
        [(i % 3, f"p{i}") for i in range(60)], "k long, payload string"
    )
    small = spark.createDataFrame([(0, "x"), (1, "y")], "j long, dim string")
    salted = salted_join(big, small, "k", "j", num_salts=8, how="left")
    plain = big.join(small, big.k == small.j, "left")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_salt_assignment_is_stable(spark):
    """Salt derives from row content (xxhash64 of all columns), so two
    independent evaluations assign identical salts (ADVICE round-1)."""
    from pyspark.sql import functions as F

    big = spark.createDataFrame(
        [(i % 3, f"p{i}") for i in range(40)], "k long, payload string"
    )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(8)).cast("int")
    run1 = sorted(map(tuple, big.withColumn("_salt", salt).collect()))
    run2 = sorted(map(tuple, big.repartition(7).withColumn("_salt", salt).collect()))
    assert run1 == run2


def test_merge_upsert_duplicate_update_keys_deterministic(spark):
    """Dup-key CDC batch: order_by picks the latest change; without it a
    stable content hash still makes the winner run-independent."""
    from wikipedia_data_pipeline_spark.operators.upsert import merge_upsert

    base = spark.createDataFrame([(1, "old", 0)], "k long, v string, seq long")
    ups = spark.createDataFrame(
        [(1, "first", 1), (1, "second", 2), (2, "ins", 9)],
        "k long, v string, seq long",
    )
    with_seq = {
        (r.k, r.v) for r in merge_upsert(base, ups, ["k"], order_by=["seq"]).collect()
    }
    assert with_seq == {(1, "second"), (2, "ins")}
    no_seq_1 = sorted(map(tuple, merge_upsert(base, ups, ["k"]).collect()))
    no_seq_2 = sorted(
        map(tuple, merge_upsert(base.repartition(5), ups.repartition(3), ["k"]).collect())
    )
    assert no_seq_1 == no_seq_2
