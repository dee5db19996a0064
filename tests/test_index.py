"""operators.index: posting positions index real (normalized) words,
phrase join finds overlapping and repeated occurrences, missing-term
phrases return empty."""

from __future__ import annotations

from pyspark.sql import functions as F

from wikipedia_data_pipeline_spark.operators import index as IX


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_postings_positions_skip_punctuation_tokens(spark):
    docs = _docs(spark, [(1, "Hello, ... world 42 again")])
    # "..." and "42" normalize to empty -> dropped; positions re-pack.
    got = sorted(
        (r.word, r.pos)
        for r in IX.positional_postings(docs).collect()
    )
    assert got == [("again", 2), ("hello", 0), ("world", 1)]


def test_phrase_search_finds_all_occurrences(spark):
    docs = _docs(
        spark,
        [
            (1, "a b a b a b"),   # "a b a" occurs at 0 and 2 (overlap)
            (2, "a b"),            # too short for the 3-gram
            (3, "x a b a y"),      # occurs at 1
        ],
    )
    postings = IX.positional_postings(docs)
    got = sorted(
        (r.doc_id, r.start_pos)
        for r in IX.phrase_search(postings, ["a", "b", "a"]).collect()
    )
    assert got == [(1, 0), (1, 2), (3, 1)]


def test_phrase_search_missing_term_is_empty(spark):
    docs = _docs(spark, [(1, "a b c")])
    postings = IX.positional_postings(docs)
    assert IX.phrase_search(postings, ["a", "z"]).count() == 0


def test_phrase_filters_reach_the_scan(spark, tmp_path):
    # The per-term word filter must be pushed into the parquet scan of
    # a persisted index (PushedFilters), not applied post-scan only.
    docs = _docs(spark, [(1, "u v w")])
    path = str(tmp_path / "postings")
    IX.positional_postings(docs).write.parquet(path)
    postings = spark.read.parquet(path)
    plan = (
        IX.phrase_search(postings, ["u", "v"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan and "EqualTo(word," in plan
