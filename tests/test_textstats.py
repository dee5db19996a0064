from __future__ import annotations

from wikipedia_data_pipeline_spark.operators import textstats as TS


def docs(spark):
    rows = [
        (1, "the cat and the dog", "en"),
        (2, "el perro y la casa que", "es"),
        (3, "zzz qqq xxx", "zz"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang"])


def test_language_id(spark):
    out = {r.doc_id: r.predicted_lang for r in TS.language_id(docs(spark)).collect()}
    assert out[1] == "en"
    assert out[2] == "es"
    assert out[3] == "und"


def test_quality_scores(spark):
    q = {r.doc_id: r for r in TS.quality_scores(docs(spark)).collect()}
    r1 = q[1]
    assert r1.n_tokens == 5
    assert r1.n_distinct_tokens == 4
    assert r1.ttr == 4 / 5
    assert r1.stopword_ratio == 3 / 5  # the, and, the
    assert r1.avg_token_len == (3 + 3 + 3 + 3 + 3) / 5


def test_token_counts(spark):
    df = spark.createDataFrame([(1, "ab1 cd! x2", "en")], ["doc_id", "text", "lang"])
    r = TS.token_counts(df).first()
    assert r.ws_tokens == 3
    # ab|1, cd|!, x|2 → 6 BPE-ish pieces
    assert r.bpe_tokens == 6


def test_fingerprint_order_sensitive(spark):
    df = spark.createDataFrame(
        [(1, "a b c", "en"), (2, "c b a", "en"), (3, "a b c", "en")],
        ["doc_id", "text", "lang"],
    )
    fp = {r.doc_id: r.fingerprint for r in TS.fingerprints(df).collect()}
    assert fp[1] == fp[3]
    assert fp[1] != fp[2]  # same bag of words, different order
