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


def test_bpe_learns_classic_merges(spark):
    """The canonical BPE example: corpus 'low low low lower' must merge
    ('l','o') then ('lo','w') first — and encoding with those merges
    compresses 'low' to one token ['low'] after 3 merges."""
    from wikipedia_data_pipeline_spark.operators.textstats import (
        bpe_encode,
        bpe_train_merges,
    )

    docs = spark.createDataFrame(
        [(1, "low low low"), (2, "low lower")], "doc_id long, text string"
    )
    merges = bpe_train_merges(docs, n_merges=3)
    assert merges[0] == ("l", "o")
    assert merges[1] == ("lo", "w")
    # third round ties (low,e) with (e,r) at count 1; the deterministic
    # lexicographic tie-break picks ('e','r')
    assert merges[2] == ("e", "r")
    enc = {r.doc_id: r for r in bpe_encode(docs, merges).collect()}
    # doc 1: three 'low' words, each a single merged token
    assert enc[1].n_bpe_tokens == 3 and enc[1].n_words == 3
    assert enc[1].tokens_per_word == 1.0
    # doc 2: 'low' (1 token) + 'lower' -> ['low','er'] (2 tokens)
    assert enc[2].n_bpe_tokens == 3 and enc[2].n_words == 2


def test_bpe_encode_zero_merges_is_char_count(spark):
    from wikipedia_data_pipeline_spark.operators.textstats import bpe_encode

    docs = spark.createDataFrame([(1, "ab cde")], "doc_id long, text string")
    r = bpe_encode(docs, []).first()
    assert r.n_bpe_tokens == 5 and r.n_words == 2


def test_bpe_vocab_cap_bounds_driver_dict(spark):
    """Adversarial corpus: many unique junk tokens + a frequent real
    word. With max_vocab smaller than the junk vocabulary, training
    still learns the frequent word's merges — the cap keeps the
    collected dict bounded without distorting head statistics."""
    from wikipedia_data_pipeline_spark.operators.textstats import (
        bpe_train_merges,
    )

    junk = " ".join(f"zz{i}q" for i in range(500))
    docs = spark.createDataFrame(
        [(1, "low " * 20), (2, junk)], "doc_id long, text string"
    )
    merges = bpe_train_merges(docs, n_merges=2, max_vocab=10)
    # top-10 cut = 'low' (count 20) + 9 junk singletons; 'low' pairs
    # (count 20) dominate the junk's (z,z) pairs (count 9)
    assert merges[0] == ("l", "o")
    assert merges[1] == ("lo", "w")


def test_trigram_commonness_counts_and_ratios(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d"),       # trigrams: "a b c", "b c d"
            (2, "a b c"),         # trigram:  "a b c"
            (3, "x y z"),         # trigram:  "x y z" (unique)
            (4, "ab"),            # too short: no trigrams, no row
        ],
        "doc_id long, text string",
    )
    from wikipedia_data_pipeline_spark.operators.textstats import trigram_commonness

    got = {r.doc_id: r for r in trigram_commonness(docs, min_df=2).collect()}
    assert set(got) == {1, 2, 3}
    # "a b c" appears in docs 1 and 2 -> df=2 (common); "b c d", "x y z" df=1.
    assert (got[1].n_trigrams, got[1].n_common) == (2, 1)
    assert got[1].common_frac == 0.5 and got[1].avg_df == 1.5
    assert (got[2].n_trigrams, got[2].n_common) == (1, 1)
    assert (got[3].n_trigrams, got[3].n_common) == (1, 0)


def test_collocations_lift_exact_on_constructed_corpus(spark):
    from wikipedia_data_pipeline_spark.operators.textstats import collocations

    # "strong tea" always co-occurs; "the cat"/"the dog" dilute "the".
    docs = spark.createDataFrame(
        [(1, "strong tea"), (2, "strong tea"), (3, "the cat"), (4, "the dog")],
        "doc_id long, text string",
    )
    got = {r.ngram: r for r in collocations(docs, top_k=10).collect()}
    # N=8 tokens; n(strong tea)=2, n(strong)=2, n(tea)=2 -> lift 2*8/4 = 4.
    assert got["strong tea"].lift == 4.0
    # n(the cat)=1, n(the)=2, n(cat)=1 -> lift 8/2 = 4. Tie broken by name.
    assert got["the cat"].lift == 4.0
    ordered = sorted(got.values(), key=lambda r: (-r.lift, r.ngram))
    assert [r.ngram for r in ordered][:3] == ["strong tea", "the cat", "the dog"]


def test_compression_ratio_separates_repetitive_text(spark):
    from wikipedia_data_pipeline_spark.operators.textstats import (
        compression_ratio,
    )
    import zlib

    repetitive = "spam " * 200
    varied = " ".join(f"w{i}x{i*7%13}" for i in range(200))
    docs = spark.createDataFrame(
        [(1, repetitive), (2, varied), (3, "")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in compression_ratio(docs).collect()}
    # Exact: the UDF must equal a direct zlib call at the same level.
    assert got[1].n_compressed == len(zlib.compress(repetitive.encode(), 6))
    assert got[2].n_compressed == len(zlib.compress(varied.encode(), 6))
    assert got[1].compression_ratio < 0.05 < got[2].compression_ratio
    assert got[3].compression_ratio is None


def test_chunk_documents_overlap_and_tail(spark):
    from wikipedia_data_pipeline_spark.operators.text import chunk_documents

    # 10 tokens, chunk=4, stride=3 -> starts 0,3,6,9 (letter-only
    # words: the chunker normalizes tokens like the rest of the
    # pipeline, stripping digits).
    words = [chr(ord("a") + i) * 2 for i in range(10)]  # aa bb cc ...
    docs = spark.createDataFrame(
        [(1, " ".join(words)), (2, "")], "doc_id long, text string"
    )
    got = {
        r.chunk_id: (r.chunk_start, r.n_chunk_tokens, r.chunk_text)
        for r in chunk_documents(docs, chunk_tokens=4, stride=3).collect()
    }
    assert got == {
        0: (0, 4, "aa bb cc dd"),
        1: (3, 4, "dd ee ff gg"),     # overlaps dd
        2: (6, 4, "gg hh ii jj"),
        3: (9, 1, "jj"),               # short tail chunk
    }


def test_winnowing_guarantee_and_selectivity(spark):
    shared = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, "intro words here first " + shared + " closing remarks", "en"),
        (2, "totally different opening text " + shared + " plus a tail", "en"),
        (3, "short doc", "en"),  # < w + k - 1 tokens -> no fingerprints
        (4, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "en"),
    ]
    d = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    fp = TS.winnow_fingerprints(d, k=4, w=5).collect()
    by = {}
    for r in fp:
        by.setdefault(r.doc_id, set()).add(r.fingerprint)
    # winnowing guarantee: a shared run of >= w + k - 1 = 8 tokens
    # always yields at least one shared fingerprint
    assert by[1] & by[2]
    # no fingerprints for a doc below the window threshold
    assert 3 not in by
    # unrelated text shares nothing
    assert not (by.get(4, set()) & by[1])
    # selectivity: far fewer fingerprints than grams (~2/(w+1) of them)
    n_grams_doc4 = 10 - 4 + 1
    assert len(by[4]) < n_grams_doc4
    # determinism under repartitioning
    again = {
        (r.doc_id, r.fingerprint)
        for r in TS.winnow_fingerprints(d.repartition(7), k=4, w=5).collect()
    }
    assert again == {(r.doc_id, r.fingerprint) for r in fp}


def test_winnowing_rejects_internal_name_collisions(spark):
    import pytest

    d = spark.createDataFrame(
        [(1, "some text here", "x")], ["doc_id", "text", "toks"]
    )
    with pytest.raises(ValueError, match="internal working names"):
        TS.winnow_fingerprints(d, keep_cols=("toks",))


def test_hashed_shingles_quotes_odd_column_names(spark):
    from wikipedia_data_pipeline_spark.operators import dedup as D

    d = spark.createDataFrame(
        [(1, "a b c d e f")], ["doc_id", "the text"]
    )
    out = D.hashed_shingles(d, n=3, text_col="the text").collect()
    assert len(out) == 1 and len(out[0].hsh) == 4
