"""Dedup operators: all three near-dup strategies must agree with the
exact brute-force result; exact dedup groups identical content."""

from __future__ import annotations

from wikipedia_data_pipeline_spark.operators import dedup as D


def corpus(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = "the quick brown fox jumps over the lazy dog again and again tonight"
    other = "completely different text with nothing shared at all in any gram"
    rows = [
        (1, base),
        (2, near),       # near-dup of 1
        (3, other),
        (4, base),       # exact dup of 1
        (5, "tiny doc"),  # < 3 tokens → empty shingles
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def pairs(df):
    return {(r.doc_a, r.doc_b) for r in df.collect()}


def test_exact_duplicates(spark):
    out = {r.doc_id_kept: r.n_copies for r in D.exact_duplicates(corpus(spark)).collect()}
    assert out[1] == 2  # docs 1 and 4 share content, rep = min id
    assert out[2] == 1 and out[3] == 1 and out[5] == 1


def test_shingles_small_doc_empty(spark):
    sh = {r.doc_id: r.shingles for r in D.shingles(corpus(spark)).collect()}
    assert sh[5] == []
    assert "the quick brown" in sh[1]


def test_all_neardup_strategies_agree(spark):
    docs = corpus(spark)
    bf = pairs(D.brute_force_pairs(docs, 0.5))
    assert (1, 2) in bf and (1, 4) in bf and (2, 4) in bf
    assert not any(3 in p or 5 in p for p in bf)
    assert pairs(D.minhash_lsh_pairs(docs, 0.5)) == bf
    assert pairs(D.simhash_pairs(docs, 0.5)) == bf
    # Prefix filtering is lossless by theorem, not probability: exact
    # agreement, including at a higher threshold.
    assert pairs(D.prefix_filter_pairs(docs, 0.5)) == bf
    assert pairs(D.prefix_filter_pairs(docs, 0.9)) == pairs(
        D.brute_force_pairs(docs, 0.9)
    )


def test_jaccard_values_exact(spark):
    docs = corpus(spark)
    j = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in D.brute_force_pairs(docs, 0.0).collect()
    }
    assert j[(1, 4)] == 1.0
    # 13 tokens → 11 shingles each; differ in last word → 10 shared,
    # union 12
    assert abs(j[(1, 2)] - 10 / 12) < 1e-12


def test_near_dup_clusters_chain_and_singleton(spark):
    """Min-label propagation crosses multi-hop chains (a-b, b-c one
    cluster) and leaves singletons as their own representative."""
    from wikipedia_data_pipeline_spark.operators.dedup import near_dup_clusters

    docs = spark.createDataFrame([(i,) for i in (1, 2, 3, 4, 9)], "doc_id long")
    pairs = spark.createDataFrame([(2, 3), (3, 4), (1, 9)], "doc_a long, doc_b long")
    got = {r.doc_id: (r.cluster_id, r.keep) for r in near_dup_clusters(docs, pairs).collect()}
    assert got == {
        1: (1, True), 9: (1, False),
        2: (2, True), 3: (2, False), 4: (2, False),
    }


def test_duplicate_span_stats_flags_cross_doc_spans_only(spark):
    from wikipedia_data_pipeline_spark.operators.dedup import (
        duplicate_span_stats,
    )

    shared = "one two three four five six seven eight"  # exactly 8 tokens
    docs = spark.createDataFrame(
        [
            (1, shared + " tail1 tail2"),
            (2, "prefix " + shared),
            (3, "totally unrelated words in this other document here now"),
            (4, "short text"),  # < 8 tokens: no spans, excluded
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in duplicate_span_stats(docs, 8).collect()}
    assert set(out) == {1, 2, 3}
    # doc1: 3 spans (10 tokens), exactly one (the shared 8-gram) is dup
    assert out[1].n_spans == 3 and out[1].n_dup_spans == 1
    # doc2: 2 spans, the shared one is dup
    assert out[2].n_spans == 2 and out[2].n_dup_spans == 1
    assert out[3].n_dup_spans == 0 and out[3].dup_ratio == 0.0
    assert abs(out[2].dup_ratio - 0.5) < 1e-15


def test_duplicate_spans_extract_maximal_runs(spark):
    from wikipedia_data_pipeline_spark.operators.dedup import (
        duplicate_spans_extract,
    )

    shared = "one two three four five six seven eight nine"  # 9 tokens
    docs = spark.createDataFrame(
        [
            (1, shared + " tail1 tail2"),
            (2, "prefix " + shared),
            (3, "totally unrelated words in this other document here now"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.span_start): r
        for r in duplicate_spans_extract(docs, 8).collect()
    }
    # doc1: grams at pos 1 and 2 are the duplicated ones -> ONE maximal
    # run covering tokens 1..9 (2 + 8 - 1); doc2 same run shifted by 1
    assert set(got) == {(1, 1), (2, 2)}
    assert got[(1, 1)].span_len_tokens == 9
    assert got[(1, 1)].span_text == shared
    assert got[(2, 2)].span_len_tokens == 9
    assert got[(2, 2)].span_text == shared


def test_duplicate_spans_extract_matches_python(spark, sf_dir):
    """Brute-force replay on the real corpus: duplicated positions from
    raw gram strings, maximal runs, sliced text — row-identical."""
    import duckdb

    from wikipedia_data_pipeline_spark.operators.dedup import (
        duplicate_spans_extract,
    )
    from wikipedia_data_pipeline_spark.sources.tables import load_table

    n = 8
    toks = {
        d: t.split(" ")
        for d, t in duckdb.sql(
            f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet')"
        ).fetchall()
    }
    gram_docs: dict[str, set[int]] = {}
    for d, t in toks.items():
        for i in range(len(t) - n + 1):
            gram_docs.setdefault(" ".join(t[i : i + n]), set()).add(d)
    want = set()
    for d, t in toks.items():
        dup = [
            i
            for i in range(len(t) - n + 1)
            if len(gram_docs[" ".join(t[i : i + n])]) >= 2
        ]
        run_start = None
        prev = None
        for i in dup + [None]:
            if i is not None and prev is not None and i == prev + 1:
                prev = i
                continue
            if run_start is not None:
                L = prev - run_start + n
                want.add(
                    (d, run_start + 1, L, " ".join(t[run_start:run_start + L]))
                )
            run_start, prev = i, i
    got = {
        (r.doc_id, r.span_start, r.span_len_tokens, r.span_text)
        for r in duplicate_spans_extract(
            load_table(spark, sf_dir, "documents"), n
        ).collect()
    }
    assert got == want


def test_containment_catches_subset_docs(spark):
    host = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    quoted = "gamma delta epsilon zeta eta"  # fully inside host
    rows = [(1, host), (2, quoted), (3, "unrelated words only here now")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r.doc_sub, r.doc_super): r.containment
        for r in D.containment_pairs(df, 0.9).collect()
    }
    # quoted ⊂ host: containment(2→1) = 1.0; the reverse direction is
    # small (host is much bigger) and must NOT appear.
    assert got == {(2, 1): 1.0}
    # Symmetric Jaccard at the same strictness misses it entirely.
    assert not {
        (r.doc_a, r.doc_b)
        for r in D.brute_force_pairs(df, 0.9).collect()
    }


def test_minhash_pairs_on_duplicate_heavy_corpus(spark):
    """Exact-duplicate collapse must not change the pair relation: on a
    corpus where texts repeat many times (the spam-flood shape), the
    LSH pair set with jaccard values must equal brute force exactly —
    including the all-1.0 within-group pairs and the cross-group
    near-dup products."""
    from wikipedia_data_pipeline_spark.operators.dedup import (
        brute_force_pairs,
        minhash_lsh_pairs,
    )

    base = [
        "the quick brown fox jumps over the lazy dog tonight again",
        "the quick brown fox jumps over the lazy dog tonight today",
        "completely different text about distributed query processing",
        "tiny",  # <3 tokens → empty shingle set, must never pair
    ]
    rows = []
    did = 0
    for copy in range(6):
        for t in base:
            rows.append((did, t))
            did += 1
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in minhash_lsh_pairs(docs, 0.5).collect()
    }
    ref = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in brute_force_pairs(docs, 0.5).collect()
    }
    assert got == ref
    # sanity on the shape: 6 copies of each of 2 near-dup texts →
    # within-group C(6,2)*3 non-empty groups + cross products 6*6
    assert sum(1 for v in got.values() if v == 1.0) == 3 * 15
    assert sum(1 for v in got.values() if v < 1.0) == 36


def test_component_edges_same_components_group_linear(spark):
    """minhash_lsh_component_edges (r13): identical node set and
    connected components as the quadratic pair contract, with a
    group-linear edge count. Corpus crafted so every class fires:
    a multi-member exact-dup group with a verified cross pair, a
    singleton with a cross pair, an isolated doc, an empty-shingle
    duplicate GROUP (must vanish from both edge forms), and an
    untouched tiny doc."""
    from wikipedia_data_pipeline_spark.operators import graph as G

    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = "the quick brown fox jumps over the lazy dog again and again tonight"
    other = "completely different text with nothing shared at all in any gram"
    rows = [
        (1, base),
        (2, near),        # near-dup of group {1, 4, 6}
        (3, other),       # isolated: no pairs either way
        (4, base),        # exact dup of 1
        (6, base),        # exact dup of 1 (group size 3)
        (5, "tiny doc"),  # < 3 tokens -> empty shingles, singleton
        (7, "no sh"),     # empty shingles, duplicate group {7, 8}:
        (8, "no sh"),     #   jaccard(∅, ∅) = 0 -> NO within pairs and
                          #   NO star -> absent from components
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    def comps(edges):
        cc = G.connected_components(edges, src="doc_a", dst="doc_b")
        out = {(r.node, r.comp) for r in cc.collect()}
        cc.unpersist()
        return out

    quad = D.minhash_lsh_pairs(docs, 0.5).select("doc_a", "doc_b")
    star = D.minhash_lsh_component_edges(docs, 0.5)
    assert comps(quad) == comps(star) == {(1, 1), (2, 1), (4, 1), (6, 1)}
    # group-linear: {1,4,6} contributes 2 star edges, not C(3,2)=3
    # within pairs, and the 1~2 relation is one rep edge, not 3 cross
    # expansions
    assert star.count() == 3 < quad.count() == 6
