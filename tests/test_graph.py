"""Unit tests for operators.graph (fixed-point PageRank, degrees)."""

from __future__ import annotations

from wikipedia_data_pipeline_spark.operators import graph as G


def _reference_pagerank(edges, iterations, scale=1_000_000, damping_pct=85):
    """10-line single-threaded reference of the exact integer spec."""
    nodes = {n for e in edges for n in e}
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    base = scale * (100 - damping_pct) // 100
    rank = {n: scale for n in nodes}
    for _ in range(iterations):
        mass = {}
        for s, d in edges:
            mass[d] = mass.get(d, 0) + rank[s] // outdeg[s]
        rank = {
            n: base + (damping_pct * mass[n]) // 100 if n in mass else base
            for n in nodes
        }
    return rank


EDGES = [
    ("a", "b"),
    ("a", "c"),
    ("b", "c"),
    ("c", "a"),
    ("d", "c"),  # d is a source-only node; b,a,c form a cycle
]


def test_pagerank_matches_reference(spark):
    df = spark.createDataFrame(EDGES, ["src", "dst"])
    got = {
        r["node"]: r["rank"]
        for r in G.pagerank_fixed_point(df, iterations=4).collect()
    }
    assert got == _reference_pagerank(EDGES, iterations=4)


def test_pagerank_dangling_and_sourceonly_nodes(spark):
    df = spark.createDataFrame(EDGES, ["src", "dst"])
    got = {
        r["node"]: r["rank"]
        for r in G.pagerank_fixed_point(df, iterations=1).collect()
    }
    # d has no in-edges: holds the base rank exactly.
    assert got["d"] == 150_000
    # After one round c collects from three full-rank in-neighbors
    # (500000 + 1000000 + 1000000 scaled units): strictly the largest.
    assert got["c"] == 150_000 + (85 * 2_500_000) // 100
    assert got["c"] == max(got.values())


def test_degree_profile(spark):
    df = spark.createDataFrame(EDGES, ["src", "dst"])
    got = {
        r["node"]: (r["out_degree"], r["in_degree"])
        for r in G.degree_profile(df).collect()
    }
    assert got == {"a": (2, 1), "b": (1, 1), "c": (1, 3), "d": (1, 0)}


def _reference_lpa(edges, iterations):
    und = set()
    for s, d in edges:
        und.add((s, d))
        und.add((d, s))
    nodes = {n for e in und for n in e}
    label = {n: n for n in nodes}
    for _ in range(iterations):
        new = {}
        for v in nodes:
            counts = {}
            for s, d in und:
                if s == v:
                    counts[label[d]] = counts.get(label[d], 0) + 1
            best = min(counts, key=lambda l: (-counts[l], l))
            new[v] = best
        label = new
    return label


def test_label_propagation_matches_reference(spark):
    # Two 3-cliques bridged by one edge: communities should stay local.
    edges = [
        ("a", "b"), ("b", "c"), ("a", "c"),
        ("x", "y"), ("y", "z"), ("x", "z"),
        ("c", "x"),
    ]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        r["node"]: r["label"]
        for r in G.label_propagation(df, iterations=3).collect()
    }
    assert got == _reference_lpa(edges, 3)


def test_triangle_stats_counts_exactly(spark):
    # K4 on {a,b,c,d} minus edge (c,d): triangles = abc, abd. Degrees:
    # a=3 b=3 c=2 d=2 → wedges = 3+3+1+1 = 8; coeff = 6/8.
    edges = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d")]
    df = spark.createDataFrame(edges, ["src", "dst"])
    r = G.triangle_stats(df).collect()[0]
    assert (r.n_nodes, r.n_edges, r.n_wedges, r.n_triangles) == (4, 5, 8, 2)
    assert abs(r.clustering_coeff - 0.75) < 1e-15


def test_triangle_stats_orientation_insensitive(spark):
    # Same graph, edges given in arbitrary orientation/duplicates.
    edges = [("b", "a"), ("a", "b"), ("c", "a"), ("d", "a"),
             ("c", "b"), ("d", "b")]
    df = spark.createDataFrame(edges, ["src", "dst"])
    # triangle_stats normalizes via a<b + distinct, but reversed edges
    # arrive already a>b — normalize by min/max first, as callers with
    # raw undirected input must.
    from pyspark.sql import functions as F

    norm = df.select(
        F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
    )
    r = G.triangle_stats(norm).collect()[0]
    assert (r.n_edges, r.n_triangles) == (5, 2)


def test_pagerank_partitioning_invariant(spark):
    # The fixed-point claim: identical ranks under any physical
    # partitioning (the float variant would differ in low bits).
    edges = [(f"n{i}", f"n{(i * 7 + 3) % 20}") for i in range(60)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    r1 = {
        r["node"]: r["rank"]
        for r in G.pagerank_fixed_point(df, iterations=3).collect()
    }
    r2 = {
        r["node"]: r["rank"]
        for r in G.pagerank_fixed_point(
            df.repartition(7), iterations=3
        ).collect()
    }
    assert r1 == r2


def test_weighted_pagerank_uniform_weight_equals_unweighted(spark):
    from pyspark.sql import functions as F

    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a")]
    df = spark.createDataFrame(edges, ["src", "dst"])
    wdf = df.withColumn("w", F.lit(1))
    plain = {
        r["node"]: r["rank"]
        for r in G.pagerank_fixed_point(df, iterations=3).collect()
    }
    weighted = {
        r["node"]: r["rank"]
        for r in G.pagerank_fixed_point(
            wdf, iterations=3, weight="w"
        ).collect()
    }
    assert plain == weighted


def test_kcore_peel_cascades(spark):
    # Triangle a-b-c with a pendant chain c-d, d-e. k=2:
    # round 1 kills e (deg 1); round 2 kills d (deg fell to 1);
    # the triangle survives with all degrees 2.
    edges = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e")]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        r["node"]: r["degree"]
        for r in G.kcore_peel(df, k=2, rounds=3).collect()
    }
    assert got == {"a": 2, "b": 2, "c": 2}
    # One round is NOT enough: d still alive after round 1 (deg 2).
    one = {
        r["node"] for r in G.kcore_peel(df, k=2, rounds=1).collect()
    }
    assert one == {"a", "b", "c", "d"}


def test_bfs_hops_min_distance(spark):
    # Path a-b-c-d plus shortcut a-c: c is 1 hop (via shortcut), d is 2.
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("a", "c"), ("x", "y")]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        r["node"]: r["hops"]
        for r in G.bfs_hops(df, ["a"], max_hops=3).collect()
    }
    # x,y unreachable from a: absent entirely.
    assert got == {"a": 0, "b": 1, "c": 1, "d": 2}
    # Depth bound respected.
    got1 = {
        r["node"]: r["hops"]
        for r in G.bfs_hops(df, ["a"], max_hops=1).collect()
    }
    assert got1 == {"a": 0, "b": 1, "c": 1}


def test_adamic_adar_weights_rare_parts_higher(spark, sf_dir):
    import math

    from wikipedia_data_pipeline_spark.queries.graph_queries import graph_adamic_adar

    rows = graph_adamic_adar(spark, sf_dir).collect()
    assert rows
    for r in rows[:200]:
        # AA score bounded by n_common / ln(2) (every part deg >= 2)
        assert 0 < r.aa_nano <= r.n_common * round(1e9 / math.log(2))
        assert r.s1 < r.s2
        assert r.n_common >= 3
