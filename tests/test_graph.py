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
