"""Connected components vs a pure-Python union-find, on graph shapes
that stress the propagation: long chains (max diameter — pointer
jumping must contract them), stars, cliques, and a seeded random
graph."""

import random

from crawlspark.operators.components import (
    connected_components,
    dedup_clusters,
)


def _union_find(nodes, edges):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min node id of the component
    comp = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    return {n: min(members) for members in comp.values() for n in members}


def _check(spark, edges):
    nodes = sorted({x for e in edges for x in e})
    expect = _union_find(nodes, edges)
    df = spark.createDataFrame(edges, "a_id long, b_id long")
    got = {
        r["node"]: r["component"]
        for r in connected_components(df).collect()
    }
    assert got == expect


def test_long_chain(spark):
    # worst-case diameter: 0-1-2-...-40; plain propagation needs 40
    # rounds, min-label + pointer jumping converges in ~log2(40)
    _check(spark, [(i, i + 1) for i in range(40)])


def test_two_chains_and_star(spark):
    edges = [(i, i + 1) for i in range(0, 10)]
    edges += [(100 + i, 101 + i) for i in range(0, 10)]
    edges += [(500, 500 + i) for i in range(1, 8)]
    _check(spark, edges)


def test_duplicate_and_reversed_edges(spark):
    _check(spark, [(1, 2), (2, 1), (1, 2), (3, 3), (3, 4)])


def test_random_graph_matches_union_find(spark):
    rng = random.Random(42)
    nodes = list(range(200))
    edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(150)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    _check(spark, edges)


def test_dedup_clusters_shape(spark):
    df = dedup_clusters(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    )
    rows = df.collect()
    assert rows, "sf0.001 corpus contains near-dup clusters"
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for cid, members in by_cluster.items():
        ids = [m["doc_id"] for m in members]
        assert min(ids) == cid  # canonical label = min member
        assert len(members) >= 2  # only multi-doc clusters emitted
        assert members[0]["cluster_size"] == len(members)
        keepers = [m for m in members if m["is_keeper"]]
        assert len(keepers) == 1 and keepers[0]["doc_id"] == cid
