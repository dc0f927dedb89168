"""Connected components (alternating large-star/small-star) vs a pure-Python
union-find referee, plus the end-to-end near-dup clustering contract."""

import random

import pytest
from pyspark.sql import functions as F

from nfl_feature_store_spark.operators.components import (
    connected_components,
    near_dup_components,
)


def _uf_components(edges, nodes):
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
    return {n: find(n) for n in nodes}


def _check(spark, edges):
    nodes = sorted({x for e in edges for x in e})
    expected = _uf_components(edges, nodes)
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["id"]: r["component"] for r in connected_components(df).collect()}
    assert got == expected


def test_long_chain_and_random_graph(spark):
    # a 60-node chain: worst case for naive min-propagation (O(diameter)),
    # must converge in O(log n) star rounds well under max_iter
    chain = [(i, i + 1) for i in range(60)]
    _check(spark, chain)

    rng = random.Random(7)
    nodes = list(range(200))
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(150)]
    edges = [(a, b) for a, b in edges if a != b]
    _check(spark, edges)


def test_star_and_isolated_components(spark):
    edges = [(10, 3), (10, 7), (10, 9), (50, 60), (2, 1)]
    _check(spark, edges)


def test_self_loops_and_duplicates_ignored(spark):
    edges = [(5, 5), (1, 2), (2, 1), (1, 2), (8, 8)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["id"]: r["component"] for r in connected_components(df).collect()}
    # 5 and 8 only appear in self-loops: they are nodes of the graph with no
    # real edge, labeled as their own singleton components
    assert got == {1: 1, 2: 1, 5: 5, 8: 8}


def test_null_endpoint_dropped_not_silently_mislabeled(spark):
    df = spark.createDataFrame(
        [(1, 2), (None, 3), (4, None)], "src long, dst long"
    )
    got = {r["id"]: r["component"] for r in connected_components(df).collect()}
    # NULL edges are dropped entirely; their non-NULL endpoints never appear
    assert got == {1: 1, 2: 1}


def test_near_dup_components_full_coverage(spark):
    # 3 planted duplicate groups + singletons; every doc must come back
    base = "the quick brown fox jumps over the lazy dog " * 8
    rows = [
        (1, base), (2, base + "tail-a"), (3, base + "tail-b"),   # group -> 1
        (10, "completely different text about spark shuffles " * 9),
        (11, "completely different text about spark shuffles " * 9 + "x"),
        (20, "a unique singleton document with its own words entirely"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = near_dup_components(docs, "doc_id", "text", min_jaccard=0.5).collect()
    lab = {r["doc_id"]: (r["component"], r["is_canonical"]) for r in out}
    assert len(lab) == 6
    assert lab[1] == (1, True) and lab[2] == (1, False) and lab[3] == (1, False)
    assert lab[10] == (10, True) and lab[11] == (10, False)
    assert lab[20] == (20, True)
    # dedup contract: exactly one canonical per component
    canon = [d for d, (_, c) in lab.items() if c]
    assert sorted(canon) == [1, 10, 20]


def test_fixpoint_guard_raises(spark):
    df = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    with pytest.raises(RuntimeError, match="no fixpoint"):
        connected_components(df, max_iter=1)
