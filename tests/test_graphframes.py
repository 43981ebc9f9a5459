"""GraphFrames-style surface: degrees/triplets/bfs/connectedComponents/
pageRank over small hand-checked graphs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from treemachine_spark.graph.frames import GraphFrame


@pytest.fixture(scope="module")
def g(spark):
    v = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("d",), ("e",), ("f",)], "id string"
    )
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"), ("d", "e")], "src string, dst string"
    )
    return GraphFrame(v, e)


def test_degrees(g):
    assert {(r["id"], r["outDegree"]) for r in g.outDegrees.collect()} == {
        ("a", 2),
        ("b", 1),
        ("d", 1),
    }
    assert {(r["id"], r["inDegree"]) for r in g.inDegrees.collect()} == {
        ("b", 1),
        ("c", 2),
        ("e", 1),
    }
    assert {(r["id"], r["degree"]) for r in g.degrees.collect()} == {
        ("a", 2),
        ("b", 2),
        ("c", 2),
        ("d", 1),
        ("e", 1),
    }


def test_triplets(g):
    rows = g.triplets.collect()
    assert len(rows) == 4
    assert {(r["src"]["id"], r["dst"]["id"]) for r in rows} == {
        ("a", "b"),
        ("b", "c"),
        ("a", "c"),
        ("d", "e"),
    }


def test_bfs(g):
    hit = g.bfs(F.col("id") == "a", F.col("id") == "c").collect()
    assert [(r["start"], r["end"], r["length"]) for r in hit] == [("a", "c", 1)]
    two = g.bfs(F.col("id") == "a", F.col("id") == "c", max_path_length=1).collect()
    assert len(two) == 1  # direct edge found at level 1
    assert g.bfs(F.col("id") == "a", F.col("id") == "e").count() == 0
    same = g.bfs(F.col("id") == "a", F.col("id") == "a").collect()
    assert [(r["start"], r["end"], r["length"]) for r in same] == [("a", "a", 0)]


def test_connected_components(g):
    cc = {r["id"]: r["component"] for r in g.connectedComponents().collect()}
    assert cc == {"a": "a", "b": "a", "c": "a", "d": "d", "e": "d", "f": "f"}


def _pagerank_py(vertices, edges, reset=0.15, iters=10):
    n = len(vertices)
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    ranks = {v: 1.0 / n for v in vertices}
    for _ in range(iters):
        received = {v: 0.0 for v in vertices}
        for s, d in edges:
            received[d] += ranks[s] / out[s]
        dangling = sum(r for v, r in ranks.items() if v not in out)
        ranks = {
            v: reset / n + (1 - reset) * (received[v] + dangling / n)
            for v in vertices
        }
    return ranks


@pytest.mark.slow
def test_pagerank_matches_reference_impl(g):
    got = {r["id"]: r["pagerank"] for r in g.pageRank(max_iter=10).collect()}
    want = _pagerank_py(
        ["a", "b", "c", "d", "e", "f"],
        [("a", "b"), ("b", "c"), ("a", "c"), ("d", "e")],
    )
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9, (v, got[v], want[v])
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_from_store_adapter(spark):
    from tests.test_registry import FIX
    from treemachine_spark.ingest import ingest_synthesis_data

    store = ingest_synthesis_data(
        spark,
        str(FIX / "labelled_supertree.tre"),
        str(FIX / "annotations.json"),
        str(FIX / "taxonomy.tsv"),
    )
    gf = GraphFrame.from_store(store)
    # tree invariants: every non-root vertex has outDegree 1 (its parent
    # edge); the root's component covers the whole tree
    assert gf.vertices.count() == 7
    assert gf.edges.count() == 6
    assert gf.outDegrees.where(F.col("outDegree") != 1).count() == 0
    cc = gf.connectedComponents()
    assert cc.select("component").distinct().count() == 1


def test_triangle_count_known_graph(spark):
    # K4 on {1,2,3,4}: every vertex is in C(3,2)=3 triangles; vertex 5
    # hangs off one edge (0 triangles); 6 is isolated
    edges = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)] + [(4, 5)]
    v = spark.createDataFrame([(i,) for i in range(1, 7)], "id long")
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {r["id"]: r["count"] for r in GraphFrame(v, e).triangleCount().collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3, 5: 0, 6: 0}


def test_triangle_count_vs_bruteforce_random(spark):
    import itertools
    import random

    rng = random.Random(11)
    n = 30
    edges = sorted(
        {(a, b) for a in range(n) for b in range(a + 1, n) if rng.random() < 0.2}
    )
    eset = set(edges)
    expected = {i: 0 for i in range(n)}
    for x, y, z in itertools.combinations(range(n), 3):
        if (x, y) in eset and (y, z) in eset and (x, z) in eset:
            expected[x] += 1
            expected[y] += 1
            expected[z] += 1
    v = spark.createDataFrame([(i,) for i in range(n)], "id long")
    # feed DIRECTED duplicates + self loops to exercise canonicalization
    dirty = edges + [(b, a) for a, b in edges[:10]] + [(3, 3)]
    e = spark.createDataFrame(dirty, "src long, dst long")
    got = {r["id"]: r["count"] for r in GraphFrame(v, e).triangleCount().collect()}
    assert got == expected
