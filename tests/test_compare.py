"""RF distance (graph/compare.py) against hand-computable newick cases."""

from __future__ import annotations

import pytest

from treemachine_spark.graph.compare import rf_distance_newick


def _rf(spark, a, b):
    return rf_distance_newick(spark, a, b).collect()[0]


def test_identical_trees_distance_zero(spark):
    t = "((A,B),(C,D),E);"
    r = _rf(spark, t, t)
    assert r["rf_distance"] == 0
    assert r["n_bip_t1"] == r["n_bip_t2"] == r["n_shared"] == 2


def test_maximally_conflicting_resolutions(spark):
    # {A,B},{C,D} vs {A,C},{B,D}: nothing shared -> RF 4
    r = _rf(spark, "((A,B),(C,D),E);", "((A,C),(B,D),E);")
    assert (r["n_bip_t1"], r["n_bip_t2"], r["n_shared"], r["rf_distance"]) == (
        2,
        2,
        0,
        4,
    )


def test_partial_resolution(spark):
    # B1 = {AB}; B2 = {AB},{ABC},{DE}: shared 1 -> RF 1+3-2 = 2
    r = _rf(spark, "((A,B),C,D,E);", "(((A,B),C),(D,E));")
    assert (r["n_bip_t1"], r["n_bip_t2"], r["n_shared"], r["rf_distance"]) == (
        1,
        3,
        1,
        2,
    )


def test_symmetry(spark):
    a, b = "((A,B),C,D,E);", "(((A,B),C),(D,E));"
    r1, r2 = _rf(spark, a, b), _rf(spark, b, a)
    assert r1["rf_distance"] == r2["rf_distance"] == 2
    assert (r1["n_bip_t1"], r1["n_bip_t2"]) == (r2["n_bip_t2"], r2["n_bip_t1"])


def test_star_tree_has_no_nontrivial_bipartitions(spark):
    r = _rf(spark, "(A,B,C,D);", "((A,B),(C,D));")
    assert (r["n_bip_t1"], r["n_bip_t2"], r["n_shared"], r["rf_distance"]) == (
        0,
        2,
        0,
        2,
    )


def test_tip_names_not_node_ids_drive_identity(spark):
    # same topology written with tips in different textual order must match
    r = _rf(spark, "((A,B),(C,D),E);", "((D,C),(B,A),E);")
    assert r["rf_distance"] == 0


def _random_newick(rng, tips):
    """Random binary tree over the given tip names (recursive joins)."""
    nodes = list(tips)
    while len(nodes) > 1:
        i = rng.randrange(len(nodes))
        a = nodes.pop(i)
        j = rng.randrange(len(nodes))
        b = nodes.pop(j)
        nodes.append(f"({a},{b})")
    return nodes[0] + ";"


def _brute_rf(n1, n2):
    """Independent set-based RF: bipartitions as frozensets of tip names."""
    from treemachine_spark.sources.newick import parse_newick

    def bips(text):
        t = parse_newick(text)
        children = {}
        for c, p, _bl, _ci in t.edges():
            children.setdefault(p, []).append(c)
        tipnames = {}

        def tips_below(nid):
            kids = children.get(nid)
            if not kids:
                return frozenset([tipnames[nid]])
            out = frozenset()
            for k in kids:
                out |= tips_below(k)
            return out

        for nd in t.nodes:
            if nd.is_leaf:
                tipnames[nd.node_id] = nd.label
        all_tips = tips_below(t.root_id)
        out = set()
        for nid in children:  # internal nodes only
            s = tips_below(nid)
            if 2 <= len(s) < len(all_tips):
                out.add(s)
        return out

    b1, b2 = bips(n1), bips(n2)
    return len(b1 ^ b2)


@pytest.mark.slow
def test_random_trees_match_bruteforce(spark):
    import random

    tips = [f"T{i}" for i in range(12)]
    for seed in (0, 1, 2, 3):
        rng = random.Random(seed)
        n1 = _random_newick(rng, tips)
        n2 = _random_newick(rng, tips)
        got = _rf(spark, n1, n2)["rf_distance"]
        assert got == _brute_rf(n1, n2), (seed, n1, n2)


def test_random_tree_self_distance_zero(spark):
    import random

    n1 = _random_newick(random.Random(9), [f"T{i}" for i in range(15)])
    assert _rf(spark, n1, n1)["rf_distance"] == 0


def test_patristic_distance_hand_computed(spark):
    from treemachine_spark.graph.compare import patristic_distance_newick

    nwk = "((A:1,B:2)X:3,(C:4,D:5)Y:6)R;"
    got = {
        (r["a"], r["b"]): r["distance"]
        for r in patristic_distance_newick(
            spark, nwk, [("A", "B"), ("A", "C"), ("B", "D")]
        ).collect()
    }
    assert got == {("A", "B"): 3.0, ("A", "C"): 14.0, ("B", "D"): 16.0}


def test_weighted_closure_matches_depth_when_unit_weights(spark):
    from pyspark.sql import functions as F

    from treemachine_spark.graph.closure import build_closure

    edges = spark.createDataFrame(
        [("b", "a"), ("c", "b"), ("d", "c")], "child_id string, parent_id string"
    ).withColumn("w", F.lit(1.0))
    paths = build_closure(edges, weight_col="w")
    for r in paths.collect():
        assert r["w_sum"] == float(r["depth"])


def test_branch_score_same_topology_differing_length(spark):
    import math

    from treemachine_spark.graph.compare import branch_score_newick

    r = branch_score_newick(
        spark, "((A:1,B:1)X:2,C:1,D:1);", "((A:1,B:1)X:5,C:1,D:1);"
    ).collect()[0]
    # only bipartition {A,B}: (2-5)^2 -> score 3
    assert (r["n_bip_t1"], r["n_bip_t2"], r["n_shared"]) == (1, 1, 1)
    assert math.isclose(r["branch_score"], 3.0)


def test_branch_score_different_topologies(spark):
    import math

    from treemachine_spark.graph.compare import branch_score_newick

    r = branch_score_newick(
        spark, "((A:1,B:1)X:2,C:1,D:1);", "((A:1,C:1)Y:4,B:1,D:1);"
    ).collect()[0]
    # {AB} only in t1 (bl 2), {AC} only in t2 (bl 4): sqrt(4 + 16)
    assert (r["n_bip_t1"], r["n_bip_t2"], r["n_shared"]) == (1, 1, 0)
    assert math.isclose(r["branch_score"], math.sqrt(20.0))


def test_branch_score_identical_trees_zero(spark):
    from treemachine_spark.graph.compare import branch_score_newick

    t = "((A:1,B:2)X:3,(C:4,D:5)Y:6)R;"
    r = branch_score_newick(spark, t, t).collect()[0]
    assert r["branch_score"] == 0.0 and r["n_shared"] == 2


def test_branch_score_unary_chain_lengths_sum(spark):
    import math

    from treemachine_spark.graph.compare import branch_score_newick

    # t2 resolves {A,B} behind a chain of two edges (1.5 + 1.5 = 3 vs 2)
    r = branch_score_newick(
        spark, "((A:1,B:1)X:2,C:1,D:1);", "(((A:1,B:1)W:1.5)X:1.5,C:1,D:1);"
    ).collect()[0]
    assert math.isclose(r["branch_score"], 1.0)
