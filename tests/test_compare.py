"""RF distance (graph/compare.py) against hand-computable newick cases."""

from __future__ import annotations

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
