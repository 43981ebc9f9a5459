"""Majority-rule consensus tree construction (graph/consensus.py)."""

from __future__ import annotations

import pytest

from treemachine_spark.graph.consensus import (
    majority_bipartitions,
    majority_consensus,
)


@pytest.mark.slow
def test_majority_keeps_only_shared_bipartition(spark):
    trees = [
        "((A,B),(C,D),E);",
        "((A,B),(C,E),D);",
        "((A,B),C,D,E);",
    ]
    rows = majority_bipartitions(spark, trees).collect()
    assert {(tuple(r["bip"]), r["n_trees"]) for r in rows} == {(("A", "B"), 3)}
    assert majority_consensus(spark, trees) == "(C,D,E,(A,B));"


def test_identical_trees_reproduce_topology(spark):
    trees = ["((A,B),(C,D),E);"] * 3
    assert majority_consensus(spark, trees) == "(E,(A,B),(C,D));"


def test_single_tree_consensus_is_itself_canonicalized(spark):
    assert majority_consensus(spark, ["((C,D),(A,B),E);"]) == "(E,(A,B),(C,D));"


def test_two_of_three_majority(spark):
    trees = [
        "(((A,B),C),(D,E));",
        "(((A,B),C),(D,E));",
        "((A,(B,C)),(D,E));",
    ]
    rows = {tuple(r["bip"]): r["n_trees"] for r in majority_bipartitions(spark, trees).collect()}
    # {A,B} and {A,B,C} and {D,E}: 2/3 or 3/3; {B,C} only 1/3
    assert rows == {("A", "B"): 2, ("A", "B", "C"): 3, ("D", "E"): 3}
    # canonical emit order: direct tips first (sorted), then subclusters
    assert majority_consensus(spark, trees) == "((C,(A,B)),(D,E));"
