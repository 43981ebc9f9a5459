"""Hypothesis property tests for T14 tree surgery (graph/surgery.py) —
beyond the reference's test strategy (SURVEY.md §5: it has none).

Laws, over arbitrary random trees and arbitrary reroot/prune targets:
  - reroot preserves the leaf set and ALL pairwise leaf path distances
    (the unrooted-tree identity) and re-parents the target onto the root;
  - a reroot is idempotent on the leaf-distance matrix under arbitrary
    FURTHER reroots (surgery composes);
  - prune removes exactly its leaf and preserves surviving distances;
  - the newick codec round-trips every surgered tree.
"""

from __future__ import annotations

import sys
from pathlib import Path

from hypothesis import given, settings, strategies as st

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from treemachine_spark.graph.surgery import SurgeryTree  # noqa: E402


@st.composite
def newick_trees(draw, min_leaves: int = 3, max_leaves: int = 16):
    """Random multifurcating tree with distinct leaf names and binary BLs
    (x/8 — exact in IEEE doubles, so distance equality is exact)."""
    n = draw(st.integers(min_value=min_leaves, max_value=max_leaves))
    nodes = [f"L{i}:{draw(st.integers(min_value=1, max_value=40)) / 8}" for i in range(n)]
    k = 0
    while len(nodes) > 1:
        take = min(len(nodes), draw(st.integers(min_value=2, max_value=3)))
        picked = [
            nodes.pop(draw(st.integers(min_value=0, max_value=len(nodes) - 1)))
            for _ in range(take)
        ]
        k += 1
        bl = draw(st.integers(min_value=1, max_value=40)) / 8
        nodes.append(f"({','.join(picked)})I{k}:{bl}")
    return nodes[0] + ";"


@given(newick_trees(), st.data())
@settings(max_examples=50, deadline=None)
def test_reroot_invariants(nwk, data):
    t = SurgeryTree.from_newick(nwk)
    names = sorted(t.leaf_names())
    before = t.leaf_distances()
    target_name = data.draw(st.sampled_from(names))
    target = t.find(target_name)
    t.reroot(target)
    assert t.root.parent is None
    assert target.parent is t.root
    assert t.leaf_names() == set(names)
    assert t.leaf_distances() == before


@given(newick_trees(), st.data())
@settings(max_examples=30, deadline=None)
def test_repeated_reroot_composes(nwk, data):
    t = SurgeryTree.from_newick(nwk)
    before = t.leaf_distances()
    names = sorted(t.leaf_names())
    for _ in range(3):
        t.reroot(t.find(data.draw(st.sampled_from(names))))
    assert t.leaf_distances() == before


@given(newick_trees(min_leaves=4), st.data())
@settings(max_examples=50, deadline=None)
def test_prune_invariants(nwk, data):
    t = SurgeryTree.from_newick(nwk)
    names = sorted(t.leaf_names())
    doomed = data.draw(st.sampled_from(names))
    survivors = {
        pair: d for pair, d in t.leaf_distances().items() if doomed not in pair
    }
    t.prune_external(t.find(doomed))
    assert t.leaf_names() == set(names) - {doomed}
    assert t.leaf_distances() == survivors


@given(newick_trees(), st.data())
@settings(max_examples=30, deadline=None)
def test_newick_roundtrip_after_surgery(nwk, data):
    t = SurgeryTree.from_newick(nwk)
    names = sorted(t.leaf_names())
    t.reroot(t.find(data.draw(st.sampled_from(names))))
    again = SurgeryTree.from_newick(t.to_newick())
    assert again.leaf_distances() == t.leaf_distances()
    assert again.to_newick() == t.to_newick()
