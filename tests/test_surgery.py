"""T14 tree-surgery property tests (reference: JadeTree.java:212-312,
411-442, 466-510). Core invariants: reroot/tritomy/unroot preserve the leaf
set and all pairwise leaf path-length distances (the unrooted-tree
identity); prune removes exactly one leaf and preserves the distances among
the survivors."""

from __future__ import annotations

import random
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from treemachine_spark.graph.surgery import (  # noqa: E402
    SurgeryTree,
    edges_of,
    surgery_from_edges,
)

BASIC = "((A:1,B:2)ab:0.5,((C:1.5,D:0.25)cd:2,E:3)cde:0.75)root;"


def random_newick(seed: int, n_leaves: int = 12) -> str:
    """Deterministic random binary-ish tree with named leaves and BLs."""
    rng = random.Random(seed)
    nodes = [f"L{i}:{rng.randint(1, 40) / 8}" for i in range(n_leaves)]
    k = 0
    while len(nodes) > 1:
        take = rng.choice([2, 2, 2, 3]) if len(nodes) >= 3 else 2
        picked = [nodes.pop(rng.randrange(len(nodes))) for _ in range(take)]
        k += 1
        nodes.append(f"({','.join(picked)})I{k}:{rng.randint(1, 40) / 8}")
    return nodes[0] + ";"


SEEDS = [1, 2, 3, 7, 42]


def test_newick_round_trip():
    t = SurgeryTree.from_newick(BASIC)
    assert SurgeryTree.from_newick(t.to_newick()).to_newick() == t.to_newick()
    assert t.leaf_names() == {"A", "B", "C", "D", "E"}


@pytest.mark.parametrize("seed", SEEDS)
def test_reroot_preserves_leaf_distances(seed):
    t = SurgeryTree.from_newick(random_newick(seed))
    before = t.leaf_distances()
    leaves = sorted(t.leaf_names())
    target = t.find(leaves[len(leaves) // 2])
    t.reroot(target)
    assert t.root.parent is None
    assert t.leaf_names() == set(leaves)
    assert t.leaf_distances() == before
    # target now hangs directly off the new root (reference contract)
    assert target.parent is t.root


@pytest.mark.parametrize("seed", SEEDS)
def test_reroot_preserves_total_bl(seed):
    t = SurgeryTree.from_newick(random_newick(seed))
    # reroot splits one edge in two halves and reverses arcs — edge-length
    # multiset on every path is preserved, so the total is too
    before = round(t.total_bl(), 9)
    t.reroot(t.find(sorted(t.leaf_names())[0]))
    assert round(t.total_bl(), 9) == before


def test_reroot_at_internal_node():
    t = SurgeryTree.from_newick(BASIC)
    before = t.leaf_distances()
    t.reroot(t.find("cd"))
    assert t.leaf_distances() == before
    # rerooting AT the current root of a trifurcating tree is a no-op
    # (reference warns + returns; with a binary root it tritomies first)
    t2 = SurgeryTree.from_newick("(A:1,B:2,C:3)r;")
    snap = t2.to_newick()
    t2.reroot(t2.root)
    assert t2.to_newick() == snap


def test_tritomy_root_via_unroot():
    t = SurgeryTree.from_newick(BASIC)
    before = t.leaf_distances()
    keep = t.find("ab")
    t.unroot(keep)
    assert len(t.root.children) == 3
    assert keep in t.root.children  # the guarded node survives
    assert t.leaf_distances() == before
    # already-trifurcating root: unroot is a no-op
    snap = t.to_newick()
    t.unroot(t.root.children[0])
    assert t.to_newick() == snap


@pytest.mark.parametrize("seed", SEEDS)
def test_prune_external(seed):
    t = SurgeryTree.from_newick(random_newick(seed))
    names = sorted(t.leaf_names())
    doomed = names[1]
    before = {
        pair: d for pair, d in t.leaf_distances().items() if doomed not in pair
    }
    t.prune_external(t.find(doomed))
    assert t.leaf_names() == set(names) - {doomed}
    assert t.leaf_distances() == before


def test_prune_child_of_root_collapses_root():
    # pruning a leaf whose parent IS the binary root promotes the sibling
    t = SurgeryTree.from_newick("((A:1,B:2)ab:0.5,E:3)root;")
    t.prune_external(t.find("E"))
    assert t.root.name == "ab"
    assert t.root.parent is None
    assert t.leaf_names() == {"A", "B"}


def test_prune_internal_is_noop():
    t = SurgeryTree.from_newick(BASIC)
    snap = t.to_newick()
    t.prune_external(t.find("cd"))
    assert t.to_newick() == snap


def test_cli_surgery_round_trip(tmp_path):
    from treemachine_spark.cli import main

    src = tmp_path / "t.nwk"
    out = tmp_path / "o.nwk"
    src.write_text(BASIC + "\n")
    assert main(["reroot", str(src), "cd", str(out)]) == 0
    rerooted = SurgeryTree.from_newick(out.read_text().strip())
    assert rerooted.leaf_names() == {"A", "B", "C", "D", "E"}
    assert (
        rerooted.leaf_distances() == SurgeryTree.from_newick(BASIC).leaf_distances()
    )
    assert main(["prunetip", str(src), "E", str(out)]) == 0
    assert SurgeryTree.from_newick(out.read_text().strip()).leaf_names() == {
        "A",
        "B",
        "C",
        "D",
    }


def test_edges_round_trip_and_spark_integration(spark):
    # engine form: edge rows -> surgery -> edge rows -> DataFrame
    t = SurgeryTree.from_newick(BASIC)
    rows = edges_of(t)
    t2, by_id = surgery_from_edges(
        [(c, p, bl) for c, p, bl, _ in rows], root_id="root"
    )
    assert t2.leaf_distances() == t.leaf_distances()
    t2.reroot(by_id["cd"])
    out = edges_of(t2)
    df = spark.createDataFrame(
        out,
        "child_id string, parent_id string, branch_length double, child_index int",
    )
    assert df.count() == len(out)
    # reroot inserts one node; a binary original root also tritomies one
    # away first, so the edge count lands within [rows, rows+1]
    assert len(rows) <= len(out) <= len(rows) + 1
    assert t2.leaf_names() == t.leaf_names()
