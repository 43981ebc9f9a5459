"""S1/S7 — newick parse + serialize (reference: TreeReader.java:20-143,
JadeNode.getNewick:167-195)."""

from __future__ import annotations

import pytest

from treemachine_spark.exporters.newick_sink import assemble_newick, newick_escape
from treemachine_spark.sources.newick import parse_newick

FIXTURE = "((ott536234,ott810751)mrcaott246ott5481,(ott316878,ott102710)ott5839486)ott81461;"


def test_parse_basic():
    t = parse_newick(FIXTURE)
    assert t.root_id == "ott81461"
    assert len(t.nodes) == 7
    leaves = {n.node_id for n in t.nodes if n.is_leaf}
    assert leaves == {"ott536234", "ott810751", "ott316878", "ott102710"}
    parents = {n.node_id: n.parent_id for n in t.nodes}
    assert parents["ott536234"] == "mrcaott246ott5481"
    assert parents["ott5839486"] == "ott81461"
    assert parents["ott81461"] is None


def test_parse_preserves_child_order():
    t = parse_newick(FIXTURE)
    idx = {n.node_id: n.child_index for n in t.nodes}
    assert idx["mrcaott246ott5481"] == 0
    assert idx["ott5839486"] == 1
    assert idx["ott536234"] == 0
    assert idx["ott810751"] == 1


def test_roundtrip():
    t = parse_newick(FIXTURE)
    labels = {n.node_id: n.node_id for n in t.nodes}
    out = assemble_newick(t.edges(), t.root_id, labels)
    assert out == FIXTURE


def test_branch_lengths_and_comments():
    t = parse_newick("((A:0.1,B:0.2)C:0.3,[a comment]D:0.4)E;")
    bl = {n.node_id: n.branch_length for n in t.nodes}
    assert bl["A"] == 0.1 and bl["C"] == 0.3 and bl["E"] is None
    labels = {n.node_id: n.node_id for n in t.nodes}
    out = assemble_newick(t.edges(), t.root_id, labels, include_branch_lengths=True)
    assert out == "((A:0.1,B:0.2)C:0.3,D:0.4)E;"


def test_zero_branch_length_min_substitution():
    # JadeNode.java:176-177 — zero BL emitted as MIN_BRANCHLENGTH
    t = parse_newick("(A:0.0,B:1.0)R;")
    labels = {n.node_id: n.node_id for n in t.nodes}
    out = assemble_newick(t.edges(), t.root_id, labels, include_branch_lengths=True)
    assert out.startswith("(A:1e-22")


def test_quoted_labels():
    t = parse_newick("('has space',B)R;")
    assert {n.node_id for n in t.nodes} == {"has space", "B", "R"}
    assert newick_escape("has space") == "'has space'"
    assert newick_escape("plain") == "plain"


def test_unnamed_internals_get_ids():
    t = parse_newick("((A,B),(C,D));")
    unnamed = [n for n in t.nodes if n.label is None]
    assert len(unnamed) == 3
    assert len({n.node_id for n in t.nodes}) == 7


def test_unbalanced_raises():
    with pytest.raises(ValueError):
        parse_newick("((A,B);")


def test_deep_tree_no_recursion_limit():
    # the reference's recursive parser/serializer would blow the stack here
    n = 50_000
    deep = "(" * n + "X" + (":1.0)" * n).rstrip(")") + ")" * 0 + ";"
    deep = "(" * n + "X" + ")" * n + ";"
    t = parse_newick(deep)
    assert len(t.nodes) == n + 1
    labels = {nd.node_id: "" for nd in t.nodes}
    out = assemble_newick(t.edges(), t.root_id, labels)
    assert out == "(" * n + ")" * n + ";"
