"""Property-based testing (hypothesis) for the newick codec — beyond the
reference's test strategy (SURVEY.md §5: it has none). Round-trip law:
assemble(parse(s)) == s and parse(assemble(t)) == t for arbitrary trees."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from treemachine_spark.exporters.newick_sink import assemble_newick
from treemachine_spark.sources.newick import parse_newick

label = st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789", min_size=1, max_size=8)


@st.composite
def trees(draw, max_nodes: int = 40):
    """Random rooted tree: list of (child, parent) + label map."""
    n = draw(st.integers(min_value=2, max_value=max_nodes))
    parents = {}
    for i in range(1, n):
        parents[i] = draw(st.integers(min_value=0, max_value=i - 1))
    labels = {}
    for i in range(n):
        if draw(st.booleans()):
            labels[f"x{i}"] = f"L{draw(label)}"
    pairs = [(f"x{c}", f"x{p}") for c, p in parents.items()]
    return pairs, labels


@given(trees())
@settings(max_examples=60, deadline=None)
def test_serialize_parse_roundtrip(t):
    pairs, labels = t
    # give every node a unique label so parse can re-identify them
    all_ids = {c for c, _ in pairs} | {p for _, p in pairs}
    full_labels = {i: labels.get(i, f"u{i[1:]}") for i in all_ids}
    nwk = assemble_newick(pairs, "x0", full_labels)
    parsed = parse_newick(nwk)
    got_edges = {
        (n.node_id, n.parent_id) for n in parsed.nodes if n.parent_id is not None
    }
    want_edges = {(full_labels[c], full_labels[p]) for c, p in pairs}
    assert got_edges == want_edges
    assert parsed.root_id == full_labels["x0"]


@given(trees(max_nodes=20))
@settings(max_examples=40, deadline=None)
def test_parse_serialize_fixpoint(t):
    pairs, _ = t
    all_ids = {c for c, _ in pairs} | {p for _, p in pairs}
    full_labels = {i: i for i in all_ids}
    s1 = assemble_newick(pairs, "x0", full_labels)
    t1 = parse_newick(s1)
    s2 = assemble_newick(
        t1.edges(), t1.root_id, {n.node_id: n.node_id for n in t1.nodes}
    )
    assert s1 == s2


@given(st.lists(st.floats(min_value=0.001, max_value=99.0, allow_nan=False), min_size=2, max_size=6))
@settings(max_examples=30, deadline=None)
def test_branch_length_roundtrip(bls):
    pairs = [(f"x{i+1}", "x0") for i in range(len(bls))]
    rows = [(c, p, bl, i) for i, ((c, p), bl) in enumerate(zip(pairs, bls))]
    labels = {f"x{i}": f"x{i}" for i in range(len(bls) + 1)}
    nwk = assemble_newick(rows, "x0", labels, include_branch_lengths=True)
    parsed = parse_newick(nwk)
    got = {n.node_id: n.branch_length for n in parsed.nodes if n.parent_id}
    for (c, _p), bl in zip(pairs, bls):
        assert abs(got[c] - bl) < 1e-9
