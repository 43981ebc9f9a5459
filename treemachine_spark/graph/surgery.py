"""T14 tree surgery: reroot / tritomy-root / unroot / prune-external-node.

Reference semantics: jade/tree/deprecated/JadeTree.java —
reRoot :227-250, tritomyRoot :252-312, unRoot :212-218,
ProcessReRoot :411-425 (arc reversal with name/BL exchange, exchangeInfo
:432-442), pruneExternalNode :466-510.

These are REQUEST-SCALE mutations: the reference applies them to a single
in-memory JadeTree (a parsed source tree or an extracted subtree), never to
the whole graph store. The Spark-first shape is therefore the same as the
engine's other request-scale tree assembly (exporters/newick_sink.py):
collect the (small) tree's edges once, mutate the pointer tree driver-side,
and push the result back as relational rows / newick. All walks here are
ITERATIVE (explicit stacks) so deep chains can't blow the recursion limit —
the reference's recursive ProcessReRoot/postOrderProcessRoot is a real
failure mode on its own 2.4M-tip trees.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from treemachine_spark.sources.newick import ParsedTree, parse_newick


@dataclass
class SNode:
    """Mutable pointer-tree node (JadeNode equivalent, JadeNode.java)."""

    name: str | None = None
    bl: float = 0.0
    parent: "SNode | None" = None
    children: list["SNode"] = field(default_factory=list)

    @property
    def is_leaf(self) -> bool:
        return not self.children

    def add_child(self, child: "SNode") -> None:
        self.children.append(child)
        child.parent = self

    def remove_child(self, child: "SNode") -> None:
        self.children.remove(child)


@dataclass
class SurgeryTree:
    """Mutable rooted tree supporting the JadeTree mutation family."""

    root: SNode

    # ---- construction / serialization -------------------------------------

    @classmethod
    def from_newick(cls, text: str) -> "SurgeryTree":
        return cls.from_parsed(parse_newick(text))

    @classmethod
    def from_parsed(cls, parsed: ParsedTree) -> "SurgeryTree":
        by_id: dict[str, SNode] = {}
        for nd in parsed.nodes:
            by_id[nd.node_id] = SNode(
                name=nd.label, bl=nd.branch_length if nd.branch_length else 0.0
            )
        root = None
        # ParsedNode.child_index preserves sibling order; attach in order
        for nd in sorted(
            parsed.nodes, key=lambda n: (n.parent_id or "", n.child_index)
        ):
            if nd.parent_id is None:
                root = by_id[nd.node_id]
            else:
                by_id[nd.parent_id].add_child(by_id[nd.node_id])
        if root is None:
            raise ValueError("parsed tree has no root")
        return cls(root=root)

    def to_newick(self, with_bl: bool = True) -> str:
        """Iterative newick writer (sibling order preserved)."""
        from treemachine_spark.exporters.newick_sink import newick_escape

        out: list[str] = []
        # stack of (node, state) — state: 0 enter, 1..n between children
        stack: list[tuple[SNode, int]] = [(self.root, 0)]
        while stack:
            node, state = stack.pop()
            if node.is_leaf:
                out.append(newick_escape(node.name or ""))
                if with_bl and node.parent is not None:
                    out.append(f":{node.bl:g}")
                continue
            if state == 0:
                out.append("(")
                stack.append((node, 1))
                stack.append((node.children[0], 0))
            elif state <= len(node.children) - 1:
                out.append(",")
                stack.append((node, state + 1))
                stack.append((node.children[state], 0))
            else:
                out.append(")")
                if node.name:
                    out.append(newick_escape(node.name))
                if with_bl and node.parent is not None:
                    out.append(f":{node.bl:g}")
        return "".join(out) + ";"

    # ---- queries ----------------------------------------------------------

    def iter_nodes(self) -> list[SNode]:
        out, stack = [], [self.root]
        while stack:
            n = stack.pop()
            out.append(n)
            stack.extend(n.children)
        return out

    def leaves(self) -> list[SNode]:
        return [n for n in self.iter_nodes() if n.is_leaf]

    def leaf_names(self) -> set[str]:
        return {n.name for n in self.leaves() if n.name}

    def find(self, name: str) -> SNode:
        for n in self.iter_nodes():
            if n.name == name:
                return n
        raise KeyError(name)

    def total_bl(self) -> float:
        # root BL is not an edge (no parent) — excluded, as in newick output
        return sum(n.bl for n in self.iter_nodes() if n.parent is not None)

    def leaf_distances(self) -> dict[frozenset[str], float]:
        """Pairwise leaf path-length distances — the unrooted-tree invariant
        reroot must preserve (test oracle; O(L^2), request-scale trees)."""
        paths: dict[str, dict[int, float]] = {}
        for leaf in self.leaves():
            acc, cur, d = {}, leaf, 0.0
            while cur is not None:
                acc[id(cur)] = d
                d += cur.bl
                cur = cur.parent
            paths[leaf.name or ""] = acc
        names = sorted(paths)
        out: dict[frozenset[str], float] = {}
        for i, a in enumerate(names):
            for b in names[i + 1 :]:
                shared = paths[a].keys() & paths[b].keys()
                # MRCA = shared ancestor with the smallest distance from a
                m = min(shared, key=lambda k: paths[a][k])
                out[frozenset((a, b))] = round(paths[a][m] + paths[b][m], 9)
        return out

    # ---- mutations (JadeTree parity) --------------------------------------

    def tritomy_root(self, toberoot: SNode | None) -> None:
        """Convert an outdegree-2 root to outdegree 3 by deleting one
        internal child of the root and splicing its children up; the deleted
        child's BL is added to its sibling (JadeTree.tritomyRoot:252-312).
        Guards against deleting ``toberoot``. Assumes the root is not a
        cherry (both children leaves)."""
        curroot = self.root
        assert len(curroot.children) == 2
        c0, c1 = curroot.children
        if toberoot is None:
            doomed = c0 if not c0.is_leaf else c1
        elif c1 is toberoot:
            doomed = c0
        elif not c1.is_leaf:
            doomed = c1
        else:
            # reference asserts child(1).isInternal() here and corrupts with
            # asserts off (JadeTree.java:305); fall back to the internal
            # sibling — toberoot is deep inside it, splicing keeps it intact
            doomed = c0
        keeper = c1 if doomed is c0 else c0
        assert not doomed.is_leaf, "tritomy_root: root is a cherry"
        keeper.bl += doomed.bl
        curroot.remove_child(doomed)
        for ch in list(doomed.children):
            curroot.add_child(ch)

    def unroot(self, inroot: SNode) -> None:
        """JadeTree.unRoot:212-218: collapse a binary root to a trifurcation
        (no-op if the root already has >= 3 children)."""
        if len(self.root.children) < 3:
            self.tritomy_root(inroot)

    def reroot(self, inroot: SNode) -> None:
        """JadeTree.reRoot:227-250: insert a new root halfway along the edge
        above ``inroot`` and reverse the arcs from there to the old root,
        exchanging each reversed edge's name/BL pair (exchangeInfo:432-442 —
        a node's name/BL ride on the edge BELOW it, so reversing the edge
        moves them to the other endpoint)."""
        if len(self.root.children) < 3:
            self.tritomy_root(inroot)
        if inroot is self.root:
            return  # reference prints a warning and does nothing
        old_parent = inroot.parent
        assert old_parent is not None
        new_root = SNode(name=None, bl=inroot.bl / 2)
        inroot.bl = inroot.bl / 2
        old_parent.remove_child(inroot)
        new_root.add_child(inroot)
        old_parent.add_child(new_root)
        # ProcessReRoot:411-425, iteratively: reverse arcs ancestor-first
        # along the chain new_root -> ... -> old root
        chain: list[SNode] = []
        cur: SNode | None = new_root
        while cur is not None and cur.parent is not None:
            chain.append(cur)
            cur = cur.parent
        for node in reversed(chain):  # topmost (child of old root) first
            parent = node.parent
            assert parent is not None
            node.name, parent.name = parent.name, node.name
            node.bl, parent.bl = parent.bl, node.bl
            parent.remove_child(node)
            node.add_child(parent)
        new_root.parent = None
        self.root = new_root

    def prune_external(self, node: SNode) -> None:
        """JadeTree.pruneExternalNode:466-510: remove a leaf; if its parent
        was binary, splice the sibling up with BL = sibling.bl + parent.bl
        (collapsing the now-degree-1 parent)."""
        if not node.is_leaf:
            return
        parent = node.parent
        if parent is None:
            raise ValueError("cannot prune the root")
        if len(parent.children) == 2:
            other = next(c for c in parent.children if c is not node)
            if parent is not self.root:
                grand = parent.parent
                assert grand is not None
                other.bl += parent.bl
                # splice: replace parent with other at the same position
                grand.children[grand.children.index(parent)] = other
                other.parent = grand
            else:
                other.parent = None
                self.root = other
        else:
            parent.remove_child(node)


# ---- relational wrappers (engine integration) ------------------------------


def surgery_from_edges(edge_rows, root_id: str) -> tuple[SurgeryTree, dict]:
    """Build a SurgeryTree from collected edge rows
    (child_id, parent_id, branch_length) — the engine's request-scale tree
    form (same rows exporters/newick_sink.assemble_newick consumes).
    Returns (tree, node_id -> SNode map); SNode.name is the node id."""
    by_id: dict[str, SNode] = {}

    def get(nid: str) -> SNode:
        if nid not in by_id:
            by_id[nid] = SNode(name=nid)
        return by_id[nid]

    for child_id, parent_id, bl in edge_rows:
        c, p = get(child_id), get(parent_id)
        c.bl = bl if bl is not None else 0.0
        p.add_child(c)
    return SurgeryTree(root=get(root_id)), by_id


def edges_of(tree: SurgeryTree) -> list[tuple[str, str, float, int]]:
    """(child_id, parent_id, branch_length, child_index) rows of the mutated
    tree, ready for spark.createDataFrame — synthetic ids ``_r<n>`` are
    minted for surgery-created unnamed nodes (the new root)."""
    counter = 0
    names: dict[int, str] = {}

    def name_of(n: SNode) -> str:
        nonlocal counter
        if n.name:
            return n.name
        if id(n) not in names:
            counter += 1
            names[id(n)] = f"_r{counter}"
        return names[id(n)]

    rows = []
    stack = [tree.root]
    while stack:
        n = stack.pop()
        for i, ch in enumerate(n.children):
            rows.append((name_of(ch), name_of(n), ch.bl, i))
            stack.append(ch)
    return rows
