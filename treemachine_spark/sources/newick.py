"""Newick parser (S1) — reference: jade/tree/deprecated/TreeReader.java:20-143
(char-by-char recursive construction of a pointer tree).

This implementation is a single-pass **iterative** tokenizer (explicit stack,
no recursion) so arbitrarily deep trees cannot blow the call stack — a real
failure mode of the reference's recursive walks on ~2.4M-tip trees.

Output is flat edge/node lists ready for ``spark.createDataFrame``: the
pointer-tree IR (JadeTree) of the reference is replaced by relational form
immediately. Grammar per the reference: nested parens, optional node labels,
optional ``:branch_length``, ``[...]`` comments skipped, ``;`` terminator,
quoted labels.

Scale note: a newick string is an inherently sequential encoding; parsing
happens driver-side (as in the reference), then everything downstream
(closure build, queries, exports) is distributed. At 100 TB, trees arrive as
edge tables and this parser is only the compatibility entry point.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class ParsedNode:
    node_id: str
    label: str | None
    branch_length: float | None
    parent_id: str | None
    is_leaf: bool
    child_index: int  # order among siblings (reference preserves rel order)


@dataclass
class ParsedTree:
    nodes: list[ParsedNode] = field(default_factory=list)
    root_id: str | None = None

    def edges(self) -> list[tuple[str, str, float | None, int]]:
        """(child_id, parent_id, branch_length, child_index) rows."""
        return [
            (n.node_id, n.parent_id, n.branch_length, n.child_index)
            for n in self.nodes
            if n.parent_id is not None
        ]


def parse_newick(text: str) -> ParsedTree:
    """Parse one newick string. Unlabelled nodes get ids ``_<ordinal>``.

    Mirrors TreeReader.readTree (jade/tree/deprecated/TreeReader.java:20-143):
    '(' opens an internal node, ',' separates siblings, ')' closes, the token
    after ')' or between delimiters is the label, ':' precedes a branch
    length, '[' .. ']' comments are skipped, ';' ends the tree.
    """
    tree = ParsedTree()
    counter = 0

    def new_id(label: str | None) -> str:
        nonlocal counter
        if label:
            return label
        counter += 1
        return f"_{counter}"

    # stack frame per open '(': {"kids": [ParsedNode...], "n": next index}
    stack: list[dict] = []
    cur_label: list[str] = []
    cur_bl: list[str] = []
    in_bl = False
    in_comment = False
    in_quote = False
    # children of a just-closed ')' awaiting their parent's label/BL;
    # None means the next token is a plain leaf
    pending_children: list[ParsedNode] | None = None

    def close_node() -> None:
        """Finalize the current token (leaf, or internal from ')') if any."""
        nonlocal pending_children, in_bl
        label = "".join(cur_label).strip() or None
        bl = float("".join(cur_bl)) if cur_bl else None
        cur_label.clear()
        cur_bl.clear()
        in_bl = False
        if pending_children is None and label is None and bl is None:
            return  # nothing accumulated (e.g. '(' just opened)
        node = ParsedNode(
            node_id=new_id(label),
            label=label,
            branch_length=bl,
            parent_id=None,
            is_leaf=pending_children is None,
            child_index=0,
        )
        if pending_children is not None:
            for c in pending_children:
                c.parent_id = node.node_id
            pending_children = None
        tree.nodes.append(node)
        if stack:
            node.child_index = stack[-1]["n"]
            stack[-1]["kids"].append(node)
        else:
            tree.root_id = node.node_id

    for i, ch in enumerate(text):
        if in_comment:
            in_comment = ch != "]"
            continue
        if in_quote:
            if ch == "'":
                in_quote = False
            else:
                cur_label.append(ch)
            continue
        if ch == "[":
            in_comment = True
        elif ch == "'":
            in_quote = True
        elif ch == "(":
            if pending_children is not None or cur_label or cur_bl:
                raise ValueError(f"newick: unexpected '(' at {i}")
            stack.append({"kids": [], "n": 0})
        elif ch == ",":
            close_node()
            if not stack:
                raise ValueError(f"newick: ',' outside parens at {i}")
            stack[-1]["n"] += 1
        elif ch == ")":
            close_node()
            if not stack:
                raise ValueError(f"newick: unbalanced ')' at {i}")
            pending_children = stack.pop()["kids"]
        elif ch == ":":
            in_bl = True
        elif ch == ";":
            close_node()
            break
        elif ch.isspace():
            continue
        else:
            (cur_bl if in_bl else cur_label).append(ch)

    if stack:
        raise ValueError("newick: unbalanced parentheses")
    close_node()
    return tree


def newick_to_dataframes(spark, text: str, tree_id: str):
    """S1 sink side: parsed tree → (nodes_df, edges_df).

    nodes: (tree_id, node_id, name, is_leaf)
    edges: (tree_id, child_id, parent_id, branch_length, child_index)
    """
    tree = parse_newick(text)
    nodes_rows = [(tree_id, nd.node_id, nd.label, nd.is_leaf) for nd in tree.nodes]
    edge_rows = [(tree_id, c, p, bl, ci) for c, p, bl, ci in tree.edges()]
    nodes_df = spark.createDataFrame(
        nodes_rows, "tree_id string, node_id string, name string, is_leaf boolean"
    )
    edges_df = spark.createDataFrame(
        edge_rows,
        "tree_id string, child_id string, parent_id string, branch_length double, child_index int",
    )
    return nodes_df, edges_df
