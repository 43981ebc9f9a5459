"""Newick sink (S7) — reference: JadeNode.getNewick
(jade/tree/deprecated/JadeNode.java:167-195), recursive StringBuffer append.

Rebuild: the subtree's edge rows are computed distributed (closure filter),
then assembled into the newick string with an **iterative** postorder
(explicit stack — no recursion limit; the reference's recursion is a real
failure mode at 2.4M tips). Children are emitted in child_index order, so
output is byte-stable.

Branch length rule per the reference: when lengths are requested, 0 is
replaced by MIN_BRANCHLENGTH (JadeNode.java:10, :176-177).

Scale note: string assembly of one tree is inherently O(result) on a single
machine; the distributed part is everything before the final concat. For
trees too big for one driver (beyond the reference's 100k cap), assemble
per-subtree fragments executor-side and stitch the top levels on the driver.
"""

from __future__ import annotations

MIN_BRANCHLENGTH = 0.0000000000000000000001

# characters that force quoting per the newick standard (the reference
# delegates to ot-base GeneralUtils.newickName; JadeNode.offendingChars
# lists the same family — jade/tree/deprecated/JadeNode.java:23)
_OFFENDING = set(" ()[]{}/\\,;:=*'\"<>")


def newick_escape(name: str) -> str:
    """Quote a label when it contains offending characters (single-quote
    wrapping, internal quotes doubled)."""
    if not name:
        return ""
    if any(c in _OFFENDING for c in name):
        return "'" + name.replace("'", "''") + "'"
    return name


def assemble_newick(
    edge_rows,
    root_id: str,
    labels: dict[str, str] | None = None,
    include_branch_lengths: bool = False,
    leaf_overrides: dict[str, str] | None = None,
) -> str:
    """Build a newick string from (child_id, parent_id[, branch_length
    [, child_index]]) rows. ``labels`` maps node_id -> display label
    (missing/empty -> unlabelled, matching idsForUnnamed=False).

    ``leaf_overrides`` substitutes a pre-rendered newick fragment for a leaf
    node's label — the stitch point used by ``distributed_newick``.
    """
    children: dict[str, list] = {}
    bls: dict[str, float] = {}
    for row in edge_rows:
        child, parent = row[0], row[1]
        bl = row[2] if len(row) > 2 else None
        ci = row[3] if len(row) > 3 else 0
        children.setdefault(parent, []).append((ci if ci is not None else 0, child))
        if bl is not None:
            bls[child] = bl
    for kids in children.values():
        kids.sort()

    labels = labels or {}
    leaf_overrides = leaf_overrides or {}

    def label_of(nid: str) -> str:
        if nid in leaf_overrides:
            return leaf_overrides[nid]
        return newick_escape(labels.get(nid, ""))

    def bl_of(nid: str) -> str:
        if not include_branch_lengths:
            return ""
        bl = bls.get(nid, 0.0)
        if bl == 0:
            bl = MIN_BRANCHLENGTH
        return f":{bl}"

    # iterative postorder: emit '(' on first visit, children recursively,
    # then ')label[:bl]'
    out: list[str] = []
    stack: list[tuple[str, int, bool]] = [(root_id, 0, True)]
    while stack:
        nid, idx, is_root = stack[-1]
        kids = children.get(nid)
        if not kids:  # leaf
            out.append(label_of(nid))
            if not is_root:
                out.append(bl_of(nid))
            stack.pop()
            continue
        if idx == 0:
            out.append("(")
        if idx < len(kids):
            stack[-1] = (nid, idx + 1, is_root)
            if idx > 0:
                out.append(",")
            stack.append((kids[idx][1], 0, False))
        else:
            out.append(")")
            out.append(label_of(nid))
            if not is_root:
                out.append(bl_of(nid))
            stack.pop()
    return "".join(out) + ";"


def distributed_newick(
    edges,
    paths,
    root_id: str,
    labels=None,
    anchor_depth: int | str = "auto",
    include_branch_lengths: bool = False,
) -> str:
    """Scalable newick assembly: fragments are built executor-side per
    'anchor' subtree (anchors = nodes at ``anchor_depth`` below the root),
    the driver only stitches the top levels — removing the reference's
    driver/serving bottleneck that motivated its 100k-tip cap
    (tree_of_life_v3.java:591).

    One shuffle (group by anchor) + an Arrow-batched applyInPandas; the
    driver handles fanout^anchor_depth fragment strings, never the whole
    edge list. ``labels`` is an optional DataFrame (node_id, label).

    For a balanced tree, executor memory per task is O(subtree), driver
    memory is O(result string) — the unavoidable floor for a single text
    artifact; write fragments to a distributed sink instead when even the
    result doesn't fit.
    """
    import pandas as pd
    from pyspark.sql import functions as F

    spark = edges.sparkSession
    has_bl = "branch_length" in edges.columns
    has_ci = "child_index" in edges.columns
    sel = ["child_id", "parent_id"]
    sel.append(F.col("branch_length") if has_bl else F.lit(None).cast("double").alias("branch_length"))
    sel.append(F.col("child_index") if has_ci else F.lit(0).alias("child_index"))
    e = edges.select(*sel)

    rd = paths.where(F.col("ancestor_id") == root_id).select("node_id", "depth")
    if anchor_depth == "auto":
        # fanout-aware pick (api/v3.pick_anchor_depth, VERDICT r7 #7):
        # shallowest level whose largest fragment fits executor memory,
        # bounded by the driver-stitch collect. rd feeds three actions in
        # auto mode — materialize it once.
        from treemachine_spark.api.v3 import pick_anchor_depth

        member = e.select(F.col("child_id").alias("node_id"))
        rd = rd.join(member, "node_id", "left_semi").localCheckpoint(eager=True)
        anchor_depth = pick_anchor_depth(rd, member, paths)
    anchors = rd.where(F.col("depth") == anchor_depth).select(
        F.col("node_id").alias("anchor")
    )
    members = (
        paths.join(
            anchors.withColumnRenamed("anchor", "ancestor_id"), "ancestor_id"
        )
        .select(F.col("node_id").alias("child_id"), F.col("ancestor_id").alias("anchor"))
    )
    frag_edges = e.join(members, "child_id")
    if labels is not None:
        frag_edges = frag_edges.join(
            labels.select(F.col("node_id").alias("child_id"), F.col("label").alias("child_label")),
            "child_id",
            "left",
        )
    else:
        frag_edges = frag_edges.withColumn("child_label", F.lit(None).cast("string"))

    def asm(pdf: pd.DataFrame) -> pd.DataFrame:
        anchor = pdf["anchor"].iloc[0]
        rows = list(
            zip(pdf["child_id"], pdf["parent_id"], pdf["branch_length"], pdf["child_index"])
        )
        labs = {
            c: l
            for c, l in zip(pdf["child_id"], pdf["child_label"])
            if isinstance(l, str) and l
        }
        frag = assemble_newick(
            rows, anchor, labs, include_branch_lengths
        )[:-1]  # strip ';'; anchor's own label is added by the driver stitch
        return pd.DataFrame({"anchor": [anchor], "frag": [frag]})

    frags = {
        r["anchor"]: r["frag"]
        for r in frag_edges.groupBy("anchor").applyInPandas(
            asm, "anchor string, frag string"
        ).collect()
    }

    # driver side: the top anchor_depth levels only
    top_nodes = rd.where(F.col("depth") <= anchor_depth)
    top_edges = e.join(
        top_nodes.select(F.col("node_id").alias("child_id")), "child_id", "left_semi"
    )
    top_rows = [
        (r["child_id"], r["parent_id"], r["branch_length"], r["child_index"])
        for r in top_edges.collect()
    ]
    top_ids = {c for c, *_ in top_rows} | {root_id}
    top_labels = {}
    if labels is not None:
        ldf = labels.where(F.col("node_id").isin(list(top_ids)))
        top_labels = {
            r["node_id"]: r["label"] for r in ldf.collect() if r["label"]
        }
    overrides = {
        a: f + newick_escape(top_labels.get(a, "")) for a, f in frags.items()
    }
    return assemble_newick(
        top_rows, root_id, top_labels, include_branch_lengths, leaf_overrides=overrides
    )
