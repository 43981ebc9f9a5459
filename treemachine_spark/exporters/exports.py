"""Offline exporters (S8, S10-S15) — reference: opentree/GraphExporter.java
and MainRunner CLI commands (opentree/MainRunner.java:500-519).

Each export computes its row set distributed (closure/edge joins) and only
assembles the final text on the driver — the reference walks the graph
node-by-node for all of these.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from treemachine_spark.exporters.newick_sink import assemble_newick
from treemachine_spark.ingest import GraphStore


def _subtree_edge_rows(store: GraphStore, start_node: str | None):
    edges = store.edges
    if start_node is not None:
        member = store.paths.where(F.col("ancestor_id") == start_node).select("node_id")
        edges = edges.join(
            member.withColumnRenamed("node_id", "child_id"), "child_id", "left_semi"
        )
    return edges


def dump_csv(store: GraphStore, out_path: str, start_node: str | None = None) -> DataFrame:
    """S13 — CSV edge dump (GraphExporter.dumpCSV, GraphExporter.java:543-575):
    childId,parentId,childName,parentName,source,brlen. Distributed write
    (one csv part per partition; coalesce for a single file if small)."""
    edges = _subtree_edge_rows(store, start_node)
    names = store.nodes.select("node_id", "name")
    out = (
        edges.join(names.withColumnRenamed("node_id", "child_id").withColumnRenamed("name", "child_name"), "child_id", "left")
        .join(
            names.withColumnRenamed("node_id", "parent_id").withColumnRenamed("name", "parent_name"),
            "parent_id",
            "left",
        )
        .select(
            F.col("child_id"),
            F.col("parent_id"),
            F.col("child_name"),
            F.col("parent_name"),
            F.lit(store.tree_id).alias("source"),
            F.col("branch_length").alias("brlen"),
        )
    )
    if out_path:
        out.write.mode("overwrite").option("header", True).csv(out_path)
    return out


def export_dot(store: GraphStore, start_node: str | None = None) -> str:
    """S10 — DOT/graphviz export (GraphExporter.getDot, GraphExporter.java:
    202-295): colored digraph of the edge set under a start node."""
    rows = _subtree_edge_rows(store, start_node).select("child_id", "parent_id").collect()
    lines = ["digraph G {"]
    for r in rows:
        lines.append(f'    "{r["child_id"]}" -> "{r["parent_id"]}" [color="blue"];')
    lines.append("}")
    return "\n".join(lines)


def export_graphml_simple(store: GraphStore, start_node: str | None = None) -> str:
    """S11 — simple GraphML (GraphExporter.getGraphMLSimple, GraphExporter.
    java:124-199): nodes with 'taxon' attrs, edges with 'sourcename'."""
    edges = _subtree_edge_rows(store, start_node)
    member = (
        edges.select(F.col("child_id").alias("node_id"))
        .unionByName(edges.select(F.col("parent_id").alias("node_id")))
        .distinct()
    )
    node_rows = store.nodes.join(member, "node_id", "left_semi").select("node_id", "name").collect()
    edge_rows = edges.select("child_id", "parent_id").collect()

    out = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        '<graphml xmlns="http://graphml.graphdrawing.org/xmlns">',
        '  <key id="taxon" for="node" attr.name="taxon" attr.type="string"/>',
        '  <key id="sourcename" for="edge" attr.name="sourcename" attr.type="string"/>',
        '  <graph id="G" edgedefault="directed">',
    ]
    for r in node_rows:
        nm = r["name"] or ""
        out.append(f'    <node id="{r["node_id"]}"><data key="taxon">{nm}</data></node>')
    for r in edge_rows:
        out.append(
            f'    <edge source="{r["child_id"]}" target="{r["parent_id"]}">'
            f'<data key="sourcename">{store.tree_id}</data></edge>'
        )
    out += ["  </graph>", "</graphml>"]
    return "\n".join(out)


def tax_source_flags(nodes: DataFrame) -> DataFrame:
    """P11 — per-node ``only_gbif`` flag: no entry of the packed tax-source
    list names ncbi (GraphExporter.buildTaxonomyTreeForWeb,
    opentree/GraphExporter.java:1108-1113 sets ``onlygbif`` on web-tree
    nodes). One array predicate in the projection — fused into the scan."""
    has_ncbi = F.exists("tax_sources", lambda s: s.contains("ncbi"))
    # NULL source list (unnamed internal node) is never flagged — the
    # reference only inspects taxonomy nodes
    return nodes.select(
        "node_id", F.coalesce(~has_ncbi, F.lit(False)).alias("only_gbif")
    )


def node_support_metrics(store: GraphStore) -> DataFrame:
    """A4/A5/A6 — per-node metrics for GraphML-with-metrics (S12,
    GraphExporter.getGraphML, GraphExporter.java:307-536):

      node_support      = |node's supported_by sources| /
                          |distinct sources over the node's subtree| (tips 1.0)
      effective_parents  = inverse Simpson over parallel edges to parents
                           (formula cite GraphExporter.java:302)
      effective_children = mirror over incoming edges

    In a single synthetic tree every child has one parent, so the inverse
    Simpson of parents is 1.0 — kept for parity with multi-edge graphs.
    One closure join + two grouped aggregations; fully distributed.
    """
    src = store.node_annotations.select(
        "node_id", F.map_keys(F.coalesce("supported_by", F.create_map())).alias("srcs")
    )
    own = src.select("node_id", F.size("srcs").alias("n_own"))
    # distinct sources over each node's descendant subtree (incl. itself)
    self_paths = store.nodes.select(
        F.col("node_id"), F.col("node_id").alias("ancestor_id")
    )
    sub_src = (
        store.paths.select("node_id", "ancestor_id")
        .unionByName(self_paths)
        .join(src, "node_id")
        .select("ancestor_id", F.explode_outer("srcs").alias("s"))
        .groupBy("ancestor_id")
        .agg(F.countDistinct("s").alias("n_subtree_sources"))
        .withColumnRenamed("ancestor_id", "node_id")
    )
    # effective parents/children (A5/A6): inverse Simpson of edge-count shares
    par = (
        store.edges.groupBy("child_id", "parent_id")
        .agg(F.count("*").alias("k"))
        .groupBy("child_id")
        .agg((F.pow(F.sum("k"), 2) / F.sum(F.pow("k", 2))).alias("effective_parents"))
        .withColumnRenamed("child_id", "node_id")
    )
    chi = (
        store.edges.groupBy("parent_id", "child_id")
        .agg(F.count("*").alias("k"))
        .groupBy("parent_id")
        .agg((F.pow(F.sum("k"), 2) / F.sum(F.pow("k", 2))).alias("effective_children"))
        .withColumnRenamed("parent_id", "node_id")
    )
    is_tip = store.nodes.select("node_id", "is_leaf")
    base = (
        is_tip.join(own, "node_id", "left")
        .join(sub_src, "node_id", "left")
        .join(par, "node_id", "left")
        .join(chi, "node_id", "left")
        .select(
            "node_id",
            F.when(F.col("is_leaf"), F.lit(1.0))
            .otherwise(
                F.coalesce(F.col("n_own"), F.lit(0))
                / F.greatest(F.coalesce(F.col("n_subtree_sources"), F.lit(0)), F.lit(1))
            )
            .alias("node_support"),
            F.coalesce("effective_parents", F.lit(0.0)).alias("effective_parents"),
            F.coalesce("effective_children", F.lit(0.0)).alias("effective_children"),
        )
    )
    # A7 — support-weighted average of effective_parents over each node's
    # subtree (incl. itself), propagated through the closure
    # (GraphExporter.getGraphML:434-480): one join + one grouped agg.
    weighted = (
        store.paths.select("node_id", "ancestor_id")
        .unionByName(self_paths)
        .join(
            base.select(
                "node_id",
                (F.col("effective_parents") * F.col("node_support")).alias("wep"),
                F.col("node_support").alias("wsup"),
            ),
            "node_id",
        )
        .groupBy("ancestor_id")
        .agg(
            (F.sum("wep") / F.greatest(F.sum("wsup"), F.lit(1e-12))).alias(
                "subtree_weighted_effpar"
            )
        )
        .withColumnRenamed("ancestor_id", "node_id")
    )
    return base.join(weighted, "node_id", "left")


def edge_support(store: GraphStore) -> DataFrame:
    """A8 — per-edge support (GraphExporter.getGraphML:427-433): parallel
    edge count over the distinct source count of the child's subtree."""
    parallel = store.edges.groupBy("child_id", "parent_id").agg(
        F.count("*").alias("n_parallel")
    )
    src = store.node_annotations.select(
        "node_id", F.map_keys(F.coalesce("supported_by", F.create_map())).alias("srcs")
    )
    self_paths = store.nodes.select(
        F.col("node_id"), F.col("node_id").alias("ancestor_id")
    )
    denom = (
        store.paths.select("node_id", "ancestor_id")
        .unionByName(self_paths)
        .join(src, "node_id")
        .select("ancestor_id", F.explode_outer("srcs").alias("s"))
        .groupBy("ancestor_id")
        .agg(F.countDistinct("s").alias("n_subtree_sources"))
        .withColumnRenamed("ancestor_id", "child_id")
    )
    return parallel.join(denom, "child_id", "left").select(
        "child_id",
        "parent_id",
        (
            F.col("n_parallel")
            / F.greatest(F.coalesce("n_subtree_sources", F.lit(0)), F.lit(1))
        ).alias("edge_support"),
    )


def export_graphml_metrics(store: GraphStore, start_node: str | None = None) -> str:
    """S12 — GraphML with computed support metrics."""
    metrics = {r["node_id"]: r for r in node_support_metrics(store).collect()}
    edges = _subtree_edge_rows(store, start_node)
    node_rows = store.nodes.select("node_id", "name").collect()
    edge_rows = edges.select("child_id", "parent_id").collect()
    out = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        '<graphml xmlns="http://graphml.graphdrawing.org/xmlns">',
        '  <key id="taxon" for="node" attr.name="taxon" attr.type="string"/>',
        '  <key id="support" for="node" attr.name="support" attr.type="double"/>',
        '  <key id="effpar" for="node" attr.name="effpar" attr.type="double"/>',
        '  <key id="effchi" for="node" attr.name="effchi" attr.type="double"/>',
        '  <graph id="G" edgedefault="directed">',
    ]
    for r in node_rows:
        m = metrics.get(r["node_id"])
        out.append(
            f'    <node id="{r["node_id"]}">'
            f'<data key="taxon">{r["name"] or ""}</data>'
            f'<data key="support">{m["node_support"] if m else 0.0}</data>'
            f'<data key="effpar">{m["effective_parents"] if m else 0.0}</data>'
            f'<data key="effchi">{m["effective_children"] if m else 0.0}</data>'
            "</node>"
        )
    for r in edge_rows:
        out.append(f'    <edge source="{r["child_id"]}" target="{r["parent_id"]}"/>')
    out += ["  </graph>", "</graphml>"]
    return "\n".join(out)


def mrp_matrix(store: GraphStore, start_node: str | None = None) -> DataFrame:
    """S14 — MRP (matrix representation with parsimony) dump
    (GraphExporter.getMRPDump, GraphExporter.java:588-632): one row per tip,
    one 0/1 column value per internal node, 1 iff the tip descends from it.

    Rebuild: the closure IS the membership matrix in sparse (tip, internal)
    form; the dense pivot happens only at sink time. Returns the sparse form
    (tip_id, internal_id, member) — scales to any tree, unlike a dense pivot.
    """
    paths = store.paths
    if start_node is not None:
        member = paths.where(F.col("ancestor_id") == start_node).select("node_id")
        paths = paths.join(member, "node_id", "left_semi")
    tips = store.nodes.where(F.col("is_leaf")).select("node_id")
    internals = store.nodes.where(~F.col("is_leaf")).select(
        F.col("node_id").alias("ancestor_id")
    )
    return (
        paths.join(tips, "node_id", "left_semi")
        .join(internals, "ancestor_id", "left_semi")
        .select(
            F.col("node_id").alias("tip_id"),
            F.col("ancestor_id").alias("internal_id"),
            F.lit(1).alias("member"),
        )
    )


class MRPTooBigError(ValueError):
    """The dense MRP text was asked to collect more sparse cells than its
    guard allows — the caller wants the distributed ``mrp_matrix`` form."""


def mrp_text(
    store: GraphStore,
    start_node: str | None = None,
    max_cells: int | None = 10_000_000,
) -> str:
    """Dense MRP text (small trees / compatibility sink).

    DRIVER-BOUND by construction: the dense matrix is one text artifact, so
    the sparse (tip, internal) cells are collected and pivoted on the
    driver — O(tips x internals) memory in the worst case. ``max_cells``
    gates it (v4/T2 size-gate discipline) with a LIMIT-bounded probe that
    scans at most ``max_cells + 1`` sparse rows; past the gate, use the
    distributed ``mrp_matrix`` (sparse, scales to any tree — write it to
    parquet/CSV and pivot downstream). ``max_cells=None`` opts out."""
    if max_cells is not None:
        probe = mrp_matrix(store, start_node).limit(max_cells + 1).count()
        if probe > max_cells:
            raise MRPTooBigError(
                f"mrp_text pivots on the driver and is guarded at "
                f"{max_cells} sparse cells (input has more): write "
                f"mrp_matrix (the distributed sparse form) instead, or "
                f"raise max_cells explicitly"
            )
    sparse = mrp_matrix(store, start_node).collect()
    internals = sorted({r["internal_id"] for r in sparse})
    by_tip: dict[str, set] = {}
    for r in sparse:
        by_tip.setdefault(r["tip_id"], set()).add(r["internal_id"])
    col_idx = {c: i for i, c in enumerate(internals)}
    lines = [f"{len(by_tip)} {len(internals)}"]
    for tip in sorted(by_tip):
        bits = ["0"] * len(internals)
        for c in by_tip[tip]:
            bits[col_idx[c]] = "1"
        lines.append(f"{tip}\t{''.join(bits)}")
    return "\n".join(lines)


def json_tree(store: GraphStore, start_node: str | None = None) -> str:
    """S8 — ad-hoc JSON tree (JadeNode.getJSON, jade/tree/deprecated/
    JadeNode.java:204-261): {name, nodeid, children, size}."""
    root = start_node or store.root_id
    edge_rows = (
        _subtree_edge_rows(store, root)
        .select("child_id", "parent_id", "child_index", "tip_descendants")
        .collect()
    )
    names = {
        r["node_id"]: r["name"]
        for r in store.nodes.select("node_id", "name").collect()
    }
    kids: dict[str, list] = {}
    sizes: dict[str, int] = {}
    for r in sorted(edge_rows, key=lambda r: (r["parent_id"], r["child_index"] or 0)):
        kids.setdefault(r["parent_id"], []).append(r["child_id"])
        sizes[r["child_id"]] = r["tip_descendants"]

    def build(nid):
        blob = {"name": names.get(nid) or "", "nodeid": nid, "size": sizes.get(nid, 0)}
        if nid in kids:
            blob["children"] = [build(c) for c in kids[nid]]
        return blob

    return json.dumps(build(root))


def taxonomy_to_newick(spark, taxonomy_path: str) -> str:
    """S15 — taxonomy TSV → newick (MainRunner.convertTaxonomy,
    opentree/MainRunner.java:250-367): adjacency from parent_uid, root = row
    with empty parent_uid, names scrubbed (offending chars → '_',
    MainRunner.java:315 / JadeNode.offendingChars)."""
    import re

    from treemachine_spark.sources.taxonomy import read_taxonomy_tsv

    tax = read_taxonomy_tsv(spark, taxonomy_path)
    rows = tax.select("uid", "parent_uid", "name").collect()
    scrub = re.compile(r"[\s_~`:;/\[\]{}|<>,.!@#$%^&*()?+=\\]+")
    edge_rows = [(r["uid"], r["parent_uid"]) for r in rows if r["parent_uid"]]
    labels = {r["uid"]: scrub.sub("_", r["name"] or "") for r in rows}
    roots = [r["uid"] for r in rows if not r["parent_uid"]]
    assert len(roots) == 1, f"expected 1 taxonomy root, got {roots}"
    return assemble_newick(edge_rows, roots[0], labels)
