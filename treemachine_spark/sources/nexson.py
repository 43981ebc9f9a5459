"""NexSON (NeXML-JSON) source (S4) — reference:
jade/tree/deprecated/NexsonReader.java:66-360.

Reads a phylografter study file and returns one ParsedTree per tree element:
otus give tip labels (ot:ottTaxonName / @label / ot:originalLabel priority as
in NexsonReader.java:120-160), edges give topology, @root marks the root.
Deprecated studies (ot:tag = 'deprecated') are skipped (:96-108).

Driver-side JSON parse (study files are small); the resulting trees go
straight to DataFrames via newick_to_dataframes-style construction.
"""

from __future__ import annotations

import json

from treemachine_spark.sources.newick import ParsedNode, ParsedTree


def _meta_map(obj) -> dict:
    """NexSON 'meta' lists: [{'@property': key, '@content'/'$': value}, ...]
    (NexsonReader.java:279-300 getMetaMap)."""
    out = {}
    metas = obj.get("meta", [])
    if isinstance(metas, dict):
        metas = [metas]
    for m in metas:
        key = m.get("@property") or m.get("@rel")
        val = m.get("@content", m.get("$"))
        if key is not None:
            out[key] = val
    return out


def read_nexson_trees(path_or_obj, skip_deprecated: bool = True) -> list[ParsedTree]:
    if isinstance(path_or_obj, str):
        with open(path_or_obj) as fh:
            study = json.load(fh)
    else:
        study = path_or_obj
    nexml = study["data"]["nexml"]

    study_meta = _meta_map(nexml)
    if skip_deprecated:
        tags = study_meta.get("ot:tag")
        tag_list = tags if isinstance(tags, list) else [tags] if tags else []
        if "deprecated" in tag_list:
            return []

    otus_raw = nexml["otus"]["otu"]
    if isinstance(otus_raw, dict):
        otus_raw = [otus_raw]
    otu_label: dict[str, str] = {}
    for otu in otus_raw:
        meta = _meta_map(otu)
        # label priority per NexsonReader.java:120-160
        label = (
            meta.get("ot:ottTaxonName")
            or otu.get("@label")
            or meta.get("ot:originalLabel")
        )
        otu_label[otu["@id"]] = label

    trees_raw = nexml["trees"]["tree"]
    if isinstance(trees_raw, dict):
        trees_raw = [trees_raw]

    out: list[ParsedTree] = []
    for t in trees_raw:
        nodes_raw = t["node"]
        edges_raw = t.get("edge", [])
        if isinstance(nodes_raw, dict):
            nodes_raw = [nodes_raw]
        if isinstance(edges_raw, dict):
            edges_raw = [edges_raw]

        parent_of: dict[str, str] = {}
        bl: dict[str, float] = {}
        child_index: dict[str, int] = {}
        per_parent: dict[str, int] = {}
        for e in edges_raw:
            child, parent = e["@target"], e["@source"]
            parent_of[child] = parent
            if "@length" in e:
                bl[child] = float(e["@length"])
            child_index[child] = per_parent.get(parent, 0)
            per_parent[parent] = child_index[child] + 1

        tree = ParsedTree()
        for nd in nodes_raw:
            nid = nd["@id"]
            label = otu_label.get(nd.get("@otu")) if nd.get("@otu") else None
            is_root = bool(nd.get("@root"))
            tree.nodes.append(
                ParsedNode(
                    node_id=nid,
                    label=label,
                    branch_length=bl.get(nid),
                    parent_id=parent_of.get(nid),
                    is_leaf=nid not in per_parent,
                    child_index=child_index.get(nid, 0),
                )
            )
            if is_root or nid not in parent_of:
                tree.root_id = tree.root_id or nid
        out.append(tree)
    return out
