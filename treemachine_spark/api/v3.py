"""tree_of_life v3 API — the reference's five REST endpoints rebuilt over
the Spark GraphStore (opentree/plugins/tree_of_life_v3.java).

Each method returns the response dict with the reference's exact field
semantics (validated by the ported ws-tests combinators in tests/):

  about            tree_of_life_v3.java:63-122  (doAbout)
  node_info        tree_of_life_v3.java:125-230 (doNodeInfo)
  mrca             tree_of_life_v3.java:258-363 (doMrca)
  subtree          tree_of_life_v3.java:522-722 (doSubtree)
  induced_subtree  tree_of_life_v3.java:411-518 (doInducedSubtree)

Execution model: all heavy lifting (resolution joins, MRCA aggregation,
closure filters) is distributed DataFrame work; only request-sized results
are collected for response assembly, so each endpoint scales with its
*answer*, not the tree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from treemachine_spark.api.errors import BadIdsError, BadInputError, TreeTooBigError
from treemachine_spark.exporters.newick_sink import assemble_newick
from treemachine_spark.graph import traversal as T
from treemachine_spark.ingest import GraphStore

_ANN_FIELDS = [
    "supported_by",
    "conflicts_with",
    "resolves",
    "resolved_by",
    "partial_path_of",
    "terminal",
]

LABEL_FORMATS = ("name", "id", "name_and_id")


def _blob_from_dict(d: dict, default_num_tips: int) -> dict:
    """One node's arguson/node_info blob from a plain field dict — shared
    by the driver path (Row.asDict()) and the distributed arguson path
    (json.loads of a to_json'd struct, where null fields are OMITTED), so
    both assemble structurally identical blobs. P1/P2 field semantics:
    GraphExplorer.getTaxonBlob/getNodeBlob (GraphExplorer.java:180-214);
    descendant_name_list for unnamed nodes per getNodeBlobArguson
    (GraphExplorer.java:415-429), present only when a first/last named
    descendant was joined in (``first_name``/``last_name`` keys)."""
    blob: dict = {"node_id": d["node_id"]}
    if d.get("name") is not None:
        blob["taxon"] = {
            "name": d.get("name"),
            "unique_name": d.get("unique_name"),
            "rank": d.get("rank"),
            "ott_id": int(d["ott_id"]),
            "tax_sources": list(d.get("tax_sources") or []),
        }
    td = d.get("tip_descendants")
    # root has no outgoing edge: num_tips from tree metadata
    # (GraphExplorer.getNumTipDescendants:245-260)
    blob["num_tips"] = default_num_tips if td is None else int(td)
    for f in _ANN_FIELDS:
        v = d.get(f)
        if v:
            blob[f] = {
                k: list(x) if isinstance(x, (list, tuple)) else x
                for k, x in v.items()
            }
    if d.get("name") is None and d.get("first_name") is not None:
        blob["descendant_name_list"] = [d["first_name"], d["last_name"]]
    return blob


def _make_arguson_asm(default_num_tips: int):
    """applyInPandas assembler for the distributed arguson path: one call
    per anchor subtree, building the anchor's fully-nested blob dict from
    flat (child_id, parent_id, child_index, blob_json) rows and returning
    it as ONE json string (the driver only stitches fragment dicts into
    the top levels — same shape as exporters.newick_sink.distributed_newick).

    Children are attached by dict REFERENCE in one linear pass (no
    recursive build), so assembly is O(subtree); only json.dumps nests.
    """
    import sys

    import pandas as pd

    def _null(v):
        return v is None or (isinstance(v, float) and v != v)  # None/NaN

    def asm(pdf: pd.DataFrame) -> pd.DataFrame:
        import json as _json

        anchor = pdf["anchor"].iloc[0]
        blobs: dict[str, dict] = {}
        recs = []
        for cid, pid, ci, bj in zip(
            pdf["child_id"], pdf["parent_id"], pdf["child_index"], pdf["blob_json"]
        ):
            d = _json.loads(bj) if isinstance(bj, str) else {}
            d["node_id"] = cid
            blobs[cid] = _blob_from_dict(d, default_num_tips)
            if not _null(pid):  # the anchor's own row has parent_id null
                recs.append((pid, 0 if _null(ci) else int(ci), cid))
        kids: dict[str, list] = {}
        for pid, ci, cid in sorted(recs):
            kids.setdefault(pid, []).append(cid)
        for pid, lst in kids.items():
            blobs[pid]["children"] = [blobs[c] for c in lst]
        # json.dumps recurses per nesting level; size the limit to the
        # fragment (the driver assembly path has the same floor)
        sys.setrecursionlimit(max(sys.getrecursionlimit(), len(blobs) + 1000))
        return pd.DataFrame(
            {"anchor": [anchor], "frag": [_json.dumps(blobs[anchor])]}
        )

    return asm

# The reference's static files host for preprocessed source trees
# (tree_of_life_v3.java:893-895).
DEFAULT_SOURCE_BASE = "http://files.opentreeoflife.org/preprocessed"


# auto anchor-depth bounds (VERDICT r7 #7): a fragment is one
# applyInPandas group, so its size is executor-memory-bound; the top
# stitch levels are collected, so their cumulative width is driver-bound
ARGUSON_FRAGMENT_TARGET = 100_000
ARGUSON_TOP_MAX = 200_000


def pick_anchor_depth(
    rd,
    member,
    paths,
    frag_target: int = ARGUSON_FRAGMENT_TARGET,
    top_max: int = ARGUSON_TOP_MAX,
):
    """Fanout-aware anchor depth for the distributed fragment assemblers
    (VERDICT r7 #7): instead of the fixed depth=2 (right for the
    production tree's ~10-fanout, wrong for skewed stores), read the
    subtree's actual shape — per-level width and the LARGEST single
    fragment an anchor at that level would own — and take the shallowest
    level whose max fragment fits ``frag_target``, never letting the
    collected top levels exceed ``top_max`` rows. One subtree-scale
    aggregation (descendant counts over the request's closure) + a
    depth-profile collect of O(tree height) rows.

    On a balanced fanout-f tree this returns the smallest d with
    n/f^d <= frag_target (depth 2 for the 2.42M-tip production shape —
    the r7 static default falls out as the computed answer); on a
    caterpillar every level has one giant fragment, so it returns the
    deepest level the driver stitch can afford — the best decomposition
    that exists for that shape.
    """
    desc = (
        paths.join(
            member.withColumnRenamed("node_id", "ancestor_id"),
            "ancestor_id",
            "left_semi",
        )
        .join(member, "node_id", "left_semi")
        .groupBy("ancestor_id")
        .agg(F.count("*").alias("cnt"))
    )
    stats = sorted(
        rd.join(desc.withColumnRenamed("ancestor_id", "node_id"), "node_id", "left")
        .groupBy("depth")
        .agg(
            F.count("*").alias("width"),
            (F.max(F.coalesce(F.col("cnt"), F.lit(0))) + 1).alias("max_frag"),
        )
        .collect(),
        key=lambda r: r["depth"],
    )
    cum = 0
    best = None  # (max_frag, depth)
    for r in stats:
        cum += r["width"]
        if cum > top_max:
            break
        if best is None or r["max_frag"] < best[0]:
            best = (r["max_frag"], r["depth"])
        if r["max_frag"] <= frag_target:
            return r["depth"]
    return best[1] if best else 1


def fetch_source_newick(source: str, synth_id: str, base: str = DEFAULT_SOURCE_BASE) -> str | None:
    """Fetch the processed source-tree newick for ``source``
    (``{study_id}_{tree_id}``), mirroring getSourceTree
    (tree_of_life_v3.java:888-907): location is
    ``{base}/v{version}/trees/{source}.tre`` with version = synth_id minus
    its "opentree" prefix; only the FIRST LINE is returned (the reference
    does a single readLine); any fetch failure returns None (the reference
    swallows the exception and returns null).

    ``base`` may be an http(s)/file URL base or a local directory — the
    local form is the deployment where preprocessed trees sit next to the
    parquet store.
    """
    version = synth_id.replace("opentree", "")
    loc = f"{base}/v{version}/trees/{source}.tre"
    try:
        if "://" in base:
            import urllib.request

            with urllib.request.urlopen(loc, timeout=30) as resp:
                line = resp.readline()
            return line.decode("utf-8").rstrip("\r\n")
        with open(loc, encoding="utf-8") as fh:
            return fh.readline().rstrip("\r\n")
    except Exception:
        return None


class TreeOfLifeV3:
    def __init__(
        self,
        store: GraphStore,
        max_tips_newick: int | None = 100_000,
        max_tips_arguson: int | None = 25_000,
        enforce_caps: bool = False,
        pruned_closure_table: str | None = None,
    ):
        """``enforce_caps=False`` by default: Spark removes the reason for
        the reference's hard 100k/25k caps (tree_of_life_v3.java:591-592);
        set True for byte-level API parity.

        ``pruned_closure_table`` names a ``write_bucketed_closure``
        warehouse table for this store: request-scale closure fetches
        (mrca, node_info lineage, induced_subtree, the MRTA probe) then
        read ONLY the node_id buckets the request's ids hash to instead of
        InSet-scanning the cached closure — the 100 TB serving shape,
        where the closure is never executor-cache-resident (VERDICT r4
        #3; per-request catalog re-planning costs ~0.2 s locally, numbers
        in NOTES_r5)."""
        self.store = store
        self.max_tips_newick = max_tips_newick
        self.max_tips_arguson = max_tips_arguson
        self.enforce_caps = enforce_caps
        self.pruned_closure_table = pruned_closure_table
        # tiny dimension tables, kept driver-side (broadcast-equivalent)
        self._source_map = {
            r["source_id"]: {
                k: r[k] for k in ("study_id", "tree_id", "git_sha") if r[k] is not None
            }
            for r in store.source_map.collect()
        }

    # ------------------------------------------------------------------
    # resolution (L1-L4)
    # ------------------------------------------------------------------

    def _resolve_many(self, node_ids, ott_ids):
        """L4 — one join pass instead of the reference's per-id index loop
        (tree_of_life_v3.java:292-330). Returns (found_node_ids ordered,
        node_ids_not_in_tree, ott_ids_not_in_tree)."""
        spark = self.store.nodes.sparkSession
        node_ids = list(node_ids or [])
        ott_ids = [int(o) for o in (ott_ids or [])]
        found: list[str] = []
        bad_nodes: list[str] = []
        bad_otts: list[int] = []
        if node_ids:
            req = T.local_df(spark, [(i,) for i in node_ids], "node_id string")
            hits = {
                r["node_id"]
                for r in self.store.nodes.join(
                    F.broadcast(req), "node_id", "left_semi"
                ).collect()
            }
            for i in node_ids:
                (found if i in hits else bad_nodes).append(i)
        if ott_ids:
            req = T.local_df(spark, [(int(i),) for i in ott_ids], "ott_id long")
            hits = {
                r["ott_id"]: r["node_id"]
                for r in self.store.nodes.join(
                    F.broadcast(req), "ott_id", "left_semi"
                ).select("ott_id", "node_id").collect()
            }
            for i in ott_ids:
                if i in hits:
                    found.append(hits[i])
                else:
                    bad_otts.append(i)
        return found, bad_nodes, bad_otts

    def _resolve_one(self, node_id=None, ott_id=None) -> dict:
        """L2/L3 — single lookup; errors per badOTTIDError/badNodeIDError
        (tree_of_life_v3.java:733-745)."""
        if node_id is None and ott_id is None:
            raise BadInputError('Must provide a "node_id" or "ott_id" argument.')
        if node_id is not None and ott_id is not None:
            raise BadInputError('Provide only one "node_id" or "ott_id" argument.')
        if ott_id is not None:
            rows = self.store.nodes.where(F.col("ott_id") == int(ott_id)).collect()
            if not rows:
                raise BadInputError(f"Could not find any synthetic tree node corresponding to the 'ott_id' arg: '{ott_id}'.")
        else:
            rows = self.store.nodes.where(F.col("node_id") == node_id).collect()
            if not rows:
                raise BadInputError(f"Could not find any synthetic tree node corresponding to the 'node_id' arg: '{node_id}'.")
        return rows[0].asDict()

    # ------------------------------------------------------------------
    # blobs (P1/P2, A3)
    # ------------------------------------------------------------------

    @staticmethod
    def _taxon_blob(row: dict) -> dict:
        """P1 — GraphExplorer.getTaxonBlob (GraphExplorer.java:180-193)."""
        return {
            "name": row["name"],
            "unique_name": row["unique_name"],
            "rank": row["rank"],
            "ott_id": int(row["ott_id"]),
            "tax_sources": list(row["tax_sources"] or []),
        }

    def _node_blobs(self, node_ids: list[str], unique_sources: set | None = None) -> dict[str, dict]:
        """P2 — GraphExplorer.getNodeBlob (GraphExplorer.java:203-214) for a
        batch of nodes in ONE join (the reference loops per node)."""
        spark = self.store.nodes.sparkSession
        req = T.local_df(spark, [(i,) for i in node_ids], "node_id string")
        rows = (
            req.join(self.store.nodes, "node_id", "left")
            .join(self.store.node_annotations, "node_id", "left")
            .join(
                self.store.edges.select(
                    F.col("child_id").alias("node_id"), "tip_descendants"
                ),
                "node_id",
                "left",
            )
            .collect()
        )
        blobs: dict[str, dict] = {}
        default = int(self.store.tree_meta.get("num_tips", 0))
        # leaf num_tips: the reference stores tip_descendants of the
        # subtree below the edge; keep stored semantics (ingest A1, the
        # reference's getDescendantLeavesNumbers).
        for r in rows:
            d = r.asDict()
            blobs[d["node_id"]] = _blob_from_dict(d, default)
            if unique_sources is not None:
                for f in _ANN_FIELDS:
                    v = d.get(f)
                    if v:
                        unique_sources.update(v.keys())
        return blobs

    def _source_id_map(self, sources: set) -> dict:
        """A3/getSourceIDMap (GraphExplorer.java:217-224): map each source id
        through the source-map table; taxonomy sources (e.g. 'ott2.9draft12')
        get a taxonomy blob."""
        out = {}
        for s in sorted(sources):
            if s in self._source_map:
                out[s] = self._source_map[s]
            elif s.startswith("ott"):
                out[s] = {"taxonomy": "ott", "version": s[3:]}
            else:
                out[s] = {}
        return out

    def _distinct_sources_df(
        self, member: DataFrame, fields: tuple = ("supported_by",)
    ) -> DataFrame:
        """Vocabulary-scale distinct annotation source keys for a member
        node set (A2 input). The explode is subtree-scale (member edges ×
        annotation keys) but the DISTINCT runs executor-side, so the
        DataFrame this returns — the only thing collected — has one row
        per distinct source id (hundreds at most). VERDICT r6 #2:
        GraphExplorer.getSupportingStudies (GraphExplorer.java:358-399) is
        a set union; distinct() is that union before the driver transfer.
        ``fields`` widens the key scan to more annotation maps (arguson
        collects keys from all of _ANN_FIELDS, getSourceIDMap input)."""
        ann = self.store.node_annotations.join(member, "node_id", "left_semi")
        keys = F.flatten(
            F.array(
                *[
                    F.coalesce(F.map_keys(f), F.array().cast("array<string>"))
                    for f in fields
                ]
            )
        )
        return ann.select(F.explode(keys).alias("s")).distinct()

    def _supporting_studies(self, sources: set) -> list[str]:
        """A2 — GraphExplorer.getSupportingStudies (GraphExplorer.java:
        356-399): supported_by source keys → study ids, deduped."""
        out = set()
        for s in sources:
            sid = self._source_map.get(s, {}).get("study_id")
            if sid and sid != "null":
                out.add(sid)
        return sorted(out)

    # ------------------------------------------------------------------
    # labels (P8)
    # ------------------------------------------------------------------

    def _labels(self, node_rows, label_format: str, ids_for_unnamed: bool) -> dict[str, str]:
        """P8 — GraphExplorer.getNodeLabel (GraphExplorer.java:673-694)."""
        labels = {}
        for r in node_rows:
            name = r["name"]
            if name is not None:
                if label_format == "name":
                    lab = name
                elif label_format == "id":
                    lab = r["node_id"]
                else:  # name_and_id
                    lab = f"{name}_ott{r['ott_id']}"
            elif ids_for_unnamed:
                lab = r["node_id"]
            else:
                lab = ""
            labels[r["node_id"]] = lab
        return labels

    @staticmethod
    def _check_label_format(label_format: str | None) -> str:
        if label_format is None:
            return "name_and_id"
        if label_format not in LABEL_FORMATS:
            raise BadInputError(
                f"Invalid 'label_format' arg: '{label_format}'. "
                'Valid formats: "name", "id", or "name_and_id" (default).'
            )
        return label_format

    # ------------------------------------------------------------------
    # endpoints
    # ------------------------------------------------------------------

    def about(self, include_source_list: bool = False) -> dict:
        """A10 — doAbout (tree_of_life_v3.java:63-122)."""
        meta = self.store.tree_meta
        res = {
            "synth_id": self.store.tree_id,
            "date_created": meta.get("date_completed"),
            "taxonomy_version": meta.get("taxonomy_version"),
            "num_source_studies": meta.get("num_source_studies"),
            "num_source_trees": meta.get("num_source_trees"),
            "filtered_flags": list(meta.get("filtered_flags", [])),
            "root": self._node_blobs([self.store.root_id])[self.store.root_id],
        }
        if include_source_list:
            res["source_list"] = list(meta.get("sources", []))
            res["source_id_map"] = self._source_id_map(set(self._source_map))
        return res

    def source_tree(self, study_id: str, tree_id: str, format: str | None = None,
                    source_base: str | None = None) -> dict:
        """S5 — source_tree (tree_of_life_v3.java:822-884): return the
        processed input source tree for ``study_id@tree_id`` as newick.

        The reference fetches ``{study}_{tree}.tre`` over HTTP from a static
        files host derived from the synth id
        (``getSourceTree``, tree_of_life_v3.java:888-907: urlbase =
        files host + /v{version}/trees/, version = synth_id minus the
        "opentree" prefix, first line of the response). Here ``source_base``
        names either a local directory or an http(s) URL base with the same
        ``v{version}/trees/{source}.tre`` layout; per the reference, a failed
        fetch (missing file / bad id) is the *only* source validation —
        "Invalid source id" — and ``format`` is accepted but ignored (newick
        is the only format, the reference never validates it).

        synth_id selection happens one level up (TreeRegistry.get), exactly
        like every other endpoint: the bound store IS the chosen synth tree.
        """
        source = f"{study_id}_{tree_id}"
        newick = fetch_source_newick(
            source, self.store.tree_id,
            source_base if source_base is not None else DEFAULT_SOURCE_BASE,
        )
        if newick is None:
            raise BadInputError(f"Invalid source id '{source}' provided.")
        return {"newick": newick, "synth_id": self.store.tree_id}

    def _request_closure(self, ids):
        """Closure rows for a request's id set via the bucket-pruned
        catalog fetch (ingest.read_pruned_closure) when the store has the
        bucketed layout; None otherwise (callers fall back to the cached-
        closure InSet scan). Above the driver gate the joined recipes want
        the full closure, so the pruned fetch is skipped there too."""
        if (
            self.pruned_closure_table is None
            or len(ids) > T.DRIVER_PATH_MAX_TIPS
        ):
            return None
        from treemachine_spark.ingest import read_pruned_closure

        return read_pruned_closure(
            self.store.nodes.sparkSession,
            self.pruned_closure_table,
            list(ids),
            synth_id=self.store.tree_id,
        )

    def node_info(self, node_id=None, ott_id=None, include_lineage: bool = False) -> dict:
        """doNodeInfo (tree_of_life_v3.java:157-230); lineage is T8
        (GraphExplorer.getLineage:228-236), parent-first ordering."""
        row = self._resolve_one(node_id, ott_id)
        qid = row["node_id"]
        sources: set = set()
        res = dict(self._node_blobs([qid], sources)[qid])
        if include_lineage:
            src = self._request_closure([qid])
            anc = [
                r["ancestor_id"]
                for r in T.path_to_root(
                    src if src is not None else self.store.paths, qid
                ).collect()
            ]
            blobs = self._node_blobs(anc, sources) if anc else {}
            res["lineage"] = [blobs[a] for a in anc]
        res["source_id_map"] = self._source_id_map(sources)
        return res

    def mrca(self, node_ids=None, ott_ids=None) -> dict:
        """doMrca (tree_of_life_v3.java:258-363): T2 over the closure, T3
        nearest taxon when the MRCA is unnamed, 400-with-payload on bad ids."""
        if not node_ids and not ott_ids:
            raise BadInputError("You must supply at least one node_id or ott_id.")
        found, bad_nodes, bad_otts = self._resolve_many(node_ids, ott_ids)
        if not found:
            raise BadIdsError(
                "No valid ids provided.",
                {"ott_ids_not_in_tree": bad_otts, "node_ids_not_in_tree": bad_nodes},
            )
        spark = self.store.nodes.sparkSession
        pruned = self._request_closure(found)
        mrca_row = T.mrca(
            self.store.paths_with_self(),
            found,
            paths=pruned if pruned is not None else self.store.paths,
            root_id=self.store.root_id,
        ).collect()[0]
        mrca_id = mrca_row["mrca_node_id"]

        res: dict = {}
        sources: set = set()
        res["mrca"] = self._node_blobs([mrca_id], sources)[mrca_id]
        res["source_id_map"] = self._source_id_map(sources)
        if bad_otts:
            res["ott_ids_not_in_tree"] = bad_otts
        if bad_nodes:
            res["node_ids_not_in_tree"] = bad_nodes

        if "taxon" not in res["mrca"]:
            # T3 — nearest taxonomic ancestor (GraphExplorer.java:654-664)
            named = self.store.nodes.where(F.col("ott_id").isNotNull()).select(
                F.col("node_id").alias("ancestor_id")
            )
            mrca_paths = self._request_closure([mrca_id])
            mrta_row = (
                (mrca_paths if mrca_paths is not None else self.store.paths)
                .where(F.col("node_id") == mrca_id)
                .join(named, "ancestor_id")
                .orderBy("depth")
                .limit(1)
                .collect()
            )
            if mrta_row:
                trow = self.store.nodes.where(
                    F.col("node_id") == mrta_row[0]["ancestor_id"]
                ).collect()[0]
                res["nearest_taxon"] = self._taxon_blob(trow.asDict())

        if bad_otts or bad_nodes:
            raise BadIdsError("Some ids not found or not in tree.", res)
        return res

    def subtree(
        self,
        node_id=None,
        ott_id=None,
        tree_format: str | None = None,
        label_format: str | None = None,
        height_limit: int | None = None,
        include_all_node_labels: bool = False,
    ) -> dict:
        """doSubtree (tree_of_life_v3.java:566-722): newick (full or
        depth-limited, T4/T7) or arguson (S9, default depth 5)."""
        tree_format = tree_format or "newick"
        if tree_format not in ("newick", "arguson"):
            raise BadInputError(
                f"Invalid 'format' arg: '{tree_format}'. "
                'Valid formats: "newick" (default) or "arguson".'
            )
        label_format = self._check_label_format(label_format)
        row = self._resolve_one(node_id, ott_id)
        qid = row["node_id"]

        if tree_format == "newick":
            depth = height_limit if height_limit is not None else -1
            cap = self.max_tips_newick if self.enforce_caps else None
            return self._subtree_newick(qid, depth, label_format, include_all_node_labels, cap)
        depth = height_limit if height_limit is not None else 5
        cap = self.max_tips_arguson if self.enforce_caps else None
        return {"arguson": self._arguson(qid, depth, cap)}

    def _subtree_edges(self, qid: str, depth: int):
        sub = self.store.paths.where(F.col("ancestor_id") == qid)
        if depth >= 0:
            sub = sub.where(F.col("depth") <= depth)
        member = sub.select("node_id")
        return (
            self.store.edges.join(
                member.withColumnRenamed("node_id", "child_id"), "child_id", "left_semi"
            )
            # keep only edges whose parent is inside the subtree or is qid
            .join(
                member.unionByName(
                    T.local_df(member.sparkSession, [(qid,)], "node_id string")
                ).withColumnRenamed("node_id", "parent_id"),
                "parent_id",
                "left_semi",
            )
        )

    def _guard(self, qid: str, depth: int, cap: int | None) -> None:
        """O3 — pre-flight size guard (tree_of_life_v3.java:685-700):
        O(1) stored tip_descendants when unbounded, T5 count when bounded."""
        if cap is None:
            return
        if depth < 0:
            edge = self.store.edges.where(F.col("child_id") == qid).collect()
            n = (
                int(edge[0]["tip_descendants"])
                if edge
                else int(self.store.tree_meta.get("num_tips", 0))
            )
        else:
            sub = self._subtree_edges(qid, depth)
            n = (
                sub.select(F.col("child_id").alias("node_id"))
                .join(
                    sub.select(F.col("parent_id").alias("node_id")).distinct(),
                    "node_id",
                    "left_anti",
                )
                .count()
            )
        if n > cap:
            raise TreeTooBigError(
                f"Requested tree ({n} tips) is larger than currently allowed ({cap} tips)."
            )

    # above this many subtree edges, newick assembly shifts to the
    # distributed fragment path (exporters.newick_sink.distributed_newick) —
    # the reference instead refuses requests over 100k tips
    DISTRIBUTED_NEWICK_THRESHOLD = 200_000

    def _subtree_newick(self, qid, depth, label_format, ids_for_unnamed, cap) -> dict:
        self._guard(qid, depth, cap)
        edges = self._subtree_edges(qid, depth)
        n_edges = edges.count()

        member = edges.select(F.col("child_id").alias("node_id"))
        sources: set = {
            r["s"] for r in self._distinct_sources_df(member).collect()
        }

        if n_edges > self.DISTRIBUTED_NEWICK_THRESHOLD:
            from treemachine_spark.exporters.newick_sink import distributed_newick

            spark = self.store.nodes.sparkSession
            member_plus = member.unionByName(
                T.local_df(spark, [(qid,)], "node_id string")
            )
            labels_df = self._labels_df(member_plus, label_format, ids_for_unnamed)
            newick = distributed_newick(
                edges, self.store.paths, qid, labels_df, anchor_depth="auto"
            )
        else:
            rows = edges.select(
                "child_id", "parent_id", "branch_length", "child_index"
            ).collect()
            member_ids = {r["child_id"] for r in rows} | {qid}
            spark = self.store.nodes.sparkSession
            mdf = T.local_df(spark, [(i,) for i in member_ids], "node_id string")
            node_rows = self.store.nodes.join(
                F.broadcast(mdf), "node_id", "left_semi"
            ).collect()
            labels = self._labels(node_rows, label_format, ids_for_unnamed)
            newick = assemble_newick(
                [
                    (r["child_id"], r["parent_id"], r["branch_length"], r["child_index"])
                    for r in rows
                ],
                qid,
                labels,
            )
        return {
            "newick": newick,
            "supporting_studies": self._supporting_studies(sources),
        }

    def _labels_df(self, member, label_format: str, ids_for_unnamed: bool):
        """Column-expression twin of _labels (P8) for the distributed path —
        labels computed executor-side, never collected."""
        nodes = self.store.nodes.join(member, "node_id", "left_semi")
        if label_format == "name":
            named = F.col("name")
        elif label_format == "id":
            named = F.col("node_id")
        else:
            named = F.concat(F.col("name"), F.lit("_ott"), F.col("ott_id").cast("string"))
        unnamed = F.col("node_id") if ids_for_unnamed else F.lit("")
        return nodes.select(
            "node_id",
            F.when(F.col("name").isNotNull(), named).otherwise(unnamed).alias("label"),
        )

    # above this many subtree edges, arguson blob assembly shifts to the
    # distributed fragment path (per-anchor applyInPandas, the
    # distributed_newick trick) — the reference instead refuses requests
    # over 25k tips (tree_of_life_v3.java:592,711-716)
    DISTRIBUTED_ARGUSON_THRESHOLD = 200_000

    def _arguson(self, qid: str, depth: int, cap: int | None) -> dict:
        """S9 — getArgusonData (GraphExplorer.java:342-354,434-447): nested
        node blobs with children (depth-limited) + lineage + source_id_map.
        Unnamed nodes get descendant_name_list (getNodeBlobArguson,
        GraphExplorer.java:415-429) via the T9 min/max-named-descendant
        recipe — one batched aggregation instead of per-node recursion.
        Past DISTRIBUTED_ARGUSON_THRESHOLD edges the nested blobs are
        assembled executor-side per anchor subtree (VERDICT r6 #4 — the
        cap the reference hard-codes becomes opt-in, like newick's)."""
        self._guard(qid, depth, cap)
        edges = self._subtree_edges(qid, depth)
        spark = self.store.nodes.sparkSession
        member = edges.select(F.col("child_id").alias("node_id"))
        member_plus = member.unionByName(
            T.local_df(spark, [(qid,)], "node_id string")
        )
        # arguson collects source keys from ALL annotation maps
        # (getSourceIDMap input) — vocabulary-scale distinct, A2 discipline
        sources: set = {
            r["s"]
            for r in self._distinct_sources_df(
                member_plus, fields=tuple(_ANN_FIELDS)
            ).collect()
        }
        n_edges = edges.count()
        if n_edges > self.DISTRIBUTED_ARGUSON_THRESHOLD:
            top = self._arguson_distributed(qid, edges, member)
        else:
            top = self._arguson_driver(qid, edges)
        anc = [r["ancestor_id"] for r in T.path_to_root(self.store.paths, qid).collect()]
        lineage_blobs = self._node_blobs(anc, sources) if anc else {}
        top["lineage"] = [lineage_blobs[a] for a in anc]
        top["source_id_map"] = self._source_id_map(sources)
        return top

    def _fill_descendant_names(self, blobs: dict[str, dict], skip=()) -> None:
        """descendant_name_list for unnamed blobs (request-scale isin over
        the T9 aggregate)."""
        from treemachine_spark.graph.traversal import representative_names

        unnamed = [
            nid
            for nid, b in blobs.items()
            if "taxon" not in b and nid not in skip
        ]
        if not unnamed:
            return
        reps = (
            representative_names(self.store.paths, self.store.nodes)
            .where(F.col("ancestor_id").isin(unnamed))
            .collect()
        )
        rep_map = {
            r["ancestor_id"]: [r["first_name"], r["last_name"]] for r in reps
        }
        for nid in unnamed:
            if nid in rep_map:
                blobs[nid]["descendant_name_list"] = rep_map[nid]

    def _arguson_driver(self, qid: str, edges) -> dict:
        """Driver-side nested-blob assembly (requests within the
        reference's own working envelope; default depth 5)."""
        rows = edges.select("child_id", "parent_id", "child_index").collect()
        member = [r["child_id"] for r in rows] + [qid]
        blobs = self._node_blobs(member)
        self._fill_descendant_names(blobs)
        kids: dict[str, list] = {}
        for r in sorted(rows, key=lambda r: (r["parent_id"], r["child_index"] or 0)):
            kids.setdefault(r["parent_id"], []).append(r["child_id"])
        def build(nid: str) -> dict:
            blob = dict(blobs[nid])
            if nid in kids:
                blob["children"] = [build(c) for c in kids[nid]]
            return blob
        return build(qid)

    def _arguson_distributed(
        self, qid: str, edges, member, anchor_depth: int | str = "auto"
    ) -> dict:
        """Scalable arguson assembly (VERDICT r6 #4): per-node blob fields
        are serialized executor-side (to_json struct — null fields omitted,
        matching _blob_from_dict's .get semantics), nested fragments are
        built per 'anchor' subtree in ONE applyInPandas pass, and the
        driver stitches only the top ``anchor_depth`` levels — so driver
        work is O(result dict), never O(edge rows collected + per-row
        Python blob building). Same anchor decomposition as
        exporters.newick_sink.distributed_newick; removes the reason for
        the reference's 25k-tip arguson cap (tree_of_life_v3.java:592)."""
        import json as _json

        from treemachine_spark.graph.traversal import representative_names

        e = edges.select("child_id", "parent_id", "child_index")
        # rd feeds up to three actions (depth pick, anchors, top stitch) —
        # materialize once instead of re-deriving the paths subplan
        rd = (
            self.store.paths.where(F.col("ancestor_id") == qid)
            .select("node_id", "depth")
            .join(member, "node_id", "left_semi")
        ).localCheckpoint(eager=True)
        if anchor_depth == "auto":
            anchor_depth = pick_anchor_depth(rd, member, self.store.paths)
        anchors = rd.where(F.col("depth") == anchor_depth).select(
            F.col("node_id").alias("anchor")
        )

        # ---- executor-side blob fields for every fragment member -------
        # rep names only for unnamed members (pre-filter paths so the T9
        # aggregate runs over the request's subtree, not the whole store)
        unnamed_members = (
            self.store.nodes.where(F.col("name").isNull())
            .select("node_id")
            .join(member, "node_id", "left_semi")
        )
        reps = representative_names(
            self.store.paths.join(
                unnamed_members.withColumnRenamed("node_id", "ancestor_id"),
                "ancestor_id",
                "left_semi",
            ),
            self.store.nodes,
        ).withColumnRenamed("ancestor_id", "node_id")
        info = (
            self.store.nodes.join(self.store.node_annotations, "node_id", "left")
            .join(
                self.store.edges.select(
                    F.col("child_id").alias("node_id"), "tip_descendants"
                ),
                "node_id",
                "left",
            )
            .join(reps, "node_id", "left")
            .select(
                F.col("node_id").alias("child_id"),
                F.to_json(
                    F.struct(
                        "name",
                        "unique_name",
                        "rank",
                        "ott_id",
                        "tax_sources",
                        "tip_descendants",
                        *_ANN_FIELDS,
                        "first_name",
                        "last_name",
                    )
                ).alias("blob_json"),
            )
        )

        # ---- per-anchor fragments (one shuffle + one applyInPandas) ----
        amembers = (
            self.store.paths.join(
                anchors.withColumnRenamed("anchor", "ancestor_id"), "ancestor_id"
            )
            .select(
                F.col("node_id").alias("child_id"),
                F.col("ancestor_id").alias("anchor"),
            )
            .join(
                member.withColumnRenamed("node_id", "child_id"),
                "child_id",
                "left_semi",
            )
        )
        anchor_self = anchors.select(
            F.col("anchor").alias("child_id"),
            F.lit(None).cast("string").alias("parent_id"),
            F.lit(0).alias("child_index"),
            "anchor",
        )
        frag_rows = e.join(amembers, "child_id").unionByName(anchor_self)
        asm = _make_arguson_asm(int(self.store.tree_meta.get("num_tips", 0)))
        frags = {
            r["anchor"]: _json.loads(r["frag"])
            for r in frag_rows.join(info, "child_id", "left")
            .groupBy("anchor")
            .applyInPandas(asm, "anchor string, frag string")
            .collect()
        }

        # ---- driver stitch: the top anchor_depth levels only ------------
        top_edges = e.join(
            rd.where(F.col("depth") <= anchor_depth).select(
                F.col("node_id").alias("child_id")
            ),
            "child_id",
            "left_semi",
        )
        rows = top_edges.collect()
        blobs = self._node_blobs([r["child_id"] for r in rows] + [qid])
        # anchors' blobs (incl. their descendant_name_list) live in frags
        self._fill_descendant_names(blobs, skip=frags)
        blobs.update(frags)
        kids: dict[str, list] = {}
        for r in sorted(rows, key=lambda r: (r["parent_id"], r["child_index"] or 0)):
            kids.setdefault(r["parent_id"], []).append(r["child_id"])
        def build(nid: str) -> dict:
            blob = dict(blobs[nid])
            if nid in kids:
                blob["children"] = [build(c) for c in kids[nid]]
            return blob
        return build(qid)

    def induced_subtree(self, node_ids=None, ott_ids=None, label_format=None) -> dict:
        """doInducedSubtree (tree_of_life_v3.java:411-518): T6 over the
        closure; 400-with-payload when ids are bad (BadIdsException)."""
        label_format = self._check_label_format(label_format)
        found, bad_nodes, bad_otts = self._resolve_many(node_ids, ott_ids)
        if len(found) < 2:
            raise BadInputError(
                "Not enough valid node ids provided to construct a subtree "
                "(there must be at least two)."
            )
        spark = self.store.nodes.sparkSession
        # the induced fast path only reads depth>0 closure rows of the
        # request tips — exactly what the bucket-pruned fetch returns
        pruned = self._request_closure(found)
        ind_edges = T.induced_subtree(
            pruned if pruned is not None else self.store.paths_with_self(),
            found,
        )
        rows = [(r["child_id"], r["parent_id"]) for r in ind_edges.collect()]
        members = {c for c, _ in rows} | {p for _, p in rows}
        root_candidates = {p for _, p in rows} - {c for c, _ in rows}
        root_id = root_candidates.pop() if root_candidates else found[0]

        mdf = T.local_df(spark, [(i,) for i in members], "node_id string")
        node_rows = self.store.nodes.join(F.broadcast(mdf), "node_id", "left_semi").collect()
        labels = self._labels(node_rows, label_format, ids_for_unnamed=True)

        # request-scale input, but dedup executor-side anyway (same
        # vocabulary-scale-collect shape as _subtree_newick)
        sources: set = {
            r["s"]
            for r in self._distinct_sources_df(F.broadcast(mdf)).collect()
        }

        res: dict = {}
        if bad_otts:
            res["ott_ids_not_in_tree"] = bad_otts
        if bad_nodes:
            res["node_ids_not_in_tree"] = bad_nodes
        res["newick"] = assemble_newick(rows, root_id, labels)
        res["supporting_studies"] = self._supporting_studies(sources)
        if bad_otts or bad_nodes:
            raise BadIdsError("Some ids not found or not in tree.", res)
        return res
