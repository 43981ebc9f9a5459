"""Majority-rule consensus tree construction over a set of input trees.

This is the classic multi-tree summary of phylogenetics (Margush &
McMorris 1981, Bull. Math. Biol. 43): keep every bipartition present in
more than half (generally: a threshold fraction) of the input trees; the
kept bipartitions are automatically pairwise compatible, so they assemble
into a unique tree. The reference's whole purpose is combining many
source trees into one synthesis (opentree/GraphImporter + synthesis
pipeline), but it ships no consensus operator — beyond-reference surface
squarely in the domain.

Spark-first shape: bipartition extraction per tree reuses the closure
fingerprint recipe (graph/compare.py) but carries the actual SORTED TIP
ARRAY as the group key, so counting support across trees is one exact
groupBy on the array — no hash-collision caveat, map-side partial agg,
and the shuffle carries only distinct bipartitions. The winning set is
result-scale (< n_tips per tree), so assembly (nesting the laminar
family) is a driver-side walk, like newick serialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from treemachine_spark.graph.closure import build_closure
from treemachine_spark.graph.traversal import leaf_set


def _bipartition_sets(edges: DataFrame, tip_labels: DataFrame) -> DataFrame:
    """Distinct non-trivial bipartitions of one tree as sorted tip-name
    arrays: (bip array<string>)."""
    paths = build_closure(edges.select("child_id", "parent_id"))
    tips = leaf_set(edges.select("child_id", "parent_id")).join(
        tip_labels, "node_id"
    )
    fp = (
        paths.join(tips, "node_id")
        .groupBy("ancestor_id")
        .agg(F.sort_array(F.collect_list("tip_label")).alias("bip"))
    )
    tot = fp.agg(F.max(F.size("bip")).alias("_tot"))
    return (
        fp.join(F.broadcast(tot))
        .where((F.size("bip") >= 2) & (F.size("bip") < F.col("_tot")))
        .select("bip")
        .distinct()
    )


def majority_bipartitions(spark, newicks: list[str], threshold: float = 0.5):
    """Bipartitions appearing in MORE THAN ``threshold`` fraction of the
    input trees, with their support counts: DataFrame (bip, n_trees).
    One union of per-tree bipartition tables + one exact groupBy."""
    from treemachine_spark.sources.newick import newick_to_dataframes

    parts = []
    for i, text in enumerate(newicks):
        nodes, edges = newick_to_dataframes(spark, text, f"c{i}")
        labels = nodes.where("is_leaf").select(
            "node_id", F.col("name").alias("tip_label")
        )
        parts.append(_bipartition_sets(edges, labels))
    allb = parts[0]
    for p in parts[1:]:
        allb = allb.unionByName(p)
    n = len(newicks)
    return (
        allb.groupBy("bip")
        .agg(F.count("*").alias("n_trees"))
        .where(F.col("n_trees") > n * threshold)
    )


def majority_consensus(spark, newicks: list[str], threshold: float = 0.5) -> str:
    """Majority-rule consensus newick (tips sorted for determinism).

    Kept bipartitions above a strict majority are pairwise compatible
    (each pair co-occurs in at least one tree), so they form a laminar
    family; assembly nests each cluster under the smallest cluster
    strictly containing it.
    """
    from treemachine_spark.sources.newick import parse_newick

    tipset = sorted(
        nd.label
        for nd in parse_newick(newicks[0]).nodes
        if nd.is_leaf
    )
    rows = majority_bipartitions(spark, newicks, threshold).collect()
    clusters = [frozenset(r["bip"]) for r in rows]
    clusters.append(frozenset(tipset))
    clusters.sort(key=len)
    parent: dict[int, int] = {}
    for i, c in enumerate(clusters):
        for j in range(i + 1, len(clusters)):
            if len(clusters[j]) > len(c) and c < clusters[j]:
                parent[i] = j
                break
    children: dict[int, list[int]] = {i: [] for i in range(len(clusters))}
    for i, j in parent.items():
        children[j].append(i)
    tip_home: dict[str, int] = {}
    for t in tipset:
        best = min(
            (i for i, c in enumerate(clusters) if t in c),
            key=lambda i: len(clusters[i]),
        )
        tip_home.setdefault(t, best)

    def emit(i: int) -> str:
        subs = [emit(k) for k in sorted(children[i], key=lambda k: min(clusters[k]))]
        direct = sorted(t for t, h in tip_home.items() if h == i)
        parts = sorted(direct) + subs
        return "(" + ",".join(parts) + ")"

    root = len(clusters) - 1
    return emit(root) + ";"
