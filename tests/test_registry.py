"""Multi-tree registry: L9/L10 semantics, synth_id resolution, store
save/load roundtrip, arguson descendant_name_list."""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from treemachine_spark.api.errors import BadInputError
from treemachine_spark.ingest import ingest_synthesis_data, load_store, write_store
from treemachine_spark.registry import TreeOfLifeService, TreeRegistry

FIX = Path(__file__).parent / "fixtures"


@pytest.fixture(scope="module")
def registry(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("multi")
    ann2 = json.loads((FIX / "annotations.json").read_text())
    ann2["tree_id"] = "opentree_test2"
    p2 = tmp / "annotations2.json"
    p2.write_text(json.dumps(ann2))

    s1 = ingest_synthesis_data(
        spark,
        str(FIX / "labelled_supertree.tre"),
        str(FIX / "annotations.json"),
        str(FIX / "taxonomy.tsv"),
    )
    s2 = ingest_synthesis_data(
        spark,
        str(FIX / "labelled_supertree.tre"),
        str(p2),
        str(FIX / "taxonomy.tsv"),
    )
    reg = TreeRegistry({})
    reg.add(s1)
    reg.add(s2)
    return reg


def test_l9_l10_semantics(registry):
    assert registry.tree_ids() == ["opentree_test1", "opentree_test2"]
    assert registry.most_recent() == "opentree_test2"


def test_synth_id_resolution(registry):
    assert registry.get().tree_id == "opentree_test2"  # default = most recent
    assert registry.get("opentree_test1").tree_id == "opentree_test1"
    with pytest.raises(BadInputError, match="synth_id"):
        registry.get("nope")


@pytest.mark.slow
def test_service_endpoints(registry):
    svc = TreeOfLifeService(registry)
    assert svc.about()["synth_id"] == "opentree_test2"
    assert svc.about(synth_id="opentree_test1")["synth_id"] == "opentree_test1"
    res = svc.mrca(ott_ids=[316878, 102710], synth_id="opentree_test1")
    assert res["mrca"]["node_id"] == "ott5839486"


def test_store_roundtrip(spark, registry, tmp_path):
    out = tmp_path / "db1"
    write_store(registry.get("opentree_test1"), str(out))
    back = load_store(spark, str(out))
    assert back.tree_id == "opentree_test1"
    assert back.nodes.count() == 7
    assert back.paths.count() == 10
    reg2 = TreeRegistry.load(spark, str(tmp_path))
    assert reg2.tree_ids() == ["opentree_test1"]


@pytest.mark.slow
def test_single_store_roundtrip(spark, registry, tmp_path):
    """Multi-tree single-store layout: one partitioned table set, per-tree
    GraphStore views with partition-pruned scans."""
    from treemachine_spark.ingest import load_single_store, write_single_store

    out = tmp_path / "single"
    write_single_store([registry.get(t) for t in registry.tree_ids()], str(out))
    reg2 = load_single_store(spark, str(out))
    assert reg2.tree_ids() == registry.tree_ids()
    for tid in registry.tree_ids():
        a, b = registry.get(tid), reg2.get(tid)
        assert b.root_id == a.root_id
        assert b.nodes.count() == a.nodes.count()
        assert sorted(r["node_id"] for r in b.paths.collect()) == sorted(
            r["node_id"] for r in a.paths.collect()
        )
    # the per-tree view must prune to one partition directory of the shared
    # table (PartitionFilters on tree_id in the scan)
    plan = (
        reg2.get("opentree_test1")
        .nodes._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan and "synth_id" in plan
    # API parity through the consolidated layout
    svc = TreeOfLifeService(reg2)
    res = svc.mrca(ott_ids=[316878, 102710], synth_id="opentree_test1")
    assert res["mrca"]["node_id"] == "ott5839486"


@pytest.mark.slow
def test_arguson_descendant_name_list(registry):
    svc = TreeOfLifeService(registry)
    res = svc.subtree(
        synth_id="opentree_test1", ott_id=81461, tree_format="arguson"
    )
    arg = res["arguson"]
    unnamed = [c for c in arg["children"] if "taxon" not in c]
    assert unnamed, "fixture has one unnamed internal child"
    # T9: [first, last] named descendants (GraphExplorer.java:415-429)
    assert unnamed[0]["descendant_name_list"] == ["Apteryx", "Struthio"]


@pytest.mark.slow
def test_delete_tree_partition_drop(spark, registry, tmp_path):
    """Admin mutations (GraphBase.deleteTreeBySource:312-370 /
    deleteAllTrees:299-306): CLI round-trip — consolidate two trees, delete
    one, listsynthtrees shows removal, delete all empties the registry."""
    import os

    from treemachine_spark.ingest import (
        delete_all_trees,
        delete_tree,
        load_single_store,
        write_single_store,
    )

    out = tmp_path / "single"
    write_single_store([registry.get(t) for t in registry.tree_ids()], str(out))

    delete_tree(str(out), "opentree_test1")
    # the partition directory itself must be gone (metadata-only drop)
    assert not os.path.exists(out / "nodes" / "synth_id=opentree_test1")
    assert os.path.exists(out / "nodes" / "synth_id=opentree_test2")
    reg2 = load_single_store(spark, str(out))
    assert reg2.tree_ids() == ["opentree_test2"]
    # the survivor still serves
    assert reg2.get("opentree_test2").nodes.count() == registry.get("opentree_test2").nodes.count()

    with pytest.raises(BadInputError, match="opentree_test1"):
        delete_tree(str(out), "opentree_test1")

    delete_all_trees(str(out))
    assert load_single_store(spark, str(out)).tree_ids() == []


@pytest.mark.slow
def test_delete_tree_cli(spark, registry, tmp_path, capsys):
    from treemachine_spark import cli
    from treemachine_spark.ingest import write_single_store

    out = tmp_path / "single_cli"
    write_single_store([registry.get(t) for t in registry.tree_ids()], str(out))

    assert cli.main(["deletetree", str(out), "opentree_test1"]) == 0
    assert cli.main(["listsynthtrees", str(out)]) == 0
    tail = capsys.readouterr().out.strip().splitlines()
    assert "opentree_test2" in tail and "opentree_test1" not in tail
