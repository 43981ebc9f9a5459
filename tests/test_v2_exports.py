"""v2 adapters (tree_of_life.java / graph.java), exporters (S8/S10-S15),
NexSON source (S4), id codec (P10)."""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from treemachine_spark.api.v2 import (
    TreeOfLifeV2,
    long_id_to_string_id,
    string_id_to_long_id,
)
from treemachine_spark.api.v3 import TreeOfLifeV3
from treemachine_spark.exporters import exports
from treemachine_spark.ingest import ingest_synthesis_data
from treemachine_spark.sources.nexson import read_nexson_trees

FIX = Path(__file__).parent / "fixtures"


@pytest.fixture(scope="module")
def store(spark):
    return ingest_synthesis_data(
        spark,
        str(FIX / "labelled_supertree.tre"),
        str(FIX / "annotations.json"),
        str(FIX / "taxonomy.tsv"),
    )


@pytest.fixture(scope="module")
def v2(store):
    return TreeOfLifeV2(TreeOfLifeV3(store))


def test_id_codec_roundtrip():
    # P10 — tree_of_life.java:385-422
    for i in [0, 1, 81461, 9_999_999, 10_000_000, 35_043_504, 3_964_460_003_504]:
        assert string_id_to_long_id(long_id_to_string_id(i)) == i
    assert long_id_to_string_id(81461) == "ott81461"
    # mrcaott3504ott396446 -> 3504 + 396446 * 10^7
    assert string_id_to_long_id("mrcaott3504ott396446") == 3504 + 396446 * 10_000_000


def test_v2_about(v2):
    res = v2.about()
    assert res["tree_id"] == "opentree_test1"
    assert res["root_node_id"] == 81461
    assert res["root_taxon_name"] == "Aves"
    assert res["num_tips"] == 4
    assert len(res["study_list"]) == 2


def test_v2_mrca_named(v2):
    res = v2.mrca(ott_ids=[316878, 102710])
    assert res["mrca_name"] == "Gaviiformes"
    assert res["ott_id"] == 5839486
    assert res["node_ids_not_in_tree"] == []


def test_v2_mrca_unnamed_no_400(v2):
    # v2 never raises on bad ids (tree_of_life.java:211-219)
    res = v2.mrca(ott_ids=[536234, 810751, 55555555])
    assert res["ott_ids_not_in_tree"] == [55555555]
    assert res["mrca_name"] == ""
    assert res["nearest_taxon_mrca_name"] == "Aves"
    assert res["mrca_node_id"] == string_id_to_long_id("mrcaott246ott5481")


def test_v2_induced_tree(v2):
    res = v2.induced_tree(ott_ids=[536234, 810751, 316878])
    assert "newick" in res and res["tree_id"] == "opentree_test1"


def test_v2_subtree_and_node_info(v2):
    res = v2.subtree(ott_id=5839486)
    assert res["newick"] == "(Gavia_ott316878,Anas_ott102710)Gaviiformes_ott5839486;"
    ni = v2.node_info(ott_id=316878)
    assert ni["node_id"] == 316878
    assert ni["name"] == "Gavia"
    assert ni["tax_source"] == "ncbi:37039"


def test_export_dot(store):
    dot = exports.export_dot(store)
    assert dot.startswith("digraph G {")
    assert '"ott316878" -> "ott5839486"' in dot


def test_export_graphml(store):
    xml = exports.export_graphml_simple(store)
    assert '<node id="ott81461"><data key="taxon">Aves</data></node>' in xml
    assert xml.count("<edge ") == 6


def test_graphml_metrics(store):
    m = {r["node_id"]: r for r in exports.node_support_metrics(store).collect()}
    # tips forced to 1.0 (GraphExporter.java:406-433)
    assert m["ott536234"]["node_support"] == 1.0
    # single-tree: every non-root node has exactly 1 effective parent
    assert m["ott316878"]["effective_parents"] == 1.0
    assert m["ott5839486"]["effective_children"] == 2.0
    xml = exports.export_graphml_metrics(store)
    assert 'key="support"' in xml


def test_csv_dump(store, tmp_path):
    df = exports.dump_csv(store, "")
    rows = {(r["child_id"], r["parent_id"], r["child_name"]) for r in df.collect()}
    assert ("ott316878", "ott5839486", "Gavia") in rows
    assert df.count() == 6


def test_mrp(store):
    txt = exports.mrp_text(store)
    lines = txt.splitlines()
    assert lines[0] == "4 3"  # 4 tips x 3 internal nodes
    row = dict(l.split("\t") for l in lines[1:])
    # columns sorted: mrcaott246ott5481, ott5839486, ott81461
    assert row["ott536234"] == "101"
    assert row["ott316878"] == "011"


def test_json_tree(store):
    blob = json.loads(exports.json_tree(store))
    assert blob["nodeid"] == "ott81461"
    assert blob["name"] == "Aves"
    assert len(blob["children"]) == 2
    assert blob["children"][1]["name"] == "Gaviiformes"
    assert blob["children"][1]["size"] == 2


def test_taxonomy_to_newick(spark):
    out = exports.taxonomy_to_newick(spark, str(FIX / "taxonomy.tsv"))
    assert out.endswith("Aves;")
    assert "Gavia" in out and "(" in out


def test_nexson_reader(tmp_path):
    study = {
        "data": {
            "nexml": {
                "otus": {
                    "otu": [
                        {"@id": "otu1", "@label": "raw1",
                         "meta": [{"@property": "ot:ottTaxonName", "$": "Gavia"}]},
                        {"@id": "otu2", "@label": "raw2"},
                    ]
                },
                "trees": {
                    "tree": [
                        {
                            "@id": "tree1",
                            "node": [
                                {"@id": "n0", "@root": True},
                                {"@id": "n1", "@otu": "otu1"},
                                {"@id": "n2", "@otu": "otu2"},
                            ],
                            "edge": [
                                {"@source": "n0", "@target": "n1", "@length": 1.5},
                                {"@source": "n0", "@target": "n2"},
                            ],
                        }
                    ]
                },
            }
        }
    }
    trees = read_nexson_trees(study)
    assert len(trees) == 1
    t = trees[0]
    assert t.root_id == "n0"
    labels = {n.node_id: n.label for n in t.nodes}
    assert labels["n1"] == "Gavia"  # ot:ottTaxonName wins over @label
    assert labels["n2"] == "raw2"
    bls = {n.node_id: n.branch_length for n in t.nodes}
    assert bls["n1"] == 1.5

    # deprecated studies skipped (NexsonReader.java:96-108)
    study["data"]["nexml"]["meta"] = [{"@property": "ot:tag", "$": "deprecated"}]
    assert read_nexson_trees(study) == []
