"""Closes the last SURVEY §2 inventory rows: P11 (tax-source flag), T16
(adjacent-by-source), E5 (bitset-intersect == arrays_overlap)."""

from __future__ import annotations

from pyspark.sql import functions as F

from treemachine_spark.exporters.exports import tax_source_flags
from treemachine_spark.graph.traversal import adjacent_by_source


def test_p11_tax_source_flags(spark):
    nodes = spark.createDataFrame(
        [
            ("n1", ["ncbi:9242", "gbif:5289"]),
            ("n2", ["gbif:123"]),
            ("n3", None),
            ("n4", ["irmng:7", "gbif:9"]),
        ],
        "node_id string, tax_sources array<string>",
    )
    got = {r["node_id"]: r["only_gbif"] for r in tax_source_flags(nodes).collect()}
    # GraphExporter.java:1108-1113: onlygbif iff no source names ncbi;
    # NULL source list (unnamed node) is not flagged
    assert got == {"n1": False, "n2": True, "n3": False, "n4": True}


def test_t16_adjacent_by_source(spark):
    edges = spark.createDataFrame(
        [
            ("a", "p1", "pg_1"),
            ("a", "p2", "pg_1"),
            ("a", "p3", "pg_2"),
            ("b", "a", "pg_1"),
        ],
        "child_id string, parent_id string, source string",
    )
    out = adjacent_by_source(edges, "a", "pg_1").collect()
    assert [r["adjacent_id"] for r in out] == ["p1"]  # stable min, not storage order
    inc = adjacent_by_source(edges, "a", "pg_1", direction="in").collect()
    assert [r["adjacent_id"] for r in inc] == ["b"]
    assert adjacent_by_source(edges, "a", "nope").count() == 0


def test_e5_bitset_intersect_is_arrays_overlap(spark):
    # legacy LICA pruning tests whether two node-id BitSets intersect
    # (GraphImporter.java:447-465); the relational twin is arrays_overlap
    # on the long[] mrca columns
    df = spark.createDataFrame(
        [
            ("x", [1, 2, 3], [3, 4]),
            ("y", [1, 2], [4, 5]),
            ("z", [], [1]),
        ],
        "id string, mrca array<long>, other array<long>",
    )
    got = {
        r["id"]: r["hit"]
        for r in df.select(
            "id", F.arrays_overlap("mrca", "other").alias("hit")
        ).collect()
    }
    assert got == {"x": True, "y": False, "z": False}
