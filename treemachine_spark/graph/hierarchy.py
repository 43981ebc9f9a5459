"""Derive a rooted tree (child->parent edge table) from the driver's star
schema, so every tree operator is exercised — and oracle-checked — on the
standard test tables.

This plays the role of the reference's ingested synthetic tree: nodes + typed
child->parent SYNTHCHILDOF edges (opentree/IngestSynthesisData.java:367-457).
The hierarchy is:

    root -> region -> nation -> customer -> orders -> lineitem

Node ids are prefixed keys ('r0', 'n5', 'c123', 'o4567', 'l4567_3'), matching
the reference's ot_node_id convention of string ids ('ott81461',
'mrcaott3504ott396446' — opentree/constants/NodeProperty.java:12-19).

Scale notes: each level is produced by a narrow projection of one parquet
scan (column-pruned to the two key columns), then unioned — no shuffle at
all. At 100 TB the edge table inherits the source tables' partitioning.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ROOT_ID = "root"

# (table, child prefix, child key expr, parent prefix, parent key column, level)
_LEVELS = [
    ("region", "r", "r_regionkey", None, None, 1),
    ("nation", "n", "n_nationkey", "r", "n_regionkey", 2),
    ("customer", "c", "c_custkey", "n", "c_nationkey", 3),
    ("orders", "o", "o_orderkey", "c", "o_custkey", 4),
    ("lineitem", None, None, "o", "l_orderkey", 5),
]


def _lineitem_id(df: DataFrame):
    return F.concat(
        F.lit("l"),
        F.col("l_orderkey").cast("string"),
        F.lit("_"),
        F.col("l_linenumber").cast("string"),
    )


def hierarchy_edges(tables: dict[str, DataFrame]) -> DataFrame:
    """Child->parent edge DataFrame (child_id, parent_id).

    Mirrors the SYNTHCHILDOF edge set (opentree/constants/RelType.java:6,
    created at IngestSynthesisData.java:427).
    """
    parts = []
    for table, cpre, ckey, ppre, pkey, _level in _LEVELS:
        df = tables[table]
        child = (
            _lineitem_id(df)
            if cpre is None
            else F.concat(F.lit(cpre), F.col(ckey).cast("string"))
        )
        parent = (
            F.lit(ROOT_ID)
            if ppre is None
            else F.concat(F.lit(ppre), F.col(pkey).cast("string"))
        )
        parts.append(df.select(child.alias("child_id"), parent.alias("parent_id")))
    # node-set semantics: (l_orderkey, l_linenumber) is not unique in the
    # synthetic data, so distinct() collapses colliding node ids — a graph
    # node is identified by its id, mirroring the reference where ingest
    # resolves repeated labels to one Neo4j node (IngestSynthesisData.java:
    # 383-402). One ingest-time shuffle; every downstream query reuses it.
    return reduce(DataFrame.unionByName, parts).distinct()


def hierarchy_nodes(tables: dict[str, DataFrame]) -> DataFrame:
    """Node DataFrame (node_id, name, level, is_leaf).

    The analog of the reference's node store with `name` / `ot_node_id`
    properties (opentree/constants/NodeProperty.java:12-19); levels 4-5
    (orders/lineitem) are the 'unnamed internal / tip' nodes that carry only
    an id (IngestSynthesisData.java:390-402).
    """
    spark = tables["region"].sparkSession
    root = spark.createDataFrame(
        [(ROOT_ID, "root", 0, False)], "node_id string, name string, level int, is_leaf boolean"
    )
    parts = [root]
    name_cols = {"region": "r_name", "nation": "n_name", "customer": "c_name"}
    for table, cpre, ckey, _ppre, _pkey, level in _LEVELS:
        df = tables[table]
        node = (
            _lineitem_id(df)
            if cpre is None
            else F.concat(F.lit(cpre), F.col(ckey).cast("string"))
        )
        name = F.col(name_cols[table]) if table in name_cols else F.lit(None).cast("string")
        parts.append(
            df.select(
                node.alias("node_id"),
                name.alias("name"),
                F.lit(level).alias("level"),
                F.lit(level == 5).alias("is_leaf"),
            )
        )
    return reduce(DataFrame.unionByName, parts).distinct()
