"""Synthesis annotations JSON source (S3) — reference:
IngestSynthesisData.readAnnotations (opentree/IngestSynthesisData.java:
277-287) + setRootMetadata (:291-361) + getAnnotations (:462-498).

The reference flattens every nested map into packed strings because Neo4j 1.9
cannot store nested properties ("nested arrays are a problem", :312). Spark
has native MapType/ArrayType, so annotations stay structured end-to-end —
stringToMap / stringToMapArray re-parsers (GraphExplorer.java:586-612) become
unnecessary.

Per-node annotations are decoded executor-side with ``from_json`` over a
fixed schema (scales to annotation files of any size); the small top-level
metadata is decoded driver-side.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# whitelist served to clients: GraphExplorer.java:283-295;
# conflicts_with / resolved_by are map<string,array>, the rest map<string,string>
# (GraphExplorer.java:313-325)
ANNOTATION_SCHEMA = (
    "map<string, struct<"
    "supported_by: map<string,string>, "
    "conflicts_with: map<string,array<string>>, "
    "resolves: map<string,string>, "
    "resolved_by: map<string,array<string>>, "
    "partial_path_of: map<string,string>, "
    "terminal: map<string,string>"
    ">>"
)


def read_annotations(spark: SparkSession, path: str) -> tuple[dict, DataFrame, DataFrame]:
    """Returns (tree_meta dict, node_annotations DF, source_map DF).

    node_annotations: (node_id, supported_by, conflicts_with, resolves,
                       resolved_by, partial_path_of, terminal)
    source_map:       (source_id, study_id, tree_id, git_sha)
    """
    with open(path) as fh:
        top = json.load(fh)

    meta = {k: v for k, v in top.items() if k not in ("nodes", "source_id_map")}

    raw = spark.read.text(path, wholetext=True)
    nodes_map = F.from_json(F.get_json_object("value", "$.nodes"), ANNOTATION_SCHEMA)
    ann = (
        raw.select(F.explode(nodes_map).alias("node_id", "ann"))
        .select("node_id", "ann.*")
    )

    sid_map = top.get("source_id_map", {})
    rows = [
        (
            sid,
            blob.get("study_id"),
            blob.get("tree_id"),
            blob.get("git_sha"),
        )
        for sid, blob in sid_map.items()
    ]
    source_map = spark.createDataFrame(
        rows or [(None, None, None, None)],
        "source_id string, study_id string, tree_id string, git_sha string",
    )
    if not rows:
        source_map = source_map.where(F.col("source_id").isNotNull())
    return meta, ann, source_map


def with_taxonomy_support(ann: DataFrame, nodes: DataFrame, taxonomy_version: str) -> DataFrame:
    """P7 — auto-append taxonomy support ``{'ott<version>': node_id}`` to
    ``supported_by`` for taxon (ott*) nodes (IngestSynthesisData.java:485-496).

    ``nodes`` must provide every node_id of the tree; nodes absent from the
    annotations file still get the taxonomy-support entry.
    """
    key = f"ott{taxonomy_version}"
    full = nodes.select("node_id").join(ann, "node_id", "left")
    tax_map = F.create_map(F.lit(key), F.col("node_id"))
    # An annotations file may already carry the taxonomy key; map_concat on a
    # duplicate key raises under the default mapKeyDedupPolicy=EXCEPTION, so
    # drop any existing entry first (ingest overwrite-wins semantics).
    cleaned = F.map_filter("supported_by", lambda k, _v: k != F.lit(key))
    return full.withColumn(
        "supported_by",
        F.when(
            F.col("node_id").rlike("^ott[0-9]+$"),
            F.when(
                F.col("supported_by").isNull(), tax_map
            ).otherwise(F.map_concat(cleaned, tax_map)),
        ).otherwise(F.col("supported_by")),
    )
