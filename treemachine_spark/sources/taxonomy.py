"""Taxonomy TSV source (S2) — reference: IngestSynthesisData.processTaxonomyTSV
(opentree/IngestSynthesisData.java:184-274): stream taxonomy.tsv, skip the
header line starting with 'uid', split on '|', trim tab padding, keep only
rows whose uid is used by the tree.

Spark version: one CSV scan + a broadcast semi-join against the tree's tip
ids — the filter-during-scan HashSet check (:208) becomes a join Catalyst
pushes below everything else. At full OTT scale (~4.5M rows) this is a
single pass, no driver materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

COLUMNS = ["uid", "parent_uid", "name", "rank", "sourceinfo", "uniqname", "flags"]


def read_taxonomy_tsv(spark: SparkSession, path: str) -> DataFrame:
    """taxonomy(uid, parent_uid, name, rank, sourceinfo, uniqname, flags).

    The OTT format is pipe-delimited with tab padding (`uid\\t|\\tparent_uid…`);
    we read as text and split on '|' with trim, exactly like the reference's
    tokenizer (IngestSynthesisData.java:222-240).
    """
    lines = spark.read.text(path)
    parts = F.split(F.col("value"), r"\|")
    df = lines.select(
        *[F.btrim(parts.getItem(i), F.lit(" \t")).alias(c) for i, c in enumerate(COLUMNS)]
    )
    # header line starts with 'uid' (IngestSynthesisData.java:202-205)
    df = df.where(F.col("uid") != "uid")
    # uniqname falls back to name (:247-250)
    return df.withColumn(
        "uniqname",
        F.when(F.col("uniqname") == "", F.col("name")).otherwise(F.col("uniqname")),
    )


def filter_to_tree(taxonomy: DataFrame, used_uids: DataFrame) -> DataFrame:
    """Keep taxonomy rows used by the tree (left-semi join replaces the
    per-row ``ottIDs.contains`` check at IngestSynthesisData.java:208)."""
    return taxonomy.join(
        F.broadcast(used_uids.select(F.col("uid"))), "uid", "left_semi"
    )
