"""Streaming running quantile sketch (streaming/stats.py): the read-time
fold of per-batch partial sketches must EQUAL the sketch of all rows seen
(bottom-k merge law, n-way), replays must be no-ops, and compaction must
preserve the fold."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from treemachine_spark.functions.sketches import quantile_sketch_grouped
from treemachine_spark.functions.text import token_count
from treemachine_spark.io.tables import load_tables
from treemachine_spark.streaming.documents import read_document_stream
from treemachine_spark.streaming.stats import (
    StreamingQuantileSketch,
    running_quantile_sketch,
)

SF = "/root/testdata/sf0.001"


def _tok(df):
    return df.select("lang", token_count(F.col("text")).alias("n"))


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_batch_partials_fold_to_whole(spark, tmp_path):
    docs = load_tables(spark, SF)["documents"]
    sk = StreamingQuantileSketch(str(tmp_path / "sk"), "n", ["lang"], k=64)
    # three disjoint "batches"
    for i in range(3):
        sk.process_batch(_tok(docs.where(F.col("doc_id") % 3 == i)), i)
    whole = quantile_sketch_grouped(_tok(docs), "n", ["lang"], k=64)
    assert _rows(sk.current(spark)) == _rows(whole)


def test_batch_replay_is_noop(spark, tmp_path):
    docs = load_tables(spark, SF)["documents"]
    sk = StreamingQuantileSketch(str(tmp_path / "sk"), "n", ["lang"], k=64)
    b1 = _tok(docs.where(F.col("doc_id") % 2 == 0))
    sk.process_batch(b1, 0)
    sk.process_batch(_tok(docs.where(F.col("doc_id") % 2 == 1)), 1)
    before = _rows(sk.current(spark))
    sk.process_batch(b1, 0)  # at-least-once replay
    assert _rows(sk.current(spark)) == before


def test_compact_preserves_fold(spark, tmp_path):
    docs = load_tables(spark, SF)["documents"]
    sk = StreamingQuantileSketch(str(tmp_path / "sk"), "n", ["lang"], k=64)
    for i in range(3):
        sk.process_batch(_tok(docs.where(F.col("doc_id") % 3 == i)), i)
    before = _rows(sk.current(spark))
    sk.compact(spark)
    assert _rows(sk.current(spark)) == before
    # compacted table holds exactly one partition
    import os

    parts = [
        d
        for d in os.listdir(str(tmp_path / "sk"))
        if d.startswith("ingest_batch=")
    ]
    assert parts == ["ingest_batch=-1"]


def test_real_stream_matches_batch_sketch(spark, tmp_path):
    """End-to-end: a real checkpointed 4-batch document stream folds to
    exactly the batch-built sketch of the same rows."""
    docs = load_tables(spark, SF)["documents"]
    src = tmp_path / "streamsrc"
    docs.repartition(4).write.mode("overwrite").parquet(
        str(src / "documents.parquet")
    )
    stream = read_document_stream(spark, str(src), max_files_per_trigger=1)
    out = running_quantile_sketch(
        _tok(stream),
        str(tmp_path / "sk"),
        str(tmp_path / "ckpt"),
        "n",
        ["lang"],
        k=64,
    )
    whole = quantile_sketch_grouped(_tok(docs), "n", ["lang"], k=64)
    assert _rows(out) == _rows(whole)
