"""Streaming near-dup filter (streaming/documents.py): cross-batch
semantics of the growing-index variant, unit-tested on the batch recipe
directly (batch ORDER through a file source is an engine concern; the s8
gate runs the real availableNow stream under the DuckDB oracle)."""

from __future__ import annotations

from treemachine_spark.functions.dedup import minhash_bands
from treemachine_spark.streaming.documents import NoveltyFilter


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


BASE = "the quick brown fox jumps over the lazy dog and runs far away"
OTHER = "completely different words entirely unrelated content in this corpus"
NOVEL = "fresh unseen sentence with vocabulary shared by no other document"


def test_static_index_does_not_see_cross_batch_dups(spark):
    idx = minhash_bands(_docs(spark, [(0, OTHER)])).localCheckpoint(eager=True)
    f = NoveltyFilter(idx, grow_index=False)
    f.process_batch(_docs(spark, [(1, BASE)]), 0)
    f.process_batch(_docs(spark, [(3, BASE), (5, NOVEL)]), 1)
    # doc 3 duplicates batch-1's doc 1, but a STATIC index never learns it
    assert sorted(f.novel_ids) == [1, 3, 5]


def test_growing_index_drops_cross_batch_dups(spark):
    idx = minhash_bands(_docs(spark, [(0, OTHER)])).localCheckpoint(eager=True)
    f = NoveltyFilter(idx, grow_index=True)
    f.process_batch(_docs(spark, [(1, BASE)]), 0)
    f.process_batch(_docs(spark, [(3, BASE), (5, NOVEL)]), 1)
    # doc 1's bands were appended to the index, so its batch-2 duplicate is
    # dropped while the genuinely novel doc still passes
    assert sorted(f.novel_ids) == [1, 5]


def test_index_copy_of_indexed_doc_is_dropped(spark):
    idx = minhash_bands(_docs(spark, [(0, OTHER)])).localCheckpoint(eager=True)
    f = NoveltyFilter(idx, grow_index=False)
    f.process_batch(_docs(spark, [(7, OTHER), (8, BASE)]), 0)
    assert sorted(f.novel_ids) == [8]
