"""Span-level substring dedup semantics (dedup.dup_spans / strip_dup_spans)."""

from __future__ import annotations

import hashlib

from treemachine_spark.functions.dedup import dup_spans, strip_dup_spans


def _docs(spark):
    return spark.createDataFrame(
        [(1, "a b c d e f x"), (2, "z a b c d e f")],
        "doc_id long, text string",
    )


def test_dup_spans_finds_shared_window(spark):
    rows = dup_spans(_docs(spark), width=6, min_docs=2).collect()
    # exactly one 6-token window ("a b c d e f") recurs across the docs
    assert len(rows) == 1
    assert rows[0]["n_docs"] == 2 and rows[0]["n_occurrences"] == 2


def test_strip_keeps_corpus_first_occurrence(spark):
    got = {
        r["doc_id"]: (r["n_kept_tokens"], r["clean_hash"])
        for r in strip_dup_spans(_docs(spark), width=6, min_docs=2).collect()
    }
    # doc 1 (lowest doc_id) keeps everything; doc 2 loses the span, keeps 'z'
    assert got[1] == (7, hashlib.md5(b"a b c d e f x").hexdigest())
    assert got[2] == (1, hashlib.md5(b"z").hexdigest())


def test_strip_noop_when_no_duplicates(spark):
    docs = spark.createDataFrame(
        [(1, "p q r s t u"), (2, "one two three")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["n_kept_tokens"] for r in strip_dup_spans(docs).collect()}
    assert got == {1: 6, 2: 3}  # short doc untouched too


def test_strip_overlapping_spans_collapse(spark):
    # the repeated region is 7 tokens -> two overlapping duplicated windows
    # in each doc; all 7 covered tokens drop from the later doc
    docs = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "a b c d e f g")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["n_kept_tokens"] for r in strip_dup_spans(docs).collect()}
    assert got[1] == 7
    assert got[2] == 0
