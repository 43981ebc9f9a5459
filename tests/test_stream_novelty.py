"""Streaming near-dup filter (streaming/documents.py): cross-batch
semantics of the growing-index variant, unit-tested on the batch recipe
directly (batch ORDER through a file source is an engine concern; the s8
gate runs the real availableNow stream under the DuckDB oracle)."""

from __future__ import annotations

import pytest

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


# ---------------------------------------------------------------------------
# Durable variant: persisted index + idempotent writes + checkpoint resume
# ---------------------------------------------------------------------------

from pyspark.sql import functions as F  # noqa: E402

from treemachine_spark.streaming.documents import (  # noqa: E402
    DurableNoveltyFilter,
    novel_documents_durable,
    read_document_stream,
)


def _durable(spark, tmp_path, seed_rows, name="d"):
    seed = minhash_bands(_docs(spark, seed_rows))
    return DurableNoveltyFilter(
        spark,
        str(tmp_path / f"{name}_index"),
        str(tmp_path / f"{name}_novel"),
        seed_bands=seed,
    )


def _novel_ids(spark, filt):
    df = spark.read.parquet(filt.novel_path)
    return sorted(r["doc_id"] for r in df.select("doc_id").collect())


def test_durable_growing_index_drops_cross_batch_dups(spark, tmp_path):
    f = _durable(spark, tmp_path, [(0, OTHER)])
    f.process_batch(_docs(spark, [(1, BASE)]), 0)
    f.process_batch(_docs(spark, [(3, BASE), (5, NOVEL)]), 1)
    # durable index always grows: doc 3 duplicates batch-0's doc 1
    assert _novel_ids(spark, f) == [1, 5]
    # seed dup dropped too
    f.process_batch(_docs(spark, [(9, OTHER)]), 2)
    assert _novel_ids(spark, f) == [1, 5]


@pytest.mark.slow
def test_durable_batch_replay_is_idempotent(spark, tmp_path):
    f = _durable(spark, tmp_path, [(0, OTHER)])
    f.process_batch(_docs(spark, [(1, BASE)]), 0)
    b1 = _docs(spark, [(3, BASE), (5, NOVEL)])
    f.process_batch(b1, 1)
    before = _novel_ids(spark, f)
    # foreachBatch is at-least-once: a full replay of batch 1 must change
    # nothing (dynamic-partition overwrite, index read excludes batch 1)
    f.process_batch(b1, 1)
    assert _novel_ids(spark, f) == before == [1, 5]
    idx = spark.read.parquet(f.index_path)
    assert idx.count() == idx.distinct().count()


@pytest.mark.slow
def test_durable_partial_write_crash_heals_on_replay(spark, tmp_path):
    f = _durable(spark, tmp_path, [(0, OTHER)])
    f.fail_after_novel_write = {1}
    f.process_batch(_docs(spark, [(1, BASE)]), 0)
    b1 = _docs(spark, [(5, NOVEL)])
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="injected crash"):
        f.process_batch(b1, 1)
    # crash point: novel sink written, index append lost — replay heals both
    f.process_batch(b1, 1)
    # batch 2 dups batch 1's novel doc -> must be dropped (index healed)
    f.process_batch(_docs(spark, [(6, NOVEL), (7, BASE)]), 2)
    assert _novel_ids(spark, f) == [1, 5]
    novel = spark.read.parquet(f.novel_path)
    assert novel.count() == novel.select("doc_id").distinct().count()


def _stage_stream_dir(spark, sf_dir, tmp_path, n_files=4):
    """Odd-doc half of the corpus as an n-file parquet dir streamable by
    read_document_stream (multiple real micro-batches via maxFilesPerTrigger)."""
    from treemachine_spark.io.tables import load_tables

    docs = load_tables(spark, sf_dir)["documents"]
    src = tmp_path / "streamsrc"
    (
        docs.where(F.col("doc_id") % 2 == 1)
        .repartition(n_files)
        .write.mode("overwrite")
        .parquet(str(src / "documents.parquet"))
    )
    seed = minhash_bands(docs.where(F.col("doc_id") % 2 == 0)).localCheckpoint(
        eager=True
    )
    return str(src), seed


def _run_durable(spark, src, seed, tmp_path, name, fail_batches=()):
    filt = DurableNoveltyFilter(
        spark,
        str(tmp_path / f"{name}_index"),
        str(tmp_path / f"{name}_novel"),
        seed_bands=seed,
    )
    filt.fail_after_novel_write = set(fail_batches)
    ckpt = str(tmp_path / f"{name}_ckpt")
    # each injected crash kills the query mid-stream; every RESTART resumes
    # from the same checkpoint — the failed batch replays, later batches
    # follow (one restart per injected crash, bounded)
    for attempt in range(len(fail_batches) + 1):
        stream = read_document_stream(spark, src, max_files_per_trigger=1)
        try:
            out = novel_documents_durable(
                stream, filt.index_path, filt.novel_path, ckpt, filt=filt
            )
            break
        except Exception:
            if attempt == len(fail_batches):
                raise
    return sorted(r["doc_id"] for r in out.select("doc_id").collect())


@pytest.mark.slow
def test_durable_restart_resume_matches_clean_run(spark, tmp_path):
    """Kill the stream mid-run (crash injected between the batch's two
    writes), restart from the checkpoint: same admitted set as an unkilled
    run — no duplicate admitted, no novel doc lost. Real file stream with
    4 micro-batches at sf0.001 (sf0.01 in the slow twin below)."""
    src, seed = _stage_stream_dir(spark, "/root/testdata/sf0.001", tmp_path)
    clean = _run_durable(spark, src, seed, tmp_path, "clean")
    crashed = _run_durable(
        spark, src, seed, tmp_path, "crashed", fail_batches=(2,)
    )
    assert len(clean) > 0
    assert crashed == clean
    assert len(crashed) == len(set(crashed))


@pytest.mark.slow
def test_durable_restart_resume_sf001(spark, tmp_path):
    src, seed = _stage_stream_dir(spark, "/root/testdata/sf0.01", tmp_path)
    clean = _run_durable(spark, src, seed, tmp_path, "clean")
    crashed = _run_durable(
        spark, src, seed, tmp_path, "crashed", fail_batches=(1, 3)
    )
    assert len(clean) > 0
    assert crashed == clean
    assert len(crashed) == len(set(crashed))


def test_driver_list_guard_names_durable_twin(spark):
    """VERDICT r6 #3: the in-memory filter's driver-side novel-id list is
    bounded — exceeding max_novel_ids raises an error pointing at the
    sink-backed DurableNoveltyFilter instead of growing without bound."""
    import pytest

    from treemachine_spark.streaming.documents import NovelListTooBigError

    idx = minhash_bands(_docs(spark, [(0, OTHER)])).localCheckpoint(eager=True)
    f = NoveltyFilter(idx, grow_index=False, max_novel_ids=2)
    f.process_batch(_docs(spark, [(1, BASE), (5, NOVEL)]), 0)
    with pytest.raises(NovelListTooBigError, match="DurableNoveltyFilter"):
        f.process_batch(
            _docs(spark, [(9, "another brand new never seen text body")]), 1
        )
    # opt-out keeps the old open-ended harness behavior
    f2 = NoveltyFilter(idx, grow_index=False, max_novel_ids=None)
    f2.process_batch(_docs(spark, [(1, BASE), (5, NOVEL)]), 0)
    assert sorted(f2.novel_ids) == [1, 5]


def test_stream_runner_translates_overflow_to_documented_type(spark, tmp_path):
    """ADVICE r7: the streaming engine wraps any foreachBatch raise in
    StreamingQueryException, so callers of novel_documents catching the
    DOCUMENTED NovelListTooBigError would miss it. The runner translates
    the wrapped overflow back to the documented type."""
    import pytest

    from treemachine_spark.streaming.documents import (
        NovelListTooBigError,
        novel_documents,
    )

    sf = tmp_path / "sfmini"
    _docs(
        spark,
        [(1, BASE), (5, NOVEL), (9, "another brand new never seen text body")],
    ).write.parquet(str(sf / "documents.parquet"))
    idx = minhash_bands(_docs(spark, [(0, OTHER)])).localCheckpoint(eager=True)
    stream = read_document_stream(spark, str(sf))
    with pytest.raises(NovelListTooBigError, match="DurableNoveltyFilter"):
        novel_documents(stream, idx, max_novel_ids=1)


def test_minhash_artifact_novelty_roundtrip(spark, tmp_path):
    """r10 (r9 verdict #6): ONE minhash artifact family serves batch
    near-dup AND streaming novelty. Seed a DurableNoveltyFilter straight
    from a persisted write_minhash_index artifact
    (from_minhash_artifact); the docs the stream flags novel are exactly
    those with no minhash_near_dup_pairs(sig=) partner among the
    artifact's docs (both sides are the same band space — signatures are
    the module's fixed permutations, banding a pure projection); the
    stream's accepted novel rows append BACK into the artifact via
    minhash_index_append, after which the artifact equals one written for
    the grown corpus and re-seeds a filter that drops dups of accepted
    docs."""
    import random

    from treemachine_spark.functions.dedup import (
        minhash_index,
        minhash_index_append,
        minhash_near_dup_pairs,
        read_minhash_index,
        write_minhash_index,
    )
    from treemachine_spark.streaming.documents import DurableNoveltyFilter

    rng = random.Random(42)
    vocab_a = [f"alpha{i}" for i in range(40)]
    vocab_b = [f"beta{i}" for i in range(40)]
    a_rows = [
        (i, " ".join(rng.choice(vocab_a) for _ in range(12)))
        for i in range(30)
    ]
    # batch: 15 near-dups of artifact docs + 15 disjoint-vocab novel docs;
    # no within-batch dups (per-batch novelty checks prior state only)
    b_rows = [
        (100 + j, a_rows[j][1] + " " + rng.choice(vocab_a)) for j in range(15)
    ] + [
        (200 + j, " ".join(rng.choice(vocab_b) for _ in range(12)))
        for j in range(15)
    ]
    docs_a = _docs(spark, a_rows)
    docs_b = _docs(spark, b_rows)

    art = str(tmp_path / "mh_art")
    write_minhash_index(docs_a, art)
    filt = DurableNoveltyFilter.from_minhash_artifact(
        spark, art, str(tmp_path / "rt_index"), str(tmp_path / "rt_novel")
    )
    filt.process_batch(docs_b, 0)
    novel = set(_novel_ids(spark, filt))

    # batch twin over the SAME artifact: union sig = stored + batch,
    # near-dup pairs restricted to (artifact doc, batch doc)
    sig_a, _ = read_minhash_index(spark, art)
    sig_b = minhash_index(docs_b, with_shingles=True)
    pairs = minhash_near_dup_pairs(
        docs_a.unionByName(docs_b),
        threshold=0.25,
        sig=sig_a.unionByName(sig_b).localCheckpoint(eager=True),
    )
    a_ids = {i for i, _ in a_rows}
    partnered = {
        r["doc_b"]
        for r in pairs.collect()
        if r["doc_a"] in a_ids and r["doc_b"] >= 100
    }
    want_novel = {i for i, _ in b_rows} - partnered
    assert novel == want_novel
    assert 0 < len(novel) < len(b_rows)  # non-vacuous both ways

    # accepted novel rows append back into the SAME artifact...
    novel_rows = (
        spark.read.parquet(filt.novel_path).select("doc_id", "text")
    )
    minhash_index_append(novel_rows, art)
    grown, _ = read_minhash_index(spark, art)
    # ...bit-identical to an artifact written for the grown corpus
    fresh = str(tmp_path / "mh_fresh")
    accepted = docs_b.join(
        novel_rows.select("doc_id"), "doc_id", "left_semi"
    )
    write_minhash_index(docs_a.unionByName(accepted), fresh)
    fresh_idx, _ = read_minhash_index(spark, fresh)
    key = lambda r: (r["doc_id"], tuple(r["sig"]), tuple(sorted(r["sh"])))  # noqa: E731
    assert {key(r) for r in grown.collect()} == {
        key(r) for r in fresh_idx.collect()
    }

    # the grown artifact re-seeds a filter that now drops a dup of an
    # ACCEPTED novel doc (the loop is closed)
    filt2 = DurableNoveltyFilter.from_minhash_artifact(
        spark, art, str(tmp_path / "rt2_index"), str(tmp_path / "rt2_novel")
    )
    some_novel = sorted(novel)[0]
    dup_text = dict(b_rows)[some_novel]
    filt2.process_batch(
        _docs(spark, [(900, dup_text), (901, "gamma only words here")]), 0
    )
    assert _novel_ids(spark, filt2) == [901]
