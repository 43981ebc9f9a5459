"""Structured Streaming over the documents table: streaming-ingest
near-dup filtering against a persisted LSH index (beyond-reference — the
reference is batch-ingest + read-only serving, SURVEY.md §2.9; this is the
streaming twin of the ingest-time minhash dedup in functions/dedup.py).

``novel_documents`` drops every incoming document that shares at least one
LSH band bucket with a STATIC band index (minhash_bands of the already-
ingested corpus — the candidate-level near-dup test, exactly the pair
generator d2 verifies). The idiomatic Spark shape is ``foreachBatch``: the
per-micro-batch work is ordinary batch DataFrame code (Arrow-batched
signature UDF, band equi-join as a left-semi, anti-join back to the batch),
durable state lives in the persisted index table rather than the stream's
state store, and a production pipeline appends each batch's novel bands
back to the index so later batches dedup against earlier ones too. At
100 TB the index side is a bucketed table keyed on (band_idx, band_key)
and the per-batch join prunes to the batch's buckets; the stream source is
a straight format() swap to Kafka.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def read_document_stream(
    spark, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over the documents parquet (tests process it with
    trigger(availableNow)). Same staging contract as read_event_stream:
    bare data files are symlinked into a flat staging dir because the
    streaming file source does not descend into a nested un-partitioned
    parquet directory (see streaming/events.py:34).

    ``max_files_per_trigger`` splits the backlog into multiple micro-batches
    (availableNow honors it) — the restart-resume tests use it to place
    real batch boundaries inside one run."""
    src = os.path.join(sf_dir, "documents.parquet")
    tag = hashlib.md5(src.encode()).hexdigest()[:8]
    stage = os.path.join(tempfile.gettempdir(), f"tm_docstream_{tag}")
    os.makedirs(stage, exist_ok=True)
    if os.path.isdir(src):
        targets = [
            os.path.join(src, f)
            for f in sorted(os.listdir(src))
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        ]
    else:
        targets = [src]
    expected = {f"part-{i:05d}.parquet": t for i, t in enumerate(targets)}
    for f in os.listdir(stage):
        if f not in expected:
            os.unlink(os.path.join(stage, f))
    for name, target in expected.items():
        link = os.path.join(stage, name)
        if os.path.islink(link) and os.readlink(link) != target:
            os.unlink(link)
        if not os.path.exists(link):
            os.symlink(target, link)
    batch_schema = spark.read.parquet(src).schema
    reader = spark.readStream.schema(batch_schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(stage)


class NovelListTooBigError(ValueError):
    """NoveltyFilter's driver-side novel-id list exceeded its bound; the
    durable sink-backed twin is the production path."""


class NoveltyFilter:
    """The per-batch near-dup filter behind ``novel_documents``, exposed as
    a plain object so the batch recipe is unit-testable without the
    streaming engine (batch order through a file source is an engine
    concern; the filter's cross-batch semantics are not).

    Per batch: minhash-band the batch (one Arrow signature pass), LEFT
    SEMI against the index on (band_idx, band_key) to find contaminated
    doc_ids, LEFT ANTI back to the batch. A doc is novel iff NONE of its
    bands hits an index bucket — band-level anti-joins alone cannot
    express that (a doc with one hit band still has non-hit band rows),
    which is why the doc-id semi/anti pair is the right recipe.

    ``grow_index=True`` appends each batch's NOVEL bands to the index
    before the next batch, so later batches also dedup against earlier
    novel documents (sequential-ingest semantics). The grown index is
    localCheckpointed per batch: it truncates the union lineage — without
    it the plan re-derives every prior batch's bands each time — and is
    exactly the "append novel bands to the index table" write a durable
    deployment does.

    TEST-HARNESS TIER: novel doc_ids accumulate in a DRIVER-SIDE list —
    corpus-scale on a mostly-novel stream. ``max_novel_ids`` bounds it
    (:class:`NovelListTooBigError` names the production twin); the
    deployment shape is :class:`DurableNoveltyFilter` /
    :func:`novel_documents_durable`, which writes novel ROWS to a
    partitioned sink and keeps nothing on the driver.
    """

    def __init__(
        self,
        index_bands: DataFrame,
        grow_index: bool = False,
        max_novel_ids: int | None = 1_000_000,
    ):
        self.index_bands = index_bands
        self.grow_index = grow_index
        self.max_novel_ids = max_novel_ids
        self.novel_ids: list[int] = []
        # set before the in-batch raise: the streaming engine wraps any
        # foreachBatch exception in StreamingQueryException, so the runner
        # (novel_documents) uses this flag to re-raise the DOCUMENTED type
        self.overflow_msg: str | None = None

    def process_batch(self, batch: DataFrame, _batch_id: int) -> None:
        from treemachine_spark.functions.dedup import minhash_bands, minhash_index

        if not batch.columns:
            return
        sig = minhash_index(batch)
        bands = minhash_bands(batch, sig=sig)
        if self.grow_index:
            bands = bands.localCheckpoint(eager=True)
        hit = (
            bands.join(self.index_bands, ["band_idx", "band_key"], "left_semi")
            .select("doc_id")
            .distinct()
        )
        novel = (
            batch.select("doc_id").distinct().join(hit, "doc_id", "left_anti")
        )
        ids = [r["doc_id"] for r in novel.collect()]
        self.novel_ids.extend(ids)
        if (
            self.max_novel_ids is not None
            and len(self.novel_ids) > self.max_novel_ids
        ):
            self.overflow_msg = (
                f"NoveltyFilter accumulated {len(self.novel_ids)} novel "
                f"doc_ids on the driver (max_novel_ids="
                f"{self.max_novel_ids})"
            )
            raise NovelListTooBigError(
                f"NoveltyFilter accumulated {len(self.novel_ids)} novel "
                f"doc_ids on the driver (max_novel_ids="
                f"{self.max_novel_ids}). This in-memory filter is "
                "test-harness tier; use DurableNoveltyFilter / "
                "novel_documents_durable, which sink novel rows "
                "partition-wise with no driver-side accumulation "
                "(max_novel_ids=None opts out)."
            )
        if self.grow_index and ids:
            novel_bands = bands.join(
                F.broadcast(novel.select("doc_id")), "doc_id", "left_semi"
            )
            self.index_bands = self.index_bands.unionByName(
                novel_bands.select(*self.index_bands.columns)
            ).localCheckpoint(eager=True)


def novel_documents(
    doc_stream: DataFrame,
    index_bands: DataFrame,
    await_seconds: int = 120,
    grow_index: bool = False,
    max_novel_ids: int | None = 1_000_000,
) -> list[int]:
    """Run the stream to completion (availableNow) filtering out near-dup
    candidates (see NoveltyFilter); returns the sorted novel doc_ids.

    TEST-HARNESS TIER (driver-side id list, bounded by ``max_novel_ids``);
    production streams use :func:`novel_documents_durable`.

    Raises :class:`NovelListTooBigError` past ``max_novel_ids`` — the
    streaming engine wraps the in-batch raise in StreamingQueryException,
    so this runner translates it back to the documented type (ADVICE r7):
    callers catching NovelListTooBigError work whether the filter runs
    batch-wise or under the engine."""
    from pyspark.errors import StreamingQueryException

    filt = NoveltyFilter(
        index_bands, grow_index=grow_index, max_novel_ids=max_novel_ids
    )
    q = (
        doc_stream.writeStream.foreachBatch(filt.process_batch)
        .trigger(availableNow=True)
        .start()
    )
    try:
        finished = q.awaitTermination(await_seconds)
    except StreamingQueryException as e:
        if filt.overflow_msg is not None:
            raise NovelListTooBigError(
                filt.overflow_msg
                + ". This in-memory filter is test-harness tier; use "
                "DurableNoveltyFilter / novel_documents_durable, which "
                "sink novel rows partition-wise with no driver-side "
                "accumulation (max_novel_ids=None opts out)."
            ) from e
        raise
    finally:
        q.stop()
    if not finished:
        raise TimeoutError(
            f"novelty stream did not finish within {await_seconds}s; "
            "a truncated novel-id list would be a silent wrong answer"
        )
    return sorted(filt.novel_ids)


SEED_BATCH = -1  # ingest_batch partition value of the pre-stream seed index


class DurableNoveltyFilter:
    """Durable deployment shape of :class:`NoveltyFilter`: all state lives
    on disk, every per-batch write is idempotent, and a killed stream
    resumes from its checkpoint without admitting a duplicate or losing a
    novel document.

    Layout (both Hive-partitioned by ``ingest_batch``)::

        <index_path>/ingest_batch=-1/...   seed bands (already-ingested corpus)
        <index_path>/ingest_batch=N/...    batch N's NOVEL docs' bands
        <novel_path>/ingest_batch=N/...    batch N's novel document rows

    Exactly-once recipe (foreachBatch is at-least-once — a batch REPLAYS
    after a crash between the batch's writes and the checkpoint commit):

    - the index read filters ``ingest_batch < batch_id`` (partition-pruned),
      so a replayed batch never sees its own partially-written bands and
      recomputes the identical novel set;
    - both writes are ``mode("overwrite") + partitionBy("ingest_batch")``
      with dynamic partition overwrite, so a replay REPLACES the batch's
      own partitions instead of appending duplicates. Any crash point —
      between the two writes, or after both but before the checkpoint
      commit — heals on replay.

    At 100 TB the index table is exactly the bucketed (band_idx, band_key)
    table the module docstring describes; the per-batch read is
    partition-pruned to prior batches and the novel sink is the pipeline's
    ingest-accept stream. Kafka in, Delta/Iceberg out are format() swaps.
    """

    def __init__(self, spark, index_path: str, novel_path: str, seed_bands: DataFrame | None = None):
        self.index_path = index_path
        self.novel_path = novel_path
        self._failed_once: set[int] = set()
        self.fail_after_novel_write: set[int] = set()  # test hook
        if not os.path.isdir(index_path):
            if seed_bands is None:
                raise ValueError(
                    f"{index_path} does not exist and no seed_bands given"
                )
            self._write_partition(
                seed_bands.withColumn("ingest_batch", F.lit(SEED_BATCH)),
                index_path,
            )

    @classmethod
    def from_minhash_artifact(
        cls, spark, artifact_dir: str, index_path: str, novel_path: str
    ):
        """Seed the durable novelty index from the PERSISTED minhash
        artifact (functions/dedup.write_minhash_index) — ONE artifact
        family serves both batch near-dup and streaming novelty (r9
        verdict #6). The stored (doc_id, sig) table re-expands to band
        rows bit-compatibly by construction (signatures are the module's
        fixed MINHASH_PERMS, banding is a pure projection of sig), so a
        doc the stream flags novel is exactly one with no band-bucket
        partner among the artifact's docs — and the stream's accepted
        novel rows append back into the same artifact via
        minhash_index_append, closing the loop (round-trip pinned in
        test_stream_novelty)."""
        from treemachine_spark.functions.dedup import (
            minhash_bands,
            read_minhash_index,
        )

        sig, _k = read_minhash_index(spark, artifact_dir)
        seed = minhash_bands(sig, sig=sig.select("doc_id", "sig"))
        return cls(spark, index_path, novel_path, seed_bands=seed)

    @staticmethod
    def _write_partition(df: DataFrame, path: str) -> None:
        (
            df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch")
            .parquet(path)
        )

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        from treemachine_spark.functions.dedup import minhash_bands, minhash_index

        if not batch.columns:
            return
        spark = batch.sparkSession
        index = spark.read.parquet(self.index_path).where(
            F.col("ingest_batch") < batch_id
        )
        sig = minhash_index(batch)
        # one signature pass feeds the hit join AND the novel-band append
        bands = minhash_bands(batch, sig=sig).localCheckpoint(eager=True)
        hit = (
            bands.join(index, ["band_idx", "band_key"], "left_semi")
            .select("doc_id")
            .distinct()
        )
        novel_ids = (
            batch.select("doc_id").distinct().join(hit, "doc_id", "left_anti")
        ).localCheckpoint(eager=True)
        novel_rows = batch.join(F.broadcast(novel_ids), "doc_id", "left_semi")
        self._write_partition(
            novel_rows.withColumn("ingest_batch", F.lit(batch_id)),
            self.novel_path,
        )
        if batch_id in self.fail_after_novel_write and batch_id not in self._failed_once:
            self._failed_once.add(batch_id)
            raise RuntimeError(
                f"injected crash after novel write of batch {batch_id}"
            )
        novel_bands = bands.join(F.broadcast(novel_ids), "doc_id", "left_semi")
        self._write_partition(
            novel_bands.withColumn("ingest_batch", F.lit(batch_id)),
            self.index_path,
        )


def novel_documents_durable(
    doc_stream: DataFrame,
    index_path: str,
    novel_path: str,
    checkpoint_location: str,
    seed_bands: DataFrame | None = None,
    await_seconds: int = 300,
    filt: DurableNoveltyFilter | None = None,
) -> DataFrame:
    """Run the durable novelty filter to completion (availableNow) with a
    REAL checkpoint: killing the query and calling this again with the same
    ``checkpoint_location`` resumes at the failed batch with no duplicate
    admitted and no novel document lost (see DurableNoveltyFilter).
    Returns the novel-documents sink as a DataFrame (no driver-side list —
    the batch-scale novel sets go straight to parquet)."""
    spark = doc_stream.sparkSession
    if filt is None:
        filt = DurableNoveltyFilter(spark, index_path, novel_path, seed_bands)
    q = (
        doc_stream.writeStream.foreachBatch(filt.process_batch)
        .option("checkpointLocation", checkpoint_location)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(await_seconds):
        q.stop()
        raise TimeoutError(
            f"durable novelty stream did not finish within {await_seconds}s"
        )
    q.stop()
    return spark.read.parquet(novel_path).where(
        F.col("ingest_batch") >= 0
    )
