"""Streaming statistics: a running per-group quantile sketch over a
stream, maintained as per-batch partial sketches that MERGE exactly.

Beyond-reference (the reference has no streaming surface at all); the
composition is the lakehouse "mergeable partial aggregate" pattern:

- Each micro-batch writes ITS OWN bottom-k sketch
  (functions/sketches.quantile_sketch_grouped — deterministic integer
  state) to an ``ingest_batch``-partitioned table with dynamic-partition
  OVERWRITE. foreachBatch is at-least-once; a replayed batch REPLACES its
  own partition, so the table never double-counts — the same
  exactly-once-by-idempotence recipe as streaming/documents.py's durable
  novelty index.
- The running sketch is a READ-TIME FOLD: union all partial sketches,
  sum counts per (group, value), re-take the k smallest hashes per group
  (quantile_merge_grouped's law, n-way). Because bottom-k merge is exact,
  the fold equals the sketch of ALL rows seen — pinned in
  tests/test_streaming_stats.py.
- State per batch is k rows per group (BIGINTs), so a day of micro-batches
  is megabytes; ``compact()`` folds the partials into one partition when
  the partition count grows (itself an idempotent rewrite).

At 100 TB this is how per-window corpus statistics (token-length
percentiles per language, event-value quantiles per user tier) are kept
fresh without ever re-scanning history: history lives pre-aggregated at k
rows per group per batch.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from treemachine_spark.functions.sketches import quantile_sketch_grouped

COMPACT_BATCH = -1  # ingest_batch partition holding compacted history


class StreamingQuantileSketch:
    """foreachBatch hook maintaining the partial-sketch table."""

    def __init__(self, path: str, col: str, groups: list[str], k: int = 1024):
        self.path = path
        self.col = col
        self.groups = list(groups)
        self.k = k

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        if not batch.columns:
            return
        part = quantile_sketch_grouped(batch, self.col, self.groups, self.k)
        (
            part.withColumn("ingest_batch", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch")
            .parquet(self.path)
        )

    # ------------------------------------------------------------------
    def _fold(self, parts: DataFrame) -> DataFrame:
        merged = parts.groupBy(*self.groups, "h", "v").agg(
            F.sum("cnt").alias("cnt")
        )
        w = Window.partitionBy(*self.groups).orderBy("h", "v")
        return (
            merged.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= self.k)
            .select(*self.groups, "h", "v", "cnt")
        )

    def current(self, spark) -> DataFrame:
        """The running sketch: n-way merge of every partial. Exact — equals
        the sketch built over all rows seen (bottom-k merge law)."""
        if not os.path.isdir(self.path):
            raise ValueError(f"{self.path}: no partial sketches written yet")
        return self._fold(spark.read.parquet(self.path))

    def compact(self, spark) -> None:
        """Fold all partials into the COMPACT_BATCH partition and drop the
        per-batch partitions — bounds partition count for long streams.
        Plain overwrite of the whole table: the fold is a pure function of
        the partials, so rerunning it is idempotent."""
        folded = self.current(spark).withColumn(
            "ingest_batch", F.lit(COMPACT_BATCH)
        )
        # materialize before the overwrite clobbers the source files
        folded = folded.localCheckpoint(eager=True)
        (
            folded.write.mode("overwrite")
            .partitionBy("ingest_batch")
            .parquet(self.path)
        )


def running_quantile_sketch(
    stream_df: DataFrame,
    path: str,
    checkpoint_location: str,
    col: str,
    groups: list[str],
    k: int = 1024,
    await_seconds: int = 300,
) -> DataFrame:
    """Run the stream to completion (availableNow) maintaining the partial
    sketch table; returns the folded running sketch. Restart-safe: the
    checkpoint replays unfinished batches and the per-batch overwrite makes
    the replay a no-op."""
    sk = StreamingQuantileSketch(path, col, groups, k)
    q = (
        stream_df.writeStream.foreachBatch(sk.process_batch)
        .option("checkpointLocation", checkpoint_location)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(await_seconds):
        q.stop()
        raise TimeoutError(
            f"quantile-sketch stream did not finish within {await_seconds}s"
        )
    q.stop()
    return sk.current(stream_df.sparkSession)
