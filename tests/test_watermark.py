"""Watermark semantics under real micro-batch boundaries: data arriving
LATER than the watermark must be dropped from the aggregation, and only
watermark-finalized windows emit in append mode.

availableNow with maxFilesPerTrigger=1 gives one micro-batch per staged
file (file source orders by modification time), so the watermark actually
ADVANCES between batches — the single-batch twin tests can't exercise
that."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from treemachine_spark.streaming import events as stream_events


def _write_batch(spark, src_dir, name, rows, mtime):
    # the file STREAM source does not descend into nested parquet output
    # directories (NOTES_r3 tripwire) — stage a bare .parquet FILE
    import glob
    import shutil

    tmp = os.path.join(src_dir, f"_tmp_{name}")
    df = (
        spark.createDataFrame(
            rows, "event_id long, event_type string, value double, ts string"
        )
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .coalesce(1)
    )
    df.write.mode("overwrite").parquet(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    dest = os.path.join(src_dir, f"{name}.parquet")
    shutil.move(part, dest)
    shutil.rmtree(tmp)
    os.utime(dest, (mtime, mtime))


def test_late_event_dropped_and_only_finalized_windows_emit(spark, tmp_path):
    src = str(tmp_path / "stream_src")
    os.makedirs(src, exist_ok=True)
    t = lambda h, m=0: f"2024-03-01 {h:02d}:{m:02d}:00"
    base = time.time() - 1000
    # batch 1: one event in window [00:00,01:00), one at 05:00 that pushes
    # the watermark to 03:00 (wm = max_ts - 2h)
    _write_batch(
        spark,
        src,
        "b1",
        [(1, "click", 1.0, t(0, 30)), (2, "click", 1.0, t(5))],
        base,
    )
    # batch 2: on-time filler. The watermark commits at the END of a batch
    # and the [00:00,01:00) window finalizes during THIS batch (one-batch
    # propagation lag — measured: a late row arriving in the batch right
    # after the advance still merges)
    _write_batch(spark, src, "b2", [(5, "click", 1.0, t(5, 10))], base + 100)
    # batch 3: a LATE event at 00:45 (window already finalized under the
    # 03:00 watermark -> must be dropped) and an on-time event at 05:30
    _write_batch(
        spark,
        src,
        "b3",
        [(3, "click", 1.0, t(0, 45)), (4, "click", 1.0, t(5, 30))],
        base + 200,
    )
    stream = (
        spark.readStream.schema(
            "event_id long, event_type string, value double, ts timestamp"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    agg = stream_events.windowed_counts(stream, watermark="2 hours", window="1 hour")
    result = stream_events.run_to_memory(
        agg, "wm_test", output_mode="append", shuffle_partitions=2
    )
    got = {
        str(r["window_start"]): r["n_events"] for r in result.collect()
    }
    # the 00:00 window finalized with ONE event: the late 00:45 row from
    # batch 3 was dropped by the watermark, not merged
    assert got == {"2024-03-01 00:00:00": 1}
    # batch semantics over the same files WOULD count both -> 2
    batch = spark.read.parquet(src)
    batch_counts = {
        str(r["window_start"]): r["n_events"]
        for r in stream_events.windowed_counts(batch.where(F.lit(True)))
        .collect()
    }
    assert batch_counts["2024-03-01 00:00:00"] == 2
