"""Structured Streaming analytics over the events table (beyond-reference:
the reference is batch-ingest + read-only serving, SURVEY.md §2.9).

Jobs:
- windowed_counts: tumbling 1h windows with a watermark for late data; the
  streaming twin of workload s1_event_windows (same results once all data
  is processed — verified in tests with trigger(availableNow)).
- streaming_dedup: dropDuplicates within the watermark on event_id.
- sessionize: gap-based sessions per user via applyInPandasWithState.

Scale notes: state (window aggs, dedup keys, sessions) is bounded by the
watermark; at production scale back the source with Kafka and the sink with
partitioned parquet/Delta, both straight swaps of format().
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)


def read_event_stream(spark, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet (for tests, processed with
    trigger(availableNow); swap .parquet for .format('kafka') in prod).

    The file source requires a directory, so the events parquet is exposed
    through a symlink staging dir (read-only testdata is untouched). The
    source may be a single file (driver testdata) OR a directory of part
    files (Spark-written, e.g. the derived sf1 set) — for a directory, its
    data files are linked individually because the streaming file source
    does not descend into a nested un-partitioned subdirectory (it would
    silently read 0 rows; caught by the bench row-count tripwire at sf1).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    import hashlib
    import os
    import tempfile

    src = os.path.join(sf_dir, "events.parquet")
    tag = hashlib.md5(src.encode()).hexdigest()[:8]
    stage = os.path.join(tempfile.gettempdir(), f"tm_stream_{tag}")
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
    # idempotent staging: drop stale links (e.g. from an older layout or a
    # regenerated source) so the stream never double-counts
    for f in os.listdir(stage):
        if f not in expected:
            os.unlink(os.path.join(stage, f))
    for name, target in expected.items():
        link = os.path.join(stage, name)
        if os.path.islink(link) and os.readlink(link) != target:
            os.unlink(link)
        if not os.path.exists(link):
            os.symlink(target, link)

    # Timestamp-unit agnostic: the driver owns the testdata and its parquet
    # timestamp physical type can change between rounds (TIMESTAMP(NANOS) →
    # bigint under the legacy conf, or native timestamp[us]). Sniff the
    # schema from a batch read of the SAME file and apply the identical
    # conditional rebuild the batch path uses — never hard-code the unit.
    from treemachine_spark.io.tables import rebuild_ts_cols

    batch_schema = spark.read.parquet(src).schema
    raw = spark.readStream.schema(batch_schema).parquet(stage)
    return rebuild_ts_cols(raw)


def windowed_counts(
    events: DataFrame,
    watermark: str = "2 hours",
    window: str = "1 hour",
    slide: str | None = None,
) -> DataFrame:
    """Windowed counts + value sums with a late-data watermark: tumbling by
    default, SLIDING when ``slide`` is given (each event then lands in
    window/slide overlapping windows — state stays watermark-bounded)."""
    win = F.window("ts_t", window, slide) if slide else F.window("ts_t", window)
    return (
        events.withColumn("ts_t", F.col("ts").cast("timestamp"))
        .withWatermark("ts_t", watermark)
        .groupBy(win.alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("win.start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def enriched_windowed_value(
    events: DataFrame, customers: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Stream-static dimension enrichment: the event stream joins the STATIC
    customer dimension — Spark re-broadcasts the dimension per micro-batch,
    so the join holds NO streaming state — then tumbling 1h windowed totals
    per market segment with a late-data watermark. The canonical "enrich the
    clickstream with the user table" production shape.
    """
    dim = F.broadcast(
        customers.select(F.col("c_custkey").alias("user_id"), "c_mktsegment")
    )
    return (
        events.withColumn("ts_t", F.col("ts").cast("timestamp"))
        .withWatermark("ts_t", watermark)
        .join(dim, "user_id")
        .groupBy(F.window("ts_t", "1 hour").alias("win"), "c_mktsegment")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("win.start").cast("timestamp_ntz").alias("window_start"),
            F.col("c_mktsegment").alias("mktsegment"),
            "n_events",
            "total_value",
        )
    )


def streaming_dedup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Exactly-once-per-key within the watermark horizon."""
    return (
        events.withColumn("ts_t", F.col("ts").cast("timestamp"))
        .withWatermark("ts_t", watermark)
        .dropDuplicates(["event_id"])
    )


def stream_stream_click_purchase_join(
    events: DataFrame, window_seconds: int = 3600, watermark: str = "2 hours"
) -> DataFrame:
    """Stream-stream interval join: purchases matched to the same user's
    clicks from the preceding hour. Both sides carry watermarks so the
    join state is bounded; the time-range predicate lets Spark expire
    buffered rows (the canonical Structured Streaming join pattern).
    """
    purchases = (
        events.where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id"),
            F.col("event_id").alias("p_event"),
            F.col("ts").cast("timestamp").alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
    )
    clicks = (
        events.where(F.col("event_type") == "click")
        .select(
            F.col("user_id"),
            F.col("event_id").alias("c_event"),
            F.col("ts").cast("timestamp").alias("c_ts"),
        )
        .withWatermark("c_ts", watermark)
    )
    return purchases.join(
        clicks,
        (purchases.user_id == clicks.user_id)
        & (F.col("c_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {window_seconds} SECONDS"))
        & (F.col("c_ts") <= F.col("p_ts")),
    ).select("p_event", "c_event")


SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", IntegerType()),
        StructField("total_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n", IntegerType()),
        StructField("total", DoubleType()),
    ]
)


def sessionize(
    events: DataFrame, gap_minutes: int = 30, open_tail: str = "timeout"
) -> DataFrame:
    """Gap-based sessionization with applyInPandasWithState: a session closes
    when no event arrives for `gap_minutes` (event-time via watermark +
    processing-time timeout as the closer).

    ``open_tail`` controls each user's final, still-open session:

    - ``"timeout"`` (default, long-lived streams): a processing-time
      timeout eventually flushes it. NOT deterministic under a one-shot
      availableNow run — whether the timeout batch fires depends on
      wall-clock between batches (observed: a slow run emitted 15 tails).
    - ``"never"``: the open tail stays in state forever; a one-shot run
      emits exactly the CLOSED sessions (every session but each user's
      last) — the deterministic contract the s7 DuckDB gate pins.
    """
    gap_us = gap_minutes * 60 * 1_000_000
    use_timeout = open_tail == "timeout"

    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            (start_us, end_us, n, total) = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(end_us, unit="us")],
                    "n_events": [n],
                    "total_value": [total],
                }
            )
            return
        # ignore_index: the group arrives as MULTIPLE Arrow chunks once it
        # outgrows one batch, and concat of chunks repeats 0-based labels —
        # a label-based align (.loc) then mismatches values to timestamps
        # (caught by the s7 oracle at sf0.1 density; sf0.001 fit one chunk)
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.assign(_us=rows["ts_t"].astype("int64") // 1000).sort_values(
            "_us", ignore_index=True
        )
        ts_us = rows["_us"]
        if state.exists:
            start_us, end_us, n, total = state.get
        else:
            start_us, end_us, n, total = int(ts_us.iloc[0]), int(ts_us.iloc[0]), 0, 0.0
        out = []
        for t, v in zip(ts_us, rows["value"]):
            if n > 0 and t - end_us > gap_us:
                out.append((key[0], start_us, end_us, n, total))
                start_us, end_us, n, total = int(t), int(t), 1, float(v)
            else:
                end_us = int(t)
                n += 1
                total += float(v)
        state.update((start_us, end_us, n, total))
        if use_timeout:
            state.setTimeoutDuration(60_000)
        if out:
            yield pd.DataFrame(
                {
                    "user_id": [o[0] for o in out],
                    "session_start": [pd.Timestamp(o[1], unit="us") for o in out],
                    "session_end": [pd.Timestamp(o[2], unit="us") for o in out],
                    "n_events": [o[3] for o in out],
                    "total_value": [o[4] for o in out],
                }
            )

    return (
        events.withColumn("ts_t", F.col("ts").cast("timestamp"))
        .withWatermark("ts_t", "2 hours")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            SESSION_SCHEMA,
            _STATE_SCHEMA,
            "append",
            GroupStateTimeout.ProcessingTimeTimeout
            if use_timeout
            else GroupStateTimeout.NoTimeout,
        )
    )


def run_to_memory(
    stream_df: DataFrame,
    name: str,
    output_mode: str = "append",
    await_seconds: int = 120,
    shuffle_partitions: int | None = None,
    allow_timeout_stop: bool = False,
):
    """Run a streaming query to completion (availableNow) into an in-memory
    sink; returns the result DataFrame. Test/bench helper.

    ``shuffle_partitions`` sizes the stateful operators' state-store count
    for THIS query (a streaming query pins the partitioning it starts
    with): each state partition costs a task + store init + commit every
    micro-batch, so the one-shot runs over the bench-scale stream use 8
    instead of the session's 32 (measured ~0.5 s per run at sf0.1). A
    long-lived production stream over a big source wants the session
    default or higher — pass None to inherit.

    An availableNow run that outlives ``await_seconds`` is raised as
    TimeoutError by default — a partial sink returned as if complete is a
    silent wrong answer (ADVICE r4). The ONE shape where stop-after-wait
    is the contract, not an error, is availableNow over a stateful
    operator with ProcessingTimeTimeout (sessionize's open-tail variant):
    the data batches commit promptly, then the query lingers awaiting a
    wall-clock timeout batch that availableNow may never fire — callers
    of that shape pass ``allow_timeout_stop=True`` and read the committed
    batches.
    """
    spark = stream_df.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    if shuffle_partitions:
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    try:
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(await_seconds):
            q.stop()
            if not allow_timeout_stop:
                raise TimeoutError(
                    f"streaming query {name!r} did not finish within "
                    f"{await_seconds}s; partial sink contents discarded"
                )
    finally:
        if shuffle_partitions:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(name)
