"""Training-data pipeline: multimodal plumbing, streaming jobs, and unit
checks on the dedup/similarity primitives (the full oracle comparison runs
in test_workload_oracle.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from treemachine_spark.functions import multimodal, similarity
from treemachine_spark.io.tables import load_tables
from treemachine_spark.streaming import events as stream_events


def test_multimodal_feature_extraction(spark):
    docs = load_tables(spark, SF_SMOKE)["documents"]
    media = multimodal.attach_media(docs.limit(20))
    feats = multimodal.extract_features(media, fake_decoder=True)
    rows = feats.collect()
    assert len(rows) == 20
    assert set(feats.columns) == {"media_id", "media_type", "n_bytes", "checksum", "feat_mean"}
    # deterministic fake decode: same input -> same checksum
    again = {r["media_id"]: r["checksum"] for r in multimodal.extract_features(media, True).collect()}
    assert all(again[r["media_id"]] == r["checksum"] for r in rows)


def test_multimodal_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"bytes")


def test_frame_sampling(spark):
    media = spark.createDataFrame(
        [(1, "video", bytearray(b"x"), None, None, None, 25)], multimodal.MEDIA_SCHEMA
    )
    frames = multimodal.frame_sample_stub(media, every_n=10).collect()
    assert [r["frame_idx"] for r in frames] == [0, 10, 20]


def test_lsh_recall_vs_brute(spark):
    """ANN sanity: LSH bucket results are a subset of candidates whose
    bucket matches; overlap with exact top-10 should be nonzero."""
    emb = load_tables(spark, SF_SMOKE)["embeddings"]
    q = emb.where(F.col("vec_id") < 5)
    brute = similarity.brute_force_topk(emb, q, k=10).collect()
    lsh = similarity.lsh_topk(emb, q, k=10).collect()
    brute_pairs = {(r["query_id"], r["neighbor_id"]) for r in brute}
    lsh_pairs = {(r["query_id"], r["neighbor_id"]) for r in lsh}
    assert lsh_pairs  # buckets are non-degenerate
    # every query's own bucket contains itself -> its LSH hits score
    # identically to brute hits when they overlap
    scores_b = {(r["query_id"], r["neighbor_id"]): r["score"] for r in brute}
    for r in lsh:
        key = (r["query_id"], r["neighbor_id"])
        if key in scores_b:
            assert scores_b[key] == r["score"]


def test_streaming_windowed_counts_matches_batch(spark):
    stream = stream_events.read_event_stream(spark, SF_SMOKE)
    agg = stream_events.windowed_counts(stream)
    result = stream_events.run_to_memory(agg, "win_counts", output_mode="complete")

    from treemachine_spark.workload.pipeline_queries import q_s1_event_windows

    batch = q_s1_event_windows(spark, SF_SMOKE)
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in result.collect()
    }
    want = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in batch.collect()
    }
    assert got == want


def test_streaming_dedup(spark):
    stream = stream_events.read_event_stream(spark, SF_SMOKE)
    deduped = stream_events.streaming_dedup(stream).select("event_id")
    result = stream_events.run_to_memory(deduped, "dedup_events")
    n = result.count()
    batch_n = load_tables(spark, SF_SMOKE)["events"].select("event_id").distinct().count()
    assert n == batch_n


def test_sessionize(spark):
    stream = stream_events.read_event_stream(spark, SF_SMOKE)
    sessions = stream_events.sessionize(stream, gap_minutes=30)
    result = stream_events.run_to_memory(sessions, "sessions")
    # availableNow + processing-time timeout: only sessions closed by a
    # subsequent event in the same run are emitted; shape check
    assert set(result.columns) == {
        "user_id", "session_start", "session_end", "n_events", "total_value",
    }
    rows = result.collect()
    for r in rows:
        assert r["session_end"] >= r["session_start"]
        assert r["n_events"] >= 1


def test_stream_stream_join_matches_batch(spark):
    stream = stream_events.read_event_stream(spark, SF_SMOKE)
    joined = stream_events.stream_stream_click_purchase_join(stream)
    result = stream_events.run_to_memory(joined, "ss_join")
    got = {(r["p_event"], r["c_event"]) for r in result.collect()}

    from treemachine_spark.workload.queries import q_j4_range_join

    want = {
        (r["p_event"], r["c_event"])
        for r in q_j4_range_join(spark, SF_SMOKE).collect()
    }
    assert got == want


def test_grouped_agg_udaf_matches_jvm_percentile(spark):
    """UDF-surface demo: an Arrow-batched GROUPED_AGG pandas UDAF computes
    the same exact median as the JVM percentile() that the served
    x4_lang_stats query uses (the UDAF materializes each group's series on
    one executor, so the served path stays JVM-side; this test keeps the
    GROUPED_AGG member of the UDF surface exercised)."""
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    from treemachine_spark.functions import text

    # explicit functionType: `from __future__ import annotations` turns type
    # hints into strings, which pandas_udf's hint inference can't read
    @pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def exact_median(v):
        return float(v.median())

    d = load_tables(spark, SF_SMOKE)["documents"]
    toks = d.select("lang", text.token_count(F.col("text")).alias("n"))
    got = {
        r["lang"]: r["m"]
        for r in toks.groupBy("lang").agg(exact_median("n").alias("m")).collect()
    }
    want = {
        r["lang"]: r["m"]
        for r in toks.groupBy("lang")
        .agg(F.expr("CAST(percentile(n, 0.5) AS DOUBLE)").alias("m"))
        .collect()
    }
    assert got == want
