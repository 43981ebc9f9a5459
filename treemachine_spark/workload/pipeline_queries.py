"""Training-data pipeline queries (dedup / similarity / text analysis /
streaming-batch) over the documents, embeddings and events tables — the
beyond-reference operator families (BASELINE.json north star), each with a
DuckDB oracle in pipeline_oracles.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from treemachine_spark.functions import dedup, sampling, similarity, text
from treemachine_spark.io.tables import load_tables


def q_x1_text_profile(spark, sf_dir):
    """Token count + quality + language ID + fingerprint in one pass."""
    return text.text_profile(load_tables(spark, sf_dir)["documents"])


def q_x2_bpe_tokens(spark, sf_dir):
    """Regex sub-word token counting."""
    d = load_tables(spark, sf_dir)["documents"]
    return d.select(
        "doc_id", text.bpe_ish_token_count(F.col("text")).alias("n_bpe_tokens")
    )


def q_x4_lang_stats(spark, sf_dir):
    """Per-language corpus stats: exact interpolated median token count via
    JVM ``percentile(n, 0.5)`` — whole-stage-codegen partial aggregation, no
    Python in the plan. A GROUPED_AGG pandas UDAF computes the same value
    (kept as the UDF-surface demo in tests/test_pipeline.py) but would
    materialize each language's whole series on one executor — unbounded
    when the biggest group is 'all English' at 100 TB; percentile()'s
    partial-agg buffer is the scalable shape."""
    d = load_tables(spark, sf_dir)["documents"]
    toks = d.select("lang", text.token_count(F.col("text")).alias("n"))
    return toks.groupBy("lang").agg(
        F.expr("CAST(percentile(n, 0.5) AS DOUBLE)").alias("median_tokens"),
        F.count("*").alias("n_docs"),
    )


def q_x5_redaction(spark, sf_dir):
    """PII-style redaction pass; returns docs whose text changed (the
    synthetic corpus has none — determinism of the no-op is still gated)
    plus a checksum column over the redacted text for all docs."""
    d = load_tables(spark, sf_dir)["documents"]
    red = d.select("doc_id", text.redact(F.col("text")).alias("red"))
    return red.select(
        "doc_id", F.md5("red").alias("red_hash"), (F.length("red")).alias("red_len")
    )


def q_d6_purge_list(spark, sf_dir):
    """End-to-end dedup outcome: per duplicate cluster keep min doc_id,
    emit the purge list (cluster members that are not the keeper)."""
    pairs = dedup.ngram_jaccard_pairs(
        load_tables(spark, sf_dir)["documents"], threshold=0.3
    )
    comp = dedup.connected_components(pairs)
    return comp.where(F.col("node_id") != F.col("component")).select(
        F.col("node_id").alias("purge_doc_id"), F.col("component").alias("keeper_doc_id")
    )


def q_f1_funnel(spark, sf_dir):
    """Funnel analysis over the event stream: users with a click, and users
    whose click converted to a purchase within the following hour."""
    e = load_tables(spark, sf_dir)["events"]
    clickers = e.where(F.col("event_type") == "click").select("user_id").distinct()
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts")
    )
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts")
    )
    # microsecond precision — cast-to-long truncates to whole seconds and
    # admits conversions up to 0.999s past the hour (sf0.1 oracle catch)
    pt = F.unix_micros(F.col("p_ts").cast("timestamp"))
    ct = F.unix_micros(F.col("c_ts").cast("timestamp"))
    converted = (
        clicks.join(purchases, "user_id")
        .where((pt >= ct) & (pt <= ct + 3600 * 1_000_000))
        .select("user_id")
        .distinct()
    )
    return clickers.select(F.lit("click").alias("stage")).groupBy("stage").agg(
        F.count("*").alias("n_users")
    ).unionByName(
        converted.select(F.lit("click_to_purchase_1h").alias("stage"))
        .groupBy("stage")
        .agg(F.count("*").alias("n_users"))
    )


def q_d1_exact_dedup(spark, sf_dir):
    """Exact dedup groups (hash-groupBy)."""
    return dedup.exact_dedup_groups(load_tables(spark, sf_dir)["documents"])


def _ctx(spark, sf_dir):
    # lazy import: workload.queries imports this module at its bottom
    from treemachine_spark.workload.queries import get_ctx

    return get_ctx(spark, sf_dir)


def q_d2_minhash_pairs(spark, sf_dir):
    """MinHash+LSH near-dup candidate pairs with exact Jaccard verify,
    served from the ingest-time PAIRS artifact (band join + verify ran once
    at ingest over the ctx doc_sig index; serving is a pure lookup — the
    reference's precompute-at-ingest contract). The cold-path compute stays
    covered by bench_pipeline.py and the dedup unit tests."""
    return _ctx(spark, sf_dir)["dup_pairs"]


def q_d3_simhash(spark, sf_dir):
    """32-bit SimHash signature per document."""
    return dedup.simhash_profile(load_tables(spark, sf_dir)["documents"])


def q_d4_ngram_jaccard(spark, sf_dir):
    """Exact n-gram Jaccard near-dups via inverted shingle index."""
    return dedup.ngram_jaccard_pairs(
        load_tables(spark, sf_dir)["documents"], threshold=0.3
    )


def q_d8_jaccard_probe(spark, sf_dir):
    """Request-scale exact-Jaccard near-dup probe (dedup.ngram_jaccard_probe,
    r8): pairs touching a bounded probe set — broadcast probe shingles
    against one inverted-index stream, LINEAR in the corpus where the d4
    batch recipe's pair-shingle intermediate is quadratic in cluster size
    (box-bound at sf10; this shape is what runs there, and at 100 TB)."""
    return dedup.ngram_jaccard_probe(
        load_tables(spark, sf_dir)["documents"], probe_ids=list(range(20))
    )


def q_d9_capped_artifact(spark, sf_dir):
    """Capped-space dedup ARTIFACT end-to-end (r9 verdict #2): write the
    bucketed shingle index with max_doc_freq baked in (stop shingles
    dropped, stored sizes recomputed over the survivors, the dropped
    shingles persisted as stoplist.parquet), then serve a probe whose
    query-side sizes come FROM the artifact's shingle space — the exact
    d7 capped-space Jaccard restricted to the probe set, via the index
    the 100 TB tier would read. The write is the ingest job; the probe
    is the request shape (bucket-directory prune + stop-set InSet)."""
    import os
    import shutil
    import tempfile

    docs = load_tables(spark, sf_dir)["documents"]
    d = os.path.join(
        tempfile.gettempdir(),
        f"tm_capidx_{os.path.basename(os.path.normpath(sf_dir))}_{os.getpid()}",
    )
    shutil.rmtree(d, ignore_errors=True)
    dedup.write_shingle_index(docs, d, n_buckets=32, max_doc_freq=20)
    idx, meta, stop = dedup.read_shingle_index(spark, d)
    return dedup.ngram_jaccard_probe(
        docs,
        probe_ids=list(range(20)),
        threshold=0.3,
        index=idx,
        index_n_buckets=meta["n_buckets"],
        index_max_doc_freq=meta["max_doc_freq"],
        index_stoplist=stop,
    )


def q_m1_media_features(spark, sf_dir):
    """Multimodal plumbing under the oracle: binary media column (encoded
    payload + typed metadata) -> mapInPandas feature extraction over Arrow
    batches (deterministic fake decoder; real codecs are a drop-in)."""
    from treemachine_spark.functions import multimodal as mm

    docs = load_tables(spark, sf_dir)["documents"]
    return mm.extract_features(mm.attach_media(docs), fake_decoder=True)


def q_m2_media_probe(spark, sf_dir):
    """Header-parse metadata enrichment under the oracle (r12): REAL P6
    PPM payloads are encoded per row (dims derived from doc_id, with a
    header comment line), probe_media parses the container headers back
    over mapInPandas (functions/multimodal.probe_image — the scan-side
    metadata pass a 100 TB media pipeline runs before any pixel decode),
    and the recovered dimensions compare against the arithmetic oracle.
    An encode->parse roundtrip: a parser bug cannot cancel out."""
    from treemachine_spark.functions import multimodal as mm

    docs = load_tables(spark, sf_dir)["documents"]
    w = (F.col("doc_id") % 7 + 1).cast("int")
    h = (F.col("doc_id") % 5 + 1).cast("int")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("media_type"),
        F.encode(
            F.concat(
                F.lit("P6\n# synthetic fixture\n"),
                w.cast("string"),
                F.lit(" "),
                h.cast("string"),
                F.lit("\n255\n"),
                F.expr(
                    "repeat('x', CAST((doc_id % 7 + 1) * (doc_id % 5 + 1) "
                    "* 3 AS INT))"
                ),
            ),
            "UTF-8",
        ).alias("content"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("sample_rate"),
        F.lit(None).cast("int").alias("n_frames"),
    )
    return mm.probe_media(media).select("media_id", "width", "height")


def q_v5_centroid_cells(spark, sf_dir):
    """IVF cell histogram: k-means assignment step (broadcast centroid
    cross join + per-row argmax) + per-cell count — the partition-balance
    diagnostic every vector index build runs."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    return (
        similarity.centroid_assign(emb, n_centroids=8)
        .groupBy("cent_id")
        .agg(F.count("*").alias("n_vectors"))
    )


def q_x8_token_percentiles(spark, sf_dir):
    """Exact per-language token-length percentiles (interpolated p50/p90) —
    JVM-side percentile() so the whole profile stays codegen'd."""
    docs = load_tables(spark, sf_dir)["documents"]
    return (
        docs.select("lang", text.token_count(F.col("text")).alias("n"))
        .groupBy("lang")
        .agg(
            F.round(F.expr("percentile(n, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(n, 0.9)"), 4).alias("p90"),
            F.count("*").alias("n_docs"),
        )
    )


def q_x6_hash_split(spark, sf_dir):
    """Deterministic train/val/test assignment by key hash (80/10/10),
    verified via per-split doc counts + char totals."""
    docs = sampling.hash_split(load_tables(spark, sf_dir)["documents"], "doc_id")
    return docs.groupBy("split").agg(
        F.count("*").alias("n_docs"), F.sum("n_chars").alias("sum_chars")
    )


def q_x7_chunking(spark, sf_dir):
    """Sliding-window document chunking (64-word windows, 16 overlap) —
    flatMap-shaped array explode, value-checked via per-chunk h32."""
    return text.chunk_documents(
        load_tables(spark, sf_dir)["documents"], size=64, overlap=16
    )


def q_d7_jaccard_capped(spark, sf_dir):
    """Frequency-capped n-gram Jaccard — the 100 TB scale path for d4: stop
    shingles above the doc-frequency cap are dropped before the inverted-
    index self-join, killing its quadratic hot-key fan-out."""
    return dedup.ngram_jaccard_pairs(
        load_tables(spark, sf_dir)["documents"], threshold=0.3, max_doc_freq=20
    )


def q_d5_dup_clusters(spark, sf_dir):
    """Duplicate clusters: connected components (iterative min-label
    propagation) over the exact n-gram-Jaccard near-dup pair graph."""
    pairs = dedup.ngram_jaccard_pairs(
        load_tables(spark, sf_dir)["documents"], threshold=0.3
    )
    return dedup.connected_components(pairs)


_STREAM_RUN = {"n": 0}


def _state_partitions(spark, cap: int) -> int:
    """State-store count for the one-shot gate streams: the measured
    sweet spot (``cap``), never more than the session's cores — each
    state partition costs a store init + commit per micro-batch, so at
    low core counts extra partitions are pure serialized overhead
    (VERDICT r14 #5). Result-neutral: the gates' windowed/sessionized
    aggregates are deterministic under any state partitioning."""
    return max(1, min(cap, spark.sparkContext.defaultParallelism))


def q_s3_streaming_windows(spark, sf_dir):
    """The ACTUAL Structured Streaming windowed aggregation (watermark +
    tumbling windows, availableNow trigger) — gated against the same batch
    oracle as s1: stream results must equal the batch ones."""
    from treemachine_spark.streaming import events as se

    _STREAM_RUN["n"] += 1
    name = f"wl_stream_windows_{_STREAM_RUN['n']}"
    stream = se.read_event_stream(spark, sf_dir)
    # state partitions min(4, cores) (r14 measured 8 -> 4 partitions as
    # 1.17 -> 0.86 s median for the s4 shape — each state partition pays a
    # store init + commit per micro-batch; r15 derives the constant from
    # the session so a low-core run never schedules more state stores than
    # cores; identical results — state partitioning cannot change a
    # deterministic windowed aggregate). A long-lived production stream
    # wants the session default or higher — pass None to inherit.
    return se.run_to_memory(
        se.windowed_counts(stream), name, output_mode="complete",
        shuffle_partitions=_state_partitions(spark, 4),
    )


def q_s4_stream_enriched(spark, sf_dir):
    """REAL streaming run of the stream-static dimension join (events stream
    ⋈ broadcast customer dimension → windowed per-segment totals), gated
    against the equivalent batch SQL."""
    from treemachine_spark.streaming import events as se

    _STREAM_RUN["n"] += 1
    name = f"wl_stream_enriched_{_STREAM_RUN['n']}"
    stream = se.read_event_stream(spark, sf_dir)
    customers = load_tables(spark, sf_dir)["customer"]
    return se.run_to_memory(
        se.enriched_windowed_value(stream, customers),
        name,
        output_mode="complete",
        # min(4, cores) state partitions: the measured one-shot sweet
        # spot, core-count-capped (see s3)
        shuffle_partitions=_state_partitions(spark, 4),
    )


def q_s7_sessionize_stream(spark, sf_dir):
    """REAL streaming gap-sessionization (applyInPandasWithState,
    streaming/events.py:209) under a DuckDB lag-gap oracle — the stateful
    custom operator the batch twin s2 only mirrors relationally.

    Deterministic availableNow contract (VERDICT r3 #5): the file source
    takes the whole staged input in one micro-batch (no maxFilesPerTrigger
    option), so each user's events reach ONE state call, are ts-sorted
    inside it, and exactly the CLOSED sessions — every session but each
    user's last — are emitted in-batch. The open tail stays in state
    (its ProcessingTime timeout never fires in a one-shot run); the
    oracle excludes each user's last lag-gap session the same way.
    total_value is rounded to 2dp after the per-session float sum (the
    per-session event counts are tiny; the s2 convention).
    """
    from treemachine_spark.streaming import events as se

    _STREAM_RUN["n"] += 1
    name = f"wl_stream_sessions_{_STREAM_RUN['n']}"
    stream = se.read_event_stream(spark, sf_dir)
    out = se.run_to_memory(
        se.sessionize(stream, open_tail="never"), name,
        shuffle_partitions=_state_partitions(spark, 8),
    )
    return out.select(
        "user_id",
        "session_start",
        "session_end",
        "n_events",
        F.round("total_value", 2).alias("total_value"),
    )


def q_s8_stream_novelty(spark, sf_dir):
    """REAL streaming near-dup filter (foreachBatch over a document file
    stream, streaming/documents.py): a static LSH band index is built from
    the even-doc_id half of the corpus; the odd-doc_id half streams in and
    every doc sharing >= 1 band bucket with the index is dropped as a
    near-dup candidate — the streaming twin of the ingest-time minhash
    dedup. Deterministic availableNow contract: the file source takes the
    staged input whole, per-batch work is plain batch DataFrame code
    (Arrow signature pass, semi/anti joins), novelty is defined against
    the static index. The oracle is the NOT EXISTS band-match twin in
    DuckDB over the same split."""
    from treemachine_spark.graph.traversal import local_df
    from treemachine_spark.streaming import documents as sd

    docs = load_tables(spark, sf_dir)["documents"]
    index_bands = dedup.minhash_bands(
        docs.where(F.col("doc_id") % 2 == 0)
    ).cache()
    index_bands.count()
    stream = sd.read_document_stream(spark, sf_dir).where(
        F.col("doc_id") % 2 == 1
    )
    ids = sd.novel_documents(stream, index_bands)
    index_bands.unpersist()
    return local_df(spark, [(i,) for i in ids], "doc_id bigint")


def q_s9_stream_quantiles(spark, sf_dir):
    """REAL streaming running quantile sketch (streaming/stats.py): the
    document stream is processed in micro-batches, each writing its own
    per-lang bottom-k partial sketch (idempotent partitioned overwrite);
    the result is the read-time n-way merge — which by the bottom-k merge
    law equals the whole-corpus sketch, so the DuckDB oracle is the plain
    batch per-group bottom-k. Deterministic end-to-end (md5 hashes,
    integer counts)."""
    import shutil
    import tempfile

    from treemachine_spark.functions.text import token_count
    from treemachine_spark.graph.traversal import local_df
    from treemachine_spark.streaming import documents as sd
    from treemachine_spark.streaming.stats import running_quantile_sketch

    work = tempfile.mkdtemp(prefix="tm_s9_")
    try:
        stream = sd.read_document_stream(spark, sf_dir).select(
            "lang", token_count(F.col("text")).alias("n")
        )
        sketch = running_quantile_sketch(
            stream,
            f"{work}/sk",
            f"{work}/ckpt",
            "n",
            ["lang"],
            k=64,
        )
        rows = [
            (r["lang"], r["h"], r["v"], r["cnt"]) for r in sketch.collect()
        ]
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return local_df(spark, rows, "lang string, h bigint, v bigint, cnt bigint")


def q_k9_stream_topk(spark, sf_dir):
    """REAL streaming Count-Min heavy-hitters sketch
    (streaming/stats.StreamingTopKSketch): the event stream is processed
    in micro-batches, each writing its own CMS partial plus its exact
    top-C candidates (idempotent partitioned overwrite); the read-time
    fold's CMS cells equal the single-pass sketch of every event by the
    cell-wise-sum merge law, so the DuckDB oracle is the plain batch CMS
    (cms_sketch_sql). Deterministic end-to-end (md5 positions, integer
    counts). The candidate/estimate tier (capture + cms_topk_from_state)
    is pinned in tests/test_topk_sketch.py — capture depends on Spark's
    batch boundaries, which SQL cannot see, so the gate compares the
    exact cells (the k8 register-comparison pattern)."""
    import shutil
    import tempfile

    from treemachine_spark.graph.traversal import local_df
    from treemachine_spark.streaming import events as se
    from treemachine_spark.streaming.stats import running_topk_sketch

    work = tempfile.mkdtemp(prefix="tm_k9_")
    try:
        stream = se.read_event_stream(spark, sf_dir).select("user_id")
        state = running_topk_sketch(
            stream, f"{work}/sk", f"{work}/ckpt", "user_id",
            depth=4, width=512, n_candidates=256,
        )
        rows = [
            (r["d"], r["pos"], r["cnt"])
            for r in state.where(F.col("key").isNull()).collect()
        ]
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return local_df(spark, rows, "d int, pos int, cnt bigint")


def q_v1_ann_brute(spark, sf_dir):
    """Exact top-10 neighbors (quantized dot product) for query vecs id<5."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    return similarity.brute_force_topk(emb, emb.where(F.col("vec_id") < 5), k=10)


def q_v2_ann_lsh(spark, sf_dir):
    """LSH-bucketed ANN (sign-bit sketch) for query vecs id<5."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    return similarity.lsh_topk(emb, emb.where(F.col("vec_id") < 5), k=10)


def q_v3_ivf_topk(spark, sf_dir):
    """IVF-cell ANN (deterministic centroids, nprobe=2) for query vecs id<5."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    return similarity.ivf_topk(emb, emb.where(F.col("vec_id") < 5), k=10)


def q_v9_filtered_ann(spark, sf_dir):
    """Filtered ANN (VERDICT r13 #4): top-10 among corpus vectors with
    label = 7 — the metadata predicate is applied INSIDE the IVF cell
    scan (similarity.ivf_topk(where=)), before ranking, so k fills with
    the true filtered top-k; post-filtering an unfiltered top-k silently
    under-fills. Cell choice (centroids, probes) is filter-independent;
    the oracle replicates exactly that split: unfiltered cells/probes,
    label filter on the assigned scan."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    return similarity.ivf_topk(
        emb, emb.where(F.col("vec_id") < 5), k=10, where="label = 7"
    )


def q_v4_cosine_pairs(spark, sf_dir):
    """Exact embedding-cosine near-dup pairs (cos >= 0.4) — the quadratic
    all-pairs EXACTNESS BASELINE; production near-dup runs go through the
    bucketed v6 (cosine_near_dup_pairs_lsh). Size-gated (VERDICT r5 #2):
    above 10k vectors (the derived sf1 corpus is 20k) the guard raises
    TooManyPairsError in seconds instead of launching the BNLJ that blew
    the r5 sf1 sweep budget."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    return similarity.cosine_near_dup_pairs(emb, threshold=0.4)


def q_v6_cosine_pairs_lsh(spark, sf_dir):
    """DEFAULT embedding near-dup pairs: sign-bit banded LSH candidates
    (equi-join on (band_idx, band_key) — sub-quadratic) + exact
    quantized-cosine verify, the same candidate->verify shape as d2."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    return similarity.cosine_near_dup_pairs_lsh(emb, threshold=0.4)


def q_v7_semantic_dedup(spark, sf_dir):
    """SemDeDup-style cluster-scoped near-dup pairs: k-means cell assignment
    (broadcast argmax) + within-cell exact quantized-cosine — the
    near-linear semantic-dedup shape (arXiv:2303.09540)."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    return similarity.semantic_dedup_pairs(emb, threshold=0.4)


def q_x9_decontaminate(spark, sf_dir):
    """Benchmark decontamination: corpus docs (doc_id >= 10) sharing any
    3-word shingle with the held-out benchmark set (doc_id < 10)."""
    from treemachine_spark.functions.dedup import decontaminate

    docs = load_tables(spark, sf_dir)["documents"]
    return decontaminate(
        docs.where(F.col("doc_id") >= 10), docs.where(F.col("doc_id") < 10)
    )


def q_x10_source_quota(spark, sf_dir):
    """Per-source quota sampling: keep the 50 smallest doc_ids per source."""
    from treemachine_spark.functions.sampling import source_quota

    docs = load_tables(spark, sf_dir)["documents"]
    return source_quota(docs, per_source=50)


def q_x11_repetition(spark, sf_dir):
    """Within-doc duplicate-2gram fraction (Gopher-style quality rule).
    Served by the Arrow-batched profile (r14; integer components cross the
    boundary, division+ROUND stay in codegen — text.repetition_profile);
    text.repetition_score remains the pure-Catalyst column twin."""
    docs = load_tables(spark, sf_dir)["documents"]
    return text.repetition_profile(docs)


def q_x15_tfidf(spark, sf_dir):
    """Top-3 TF-IDF terms per document (functions/text.tfidf_topk)."""
    docs = load_tables(spark, sf_dir)["documents"]
    return text.tfidf_topk(docs, k=3)


def q_x16_keyword_search(spark, sf_dir):
    """Conjunctive keyword search ranked by summed TF-IDF; the query is the
    corpus's own 2 highest-df terms so the gate is self-contained."""
    docs = load_tables(spark, sf_dir)["documents"]
    return text.keyword_search(docs, terms=None, limit=20)


def q_x17_dup_spans(spark, sf_dir):
    """Cross-doc duplicated 6-token spans (exact substring dedup at span
    granularity, functions/dedup.dup_spans)."""
    docs = load_tables(spark, sf_dir)["documents"]
    from treemachine_spark.functions.dedup import dup_spans

    return dup_spans(docs, width=6, min_docs=2)


def q_x18_mixture_weights(spark, sf_dir):
    """Temperature-scaled (alpha=0.5) per-source mixture weights."""
    docs = load_tables(spark, sf_dir)["documents"]
    from treemachine_spark.functions.sampling import mixture_weights

    return mixture_weights(docs, alpha=0.5, group_col="source")


def q_v8_hard_negatives(spark, sf_dir):
    """Contrastive hard negatives: top-5 cross-label neighbors for the 5
    smallest-id query vectors (similarity.hard_negatives)."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    return similarity.hard_negatives(emb, emb.where(F.col("vec_id") < 5), k=5)


def q_x19_strip_spans(spark, sf_dir):
    """Substring-dedup rewrite: duplicated 6-token spans removed, corpus-
    first occurrence kept (dedup.strip_dup_spans)."""
    docs = load_tables(spark, sf_dir)["documents"]
    from treemachine_spark.functions.dedup import strip_dup_spans

    return strip_dup_spans(docs, width=6, min_docs=2)


def q_x20_lm_score(spark, sf_dir):
    """Bigram-LM perplexity-style quality score (text.lm_score)."""
    docs = load_tables(spark, sf_dir)["documents"]
    return text.lm_score(docs)


def q_x21_table_stats(spark, sf_dir):
    """One-pass ANALYZE-style column statistics (operators/stats.py)."""
    from treemachine_spark.operators.stats import table_stats

    return table_stats(load_tables(spark, sf_dir)["documents"])


def q_x12_sequence_packing(spark, sf_dir):
    """Per-language 512-token bin packing (training sequence packing)."""
    docs = load_tables(spark, sf_dir)["documents"]
    return text.sequence_packing(docs, capacity=512)


def q_x13_pack_manifest(spark, sf_dir):
    """Packed-shard manifest: per (lang, bin) doc membership + totals —
    what a training-shard writer materializes from x12's assignment. Doc
    ids ride as a sorted comma-joined string (deterministic, and the
    cross-engine comparator treats it as a scalar)."""
    docs = load_tables(spark, sf_dir)["documents"]
    packed = text.sequence_packing(docs, capacity=512)
    return packed.groupBy("lang", "bin_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.concat_ws(",", F.sort_array(F.collect_list("doc_id"))).alias("doc_ids"),
    )


def q_x14_mixture_sample(spark, sf_dir):
    """Stratified mixture rebalance: downsample the 'en' head to 40%, keep
    60% of es/fr, all of de/zh — then the resulting per-language counts."""
    from treemachine_spark.functions.sampling import mixture_sample

    docs = load_tables(spark, sf_dir)["documents"]
    kept = mixture_sample(
        docs, {"en": 40, "es": 60, "fr": 60, "de": 100, "zh": 100}
    )
    return kept.groupBy("lang").agg(F.count("*").alias("n_kept"))


def q_s5_sliding_windows(spark, sf_dir):
    """SLIDING 2h windows with a 1h slide (each event lands in exactly two
    windows) — the overlapping-window §2.9 variant the tumbling gates
    don't cover. Native F.window(slide) so the same expression drops into
    the streaming job unchanged; window starts align to the slide like
    date_trunc, which is what the oracle re-derives."""
    e = load_tables(spark, sf_dir)["events"]
    return (
        e.withColumn("ts_t", F.col("ts").cast("timestamp"))
        .groupBy(
            F.window("ts_t", "2 hours", "1 hour").alias("win"), "event_type"
        )
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


def q_s1_event_windows(spark, sf_dir):
    """Tumbling 1h windowed aggregation over the events stream table (batch
    form of the Structured Streaming job in streaming/events.py)."""
    e = load_tables(spark, sf_dir)["events"]
    return (
        e.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("window_start"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# sketches (functions/sketches.py): mergeable distinct / heavy-hitter state
# ---------------------------------------------------------------------------


def q_k1_kmv_distinct(spark, sf_dir):
    """KMV (bottom-k) distinct-count estimate of lineitem order keys —
    integer-deterministic estimator over a TakeOrdered min-k sketch."""
    from treemachine_spark.functions import sketches as sk

    return sk.kmv_estimate(load_tables(spark, sf_dir)["lineitem"], "l_orderkey", k=256)


def q_k2_hll_sketch(spark, sf_dir):
    """HyperLogLog register table (p=12) for lineitem order keys — the
    mergeable sketch itself, bit-identical cross-engine."""
    from treemachine_spark.functions import sketches as sk

    return sk.hll_sketch(load_tables(spark, sf_dir)["lineitem"], "l_orderkey", p=12)


def q_k5_cms_topk(spark, sf_dir):
    """Count-Min heavy hitters: top-10 event users by CM point estimate."""
    from treemachine_spark.functions import sketches as sk

    return sk.cms_topk(load_tables(spark, sf_dir)["events"], "user_id", k=10)


def q_k6_quantile_sketch(spark, sf_dir):
    """Bottom-k quantile sketch (128 smallest-hash distinct token counts
    with exact counts) over document token lengths — the mergeable
    replacement for x8's exact percentile() at corpus scale (exact
    percentiles shuffle every value; the sketch ships k integer rows)."""
    from treemachine_spark.functions import sketches as sk
    from treemachine_spark.functions import text

    docs = load_tables(spark, sf_dir)["documents"]
    d = docs.select(text.token_count(F.col("text")).alias("n"))
    return sk.quantile_sketch(d, "n", k=128)


def q_k8_grouped_hll(spark, sf_dir):
    """Per-event-type HLL register table for distinct users — the
    distinct-count member of the grouped-sketch family (k7 = quantiles,
    s9 = streaming fold). The GATE compares the integer register table
    (bit-identical cross-engine); the float estimate is library surface
    (grouped_hll_estimates, accuracy pinned in tests/test_sketches.py).
    One partial-agg shuffle bounded by groups x 2^p rows at any input
    size — the scale path for per-language/per-day distinct counts."""
    from treemachine_spark.functions import sketches as sk

    events = load_tables(spark, sf_dir)["events"]
    return sk.hll_sketch_grouped(events, "user_id", ["event_type"], p=12)


def q_k7_grouped_quantiles(spark, sf_dir):
    """Per-language sketch-estimated token-length p50/p90 — the
    quantile_sketch-backed variant of x8's exact percentile() shape
    (VERDICT r4 #6): per-group bottom-k sampling of the distinct-value
    table + distributed integer-exact estimates. k=64 forces real
    sampling at gate scale; exact when a group has <= k distinct values
    (accuracy bound pinned in tests/test_sketches.py)."""
    from treemachine_spark.functions import sketches as sk
    from treemachine_spark.functions import text

    docs = load_tables(spark, sf_dir)["documents"]
    d = docs.select("lang", text.token_count(F.col("text")).alias("n"))
    sketch = sk.quantile_sketch_grouped(d, "n", ["lang"], k=64)
    return sk.grouped_quantile_estimates(sketch, ["lang"], qs=(0.5, 0.9))


def q_k3_bloom_prune(spark, sf_dir):
    """Bloom-filter semi-join pruning: an 8192-bit / 3-hash filter built
    from a supplier subset prunes the lineitem scan BEFORE any join. The
    membership test is a pure codegen filter against a literal bit-string
    (operators/scale.py); returns (n_candidates, n_matched, n_false_pos)
    so the oracle pins both the no-false-negative law and the exact
    false-positive count."""
    from treemachine_spark.operators.scale import bloom_filter_build, bloom_prune

    t = load_tables(spark, sf_dir)
    dim = t["supplier"].where(F.col("s_acctbal") > 9000).select("s_suppkey")
    bits = bloom_filter_build(dim, "s_suppkey", m=8192, k=3)
    cand = bloom_prune(t["lineitem"], "l_suppkey", bits, k=3)
    n_cand = cand.agg(F.count("*").alias("n")).withColumnRenamed("n", "n_candidates")
    n_true = (
        t["lineitem"]
        .join(F.broadcast(dim), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .agg(F.count("*").alias("n_matched"))
    )
    return n_cand.crossJoin(n_true).select(
        F.col("n_candidates").cast("long"),
        F.col("n_matched").cast("long"),
        (F.col("n_candidates") - F.col("n_matched")).cast("long").alias("n_false_pos"),
    )


def q_k4_zorder(spark, sf_dir):
    """Morton z-values for the (l_partkey, l_suppkey) plane — the clustering
    key zorder_write lays files out by (operators/layout.py); pure shift/
    mask integer arithmetic, gated bit-identical cross-engine."""
    from treemachine_spark.operators.layout import zvalue

    li = load_tables(spark, sf_dir)["lineitem"]
    return (
        li.select("l_partkey", "l_suppkey")
        .distinct()
        .select(
            "l_partkey",
            "l_suppkey",
            zvalue(F.col("l_partkey"), F.col("l_suppkey")).alias("zval"),
        )
    )


def q_u1_merge_upsert(spark, sf_dir):
    """MERGE INTO semantics (operators/mutate.py): per-customer order spend
    upserts into the customer table — matched rows add spend to the
    balance, source-only keys (every 7th custkey remapped) insert synthetic
    customers, untouched rows carry over. One full-outer join on the key."""
    from treemachine_spark.operators.mutate import merge_upsert

    t = load_tables(spark, sf_dir)
    src = (
        t["orders"]
        .groupBy("o_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("spend"))
        .select(
            F.when(F.col("o_custkey") % 7 == 0, F.col("o_custkey") + 1000000)
            .otherwise(F.col("o_custkey"))
            .alias("c_custkey"),
            "spend",
        )
    )
    merged = merge_upsert(
        t["customer"],
        src,
        on="c_custkey",
        when_matched={"c_acctbal": F.col("t.c_acctbal") + F.col("s.spend")},
        when_not_matched={
            "c_name": F.concat(F.lit("NEW#"), F.col("s.c_custkey").cast("string")),
            "c_acctbal": F.col("s.spend"),
            "c_mktsegment": F.lit("UNKNOWN"),
        },
    )
    return merged.select(
        "c_custkey",
        "c_name",
        "c_mktsegment",
        F.round(F.col("c_acctbal"), 2).alias("acctbal"),
    )


PIPELINE_QUERIES = {
    "x1_text_profile": q_x1_text_profile,
    "x2_bpe_tokens": q_x2_bpe_tokens,
    "x4_lang_stats": q_x4_lang_stats,
    "x5_redaction": q_x5_redaction,
    "d1_exact_dedup": q_d1_exact_dedup,
    "d6_purge_list": q_d6_purge_list,
    "f1_funnel": q_f1_funnel,
    "d2_minhash_pairs": q_d2_minhash_pairs,
    "d3_simhash": q_d3_simhash,
    "d4_ngram_jaccard": q_d4_ngram_jaccard,
    "d7_jaccard_capped": q_d7_jaccard_capped,
    "d8_jaccard_probe": q_d8_jaccard_probe,
    "d9_capped_artifact": q_d9_capped_artifact,
    "x6_hash_split": q_x6_hash_split,
    "x7_chunking": q_x7_chunking,
    "x8_token_percentiles": q_x8_token_percentiles,
    "v5_centroid_cells": q_v5_centroid_cells,
    "m1_media_features": q_m1_media_features,
    "m2_media_probe": q_m2_media_probe,
    "d5_dup_clusters": q_d5_dup_clusters,
    "s3_streaming_windows": q_s3_streaming_windows,
    "s4_stream_enriched": q_s4_stream_enriched,
    "s7_sessionize_stream": q_s7_sessionize_stream,
    "s8_stream_novelty": q_s8_stream_novelty,
    "v1_ann_brute": q_v1_ann_brute,
    "v2_ann_lsh": q_v2_ann_lsh,
    "v3_ivf_topk": q_v3_ivf_topk,
    "v9_filtered_ann": q_v9_filtered_ann,
    "v4_cosine_pairs": q_v4_cosine_pairs,
    "v6_cosine_pairs_lsh": q_v6_cosine_pairs_lsh,
    "v7_semantic_dedup": q_v7_semantic_dedup,
    "s1_event_windows": q_s1_event_windows,
    "x9_decontaminate": q_x9_decontaminate,
    "x10_source_quota": q_x10_source_quota,
    "x11_repetition": q_x11_repetition,
    "x12_sequence_packing": q_x12_sequence_packing,
    "x13_pack_manifest": q_x13_pack_manifest,
    "s5_sliding_windows": q_s5_sliding_windows,
    "x14_mixture_sample": q_x14_mixture_sample,
    "k1_kmv_distinct": q_k1_kmv_distinct,
    "k2_hll_sketch": q_k2_hll_sketch,
    "k5_cms_topk": q_k5_cms_topk,
    "k6_quantile_sketch": q_k6_quantile_sketch,
    "k7_grouped_quantiles": q_k7_grouped_quantiles,
    "k8_grouped_hll": q_k8_grouped_hll,
    "s9_stream_quantiles": q_s9_stream_quantiles,
    "k9_stream_topk": q_k9_stream_topk,
    "k3_bloom_prune": q_k3_bloom_prune,
    "k4_zorder": q_k4_zorder,
    "u1_merge_upsert": q_u1_merge_upsert,
    "x15_tfidf": q_x15_tfidf,
    "x16_keyword_search": q_x16_keyword_search,
    "x17_dup_spans": q_x17_dup_spans,
    "x18_mixture_weights": q_x18_mixture_weights,
    "v8_hard_negatives": q_v8_hard_negatives,
    "x19_strip_spans": q_x19_strip_spans,
    "x20_lm_score": q_x20_lm_score,
    "x21_table_stats": q_x21_table_stats,
}
