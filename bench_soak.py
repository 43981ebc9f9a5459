"""Production-scale served soak (VERDICT r10 #5): ONE process serving the
full route surface CONCURRENTLY — the 2.42M-tip synthetic tree (the scale
the reference's HTTP cap rejects outright, opentree/tree_of_life.java:64
serves one synth tree per instance), the persisted dedup shingle artifact,
the persisted IVF-PQ ANN artifact, and the streaming-stats sketch routes —
under bench_http-style mixed load, INCLUDING a mid-soak republish: while
clients are in flight, new documents and vectors are appended to the
persisted artifacts (shingle_index_append / pq_append), fresh index
snapshots are loaded, and ServerCore.swap_indexes + swap_store land on the
live server. The soak must see 0 errors and the republish must be visible:
a probe of an appended doc/vector finds nothing before the swap and its
exact self (jaccard/cosine 1.0) after, while a pinned tree request answers
byte-identically across the store swap (same content, fresh snapshot —
and the generation bump means the post-swap answer cannot come from the
pre-swap cache).

Per-request latencies are bucketed by when the request STARTED relative to
the republish window (pre / during / post), so the cost of republishing
under load is visible rather than averaged away.

Run: python bench_soak.py [n_tips] [sf_dir] [n_clients] [reqs_per_client]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import random
import shutil
import sys
import tempfile
import threading
import time

from bench_http import _pctl, _post_json, build_synth_store

KINDS = (
    "mrca",
    "node_info",
    "subtree",
    "dedup_text",
    "dedup_member",
    "ann",
    "stats_quantiles",
    "stats_topk",
)


def _make_body_for(rng, tips, internals, sample_docs, sample_vecs):
    """One request-mix generator shared by the single-process and sharded
    soaks (r12 review: two verbatim copies would silently drift into
    measuring different mixes)."""

    def body_for(kind: str) -> tuple[str, dict]:
        if kind == "mrca":
            return "/v3/tree_of_life/mrca", {"node_ids": rng.sample(tips, 160)}
        if kind == "node_info":
            return "/v3/tree_of_life/node_info", {"node_id": rng.choice(tips)}
        if kind == "subtree":
            return "/v3/tree_of_life/subtree", {
                "node_id": rng.choice(internals), "height_limit": 2}
        if kind == "dedup_text":
            r = rng.choice(sample_docs)
            return "/v3/documents/duplicates", {"texts": [r["text"] or ""]}
        if kind == "dedup_member":
            r = rng.choice(sample_docs)
            return "/v3/documents/duplicates", {"doc_ids": [r["doc_id"]]}
        if kind == "ann":
            r = rng.choice(sample_vecs)
            return "/v3/similarity/topk", {
                "vector": list(r["embedding"]), "k": 10}
        if kind == "stats_quantiles":
            return "/v3/stats/quantiles", {
                "qs": [0.5, 0.9, rng.randrange(1, 100) / 100]}
        return "/v3/stats/topk", {"k": rng.randrange(5, 25)}

    return body_for


def _pins_pre(base, new_text, new_vec, max_vec_id) -> tuple[bool, bool]:
    """Pre-republish freshness pins: the to-be-appended doc/vector must be
    ABSENT from the served snapshots. Every probe checks its OWN HTTP
    status before indexing the body (r11 ADVICE — warmup covers the
    routes but not these exact bodies; the 'brute' variant is never
    warmed)."""
    st, blob = _post_json(base, "/v3/documents/duplicates", {"texts": [new_text]})
    pre_dedup = st == 200 and all(
        m["jaccard"] < 1.0 for m in blob["results"][0])
    st, blob = _post_json(base, "/v3/similarity/topk",
                          {"vector": new_vec, "k": 10, "method": "brute"})
    pre_ann = st == 200 and all(
        nb["neighbor_id"] != int(max_vec_id) + 1 for nb in blob["neighbors"])
    return pre_dedup, pre_ann


def _pins_post(base, new_text, new_vec, max_doc_id, max_vec_id) -> tuple[bool, bool]:
    """Post-republish pins: appended doc/vector found at exact similarity."""
    st, blob = _post_json(base, "/v3/documents/duplicates", {"texts": [new_text]})
    post_dedup = st == 200 and any(
        m["doc_id"] == max_doc_id + 1 and m["jaccard"] == 1.0
        for m in blob["results"][0])
    st, blob = _post_json(base, "/v3/similarity/topk",
                          {"vector": new_vec, "k": 1, "method": "brute"})
    post_ann = st == 200 and bool(blob["neighbors"]) and blob[
        "neighbors"][0]["neighbor_id"] == int(max_vec_id) + 1
    return post_dedup, post_ann


def main() -> None:  # noqa: PLR0915 (one linear bench script)
    n_tips = int(sys.argv[1]) if len(sys.argv) > 1 else 2_420_000
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else (
        "/tmp/sf10" if os.path.exists("/tmp/sf10/documents.parquet")
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    n_clients = int(sys.argv[3]) if len(sys.argv) > 3 else 24
    n_reqs = int(sys.argv[4]) if len(sys.argv) > 4 else 18

    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from treemachine_spark.api.ann import AnnIndex
    from treemachine_spark.api.dedup import DedupIndex
    from treemachine_spark.api.server import make_server
    from treemachine_spark.functions import pq
    from treemachine_spark.functions.dedup import (
        shingle_index_append,
        write_shingle_index,
    )
    from treemachine_spark.functions.text import token_count
    from treemachine_spark.io.tables import load_tables
    from treemachine_spark.session import get_spark
    from treemachine_spark.streaming.stats import (
        StreamingHLLSketch,
        StreamingQuantileSketch,
        StreamingTopKSketch,
    )

    spark = get_spark("bench-soak")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"n_tips": n_tips, "sf_dir": sf_dir,
                 "clients": n_clients, "reqs_per_client": n_reqs}
    root = tempfile.mkdtemp(prefix="bench_soak_")

    # ---- the tree store (and the second snapshot the mid-soak swap_store
    # republishes to — same content, fresh frames, built up front so the
    # soak's latency buckets measure serving + swap, not a second ingest)
    t0 = time.time()
    store, tips, n_edges, build_sec = build_synth_store(spark, n_tips)
    store2, _, _, build2_sec = build_synth_store(spark, n_tips)
    out["store_build_sec"], out["store2_build_sec"] = build_sec, build2_sec
    out["n_edges"] = n_edges

    # ---- served corpora: stage docs/embeddings as soak-local parquet so
    # the republish can APPEND rows to the same tables the snapshots load
    tabs = load_tables(spark, sf_dir)
    docs_path = os.path.join(root, "docs.parquet")
    emb_path = os.path.join(root, "emb.parquet")
    tabs["documents"].select("doc_id", "text").write.parquet(docs_path)
    # testdata embeddings are array<float>; the served table is staged as
    # array<double> (the operators' math type) so appended rows write the
    # identical parquet schema
    tabs["embeddings"].select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    ).write.parquet(emb_path)
    docs = spark.read.parquet(docs_path)
    max_doc_id = docs.agg(F.max("doc_id")).first()[0]
    emb = spark.read.parquet(emb_path)
    max_vec_id, dim = emb.select(
        F.max("vec_id"), F.size(F.first("embedding"))
    ).first()

    # persisted artifacts (the 100 TB serving shape: bucket-pruned shingle
    # reads, stored PQ codes/cells — boot is metadata + fingerprint checks)
    t1 = time.time()
    idx_dir = os.path.join(root, "shingle_idx")
    write_shingle_index(docs, idx_dir)
    out["dedup_artifact_write_sec"] = round(time.time() - t1, 1)
    t1 = time.time()
    pq_dir = os.path.join(root, "pq_idx")
    pq.write_pq_index(emb, pq_dir, m=8, n_codes=16, iters=3,
                      train_rows=10_000, n_centroids=64)
    out["pq_artifact_write_sec"] = round(time.time() - t1, 1)

    t1 = time.time()
    dedup_idx = DedupIndex.from_path(spark, docs_path, index_dir=idx_dir)
    ann_idx = AnnIndex.from_paths(spark, emb_path, pq_dir, n_centroids=64)
    out["index_boot_sec"] = round(time.time() - t1, 1)

    # ---- stats sketches (one running sketch per family over the corpus)
    t1 = time.time()
    qsk = StreamingQuantileSketch(os.path.join(root, "q"), "n", ["lang"], k=1024)
    qsk.process_batch(
        tabs["documents"].select("lang", token_count(F.col("text")).alias("n")), 0
    )
    dsk = StreamingHLLSketch(
        os.path.join(root, "d"), "user_id", ["event_type"], p=12
    )
    dsk.process_batch(tabs["events"].select("event_type", "user_id"), 0)
    tsk = StreamingTopKSketch(
        os.path.join(root, "t"), "hotkey", depth=4, width=2048, n_candidates=256
    )
    tsk.process_batch(
        tabs["events"].select(
            F.concat_ws("|", "event_type",
                        (F.col("user_id") % 40).cast("string")).alias("hotkey")
        ),
        0,
    )
    out["sketch_build_sec"] = round(time.time() - t1, 1)
    out["setup_sec"] = round(time.time() - t0, 1)

    srv = make_server(
        store, host="127.0.0.1", port=0,
        stats_sketch=qsk, distinct_sketch=dsk, topk_sketch=tsk,
        ann_index=ann_idx, dedup_index=dedup_idx,
    )
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"

    # ---- request pools (unique bodies per request -> cache-miss engine
    # load; texts/vectors sampled from the served corpus)
    sample_docs = docs.limit(400).collect()
    sample_vecs = emb.limit(64).collect()
    rng = random.Random(11)
    internals = [f"n{i}" for i in range(1, 200)]
    body_for = _make_body_for(rng, tips, internals, sample_docs, sample_vecs)

    # warm each route once and hard-fail on a non-200 (a broken route must
    # not print as a latency table)
    for kind in KINDS:
        path, body = body_for(kind)
        status, blob = _post_json(base, path, body)
        if status != 200:
            raise RuntimeError(f"route warmup {kind} -> HTTP {status}: {blob}")

    # ---- republish freshness pins (before): the to-be-appended doc and
    # vector must be ABSENT from the served snapshots
    new_text = "soak appended qqzzx document veryunique tokens " + " ".join(
        f"tok{i}qz" for i in range(30)
    )
    # scores are dot products, so give the appended vector a dominant norm:
    # its self-score |v|^2 then beats any corpus dot product and exact
    # top-1 self-retrieval is guaranteed once it is served
    new_vec = [float(x) * 20.0 for x in np.random.RandomState(99).randn(dim)]
    pin_pre_dedup, pin_pre_ann = _pins_pre(base, new_text, new_vec, max_vec_id)
    # pinned tree request: must answer byte-identically across swap_store
    pin_mrca_body = {"node_ids": rng.sample(tips, 160)}
    st_mrca_pre, pin_mrca_pre = _post_json(
        base, "/v3/tree_of_life/mrca", pin_mrca_body
    )

    # ---- the soak: n_clients threads of mixed traffic; a republish thread
    # appends + reloads + swaps mid-flight
    lock = threading.Lock()
    records: list[tuple[str, float, float, int]] = []  # kind, t_start, dt, status
    swap_window = {}

    def client(cid: int) -> None:
        crng = random.Random(1000 + cid)
        for i in range(n_reqs):
            kind = KINDS[(cid + i) % len(KINDS)]
            with lock:  # body_for shares one rng; requests stay unique
                path, body = body_for(kind)
            if kind == "mrca":  # re-draw from the client's own rng too
                body["node_ids"] = crng.sample(tips, 160)
            t = time.time()
            try:
                status, _ = _post_json(base, path, body)
            except Exception:
                # a transport-level failure (connection reset, socket
                # exhaustion) must count as an error and keep the record
                # stream moving — a silently dead thread would leave
                # soak_ok green on an incomplete soak and could starve
                # the republish trigger's record-count wait forever
                status = 599
            dt = time.time() - t
            with lock:
                records.append((kind, t, dt, status))

    total = n_clients * n_reqs

    def republish() -> None:
        # an exception here must surface as a failed soak, not die in the
        # thread and crash the report later with KeyError('append_sec')
        # on the empty swap_window (r11 ADVICE)
        try:
            _republish_body()
        except Exception as e:
            swap_window["error"] = f"{type(e).__name__}: {e}"
            now = time.time()
            swap_window.setdefault("start", now)
            swap_window.setdefault("end", now)

    def _republish_body() -> None:
        # wait until ~1/3 of the soak's requests have landed, then run the
        # full freshness flow while clients hammer the same SparkSession
        while True:
            with lock:
                if len(records) >= total // 3:
                    break
            time.sleep(0.25)
        t_start = time.time()
        new_docs = spark.createDataFrame(
            pd.DataFrame({"doc_id": [max_doc_id + 1], "text": [new_text]})
        ).select(
            F.col("doc_id").cast("long"), F.col("text")
        )
        new_docs.write.mode("append").parquet(docs_path)
        shingle_index_append(new_docs, idx_dir)
        new_emb = spark.createDataFrame(
            pd.DataFrame({"vec_id": [int(max_vec_id) + 1],
                          "embedding": [new_vec]})
        ).select(F.col("vec_id").cast("long"), F.col("embedding"))
        new_emb.write.mode("append").parquet(emb_path)
        pq.pq_append(new_emb, pq_dir)
        t_loaded = time.time()
        fresh_dedup = DedupIndex.from_path(spark, docs_path, index_dir=idx_dir)
        fresh_ann = AnnIndex.from_paths(spark, emb_path, pq_dir, n_centroids=64)
        srv.core.swap_indexes(ann_index=fresh_ann, dedup_index=fresh_dedup)
        srv.core.swap_store(store2)
        swap_window["start"] = t_start
        swap_window["end"] = time.time()
        swap_window["append_sec"] = round(t_loaded - t_start, 2)
        swap_window["reload_swap_sec"] = round(time.time() - t_loaded, 2)

    threads = [threading.Thread(target=client, args=(c,))
               for c in range(n_clients)]
    rep = threading.Thread(target=republish)
    t_soak = time.time()
    for t in threads:
        t.start()
    rep.start()
    for t in threads:
        t.join()
    rep.join()
    # a guaranteed post-republish round: under heavy contention the main
    # load can drain while the republish is still in flight, which would
    # leave the post bucket empty
    post_threads = [
        threading.Thread(target=client, args=(c + n_clients,))
        for c in range(max(4, n_clients // 3))
    ]
    for t in post_threads:
        t.start()
    for t in post_threads:
        t.join()
    out["soak_wall_sec"] = round(time.time() - t_soak, 1)
    if "error" in swap_window:
        out["republish"] = {"error": swap_window["error"]}
    else:
        out["republish"] = {
            "append_sec": swap_window["append_sec"],
            "reload_swap_sec": swap_window["reload_swap_sec"],
            "total_sec": round(swap_window["end"] - swap_window["start"], 2),
        }

    # ---- bucket latencies by request start vs the republish window
    buckets: dict[str, dict[str, list[float]]] = {
        "pre": {}, "during": {}, "post": {}}
    errors = 0
    for kind, t, dt, status in records:
        if status != 200:
            errors += 1
        phase = ("pre" if t < swap_window["start"]
                 else "during" if t < swap_window["end"] else "post")
        buckets[phase].setdefault(kind, []).append(dt)
    out["errors"] = errors
    out["n_requests"] = len(records)
    out["n_requests_expected"] = total + max(4, n_clients // 3) * n_reqs
    for phase, kinds in buckets.items():
        out[phase] = {
            k: {"n": len(v), "p50": _pctl(v, 0.5), "p95": _pctl(v, 0.95),
                "max": _pctl(v, 1.0)}
            for k, v in sorted(kinds.items())
        }

    # ---- republish freshness pins (after): appended doc/vector now found
    # at exact similarity; pinned tree request byte-identical across the
    # store swap (and, generation-bumped, provably not a stale cache hit)
    pin_post_dedup, pin_post_ann = _pins_post(
        base, new_text, new_vec, max_doc_id, max_vec_id)
    st_mrca_post, pin_mrca_post = _post_json(
        base, "/v3/tree_of_life/mrca", pin_mrca_body
    )
    out["pins"] = {
        "dedup_absent_pre": pin_pre_dedup,
        "dedup_found_post": pin_post_dedup,
        "ann_absent_pre": pin_pre_ann,
        "ann_found_post": pin_post_ann,
        "mrca_stable_across_swap": (
            st_mrca_pre == st_mrca_post == 200
            and pin_mrca_pre == pin_mrca_post
        ),
    }
    out["soak_ok"] = (
        errors == 0
        and out["n_requests"] == out["n_requests_expected"]
        and all(out["pins"].values())
        and "error" not in swap_window
    )

    srv.shutdown()
    srv.server_close()
    shutil.rmtree(root, ignore_errors=True)
    print(json.dumps({"metric": "served_soak", **out}))




# ---------------------------------------------------------------------------
# Sharded mode (VERDICT r11 #2): the same mixed-route soak protocol through
# api/router.ShardRouter with PER-FAMILY worker processes — each family
# (tree / dedup / ann / stats) owns its own SparkSession and scheduler, so
# heavy tree extractions stop queueing index lookups and stats folds behind
# them. The mid-soak republish lands THROUGH THE ROUTER: the parent appends
# to the shared persisted artifacts, then broadcasts /v3/admin/reload; each
# worker reloads its snapshots from disk and swaps (swap_store /
# swap_indexes), exactly the fleet freshness path.
#
# Run:    python bench_soak.py shards [n_tips] [sf_dir] [n_clients]
#                                     [reqs_per_client] [n_tree_workers]
# Drill:  python bench_soak.py drill  [same args] — worker-down
#         reload-retry drill (kill dedup worker post-append -> broadcast
#         502s with per-worker outcomes -> restore -> fresh-on-boot probe
#         -> retry broadcast all-200); see sharded_main docstring.
#         TREEMACHINE_N_DEDUP=2 makes it the REPLICA-failover drill: the
#         surviving replica must serve every dedup request through the
#         down window (zero client-visible errors excused)
# Worker: python bench_soak.py worker <family> <port> <root> <sf_dir> <n_tips>
# ---------------------------------------------------------------------------


def _stage_corpora(spark, root: str, sf_dir: str) -> dict:
    """Stage the served corpora + persisted artifacts into ``root`` (the
    single-process soak's setup, extracted so the sharded parent stages the
    SAME layout its workers boot from). Artifact params are the contract
    between stager and worker: PQ n_centroids=64 here must match the
    worker's AnnIndex.from_paths(n_centroids=64)."""
    from pyspark.sql import functions as F

    from treemachine_spark.functions import pq
    from treemachine_spark.functions.dedup import write_shingle_index
    from treemachine_spark.io.tables import load_tables

    tabs = load_tables(spark, sf_dir)
    docs_path = os.path.join(root, "docs.parquet")
    emb_path = os.path.join(root, "emb.parquet")
    tabs["documents"].select("doc_id", "text").write.parquet(docs_path)
    tabs["embeddings"].select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    ).write.parquet(emb_path)
    docs = spark.read.parquet(docs_path)
    emb = spark.read.parquet(emb_path)
    t1 = time.time()
    write_shingle_index(docs, os.path.join(root, "shingle_idx"))
    dedup_write = round(time.time() - t1, 1)
    t1 = time.time()
    pq.write_pq_index(emb, os.path.join(root, "pq_idx"), m=8, n_codes=16,
                      iters=3, train_rows=10_000, n_centroids=64)
    pq_write = round(time.time() - t1, 1)
    max_doc_id = docs.agg(F.max("doc_id")).first()[0]
    max_vec_id, dim = emb.select(
        F.max("vec_id"), F.size(F.first("embedding"))
    ).first()
    return {
        "docs_path": docs_path, "emb_path": emb_path,
        "idx_dir": os.path.join(root, "shingle_idx"),
        "pq_dir": os.path.join(root, "pq_idx"),
        "max_doc_id": max_doc_id, "max_vec_id": int(max_vec_id), "dim": dim,
        "sample_docs": docs.limit(400).collect(),
        "sample_vecs": emb.limit(64).collect(),
        "dedup_artifact_write_sec": dedup_write,
        "pq_artifact_write_sec": pq_write,
    }


def soak_worker_main(family: str, port: int, root: str, sf_dir: str,
                     n_tips: int) -> None:
    """One per-family serving shard with its own SparkSession. Every
    family configures a reload_fn, so a router broadcast of
    /v3/admin/reload republishes the whole fleet."""
    from pyspark.sql import functions as F

    from treemachine_spark.api.server import make_server
    from treemachine_spark.session import get_spark

    spark = get_spark(f"soak-worker-{family}-{port}")
    spark.sparkContext.setLogLevel("ERROR")
    srv_box: dict = {}
    state = {"generation": 1}

    if family == "tree":
        store, _tips, _n_edges, _ = build_synth_store(spark, n_tips)
        # the republish target snapshot, prebuilt so reload measures the
        # swap path, not a second ingest
        store2 = build_synth_store(spark, n_tips)[0]

        def reload_fn():
            state["generation"] += 1
            srv_box["srv"].core.swap_store(store2)
            return {"family": "tree", "generation": state["generation"]}

        srv = make_server(store, host="127.0.0.1", port=port,
                          reload_fn=reload_fn)
    else:
        # non-tree workers still serve the tree-route contract on a tiny
        # placeholder store (make_server requires one; about() doubles as
        # the readiness probe)
        tiny = build_synth_store(spark, 100)[0]
        if family == "dedup":
            from treemachine_spark.api.dedup import DedupIndex

            kw = dict(dedup_index=DedupIndex.from_path(
                spark, os.path.join(root, "docs.parquet"),
                index_dir=os.path.join(root, "shingle_idx")))

            def reload_fn():
                state["generation"] += 1
                fresh = DedupIndex.from_path(
                    spark, os.path.join(root, "docs.parquet"),
                    index_dir=os.path.join(root, "shingle_idx"))
                srv_box["srv"].core.swap_indexes(dedup_index=fresh)
                return {"family": "dedup", "generation": state["generation"]}

        elif family == "ann":
            from treemachine_spark.api.ann import AnnIndex

            kw = dict(ann_index=AnnIndex.from_paths(
                spark, os.path.join(root, "emb.parquet"),
                os.path.join(root, "pq_idx"), n_centroids=64))

            def reload_fn():
                state["generation"] += 1
                fresh = AnnIndex.from_paths(
                    spark, os.path.join(root, "emb.parquet"),
                    os.path.join(root, "pq_idx"), n_centroids=64)
                srv_box["srv"].core.swap_indexes(ann_index=fresh)
                return {"family": "ann", "generation": state["generation"]}

        else:  # stats
            from treemachine_spark.functions.text import token_count
            from treemachine_spark.io.tables import load_tables
            from treemachine_spark.streaming.stats import (
                StreamingHLLSketch,
                StreamingQuantileSketch,
                StreamingTopKSketch,
            )

            tabs = load_tables(spark, sf_dir)
            qsk = StreamingQuantileSketch(
                os.path.join(root, f"q{port}"), "n", ["lang"], k=1024)
            qsk.process_batch(tabs["documents"].select(
                "lang", token_count(F.col("text")).alias("n")), 0)
            dsk = StreamingHLLSketch(
                os.path.join(root, f"d{port}"), "user_id", ["event_type"],
                p=12)
            dsk.process_batch(
                tabs["events"].select("event_type", "user_id"), 0)
            tsk = StreamingTopKSketch(
                os.path.join(root, f"t{port}"), "hotkey", depth=4,
                width=2048, n_candidates=256)
            tsk.process_batch(tabs["events"].select(F.concat_ws(
                "|", "event_type",
                (F.col("user_id") % 40).cast("string")).alias("hotkey")), 0)
            kw = dict(stats_sketch=qsk, distinct_sketch=dsk, topk_sketch=tsk)

            def reload_fn():
                # streaming sketches advance in-process; the route answers
                # so a fleet broadcast is all-200 when nothing needs doing
                state["generation"] += 1
                return {"family": "stats", "generation": state["generation"]}

        srv = make_server(tiny, host="127.0.0.1", port=port,
                          reload_fn=reload_fn, **kw)
    srv_box["srv"] = srv
    print(f"WORKER_READY {family} {port}", flush=True)
    srv.serve_forever()


def sharded_main(drill: bool = False) -> None:  # noqa: PLR0915 (one linear bench script)
    """Sharded soak; ``drill=True`` runs the worker-down reload-retry
    drill (VERDICT r12 #3): mid-soak, AFTER the artifact append, the
    dedup worker (the family the republish changes) is killed along with
    its JVM — a process-crash simulation. The reload broadcast must then
    502 with per-worker outcomes (all-or-error is the design: a failover
    reload would leave a mixed-snapshot fleet silently); the worker is
    restored, probed DIRECTLY for the appended doc (a fresh boot reads
    the already-appended artifacts, so the restored worker has no stale
    window), and the broadcast retried to all-200. Dedup-route errors
    overlapping the down window are counted separately as expected —
    the family has no serving replica then, and a visible 502 beats a
    silently stale answer."""
    import subprocess

    from treemachine_spark.api.router import ShardRouter, make_router_server
    from treemachine_spark.session import get_spark

    n_tips = int(sys.argv[2]) if len(sys.argv) > 2 else 2_420_000
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else (
        "/tmp/sf10" if os.path.exists("/tmp/sf10/documents.parquet")
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    n_clients = int(sys.argv[4]) if len(sys.argv) > 4 else 24
    n_reqs = int(sys.argv[5]) if len(sys.argv) > 5 else 18
    n_tree = int(sys.argv[6]) if len(sys.argv) > 6 else 1

    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from treemachine_spark.functions import pq
    from treemachine_spark.functions.dedup import shingle_index_append
    from bench_http import _tip_names

    out: dict = {"mode": "sharded-drill" if drill else "sharded",
                 "n_tips": n_tips, "sf_dir": sf_dir,
                 "clients": n_clients, "reqs_per_client": n_reqs,
                 "tree_workers": n_tree}
    spark = get_spark("soak-shard-parent")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="bench_soak_shard_")

    t0 = time.time()
    staged = _stage_corpora(spark, root, sf_dir)
    out["dedup_artifact_write_sec"] = staged["dedup_artifact_write_sec"]
    out["pq_artifact_write_sec"] = staged["pq_artifact_write_sec"]
    out["stage_sec"] = round(time.time() - t0, 1)

    # core split: tree workers take what the index/stats families leave.
    # TREEMACHINE_AUX_CORES overrides the per-aux-family count — the knob
    # the r12 soak exposed (the 4-core dedup worker's p50 rose 5.2->21.2 s
    # when a faster soak packed its requests more densely); the sizing
    # matrix (NOTES_r13) measures the tradeoff so a deployment can pick.
    # TREEMACHINE_N_DEDUP runs the dedup family with N REPLICAS of the
    # same shard (identical snapshot from the shared artifacts) — with
    # >=2, the forward-path failover makes a replica death invisible to
    # clients (the r13 replica drill), while the reload broadcast stays
    # all-or-error until the fleet is whole.
    total_cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    aux_cores = int(os.environ.get(
        "TREEMACHINE_AUX_CORES", max(2, total_cores // 8)))  # ann/dedup/stats each
    n_dedup = int(os.environ.get("TREEMACHINE_N_DEDUP", "1"))
    tree_cores = max(
        2, (total_cores - (2 + n_dedup) * aux_cores) // n_tree)
    families = (
        [("tree", tree_cores)] * n_tree
        + [("dedup", aux_cores)] * n_dedup
        + [("ann", aux_cores), ("stats", aux_cores)]
    )
    ports = [19200 + i for i in range(len(families))]
    out["worker_layout"] = {
        f"{fam}:{port}": cores
        for (fam, cores), port in zip(families, ports)
    }

    t0 = time.time()
    procs, logs, spawn_specs, log_fhs = [], [], [], []
    for (fam, cores), port in zip(families, ports):
        env = {**os.environ, "SPARK_GRAFT_CPUS": str(cores),
               "SPARK_DRIVER_MEM": os.environ.get("SPARK_DRIVER_MEM", "12g")}
        # worker output goes to a log file, not DEVNULL: a worker that
        # dies on boot (port bind, import error) must fail the bench
        # immediately WITH its traceback, not leave the readiness loop
        # polling a corpse for 30 minutes (r12 review)
        log_path = os.path.join(root, f"worker_{fam}_{port}.log")
        logs.append((fam, port, log_path))
        cmd = [sys.executable, __file__, "worker", fam, str(port), root,
               sf_dir, str(n_tips)]
        spawn_specs.append((cmd, env))  # drill respawns from the same spec
        log_fh = open(log_path, "w")
        log_fhs.append(log_fh)  # closed in the finally block (ADVICE r13)
        procs.append(subprocess.Popen(
            cmd, env=env, stdout=log_fh, stderr=subprocess.STDOUT))
    urls = {port: f"http://127.0.0.1:{port}" for port in ports}
    try:
        deadline = time.time() + 1800
        ready: set = set()
        while len(ready) < len(ports):
            if time.time() > deadline:
                raise TimeoutError(f"workers ready: {sorted(ready)}")
            for p, (fam, port, log_path) in zip(procs, logs):
                if port in ready:
                    continue
                rc = p.poll()
                if rc is not None:
                    with open(log_path, errors="replace") as fh:
                        tail = fh.read()[-2000:]
                    raise RuntimeError(
                        f"worker {fam}:{port} exited rc={rc} before ready; "
                        f"log tail:\n{tail}"
                    )
                try:
                    status, _ = _post_json(
                        urls[port], "/v3/tree_of_life/about", {})
                    if status == 200:
                        ready.add(port)
                except Exception:
                    pass
            time.sleep(2)
        out["workers_ready_sec"] = round(time.time() - t0, 1)

        tree_urls = [urls[p] for (fam, _), p in zip(families, ports)
                     if fam == "tree"]
        one = {fam: urls[p] for (fam, _), p in zip(families, ports)}
        # all dedup workers serve the SAME shard from the same artifacts —
        # one shard, n_dedup replicas (forward-path failover between them)
        dedup_urls = [urls[p] for (fam, _), p in zip(families, ports)
                      if fam == "dedup"]
        router = ShardRouter(
            {"synth": tree_urls}, tree_urls,
            ann_shards=[[one["ann"]]],
            dedup_shards=[dedup_urls],
            stats_shards=[[one["stats"]]],
        )
        rsrv = make_router_server(router)
        threading.Thread(target=rsrv.serve_forever, daemon=True).start()
        base = f"http://127.0.0.1:{rsrv.server_address[1]}"

        # ---- identical request mix to the single-process soak
        tips = _tip_names(n_tips)
        sample_docs = staged["sample_docs"]
        sample_vecs = staged["sample_vecs"]
        max_doc_id, max_vec_id = staged["max_doc_id"], staged["max_vec_id"]
        dim = staged["dim"]
        rng = random.Random(11)
        internals = [f"n{i}" for i in range(1, 200)]
        body_for = _make_body_for(
            rng, tips, internals, sample_docs, sample_vecs)

        for kind in KINDS:
            path, body = body_for(kind)
            status, blob = _post_json(base, path, body)
            if status != 200:
                raise RuntimeError(
                    f"route warmup {kind} -> HTTP {status}: {blob}")

        # ---- freshness pins (before), same status-checked contract as the
        # single-process soak
        new_text = ("soak appended qqzzx document veryunique tokens "
                    + " ".join(f"tok{i}qz" for i in range(30)))
        new_vec = [float(x) * 20.0
                   for x in np.random.RandomState(99).randn(dim)]
        pin_pre_dedup, pin_pre_ann = _pins_pre(
            base, new_text, new_vec, max_vec_id)
        pin_mrca_body = {"node_ids": rng.sample(tips, 160)}
        st_mrca_pre, pin_mrca_pre = _post_json(
            base, "/v3/tree_of_life/mrca", pin_mrca_body)

        # ---- soak through the router
        lock = threading.Lock()
        records: list[tuple[str, float, float, int]] = []
        swap_window: dict = {}

        def client(cid: int) -> None:
            crng = random.Random(1000 + cid)
            for i in range(n_reqs):
                kind = KINDS[(cid + i) % len(KINDS)]
                with lock:
                    path, body = body_for(kind)
                if kind == "mrca":
                    body["node_ids"] = crng.sample(tips, 160)
                t = time.time()
                try:
                    status, _ = _post_json(base, path, body)
                except Exception:
                    status = 599
                dt = time.time() - t
                with lock:
                    records.append((kind, t, dt, status))

        total = n_clients * n_reqs

        drill_rec: dict = {}

        def republish() -> None:
            try:
                _republish_body()
            except Exception as e:
                swap_window["error"] = f"{type(e).__name__}: {e}"
                now = time.time()
                swap_window.setdefault("start", now)
                swap_window.setdefault("end", now)

        def _kill_worker_and_jvm(idx: int) -> None:
            """SIGKILL the worker python process AND its JVM child — a
            real worker crash takes both down (same box); an orphaned JVM
            would also keep serving nothing while holding 12g+cores."""
            victim = procs[idx]
            kids = subprocess.run(
                ["pgrep", "-P", str(victim.pid)],
                capture_output=True, text=True,
            ).stdout.split()
            victim.kill()
            victim.wait()
            for pid in kids:
                try:
                    os.kill(int(pid), 9)
                except (OSError, ValueError):
                    pass

        def _drill_down_retry() -> None:
            """Kill the FIRST dedup worker -> broadcast must 502 with
            per-worker outcomes -> restore -> restored worker fresh on
            boot -> retry broadcast all-200. With TREEMACHINE_N_DEDUP>=2
            the surviving replica keeps serving dedup routes through the
            down window (forward-path failover — zero client-visible
            errors), while the broadcast still refuses to call the fleet
            fresh until every worker answers."""
            dedup_idx = next(
                i for i, (fam, _) in enumerate(families) if fam == "dedup")
            dedup_url = urls[ports[dedup_idx]]
            drill_rec["killed_worker"] = dedup_url
            drill_rec["dedup_replicas"] = n_dedup
            # stamp BEFORE the kill: a request in flight on the victim at
            # SIGKILL ends milliseconds before a post-kill stamp and would
            # escape the excusal window (t + dt >= kill_time), flaking the
            # gate as a real error (r13 review)
            swap_window["kill_time"] = time.time()
            _kill_worker_and_jvm(dedup_idx)
            status, blob = _post_json(base, "/v3/admin/reload", {})
            drill_rec["broadcast_down_status"] = status
            outcomes = {u: w.get("status")
                        for u, w in blob.get("workers", {}).items()}
            drill_rec["broadcast_down_outcomes"] = outcomes
            if status != 502:
                raise RuntimeError(
                    f"expected 502 broadcast with a down worker, got "
                    f"{status}: {blob}")
            if outcomes.get(dedup_url) == 200 or any(
                st != 200 for u, st in outcomes.items() if u != dedup_url
            ):
                raise RuntimeError(f"per-worker outcomes wrong: {outcomes}")
            if n_dedup >= 2:
                # deterministic failover evidence: with the replica still
                # DOWN, a dedup request through the router must succeed
                # via the surviving replica (wrap-around failover in
                # _fan_out) — and since that replica answered the failed
                # broadcast 200, it already serves the APPENDED snapshot
                st, blob = _post_json(
                    base, "/v3/documents/duplicates", {"texts": [new_text]})
                drill_rec["failover_probe_status"] = st
                drill_rec["failover_probe_fresh"] = st == 200 and any(
                    m["doc_id"] == max_doc_id + 1 and m["jaccard"] == 1.0
                    for m in blob["results"][0])
                if st != 200:
                    raise RuntimeError(
                        f"failover probe with a dead replica -> {st}: "
                        f"{blob}")
            # live workers DID reload (all-or-error reports, it does not
            # roll back) — only the down family is behind, and it serves
            # nothing (visible 502s), never a stale answer
            cmd, env = spawn_specs[dedup_idx]
            restart_log = os.path.join(root, "worker_dedup_restarted.log")
            fh = open(restart_log, "w")
            log_fhs.append(fh)  # closed in the finally block (ADVICE r13)
            procs[dedup_idx] = subprocess.Popen(
                cmd, env=env, stdout=fh, stderr=subprocess.STDOUT)
            wurl = urls[ports[dedup_idx]]
            deadline = time.time() + 1800
            while True:
                if procs[dedup_idx].poll() is not None:
                    with open(restart_log, errors="replace") as lf:
                        tail = lf.read()[-2000:]
                    raise RuntimeError(
                        f"restarted dedup worker died; log tail:\n{tail}")
                if time.time() > deadline:
                    raise TimeoutError("restarted dedup worker never ready")
                try:
                    st, _ = _post_json(wurl, "/v3/tree_of_life/about", {})
                    if st == 200:
                        break
                except Exception:
                    pass
                time.sleep(2)
            swap_window["restore_time"] = time.time()
            drill_rec["down_window_sec"] = round(
                swap_window["restore_time"] - swap_window["kill_time"], 1)
            # no stale window on the restored worker: its boot loaded the
            # ALREADY-APPENDED artifacts, so the appended doc is visible
            # direct-to-worker even before the retry broadcast
            st, blob = _post_json(
                wurl, "/v3/documents/duplicates", {"texts": [new_text]})
            drill_rec["restored_worker_fresh"] = st == 200 and any(
                m["doc_id"] == max_doc_id + 1 and m["jaccard"] == 1.0
                for m in blob["results"][0])
            status, blob = _post_json(base, "/v3/admin/reload", {})
            if status != 200:
                raise RuntimeError(
                    f"retry broadcast -> {status}: {blob}")
            drill_rec["retry_broadcast_ok"] = True
            swap_window["reload_workers"] = {
                u: w.get("family") for u, w in blob["workers"].items()}

        def _republish_body() -> None:
            while True:
                with lock:
                    if len(records) >= total // 3:
                        break
                time.sleep(0.25)
            t_start = time.time()
            new_docs = spark.createDataFrame(
                pd.DataFrame({"doc_id": [max_doc_id + 1],
                              "text": [new_text]})
            ).select(F.col("doc_id").cast("long"), F.col("text"))
            new_docs.write.mode("append").parquet(staged["docs_path"])
            shingle_index_append(new_docs, staged["idx_dir"])
            new_emb = spark.createDataFrame(
                pd.DataFrame({"vec_id": [max_vec_id + 1],
                              "embedding": [new_vec]})
            ).select(F.col("vec_id").cast("long"), F.col("embedding"))
            new_emb.write.mode("append").parquet(staged["emb_path"])
            pq.pq_append(new_emb, staged["pq_dir"])
            t_loaded = time.time()
            if drill:
                _drill_down_retry()
            else:
                # the fleet freshness path: ONE router broadcast; every
                # worker reloads from the shared artifacts and swaps
                status, blob = _post_json(base, "/v3/admin/reload", {})
                if status != 200:
                    raise RuntimeError(
                        f"reload broadcast -> {status}: {blob}")
                swap_window["reload_workers"] = {
                    u: w.get("family") for u, w in blob["workers"].items()}
            swap_window["start"] = t_start
            swap_window["end"] = time.time()
            swap_window["append_sec"] = round(t_loaded - t_start, 2)
            swap_window["reload_swap_sec"] = round(time.time() - t_loaded, 2)

        threads = [threading.Thread(target=client, args=(c,))
                   for c in range(n_clients)]
        rep = threading.Thread(target=republish)
        t_soak = time.time()
        for t in threads:
            t.start()
        rep.start()
        for t in threads:
            t.join()
        rep.join()
        post_threads = [
            threading.Thread(target=client, args=(c + n_clients,))
            for c in range(max(4, n_clients // 3))
        ]
        for t in post_threads:
            t.start()
        for t in post_threads:
            t.join()
        out["soak_wall_sec"] = round(time.time() - t_soak, 1)
        if "error" in swap_window:
            out["republish"] = {"error": swap_window["error"]}
        else:
            out["republish"] = {
                "append_sec": swap_window["append_sec"],
                "reload_swap_sec": swap_window["reload_swap_sec"],
                "total_sec": round(
                    swap_window["end"] - swap_window["start"], 2),
                "reload_workers": swap_window["reload_workers"],
            }

        buckets: dict[str, dict[str, list[float]]] = {
            "pre": {}, "during": {}, "post": {}}
        errors = 0
        expected_down = 0
        served_during_down = 0
        kt = swap_window.get("kill_time")
        rt = swap_window.get("restore_time")
        for kind, t, dt, status in records:
            if (drill and status == 200
                    and kind in ("dedup_text", "dedup_member")
                    and kt is not None and rt is not None
                    and t <= rt and t + dt >= kt):
                served_during_down += 1  # the failover evidence
            if status != 200:
                # single-replica drill: a dedup-route request overlapping
                # the down window is EXPECTED to fail — the family has no
                # serving replica (visible 502, never a stale answer).
                # Only the statuses the dead-worker path can actually
                # produce are excused (ADVICE r13): 502 (router saw the
                # refusal) and 599 (the client's own connection error) —
                # an unrelated 500 during the window is a REAL error.
                # With >=2 replicas NOTHING is excused: failover must make
                # the death invisible, so any dedup error is a real error.
                if (drill and n_dedup == 1
                        and status in (502, 599)
                        and kind in ("dedup_text", "dedup_member")
                        and kt is not None and rt is not None
                        and t <= rt and t + dt >= kt):
                    expected_down += 1
                else:
                    errors += 1
            phase = ("pre" if t < swap_window["start"]
                     else "during" if t < swap_window["end"] else "post")
            buckets[phase].setdefault(kind, []).append(dt)
        out["errors"] = errors
        if drill:
            drill_rec["dedup_served_during_down"] = served_during_down
            out["drill"] = drill_rec
            out["expected_down_errors"] = expected_down
        out["n_requests"] = len(records)
        out["n_requests_expected"] = (
            total + max(4, n_clients // 3) * n_reqs)
        for phase, kinds in buckets.items():
            out[phase] = {
                k: {"n": len(v), "p50": _pctl(v, 0.5),
                    "p95": _pctl(v, 0.95), "max": _pctl(v, 1.0)}
                for k, v in sorted(kinds.items())
            }

        # ---- freshness pins (after), through the router
        pin_post_dedup, pin_post_ann = _pins_post(
            base, new_text, new_vec, max_doc_id, max_vec_id)
        st_mrca_post, pin_mrca_post = _post_json(
            base, "/v3/tree_of_life/mrca", pin_mrca_body)
        out["pins"] = {
            "dedup_absent_pre": pin_pre_dedup,
            "dedup_found_post": pin_post_dedup,
            "ann_absent_pre": pin_pre_ann,
            "ann_found_post": pin_post_ann,
            "mrca_stable_across_swap": (
                st_mrca_pre == st_mrca_post == 200
                and pin_mrca_pre == pin_mrca_post),
        }
        out["soak_ok"] = (
            errors == 0
            and out["n_requests"] == out["n_requests_expected"]
            and all(out["pins"].values())
            and "error" not in swap_window
            and (not drill or (
                drill_rec.get("broadcast_down_status") == 502
                and drill_rec.get("restored_worker_fresh") is True
                and drill_rec.get("retry_broadcast_ok") is True
                and (n_dedup == 1
                     or drill_rec.get("failover_probe_fresh") is True)
            ))
        )
        rsrv.shutdown()
        rsrv.server_close()
        print(json.dumps({
            "metric": "served_soak_drill" if drill else "served_soak_sharded",
            **out}))
    finally:
        for p in procs:
            p.terminate()
        for p in procs:
            try:
                p.wait(timeout=30)
            except Exception:
                p.kill()
        for fh in log_fhs:
            try:
                fh.close()
            except Exception:
                pass
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        soak_worker_main(sys.argv[2], int(sys.argv[3]), sys.argv[4],
                         sys.argv[5], int(sys.argv[6]))
    elif len(sys.argv) > 1 and sys.argv[1] == "shards":
        sharded_main()
    elif len(sys.argv) > 1 and sys.argv[1] == "drill":
        sharded_main(drill=True)
    else:
        main()
