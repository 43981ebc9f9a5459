"""Dedup serving bench: POST /v3/documents/duplicates under the real HTTP
facade — the dedup twin of bench_ann.py (r8 verdict #2: DedupIndex needed
the ivf_cells index-artifact split, and a bench to prove it pays).

Serves the documents corpus (default /tmp/sf10, 100k docs — falls back to
$SPARK_GRAFT_SF_DIR's) through api/server.py with a DedupIndex, then
measures request latency:

- texts rows: every request a distinct query text (cache useless) — each
  request is ONE broadcast of the query shingles against the CACHED
  inverted shingle index (functions/dedup.shingle_index, built once at
  construction), stop-set-pruned to the query shingles' rows (the prune,
  not the cache, is most of the win at 500k docs: un-pruned join+agg
  streamed all 26.5M index rows at ~2.1 s/request); noindex_texts runs
  the same (pruned) operator with index=None, re-shingling the corpus
  per call — the artifact's margin is the Arrow pass, and it grows with
  document length/corpus size;
- doc_ids rows: the corpus-member probe form (gate d8's operator) over the
  same cached index;
- cached row: one repeated body — snapshot-cache replay (no Spark job);
- disk rows: the PERSISTED bucket layout (write_shingle_index) — boot is
  a metadata read (~1 s vs ~11 s building the cached index) and requests
  bucket-prune partition directories at the parquet scan, no executor
  memory held; answers equality-checked against the cached server;
- sharded rows: two half-corpus DedupIndex shards behind the router —
  texts fan-out, plus the r9 doc_ids TEXT-INDIRECTION path (resolve text
  from the owning shard, re-issue as a texts lookup), equality-checked
  against the unsharded answer.

Prints one JSON line. Run: python bench_dedup.py [sf_dir] [n_requests]
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

from bench_http import _pctl, _post, _post_json


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else (
        "/tmp/sf10" if os.path.exists("/tmp/sf10/documents.parquet")
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    n_req = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    from pyspark.sql import functions as F

    from treemachine_spark.api.dedup import DedupIndex
    from treemachine_spark.api.router import ShardRouter, make_router_server
    from treemachine_spark.api.server import make_server
    from treemachine_spark.functions.dedup import ngram_jaccard_lookup
    from treemachine_spark.session import get_spark

    spark = get_spark("bench-dedup")
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).cache()
    n_docs = docs.count()
    idx = DedupIndex(docs)  # materializes the shingle index (boot cost)
    build_s = round(time.time() - t0, 1)

    from bench_http import build_synth_store

    store, _, _, _ = build_synth_store(spark, 100)
    srv = make_server(store, host="127.0.0.1", port=0, dedup_index=idx)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"

    sample = docs.limit(n_req).collect()
    qtexts = [r["text"] for r in sample]
    qids = [r["doc_id"] for r in sample]
    out: dict[str, dict] = {}

    def timed(fn, reqs):
        lats, errs = [], 0
        for req in reqs:
            t = time.time()
            ok = fn(req)
            lats.append(time.time() - t)
            errs += not ok
        return {
            "p50": _pctl(lats, 0.5),
            "p95": _pctl(lats, 0.95),
            "max": _pctl(lats, 1.0),
            "errors": errs,
        }

    try:
        out["texts"] = timed(
            lambda t: _post(
                base, "/v3/documents/duplicates", {"texts": [t]}
            )[0] == 200,
            qtexts,
        )
        out["doc_ids"] = timed(
            lambda i: _post(
                base, "/v3/documents/duplicates", {"doc_ids": [i]}
            )[0] == 200,
            qids,
        )

        # cached replay: identical body, served from the snapshot cache
        body = {"texts": [qtexts[0]]}
        _post(base, "/v3/documents/duplicates", body)  # prime
        lats = []
        for _ in range(50):
            t = time.time()
            _post(base, "/v3/documents/duplicates", body)
            lats.append(time.time() - t)
        out["cached"] = {"p50": _pctl(lats, 0.5), "p95": _pctl(lats, 0.95)}

        # the artifact's counterfactual: same operator, index=None — the
        # corpus-wide Arrow shingling pass runs INSIDE every request
        lats = []
        for t_ in qtexts[: max(4, n_req // 4)]:
            t = time.time()
            ngram_jaccard_lookup(docs, [t_]).collect()
            lats.append(time.time() - t)
        out["noindex_texts"] = {
            "p50": _pctl(lats, 0.5),
            "p95": _pctl(lats, 0.95),
        }

        # concurrent mixed load: the threaded handler runs texts lookups
        # and doc_ids probes from many request threads at once (FIFO
        # scheduler) — the thread-safety row, mirroring bench_ann's
        n_clients, per_client = 12, 4
        lats, errs = [], [0]
        lock = threading.Lock()

        def client(cid: int):
            for j in range(per_client):
                if (cid + j) % 2 == 0:
                    body = {"texts": [qtexts[(cid * per_client + j) % len(qtexts)]]}
                else:
                    body = {"doc_ids": [qids[(cid * per_client + j) % len(qids)]]}
                t = time.time()
                status, _ = _post(base, "/v3/documents/duplicates", body)
                with lock:
                    lats.append(time.time() - t)
                    errs[0] += status != 200

        threads = [
            threading.Thread(target=client, args=(c,)) for c in range(n_clients)
        ]
        t0c = time.time()
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        out["concurrent"] = {
            "clients": n_clients,
            "requests": n_clients * per_client,
            "p50": _pctl(lats, 0.5),
            "p95": _pctl(lats, 0.95),
            "wall": round(time.time() - t0c, 3),
            "errors": errs[0],
        }

        # persisted bucket-layout artifact (write_shingle_index): cold
        # boot is a metadata read; requests prune partition DIRECTORIES
        # by the query shingles' buckets — no executor-cached index at
        # all (the 100 TB shape)
        import tempfile

        from treemachine_spark.functions.dedup import write_shingle_index

        idx_dir = tempfile.mkdtemp(prefix="dedup_idx_")
        t0 = time.time()
        write_shingle_index(docs, idx_dir)
        out["disk_index_write_sec"] = {"sec": round(time.time() - t0, 1)}
        t0 = time.time()
        disk_idx = DedupIndex(docs, index_dir=idx_dir)
        boot = round(time.time() - t0, 3)
        dsrv = make_server(
            store, host="127.0.0.1", port=0, dedup_index=disk_idx
        )
        threading.Thread(target=dsrv.serve_forever, daemon=True).start()
        dbase = f"http://127.0.0.1:{dsrv.server_address[1]}"
        try:
            out["disk_texts"] = timed(
                lambda t: _post(
                    dbase, "/v3/documents/duplicates", {"texts": [t]}
                )[0] == 200,
                qtexts,
            )
            out["disk_texts"]["boot_sec"] = boot
            # disk-served answers must equal the cached-index server's
            mism = 0
            for t_ in qtexts[:4]:
                _, a = _post_json(
                    dbase, "/v3/documents/duplicates", {"texts": [t_]}
                )
                _, b = _post_json(
                    base, "/v3/documents/duplicates", {"texts": [t_]}
                )
                mism += a["results"] != b["results"]
            out["disk_texts"]["mismatches_vs_cached"] = mism
        finally:
            dsrv.shutdown()
            dsrv.server_close()

        # capped-space artifact (r10): shingles above max_doc_freq are
        # never WRITTEN — a boilerplate posting list is absent from disk,
        # so even a bucket-pruned request cannot stream it; query-side
        # sizes come from the artifact's stoplist (index-derived capped
        # |A|). Answers are capped-space jaccards (a different, documented
        # semantics), so the check is route == library operator over the
        # SAME artifact, not equality with the uncapped server.
        from treemachine_spark.functions.dedup import read_shingle_index

        # cap = p99 of the corpus's shingle document frequency — derived
        # from the corpus so the stoplist is non-vacuous on any input
        # (a fixed literal was vacuous on the ~100-replica derived set,
        # whose hottest shingles sit near df=100); one agg over the
        # already-cached in-memory index
        cap = max(
            2,
            int(
                idx.index.groupBy("s")
                .agg(F.count("*").alias("df"))
                .approxQuantile("df", [0.99], 0.001)[0]
            ),
        )
        cap_dir = tempfile.mkdtemp(prefix="dedup_capidx_")
        t0 = time.time()
        cap_rows = write_shingle_index(docs, cap_dir, max_doc_freq=cap)
        cap_meta = {
            "sec": round(time.time() - t0, 1),
            "max_doc_freq": cap,
            "rows": cap_rows,
        }
        _, _cm, cstop = read_shingle_index(spark, cap_dir)
        cap_meta["stoplist_rows"] = cstop.count()
        out["capped_index_write"] = cap_meta
        t0 = time.time()
        cap_idx = DedupIndex(docs, index_dir=cap_dir)
        cboot = round(time.time() - t0, 3)
        csrv = make_server(
            store, host="127.0.0.1", port=0, dedup_index=cap_idx
        )
        threading.Thread(target=csrv.serve_forever, daemon=True).start()
        cbase = f"http://127.0.0.1:{csrv.server_address[1]}"
        try:
            out["capped_texts"] = timed(
                lambda t: _post(
                    cbase, "/v3/documents/duplicates", {"texts": [t]}
                )[0] == 200,
                qtexts,
            )
            out["capped_texts"]["boot_sec"] = cboot
            mism = 0
            for t_ in qtexts[:4]:
                _, a = _post_json(
                    cbase, "/v3/documents/duplicates", {"texts": [t_]}
                )
                lib = {
                    (r["doc_id"], float(r["jaccard"]))
                    for r in ngram_jaccard_lookup(
                        docs, [t_], threshold=0.3,
                        index=cap_idx.index,
                        index_n_buckets=cap_idx.n_buckets,
                        index_max_doc_freq=cap_idx.max_doc_freq,
                        index_stoplist=cap_idx.stoplist,
                    ).collect()
                }
                got = {
                    (d["doc_id"], d["jaccard"]) for d in a["results"][0]
                }
                mism += got != lib
            out["capped_texts"]["mismatches_vs_library"] = mism
        finally:
            csrv.shutdown()
            csrv.server_close()

        # sharded scatter-gather: two half-corpus shards behind the router
        shard_srvs, shard_urls = [], []
        for half in (
            docs.where(F.col("doc_id") % 2 == 0),
            docs.where(F.col("doc_id") % 2 == 1),
        ):
            s = make_server(
                store, host="127.0.0.1", port=0,
                dedup_index=DedupIndex(half.cache()),
            )
            threading.Thread(target=s.serve_forever, daemon=True).start()
            shard_srvs.append(s)
            shard_urls.append(f"http://127.0.0.1:{s.server_address[1]}")
        rsrv = make_router_server(
            ShardRouter(
                pools={"t": shard_urls[:1]}, default_pool=shard_urls[:1],
                dedup_shards=[[u] for u in shard_urls],
            )
        )
        threading.Thread(target=rsrv.serve_forever, daemon=True).start()
        rbase = f"http://127.0.0.1:{rsrv.server_address[1]}"
        try:
            out["sharded_texts"] = timed(
                lambda t: _post(
                    rbase, "/v3/documents/duplicates", {"texts": [t]}
                )[0] == 200,
                qtexts,
            )
            out["sharded_texts"]["shards"] = 2
            # doc_ids text indirection (one resolve fan-out + one lookup
            # fan-out per request); the unsharded comparison runs OUTSIDE
            # the timed window — the answers must match the probe's
            lats, mism = [], 0
            for i in qids:
                t = time.time()
                st, sh = _post_json(
                    rbase, "/v3/documents/duplicates", {"doc_ids": [i]}
                )
                lats.append(time.time() - t)
                st2, un = _post_json(
                    base, "/v3/documents/duplicates", {"doc_ids": [i]}
                )
                mism += not (
                    st == st2 == 200 and sh["results"] == un["results"]
                )
            out["sharded_doc_ids"] = {
                "shards": 2,
                "p50": _pctl(lats, 0.5),
                "p95": _pctl(lats, 0.95),
                "mismatches_vs_unsharded": mism,
            }
        finally:
            rsrv.shutdown()
            rsrv.server_close()
            for s in shard_srvs:
                s.shutdown()
                s.server_close()
    finally:
        srv.shutdown()
        srv.server_close()
    print(json.dumps({
        "metric": "dedup_duplicates_latency",
        "unit": "sec",
        "sf_dir": sf_dir,
        "n_docs": n_docs,
        "n_requests": n_req,
        "index_build_sec": build_s,
        "phases": out,
    }))


if __name__ == "__main__":
    main()
