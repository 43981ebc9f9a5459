"""Sharded-stats serving bench: the r10 state-merge scatter under the real
HTTP facade (api/router.scatter_stats over api/server's /v3/stats/state).

Two workers each maintain running sketches (per-lang token-count quantiles
+ per-event-type distinct users + hot-key Count-Min heavy hitters) over a
DISJOINT half of the corpus; a third serves the union stream as the
correctness twin. The router fans ONE state request per shard and merges
raw sketch state with the exact merge laws (bottom-k / register-max /
cell-sum) in pure Python. What this measures:

- equality: scattered quantiles AND heavy hitters == the union worker's,
  bit-for-bit, and distinct estimates to the last ulp — the merge-law
  exactness pin at bench scale (the socket tests pin it at sf0.001);
- cold: the first scattered request — every shard runs its one Spark fold
  job (state is cached under the sketch's state token afterwards);
- warm: steady-state scattered requests with VARYING qs — the router
  re-merges k*groups rows in Python per request while the workers serve
  state from cache, so no Spark job runs at all. The unsharded twin
  (union worker, same varying qs) runs a full estimate job per distinct
  body — the scatter's steady state beats the single process it shards;
- advance: land a new micro-batch on one shard — exactly that worker's
  state token changes and exactly one fold recomputes;
- concurrent: 16 clients of mixed quantiles/distinct/profile/topk traffic;
- state payload boundedness: quantile state rows <= k * n_groups and HLL
  rows <= 2^p * n_groups REGARDLESS of corpus size — the scatter ships
  register-scale state, never stream-scale data.

Prints one JSON line. Run: python bench_stats.py [sf_dir] [n_requests]
"""

from __future__ import annotations

import json
import math
import os
import sys
import tempfile
import threading
import time

from bench_http import _pctl, _post_json


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else (
        "/tmp/sf10" if os.path.exists("/tmp/sf10/documents.parquet")
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    n_req = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from pyspark.sql import functions as F

    from treemachine_spark.api.router import ShardRouter, make_router_server
    from treemachine_spark.api.server import make_server
    from treemachine_spark.functions.text import token_count
    from treemachine_spark.io.tables import load_tables
    from treemachine_spark.session import get_spark
    from treemachine_spark.streaming.stats import (
        StreamingHLLSketch,
        StreamingQuantileSketch,
        StreamingTopKSketch,
    )

    spark = get_spark("bench-stats")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"sf_dir": sf_dir}

    tabs = load_tables(spark, sf_dir)
    docs = tabs["documents"].cache()
    events = tabs["events"].cache()
    out["n_docs"], out["n_events"] = docs.count(), events.count()
    tok = lambda df: df.select("lang", token_count(F.col("text")).alias("n"))  # noqa: E731
    sel = lambda df: df.select("event_type", "user_id")  # noqa: E731

    root = tempfile.mkdtemp(prefix="bench_stats_")
    t0 = time.time()
    sketches = {}
    for tag, dpred, epred in (
        ("a", F.col("doc_id") % 2 == 0, F.col("event_id") % 2 == 0),
        ("b", F.col("doc_id") % 2 == 1, F.col("event_id") % 2 == 1),
        ("u", F.lit(True), F.lit(True)),
    ):
        qsk = StreamingQuantileSketch(
            os.path.join(root, f"q_{tag}"), "n", ["lang"], k=1024
        )
        dsk = StreamingHLLSketch(
            os.path.join(root, f"d_{tag}"), "user_id", ["event_type"], p=12
        )
        tsk = StreamingTopKSketch(
            os.path.join(root, f"t_{tag}"), "hotkey", depth=4, width=2048,
            n_candidates=256,
        )
        # two micro-batches each so the read-time fold is exercised
        half = F.col("doc_id") % 4 < 2
        qsk.process_batch(tok(docs.where(dpred & half)), 0)
        qsk.process_batch(tok(docs.where(dpred & ~half)), 1)
        dsk.process_batch(sel(events.where(epred)), 0)
        # bounded-cardinality skewed key (event_type x user bucket): 200
        # distinct keys <= C at EVERY SF, so candidate capture is total and
        # the scattered topk must equal the union worker's exactly
        hot = F.concat_ws(
            "|", "event_type", (F.col("user_id") % 40).cast("string")
        ).alias("hotkey")
        tsk.process_batch(events.where(epred).select(hot), 0)
        sketches[tag] = (qsk, dsk, tsk)
    out["build_s"] = round(time.time() - t0, 1)

    # the stats routes need a store only for its SparkSession; reuse the
    # tiny synthetic tree store every serving bench boots with
    from bench_http import build_synth_store

    servers, urls = {}, {}

    store, _, _, _ = build_synth_store(spark, 100)
    for tag, (qsk, dsk, tsk) in sketches.items():
        srv = make_server(
            store, host="127.0.0.1", port=0,
            stats_sketch=qsk, distinct_sketch=dsk, topk_sketch=tsk,
        )
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        servers[tag] = srv
        urls[tag] = f"http://127.0.0.1:{srv.server_address[1]}"
    router = make_router_server(
        ShardRouter(
            pools={"t": [urls["u"]]}, default_pool=[urls["u"]],
            stats_shards=[[urls["a"]], [urls["b"]]],
        )
    )
    threading.Thread(target=router.serve_forever, daemon=True).start()
    rbase = f"http://127.0.0.1:{router.server_address[1]}"

    # ---- cold: each shard's ONE fold job runs; state caches by token
    body = {"qs": [0.5, 0.9, 0.99]}
    t0 = time.time()
    status, merged = _post_json(rbase, "/v3/stats/quantiles", body)
    out["cold"] = {"s": round(time.time() - t0, 3), "status": status}

    # ---- equality: scattered == union worker, bit-for-bit / last-ulp
    status2, full = _post_json(urls["u"], "/v3/stats/quantiles", body)
    q_equal = status == status2 == 200 and merged == {**full, "shards": 2}
    st, md = _post_json(rbase, "/v3/stats/distinct", {})
    st2, fd = _post_json(urls["u"], "/v3/stats/distinct", {})
    d_equal = (
        st == st2 == 200
        and [e["group"] for e in md["counts"]] == [e["group"] for e in fd["counts"]]
        and all(
            math.isclose(g["estimate"], e["estimate"], rel_tol=1e-12)
            for g, e in zip(md["counts"], fd["counts"])
        )
    )
    st, mt = _post_json(rbase, "/v3/stats/topk", {"k": 20})
    st2, ft = _post_json(urls["u"], "/v3/stats/topk", {"k": 20})
    t_equal = st == st2 == 200 and mt == {**ft, "shards": 2}
    out["equal"] = {"quantiles": q_equal, "distinct": d_equal, "topk": t_equal}

    # ---- state payload boundedness (register-scale, never stream-scale)
    _, state = _post_json(urls["a"], "/v3/stats/state", {})
    n_langs = docs.select("lang").distinct().count()
    n_types = events.select("event_type").distinct().count()
    out["state_rows"] = {
        "quantile": len(state["quantiles"]["rows"]),
        "quantile_bound": 1024 * n_langs,
        "hll": len(state["distinct"]["rows"]),
        "hll_bound": (1 << 12) * n_types,
    }

    # ---- warm steady state: varying qs defeats response caches; workers
    # serve cached STATE (no Spark job) while the unsharded twin runs a
    # full estimate job per distinct body
    def drive(base: str, path: str, bodies) -> dict:
        lats, errs = [], 0
        for b in bodies:
            t = time.time()
            s, _ = _post_json(base, path, b)
            lats.append(time.time() - t)
            errs += s != 200
        return {"p50": _pctl(lats, 0.5), "p95": _pctl(lats, 0.95),
                "max": _pctl(lats, 1.0), "errors": errs}

    bodies = [{"qs": [0.5, 0.9, (i + 1) / (n_req + 1)]} for i in range(n_req)]
    out["warm_scattered"] = drive(rbase, "/v3/stats/quantiles", bodies)
    out["warm_unsharded"] = drive(urls["u"], "/v3/stats/quantiles", bodies)
    out["warm_profile"] = drive(rbase, "/v3/stats/profile", bodies[: n_req // 2])

    # ---- advance: a new micro-batch on shard A flips ITS token only —
    # the next scatter recomputes exactly one shard's fold
    sketches["a"][0].process_batch(tok(docs.limit(1000)), 2)
    t0 = time.time()
    status, _ = _post_json(rbase, "/v3/stats/quantiles", body)
    out["advance"] = {"s": round(time.time() - t0, 3), "status": status}

    # ---- concurrent mixed load through the router
    reqs = [
        ("/v3/stats/quantiles", {"qs": [0.5, 0.9]}),
        ("/v3/stats/distinct", {}),
        ("/v3/stats/profile", {"qs": [0.25, 0.75]}),
        ("/v3/stats/topk", {"k": 10}),
    ]
    lats: list[float] = []
    errs = [0]

    def client(cid: int) -> None:
        for i in range(3):
            path, b = reqs[(cid + i) % len(reqs)]
            t = time.time()
            s, _ = _post_json(rbase, path, b)
            lats.append(time.time() - t)
            if s != 200:
                errs[0] += 1

    t0 = time.time()
    threads = [threading.Thread(target=client, args=(c,)) for c in range(16)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    out["concurrent"] = {
        "clients": 16, "requests": len(lats), "errors": errs[0],
        "wall_s": round(time.time() - t0, 2), "p95": _pctl(lats, 0.95),
    }

    print(json.dumps({"metric": "stats_scatter", **out}))


if __name__ == "__main__":
    main()
