"""Streaming Count-Min heavy-hitters family (r10): the frequency member
of the mergeable-sketch triad (bottom-k = order statistics, HLL =
cardinality, CMS = frequency) — streaming/stats.StreamingTopKSketch,
the /v3/stats/topk route, and the router's state-merge scatter.

Pinned laws:
- the folded CMS cells EQUAL the single-pass cms_sketch over every row
  seen (cell-wise-sum merge — integer exact);
- captured candidates' served estimates EQUAL the single-pass cms_topk's
  (the estimate reads the exact global CMS);
- replay of a processed batch is a no-op (idempotent dynamic-partition
  overwrite — the family inherits the s9 durability machinery);
- compact() preserves current();
- scattered topk == the union-stream worker's, integer-exact end-to-end
  (the one scatter family with no float anywhere).
"""

from __future__ import annotations

import threading
from pathlib import Path

import pytest

FIX = Path(__file__).parent / "fixtures"


def _mk_docs(spark, n=2000):
    """Skewed key stream: 'hot0'..'hot3' heavy, k0..k39 background, every
    key present in every (id % 3) batch slice and every (id % 2) shard
    slice — so candidate capture is total and blob equality is exact."""
    from pyspark.sql import functions as F

    df = spark.range(n).select(
        F.col("id"),
        F.when(
            F.col("id") % 8 < 4,
            F.concat(F.lit("hot"), (F.col("id") % 4).cast("string")),
        )
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 40).cast("string")))
        .alias("key"),
    )
    return df


def test_topk_fold_replay_compact(spark, tmp_path):
    from pyspark.sql import functions as F

    from treemachine_spark.functions.sketches import (
        cms_sketch,
        cms_topk,
        cms_topk_from_state,
    )
    from treemachine_spark.streaming.stats import StreamingTopKSketch

    docs = _mk_docs(spark).cache()
    sk = StreamingTopKSketch(
        str(tmp_path / "topk"), "key", depth=4, width=256, n_candidates=128
    )
    for b in range(3):
        sk.process_batch(docs.where(F.col("id") % 3 == b), b)

    cur = sk.current(spark).cache()
    # CMS cells == the single-pass sketch of ALL rows (cell-wise-sum law)
    got = {
        (r["d"], r["pos"]): r["cnt"]
        for r in cur.where(F.col("key").isNull()).collect()
    }
    exp = {
        (r["d"], r["pos"]): r["cnt"]
        for r in cms_sketch(docs, "key", 4, 256).collect()
    }
    assert got == exp
    # with <= C distinct keys, capture is total: the served top-k equals
    # the single-pass cms_topk bit-for-bit (same estimator, same order)
    top = cms_topk_from_state(cur, 10, 4, 256).collect()
    ref = cms_topk(docs, "key", k=10, depth=4, width=256).collect()
    assert [(r["key"], r["est_count"]) for r in top] == [
        (r["key"], r["est_count"]) for r in ref
    ]
    # hot keys lead (est >= true count; CMS never undercounts)
    assert {r["key"] for r in top[:4]} == {"hot0", "hot1", "hot2", "hot3"}

    # at-least-once replay: reprocessing a batch replaces its own
    # partition — the running sketch is unchanged
    sk.process_batch(docs.where(F.col("id") % 3 == 1), 1)
    again = {
        (r["d"], r["pos"]): r["cnt"]
        for r in sk.current(spark).where(F.col("key").isNull()).collect()
    }
    assert again == exp

    # compact folds history without changing the running sketch
    assert sk.compact(spark, assume_idle=True) is not None
    top2 = cms_topk_from_state(sk.current(spark), 10, 4, 256).collect()
    assert [(r["key"], r["est_count"]) for r in top2] == [
        (r["key"], r["est_count"]) for r in top
    ]


def test_topk_compact_with_larger_capacity_is_conservative(spark, tmp_path):
    """For a LEGACY table (pre-r10, no persisted _sketch_config.json),
    cli sketchmaintain may build its maintenance object with a different
    (larger) candidate capacity than the writer's. That must not change
    the served answer: topk compaction persists ALL candidate keys
    regardless of capacity (StreamingTopKSketch._fold_compact — top-C
    truncation at compact time is lossy, see
    test_topk_compact_preserves_current_beyond_capacity), so the
    maintenance object's C is irrelevant to what compact writes. Tables
    WITH a config refuse a mismatched construction outright
    (test_sketch_config.py)."""
    import os

    from pyspark.sql import functions as F

    from treemachine_spark.functions.sketches import cms_topk_from_state
    from treemachine_spark.streaming.stats import CONFIG_NAME, StreamingTopKSketch

    docs = _mk_docs(spark).cache()
    sk = StreamingTopKSketch(
        str(tmp_path / "cap"), "key", depth=4, width=256, n_candidates=16
    )
    for b in range(3):
        sk.process_batch(docs.where(F.col("id") % 3 == b), b)
    before = [
        (r["key"], r["est_count"])
        for r in cms_topk_from_state(sk.current(spark), 10, 4, 256).collect()
    ]
    # simulate a pre-r10 table: no persisted config to validate against
    os.remove(str(tmp_path / "cap" / CONFIG_NAME))
    # the CLI's maintenance object: same table, LARGER candidate capacity
    maint = StreamingTopKSketch(
        str(tmp_path / "cap"), "key", depth=4, width=256, n_candidates=4096
    )
    assert maint.compact(spark, assume_idle=True) is not None
    after = [
        (r["key"], r["est_count"])
        for r in cms_topk_from_state(sk.current(spark), 10, 4, 256).collect()
    ]
    assert after == before


@pytest.mark.slow
def test_topk_route(spark, tmp_path):
    """POST /v3/stats/topk over a running StreamingTopKSketch — the
    heavy-hitters serving consumer, sharing _handle_sketch's state-token
    freshness (a landed micro-batch invalidates cached answers) and the
    contract-400 conventions of the other sketch routes."""
    from pyspark.sql import functions as F

    from treemachine_spark.api.server import make_server
    from treemachine_spark.functions.sketches import cms_topk_from_state
    from treemachine_spark.ingest import ingest_synthesis_data
    from treemachine_spark.streaming.stats import StreamingTopKSketch

    store = ingest_synthesis_data(
        spark,
        str(FIX / "labelled_supertree.tre"),
        str(FIX / "annotations.json"),
        str(FIX / "taxonomy.tsv"),
    )
    # no sketch -> 404
    srv0 = make_server(store, host="127.0.0.1", port=0)
    assert srv0.core.handle("/v3/stats/topk", {})[0] == 404
    srv0.server_close()

    docs = _mk_docs(spark).cache()
    sk = StreamingTopKSketch(
        str(tmp_path / "rt"), "key", depth=4, width=256, n_candidates=128
    )
    srv = make_server(store, host="127.0.0.1", port=0, topk_sketch=sk)
    core = srv.core
    try:
        # configured but empty -> contract 400, never a 500
        status, resp = core.handle("/v3/stats/topk", {})
        assert status == 400 and "no partial sketches" in resp["message"]

        sk.process_batch(docs.where(F.col("id") % 2 == 0), 0)
        status, blob = core.handle("/v3/stats/topk", {"k": 5})
        assert status == 200 and blob["col"] == "key" and blob["k"] == 5
        exp = [
            {"key": r["key"], "est_count": r["est_count"]}
            for r in cms_topk_from_state(sk.current(spark), 5, 4, 256).collect()
        ]
        assert blob["top"] == exp
        # identical state -> cached; a new batch invalidates via the token
        m = core.cache.misses
        assert core.handle("/v3/stats/topk", {"k": 5}) == (status, blob)
        assert core.cache.misses == m
        sk.process_batch(docs.where(F.col("id") % 2 == 1), 1)
        status2, blob2 = core.handle("/v3/stats/topk", {"k": 5})
        assert status2 == 200 and core.cache.misses == m + 1
        exp2 = [
            {"key": r["key"], "est_count": r["est_count"]}
            for r in cms_topk_from_state(sk.current(spark), 5, 4, 256).collect()
        ]
        assert blob2["top"] == exp2
        # contract errors
        status, resp = core.handle("/v3/stats/topk", {"k": 0})
        assert status == 400 and "positive integer" in resp["message"]
        status, resp = core.handle("/v3/stats/topk", {"k": True})
        assert status == 400
        status, resp = core.handle("/v3/stats/topk", {"nope": 1})
        assert status == 400 and "unknown arguments" in resp["message"]
        # the state route exposes the cms family for the scatter
        status, state = core.handle("/v3/stats/state", {})
        assert status == 200 and state["topk"]["kind"] == "cms"
        assert (
            state["topk"]["depth"],
            state["topk"]["width"],
            state["topk"]["n_candidates"],
        ) == (4, 256, 128)
    finally:
        srv.server_close()


@pytest.mark.slow
def test_topk_scatter_equals_union_worker(spark, tmp_path):
    """Scattered /v3/stats/topk == the union-stream worker's answer,
    integer-exact end-to-end: CMS cells merge by cell-wise sum, the
    router's h32 twin reproduces the engine hash bit-for-bit, and every
    estimate is min-over-depth of the merged integer cells — the one
    scatter family with no float anywhere. Contract 400s fan through the
    workers verbatim."""
    from pyspark.sql import functions as F

    from treemachine_spark.api.router import ShardRouter
    from treemachine_spark.api.server import make_server
    from treemachine_spark.ingest import ingest_synthesis_data
    from treemachine_spark.streaming.stats import StreamingTopKSketch

    store = ingest_synthesis_data(
        spark,
        str(FIX / "labelled_supertree.tre"),
        str(FIX / "annotations.json"),
        str(FIX / "taxonomy.tsv"),
    )
    docs = _mk_docs(spark).cache()
    servers, urls = [], []
    for tag, pred in (
        ("a", F.col("id") % 2 == 0),
        ("b", F.col("id") % 2 == 1),
        ("u", F.lit(True)),
    ):
        sk = StreamingTopKSketch(
            str(tmp_path / f"s_{tag}"), "key", depth=4, width=256,
            n_candidates=128,
        )
        sk.process_batch(docs.where(pred), 0)
        srv = make_server(store, host="127.0.0.1", port=0, topk_sketch=sk)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        servers.append(srv)
        urls.append(f"http://127.0.0.1:{srv.server_address[1]}")
    try:
        r = ShardRouter({}, [], stats_shards=[[urls[0]], [urls[1]]])
        status, merged = r.scatter_stats("/v3/stats/topk", {"k": 8})
        status2, full = servers[2].core.handle("/v3/stats/topk", {"k": 8})
        assert status == status2 == 200
        assert merged == {**full, "shards": 2}
        # contract errors produced by the workers pass through verbatim
        status, resp = r.scatter_stats("/v3/stats/topk", {"k": 0})
        assert status == 400 and "positive integer" in resp["message"]
        status, resp = r.scatter_stats("/v3/stats/topk", {"nope": 1})
        assert status == 400 and "unknown arguments" in resp["message"]
    finally:
        for srv in servers:
            srv.shutdown()
            srv.server_close()


def test_topk_compact_preserves_current_beyond_capacity(spark, tmp_path):
    """Top-C-by-count is NOT truncation-stable, so compact() persists ALL
    candidate keys and truncates only at read time. The repro that found
    it: C=2; batch0 {A:10,B:9}, batch1 {C:10,D:9}; compact; batch2
    {B:3,D:2}. A truncating compact drops B's 9 and D's 9 and can only
    ever serve [A:10, C:10]; the untruncated compact serves the true
    top-2 [B:12, D:11] — identical to a never-compacted twin."""
    from treemachine_spark.functions.sketches import cms_topk_from_state
    from treemachine_spark.streaming.stats import StreamingTopKSketch

    def batch(pairs):
        rows = [(k,) for k, n in pairs for _ in range(n)]
        return spark.createDataFrame(rows, "key string")

    def top2(sk):
        return [
            (r["key"], r["est_count"])
            for r in cms_topk_from_state(sk.current(spark), 2, 4, 256).collect()
        ]

    sk = StreamingTopKSketch(
        str(tmp_path / "cp"), "key", depth=4, width=256, n_candidates=2
    )
    twin = StreamingTopKSketch(
        str(tmp_path / "cp_twin"), "key", depth=4, width=256, n_candidates=2
    )
    batches = [[("A", 10), ("B", 9)], [("C", 10), ("D", 9)], [("B", 3), ("D", 2)]]
    for i, b in enumerate(batches[:2]):
        sk.process_batch(batch(b), i)
        twin.process_batch(batch(b), i)
    assert sk.compact(spark, assume_idle=True) is not None
    sk.process_batch(batch(batches[2]), 2)
    twin.process_batch(batch(batches[2]), 2)
    assert top2(sk) == top2(twin) == [("B", 12), ("D", 11)]


def test_state_route_family_from_config_not_column_names(spark, tmp_path):
    """A quantile sketch GROUPED BY a column named 'key' (or 'bucket')
    must not masquerade as cms/hll on the state route: the family comes
    from the sketch's own config, never from column-name sniffing (the
    sniff made every /v3/stats/state on such a deployment a 500)."""
    from pyspark.sql import functions as F

    from treemachine_spark.api.server import make_server
    from treemachine_spark.ingest import ingest_synthesis_data
    from treemachine_spark.streaming.stats import StreamingQuantileSketch

    store = ingest_synthesis_data(
        spark,
        str(FIX / "labelled_supertree.tre"),
        str(FIX / "annotations.json"),
        str(FIX / "taxonomy.tsv"),
    )
    docs = _mk_docs(spark)
    sk = StreamingQuantileSketch(str(tmp_path / "gk"), "id", ["key"], k=16)
    sk.process_batch(docs.select("key", F.col("id")), 0)
    srv = make_server(store, host="127.0.0.1", port=0, stats_sketch=sk)
    try:
        status, state = srv.core.handle("/v3/stats/state", {})
        assert status == 200
        assert state["quantiles"]["kind"] == "quantile"
        assert state["quantiles"]["k"] == 16
        assert state["quantiles"]["groups"] == ["key"]
    finally:
        srv.server_close()


@pytest.mark.slow
def test_state_route_caches_per_family(spark, tmp_path):
    """Each family's state caches under ITS OWN token: a micro-batch
    landing on one sketch recomputes exactly that family's fold — the
    other configured families replay from cache (previously one combined
    key recomputed every family on any advance)."""
    from pyspark.sql import functions as F

    from treemachine_spark.api.server import make_server
    from treemachine_spark.ingest import ingest_synthesis_data
    from treemachine_spark.streaming.stats import (
        StreamingQuantileSketch,
        StreamingTopKSketch,
    )

    store = ingest_synthesis_data(
        spark,
        str(FIX / "labelled_supertree.tre"),
        str(FIX / "annotations.json"),
        str(FIX / "taxonomy.tsv"),
    )
    docs = _mk_docs(spark).cache()
    qsk = StreamingQuantileSketch(str(tmp_path / "pq"), "id", ["key"], k=16)
    qsk.process_batch(docs.where(F.col("id") % 2 == 0), 0)
    tsk = StreamingTopKSketch(
        str(tmp_path / "pt"), "key", depth=4, width=256, n_candidates=64
    )
    tsk.process_batch(docs.where(F.col("id") % 2 == 0), 0)
    srv = make_server(
        store, host="127.0.0.1", port=0, stats_sketch=qsk, topk_sketch=tsk
    )
    core = srv.core
    try:
        status, first = core.handle("/v3/stats/state", {})
        assert status == 200 and first["distinct"] is None
        m = core.cache.misses  # two family folds computed
        status, again = core.handle("/v3/stats/state", {})
        assert (status, again) == (200, first) and core.cache.misses == m
        # advance ONLY the topk sketch: exactly one family recomputes
        tsk.process_batch(docs.where(F.col("id") % 2 == 1), 1)
        status, fresh = core.handle("/v3/stats/state", {})
        assert status == 200 and core.cache.misses == m + 1
        assert fresh["quantiles"] == first["quantiles"]
        assert fresh["topk"] != first["topk"]
    finally:
        srv.server_close()
