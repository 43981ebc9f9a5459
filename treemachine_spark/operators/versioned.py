"""Versioned parquet tables: snapshot isolation, time travel, O(1)
rollback — the lakehouse transaction-log pattern (Delta/Iceberg's core
idea) in its minimal form.

Why this belongs in a 100 TB engine: plain ``mode("overwrite")`` deletes
the old files before the new ones commit, so a concurrent reader can see a
half-written table, and yesterday's state is simply gone. The fix is the
same everywhere in the lakehouse world: data files are IMMUTABLE, each
write lands in a fresh directory, and a tiny manifest (the "log") is the
only thing that moves. Readers pin a manifest, so every query sees one
consistent snapshot no matter what writers do; rollback is publishing a
manifest that points at an old directory — no data is copied or deleted.

The reference mutates Neo4j in place (GraphImporter ingest batches,
GraphBase.deleteTreeBySource) with none of this; beyond-reference surface.

Scale notes: the manifest is O(1) metadata regardless of table size; the
data directories inherit whatever partitioning the DataFrame writer is
given (``partition_by``), so partition pruning works per snapshot.
``merge`` composes operators/mutate.merge_upsert (one full-outer join)
with a versioned publish — the MERGE INTO + time-travel combination every
lakehouse ships.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ConcurrentCommitError(RuntimeError):
    """Two writers raced to commit the same version; the loser gets this
    instead of silently clobbering the winner's manifest."""


class VersionedTable:
    """A directory of immutable parquet snapshots plus a JSON manifest log.

    Layout::

        <path>/_log/v00000001.json   {"version": 1, "data_dir": "data/v1", "op": ...}
        <path>/data/v1/...parquet    (never rewritten)
    """

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.join(path, "_log"), exist_ok=True)

    # ------------------------------------------------------------------
    def _manifests(self) -> list[dict]:
        logdir = os.path.join(self.path, "_log")
        out = []
        for name in sorted(os.listdir(logdir)):
            if name.endswith(".json"):
                with open(os.path.join(logdir, name)) as fh:
                    out.append(json.load(fh))
        return out

    @property
    def latest_version(self) -> int:
        m = self._manifests()
        return m[-1]["version"] if m else 0

    def history(self) -> list[dict]:
        """All committed manifests, oldest first."""
        return self._manifests()

    # ------------------------------------------------------------------
    def _publish(
        self, data_dir: str, op: str, meta: dict | None = None, version: int | None = None
    ) -> int:
        v = self.latest_version + 1 if version is None else version
        manifest = {
            "version": v,
            "data_dir": data_dir,
            "op": op,
            "ts": time.time(),
            **(meta or {}),
        }
        final = os.path.join(self.path, "_log", f"v{v:08d}.json")
        tmp = final + f".tmp.{os.getpid()}"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        try:
            # Put-if-absent: os.link fails with EEXIST if another writer
            # already committed this version (POSIX rename would silently
            # replace it and lose their commit).
            os.link(tmp, final)
        except FileExistsError:
            raise ConcurrentCommitError(
                f"{self.path}: version {v} was committed concurrently; "
                "re-read latest_version and retry"
            ) from None
        finally:
            os.unlink(tmp)
        return v

    def write(
        self,
        df: DataFrame,
        op: str = "overwrite",
        partition_by: str | None = None,
        meta: dict | None = None,
    ) -> int:
        """Write ``df`` as a NEW immutable snapshot and publish it.
        Returns the committed version number. The version is computed ONCE
        so the data dir name and the manifest version cannot diverge, and
        the publish is put-if-absent so a concurrent commit of the same
        version raises ConcurrentCommitError instead of silently winning.
        ``meta`` adds caller keys to the manifest (e.g. streaming/stats.py
        records ``compacted_through``).

        Crash recovery: a writer that died between the parquet write and
        the publish leaves an ORPHAN data dir named for a version that was
        never committed. A retry must not fail on it (and must not delete
        it — a concurrent writer could be mid-write there): the manifest,
        not the dir name, is the pointer, so the retry simply lands in a
        fresh uniquely-suffixed dir. ``vacuum(orphans=True)`` reclaims
        unreferenced dirs during maintenance windows."""
        import uuid

        v = self.latest_version + 1
        rel = f"data/v{v}"
        if os.path.exists(os.path.join(self.path, rel)):
            rel = f"data/v{v}.{os.getpid()}.{uuid.uuid4().hex[:8]}"
        writer = df.write.mode("errorifexists")
        if partition_by:
            writer = writer.partitionBy(partition_by)
        writer.parquet(os.path.join(self.path, rel))
        return self._publish(
            rel, op, {"partition_by": partition_by, **(meta or {})}, version=v
        )

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """Latest snapshot, or time-travel to ``version``. The returned
        DataFrame is pinned to that snapshot's directory — later writes
        and rollbacks cannot change what it reads."""
        ms = self._manifests()
        if not ms:
            raise ValueError(f"{self.path}: no committed versions")
        if version is None:
            m = ms[-1]
        else:
            try:
                m = next(x for x in ms if x["version"] == version)
            except StopIteration:
                raise ValueError(f"{self.path}: no version {version}") from None
        return spark.read.parquet(os.path.join(self.path, m["data_dir"]))

    def rollback(self, version: int) -> int:
        """Publish a new version whose data is an OLD snapshot's directory.
        O(1): no data moves; history is preserved (a rollback is itself a
        committed version, as in Delta's RESTORE)."""
        ms = self._manifests()
        target = next((x for x in ms if x["version"] == version), None)
        if target is None:
            raise ValueError(f"{self.path}: no version {version}")
        meta: dict = {"restored_version": version}
        if "partition_by" in target:
            meta["partition_by"] = target["partition_by"]
        # else: pre-partition_by-era target — omit the key so readers of the
        # new manifest fall back to sniffing the restored directory's layout
        # (_current_partition_by) instead of trusting a spurious null.
        return self._publish(target["data_dir"], "rollback", meta)

    def _current_partition_by(self) -> str | None:
        """Partition column of the LATEST snapshot. Trust the manifest when
        it carries the ``partition_by`` key (all writes since the key was
        introduced record it, possibly null); otherwise — a manifest written
        before the key existed, or a rollback that restored one — sniff the
        snapshot directory for Hive-style ``key=value`` subdirectories, the
        layout's own ground truth. Without the fallback, compacting such a
        table would silently rewrite it unpartitioned and drop pruning."""
        ms = self._manifests()
        if not ms:
            return None
        latest = ms[-1]
        if "partition_by" in latest:
            return latest["partition_by"]
        data_dir = os.path.join(self.path, latest["data_dir"])
        try:
            for name in os.listdir(data_dir):
                if "=" in name and os.path.isdir(os.path.join(data_dir, name)):
                    return name.split("=", 1)[0]
        except FileNotFoundError:
            pass
        return None

    def compact(self, spark: SparkSession, target_files: int = 1) -> int:
        """OPTIMIZE: rewrite the latest snapshot into ``target_files``
        files per partition directory and publish it as a new version.
        Small-file compaction is the standing maintenance job of any
        streaming-ingested table (each micro-batch commit lands small
        files; scans pay per-file open cost). Readers of older versions
        are untouched — compaction is just another snapshot.

        Re-applies the table's recorded ``partition_by`` so OPTIMIZE on a
        partitioned table keeps its layout (partition pruning survives):
        hash-repartitioning on (partition col, bounded salt) puts each
        partition value in at most ``target_files`` tasks, so each
        partition directory gets at most that many files."""
        pby = self._current_partition_by()
        df = self.read(spark)
        if pby:
            if target_files > 1:
                salt = F.pmod(F.xxhash64(*df.columns), F.lit(target_files))
                df = df.repartition(F.col(pby), salt)
            else:
                df = df.repartition(F.col(pby))
            return self.write(df, op="compact", partition_by=pby)
        return self.write(df.coalesce(target_files), op="compact")

    def vacuum(self, keep_last: int = 2, orphans: bool = False) -> list[str]:
        """Delete snapshot DIRECTORIES no longer referenced by the last
        ``keep_last`` manifests (their manifests stay, marked vacuumed, so
        history remains auditable). Returns the removed data dirs.
        Time travel beyond the horizon is gone — the Delta VACUUM
        trade-off, applied only after the retention window.

        ``orphans=True`` additionally removes data dirs referenced by NO
        manifest at all — leftovers of writers that crashed before their
        publish. Only safe in a maintenance window: an in-flight writer's
        dir is indistinguishable from a crash orphan."""
        import shutil

        ms = self._manifests()
        keep = {m["data_dir"] for m in ms[-keep_last:]} if keep_last else set()
        removed = []
        for m in ms[:-keep_last] if keep_last else ms:
            d = m["data_dir"]
            full = os.path.join(self.path, d)
            if d not in keep and os.path.exists(full):
                shutil.rmtree(full)
                removed.append(d)
        if orphans:
            referenced = {m["data_dir"] for m in ms}
            datadir = os.path.join(self.path, "data")
            for name in sorted(os.listdir(datadir)) if os.path.isdir(datadir) else []:
                d = f"data/{name}"
                if d not in referenced:
                    shutil.rmtree(os.path.join(self.path, d))
                    removed.append(d)
        return removed

    def merge(
        self,
        spark: SparkSession,
        source: DataFrame,
        on: str,
        when_matched=None,
        when_not_matched=None,
    ) -> int:
        """MERGE INTO the latest snapshot (operators/mutate.merge_upsert
        semantics) and publish the result as a new version."""
        from treemachine_spark.operators.mutate import merge_upsert

        merged = merge_upsert(
            self.read(spark), source, on, when_matched, when_not_matched
        )
        return self.write(merged, op="merge")
