"""Versioned parquet tables: time travel, snapshot isolation, rollback,
versioned MERGE (operators/versioned.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from treemachine_spark.operators.versioned import VersionedTable


@pytest.fixture()
def vt(tmp_path):
    return VersionedTable(str(tmp_path / "tbl"))


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


def test_write_read_time_travel(spark, vt):
    assert vt.write(_df(spark, [(1, "a"), (2, "b")])) == 1
    assert vt.write(_df(spark, [(1, "a2"), (3, "c")])) == 2
    assert sorted(vt.read(spark).collect()) == [(1, "a2"), (3, "c")]
    assert sorted(vt.read(spark, version=1).collect()) == [(1, "a"), (2, "b")]
    assert [m["version"] for m in vt.history()] == [1, 2]


def test_snapshot_isolation_reader_pinned(spark, vt):
    vt.write(_df(spark, [(1, "a")]))
    pinned = vt.read(spark)  # lazy — resolves to v1's directory
    vt.write(_df(spark, [(1, "CHANGED")]))
    assert pinned.collect() == [(1, "a")]  # later commit invisible
    assert vt.read(spark).collect() == [(1, "CHANGED")]


def test_rollback_is_a_new_version(spark, vt):
    vt.write(_df(spark, [(1, "good")]))
    vt.write(_df(spark, [(1, "bad")]))
    v3 = vt.rollback(1)
    assert v3 == 3
    assert vt.read(spark).collect() == [(1, "good")]
    assert vt.read(spark, version=2).collect() == [(1, "bad")]  # history intact
    assert vt.history()[-1]["restored_version"] == 1


def test_versioned_merge(spark, vt):
    vt.write(_df(spark, [(1, "a"), (2, "b")]))
    src = _df(spark, [(2, "B!"), (9, "new")])
    v = vt.merge(
        spark,
        src,
        on="k",
        when_matched={"v": F.col("s.v")},
        when_not_matched={"v": F.col("s.v")},
    )
    assert v == 2
    assert sorted(vt.read(spark).collect()) == [(1, "a"), (2, "B!"), (9, "new")]
    assert sorted(vt.read(spark, version=1).collect()) == [(1, "a"), (2, "b")]


def test_missing_version_raises(spark, vt):
    with pytest.raises(ValueError):
        vt.read(spark)
    vt.write(_df(spark, [(1, "a")]))
    with pytest.raises(ValueError):
        vt.read(spark, version=7)
    with pytest.raises(ValueError):
        vt.rollback(7)


def test_partitioned_snapshot(spark, tmp_path):
    vt = VersionedTable(str(tmp_path / "p"))
    df = spark.createDataFrame(
        [(1, "x", "en"), (2, "y", "de")], "k long, v string, lang string"
    )
    vt.write(df, partition_by="lang")
    got = vt.read(spark)
    assert got.where(F.col("lang") == "en").count() == 1
    assert sorted(got.columns) == ["k", "lang", "v"]


def test_compact_reduces_files_same_rows(spark, vt):
    df = spark.range(0, 1000, 1, 16).select(
        F.col("id").alias("k"), F.col("id").cast("string").alias("v")
    )
    vt.write(df)
    import glob
    import os

    def nfiles(version):
        m = next(x for x in vt.history() if x["version"] == version)
        return len(
            glob.glob(os.path.join(vt.path, m["data_dir"], "*.parquet"))
        )

    assert nfiles(1) > 1
    v2 = vt.compact(spark, target_files=1)
    assert nfiles(v2) == 1
    assert vt.read(spark).count() == 1000
    assert vt.read(spark, version=1).count() == 1000  # old snapshot intact


def test_partitioned_compact_preserves_layout(spark, tmp_path):
    """OPTIMIZE on a partitioned table must republish WITH the partition
    layout (ADVICE r3: coalesce() dropped partitionBy, silently regressing
    partition pruning), and bound files per partition directory."""
    import glob
    import os

    vt = VersionedTable(str(tmp_path / "pc"))
    df = spark.range(0, 400, 1, 16).select(
        F.col("id").alias("k"),
        F.col("id").cast("string").alias("v"),
        (F.col("id") % 4).cast("string").alias("lang"),
    )
    vt.write(df, partition_by="lang")
    v2 = vt.compact(spark, target_files=1)
    m = next(x for x in vt.history() if x["version"] == v2)
    assert m["partition_by"] == "lang"
    ddir = os.path.join(vt.path, m["data_dir"])
    pdirs = sorted(
        d for d in os.listdir(ddir) if d.startswith("lang=")
    )
    assert pdirs == ["lang=0", "lang=1", "lang=2", "lang=3"]
    for d in pdirs:
        assert len(glob.glob(os.path.join(ddir, d, "*.parquet"))) == 1
    # pruning still works and rows survive
    got = vt.read(spark)
    assert got.where(F.col("lang") == "2").count() == 100
    assert got.count() == 400


def test_concurrent_commit_raises_not_clobbers(spark, vt):
    """Two writers racing to the same version: the second publish must
    raise ConcurrentCommitError, never silently replace the winner."""
    from treemachine_spark.operators.versioned import ConcurrentCommitError

    vt.write(_df(spark, [(1, "a")]))
    # Simulate the race: both writers read latest_version==1, winner
    # publishes v2; the loser's publish of v2 must fail loudly.
    vt._publish("data/v1", "overwrite", version=2)
    with pytest.raises(ConcurrentCommitError):
        vt._publish("data/v1", "overwrite", version=2)
    assert vt.latest_version == 2
    # no stray tmp files left behind
    import os

    assert not [
        f for f in os.listdir(os.path.join(vt.path, "_log")) if ".tmp" in f
    ]


def test_vacuum_removes_old_dirs_keeps_recent(spark, vt):
    import os

    vt.write(_df(spark, [(1, "a")]))
    vt.write(_df(spark, [(1, "b")]))
    vt.write(_df(spark, [(1, "c")]))
    removed = vt.vacuum(keep_last=2)
    assert removed == ["data/v1"]
    assert not os.path.exists(os.path.join(vt.path, "data/v1"))
    # recent versions still readable; history still lists all three
    assert vt.read(spark, version=2).collect() == [(1, "b")]
    assert vt.read(spark).collect() == [(1, "c")]
    assert len(vt.history()) == 3


def test_vacuum_spares_dirs_shared_by_rollback(spark, vt):
    import os

    vt.write(_df(spark, [(1, "good")]))   # v1
    vt.write(_df(spark, [(1, "bad")]))    # v2
    vt.rollback(1)                        # v3 -> points at data/v1
    removed = vt.vacuum(keep_last=2)      # keeps v2, v3(=data/v1)
    assert "data/v1" not in removed       # referenced by kept v3
    assert os.path.exists(os.path.join(vt.path, "data/v1"))
    assert vt.read(spark).collect() == [(1, "good")]


def test_compact_legacy_manifest_sniffs_partition_layout(spark, tmp_path):
    """ADVICE r4: a manifest written before ``partition_by`` was recorded
    (or restored by a rollback to such a version) must NOT make compact()
    silently rewrite a partitioned table unpartitioned — the layout is
    sniffed from the snapshot directory's key=value subdirs."""
    import json
    import os

    vt = VersionedTable(str(tmp_path / "legacy"))
    df = spark.createDataFrame(
        [(1, "x", "en"), (2, "y", "de"), (3, "z", "en")],
        "k long, v string, lang string",
    )
    vt.write(df, partition_by="lang")
    # Simulate a pre-change manifest: drop the partition_by key entirely.
    mpath = os.path.join(vt.path, "_log", "v00000001.json")
    with open(mpath) as fh:
        m = json.load(fh)
    del m["partition_by"]
    with open(mpath, "w") as fh:
        json.dump(m, fh)

    v2 = vt.compact(spark, target_files=1)
    m2 = next(x for x in vt.history() if x["version"] == v2)
    assert m2["partition_by"] == "lang"
    ddir = os.path.join(vt.path, m2["data_dir"])
    assert sorted(d for d in os.listdir(ddir) if d.startswith("lang=")) == [
        "lang=de",
        "lang=en",
    ]
    assert vt.read(spark).count() == 3

    # Rollback to the legacy version omits the key (instead of recording a
    # spurious null), so a compact after the rollback still keeps layout.
    v3 = vt.rollback(1)
    m3 = next(x for x in vt.history() if x["version"] == v3)
    assert "partition_by" not in m3
    v4 = vt.compact(spark, target_files=1)
    m4 = next(x for x in vt.history() if x["version"] == v4)
    assert m4["partition_by"] == "lang"
