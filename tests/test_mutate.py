"""MERGE/upsert operator (operators/mutate.py): three-way semantics and
the physical store round-trip.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from treemachine_spark.operators.mutate import merge_into_store, merge_upsert


def _target(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, name string, bal double",
    )


def _source(spark):
    return spark.createDataFrame(
        [(2, 5.0), (3, 7.0), (9, 99.0)], "k long, delta double"
    )


def test_merge_three_way_semantics(spark):
    out = merge_upsert(
        _target(spark),
        _source(spark),
        on="k",
        when_matched={"bal": F.col("t.bal") + F.col("s.delta")},
        when_not_matched={"bal": F.col("s.delta"), "name": F.lit("new")},
    )
    rows = {r.k: (r.name, r.bal) for r in out.collect()}
    assert rows == {
        1: ("a", 10.0),  # target-only: carried unchanged
        2: ("b", 25.0),  # matched: update expression
        3: ("c", 37.0),
        9: ("new", 99.0),  # source-only: insert expression
    }


def test_merge_insert_defaults_null(spark):
    # unlisted target columns on inserted rows become typed NULLs
    out = merge_upsert(
        _target(spark),
        _source(spark),
        on="k",
        when_not_matched={"bal": F.col("s.delta")},
    )
    ins = out.where("k = 9").collect()[0]
    assert ins.name is None and ins.bal == 99.0
    assert dict(out.dtypes) == dict(_target(spark).dtypes)


def test_merge_into_store_roundtrip(spark, tmp_path):
    path = str(tmp_path / "store")
    _target(spark).write.parquet(path)
    merge_into_store(
        spark,
        path,
        _source(spark),
        on="k",
        when_matched={"bal": F.col("t.bal") + F.col("s.delta")},
        when_not_matched={"bal": F.col("s.delta"), "name": F.lit("new")},
    )
    rows = {r.k: (r.name, r.bal) for r in spark.read.parquet(path).collect()}
    assert rows[2] == ("b", 25.0) and rows[9] == ("new", 99.0) and len(rows) == 4

    # idempotence of a second merge with an empty source
    empty = _source(spark).where("k < 0")
    merge_into_store(spark, path, empty, on="k")
    assert {r.k for r in spark.read.parquet(path).collect()} == {1, 2, 3, 9}
