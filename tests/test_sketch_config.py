"""Sketch-table config binding (r10 — the dedup meta.json lesson applied
to the streaming sketch families): the first process_batch persists the
writer's config (_sketch_config.json) and every later construction over
the same table validates against it. The bug this kills: serving a k=64
bottom-k table as k=1024 keeps rows the writer's inclusion threshold
never sampled uniformly (silently biased quantiles, not conservative),
and probing a width-512 CMS mod 2048 hashes candidates to the wrong
cells — `cli serve --stats-sketch` previously constructed with class
defaults regardless of what wrote the table.
"""

from __future__ import annotations

import json
import os

import pytest


def _docs(spark, n=300):
    from pyspark.sql import functions as F

    return spark.range(n).select(
        F.concat(F.lit("g"), (F.col("id") % 3).cast("string")).alias("lang"),
        (F.col("id") % 17).alias("n"),
    )


def test_config_written_and_mismatch_raises(spark, tmp_path):
    from treemachine_spark.streaming.stats import (
        CONFIG_NAME,
        StreamingQuantileSketch,
    )

    path = str(tmp_path / "sk")
    sk = StreamingQuantileSketch(path, "n", ["lang"], k=64)
    sk.process_batch(_docs(spark), 0)
    cfg = json.load(open(os.path.join(path, CONFIG_NAME)))
    assert cfg == {"family": "quantile", "col": "n", "groups": ["lang"], "k": 64}

    # identical params re-open fine (restart / another process)
    StreamingQuantileSketch(path, "n", ["lang"], k=64)
    # the silent-bias construction is now a loud error: wrong k, wrong
    # col, wrong groups, wrong family
    with pytest.raises(ValueError, match="config mismatch"):
        StreamingQuantileSketch(path, "n", ["lang"])  # default k=1024
    with pytest.raises(ValueError, match="config mismatch"):
        StreamingQuantileSketch(path, "m", ["lang"], k=64)
    with pytest.raises(ValueError, match="config mismatch"):
        StreamingQuantileSketch(path, "n", ["lang", "x"], k=64)
    from treemachine_spark.streaming.stats import StreamingHLLSketch

    with pytest.raises(ValueError, match="config mismatch"):
        StreamingHLLSketch(path, "n", ["lang"])


def test_open_sketch_rebuilds_each_family(spark, tmp_path):
    from treemachine_spark.streaming.stats import (
        StreamingHLLSketch,
        StreamingQuantileSketch,
        StreamingTopKSketch,
        open_sketch,
    )

    docs = _docs(spark).cache()
    qsk = StreamingQuantileSketch(str(tmp_path / "q"), "n", ["lang"], k=32)
    qsk.process_batch(docs, 0)
    dsk = StreamingHLLSketch(str(tmp_path / "d"), "n", ["lang"], p=6)
    dsk.process_batch(docs, 0)
    tsk = StreamingTopKSketch(
        str(tmp_path / "t"), "lang", depth=3, width=128, n_candidates=8
    )
    tsk.process_batch(docs, 0)

    oq = open_sketch(str(tmp_path / "q"))
    assert type(oq) is StreamingQuantileSketch and (oq.col, oq.groups, oq.k) == (
        "n",
        ["lang"],
        32,
    )
    od = open_sketch(str(tmp_path / "d"))
    assert type(od) is StreamingHLLSketch and od.p == 6
    ot = open_sketch(str(tmp_path / "t"))
    assert type(ot) is StreamingTopKSketch and (
        ot.depth,
        ot.width,
        ot.n_candidates,
    ) == (3, 128, 8)
    # the reopened sketch reads the identical running state
    assert sorted(map(tuple, oq.current(spark).collect())) == sorted(
        map(tuple, qsk.current(spark).collect())
    )
    # unknown path -> None (pre-r10 fallback contract)
    assert open_sketch(str(tmp_path / "nope")) is None


def test_legacy_table_without_config_still_opens(spark, tmp_path):
    from treemachine_spark.streaming.stats import (
        CONFIG_NAME,
        StreamingQuantileSketch,
        open_sketch,
    )

    path = str(tmp_path / "legacy")
    sk = StreamingQuantileSketch(path, "n", ["lang"], k=16)
    sk.process_batch(_docs(spark), 0)
    os.remove(os.path.join(path, CONFIG_NAME))
    # no config: open_sketch signals the caller to supply args...
    assert open_sketch(path) is None
    # ...and explicit construction keeps the pre-r10 responsibility
    # (nothing to validate against — documented fallback, not a bug)
    StreamingQuantileSketch(path, "n", ["lang"], k=999)


def test_open_sketch_unknown_family_names_the_problem(spark, tmp_path):
    """r11 (r10 ADVICE): a hand-edited or newer-version config with an
    unrecognized family must raise a ValueError naming the path and the
    bad family — not fall through to the quantile branch and die on a
    bare KeyError('k')."""
    import json

    from treemachine_spark.streaming.stats import (
        CONFIG_NAME,
        StreamingQuantileSketch,
        open_sketch,
    )

    path = str(tmp_path / "weird")
    sk = StreamingQuantileSketch(path, "n", ["lang"], k=16)
    sk.process_batch(_docs(spark), 0)
    cp = os.path.join(path, CONFIG_NAME)
    with open(cp) as fh:
        cfg = json.load(fh)
    cfg["family"] = "tdigest"
    with open(cp, "w") as fh:
        json.dump(cfg, fh)
    with pytest.raises(ValueError, match="unknown sketch family 'tdigest'"):
        open_sketch(path)


def test_write_config_race_raises_before_data_lands(spark, tmp_path):
    """The construct-before-config hole: writer B constructed on an empty
    dir (nothing to validate), writer A lands the first batch and
    persists its config — B's NEXT process_batch must raise BEFORE any of
    B's data lands (the mismatched partial would be silently folded into
    every read forever). The config publish itself is put-if-absent via a
    hard link of a writer-unique tmp (the VersionedTable manifest
    pattern): one winner, complete-content visibility, no interleaved
    bytes."""
    from treemachine_spark.streaming.stats import StreamingQuantileSketch

    path = str(tmp_path / "race")
    b = StreamingQuantileSketch(path, "n", ["lang"])  # k=1024; empty dir
    a = StreamingQuantileSketch(path, "n", ["lang"], k=64)
    a.process_batch(_docs(spark), 0)  # wins the put-if-absent
    with pytest.raises(ValueError, match="config mismatch"):
        b.process_batch(_docs(spark), 1)
    # B's mismatched partial never landed
    assert not os.path.isdir(os.path.join(path, "ingest_batch=1"))
    # A keeps appending fine, and no tmp litter remains
    a.process_batch(_docs(spark), 1)
    assert not [f for f in os.listdir(path) if ".tmp." in f]
