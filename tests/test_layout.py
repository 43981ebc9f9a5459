"""Z-order layout (operators/layout.py): the skipping property the layout
exists for — a 2-D box query touches fewer row groups on the z-ordered
layout than on a single-key sort — plus zvalue bit-exactness.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from treemachine_spark.operators.layout import (
    rowgroups_touched,
    zorder_write,
    zvalue,
)


def test_zvalue_interleaves_bits(spark):
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (1, 1), (2, 3), (65535, 65535)], "a int, b int"
    )
    got = {
        (r.a, r.b): r.z
        for r in df.select("a", "b", zvalue(F.col("a"), F.col("b")).alias("z")).collect()
    }

    def morton(a, b):
        z = 0
        for i in range(16):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    for (a, b), z in got.items():
        assert z == morton(a, b)


def test_zorder_skips_more_rowgroups_than_linear(spark, tmp_path):
    # uniform 256x256 key plane, 64k rows with payload to fatten row groups
    df = (
        spark.range(65536)
        .select(
            (F.col("id") % 256).cast("int").alias("x"),
            (F.col("id") / 256).cast("int").alias("y"),
            F.sha2(F.col("id").cast("string"), 256).alias("pad"),
        )
        .cache()
    )

    lin_path = str(tmp_path / "linear")
    z_path = str(tmp_path / "zorder")
    # linear baseline: globally sorted on x only (the classic 1-D layout)
    (
        df.repartitionByRange(8, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .option("parquet.block.size", 64 * 1024)
        .parquet(lin_path)
    )
    zorder_write(df, ("x", "y"), z_path, bits=8, n_files=8, small_groups=True)

    # same selective 2-D box on both layouts (a 1/16 x 1/16 tile)
    box = {"x": (32, 47), "y": (96, 111)}
    lt, ltot = rowgroups_touched(lin_path, box)
    zt, ztot = rowgroups_touched(z_path, box)
    # identical data -> comparable group counts; the z layout must prune
    # strictly harder on a 2-D predicate
    assert ztot > 8 and ltot > 8
    assert zt / ztot < lt / ltot
    # and meaningfully so: z-order should touch a small fraction
    assert zt / ztot < 0.5

    # correctness: both layouts return identical box contents
    a = (
        spark.read.parquet(lin_path)
        .where("x between 32 and 47 and y between 96 and 111")
        .count()
    )
    b = (
        spark.read.parquet(z_path)
        .where("x between 32 and 47 and y between 96 and 111")
        .count()
    )
    assert a == b == 16 * 16
